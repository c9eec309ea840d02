"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``time_series_db_spark.catalog`` — one
entry per operator from SURVEY.md §2 plus the large-scale pipeline ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: fetch → 3h moving average
    → sum by (name, region) → top-5 series by average."""
    from time_series_db_spark.catalog import _out
    from time_series_db_spark.operators import grouping, ordering, windows
    from time_series_db_spark.sources import DEFAULT_STEP_MS, fetch_events

    sf = fetch_events(spark, "/root/testdata/sf0.001")
    sf = windows.moving(sf, 3 * DEFAULT_STEP_MS, "avg")
    sf = grouping.sum_(sf, ["name", "region"])
    sf = ordering.top_k(sf, 5, "avg", descending=True)
    return _out(sf, ["name", "region"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from time_series_db_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from time_series_db_spark.catalog import ORACLES

    return dict(ORACLES)
