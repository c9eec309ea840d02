"""Capture .explain("formatted") for catalog queries → plans/r13/.

Usage: python scripts/r13_plans.py <suffix> name1 name2 ...
Writes plans/r13/<name>_<suffix>.txt for each query (suffix = before/after).
Uses the bench SparkSession factory and SPARK_GRAFT_SF_DIR (default sf0.1)
so the plans match what bench.py times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from time_series_db_spark.catalog import QUERIES
    from time_series_db_spark.session import get_spark

    spark = get_spark("tsdb-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
