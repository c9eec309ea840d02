"""Loader + runner for the reference's YAML golden e2e suites.

Ports the reference test framework (models at
``src/test/java/org/opensearch/tsdb/framework/models/TestCase.java:19``,
validator ``framework/BaseQueryExecutor.java:94-200``) onto the Spark
engine:

- ``test_case.input_data_list`` → one samples DataFrame per index
  (FIXED_INTERVAL: value[i] at min+i*step, null = absent row;
  GENERIC: explicit (timestamp, value) points).
- ``queries[*]`` → :class:`FixtureSource` bound to the query's index
  list, run through ``lang.m3.builder.execute``.
- expected ``data`` → per-series (ts, value) pair lists, index i of
  ``values`` at grid point start+i*step, null = no pair
  (BaseQueryExecutor.convertExpectedToPromMatrix) — series matched by
  exact label map + alias, pair lists compared with float tolerance,
  and unexpected series are failures too.

Rebucket semantics mirror TimeSeriesUnfoldAggregator: samples floor to
``scan_start + k*step`` (the scan window is the buffer/shift-adjusted
query window, so off-grid query starts re-anchor the grid — the
"rebucket" functional case) with last-write-wins inside a bucket;
across overlapping multi-index windows the later-listed index wins ties
(ResolvedPartitions overlap handling).
"""

from __future__ import annotations

import datetime
import math

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, MapType, StringType, StructField, StructType,
)

from time_series_db_spark.lang.m3.builder import execute as m3_execute
from time_series_db_spark.lang.m3.plan import parse_duration_ms
from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame, series_key_expr
from time_series_db_spark.sources.m3source import (
    synth_mock_series,
    tag_filter_predicate,
)

CASES_DIR = "/root/reference/src/javaRestTest/resources/test_cases"

_FIXTURE_SCHEMA = StructType([
    StructField("labels", MapType(StringType(), StringType()), False),
    StructField("ts", LongType(), False),
    StructField("value", DoubleType(), False),
    StructField("rank", LongType(), False),  # index position for overlap LWW
])


#: fixed "now" so now-relative suites (tsdb_rest_it_example) are
#: reproducible — only consistency between data and query matters
NOW_MS = 1_750_000_000_000  # 2025-06-15T15:06:40Z


def iso_ms(s: str) -> int:
    s = s.strip()
    if s == "now" or s.startswith("now-") or s.startswith("now+"):
        if s == "now":
            return NOW_MS
        sign = -1 if s[3] == "-" else 1
        return NOW_MS + sign * parse_duration_ms(s[4:])
    return int(
        datetime.datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp() * 1000
    )


def parse_labels(s: str) -> dict[str, str]:
    out = {}
    for pair in s.split(","):
        k, _, v = pair.strip().partition(":")
        out[k] = v
    return out


def load_suite(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def step_settings(suite: dict) -> dict[str, int]:
    """index name → default step ms from index.tsdb_engine.lang.m3
    .default_step_size (the step-size-from-settings suite)."""
    out = {}
    for cfg in (suite.get("test_setup") or {}).get("index_configs", []):
        setting = (cfg.get("settings") or {}).get(
            "index.tsdb_engine.lang.m3.default_step_size"
        )
        if setting:
            out[cfg["name"]] = parse_duration_ms(setting)
    return out


def build_tables(spark: SparkSession, suite: dict) -> dict[str, DataFrame]:
    """input_data_list → {index_name: samples df} (InputDataConfig.java:42)."""
    tables: dict[str, list] = {}
    for idx, entry in enumerate(suite["test_case"].get("input_data_list", [])):
        rows = tables.setdefault(entry["index_name"], [])
        if entry.get("input_data_type") == "GENERIC":
            for metric in entry.get("metrics", []):
                labels = parse_labels(metric["labels"])
                for pt in metric.get("data_points", []):
                    if pt.get("value") is None:
                        continue
                    rows.append((labels, iso_ms(pt["timestamp"]), float(pt["value"]), idx))
        else:  # FIXED_INTERVAL
            tc = entry["time_config"]
            start = iso_ms(tc["min_timestamp"])
            step = parse_duration_ms(tc["step"])
            for metric in entry.get("regular_metrics", []):
                labels = parse_labels(metric["labels"])
                for i, v in enumerate(metric.get("values", [])):
                    if v is None:
                        continue
                    rows.append((labels, start + i * step, float(v), idx))
    return {
        name: spark.createDataFrame(rows, _FIXTURE_SCHEMA).cache()
        for name, rows in tables.items()
    }


class FixtureSource:
    """M3Source over fixture sample DataFrames (one per queried index).

    fetch = label-map predicates + scan-window filter + rebucket to the
    window-anchored grid with LWW (latest ts wins; across indices at the
    same ts, the later-listed index wins — the ResolvedPartitions
    overlap rule).
    """

    def __init__(self, spark: SparkSession, dfs: list[DataFrame]):
        self.spark = spark
        self.dfs = dfs

    def fetch(
        self,
        match: dict[str, list[str]],
        inverse: dict[str, list[str]],
        min_ts: int,
        max_ts: int,
        step: int,
        match_re=None,
        inverse_re=None,
    ) -> SeriesFrame:
        if self.dfs:
            df = self.dfs[0]
            for other in self.dfs[1:]:
                df = df.unionByName(other)
        else:
            df = self.spark.createDataFrame([], _FIXTURE_SCHEMA)
        lbl = F.col("labels")
        where = (F.col("ts") >= F.lit(min_ts)) & (F.col("ts") < F.lit(max_ts))
        for key, values in match.items():
            where = where & tag_filter_predicate(lbl[key], values)
        for key, values in inverse.items():
            # absent label counts as "not matching" → negation keeps it
            p = tag_filter_predicate(lbl[key], values)
            where = where & ~F.coalesce(p, F.lit(False))
        bucket = (
            F.lit(min_ts)
            + ((F.col("ts") - F.lit(min_ts)) / F.lit(step)).cast("long") * F.lit(step)
        ).alias("__bucket")
        aligned = (
            df.filter(where)
            .withColumn("series_key", series_key_expr())
            .withColumn("__bucket", bucket)
            .groupBy("series_key", "__bucket")
            .agg(
                F.expr(
                    "max_by(value, named_struct('ts', ts, 'rank', rank))"
                ).alias("value")
            )
        )
        from time_series_db_spark.model import labels_from_key_expr

        out = aligned.select(
            F.col("series_key"),
            labels_from_key_expr(F.col("series_key")).alias("labels"),
            F.lit(None).cast("string").alias("alias"),
            F.col("__bucket").alias("ts"),
            F.col("value"),
        ).select(*SAMPLE_COLS)
        return SeriesFrame(df=out, step=step, min_ts=min_ts, max_ts=max_ts)

    def mock_fetch(self, values, tags, min_ts, max_ts, step) -> SeriesFrame:
        return synth_mock_series(self.spark, values, tags, min_ts, max_ts, step)


def _partition_windows(qcfg: dict) -> dict[str, tuple[int, int]]:
    """QueryConfig.resolved_partitions → {index: (start, end)} scan
    windows (ResolvedPartitions routing: each partition is read only
    inside its resolved window)."""
    out = {}
    for rp in qcfg.get("resolved_partitions", []) or []:
        for w in rp.get("windows", []):
            # partition ids come as "cluster:index" or bare "index"
            # (ResolvedPartitions index-name parsing) — read the index part
            name = w["partition"].rsplit(":", 1)[-1]
            out[name] = (iso_ms(w["start"]), iso_ms(w["end"]))
    return out


def run_query(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    qcfg: dict,
    index_steps: dict[str, int] | None = None,
) -> SeriesFrame:
    windows = _partition_windows(qcfg)
    if windows:
        # resolved_partitions override the URL indices param entirely
        indices = list(windows)
    else:
        indices = [s.strip() for s in qcfg.get("indices", "").split(",") if s.strip()]
        if not indices:
            indices = list(tables)  # no indices key → query every suite index
    dfs = []
    for i in indices:
        if i not in tables:
            raise LookupError(f"index_not_found_exception: no such index [{i}]")
        df = tables[i]
        if i in windows:
            lo, hi = windows[i]
            df = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        dfs.append(df)
    source = FixtureSource(spark, dfs)
    tc = qcfg["time_config"]
    start, end = iso_ms(tc["min_timestamp"]), iso_ms(tc["max_timestamp"])
    step = parse_duration_ms(tc["step"])
    if tc.get("send_step_param") is False and index_steps:
        for i in indices:
            if i in index_steps:
                step = index_steps[i]
                break
    return m3_execute(qcfg["query"], source, start, end, step)


def _expected_series(qcfg: dict) -> dict[tuple, list[tuple[int, float]]]:
    tc = qcfg["time_config"]
    start = iso_ms(tc["min_timestamp"])
    step = parse_duration_ms(tc["step"])
    out = {}
    for entry in qcfg["expected"].get("data", []) or []:
        labels = {str(k): str(v) for k, v in (entry.get("metric") or {}).items()}
        alias = entry.get("alias")
        pairs = [
            (start + i * step, float(v))
            for i, v in enumerate(entry.get("values", []))
            if v is not None
        ]
        out[(frozenset(labels.items()), alias)] = pairs
    return out


def _actual_series(sf: SeriesFrame) -> dict[tuple, list[tuple[int, float]]]:
    out: dict[tuple, list] = {}
    for row in sf.df.collect():
        key = (frozenset((row.labels or {}).items()), row.alias)
        out.setdefault(key, []).append((row.ts, row.value))
    return {k: sorted(v) for k, v in out.items()}


def _fmt(key: tuple) -> str:
    labels, alias = dict(key[0]), key[1]
    return f"{labels}" + (f" alias={alias!r}" if alias else "")


def check_query(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    qcfg: dict,
    index_steps: dict[str, int] | None = None,
) -> None:
    """Run one QueryConfig and assert the expected response — the Spark
    port of BaseQueryExecutor.validateResponse."""
    if qcfg["expected"].get("status") == "failure":
        try:
            _actual_series(run_query(spark, tables, qcfg, index_steps))
        except Exception:
            return
        raise AssertionError(f"{qcfg['name']}: expected failure, query succeeded")

    actual = _actual_series(run_query(spark, tables, qcfg, index_steps))
    expected = _expected_series(qcfg)
    assert len(actual) == len(expected), (
        f"{qcfg['name']}: series count {len(actual)} != expected {len(expected)}\n"
        f"actual keys: {[_fmt(k) for k in actual]}\n"
        f"expected keys: {[_fmt(k) for k in expected]}"
    )
    for key, epairs in expected.items():
        apairs = actual.get(key)
        assert apairs is not None, (
            f"{qcfg['name']}: missing series {_fmt(key)}; "
            f"got {[_fmt(k) for k in actual]}"
        )
        assert len(apairs) == len(epairs), (
            f"{qcfg['name']}: {_fmt(key)} pair count {len(apairs)} != "
            f"{len(epairs)}\nactual:   {apairs}\nexpected: {epairs}"
        )
        for (ats, av), (ets, ev) in zip(apairs, epairs):
            ok = ats == ets and (
                (math.isnan(av) and math.isnan(ev))
                or math.isclose(av, ev, rel_tol=1e-9, abs_tol=1e-9)
            )
            assert ok, (
                f"{qcfg['name']}: {_fmt(key)} pair ({ats}, {av}) != "
                f"expected ({ets}, {ev})\nactual:   {apairs}\nexpected: {epairs}"
            )
