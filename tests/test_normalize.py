"""TimeSeriesNormalizer parity — the javadoc example, verbatim.

Reference example (TimeSeriesNormalizer.java:49-66):
  Series A: 10-second steps [100, 120, 140] at [0s, 10s, 20s]
  Series B: 15-second steps [50, 75] at [0s, 15s]
  LCM(10,15)=30 + AVG → A=[120]@0, B=[62.5]@0
  MAX(10,15)=15 + AVG → A=[110]@0,[140]@15; B=[50]@0,[75]@15
  divide(A,B): 1.92 (LCM) / 2.2, 1.87 (MAX)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame, series_key_expr
from time_series_db_spark.operators import binary
from time_series_db_spark.operators.normalize import aligned, normalize_frames


def _frame(spark, labels, samples, step_ms, min_ts, max_ts):
    rows = [(labels, ts, float(v)) for ts, v in samples]
    df = (
        spark.createDataFrame(rows, "labels map<string,string>, ts long, value double")
        .withColumn("alias", F.lit(None).cast("string"))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return SeriesFrame(df=df, step=step_ms, min_ts=min_ts, max_ts=max_ts)


@pytest.fixture()
def ab(spark):
    a = _frame(spark, {"m": "a"}, [(0, 100), (10_000, 120), (20_000, 140)],
               10_000, 0, 30_000)
    b = _frame(spark, {"m": "b"}, [(0, 50), (15_000, 75)], 15_000, 0, 30_000)
    return a, b


def _vals(sf):
    return {r["ts"]: r["value"] for r in sf.df.collect()}


def test_lcm_strategy(ab):
    a, b = ab
    na, nb = normalize_frames([a, b], step_strategy="lcm", consolidation="avg")
    assert na.step == nb.step == 30_000
    assert _vals(na) == {0: 120.0}
    assert _vals(nb) == {0: 62.5}


def test_max_strategy(ab):
    a, b = ab
    na, nb = normalize_frames([a, b], step_strategy="max", consolidation="avg")
    assert na.step == nb.step == 15_000
    assert _vals(na) == {0: 110.0, 15_000: 140.0}
    assert _vals(nb) == {0: 50.0, 15_000: 75.0}


def test_divide_auto_normalizes(ab):
    """divide() auto-normalizes mixed-step sides (MAX strategy) — the
    javadoc's closing example: 110/50 = 2.2, 140/75 ≈ 1.87."""
    a, _ = ab
    assert not aligned(a, _)
    b_same = _frame(
        a.df.sparkSession, {"m": "a"}, [(0, 50), (15_000, 75)], 15_000, 0, 30_000
    )
    res = binary.divide(a, b_same)  # full-label match on the m:a series
    vals = _vals(res)
    assert vals[0] == pytest.approx(2.2)
    assert vals[15_000] == pytest.approx(140.0 / 75.0)
    assert res.step == 15_000


def test_type_aware_consolidation(spark):
    counter = _frame(
        spark, {"m": "c", "type": "counter"},
        [(0, 10), (10_000, 20), (20_000, 30)], 10_000, 0, 30_000,
    )
    gauge = _frame(
        spark, {"m": "g"}, [(0, 10), (10_000, 20), (20_000, 30)],
        10_000, 0, 30_000,
    )
    slow = _frame(spark, {"m": "s"}, [(0, 1)], 30_000, 0, 30_000)
    nc, ng, _ = normalize_frames(
        [counter, gauge, slow], step_strategy="max", consolidation="type_aware"
    )
    assert _vals(nc) == {0: 60.0}  # counter → SUM
    assert _vals(ng) == {0: 20.0}  # gauge → AVG


def test_aligned_passthrough(spark):
    a = _frame(spark, {"m": "a"}, [(0, 1)], 10_000, 0, 30_000)
    b = _frame(spark, {"m": "b"}, [(10_000, 2)], 10_000, 0, 30_000)
    na, nb = normalize_frames([a, b])
    # same plan object semantics: no re-bucketing added
    assert na.df is a.df and nb.df is b.df
    assert aligned(a, b)


def test_end_rounds_up_to_boundary(spark):
    a = _frame(spark, {"m": "a"}, [(0, 1)], 10_000, 0, 25_000)
    b = _frame(spark, {"m": "b"}, [(0, 2)], 15_000, 0, 20_000)
    na, nb = normalize_frames([a, b], step_strategy="lcm")
    assert na.step == 30_000
    assert na.min_ts == 0 and na.max_ts == 30_000  # ceil(25000/30000)
