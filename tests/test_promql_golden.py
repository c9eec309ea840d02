"""PromQL parser parity against the reference's golden corpus.

The reference ships 8 PromQL queries with expected AST dumps
(src/test/resources/org/opensearch/tsdb/lang/prom/data/) — byte-for-byte
comparison, SURVEY.md §5 layer 2 for the Prom front-end.
"""

from __future__ import annotations

import pathlib

import pytest

DATA = pathlib.Path(
    "/root/reference/src/test/resources/org/opensearch/tsdb/lang/prom/data"
)

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference golden corpus not available"
)


def _cases() -> list[str]:
    if not DATA.exists():
        return []
    return sorted(
        (p.stem for p in (DATA / "queries").glob("*.promql")),
        key=lambda s: int(s),
    )


@pytest.mark.parametrize("case", _cases())
def test_ast_golden(case: str) -> None:
    from time_series_db_spark.lang.prom.parser import parse

    query = (DATA / "queries" / f"{case}.promql").read_text()
    expected = (DATA / "ast" / f"{case}.txt").read_text()
    root = parse(query)
    assert root.dump() + "\n" == expected, f"AST mismatch for case {case}"


def test_scalar_args_and_without() -> None:
    """Extensions beyond the reference grammar: scalar fn args and the
    `without` modifier parse into the expected shapes."""
    from time_series_db_spark.lang.prom import ast as A
    from time_series_db_spark.lang.prom.parser import parse

    root = parse('quantile_over_time(0.9, up{job="x"}[5m])')
    fn = root.children[0]
    assert isinstance(fn, A.FunctionCallNode)
    assert fn.scalars == [0.9]
    assert isinstance(fn.children[0], A.RangeVectorSelectorNode)
    assert fn.children[0].range_ms == 300_000

    root = parse("sum without (instance) (up)")
    agg = root.children[0]
    assert isinstance(agg, A.AggregationNode)
    assert agg.modifier == "without"
    assert agg.labels == ["instance"]


def test_param_aggregations_parse() -> None:
    from time_series_db_spark.lang.prom import ast as A
    from time_series_db_spark.lang.prom.parser import parse

    agg = parse("topk(5, sum by (name) (up))").children[0]
    assert isinstance(agg, A.AggregationNode)
    assert agg.agg_type == "topk" and agg.param == 5.0

    agg = parse("quantile by (region) (0.99, up)").children[0]
    assert agg.agg_type == "quantile" and agg.param == 0.99
    assert agg.modifier == "by" and agg.labels == ["region"]


def _holt_winters_ref(values: list[float], s: float, t: float) -> float:
    """Prometheus holtWinters (promql/functions.go): s0=x0, b0=x1-x0."""
    level, trend = values[0], values[1] - values[0]
    for x in values[1:]:
        new_level = s * x + (1 - s) * (level + trend)
        trend = t * (new_level - level) + (1 - t) * trend
        level = new_level
    return level


def test_holt_winters_golden(spark):
    """holt_winters fold (SQL aggregate expr) matches the Prometheus
    recurrence computed in Python over a known series."""
    from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame, series_key_expr
    from time_series_db_spark.operators.windows import holt_winters

    import pyspark.sql.functions as F

    H = 3_600_000
    T0 = 1_704_067_200_000
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 17.0, 21.0]
    rows = [({"name": "m"}, T0 + i * H, v) for i, v in enumerate(vals)]
    df = (
        spark.createDataFrame(rows, "labels map<string,string>, ts long, value double")
        .withColumn("alias", F.lit(None).cast("string"))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    sf = SeriesFrame(df=df, step=H, min_ts=T0, max_ts=T0 + len(vals) * H)
    out = holt_winters(sf, 4 * H, 0.3, 0.1)
    got = {r["ts"]: r["value"] for r in out.df.collect()}
    # at the last grid point the trailing 4h window holds the last 4 samples
    expected_last = _holt_winters_ref(vals[-4:], 0.3, 0.1)
    assert got[T0 + 7 * H] == pytest.approx(expected_last, rel=1e-12)
    # windows with <2 samples → NaN
    assert got[T0] != got[T0]  # NaN


def test_histogram_quantile_interpolation(spark):
    """histogram_quantile matches the Prometheus bucketQuantile algorithm
    on hand-computed cumulative buckets."""
    from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame, series_key_expr
    from time_series_db_spark.operators.grouping import histogram_quantile

    import pyspark.sql.functions as F

    H = 3_600_000
    T0 = 1_704_067_200_000
    # cumulative buckets at one ts: le=1:2, le=5:6, le=+Inf:10 (total 10)
    rows = [
        ({"name": "lat", "le": "1"}, T0, 2.0),
        ({"name": "lat", "le": "5"}, T0, 6.0),
        ({"name": "lat", "le": "+Inf"}, T0, 10.0),
    ]
    df = (
        spark.createDataFrame(rows, "labels map<string,string>, ts long, value double")
        .withColumn("alias", F.lit(None).cast("string"))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    sf = SeriesFrame(df=df, step=H, min_ts=T0, max_ts=T0 + H)
    # φ=0.5 → rank 5: falls in (1,5] bucket: 1 + 4*(5-2)/(6-2) = 4.0
    got = histogram_quantile(sf, 0.5).df.collect()
    assert len(got) == 1
    assert got[0]["value"] == pytest.approx(4.0)
    assert dict(got[0]["labels"]) == {"name": "lat"}
    # φ=0.95 → rank 9.5: +Inf bucket → highest finite le = 5
    got = histogram_quantile(sf, 0.95).df.collect()
    assert got[0]["value"] == pytest.approx(5.0)
