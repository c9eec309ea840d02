"""Mixed-step normalization — TimeSeriesNormalizer rebuilt on groupBy.

Reference (query/aggregator/TimeSeriesNormalizer.java:17-66 javadoc):
before arithmetic between series with misaligned steps/ranges,

1. common step = LCM or MAX of all step sizes (StepSizeStrategy);
2. time range = union of all ranges, end rounded up to a step boundary;
3. each series resampled onto the common buckets with a consolidation
   function — AVG/SUM/MAX/MIN/LAST, or TYPE_AWARE (series labeled
   ``type=counter|counts`` consolidate with SUM, everything else AVG).

Used by the coordinator before grouping stages (TYPE_AWARE + MAX —
AbstractGroupingStage.java:214-227) and before binary projections.

Spark shape: resampling is one ``groupBy(series_key, bucket)`` per frame —
map-side partial aggregation, a single shuffle keyed by series×bucket, no
skew (buckets are uniform). Frames already on the target grid pass through
untouched (metadata-only update), so the common single-step query path
never pays a normalization shuffle.
"""

from __future__ import annotations

from dataclasses import replace
from functools import reduce
from math import gcd

from pyspark.sql import functions as F

from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame

NAN = float("nan")

_CONSOLIDATIONS = ("avg", "sum", "max", "min", "last", "type_aware")


def _lcm(a: int, b: int) -> int:
    return a // gcd(a, b) * b


def _nan_aware(agg, col="value"):
    """Java Math.min/max/+ propagate NaN; Spark min/max would ignore it."""
    return F.when(F.max(F.isnan(col).cast("int")) == 1, F.lit(NAN)).otherwise(agg)


def _consolidation_expr(consolidation: str):
    v = F.col("value")
    if consolidation == "avg":
        return F.avg(v)  # NaN propagates through Spark avg, as in Java
    if consolidation == "sum":
        return F.sum(v)
    if consolidation == "max":
        return _nan_aware(F.max(v))
    if consolidation == "min":
        return _nan_aware(F.min(v))
    if consolidation == "last":
        return F.expr("max_by(value, ts)")
    # TYPE_AWARE: counter/counts series sum, others average
    # (TimeSeriesNormalizer.java:141-168); the counter flag is a group-key
    # column (constant per series), so the buffer stays primitive
    return F.when(F.col("__ctr"), F.sum(v)).otherwise(F.avg(v))


def resample(
    sf: SeriesFrame, start: int, end: int, step: int,
    consolidation: str = "type_aware",
) -> SeriesFrame:
    """Re-bucket one frame onto the grid ``start + k·step`` over
    [start, end). Already-aligned frames return with metadata updated and
    the DataFrame untouched (no shuffle)."""
    if consolidation not in _CONSOLIDATIONS:
        raise ValueError(f"unknown consolidation: {consolidation}")
    if sf.step == step and (sf.min_ts - start) % step == 0:
        return replace(sf, min_ts=start, max_ts=end, step=step)
    bucket = F.lit(start) + F.floor(
        (F.col("ts") - F.lit(start)) / F.lit(step)
    ).cast("long") * F.lit(step)
    ctr = F.lower(F.col("labels")["type"]).isin("counter", "counts")
    from time_series_db_spark.model import labels_from_key_expr

    df = (
        sf.df.withColumn("__bucket", bucket)
        .withColumn("__ctr", F.coalesce(ctr, F.lit(False)))
        .groupBy("series_key", "alias", "__ctr", "__bucket")
        .agg(_consolidation_expr(consolidation).alias("value"))
        .withColumn("labels", labels_from_key_expr(F.col("series_key")))
        .select(
            "series_key", "labels", "alias",
            F.col("__bucket").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
        .select(*SAMPLE_COLS)
    )
    return SeriesFrame(df=df, step=step, min_ts=start, max_ts=end)


def normalize_frames(
    frames: list[SeriesFrame],
    step_strategy: str = "max",
    consolidation: str = "type_aware",
) -> list[SeriesFrame]:
    """Normalize N frames onto one common grid (the full reference
    algorithm, steps 1-5 of the javadoc). Identity when all frames already
    share step and aligned range."""
    if step_strategy not in ("lcm", "max"):
        raise ValueError(f"unknown step strategy: {step_strategy}")
    steps = [f.step for f in frames]
    if step_strategy == "lcm":
        common = reduce(_lcm, steps)
    else:
        common = max(steps)
    start = min(f.min_ts for f in frames)
    end = max(f.max_ts for f in frames)
    end = start + -(-(end - start) // common) * common  # ceil to boundary
    return [resample(f, start, end, common, consolidation) for f in frames]


def aligned(left: SeriesFrame, right: SeriesFrame) -> bool:
    """True when the two frames already share a step and grid phase —
    the no-normalization fast path."""
    return left.step == right.step and (left.min_ts - right.min_ts) % left.step == 0
