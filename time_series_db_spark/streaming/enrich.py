"""Streaming as-of enrichment — the stream-stream leg of the temporal
joins (operators/temporal.py).

A live pipeline enriches each event with the latest at-or-before event
of another stream (feature lookups, last-click attribution, sensor
alignment).  A TRUE unbounded as-of cannot stream — the right match for
a left event may arrive arbitrarily late and the engine would have to
keep every right event forever — so the streaming contract is the
tolerance-bounded one: the match must lie within ``tolerance_ms`` before
the left event, which is also exactly what bounds the join state.

Built from Spark's own primitives, no custom state code: a watermarked
stream-stream LEFT OUTER join with an event-time range condition
(state per key is evicted past watermark + tolerance), chained into an
append-mode ``max_by`` aggregation that picks the latest (ts, tiebreak)
match per left event once the watermark closes it — the multiple-
stateful-operator pipeline Spark supports natively since 3.5.

Batch equivalence is pinned by test: the streamed output equals
``operators.temporal.asof_join(..., tolerance_ms=...)`` on the same
data (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    tolerance_ms: int,
    id_col: str = "event_id",
    ts_col: str = "ts",
    right_cols: list[str] = ("value",),
    tiebreak_col: str = "event_id",
    watermark: str = "1 minute",
) -> DataFrame:
    """Enrich a left event stream with the latest right event within
    ``[l.ts - tolerance_ms, l.ts]`` on the same ``on`` keys.

    Both inputs are STREAMING frames with epoch-ms ``ts_col``; the
    output appends one finalized row per left event (right payload
    columns suffixed ``_r``, NULL when nothing matched in the window)
    once the watermark passes it.  Ties at one right timestamp resolve
    to the greatest ``tiebreak_col`` — identical semantics to the batch
    ``asof_join`` with the same tolerance.

    100 TB shape: join state is bounded per key by tolerance+watermark
    (the engine evicts the rest); the finalizing aggregation groups by
    the watermarked left event time, so its state is one in-flight row
    per unfinalized left event.  No applyInPandasWithState, no custom
    eviction logic.
    """
    if tolerance_ms <= 0:
        raise ValueError("tolerance_ms must be a positive duration")
    if not on:
        raise ValueError("streaming as-of requires at least one equi-key")
    keep = [c for c in left.columns]
    l = left.withColumn("__lt", F.timestamp_millis(F.col(ts_col))).withWatermark(
        "__lt", watermark
    )
    r = (
        right.select(
            *[F.col(k).alias(f"__r_{k}") for k in on],
            F.col(ts_col).alias("__rts"),
            F.col(tiebreak_col).cast("long").alias("__rtb"),
            *[F.col(c).alias(f"__rv_{c}") for c in right_cols],
        )
        .withColumn("__rt", F.timestamp_millis(F.col("__rts")))
        .withWatermark("__rt", watermark)
    )
    cond = (
        (F.col("__rt") >= F.col("__lt") - F.expr(
            f"INTERVAL {int(tolerance_ms)} MILLISECONDS"
        ))
        & (F.col("__rt") <= F.col("__lt"))
    )
    for k in on:
        cond = (F.col(k) == F.col(f"__r_{k}")) & cond
    j = l.join(r, cond, "leftOuter")
    payload = F.struct(
        F.col("__rts"), *[F.col(f"__rv_{c}") for c in right_cols]
    )
    agg = (
        j.groupBy(*keep, "__lt")
        .agg(
            F.max_by(payload, F.struct(F.col("__rts"), F.col("__rtb"))).alias(
                "__m"
            )
        )
        .select(
            *keep,
            F.col("__m.__rts").alias(f"{ts_col}_r"),
            *[
                F.col(f"__m.__rv_{c}").alias(f"{c}_r")
                for c in right_cols
            ],
        )
    )
    return agg
