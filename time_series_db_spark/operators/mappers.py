"""Per-sample scalar mapper stages (reference: AbstractMapperStage family).

Pure column expressions — no shuffle, whole-stage codegen, trivially
scale-independent. Each docstring cites the reference stage whose
semantics (NOT code) it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from time_series_db_spark.model import SeriesFrame

NAN = float("nan")
INF = float("inf")


def _map_value(sf: SeriesFrame, expr: Column) -> SeriesFrame:
    return sf.with_df(sf.df.withColumn("value", expr.cast("double")))


def abs_(sf: SeriesFrame) -> SeriesFrame:
    """|v| — AbsStage.java:54."""
    return _map_value(sf, F.abs(F.col("value")))


def logarithm(sf: SeriesFrame) -> SeriesFrame:
    """log10(v); 0 → −Inf, negative → NaN — LogarithmStage.java:54.

    Spark's ``log10`` returns NULL for non-positive input, so the Java
    double semantics are restored explicitly (missing stays missing; the
    NULL would otherwise violate the absent-row discipline).
    """
    v = F.col("value")
    expr = (
        F.when(v > 0, F.log10(v))
        .when(v == 0, F.lit(-INF))
        .otherwise(F.lit(NAN))  # negatives and NaN both land here
    )
    return _map_value(sf, expr)


def sqrt(sf: SeriesFrame) -> SeriesFrame:
    """√v; negative → NaN — SqrtStage.java:54 (Java Math.sqrt semantics,
    which Spark's double sqrt already matches)."""
    return _map_value(sf, F.sqrt(F.col("value")))


def scale(sf: SeriesFrame, factor: float) -> SeriesFrame:
    """v·factor — ScaleStage.java:58."""
    return _map_value(sf, F.col("value") * F.lit(float(factor)))


def divide_scalar(sf: SeriesFrame, divisor: float) -> SeriesFrame:
    """v/divisor with Java double semantics — DivideScalarStage.java:59.

    Spark SQL yields NULL on division by zero; Java yields ±Inf/NaN, so a
    zero divisor is expanded explicitly.
    """
    v = F.col("value")
    if float(divisor) == 0.0:
        expr = (
            F.when(v > 0, F.lit(INF))
            .when(v < 0, F.lit(-INF))
            .otherwise(F.lit(NAN))
        )
    else:
        expr = v / F.lit(float(divisor))
    return _map_value(sf, expr)


def offset(sf: SeriesFrame, amount: float) -> SeriesFrame:
    """v+c — OffsetStage.java:58 (value offset; time shifting is timeshift)."""
    return _map_value(sf, F.col("value") + F.lit(float(amount)))


def round_(sf: SeriesFrame, decimals: int) -> SeriesFrame:
    """Round to N decimals; negative N is identity — RoundStage.java:64."""
    if decimals < 0:
        return sf
    return _map_value(sf, F.round(F.col("value"), decimals))


def scale_to_seconds(sf: SeriesFrame, seconds: int) -> SeriesFrame:
    """v · seconds / (step/1000) — per-step value re-expressed per
    ``seconds`` — ScaleToSecondsStage.java:57 (formula in its javadoc)."""
    factor = float(seconds) * 1000.0 / float(sf.step)
    return _map_value(sf, F.col("value") * F.lit(factor))


def timeshift(sf: SeriesFrame, shift_ms: int) -> SeriesFrame:
    """Shift timestamps **forward** by |shift| — TimeshiftStage.java:65.

    The reference always shifts old data forward into the query window
    (javadoc :1-20) and widens the fetch window correspondingly
    (SourceBuilderVisitor.java:780-794). Callers fetch with
    ``[min_ts - shift, max_ts - shift)`` and then apply this.
    """
    shift = abs(int(shift_ms))
    out = sf.with_df(sf.df.withColumn("ts", F.col("ts") + F.lit(shift)))
    from dataclasses import replace

    return replace(out, min_ts=sf.min_ts + shift, max_ts=sf.max_ts + shift)
