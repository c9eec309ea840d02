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


# ---------------------------------------------------------------------------
# PromQL math functions (FunctionType.java lists them; the reference's
# visitor throws "not yet implemented" — PromSourceBuilderVisitor.java:174.
# Each is the official Prometheus per-sample function, Java double
# semantics, pure column exprs.)
# ---------------------------------------------------------------------------


def _nan_guard(expr: Column) -> Column:
    """NaN passes through (Java double fns); Spark's floor/least/greatest
    would otherwise coerce NaN to 0 / a bound."""
    return F.when(F.isnan(F.col("value")), F.lit(NAN)).otherwise(expr)


def ceil(sf: SeriesFrame) -> SeriesFrame:
    """PromQL ceil() — FunctionType.CEIL."""
    return _map_value(sf, _nan_guard(F.expr("ceiling(value)"))) 


def floor(sf: SeriesFrame) -> SeriesFrame:
    """PromQL floor() — FunctionType.FLOOR."""
    return _map_value(sf, _nan_guard(F.floor(F.col("value"))))


def exp(sf: SeriesFrame) -> SeriesFrame:
    """PromQL exp() — FunctionType.EXP."""
    return _map_value(sf, F.exp(F.col("value")))


def _log_base(log_expr: Column) -> Column:
    """Shared non-positive handling: 0 → −Inf, negative → NaN (Java
    Math.log semantics; Spark logs return NULL instead)."""
    v = F.col("value")
    return (
        F.when(v > 0, log_expr).when(v == 0, F.lit(-INF)).otherwise(F.lit(NAN))
    )


def ln(sf: SeriesFrame) -> SeriesFrame:
    """PromQL ln() — FunctionType.LN."""
    return _map_value(sf, _log_base(F.log(F.col("value"))))


def log2(sf: SeriesFrame) -> SeriesFrame:
    """PromQL log2() — FunctionType.LOG2."""
    return _map_value(sf, _log_base(F.log2(F.col("value"))))


def sgn(sf: SeriesFrame) -> SeriesFrame:
    """PromQL sgn(): -1/0/1, NaN passes through — FunctionType.SGN."""
    v = F.col("value")
    expr = (
        F.when(F.isnan(v), F.lit(NAN))
        .when(v > 0, F.lit(1.0))
        .when(v < 0, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    return _map_value(sf, expr)


def clamp(sf: SeriesFrame, lo: float, hi: float) -> SeriesFrame:
    """PromQL clamp(v, min, max); min > max drops samples per the spec —
    FunctionType.CLAMP."""
    if lo > hi:
        return sf.with_df(sf.df.filter(F.lit(False)))
    return _map_value(
        sf,
        _nan_guard(
            F.least(F.greatest(F.col("value"), F.lit(float(lo))), F.lit(float(hi)))
        ),
    )


def clamp_min(sf: SeriesFrame, lo: float) -> SeriesFrame:
    """PromQL clamp_min() — FunctionType.CLAMP_MIN."""
    return _map_value(sf, _nan_guard(F.greatest(F.col("value"), F.lit(float(lo)))))


def clamp_max(sf: SeriesFrame, hi: float) -> SeriesFrame:
    """PromQL clamp_max() — FunctionType.CLAMP_MAX."""
    return _map_value(sf, _nan_guard(F.least(F.col("value"), F.lit(float(hi)))))


def round_nearest(sf: SeriesFrame, to_nearest: float = 1.0) -> SeriesFrame:
    """PromQL round(v, to_nearest): nearest multiple, ties round up —
    FunctionType.ROUND (distinct from M3 round_, which is decimal places).
    """
    n = F.lit(float(to_nearest))
    return _map_value(sf, _nan_guard(F.floor(F.col("value") / n + F.lit(0.5)) * n))


# ---------------------------------------------------------------------------
# PromQL trigonometric functions — FunctionType.{ACOS..TANH,DEG,RAD,PI}.
# Spark's trig builtins follow java.lang.Math (out-of-domain → NaN), which
# is exactly the Prometheus/Java contract, so these are direct mappings.
# ---------------------------------------------------------------------------

_TRIG = {
    "acos": F.acos, "acosh": F.acosh, "asin": F.asin, "asinh": F.asinh,
    "atan": F.atan, "atanh": F.atanh, "cos": F.cos, "cosh": F.cosh,
    "sin": F.sin, "sinh": F.sinh, "tan": F.tan, "tanh": F.tanh,
    "deg": F.degrees, "rad": F.radians,
}


def trig(sf: SeriesFrame, fn: str) -> SeriesFrame:
    """One of the 14 PromQL trig/angle functions applied per sample."""
    return _map_value(sf, _TRIG[fn](F.col("value")))


def pi(sf: SeriesFrame) -> SeriesFrame:
    """PromQL pi(): every sample's value becomes π — FunctionType.PI."""
    import math

    return _map_value(sf, F.lit(math.pi))


# ---------------------------------------------------------------------------
# PromQL time functions — FunctionType.{TIME..YEAR}. Prometheus interprets
# the sample *value* as seconds since epoch, UTC. Calendar fields go
# through date_from_unix_date (a timezone-free DATE from days-since-epoch)
# so results do not depend on spark.sql.session.timeZone; hour/minute are
# pure modular arithmetic.
# ---------------------------------------------------------------------------


def _epoch_days() -> Column:
    return F.floor(F.col("value") / F.lit(86400.0)).cast("int")


def _time_field(field: str) -> Column:
    d = F.date_from_unix_date(_epoch_days())
    v = F.col("value")
    exprs = {
        "day_of_month": F.dayofmonth(d),
        # Spark: 1=Sunday..7 → Prometheus: 0=Sunday..6
        "day_of_week": F.dayofweek(d) - F.lit(1),
        "day_of_year": F.dayofyear(d),
        "days_in_month": F.dayofmonth(F.last_day(d)),
        "month": F.month(d),
        "year": F.year(d),
        "hour": F.floor((v - _epoch_days() * F.lit(86400.0)) / F.lit(3600.0)),
        "minute": F.floor(
            (v - F.floor(v / F.lit(3600.0)) * F.lit(3600.0)) / F.lit(60.0)
        ),
    }
    return exprs[field]


def time_field(sf: SeriesFrame, field: str) -> SeriesFrame:
    """day_of_month / day_of_week / day_of_year / days_in_month / hour /
    minute / month / year over value-as-epoch-seconds."""
    return _map_value(sf, _nan_guard(_time_field(field)))


def timestamp_(sf: SeriesFrame) -> SeriesFrame:
    """PromQL timestamp(): each sample's value becomes its own timestamp
    in seconds — FunctionType.TIMESTAMP."""
    return _map_value(sf, F.col("ts") / F.lit(1000.0))
