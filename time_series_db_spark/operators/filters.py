"""Filter / predicate stages.

Sample-level filters drop rows; series-level filters drop whole series.
All are Catalyst filters (pushed toward the scan when adjacent to fetch) or
a single windowed flag per series — no extra shuffles beyond the one the
flag needs.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame

#: FP tolerance for `eq`/`ne` comparisons (ValueFilterStage.java:59 applies
#: an epsilon to equality on doubles; exact value is semantic, not copied).
EQ_TOLERANCE = 1e-9

_OPS = {"eq", "ne", "gt", "ge", "lt", "le"}


def value_filter(sf: SeriesFrame, op: str, threshold: float) -> SeriesFrame:
    """Drop *samples* failing the comparison — ValueFilterStage.java:59.

    Surface names: eq/ne/ge/gt/le/lt, removeBelowValue (= ge),
    removeAboveValue (= le) — lang/m3/common/Constants.java:337-402.
    NaN fails every comparison (Java double compare), so NaN samples are
    dropped by all ops except ``ne``.
    """
    return sf.with_df(sf.df.filter(value_pred(F.col("value"), op, threshold)))


def value_pred(v, op: str, threshold: float):
    """The ValueFilterStage comparison as a reusable column predicate
    (shared with the divideWhen denominator guard). NaN fails every
    comparison except ``ne`` (Java double compare)."""
    if op not in _OPS:
        raise ValueError(f"unknown value_filter op: {op}")
    t = F.lit(float(threshold))
    return {
        "eq": F.abs(v - t) < F.lit(EQ_TOLERANCE),
        "ne": ~(F.abs(v - t) < F.lit(EQ_TOLERANCE)),
        "gt": v > t,
        "ge": v >= t,
        "lt": v < t,
        "le": v <= t,
    }[op]


def where(sf: SeriesFrame, tag_a: str, tag_b: str, negate: bool = False) -> SeriesFrame:
    """Keep series where labels[tag_a] ==/!= labels[tag_b] — WhereStage.java:35.

    Series missing either tag are dropped (no match possible).
    """
    a, b = F.col("labels")[tag_a], F.col("labels")[tag_b]
    cond = a.isNotNull() & b.isNotNull() & ((a != b) if negate else (a == b))
    return sf.with_df(sf.df.filter(cond))


def semver_sortable(col: Column) -> Column:
    """Order-preserving encoding of a dotted version string: each numeric
    component left-padded to width 10 — mirrors SemanticVersionComparator
    (common/SemanticVersionComparator.java) ordering via plain string
    comparison, so the filter stays a codegen'd expression."""
    return F.array_join(
        F.transform(F.split(col, "[.]"), lambda x: F.lpad(x, 10, "0")), "."
    )


#: flexible semver shape accepted by SemanticVersionComparator
#: .normalizeVersion ("1", "2.0", "v1.2.3", "1.10.0-alpha")
_SEMVER_RE = __import__("re").compile(r"^v?\d+(\.\d+){0,2}(-.+)?$")


def is_semver(value: str) -> bool:
    """Python-side mirror of SemanticVersionComparator.isSemanticVersion
    for literals known at plan time."""
    return bool(_SEMVER_RE.match(value.strip())) if value else False


def tag_compare(
    sf: SeriesFrame, tag: str, op: str, literal: str, semver: bool = False
) -> SeriesFrame:
    """Filter series by lexicographic or semantic-version comparison of a
    tag value against a literal — TagCompareStage.java:35. In semver mode
    (auto-enabled when the literal is a version — TagCompareStage
    .java:121-128) series whose value is not itself a version are
    dropped."""
    val = F.col("labels")[tag]
    lit = F.lit(literal)
    extra = F.lit(True)
    if semver:
        extra = F.col("labels")[tag].rlike(r"^v?\d+(\.\d+){0,2}(-.+)?$")
        val, lit = semver_sortable(val), semver_sortable(lit)
    cond = {
        "eq": val == lit,
        "ne": val != lit,
        "gt": val > lit,
        "ge": val >= lit,
        "lt": val < lit,
        "le": val <= lit,
    }[op]
    return sf.with_df(
        sf.df.filter(F.col("labels")[tag].isNotNull() & extra & cond)
    )


def exclude_by_tag(sf: SeriesFrame, tag: str, patterns: list[str]) -> SeriesFrame:
    """Drop series whose tag value matches ANY regex — ExcludeByTagStage.java:36.

    Series without the tag are kept (nothing to match).
    """
    val = F.col("labels")[tag]
    matched = F.lit(False)
    for p in patterns:
        matched = matched | val.rlike(p)
    return sf.with_df(sf.df.filter(val.isNull() | ~matched))


def remove_empty(sf: SeriesFrame) -> SeriesFrame:
    """Drop series with no samples or all-NaN values — RemoveEmptyStage.java:33.

    "No samples" is free in exploded form (no rows → nothing to drop); the
    all-NaN check is one boolean flag per series via a window — a single
    shuffle on series_key that downstream per-series ops reuse.
    """
    w = Window.partitionBy("series_key")
    flag = F.max((~F.isnan("value")).cast("int")).over(w)
    df = sf.df.withColumn("__has_real", flag).filter(F.col("__has_real") == 1).drop("__has_real")
    return sf.with_df(df)


def remove_percentile(sf: SeriesFrame, n: float, above: bool = True) -> SeriesFrame:
    """removeAbovePercentile / removeBelowPercentile — reference
    known-but-unimplemented (Constants.java:65-66); Graphite semantics:
    drop each series' samples above (below) that series' own Nth
    percentile (exact, linear interpolation).

    One whole-series window aggregate per series (partitionBy series_key,
    unbounded frame) — no shuffle beyond the window exchange, threshold
    computed once per series and broadcast down its rows by the window.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("series_key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    thr = F.expr(f"percentile(value, {float(n) / 100.0})").over(w)
    v = F.col("value")
    df = (
        sf.df.withColumn("__thr", thr)
        .filter((v <= F.col("__thr")) if above else (v >= F.col("__thr")))
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def n_percentile(sf: SeriesFrame, n: float) -> SeriesFrame:
    """nPercentile — reference known-but-unimplemented (Constants.java:63);
    Graphite semantics: replace each series' values with that series' own
    Nth percentile (exact, linear interpolation) — a flat line on the
    series' own sample timestamps.

    Same shape as :func:`remove_percentile`: one unbounded window
    aggregate per series, threshold broadcast down the series' rows by
    the window — no extra shuffle beyond the window exchange.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("series_key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pct = F.expr(f"percentile(value, {float(n) / 100.0})").over(w)
    df = sf.df.withColumn("value", pct.cast("double")).select(*SAMPLE_COLS)
    return sf.with_df(df)
