"""Label / metadata stages — string ops on series identity.

All pure map/string expressions; stages that change label *keys or values*
recompute series_key (the ByteLabels analog) so downstream grouping and
joins stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame, series_key_expr

_TEMPLATE_RE = re.compile(r"\{\{\s*\.(\w+)\s*\}\}")


def alias(sf: SeriesFrame, template: str) -> SeriesFrame:
    """Rename series; ``{{.tag}}`` interpolates label values —
    AliasStage.java:32. The template is compiled driver-side into a
    ``concat`` of literals and label lookups."""
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.coalesce(F.col("labels")[m.group(1)], F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    expr = F.concat(*parts) if parts else F.lit(template)
    return sf.with_df(sf.df.withColumn("alias", expr))


def alias_by_tags(sf: SeriesFrame, tags: list[str]) -> SeriesFrame:
    """Alias = space-joined tag values, missing tags skipped —
    AliasByTagsStage.java:32 (``concat_ws`` skips NULLs natively)."""
    expr = F.concat_ws(" ", *[F.col("labels")[t] for t in tags])
    return sf.with_df(sf.df.withColumn("alias", expr))


def show_tags(sf: SeriesFrame, tags: list[str] | None = None) -> SeriesFrame:
    """Alias = ``k1:v1 k2:v2`` — all tags sorted by key, or the given tags
    in argument order — ShowTagsStage.java:38 (format rules javadoc :1-10)."""
    if tags:
        expr = F.concat_ws(
            " ",
            *[
                F.when(
                    F.col("labels")[t].isNotNull(),
                    F.concat(F.lit(t + ":"), F.col("labels")[t]),
                )
                for t in tags
            ],
        )
    else:
        expr = F.array_join(
            F.transform(
                F.array_sort(F.map_entries(F.col("labels"))),
                lambda e: F.concat(e.getField("key"), F.lit(":"), e.getField("value")),
            ),
            " ",
        )
    return sf.with_df(sf.df.withColumn("alias", expr))


def map_key(sf: SeriesFrame, old: str, new: str) -> SeriesFrame:
    """Rename a tag key — MapKeyStage.java:36. Series without the key pass
    through unchanged."""
    entries = F.transform(
        F.map_entries(F.col("labels")),
        lambda e: F.struct(
            F.when(e.getField("key") == old, F.lit(new))
            .otherwise(e.getField("key"))
            .alias("key"),
            e.getField("value").alias("value"),
        ),
    )
    df = (
        sf.df.withColumn("labels", F.map_from_entries(entries))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def tag_sub(sf: SeriesFrame, tag: str, pattern: str, replacement: str) -> SeriesFrame:
    """Regex substitution on a tag value (backrefs ``$1``…) —
    TagSubStage.java:36. Series without the tag pass through."""
    new_val = F.regexp_replace(F.col("labels")[tag], pattern, replacement)
    entries = F.transform(
        F.map_entries(F.col("labels")),
        lambda e: F.struct(
            e.getField("key").alias("key"),
            F.when(e.getField("key") == tag, new_val)
            .otherwise(e.getField("value"))
            .alias("value"),
        ),
    )
    df = (
        sf.df.withColumn("labels", F.map_from_entries(entries))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def alias_sub(sf: SeriesFrame, pattern: str, replacement: str) -> SeriesFrame:
    """aliasSub — reference known-but-unimplemented (Constants.java:45);
    Graphite semantics: regex substitution (backrefs ``$1``…) on the
    series' display name. Base = the current alias when set, else the
    ``name`` label (the display fallback)."""
    base = F.coalesce(F.col("alias"), F.col("labels")["name"])
    df = sf.df.withColumn(
        "alias", F.regexp_replace(base, pattern, replacement)
    ).select(*SAMPLE_COLS)
    return sf.with_df(df)


def tag_add(sf: SeriesFrame, key: str, value: str) -> SeriesFrame:
    """_tagAdd — reference known-but-unimplemented (Constants.java:42):
    set ``key=value`` on every series (overwriting an existing value) and
    recompute the series identity. Pure map expression, no shuffle."""
    df = (
        sf.df.withColumn(
            "labels",
            F.map_concat(
                F.map_filter(F.col("labels"), lambda k, _v: k != F.lit(key)),
                F.create_map(F.lit(key), F.lit(value)),
            ),
        )
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def label_replace(
    sf: SeriesFrame, dst: str, replacement: str, src: str, regex: str
) -> SeriesFrame:
    """PromQL label_replace(v, dst, replacement, src, regex) — beyond the
    reference (its FunctionType has no label functions). If ``regex``
    matches the ENTIRE ``src`` value (missing label = empty string),
    ``dst`` is set to ``replacement`` with ``$1``… backrefs; an empty
    result removes ``dst``; non-matching series pass through unchanged.
    Pure map expressions + identity recompute — no shuffle.

    Dialect note: execution is Java regex (``rlike``/``regexp_replace``
    run java.util.regex on executors), not Prometheus's RE2, so
    validation compiles the pattern with java.util.regex via the JVM
    gateway — a pattern that passes validation cannot fail later on an
    executor. Under Spark Connect (no JVM gateway) a best-effort Python
    ``re`` check runs instead."""
    jvm = getattr(sf.df.sparkSession, "_jvm", None)
    if jvm is not None:
        try:
            jvm.java.util.regex.Pattern.compile(regex)
        except Exception as e:
            raise ValueError(f"invalid label_replace regex: {e}") from e
    else:
        import re as _re

        try:
            _re.compile(regex)
        except _re.error as e:
            raise ValueError(f"invalid label_replace regex: {e}") from e
    lbl = F.col("labels")
    anchored = f"^(?:{regex})$"
    srcv = F.coalesce(lbl[src], F.lit(""))
    newv = F.regexp_replace(srcv, anchored, replacement)
    matched = srcv.rlike(anchored)
    without_dst = F.map_filter(lbl, lambda k, _v: k != F.lit(dst))
    add = F.when(
        newv == "", F.create_map().cast("map<string,string>")
    ).otherwise(F.create_map(F.lit(dst), newv))
    labels2 = F.when(matched, F.map_concat(without_dst, add)).otherwise(lbl)
    df = (
        sf.df.withColumn("labels", labels2)
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def label_join(
    sf: SeriesFrame, dst: str, sep: str, srcs: list[str]
) -> SeriesFrame:
    """PromQL label_join(v, dst, sep, src...) — dst = src values joined
    with sep (missing labels = empty string); an empty result removes
    dst. Same no-shuffle shape as :func:`label_replace`."""
    lbl = F.col("labels")
    joined = F.concat_ws(sep, *[F.coalesce(lbl[s], F.lit("")) for s in srcs])
    without_dst = F.map_filter(lbl, lambda k, _v: k != F.lit(dst))
    add = F.when(
        joined == "", F.create_map().cast("map<string,string>")
    ).otherwise(F.create_map(F.lit(dst), joined))
    df = (
        sf.df.withColumn("labels", F.map_concat(without_dst, add))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def alias_by_bucket(
    sf: SeriesFrame, bucket_range: str = "bucket", histogram: bool = False
) -> SeriesFrame:
    """aliasByBucket / aliasByHistogramBucket — reference
    known-but-unimplemented (lang/m3/common/Constants.java:47-48).
    Chosen, documented semantics: rename each histogram-bucket series by
    its bucket-range tag — ``aliasByBucket`` uses the raw ``"low-high"``
    tag value; ``aliasByHistogramBucket`` renders Prometheus-style
    ``"le <upper>"`` from the range's upper bound (taken as written in
    the tag, so ``+Inf`` and duration uppers stay verbatim). Series
    without the tag keep their current alias. Pure string expressions,
    no shuffle."""
    tag = F.col("labels")[bucket_range]
    if histogram:
        # last '-'-separated component = the upper bound as written
        # ("0-10" → "10", "-Inf-0" → "0", "10-+Inf" → "+Inf")
        expr = F.concat(F.lit("le "), F.substring_index(tag, "-", -1))
    else:
        expr = tag
    aliased = F.when(tag.isNotNull(), expr).otherwise(F.col("alias"))
    return sf.with_df(sf.df.withColumn("alias", aliased).select(*SAMPLE_COLS))


def alias_by_distinct_tags(sf: SeriesFrame) -> SeriesFrame:
    """aliasByDistinctTags — reference known-but-unimplemented
    (lang/m3/common/Constants.java:46). Chosen, documented semantics:
    alias each series by the values of the tags that DISTINGUISH it
    within the current series set — a tag distinguishes when its value
    varies across series or it is absent from some series. Values join
    with a space in sorted-key order (the aliasByTags format); when
    nothing varies (single series), the ``name`` label is the alias.

    Spark shape: the varying-key probe aggregates over DISTINCT series
    identities — series-count × tag-count rows, metadata-sized like the
    binary-op probes — then the alias itself is a pure expression over
    the collected key list; the data pass is untouched (no shuffle
    added to the main plan).
    """
    from time_series_db_spark import cache

    distinct_series = cache.persist_tracked(
        sf.df.select("series_key", "labels").dropDuplicates(["series_key"])
    )
    n_series = distinct_series.count()
    per_tag = (
        distinct_series.select(F.explode("labels").alias("k", "v"))
        .groupBy("k")
        .agg(
            F.countDistinct("v").alias("n_values"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .collect()
    )
    varying = sorted(
        r["k"] for r in per_tag if r["n_values"] > 1 or r["n_present"] < n_series
    )
    if varying:
        expr = F.concat_ws(" ", *[F.col("labels")[t] for t in varying])
    else:
        expr = F.col("labels")["name"]
    return sf.with_df(sf.df.withColumn("alias", expr).select(*SAMPLE_COLS))
