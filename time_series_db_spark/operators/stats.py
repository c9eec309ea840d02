"""TSDB stats: the ``/_tsdb/stats`` surface as DataFrame aggregates.

The reference exposes ``GET /_tsdb/stats`` (query/rest/
RestTSDBStatsAction.java:1-60) with ``include=headStats,labelStats,
valueStats``: series count, sample/chunk counts, per-label-key value
cardinality, and min/max timestamps, shaped by ``InternalTSDBStats``
(query/aggregator/InternalTSDBStats.java). Against a SeriesFrame these
are plain aggregates Catalyst executes with partial aggregation — one
shuffle each, count-distinct via hash partial on (key, value).

At 100 TB, exact per-label cardinality over all history is a full-scan
aggregate; ``label_stats(approx=True)`` switches to
``approx_count_distinct`` (HyperLogLog++, fixed-size sketch, mergeable
map-side) which is the right call at scale — the reference's own label
stats walk Lucene term dictionaries, an approximation-free luxury of
having an inverted index we deliberately do not rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_db_spark.model import SAMPLE_COLS, SeriesFrame


def head_stats(sf: SeriesFrame) -> DataFrame:
    """series/sample counts + time bounds — the headStats section."""
    return sf.df.select(
        F.countDistinct("series_key").cast("long").alias("num_series"),
        F.count("value").cast("long").alias("num_samples"),
        F.min("ts").alias("min_timestamp"),
        F.max("ts").alias("max_timestamp"),
    )


def label_stats(sf: SeriesFrame, approx: bool = False) -> DataFrame:
    """Per-label-key value cardinality — the labelStats section.

    One row per label key: ``(label, cardinality)``. Series identities are
    deduplicated first (stats are over series, not samples), then the label
    maps explode into (key, value) pairs — both steps shuffle once on keys
    that are near-uniform (label keys), so no skew handling is needed.

    ``sf`` may be a SeriesFrame or an already-deduplicated identity
    DataFrame (``sources.fetch_series_identities`` — the fast path that
    skips sample alignment entirely when only identities are needed).
    """
    series = sf if isinstance(sf, DataFrame) else sf.distinct_series()
    exploded = series.select(F.explode("labels").alias("label", "val"))
    card = (
        F.approx_count_distinct("val") if approx else F.countDistinct("val")
    ).cast("long")
    return exploded.groupBy("label").agg(card.alias("cardinality"))


def label_value_stats(sf: SeriesFrame) -> DataFrame:
    """Per-(label, value) series counts — the grouped format's
    ``valuesStats`` maps and every ``format=flat`` array
    (TSDBStatsResponseListener.formatFlatResponse) derive from this one
    aggregate: one explode over deduplicated series identities, one
    shuffle on (label, value) with map-side partial counts.  Label-value
    cardinality is bounded by series cardinality, so the result is
    metadata-sized at any corpus scale."""
    series = sf.distinct_series()
    return (
        series.select(F.explode("labels").alias("label", "val"))
        .groupBy("label", "val")
        .agg(F.count(F.lit(1)).cast("long").alias("num_series"))
    )


def fetch_labels(sf: SeriesFrame) -> DataFrame:
    """Per-hit label retrieval — the ``_search`` ext ``tsdb_labels``
    fetch sub-phase (query/fetch/LabelsFetchSubPhase.java): every series
    matching the query carries its full label map in the response. The
    DocValues walk becomes a distinct over series identities (the labels
    ARE the identity here) exploded to (series_key, label, value) rows.
    ``sf`` may be a SeriesFrame or an identity DataFrame (see
    :func:`label_stats`).
    """
    series = sf if isinstance(sf, DataFrame) else sf.distinct_series()
    return series.select(
        "series_key", F.explode("labels").alias("label", "value")
    )


def value_stats(sf: SeriesFrame) -> DataFrame:
    """Value distribution summary — the valueStats section (min/max/avg +
    NaN count; the reference reports per-field value statistics)."""
    v = F.col("value")
    finite = F.when(~F.isnan(v), v)
    return sf.df.select(
        F.count(v).cast("long").alias("num_values"),
        F.sum(F.isnan(v).cast("long")).alias("num_nan"),
        F.min(finite).alias("min_value"),
        F.max(finite).alias("max_value"),
        F.avg(finite).alias("avg_value"),
    )


def _single_series_target(sf: SeriesFrame, target: dict[str, str], kind: str):
    """Shared one-series target selection for the correlate family:
    build the label-equality predicate, probe-enforce the exactly-one
    contract (a loose matcher would silently multi-match every ts in
    the join, corrupt the moments, AND broadcast an unbounded
    data-dependent table — the 2-row memoized distinct probe catches it
    before anything shuffles), and return the matched target frame."""
    if not target:
        raise ValueError(f"{kind} needs at least one label matcher")
    from time_series_db_spark.cache import probe_memo

    pred = None
    for k, v in target.items():
        c = F.col("labels")[k] == F.lit(v)
        pred = c if pred is None else pred & c
    # Pin the matched target (ONE series after the probe check — a few
    # hundred rows): without the pin the broadcast build re-executed the
    # full upstream scan+aggregation chain on EVERY run (r14 plan audit
    # of m3_rolling_corr: two complete parquet scans per action, the
    # target-label predicate re-inlining the series-key decode into the
    # scan filter).  With it, the probe materializes the tiny frame once
    # and the broadcast reads the cache; released at the query boundary.
    from time_series_db_spark.cache import persist_tracked

    matched = persist_tracked(sf.df.filter(pred))
    n_tgt = probe_memo(
        matched,
        kind,
        lambda: matched.select("series_key").distinct().limit(2).count(),
    )
    if n_tgt != 1:
        raise ValueError(
            f"{kind} matcher {target} selects {n_tgt} series; "
            "it must select exactly one (tighten the label matcher)"
        )
    return matched


def correlate_target(
    sf: SeriesFrame,
    target: dict[str, str],
    min_points: int = 3,
) -> DataFrame:
    """One-vs-all Pearson correlation against a target series — the
    "what moves with this metric" fleet-diagnosis query (the classic
    companion to anomaly detection: detect a shift on one series, then
    rank every other series by co-movement to find the blast radius).

    ``target`` selects exactly one series by label equality; every
    series in ``sf`` (the target included, corr = 1) is correlated with
    it over their shared timestamps.  Returns one row per series with
    ≥ ``min_points`` overlapping finite samples and defined correlation
    (zero-variance series drop — correlation is undefined, not zero):
    ``(series_key, labels, corr, n_points)``, strongest |corr| not
    pre-sorted — callers rank.

    Scale shape: the target is ONE series (≤ grid-length rows) pulled
    off the same scan with its label predicate pushed down; it
    broadcasts into a hash join on ``ts`` against the full frame — the
    corpus pays one scan and one partial-aggregated groupBy on
    series_key, nothing pairwise, no second pass.  An all-pairs
    correlation matrix is deliberately NOT this operator (that is
    O(S²) and needs its own celled design); one-vs-all is the shape
    that survives 100 TB.
    """
    from time_series_db_spark.model import labels_from_key_expr

    matched = _single_series_target(sf, target, "correlate_target")
    tgt = matched.select(
        F.col("ts").alias("__tts"), F.col("value").alias("__tv")
    )
    finite = (
        ~F.isnan("value") & ~F.isnan("__tv")
    )
    out = (
        sf.df.join(F.broadcast(tgt), F.col("ts") == F.col("__tts"))
        .filter(finite)
        .groupBy("series_key")
        .agg(
            # Pearson from the stable co-moments, not F.corr: under ANSI
            # mode Corr raises DIVIDE_BY_ZERO on a zero-variance series,
            # and "constant series drops" is this operator's contract
            F.try_divide(
                F.covar_pop("value", "__tv"),
                F.stddev_pop("value") * F.stddev_pop("__tv"),
            ).alias("corr"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .filter(
            (F.col("n_points") >= F.lit(int(min_points)))
            & F.col("corr").isNotNull()
            & ~F.isnan("corr")
        )
        .withColumn("labels", labels_from_key_expr(F.col("series_key")))
        .select("series_key", "labels", "corr", "n_points")
    )
    return out


def correlate_matrix(
    sf: SeriesFrame,
    coarse_ms: int,
    band_symbols: int | str = 4,
    max_bucket: int = 32,
    min_points: int = 3,
    min_abs_corr: float = 0.0,
) -> DataFrame:
    """Celled all-pairs Pearson correlation — the "which series
    co-move" fleet-clustering matrix that :func:`correlate_target`'s
    docstring defers: exact correlation computed ONLY for candidate
    pairs surfaced by a cheap per-series trend sketch, never for all
    S² pairs (the MinHash-LSH banding discipline from pipeline/dedup
    applied to series shape instead of text shingles).

    Candidate generation: each series collapses to coarse buckets of
    ``coarse_ms`` (exact-decimal bucket sums so every sign test is
    engine-exact), empty buckets between the series' first and last
    present bucket carry the last present bucket forward (keepLastValue
    at sketch granularity — sparse series still produce contiguous
    sketches), and consecutive bucket means become an up/down/flat
    symbol (``sign(mean_next − mean)`` evaluated as the cross-product
    ``s₂·n₁ vs s₁·n₂`` — no float division).  The symbol string is
    banded ``band_symbols`` per band; two series are candidates iff
    some full band matches exactly (co-movement) or matches the u↔d
    inverted band (anti-correlation — the matrix must surface strong
    NEGATIVE correlations too).  Strongly correlated series agree on
    almost every coarse delta sign, so they collide in almost every
    band; unrelated series must match all ``band_symbols`` signs at
    once (~(1/2)^band_symbols per band, the LSH AND-amplification).

    Stop-band pruning: a collision bucket holding more than
    ``max_bucket`` series is UNINFORMATIVE (a fleet-wide pattern — the
    shared diurnal wave, the everything-is-flat band) and is dropped
    before pairing, exactly the stop-shingle discipline that keeps
    MinHash-LSH sub-quadratic on skewed corpora.  This bounds
    candidates at ``buckets · max_bucket²`` regardless of fleet size —
    measured 31.6k → 41.3k candidates across a 10× fleet on the bench
    corpus.  Fleet-wide clusters wider than ``max_bucket`` are
    deliberately not this operator's output (raise the cap or detect
    them with :func:`fleet_outlier_scores`-style aggregates).

    Exact stage: candidate pairs join the finite samples twice
    (equi-joins on series key, then on (key, ts)), Pearson from the
    stable co-moments over SHARED raw timestamps only (``try_divide``
    — zero-variance pairs drop, the :func:`correlate_target`
    contract), ``n_points ≥ min_points`` and ``|corr| ≥
    min_abs_corr`` — with ``corr`` quantized to the engine-portable
    1e-4 grid BEFORE the threshold compare (a pair within an ulp of
    the cut would otherwise be included by one engine and excluded by
    the other, flipping the differential row set).  Returns ``(key_a,
    key_b, labels_a, labels_b, corr, n_points)`` with ``corr`` on the
    1e-4 grid and ``key_a < key_b`` canonically.

    Scale shape: the corpus is scanned once into a fleet×buckets
    partial aggregate; the gap-fill sequence explode is fleet×(span/
    coarse) rows; both window layers and the band groupBy share the
    ONE series_key exchange; both candidate joins are EQUI hash joins
    on (band, signature) — never a band-wide or corpus-wide cross
    product.  The quadratic all-pairs path exists only as the test
    oracle (the dedup discipline).
    """
    if (
        coarse_ms <= 0
        or (band_symbols != "auto" and int(band_symbols) <= 0)
        or max_bucket <= 1
    ):
        raise ValueError(
            "correlate_matrix needs coarse_ms > 0, band_symbols > 0 "
            "or 'auto', max_bucket > 1"
        )
    from time_series_db_spark.model import labels_from_key_expr

    finite = sf.df.filter(~F.isnan("value")).select(
        "series_key", "ts", "value"
    )
    cand = correlate_matrix_candidates(
        sf, coarse_ms, band_symbols, max_bucket
    )
    av = finite.select(
        F.col("series_key").alias("__ka"),
        "ts",
        F.col("value").alias("__va"),
    )
    bv = finite.select(
        F.col("series_key").alias("__kb"),
        "ts",
        F.col("value").alias("__vb"),
    )
    return (
        cand.join(av, "__ka")
        .join(bv, ["__kb", "ts"])
        .groupBy("__ka", "__kb")
        .agg(
            F.try_divide(
                F.covar_pop("__va", "__vb"),
                F.stddev_pop("__va") * F.stddev_pop("__vb"),
            ).alias("corr"),
            F.count(F.lit(1)).alias("n_points"),
        )
        # 1e-4 quantization (catalog.quant's grid — |corr| ≤ 1, so the
        # NaN/1e12 guards are vacuous) BEFORE the threshold filter:
        # both engines compare the same grid value, never a raw float
        .withColumn(
            "corr",
            F.floor(F.col("corr") * F.lit(10000.0) + F.lit(0.5))
            / F.lit(10000.0),
        )
        .filter(
            (F.col("n_points") >= F.lit(int(min_points)))
            & F.col("corr").isNotNull()
            & ~F.isnan("corr")
            & (F.abs("corr") >= F.lit(float(min_abs_corr)))
        )
        .select(
            F.col("__ka").alias("key_a"),
            F.col("__kb").alias("key_b"),
            labels_from_key_expr(F.col("__ka")).alias("labels_a"),
            labels_from_key_expr(F.col("__kb")).alias("labels_b"),
            "corr",
            "n_points",
        )
    )


def correlate_matrix_candidates(
    sf: SeriesFrame,
    coarse_ms: int,
    band_symbols: int | str = 4,
    max_bucket: int = 32,
) -> DataFrame:
    """Candidate-pair stage of :func:`correlate_matrix`, exposed so the
    bench can LOG AND BUDGET the candidate count: the stop-band cap is
    the one thing standing between this operator and a quadratic
    blowup on a skewed fleet (measured: 370M pairs without the cap on
    the 10× corpus), so a banding change that silently re-opens it
    must fail a budget assertion, not a 10-minute wall.  Returns
    distinct ``(__ka, __kb)`` with ``__ka < __kb``.

    ``band_symbols="auto"`` (r12, the embedding auto-planes pattern)
    scales the signature length with the FLEET: ``max(4,
    ceil(log3(n_series / max_bucket)))`` symbols, holding expected
    bucket occupancy ≈ ``max_bucket`` as the fleet grows.  A FIXED
    length has only ``3^symbols`` buckets per time band, so occupancy
    grows linearly with the fleet and eventually EVERY bucket exceeds
    the stop-band cap — the r12 two-decade sweep measured exactly that
    cliff: at 100× (750k series) the 4-symbol config dropped every
    bucket and returned an EMPTY correlation matrix (candidates
    36,779 → 0).  Longer signatures demand co-movement over more
    steps, so per-band recall falls as the fleet grows — the standard
    LSH trade; the many time bands are the recall knob.

    NOTE: ``band_symbols="auto"`` is EAGER — it runs a
    ``distinct().count()`` Spark job over the fleet AT PLAN-BUILD TIME
    (mirroring the embedding auto-planes pattern,
    pipeline/dedup.embedding_neardup_pairs), so merely constructing
    the plan scans the corpus once and the symbol count freezes to the
    fleet as of that moment.  Callers that already know the fleet size
    should pass the resolved integer instead and keep plan construction
    lazy.
    """
    from pyspark.sql import Window

    finite = sf.df.filter(~F.isnan("value")).select(
        "series_key", "ts", "value"
    )
    if band_symbols == "auto":
        import math

        n_series = finite.select("series_key").distinct().count()
        band_symbols = max(
            4,
            math.ceil(
                math.log(max(n_series, 2) / max_bucket, 3)
            ),
        )
    band_symbols = int(band_symbols)
    coarse = F.lit(int(coarse_ms))
    bk = (
        finite.withColumn("__b", F.col("ts") - F.col("ts") % coarse)
        .groupBy("series_key", "__b")
        .agg(
            F.sum(F.col("value").cast("decimal(27,6)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    # keep-last gap-fill at sketch granularity: one sequence explode
    # per series (span/coarse rows), carried (sum, count) stay exact
    grid = (
        bk.groupBy("series_key")
        .agg(F.min("__b").alias("__b0"), F.max("__b").alias("__b1"))
        .select(
            "series_key",
            F.explode(
                F.sequence(F.col("__b0"), F.col("__b1"), coarse)
            ).alias("__b"),
        )
    )
    w = Window.partitionBy("series_key").orderBy("__b")
    carried = (
        grid.join(bk, ["series_key", "__b"], "left")
        .withColumn("__cs", F.last("__s", ignorenulls=True).over(w))
        .withColumn("__cn", F.last("__n", ignorenulls=True).over(w))
    )
    # delta sign via the exact decimal cross-product: sign(s2/n2 − s1/n1)
    # = sign(s2·n1 − s1·n2) — no float division, engine-portable
    stepped = carried.select(
        "series_key",
        (F.col("__b") - coarse).alias("__p"),
        (F.col("__cs") * F.lag("__cn").over(w)).alias("__lhs"),
        (F.lag("__cs").over(w) * F.col("__cn")).alias("__rhs"),
    ).filter(F.col("__rhs").isNotNull())
    sym = stepped.select(
        "series_key",
        "__p",
        F.when(F.col("__lhs") > F.col("__rhs"), F.lit("u"))
        .when(F.col("__lhs") < F.col("__rhs"), F.lit("d"))
        .otherwise(F.lit("f"))
        .alias("__sym"),
    )
    bandw = F.lit(int(coarse_ms) * int(band_symbols))
    wb = Window.partitionBy("__band", "__sig")
    sig = (
        sym.withColumn(
            "__band",
            ((F.col("__p") - F.col("__p") % bandw) / bandw).cast("long"),
        )
        .groupBy("series_key", "__band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p", "__sym"))),
                    lambda s: s["__sym"],
                ),
                "",
            ).alias("__sig")
        )
        .filter(F.length("__sig") == F.lit(int(band_symbols)))
        .withColumn("__cnt", F.count(F.lit(1)).over(wb))
        .filter(F.col("__cnt") <= F.lit(int(max_bucket)))
    )
    # r13: pin the signature table and run ONE band join.  The sketch
    # (two shuffles + two window passes) used to be rebuilt for both
    # self-join legs of both the co-movement and the anti-correlation
    # joins; the r9 A/B that measured the persist as slower predates the
    # AQE coalesce-floor fix (session.py) and no longer holds — re-A/B'd
    # this round: 4.7 s → 1.3 s at sf0.1, candidates byte-identical
    # (36,779).  The b side explodes each signature into (signature,
    # u↔d-inverted signature) so a single equi-join surfaces both the
    # positive and negative candidates the two joins produced — the
    # union∘distinct of the pair sets is unchanged.
    from time_series_db_spark.cache import persist_tracked

    sig = persist_tracked(sig)
    a = sig.select(
        F.col("series_key").alias("__ka"), "__band", "__sig"
    )
    b = sig.select(
        F.col("series_key").alias("__kb"),
        F.col("__band").alias("__bandb"),
        F.explode(
            F.array(
                F.col("__sig"), F.translate(F.col("__sig"), "ud", "du")
            )
        ).alias("__sigb"),
    )
    return (
        a.join(
            b,
            (F.col("__band") == F.col("__bandb"))
            & (F.col("__sig") == F.col("__sigb"))
            & (F.col("__ka") < F.col("__kb")),
        )
        .select("__ka", "__kb")
        .distinct()
    )


def rolling_corr_target(
    sf: SeriesFrame,
    target: dict[str, str],
    window_buckets: int = 12,
    min_points: int = 3,
) -> SeriesFrame:
    """Rolling Pearson correlation against a target series: at every
    sample, the correlation over the trailing ``window_buckets``-bucket
    window of shared finite timestamps — :func:`correlate_target`
    answers "what moved with this metric over the whole query window";
    THIS answers "when did it start/stop moving with it" (a dependency
    that decouples mid-incident shows as the rolling corr falling off a
    cliff, which the global number averages away).

    Engine-exact by construction: both series quantize to 1e-6 integer
    units and the five windowed co-moments (Σx, Σy, Σx², Σy², Σxy) are
    EXACT integer sums — DuckDB computes sliding aggregates with
    segment trees, so float window sums genuinely change summation
    order between engines; integer moments make the order irrelevant.
    Pearson is scale-invariant, so the 1e-6 scaling cancels.  The
    combination ``(n·Σxy − ΣxΣy) / √(n·Σx² − (Σx)²) √(n·Σy² − (Σy)²)``
    runs in double over the exact moments with the identical
    expression on both sides.

    Samples with fewer than ``min_points`` shared finite points in the
    window, or an undefined correlation (either side locally constant),
    are ABSENT rows per the engine null contract.  Returns a
    SeriesFrame whose ``value`` is the rolling correlation.

    Scale shape: the one-series target (probe-enforced) broadcasts
    into a hash join on ``ts``; the co-moments ride ONE
    (series_key, ts-range) window — the same single series exchange
    every sequential stage shares; nothing pairwise, no second scan.
    """
    w_n = int(window_buckets)
    if w_n < 2:
        raise ValueError(f"window_buckets must be >= 2 (got {window_buckets})")
    from pyspark.sql import Window

    matched = _single_series_target(sf, target, "rolling_corr_target")
    step = int(sf.step)
    tgt = matched.select(
        F.col("ts").alias("__tts"), F.col("value").alias("__tv")
    )
    x6 = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    y6 = F.floor(F.col("__tv") * F.lit(1e6) + F.lit(0.5)).cast("long")
    joined = (
        sf.df.join(F.broadcast(tgt), F.col("ts") == F.col("__tts"))
        .filter(~F.isnan("value") & ~F.isnan("__tv"))
        .select(
            "series_key",
            "labels",
            "alias",
            "ts",
            x6.alias("__x"),
            y6.alias("__y"),
        )
    )
    w = (
        Window.partitionBy("series_key")
        .orderBy("ts")
        .rangeBetween(-(w_n - 1) * step, 0)
    )
    xd = F.col("__x").cast("decimal(19,0)")
    yd = F.col("__y").cast("decimal(19,0)")
    mom = joined.select(
        "series_key",
        "labels",
        "alias",
        "ts",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum(xd).over(w).alias("__sx"),
        F.sum(yd).over(w).alias("__sy"),
        F.sum((xd * xd).cast("decimal(38,0)")).over(w).alias("__sxx"),
        F.sum((yd * yd).cast("decimal(38,0)")).over(w).alias("__syy"),
        F.sum((xd * yd).cast("decimal(38,0)")).over(w).alias("__sxy"),
    )
    n_d = F.col("__n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    vx = n_d * sxx - sx * sx
    vy = n_d * syy - sy * sy
    corr = (n_d * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    df = (
        mom.filter(
            (F.col("__n") >= F.lit(int(min_points)))
            & (vx > 0)
            & (vy > 0)
        )
        .withColumn("value", corr)
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def lead_lag_target(
    sf: SeriesFrame,
    target: dict[str, str],
    max_lag: int = 6,
    min_points: int = 3,
    min_abs_corr: float = 0.0,
) -> DataFrame:
    """Lead-lag detection against a target series: for every series in
    the fleet, Pearson correlation with the target at every bucket lag
    in ``[-max_lag, max_lag]``, keeping the best-aligned lag — the
    "what moves with this metric, and who moves FIRST" diagnosis that
    turns correlate_target's blast-radius ranking into a causal-order
    hint (upstream services shift before their dependents).

    Convention: row ``(series, lag)`` correlates ``s(t)`` with
    ``g(t - lag·step)`` — ``lag_buckets > 0`` means the target's
    movement shows up in the series ``lag`` buckets LATER (the target
    leads); ``< 0`` means the series leads the target.  ``lag_ms``
    is the same offset in epoch-milliseconds.

    Winner selection is engine-portable by construction: ``corr`` is
    quantized to the 1e-4 grid BEFORE both the argmax compare and the
    ``min_abs_corr`` threshold (a raw-float compare can flip between
    engines within an ulp — the correlate_matrix lesson), and ties
    break deterministically on (|lag| asc, lag asc), preferring the
    no-lag explanation over an offset one.

    Scale shape: the target is ONE series (≤ grid-length rows, the
    exactly-one contract probe-enforced); its ``2·max_lag+1`` shifted
    copies are STILL a bounded frame and broadcast into a hash join on
    ``ts`` — the corpus pays one scan and one partial-aggregated
    groupBy on (series_key, lag) whose row count is the fleet's sample
    count × a small constant; the per-series argmax is a second
    metadata-sized partial agg.  Nothing pairwise, no second scan.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1 (got {max_lag})")
    from pyspark.sql import Window

    from time_series_db_spark.model import labels_from_key_expr

    matched = _single_series_target(sf, target, "lead_lag_target")
    step = int(sf.step)
    # (2·max_lag+1) shifted copies of the one target series: the copy
    # tagged ``lag`` carries g(t) at join key t + lag·step, so joining
    # fleet ts == key pairs s(t) with g(t - lag·step)
    tgt = matched.select(
        F.explode(
            F.sequence(F.lit(-int(max_lag)), F.lit(int(max_lag)))
        ).alias("__lag"),
        (F.col("ts") + F.col("__lag") * F.lit(step)).alias("__tts"),
        F.col("value").alias("__tv"),
    )
    per_lag = (
        sf.df.join(F.broadcast(tgt), F.col("ts") == F.col("__tts"))
        .filter(~F.isnan("value") & ~F.isnan("__tv"))
        .groupBy("series_key", "__lag")
        .agg(
            F.try_divide(
                F.covar_pop("value", "__tv"),
                F.stddev_pop("value") * F.stddev_pop("__tv"),
            ).alias("corr"),
            F.count(F.lit(1)).alias("n_points"),
        )
        # quantize BEFORE argmax + threshold (|corr| ≤ 1 → guards vacuous)
        .withColumn(
            "corr",
            F.floor(F.col("corr") * F.lit(10000.0) + F.lit(0.5))
            / F.lit(10000.0),
        )
        .filter(
            (F.col("n_points") >= F.lit(int(min_points)))
            & F.col("corr").isNotNull()
            & ~F.isnan("corr")
        )
    )
    w = Window.partitionBy("series_key").orderBy(
        F.abs("corr").desc(), F.abs("__lag").asc(), F.col("__lag").asc()
    )
    return (
        per_lag.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .filter(F.abs("corr") >= F.lit(float(min_abs_corr)))
        .withColumn("labels", labels_from_key_expr(F.col("series_key")))
        .select(
            "series_key",
            "labels",
            F.col("__lag").alias("lag_buckets"),
            (F.col("__lag") * F.lit(step)).alias("lag_ms"),
            "corr",
            "n_points",
        )
    )


def fleet_outlier_scores(sf: SeriesFrame) -> DataFrame:
    """Fleet-level robust outlier scores: each series' window mean
    scored against the fleet's median by MAD units —
    ``robust_z = (mean − median) / (1.4826 · MAD)`` — the
    which-host-is-misbehaving sweep run across thousands of series
    where a per-sample z-score (:func:`~..windows.anomalies`) answers
    a different question (which SAMPLE is off within one series).
    Median/MAD instead of mean/σ so the outliers themselves cannot
    mask the baseline.  Returns every series with ``(series_key,
    labels, mean, robust_z)`` — callers rank or threshold; emitting a
    0/1 flag here would make the output knife-edge-unstable at the
    threshold, so deliberately not this operator's job.  A zero-MAD
    fleet (all means identical) yields NULL scores.

    Scale shape: ONE partial-aggregated groupBy(series) collapses the
    corpus to fleet-sized rows (exact-decimal sums pin the means
    across engines); the median and the MAD are two one-row exact
    percentiles over THOSE rows, broadcast back — the corpus is
    scanned once, and everything after the first aggregate is
    fleet-metadata-sized.
    """
    from time_series_db_spark.cache import persist_tracked
    from time_series_db_spark.model import labels_from_key_expr

    finite = F.when(~F.isnan("value"), F.col("value"))
    # fleet-sized and referenced three times (median, MAD, scoring) —
    # persist so the corpus groupBy runs exactly once
    per = persist_tracked(
        sf.df.groupBy("series_key").agg(
            (
                F.sum(finite.cast("decimal(27,6)")).cast("double")
                / F.count(finite)
            ).alias("mean")
        )
    )
    med = per.agg(F.expr("percentile(mean, 0.5)").alias("__med"))
    dev = per.crossJoin(F.broadcast(med))
    mad = dev.agg(
        F.expr("percentile(abs(mean - __med), 0.5)").alias("__mad")
    )
    scored = dev.crossJoin(F.broadcast(mad)).select(
        "series_key",
        "mean",
        F.when(
            F.col("__mad") > 0,
            (F.col("mean") - F.col("__med"))
            / (F.lit(1.4826) * F.col("__mad")),
        ).alias("robust_z"),
    )
    return scored.withColumn(
        "labels", labels_from_key_expr(F.col("series_key"))
    ).select("series_key", "labels", "mean", "robust_z")


#: the lag scatter multiplies the frame by max_lag — bound the knob
#: (service query-limit discipline; 512 lags at the default step is a
#: 3-week periodicity search, past any dashboard's need)
MAX_ACF_LAG = 512


def autocorrelation(sf: SeriesFrame, max_lag: int = 48) -> DataFrame:
    """Per-series sample autocorrelation at grid lags 1..``max_lag`` —
    the periodicity detector that feeds ``seasonalAdjust``'s season
    parameter (the dominant ACF peak IS the season) and flags
    mean-reverting vs trending behavior.  Standard biased estimator:
    ``acf(l) = Σ(xₜ−μ)(xₜ₊ₗ−μ) / Σ(xₜ−μ)²`` over pairs where both
    samples are present at exactly ``l`` grid steps apart (absent
    samples contribute no pair — the engine-wide missing-by-absence
    discipline).  Returns ``(series_key, labels, lag, n_pairs, acf)``;
    zero-variance series yield NULL acf.

    Scale shape: NO window sort at all — per-series raw moments are one
    partial-aggregated groupBy; each sample scatters its ``max_lag``
    target timestamps (bounded row multiplication, the
    keep_last_value-scatter shape) into an equi-join back on
    (series, ts); pair sums collapse in a second partial agg keyed
    (series, lag); the numerator algebra
    ``Σxy − μ(Σxₐ+Σxᵦ) + nμ²`` folds the centering into the moments so
    the corpus is never re-scanned to subtract means.
    """
    L = int(max_lag)
    if not 1 <= L <= MAX_ACF_LAG:
        raise ValueError(
            f"autocorrelation max_lag must be in 1..{MAX_ACF_LAG}: the "
            "lag scatter multiplies the frame's rows by max_lag"
        )
    from time_series_db_spark.cache import persist_tracked
    from time_series_db_spark.model import labels_from_key_expr

    step = F.lit(sf.step)
    # referenced three times (moments, the scatter side, the join-back
    # side) — persist so the upstream fetch aggregation runs exactly once
    src = persist_tracked(
        sf.df.filter(~F.isnan("value")).select(
            "series_key", "ts", "value"
        )
    )
    mom = src.groupBy("series_key").agg(
        F.sum("value").alias("__sx"),
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.col("value") * F.col("value")).alias("__sxx"),
    )
    scattered = src.select(
        "series_key",
        F.col("value").alias("__xa"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(L)),
                lambda l: F.col("ts") + l.cast("long") * step,
            )
        ).alias("__pos", "__tts"),
    ).select(
        "series_key", "__xa", (F.col("__pos") + 1).cast("long").alias("lag"),
        "__tts",
    )
    pairs = scattered.join(
        src.select(
            "series_key", F.col("ts").alias("__tts"),
            F.col("value").alias("__xb"),
        ),
        ["series_key", "__tts"],
    )
    pl = pairs.groupBy("series_key", "lag").agg(
        F.sum(F.col("__xa") * F.col("__xb")).alias("__sxy"),
        F.sum("__xa").alias("__sxa"),
        F.sum("__xb").alias("__sxb"),
        F.count(F.lit(1)).cast("double").alias("__np"),
    )
    mu = F.col("__sx") / F.col("__n")
    denom = F.col("__sxx") - F.col("__n") * mu * mu
    num = (
        F.col("__sxy")
        - mu * (F.col("__sxa") + F.col("__sxb"))
        + F.col("__np") * mu * mu
    )
    out = pl.join(mom, "series_key").select(
        "series_key",
        "lag",
        F.col("__np").cast("long").alias("n_pairs"),
        F.when(denom > 0, num / denom).alias("acf"),
    )
    return out.withColumn(
        "labels", labels_from_key_expr(F.col("series_key"))
    ).select("series_key", "labels", "lag", "n_pairs", "acf")


def detect_season(
    sf: SeriesFrame, max_lag: int = 48, min_lag: int = 2
) -> int:
    """Dominant seasonality of the frame, in ms — the auto-season
    detector that closes the loop :func:`autocorrelation` documents
    ("the dominant ACF peak IS the season"): per series, the lag with
    the highest ACF (lags < ``min_lag`` excluded — lag 1 reflects
    smoothness, not periodicity); fleet-wide, the majority vote over
    those per-series peaks.  Feeds ``seasonal_adjust(season=auto)``.

    Determinism: acf values quantize to the engine-portable 1e-4 grid
    BEFORE the per-series argmax (the same quantization the
    differential gate hashes), so the selected lag cannot flip on
    summation-order ulps; ties break on the smaller lag, the vote on
    (count DESC, lag ASC).  Everything after the ACF table is
    fleet-metadata-sized; the vote is ONE 1-row collect — the declared
    coordinator boundary (the k-means/BPE shape).

    The vote is memoized per (plan, knobs) under the active cache scope
    (:func:`~time_series_db_spark.cache.probe_memo` — the binary-probe
    discipline): every ``season=auto`` operator in the seasonal family
    (adjust/decompose/forecast/backtest) re-derived the SAME election
    from the SAME frame on every call, each paying a full ACF scatter
    job (r13 A/B: 1–3.5 s per call at sf0.1); a probe result is a pure
    function of the analyzed plan, so it shares exactly the cache's
    staleness boundaries.
    """

    def compute() -> int:
        top = (
            season_votes(sf, max_lag, min_lag)
            .groupBy("lag")
            .agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.desc("__c"), F.asc("lag"))
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                "detect_season: no series has a defined ACF peak "
                "(constant or too-sparse frame)"
            )
        return int(top[0]["lag"]) * int(sf.step)

    from time_series_db_spark.cache import probe_memo

    return probe_memo(
        sf.df, f"detect_season:{int(max_lag)}:{int(min_lag)}:{sf.step}", compute
    )


def season_votes(
    sf: SeriesFrame, max_lag: int = 48, min_lag: int = 2
) -> DataFrame:
    """Each series' vote in :func:`detect_season`'s election: the lag
    of its dominant ACF peak on the 1e-4-quantized grid (ties to the
    smaller lag).  Returns ``(series_key, labels, lag, acf)`` — one
    row per series with a defined peak; the fleet-level inspection
    surface behind ``seasonalAdjust auto`` (which hosts disagree with
    the fleet's season is itself a diagnostic).

    Fleet-metadata-sized output; one bounded ACF scatter + a
    per-series rank-1 window over fleet×lags rows."""
    if min_lag < 1 or max_lag < min_lag:
        raise ValueError("season_votes needs 1 <= min_lag <= max_lag")
    from pyspark.sql import Window

    acf = autocorrelation(sf, max_lag).filter(
        (F.col("lag") >= F.lit(int(min_lag)))
        & F.col("acf").isNotNull()
        & ~F.isnan("acf")
    )
    qa = F.floor(F.col("acf") * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)
    w = Window.partitionBy("series_key").orderBy(
        F.desc("__qa"), F.asc("lag")
    )
    return (
        acf.withColumn("__qa", qa)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("series_key", "labels", "lag", F.col("__qa").alias("acf"))
    )
