"""Physical-plan regression gate: the scale-critical plan properties.

Correctness tests prove the operators right at test scale; these prove
the *plans* stay right at 100-TB scale — predicates reach the parquet
scan, ranks never collapse to one partition, small sides broadcast, and
no Python UDF sneaks into a hot path. Each assertion pins a property a
past round earned (VERDICT r2 "anti-pattern scan"); a regression here is
a scale bug even when every value still matches the oracle.
"""

from __future__ import annotations

import pytest

from time_series_db_spark.sources import fetch_events


@pytest.fixture(autouse=True)
def _release_caches(spark):
    """Plan assertions must see the cold plan: a previous test's scoped
    persist (e.g. sort/top_k pinning its input frame) would otherwise
    substitute an InMemoryRelation whose printed cached plan inflates
    Exchange counts — a test-order artifact, not a plan regression."""
    from time_series_db_spark import cache

    cache.release_all()
    yield


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return fetch_events(spark, sf_dir)


def test_fetch_pushes_predicates_to_scan(spark, sf_dir):
    """Label + time predicates must reach the parquet source as pushed
    filters — the Lucene term/range query analog. A scan reading all
    rows for a filtered fetch is a 100-TB regression."""
    from time_series_db_spark.sources.m3source import EventsSource

    sf = EventsSource(spark, sf_dir).fetch(
        {"name": ["error"]}, {}, events_min(), events_max(), 3_600_000
    )
    plan = _plan(sf.df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pushed  # the label predicate reached parquet
    # the time-range predicate must be pushed too (bare int64 column)
    assert "GreaterThanOrEqual(ts" in pushed or "ts" in pushed


def events_min() -> int:
    from time_series_db_spark.sources import EVENTS_MIN_TS

    return EVENTS_MIN_TS


def events_max() -> int:
    from time_series_db_spark.sources import EVENTS_MAX_TS

    return EVENTS_MAX_TS


def test_fetch_prunes_columns(spark, sf_dir):
    """ReadSchema must not include unused payload columns (props)."""
    from time_series_db_spark.sources.m3source import EventsSource

    sf = EventsSource(spark, sf_dir).fetch(
        {"name": ["error"]}, {}, events_min(), events_max(), 3_600_000
    )
    plan = _plan(sf.df.select("series_key", "ts", "value"))
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "props" not in read_schema


def test_sort_rank_never_single_partition(events):
    """sort's rank is range-partitioned; the only SinglePartition
    exchange allowed is the per-range offset table (≤ shuffle-partition
    rows), which must sit under a broadcast — ordering._ranked_stats."""
    from time_series_db_spark.operators import ordering

    plan = _plan(ordering.sort(events, "avg").df)
    assert "rangepartitioning" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_binary_divide_broadcasts_aggregate_right(events):
    """a / (a | sum) — the aggregate right side must broadcast; a
    cartesian or unbroadcast shuffle join here multiplies at scale."""
    from time_series_db_spark.operators import binary, grouping

    out = binary.divide(events, grouping.sum_(events, []))
    plan = _plan(out.df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_no_python_udf_in_core_operators(events):
    """Window/grouping/binary hot paths stay JVM-side: no row-at-a-time
    or Arrow Python evaluation nodes in their physical plans
    (mapInPandas belongs only to the multimodal pipeline ops)."""
    from time_series_db_spark.operators import grouping, ordering, windows

    frames = [
        windows.moving(events, 3 * events.step, "avg"),
        windows.per_second_rate(events, 3 * events.step),
        windows.keep_last_value(events),
        grouping.sum_(events, ["name"]),
        grouping.percentile_of_series(events, [95.0], ["name"]),
        ordering.top_k(events, 5, "avg"),
    ]
    for sf in frames:
        plan = _plan(sf.df)
        assert "EvalPython" not in plan  # Batch/ArrowEvalPython
        assert "PythonUDF" not in plan


def test_topk_limits_before_rank(events):
    """topK must plan a limit-k over the per-series stat table (partial
    top-k), not a full global rank of every series."""
    from time_series_db_spark.operators import ordering

    plan = _plan(ordering.top_k(events, 5, "avg").df)
    assert "TakeOrderedAndProject" in plan or "Limit" in plan


def test_grouping_uses_hash_aggregate(events):
    """Grouped aggregation must stay HashAggregate (primitive buffers →
    map-side partial agg). A SortAggregate here means a map-typed buffer
    snuck into the aggregation."""
    from time_series_db_spark.operators import grouping

    plan = _plan(grouping.sum_(events, ["name", "region"]).df)
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_moving_single_series_shuffle(events):
    """moving shares one series_key-grained exchange; a second
    wide shuffle (beyond the scan-side grid grouping) would double the
    cross-node traffic of every window query."""
    from time_series_db_spark.operators import windows

    plan = _plan(windows.moving(events, 3 * events.step, "avg").df)
    # scan-side LWW grid grouping + the window's series grouping only
    assert plan.count("Exchange hashpartitioning") <= 3


def test_burn_rate_plan_shape(spark, sf_dir):
    """burnRate = window exprs + equi-join: no Python eval, no crossJoin,
    and exactly one join (err-rate vs total-rate on the match keys)."""
    from time_series_db_spark.lang.m3.builder import execute
    from time_series_db_spark.sources.m3source import EventsSource

    sf = execute(
        "fetch name:error | sum region"
        " | burnRate 3h 0.99 (fetch name:{error,click} | sum region)",
        EventsSource(spark, sf_dir), events_min(), events_max(), 3_600_000,
    )
    plan = _plan(sf.df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_prom_histogram_percentile_single_aggregation(spark, sf_dir):
    """promHistogramPercentile shares ONE bucket collection across all
    percentiles: a single ObjectHashAggregate pair (partial + final) over
    (group, ts), no join, no Python eval — the percentile fan-out is a
    posexplode over the collected array."""
    from time_series_db_spark.operators import grouping
    from time_series_db_spark.model import SAMPLE_COLS, series_key_expr
    from pyspark.sql import functions as F

    base = fetch_events(spark, sf_dir)
    df = base.df.withColumn(
        "labels",
        F.map_concat(
            "labels",
            F.create_map(F.lit("le"), F.lit("+Inf")),
        ),
    ).withColumn("series_key", series_key_expr()).select(*SAMPLE_COLS)
    sf = grouping.prom_histogram_percentile(
        base.with_df(df), [50.0, 95.0, 99.0]
    )
    plan = _plan(sf.df)
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan  # one aggregation path, no self-joins
    # one collect_list aggregate pair regardless of percentile count
    assert plan.count("ObjectHashAggregate") == 2


def test_stats_identity_fast_path_prunes_scan(spark, sf_dir):
    """stats_labels' identity path must scan only the label-deriving
    columns (event_type, user_id) + the pushed ts filter — never value /
    event_id. At 100 TB the value column is most of the bytes."""
    from time_series_db_spark.sources import fetch_series_identities

    plan = _plan(fetch_series_identities(spark, sf_dir))
    schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "event_type" in schema and "user_id" in schema
    assert "value" not in schema and "event_id" not in schema


def test_ann_scoring_not_single_partition(spark, sf_dir):
    """The brute-force cosine path must spread the corpus across cores
    before the broadcast join — a compact parquet corpus arrives as 1-2
    splits and would serialize the interpreted per-pair folds (and the
    partial WindowGroupLimit behind them) on one task otherwise."""
    from pyspark.sql import functions as F

    from time_series_db_spark.pipeline import ann

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann.cosine_topk(embs, embs.filter(F.col("vec_id") % 50 == 0), k=5)
    plan = _plan(out)
    assert "RoundRobinPartitioning" in plan or "Exchange hashpartitioning" in plan
    # top-k pushdown: partial group-limit before the rank shuffle
    assert "WindowGroupLimit" in plan


def test_pack_sequences_windows_per_shard(spark, sf_dir):
    """Sequence packing must never sort globally: the only window runs
    per hash shard, so the Sort is preceded by a hashpartitioning
    exchange on shard — not a SinglePartition exchange."""
    from time_series_db_spark.pipeline.pack import pack_sequences
    from time_series_db_spark.sources import load_table

    out = pack_sequences(load_table(spark, sf_dir, "documents"))
    plan = _plan(out)
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_sample_stratified_partial_top_n(spark, sf_dir):
    """Stratified sampling must bound a giant stratum's shuffle: Spark's
    partial WindowGroupLimit runs before the exchange, shipping at most
    n rows per stratum per input partition."""
    from time_series_db_spark.pipeline.pack import sample_stratified
    from time_series_db_spark.sources import load_table

    out = sample_stratified(load_table(spark, sf_dir, "documents"))
    plan = _plan(out)
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_sample_mixture_partial_top_n_and_broadcast_quotas(spark, sf_dir):
    """Mixture sampling keeps the stratified-sample shuffle bound (the
    constant max-quota rank filter sits under the window, so partial
    WindowGroupLimit applies) and joins the tiny quota table broadcast."""
    from time_series_db_spark.pipeline.pack import sample_mixture
    from time_series_db_spark.sources import load_table

    out = sample_mixture(
        load_table(spark, sf_dir, "documents"),
        weights={"en": 0.5, "fr": 0.5},
        budget=40,
    )
    plan = _plan(out)
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_decontaminate_broadcasts_eval_ngram_set(spark, sf_dir):
    """Decontamination must broadcast the (small) benchmark n-gram hash
    set against the exploded corpus side — the corpus n-grams are
    filtered by a broadcast hash join before any shuffle, so only actual
    collisions reach the per-doc aggregate."""
    from pyspark.sql import functions as F

    from time_series_db_spark.pipeline.decontam import decontaminate
    from time_series_db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=8,
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_semantic_dedup_broadcasts_centroids_no_cartesian(spark, sf_dir):
    """SemDeDup's clustering must broadcast the centroid table (corpus
    never shuffles for assignment) and the near-dup scan must be an
    equi-join on the cell id — a CartesianProduct here is the O(n²)
    all-pairs regression the clustering exists to avoid."""
    from time_series_db_spark.pipeline import dedup
    from time_series_db_spark.sources import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    out = dedup.semantic_dedup(embs, nlist=4, train_iters=1)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan  # broadcast centroid assign
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the pair scan shuffles on the cell key, not all-pairs
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_text_curation_ops_stay_codegen(spark, sf_dir):
    """Gopher rules and PII scrub are single-scan column expressions: no
    Python UDF, no shuffle — at 100 TB they run at parquet-scan speed."""
    from time_series_db_spark.pipeline import text
    from time_series_db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for out in (text.gopher_quality(docs), text.pii_scrub(docs)):
        plan = _plan(out)
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan


def test_histogram_fraction_single_aggregation(spark, sf_dir):
    """histogram_fraction folds buckets in one (group, ts) hash
    aggregation — same shape as histogram_quantile; the CDF walk is a
    pure SQL fold, never a UDF or a second shuffle."""
    from time_series_db_spark.operators import grouping

    sf = fetch_events(spark, sf_dir)
    out = grouping.histogram_fraction(sf, 10.0, 30.0)
    plan = _plan(out.df)
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final agg


def test_tpch_new_queries_no_cartesian_and_broadcast_dims(spark, sf_dir):
    """The round-5 TPC-H additions (q9/q17/q19/q21/q22): every dim side
    broadcasts, the only exchanges are aggregation/fact-join keys, and
    the sole nested-loop join allowed is q22's one-row scalar-average
    compare (the broadcast-constant pattern). A CartesianProduct in any
    of these is a 100-TB outage."""
    from time_series_db_spark.catalog import QUERIES

    for name in (
        "tpch_q9_profit",
        "tpch_q17_small_quantity",
        "tpch_q19_disjunctive_revenue",
        "tpch_q21_waiting_suppliers",
        "tpch_q22_lapsed_customers",
    ):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        if "BroadcastNestedLoopJoin" in plan:
            # only q22's one-row avg-balance compare may nested-loop
            assert name == "tpch_q22_lapsed_customers", name
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, name


def test_tpch_r7_queries_broadcast_dims_no_cartesian(spark, sf_dir):
    """The round-7 TPC-H completions (q2/q11/q12/q16/q20): dim sides
    broadcast, scalar thresholds are one-row broadcast nested-loops
    (the q22 pattern), and nothing cartesian-products the fact table."""
    from time_series_db_spark.catalog import QUERIES

    scalar_threshold = {"tpch_q11_important_stock", "tpch_q20_excess_suppliers"}
    for name in (
        "tpch_q2_min_cost_supplier",
        "tpch_q11_important_stock",
        "tpch_q12_late_priority",
        "tpch_q16_supplier_cnt",
        "tpch_q20_excess_suppliers",
    ):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        if "BroadcastNestedLoopJoin" in plan:
            # only the one-row scalar-threshold compares may nested-loop
            assert name in scalar_threshold, name
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, name


def test_r7_window_ops_no_joins(spark, sf_dir):
    """LTTB decimation and seasonal decomposition are pure window plans:
    no join node may appear (a join-back formulation would shuffle the
    sample table twice), and no Python evaluation."""
    from time_series_db_spark.operators import windows

    sf = fetch_events(spark, sf_dir)
    for out in (
        windows.decimate_lttb(sf, 7_200_000),
        windows.seasonal_adjust(sf),
        windows.anomalies(windows.seasonal_adjust(sf)),
    ):
        plan = _plan(out.df)
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_image_ahash_single_arrow_pass(spark, sf_dir):
    """The aHash catalog entry is ONE Arrow mapInPandas pass plus the
    dup-count window — no per-row Python UDF, no join, and exactly the
    window's exchange beyond the scan."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["mm_image_ahash"](spark, sf_dir))
    assert "BatchEvalPython" not in plan    # row-at-a-time Python banned
    assert plan.count("MapInPandas") == 1   # one Arrow hash pass
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # dup-count window


def test_tpch_q17_window_after_part_prune(spark, sf_dir):
    """Q17's correlated average runs as a window over l_partkey AFTER the
    broadcast part filter — the shuffle carries only matching parts'
    rows. The broadcast join must appear below the window exchange."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["tpch_q17_small_quantity"](spark, sf_dir))
    assert "Window" in plan
    # the window's partition exchange exists, and so does the broadcast
    assert "Exchange hashpartitioning(l_partkey" in plan
    assert "BroadcastHashJoin" in plan


def test_exact_substring_dedup_partial_agg_no_window(spark, sf_dir):
    """The first-occurrence pick must be a min-struct AGGREGATION (partial
    combine absorbs hot boilerplate chunks map-side), never a row_number
    window that piles a hot chunk's copies onto one reducer."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["dedup_exact_substring"](spark, sf_dir))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_compression_ratio_arrow_no_shuffle(spark, sf_dir):
    """zlib ratio (non-catalog operator — DuckDB cannot deflate) runs as
    ONE Arrow-batched projection over the scan — no shuffle, no
    row-at-a-time Python."""
    from time_series_db_spark.pipeline import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(text.compression_ratio(docs))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_compressibility_pure_hash_agg(spark, sf_dir):
    """The oracle-able compressibility proxy is explode + two partial
    hash aggregations — zero Python, zero window, zero join."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["text_compressibility"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_pca_cov_arrow_kernel_shape(spark, sf_dir):
    """The PCA covariance accumulator runs as ONE Arrow mapInPandas
    kernel over the corpus scan (numpy Xᵀ·X per partition — the r11
    rewrite of the 2144-separate-F.sum formulation that fell out of
    codegen, 14.4 s → 2.7 s at sf0.1); everything after it touches only
    the partition-count-sized partials.  No window, no sort-merge join
    (the combine joins are 64/2080-row metadata frames), no cross
    product against the corpus."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["embedding_pca"](spark, sf_dir))
    assert "MapInPandas" in plan or "ArrowEval" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    # the only cross join is the 1-row broadcast of the total count
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_percentile_windowed_sorts_instead_of_arrays(spark, sf_dir):
    """The spill-safe percentile path must rank via a sorted window (one
    exchange on (group, ts), disk-spillable sort) and never materialize
    per-group arrays — no collect_list / ObjectHashAggregate."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["m3_percentile_of_series_windowed"](spark, sf_dir))
    assert "Window" in plan
    assert "collect_list" not in plan
    assert "ObjectHashAggregate" not in plan
    # one exchange for the fetch's grid alignment + exactly ONE for the
    # (group, ts) rank window — the count and row_number windows share it
    assert plan.count("Exchange hashpartitioning") == 2


def test_vocab_count_partial_topn(spark, sf_dir):
    """Vocab top-N must cut via TakeOrderedAndProject (distributed
    partial top-N) before any rank window — a global sort of all
    distinct tokens is a web-scale outage."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["text_vocab_count"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_jl_projection_codegen_no_shuffle(spark, sf_dir):
    """The JL projection is compile-time literal column math: one scan,
    zero exchanges, zero Python eval."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["embedding_project_jl"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_lm_perplexity_broadcasts_model(spark, sf_dir):
    """The bigram-LM count tables are vocab-bounded metadata and must
    broadcast to the corpus-sized scoring join (the CCNet ship-the-model
    shape); the vocab cut must be a TakeOrdered, and no Python UDF may
    appear — the whole operator is Catalyst expressions."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["text_lm_perplexity"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 3  # bi, ctx, uni
    assert "BroadcastNestedLoopJoin" in plan  # 1-row total, broadcast
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lm_perplexity_guards_large_vocab_broadcast(spark, sf_dir):
    """Above MAX_BROADCAST_VOCAB the bigram table's (V+2)² row bound
    makes broadcasting it a driver/executor OOM knob — the scoring join
    must fall back to a shuffle join on (v, w) while the O(V)
    unigram/context tables keep broadcasting."""
    from time_series_db_spark.pipeline import text
    from time_series_db_spark.pipeline.text import MAX_BROADCAST_VOCAB

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def _hints(df) -> int:
        # count broadcast HINTS in the analyzed plan: at production
        # scale an unhinted bigram table shuffles (its stats exceed
        # autoBroadcastJoinThreshold); at test scale Catalyst may still
        # auto-broadcast it by size, so the physical join kind is not
        # the thing the guard controls
        return df._jdf.queryExecution().analyzed().toString().count(
            "ResolvedHint"
        )

    guarded = _hints(
        text.lm_perplexity(docs, vocab_size=MAX_BROADCAST_VOCAB + 1)
    )
    default = _hints(text.lm_perplexity(docs, vocab_size=200))
    # one fewer broadcast hint: the (v, w) bigram join is left unhinted
    assert guarded == default - 1
    # explicit override beats the threshold
    forced = _hints(
        text.lm_perplexity(
            docs, vocab_size=MAX_BROADCAST_VOCAB + 1, broadcast_bigrams=True
        )
    )
    assert forced == default


def test_ppl_buckets_no_global_sort(spark, sf_dir):
    """The CCNet tertile split must compute thresholds as a per-language
    aggregate broadcast back to the corpus — an ntile/rank window here
    would be a per-language global sort of the corpus."""
    from time_series_db_spark.catalog import QUERIES

    import re

    plan = _plan(QUERIES["text_ppl_buckets"](spark, sf_dir))
    # (?<![a-z]) so "percentile(...)" — the threshold AGGREGATE, which is
    # the wanted shape — doesn't false-match the ntile window function
    assert not re.search(r"(?<![a-z])ntile\(", plan.lower())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_prunes_postings_and_partial_topk(spark, sf_dir):
    """BM25: postings filtered to the query terms BEFORE any exchange
    (the corpus never shuffles unmatched tokens), document frequencies
    and corpus stats broadcast, and the k-cut a WindowGroupLimit partial
    top-k — no Python, no cartesian beyond the 1-row stats broadcast."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["search_bm25"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # limit-before-rank top-k
    assert "BroadcastHashJoin" in plan        # dfreq join
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_dsir_scoring_is_single_pass_codegen(spark, sf_dir):
    """DSIR fit/score split: the fit pass runs at build time (model is
    n_buckets rows, collected); the SCORING frame must be one corpus
    scan with the log-ratio lookup folded in as literals — no join of
    any kind, no second scan for totals, no Python."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["sample_importance_dsir"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("FileScan") == 1
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan


def test_sample_temperature_partial_topn(spark, sf_dir):
    """Temperature mixture inherits sample_mixture's WindowGroupLimit
    shape: a giant stratum ships max_quota × partitions rows to the
    rank sort, never its full size."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["sample_lang_temperature"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_cross_corpus_dedup_band_equijoin(spark, sf_dir):
    """Cross-corpus candidates must come from a (band, bucket) hash
    equi-join of the two band tables — never a cross product; the
    Jaccard verify touches candidates only (no corpus-sized nested
    loop), and no Python appears anywhere."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["dedup_cross_corpus"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_chunk_documents_zero_shuffle(spark, sf_dir):
    """Chunking is one scan + posexplode inside codegen — no exchange,
    no Python, no join; at 100 TB it runs at parquet-scan speed."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["chunk_documents"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_asof_join_is_join_free_single_exchange(spark, sf_dir):
    """The as-of join must compile to the union trick — union + ONE
    hash exchange on the key + a running-last window. Any Join node
    means Spark fell back to an inequality join, which is per-key
    quadratic at 100 TB; more than one data exchange means the union
    trick regressed to a join-shaped plan."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["events_asof_join"](spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_bucketed_equijoin(spark, sf_dir):
    """The bounded-range join must candidate via the (key, bucket±1)
    hash EQUI-join — never the nested-loop plan the raw inequality
    predicate would produce."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["events_range_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_funnel_all_equijoins(spark, sf_dir):
    """Funnel stages are per-user conditional min-aggregations glued by
    equi-joins on the user key — no nested loops, no Python."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["events_funnel"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_pmi_broadcasts_vocab_tables(spark, sf_dir):
    """PMI's scoring joins ship the vocab-bounded unigram table by
    broadcast (Zipf keeps it tiny); the bigram counts partial-aggregate
    map-side and are never globally sorted."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["text_pmi_bigrams"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "Sort [" not in plan.replace("SortAggregate", "")


def test_retention_dedups_before_join(spark, sf_dir):
    """Retention joins (user, bucket) pairs already deduplicated — the
    join and distinct-shuffle carry at most users x active-buckets
    rows, never raw events; the cohort join is equi on the user key."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["events_retention"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_pq_adc_scan_reads_codes_not_vectors(spark, sf_dir):
    """The ADC scoring scan must join broadcast LUTs against the CODES
    frame — no non-broadcast cartesian, no Python; full vectors appear
    only in the bounded re-rank joins (broadcast shortlist)."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["ann_pq_adc_topk"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ivfpq_candidates_from_cell_equijoin(spark, sf_dir):
    """IVF-PQ candidates must come from the (cell) hash equi-join of the
    code table against broadcast probed query cells — no non-broadcast
    cartesian, no Python anywhere in the index or search path."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["ann_ivfpq_topk"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_sample_weighted_partial_topn(spark, sf_dir):
    """The weighted draw must cut with TakeOrdered (per-partition
    partial top-n, bounded merge) — never a global sort of the corpus;
    the rank window runs over the n winners only."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["sample_weighted"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def _analyzed_hints(df) -> int:
    """Broadcast HINTS in the analyzed plan — what the guard controls.
    (At test scale Catalyst may still auto-broadcast an unhinted table
    by size, so the physical join kind is not the observable.)"""
    return df._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint"
    )


def test_kl_divergence_guards_vocab_broadcast(spark, sf_dir, monkeypatch):
    """The corpus unigram table is DATA-dependent (billions of distinct
    tokens at web scale — Zipf must not be trusted to bound a
    broadcast): the hint must come from the bounded size probe, and
    above MAX_BROADCAST_TOKEN_ROWS the scoring join falls back
    unhinted while the 1-row total keeps broadcasting."""
    from time_series_db_spark.pipeline import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    default = _analyzed_hints(text.kl_divergence(docs))
    monkeypatch.setattr(text, "MAX_BROADCAST_TOKEN_ROWS", 1)
    guarded = _analyzed_hints(text.kl_divergence(docs))
    # one fewer broadcast hint: the unigram join is left unhinted
    assert guarded == default - 1
    # explicit override beats the probe
    forced = _analyzed_hints(text.kl_divergence(docs, broadcast_vocab=True))
    assert forced == default


def test_bpe_token_counts_guards_word_table_broadcast(
    spark, sf_dir, monkeypatch
):
    """Same class as kl_divergence: the trained word-type table is
    data-dependent, so its broadcast hint must be probe-gated."""
    from time_series_db_spark.pipeline import bpe, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    default = _analyzed_hints(bpe.bpe_token_counts(docs, n_merges=2))
    monkeypatch.setattr(text, "MAX_BROADCAST_TOKEN_ROWS", 1)
    guarded = _analyzed_hints(bpe.bpe_token_counts(docs, n_merges=2))
    assert guarded == default - 1
    forced = _analyzed_hints(
        bpe.bpe_token_counts(docs, n_merges=2, broadcast_vocab=True)
    )
    assert forced == default


def test_changepoints_single_series_exchange(spark, sf_dir):
    """The CUSUM closed form must stay a stacked-window plan: every
    window layer (full-frame moments, running prefix sums, running
    mins) shares ONE series_key exchange — a fold/collect or join
    formulation here would not survive 100 TB."""
    from time_series_db_spark.catalog import QUERIES

    df = QUERIES["m3_changepoints"](spark, sf_dir)
    plan = _plan(df)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # fetch-grid dedup + ONE series exchange; nothing else
    assert plan.count("Exchange") <= 2


def test_decontaminate_overlap_broadcasts_eval(spark, sf_dir):
    """The graded-overlap variant keeps the decontamination shape: eval
    hashes broadcast; the only aggregates run on collision-filtered
    rows + the per-doc totals."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["decontaminate_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_bpe_encode_no_python_no_cartesian(spark, sf_dir):
    """Encoding is pure Catalyst: word-table join + window offset +
    posexplode — no Python eval, no quadratic join."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["text_bpe_encode"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_recall_joins_topk_tables_only(spark, sf_dir):
    """recall@k must aggregate the two already-cut top-k tables — the
    metric itself adds no corpus-sized work (the searches inside it are
    the existing gated plans)."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["ann_lsh_recall"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rerank_broadcasts_shortlist(spark, sf_dir):
    """Stage 2 of the hybrid stack must touch only the BM25 shortlist:
    shortlist ids broadcast into the embeddings scan, centroid a 1-row
    broadcast — no corpus-sized dense join, no Python."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["search_hybrid_rerank"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # both stage cuts
    assert "BroadcastHashJoin" in plan      # shortlist × embeddings
    assert "EvalPython" not in plan


def test_interpolate_stays_sparse_generator(spark, sf_dir):
    """Linear gap fill must stay the SPARSE gap-run generator: one
    lead() over the series sort + sequence/inline generation of the
    interior points — fetch dedup and the series sort are the only
    exchanges, and the dense series×grid frame must never materialize
    (the dense-scan formulation cost 17 s at sf0.1 where this takes
    ~1 s for the same 110k rows)."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["m3_interpolate"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the sequence/inline gap generator
    assert plan.count("Exchange") <= 2


def test_ewma_single_series_exchange_no_python(spark, sf_dir):
    """The EWMA fold must run entirely in JVM codegen over ONE bounded
    collect_list frame: fetch dedup + one series exchange, no Arrow
    fallback, no join — the recurrence lives in aggregate(), not in a
    python UDF."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["m3_ewma"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_correlate_target_broadcasts_the_one_series(spark, sf_dir):
    """One-vs-all correlation must broadcast the single target series
    into a ts hash join — the corpus pays one scan and one grouped
    aggregate; a shuffle join or anything pairwise would not survive
    100 TB."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["m3_correlate_target"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_tfidf_terms_windowgrouplimit_no_python(spark, sf_dir):
    """The per-doc top-k must be a WindowGroupLimit over the already
    tf-collapsed rows (never a global sort of the corpus), the df
    table probe-gated broadcast, the corpus total a 1-row broadcast —
    and nothing python, nothing cartesian beyond that 1-row total."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["text_tfidf_terms"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row total


def test_source_drift_no_python_no_cartesian(spark, sf_dir):
    """Drift must stay two partial-aggregated reductions over one
    exploded equi-join: the corpus centroid re-aggregates the
    per-source sums (no second scan), the dim-sized centroid table
    broadcasts, and nothing touches python."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["embedding_source_drift"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_fleet_outliers_one_corpus_aggregate(spark, sf_dir):
    """The fleet sweep must collapse the corpus in ONE grouped
    aggregate: the fleet-sized mean table is persisted and every
    downstream stage (median, MAD, scoring) reads the InMemory scan,
    never re-aggregating the corpus.  The only joins are the two 1-row
    stat broadcasts (the printed tree nests the cached plan, so the
    med broadcast appears once more inside it — 3 printed, 2 real)."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["m3_fleet_outliers"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" in plan  # fleet table computed once
    assert plan.count("BroadcastNestedLoopJoin") <= 3


def test_autocorrelation_no_window_sort_no_python(spark, sf_dir):
    """ACF must stay the scatter-join shape: two partial aggs + one
    equi-join back on (series, ts) — NO per-series window sort (the
    naive L-lag window formulation sorts every series L times), no
    python, no cartesian (the lag scatter is a generator, not a
    join)."""
    from time_series_db_spark.catalog import QUERIES

    plan = _plan(QUERIES["m3_autocorrelation"](spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan and "RunningWindow" not in plan
    assert "Generate" in plan  # the posexplode lag scatter
