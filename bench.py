"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "candidates": {name: n}}. Protocol
(BASELINE.md): one warm-up run discarded per query, median of N timed
runs, noop sink (no collect — measures engine throughput, not driver
materialization).

Beyond the fixed headline set, every run appends a ROTATING WINDOW of
``SPARK_GRAFT_BENCH_WINDOW`` (default 60) additional catalog entries,
ordered least-recently-benched first via the ``bench_baselines.json``
ledger — so over a few rounds EVERY catalog entry gets a recorded perf
baseline and a perf regression in a non-headline entry (a PromQL
subquery, a TPC-H join, a wire-format parser) surfaces instead of
staying invisible until it hits a driver bench.  Runs at the baseline
scale (sf0.1) update the ledger: first measurement = the entry's own
baseline (immutable); last measurement + run counter drive rotation.

The ``candidates`` section counts the candidate-pair volume of the
celled/banded operators (correlate_matrix, MinHash-LSH, aHash bands)
and ASSERTS each stays under its budget — a banding change that
silently re-opens the measured 370M-pair blowup fails the bench run
(rc != 0) instead of a 10-minute wall.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
WINDOW = int(os.environ.get("SPARK_GRAFT_BENCH_WINDOW", "60"))
#: comma-separated subset for DRIFT ADJUDICATION runs (BASELINE.md
#: protocol: cross-round comparisons are only valid between
#: fresh-process runs of the SAME query set — never mega-run ratios).
#: When set: only these names run (headline or _extra_benches), no
#: rotation window, no ledger update, no candidate counts.
ONLY = [
    n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n
]
LEDGER_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baselines.json"
)
#: ledger updates only happen at the baseline scale — a local sf0.01
#: iteration must not pollute the sf0.1 baselines or the rotation order
BASELINE_SF = "0.1"

#: candidate-pair budgets for the celled operators at sf0.1 — ~10-40×
#: the measured counts (BASELINE.md r11: correlate_matrix 36.8k,
#: minhash 2.1k, ahash 46.7k), far under the 370M-pair blowup the
#: stop-band cap prevents; breaching one fails the bench run
CANDIDATE_BUDGETS = {
    "m3_correlate_matrix": 500_000,
    "dedup_minhash_lsh": 500_000,
    "mm_ahash_neardup": 2_000_000,
    # r13 sweep additions (scripts/scale_r13_banded.py): measured sf0.1
    # counts are 165,591 / 124,588 / 9,110 / 27,421 — deterministic per
    # corpus, so a breach is a banding/auto-knob regression, not noise
    "dedup_simhash": 300_000,
    "dedup_semantic_cell_pairs": 250_000,
    "ann_hard_negatives_ivf": 50_000,
    "search_bm25_postings": 100_000,
}

#: one per operator category (SURVEY.md §6 protocol): scan+filter, grouped
#: agg, window, densify, binary join, topK, percentile + pipeline ops
BENCH_QUERIES = [
    "m3_fetch_filtered",
    "m3_sum_by",
    "m3_moving_avg",
    "m3_keep_last_value",
    "m3_per_second_rate",
    "m3_divide",
    "m3_topk",
    "m3_percentile_of_series",
    "m3_summarize",            # interval re-bucketing (grouped window)
    "m3_sort",                 # per-series stat rank + broadcast-back
    "m3_tag_sub",              # label-op family (regex label rewrite)
    "m3_federated_fetch",      # resolved-partitions union + overlap dedup
    "m3ql_macros_binary",      # full language path: parse → plan → build
    "promql_sum_by_rate",      # PromQL language path
    "promql_histogram_quantile",  # bucket-fold aggregation path
    "stats_labels",            # stats API (count-distinct)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_semantic",          # SemDeDup k-means + within-cell prune (r5)
    "dedup_exact_substring",   # chunk-level Lee-et-al dedup (r5)
    "dedup_cross_corpus",      # incremental-crawl two-corpus LSH (r6)
    "text_compressibility",    # token-entropy compressibility proxy (r6)
    "search_bm25",             # BM25 top-k lexical retrieval (r6)
    "sample_importance_dsir",  # DSIR importance weights (r6)
    "text_gopher_quality",     # Gopher curation rules (r5)
    "text_lm_perplexity",      # corpus-trained bigram LM scoring (r5)
    "pack_sequences",          # training-batch construction (r5)
    "chunk_documents",         # RAG token-window chunking (r6)
    "sessionize_events",       # gap-session construction (r5)
    "events_asof_join",        # union-trick as-of join (r6)
    "events_range_join",       # bucketed bounded-range join (r6)
    "text_pmi_bigrams",        # PMI collocation mining (r6)
    "recording_rule_batch",    # rule machinery, batch leg (r6 bench add)
    "alert_rule_batch",        # alert state machine, batch leg (r6 bench add)
    "text_quality",
    "ann_cosine_topk",
    "ann_ivf_topk",            # cell-pruned ANN
    "ann_pq_adc_topk",         # PQ codes + ADC + exact re-rank (r6)
    "mm_audio_features",       # mapInPandas (Arrow) path
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q9_profit",          # multi-dim broadcast profit rollup (r5)
    "text_bpe_merges",         # iterative driver-loop trainer (r7)
    "decontaminate_bloom",     # bitmap-prefilter decontamination (r7)
    "tpch_q2_min_cost_supplier",  # pair-table rank window (r7)
    "m3_changepoints",         # running-window CUSUM closed form (r8)
    "text_bpe_encode",         # tokenizer apply — subword stream (r8)
    "search_hybrid_rerank",    # BM25 shortlist + PRF dense rerank (r8)
    "text_tfidf_terms",        # per-doc keyword extraction (r8)
    "m3_correlate_target",     # one-vs-all series correlation (r8)
    "m3_interpolate",          # sparse gap-run generator (r8 rewrite)
    "m3_ewma",                 # bounded collect_list codegen fold (r8)
    "m3_moving_percentile",    # trailing p95, scatter/dense dual (r8)
    "m3_autocorrelation",      # lag scatter + two partial aggs (r8)
    "m3_fleet_outliers",       # persisted corpus agg + 1-row stats (r8)
    "text_source_stats",       # per-source curation audit groupBy (r8)
    "m3_correlate_matrix",     # celled all-pairs correlation matrix (r9)
    "text_bpe_encode_xcorpus", # BPE fit/apply cross-corpus encode (r9)
    "m3_seasonal_auto",        # ACF season detect + phase window (r9)
    "split_leakage_safe",      # near-dup-cluster train/test split (r9)
    "m3_seasonal_decompose",   # classical trend/seasonal/residual (r10)
    "dedup_xcorpus_prebuilt",  # fit/apply dedup vs pre-built model (r10)
    "pipeline_curate_incremental",  # delta-only curation funnel (r10)
    "m3_lead_lag",             # best-aligned lag vs target series (r10)
    "dedup_boilerplate_spans", # corpus-wide template-span removal (r10)
    "m3_forecast",             # seasonal-naive + drift forecast (r10)
    "dedup_xcorpus_update",    # delta-only dedup-model maintenance (r10)
    "text_classifier_calibration",  # keep/drop threshold sweep (r10)
    "search_eval_metrics",     # recall/MRR/nDCG ranking evaluation (r10)
    "m3_rolling_corr",         # windowed integer-moment Pearson (r10)
    "mm_ahash_neardup",        # Hamming-banded perceptual near-dup (r10)
    "ann_ivf_prebuilt",        # query probes vs pre-built IVF index (r10)
    "text_ngram_novelty",      # corpus-relative diversity score (r10)
    "m3_forecast_backtest",    # hold-out forecast evaluation (r10)
    "sample_token_budget",     # bucketed-threshold token mixing (r10)
    "ann_ivf_update",          # frozen-centroid incremental add (r10)
    "m3ql_rolling_corr",       # language-path rolling correlation (r10)
    "events_funnel_latency",   # time-to-conversion distribution (r10)
]


#: recording-rule group for the backfill bench — M3-aggregator shape,
#: one shared scan for the whole group
_RULE_GROUP = [
    {"record": f"region:{n}:{agg}", "match": {"name": [n]},
     "group_by": ["region"], "agg": agg, "resolution_ms": 120_000}
    for n, agg in (
        ("error", "max"), ("error", "sum"), ("click", "avg"),
        ("purchase", "max"),
    )
]


def _extra_benches(spark, tmp_root: str, sf_dir: str | None = None):
    """Streaming heavyweights that WRITE stores instead of returning a
    DataFrame (backfill_rules over a rule group, cascade_rollup): the
    shared input stores are built once (setup, untimed — the protocol
    times the operator, not fixture construction); each timed run
    appends into a fresh output dir so runs stay comparable.
    ``sf_dir`` defaults to the bench scale; scripts/scale_check.py
    passes its 1×/10× dirs to certify the scaling exponents."""
    import shutil

    from pyspark.sql import functions as F

    from time_series_db_spark.sources.tables import fetch_events
    from time_series_db_spark.streaming.downsample import cascade_rollup
    from time_series_db_spark.streaming.ingest import DEFAULT_BLOCK_MS
    from time_series_db_spark.streaming.rules import backfill_rules

    if sf_dir is None:
        sf_dir = SF_DIR
    store = os.path.join(tmp_root, "metrics")
    base = fetch_events(spark, sf_dir).df.select(
        "series_key", "labels", "ts", "value"
    ).withColumn("block", F.col("ts") - F.col("ts") % F.lit(DEFAULT_BLOCK_MS))
    base.repartition(F.col("block")).write.mode("overwrite").partitionBy(
        "block"
    ).parquet(store)

    fine = os.path.join(tmp_root, "rollup_fine")
    res = 120_000
    (
        spark.read.parquet(store)
        .withColumn("ts", F.col("ts") - F.col("ts") % F.lit(res))
        .groupBy("series_key", "ts")
        .agg(
            F.sum("value").alias("value_sum"),
            F.count(F.lit(1)).cast("double").alias("value_count"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.last("value").alias("value_last"),
        )
        .withColumn("labels", F.create_map(F.lit("name"), F.lit("x")))
        .withColumn(
            "block", F.col("ts") - F.col("ts") % F.lit(DEFAULT_BLOCK_MS)
        )
        .repartition(F.col("block"))
        .write.mode("overwrite")
        .partitionBy("block")
        .parquet(fine)
    )

    seq = iter(range(10_000))

    def bench_backfill() -> None:
        out = os.path.join(tmp_root, f"rules_out_{next(seq)}")
        backfill_rules(spark, store, out, _RULE_GROUP)
        shutil.rmtree(out, ignore_errors=True)

    def bench_cascade() -> None:
        out = os.path.join(tmp_root, f"cascade_out_{next(seq)}")
        cascade_rollup(spark, fine, out, resolution_ms=12 * res)
        shutil.rmtree(out, ignore_errors=True)

    return {
        "rules_group_backfill": bench_backfill,
        "cascade_rollup": bench_cascade,
    }


def _load_ledger() -> dict:
    try:
        with open(LEDGER_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"seq": 0, "entries": {}}


def _rotation_window(queries: dict) -> list[str]:
    """The ``WINDOW`` catalog entries outside the headline set that are
    least-recently benched (never-benched first, then oldest ledger
    seq), in registration order within a tie."""
    ledger = _load_ledger()["entries"]
    headline = set(BENCH_QUERIES)
    reg_idx = {n: i for i, n in enumerate(queries)}
    pool = [n for n in queries if n not in headline]
    pool.sort(key=lambda n: (ledger.get(n, {}).get("last_seq", -1), reg_idx[n]))
    return pool[:WINDOW]


#: soft-alarm threshold: a fresh measurement above this multiple of the
#: entry's immutable own-baseline is flagged in the bench output (and
#: on stderr) by the run that measures it — the next densify-family-
#: style hot spot surfaces immediately instead of waiting for a judge
#: to read the tail (r12, verdict item #6)
DRIFT_ALARM_RATIO = 1.5
#: sub-second entries are noise-dominated (JIT, page cache); require an
#: absolute regression too before alarming
DRIFT_ALARM_MIN_SEC = 0.5
#: cap on the per-run session-inflation factor: the run-wide median
#: last/baseline ratio models the uniform warm-JVM-vs-mega-run bias
#: (r13 adjudication: the whole sub-second tail read 1.3x in the seq-6
#: mega-run yet 0.98x in a code A/B at identical protocol), but a
#: factor above this cap would mask a genuine run-wide regression, so
#: it is clamped and always reported in the bench JSON
SESSION_FACTOR_CAP = 1.5


def _session_factor(timings: dict[str, float], entries: dict) -> float:
    """Median last/baseline ratio of this run's already-baselined
    entries — the per-run multiplicative session-shape bias.  Mega-run
    baselines were recorded in deeply-warm JVMs; later, longer sessions
    uniformly inflate sub-second entries ~1.2-1.4x with no code change
    (BASELINE.md, round-13 adjudication).  Normalizing the drift alarm
    by this factor makes it flag entries that drift relative to their
    OWN RUN, which is the only signal that survives session shape."""
    ratios = sorted(
        sec / entries[name]["baseline_sec"]
        for name, sec in timings.items()
        if name in entries and entries[name].get("baseline_sec")
    )
    if not ratios:
        return 1.0
    mid = len(ratios) // 2
    med = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return min(max(1.0, med), SESSION_FACTOR_CAP)


def _update_ledger(timings: dict[str, float]) -> list[str]:
    """Record this run in ``bench_baselines.json``: the FIRST sf0.1
    measurement of an entry is its immutable own-baseline; every run
    refreshes last_sec/last_seq (the rotation key and the drift
    signal).  Returns the soft drift alarms (entries measuring >
    ``DRIFT_ALARM_RATIO``× their own baseline this run)."""
    data = _load_ledger()
    data["seq"] = int(data.get("seq", 0)) + 1
    seq = data["seq"]
    entries = data.setdefault("entries", {})
    factor = _session_factor(timings, entries)
    data["last_session_factor"] = round(factor, 3)
    alarms: list[str] = []
    for name, sec in timings.items():
        e = entries.setdefault(
            name, {"baseline_sec": sec, "baseline_seq": seq}
        )
        e["last_sec"] = sec
        e["last_seq"] = seq
        base = e["baseline_sec"]
        if (
            sec > DRIFT_ALARM_RATIO * base * factor
            and sec - base * factor > DRIFT_ALARM_MIN_SEC
        ):
            alarms.append(
                f"{name}: {sec:.2f}s vs own-baseline {base:.2f}s "
                f"({sec / base:.2f}x raw, session factor {factor:.2f})"
            )
    with open(LEDGER_PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    for a in alarms:
        print(f"DRIFT ALARM: {a}", file=sys.stderr)
    return alarms


def _candidate_counts(spark) -> dict[str, int]:
    """Candidate-pair counts of the celled operators, with budget
    assertions (the stop-band-cap watch item): a banding change that
    re-opens the quadratic path fails here, loudly and cheaply."""
    from pyspark.sql import functions as F

    from time_series_db_spark.catalog import (
        _CMX_CAP,
        _CMX_COARSE,
        _CMX_R,
        _CORR_STEP,
        _fetch,
    )
    from time_series_db_spark.catalog_pipeline import _docs
    from time_series_db_spark.operators import stats as stats_ops
    from time_series_db_spark.pipeline import dedup, multimodal

    counts: dict[str, int] = {}
    counts["m3_correlate_matrix"] = stats_ops.correlate_matrix_candidates(
        _fetch(spark, SF_DIR, step=_CORR_STEP),
        coarse_ms=_CMX_COARSE,
        band_symbols=_CMX_R,
        max_bucket=_CMX_CAP,
    ).count()
    sigs = dedup.minhash_signatures(_docs(spark, SF_DIR))
    counts["dedup_minhash_lsh"] = dedup.lsh_candidate_pairs(sigs).count()
    hashes = multimodal.image_ahash(
        multimodal.documents_as_media(_docs(spark, SF_DIR)), decode_fn="fake"
    )
    counts["mm_ahash_neardup"] = multimodal.ahash_neardup_pairs(
        hashes, max_hamming=7, num_bands=8, max_bucket=32,
        candidates_only=True,
    ).count()
    # r13 sweep operators, each at its SCALE configuration
    counts["dedup_simhash"] = dedup.simhash_dedup_pairs(
        _docs(spark, SF_DIR), max_hamming=3, max_bucket=128,
        candidates_only=True,
    ).count()
    from time_series_db_spark.catalog_pipeline import _embs
    from time_series_db_spark.pipeline import ann

    vecs = _embs(spark, SF_DIR).select(
        F.col("vec_id"), ann._as_double(F.col("embedding")).alias("__v")
    )
    n_vecs = vecs.count()
    nlist = max(16, -(-n_vecs // dedup.SEMANTIC_TARGET_CELL))
    cents = F.broadcast(
        ann.kmeans_centroids(vecs, nlist=nlist, iters=2, id_col="vec_id")
    )
    counts["dedup_semantic_cell_pairs"] = int(
        ann.ivf_assign(vecs, cents, nprobe=1, id_col="vec_id")
        .groupBy("__cell").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)).first()[0]
    )
    embs = _embs(spark, SF_DIR)
    counts["ann_hard_negatives_ivf"] = ann.hard_negatives_ivf(
        embs, embs.filter(F.col("vec_id") % 50 == 0),
        k=5, nlist="auto", nprobe=2, candidates_only=True,
    ).count()
    from time_series_db_spark.catalog_pipeline import _BM25_TERMS
    from time_series_db_spark.pipeline import textprep

    counts["search_bm25_postings"] = (
        _docs(spark, SF_DIR)
        .select(F.explode(textprep.tokens(F.col("text"))).alias("term"))
        .where(F.col("term").isin(list(_BM25_TERMS)))
        .count()
    )
    # budgets are calibrated at BASELINE_SF — enforcing them at other
    # scales would false-trip (larger sf) or vacuously pass (smaller);
    # and the gate is a real exception, not an ``assert`` stripped
    # under ``python -O`` (ADVICE r11)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    if sf == BASELINE_SF:
        over = {
            n: (c, CANDIDATE_BUDGETS[n])
            for n, c in counts.items()
            if c > CANDIDATE_BUDGETS[n]
        }
        if over:
            raise SystemExit(
                "candidate-pair budget breached (banding/stop-band "
                f"regression): {over}"
            )
    return counts


def main() -> None:
    import tempfile

    from time_series_db_spark.catalog import QUERIES
    from time_series_db_spark.session import get_spark

    spark = get_spark("tsdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if ONLY:
        names = [n for n in ONLY if n in QUERIES]
    else:
        headline = [n for n in BENCH_QUERIES if n in QUERIES]
        names = headline + _rotation_window(QUERIES)
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]

        def run() -> float:
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        run()  # warm-up (JIT, parquet footer cache) — discarded
        timings[name] = round(statistics.median(run() for _ in range(RUNS)), 4)

    extra_names = ("rules_group_backfill", "cascade_rollup")
    want_extra = not ONLY or any(n in ONLY for n in extra_names)
    with tempfile.TemporaryDirectory(prefix="tsdb_bench_") as tmp_root:
        extras = _extra_benches(spark, tmp_root) if want_extra else {}
        for name, action in extras.items():
            if ONLY and name not in ONLY:
                continue

            def run_action(action=action) -> float:
                t0 = time.perf_counter()
                action()
                return time.perf_counter() - t0

            run_action()  # warm-up — discarded
            timings[name] = round(
                statistics.median(run_action() for _ in range(RUNS)), 4
            )

    candidates = {} if ONLY else _candidate_counts(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    alarms: list[str] = []
    if (
        sf == BASELINE_SF
        and not ONLY
        and not os.environ.get("SPARK_GRAFT_BENCH_NO_RECORD")
    ):
        alarms = _update_ledger(timings)

    total = round(sum(timings.values()), 4)
    # field order: the per-entry "queries" dict FIRST, the scalar
    # summary (metric/value/unit/sf) LAST.  The driver captures only the
    # tail of stdout; since the rotation window grew the dict past that
    # tail (r10), a truncated line lost the headline total. With the
    # scalars at the end of the line the tail always contains them (and
    # the candidate gates), whatever the window size.  Same ONE JSON
    # line, same keys, same timings — JSON objects are unordered.
    out = {
        "queries": timings,
        "candidates": candidates,
    }
    if alarms:
        out["drift_alarms"] = alarms
    out.update(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "sf": sf,
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
