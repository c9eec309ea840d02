"""Scale self-check: do the heavy operators scale ~linearly sf0.1 → ~sf1?

Synthesizes a 10× events table and a 10× documents table in /tmp by
re-stamping the sf0.1 parquet with shifted time ranges / doc ids (same
schema, same per-series density — so series count ×10 for events, corpus
×10 for documents), then times representative heavy queries at 1× and
10× and prints the scaling exponents. A healthy distributed plan lands
near 1.0 (linear); quadratic candidate generation or a single-partition
sort shows up as ≫1.

Usage: python scripts/scale_check.py [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
#: work dir is keyed by the copy count so a 100× build (the two-decade
#: sweep, scripts/scale_twodecade.py) never collides with the standard
#: 10× corpus; the legacy name is kept for COPIES=10 so the existing
#: build is reused
WORK = os.environ.get("SPARK_GRAFT_SCALE_WORK") or (
    "/tmp/scale_check_sf1" if COPIES == 10 else f"/tmp/scale_check_x{COPIES}"
)

#: heavy queries whose scaling we certify (one per risk class)
QUERIES = [
    "m3_sum_by",               # grouped agg (shuffle volume)
    "m3_moving_avg",           # per-series window
    "m3_sort",                 # distributed rank
    "m3_percentile_of_series_windowed",  # rank-window percentile
    "dedup_exact",
    "dedup_minhash_lsh",       # banded LSH — the quadratic-risk one
    "dedup_exact_substring",
    "text_quality",
    "text_lm_perplexity",      # broadcast-LM scoring join
    "text_ppl_buckets",        # per-language threshold broadcast-back
    "search_bm25",             # postings filter + broadcast stats (r6)
    "sample_importance_dsir",  # hashed-model literal-LUT scoring (r6)
    "chunk_documents",         # zero-shuffle posexplode chunking (r6)
    "events_asof_join",        # union-trick as-of join (r6)
    "events_range_join",       # bucketed range join — quadratic-risk (r6)
    "events_retention",        # cohort dedup + self-key join (r6)
    "text_pmi_bigrams",        # bigram count tables + broadcast joins (r6)
    "tpch_q1_pricing",
    "dedup_cross_corpus",      # two-corpus band join — cost ∝ snapshot (r7)
    "embedding_pq_codes",      # PQ train + encode — linear corpus pass (r7)
    "ann_pq_adc_topk",         # flat ADC — the O(N·Q) exposure check (r7):
                               # the catalog entry's query set is N/50, so
                               # BOTH sides grow 10× and honest flat-ADC
                               # cost grows ~100×; ivfpq below is the
                               # scale path that must stay near-linear
    "ann_ivfpq_topk",          # celled ADC + re-rank — the scale path (r7)
    "m3_decimate_lttb",        # range-frame window decimation (r7)
    "m3_seasonal_anomalies",   # two-window seasonal z-score (r7)
    "text_bpe_merges",         # iterative driver-loop trainer (r7)
    "decontaminate_bloom",     # bitmap prefilter + exact confirm (r7)
    "tpch_q2_min_cost_supplier",  # pair-table rank window (r7)
    "m3_changepoints",         # stacked running windows, one exchange (r8)
    "text_bpe_encode",         # word-table join + row-multiplying explode (r8)
    "text_source_stats",       # full-scan per-source partial agg (r8)
    "text_tfidf_terms",        # tf/df partial aggs + WindowGroupLimit (r8)
    "embedding_source_drift",  # exploded equi-join + two reductions (r8)
    "dedup_soft_weights",      # pair-graph CC + metadata-sized join (r8)
    "m3_interpolate",          # sparse gap-run generator (r8 rewrite)
    "m3_ewma",                 # bounded collect_list codegen fold (r8)
    "m3_correlate_target",     # broadcast one series, grouped corr (r8)
    "m3_fleet_outliers",       # one persisted corpus agg + 1-row stats (r8)
    "m3_autocorrelation",      # bounded lag scatter + two partial aggs (r8)
    "m3_moving_percentile",    # trailing p95, scatter/dense dual (r8)
    "search_hybrid_rerank",    # BM25 scan + shortlist-broadcast stages (r9)
    "m3_correlate_matrix",     # banded sketch + stop-band cap — the
                               # quadratic-risk one: candidates must stay
                               # ~flat as the fleet grows 10× (r9)
    "text_bpe_encode_xcorpus", # fit/apply split — train half, encode half (r9)
    "decontaminate_eval_side", # corpus scan filtered by broadcast eval grams (r9)
    "m3_seasonal_auto",        # ACF detect + one phase window (r9)
    "m3_seasonal_auto_series", # votes join-back + column phase key (r9)
    "split_leakage_safe",      # CC over pairs + hash bucketing (r9)
    "corpus_diff",             # two snapshot scans + full-outer join (r9)
    "m3_seasonal_decompose",   # two range MAs + phase window (r10)
    "dedup_xcorpus_prebuilt",  # fit/apply band join vs pre-built model (r10)
    "pipeline_curate_incremental",  # delta text scan + metadata tail (r10)
    "m3_lead_lag",             # ±L-shifted target broadcast join (r10)
    "dedup_boilerplate_spans", # prevalence count + flag join back (r10)
    "m3_forecast",             # endpoint table + horizon base join (r10)
    "dedup_xcorpus_update",    # delta-only signature refresh (r10)
    "text_classifier_calibration",  # GD fit + integer threshold sweep (r10)
    "search_eval_metrics",     # judgment joins + integer DCG sums (r10)
    "m3_rolling_corr",         # windowed integer co-moments (r10)
    "mm_ahash_neardup",        # Hamming band keys + popcount verify (r10)
    "ann_ivf_prebuilt",        # prebuilt-index probe path (r10)
    "text_ngram_novelty",      # gram prevalence + flag join back (r10)
    "m3_forecast_backtest",    # hold-out cut + forecast + error sums (r10)
    "sample_token_budget",     # boundary-bucket-only sort fill (r10)
    "ann_ivf_update",          # delta-only frozen-centroid assign (r10)
    "events_funnel_latency",   # funnel unpivot + quantile agg (r10)
    "m3ql_rolling_corr",       # language-path rolling corr (r10)
]

#: store-writing heavyweights (bench.py _extra_benches): the #1 and #4
#: costs in BENCH_r07 — their "one scan per rule group" / "fold from
#: fine tiers, never re-scan raw" claims get the same 10× certification
#: as the catalog queries (r8)
EXTRA_QUERIES = ["rules_group_backfill", "cascade_rollup"]


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(WORK, exist_ok=True)
    # v3: orders/lineitem scale with COPIES too (the full-catalog sweep
    # includes the TPC-H family; fact tables grow, dimensions don't —
    # the 100 TB shape)
    # v4: embedding copies are dimension-ROTATED, not scalar-scaled — a
    # scalar perturbation preserves cosine ≈ 1 between copies, so every
    # vector had 9 true clones and near-dup/topk outputs grew ~×100 by
    # construction (measured: dedup_embedding_cosine exponent 1.41 on
    # v3 — an artifact of the corpus, not the operator); a circular
    # dim shift decorrelates copies while keeping norms and PQ seeds
    done = os.path.join(WORK, "_DONE_v4")
    if os.path.exists(done):
        return
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    copies = spark.range(COPIES).withColumnRenamed("id", "__c")
    # user-id shift per copy: series count ×COPIES, same time range and
    # per-series density (the dimension that actually grows at 100 TB)
    big = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("__c") * 10_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__c") * n_users).cast("int").alias("user_id"),
        "event_type", "value", "props",
    )
    big.write.mode("overwrite").parquet(f"{WORK}/events.parquet")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    bigd = docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("__c") * n_docs).alias("doc_id"),
        # perturb text per copy so dedup work scales honestly (pure
        # clones would make near-dup candidate sets degenerate)
        F.when(F.col("__c") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" c"), F.col("__c")))
        .alias("text"),
        "lang", "source", "n_chars",
    )
    bigd.write.mode("overwrite").parquet(f"{WORK}/documents.parquet")
    embs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_vecs = embs.count()
    # vec-id shift per copy keeps ids 0..k-1 present (PQ codebook seeds);
    # each copy's vectors are circularly dim-SHIFTED by 7·copy positions
    # (norm-preserving, decorrelates copies — a scalar perturbation kept
    # cosine ≈ 1 between copies, giving every vector 9 true clones and
    # quadratic-by-construction near-dup output; see v4 note above) plus
    # a tiny scale so no two copies are bit-equal
    dim = 64
    bige = embs.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("__c") * n_vecs).alias("vec_id"),
        F.transform(
            F.concat(
                F.slice(
                    "embedding",
                    (F.col("__c") * 7) % dim + 1,
                    dim - (F.col("__c") * 7) % dim,
                ),
                F.slice("embedding", F.lit(1), (F.col("__c") * 7) % dim),
            ),
            lambda x: (x * (F.lit(1.0) + F.col("__c") * F.lit(1e-4)))
            .cast("float"),
        ).alias("embedding"),
        "label",
    )
    bige.write.mode("overwrite").parquet(f"{WORK}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{WORK}/{t}.parquet")
    # facts grow ×COPIES with shifted order keys (same customers /
    # suppliers / parts — dimensions are the broadcast side at 100 TB)
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    key_shift = (orders.agg(F.max("o_orderkey")).first()[0] + 1)
    bigo = orders.crossJoin(F.broadcast(copies)).select(
        (F.col("o_orderkey") + F.col("__c") * key_shift).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    bigo.write.mode("overwrite").parquet(f"{WORK}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    bigl = li.crossJoin(F.broadcast(copies)).select(
        (F.col("l_orderkey") + F.col("__c") * key_shift).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    bigl.write.mode("overwrite").parquet(f"{WORK}/lineitem.parquet")
    open(done, "w").write("ok")


def main() -> None:
    from time_series_db_spark.catalog import QUERIES as CAT
    from time_series_db_spark.session import get_spark

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    def run(name: str, sf_dir: str) -> float:
        fn = CAT[name]

        def once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        once()  # warm-up
        n = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
        return round(statistics.median(once() for _ in range(n)), 4)

    import math
    import tempfile

    def entry(t1: float, t10: float) -> dict:
        return {
            "t_1x": t1,
            "t_10x": t10,
            "ratio": round(t10 / t1, 2),
            # time ∝ N^e  ⇒  e = log(t10/t1) / log(COPIES)
            "exponent": round(math.log(t10 / t1) / math.log(COPIES), 2),
        }

    # optional subset (comma-separated names) — iterate on one op's
    # certification without re-running the whole sweep; SCALE_ALL=1
    # sweeps EVERY catalog entry (the full-catalog exponent audit:
    # anything >0.9 that isn't a by-design corpus-proportional scan is
    # the unpersisted-model signature that caught two r10 defects)
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if os.environ.get("SPARK_GRAFT_SCALE_ALL"):
        # dedup_ngram_jaccard is the DOCUMENTED quadratic exact baseline
        # (its docstring says "use MinHash at scale"); on the low-entropy
        # synthetic corpus it is effectively all-pairs (36.5M candidate
        # rows at sf0.1, measured r11), so its 10x run is ~100x the 37 s
        # 1x cost — excluded rather than burning an hour proving a
        # documented property.  Every other entry runs.
        pool = [n for n in CAT if n != "dedup_ngram_jaccard"]
    else:
        pool = list(QUERIES)
    selected = [n for n in pool if only is None or n in only.split(",")]

    out = {}
    for name in selected:
        out[name] = entry(run(name, BASE), run(name, WORK))
        print(name, out[name], flush=True)

    # store-writing extras: build each scale's input stores (untimed
    # setup), then time the operator exactly as bench.py does
    import bench as bench_mod

    def run_extras(sf_dir: str) -> dict[str, float]:
        res = {}
        with tempfile.TemporaryDirectory(prefix="tsdb_scale_") as tmp:
            for name, action in bench_mod._extra_benches(
                spark, tmp, sf_dir=sf_dir
            ).items():

                def once(action=action) -> float:
                    t0 = time.perf_counter()
                    action()
                    return time.perf_counter() - t0

                once()  # warm-up
                res[name] = round(
                    statistics.median(once() for _ in range(3)), 4
                )
        return res

    extras = [
        n for n in EXTRA_QUERIES if only is None or n in only.split(",")
    ]
    if extras:
        e1, e10 = run_extras(BASE), run_extras(WORK)
        for name in extras:
            out[name] = entry(e1[name], e10[name])
        print(name, out[name], flush=True)
    line = json.dumps({"copies": COPIES, "queries": out})
    print(line)
    if len(sys.argv) > 1:
        open(sys.argv[1], "w").write(line + "\n")


if __name__ == "__main__":
    main()
