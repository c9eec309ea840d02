"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Protocol (BASELINE.md): one warm-up
run discarded per query, median of N timed runs, noop sink (no collect —
measures engine throughput, not driver materialization).
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
    "text_compression_ratio",  # zlib quality signal, Arrow UDF (r5)
    "text_gopher_quality",     # Gopher curation rules (r5)
    "text_lm_perplexity",      # corpus-trained bigram LM scoring (r5)
    "pack_sequences",          # training-batch construction (r5)
    "sessionize_events",       # gap-session construction (r5)
    "text_quality",
    "ann_cosine_topk",
    "ann_ivf_topk",            # cell-pruned ANN
    "mm_audio_features",       # mapInPandas (Arrow) path
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q9_profit",          # multi-dim broadcast profit rollup (r5)
]


def main() -> None:
    from time_series_db_spark.catalog import QUERIES
    from time_series_db_spark.session import get_spark

    spark = get_spark("tsdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in QUERIES]
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

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
