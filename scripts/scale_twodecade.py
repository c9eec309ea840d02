"""Two-decade scale check: heavy-tail + celled operators at 1× vs 100×.

The 10× sweep (scripts/scale_check.py, r11) is one decade; occupancy-
driven super-linearity can hide below its noise floor and only bite at
higher density — the r11 lesson was ``dedup_embedding_cosine``, whose
fixed-band exponent read 0.89-1.41 at 10× but whose CANDIDATE COUNT was
already growing quadratically (95.5M pairs at 20k vectors).  This
script (r11 verdict item #3):

1. builds a 100× corpus from sf0.1 with the same re-stamping scheme as
   scale_check.build (events series ×100, documents ×100, embeddings
   dim-rotated ×100; TPC-H facts copied 1× — no TPC-H entry is in the
   heavy-tail selection, and scaling them would triple the build for
   nothing),
2. times the heavy-tail entries at 1× and 100× and reports the
   TWO-DECADE exponent e = log100(t_100x / t_1x),
3. counts candidate pairs for the four banded/celled operators at both
   scales and enforces the extrapolated budget: candidates must stay
   within LINEAR_SLACK × 100 × their 1× count (a banding scheme whose
   occupancy holds produces ~linear candidates; quadratic growth blows
   straight through).

Documented-linear scans (text_repetition e=1.0, decontaminate_ngram
0.98, embedding_quantize 1.0, decontaminate_eval_side 0.97 at 10× —
all single-pass corpus scans whose cost IS the scan) are excluded by
design: a second decade of a proven-linear scan costs ~15 min each and
answers nothing the 10× sweep didn't.

Usage: python scripts/scale_twodecade.py [out.json]
Env: SPARK_GRAFT_2DEC_RUNS (timed runs per side, default 1 + warmup).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 100
WORK = f"/tmp/scale_check_x{COPIES}"
RUNS = int(os.environ.get("SPARK_GRAFT_2DEC_RUNS", "1"))
#: candidate budget at 100× = LINEAR_SLACK × COPIES × (1× count)
LINEAR_SLACK = 1.5

#: heavy tail (top of the r11 driver tail / bench ledger, excluding
#: documented-linear scans) + the streaming heavyweights
HEAVY = [
    "m3_line_protocol_roundtrip",
    "m3_graphite_roundtrip",
    "m3_exposition_roundtrip",
    "m3_is_non_null",
    "m3_transform_null",
    "m3_changed",
    "pipeline_curate_full",
    "ann_ivfpq_topk",
    "m3_correlate_matrix",
    "dedup_minhash_lsh",
    "mm_ahash_neardup",
    "dedup_embedding_cosine",
]
EXTRA = ["rules_group_backfill", "cascade_rollup"]


def build(spark) -> None:
    """100× corpus: reuse scale_check.build's re-stamping for the fact
    tables the heavy tail reads; TPC-H facts copied unscaled."""
    from pyspark.sql import functions as F

    done = os.path.join(WORK, "_DONE_v1")
    if os.path.exists(done):
        return
    os.makedirs(WORK, exist_ok=True)
    copies = spark.range(COPIES).withColumnRenamed("id", "__c")

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("__c") * 10_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__c") * n_users).cast("int").alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{WORK}/events.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("__c") * n_docs).alias("doc_id"),
        F.when(F.col("__c") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" c"), F.col("__c")))
        .alias("text"),
        "lang", "source", "n_chars",
    ).write.mode("overwrite").parquet(f"{WORK}/documents.parquet")

    embs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_vecs = embs.count()
    dim = 64
    embs.crossJoin(F.broadcast(copies)).select(
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
    ).write.mode("overwrite").parquet(f"{WORK}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{WORK}/{t}.parquet")
    open(done, "w").write("ok")


def candidate_counts(spark, sf_dir: str) -> dict[str, int]:
    """Candidate-pair volume of the banded/celled operators — the cost
    driver whose growth rate IS the scale claim."""
    from pyspark.sql import functions as F  # noqa: F401

    from time_series_db_spark.catalog import (
        _CMX_CAP, _CMX_COARSE, _CMX_R, _CORR_STEP, _fetch,
    )
    from time_series_db_spark.catalog_pipeline import _docs, _embs
    from time_series_db_spark.operators import stats as stats_ops
    from time_series_db_spark.pipeline import dedup, multimodal

    counts: dict[str, int] = {}
    counts["m3_correlate_matrix"] = stats_ops.correlate_matrix_candidates(
        _fetch(spark, sf_dir, step=_CORR_STEP),
        coarse_ms=_CMX_COARSE, band_symbols=_CMX_R, max_bucket=_CMX_CAP,
    ).count()
    sigs = dedup.minhash_signatures(_docs(spark, sf_dir))
    counts["dedup_minhash_lsh"] = dedup.lsh_candidate_pairs(sigs).count()
    hashes = multimodal.image_ahash(
        multimodal.documents_as_media(_docs(spark, sf_dir)), decode_fn="fake"
    )
    counts["mm_ahash_neardup"] = multimodal.ahash_neardup_pairs(
        hashes, max_hamming=7, num_bands=8, max_bucket=32,
        candidates_only=True,
    ).count()
    counts["dedup_embedding_cosine"] = dedup.embedding_neardup_pairs(
        _embs(spark, sf_dir), planes_per_band="auto", candidates_only=True
    ).count()
    return counts


def main() -> None:
    from time_series_db_spark.catalog import QUERIES as CAT
    from time_series_db_spark.session import get_spark

    spark = get_spark("scale-2dec")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    def run(name: str, sf_dir: str) -> float:
        fn = CAT[name]

        def once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        once()  # warm-up
        return round(statistics.median(once() for _ in range(RUNS)), 4)

    out: dict[str, dict] = {}

    def entry(t1: float, t100: float) -> dict:
        return {
            "t_1x": t1,
            "t_100x": t100,
            "ratio": round(t100 / t1, 2),
            "exponent": round(math.log(t100 / t1) / math.log(COPIES), 2),
        }

    for name in HEAVY:
        out[name] = entry(run(name, BASE), run(name, WORK))
        print(name, out[name], flush=True)

    import bench as bench_mod

    def run_extras(sf_dir: str) -> dict[str, float]:
        res = {}
        with tempfile.TemporaryDirectory(prefix="tsdb_2dec_") as tmp:
            for name, action in bench_mod._extra_benches(
                spark, tmp, sf_dir=sf_dir
            ).items():

                def once(action=action) -> float:
                    t0 = time.perf_counter()
                    action()
                    return time.perf_counter() - t0

                once()
                res[name] = round(
                    statistics.median(once() for _ in range(RUNS)), 4
                )
        return res

    e1, e100 = run_extras(BASE), run_extras(WORK)
    for name in EXTRA:
        out[name] = entry(e1[name], e100[name])
        print(name, out[name], flush=True)

    c1 = candidate_counts(spark, BASE)
    c100 = candidate_counts(spark, WORK)
    cands = {}
    breaches = {}
    for name, n1 in c1.items():
        budget = int(LINEAR_SLACK * COPIES * max(n1, 1))
        cands[name] = {
            "candidates_1x": n1,
            "candidates_100x": c100[name],
            "budget_100x": budget,
            "growth": round(c100[name] / max(n1, 1), 1),
        }
        print(name, cands[name], flush=True)
        if c100[name] > budget:
            breaches[name] = cands[name]

    line = json.dumps({"copies": COPIES, "queries": out, "candidates": cands})
    print(line)
    if len(sys.argv) > 1:
        open(sys.argv[1], "w").write(line + "\n")
    if breaches:
        raise SystemExit(
            f"100x candidate budget breached (super-linear banding): {breaches}"
        )


if __name__ == "__main__":
    main()
