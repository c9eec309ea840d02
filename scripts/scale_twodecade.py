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
    tables the heavy tail reads; TPC-H facts copied unscaled.

    The scaled tables are written REPARTITIONED (64 files): the sf0.1
    originals are single driver-generated files, and a ×100 crossJoin
    inherits the input's 2-3 splits — a scan-only operator (the wire
    roundtrips have zero exchanges) would then run 10M rows on 3 tasks
    with 29 cores idle, measuring the accident of file count instead of
    the operator (observed: the first sweep attempt stalled >10 min on
    exactly that straggler).  At 100 TB the input is thousands of
    splits and scan parallelism grows with the data; file count ∝ scale
    is the honest shape."""
    from pyspark.sql import functions as F

    done = os.path.join(WORK, "_DONE_v3")
    if os.path.exists(done):
        return
    os.makedirs(WORK, exist_ok=True)
    copies = spark.range(COPIES).withColumnRenamed("id", "__c")
    n_files = 64

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    # v3: VALUES are perturbed per copy (deterministic hash noise, ~25%
    # of magnitude) — verbatim value copies give every series 99 EXACT
    # clones, whose trend signatures are identical at ANY band length,
    # so a correlate sweep measures the clone construction (all buckets
    # ≥ 100 > cap → empty matrix), not the operator.  The embedding
    # build learned the same lesson in scale_check v4 (dim rotation vs
    # scalar perturbation).  Pearson is affine-invariant, so the noise
    # must be nonlinear in the original value — an additive hash of
    # (user, ts) is.
    shifted_user = (
        F.col("user_id").cast("long") + F.col("__c") * F.lit(int(n_users))
    )
    # ts is TIMESTAMP_NTZ in the raw parquet — hash it instead of doing
    # integer arithmetic on it (deterministic within a Spark version,
    # which is all a locally-built sweep corpus needs)
    noise = (
        F.pmod(F.hash(shifted_user, F.col("ts")), F.lit(997))
        .cast("double") / F.lit(997.0)
        - F.lit(0.5)
    )
    ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("__c") * 10_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__c") * n_users).cast("int").alias("user_id"),
        "event_type",
        (
            F.col("value")
            + F.when(F.col("__c") == 0, F.lit(0.0)).otherwise(
                noise * (F.abs("value") * F.lit(0.5) + F.lit(0.1))
            )
        ).alias("value"),
        "props",
    ).repartition(n_files).write.mode("overwrite").parquet(
        f"{WORK}/events.parquet"
    )

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("__c") * n_docs).alias("doc_id"),
        F.when(F.col("__c") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" c"), F.col("__c")))
        .alias("text"),
        "lang", "source", "n_chars",
    ).repartition(n_files).write.mode("overwrite").parquet(
        f"{WORK}/documents.parquet"
    )

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
    ).repartition(n_files).write.mode("overwrite").parquet(
        f"{WORK}/embeddings.parquet"
    )

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{WORK}/{t}.parquet")
    open(done, "w").write("ok")


#: stop-band cap for the embedding scale path (≈5× the auto-planes
#: occupancy target of 32 — drops only genuinely skewed direction
#: clusters, where hyperplane LSH carries no information anyway)
EMB_MAX_BUCKET = 128


def candidate_counts(spark, sf_dir: str) -> dict[str, int]:
    """Candidate-pair volume of the banded/celled operators AT THEIR
    SCALE CONFIGURATION — the cost driver whose growth rate IS the
    scale claim.  The knobs differ from the sf0.01-pinned catalog
    entries deliberately: correlate uses ``band_symbols="auto"``
    (occupancy-held signature length; the fixed 4-symbol config drops
    EVERY bucket at 750k series and returns an empty matrix — the r12
    cliff), and embedding adds the ``EMB_MAX_BUCKET`` stop-band on top
    of auto planes (average occupancy holds but clustered corpora skew
    — 152.6M candidates at 200k vectors without the cap)."""
    from pyspark.sql import functions as F  # noqa: F401

    from time_series_db_spark.catalog import (
        _CMX_CAP, _CMX_COARSE, _CORR_STEP, _fetch,
    )
    from time_series_db_spark.catalog_pipeline import _docs, _embs
    from time_series_db_spark.operators import stats as stats_ops
    from time_series_db_spark.pipeline import dedup, multimodal

    counts: dict[str, int] = {}
    counts["m3_correlate_matrix"] = stats_ops.correlate_matrix_candidates(
        _fetch(spark, sf_dir, step=_CORR_STEP),
        coarse_ms=_CMX_COARSE, band_symbols="auto", max_bucket=_CMX_CAP,
    ).count()
    sigs = dedup.minhash_signatures(_docs(spark, sf_dir))
    counts["dedup_minhash_lsh"] = dedup.lsh_candidate_pairs(sigs).count()
    # the minhash budget is TRUE-PAIR-AWARE: a corpus whose documents
    # genuinely contain k-sized near-dup cliques (this synthetic one
    # has ~COPIES-sized cliques by construction) forces ANY correct
    # algorithm to touch ≥ C(k,2) pairs per clique — candidates are
    # only "blown up" relative to the pairs that are really there
    counts["dedup_minhash_true_pairs"] = dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir), threshold=0.8
    ).count()
    hashes = multimodal.image_ahash(
        multimodal.documents_as_media(_docs(spark, sf_dir)), decode_fn="fake"
    )
    counts["mm_ahash_neardup"] = multimodal.ahash_neardup_pairs(
        hashes, max_hamming=7, num_bands=8, max_bucket=32,
        candidates_only=True,
    ).count()
    counts["dedup_embedding_cosine"] = dedup.embedding_neardup_pairs(
        _embs(spark, sf_dir), planes_per_band="auto",
        max_bucket=EMB_MAX_BUCKET, candidates_only=True,
    ).count()
    # the wide-hash answer to the 64-bit cap collapse (r12): 16-bit
    # bands hold occupancy for real perceptual hashes; the cap stays
    # for the STUB codec's text skew (the synthetic corpus shares long
    # prefixes, so a few degenerate band values go dense — measured: a
    # 512MB skew partition without the cap, 18 s with it)
    wide = multimodal.image_ahash_wide(
        multimodal.documents_as_media(_docs(spark, sf_dir)),
        decode_fn="fake", grid=16,
    )
    counts["mm_ahash_wide_neardup"] = multimodal.ahash_neardup_pairs_wide(
        wide, max_hamming=15, num_bands=16, bits=256, max_bucket=256,
        candidates_only=True,
    ).count()
    return counts


def main() -> None:
    from time_series_db_spark.catalog import QUERIES as CAT
    from time_series_db_spark.session import get_spark

    spark = get_spark("scale-2dec")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    def _scale_fn(name: str):
        """Timing functions for the two operators whose SCALE
        configuration differs from the sf0.01-pinned catalog entry (the
        catalog timing at 100× is misleading: correlate's fixed-symbol
        config returns an EMPTY matrix there, and uncapped embedding
        pays 152M skew candidates)."""
        if name == "m3_correlate_matrix@auto":
            from time_series_db_spark.catalog import (
                _CMX_CAP, _CMX_COARSE, _CORR_STEP, _fetch,
            )
            from time_series_db_spark.operators import stats as stats_ops

            return lambda spark, d: stats_ops.correlate_matrix(
                _fetch(spark, d, step=_CORR_STEP), coarse_ms=_CMX_COARSE,
                band_symbols="auto", max_bucket=_CMX_CAP, min_abs_corr=0.7,
            )
        if name == "dedup_embedding_cosine@capped":
            from time_series_db_spark.catalog_pipeline import _embs
            from time_series_db_spark.pipeline import dedup

            return lambda spark, d: dedup.embedding_neardup_pairs(
                _embs(spark, d), threshold=0.45, planes_per_band="auto",
                max_bucket=EMB_MAX_BUCKET,
            )
        return CAT[name]

    def run(name: str, sf_dir: str) -> float:
        fn = _scale_fn(name)

        def once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        once()  # warm-up
        return round(statistics.median(once() for _ in range(RUNS)), 4)

    out: dict[str, dict] = {}
    skip_timing = bool(os.environ.get("SPARK_GRAFT_2DEC_SKIP_TIMING"))
    if skip_timing and len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        # candidates-only re-run (budget/knob iteration): keep the
        # already-recorded timing exponents
        with open(sys.argv[1]) as f:
            out = json.load(f).get("queries", {})

    def entry(t1: float, t100: float) -> dict:
        return {
            "t_1x": t1,
            "t_100x": t100,
            "ratio": round(t100 / t1, 2),
            "exponent": round(math.log(t100 / t1) / math.log(COPIES), 2),
        }

    if not skip_timing:
        for name in HEAVY:
            out[name] = entry(run(name, BASE), run(name, WORK))
            print(name, out[name], flush=True)
    if os.environ.get("SPARK_GRAFT_2DEC_SCALECFG"):
        # time the scale-config variants of the two re-knobbed
        # operators (cheap: 4 runs total, reuses the built corpus)
        for name in ("m3_correlate_matrix@auto",
                     "dedup_embedding_cosine@capped"):
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
        if name == "dedup_minhash_true_pairs":
            continue
        budget = int(LINEAR_SLACK * COPIES * max(n1, 1))
        if name == "dedup_minhash_lsh":
            # true-pair-aware: any correct near-dup algorithm must
            # touch at least the pairs that are genuinely near-dups
            # (this corpus has ~COPIES-sized cliques by construction);
            # the banding is judged on its overhead ABOVE that floor
            budget = max(budget, 4 * c100["dedup_minhash_true_pairs"])
        cands[name] = {
            "candidates_1x": n1,
            "candidates_100x": c100[name],
            "budget_100x": budget,
            "growth": round(c100[name] / max(n1, 1), 1),
        }
        if name == "dedup_minhash_lsh":
            cands[name]["true_pairs_1x"] = c1["dedup_minhash_true_pairs"]
            cands[name]["true_pairs_100x"] = c100["dedup_minhash_true_pairs"]
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
