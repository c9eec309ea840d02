"""Two-decade occupancy sweep for the banded/celled operators the r12
sweep skipped (r12 verdict item #5): dedup_simhash, dedup_semantic,
ann_hard_negatives_ivf, search_bm25 — candidate/cell counts at 1× vs
100×, not just wall time (the r12 lesson: candidate exponents ~1.4 hide
behind healthy time exponents because parallelism absorbs the first
decade).

Reuses the cached 100× corpus from scripts/scale_twodecade.py (same
re-stamping: documents ×100 with per-copy suffixes → each base doc
becomes a genuine ~100-clique of near-dups, embeddings dim-rotated ×100).
Per operator:

- **dedup_simhash** — candidates (pre-Hamming banded pairs) uncapped vs
  ``max_bucket=128`` (cap > the 100-clique size, so corpus-truth cliques
  survive; fleet-wide boilerplate buckets drop), plus VERIFIED pairs
  (Hamming ≤ 3) as the true-pair floor.  Budget (true-pair-aware, the
  minhash discipline): capped candidates at 100× ≤
  max(1.5 × 100 × c_1x, 4 × verified_100x).
- **dedup_semantic** — cell-occupancy stats under ``nlist="auto"``
  (resolved nlist, max cell, Σ cell² = within-cell pair volume) at both
  scales + full-operator timing.  Budget: Σ cell² at 100× ≤
  1.5 × 100 × Σ cell²(1×) — the constant-cell-size regime IS the claim.
- **ann_hard_negatives_ivf** — celled candidate pairs at the catalog's
  FIXED nlist=16 vs ``nlist="auto"`` (anchors ∝ N, so fixed cells give
  ~N²/400 join rows).  Budget on the auto config only; the fixed config
  is recorded as the counter-example.
- **search_bm25** — postings rows surviving the pre-shuffle term filter
  + the hottest term's document frequency.  Expected exactly linear
  (posting volume ∝ corpus); the budget pins that.

Usage: python scripts/scale_r13_banded.py [out.json]
Env: SPARK_GRAFT_2DEC_RUNS (timed runs per side, default 1 + warmup),
     SPARK_GRAFT_R13_SKIP_TIMING (counts only, keep recorded timings).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_twodecade import BASE, COPIES, LINEAR_SLACK, WORK, build  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_2DEC_RUNS", "1"))
SIMHASH_CAP = 128  # > the synthetic 100-clique, < fleet-wide boilerplate


def _cell_stats(spark, sf_dir: str) -> dict:
    """dedup_semantic's occupancy under nlist='auto': the assignment is
    replayed exactly (same Lloyd rounds, same nprobe=1 argmax) and the
    within-cell pair volume Σ C(cell,2) — the operator's actual cost
    driver — is aggregated, never materialized."""
    from pyspark.sql import functions as F

    from time_series_db_spark.catalog_pipeline import _embs
    from time_series_db_spark.pipeline import ann, dedup

    vecs = _embs(spark, sf_dir).select(
        F.col("vec_id"), ann._as_double(F.col("embedding")).alias("__v")
    )
    n = vecs.count()
    nlist = max(16, -(-n // dedup.SEMANTIC_TARGET_CELL))
    # mirror semantic_dedup's dispatch: two-level Lloyd + assignment
    # past the hierarchy threshold (r13)
    hier = nlist >= ann.HIER_ASSIGN_MIN_NLIST
    cents = F.broadcast(
        ann.kmeans_centroids(
            vecs, nlist=nlist, iters=2, id_col="vec_id", hierarchical=hier
        )
    )
    assign = (
        (lambda *a, **k: ann.ivf_assign_hier(*a, n_cents=nlist, **k))
        if hier else ann.ivf_assign
    )
    occ = (
        assign(vecs, cents, nprobe=1, id_col="vec_id")
        .groupBy("__cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = occ.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        F.max("n").alias("max_cell"),
        F.count(F.lit(1)).alias("cells"),
    ).first()
    return {
        "n_vectors": n,
        "nlist_auto": nlist,
        "cells_nonempty": row["cells"],
        "max_cell": row["max_cell"],
        "cell_pairs": int(row["pairs"]),
    }


def _bm25_postings(spark, sf_dir: str) -> dict:
    """Posting volume surviving bm25_topk's pre-shuffle term filter, and
    the hottest term's df — the skew measure for the posting lists."""
    from pyspark.sql import functions as F

    from time_series_db_spark.catalog_pipeline import _BM25_TERMS, _docs
    from time_series_db_spark.pipeline import textprep

    toks = textprep.tokens(F.col("text"))
    hits = (
        _docs(spark, sf_dir)
        .select(F.col("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term").isin(list(_BM25_TERMS)))
    )
    row = hits.groupBy("term").agg(F.count(F.lit(1)).alias("c")).agg(
        F.sum("c").alias("postings"), F.max("c").alias("max_df")
    ).first()
    return {"postings": int(row["postings"] or 0), "max_df": int(row["max_df"] or 0)}


def _simhash_occupancy(spark, sf_dir: str) -> dict:
    """Band-bucket occupancy of the simhash fingerprints — Σ C(occ, 2)
    is the EXACT join work of the uncapped banded self-join, computed as
    an O(n) aggregate.  Materializing the uncapped pairs at 500k docs is
    not possible: the join key is a single (band, key) value, so one hot
    bucket's pair block lands in ONE task (observed: a 268 MB GCLocker
    straggler at 29/30 tasks — the cliff itself, caught by its own
    measurement)."""
    from pyspark.sql import functions as F

    from time_series_db_spark.catalog_pipeline import _docs
    from time_series_db_spark.pipeline import dedup

    fps = dedup.simhash(_docs(spark, sf_dir))
    band_w = dedup.SIMHASH_BITS // 3
    mask = (1 << band_w) - 1
    occ = (
        fps.select(
            F.posexplode(
                F.array(*[
                    F.shiftright(F.col("simhash"), i * band_w)
                    .bitwiseAND(F.lit(mask))
                    for i in range(3)
                ])
            ).alias("band", "key")
        )
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = occ.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        F.max("n").alias("max_bucket"),
    ).first()
    return {
        "uncapped_join_pairs": int(row["pairs"]),
        "max_bucket_occupancy": int(row["max_bucket"]),
    }


def counts(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from time_series_db_spark.catalog_pipeline import _docs, _embs
    from time_series_db_spark.pipeline import ann, dedup

    out: dict = {}
    docs = _docs(spark, sf_dir)
    out["simhash_capped"] = dedup.simhash_dedup_pairs(
        docs, max_hamming=3, max_bucket=SIMHASH_CAP, candidates_only=True
    ).count()
    out["simhash_occupancy"] = _simhash_occupancy(spark, sf_dir)
    out["simhash_verified"] = dedup.simhash_dedup_pairs(
        docs, max_hamming=3, max_bucket=SIMHASH_CAP
    ).count()
    out["semantic"] = _cell_stats(spark, sf_dir)
    embs = _embs(spark, sf_dir)
    anchors = embs.filter(F.col("vec_id") % 50 == 0)
    out["hn_ivf_fixed16"] = ann.hard_negatives_ivf(
        embs, anchors, k=5, nlist=16, nprobe=2, candidates_only=True
    ).count()
    out["hn_ivf_auto"] = ann.hard_negatives_ivf(
        embs, anchors, k=5, nlist="auto", nprobe=2, candidates_only=True
    ).count()
    out["bm25"] = _bm25_postings(spark, sf_dir)
    return out


def main() -> None:
    from time_series_db_spark.session import get_spark

    spark = get_spark("scale-r13-banded")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    def timed(fn) -> float:
        def once() -> float:
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        once()  # warm-up
        return round(statistics.median(once() for _ in range(RUNS)), 4)

    def _timing_fns(sf_dir: str) -> dict:
        from pyspark.sql import functions as F

        from time_series_db_spark.catalog_pipeline import (
            _BM25_K1, _BM25_B, _BM25_TERMS, _docs, _embs,
        )
        from time_series_db_spark.pipeline import ann, dedup, retrieval

        embs = _embs(spark, sf_dir)
        return {
            "dedup_simhash@capped": lambda: dedup.simhash_dedup_pairs(
                _docs(spark, sf_dir), max_hamming=3, max_bucket=SIMHASH_CAP
            ),
            "dedup_semantic@auto": lambda: dedup.semantic_dedup(
                embs, nlist="auto", train_iters=2, threshold=0.45
            ),
            "ann_hard_negatives_ivf@auto": lambda: ann.hard_negatives_ivf(
                embs, embs.filter(F.col("vec_id") % 50 == 0),
                k=5, nlist="auto", nprobe=2,
            ),
            "search_bm25": lambda: retrieval.bm25_topk(
                _docs(spark, sf_dir), " ".join(_BM25_TERMS),
                k=10, k1=_BM25_K1, b=_BM25_B,
            ),
        }

    out: dict = {}
    skip_timing = bool(os.environ.get("SPARK_GRAFT_R13_SKIP_TIMING"))
    if skip_timing and len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        with open(sys.argv[1]) as f:
            out = json.load(f).get("queries", {})
    if not skip_timing:
        f1, f100 = _timing_fns(BASE), _timing_fns(WORK)
        for name in f1:
            t1, t100 = timed(f1[name]), timed(f100[name])
            out[name] = {
                "t_1x": t1,
                "t_100x": t100,
                "ratio": round(t100 / t1, 2),
                "exponent": round(math.log(t100 / t1) / math.log(COPIES), 2),
            }
            print(name, out[name], flush=True)

    if os.environ.get("SPARK_GRAFT_R13_SKIP_COUNTS") and out:
        with open(sys.argv[1]) as f:
            prev = json.load(f)
        c1, c100 = prev["counts_1x"], prev["counts_100x"]
    else:
        c1, c100 = counts(spark, BASE), counts(spark, WORK)
    from time_series_db_spark.pipeline.ann import HN_IVF_TARGET_CELL
    from time_series_db_spark.pipeline.dedup import SEMANTIC_TARGET_CELL

    # Auto-knob budgets are CLOSED-FORM from the design target, not
    # extrapolated from the 1× baseline: at small corpora the auto
    # knobs sit on their nlist=16 FLOOR (cells ≪ target), so per-item
    # work legitimately grows floor→target across the first decades —
    # a 1×-linear extrapolation reads that transition as a breach.
    # Past the target the regime is linear, which is what these pin.
    n_anchors_100x = c100["semantic"]["n_vectors"] // 50
    budgets = {
        # true-pair-aware (the minhash discipline): the synthetic
        # corpus has ~COPIES-sized near-dup cliques by construction
        "simhash_capped": max(
            int(LINEAR_SLACK * COPIES * max(c1["simhash_capped"], 1)),
            4 * c100["simhash_verified"],
        ),
        "semantic_cell_pairs": int(
            LINEAR_SLACK
            * c100["semantic"]["n_vectors"] * SEMANTIC_TARGET_CELL / 2
        ),
        "hn_ivf_auto": int(
            LINEAR_SLACK * n_anchors_100x * 2 * HN_IVF_TARGET_CELL
        ),
        "bm25_postings": int(
            LINEAR_SLACK * COPIES * max(c1["bm25"]["postings"], 1)
        ),
    }
    got = {
        "simhash_capped": c100["simhash_capped"],
        "semantic_cell_pairs": c100["semantic"]["cell_pairs"],
        "hn_ivf_auto": c100["hn_ivf_auto"],
        "bm25_postings": c100["bm25"]["postings"],
    }
    breaches = {k: (got[k], budgets[k]) for k in got if got[k] > budgets[k]}

    line = json.dumps({
        "copies": COPIES,
        "queries": out,
        "counts_1x": c1,
        "counts_100x": c100,
        "budgets_100x": budgets,
    })
    print(line)
    if len(sys.argv) > 1:
        open(sys.argv[1], "w").write(line + "\n")
    if breaches:
        raise SystemExit(
            f"100x candidate budget breached (super-linear occupancy): {breaches}"
        )


if __name__ == "__main__":
    main()
