"""Round-11 regression tests: the r10 advisory fixes.

1. streaming/docs.py `_model_nonempty` — missing model path is the ONLY
   silent False; a corrupt model read propagates (fail-loud, epoch
   replays instead of silently skipping cross-batch dedup).
2. streaming/docs.py in-batch survivors — connected-component min-id,
   identical to the batch `dedup_survivors` contract (the old greedy
   local-minima rule diverged on 1~3~2 chains).
3. minhash_update / ivf_update — duplicate ids inside one delta cannot
   seed duplicate model/index rows (replay / re-crawled batch guard).
4. ivf_kmeans_topk — missing queries= fails with a clear ValueError;
   fit-only knobs are rejected in model= mode instead of silently
   ignored.
5. textprep.rebalance_if_narrow — shuffles a 1-split corpus up to
   defaultParallelism, and is a no-op (same plan object) on an input
   that is already at least that wide.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


# ---------------------------------------------------------------------------
# 1. _model_nonempty fail-loud contract
# ---------------------------------------------------------------------------


def test_model_nonempty_missing_path_is_false(spark, tmp_path):
    from time_series_db_spark.streaming.docs import _model_nonempty

    assert _model_nonempty(spark, str(tmp_path / "never_written")) is False


def test_model_nonempty_corrupt_model_raises(spark, tmp_path):
    """A model directory that EXISTS but cannot be read as parquet must
    raise, not report 'no model yet' — silently skipping the model-side
    dedup would permanently append near-duplicates."""
    from time_series_db_spark.streaming.docs import _model_nonempty

    bad = tmp_path / "model"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception):
        _model_nonempty(spark, str(bad))


def test_model_nonempty_present_model_is_true(spark, tmp_path):
    from time_series_db_spark.streaming.docs import _model_nonempty

    p = str(tmp_path / "model")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(p)
    assert _model_nonempty(spark, p) is True


# ---------------------------------------------------------------------------
# 2. in-batch survivors are connected-component canonical
# ---------------------------------------------------------------------------


def test_doc_ingest_inbatch_survivors_are_component_min(spark, tmp_path):
    """Path graph 1~3~2 (doc 3 near-dups BOTH 1 and 2; 1 and 2 are not
    near-dups of each other): the old greedy drop-if-smaller-neighbor
    rule kept {1, 2} (local minima); the batch `dedup_survivors`
    contract keeps exactly the component minimum {1}.  The streaming
    gate must match the batch operator."""
    from time_series_db_spark.pipeline import dedup
    from time_series_db_spark.streaming.docs import (
        ingest_doc_batch,
        read_corpus,
    )

    # 22 distinct words -> 20 3-shingles.  Changing 2 words at one end
    # perturbs exactly 2 shingles: J(end-variant, base) = 18/22 ~ 0.818
    # >= 0.8, J(start-variant, end-variant) = 16/24 ~ 0.667 < 0.8.
    base = _words(22)
    start_var = "aa0 aa1 " + _words(20, "x")[8:]  # placeholder, built below
    toks = base.split()
    start_var = " ".join(["aa0", "aa1"] + toks[2:])
    end_var = " ".join(toks[:-2] + ["zz0", "zz1"])

    rows = [(1, start_var), (3, base), (2, end_var)]
    batch = spark.createDataFrame(
        [(i, t, "crawl") for i, t in rows],
        "doc_id long, text string, source string",
    )

    # sanity: the pair graph really is the path 1-3, 2-3
    sigs = dedup.minhash_signatures(
        batch.select("doc_id", "text")
    )
    pairs = dedup.jaccard_verify(
        dedup.lsh_candidate_pairs(sigs), sigs
    ).filter(F.col("jaccard") >= 0.8)
    edge_set = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert edge_set == {(1, 3), (2, 3)}

    store, model = str(tmp_path / "s"), str(tmp_path / "m")
    ingest_doc_batch(spark, batch, store, model)
    kept = {r["doc_id"] for r in read_corpus(spark, store).collect()}
    assert kept == {1}, "survivor must be the component min, not local minima"
    # the model holds exactly the survivors' signatures
    assert {r["doc_id"] for r in spark.read.parquet(model).collect()} == {1}

    # and it matches the batch operator on the same inputs
    batch_kept = {
        r["doc_id"]
        for r in dedup.dedup_survivors(batch, pairs).select("doc_id").collect()
    }
    assert batch_kept == kept


def test_doc_ingest_per_batch_cost_is_model_size_invariant(spark, tmp_path):
    """Throughput certification of the incremental-crawl claim
    ("per-batch cost ∝ batch, never the accumulated corpus"): the same
    batch ingested against a 10× larger accumulated model must not get
    materially slower.  Measured off-harness (BASELINE.md r11): 2k
    model rows 7.3 s vs 20k rows 6.1 s median — flat, because the
    batch-sized band table is the small side of the candidate join and
    the model is scanned, never shuffled.  The 2.5× bound leaves wide
    slack over timing noise while still failing on anything resembling
    O(model) join work per batch."""
    import shutil
    import statistics
    import time

    from pyspark.sql import functions as F

    from time_series_db_spark.cache import release_all
    from time_series_db_spark.pipeline import dedup
    from time_series_db_spark.streaming.docs import ingest_doc_batch

    def synth(n, start):
        return spark.range(start, start + n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"w{j}_"),
                        ((F.col("id") * F.lit(31 + j)) % F.lit(99991)).cast(
                            "string"
                        ),
                    )
                    for j in range(25)
                ],
            ).alias("text"),
            F.lit("crawl").alias("source"),
        )

    batch = synth(100, 0)

    def median_batch_time(model_rows, tag):
        model_path = str(tmp_path / f"model_{tag}")
        dedup.minhash_fit(synth(model_rows, 10_000_000)).write.parquet(
            model_path
        )
        times = []
        for i in range(3):
            mp = str(tmp_path / f"model_{tag}_run{i}")
            shutil.copytree(model_path, mp)
            t0 = time.time()
            ingest_doc_batch(
                spark, batch, str(tmp_path / f"store_{tag}_{i}"), mp
            )
            times.append(time.time() - t0)
            release_all()
        return statistics.median(times[1:])  # first run absorbs JIT

    t_small = median_batch_time(1000, "1x")
    t_big = median_batch_time(10000, "10x")
    assert t_big < t_small * 2.5, (
        f"per-batch ingest cost grew with the accumulated model: "
        f"{t_small:.2f}s @1k rows -> {t_big:.2f}s @10k rows"
    )


# ---------------------------------------------------------------------------
# 3. duplicate ids inside one delta
# ---------------------------------------------------------------------------


def test_minhash_update_dedups_delta_ids(spark):
    from time_series_db_spark.pipeline import dedup

    old = spark.createDataFrame(
        [(1, _words(22)), (2, _words(22, "q"))], "doc_id long, text string"
    )
    model = dedup.minhash_fit(old)
    delta = spark.createDataFrame(
        [(3, _words(22, "r")), (3, _words(22, "r")), (1, _words(22, "s"))],
        "doc_id long, text string",
    )
    out = dedup.minhash_update(model, docs=delta)
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 1, 2: 1, 3: 1}, "replayed delta ids must not duplicate"


def test_ivf_update_dedups_delta_ids(spark):
    from time_series_db_spark.pipeline import ann

    corpus = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    model = ann.ivf_fit(corpus, nlist=2, train_iters=1)
    delta = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0]), (100, [1.0, 2.0, 3.0]), (5, [9.0, 9.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    out = ann.ivf_update(model, delta)
    counts = {
        r["vec_id"]: r["n"]
        for r in out["cells"]
        .groupBy("vec_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts[100] == 1 and counts[5] == 1
    assert len(counts) == 13  # 12 original + 1 new, id 5 replaced in place


# ---------------------------------------------------------------------------
# 4. ivf_kmeans_topk argument validation
# ---------------------------------------------------------------------------


def test_ivf_kmeans_topk_requires_queries(spark):
    from time_series_db_spark.pipeline import ann

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="queries"):
        ann.ivf_kmeans_topk(corpus)
    model = ann.ivf_fit(corpus, nlist=2, train_iters=1)
    with pytest.raises(ValueError, match="queries"):
        ann.ivf_kmeans_topk(model=model)


def test_ivf_kmeans_topk_rejects_fit_knobs_in_model_mode(spark):
    from time_series_db_spark.pipeline import ann

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.limit(2)
    model = ann.ivf_fit(corpus, nlist=2, train_iters=1)
    with pytest.raises(ValueError, match="nlist"):
        ann.ivf_kmeans_topk(queries=queries, model=model, nlist=32)
    with pytest.raises(ValueError, match="train_iters"):
        ann.ivf_kmeans_topk(queries=queries, model=model, train_iters=9)


# ---------------------------------------------------------------------------
# 5. rebalance_if_narrow
# ---------------------------------------------------------------------------


def test_classifier_entries_share_one_fit(spark, sf_dir, monkeypatch):
    """Both classifier catalog entries train the IDENTICAL deterministic
    model; the per-corpus-dir memo must make the second entry reuse it
    instead of re-paying the 10 distributed GD rounds (the r10
    verdict's slowest-bench finding)."""
    import time_series_db_spark.catalog_pipeline as cp
    from time_series_db_spark.catalog import QUERIES
    from time_series_db_spark.pipeline import classifier

    monkeypatch.setattr(cp, "_CLS_MODEL_ROWS", {})
    calls = []
    real = classifier.classifier_fit

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(classifier, "classifier_fit", counting)
    a = QUERIES["text_quality_classifier"](spark, sf_dir).collect()
    b = QUERIES["text_classifier_calibration"](spark, sf_dir).collect()
    assert a and b
    assert len(calls) == 1, "second entry must reuse the memoized model"


def test_rebalance_if_narrow_widens_narrow_input(spark):
    from time_series_db_spark.pipeline.textprep import rebalance_if_narrow

    par = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame(
        [(i, "t") for i in range(10)], "id long, text string"
    ).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    out = rebalance_if_narrow(narrow)
    assert out.rdd.getNumPartitions() == par


def test_rebalance_if_narrow_is_noop_on_wide_input(spark):
    from time_series_db_spark.pipeline.textprep import rebalance_if_narrow

    par = spark.sparkContext.defaultParallelism
    wide = spark.createDataFrame(
        [(i, "t") for i in range(100)], "id long, text string"
    ).repartition(par)
    out = rebalance_if_narrow(wide)
    assert out is wide, "already-wide input must skip the shuffle entirely"
