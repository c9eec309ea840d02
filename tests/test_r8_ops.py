"""Round-8 hardening tests.

Covers the round-7 verdict items: BPE merge-loop lineage bounding
(checkpoint every K rounds so a 32k-merge vocabulary stays analyzable)
and the hard-negative anchor guard.
"""

from __future__ import annotations

import random

import pytest

from tests.test_r7_ops import _bpe_replay


def _pair_rich_texts(n_words=300, word_len=10, n_docs=10):
    """Deterministic corpus with enough distinct symbol pairs to sustain
    hundreds of merge rounds (verified: 200 reachable)."""
    rng = random.Random(8)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(word_len))
        for _ in range(n_words)
    ]
    return [" ".join(words[i::n_docs]) for i in range(n_docs)]


def test_bpe_deep_merge_loop_bounded_plan_and_exact(spark):
    """A deep merge loop (n_merges ≫ _CHECKPOINT_EVERY) must (a) stay
    semantically identical to the exact Python replay — checkpointing
    is lineage plumbing, not an algorithm change — and (b) keep the
    word table's plan depth bounded: without truncation every merge
    stacks one F.replace and a 32k-vocab run would build a 32k-deep
    expression tree."""
    from time_series_db_spark.pipeline import bpe

    texts = _pair_rich_texts()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n = 48  # crosses 3 checkpoint boundaries; cheap enough for CI
    merges, wf = bpe.bpe_train(docs, n_merges=n)
    expect, eseqs = _bpe_replay(texts, n)
    assert merges == expect
    assert {r["__w"]: r["__seq"] for r in wf.collect()} == eseqs
    # plan depth: at most one checkpoint window of replaces survives
    analyzed = wf._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("replace(") <= bpe._CHECKPOINT_EVERY


def test_bpe_200_merges_completes(spark):
    """Smoke: 200 rounds run in bounded time with constant plan depth
    (the pre-checkpoint formulation died in the analyzer long before
    this). Early stop would silently weaken the test, so assert the
    full 200 merges happened."""
    from time_series_db_spark.pipeline import bpe

    texts = _pair_rich_texts()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, wf = bpe.bpe_train(docs, n_merges=200)
    assert len(merges) == 200
    analyzed = wf._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("replace(") <= bpe._CHECKPOINT_EVERY


def test_hard_negatives_anchor_guard(spark):
    """The flat miner broadcasts the full anchor set — above
    MAX_HN_ANCHORS it must refuse with a pointer at the celled path
    instead of silently shipping a multi-GB broadcast."""
    from time_series_db_spark.pipeline import ann

    rows = [(i, [float(i % 7), 1.0], i % 3) for i in range(30)]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    with pytest.raises(ValueError, match="hard_negatives_ivf"):
        ann.hard_negatives(embs, embs, k=2, max_queries=10)
    # explicit override still works
    out = ann.hard_negatives(embs, embs.limit(3), k=2, max_queries=None)
    assert out.count() > 0


def test_hard_negatives_ivf_labels_differ(spark):
    """Every mined negative must carry a label different from its
    anchor's, and ranks must be 1..k dense per anchor."""
    from time_series_db_spark.pipeline import ann

    rows = [(i, [float((i * 13) % 11), float((i * 7) % 5) + 1.0], i % 3)
            for i in range(120)]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    queries = embs.filter("vec_id % 10 = 0")
    out = ann.hard_negatives_ivf(
        embs, queries, k=3, nlist=8, nprobe=2
    ).collect()
    assert out
    for r in out:
        assert r["query_label"] != r["neighbor_label"]
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
