"""Round-9 operator tests: BPE fit/apply split, MMR shortlist guard,
overlap-score broadcast gate, correlation matrix, auto-season."""

from __future__ import annotations

import pytest

from tests.test_r7_ops import _bpe_replay


# ---------------------------------------------------------------------------
# BPE fit/apply split (pipeline/bpe.py: bpe_apply / model= parameter)
# ---------------------------------------------------------------------------

def _replay_apply(word: str, merges) -> list[str]:
    """Python replay of bpe_apply's OOV path: initial spaced sequence,
    then every merge's literal replace in rank order."""
    seq = " " + " ".join(word) + " "
    for _rank, left, right, _freq in merges:
        seq = seq.replace(f" {left} {right} ", f" {left}{right} ")
    return seq.strip().split(" ")


def test_bpe_apply_seen_words_match_trained_table(spark):
    from time_series_db_spark.pipeline import bpe

    texts = [
        "low low low low lower lower newest newest newest",
        "widest widest new new lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = bpe.bpe_train(docs, n_merges=6)
    applied = {
        r["__w"]: r["__seq"] for r in bpe.bpe_apply(model, docs).collect()
    }
    trained = {r["__w"]: r["__seq"] for r in model[1].collect()}
    assert applied == trained


def test_bpe_apply_oov_words_replay_merge_list(spark):
    from time_series_db_spark.pipeline import bpe

    train_texts = ["low low low lower lower newest newest", "new new west"]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)],
        "doc_id long, text string",
    )
    model = bpe.bpe_train(train, n_merges=6)
    merges, _ = model
    # 'lowest' and 'newer' never occur in training — pure OOV replay;
    # 'low' is seen — trained-table path.
    apply_docs = spark.createDataFrame(
        [(0, "lowest newer low")], "doc_id long, text string"
    )
    applied = {
        r["__w"]: r["__seq"].strip().split(" ")
        for r in bpe.bpe_apply(model, apply_docs).collect()
    }
    assert set(applied) == {"lowest", "newer", "low"}
    for w in ("lowest", "newer", "low"):
        assert applied[w] == _replay_apply(w, merges), w
    # reassembly invariant: segmentation concatenates back to the word
    for w, syms in applied.items():
        assert "".join(syms) == w


def test_bpe_encode_with_model_never_retrains(spark, monkeypatch):
    from time_series_db_spark.pipeline import bpe

    train = spark.createDataFrame(
        [(0, "aa aa ab ab b"), (1, "aa b ab")], "doc_id long, text string"
    )
    model = bpe.bpe_train(train, n_merges=3)
    apply_docs = spark.createDataFrame(
        [(7, "ab aa ba")], "doc_id long, text string"
    )

    calls = {"n": 0}
    real = bpe.bpe_train

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(bpe, "bpe_train", counting)
    enc = bpe.bpe_encode(apply_docs, model=model).collect()
    cnt = bpe.bpe_token_counts(apply_docs, model=model).collect()
    assert calls["n"] == 0, "model= path must not retrain"
    assert len(enc) > 0 and len(cnt) == 1

    # positions are a contiguous 0..n-1 stream per document
    positions = sorted(r["pos"] for r in enc)
    assert positions == list(range(len(enc)))
    assert cnt[0]["n_tokens"] == len(enc)


def test_bpe_encode_model_matches_self_trained_on_same_corpus(spark):
    """On the SAME corpus, encode(model=train(corpus)) must equal the
    legacy self-trained encode — the split changes the API, not the
    tokens."""
    from time_series_db_spark.pipeline import bpe

    texts = ["low low lower newest", "new lowest west newest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    legacy = sorted(
        tuple(r) for r in bpe.bpe_encode(docs, n_merges=5).collect()
    )
    model = bpe.bpe_train(docs, n_merges=5)
    split = sorted(
        tuple(r) for r in bpe.bpe_encode(docs, model=model).collect()
    )
    assert legacy == split


def test_bpe_fertility_with_model(spark):
    from time_series_db_spark.pipeline import bpe

    train = spark.createDataFrame(
        [(0, "aa aa aa ab ab")], "doc_id long, text string"
    )
    model = bpe.bpe_train(train, n_merges=1)  # merges 'a a' -> 'aa'
    apply_docs = spark.createDataFrame(
        [(1, "aa ab ba", "xx")], "doc_id long, text string, lang string"
    )
    rows = bpe.bpe_fertility(apply_docs, model=model).collect()
    assert len(rows) == 1
    r = rows[0]
    # aa -> [aa] (1), ab -> [aa? no: a b -> after merge 'a a'->'aa': ab
    # stays 'a b' (2)], ba -> 'b a' (2) => 5 subwords / 3 words
    assert (r["n_words"], r["n_subwords"]) == (3, 5)
    assert r["fertility"] == pytest.approx(5 / 3)


# ---------------------------------------------------------------------------
# MMR shortlist guard (pipeline/retrieval.py: MAX_MMR_SHORTLIST)
# ---------------------------------------------------------------------------

def _mmr_fixture(spark):
    short = spark.createDataFrame(
        [(i, 1.0 - 0.1 * i) for i in range(6)], "doc_id long, rel double"
    )
    embs = spark.createDataFrame(
        [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    return short, embs


def test_mmr_rerank_refuses_oversized_shortlist(spark):
    """The n² sims self-join needs a metadata-sized shortlist; past
    MAX_MMR_SHORTLIST it must refuse with a pointer at the top-n cut
    (same contract as ann.hard_negatives / MAX_HN_ANCHORS)."""
    from time_series_db_spark.pipeline import retrieval

    short, embs = _mmr_fixture(spark)
    with pytest.raises(ValueError, match="max_shortlist"):
        retrieval.mmr_rerank(short, embs, k=2, max_shortlist=3)
    # explicit opt-out still works
    out = retrieval.mmr_rerank(short, embs, k=2, max_shortlist=None)
    assert len(out.collect()) == 2


def test_mmr_rerank_string_ids_and_rel_col_name(spark):
    """Output schema derives the id type from the shortlist (string doc
    ids must work) and keeps the caller's rel_col name."""
    from time_series_db_spark.pipeline import retrieval

    short = spark.createDataFrame(
        [("a", 1.0), ("b", 0.9), ("c", 0.8)],
        "doc_id string, relevance double",
    )
    embs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.01]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    out = retrieval.mmr_rerank(short, embs, k=2, rel_col="relevance")
    assert out.columns == ["doc_id", "relevance", "mmr_score", "rank"]
    rows = {r["rank"]: r["doc_id"] for r in out.collect()}
    # rank 1: best rel ('a'); rank 2: 'c' (diversified away from near-dup 'b')
    assert rows == {1: "a", 2: "c"}


# ---------------------------------------------------------------------------
# overlap_score eval-broadcast probe gate (pipeline/decontam.py)
# ---------------------------------------------------------------------------

def test_overlap_score_guards_eval_broadcast(spark, monkeypatch):
    """The eval gram set is data-dependent (a mega-benchmark union is
    not metadata-sized): the broadcast hint must come from the bounded
    probe, falling back unhinted above MAX_BROADCAST_TOKEN_ROWS."""
    from tests.test_plan_quality import _analyzed_hints
    from time_series_db_spark.pipeline import decontam, text

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 4) for i in range(4)],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(0, "alpha beta gamma delta alpha beta gamma delta")],
        "doc_id long, text string",
    )
    default = _analyzed_hints(decontam.overlap_score(corpus, eval_set, n=4))
    monkeypatch.setattr(text, "MAX_BROADCAST_TOKEN_ROWS", 0)
    guarded = _analyzed_hints(decontam.overlap_score(corpus, eval_set, n=4))
    assert guarded == default - 1
