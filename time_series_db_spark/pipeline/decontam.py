"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set on long word n-grams.

The standard pretraining hygiene step (the GPT-3 appendix C / PaLM
"contamination" methodology): a training document is contaminated when it
shares at least ``min_hits`` distinct word n-grams with any benchmark
document.  Collisions are computed on 60-bit n-gram hashes, so the eval
side reduces to a small set of longs.

100 TB shape: the benchmark set is tiny relative to the corpus (eval
suites are thousands of documents, the corpus is billions), so its
distinct n-gram hashes BROADCAST; the corpus side explodes its n-grams
map-side and the broadcast hash join filters them to the (rare) hits
before any shuffle — the only shuffled rows are actual collisions, and
the per-doc hit count is a partial aggregate on top.  Nothing quadratic,
nothing driver-side.  The hash is the portable md5-based
:func:`~time_series_db_spark.pipeline.textprep.hash64` so the DuckDB
differential is exact; swap ``fn="xxhash64"`` in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from time_series_db_spark.pipeline import textprep


def ngram_hash_set(text_col: Column, n: int, hash_fn: str = "md5") -> Column:
    """Distinct hashed word n-grams of a text column (whole document as
    one gram when shorter than n tokens — same convention as the MinHash
    shingle set)."""
    grams = textprep.word_shingles(textprep.tokens(text_col), n)
    return F.transform(
        grams, lambda g: textprep.hash64(g, "decontam", fn=hash_fn)
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-corpus-document contamination report against ``eval_set``.

    Returns ``(id_col, n_collisions, contaminated)`` — one row per corpus
    document; ``n_collisions`` counts DISTINCT overlapping n-gram hashes,
    ``contaminated`` is ``n_collisions >= min_hits``.  Filter on
    ``~contaminated`` for the cleaned corpus.
    """
    if n <= 0:
        raise ValueError("n-gram length must be positive")
    if min_hits <= 0:
        raise ValueError("min_hits must be positive")
    eval_h = (
        eval_set.select(
            F.explode(ngram_hash_set(F.col(text_col), n, hash_fn)).alias("__gh")
        )
        .distinct()
    )
    hits = (
        corpus.select(
            F.col(id_col),
            F.explode(ngram_hash_set(F.col(text_col), n, hash_fn)).alias("__gh"),
        )
        .join(F.broadcast(eval_h), on="__gh", how="inner")
        .groupBy(id_col)
        .agg(F.count_distinct("__gh").alias("n_collisions"))
    )
    return (
        corpus.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_collisions"), F.lit(0)).alias("n_collisions"),
            (F.coalesce(F.col("n_collisions"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )
