"""Pipeline-op semantics beyond the DuckDB parity harness.

The parity suite proves each registered catalog form matches its own
oracle; these tests pin the *relationships* between variants — e.g. that
the LSH-bucketed near-dup path is a sound subset of the exact all-pairs
result (approximation may lose pairs, never invent them).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_db_spark.pipeline import dedup


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_bucketed_neardup_subset_of_exact(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(
            embs, threshold=0.45, bucketed=False
        ).collect()
    }
    bucketed = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(
            embs, threshold=0.45, bucketed=True
        ).collect()
    }
    assert bucketed, "bucketed near-dup found no pairs at all"
    assert bucketed <= exact, "bucketed path invented pairs absent from exact"


def test_bucketed_neardup_plan_joins_on_bucket(spark, sf_dir):
    plan = dedup.embedding_neardup_pairs(
        _embs(spark, sf_dir), bucketed=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "band" in plan and "bucket" in plan, "band/bucket keys missing from plan"


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: diameter > 1 forces
    # multiple propagation rounds
    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r.id: r.comp for r in dedup.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_survivors_keeps_min_and_unpaired(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 5)], ["id_a", "id_b"])
    kept = sorted(
        r.doc_id for r in dedup.dedup_survivors(docs, pairs).collect()
    )
    assert kept == [1, 3, 4, 6]
