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
