"""Round-12 regression tests: ADVICE.md fixes (grid-extent clip,
oracle scale parity, model-mode param guards, deterministic delta
survivors) plus the r12 throughput certifications."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _sf_nondivisible(spark):
    """step=3000 grid over [0, 10000) — (max_ts - min_ts) % step != 0,
    so the grid is [0, 3000, 6000] and a step-aligned sample at 9000
    lies inside [min_ts, max_ts) but OFF the grid."""
    from time_series_db_spark.model import SeriesFrame, series_key_expr

    rows = [(t, float(i + 1)) for i, t in enumerate([0, 3000, 9000])]
    df = (
        spark.createDataFrame(rows, "ts long, value double")
        .withColumn("labels", F.create_map(F.lit("name"), F.lit("m")))
        .withColumn("alias", F.lit(None).cast("string"))
        .withColumn("series_key", series_key_expr())
        .select("series_key", "labels", "alias", "ts", "value")
    )
    return SeriesFrame(df=df, step=3000, min_ts=0, max_ts=10_000)


def test_densify_clips_to_actual_grid_extent(spark):
    """ADVICE r11 (windows.py:46): with a non-step-divisible range, an
    aligned sample past the last grid point must NOT leak into the
    densified output — the dense grid never contained that row."""
    from time_series_db_spark.operators.windows import transform_null

    sf = _sf_nondivisible(spark)
    out = transform_null(sf, constant=0.0).df.orderBy("ts").collect()
    assert [r["ts"] for r in out] == [0, 3000, 6000]
    assert [r["value"] for r in out] == [1.0, 2.0, 0.0]


def test_is_non_null_clips_to_actual_grid_extent(spark):
    from time_series_db_spark.operators.windows import is_non_null

    sf = _sf_nondivisible(spark)
    out = is_non_null(sf).df.orderBy("ts").collect()
    assert [(r["ts"], r["value"]) for r in out] == [
        (0, 1.0), (3000, 1.0), (6000, 0.0)
    ]


def test_changed_clips_to_actual_grid_extent(spark):
    """`changed`'s sparse union must also honor the grid extent: the
    off-grid ts=9000 sample is not a grid point, so output rows are
    exactly the 3 grid points."""
    from time_series_db_spark.operators.windows import changed

    sf = _sf_nondivisible(spark)
    out = changed(sf).df.orderBy("ts").collect()
    assert [r["ts"] for r in out] == [0, 3000, 6000]


def test_embedding_cosine_oracle_parity_beyond_512_vectors(spark):
    """ADVICE r11 (catalog_pipeline.py:410): the Spark side auto-scales
    planes_per_band with the corpus while the old oracle was pinned to
    4 planes — they agreed only for n ≤ 512 vectors.  The r12 oracle
    computes the plane count in SQL; this pins the differential at
    sf0.1 (2000 vectors → 6 planes), the exact regime that used to
    silently diverge."""
    import duckdb

    from time_series_db_spark.catalog import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.1"
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = set(map(tuple, con.execute(
        ORACLES["dedup_embedding_cosine"]
    ).fetchall()))
    con.close()
    assert got == want
    assert len(got) > 0


def test_embedding_auto_planes_formula_matches_oracle_sql():
    """The Python auto formula and the SQL greatest/ceil/log2 rendering
    must agree at every corpus size (incl. the power-of-two boundaries
    where a 1-ulp log2 difference would flip the ceil)."""
    import math

    import duckdb

    con = duckdb.connect()
    for n in [2, 32, 64, 128, 500, 512, 513, 2000, 2048, 50_000, 1_048_576]:
        py = max(4, math.ceil(math.log2(max(n, 2) / 32)))
        sql = con.execute(
            "SELECT greatest(4, CAST(ceil(log2(? / 32.0)) AS BIGINT))", [n]
        ).fetchone()[0]
        assert py == sql, (n, py, sql)
    con.close()


def test_minhash_update_intra_delta_conflict_is_deterministic(spark):
    """ADVICE r11 (dedup.py:316): one delta carrying the same id with
    DIFFERENT payloads must store one deterministic signature — the
    lexicographically-greatest text — not an arbitrary
    partition-order-dependent pick."""
    from time_series_db_spark.pipeline import dedup

    base = spark.createDataFrame(
        [(1, "old content here")], "doc_id long, text string"
    )
    model = dedup.minhash_fit(base)
    delta = spark.createDataFrame(
        [(2, "zzz revised crawl of doc two"),
         (2, "aaa first crawl of doc two")],
        "doc_id long, text string",
    ).repartition(4)
    out = dedup.minhash_update(model, docs=delta)
    rows = out.filter(F.col("doc_id") == 2).collect()
    assert len(rows) == 1
    want = dedup.minhash_signatures(
        spark.createDataFrame(
            [(2, "zzz revised crawl of doc two")], "doc_id long, text string"
        )
    ).collect()[0]
    assert rows[0].asDict() == want.asDict()


def test_ivf_update_intra_delta_conflict_is_deterministic(spark):
    """Same contract for the IVF index: the survivor is the
    lexicographically-greatest vector."""
    from time_series_db_spark.pipeline import ann

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    model = ann.ivf_fit(corpus, nlist=2, train_iters=1)
    delta = spark.createDataFrame(
        [(100, [9.0, 9.0]), (100, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    out = ann.ivf_update(model, delta)
    rows = out["cells"].filter(F.col("vec_id") == 100).collect()
    assert len(rows) == 1
    assert rows[0]["vector"] == [9.0, 9.0]


def test_ivf_kmeans_model_mode_rejects_only_explicit_fit_knobs(spark):
    """ADVICE r11 (ann.py:439): the guard must not compare against
    hardcoded default literals — omitted knobs pass, ANY explicitly
    passed knob (even one matching the fit) is rejected."""
    from time_series_db_spark.pipeline import ann

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.limit(2)
    model = ann.ivf_fit(corpus, nlist=2, train_iters=1)
    # omitted -> fine
    assert ann.ivf_kmeans_topk(queries=queries, model=model, k=2).count() > 0
    # the OLD default literals are no longer a silent pass
    with pytest.raises(ValueError, match="nlist"):
        ann.ivf_kmeans_topk(queries=queries, model=model, nlist=16)
    with pytest.raises(ValueError, match="train_iters"):
        ann.ivf_kmeans_topk(queries=queries, model=model, train_iters=2)
    # inline-fit path: omitted knobs resolve to the documented defaults
    assert ann.ivf_kmeans_topk(corpus, queries, k=2).count() > 0


def test_sustain_clips_to_actual_grid_extent(spark):
    from time_series_db_spark.operators.windows import sustain

    sf = _sf_nondivisible(spark)
    out = sustain(sf, 3000).df.orderBy("ts").collect()
    assert all(r["ts"] in (0, 3000, 6000) for r in out)
