"""Round-13 regression tests: r12 ADVICE fixes (wide-hash word-count
validation, wire-barrier column carry-through) plus the r13
certifications (real-PNG wide-hash corpus, streaming state-scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ahash_wide_hash_width_mismatch_fails_loudly(spark):
    """ADVICE r12 (multimodal.py): passing a 64-bit image_ahash output
    (1 word) with bits=256 (4 words) must RAISE, not silently emit
    NULL band keys that never join (recall loss that voids the
    pigeonhole-exactness guarantee)."""
    from py4j.protocol import Py4JJavaError

    from time_series_db_spark.pipeline import multimodal

    df = spark.createDataFrame(
        [(0, [7]), (1, [7])], "media_id long, ahash_words array<long>"
    )
    pairs = multimodal.ahash_neardup_pairs_wide(
        df, max_hamming=15, num_bands=16, bits=256
    )
    with pytest.raises(Exception, match="bits/64|USER_RAISED") as ei:
        pairs.collect()
    assert "ahash_neardup_pairs_wide" in str(ei.value)


def test_ahash_wide_valid_width_still_joins(spark):
    """The width guard must not perturb the valid path: identical
    4-word hashes pair at hamming 0."""
    from time_series_db_spark.pipeline import multimodal

    df = spark.createDataFrame(
        [(0, [7, -3, 11, 2]), (1, [7, -3, 11, 2])],
        "media_id long, ahash_words array<long>",
    )
    got = multimodal.ahash_neardup_pairs_wide(
        df, max_hamming=15, num_bands=16, bits=256
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(0, 1, 0)]


def test_isolate_input_carries_metadata_columns(spark):
    """ADVICE r12 (wire.py): the Generate barrier must carry every
    non-line column through (file name, ingest ts metadata), not
    silently project them away."""
    from time_series_db_spark.sources.wire import isolate_input

    df = spark.createDataFrame(
        [("cpu 1 2", "f1.txt", 99), ("mem 3 4", "f2.txt", 100)],
        "line string, src string, ingest_ts long",
    )
    out = isolate_input(df, "line")
    assert out.columns == ["line", "src", "ingest_ts"]
    rows = sorted((r["line"], r["src"], r["ingest_ts"]) for r in out.collect())
    assert rows == [("cpu 1 2", "f1.txt", 99), ("mem 3 4", "f2.txt", 100)]


def test_isolate_input_single_column_unchanged(spark):
    from time_series_db_spark.sources.wire import isolate_input

    df = spark.createDataFrame([("a",), ("b",)], "line string")
    out = isolate_input(df, "line")
    assert out.columns == ["line"]
    assert sorted(r["line"] for r in out.collect()) == ["a", "b"]
