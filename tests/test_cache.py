"""Query-scoped cache registry: release-on-boundary without losing
same-query warm reuse (round-4 leak fix + round-5 scoping)."""

from __future__ import annotations

import pytest

from time_series_db_spark import cache


@pytest.fixture(autouse=True)
def _clean_registry(spark):
    """These tests count tracked frames exactly — a persist left behind
    by a previously-run test FILE (e.g. plan_quality's last gate, which
    releases before each of ITS tests but not after its last) would
    inflate the counts. Order-independence is the point of the sweep."""
    cache.release_all()
    yield
    cache.release_all()


def _is_cached(df) -> bool:
    return df.storageLevel.useMemory or df.storageLevel.useDisk


def test_release_others_keeps_current_scope(spark):
    cache.set_scope("qA")
    a = cache.persist_tracked(spark.range(10).selectExpr("id", "id * 2 AS v"))
    a.count()
    assert _is_cached(a)

    cache.set_scope("qB")
    b = cache.persist_tracked(spark.range(5))
    b.count()

    released = cache.release_others()
    assert released == 1  # qA's frame dropped ...
    assert not _is_cached(a)
    assert _is_cached(b)  # ... qB's stays warm

    # re-entering qB releases nothing — repeated runs rehydrate from cache
    cache.set_scope("qB")
    assert cache.release_others() == 0
    assert _is_cached(b)

    assert cache.release_all() >= 1
    assert not _is_cached(b)


def test_same_plan_dedupes_within_scope(spark):
    cache.set_scope("qC")
    df1 = cache.persist_tracked(spark.range(7).selectExpr("id + 1 AS x"))
    df2 = cache.persist_tracked(spark.range(7).selectExpr("id + 1 AS x"))
    df1.count()
    assert _is_cached(df1) and _is_cached(df2)
    # identical analyzed plans share one registry slot and one cache entry
    cache.set_scope("other")
    assert cache.release_others() == 1
    assert not _is_cached(df1) and not _is_cached(df2)
    cache.release_all()


def test_catalog_entry_scopes_by_query_name(spark, sf_dir):
    from time_series_db_spark.catalog import QUERIES

    cache.set_scope("")
    QUERIES["m3_divide"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    assert cache.current_scope() == "m3_divide"
    # the binary matching chain tracked its right-side persist under the
    # query's own scope, so a re-run would keep it warm
    assert "m3_divide" in cache._TRACKED and cache._TRACKED["m3_divide"]
    cache.release_all()


def test_probe_memo_scoped_and_released(spark):
    """probe_memo: one compute per (plan, kind) within a scope; a
    different scope's release drops the memo with its frames; an
    unhashable input falls through to compute."""
    from time_series_db_spark import cache

    df = spark.range(5)
    calls = []

    def compute():
        calls.append(1)
        return df.count()

    cache.set_scope("q1")
    assert cache.probe_memo(df, "n", compute) == 5
    assert cache.probe_memo(df, "n", compute) == 5
    assert len(calls) == 1                      # memo hit
    assert cache.probe_memo(df, "other", compute) == 5
    assert len(calls) == 2                      # distinct kind recomputes

    # same plan, new DataFrame object → still a hit (semantic hash)
    assert cache.probe_memo(spark.range(5), "n", compute) == 5
    assert len(calls) == 2

    # another scope releasing others drops q1's memo
    cache.set_scope("q2")
    cache.release_others()
    cache.set_scope("q1")
    assert cache.probe_memo(df, "n", compute) == 5
    assert len(calls) == 3
    cache.release_all()
