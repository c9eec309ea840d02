"""Round-5 operator semantics: the last known-but-unimplemented
Constants.java names with defensible public semantics — timestamp,
histogramCDF, toHistogram (explicit bounds), aliasByBucket /
aliasByHistogramBucket / aliasByDistinctTags, multiBurnRate / asBurnRate /
asMultiBurnRate, _summarizeBy, showAnomalyThresholds.

The catalog entries carry the DuckDB differentials; these tests pin the
edge semantics the differentials can't reach (clamping, fallbacks, plan
validation errors) on tiny mockFetch frames.
"""

from __future__ import annotations

import math

import pytest

from time_series_db_spark.sources import DEFAULT_STEP_MS, EVENTS_MIN_TS

H = DEFAULT_STEP_MS
T0 = EVENTS_MIN_TS


def _run(spark, q, steps=4):
    from time_series_db_spark.lang.m3.builder import execute
    from time_series_db_spark.sources.m3source import EventsSource

    src = EventsSource(spark, "/root/testdata/sf0.001")
    return execute(q, src, T0, T0 + steps * H, H)


def test_timestamp_value_is_epoch_seconds(spark):
    sf = _run(spark, "mockFetch 5,6 name:a | timestamp", steps=2)
    rows = {r.ts: r.value for r in sf.df.collect()}
    assert rows == {T0: T0 / 1000.0, T0 + H: (T0 + H) / 1000.0}


def test_histogram_cdf_edges(spark):
    # values 10,60,110,160 → linear buckets [0,50) [50,100) [100,150) [150,200)
    sf = _run(
        spark,
        "mockFetch 10 name:a | mockFetch 60 name:b | mockFetch 110 name:c"
        " | mockFetch 160 name:d | toHistogramLinearBuckets 0 50 4"
        " | histogramCDF bucketid bucket 0 100 9999",
        steps=1,
    )
    got = {r.labels["histogramCDF"]: r.value for r in sf.df.collect()}
    # no bucket upper ≤ 0 → 0.0; uppers 50,100 ≤ 100 → 2/4; all ≤ 9999 → 1.0
    assert got == {"le_0": 0.0, "le_100": 0.5, "le_9999": 1.0}


def test_to_histogram_explicit_bounds_clamp(spark):
    # bounds 0,10,100: two buckets [0,10) and [10,100); -5 clamps into the
    # first, 500 clamps into the last
    sf = _run(
        spark,
        "mockFetch -5 name:a | mockFetch 5 name:b | mockFetch 500 name:c"
        " | toHistogram 0 10 100",
        steps=1,
    )
    got = {r.labels["bucket"]: r.value for r in sf.df.collect()}
    assert got == {"0-10": 2.0, "10-100": 1.0}


def test_to_histogram_rejects_unsorted_bounds(spark):
    from time_series_db_spark.lang.m3.plan import M3PlanError

    with pytest.raises(M3PlanError, match="strictly increasing"):
        _run(spark, "mockFetch 1 name:a | toHistogram 0 100 50")


def test_alias_by_bucket_variants(spark):
    sf = _run(
        spark,
        "mockFetch 10 name:a | toHistogram 0 50 100 | aliasByBucket bucket",
        steps=1,
    )
    assert [r.alias for r in sf.df.collect()] == ["0-50"]
    sf = _run(
        spark,
        "mockFetch 10 name:a | toHistogram 0 50 100"
        " | aliasByHistogramBucket bucket",
        steps=1,
    )
    assert [r.alias for r in sf.df.collect()] == ["le 50"]
    # series without the bucket tag keep their alias untouched
    sf = _run(spark, "mockFetch 10 name:a | alias keep | aliasByBucket bucket",
              steps=1)
    assert [r.alias for r in sf.df.collect()] == ["keep"]


def test_alias_by_distinct_tags_single_series_falls_back_to_name(spark):
    sf = _run(spark, "mockFetch 1,2 name:solo | aliasByDistinctTags", steps=2)
    assert {r.alias for r in sf.df.collect()} == {"solo"}


def test_alias_by_distinct_tags_varying_tag_only(spark):
    # name varies, host is constant → alias = name value alone
    sf = _run(
        spark,
        "mockFetch 1 name:a host:h | mockFetch 2 name:b host:h"
        " | aliasByDistinctTags",
        steps=1,
    )
    assert {r.alias for r in sf.df.collect()} == {"a", "b"}


def test_as_burn_rate_scales_by_budget(spark):
    # ratio 0.01 against a 0.99 SLO = exactly 1× budget burn
    sf = _run(
        spark,
        "mockFetch 0.01,0.02 name:r | asBurnRate 0.99",
        steps=2,
    )
    vals = sorted(round(r.value, 9) for r in sf.df.collect())
    assert vals == [1.0, 2.0]


def test_as_burn_rate_rejects_bad_slo(spark):
    from time_series_db_spark.lang.m3.plan import M3PlanError

    with pytest.raises(M3PlanError, match="slo must be in"):
        _run(spark, "mockFetch 1 name:r | asBurnRate 1.5")


def test_multi_burn_rate_windows_tagged_and_truncated(spark):
    sf = _run(
        spark,
        "mockFetch 1,2,3,4 name:e"
        " | multiBurnRate 0.9 1h 2h (mockFetch 10,20,30,40 name:e)",
        steps=4,
    )
    rows = sf.df.collect()
    assert {r.labels["window"] for r in rows} == {"1h", "2h"}
    # counter deltas are equal on both sides → ratio 0.1, scaled ×10 → 1.0
    for r in rows:
        assert math.isclose(r.value, 1.0, rel_tol=1e-9)
    # truncation applies (scan-widening stage): no rows past the range
    assert all(T0 <= r.ts < T0 + 4 * H for r in rows)


def test_summarize_by_count_sums_in_time(spark):
    # 2 series over 4 steps, interval 2h: per-step series count = 2,
    # COUNT summarizes with SUM in time → 4 samples per bucket
    sf = _run(
        spark,
        "mockFetch 1,1,1,1 name:a | mockFetch 2,2,2,2 name:b"
        " | _summarizeBy 2h count",
        steps=4,
    )
    got = sorted((r.ts, r.value) for r in sf.df.collect())
    assert got == [(T0, 4.0), (T0 + 2 * H, 4.0)]


def test_show_anomaly_thresholds_bands(spark):
    sf = _run(
        spark, "mockFetch 1,2,3 name:a | showAnomalyThresholds 2", steps=3
    )
    rows = sf.df.collect()
    assert len(rows) == 6  # 3 ts × {upper, lower}
    mu = 2.0
    sd = math.sqrt(2.0 / 3.0)
    for r in rows:
        want = mu + 2 * sd if r.labels["anomalyThreshold"] == "upper" else mu - 2 * sd
        assert math.isclose(r.value, want, rel_tol=1e-9)


def test_show_anomaly_thresholds_zero_variance(spark):
    sf = _run(
        spark, "mockFetch 5,5 name:a | showAnomalyThresholds 3", steps=2
    )
    assert {r.value for r in sf.df.collect()} == {5.0}


def test_new_nodes_explain(spark):
    """Plan explains render for every new node (drift guard for the
    explain surface; golden formats are ours, not the reference's)."""
    from time_series_db_spark.lang.m3.parser import parse
    from time_series_db_spark.lang.m3.plan import build_plan

    def explain_of(q):
        return build_plan(parse(q)).explain()

    assert explain_of("mockFetch 1 name:a | timestamp") == "TIMESTAMP()"
    assert "HISTOGRAM_CDF" in explain_of(
        "mockFetch 1 name:a | histogramCDF bucketid bucket 50"
    )
    assert "TO_HISTOGRAM" in explain_of("mockFetch 1 name:a | toHistogram 0 1")
    assert "ALIAS_BY_HISTOGRAM_BUCKET" in explain_of(
        "mockFetch 1 name:a | aliasByHistogramBucket bucket"
    )
    assert "ALIAS_BY_DISTINCT_TAGS" in explain_of(
        "mockFetch 1 name:a | aliasByDistinctTags"
    )
    assert "SHOW_ANOMALY_THRESHOLDS" in explain_of(
        "mockFetch 1 name:a | showAnomalyThresholds 2"
    )
    assert "SUMMARIZE_BY" in explain_of(
        "mockFetch 1 name:a | _summarizeBy 2h max region"
    )
    assert "MULTI_BURN_RATE" in explain_of(
        "mockFetch 1 name:a | multiBurnRate 0.99 1h (mockFetch 1 name:a)"
    )
    assert "AS_MULTI_BURN_RATE" in explain_of(
        "mockFetch 1 name:a | asMultiBurnRate 0.99 1h"
    )


def test_pack_sequences_offsets_and_blocks(spark):
    from time_series_db_spark.pipeline.pack import pack_sequences

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h i"), (3, "j k")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.shard, r.pack_id, r.start_offset, r.n_tokens)
        for r in pack_sequences(df, budget=5, n_shards=1).collect()
    }
    # single shard → order by doc_id: tokens 4,5,2 → starts 0,4,9 →
    # blocks 0,0,1 (a doc belongs to the block holding its FIRST token)
    assert out == {1: (0, 0, 0, 4), 2: (0, 0, 4, 5), 3: (0, 1, 9, 2)}


def test_pack_sequences_sharding_is_deterministic_and_partitioned(spark):
    from time_series_db_spark.pipeline.pack import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(50)], ["doc_id", "text"]
    )
    a = {r.doc_id: tuple(r) for r in pack_sequences(df, 16, 8).collect()}
    b = {r.doc_id: tuple(r) for r in pack_sequences(df, 16, 8).collect()}
    assert a == b and len(a) == 50
    # offsets restart per shard: every shard stream starts at 0
    starts = {}
    for doc, (_, shard, _, start, _) in a.items():
        starts.setdefault(shard, []).append(start)
    assert all(min(v) == 0 for v in starts.values())


def test_sample_stratified_exact_and_stable(spark):
    from time_series_db_spark.pipeline.pack import sample_stratified

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(60)], ["doc_id", "lang"]
    )
    out = sample_stratified(df, "lang", n_per_stratum=5).collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append((r.sample_rank, r.doc_id))
    assert {k: len(v) for k, v in by.items()} == {"en": 5, "de": 5}
    assert sorted(r for r, _ in by["en"]) == [1, 2, 3, 4, 5]
    # small stratum: fewer members than n → all of them, ranked
    tiny = spark.createDataFrame([(1, "fr"), (2, "fr")], ["doc_id", "lang"])
    assert len(sample_stratified(tiny, "lang", 5).collect()) == 2


# ---------------------------------------------------------------------------
# PromQL subqueries (expr[range:step])
# ---------------------------------------------------------------------------

def _prom(spark, q, steps=24):
    from time_series_db_spark.lang.prom.builder import execute
    from time_series_db_spark.sources.m3source import EventsSource

    src = EventsSource(spark, "/root/testdata/sf0.001")
    return execute(q, src, T0, T0 + steps * H, H)


def test_subquery_parses_to_node_shapes():
    from time_series_db_spark.lang.prom import ast as A
    from time_series_db_spark.lang.prom.parser import parse

    root = parse("max_over_time(rate(error[2h])[6h:1h])")
    fn = root.children[0]
    assert isinstance(fn, A.FunctionCallNode) and fn.name == "max_over_time"
    sub = fn.children[0]
    assert isinstance(sub, A.SubqueryNode)
    assert (sub.range_ms, sub.step_ms) == (6 * H, H)
    inner = sub.children[0]
    assert isinstance(inner, A.FunctionCallNode) and inner.name == "rate"

    # default step ([3h:]) and offset modifier
    sub = parse("error[3h:] offset 2h").children[0]
    assert (sub.range_ms, sub.step_ms, sub.offset_ms) == (3 * H, 0, 2 * H)

    # recording-rule-style metric names keep their colon
    sel = parse('foo:rate5m{region="r0"}').children[0]
    assert sel.metric == "foo:rate5m"


def test_subquery_same_step_equals_plain_range(spark):
    """[6h:1h] with inner step == query step must be pointwise identical
    to the plain range vector — the re-grid is then the identity."""
    a = _prom(spark, "avg_over_time(view[6h:1h])")
    b = _prom(spark, "avg_over_time(view[6h])")
    ra = {(r.series_key, r.ts): r.value for r in a.df.collect()}
    rb = {(r.series_key, r.ts): r.value for r in b.df.collect()}
    assert ra == rb and ra


def test_subquery_finer_step_emits_outer_grid_only(spark):
    sf = _prom(spark, "avg_over_time(view[6h:30m])")
    assert sf.step == H
    assert all(r.ts % H == 0 for r in sf.df.collect())


def test_subquery_non_dividing_step_raises(spark):
    from time_series_db_spark.lang.prom.builder import PromUnsupportedError

    with pytest.raises(PromUnsupportedError, match="must divide"):
        _prom(spark, "avg_over_time(view[6h:25m])")


# ---------------------------------------------------------------------------
# PromQL @ modifier
# ---------------------------------------------------------------------------

def test_at_modifier_parses():
    from time_series_db_spark.lang.prom import ast as A
    from time_series_db_spark.lang.prom.parser import parse

    sel = parse("error @ 1704067200").children[0]
    assert sel.at == 1_704_067_200_000
    sel = parse("error @ start()").children[0]
    assert sel.at == "start"
    # both modifiers, either order
    sel = parse("error offset 1h @ end()").children[0]
    assert sel.at == "end" and sel.offset_ms == H
    rng = parse("rate(error[3h] @ end())").children[0].children[0]
    assert isinstance(rng, A.RangeVectorSelectorNode) and rng.at == "end"


def test_at_modifier_constant_line(spark):
    """An aggregated @-pinned selector emits one constant value at EVERY
    grid step (@ start() with no earlier data pins nothing — lookback
    only sees history at or before the instant)."""
    sf = _prom(spark, "sum by (region) (view @ end())", steps=24)
    rows = sf.df.collect()
    per_series = {}
    for r in rows:
        per_series.setdefault(r.series_key, []).append((r.ts, r.value))
    assert per_series
    for pts in per_series.values():
        assert len(pts) == 24                     # every grid step
        assert len({v for _, v in pts}) == 1      # one constant value
    # and @ start() with sparse history yields a (valid) empty result
    assert _prom(spark, "view @ start()", steps=6).df.count() == 0


def test_at_end_equals_last_grid_instant_value(spark):
    """view @ end() pins each series to its most recent sample at or
    before the last grid instant — cross-checked against the raw frame."""
    sf = _prom(spark, "view @ end()", steps=24)
    raw = _prom(spark, "view", steps=24)
    te = T0 + 23 * H
    last = {}
    for r in raw.df.collect():
        if r.ts <= te and (r.series_key not in last or r.ts > last[r.series_key][0]):
            last[r.series_key] = (r.ts, r.value)
    got = {r.series_key: r.value for r in sf.df.collect()}
    assert got == {k: v for k, (_, v) in last.items()}


def test_divide_when_pass_through_and_guard(spark):
    """divideWhen ge 20: steps where the denominator ≥ 20 divide; others
    pass the numerator through unchanged; a zero denominator passing the
    guard (ge 0) yields NaN like the divide family."""
    sf = _run(
        spark,
        "mockFetch 10,30 name:n | divideWhen ge 20 (mockFetch 5,30 name:n)",
        steps=2,
    )
    got = {r.ts: r.value for r in sf.df.collect()}
    assert got == {T0: 10.0, T0 + H: 1.0}   # 5<20 → pass-through; 30/30
    assert all(
        r.labels.get("type") == "ratios" for r in sf.df.collect()
    )

    sf = _run(
        spark,
        "mockFetch 7 name:n | divideWhen ge 0 (mockFetch 0 name:n)",
        steps=1,
    )
    [r] = sf.df.collect()
    assert math.isnan(r.value)

    # missing denominator timestamps pass through (left join)
    sf = _run(
        spark,
        "mockFetch 4,8 name:n | divideWhen ge 1 (mockFetch 2 name:n)",
        steps=2,
    )
    got = {r.ts: r.value for r in sf.df.collect()}
    assert got == {T0: 2.0, T0 + H: 8.0}


def test_divide_when_rejects_bad_op(spark):
    from time_series_db_spark.lang.m3.plan import M3PlanError

    with pytest.raises(M3PlanError, match="invalid divideWhen operator"):
        _run(spark, "mockFetch 1 name:n | divideWhen foo 1 (mockFetch 1 name:n)")


def test_count_values_parses_both_formats_and_counts(spark):
    from time_series_db_spark.lang.prom.parser import parse

    for q in ['count_values by (region) ("val", error)',
              'count_values("val", error) by (region)']:
        n = parse(q).children[0]
        assert (n.agg_type, n.str_param, n.labels) == (
            "count_values", "val", ["region"]
        )

    sf = _prom(spark, 'count_values("v", view @ end())', steps=24)
    rows = sf.df.collect()
    assert rows
    # every output label set is exactly {v: <formatted value>} and the
    # counts sum to the pinned series count
    assert all(set(r.labels) == {"v"} for r in rows)
    n_series = _prom(spark, "view @ end()", steps=24).df.select(
        "series_key").distinct().count()
    one_ts = [r for r in rows if r.ts == rows[0].ts]
    assert sum(int(r.value) for r in one_ts) == n_series


def test_subquery_offset_shifts_and_validates(spark):
    from time_series_db_spark.lang.prom.builder import PromUnsupportedError

    # step-multiple offset: [2h:1h] offset 2h equals the plain series two
    # hours back, shifted forward onto the query grid
    sf = _prom(spark, "view[2h:1h] offset 2h", steps=24)
    raw = _prom(spark, "view", steps=24)
    shifted = {(r.series_key, r.ts + 2 * H): r.value for r in raw.df.collect()}
    got = {(r.series_key, r.ts): r.value for r in sf.df.collect()}
    assert got
    for k, v in got.items():
        assert shifted.get(k) == v

    with pytest.raises(PromUnsupportedError, match="multiple of"):
        _prom(spark, "avg_over_time(view[6h:30m] offset 45m)")


# ---------------------------------------------------------------------------
# Front-end rejection behavior: malformed queries must fail with clear
# parse/plan errors, never build a wrong frame silently.
# ---------------------------------------------------------------------------

def test_m3ql_malformed_queries_rejected(spark):
    from time_series_db_spark.lang.m3.parser import M3ParseError
    from time_series_db_spark.lang.m3.plan import M3PlanError

    bad = [
        "fetch name:error | moving",            # missing window + agg
        "fetch name:error | moving 3h bogus",   # unknown moving agg
        "fetch name:error | summarize 1d nope", # unknown summarize fn
        "fetch name:error | sort sideways",     # unknown sort key
        "fetch name:error | where eq name",     # where needs 3 args
        "fetch name:error | tagCompare lt",     # tagCompare needs 2 args
        "fetch name:error | histogramCDF bucketid",   # needs thresholds
        "fetch name:error | unknownFn 1",       # unknown function
        "fetch name:error | burnRate 3h (fetch name:a)",  # missing slo
        "fetch name:error | multiBurnRate 0.99 (fetch name:a)",  # no window
        "fetch name:error | _summarizeBy 6h multiply region",  # invalid fn
    ]
    for q in bad:
        with pytest.raises((M3ParseError, M3PlanError)):
            _run(spark, q)


def test_promql_malformed_queries_rejected(spark):
    from time_series_db_spark.lang.prom.ast import PromParseError

    bad = [
        "rate(error)",                 # range fn without range vector
        "error[5x]",                   # bad duration unit
        "sum by region (error)",       # by-list needs parens
        'count_values(error)',         # missing dst string
        "quantile(error)",             # missing φ scalar
        "error{region=}",              # empty matcher value
        "error @ later()",             # bad @ argument
        "error[1h",                    # unbalanced bracket
    ]
    for q in bad:
        with pytest.raises((PromParseError, ValueError)):
            _prom(spark, q)


def test_pipeline_apis_reject_nonpositive_params(spark):
    from time_series_db_spark.pipeline.pack import pack_sequences, sample_stratified
    from time_series_db_spark.streaming.sessions import sessionize, streaming_sessionize

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    ev = spark.createDataFrame([(1, T0)], "user_id long, ts long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, budget=8, n_shards=0)
    with pytest.raises(ValueError, match="n_per_stratum"):
        sample_stratified(df.withColumnRenamed("text", "lang"), n_per_stratum=0)
    with pytest.raises(ValueError, match="gap"):
        sessionize(ev, gap_ms=0)
    with pytest.raises(ValueError, match="gap"):
        streaming_sessionize(ev, gap_ms=-5)


def test_limit_ratio_partitions_exactly(spark):
    """limit_ratio(0.4, v) and limit_ratio(-0.6, v) split the series set
    into disjoint halves whose union is the full set."""
    full = {r.series_key for r in _prom(spark, "view", steps=24).df.collect()}
    a = {r.series_key
         for r in _prom(spark, "limit_ratio(0.4, view)", steps=24).df.collect()}
    b = {r.series_key
         for r in _prom(spark, "limit_ratio(-0.6, view)", steps=24).df.collect()}
    assert a | b == full and not (a & b)


def test_limitk_k_per_group_and_validation(spark):
    sf = _prom(spark, "limitk by (region) (1, view)", steps=24)
    per_region = {}
    for r in sf.df.collect():
        per_region.setdefault(r.labels["region"], set()).add(r.series_key)
    assert per_region and all(len(s) == 1 for s in per_region.values())
    # repeated runs pick the same series (deterministic)
    again = {r.series_key
             for r in _prom(spark, "limitk by (region) (1, view)", steps=24).df.collect()}
    assert again == {s for v in per_region.values() for s in v}

    with pytest.raises(ValueError, match="positive"):
        _prom(spark, "limitk(0, view)")
    with pytest.raises(ValueError, match="limit_ratio"):
        _prom(spark, "limit_ratio(2, view)")


def test_lm_perplexity_orders_repetition_below_soup(spark):
    """A repetitive doc must score lower perplexity than token soup
    under the corpus-trained bigram LM, and every perplexity is >= 1
    (probabilities never exceed 1)."""
    from time_series_db_spark.pipeline.text import lm_perplexity

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat " * 8),
            (2, "quark zephyr oboe lattice nimbus grotto pylon ember "
                "waltz igloo cairn dune fjord kelp onyx plume"),
            (3, "the cat sat on the mat " * 8),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in lm_perplexity(docs, vocab_size=10, lam=0.9).collect()
    }
    assert 4 not in rows  # empty doc: no tokens, absent row
    assert rows[1]["n_tokens"] == 48
    assert all(r["perplexity"] >= 1.0 for r in rows.values())
    # identical docs score identically; repetition beats token soup
    assert rows[1]["perplexity"] == rows[3]["perplexity"]
    assert rows[1]["perplexity"] < rows[2]["perplexity"]


def test_ppl_buckets_tertiles_per_language(spark):
    """Tertile buckets: each language's docs split head/middle/tail by
    perplexity thresholds, head = lowest-perplexity third."""
    from time_series_db_spark.pipeline.text import ppl_buckets

    # 6 English docs with graded repetitiveness (more repetition of the
    # corpus-dominant bigram -> lower perplexity)
    docs = spark.createDataFrame(
        [(i, "the cat " * (12 - i) + " ".join(f"tok{i}x{j}" for j in range(i * 3)))
         for i in range(1, 7)],
        ["doc_id", "text"],
    )
    rows = ppl_buckets(docs, vocab_size=10, lam=0.9).collect()
    assert len(rows) == 6
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["perplexity"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert len(by_bucket["head"]) == 2
    assert len(by_bucket["middle"]) == 2
    assert len(by_bucket["tail"]) == 2
    # ordering: every head ppl <= every middle ppl <= every tail ppl
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
