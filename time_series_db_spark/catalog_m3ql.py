"""End-to-end M3QL language catalog: text query → parse → plan → Spark.

Where catalog.py exercises operators through the Python API, these
entries run complete M3QL *query strings* through the full front-end
(parser → AST transforms → logical plan → DataFrame builder) against
the events table, differentially tested like everything else. This is
the layer that proves a reference user could paste their M3QL queries
at our endpoint unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from time_series_db_spark.catalog import (
    DENSE_CTES,
    LABEL_KEYS,
    PRELUDE,
    SQL_LBLS,
    SQL_SERIES_KEY,
    quant,
    register,
    sql_quant,
)
from time_series_db_spark.lang.m3.builder import execute
from time_series_db_spark.model import SeriesFrame
from time_series_db_spark.sources import (
    DEFAULT_STEP_MS,
    EVENTS_MAX_TS,
    EVENTS_MIN_TS,
)
from time_series_db_spark.sources.m3source import EventsSource


def run_m3ql(spark, sf_dir: str, query: str) -> SeriesFrame:
    return execute(
        query,
        EventsSource(spark, sf_dir),
        EVENTS_MIN_TS,
        EVENTS_MAX_TS,
        DEFAULT_STEP_MS,
    )


def _flat(sf: SeriesFrame, keys: list[str]) -> DataFrame:
    return sf.df.select(
        *[F.col("labels")[k].alias(k) for k in keys],
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_fetch_wildcard",
    f"""{PRELUDE} SELECT {SQL_LBLS}, ts, {sql_quant('value')} AS value
    FROM samples
    WHERE (regexp_full_match(name, 'err.*') OR name = 'click')
      AND NOT regexp_full_match("user", '1.')""",
)
def m3ql_fetch_wildcard(spark, sf_dir):
    """fetch with wildcard, brace alternation and negated tag filter —
    the Lucene term/wildcard query path as parquet-pushed predicates."""
    sf = run_m3ql(spark, sf_dir, "fetch name:{err*,click} user:!1?")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_mapper_chain",
    f"""{PRELUDE} SELECT {SQL_LBLS}, ts,
    {sql_quant('sqrt(abs(value - 100.0) * 2.0)')} AS value
    FROM samples WHERE name = 'error'""",
)
def m3ql_mapper_chain(spark, sf_dir):
    """Chained mapper stages through the language front-end."""
    sf = run_m3ql(
        spark, sf_dir, "fetch name:error | offset -100 | abs | scale 2 | sqrt"
    )
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_union_sum",
    f"""{PRELUDE} SELECT region, ts, {sql_quant('sum(value)')} AS value
    FROM samples WHERE name IN ('error', 'click') GROUP BY 1, 2""",
)
def m3ql_union_sum(spark, sf_dir):
    """Mid-pipeline fetch = union semantics (plan/7 golden), then sum."""
    sf = run_m3ql(spark, sf_dir, "fetch name:error | fetch name:click | sum region")
    return _flat(sf, ["region"])


@register(
    "m3ql_filter_topk",
    f"""{PRELUDE},
    filtered AS (
      SELECT {SQL_LBLS}, ts, value FROM samples WHERE value >= 100.0
    ),
    stats AS (
      SELECT {SQL_LBLS},
             CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(value) AS stat,
             {SQL_SERIES_KEY} AS skey
      FROM filtered GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY stat DESC, skey) AS rnk FROM stats
    )
    SELECT f.name, f."user", f.region, f.shard, f.ts, {sql_quant('f.value')} AS value
    FROM filtered f JOIN ranked r
      ON f.name=r.name AND f."user"=r."user" AND f.region=r.region AND f.shard=r.shard
    WHERE r.rnk <= 3""",
)
def m3ql_filter_topk(spark, sf_dir):
    """Value filter (operator-name function ``>=``) then pushdown topK."""
    sf = run_m3ql(spark, sf_dir, "fetch | >= 100 | topK 3 avg desc")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_divide_by_group_total",
    f"""{PRELUDE},
    totals AS (
      SELECT region, ts, CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS tv
      FROM samples WHERE name = 'error' GROUP BY 1, 2
    )
    SELECT s.name, s."user", s.region, s.shard, s.ts,
           {sql_quant("CASE WHEN t.tv = 0 THEN 'NaN'::DOUBLE ELSE s.value / t.tv END")} AS value
    FROM samples s JOIN totals t ON s.region = t.region AND s.ts = t.ts
    WHERE s.name = 'error'""",
)
def m3ql_divide_by_group_total(spark, sf_dir):
    """Binary divide with explicit match keys through the front-end —
    the CSE cache reuses the shared fetch subtree (one scan)."""
    sf = run_m3ql(
        spark,
        sf_dir,
        "fetch name:error | divide(fetch name:error | sum region) region",
    )
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_keep_last_summarize",
    f"""{PRELUDE}{DENSE_CTES},
    err AS (SELECT * FROM dense WHERE name = 'error'),
    filled AS (
      SELECT {SQL_LBLS}, ts,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY {SQL_LBLS} ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill,
             last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER (
               PARTITION BY {SQL_LBLS} ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_ts
      FROM err)
    SELECT {SQL_LBLS}, ts - (ts % 86400000) AS ts, {sql_quant('max(fill)')} AS value
    FROM filled WHERE fill IS NOT NULL AND ts - fill_ts <= 7200000
    GROUP BY 1, 2, 3, 4, 5""",
)
def m3ql_keep_last_summarize(spark, sf_dir):
    """Densify → bounded forward-fill → daily summarize, as one query."""
    sf = run_m3ql(
        spark, sf_dir, "fetch name:error | keepLastValue 2h | summarize 1d max"
    )
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_histogram_percentile",
    f"""{PRELUDE},
    b AS (
      SELECT name, region, shard, ts, CAST("user" AS DOUBLE) AS upper, value
      FROM samples WHERE name = 'error'
    ),
    tot AS (
      SELECT name, region, shard, ts, sum(value) AS total FROM b GROUP BY 1, 2, 3, 4
    ),
    cum AS (
      SELECT b.*, sum(value) OVER (
        PARTITION BY name, region, shard, ts ORDER BY upper) AS cumc, t.total
      FROM b JOIN tot t USING (name, region, shard, ts)
    )
    SELECT name, region, shard, 'p95' AS "histogramPercentile", ts,
           {sql_quant('min(upper)')} AS value
    FROM cum WHERE total > 0 AND cumc >= 0.95 * total
    GROUP BY 1, 2, 3, 4, 5""",
)
def m3ql_histogram_percentile(spark, sf_dir):
    """histogramPercentile over bucketed series: the user id doubles as
    the bucket upper bound via a tagSub-synthesized '<id>-+Inf' range
    (infinity bucket ⇒ upper == lower) — HistogramPercentileStage
    cumulative-count semantics, no intra-bucket interpolation."""
    sf = run_m3ql(
        spark,
        sf_dir,
        'fetch name:error | tagSub user "^(\\d+)$" "$1-+Inf" '
        "| histogramPercentile user user 95",
    )
    return _flat(sf, ["name", "region", "shard", "histogramPercentile"])


@register(
    "m3ql_mock_fetch",
    f"""SELECT * FROM (VALUES
      ('a', {EVENTS_MIN_TS}, 20.0::DOUBLE),
      ('a', {EVENTS_MIN_TS + DEFAULT_STEP_MS}, 40.0::DOUBLE)
    ) AS t(name, ts, value)""",
)
def m3ql_mock_fetch(spark, sf_dir):
    """mockFetch synthesis; NaN values are skipped at synthesis
    (MockFetchStage.java:94 — NaN means missing at the storage
    boundary), so the nan slot yields no row."""
    sf = run_m3ql(spark, sf_dir, "mockFetch 10,20,nan name:a | scale 2")
    return _flat(sf, ["name"])


@register(
    "m3ql_alias_sort_head",
    f"""{PRELUDE},
    stats AS (
      SELECT {SQL_LBLS}, {SQL_SERIES_KEY} AS skey,
             CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(value) AS stat
      FROM samples WHERE name = 'error' GROUP BY 1, 2, 3, 4
    ),
    ranked AS (SELECT *, row_number() OVER (ORDER BY stat DESC, skey) AS rnk FROM stats)
    SELECT s.name, s."user", s.region, s.shard,
           s.name || '-' || s.region AS alias, s.ts, {sql_quant('s.value')} AS value
    FROM samples s JOIN ranked r
      ON s.name=r.name AND s."user"=r."user" AND s.region=r.region AND s.shard=r.shard
    WHERE s.name = 'error' AND r.rnk <= 2""",
)
def m3ql_alias_sort_head(spark, sf_dir):
    """alias templating ({{.tag}} interpolation in LITERAL_MODE) + sorted
    head slice (list-order semantics via the explicit rank column)."""
    sf = run_m3ql(
        spark,
        sf_dir,
        "fetch name:error | alias {{.name}}-{{.region}} | sort avg | head 2",
    )
    return sf.df.select(
        *[F.col("labels")[k].alias(k) for k in LABEL_KEYS],
        F.col("alias"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_macros_binary",
    f"""{PRELUDE},
    e AS (SELECT region, ts, CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS v
          FROM samples WHERE name = 'error' GROUP BY 1, 2),
    c AS (SELECT region, ts, CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS v
          FROM samples WHERE name = 'click' GROUP BY 1, 2)
    SELECT e.region, e.ts,
           {sql_quant("CASE WHEN c.v = 0 THEN 'NaN'::DOUBLE ELSE 100.0 * e.v / c.v END")} AS value
    FROM e JOIN c ON e.region = c.region AND e.ts = c.ts""",
)
def m3ql_macros_binary(spark, sf_dir):
    """Macro definitions (named sub-pipelines, ``name = pipeline;``) feeding
    a binary stage — the reference's coordinator macro evaluation
    (TimeSeriesCoordinatorAggregator.java:55 javadoc; parser golden 20
    shape). Each macro body is built once and reused by reference — the
    Python-object CSE that replaces cacheableUnfoldReferences + CopyStage
    (SourceBuilderVisitor.java:372-395).
    """
    sf = run_m3ql(
        spark, sf_dir,
        "e = fetch name:error | sumSeries region;"
        "c = fetch name:click | sumSeries region;"
        "e | asPercent(c) region",
    )
    return _flat(sf, ["region"])


# ---------------------------------------------------------------------------
# Beyond the reference: functions in its known-but-unimplemented list
# (common/Constants.java:39-76 — the parser accepts them, the planner
# throws). This engine implements the tractable ones with their Graphite
# semantics.
# ---------------------------------------------------------------------------


@register(
    "m3ql_stdev_by",
    f"""{PRELUDE}
    SELECT region, ts,
           {sql_quant('coalesce(stddev_pop(value), 0.0)')} AS value
    FROM samples WHERE name = 'view' GROUP BY region, ts""",
)
def m3ql_stdev_by(spark, sf_dir):
    """stdev (grouping population stddev) — Constants.java:69."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | stdev region")
    return _flat(sf, ["region"])


@register(
    "m3ql_set_diff",
    f"""{PRELUDE}
    SELECT {SQL_LBLS}, ts, {sql_quant('value')} AS value
    FROM samples
    WHERE region = 'r1'
      AND name NOT IN (SELECT DISTINCT name FROM samples WHERE name = 'error')""",
)
def m3ql_set_diff(spark, sf_dir):
    """setDiff (label anti-join, the complement of intersect) —
    Constants.java:67."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch region:r1 | setDiff(fetch name:error) name",
    )
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_non_negative_derivative",
    f"""{PRELUDE},
    lagged AS (
      SELECT {SQL_LBLS}, ts, value,
             lag(value) OVER (PARTITION BY {SQL_LBLS} ORDER BY ts) AS pv,
             lag(ts) OVER (PARTITION BY {SQL_LBLS} ORDER BY ts) AS pts
      FROM samples WHERE name = 'view')
    SELECT {SQL_LBLS}, ts, {sql_quant('value - pv')} AS value
    FROM lagged
    WHERE pts IS NOT NULL AND ts - pts = {DEFAULT_STEP_MS}
      AND value - pv >= 0""",
)
def m3ql_non_negative_derivative(spark, sf_dir):
    """nonNegativeDerivative (derivative, counter wraps dropped) —
    Constants.java:62."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | nonNegativeDerivative")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_remove_above_percentile",
    f"""{PRELUDE},
    thr AS (
      SELECT {SQL_LBLS}, quantile_cont(value, 0.9) AS t
      FROM samples WHERE name = 'view' GROUP BY 1, 2, 3, 4)
    SELECT s.name, s."user", s.region, s.shard, s.ts, {sql_quant('s.value')} AS value
    FROM samples s
    JOIN thr USING (name, "user", region, shard)
    WHERE s.name = 'view' AND s.value <= thr.t""",
)
def m3ql_remove_above_percentile(spark, sf_dir):
    """removeAbovePercentile 90 (per-series threshold) —
    Constants.java:65."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | removeAbovePercentile 90")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_alias_sub",
    f"""{PRELUDE}
    SELECT {SQL_LBLS}, regexp_replace(name, '^err(.*)$', 'E\\1') AS alias,
           ts, {sql_quant('value')} AS value
    FROM samples WHERE name = 'error'""",
)
def m3ql_alias_sub(spark, sf_dir):
    """aliasSub (regex + backrefs on the display alias) —
    Constants.java:45."""
    sf = run_m3ql(spark, sf_dir, 'fetch name:error | aliasSub "^err(.*)$" "E$1"')
    return sf.df.select(
        *[F.col("labels")[k].alias(k) for k in LABEL_KEYS],
        F.col("alias"), F.col("ts"), quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_sustained_above",
    f"""{PRELUDE},
    grid AS (
      SELECT gs AS ts FROM generate_series({EVENTS_MIN_TS},
        {EVENTS_MAX_TS - DEFAULT_STEP_MS}, {DEFAULT_STEP_MS}) t(gs)),
    sids AS (SELECT DISTINCT {SQL_LBLS} FROM samples),
    dense AS (
      SELECT s.name, s."user", s.region, s.shard, g.ts,
             CASE WHEN v.value > 5.0 THEN v.value END AS value
      FROM sids s CROSS JOIN grid g
      LEFT JOIN samples v
        ON v.name = s.name AND v."user" = s."user" AND v.region = s.region
       AND v.shard = s.shard AND v.ts = g.ts),
    runs AS (
      SELECT {SQL_LBLS}, ts, value,
             COALESCE(last_value(CASE WHEN value IS NULL THEN ts END IGNORE NULLS)
               OVER (PARTITION BY {SQL_LBLS} ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + {DEFAULT_STEP_MS},
               {EVENTS_MIN_TS}) AS run_start
      FROM dense)
    SELECT {SQL_LBLS}, ts, {sql_quant('value')} AS value
    FROM runs WHERE value IS NOT NULL
      AND ts - run_start + {DEFAULT_STEP_MS} >= 10800000""",
)
def m3ql_sustained_above(spark, sf_dir):
    """sustainedAbove 5 3h — value "above threshold continuously for the
    duration" (Constants.java:70; composition of value_filter + sustain,
    the pairing SustainStage's own javadoc prescribes)."""
    sf = run_m3ql(spark, sf_dir, "fetch | sustainedAbove 5 3h")
    return _flat(sf, LABEL_KEYS)


_POS_INTERP = """
CASE WHEN r <= 1 THEN l[1]
     ELSE l[greatest(1, r - 1)]
          + (fr - (ceil(fr) - 1)) * (l[r] - l[greatest(1, r - 1)])
END"""


@register(
    "m3ql_percentile_interpolate",
    f"""{PRELUDE},
    lsts AS (SELECT name, ts, list(value ORDER BY value) AS l
             FROM samples WHERE name = 'view' GROUP BY 1, 2),
    c AS (SELECT name, ts, l, 0.8 * len(l) AS fr,
                 greatest(1, CAST(ceil(0.8 * len(l)) AS INT)) AS r
          FROM lsts)
    SELECT name, '80' AS __percentile, ts,
           {sql_quant(_POS_INTERP)} AS value
    FROM c""",
)
def m3ql_percentile_interpolate(spark, sf_dir):
    """percentileOfSeries 80 true — the interpolating variant
    (PercentileUtils.calculatePercentile interpolate=true: linear blend
    between the two ranks by the fractional rank part)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | percentileOfSeries 80 true name")
    return sf.df.select(
        F.col("labels")["name"].alias("name"),
        F.col("labels")["__percentile"].alias("__percentile"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


# ---------------------------------------------------------------------------
# Constants.java KNOWN_UNIMPLEMENTED functions the reference never built —
# implemented here with documented semantics (all beyond-reference)
# ---------------------------------------------------------------------------

_W_SERIES = f"PARTITION BY {SQL_LBLS} ORDER BY ts"


@register(
    "m3ql_n_percentile",
    f"""{PRELUDE}
    SELECT {SQL_LBLS}, ts,
           {sql_quant(f'quantile_cont(value, 0.9) OVER (PARTITION BY {SQL_LBLS})')} AS value
    FROM samples WHERE name = 'view'""",
)
def m3ql_n_percentile(spark, sf_dir):
    """nPercentile 90 — flat line per series at its own 90th percentile
    (Constants.java:63; Graphite semantics, exact interpolation)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | nPercentile 90")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_constant_line",
    f"""SELECT 'constantLine' AS name, gs AS ts, 42.5::DOUBLE AS value
    FROM generate_series({EVENTS_MIN_TS}, {EVENTS_MAX_TS - DEFAULT_STEP_MS},
                         {DEFAULT_STEP_MS}) t(gs)""",
)
def m3ql_constant_line(spark, sf_dir):
    """constantLine 42.5 — synthetic constant series over the query grid
    (Constants.java:55; generator leaf, mockFetch machinery)."""
    sf = run_m3ql(spark, sf_dir, "constantLine 42.5")
    return _flat(sf, ["name"])


@register(
    "m3ql_top_k_per_timestamp",
    f"""{PRELUDE},
    ranked AS (
      SELECT {SQL_LBLS}, ts, value,
             row_number() OVER (
               PARTITION BY ts ORDER BY value DESC, {SQL_SERIES_KEY}
             ) AS r
      FROM samples WHERE name = 'error')
    SELECT {SQL_LBLS}, ts, {sql_quant('value')} AS value
    FROM ranked WHERE r <= 3""",
)
def m3ql_top_k_per_timestamp(spark, sf_dir):
    """_topKPerTimestamp 3 — k largest values at each timestamp across
    series (Constants.java:44)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:error | _topKPerTimestamp 3")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_tag_add",
    f"""{PRELUDE}
    SELECT 'prod' AS env, ts,
           {sql_quant('CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)')} AS value
    FROM samples WHERE name = 'error' GROUP BY 2""",
)
def m3ql_tag_add(spark, sf_dir):
    """_tagAdd env prod | sum env — tag injection recomputes series
    identity, so the downstream aggregation groups on the new tag
    (Constants.java:42)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:error | _tagAdd env prod | sum env")
    return _flat(sf, ["env"])


@register(
    "m3ql_to_histogram",
    f"""{PRELUDE},
    b AS (
      SELECT least(7, greatest(0, CAST(floor(value / 50) AS INT))) AS idx, ts
      FROM samples WHERE name = 'view' AND NOT isnan(value))
    SELECT lpad(CAST(idx AS VARCHAR), 3, '0') AS bucketid,
           CAST(idx * 50 AS BIGINT)::VARCHAR || '-' ||
           CAST((idx + 1) * 50 AS BIGINT)::VARCHAR AS bucket,
           'histogram' AS name, ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM b GROUP BY 1, 2, 3, 4""",
)
def m3ql_to_histogram(spark, sf_dir):
    """toHistogramLinearBuckets 0 50 8 — per-timestamp linear bucket
    counts in the histogramPercentile bucket-series format
    (Constants.java:76)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | toHistogramLinearBuckets 0 50 8")
    return _flat(sf, ["bucketid", "bucket", "name"])


@register(
    "m3ql_to_histogram_percentile",
    f"""{PRELUDE},
    b AS (
      SELECT least(7, greatest(0, CAST(floor(value / 50) AS INT))) AS idx, ts
      FROM samples WHERE name = 'view' AND NOT isnan(value)),
    counts AS (
      SELECT idx, ts, CAST(count(*) AS DOUBLE) AS cnt,
             CAST((idx + 1) * 50 AS DOUBLE) AS upper
      FROM b GROUP BY 1, 2),
    cum AS (
      SELECT ts, upper, cnt,
             sum(cnt) OVER (PARTITION BY ts ORDER BY upper) AS c,
             sum(cnt) OVER (PARTITION BY ts) AS total
      FROM counts)
    SELECT 'histogram' AS name, 'p50' AS pct, ts,
           {sql_quant('min(CASE WHEN c >= 0.5 * total THEN upper END)')} AS value
    FROM cum GROUP BY 1, 2, 3""",
)
def m3ql_to_histogram_percentile(spark, sf_dir):
    """toHistogramLinearBuckets … | histogramPercentile bucketid bucket
    50 — the two bucket stages compose: the generated bucket tags are
    exactly the format HistogramPercentileStage.java:52 consumes."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:view | toHistogramLinearBuckets 0 50 8"
        " | histogramPercentile bucketid bucket 50",
    )
    return sf.df.select(
        F.col("labels")["name"].alias("name"),
        F.col("labels")["histogramPercentile"].alias("pct"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_anomalies",
    f"""{PRELUDE},
    stats AS (
      SELECT {SQL_LBLS}, ts, value,
             avg(value) OVER (PARTITION BY {SQL_LBLS}) AS mu,
             stddev_pop(value) OVER (PARTITION BY {SQL_LBLS}) AS sd
      FROM samples WHERE name = 'view')
    SELECT {SQL_LBLS}, ts,
           CASE WHEN sd > 0 AND abs(value - mu) > 2 * sd
                THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS value
    FROM stats""",
)
def m3ql_anomalies(spark, sf_dir):
    """anomalies 2 — z-score outlier flag vs the series' own window
    distribution (Constants.java:48; documented chosen semantics)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | anomalies 2")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_seasonal_adjust",
    f"""{PRELUDE},
    sphase AS (
      SELECT {SQL_LBLS}, ts, value,
             CAST(sum(CAST(value AS DECIMAL(27,6))) OVER ph AS DOUBLE)
               / count(value) OVER ph AS sm
      FROM samples
      WHERE name = 'view'
      WINDOW ph AS (PARTITION BY {SQL_LBLS},
                    (ts % 86400000) - (ts % 3600000)))
    SELECT {SQL_LBLS}, ts, {sql_quant('value - sm')} AS value
    FROM sphase""",
)
def m3ql_seasonal_adjust(spark, sf_dir):
    """seasonalAdjust 1d 1h through the full language path (parser →
    plan → builder → operators/windows.py:seasonal_adjust): the
    diurnal-profile residual, exact-decimal profile means."""
    sf = run_m3ql(
        spark, sf_dir, "fetch name:view | seasonalAdjust 1d 1h residual"
    )
    return _flat(sf, LABEL_KEYS)


from time_series_db_spark.catalog import (  # noqa: E402
    _AVOTE_CTES as _SD_AVOTE,
    SQL_SDC_CTES as _SD_CHAIN,
    sql_acf_ctes as _sql_acf,
)


@register(
    "m3ql_seasonal_decompose",
    f"""{PRELUDE},
    {_sql_acf(48)},
    {_SD_AVOTE},
    {_SD_CHAIN}
    SELECT name, "user", region, shard, ts,
           {sql_quant('detr - seasonal')} AS value
    FROM dsn
    WHERE detr IS NOT NULL AND seasonal IS NOT NULL""",
)
def m3ql_seasonal_decompose(spark, sf_dir):
    """seasonalDecompose auto residual through the full language path
    (operators/windows.py:seasonal_decompose sliced back into the
    pipeline): classical additive decomposition at the ACF-voted
    season, one component re-entering as the series value; rows whose
    component is undefined (textbook trend edges, empty phases) become
    ABSENT samples per the engine-wide null contract.  The oracle
    shares the operator entry's full replay chain and keeps only the
    defined residual rows."""
    sf = run_m3ql(
        spark, sf_dir, "fetch name:* | seasonalDecompose auto residual"
    )
    return _flat(sf, LABEL_KEYS)


from time_series_db_spark.catalog import (  # noqa: E402
    sql_forecast_ctes as _sql_fc,
    sql_rolling_corr_ctes as _sql_rc,
)
from time_series_db_spark.sources import DEFAULT_STEP_MS as _STEP  # noqa: E402


@register(
    "m3ql_rolling_corr",
    f"""{PRELUDE},
    {_sql_rc(_STEP, 6, 4, agg="max(value)")}""",
)
def m3ql_rolling_corr(spark, sf_dir):
    """rollingCorr 6 "name:click" "region:r0" 4 through the full
    language path (parser → plan → builder →
    operators/stats.py:rolling_corr_target), composed after the
    language's own grouped max — max (not sum) because the language's
    grouped sum is the float path whose summation order could flip the
    1e-6 input quantizer between engines; max is order-independent, so
    the staged pipeline stays exact end to end.  The oracle shares the
    operator entry's exact-integer co-moment replay at the language
    default grid step."""
    sf = run_m3ql(
        spark, sf_dir,
        'fetch name:* | max name region | '
        'rollingCorr 6 "name:click" "region:r0" 4',
    )
    return _flat(sf, ["name", "region"])


@register(
    "m3ql_forecast",
    f"""{PRELUDE},
    {_sql_acf(48)},
    {_SD_AVOTE},
    {_sql_fc(6)}""",
)
def m3ql_forecast(spark, sf_dir):
    """forecast 6 auto through the full language path (parser → plan →
    builder → operators/windows.py:forecast): seasonal-naive + drift
    at the ACF-voted season — 6 future grid samples per series, each
    the last sample a whole number of seasons back plus the endpoint
    drift over the carried gap.  The oracle shares the operator
    entry's replay chain at the language default lag bound."""
    sf = run_m3ql(spark, sf_dir, "fetch name:* | forecast 6 auto")
    return _flat(sf, LABEL_KEYS)


from time_series_db_spark.catalog import sql_cusum_ctes as _sql_cusum  # noqa: E402


@register(
    "m3ql_changepoints",
    f"{PRELUDE},"
    + _sql_cusum(3.0, where="name = 'view'"),
)
def m3ql_changepoints(spark, sf_dir):
    """changepoints 3 through the full language path (parser → plan →
    builder → operators/windows.py:cusum_changepoints): two-sided
    CUSUM mean-shift flags in closed form — the level-shift detector
    companion to `anomalies` in the M3QL function family."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | changepoints 3")
    return _flat(sf, LABEL_KEYS)


from time_series_db_spark.catalog import (  # noqa: E402
    sql_ewma_ctes as _sql_ewma,
    sql_interpolate_ctes as _sql_interp,
)


@register(
    "m3ql_interpolate",
    f"{PRELUDE},"
    + _sql_interp(limit=3, where="name = 'view'"),
)
def m3ql_interpolate(spark, sf_dir):
    """interpolate 3 through the full language path: linear interior-gap
    fill bounded to 3-step runs — the chart-renderer densifier next to
    keepLastValue (step fill) and transformNull (constant fill) in the
    M3QL function family."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | interpolate 3")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_ewma",
    f"{PRELUDE}"
    + _sql_ewma(where="name = 'purchase'"),
)
def m3ql_ewma(spark, sf_dir):
    """ewma 10 through the full language path: trailing-window
    exponential smoothing, the lag-free alternative to `moving avg`
    for dashboards — recurrence replayed by the oracle as unrolled
    scalar CTE steps over an ordered grouped window list."""
    sf = run_m3ql(spark, sf_dir, "fetch name:purchase | ewma 10")
    return _flat(sf, LABEL_KEYS)


from time_series_db_spark.catalog import sql_lttb_ctes as _sql_lttb  # noqa: E402


@register(
    "m3ql_decimate_lttb",
    f"{PRELUDE},"
    + _sql_lttb("value IS NOT NULL AND name = 'view'"),
)
def m3ql_decimate_lttb(spark, sf_dir):
    """decimate 2h lttb through the full language path — the
    chart-downsample fn family (minmax | lttb) wired into the M3QL
    grammar; the oracle replays the triangle selection on the filtered
    fetch."""
    sf = run_m3ql(spark, sf_dir, "fetch name:view | decimate 2h lttb")
    return _flat(sf, LABEL_KEYS)


class _FrameSource:
    """M3Source serving a pre-shaped SeriesFrame for any fetch — lets
    catalog entries feed synthesized series (e.g. le-bucket histograms)
    into the full text surface (parser → plan → builder)."""

    def __init__(self, sf: SeriesFrame):
        self._sf = sf

    def fetch(self, match, inverse, min_ts, max_ts, step,
              match_re=None, inverse_re=None) -> SeriesFrame:
        return self._sf


def _le_bucket_frame(spark, sf_dir) -> SeriesFrame:
    """Cumulative le-bucket series fabricated from the view metric:
    counts at le ∈ {5, 20, 50, +Inf} per (region, ts), one series per
    le — the input shape promHistogramPercentile / histogram_quantile
    consume (same fabrication as catalog_promql.promql_histogram_quantile)."""
    from time_series_db_spark.model import SAMPLE_COLS, series_key_expr
    from time_series_db_spark.sources import fetch_events

    base = fetch_events(spark, sf_dir)
    df = base.df.filter(F.col("labels")["name"] == "view")
    bounds = F.array(F.lit(5.0), F.lit(20.0), F.lit(50.0), F.lit(float("inf")))
    exploded = df.select(
        F.col("labels")["region"].alias("region"),
        "ts", "value", F.explode(bounds).alias("le"),
    )
    buckets = (
        exploded.groupBy("region", "ts", "le")
        .agg(F.count(F.when(F.col("value") <= F.col("le"), 1))
             .cast("double").alias("value"))
        .select(
            F.create_map(
                F.lit("name"), F.lit("view_hist"),
                F.lit("region"), F.col("region"),
                F.lit("le"),
                F.when(F.col("le") == float("inf"), F.lit("+Inf"))
                 .otherwise(F.col("le").cast("string")),
            ).alias("labels"),
            F.lit(None).cast("string").alias("alias"),
            "ts", "value",
        )
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return base.with_df(buckets)


#: bucketQuantile CASE parametrized by the q column (pcts cross join) —
#: mirrors grouping._bucket_quantile_expr for le ∈ {5, 20, 50, +Inf}
_PHP_CASE = """CASE
  WHEN c4 <= 0 THEN 'NaN'::DOUBLE
  WHEN c1 >= q * c4 THEN 0.0  + (5.0  - 0.0)  * ((q * c4 - 0)  / c1)
  WHEN c2 >= q * c4 THEN 5.0  + (20.0 - 5.0)  * ((q * c4 - c1) / (c2 - c1))
  WHEN c3 >= q * c4 THEN 20.0 + (50.0 - 20.0) * ((q * c4 - c2) / (c3 - c2))
  ELSE 50.0 END"""


@register(
    "m3ql_prom_histogram_percentile",
    f"""{PRELUDE},
    counts AS (
      SELECT region, ts,
             count(CASE WHEN value <= 5.0  THEN 1 END) AS c1,
             count(CASE WHEN value <= 20.0 THEN 1 END) AS c2,
             count(CASE WHEN value <= 50.0 THEN 1 END) AS c3,
             count(*) AS c4
      FROM samples WHERE name = 'view' GROUP BY region, ts)
    SELECT 'view_hist' AS name, region, p AS "histogramPercentile", ts,
           {sql_quant(_PHP_CASE)} AS value
    FROM counts CROSS JOIN (VALUES ('p50', 0.50), ('p95', 0.95)) pcts(p, q)""",
)
def m3ql_prom_histogram_percentile(spark, sf_dir):
    """promHistogramPercentile 50 95 through the full M3QL text surface —
    the known-but-unimplemented reference name (Constants.java:64) as
    Prometheus bucketQuantile over le-bucket series, output tagged
    ``histogramPercentile: pNN``. One bucket collection is shared across
    both percentiles (grouping.prom_histogram_percentile)."""
    sf = execute(
        "fetch name:view_hist | promHistogramPercentile 50 95",
        _FrameSource(_le_bucket_frame(spark, sf_dir)),
        EVENTS_MIN_TS, EVENTS_MAX_TS, DEFAULT_STEP_MS,
    )
    return _flat(sf, ["name", "region", "histogramPercentile"])


_N_GRID = (EVENTS_MAX_TS - EVENTS_MIN_TS) // DEFAULT_STEP_MS
_GRID_SQL = (
    f"generate_series({EVENTS_MIN_TS}, "
    f"{EVENTS_MAX_TS - DEFAULT_STEP_MS}, {DEFAULT_STEP_MS}) t(gs)"
)


@register(
    "m3ql_mock_fetch_line",
    f"""SELECT 'flat' AS name, gs AS ts, 85.0::DOUBLE AS value FROM {_GRID_SQL}""",
)
def m3ql_mock_fetch_line(spark, sf_dir):
    """mockFetchLine 42.5 name:flat | scale 2 — the flat generator leaf
    (Constants.java:58, beyond-reference documented semantics) heading a
    pipeline: constant value at every grid step."""
    sf = run_m3ql(spark, sf_dir, "mockFetchLine 42.5 name:flat | scale 2")
    return _flat(sf, ["name"])


@register(
    "m3ql_mock_fetch_linear",
    f"""SELECT 'mockFetchLinear' AS name, gs AS ts,
           {sql_quant(f'10.0 + 0.5 * ((gs - {EVENTS_MIN_TS}) // {DEFAULT_STEP_MS})')} AS value
    FROM {_GRID_SQL}""",
)
def m3ql_mock_fetch_linear(spark, sf_dir):
    """mockFetchLinear 10 0.5 — ramp generator (Constants.java:59):
    start + slope·i at grid step i, default name tag."""
    sf = run_m3ql(spark, sf_dir, "mockFetchLinear 10 0.5")
    return _flat(sf, ["name"])


@register(
    "m3ql_mock_fetch_periodic",
    f"""SELECT 'wave' AS name, gs AS ts,
           {sql_quant(f'10.0 * sin(2 * pi() * (gs - {EVENTS_MIN_TS}) / 21600000.0)')} AS value
    FROM {_GRID_SQL}""",
)
def m3ql_mock_fetch_periodic(spark, sf_dir):
    """mockFetchPeriodic 10 6h name:wave — sine generator
    (Constants.java:60): amplitude·sin(2π·(i·step)/period); both engines
    evaluate the same IEEE expression order, quantization absorbs any
    last-ulp libm drift."""
    sf = run_m3ql(spark, sf_dir, "mockFetchPeriodic 10 6h name:wave")
    return _flat(sf, ["name"])


@register(
    "m3ql_seasonal_auto",
    f"""WITH mw AS (
      SELECT 'wave' AS name, gs AS ts,
             10.0 * sin(2 * pi() * (gs - {EVENTS_MIN_TS}) / 21600000.0)
               AS value
      FROM {_GRID_SQL}),
    mph AS (
      SELECT name, ts, value,
             CAST(sum(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
               / count(value) OVER w AS sm
      FROM mw
      WINDOW w AS (PARTITION BY name,
                   (ts % 21600000) - (ts % {DEFAULT_STEP_MS})))
    SELECT name, ts, {sql_quant('value - sm')} AS value FROM mph""",
)
def m3ql_seasonal_auto(spark, sf_dir):
    """mockFetchPeriodic 10 6h | seasonalAdjust auto — the auto-season
    loop closed (operators/stats.py:detect_season feeding
    windows.seasonal_adjust_auto): the season comes from the frame's
    own ACF-peak vote, and on the periodic generator it must recover
    the PLANTED 6h period (tests pin detect_season == 6h exactly; the
    oracle replays the residual at the planted season, so a
    non-multiple detection would hash-mismatch)."""
    sf = run_m3ql(
        spark,
        sf_dir,
        "mockFetchPeriodic 10 6h name:wave | seasonalAdjust auto",
    )
    return _flat(sf, ["name"])


_BR_RATE = """
  SELECT region, ts,
         (CASE WHEN value < pv THEN value ELSE value - pv END)
           / ((ts - pts) / 1000.0) AS rate
  FROM (SELECT region, ts, value,
               lag(value) OVER (PARTITION BY region ORDER BY ts) AS pv,
               lag(ts)    OVER (PARTITION BY region ORDER BY ts) AS pts
        FROM {src})
  WHERE pts IS NOT NULL"""

_BR_SMOOTH = (
    "SELECT region, ts, avg(rate) OVER (PARTITION BY region ORDER BY ts "
    f"RANGE BETWEEN {3 * DEFAULT_STEP_MS - DEFAULT_STEP_MS} PRECEDING "
    "AND CURRENT ROW) AS v FROM {src}"
)


@register(
    "m3ql_burn_rate",
    f"""{PRELUDE},
    err AS (SELECT region, ts, sum(value) AS value FROM samples
            WHERE name = 'error' GROUP BY 1, 2),
    tot AS (SELECT region, ts, sum(value) AS value FROM samples
            WHERE name IN ('error', 'click') GROUP BY 1, 2),
    erate AS ({_BR_RATE.format(src='err')}),
    trate AS ({_BR_RATE.format(src='tot')}),
    esm AS ({_BR_SMOOTH.format(src='erate')}),
    tsm AS ({_BR_SMOOTH.format(src='trate')})
    SELECT e.region, e.ts,
           {sql_quant("(CASE WHEN t.v = 0 THEN 'NaN'::DOUBLE ELSE e.v / t.v END)"
                      " * (1.0::DOUBLE / (1.0::DOUBLE - 0.99::DOUBLE))")} AS value
    FROM esm e JOIN tsm t ON e.region = t.region AND e.ts = t.ts""",
)
def m3ql_burn_rate(spark, sf_dir):
    """burnRate 3h 0.99 — SLO burn as perSecondRate + divide + scale
    (BurnRateNode documented semantics): observed error-rate share of
    total, normalized by the 1% error budget. Both sides are per-region
    sums; the auto-common-label match joins them on (region, ts) with
    the usual broadcast-aggregate shape."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:error | sum region"
        " | burnRate 3h 0.99 (fetch name:{error,click} | sum region)",
    )
    return _flat(sf, ["region"])


# ---------------------------------------------------------------------------
# Round 5: remaining known-but-unimplemented names with defensible public
# semantics (Constants.java:40-76) — timestamp, histogramCDF, toHistogram,
# aliasByBucket/aliasByHistogramBucket/aliasByDistinctTags, multiBurnRate /
# asBurnRate / asMultiBurnRate, _summarizeBy, showAnomalyThresholds.
# ---------------------------------------------------------------------------


@register(
    "m3ql_timestamp",
    f"""{PRELUDE}
    SELECT {SQL_LBLS}, ts, {sql_quant('ts / 1000.0')} AS value
    FROM samples WHERE name = 'error'""",
)
def m3ql_timestamp(spark, sf_dir):
    """timestamp — Constants.java:73 known-unimplemented name with the
    public Graphite/PromQL ``timestamp()`` semantics: value := the
    sample's own epoch-second timestamp. Pure column expression."""
    sf = run_m3ql(spark, sf_dir, "fetch name:error | timestamp")
    return _flat(sf, LABEL_KEYS)


@register(
    "m3ql_histogram_cdf",
    f"""{PRELUDE},
    b AS (
      SELECT least(7, greatest(0, CAST(floor(value / 50) AS INT))) AS idx, ts
      FROM samples WHERE name = 'view' AND NOT isnan(value)),
    counts AS (
      SELECT idx, ts, CAST(count(*) AS DOUBLE) AS cnt,
             CAST((idx + 1) * 50 AS DOUBLE) AS upper
      FROM b GROUP BY 1, 2),
    cdfx AS (
      SELECT ts, 'le_100' AS cdf,
             sum(CASE WHEN upper <= 100 THEN cnt ELSE 0 END) / sum(cnt) AS v
      FROM counts GROUP BY 1
      UNION ALL
      SELECT ts, 'le_250' AS cdf,
             sum(CASE WHEN upper <= 250 THEN cnt ELSE 0 END) / sum(cnt) AS v
      FROM counts GROUP BY 1)
    SELECT 'histogram' AS name, cdf, ts, {sql_quant('v')} AS value FROM cdfx""",
)
def m3ql_histogram_cdf(spark, sf_dir):
    """toHistogramLinearBuckets … | histogramCDF bucketid bucket 100 250
    — the CDF dual of histogramPercentile (Constants.java:56): fraction
    of observations at or below each threshold, from the same bucket-tag
    format, one shuffle + pure array fold."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:view | toHistogramLinearBuckets 0 50 8"
        " | histogramCDF bucketid bucket 100 250",
    )
    return sf.df.select(
        F.col("labels")["name"].alias("name"),
        F.col("labels")["histogramCDF"].alias("cdf"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_to_histogram_explicit",
    f"""{PRELUDE},
    b AS (
      SELECT greatest(0, least(3,
               CAST(len(list_filter([0, 50, 150, 300, 600],
                                    x -> x <= value)) AS INT) - 1)) AS idx,
             ts
      FROM samples WHERE name = 'view' AND NOT isnan(value))
    SELECT 'histogram' AS name,
           lpad(CAST(idx AS VARCHAR), 3, '0') AS bucketid,
           CAST([0, 50, 150, 300, 600][idx + 1] AS VARCHAR) || '-' ||
           CAST([0, 50, 150, 300, 600][idx + 2] AS VARCHAR) AS bucket,
           ts, CAST(count(*) AS DOUBLE) AS value
    FROM b GROUP BY 1, 2, 3, 4""",
)
def m3ql_to_histogram_explicit(spark, sf_dir):
    """toHistogram 0 50 150 300 600 — explicit-bounds histogram
    (Constants.java:75): 4 buckets [b_i, b_{i+1}) with edge clamping,
    emitting the same bucket tags the histogram consumers parse."""
    sf = run_m3ql(
        spark, sf_dir, "fetch name:view | toHistogram 0 50 150 300 600"
    )
    return sf.df.select(
        F.col("labels")["name"].alias("name"),
        F.col("labels")["bucketid"].alias("bucketid"),
        F.col("labels")["bucket"].alias("bucket"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_alias_by_histogram_bucket",
    f"""{PRELUDE},
    b AS (
      SELECT least(7, greatest(0, CAST(floor(value / 50) AS INT))) AS idx, ts
      FROM samples WHERE name = 'view' AND NOT isnan(value))
    SELECT lpad(CAST(idx AS VARCHAR), 3, '0') AS bucketid,
           'le ' || CAST((idx + 1) * 50 AS VARCHAR) AS alias,
           ts, CAST(count(*) AS DOUBLE) AS value
    FROM b GROUP BY 1, 2, 3""",
)
def m3ql_alias_by_histogram_bucket(spark, sf_dir):
    """aliasByHistogramBucket bucket — Constants.java:48: bucket series
    renamed Prometheus-style ``le <upper>`` from the range tag's upper
    bound as written."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:view | toHistogramLinearBuckets 0 50 8"
        " | aliasByHistogramBucket bucket",
    )
    return sf.df.select(
        F.col("labels")["bucketid"].alias("bucketid"),
        F.col("alias").alias("alias"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_alias_by_bucket",
    f"""{PRELUDE},
    b AS (
      SELECT least(7, greatest(0, CAST(floor(value / 50) AS INT))) AS idx, ts
      FROM samples WHERE name = 'view' AND NOT isnan(value))
    SELECT lpad(CAST(idx AS VARCHAR), 3, '0') AS bucketid,
           CAST(idx * 50 AS VARCHAR) || '-' ||
           CAST((idx + 1) * 50 AS VARCHAR) AS alias,
           ts, CAST(count(*) AS DOUBLE) AS value
    FROM b GROUP BY 1, 2, 3""",
)
def m3ql_alias_by_bucket(spark, sf_dir):
    """aliasByBucket bucket — Constants.java:47: alias = the raw
    ``"low-high"`` bucket-range tag value."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:view | toHistogramLinearBuckets 0 50 8"
        " | aliasByBucket bucket",
    )
    return sf.df.select(
        F.col("labels")["bucketid"].alias("bucketid"),
        F.col("alias").alias("alias"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_alias_by_distinct_tags",
    f"""{PRELUDE}
    SELECT {SQL_LBLS}, region || ' ' || shard || ' ' || "user" AS alias,
           ts, {sql_quant('value')} AS value
    FROM samples WHERE name = 'error'""",
)
def m3ql_alias_by_distinct_tags(spark, sf_dir):
    """aliasByDistinctTags — Constants.java:46: alias by the values of
    the tags that vary across the fetched series set (here user/region/
    shard vary, name is pinned by the filter), joined in sorted-key
    order. The varying-key probe is metadata-sized (distinct series ×
    tags)."""
    sf = run_m3ql(spark, sf_dir, "fetch name:error | aliasByDistinctTags")
    return sf.df.select(
        *[F.col("labels")[k].alias(k) for k in LABEL_KEYS],
        F.col("alias").alias("alias"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_multi_burn_rate",
    f"""{PRELUDE},
    err AS (SELECT region, ts, max(value) AS value FROM samples
            WHERE name = 'error' GROUP BY 1, 2),
    tot AS (SELECT region, ts, max(value) AS value FROM samples
            WHERE name IN ('error', 'click') GROUP BY 1, 2),
    erate AS ({_BR_RATE.format(src='err')}),
    trate AS ({_BR_RATE.format(src='tot')}),
    esm1 AS (SELECT region, ts, avg(rate) OVER (PARTITION BY region ORDER BY ts
             RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS v FROM erate),
    tsm1 AS (SELECT region, ts, avg(rate) OVER (PARTITION BY region ORDER BY ts
             RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS v FROM trate),
    esm6 AS (SELECT region, ts, avg(rate) OVER (PARTITION BY region ORDER BY ts
             RANGE BETWEEN {6 * DEFAULT_STEP_MS - DEFAULT_STEP_MS} PRECEDING AND CURRENT ROW) AS v FROM erate),
    tsm6 AS (SELECT region, ts, avg(rate) OVER (PARTITION BY region ORDER BY ts
             RANGE BETWEEN {6 * DEFAULT_STEP_MS - DEFAULT_STEP_MS} PRECEDING AND CURRENT ROW) AS v FROM trate)
    SELECT e.region, '1h' AS win, e.ts,
           {sql_quant("(CASE WHEN t.v = 0 THEN 'NaN'::DOUBLE ELSE e.v / t.v END)"
                      " * 100.0::DOUBLE")} AS value
    FROM esm1 e JOIN tsm1 t ON e.region = t.region AND e.ts = t.ts
    UNION ALL
    SELECT e.region, '6h' AS win, e.ts,
           {sql_quant("(CASE WHEN t.v = 0 THEN 'NaN'::DOUBLE ELSE e.v / t.v END)"
                      " * 100.0::DOUBLE")} AS value
    FROM esm6 e JOIN tsm6 t ON e.region = t.region AND e.ts = t.ts""",
)
def m3ql_multi_burn_rate(spark, sf_dir):
    """multiBurnRate 0.99 1h 6h — the SRE-workbook multi-window burn
    construction (Constants.java:61): one BurnRate branch per window
    over the SAME fetched frames (fetch CSE scans once), window-tagged
    and union'd."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:error | max region"
        " | multiBurnRate 0.99 1h 6h (fetch name:{error,click} | max region)",
    )
    return sf.df.select(
        F.col("labels")["region"].alias("region"),
        F.col("labels")["window"].alias("win"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_as_burn_rate",
    f"""{PRELUDE},
    err AS (SELECT region, ts, max(value) AS value FROM samples
            WHERE name = 'error' GROUP BY 1, 2),
    tot AS (SELECT region, ts, max(value) AS value FROM samples
            WHERE name IN ('error', 'click') GROUP BY 1, 2)
    SELECT e.region, e.ts,
           {sql_quant("(CASE WHEN t.value = 0 THEN 'NaN'::DOUBLE "
                      "ELSE e.value / t.value END) * 1000.0::DOUBLE")} AS value
    FROM err e JOIN tot t ON e.region = t.region AND e.ts = t.ts""",
)
def m3ql_as_burn_rate(spark, sf_dir):
    """asBurnRate 0.999 — Constants.java:50: a precomputed error-ratio
    series expressed as a burn multiple of the 0.1% error budget (scale
    by 1/(1−slo)); the ratio here is the divide stage's output."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:error | max region"
        " | divide (fetch name:{error,click} | max region)"
        " | asBurnRate 0.999",
    )
    return _flat(sf, ["region"])


@register(
    "m3ql_as_multi_burn_rate",
    f"""{PRELUDE},
    err AS (SELECT region, ts, max(value) AS value FROM samples
            WHERE name = 'error' GROUP BY 1, 2),
    tot AS (SELECT region, ts, max(value) AS value FROM samples
            WHERE name IN ('error', 'click') GROUP BY 1, 2),
    ratio AS (
      SELECT e.region, e.ts,
             CASE WHEN t.value = 0 THEN 'NaN'::DOUBLE
                  ELSE e.value / t.value END AS value
      FROM err e JOIN tot t ON e.region = t.region AND e.ts = t.ts),
    rgrid AS (SELECT gs AS ts FROM generate_series({EVENTS_MIN_TS},
              {EVENTS_MAX_TS - DEFAULT_STEP_MS}, {DEFAULT_STEP_MS}) t(gs)),
    rsids AS (SELECT DISTINCT region FROM ratio),
    rdense AS (
      SELECT s.region, g.ts, v.value
      FROM rsids s CROSS JOIN rgrid g
      LEFT JOIN ratio v ON v.region = s.region AND v.ts = g.ts),
    w3 AS (
      SELECT region, ts,
             avg(value) OVER (PARTITION BY region ORDER BY ts
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS mv,
             count(value) OVER (PARTITION BY region ORDER BY ts
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS c
      FROM rdense),
    w6 AS (
      SELECT region, ts,
             avg(value) OVER (PARTITION BY region ORDER BY ts
               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS mv,
             count(value) OVER (PARTITION BY region ORDER BY ts
               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS c
      FROM rdense)
    SELECT region, '3h' AS win, ts, {sql_quant('mv * 100.0::DOUBLE')} AS value
    FROM w3 WHERE c > 0
    UNION ALL
    SELECT region, '6h' AS win, ts, {sql_quant('mv * 100.0::DOUBLE')} AS value
    FROM w6 WHERE c > 0""",
)
def m3ql_as_multi_burn_rate(spark, sf_dir):
    """asMultiBurnRate 0.99 3h 6h — Constants.java:50: the precomputed
    ratio smoothed with a moving average per window (M3 moving
    semantics: trailing, current point excluded, dense emission), scaled
    by the error budget, window-tagged, union'd."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:error | max region"
        " | divide (fetch name:{error,click} | max region)"
        " | asMultiBurnRate 0.99 3h 6h",
    )
    return sf.df.select(
        F.col("labels")["region"].alias("region"),
        F.col("labels")["window"].alias("win"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_summarize_by",
    f"""{PRELUDE},
    g AS (SELECT region, ts, max(value) AS value FROM samples GROUP BY 1, 2)
    SELECT region, ts - (ts % {6 * DEFAULT_STEP_MS}) AS ts,
           {sql_quant('max(value)')} AS value
    FROM g GROUP BY 1, 2""",
)
def m3ql_summarize_by(spark, sf_dir):
    """_summarizeBy 6h max region — Constants.java:41: collapse series to
    the tag set with the aggregation, then summarize in time with the
    same function (documented chosen semantics; max keeps the
    differential fp-order-insensitive). Two hash aggregations, both with
    map-side partial aggregation."""
    sf = run_m3ql(spark, sf_dir, "fetch name:* | _summarizeBy 6h max region")
    return _flat(sf, ["region"])


@register(
    "m3ql_show_anomaly_thresholds",
    f"""{PRELUDE},
    stats AS (
      SELECT {SQL_LBLS}, ts,
             avg(value) OVER (PARTITION BY {SQL_LBLS}) AS mu,
             coalesce(stddev_pop(value) OVER (PARTITION BY {SQL_LBLS}), 0.0) AS sd
      FROM samples WHERE name = 'view')
    SELECT {SQL_LBLS}, 'upper' AS bound, ts,
           {sql_quant('mu + 2.5 * sd')} AS value FROM stats
    UNION ALL
    SELECT {SQL_LBLS}, 'lower' AS bound, ts,
           {sql_quant('mu - 2.5 * sd')} AS value FROM stats""",
)
def m3ql_show_anomaly_thresholds(spark, sf_dir):
    """showAnomalyThresholds 2.5 — Constants.java:70: the anomalies
    stage's detection band (mean ± 2.5·stddev_pop per series) emitted as
    upper/lower series — same single window aggregate as anomalies plus
    a bounded 2-way explode."""
    sf = run_m3ql(
        spark, sf_dir, "fetch name:view | showAnomalyThresholds 2.5"
    )
    return sf.df.select(
        *[F.col("labels")[k].alias(k) for k in LABEL_KEYS],
        F.col("labels")["anomalyThreshold"].alias("bound"),
        F.col("ts"),
        quant(F.col("value")).alias("value"),
    )


@register(
    "m3ql_divide_when",
    f"""{PRELUDE},
    totals AS (
      SELECT region, ts, CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS tv
      FROM samples WHERE name = 'error' GROUP BY 1, 2)
    SELECT s.name, s."user", s.region, s.shard, s.ts,
           {sql_quant(
               "CASE WHEN t.tv IS NOT NULL AND t.tv >= 50.0"
               " THEN (CASE WHEN t.tv = 0 THEN 'NaN'::DOUBLE"
               "       ELSE s.value / t.tv END)"
               " ELSE s.value END"
           )} AS value
    FROM samples s LEFT JOIN totals t
      ON s.region = t.region AND s.ts = t.ts
    WHERE s.name = 'error'""",
)
def m3ql_divide_when(spark, sf_dir):
    """divideWhen ge 50 (sum region) region — Constants.java:53 with
    documented chosen semantics: the per-region total divides the series
    only where it is ≥50; elsewhere (small or missing denominator) the
    raw value passes through. LEFT-outer variant of the divide join."""
    sf = run_m3ql(
        spark, sf_dir,
        "fetch name:error"
        " | divideWhen ge 50 (fetch name:error | sum region) region",
    )
    return _flat(sf, LABEL_KEYS)
