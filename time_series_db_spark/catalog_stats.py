"""Stats catalog: the ``/_tsdb/stats`` surface as oracle-verified queries.

Reference: ``GET /_tsdb/stats`` with ``include=headStats,labelStats,
valueStats`` (query/rest/RestTSDBStatsAction.java:1-60, shaped by
InternalTSDBStats.java). Each section is one registered query over the
events-as-metrics mapping with a DuckDB oracle.
"""

from __future__ import annotations

from time_series_db_spark.catalog import PRELUDE, register, sql_quant
from time_series_db_spark.operators import stats
from time_series_db_spark.sources import fetch_events, fetch_series_identities

_SIDS = ''',
sids AS (SELECT DISTINCT name, "user", region, shard FROM samples)'''


@register(
    "stats_head",
    PRELUDE
    + _SIDS
    + """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sids) AS num_series,
       CAST(COUNT(value) AS BIGINT) AS num_samples,
       MIN(ts) AS min_timestamp,
       MAX(ts) AS max_timestamp
FROM samples""",
)
def stats_head(spark, sf_dir):
    """headStats: series count, sample count, time bounds — one scan,
    all-partial aggregates (count-distinct on series_key hash-partials)."""
    return stats.head_stats(fetch_events(spark, sf_dir))


@register(
    "stats_labels",
    PRELUDE
    + _SIDS
    + """
SELECT 'name' AS label, CAST(COUNT(DISTINCT name) AS BIGINT) AS cardinality FROM sids
UNION ALL
SELECT 'region', CAST(COUNT(DISTINCT region) AS BIGINT) FROM sids
UNION ALL
SELECT 'shard', CAST(COUNT(DISTINCT shard) AS BIGINT) FROM sids
UNION ALL
SELECT 'user', CAST(COUNT(DISTINCT "user") AS BIGINT) FROM sids""",
)
def stats_labels(spark, sf_dir):
    """labelStats: per-label-key value cardinality (exact here; the
    ``approx=True`` HLL path is the 100 TB default — see operators/stats).
    Uses the identity fast path: stats are over series, so the LWW grid
    aggregation is skipped and the scan prunes to the label columns."""
    return stats.label_stats(fetch_series_identities(spark, sf_dir))


@register(
    "stats_values",
    PRELUDE
    + """
SELECT CAST(COUNT(value) AS BIGINT) AS num_values,
       CAST(COALESCE(SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END), 0) AS BIGINT) AS num_nan,
       """
    + sql_quant("MIN(CASE WHEN NOT isnan(value) THEN value END)")
    + """ AS min_value,
       """
    + sql_quant("MAX(CASE WHEN NOT isnan(value) THEN value END)")
    + """ AS max_value,
       """
    + sql_quant("AVG(CASE WHEN NOT isnan(value) THEN value END)")
    + """ AS avg_value
FROM samples""",
)
def stats_values(spark, sf_dir):
    """valueStats: value distribution summary (NaN counted separately —
    NaN is a data value in the reference model, SURVEY.md §1.1)."""
    from pyspark.sql import functions as F

    from time_series_db_spark.catalog import quant

    df = stats.value_stats(fetch_events(spark, sf_dir))
    return df.select(
        "num_values",
        "num_nan",
        quant(F.col("min_value")).alias("min_value"),
        quant(F.col("max_value")).alias("max_value"),
        quant(F.col("avg_value")).alias("avg_value"),
    )


@register(
    "stats_fetch_labels",
    PRELUDE
    + """,
sids AS (SELECT DISTINCT name, "user" AS usr, region, shard FROM samples
         WHERE name IN ('error', 'click'))
SELECT 'name:' || name || ',region:' || region || ',shard:' || shard
       || ',user:' || usr AS series_key, t.label, t.value
FROM sids CROSS JOIN LATERAL (VALUES
  ('name', name), ('region', region), ('shard', shard), ('user', usr)
) t(label, value)""",
)
def stats_fetch_labels(spark, sf_dir):
    """labels-fetch ``_search`` ext: full label maps for every series
    matching a tag filter (LabelsFetchSubPhase.java — the dedicated
    per-hit label surface, distinct from labelStats cardinalities).
    Identity fast path: the per-hit surface never touches values."""
    from pyspark.sql import functions as F

    ids = fetch_series_identities(
        spark, sf_dir, where=F.col("name").isin("error", "click")
    )
    return stats.fetch_labels(ids)
