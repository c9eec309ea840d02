"""time_series_db_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference TSDB (an OpenSearch plugin exposing M3QL/PromQL over a
Gorilla-chunk store), re-expressed Spark-first:

- data model: exploded sample frame (``series_key``, ``labels MAP``, ``ts``,
  ``value``) — reference ``TimeSeries`` (query/aggregator/TimeSeries.java:68)
- operators: DataFrame/SQL transforms (reference: pipeline stages under
  lang/m3/stage/) — see :mod:`time_series_db_spark.operators`
- query languages: M3QL + PromQL parsers/planners in
  :mod:`time_series_db_spark.lang`
- sources: table scans + federated (resolved-partitions) fetch in
  :mod:`time_series_db_spark.sources`
- ingest: Structured Streaming in :mod:`time_series_db_spark.streaming`
- large-scale pipeline ops (dedup / similarity / text / multimodal) in
  :mod:`time_series_db_spark.pipeline`

The reference's shard/coordinator split, partial-aggregation carriers,
pushdown and circuit breakers all dissolve into Catalyst equivalents
(partial HashAggregate, TakeOrderedAndProject, spill) — SURVEY.md §4.
"""

__version__ = "0.1.0"
