"""Operator inventory — SURVEY.md §2 re-expressed as DataFrame transforms.

Every reference pipeline stage (``List<TimeSeries> → List<TimeSeries>``,
query/stage/PipelineStage.java:38) becomes a function
``SeriesFrame → SeriesFrame`` built from Catalyst expressions. The
shard/coordinator split and ``reduce()`` merge disappear: Catalyst partial
aggregation + a single shuffle per groupBy/join is the physical equivalent
(SURVEY.md §4.1 row 4-6).
"""

from time_series_db_spark.operators import (  # noqa: F401
    binary,
    filters,
    grouping,
    labels,
    mappers,
    ordering,
    windows,
)
