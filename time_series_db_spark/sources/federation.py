"""Federated fetch — the ResolvedPartitions analog.

The reference resolves a fetch into per-partition (index) time windows
(query/rest/ResolvedPartitions.java:445: each partition id carries a
``[start, end)`` window + partition keys; RemoteIndexSettingsCache
supplies per-index step settings) and merges the per-partition streams
at the coordinator. Overlapping windows disable shard-local pushdown
(dsl/SourceBuilderVisitor.java:1049-1051 shouldDisablePushdown) so the
coordinator sees every sample and last-write-wins dedup applies.

Spark analog: one scan per (path, window) — each with its own pushed
time-range + label predicates — union, then a single hash aggregation
on (series_key, grid_ts) picking the sample from the highest-ranked
partition (later-listed partition wins at overlaps, mirroring
new-index-over-old precedence during data migration). The per-partition
scans prune row groups independently, so at scale a query touching one
partition's window reads nothing from the others; the dedup shuffle is
the same single exchange a plain fetch's grid alignment already needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from time_series_db_spark.model import (
    SAMPLE_COLS,
    SeriesFrame,
    labels_from_key_expr,
)
from time_series_db_spark.sources.m3source import tag_filter_predicate
from time_series_db_spark.sources.tables import (
    DEFAULT_STEP_MS,
    EVENTS_MAX_TS,
    EVENTS_MIN_TS,
    fetch_events,
)


@dataclass(frozen=True)
class Partition:
    """One resolved partition: a table path readable over [start, end).

    ``name`` accepts both the reference's partition-id formats
    (ResolvedPartitions index-name parsing): ``"cluster:index"`` and
    bare ``"index"`` — the path after the last colon is what we read.
    """

    path: str
    start_ms: int
    end_ms: int
    name: str = ""

    @property
    def index_name(self) -> str:
        return self.name.rsplit(":", 1)[-1] if self.name else self.path


def federated_fetch(
    spark: SparkSession,
    partitions: list[Partition],
    step: int = DEFAULT_STEP_MS,
    min_ts: int = EVENTS_MIN_TS,
    max_ts: int = EVENTS_MAX_TS,
    where=None,
) -> SeriesFrame:
    """Tag-filtered scan across resolved partitions with overlap dedup.

    Each partition scans only ``[max(min_ts, p.start), min(max_ts,
    p.end))`` — the window predicate lands in that scan's PushedFilters
    — and the union dedups per (series, grid point) with the
    later-listed partition winning.
    """
    frames = []
    for rank, p in enumerate(partitions):
        lo, hi = max(min_ts, p.start_ms), min(max_ts, p.end_ms)
        if lo >= hi:
            continue
        sf = fetch_events(
            spark, p.path, step=step, min_ts=lo, max_ts=hi, where=where
        )
        frames.append(sf.df.withColumn("__rank", F.lit(rank)))
    if not frames:
        empty = fetch_events(
            spark, partitions[0].path if partitions else "",
            step=step, min_ts=min_ts, max_ts=min_ts, where=where,
        )
        return SeriesFrame(df=empty.df, step=step, min_ts=min_ts, max_ts=max_ts)
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    merged = (
        df.groupBy("series_key", "ts")
        .agg(F.expr("max_by(value, __rank)").alias("value"))
        .select(
            F.col("series_key"),
            labels_from_key_expr(F.col("series_key")).alias("labels"),
            F.lit(None).cast("string").alias("alias"),
            F.col("ts"),
            F.col("value"),
        )
        .select(*SAMPLE_COLS)
    )
    return SeriesFrame(df=merged, step=step, min_ts=min_ts, max_ts=max_ts)


class FederatedEventsSource:
    """M3Source over resolved partitions — text M3QL queries run
    unchanged against a federated table set (the multi-index analog of
    EventsSource)."""

    def __init__(self, spark: SparkSession, partitions: list[Partition]):
        self.spark = spark
        self.partitions = list(partitions)

    def fetch(
        self,
        match: dict[str, list[str]],
        inverse: dict[str, list[str]],
        min_ts: int,
        max_ts: int,
        step: int,
        match_re=None,
        inverse_re=None,
    ) -> SeriesFrame:
        where = None
        for key, values in match.items():
            p = tag_filter_predicate(F.col(key), values)
            where = p if where is None else (where & p)
        for key, values in inverse.items():
            p = tag_filter_predicate(F.col(key), values, inverted=True)
            where = p if where is None else (where & p)
        return federated_fetch(
            self.spark,
            self.partitions,
            step=step,
            min_ts=max(min_ts, EVENTS_MIN_TS),
            max_ts=min(max_ts, EVENTS_MAX_TS),
            where=where,
        )

    def mock_fetch(self, values, tags, min_ts, max_ts, step) -> SeriesFrame:
        from time_series_db_spark.sources.m3source import synth_mock_series

        return synth_mock_series(self.spark, values, tags, min_ts, max_ts, step)
