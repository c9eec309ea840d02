"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's ingest path keeps per-series decode state in the engine
(last sample per series drives ooo rejection and counter-rate queries).
In Structured Streaming that state lives in the state store, with an
Arrow-batched pandas function folding each micro-batch's samples into
it — ``applyInPandasWithState`` is the PySpark surface for exactly this
(SURVEY.md §3.4; the streaming analog of PerSecondStage.java:47).

Scale shape: state is partitioned by ``series_key`` (the stream's
natural key), each executor holds only its partitions' state, and the
per-batch work is one Arrow round-trip per updated group — the standard
pattern for million-series streaming rate computation.
"""

from __future__ import annotations

import sys
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)


def _register_self_by_value() -> None:
    """Ship this module's functions by value inside the stateful UDF
    closure (same rationale as pipeline.multimodal): executors must not
    need the repo on their import path."""
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_self_by_value()


RATE_OUTPUT_SCHEMA = StructType([
    StructField("series_key", StringType()),
    StructField("ts", LongType()),
    StructField("rate", DoubleType()),
])

_RATE_STATE_SCHEMA = StructType([
    StructField("last_ts", LongType()),
    StructField("last_value", DoubleType()),
])


def _rate_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold one series' micro-batch samples into (last_ts, last_value)
    state, emitting a per-second rate per consecutive sample pair.
    Negative diffs are counter resets and emit nothing
    (PerSecondStage.java:80-83); state still advances so the next
    sample rates against the post-reset value."""
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = None, None
    out_ts, out_rate = [], []
    for pdf in pdfs:
        for ts, value in sorted(zip(pdf["ts"], pdf["value"])):
            ts = int(ts)
            value = float(value)
            if last_ts is not None and ts > last_ts:
                diff = value - last_value
                if not diff < 0:  # NaN flows through
                    out_ts.append(ts)
                    out_rate.append(diff / ((ts - last_ts) / 1000.0))
            if last_ts is None or ts >= last_ts:
                last_ts, last_value = ts, value
    state.update((last_ts, last_value))
    if out_ts:
        yield pd.DataFrame(
            {
                "series_key": [key[0]] * len(out_ts),
                "ts": pd.Series(out_ts, dtype="int64"),
                "rate": pd.Series(out_rate, dtype="float64"),
            }
        )


def streaming_per_second_rate(samples: DataFrame) -> DataFrame:
    """Continuous per-series counter rate over a streaming sample frame
    (``series_key``, ``ts``, ``value``) — state (last sample per series)
    persists across micro-batches, so a rate is emitted for the first
    sample of a new batch against the last sample of the previous one.
    """
    return (
        samples.select("series_key", "ts", "value")
        .groupBy("series_key")
        .applyInPandasWithState(
            _rate_fn,
            RATE_OUTPUT_SCHEMA,
            _RATE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
