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


CUSUM_OUTPUT_SCHEMA = StructType([
    StructField("series_key", StringType()),
    StructField("ts", LongType()),
    StructField("flag", DoubleType()),
    StructField("score", DoubleType()),
])

#: Welford moments (n, mean, m2) + the two one-sided CUSUM statistics
_CUSUM_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("mean", DoubleType()),
    StructField("m2", DoubleType()),
    StructField("sp", DoubleType()),
    StructField("sn", DoubleType()),
])


def _make_cusum_fn(warmup: int, threshold: float, slack: float):
    import math

    def _cusum_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, mean, m2, sp, sn = state.get
        else:
            n, mean, m2, sp, sn = 0, 0.0, 0.0, 0.0, 0.0
        out_ts, out_flag, out_score = [], [], []
        # applyInPandasWithState may split one group's micro-batch
        # across several Arrow chunks: concatenate FIRST, then sort
        # once by ts — sorting per chunk would feed the order-sensitive
        # warmup fold and S+/S- recurrence out of time order whenever a
        # later chunk carries earlier samples.  One group's micro-batch
        # is bounded, so materializing it is safe.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            for ts, x in sorted(zip(batch["ts"], batch["value"])):
                ts, x = int(ts), float(x)
                if n < warmup:
                    # calibration phase: fold finite samples into the
                    # Welford moments, emit no-alarm rows
                    if not math.isnan(x):
                        n += 1
                        delta = x - mean
                        mean += delta / n
                        m2 += delta * (x - mean)
                    out_ts.append(ts)
                    out_flag.append(0.0)
                    out_score.append(0.0)
                    continue
                sd = math.sqrt(m2 / n) if n else 0.0
                if sd > 0 and not math.isnan(x):
                    k = slack * sd
                    sp = max(0.0, sp + (x - mean - k))
                    sn = max(0.0, sn + (mean - k - x))
                # NaN samples inherit the running statistics — an
                # outage mid-shift does not silence the alarm (the
                # batch operator's documented contract)
                score = max(sp, sn) / sd if sd > 0 else 0.0
                out_ts.append(ts)
                out_flag.append(1.0 if score > threshold else 0.0)
                out_score.append(score)
        state.update((n, mean, m2, sp, sn))
        if out_ts:
            yield pd.DataFrame(
                {
                    "series_key": [key[0]] * len(out_ts),
                    "ts": pd.Series(out_ts, dtype="int64"),
                    "flag": pd.Series(out_flag, dtype="float64"),
                    "score": pd.Series(out_score, dtype="float64"),
                }
            )

    return _cusum_fn


def streaming_cusum(
    samples: DataFrame,
    warmup: int = 32,
    threshold: float = 5.0,
    slack: float = 0.5,
) -> DataFrame:
    """Continuous two-sided CUSUM mean-shift monitoring — the streaming
    leg of ``operators.windows.cusum_changepoints``.  A batch query has
    a full window to take μ/σ from; a stream does not, so this follows
    the SPC run-chart model: each series' first ``warmup`` finite
    samples CALIBRATE the reference (Welford fold in the state store),
    after which μ/σ freeze and every sample updates the two one-sided
    statistics ``S⁺/S⁻`` against the frozen reference — state
    ``(n, mean, m2, S⁺, S⁻)`` persists across micro-batches, so a
    shift straddling a batch boundary accumulates seamlessly.
    Recalibration is a restart with a fresh checkpoint (the streaming
    analog of re-running the batch op over a new window).  Emits
    ``(series_key, ts, flag, score)`` per sample: ``score`` =
    ``max(S⁺, S⁻)/σ`` (alarm magnitude in σ units), ``flag`` = 1.0
    where score > threshold; calibration rows emit 0.  NaN samples
    inherit the running statistics — an outage mid-shift does not
    silence the alarm (the batch operator's contract).

    Scale shape: identical to :func:`streaming_per_second_rate` —
    state partitioned by series_key, one Arrow round-trip per updated
    group per micro-batch, state size O(1) per series.
    """
    if warmup < 2:
        raise ValueError("streaming_cusum needs warmup >= 2")
    return (
        samples.select("series_key", "ts", "value")
        .groupBy("series_key")
        .applyInPandasWithState(
            _make_cusum_fn(int(warmup), float(threshold), float(slack)),
            CUSUM_OUTPUT_SCHEMA,
            _CUSUM_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
