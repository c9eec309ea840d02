"""Query output: the Prometheus ``query_range`` matrix response.

The reference has exactly one sink — ``PromMatrixResponseListener``
(query/rest/PromMatrixResponseListener.java:86; format javadoc :1-45):

    {"status": "success",
     "data": {"resultType": "matrix",
              "result": [{"metric": {k: v, ...}, "alias": ...,
                          "values": [[ts, "v"], ...],
                          "step": step, "start": start, "end": end}]}}

Values are stringified doubles (Prometheus wire convention; NaN/±Inf
serialize as "NaN"/"+Inf"/"-Inf"). Samples are ordered by timestamp
within each series.

Spark-first shaping: the per-series sample arrays are assembled
*distributed* — one ``groupBy(series_key)`` with ``sort_array(
collect_list(struct(ts, value)))`` (a single shuffle; each series'
samples are bounded by the query grid, so no group outgrows an executor)
— and only the final shaped rows cross to the driver. ``collect()``
happens here because this IS the boundary where results leave the engine,
the same place the reference streams its JSON response.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_db_spark.model import SeriesFrame


def _fmt(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def matrix_frame(sf: SeriesFrame) -> DataFrame:
    """One row per series: labels, alias, sorted (ts, value) sample array."""
    from time_series_db_spark.model import labels_from_key_expr

    aggs = [
        F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("value")))
        ).alias("samples"),
    ]
    if sf.ordered_by:
        aggs += [F.first(c).alias(c) for c in sf.ordered_by]
    return (
        sf.df.groupBy("series_key", "alias")
        .agg(*aggs)
        .withColumn("labels", labels_from_key_expr(F.col("series_key")))
    )


def to_matrix(
    sf: SeriesFrame,
    include_metadata: bool = True,
    include_alias: bool = True,
) -> dict[str, Any]:
    """SeriesFrame → matrix response dict (ordering: sort/topK list order
    when the frame carries one — SliceStage/SortStage list semantics —
    else canonical series_key order).

    ``include_metadata`` gates the per-series step/start/end block
    (PromMatrixResponseListener.java:142, REST default false);
    ``include_alias`` gates the alias field (the m3ql surface passes true,
    the promql surface false — RestM3QLAction.java:266 /
    RestPromQLAction.java:234)."""
    rows = matrix_frame(sf).collect()
    if sf.ordered_by:
        rows.sort(key=lambda r: tuple(r[c] for c in sf.ordered_by))
    else:
        rows.sort(key=lambda r: r["series_key"])
    meta = (
        {"step": sf.step, "start": sf.min_ts, "end": sf.max_ts}
        if include_metadata
        else {}
    )
    result = [
        {
            "metric": dict(r["labels"]),
            **(
                {"alias": r["alias"]}
                if include_alias and r["alias"] is not None
                else {}
            ),
            "values": [[int(s["ts"]), _fmt(s["value"])] for s in r["samples"]],
            **meta,
        }
        for r in rows
    ]
    return {"status": "success", "data": {"resultType": "matrix", "result": result}}


def to_vector(sf: SeriesFrame, time_ms: int) -> dict[str, Any]:
    """SeriesFrame (evaluated on a one-instant grid) → Prometheus
    instant-query vector response:

        {"status": "success",
         "data": {"resultType": "vector",
                  "result": [{"metric": {...}, "value": [ts, "v"]}, ...]}}

    Beyond the reference (its only sink is the matrix listener); format
    follows the Prometheus HTTP API ``/api/v1/query`` wire shape, with
    the millisecond timestamps this engine uses throughout. One sample
    per series: the most recent emission at or before ``time_ms``
    (Prometheus's lookback rule — the caller bounds the grid to the
    lookback window), reported at the evaluation instant. Series with no
    emission at or before the instant drop out, like stale series.
    """
    rows = (
        matrix_frame(sf)
        .select("series_key", "labels", "samples")
        .collect()
    )
    rows.sort(key=lambda r: r["series_key"])
    result = []
    for r in rows:
        at = [s for s in r["samples"] if s["ts"] <= time_ms]
        if at:  # sort_array ordered ascending — last is the most recent
            result.append(
                {
                    "metric": dict(r["labels"]),
                    "value": [int(time_ms), _fmt(at[-1]["value"])],
                }
            )
    return {"status": "success", "data": {"resultType": "vector", "result": result}}
