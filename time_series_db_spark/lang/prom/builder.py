"""PromQL AST → SeriesFrame builder.

Mirrors PromSourceBuilderVisitor.java: selectors become tag-filtered
fetches (matchers =, !=, =~, !~ — :273-299), rate/increase reuse the M3
per_second_rate stage (:155-173), aggregations reuse the M3 grouping
stages (:232-271). Where the reference throws "not yet implemented"
(FunctionType → :174-177, `without` → :258-260), this builder maps the
function onto the operator engine — SURVEY.md §2.2: "everything in
FunctionType is straightforward once M3QL windows exist".

Range-vector functions widen the fetch window backwards by the range
(the reference adjusts the scan window the same way,
PromSourceBuilderVisitor.java:69-77) and the result is truncated back to
[start, end) at the top, like the M3 planner's TruncateStage.
"""

from __future__ import annotations

from time_series_db_spark.lang.prom import ast as A
from time_series_db_spark.model import SeriesFrame
from time_series_db_spark.operators import grouping, mappers, ordering, windows


class PromUnsupportedError(NotImplementedError):
    pass


#: metric-name pseudo label (reference maps __name__/metric to the name
#: label — PromSourceBuilderVisitor.java buildQueryForFetch)
NAME_LABEL = "name"

_AGGS = {
    "sum": grouping.sum_,
    "avg": grouping.avg,
    "min": grouping.min_,
    "max": grouping.max_,
    "count": grouping.count_at_ts,
    "stddev": grouping.stddev,
    "stdvar": grouping.stdvar,
    "group": grouping.group_,
}

#: simple per-sample math functions → mapper stages
_MATH = {
    "abs": mappers.abs_,
    "ceil": mappers.ceil,
    "floor": mappers.floor,
    "sqrt": mappers.sqrt,
    "exp": mappers.exp,
    "ln": mappers.ln,
    "log2": mappers.log2,
    "log10": mappers.logarithm,
    "sgn": mappers.sgn,
}

#: trig/angle functions — FunctionType.{ACOS..TANH,DEG,RAD}
_TRIG = set(mappers._TRIG)

#: calendar/time-field functions over value-as-epoch-seconds
_TIME_FIELDS = {
    "day_of_month", "day_of_week", "day_of_year", "days_in_month",
    "hour", "minute", "month", "year",
}

_OVER_TIME = {
    "avg_over_time": "avg",
    "min_over_time": "min",
    "max_over_time": "max",
    "sum_over_time": "sum",
    "count_over_time": "count",
    "last_over_time": "last",
    "stddev_over_time": "stddev",
    "present_over_time": "present",
}

#: functions that consume a range vector (require selector[d] child)
_RANGE_FNS = (
    {"rate", "irate", "increase", "delta", "deriv", "changes", "resets",
     "quantile_over_time", "stdvar_over_time", "predict_linear",
     "holt_winters", "absent_over_time"}
    | set(_OVER_TIME)
)


class BuildContext:
    def __init__(self, source, start: int, end: int, step: int, profiler=None):
        self.source = source
        self.start = start
        self.end = end
        self.step = step
        #: lang.m3.builder.StageProfiler — the profile:true surface is
        #: shared by both REST actions (RestPromQLAction.java:232 threads
        #: params.profile exactly like RestM3QLAction)
        self.profiler = profiler
        self._fetch_cache: dict[str, SeriesFrame] = {}

    def fetch(self, node: A.VectorSelectorNode, buffer_ms: int) -> SeriesFrame:
        match: dict[str, list[str]] = {}
        inverse: dict[str, list[str]] = {}
        match_re: dict[str, list[str]] = {}
        inverse_re: dict[str, list[str]] = {}
        if node.metric:
            match.setdefault(NAME_LABEL, []).append(node.metric)
        for m in node.matchers:
            key = NAME_LABEL if m.name == "__name__" else m.name
            target = {
                A.EQUAL: match,
                A.NOT_EQUAL: inverse,
                A.REGEX_MATCH: match_re,
                A.REGEX_NOT_MATCH: inverse_re,
            }[m.op]
            target.setdefault(key, []).append(m.value)
        key = repr((sorted(match.items()), sorted(inverse.items()),
                    sorted(match_re.items()), sorted(inverse_re.items()),
                    buffer_ms))
        if key not in self._fetch_cache:
            sf = self.source.fetch(
                match, inverse,
                self.start - buffer_ms, self.end, self.step,
                match_re=match_re, inverse_re=inverse_re,
            )
            if self.profiler is not None:
                sf = self.profiler.record("fetch", sf)
            self._fetch_cache[key] = sf
        return self._fetch_cache[key]


def _range_child(node: A.FunctionCallNode) -> A.RangeVectorSelectorNode:
    """requireRangeVector — PromSourceBuilderVisitor.java:183-207."""
    if not node.children or not isinstance(
        node.children[0], A.RangeVectorSelectorNode
    ):
        raise A.PromParseError(
            f"{node.name}() requires a range vector with [duration]"
        )
    return node.children[0]


def build_frame(node: A.PromNode, ctx: BuildContext) -> SeriesFrame:
    out = _build_frame(node, ctx)
    if (
        ctx.profiler is not None
        and not isinstance(node, (A.RootNode, A.VectorSelectorNode))
    ):  # selectors are recorded (CSE-deduped) inside ctx.fetch
        out = ctx.profiler.record(_prom_stage_name(node), out)
    return out


def _prom_stage_name(node: A.PromNode) -> str:
    if isinstance(node, A.FunctionCallNode):
        return node.name
    if isinstance(node, A.AggregationNode):
        return node.agg_type
    n = type(node).__name__
    return n[: -len("Node")].lower() if n.endswith("Node") else n.lower()


def _build_frame(node: A.PromNode, ctx: BuildContext) -> SeriesFrame:
    if isinstance(node, A.RootNode):
        return build_frame(node.children[0], ctx)

    if isinstance(node, A.RangeVectorSelectorNode):
        # bare range selector (query 7): raw samples over the range window
        return ctx.fetch(node, 0)
    if isinstance(node, A.InstantVectorSelectorNode):
        return ctx.fetch(node, 0)

    if isinstance(node, A.AggregationNode):
        sf = build_frame(node.children[0], ctx)
        without = node.modifier == "without"
        if node.agg_type in ("topk", "bottomk"):
            return grouping.topk_bottomk(
                sf, int(node.param), node.labels, without=without,
                bottom=node.agg_type == "bottomk",
            )
        if node.agg_type == "quantile":
            return grouping.quantile(sf, node.param, node.labels, without=without)
        fn = _AGGS[node.agg_type]
        return fn(sf, node.labels, without=without)

    if isinstance(node, A.FunctionCallNode):
        return _apply_function(node, ctx)

    raise PromUnsupportedError(f"cannot build {type(node).__name__}")


def _apply_function(node: A.FunctionCallNode, ctx: BuildContext) -> SeriesFrame:
    name = node.name

    if name in _RANGE_FNS:
        sel = _range_child(node)
        sf = ctx.fetch(sel, sel.range_ms + ctx.step)
        r = sel.range_ms
        if name == "rate":
            # PerSecondRateStage(interval, 1000) — :155-164
            return windows.per_second_rate(sf, r, scale=1.0)
        if name == "increase":
            # PerSecondRateStage(interval, 1) — :165-173 (reference TODO
            # notes this is rate-shaped, not exact extrapolation)
            return windows.per_second_rate(sf, r, scale=0.001)
        if name == "irate":
            return windows.irate(sf)
        if name == "delta":
            return windows.delta_over_time(sf, r)
        if name == "deriv":
            return windows.deriv_over_time(sf, r)
        if name == "changes":
            return windows.changes_over_time(sf, r)
        if name == "resets":
            return windows.resets_over_time(sf, r)
        if name == "quantile_over_time":
            if not node.scalars:
                raise A.PromParseError("quantile_over_time needs φ scalar")
            return windows.quantile_over_time(sf, node.scalars[0], r)
        if name == "stdvar_over_time":
            return windows.stdvar_over_time(sf, r)
        if name == "predict_linear":
            if not node.scalars:
                raise A.PromParseError("predict_linear(v[d], t) needs t scalar")
            return windows.predict_linear(sf, r, node.scalars[0])
        if name == "holt_winters":
            if len(node.scalars) != 2:
                raise A.PromParseError("holt_winters(v[d], sf, tf) needs two scalars")
            return windows.holt_winters(sf, r, node.scalars[0], node.scalars[1])
        if name == "absent_over_time":
            return windows.absent_over_time(windows.truncate(sf, ctx.start, ctx.end), r)
        return windows.over_time(sf, r, _OVER_TIME[name])

    # zero-vector-argument functions
    if name in ("time", "pi", "vector"):
        return _dense_constant(node, ctx)

    if not node.children:
        raise PromUnsupportedError(f"{name}() is not supported")
    sf = build_frame(node.children[0], ctx)

    if name in _MATH:
        return _MATH[name](sf)
    if name in _TRIG:
        return mappers.trig(sf, name)
    if name in _TIME_FIELDS:
        return mappers.time_field(sf, name)
    if name == "timestamp":
        return mappers.timestamp_(sf)
    if name == "histogram_quantile":
        if not node.scalars:
            raise A.PromParseError("histogram_quantile(φ, v) needs φ scalar")
        return grouping.histogram_quantile(sf, node.scalars[0])
    if name == "absent":
        return _absent(sf, node, ctx)
    if name == "scalar":
        return _scalar(sf, ctx)
    if name == "round":
        return mappers.round_nearest(sf, node.scalars[0] if node.scalars else 1.0)
    if name == "clamp":
        if len(node.scalars) != 2:
            raise A.PromParseError("clamp(v, min, max) needs two scalars")
        return mappers.clamp(sf, node.scalars[0], node.scalars[1])
    if name == "clamp_min":
        return mappers.clamp_min(sf, node.scalars[0])
    if name == "clamp_max":
        return mappers.clamp_max(sf, node.scalars[0])
    if name == "sort":
        return ordering.sort(sf, "current", descending=False)
    if name == "sort_desc":
        return ordering.sort(sf, "current", descending=True)

    raise PromUnsupportedError(f"function {name}() is not yet implemented")


def _dense_frame(ctx: BuildContext, value_expr, labels: dict[str, str]):
    """Dense label-free grid series — backing for time()/pi()/vector(c)
    and the absent() result shape."""
    from pyspark.sql import functions as F

    from time_series_db_spark.model import SAMPLE_COLS, series_key_expr

    spark = ctx.source.spark
    df = spark.range(ctx.start, ctx.end, ctx.step).select(
        F.col("id").alias("ts")
    )
    lmap = (
        F.create_map(*[x for k in sorted(labels) for x in (F.lit(k), F.lit(labels[k]))])
        if labels
        else F.create_map().cast("map<string,string>")
    )
    df = (
        df.withColumn("labels", lmap)
        .withColumn("alias", F.lit(None).cast("string"))
        .withColumn("value", value_expr.cast("double"))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return SeriesFrame(df=df, step=ctx.step, min_ts=ctx.start, max_ts=ctx.end)


def _dense_constant(node: A.FunctionCallNode, ctx: BuildContext) -> SeriesFrame:
    """time() / pi() / vector(c) — scalar-producing functions; our scalars
    are label-free dense series (the engine is matrix-shaped throughout,
    like the reference's coordinator pipeline)."""
    import math

    from pyspark.sql import functions as F

    if node.name == "time":
        return _dense_frame(ctx, F.col("ts") / F.lit(1000.0), {})
    if node.name == "pi":
        return _dense_frame(ctx, F.lit(math.pi), {})
    # vector(c)
    if not node.scalars:
        raise A.PromParseError("vector(c) needs a scalar")
    return _dense_frame(ctx, F.lit(float(node.scalars[0])), {})


def _absent(sf: SeriesFrame, node: A.FunctionCallNode, ctx: BuildContext) -> SeriesFrame:
    """PromQL absent(v): empty when v has any series; else a single dense
    1-series labeled from the child selector's equality matchers —
    FunctionType.ABSENT. The emptiness probe is one count job over an
    already-pruned scan (the reference's fallbackSeries does the same
    list-size check at the coordinator, FallbackSeriesBinaryStage.java:34)."""
    from pyspark.sql import functions as F

    child = node.children[0]
    sel = child if isinstance(child, A.VectorSelectorNode) else None
    if sf.df.limit(1).count() > 0:
        return sf.with_df(sf.df.filter(F.lit(False)))
    labels: dict[str, str] = {}
    if sel is not None:
        if sel.metric:
            labels[NAME_LABEL] = sel.metric
        for m in sel.matchers:
            if m.op == A.EQUAL:
                labels[NAME_LABEL if m.name == "__name__" else m.name] = m.value
    return _dense_frame(ctx, F.lit(1.0), labels)


def _scalar(sf: SeriesFrame, ctx: BuildContext) -> SeriesFrame:
    """PromQL scalar(v): if v has exactly one series, its values as a
    label-free scalar series; else NaN — FunctionType.SCALAR."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from time_series_db_spark.model import SAMPLE_COLS, series_key_expr

    cached = sf.df.persist(StorageLevel.MEMORY_AND_DISK)
    n = cached.select("series_key").distinct().limit(2).count()
    if n != 1:
        cached.unpersist()
        return _dense_frame(ctx, F.lit(float("nan")), {})
    df = (
        cached.withColumn("labels", F.create_map().cast("map<string,string>"))
        .withColumn("alias", F.lit(None).cast("string"))
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def execute(
    query: str, source, start: int, end: int, step: int, profiler=None
) -> SeriesFrame:
    """Parse → build → truncate: the PromQL query_range lifecycle
    (RestPromQLAction → PromOSTranslator → execution)."""
    from time_series_db_spark.lang.prom.parser import parse

    ctx = BuildContext(source, start, end, step, profiler=profiler)
    sf = build_frame(parse(query), ctx)
    out = windows.truncate(sf, start, end)
    if profiler is not None:
        out = profiler.record("truncate", out)
    return out
