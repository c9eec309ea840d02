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
     "holt_winters", "double_exponential_smoothing", "absent_over_time",
     "mad_over_time", "ts_of_max_over_time", "ts_of_min_over_time",
     "ts_of_last_over_time"}
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
        self._expr_cache: dict[str, SeriesFrame] = {}
        self._expr_hits: dict[str, int] = {}

    def resolve_at(self, at: int | str | None) -> int | None:
        """``@`` instant → the grid-aligned evaluation timestamp:
        ``start()`` is the first, ``end()`` the last query-grid instant;
        a numeric timestamp floors onto the grid (our grids are
        epoch-aligned multiples of step)."""
        if at is None:
            return None
        if at == "start":
            t = self.start
        elif at == "end":
            t = self.end - 1
        else:
            t = int(at)
        return t - (t % self.step)

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
        offset = getattr(node, "offset_ms", 0)
        at_te = self.resolve_at(getattr(node, "at", None))
        key = repr((sorted(match.items()), sorted(inverse.items()),
                    sorted(match_re.items()), sorted(inverse_re.items()),
                    buffer_ms, offset, at_te))
        if key not in self._fetch_cache:
            # offset modifier: scan shifted back, timestamps shifted
            # forward onto the query grid (the m3 timeshift mechanism;
            # the reference grammar parses no modifiers at all).
            # @ modifier: widen the scan to cover the query range AND the
            # pinned instant — the pin picks the most recent emission at
            # or before the instant (see _pin_to_grid), so its lookback
            # must see the same history a normal selector would.
            lo, hi = self.start, self.end
            if at_te is not None:
                lo = min(lo, at_te)
                hi = max(hi, at_te + self.step)
            sf = self.source.fetch(
                match, inverse,
                lo - buffer_ms - offset, hi - offset, self.step,
                match_re=match_re, inverse_re=inverse_re,
            )
            if offset:
                sf = mappers.timeshift(sf, offset)
            if self.profiler is not None:
                sf = self.profiler.record("fetch", sf)
            self._fetch_cache[key] = sf
        # NOTE: deliberately NO execution-level persist here — a raw
        # fetch is a pushed-down scan, and pinning it behind a cache
        # barrier measurably LOSES (it blocks scan/codegen fusion; the
        # m3 side measured +18% trying it).  Execution-level CSE lives
        # one level up in build_frame, where the shared subtree is an
        # expensive computed pipeline worth materializing.
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
    # Subtree CSE: identical function-call / aggregation / subquery
    # subtrees (dataclass repr = full structural identity) build once;
    # on the SECOND request the shared frame is persisted under the
    # query's cache scope so `sum(rate(x[5m])) / count(rate(x[5m]))`
    # computes the rate pipeline once at execution time, not just at
    # plan-build time — the PromQL analog of the M3QL macro CSE.
    cacheable = isinstance(
        node, (A.FunctionCallNode, A.AggregationNode, A.SubqueryNode)
    )
    key = repr(node) if cacheable else None
    if key is not None and key in ctx._expr_cache:
        ctx._expr_hits[key] += 1
        if ctx._expr_hits[key] == 2:
            from dataclasses import replace as _replace

            from time_series_db_spark.cache import persist_tracked

            cached = ctx._expr_cache[key]
            ctx._expr_cache[key] = _replace(
                cached, df=persist_tracked(cached.df)
            )
        return ctx._expr_cache[key]
    out = _build_frame(node, ctx)
    if (
        ctx.profiler is not None
        and not isinstance(node, (A.RootNode, A.VectorSelectorNode))
    ):  # selectors are recorded (CSE-deduped) inside ctx.fetch
        out = ctx.profiler.record(_prom_stage_name(node), out)
    if key is not None:
        ctx._expr_cache[key] = out
        ctx._expr_hits[key] = 1
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
        sf = ctx.fetch(node, 0)
        if node.at is not None:
            return _pin_to_grid(sf, ctx.resolve_at(node.at), ctx)
        return sf

    if isinstance(node, A.SubqueryNode):
        # bare subquery: the inner evaluation at its own resolution, like
        # a bare range selector returns its raw window samples
        return _subquery_frame(node, ctx)

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
        if node.agg_type == "limitk":
            return grouping.limitk(
                sf, int(node.param), node.labels, without=without
            )
        if node.agg_type == "limit_ratio":
            return grouping.limit_ratio(
                sf, node.param, node.labels, without=without
            )
        if node.agg_type == "count_values":
            if not node.str_param:
                raise A.PromParseError(
                    'count_values("dst", v) needs the dst label string'
                )
            return grouping.count_values(
                sf, node.str_param, node.labels, without=without
            )
        fn = _AGGS[node.agg_type]
        return fn(sf, node.labels, without=without)

    if isinstance(node, A.FunctionCallNode):
        return _apply_function(node, ctx)

    if isinstance(node, A.BinaryExprNode):
        return _binary_expr(node, ctx)

    raise PromUnsupportedError(f"cannot build {type(node).__name__}")


# ---------------------------------------------------------------------------
# Binary operators — entirely beyond the reference (promql.jj:140 has no
# operator productions). Arithmetic + - * / % ^, comparisons (filter /
# bool), and set operators and/or/unless, with on()/ignoring() matching.
# ---------------------------------------------------------------------------

_ARITH = {
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
    "/": lambda l, r: l / r,
}
_CMP = {
    "==": lambda l, r: l == r,
    "!=": lambda l, r: l != r,
    ">": lambda l, r: l > r,
    "<": lambda l, r: l < r,
    ">=": lambda l, r: l >= r,
    "<=": lambda l, r: l <= r,
}


def _arith_col(op: str, l, r):
    """PromQL arithmetic on doubles. ``/`` and ``%`` need an explicit
    zero-denominator guard: Spark 4 runs in ANSI mode, where a bare
    ``l / r`` or ``l % r`` raises DIVIDE_BY_ZERO / REMAINDER_BY_ZERO at
    runtime, while PromQL follows Go float64 (IEEE-754): x/0 = ±Inf,
    0/0 = NaN, fmod(x, 0) = NaN.  CASE WHEN evaluates branches lazily,
    so the guarded divide never fires for zero denominators."""
    from pyspark.sql import functions as F

    if op == "%":
        return F.when(r == 0, F.lit(float("nan"))).otherwise(l % r)
    if op == "/":
        return F.when(
            r == 0,
            F.when(F.isnan(l) | (l == 0), F.lit(float("nan")))
            .when(l > 0, F.lit(float("inf")))
            .otherwise(F.lit(float("-inf"))),
        ).otherwise(l / r)
    if op == "^":
        return F.pow(l, r)
    if op == "atan2":
        # binary atan2 joins like arithmetic (vector matching applies);
        # Go math.Atan2 semantics match java.lang.Math.atan2 exactly
        return F.atan2(l, r)
    return _ARITH[op](l, r)


def _match_key_expr(node: A.BinaryExprNode):
    """Canonical match-key for vector matching: the on() labels, or all
    labels except ignoring() + the metric name (PromQL always excludes
    __name__ from matching)."""
    from pyspark.sql import functions as F

    from time_series_db_spark.model import series_key_expr

    lbl = F.col("labels")
    if node.matching == "on":
        keep = node.match_labels
        filtered = F.map_filter(
            lbl, lambda k, _v: k.isin(*keep) if keep else F.lit(False)
        )
    else:
        drop = [NAME_LABEL] + (
            node.match_labels if node.matching == "ignoring" else []
        )
        filtered = F.map_filter(lbl, lambda k, _v: ~k.isin(*drop))
    return series_key_expr(filtered)


def _drop_name(sf: SeriesFrame) -> SeriesFrame:
    """Arithmetic and bool-comparison results drop the metric name
    (PromQL drops __name__), recomputing series identity."""
    from pyspark.sql import functions as F

    from time_series_db_spark.model import SAMPLE_COLS, series_key_expr

    df = (
        sf.df.withColumn(
            "labels",
            F.map_filter(F.col("labels"), lambda k, _v: k != F.lit(NAME_LABEL)),
        )
        .withColumn("series_key", series_key_expr())
        .select(*SAMPLE_COLS)
    )
    return sf.with_df(df)


def _fold_scalar(node: A.PromNode) -> float | None:
    """Evaluate a pure-scalar subtree to its float value, None when the
    node is (or contains) a vector.  Prometheus types any expression
    over number literals as SCALAR no matter how deeply nested —
    ``v > bool 0.5 + 1`` is ``v > bool (0.5 + 1)`` and the right side
    must fold to 1.5 before the vector-scalar comparison, not be built
    as a vector (caught by the grammar fuzz, r6)."""
    import math

    if isinstance(node, A.NumberLiteralNode):
        return float(node.value)
    if not isinstance(node, A.BinaryExprNode):
        return None
    lv = _fold_scalar(node.children[0])
    rv = _fold_scalar(node.children[1])
    if lv is None or rv is None:
        return None
    op = node.op
    if op in _CMP:
        # Prometheus: "comparisons between scalars must use BOOL modifier"
        if not node.bool_modifier:
            raise PromUnsupportedError(
                "scalar comparison is not an instant vector "
                "(comparisons between scalars must use the bool modifier)"
            )
        py = {
            "==": lv == rv, "!=": lv != rv, ">": lv > rv,
            "<": lv < rv, ">=": lv >= rv, "<=": lv <= rv,
        }[op]
        return 1.0 if py else 0.0
    if op in ("and", "or", "unless"):
        raise PromUnsupportedError(f"set operator {op} requires vectors")

    def _div(a, b):  # Go float64: x/0 = ±Inf, 0/0 = NaN
        if b:
            return a / b
        return math.copysign(math.inf, a) if a else math.nan

    def _pow(a, b):
        # Go math.Pow semantics, where Python diverges: 0 ^ negative is
        # +Inf in Go but ValueError under math.pow; negative base with
        # fractional exponent is NaN in Go but ValueError here; huge
        # finite results overflow to an exception instead of ±Inf.
        if a == 0 and b < 0:
            return math.inf
        try:
            return math.pow(a, b)
        except ValueError:
            return math.nan
        except OverflowError:
            # overflow means |result| exceeded float64 → ±Inf; negative
            # only for a negative base raised to an odd integer
            neg = a < 0 and b == int(b) and int(b) % 2 == 1
            return -math.inf if neg else math.inf

    return {
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        "*": lambda a, b: a * b,
        "/": _div,
        "%": lambda a, b: math.fmod(a, b) if b else math.nan,
        "^": _pow,
        "atan2": math.atan2,
    }[op](lv, rv)


def _binary_expr(node: A.BinaryExprNode, ctx: BuildContext) -> SeriesFrame:
    from pyspark.sql import functions as F

    from time_series_db_spark.model import SAMPLE_COLS, labels_from_key_expr

    lhs, rhs = node.children
    l_val = _fold_scalar(lhs)
    r_val = _fold_scalar(rhs)
    l_lit = l_val is not None
    r_lit = r_val is not None
    if l_lit and r_lit:  # constant fold scalar-scalar
        if node.op in _CMP and not node.bool_modifier:
            raise PromUnsupportedError(
                "scalar comparison is not an instant vector"
            )
        val = _fold_scalar(node)
        raise PromUnsupportedError(
            f"bare scalar expression ({val}) is not an instant vector"
        )

    op = node.op
    if l_lit or r_lit:
        # vector ⊕ scalar / scalar ⊕ vector
        sf = build_frame(rhs if l_lit else lhs, ctx)
        lit = F.lit(l_val if l_lit else r_val)
        v = F.col("value")
        l, r = (lit, v) if l_lit else (v, lit)
        if op in ("and", "or", "unless"):
            raise PromUnsupportedError(f"set operator {op} requires vectors")
        if op in _CMP:
            if node.bool_modifier:
                flag = F.when(_CMP[op](l, r), 1.0).otherwise(0.0)
                out = sf.with_df(
                    sf.df.withColumn("value", flag).select(*SAMPLE_COLS)
                )
                return _drop_name(out)
            return sf.with_df(sf.df.filter(_CMP[op](l, r)))
        out = sf.with_df(
            sf.df.withColumn(
                "value", _arith_col(op, l, r).cast("double")
            ).select(*SAMPLE_COLS)
        )
        return _drop_name(out)

    left = build_frame(lhs, ctx)
    right = build_frame(rhs, ctx)
    mk = _match_key_expr(node)

    if op in ("and", "or", "unless"):
        lf = left.df.withColumn("__mk", mk)
        rk = right.df.withColumn("__mk", mk).select("__mk", "ts").distinct()
        if op == "and":  # left samples with a matching right at that ts
            df = lf.join(rk, on=["__mk", "ts"], how="left_semi")
            return left.with_df(df.select(*SAMPLE_COLS))
        if op == "unless":
            df = lf.join(rk, on=["__mk", "ts"], how="left_anti")
            return left.with_df(df.select(*SAMPLE_COLS))
        # or: all left + right samples with no matching left at that ts.
        # Project the left to the canonical columns BEFORE the union —
        # a sorted left still carries __order/__rorder, which the right
        # side never has (unionByName would fail to resolve them); the
        # set-op result's order is unspecified in Prometheus anyway and
        # with_df drops the stale order claim with the columns.
        lk = left.df.withColumn("__mk", mk).select("__mk", "ts").distinct()
        extra = (
            right.df.withColumn("__mk", mk)
            .join(lk, on=["__mk", "ts"], how="left_anti")
            .select(*SAMPLE_COLS)
        )
        return left.with_df(left.df.select(*SAMPLE_COLS).unionByName(extra))

    # arithmetic / comparison between vectors: equi-join on
    # (match key, ts). One-to-one dedups the right side; group_left /
    # group_right keep the many side row-per-row and dedupe the one
    # side. Series merging within a key is deterministic last-write-wins
    # (PromQL errors on many-to-many; we take the deterministic merge,
    # same stance as the m3 chain).
    if node.group is not None and op in _CMP:
        raise PromUnsupportedError(
            f"comparison with {node.group} is not supported"
        )
    group = node.group
    many, one = (right, left) if group == "group_right" else (left, right)
    mf = many.df.withColumn("__mk", mk)
    aggs = [F.expr("max_by(value, series_key)").alias("__ov")]
    if group is not None and node.group_labels:
        # group_left(l1, ...) include list: carry the winning one-side
        # series' label map so the listed labels can be copied over
        aggs.append(F.expr("max_by(labels, series_key)").alias("__olab"))
    of = one.df.withColumn("__mk", mk).groupBy("__mk", "ts").agg(*aggs)
    joined = mf.join(of, on=["__mk", "ts"], how="inner")
    l_col = F.col("__ov") if group == "group_right" else F.col("value")
    r_col = F.col("value") if group == "group_right" else F.col("__ov")
    if op in _CMP:
        if node.bool_modifier:
            flag = F.when(_CMP[op](l_col, r_col), 1.0).otherwise(0.0)
            df = joined.withColumn("value", flag).select(*SAMPLE_COLS)
            return _drop_name(left.with_df(df))
        # filter: keep left samples (full identity, name included)
        df = joined.filter(_CMP[op](l_col, r_col)).select(*SAMPLE_COLS)
        return left.with_df(df)
    value = _arith_col(op, l_col, r_col).cast("double")
    if group is not None:
        # many-to-one: result identity = the many side's labels (name
        # dropped, Prometheus group_left/group_right result labels),
        # plus the include-list labels copied from the one side —
        # Prometheus drops the listed labels from the many side and
        # takes the one side's values where present
        df = joined.withColumn("value", value)
        if node.group_labels:
            incl = node.group_labels
            df = df.withColumn(
                "labels",
                F.map_concat(
                    F.map_filter(
                        F.col("labels"), lambda k, _v: ~k.isin(*incl)
                    ),
                    F.map_filter(
                        F.col("__olab"), lambda k, _v: k.isin(*incl)
                    ),
                ),
            )
        return _drop_name(many.with_df(df.select(*SAMPLE_COLS)))
    # one-to-one: result identity = the match-key labels (name dropped;
    # with on(), exactly the on() set — PromQL one-to-one result labels)
    df = (
        joined.withColumn("value", value)
        .withColumn("series_key", F.col("__mk"))
        .withColumn("labels", labels_from_key_expr(F.col("__mk")))
        .select(*SAMPLE_COLS)
    )
    return left.with_df(df)


def _subquery_frame(sub: A.SubqueryNode, ctx: BuildContext) -> SeriesFrame:
    """Evaluate a subquery's inner expression at its own resolution over
    the query window extended back by the subquery range — the frame IS
    the range vector (sparse samples on the finer grid), exactly like a
    buffered fetch is for ``selector[d]``.

    v1 restriction: the inner step must divide the query step (both
    grids are epoch-aligned, so the outer evaluation instants are then a
    subset of the inner grid and re-gridding is a filter). Prometheus
    evaluates at arbitrary instants via its lookback rule; a
    non-dividing step raises rather than silently mis-gridding."""
    step2 = sub.step_ms or ctx.step
    if ctx.step % step2 != 0:
        raise PromUnsupportedError(
            f"subquery step {step2}ms must divide the query step "
            f"{ctx.step}ms (both grids are epoch-aligned)"
        )
    if sub.offset_ms % step2 != 0:
        # a non-multiple shift would slide the inner grid off the outer
        # instants and the re-grid filter would silently drop everything
        raise PromUnsupportedError(
            f"subquery offset {sub.offset_ms}ms must be a multiple of "
            f"the subquery step {step2}ms"
        )
    inner = BuildContext(
        ctx.source,
        ctx.start - sub.range_ms - sub.offset_ms,
        ctx.end - sub.offset_ms,
        step2,
        profiler=ctx.profiler,
    )
    sf = build_frame(sub.children[0], inner)
    if sub.offset_ms:
        sf = mappers.timeshift(sf, sub.offset_ms)
    return sf


def _regrid(sf: SeriesFrame, ctx: BuildContext) -> SeriesFrame:
    """Keep only the outer evaluation instants of a subquery result
    (inner grid ⊇ outer grid — enforced in :func:`_subquery_frame`) and
    restore the query step."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    df = sf.df.filter(F.col("ts") % F.lit(ctx.step) == 0)
    return replace(sf, df=df, step=ctx.step)


def _pin_to_grid(sf: SeriesFrame, te: int, ctx: BuildContext) -> SeriesFrame:
    """``@`` emission: each series' value at the pinned instant, repeated
    at every query-grid step — a Prometheus range query of ``m @ t`` is a
    constant line. "At the instant" uses the engine's grid semantics:
    the series' most recent emission at or before ``te`` inside the
    fetched window (the Prometheus-lookback analog — sparse series have
    no sample exactly on the instant). One series-count aggregate then a
    bounded grid explode."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from time_series_db_spark.model import SAMPLE_COLS

    pinned = (
        sf.df.filter(F.col("ts") <= F.lit(int(te)))
        .groupBy("series_key")
        .agg(F.expr("max_by(struct(labels, alias, value), ts)").alias("__s"))
        .select(
            "series_key",
            F.col("__s.labels").alias("labels"),
            F.col("__s.alias").alias("alias"),
            F.col("__s.value").alias("value"),
        )
    )
    lo = ctx.start - (ctx.start % ctx.step)
    if lo < ctx.start:
        lo += ctx.step
    hi = (ctx.end - 1) - ((ctx.end - 1) % ctx.step)
    df = pinned.select(
        "series_key", "labels", "alias",
        F.explode(
            F.sequence(F.lit(lo), F.lit(hi), F.lit(ctx.step))
        ).alias("ts"),
        "value",
    ).select(*SAMPLE_COLS)
    return replace(sf, df=df, step=ctx.step, min_ts=ctx.start, max_ts=ctx.end)


def _apply_function(node: A.FunctionCallNode, ctx: BuildContext) -> SeriesFrame:
    """Typed error boundary: branches below index ``node.scalars`` /
    ``node.str_args`` for function arguments; a missing argument must
    surface as :class:`PromParseError` (Prometheus returns bad_data),
    never a raw IndexError — the r7 fuzz caught ``clamp_max(v)``
    escaping exactly that way."""
    try:
        return _apply_function_inner(node, ctx)
    except (A.PromParseError, PromUnsupportedError):
        raise
    except (IndexError, KeyError, TypeError, ValueError) as e:
        raise A.PromParseError(
            f"invalid arguments for {node.name}() "
            f"({type(e).__name__}: {e})"
        ) from e


def _apply_function_inner(
    node: A.FunctionCallNode, ctx: BuildContext
) -> SeriesFrame:
    name = node.name

    if name in _RANGE_FNS:
        child = node.children[0] if node.children else None
        if isinstance(child, A.SubqueryNode):
            sf = _subquery_frame(child, ctx)
            out = _apply_range_fn(node, sf, child.range_ms, ctx)
            return _regrid(out, ctx)
        sel = _range_child(node)
        sf = ctx.fetch(sel, sel.range_ms + ctx.step)
        out = _apply_range_fn(node, sf, sel.range_ms, ctx)
        if sel.at is not None:
            # @ on the range vector: the function's value at the pinned
            # instant, emitted at every query-grid step
            out = _pin_to_grid(out, ctx.resolve_at(sel.at), ctx)
        return out
    return _apply_instant_fn(node, ctx)


def _apply_range_fn(
    node: A.FunctionCallNode, sf: SeriesFrame, r: int, ctx: BuildContext
) -> SeriesFrame:
    name = node.name
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
    if name in ("holt_winters", "double_exponential_smoothing"):
        # double_exponential_smoothing is the Prometheus 3 rename of
        # holt_winters (same level/trend recurrence, same two scalars)
        if len(node.scalars) != 2:
            raise A.PromParseError(f"{name}(v[d], sf, tf) needs two scalars")
        return windows.holt_winters(sf, r, node.scalars[0], node.scalars[1])
    if name == "mad_over_time":
        return windows.mad_over_time(sf, r)
    if name in (
        "ts_of_max_over_time", "ts_of_min_over_time", "ts_of_last_over_time"
    ):
        return windows.ts_of_over_time(
            sf, r, name[len("ts_of_"):-len("_over_time")]
        )
    if name == "absent_over_time":
        return windows.absent_over_time(windows.truncate(sf, ctx.start, ctx.end), r)
    return windows.over_time(sf, r, _OVER_TIME[name])


def _apply_instant_fn(node: A.FunctionCallNode, ctx: BuildContext) -> SeriesFrame:
    name = node.name

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
    if name == "histogram_fraction":
        if len(node.scalars) != 2:
            raise A.PromParseError(
                "histogram_fraction(lower, upper, v) needs two scalars"
            )
        return grouping.histogram_fraction(sf, node.scalars[0], node.scalars[1])
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
    if name in ("sort_by_label", "sort_by_label_desc"):
        # Prometheus 3.x experimental: order series by label VALUES
        if not node.strings:
            raise A.PromParseError(f"{name}(v, label, ...) needs label names")
        return ordering.sort_by_label(
            sf, node.strings, descending=name.endswith("_desc")
        )
    if name == "label_replace":
        if len(node.strings) != 4:
            raise A.PromParseError(
                "label_replace(v, dst, replacement, src, regex) "
                "needs four string arguments"
            )
        from time_series_db_spark.operators import labels as labels_ops

        dst, repl, src, regex = node.strings
        return labels_ops.label_replace(sf, dst, repl, src, regex)
    if name == "label_join":
        if len(node.strings) < 2:
            raise A.PromParseError(
                "label_join(v, dst, sep, src...) needs dst and separator"
            )
        from time_series_db_spark.operators import labels as labels_ops

        dst, sep, *srcs = node.strings
        return labels_ops.label_join(sf, dst, sep, srcs)

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
    from pyspark.sql import functions as F

    from time_series_db_spark.cache import persist_tracked
    from time_series_db_spark.model import SAMPLE_COLS, series_key_expr

    cached = persist_tracked(sf.df)
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
    (RestPromQLAction → PromOSTranslator → execution).

    Outer typed-error boundary (in addition to _apply_function's):
    aggregation params and binary composition coerce arguments outside
    the function dispatch — the r7 fuzz found ``topk(Inf, v)`` escaping
    as OverflowError and limitk/limit_ratio validation as bare
    ValueError.  Anything non-typed becomes PromParseError (Prometheus
    bad_data), never a stack trace at the service boundary."""
    from time_series_db_spark.lang.prom.parser import parse

    ctx = BuildContext(source, start, end, step, profiler=profiler)
    try:
        sf = build_frame(parse(query), ctx)
    except (A.PromParseError, PromUnsupportedError):
        raise
    except (ValueError, IndexError, KeyError, TypeError, OverflowError) as e:
        raise A.PromParseError(
            f"invalid query arguments ({type(e).__name__}: {e})"
        ) from e
    out = windows.truncate(sf, start, end)
    if profiler is not None:
        out = profiler.record("truncate", out)
    return out
