"""M3QL logical plan: nodes, factory, AST→plan converter.

Port of plan/M3ASTConverter.java + M3PlanNodeFactory.java + the
plan/nodes/*.java explain formats. The converter walks a pipeline
left-to-right maintaining (result_chain, dangling_chain) exactly like
the reference: a mid-pipeline fetch/group UNIONs with the accumulated
chain; binary functions take the accumulated chain as LHS and their
pipeline argument as RHS; ``ChainBoundaryMarker`` tracks where a new
chain began so stages stack onto the right branch.

Explain dumps byte-match the golden corpus (lang/m3/data/plan/*.txt),
including Java's HashMap iteration order for fetch filter maps
(javafmt.java_hashmap_order).
"""

from __future__ import annotations

from time_series_db_spark.lang.m3 import ast
from time_series_db_spark.lang.m3.javafmt import (
    java_double_str,
    java_float_str,
    java_map_str,
)

# ---------------------------------------------------------------------------
# surface-name tables (common/Constants.java)
# ---------------------------------------------------------------------------

AGG_TYPES = {
    "avg": "AVG", "average": "AVG", "averageSeries": "AVG",
    "count": "COUNT",
    "max": "MAX", "maximum": "MAX", "maxSeries": "MAX",
    "min": "MIN", "minimum": "MIN", "minSeries": "MIN",
    "multiply": "MULTIPLY", "multiplySeries": "MULTIPLY",
    "sum": "SUM", "sumSeries": "SUM",
    "range": "RANGE", "rangeOfSeries": "RANGE",
    # beyond the reference: in its known-but-unimplemented list
    # (common/Constants.java:69 — parser accepts, planner rejects)
    "stdev": "STDDEV",
}

WINDOW_AGG_TYPES = {
    "avg": "AVG", "average": "AVG",
    "max": "MAX", "maximum": "MAX",
    "median": "MEDIAN",
    "min": "MIN", "minimum": "MIN",
    "sum": "SUM",
}

#: summarize additionally admits last/stddev/count and pN percentiles
SUMMARIZE_AGG_TYPES = dict(
    WINDOW_AGG_TYPES, last="LAST", stddev="STDDEV", count="COUNT"
)

VALUE_FILTER_OPS = {
    "eq": "EQ", "==": "EQ",
    "ne": "NE", "!=": "NE",
    "ge": "GE", ">=": "GE", "removeBelowValue": "GE",
    "gt": "GT", ">": "GT",
    "le": "LE", "<=": "LE", "removeAboveValue": "LE",
    "lt": "LT", "<": "LT",
}

SORT_BY = {
    "avg": "avg", "average": "avg",
    "current": "current",
    "max": "max", "maximum": "max",
    "min": "min", "minimum": "min",
    "stddev": "stddev",
    "sum": "sum",
    "name": "name",
}

SORT_ORDER = {"asc": "asc", "ascending": "asc", "desc": "desc", "descending": "desc"}

MOVING_FN_AGG = {
    "movingAverage": "AVG",
    "movingMax": "MAX",
    "movingMedian": "MEDIAN",
    "movingMin": "MIN",
    "movingSum": "SUM",
}

BINARY_FNS = {
    "asPercent", "ratio", "diff", "subtract", "divide", "divideSeries", "intersect",
}


class M3PlanError(ValueError):
    pass


def parse_duration_ms(spec: str) -> int:
    """M3 duration literal ("10s", "5m", "3h", "1d", "2w") → millis."""
    units = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
             "d": 86_400_000, "w": 604_800_000}
    for suffix in ("ms", "w", "d", "h", "m", "s"):
        if spec.endswith(suffix):
            return int(float(spec[: -len(suffix)]) * units[suffix])
    raise M3PlanError(f"invalid duration: {spec!r}")


# ---------------------------------------------------------------------------
# plan nodes
# ---------------------------------------------------------------------------


class PlanNode:
    def __init__(self) -> None:
        self.children: list[PlanNode] = []

    def add(self, child: "PlanNode") -> None:
        self.children.append(child)

    def explain(self) -> str:
        raise NotImplementedError

    def dump(self, depth: int = 0) -> str:
        out = ["  " * depth + self.explain()]
        for c in self.children:
            out.append(c.dump(depth + 1))
        return "\n".join(out)


class _Simple(PlanNode):
    NAME = ""

    def explain(self) -> str:
        return self.NAME


class FetchNode(PlanNode):
    def __init__(self, match: dict[str, list[str]], inverse: dict[str, list[str]]):
        super().__init__()
        self.match = match
        self.inverse = inverse

    def explain(self) -> str:
        return f"FETCH({java_map_str(self.match)}, !{java_map_str(self.inverse)})"


class MockFetchNode(PlanNode):
    def __init__(self, values: list[float], tags: dict[str, str]):
        super().__init__()
        self.values = values
        self.tags = tags

    def explain(self) -> str:
        vals = "[" + ", ".join(java_double_str(v) for v in self.values) + "]"
        return f"MOCK_FETCH(values={vals}, tags={java_map_str(self.tags)})"


class UnionNode(_Simple):
    NAME = "UNION"


class AggregationNode(PlanNode):
    def __init__(self, agg_type: str, tags: list[str]):
        super().__init__()
        self.agg_type = agg_type
        self.tags = tags

    def explain(self) -> str:
        return f"AGG({self.agg_type}, groupBy=[{', '.join(self.tags)}])"


class BinaryNode(PlanNode):
    """asPercent / diff / divide / intersect / fallbackSeries(pipeline)."""

    def __init__(self, kind: str, tags: list[str], keep_nans: bool = False):
        super().__init__()
        self.kind = kind
        self.tags = tags
        self.keep_nans = keep_nans

    def explain(self) -> str:
        t = "[" + ", ".join(self.tags) + "]"
        if self.kind == "asPercent":
            return f"AS_PERCENT(groupBy={t})"
        if self.kind == "diff":
            return f"DIFF(keepNans={str(self.keep_nans).lower()},groupBy={t})"
        if self.kind == "divide":
            return f"DIVIDE_SERIES(groupBy={t})"
        if self.kind == "intersect":
            return f"INTERSECT(tags={t})"
        if self.kind == "fallbackSeries":
            return "FALLBACK_SERIES"
        if self.kind == "setDiff":
            return f"SET_DIFF(tags={t})"
        raise AssertionError(self.kind)  # pragma: no cover


class MapperNode(PlanNode):
    """abs / log / sqrt / scale / divideScalar / offset / round /
    scaleToSeconds / timeshift — single-param per-sample stages."""

    def __init__(self, kind: str, param: float | str | None = None):
        super().__init__()
        self.kind = kind
        self.param = param

    def explain(self) -> str:
        k, p = self.kind, self.param
        if k == "abs":
            return "ABS"
        if k == "logarithm":
            return "LOGARITHM"
        if k == "sqrt":
            return "SQRT"
        if k == "scale":
            return f"SCALE({java_double_str(p)})"
        if k == "divideScalar":
            return f"DIVIDE_SCALAR({java_double_str(p)})"
        if k == "offset":
            return f"OFFSET({java_double_str(p)})"
        if k == "round":
            return f"ROUND({java_double_str(p)})"
        if k == "scaleToSeconds":
            return f"SCALE_TO_SECONDS({p:.6f})"
        if k == "timeshift":
            return f"TIMESHIFT({p})"
        raise AssertionError(k)  # pragma: no cover


class ValueFilterNode(PlanNode):
    def __init__(self, op: str, value: float):
        super().__init__()
        self.op = op
        self.value = value

    def explain(self) -> str:
        return f"VALUE_FILTER({self.op}, {java_double_str(self.value)})"


class WhereNode(PlanNode):
    def __init__(self, left_tag: str, op: str, right_tag: str):
        super().__init__()
        self.left_tag = left_tag
        self.op = op
        self.right_tag = right_tag

    def explain(self) -> str:
        return f"WHERE({self.left_tag} {self.op} {self.right_tag})"


class TagCompareNode(PlanNode):
    def __init__(self, op: str, tag: str, value: str):
        super().__init__()
        self.op = op
        self.tag = tag
        self.value = value

    def explain(self) -> str:
        return f"TAG_COMPARE(op={self.op},tag={self.tag},value={self.value})"


class ExcludeByTagNode(PlanNode):
    def __init__(self, tag: str, patterns: list[str]):
        super().__init__()
        self.tag = tag
        self.patterns = patterns

    def explain(self) -> str:
        return f"EXCLUDE_BY_TAG(tag={self.tag},patterns={', '.join(self.patterns)})"


class RemoveEmptyNode(_Simple):
    NAME = "REMOVE_EMPTY"


class SustainNode(PlanNode):
    def __init__(self, duration: str):
        super().__init__()
        self.duration = duration

    def explain(self) -> str:
        return f"SUSTAIN({self.duration})"


class IsNonNullNode(_Simple):
    NAME = "IS_NON_NULL"


class MovingNode(PlanNode):
    def __init__(self, window: str, agg: str):
        super().__init__()
        self.window = window
        self.agg = agg

    def explain(self) -> str:
        return f"MOVING({self.window}, {self.agg})"


class MovingPercentileNode(PlanNode):
    """Beyond the reference: trailing-window exact percentile — the
    arbitrary-φ generalization of ``moving … median`` (p95 latency)."""

    def __init__(self, window: str, p: float):
        super().__init__()
        self.window = window
        self.p = p

    def explain(self) -> str:
        return f"MOVING_PERCENTILE({self.window}, {self.p})"


class SummarizeNode(PlanNode):
    def __init__(self, interval: str, fn: str, align_to_from: bool):
        super().__init__()
        self.interval = interval
        self.fn = fn
        self.align_to_from = align_to_from

    def explain(self) -> str:
        return (
            f"SUMMARIZE({self.interval}, {self.fn}, "
            f"{str(self.align_to_from).lower()})"
        )


class DerivativeNode(_Simple):
    NAME = "DERIVATIVE"


class PerSecondNode(_Simple):
    NAME = "PER_SECOND"


class PerSecondRateNode(PlanNode):
    def __init__(self, interval: str):
        super().__init__()
        self.interval = interval

    def explain(self) -> str:
        return f"PER_SECOND_RATE({self.interval})"


class IntegralNode(PlanNode):
    def __init__(self, reset_on_null: bool):
        super().__init__()
        self.reset_on_null = reset_on_null

    def explain(self) -> str:
        return f"INTEGRAL(resetOnNull={str(self.reset_on_null).lower()})"


class ChangedNode(_Simple):
    NAME = "CHANGED"


class NonNegativeDerivativeNode(_Simple):
    """Beyond the reference (Constants.java:62): derivative with negative
    deltas (counter wraps) removed — Graphite nonNegativeDerivative."""

    NAME = "NON_NEGATIVE_DERIVATIVE"


class RemovePercentileNode(PlanNode):
    """Beyond the reference (Constants.java:65-66): drop samples above /
    below each series' own Nth percentile."""

    def __init__(self, n: float, above: bool):
        super().__init__()
        self.n = n
        self.above = above

    def explain(self) -> str:
        side = "ABOVE" if self.above else "BELOW"
        return f"REMOVE_{side}_PERCENTILE(n={self.n})"


class SustainedFilterNode(PlanNode):
    """Beyond the reference (Constants.java:70-71 sustainedAbove/Below):
    value filter + sustain composition — "above threshold continuously
    for ≥ duration", the exact pairing SustainStage's javadoc describes."""

    def __init__(self, threshold: float, duration: str, above: bool):
        super().__init__()
        self.threshold = threshold
        self.duration = duration
        self.above = above

    def explain(self) -> str:
        side = "ABOVE" if self.above else "BELOW"
        return f"SUSTAINED_{side}(threshold={self.threshold},duration={self.duration})"


class NPercentileNode(PlanNode):
    """Beyond the reference (Constants.java:63): flat line per series at
    its own Nth percentile (Graphite nPercentile)."""

    def __init__(self, n: float):
        super().__init__()
        self.n = n

    def explain(self) -> str:
        return f"N_PERCENTILE(n={self.n})"


class ConstantLineNode(PlanNode):
    """Beyond the reference (Constants.java:55): a synthetic constant
    series over the query grid (Graphite constantLine) — a generator
    leaf, like mockFetch."""

    def __init__(self, value: float):
        super().__init__()
        self.value = value

    def explain(self) -> str:
        return f"CONSTANT_LINE(value={java_double_str(self.value)})"


class BurnRateNode(PlanNode):
    """burnRate — beyond-reference SLO primitive (documented chosen
    semantics, the standard multi-window burn-rate construction):
    ``errors | burnRate <window> <slo> (total-pipeline)`` =
    ``(perSecondRate(errors, window) / perSecondRate(total, window))
    / (1 − slo)`` — i.e. the observed error ratio over the window as a
    multiple of the SLO error budget; 1.0 burns the budget exactly over
    the SLO period, >1 burns faster.  Children: [errors, total]."""

    def __init__(self, window: str, slo: float):
        super().__init__()
        self.window = window
        self.slo = slo

    def explain(self) -> str:
        return (
            f"BURN_RATE(window={self.window}, "
            f"slo={java_double_str(self.slo)})"
        )


class MultiBurnRateNode(PlanNode):
    """multiBurnRate — beyond-reference SLO primitive
    (known-but-unimplemented name, Constants.java:61; documented chosen
    semantics, the SRE-workbook multi-window construction):
    ``errors | multiBurnRate <slo> <w1> <w2>… (total-pipeline)`` = the
    union of the :class:`BurnRateNode` result at each window, each
    output series tagged ``window:<w>``.  Children: [errors, total]."""

    def __init__(self, windows: list[str], slo: float):
        super().__init__()
        self.windows = windows
        self.slo = slo

    def explain(self) -> str:
        return (
            f"MULTI_BURN_RATE(windows={','.join(self.windows)}, "
            f"slo={java_double_str(self.slo)})"
        )


class AsMultiBurnRateNode(PlanNode):
    """asMultiBurnRate — beyond-reference (Constants.java:50; documented
    chosen semantics): input is an already-computed error-ratio series;
    for each window the ratio is smoothed with a moving average over that
    window and scaled by 1/(1−slo), union'd with a ``window:<w>`` tag —
    the multi-window burn view of a precomputed ratio."""

    def __init__(self, windows: list[str], slo: float):
        super().__init__()
        self.windows = windows
        self.slo = slo

    def explain(self) -> str:
        return (
            f"AS_MULTI_BURN_RATE(windows={','.join(self.windows)}, "
            f"slo={java_double_str(self.slo)})"
        )


class DivideWhenNode(PlanNode):
    """divideWhen — known-but-unimplemented (Constants.java:53);
    documented chosen semantics in operators.binary.divide_when: divide
    where the matched denominator passes ``<op> <threshold>``, pass the
    numerator through unchanged elsewhere. Children: [lhs, rhs]."""

    def __init__(self, op: str, threshold: float, keys: list[str]):
        super().__init__()
        self.op = op
        self.threshold = threshold
        self.keys = keys

    def explain(self) -> str:
        return (
            f"DIVIDE_WHEN(op={self.op.upper()}, "
            f"threshold={java_double_str(self.threshold)}, "
            f"keys=[{','.join(self.keys)}])"
        )


class TimestampNode(_Simple):
    """timestamp — known-but-unimplemented (Constants.java:73); Graphite/
    PromQL ``timestamp()`` semantics: value := the sample's own timestamp
    in epoch seconds."""

    def explain(self) -> str:
        return "TIMESTAMP()"


class HistogramCDFNode(PlanNode):
    """histogramCDF — known-but-unimplemented (Constants.java:56); the
    dual of histogramPercentile (documented in operators.grouping
    .histogram_cdf)."""

    def __init__(self, bucket_id: str, bucket_range: str, thresholds: list[float]):
        super().__init__()
        self.bucket_id = bucket_id
        self.bucket_range = bucket_range
        self.thresholds = thresholds

    def explain(self) -> str:
        ts = ",".join(java_double_str(t) for t in self.thresholds)
        return (
            f"HISTOGRAM_CDF(bucketId={self.bucket_id}, "
            f"bucketRange={self.bucket_range}, thresholds=[{ts}])"
        )


class ToHistogramNode(PlanNode):
    """toHistogram — known-but-unimplemented (Constants.java:75);
    explicit-bounds companion of toHistogramLinearBuckets."""

    def __init__(self, bounds: list[float]):
        super().__init__()
        self.bounds = bounds

    def explain(self) -> str:
        bs = ",".join(java_double_str(b) for b in self.bounds)
        return f"TO_HISTOGRAM(bounds=[{bs}])"


class AliasByBucketNode(PlanNode):
    """aliasByBucket / aliasByHistogramBucket — known-but-unimplemented
    (Constants.java:47-48); semantics in operators.labels.alias_by_bucket."""

    def __init__(self, bucket_range: str, histogram: bool):
        super().__init__()
        self.bucket_range = bucket_range
        self.histogram = histogram

    def explain(self) -> str:
        kind = "ALIAS_BY_HISTOGRAM_BUCKET" if self.histogram else "ALIAS_BY_BUCKET"
        return f"{kind}(bucketRange={self.bucket_range})"


class AliasByDistinctTagsNode(_Simple):
    """aliasByDistinctTags — known-but-unimplemented (Constants.java:46);
    semantics in operators.labels.alias_by_distinct_tags."""

    def explain(self) -> str:
        return "ALIAS_BY_DISTINCT_TAGS()"


class ShowAnomalyThresholdsNode(PlanNode):
    """showAnomalyThresholds — known-but-unimplemented (Constants.java:70);
    companion of AnomaliesNode (operators.windows.show_anomaly_thresholds)."""

    def __init__(self, threshold: float):
        super().__init__()
        self.threshold = threshold

    def explain(self) -> str:
        return f"SHOW_ANOMALY_THRESHOLDS(threshold={java_double_str(self.threshold)})"


class SummarizeByNode(PlanNode):
    """_summarizeBy — known-but-unimplemented (Constants.java:41);
    documented chosen semantics: collapse series to the given tags with
    the aggregation (AbstractGroupingStage semantics), then summarize the
    grouped series in time with the same function over the interval —
    COUNT uses SUM in the time dimension (per-step series counts add up
    to sample counts per bucket)."""

    def __init__(self, interval: str, fn: str, tags: list[str]):
        super().__init__()
        self.interval = interval
        self.fn = fn
        self.tags = tags

    def explain(self) -> str:
        return (
            f"SUMMARIZE_BY(interval={self.interval}, fn={self.fn}, "
            f"tags=[{','.join(self.tags)}])"
        )


class MockFetchLineNode(PlanNode):
    """mockFetchLine — reference known-but-unimplemented name
    (Constants.java:58); documented chosen semantics: a flat generated
    series, ``value`` at every grid step (the generator-variant family
    of MockFetchStage.java:40)."""

    def __init__(self, value: float, tags: dict[str, str]):
        super().__init__()
        self.value = value
        self.tags = tags

    def explain(self) -> str:
        return (
            f"MOCK_FETCH_LINE(value={java_double_str(self.value)}, "
            f"tags={java_map_str(self.tags)})"
        )


class MockFetchLinearNode(PlanNode):
    """mockFetchLinear — reference known-but-unimplemented name
    (Constants.java:59); documented chosen semantics: ``start + slope·i``
    at grid step i."""

    def __init__(self, start: float, slope: float, tags: dict[str, str]):
        super().__init__()
        self.start = start
        self.slope = slope
        self.tags = tags

    def explain(self) -> str:
        return (
            f"MOCK_FETCH_LINEAR(start={java_double_str(self.start)}, "
            f"slope={java_double_str(self.slope)}, "
            f"tags={java_map_str(self.tags)})"
        )


class MockFetchPeriodicNode(PlanNode):
    """mockFetchPeriodic — reference known-but-unimplemented name
    (Constants.java:60); documented chosen semantics:
    ``amplitude · sin(2π·(i·step)/period)`` at grid step i."""

    def __init__(self, amplitude: float, period: str, tags: dict[str, str]):
        super().__init__()
        self.amplitude = amplitude
        self.period = period
        self.tags = tags

    def explain(self) -> str:
        return (
            f"MOCK_FETCH_PERIODIC(amplitude={java_double_str(self.amplitude)}, "
            f"period={self.period}, tags={java_map_str(self.tags)})"
        )


class TopKPerTimestampNode(PlanNode):
    """Beyond the reference (Constants.java:44 _topKPerTimestamp): keep
    the k largest values at each timestamp across series."""

    def __init__(self, k: int):
        super().__init__()
        self.k = k

    def explain(self) -> str:
        return f"TOP_K_PER_TIMESTAMP(k={self.k})"


class TagAddNode(PlanNode):
    """Beyond the reference (Constants.java:42 _tagAdd): set a tag on
    every series, recomputing series identity."""

    def __init__(self, key: str, value: str):
        super().__init__()
        self.key = key
        self.value = value

    def explain(self) -> str:
        return f"TAG_ADD({self.key}={self.value})"


class ToHistogramLinearBucketsNode(PlanNode):
    """Beyond the reference (Constants.java:76): per-timestamp linear
    bucket counts in the histogramPercentile bucket-series format."""

    def __init__(self, start: float, width: float, count: int):
        super().__init__()
        self.start = start
        self.width = width
        self.count = count

    def explain(self) -> str:
        return (
            f"TO_HISTOGRAM_LINEAR_BUCKETS(start={self.start},"
            f"width={self.width},count={self.count})"
        )


class AnomaliesNode(PlanNode):
    """Beyond the reference (Constants.java:48): z-score outlier flag per
    sample against the series' own window distribution."""

    def __init__(self, threshold: float = 3.0):
        super().__init__()
        self.threshold = threshold

    def explain(self) -> str:
        return f"ANOMALIES(threshold={self.threshold})"


class ChangepointsNode(PlanNode):
    """Beyond the reference: two-sided CUSUM mean-shift flags (Page
    1954) — cumulative-evidence detection of persistent level shifts
    the per-sample z-score of ``anomalies`` never trips on."""

    def __init__(self, threshold: float = 5.0, slack: float = 0.5):
        super().__init__()
        self.threshold = threshold
        self.slack = slack

    def explain(self) -> str:
        return (
            f"CHANGEPOINTS(threshold={self.threshold}, slack={self.slack})"
        )


class DecimateNode(PlanNode):
    """Beyond the reference: chart-rendering downsample — min-max pair
    or parallel-LTTB selection per series-bucket."""

    def __init__(self, bucket_ms: int, method: str = "minmax"):
        super().__init__()
        self.bucket_ms = bucket_ms
        self.method = method

    def explain(self) -> str:
        return f"DECIMATE(bucket={self.bucket_ms}, method={self.method})"


class SeasonalAdjustNode(PlanNode):
    """Beyond the reference: seasonal-naive decomposition — value minus
    the series' same-phase-of-season mean (default diurnal profile).
    ``season_ms=None`` is auto mode: the season comes from the frame's
    own ACF-peak majority vote (stats.detect_season) and the profile
    bucket is the grid step."""

    def __init__(
        self,
        season_ms: int | None = 86_400_000,
        bucket_ms: int | None = 3_600_000,
        output: str = "residual",
        per_series: bool = False,
    ):
        super().__init__()
        self.season_ms = season_ms
        self.bucket_ms = bucket_ms
        self.output = output
        self.per_series = per_series

    def explain(self) -> str:
        season = "auto" if self.season_ms is None else self.season_ms
        if self.per_series:
            season = "auto-per-series"
        return (
            f"SEASONAL_ADJUST(season={season}, "
            f"bucket={self.bucket_ms}, output={self.output})"
        )


class SeasonalDecomposeNode(PlanNode):
    """Beyond the reference: textbook classical additive decomposition
    (windows.seasonal_decompose) sliced back into the pipeline as ONE
    component series — ``trend`` (centered-MA, absent at the textbook
    edges), ``seasonal`` (detrended phase profile), or ``residual``.
    ``season_ms=None`` is auto mode (ACF-peak majority vote)."""

    def __init__(
        self,
        season_ms: int | None = None,
        bucket_ms: int | None = None,
        component: str = "residual",
    ):
        super().__init__()
        self.season_ms = season_ms
        self.bucket_ms = bucket_ms
        self.component = component

    def explain(self) -> str:
        season = "auto" if self.season_ms is None else self.season_ms
        return (
            f"SEASONAL_DECOMPOSE(season={season}, "
            f"bucket={self.bucket_ms}, component={self.component})"
        )


class ForecastNode(PlanNode):
    """Beyond the reference: seasonal-naive + drift forecast
    (windows.forecast) — ``horizon`` future grid samples per series
    past its last finite sample; ``season_ms=None`` is auto mode
    (ACF-peak majority vote), ``drift=False`` drops the endpoint-slope
    term (pure SNAIVE)."""

    def __init__(
        self,
        horizon: int,
        season_ms: int | None = None,
        drift: bool = True,
    ):
        super().__init__()
        self.horizon = horizon
        self.season_ms = season_ms
        self.drift = drift

    def explain(self) -> str:
        season = "auto" if self.season_ms is None else self.season_ms
        return (
            f"FORECAST(horizon={self.horizon}, season={season}, "
            f"drift={self.drift})"
        )


class RollingCorrNode(PlanNode):
    """Beyond the reference: trailing-window Pearson correlation of
    every series vs ONE label-matched target
    (stats.rolling_corr_target) — the when-did-it-decouple view of the
    global correlate number."""

    def __init__(
        self,
        window_buckets: int,
        target: dict[str, str],
        min_points: int = 3,
    ):
        super().__init__()
        self.window_buckets = window_buckets
        self.target = target
        self.min_points = min_points

    def explain(self) -> str:
        tgt = ",".join(f"{k}:{v}" for k, v in sorted(self.target.items()))
        return (
            f"ROLLING_CORR(window={self.window_buckets}, target={tgt}, "
            f"min_points={self.min_points})"
        )


class InterpolateNode(PlanNode):
    """Beyond the reference: linear interior-gap fill over the query
    grid (the Graphite-universe interpolate()), optionally bounded to
    gap runs of at most ``limit`` steps."""

    def __init__(self, limit: int | None = None):
        super().__init__()
        self.limit = limit

    def explain(self) -> str:
        return f"INTERPOLATE(limit={self.limit})"


class EwmaNode(PlanNode):
    """Beyond the reference: exponentially-weighted moving average over
    a trailing n-sample window (the Graphite-universe
    exponentialMovingAverage with a deterministic bounded warm-up)."""

    def __init__(self, n: int, alpha: float | None = None):
        super().__init__()
        self.n = n
        self.alpha = alpha

    def explain(self) -> str:
        return f"EWMA(n={self.n}, alpha={self.alpha})"


class AliasSubNode(PlanNode):
    """Beyond the reference (Constants.java:45): regex substitution on the
    display alias."""

    def __init__(self, search: str, replace: str):
        super().__init__()
        self.search = search
        self.replace = replace

    def explain(self) -> str:
        return f"ALIAS_SUB(search={self.search},replace={self.replace})"


class KeepLastValueNode(PlanNode):
    def __init__(self, lookback: str):
        super().__init__()
        self.lookback = lookback  # "" = forever

    def explain(self) -> str:
        return f"KEEP_LAST_VALUE({self.lookback})"


class TransformNullNode(PlanNode):
    def __init__(self, fill: float):
        super().__init__()
        self.fill = fill

    def explain(self) -> str:
        return f"TRANSFORM_NULL({java_double_str(self.fill)})"


class SortNode(PlanNode):
    def __init__(self, sort_by: str, order: str):
        super().__init__()
        self.sort_by = sort_by
        self.order = order

    def explain(self) -> str:
        return f"SORT({self.sort_by}, {self.order})"


class TopKNode(PlanNode):
    def __init__(self, k: int, sort_by: str, order: str):
        super().__init__()
        self.k = k
        self.sort_by = sort_by
        self.order = order

    def explain(self) -> str:
        return f"TOPK({self.k}, {self.sort_by}, {self.order})"


class HeadNode(PlanNode):
    def __init__(self, limit: int):
        super().__init__()
        self.limit = limit

    def explain(self) -> str:
        return f"HEAD({self.limit})"


class TailNode(PlanNode):
    def __init__(self, limit: int):
        super().__init__()
        self.limit = limit

    def explain(self) -> str:
        return f"TAIL({self.limit})"


class PercentileOfSeriesNode(PlanNode):
    def __init__(self, percentiles: list[float], interpolate: bool, tags: list[str] | None):
        super().__init__()
        self.percentiles = percentiles
        self.interpolate = interpolate
        self.tags = tags

    def explain(self) -> str:
        pcts = "[" + ", ".join(java_float_str(p) for p in self.percentiles) + "]"
        tags = "[" + ", ".join(self.tags) + "]" if self.tags is not None else "null"
        return (
            f"PERCENTILE_OF_SERIES(percentiles={pcts}, "
            f"interpolate={str(self.interpolate).lower()}, groupBy={tags})"
        )


class HistogramPercentileNode(PlanNode):
    def __init__(self, bucket_id: str, bucket_range: str, percentiles: list[float]):
        super().__init__()
        self.bucket_id = bucket_id
        self.bucket_range = bucket_range
        self.percentiles = percentiles

    def explain(self) -> str:
        pcts = "[" + ", ".join(java_float_str(p) for p in self.percentiles) + "]"
        return f"HISTOGRAM_PERCENTILE({self.bucket_id}, {self.bucket_range}, {pcts})"


class PromHistogramPercentileNode(PlanNode):
    def __init__(self, percentiles: list[float]):
        super().__init__()
        self.percentiles = percentiles

    def explain(self) -> str:
        pcts = "[" + ", ".join(java_float_str(p) for p in self.percentiles) + "]"
        return f"PROM_HISTOGRAM_PERCENTILE({pcts})"


class AliasNode(PlanNode):
    def __init__(self, alias: str):
        super().__init__()
        self.alias = alias

    def explain(self) -> str:
        return f"ALIAS({self.alias})"


class AliasByTagsNode(PlanNode):
    def __init__(self, tags: list[str]):
        super().__init__()
        self.tags = tags

    def explain(self) -> str:
        return f"ALIAS_BY_TAGS({', '.join(self.tags)})"


class ShowTagsNode(PlanNode):
    def __init__(self, show_keys: bool, tags: list[str]):
        super().__init__()
        self.show_keys = show_keys
        self.tags = tags

    def explain(self) -> str:
        return (
            f"SHOW_TAGS(showKeys={str(self.show_keys).lower()}, "
            f"tags=[{', '.join(self.tags)}])"
        )


class MapKeyNode(PlanNode):
    def __init__(self, old: str, new: str):
        super().__init__()
        self.old = old
        self.new = new

    def explain(self) -> str:
        return f"MAP_KEY(old={self.old},new={self.new})"


class TagSubNode(PlanNode):
    def __init__(self, tag: str, search: str, replace: str):
        super().__init__()
        self.tag = tag
        self.search = search
        self.replace = replace

    def explain(self) -> str:
        return f"TAG_SUB(tag={self.tag},search={self.search},replace={self.replace})"


class FallbackSeriesConstantNode(PlanNode):
    def __init__(self, constant: float):
        super().__init__()
        self.constant = constant

    def explain(self) -> str:
        return f"FALLBACK_SERIES({java_double_str(self.constant)})"


class _BoundaryMarker(PlanNode):
    """Temporary marker for chain starts — removed by finalize."""

    def explain(self) -> str:  # pragma: no cover
        raise AssertionError("Boundary marker should not appear in explain plans")


# ---------------------------------------------------------------------------
# node factory (M3PlanNodeFactory.create)
# ---------------------------------------------------------------------------


def _values(fn: ast.FunctionNode) -> list[str]:
    return [c.value for c in fn.children if isinstance(c, ast.ValueNode)]


def _strip_quotes(s: str) -> str:
    if len(s) >= 2 and s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    return s


def _parse_bool_strict(s: str, name: str) -> bool:
    if s == "true":
        return True
    if s == "false":
        return False
    raise M3PlanError(f"function {name} expects a bool, received '{s}'")


def create_plan_node(fn: ast.FunctionNode) -> PlanNode:
    """Typed error boundary: every branch below coerces argument
    strings with float()/int()/indexing; malformed or missing args must
    surface as :class:`M3PlanError` (the reference's REST layer returns
    a structured 400 for these — found by the r7 grammar fuzz, where
    ``topK x`` escaped as a raw ValueError and ``scale`` with no factor
    as an IndexError)."""
    try:
        return _create_plan_node(fn)
    except M3PlanError:
        raise
    except (ValueError, IndexError, KeyError, TypeError, OverflowError) as e:
        raise M3PlanError(
            f"invalid arguments for {fn.name}: "
            f"{_values(fn)!r} ({type(e).__name__}: {e})"
        ) from e


def _create_plan_node(fn: ast.FunctionNode) -> PlanNode:
    name = fn.name
    args = _values(fn)

    if name in ("abs", "absolute"):
        return MapperNode("abs")
    if name in ("logarithm", "log"):
        return MapperNode("logarithm")
    if name in ("sqrt", "squareRoot"):
        return MapperNode("sqrt")
    if name == "scale":
        return MapperNode("scale", float(args[0]))
    if name == "divideScalar":
        return MapperNode("divideScalar", float(args[0]))
    if name == "offset":
        return MapperNode("offset", float(args[0]))
    if name == "round":
        return MapperNode("round", float(args[0]) if args else -1.0)
    if name == "scaleToSeconds":
        return MapperNode("scaleToSeconds", float(args[0]))
    if name == "timeshift":
        if len(args) != 1:
            raise M3PlanError("Timeshift function expects exactly one argument")
        return MapperNode("timeshift", args[0])

    if name in VALUE_FILTER_OPS:
        if len(args) != 1:
            raise M3PlanError(f"{name} expects exactly one argument")
        return ValueFilterNode(VALUE_FILTER_OPS[name], float(args[0]))
    if name == "where":
        # prefix operator syntax: where <op> <tag1> <tag2>
        # (WherePlanNode.of — operator is the FIRST argument)
        if len(args) != 3:
            raise M3PlanError(
                "Where function requires exactly 3 arguments: operator, tag1, and tag2"
            )
        return WhereNode(
            _strip_quotes(args[1]), _strip_quotes(args[0]), _strip_quotes(args[2])
        )
    if name == "tagCompare":
        # tagCompare <op> "tag:value" — TagComparePlanNode.of splits the
        # second argument at the first colon
        if len(args) != 2:
            raise M3PlanError(
                "TagCompare function requires exactly 2 arguments: "
                "operator and 'tag:value'"
            )
        tag_value = _strip_quotes(args[1])
        tag, sep, value = tag_value.partition(":")
        if not sep or not tag.strip():
            raise M3PlanError(f"Invalid tag:value format: {tag_value!r}")
        return TagCompareNode(_strip_quotes(args[0]), tag.strip(), value)
    if name == "excludeByTag":
        if len(args) < 2:
            raise M3PlanError("excludeByTag expects: tag patterns...")
        return ExcludeByTagNode(args[0], [_strip_quotes(a) for a in args[1:]])
    if name == "removeEmpty":
        return RemoveEmptyNode()
    if name == "sustain":
        return SustainNode(args[0])
    if name == "isNonNull":
        return IsNonNullNode()

    if name == "moving":
        if len(args) < 2:
            raise M3PlanError("moving requires window and aggregation type")
        agg = WINDOW_AGG_TYPES.get(args[1])
        if agg is None:
            raise M3PlanError(f"invalid moving aggregation: {args[1]}")
        return MovingNode(args[0], agg)
    if name in MOVING_FN_AGG:
        return MovingNode(args[0], MOVING_FN_AGG[name])
    if name == "movingPercentile":
        if len(args) != 2:
            raise M3PlanError("movingPercentile expects: window percentile")
        try:
            p = float(args[1])
        except ValueError as e:
            raise M3PlanError(
                f"movingPercentile percentile must be numeric: {e}"
            )
        if not 0.0 <= p <= 100.0:
            raise M3PlanError(
                "movingPercentile percentile must be in [0, 100]"
            )
        return MovingPercentileNode(args[0], p)
    if name == "summarize":
        if not 1 <= len(args) <= 3:
            raise M3PlanError("summarize expects 1-3 arguments")
        fn_type = "SUM"
        if len(args) >= 2:
            a = args[1]
            if a.startswith("p") and a[1:].replace(".", "", 1).isdigit():
                fn_type = a.upper()
            else:
                fn_type = SUMMARIZE_AGG_TYPES.get(a) or _err_summarize(a)
        align = _parse_bool_strict(args[2], "summarize") if len(args) == 3 else False
        return SummarizeNode(args[0], fn_type, align)
    if name == "derivative":
        return DerivativeNode()
    if name == "perSecond":
        return PerSecondNode()
    if name == "perSecondRate":
        if len(args) != 1:
            raise M3PlanError("perSecondRate expects exactly one argument")
        return PerSecondRateNode(args[0])
    if name == "integral":
        reset = _parse_bool_strict(args[0], "integral") if args else False
        return IntegralNode(reset)
    if name == "changed":
        return ChangedNode()
    if name == "keepLastValue":
        if len(args) > 1:
            raise M3PlanError("keepLastValue accepts at most one argument")
        return KeepLastValueNode(args[0] if args else "")
    if name == "transformNull":
        if len(args) > 1:
            raise M3PlanError("transformNull accepts at most one argument")
        return TransformNullNode(float(args[0]) if args else 0.0)

    if name in ("sort", "sortSeries"):
        sort_by = SORT_BY.get(args[0]) if args else "current"
        if sort_by is None:
            raise M3PlanError(f"invalid sort key: {args[0]}")
        order = "desc"
        if len(args) >= 2:
            order = SORT_ORDER.get(args[1]) or _err_sort_order(args[1])
        return SortNode(sort_by, order)
    if name == "topK":
        k = int(float(args[0])) if args else 10
        sort_by = SORT_BY.get(args[1], "current") if len(args) >= 2 else "current"
        order = SORT_ORDER.get(args[2], "desc") if len(args) >= 3 else "desc"
        return TopKNode(k, sort_by, order)
    if name == "head":
        return HeadNode(int(float(args[0])) if args else 10)
    if name == "tail":
        return TailNode(int(float(args[0])) if args else 10)

    if name in ("median", "medianOfSeries"):
        tags = [_strip_quotes(a) for a in args] if args else None
        return PercentileOfSeriesNode([50.0], False, tags)
    if name == "percentileOfSeries":
        if not args:
            raise M3PlanError("percentileOfSeries requires percentiles")
        percentiles: list[float] = []
        i = 0
        while i < len(args):
            a = args[i]
            if a in ("true", "false"):
                break
            try:
                p = float(a)
            except ValueError:
                break
            if not 0 <= p <= 100:
                break
            percentiles.append(p)
            i += 1
        if not percentiles:
            raise M3PlanError("percentileOfSeries requires at least one percentile")
        interpolate = False
        if i < len(args) and args[i] in ("true", "false"):
            interpolate = args[i] == "true"
            i += 1
        tags = [_strip_quotes(a) for a in args[i:]] if args[i:] else None
        return PercentileOfSeriesNode(percentiles, interpolate, tags)
    if name == "histogramPercentile":
        if len(args) < 3:
            raise M3PlanError(
                "histogramPercentile expects: bucketId bucketRange percentiles..."
            )
        return HistogramPercentileNode(
            args[0], args[1], [float(a) for a in args[2:]]
        )
    if name == "promHistogramPercentile":
        # known-but-unimplemented reference name (Constants.java:64) with
        # public Prometheus semantics: bucketQuantile over le-bucket series
        if not args:
            raise M3PlanError(
                "promHistogramPercentile requires at least one percentile"
            )
        pcts = [float(a) for a in args]
        if any(not 0 <= p <= 100 for p in pcts):
            raise M3PlanError("promHistogramPercentile percentiles must be 0-100")
        return PromHistogramPercentileNode(pcts)

    if name == "alias":
        return AliasNode(args[0] if args else "")
    if name == "aliasByTags":
        return AliasByTagsNode([_strip_quotes(a) for a in args])
    if name == "showTags":
        show_keys = bool(args) and args[0] == "true"
        tags = args[1:] if args and args[0] in ("true", "false") else args
        return ShowTagsNode(show_keys, [_strip_quotes(a) for a in tags])
    if name == "mapKey":
        if len(args) != 2:
            raise M3PlanError("mapKey expects: oldKey newKey")
        return MapKeyNode(args[0], args[1])
    if name == "tagSub":
        if len(args) != 3:
            raise M3PlanError("tagSub expects: tag search replace")
        return TagSubNode(args[0], _strip_quotes(args[1]), _strip_quotes(args[2]))

    if name == "fallbackSeries":
        if len(args) != 1:
            raise M3PlanError("fallbackSeries expects one argument")
        return FallbackSeriesConstantNode(float(args[0]))

    if name == "nonNegativeDerivative":
        return NonNegativeDerivativeNode()
    if name in ("removeAbovePercentile", "removeBelowPercentile"):
        if len(args) != 1:
            raise M3PlanError(f"{name} expects exactly one argument")
        return RemovePercentileNode(float(args[0]), name == "removeAbovePercentile")
    if name == "aliasSub":
        if len(args) != 2:
            raise M3PlanError("aliasSub expects: search replace")
        return AliasSubNode(_strip_quotes(args[0]), _strip_quotes(args[1]))
    if name in ("sustainedAbove", "sustainedBelow"):
        if len(args) != 2:
            raise M3PlanError(f"{name} expects: threshold duration")
        return SustainedFilterNode(
            float(args[0]), args[1], name == "sustainedAbove"
        )
    if name == "nPercentile":
        if len(args) != 1:
            raise M3PlanError("nPercentile expects exactly one argument")
        return NPercentileNode(float(args[0]))
    if name == "constantLine":
        if len(args) != 1:
            raise M3PlanError("constantLine expects exactly one argument")
        return ConstantLineNode(float(args[0]))
    if name == "_topKPerTimestamp":
        if len(args) != 1:
            raise M3PlanError("_topKPerTimestamp expects: k")
        return TopKPerTimestampNode(int(args[0]))
    if name == "_tagAdd":
        if len(args) != 2:
            raise M3PlanError("_tagAdd expects: key value")
        return TagAddNode(args[0], _strip_quotes(args[1]))
    if name == "toHistogramLinearBuckets":
        if len(args) != 3:
            raise M3PlanError(
                "toHistogramLinearBuckets expects: start width count"
            )
        return ToHistogramLinearBucketsNode(
            float(args[0]), float(args[1]), int(args[2])
        )
    if name == "anomalies":
        if len(args) > 1:
            raise M3PlanError("anomalies expects at most one threshold")
        return AnomaliesNode(float(args[0]) if args else 3.0)
    if name == "changepoints":
        if len(args) > 2:
            raise M3PlanError("changepoints expects: [threshold [slack]]")
        try:
            threshold = float(args[0]) if len(args) >= 1 else 5.0
            slack = float(args[1]) if len(args) >= 2 else 0.5
        except ValueError as e:
            raise M3PlanError(f"changepoints arguments must be numeric: {e}")
        if threshold <= 0 or slack < 0:
            raise M3PlanError(
                "changepoints needs threshold > 0 and slack >= 0"
            )
        return ChangepointsNode(threshold, slack)
    if name == "interpolate":
        if len(args) > 1:
            raise M3PlanError("interpolate expects: [limit]")
        limit = None
        if args:
            try:
                limit = int(args[0])
            except ValueError as e:
                raise M3PlanError(f"interpolate limit must be an integer: {e}")
            if limit <= 0:
                raise M3PlanError("interpolate limit must be > 0 steps")
        return InterpolateNode(limit)
    if name == "ewma":
        if not 1 <= len(args) <= 2:
            raise M3PlanError("ewma expects: n [alpha]")
        try:
            n = int(args[0])
            alpha = float(args[1]) if len(args) == 2 else None
        except ValueError as e:
            raise M3PlanError(f"ewma arguments must be numeric: {e}")
        from time_series_db_spark.operators.windows import MAX_EWMA_WINDOW

        if not 0 < n <= MAX_EWMA_WINDOW:
            raise M3PlanError(
                f"ewma window must be in 1..{MAX_EWMA_WINDOW} samples"
            )
        if alpha is not None and not 0.0 < alpha <= 1.0:
            raise M3PlanError("ewma alpha must be in (0, 1]")
        return EwmaNode(n, alpha)
    if name == "decimate":
        if not 1 <= len(args) <= 2:
            raise M3PlanError("decimate expects: bucket [minmax|lttb]")
        method = args[1] if len(args) == 2 else "minmax"
        if method not in ("minmax", "lttb"):
            raise M3PlanError("decimate method must be minmax|lttb")
        return DecimateNode(parse_duration_ms(args[0]), method)
    if name == "seasonalAdjust":
        if len(args) > 3:
            raise M3PlanError(
                "seasonalAdjust expects: [season|auto [bucket "
                "[residual|seasonal]]]"
            )
        if args and args[0] == "auto":
            # auto mode: season from the frame's own ACF peaks
            # (fleet-majority vote, or each series' own peak with
            # `perSeries`); profile bucket is the grid step (always
            # divides the detected season), so only the output
            # selector remains
            rest = list(args[1:])
            per_series = bool(rest) and rest[0] == "perSeries"
            if per_series:
                rest = rest[1:]
            if len(rest) > 1:
                raise M3PlanError(
                    "seasonalAdjust auto expects: auto [perSeries] "
                    "[residual|seasonal]"
                )
            output = rest[0] if rest else "residual"
            if output not in ("residual", "seasonal"):
                raise M3PlanError(
                    "seasonalAdjust output must be residual|seasonal"
                )
            return SeasonalAdjustNode(None, None, output, per_series)
        season = parse_duration_ms(args[0]) if len(args) >= 1 else 86_400_000
        bucket = parse_duration_ms(args[1]) if len(args) >= 2 else 3_600_000
        output = args[2] if len(args) >= 3 else "residual"
        if output not in ("residual", "seasonal"):
            raise M3PlanError(
                "seasonalAdjust output must be residual|seasonal"
            )
        if season <= 0 or bucket <= 0 or season % bucket:
            raise M3PlanError(
                "seasonalAdjust bucket must divide the season"
            )
        return SeasonalAdjustNode(season, bucket, output)
    if name == "seasonalDecompose":
        # seasonalDecompose [auto|season [bucket]] [trend|seasonal|residual]
        rest = list(args)
        component = "residual"
        if rest and rest[-1] in ("trend", "seasonal", "residual"):
            component = rest.pop()
        if len(rest) > 2:
            raise M3PlanError(
                "seasonalDecompose expects: [auto|season [bucket]] "
                "[trend|seasonal|residual]"
            )
        if not rest or rest[0] == "auto":
            if len(rest) > 1:
                raise M3PlanError(
                    "seasonalDecompose auto takes no bucket (the grid "
                    "step always divides the detected season)"
                )
            return SeasonalDecomposeNode(None, None, component)
        season = parse_duration_ms(rest[0])
        bucket = parse_duration_ms(rest[1]) if len(rest) == 2 else None
        if season <= 0:
            raise M3PlanError("seasonalDecompose season must be positive")
        if bucket is not None and (bucket <= 0 or season % bucket):
            raise M3PlanError(
                "seasonalDecompose bucket must divide the season"
            )
        return SeasonalDecomposeNode(season, bucket, component)
    if name == "rollingCorr":
        # rollingCorr <window> <tag:value>... [minPoints]
        rest = [_strip_quotes(str(a)) for a in args]
        usage = ("rollingCorr expects: window tag:value [tag:value ...] "
                 "[minPoints]")
        if len(rest) < 2:
            raise M3PlanError(usage)
        try:
            window = int(rest[0])
        except ValueError:
            raise M3PlanError(
                "rollingCorr window must be an integer bucket count"
            ) from None
        if window < 2:
            raise M3PlanError("rollingCorr window must be >= 2")
        rest = rest[1:]
        min_points = 3
        if rest and ":" not in rest[-1]:
            try:
                min_points = int(rest[-1])
            except ValueError:
                raise M3PlanError(usage) from None
            rest = rest[:-1]
        if not rest:
            raise M3PlanError(usage)
        target: dict[str, str] = {}
        for m in rest:
            tag, sep, value = m.partition(":")
            if not sep or not tag.strip() or not value.strip():
                raise M3PlanError(
                    f"rollingCorr matcher must be tag:value, got {m!r}"
                )
            target[tag.strip()] = value.strip()
        return RollingCorrNode(window, target, min_points)
    if name == "forecast":
        # forecast <horizon> [auto|season] [noDrift]
        rest = [str(a) for a in args]
        usage = "forecast expects: horizon [auto|season] [noDrift]"
        if not rest:
            raise M3PlanError(usage)
        try:
            horizon = int(rest[0])
        except ValueError:
            raise M3PlanError("forecast horizon must be an integer "
                              "sample count") from None
        if horizon <= 0:
            raise M3PlanError("forecast horizon must be positive")
        rest = rest[1:]
        use_drift = True
        if rest and rest[-1] == "noDrift":
            use_drift = False
            rest.pop()
        if len(rest) > 1:
            raise M3PlanError(usage)
        season = None
        if rest and rest[0] != "auto":
            season = parse_duration_ms(rest[0])
            if season <= 0:
                raise M3PlanError("forecast season must be positive")
        return ForecastNode(horizon, season, use_drift)
    if name == "showAnomalyThresholds":
        if len(args) > 1:
            raise M3PlanError(
                "showAnomalyThresholds expects at most one threshold"
            )
        return ShowAnomalyThresholdsNode(float(args[0]) if args else 3.0)
    if name == "timestamp":
        return TimestampNode()
    if name == "histogramCDF":
        if len(args) < 3:
            raise M3PlanError(
                "histogramCDF expects: bucketId bucketRange thresholds..."
            )
        return HistogramCDFNode(
            args[0], args[1], [float(a) for a in args[2:]]
        )
    if name == "toHistogram":
        if len(args) < 2:
            raise M3PlanError("toHistogram expects: bound bound ...")
        bounds = [float(a) for a in args]
        if any(b2 <= b1 for b1, b2 in zip(bounds, bounds[1:])):
            raise M3PlanError("toHistogram bounds must be strictly increasing")
        return ToHistogramNode(bounds)
    if name in ("aliasByBucket", "aliasByHistogramBucket"):
        if len(args) > 1:
            raise M3PlanError(f"{name} expects at most one bucket-range tag")
        return AliasByBucketNode(
            args[0] if args else "bucket", name == "aliasByHistogramBucket"
        )
    if name == "aliasByDistinctTags":
        return AliasByDistinctTagsNode()
    if name == "asBurnRate":
        if len(args) != 1:
            raise M3PlanError("asBurnRate expects: slo")
        slo = float(args[0])
        if not 0 < slo < 1:
            raise M3PlanError("asBurnRate slo must be in (0, 1)")
        return MapperNode("asBurnRate", slo)
    if name == "asMultiBurnRate":
        if len(args) < 2:
            raise M3PlanError("asMultiBurnRate expects: slo window...")
        slo = float(args[0])
        if not 0 < slo < 1:
            raise M3PlanError("asMultiBurnRate slo must be in (0, 1)")
        for w in args[1:]:
            parse_duration_ms(w)  # validate eagerly at plan time
        return AsMultiBurnRateNode(list(args[1:]), slo)
    if name == "_summarizeBy":
        if len(args) < 2:
            raise M3PlanError("_summarizeBy expects: interval fn tags...")
        fn_type = AGG_TYPES.get(args[1])
        if fn_type is None or fn_type in ("MULTIPLY", "RANGE"):
            raise M3PlanError(f"invalid _summarizeBy function: {args[1]}")
        parse_duration_ms(args[0])
        return SummarizeByNode(
            args[0], fn_type, [_strip_quotes(a) for a in args[2:]]
        )

    if name == "fetch":
        return _fetch_node(fn)
    if name == "mockFetch":
        return _mock_fetch_node(fn)
    if name == "mockFetchLine":
        if len(args) != 1:
            raise M3PlanError("mockFetchLine expects: value [tags...]")
        return MockFetchLineNode(float(args[0]), _mock_tags(fn))
    if name == "mockFetchLinear":
        if len(args) != 2:
            raise M3PlanError("mockFetchLinear expects: start slope [tags...]")
        return MockFetchLinearNode(float(args[0]), float(args[1]), _mock_tags(fn))
    if name == "mockFetchPeriodic":
        if len(args) != 2:
            raise M3PlanError(
                "mockFetchPeriodic expects: amplitude period [tags...]"
            )
        parse_duration_ms(args[1])  # validate eagerly at plan time
        return MockFetchPeriodicNode(float(args[0]), args[1], _mock_tags(fn))

    agg = AGG_TYPES.get(name)
    if agg is not None:
        return AggregationNode(agg, [_strip_quotes(a) for a in args])
    raise M3PlanError(f"Unknown function: {name}")


def _err_summarize(a: str) -> str:
    raise M3PlanError(f"invalid summarize function: {a}")


def _err_sort_order(a: str) -> str:
    raise M3PlanError(f"invalid sort order: {a}")


def _fetch_node(fn: ast.FunctionNode) -> FetchNode:
    match: dict[str, list[str]] = {}
    inverse: dict[str, list[str]] = {}
    for child in fn.children:
        if not isinstance(child, ast.TagKeyNode):
            continue
        target = inverse if child.inverted else match
        values = target.setdefault(child.key, [])
        for vc in child.children:
            if isinstance(vc, ast.TagValueNode):
                values.append(vc.value)
        if isinstance(child, ast.TagKeyNode):
            pass
    # TagArgsNode replaced TagValueNode children after interpolation
    for child in fn.children:
        if isinstance(child, ast.TagKeyNode):
            for vc in child.children:
                if isinstance(vc, ast.TagArgsNode):
                    target = inverse if child.inverted else match
                    target.setdefault(child.key, []).extend(vc.args)
    return FetchNode(match, inverse)


def _mock_tags(fn: ast.FunctionNode) -> dict[str, str]:
    """Trailing ``k:v`` args of the mockFetch generator family."""
    tags: dict[str, str] = {}
    for child in fn.children:
        if isinstance(child, ast.TagKeyNode):
            for vc in child.children:
                if isinstance(vc, ast.TagValueNode):
                    tags[child.key] = vc.value
    return tags


def _mock_fetch_node(fn: ast.FunctionNode) -> MockFetchNode:
    values = [
        float("nan") if v == "nan" else float(v) for v in _values(fn)
    ]
    return MockFetchNode(values, _mock_tags(fn))


# ---------------------------------------------------------------------------
# AST → plan converter (M3ASTConverter)
# ---------------------------------------------------------------------------

_PIPELINE_ARG_FNS = {
    "asPercent", "ratio", "diff", "subtract", "divide", "divideSeries", "intersect",
    "setDiff",  # beyond the reference (Constants.java:67)
}


def _is_fetch_fn(node: ast.Node) -> bool:
    # constantLine + mockFetch variants are generator leaves like
    # mockFetch (Constants.java:55,58-60)
    return isinstance(node, ast.FunctionNode) and node.name in (
        "fetch", "mockFetch", "constantLine",
        "mockFetchLine", "mockFetchLinear", "mockFetchPeriodic",
    )


def _is_pipeline_or_group(node: ast.Node) -> bool:
    return isinstance(node, (ast.PipelineNode, ast.GroupNode))


def _binary_kind(name: str) -> tuple[str, int]:
    """(canonical kind, groupBy-tags start index) for a binary fn name."""
    if name in ("asPercent", "ratio"):
        return "asPercent", 1
    if name in ("diff", "subtract"):
        return "diff", 2
    if name in ("divide", "divideSeries"):
        return "divide", 1
    if name == "intersect":
        return "intersect", 1
    if name == "setDiff":
        return "setDiff", 1
    raise M3PlanError(f"Binary function {name} is not supported.")


def _extract_group_by_tags(fn: ast.FunctionNode, start: int) -> list[str]:
    return [
        _strip_quotes(c.value)
        for c in fn.children[start:]
        if isinstance(c, ast.ValueNode)
    ]


def _extract_keep_nans(fn: ast.FunctionNode) -> bool:
    if len(fn.children) <= 1:
        return False
    second = fn.children[1]
    if isinstance(second, ast.ValueNode):
        if second.value in ("true", "false"):
            return second.value == "true"
        raise M3PlanError(
            f"function {fn.name} expects argument 1 of type bool, "
            f"received '{second.value}'"
        )
    return False


def _convert(node: ast.Node) -> PlanNode:
    """handlePipelineOrGroupNode — left-to-right chain accumulation."""
    if not _is_pipeline_or_group(node):
        raise M3PlanError("node must be a pipeline or group")
    is_group = isinstance(node, ast.GroupNode)

    result: PlanNode | None = None
    dangling: PlanNode | None = None

    def _finalized() -> PlanNode:
        if dangling is not None:
            return dangling
        if result is None:
            raise M3PlanError("Found null plan node during query planning.")
        return result

    for child in node.children:
        if _is_fetch_fn(child):
            new_chain = _BoundaryMarker()
            new_chain.add(create_plan_node(child))
            if result is None:
                result = new_chain
            else:
                result = _finalized()
                dangling = None
                result = _merge_chains(result, new_chain)
        elif isinstance(child, ast.PipelineNode):
            new_chain = _convert(child)
            result = new_chain if result is None else _merge_chains(result, new_chain)
        elif _is_fallback_with_pipeline_arg(child):
            result = _finalized()
            dangling = None
            rhs = _convert(child.children[0])
            bin_node = BinaryNode("fallbackSeries", [])
            bin_node.add(result)
            bin_node.add(rhs)
            result = bin_node
        elif isinstance(child, ast.FunctionNode) and child.name == "burnRate":
            result = _finalized()
            dangling = None
            vals = [
                c.value for c in child.children if isinstance(c, ast.ValueNode)
            ]
            groups = [c for c in child.children if _is_chain_arg(c)]
            if len(vals) != 2 or len(groups) != 1:
                raise M3PlanError(
                    "burnRate expects: window slo (total-pipeline)"
                )
            parse_duration_ms(vals[0])  # validate the window eagerly
            slo = float(vals[1])
            if not 0 < slo < 1:
                raise M3PlanError("burnRate slo must be in (0, 1)")
            bn = BurnRateNode(vals[0], slo)
            bn.add(result)
            bn.add(_chain_arg(groups[0]))
            result = bn
        elif isinstance(child, ast.FunctionNode) and child.name == "divideWhen":
            result = _finalized()
            dangling = None
            vals = [
                c.value for c in child.children if isinstance(c, ast.ValueNode)
            ]
            groups = [c for c in child.children if _is_chain_arg(c)]
            if len(vals) < 2 or len(groups) != 1:
                raise M3PlanError(
                    "divideWhen expects: op value (denominator-pipeline) [keys...]"
                )
            if vals[0] not in VALUE_FILTER_OPS:
                raise M3PlanError(f"invalid divideWhen operator: {vals[0]}")
            dw = DivideWhenNode(
                VALUE_FILTER_OPS[vals[0]].lower(),
                float(vals[1]),
                [_strip_quotes(v) for v in vals[2:]],
            )
            dw.add(result)
            dw.add(_chain_arg(groups[0]))
            result = dw
        elif isinstance(child, ast.FunctionNode) and child.name == "multiBurnRate":
            result = _finalized()
            dangling = None
            vals = [
                c.value for c in child.children if isinstance(c, ast.ValueNode)
            ]
            groups = [c for c in child.children if _is_chain_arg(c)]
            if len(vals) < 2 or len(groups) != 1:
                raise M3PlanError(
                    "multiBurnRate expects: slo window... (total-pipeline)"
                )
            slo = float(vals[0])
            if not 0 < slo < 1:
                raise M3PlanError("multiBurnRate slo must be in (0, 1)")
            for w in vals[1:]:
                parse_duration_ms(w)  # validate the windows eagerly
            mbn = MultiBurnRateNode(vals[1:], slo)
            mbn.add(result)
            mbn.add(_chain_arg(groups[0]))
            result = mbn
        elif (
            isinstance(child, ast.FunctionNode) and child.name in _PIPELINE_ARG_FNS
        ):
            result = _finalized()
            dangling = None
            arg = child.children[0] if child.children else None
            if arg is None or not _is_pipeline_or_group(arg):
                raise M3PlanError(
                    f"{child.name} argument must be a pipeline or group"
                )
            rhs = _convert(arg)
            kind, tag_start = _binary_kind(child.name)
            keep_nans = _extract_keep_nans(child) if kind == "diff" else False
            bin_node = BinaryNode(
                kind, _extract_group_by_tags(child, tag_start), keep_nans
            )
            bin_node.add(result)
            bin_node.add(rhs)
            result = bin_node
        elif isinstance(child, ast.GroupNode):
            new_chain = _convert(child)
            if result is None:
                result = new_chain
            else:
                result = _finalized()
                dangling = None
                result = _merge_chains(result, new_chain)
        else:
            if not isinstance(child, ast.FunctionNode):
                raise M3PlanError("Expecting regular function node")
            plan_node = create_plan_node(child)
            plan_node.add(dangling if dangling is not None else result)
            dangling = plan_node

    if is_group:
        sub = _finalize(_finalized())
        marker = _BoundaryMarker()
        marker.add(sub)
        return marker
    return _finalized()


def _is_chain_arg(node: ast.Node) -> bool:
    """A parenthesized total-pipeline argument: a pipeline/group, or —
    when the parens held a single generator stage — the bare fetch-family
    FunctionNode the parser unwraps it to."""
    return _is_pipeline_or_group(node) or _is_fetch_fn(node)


def _chain_arg(node: ast.Node) -> PlanNode:
    if _is_pipeline_or_group(node):
        return _convert(node)
    return create_plan_node(node)


def _is_fallback_with_pipeline_arg(node: ast.Node) -> bool:
    return (
        isinstance(node, ast.FunctionNode)
        and node.name == "fallbackSeries"
        and bool(node.children)
        and _is_pipeline_or_group(node.children[0])
    )


def _merge_chains(result: PlanNode, new_chain: PlanNode) -> PlanNode:
    """mergeChainsAtBoundaryMarker — union the existing chain with the
    part of the new chain below its boundary marker; stages above the
    marker stack on top of the union."""
    above: PlanNode | None = None
    below: PlanNode | None = None
    if isinstance(new_chain, _BoundaryMarker):
        below = new_chain.children[0]
    else:
        above = new_chain
        walker = new_chain
        while walker.children and not isinstance(walker.children[0], _BoundaryMarker):
            walker = walker.children[0]
        if walker.children:
            below = walker.children[0].children[0]
            walker.children.clear()
    if below is None:
        raise M3PlanError("chain must have boundary marker")

    if isinstance(result, UnionNode):
        result.add(below)
        merged = result
    else:
        merged = UnionNode()
        merged.add(result)
        merged.add(below)

    if above is not None:
        walker = above
        while walker.children:
            walker = walker.children[0]
        walker.add(merged)
        return above
    return merged


def _finalize(plan: PlanNode) -> PlanNode:
    plan.children = [_finalize(c) for c in plan.children]
    if isinstance(plan, _BoundaryMarker):
        if len(plan.children) != 1:
            raise M3PlanError("ChainBoundaryMarker must have exactly one child")
        return plan.children[0]
    return plan


def build_plan(root: ast.RootNode) -> PlanNode:
    """M3ASTConverter.buildPlan — AST root → finalized logical plan.

    Outer typed-error boundary (in addition to create_plan_node's):
    conversion paths OUTSIDE the per-function dispatch — binary-stage
    composition, macro/burn-rate expansion — coerce arguments too, and
    the grammar fuzz found `int(float('Inf'))` escaping as
    OverflowError and a burn-rate arg as raw ValueError."""
    if len(root.children) != 1:
        raise M3PlanError("AST root must have exactly one child")
    pipeline = root.children[0]
    if not isinstance(pipeline, ast.PipelineNode):
        raise M3PlanError("AST root child must be a pipeline")
    try:
        return _finalize(_convert(pipeline))
    except M3PlanError:
        raise
    except (ValueError, IndexError, KeyError, TypeError, OverflowError) as e:
        raise M3PlanError(
            f"invalid query arguments ({type(e).__name__}: {e})"
        ) from e
