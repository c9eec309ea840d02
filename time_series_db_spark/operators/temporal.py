"""Temporal joins over event frames — as-of, bounded-range, and funnel.

The reference's query surface stops at per-series window operators; a
time-series store feeding a training/feature pipeline also needs the
classic temporal joins (kdb+ ``aj``, Pandas ``merge_asof``, DuckDB
``ASOF JOIN``) expressed at cluster scale.  Spark has no built-in as-of
join, and the naive formulation — an inequality join — degenerates to a
BroadcastNestedLoopJoin/CartesianProduct that is quadratic per key.
Both operators here avoid inequality joins entirely:

* :func:`asof_join` uses the union trick: tag both sides, union, and
  take a running ``last(ignorenulls)`` over one per-key time-ordered
  window.  ONE shuffle on the join keys, O(n log n) per partition, no
  pair blow-up — the per-key history is the minimal sequential unit,
  exactly like sessionization.
* :func:`range_join` buckets time by the radius and equi-joins on
  (keys, bucket ± 1), then filters the exact predicate — a hash join
  whose candidate set is bounded by true-neighborhood density, never
  the cross product.  (The same bucket-join shape as the LSH dedup
  candidate generation.)
* :func:`funnel` computes ordered conversion steps (A then B then C)
  with per-step conditional min-aggregations equi-joined on the user
  key — each stage's state is one row per user, co-partitioned on the
  same key so AQE reuses the exchange.

All three are deterministic (explicit tie-breaks) so they carry exact
DuckDB oracles in the catalog (``events_asof_join``,
``events_range_join``, ``events_funnel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ms(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch-ms ordering column; timestamps cast, bigints pass through."""
    if dict(df.dtypes).get(ts_col, "").startswith("timestamp"):
        return F.unix_millis(F.col(ts_col).cast("timestamp"))
    return F.col(ts_col).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    *,
    right_cols: list[str],
    tiebreak_col: str | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the ``right_cols`` of the
    nearest right row at-or-before its timestamp (``direction=
    "backward"``, the default — ``right.ts <= left.ts``) or at-or-after
    it (``"forward"`` — ``right.ts >= left.ts``) on the same ``on``
    keys; NULLs when no such row, or when it is further away than
    ``tolerance_ms``.  Adds ``<ts_col>{suffix}`` with the matched right
    row's epoch-ms timestamp.

    Ties: a right row AT the left row's timestamp matches in both
    directions (>= / <= semantics, like DuckDB ``ASOF JOIN``); among
    right rows sharing one timestamp the greatest ``tiebreak_col``
    wins backward, the smallest forward (each direction's natural
    running pick) — pass one whenever (keys, ts) is not unique on the
    right or the result is nondeterministic.

    100 TB shape: union the tagged sides, ONE exchange on ``on``, one
    time-ordered running ``last(ignorenulls)`` per key — no inequality
    join, no candidate-pair materialization; skew is bounded by a single
    key's history (the minimal sequential unit).  kdb+ ``aj`` / Pandas
    ``merge_asof`` semantics, reference fetch/window model
    (query/plan/ResolvedQuery.java) extended to cross-stream alignment.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    if not on:
        raise ValueError("asof_join requires at least one equi-key")
    if not right_cols:
        raise ValueError("asof_join requires right_cols to attach")
    missing = [c for c in right_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks columns {missing}")
    if tiebreak_col is not None:
        from pyspark.sql.types import NumericType

        tb_type = right.schema[tiebreak_col].dataType
        if not isinstance(tb_type, NumericType):
            # the long cast below would turn a non-numeric column into
            # NULLs and silently degrade tie order to nondeterministic
            raise TypeError(
                f"asof_join tiebreak_col {tiebreak_col!r} must be "
                f"numeric, got {tb_type.simpleString()}"
            )

    order2 = (
        F.col(f"__tb{suffix}")
        if tiebreak_col is not None
        else F.lit(0)
    )
    payload = F.struct(
        F.col(f"__ts{suffix}").alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        _ms(right, ts_col).alias(f"__ts{suffix}"),
        *(
            [F.col(tiebreak_col).cast("long").alias(f"__tb{suffix}")]
            if tiebreak_col is not None
            else []
        ),
        *[F.col(c) for c in right_cols if c not in on],
    ).select(
        *on,
        F.col(f"__ts{suffix}"),
        order2.alias(f"__tb{suffix}"),
        payload.alias(f"__r{suffix}"),
        # backward: right rows sort BEFORE left at one instant (side 0
        # vs 1) so a simultaneous right is in the trailing frame;
        # forward: right rows sort AFTER left (side 2) so it is in the
        # leading frame
        F.lit(0 if direction == "backward" else 2).alias(f"__side{suffix}"),
    )
    l = left.withColumn(f"__ts{suffix}", _ms(left, ts_col)).withColumn(
        f"__side{suffix}", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    base = Window.partitionBy(*on).orderBy(
        f"__ts{suffix}", f"__side{suffix}", f"__tb{suffix}"
    )
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last(f"__r{suffix}", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first(f"__r{suffix}", ignorenulls=True).over(w)
    out = u.withColumn(f"__m{suffix}", matched).where(
        F.col(f"__side{suffix}") == 1
    )
    if tolerance_ms is not None:
        gap = F.col(f"__ts{suffix}") - F.col(f"__m{suffix}.__rts")
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            f"__m{suffix}",
            F.when(gap <= F.lit(int(tolerance_ms)), F.col(f"__m{suffix}")),
        )
    keep = [c for c in left.columns]
    proj = [F.col(c) for c in keep]
    proj.append(F.col(f"__m{suffix}.__rts").alias(f"{ts_col}{suffix}"))
    proj += [
        F.col(f"__m{suffix}.{c}").alias(f"{c}{suffix}")
        for c in right_cols
    ]
    return out.select(*proj)


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    *,
    radius_ms: int,
    build_cols: list[str],
    suffix: str = "_n",
) -> DataFrame:
    """Bounded-range join: all (probe, build) pairs on the same ``on``
    keys with ``|build.ts - probe.ts| <= radius_ms`` — inner semantics,
    one output row per matching pair, build payload suffixed, plus
    ``gap_ms{suffix}`` = build.ts − probe.ts (signed epoch-ms delta).

    100 TB shape: time is bucketed at ``radius_ms``; each probe row
    expands to its bucket and both neighbors (a constant ×3), then an
    EQUI hash join on (keys, bucket) + exact |Δt| filter.  Candidate
    volume is bounded by the true neighborhood density per key, never
    the per-key cross product an inequality join would scan; the plan
    is gated to contain no CartesianProduct / BroadcastNestedLoopJoin
    (tests/test_plan_quality.py).
    """
    if radius_ms <= 0:
        raise ValueError("radius_ms must be a positive duration")
    if not on:
        raise ValueError("range_join requires at least one equi-key")
    rad = int(radius_ms)
    p = probe.withColumn("__pts", _ms(probe, ts_col))
    b = build.select(
        *[F.col(c) for c in on],
        _ms(build, ts_col).alias("__bts"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in build_cols
            if c not in on
        ],
    ).withColumn("__bkt", F.floor(F.col("__bts") / F.lit(rad)))
    p = p.withColumn(
        "__bkt",
        F.explode(
            F.array(
                F.floor(F.col("__pts") / F.lit(rad)) - 1,
                F.floor(F.col("__pts") / F.lit(rad)),
                F.floor(F.col("__pts") / F.lit(rad)) + 1,
            )
        ),
    )
    joined = p.join(b, on=[*on, "__bkt"], how="inner").where(
        F.abs(F.col("__bts") - F.col("__pts")) <= F.lit(rad)
    )
    proj = [F.col(c) for c in probe.columns]
    proj += [
        F.col(f"{c}{suffix}") for c in build_cols if c not in on
    ]
    proj.append((F.col("__bts") - F.col("__pts")).alias(f"gap_ms{suffix}"))
    return joined.select(*proj)


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: for each user with a ``steps[0]``
    event, the earliest timestamp of each subsequent step that occurs
    at-or-after the previous step's chosen timestamp (first-touch
    semantics).  Output: (user, <step>_ts … one epoch-ms column per
    step, NULL once the chain breaks, steps_completed BIGINT).

    With ``within_ms`` each step must additionally occur within that
    many ms of the previous step's chosen timestamp — the
    time-constrained funnel (windows measured greedily from the
    first-touch choice of the previous step, not re-anchored per
    step-0 occurrence as ClickHouse ``windowFunnel`` does).

    100 TB shape: per-step state is ONE row per user; every stage is a
    conditional min-aggregation equi-joined back on the user key, so
    all exchanges hash on the same key (AQE-coalesced, reusable) and
    nothing is ever quadratic.  ``len(steps)`` is a small constant
    (pipeline definition), so the plan depth is fixed.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if within_ms is not None and within_ms <= 0:
        raise ValueError("within_ms must be a positive duration")
    ts_ms = _ms(events, ts_col)
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("__et"),
        ts_ms.alias("__ts"),
    )
    cur = (
        ev.where(F.col("__et") == steps[0])
        .groupBy("user")
        .agg(F.min("__ts").alias(f"{steps[0]}_ts"))
    )
    prev_col = f"{steps[0]}_ts"
    for step in steps[1:]:
        nxt = (
            ev.where(F.col("__et") == step)
            .join(cur.select("user", prev_col), on="user", how="inner")
            .where(F.col("__ts") >= F.col(prev_col))
            .where(
                F.lit(True)
                if within_ms is None
                else F.col("__ts") <= F.col(prev_col) + F.lit(int(within_ms))
            )
            .groupBy("user")
            .agg(F.min("__ts").alias(f"{step}_ts"))
        )
        cur = cur.join(nxt, on="user", how="left")
        prev_col = f"{step}_ts"
    completed = F.lit(0)
    for step in steps:
        completed = completed + F.when(
            F.col(f"{step}_ts").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    return cur.withColumn("steps_completed", completed.cast("long"))


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Time-to-conversion distribution on top of :func:`funnel` — the
    question the per-user step table answers only after another
    aggregation: per adjacent step transition (plus the end-to-end
    first→last row when the funnel has > 2 steps), how many users
    completed it and how long it took (exact interpolated quantiles +
    exact-integer mean).  Output: ``(transition, n_users, mean_ms,
    p<q>_ms …)``, one row per transition with at least one completing
    user.

    Quantiles are EXACT (``percentile`` / ``quantile_cont`` — the same
    linear interpolation over the same integer millisecond latencies on
    both engines, the established summarize-percentile discipline);
    the mean is an exact integer sum over ms divided once.

    Scale shape: the funnel's per-user table (user-sized, not
    event-sized) unpivots map-side into (transition, latency) rows in
    the SAME pass — a constant ×|transitions| expansion with a single
    downstream consumer, so nothing needs persisting — then one
    partial-aggregated groupBy(transition) whose output is
    |transitions| rows.
    """
    qs = [float(q) for q in quantiles]
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {quantiles}")
    f = funnel(events, steps, user_col, ts_col, type_col, within_ms)
    pairs = [(steps[i], steps[i + 1]) for i in range(len(steps) - 1)]
    if len(steps) > 2:
        pairs.append((steps[0], steps[-1]))
    lat = f.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{a}->{b}").alias("transition"),
                        (F.col(f"{b}_ts") - F.col(f"{a}_ts")).alias("__lat"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("__t")
    ).select("__t.transition", "__t.__lat").filter(
        F.col("__lat").isNotNull()
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (
            F.sum(F.col("__lat").cast("decimal(27,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_ms"),
    ]
    for q in qs:
        aggs.append(
            F.expr(f"percentile(__lat, {q!r})").alias(
                f"p{int(round(q * 100))}_ms"
            )
        )
    return lat.groupBy("transition").agg(*aggs)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Cohort retention: users are cohorted by the time bucket of their
    FIRST event; for every (cohort, offset) cell, how many of that
    cohort's users were active ``offset`` buckets later.  Output:
    (cohort_ts epoch-ms bucket start, bucket_offset BIGINT >= 0,
    n_active BIGINT) — the classic retention triangle, with offset 0 the
    cohort size itself.

    100 TB shape: the cohort table is ONE min-aggregation row per user,
    equi-joined back on the user key (co-partitioned with the activity
    scan — no broadcast needed, no skew beyond one user's history); the
    final cell count is a distinct-aggregate whose input is already
    deduplicated to (user, bucket) pairs map-side, so the heavy shuffle
    carries at most users × active-buckets rows, never raw events.
    """
    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be a positive duration")
    b = int(bucket_ms)
    ev = events.select(
        F.col(user_col).alias("user"),
        (_ms(events, ts_col) - _ms(events, ts_col) % F.lit(b)).alias(
            "__bucket"
        ),
    ).distinct()
    first = ev.groupBy("user").agg(F.min("__bucket").alias("cohort_ts"))
    return (
        ev.join(first, "user")
        .groupBy(
            "cohort_ts",
            ((F.col("__bucket") - F.col("cohort_ts")) / F.lit(b))
            .cast("long")
            .alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order user-journey transition matrix: for each user's
    time-ordered event sequence, count every adjacent (from_type →
    to_type) step across all users — the Markov-chain estimate behind
    "what do users do next" and next-event-prediction features.

    Output: (from_type, to_type, n_transitions BIGINT).  Ordering ties
    at one timestamp resolve by ``tiebreak_col`` so the sequence — and
    therefore the counts — are deterministic under any partitioning.

    100 TB shape: ONE window partitioned by user (lag of the type
    column), then a hash aggregation on the (from, to) pair with
    map-side partials; output cardinality is |event types|², metadata-
    sized regardless of corpus.
    """
    w = Window.partitionBy("__u").orderBy("__ts", "__tb")
    seq = events.select(
        F.col(user_col).alias("__u"),
        _ms(events, ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(type_col).alias("to_type"),
    ).withColumn("from_type", F.lag("to_type").over(w))
    return (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
