"""Relational analytics catalog: TPC-H-style queries on the star schema.

The reference's M3QL aggregations are one-table grouped aggs; these
exercise the engine's *relational* side — multi-way joins, broadcast
dimension handling, grouped/windowed aggregation, top-k — at the shapes
a warehouse workload takes. Spark plans: dimension sides are explicitly
``broadcast()`` (no shuffle on the fact table for dim joins); all money
sums run in DECIMAL(27,6) so results are exact and order-insensitive —
identical under any partitioning, and identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_db_spark.catalog import quant, register, sql_quant
from time_series_db_spark.sources import load_table

_DEC = "decimal(27,6)"


def _dsum(col):
    """Exact money sum: double → fixed-point → sum → double."""
    return F.sum(col.cast(_DEC)).cast("double")


def _sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


@register(
    "tpch_q1_pricing",
    f"""SELECT l_returnflag, l_linestatus,
           {_sql_dsum('l_quantity')} AS sum_qty,
           {_sql_dsum('l_extendedprice')} AS sum_base_price,
           {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_quant(_sql_dsum('l_quantity') + ' / count(*)')} AS avg_qty,
           {sql_quant(_sql_dsum('l_extendedprice') + ' / count(*)')} AS avg_price,
           {sql_quant(_sql_dsum('l_discount') + ' / count(*)')} AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1_pricing(spark, sf_dir):
    """Q1 pricing summary: single-table grouped agg — partial aggregation
    (map-side combine) means the shuffle carries 4 groups, not 600k rows."""
    from time_series_db_spark.catalog import quant

    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": (None, "1998-09-03")},  # pushdown hint
    ).filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    ep, disc, tax, qty = (
        F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax"), F.col("l_quantity"),
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(qty).alias("sum_qty"),
        _dsum(ep).alias("sum_base_price"),
        _dsum(ep * (1 - disc)).alias("sum_disc_price"),
        _dsum(ep * (1 - disc) * (1 + tax)).alias("sum_charge"),
        quant(_dsum(qty) / cnt).alias("avg_qty"),
        quant(_dsum(ep) / cnt).alias("avg_price"),
        quant(_dsum(disc) / cnt).alias("avg_disc"),
        cnt.cast("long").alias("count_order"),
    )


@register(
    "tpch_q3_shipping",
    f"""WITH rev AS (
      SELECT l.l_orderkey,
             {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
             epoch_ms(o.o_orderdate) AS o_orderdate_ms, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY 1, 3, 4
    )
    SELECT l_orderkey, revenue, o_orderdate_ms, o_orderpriority
    FROM rev ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def tpch_q3_shipping(spark, sf_dir):
    """Q3 shipping priority: broadcast the filtered customer dim, shuffle
    only the order/lineitem join, TakeOrderedAndProject for the top-10."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(
        spark, sf_dir, "orders", ts_range={"o_orderdate": (None, "1998-03-15")}
    ).filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(
        spark, sf_dir, "lineitem", ts_range={"l_shipdate": ("1998-03-15", None)}
    ).filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    joined = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    rev = joined.groupBy(
        "l_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        "o_orderpriority",
    ).agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    return rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10).select(
        "l_orderkey", "revenue", "o_orderdate_ms", "o_orderpriority"
    )


@register(
    "tpch_q5_local_volume",
    f"""SELECT n.n_name,
           {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name""",
)
def tpch_q5_local_volume(spark, sf_dir):
    """Q5 local-supplier volume: five-way join; every dimension side is
    broadcast so the only shuffle is lineitem↔orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(
        spark, sf_dir, "orders",
        ts_range={"o_orderdate": ("1996-01-01", "1998-01-01")},
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "tpch_q6_forecast",
    f"""SELECT {_sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24""",
)
def tpch_q6_forecast(spark, sf_dir):
    """Q6 revenue forecast: pure scan+filter+scalar agg — every predicate
    pushes into the parquet scan (PushedFilters), zero shuffle."""
    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": ("1996-01-01", "1997-01-01")},
    )
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "tpch_q18_large_orders",
    f"""WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(27,6))) > 300
    )
    SELECT c.c_custkey, o.o_orderkey, epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           o.o_totalprice, {_sql_dsum('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4""",
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18 large-volume orders: the HAVING-subquery shape — the aggregated
    key set is broadcast back against orders (semi-join reduction)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > 300)
        .select(F.col("l_orderkey").alias("__big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("__big_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(
        "c_custkey",
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"),
        "o_totalprice",
    ).agg(_dsum(F.col("l_quantity")).alias("total_qty"))


@register(
    "tpch_q10_returns",
    f"""SELECT c.c_custkey, n.n_name,
           {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20""",
)
def tpch_q10_returns(spark, sf_dir):
    """Q10 returned-item revenue: fact→orders join (both big sides,
    shuffled hash) then broadcast customer/nation dims; exact-decimal
    revenue; TakeOrderedAndProject for the top-20."""
    from time_series_db_spark.catalog import quant  # noqa: F401

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(
        spark, sf_dir, "orders",
        ts_range={"o_orderdate": ("1996-01-01", "1996-04-01")},
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "n_name")
        .agg(_dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo",
    f"""SELECT {sql_quant(
        "100.0 * "
        + _sql_dsum("CASE WHEN p_type = 'PROMO' "
                    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
        + " / " + _sql_dsum("l_extendedprice * (1 - l_discount)")
    )} AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""",
)
def tpch_q14_promo(spark, sf_dir):
    """Q14 promotion effect: time-pruned fact scan + broadcast part dim;
    the conditional revenue share is two exact-decimal sums."""
    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": ("1996-01-01", "1996-02-01")},
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (F.lit(100.0) * _dsum(promo) / _dsum(rev)).alias("__raw")
        )
        .select(
            F.floor(F.col("__raw") * 1e4 + F.lit(0.5)) / 1e4
        )
        .toDF("promo_revenue")
    )


@register(
    "tpch_q4_priority",
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority""",
)
def tpch_q4_priority(spark, sf_dir):
    """Q4-style priority check (adapted to this schema's columns: a
    "slow" order has a lineitem shipped >60 days after the order date):
    EXISTS = left-semi hash join on orderkey — the fact side never
    duplicates, partial counts aggregate map-side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (
        o.join(
            li,
            (li["l_orderkey"] == o["o_orderkey"])
            & (li["l_shipdate"] > F.date_add(o["o_orderdate"], 60)),
            "left_semi",
        )
    )
    return slow.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "tpch_rev_mom",
    f"""WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             {_sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1)
    SELECT CAST(month AS DATE) AS month, revenue,
           revenue - lag(revenue) OVER (ORDER BY month) AS mom_delta
    FROM monthly""",
)
def tpch_rev_mom(spark, sf_dir):
    """Month-over-month revenue: grouped exact-decimal agg then a lag
    window over the MONTH-level result — the post-aggregation frame is
    months-count rows, so the single-partition window is metadata-sized
    by construction (not a scale hazard; the heavy lifting happened in
    the partial-aggregated groupBy)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("__m")
    ).agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    from pyspark.sql import Window

    w = Window.orderBy("__m")
    return monthly.select(
        F.col("__m").cast("date").alias("month"),
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("mom_delta"),
    )


@register(
    "tpch_q7_nation_volume",
    f"""SELECT supp_nation, cust_nation, l_year,
           {_sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate)::BIGINT AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY 1, 2, 3""",
)
def tpch_q7_nation_volume(spark, sf_dir):
    """Q7 volume shipping between two nations: the OR-of-nation-pairs
    predicate lands AFTER the broadcast dim joins (it needs both
    sides), but the two-value IN filters on each nation dim shrink the
    broadcast sides first, so the fact shuffle is lineitem↔orders only."""
    nations = ["NATION_1", "NATION_2"]
    n1 = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    n2 = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": ("1996-01-01", "1998-01-01")},
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                s.join(n1.withColumnRenamed("n_name", "supp_nation"),
                       F.col("s_nationkey") == n1["n_nationkey"])
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                c.join(n2.withColumnRenamed("n_name", "cust_nation"),
                       F.col("c_nationkey") == n2["n_nationkey"])
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    f"""SELECT o_year,
           {sql_quant('''CAST(sum(CASE WHEN nation = 'NATION_3'
                        THEN CAST(volume AS DECIMAL(27,6)) ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(27,6))) AS DOUBLE)''')} AS mkt_share
    FROM (
      SELECT year(o.o_orderdate)::BIGINT AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year""",
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 national market share: conditional-sum ratio per year; every
    dimension (part, supplier+nation, customer+nation+region) broadcasts,
    the two decimal sums share one aggregation pass."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(
        spark, sf_dir, "orders",
        ts_range={"o_orderdate": ("1996-01-01", "1998-01-01")},
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").withColumnRenamed("n_name", "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_side = F.broadcast(
        c.join(n1, F.col("c_nationkey") == n1["n_nationkey"])
         .join(r, n1["n_regionkey"] == F.col("r_regionkey"))
         .select("c_custkey")
    )
    supp_side = F.broadcast(
        s.join(n2, F.col("s_nationkey") == n2["n_nationkey"])
         .select("s_suppkey", "nation")
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(cust_side, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_side, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            quant(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(
                    F.lit(0).cast(_DEC))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q13_order_distribution",
    """WITH counts AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count::BIGINT AS c_count, count(*)::BIGINT AS custdist
    FROM counts GROUP BY c_count""",
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13 customer order-count distribution (sans the o_comment NOT LIKE
    filter — the synthetic orders table carries no comment column): the
    left join keeps zero-order customers, then a two-level aggregation.
    Both aggs hash-partition on their own keys; no dimension broadcast —
    customer and orders are both fact-sized here."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    counts = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "tpch_q15_top_supplier",
    f"""WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)""",
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15 top supplier: the correlated-max-view shape — revenue per
    supplier over one quarter, then only rows equal to the global max
    (ties kept, per spec). The max is a broadcast one-row aggregate
    joined back, never a driver-side collect."""
    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": ("1996-01-01", "1996-04-01")},
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("total_revenue")
    )
    best = rev.agg(F.max("total_revenue").alias("__best"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("__best"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q9_profit",
    f"""SELECT nation, o_year, {_sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY 1, 2""",
)
def tpch_q9_profit(spark, sf_dir):
    """Q9 product-type profit (adapted: the driver schema has no partsupp
    table, so unit cost is modeled as 0.6·p_retailprice — the canonical
    ps_supplycost averages ~60% of retail). Plan shape is canonical: the
    LIKE-filtered part dim and supplier⋈nation both broadcast, so the
    only fact shuffle is lineitem↔orders on orderkey; profit sums in
    exact DECIMAL per (nation, year)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sn = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(_dsum(amount).alias("sum_profit"))
    )


@register(
    "tpch_q17_small_quantity",
    f"""SELECT {sql_quant(_sql_dsum('l_extendedprice') + ' / 7.0')} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)""",
)
def tpch_q17_small_quantity(spark, sf_dir):
    """Q17 small-quantity-order revenue (adapted: p_type stands in for
    the schema's missing p_container). The correlated per-part average
    becomes ONE window over l_partkey on the already-part-pruned
    lineitems — the broadcast semi-filter on the 7 matching parts runs
    before the shuffle, so the window partitions only the matching
    rows, never the full fact table."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    matched = li.join(F.broadcast(p.select("p_partkey")),
                      F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    small = matched.withColumn(
        "__avg_qty", F.avg("l_quantity").over(w)
    ).filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
    return small.agg(
        quant(_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""SELECT {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)""",
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """Q19 discounted revenue under a three-branch disjunction (adapted:
    brand+size replace the schema's missing container/shipmode legs).
    The part-only half of each branch is REPLICATED as a standalone
    filter on the dim before the broadcast join — Catalyst can't split
    a mixed-table OR itself, so the hand-hoisted disjunction is what
    keeps the broadcast side at 3 brands instead of the whole part
    table; the full predicate then re-checks the quantity legs."""
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return joined.filter(branch).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue")
    )


@register(
    "tpch_q21_waiting_suppliers",
    """SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_3'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name""",
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """Q21 suppliers who kept orders waiting (adapted: the schema has no
    commit/receipt dates, so "late" is l_returnflag='R' — the supplier
    whose items came back). Canonical shape: the sole-offender test is a
    left-semi then left-anti self-join of lineitem on orderkey — both
    reuse one hash partitioning of the fact table, Spark plans a single
    exchange; supplier⋈nation broadcasts."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    l2 = li.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3")
    )
    sole = (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("__ok"))
            & (F.col("l_suppkey") != F.col("__sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "left_anti",
        )
    )
    sn = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        sole.join(F.broadcast(sn.select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "tpch_q22_lapsed_customers",
    """WITH eligible AS (
      SELECT c.c_nationkey, c.c_acctbal FROM customer c
      WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    )
    SELECT c_nationkey::BIGINT AS cntry, count(*)::BIGINT AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
    FROM eligible GROUP BY 1""",
)
def tpch_q22_lapsed_customers(spark, sf_dir):
    """Q22 global sales opportunity (adapted: nationkey stands in for the
    missing phone-prefix country code, and "no orders" — vacuous here,
    every customer has one — becomes "no orders since 2000-01-01").
    Canonical shape preserved: the positive-balance average is a one-row
    broadcast scalar, the recency check is a left-anti join against the
    date-pruned orders slice, and the final agg groups the survivors."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = load_table(
        spark, sf_dir, "orders", ts_range={"o_orderdate": ("2000-01-01", None)}
    ).filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    f"""WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
      GROUP BY 1, 2),
    best AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY unit_cost ASC, l_suppkey ASC) AS rn
      FROM cost)
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, s.s_acctbal,
           {sql_quant('b.unit_cost')} AS unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE b.rn = 1""",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 minimum-cost supplier (adapted: the schema has no partsupp, so
    the part–supplier cost relation is OBSERVED unit price — min
    l_extendedprice/l_quantity over each (part, supplier)'s lineitems).
    Canonical shape preserved: restrict parts by type/size, find each
    part's cheapest supplier (correlated-min → rank-1 window over the
    tiny per-pair cost table), report supplier account details.

    100 TB shape: the fact scan joins a broadcast filtered part dim and
    partially aggregates to (part, supplier) pairs before any shuffle;
    the rank window runs on that reduced pair table, never the fact;
    supplier/nation attach by broadcast."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("__uc"),
    )
    cost = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__uc").alias("unit_cost"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("l_suppkey").asc()
    )
    best = cost.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            quant(F.col("unit_cost")).alias("unit_cost"),
        )
    )


@register(
    "tpch_q11_important_stock",
    f"""WITH val AS (
      SELECT l.l_partkey,
             {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY 1)
    SELECT l_partkey AS p_partkey, value
    FROM val
    WHERE value > (SELECT {_sql_dsum('value')} * 2.0 / count(*) FROM val)""",
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 important stock (adapted: no partsupp, so per-part "stock
    value" is the revenue shipped by a three-nation supplier group).  Canonical
    shape preserved: a grouped value table filtered against a scalar
    threshold derived from its own total (2x the mean per-part value —
    scale-free, where the canonical fraction is spec-scaled by 1/SF) — the total is a ONE-ROW broadcast
    (cross-join of a single aggregate row, the engine's standard scalar
    pattern), never a second scan-side shuffle."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(
            supp.join(F.broadcast(nation),
                      F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")
        ), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("value"))
    )
    from time_series_db_spark.cache import persist_tracked

    val = persist_tracked(val)
    total = val.agg(
        (_dsum(F.col("value")) * F.lit(2.0) / F.count(F.lit(1))).alias("__thr")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


@register(
    "tpch_q12_late_priority",
    """SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1""",
)
def tpch_q12_late_priority(spark, sf_dir):
    """Q12 shipping modes / order priority (adapted: no
    l_shipmode/l_commitdate/l_receiptdate — linestatus stands in for
    the mode dimension and "late" is shipped >30 days after the order
    date, the same lateness surrogate Q4 uses).  Canonical shape
    preserved: one fact join, conditional counts as CASE-sum partial
    aggregates — two groups cross the shuffle, not 60k rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": ("1996-01-01", "1998-01-01")},
    ).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, (F.col("l_orderkey") == F.col("o_orderkey"))
                & (F.col("l_shipdate")
                   > F.date_add(F.col("o_orderdate"), 30)))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    """SELECT p.p_brand, p.p_type, p.p_size::BIGINT AS p_size,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY 1, 2, 3""",
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """Q16 parts/supplier relationship (adapted: no partsupp — the
    part–supplier association is observed shipments in lineitem; the
    canonical complaint-supplier NOT IN is dropped with the missing
    s_comment column).  Shape preserved: broadcast the filtered part
    dim, exact COUNT(DISTINCT) per part-attribute group — Catalyst
    expands it to a two-level aggregate with map-side partials."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_suppliers",
    f"""WITH shipped AS (
      SELECT l.l_suppkey,
             {_sql_dsum('l.l_quantity')} AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1)
    SELECT s.s_name, n.n_name, sh.qty
    FROM shipped sh
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.qty > (SELECT {_sql_dsum('qty')} * 0.5 / count(*) FROM shipped)""",
)
def tpch_q20_excess_suppliers(spark, sf_dir):
    """Q20 potential part promotion (adapted: no partsupp availqty — a
    supplier is "excess" when its 1997 shipped quantity of 'small%'
    parts exceeds half the mean shipped quantity).  Canonical shape
    preserved: name-prefix part filter broadcast into the date-pruned
    fact slice, per-supplier aggregate, scalar threshold broadcast,
    supplier/nation attach by broadcast."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        ts_range={"l_shipdate": ("1997-01-01", "1998-01-01")},
    ).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_quantity")).alias("qty"))
    )
    from time_series_db_spark.cache import persist_tracked

    shipped = persist_tracked(shipped)
    thr = shipped.agg(
        (_dsum(F.col("qty")) * F.lit(0.5) / F.count(F.lit(1))).alias("__thr")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        shipped.crossJoin(F.broadcast(thr))
        .filter(F.col("qty") > F.col("__thr"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "qty")
    )
