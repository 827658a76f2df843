"""TPC-H-style analytical queries over the fixture star schema.

The reference's grouped rollups / rankings (SURVEY.md §D5-D8, §E5) are
small; these exercise the same operator family — multi-way joins, hash
aggregates, top-k — at the scale the bench runs (sf0.1, ~600k
lineitem). Shapes follow the public TPC-H specification (Q1/Q3/Q5/Q6
families), adapted to the driver's reduced schemas.

Scale posture notes:
* Q1: single scan + hash agg on a 6-combo key — partial aggregation
  (map-side combine) collapses 600k rows to 6 before the shuffle.
* Q3/Q5: fact-to-fact joins shuffle on the join keys; dimensions
  (customer/supplier/nation/region) broadcast. At 100 TB the orders⋈
  lineitem shuffle is the cost center — co-partitioning/bucketing both
  fact tables on orderkey removes it (storage.layout documents this).
* Money sums are rounded to 2dp on both engines: at sf0.01 the
  cross-engine summation-order error is << the rounding quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem, (SELECT max(l_shipdate) AS maxd FROM lineitem)
    WHERE l_shipdate <= maxd - INTERVAL 90 DAY
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary (public spec), D5/D6-family hash aggregate at scale.",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    maxd = li.agg(F.max("l_shipdate").alias("maxd"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.crossJoin(F.broadcast(maxd))
        .filter(F.col("l_shipdate") <= F.col("maxd") - F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority (public spec), fact-fact join + top-k ranking (E5 family).",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'AMERICA', 'EUROPE', 'AFRICA', 'MIDDLE EAST')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 local supplier volume (public spec): 6-way join, dimensions broadcast.",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast revenue (public spec): pure scan + pushed-down predicate.",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "brand_revenue_ranking",
    oracle="""
    SELECT p.p_brand, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="E5 global ranking family: per-brand revenue, part dimension broadcast.",
)
def brand_revenue_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "nation_customer_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="D5/D8 family: two-level dimension rollup (region -> nation).",
)
def nation_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    WITH maxd AS (SELECT max(o_orderdate) AS md FROM orders)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders, maxd
    WHERE o_orderdate >= md - INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 family (order-priority checking), adapted to the reduced "
        "schema: orders in the trailing quarter with at least one lineitem "
        "shipped after the order date, counted per priority. The EXISTS is a "
        "LEFT SEMI hash join on l_orderkey with the date inequality as a "
        "residual — the fact table is never duplicated into the aggregate, "
        "which is what keeps the shape safe when lineitem is the 100 TB side."
    ),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    maxd = orders.agg(F.max("o_orderdate").alias("md"))
    recent = orders.crossJoin(F.broadcast(maxd)).filter(
        F.col("o_orderdate") >= F.col("md") - F.expr("INTERVAL 90 DAYS")
    )
    shipped_late = recent.join(
        li,
        (recent["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > recent["o_orderdate"]),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 family (customer order distribution): outer join with an "
        "ON-clause predicate (kept customers with zero qualifying orders must "
        "survive, so the filter CANNOT be a WHERE), two-level aggregate. "
        "Exercises null-generating join + count(col) null semantics."
    ),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           round(o_totalprice, 2) AS total_price,
           round(q, 2) AS total_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS q FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 200) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc=(
        "TPC-H Q18 family (large-volume customers): aggregate lineitem per "
        "order FIRST, filter to the rare heavy orders, THEN join orders + "
        "customer. Agg-before-join is the decisive scale ordering — the "
        "join input shrinks from every lineitem row to the handful of "
        "qualifying orders; the customer dimension broadcasts."
    ),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
    )
    return (
        big.join(orders, orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("q", 2).alias("total_qty"),
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    WITH maxd AS (SELECT max(o_orderdate) AS md FROM orders),
    rev AS (
      SELECT c_custkey, c_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey, maxd
      WHERE l_returnflag = 'R' AND o_orderdate >= md - INTERVAL 90 DAY
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rn FROM rev)
    WHERE rn <= 20
    """,
    doc=(
        "TPC-H Q10 family (returned-item top customers): fact-to-fact join "
        "filtered to returns in the trailing quarter, revenue per customer, "
        "top-20. Ranking is on the ROUNDED revenue with c_custkey tiebreak so "
        "cross-engine float summation order can't reorder the cut. The "
        "returnflag + date filters push to the scans before the join."
    ),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    nation = table(spark, sf_dir, "nation")
    maxd = orders.agg(F.max("o_orderdate").alias("md"))
    recent = orders.crossJoin(F.broadcast(maxd)).filter(
        F.col("o_orderdate") >= F.col("md") - F.expr("INTERVAL 90 DAYS")
    )
    rev = (
        li.filter(F.col("l_returnflag") == "R")
        .join(recent, li["l_orderkey"] == recent["o_orderkey"])
        .join(F.broadcast(customer), recent["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # orderBy + limit compiles to TakeOrderedAndProject: each partition keeps
    # its local top-20 and only those reach the driver-side merge — no
    # single-partition global Sort (which a row_number() window would force).
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)
