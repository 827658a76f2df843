"""The rest of the TPC-H family: Q2/Q9/Q11/Q12/Q16/Q20/Q21 shapes.

Completes the 22-query public-spec family over the driver's reduced
star schema. The fixture has no ``partsupp`` table, so the four queries
that consume it (Q2/Q11/Q16/Q20) derive the part⋈supplier relation from
``lineitem`` instead: "supply cost" is the observed average unit price
a supplier charged for a part, "stock value" is shipped quantity priced
at retail, and "available quantity" is the quantity actually shipped.
The decorrelated shapes — argmin-per-group join-back (Q2), global-share
HAVING (Q11), NOT-IN anti-join + COUNT DISTINCT (Q16), nested semi-join
(Q20), EXISTS/NOT-EXISTS self-checks (Q21) — are the spec's, unchanged.

Scale posture:
* Q2/Q11/Q20 pre-aggregate lineitem to (partkey, suppkey) grain FIRST
  (60 k rows -> 2 k·100 pairs; at 100 TB this is the classic
  reduce-before-join), then all remaining joins are broadcasts.
* Q21 replaces the spec's two correlated EXISTS self-joins over the
  fact with ONE per-order aggregate (distinct suppliers, distinct late
  suppliers) joined back on orderkey — two shuffles on the same key
  instead of three fact-sized probes; provably equivalent (see
  docstring) and the oracle keeps the literal EXISTS form as the
  cross-check.
* Q9/Q12 are single fact⋈fact shuffles with every dimension broadcast,
  like the Q7/Q8 siblings in ``tpch_deep``.

Reference parity: the reference's analytics surface is the ranking /
rollup family in DOCUMENTATION.md:286-340; the TPC-H set is the
scale-proof superset the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             round(avg(l_extendedprice / l_quantity), 6) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ), eligible AS (
      SELECT c.partkey, c.suppkey, c.supplycost
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           e.supplycost
    FROM eligible e
    JOIN (SELECT partkey, min(supplycost) AS mc FROM eligible GROUP BY 1) m
      ON m.partkey = e.partkey AND m.mc = e.supplycost
    JOIN part p ON p.p_partkey = e.partkey
    JOIN supplier s ON s.s_suppkey = e.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc=(
        "TPC-H Q2 minimum-cost supplier (public spec shape; supply cost "
        "derived from lineitem unit prices — no partsupp in fixture). "
        "Argmin-per-part via a partkey window over the pre-aggregated "
        "(part, supplier) relation; every dimension broadcasts. The min "
        "is taken over the 6dp-ROUNDED cost so the cross-engine equality "
        "match cannot flip on summation order."
    ),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias(
            "supplycost"
        )
    )
    eligible = (
        cost.join(F.broadcast(s), F.col("suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("partkey", "suppkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("partkey")
    return (
        eligible.withColumn("mc", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("mc"))
        .join(F.broadcast(p), F.col("partkey") == p["p_partkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.4 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    doc=(
        "TPC-H Q9 product-type profit (public spec shape; supply cost "
        "proxied as 40% of retail price — no partsupp in fixture): profit "
        "on red-named parts by supplier nation and order year. part/"
        "supplier/nation broadcast; lineitem⋈orders is the one shuffle."
    ),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.4 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH scoped AS (
      SELECT l.l_partkey AS partkey, l.l_quantity * p.p_retailprice AS val
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
    )
    SELECT partkey, round(sum(val), 2) AS value
    FROM scoped
    GROUP BY partkey
    HAVING round(sum(val), 6) > round((SELECT sum(val) * 0.001 FROM scoped), 6)
    """,
    doc=(
        "TPC-H Q11 important stock (public spec shape; stock value derived "
        "as shipped quantity at retail price — no partsupp in fixture): "
        "parts whose NATION_5-supplied value exceeds 0.1% of that nation's "
        "total. The global total rides as a broadcast one-row join; the "
        "HAVING compares 6dp-rounded sums so summation order can't flip "
        "borderline parts across engines."
    ),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    scoped = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("l_quantity") * F.col("p_retailprice")).alias("val"),
        )
    )
    per_part = scoped.groupBy("partkey").agg(F.sum("val").alias("raw"))
    total = scoped.agg((F.sum("val") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.round(F.col("raw"), 6) > F.round(F.col("threshold"), 6))
        .select("partkey", F.round(F.col("raw"), 2).alias("value"))
    )


@register(
    "tpch_q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    doc=(
        "TPC-H Q12 shipping-priority split (public spec shape; the fixture "
        "has no l_shipmode/commitdate, so the grouping is l_linestatus and "
        "'late' is shipped >30 days after order date): conditional counts "
        "of urgent vs other orders among late 1997 shipments. One shuffle "
        "(orderkey join); the year filter prunes the lineitem scan."
    ),
)
def tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q16 supplier relationship (public spec shape; the part⋈"
        "supplier relation comes from lineitem and 'complaint' suppliers "
        "are those with negative account balance — no partsupp/comment in "
        "fixture): distinct supplier count per (brand, type, size) bucket, "
        "excluding flagged suppliers via a broadcast anti-join. The "
        "count-distinct is the one shuffle."
    ),
)
def tpch_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
    )
    flagged = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(flagged),
            li["l_suppkey"] == flagged["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY 1, 2
    ), dominant AS (
      SELECT sh.suppkey
      FROM shipped sh
      JOIN (SELECT partkey, sum(qty) AS total FROM shipped GROUP BY 1) t
        ON t.partkey = sh.partkey
      JOIN part p ON p.p_partkey = sh.partkey
      WHERE p.p_name LIKE 'red%'
        AND round(sh.qty, 6) > round(0.3 * t.total, 6)
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT suppkey FROM dominant)
    """,
    doc=(
        "TPC-H Q20 potential part promotion (public spec shape; "
        "'availability' is the quantity actually shipped in the year — no "
        "partsupp in fixture): suppliers who shipped >30% of any red part's "
        "1998 volume, via a nested semi-join. lineitem pre-aggregates to "
        "(part, supplier) grain first; the part total is a window over "
        "that grain (no self-join subtree recompute); suppliers resolve "
        "via broadcast semi-join."
    ),
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    shipped = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.sum("l_quantity").alias("qty"))
    # Per-part total as a window over the pair grain: hashpartitioning
    # on (partkey, suppkey) from the aggregate does NOT satisfy the
    # window's partkey distribution, but the window input is already
    # pair-grain (|parts|·|supps| rows, not fact rows), so the second
    # exchange is tiny — cheaper than the self-join alternative, which
    # recomputes the whole aggregate subtree.
    w = Window.partitionBy("partkey")
    dominant = (
        shipped.withColumn("total", F.sum("qty").over(w))
        .join(F.broadcast(p), F.col("partkey") == p["p_partkey"])
        .filter(F.round(F.col("qty"), 6) > F.round(0.3 * F.col("total"), 6))
        .select("suppkey")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(dominant), s["s_suppkey"] == F.col("suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


@register(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late = 1
      AND EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc=(
        "TPC-H Q21 suppliers who kept orders waiting (public spec shape; "
        "'late' is shipped >60 days after order date — no receipt/commit "
        "dates in fixture): late lines on finished multi-supplier orders "
        "where this supplier was the ONLY late one. The spec's two "
        "correlated EXISTS self-joins are decorrelated into per-order "
        "collect_set windows — (distinct suppliers, distinct late "
        "suppliers) — on ONE orderkey shuffle: EXISTS(other supplier) ⇔ "
        "n_supp > 1, NOT EXISTS(other late supplier) ⇔ n_late_supp = 1 "
        "given this line is late. The oracle keeps the literal EXISTS "
        "form as the cross-check."
    ),
)
def tpch_q21_suppliers_who_kept_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            )
            .cast("int")
            .alias("is_late"),
        )
    )
    # Per-order supplier counts as collect_set windows, not a groupBy +
    # join-back: one orderkey shuffle serves both counts, and order size
    # is bounded (single-digit lines), so the sets are tiny.
    w = Window.partitionBy("l_orderkey")
    with_counts = late.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("is_late") == 1, F.col("l_suppkey"))
            ).over(w)
        ),
    )
    return (
        with_counts.filter(F.col("is_late") == 1)
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
