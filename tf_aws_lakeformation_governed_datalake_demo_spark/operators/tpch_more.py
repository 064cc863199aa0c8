"""The remaining classic TPC-H query shapes expressible over the driver
schema (no partsupp table; no commit/receipt dates, phone, container or
comment columns — predicates adapted accordingly, shapes preserved):

Q4 (exists semi-join), Q7 (two-nation volume by year), Q8 (market
share), Q10 (returned-item top customers), Q13 (customer order-count
distribution via left outer), Q15 (top supplier vs a max subquery),
Q17 (small-quantity threshold vs per-part average), Q19 (disjunctive
pushdown), Q22 (dormant high-balance customers via anti-join).

Together with Q1/Q3/Q5/Q6/Q12/Q14/Q18 elsewhere this covers 16 of the
22 TPC-H shapes directly. The remaining six (Q2/Q9/Q11/Q16/Q20/Q21)
need the partsupp table or the lineitem commit/receipt dates the
generator does not produce, so they are SHAPE adaptations: the distinct
(l_partkey, l_suppkey) pairs of lineitem stand in for partsupp as the
part-supplier bridge, min(l_extendedprice/l_quantity) for ps_supplycost
(Q2's correlated min), 0.6*p_retailprice*l_quantity for the Q9 cost
term, shipped-quantity sums for ps_availqty (Q11/Q20), s_acctbal < 0
for Q16's complaint suppliers, and shipping >700 days after the order
date for Q21's receipt-past-commit lateness. Every join topology,
subquery shape (correlated min, scalar-fraction HAVING, double
EXISTS/NOT EXISTS), and output grain is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query


def _cents(col):
    """Exact integer cents of a per-line money expression. Both engines
    compute the same per-line double (same IEEE ops in the same order),
    so the rounded cents agree — and an integer sum is order-independent,
    where summing raw doubles differs in the last ulp between engines and
    flips 2-decimal rounding at half-cent boundaries."""
    return F.round(col * 100).cast("long")


def _money_sum(col, alias: str):
    """Order-independent money sum displayed at 2 decimals."""
    return F.round(F.sum(_cents(col)).cast("double") / 100.0, 2).alias(alias)


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape: priority counts for orders with a late-shipping "
    "line (EXISTS semi-join; lateness = shipped after order date, the "
    "commit/receipt analog).",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the quarter filter pushes to the orders scan; the EXISTS is
    a left-semi hash join on the order key (no duplicate explosion, no
    distinct needed); the priority agg partial-aggregates to 5 rows."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(CAST(round((volume)*100) AS BIGINT)) AS DOUBLE)/100, 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l.l_shipdate) AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7: shipping volume between two nations by year, both "
    "directions.",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: supplier/customer/nation broadcast; the nation-pair
    predicate prunes fact rows right after the (broadcast) dim joins, so
    only qualifying lineitems reach the final small-key shuffle. The
    date filter pushes to the lineitem scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_money_sum(F.col("volume"), "revenue"))
    )


@query(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN CAST(round(volume*100) AS BIGINT)
                               ELSE 0 END) AS DOUBLE)
                 / sum(CAST(round(volume*100) AS BIGINT)), 4) AS mkt_share
    FROM (SELECT year(o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n1.n_regionkey
          JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    """,
    "TPC-H Q8: one nation's market share of ECONOMY-part volume sold "
    "into ASIA, by order year.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: every dim broadcasts; the part-type filter prunes the fact
    via the broadcast hash join before the orders shuffle join; the
    share is a ratio of two conditional partial sums per year."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey, "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _cents(F.col("volume"))).otherwise(
            F.lit(0).cast("long")
        )
    ).cast("double") / F.sum(_cents(F.col("volume")))
    return base.groupBy("o_year").agg(F.round(share, 4).alias("mkt_share"))


@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount))*100) AS BIGINT)) AS DOUBLE)/100, 2) AS revenue,
           round(CAST(any_value(c.c_acctbal) AS DOUBLE), 2) AS c_acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10: top-20 customers by revenue lost to returned items in a "
    "quarter.",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both filters push to their scans; customer/nation
    broadcast; one shuffle on the order key and one on the (bounded)
    customer grouping; top-20 is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.round(F.any_value("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    """,
    "TPC-H Q13: distribution of per-customer order counts (non-urgent "
    "orders; zero-order customers included via the left join).",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the orders side is pre-aggregated to (custkey, count)
    BEFORE the join, so the left join matches one row per customer
    instead of fanning out per order; the distribution agg is a tiny
    second shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount))*100) AS BIGINT)) AS DOUBLE)/100, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "TPC-H Q15: supplier(s) with the maximum quarterly revenue (CTE + "
    "scalar max subquery).",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: revenue is one partial-aggregated shuffle on l_suppkey
    (bounded by supplier count); the max is a scalar over that small
    frame and broadcasts back as a filter; supplier joins broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/700, 2)
             AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    "TPC-H Q17: revenue from small-quantity orders of one brand's parts "
    "(correlated per-part average threshold).",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the correlated subquery decorrelates to a per-part
    aggregate joined back — computed only for the brand's parts (the
    brand filter semi-joins lineitem first via the broadcast part dim),
    then one broadcast join of the tiny (partkey, threshold) frame."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(F.sum(_cents(F.col("l_extendedprice"))).cast("double") / 700.0, 2)
            .alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    """
    SELECT round(CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount))*100) AS BIGINT)) AS DOUBLE)/100, 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19: disjunctive brand/size/quantity predicate over a "
    "part-lineitem join.",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: part is broadcast; the single-table conjuncts of each
    disjunct (quantity ranges on lineitem, brand/size on part) are
    derivable by the optimizer as a pushable OR filter on each side, so
    both scans prune before the join; one final scalar agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "tpch_q22_dormant_customers",
    """
    WITH avg_bal AS (SELECT avg(c_acctbal) AS a FROM customer
                     WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(round((c.c_acctbal)*100) AS BIGINT)) AS DOUBLE)/100, 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
    "TPC-H Q22 shape: high-balance customers dormant since 2000 (scalar "
    "average subquery + anti-join; market segment stands in for the "
    "phone country code).",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the positive-balance average is a scalar broadcast; the
    NOT EXISTS is a left-anti hash join against orders pre-filtered (and
    scan-pruned) to the dormancy window; final agg groups 5 segments."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _money_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH esupp AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                   FROM supplier s
                   JOIN nation n ON s.s_nationkey = n.n_nationkey
                   JOIN region r ON n.n_regionkey = r.r_regionkey
                   WHERE r.r_name = 'EUROPE'),
    offers AS (SELECT l_partkey, l_suppkey,
                      min(l_extendedprice / l_quantity) AS offer
               FROM lineitem l JOIN esupp ON l.l_suppkey = esupp.s_suppkey
               GROUP BY 1, 2)
    SELECT round(CAST(es.s_acctbal AS DOUBLE), 2) AS s_acctbal,
           es.s_name, es.n_name, p.p_partkey,
           CAST(round(o.offer * 10000) AS BIGINT) / 10000.0 AS offer
    FROM offers o
    JOIN part p ON o.l_partkey = p.p_partkey
    JOIN esupp es ON o.l_suppkey = es.s_suppkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND o.offer = (SELECT min(o2.offer) FROM offers o2
                     WHERE o2.l_partkey = o.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    "TPC-H Q2 shape: for STANDARD size-15 parts, the EUROPE supplier(s) "
    "offering the regional minimum unit price (correlated min subquery; "
    "min lineitem unit price stands in for ps_supplycost).",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the correlated min decorrelates to a per-part aggregate of
    the (part, supplier) offer frame, joined back by exact double
    equality (both sides derive from the same min, so equality is safe);
    supplier/nation/region and the part filter all broadcast, so the
    only fact shuffle is the (part, supplier) offer aggregation."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    esupp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(esupp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("offer"))
    )
    min_offer = offers.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("offer").alias("mo")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        offers.join(
            F.broadcast(min_offer),
            (F.col("l_partkey") == F.col("m_partkey")) & (F.col("offer") == F.col("mo")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(esupp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            (F.round(F.col("offer") * 10000).cast("long") / F.lit(10000.0)).alias("offer"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                                      - 0.6 * p.p_retailprice * l.l_quantity)*100)
                               AS BIGINT)) AS DOUBLE)/100, 2) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    "TPC-H Q9 shape: profit on 'gear' parts by supplier nation and "
    "order year (0.6*p_retailprice*l_quantity stands in for the "
    "ps_supplycost term).",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the part-name filter prunes the fact through the broadcast
    part join before the orders shuffle; supplier and nation broadcast;
    the profit sum is exact integer cents (order-independent), grouped
    on (nation, year) — 25*|years| rows."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(_money_sum(F.col("profit"), "sum_profit"))
    )


@query(
    "tpch_q11_important_parts",
    """
    WITH base AS (SELECT l.l_partkey,
                         CAST(round((l.l_extendedprice * (1 - l.l_discount))*100)
                              AS BIGINT) AS val_cents
                  FROM lineitem l
                  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                  JOIN nation n ON s.s_nationkey = n.n_nationkey
                  WHERE n.n_name = 'NATION_1'),
    per_part AS (SELECT l_partkey AS p_partkey, sum(val_cents) AS sv
                 FROM base GROUP BY 1)
    SELECT p_partkey,
           round(CAST(sv AS DOUBLE)/100, 2) AS total_value
    FROM per_part
    WHERE CAST(sv AS DOUBLE) > 0.002 * (SELECT CAST(sum(sv) AS DOUBLE) FROM per_part)
    ORDER BY total_value DESC, p_partkey
    """,
    "TPC-H Q11 shape: parts whose revenue through NATION_1's suppliers "
    "exceeds a fraction of that nation's total (scalar-subquery HAVING; "
    "shipped revenue stands in for ps_supplycost*ps_availqty).",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the nation's supplier keys broadcast-semi-join the fact;
    one partial-aggregated shuffle to (partkey, cents); the grand total
    aggregates that already-small frame and broadcasts back as a scalar
    filter. Exact integer cents keep the fraction compare engine-equal."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_supp = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi"
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sv"))
    )
    total = per_part.agg(F.sum("sv").cast("double").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sv").cast("double") > F.lit(0.002) * F.col("tot"))
        .select(
            "p_partkey",
            F.round(F.col("sv").cast("double") / 100.0, 2).alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "p_partkey")
    )


@query(
    "tpch_q16_supplier_part_counts",
    """
    WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT b.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM bridge b
    JOIN part p ON b.l_partkey = p.p_partkey
    JOIN ok_supp ON b.l_suppkey = ok_supp.s_suppkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "TPC-H Q16 shape: distinct supplier counts per (brand, type, size) "
    "excluding one brand, one type, and negative-balance suppliers "
    "(the complaint-supplier analog); lineitem's distinct (part, "
    "supplier) pairs stand in for partsupp.",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the bridge distinct partial-aggregates map-side to one row
    per (part, supplier); part and the supplier exclusion broadcast; the
    count-distinct agg shuffles the pre-shrunk bridge on the 3 group
    columns only."""
    li = load(spark, sf_dir, "lineitem")
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    ok_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
    )
    return (
        bridge.join(F.broadcast(p), bridge.l_partkey == p.p_partkey)
        .join(F.broadcast(ok_supp), bridge.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_stock_suppliers",
    """
    WITH red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    q AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS tq
          FROM lineitem l JOIN red_parts rp ON l.l_partkey = rp.p_partkey
          GROUP BY 1, 2)
    SELECT s.s_name, round(CAST(s.s_acctbal AS DOUBLE), 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM q WHERE tq > 100)
    ORDER BY s.s_name
    """,
    "TPC-H Q20 shape: suppliers who moved >100 units of some 'red' part "
    "(nested IN-subquery chain part -> lineitem agg -> supplier; shipped "
    "quantity stands in for ps_availqty).",
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the part-name filter broadcasts into the fact scan; the
    (supplier, part) quantity agg partial-aggregates before its shuffle;
    the final IN is a broadcast left-semi join onto the tiny supplier
    dim. Quantities are integral doubles, so the threshold compare is
    exact in both engines."""
    rp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    q = (
        li.join(F.broadcast(rp), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 100)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(q, s.s_suppkey == q.l_suppkey, "left_semi")
        .select("s_name", F.round(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    WITH asia_supp AS (SELECT s_suppkey, s_name
                       FROM supplier s
                       JOIN nation n ON s.s_nationkey = n.n_nationkey
                       JOIN region r ON n.n_regionkey = r.r_regionkey
                       WHERE r.r_name = 'ASIA'),
    l1 AS (SELECT l.l_orderkey, l.l_suppkey,
                  CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 700 DAY
                       THEN 1 ELSE 0 END AS late
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderstatus = 'F'),
    ws AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l1 WHERE late = 1)
    SELECT a.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ws w
    JOIN asia_supp a ON w.l_suppkey = a.s_suppkey
    WHERE EXISTS (SELECT 1 FROM l1 l2
                  WHERE l2.l_orderkey = w.l_orderkey
                    AND l2.l_suppkey <> w.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = w.l_orderkey
                        AND l3.l_suppkey <> w.l_suppkey
                        AND l3.late = 1)
    GROUP BY a.s_name
    ORDER BY numwait DESC, s_name LIMIT 10
    """,
    "TPC-H Q21 shape: ASIA suppliers who were the sole late shipper on "
    "multi-supplier finished orders (EXISTS + NOT EXISTS pair; late = "
    "shipped >700 days after the order date, the commit/receipt analog).",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the double correlated EXISTS decorrelates to one
    aggregation — lineitem pre-aggregates to (order, supplier, any_late)
    grain, a second per-order agg counts suppliers and late suppliers,
    and the EXISTS pair becomes the predicate (late=1 AND n_supp>=2 AND
    n_late=1). One orderkey shuffle chain, no repeated correlated scans;
    region-filtered suppliers broadcast; top-10 is TakeOrderedAndProject.
    """
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 700 DAYS"), 1
    ).otherwise(0)
    ls = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("late"))
    )
    po = ls.groupBy(F.col("l_orderkey").alias("p_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    return (
        ls.join(po, ls.l_orderkey == po.p_orderkey)
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
