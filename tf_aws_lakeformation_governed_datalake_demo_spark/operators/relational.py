"""Relational operator surface (SURVEY.md §2.1-2.9 + §2.3/2.5/2.7 extensions).

Every query shape the reference executes (scan/project/filter/agg/sort/
limit/regexp-mask/view, outputs.tf:44-95) plus the full relational surface
a general engine needs (joins, windows, set ops, rollup/cube, having,
pivot), expressed Spark-first over the TPC-H-ish driver testdata.

Scale notes are per-query docstrings. The global discipline:
- dims (region/nation/customer-as-dim) are broadcast — no shuffle of the
  fact side for the join;
- fact-fact joins shuffle on the join key once and aggregate partially
  map-side (Catalyst does both when the plan is declarative);
- all filters/projections are plain column expressions => pushed into the
  parquet scan;
- no collect() anywhere in an operator path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

# --------------------------------------------------------------------------
# §2.1/2.2 — scans, projections, filters, predicates
# --------------------------------------------------------------------------


@query(
    "scan_project_filter",
    """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
    "P1/P2/P4 parity: projection + predicate, both pushed to the scan.",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: reads 4 of 11 columns (ReadSchema pruning) and skips row
    groups via the pushed l_quantity filter — I/O ∝ selectivity."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity") > 45)
    )


@query(
    "filter_in_between_like",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderpriority LIKE '1%'
    """,
    "P5 extensions: IN-list, BETWEEN, LIKE predicates.",
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(100000, 200000)
            & F.col("o_orderpriority").like("1%")
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )


@query(
    "project_string_funcs",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_mktsegment, 1, 3) AS seg3,
           c_name || ':' || c_mktsegment AS tagged
    FROM customer
    """,
    "F3-adjacent scalar string functions (upper/length/substr/concat).",
)
def project_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.concat("c_name", F.lit(":"), "c_mktsegment").alias("tagged"),
    )


@query(
    "mask_pii_expressions",
    r"""
    SELECT c_custkey,
           regexp_replace(c_name || '@example.com', '^([^@]{1,3}).*@', '***@') AS masked_email,
           regexp_replace(c_name, '\d', '*', 'g') AS masked_digits
    FROM customer
    """,
    "F1/F2 — the reference's masking expressions (outputs.tf:48-49) as "
    "engine scalar ops, applied over the driver testdata.",
)
def mask_pii_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark regexp_replace replaces globally; DuckDB needs the 'g' flag —
    same two patterns the reference ships, dual-tested per SURVEY.md §7.5."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace(
            F.concat("c_name", F.lit("@example.com")), r"^([^@]{1,3}).*@", "***@"
        ).alias("masked_email"),
        F.regexp_replace("c_name", r"\d", "*").alias("masked_digits"),
    )


@query(
    "case_when_bucketize",
    """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
    FROM orders GROUP BY 1
    """,
    "Conditional expressions (CASE WHEN) + aggregation.",
)
def case_when_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "date_parts_agg",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS oy,
           CAST(month(o_orderdate) AS BIGINT) AS om,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS rev
    FROM orders GROUP BY 1, 2
    """,
    "Date/time scalar functions + multi-key aggregation.",
)
def date_parts_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("oy"),
            F.month("o_orderdate").cast("long").alias("om"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )


# --------------------------------------------------------------------------
# §2.4 — aggregations
# --------------------------------------------------------------------------


@query(
    "agg_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
           round(CAST(avg(l_quantity) AS DOUBLE), 2) AS avg_qty,
           round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_price,
           round(CAST(avg(l_discount) AS DOUBLE), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A1/A2 at full width — TPC-H Q1 pricing summary (8 aggregates).",
)
def agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: partial (map-side) aggregation means the shuffle carries only
    |groups| x |aggs| rows per task, not 100 TB of lineitem."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    """
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    "Distinct aggregation (SURVEY.md §2.4 'not present' extension).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: exact distinct expands to a two-phase agg; for dashboards at
    100 TB prefer approx_count_distinct (see approx_distinct query)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_stats",
    """
    SELECT l_returnflag,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
    "min/max/avg/sum aggregate family.",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP hierarchy totals.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "CUBE cross-tab totals.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "Explicit GROUPING SETS.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM parquet.`{sf_dir}/lineitem.parquet`
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having",
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_nationkey HAVING count(*) >= 5
    """,
    "HAVING post-aggregation filter.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") >= 5)
    )


@query(
    "distinct_pairs",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "DISTINCT projection.",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# §2.3 — joins (extension surface: not present in reference)
# --------------------------------------------------------------------------


@query(
    "join_broadcast_dims",
    """
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    "Equi-join, broadcast strategy (dim ⋈ dim).",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: region is 5 rows at any SF — broadcast() makes this a
    map-side hash join with zero shuffle of nation."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
    )


@query(
    "join_3way_dims",
    """
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(avg(c.c_acctbal) AS DOUBLE), 2) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    "Snowflake 3-way join: fact ⋈ dim ⋈ dim, both dims broadcast.",
)
def join_3way_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
    )


@query(
    "join_fact_revenue",
    """
    SELECT o.o_orderpriority,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2) AS revenue,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    "Fact-fact equi-join (orders ⋈ lineitem) + aggregation.",
)
def join_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: lineitem is pre-aggregated to order grain on l_orderkey —
    the same shuffle key the join needs anyway — so map-side partial
    aggregation shrinks the shuffle to one row per order, the join output
    is order-grain, and ``count(DISTINCT o_orderkey)`` (which would force
    the two-phase expand path over the joined fact) becomes a plain
    ``count(*)``. At 100 TB bucketing both tables by orderkey removes the
    shuffle entirely; AQE splits skewed orderkey partitions at runtime."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("order_rev")
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("order_rev"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "join_left_null",
    """
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    "Left outer join preserving customers with zero orders.",
)
def join_left_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    "Left-semi join (EXISTS).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
    "Left-anti join (NOT EXISTS): customers with no very-large order. "
    "(The unfiltered variant is empty at every SF — all customers order.)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_theta_lag",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(avg(date_diff('day', o.o_orderdate, l.l_shipdate)) AS DOUBLE), 2) AS avg_ship_lag
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_shipdate > o.o_orderdate
    GROUP BY o.o_orderpriority
    """,
    "Theta join: equi key + inequality residual (ship after order).",
)
def join_theta_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the equi component keeps this a hash join; the inequality is
    a cheap post-join residual filter, never a cartesian product."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 2).alias(
                "avg_ship_lag"
            ),
        )
    )


@query(
    "tpch_q3_topk",
    """
    SELECT l.l_orderkey,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS odate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: 3-way join + agg + deterministic top-k.",
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: segment filter prunes customer before the join; top-k is
    TakeOrderedAndProject — no global sort materialization."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-01-01"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("odate")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_region_revenue",
    """
    SELECT n.n_name,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    "TPC-H Q5 shape: 6-way join, local-supplier constraint.",
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # The ASIA restriction reaches customers only through the local-supplier
    # nation match AFTER the two big joins; pushing it down as a broadcast
    # semi-join on the ~5 ASIA nation keys shrinks the customer⋈orders
    # shuffle ~5x (implied predicate: c_nationkey = s_nationkey ∈ ASIA).
    n2 = load(spark, sf_dir, "nation")
    r2 = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_keys = n2.join(F.broadcast(r2), n2.n_regionkey == r2.r_regionkey).select(
        F.col("n_nationkey").alias("asia_nationkey")
    )
    c = c.join(
        F.broadcast(asia_keys), c.c_nationkey == F.col("asia_nationkey"), "left_semi"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# §2.5 — window functions (extension surface)
# --------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    "Top-K per group via row_number window.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on the partition key; no global sort. Skewed
    customers are bounded by K output rows each."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running
    FROM orders
    """,
    "Running (cumulative) sum window.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running"),
    )


@query(
    "window_lag_delta",
    """
    SELECT o_custkey, o_orderkey,
           round(CAST(o_totalprice - lag(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 2) AS delta
    FROM orders
    """,
    "lag() — delta between consecutive orders per customer.",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta"),
    )


@query(
    "window_rank_parts",
    """
    SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk
      FROM part) t
    WHERE rnk <= 5
    """,
    "rank() with ties, filtered to the top 5 per brand.",
)
def window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


# --------------------------------------------------------------------------
# §2.7 — set operations (extension surface)
# --------------------------------------------------------------------------


@query(
    "set_union",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
    "UNION (distinct).",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
    "INTERSECT.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    """
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    """,
    "EXCEPT: BUILDING customers minus customers with a >300k order. "
    "(Nationkey variants are empty at every SF — suppliers span all "
    "nations.)",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
    )
    return c.subtract(o)


# --------------------------------------------------------------------------
# §2.6 — sorts / limits / top-k
# --------------------------------------------------------------------------


@query(
    "orderby_limit_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "O1-O3 — global top-k with deterministic tiebreak.",
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: Catalyst turns sort+limit into TakeOrderedAndProject — each
    task keeps a 10-row heap; no global range-partitioned sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# events — timestamped table (motivates §2.11; batch shapes here)
# --------------------------------------------------------------------------


@query(
    "events_hourly_agg",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(value) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    "Tumbling-window (hourly) aggregation over the event stream table.",
)
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "events_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id
    """,
    "Sessionization: 30-min inactivity gap via lag window (batch analog "
    "of streaming session_window).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id; gap detection is per-partition
    sequential — exactly how a 100 TB sessionize should run."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        e.select("user_id", "event_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "events_pivot_by_type",
    """
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
    "Pivot (cross-tab) of event counts per day.",
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


@query(
    "events_funnel_conversion",
    """
    WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'),
    v AS (SELECT user_id, min(ts) AS first_view
          FROM e WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS first_click
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.first_view
          GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS first_purchase
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.first_click
          GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / (SELECT count(*) FROM v), 4) AS view_to_click,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / (SELECT count(*) FROM c), 4) AS click_to_purchase
    """,
    "Ordered funnel conversion (view -> click -> purchase) over the "
    "launch window (first two days): a user advances a stage only with "
    "a later-timestamped event — the product analytics shape behind "
    "every conversion dashboard. The horizon keeps the stages "
    "discriminating (92 -> 41 -> 21 users at sf0.01; the full fixture "
    "month converges to everyone converting). Stage counts and step "
    "conversion rates.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: three per-user min-aggregations chained by user_id joins —
    every shuffle keys on user_id, so AQE coalesces them onto one
    exchange layout; the final stage counts are single-row reductions.
    No window functions (a per-user sort would work too but pays a
    per-partition sort for no benefit over min-aggregation)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    # one distributed reduction over the stage-joined per-user frame —
    # no driver-side math (c ⊆ v and p ⊆ c by construction)
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("first_view").alias("n_viewed"),
            F.count("first_click").alias("n_clicked"),
            F.count("first_purchase").alias("n_purchased"),
        )
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            F.round(F.col("n_clicked") / F.col("n_viewed"), 4).alias(
                "view_to_click"
            ),
            F.round(F.col("n_purchased") / F.col("n_clicked"), 4).alias(
                "click_to_purchase"
            ),
        )
    )


@query(
    "events_retention_cohorts",
    """
    WITH first_seen AS (SELECT user_id,
                               date_trunc('week', min(ts)) AS cohort_week
                        FROM events GROUP BY 1),
    active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
               FROM events)
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.week) // 7 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM first_seen f JOIN active a USING (user_id)
    GROUP BY 1, 2
    """,
    "Retention cohort triangle: users bucketed by first-seen week, "
    "counted active per subsequent week offset — the other half of "
    "every growth dashboard. Week 0 row per cohort = cohort size.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: first-seen is one min-aggregation; the activity table is a
    distinct over (user, week) — both shuffle on user_id, and the join
    reuses that key. Cohort output is weeks x weeks tiny."""
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        first_seen.join(active, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "events_sliding_distinct_users",
    """
    WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                   FROM events),
    days AS (SELECT DISTINCT day FROM daily)
    SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS u7
    FROM days d
    JOIN daily u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
    "EXACT trailing-7-day distinct users per day (round-13) — the "
    "sliding-window uniques every growth dashboard needs, where "
    "approximate sketches are the usual cop-out. Exact and "
    "shuffle-bounded: the corpus collapses once to the (day, user) "
    "distinct table; each (day, user) row then EXPLODES into the <= 7 "
    "window days it contributes to (equi-join against the present-day "
    "list — no range join, no per-day rescan), and the final distinct "
    "count runs on day-partitioned keys. The oracle states the same "
    "window declaratively as a date-range join.",
)
def events_sliding_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale: pass 1 is the only corpus-scale shuffle (distinct on
    (day, user) with map-side combine); the exploded contribution
    table is <= 7x the DISTINCT table (users x days, orders of
    magnitude under the event count), equi-joined against a broadcast
    day list and aggregated day-partitioned — no window function, no
    range join, nothing quadratic in days."""
    e = load(spark, sf_dir, "events")
    daily = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("u7"))
    )


@query(
    "join_salted_skew",
    """
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(c.c_acctbal) AS DOUBLE), 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "Explicitly salted join (8-way key salt) — the skew mitigation for "
    "keys AQE's split can't fix. Salting changes only the physical "
    "distribution, so the oracle is the PLAIN join: hash-equality proves "
    "semantic transparency.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the hot key's rows spread across n_salts tasks; the small
    side replicates n_salts-fold (keep it broadcast-sized x n_salts).
    Salt derives from a row-unique hash, not rand(), so re-runs are
    deterministic (driver hash-compares)."""
    from .skew import salt_join

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = salt_join(c, n, "c_nationkey", "n_nationkey", n_salts=8)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


_ANOMALY_ORACLE = """
    WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
               FROM events),
    spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                          AS DATE) AS day FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    cnts AS (SELECT CAST(ts AS DATE) AS day, event_type,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM events GROUP BY 1, 2),
    d AS (SELECT s.day, t.event_type, coalesce(c.cnt, 0) AS cnt
          FROM spine s CROSS JOIN types t
          LEFT JOIN cnts c ON c.day = s.day AND c.event_type = t.event_type),
    w AS (SELECT day, event_type, cnt,
                 avg(cnt) OVER w7 AS mu,
                 stddev_samp(cnt) OVER w7 AS sd,
                 count(*) OVER w7 AS n7
          FROM d
          WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT day, event_type, cnt, round((cnt - mu) / sd, 4) AS z,
           abs(round((cnt - mu) / sd, 4)) >= 2.0 AS is_anomaly
    FROM w WHERE n7 = 7 AND sd > 0
    ORDER BY day, event_type
"""


@query(
    "events_anomaly_zscore",
    _ANOMALY_ORACLE,
    "Trailing-window anomaly detection: per event_type daily counts "
    "on a DENSIFIED day spine (zero-event days present, so an outage "
    "day scores as the anomaly it is and the 7-row window is truly 7 "
    "calendar days) scored against the mean/stddev of the preceding "
    "7 days; |z| >= 2 flags the day. Emits EVERY scored day (not just "
    "anomalies) so the result is non-empty on calm data and the whole "
    "scoring is hash-verified, not just the flag.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitoring query every event lake runs nightly. Scale: one
    shuffle to daily (day, event_type) grains — a tiny table no matter
    the input size (map-side partial agg does the heavy lifting) —
    then per-type sequential window passes on the grain table. The
    grain is densified against a generated (day x type) spine before
    windowing (round-6 review): without it a zero-event day — the
    canonical outage anomaly — is simply ABSENT from the grain, never
    scored, and the 'trailing 7 rows' silently spans more than 7
    calendar days across the gap. The spine costs one 1-row bounds agg
    plus a generated-days x types grid (tiny). The anomaly flag derives
    from the ROUNDED z in both engines so the boundary case cannot
    diverge."""
    e = load(spark, sf_dir, "events")
    cnts = (
        e.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        ).agg(F.count("*").alias("cnt"))
    )
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    types = e.select("event_type").distinct()
    d = (
        spine.crossJoin(F.broadcast(types))
        .join(cnts, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )
    w7 = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    scored = d.select(
        "day",
        "event_type",
        "cnt",
        F.avg("cnt").over(w7).alias("mu"),
        F.stddev_samp("cnt").over(w7).alias("sd"),
        F.count("*").over(w7).alias("n7"),
    )
    z = F.round((F.col("cnt") - F.col("mu")) / F.col("sd"), 4)
    return (
        scored.filter((F.col("n7") == 7) & (F.col("sd") > 0))
        .select(
            "day",
            "event_type",
            "cnt",
            z.alias("z"),
            (F.abs(z) >= 2.0).alias("is_anomaly"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_path_transitions",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (SELECT user_id, ts, event_id, event_type,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
    t AS (SELECT lag(event_type) OVER (
                   PARTITION BY user_id, sid ORDER BY ts, event_id
                 ) AS src_type,
                 event_type AS dst_type
          FROM s)
    SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY src_type), 4) AS p
    FROM t WHERE src_type IS NOT NULL
    GROUP BY src_type, dst_type
    ORDER BY src_type, dst_type
    """,
    "Session path analysis: within 30-minute-gap sessions, count every "
    "(previous event type -> event type) transition and its per-source "
    "probability — the Markov transition matrix behind user-journey / "
    "next-action analytics. Session boundaries cut transitions (the "
    "last event of one session never links to the next session). "
    "Oracle replays gap-cumsum sessionization, the in-session lag, and "
    "the row-conditional probability normalization.",
)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id serves sessionization AND the
    in-session lag (the (user_id, sid) lag window is a restriction of
    the user_id partitioning, so no second exchange); the transition
    count is a tiny (types x types) aggregate with map-side partials,
    and the probability normalization is a window over that aggregate —
    O(distinct transitions), not O(events). Ties at identical
    timestamps order by event_id in BOTH engines, so the lag is
    deterministic."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros, not cast("long"): the cast truncates to whole
    # seconds, so a gap within 1 s of the 30-min boundary would
    # sessionize differently from the oracle's full-precision
    # timestamp comparison (the events_sessionize discipline).
    brk = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
    )
    s = e.withColumn("brk", brk).withColumn(
        "sid", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    ws = W.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    t = s.select(
        F.lag("event_type").over(ws).alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).filter(F.col("src_type").isNotNull())
    agg = t.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = W.partitionBy("src_type")
    return agg.select(
        "src_type",
        "dst_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 4).alias("p"),
    ).orderBy("src_type", "dst_type")


@query(
    "join_interval_overlap",
    """
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ), sess AS (
      SELECT user_id, sid,
             date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM s GROUP BY user_id, sid
    ), hours AS (
      SELECT unnest(generate_series(
        (SELECT date_trunc('hour', min(ts)) FROM events),
        (SELECT date_trunc('hour', max(ts)) FROM events),
        INTERVAL 1 HOUR)) AS hr
    )
    SELECT hr,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM hours JOIN sess ON sess.h0 <= hours.hr AND hours.hr <= sess.h1
    GROUP BY hr
    """,
    "Interval-overlap join (hourly concurrent sessions): 30-min-gap "
    "sessions become [start,end] intervals, overlap-joined against the "
    "hour dimension. The oracle runs the textbook THETA join (hours x "
    "sessions with a range predicate); the engine runs the scale form.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interval-join bucketing trick: a theta join (range predicate)
    has no equi-key, so Spark would nested-loop it — O(|hours| x
    |sessions|) with one poor parallelization axis. Instead each
    interval EXPLODES to the hour buckets it covers (``sequence`` —
    one map-side generator, output size = true overlap count) and the
    aggregation is an ordinary hash agg on the bucket key. Cost is
    O(sessions x mean_span) = the size of the join's own output; no
    join node at all.

    100 TB: sessionization shuffles once on user_id (same exchange as
    events_sessionize); the explode is map-side; the final agg
    partial-aggregates. Long-lived interval skew (one session spanning
    weeks => huge explode) is bounded by the session definition
    itself: a 30-min gap caps realistic spans. count(DISTINCT user_id)
    per hour is exact — at extreme fanout swap for approx_count_
    distinct, documented here rather than silently."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    # the running sum orders by (ts, event_id) like is_new's window:
    # duplicate per-user timestamps exist in this corpus, and an
    # untied accumulation order could split a tie group across two
    # sessions differently per engine (review finding, round 9)
    ws = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = (
        e.select("user_id", "event_id", "ts", is_new.alias("is_new"))
        .withColumn("sid", F.sum("is_new").over(ws))
        .groupBy("user_id", "sid")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
    )
    return (
        sess.select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "events_rfm_segments",
    """
    WITH u AS (
      SELECT user_id,
             date_diff('day', CAST(max(ts) AS DATE),
                       (SELECT CAST(max(ts) AS DATE) FROM events)) AS rec_days,
             CAST(count(*) AS BIGINT) AS freq,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(18,2)) END),
                      0) AS mon
      FROM events GROUP BY user_id
    ), t AS (
      SELECT user_id, mon,
             ntile(4) OVER (ORDER BY rec_days ASC, user_id) AS r,
             ntile(4) OVER (ORDER BY freq DESC, user_id) AS f,
             ntile(4) OVER (ORDER BY mon DESC, user_id) AS m
      FROM u
    )
    SELECT r, f, m,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(avg(mon) AS DOUBLE), 2) AS avg_monetary
    FROM t GROUP BY r, f, m
    """,
    "RFM segmentation: per-user recency/frequency/monetary quartiles "
    "(ntile with deterministic user_id tie-break; monetary summed as "
    "DECIMAL so quartile boundaries cannot drift on float summation "
    "order), aggregated to segment sizes.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle to the per-user profile (map-side partial
    agg), then three window ranks over the USER table — the small
    derivative, not the event log. A global ntile is a single-ordering
    operation; at extreme user counts swap for percentile_approx cut
    points computed in one pass and a map-side bucketize — the
    documented trade (exact quartiles vs no global sort). The global
    max(ts) is a 1-row broadcast."""
    e = load(spark, sf_dir, "events")
    gmax = e.agg(F.max("ts").cast("date").alias("gmax"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max("ts").cast("date").alias("umax"),
            F.count(F.lit(1)).alias("freq"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            ).alias("mon"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff("gmax", "umax").alias("rec_days"),
            "freq",
            "mon",
        )
    )
    t = u.select(
        "mon",
        F.ntile(4).over(W.orderBy(F.asc("rec_days"), F.asc("user_id"))).alias("r"),
        F.ntile(4).over(W.orderBy(F.desc("freq"), F.asc("user_id"))).alias("f"),
        F.ntile(4).over(W.orderBy(F.desc("mon"), F.asc("user_id"))).alias("m"),
    )
    return t.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("mon").cast("double"), 2).alias("avg_monetary"),
    )


@query(
    "events_ab_test",
    """
    WITH assign AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
             max(CASE WHEN event_type = 'purchase' AND value > 90
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), g AS (
      SELECT grp, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(converted) AS DOUBLE) AS conv
      FROM assign GROUP BY grp
    ), w AS (
      SELECT max(CASE WHEN grp = 0 THEN n END) AS n0,
             max(CASE WHEN grp = 0 THEN conv END) AS c0,
             max(CASE WHEN grp = 1 THEN n END) AS n1,
             max(CASE WHEN grp = 1 THEN conv END) AS c1
      FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control,
           CAST(n1 AS BIGINT) AS n_treatment,
           round(c0 / n0, 4) AS rate_control,
           round(c1 / n1, 4) AS rate_treatment,
           round((c1 / n1 - c0 / n0)
                 / sqrt(((c0 + c1) / (n0 + n1))
                        * (1 - (c0 + c1) / (n0 + n1))
                        * (1 / n0 + 1 / n1)), 4) AS z_stat,
           abs((c1 / n1 - c0 / n0)
               / sqrt(((c0 + c1) / (n0 + n1))
                      * (1 - (c0 + c1) / (n0 + n1))
                      * (1 / n0 + 1 / n1))) > 1.96 AS significant
    FROM w
    """,
    "Two-proportion A/B z-test on per-user high-value-purchase "
    "conversion (a purchase with value > 90; every synthetic user has "
    "SOME purchase, so plain conversion would be degenerate at 100%) "
    "(assignment = user_id parity — the deterministic hash-assignment "
    "every experimentation platform uses): pooled-variance z statistic "
    "+ the 95% significance verdict. On this uniform synthetic corpus "
    "the honest answer is 'not significant' — the operator measures, "
    "never manufactures, an effect.",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle to the per-user conversion flag (map-side
    partial max), a 2-group agg, and driver-free scalar arithmetic on
    a 1-row frame. The experimentation readout is the cheapest query
    in the warehouse — the point of precomputing assignment
    deterministically from the user id."""
    e = load(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("grp"), "converted"
    )
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("conv"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("c1"),
    )
    pooled = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    z = (F.col("c1") / F.col("n1") - F.col("c0") / F.col("n0")) / F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n0") + 1 / F.col("n1"))
    )
    return w.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.round(F.col("c0") / F.col("n0"), 4).alias("rate_control"),
        F.round(F.col("c1") / F.col("n1"), 4).alias("rate_treatment"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "events_anomaly_mad",
    """
    WITH cnts AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, median(cnt) AS med
      FROM cnts GROUP BY event_type
    ), mad AS (
      SELECT c.event_type, any_value(m.med) AS med,
             median(abs(c.cnt - m.med)) AS mad
      FROM cnts c JOIN med m USING (event_type)
      GROUP BY c.event_type
    )
    SELECT c.day, c.event_type, CAST(c.cnt AS BIGINT) AS cnt,
           round(0.6745 * (c.cnt - m.med) / m.mad, 4) AS robust_z,
           abs(round(0.6745 * (c.cnt - m.med) / m.mad, 4)) >= 3.5
             AS is_anomaly
    FROM cnts c JOIN mad m USING (event_type)
    WHERE m.mad > 0
    """,
    "Robust anomaly detection via median absolute deviation: per-type "
    "daily counts scored as 0.6745*(x - median)/MAD (the modified "
    "z-score, Iglewicz-Hoaglin 3.5 threshold). Unlike the mean/stddev "
    "z-score, a single extreme outage day cannot inflate the scale "
    "estimate and mask itself. Every scored day is emitted so calm "
    "data still hash-verifies the full scoring.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle to the (day, type) grain (map-side partial
    agg over the raw events), then two exact medians over the GRAIN
    table — a few thousand rows per type regardless of event volume;
    at extreme grain sizes swap percentile_approx for median in one
    place and the operator degrades gracefully (documented, not
    silent). Complements events_anomaly_zscore: same grain, robust
    location/scale."""
    e = load(spark, sf_dir, "events")
    cnts = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    med = cnts.groupBy("event_type").agg(
        F.expr("median(cnt)").alias("med")
    )
    mad = (
        cnts.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("median(abs(cnt - med))").alias("mad"),
        )
    )
    rz = F.round(
        0.6745 * (F.col("cnt") - F.col("med")) / F.col("mad"), 4
    )
    return (
        cnts.join(mad, "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "day",
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            rz.alias("robust_z"),
            (F.abs(rz) >= 3.5).alias("is_anomaly"),
        )
    )
