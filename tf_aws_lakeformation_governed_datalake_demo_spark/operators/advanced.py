"""Advanced relational operators: as-of/range joins, percentiles,
approximate aggregates, unpivot, subquery shapes, null ordering, richer
window frames — the long tail a general engine needs beyond the
reference's own query corpus (SURVEY.md §2.3/2.4/2.5 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load
from .registry import query


@query(
    "asof_join_events",
    """
    WITH ce AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT user_id, event_id, ts AS purchase_ts,
           last_click_ts,
           CASE WHEN last_click_ts IS NULL THEN NULL
                ELSE CAST(epoch_us(ts) - epoch_us(last_click_ts) AS BIGINT) END AS lag_us
    FROM (
      SELECT user_id, event_id, ts, event_type,
             last_value(click_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM ce) t
    WHERE event_type = 'purchase'
    """,
    "As-of join: each purchase paired with the user's most recent click "
    "at-or-before it (union + last_value IGNORE NULLS — Spark has no "
    "native as-of join; this is the scalable composition).",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id, sequential scan per partition —
    identical cost profile to a native as-of join; no range explosion."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    ce = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = ce.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return t.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        F.when(
            F.col("last_click_ts").isNull(), F.lit(None).cast("long")
        ).otherwise(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
        ).alias("lag_us"),
    )


@query(
    "range_join_price_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 950.0),
             ('mid', 950.0, 1050.0),
             ('premium', 1050.0, 100000.0)
    )
    SELECT b.band, CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(avg(p.p_retailprice) AS DOUBLE), 2) AS avg_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    "Range (interval) join against a banding dimension — broadcast "
    "nested-loop on a tiny band table.",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the band table broadcasts, so the inequality join is a
    map-side scan per row against 3 bands — no shuffle, no N^2."""
    p = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 950.0), ("mid", 950.0, 1050.0), ("premium", 1050.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


@query(
    "agg_percentiles",
    """
    WITH t AS (
      SELECT l_returnflag AS f, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT f AS l_returnflag,
           max(CASE WHEN rn = ceil(0.25 * n) THEN v END) AS p25,
           max(CASE WHEN rn = ceil(0.50 * n) THEN v END) AS p50,
           max(CASE WHEN rn = ceil(0.75 * n) THEN v END) AS p75
    FROM t GROUP BY f
    """,
    "Exact *discrete* percentiles per group (element at ceil(p*n) — "
    "bit-exact across engines; interpolated quantiles differ in the last "
    "ulp between implementations, which breaks value-hash oracles on "
    "money data).",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale note: exact percentiles shuffle+sort per group; at 100 TB use
    approx_aggregates (below) — sketch-based, no global sort."""
    li = load(spark, sf_dir, "lineitem")
    w_sort = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    w_all = W.partitionBy("l_returnflag")
    t = li.select(
        F.col("l_returnflag"),
        F.col("l_extendedprice").alias("v"),
        F.row_number().over(w_sort).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )

    def at(p: float):
        return F.max(F.when(F.col("rn") == F.ceil(p * F.col("n")), F.col("v")))

    return t.groupBy("l_returnflag").agg(
        at(0.25).alias("p25"), at(0.50).alias("p50"), at(0.75).alias("p75")
    )


@query(
    "approx_aggregates",
    None,
    "Sketch-based aggregates: approx_count_distinct (HLL) + "
    "percentile_approx (KLL-ish) — the 100 TB path for distincts and "
    "quantiles. Approximate => rows-only check; error bounds asserted in "
    "tests/test_advanced.py.",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
    )


@query(
    "unpivot_event_counts",
    """
    SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
    "Unpivot (stack): wide per-type counts melted back to long form — "
    "round-trips the events_pivot_by_type cross-tab.",
)
def unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import events_pivot_by_type

    types = ["click", "error", "purchase", "signup", "view"]
    wide = events_pivot_by_type(spark, sf_dir)
    stack_expr = "stack({n}, {args}) as (event_type, n)".format(
        n=len(types), args=", ".join(f"'{t}', {t}" for t in types)
    )
    return wide.selectExpr("day", stack_expr).filter(F.col("n") > 0)


@query(
    "cte_correlated_subquery",
    """
    WITH nation_avg AS (
      SELECT c_nationkey, avg(c_acctbal) AS nat_avg
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c JOIN nation_avg a ON c.c_nationkey = a.c_nationkey
    WHERE c.c_acctbal > a.nat_avg
    """,
    "CTE + decorrelated 'above the group average' subquery shape. "
    "Outputs raw values: the avg itself differs ~1e-12 across engines "
    "(summation order), so derived differences would flip at rounding "
    "boundaries while the > comparison is stable.",
)
def cte_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    nation_avg = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nat_avg")
    )
    return (
        c.join(F.broadcast(nation_avg), c.c_nationkey == nation_avg.nk)
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@query(
    "nulls_ordering_topk",
    """
    SELECT c.c_custkey, max(o.o_totalprice) AS max_price
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY max_price DESC NULLS FIRST, c.c_custkey
    LIMIT 20
    """,
    "Explicit NULLS FIRST ordering over an outer-join aggregate.",
)
def nulls_ordering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.max("o_totalprice").alias("max_price"))
        .orderBy(F.desc_nulls_first("max_price"), "c_custkey")
        .limit(20)
    )


@query(
    "window_ntile_percent",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(CAST(percent_rank() OVER w AS DOUBLE), 6) AS pct_rank,
           round(CAST(cume_dist() OVER w AS DOUBLE), 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    "ntile / percent_rank / cume_dist ranking windows.",
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "window_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar
    FROM orders
    """,
    "RANGE-frame window: orders within $10k below the current price.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).cast("long").alias("n_similar"),
    )


@query(
    "join_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nk,
           CAST(coalesce(cn.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(coalesce(sn.n_supp, 0) AS BIGINT) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    "Full outer join with coalesced keys and zero-filled counts.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return cn.join(sn, cn.nk == sn.nk, "full_outer").select(
        F.coalesce(cn.nk, sn.nk).alias("nk"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 4) AS sq,
           round(ln(l_extendedprice + 1), 4) AS lg,
           round(CAST(abs(l_discount - 0.05) AS DOUBLE), 4) AS ad,
           CAST(ceil(l_quantity) AS BIGINT) AS cq,
           CAST(floor(l_quantity) AS BIGINT) AS fq,
           round(CAST(pow(l_tax + 1, 2) AS DOUBLE), 6) AS p2
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
    "Math scalar family: sqrt/ln/abs/ceil/floor/pow.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("lg"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("ad"),
        F.ceil("l_quantity").cast("long").alias("cq"),
        F.floor("l_quantity").cast("long").alias("fq"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("p2"),
    )


@query(
    "date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow  -- Spark: 1=Sunday
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    "Date arithmetic: interval add, last_day, quarter trunc, day-of-week.",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.expr("CAST(o_orderdate + INTERVAL 30 DAY AS DATE)").alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
    )


@query(
    "string_advanced",
    """
    SELECT p_partkey,
           lpad(p_brand, 12, '.') AS padded,
           reverse(p_name) AS rev,
           replace(p_type, ' ', '_') AS snake,
           split_part(p_type, ' ', 1) AS first_word,
           CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
           repeat(p_brand, 2) AS doubled
    FROM part WHERE p_partkey % 10 = 0
    """,
    "String scalar family: lpad/reverse/replace/split_part/strpos/repeat.",
)
def string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, ".").alias("padded"),
        F.reverse("p_name").alias("rev"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("snake"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
        F.repeat("p_brand", 2).alias("doubled"),
    )


_BLOOM_BITS = 1 << 16  # 64 Kbit bitmap -> 1024 packed longs
_BLOOM_WORDS = _BLOOM_BITS // 64


def _bloom_positions(key_col):
    """Two md5-derived bit positions per key (k=2 bloom hashes) —
    deterministic, engine-independent."""
    h = F.md5(key_col.cast("string"))
    p1 = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % _BLOOM_BITS
    p2 = F.conv(F.substring(h, 5, 4), 16, 10).cast("long") % _BLOOM_BITS
    return p1, p2


@query(
    "join_bloom_pruned_revenue",
    """
    WITH o AS (SELECT o_orderkey, o_orderpriority FROM orders
               WHERE o_orderdate >= DATE '1995-03-01'
                 AND o_orderdate < DATE '1995-04-01'
                 AND o_orderpriority = '1-URGENT')
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
             AS revenue
    FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    "Bloom-filter semi-join reduction: the urgent-March-1995 order keys "
    "build a 64 Kbit / k=2 bloom bitmap (driver-collected 1024 longs), "
    "the fact scan drops non-member rows MAP-SIDE before any shuffle, "
    "and the surviving sliver exact-joins (bloom passes a superset, so "
    "the join result — and the oracle, which is the plain join — is "
    "exactly equal).",
)
def join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semi-join reduction for the regime broadcast can't reach: a
    dimension too big to broadcast but whose KEY SET fits a bloom filter
    (100M keys ~ a few hundred MB of bitmap vs tens of GB of rows).
    Spark's AQE injects runtime bloom filters for some shapes
    (spark.sql.optimizer.runtime.bloomFilter); this operator is the
    explicit, plannable form — build once, reuse across queries.

    Scale: the bitmap build is one partial-aggregated bit_or over the
    filtered dim keys (1024 result rows, O(1) driver collect); the fact
    scan evaluates two bit tests per row inside codegen and drops
    non-members BEFORE the join's exchange — at a 0.1% match rate that
    is a ~1000x shuffle reduction. The exact join afterwards keeps
    semantics identical to the plain join (false positives are
    eliminated there), which is why the oracle needs no bloom at all.
    The join is forced to sort-merge (hint) to model the
    too-big-to-broadcast dimension this trick exists for."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_orderpriority")

    p1, p2 = _bloom_positions(F.col("o_orderkey"))
    words = (
        o.select(F.explode(F.array(p1, p2)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * _BLOOM_WORDS
    for r in words:
        bitmap[int(r["w"])] = int(r["bits"])
    bm = F.array(*[F.lit(x) for x in bitmap])

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    q1, q2 = _bloom_positions(F.col("l_orderkey"))
    staged = li.withColumn(
        "w1", F.element_at(bm, ((q1 / 64).cast("long") + 1).cast("int"))
    ).withColumn(
        "w2", F.element_at(bm, ((q2 / 64).cast("long") + 1).cast("int"))
    ).withColumn("p1", q1).withColumn("p2", q2)
    # dynamic shift amounts need the SQL form (the Python shiftright
    # wrapper takes a literal int only)
    pruned = staged.filter(
        F.expr(
            "(shiftright(w1, CAST(p1 % 64 AS INT)) & 1) = 1 AND "
            "(shiftright(w2, CAST(p2 % 64 AS INT)) & 1) = 1"
        )
    ).drop("w1", "w2", "p1", "p2")
    joined = pruned.join(
        o.hint("merge"), pruned["l_orderkey"] == o["o_orderkey"]
    )
    # integer-cents sum (the tpch_more discipline): per-line money
    # rounds to exact cents in both engines, and the integer sum is
    # order-independent — an unordered double sum could flip the
    # 2-decimal round on a half-cent boundary
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(F.sum(cents).cast("double") / 100.0, 2).alias("revenue"),
    )
