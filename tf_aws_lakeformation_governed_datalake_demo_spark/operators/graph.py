"""Graph analytics over the event lake: the co-purchase graph and its
triangle census.

Graph workloads arrive in every analytics engine the moment users ask
"who behaves together" — fraud rings, community detection, influence.
The iterative family already covers label-propagation components
(iterative.dedup_clusters); this module adds the canonical BOUNDED
one-shot graph aggregate: triangle counting with degree orientation
(Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW 2011) — each triangle is emitted exactly once, and the
join fan-out is bounded by out-degree <= O(sqrt(m)) instead of the max
raw degree, which is what makes the count feasible on power-law graphs
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

MIN_SHARED_HOURS = 2  # co-activity threshold that defines an edge


_TRIANGLE_ORACLE = f"""
    WITH p AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
               FROM events WHERE event_type = 'purchase'),
    e AS (SELECT a.user_id AS ua, b.user_id AS ub
          FROM p a JOIN p b ON a.h = b.h AND a.user_id < b.user_id
          GROUP BY 1, 2 HAVING count(*) >= {MIN_SHARED_HOURS}),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM (
              SELECT ua AS u FROM e UNION ALL SELECT ub FROM e)
            GROUP BY u),
    tri AS (SELECT count(*) AS t FROM e e1
            JOIN e e2 ON e2.ua = e1.ub
            JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT sum(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST(tri.t AS BIGINT) AS n_triangles,
           round(3.0 * tri.t / (SELECT sum(d * (d - 1) / 2) FROM deg), 4)
             AS clustering
    FROM tri
"""


def copurchase_edges(
    spark: SparkSession, sf_dir: str, max_hour_users: int | None = None
) -> DataFrame:
    """The co-purchase edge set (ua < ub): user pairs with purchases in
    >= MIN_SHARED_HOURS shared hours. Pairs generate within an hour
    bucket only (sum(bucket^2), never n_users^2), partial-aggregated on
    the pair key. Shared by the triangle census and PageRank.

    ``max_hour_users`` is the hot-bucket guard the 8x scale experiment
    motivated (BASELINE.md: co-occurrence graphs densify QUADRATICALLY
    in concurrent users per hour — 65x edges from 8x events): hours
    with more co-active purchasers than the cap are DROPPED before pair
    generation, exactly the dedup family's hot-shingle discipline — a
    crowd hour carries little pairwise signal and all of the quadratic
    cost. None (the registry default, so the oracles stay exact) keeps
    every hour; production sets it from the observed bucket histogram."""
    p = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("hour", "ts").alias("h"))
        .distinct()
    )
    if max_hour_users is not None:
        hot = (
            p.groupBy("h")
            .agg(F.count(F.lit(1)).alias("nu"))
            .filter(F.col("nu") > max_hour_users)
            .select("h")
        )
        p = p.join(hot, "h", "left_anti")
    pb = p.select(F.col("user_id").alias("ub_"), F.col("h").alias("hb"))
    return (
        p.join(pb, (F.col("h") == F.col("hb")) & (F.col("user_id") < F.col("ub_")))
        .groupBy(F.col("user_id").alias("ua"), F.col("ub_").alias("ub"))
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") >= MIN_SHARED_HOURS)
        .select("ua", "ub")
    )


@query(
    "graph_triangle_count",
    _TRIANGLE_ORACLE,
    "Triangle census of the co-purchase graph (edge = two users with "
    "purchases in >= 2 shared hours): node/edge/wedge/triangle counts "
    "and the global clustering coefficient 3T/W. Spark counts with "
    "degree orientation (each triangle found exactly once at its "
    "lowest-(degree, id) corner); the oracle counts naively over the "
    "same edge set — equal by construction.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale (the Suri-Vassilvitskii shape): orienting every edge from
    its lower-(degree, id) endpoint to the higher one makes every
    out-degree <= O(sqrt(m)), so the wedge-generation self-join fans
    out per-NODE by out-degree^2 of a bounded quantity — on power-law
    graphs the difference between a feasible job and the 'last reducer'
    holding a celebrity node's degree^2. Edge building is the bucket
    discipline again: pairs generate within an hour bucket only
    (sum(bucket^2), never n_users^2), partial-aggregated on the pair
    key. The closing-edge check is a semi-join against the canonical
    edge set; all three relations hash-partition on their join keys."""
    e = copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("ua").alias("u"))
        .unionAll(e.select(F.col("ub").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # orient each edge low-(degree, id) -> high-(degree, id)
    da = deg.select(F.col("u").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("ub"), F.col("d").alias("db"))
    ed = e.join(da, "ua").join(db, "ub")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("ua")).otherwise(F.col("ub")).alias("src"),
        F.when(a_first, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
    )
    # wedges at the orientation's low corner: (src -> x, src -> y), then
    # close with the canonical (min, max) edge
    o1 = oriented.select(F.col("src").alias("s"), F.col("dst").alias("x"))
    o2 = oriented.select(F.col("src").alias("s"), F.col("dst").alias("y"))
    wedge = o1.join(o2, "s").filter(F.col("x") < F.col("y"))
    closed = wedge.join(
        e,
        (F.least("x", "y") == F.col("ua")) & (F.greatest("x", "y") == F.col("ub")),
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).cast("long").alias("t"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").alias("n_triangles"),
            F.round(3.0 * F.col("t") / F.col("n_wedges"), 4).alias("clustering"),
        )
    )


PR_DAMPING = 0.85
PR_ITERATIONS = 15


@query(
    "graph_pagerank",
    None,
    "PageRank over the co-purchase graph (symmetric edges, damping "
    "0.85, 15 fixed power iterations from the uniform vector): top-20 "
    "users by influence rank. Iterative, so it takes the rows-only "
    "driver check; exactness is pinned by a numpy power-iteration "
    "cross-check in tests/test_iterative.py (identical ranks to 1e-9 "
    "and identical ordering).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other canonical graph aggregate next to the triangle census:
    influence scoring. Scale: each iteration is one join of the edge
    list against the rank vector (both hash-partitioned on the node
    key; the rank vector is nodes-sized, tiny next to edges) plus a
    partial-aggregated sum — the standard distributed power iteration.
    localCheckpoint every few rounds truncates the growing lineage
    (iterative.py's label-propagation rationale). Fixed iteration count
    keeps the result deterministic for the rows-only driver check and
    the numpy cross-check."""
    e = copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("ua").alias("src"), F.col("ub").alias("dst")).unionAll(
        e.select(F.col("ub").alias("src"), F.col("ua").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    sym = sym.join(deg, "src").localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("id")).distinct()
    n = nodes.count()
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    base = (1.0 - PR_DAMPING) / n
    for i in range(PR_ITERATIONS):
        contrib = (
            sym.join(ranks, sym["src"] == ranks["id"])
            .select(F.col("dst").alias("id"), (F.col("r") / F.col("d")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
        if i % 3 == 2:
            ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.select("id", F.round("r", 9).alias("rank"))
        .orderBy(F.desc("rank"), "id")
        .limit(20)
    )
