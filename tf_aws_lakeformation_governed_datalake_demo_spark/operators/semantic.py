"""Cluster-scoped semantic deduplication (the SemDeDup shape: Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023).

The embedding-dedup family already bounds candidate generation with
hyperplane LSH bands (dedup.embedding_cosine_pairs_lsh). SemDeDup is the
other published scale-out shape: cluster the corpus once with a coarse
quantizer, then compare pairs ONLY within a cluster — candidate cost is
sum(cluster_size^2) instead of N^2, and clustering doubles as the
routing index the ANN family (similarity.ann_ivf_cosine) already
maintains. Here the coarse quantizer is the same per-label centroid
table the IVF family uses (one definition — similarity.label_centroids),
so the whole pipeline is deterministic and the DuckDB oracle replays
centroid computation, nearest-centroid assignment, and in-cluster
pairwise cosine exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load
from .registry import query
from .similarity import _dot, _with_norm, collapse_exact_vectors, label_centroids

SEM_THRESHOLD = 0.3  # same regime the embedding-cosine family operates in
_DIM = 64


_SEMDEDUP_ORACLE = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    vr AS (SELECT vec_id FROM (
             SELECT vec_id, row_number() OVER (
                      PARTITION BY e ORDER BY vec_id) AS rn FROM v)
           WHERE rn = 1),
    el AS (SELECT emb.vec_id, emb.label,
                  unnest(range(0, {_DIM})) AS d,
                  unnest(emb.embedding::DOUBLE[]) AS x
           FROM embeddings emb JOIN vr USING (vec_id)),
    cent AS (SELECT label, d, avg(x) AS m FROM el GROUP BY 1, 2),
    cn AS (SELECT label, sqrt(sum(m * m)) AS cnorm FROM cent GROUP BY 1),
    vn AS (SELECT vec_id, sqrt(sum(x * x)) AS vnorm FROM el GROUP BY vec_id),
    csim AS (SELECT el.vec_id, c.label,
                    round(sum(c.m * el.x)
                          / (any_value(cn.cnorm) * any_value(vn.vnorm)), 4) AS s
             FROM cent c
             JOIN el ON c.d = el.d
             JOIN cn ON cn.label = c.label
             JOIN vn ON vn.vec_id = el.vec_id
             GROUP BY el.vec_id, c.label),
    assign AS (SELECT vec_id, CAST(label AS INTEGER) AS cluster FROM (
                 SELECT vec_id, label, row_number() OVER (
                          PARTITION BY vec_id ORDER BY s DESC, label) AS rn
                 FROM csim)
               WHERE rn = 1),
    mem AS (SELECT a.vec_id, a.cluster, v.e FROM assign a JOIN v USING (vec_id)),
    p AS (SELECT x.vec_id AS va, y.vec_id AS vb, x.cluster,
                 round(list_cosine_similarity(x.e, y.e), 4) AS cos_sim
          FROM mem x JOIN mem y
            ON x.cluster = y.cluster AND x.vec_id < y.vec_id)
    SELECT vb AS vec_id, cluster,
           CAST(min(va) AS BIGINT) AS keeper,
           max(cos_sim) AS max_sim
    FROM p WHERE cos_sim >= {SEM_THRESHOLD}
    GROUP BY vb, cluster
    ORDER BY vec_id
"""


@query(
    "dedup_semantic_centroids",
    _SEMDEDUP_ORACLE,
    "SemDeDup-style semantic dedup: assign every embedding to its "
    "nearest per-label centroid (the IVF coarse quantizer), compare "
    "cosine ONLY within a cluster, and mark every vector that has a "
    "lower-id in-cluster neighbor above the threshold as removable "
    "(keeper = lowest such neighbor, max_sim = strongest tie). The "
    "oracle replays centroids, assignment, and in-cluster pairwise "
    "cosine end to end.",
)
def dedup_semantic_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: candidate pairs cost sum(cluster_size^2), not N^2 — with
    k ~ sqrt(N) trained centroids (kmeans_embeddings is the trained
    path; per-label means are the deterministic, oracle-replayable
    stand-in) clusters stay small and the quadratic term is bounded,
    exactly the published SemDeDup deployment shape. Assignment is
    map-only against the broadcast centroid table; the in-cluster
    self-join shuffles once on the cluster id (salt or sub-cluster a
    pathological hot cell, the dedup.py hot-bucket discipline); the
    keep/remove decision is a per-vector aggregate. Exact-duplicate
    vectors collapse to one representative FIRST
    (similarity.collapse_exact_vectors, mirrored by the oracle's vr
    CTE): d exact copies would otherwise land in one cluster and
    re-inflate the quadratic term by d^2 — the same hazard the 8x
    scale experiment exposed for the LSH families (BASELINE.md).
    Intra-duplicate removals are exact-dedup's output by the standard
    exact-then-near ordering; on duplicate-free corpora (all test SFs)
    the collapse is output-neutral."""
    v = collapse_exact_vectors(_with_norm(load(spark, sf_dir, "embeddings")))
    cent = label_centroids(v)
    s = F.round(
        _dot(F.col("centroid"), F.col("embedding"))
        / (F.col("cnorm") * F.col("norm")),
        4,
    )
    win = W.partitionBy("vec_id").orderBy(F.desc("s"), "cluster")
    assign = (
        v.select("vec_id", "embedding", "norm")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", F.col("label").cast("int").alias("cluster"), s.alias("s"))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster")
    )
    # cache + eager materialize: the member table feeds BOTH sides of
    # the in-cluster self-join; lazy, each side would re-derive the
    # centroid aggregation and the full assignment pass (visible as a
    # doubled subtree in the physical plan). Persisting the assignment
    # once is also the production shape — cluster membership is computed
    # one time and stored next to the index (the dedup.py signature-table
    # rationale).
    mem = assign.join(
        v.select("vec_id", "embedding", "norm"), "vec_id"
    ).cache()
    mem.count()
    a = mem.select(
        F.col("vec_id").alias("va"),
        "cluster",
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = mem.select(
        F.col("vec_id").alias("vb"),
        F.col("cluster").alias("cluster_b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    cos = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4)
    pairs = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b")) & (F.col("va") < F.col("vb")),
        )
        .select("va", "vb", "cluster", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= SEM_THRESHOLD)
    )
    return (
        pairs.groupBy(F.col("vb").alias("vec_id"), "cluster")
        .agg(
            F.min("va").cast("long").alias("keeper"),
            F.max("cos_sim").alias("max_sim"),
        )
        .orderBy("vec_id")
    )
