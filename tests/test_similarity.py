"""Similarity-search behavior: brute-force exactness (vs numpy) and LSH
bucket semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.similarity import (
    _cos,
    _with_norm,
    hyperplane_signature,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=8).astype("float32")
    rows = [
        (0, base.tolist()),
        (1, (base + rng.normal(scale=0.01, size=8).astype("float32")).tolist()),  # near
        (2, (-base).tolist()),  # opposite
        (3, rng.normal(size=8).astype("float32").tolist()),  # random
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_matches_numpy(spark, vecs):
    v = _with_norm(vecs)
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("norm").alias("qnorm")
    )
    got = {
        r.vec_id: r.sim
        for r in v.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _cos(F.col("embedding"), F.col("qe"), F.col("norm"), F.col("qnorm")), 6
            ).alias("sim"),
        )
        .collect()
    }
    rows = {r.vec_id: np.array(r.embedding, dtype="float64") for r in vecs.collect()}
    for vid, arr in rows.items():
        expect = float(
            arr @ rows[0] / (np.linalg.norm(arr) * np.linalg.norm(rows[0]))
        )
        assert abs(got[vid] - round(expect, 6)) < 1e-5, vid


def test_lsh_signature_groups_near_vectors(spark, vecs):
    sig = {r.vec_id: r.sig for r in vecs.select(
        "vec_id", hyperplane_signature(F.col("embedding"), dim=8).alias("sig")
    ).collect()}
    # near-identical vectors share the signature; opposite vector flips all bits
    assert sig[0] == sig[1]
    assert sig[2] == (~sig[0]) & 0xFFFF
