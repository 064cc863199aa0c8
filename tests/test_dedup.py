"""Dedup-family behavior tests on crafted near-duplicates (the synthetic
documents corpus is all-distinct, so exactness is proven here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
    jaccard_verify,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the tall green trees "
    "near the old stone bridge across the quiet river in the morning sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate
        (3, BASE.replace("morning", "evening")),  # near-dup (1 token of ~40)
        (4, "completely different content about spark query engines and "
            "distributed columnar execution with adaptive partitioning"),
        (5, BASE.replace("the", "a")),  # moderately different
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_near_dups(docs):
    sig = minhash_signatures(docs)
    pairs = minhash_candidate_pairs(sig)
    verified = jaccard_verify(pairs, docs, threshold=0.8)
    found = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert (1, 2) in found  # exact dup must be found
    assert (1, 3) in found and (2, 3) in found  # near-dup found
    assert not any(4 in p for p in found)  # unrelated doc never pairs


def test_minhash_jaccard_value(docs):
    sig = minhash_signatures(docs)
    pairs = minhash_candidate_pairs(sig)
    verified = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_verify(pairs, docs, 0.0).collect()}
    assert verified[(1, 2)] == 1.0


def test_simhash_hamming(spark, docs):
    sig = simhash_signatures(docs)
    by_id = {r.doc_id: r.simhash for r in sig.collect()}
    assert by_id[1] == by_id[2]  # identical text -> identical simhash
    ham13 = bin(by_id[1] ^ by_id[3]).count("1")
    ham14 = bin(by_id[1] ^ by_id[4]).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated
    assert ham13 <= 6


def test_exact_dedup_on_crafted(spark, docs):
    grouped = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
    )
    rows = {r.keeper: r.n for r in grouped.collect()}
    assert rows[1] == 2  # docs 1+2 collapse
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1
