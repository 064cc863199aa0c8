"""Text-operator exactness on crafted documents (cited by
operators/text.py — winnow fingerprint, token stats, lang-id)."""

from __future__ import annotations

import hashlib

import pytest

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import REGISTRY


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river", "en"),
        (2, "short doc", "en"),  # fewer tokens than the shingle width
        (3, "der hund ist und die katze ist das tier", "de"),
        (4, "a b c d e f g h", "und"),
    ]
    out = str(tmp_path_factory.mktemp("textlake"))
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(
        f"{out}/documents.parquet"
    )
    return out


def _winnow_expected(text: str, k: int = 5) -> tuple[str, int]:
    toks = text.lower().split()
    n = max(len(toks) - k, 0) + 1
    shingles = [" ".join(toks[i : i + k]) for i in range(n)]
    hashes = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
    return min(hashes), len(hashes)


def test_winnow_fingerprint_exactness(spark, docs_dir):
    rows = {
        r.doc_id: (r.fingerprint, r.n_shingles)
        for r in REGISTRY["text_winnow_fingerprint"].builder(spark, docs_dir).collect()
    }
    for doc_id, text in [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (3, "der hund ist und die katze ist das tier"),
        (4, "a b c d e f g h"),
    ]:
        assert rows[doc_id] == _winnow_expected(text), doc_id


def test_winnow_fingerprint_short_doc(spark, docs_dir):
    # < k tokens: one shingle of all available tokens
    rows = {
        r.doc_id: (r.fingerprint, r.n_shingles)
        for r in REGISTRY["text_winnow_fingerprint"].builder(spark, docs_dir).collect()
    }
    fp = hashlib.md5(b"short doc").hexdigest()
    assert rows[2] == (fp, 1)


def test_token_stats_exactness(spark, docs_dir):
    rows = {
        r.doc_id: (r.n_chars_actual, r.n_ws_tokens, r.n_re_tokens)
        for r in REGISTRY["text_token_stats"].builder(spark, docs_dir).collect()
    }
    text1 = "the quick brown fox jumps over the lazy dog near the river"
    assert rows[1] == (len(text1), 12, 12)
    assert rows[2] == (9, 2, 2)


def test_lang_id_on_crafted(spark, docs_dir):
    rows = {
        r.doc_id: r.predicted_lang
        for r in REGISTRY["text_lang_id"].builder(spark, docs_dir).collect()
    }
    assert rows[1] == "en"
    assert rows[3] == "de"
    assert rows[4] == "und"  # no marker tokens at all
