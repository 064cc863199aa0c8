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


def _winnow_expected(text: str, k: int = 5, w: int = 4) -> tuple[str, int, int]:
    """Reference winnowing (Schleimer-Wilkerson-Aiken): rightmost minimal
    md5 shingle hash per w-wide window; digest of the sorted selection."""
    toks = text.lower().split()
    n = max(len(toks) - k, 0) + 1
    shingles = [" ".join(toks[i : i + k]) for i in range(n)]
    hashes = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
    selected: set[int] = set()
    for i in range(max(len(hashes) - w, 0) + 1):
        win = hashes[i : i + w]
        m = min(win)
        selected.add(i + len(win) - 1 - win[::-1].index(m))
    digest = hashlib.md5(
        "".join(sorted(hashes[p] for p in selected)).encode()
    ).hexdigest()
    return digest, len(hashes), len(selected)


def test_winnow_fingerprint_exactness(spark, docs_dir):
    rows = {
        r.doc_id: (r.fingerprint, r.n_shingles, r.n_selected)
        for r in REGISTRY["text_winnow_fingerprint"].builder(spark, docs_dir).collect()
    }
    for doc_id, text in [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (3, "der hund ist und die katze ist das tier"),
        (4, "a b c d e f g h"),
    ]:
        assert rows[doc_id] == _winnow_expected(text), doc_id


def test_winnow_fingerprint_short_doc(spark, docs_dir):
    # < k tokens: one shingle of all available tokens, one selection
    rows = {
        r.doc_id: (r.fingerprint, r.n_shingles, r.n_selected)
        for r in REGISTRY["text_winnow_fingerprint"].builder(spark, docs_dir).collect()
    }
    assert rows[2] == _winnow_expected("short doc")
    assert rows[2][1] == 1 and rows[2][2] == 1


def test_winnow_density_and_match_guarantee(spark):
    # density ~2/(w+1) on random-ish text, and two docs sharing a long
    # passage must share at least one selected hash (the paper's guarantee)
    import itertools

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = [
        (1, base + " unique tail one two three"),
        (2, "completely different head words here " + base),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        WINNOW_K, WINNOW_W, winnow_selected_positions,
    )
    from pyspark.sql import functions as F

    toks = F.split(F.lower("text"), r"\s+")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - WINNOW_K, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, WINNOW_K)),
    )
    staged = df.select("doc_id", F.transform(shingles, F.md5).alias("hashes"))
    sel = staged.select(
        "doc_id",
        F.transform(
            winnow_selected_positions(F.col("hashes")),
            lambda p: F.element_at(F.col("hashes"), (p + 1).cast("int")),
        ).alias("picked"),
        F.size("hashes").alias("n"),
    ).collect()
    by_id = {r.doc_id: (set(r.picked), r.n) for r in sel}
    for picked, n in by_id.values():
        assert len(picked) <= n
        assert len(picked) / n < 0.8  # far below one-per-shingle
    assert by_id[1][0] & by_id[2][0]  # shared passage -> shared fingerprint


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


def test_dedup_winnow_on_crafted(spark, tmp_path):
    from pyspark.sql import functions as F

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the tall green trees"
    )
    rows = [
        (1, base),
        (2, base),  # exact duplicate
        (3, base.replace("windowsill", "balcony")),  # near-dup
        (4, "entirely different content about columnar query execution and "
            "adaptive shuffle partitioning in distributed engines today"),
    ]
    out = str(tmp_path / "windocs")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{out}/documents.parquet")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["dedup_winnow"].builder(spark, out).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_tfidf_ranks_content_overlap_above_stopword_overlap(spark):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        tfidf_weights,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the the the quantum flux capacitor resonates"),
            (2, "the the the quantum flux capacitor oscillates"),
            (3, "the the the weather is mild today indeed"),
            (4, "a completely disjoint sentence about gardening tools"),
        ],
        "doc_id long, text string",
    )
    w = tfidf_weights(docs)
    # idf of the ubiquitous token is the smoothed floor; rare tokens higher
    per_tok = {r.token: r.w for r in w.filter(F.col("doc_id") == 1).collect()}
    assert per_tok["quantum"] > per_tok["the"] / 3  # 'the' has tf=3
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    dots = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("nrm").alias("nb"))
    cos = {
        (r.da, r.db): r.c
        for r in dots.join(na, "da").join(nb, "db")
        .select("da", "db", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("c"))
        .collect()
    }
    # near-dup pair (shares rare content words) beats the stopword-only pair
    assert cos[(1, 2)] > 0.8
    assert cos[(1, 3)] < cos[(1, 2)]
    assert (1, 4) not in cos  # no shared token at all


def test_tfidf_max_df_ratio_drops_ubiquitous_tokens(spark):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        tfidf_weights,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"the common word plus unique{i}") for i in range(10)],
        "doc_id long, text string",
    )
    kept = set(
        r.token
        for r in tfidf_weights(docs, max_df_ratio=0.5).select("token").distinct().collect()
    )
    assert "the" not in kept and "common" not in kept
    assert "unique3" in kept


def test_cross_entropy_rare_tokens_score_higher(spark):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
    import tempfile, os
    # corpus where docs 0/1 are all common tokens, doc 2 all rare ones
    rows = [(0, "alpha beta alpha beta alpha beta"),
            (1, "alpha beta alpha beta"),
            (2, "zeta omicron upsilon xi")]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "documents.parquet"))
    out = {
        r.doc_id: r.cross_entropy
        for r in REGISTRY["text_unigram_cross_entropy"].builder(spark, tmp).collect()
    }
    assert out[2] > out[1] > 0
    # all-common doc: every token has p ~ 8/14 or 6/14 -> low entropy
    assert out[0] == out[1]  # same token distribution


def test_bpe_learn_matches_pure_python_reference(spark, sf_dir):
    """The distributed BPE learner must reproduce the classic
    single-machine algorithm exactly — merges, order, and counts —
    including the deterministic (count desc, left, right) tiebreak and
    greedy left-to-right non-overlapping application."""
    from collections import Counter

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    texts = [
        r.text for r in load(spark, sf_dir, "documents").select("text").collect()
    ]
    wf = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if len(w) >= 2:
                wf[w] += 1
    vocab = {w: (list(w), n) for w, n in wf.items()}
    want = []
    for rank in range(1, 13):
        pairs = Counter()
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, l, r, l + r, cnt))
        for w, (syms, n) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, n)
    got = [
        (x.rank, x.left, x.right, x.merged, x.pair_count)
        for x in REGISTRY["text_bpe_learn"].builder(spark, sf_dir).collect()
    ]
    assert got == want


def test_gopher_rules_mixed_verdict_and_edges(spark):
    """The rule table must actually split the corpus (a gate that keeps
    everything or nothing proves nothing), and each rule must fire on a
    crafted violator."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        text_gopher_quality_rules,
    )

    out = text_gopher_quality_rules(spark, "/root/testdata/sf0.001")
    verdicts = {r.keep for r in out.collect()}
    assert verdicts == {True, False}

    import tempfile

    d = spark.createDataFrame(
        [
            # passes every rule: 16 distinct-ish medium words
            (1, " ".join(f"word{i:02d}" for i in range(16)), "en", "s", 100),
            # too short (< 15 words)
            (2, "only a few words here now", "en", "s", 20),
            # duplicate-word fraction > 0.6
            (3, " ".join(["spam"] * 30 + ["x", "y", "z"]), "en", "s", 100),
            # top-bigram char fraction > 0.1 (one dominant 2-gram)
            (4, " ".join(["alpha beta"] * 12 +
                         [f"w{i:03d}x" for i in range(24)]), "en", "s", 100),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp()
    d.write.parquet(f"{tmp}/documents.parquet")
    rows = text_gopher_quality_rules(spark, tmp).collect()
    kept = {r.sum_doc_id for r in rows if r.keep}
    dropped = {r.sum_doc_id for r in rows if not r.keep}
    assert kept == {1}
    assert dropped == {2 + 3 + 4}


def test_gopher_line_rules_per_rule_violators(spark):
    """The rule engine on REAL multi-line documents (newline-split),
    one crafted violator per line-level rule — each doc fails exactly
    the rule it was built to break (Rae et al. table A1 thresholds)."""
    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        _gopher_line_verdicts,
    )

    distinct10 = [f"unique content line number {i} here" for i in range(10)]
    docs = [
        # 1: clean — 10 distinct plain lines, every rule passes
        (1, "en", "\n".join(distinct10)),
        # 2: duplicate-LINE violator — 5 copies of a SHORT line among 5
        #    long ones: dup fraction 0.4 > 0.3, but dup CHARS 12/~227
        #    stay under 0.2 (fails rule 1 only)
        (2, "en", "\n".join(["dup"] * 5 + [x + " padded out long" for x in distinct10[:5]])),
        # 3: duplicate-CHAR violator — ONE 200-char line twice among 8
        #    short lines: dup-line fraction 0.1 <= 0.3 but dup chars
        #    200/~440 > 0.2 (fails rule 2 only)
        (3, "en", "\n".join(["x" * 200] * 2 + [f"tiny{i}" for i in range(8)])),
        # 4: bullet violator — all 10 lines bullet-started (1.0 > 0.9)
        (4, "en", "\n".join("- " + x for x in distinct10)),
        # 5: ellipsis violator — 4 of 10 lines ellipsis-ended (0.4 > 0.3)
        (5, "en", "\n".join([x + "..." for x in distinct10[:4]] + distinct10[4:])),
    ]
    lines = (
        spark.createDataFrame(docs, "doc_id long, lang string, text string")
        .select("doc_id", "lang", F.explode(F.split("text", "\n")).alias("line"))
    )
    out = {r.doc_id: r for r in _gopher_line_verdicts(lines).collect()}
    assert out[1].keep
    for doc in (2, 3, 4, 5):
        assert not out[doc].keep, doc
    # each violator trips ONLY its own rule
    r2 = out[2]
    assert 10 * (r2.n_lines - r2.n_distinct) > 3 * r2.n_lines
    assert 5 * r2.dup_chars <= r2.total_chars
    r3 = out[3]
    assert 10 * (r3.n_lines - r3.n_distinct) <= 3 * r3.n_lines
    assert 5 * r3.dup_chars > r3.total_chars
    r4 = out[4]
    assert 10 * r4.n_bullets > 9 * r4.n_lines
    assert 10 * (r4.n_lines - r4.n_distinct) <= 3 * r4.n_lines
    r5 = out[5]
    assert 10 * r5.n_ellipsis > 3 * r5.n_lines
    assert 10 * r5.n_bullets <= 9 * r5.n_lines


def test_gopher_line_rules_corpus_mixed_verdicts(spark):
    """The registry query produces BOTH verdicts in every lang at
    sf0.001 — the round-11 degeneracy (single-line docs => all rules
    vacuously pass) is gone."""
    rows = (
        REGISTRY["text_gopher_line_rules"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.keep)
    assert by_lang and all(v == {True, False} for v in by_lang.values()), by_lang


def test_c4_clean_per_rule_violators(spark):
    """C4 page rules on REAL multi-line documents — one crafted
    violator per rule, each failing for exactly its own reason."""
    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        _c4_page_verdicts,
    )

    good = [f"this is a perfectly fine sentence number {i}." for i in range(5)]
    docs = [
        # 1: clean page — every line terminal-punctuated, >= 3 words
        (1, "en", "\n".join(good)),
        # 2: brace violator ('{' anywhere drops the page)
        (2, "en", "\n".join(good + ["var cfg = { enabled: true };"])),
        # 3: lorem ipsum violator (case-folded match)
        (3, "en", "\n".join(good + ["Lorem IPSUM dolor sit amet."])),
        # 4: < 3 surviving lines: only 2 terminal lines; the rest are
        #    headings without punctuation or too-short lines
        (4, "en", "\n".join(good[:2] + ["Navigation", "Home", "ok."[:2]])),
        # 5: line-rule granularity: non-terminal and short lines are
        #    DROPPED but the page survives on its 3+ good lines
        (5, "en", "\n".join(good[:3] + ["READ MORE", "yes!"])),
    ]
    lines = (
        spark.createDataFrame(docs, "doc_id long, lang string, text string")
        .select("doc_id", "lang", F.explode(F.split("text", "\n")).alias("line"))
    )
    out = {r.doc_id: r for r in _c4_page_verdicts(lines).collect()}
    assert out[1].kept
    assert not out[2].kept and out[2].has_brace and not out[2].has_lorem
    assert not out[3].kept and out[3].has_lorem and not out[3].has_brace
    assert not out[4].kept and out[4].n_kept_lines == 2
    assert out[5].kept and out[5].n_kept_lines == 3  # 2 junk lines dropped


def test_c4_clean_corpus_mixed_verdicts(spark):
    rows = (
        REGISTRY["text_c4_clean"].builder(spark, "/root/testdata/sf0.001").collect()
    )
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.kept)
    assert by_lang and all(v == {True, False} for v in by_lang.values()), by_lang


def test_kneser_ney_is_finite_and_reranks_vs_addk(spark):
    """text_kneser_ney_cross_entropy (round 12): scores are positive
    and finite for every held-out doc (the smoothed continuation floor
    catches OOV tails and unseen heads), and the smoothing genuinely
    changes the model — the top-40 surprise ranking must not be the
    add-k op's ranking verbatim."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.01"
    kn = REGISTRY["text_kneser_ney_cross_entropy"].builder(spark, sf).collect()
    assert len(kn) == 40
    import math

    for r in kn:
        assert r.cross_entropy > 0 and math.isfinite(r.cross_entropy)
    addk = REGISTRY["text_bigram_cross_entropy"].builder(spark, sf).collect()
    assert [r.doc_id for r in kn] != [r.doc_id for r in addk]
    # same candidate pool (held-out docs), so substantial overlap is
    # expected — identical ORDER is what would indicate a no-op model
    assert {r.doc_id for r in kn} & {r.doc_id for r in addk}


def test_bpe_encode_matches_pure_python_reference(spark, sf_dir):
    """text_bpe_encode (round 13): the distributed apply must equal the
    classic encoder — learn the merges with the pinned-equal python
    learner, greedily apply them per word in rank order, and the
    per-doc (n_words, n_tokens) must match exactly."""
    from collections import Counter

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    wf = Counter()
    for r in rows:
        for w in r.text.lower().split(" "):
            if len(w) >= 2:
                wf[w] += 1
    vocab = {w: (list(w), n) for w, n in wf.items()}
    merges = []
    for _rank in range(1, 13):
        pairs = Counter()
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (l, r_), _cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r_))
        for w, (syms, n) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r_:
                    out.append(l + r_)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, n)
    tok_len = {w: len(syms) for w, (syms, _n) in vocab.items()}
    want = {}
    for r in rows:
        ws = [w for w in r.text.lower().split(" ") if len(w) >= 2]
        if ws:
            want[r.doc_id] = (len(ws), sum(tok_len[w] for w in ws))
    got = {
        x.doc_id: (x.n_words, x.n_tokens)
        for x in REGISTRY["text_bpe_encode"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_vocab_coverage_bounds_and_discrimination(spark, sf_dir):
    """Coverage is a proper fraction per language, the global top-K cut
    is deterministic (two runs agree exactly), and at least one
    language differs from another (the audit discriminates)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import (
        REGISTRY,
    )

    r1 = REGISTRY["text_vocab_coverage"].builder(spark, sf_dir).collect()
    r2 = REGISTRY["text_vocab_coverage"].builder(spark, sf_dir).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert len(r1) >= 2
    for r in r1:
        assert 0 < r.covered <= r.n_tokens
        assert 0 < r.coverage <= 1.0
    assert len({r.coverage for r in r1}) > 1, "must discriminate languages"
