"""Text-analysis operators for LLM training-data pipelines.

Beyond reference parity (BASELINE.json north star): language-ID, quality
scoring, token counting, and document fingerprinting over the `documents`
table. Everything is built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python UDFs in the hot path, so these scale to
100 TB of text limited only by scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

# A tiny per-language marker lexicon for the n-gram/stopword heuristic.
# Real pipelines plug in fastText/CLD3 via a pandas UDF; the engine-side
# plumbing (tokenize -> score per language -> argmax) is what matters here.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "es"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

TOKEN_RE = "[A-Za-z]+|[0-9]+"  # BPE-ish: alpha runs and digit runs


def _contains_any(token_col, words: tuple[str, ...]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.array_contains(arr, token_col)


def _ws_tokens(col):
    return F.split(F.lower(col), r"\s+")


@query(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_re_tokens
    FROM documents
    """,
    "Token counting: whitespace tokens + BPE-ish regex tokens.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(_ws_tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)).cast("long").alias("n_re_tokens"),
    )


@query(
    "text_quality_score",
    """
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(lower(text), '\\s+') AS toks,
             CAST(length(text) AS DOUBLE) AS n
      FROM documents
    )
    SELECT doc_id,
           round(CAST(len(list_filter(toks,
                 x -> list_contains(['the','a','and','of','to','in','is','it','for','on'], x)))
                 AS DOUBLE) / len(toks), 4) AS stopword_ratio,
           round((n - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) / n, 4) AS punct_ratio,
           round((n - length(replace(text, ' ', ''))) / n, 4) AS space_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 4) AS mean_word_len
    FROM t
    """,
    "Quality scoring: stopword / punctuation / whitespace ratios, mean "
    "word length — the classic pre-training filters.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _ws_tokens(F.col("text"))
    n = F.length("text").cast("double")
    nospace = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        F.round(
            F.size(F.filter(toks, lambda x: _contains_any(x, STOPWORDS))).cast("double")
            / F.size(toks),
            4,
        ).alias("stopword_ratio"),
        F.round(
            (n - F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", ""))) / n, 4
        ).alias("punct_ratio"),
        F.round((n - nospace) / n, 4).alias("space_ratio"),
        F.round(nospace.cast("double") / F.size(toks), 4).alias("mean_word_len"),
    )


def _marker_filter(words: tuple[str, ...]):
    # factory closure: a defaulted lambda param would be (mis)read by
    # PySpark as a second lambda variable (the array index)
    return lambda x: _contains_any(x, words)


def _lang_scores_spark(toks):
    return {
        lang: F.size(F.filter(toks, _marker_filter(words)))
        for lang, words in LANG_MARKERS.items()
    }


# The lang-ID scoring SQL, shared by the classifier query and the
# confusion-matrix instrument below (one definition - the REPS_CTE
# drift lesson).
_LANG_ID_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
    ), s AS (
      SELECT doc_id,
        len(list_filter(toks, x -> list_contains(['the','and','of','to','is'], x))) AS s_en,
        len(list_filter(toks, x -> list_contains(['der','die','und','ist','das'], x))) AS s_de,
        len(list_filter(toks, x -> list_contains(['le','la','et','est','les'], x))) AS s_fr,
        len(list_filter(toks, x -> list_contains(['el','la','que','de','es'], x))) AS s_es,
        len(toks) AS n
      FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS predicted_lang,
           round(CAST(greatest(s_en, s_de, s_fr, s_es) AS DOUBLE) / n, 4) AS confidence
    FROM s
    """


@query(
    "text_lang_id",
    _LANG_ID_ORACLE,
    "Language-ID: marker-token (stopword n-gram) scoring with argmax; "
    "'und' when no marker hits.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _ws_tokens(F.col("text"))
    scored = d.select("doc_id", *[
        c.alias(f"s_{lang}") for lang, c in _lang_scores_spark(toks).items()
    ], F.size(toks).alias("n"))
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    predicted = (
        F.when(best == 0, "und")
        .when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return scored.select(
        "doc_id",
        predicted.alias("predicted_lang"),
        F.round(best.cast("double") / F.col("n"), 4).alias("confidence"),
    )


@query(
    "text_fingerprint_md5",
    """
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
    "Document fingerprint: md5 over whitespace-normalized lowercased text.",
)
def text_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return d.select("doc_id", F.md5(normalized).alias("fingerprint"))


@query(
    "text_top_bigrams",
    """
    WITH t AS (SELECT lang, string_split_regex(lower(text), '\\s+') AS toks
               FROM documents),
    pairs AS (
      SELECT lang, toks[i] || ' ' || toks[i+1] AS bigram
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS i) u
    ),
    counted AS (
      SELECT lang, bigram, count(*) AS n,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bigram) AS rk
      FROM pairs GROUP BY lang, bigram
    )
    SELECT lang, bigram, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
    FROM counted WHERE rk <= 5
    """,
    "Corpus statistics: top-5 bigrams per language (explode n-grams -> "
    "count -> window top-k).",
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: bigram explode shuffles (lang, bigram) pairs with map-side
    partial counts; the top-k window sees only distinct bigrams."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = _ws_tokens(F.col("text"))
    staged = d.select("lang", toks.alias("tk"))
    bigrams = staged.select(
        "lang",
        F.explode(
            F.zip_with(
                F.col("tk"),
                F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(1))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    ).filter(~F.col("bigram").rlike(r"^\S+$"))  # drop the null-padded tail
    counted = bigrams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.desc("n"), "bigram")
    return (
        counted.select(
            "lang", "bigram", "n", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= 5)
    )


WINNOW_K = 5  # shingle width (tokens)
WINNOW_W = 4  # winnowing window (shingles)

# DuckDB mirror of the winnowing pipeline (round-4 VERDICT #3: winnowing
# is deterministic, so the selected positions ARE SQL-expressible and the
# winnow pair gets real oracles). Stages match the Spark code 1:1:
# per-doc shingle md5 rows with 0-based position -> one row per w-wide
# window start -> per-window min hash (binary collation = Spark's
# lexicographic array_min on ascii hex) -> RIGHTMOST occurrence of that
# min via max(pos) over the rows equal to it -> distinct selected
# positions. Shared prefix for both winnow oracles.
_WINNOW_CTES = f"""toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    idx AS (SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - {WINNOW_K}, 0) + 1)) AS i
            FROM toks),
    hs AS (SELECT doc_id, i AS pos,
                  md5(array_to_string(t[i + 1 : i + {WINNOW_K}], ' ')) AS h
           FROM idx),
    nh AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
    wins AS (SELECT doc_id,
                    unnest(range(0, greatest(n - {WINNOW_W}, 0) + 1)) AS i
             FROM nh),
    winrows AS (SELECT w.doc_id, w.i, h.pos, h.h
                FROM wins w JOIN hs h
                  ON h.doc_id = w.doc_id
                 AND h.pos BETWEEN w.i AND w.i + {WINNOW_W - 1}),
    winmin AS (SELECT doc_id, i, pos, h,
                      min(h) OVER (PARTITION BY doc_id, i) AS mh
               FROM winrows),
    selpos AS (SELECT DISTINCT doc_id, spos FROM (
                 SELECT doc_id, max(pos) AS spos
                 FROM winmin WHERE h = mh GROUP BY doc_id, i))"""


def winnow_selected_positions(hashes_col, w: int = WINNOW_W):
    """Schleimer-Wilkerson-Aiken winnowing: slide a w-wide window over the
    shingle-hash sequence and select the RIGHTMOST minimal hash of each
    window; the distinct selected positions are the fingerprint.

    Guarantees (the paper's): every match of length >= w+k-1 tokens shares
    at least one selected hash, and the density of selections is ~2/(w+1).
    ``array_position(reverse(win), m)`` finds the 1-based index of the
    last occurrence of the min, so pos = i + |win| - that index.
    """
    n_wins = F.greatest(F.size(hashes_col) - w, F.lit(0))

    def pick(i):
        win = F.slice(hashes_col, i + 1, w)
        m = F.array_min(win)
        return i + F.size(win) - F.array_position(F.reverse(win), m)

    return F.array_distinct(F.transform(F.sequence(F.lit(0), n_wins), pick))


_WINNOW_FP_ORACLE = f"""
    WITH {_WINNOW_CTES},
    picked AS (SELECT s.doc_id, h.h
               FROM selpos s JOIN hs h
                 ON h.doc_id = s.doc_id AND h.pos = s.spos)
    SELECT n.doc_id,
           fp.fingerprint,
           CAST(n.n AS BIGINT) AS n_shingles,
           CAST(ns.c AS BIGINT) AS n_selected
    FROM nh n
    JOIN (SELECT doc_id, md5(string_agg(h, '' ORDER BY h)) AS fingerprint
          FROM picked GROUP BY doc_id) fp USING (doc_id)
    JOIN (SELECT doc_id, count(*) AS c FROM selpos GROUP BY doc_id) ns
      USING (doc_id)
"""


@query(
    "text_winnow_fingerprint",
    _WINNOW_FP_ORACLE,
    "Winnowing fingerprint (Schleimer-Wilkerson-Aiken): md5 shingle "
    "hashes -> rightmost-min selection per 4-shingle window -> digest of "
    "the selected hashes. Deterministic, so the DuckDB oracle replays "
    "the window-min/rightmost-tie-break selection in SQL; exactness vs "
    "an independent Python reference also in tests/test_text.py.",
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: per-row array ops, no shuffle at all — embarrassingly
    parallel over document splits. The hash array is materialized in a
    prior projection and referenced many times, so the optimizer cannot
    inline the shingling pipeline into the window lambdas (CollapseProject
    discipline, see dedup.py)."""
    d = load(spark, sf_dir, "documents")
    toks = _ws_tokens(F.col("text"))
    k = WINNOW_K
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    staged = d.select("doc_id", F.transform(shingles, F.md5).alias("hashes"))
    hashes = F.col("hashes")
    selected = winnow_selected_positions(hashes)
    picked = F.array_sort(
        F.transform(selected, lambda p: F.element_at(hashes, (p + 1).cast("int")))
    )
    return staged.select(
        "doc_id",
        F.md5(F.concat_ws("", picked)).alias("fingerprint"),
        F.size(hashes).cast("long").alias("n_shingles"),
        F.size(selected).cast("long").alias("n_selected"),
    )


_DEDUP_WINNOW_ORACLE = f"""
    WITH {_WINNOW_CTES},
    inv AS (SELECT DISTINCT s.doc_id, h.h AS fp
            FROM selpos s JOIN hs h
              ON h.doc_id = s.doc_id AND h.pos = s.spos),
    hot AS (SELECT fp FROM inv GROUP BY fp HAVING count(*) > 128),
    inv2 AS (SELECT inv.* FROM inv ANTI JOIN hot USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared_fingerprints
    FROM inv2 a JOIN inv2 b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY 1, 2
"""


@query(
    "dedup_winnow",
    _DEDUP_WINNOW_ORACLE,
    "Near-dup candidates via winnowed fingerprints: inverted index over "
    "the SELECTED hashes only (~2/(w+1) of the full shingle index), pairs "
    "ranked by shared-fingerprint count. The winnowing guarantee bounds "
    "recall: any shared passage of >= w+k-1 tokens produces a shared "
    "selected hash. Deterministic, so the DuckDB oracle replays "
    "selection, hot-fingerprint cap, and the pair join; recall/exclusion "
    "also asserted in tests/test_text.py.",
)
def dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: same inverted-index shape as dedup_ngram_jaccard but the
    exploded index is ~2/(w+1) the size (only selected hashes), and the
    same hot-key cap applies. Winnowing is how source-code/plagiarism
    systems (MOSS) make full-corpus fingerprint joins tractable."""
    from .dedup import DEFAULT_MAX_BUCKET, _drop_hot_buckets

    d = load(spark, sf_dir, "documents")
    toks = _ws_tokens(F.col("text"))
    k = WINNOW_K
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    staged = d.select("doc_id", F.transform(shingles, F.md5).alias("hashes"))
    hashes = F.col("hashes")
    picked = F.array_distinct(
        F.transform(
            winnow_selected_positions(hashes),
            lambda p: F.element_at(hashes, (p + 1).cast("int")),
        )
    )
    inv = staged.select("doc_id", F.explode(picked).alias("fp"))
    inv = _drop_hot_buckets(inv, ["fp"], DEFAULT_MAX_BUCKET)
    return (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared_fingerprints"))
        .filter(F.col("n_shared_fingerprints") >= 2)
        .orderBy("doc_a", "doc_b")
    )


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Sparse TF-IDF weights: one (id, token, w) row per distinct token
    per doc, with the sklearn-style smoothed idf ln((1+N)/(1+df)) + 1.

    Scale: tf is one partial-aggregated shuffle on (doc, token); df is a
    second on token alone (vocabulary-sized, Zipf-bounded); the idf join
    is token-keyed against that small frame (AQE broadcasts it). The
    ``max_df_ratio`` knob drops ubiquitous tokens (sklearn's max_df) —
    at web scale that caps the inverted-index fan-out of the hot tokens,
    which is where Sum(df^2) join cost concentrates. Left None here:
    the synthetic corpus draws from a ~30-word vocabulary, so every
    token exceeds any useful ratio and idf's downweighting (->1.0 for
    ubiquitous tokens) is the exactness-preserving treatment.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_ws_tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df_t"))
    if max_df_ratio is not None:
        dfreq = (
            dfreq.crossJoin(F.broadcast(n_docs))
            .filter(F.col("df_t") <= F.lit(max_df_ratio) * F.col("n_docs"))
            .select("token", "df_t")
        )
    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df_t"))) + 1.0
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(F.col(id_col), F.col("token"), (F.col("tf") * idf).alias("w"))
    )


@query(
    "text_tfidf_cosine_topk",
    r"""
    WITH t AS (SELECT doc_id,
                      unnest(string_split_regex(lower(text), '\s+')) AS token
               FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
           FROM t GROUP BY 1, 2),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t
              FROM tf GROUP BY token),
    w AS (SELECT doc_id, tf.token,
                 CAST(round(tf * (ln((1.0 + n_docs) / (1.0 + df_t)) + 1.0)
                            * 10000) AS BIGINT) AS wi
          FROM tf JOIN dfreq USING (token), n),
    norms AS (SELECT doc_id, sqrt(CAST(sum(wi*wi) AS DOUBLE)) AS nrm
              FROM w GROUP BY doc_id),
    dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    CAST(sum(a.wi * b.wi) AS DOUBLE) AS dot
             FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(dot / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM dots JOIN norms na ON dots.doc_a = na.doc_id
              JOIN norms nb ON dots.doc_b = nb.doc_id
    ORDER BY cos_sim DESC, doc_a, doc_b LIMIT 20
    """,
    "TF-IDF document similarity: smoothed-idf weighted term vectors, "
    "cosine via sparse inverted-index dot product, top-20 most similar "
    "pairs (deterministic tiebreak on ids).",
)
def text_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the pair join is the inverted-index shape (cost follows
    Sum over tokens of df^2, concentrated in hot tokens — bounded via
    tfidf_weights' max_df_ratio at web scale); norms are one partial-agg
    shuffle; top-20 is TakeOrderedAndProject, never a global sort spill.
    For billion-doc corpora the exact all-shared-token pass gives way to
    ann_lsh_cosine / knn_cosine_topk over learned embeddings; this
    operator is the lexical-similarity member of that family.

    Numeric discipline (round-3 ADVICE): weights are rounded to 1e-4 and
    summed as scaled INTEGERS (the tpch_more cents pattern), because a
    double sum's value depends on partition/accumulation order — Spark's
    is nondeterministic across runs, and a last-ulp wobble at a .00005
    boundary would flip the rounded cos_sim (and top-20 membership) vs
    the oracle. Integer dots/norms are exact and order-free; only the
    final one-expression cosine is floating point. Scale bound: wi <=
    ~1.5e7 at this corpus' tf/idf range, so sum(wi*wi) < 2^63."""
    d = load(spark, sf_dir, "documents")
    w = (
        tfidf_weights(d)
        .select(
            "doc_id",
            "token",
            F.round(F.col("w") * 10000).cast("long").alias("wi"),
        )
        .localCheckpoint(eager=True)
    )  # feeds norms + both join sides
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wi") * F.col("wi")).cast("double")).alias("nrm")
    )
    dots = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.wi") * F.col("b.wi")).cast("double").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_a", "doc_b")
        .limit(20)
    )


@query(
    "text_vocab_topk",
    r"""
    WITH t AS (SELECT doc_id,
                      unnest(string_split_regex(lower(text), '\s+')) AS token
               FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT token,
           CAST(count(*) AS BIGINT) AS df_t,
           CAST(sum(tf) AS BIGINT) AS tf_total,
           round(ln((1.0 + n_docs) / (1.0 + count(*))) + 1.0, 4) AS idf
    FROM tf, n
    GROUP BY token, n_docs
    ORDER BY tf_total DESC, token LIMIT 30
    """,
    "Vocabulary build: per-token document frequency, corpus term "
    "frequency, and smoothed idf; top-30 by corpus frequency.",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two partial-aggregated shuffles (doc,token) then (token);
    output is vocabulary-sized and the top-30 is TakeOrderedAndProject.
    This is the (exact) counting backbone of tokenizer/vocab induction
    jobs; a frequency-capped variant feeds tfidf_weights' max_df knob."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_t"),
            F.sum("tf").cast("long").alias("tf_total"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df_t",
            "tf_total",
            F.round(
                F.log(
                    (F.lit(1.0) + F.col("n_docs"))
                    / (F.lit(1.0) + F.col("df_t").cast("double"))
                )
                + 1.0,
                4,
            ).alias("idf"),
        )
        .orderBy(F.desc("tf_total"), "token")
        .limit(30)
    )


@query(
    "text_unigram_cross_entropy",
    r"""
    WITH t AS (SELECT doc_id,
                      unnest(string_split_regex(lower(text), '\s+')) AS token
               FROM documents),
    corpus AS (SELECT token, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY token),
    total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t),
    scored AS (SELECT t.doc_id,
                      CAST(round(ln(corpus.c / total.n) * 1000000) AS BIGINT) AS lp
               FROM t JOIN corpus USING (token), total)
    SELECT doc_id,
           round(-(CAST(sum(lp) AS DOUBLE) / count(*)) / 1000000, 4)
             AS cross_entropy,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM scored GROUP BY doc_id
    ORDER BY doc_id
    """,
    "CCNet-style quality scoring: per-document cross-entropy under the "
    "corpus unigram LM (-mean ln p(token)). Low = stereotypical text, "
    "high = rare-token-heavy; the filtering signal perplexity-based "
    "curation thresholds on (here the LM is the corpus itself; a real "
    "pipeline broadcasts a reference-LM table the same way).",
)
def text_unigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: token counts are one partial-aggregated shuffle; the LM
    table is vocabulary-sized, so AQE turns the score join into a
    broadcast (map-side) lookup whenever the vocab fits an executor —
    the same plan a broadcast pre-trained-LM table would have (left a
    soft hint so a pathological billion-token vocab degrades to a
    shuffle join instead of an OOM). The scalar total broadcasts like
    any grand-total subquery.

    Numeric discipline (round-3 ADVICE): per-token log-probs are rounded
    to 1e-6 and summed as scaled integers, so the per-doc mean is exact
    and order-free (a double avg's value depends on Spark's
    nondeterministic accumulation order and can flip the 4-decimal round
    at a boundary). |lp| <= ~2e7 per token, docs are << 2^35 tokens."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
    corpus = toks.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        toks.join(corpus, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("c") / F.col("n")) * 1000000)
            .cast("long")
            .alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                -(F.sum("lp").cast("double") / F.count(F.lit(1))) / 1000000, 4
            ).alias("cross_entropy"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


_LANG_CONFUSION_ORACLE = f"""
    WITH pred AS ({_LANG_ID_ORACLE}),
    lab AS (SELECT p.doc_id, d.lang, p.predicted_lang
            FROM pred p JOIN documents d USING (doc_id)),
    cell AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
             FROM lab GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM cell GROUP BY lang)
    SELECT c.lang, c.predicted_lang, c.n,
           round(CAST(c.n AS DOUBLE) / t.t, 4) AS share
    FROM cell c JOIN tot t USING (lang)
    ORDER BY c.lang, c.predicted_lang
"""


@query(
    "text_lang_id_confusion",
    _LANG_CONFUSION_ORACLE,
    "Lang-ID quality instrumentation: the marker-token classifier's "
    "predictions against the documents.lang labels as a confusion "
    "matrix (true lang x predicted, count + per-true-lang share — the "
    "diagonal shares are per-class recall). The measurement-as-operator "
    "pattern the ANN family uses (ann_recall_at_k), applied to the text "
    "family: classifier changes get graded by a hash-verified "
    "instrument, not by eyeballing.",
)
def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: prediction is the map-only lang-ID pass; the matrix is a
    tiny (langs x langs) aggregate with map-side partial combine, and
    the per-class totals re-aggregate the CELL table, never the corpus.
    Routing decisions (which languages need better markers, whether
    'und' dominates a source) read straight off the shares."""
    d = load(spark, sf_dir, "documents")
    pred = text_lang_id(spark, sf_dir)  # @query returns the bare builder
    cell = (
        pred.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cell.groupBy("lang").agg(F.sum("n").cast("long").alias("t"))
    return (
        cell.join(tot, "lang")
        .select(
            "lang",
            "predicted_lang",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 4).alias("share"),
        )
        .orderBy("lang", "predicted_lang")
    )


_BM25_ORACLE = """
    WITH queries(query, term) AS (
      VALUES ('q_spark_join', 'spark'), ('q_spark_join', 'join'),
             ('q_window_agg', 'window'), ('q_window_agg', 'agg'),
             ('q_hash_scan', 'hash'), ('q_hash_scan', 'table'),
             ('q_hash_scan', 'scan')
    ),
    tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tokens GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             avg(dl) AS avgdl
      FROM dl
    ),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df
      FROM tf
      WHERE term IN (SELECT DISTINCT term FROM queries)
      GROUP BY term
    ),
    scored AS (
      SELECT q.query, t.doc_id,
             sum(
               ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * t.tf * (1.2 + 1)
               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))
             ) AS score
      FROM tf t
      JOIN queries q ON q.term = t.term
      JOIN df f ON f.term = t.term
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats s
      GROUP BY q.query, t.doc_id
    ),
    ranked AS (
      SELECT query, doc_id, round(score, 4) AS score,
             row_number() OVER (
               PARTITION BY query
               ORDER BY round(score, 4) DESC, doc_id) AS rk
      FROM scored
    )
    SELECT query, doc_id, score, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
"""


@query(
    "text_bm25_topk",
    _BM25_ORACLE,
    "BM25 retrieval (round-8): three multi-term keyword queries scored "
    "with the standard Okapi BM25 formula (k1=1.2, b=0.75, the "
    "+1-smoothed idf) over whitespace tokens, top-5 documents per "
    "query with a doc_id tiebreak on the 4-decimal-rounded score. The "
    "oracle replays tokenization, tf/df/avgdl and the exact scoring "
    "formula in SQL.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval over the corpus — the sparse complement to
    the embedding ANN family (BM25 is the baseline every dense
    retriever is measured against, and the retrieval arm of
    decontamination/quality pipelines).

    100 TB design: tf is one shuffle by (doc_id, term); df and avgdl
    are tiny aggregates; the QUERY side (a handful of terms) is
    broadcast into the postings join, so scoring touches only postings
    of query terms — the inverted-index access pattern without
    materializing an index. Per-query top-k is a TakeOrdered over the
    scored candidates, never a global sort."""
    from pyspark.sql import Window

    K1, B = 1.2, 0.75
    qterms = spark.createDataFrame(
        [
            ("q_spark_join", "spark"),
            ("q_spark_join", "join"),
            ("q_window_agg", "window"),
            ("q_window_agg", "agg"),
            ("q_hash_scan", "hash"),
            ("q_hash_scan", "table"),
            ("q_hash_scan", "scan"),
        ],
        "query string, term string",
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    # doc length and corpus stats are computed WITHOUT exploding:
    # size(split()) is a map-only expression, so the only shuffle that
    # sees every token is avoided entirely
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # postings restricted to query terms BEFORE any aggregation: the
    # broadcast probe makes the tf shuffle carry only matching tokens
    # (the inverted-index access pattern without materializing one)
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    hits = tokens.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cand = tf.join(F.broadcast(qterms), "term")
    df_ = (
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        cand.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score_term",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * (K1 + 1)
            / (
                F.col("tf")
                + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query", "doc_id")
        .agg(F.sum("score_term").alias("raw"))
        .withColumn("score", F.round("raw", 4))
    )
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("query", "doc_id", "score", "rk")
    )


_BPE_PAIRS_ORACLE = """
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    wf AS (
      SELECT w, count(*) AS freq FROM words
      WHERE len(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, freq
      FROM (SELECT w, freq, unnest(range(1, len(w))) AS i FROM wf)
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 30
"""


@query(
    "text_bpe_pair_counts",
    _BPE_PAIRS_ORACLE,
    "The counting core of BPE tokenizer training: corpus-frequency-"
    "weighted adjacent-symbol pair counts at the character level (the "
    "iteration-0 statistics whose argmax is the first learned merge), "
    "top 30 pairs with a deterministic tiebreak. The oracle replays "
    "word-frequency aggregation and positional 2-char substring "
    "extraction; this is the oracle-verified exemplar for "
    "text_bpe_learn's per-iteration statistics.",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB design: the ONLY corpus-scale job is word-frequency
    aggregation (map-side combinable; one shuffle on the word). Pair
    extraction runs over the DISTINCT-word vocabulary — bounded by
    vocabulary growth (sublinear in corpus size, Heaps' law), not by
    corpus rows — which is what makes iterated BPE training feasible
    at all."""
    d = load(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(30)
    )


def _merge_pair_in_arrays(col, a: str, b: str):
    """Greedy left-to-right single-pass merge of adjacent (a, b) symbol
    occurrences — the BPE apply step — as one Catalyst fold, no UDF.
    Non-overlapping by construction: a merged element can only chain
    when the merged string literally equals ``a`` again, which a
    non-empty ``b`` makes impossible."""

    def step(acc, x):
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(col, F.array().cast("array<string>"), step)


def _bpe_learn_state(
    spark: SparkSession, sf_dir: str, n_merges: int = 12
) -> tuple[list, DataFrame]:
    """BPE training core shared by text_bpe_learn and text_bpe_encode:
    returns (merge list, final vocab frame (w, syms, freq) with every
    merge applied, pinned). Carrying ``w`` through the loop costs
    nothing at vocabulary scale and lets the ENCODER reuse the final
    symbol state directly instead of re-applying all 12 merges to a
    freshly-distinct'd word table (r16, guide §2.4 — that re-apply was
    12 fold evaluations + 4 checkpoints + a corpus distinct, all
    redundant with work the learner already did).

    Checkpoint cadence (r16, guide §1.2 per-task vs fixed cost): the
    fold lineage is truncated every 3rd iteration instead of every
    iteration — the pair-count job then re-evaluates at most 2 stacked
    folds (O(word-length) array work per row over the vocabulary, far
    cheaper than the per-iteration checkpoint job it replaces); 12
    stacked HOF aggregates in one plan is what stalls codegen, 3 does
    not."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            F.expr(
                "transform(sequence(1, length(w)), i -> substr(w, i, 1))"
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    pending = 0
    for rank in range(1, n_merges + 1):
        top = (
            vocab.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .first()
        )
        if top is None:
            break
        merges.append((rank, top.l, top.r, top.l + top.r, int(top.cnt)))
        vocab = vocab.select(
            "w",
            _merge_pair_in_arrays(F.col("syms"), top.l, top.r).alias("syms"),
            "freq",
        )
        pending += 1
        if pending == 3:
            vocab = vocab.localCheckpoint(eager=True)
            pending = 0
    if pending:
        vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


@query(
    "text_bpe_learn",
    None,
    "BPE tokenizer training (Sennrich et al. 2016), 12 merges: the "
    "corpus collapses ONCE to a distinct-word frequency vocabulary, "
    "then every iteration counts corpus-weighted adjacent-symbol pairs "
    "over that vocabulary, collects the single argmax pair (O(1) "
    "driver traffic per iteration, deterministic count-then-lex "
    "tiebreak), and applies the merge to the symbol arrays as a "
    "Catalyst fold. No SQL oracle (iterative); exactness is pinned "
    "against a pure-Python reference implementation on the same corpus "
    "in tests/test_text.py.",
)
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the learned merge table (rank, left, right, merged,
    pair_count). 100 TB design: iteration cost is bounded by VOCABULARY
    size, not corpus size — the corpus-scale shuffle happens exactly
    once (word counts, map-side combinable); the per-iteration argmax
    collect is one row; localCheckpoint every 3rd iteration truncates
    the fold lineage (see _bpe_learn_state)."""
    merges, _vocab = _bpe_learn_state(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


@query(
    "text_bpe_encode",
    None,
    "BPE tokenizer APPLICATION (the other half of text_bpe_learn): "
    "learn the 12-merge table on the corpus, then encode every "
    "document with it — per-doc word and BPE-token counts, the "
    "token-budget accounting a pretraining mix is planned against. "
    "Encoding is vocabulary-bounded: merges apply to the DISTINCT "
    "word table as the same greedy Catalyst fold the learner uses "
    "(no UDF), and the corpus only pays one explode + one word-keyed "
    "join. No SQL oracle (the merge table is the iterative learner's "
    "output); exact-match-pinned against a pure-Python encoder in "
    "tests/test_text.py.",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB: the merge fold runs O(vocab x merges) — vocabulary-
    bounded, not corpus-bounded; the corpus-scale work is exactly one
    tokenize explode and one (word -> token count) join keyed on the
    word, the same shape as every frequency operator here. The learn
    step's per-iteration cost is likewise vocabulary-bounded
    (text_bpe_learn's design)."""
    d = load(spark, sf_dir, "documents")
    # r16 (guide §2.4): the learner's FINAL vocab state (w, syms after
    # all 12 merges, pinned) IS the encoded word table — the previous
    # form re-distinct'd the corpus words and re-applied all 12 merge
    # folds (+4 checkpoints) to arrive at exactly the same frame. The
    # learner's vocabulary definition (distinct lowercase words of
    # length >= 2) is the encoder's word definition, so reuse is exact.
    _merges, vocab = _bpe_learn_state(spark, sf_dir)
    tok = vocab.select("w", F.size("syms").alias("n_tok"))
    docw = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.length("w") >= 2)
    return (
        docw.join(tok, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


@query(
    "text_doc_entropy",
    """
    WITH w AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\\s+')) AS word
      FROM documents
    ), wc AS (
      SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS c
      FROM w GROUP BY doc_id, word
    ), tot AS (
      SELECT doc_id, sum(c) AS n, CAST(count(*) AS BIGINT) AS n_distinct
      FROM wc GROUP BY doc_id
    )
    SELECT wc.doc_id,
           CAST(any_value(tot.n) AS BIGINT) AS n_tokens,
           any_value(tot.n_distinct) AS n_distinct,
           round(-sum((c / tot.n) * log2(c / tot.n)), 4) AS entropy
    FROM wc JOIN tot ON wc.doc_id = tot.doc_id
    GROUP BY wc.doc_id
    ORDER BY entropy ASC, wc.doc_id
    LIMIT 40
    """,
    "Word-distribution entropy per document (low entropy = repetitive "
    "boilerplate/junk): the 40 lowest-entropy docs with token counts — "
    "the filter a pretraining pipeline runs alongside repetition ratio.",
)
def text_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: explode -> two-level hash agg, all map-side partial —
    the (doc_id, word) agg pre-combines within partitions and docs are
    hash-distributed, so no skew beyond a single pathological doc
    (bounded upstream by ingest length caps). The top-k is
    TakeOrderedAndProject (no global sort materialization).
    Complements text_repetition_ratio (top-word mass) — entropy sees
    the WHOLE distribution, catching templated docs whose top word is
    unremarkable."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("c") / F.col("n")
    return (
        wc.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.first("n").cast("long").alias("n_tokens"),
            F.first("n_distinct").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"),
        )
        .orderBy(F.asc("entropy"), F.asc("doc_id"))
        .limit(40)
    )


@query(
    "text_bigram_cross_entropy",
    r"""
    WITH toks AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)), i ->
                    struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
           FROM toks WHERE len(t) >= 2),
    flat AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    train AS (SELECT * FROM flat WHERE doc_id % 5 <> 0),
    held AS (SELECT * FROM flat WHERE doc_id % 5 = 0),
    c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2 FROM train GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM train GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM train),
    scored AS (SELECT held.doc_id,
                      CAST(round(ln((coalesce(c2.c2, 0) + 0.5)
                                    / (coalesce(c1.c1, 0) + 0.5 * v.v))
                                 * 1000000) AS BIGINT) AS lp
               FROM held
               LEFT JOIN c2 ON held.w1 = c2.w1 AND held.w2 = c2.w2
               LEFT JOIN c1 ON held.w1 = c1.w1, v)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-(CAST(sum(lp) AS DOUBLE) / count(*)) / 1000000, 4)
             AS cross_entropy
    FROM scored GROUP BY doc_id
    ORDER BY cross_entropy DESC, doc_id
    LIMIT 40
    """,
    "Bigram-LM cross-entropy with add-k smoothing (k=0.5): an 80% "
    "train slice (doc_id % 5 <> 0) fits conditional bigram counts, "
    "held-out docs score -mean ln p(w2|w1) — the CONTEXT-aware rung "
    "above text_unigram_cross_entropy (a doc of common words in alien "
    "order is invisible to unigrams, loud here). Top-40 most "
    "surprising held-out docs.",
)
def text_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet/KenLM-style quality gate with real context: unseen
    bigrams and unseen heads back off to the smoothed floor
    (k / (c1 + kV), with V the train vocabulary), so OOV-heavy docs
    rank as surprising rather than erroring.

    Scale: bigram explode is map-side; the two count tables are one
    partial-aggregated shuffle each and vocabulary-bounded, so AQE
    broadcasts the score joins when they fit (same plan a broadcast
    pre-trained-LM table would have); V is a 1-row broadcast. Same
    scaled-integer log-prob discipline as the unigram op — per-doc
    means are exact and accumulation-order-free."""
    d = load(spark, sf_dir, "documents")
    bg = (
        d.select("doc_id", _ws_tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    train = bg.filter(F.col("doc_id") % 5 != 0)
    held = bg.filter(F.col("doc_id") % 5 == 0)
    c2 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c2")
    )
    c1 = train.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    v = train.agg(F.countDistinct("w2").cast("double").alias("v"))
    p = (F.coalesce(F.col("c2"), F.lit(0.0)) + 0.5) / (
        F.coalesce(F.col("c1"), F.lit(0.0)) + 0.5 * F.col("v")
    )
    return (
        held.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(F.log(p) * 1000000).cast("long").alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -(F.sum("lp").cast("double") / F.count(F.lit(1))) / 1000000, 4
            ).alias("cross_entropy"),
        )
        .select("doc_id", "n_bigrams", "cross_entropy")
        .orderBy(F.desc("cross_entropy"), F.asc("doc_id"))
        .limit(40)
    )


def _gopher_word_verdicts(d: DataFrame) -> DataFrame:
    """Doc-level verdicts for the WORD-level Gopher rules over
    (doc_id, lang, text) rows — factored (round-12) so pipeline
    compositions reuse the exact rule table. Scale shape (same as
    text_doc_entropy's): the bigram mode needs ONE corpus-scale
    explode into a (doc_id, bigram) partial hash agg — map-side
    combine collapses each document's repeats before the shuffle —
    then a per-document window and a join back on doc_id that reuses
    the same hash partitioning. No Python UDFs anywhere."""
    from pyspark.sql import Window as W

    words = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select(
        "doc_id",
        "lang",
        words.alias("words"),
    ).select(
        "doc_id",
        "lang",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.expr(
            "aggregate(transform(words, x -> length(x)), 0, (a, b) -> a + b)"
        ).alias("word_chars"),
        F.expr(
            "zip_with(slice(words, 1, size(words) - 1), "
            "slice(words, 2, size(words) - 1), "
            "(a, b) -> concat(a, ' ', b))"
        ).alias("bigrams"),
    )
    top = (
        base.select("doc_id", F.explode("bigrams").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(
                    F.desc("c"), F.asc("bigram")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            (F.col("c") * F.length("bigram")).cast("long").alias("top_chars"),
        )
    )
    keep = (
        (F.col("n_words") >= 15)
        & (3 * F.col("n_words") <= F.col("word_chars"))
        & (F.col("word_chars") <= 10 * F.col("n_words"))
        & (10 * (F.col("n_words") - F.col("n_distinct")) <= 6 * F.col("n_words"))
        & (5 * F.col("top_chars") <= F.col("word_chars"))
    )
    return base.drop("bigrams").join(top, "doc_id").withColumn("keep", keep)



@query(
    "text_gopher_quality_rules",
    """
    WITH w AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang, len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct,
             list_sum(list_transform(words, x -> len(x))) AS word_chars,
             list_filter(list_transform(words, (x, i) ->
               CASE WHEN i < len(words) THEN x || ' ' || words[i+1] END),
               y -> y IS NOT NULL) AS bigrams
      FROM w
    ),
    bg AS (SELECT doc_id, unnest(bigrams) AS bigram FROM base),
    bgc AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ),
    topbg AS (
      SELECT doc_id, CAST(c * len(bigram) AS BIGINT) AS top_chars,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY c DESC, bigram
             ) AS rk
      FROM bgc
    ),
    scored AS (
      SELECT b.lang, b.doc_id, b.n_words, b.n_distinct, b.word_chars,
             t.top_chars,
             (b.n_words >= 15
              AND 3 * b.n_words <= b.word_chars
              AND b.word_chars <= 10 * b.n_words
              AND 10 * (b.n_words - b.n_distinct) <= 6 * b.n_words
              AND 5 * t.top_chars <= b.word_chars) AS keep
      FROM base b JOIN topbg t ON t.doc_id = b.doc_id AND t.rk = 1
    )
    SELECT lang, keep,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_words) AS BIGINT) AS words_chk,
           CAST(sum(n_distinct) AS BIGINT) AS distinct_chk,
           CAST(sum(top_chars) AS BIGINT) AS topbg_chk
    FROM scored GROUP BY lang, keep
    """,
    "Gopher-style repetition quality rules (round-11; Rae et al. 2021 "
    "table A1, the word-level subset meaningful on this single-line "
    "synthetic corpus): per document — word count >= 15, mean word "
    "length in [3, 10], duplicate-word fraction <= 0.6, and "
    "most-common-2-gram character fraction <= 0.2 (the paper's own threshold) — with every "
    "threshold evaluated in CROSS-MULTIPLIED INTEGER form, so the "
    "verdict is float-free and bit-equal across engines. Oracle "
    "replays the whole rule table; sum_doc_id pins per-verdict "
    "membership exactly. The LINE-level half of table A1 ships as "
    "text_gopher_line_rules (round-12).",
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word-level rule table — see ``_gopher_word_verdicts`` for
    the scale shape; the final rollup is O(langs x 2). 100 TB cost is
    the one bigram shuffle, which is the quantity being measured."""
    d = load(spark, sf_dir, "documents")
    return (
        _gopher_word_verdicts(d)
        .groupBy("lang", "keep")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_words").cast("long").alias("words_chk"),
            F.sum("n_distinct").cast("long").alias("distinct_chk"),
            F.sum("top_chars").cast("long").alias("topbg_chk"),
        )
    )


def _gopher_line_verdicts(lines: DataFrame) -> DataFrame:
    """Doc-level verdicts for the LINE-level half of Rae et al. 2021
    table A1 (the other half of ``text_gopher_quality_rules``):

    - duplicate-line fraction  <= 0.30   (10 * dups      <= 3 * lines)
    - duplicate-line CHAR fraction (chars in 2nd+ occurrences of a
      repeated line / total chars) <= 0.20  (5 * dup_chars <= chars)
    - bullet-start line fraction  <= 0.90  (10 * bullets  <= 9 * lines)
    - ellipsis-end line fraction  <= 0.30  (10 * ellipsis <= 3 * lines)

    every threshold in CROSS-MULTIPLIED INTEGER form (float-free,
    bit-equal across engines). Input is the exploded (doc_id, lang,
    line) relation — callers split real multi-line text on newlines;
    the registry query derives lines deterministically from the
    single-line synthetic corpus (see ``_synth_multiline``).

    Scale: one (doc_id, line) partial hash agg — map-side combine
    collapses each document's repeated lines before the shuffle —
    then a doc-keyed rollup that reuses the same hash partitioning;
    both keys are high-cardinality and unskewed (a document has
    bounded lines). No Python UDFs.
    """
    lc = (
        lines.groupBy("doc_id", "lang", "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("ln", F.length("line"))
    )
    doc = lc.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("long").alias("n_lines"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.col("ln")).cast("long").alias("total_chars"),
        F.sum((F.col("c") - 1) * F.col("ln")).cast("long").alias("dup_chars"),
        F.sum(
            F.when(F.col("line").startswith("- "), F.col("c")).otherwise(0)
        ).cast("long").alias("n_bullets"),
        F.sum(
            F.when(F.col("line").endswith("..."), F.col("c")).otherwise(0)
        ).cast("long").alias("n_ellipsis"),
    )
    keep = (
        (10 * (F.col("n_lines") - F.col("n_distinct")) <= 3 * F.col("n_lines"))
        & (5 * F.col("dup_chars") <= F.col("total_chars"))
        & (10 * F.col("n_bullets") <= 9 * F.col("n_lines"))
        & (10 * F.col("n_ellipsis") <= 3 * F.col("n_lines"))
    )
    return doc.withColumn("keep", keep)


#: Shared deterministic multi-line derivation: the synthetic corpus is
#: single-line by construction (and /root/testdata is read-only), so
#: both engines reassemble each document into 5-word lines and inject
#: structure as a pure function of (doc_id, line index): boilerplate
#: repeats (all lines of doc_id%19 docs at even positions, else every
#: (i+doc_id)%5==2), bullet prefixes (all of doc_id%13 docs, else every
#: (i+doc_id)%7==0), ellipsis suffixes (odd positions of doc_id%17
#: docs, else every (i+doc_id)%11==3) — so every rule sees genuinely
#: mixed verdicts. The rule engine itself (_gopher_line_verdicts) is
#: corpus-agnostic and is exercised on REAL newline-split multi-line
#: docs in tests/test_text.py.
_SYNTH_LINES_SPARK = """
transform(sequence(0, cast(ceil(size(words) / 5.0) as int) - 1), i ->
  concat(
    CASE WHEN (doc_id % 13 = 0 OR (i + doc_id) % 7 = 0)
         THEN '- ' ELSE '' END,
    CASE WHEN ((doc_id % 19 = 0 AND i % 2 = 0)
               OR (doc_id % 19 != 0 AND (i + doc_id) % 5 = 2))
         THEN 'repeated boilerplate line'
         ELSE array_join(slice(words, cast(i * 5 + 1 as int), 5), ' ')
    END,
    CASE WHEN ((doc_id % 17 = 0 AND i % 2 = 1) OR (i + doc_id) % 11 = 3)
         THEN '...' ELSE '' END
  ))
"""


def _synth_multiline(d: DataFrame) -> DataFrame:
    """(doc_id, lang, line) from the single-line corpus — see
    ``_SYNTH_LINES_SPARK``."""
    return (
        d.select(
            "doc_id", "lang",
            F.split(F.trim(F.col("text")), r"\s+").alias("words"),
        )
        .select("doc_id", "lang", F.expr(_SYNTH_LINES_SPARK).alias("lines"))
        .select("doc_id", "lang", F.explode("lines").alias("line"))
    )


@query(
    "text_gopher_line_rules",
    r"""
    WITH w AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents
    ),
    ln AS (
      SELECT doc_id, lang,
        list_transform(range(CAST(ceil(len(words) / 5.0) AS INT)), i ->
          (CASE WHEN (doc_id % 13 = 0 OR (i + doc_id) % 7 = 0)
                THEN '- ' ELSE '' END)
          || (CASE WHEN ((doc_id % 19 = 0 AND i % 2 = 0)
                         OR (doc_id % 19 <> 0 AND (i + doc_id) % 5 = 2))
                THEN 'repeated boilerplate line'
                ELSE array_to_string(words[i*5+1 : i*5+5], ' ') END)
          || (CASE WHEN ((doc_id % 17 = 0 AND i % 2 = 1)
                         OR (i + doc_id) % 11 = 3)
                THEN '...' ELSE '' END)
        ) AS lines
      FROM w
    ),
    l AS (SELECT doc_id, lang, unnest(lines) AS line FROM ln),
    lc AS (
      SELECT doc_id, lang, line, count(*) AS c, len(line) AS cl
      FROM l GROUP BY doc_id, lang, line
    ),
    doc AS (
      SELECT doc_id, lang,
        CAST(sum(c) AS BIGINT) AS n_lines,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(sum(c * cl) AS BIGINT) AS total_chars,
        CAST(sum((c - 1) * cl) AS BIGINT) AS dup_chars,
        CAST(sum(CASE WHEN line LIKE '- %' THEN c ELSE 0 END) AS BIGINT)
          AS n_bullets,
        CAST(sum(CASE WHEN line LIKE '%...' THEN c ELSE 0 END) AS BIGINT)
          AS n_ellipsis
      FROM lc GROUP BY doc_id, lang
    ),
    scored AS (
      SELECT lang, doc_id, n_lines, dup_chars, n_bullets, n_ellipsis,
        (10 * (n_lines - n_distinct) <= 3 * n_lines
         AND 5 * dup_chars <= total_chars
         AND 10 * n_bullets <= 9 * n_lines
         AND 10 * n_ellipsis <= 3 * n_lines) AS keep
      FROM doc
    )
    SELECT lang, keep,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_lines) AS BIGINT) AS lines_chk,
           CAST(sum(dup_chars) AS BIGINT) AS dupchars_chk,
           CAST(sum(n_bullets) AS BIGINT) AS bullets_chk,
           CAST(sum(n_ellipsis) AS BIGINT) AS ellipsis_chk
    FROM scored GROUP BY lang, keep
    """,
    "Gopher LINE-level quality rules (round-12; Rae et al. 2021 table "
    "A1, the half deliberately deferred in round 11): per document — "
    "duplicate-line fraction <= 0.3, duplicate-line CHAR fraction "
    "<= 0.2, bullet-start fraction <= 0.9, ellipsis-end fraction "
    "<= 0.3 — every threshold in cross-multiplied integer form. The "
    "multi-line corpus is derived deterministically from the "
    "single-line fixture inside BOTH engines (same (doc_id, i) "
    "function), so the oracle replays the whole rule table; "
    "sum_doc_id pins per-verdict membership exactly.",
)
def text_gopher_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the line synthesis is map-only; then the ONE
    (doc_id, line) partial hash agg + doc rollup documented on
    ``_gopher_line_verdicts``; the final rollup is O(langs x 2)."""
    d = load(spark, sf_dir, "documents")
    return (
        _gopher_line_verdicts(_synth_multiline(d))
        .groupBy("lang", "keep")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_lines").cast("long").alias("lines_chk"),
            F.sum("dup_chars").cast("long").alias("dupchars_chk"),
            F.sum("n_bullets").cast("long").alias("bullets_chk"),
            F.sum("n_ellipsis").cast("long").alias("ellipsis_chk"),
        )
    )


def _c4_page_verdicts(lines: DataFrame) -> DataFrame:
    """Page verdicts for the C4 cleaning rules over exploded (doc_id,
    lang, line) rows — callers split real multi-line text on newlines;
    the registry query synthesizes lines (``_SYNTH_C4_SPARK``).

    Line rule: keep only lines ending in terminal punctuation
    (. ! ? \") with >= 3 whitespace words. Page rules: drop on any
    '{', any case-folded 'lorem ipsum', or < 3 surviving lines.
    Scale: the per-line rule is a map-side flag; ONE (doc_id) partial
    agg rolls pages up. No Python UDFs."""
    terminal = (
        F.col("line").endswith(".")
        | F.col("line").endswith("!")
        | F.col("line").endswith("?")
        | F.col("line").endswith('"')
    )
    keep_line = terminal & (F.size(F.split(F.col("line"), r"\s+")) >= 3)
    doc = (
        lines.select(
            "doc_id", "lang", "line", keep_line.alias("keep_line"),
            F.col("line").contains("{").alias("brace"),
            F.lower(F.col("line")).contains("lorem ipsum").alias("lorem"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.when(F.col("keep_line"), 1).otherwise(0))
            .cast("long").alias("n_kept_lines"),
            F.sum(F.when(F.col("keep_line"), F.length("line")).otherwise(0))
            .cast("long").alias("kept_chars"),
            F.max("brace").alias("has_brace"),
            F.max("lorem").alias("has_lorem"),
        )
    )
    kept = (
        ~F.col("has_brace") & ~F.col("has_lorem")
        & (F.col("n_kept_lines") >= 3)
    )
    return doc.withColumn("kept", kept)



#: C4-specific deterministic multi-line derivation (separate from the
#: Gopher synthesis so each oracle stays frozen): 5-word lines; two
#: thirds get a terminal period ((i+doc_id)%3 != 0); doc_id%29 docs
#: open with a 'lorem ipsum' line and doc_id%23 docs (that aren't %29)
#: open with a '{'-bearing line — the paper's page-level violators,
#: planted as REAL string content the rules then detect.
_SYNTH_C4_SPARK = """
transform(sequence(0, cast(ceil(size(words) / 5.0) as int) - 1), i ->
  concat(
    CASE WHEN (doc_id % 29 = 0 AND i = 0)
         THEN 'lorem ipsum dolor sit amet'
         WHEN (doc_id % 23 = 0 AND i = 0)
         THEN concat(array_join(slice(words, 1, 5), ' '), ' {')
         ELSE array_join(slice(words, cast(i * 5 + 1 as int), 5), ' ')
    END,
    CASE WHEN (i + doc_id) % 3 != 0 THEN '.' ELSE '' END
  ))
"""


@query(
    "text_c4_clean",
    r"""
    WITH w AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents
    ),
    ln AS (
      SELECT doc_id, lang,
        list_transform(range(CAST(ceil(len(words) / 5.0) AS INT)), i ->
          (CASE WHEN (doc_id % 29 = 0 AND i = 0)
                THEN 'lorem ipsum dolor sit amet'
                WHEN (doc_id % 23 = 0 AND i = 0)
                THEN array_to_string(words[1:5], ' ') || ' {'
                ELSE array_to_string(words[i*5+1 : i*5+5], ' ') END)
          || (CASE WHEN (i + doc_id) % 3 <> 0 THEN '.' ELSE '' END)
        ) AS lines
      FROM w
    ),
    l AS (SELECT doc_id, lang, unnest(lines) AS line FROM ln),
    scored AS (
      SELECT doc_id, lang, line,
        (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
         OR line LIKE '%"')
        AND len(regexp_split_to_array(line, '\s+')) >= 3 AS keep_line,
        contains(line, '{') AS brace,
        contains(lower(line), 'lorem ipsum') AS lorem
      FROM l
    ),
    doc AS (
      SELECT doc_id, lang,
        CAST(sum(CASE WHEN keep_line THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept_lines,
        CAST(sum(CASE WHEN keep_line THEN len(line) ELSE 0 END) AS BIGINT)
          AS kept_chars,
        max(brace) AS has_brace, max(lorem) AS has_lorem
      FROM scored GROUP BY doc_id, lang
    ),
    verdict AS (
      SELECT lang, doc_id, n_kept_lines, kept_chars,
        (NOT has_brace AND NOT has_lorem AND n_kept_lines >= 3) AS kept
      FROM doc
    )
    SELECT lang, kept,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_kept_lines) AS BIGINT) AS kept_lines_chk,
           CAST(sum(kept_chars) AS BIGINT) AS kept_chars_chk
    FROM verdict GROUP BY lang, kept
    """,
    "C4-style page cleaning (round-12; Raffel et al. 2020 §2.2): "
    "line-level — keep only lines ending in terminal punctuation "
    "(. ! ? \") with at least 3 words; page-level — drop any page "
    "containing '{' or 'lorem ipsum' (case-folded), or with fewer "
    "than 3 surviving lines. The multi-line corpus (with planted "
    "violators) derives deterministically from the single-line "
    "fixture identically in both engines; every rule then operates "
    "on REAL string content. sum_doc_id pins per-verdict membership.",
)
def text_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: line synthesis is map-only, then the one partial
    agg documented on ``_c4_page_verdicts``; the final rollup is
    O(langs x 2). The C4 rules complement the Gopher tables
    (repetition/structure) with the punctuation/boilerplate axis —
    together the standard web-crawl cleaning stack."""
    d = load(spark, sf_dir, "documents")
    lines = (
        d.select(
            "doc_id", "lang",
            F.split(F.trim(F.col("text")), r"\s+").alias("words"),
        )
        .select("doc_id", "lang", F.expr(_SYNTH_C4_SPARK).alias("lines"))
        .select("doc_id", "lang", F.explode("lines").alias("line"))
    )
    return (
        _c4_page_verdicts(lines)
        .groupBy("lang", "kept")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_kept_lines").cast("long").alias("kept_lines_chk"),
            F.sum("kept_chars").cast("long").alias("kept_chars_chk"),
        )
    )


@query(
    "text_kneser_ney_cross_entropy",
    r"""
    WITH toks AS (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)), i ->
                    struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
           FROM toks WHERE len(t) >= 2),
    flat AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    train AS (SELECT * FROM flat WHERE doc_id % 5 <> 0),
    held AS (SELECT * FROM flat WHERE doc_id % 5 = 0),
    c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
           FROM train GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c2) AS DOUBLE) AS c1,
                  CAST(count(*) AS DOUBLE) AS n1p_head
           FROM c2 GROUP BY 1),
    tail AS (SELECT w2, CAST(count(*) AS DOUBLE) AS n1p_tail
             FROM c2 GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS d_bigrams,
                   CAST(count(DISTINCT w2) AS DOUBLE) AS v
            FROM c2),
    scored AS (SELECT held.doc_id,
                      CAST(round(ln(
                        CASE WHEN c1.c1 IS NULL THEN
                          (coalesce(tail.n1p_tail, 0) + 0.5)
                            / (tot.d_bigrams + 0.5 * (tot.v + 1))
                        ELSE
                          greatest(coalesce(c2.c2, 0) - 0.75, 0) / c1.c1
                          + (0.75 * c1.n1p_head / c1.c1)
                            * ((coalesce(tail.n1p_tail, 0) + 0.5)
                               / (tot.d_bigrams + 0.5 * (tot.v + 1)))
                        END) * 1000000) AS BIGINT) AS lp
               FROM held
               LEFT JOIN c2 ON held.w1 = c2.w1 AND held.w2 = c2.w2
               LEFT JOIN c1 ON held.w1 = c1.w1
               LEFT JOIN tail ON held.w2 = tail.w2, tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-(CAST(sum(lp) AS DOUBLE) / count(*)) / 1000000, 4)
             AS cross_entropy
    FROM scored GROUP BY doc_id
    ORDER BY cross_entropy DESC, doc_id
    LIMIT 40
    """,
    "Interpolated Kneser-Ney bigram cross-entropy (d=0.75) — the "
    "smoothing KenLM actually ships, one rung above "
    "text_bigram_cross_entropy's add-k: the backoff mass goes to the "
    "CONTINUATION probability (how many distinct heads precede w2), "
    "so a word frequent only inside one collocation ('Francisco') "
    "stops inflating unseen-context scores. Unseen heads back off to "
    "the continuation distribution; the continuation itself is add-k "
    "smoothed so OOV tails stay finite. Top-40 most surprising "
    "held-out docs.",
)
def text_kneser_ney_cross_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same scale shape as the add-k op (text_bigram_cross_entropy):
    one corpus bigram explode, then every model table (c2, the
    per-head totals + continuation-head counts, the per-tail
    continuation counts, the two scalars) is derived from the
    vocabulary-bounded c2 table — never a second corpus pass. Score
    joins are AQE-broadcast; scaled-integer micro-nat log-probs keep
    per-doc means exact and accumulation-order-free."""
    d = load(spark, sf_dir, "documents")
    flat = (
        d.select("doc_id", _ws_tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    train = flat.filter(F.col("doc_id") % 5 != 0)
    held = flat.filter(F.col("doc_id") % 5 == 0)
    # materialize the vocabulary-bounded count table ONCE: every model
    # table below re-aggregates c2, and without the checkpoint Catalyst
    # re-expands the corpus explode per consumer (5 corpus scans — the
    # plan pin in tests/test_plans.py counts Generate nodes)
    c2 = (
        train.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").cast("double").alias("c1"),
        F.count(F.lit(1)).cast("double").alias("n1p_head"),
    )
    tail = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("n1p_tail")
    )
    tot = c2.agg(
        F.count(F.lit(1)).cast("double").alias("d_bigrams"),
        F.countDistinct("w2").cast("double").alias("v"),
    )
    p_cont = (F.coalesce(F.col("n1p_tail"), F.lit(0.0)) + 0.5) / (
        F.col("d_bigrams") + 0.5 * (F.col("v") + 1)
    )
    p = F.when(F.col("c1").isNull(), p_cont).otherwise(
        F.greatest(
            F.coalesce(F.col("c2"), F.lit(0.0)) - 0.75, F.lit(0.0)
        )
        / F.col("c1")
        + (0.75 * F.col("n1p_head") / F.col("c1")) * p_cont
    )
    return (
        held.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(tail, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(p) * 1000000).cast("long").alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -(F.sum("lp").cast("double") / F.count(F.lit(1))) / 1000000, 4
            ).alias("cross_entropy"),
        )
        .select("doc_id", "n_bigrams", "cross_entropy")
        .orderBy(F.desc("cross_entropy"), F.asc("doc_id"))
        .limit(40)
    )


# top-K vocabulary size for the coverage audit. Real deployments use
# the tokenizer's actual vocab size (32k-256k); the driver testdata
# synthesizes text from a ~31-word vocabulary, so the audit's K is
# sized to BIND there (top-8 leaves real uncovered mass per language
# instead of a degenerate all-1.0 report).
VOCAB_K = 8


@query(
    "text_vocab_coverage",
    rf"""
    WITH t AS (SELECT lang,
                      unnest(string_split_regex(lower(text), '\s+')) AS token
               FROM documents),
    freq AS (SELECT token, count(*) AS tf FROM t GROUP BY 1),
    vocab AS (SELECT token FROM (
                SELECT token,
                       row_number() OVER (ORDER BY tf DESC, token) AS r
                FROM freq) WHERE r <= {VOCAB_K}),
    j AS (SELECT t.lang, t.token,
                 CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM t LEFT JOIN vocab v USING (token))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(hit) AS BIGINT) AS covered,
           round(CAST(sum(hit) AS DOUBLE) / count(*), 4) AS coverage
    FROM j GROUP BY lang ORDER BY lang
    """,
    f"Vocabulary coverage audit: the fraction of each language's "
    f"corpus tokens covered by the GLOBAL top-{VOCAB_K} vocabulary "
    f"(ties broken by token for a deterministic cut) — the "
    f"tokenizer-design number that shows which languages a shared "
    f"vocabulary underserves (low coverage = heavy fallback/UNK "
    f"pressure for that language).",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one (token) agg builds the frequency table, the top-K
    cut is an actual K-sized TakeOrdered (orderBy + limit — Spark
    plans TakeOrderedAndProject: per-partition K-heaps, a K-row
    driver merge, never a single-task sort of the full distinct-token
    table; round-16 re-plan of the r15 row_number-over-unpartitioned-
    window form, which WAS that single-task sort), and membership
    rides a BROADCAST left join back over the token stream: the
    corpus is touched twice, shuffled once on the token key with
    map-side combine, and the per-language report is a tiny agg. No
    window anywhere in the plan (pinned in tests/test_plans.py)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(_ws_tokens(F.col("text"))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = (
        freq.orderBy(F.desc("tf"), "token").limit(VOCAB_K).select("token")
    )
    return (
        toks.join(
            F.broadcast(vocab.withColumn("hit", F.lit(1))), "token", "left"
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("covered"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("coverage"),
        )
        .orderBy("lang")
    )
