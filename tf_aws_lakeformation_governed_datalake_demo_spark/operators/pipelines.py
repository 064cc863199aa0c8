"""End-to-end training-data curation pipelines — compositions of the
dedup/quality/text operators into the multi-stage jobs an LLM data team
actually runs. Each stage is declarative, so Catalyst fuses the whole
pipeline into a handful of stages regardless of how many logical steps
it has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query


@query(
    "pipeline_quality_filter",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(length(text) AS BIGINT) AS n,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                 x -> list_contains(['the','a','and','of','to','in','is','it','for','on'], x)))
               * 1.0 / len(string_split_regex(lower(text), '\\s+')) AS sw
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(n) AS BIGINT) AS min_chars,
           CAST(max(n) AS BIGINT) AS max_chars
    FROM scored
    WHERE n BETWEEN 100 AND 500 AND sw >= 0.05
    GROUP BY lang
    """,
    "Curation stage 1: quality-filter documents (length bounds + minimum "
    "stopword ratio — the classic junk filter) and report survivors per "
    "language.",
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: score+filter are map-only over the scan; only the tiny
    per-language summary shuffles."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    stop = F.array(*[F.lit(w) for w in
                     ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")])
    sw = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))) * F.lit(1.0)
        / F.size(toks)
    )
    scored = d.select(
        "doc_id", "lang", F.length("text").cast("long").alias("n"), sw.alias("sw")
    )
    return (
        scored.filter(F.col("n").between(100, 500) & (F.col("sw") >= 0.05))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("n").alias("min_chars"),
            F.max("n").alias("max_chars"),
        )
    )


@query(
    "pipeline_dedup_then_stats",
    """
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(d.text)) AS BIGINT) AS total_chars
    FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    GROUP BY d.source
    """,
    "Curation stage 2: normalized exact-dedup (keep lowest doc_id per "
    "content hash), then corpus statistics per source over survivors.",
)
def pipeline_dedup_then_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the dedup groupBy shuffles one row per distinct hash; the
    keeper join is a semi-join on doc_id. No full-corpus second pass."""
    d = load(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    keepers = (
        d.groupBy(F.md5(normalized).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        d.join(keepers, "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "pipeline_data_profile",
    """
    SELECT 'l_quantity' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           round(min(l_quantity), 4) AS vmin, round(max(l_quantity), 4) AS vmax
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_extendedprice) AS BIGINT),
           CAST(count(DISTINCT l_extendedprice) AS BIGINT),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           round(min(l_discount), 4), round(max(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(l_tax) AS BIGINT),
           CAST(count(DISTINCT l_tax) AS BIGINT),
           round(min(l_tax), 4), round(max(l_tax), 4)
    FROM lineitem
    """,
    "Data-profile report (the ANALYZE TABLE / expectations-suite "
    "shape): per numeric column, row/null/distinct counts and exact "
    "min/max in one corpus pass — the read-side complement of the "
    "write-side CHECK constraints (a drifted upstream shows up here "
    "before it violates anything).",
)
def pipeline_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: ONE scan computes every column's aggregates side by side
    (Catalyst plans a single hash-agg over all measures — column
    pruning keeps the scan to exactly the profiled columns); the
    stack() unpivot to long form touches one 1-row frame. Exact
    count(DISTINCT) over multiple columns expands the agg (Spark plans
    one expand + agg); at extreme cardinalities swap in
    approx_count_distinct per column, documented rather than silent."""
    li = load(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, vmin, vmax)"
    )


@query(
    "pipeline_web_cleaning_stack",
    r"""
    WITH w AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents
    ),
    c4ln AS (
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
    c4l AS (SELECT doc_id, unnest(lines) AS line FROM c4ln),
    c4doc AS (
      SELECT doc_id,
        sum(CASE WHEN (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
                       OR line LIKE '%"')
                 AND len(regexp_split_to_array(line, '\s+')) >= 3
                 THEN 1 ELSE 0 END) AS n_kept_lines,
        max(contains(line, '{')) AS has_brace,
        max(contains(lower(line), 'lorem ipsum')) AS has_lorem
      FROM c4l GROUP BY doc_id
    ),
    s1 AS (
      SELECT d.* FROM documents d JOIN c4doc c USING (doc_id)
      WHERE NOT c.has_brace AND NOT c.has_lorem AND c.n_kept_lines >= 3
    ),
    gw AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
      FROM s1
    ),
    gbase AS (
      SELECT doc_id, len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct,
             list_sum(list_transform(words, x -> len(x))) AS word_chars,
             list_filter(list_transform(words, (x, i) ->
               CASE WHEN i < len(words) THEN x || ' ' || words[i+1] END),
               y -> y IS NOT NULL) AS bigrams
      FROM gw
    ),
    gbg AS (SELECT doc_id, unnest(bigrams) AS bigram FROM gbase),
    gbgc AS (
      SELECT doc_id, bigram, count(*) AS c FROM gbg GROUP BY doc_id, bigram
    ),
    gtop AS (
      SELECT doc_id, CAST(c * len(bigram) AS BIGINT) AS top_chars,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY c DESC, bigram
             ) AS rk
      FROM gbgc
    ),
    s2 AS (
      SELECT s1.* FROM s1
      JOIN gbase b USING (doc_id)
      JOIN gtop t ON t.doc_id = s1.doc_id AND t.rk = 1
      WHERE b.n_words >= 15
        AND 3 * b.n_words <= b.word_chars
        AND b.word_chars <= 10 * b.n_words
        AND 10 * (b.n_words - b.n_distinct) <= 6 * b.n_words
        AND 5 * t.top_chars <= b.word_chars
    ),
    s3 AS (
      SELECT * FROM (
        SELECT s2.*, row_number() OVER (
          PARTITION BY md5(text) ORDER BY doc_id
        ) AS dk FROM s2
      ) WHERE dk = 1
    ),
    s4 AS (
      SELECT * FROM (
        SELECT s3.*, row_number() OVER (
          PARTITION BY source ORDER BY md5(text), doc_id
        ) AS ck FROM s3
      ) WHERE ck <= 15
    ),
    raw_n AS (SELECT lang, count(*) AS n_raw FROM documents GROUP BY lang),
    s1_n AS (SELECT lang, count(*) AS n_c4 FROM s1 GROUP BY lang),
    s2_n AS (SELECT lang, count(*) AS n_gopher FROM s2 GROUP BY lang),
    s3_n AS (SELECT lang, count(*) AS n_dedup FROM s3 GROUP BY lang),
    s4_n AS (
      SELECT lang, count(*) AS n_caps, sum(doc_id) AS sum_doc_id
      FROM s4 GROUP BY lang
    )
    SELECT lang,
           CAST(n_raw AS BIGINT) AS n_raw,
           CAST(coalesce(n_c4, 0) AS BIGINT) AS n_c4,
           CAST(coalesce(n_gopher, 0) AS BIGINT) AS n_gopher,
           CAST(coalesce(n_dedup, 0) AS BIGINT) AS n_dedup,
           CAST(coalesce(n_caps, 0) AS BIGINT) AS n_caps,
           CAST(coalesce(sum_doc_id, 0) AS BIGINT) AS sum_doc_id
    FROM raw_n
    LEFT JOIN s1_n USING (lang) LEFT JOIN s2_n USING (lang)
    LEFT JOIN s3_n USING (lang) LEFT JOIN s4_n USING (lang)
    """,
    "The standard web-crawl cleaning stack END TO END (round-12): "
    "C4 page cleaning (terminal punctuation / 3-word lines, brace + "
    "lorem-ipsum + <3-line page drops) -> Gopher word-level quality "
    "rules -> exact content dedup (keep-first by md5(text)) -> "
    "FineWeb per-domain caps — the per-lang funnel counts after every "
    "stage, with sum_doc_id pinning the FINAL survivor membership. "
    "Each stage reuses the factored rule engine of its standalone "
    "operator, so the composition is the proof that the pieces "
    "actually fit together.",
)
def pipeline_web_cleaning_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the stack fuses to ~5 shuffles total (the C4 doc rollup,
    the bigram partial agg, the content-hash dedup window, the salted
    two-phase caps, the lang rollup) — each documented on its factored
    helper; stages communicate by doc_id semi-joins that reuse the
    scan. No stage materializes; Catalyst plans the whole funnel as
    one DAG."""
    from pyspark.sql import Window as W

    from .curation import _domain_caps_survivors
    from .text import (
        _SYNTH_C4_SPARK,
        _c4_page_verdicts,
        _gopher_word_verdicts,
    )

    d = load(spark, sf_dir, "documents")
    c4_lines = (
        d.select(
            "doc_id", "lang",
            F.split(F.trim(F.col("text")), r"\s+").alias("words"),
        )
        .select("doc_id", "lang", F.expr(_SYNTH_C4_SPARK).alias("lines"))
        .select("doc_id", "lang", F.explode("lines").alias("line"))
    )
    c4_keep = _c4_page_verdicts(c4_lines).filter("kept").select("doc_id")
    s1 = d.join(c4_keep, "doc_id")
    g_keep = (
        _gopher_word_verdicts(s1.select("doc_id", "lang", "text"))
        .filter("keep")
        .select("doc_id")
    )
    s2 = s1.join(g_keep, "doc_id")
    s3 = (
        s2.withColumn(
            "dk",
            F.row_number().over(
                W.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("dk") == 1)
        .drop("dk")
    )
    s4 = _domain_caps_survivors(s3)

    def _n(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).cast("long").alias(alias)
        )

    funnel = (
        _n(d, "n_raw")
        .join(_n(s1, "n_c4"), "lang", "left")
        .join(_n(s2, "n_gopher"), "lang", "left")
        .join(_n(s3, "n_dedup"), "lang", "left")
        .join(
            s4.groupBy("lang").agg(
                F.count(F.lit(1)).cast("long").alias("n_caps"),
                F.sum("doc_id").cast("long").alias("sum_doc_id"),
            ),
            "lang",
            "left",
        )
    )
    fill = {
        c: 0 for c in ("n_c4", "n_gopher", "n_dedup", "n_caps", "sum_doc_id")
    }
    return funnel.na.fill(fill).select(
        "lang", "n_raw", "n_c4", "n_gopher", "n_dedup", "n_caps",
        "sum_doc_id",
    )


@query(
    "pipeline_perplexity_buckets",
    r"""
    WITH toks AS (SELECT doc_id, lang,
                         string_split_regex(lower(text), '\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id, lang,
                  unnest(list_transform(range(1, len(t)), i ->
                    struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
           FROM toks WHERE len(t) >= 2),
    flat AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg),
    c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
           FROM flat GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM flat GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM flat),
    scored AS (SELECT flat.doc_id, flat.lang,
                      CAST(round(ln((coalesce(c2.c2, 0) + 0.5)
                                    / (coalesce(c1.c1, 0) + 0.5 * v.v))
                                 * 1000000) AS BIGINT) AS lp
               FROM flat
               LEFT JOIN c2 ON flat.w1 = c2.w1 AND flat.w2 = c2.w2
               LEFT JOIN c1 ON flat.w1 = c1.w1, v),
    doc AS (SELECT doc_id, lang,
                   (-CAST(sum(lp) AS BIGINT)) // (count(*) * 1000)
                     AS ce_milli
            FROM scored GROUP BY 1, 2),
    rng AS (SELECT lang, min(ce_milli) AS mn, max(ce_milli) AS mx
            FROM doc GROUP BY 1)
    SELECT d.lang,
           CAST((d.ce_milli - r.mn) * 10 // (r.mx - r.mn + 1) AS BIGINT)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.doc_id) AS BIGINT) AS sum_doc_id,
           CAST(min(d.ce_milli) AS BIGINT) AS min_ce_milli,
           CAST(max(d.ce_milli) AS BIGINT) AS max_ce_milli
    FROM doc d JOIN rng r ON d.lang = r.lang
    GROUP BY d.lang, 2
    """,
    "Perplexity bucketing (CCNet/Dolma's curation primitive): score "
    "every document with the corpus-trained smoothed bigram LM, then "
    "assign per-language fluency buckets 0-9 so downstream mixing can "
    "up/down-sample by bucket. Buckets are EQUAL-WIDTH over the "
    "language's scaled-integer CE range — derived from one min/max "
    "partial aggregate, deliberately NOT per-language quantiles: an "
    "exact per-lang ntile is a per-key sort, and at 100 TB one "
    "language is half the crawl (the same skew wall "
    "pipeline_domain_caps had to engineer around). Integer milli-nat "
    "CE and integer bucket math make the assignment bit-reproducible "
    "across engines.",
)
def pipeline_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one corpus bigram explode into two map-side-combined
    count tables (vocabulary-bounded, AQE-broadcast for the score
    joins), one per-doc partial agg, one per-LANG min/max partial agg
    broadcast back — no window, no sort, no skew-prone per-key
    ordering anywhere. Scaled-integer log-probs (micro-nats) keep the
    per-doc mean exact and accumulation-order-free, same discipline as
    text_bigram_cross_entropy; milli-nat integer division and integer
    bucket arithmetic are floor-consistent in Spark (div) and DuckDB
    (//) for the positive CE domain."""
    from .text import _ws_tokens

    d = load(spark, sf_dir, "documents")
    flat = (
        d.select("doc_id", "lang", _ws_tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select(
            "doc_id", "lang",
            F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"),
        )
    )
    # ONE materialization of the vocabulary-bounded count table; the
    # per-head totals and the vocabulary size are exact re-aggregations
    # of it (c1(w1) = sum_w2 c2; V = #distinct tails among c2 rows), so
    # the corpus explodes exactly twice — once into this checkpoint,
    # once on the scoring side — instead of once per model table
    c2 = (
        flat.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("double").alias("c1"))
    v = c2.select("w2").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    p = (F.coalesce(F.col("c2"), F.lit(0.0)) + 0.5) / (
        F.coalesce(F.col("c1"), F.lit(0.0)) + 0.5 * F.col("v")
    )
    doc = (
        flat.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id", "lang",
            F.round(F.log(p) * 1000000).cast("long").alias("lp"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.expr("(-sum(lp)) div (count(*) * 1000)").alias("ce_milli")
        )
        # materialize the per-doc CE table: the per-lang range derives
        # from it and then joins back to it — without this the bucket
        # join re-expands the whole scoring subtree (a second corpus
        # explode + score join). Persisting per-doc scores is exactly
        # what a production curation pipeline does between passes.
        .localCheckpoint(eager=True)
    )
    rng = doc.groupBy("lang").agg(
        F.min("ce_milli").alias("mn"), F.max("ce_milli").alias("mx")
    )
    return (
        doc.join(F.broadcast(rng), "lang")
        .select(
            "lang", "doc_id", "ce_milli",
            F.expr("(ce_milli - mn) * 10 div (mx - mn + 1)").alias("bucket"),
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.min("ce_milli").cast("long").alias("min_ce_milli"),
            F.max("ce_milli").cast("long").alias("max_ce_milli"),
        )
        .select(
            "lang", F.col("bucket").cast("long").alias("bucket"),
            "n_docs", "sum_doc_id", "min_ce_milli", "max_ce_milli",
        )
    )


@query(
    "pipeline_chunk_documents",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             string_split(lower(text), ' ') AS ws
      FROM documents),
    sized AS (SELECT doc_id, lang, ws, len(ws) AS n FROM toks),
    idx AS (
      SELECT doc_id, lang, ws, n,
             unnest(range(0, CAST(ceil(
               greatest(n - 64, 0) / 48.0) AS BIGINT) + 1)) AS chunk_index
      FROM sized),
    chunks AS (
      SELECT doc_id, lang, CAST(chunk_index AS BIGINT) AS chunk_index,
             list_slice(ws, chunk_index * 48 + 1,
                        least(chunk_index * 48 + 64, n)) AS cw
      FROM idx
      WHERE chunk_index = 0 OR chunk_index * 48 < n),
    final AS (
      SELECT doc_id, lang, chunk_index,
             CAST(len(cw) AS BIGINT) AS n_words,
             md5(array_to_string(cw, ' ')) AS chunk_hash
      FROM chunks)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(count(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks,
           CAST(sum(CAST(concat('0x', substr(chunk_hash, 1, 8)) AS BIGINT))
                AS BIGINT) AS hash_sum
    FROM final GROUP BY lang
    """,
    "Document chunking (round-14): split every document into "
    "64-word windows with stride 48 (25% overlap) — the stage "
    "between cleaning and packing that pretraining and RAG corpora "
    "both run. Chunk identity is CONTENT-ADDRESSED (md5 of the "
    "joined window), so re-ingesting a document yields identical "
    "chunk ids and near-dup windows collapse downstream; hash_sum "
    "pins every chunk's exact content, distinct_chunks exposes "
    "intra-corpus window duplication.",
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one map-only pass — per doc, the chunk ranges derive
    from a sequence() over the word array (no self-join, no window
    function) and explode into rows; the only shuffle is the final
    per-language aggregate. A 100 TB corpus chunks at scan speed;
    stride/size ride the closure as literals. Every document yields
    at least one chunk (short docs emit their full word list), so
    the stage never silently drops content."""
    d = load(spark, sf_dir, "documents")
    ws = d.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ws")
    ).withColumn("n", F.size("ws"))
    # chunk_index 0 .. ceil(max(n-64,0)/48); index i covers words
    # [i*48+1, min(i*48+64, n)] (1-based slice, matching the oracle)
    chunks = ws.select(
        "doc_id",
        "lang",
        "n",
        "ws",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(
                    F.greatest(F.col("n") - 64, F.lit(0)) / F.lit(48.0)
                ).cast("long"),
            )
        ).alias("chunk_index"),
    ).filter((F.col("chunk_index") == 0) | (F.col("chunk_index") * 48 < F.col("n")))
    final = chunks.select(
        "doc_id",
        "lang",
        "chunk_index",
        F.slice(
            "ws",
            F.col("chunk_index") * 48 + 1,
            F.least(
                F.lit(64),
                F.col("n") - F.col("chunk_index") * 48,
            ),
        ).alias("cw"),
    ).select(
        "doc_id",
        "lang",
        "chunk_index",
        F.size("cw").cast("long").alias("n_words"),
        F.md5(F.concat_ws(" ", "cw")).alias("chunk_hash"),
    )
    return (
        final.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.countDistinct("chunk_hash").cast("long").alias(
                "distinct_chunks"
            ),
            F.sum(
                F.conv(F.substring("chunk_hash", 1, 8), 16, 10).cast("long")
            )
            .cast("long")
            .alias("hash_sum"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_boilerplate_chunks",
    """
    WITH toks AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
      FROM documents),
    sized AS (SELECT doc_id, lang, ws, len(ws) AS n FROM toks),
    idx AS (
      SELECT doc_id, lang, ws, n,
             unnest(range(0, CAST(ceil(
               greatest(n - 64, 0) / 48.0) AS BIGINT) + 1)) AS chunk_index
      FROM sized),
    chunks AS (
      SELECT doc_id, lang,
             md5(array_to_string(
               list_slice(ws, chunk_index * 48 + 1,
                          least(chunk_index * 48 + 64, n)), ' '))
               AS chunk_hash
      FROM idx
      WHERE chunk_index = 0 OR chunk_index * 48 < n),
    freq AS (
      SELECT lang, chunk_hash,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM chunks GROUP BY lang, chunk_hash),
    flagged AS (SELECT lang, chunk_hash, n_docs FROM freq WHERE n_docs >= 2)
    SELECT f.lang,
           CAST(count(DISTINCT f.chunk_hash) AS BIGINT)
             AS n_boilerplate_chunks,
           CAST(max(f.n_docs) AS BIGINT) AS max_spread,
           CAST(count(DISTINCT c.doc_id) AS BIGINT) AS docs_affected
    FROM flagged f JOIN chunks c
      ON c.lang = f.lang AND c.chunk_hash = f.chunk_hash
    GROUP BY f.lang
    ORDER BY f.lang
    """,
    "Boilerplate detection via repeated chunks (round-14): a 64-word "
    "window appearing VERBATIM in >= 2 distinct documents of a "
    "language is boilerplate (headers, footers, license blocks, "
    "navigation) — the chunk-level cross-document frequency pass that "
    "feeds boilerplate stripping. Composes the chunking operator's "
    "content-addressed windows with one (lang, chunk_hash) frequency "
    "aggregate and a semi-join back to count affected documents.",
)
def pipeline_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the chunk pass is map-only (pipeline_chunk_documents'
    plan); frequency is one (lang, chunk_hash) partial-agg shuffle —
    hash keys, never text; the affected-docs count joins chunks back
    on the SAME key (co-partitioned by construction). Nothing
    quadratic: a chunk repeated in d docs costs d rows, not d^2
    pairs — the exact-dedup cost model at chunk granularity."""
    d = load(spark, sf_dir, "documents")
    ws = d.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ws")
    ).withColumn("n", F.size("ws"))
    chunks = (
        ws.select(
            "doc_id",
            "lang",
            "n",
            "ws",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(
                        F.greatest(F.col("n") - 64, F.lit(0)) / F.lit(48.0)
                    ).cast("long"),
                )
            ).alias("chunk_index"),
        )
        .filter(
            (F.col("chunk_index") == 0)
            | (F.col("chunk_index") * 48 < F.col("n"))
        )
        .select(
            "doc_id",
            "lang",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        "ws",
                        F.col("chunk_index") * 48 + 1,
                        F.least(
                            F.lit(64), F.col("n") - F.col("chunk_index") * 48
                        ),
                    ),
                )
            ).alias("chunk_hash"),
        )
    )
    freq = chunks.groupBy("lang", "chunk_hash").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    flagged = freq.filter(F.col("n_docs") >= 2)
    return (
        flagged.join(chunks, ["lang", "chunk_hash"])
        .groupBy(flagged.lang)
        .agg(
            F.countDistinct("chunk_hash")
            .cast("long")
            .alias("n_boilerplate_chunks"),
            F.max("n_docs").cast("long").alias("max_spread"),
            F.countDistinct("doc_id").cast("long").alias("docs_affected"),
        )
        .orderBy("lang")
    )
