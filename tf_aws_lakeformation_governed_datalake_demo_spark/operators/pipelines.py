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
