"""UDF surface (SURVEY.md §2.12): Arrow-vectorized pandas UDFs.

The engine's stance: built-ins first (everything else in operators/ is
JVM-side), but when Python *is* required, it must be Arrow-batched —
never row-at-a-time. These operators prove the pandas-UDF path with
oracle-checkable semantics (the scalar UDF reproduces exactly what the
built-in/ DuckDB compute, so the driver hash-matches it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load
from .registry import query

TOKEN_RE = "[A-Za-z]+|[0-9]+"


@F.pandas_udf(T.LongType())
def pandas_token_count(texts: pd.Series) -> pd.Series:
    """Vectorized regex token counter (same token class as
    text.TOKEN_RE, so results equal the JVM regexp_extract_all path)."""
    return texts.str.findall(TOKEN_RE).map(len).astype("int64")


@F.pandas_udf(T.DoubleType())
def pandas_zscore(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    """Vectorized multi-column scalar UDF: (v - mean) / std."""
    return (v - mean) / std


@query(
    "udf_pandas_token_count",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
    FROM documents
    """,
    "Scalar pandas UDF (Arrow-batched) token counter — hash-equal to the "
    "built-in regexp path, proving the §2.12 UDF surface without "
    "sacrificing the oracle.",
)
def udf_pandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", pandas_token_count("text").alias("n_tokens"))


def _order_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas body: per-customer inter-order gap statistics."""
    pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
    gaps = pdf["o_orderdate"].diff().dt.days.dropna()
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [len(pdf)],
            "median_gap_days": [float(gaps.median()) if len(gaps) else None],
            "max_gap_days": [float(gaps.max()) if len(gaps) else None],
        }
    )


@query(
    "udf_applyinpandas_order_gaps",
    """
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(median(gap) AS DOUBLE) AS median_gap_days,
           CAST(max(gap) AS DOUBLE) AS max_gap_days
    FROM g GROUP BY o_custkey
    """,
    "Grouped-map pandas UDF (applyInPandas): per-customer inter-order gap "
    "stats — each group arrives as a pandas DataFrame, the canonical "
    "custom-aggregation escape hatch. Oracle via window-lag SQL.",
)
def udf_applyinpandas_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on the grouping key; each group is processed in
    a single Arrow batch — groups must fit in worker memory (orders per
    customer: bounded), which is the documented applyInPandas contract."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    return o.groupBy("o_custkey").applyInPandas(
        _order_gaps,
        "o_custkey long, n_orders long, median_gap_days double, max_gap_days double",
    )


@query(
    "udf_grouped_zscore",
    """
    WITH s AS (
      SELECT o_orderstatus, avg(o_totalprice) AS m,
             stddev_samp(o_totalprice) AS sd
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey, o.o_orderstatus,
           round(CAST((o.o_totalprice - s.m) / s.sd AS DOUBLE), 3) AS z
    FROM orders o JOIN s ON o.o_orderstatus = s.o_orderstatus
    WHERE abs((o.o_totalprice - s.m) / s.sd) > 1.5
    """,
    "Pandas UDF in a real pipeline: per-group z-score outliers (group "
    "stats via JVM agg, normalization via Arrow-vectorized UDF). Rounded "
    "to 3 decimals — stddev agg differs ~1e-12 across engines.",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    stats = o.groupBy(F.col("o_orderstatus").alias("st")).agg(
        F.avg("o_totalprice").alias("m"), F.stddev_samp("o_totalprice").alias("sd")
    )
    z = pandas_zscore(F.col("o_totalprice"), F.col("m"), F.col("sd"))
    return (
        o.join(F.broadcast(stats), o.o_orderstatus == stats.st)
        .withColumn("z_raw", z)
        .filter(F.abs(F.col("z_raw")) > 1.5)
        .select(
            "o_orderkey", "o_orderstatus", F.round("z_raw", 3).alias("z")
        )
    )


@F.pandas_udf(T.DoubleType())
def pandas_geomean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF body: geometric mean (no Spark built-in).

    Arrives as one Arrow batch per group; returns one scalar — the
    vectorized UDAF contract."""
    import numpy as np

    return float(np.exp(np.log(v).mean()))


@query(
    "udf_grouped_agg_geomean",
    """
    SELECT o_orderstatus,
           round(CAST(exp(avg(ln(o_totalprice))) AS DOUBLE), 2) AS geomean_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    "Grouped-aggregate pandas UDAF (Arrow-batched): per-status geometric "
    "mean of order price — an aggregate Spark has no built-in for. "
    "Oracle via exp(avg(ln(x))).",
)
def udf_grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: partial aggregation does NOT apply to pandas UDAFs — each
    group's values ship to one executor — so this pattern is for
    bounded-cardinality groups; unbounded keys belong in the log-sum
    formulation (sum(ln x) is partial-aggregatable JVM-side)."""
    o = load(spark, sf_dir, "orders")
    # Spark disallows mixing a pandas UDAF with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count joins in afterwards —
    # a 3-row broadcast join.
    g = o.groupBy("o_orderstatus").agg(
        F.round(pandas_geomean("o_totalprice"), 2).alias("geomean_price")
    )
    counts = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    return g.join(counts, "o_orderstatus")


@query(
    "udf_udtf_tokenize",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
               FROM documents WHERE doc_id < 50 AND trim(text) <> '')
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
    FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) u
    """,
    "Python UDTF (table function): tokenize each document into (pos, "
    "token) rows via a LATERAL join — the §2.12 UDTF surface. Restricted "
    "to doc_id < 50 (UDTFs are row-at-a-time Python; the scale path for "
    "full-corpus tokenization is the explode/split built-in).",
)
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").lower().split()):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM __udtf_docs d, LATERAL tokenize_udtf(d.text) t "
        "WHERE d.doc_id < 50"
    )
