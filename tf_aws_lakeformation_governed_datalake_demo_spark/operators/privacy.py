"""Corpus-level PII scrubbing for LLM training-data pipelines.

Extends the reference's per-column view masking (outputs.tf:48-49 masks
email/SSN inside the sales_masked view) to free-text redaction over the
`documents` corpus — the standard pre-training scrub pass (emails, SSNs,
phone numbers replaced by typed placeholder tokens).

The synthetic corpus contains no PII, so the registered query injects
deterministic doc_id-derived PII into the text in BOTH engines before
scrubbing — the redaction path is therefore genuinely exercised and
value-hash-checked, not an identity map.

Scale: pure regexp_replace / regexp_count projections — map-only,
whole-stage codegen, no shuffle; at 100 TB throughput is scan-bound.
All patterns avoid backreferences/lookaround so Java regex (Spark) and
RE2 (DuckDB/Athena) agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def scrub_pii(col):
    """Redact emails, then SSNs, then 7-digit phones (order matters:
    the SSN pattern must win before the phone pattern can eat its
    tail). Global replacement in both engines (Spark regexp_replace is
    global; the DuckDB oracle passes the 'g' flag)."""
    out = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, SSN_RE, "[SSN]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def _inject_pii(text_col, doc_id_col):
    """Deterministic synthetic PII derived from doc_id — identical
    string construction in the DuckDB oracle below."""
    return F.concat(
        text_col,
        F.lit(" Contact user"),
        doc_id_col.cast("string"),
        F.lit("@mail.example.com, SSN "),
        F.lpad((doc_id_col % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((doc_id_col % 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((doc_id_col % 10000).cast("string"), 4, "0"),
        F.lit(", phone 555-"),
        F.lpad((doc_id_col % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )


@query(
    "text_pii_scrub",
    f"""
    WITH injected AS (
      SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com, SSN '
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ', phone 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, t,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g'),
                 '{SSN_RE}', '[SSN]', 'g'),
               '{PHONE_RE}', '[PHONE]', 'g') AS s
      FROM injected
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{SSN_RE}')) AS BIGINT) AS n_ssns,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(s) AS scrub_md5,
           substr(s, 1, 40) AS scrub_prefix
    FROM scrubbed
    """,
    "Free-text PII redaction (email/SSN/phone) with injected synthetic PII.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = _inject_pii(F.col("text"), F.col("doc_id"))
    injected = d.select("doc_id", t.alias("t"))
    s = scrub_pii(F.col("t"))
    return injected.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(SSN_RE)).cast("long").alias("n_ssns"),
        F.regexp_count(F.col("t"), F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(s).alias("scrub_md5"),
        F.substring(s, 1, 40).alias("scrub_prefix"),
    )


K_ANON = 5  # minimum group size for releasable quasi-identifier groups

_K_ANON_ORACLE = f"""
    WITH g0 AS (SELECT c_nationkey,
                       c_mktsegment,
                       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                       CAST(count(*) AS BIGINT) AS n
                FROM customer GROUP BY 1, 2, 3),
    g1 AS (SELECT c_nationkey, c_mktsegment,
                  CAST(sum(n) AS BIGINT) AS n1
           FROM g0 GROUP BY 1, 2)
    SELECT g0.c_nationkey, g0.c_mktsegment, g0.bal_band, g0.n,
           CASE WHEN g0.n >= {K_ANON} THEN 'ok'
                WHEN g1.n1 >= {K_ANON} THEN 'generalized'
                ELSE 'suppressed' END AS anonymity_action
    FROM g0 JOIN g1 USING (c_nationkey, c_mktsegment)
"""


@query(
    "privacy_k_anonymity",
    _K_ANON_ORACLE,
    f"k-anonymity audit (k={K_ANON}) with a generalization ladder over "
    "the customer quasi-identifiers (nation, segment, account-balance "
    "band): groups meeting k release as-is, small groups whose "
    "coarsened (nation, segment) parent meets k are generalized up one "
    "level, the rest are suppressed — the release decision every "
    "privacy review applies before sharing governed microdata.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The structured-data counterpart of text_pii_scrub: masking hides
    direct identifiers, but quasi-identifier COMBINATIONS re-identify
    (Sweeney's k-anonymity) — the governed-sharing surface (CTAS/UNLOAD
    exports) needs this audit in front of it.

    Scale: one partial-aggregated shuffle keyed on the level-0 QI tuple;
    the generalization ladder is computed on the QI-GROUP table (orders
    of magnitude smaller than the microdata) — the level-1 rollup
    re-aggregates those group rows and joins back on their own prefix
    key, so the base table is scanned exactly once. Deeper ladders
    (nation -> region -> all) iterate the same rollup over the group
    table, never the corpus."""
    c = load(spark, sf_dir, "customer")
    g0 = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    g1 = g0.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("n1")
    )
    return g0.join(g1, ["c_nationkey", "c_mktsegment"]).select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "n",
        F.when(F.col("n") >= K_ANON, "ok")
        .when(F.col("n1") >= K_ANON, "generalized")
        .otherwise("suppressed")
        .alias("anonymity_action"),
    )


_DP_EPSILON = 1.0
_DP_SEED = "dp-seed-1:"


@query(
    "privacy_dp_event_counts",
    f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS DOUBLE) AS n
      FROM events GROUP BY event_type
    ), u AS (
      SELECT event_type, n,
             CAST(concat('0x', substr(md5(concat('{_DP_SEED}', event_type)),
                                      1, 8)) AS BIGINT)
               / 4294967296.0 AS u
      FROM g
    )
    SELECT event_type,
           CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
           round(n + (-1.0 / {_DP_EPSILON})
                     * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
                     * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS n_noisy
    FROM u
    """,
    "Differentially private count release (round-9): per-event-type "
    "DISTINCT-USER counts + Laplace(1/epsilon) noise via inverse-CDF "
    "from a seed-derived uniform. The noise is DETERMINISTIC by design "
    "here — seeded from md5(seed || group key) — which is what makes "
    "the release oracle-verifiable; a production deployment swaps the "
    "seeded uniform for a CSPRNG draw and nothing else changes. "
    "Unit-sensitivity per type (distinct users); the 5-type release "
    "vector composes to 5*epsilon under basic composition (documented, "
    "not hidden).",
)
def privacy_dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The governed-analytics release rung above k-anonymity: an
    aggregate a principal may publish externally. Distinct-user counts
    make the sensitivity claim true (one user flips any type's count
    by at most 1); raw event counts would need a per-user contribution
    bound first (the clamp the docstring of privacy_k_anonymity's
    QI-ladder already models).

    Scale: one count-distinct shuffle on a 5-value key; the noise is a
    map-side expression over 5 rows. Nothing about DP costs anything
    at scale — the expensive part everywhere is the exact aggregate
    underneath."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("double").alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_DP_SEED), F.col("event_type"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    ).alias("u")
    lap = (
        F.lit(-1.0 / _DP_EPSILON)
        * F.when(F.col("u") >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(F.col("u") - 0.5))
    )
    return (
        g.select("event_type", "n", u)
        .select(
            "event_type",
            F.lit(_DP_EPSILON).alias("epsilon"),
            F.round(F.col("n") + lap, 4).alias("n_noisy"),
        )
    )


L_DIVERSITY = 3


@query(
    "privacy_l_diversity",
    f"""
    WITH micro AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(floor(c_acctbal / 100) AS BIGINT) % 10 AS bal_sub
      FROM customer),
    per_value AS (
      SELECT c_nationkey, c_mktsegment, bal_band, bal_sub,
             CAST(count(*) AS BIGINT) AS nv
      FROM micro GROUP BY 1, 2, 3, 4),
    per_group AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(sum(nv) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_sensitive,
             CAST(max(nv) AS BIGINT) AS top_nv
      FROM per_value GROUP BY 1, 2, 3)
    SELECT c_nationkey, c_mktsegment, bal_band, n, n_sensitive,
           CAST(top_nv * 100 // n AS BIGINT) AS max_share_pct,
           CASE WHEN n_sensitive >= {L_DIVERSITY} THEN 'ok'
                ELSE 'violating' END AS l_diversity_action
    FROM per_group
    """,
    f"l-diversity audit (l={L_DIVERSITY}): k-anonymity's known gap is "
    "a k-sized group whose SENSITIVE attribute is (near-)constant — "
    "group size hides nothing when every member shares the secret "
    "(Machanavajjhala et al.). Quasi-identifiers are the k-anonymity "
    "ladder's trio (nation, segment, coarse balance band); the "
    "sensitive attribute is the PRECISE balance sub-band within the "
    "coarse band — the classic shape where the quasi-public value "
    "narrows the secret. Groups with < l distinct sub-bands flag as "
    "violating; max-share surfaces skewed-but-technically-diverse "
    "groups for the recursive variant.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companion audit to privacy_k_anonymity over the same release
    surface (CTAS/UNLOAD exports of governed microdata); the verdict
    mix at sf0.01 is genuinely split (tests pin both outcomes).

    Scale: one partial-aggregated shuffle keyed on (QI, sensitive) —
    the only corpus-scale pass — then a rollup over the per-value
    GROUP table (orders of magnitude smaller). Distinct-counting the
    sensitive attribute this way is exact without expression-level
    count(DISTINCT) fallbacks; integer floor-divisions and the
    sign-of-dividend % agree between Spark and DuckDB on the whole
    acctbal domain, so verdicts are bit-stable across engines."""
    c = load(spark, sf_dir, "customer")
    per_value = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        (F.floor(F.col("c_acctbal") / 100).cast("long") % 10).alias(
            "bal_sub"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("nv"))
    per_group = per_value.groupBy(
        "c_nationkey", "c_mktsegment", "bal_band"
    ).agg(
        F.sum("nv").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_sensitive"),
        F.max("nv").cast("long").alias("top_nv"),
    )
    return per_group.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "n",
        "n_sensitive",
        F.expr("top_nv * 100 div n").cast("long").alias("max_share_pct"),
        F.when(F.col("n_sensitive") >= L_DIVERSITY, "ok")
        .otherwise("violating")
        .alias("l_diversity_action"),
    )


T_CLOSENESS_PCT = 25  # t = 0.25, held as an integer percent


@query(
    "privacy_t_closeness",
    f"""
    WITH micro AS (
      SELECT c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(floor(c_acctbal / 100) AS BIGINT) % 10 AS bal_sub
      FROM customer),
    per_value AS (
      SELECT c_mktsegment, bal_band, bal_sub,
             CAST(count(*) AS BIGINT) AS nv
      FROM micro GROUP BY 1, 2, 3),
    gv AS (
      SELECT bal_sub, CAST(sum(nv) AS BIGINT) AS global_nv
      FROM per_value GROUP BY 1),
    tot AS (SELECT CAST(sum(nv) AS BIGINT) AS big_n FROM per_value),
    per_group AS (
      SELECT c_mktsegment, bal_band,
             CAST(sum(nv) AS BIGINT) AS n
      FROM per_value GROUP BY 1, 2),
    terms AS (
      SELECT p.c_mktsegment, p.bal_band,
             abs(p.nv * t.big_n - g.global_nv * pg.n)
               - g.global_nv * pg.n AS term
      FROM per_value p
      CROSS JOIN tot t
      JOIN gv g USING (bal_sub)
      JOIN per_group pg
        ON p.c_mktsegment = pg.c_mktsegment
       AND p.bal_band = pg.bal_band),
    s AS (
      SELECT c_mktsegment, bal_band,
             CAST(sum(term) AS BIGINT) AS present_sum
      FROM terms GROUP BY 1, 2)
    SELECT pg.c_mktsegment, pg.bal_band, pg.n,
           CAST((pg.n * t.big_n + s.present_sum) * 100
                // (2 * pg.n * t.big_n) AS BIGINT) AS tvd_pct,
           CASE WHEN (pg.n * t.big_n + s.present_sum) * 100
                     <= {T_CLOSENESS_PCT} * 2 * pg.n * t.big_n
                THEN 'ok' ELSE 'violating' END AS t_closeness_action
    FROM per_group pg
    JOIN s ON pg.c_mktsegment = s.c_mktsegment
          AND pg.bal_band = s.bal_band
    CROSS JOIN tot t
    """,
    f"t-closeness audit (t = {T_CLOSENESS_PCT}/100): l-diversity's "
    "known gap closed (Li et al.) — a group can hold l DISTINCT "
    "sensitive values yet still leak when its distribution is skewed "
    "far from the table's (90/10 where the population is 10/90). Per "
    "QI group, the total-variation distance between the group's "
    "sensitive-value distribution and the GLOBAL distribution must "
    "not exceed t. Exact integer arithmetic throughout: TVD <= t is "
    "evaluated as the cross-multiplied comparison "
    "sum_v |nv*N - Nv*n| * 100 <= 2*t_pct*n*N, with the "
    "absent-value mass folded in algebraically (sum over absent v of "
    "Nv*n = n*N - sum over present v of Nv*n), so no absent "
    "(group, value) rows are ever generated.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third rung of the release-audit ladder (k-anonymity ->
    l-diversity -> t-closeness), run on the GENERALIZED release
    (nation suppressed — t-closeness is checked after k-anonymity's
    generalization step, so its QI is the coarser (segment, band)
    pair) with the same sensitive sub-band as privacy_l_diversity.

    Scale: ONE corpus-scale shuffle (the (QI, sensitive) partial agg —
    identical to l-diversity's); everything after operates on the
    aggregated per-value table, orders of magnitude smaller. The
    global distribution (<= 10 rows) and the scalar N broadcast; the
    per-group join keys two already-aggregated tables. Products
    nv*N stay in BIGINT up to ~3e9-row releases; a larger release
    swaps the three product columns to decimal(38,0) unchanged.
    Tests pin both verdicts present and the TVD identity on a crafted
    distribution."""
    c = load(spark, sf_dir, "customer")
    per_value = (
        c.groupBy(
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
            (F.floor(F.col("c_acctbal") / 100).cast("long") % 10).alias(
                "bal_sub"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    gv = per_value.groupBy("bal_sub").agg(
        F.sum("nv").cast("long").alias("global_nv")
    )
    tot = per_value.agg(F.sum("nv").cast("long").alias("big_n"))
    per_group = per_value.groupBy("c_mktsegment", "bal_band").agg(
        F.sum("nv").cast("long").alias("n")
    )
    qi = ["c_mktsegment", "bal_band"]
    terms = (
        per_value.crossJoin(F.broadcast(tot))
        .join(F.broadcast(gv), "bal_sub")
        .join(per_group, qi)
        .select(
            *qi,
            (
                F.abs(
                    F.col("nv") * F.col("big_n")
                    - F.col("global_nv") * F.col("n")
                )
                - F.col("global_nv") * F.col("n")
            ).alias("term"),
        )
    )
    s = terms.groupBy(*qi).agg(F.sum("term").cast("long").alias("present_sum"))
    total = (
        per_group.join(s, qi)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "sum_abs", F.col("n") * F.col("big_n") + F.col("present_sum")
        )
    )
    return total.select(
        *qi,
        "n",
        F.expr("sum_abs * 100 div (2 * n * big_n)")
        .cast("long")
        .alias("tvd_pct"),
        F.when(
            F.col("sum_abs") * 100
            <= F.lit(T_CLOSENESS_PCT) * 2 * F.col("n") * F.col("big_n"),
            "ok",
        )
        .otherwise("violating")
        .alias("t_closeness_action"),
    )
