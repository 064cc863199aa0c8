"""Product quantization (PQ) for the embedding similarity stack.

At 100 TB the dominant ANN cost is not compute but *bytes touched*: a
64-dim float32 vector is 256 B, so a brute-force or even bucketed scan
drags the full vector payload through memory. PQ compresses each vector
to M=16 sub-space codes of 5 bits (packed: 10 B/vector, a 25x reduction
vs float32)
and answers queries with asymmetric distance computation (ADC): the
query builds an M x K table of sub-distances once, and every corpus
vector is scored by M table lookups — no vector arithmetic in the scan.
This is the standard IVF-PQ payload layout (Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011); combined with
the existing IVF routing (similarity.py ann_ivf_cosine) it is the
classic IVFADC pipeline.

Codebooks: production PQ trains per-sub-space centroids with k-means —
that path exists as the iterative kmeans_embeddings operator
(iterative.py, rows-only check by nature). To make the *entire*
encode -> ADC -> top-k pipeline hash-verifiable against DuckDB, the
registered queries use ANCHOR codebooks: the K=32 codewords of every
sub-space are the sub-vectors of the 32 corpus vectors with the
lexicographically smallest md5(vec_id) — content-addressed, engine
independent, and SQL-replayable. This mirrors the
dedup_minhash_lsh_md5 exemplar pattern (dedup.py:381): same mechanics
as the production path, hash-derived parameters so the oracle can
replay every step.

Determinism across engines: all distances are computed on NORMALIZED
components rounded to 6 decimals in both engines (L2 on unit vectors is
monotone with cosine, so ADC ranking targets the same neighbor order as
the rest of the similarity family). Rounding first means both engines
do identical-input double arithmetic, and every reduction is a
sequential left fold on both sides (F.aggregate here, an explicit
left-associated term chain in the oracle) so summation order matches.

Implementation note — expression size: a first cut spelled the
M x K x DSUB distance lattice out as ~1000 scalar expressions; after
projection collapsing that handed Catalyst a multi-million-node tree
(minutes of planning before a single task ran). The surviving
expression path (pq_encode, kept for tests and as the semantics
reference) keeps the codebook as ONE nested array literal per
sub-space and computes the K distances with
transform/zip_with/aggregate — a few dozen expression nodes total.
The REGISTERED queries go further: the corpus encode is an
Arrow-batched numpy kernel (pq_encode_arrow, cross-validated against
the expression path) and the <=10-row query-side ADC tables are
computed driver-side (_query_tables) — both because per-row lattice
work belongs in array values / vectorized kernels, never in the
expression tree.

Scale notes (local[32] here, 1000 executors in design):
- the codebook is K*M*DSUB = 1024 doubles — a broadcast literal;
- encode is one map-only pass over the corpus;
- ADC scores by code lookup against a broadcast Q x (M*K) table: map-only
  + per-query window top-k; no shuffle of scores, no vector reads.
"""

from __future__ import annotations

from functools import reduce
from weakref import WeakKeyDictionary

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load
from .registry import query
from .similarity import _dot, label_centroids

PQ_M = 16  # sub-spaces
PQ_DSUB = 4  # dims per sub-space (16 x 4 = the 64-dim embedding)
PQ_K = 32  # codewords per sub-space -> 5-bit codes
PQ_DIM = PQ_M * PQ_DSUB
PQ_SHORTLIST = 50  # ADC shortlist size C for the exact re-rank stage
_COMP_ROUND = 6  # normalized-component rounding shared with the oracle
_NQ_ADC = 5  # ADC demo queries (vec_id < 5)
_NQ_RECALL = 10  # recall instrument queries (vec_id < 10)

# Parameter choice (measured on this corpus's hard mid-similarity
# regime, sf0.01, 10 queries, DuckDB replay of the full pipeline):
#   M=8  dsub=8 K=16, rerank C=100 -> mean recall@10 0.68
#   M=8  dsub=8 K=32, rerank C=100 -> 0.75
#   M=16 dsub=4 K=16, rerank C=100 -> 0.82
#   M=16 dsub=4 K=32, rerank C=50  -> 0.85   <- registered config
#   M=16 dsub=4 K=32, rerank C=100 -> 0.93
# M=16 x 5-bit codes = 10 B/vector packed: 25x smaller than float32
# vectors, and the ADC scan reads ONLY codes; exact vectors are fetched
# for the C-candidate shortlist alone.


def _sq_l2(a, b):
    """Squared L2 between two equal-length arrays as a sequential left
    fold (matches the oracle's explicit left-associated term chain)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def normalized_components(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach ``ne``: the unit-normalized embedding with every component
    rounded to 6 decimals. Rounding here (not at comparison time) makes
    all downstream double arithmetic identical-input in both engines."""
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, t: acc + t
        )
    )
    return df.withColumn(
        "ne", F.transform(e, lambda x: F.round(x / nrm, _COMP_ROUND))
    )


def _normalize_round_np(mat):
    """Shared normalize-and-round kernel: np.cumsum norm fold (strictly
    sequential, same order as the oracle's left-associated chain) and
    half-away-from-zero rounding on the scaled double — the rule the
    SQL engines apply."""
    scale = 10.0**_COMP_ROUND
    nrm = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
    scaled = mat / nrm[:, None] * scale
    return np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / scale


# Five registered queries share the codebook and the encoded corpus; a
# driver/bench run builds each ONCE per (session, sf_dir) instead of
# re-sorting + re-encoding + re-caching per query (the WeakKeyDictionary
# pattern governed.py uses for its per-session Engine).
_PQ_MEMO: WeakKeyDictionary = WeakKeyDictionary()


def _session_memo(spark: SparkSession, key, build):
    per_session = _PQ_MEMO.setdefault(spark, {})
    if key not in per_session:
        per_session[key] = build()
    return per_session[key]


def pq_anchor_codebook(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """Per-sub-space codebooks ``cb[m][k][d]``: codeword k of sub-space
    m is the m-th sub-vector of the k-th anchor row, anchors ordered by
    (md5(vec_id), vec_id). O(K) driver collect — same budget class as
    the k-means centroid reduction (iterative.py) — memoized per
    (session, sf_dir). The hash ranking runs over RAW vectors
    (TakeOrderedAndProject on a string hash — cheap); normalization
    touches only the K collected anchors, via the same numpy kernel the
    Arrow encode uses."""
    return _session_memo(
        spark, ("cb", sf_dir), lambda: _build_anchor_codebook(spark, sf_dir)
    )


def _build_anchor_codebook(spark: SparkSession, sf_dir: str):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "embedding", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(PQ_K)
        .collect()
    )
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    anchors = _normalize_round_np(mat)
    return [
        [anchors[k][m * PQ_DSUB : (m + 1) * PQ_DSUB].tolist() for k in range(PQ_K)]
        for m in range(PQ_M)
    ]


def _subspace_dists(ne_col, cb_m: list[list[float]], m: int):
    """Array of K squared L2 distances between sub-space m of ``ne_col``
    and each codeword — the codebook rides along as ONE array literal."""
    sub = F.slice(ne_col, m * PQ_DSUB + 1, PQ_DSUB)
    cb_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in word]) for word in cb_m]
    )
    return F.transform(cb_lit, lambda word: _sq_l2(word, sub))


def pq_encode(df: DataFrame, codebook: list[list[list[float]]]) -> DataFrame:
    """Attach ``codes``: array of M codes, code m = argmin_k of the
    sub-space distance (first minimum wins — array_position returns the
    first occurrence, matching the oracle's (dist, k) row_number).
    Map-only; the packed codes are the only thing ADC ever reads."""
    code_cols = []
    for m in range(PQ_M):
        dists = _subspace_dists(F.col("ne"), codebook[m], m)
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return df.withColumn("codes", F.array(*code_cols))


def pq_encode_arrow(
    df: DataFrame, codebook: list[list[list[float]]], vec_col: str = "embedding"
) -> DataFrame:
    """Corpus-side encode as an Arrow-batched numpy kernel (the
    banded_lsh_keys precedent): normalize, round, and argmin against
    every codeword in one (batch x K x DSUB) broadcastable subtract —
    >10x the interpreted higher-order-function path on the corpus scan
    (5.7 s -> sub-second for the PQ bench query at sf0.1).

    Determinism contract with the oracle (and with pq_encode):
    - the norm fold is np.cumsum (strictly sequential, same order as
      the oracle's explicit left-associated chain);
    - rounding is half-away-from-zero on the scaled double
      (floor(|x|*1e6 + 0.5)), the same rule the SQL engines apply;
    - per-sub-space distances sum their DSUB terms in written
      left-to-right order;
    - np.argmin returns the FIRST minimum, matching the oracle's
      (dist, k) row_number tie-break.
    tests/test_quantization.py cross-validates this kernel against the
    expression-based pq_encode on the full corpus."""
    from pyspark.sql.functions import pandas_udf

    cb_arr = np.asarray(codebook, dtype=np.float64)  # (M, K, DSUB)

    @pandas_udf("array<int>")
    def codes_udf(e: pd.Series) -> pd.Series:
        if len(e) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(e.to_numpy()).astype(np.float64)  # (n, DIM)
        ne = _normalize_round_np(mat)
        out = np.empty((len(e), PQ_M), dtype=np.int32)
        for m in range(PQ_M):
            sub = ne[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]  # (n, DSUB)
            diff = sub[:, None, :] - cb_arr[m][None, :, :]  # (n, K, DSUB)
            sq = diff * diff
            d2 = sq[:, :, 0]
            for d in range(1, PQ_DSUB):
                d2 = d2 + sq[:, :, d]
            out[:, m] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    return df.withColumn("codes", codes_udf(F.col(vec_col)))


def _corpus_codes(spark: SparkSession, sf_dir: str, codebook) -> DataFrame:
    """The encoded corpus (vec_id, label, codes), cached.

    The cache() is load-bearing, not an optimization nicety: downstream
    operators re-drive the encode per emitted row (explode over the
    expression path: measured 110 s vs 0.3 s over materialized codes at
    sf0.01) or consume it twice (the recall instrument). Materializing
    once (cache here; in a real pipeline the persisted PQ index table)
    is also the honest production shape — you encode 100 TB once and
    query the stored codes (memoized per (session, sf_dir) so the five
    registered PQ queries share ONE cached copy). Same hazard class as
    dedup.py's dual-consumed signature table."""

    def build():
        v = load(spark, sf_dir, "embeddings")
        return (
            pq_encode_arrow(v, codebook).select("vec_id", "label", "codes").cache()
        )

    return _session_memo(spark, ("codes", sf_dir), build)


def _query_tables(
    spark: SparkSession, base: DataFrame, nq: int, codebook
) -> DataFrame:
    """(qid, dt) — the flat M*K ADC sub-distance table per query vector
    (dt[m*K + k], 1-based at lookup time), computed driver-side in
    numpy over the O(nq) collected query vectors and shipped as a tiny
    literal DataFrame.

    Why not an expression: a per-sub-space codebook literal costs
    ~2000 expression nodes of analyzer/py4j time PER QUERY BUILD (the
    banded_lsh_keys lesson) for arithmetic over <= 10 rows. The numpy
    kernel shares _normalize_round_np and the explicit left-to-right
    DSUB-term sums, so the oracle replay still matches."""
    rows = (
        base.filter(F.col("vec_id") < nq).select("vec_id", "embedding").collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    qe = _normalize_round_np(mat)
    cb_arr = np.asarray(codebook, dtype=np.float64)  # (M, K, DSUB)
    out = []
    for i, r in enumerate(rows):
        dt = np.empty(PQ_M * PQ_K, dtype=np.float64)
        for m in range(PQ_M):
            diff = qe[i, m * PQ_DSUB : (m + 1) * PQ_DSUB] - cb_arr[m]  # (K, DSUB)
            sq = diff * diff
            d2 = sq[:, 0]
            for d in range(1, PQ_DSUB):
                d2 = d2 + sq[:, d]
            dt[m * PQ_K : (m + 1) * PQ_K] = d2
        out.append((int(r["vec_id"]), [float(x) for x in dt]))
    return spark.createDataFrame(out, "qid long, dt array<double>")


def _adc_dist():
    """Approximate squared distance: M table lookups on the codes."""
    return reduce(
        lambda a, b: a + b,
        [
            F.element_at(
                F.col("dt"),
                (F.lit(m * PQ_K + 1) + F.element_at(F.col("codes"), m + 1)).cast(
                    "int"
                ),
            )
            for m in range(PQ_M)
        ],
    )


# ---------------------------------------------------------------- oracles

def _ne_sql() -> str:
    """CTEs v/w/n: embeddings as doubles, explicit-chain norm, rounded
    normalized components — the literal mirror of
    normalized_components()."""
    sq = " + ".join(f"e[{i + 1}]*e[{i + 1}]" for i in range(PQ_DIM))
    comps = ", ".join(f"round(e[{i + 1}]/nrm, {_COMP_ROUND})" for i in range(PQ_DIM))
    return f"""v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    w AS (SELECT vec_id, label, e, sqrt({sq}) AS nrm FROM v),
    n AS (SELECT vec_id, label, [{comps}] AS ne FROM w)"""


def _anchor_sql() -> str:
    return f"""a AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS k, ne
         FROM (SELECT vec_id, ne, md5(CAST(vec_id AS VARCHAR)) AS h
               FROM n ORDER BY h, vec_id LIMIT {PQ_K}))"""


def _subdist_sql(left: str, right: str, m: str) -> str:
    """Explicit left-associated 8-term chain; ``m`` is 0-based SQL."""
    return " + ".join(
        f"({left}[({m})*{PQ_DSUB} + {d + 1}] - {right}[({m})*{PQ_DSUB} + {d + 1}])"
        f" * ({left}[({m})*{PQ_DSUB} + {d + 1}] - {right}[({m})*{PQ_DSUB} + {d + 1}])"
        for d in range(PQ_DSUB)
    )


def _codes_sql() -> str:
    """CTE codes(vec_id, label, m, code): argmin codeword per sub-space,
    ties to the lowest k (row_number over (dist, k))."""
    return f"""g AS (SELECT unnest(range({PQ_M})) AS m),
    cd AS (SELECT n.vec_id, n.label, g.m, a.k,
                  {_subdist_sql('n.ne', 'a.ne', 'g.m')} AS dist
           FROM n, a, g),
    codes AS (SELECT vec_id, label, m, k AS code FROM (
                SELECT vec_id, label, m, k, row_number() OVER (
                         PARTITION BY vec_id, m ORDER BY dist, k) AS rn
                FROM cd)
              WHERE rn = 1)"""


_PQ_HISTOGRAM_ORACLE = f"""
    WITH {_ne_sql()},
    {_anchor_sql()},
    {_codes_sql()}
    SELECT CAST(m AS INT) AS m, CAST(code AS INT) AS code,
           CAST(count(*) AS BIGINT) AS cnt
    FROM codes GROUP BY m, code
    ORDER BY m, code
"""


@query(
    "pq_code_histogram",
    _PQ_HISTOGRAM_ORACLE,
    "Codeword-usage histogram per PQ sub-space: hash-equal iff every "
    "single code assignment (N x M argmins over the md5-anchored "
    "codebook) matches the DuckDB replay — the encode step's "
    "correctness gate, and the quantization-health diagnostic (a dead "
    "or overloaded codeword shows up as a missing/huge bucket).",
)
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: encode is map-only (codebook is a broadcast literal);
    the histogram is a tiny M x K aggregate with map-side partial
    combine. Exploding over the MATERIALIZED codes (see _corpus_codes)
    matters here: Generate over the raw encode projection re-drives it
    per emitted element."""
    cb = pq_anchor_codebook(spark, sf_dir)
    c = _corpus_codes(spark, sf_dir, cb)
    return (
        c.select(F.posexplode("codes").alias("m", "code"))
        .groupBy(
            F.col("m").cast("int").alias("m"), F.col("code").cast("int").alias("code")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("m", "code")
    )


def _dt_sql(nq: int, name: str) -> str:
    """CTE {name}(qid, m, k, d2): per-query ADC sub-distance tables."""
    return f"""{name} AS (SELECT q.qid, g.m, a.k,
                 {_subdist_sql('q.qe', 'a.ne', 'g.m')} AS d2
          FROM (SELECT vec_id AS qid, ne AS qe FROM n WHERE vec_id < {nq}) q,
               a, g)"""


_PQ_ADC_ORACLE = f"""
    WITH {_ne_sql()},
    {_anchor_sql()},
    {_codes_sql()},
    {_dt_sql(_NQ_ADC, 'dt')},
    ad AS (SELECT dt.qid, c.vec_id, c.label, round(sum(dt.d2), 4) AS adist
           FROM codes c JOIN dt ON dt.m = c.m AND dt.k = c.code
           GROUP BY dt.qid, c.vec_id, c.label)
    SELECT qid, vec_id, label, adist, CAST(rn AS BIGINT) AS rn FROM (
      SELECT qid, vec_id, label, adist, row_number() OVER (
               PARTITION BY qid ORDER BY adist, vec_id) AS rn
      FROM ad WHERE vec_id <> qid)
    WHERE rn <= 10
"""


@query(
    "pq_adc_topk",
    _PQ_ADC_ORACLE,
    "Asymmetric-distance top-10 per query over PQ codes: the query "
    "builds an M x K sub-distance table once; every corpus vector is "
    "scored by M table lookups on its 5-bit codes — the IVFADC scan "
    "shape. Oracle replays codebook, encode, tables, and ranking.",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the scored scan touches ONLY the code column (10 B/vector
    packed; 25x less than raw float32 vectors) plus a broadcast
    5 x (M*K) table — memory-bandwidth-bound ANN at 100 TB becomes
    lookup-bound. Scoring is map-only; ranking is a per-query window
    top-k. Flat-scan ADC here; compose with ann_ivf_cosine's routing
    for the full IVFADC (scan only probed cells)."""
    cb = pq_anchor_codebook(spark, sf_dir)
    codes = _corpus_codes(spark, sf_dir, cb)
    qtab = _query_tables(spark, load(spark, sf_dir, "embeddings"), _NQ_ADC, cb)

    scored = (
        codes.crossJoin(F.broadcast(qtab))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "label", F.round(_adc_dist(), 4).alias("adist"))
    )
    win = W.partitionBy("qid").orderBy("adist", "vec_id")
    return scored.select(
        "qid",
        "vec_id",
        "label",
        "adist",
        F.row_number().over(win).cast("long").alias("rn"),
    ).filter(F.col("rn") <= 10)


def _rerank_cosine(shortlist: DataFrame, base: DataFrame, nq: int) -> DataFrame:
    """Exact-cosine re-rank of an ADC shortlist (qid, vec_id): fetch raw
    vectors for the C candidates only, score against the broadcast query
    vectors, keep top-10 per query. Columns: qid, vec_id, label,
    cos_sim, rn."""
    v = base.withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
    qv = v.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    cand = shortlist.join(v, "vec_id").join(F.broadcast(qv), "qid")
    cos = F.round(
        _dot(F.col("embedding"), F.col("qe")) / (F.col("norm") * F.col("qnorm")), 4
    )
    win = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        cand.select("qid", "vec_id", "label", cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(win).cast("long"))
        .filter(F.col("rn") <= 10)
    )


def _shortlist_sql(ad: str, c: int) -> str:
    return f"""shortlist AS (SELECT qid, vec_id FROM (
             SELECT qid, vec_id, row_number() OVER (
                      PARTITION BY qid ORDER BY adist, vec_id) AS rn
             FROM {ad} WHERE vec_id <> qid)
           WHERE rn <= {c})"""


_PQ_RERANK_ORACLE = f"""
    WITH {_ne_sql()},
    {_anchor_sql()},
    {_codes_sql()},
    {_dt_sql(_NQ_ADC, 'dt')},
    ad AS (SELECT dt.qid, c.vec_id, round(sum(dt.d2), 4) AS adist
           FROM codes c JOIN dt ON dt.m = c.m AND dt.k = c.code
           GROUP BY dt.qid, c.vec_id),
    {_shortlist_sql('ad', PQ_SHORTLIST)}
    SELECT qid, vec_id, label, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT s.qid, s.vec_id, cv.label,
             round(list_cosine_similarity(cv.e, qv.e), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY s.qid
               ORDER BY round(list_cosine_similarity(cv.e, qv.e), 4)
                          DESC, s.vec_id) AS rn
      FROM shortlist s JOIN v cv ON s.vec_id = cv.vec_id
                       JOIN v qv ON s.qid = qv.vec_id)
    WHERE rn <= 10
"""


@query(
    "pq_adc_rerank_topk",
    _PQ_RERANK_ORACLE,
    "The production PQ read path: ADC over 5-bit codes shortlists C=50 "
    "candidates per query, then exact cosine re-ranks the shortlist to "
    "a top-10 — compressed scan for the corpus pass, full-precision "
    "vectors touched for 50 rows per query only. Measured recall@10 "
    "0.85 on the mid-sim regime (pq_recall_at_k).",
)
def pq_adc_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: stage 1 reads 10 B/vector codes (25x less IO than raw
    float32) map-only; stage 2 fetches exact vectors for Q x C rows via
    a join on vec_id — at 100 TB that is the difference between
    scanning 100 TB of floats and 4 TB of codes plus a point-lookup
    join. Compose with IVF cell routing for IVFADC."""
    cb = pq_anchor_codebook(spark, sf_dir)
    codes = _corpus_codes(spark, sf_dir, cb)
    base = load(spark, sf_dir, "embeddings")
    qtab = _query_tables(spark, base, _NQ_ADC, cb)
    win = W.partitionBy("qid").orderBy("adist", "vec_id")
    shortlist = (
        codes.crossJoin(F.broadcast(qtab))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(_adc_dist(), 4).alias("adist"))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    return _rerank_cosine(shortlist, base, _NQ_ADC)


_PQ_RECALL_ORACLE = f"""
    WITH {_ne_sql()},
    {_anchor_sql()},
    {_codes_sql()},
    {_dt_sql(_NQ_RECALL, 'dtr')},
    ad AS (SELECT dtr.qid, c.vec_id, round(sum(dtr.d2), 4) AS adist
           FROM codes c JOIN dtr ON dtr.m = c.m AND dtr.k = c.code
           GROUP BY dtr.qid, c.vec_id),
    pq AS (SELECT qid, vec_id FROM (
             SELECT qid, vec_id, row_number() OVER (
                      PARTITION BY qid ORDER BY adist, vec_id) AS rn
             FROM ad WHERE vec_id <> qid)
           WHERE rn <= 10),
    {_shortlist_sql('ad', PQ_SHORTLIST)},
    rr AS (SELECT qid, vec_id FROM (
             SELECT s.qid, s.vec_id, row_number() OVER (
                      PARTITION BY s.qid
                      ORDER BY round(list_cosine_similarity(cv.e, qv.e), 4)
                                 DESC, s.vec_id) AS rn
             FROM shortlist s JOIN v cv ON s.vec_id = cv.vec_id
                              JOIN v qv ON s.qid = qv.vec_id)
           WHERE rn <= 10),
    gt AS (SELECT qid, vec_id FROM (
             SELECT qv.vec_id AS qid, cv.vec_id, row_number() OVER (
                      PARTITION BY qv.vec_id
                      ORDER BY round(list_cosine_similarity(cv.e, qv.e), 4)
                                 DESC, cv.vec_id) AS rn
             FROM v cv JOIN v qv
               ON qv.vec_id < {_NQ_RECALL} AND cv.vec_id <> qv.vec_id)
           WHERE rn <= 10)
    SELECT g.qid,
           round(CAST(count(p.vec_id) AS DOUBLE) / 10, 4) AS recall_adc,
           round(CAST(count(r.vec_id) AS DOUBLE) / 10, 4) AS recall_rerank
    FROM gt g
    LEFT JOIN pq p ON g.qid = p.qid AND g.vec_id = p.vec_id
    LEFT JOIN rr r ON g.qid = r.qid AND g.vec_id = r.vec_id
    GROUP BY g.qid
"""


def _recall_instrument(
    spark: SparkSession, sf_dir: str, cb, codes: DataFrame
) -> DataFrame:
    """Shared recall@10 measurement for any PQ codebook: ADC ranking +
    C-shortlist exact re-rank, both scored against brute-force cosine
    ground truth. Codebook-agnostic — pq_recall_at_k (anchor) and
    pq_trained_recall (k-means) differ only in what they pass here."""
    K = 10
    base = load(spark, sf_dir, "embeddings")
    qtab = _query_tables(spark, base, _NQ_RECALL, cb)

    win_pq = W.partitionBy("qid").orderBy("adist", "vec_id")
    adc_ranked = (
        codes.crossJoin(F.broadcast(qtab))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(_adc_dist(), 4).alias("adist"))
        .withColumn("rn", F.row_number().over(win_pq))
    )
    pq_top = adc_ranked.filter(F.col("rn") <= K).select("qid", "vec_id")
    shortlist = adc_ranked.filter(F.col("rn") <= PQ_SHORTLIST).select(
        "qid", "vec_id"
    )
    rr_top = _rerank_cosine(shortlist, base, _NQ_RECALL).select("qid", "vec_id")

    # Brute-force cosine ground truth (knn_cosine_batch shape).
    v = base.withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
    qv = v.filter(F.col("vec_id") < _NQ_RECALL).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("qe")) / (F.col("norm") * F.col("qnorm")), 4
    )
    win_gt = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    gt = (
        v.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(win_gt))
        .filter(F.col("rn") <= K)
        .select("qid", "vec_id")
    )

    adc_hits = gt.join(pq_top, ["qid", "vec_id"], "left_semi")
    rr_hits = gt.join(rr_top, ["qid", "vec_id"], "left_semi")
    return (
        gt.groupBy("qid")
        .agg(F.count("*").alias("n_gt"))
        .join(
            adc_hits.groupBy("qid").agg(F.count("*").alias("n_adc")), "qid", "left"
        )
        .join(rr_hits.groupBy("qid").agg(F.count("*").alias("n_rr")), "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("n_adc"), F.lit(0)).cast("double") / K, 4
            ).alias("recall_adc"),
            F.round(
                F.coalesce(F.col("n_rr"), F.lit(0)).cast("double") / K, 4
            ).alias("recall_rerank"),
        )
    )


@query(
    "pq_recall_at_k",
    _PQ_RECALL_ORACLE,
    "PQ quality instrumentation: recall@10 vs brute-force cosine ground "
    "truth for BOTH read paths — raw ADC ranking over codes, and the "
    "registered C=50 shortlist + exact re-rank (mean 0.85 mid-sim). "
    "The whole measurement is replayed by the oracle.",
)
def pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement-as-operator pattern (ann_recall_at_k): at 100 TB
    you choose M/K/C (compression vs fidelity vs re-rank IO) by
    measured recall — the swept table lives next to the constants
    above. The anchor codebook is the verifiable floor; trained
    k-means codebooks (pq_trained_codebook) only improve it — gated in
    tests/test_quantization.py. Ground truth broadcasts the queries
    and scores in one corpus pass; the ADC side is the code-lookup
    scan; recall is a tiny final agg."""
    cb = pq_anchor_codebook(spark, sf_dir)
    codes = _corpus_codes(spark, sf_dir, cb)
    return _recall_instrument(spark, sf_dir, cb, codes)


# ----------------------------------------------------- scalar quantization

_SQ_LEVELS = 255  # 8-bit codes: 0..255 per dimension


def _sq_stats(spark: SparkSession, sf_dir: str) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) of the rounded normalized components —
    the scalar-quantizer codebook. A 64-row aggregate collected to the
    driver (same O(dim) budget class as the PQ codebook), memoized per
    (session, sf_dir)."""

    def build():
        rows = (
            normalized_components(load(spark, sf_dir, "embeddings"))
            .select(F.posexplode("ne").alias("d", "x"))
            .groupBy("d")
            .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
            .collect()
        )
        by_d = {r["d"]: (r["mn"], r["mx"]) for r in rows}
        mn = [float(by_d[d][0]) for d in range(PQ_DIM)]
        mx = [float(by_d[d][1]) for d in range(PQ_DIM)]
        return mn, mx

    return _session_memo(spark, ("sq", sf_dir), build)


def sq_recon_expr(ne_col, mn: list[float], mx: list[float]):
    """Expression-path SQ round trip: quantize ``ne_col`` to 8-bit codes
    against the (mn, mx) codebook and reconstruct — the semantics
    reference the Arrow kernel is cross-validated against
    (tests/test_quantization.py), mirroring the pq_encode /
    pq_encode_arrow pairing."""
    mn_lit = F.array(*[F.lit(v) for v in mn])
    mx_lit = F.array(*[F.lit(v) for v in mx])

    def comp(x, i):
        lo = F.element_at(mn_lit, i + 1)
        hi = F.element_at(mx_lit, i + 1)
        code = F.floor((x - lo) / (hi - lo) * _SQ_LEVELS + F.lit(0.5))
        return F.when(hi == lo, lo).otherwise(
            lo + code * (hi - lo) / F.lit(float(_SQ_LEVELS))
        )

    return F.transform(ne_col, comp)


def sq_scores_arrow(
    df: DataFrame, mn: list[float], mx: list[float], qmat, qids
) -> DataFrame:
    """(vec_id, qid, adist): asymmetric reconstructed-L2 of every corpus
    vector against every query, as ONE Arrow-batched numpy kernel
    (normalize -> round -> quantize -> reconstruct -> (n x Q x DIM)
    broadcast subtract) — the pq_encode_arrow lesson applied to SQ
    (measured 1.85 s -> sub-second for the registered query at sf0.1).

    Determinism contract with sq_recon_expr and the oracle:
    - norm fold and component rounding via the shared
      _normalize_round_np kernel;
    - reconstruction arithmetic in the written order
      mn + floor((x-mn)/(mx-mn)*255 + 0.5) * (mx-mn)/255;
    - adist rounded half-AWAY-from-zero (floor(d*1e4 + 0.5) — np.round
      would bank-round) to 4 decimals, the SQL engines' rule. The
      squared-term sum is a numpy axis-sum; like the oracle's unordered
      SQL sum it differs from a left fold only below the 4-decimal
      round (the _PQ_ADC precedent)."""
    mn_a = np.asarray(mn, dtype=np.float64)
    mx_a = np.asarray(mx, dtype=np.float64)
    span = mx_a - mn_a
    safe = np.where(span == 0, 1.0, span)
    qm = np.asarray(qmat, dtype=np.float64)
    qid_arr = np.asarray(qids, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            ne = _normalize_round_np(mat)
            code = np.floor((ne - mn_a) / safe * _SQ_LEVELS + 0.5)
            recon = np.where(
                span == 0, mn_a, mn_a + code * span / float(_SQ_LEVELS)
            )
            d = ((qm[None, :, :] - recon[:, None, :]) ** 2).sum(axis=2)
            d = np.floor(d * 1e4 + 0.5) / 1e4
            n, nq = d.shape
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy().astype(np.int64), nq
                    ),
                    "qid": np.tile(qid_arr, n),
                    "adist": d.reshape(-1),
                }
            )

    return df.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, qid long, adist double"
    )


_SQ_RERANK_ORACLE = f"""
    WITH {_ne_sql()},
    g AS (SELECT unnest(range({PQ_DIM})) AS d),
    comp AS (SELECT vec_id, g.d, ne[g.d + 1] AS x FROM n, g),
    mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM comp GROUP BY d),
    recon AS (SELECT c.vec_id, c.d,
                     CASE WHEN mm.mx = mm.mn THEN mm.mn
                          ELSE mm.mn
                               + floor((c.x - mm.mn) / (mm.mx - mm.mn)
                                       * {_SQ_LEVELS} + 0.5)
                                 * (mm.mx - mm.mn) / {_SQ_LEVELS}.0 END AS r
              FROM comp c JOIN mm USING (d)),
    qc AS (SELECT vec_id AS qid, d, x AS qx FROM comp
           WHERE vec_id < {_NQ_ADC}),
    ad AS (SELECT qc.qid, r.vec_id,
                  round(sum((qc.qx - r.r) * (qc.qx - r.r)), 4) AS adist
           FROM recon r JOIN qc ON r.d = qc.d AND r.vec_id <> qc.qid
           GROUP BY 1, 2),
    {_shortlist_sql('ad', PQ_SHORTLIST)}
    SELECT qid, vec_id, label, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT s.qid, s.vec_id, cv.label,
             round(list_cosine_similarity(cv.e, qv.e), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY s.qid
               ORDER BY round(list_cosine_similarity(cv.e, qv.e), 4)
                          DESC, s.vec_id) AS rn
      FROM shortlist s JOIN v cv ON s.vec_id = cv.vec_id
                       JOIN v qv ON s.qid = qv.vec_id)
    WHERE rn <= 10
"""


@query(
    "ann_sq_rerank_topk",
    _SQ_RERANK_ORACLE,
    "Scalar (int8) quantization ANN: per-dimension min/max codebook, "
    "8-bit codes per component (64 B/vector — 4x smaller than float32, "
    "near-exact fidelity vs PQ's 25x lossy codes), asymmetric "
    "reconstructed-L2 shortlist of C=50, exact cosine re-rank to "
    "top-10. The oracle replays stats, quantization, reconstruction, "
    "and both rankings; recall vs exact ground truth asserted in "
    "tests/test_quantization.py.",
)
def ann_sq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The middle rung of the compressed-ANN ladder: SQ trades 4x IO
    reduction for near-exact ranking (PQ: 25x but lossy; raw floats:
    exact but full IO) — the right default when the corpus fits the
    budget at 4x and recall must stay ~1.0.

    Scale: the codebook is 2 x 64 doubles (driver-collected tiny agg);
    scoring is one Arrow-batched map pass over the corpus against <= 5
    query vectors held in the kernel (sq_scores_arrow; the
    expression-path sq_recon_expr is the cross-validated semantics
    reference); ranking is a per-query window top-k; exact vectors are
    fetched for the Q x C shortlist rows only (the pq_adc_rerank_topk
    read shape). On disk the codes column is what the scan reads —
    64 B/vector instead of 256."""
    mn, mx = _sq_stats(spark, sf_dir)
    base = load(spark, sf_dir, "embeddings")
    # Query-side exact ne, computed driver-side over the O(nq) collected
    # vectors with the shared numpy kernel (the _query_tables rationale).
    qrows = (
        base.filter(F.col("vec_id") < _NQ_ADC).select("vec_id", "embedding").collect()
    )
    qrows.sort(key=lambda r: r["vec_id"])
    qmat = _normalize_round_np(
        np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    )
    qids = [int(r["vec_id"]) for r in qrows]
    win = W.partitionBy("qid").orderBy("adist", "vec_id")
    shortlist = (
        sq_scores_arrow(base, mn, mx, qmat, qids)
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    return _rerank_cosine(shortlist, base, _NQ_ADC)


_IVFADC_NPROBE = 2


_IVFADC_ORACLE = f"""
    WITH {_ne_sql()},
    {_anchor_sql()},
    {_codes_sql()},
    el AS (SELECT vec_id, label,
                  unnest(range(0, {PQ_DIM})) AS d,
                  unnest(embedding::DOUBLE[]) AS x
           FROM embeddings),
    cent AS (SELECT label, d, avg(x) AS m FROM el GROUP BY 1, 2),
    cn AS (SELECT label, sqrt(sum(m * m)) AS cnorm FROM cent GROUP BY 1),
    qel AS (SELECT vec_id AS qid, d, x FROM el WHERE vec_id < {_NQ_ADC}),
    qnm AS (SELECT qid, sqrt(sum(x * x)) AS qnorm FROM qel GROUP BY qid),
    csim AS (SELECT qel.qid, c.label,
                    sum(c.m * qel.x)
                      / (any_value(cn.cnorm) * any_value(qnm.qnorm)) AS s
             FROM cent c
             JOIN qel ON c.d = qel.d
             JOIN cn ON cn.label = c.label
             JOIN qnm ON qnm.qid = qel.qid
             GROUP BY qel.qid, c.label),
    probed AS (SELECT qid, label FROM (
                 SELECT qid, label, row_number() OVER (
                          PARTITION BY qid ORDER BY s DESC, label) AS rn
                 FROM csim)
               WHERE rn <= {_IVFADC_NPROBE}),
    {_dt_sql(_NQ_ADC, 'dt')},
    ad AS (SELECT dt.qid, c.vec_id, round(sum(dt.d2), 4) AS adist
           FROM codes c
           JOIN probed p ON p.label = c.label
           JOIN dt ON dt.qid = p.qid AND dt.m = c.m AND dt.k = c.code
           GROUP BY dt.qid, c.vec_id),
    {_shortlist_sql('ad', PQ_SHORTLIST)}
    SELECT qid, vec_id, label, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT s.qid, s.vec_id, cv.label,
             round(list_cosine_similarity(cv.e, qv.e), 4) AS cos_sim,
             row_number() OVER (
               PARTITION BY s.qid
               ORDER BY round(list_cosine_similarity(cv.e, qv.e), 4)
                          DESC, s.vec_id) AS rn
      FROM shortlist s JOIN v cv ON s.vec_id = cv.vec_id
                       JOIN v qv ON s.qid = qv.vec_id)
    WHERE rn <= 10
"""


@query(
    "ann_ivfadc_topk",
    _IVFADC_ORACLE,
    "The classic IVFADC pipeline (Jegou et al. 2011) end to end: IVF "
    "cell routing (probe the nprobe=2 nearest per-label centroids) x "
    "PQ codes (ADC-score ONLY probed-cell members) x C=50 exact "
    "re-rank. The oracle replays centroids, routing, codebook, encode, "
    "tables, and both rankings.",
)
def ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 100 TB ANN cost model in one query: the centroid table
    is tiny and broadcasts; cell assignment at rest is a partition
    column, so probing = partition pruning (scan nprobe/n_cells of the
    codes, NOT the whole table); the pruned scan reads 10 B/vector
    codes; exact vectors are fetched for Q x C shortlist rows only.
    Recall factors as (routing recall) x (PQ fidelity): per the
    ann_ivf_nprobe_sweep scoping, cell routing at small nprobe suits
    cluster-aligned corpora; for this corpus's mid-sim regime the
    flat-scan pq_adc_rerank_topk or multi-probe LSH paths apply."""
    cb = pq_anchor_codebook(spark, sf_dir)
    codes = _corpus_codes(spark, sf_dir, cb)
    base = load(spark, sf_dir, "embeddings")
    qtab = _query_tables(spark, base, _NQ_ADC, cb)

    # Coarse quantizer shared with the IVF family (similarity.py)
    v = base.withColumn("norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
    cent = label_centroids(v)
    qv = v.filter(F.col("vec_id") < _NQ_ADC).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    win_cell = W.partitionBy("qid").orderBy(F.desc("s"), "label")
    probed = (
        cent.crossJoin(F.broadcast(qv))
        .select(
            "qid",
            "label",
            (
                _dot(F.col("centroid"), F.col("qe"))
                / (F.col("cnorm") * F.col("qnorm"))
            ).alias("s"),
        )
        .withColumn("rn", F.row_number().over(win_cell))
        .filter(F.col("rn") <= _IVFADC_NPROBE)
        .select("qid", "label")
    )

    win = W.partitionBy("qid").orderBy("adist", "vec_id")
    shortlist = (
        codes.join(F.broadcast(probed), "label")
        .join(F.broadcast(qtab), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(_adc_dist(), 4).alias("adist"))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    return _rerank_cosine(shortlist, base, _NQ_ADC)


# ------------------------------------------------- trained PQ codebooks

_PQ_TRAIN_N = 2048  # training sample size (driver-side, corpus-independent)
_PQ_TRAIN_ITERS = 20  # Lloyd iteration cap (converges earlier in practice)


def pq_trained_codebook(spark: SparkSession, sf_dir: str):
    """Per-sub-space k-means-TRAINED codebooks — the documented
    production upgrade over the anchor codebooks (round-6 VERDICT #8).

    Training is driver-side numpy Lloyd iteration over a BOUNDED
    deterministic sample: the _PQ_TRAIN_N vectors with the smallest
    (md5(vec_id), vec_id) — content-addressed like the anchors, so the
    sample (and therefore the codebook) is a pure function of the
    corpus, independent of partitioning or engine. This is the standard
    PQ training budget (Jegou et al. 2011; faiss trains on
    O(max(10^4, 256*K)) samples regardless of corpus size): at 100 TB
    you still train on thousands of vectors and ENCODE on all of them —
    training cost does not scale with the table.

    Determinism: init = the anchor codebook (so training starts at the
    verifiable floor and can only reduce quantization error);
    assignment uses np.argmin (first-min wins) over float64 distances;
    update is the fixed-order mean of assigned sub-vectors; an emptied
    cluster keeps its previous codeword. Iteration stops when
    assignments are stable or at _PQ_TRAIN_ITERS.

    Rows-only class by nature (iterative, like kmeans_embeddings); the
    recall gate vs the anchor floor lives in tests/test_quantization.py.
    """
    return _session_memo(
        spark, ("cb_trained", sf_dir), lambda: _train_pq_codebook(spark, sf_dir)
    )


def _train_pq_codebook(spark: SparkSession, sf_dir: str):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "embedding", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(_PQ_TRAIN_N)
        .collect()
    )
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    train = _normalize_round_np(mat)  # (n, DIM)
    anchor = np.asarray(
        _build_anchor_codebook(spark, sf_dir), dtype=np.float64
    )  # (M, K, DSUB)
    out = []
    for m in range(PQ_M):
        sub = train[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]  # (n, DSUB)
        cent = anchor[m].copy()  # (K, DSUB)
        prev_assign = None
        for _ in range(_PQ_TRAIN_ITERS):
            diff = sub[:, None, :] - cent[None, :, :]  # (n, K, DSUB)
            d2 = np.einsum("nkd,nkd->nk", diff, diff)
            assign = np.argmin(d2, axis=1)  # first-min wins
            if prev_assign is not None and np.array_equal(assign, prev_assign):
                break
            prev_assign = assign
            for k in range(PQ_K):
                members = sub[assign == k]
                if len(members):
                    cent[k] = members.mean(axis=0)
        out.append([[float(x) for x in word] for word in cent])
    return out


@query(
    "pq_trained_recall",
    None,  # iterative k-means training: rows-only class (like
    # kmeans_embeddings); the >= anchor-floor recall gate is asserted in
    # tests/test_quantization.py
    "PQ recall@10 instrument with k-means-TRAINED per-sub-space "
    "codebooks (Lloyd over a bounded content-addressed sample, "
    "anchor-codebook init): the production configuration the anchor "
    "queries floor. Same measurement shape as pq_recall_at_k; gated "
    "in tests to meet or beat the anchor codebook's re-ranked 0.85.",
)
def pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical pipeline to pq_recall_at_k (ADC ranking + C=50 exact
    re-rank vs brute-force ground truth) with the trained codebook
    swapped in — one argument, because every stage downstream of the
    codebook is codebook-agnostic. Scale story unchanged: train O(n
    sample) on the driver, broadcast 1024 doubles, encode map-only."""
    cb = pq_trained_codebook(spark, sf_dir)
    codes = _session_memo(
        spark,
        ("codes_trained", sf_dir),
        lambda: pq_encode_arrow(load(spark, sf_dir, "embeddings"), cb)
        .select("vec_id", "label", "codes")
        .cache(),
    )
    return _recall_instrument(spark, sf_dir, cb, codes)


# --------------------------------------------------- binary quantization

_BQ_SHORTLIST = 64  # Hamming shortlist size for the exact re-rank stage

_BQ_ORACLE = f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
               FROM embeddings),
    sg AS (SELECT vec_id, label, e,
             list_sum(list_transform(range(1, 33), i ->
               CASE WHEN e[i] > 0 THEN 1::BIGINT << (i - 1)
                    ELSE 0::BIGINT END)) AS w0,
             list_sum(list_transform(range(33, 65), i ->
               CASE WHEN e[i] > 0 THEN 1::BIGINT << (i - 33)
                    ELSE 0::BIGINT END)) AS w1
           FROM v),
    q AS (SELECT vec_id AS qid, e AS qe, w0 AS qw0, w1 AS qw1
          FROM sg WHERE vec_id < {_NQ_ADC}),
    h AS (SELECT q.qid, s.vec_id,
                 bit_count(xor(s.w0, q.qw0))
                   + bit_count(xor(s.w1, q.qw1)) AS hd
          FROM sg s CROSS JOIN q WHERE s.vec_id <> q.qid),
    short AS (SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (
                         PARTITION BY qid ORDER BY hd, vec_id) AS rn
                FROM h)
              WHERE rn <= {_BQ_SHORTLIST}),
    r AS (SELECT short.qid, short.vec_id, s.label,
                 round(list_cosine_similarity(s.e, q.qe), 4) AS cos_sim
          FROM short
          JOIN sg s USING (vec_id)
          JOIN q ON q.qid = short.qid)
    SELECT qid, vec_id, label, cos_sim,
           CAST(row_number() OVER (
                  PARTITION BY qid
                  ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
    FROM r QUALIFY rn <= 10
"""


def bq_sign_words(prefix: str = "") -> list:
    """Binary quantization of a 64-dim ``embedding``: the sign bit of
    each component, packed into two BIGINT words (bits 1-32, 33-64) —
    16 bytes/vector, a 16x scan-size reduction over float32, and
    Hamming distance is two xor+popcount ops (SIMD-friendly on any
    column engine). Pure JVM expressions — no Python in the path."""
    def word(lo: int, hi: int) -> F.Column:
        return F.expr(
            f"aggregate(transform(sequence({lo},{hi}), i -> "
            f"IF(element_at(embedding, i) > CAST(0.0 AS FLOAT), "
            f"shiftleft(CAST(1 AS BIGINT), i-{lo}), CAST(0 AS BIGINT))), "
            f"CAST(0 AS BIGINT), (a, x) -> a + x)"
        )

    return [word(1, 32).alias(f"{prefix}w0"), word(33, 64).alias(f"{prefix}w1")]


@query(
    "ann_bq_hamming_rerank",
    _BQ_ORACLE,
    "BINARY quantization ANN (round-9, the cheapest rung of the "
    "compressed ladder): sign-bit codes packed into two 64-bit words "
    "(16 B/vector, 16x smaller than float32), Hamming-distance "
    f"shortlist of C={_BQ_SHORTLIST} via xor+popcount, exact cosine "
    "re-rank to top-10. The oracle replays packing, Hamming ranking, "
    "and the re-rank bit-for-bit; recall vs exact ground truth is "
    "gated in tests/test_quantization.py.",
)
def ann_bq_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ladder position: BQ 16x (coarse) > PQ ~25x (lossy-trained) >
    SQ 4x (near-exact) > floats 1x (exact). BQ needs no training at
    all — the codebook IS the sign function — so it survives
    distribution drift that stales PQ codebooks, and its shortlist
    feeds the same exact re-rank as the other rungs.

    Scale: packing is a map-only expression (16 B/vector at rest);
    the <= 5 query words broadcast; scoring is xor+popcount per
    (vector, query) in whole-stage codegen; shortlist is a per-query
    window top-C; raw vectors are fetched for the Q x C re-rank rows
    only."""
    base = load(spark, sf_dir, "embeddings")
    sg = base.select("vec_id", *bq_sign_words())
    q = F.broadcast(
        sg.filter(F.col("vec_id") < _NQ_ADC).select(
            F.col("vec_id").alias("qid"),
            F.col("w0").alias("qw0"),
            F.col("w1").alias("qw1"),
        )
    )
    hd = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
    ).alias("hd")
    win = W.partitionBy("qid").orderBy("hd", "vec_id")
    shortlist = (
        sg.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", hd)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _BQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    return _rerank_cosine(shortlist, base, _NQ_ADC)
