"""Deduplication operators for LLM training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each expressed with built-in DataFrame ops so the heavy path
(hashing, banding, bucket joins) stays JVM-side and shuffles only on
candidate-bucket keys, never all-pairs.

Scale design (the part that matters at 100 TB):
- exact dedup is one hash-groupBy — partial agg map-side, shuffle carries
  one row per distinct hash;
- MinHash/SimHash candidate generation is an inverted-index *bucket* join
  (explode band/chunk keys, self-join on the key), so cost is
  sum(bucket_size^2) not N^2; bucket keys are uniform hashes => no skew;
- verification (exact Jaccard / hamming) runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

# MinHash parameters: 64 permutations banded as 16 bands x 4 rows.
# P(candidate | jaccard=s) = 1 - (1 - s^4)^16 — s=0.8 -> 0.9997, s=0.3 -> 0.12.
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
# 31-bit Mersenne prime: shingle ids are folded to 31 bits so a_i*x + b_i
# stays far below 2^63 (Spark 4 runs ANSI mode — long overflow is an error).
_MERSENNE = (1 << 31) - 1


def md5_token_hash(t) -> "F.Column":
    """31-bit token id from the first 8 md5 hex chars — the DuckDB-
    replayable alternative to xxhash64 (identical to
    ``CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT) & 2147483647``).
    ~16x the hashing cost of xxhash64; used by the oracle-verified
    minhash exemplar, never the benched default."""
    return (
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(0x7FFFFFFF))
    )


def _shingle_hashes_expr(th, k: int = 5) -> "F.Column":
    """``shingle_hashes`` expression over an already-materialized token-
    hash array column ``th``: shingle id i is the order-sensitive
    polynomial sum(th[i+j] * 31^j) mod M computed by zipping k
    equal-length shifted slices of that array. No concatenated shingle
    strings are ever materialized (~3x cheaper). The caller must stage
    ``th`` behind its own projection (referenced k times here), which
    keeps CollapseProject from inlining the token pipeline into the
    per-element lambdas."""
    n_shingles = F.greatest(F.size(th) - F.lit(k - 1), F.lit(1))
    weights = [31**j % _MERSENNE for j in range(k)]

    def wsum(w: int):
        # max term 2^31 * 31^4 < 2^52; k terms < 2^55 — no long overflow
        return lambda acc, x: acc + x * F.lit(w)

    acc = F.transform(F.slice(th, 1, n_shingles), lambda x: x * F.lit(weights[0]))
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(th, j + 1, n_shingles), wsum(weights[j]))
    return F.array_distinct(
        F.filter(  # zip_with null-pads when a doc has < k tokens
            F.transform(acc, lambda x: F.pmod(x, F.lit(_MERSENNE))),
            lambda x: x.isNotNull(),
        )
    )


def _token_hash_expr(text_col: str, token_hash) -> "F.Column":
    """Token-hash array over a text column (the staged ``th`` input of
    :func:`_shingle_hashes_expr`)."""
    if token_hash is None:
        token_hash = lambda t: F.xxhash64(t).bitwiseAND(F.lit(0x7FFFFFFF))
    return F.transform(F.split(F.lower(F.col(text_col)), r"\s+"), token_hash)


def shingle_hash_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    token_hash=None,
) -> DataFrame:
    """id + ``shingle_hashes`` (distinct 31-bit ids of k-token shingles),
    string-free. Docs shorter than k tokens yield an empty shingle set.
    See :func:`_shingle_hashes_expr` for the zipped-slices construction
    and the CollapseProject staging note."""
    staged = df.select(
        F.col(id_col), _token_hash_expr(text_col, token_hash).alias("th")
    )
    return staged.select(
        F.col(id_col),
        _shingle_hashes_expr(F.col("th"), k).alias("shingle_hashes"),
    )


def _minhash_signature(shingle_hashes):
    """64-element minhash signature array via affine permutations of the
    shingle ids: h_i(x) = ((2i+1)*x + b_i) mod M.

    One nested higher-order expression over an already-materialized hash
    array — the expensive shingling work is referenced exactly once, so
    Catalyst cannot duplicate it 64x (which is what a 64-column
    formulation does via projection collapse, at a ~200x slowdown).
    """
    # The hash array is the *input child* of one aggregate, so it is
    # evaluated exactly once per row even if the optimizer inlines the
    # full shingling pipeline here. (The inverted formulation — iterate
    # permutations outer, hashes inner — re-evaluates the inlined child
    # per permutation: a measured 30x slowdown.)
    return F.aggregate(
        shingle_hashes,
        F.array_repeat(F.lit(1 << 31).cast("long"), N_PERM),
        lambda acc, x: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(N_PERM - 1)),
            lambda m, i: F.least(
                m,
                F.pmod(
                    x * (i * 2 + 1)
                    + F.pmod(F.lit(0x9E3779B9) * (i + 1), F.lit(1 << 31)),
                    F.lit(_MERSENNE),
                ),
            ),
        ),
    )


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    "Exact dedup: hash-groupBy on content hash, keep lowest doc_id.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "dedup_exact_normalized",
    """
    SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    "Exact dedup after normalization (lowercase, collapse whitespace).",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return (
        d.groupBy(F.md5(normalized).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def collapse_exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One representative (lowest id) per exact text content.

    Near-dup pair generation is quadratic in duplicate multiplicity: a
    corpus where every document has d exact copies puts d copies of
    every member into every LSH bucket, inflating bucket pair counts by
    d^2 (measured 15x wall-clock on an 8x-replicated corpus, where
    linear work scales 8x). Exact duplicates are the EXACT dedup
    stage's output (dedup_exact, cap-free by design); collapsing them
    to one representative before banding restores sum(bucket^2) to the
    distinct-content corpus — the standard exact-then-near pipeline
    ordering. Cost: one content-hash shuffle, the same class as
    dedup_exact (measured ~2x at 8x scale)."""
    w = W.partitionBy("__ch").orderBy(id_col)
    return (
        docs.withColumn("__ch", F.md5(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__ch", "__rn")
    )


# The SQL mirror of collapse_exact_duplicates — ONE definition shared by
# every oracle that replays the exact-then-near collapse (md5(text)
# partition, lowest doc_id wins). Inline drift between this CTE and the
# Python helper is exactly the divergence class the round-6 review
# caught; keep them together.
REPS_CTE = """reps AS (SELECT doc_id, text FROM (
             SELECT doc_id, text, row_number() OVER (
                      PARTITION BY md5(text) ORDER BY doc_id) AS rn
             FROM documents) WHERE rn = 1)"""


def exact_duplicate_edges(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b) edges attaching every exact copy to its lowest-id
    representative. Pair-mining paths collapse exact duplicates before
    banding (collapse_exact_duplicates); CLUSTERING consumers must union
    these attachment edges back in, or exact copies silently fall out of
    their near-dup components. One content-hash shuffle; d copies emit
    d-1 edges (a star), never d^2 pairs."""
    rep = F.min(id_col).over(W.partitionBy("__ch"))
    return (
        docs.withColumn("__ch", F.md5(F.col(text_col)))
        .withColumn("__rep", rep)
        .filter(F.col(id_col) != F.col("__rep"))
        .select(F.col("__rep").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id + 64-value minhash ``signature`` array (reusable block).

    Two-step select keeps the shingle/hash computation a single
    materialized array column (CollapseProject won't inline a non-cheap
    expression referenced by the 64-way signature transform).
    """
    hashed = shingle_hash_frame(df, text_col, id_col)
    return hashed.select(
        F.col(id_col), _minhash_signature(F.col("shingle_hashes")).alias("signature")
    )


# Candidate-generation safety valve: a bucket of m members contributes
# m*(m-1)/2 pairs, so one degenerate bucket (boilerplate / near-empty docs)
# can be O(m^2) on a single join key — a dead-executor hazard at 100 TB.
# Buckets above the cap are dropped entirely from candidate generation.
# Recall semantics: a true near-dup pair loses only the collisions inside
# over-cap buckets; with 16 independent bands it remains a candidate
# unless ALL its colliding buckets are degenerate — and the degenerate
# case (thousands of identical/near-empty docs) is exact-dedup's job,
# which runs without any cap.
DEFAULT_MAX_BUCKET = 128


def _drop_hot_buckets(
    exploded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Remove rows belonging to bucket keys with > max_bucket_size members.

    The over-cap key set is tiny by construction (it only contains
    degenerate keys), so it broadcasts; the anti-join is map-side and the
    count aggregation partial-aggregates on the same key the self-join
    would have shuffled on anyway.
    """
    if max_bucket_size is None:
        return exploded
    hot = (
        exploded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") > max_bucket_size)
        .select(*keys)
    )
    return exploded.join(F.broadcast(hot), keys, "left_anti")


def keep_lowest_k_per_bucket(
    exploded: DataFrame, keys: list[str], id_col: str, k: int
) -> DataFrame:
    """Deterministic hot-bucket cap: keep the ``k`` members with the
    SMALLEST ``id_col`` per bucket key (row_number over the bucket,
    ordered by id).

    Contrast with :func:`_drop_hot_buckets` (drop the WHOLE bucket
    when it exceeds the cap): dropping is the right one-shot-batch
    rule (a degenerate bucket contributes nothing), but it is not
    stable under incremental arrival — whether a bucket is "hot"
    depends on how much of it is visible yet, so a streaming run's
    per-epoch emissions become batch-boundary-dependent. Keeping the
    id-lowest k is a pure function of the bucket's visible MEMBER SET
    (never of arrival order or batch boundaries), and it is exactly
    SQL-expressible (row_number ... <= k), so an oracle can mirror
    it. Work bound: a bucket of d members costs an O(d log d) sort
    and at most k^2 candidate pairs, never d^2.

    Exactness under streaming (the stream_phash_dedup protocol):
    per-epoch kept sets are computed over the VISIBLE members, so a
    member kept early can be evicted later; the union of emissions is
    then a superset of the full-run-capped pair set (every pair whose
    both endpoints are finally kept in a common bucket was visible
    and kept when its later member arrived). Filtering the union by
    FINAL kept membership (see stream_phash_dedup) therefore restores
    exact equality with the one-shot capped run."""
    w = W.partitionBy(*keys).orderBy(F.col(id_col))
    return (
        exploded.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def minhash_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    string_buckets: bool = False,
) -> DataFrame:
    """LSH banding: 16 band keys per doc -> inverted-index self-join.

    Buckets larger than ``max_bucket_size`` are excluded (see
    DEFAULT_MAX_BUCKET for the recall argument). ``string_buckets``
    joins on the ':'-joined band values themselves instead of their
    xxhash64 fold — identical collision semantics (the fold only
    compresses the key), SQL-replayable, slightly wider shuffle keys;
    used by the oracle-verified exemplar."""

    def _fold(b):
        cells = [
            F.element_at(F.col("signature"), b * ROWS_PER_BAND + r + 1)
            for r in range(ROWS_PER_BAND)
        ]
        if string_buckets:
            return F.concat_ws(":", *[c.cast("string") for c in cells])
        return F.xxhash64(*cells)

    bands = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.struct(b.alias("band"), _fold(b).alias("bucket")),
    )
    exploded = sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, "bk.band", "bk.bucket"
    )
    exploded = _drop_hot_buckets(exploded, ["band", "bucket"], max_bucket_size)
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    token_hash=None,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only.

    Scale: shingle sets are rebuilt *only* for docs that appear in a
    candidate pair (semi-join prune) — at low dup rates that is a tiny
    fraction of the corpus."""
    ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    pruned = docs.join(ids, id_col, "left_semi")
    sets_ = shingle_hash_frame(pruned, id_col=id_col, token_hash=token_hash)
    return jaccard_verify_sets(pairs, sets_, threshold, id_col=id_col)


def jaccard_verify_sets(
    pairs: DataFrame,
    sets_: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs from PRECOMPUTED
    shingle sets (``id_col``, ``shingle_hashes``) — the zero-reshingle
    path for pipelines that already persist sets as state (the
    streaming dedup sink stores each batch's sets once; verification
    is then two narrow joins, never a text scan)."""
    a = sets_.select(
        F.col(id_col).alias("doc_a"), F.col("shingle_hashes").alias("sh_a")
    )
    b = sets_.select(
        F.col(id_col).alias("doc_b"), F.col("shingle_hashes").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@query(
    "dedup_minhash_lsh",
    None,
    "Near-dup detection: 5-token shingles -> 64 minhashes -> 16x4 LSH "
    "bands -> bucket self-join -> exact-Jaccard verify >= 0.8. "
    "Rows-only because xxhash64 has no DuckDB equivalent — but the "
    "family's banding math IS driver-hash-verified via "
    "dedup_minhash_lsh_md5 (same pipeline, SQL-expressible hashes); "
    "exactness additionally covered by tests/test_dedup.py on crafted "
    "near-duplicates.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # sort for deterministic registry output only — library form is
    # sort-free (pair consumers are order-insensitive)
    return minhash_jaccard_pairs(d, threshold=0.8).orderBy("doc_a", "doc_b")


_W = [31**j % _MERSENNE for j in range(5)]
_MINHASH_MD5_ORACLE = f"""
    WITH {REPS_CTE},
    toks AS (SELECT doc_id,
                         string_split_regex(lower(text), '\\s+') AS tk
                  FROM reps),
    th AS (SELECT doc_id,
                  list_transform(tk, t ->
                    CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
                      & 2147483647) AS th
           FROM toks WHERE len(tk) >= 5),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(th) - 3), i ->
                    (th[i] * {_W[0]} + th[i + 1] * {_W[1]}
                     + th[i + 2] * {_W[2]} + th[i + 3] * {_W[3]}
                     + th[i + 4] * {_W[4]}) % {_MERSENNE})) AS sh
           FROM th),
    shx AS (SELECT doc_id, unnest(sh) AS x FROM sh),
    perms AS (SELECT unnest(range(0, {N_PERM})) AS i),
    sig AS (SELECT doc_id, i,
                   min((x * (2 * i + 1)
                        + (2654435769 * (i + 1)) % 2147483648)
                       % {_MERSENNE}) AS v
            FROM shx CROSS JOIN perms GROUP BY 1, 2),
    bands AS (SELECT doc_id, i // {ROWS_PER_BAND} AS band,
                     string_agg(CAST(v AS VARCHAR), ':' ORDER BY i) AS key
              FROM sig GROUP BY 1, 2),
    hot AS (SELECT band, key FROM bands GROUP BY band, key
            HAVING count(*) > {DEFAULT_MAX_BUCKET}),
    bk AS (SELECT bands.* FROM bands ANTI JOIN hot USING (band, key)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bk a JOIN bk b
               ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    shared AS (SELECT c.doc_a, c.doc_b, count(*) AS ns
               FROM cand c
               JOIN shx a ON a.doc_id = c.doc_a
               JOIN shx b ON b.doc_id = c.doc_b AND a.x = b.x
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           round(CAST(s.ns AS DOUBLE) / (na.n + nb.n - s.ns), 4) AS jaccard
    FROM shared s
    JOIN sizes na ON s.doc_a = na.doc_id
    JOIN sizes nb ON s.doc_b = nb.doc_id
    WHERE round(CAST(s.ns AS DOUBLE) / (na.n + nb.n - s.ns), 4) >= 0.8
    ORDER BY s.doc_a, s.doc_b
"""


@query(
    "dedup_minhash_lsh_md5",
    _MINHASH_MD5_ORACLE,
    "The oracle-verified exemplar of the MinHash family: the SAME "
    "pipeline as dedup_minhash_lsh (5-token shingles -> 64 affine "
    "minhash permutations -> 16x4 banding -> hot-capped bucket join -> "
    "exact-Jaccard verify >= 0.8) with its two xxhash64 uses swapped "
    "for SQL-expressible forms — md5-derived 31-bit token ids and "
    "':'-joined band keys — so DuckDB replays shingling, permutations, "
    "banding, the hot cap, and verification end to end. The benched "
    "default stays on xxhash64 (~16x cheaper token hashing); this "
    "variant pins the family's banding math with a driver hash verdict.",
)
def dedup_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs shorter than the shingle width are excluded on both sides
    (an empty shingle set cannot clear a 0.8 Jaccard, and keeping them
    would band every empty doc into one degenerate bucket)."""
    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    # tokenize once: the cached SETS feed the signature compute and the
    # Jaccard verification (jaccard_verify_sets) — text is never
    # re-read for candidates
    hashed = (
        shingle_hash_frame(d, token_hash=md5_token_hash)
        .filter(F.size("shingle_hashes") > 0)
        .cache()
    )
    hashed.count()
    sig = hashed.select(
        "doc_id", _minhash_signature(F.col("shingle_hashes")).alias("signature")
    ).cache()
    sig.count()  # eager — see minhash_jaccard_pairs
    pairs = minhash_candidate_pairs(sig, string_buckets=True).cache()
    pairs.count()
    return jaccard_verify_sets(
        pairs, hashed.select("doc_id", "shingle_hashes"), threshold=0.8
    ).orderBy("doc_a", "doc_b")


def minhash_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash-LSH candidates -> exact-Jaccard verify (library form,
    sort-free): the pair source for clustering pipelines.

    cache + eager materialize: the signature table feeds both sides of
    the bucket self-join and the pair table is referenced three times in
    verify — a lazy cache would be recomputed per reference when the
    final job schedules those subtrees concurrently (measured 4x cost).
    At 100 TB this is a persisted intermediate of ~64 longs/doc.
    """
    reps = collapse_exact_duplicates(docs, id_col=id_col)
    hashed = shingle_hash_frame(reps, id_col=id_col).cache()
    hashed.count()  # tokenize once — sets feed signatures AND verify
    sig = hashed.select(
        F.col(id_col),
        _minhash_signature(F.col("shingle_hashes")).alias("signature"),
    ).cache()
    sig.count()
    pairs = minhash_candidate_pairs(sig, id_col=id_col).cache()
    pairs.count()
    return jaccard_verify_sets(
        pairs,
        hashed.select(id_col, "shingle_hashes"),
        threshold=threshold,
        id_col=id_col,
    )


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {REPS_CTE},
    t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
               FROM reps),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks)-4+1),
                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                                        toks[i+3], toks[i+4])))) AS shingle
           FROM t WHERE len(toks) >= 5),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING count(*) <= 128),
    inv AS (SELECT doc_id, shingle FROM sh JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_shared
              FROM inv a JOIN inv b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 4)
             AS jaccard
    FROM pairs JOIN sizes na ON pairs.doc_a = na.doc_id
               JOIN sizes nb ON pairs.doc_b = nb.doc_id
    WHERE round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 4) >= 0.8
    ORDER BY doc_a, doc_b
    """,
    "n-gram Jaccard near-dup via inverted index: explode shingles, join "
    "docs sharing one, exact Jaccard >= 0.8 (no LSH approximation; the "
    "hot-shingle doc-frequency cap and the <5-token exclusion are "
    "mirrored in the oracle, which shingles by STRING where Spark uses "
    "31-bit polynomial hashes — set identity, hence Jaccard, agrees "
    "absent hash collisions, which the oracle diff would surface).",
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_doc_freq: int | None = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """Scale: the inverted-index join shuffles (shingle -> doc) pairs, so
    cost follows shared-shingle density, not N^2. A shingle appearing in
    m docs contributes m*(m-1)/2 join rows, so hot shingles (boilerplate)
    are frequency-capped: shingles in more than ``max_doc_freq`` docs are
    removed from every doc's set, and Jaccard is computed consistently
    over the remaining (discriminative) shingle universe — both the
    shared counts and the per-doc set sizes exclude hot shingles, so
    surviving similarities are exact on that universe.
    """
    d = load(spark, sf_dir, "documents")
    # registry/oracle form only: the global sort exists for deterministic
    # oracle comparison; the library form (ngram_jaccard_pairs) is
    # sort-free because pair consumers (clustering) are order-insensitive
    # and a global sort of the pair set is a pure scale-tax.
    return ngram_jaccard_pairs(d, threshold=0.8, max_doc_freq=max_doc_freq).orderBy(
        "doc_a", "doc_b"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    max_doc_freq: int | None = DEFAULT_MAX_BUCKET,
    id_col: str = "doc_id",
) -> DataFrame:
    """Core of dedup_ngram_jaccard, reusable on any (id, text) frame.

    Exact-duplicate texts collapse to one representative first — d
    copies of a doc put d members in every posting list, inflating join
    rows by d^2 (see collapse_exact_duplicates); intra-duplicate pairs
    are exact-dedup's output. Output-neutral on duplicate-free corpora.
    """
    docs = collapse_exact_duplicates(docs, id_col=id_col)
    sets_ = shingle_hash_frame(docs, id_col=id_col).select(
        id_col, F.col("shingle_hashes").alias("sh")
    )
    # The inverted index feeds four consumers (hot-shingle count, both
    # self-join sides, per-doc sizes); localCheckpoint materializes the
    # shingling once instead of re-running it per consumer (eager, and
    # blocks are GC-released when the frame goes out of scope).
    inv = sets_.select(id_col, F.explode("sh").alias("shingle")).localCheckpoint(
        eager=True
    )
    inv = _drop_hot_buckets(inv, ["shingle"], max_doc_freq)
    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


@query(
    "dedup_shingle_containment",
    f"""
    WITH {REPS_CTE},
    t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
               FROM reps),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks)-4+1),
                    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                                        toks[i+3], toks[i+4])))) AS shingle
           FROM t WHERE len(toks) >= 5),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING count(*) <= 128),
    inv AS (SELECT doc_id, shingle FROM sh JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_shared
              FROM inv a JOIN inv b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(n_shared AS DOUBLE) / na.n, 4) AS contain_a_in_b,
           round(CAST(n_shared AS DOUBLE) / nb.n, 4) AS contain_b_in_a
    FROM pairs JOIN sizes na ON pairs.doc_a = na.doc_id
               JOIN sizes nb ON pairs.doc_b = nb.doc_id
    WHERE greatest(round(CAST(n_shared AS DOUBLE) / na.n, 4),
                   round(CAST(n_shared AS DOUBLE) / nb.n, 4)) >= 0.6
    ORDER BY doc_a, doc_b
    """,
    "Shingle-containment near-subset pairs: directional containment "
    "|A∩B|/|A| over 5-token shingle sets (inverted-index join, hot-"
    "shingle cap mirrored in the oracle). Catches a doc embedded in a "
    "larger one, which symmetric Jaccard misses (small/large size ratio "
    "bounds Jaccard even at full overlap).",
)
def dedup_shingle_containment(
    spark: SparkSession, sf_dir: str, max_doc_freq: int | None = DEFAULT_MAX_BUCKET
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # sort for oracle determinism only — library form is sort-free
    return shingle_containment_pairs(
        d, threshold=0.6, max_doc_freq=max_doc_freq
    ).orderBy("doc_a", "doc_b")


def shingle_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    max_doc_freq: int | None = DEFAULT_MAX_BUCKET,
    id_col: str = "doc_id",
) -> DataFrame:
    """Directional shingle containment >= threshold (either direction).

    Scale: identical inverted-index shape to :func:`ngram_jaccard_pairs`
    — shuffle carries (shingle -> doc) postings, join cost follows
    shared-shingle density with the hot-shingle doc-frequency cap
    bounding any single shingle's contribution to ``max_doc_freq^2/2``
    pairs; containment is two extra projections over the same shared-
    count aggregate, so the plan (and its 100 TB behavior) is the
    Jaccard plan, not a new one.

    Exact-duplicate texts collapse to one representative first (the
    family-wide exact-then-near ordering; the oracle's reps CTE
    mirrors this) — without it, d exact copies inflate posting-list
    pair counts by d^2, and impl/oracle would diverge on any
    duplicated corpus.
    """
    docs = collapse_exact_duplicates(docs, id_col=id_col)
    sets_ = shingle_hash_frame(docs, id_col=id_col).select(
        id_col, F.col("shingle_hashes").alias("sh")
    )
    inv = sets_.select(id_col, F.explode("sh").alias("shingle")).localCheckpoint(
        eager=True
    )
    inv = _drop_hot_buckets(inv, ["shingle"], max_doc_freq)
    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    shared = F.col("n_shared").cast("double")
    c_ab = F.round(shared / F.col("n_a"), 4)
    c_ba = F.round(shared / F.col("n_b"), 4)
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            c_ab.alias("contain_a_in_b"),
            c_ba.alias("contain_b_in_a"),
        )
        .filter(
            F.greatest(F.col("contain_a_in_b"), F.col("contain_b_in_a")) >= threshold
        )
    )


# 60-bit SimHash (15 md5 hex chars): md5 is the one 64-bit-class hash
# both engines share (xxhash64 has no DuckDB equivalent — the curation.py
# policy), and 15 hex chars stay positive in a signed BIGINT on both
# sides, dodging the two's-complement sign-bit special case entirely.
N_SIMHASH_BITS = 60
SIMHASH_CHUNK_BITS = 15
N_SIMHASH_CHUNKS = N_SIMHASH_BITS // SIMHASH_CHUNK_BITS  # banding chunks


def token_hash60(t) -> "F.Column":
    """First 15 md5 hex chars as a positive 60-bit long — identical to
    DuckDB's CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_bitsums_column(text_col) -> "F.Column":
    """Per-bit ±1 sums for the 60-bit SimHash, as one array<int> column.

    Token hashes are rendered as 60-char bit strings (``lpad(bin(h))``)
    once per token — the bit-string array is the input child of a single
    aggregate, so tokenization+hashing run once per row regardless of
    optimizer inlining (see _minhash_signature note).
    """
    n = N_SIMHASH_BITS
    toks = F.split(F.lower(text_col), r"\s+")
    bitstrs = F.transform(toks, lambda t: F.lpad(F.bin(token_hash60(t)), n, "0"))
    return F.aggregate(
        bitstrs,
        F.array_repeat(F.lit(0), n),
        lambda acc, s: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(n - 1)),
            # bit j is char position n-j in the MSB-first bit string
            lambda a, j: a
            + F.when(s.substr(F.lit(n) - j, F.lit(1)) == "1", 1).otherwise(-1),
        ),
    )


def simhash_from_bitsums(bitsums_col) -> "F.Column":
    """Assemble the long from majority bits. Must be applied in a second
    select over a materialized bit-sums column: the 60 element_at
    references keep CollapseProject from inlining the aggregate 60x."""
    out = F.lit(0).cast("long")
    for j in range(N_SIMHASH_BITS):
        out = out + F.when(
            F.element_at(bitsums_col, j + 1) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id + 64-bit simhash (two-step select, see helpers above)."""
    staged = df.select(
        F.col(id_col), simhash_bitsums_column(F.col(text_col)).alias("bitsums")
    )
    return staged.select(
        F.col(id_col), simhash_from_bitsums(F.col("bitsums")).alias("simhash")
    )


_SIMHASH_ORACLE = f"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split_regex(lower(text), '\\s+')) AS t
                  FROM documents),
    th AS (SELECT doc_id,
                  CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
           FROM toks),
    votes AS (SELECT doc_id, j,
                     sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM th CROSS JOIN
                   (SELECT unnest(range(0, {N_SIMHASH_BITS})) AS j) bits
              GROUP BY doc_id, j),
    sig AS (SELECT doc_id,
                   sum(CASE WHEN v > 0 THEN 1::BIGINT << j ELSE 0 END)
                     AS simhash
            FROM votes GROUP BY doc_id),
    ck AS (SELECT doc_id, simhash, c AS chunk,
                  (simhash >> (c * {SIMHASH_CHUNK_BITS}))
                    & {(1 << SIMHASH_CHUNK_BITS) - 1} AS key
           FROM sig CROSS JOIN
                (SELECT unnest(range(0, {N_SIMHASH_CHUNKS})) AS c) chunks),
    hot AS (SELECT chunk, key FROM ck GROUP BY chunk, key
            HAVING count(*) > 128),
    ck2 AS (SELECT ck.* FROM ck ANTI JOIN hot USING (chunk, key))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM ck2 a JOIN ck2 b
      ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b
"""


@query(
    "dedup_simhash",
    _SIMHASH_ORACLE,
    "SimHash signatures (60-bit, md5-derived token hashes) + near-dup "
    "pairs at hamming distance <= 3 via 15-bit chunk banding (any of 4 "
    "chunks equal => candidate, hot chunks capped). md5 hashing makes "
    "the whole pipeline — votes, majority bits, banding, hamming — "
    "exactly reproducible in the DuckDB oracle.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sig = simhash_signatures(d).cache()  # both sides of the chunk self-join
    sig.count()  # eager — see dedup_minhash_lsh
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * SIMHASH_CHUNK_BITS)
                .bitwiseAND(F.lit((1 << SIMHASH_CHUNK_BITS) - 1))
                .alias("key"),
            )
            for c in range(N_SIMHASH_CHUNKS)
        ]
    )
    exploded = sig.select("doc_id", "simhash", F.explode(chunks).alias("ck")).select(
        "doc_id", "simhash", "ck.chunk", "ck.key"
    )
    exploded = _drop_hot_buckets(exploded, ["chunk", "key"], DEFAULT_MAX_BUCKET)
    a, b = exploded.alias("a"), exploded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


def embedding_cosine_pairs_bruteforce(v_with_norm: DataFrame, threshold: float) -> DataFrame:
    """All-pairs exact cosine >= threshold — O(N²) nested loop. The
    exactness baseline the bucketed operator is tested against (and the
    DuckDB-oracle form); never the registered scale path."""
    from .similarity import _cos

    a = v_with_norm.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("norm").alias("na")
    )
    b = v_with_norm.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cos(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


@query(
    "dedup_embedding_bruteforce",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.e, b.e), 4) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.e, b.e), 4) >= 0.3
    """,
    "Embedding-cosine near-dup pairs by brute-force all-pairs: the "
    "oracle-checkable exactness BASELINE for dedup_embedding_cosine "
    "(which buckets with LSH), kept for small-scale verification only.",
)
def dedup_embedding_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _with_norm

    return embedding_cosine_pairs_bruteforce(
        _with_norm(load(spark, sf_dir, "embeddings")), threshold=0.3
    )


@query(
    "dedup_embedding_cosine",
    None,
    "Embedding-cosine near-dup pairs, LSH-bucketed (8x8 banded "
    "hyperplane candidates, hot-bucket cap, exact cosine on candidates "
    "only). Approximate recall => rows-only driver check; precision-1 "
    "subset + planted-near-dup recall asserted in tests/test_dedup.py "
    "against the brute-force baseline.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path (round-2 VERDICT #2 — the registered operator used to
    BE the O(N²) brute force): candidates come from the shared multi-band
    LSH machinery (similarity.lsh_candidate_pairs — bucket join with hot
    caps, cost sum(bucket²) not N²), and exact cosine runs on candidate
    pairs only, so every emitted pair is a true >=-threshold pair
    (precision 1; recall is the banding probability, ~1 in the near-dup
    regime)."""
    from .similarity import _with_norm

    v = _with_norm(load(spark, sf_dir, "embeddings"))
    # sort for deterministic registry output only — library form is
    # sort-free (pair consumers are order-insensitive)
    return embedding_cosine_pairs_lsh(v, threshold=0.3).orderBy("vec_a", "vec_b")


def embedding_cosine_pairs_lsh(
    v_with_norm: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs (library form, sort-free).

    Same candidates-then-verify shape as :func:`dedup_embedding_cosine`:
    multi-band hyperplane LSH candidates -> exact cosine on candidates
    only -> threshold filter. Emits unordered (vec_a, vec_b, cos_sim)
    pairs for clustering or blocklists.
    """
    from .similarity import _cos, collapse_exact_vectors, lsh_candidate_pairs

    v = v_with_norm
    # exact-duplicate vectors collapse to one representative before
    # banding: pair generation is quadratic in duplicate multiplicity
    # (see collapse_exact_vectors); output-neutral on duplicate-free
    # corpora, intra-duplicate pairs are exact-dedup's output
    pairs = lsh_candidate_pairs(collapse_exact_vectors(v))
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("norm").alias("na")
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("norm").alias("nb")
    )
    return (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(_cos(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------------------ incremental dedup

_MINHASH_INCR_ORACLE = f"""
    WITH {REPS_CTE},
    toks AS (SELECT doc_id,
                         string_split_regex(lower(text), '\\s+') AS tk
                  FROM reps),
    th AS (SELECT doc_id,
                  list_transform(tk, t ->
                    CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
                      & 2147483647) AS th
           FROM toks WHERE len(tk) >= 5),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(th) - 3), i ->
                    (th[i] * {_W[0]} + th[i + 1] * {_W[1]}
                     + th[i + 2] * {_W[2]} + th[i + 3] * {_W[3]}
                     + th[i + 4] * {_W[4]}) % {_MERSENNE})) AS sh
           FROM th),
    shx AS (SELECT doc_id, unnest(sh) AS x FROM sh),
    perms AS (SELECT unnest(range(0, {N_PERM})) AS i),
    sig AS (SELECT doc_id, i,
                   min((x * (2 * i + 1)
                        + (2654435769 * (i + 1)) % 2147483648)
                       % {_MERSENNE}) AS v
            FROM shx CROSS JOIN perms GROUP BY 1, 2),
    bands AS (SELECT doc_id, i // {ROWS_PER_BAND} AS band,
                     string_agg(CAST(v AS VARCHAR), ':' ORDER BY i) AS key
              FROM sig GROUP BY 1, 2),
    hot AS (SELECT band, key FROM bands GROUP BY band, key
            HAVING count(*) > {DEFAULT_MAX_BUCKET}),
    bk AS (SELECT bands.* FROM bands ANTI JOIN hot USING (band, key)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bk a JOIN bk b
               ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id
              AND (a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    shared AS (SELECT c.doc_a, c.doc_b, count(*) AS ns
               FROM cand c
               JOIN shx a ON a.doc_id = c.doc_a
               JOIN shx b ON b.doc_id = c.doc_b AND a.x = b.x
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           round(CAST(s.ns AS DOUBLE) / (na.n + nb.n - s.ns), 4) AS jaccard
    FROM shared s
    JOIN sizes na ON s.doc_a = na.doc_id
    JOIN sizes nb ON s.doc_b = nb.doc_id
    WHERE round(CAST(s.ns AS DOUBLE) / (na.n + nb.n - s.ns), 4) >= 0.8
    ORDER BY s.doc_a, s.doc_b
"""


def explode_minhash_bands(
    sig: DataFrame, id_col: str = "doc_id", string_buckets: bool = False
) -> DataFrame:
    """One (id, band, bucket) row per signature band — the LSH band
    table, in the exact layout the persisted index stores."""

    def _fold(b):
        cells = [
            F.element_at(F.col("signature"), b * ROWS_PER_BAND + r + 1)
            for r in range(ROWS_PER_BAND)
        ]
        if string_buckets:
            return F.concat_ws(":", *[c.cast("string") for c in cells])
        return F.xxhash64(*cells)

    bands = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.struct(b.alias("band"), _fold(b).alias("bucket")),
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, "bk.band", "bk.bucket"
    )


def incremental_band_pairs(
    batch_bands: DataFrame,
    index_bands: DataFrame,
    batch_ids: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    deterministic_cap: int | None = None,
) -> DataFrame:
    """Candidate pairs touching the BATCH only, from pre-exploded band
    tables (in-memory or read back from the persisted index).

    The hot-bucket cap is computed over the FULL (visible) band table
    (a hot boilerplate bucket is hot regardless of which side
    contributed the members), so batch and full-run recalls degrade
    identically; shard pruning keeps this property because a shard
    holds every member of each of its buckets.

    ``deterministic_cap`` selects the keep-lowest-k rule instead
    (:func:`keep_lowest_k_per_bucket`) — the streaming-safe cap whose
    kept set is a pure function of the visible member set; pass
    ``max_bucket_size=None`` with it (the two rules compose but
    drop-hot would reintroduce the batch-boundary dependence the
    deterministic cap exists to remove)."""
    all_bands = index_bands.unionByName(batch_bands)
    all_bands = _drop_hot_buckets(all_bands, ["band", "bucket"], max_bucket_size)
    if deterministic_cap is not None:
        all_bands = keep_lowest_k_per_bucket(
            all_bands, ["band", "bucket"], id_col, deterministic_cap
        )
    probe = all_bands.join(F.broadcast(batch_ids), id_col, "left_semi")
    left = probe.alias("l")
    right = all_bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .select(
            F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )


def incremental_minhash_pairs(
    batch_sig: DataFrame,
    index_sig: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    string_buckets: bool = False,
) -> DataFrame:
    """Candidate pairs touching the BATCH only: the batch's band keys
    probe the (historical index ∪ batch) band table — historical-vs-
    historical pairs are never generated (they were found when those
    docs arrived). This is the library form production dedup actually
    runs: per-batch cost is O(|batch| x bands) probe rows against a
    pre-bucketed index, never a full-corpus self-join. For the
    at-rest index, see append_minhash_index / probe_minhash_index."""
    return incremental_band_pairs(
        explode_minhash_bands(batch_sig, id_col, string_buckets),
        explode_minhash_bands(index_sig, id_col, string_buckets),
        batch_sig.select(id_col),
        id_col,
        max_bucket_size,
    )


MINHASH_INDEX_SHARDS = 32  # bucket-hash partition fanout of the at-rest index


def minhash_index_shard(bucket) -> "F.Column":
    """Stable shard of a band bucket — the index's hive partition
    value. A pure function of the bucket key, so every member of a
    bucket lands in one shard (the hot-cap and probe-pruning
    invariant)."""
    return F.pmod(
        F.xxhash64(bucket.cast("string")), F.lit(MINHASH_INDEX_SHARDS)
    ).cast("int")


def append_minhash_index(
    index_path: str,
    sig: DataFrame | None,
    id_col: str = "doc_id",
    string_buckets: bool = False,
    bands: DataFrame | None = None,
) -> None:
    """Append a batch's band rows to the persisted, bucket-sharded LSH
    index (round-7 VERDICT #4 — the at-rest form the
    dedup_incremental_minhash docstring promised). Layout:
    ``shard=K/`` hive partitions of (doc_id, band, bucket) rows, shard
    = hash(bucket) % 32, so a probe prunes to the shards its buckets
    hash into at PLANNING time. Append-only: a batch is one
    partitioned parquet append (~16 rows/doc), historical rows are
    never rewritten or recomputed.

    ``bands``: a precomputed (id, band, bucket, shard) band table (the
    probe's checkpointed one) — skips re-deriving it from ``sig``.

    Write fanout (r16, guide §2.4/§6): the shard-keyed repartition is
    bounded to cores/8 write tasks instead of one task per shuffle
    partition — each dynamic-partition write task pays a fixed
    committer setup/rename cost, and with 32 one-shard tasks that
    fixed cost dominated the append (measured 0.99 s -> 0.36 s on the
    r16 profiling corpus). Keyed repartition keeps whole shards in
    one task, so the layout still gets exactly one file per touched
    shard per batch; the task count scales with cores, so a large
    cluster keeps a wide write."""
    if bands is None:
        bands = explode_minhash_bands(sig, id_col, string_buckets).withColumn(
            "shard", minhash_index_shard(F.col("bucket"))
        )
    spark = bands.sparkSession
    n_tasks = max(1, spark.sparkContext.defaultParallelism // 8)
    (
        bands.select(id_col, "band", "bucket", "shard")
        .repartition(n_tasks, "shard")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(index_path)
    )


def probe_minhash_index(
    spark: SparkSession,
    index_path: str,
    batch_sig: DataFrame | None,
    id_col: str = "doc_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    string_buckets: bool = False,
    batch_bands: DataFrame | None = None,
    batch_ids: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs for a batch against the PERSISTED index: the
    batch's band table is computed (O(|batch| x 16) rows), its shard
    set collected (bounded by MINHASH_INDEX_SHARDS — an O(32) collect,
    the ann_ivf_partitioned_scan pattern), and the index scan prunes to
    those shard directories at planning time. Historical signatures
    are READ, never recomputed; historical text is touched only by the
    caller's jaccard_verify on actual candidates.

    ``batch_bands``/``batch_ids``: precomputed (id, band, bucket,
    shard) band table (already pinned) and batch-id frame — lets a
    caller that also APPENDS the same bands (the streaming sink) share
    one checkpointed band table across probe and append instead of
    deriving it twice (r16, guide §2.4). ``batch_sig=None`` is valid
    only when BOTH are supplied; ``batch_ids`` alone may be omitted
    (derived from ``batch_bands``)."""
    from pathlib import Path

    if batch_sig is None and batch_bands is None:
        # r16 ADVICE: the sig-less contract crashed later with an
        # opaque AttributeError on None.select; validate up front.
        raise ValueError(
            "probe_minhash_index: batch_sig=None requires a precomputed "
            "batch_bands (and ideally batch_ids)"
        )
    if batch_sig is None and batch_ids is None:
        batch_ids = batch_bands.select(id_col).distinct()
    if batch_bands is None:
        batch_bands = explode_minhash_bands(
            batch_sig, id_col, string_buckets
        ).withColumn("shard", minhash_index_shard(F.col("bucket")))
        batch_bands = batch_bands.localCheckpoint(eager=True)
    if batch_ids is None:
        batch_ids = batch_sig.select(id_col)
    shards = [
        r.shard for r in batch_bands.select("shard").distinct().collect()
    ]
    # bootstrap: an index that doesn't exist yet — or exists but holds
    # no data files (every doc of the first batch fell below the
    # shingle minimum, so its append wrote only _SUCCESS) — is an
    # EMPTY index: only new-vs-new pairs are generated. (Local-fs
    # check, like the rest of this sandbox's lake layer.)
    has_files = any(Path(index_path).rglob("*.parquet"))
    if has_files:
        index_bands = (
            spark.read.parquet(index_path)
            .filter(F.col("shard").isin(shards))
            .select(id_col, "band", "bucket")
        )
    else:
        index_bands = batch_bands.select(id_col, "band", "bucket").limit(0)
    return incremental_band_pairs(
        batch_bands.select(id_col, "band", "bucket"),
        index_bands,
        batch_ids,
        id_col,
        max_bucket_size,
    )


@query(
    "dedup_incremental_minhash",
    _MINHASH_INCR_ORACLE,
    "INCREMENTAL near-dup detection — the shape production dedup "
    "actually runs: today's batch (doc_id % 4 = 0) arrives against a "
    "pre-built historical signature index (the other docs), and only "
    "pairs TOUCHING the batch are generated — new-vs-historical and "
    "new-vs-new, never historical-vs-historical (found when those docs "
    "arrived). Same md5 pipeline as the dedup_minhash_lsh_md5 exemplar "
    "(5-token shingles, 64 affine permutations, 16x4 banding, hot cap "
    "over the full band table, exact-Jaccard verify >= 0.8), so the "
    "oracle replays everything with the batch restriction as one "
    "predicate on the candidate join.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the historical signature/band index is a PERSISTED table
    in production (~64 longs + 16 band keys per doc — built once, per
    batch appended); per-batch cost is |batch| x 16 probe rows joined
    against it on (band, bucket) — at rest, bucket-partitioned so the
    probe prunes. Verification joins the stored shingle sets
    (jaccard_verify_sets) — historical text is never re-read at all;
    the set store is the same per-batch state the streaming form
    persists — the O(batch)
    incremental story end to end. The index side here is computed
    fresh (the driver gives one parquet corpus) but flows through the
    same cached DataFrame a persisted index would."""
    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    hashed = (
        shingle_hash_frame(d, token_hash=md5_token_hash)
        .filter(F.size("shingle_hashes") > 0)
        .cache()
    )
    hashed.count()  # tokenize once — sets feed signatures AND verify
    sig = hashed.select(
        "doc_id", _minhash_signature(F.col("shingle_hashes")).alias("signature")
    ).cache()
    sig.count()  # eager — dual-consumed (see minhash_jaccard_pairs)
    batch_sig = sig.filter(F.col("doc_id") % 4 == 0)
    index_sig = sig.filter(F.col("doc_id") % 4 != 0)
    pairs = incremental_minhash_pairs(
        batch_sig, index_sig, string_buckets=True
    ).cache()
    pairs.count()
    return jaccard_verify_sets(
        pairs, hashed.select("doc_id", "shingle_hashes"), threshold=0.8
    ).orderBy("doc_a", "doc_b")


@query(
    "dedup_minhash_index_probe",
    _MINHASH_INCR_ORACLE,
    "Incremental near-dup detection against the PERSISTED LSH index "
    "(round-8): the historical signatures' band table is WRITTEN as a "
    "bucket-sharded hive-partitioned parquet index (shard = "
    "hash(bucket) % 32), the batch (doc_id % 4 = 0) probes it FROM "
    "DISK — the batch's shard set resolves to planning-time partition "
    "pruning — and candidates are Jaccard-verified >= 0.8. Same "
    "pipeline constants as dedup_incremental_minhash, so the same "
    "oracle replays it; the two queries returning identical rows is "
    "itself the at-rest/in-memory equivalence proof.",
)
def dedup_minhash_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest form of the incremental story (round-7 VERDICT #4):
    the index is a real parquet table probed from files, not a cached
    DataFrame. Scale: per batch, O(|batch| x 16) band rows + one
    bounded O(32) shard collect; the index read prunes to probed
    shard dirs at planning time (PartitionFilters pinned in
    tests/test_plans.py); historical signatures are read, never
    recomputed (pinned in tests/test_dedup.py); appending the next
    batch is one partitioned parquet append."""
    from ..scratch import scratch_dir

    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    # cache the SETS, not the signatures: every downstream consumer —
    # the index write, the batch probe, and the Jaccard verification —
    # derives from them, so the corpus is tokenized exactly once and
    # verification never touches text (jaccard_verify_sets)
    hashed = (
        shingle_hash_frame(d, token_hash=md5_token_hash)
        .filter(F.size("shingle_hashes") > 0)
        .cache()
    )
    hashed.count()
    sig = hashed.select(
        "doc_id", _minhash_signature(F.col("shingle_hashes")).alias("signature")
    )
    index_path = scratch_dir("minhash_index_") + "/bands"
    append_minhash_index(
        index_path, sig.filter(F.col("doc_id") % 4 != 0), string_buckets=True
    )
    batch_sig = sig.filter(F.col("doc_id") % 4 == 0)
    pairs = probe_minhash_index(
        spark, index_path, batch_sig, string_buckets=True
    ).cache()
    pairs.count()
    return jaccard_verify_sets(
        pairs, hashed.select("doc_id", "shingle_hashes"), threshold=0.8
    ).orderBy("doc_a", "doc_b")


_MINHASH_STREAM_ORACLE = f"""
    WITH {REPS_CTE},
    toks AS (SELECT doc_id,
                         string_split_regex(lower(text), '\\s+') AS tk
                  FROM reps),
    th AS (SELECT doc_id,
                  list_transform(tk, t ->
                    CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
                      & 2147483647) AS th
           FROM toks WHERE len(tk) >= 5),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(th) - 3), i ->
                    (th[i] * {_W[0]} + th[i + 1] * {_W[1]}
                     + th[i + 2] * {_W[2]} + th[i + 3] * {_W[3]}
                     + th[i + 4] * {_W[4]}) % {_MERSENNE})) AS sh
           FROM th),
    shx AS (SELECT doc_id, unnest(sh) AS x FROM sh),
    perms AS (SELECT unnest(range(0, {N_PERM})) AS i),
    sig AS (SELECT doc_id, i,
                   min((x * (2 * i + 1)
                        + (2654435769 * (i + 1)) % 2147483648)
                       % {_MERSENNE}) AS v
            FROM shx CROSS JOIN perms GROUP BY 1, 2),
    bands AS (SELECT doc_id, i // {ROWS_PER_BAND} AS band,
                     string_agg(CAST(v AS VARCHAR), ':' ORDER BY i) AS key
              FROM sig GROUP BY 1, 2),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    shared AS (SELECT c.doc_a, c.doc_b, count(*) AS ns
               FROM cand c
               JOIN shx a ON a.doc_id = c.doc_a
               JOIN shx b ON b.doc_id = c.doc_b AND a.x = b.x
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           round(CAST(s.ns AS DOUBLE) / (na.n + nb.n - s.ns), 4) AS jaccard
    FROM shared s
    JOIN sizes na ON s.doc_a = na.doc_id
    JOIN sizes nb ON s.doc_b = nb.doc_id
    WHERE round(CAST(s.ns AS DOUBLE) / (na.n + nb.n - s.ns), 4) >= 0.8
    ORDER BY s.doc_a, s.doc_b
"""


@query(
    "stream_minhash_dedup",
    _MINHASH_STREAM_ORACLE,
    "STREAMING incremental near-dup detection (round-8): the corpus "
    "arrives as 3 document micro-batches; each batch probes the "
    "persisted bucket-sharded LSH index (bootstrapped empty), "
    "Jaccard-verifies its candidates against the corpus landed so far, "
    "appends verified pairs to a result sink, and appends its own band "
    "rows to the index. Every near-dup pair is emitted exactly once — "
    "in the batch its LATER member arrived with — so the union over "
    "batches equals the full-corpus run, and the oracle is the plain "
    "end-to-end md5 LSH pipeline (no hot-bucket cap here, so the "
    "batch-order-dependent cap timing cannot perturb equality; the "
    "capped form is oracle-proven in dedup_incremental_minhash).",
)
def stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arrival protocol on top of the at-rest index (S21): what
    production runs every ingestion window, as an actual Structured
    Streaming query. foreachBatch gives batch-id-addressed delivery;
    the index append is the only state carried between batches, so a
    restart resumes at the unprocessed file with the index exactly
    reflecting processed batches (asserted in tests/test_dedup.py).

    Scale: per batch O(|batch| x 16) probe rows against shard-pruned
    index partitions; each document is TOKENIZED EXACTLY ONCE, in its
    arrival batch — its shingle set persists as stream state, so
    verification is two narrow joins against stored sets, never a text
    scan (round-9: the previous form re-shingled every candidate doc
    every batch, the dominant term of the loop); the result sink, the
    set store, and the index grow by appends only. Nothing in the loop
    scans the full corpus — the streaming form inherits every bound
    the batch incremental form proved."""
    from ..scratch import scratch_dir
    from .streaming_ops import cdc_land_change_files

    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    base = scratch_dir("stream_dedup_")
    src = f"{base}/incoming"
    idx = f"{base}/index"
    docs = f"{base}/docs"
    out = f"{base}/pairs"
    cdc_land_change_files(d, src, base, n=3, key_col="doc_id")
    run_minhash_dedup_stream(spark, src, d.schema, idx, docs, out, f"{base}/ckpt")
    return (
        spark.read.schema("doc_a long, doc_b long, jaccard double")
        .parquet(f"{out}/batch=*")
        .orderBy("doc_a", "doc_b")
    )


def minhash_stream_sink(spark: SparkSession, docs_schema, idx: str, docs: str, out: str):
    """The per-batch body of :func:`stream_minhash_dedup` as a reusable
    foreachBatch sink: land the batch docs AND their shingle sets
    (tokenize-once state), probe the persisted index (no hot cap — see
    the query docstring), verify candidates against the stored sets of
    the corpus landed so far, append verified pairs and the batch's
    band rows.

    Replay-safe (foreachBatch delivery is at-least-once): every output
    of epoch K lands in an epoch-deterministic directory
    (``.../batch=K``) written with overwrite semantics, and the
    batch's own index slice is removed before probing — so a
    re-delivered epoch overwrites exactly its own prior partial
    output, never duplicating docs, pairs, or band rows, and never
    touching other epochs'. The index is the only state carried
    between batches; restart-resume (clean and mid-epoch) is pinned in
    tests/test_dedup.py."""

    def process(batch: DataFrame, bid: int) -> None:
        import os
        import shutil

        # r16 changed the docs-store format: shingle sets live as a
        # column ON the landed docs; the pre-r16 sibling `<docs>_sets/`
        # tree no longer exists. A checkpoint resumed across that
        # version boundary would read old batches back with NULL
        # shingle_hashes and silently MISS their historical duplicates
        # — fail loudly instead (r16 ADVICE).
        legacy_sets = f"{docs}_sets"
        if os.path.isdir(legacy_sets):
            raise RuntimeError(
                f"legacy minhash sets store found at {legacy_sets}: this "
                "stream's earlier batches were landed by a pre-r16 sink "
                "whose docs files carry no shingle_hashes column. "
                "Resuming would silently drop all historical candidates "
                "— re-land the stream from a fresh checkpoint (or "
                "backfill the shingle_hashes column onto the old "
                "batches) before continuing."
            )
        ddir = f"{docs}/batch={bid}"
        pdir = f"{out}/batch={bid}"
        idir = f"{idx}/batch={bid}"
        # a crashed prior attempt at THIS epoch may have appended its
        # band rows already — drop them before probing, or the batch
        # would find itself in the index
        shutil.rmtree(idir, ignore_errors=True)
        # Land the batch docs WITH their shingle sets in ONE write
        # (r16, guide §2.4/§1.2: the pre-r16 sink paid four jobs here —
        # a repartition+checkpoint, a docs write, a separate sets-store
        # write, and a signature checkpoint; merging landing+tokenize
        # and sharing one checkpointed band table measured 9.6 s ->
        # 6.2 s over the three batches). A single-file micro-batch
        # arrives as ONE partition, so it is spread before the
        # (expensive) shingle compute or that runs on one core.
        # Shingle ONCE per document, ever: the sets column persists as
        # stream state ON the landed docs, so this batch's signature
        # AND every later batch's Jaccard verification read it back
        # columnar instead of re-tokenizing text (the pre-round-9 form
        # re-shingled every candidate doc every batch — the dominant
        # term of the loop).
        spread = batch.repartition(spark.sparkContext.defaultParallelism)
        staged = spread.select(
            "*", _token_hash_expr("text", md5_token_hash).alias("__th")
        )
        staged.select(
            *batch.columns,
            _shingle_hashes_expr(F.col("__th")).alias("shingle_hashes"),
        ).write.mode("overwrite").parquet(ddir)
        sets_schema = "doc_id long, shingle_hashes array<bigint>"
        batch_sets = (
            spark.read.schema(sets_schema)
            .parquet(ddir)
            .filter(F.size("shingle_hashes") > 0)
        )
        sig = batch_sets.select(
            "doc_id",
            _minhash_signature(F.col("shingle_hashes")).alias("signature"),
        )
        # ONE checkpointed band table feeds the probe AND the index
        # append below — the signature is computed exactly once per doc
        bands = (
            explode_minhash_bands(sig, "doc_id", True)
            .withColumn("shard", minhash_index_shard(F.col("bucket")))
            .localCheckpoint(eager=True)
        )
        cand = probe_minhash_index(
            spark,
            idx,
            None,
            max_bucket_size=None,
            string_buckets=True,
            batch_bands=bands,
            batch_ids=batch_sets.select("doc_id"),
        )
        all_sets = (
            spark.read.schema(sets_schema)
            .parquet(f"{docs}/batch=*")
            .filter(F.size("shingle_hashes") > 0)
        )
        jaccard_verify_sets(cand, all_sets, threshold=0.8).write.mode(
            "overwrite"
        ).parquet(pdir)
        append_minhash_index(idir, None, string_buckets=True, bands=bands)

    return process


def run_minhash_dedup_stream(
    spark: SparkSession,
    src: str,
    docs_schema,
    idx: str,
    docs: str,
    out: str,
    checkpoint: str,
) -> None:
    """Drive the dedup stream over ``src`` to completion (availableNow,
    one file per micro-batch); with an existing ``checkpoint`` this is
    the RESTART path — only unprocessed files run.

    r17: runs under the input-size-derived shuffle width (the
    streaming_ops._drive_file_stream rationale) — the sink body's batch
    jobs get no AQE coalescing inside foreachBatch, so the session
    default paid 32 near-empty tasks per shuffle per epoch. Restarts
    replan each batch fresh; batch-plan width is not checkpoint-pinned.
    """
    from ..streaming.events import (
        _with_shuffle_width,
        source_bytes,
        stream_state_partitions,
    )

    width = stream_state_partitions(spark, source_bytes(src))
    with _with_shuffle_width(spark, width):
        (
            spark.readStream.schema(docs_schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(src)
            .writeStream.foreachBatch(
                minhash_stream_sink(spark, docs_schema, idx, docs, out)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


_PARA_ORACLE = """
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, lang, w,
             unnest(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS chunk_idx
      FROM words
    ),
    chunks AS (
      SELECT doc_id, lang, chunk_idx,
             array_to_string(w[chunk_idx * 10 + 1 : chunk_idx * 10 + 10],
                             ' ') AS seg
      FROM idx
    ),
    marked AS (
      SELECT *, row_number() OVER (
               PARTITION BY seg ORDER BY doc_id, chunk_idx) AS rn
      FROM chunks
    ),
    rebuilt AS (
      SELECT doc_id, lang,
             count(*) AS n_chunks,
             sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
             string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                        ORDER BY chunk_idx) AS dedup_text
      FROM marked GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
           CAST(sum(n_kept) AS BIGINT) AS kept_chunks,
           CAST(sum(CASE WHEN dedup_text IS NULL THEN NULL ELSE
                CAST(concat('0x', substr(md5(dedup_text), 1, 8)) AS BIGINT)
                END) AS BIGINT) AS text_chk
    FROM rebuilt GROUP BY lang
"""


@query(
    "dedup_paragraphs",
    _PARA_ORACLE,
    "Corpus-wide paragraph-level exact dedup (the RefinedWeb / "
    "MassiveText recipe): every document is segmented, each distinct "
    "segment keeps its globally FIRST occurrence (ordered by doc_id, "
    "position) and every later copy — across documents or within one — "
    "is removed, then documents are reassembled from their surviving "
    "segments in order. This corpus has no newline structure, so the "
    "segmenter is a 10-word chunker standing in for the paragraph "
    "splitter (the pipeline is splitter-agnostic). The oracle replays "
    "segmentation, global keep-first, and reassembly, checksumming the "
    "rebuilt texts per language; a fully-deduplicated document "
    "contributes a NULL checksum in both engines.",
)
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup — the pass LLM pipelines run BETWEEN
    document-level exact dedup and fuzzy MinHash (boilerplate headers,
    quoted replies, shared license blocks). 100 TB design: one shuffle
    by segment text (the keep-first window), one map-side reassembly
    shuffle by doc_id; no joins against the corpus, no candidate
    explosion — cost is linear in total segments. Near-dup documents
    share long exact word runs here, so kept_chunks < total_chunks is
    exercised for real (~5% of chunks removed at sf0.01; pinned in
    tests/test_dedup.py)."""
    W_SIZE = 10
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    segs = F.expr(
        f"transform(sequence(0, int(ceil(size(split(text, ' ')) / {W_SIZE}.0)) - 1),"
        f" i -> array_join(slice(split(text, ' '), i * {W_SIZE} + 1, {W_SIZE}), ' '))"
    )
    chunks = d.select(
        "doc_id", "lang", F.posexplode(segs).alias("chunk_idx", "seg")
    )
    marked = chunks.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("seg").orderBy("doc_id", "chunk_idx")
        ),
    )
    rebuilt = marked.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1,
                            F.struct("chunk_idx", "seg"),
                        )
                    )
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    out = rebuilt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chunks").cast("long").alias("total_chunks"),
        F.sum("n_kept").cast("long").alias("kept_chunks"),
        F.sum(
            F.when(
                F.col("n_kept") > 0,
                F.conv(
                    F.substring(F.md5("dedup_text"), 1, 8), 16, 10
                ).cast("long"),
            )
        )
        .cast("long")
        .alias("text_chk"),
    )
    return out


_SUBSTR_ORACLE = """
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    occ AS (
      SELECT doc_id, gpos,
             md5(array_to_string(w[gpos + 1 : gpos + 8], ' ')) AS gh
      FROM (SELECT doc_id, w, unnest(range(len(w) - 8 + 1)) AS gpos
            FROM toks WHERE len(w) >= 8)
    ),
    marked AS (
      SELECT doc_id, gpos FROM (
        SELECT doc_id, gpos,
               row_number() OVER (PARTITION BY gh
                                  ORDER BY doc_id, gpos) AS rn
        FROM occ) WHERE rn > 1
    ),
    tok AS (
      SELECT doc_id, lang, w, unnest(range(len(w))) AS tpos FROM toks
    ),
    cov AS (
      SELECT t.doc_id, t.lang, t.tpos, t.w[t.tpos + 1] AS tok,
             max(CASE WHEN m.gpos IS NULL THEN 0 ELSE 1 END) OVER (
               PARTITION BY t.doc_id ORDER BY t.tpos
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS covered
      FROM tok t LEFT JOIN marked m
        ON t.doc_id = m.doc_id AND t.tpos = m.gpos
    ),
    rebuilt AS (
      SELECT doc_id, lang,
             count(*) AS n_tokens,
             sum(covered) AS n_removed,
             string_agg(CASE WHEN covered = 0 THEN tok END, ' '
                        ORDER BY tpos) AS dedup_text
      FROM cov GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_touched,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_removed) AS BIGINT) AS removed_tokens,
           CAST(sum(CASE WHEN n_removed < n_tokens THEN
                CAST(concat('0x', substr(md5(dedup_text), 1, 8)) AS BIGINT)
                END) AS BIGINT) AS text_chk
    FROM rebuilt GROUP BY lang
"""


@query(
    "dedup_exact_substrings",
    _SUBSTR_ORACLE,
    "Exact duplicate-SUBSTRING removal (the suffix-array dedup recipe "
    "of Lee et al. 2021, re-expressed in relational primitives): every "
    "overlapping 8-token span is fingerprinted, each span keeps its "
    "globally FIRST occurrence (ordered by doc_id, position), and every "
    "token covered by a non-first duplicated span is removed — "
    "sub-segment-granular, so boilerplate that straddles paragraph "
    "boundaries (which chunk-level dedup misses) is caught. Documents "
    "are reassembled from surviving tokens; the oracle replays "
    "fingerprinting, global keep-first, window coverage, and "
    "reassembly, checksumming rebuilt texts per language (a fully-"
    "removed document contributes NULL in both engines).",
)
def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB design, where a literal suffix array is a single-machine
    structure: (1) the dedup key is md5(8-token span) — a 32-char
    shuffle key regardless of span text width; (2) first-occurrence is
    groupBy(gh).agg(min(struct(doc,pos))) — map-side partial
    aggregation, so a span duplicated a million times combines per
    partition instead of flooding one reducer the way a row_number
    window would; (3) only TOUCHED documents (those owning a non-first
    occurrence) take the explode -> coverage-window -> reassemble path —
    clean documents (the vast majority of a deduped corpus) pass
    through as one map-side checksum, never exploded to token rows.
    Coverage itself is a linear rows-frame window, not a range join."""
    K = 8
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("w")
    )
    occ = d.where(F.size("w") >= K).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {K}),"
                f" i -> md5(array_join(slice(w, i + 1, {K}), ' ')))"
            )
        ).alias("gpos", "gh"),
    )
    first = occ.groupBy("gh").agg(
        F.min(F.struct("doc_id", "gpos")).alias("keep")
    )
    # r17 (guide §2.4): pinned once — `marked` (the non-first duplicate
    # occurrences, bounded by duplication volume, tiny next to the
    # corpus) used to appear THREE times in the final plan (touched-ids
    # distinct, the clean anti-join, the coverage join), and each copy
    # re-ran the md5-span explode + groupBy + join chain above it.
    marked = (
        occ.join(first, "gh")
        .where(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("gpos") != F.col("keep.gpos"))
        )
        .select("doc_id", "gpos")
        .localCheckpoint(eager=True)
    )
    touched_ids = marked.select("doc_id").distinct()
    clean = d.join(touched_ids, "doc_id", "left_anti").select(
        "lang",
        F.size("w").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_removed"),
        F.conv(
            F.substring(F.md5(F.array_join("w", " ")), 1, 8), 16, 10
        )
        .cast("long")
        .alias("chk"),
    )
    tok = (
        d.join(touched_ids, "doc_id", "left_semi")
        .select("doc_id", "lang", F.posexplode("w").alias("tpos", "tok"))
    )
    m = marked.select(
        F.col("doc_id").alias("m_doc"), F.col("gpos").alias("m_pos")
    )
    joined = tok.join(
        m,
        (F.col("doc_id") == F.col("m_doc"))
        & (F.col("tpos") == F.col("m_pos")),
        "left",
    )
    w_cov = W.partitionBy("doc_id").orderBy("tpos").rowsBetween(-(K - 1), 0)
    cov = joined.select(
        "doc_id",
        "lang",
        "tpos",
        "tok",
        F.max(
            F.when(F.col("m_pos").isNotNull(), 1).otherwise(0)
        )
        .over(w_cov)
        .alias("covered"),
    )
    rebuilt = cov.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("covered").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("covered") == 0, F.struct("tpos", "tok")
                        )
                    )
                ),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    t_stats = rebuilt.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
        F.when(
            F.col("n_removed") < F.col("n_tokens"),
            F.conv(
                F.substring(F.md5("dedup_text"), 1, 8), 16, 10
            ).cast("long"),
        ).alias("chk"),
    )
    return (
        clean.unionByName(t_stats)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_removed") > 0).cast("long"))
            .cast("long")
            .alias("docs_touched"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_removed").cast("long").alias("removed_tokens"),
            F.sum("chk").cast("long").alias("text_chk"),
        )
    )
