"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as `binary` columns with a typed
metadata struct, processed by Arrow-batched pandas functions via
``mapInPandas`` — the Spark-idiomatic shape for per-item media work at
100 TB (each task decodes its partition's batches; nothing ever
collects to the driver).

The decode step itself is a clearly-marked STUB (no image/audio libs in
this container): ``decode_image_stub`` derives deterministic fake
dimensions from the payload bytes, so the Spark-side contract — schema,
batch iteration, partitioning, UDF signature — is real and tested while
the pixel math is not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, source: string>"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "n_frames long, checksum string"
)


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    the text (a stand-in for image bytes), typed metadata attached."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (mapInPandas body). A real pipeline swaps the body for
    PIL/ffmpeg calls; everything around it (Arrow batches in, typed rows
    out) is the production shape.
    """
    import hashlib

    for pdf in batches:
        n = pdf["payload"].map(len)
        # Deterministic fake dimensions derived from payload size — NOT a
        # real decode. Raises for unknown media types like a decoder would.
        if not pdf["media_type"].isin(["image", "audio", "video"]).all():
            raise NotImplementedError("unknown media type in batch")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n.astype("int64"),
                "width": (n % 640 + 16).astype("int64"),
                "height": (n % 480 + 16).astype("int64"),
                "n_frames": (n % 24 + 1).astype("int64"),
                "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


@query(
    "multimodal_decode",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS BIGINT) AS height,
           CAST(octet_length(encode(text)) % 24 + 1 AS BIGINT) AS n_frames,
           md5(text) AS checksum
    FROM documents
    """,
    "Multimodal plumbing: binary payload column + typed metadata -> "
    "mapInPandas decode (STUBBED pixel math, real Spark plumbing). The "
    "deterministic stub is mirrored in SQL for the oracle.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_frame(spark, sf_dir).mapInPandas(decode_image_stub, DECODED_SCHEMA)


RESIZE_TARGET = 224  # max output side (the ImageNet-era convention)


def resize_plan_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize planner (mapInPandas body): aspect-preserving resize
    arithmetic to a {RESIZE_TARGET}-max-side box. The GEOMETRY is real
    (integer math a real thumbnailer would use); only the input
    dimensions come from the fake decode. Integer-exact on purpose so
    both engines agree bit-for-bit."""
    for pdf in batches:
        w, h = pdf["width"], pdf["height"]
        m = w.combine(h, max)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": w.astype("int64"),
                "height": h.astype("int64"),
                "out_w": (w * RESIZE_TARGET // m).astype("int64"),
                "out_h": (h * RESIZE_TARGET // m).astype("int64"),
            }
        )


@query(
    "multimodal_resize",
    f"""
    WITH d AS (SELECT doc_id,
                      CASE WHEN doc_id % 3 = 0 THEN 'image'
                           WHEN doc_id % 3 = 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
                      octet_length(encode(text)) % 640 + 16 AS width,
                      octet_length(encode(text)) % 480 + 16 AS height
               FROM documents)
    SELECT doc_id, media_type,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(width * {RESIZE_TARGET} // greatest(width, height) AS BIGINT)
             AS out_w,
           CAST(height * {RESIZE_TARGET} // greatest(width, height) AS BIGINT)
             AS out_h
    FROM d WHERE media_type = 'image'
    """,
    "Resize-plan plumbing: decode (stub dims) -> aspect-preserving "
    f"{RESIZE_TARGET}-max-side integer resize geometry via a second "
    "mapInPandas stage, images only (filter pushed before the Python "
    "boundary). Integer arithmetic end to end, so the full two-stage "
    "media pipeline is oracle-checkable.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = media_frame(spark, sf_dir).filter(F.col("media_type") == "image")
    decoded = images.mapInPandas(decode_image_stub, DECODED_SCHEMA)
    return decoded.mapInPandas(
        resize_plan_stub,
        "doc_id long, media_type string, width long, height long, "
        "out_w long, out_h long",
    )


N_FEATURE_DIMS = 8


def feature_extract_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB feature extractor (mapInPandas body): 8 integer features per
    item derived from the payload's md5 (consecutive hex-pairs, 0-255).
    A real pipeline swaps this body for a vision/audio encoder emitting
    float vectors; the long-format (doc_id, dim, value) output is the
    lake-friendly at-rest shape that reshapes to array<float> for the
    similarity stack (knn_cosine_*, ann_*)."""
    import hashlib

    for pdf in batches:
        hexes = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
        out = {
            "doc_id": pdf["doc_id"].repeat(N_FEATURE_DIMS).reset_index(drop=True),
            "dim": list(range(N_FEATURE_DIMS)) * len(pdf),
            "value": [
                int(hx[2 * j : 2 * j + 2], 16)
                for hx in hexes
                for j in range(N_FEATURE_DIMS)
            ],
        }
        yield pd.DataFrame(out)


@query(
    "multimodal_feature_extract",
    f"""
    SELECT doc_id, CAST(j AS BIGINT) AS dim,
           CAST(concat('0x', substr(md5(text), 2 * j + 1, 2)) AS BIGINT)
             AS value
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, {N_FEATURE_DIMS})) AS j) dims
    WHERE doc_id % 3 = 0
    """,
    "Feature-extraction plumbing: image payloads -> mapInPandas encoder "
    "stub -> long-format (doc_id, dim, value) features. The stub derives "
    "integer features from the payload md5, so the Arrow-batched "
    "extraction pipeline is exactly reproducible in SQL; a real encoder "
    "replaces only the batch body.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = media_frame(spark, sf_dir).filter(F.col("media_type") == "image")
    return images.mapInPandas(
        feature_extract_stub, "doc_id long, dim long, value long"
    )


N_HIST_BINS = 16


def byte_histogram_encoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """A small REAL numpy encoder (round-5 VERDICT #8 — not a stub): the
    L1-normalized 16-bin histogram of the payload's high byte nibbles,
    emitted as a float embedding. It is what a trivial content-based
    image/audio signature looks like before a learned encoder exists —
    and because it is pure integer counting + one float division, the
    whole embed->search pipeline stays SQL-reproducible. A production
    encoder (CLIP, wav2vec) swaps this body and keeps the signature:
    Arrow batches of (doc_id, payload) in, (doc_id, array<double>) out.
    """
    import numpy as np

    def _vec(b):
        c = np.bincount(
            np.frombuffer(bytes(b), dtype=np.uint8) >> 4,
            minlength=N_HIST_BINS,
        ).astype(np.float64)
        s = c.sum()
        # empty payload -> uniform distribution, NOT 0/0 NaNs (a NaN
        # embedding would seize top-k slots under Spark's NaN-is-greatest
        # ordering; round-6 review). The registered pipeline also filters
        # empty payloads out before encoding, matching its oracle.
        if s == 0:
            return np.full(N_HIST_BINS, 1.0 / N_HIST_BINS).tolist()
        return (c / s).tolist()

    for pdf in batches:
        vecs = [_vec(b) for b in pdf["payload"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": vecs})


@query(
    "multimodal_embed_knn",
    """
    WITH img AS (SELECT doc_id, text FROM documents
                 WHERE doc_id % 3 = 0 AND length(text) > 0),
    ch AS (SELECT img.doc_id, ord(substr(img.text, i.i, 1)) // 16 AS bin
           FROM img CROSS JOIN LATERAL
                (SELECT unnest(range(1, length(img.text) + 1)) AS i) i),
    hist AS (SELECT doc_id, bin, CAST(count(*) AS DOUBLE) AS c
             FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, sum(c) AS t FROM hist GROUP BY 1),
    qv AS (SELECT h.bin, h.c / t.t AS x
           FROM hist h JOIN tot t USING (doc_id) WHERE h.doc_id = 0),
    qn AS (SELECT sqrt(sum(x * x)) AS qnorm FROM qv),
    cv AS (SELECT h.doc_id, h.bin, h.c / t.t AS x
           FROM hist h JOIN tot t USING (doc_id) WHERE h.doc_id <> 0),
    cn AS (SELECT doc_id, sqrt(sum(x * x)) AS cnorm FROM cv GROUP BY 1),
    dots AS (SELECT cv.doc_id, sum(cv.x * qv.x) AS dp
             FROM cv JOIN qv USING (bin) GROUP BY 1)
    SELECT d.doc_id,
           round(d.dp / (cn.cnorm * (SELECT qnorm FROM qn)), 4) AS cos_sim
    FROM dots d JOIN cn USING (doc_id)
    ORDER BY cos_sim DESC, doc_id
    LIMIT 10
    """,
    "The multimodal embed->search composition: image payloads -> "
    "mapInPandas numpy encoder (16-bin byte histogram, L1-normalized) -> "
    "brute-force cosine top-10 vs the doc_id=0 query image via the "
    "similarity stack. The encoder is real numpy (bincount + divide), "
    "so the DuckDB oracle replays the histogram, normalization, and "
    "ranking byte-for-byte (ASCII payloads: ord(char) == byte).",
)
def multimodal_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the encoder is a map-only Arrow-batched pass over image
    payloads (media-type filter pushed before the Python boundary); the
    query vector broadcasts; scoring is one corpus pass with
    TakeOrderedAndProject top-k — the knn_cosine_topk shape fed by a
    media encoder instead of a stored embedding column. Swap the
    brute-force tail for the multi-probe LSH path (ann_multiprobe_topk)
    when the encoded corpus outgrows one scan per query."""
    from .similarity import _cos, _with_norm

    images = media_frame(spark, sf_dir).filter(
        (F.col("media_type") == "image") & (F.length("payload") > 0)
    )
    enc_schema = "doc_id long, embedding array<double>"
    # The doc_id filters sit BEFORE the Python boundary on both branches
    # (they cannot push through an opaque mapInPandas): the query branch
    # encodes exactly one payload instead of re-encoding the corpus —
    # pinned in tests/test_plans.py.
    v = _with_norm(
        images.filter(F.col("doc_id") != 0).mapInPandas(
            byte_histogram_encoder, enc_schema
        )
    )
    q = _with_norm(
        images.filter(F.col("doc_id") == 0).mapInPandas(
            byte_histogram_encoder, enc_schema
        )
    ).select(F.col("embedding").alias("qe"), F.col("norm").alias("qnorm"))
    return (
        v
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.round(
                _cos(F.col("embedding"), F.col("qe"), F.col("norm"), F.col("qnorm")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(10)
    )


@query(
    "multimodal_frame_sample",
    """
    SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no
    FROM (SELECT doc_id,
                 octet_length(encode(text)) % 24 + 1 AS n_frames
          FROM documents WHERE doc_id % 3 = 2) v,
         LATERAL (SELECT unnest(range(0, CAST(n_frames AS BIGINT), 4))
                  AS frame_no) f
    """,
    "Frame sampling plumbing: per-media-type partitions, every k-th "
    "'frame' index materialized as (doc_id, frame_no) — the explode shape "
    "a video pipeline uses before per-frame feature extraction. The stub "
    "decode is deterministic, so the whole pipeline is oracle-checkable.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # media_type is derivable pre-decode, so filter BEFORE mapInPandas:
    # only video payloads cross the Arrow/Python boundary (~1/3 of bytes).
    # Round-1 ADVICE: decoding everything then filtering wasted 2/3 of the
    # Python traffic at scale.
    video = media_frame(spark, sf_dir).filter(F.col("media_type") == "video")
    decoded = video.mapInPandas(decode_image_stub, DECODED_SCHEMA)
    return (
        decoded
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))).alias("frame_no"),
        )
    )


# ------------------------------------------------ perceptual-hash dedup

PHASH_CELLS = 64  # the classic aHash 8x8 grid, flattened
PHASH_BAND_BITS = 16  # 4 bands of 16 bits
# Pigeonhole over 4 bands: <= 3 flipped bits CANNOT touch all 4 bands,
# so every pair within hamming 3 is GUARANTEED a shared-band candidate.
# Pairs at hamming 4..PHASH_HAMMING_MAX surface only when some band
# happens to survive untouched — the standard LSH recall trade
# (round-15 review: the earlier comment overstated this as a
# guarantee). The verify cutoff stays 6 so those best-effort
# candidates are kept once found.
PHASH_HAMMING_MAX = 6


def ahash_encoder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Average-hash (aHash) over the payload BYTE GRID — the perceptual
    fingerprint step of image near-dup (mapInPandas body; Arrow batches
    in, one fingerprint row out per item). A real pipeline decodes
    pixels and downsamples the 2-D image to the 8x8 grid; here the
    payload bytes ARE the grid source (the same honest-stub rule as
    decode_image_stub: the hash MATH is real, the pixels are not).

    The math, integer-exact so the DuckDB oracle replays it bit for
    bit: partition the n payload bytes into 64 cells by
    cell(i) = (i * 64) // n, and set bit j iff cell j's byte mean
    exceeds the payload's global byte mean — compared as the cross
    product S_j * n > T * k_j (cell sum, total sum, cell count: no
    float division anywhere, so no engine-rounding flip at the
    threshold). Bits pack into four 16-bit band keys — the banding
    unit AND a sign-safe layout (no 64-bit hash ever goes negative)."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
            n = len(a)
            cell = (np.arange(n) * PHASH_CELLS) // n
            s = np.bincount(cell, weights=a, minlength=PHASH_CELLS).astype(
                np.int64
            )
            k = np.bincount(cell, minlength=PHASH_CELLS).astype(np.int64)
            bits = (s * n > int(a.sum()) * k).astype(np.int64)
            out["doc_id"].append(doc_id)
            for b in range(4):
                out[f"b{b}"].append(
                    int(
                        sum(
                            int(bits[PHASH_BAND_BITS * b + j]) << j
                            for j in range(PHASH_BAND_BITS)
                        )
                    )
                )
        yield pd.DataFrame(out)


_PHASH_ORACLE = f"""
    WITH img0 AS (SELECT doc_id, text FROM documents
                  WHERE doc_id % 3 = 0 AND length(text) >= {PHASH_CELLS}),
    corpus AS (SELECT doc_id, text FROM img0
               UNION ALL
               SELECT doc_id + 9000000 AS doc_id,
                      concat('~', substr(text, 2)) AS text
               FROM img0),
    bytes AS (SELECT c.doc_id,
                     ((i.i - 1) * {PHASH_CELLS}) // length(c.text) AS cell,
                     ord(substr(c.text, i.i, 1)) AS b,
                     length(c.text) AS n
              FROM corpus c CROSS JOIN LATERAL
                   (SELECT unnest(range(1, length(c.text) + 1)) AS i) i),
    cells AS (SELECT doc_id, n, cell, CAST(sum(b) AS BIGINT) AS s,
                     CAST(count(*) AS BIGINT) AS k
              FROM bytes GROUP BY 1, 2, 3),
    tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS t
            FROM cells GROUP BY 1),
    bits AS (SELECT c.doc_id, c.cell,
                    CASE WHEN c.s * c.n > t.t * c.k THEN 1 ELSE 0 END AS bit
             FROM cells c JOIN tot t USING (doc_id)),
    bands AS (SELECT doc_id, cell // {PHASH_BAND_BITS} AS band,
                     CAST(sum(CAST(bit AS BIGINT)
                              << (cell % {PHASH_BAND_BITS})) AS BIGINT)
                       AS key
              FROM bits GROUP BY 1, 2),
    sig AS (SELECT doc_id,
                   max(CASE WHEN band = 0 THEN key END) AS b0,
                   max(CASE WHEN band = 1 THEN key END) AS b1,
                   max(CASE WHEN band = 2 THEN key END) AS b2,
                   max(CASE WHEN band = 3 THEN key END) AS b3
            FROM bands GROUP BY 1),
    hot AS (SELECT band, key FROM bands GROUP BY band, key
            HAVING count(*) > 128),
    bk AS (SELECT bands.* FROM bands ANTI JOIN hot USING (band, key))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
                + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                AS BIGINT) AS hamming
    FROM bk a JOIN bk b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    JOIN sig sa ON sa.doc_id = a.doc_id
    JOIN sig sb ON sb.doc_id = b.doc_id
    WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
          + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
          <= {PHASH_HAMMING_MAX}
    ORDER BY doc_a, doc_b
"""


@query(
    "dedup_phash_images",
    _PHASH_ORACLE,
    "Perceptual-hash IMAGE near-dup (round-15; r14 What's missing #3): "
    "aHash fingerprints over the payload byte grid (integer-exact "
    "cell-mean-vs-global-mean bits, mapInPandas kernel) banded into "
    "the simhash hamming machinery — 4 bands of 16 bits, any band "
    "equal => candidate, hot buckets capped, verify hamming <= 6. The "
    "corpus plants a near-identical copy of every image (first byte "
    "replaced), so the pairs are binding: every planted pair lands "
    "within 3 flipped bits and must surface; unrelated images must "
    "not.",
)
def dedup_phash_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one dedup-family member the multimodal side lacked: "two
    images that LOOK the same" at training-data scale. Scale shape is
    exactly dedup_simhash's (operators/dedup.py): the encoder is one
    map-only Arrow pass over image payloads, banding is linear in
    (items x 4) band rows, the self-join shuffles on (band, key) with
    degenerate buckets capped at 128 (a corpus of d exact copies costs
    d capped-bucket rows, never d^2 pairs — collapse exact payload
    dups first via dedup_exact when d is expected large), and the
    hamming verify touches candidates only. A real deployment swaps
    the byte grid for decoded 8x8 grayscale; nothing else changes."""
    from .dedup import _drop_hot_buckets

    # The fixture synthesizes payloads from the TEXT column on both
    # branches (phash_corpus below; not decode(payload), which would
    # mangle a genuinely binary payload and diverge from the oracle's
    # per-character arithmetic on non-ASCII text — round-15 review
    # finding #3); the length filter counts characters, exactly like
    # the oracle. The OPERATOR itself (encoder + banding + verify)
    # consumes opaque bytes and never depends on this fixture shape.
    corpus = phash_corpus(spark, sf_dir)
    return _phash_selfjoin_pairs(corpus)


def _phash_selfjoin_pairs(corpus: DataFrame) -> DataFrame:
    """Encode -> band -> capped self-join -> hamming verify: the
    one-shot batch pipeline shared by dedup_phash_images and the
    exact-collapse composition (dedup_phash_collapsed)."""
    from .dedup import _drop_hot_buckets

    sig = corpus.mapInPandas(
        ahash_encoder, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    ).cache()  # both sides of the band self-join
    sig.count()  # eager — same reason as dedup_minhash_lsh
    exploded = sig.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "key"),
    )
    exploded = _drop_hot_buckets(exploded, ["band", "key"], 128)
    a, b = exploded.alias("a"), exploded.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.b{i}").bitwiseXOR(F.col(f"b.b{i}")))
        for i in range(4)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


PHASH_EXACT_COPY_OFFSET = 18000000

_PHASH_COLLAPSED_ORACLE = _PHASH_ORACLE.replace(
    """    corpus AS (SELECT doc_id, text FROM img0
               UNION ALL
               SELECT doc_id + 9000000 AS doc_id,
                      concat('~', substr(text, 2)) AS text
               FROM img0),""",
    f"""    corpus0 AS (SELECT doc_id, text FROM img0
                UNION ALL
                SELECT doc_id + 9000000 AS doc_id,
                       concat('~', substr(text, 2)) AS text
                FROM img0),
    corpus_all AS (SELECT doc_id, text FROM corpus0
                   UNION ALL
                   SELECT doc_id + {PHASH_EXACT_COPY_OFFSET} AS doc_id,
                          text
                   FROM corpus0),
    corpus AS (SELECT doc_id, text FROM (
                 SELECT doc_id, text, row_number() OVER (
                     PARTITION BY md5(text) ORDER BY doc_id) AS rn
                 FROM corpus_all) WHERE rn = 1),""",
)


@query(
    "dedup_phash_collapsed",
    _PHASH_COLLAPSED_ORACLE,
    "Exact-then-near IMAGE dedup composition (round-16; r15 What's "
    "missing #3): collapse byte-identical payloads to their lowest-id "
    "representative FIRST (one content-hash shuffle — the dedup_exact "
    "stage's output), then run the phash banding pipeline over "
    "representatives only. The corpus plants an exact copy of EVERY "
    "image (doc_id + 18000000), so the collapse binds: d exact copies "
    "contribute ONE member per bucket instead of d (the d^2 "
    "bucket-pair hazard the dedup_phash_images docstring routes "
    "around), and the result equals the copy-free corpus's pairs "
    "exactly. The oracle mirrors the collapse as the md5-partitioned "
    "row_number CTE (the r6 minhash precedent, REPS_CTE).",
)
def dedup_phash_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition dedup_phash_images' docstring ADVISES for
    high-multiplicity corpora, shipped as an operator (r6 precedent:
    dedup_minhash_lsh collapses before banding). Scale: the collapse
    is one md5(payload) shuffle with a per-content row_number (the
    exact-dedup cost model — d copies cost d rows, never d^2 pairs);
    banding then sees only distinct-content representatives, so
    sum(bucket^2) is that of the deduplicated corpus regardless of
    copy multiplicity. Exact copies of a kept representative are the
    EXACT stage's removals (dedup_exact emits them); near-dup pairs
    here are between distinct contents only."""
    from .dedup import collapse_exact_duplicates

    corpus = phash_corpus(spark, sf_dir)
    with_copies = corpus.unionByName(
        corpus.select(
            (F.col("doc_id") + PHASH_EXACT_COPY_OFFSET).alias("doc_id"),
            "payload",
        )
    )
    reps = collapse_exact_duplicates(
        with_copies, id_col="doc_id", text_col="payload"
    )
    return _phash_selfjoin_pairs(reps)


PHASH_INDEX_SHARDS = 16  # shard = key % 16 — planning-time prunable


def phash_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted phash test corpus shared by the batch-mode query
    and the persisted-index probe: every image payload plus a
    near-identical sibling (doc_id + 9000000, first byte replaced).
    9000000 % 4 == 0, so a sibling shares its source's batch class
    under the probe query's doc_id % 4 split."""
    img0 = (
        load(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % 3 == 0) & (F.length("text") >= PHASH_CELLS)
        )
        .select("doc_id", "text")
    )
    return img0.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    ).unionByName(
        img0.select(
            (F.col("doc_id") + 9000000).alias("doc_id"),
            F.encode(
                F.concat(F.lit("~"), F.expr("substring(text, 2)")), "utf-8"
            ).alias("payload"),
        )
    )


def explode_phash_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, b0..b3) -> one row per band with the banding key in
    the shared ``bucket`` column (the dedup.incremental_band_pairs
    contract), carrying the full signature so hamming verification
    never re-reads payloads."""
    return sig.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band", "bucket"
        ),
    )


def append_phash_index(
    index_path: str, sig: DataFrame | None, bands: DataFrame | None = None
) -> None:
    """Append a batch's phash band rows to the persisted, shard-
    partitioned image-dedup index — the at-rest form (the
    append_minhash_index pattern): ``shard=K/`` hive partitions of
    (doc_id, b0..b3, band, bucket) rows, shard = bucket % 16, so a
    probe prunes to its buckets' shards at PLANNING time. The stored
    rows carry the full 64-bit signature (as the 4 band values), so
    hamming verification reads the index, never historical payloads.
    Append-only: one partitioned parquet append per batch (4 rows per
    image).

    ``bands``: a precomputed (already pinned) band table — skips
    re-deriving it from ``sig``. Write fanout bounded to cores/8 tasks
    for the same fixed-committer-cost reason as append_minhash_index
    (r16, guide §6)."""
    if bands is None:
        bands = explode_phash_bands(sig).withColumn(
            "shard", F.col("bucket") % PHASH_INDEX_SHARDS
        )
    spark = bands.sparkSession
    n_tasks = max(1, spark.sparkContext.defaultParallelism // 8)
    (
        bands.select("doc_id", "b0", "b1", "b2", "b3", "band", "bucket", "shard")
        .repartition(n_tasks, "shard")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(index_path)
    )


def probe_phash_index(
    spark: SparkSession,
    index_path: str,
    batch_sig: DataFrame,
    max_bucket_size: int | None = 128,
    deterministic_cap: int | None = None,
    checkpoint_bands: bool = True,
) -> DataFrame:
    """Candidate pairs for an image batch against the PERSISTED index:
    the batch's band rows are computed (4 per image), their shard set
    collected (an O(16) collect), and the index scan prunes to those
    shard directories at planning time. Returns (doc_a, doc_b)
    candidates touching the batch only — historical-vs-historical
    pairs were found when those images arrived.

    ``checkpoint_bands=False``: skip pinning the band table — correct
    (and one job cheaper, r16 guide §2.4) when ``batch_sig`` is
    ALREADY pinned (cached or checkpointed), because the band explode
    is then a trivial projection to recompute; leave True when the
    signature plan is expensive (it would otherwise re-run per
    consumer)."""
    from pathlib import Path

    from .dedup import incremental_band_pairs

    batch_bands = explode_phash_bands(batch_sig).withColumn(
        "shard", F.col("bucket") % PHASH_INDEX_SHARDS
    )
    if checkpoint_bands:
        batch_bands = batch_bands.localCheckpoint(eager=True)
    shards = [
        r.shard for r in batch_bands.select("shard").distinct().collect()
    ]
    has_files = any(Path(index_path).rglob("*.parquet"))
    if has_files:
        index_bands = (
            spark.read.parquet(index_path)
            .filter(F.col("shard").isin(shards))
            .select("doc_id", "band", "bucket")
        )
    else:
        index_bands = batch_bands.select("doc_id", "band", "bucket").limit(0)
    return incremental_band_pairs(
        batch_bands.select("doc_id", "band", "bucket"),
        index_bands,
        batch_sig.select("doc_id"),
        "doc_id",
        max_bucket_size,
        deterministic_cap,
    )


_PHASH_INCR_ORACLE = _PHASH_ORACLE.replace(
    "AND a.doc_id < b.doc_id",
    "AND a.doc_id < b.doc_id\n"
    "     AND (a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)",
)


@query(
    "dedup_phash_index_probe",
    _PHASH_INCR_ORACLE,
    "Incremental image near-dup against the PERSISTED phash index "
    "(round-15): historical images' band rows live as a "
    "shard-partitioned parquet index (shard = key % 16, carrying the "
    "full signature), the batch (doc_id % 4 = 0) probes it FROM DISK "
    "with planning-time shard pruning, and only pairs TOUCHING the "
    "batch are generated — historical-vs-historical pairs were found "
    "when those images arrived. Hamming verifies from STORED "
    "signatures; historical payloads are never re-read or re-encoded. "
    "Same constants as dedup_phash_images, so the oracle is that "
    "query's SQL plus the batch restriction as one predicate.",
)
def dedup_phash_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest/incremental form of the image-dedup story — the
    shape a production ingest runs per batch: O(|batch| x 4) band
    rows + one O(16) shard collect + a pruned index read; appending
    the batch afterwards is one partitioned parquet append. The
    minhash family's incremental machinery (incremental_band_pairs:
    union-capped hot buckets, batch-touching pairs only) is reused
    verbatim — banding is banding, whatever produced the keys."""
    from ..scratch import scratch_dir

    sig = (
        phash_corpus(spark, sf_dir)
        .mapInPandas(
            ahash_encoder,
            "doc_id long, b0 long, b1 long, b2 long, b3 long",
        )
        .cache()
    )
    sig.count()  # eager — feeds the index write AND the batch probe
    index_path = scratch_dir("phash_index_") + "/bands"
    append_phash_index(index_path, sig.filter(F.col("doc_id") % 4 != 0))
    batch_sig = sig.filter(F.col("doc_id") % 4 == 0)
    pairs = probe_phash_index(spark, index_path, batch_sig).cache()
    pairs.count()
    # hamming verification from STORED signatures (shared helper —
    # the streaming sink runs the identical verify per micro-batch)
    return (
        _phash_verify_pairs(spark, pairs, batch_sig, index_path)
        .orderBy("doc_a", "doc_b")
    )


PHASH_SIG_SCHEMA = "doc_id long, b0 long, b1 long, b2 long, b3 long"


def _phash_verify_pairs(
    spark: SparkSession, pairs: DataFrame, batch_sig: DataFrame, idx: str
) -> DataFrame:
    """Hamming-verify candidate pairs from STORED signatures: the
    batch's own plus the index rows semi-joined to the candidates'
    members — historical payloads are never re-read or re-encoded."""
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    from pathlib import Path

    if any(Path(idx).rglob("*.parquet")):
        idx_sig = (
            spark.read.parquet(idx)
            .select("doc_id", "b0", "b1", "b2", "b3")
            .join(F.broadcast(members), "doc_id", "left_semi")
            .distinct()
        )
        sig_all = batch_sig.unionByName(idx_sig).distinct()
    else:
        sig_all = batch_sig
    ha, hb = sig_all.alias("ha"), sig_all.alias("hb")
    hamming = sum(
        F.bit_count(F.col(f"ha.b{i}").bitwiseXOR(F.col(f"hb.b{i}")))
        for i in range(4)
    )
    return (
        pairs.join(ha, F.col("doc_a") == F.col("ha.doc_id"))
        .join(hb, F.col("doc_b") == F.col("hb.doc_id"))
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


PHASH_STREAM_CAP = 128  # keep-lowest-K deterministic hot-bucket cap


def phash_stream_sink(spark: SparkSession, idx: str, out: str):
    """The per-batch body of :func:`stream_phash_dedup` as a reusable
    foreachBatch sink: encode the arriving images (one Arrow pass),
    probe the persisted band index under the DETERMINISTIC hot-bucket
    cap (keep the PHASH_STREAM_CAP lowest doc_ids per bucket — a pure
    function of the visible member set, so a pathological bucket of d
    near-identical images costs an O(d log d) sort and at most cap^2
    candidate pairs per epoch, never d^2; round-15 ran this probe
    UNCAPPED), hamming-verify from stored signatures, append the
    verified pairs and the batch's own band rows. Per-epoch kept sets
    shrink as buckets fill, so the raw union over epochs can contain
    pairs whose endpoint was later evicted; the final-membership
    filter in stream_phash_dedup removes exactly those, restoring
    equality with the one-shot capped run (proof sketch on
    dedup.keep_lowest_k_per_bucket).

    Replay-safe (foreachBatch delivery is at-least-once): every output
    of epoch K lands in an epoch-deterministic ``batch=K`` directory
    with overwrite semantics, and the batch's own index slice is
    removed before probing — a re-delivered epoch overwrites exactly
    its prior partial output and never finds itself in the index."""

    def process(batch: DataFrame, bid: int) -> None:
        import shutil

        idir = f"{idx}/batch={bid}"
        pdir = f"{out}/batch={bid}"
        shutil.rmtree(idir, ignore_errors=True)
        # r16 (guide §2.4): encode in ONE job — the repartition spread
        # feeds the Arrow encoder directly instead of being pinned by
        # its own checkpoint first; with sig pinned, the band explode
        # is a trivial projection, so the probe's internal band
        # checkpoint is skipped too (2 fewer jobs per epoch, encode
        # still exactly once per image).
        sig = (
            batch.repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(ahash_encoder, PHASH_SIG_SCHEMA)
            .localCheckpoint(eager=True)
        )
        pairs = probe_phash_index(
            spark,
            idx,
            sig,
            max_bucket_size=None,
            deterministic_cap=PHASH_STREAM_CAP,
            checkpoint_bands=False,
        )
        _phash_verify_pairs(spark, pairs, sig, idx).write.mode(
            "overwrite"
        ).parquet(pdir)
        append_phash_index(idir, sig)

    return process


_PHASH_STREAM_ORACLE = _PHASH_ORACLE.replace(
    """    hot AS (SELECT band, key FROM bands GROUP BY band, key
            HAVING count(*) > 128),
    bk AS (SELECT bands.* FROM bands ANTI JOIN hot USING (band, key))""",
    """    bk AS (SELECT doc_id, band, key FROM (
              SELECT bands.*, row_number() OVER (
                  PARTITION BY band, key ORDER BY doc_id) AS rk
              FROM bands) WHERE rk <= 128)""",
)


@query(
    "stream_phash_dedup",
    _PHASH_STREAM_ORACLE,
    "STREAMING image near-dup (round-15; round-16 adds the "
    "deterministic hot-bucket cap): the image corpus arrives as 3 "
    "micro-batches; each batch encodes its payloads once, probes the "
    "persisted shard-partitioned phash index (bootstrapped empty) "
    "under the keep-lowest-128-doc_ids-per-bucket cap, hamming-"
    "verifies from stored signatures, appends verified pairs to a "
    "result sink and its own band rows to the index. A pair is "
    "emitted in the batch its LATER member arrived with; the final "
    "read filters the union by FINAL kept membership, which makes "
    "the result exactly the one-shot capped run regardless of batch "
    "boundaries — mirrored in the oracle as row_number() <= 128 per "
    "(band, key) ordered by doc_id.",
)
def stream_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arrival protocol on top of the at-rest phash index — the
    stream_minhash_dedup shape for the multimodal family. Scale: per
    batch O(|batch| x 4) probe rows against shard-pruned index
    partitions, each image ENCODED exactly once (its signature is the
    only state verification ever needs — stored in the index rows
    themselves, so there is no separate set store at all); the result
    sink and index grow by appends only; nothing in the loop scans
    the full corpus. Round-16: the probe runs CAPPED (r15 ran it
    uncapped — a pathological hot bucket cost O(d^2) candidate pairs
    per batch); the keep-lowest-k rule bounds per-epoch work at
    cap^2 pairs per bucket, and the final-membership filter (an
    O(pairs x 4) join against the final kept band set) restores
    exact batch-boundary-independent equality with the one-shot
    capped run — the eviction-superset argument is written on
    dedup.keep_lowest_k_per_bucket."""
    from ..scratch import scratch_dir
    from .streaming_ops import cdc_land_change_files

    corpus = phash_corpus(spark, sf_dir)
    base = scratch_dir("stream_phash_")
    src = f"{base}/incoming"
    idx = f"{base}/index"
    out = f"{base}/pairs"
    cdc_land_change_files(corpus, src, base, n=3, key_col="doc_id")
    # r17: the sink body's batch jobs (probe joins, verify, final
    # window) plan at spark.sql.shuffle.partitions with NO AQE
    # coalescing inside foreachBatch — 32 near-empty tasks per shuffle
    # per epoch. Same input-size-derived width policy as the stateful
    # streams (streaming.events.stream_state_partitions); the encode
    # spread keeps its own explicit cores-wide repartition.
    from ..streaming.events import (
        _with_shuffle_width,
        source_bytes,
        stream_state_partitions,
    )

    width = stream_state_partitions(spark, source_bytes(src))
    with _with_shuffle_width(spark, width):
        (
            spark.readStream.schema(corpus.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(src)
            .writeStream.foreachBatch(phash_stream_sink(spark, idx, out))
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    from .dedup import keep_lowest_k_per_bucket

    union_pairs = spark.read.schema(
        "doc_a long, doc_b long, hamming long"
    ).parquet(f"{out}/batch=*")
    # Final-membership filter: keep only pairs whose BOTH endpoints
    # are among the final kept (lowest-cap) members of a shared
    # bucket. Every such pair was provably emitted (both endpoints
    # were visible and kept when the later one arrived), and every
    # union extra has an evicted endpoint — so this equals the
    # one-shot capped run exactly, independent of batch boundaries.
    kept = keep_lowest_k_per_bucket(
        spark.read.parquet(idx).select("doc_id", "band", "bucket"),
        ["band", "bucket"],
        "doc_id",
        PHASH_STREAM_CAP,
    )
    kept_a = kept.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
    kept_b = kept.select(
        F.col("doc_id").alias("doc_b"), "band", "bucket"
    )
    return (
        union_pairs.join(kept_a, "doc_a")
        .join(kept_b, ["doc_b", "band", "bucket"], "left_semi")
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )
