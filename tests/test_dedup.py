"""Dedup-family behavior tests on crafted near-duplicates (the synthetic
documents corpus is all-distinct, so exactness is proven here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
    jaccard_verify,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the tall green trees "
    "near the old stone bridge across the quiet river in the morning sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate
        (3, BASE.replace("morning", "evening")),  # near-dup (1 token of ~40)
        (4, "completely different content about spark query engines and "
            "distributed columnar execution with adaptive partitioning"),
        (5, BASE.replace("the", "a")),  # moderately different
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_near_dups(docs):
    sig = minhash_signatures(docs)
    pairs = minhash_candidate_pairs(sig)
    verified = jaccard_verify(pairs, docs, threshold=0.8)
    found = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert (1, 2) in found  # exact dup must be found
    assert (1, 3) in found and (2, 3) in found  # near-dup found
    assert not any(4 in p for p in found)  # unrelated doc never pairs


def test_minhash_jaccard_value(docs):
    sig = minhash_signatures(docs)
    pairs = minhash_candidate_pairs(sig)
    verified = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_verify(pairs, docs, 0.0).collect()}
    assert verified[(1, 2)] == 1.0


def test_simhash_hamming(spark, docs):
    sig = simhash_signatures(docs)
    by_id = {r.doc_id: r.simhash for r in sig.collect()}
    assert by_id[1] == by_id[2]  # identical text -> identical simhash
    ham13 = bin(by_id[1] ^ by_id[3]).count("1")
    ham14 = bin(by_id[1] ^ by_id[4]).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated
    assert ham13 <= 6


def test_exact_dedup_on_crafted(spark, docs):
    grouped = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
    )
    rows = {r.keeper: r.n for r in grouped.collect()}
    assert rows[1] == 2  # docs 1+2 collapse
    assert rows[3] == 1 and rows[4] == 1 and rows[5] == 1


def test_ngram_jaccard_on_crafted(docs):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    found = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    # exact duplicates collapse to one representative pre-banding
    # (intra-duplicate pairs are exact-dedup's output), so doc 2 — an
    # exact copy of doc 1 — appears in NO pair; its near-dup relation
    # is represented through doc 1
    assert (1, 2) not in found
    assert (1, 3) in found  # near-dup (1 token changed) via the rep
    assert not any(2 in p or 4 in p for p in found)


def test_hot_bucket_cap_bounds_degenerate_corpus(spark):
    # 500 identical short docs share every LSH bucket: without the cap the
    # bucket self-join is O(m^2) on one key (~125k pairs per band). With
    # DEFAULT_MAX_BUCKET the degenerate buckets are dropped entirely —
    # candidate generation returns no pairs (exact dedup's job) and the
    # job completes with bounded work.
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    rows = [(i, "boilerplate header lorem ipsum dolor sit amet footer") for i in range(500)]
    degen = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(degen)
    assert minhash_candidate_pairs(sig).count() == 0
    # uncapped path still works when explicitly requested
    assert minhash_candidate_pairs(sig.limit(20), max_bucket_size=None).count() > 0
    # every shingle of the degenerate corpus is hot -> no pairs either
    assert ngram_jaccard_pairs(degen).count() == 0


def test_simhash_pairs_capped_on_degenerate_corpus(spark, sf_dir):
    # The registered simhash query must complete on a corpus where all
    # docs collide in every banding chunk; the cap drops those buckets.
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        SIMHASH_CHUNK_BITS, simhash_signatures, _drop_hot_buckets,
    )

    rows = [(i, "same text everywhere forever") for i in range(300)]
    degen = spark.createDataFrame(rows, "doc_id long, text string")
    sig = simhash_signatures(degen)
    mask = (1 << SIMHASH_CHUNK_BITS) - 1
    chunked = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), c * SIMHASH_CHUNK_BITS)
                    .bitwiseAND(F.lit(mask)).alias("key"),
                )
                for c in range(4)
            ])
        ).alias("ck"),
    ).select("doc_id", "ck.chunk", "ck.key")
    assert _drop_hot_buckets(chunked, ["chunk", "key"], 128).count() == 0


def test_dedup_embedding_cosine_precision_subset(spark, sf_dir):
    # The bucketed operator scores candidates EXACTLY, so its output must
    # be a strict subset of the brute-force baseline (precision 1.0) —
    # same rows, same cos_sim values, possibly fewer pairs (recall < 1).
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    brute = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in REGISTRY["dedup_embedding_bruteforce"].builder(spark, sf_dir).collect()
    }
    bucketed = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in REGISTRY["dedup_embedding_cosine"].builder(spark, sf_dir).collect()
    }
    assert bucketed, "bucketed dedup returned no pairs"
    assert set(bucketed) <= set(brute)
    for pair, sim in bucketed.items():
        assert sim == brute[pair], pair


def test_dedup_embedding_cosine_recall_on_planted(spark):
    # In the near-dup regime (cos ~ 1) banding recall is ~1: every
    # planted duplicate pair must be found. Deterministic (fixed seed,
    # hash-derived hyperplanes).
    import numpy as np

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        embedding_cosine_pairs_bruteforce,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.similarity import (
        _cos, _with_norm, lsh_candidate_pairs,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(23)
    rows = []
    for i in range(40):
        base = rng.normal(size=16)
        rows.append((i, base.tolist()))
        if i < 15:
            rows.append((100 + i, (base + rng.normal(scale=0.001, size=16)).tolist()))
    v = _with_norm(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    pairs = lsh_candidate_pairs(v, dim=16)
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("norm").alias("na"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("norm").alias("nb"))
    found = {
        (r.vec_a, r.vec_b)
        for r in pairs.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                _cos(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.99)
        .collect()
    }
    planted = {(i, 100 + i) for i in range(15)}
    assert planted <= found, sorted(planted - found)
    # and brute force at the same threshold finds exactly the planted set
    brute = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_pairs_bruteforce(v, 0.99).collect()
    }
    assert brute == planted


def test_shingle_containment_finds_embedded_doc(spark):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    big = BASE + " " + BASE.replace("fox", "hare").replace("river", "canal")
    small = BASE  # fully embedded prefix of big
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated words about columnar engines "
                                   "and shuffle services in the cloud "
                                   "running adaptive skew mitigation")],
        "doc_id long, text string",
    )
    rows = {(r.doc_a, r.doc_b): r for r in
            shingle_containment_pairs(docs, threshold=0.9).collect()}
    assert (1, 2) in rows
    # every shingle of the small doc appears in the big one
    assert rows[(1, 2)].contain_a_in_b == 1.0
    assert rows[(1, 2)].contain_b_in_a < 0.8
    # symmetric Jaccard misses the same embedded pair at its threshold
    jac = {(r.doc_a, r.doc_b) for r in
           ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    assert (1, 2) not in jac
    assert (1, 3) not in rows and (2, 3) not in rows


def test_semantic_dedup_invariants(spark, sf_dir):
    """Every removal points at a strictly-lower-id keeper in the same
    cluster with similarity above the threshold, and removal is closed
    under the in-cluster near-dup relation: a vector similar to any
    lower-id co-clustered vector MUST be marked."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.semantic import (
        SEM_THRESHOLD,
    )

    rows = REGISTRY["dedup_semantic_centroids"].builder(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.keeper < r.vec_id
        assert r.max_sim >= SEM_THRESHOLD
        assert r.vec_id not in seen  # one verdict per removed vector
        seen.add(r.vec_id)


def test_semantic_dedup_closure_vs_numpy(spark, sf_dir):
    """Completeness: an INDEPENDENT numpy re-implementation (centroids,
    nearest-centroid assignment, in-cluster pairwise cosine) must agree
    with the operator's removal set exactly — a silently-dropped removal
    row fails here even though every emitted row looks valid."""
    import numpy as np

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.semantic import (
        SEM_THRESHOLD,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    rows = load(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in rows])
    labels = np.array([r.label for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, labels, mat = ids[order], labels[order], mat[order]

    # collapse exact duplicates (lowest id per identical vector)
    seen = {}
    keep = []
    for i in range(len(ids)):
        key = mat[i].tobytes()
        if key not in seen:
            seen[key] = ids[i]
            keep.append(i)
    ids, labels, mat = ids[keep], labels[keep], mat[keep]

    # per-label mean centroids over the collapsed corpus
    ulabels = np.unique(labels)
    cents = np.array([mat[labels == l].mean(axis=0) for l in ulabels])
    cn = np.linalg.norm(cents, axis=1)
    vn = np.linalg.norm(mat, axis=1)
    sims = np.round((mat @ cents.T) / (vn[:, None] * cn[None, :]), 4)
    # nearest centroid, ties to the LOWEST label (ulabels is sorted)
    assign = ulabels[
        np.array([int(np.argmax(s)) for s in sims])
    ]

    removed = {}
    for c in ulabels:
        m = assign == c
        cid, cmat, cvn = ids[m], mat[m], vn[m]
        cos = np.round((cmat @ cmat.T) / (cvn[:, None] * cvn[None, :]), 4)
        for j in range(len(cid)):
            smaller = [
                k for k in range(len(cid))
                if cid[k] < cid[j] and cos[k, j] >= SEM_THRESHOLD
            ]
            if smaller:
                removed[int(cid[j])] = (
                    int(c),
                    int(min(cid[k] for k in smaller)),
                    float(max(cos[k, j] for k in smaller)),
                )

    got = {
        int(r.vec_id): (int(r.cluster), int(r.keeper), float(r.max_sim))
        for r in REGISTRY["dedup_semantic_centroids"].builder(spark, sf_dir).collect()
    }
    assert set(got) == set(removed)  # closure: exactly the right rows
    for vid in got:
        assert got[vid][0] == removed[vid][0]
        assert got[vid][1] == removed[vid][1]
        assert abs(got[vid][2] - removed[vid][2]) <= 2e-4  # rounding-path tolerance


def test_cluster_oracles_agree_on_duplicated_corpus(spark, tmp_path):
    """The round-6 review reproduced impl/oracle divergence for the
    clustering family on corpora with EXACT duplicates (collapse on one
    side only). Pin the fix: a crafted duplicated corpus must hash-match
    between Spark and DuckDB for every collapse-affected query, exact
    copies must land in their near-dup component, and keep-best must
    keep exactly one of an exact pair."""
    import duckdb

    from tests.test_oracle_diff import _rows_multiset
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    long_a = " ".join(f"w{i}" for i in range(30))
    near_a = " ".join(f"w{i}" for i in range(29)) + " zz"
    docs = [
        (1, long_a),
        (2, long_a),            # exact copy of 1
        (3, near_a),            # near-dup of 1 (jaccard ~0.93)
        (4, "completely different tokens " * 6),
        (5, "x y z"),           # short exact pair — below shingle length,
        (6, "x y z"),           # connected ONLY by the attachment edge
    ]
    sf = str(tmp_path / "dup_sf")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    for name in [
        "dedup_clusters_exact",
        "dedup_keep_best",
        "dedup_shingle_containment",
        "dedup_ngram_jaccard",
    ]:
        spec = REGISTRY[name]
        sdf = spec.builder(spark, sf)
        s_rows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(spec.oracle)
        d_rows = rel.fetchall()
        assert len(s_rows) == len(d_rows), (name, s_rows, d_rows)
        assert _rows_multiset(s_rows, sdf.columns) == _rows_multiset(
            d_rows, rel.columns
        ), name

    comp = {
        r.doc_id: r.component
        for r in REGISTRY["dedup_clusters_exact"].builder(spark, sf).collect()
    }
    assert comp[1] == comp[2] == comp[3]  # exact copy joins the near cluster
    assert comp[5] == comp[6]             # short exact pair still connected
    assert 4 not in comp                  # isolated doc has no edges
    keepers = {
        r.component: (r.keeper_doc_id, r.cluster_size)
        for r in REGISTRY["dedup_keep_best"].builder(spark, sf).collect()
    }
    assert keepers[comp[1]] == (1, 3)     # one keeper for {1,2,3}
    assert keepers[comp[5]] == (5, 2)     # one keeper for the exact pair
    assert keepers[4] == (4, 1)           # singleton survives


def test_incremental_minhash_equals_batch_restricted_full_run(spark, sf_dir):
    """The incremental result must be EXACTLY the full-corpus result
    restricted to pairs touching the batch — no pair lost to the
    index/batch split (same bands, same hot cap, same verify)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        dedup_incremental_minhash,
        dedup_minhash_lsh_md5,
    )

    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_lsh_md5(spark, sf_dir).collect()
    }
    want = {t for t in full if t[0] % 4 == 0 or t[1] % 4 == 0}
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    }
    assert got == want
    assert got  # non-trivial: the fixture has batch-touching near-dups


def test_minhash_persisted_index_probe_and_append(spark, sf_dir, tmp_path):
    """Round-7 VERDICT #4 — the at-rest incremental index. (1) Probing
    the persisted index from disk yields EXACTLY the in-memory
    incremental pairs. (2) A batch whose signatures come from a tiny
    synthetic frame probes WITHOUT any documents scan in its plan —
    structural proof that historical signatures are read from the
    index, never recomputed. (3) Appending a batch then probing the
    next batch finds pairs against the appended docs."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        _minhash_signature,
        append_minhash_index,
        collapse_exact_duplicates,
        incremental_minhash_pairs,
        md5_token_hash,
        probe_minhash_index,
        shingle_hash_frame,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.plans import (
        physical_plan,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    sig = (
        shingle_hash_frame(d, token_hash=md5_token_hash)
        .filter(F.size("shingle_hashes") > 0)
        .select(
            "doc_id",
            _minhash_signature(F.col("shingle_hashes")).alias("signature"),
        )
        .cache()
    )
    sig.count()
    index_sig = sig.filter(F.col("doc_id") % 4 != 0)
    batch_sig = sig.filter(F.col("doc_id") % 4 == 0)
    index_path = str(tmp_path / "bands")
    append_minhash_index(index_path, index_sig, string_buckets=True)

    # (1) at-rest == in-memory
    from_disk = probe_minhash_index(
        spark, index_path, batch_sig, string_buckets=True
    )
    in_mem = incremental_minhash_pairs(
        batch_sig, index_sig, string_buckets=True
    )
    assert sorted(map(tuple, from_disk.collect())) == sorted(
        map(tuple, in_mem.collect())
    )
    # planning-time shard pruning pinned
    plan = physical_plan(from_disk)
    seg = (
        plan.split("PartitionFilters")[1][:200]
        if "PartitionFilters" in plan
        else ""
    )
    assert "shard" in seg, plan

    # (2) no historical recompute: a synthetic batch's probe plan scans
    # the index parquet only — no documents source anywhere
    synth = spark.createDataFrame(
        [(10_000_001, [float(0)] * 0)], "doc_id long, dummy array<float>"
    ).select(
        "doc_id",
        F.array([F.lit(7).cast("long")] * 64).alias("signature"),
    )
    probe2 = probe_minhash_index(spark, index_path, synth, string_buckets=True)
    plan2 = physical_plan(probe2)
    assert "documents" not in plan2, plan2
    # the only file source in the plan is the index (checked via
    # inputFiles — the plan's Location string truncates at 100 chars,
    # so a path substring test is length-of-tmpdir flaky)
    assert "FileScan parquet" in plan2
    files2 = probe2.inputFiles()
    assert files2 and all(index_path in f for f in files2)

    # (3) append batch1, then a near-copy batch finds it via the index
    append_minhash_index(index_path, batch_sig, string_buckets=True)
    some_batch_doc = batch_sig.select("doc_id").first().doc_id
    clone_sig = batch_sig.filter(F.col("doc_id") == some_batch_doc).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "signature"
    )
    found = probe_minhash_index(
        spark, index_path, clone_sig, string_buckets=True
    ).collect()
    assert (some_batch_doc, some_batch_doc + 10_000_000) in {
        (r.doc_a, r.doc_b) for r in found
    }


def test_stream_minhash_dedup_resumes_after_restart(spark, sf_dir, tmp_path):
    """Round-8 streaming arrival protocol: a crash after two of three
    batches restarts from the SAME checkpoint and must process ONLY the
    remaining file — the index reflects exactly the processed batches
    (no duplicate band rows), and the final pair set equals the
    full-corpus run (every pair found exactly once, in its later
    member's batch)."""
    import glob
    import shutil

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        _minhash_signature,
        collapse_exact_duplicates,
        incremental_minhash_pairs,
        jaccard_verify,
        md5_token_hash,
        minhash_stream_sink,
        run_minhash_dedup_stream,
        shingle_hash_frame,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.streaming_ops import (
        cdc_land_change_files,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    base = str(tmp_path)
    src = f"{base}/incoming"
    idx, docs, out, ckpt = (
        f"{base}/index", f"{base}/docs", f"{base}/pairs", f"{base}/ckpt"
    )
    cdc_land_change_files(d, src, base, n=3, key_col="doc_id")
    hidden = f"{base}/c2.parquet.hidden"
    shutil.move(f"{src}/c2.parquet", hidden)  # batch 3 hasn't arrived

    run_minhash_dedup_stream(spark, src, d.schema, idx, docs, out, ckpt)
    n_idx_partial = spark.read.parquet(idx).count()
    shutil.move(hidden, f"{src}/c2.parquet")  # arrives; restart resumes
    run_minhash_dedup_stream(spark, src, d.schema, idx, docs, out, ckpt)

    # only batch 3's bands were appended: no (doc, band) duplicates
    bands = spark.read.parquet(idx)
    assert bands.count() > n_idx_partial
    assert bands.count() == bands.select("doc_id", "band").distinct().count()
    # the corpus landed exactly once per doc
    landed = spark.read.schema(d.schema).parquet(f"{docs}/batch=*")
    assert landed.count() == d.count()

    # mid-epoch replay (crash after the sink ran, before the epoch
    # committed): re-delivering an epoch overwrites its own
    # deterministic output dirs — nothing duplicates, nothing changes
    n_bands, n_docs = bands.count(), landed.count()
    pairs_before = sorted(
        map(
            tuple,
            spark.read.schema("doc_a long, doc_b long, jaccard double")
            .parquet(f"{out}/batch=*")
            .collect(),
        )
    )
    sink = minhash_stream_sink(spark, d.schema, idx, docs, out)
    sink(d.filter(F.col("doc_id") % 3 == 2), 2)  # re-deliver epoch 2
    assert spark.read.parquet(idx).count() == n_bands
    assert (
        spark.read.schema(d.schema).parquet(f"{docs}/batch=*").count()
        == n_docs
    )
    assert (
        sorted(
            map(
                tuple,
                spark.read.schema("doc_a long, doc_b long, jaccard double")
                .parquet(f"{out}/batch=*")
                .collect(),
            )
        )
        == pairs_before
    )

    # union over batches == full-corpus run (cap-free, see the query)
    sig = (
        shingle_hash_frame(d, token_hash=md5_token_hash)
        .filter(F.size("shingle_hashes") > 0)
        .select(
            "doc_id",
            _minhash_signature(F.col("shingle_hashes")).alias("signature"),
        )
        .cache()
    )
    sig.count()
    full_pairs = incremental_minhash_pairs(
        sig, sig.limit(0), max_bucket_size=None, string_buckets=True
    )
    want = sorted(
        map(
            tuple,
            jaccard_verify(
                full_pairs, d, threshold=0.8, token_hash=md5_token_hash
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            spark.read.schema("doc_a long, doc_b long, jaccard double")
            .parquet(f"{out}/batch=*")
            .collect(),
        )
    )
    assert got == want and got


def test_dedup_paragraphs_removes_real_duplicates(spark, sf_dir):
    """The chunk-level pass must remove something on this corpus (near-
    dup documents share exact word runs) and keep-first must hold: the
    first occurrence of every distinct segment survives."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    out = REGISTRY["dedup_paragraphs"].builder(spark, sf_dir).collect()
    total = sum(r.total_chunks for r in out)
    kept = sum(r.kept_chunks for r in out)
    assert 0 < kept < total  # duplicates existed and were removed
    assert sum(r.n_docs for r in out) > 0


def test_exact_substring_dedup_span_semantics(spark):
    """Synthetic pin of the suffix-array-style semantics: a 10-token run
    shared by two documents is removed from the LATER one only, and the
    removal is token-coverage (the whole duplicated span, not just gram
    starts); a document with no 8-gram in common stays byte-identical;
    a short (<8 token) document is never touched."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    run = "a b c d e f g h i j"  # 10 tokens => 3 grams of 8
    rows = [
        (1, f"x1 x2 {run} x3 x4", "en", "s", 0),
        (2, f"y1 y2 y3 {run} y4", "en", "s", 0),  # later copy => removed
        (3, "p q r s t u v w x y z", "en", "s", 0),
        (4, "tiny doc here", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r.lang: r
            for r in REGISTRY["dedup_exact_substrings"].builder(spark, tmp).collect()
        }
    en = out["en"]
    # doc 2 loses exactly the 10 run tokens; docs 1/3/4 untouched.
    assert en.n_docs == 4
    assert en.docs_touched == 1
    assert en.removed_tokens == 10
    assert en.total_tokens == 14 + 14 + 11 + 3
