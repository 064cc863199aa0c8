"""Behavior tests for advanced operators whose driver check is rows-only."""

from __future__ import annotations

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY


def test_approx_aggregates_error_bounds(spark, sf_dir):
    rows = REGISTRY["approx_aggregates"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert rel_err < 0.05, f"HLL error {rel_err:.3f} for {r.o_orderstatus}"
        assert r.approx_median > 0


def test_asof_join_monotonic(spark, sf_dir):
    rows = REGISTRY["asof_join_events"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.last_click_ts is not None:
            assert r.last_click_ts <= r.purchase_ts
            assert r.lag_us >= 0


def test_tag_masked_view_autogen(spark, tmp_path_factory):
    from tf_aws_lakeformation_governed_datalake_demo_spark import Engine
    from tf_aws_lakeformation_governed_datalake_demo_spark import fixtures as fx

    lake = str(tmp_path_factory.mktemp("taglake"))
    cat = fx.bootstrap(spark, lake)
    sql = cat.create_tag_masked_view(
        "sales_db.sales", "sales_auto_masked", "pii", "sensitive"
    )
    assert "customer_email" in sql and "REGEXP_REPLACE" in sql
    eng = Engine(spark, cat)
    cat.grant("analyst", "SELECT", "sales_db", "sales_auto_masked")
    df = eng.sql(
        "SELECT * FROM sales_db.sales_auto_masked ORDER BY customer_id",
        principal="analyst",
    )
    rows = df.collect()
    # composes with row security (APAC only) and masks both tagged columns
    assert len(rows) == 8
    assert rows[0].customer_email == "***@example.com"
    assert rows[0].ssn == "***-**-****"
    assert rows[0].customer_name == "Alice Johnson"  # untagged passes through


def test_tag_based_access_control(spark, tmp_path_factory):
    from tf_aws_lakeformation_governed_datalake_demo_spark import Engine
    from tf_aws_lakeformation_governed_datalake_demo_spark import fixtures as fx

    lake = str(tmp_path_factory.mktemp("tbaclake"))
    cat = fx.bootstrap(spark, lake)
    cat.grant("analyst_eu", "SELECT", "sales_db", "sales",
              via_tag_exclude=("pii", "sensitive"))
    eng = Engine(spark, cat)
    df = eng.sql("SELECT * FROM sales_db.sales", principal="analyst_eu")
    # all rows (no row filter), but tagged pii columns excluded dynamically
    assert df.count() == 20
    assert df.columns == [
        "customer_id", "customer_name", "sales_region", "sales_amount", "sale_date"
    ]
    # tagging another column later revokes it with no grant change
    cat.tag_columns("sales_db.sales", ["customer_name"], "pii", "sensitive")
    df2 = eng.sql("SELECT * FROM sales_db.sales", principal="analyst_eu")
    assert "customer_name" not in df2.columns


def test_ivf_exact_within_probed_cells(spark, sf_dir):
    """IVF's guarantee is exactness *within probed cells* (global recall
    depends on how clustered the corpus is — this synthetic one isn't:
    the true top-10 spans 9 of 10 labels)."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    ivf = REGISTRY["ann_ivf_cosine"].builder(spark, sf_dir).collect()
    assert len(ivf) == 10
    probed = {r.label for r in ivf}
    assert len(probed) <= 2  # nprobe=2
    full = REGISTRY["knn_cosine_topk"].builder(spark, sf_dir).collect()
    in_cells = [r for r in full if r.label in probed][:10]
    assert [(r.vec_id, r.cos_sim) for r in ivf[: len(in_cells)]] == [
        (r.vec_id, r.cos_sim) for r in in_cells
    ]


def test_frame_sample_filters_before_decode(spark, sf_dir):
    # Round-1 ADVICE: the media_type filter must sit BELOW the Python
    # evaluation node so non-video payloads never cross the Arrow boundary.
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        multimodal_frame_sample,
    )

    df = multimodal_frame_sample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert plan.index("MapInPandas") < plan.index("Filter")
    assert df.count() > 0


def test_multimodal_resize_geometry(spark, sf_dir):
    # aspect-preserving: larger side lands exactly on the 224 target and
    # the aspect ratio error is bounded by the integer floor
    rows = REGISTRY["multimodal_resize"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert max(r.out_w, r.out_h) == 224
        assert min(r.out_w, r.out_h) >= 1
        # floor-division bound: |out_w/out_h - width/height| is small
        assert abs(r.out_w * r.height - r.out_h * r.width) <= max(r.width, r.height)


def test_multimodal_feature_extract_shape(spark, sf_dir):
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        N_FEATURE_DIMS,
    )

    df = REGISTRY["multimodal_feature_extract"].builder(spark, sf_dir)
    rows = df.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add(r.dim)
        assert 0 <= r.value <= 255
    assert all(dims == set(range(N_FEATURE_DIMS)) for dims in per_doc.values())


def test_byte_histogram_encoder_unit(spark):
    # the real-numpy encoder: L1-normalized high-nibble histogram,
    # checked against a hand-computed payload
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        N_HIST_BINS,
        byte_histogram_encoder,
    )

    payload = bytes([0x00, 0x0F, 0x10, 0x1F, 0xF0, 0xFF, 0xFF, 0xFF])
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    ).mapInPandas(byte_histogram_encoder, "doc_id long, embedding array<double>")
    row = df.first()
    vec = row.embedding
    assert row.doc_id == 7 and len(vec) == N_HIST_BINS
    assert abs(sum(vec) - 1.0) < 1e-12  # L1-normalized
    assert vec[0] == 0.25   # two bytes with high nibble 0
    assert vec[1] == 0.25   # two with nibble 1
    assert vec[15] == 0.5   # four with nibble F
    assert all(v == 0.0 for v in vec[2:15])


def test_multimodal_embed_knn_composition(spark, sf_dir):
    # encoder -> similarity stack composition: bounded ranked output,
    # cosine in [0, 1] (nonnegative histogram vectors), top-k plan
    rows = REGISTRY["multimodal_embed_knn"].builder(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in sims)


def test_anomaly_zscore_scores_outage_day(spark, tmp_path):
    """A zero-event day — the canonical outage — must BE a scored row
    (cnt=0, flagged), not a silent gap that stretches the trailing
    window past 7 calendar days (round-6 review finding)."""
    import datetime

    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY

    rows = []
    eid = 0
    base = datetime.datetime(2024, 3, 1, 12, 0)
    for day in range(10):
        if day == 8:  # the outage day (2024-03-09): zero events
            continue
        n = 100 + (day % 2)  # alternate 100/101 so sd > 0
        for i in range(n):
            rows.append((eid, base + datetime.timedelta(days=day, seconds=i), "click"))
            eid += 1
    sf = str(tmp_path / "outage_sf")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    out = {
        r.day: (r.cnt, r.z, r.is_anomaly)
        for r in REGISTRY["events_anomaly_zscore"].builder(spark, sf).collect()
    }
    outage = datetime.date(2024, 3, 9)
    assert outage in out, sorted(out)
    cnt, z, flagged = out[outage]
    assert cnt == 0 and z < -2 and flagged


def test_phash_crafted_near_identical_images(spark):
    """dedup_phash_images' kernel on CRAFTED payloads: a near-identical
    sibling (3 of 4096 bytes changed) must land within the hamming
    threshold and share bands; an unrelated payload must not. The bit
    rule is replayed in pure Python to pin integer-exactness."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        ahash_encoder,
    )

    base = bytes((i * 7 + (i // 31)) % 251 for i in range(4096))
    near = bytearray(base)
    for p in (10, 2000, 4000):
        near[p] = (near[p] + 90) % 251
    other = bytes((i * 131 + 17) % 251 for i in range(4096))
    df = spark.createDataFrame(
        [
            (1, "image", base, (len(base), "t")),
            (2, "image", bytes(near), (len(near), "t")),
            (3, "image", other, (len(other), "t")),
        ],
        "doc_id long, media_type string, payload binary, "
        "meta struct<n_bytes: long, source: string>",
    )
    sig = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in df.mapInPandas(
            ahash_encoder, "doc_id long, b0 long, b1 long, b2 long, b3 long"
        ).collect()
    }

    def py_bands(raw: bytes):
        n = len(raw)
        s = [0] * 64
        k = [0] * 64
        for i, byte in enumerate(raw):
            c = (i * 64) // n
            s[c] += byte
            k[c] += 1
        t = sum(raw)
        bits = [1 if s[j] * n > t * k[j] else 0 for j in range(64)]
        return tuple(
            sum(bits[16 * b + j] << j for j in range(16)) for b in range(4)
        )

    for doc_id, raw in ((1, base), (2, bytes(near)), (3, other)):
        assert sig[doc_id] == py_bands(raw), doc_id

    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    assert ham(sig[1], sig[2]) <= PHASH_HAMMING_MAX
    assert any(a == b for a, b in zip(sig[1], sig[2])), "must share a band"
    assert ham(sig[1], sig[3]) > PHASH_HAMMING_MAX
    assert ham(sig[2], sig[3]) > PHASH_HAMMING_MAX


def test_phash_index_probe_semantics_and_pruning(spark, sf_dir):
    """dedup_phash_index_probe: (a) its pairs are EXACTLY the
    batch-touching subset of dedup_phash_images' pairs (at-rest /
    in-memory equivalence), and (b) the index read prunes to the
    probed shard partitions at planning time."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        ahash_encoder,
        append_phash_index,
        phash_corpus,
        probe_phash_index,
    )
    from pyspark.sql import functions as F

    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in REGISTRY["dedup_phash_images"].builder(spark, sf_dir).collect()
    }
    probe = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in REGISTRY["dedup_phash_index_probe"]
        .builder(spark, sf_dir)
        .collect()
    }
    want = {
        (a, b, h) for a, b, h in full if a % 4 == 0 or b % 4 == 0
    }
    assert probe == want and probe

    import tempfile

    sig = phash_corpus(spark, sf_dir).mapInPandas(
        ahash_encoder, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    )
    idx = tempfile.mkdtemp() + "/bands"
    append_phash_index(idx, sig.filter(F.col("doc_id") % 4 != 0))
    pairs = probe_phash_index(
        spark, idx, sig.filter(F.col("doc_id") % 4 == 0)
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "shard" in seg, seg


def test_stream_phash_dedup_union_equals_batch_run(spark, sf_dir):
    """The 3-micro-batch streaming union must equal the full-corpus
    batch run exactly (every pair found once, in its later member's
    arrival batch; no hot bucket fires at this sf, so the capped
    stream — round-16 runs the deterministic keep-lowest-128 cap —
    and the drop-hot-capped batch query coincide)."""
    stream = {
        tuple(r)
        for r in REGISTRY["stream_phash_dedup"].builder(spark, sf_dir).collect()
    }
    batch = {
        tuple(r)
        for r in REGISTRY["dedup_phash_images"].builder(spark, sf_dir).collect()
    }
    assert stream == batch and stream


def test_phash_deterministic_cap_bounds_hot_bucket(spark, tmp_path):
    """Crafted hot bucket (40 byte-identical images -> every band
    bucket holds all 40): the deterministic keep-lowest-k cap must
    (a) bound per-epoch candidate work at C(cap, 2) pairs instead of
    C(40, 2), and (b) yield the SAME final pair set for two different
    batch boundaries after the final-membership filter — the
    stream_phash_dedup protocol's exactness claim, exercised where
    the cap actually binds (the sf fixture never fills a bucket)."""
    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        keep_lowest_k_per_bucket,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        PHASH_SIG_SCHEMA,
        ahash_encoder,
        append_phash_index,
        probe_phash_index,
    )

    payload = bytes((i * 7 + 3) % 251 for i in range(256))
    df = spark.createDataFrame(
        [(i, payload) for i in range(1, 41)], "doc_id long, payload binary"
    )
    sig = df.mapInPandas(ahash_encoder, PHASH_SIG_SCHEMA).cache()
    sig.count()
    cap = 8

    def run(tag, batches):
        idx = str(tmp_path / f"idx_{tag}") + "/bands"
        union, per_epoch = set(), []
        for ids in batches:
            bs = sig.filter(F.col("doc_id").isin(ids))
            pairs = probe_phash_index(
                spark, idx, bs, max_bucket_size=None, deterministic_cap=cap
            )
            rows = {(r.doc_a, r.doc_b) for r in pairs.collect()}
            per_epoch.append(len(rows))
            union |= rows
            append_phash_index(idx, bs)
        kept_ids = {
            r.doc_id
            for r in keep_lowest_k_per_bucket(
                spark.read.parquet(idx).select("doc_id", "band", "bucket"),
                ["band", "bucket"],
                "doc_id",
                cap,
            )
            .select("doc_id")
            .distinct()
            .collect()
        }
        # identical payloads -> identical buckets, so doc-level final
        # membership equals the operator's common-bucket filter here
        return {
            (a, b) for a, b in union if a in kept_ids and b in kept_ids
        }, per_epoch

    mod3 = [[i for i in range(1, 41) if i % 3 == r] for r in (1, 2, 0)]
    halves = [list(range(1, 21)), list(range(21, 41))]
    got_a, epochs_a = run("mod3", mod3)
    got_b, epochs_b = run("halves", halves)
    want = {(x, y) for x in range(1, 9) for y in range(x + 1, 9)}
    assert got_a == want == got_b
    # per-epoch candidate work is bounded by the cap, not the corpus:
    # C(8,2)=28 max, vs C(40,2)=780 uncapped
    assert max(epochs_a + epochs_b) <= 28


def test_phash_collapsed_equals_copyfree_run(spark, sf_dir):
    """dedup_phash_collapsed: the planted exact copies (one per image)
    must collapse to their lowest-id representative before banding, so
    the pair set equals dedup_phash_images' copy-free run EXACTLY —
    the d^2 bucket hazard never materializes and no pair involves a
    +18000000 copy id."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.multimodal import (
        PHASH_EXACT_COPY_OFFSET,
    )

    collapsed = {
        tuple(r)
        for r in REGISTRY["dedup_phash_collapsed"]
        .builder(spark, sf_dir)
        .collect()
    }
    plain = {
        tuple(r)
        for r in REGISTRY["dedup_phash_images"].builder(spark, sf_dir).collect()
    }
    assert collapsed == plain and collapsed
    assert all(
        a < PHASH_EXACT_COPY_OFFSET and b < PHASH_EXACT_COPY_OFFSET
        for a, b, _ in collapsed
    )
