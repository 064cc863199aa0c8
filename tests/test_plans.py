"""Plan-hygiene tests: pin every headline query to the physical plan it
must have at 100 TB (SURVEY.md §4). A regression here means a cluster
burns before correctness tests would notice."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
from tf_aws_lakeformation_governed_datalake_demo_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filter,
    assert_read_schema_pruned,
    assert_top_k,
    final_plan,
    physical_plan,
)


def test_scan_pushdown_and_pruning(spark, sf_dir):
    df = REGISTRY["scan_project_filter"].builder(spark, sf_dir)
    assert_pushed_filter(df, "l_quantity")
    assert_read_schema_pruned(df, 4)  # 4 of 11 lineitem columns


def test_date_filter_pushdown(spark, sf_dir):
    df = REGISTRY["agg_tpch_q1"].builder(spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")


def test_dim_joins_broadcast(spark, sf_dir):
    assert_broadcast_join(REGISTRY["join_broadcast_dims"].builder(spark, sf_dir))
    assert_broadcast_join(REGISTRY["join_3way_dims"].builder(spark, sf_dir))
    assert_broadcast_join(REGISTRY["tpch_q5_region_revenue"].builder(spark, sf_dir))


def test_topk_plans_as_heap(spark, sf_dir):
    assert_top_k(REGISTRY["orderby_limit_topk"].builder(spark, sf_dir))
    assert_top_k(REGISTRY["tpch_q3_topk"].builder(spark, sf_dir))


def test_range_join_broadcasts_bands(spark, sf_dir):
    assert_broadcast_join(REGISTRY["range_join_price_bands"].builder(spark, sf_dir))


def test_no_cartesian_in_theta_join(spark, sf_dir):
    # equi-component must make this a hash/sort-merge join, not a product
    plan = physical_plan(REGISTRY["join_theta_lag"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_wholestage_codegen_covers_q1(spark, sf_dir):
    import re

    plan = final_plan(REGISTRY["agg_tpch_q1"].builder(spark, sf_dir))
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen stages; both agg stages must codegen
    assert len(set(re.findall(r"\*\((\d+)\)", plan))) >= 2
    # partial (map-side) aggregation must sit below the exchange in the tree
    assert plan.index("partial_sum") > plan.index("Exchange")


def test_governed_scan_reads_less(spark, sf_dir):
    # governance must *narrow* the scan: pushed region filter + 5-col schema
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.governed import _engine

    df = _engine(spark).catalog.table("sales_db.sales", "analyst")
    assert_pushed_filter(df, "sales_region")
    assert_read_schema_pruned(df, 5)


def test_partitioned_read_prunes(spark, sf_dir):
    import re
    import tempfile

    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import (
        load,
        write_partitioned,
    )

    o = load(spark, sf_dir, "orders").withColumn("oy", F.year("o_orderdate"))
    out = tempfile.mkdtemp(prefix="prune_lake_")
    write_partitioned(o, out, partition_by=["oy"])
    back = spark.read.parquet(out).filter(F.col("oy") == 1997)
    plan = physical_plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "oy" in m.group(1), f"no partition pruning: {m}"


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Bucketing both fact tables on the join key removes the Exchange
    entirely — the 100 TB discipline for repeated fact-fact joins
    (SURVEY.md scale notes; sources are re-bucketed once at ingest)."""
    from pyspark.sql import functions as F

    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    (load(spark, sf_dir, "orders")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("orders_bkt"))
    (load(spark, sf_dir, "lineitem")
     .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("lineitem_bkt"))
    joined = (
        spark.table("orders_bkt")
        .join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = physical_plan(joined)
    join_part = plan[: plan.index("HashAggregate(keys=[o_orderpriority")] if "HashAggregate" in plan else plan
    # the join itself must read bucketed data with no shuffle on either side
    import re as _re
    exchanges_before_agg = _re.findall(r"Exchange hashpartitioning\((o_orderkey|l_orderkey)", plan)
    assert not exchanges_before_agg, f"join sides shuffled: {exchanges_before_agg}"
    # sanity: result matches the plain join
    plain = (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    # the benchmark shingle set must broadcast so the corpus never shuffles
    assert_broadcast_join(
        REGISTRY["decontaminate_ngram_overlap"].builder(spark, sf_dir)
    )


def test_split_and_sample_are_map_only_scans(spark, sf_dir):
    # the sample is a pure filter over the scan: no Exchange at all
    plan = physical_plan(REGISTRY["sample_stratified_by_lang"].builder(spark, sf_dir))
    assert "Exchange" not in plan
    # the split aggregates on a 3-value key: exactly one shuffle, with
    # map-side partial aggregation below it
    plan = physical_plan(REGISTRY["pipeline_train_val_split"].builder(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


def test_fact_revenue_preaggregates_before_join(spark, sf_dir):
    # lineitem must partial-aggregate to order grain BELOW the join and
    # never take the countDistinct expand path
    plan = physical_plan(REGISTRY["join_fact_revenue"].builder(spark, sf_dir))
    assert "Expand" not in plan
    assert "partial_sum" in plan


def test_tpch_q4_semi_join_no_fanout(spark, sf_dir):
    # EXISTS must plan as a semi join (no aggregate-then-distinct fanout)
    plan = physical_plan(REGISTRY["tpch_q4_order_priority"].builder(spark, sf_dir))
    assert "LeftSemi" in plan
    assert_pushed_filter(
        REGISTRY["tpch_q4_order_priority"].builder(spark, sf_dir), "o_orderdate"
    )


def test_tpch_q10_topk_and_pushdown(spark, sf_dir):
    df = REGISTRY["tpch_q10_returned_items"].builder(spark, sf_dir)
    assert_top_k(df)  # top-20 must be TakeOrderedAndProject, not sort-all
    assert_pushed_filter(df, "l_returnflag")
    assert_broadcast_join(df)


def test_tpch_q13_preaggregates_orders(spark, sf_dir):
    # orders must reduce to (custkey, n) BELOW the left join — the join
    # matches one row per customer instead of fanning out per order
    plan = physical_plan(
        REGISTRY["tpch_q13_customer_distribution"].builder(spark, sf_dir)
    )
    assert "partial_count" in plan
    # the orders-side partial_count (the last one in tree order) sits
    # below the join; the first belongs to the outer distribution agg
    assert plan.rindex("partial_count") > plan.index("Join")


def _pushed_on_any_scan(df, column: str) -> bool:
    # assert_pushed_filter checks only the FIRST scan; multi-scan plans
    # need to find the filter on whichever scan owns the column
    import re

    plan = physical_plan(df)
    return any(
        column in m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    )


def test_tpch_q19_disjunction_prunes_both_scans(spark, sf_dir):
    # each disjunct's single-table conjuncts must reach the scans: the
    # lineitem side gets the derived quantity-range OR filter, the part
    # side the brand/size OR filter
    df = REGISTRY["tpch_q19_discounted_revenue"].builder(spark, sf_dir)
    assert_pushed_filter(df, "l_quantity")
    # the part-side brand/size OR conjunct sits in a Filter directly on
    # the part scan (its PushedFilters string is display-truncated)
    plan = physical_plan(df)
    assert any(
        "p_brand" in line and "Filter" in line for line in plan.splitlines()
    )
    assert_broadcast_join(df)


def test_tpch_q22_anti_join_with_pushed_window(spark, sf_dir):
    df = REGISTRY["tpch_q22_dormant_customers"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan
    assert _pushed_on_any_scan(df, "o_orderdate")  # dormancy window on the scan


def test_tpch_q2_decorrelated_min_broadcasts(spark, sf_dir):
    # the correlated min must become a broadcast join of the per-part
    # min frame, not a re-scan per row; part/supplier dims broadcast
    df = REGISTRY["tpch_q2_min_cost_supplier"].builder(spark, sf_dir)
    assert_broadcast_join(df)
    assert _pushed_on_any_scan(df, "r_name")
    assert_top_k(df)


def test_tpch_q9_part_filter_prunes_fact(spark, sf_dir):
    df = REGISTRY["tpch_q9_product_profit"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # the %gear% filter sits on the part scan (broadcast side), pruning
    # the fact through the broadcast hash join before the orders shuffle
    assert any(
        "p_name" in line and ("Filter" in line or "PushedFilters" in line)
        for line in plan.splitlines()
    )
    assert_broadcast_join(df)
    assert "partial_sum" in plan


def test_tpch_q11_single_fact_shuffle(spark, sf_dir):
    df = REGISTRY["tpch_q11_important_parts"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # nation's suppliers must reach the fact as a broadcast semi join
    assert "LeftSemi" in plan or "BroadcastHashJoin" in plan
    assert "partial_sum" in plan  # per-part agg partial-aggregates


def test_tpch_q16_bridge_distinct_below_join(spark, sf_dir):
    df = REGISTRY["tpch_q16_supplier_part_counts"].builder(spark, sf_dir)
    plan = physical_plan(df)
    # the (part, supplier) distinct must partial-aggregate before any
    # join — HashAggregate appears below the broadcast join in the tree
    assert "BroadcastHashJoin" in plan
    # bridge reads 2 of 11 lineitem cols; widest scan (part) reads 4
    assert_read_schema_pruned(df, 4)


def test_tpch_q20_semi_join_chain(spark, sf_dir):
    df = REGISTRY["tpch_q20_excess_stock_suppliers"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan  # final IN is a semi join on supplier
    assert _pushed_on_any_scan(df, "p_name")  # red% pushed to part scan


def test_tpch_q21_decorrelated_exists_single_chain(spark, sf_dir):
    # the EXISTS / NOT EXISTS pair must decorrelate into the aggregation
    # chain: no correlated re-scans => lineitem appears in at most two
    # scans (ls and po reuse one), and the status filter reaches orders
    df = REGISTRY["tpch_q21_waiting_suppliers"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert _pushed_on_any_scan(df, "o_orderstatus")
    assert_top_k(df)
    assert "CartesianProduct" not in plan


def test_library_pair_emitters_sort_free(spark, sf_dir):
    # Round-3 VERDICT #5: the registry pair queries sort for oracle
    # determinism, but the LIBRARY forms feeding clustering must not pay
    # a global sort (rangepartitioning Exchange) — pair consumers are
    # order-insensitive.
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        embedding_cosine_pairs_lsh,
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.similarity import (
        _with_norm,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    d = load(spark, sf_dir, "documents")
    v = _with_norm(load(spark, sf_dir, "embeddings"))
    for df in [
        ngram_jaccard_pairs(d, threshold=0.8),
        shingle_containment_pairs(d, threshold=0.6),
        embedding_cosine_pairs_lsh(v, threshold=0.3),
    ]:
        plan = physical_plan(df)
        assert "rangepartitioning" not in plan.lower(), plan[:2000]
    # the registry forms DO sort (oracle determinism contract)
    plan = physical_plan(REGISTRY["dedup_ngram_jaccard"].builder(spark, sf_dir))
    assert "rangepartitioning" in plan.lower()


def test_multiprobe_ann_no_cartesian_and_capped(spark, sf_dir):
    # Multi-probe must stay a bucket-keyed join: probes explode the QUERY
    # side only (map-side Generate), candidates come from a hash join on
    # (band, key), and nothing degenerates into a product of corpus rows.
    plan = physical_plan(REGISTRY["ann_multiprobe_topk"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan  # probe expansion is an explode, not a join
    # exact scoring joins the tiny query-vector frame by broadcast
    assert "BroadcastHashJoin" in plan


def test_shard_assignment_single_tiny_agg(spark, sf_dir):
    # One scan, one partial-agg shuffle on the 16-value shard key, no
    # joins, no sort besides the 16-row output orderBy.
    plan = physical_plan(REGISTRY["pipeline_shard_assignment"].builder(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_keep_best_reuses_component_partitioning(spark, sf_dir):
    # The keeper window and the cluster-size agg both key on `component`;
    # the final join must be on that same key — no cartesian, and the
    # corpus scan feeds a single pipeline (the localCheckpoint pin).
    df = REGISTRY["dedup_keep_best"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan


def test_embed_knn_filters_before_encoder_and_topk(spark, sf_dir):
    # The media encoder composition must stay: doc_id filters BELOW both
    # Arrow/Python boundaries (they cannot push through an opaque
    # mapInPandas, so they must be placed before it — the query branch
    # encodes ONE payload, not the corpus), query vector broadcast (no
    # cartesian of corpus rows), and heap-based top-k, never a global
    # sort.
    df = REGISTRY["multimodal_embed_knn"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("MapInPandas") == 2  # corpus pass + 1-row query pass
    # the query-side branch reaches the scan as a pushed doc_id=0 filter
    assert "EqualTo(doc_id,0)" in plan
    assert "CartesianProduct" not in plan
    assert_top_k(df)


def test_ivf_nprobe_sweep_broadcasts_and_no_cartesian(spark, sf_dir):
    # Sweeping 6 nprobe settings must not re-scan the corpus per setting:
    # the scored table is checkpointed once, the probe list joins it by
    # broadcast, and nothing degenerates into a product.
    df = REGISTRY["ann_ivf_nprobe_sweep"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_pq_rerank_broadcasts_tables_and_no_cartesian(spark, sf_dir):
    # The ADC scan must join the tiny per-query table frame by
    # broadcast; the shortlist's vector fetch is a join on vec_id, and
    # nothing degenerates into a product of corpus rows.
    plan = physical_plan(REGISTRY["pq_adc_rerank_topk"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # corpus-side encode is the Arrow kernel, not interpreted HOFs
    assert "ArrowEvalPython" in plan or "InMemory" in plan


def test_ivfadc_prunes_cells_by_broadcast(spark, sf_dir):
    # Cell routing must reach the codes scan as a broadcast hash join on
    # label (the partition-pruning analog), never a shuffle of the codes
    # table against the 10-row probed frame.
    plan = physical_plan(REGISTRY["ann_ivfadc_topk"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_zorder_scan_pushes_both_predicates(spark, sf_dir):
    # Both dimensions of the 2-D predicate must reach the parquet scan
    # of the z-ordered layout as pushed filters (footer-stats skipping
    # depends on it).
    plan = physical_plan(REGISTRY["lake_zorder_scan"].builder(spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters") :].split("]")[0]
    assert "user_id" in pushed
    assert "ts" in pushed


def test_dataset_mixture_broadcasts_quotas(spark, sf_dir):
    # The 5-row quota frame joins by broadcast; the only wide shuffle is
    # the per-language rank window.
    plan = physical_plan(REGISTRY["pipeline_dataset_mixture"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_table_diff_is_single_key_join(spark, sf_dir):
    # The CDC diff must be ONE full-outer key join — no product, no
    # broadcast of a snapshot (both sides are table-sized at 100 TB),
    # and the unchanged-row filter sits in the join's output, not a
    # second pass.
    plan = physical_plan(REGISTRY["lake_table_diff"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert "FullOuter" in plan


def test_incremental_refresh_never_rescans_base(spark, sf_dir):
    # The refresh plan reads the STORED MV (parquet scan of the scratch
    # path) plus one delta aggregate; the base-corpus aggregation must
    # not appear (exactly one events scan — the delta's).
    df = REGISTRY["lake_incremental_agg_refresh"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("events.parquet") == 1, plan
    assert "FullOuter" in plan


def test_semantic_dedup_pairs_join_on_cluster(spark, sf_dir):
    # In-cluster pair generation must be an equi-join on the cluster id
    # (sum(cluster^2) candidates), never a corpus product; centroid
    # assignment is a broadcast of the k-row centroid table.
    plan = physical_plan(REGISTRY["dedup_semantic_centroids"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # equi-join on cluster: SMJ/SHJ at scale; BHJ when the cached member
    # table is small enough to broadcast (this SF) — never a nested loop
    # over corpus rows
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    # the cached member table must feed both join sides (InMemoryTableScan),
    # not re-derive the assignment subtree per side
    assert plan.count("InMemoryTableScan") >= 2


def test_importance_resampling_broadcasts_lm_and_topk(spark, sf_dir):
    # Scoring is a map-side broadcast join against the <= N_FEAT-row
    # log-ratio table; the top-50 is a TakeOrderedAndProject, not a
    # global sort or single-partition rank window over the corpus.
    df = REGISTRY["pipeline_importance_resampling"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_sq_rerank_broadcasts_queries_no_cartesian(spark, sf_dir):
    # Scoring is ONE Arrow map pass (queries live inside the kernel —
    # no join at all on the scoring side); exact vectors are fetched for
    # shortlist rows via key joins with the query frame broadcast.
    plan = physical_plan(REGISTRY["ann_sq_rerank_topk"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan


def test_filtered_ann_pushes_predicate_to_scan(spark, sf_dir):
    # Pre-filtered vector search: the metadata predicate must reach the
    # parquet scan (bytes for non-matching labels are never read), and
    # scoring joins the tiny query frame by broadcast.
    df = REGISTRY["ann_filtered_topk"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan and "In(label" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bloom_prune_filters_fact_before_join(spark, sf_dir):
    # The bloom bit-test must sit on the lineitem side BELOW the
    # sort-merge join (map-side shuffle reduction), and the join itself
    # is the forced SMJ modeling a too-big-to-broadcast dimension.
    plan = physical_plan(REGISTRY["join_bloom_pruned_revenue"].builder(spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "shiftright" in plan  # the bloom membership test survives to the plan
    # the bit test evaluates below the join's exchange, not after the join
    assert plan.index("shiftright") > plan.index("SortMergeJoin")


def test_expire_scan_pushes_horizon_predicate(spark, sf_dir, tmp_path):
    """expire_scd2_versions' expired-row detection must read the
    dimension through a scan-level predicate (PushedFilters on the
    validity-end column), not a post-scan filter — at 100 TB the scan
    is the cost."""
    import datetime

    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    path = str(tmp_path / "dim")
    (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .withColumn("effective_from", F.lit(datetime.datetime(2024, 1, 1)))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .write.parquet(path)
    )
    expired = spark.read.parquet(path).filter(
        F.col("effective_to").isNotNull()
        & (F.col("effective_to") <= F.lit(datetime.datetime(2024, 2, 15)))
    )
    assert_pushed_filter(expired, "effective_to")


def test_scd2_enrichment_dimension_broadcasts(spark, sf_dir):
    """The point-in-time enrichment's static side must broadcast (zero
    stream-side join state); pin the batch analog of the join shape."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    e = load(spark, sf_dir, "events")
    d = F.broadcast(
        e.select("user_id").distinct().withColumn("tier", F.lit("bronze"))
        .withColumn("effective_from", F.lit("2000-01-01").cast("timestamp"))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .selectExpr("user_id AS d_user_id", "tier", "effective_from", "effective_to")
    )
    joined = e.join(
        d,
        (e["user_id"] == d["d_user_id"])
        & (e["ts"] >= d["effective_from"])
        & (d["effective_to"].isNull() | (e["ts"] < d["effective_to"])),
    )
    assert_broadcast_join(joined)


def test_path_transitions_single_event_scale_exchange(spark, sf_dir):
    """Sessionization and the in-session lag must share ONE user_id
    exchange (HashPartitioning(user_id) satisfies the (user_id, sid)
    clustering requirement — only a sort is added); later exchanges
    operate on the tiny (types x types) aggregate."""
    import re

    df = REGISTRY["events_path_transitions"].builder(spark, sf_dir)
    # AQE's toString appends the Initial Plan below the Final Plan —
    # count exchanges in the final section only
    plan = final_plan(df).split("== Initial Plan ==")[0]
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1
    assert not re.search(r"hashpartitioning\(user_id[^)]*sid", plan)


def test_incremental_minhash_probe_is_broadcast_semi_join(spark, sf_dir):
    """The batch-id restriction of the band table must be a BROADCAST
    left-semi join (batch ids are tiny vs the index) — the probe side
    never shuffles the full band table to find its own rows."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.dedup import (
        collapse_exact_duplicates,
        incremental_minhash_pairs,
        md5_token_hash,
        minhash_signatures,
        shingle_hash_frame,
        _minhash_signature,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load

    d = collapse_exact_duplicates(load(spark, sf_dir, "documents"))
    hashed = shingle_hash_frame(d, token_hash=md5_token_hash).filter(
        F.size("shingle_hashes") > 0
    )
    sig = hashed.select(
        "doc_id", _minhash_signature(F.col("shingle_hashes")).alias("signature")
    )
    pairs = incremental_minhash_pairs(
        sig.filter(F.col("doc_id") % 4 == 0),
        sig.filter(F.col("doc_id") % 4 != 0),
    )
    plan = physical_plan(pairs)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_ivf_partitioned_scan_prunes_cells(spark, sf_dir, tmp_path):
    """The probed-cell IN-filter must resolve at planning time into
    PartitionFilters on the index's label partition column — unprobed
    cell directories are never listed or read."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import (
        load,
        write_partitioned,
    )

    v = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    index = str(tmp_path / "cells")
    write_partitioned(v, index, partition_by=["label"])
    pruned = spark.read.parquet(index).filter(F.col("label").isin([0, 1]))
    plan = physical_plan(pruned)
    seg = plan.split("PartitionFilters")[1][:160] if "PartitionFilters" in plan else ""
    assert "label" in seg, plan
    # and the pruned read returns exactly those cells' rows
    want = v.filter(F.col("label").isin([0, 1])).count()
    assert pruned.count() == want


def test_bucketed_join_reads_clustering_no_exchange(spark, sf_dir):
    """S26: both sides written bucketed on the join key -> the SMJ's
    distribution requirement is satisfied by the scans themselves.
    The fact-scale shuffle must be absent; the scans must be bucketed."""
    df = REGISTRY["join_bucketed_colocated"].builder(spark, sf_dir)
    # the builder's own join-plan asserts ran; pin the scan properties
    # end to end here (aggregate on top may exchange on its tiny key)
    plan = physical_plan(df)
    assert plan.count("Bucketed: true") == 2, plan[:3000]
    assert "SelectedBucketsCount: 16 out of 16" in plan, plan[:3000]
    assert "SortMergeJoin" in plan
    # exactly the aggregation's own exchange may remain, on the
    # grouping key — never on the join key
    join_part = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in join_part, join_part[:2000]


def test_rename_alias_preserves_pushdown_and_pruning(spark, tmp_path):
    """The rename mapping's physical->logical projection must collapse
    into the scan: a filter on the LOGICAL name reaches the parquet
    reader as a pushed filter on the PHYSICAL name, the read schema is
    pruned to the referenced physical columns, and a partition-key
    filter still prunes directories."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import (
        publish_overwrite,
        read_table,
        rename_column,
    )

    path = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [(i, f"t{i}", ["en", "de"][i % 2], i * 10) for i in range(10)],
        "doc_id long, text string, lang string, n_chars long",
    )
    publish_overwrite(spark, path, seed, ["lang"], manifest=True)
    rename_column(path, "n_chars", "char_count")
    df = (
        read_table(spark, path)
        .filter("char_count > 50")
        .select("doc_id", "char_count")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(n_chars,50)" in plan  # pushed, physical name
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan
    assert df.count() == 4
    df2 = read_table(spark, path).filter("lang = 'de'")
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan2 and "lang" in plan2.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    assert df2.count() == 5


def test_interval_overlap_has_no_join(spark, sf_dir):
    # the interval-join bucketing trick: hour buckets come from a
    # map-side explode, so there must be NO join node at all (the
    # naive theta form plans a nested-loop product)
    plan = physical_plan(REGISTRY["join_interval_overlap"].builder(spark, sf_dir))
    assert "Generate explode" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_decontaminate_semantic_broadcasts_benchmark(spark, sf_dir):
    # the benchmark side is tiny by definition -> one broadcast, the
    # corpus is a single map pass (no corpus shuffle before the agg)
    plan = physical_plan(
        REGISTRY["decontaminate_semantic"].builder(spark, sf_dir)
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_doc_entropy_topk_is_heap(spark, sf_dir):
    assert_top_k(REGISTRY["text_doc_entropy"].builder(spark, sf_dir))


def test_domain_caps_two_phase_plan(spark, sf_dir):
    """The round-12 skew cure's plan shape: TWO Window nodes — the
    salted (salt, source) local rank feeding the bounded per-source
    final rank — and no single window over the raw domain key alone
    before pruning."""
    df = REGISTRY["pipeline_domain_caps"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Window") >= 2, plan[:800]
    assert "salt" in plan, "phase-1 salted partition spec missing"


def test_web_cleaning_stack_no_cartesian_no_python_udf(spark, sf_dir):
    """The 4-stage funnel must stay JVM-side and join-sane at 100 TB:
    no CartesianProduct, no Python row UDF anywhere in the fused
    plan."""
    df = REGISTRY["pipeline_web_cleaning_stack"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_gopher_and_c4_line_ops_stay_jvm_side(spark, sf_dir):
    for name in ("text_gopher_line_rules", "text_c4_clean"):
        plan = physical_plan(REGISTRY[name].builder(spark, sf_dir))
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_perplexity_buckets_has_no_window_or_global_sort(spark, sf_dir):
    """pipeline_perplexity_buckets' whole design claim (round 12): the
    per-language bucket assignment must come from a min/max partial
    aggregate broadcast back — never a per-language window or sort,
    which would be a straggler task on the dominant language at
    100 TB. Also JVM-side and join-sane throughout."""
    plan = physical_plan(
        REGISTRY["pipeline_perplexity_buckets"].builder(spark, sf_dir)
    )
    assert "Window" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # the only sorts allowed are SortMergeJoin locals, never a per-lang
    # ordering of the doc stream: the rng join must be broadcast
    assert "BroadcastHashJoin" in plan
    # the corpus explodes exactly once here (scoring side): the model
    # tables re-aggregate the checkpointed c2, never the corpus
    assert plan.count("Generate explode") <= 1, plan.count(
        "Generate explode"
    )


def test_kneser_ney_model_tables_derive_from_c2_once(spark, sf_dir):
    """text_kneser_ney_cross_entropy (round 12): exactly ONE corpus
    bigram explode feeds every model table — the head/tail/scalar
    tables must re-aggregate the vocabulary-bounded c2 table, never
    rescan the corpus. Pinned by counting Generate (explode) nodes.
    JVM-side and join-sane throughout."""
    plan = physical_plan(
        REGISTRY["text_kneser_ney_cross_entropy"].builder(spark, sf_dir)
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    # one Generate per corpus branch: held + train share the explode
    # shape; the model tables must not add more corpus explodes
    assert plan.count("Generate explode") <= 2, plan.count("Generate explode")


def test_heavy_hitters_final_rank_is_bounded(spark, sf_dir):
    """events_heavy_hitters (round-13; r12 VERDICT What's wrong #1):
    the final top-20 must plan as TakeOrderedAndProject (per-partition
    heaps over the candidate re-count), and the rank Window must sit
    ABOVE the take — its input is the 20-row result, never the full
    candidate table (cap x #partitions rows, 10^7+ on a 100-TB
    cluster, through one partition-less window task)."""
    plan = physical_plan(REGISTRY["events_heavy_hitters"].builder(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    # explain prints parents before children: the Window node must
    # appear before (above) the take in the tree
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan[:1500]


def test_sliding_distinct_users_no_range_join(spark, sf_dir):
    """events_sliding_distinct_users (round-13): the window membership
    must be the exploded equi-join against the broadcast day list —
    never a range/nested-loop join or a window function."""
    plan = physical_plan(
        REGISTRY["events_sliding_distinct_users"].builder(spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_token_budget_mixture_single_corpus_shuffle(spark, sf_dir):
    """pipeline_token_budget_mixture (round-15 skew-proof form): the
    corpus pays ONE wide shuffle — the RANGE partition on the fill key
    (lang, h, doc_id) — and the cumsum window partitions by
    (pid, lang), so every sort is partition-local: no corpus-scale
    single-partition sort remains even when one language is half the
    corpus. Quotas and offsets ride broadcast joins; nothing
    cartesian, nothing Python-side."""
    plan = physical_plan(
        REGISTRY["pipeline_token_budget_mixture"].builder(spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" in plan  # the cumsum prefix fill
    # The skew pin: every Window spec in the plan must partition by
    # pid (partition-local cumsum) — a bare windowspecdefinition(lang,
    # ...) would be the r14 per-language single-task sort coming back.
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "pid" in spec, spec
    # (hashpartitioning(lang) exchanges still appear for the per-lang
    # quota/report aggs — those are map-side-combined partials, one
    # row per (task, lang), not corpus rows.)


def test_token_budget_mixture_approx_is_map_only(spark, sf_dir):
    """The approximate form is the scale path: membership decides
    per-row from the hash and a broadcast quota — NO window, NO sort,
    no cartesian; the only shuffles are the tiny per-language aggs."""
    plan = physical_plan(
        REGISTRY["pipeline_token_budget_mixture_approx"].builder(
            spark, sf_dir
        )
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_chunk_documents_is_map_only_before_final_agg(spark, sf_dir):
    """pipeline_chunk_documents (round-14): chunk ranges derive from a
    per-row sequence() + explode — no self-join, no window; the only
    shuffle feeds the per-language aggregate."""
    plan = physical_plan(
        REGISTRY["pipeline_chunk_documents"].builder(spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_vocab_coverage_topk_is_takeordered_no_window(spark, sf_dir):
    """text_vocab_coverage (round-16 re-plan): the global top-K
    vocabulary cut must be an actual K-sized TakeOrdered (per-
    partition heaps + a K-row merge), not a row_number over an
    unpartitioned window — the r15 form single-task-sorted the whole
    distinct-token frequency table. The membership join back over the
    corpus must be broadcast."""
    plan = physical_plan(
        REGISTRY["text_vocab_coverage"].builder(spark, sf_dir)
    )
    assert "TakeOrdered" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
