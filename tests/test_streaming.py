"""Structured Streaming semantics: final streaming state must equal the
batch computation; session windows must honor the inactivity gap."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load


def test_stream_hourly_equals_batch(spark, sf_dir):
    got = REGISTRY["stream_hourly_counts"].builder(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    g = {tuple(map(str, r)) for r in got.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert g == b


def test_stream_dedup_keeps_unique_events(spark, sf_dir):
    got = REGISTRY["stream_dedup"].builder(spark, sf_dir)
    n_events = load(spark, sf_dir, "events").count()
    assert got.count() == n_events  # event_ids are unique in the corpus


def test_stream_session_windows_gap(spark, sf_dir):
    got = REGISTRY["stream_session_windows"].builder(spark, sf_dir)
    rows = got.collect()
    assert rows, "expected at least one session"
    # session count per user must equal the batch lag-gap sessionization
    batch = {
        r.user_id: r.n_sessions
        for r in REGISTRY["events_sessionize"].builder(spark, sf_dir).collect()
    }
    from collections import Counter

    stream_sessions = Counter(r.user_id for r in rows)
    assert dict(stream_sessions) == batch
    # events are conserved across sessions
    total = sum(r.n_events for r in rows)
    assert total == load(spark, sf_dir, "events").count()


def test_stream_stream_interval_join(spark, sf_dir):
    # matches the batch interval join exactly over fully-consumed input
    from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import (
        REGISTRY,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources import load
    from pyspark.sql import functions as F

    got = REGISTRY["stream_click_purchase_join"].builder(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )
    expected = c.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("user_id", "click_id", "click_ts", "purchase_ts", "purchase_value")
    assert expected.count() > 0
    got_set = {tuple(r) for r in got.collect()}
    exp_set = {tuple(r) for r in expected.collect()}
    assert got_set == exp_set
