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
