"""Atomic publication for lake mutations (round-6 VERDICT #3).

The reference's lake inherits S3's atomic object PUT + versioning
(main.tf:25-30): readers never see torn state. publish_overwrite gives
plain-Parquet merge_into/scd2_apply the same guarantee via
stage-then-rename. These tests inject crashes at both phases:

- during the staged WRITE (the expensive Spark job — "kill between
  partition writes"): the live table must stay byte-identical;
- between partition SWAPS: every partition must be fully-old or
  fully-new, never torn;

and prove re-running the batch converges, untouched partitions stay
byte-identical, and leftover artifacts are reclaimed and invisible.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from tf_aws_lakeformation_governed_datalake_demo_spark.sources import (
    load,
    write_partitioned,
)
from tf_aws_lakeformation_governed_datalake_demo_spark.sources import lake as lk


def _snapshot(path: str) -> dict[str, bytes]:
    """Relative path -> content for every data file under ``path``,
    skipping publish artifacts and _SUCCESS markers."""
    root = Path(path)
    out = {}
    for p in root.rglob("*.parquet"):
        rel = p.relative_to(root)
        if any(
            part.startswith(("_staged_", "_trash_")) for part in rel.parts
        ):
            continue
        out[str(rel)] = p.read_bytes()
    return out


@pytest.fixture()
def nation_table(spark, sf_dir):
    """A small partitioned table: nation partitioned by region key."""
    path = tempfile.mkdtemp(prefix="atomic_pub_") + "/nation"
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).withColumn("note", F.lit("v1"))
    write_partitioned(n, path, partition_by=["n_regionkey"])
    return path, n


def _boom_frame(df):
    """A result frame whose evaluation fails partway through the write
    job (a row-conditional failing UDF) — the crash injector."""

    @F.udf("string")
    def boom(name):
        if name >= "M":  # fails on a subset, after some rows succeed
            raise ValueError("injected crash during staged write")
        return name

    return df.withColumn("n_name", boom("n_name"))


def test_crash_during_staged_write_leaves_table_untouched(spark, nation_table):
    path, n = nation_table
    before = _snapshot(path)
    with pytest.raises(Exception):
        lk.publish_overwrite(
            spark, path, _boom_frame(n), partition_by=["n_regionkey"]
        )
    assert _snapshot(path) == before  # byte-identical, every partition
    # reader still sees the old, complete state
    assert spark.read.parquet(path).count() == n.count()
    # leftover staging is invisible but reclaimable
    removed = lk.vacuum_publish_artifacts(path)
    assert any("_staged_" in r for r in removed)
    assert _snapshot(path) == before


def test_crash_during_staged_write_unpartitioned(spark, nation_table):
    path_p, n = nation_table
    path = tempfile.mkdtemp(prefix="atomic_unpart_") + "/nation"
    n.write.parquet(path)
    before = _snapshot(path)
    with pytest.raises(Exception):
        lk.publish_overwrite(spark, path, _boom_frame(n))
    assert _snapshot(path) == before
    lk.vacuum_publish_artifacts(path)
    assert _snapshot(path) == before
    assert not list(Path(path).parent.glob("nation.__staged_*"))


def test_crash_between_partition_swaps_never_torn(spark, nation_table, monkeypatch):
    path, n = nation_table
    before = _snapshot(path)
    updated = n.withColumn("note", F.lit("v2"))

    real_walk = lk._leaf_partition_dirs

    def interrupted(root, depth):
        it = real_walk(root, depth)
        yield next(it)  # first partition flips...
        raise RuntimeError("injected crash between partition swaps")

    monkeypatch.setattr(lk, "_leaf_partition_dirs", interrupted)
    with pytest.raises(RuntimeError):
        lk.publish_overwrite(spark, path, updated, partition_by=["n_regionkey"])
    monkeypatch.undo()

    after = _snapshot(path)
    # every partition is fully-old or fully-new: group files by partition
    def parts(snap):
        by = {}
        for rel, data in snap.items():
            by.setdefault(rel.split("/")[0], {})[rel] = data
        return by

    old_p, new_p = parts(before), parts(after)
    assert set(old_p) == set(new_p)
    n_new = 0
    for part in old_p:
        if new_p[part] == old_p[part]:
            continue  # fully old
        n_new += 1
        # fully new: readable, complete, carries the v2 marker on EVERY row
        dfp = spark.read.parquet(f"{path}/{part}")
        rows = dfp.collect()
        assert rows and all(r.note == "v2" for r in rows)
    assert n_new == 1  # exactly the one flipped partition
    # the whole table still reads clean (no torn files anywhere)
    assert spark.read.parquet(path).count() == n.count()
    # recovery: re-running the full publish converges to all-new
    lk.vacuum_publish_artifacts(path)
    lk.publish_overwrite(spark, path, updated, partition_by=["n_regionkey"])
    assert spark.read.parquet(path).filter(F.col("note") != "v2").count() == 0


def test_merge_crash_then_rerun_converges(spark, nation_table):
    path, n = nation_table
    before = _snapshot(path)
    upd = (
        n.filter(F.col("n_regionkey") == 2)
        .withColumn("note", F.lit("merged"))
    )
    # crash inside the staged write of a real merge
    with pytest.raises(Exception):
        lk.merge_into(
            spark, path, _boom_frame(upd), ["n_nationkey"],
            partition_by=["n_regionkey"],
        )
    assert _snapshot(path) == before
    # re-run with the intact batch: converges, untouched partitions
    # byte-identical
    stats = lk.merge_into(
        spark, path, upd, ["n_nationkey"], partition_by=["n_regionkey"]
    )
    assert stats["partitions_rewritten"] == 1
    after = _snapshot(path)
    untouched_before = {k: v for k, v in before.items() if "n_regionkey=2" not in k}
    untouched_after = {k: v for k, v in after.items() if "n_regionkey=2" not in k}
    assert untouched_before == untouched_after
    got = spark.read.parquet(path).filter(F.col("note") == "merged").count()
    assert got == upd.count()


def test_publish_drops_partitions_emptied_by_deletion(spark, nation_table):
    """A touched partition whose rewrite has ZERO rows must be REMOVED
    (deletion semantics), not silently kept — pinned directly on
    publish_overwrite's drop_missing_partitions contract."""
    path, n = nation_table
    # "delete" region 2 entirely: result has no rows for that partition
    survivors = n.filter(F.col("n_regionkey") != 2)
    lk.publish_overwrite(
        spark,
        path,
        survivors,
        partition_by=["n_regionkey"],
        drop_missing_partitions=["n_regionkey=2"],
    )
    back = spark.read.parquet(path)
    assert back.filter(F.col("n_regionkey") == 2).count() == 0
    assert back.count() == survivors.count()
    assert not (Path(path) / "n_regionkey=2").exists()


def test_concurrent_publishes_never_interleave_partitions(spark, nation_table):
    """Two concurrent full-table publishes: the swap-phase lock makes
    the final state exactly ONE writer's complete result — never a
    partition mix of the two."""
    import threading

    path, n = nation_table
    results = {
        "A": n.withColumn("note", F.lit("writerA")),
        "B": n.withColumn("note", F.lit("writerB")),
    }
    errs = []

    def run(tag):
        try:
            lk.publish_overwrite(
                spark, path, results[tag], partition_by=["n_regionkey"]
            )
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append((tag, ex))

    threads = [threading.Thread(target=run, args=(t,)) for t in ("A", "B")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    notes = {r.note for r in spark.read.parquet(path).select("note").collect()}
    assert notes in ({"writerA"}, {"writerB"})  # one whole result, no mix
    assert spark.read.parquet(path).count() == n.count()


def test_atomic_exchange_swaps_directories(tmp_path):
    """The RENAME_EXCHANGE primitive must truly swap on this platform
    (publication relies on it to keep the live path always-complete;
    the two-rename fallback covers platforms where this returns False)."""
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    (a / "fa").write_text("A")
    (b / "fb").write_text("B")
    assert lk._atomic_exchange(a, b)  # supported here
    assert (a / "fb").exists() and (b / "fa").exists()
