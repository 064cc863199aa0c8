"""Lake readers/writers (SURVEY.md §2.1 S1-S9).

Parquet is the canonical at-rest format (reference: ParquetHiveSerDe +
snappy, main.tf:312-328). Readers take the schema from the parquet footer
— declared, not inferred. At 100 TB each "table" is a directory of many
files (optionally hive-partitioned); `spark.read.parquet(dir)` plans one
split per ~128 MB (`spark.sql.files.maxPartitionBytes`) so scan
parallelism scales with data, not file count.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from the lake directory layout.

    Timestamp normalization (the driver has shipped ``events.ts`` as both
    parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS, no-tz) across rounds):

    - NANOS + ``spark.sql.legacy.parquet.nanosAsLong`` arrives as long
      nanos, converted to a microsecond timestamp by exact integer
      division (``DIV`` — float division would lose precision at 1e18
      ns), matching how DuckDB truncates ns to its us-precision
      TIMESTAMP.
    - MICROS without a timezone is inferred as TIMESTAMP_NTZ by Spark 4
      (``spark.sql.parquet.inferTimestampNTZ.enabled`` default true);
      cast to the session-local TIMESTAMP type — the session timezone is
      pinned to UTC (session.py), so wall values are unchanged and every
      downstream ``unix_micros``/window expression type-checks.
    """
    # Runtime-settable: make nanos parquet readable in ANY session (the
    # correctness driver builds its own SparkSession without our factory),
    # not just sessions created by session.get_spark().
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and isinstance(f_.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif f_.name == "ts" and isinstance(f_.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry point.

    WARNING: do not mix with a governed ``Engine`` in the same session —
    these session-catalog views resolve UNGOVERNED for unqualified names.
    Governed SQL must address tables by their catalog-qualified names
    (``db.table``), which the engine rewrites; keep ungoverned analytics
    sessions and governed engine sessions separate.
    """
    for t in TPCH_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> tuple[int, int]:
    """Small-file compaction: rewrite ``src`` into ~target-size files at
    ``dst``. Returns (files_before, files_after).

    The 100 TB failure mode this fixes: streaming/incremental ingest
    leaves thousands of KB-scale files per partition, and every scan pays
    per-file open/footer costs that dwarf the read itself. Sizing the
    repartition by observed bytes (not row counts) keeps output files
    near the scan-optimal ``spark.sql.files.maxPartitionBytes``.
    """
    import math
    from pathlib import Path

    files = [p for p in Path(src).rglob("*.parquet") if p.is_file()]
    total = sum(p.stat().st_size for p in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if partition_by:
        # One shuffle task per partition value would leave a hot partition
        # as one giant file; maxRecordsPerFile (derived from the observed
        # bytes/row of the source) rolls each task's output into
        # ~target-size files instead. count() on parquet is metadata-only.
        n_rows = df.count()
        bytes_per_row = max(1.0, total / max(1, n_rows))
        max_records = max(1, int(target_file_bytes / bytes_per_row))
        writer = (
            df.repartition(*partition_by)
            .write.mode("overwrite")
            .option("compression", compression)
            .option("maxRecordsPerFile", max_records)
            .partitionBy(*partition_by)
        )
    else:
        writer = (
            df.repartition(n_out)
            .write.mode("overwrite")
            .option("compression", compression)
        )
    writer.parquet(dst)
    n_after = sum(1 for p in Path(dst).rglob("*.parquet") if p.is_file())
    return len(files), n_after


def _reader(spark: SparkSession, schema: T.StructType | None):
    """Lake read path shared by merge/SCD2/as-of: a declared schema (the
    catalog-backed at-scale path — ZERO footer reads) when given, else a
    mergeSchema read (the no-catalog correctness fallback: a distributed
    footer scan that tolerates schema evolution). One definition so a
    read-path change lands in every consumer at once (round-6 review:
    this conditional was copy-pasted at three sites)."""
    return (
        spark.read.schema(schema)
        if schema is not None
        else spark.read.option("mergeSchema", "true")
    )


def _leaf_partition_dirs(root, depth: int):
    """Yield hive leaf partition dirs (``a=1/b=2``) exactly ``depth``
    levels under ``root``, as paths relative to it."""
    from pathlib import Path

    def walk(d: Path, level: int):
        for child in d.iterdir():
            if not (child.is_dir() and "=" in child.name):
                continue
            if level == depth - 1:
                yield child
            else:
                yield from walk(child, level + 1)

    yield from walk(Path(root), 0)


#: Partition-value characters we can map to an on-disk dir name without
#: replicating Hive's escapePathName. Everything our partition columns
#: produce (ints, 'yyyy-MM' months, word tokens) matches; anything Spark
#: would URL-escape (space, '%', ':', '=', ...) does not.
_SAFE_PARTITION_VALUE = re.compile(r"^[A-Za-z0-9._-]+$")


def hive_partition_relpath(partition_by: list[str], values: tuple) -> str:
    """Relative hive directory path for one partition-value tuple, in
    Spark's naming (``a=1/b=x``; NULL becomes the Hive default token).
    Only the value classes our partition columns use (ints, plain
    strings like 'yyyy-MM') are supported — no URL-escaping. Values
    containing characters Spark WOULD escape raise loudly (round-7
    ADVICE): an unescaped relpath silently fails to match the escaped
    on-disk dir name, so publish bookkeeping (partition drops) would
    miss directories and keep stale data."""
    parts = []
    for col, v in zip(partition_by, values):
        if v is None:
            sv = "__HIVE_DEFAULT_PARTITION__"
        else:
            sv = str(v)
            if not _SAFE_PARTITION_VALUE.match(sv):
                raise ValueError(
                    f"partition value {sv!r} for column {col!r} contains "
                    "characters Spark escapes in directory names; this "
                    "engine's publish bookkeeping does not implement Hive "
                    "path escaping — use values matching [A-Za-z0-9._-]+"
                )
        parts.append(f"{col}={sv}")
    return "/".join(parts)


def _restrict_to_partitions(
    cur: DataFrame, touched: DataFrame, part_cols: list[str]
) -> DataFrame:
    """NULL-safe left-semi restriction of ``cur`` to the partition-value
    tuples in ``touched``. A name-list equi-join here is null-rejecting:
    rows whose partition value is NULL (the Hive default partition)
    never match the touched list, silently escaping the rewrite slice —
    under delete_rows the staged write then lacks the NULL-partition dir
    and the drop bookkeeping removes the whole live directory, erasing
    rows the predicate did NOT match (round-7 ADVICE, high)."""
    a, t = cur.alias("__base"), touched.alias("__touched")
    cond = None
    for c in part_cols:
        eq = F.col(f"__base.{c}").eqNullSafe(F.col(f"__touched.{c}"))
        cond = eq if cond is None else (cond & eq)
    return a.join(F.broadcast(t), cond, "left_semi")


def _atomic_exchange(a, b) -> bool:
    """Atomically SWAP two paths in one syscall (Linux ``renameat2``
    with ``RENAME_EXCHANGE``). Returns False when the syscall or the
    filesystem doesn't support it — callers fall back to the two-rename
    dance. The exchange is what removes the last crash window in
    publication: with two renames there is an instant where the live
    partition exists only in trash/staging; with the exchange the live
    path ALWAYS holds a complete tree (old or new)."""
    import ctypes
    import os

    libc = ctypes.CDLL(None, use_errno=True)
    try:
        fn = libc.renameat2
    except AttributeError:
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    r = fn(
        AT_FDCWD,
        os.fsencode(str(a)),
        AT_FDCWD,
        os.fsencode(str(b)),
        RENAME_EXCHANGE,
    )
    return r == 0


def _flock_publish_lock(live_dir):
    """Default single-writer guard for a publish's COMMIT phase: an
    exclusive flock on a hidden sibling lock file (sibling, not
    in-table: the unpartitioned rename dance moves the table dir itself
    away). Advisory and single-host.

    Multi-host note (round-7 VERDICT #5): the reference gets cross-
    writer publication safety from S3 conditional PUTs (compare-and-swap
    on the object generation). Deploying this engine against an object
    store means swapping this hook (module attribute
    :data:`publish_lock`) for the store's CAS equivalent — e.g. a lease
    object written with If-None-Match/x-amz-copy-source-if, or a DynamoDB
    conditional put, held across the commit. The manifest commit makes
    that trivial to retrofit: the serialized region is one pointer
    replace, so a CAS on the pointer object itself (PUT-if-generation-
    matches of ``_manifest.json``) is sufficient — on conflict, re-read
    the manifest and recompute the carried file list. See the design
    note in BASELINE.md ("Multi-host publish coordination").
    """
    import fcntl
    from contextlib import contextmanager

    @contextmanager
    def _ctx():
        live_dir.parent.mkdir(parents=True, exist_ok=True)
        lock_file = live_dir.parent / f".{live_dir.name}.publish.lock"
        fh = open(lock_file, "w")
        try:
            fcntl.flock(fh, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)
            fh.close()

    return _ctx()


#: Pluggable commit-phase lock: a callable ``(live_dir: Path) ->
#: context manager`` serializing publishes of one table. Default is the
#: single-host flock; object-store deployments replace it with a CAS
#: lease (see _flock_publish_lock's multi-host note). Readers never
#: take it.
publish_lock = _flock_publish_lock


class ConstraintViolationError(RuntimeError):
    """An incoming batch violates a table CHECK constraint — the
    commit is refused and the live table is untouched."""


class ConcurrentLakeModificationError(RuntimeError):
    """Another writer committed a manifest snapshot between this
    writer's table read and its commit — committing anyway would
    silently drop that writer's changes (a lost update). The table is
    untouched; re-run the mutation against the current snapshot. The
    lake twin of the catalog's ConcurrentCatalogModificationError."""


def publish_overwrite(
    spark: SparkSession,
    path: str,
    result: DataFrame,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    drop_missing_partitions: list[str] | None = None,
    manifest: bool | None = None,
    bloom_cols: list[str] | None = None,
    expected_version: int | None = None,
    full_rewrite: bool = False,
    app_versions: dict | None = None,
) -> None:
    """Atomic stage-then-rename publication of a (slice) rewrite —
    the commit protocol under merge_into / scd2_apply /
    expire_scd2_versions (round-6 VERDICT #3).

    The reference's lake inherits S3's atomic object PUT + bucket
    versioning (main.tf:25-30), so its readers never observe a torn
    object; plain-Parquet directory overwrites had no equivalent — a
    crash mid-write left partitions half-replaced with old files
    already deleted. This closes that window without Delta/Iceberg
    (environment-blocked, decision recorded round 5):

    1. **Stage.** ``result`` is written COMPLETELY to
       ``<path>/_staged_<txid>`` (partitioned tables) or the sibling
       ``<path>.__staged_<txid>`` (unpartitioned). The ``_``/``.``
       prefixes make staging invisible to every parquet reader of
       ``path``, so a crash anywhere in this phase — the expensive,
       failure-prone part: a full Spark job — leaves the live table
       byte-identical.
    2. **Swap.** Partitioned: each staged leaf partition dir EXCHANGES
       with its live counterpart in one atomic ``renameat2
       RENAME_EXCHANGE`` syscall — the live path holds a complete tree
       (old or new) at every instant, so a kill anywhere, including
       inside a flip, leaves readers and vacuum a consistent table; a
       crash between flips leaves every partition either fully-old or
       fully-new (per-partition atomicity, the granularity
       dynamic-overwrite pretended to have without the safety). On
       platforms without the syscall the flip falls back to two renames
       (old -> ``_trash_<txid>``, staged -> live) with a microsecond
       missing-live window during which the old tree stays complete in
       trash. Unpartitioned: the same exchange on the whole table dir
       (fallback: the rename dance).
    3. **Clean.** Trash and staging remnants are deleted; leftovers
       from a crashed publish are underscore-invisible and reclaimed by
       :func:`vacuum_publish_artifacts`.

    Scale: the protocol adds only O(#touched partitions) renames and no
    extra data movement; the staged write replaces the previous
    dynamic-``partitionOverwriteMode`` write one-for-one (same bytes,
    different directory), and the merged plan no longer needs a
    ``localCheckpoint`` to guard read-write overlap — the staged write
    never targets the directory it reads.

    Manifest mode (round-7 VERDICT #1 — per-TABLE atomicity +
    time travel): with ``manifest=True`` (or auto-detected from an
    existing ``_manifest.json``; ``None`` = auto), the commit is a
    single atomic pointer replace instead of per-partition exchanges:

    1. Stage exactly as above.
    2. MOVE each staged file into the live tree under its (globally
       unique) part-file name — old files are NOT deleted.
    3. Commit: write snapshot ``_manifests/v{N}.json`` naming the
       complete live file set (staged partitions' new files + carried
       untouched-partition files − dropped partitions), then atomically
       replace ``_manifest.json`` with it. Readers
       (:func:`read_table`) list files THROUGH the manifest, so a scan
       planned at any instant sees one committed snapshot — entirely
       old or entirely new, never partition A new + partition B old
       (the residual window exchange mode had). A crash before the
       pointer replace leaves the moved files invisible to manifest
       readers; old snapshots stay readable (:func:`read_table` with
       ``version=``) until :func:`vacuum_manifests` reclaims them.
       This is the plain-Parquet equivalent of the reference's S3
       bucket versioning + consistent listing (main.tf:25-30).

    Exchange mode on a manifest table raises: it would destroy files
    historical manifests reference and leave the pointer stale.

    The swap/commit critical section is serialized by the pluggable
    :data:`publish_lock` (default: single-host flock; see its
    multi-host CAS note). It serializes PUBLICATION, not semantics —
    two writers that both read the pre-state still last-write-wins at
    whole-publish granularity, UNLESS ``expected_version`` is given
    (manifest mode only): the commit then fails with
    :class:`ConcurrentLakeModificationError` when the current snapshot
    is no longer the one the writer read — optimistic concurrency, the
    Delta/Iceberg commit-conflict model. Every rewrite-shaped mutator
    here (merge_into / scd2_apply / delete_rows / compact_in_place)
    passes the version it read, so concurrent rewrites can never
    silently drop each other's rows; plain appends
    (:func:`append_rows`) commute and need no check — they recompute
    the carried file list under the commit lock.
    """
    import shutil
    import uuid as _uuid
    from pathlib import Path

    txid = _uuid.uuid4().hex
    live = Path(path)
    has_manifest = (live / "_manifest.json").exists()
    if manifest is None:
        manifest = has_manifest
    if not manifest and has_manifest:
        raise ValueError(
            f"table at {path} is manifest-committed; an exchange-mode "
            "publish would orphan the manifest pointer and delete files "
            "historical snapshots reference — pass manifest=True (or "
            "leave manifest=None to auto-detect)"
        )
    if manifest:
        _publish_manifest_commit(
            live,
            result,
            partition_by,
            compression,
            drop_missing_partitions,
            txid,
            bloom_cols=bloom_cols,
            expected_version=expected_version,
            full_rewrite=full_rewrite,
            app_versions=app_versions,
        )
        return
    if app_versions is not None:
        raise ValueError(
            "app_versions requires manifest mode — exchange-mode tables "
            "have no snapshot ledger to record it in"
        )
    if bloom_cols:
        raise ValueError(
            "bloom_cols requires manifest mode — exchange-mode tables "
            "have nowhere to record per-file bloom bitmaps"
        )
    if expected_version is not None:
        raise ValueError(
            "expected_version requires manifest mode — exchange-mode "
            "tables have no committed version to check against"
        )
    if partition_by:
        staged = live / f"_staged_{txid}"
        trash = live / f"_trash_{txid}"
        writer = result.write.mode("overwrite").option("compression", compression)
        writer.partitionBy(*partition_by).parquet(str(staged))
        trash.mkdir()
        flipped: set[str] = set()
        with publish_lock(live):
            for leaf in _leaf_partition_dirs(staged, len(partition_by)):
                rel = leaf.relative_to(staged)
                flipped.add(str(rel))
                dst = live / rel
                dst.parent.mkdir(parents=True, exist_ok=True)
                if dst.exists():
                    # preferred: ONE atomic syscall swaps old and new —
                    # the live path never lacks a complete tree, so even
                    # a kill inside the flip leaves readers (and vacuum)
                    # a consistent table; the old tree now sits in the
                    # staged slot, reclaimed with it below.
                    if not _atomic_exchange(leaf, dst):
                        # fallback (non-Linux / exotic fs): two renames
                        # with a microsecond missing-live window; the
                        # old tree stays complete in trash throughout.
                        tomb = trash / rel
                        tomb.parent.mkdir(parents=True, exist_ok=True)
                        dst.rename(tomb)
                        leaf.rename(dst)
                else:
                    leaf.rename(dst)
            # Touched partitions whose rewrite produced ZERO rows have
            # no staged dir to flip in — a deletion-capable caller
            # (expire) names them so their old dirs are REMOVED (one
            # atomic rename to trash each), not silently kept. Without
            # this, a partition whose every row was deleted would
            # survive the publish intact.
            for rel in drop_missing_partitions or []:
                if rel in flipped:
                    continue
                dst = live / rel
                if dst.exists():
                    tomb = trash / rel
                    tomb.parent.mkdir(parents=True, exist_ok=True)
                    dst.rename(tomb)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
    else:
        staged = live.parent / f"{live.name}.__staged_{txid}"
        trash = live.parent / f"{live.name}.__trash_{txid}"
        result.write.mode("overwrite").option("compression", compression).parquet(
            str(staged)
        )
        with publish_lock(live):
            if not live.exists():
                # first publish: nothing to exchange with — the staged
                # tree simply becomes the table (round-7 ADVICE: the
                # exchange/trash dance raised ENOENT here, after the
                # staged write already ran)
                staged.rename(live)
            elif not _atomic_exchange(live, staged):
                live.rename(trash)
                staged.rename(live)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)  # old tree after exchange


def vacuum_publish_artifacts(path: str, min_age_seconds: float = 0.0) -> list[str]:
    """Reclaim staging/trash remnants a crashed publish left behind.
    They are invisible to readers (``_``/``.`` prefixes), so this is
    space hygiene, not correctness; run it before/after batch windows.
    Returns the removed paths.

    ``min_age_seconds`` guards concurrent writers: an artifact younger
    than the threshold may belong to a publish IN PROGRESS in another
    process — deleting its staging mid-write would only fail that
    publish safely (the live table stays old-complete), but failing a
    healthy publish is still wrong. Operational callers (Engine
    ``maintain("vacuum_artifacts")``) should pass an age comfortably
    above their longest rewrite job; 0 (reap everything) suits
    single-writer pipelines and tests."""
    import shutil
    import time
    from pathlib import Path

    live = Path(path)
    removed = []
    candidates = []
    if live.is_dir():
        candidates += [
            p for p in live.iterdir()
            if p.is_dir() and (
                p.name.startswith("_staged_") or p.name.startswith("_trash_")
            )
        ]
    candidates += [
        p for p in live.parent.glob(f"{live.name}.__staged_*")
    ] + [p for p in live.parent.glob(f"{live.name}.__trash_*")]
    cutoff = time.time() - min_age_seconds
    for p in candidates:
        try:
            if p.stat().st_mtime > cutoff:
                continue  # possibly a live publish — leave it
        except OSError:
            pass  # raced with its own cleanup; rmtree below is a no-op
        shutil.rmtree(p, ignore_errors=True)
        removed.append(str(p))
    return removed


def read_manifest(path: str, version: int | None = None) -> dict | None:
    """The committed snapshot of a manifest table: the current one (one
    atomic read of ``_manifest.json``; None when the table is not
    manifest-committed) or a specific retained ``version``
    (``_manifests/v{N}.json``; FileNotFoundError once vacuumed)."""
    import json
    from pathlib import Path

    live = Path(path)
    if version is None:
        ptr = live / "_manifest.json"
        if not ptr.exists():
            return None
        return json.loads(ptr.read_text())
    return json.loads(
        (live / "_manifests" / f"v{version:010d}.json").read_text()
    )


def _retained_chain(path: str, start: dict | None = None):
    """Yield the committed parent chain's manifests newest-first,
    starting at the live pointer (or ``start``, for callers that
    already read it under the commit lock) and stopping at a vacuumed
    (missing) ancestor — THE definition of "retained history" shared
    by timestamp resolution, tagging, and vacuum retention (orphan
    snapshots from crashed commits are never on it). Raises
    FileNotFoundError when the table has no manifest at all."""
    m = start or read_manifest(path)
    if m is None:
        raise FileNotFoundError(
            f"table at {path} is not manifest-committed"
        )
    while m is not None:
        yield m
        if m["parent"] is None:
            return
        try:
            m = read_manifest(path, m["parent"])
        except FileNotFoundError:
            return  # older history vacuumed


def version_at_timestamp(path: str, ts: float) -> int:
    """TIMESTAMP AS OF resolution (Delta's time-travel-by-time): the
    newest RETAINED snapshot on the committed parent chain whose
    ``committed_at`` is <= ``ts`` (epoch seconds). Walks the chain from
    the current pointer (commit times are monotone along it — each
    child commits after its parent), so orphan candidates and crashed
    commits outside the chain are never selected. Raises when ``ts``
    predates the oldest retained snapshot (vacuumed history must fail
    loudly, never silently serve the oldest survivor)."""
    oldest = None
    for m in _retained_chain(path):
        if m["committed_at"] <= ts:
            return m["version"]
        oldest = m
    raise FileNotFoundError(
        f"table at {path} has no retained snapshot committed at or "
        f"before ts={ts} (oldest retained: v{oldest['version']} at "
        f"{oldest['committed_at']}) — history before it was vacuumed "
        "or the table did not exist yet"
    )


_TAG_NAME = re.compile(r"^[A-Za-z0-9._-]+$")


def list_tags(path: str) -> dict[str, int]:
    """Named snapshot tags: ``{name: version}`` (Iceberg tag analog)."""
    import json
    from pathlib import Path

    tf = Path(path) / "_manifests" / "_tags.json"
    try:
        return {k: int(v) for k, v in json.loads(tf.read_text()).items()}
    except (OSError, ValueError):
        return {}


def tag_snapshot(path: str, name: str, version: int | None = None) -> dict:
    """TAG a retained snapshot with a durable name — Iceberg tags on
    plain Parquet. A tag is a named, human-meaningful pointer
    (``audit-2026q3``, ``training-run-17``) resolved by
    ``read_table(tag=)``, and it PINS retention:
    :func:`vacuum_manifests` keeps tagged snapshots and their data
    files regardless of ``keep_last``, so the dataset a model was
    trained on stays byte-reproducible while ordinary history ages
    out. Re-tagging an existing name retargets it (git-tag -f
    semantics; the commit lock serializes). Erasure still dominates:
    :func:`delete_rows` drops ALL tags when it truncates history —
    a right-to-be-forgotten request cannot be pinned around.

    ``version=None`` tags the current snapshot. The version must be on
    the committed parent chain (orphan snapshots from crashed commits
    are not taggable)."""
    import json
    import os
    from pathlib import Path

    if not _TAG_NAME.match(name or ""):
        raise ValueError(f"invalid tag name {name!r} (want {_TAG_NAME.pattern})")
    live = Path(path)
    with publish_lock(live):
        current = read_manifest(path)
        if current is None:
            raise ValueError(
                f"table at {path} is not manifest-committed — nothing to tag"
            )
        if version is None:
            version = current["version"]
        chain = [m["version"] for m in _retained_chain(path, current)]
        if version not in chain:
            raise ValueError(
                f"v{version} is not a retained committed snapshot of "
                f"{path} (chain: {chain})"
            )
        tags = list_tags(path)
        tags[name] = version
        tf = live / "_manifests" / "_tags.json"
        tmp = live / "_manifests" / ".tmp_tags"
        tmp.write_text(json.dumps(tags, sort_keys=True))
        os.replace(tmp, tf)
    return {"name": name, "version": version}


def drop_tag(path: str, name: str) -> bool:
    """Remove a snapshot tag; the snapshot it pinned becomes ordinary
    history (reclaimed by the next :func:`vacuum_manifests` past the
    horizon). Returns whether the tag existed."""
    import json
    import os
    from pathlib import Path

    live = Path(path)
    with publish_lock(live):
        tags = list_tags(path)
        existed = tags.pop(name, None) is not None
        tf = live / "_manifests" / "_tags.json"
        if existed:
            tmp = live / "_manifests" / ".tmp_tags"
            tmp.write_text(json.dumps(tags, sort_keys=True))
            os.replace(tmp, tf)
    return existed


def list_branches(path: str) -> dict[str, dict]:
    """Named branches: ``{name: {"head": version, "base": version}}``
    (Iceberg branch analog). ``base`` is the fork point — the main
    snapshot the branch was created from; it scopes retention
    (:func:`vacuum_manifests` keeps each branch's chain head→base)."""
    import json
    from pathlib import Path

    bf = Path(path) / "_manifests" / "_branches.json"
    try:
        return {
            k: {"head": int(v["head"]), "base": int(v["base"])}
            for k, v in json.loads(bf.read_text()).items()
        }
    except (OSError, ValueError, KeyError, TypeError):
        return {}


def _write_branches(live, branches: dict) -> None:
    import json
    import os

    mdir = live / "_manifests"
    mdir.mkdir(parents=True, exist_ok=True)
    tmp = mdir / ".tmp_branches"
    tmp.write_text(json.dumps(branches, sort_keys=True))
    os.replace(tmp, mdir / "_branches.json")


def branch_head(path: str, name: str) -> dict:
    """The snapshot a branch points at (KeyError for an unknown
    branch). Read it with ``read_table(path, version=head["version"])``
    — branch snapshots are ordinary retained snapshots, just not on
    the main pointer's chain until :func:`fast_forward`."""
    b = list_branches(path)
    if name not in b:
        raise KeyError(f"table at {path} has no branch {name!r}")
    return read_manifest(path, b[name]["head"])


def create_branch(path: str, name: str, version: int | None = None) -> dict:
    """BRANCH a manifest table — the multi-commit generalization of
    write-audit-publish (Iceberg branches on plain Parquet). A branch
    is a named commit pointer forked from a retained main snapshot:
    :func:`append_rows` with ``branch=`` commits real snapshots onto
    it (staged data, constraints, stats — everything a main commit
    gets) while ``_manifest.json`` and every main reader stay
    untouched. Audit the branch at any point
    (``read_table(version=branch_head(...)["version"])``), then
    publish the WHOLE chain with one :func:`fast_forward` pointer
    replace — or walk away: an abandoned branch is invisible and its
    snapshots age out once :func:`drop_branch` unpins them.

    100 TB rationale: a multi-step backfill (N ingest commits + a
    compaction) becomes atomic-at-publication without copying a byte —
    the branch's files land in the live tree exactly like main commits
    (globally unique names), and promotion is one rename syscall no
    matter how many commits or terabytes the branch carries.

    The reference's analog is staging-bucket-then-copy
    (validate.sh's upload flow); this keeps the staging INSIDE the
    table, transactional, and zero-copy. Refuses an existing name
    (drop it first — branches are not retargetable, unlike tags:
    silently moving a branch would orphan its committed chain)."""
    if not _TAG_NAME.match(name or ""):
        raise ValueError(
            f"invalid branch name {name!r} (want {_TAG_NAME.pattern})"
        )
    from pathlib import Path

    live = Path(path)
    with publish_lock(live):
        current = read_manifest(path)
        if current is None:
            raise ValueError(
                f"table at {path} is not manifest-committed — nothing to "
                "branch"
            )
        if version is None:
            version = current["version"]
        chain = [m["version"] for m in _retained_chain(path, current)]
        if version not in chain:
            raise ValueError(
                f"v{version} is not a retained committed snapshot of "
                f"{path} (chain: {chain})"
            )
        branches = list_branches(path)
        if name in branches:
            raise ValueError(
                f"branch {name!r} already exists (head v"
                f"{branches[name]['head']}) — drop_branch() it first"
            )
        branches[name] = {"head": version, "base": version}
        _write_branches(live, branches)
    return {"name": name, "head": version, "base": version}


def drop_branch(path: str, name: str) -> bool:
    """Remove a branch pointer; its unpublished snapshots become
    unretained history (reclaimed by the next :func:`vacuum_manifests`
    past the age guard). Returns whether the branch existed."""
    from pathlib import Path

    live = Path(path)
    with publish_lock(live):
        branches = list_branches(path)
        existed = branches.pop(name, None) is not None
        if existed:
            _write_branches(live, branches)
    return existed


def fast_forward(path: str, name: str) -> dict:
    """Publish a branch: atomically move the MAIN pointer to the
    branch head — one rename syscall, after which every branch commit
    is ordinary main history (time travel walks through it,
    table_changes diffs across it, the app_versions ledger carries).
    Fast-forward only: main's current snapshot must be an ancestor of
    the branch head, i.e. nobody committed to main since the fork —
    otherwise raises :class:`ConcurrentLakeModificationError` (the
    branch was audited against a base main no longer has; re-branch
    from the new main and replay, exactly commit_publish's contract).
    The branch pointer survives (now merely an alias of main) until
    :func:`drop_branch`."""
    import json
    import os
    from pathlib import Path

    live = Path(path)
    with publish_lock(live):
        current = read_manifest(path)
        if current is None:
            raise ValueError(
                f"table at {path} is not manifest-committed"
            )
        head = branch_head(path, name)
        if head["version"] == current["version"]:
            return head  # nothing to publish
        # ancestry walk: main's head must be on the branch chain
        m = head
        on_chain = False
        while m is not None:
            if m["version"] == current["version"]:
                on_chain = True
                break
            if m["parent"] is None or m["parent"] < current["version"]:
                break  # walked past main's version — divergence
            try:
                m = read_manifest(path, m["parent"])
            except FileNotFoundError:
                break  # intermediate vacuumed while unpublished
        if not on_chain:
            raise ConcurrentLakeModificationError(
                f"table at {path} is at v{current['version']}, which is "
                f"not an ancestor of branch {name!r}'s head v"
                f"{head['version']} — main advanced since the fork; "
                "re-branch and replay"
            )
        data = json.dumps(head, sort_keys=True)
        tmp = live / f"._manifest_tmp_ff_{name}"
        tmp.write_text(data)
        os.replace(tmp, live / "_manifest.json")
    return head


def _branch_pinned_manifests(path: str) -> list[dict]:
    """Every snapshot any branch retains: each branch's chain from its
    head down to (and including) its fork base — THE branch retention
    definition shared by vacuum_manifests and verify_table. Missing
    (already-vacuumed) intermediates end that branch's walk."""
    out: list[dict] = []
    for name, ptr in list_branches(path).items():
        try:
            m = read_manifest(path, ptr["head"])
        except FileNotFoundError:
            continue
        while m is not None:
            out.append(m)
            if m["version"] <= ptr["base"] or m["parent"] is None:
                break
            try:
                m = read_manifest(path, m["parent"])
            except FileNotFoundError:
                break
    return out


def count_rows(path: str, version: int | None = None) -> dict | None:
    """Metadata-only COUNT — answer ``count(*)`` (total and per
    hive-partition) from the manifest's recorded per-file footer row
    counts, without planning a scan or reading a byte of data. The
    Iceberg/Delta parity point: a 100 TB table's count is O(#files)
    driver-side arithmetic because every commit already paid one footer
    read per NEW file (the same read that records min/max skipping
    stats; carried files inherit).

    Fail-closed to ``None`` (caller must scan) when:
    - the table is not manifest-committed, or the snapshot predates
      row-count recording (any live file lacks a count), or
    - the snapshot carries merge-on-read delete tombstones — file
      contents and visible rows differ until :func:`purge_deleted_rows`.

    Returns ``{"rows", "partitions", "partition_by", "version"}``;
    ``partitions`` maps each partition DIRECTORY relpath (e.g.
    ``lang=en``, ``""`` for unpartitioned files) to its row count —
    raw hive-encoded values, the same convention as
    :func:`hive_partition_relpath`."""
    m = read_manifest(path, version)
    if m is None:
        return None
    if m.get("delete_predicates"):
        return None  # visibility != file contents until purged
    file_rows = m.get("file_rows", {})
    if any(f not in file_rows for f in m["files"]):
        return None  # pre-recording snapshot: no exact answer here
    parts: dict[str, int] = {}
    for f in m["files"]:
        d = f.rsplit("/", 1)[0] if "/" in f else ""
        parts[d] = parts.get(d, 0) + int(file_rows[f])
    return {
        "rows": sum(parts.values()),
        "partitions": parts,
        "partition_by": list(m.get("partition_by") or []),
        "version": m["version"],
    }


def _data_file_relpaths(live) -> list[str]:
    """Visible data files under a table root, relative to it —
    excluding staging/trash/manifest artifacts (underscore/dot path
    components are invisible to parquet readers anyway)."""
    return sorted(
        str(p.relative_to(live))
        for p in live.rglob("*.parquet")
        if p.is_file()
        and not any(
            part.startswith(("_", ".")) for part in p.relative_to(live).parts
        )
    )


def _candidate_file_relpaths(live) -> set[str]:
    """Data files belonging to staged-but-uncommitted write-audit-publish
    candidates (their ``new_files`` — carried files belong to committed
    snapshots). These live in the visible tree but are NOT table data:
    first-commit file adoption and "has data but no manifest" checks
    must ignore them, or a concurrent first publish would adopt a
    never-audited candidate's files into the committed snapshot."""
    import json as _json

    out: set[str] = set()
    mdir = live / "_manifests"
    if not mdir.is_dir():
        return out
    for cp in mdir.glob("candidate_*.json"):
        try:
            out |= set(_json.loads(cp.read_text())["new_files"])
        except (OSError, ValueError, KeyError):
            continue
    return out


#: String min/max longer than this are not recorded in manifest file
#: stats: a truncated upper bound would be WRONG (smaller than the true
#: max), and storing megabyte text bounds bloats the manifest. Missing
#: stats fail OPEN — the file is always scanned.
_STATS_MAX_STR = 256


def _file_column_stats(fpath) -> dict[str, list]:
    """Per-file column min/max from the parquet FOOTER (no data read),
    folded across row groups — the Iceberg-style planning stats a
    manifest commit records so readers can skip files without touching
    them. Conservative by construction: only top-level int/float/str/
    bool columns with writer-provided statistics are recorded; NaN
    bounds, bytes/timestamps, nested paths, and oversized string bounds
    are dropped (fail-open: an unrecorded column never prunes)."""
    return _file_footer_info(fpath)[0]


def _file_footer_info(fpath) -> tuple[dict[str, list], int | None]:
    """(column min/max stats, exact row count) from ONE parquet footer
    read — the commit-time cost that buys both planning-time file
    skipping (``file_stats``) and metadata-only COUNT
    (:func:`count_rows`, ``file_rows``)."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fpath).metadata
    except Exception:
        return {}, None
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if name in bad or "." in name:
                bad.add(name)
                continue
            try:
                # pyarrow RAISES (ArrowNotImplementedError) rather than
                # returning None for stats it cannot cast (e.g. decimal
                # columns) — fail-open per column, same as a missing
                # stat: an unrecorded column never prunes
                st = col.statistics
                if st is None or not st.has_min_max:
                    bad.add(name)
                    continue
                mn, mx = st.min, st.max
            except Exception:
                bad.add(name)
                continue
            ok = all(
                isinstance(v, (bool, int, float, str))
                and not (isinstance(v, float) and v != v)
                and not (isinstance(v, str) and len(v) > _STATS_MAX_STR)
                for v in (mn, mx)
            )
            if not ok:
                bad.add(name)
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return (
        {n: [mins[n], maxs[n]] for n in mins if n not in bad},
        md.num_rows,
    )


#: Bits per (file, column) bloom bitmap recorded in the manifest
#: (2 KB bitmap -> 4 KB hex per file per column). k=2 md5-derived
#: positions, the same engine-independent dialect the operators'
#: semi-join bloom uses. Sized for ~10k distinct keys/file at <3%
#: false-positive rate; at larger files-per-key counts the bitmap
#: belongs in sidecar index files (the Iceberg/Puffin model) rather
#: than inline JSON — recorded as the scale note, not implemented.
_FILE_BLOOM_BITS = 16384


def _bloom_probe_positions(value) -> tuple[int, int]:
    """The two bit positions a value occupies in a per-file bloom —
    Python twin of the Spark-side expression in
    :func:`_staged_file_blooms` (md5 of the string form; int and string
    columns only, where Spark's cast-to-string and Python's str agree).
    """
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    return int(h[0:4], 16) % _FILE_BLOOM_BITS, int(h[4:8], 16) % _FILE_BLOOM_BITS


def _staged_file_blooms(
    spark: SparkSession, staged, cols: list[str]
) -> dict[str, dict[str, str]]:
    """Per-file bloom bitmaps over ``cols``, computed from the STAGED
    tree in ONE Spark job before the commit: each row contributes two
    md5-derived bit positions per column, distinct (file, col, pos)
    triples come back bounded by #files x #cols x bits, and the driver
    packs them into hex bitmaps. Only int/string columns are recorded
    (float/bool string forms differ between engines) — anything else
    fails OPEN at read time, same contract as file_stats. NULLs set no
    bits (a NULL never point-prunes)."""
    df = spark.read.parquet(str(staged))
    types = dict(df.dtypes)
    usable = [
        c
        for c in cols
        if types.get(c) in ("tinyint", "smallint", "int", "bigint", "string")
    ]
    if not usable:
        return {}
    structs = []
    for c in usable:
        h = F.md5(F.col(c).cast("string"))
        for off in (1, 5):
            structs.append(
                F.struct(
                    F.lit(c).alias("c"),
                    (
                        F.conv(F.substring(h, off, 4), 16, 10).cast("long")
                        % _FILE_BLOOM_BITS
                    ).alias("p"),
                )
            )
    rows = (
        df.select(
            F.input_file_name().alias("f"),
            F.explode(F.array(*structs)).alias("cp"),
        )
        .select("f", "cp.c", "cp.p")
        .filter(F.col("p").isNotNull())
        .distinct()
        .collect()
    )
    staged_uri = staged.resolve().as_uri()
    bitmaps: dict[str, dict[str, bytearray]] = {}
    for r in rows:
        rel = r.f.split(staged_uri + "/", 1)[-1]
        bm = bitmaps.setdefault(rel, {}).setdefault(
            r.c, bytearray(_FILE_BLOOM_BITS // 8)
        )
        bm[r.p // 8] |= 1 << (r.p % 8)
    return {
        rel: {c: bm.hex() for c, bm in by_col.items()}
        for rel, by_col in bitmaps.items()
    }


def _bloom_may_contain(hex_bitmap: str, value) -> bool:
    """Membership test against a recorded per-file bloom. False means
    PROVABLY absent; True means possibly present (scan the file)."""
    p1, p2 = _bloom_probe_positions(value)
    bm = bytes.fromhex(hex_bitmap)
    return bool(bm[p1 // 8] & (1 << (p1 % 8))) and bool(
        bm[p2 // 8] & (1 << (p2 % 8))
    )


def _applicable_tombstones(m: dict, f: str) -> frozenset:
    """The delete tombstones of snapshot ``m`` that cover file ``f``,
    as a frozenset of (pred, scope) pairs — identity that is stable
    across snapshots (indices are not: pruning renumbers)."""
    preds = m.get("delete_predicates")
    if not preds:
        return frozenset()
    av = m.get("file_added", {}).get(f, 0)
    return frozenset(
        (p["pred"], p["scope"]) for p in preds if av <= p["scope"]
    )


def _keep_filter(df: DataFrame, tombstones) -> DataFrame:
    """Apply delete tombstones as keep-filters. Three-valued logic
    matches :func:`delete_rows`: a row where the predicate evaluates
    NULL was NOT matched by the delete and is therefore KEPT."""
    for pred_sql, _scope in sorted(tombstones):
        raw = F.expr(pred_sql).cast("boolean")
        df = df.filter(~F.coalesce(raw, F.lit(False)))
    return df


def _phys_name(m: dict, logical: str) -> str:
    """A column's FROZEN physical (in-file) name under the snapshot's
    rename mapping (:func:`rename_column`). Identity when unmapped."""
    return (m.get("column_mapping") or {}).get(logical, logical)


def _physical_schema(
    m: dict, schema: T.StructType | None
) -> T.StructType | None:
    """The logical schema with field names swapped to their physical
    (in-file) counterparts — what the parquet scan must be declared
    with on a renamed table."""
    mapping = m.get("column_mapping") or {}
    if schema is None or not mapping:
        return schema
    return T.StructType(
        [
            T.StructField(
                mapping.get(f.name, f.name), f.dataType, f.nullable, f.metadata
            )
            for f in schema.fields
        ]
    )


def _to_logical(df: DataFrame, m: dict) -> DataFrame:
    """Alias a physically-named scan back to logical column names."""
    mapping = m.get("column_mapping") or {}
    if not mapping:
        return df
    inv = {p: l for l, p in mapping.items()}
    return df.select([F.col(c).alias(inv.get(c, c)) for c in df.columns])


def _to_physical_df(df: DataFrame, m: dict) -> DataFrame:
    """Alias a logically-named result to physical names for staging —
    files always carry the frozen physical names, so one file never
    needs rewriting no matter how often the table renames."""
    mapping = m.get("column_mapping") or {}
    if not mapping:
        return df
    return df.select([F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def _spec_scan(
    spark: SparkSession,
    path: str,
    m: dict,
    files: list[str],
    schema: T.StructType | None,
) -> DataFrame:
    """Scan ``files`` grouped by the partition spec each was written
    under (:func:`evolve_partitioning`). Hive partition recovery
    requires every file of one parquet relation to share a directory
    layout, so a partition-evolved snapshot scans one relation per
    spec and unions by name — with the declared schema, a column that
    is a partition directory in one spec and a data column in another
    materializes identically in both groups. Single-spec snapshots
    (the common case) take the one-relation fast path unchanged.

    On a renamed table (:func:`rename_column`) the scan is declared
    with the frozen PHYSICAL schema and aliased back to logical names
    at the end — a projection Catalyst collapses into the scan."""
    from pathlib import Path

    live = Path(path)
    phys = _physical_schema(m, schema)

    def _one(fs: list[str]) -> DataFrame:
        return (
            _reader(spark, phys)
            .option("basePath", path)
            .parquet(*[str(live / f) for f in fs])
        )

    specs = m.get("partition_specs")
    if not specs:
        return _to_logical(_one(files), m)
    fspec = m.get("file_spec", {})
    default = m.get("default_spec")
    groups: dict[str, list[str]] = {}
    for f in files:
        groups.setdefault(fspec.get(f, default), []).append(f)
    parts = [_one(fs) for _, fs in sorted(groups.items())]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _to_logical(out, m)


def _masked_scan(
    spark: SparkSession,
    path: str,
    m: dict,
    files: list[str],
    schema: T.StructType | None,
) -> DataFrame:
    """Scan ``files`` of manifest snapshot ``m`` with its merge-on-read
    delete tombstones applied. Zero overhead when the snapshot carries
    none (the common case — one scan, no union). With tombstones, files
    are grouped by their applicable tombstone SET (after k deletes the
    groups nest, so there are at most k+1, typically 2: old files under
    the tombstones, post-delete files clean); each group is one scan
    with its keep-filters — plain Catalyst filters above the file scan,
    no join, no shuffle — unioned by name. Each group scan is itself
    spec-aware (:func:`_spec_scan`) on partition-evolved tables."""

    def _scan(fs: list[str]) -> DataFrame:
        return _spec_scan(spark, path, m, fs, schema)

    if not m.get("delete_predicates"):
        return _scan(files)
    groups: dict[frozenset, list[str]] = {}
    for f in files:
        groups.setdefault(_applicable_tombstones(m, f), []).append(f)
    parts = [
        _keep_filter(_scan(fs), key)
        for key, fs in sorted(groups.items(), key=lambda kv: sorted(kv[0]))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _commit_manifest(
    live,
    files: list[str],
    partition_by,
    parent: dict | None,
    txid: str,
    app_versions: dict | None = None,
    file_blooms: dict | None = None,
    file_stats_hints: dict | None = None,
    table_schema: dict | None = None,
    delete_predicates: list | None = None,
    file_added_hints: dict | None = None,
    constraints: dict | None = None,
    partition_specs: dict | None = None,
    file_spec: dict | None = None,
    file_rows_hints: dict | None = None,
    column_mapping: dict | None = None,
    update_pointer: bool = True,
) -> dict:
    """Write snapshot ``_manifests/v{N}.json`` then atomically replace
    the ``_manifest.json`` pointer with the same content (``os.replace``
    — one rename syscall, the whole commit). ``update_pointer=False``
    writes the snapshot WITHOUT moving the main pointer — a branch
    commit (:func:`append_rows` ``branch=``): the caller advances its
    branch pointer under the same lock instead. A crash between the two
    writes leaves an orphan snapshot file outside the committed parent
    chain: harmless (its data files are still invisible to manifest
    readers) and overwritten-or-vacuumed later; version numbering skips
    past it.

    Every commit records per-file column min/max (``file_stats``) for
    planning-time skipping (:func:`read_table` ``prune=``): files
    carried from the parent snapshot inherit their recorded stats
    (zero I/O); only NEW files pay one footer read each — the cost
    Iceberg pays at write time, amortized identically.

    ``app_versions`` is the per-writer idempotence ledger (Delta's
    ``txn`` appId/version analog): ``{stream_id: last_batch_id}``.
    ``None`` (every non-append commit) CARRIES the parent's ledger
    unchanged — a merge or rollback between stream batches must not
    reset a sink's high-water mark, or the next restart would
    double-append replayed batches.

    ``file_added`` (always recorded) maps each data file to the
    version that ADDED it — the Iceberg data-sequence-number analog.
    It scopes ``delete_predicates`` (merge-on-read DELETE,
    :func:`delete_rows_mor`): a tombstone ``{"pred": sql, "scope": V}``
    suppresses matching rows ONLY in files with
    ``file_added <= scope`` — files committed after the delete are
    never affected, so appends/merges land clean data without
    consulting history. ``delete_predicates=None`` carries the
    parent's tombstones; either way tombstones no longer covering any
    live file (every covered file was rewritten or vacuumed) are
    pruned here, which is why a full rewrite or a targeted
    :func:`purge_deleted_rows` clears them with no explicit step."""
    import json
    import os
    import time

    mdir = live / "_manifests"
    mdir.mkdir(parents=True, exist_ok=True)
    existing = [
        int(p.stem[1:]) for p in mdir.glob("v*.json") if p.stem[1:].isdigit()
    ]
    parent_version = parent["version"] if parent else 0
    version = max([parent_version, *existing], default=0) + 1
    parent_stats = (parent or {}).get("file_stats", {})
    parent_rows = (parent or {}).get("file_rows", {})
    file_stats = {}
    file_rows = {}
    for f in sorted(files):
        # hint lookup first (rollback supplies the TARGET snapshot's
        # recorded stats so a restore never re-reads footers), then the
        # parent's, then ONE footer read for a genuinely new file —
        # which yields both the skipping stats AND the exact row count
        # (metadata-only COUNT, :func:`count_rows`)
        s = (file_stats_hints or {}).get(f) or parent_stats.get(f)
        r = (file_rows_hints or {}).get(f)
        if r is None:
            r = parent_rows.get(f)
        if s is None or r is None:
            st, nr = _file_footer_info(live / f)
            s = s if s is not None else st
            r = r if r is not None else nr
        if s:
            file_stats[f] = s
        if r is not None:
            file_rows[f] = r
    if app_versions is None:
        app_versions = (parent or {}).get("app_versions", {})
    parent_blooms = (parent or {}).get("file_blooms", {})
    blooms = {}
    for f in sorted(files):
        b = (file_blooms or {}).get(f) or parent_blooms.get(f)
        if b:
            blooms[f] = b
    # sequence numbers: hint (rollback restores the target's) > parent's
    # recorded value > 0 for a pre-tracking legacy file (oldest scope —
    # every tombstone applies) > this commit's version for a new file
    parent_added = (parent or {}).get("file_added", {})
    parent_files = set((parent or {}).get("files", []))
    file_added = {}
    for f in sorted(files):
        if file_added_hints and f in file_added_hints:
            file_added[f] = file_added_hints[f]
        elif f in parent_added:
            file_added[f] = parent_added[f]
        elif f in parent_files:
            file_added[f] = 0
        else:
            file_added[f] = version
    if delete_predicates is None:
        delete_predicates = (parent or {}).get("delete_predicates", [])
    delete_predicates = [
        p
        for p in delete_predicates
        if any(file_added[f] <= p["scope"] for f in files)
    ]
    # Partition evolution bookkeeping (round-8): when any live file was
    # written under a retired partition spec (evolve_partitioning), the
    # snapshot carries the spec table + per-file spec map. Inheritance
    # mirrors file_stats: carried files keep their recorded spec, new
    # files get the committing writer's spec (writers are pinned to the
    # current default by the append/publish layout guards). The moment
    # every live file is back on the default spec — a full rewrite /
    # OPTIMIZE — the keys are dropped and the table heals to the plain
    # single-spec form.
    pb_now = list(partition_by or [])
    if partition_specs is None:
        parent_specs = (parent or {}).get("partition_specs")
        if parent_specs:
            parent_fspec = (parent or {}).get("file_spec", {})
            sid = next(
                (k for k, v in parent_specs.items() if list(v) == pb_now),
                None,
            )
            if sid is None:
                raise ValueError(
                    f"commit partition_by {pb_now} matches no spec "
                    "recorded on this partition-evolved table — change "
                    "layouts with evolve_partitioning()"
                )
            partition_specs = dict(parent_specs)
            file_spec = {f: parent_fspec.get(f, sid) for f in files}
    default_sid = None
    if partition_specs:
        default_sid = next(
            (k for k, v in partition_specs.items() if list(v) == pb_now),
            None,
        )
        if default_sid is None:
            raise ValueError(
                f"partition_specs records no spec for partition_by {pb_now}"
            )
        file_spec = {f: (file_spec or {}).get(f, default_sid) for f in files}
        live_sids = set(file_spec.values())
        if live_sids <= {default_sid}:
            partition_specs = None  # healed: every file on the default
            file_spec = None
        else:
            partition_specs = {
                k: v
                for k, v in partition_specs.items()
                if k in live_sids or k == default_sid
            }
    snap = {
        "version": version,
        "parent": parent["version"] if parent else None,
        "txid": txid,
        "partition_by": list(partition_by or []),
        "files": sorted(files),
        "file_stats": file_stats,
        "file_added": file_added,
        "committed_at": time.time(),
    }
    if file_rows:
        snap["file_rows"] = file_rows
    if partition_specs:
        snap["partition_specs"] = {
            k: list(v) for k, v in partition_specs.items()
        }
        snap["default_spec"] = default_sid
        snap["file_spec"] = dict(file_spec)
    if delete_predicates:
        snap["delete_predicates"] = list(delete_predicates)
    if app_versions:
        snap["app_versions"] = dict(app_versions)
    if blooms:
        snap["file_blooms"] = blooms
    if table_schema is None:
        table_schema = (parent or {}).get("schema")
    if table_schema:
        snap["schema"] = table_schema
    if constraints is None:
        constraints = (parent or {}).get("constraints", {})
    if constraints:
        snap["constraints"] = dict(constraints)
    # rename mapping (rename_column): None carries the parent's; an
    # explicit {} clears it (full-rewrite migration / rename-back heal)
    if column_mapping is None:
        column_mapping = (parent or {}).get("column_mapping", {})
    if column_mapping:
        snap["column_mapping"] = dict(column_mapping)
    data = json.dumps(snap, sort_keys=True)
    tmp = mdir / f".tmp_{txid}"
    tmp.write_text(data)
    os.replace(tmp, mdir / f"v{version:010d}.json")
    if update_pointer:
        tmp2 = live / f"._manifest_tmp_{txid}"
        tmp2.write_text(data)
        os.replace(tmp2, live / "_manifest.json")
    return snap


def _move_staged_in(live, staged, staged_files) -> list[str]:
    """Move a staged tree's files into the live tree under their
    (globally unique) part names — the shared commit step of
    :func:`_publish_manifest_commit` and :func:`append_rows`. Old files
    are never touched; a name collision means the same staged tree is
    being committed twice."""
    new_files = []
    for rel in staged_files:
        dst = live / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        if dst.exists():
            raise FileExistsError(f"data file collision at {dst}")
        (staged / rel).rename(dst)
        new_files.append(str(rel))
    return new_files


def _publish_manifest_commit(
    live,
    result: DataFrame,
    partition_by: list[str] | None,
    compression: str,
    drop_missing_partitions: list[str] | None,
    txid: str,
    bloom_cols: list[str] | None = None,
    expected_version: int | None = None,
    full_rewrite: bool = False,
    app_versions: dict | None = None,
) -> None:
    """Manifest-mode publish body (see publish_overwrite's contract):
    ``app_versions`` (None = carry the parent's) lets a caller commit a
    WATERMARK atomically with the state it describes — the MV refresh
    records the source snapshot its stored aggregates reflect in the
    same pointer replace (the Delta ``txn`` pattern on a rewrite).
    stage, move files in under unique names (old files retained), then
    commit with one atomic pointer replace. A conflict raise
    (``expected_version`` mismatch) happens BEFORE any file moves, so
    a failed optimistic commit leaves the live tree byte-identical.

    ``full_rewrite=True`` (compact_in_place / OPTIMIZE) declares that
    ``result`` IS the complete table: nothing is carried even on a
    partitioned layout. It is also the one rewrite allowed on a
    partition-evolved table — a partial (replaced-partitions) rewrite
    there is refused, because files written under a retired spec live
    in directories the new spec's staged tree can never replace, so
    rows of a "touched" logical partition would silently survive in
    old-spec files."""
    import shutil
    from pathlib import Path

    pre = read_manifest(str(live)) or {}
    pre_constraints = pre.get("constraints", {})
    pre_mapping = pre.get("column_mapping", {})
    # the recorded schema is always LOGICAL; files carry the frozen
    # physical names (rename_column). A full rewrite writes fresh files
    # under the logical names — the rename's OPTIMIZE-style migration,
    # after which the mapping heals away (committed below)
    logical_schema = result.schema.jsonValue()
    if pre_mapping and not full_rewrite:
        result = _to_physical_df(result, pre)
    staged = live / f"_staged_{txid}"
    writer = result.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(staged))
    staged_files = sorted(
        p.relative_to(staged)
        for p in staged.rglob("*.parquet")
        if p.is_file()
    )
    try:
        if staged_files:
            _enforce_constraints(
                result.sparkSession,
                staged,
                pre_constraints,
                mapping={} if full_rewrite else pre_mapping,
            )
    except ConstraintViolationError:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    if bloom_cols and pre_mapping and not full_rewrite:
        # staged files carry physical names; bitmaps key on them too
        bloom_cols = [pre_mapping.get(c, c) for c in bloom_cols]
    new_blooms = (
        _staged_file_blooms(result.sparkSession, staged, bloom_cols)
        if bloom_cols
        else {}
    )
    try:
        with publish_lock(live):
            current = read_manifest(str(live))
            if (current or {}).get("constraints", {}) != pre_constraints:
                raise ConcurrentLakeModificationError(
                    f"table at {live} changed its CHECK constraints while "
                    "this publish was staging — the batch was validated "
                    "against the old set; re-run"
                )
            if (current or {}).get("column_mapping", {}) != pre_mapping:
                raise ConcurrentLakeModificationError(
                    f"table at {live} renamed columns while this publish "
                    "was staging — the batch was written under the old "
                    "physical names; re-run"
                )
            if expected_version is not None:
                actual = current["version"] if current else 0
                if actual != expected_version:
                    raise ConcurrentLakeModificationError(
                        f"table at {live} is at snapshot v{actual}, but "
                        f"this rewrite was computed against v"
                        f"{expected_version} — committing would drop the "
                        "intervening writer's changes; re-run against "
                        "the current snapshot"
                    )
            if partition_by and current is not None:
                cur_pb = current.get("partition_by", [])
                if cur_pb != list(partition_by):
                    raise ValueError(
                        f"publish partition_by {list(partition_by)} does "
                        f"not match the table's committed layout {cur_pb}"
                        " — change layouts with evolve_partitioning()"
                    )
                if current.get("partition_specs") and not full_rewrite:
                    raise ValueError(
                        f"table at {live} is partition-evolved (files "
                        "under retired spec(s) remain): a partial "
                        "rewrite cannot replace old-spec files' "
                        "directories — compact_in_place() it first to "
                        "migrate every file to the current spec"
                    )
            prev_files = (
                current["files"]
                if current is not None
                # first commit adopts pre-existing visible files — but
                # never a staged WAP candidate's (unaudited data must
                # not ride a concurrent first publish into the snapshot)
                else sorted(
                    set(_data_file_relpaths(live))
                    - _candidate_file_relpaths(live)
                )
            )
            new_files = _move_staged_in(live, staged, staged_files)
            if full_rewrite:
                carried = []  # result IS the whole table
            elif partition_by:
                # partitions present in the staged tree are REPLACED;
                # ones the caller names as emptied are DROPPED;
                # everything else is carried forward untouched
                replaced = {str(Path(f).parent) for f in new_files}
                dropped = set(drop_missing_partitions or [])
                carried = [
                    f
                    for f in prev_files
                    if str(Path(f).parent) not in replaced
                    and str(Path(f).parent) not in dropped
                ]
            else:
                carried = []  # whole-table publish
            _commit_manifest(
                live,
                [*carried, *new_files],
                partition_by,
                current,
                txid,
                app_versions=app_versions,
                file_blooms=new_blooms,
                table_schema=logical_schema,
                # a full rewrite just wrote every live file under the
                # logical names — the rename mapping heals away
                column_mapping={} if full_rewrite else None,
            )
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
    as_of_timestamp: float | None = None,
    tag: str | None = None,
    branch: str | None = None,
) -> DataFrame:
    """THE lake read path: manifest-aware, schema-declared when given.
    ``tag=`` reads the snapshot a named tag pins (:func:`tag_snapshot`)
    — exactly VERSION AS OF at the tag's resolved version; ``branch=``
    reads a branch's head (:func:`create_branch`) — the audit read of
    a staged multi-commit ingest before :func:`fast_forward`.

    On a manifest table the scan lists files through the committed
    snapshot (``version=None`` → current; ``version=N`` → time travel
    to any retained snapshot), with ``basePath`` set so hive partition
    columns still materialize. The file list is fixed at PLANNING time
    and publishes never delete committed files (only
    :func:`vacuum_manifests` does), so a reader concurrent with any
    number of publishes sees exactly one snapshot — the per-table
    atomicity the reference gets from S3 consistent listing. Non-
    manifest tables read the directory as before (per-partition
    atomicity via renameat2 exchange).

    When ``schema`` is declared the result's column ORDER matches it
    too: Spark always appends hive partition columns after the data
    columns, so without the final projection a declared
    ``(user_id, bucket, ...)`` read of a bucket-partitioned table would
    come back ``(user_id, ..., bucket)`` — breaking positional
    consumers (collect-tuple comparisons, UNION by position). The
    projection is a no-op for Catalyst when the order already
    matches.

    ``prune={"col": (lo, hi)}`` (inclusive bounds, ``None`` = open
    end) skips files whose manifest-recorded [min, max] cannot
    intersect the given range — planning-time file elimination with
    ZERO footer reads at query time (the stats were paid for once, at
    commit). A SCALAR value (``prune={"col": v}``) is a point lookup:
    min/max pruning with lo = hi = v, AND membership against the
    per-file bloom bitmaps when the commit recorded them
    (``bloom_cols=``) — the mechanism that still prunes when the
    layout is hash-clustered and every file spans the full key range
    (min/max useless, bloom decisive). Pruning is I/O elimination
    only, never a filter: callers still apply the actual predicate, so
    a column or file without recorded stats/blooms fails OPEN
    (scanned, then filtered), and bloom false positives only cost a
    scan. Non-manifest tables ignore ``prune``."""

    def _ordered(df: DataFrame) -> DataFrame:
        if schema is not None and df.columns != list(schema.names):
            df = df.select(*schema.names)
        return df

    if branch is not None:
        if version is not None or as_of_timestamp is not None or tag is not None:
            raise ValueError(
                "pass branch= alone, not with version=/as_of_timestamp=/tag="
            )
        version = branch_head(path, branch)["version"]  # KeyError if unknown
    if tag is not None:
        if version is not None or as_of_timestamp is not None:
            raise ValueError(
                "pass tag= alone, not with version=/as_of_timestamp="
            )
        tags = list_tags(path)
        if tag not in tags:
            raise ValueError(
                f"no tag {tag!r} on {path} (tags: {sorted(tags)})"
            )
        version = tags[tag]
    if as_of_timestamp is not None:
        # TIMESTAMP AS OF: resolve to the newest retained snapshot
        # committed at or before the instant, then read it exactly like
        # VERSION AS OF (tombstones, stats, schema all snapshot-scoped)
        if version is not None:
            raise ValueError(
                "pass version= or as_of_timestamp=, not both"
            )
        version = version_at_timestamp(path, as_of_timestamp)
    m = read_manifest(path, version)
    if m is None:
        if version is not None:
            raise FileNotFoundError(
                f"table at {path} has no manifest snapshot v{version}"
            )
        return _ordered(_reader(spark, schema).parquet(path))
    if schema is None and m.get("schema"):
        # snapshots record the writer's schema (round-8): a schema-less
        # read of a manifest table is still a DECLARED read — no
        # inference from an arbitrary footer, no mergeSchema job, and
        # schema-evolved columns can never be lost to an old file's
        # footer winning the race
        schema = T.StructType.fromJson(m["schema"])
    elif schema is not None and version is not None:
        # Explicitly-declared schema on a HISTORICAL read (the governed
        # VERSION/TIMESTAMP/TAG AS OF path): the caller speaks the
        # CURRENT logical names, so translate through the LIVE
        # pointer's rename mapping, not the target era's. Physical
        # names are frozen per column identity across every era, so
        # physicalizing via the live mapping reads the right in-file
        # column from snapshots before, between, and after any number
        # of renames — a pre-rename snapshot then materializes under
        # the caller's current names instead of silently NULL-filling
        # a column that "did not exist yet" under its old name.
        cur = read_manifest(path)
        m = {**m, "column_mapping": (cur or {}).get("column_mapping", {})}
    from pathlib import Path

    live = Path(path)
    kept = m["files"]
    if prune:
        stats = m.get("file_stats", {})
        blooms = m.get("file_blooms", {})
        bounds: dict[str, tuple] = {}
        points: dict[str, object] = {}
        for col, bound in prune.items():
            col = _phys_name(m, col)  # stats/blooms key on in-file names
            if isinstance(bound, (tuple, list)):
                bounds[col] = tuple(bound)
            else:
                bounds[col] = (bound, bound)
                # bloom bits were set from Spark's cast-to-string of an
                # int/string column; only probe when Python's str() is
                # guaranteed to produce the same text (int or str, never
                # bool/float — str(1.0) != CAST(1 AS STRING), and a
                # false NEGATIVE here would silently drop rows). Other
                # types fail OPEN to the min/max check + real filter.
                if isinstance(bound, str) or (
                    isinstance(bound, int) and not isinstance(bound, bool)
                ):
                    points[col] = bound

        def _survives(f: str) -> bool:
            fs = stats.get(f)
            for col, (lo, hi) in bounds.items():
                if fs is None or col not in fs:
                    continue  # no stats recorded — fail open
                mn, mx = fs[col]
                if (hi is not None and mn > hi) or (
                    lo is not None and mx < lo
                ):
                    return False
            fb = blooms.get(f)
            for col, v in points.items():
                if fb is None or col not in fb:
                    continue  # no bloom recorded — fail open
                if not _bloom_may_contain(fb[col], v):
                    return False
            return True

        kept = [f for f in kept if _survives(f)]
    files = [str(live / f) for f in kept]
    if not files:
        if schema is not None:
            return spark.createDataFrame([], schema)
        if m["files"]:
            # everything pruned away, no declared schema: plan ONE
            # file's footer for the shape, emit zero rows
            return _to_logical(
                _reader(spark, None)
                .option("basePath", path)
                .parquet(str(live / m["files"][0]))
                .limit(0),
                m,
            )
        raise ValueError(
            f"manifest v{m['version']} at {path} is empty and no "
            "schema was declared — cannot synthesize an empty scan"
        )
    return _ordered(_masked_scan(spark, path, m, kept, schema))


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """The row-level change feed between two committed manifest
    snapshots — what Delta exposes as Change Data Feed, recovered here
    from the manifest chain alone. Returns the table's columns plus
    ``_change_type`` (``insert`` / ``delete``); an update surfaces as a
    delete of the old version and an insert of the new one (pairing
    them needs a declared key — that is :func:`lake_table_diff`'s job).

    Scale — this is the O(delta) incremental-consumption primitive:
    the two manifests are compared as FILE SETS, and only files present
    in exactly one snapshot are ever scanned. Because every publish
    rewrites whole partitions, carried (untouched) partitions appear in
    both manifests and are pruned at PLANNING time — a consumer of a
    100 TB table pays for the changed partitions only, never a table
    scan (``lake_table_diff`` by contrast joins two full snapshots).
    Rows carried unchanged through a rewritten partition cancel in the
    multiset difference (``exceptAll``), which shuffles only the delta
    rows. Snapshots commit atomically, so the feed is exact between any
    two retained versions, composes across versions (1→3 equals 1→2
    followed by 2→3), and ``from_version > to_version`` yields the
    rollback feed.

    Schema evolution between the snapshots is handled the way the
    mergeSchema read path does: a column present on only one side is
    NULL-filled on the other before the difference."""
    from pathlib import Path

    m_from = read_manifest(path, from_version)
    m_to = read_manifest(path, to_version)
    if m_from is None or m_to is None:
        raise FileNotFoundError(
            f"table at {path} is not manifest-committed — table_changes "
            "needs two committed snapshots"
        )
    if m_from.get("column_mapping", {}) != m_to.get("column_mapping", {}):
        raise ValueError(
            f"snapshots v{m_from['version']} and v{m_to['version']} of "
            f"{path} lie across a rename_column boundary — a multiset "
            "difference over differently-named columns would mis-align; "
            "consume each naming era separately"
        )
    added = sorted(set(m_to["files"]) - set(m_from["files"]))
    removed = sorted(set(m_from["files"]) - set(m_to["files"]))
    # merge-on-read deletes (delete_rows_mor) change VISIBILITY without
    # changing the file set: a carried file whose applicable tombstone
    # set differs between the two snapshots contributes its newly
    # hidden (or, after a rollback, newly restored) rows to the feed.
    # Only files whose coverage CHANGED are ever scanned — the feed
    # stays O(delta) (tombstone-covered files are bounded by the purge
    # cadence; untouched-and-unchanged files never enter the plan).
    changed: dict[tuple, list[str]] = {}
    for f in sorted(set(m_to["files"]) & set(m_from["files"])):
        kf = _applicable_tombstones(m_from, f)
        kt = _applicable_tombstones(m_to, f)
        if kf != kt:
            changed.setdefault((kf, kt), []).append(f)
    live = Path(path)

    def _project(df: DataFrame) -> DataFrame:
        if schema is not None and df.columns != list(schema.names):
            df = df.select(*schema.names)
        return df

    def _scan(files: list[str], m: dict) -> DataFrame:
        return _project(_masked_scan(spark, path, m, files, schema))

    if not added and not removed and not changed:
        proto = schema or read_table(spark, path, version=from_version).schema
        return spark.createDataFrame([], proto).withColumn(
            "_change_type", F.lit("insert")
        )
    new_parts = [_scan(added, m_to)] if added else []
    old_parts = [_scan(removed, m_from)] if removed else []
    for (kf, kt), fs in sorted(
        changed.items(), key=lambda kv: (sorted(kv[0][0]), sorted(kv[0][1]))
    ):
        # spec-aware scan: carried files keep their spec forever, but
        # only one of the two snapshots may carry the spec table (an
        # evolution between the versions) — use whichever records it
        m_spec = m_to if m_to.get("partition_specs") else m_from
        raw = _project(_spec_scan(spark, path, m_spec, fs, schema))
        old_parts.append(_keep_filter(raw, kf))
        new_parts.append(_keep_filter(raw, kt))

    def _fold(parts: list[DataFrame]) -> DataFrame | None:
        out = None
        for p in parts:
            out = p if out is None else out.unionByName(
                p, allowMissingColumns=True
            )
        return out

    new = _fold(new_parts)
    old = _fold(old_parts)
    if new is None:
        new = spark.createDataFrame([], old.schema)
    if old is None:
        old = spark.createDataFrame([], new.schema)
    cols = list(dict.fromkeys([*old.columns, *new.columns]))

    def _align(df: DataFrame, other: DataFrame) -> DataFrame:
        for f in other.schema.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df.select(*cols)

    new, old = _align(new, old), _align(old, new)
    return (
        new.exceptAll(old)
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(
            old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        )
    )


def feed_may_delete(path: str, from_version: int, to_version: int) -> bool:
    """Driver-side, zero-I/O answer to "can the :func:`table_changes`
    feed between these snapshots contain ``delete`` rows?" — the
    manifest-level fast path for insert-only consumers (round-10
    VERDICT "what's wrong" #3: the HLL MV refresh ran a Spark probe job
    per refresh even on append-only feeds).

    Deletes can only come from (a) files present in ``from`` but not
    ``to`` (a rewrite; byte-identical rows may still cancel — hence
    "may") or (b) carried files whose merge-on-read tombstone coverage
    changed — exactly the two sources :func:`table_changes` scans.
    ``False`` is therefore EXACT (an append-only chain cannot emit a
    delete); ``True`` is conservative and the caller should fall back
    to inspecting the feed. Unreadable snapshots answer ``True``
    (conservative)."""
    try:
        m_from = read_manifest(path, from_version)
        m_to = read_manifest(path, to_version)
    except FileNotFoundError:
        return True
    if m_from is None or m_to is None:
        return True
    f_from, f_to = set(m_from["files"]), set(m_to["files"])
    if f_from - f_to:
        return True
    return any(
        _applicable_tombstones(m_from, f) != _applicable_tombstones(m_to, f)
        for f in f_from & f_to
    )


def consume_table_changes(
    spark: SparkSession,
    path: str,
    checkpoint: str,
    schema: T.StructType | None = None,
):
    """Checkpointed incremental consumption of a manifest table — the
    batch analog of a streaming source offset. Returns ``(feed,
    version, commit)``:

    - ``feed`` — the change rows since the checkpointed version (first
      call: the whole current snapshot as ``insert`` rows — the seed
      load), with ``_change_type``;
    - ``version`` — the snapshot this feed advances the consumer to;
    - ``commit()`` — atomically record ``version`` in ``checkpoint``.
      Call it AFTER the downstream effect is durable.

    Processing is at-least-once by construction: a crash after the
    downstream write but before ``commit()`` replays the same feed next
    run. Consumers get exactly-once state the same way streaming
    foreachBatch sinks do — make the downstream effect idempotent for a
    repeated feed (a keyed MERGE, or an MV rebuilt FROM the feed and
    published atomically), then commit. Scale: each consumption scans
    only the files that changed since the checkpoint
    (:func:`table_changes`); an idle consumer costs two manifest reads
    and zero data I/O."""
    import os
    from pathlib import Path

    cur = read_manifest(path)
    if cur is None:
        raise FileNotFoundError(
            f"table at {path} is not manifest-committed — nothing to consume"
        )
    ckpt = Path(checkpoint)
    last = int(ckpt.read_text()) if ckpt.exists() else None
    version = cur["version"]
    if last is None:
        feed = read_table(spark, path, schema, version=version).withColumn(
            "_change_type", F.lit("insert")
        )
    elif last == version:
        feed = (
            read_table(spark, path, schema, version=version)
            .withColumn("_change_type", F.lit("insert"))
            .limit(0)
        )
    else:
        feed = table_changes(spark, path, last, version, schema)

    def commit() -> None:
        ckpt.parent.mkdir(parents=True, exist_ok=True)
        tmp = ckpt.parent / f".{ckpt.name}.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, ckpt)

    return feed, version, commit


def append_rows(
    spark: SparkSession,
    path: str,
    rows: DataFrame,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    stream_id: str | None = None,
    batch_id: int | None = None,
    bloom_cols: list[str] | None = None,
    branch: str | None = None,
) -> dict | None:
    """Transactional APPEND to a manifest table — the ingestion commit
    (Delta's append + ``txn`` idempotence in plain Parquet). The batch
    is staged invisibly, its files move in under globally unique part
    names, and ONE atomic pointer replace commits ``parent.files +
    new_files``; nothing is rewritten, dropped, or carried
    conditionally, so commit cost is O(batch files) regardless of
    table size — the property that makes this the streaming-sink
    primitive (:func:`..operators.streaming_ops.stream_lake_append`).

    ``(stream_id, batch_id)`` makes replays no-ops: each snapshot
    carries an ``app_versions`` ledger ``{stream_id: last_batch_id}``
    and an append whose ``batch_id`` is <= the ledger entry returns
    ``None`` without writing — checked authoritatively under the
    commit lock, so a foreachBatch sink that crashed after commit but
    before the checkpoint advanced re-runs the batch harmlessly
    (exactly-once table state from at-least-once delivery, the same
    contract Delta sinks give Structured Streaming). Monotonic
    ``batch_id`` per ``stream_id`` is the caller's contract (Spark's
    epoch ids are). Empty batches still commit — the high-water mark
    must advance or a replay after an all-late-data batch would stall.

    First append on an empty/missing path creates snapshot v1; a
    directory with pre-existing un-manifested data raises (publish it
    with ``manifest=True`` first — appending around a directory
    listing would be the mixed-read window manifests exist to close).

    ``branch=`` commits onto a named branch (:func:`create_branch`)
    instead of main: the parent is the BRANCH head, every guard
    (layout, schema, constraints, rename mapping, replay ledger) runs
    against it, and the commit advances the branch pointer while
    ``_manifest.json`` — and every main reader — stays untouched.
    Publish the chain with :func:`fast_forward`.
    """
    import shutil
    import uuid as _uuid
    from pathlib import Path

    if (stream_id is None) != (batch_id is None):
        raise ValueError("stream_id and batch_id must be given together")
    live = Path(path)

    def _parent() -> dict | None:
        # branch commits chain on the branch head (KeyError surfaces
        # an unknown branch); main commits on the live pointer
        return branch_head(str(live), branch) if branch else read_manifest(
            str(live)
        )

    current = _parent()
    if current is None and live.exists() and (
        set(_data_file_relpaths(live)) - _candidate_file_relpaths(live)
    ):
        raise ValueError(
            f"table at {path} has data but no manifest — append_rows "
            "requires manifest commits; publish_overwrite(..., "
            "manifest=True) it first"
        )
    pb = list(partition_by or [])
    if current is not None and current["partition_by"] != pb:
        raise ValueError(
            f"partition_by {pb} does not match the table's committed "
            f"layout {current['partition_by']}"
        )
    # Fail fast on schema drift (merge_into's contract): a typo'd or
    # missing column in a streaming batch must not silently land a
    # mixed-schema file set into the chain. Snapshots record the
    # writer's schema; batches must match it name-for-name and
    # type-for-type (nullability/metadata ignored). Pre-recording
    # snapshots (older tables) skip the check.
    recorded = (current or {}).get("schema")
    if recorded is not None:
        want = {f["name"]: f["type"] for f in recorded["fields"]}
        have = {
            f["name"]: f["type"] for f in rows.schema.jsonValue()["fields"]
        }
        if want != have:
            extra = sorted(set(have) - set(want))
            missing = sorted(set(want) - set(have))
            retyped = sorted(
                n for n in set(want) & set(have) if want[n] != have[n]
            )
            raise ValueError(
                f"append batch schema does not match the table's "
                f"committed schema (extra={extra}, missing={missing}, "
                f"retyped={retyped}) — evolve the table through "
                "merge_into(evolve_schema=True) first"
            )

    def _committed(snap: dict | None) -> bool:
        return (
            stream_id is not None
            and snap is not None
            and snap.get("app_versions", {}).get(stream_id, -1) >= batch_id
        )

    if _committed(current):
        return None  # cheap pre-check; authoritative one is under the lock
    txid = _uuid.uuid4().hex
    live.mkdir(parents=True, exist_ok=True)
    staged = live / f"_staged_{txid}"
    logical_schema = rows.schema.jsonValue()
    pre_mapping = (current or {}).get("column_mapping", {})
    if pre_mapping:
        # batches arrive under LOGICAL names; files carry the frozen
        # physical ones (rename_column)
        rows = _to_physical_df(rows, current)
    writer = rows.write.mode("overwrite").option("compression", compression)
    if pb:
        writer = writer.partitionBy(*pb)
    writer.parquet(str(staged))
    staged_files = sorted(
        p.relative_to(staged) for p in staged.rglob("*.parquet") if p.is_file()
    )
    pre_constraints = (current or {}).get("constraints", {})
    try:
        if staged_files:
            _enforce_constraints(
                spark, staged, pre_constraints, mapping=pre_mapping
            )
    except ConstraintViolationError:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    if bloom_cols and pre_mapping:
        bloom_cols = [pre_mapping.get(c, c) for c in bloom_cols]
    new_blooms = (
        _staged_file_blooms(spark, staged, bloom_cols)
        if bloom_cols and staged_files
        else {}
    )
    try:
        with publish_lock(live):
            current = _parent()  # re-read under the lock
            if (current or {}).get("constraints", {}) != pre_constraints:
                raise ConcurrentLakeModificationError(
                    f"table at {live} changed its CHECK constraints while "
                    "this append was staging — the batch was validated "
                    "against the old set; re-run"
                )
            if (current or {}).get("column_mapping", {}) != pre_mapping:
                raise ConcurrentLakeModificationError(
                    f"table at {live} renamed columns while this append "
                    "was staging — the batch was written under the old "
                    "physical names; re-run"
                )
            if current is not None and current.get("partition_by", []) != pb:
                # mirror of _publish_manifest_commit's layout guard: a
                # concurrent evolve_partitioning committed while this
                # batch was staging; committing pb here would silently
                # revert the table's default spec (the retired spec is
                # still in partition_specs, so _commit_manifest would
                # resolve it without error)
                raise ConcurrentLakeModificationError(
                    f"table at {live} evolved its partition layout to "
                    f"{current.get('partition_by', [])} while this append "
                    f"was staging under {pb} — re-run"
                )
            if _committed(current):
                return None  # raced with our own replay — batch already in
            new_files = _move_staged_in(live, staged, staged_files)
            ledger = dict((current or {}).get("app_versions", {}))
            if stream_id is not None:
                ledger[stream_id] = batch_id
            snap = _commit_manifest(
                live,
                [*(current["files"] if current else []), *new_files],
                pb,
                current,
                txid,
                app_versions=ledger,
                file_blooms=new_blooms,
                table_schema=logical_schema,
                update_pointer=branch is None,
            )
            if branch is not None:
                # advance the branch pointer under the same lock —
                # main's _manifest.json was deliberately not touched
                branches = list_branches(str(live))
                branches[branch]["head"] = snap["version"]
                _write_branches(live, branches)
            return snap
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def overwrite_partitions(
    spark: SparkSession,
    path: str,
    rows: DataFrame,
    partition_by: list[str],
    compression: str = "snappy",
    stream_id: str | None = None,
    batch_id: int | None = None,
    replace_partitions: "list[str] | None" = None,
) -> dict | None:
    """Dynamic-partition OVERWRITE on a manifest table — Spark's
    ``partitionOverwriteMode=dynamic`` / Hive ``INSERT OVERWRITE``
    semantics as ONE atomic manifest commit: exactly the hive
    partitions PRESENT in the batch are replaced (their files drop out
    of the snapshot), every other partition is carried untouched, and
    readers flip with the pointer. The daily-reprocess primitive: at
    100 TB you re-derive yesterday's partition, never the table, and
    the commit costs O(batch files) + O(#carried names) manifest
    arithmetic.

    Contract mirrors :func:`append_rows` (staging invisibility, schema
    drift fail-fast, CHECK constraints on the staged batch, layout /
    constraint / rename-mapping guards re-checked under the commit
    lock), with overwrite-specific rules:

    - the table must be partitioned and ``partition_by`` must equal
      the committed layout — "overwrite the matching partitions" is
      meaningless on an unpartitioned table (use
      :func:`publish_overwrite`);
    - an EMPTY batch is refused loudly: dynamic overwrite derives the
      replacement set from the data, so an empty batch would silently
      no-op where the caller almost certainly meant to replace
      something. ``replace_partitions`` (a list of hive dir relpaths,
      e.g. ``["lang=en"]``) switches to STATIC semantics (round-13,
      the PARTITION (col='val') form): the named set IS the
      replacement set, batch rows outside it refuse (the blast-radius
      guarantee), and an empty batch legitimately TRUNCATES the named
      partitions — hive static-overwrite semantics;
    - a partition-EVOLVED table (live files on retired specs) is
      refused with the OPTIMIZE cure: rows belonging to a logical
      partition may live in files outside that partition's current
      directory naming, so a directory-named replacement would be
      incomplete — fail closed, never half-replace;
    - merge-on-read tombstones scoped to replaced files are pruned
      automatically by the commit (no live file carries them);
      tombstones over carried files keep applying.

    ``(stream_id, batch_id)`` gives the overwrite append_rows' replay
    ledger: a batch at or below the snapshot's recorded high-water mark
    returns ``None`` without staging a byte (checked authoritatively
    under the commit lock) — the streaming partition-REPROCESS sink
    (each micro-batch re-derives whole partitions) gets exactly-once
    table state from at-least-once delivery even when a replay races a
    newer batch, where content-idempotence alone would clobber it.

    Returns the committed snapshot dict plus ``files_replaced`` /
    ``partitions_replaced``; ``None`` for a skipped replay."""
    import shutil
    import uuid as _uuid
    from pathlib import Path

    if (stream_id is None) != (batch_id is None):
        raise ValueError("stream_id and batch_id must be given together")
    live = Path(path)
    current = read_manifest(str(live))
    if current is None:
        raise FileNotFoundError(
            f"table at {path} is not manifest-committed — "
            "overwrite_partitions requires manifest commits "
            "(publish_overwrite(..., manifest=True) first)"
        )

    def _committed(snap: dict) -> bool:
        return (
            stream_id is not None
            and snap.get("app_versions", {}).get(stream_id, -1) >= batch_id
        )

    if _committed(current):
        return None  # cheap pre-check; authoritative one under the lock
    pb = list(partition_by or [])
    if not pb:
        raise ValueError(
            "overwrite_partitions needs partition columns — for a full "
            "overwrite use publish_overwrite"
        )
    if current["partition_by"] != pb:
        raise ValueError(
            f"partition_by {pb} does not match the table's committed "
            f"layout {current['partition_by']}"
        )
    if current.get("partition_specs"):
        raise ValueError(
            f"table at {path} has live files on retired partition specs "
            "— a directory-named overwrite would miss rows written "
            "under the old layout; run OPTIMIZE to heal to the current "
            "spec first"
        )
    recorded = current.get("schema")
    if recorded is not None:
        want = {f["name"]: f["type"] for f in recorded["fields"]}
        have = {
            f["name"]: f["type"] for f in rows.schema.jsonValue()["fields"]
        }
        if want != have:
            extra = sorted(set(have) - set(want))
            missing = sorted(set(want) - set(have))
            retyped = sorted(
                n for n in set(want) & set(have) if want[n] != have[n]
            )
            raise ValueError(
                f"overwrite batch schema does not match the table's "
                f"committed schema (extra={extra}, missing={missing}, "
                f"retyped={retyped})"
            )
    txid = _uuid.uuid4().hex
    staged = live / f"_staged_{txid}"
    logical_schema = rows.schema.jsonValue()
    pre_mapping = current.get("column_mapping", {})
    if pre_mapping:
        rows = _to_physical_df(rows, current)
    (
        rows.write.mode("overwrite")
        .option("compression", compression)
        .partitionBy(*pb)
        .parquet(str(staged))
    )
    staged_files = sorted(
        p.relative_to(staged) for p in staged.rglob("*.parquet") if p.is_file()
    )
    if not staged_files and replace_partitions is None:
        shutil.rmtree(staged, ignore_errors=True)
        raise ValueError(
            "overwrite_partitions refuses an empty batch: dynamic "
            "overwrite derives the replacement set from the data, so an "
            "empty batch would silently replace nothing — if clearing "
            "partitions is intended, use delete_rows or the static "
            "PARTITION (...) form (replace_partitions=)"
        )
    # the replacement set: hive partition dirs present in the batch
    # (same partitionBy writer encoding as the table's own files)
    touched = {str(f.parent) for f in staged_files}
    if replace_partitions is not None:
        named = set(replace_partitions)
        stray = sorted(touched - named)
        if stray:
            shutil.rmtree(staged, ignore_errors=True)
            raise ValueError(
                f"static overwrite batch contains rows outside the "
                f"named partition set {sorted(named)}: {stray} — the "
                "PARTITION spec is a blast-radius declaration; rows "
                "must fall inside it"
            )
        # hive static semantics: the NAMED set is replaced even when
        # the batch is empty (truncate) or covers only part of it
        touched = named
    pre_constraints = current.get("constraints", {})
    try:
        _enforce_constraints(
            spark, staged, pre_constraints, mapping=pre_mapping
        )
    except ConstraintViolationError:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    try:
        with publish_lock(live):
            current = read_manifest(str(live))  # re-read under the lock
            if current.get("constraints", {}) != pre_constraints:
                raise ConcurrentLakeModificationError(
                    f"table at {live} changed its CHECK constraints while "
                    "this overwrite was staging — re-run"
                )
            if current.get("column_mapping", {}) != pre_mapping:
                raise ConcurrentLakeModificationError(
                    f"table at {live} renamed columns while this "
                    "overwrite was staging — re-run"
                )
            if current.get("partition_by", []) != pb or current.get(
                "partition_specs"
            ):
                raise ConcurrentLakeModificationError(
                    f"table at {live} evolved its partition layout while "
                    "this overwrite was staging — re-run"
                )
            if _committed(current):
                return None  # raced with our own replay
            new_files = _move_staged_in(live, staged, staged_files)
            kept = [
                f
                for f in current["files"]
                if (f.rsplit("/", 1)[0] if "/" in f else "") not in touched
            ]
            replaced = len(current["files"]) - len(kept)
            ledger = dict(current.get("app_versions", {}))
            if stream_id is not None:
                ledger[stream_id] = batch_id
            snap = _commit_manifest(
                live,
                [*kept, *new_files],
                pb,
                current,
                txid,
                app_versions=ledger,
                table_schema=logical_schema,
            )
            kept_set = set(kept)
            return {
                **snap,
                "files_replaced": replaced,
                # lock-accurate removed-row accounting (the TRUNCATE
                # precedent): counted from the manifest read under the
                # commit lock, so a concurrent append can never make
                # the report understate what was replaced
                "rows_replaced": sum(
                    int(current.get("file_rows", {}).get(f, 0))
                    for f in current["files"]
                    if f not in kept_set
                ),
                "partitions_replaced": sorted(touched),
            }
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def rollback_table(path: str, version: int) -> dict:
    """RESTORE a manifest table to a retained snapshot — the
    recover-from-bad-publish primitive (Delta's RESTORE, Iceberg's
    rollback). Pure metadata: a NEW snapshot is committed whose file
    list is version N's, so no data moves or copies, history stays
    linear (the bad publish remains inspectable via time travel until
    vacuumed), and readers flip atomically with the pointer replace.

    Rolling FORWARD again is just another rollback — every state ever
    committed is reachable while its snapshot is retained. GDPR
    interaction: :func:`delete_rows` truncates history to the erased
    state (keep_last=1), so a rollback can never resurrect erased rows
    — the pre-erasure snapshot files are already unreferenced and its
    manifests gone; this raises FileNotFoundError instead."""
    import uuid as _uuid

    from pathlib import Path

    live = Path(path)
    target = read_manifest(path, version)  # FileNotFoundError if vacuumed
    if read_manifest(path) is None:
        raise FileNotFoundError(
            f"table at {path} is not manifest-committed — nothing to roll back"
        )
    missing = [f for f in target["files"] if not (live / f).exists()]
    if missing:
        raise FileNotFoundError(
            f"snapshot v{version} references {len(missing)} vacuumed data "
            f"file(s) (first: {missing[0]}) — cannot restore"
        )
    with publish_lock(live):
        current = read_manifest(path)  # re-read under the commit lock
        if current["version"] == version:
            return {
                "rolled_back_to": version,
                "new_version": current["version"],
                "n_files": len(current["files"]),
            }
        snap = _commit_manifest(
            live,
            target["files"],
            target["partition_by"],
            current,
            _uuid.uuid4().hex,
            # restore really IS metadata-only: the target snapshot
            # already recorded its files' stats/blooms/schema — inherit
            # them instead of dropping the blooms and re-reading every
            # restored file's footer through the parent-only lookup
            file_stats_hints=target.get("file_stats"),
            file_rows_hints=target.get("file_rows"),
            file_blooms=target.get("file_blooms"),
            table_schema=target.get("schema"),
            # restore the TARGET's delete tombstones and sequence
            # numbers (explicit [] when it had none — a rollback to a
            # pre-delete snapshot must not carry the parent's
            # tombstones forward, or the restored rows would stay
            # hidden)
            delete_predicates=target.get("delete_predicates", []),
            file_added_hints=target.get("file_added"),
            constraints=target.get("constraints", {}),
            # restore the target's partition-spec bookkeeping verbatim —
            # ALWAYS explicitly, never by inheritance: the current
            # snapshot may have healed and re-evolved since, so its spec
            # table need not contain the target's layout at all (the
            # inheritance lookup would refuse a legitimate restore). An
            # explicit {} on a pre-evolution target is exactly right:
            # every restored file is the target's own single layout.
            partition_specs=target.get("partition_specs") or {},
            file_spec=target.get("file_spec") or {},
            column_mapping=target.get("column_mapping", {}),
        )
    return {
        "rolled_back_to": version,
        "new_version": snap["version"],
        "n_files": len(snap["files"]),
    }


def clone_table(src: str, dst: str, version: int | None = None) -> dict:
    """Zero-copy table CLONE — materialize a retained snapshot of
    ``src`` as an independent manifest table at ``dst`` without copying
    a byte of data: every data file is HARDLINKED into ``dst``
    (O(#files) metadata syscalls, shared inodes) and the clone's v1
    manifest inherits the source snapshot's recorded per-file
    stats/rows/blooms, so the whole operation is footer-read-free on a
    manifest source. Delta/Iceberg's shallow-clone use cases — dev
    copies of production, experiment branches that outlive the source's
    retention, training-set freezes — with a safety upgrade over
    path-referencing shallow clones: Delta's own docs warn a VACUUM on
    the source breaks its shallow clones, whereas unlinking a hardlink
    only drops a name, so source vacuum/erasure can NEVER corrupt a
    clone (and vice versa). On an object store this maps to
    metadata-only copy-on-reference; on a POSIX lake hardlinks ARE that
    primitive. Cross-device targets degrade to a real copy per file
    (correct, just not free) — clones belong on the lake's filesystem.

    The two tables then evolve independently: the clone's history
    starts at v1 (its parent chain never reaches into the source, so
    source time travel is not cloneable history), copied files carry
    ``file_added=0`` with the source's merge-on-read tombstones
    re-scoped to 0 — they keep suppressing exactly the rows they
    suppressed at the source, while every post-clone commit's files sit
    above scope 0 and can never be shadowed by a pre-clone tombstone.
    Schema, constraints, rename mapping, and partition-spec bookkeeping
    copy verbatim; the source's ``app_versions`` stream ledger does NOT
    (a stream writing to the source has never written to the clone —
    inheriting its high-water marks would silently drop the first
    replayed batches a sink owes a new table).

    Concurrency: committed snapshot JSONs are immutable, so no source
    lock is taken (same posture as vacuum). If a concurrent vacuum
    expires the snapshot mid-clone, a link raises FileNotFoundError and
    the clone fails LOUDLY with no manifest at ``dst`` — nothing
    partial is ever visible; re-run against a retained snapshot.

    ``version=None`` clones the current snapshot. The source must be
    manifest-committed; ``dst`` must be empty of data and manifests."""
    import os
    import shutil
    import uuid as _uuid
    from pathlib import Path

    src_live = Path(src).resolve()
    dst_live = Path(dst).resolve()
    if src_live == dst_live or dst_live.is_relative_to(src_live) or (
        src_live.is_relative_to(dst_live)
    ):
        raise ValueError(
            f"clone target {dst} overlaps the source {src} — a clone is "
            "a sibling table, never a nested directory"
        )
    m = read_manifest(str(src_live), version)
    if m is None:
        raise FileNotFoundError(
            f"table at {src} is not manifest-committed — clone_table "
            "requires a manifest source (publish with manifest=True)"
        )
    if dst_live.exists() and (
        (dst_live / "_manifest.json").exists()
        or _data_file_relpaths(dst_live)
    ):
        raise FileExistsError(
            f"clone target {dst} already holds a table — refusing to "
            "adopt or overwrite"
        )
    dst_live.mkdir(parents=True, exist_ok=True)
    for f in m["files"]:
        target = dst_live / f
        target.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(src_live / f, target)
        except OSError:
            # cross-device (or FS without hardlinks): fall back to a
            # real copy — still a correct clone, just not zero-byte
            shutil.copy2(src_live / f, target)
    with publish_lock(dst_live):
        snap = _commit_manifest(
            dst_live,
            m["files"],
            m["partition_by"],
            None,
            _uuid.uuid4().hex,
            app_versions={},
            file_stats_hints=m.get("file_stats"),
            file_rows_hints=m.get("file_rows"),
            file_blooms=m.get("file_blooms"),
            table_schema=m.get("schema"),
            delete_predicates=[
                {**p, "scope": 0} for p in m.get("delete_predicates", [])
            ],
            file_added_hints={f: 0 for f in m["files"]},
            constraints=m.get("constraints", {}),
            partition_specs=m.get("partition_specs") or {},
            file_spec=m.get("file_spec") or {},
            column_mapping=m.get("column_mapping", {}),
        )
    return {
        "cloned_from_version": m["version"],
        "new_version": snap["version"],
        "n_files": len(snap["files"]),
    }


def rename_column(path: str, old: str, new: str) -> dict:
    """RENAME a manifest table's column WITHOUT rewriting a byte — the
    Delta column-mapping model on plain Parquet. Files carry FROZEN
    physical names (the name a column had when its first file was
    written); a rename is one metadata commit updating the snapshot's
    logical schema + ``column_mapping`` {logical: physical}. Reads
    declare the physical schema at the scan and alias back to logical
    (a projection Catalyst collapses into the scan — zero runtime
    cost); writes (appends, merges, WAP candidates) arrive logical and
    are aliased to physical before staging, so new files stay
    consistent with old ones; skipping stats, blooms, and ``prune=``
    keys translate through the mapping. A FULL rewrite
    (:func:`compact_in_place`) writes fresh files under the logical
    names and the mapping heals away — the same OPTIMIZE-migration
    contract as partition evolution; renaming back to the physical
    name heals it too.

    Fail-closed v1 scope (each refusal is a loud error, never a wrong
    result): partition columns cannot be renamed (directory names are
    load-bearing — evolve partitioning away from the column first);
    renames are refused while merge-on-read tombstones exist (their
    predicates reference rename-era names; purge first) and while any
    CHECK constraint references the column (drop/re-add it). The
    streaming/batch data source translates declared logical names
    through the frozen physical names per file; a rename committing
    MID-stream, or a restart whose declared schema predates the
    rename, fails loudly. ``table_changes`` across a rename boundary
    raises rather than mis-aligning columns."""
    import re as _re
    import uuid as _uuid
    from pathlib import Path

    live = Path(path)
    if read_manifest(path) is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — rename needs "
            "manifest snapshots; publish_overwrite(..., manifest=True) "
            "it first"
        )
    with publish_lock(live):
        current = read_manifest(path)
        recorded = current.get("schema")
        if recorded is None:
            raise ValueError(
                f"table at {path} has no recorded writer schema — "
                "re-publish once to record it"
            )
        names = [f["name"] for f in recorded["fields"]]
        if old not in names:
            raise ValueError(f"no column {old!r} on {names}")
        if new in names:
            raise ValueError(f"column {new!r} already exists on {names}")
        part_cols = set(current.get("partition_by") or [])
        for spec in (current.get("partition_specs") or {}).values():
            part_cols.update(spec)
        if old in part_cols:
            raise ValueError(
                f"column {old!r} is a partition column — directory "
                "names are load-bearing; evolve_partitioning() away "
                "from it first"
            )
        if current.get("delete_predicates"):
            raise ValueError(
                f"table at {path} carries merge-on-read delete "
                "tombstones whose predicates reference current names — "
                "purge_deleted_rows() first"
            )
        for cname, sql in (current.get("constraints") or {}).items():
            if old in _re.findall(r"[A-Za-z_][A-Za-z0-9_]*", sql):
                raise ValueError(
                    f"CHECK constraint {cname!r} ({sql}) references "
                    f"{old!r} — drop it, rename, re-add under the new "
                    "name"
                )
        mapping = dict(current.get("column_mapping") or {})
        phys = mapping.pop(old, old)
        if phys != new:
            mapping[new] = phys
        schema = {
            **recorded,
            "fields": [
                {**f, "name": new} if f["name"] == old else f
                for f in recorded["fields"]
            ],
        }
        return _commit_manifest(
            live,
            current["files"],
            current.get("partition_by") or None,
            current,
            _uuid.uuid4().hex,
            table_schema=schema,
            column_mapping=mapping,
        )


_WIDEN_CHAIN = ("byte", "short", "integer", "long")


def _is_safe_widening(old_t, new_t) -> bool:
    """The Iceberg safe-widening matrix on parquet-JSON type values
    (strings like ``"integer"``/``"long"``/``"decimal(12,4)"``):
    integral up-chain, float->double, decimal scale/precision-up."""
    import re as _re

    if old_t in _WIDEN_CHAIN and new_t in _WIDEN_CHAIN:
        return _WIDEN_CHAIN.index(new_t) > _WIDEN_CHAIN.index(old_t)
    if old_t == "float" and new_t == "double":
        return True
    mo = _re.fullmatch(r"decimal\((\d+),(\d+)\)", str(old_t))
    mn = _re.fullmatch(r"decimal\((\d+),(\d+)\)", str(new_t))
    if mo and mn:
        po, so = int(mo.group(1)), int(mo.group(2))
        pn, sn = int(mn.group(1)), int(mn.group(2))
        return sn >= so and pn - sn >= po - so and (pn, sn) != (po, so)
    return False


def discover_partition_stats(
    path: str,
    partition_keys: list[str] | tuple | None,
    known: dict | None = None,
) -> dict:
    """Walk a DECLARED-location table directory and index its hive
    layout: every data file's (size, exact footer row count) keyed by
    relative path, plus per-partition row totals (round-14; the engine
    side of ``MSCK REPAIR TABLE``). Athena's MSCK registers partition
    DIRECTORIES in Glue; this additionally records the footer counts
    that let the metadata-only COUNT serve schema-on-read tables —
    with the staleness guard living in the CONSUMER (the engine
    re-lists and compares names+sizes before trusting the index; any
    drift falls open to the scan).

    ``known`` is a prior index's ``files`` map: files present with the
    same size skip their footer read — an incremental repair costs
    O(new files) footer reads + one directory walk.

    Fail-closed: a file whose directory depth or ``k=v`` names do not
    match the declared partition keys raises (layout drift must be
    loud, not silently half-indexed), as does a footer without a
    readable row count."""
    from pathlib import Path

    live = Path(path)
    if not live.is_dir():
        raise ValueError(f"table location {path} is not a directory")
    pkeys = list(partition_keys or [])
    files: dict[str, list] = {}
    partitions: dict[str, int] = {}
    for rel in _data_file_relpaths(live):
        segs = rel.split("/")[:-1]
        if len(segs) != len(pkeys) or any(
            not seg.startswith(f"{k}=") for seg, k in zip(segs, pkeys)
        ):
            raise ValueError(
                f"file {rel} does not match the declared partition "
                f"layout {pkeys} — hive-style k=v directories required "
                "(fix the layout or re-declare the table)"
            )
        size = (live / rel).stat().st_size
        prior = (known or {}).get(rel)
        if prior is not None and int(prior[0]) == size:
            rows = int(prior[1])
        else:
            _stats, rows = _file_footer_info(live / rel)
            if rows is None:
                raise ValueError(
                    f"cannot read a row count from {rel}'s footer — "
                    "repair needs every footer readable to serve exact "
                    "counts"
                )
        files[rel] = [size, int(rows)]
        d = "/".join(segs)
        partitions[d] = partitions.get(d, 0) + int(rows)
    return {
        "files": files,
        "partitions": partitions,
        "rows": sum(partitions.values()),
    }


def truncate_table(path: str, spark: SparkSession | None = None) -> dict:
    """TRUNCATE a manifest table — one metadata commit whose snapshot
    carries ZERO files (round-14; Athena/Iceberg TRUNCATE parity).
    Nothing is deleted from disk: prior snapshots keep their file
    entries, so time travel to the pre-truncate version still serves
    every row, and a later ``vacuum_manifests`` reclaims the storage
    on the retention schedule — TRUNCATE is a mutation, not erasure
    (``delete_rows`` is the GDPR path). Partition layout, constraints,
    schema, and the replay ledger all carry, so the next append lands
    exactly as it would have; merge-on-read tombstones drop (nothing
    left to suppress).

    The returned snapshot carries ``rows_removed``, counted INSIDE
    the publish lock (round-15 ADVICE: a pre-lock count would
    understate the removal if a concurrent append landed between the
    count and the zero-file commit): metadata-only when every live
    file has a recorded footer count and no tombstone is in force,
    one exact scan otherwise (pass ``spark=``; without a session the
    fallback reports ``None``, never a wrong number)."""
    import uuid as _uuid
    from pathlib import Path

    live = Path(path)
    if read_manifest(path) is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — TRUNCATE is a "
            "snapshot commit; publish_overwrite(..., manifest=True) it "
            "first (schema-on-read locations have no transactional "
            "state to truncate)"
        )
    with publish_lock(live):
        current = read_manifest(path)
        file_rows = current.get("file_rows") or {}
        if not current.get("delete_predicates") and all(
            f in file_rows for f in current["files"]
        ):
            rows_removed = sum(int(file_rows[f]) for f in current["files"])
        elif spark is not None:
            rows_removed = read_table(spark, path).count()
        else:
            rows_removed = None
        snap = _commit_manifest(
            live,
            [],
            current.get("partition_by") or None,
            current,
            _uuid.uuid4().hex,
            delete_predicates=[],
        )
        out = dict(snap)
        out["rows_removed"] = rows_removed
        return out


def add_files(spark: SparkSession, path: str, source_dir: str) -> dict:
    """Import bulk-landed parquet files into a MANIFEST table as one
    O(new files) commit — the Iceberg ``add_files`` / Hive MSCK analog
    for the engine's transactional layout (round-14; closes r13
    What's missing #2). Declared-LOCATION tables are schema-on-read,
    so out-of-band landing (the reference's ``upload_sample.sh:27``)
    already works there; this bridges landed data into the
    manifest-committed path that time travel / CDF / stats skipping /
    metadata COUNT serve from.

    Contract:

    - files HARDLINK into the table tree under globally unique import
      names (zero copy on one filesystem; byte copy across devices).
      ALIASING CAVEAT (round-15 ADVICE): a hardlink shares the
      source file's inode, so after a successful import the engine
      freezes every imported file read-only (chmod 0444 — which, by
      the same aliasing, also marks the user's landing copy
      read-only). An in-place edit of the landing file would
      otherwise silently mutate committed table data and every
      historical snapshot referencing it; the freeze makes that
      loud. The engine itself never modifies data files in place
      (the layout is immutable — rewrites land NEW files), so
      read-only data files cost nothing downstream;
    - layout validated: a partitioned table requires hive-style
      ``k=v`` directories matching the CURRENT spec exactly; an
      unpartitioned one requires flat files. Drift refuses;
    - schema validated against the recorded writer schema: same
      column set, each file type EQUAL to the declared one or a safe
      parquet promotion below it (int32 files import into a widened
      bigint column);
    - CHECK constraints VERIFY over the new files before anything
      links (one scan of the new data only — violation refuses with
      zero table change);
    - footer stats + exact row counts recorded at import
      (``_commit_manifest`` reads each new footer once), so skipping
      and metadata-only COUNT work over imported files immediately;
    - tables with an active column rename mapping refuse (landed
      files carry logical names; the table's files carry frozen
      physical ones — compact first);
    - merge-on-read tombstones never apply to imported files (their
      ``file_added`` postdates every tombstone scope).

    100 TB: commit cost is O(imported files) links + one footer read
    each — table size never enters; the constraint scan is O(new
    data), the price of making the import trustworthy."""
    import os
    import shutil
    import uuid as _uuid
    from pathlib import Path

    live = Path(path)
    src = Path(source_dir)
    if read_manifest(path) is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — ADD FILES "
            "imports into the transactional layout; declared-location "
            "tables read landed files as-is"
        )
    if not src.is_dir():
        raise ValueError(f"source directory {source_dir} does not exist")
    rels = sorted(
        p.relative_to(src)
        for p in src.rglob("*.parquet")
        if p.is_file() and not p.name.startswith("_")
    )
    if not rels:
        raise ValueError(f"no parquet files under {source_dir}")
    current = read_manifest(path)
    recorded = current.get("schema")
    if recorded is None:
        raise ValueError(
            f"table at {path} has no recorded writer schema — "
            "re-publish once to record it"
        )
    if current.get("column_mapping"):
        raise ValueError(
            f"table at {path} has an active column rename mapping — "
            "imported files carry logical names while table files are "
            "frozen physical; compact_in_place() first"
        )
    pb = list(current.get("partition_by") or [])
    for rel in rels:
        segs = rel.parts[:-1]
        if len(segs) != len(pb) or any(
            not seg.startswith(f"{k}=") for seg, k in zip(segs, pb)
        ):
            raise ValueError(
                f"file {rel} does not match the table's partition "
                f"layout {pb} — hive-style k=v directories required"
            )
    # Schema validates PER FILE, never from one directory-level
    # inference: Spark's default (mergeSchema=false) would infer from a
    # single footer, letting a heterogeneous landing link unvalidated
    # files into the table (round-14 review). Partition columns are
    # validated by the layout check above and their VALUES decode from
    # dir names under the DECLARED type at read time — they are
    # deliberately NOT type-inferred here (directory-name inference
    # calls day='20240101' an integer and would falsely refuse a valid
    # import into a string-typed key).
    want = {
        f["name"]: f["type"]
        for f in recorded["fields"]
        if f["name"] not in pb
    }

    def _spark_fields(fpath) -> dict:
        # the authoritative (but per-file-Spark-plan) reading — the
        # pre-round-15 path, kept as the arbiter for refusals
        return {
            f["name"]: f["type"]
            for f in spark.read.parquet(str(fpath))
            .schema.jsonValue()["fields"]
        }

    def _footer_fields(fpath) -> dict:
        # ONE pyarrow footer read per file, no Spark plan (round-15;
        # r14 What's wrong #2: a 100k-file landing must not become
        # 100k sequential driver round-trips through spark.read).
        # Arrow types map to the same Spark JSON type names the
        # recorded writer schema uses; prefer_timestamp_ntz=True
        # mirrors Spark's own parquet inference (isAdjustedToUTC=false
        # -> TIMESTAMP_NTZ — without it, an NTZ column read back as
        # 'timestamp' would falsely refuse a valid import; round-15
        # review finding #1). The rare footer whose arrow type has no
        # direct Spark mapping falls back to the Spark read so the
        # refusal matrix never loosens.
        try:
            import pyarrow.parquet as _pq
            from pyspark.sql.pandas.types import from_arrow_type

            sch = _pq.read_schema(fpath)
            return {
                name: from_arrow_type(
                    sch.field(name).type, prefer_timestamp_ntz=True
                ).jsonValue()
                for name in sch.names
            }
        except Exception:
            return _spark_fields(fpath)

    def _validate(rel, have) -> str | None:
        """None = file admits; else the refusal message."""
        if set(want) != set(have):
            return (
                f"imported file {rel} does not match the table's data "
                f"columns (extra={sorted(set(have) - set(want))}, "
                f"missing={sorted(set(want) - set(have))})"
            )
        retyped = sorted(
            n
            for n in want
            if have[n] != want[n] and not _is_safe_widening(have[n], want[n])
        )
        if retyped:
            return (
                f"imported file {rel} column types are not readable as "
                f"the declared ones (retyped={retyped}) — only equal or "
                "safely-narrower file types import"
            )
        return None

    import json as _json

    seen_accept_schemas: set = set()
    for rel in rels:
        have = _footer_fields(src / rel)
        problem = _validate(rel, have)
        if problem is not None:
            # REFUSALS re-check through Spark before surfacing: the
            # arrow mapping can disagree with Spark's reader on corner
            # types (legacy int96 timestamps, exotic logical types),
            # and a refusal must never be an artifact of the shortcut.
            # Only the failing files pay the per-file Spark plan — the
            # accept path stays O(new files) pyarrow reads.
            problem = _validate(rel, _spark_fields(src / rel))
        if problem is not None:
            raise ValueError(problem)
        # ACCEPT-path cross-check (round-16 ADVICE): the arrow mapping
        # could also wrongly report a MATCH on a corner type, loosening
        # the refusal matrix on the admit side. Sample-verify the first
        # file of each DISTINCT footer schema through the authoritative
        # Spark reader — O(#distinct schemas) Spark plans, not O(files)
        # (a homogeneous 100k-file landing pays exactly one).
        sig = _json.dumps(sorted(have.items()), sort_keys=True, default=str)
        if sig not in seen_accept_schemas:
            seen_accept_schemas.add(sig)
            problem = _validate(rel, _spark_fields(src / rel))
            if problem is not None:
                raise ValueError(
                    f"{problem} (accept-path cross-check: the footer "
                    "shortcut admitted this schema but Spark's reader "
                    "refuses it)"
                )
    constraints = current.get("constraints") or {}
    if constraints:
        # verify over the NEW data only, before anything links
        _enforce_constraints(spark, src, constraints, mapping={})
    txid = _uuid.uuid4().hex
    staged = live / f"_staged_{txid}"
    try:
        for i, rel in enumerate(rels):
            dst = staged / rel.parent / f"part-import-{txid}-{i:05d}.parquet"
            dst.parent.mkdir(parents=True, exist_ok=True)
            try:
                os.link(src / rel, dst)
            except OSError:
                shutil.copy2(src / rel, dst)
        staged_files = sorted(
            p.relative_to(staged)
            for p in staged.rglob("*.parquet")
            if p.is_file()
        )
        with publish_lock(live):
            current = read_manifest(path)  # re-read under the lock
            if (current.get("partition_by") or []) != pb:
                raise ConcurrentLakeModificationError(
                    f"table at {live} evolved its partition layout "
                    "while this import was staging — re-run"
                )
            if (current.get("constraints") or {}) != constraints:
                raise ConcurrentLakeModificationError(
                    f"table at {live} changed its CHECK constraints "
                    "while this import was staging — re-run"
                )
            if current.get("column_mapping"):
                raise ConcurrentLakeModificationError(
                    f"table at {live} renamed columns while this "
                    "import was staging — re-run"
                )
            if current.get("schema") != recorded:
                # the batch validated against the OLD writer schema; a
                # concurrent overwrite/widen must not admit mixed-
                # schema files (same rule as the other three re-checks)
                raise ConcurrentLakeModificationError(
                    f"table at {live} changed its recorded schema "
                    "while this import was staging — re-run"
                )
            new_files = _move_staged_in(live, staged, staged_files)
            snap = _commit_manifest(
                live,
                [*current["files"], *new_files],
                pb or None,
                current,
                txid,
            )
            # Import accounting from the files THIS commit linked,
            # computed under the lock (round-15 ADVICE: a pre-lock
            # manifest diff in the caller would misattribute a
            # concurrent writer's files to this import).
            out = dict(snap)
            out["files_added"] = len(new_files)
            out["rows_added"] = sum(
                int(snap.get("file_rows", {}).get(f, 0))
                for f in new_files
            )
            # Freeze the imported files read-only AFTER the commit
            # succeeds (never mutate the user's landing files on an
            # aborted import). Best-effort: a filesystem that refuses
            # chmod keeps the documented aliasing caveat instead.
            for f in new_files:
                try:
                    os.chmod(live / f, 0o444)
                except OSError:
                    pass
            return out
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def widen_column_type(path: str, col: str, new_type: str) -> dict:
    """WIDEN a manifest table's column type WITHOUT rewriting a byte —
    one metadata commit updating the snapshot's recorded writer schema
    (round-14; Iceberg ``update_column`` / Delta type-widening parity).
    Files keep their narrow physical types; reads declare the widened
    schema and Spark's parquet type promotion (int32 -> bigint,
    float -> double, decimal precision-up) materializes old footers at
    the new width. Appends after the commit validate against — and
    write — the widened type, so the table accepts values beyond the
    old domain from the next batch on.

    ``new_type`` is the parquet-JSON type value (``"long"``,
    ``"double"``, ``"decimal(12,4)"``). Only the safe matrix commits
    (:func:`_is_safe_widening`); narrowing and cross-family changes
    raise. Partition columns refuse — their values decode from
    directory names with the declared type and the dir encoding is
    load-bearing. Merge-on-read tombstones and CHECK constraints stay
    valid under a widening (values are unchanged), so neither blocks."""
    import uuid as _uuid
    from pathlib import Path

    live = Path(path)
    if read_manifest(path) is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — widening "
            "needs manifest snapshots; publish_overwrite(..., "
            "manifest=True) it first"
        )
    with publish_lock(live):
        current = read_manifest(path)
        recorded = current.get("schema")
        if recorded is None:
            raise ValueError(
                f"table at {path} has no recorded writer schema — "
                "re-publish once to record it"
            )
        by_name = {f["name"]: f for f in recorded["fields"]}
        if col not in by_name:
            raise ValueError(f"no column {col!r} on {list(by_name)}")
        part_cols = set(current.get("partition_by") or [])
        for spec in (current.get("partition_specs") or {}).values():
            part_cols.update(spec)
        if col in part_cols:
            raise ValueError(
                f"column {col!r} is a partition column — directory "
                "encodings fix its type; evolve_partitioning() away "
                "from it first"
            )
        old_type = by_name[col]["type"]
        if not _is_safe_widening(old_type, new_type):
            raise ValueError(
                f"{old_type!r} -> {new_type!r} on {col!r} is not a safe "
                "widening (allowed: byte->short->integer->long, "
                "float->double, decimal scale/precision-up)"
            )
        schema = {
            **recorded,
            "fields": [
                {**f, "type": new_type} if f["name"] == col else f
                for f in recorded["fields"]
            ],
        }
        return _commit_manifest(
            live,
            current["files"],
            current.get("partition_by") or None,
            current,
            _uuid.uuid4().hex,
            table_schema=schema,
        )


def evolve_partitioning(path: str, new_partition_by: list[str] | None) -> dict:
    """Change a manifest table's partition layout WITHOUT rewriting a
    byte of data — Iceberg's partition-spec evolution on plain Parquet.
    (The reference's Glue tables pin one partition scheme at CREATE
    time; re-layout there is a full CTAS.)

    The commit is pure metadata: the snapshot's ``partition_by``
    becomes the new spec, every carried file keeps a record of the spec
    it was WRITTEN under (``partition_specs`` / ``file_spec``), and:

    - **reads** (:func:`read_table`, time travel, :func:`table_changes`,
      streaming) scan one parquet relation per spec and union — a
      column that is a partition directory in one spec and a data
      column in another materializes identically in both (declared
      schema), and Spark's own partition pruning still applies per
      spec-group at planning time;
    - **appends** (:func:`append_rows`, the streaming sink) write under
      the new spec immediately — new data gets the new layout's
      pruning from its first commit, the point of evolving;
    - **partial rewrites** (merge_into / scd2 / delete_rows / WAP) are
      REFUSED while retired-spec files remain: their replaced-
      partitions semantics cannot see old-spec directories, so touched
      rows would silently survive in old files. The migration is
      :func:`compact_in_place` — a full rewrite under the current
      spec, after which the spec bookkeeping heals away and every
      mutator works again. Fail-closed beats silently-duplicated.

    100 TB rationale: re-partitioning a petabyte table eagerly is a
    cluster-week; evolution makes the layout change O(1) now and lets
    the rewrite happen per-partition, on maintenance cadence, or never
    (old data ages out through retention while new data enjoys the new
    layout). Requires a recorded writer schema (every round-8 commit
    records one) so mixed-spec scans are declared, never inferred."""
    import uuid as _uuid
    from pathlib import Path

    live = Path(path)
    if read_manifest(path) is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — partition "
            "evolution needs manifest snapshots; publish_overwrite(..., "
            "manifest=True) it first"
        )
    new = list(new_partition_by or [])
    with publish_lock(live):
        current = read_manifest(path)  # re-read under the commit lock
        recorded = current.get("schema")
        if recorded is None:
            raise ValueError(
                f"table at {path} has no recorded writer schema — "
                "mixed-spec scans must be declared; re-publish once to "
                "record it"
            )
        names = [f["name"] for f in recorded["fields"]]
        missing = [c for c in new if c not in names]
        if missing:
            raise ValueError(
                f"new partition columns {missing} are not on the "
                f"table's schema {names}"
            )
        mapping = current.get("column_mapping") or {}
        mapped = sorted(set(new) & set(mapping))
        if mapped:
            raise ValueError(
                f"new partition columns {mapped} are renamed "
                "(logical != in-file physical name): writers would "
                "partitionBy a name the staged files don't carry — "
                "compact_in_place() first to migrate files to the "
                "logical names"
            )
        if current["partition_by"] == new:
            return current  # already this layout — nothing to commit
        specs = {
            k: list(v)
            for k, v in (current.get("partition_specs") or {}).items()
        }
        fspec = dict(current.get("file_spec") or {})
        if not specs:
            specs = {"0": list(current["partition_by"])}
            fspec = {f: "0" for f in current["files"]}
        sid = next((k for k, v in specs.items() if v == new), None)
        if sid is None:
            sid = str(max(int(k) for k in specs) + 1)
            specs[sid] = new
        return _commit_manifest(
            live,
            current["files"],
            new,
            current,
            _uuid.uuid4().hex,
            partition_specs=specs,
            file_spec=fspec,
        )


def _enforce_constraints(
    spark: SparkSession,
    staged,
    constraints: dict | None,
    mapping: dict | None = None,
) -> None:
    """Validate a STAGED batch against the table's CHECK constraints by
    re-reading the just-written staged tree (one columnar scan of the
    batch — never a recompute of the producing plan, which at 100 TB
    may be a full pipeline). SQL CHECK semantics: a row passes when the
    expression is TRUE or NULL (UNKNOWN passes, the standard's rule and
    Delta's); a violation is an explicit FALSE. The clean path costs
    ONE any-violation scan; only on failure does a second pass name the
    violated constraint."""
    if not constraints:
        return
    df = _reader(spark, None).parquet(str(staged))
    if mapping:
        # staged files carry physical names; constraint expressions are
        # written against logical ones
        df = _to_logical(df, {"column_mapping": mapping})
    conds = {
        name: ~F.coalesce(F.expr(sql).cast("boolean"), F.lit(True))
        for name, sql in sorted(constraints.items())
    }
    from functools import reduce

    any_viol = reduce(lambda a, b: a | b, conds.values())
    if df.filter(any_viol).limit(1).count() == 0:
        return
    for name, cond in conds.items():
        if df.filter(cond).limit(1).count() > 0:
            raise ConstraintViolationError(
                f"incoming batch violates CHECK constraint {name!r} "
                f"({constraints[name]}) — commit refused, table untouched"
            )
    raise ConstraintViolationError(
        "incoming batch violates a CHECK constraint"
    )  # pragma: no cover — per-constraint loop always finds the culprit


def add_constraint(
    spark: SparkSession, path: str, name: str, sql: str
) -> dict:
    """ADD a named CHECK constraint to a manifest table (Delta's ALTER
    TABLE ADD CONSTRAINT). Existing data is validated FIRST (the add
    fails with the violating-row count if the table already breaks it),
    then the constraint lands as a metadata-only commit and every later
    ``append_rows`` / ``publish_overwrite`` / ``begin_publish`` batch
    is validated against it by one scan of the staged files before
    anything becomes visible (fail-closed: a violating batch raises
    :class:`ConstraintViolationError` and leaves the table untouched).
    Constraints survive rollback (RESTORE restores the target
    snapshot's set) and are carried by every commit."""
    import uuid as _uuid
    from pathlib import Path as _P

    F.expr(sql)  # fail fast on unparseable SQL
    live = _P(path)
    m = read_manifest(path)
    if m is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — constraints "
            "live in the manifest"
        )
    existing = (
        read_table(spark, path)
        .filter(~F.coalesce(F.expr(sql).cast("boolean"), F.lit(True)))
        .count()
    )
    if existing:
        raise ConstraintViolationError(
            f"cannot add CHECK constraint {name!r} ({sql}): {existing} "
            "existing row(s) violate it"
        )
    with publish_lock(live):
        current = read_manifest(path)
        if current is None or current["version"] != m["version"]:
            raise ConcurrentLakeModificationError(
                f"table at {path} moved past snapshot v{m['version']} "
                "while existing data was being validated — re-run"
            )
        cons = {**current.get("constraints", {}), name: sql}
        return _commit_manifest(
            live,
            current["files"],
            current["partition_by"],
            current,
            _uuid.uuid4().hex,
            constraints=cons,
        )


def drop_constraint(path: str, name: str) -> dict:
    """DROP a named CHECK constraint — a metadata-only commit."""
    import uuid as _uuid
    from pathlib import Path as _P

    live = _P(path)
    with publish_lock(live):
        current = read_manifest(path)
        if current is None:
            raise ValueError(f"table at {path} is not manifest-committed")
        cons = dict(current.get("constraints", {}))
        if name not in cons:
            raise KeyError(f"table at {path} has no constraint {name!r}")
        del cons[name]
        return _commit_manifest(
            live,
            current["files"],
            current["partition_by"],
            current,
            _uuid.uuid4().hex,
            constraints=cons,
        )


def begin_publish(
    spark: SparkSession,
    path: str,
    result: DataFrame,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> dict:
    """Write-audit-publish, step 1 (the Iceberg WAP pattern): stage a
    candidate snapshot WITHOUT committing it. The rewrite is written
    and its files moved into the live tree under globally unique part
    names — exactly a manifest publish — but the manifest POINTER is
    untouched; instead the would-be file set is recorded as
    ``_manifests/candidate_<txid>.json``. Readers cannot observe any
    of it. Audit the candidate with :func:`read_candidate` (data
    quality gates, row counts, constraint checks), then promote it
    with :func:`commit_publish` — one atomic pointer commit — or
    discard it with :func:`abort_publish`.

    Same replace semantics as ``publish_overwrite`` manifest mode:
    partitions present in ``result`` are replaced, the rest carried.

    100 TB design: the expensive Spark job (the staged write) happens
    entirely outside the commit path and outside any lock; audits read
    the candidate at full scan parallelism; promotion costs one JSON
    pointer replace no matter how much data the candidate carries. A
    crashed/abandoned candidate is invisible forever and reclaimed by
    :func:`vacuum_manifests` once older than its
    ``candidate_min_age_seconds`` grace (>= 1 hour by default — pass
    an age longer than your longest audit).

    Returns the candidate dict (pass it to the other WAP calls)."""
    import json
    import shutil
    import time
    import uuid as _uuid
    from pathlib import Path

    txid = _uuid.uuid4().hex
    live = Path(path)
    current = read_manifest(path)
    if current is None and live.exists() and (
        set(_data_file_relpaths(live)) - _candidate_file_relpaths(live)
    ):
        raise ValueError(
            f"table at {path} has data but no manifest — write-audit-"
            "publish needs manifest commits; publish_overwrite(..., "
            "manifest=True) it first"
        )
    if current is not None and current["partition_by"] != list(
        partition_by or []
    ):
        raise ValueError(
            f"partition_by {list(partition_by or [])} does not match the "
            f"table's committed layout {current['partition_by']}"
        )
    if current is not None and current.get("partition_specs"):
        raise ValueError(
            f"table at {path} is partition-evolved: a candidate's "
            "replaced-partitions semantics cannot see old-spec files' "
            "directories — compact_in_place() it first"
        )
    pre_mapping = (current or {}).get("column_mapping", {})
    cand_schema = result.schema.jsonValue()  # logical, like every commit
    if pre_mapping:
        result = _to_physical_df(result, current)
    staged = live / f"_staged_{txid}"
    writer = result.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(staged))
    staged_files = sorted(
        p.relative_to(staged) for p in staged.rglob("*.parquet") if p.is_file()
    )
    try:
        # candidates face the same CHECK gate as direct commits: WAP is
        # for bespoke audits, not a constraint bypass (a constraint
        # added between begin and commit is caught by commit_publish's
        # base_version check — constraint changes are commits, and so
        # are renames)
        if staged_files:
            _enforce_constraints(
                spark,
                staged,
                (current or {}).get("constraints", {}),
                mapping=pre_mapping,
            )
        new_files = _move_staged_in(live, staged, staged_files)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    prev_files = current["files"] if current else []
    if partition_by:
        replaced = {str(Path(f).parent) for f in new_files}
        carried = [
            f for f in prev_files if str(Path(f).parent) not in replaced
        ]
    else:
        carried = []
    cand = {
        "candidate": txid,
        "base_version": current["version"] if current else 0,
        "partition_by": list(partition_by or []),
        "files": sorted([*carried, *new_files]),
        "new_files": sorted(new_files),
        "schema": cand_schema,
        "column_mapping": dict(pre_mapping),
        "created_at": time.time(),
    }
    cpath = live / "_manifests"
    cpath.mkdir(parents=True, exist_ok=True)
    tmp = cpath / f".tmp_cand_{txid}"
    tmp.write_text(json.dumps(cand, sort_keys=True))
    import os

    os.replace(tmp, cpath / f"candidate_{txid}.json")
    return cand


def read_candidate(
    spark: SparkSession,
    path: str,
    candidate: dict,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read the table AS IF the candidate snapshot were committed — the
    audit-side read of write-audit-publish. Carried files keep the
    current snapshot's merge-on-read tombstones (the candidate's new
    files are clean by construction), exactly the visibility
    :func:`commit_publish` would produce."""
    current = read_manifest(path) or {}
    if schema is None and candidate.get("schema"):
        schema = T.StructType.fromJson(candidate["schema"])
    synth = {
        "files": candidate["files"],
        "file_added": {
            **current.get("file_added", {}),
            # new files postdate every existing tombstone scope
            **{
                f: current.get("version", 0) + 1
                for f in candidate["new_files"]
            },
        },
        "delete_predicates": current.get("delete_predicates", []),
        # the mapping the candidate was STAGED under, not the live one:
        # a rename committed mid-audit must fail loudly (below) rather
        # than silently NULL-fill the audited column
        "column_mapping": candidate.get("column_mapping", {}),
    }
    if current.get("column_mapping", {}) != candidate.get(
        "column_mapping", {}
    ):
        raise ConcurrentLakeModificationError(
            f"table at {path} renamed columns since this candidate was "
            "staged — the audit would read wrong data; abort and re-stage"
        )
    df = _masked_scan(spark, path, synth, candidate["files"], schema)
    if schema is not None and df.columns != list(schema.names):
        df = df.select(*schema.names)
    return df


def commit_publish(path: str, candidate: dict) -> dict:
    """Write-audit-publish, step 3: atomically promote an audited
    candidate. Optimistic concurrency against the base the candidate
    was staged from — if any writer committed since
    :func:`begin_publish`, the audit no longer describes what
    promotion would produce, so this raises
    :class:`ConcurrentLakeModificationError` (re-stage and re-audit).
    The candidate marker is consumed."""
    import uuid as _uuid
    from pathlib import Path

    live = Path(path)
    with publish_lock(live):
        current = read_manifest(path)
        actual = current["version"] if current else 0
        if actual != candidate["base_version"]:
            raise ConcurrentLakeModificationError(
                f"table at {path} is at snapshot v{actual}, but this "
                f"candidate was staged and audited against v"
                f"{candidate['base_version']} — abort and re-stage"
            )
        snap = _commit_manifest(
            live,
            candidate["files"],
            candidate["partition_by"] or None,
            current,
            _uuid.uuid4().hex,
            table_schema=candidate.get("schema"),
        )
    cpath = live / "_manifests" / f"candidate_{candidate['candidate']}.json"
    cpath.unlink(missing_ok=True)
    return snap


def abort_publish(path: str, candidate: dict) -> dict:
    """Write-audit-publish abort: delete the candidate's moved-in
    files (only its NEW files — carried files belong to committed
    snapshots) and its marker. The live table was never touched."""
    from pathlib import Path

    live = Path(path)
    removed = 0
    for rel in candidate["new_files"]:
        p = live / rel
        try:
            p.unlink()
            removed += 1
        except OSError:
            continue
    for d in sorted(
        (
            p
            for p in live.rglob("*")
            if p.is_dir()
            and not any(
                part.startswith(("_", "."))
                for part in p.relative_to(live).parts
            )
        ),
        key=lambda p: len(p.parts),
        reverse=True,
    ):
        try:
            d.rmdir()  # only succeeds when empty
        except OSError:
            pass
    (
        live / "_manifests" / f"candidate_{candidate['candidate']}.json"
    ).unlink(missing_ok=True)
    return {"files_removed": removed}


def verify_table(path: str, deep: bool = False) -> dict:
    """fsck for a manifest table: audit the committed state against the
    filesystem without reading data through Spark. Checks every file
    referenced by any RETAINED snapshot (the committed parent chain
    plus tag-pinned snapshots — exactly what time travel can reach and
    vacuum_manifests keeps) for existence and non-zero size;
    ``deep=True`` additionally re-reads each referenced parquet footer
    and compares it against the snapshot's recorded ``file_stats``
    (a mismatch means the file was replaced or corrupted in place —
    committed files are immutable by protocol). Also reports orphan
    data files no retained snapshot references (crashed publishes /
    vacuumable debris — waste, not corruption).

    Metadata-plus-footers only — cost is O(#files) stat calls (+ one
    footer read each when deep), no data scan; runs safely against a
    live table (publishes never delete committed files). Returns
    ``{"ok", "snapshots_checked", "files_checked", "missing", "empty",
    "stat_mismatches", "orphans", "candidate_files"}`` — ``ok`` ignores
    orphans; staged write-audit-publish candidates' files are listed
    under ``candidate_files`` (pending audit), never as orphans."""
    from pathlib import Path

    live = Path(path)
    current = read_manifest(path)
    if current is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — nothing to verify"
        )
    chain: list[dict] = [current]
    while chain[-1]["parent"] is not None:
        try:
            chain.append(read_manifest(path, chain[-1]["parent"]))
        except FileNotFoundError:
            break  # older history vacuumed
    # tag-pinned snapshots are retained (vacuum_manifests keeps them)
    # even once vacuum has removed the intermediate parent chain — the
    # audit must use vacuum's retention definition, or a tagged
    # training corpus' files get reported as vacuumable orphans and
    # deep stat checks skip them
    for v in sorted(set(list_tags(path).values()) - {m["version"] for m in chain}):
        try:
            chain.append(read_manifest(path, v))
        except FileNotFoundError:
            continue  # dangling tag — pre-existing damage, not new debris
    # ... and so are branch-pinned chains (unpublished backfills)
    seen = {m["version"] for m in chain}
    for m in _branch_pinned_manifests(path):
        if m["version"] not in seen:
            chain.append(m)
            seen.add(m["version"])
    referenced: dict[str, dict] = {}
    for m in chain:
        for f in m["files"]:
            referenced.setdefault(f, m)  # newest snapshot's stats win
    missing, empty, mismatches = [], [], []
    for f in sorted(referenced):
        p = live / f
        if not p.is_file():
            missing.append(f)
            continue
        if p.stat().st_size == 0:
            empty.append(f)
            continue
        if deep:
            recorded = referenced[f].get("file_stats", {}).get(f)
            if recorded:
                actual = _file_column_stats(p)
                for col, bounds in recorded.items():
                    if actual.get(col) != bounds:
                        mismatches.append(
                            {"file": f, "column": col,
                             "recorded": bounds,
                             "actual": actual.get(col)}
                        )
    # staged WAP candidates' files are pending-audit data, not debris:
    # report them separately so an operator doesn't "clean up" a
    # candidate mid-audit (vacuum_manifests protects fresh ones too)
    cand_files = _candidate_file_relpaths(live)
    orphans = sorted(
        set(_data_file_relpaths(live)) - set(referenced) - cand_files
    )
    return {
        "ok": not (missing or empty or mismatches),
        "snapshots_checked": [m["version"] for m in chain],
        "files_checked": len(referenced),
        "missing": missing,
        "empty": empty,
        "stat_mismatches": mismatches,
        "orphans": orphans,
        "candidate_files": sorted(cand_files - set(referenced)),
    }


def vacuum_manifests(
    path: str,
    keep_last: int = 1,
    min_age_seconds: float = 0.0,
    drop_tags: bool = False,
    candidate_min_age_seconds: float | None = None,
    dry_run: bool = False,
    older_than: float | None = None,
) -> dict:
    """Retention for manifest-table history: keep the newest
    ``keep_last`` snapshots of the committed parent chain, delete older
    snapshot files and every data file no retained snapshot references.
    The time-travel horizon IS the retention policy — the reference's
    analog is S3 lifecycle rules on noncurrent object versions
    (main.tf:25-30). ``min_age_seconds`` protects a concurrent
    publish's moved-but-uncommitted files (same contract as
    vacuum_publish_artifacts); write-audit-publish candidates get
    ``candidate_min_age_seconds`` (default: at least one hour) so a
    routine retention run cannot destroy a candidate mid-audit.
    Returns counts.

    ``older_than`` (epoch seconds; round-15 — the
    ``vacuum_max_snapshot_age_seconds`` analog, and the shape of the
    reference's own lifecycle rule: "expire noncurrent versions after
    N days") is the AGE horizon: chain snapshots whose
    ``committed_at`` is at or after it survive regardless of count.
    The count and age forms COMPOSE AS A UNION — a snapshot is
    retained if it is within the newest ``keep_last`` OR newer than
    the horizon — so adding an age policy can only widen retention,
    never silently narrow a count policy someone else relies on (and
    the head snapshot always survives, keep_last >= 1). Tag and
    branch pins apply on top of either form unchanged.

    ``dry_run=True`` reports exactly what a real run would remove —
    same retention walk, tag/branch pinning, and age guards — without
    unlinking anything (and without dropping tags even when
    ``drop_tags`` is set): the before-the-horizon-moves check every
    retention change deserves.

    GDPR interaction (round-7 VERDICT #8 note): physical erasure
    (delete_rows) on a manifest table rewrites only the CURRENT
    snapshot — matched rows survive in retained historical snapshots
    until this vacuum expires them. delete_rows therefore truncates
    history itself (keep_last=1) so its "no reader can observe a
    matched row" contract holds for time-travel readers too; an
    erasure-under-retention deployment must choose between replaying
    history and forgetting — there is no third option."""
    import time
    from pathlib import Path

    live = Path(path)
    current = read_manifest(path)
    if current is None:
        return {
            "manifests_removed": 0,
            "files_removed": 0,
            "candidates_removed": 0,
            "kept_versions": [],
        }
    keep: list[dict] = []
    for i, m in enumerate(_retained_chain(path, current)):
        # a chain manifest missing committed_at (hand-migrated or
        # damaged history) counts as INFINITELY NEW for the age
        # horizon — never age-expired. Defaulting the other way
        # (epoch 0) would make ANY horizon delete a snapshot of
        # unknown age: fail-destructive in a retention path
        # (round-15 review finding #4).
        age_pins = older_than is not None and (
            "committed_at" not in m
            or float(m["committed_at"]) >= older_than
        )
        if i < keep_last or age_pins:
            keep.append(m)
        elif older_than is None:
            break  # count-only: the chain is newest-first, all done
    # tags PIN retention (tag_snapshot): tagged snapshots and their
    # files survive any keep_last horizon. drop_tags=True is the
    # erasure override — delete_rows passes it so a right-to-be-
    # forgotten truncation cannot be pinned around.
    if drop_tags and not dry_run:
        (live / "_manifests" / "_tags.json").unlink(missing_ok=True)
        (live / "_manifests" / "_branches.json").unlink(missing_ok=True)
    elif not drop_tags:
        kept_now = {m["version"] for m in keep}
        for v in sorted(set(list_tags(path).values()) - kept_now):
            try:
                keep.append(read_manifest(path, v))
            except FileNotFoundError:
                continue  # dangling tag (pre-existing damage): nothing to pin
        # branches pin their whole unpublished chain (head -> fork base):
        # an in-progress multi-commit backfill must survive routine
        # retention exactly like a mid-audit WAP candidate does
        kept_now = {m["version"] for m in keep}
        for m in _branch_pinned_manifests(path):
            if m["version"] not in kept_now:
                keep.append(m)
                kept_now.add(m["version"])
    kept_versions = [m["version"] for m in keep]
    referenced = {f for m in keep for f in m["files"]}
    cutoff = time.time() - min_age_seconds
    # in-flight write-audit-publish candidates younger than the age
    # guard protect their files (an audit may be reading them); older
    # markers are abandoned begins — drop the marker and let the
    # unreferenced-file sweep below reclaim their data. Candidates get
    # their OWN grace period, never below one hour by default: the
    # routine retention call is vacuum_manifests(keep_last=N) with no
    # min_age (cutoff = now), and a mid-audit candidate must survive
    # that — destroying a live candidate is data loss for the WAP
    # writer. Pass candidate_min_age_seconds explicitly to override
    # (0.0 reclaims everything, for disaster cleanup).
    cand_cutoff = time.time() - (
        candidate_min_age_seconds
        if candidate_min_age_seconds is not None
        else max(min_age_seconds, 3600.0)
    )
    import json as _json

    candidates_removed = 0
    for cp in (live / "_manifests").glob("candidate_*.json"):
        try:
            if cp.stat().st_mtime > cand_cutoff:
                referenced |= set(_json.loads(cp.read_text())["files"])
            else:
                if not dry_run:
                    cp.unlink()
                candidates_removed += 1
        except (OSError, ValueError, KeyError):
            continue
    files_removed = 0
    for rel in _data_file_relpaths(live):
        if rel in referenced:
            continue
        p = live / rel
        try:
            if p.stat().st_mtime > cutoff:
                continue  # possibly an in-flight publish's moved file
            if not dry_run:
                p.unlink()
            files_removed += 1
        except OSError:
            continue
    # prune now-empty partition dirs (bottom-up; _manifests etc. excluded
    # by the underscore guard); a dry run must not even sweep these
    for d in [] if dry_run else sorted(
        (
            p
            for p in live.rglob("*")
            if p.is_dir()
            and not any(
                part.startswith(("_", "."))
                for part in p.relative_to(live).parts
            )
        ),
        key=lambda p: len(p.parts),
        reverse=True,
    ):
        try:
            d.rmdir()  # only succeeds when empty
        except OSError:
            pass
    manifests_removed = 0
    for mp in (live / "_manifests").glob("v*.json"):
        if not mp.stem[1:].isdigit():
            continue
        v = int(mp.stem[1:])
        if v in kept_versions:
            continue
        try:
            if mp.stat().st_mtime > cutoff:
                continue
            if not dry_run:
                mp.unlink()
            manifests_removed += 1
        except OSError:
            continue
    return {
        "manifests_removed": manifests_removed,
        "files_removed": files_removed,
        "candidates_removed": candidates_removed,
        "kept_versions": kept_versions,
        "dry_run": dry_run,
    }


def expire_snapshots(
    path: str,
    older_than: float,
    keep_last: int = 1,
    dry_run: bool = False,
) -> dict:
    """Age-based snapshot retention (round-15; r14 What's missing #1):
    expire chain snapshots committed BEFORE ``older_than`` (epoch
    seconds) — the Iceberg ``expire_snapshots(older_than=...)`` /
    Athena ``vacuum_max_snapshot_age_seconds`` verb, and the engine
    analog of the reference's S3 lifecycle rule expiring noncurrent
    object versions after a fixed age (main.tf:25-30). A thin named
    wrapper over :func:`vacuum_manifests`: the head snapshot (and any
    newest ``keep_last``) always survive, tag/branch pins apply
    unchanged, and the count/age horizons compose as a union."""
    return vacuum_manifests(
        path, keep_last=keep_last, older_than=older_than, dry_run=dry_run
    )


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_by: list[str] | None = None,
    evolve_schema: bool = False,
    schema: T.StructType | None = None,
    collect_stats: bool = True,
    bloom_cols: list[str] | None = None,
    updates_pinned: bool = False,
) -> dict:
    """Keyed MERGE/upsert on a plain-Parquet lake table — the Delta
    ``MERGE INTO`` / ``replaceWhere`` analog, executable without ACID
    jars. (The north star names Delta/Iceberg; this image ships neither
    ``delta-spark`` nor an Iceberg runtime jar and pip installs are
    unavailable, so this plain-Parquet path IS the upsert surface —
    see the durability contract below for what that costs.)

    Semantics: rows whose key matches an update row are REPLACED by it;
    unmatched update rows are INSERTED; all other rows are untouched.
    The reference's lake is immutable objects updated by whole-object
    rewrite (upload_sample.sh:27); this is the partition-granular version
    of that model.

    100 TB design: with ``partition_by``, only partitions that contain an
    updated key are rewritten — the touched-partition list comes from the
    updates side (one collect of distinct partition values, bounded by
    the update batch, not the table), the old-rows read is
    partition-pruned to exactly those directories, and the rewrite is
    staged + swapped per partition (``publish_overwrite``) so untouched
    partitions' files are never listed, read, or replaced. Cost scales
    with the touched slice, not table size. Unpartitioned tables degrade
    to a full rewrite — at scale, partition your lake. Returns
    ``{"rows_updated", "rows_inserted", "partitions_rewritten"}``.

    Contract (same as Delta MERGE + replaceWhere): update keys are unique
    within the batch, and a key's partition value never changes — a moved
    key would leave its old row alive in an untouched partition.

    Schema evolution (round-5 VERDICT #3): with ``evolve_schema=True``,
    columns the update batch adds are appended to the table — kept rows
    carry NULL, and partitions the batch doesn't touch keep their old
    files (their rows read as NULL through a merged/declared schema).
    Without the flag, an update batch with unknown columns fails fast —
    a typo'd column must not silently evolve the lake. Without a
    declared ``schema``, reads here use ``mergeSchema`` so a
    previously-evolved table can never lose its new columns to a footer
    picked from an old file (that would silently DROP evolved data from
    every rewritten row). ``mergeSchema`` is a distributed footer-read
    job over the whole table — fine for a dimension, wrong at 100 TB
    (millions of footers): pass ``schema`` (e.g. the governed catalog's
    declared schema) and the read plans ZERO footer reads while old
    files still NULL-fill evolved columns.

    Durability contract (round-6 VERDICT #3 closed the round-4 crash
    window): publication is stage-then-rename (:func:`publish_overwrite`).
    A crash during the rewrite job leaves the live table byte-identical
    (everything lands in an underscore-invisible staging dir); a crash
    during the swap leaves every partition either fully-old or fully-new
    — never torn, old files never deleted before their replacement is
    complete. Re-running the batch converges (the operation is
    idempotent given the same ``updates``); leftover staging/trash is
    reclaimed by :func:`vacuum_publish_artifacts`. This matches the
    reference's atomic-object-PUT model (main.tf:25-30) at partition
    granularity.
    """
    # Pin the updates batch ONCE: the merged frame AND the reported stats
    # must derive from the same materialization, or a nondeterministic
    # updates plan (sampling, un-sorted limit) makes the stats diverge
    # from what was written (round-4 ADVICE). ``updates_pinned=True`` is
    # the caller's statement that it ALREADY materialized the frame
    # (localCheckpoint/cache) — e.g. the CDC sinks checkpoint the batch
    # to run their own emptiness probe — so re-pinning here would only
    # add a copy job per micro-batch (r16, guide §2.4).
    if not updates_pinned:
        updates = updates.localCheckpoint(eager=True)
    else:
        # Guardrail (r16 ADVICE): trust-but-verify the caller's pin —
        # a merely-deterministic-LOOKING but unpinned plan would
        # silently reintroduce the stats-divergence bug. A checkpointed
        # frame's plan is (or roots in) a scan of materialized RDD
        # blocks; a cached frame carries InMemoryRelation.
        plan = updates._jdf.queryExecution().optimizedPlan().toString()
        if (
            "LogicalRDD" not in plan
            and "InMemoryRelation" not in plan
            and "Relation" not in plan.splitlines()[0]
        ):
            raise ValueError(
                "merge_into(updates_pinned=True) requires an actually "
                "materialized updates frame (localCheckpoint or cache); "
                "got an unpinned plan:\n" + plan[:500]
            )
    # Optimistic concurrency: remember which snapshot this rewrite is
    # computed against (read_table's file list is fixed at planning
    # time); the publish refuses to commit over a different one.
    pre = read_manifest(path)
    base_version = pre["version"] if pre else None
    if partition_by:
        missing = [c for c in partition_by if c not in updates.columns]
        if missing:
            raise ValueError(f"updates missing partition columns: {missing}")
        touched = updates.select(*partition_by).distinct()
        # NULL-safe restriction: an update batch targeting the NULL
        # (Hive default) partition must still pull that partition's old
        # rows into the rewrite, or the staged replacement erases them.
        current = _restrict_to_partitions(
            read_table(spark, path, schema), touched, partition_by
        )
        n_partitions = touched.count()
    else:
        current = read_table(spark, path, schema)
        n_partitions = -1  # full rewrite
    new_cols = [c for c in updates.columns if c not in current.columns]
    if new_cols and not evolve_schema:
        raise ValueError(
            f"updates add columns {new_cols} not on the table; pass "
            "evolve_schema=True to evolve it"
        )
    for c in new_cols:
        current = current.withColumn(c, F.lit(None).cast(updates.schema[c].dataType))
    cols = current.columns
    keep = current.join(updates, key_cols, "left_anti")
    # No localCheckpoint needed: the staged write (publish_overwrite)
    # never targets the directory this plan reads, so there is no
    # read-under-overwrite hazard to pin against.
    merged = keep.select(*cols).unionByName(updates.select(*cols))
    if collect_stats:
        # Key-overlap stats: column-pruned semi-join count over the
        # pinned updates, evaluated BEFORE the swap mutates ``path``.
        # ``collect_stats=False`` skips these two jobs — the right call
        # for high-frequency callers that never read them (CDC
        # micro-batches); the updates localCheckpoint above stays
        # unconditionally, because it also pins WHICH rows the
        # touched-partition list and the staged write see.
        n_updated = (
            current.select(*key_cols)
            .join(updates.select(*key_cols), key_cols, "left_semi")
            .count()
        )
        n_inserted = updates.count() - n_updated
    else:
        n_updated = n_inserted = None
    publish_overwrite(
        spark,
        path,
        merged,
        partition_by,
        bloom_cols=bloom_cols,
        expected_version=base_version,
    )
    return {
        "rows_updated": n_updated,
        "rows_inserted": n_inserted,
        "partitions_rewritten": n_partitions,
    }


def scd2_partition_value(from_expr):
    """The stored partition value of a version row: the calendar month of
    its ``effective_from``. One derivation shared by writers and readers
    keeps the invariant checkable (partition value is a pure function of
    the row's validity start, so closing a row never moves it)."""
    return F.date_format(from_expr, "yyyy-MM")


def scd2_apply(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    change_cols: list[str],
    as_of,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
    partition_col: str | None = None,
    evolve_schema: bool = False,
    schema: T.StructType | None = None,
    collect_stats: bool = True,
) -> dict:
    """Type-2 slowly-changing-dimension apply on a plain-Parquet table.

    The table carries validity metadata per row: ``from_col`` (when the
    version became effective), ``to_col`` (NULL while current), and
    ``current_col``. Applying an update batch at ``as_of``:

    - a key whose ``change_cols`` DIFFER from its current row closes that
      row (``to_col = as_of``, ``current_col = false``) and inserts the
      new version as current;
    - a key absent from the table inserts as a new current row;
    - a key whose ``change_cols`` are unchanged is a NO-OP (no spurious
      version — the null-safe comparison treats NULL = NULL as equal);
    - historical (non-current) rows are never touched.

    Partial-attribute batches (round-5 ADVICE): an inserted version
    takes every column the batch supplies from the batch and CARRIES
    FORWARD the rest from the key's current row — a batch that only
    ships (key, changed attribute) no longer nulls out the other
    attributes. Brand-new keys have no row to carry from; their missing
    columns are NULL.

    Partitioned dimensions (round-5 VERDICT #6): pass
    ``partition_col`` naming a stored hive-partition column whose value
    is ``scd2_partition_value(from_col)`` (the month of the validity
    start). Closing a row never changes its ``from_col``, so every
    touched row stays in its partition and the rewrite is bounded to
    the partitions that actually hold closing rows plus the ``as_of``
    month — written with dynamic ``partitionOverwriteMode`` so
    untouched partitions' files are never listed, read for rewrite, or
    replaced (byte-identical; pinned in tests/test_lake_features.py).
    The change-detection read still scans current rows of every
    partition (``current_col`` pushes into the parquet scan); at rest a
    current-rows projection or max-month stats would prune that too.

    Contract: update keys unique per batch. Same durability contract as
    merge_into: stage-then-rename publication (publish_overwrite) — a
    crash mid-rewrite leaves the live table byte-identical, a crash
    mid-swap leaves whole old or whole new partitions, and re-running
    the batch converges (an already-applied change compares
    unchanged). Scale: one key-join against current rows only (AQE
    broadcasts a small batch), map-only version arithmetic, rewrite
    bounded by touched partitions.
    """
    if not change_cols:
        raise ValueError("change_cols must be non-empty: nothing to compare")
    missing = [c for c in [*key_cols, *change_cols] if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing key/change columns: {missing}")
    pre = read_manifest(path)  # optimistic concurrency (merge_into's note)
    base_version = pre["version"] if pre else None
    cur = read_table(spark, path, schema)
    if partition_col is not None and partition_col not in cur.columns:
        raise ValueError(f"table at {path} has no partition column {partition_col!r}")
    meta_cols = (from_col, to_col, current_col)
    invalid = [c for c in updates.columns if c in meta_cols]
    if invalid:
        raise ValueError(
            f"updates may not carry validity metadata columns: {invalid}"
        )
    bad = [c for c in updates.columns if c not in cur.columns]
    if bad and not evolve_schema:
        raise ValueError(
            f"updates columns not in the dimension: {bad} (pass "
            "evolve_schema=True to add them)"
        )
    for c in bad:
        # evolved attribute: pre-evolution versions carry NULL (and, when
        # partitioned, untouched partitions keep their old files — the
        # mergeSchema read above NULL-fills them on the next apply)
        cur = cur.withColumn(c, F.lit(None).cast(updates.schema[c].dataType))
    data_cols = [c for c in cur.columns if c not in meta_cols]
    updates = updates.localCheckpoint(eager=True)
    active = cur.filter(F.col(current_col))
    upd_data = [c for c in updates.columns if c not in key_cols]
    upd = updates.select(
        *key_cols, *[F.col(c).alias(f"__new_{c}") for c in upd_data]
    )
    # r17 (guide §2.4 — don't re-evaluate what you already computed):
    # the change-detection join (dimension scan + key join) used to be
    # re-run by every downstream consumer — three changed_keys broadcast
    # builds, the new-keys anti-join, the touched-partition count, both
    # stats counts, and the staged write each re-planned the whole
    # chain. Pin it ONCE; everything below derives from the pin, so the
    # dimension is scanned exactly twice per apply (here, and once more
    # for the untouched slice inside the publish). The pin is
    # batch-bounded (rows = update keys present in the dimension).
    joined = active.join(upd, key_cols, "inner").localCheckpoint(eager=True)
    same = None
    for c in change_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__new_{c}"))
        same = eq if same is None else (same & eq)
    # `changed` carries BOTH the closing row (the active columns) and
    # the replacement version (the __new_* columns) for every changed
    # key — update keys are unique per batch (the documented contract),
    # so projecting it is row-identical to the former semi-joins.
    changed = joined.filter(~same)
    changed_keys = changed.select(*key_cols)
    # updates-keys not matched by the join == updates-keys absent from
    # the dimension (the former anti-join against the full active scan)
    new_keys = upd.select(*key_cols).join(
        joined.select(*key_cols), key_cols, "left_anti"
    )
    closing = (
        changed.select(*cur.columns)
        .withColumn(to_col, F.lit(as_of))
        .withColumn(current_col, F.lit(False))
    )
    # New versions of changed keys: batch-supplied columns from the
    # batch, everything else carried forward from the closing row.
    ins_changed = changed.select(
        *[
            F.col(f"__new_{c}").alias(c) if c in upd_data else F.col(c)
            for c in data_cols
        ]
    )
    ins_new = updates.join(F.broadcast(new_keys), key_cols, "left_semi").select(
        *[
            F.col(c)
            if c in updates.columns
            else F.lit(None).cast(cur.schema[c].dataType).alias(c)
            for c in data_cols
        ]
    )
    inserted = (
        ins_changed.unionByName(ins_new)
        .withColumn(from_col, F.lit(as_of))
        .withColumn(to_col, F.lit(None).cast(cur.schema[to_col].dataType))
        .withColumn(current_col, F.lit(True))
    )
    if partition_col is not None:
        inserted = inserted.withColumn(
            partition_col, scd2_partition_value(F.col(from_col))
        )
        # Rewrite slice: partitions holding a closing row + the as_of
        # month the inserts land in. Everything else is never read back
        # or rewritten.
        touched = (
            closing.select(partition_col)
            .distinct()
            .unionByName(
                inserted.select(partition_col).distinct()
            )
            .distinct()
        )
        base = _restrict_to_partitions(cur, touched, [partition_col])
        n_partitions = touched.count()
    else:
        base = cur
        n_partitions = -1  # full rewrite
    # keep ALL (in-slice) historical rows plus the active rows of
    # unchanged keys — only the active rows of changed keys leave this
    # set (they re-enter via `closing`)
    untouched = base.filter(~F.col(current_col)).unionByName(
        base.filter(F.col(current_col)).join(
            F.broadcast(changed_keys), key_cols, "left_anti"
        )
    )
    out_cols = cur.columns
    # No localCheckpoint: publish_overwrite stages to a directory the
    # plan never reads, then swaps — no read-under-overwrite hazard.
    result = (
        untouched.select(*out_cols)
        .unionByName(closing.select(*out_cols))
        .unionByName(inserted.select(*out_cols))
    )
    if collect_stats:
        # two O(batch-bounded) counts; skip for high-frequency callers
        # that never read them (merge_into's collect_stats contract)
        n_closed = closing.count()
        n_inserted = inserted.count()
    else:
        n_closed = n_inserted = None
    publish_overwrite(
        spark,
        path,
        result,
        [partition_col] if partition_col is not None else None,
        expected_version=base_version,
    )
    return {
        "rows_closed": n_closed,
        "rows_inserted": n_inserted,
        "partitions_rewritten": n_partitions,
    }


def scd2_as_of(
    spark: SparkSession,
    path: str,
    as_of,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    schema: T.StructType | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Point-in-time read of an scd2_apply-maintained dimension: the row
    version valid at ``as_of`` per key (from <= as_of < to, with NULL
    ``to`` meaning still open). This is the time-travel query a Delta
    user runs with VERSION AS OF — on a versioned plain-Parquet
    dimension it is a pushdown-friendly filter, no table format needed.

    Scale: both validity predicates push into the Parquet scan; on a
    month-partitioned dimension pass ``partition_col`` and the read
    additionally PRUNES every partition after the as-of month at
    planning time — sound because the stored partition value is the
    month of ``from_col`` (scd2_partition_value), and ``from_col <=
    as_of`` implies its month <= the as-of month ('yyyy-MM' strings
    compare lexicographically in date order). Versions that STARTED
    after ``as_of`` cannot be valid at it, so whole future months are
    never listed or read — the common "read last month's dimension
    state against years of history" query touches only the partitions
    up to that month."""
    df = read_table(spark, path, schema)
    if partition_col is not None:
        df = df.filter(
            F.col(partition_col) <= scd2_partition_value(F.lit(as_of))
        )
    return df.filter(
        (F.col(from_col) <= F.lit(as_of))
        & (F.col(to_col).isNull() | (F.col(to_col) > F.lit(as_of)))
    )


def delete_rows(
    spark: SparkSession,
    path: str,
    predicate,
    partition_col: "str | list[str] | None" = None,
    schema: T.StructType | None = None,
) -> dict:
    """Physical row deletion from a plain-Parquet table — the DELETE
    FROM / GDPR-erasure primitive (the reference's model is S3 object
    deletion; this is the row-granular version). ``predicate`` is a SQL
    string or Column selecting the rows to REMOVE.

    100 TB design: the match predicate pushes into the parquet scan;
    with ``partition_col`` only partitions actually CONTAINING a
    matched row are rewritten (touched list = one distinct-collect over
    the scan-pruned matched slice), publication is atomic
    (publish_overwrite), and a partition whose every row matches is
    REMOVED outright — erasing one user's bucket never lists, reads,
    or rewrites anyone else's. Returns
    ``{"rows_deleted", "partitions_rewritten"}``.

    Erasure contract: after return, no reader (any predicate, any
    projection) can observe a matched row — rows are physically gone
    from the committed files, not tombstoned. Idempotent: re-running
    deletes nothing and rewrites nothing.
    """
    # Three-valued logic: rows where the predicate is NULL are NOT
    # matched — and must therefore be KEPT. A bare ``~pred`` keep-filter
    # would silently destroy them (NULL lands in neither side); coalesce
    # makes the match/keep pair a true partition of every row.
    raw = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred = F.coalesce(raw.cast("boolean"), F.lit(False))
    part_cols = (
        [partition_col] if isinstance(partition_col, str) else partition_col
    )
    pre = read_manifest(path)  # optimistic concurrency (merge_into's note)
    base_version = pre["version"] if pre else None
    cur = read_table(spark, path, schema)
    if part_cols:
        missing = [c for c in part_cols if c not in cur.columns]
        if missing:
            raise ValueError(
                f"table at {path} has no partition columns {missing}"
            )
    else:
        # Fail-closed layout guard (round-7 ADVICE): an unpartitioned
        # full rewrite of a hive-partitioned table would swap in a tree
        # WITHOUT partition dirs — the layout is silently destroyed and
        # a later partitioned publish would flip leaf dirs in next to
        # the leftover root files, duplicating rows.
        from pathlib import Path as _P

        root = _P(path)
        if root.is_dir() and any(
            c.is_dir() and "=" in c.name and not c.name.startswith(("_", "."))
            for c in root.iterdir()
        ):
            raise ValueError(
                f"table at {path} is hive-partitioned but no partition_col "
                "was given: refusing the unpartitioned full rewrite that "
                "would destroy the layout — pass the partition column(s)"
            )
    matched = cur.filter(pred)
    if part_cols:
        # r17 (guide §2.4): ONE aggregation job replaces the former
        # matched.count() + touched-distinct-collect pair — the matched
        # slice was scanned twice to answer two questions one per-
        # partition rollup answers together. O(#touched) collect: the
        # values double as the drop-list for partitions the deletion
        # EMPTIES — their staged rewrite has zero rows, so publish must
        # remove their old directories.
        per_part = (
            matched.groupBy(*part_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        n_deleted = sum(r["__n"] for r in per_part)
        if n_deleted == 0:
            return {"rows_deleted": 0, "partitions_rewritten": 0}
        touched_rows = [tuple(r)[: len(part_cols)] for r in per_part]
        # explicit schema: a NULL partition value (the Hive default
        # partition) must not break type inference
        touched = spark.createDataFrame(
            touched_rows, matched.select(*part_cols).schema
        )
        base = _restrict_to_partitions(cur, touched, part_cols)
        n_partitions = len(touched_rows)
        drop = [hive_partition_relpath(part_cols, r) for r in touched_rows]
    else:
        n_deleted = matched.count()
        if n_deleted == 0:
            return {"rows_deleted": 0, "partitions_rewritten": 0}
        base = cur
        n_partitions = -1  # full rewrite
        drop = None
    keep = base.filter(~pred)
    publish_overwrite(
        spark,
        path,
        keep,
        part_cols,
        drop_missing_partitions=drop,
        expected_version=base_version,
    )
    if read_manifest(path) is not None:
        # Erasure dominates time travel (vacuum_manifests' GDPR note):
        # the rewrite produced a clean CURRENT snapshot, but matched
        # rows still exist in retained historical snapshots' files —
        # truncate history so the "no reader can observe a matched row"
        # contract holds for version= readers too. drop_tags: erasure
        # dominates tag pinning the same way it dominates time travel.
        vacuum_manifests(path, keep_last=1, drop_tags=True)
    return {"rows_deleted": n_deleted, "partitions_rewritten": n_partitions}


def update_rows(
    spark: SparkSession,
    path: str,
    assignments: dict,
    predicate,
    partition_col: "str | list[str] | None" = None,
    schema: T.StructType | None = None,
) -> dict:
    """In-place UPDATE on a plain-Parquet / manifest lake table — the
    ``UPDATE <t> SET col = expr WHERE pred`` primitive (the reference's
    Athena v3 executes this verb on governed Iceberg tables;
    validate.sh:74-87 is the submission shape). ``assignments`` maps
    column names to SQL expression strings or Columns; ``predicate``
    selects the rows to transform (SQL string or Column).

    Semantics: matched rows are REPLACED by themselves with the SET
    expressions applied (expressions see the row's OLD values, all
    evaluated simultaneously — standard SQL UPDATE); unmatched rows are
    untouched. Rows where the predicate evaluates NULL are NOT matched
    (three-valued logic, :func:`delete_rows`'s contract).

    100 TB design (same shape as :func:`delete_rows`): the match
    predicate pushes into the parquet scan; with ``partition_col`` only
    partitions actually CONTAINING a matched row are rewritten (touched
    list = one distinct-collect over the scan-pruned matched slice) and
    publication is atomic per :func:`publish_overwrite`. Untouched
    partitions' files are never listed, read, or replaced. Unlike
    :func:`delete_rows`, history is NOT truncated — UPDATE is a normal
    mutation, so prior snapshots stay time-travelable and
    :func:`table_changes` sees the update as delete+insert pairs.

    Guard: SET may not target a partition column — the transformed row
    would belong in a different directory than the rewrite targets,
    silently corrupting the layout (move rows with
    :func:`delete_rows` + :func:`append_rows`, or :func:`merge_into`
    on an identity key). Returns ``{"rows_updated",
    "partitions_rewritten"}``. Idempotence is NOT implied (``SET n =
    n + 1`` re-applies); the optimistic-concurrency check
    (``expected_version`` on manifest tables) is what prevents a
    double-submit from racing another writer.
    """
    raw = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred = F.coalesce(raw.cast("boolean"), F.lit(False))
    part_cols = (
        [partition_col] if isinstance(partition_col, str) else partition_col
    )
    set_map = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }
    if not set_map:
        raise ValueError("update_rows needs at least one SET assignment")
    if part_cols:
        struck = sorted(set(set_map) & set(part_cols))
        if struck:
            raise ValueError(
                f"SET targets partition column(s) {struck}: the updated "
                "row would belong in a different directory than this "
                "rewrite replaces — move rows via delete+append or a "
                "keyed merge_into instead"
            )
    pre = read_manifest(path)  # optimistic concurrency (merge_into's note)
    base_version = pre["version"] if pre else None
    cur = read_table(spark, path, schema)
    unknown = sorted(set(set_map) - set(cur.columns))
    if unknown:
        raise ValueError(f"SET targets unknown column(s) {unknown}")
    if part_cols:
        missing = [c for c in part_cols if c not in cur.columns]
        if missing:
            raise ValueError(
                f"table at {path} has no partition columns {missing}"
            )
    else:
        # same fail-closed layout guard as delete_rows: refuse the
        # unpartitioned full rewrite of a hive-partitioned tree
        from pathlib import Path as _P

        root = _P(path)
        if root.is_dir() and any(
            c.is_dir() and "=" in c.name and not c.name.startswith(("_", "."))
            for c in root.iterdir()
        ):
            raise ValueError(
                f"table at {path} is hive-partitioned but no partition_col "
                "was given: refusing the unpartitioned full rewrite that "
                "would destroy the layout — pass the partition column(s)"
            )
    matched = cur.filter(pred)
    if part_cols:
        # one rollup answers count + touched list together (delete_rows'
        # r17 note)
        per_part = (
            matched.groupBy(*part_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        n_updated = sum(r["__n"] for r in per_part)
        if n_updated == 0:
            return {"rows_updated": 0, "partitions_rewritten": 0}
        touched_rows = [tuple(r)[: len(part_cols)] for r in per_part]
        touched = spark.createDataFrame(
            touched_rows, matched.select(*part_cols).schema
        )
        base = _restrict_to_partitions(cur, touched, part_cols)
        n_partitions = len(touched_rows)
    else:
        n_updated = matched.count()
        if n_updated == 0:
            return {"rows_updated": 0, "partitions_rewritten": 0}
        base = cur
        n_partitions = -1  # full rewrite
    # one pass over the touched slice: SET expressions evaluate against
    # OLD values simultaneously (CASE WHEN pred THEN expr ELSE col), and
    # column order/types are pinned to the table schema so the staged
    # files are drop-in replacements
    out = base.select(
        *[
            (
                F.when(pred, set_map[c].cast(base.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_map
                else F.col(c)
            )
            for c in base.columns
        ]
    )
    publish_overwrite(
        spark,
        path,
        out,
        part_cols,
        expected_version=base_version,
    )
    return {"rows_updated": n_updated, "partitions_rewritten": n_partitions}


def delete_rows_mor(
    spark: SparkSession,
    path: str,
    predicate: str,
    count: bool = True,
) -> dict:
    """Merge-on-read DELETE on a manifest table: commit a predicate
    TOMBSTONE instead of rewriting data — the Delta deletion-vector /
    Iceberg merge-on-read analog, expressed as a predicate scoped by
    file sequence number rather than per-file position bitmaps.

    The commit is **metadata-only**: the new snapshot carries the same
    file list plus ``{"pred": predicate, "scope": current_version}`` in
    ``delete_predicates``. Every read path (:func:`read_table`, time
    travel, :func:`table_changes`, and everything built on them)
    applies the tombstone as a keep-filter over files with
    ``file_added <= scope`` — a plain Catalyst filter, no join, no
    shuffle — while files committed AFTER the delete are never
    consulted against it, so later appends/merges land rows matching
    the old predicate untouched (exactly Iceberg's sequence-number
    rule). :func:`purge_deleted_rows` (or any full rewrite) later
    materializes and clears accumulated tombstones.

    100 TB design: DELETE cost becomes O(1) data movement — one
    manifest commit — regardless of how many TB the predicate touches;
    the rewrite is deferred to purge/compaction where it amortizes.
    The read-side cost is one pushable filter until purge. This is the
    low-latency complement to :func:`delete_rows` (copy-on-write).

    **Not an erasure primitive**: matched rows remain physically
    present in the data files and readable via time travel until
    :func:`purge_deleted_rows` + :func:`vacuum_manifests` (or eager
    :func:`delete_rows`, the GDPR path, which also truncates history).

    ``predicate`` must be a SQL string (it is stored in the manifest
    JSON). Rows where it evaluates NULL are NOT matched and stay
    visible (three-valued logic, :func:`delete_rows`'s contract).
    ``count=False`` skips the matched-row count scan — the commit
    itself never needs one. Returns ``{"rows_deleted", "version",
    "tombstones"}`` (``rows_deleted`` None when uncounted)."""
    import uuid as _uuid
    from pathlib import Path as _P

    if not isinstance(predicate, str):
        raise TypeError(
            "delete_rows_mor stores the predicate in the manifest — "
            "pass a SQL string, not a Column"
        )
    F.expr(predicate)  # fail fast on unparseable SQL
    live = _P(path)
    m = read_manifest(path)
    if m is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — tombstones "
            "live in the manifest; use delete_rows (eager) or "
            "publish_overwrite(..., manifest=True) first"
        )
    rows_deleted = None
    if count:
        raw = F.expr(predicate).cast("boolean")
        rows_deleted = (
            read_table(spark, path)
            .filter(F.coalesce(raw, F.lit(False)))
            .count()
        )
    with publish_lock(live):
        current = read_manifest(path)
        if current is None or current["version"] != m["version"]:
            raise ConcurrentLakeModificationError(
                f"table at {path} moved past snapshot v{m['version']} "
                "while the delete was being prepared — re-run against "
                "the current snapshot"
            )
        tomb = {"pred": predicate, "scope": current["version"]}
        snap = _commit_manifest(
            live,
            current["files"],
            current["partition_by"],
            current,
            _uuid.uuid4().hex,
            delete_predicates=[
                *current.get("delete_predicates", []),
                tomb,
            ],
        )
    return {
        "rows_deleted": rows_deleted,
        "version": snap["version"],
        "tombstones": len(snap.get("delete_predicates", [])),
    }


def purge_deleted_rows(
    spark: SparkSession,
    path: str,
    compression: str = "snappy",
) -> dict:
    """Materialize a manifest table's accumulated merge-on-read
    tombstones (:func:`delete_rows_mor`): rewrite ONLY the files a
    tombstone covers, with the keep-filters applied, and commit
    ``uncovered ∪ rewritten`` — the new snapshot's data is clean, so
    :func:`_commit_manifest`'s coverage pruning clears every tombstone
    with no explicit step. File-granular: uncovered files (everything
    appended or rewritten since the last delete) are carried by NAME,
    never listed, read, or rewritten; a 100 TB table pays only for the
    covered slice, which the purge cadence bounds.

    Fully-deleted partitions simply stop being referenced (manifest
    readers never list directories); their on-disk remnants fall to
    :func:`vacuum_manifests`, which also removes then-empty dirs.
    Physical erasure = purge + ``vacuum_manifests(keep_last=1)``;
    until then the pre-purge snapshots still time-travel.

    Returns ``{"files_rewritten", "files_written",
    "tombstones_cleared", "version"}`` (version None on no-op)."""
    import shutil
    import uuid as _uuid
    from pathlib import Path as _P

    live = _P(path)
    m = read_manifest(path)
    if m is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — nothing to purge"
        )
    covered = [f for f in m["files"] if _applicable_tombstones(m, f)]
    n_tomb = len(m.get("delete_predicates", []))
    if not covered:
        return {
            "files_rewritten": 0,
            "files_written": 0,
            "tombstones_cleared": 0,
            "version": None,
        }
    uncovered = [f for f in m["files"] if not _applicable_tombstones(m, f)]
    schema = (
        T.StructType.fromJson(m["schema"]) if m.get("schema") else None
    )
    part_by = list(m.get("partition_by") or [])
    df = _masked_scan(spark, path, m, covered, schema)
    # the masked scan returns LOGICAL names; staged files must carry the
    # frozen physical ones like every other write path, or the carried
    # mapping would NULL-fill the renamed column on the next read
    df = _to_physical_df(df, m)
    txid = _uuid.uuid4().hex
    staged = live / f"_staged_{txid}"
    writer = df.write.mode("overwrite").option("compression", compression)
    if part_by:
        writer = writer.partitionBy(*part_by)
    writer.parquet(str(staged))
    staged_files = sorted(
        p.relative_to(staged) for p in staged.rglob("*.parquet") if p.is_file()
    )
    try:
        with publish_lock(live):
            current = read_manifest(path)
            if current is None or current["version"] != m["version"]:
                raise ConcurrentLakeModificationError(
                    f"table at {path} moved past snapshot v{m['version']} "
                    "while the purge rewrite ran — re-run against the "
                    "current snapshot"
                )
            new_files = _move_staged_in(live, staged, staged_files)
            snap = _commit_manifest(
                live,
                [*uncovered, *new_files],
                part_by or None,
                current,
                txid,
            )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    assert not snap.get("delete_predicates"), snap.get("delete_predicates")
    return {
        "files_rewritten": len(covered),
        "files_written": len(new_files),
        "tombstones_cleared": n_tomb,
        "version": snap["version"],
    }


def expire_scd2_versions(
    spark: SparkSession,
    path: str,
    before,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
    partition_col: str | None = None,
    schema: T.StructType | None = None,
) -> dict:
    """Retention/vacuum for an scd2_apply-maintained dimension (round-6
    VERDICT #4): physically remove version rows whose validity ENDED at
    or before ``before`` (``to_col`` non-NULL and <= before). Without
    retention, SCD2 history grows forever; the reference's history story
    is lifecycle-managed bucket versioning (main.tf:25-30) — this is the
    engine's expire-old-versions equivalent.

    Exactness contract (pinned in tests/test_lake_features.py): any
    :func:`scd2_as_of` read with ``as_of >= before`` replays EXACTLY as
    it did pre-expiry — a row valid at such an ``as_of`` has
    ``to_col > as_of >= before`` and is therefore retained. Reads before
    the horizon lose the expired versions (that is the point). Current
    rows (NULL ``to_col``) are never touched.

    100 TB design: the expired-row predicate pushes into the parquet
    scan; with ``partition_col`` only partitions actually CONTAINING an
    expired row are rewritten — the touched-partition list is one
    distinct-collect over the (scan-pruned) expired slice, the rewrite
    publishes atomically via :func:`publish_overwrite`, and untouched
    partitions' files are never listed, read, or replaced. A
    month-partitioned dimension (scd2_partition_value) ages naturally:
    old months stop containing unexpired closed rows and fall out of
    every later expire's touch set. Returns
    ``{"rows_expired", "partitions_rewritten"}``.
    """
    # Retention IS a deletion: versions whose validity ENDED at or
    # before the horizon. All machinery (scan-pruned match,
    # touched-partition rewrite, emptied-partition removal, atomic
    # publish) is delete_rows'.
    stats = delete_rows(
        spark,
        path,
        F.col(to_col).isNotNull() & (F.col(to_col) <= F.lit(before)),
        partition_col=partition_col,
        schema=schema,
    )
    return {
        "rows_expired": stats["rows_deleted"],
        "partitions_rewritten": stats["partitions_rewritten"],
    }


def optimize_binpack(
    spark: SparkSession,
    path: str,
    target_rows: int = 1_000_000,
    compression: str = "snappy",
    partition_where: str | None = None,
) -> dict:
    """Targeted small-file OPTIMIZE on a manifest table: rewrite ONLY
    the small-file tail (files whose recorded row count is below
    ``target_rows``), bin-packed per partition directory, committed as
    one manifest snapshot carrying every untouched file by name. The
    Delta ``OPTIMIZE`` bin-packing semantics — and the operation that
    actually matters at 100 TB, where :func:`compact_in_place`'s full
    rewrite is a cluster-day but the streaming-append tail is a few
    thousand tiny files: cost here is O(small-file bytes), never
    O(table bytes).

    Uses the manifest's own per-file row counts (recorded at every
    commit for metadata-only COUNT) to pick files — zero I/O planning.
    Fail-closed on state it would corrupt, with the designated cure:

    - partition-spec evolved (retired-spec files remain) → a partial
      rewrite cannot preserve old-spec directories; ``compact_in_place``
      migrates and heals.
    - live rename mapping → files carry frozen physical names and this
      rewrite round-trips raw files; ``compact_in_place`` migrates.
    - merge-on-read tombstones → new files get a fresh sequence number
      outside every tombstone's scope, so covered rows would RESURRECT;
      :func:`purge_deleted_rows` first.
    - missing row counts (pre-recording snapshots) → re-publish once.

    Bin-packed files get fresh footer stats at commit (the same read
    that records their row counts); they drop any per-file bloom their
    inputs carried (blooms are recorded by bloom-writing commits —
    re-add on the next such write, or accept the scan). Untouched files
    inherit stats, blooms, and sequence numbers unchanged. Optimistic
    concurrency: refuses if any writer committed since planning.

    ``partition_where`` scopes the pack to matching partitions
    (Delta's ``OPTIMIZE ... WHERE``): a Spark SQL predicate over the
    table's PARTITION columns, evaluated driver-side against the
    manifest's directory names (hive values surface as strings; NULL
    partitions as NULL — use ``IS NULL``). Predicates referencing
    non-partition columns fail loudly (an OPTIMIZE must never half-
    apply a row predicate). The maintenance-cadence shape at 100 TB:
    compact yesterday's hot partition, never walk the table.

    Returns ``{"files_before", "files_after", "files_rewritten",
    "version"}`` (version None when nothing needed packing)."""
    import math
    import shutil
    import uuid as _uuid
    from collections import defaultdict
    from pathlib import Path

    live = Path(path)
    m = read_manifest(path)
    if m is None:
        raise ValueError(
            f"table at {path} is not manifest-committed — nothing to optimize"
        )
    if m.get("partition_specs"):
        raise ValueError(
            f"table at {path} is partition-evolved — compact_in_place() "
            "migrates retired-spec files; a partial bin-pack cannot"
        )
    if m.get("column_mapping"):
        raise ValueError(
            f"table at {path} has a live rename mapping — "
            "compact_in_place() migrates physical names; a raw-file "
            "bin-pack cannot"
        )
    if m.get("delete_predicates"):
        raise ValueError(
            f"table at {path} carries merge-on-read tombstones — "
            "purge_deleted_rows() first (bin-packed files would escape "
            "every tombstone's sequence scope and resurrect deleted rows)"
        )
    file_rows = m.get("file_rows", {})
    missing = [f for f in m["files"] if f not in file_rows]
    if missing:
        raise ValueError(
            f"table at {path} lacks recorded row counts for "
            f"{len(missing)} file(s) — re-publish once to record them"
        )
    allowed_dirs: set | None = None
    if partition_where is not None:
        pb = list(m.get("partition_by") or [])
        if not pb:
            raise ValueError(
                "OPTIMIZE ... WHERE requires a partitioned table — the "
                f"table at {path} is unpartitioned"
            )
        dirs = sorted({str(Path(f).parent) for f in m["files"]})
        rows = []
        for d in dirs:
            vals = {}
            for seg in (d.split("/") if d != "." else []):
                k, _, v = seg.partition("=")
                vals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
            rows.append((d, *[vals.get(c) for c in pb]))
        pdf = spark.createDataFrame(
            rows, ", ".join(["__dir string", *[f"{c} string" for c in pb]])
        )
        # evaluating with ONLY the partition columns in scope makes a
        # predicate on any other column an AnalysisException — the
        # loud-refusal we want, not a silent half-applied row filter
        allowed_dirs = {
            r[0] for r in pdf.filter(partition_where).collect()
        }
    by_dir: dict[str, list[str]] = defaultdict(list)
    for f in m["files"]:
        d = str(Path(f).parent)
        if allowed_dirs is not None and d not in allowed_dirs:
            continue
        by_dir[d].append(f)
    picked: list[str] = []
    plans: list[tuple[str, list[str], int]] = []  # (dir, files, n_out)
    for d, files in sorted(by_dir.items()):
        small = [f for f in files if file_rows[f] < target_rows]
        if len(small) < 2:
            continue  # nothing to pack here
        n_out = max(
            1, math.ceil(sum(file_rows[f] for f in small) / target_rows)
        )
        if n_out >= len(small):
            continue  # packing would not reduce the file count
        picked.extend(small)
        plans.append((d, small, n_out))
    if not plans:
        return {
            "files_before": len(m["files"]),
            "files_after": len(m["files"]),
            "files_rewritten": 0,
            "version": None,
        }
    txid = _uuid.uuid4().hex
    staged = live / f"_staged_{txid}"
    try:
        for d, files, n_out in plans:
            out_dir = staged if d == "." else staged / d
            # mergeSchema: a partition dir can legitimately hold pre-
            # and post-schema-evolution files; the packed file carries
            # the union with nulls — exactly what a declared-schema
            # read of those rows produces
            (
                spark.read.option("mergeSchema", "true")
                .parquet(*[str(live / f) for f in files])
                .coalesce(n_out)
                .write.mode("overwrite")
                .option("compression", compression)
                .parquet(str(out_dir))
            )
        staged_files = sorted(
            p.relative_to(staged)
            for p in staged.rglob("*.parquet")
            if p.is_file()
        )
        with publish_lock(live):
            current = read_manifest(path)
            if current is None or current["version"] != m["version"]:
                raise ConcurrentLakeModificationError(
                    f"table at {path} advanced past v{m['version']} while "
                    "this bin-pack was staging — re-plan against the "
                    "current snapshot"
                )
            new_files = _move_staged_in(live, staged, staged_files)
            picked_set = set(picked)
            keep = [f for f in m["files"] if f not in picked_set]
            snap = _commit_manifest(
                live,
                [*keep, *new_files],
                m["partition_by"] or None,
                current,
                txid,
            )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    # the packed inputs stay referenced by RETAINED history only;
    # vacuum_manifests reclaims them past the horizon like any rewrite
    return {
        "files_before": len(m["files"]),
        "files_after": len(snap["files"]),
        "files_rewritten": len(picked),
        "version": snap["version"],
    }


def compact_in_place(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    target_file_bytes: int = 128 << 20,
    compression: str = "snappy",
    schema: T.StructType | None = None,
    cluster_by: list | None = None,
) -> tuple[int, int]:
    """In-place small-file compaction, published atomically. The
    companion to :func:`compact_parquet` for tables that incremental
    writers (CDC merge batches, scd2 applies, expires) have fragmented
    and whose location is pinned by a catalog entry — readers keep the
    same path and, thanks to :func:`publish_overwrite`, never observe a
    half-compacted state. Returns (files_before, files_after).

    Reads via :func:`_reader` like every other lake rewrite path
    (round-7 ADVICE): on a schema-evolved table the new column exists
    only in touched partitions' files, so a bare inference read can
    take its schema from an OLD file and the atomic full rewrite would
    make the column loss permanent. Pass the catalog's declared
    ``schema`` to skip the footer scan entirely; without one the
    mergeSchema fallback still sees every column.

    ``cluster_by`` (columns or Column expressions, e.g. a Morton
    ``zorder_value``) turns compaction into OPTIMIZE-with-clustering:
    rows are range-partitioned and sorted on the cluster key(s), so
    each output file covers a NARROW value band and the manifest's
    per-file min/max (recorded at the commit this publish makes)
    become selective — the maintenance op that turns S24 file skipping
    from opportunistic to engineered. On a hive-partitioned table the
    range runs over (partition keys, cluster keys), so every partition
    directory's files split the cluster range instead of one fat file
    per partition. On a manifest table this is also the tombstone
    purge (the rewrite reads the masked table; coverage pruning clears
    the tombstones) and history keeps the pre-OPTIMIZE layout readable."""
    import math
    from pathlib import Path

    live = Path(path)
    m = read_manifest(path)
    if m is not None:
        # manifest table: only the CURRENT snapshot's files are being
        # compacted (history keeps its own files until vacuum)
        files = [live / f for f in m["files"]]
    else:
        files = [
            p
            for p in live.rglob("*.parquet")
            if p.is_file()
            and not any(
                part.startswith(("_staged_", "_trash_")) for part in p.parts
            )
        ]
    total = sum(p.stat().st_size for p in files)
    df = read_table(spark, path, schema)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if cluster_by:
        exprs = [F.col(c) if isinstance(c, str) else c for c in cluster_by]
        lead = [F.col(c) for c in (partition_by or [])]
        df = df.repartitionByRange(n_out, *lead, *exprs).sortWithinPartitions(
            *lead, *exprs
        )
    elif partition_by:
        df = df.repartition(*partition_by)
    else:
        df = df.repartition(n_out)
    publish_overwrite(
        spark,
        path,
        df,
        partition_by,
        compression=compression,
        expected_version=m["version"] if m is not None else None,
        # compaction reads the WHOLE table and rewrites it — declaring
        # that lets the manifest publish carry nothing, which is also
        # what migrates a partition-evolved table back to a single spec
        full_rewrite=m is not None,
    )
    m2 = read_manifest(path)
    if m2 is not None:
        n_after = len(m2["files"])
    else:
        n_after = sum(
            1
            for p in Path(path).rglob("*.parquet")
            if p.is_file()
            and not any(
                part.startswith(("_staged_", "_trash_")) for part in p.parts
            )
        )
    return len(files), n_after


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """S2-style lake write with optional hive partitioning.

    Partitioned layout is the 100 TB discipline the reference scaffolds
    but never uses (partition APIs in IAM, main.tf:177-178): downstream
    scans prune partitions before listing files.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
