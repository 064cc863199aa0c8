"""Sources — schema-on-read loaders for the lake layout.

The reference's lake is "one directory per table of immutable Parquet
objects" (main.tf:317, locals.tf:12); the driver testdata follows the same
layout (`<sf_dir>/<table>.parquet`). Loaders return plain DataFrames so
Catalyst handles column pruning and predicate pushdown at the scan.
"""

from .manifest_stream import (
    LakeManifestDataSource,
    register_lake_manifest_source,
)
from .lake import (
    TPCH_TABLES,
    abort_publish,
    begin_publish,
    commit_publish,
    ConcurrentLakeModificationError,
    ConstraintViolationError,
    add_constraint,
    append_rows,
    compact_in_place,
    consume_table_changes,
    delete_rows,
    delete_rows_mor,
    drop_constraint,
    expire_scd2_versions,
    load,
    load_all,
    merge_into,
    publish_overwrite,
    purge_deleted_rows,
    read_candidate,
    read_manifest,
    read_table,
    register_views,
    rollback_table,
    scd2_apply,
    scd2_as_of,
    table_changes,
    vacuum_manifests,
    vacuum_publish_artifacts,
    write_partitioned,
)

__all__ = [
    "LakeManifestDataSource",
    "TPCH_TABLES",
    "abort_publish",
    "begin_publish",
    "commit_publish",
    "ConcurrentLakeModificationError",
    "ConstraintViolationError",
    "add_constraint",
    "append_rows",
    "compact_in_place",
    "consume_table_changes",
    "delete_rows",
    "delete_rows_mor",
    "drop_constraint",
    "expire_scd2_versions",
    "load",
    "load_all",
    "merge_into",
    "publish_overwrite",
    "purge_deleted_rows",
    "read_candidate",
    "read_manifest",
    "register_lake_manifest_source",
    "read_table",
    "register_views",
    "rollback_table",
    "scd2_apply",
    "scd2_as_of",
    "table_changes",
    "vacuum_manifests",
    "vacuum_publish_artifacts",
    "write_partitioned",
]
