"""Sources — schema-on-read loaders for the lake layout.

The reference's lake is "one directory per table of immutable Parquet
objects" (main.tf:317, locals.tf:12); the driver testdata follows the same
layout (`<sf_dir>/<table>.parquet`). Loaders return plain DataFrames so
Catalyst handles column pruning and predicate pushdown at the scan.
"""

from .lake import (
    TPCH_TABLES,
    load,
    load_all,
    merge_into,
    register_views,
    scd2_apply,
    scd2_as_of,
    write_partitioned,
)

__all__ = [
    "TPCH_TABLES",
    "load",
    "load_all",
    "merge_into",
    "register_views",
    "scd2_apply",
    "scd2_as_of",
    "write_partitioned",
]
