"""Differential test: every registered query with an oracle must match
DuckDB on the same parquet (SURVEY.md §5.2 item 4) — mirrors the driver's
row-count + column-name + order-insensitive value comparison.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
from tf_aws_lakeformation_governed_datalake_demo_spark.sources import TPCH_TABLES


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and fp noise beyond round()'d scale
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _rows_multiset(rows, colnames):
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb(spark, sf_dir, ddb, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = sdf.collect()

    rel = ddb.sql(spec.oracle)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    s_set = _rows_multiset([tuple(r) for r in s_rows], s_cols)
    d_set = _rows_multiset(d_rows, d_cols)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
    assert s_set == d_set, f"{name}: value mismatch, first diffs: {mism}"


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            df = spec.builder(spark, sf_dir)
            assert df.count() >= 0, name


def test_registry_builder_hygiene():
    """Every registry entry's builder IS the function named by the key
    and is callable as (spark, sf_dir) — pins against the decorator-
    misattachment class of bug (round-12: a helper def inserted
    between @query and its function silently registered the helper,
    passing every direct-call test while breaking the registry path)."""
    import inspect

    from tf_aws_lakeformation_governed_datalake_demo_spark.operators import (
        REGISTRY,
    )

    for name, spec in REGISTRY.items():
        assert spec.builder.__name__ == name, (name, spec.builder.__name__)
        params = list(inspect.signature(spec.builder).parameters.values())
        assert len(params) >= 2, name
        for extra in params[2:]:
            assert extra.default is not inspect.Parameter.empty, name
