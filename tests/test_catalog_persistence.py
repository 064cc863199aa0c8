"""Durable catalog round-trips (round-6 VERDICT #2).

The reference's catalog + policies are durable cloud state that survive
any client restart (Glue database/table main.tf:291-372; LF
tags/filters/grants main.tf:374-490). These tests pin the engine's
equivalent: a GovernedCatalog saved under <lake>/_catalog/ and reloaded
by a fresh "process" enforces identically — including fail-closed
pending evolved columns — and the audit log appends across reloads.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from tf_aws_lakeformation_governed_datalake_demo_spark import fixtures as fx
from tf_aws_lakeformation_governed_datalake_demo_spark.catalog import GovernedCatalog
from tf_aws_lakeformation_governed_datalake_demo_spark.governance import (
    SELECT,
    PermissionDeniedError,
)

Q = f"{fx.DATABASE}.{fx.TABLE}"


@pytest.fixture()
def durable_lake(spark, tmp_path):
    lake = str(tmp_path / "lake")
    cat = fx.bootstrap(spark, lake, durable=True)
    return lake, cat


def test_reload_preserves_fingerprint_and_enforcement(spark, durable_lake):
    lake, cat1 = durable_lake
    # evolve a column but do NOT approve it — the reloaded catalog must
    # keep it quarantined (fail-closed across restarts)
    cat1.evolve_table_schema(Q, [T.StructField("loyalty_tier", T.StringType())])
    cat1.save()

    cat2 = GovernedCatalog.load(spark, lake)
    assert cat2.governance_fingerprint() == cat1.governance_fingerprint()
    assert cat2.tables[Q].pending_columns == {"loyalty_tier"}

    # analyst via the reloaded catalog: APAC rows, 5-column allowlist,
    # and the pre-approval evolved column still invisible
    df = cat2.table(Q, "analyst")
    assert df.columns == list(fx.ANALYST_COLUMNS)
    regions = {r.sales_region for r in df.collect()}
    assert regions == {"APAC"}

    # implicit deny survives the reload too
    with pytest.raises(PermissionDeniedError):
        cat2.table(Q, "stranger")


def test_reload_preserves_tags_filters_views(spark, durable_lake):
    lake, cat1 = durable_lake
    cat2 = GovernedCatalog.load(spark, lake)
    assert set(cat2.tags) == {fx.PII_TAG}
    assert cat2.tags[fx.PII_TAG].values == tuple(fx.PII_VALUES)
    assert cat2.tables[Q].column_tags["ssn"] == {fx.PII_TAG: "sensitive"}
    assert set(cat2.filters) == {"analyst-apac-filter"}
    assert cat2.views[f"{fx.DATABASE}.{fx.VIEW}"].sql == fx.MASKED_VIEW_SQL
    # masked view through the reloaded catalog still masks
    row = (
        cat2.view(f"{fx.DATABASE}.{fx.VIEW}", "analyst")
        .orderBy("customer_id")
        .first()
    )
    assert row.customer_email.startswith("***@")
    assert set(row.ssn) <= {"*", "-"}


def test_bootstrap_is_load_or_create(spark, durable_lake):
    lake, cat1 = durable_lake
    # a grant issued after the first bootstrap...
    cat1.grant("auditor", SELECT, fx.DATABASE, fx.TABLE)
    cat1.save()
    # ...exists in the next process's bootstrap (load path, not reset)
    cat2 = fx.bootstrap(spark, lake, durable=True)
    assert cat2.grants_for("auditor", fx.DATABASE, fx.TABLE)
    assert cat2.governance_fingerprint() == cat1.governance_fingerprint()


def test_audit_appends_not_truncates(spark, durable_lake):
    lake, cat1 = durable_lake
    cat1.audit.record("p1", "q1", [Q], [], "ok")
    cat1.save()  # flushes the in-memory event to _catalog/audit.jsonl
    n1 = len(cat1.audit.events)

    cat2 = GovernedCatalog.load(spark, lake)
    assert len(cat2.audit.events) == n1  # history visible after reload
    cat2.audit.record("p2", "q2", [Q], [], "ok")

    lines = [
        json.loads(line)
        for line in (cat2.audit.path).read_text().splitlines()
        if line.strip()
    ]
    principals = [e["principal"] for e in lines]
    assert "p1" in principals and "p2" in principals
    assert len(lines) == n1 + 1  # appended, nothing truncated

    # a third process still sees everything
    cat3 = GovernedCatalog.load(spark, lake)
    assert len(cat3.audit.events) == n1 + 1


def test_save_is_atomic_no_partial_file(spark, durable_lake, tmp_path):
    lake, cat1 = durable_lake
    # the catalog file parses even immediately after save (temp+rename —
    # no window where a reader can observe a torn JSON)
    path = cat1.save()
    state = json.loads(open(path, encoding="utf-8").read())
    assert state["version"] == 1
    assert Q in state["tables"]
    # no stray temp files left behind
    import os

    leftovers = [f for f in os.listdir(os.path.dirname(path)) if f.endswith(".tmp")]
    assert leftovers == []


def test_load_reassigns_lake_root(spark, durable_lake, tmp_path):
    """A relocated lake enforces (and guards destructive drops) against
    its new location, not the path recorded at save time."""
    import shutil

    lake, _ = durable_lake
    moved = str(tmp_path / "moved_lake")
    shutil.copytree(lake, moved)
    cat = GovernedCatalog.load(spark, moved)
    assert cat.lake_root == moved


def test_concurrent_save_fails_closed(spark, durable_lake):
    """Two sessions load revision N and both mutate: the second save
    must fail with the reload-and-reapply instruction instead of
    silently discarding the first session's grant."""
    from tf_aws_lakeformation_governed_datalake_demo_spark.catalog import (
        ConcurrentCatalogModificationError,
    )

    lake, _ = durable_lake
    a = GovernedCatalog.load(spark, lake)
    b = GovernedCatalog.load(spark, lake)
    a.grant("alice", SELECT, fx.DATABASE, fx.TABLE)
    b.grant("bob", SELECT, fx.DATABASE, fx.TABLE)
    a.save()
    with pytest.raises(ConcurrentCatalogModificationError):
        b.save()
    # the losing session reloads, reapplies, and succeeds
    b2 = GovernedCatalog.load(spark, lake)
    assert b2.grants_for("alice", fx.DATABASE, fx.TABLE)  # winner preserved
    b2.grant("bob", SELECT, fx.DATABASE, fx.TABLE)
    b2.save()
    final = GovernedCatalog.load(spark, lake)
    assert final.grants_for("alice", fx.DATABASE, fx.TABLE)
    assert final.grants_for("bob", fx.DATABASE, fx.TABLE)


def test_same_session_resave_is_fine(spark, durable_lake):
    lake, cat = durable_lake
    r0 = cat.revision
    cat.grant("carol", SELECT, fx.DATABASE, fx.TABLE)
    cat.save()
    cat.grant("dave", SELECT, fx.DATABASE, fx.TABLE)
    cat.save()  # sequential saves from one session never conflict
    assert cat.revision == r0 + 2
    assert GovernedCatalog.load(spark, lake).revision == cat.revision
