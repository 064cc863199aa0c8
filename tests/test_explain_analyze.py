"""EXPLAIN ANALYZE (round-15): the governed query EXECUTES and the
result rows are the finalized AQE plan's per-operator runtime metrics
— Trino/Athena's profiling verb. Covers: metrics populate (the df's
own plan executes — a sink write would profile fresh node instances),
the governance rewrite is visible in the numbers (the analyst's row
filter cuts rows between scan and aggregate), denied principals never
execute, and plain EXPLAIN still returns the no-execution plan text.
"""

from __future__ import annotations

import pytest

from tf_aws_lakeformation_governed_datalake_demo_spark import (
    Engine,
    fixtures as fx,
)
from tf_aws_lakeformation_governed_datalake_demo_spark.governance import (
    PermissionDeniedError,
)
from tf_aws_lakeformation_governed_datalake_demo_spark.statements import (
    ExplainStatement,
    parse_statement,
)


def test_parse_explain_analyze():
    s = parse_statement("EXPLAIN ANALYZE SELECT 1")
    assert isinstance(s, ExplainStatement) and s.analyze
    assert s.query_sql == "SELECT 1"
    s = parse_statement("EXPLAIN COST SELECT 1")
    assert not s.analyze and s.mode == "cost"


@pytest.fixture()
def eng(spark, tmp_path_factory):
    cat = fx.bootstrap(spark, str(tmp_path_factory.mktemp("ea")))
    return Engine(spark, cat)


def test_runtime_metrics_populate(eng):
    rows = eng.sql(
        "EXPLAIN ANALYZE SELECT sales_region, count(*) AS n "
        "FROM sales_db.sales GROUP BY sales_region",
        "dataadmin",
    ).collect()
    by_op = {}
    for r in rows:
        if r.metric == "numOutputRows":
            by_op.setdefault(r.operator, []).append(r.value)
    assert by_op.get("FileSourceScanExec") == [20]
    assert "HashAggregateExec" in by_op  # partial + final both present


def test_governed_rewrite_shows_in_the_numbers(eng):
    """The analyst's row filter (sales_region = 'APAC') executes: the
    scan emits all 20 rows of the single row group, and the filter
    stage cuts them to 8 before anything downstream — the runtime
    proof that governance reached the plan."""
    rows = eng.sql(
        "EXPLAIN ANALYZE SELECT count(*) AS n FROM sales_db.sales",
        "analyst",
    ).collect()
    outs = [
        r.value
        for r in rows
        if r.metric == "numOutputRows" and "Filter" in (r.operator or "")
    ]
    assert 8 in outs, rows


def test_denied_principal_never_executes(eng):
    with pytest.raises(PermissionDeniedError):
        eng.sql("EXPLAIN ANALYZE SELECT * FROM sales_db.sales", "nobody")


def test_plain_explain_still_textual_and_lazy(eng):
    rows = eng.sql(
        "EXPLAIN SELECT count(*) AS n FROM sales_db.sales", "dataadmin"
    ).collect()
    assert rows and rows[0].plan is not None
    assert all(len(r) == 1 for r in rows)
