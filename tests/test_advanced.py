"""Behavior tests for advanced operators whose driver check is rows-only."""

from __future__ import annotations

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY


def test_approx_aggregates_error_bounds(spark, sf_dir):
    rows = REGISTRY["approx_aggregates"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert rel_err < 0.05, f"HLL error {rel_err:.3f} for {r.o_orderstatus}"
        assert r.approx_median > 0


def test_asof_join_monotonic(spark, sf_dir):
    rows = REGISTRY["asof_join_events"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.last_click_ts is not None:
            assert r.last_click_ts <= r.purchase_ts
            assert r.lag_us >= 0


def test_tag_masked_view_autogen(spark, tmp_path_factory):
    from tf_aws_lakeformation_governed_datalake_demo_spark import Engine
    from tf_aws_lakeformation_governed_datalake_demo_spark import fixtures as fx

    lake = str(tmp_path_factory.mktemp("taglake"))
    cat = fx.bootstrap(spark, lake)
    sql = cat.create_tag_masked_view(
        "sales_db.sales", "sales_auto_masked", "pii", "sensitive"
    )
    assert "customer_email" in sql and "REGEXP_REPLACE" in sql
    eng = Engine(spark, cat)
    cat.grant("analyst", "SELECT", "sales_db", "sales_auto_masked")
    df = eng.sql(
        "SELECT * FROM sales_db.sales_auto_masked ORDER BY customer_id",
        principal="analyst",
    )
    rows = df.collect()
    # composes with row security (APAC only) and masks both tagged columns
    assert len(rows) == 8
    assert rows[0].customer_email == "***@example.com"
    assert rows[0].ssn == "***-**-****"
    assert rows[0].customer_name == "Alice Johnson"  # untagged passes through
