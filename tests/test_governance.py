"""Golden governance tests — the reference's 5 validation queries
(outputs.tf:57-97, validate.sh:201-235) plus the visibility matrix and
negative paths (FIXTURES.md §1).
"""

from __future__ import annotations

import pytest

from tf_aws_lakeformation_governed_datalake_demo_spark import (
    Engine,
    PermissionDeniedError,
)
from tf_aws_lakeformation_governed_datalake_demo_spark import fixtures as fx


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("goldlake"))
    cat = fx.bootstrap(spark, lake)
    return Engine(spark, cat)


ALL_COLS = [
    "customer_id", "customer_name", "customer_email", "ssn",
    "sales_region", "sales_amount", "sale_date",
]


def test_dataadmin_count_by_region(engine):
    # outputs.tf:67-73 — all 3 regions, APAC=8/EMEA=6/AMER=6 (generator truth).
    rows = engine.sql(
        "SELECT sales_region, COUNT(*) as count FROM sales_db.sales "
        "GROUP BY sales_region ORDER BY sales_region",
        principal="dataadmin",
    ).collect()
    assert [(r.sales_region, r["count"]) for r in rows] == [
        ("AMER", 6), ("APAC", 8), ("EMEA", 6),
    ]


def test_dataadmin_all_data(engine):
    # outputs.tf:60-65 — all rows, all columns incl. PII.
    df = engine.sql(
        "SELECT * FROM sales_db.sales ORDER BY sales_region, customer_id LIMIT 10",
        principal="dataadmin",
    )
    assert df.columns == ALL_COLS
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0].customer_id == "CUST0011"  # AMER sorts first
    assert rows[0].ssn == "111-22-3333"


def test_analyst_count_by_region(engine):
    # outputs.tf:89-95 — APAC only, count 8.
    rows = engine.sql(
        "SELECT sales_region, COUNT(*) as count FROM sales_db.sales "
        "GROUP BY sales_region ORDER BY sales_region",
        principal="analyst",
    ).collect()
    assert [(r.sales_region, r["count"]) for r in rows] == [("APAC", 8)]


def test_analyst_filtered_data(engine):
    # outputs.tf:75-80 — star expands to the 5-column allowlist, APAC rows.
    df = engine.sql(
        "SELECT * FROM sales_db.sales ORDER BY customer_id LIMIT 10",
        principal="analyst",
    )
    assert df.columns == list(fx.ANALYST_COLUMNS)
    rows = df.collect()
    assert len(rows) == 8
    assert all(r.sales_region == "APAC" for r in rows)


def test_analyst_pii_column_not_found(engine):
    # validate.sh:180-187 — selecting a denied column errors like Athena's
    # COLUMN_NOT_FOUND, because the governed relation simply lacks it.
    qid = engine.submit(
        "SELECT customer_email FROM sales_db.sales", principal="analyst"
    )
    assert engine.status(qid).value == "FAILED"
    assert "customer_email" in engine.state_change_reason(qid)


def test_analyst_masked_view(engine):
    # outputs.tf:82-87 — APAC rows, 7 cols, masked email/ssn (README.md:251).
    df = engine.sql(
        "SELECT * FROM sales_db.sales_masked ORDER BY customer_id LIMIT 10",
        principal="analyst",
    )
    assert df.columns == ALL_COLS
    rows = df.collect()
    assert len(rows) == 8
    assert all(r.sales_region == "APAC" for r in rows)
    assert rows[0].customer_email == "***@example.com"
    assert rows[0].ssn == "***-**-****"


def test_dataadmin_masked_view_all_regions(engine):
    df = engine.sql(
        "SELECT * FROM sales_db.sales_masked", principal="dataadmin"
    )
    assert df.count() == 20


def test_implicit_deny(engine):
    # main.tf:489-490 — no grant -> not authorized.
    with pytest.raises(PermissionDeniedError):
        engine.sql("SELECT * FROM sales_db.sales", principal="intern")
    with pytest.raises(PermissionDeniedError):
        engine.sql("SELECT * FROM sales_db.sales_masked", principal="intern")


def test_admin_bypass(engine):
    engine.catalog.set_admins(["lake_admin"])
    df = engine.sql("SELECT * FROM sales_db.sales", principal="lake_admin")
    assert df.count() == 20 and df.columns == ALL_COLS


def test_governance_disabled_flag(spark, tmp_path_factory):
    # variables.tf:10-14 — flag off => raw tables for everyone.
    lake = str(tmp_path_factory.mktemp("rawlake"))
    cat = fx.bootstrap(spark, lake, governance_enabled=False)
    eng = Engine(spark, cat)
    df = eng.sql("SELECT * FROM sales_db.sales", principal="intern")
    assert df.count() == 20 and df.columns == ALL_COLS


def test_audit_log(engine):
    before = len(engine.catalog.audit.events)
    engine.sql("SELECT COUNT(*) AS n FROM sales_db.sales", principal="dataadmin")
    events = engine.catalog.audit.events
    assert len(events) == before + 1
    ev = events[-1]
    assert ev["principal"] == "dataadmin"
    assert ev["status"] == "SUCCEEDED"
    assert "sales_db.sales" in ev["tables"]


def test_analyst_filter_recorded_in_audit(engine):
    engine.sql("SELECT COUNT(*) AS n FROM sales_db.sales", principal="analyst")
    ev = engine.catalog.audit.events[-1]
    assert ev["filters_applied"] == ["analyst-apac-filter"]


def test_results_csv_sink(spark, tmp_path_factory):
    # S5 — every query result persisted as headered CSV per query id.
    lake = str(tmp_path_factory.mktemp("csvlake"))
    results = tmp_path_factory.mktemp("results")
    cat = fx.bootstrap(spark, lake)
    eng = Engine(spark, cat, results_dir=results)
    qid = eng.submit(
        "SELECT sales_region, COUNT(*) AS count FROM sales_db.sales "
        "GROUP BY sales_region",
        principal="dataadmin",
    )
    assert eng.status(qid).value == "SUCCEEDED"
    back = spark.read.option("header", "true").csv(str(results / qid))
    assert back.count() == 3


def test_results_row_cap(engine):
    qid = engine.submit("SELECT * FROM sales_db.sales", principal="dataadmin")
    assert len(engine.results(qid, max_rows=5)) == 5


def test_predicate_pushdown_into_scan(engine):
    # SURVEY.md §4.1 — the injected governance filter must reach the
    # parquet reader: PushedFilters contains the region equality.
    df = engine.catalog.table("sales_db.sales", "analyst")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "sales_region" in plan


def test_drop_view(spark, tmp_path_factory):
    lake = str(tmp_path_factory.mktemp("droplake"))
    cat = fx.bootstrap(spark, lake)
    cat.drop_view("sales_db", "sales_masked")
    eng = Engine(spark, cat)
    qid = eng.submit("SELECT * FROM sales_db.sales_masked", principal="analyst")
    assert eng.status(qid).value == "FAILED"


def test_multi_table_governed_join(spark, sf_dir):
    # governance composes per-table in one SQL statement: a row-filtered
    # nation joined to an openly-granted region
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        DataCellsFilter,
        GovernedCatalog,
        TableDef,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.engine import Engine as Eng

    cat = GovernedCatalog(spark)
    cat.create_database("tpch")
    cat.register_table(TableDef("tpch", "nation", f"{sf_dir}/nation.parquet"))
    cat.register_table(TableDef("tpch", "region", f"{sf_dir}/region.parquet"))
    cat.create_data_cells_filter(
        DataCellsFilter(
            name="asia-only",
            database="tpch",
            table="nation",
            columns=("n_nationkey", "n_name", "n_regionkey"),
            row_filter="n_regionkey = 2",
        )
    )
    cat.grant("regional_analyst", "SELECT", "tpch", "nation", via_filter="asia-only")
    cat.grant("regional_analyst", "SELECT", "tpch", "region")
    eng = Eng(spark, cat)
    rows = eng.sql(
        "SELECT r.r_name, n.n_name FROM tpch.nation n "
        "JOIN tpch.region r ON n.n_regionkey = r.r_regionkey ORDER BY n.n_name",
        principal="regional_analyst",
    ).collect()
    assert rows and all(r.r_name == rows[0].r_name for r in rows)  # single region
    # the same join as an ungoverned admin sees all 25 nations
    cat.set_admins(["root"])
    all_rows = eng.sql(
        "SELECT count(*) AS n FROM tpch.nation n "
        "JOIN tpch.region r ON n.n_regionkey = r.r_regionkey",
        principal="root",
    ).first()
    assert all_rows.n == 25


def test_no_gov_temp_view_survives_query(engine):
    # Round-1 leak regression: after ANY principal's query, no __gov_*
    # temp view may remain in the session catalog.
    engine.sql(
        "SELECT ssn FROM sales_db.sales LIMIT 1", principal="dataadmin"
    ).collect()
    leftovers = [
        t.name
        for t in engine.spark.catalog.listTables()
        if t.name.startswith("__gov_")
    ]
    assert leftovers == []


def test_cross_principal_gov_alias_rejected(engine):
    # Round-1 leak regression: even if an alias name were known/guessable,
    # submitting SQL that references the reserved __gov_ prefix is denied
    # before execution — and audited as a failed query.
    engine.sql("SELECT ssn FROM sales_db.sales LIMIT 1", principal="dataadmin")
    with pytest.raises(PermissionDeniedError):
        engine.sql(
            "SELECT ssn FROM __gov_dataadmin_sales_db_sales", principal="analyst"
        )
    qid = engine.submit(
        "SELECT * FROM __GOV_anything", principal="analyst"
    )
    assert engine.status(qid).value == "FAILED"
    assert "reserved" in engine.state_change_reason(qid)


def test_rewrite_skips_string_literals_and_comments(engine):
    # ADVICE round 1 (low): table names inside string literals / comments
    # must not be rewritten to governed aliases.
    row = engine.sql(
        "SELECT 'sales_db.sales' AS src, COUNT(*) AS n "
        "FROM sales_db.sales -- trailing note about sales_db.sales\n",
        principal="analyst",
    ).first()
    assert row.src == "sales_db.sales"
    assert row.n == 8  # analyst still row-filtered to APAC


def test_governed_result_usable_after_view_drop(engine):
    # The governed DataFrame must stay collectable after its backing temp
    # views are dropped (spark.sql analyzes eagerly).
    df = engine.sql(
        "SELECT sales_region, COUNT(*) AS n FROM sales_db.sales GROUP BY sales_region",
        principal="analyst",
    )
    assert [t.name for t in engine.spark.catalog.listTables() if t.name.startswith("__gov_")] == []
    assert df.count() == 1


def test_multiple_data_cells_filters_union(spark, tmp_path_factory):
    # LF semantics: several cell filters on one (principal, table) are
    # ADDITIVE at CELL granularity — a (row, column) is visible iff some
    # single filter grants both; cells outside every filter's rectangle
    # are NULL-masked (round-3 ADVICE: the old enclosing-rectangle union
    # leaked filter-A-only columns on filter-B-only rows).
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        DataCellsFilter, Engine,
    )

    lake = str(tmp_path_factory.mktemp("unionlake"))
    cat = fx.bootstrap(spark, lake)
    cat.create_data_cells_filter(
        DataCellsFilter(
            name="analyst-emea-filter",
            database="sales_db",
            table="sales",
            columns=("customer_id", "sales_region", "sale_date"),
            row_filter="sales_region = 'EMEA'",
        )
    )
    cat.grant("analyst", "SELECT", "sales_db", "sales",
              via_filter="analyst-emea-filter")
    eng = Engine(spark, cat)
    df = eng.sql(
        "SELECT * FROM sales_db.sales ORDER BY customer_id",
        principal="analyst",
    )
    rows = df.collect()
    # rows: union of APAC (8) and EMEA (6)
    assert sorted({r.sales_region for r in rows}) == ["APAC", "EMEA"]
    assert len(rows) == 14
    # columns: union of the two allowlists, in declared schema order;
    # PII columns remain invisible (in neither allowlist)
    assert df.columns == [
        "customer_id", "customer_name", "sales_region",
        "sales_amount", "sale_date",
    ]
    # per-cell enforcement: customer_name/sales_amount are granted only by
    # the APAC filter, so they are NULL on EMEA-only rows and real on APAC
    # rows; columns in both allowlists are real everywhere
    for r in rows:
        if r.sales_region == "EMEA":
            assert r.customer_name is None and r.sales_amount is None
        else:
            assert r.customer_name is not None and r.sales_amount is not None
        assert r.customer_id is not None and r.sale_date is not None
    # audit records BOTH filter names
    qid = eng.submit("SELECT count(*) AS n FROM sales_db.sales",
                     principal="analyst")
    assert eng.executions[qid].filters_applied == [
        "analyst-apac-filter", "analyst-emea-filter",
    ]
    # single-filter behavior unchanged for other principals
    assert eng.sql("SELECT count(*) AS n FROM sales_db.sales",
                   principal="dataadmin").first().n == 20


def test_filter_union_row_unrestricted_wins(spark, tmp_path_factory):
    # A second filter with NO row predicate unions to all rows, but only
    # for ITS columns: the APAC filter's columns stay NULL outside APAC.
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        DataCellsFilter, Engine,
    )

    lake = str(tmp_path_factory.mktemp("unionlake2"))
    cat = fx.bootstrap(spark, lake)
    cat.create_data_cells_filter(
        DataCellsFilter(
            name="all-rows-ids-only",
            database="sales_db",
            table="sales",
            columns=("customer_id",),
            row_filter=None,
        )
    )
    cat.grant("analyst", "SELECT", "sales_db", "sales",
              via_filter="all-rows-ids-only")
    eng = Engine(spark, cat)
    df = eng.sql("SELECT * FROM sales_db.sales", principal="analyst")
    rows = df.collect()
    assert len(rows) == 20  # no row restriction remains
    assert "ssn" not in df.columns and "customer_email" not in df.columns
    # customer_id comes from the unrestricted filter: real on every row;
    # the other columns are granted only by the APAC filter
    assert all(r.customer_id is not None for r in rows)
    non_apac = [r for r in rows if r.sales_region != "APAC"]
    # sales_region itself is APAC-only granted -> NULL outside APAC, so
    # non-APAC rows show as NULL region with NULL name/amount/date
    masked = [r for r in rows if r.sales_region is None]
    assert len(masked) == 12 and len(non_apac) == 12
    for r in masked:
        assert r.customer_name is None and r.sales_amount is None
        assert r.sale_date is None


def test_filter_union_mixed_case_not_full_table(spark, tmp_path_factory):
    # The round-3 ADVICE fail-open scenario: one all-rows column-restricted
    # filter + one row-restricted all-columns filter must NOT yield full
    # table access — each filter's cells only.
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        DataCellsFilter, Engine,
    )

    lake = str(tmp_path_factory.mktemp("unionlake3"))
    cat = fx.bootstrap(spark, lake)
    cat.create_data_cells_filter(
        DataCellsFilter(
            name="ids-everywhere",
            database="sales_db",
            table="sales",
            columns=("customer_id",),
            row_filter=None,
        )
    )
    cat.create_data_cells_filter(
        DataCellsFilter(
            name="apac-all-columns",
            database="sales_db",
            table="sales",
            columns=(),  # empty = all columns
            row_filter="sales_region = 'APAC'",
        )
    )
    cat.grant("contractor", "SELECT", "sales_db", "sales", via_filter="ids-everywhere")
    cat.grant("contractor", "SELECT", "sales_db", "sales", via_filter="apac-all-columns")
    eng = Engine(spark, cat)
    df = eng.sql("SELECT * FROM sales_db.sales", principal="contractor")
    rows = df.collect()
    assert len(rows) == 20  # ids-everywhere exposes every row's id
    # all-columns filter widens the projection to the full schema
    assert "ssn" in df.columns and "customer_email" in df.columns
    # but PII (and everything else beyond customer_id) is real ONLY on
    # APAC rows — the old rectangle hull exposed all 20 rows in full
    apac = [r for r in rows if r.sales_region == "APAC"]
    hidden = [r for r in rows if r.sales_region is None]
    assert len(apac) == 8 and len(hidden) == 12
    assert all(r.ssn is not None for r in apac)
    assert all(
        r.ssn is None and r.customer_email is None and r.sales_amount is None
        for r in hidden
    )
    assert all(r.customer_id is not None for r in rows)


def test_catalog_introspection_glue_shape(spark, tmp_path_factory):
    # list/describe APIs expose governance metadata like `aws glue
    # get-table` (round-2 VERDICT missing #3).
    lake = str(tmp_path_factory.mktemp("introlake"))
    cat = fx.bootstrap(spark, lake)
    assert [d["Name"] for d in cat.list_databases()] == ["sales_db"]
    assert cat.list_tables("sales_db") == ["sales"]
    assert cat.list_views("sales_db") == ["sales_masked"]
    t = cat.describe_table("sales_db.sales")
    assert t["DatabaseName"] == "sales_db" and t["TableType"] == "EXTERNAL_TABLE"
    assert t["StorageDescriptor"]["Location"].endswith("/sales")
    cols = {c["Name"]: c for c in t["StorageDescriptor"]["Columns"]}
    # column comments round-trip (main.tf declares them)
    assert cols["customer_email"]["Comment"]
    # LF column tags round-trip
    assert cols["ssn"]["Parameters"] == {"pii": "sensitive"}
    assert "Parameters" not in cols["sales_region"]


def test_drop_table_fails_closed(spark, tmp_path_factory):
    import pathlib

    from tf_aws_lakeformation_governed_datalake_demo_spark import Engine

    lake = str(tmp_path_factory.mktemp("droplake"))
    cat = fx.bootstrap(spark, lake)
    eng = Engine(spark, cat)
    assert eng.sql("SELECT count(*) AS n FROM sales_db.sales",
                   principal="dataadmin").first().n == 20
    cat.drop_table("sales_db.sales", delete_data=True)
    assert not pathlib.Path(lake, "sales").exists()
    # later access fails closed — for admins too (table is gone)
    qid = eng.submit("SELECT * FROM sales_db.sales", principal="dataadmin")
    assert eng.status(qid).value == "FAILED"
    with pytest.raises(KeyError):
        cat.table("sales_db.sales", "dataadmin")
    # database no longer droppable without cascade (masked view remains)
    with pytest.raises(ValueError):
        cat.drop_database("sales_db")
    cat.drop_database("sales_db", cascade=True)
    assert cat.list_databases() == []


def test_drop_table_delete_data_guarded(spark, tmp_path_factory):
    # round-3 ADVICE: delete_data must not rmtree outside the lake root.
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        GovernedCatalog, TableDef,
    )

    lake = tmp_path_factory.mktemp("guardlake")
    outside = tmp_path_factory.mktemp("outside")
    (outside / "keep.txt").write_text("precious")
    cat = GovernedCatalog(spark, lake_root=str(lake))
    cat.create_database("db")
    cat.register_table(TableDef("db", "bad", str(outside)))
    with pytest.raises(ValueError, match="outside lake root"):
        cat.drop_table("db.bad", delete_data=True)
    # refused delete leaves both data and registration intact
    assert (outside / "keep.txt").exists()
    assert cat.list_tables("db") == ["bad"]
    # in-root tables delete fine
    (lake / "good").mkdir()
    cat.register_table(TableDef("db", "good", str(lake / "good")))
    cat.drop_table("db.good", delete_data=True)
    assert not (lake / "good").exists()
    # without a lake_root, near-root paths are refused
    cat2 = GovernedCatalog(spark)
    cat2.create_database("db")
    cat2.register_table(TableDef("db", "root", "/tmp"))
    with pytest.raises(ValueError, match="lake_root"):
        cat2.drop_table("db.root", delete_data=True)


def test_governed_sql_guard_on_raw_spark_sql(spark, tmp_path_factory):
    # SURVEY §4.2 option-2 fallback (jar-free): code calling the
    # session's raw spark.sql() gets grant checks + rewrites + audit
    # while the guard is active, and the session is restored after.
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        Engine,
        governed_sql_guard,
    )

    lake = str(tmp_path_factory.mktemp("guardsql"))
    eng = Engine(spark, fx.bootstrap(spark, lake))

    with governed_sql_guard(eng, "analyst"):
        df = spark.sql("SELECT * FROM sales_db.sales")
        assert df.count() == 8  # row security applied
        assert len(df.columns) == 5  # column allowlist applied
        # view-through-security composes identically
        masked = spark.sql(
            "SELECT customer_email FROM sales_db.sales_masked LIMIT 1"
        ).first()
        assert masked.customer_email.startswith("***@")
        with pytest.raises(ValueError, match="parameterized"):
            spark.sql("SELECT 1", args={"x": 1})

    with governed_sql_guard(eng, "intern"):
        with pytest.raises(PermissionDeniedError):
            spark.sql("SELECT 1 FROM sales_db.sales")

    # guard released: raw sql is ungoverned again (catalog-independent)
    assert spark.sql("SELECT 41 + 1 AS v").first().v == 42
    # denied access under the guard was audited
    assert any(
        e["principal"] == "intern" and e["status"] == "FAILED"
        for e in eng.catalog.audit.events
    )


def test_schema_evolution_fail_closed_for_allowlist(spark, tmp_path_factory):
    # Round-5 VERDICT #3: a column added after the grants were written is
    # invisible to the allowlist-filtered analyst until BOTH explicit
    # decisions land (approval + an allowlist naming it). The dataadmin's
    # unconditioned ALL grant sees it immediately.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tf_aws_lakeformation_governed_datalake_demo_spark.governance import (
        DataCellsFilter,
    )
    from tf_aws_lakeformation_governed_datalake_demo_spark.sources.lake import (
        merge_into,
    )

    lake = str(tmp_path_factory.mktemp("evolake"))
    cat = fx.bootstrap(spark, lake)
    eng = Engine(spark, cat)
    q = f"{fx.DATABASE}.{fx.TABLE}"
    cat.evolve_table_schema(q, [T.StructField("loyalty_tier", T.StringType())])
    path = cat.tables[q].location
    upd = (
        spark.read.parquet(path)
        .filter(F.col("customer_id") <= "CUST0005")
        .withColumn("loyalty_tier", F.lit("gold"))
    )
    merge_into(spark, path, upd, ["customer_id"], evolve_schema=True)

    # unconditioned grant: visible immediately (whole-table grant)
    df = eng.sql("SELECT * FROM sales_db.sales", principal="dataadmin")
    assert "loyalty_tier" in df.columns

    # allowlist-filtered analyst: invisible pre-approval...
    df = eng.sql("SELECT * FROM sales_db.sales", principal="analyst")
    assert "loyalty_tier" not in df.columns
    qid = eng.submit("SELECT loyalty_tier FROM sales_db.sales", principal="analyst")
    assert eng.status(qid).value == "FAILED"  # COLUMN_NOT_FOUND analog

    # ...and STILL invisible after approval alone (approval != grant)
    cat.approve_evolved_columns(q, ["loyalty_tier"])
    df = eng.sql("SELECT * FROM sales_db.sales", principal="analyst")
    assert "loyalty_tier" not in df.columns

    # the allowlist naming it is the grant
    cat.create_data_cells_filter(
        DataCellsFilter(
            name="analyst-apac-filter",
            database=fx.DATABASE,
            table=fx.TABLE,
            columns=fx.ANALYST_COLUMNS + ("loyalty_tier",),
            row_filter="sales_region = 'APAC'",
        )
    )
    rows = eng.sql(
        "SELECT * FROM sales_db.sales ORDER BY customer_id", principal="analyst"
    ).collect()
    tiers = {r.customer_id: r.loyalty_tier for r in rows}
    assert len(rows) == 8 and tiers["CUST0001"] == "gold"
    assert tiers["CUST0016"] is None  # APAC row outside the merge batch
    # audit carries both governance decisions
    queries = [e["query"] for e in cat.audit.events]
    assert any(q_.startswith("ALTER TABLE sales_db.sales ADD") for q_ in queries)
    assert any(q_.startswith("APPROVE EVOLVED COLUMNS") for q_ in queries)


def test_schema_evolution_fail_closed_for_tag_grants(spark, tmp_path_factory):
    # The untagged-complement (tag-exclude) path is the dangerous one: a
    # brand-new column is untagged, so without the quarantine it would
    # leak the moment it lands. Pre-approval invisible; post-approval it
    # joins the complement; a column evolved WITH a pii tag stays
    # excluded by the tag path even after approval.
    from pyspark.sql import types as T

    from tf_aws_lakeformation_governed_datalake_demo_spark.governance import SELECT

    lake = str(tmp_path_factory.mktemp("evolake_tag"))
    cat = fx.bootstrap(spark, lake)
    q = f"{fx.DATABASE}.{fx.TABLE}"
    cat.grant(
        "tagger", SELECT, fx.DATABASE, fx.TABLE,
        via_tag_exclude=(fx.PII_TAG, "sensitive"),
    )
    base = cat.table(q, "tagger").columns
    assert "customer_email" not in base and "ssn" not in base

    cat.evolve_table_schema(q, [T.StructField("risk_score", T.DoubleType())])
    assert "risk_score" not in cat.table(q, "tagger").columns  # fail closed
    cat.approve_evolved_columns(q, ["risk_score"])
    assert "risk_score" in cat.table(q, "tagger").columns  # untagged complement

    cat.evolve_table_schema(
        q,
        [T.StructField("passport", T.StringType())],
        tags={"passport": {fx.PII_TAG: "sensitive"}},
    )
    cat.approve_evolved_columns(q, ["passport"])
    assert "passport" not in cat.table(q, "tagger").columns  # tagged out


def test_evolve_table_schema_validation(spark, tmp_path_factory):
    from pyspark.sql import types as T

    lake = str(tmp_path_factory.mktemp("evolake_val"))
    cat = fx.bootstrap(spark, lake)
    q = f"{fx.DATABASE}.{fx.TABLE}"
    with pytest.raises(ValueError, match="already exist"):
        cat.evolve_table_schema(q, [T.StructField("ssn", T.StringType())])
    with pytest.raises(ValueError, match="no columns"):
        cat.evolve_table_schema(q, [])
    with pytest.raises(ValueError, match="no such columns"):
        cat.approve_evolved_columns(q, ["nope"])

    # typo'd tags/comments key must fail BEFORE any state mutates —
    # otherwise the real evolved column lands unclassified (fail-open)
    # and a later approval releases it into the untagged complement
    before = [f.name for f in cat.tables[q].schema.fields]
    with pytest.raises(ValueError, match="non-evolved columns"):
        cat.evolve_table_schema(
            q,
            [T.StructField("passport", T.StringType())],
            tags={"passprot": {fx.PII_TAG: "sensitive"}},
        )
    assert [f.name for f in cat.tables[q].schema.fields] == before
    assert "passport" not in cat.tables[q].pending_columns
    with pytest.raises(ValueError, match="unknown LF-tag"):
        cat.evolve_table_schema(
            q,
            [T.StructField("passport", T.StringType())],
            tags={"passport": {"no-such-tag": "x"}},
        )
    assert [f.name for f in cat.tables[q].schema.fields] == before
    with pytest.raises(ValueError, match="non-evolved columns"):
        cat.evolve_table_schema(
            q,
            [T.StructField("passport", T.StringType())],
            comments={"passprot": "travel document"},
        )
    assert [f.name for f in cat.tables[q].schema.fields] == before


PII_COLS = {"customer_email", "ssn"}


def test_pii_unreachable_via_every_engine_surface(spark, tmp_path_factory):
    # Round-5 VERDICT #4a: the analyst's grants must hold on EVERY
    # engine.* surface, not just engine.sql — CTAS and UNLOAD execute AS
    # the principal (materializing only governed cells), prepared
    # statements run governed, EXPLAIN shows the governed plan, and the
    # sql guard routes raw spark.sql through the same path.
    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        governed_sql_guard,
    )

    base = tmp_path_factory.mktemp("surface")
    eng = Engine(
        spark, fx.bootstrap(spark, str(base / "lake")),
        results_dir=str(base / "results"),
    )

    # sql / submit
    assert not PII_COLS & set(
        eng.sql("SELECT * FROM sales_db.sales", principal="analyst").columns
    )
    qid = eng.submit("SELECT ssn FROM sales_db.sales", principal="analyst")
    assert eng.status(qid).value == "FAILED"

    # EXPLAIN: the governed plan's ReadSchema carries no PII column, and
    # explaining a PII select fails to analyze
    plan = eng.explain("SELECT * FROM sales_db.sales", principal="analyst")
    assert "customer_email" not in plan and "ssn" not in plan
    with pytest.raises(Exception, match="ssn"):
        eng.explain("SELECT ssn FROM sales_db.sales", principal="analyst")

    # CTAS: the materialized table contains ONLY governed cells
    ctas_loc = str(base / "ctas_out")
    eng.ctas(
        "SELECT * FROM sales_db.sales", "sales_db", "analyst_copy",
        ctas_loc, principal="analyst",
    )
    copied = spark.read.parquet(ctas_loc)
    assert not PII_COLS & set(copied.columns)
    rows = copied.collect()
    assert len(rows) == 8 and all(r.sales_region == "APAC" for r in rows)

    # UNLOAD: ditto for the file export
    unload_loc = str(base / "unload_out")
    eng.unload(
        "SELECT * FROM sales_db.sales", unload_loc, principal="analyst"
    )
    assert not PII_COLS & set(spark.read.parquet(unload_loc).columns)

    # prepared statements: parameters cannot widen access
    eng.prepare("by_region", "SELECT * FROM sales_db.sales WHERE sales_region = ?")
    got = eng.execute_prepared("by_region", ["APAC"], principal="analyst")
    assert not PII_COLS & set(got.columns)
    eng.prepare("steal", "SELECT ssn FROM sales_db.sales WHERE sales_region = ?")
    with pytest.raises(Exception, match="ssn"):
        eng.execute_prepared("steal", ["APAC"], principal="analyst")

    # per-principal session handle
    sess = eng.session("analyst")
    assert not PII_COLS & set(sess.table("sales_db.sales").columns)

    # the sql guard routes raw spark.sql through the same checks
    with governed_sql_guard(eng, "analyst"):
        assert not PII_COLS & set(
            spark.sql("SELECT * FROM sales_db.sales").columns
        )
        with pytest.raises(Exception, match="ssn"):
            spark.sql("SELECT ssn FROM sales_db.sales")

    # an ungranted principal is denied on every surface
    for attempt in (
        lambda: eng.sql("SELECT 1 FROM sales_db.sales", principal="intern"),
        lambda: eng.explain("SELECT 1 FROM sales_db.sales", principal="intern"),
        lambda: eng.ctas(
            "SELECT 1 FROM sales_db.sales", "sales_db", "t2",
            str(base / "deny_ctas"), principal="intern",
        ),
        lambda: eng.unload(
            "SELECT 1 FROM sales_db.sales", str(base / "deny_unload"),
            principal="intern",
        ),
        lambda: eng.session("intern").table("sales_db.sales"),
    ):
        with pytest.raises(PermissionDeniedError):
            attempt()


def test_trust_boundary_spark_read_is_outside(spark, tmp_path_factory):
    # Round-5 VERDICT #4b: the DOCUMENTED boundary. A caller holding the
    # raw SparkSession bypasses governance with spark.read — the analog
    # of raw S3 credentials bypassing Athena, which the reference closes
    # with storage-level credential vending (main.tf:432-490) and a
    # single-JVM library cannot. This test PINS that documented boundary
    # (so a future change that silently widens or narrows it fails) and
    # the presence of the documentation itself.
    import pathlib

    from tf_aws_lakeformation_governed_datalake_demo_spark import (
        engine as engine_mod,
        governed_sql_guard,
    )

    lake = str(tmp_path_factory.mktemp("boundary"))
    eng = Engine(spark, fx.bootstrap(spark, lake))
    loc = eng.catalog.tables["sales_db.sales"].location

    # even while the guard is active, spark.read is raw: full PII
    with governed_sql_guard(eng, "analyst"):
        raw = spark.read.parquet(loc)
        assert PII_COLS <= set(raw.columns)
        assert raw.count() == 20  # all regions, no row filter

    # the boundary is stated where users will see it
    assert "NOT AN ENFORCEMENT BOUNDARY" in governed_sql_guard.__doc__
    readme = (
        pathlib.Path(engine_mod.__file__).resolve().parents[1] / "README.md"
    ).read_text()
    assert "Trust boundary" in readme and "spark.read" in readme
