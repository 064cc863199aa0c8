"""Governance operators exposed as driver queries (SURVEY.md §2.10).

These reproduce the reference's five validation query shapes
(outputs.tf:57-97) against the regenerated 20-row sales fixture. The
fixture tables are not in the driver's DuckDB view set, so these entries
carry no oracle — the driver records the weaker rows-only check; exact
golden-value assertions live in tests/test_governance.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from .. import fixtures as fx
from ..engine import Engine
from .registry import query

_ENGINES: dict[int, Engine] = {}


def _engine(spark: SparkSession) -> Engine:
    """One bootstrapped sales lake per SparkSession (cached)."""
    key = id(spark)
    if key not in _ENGINES:
        lake = tempfile.mkdtemp(prefix="sales_lake_")
        _ENGINES[key] = Engine(spark, fx.bootstrap(spark, lake))
    return _ENGINES[key]


@query(
    "governance_admin_count_by_region",
    None,
    "G4 — DataAdmin sees all 3 regions (outputs.tf:67-73): AMER=6, APAC=8, EMEA=6.",
)
def governance_admin_count_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark).sql(
        "SELECT sales_region, COUNT(*) as count FROM sales_db.sales "
        "GROUP BY sales_region ORDER BY sales_region",
        principal="dataadmin",
    )


@query(
    "governance_analyst_row_column_security",
    None,
    "G3/G5 — Analyst star-expands to the 5-col allowlist, APAC rows only "
    "(outputs.tf:75-80).",
)
def governance_analyst_row_column_security(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark).sql(
        "SELECT * FROM sales_db.sales ORDER BY customer_id LIMIT 10",
        principal="analyst",
    )


@query(
    "governance_masked_view",
    None,
    "V3/F1/F2 — Analyst on sales_masked: APAC rows, ***@ emails, "
    "***-**-**** SSNs (outputs.tf:82-87).",
)
def governance_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark).sql(
        "SELECT * FROM sales_db.sales_masked ORDER BY customer_id LIMIT 10",
        principal="analyst",
    )
