"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in the engine's operator registry
(``tf_aws_lakeformation_governed_datalake_demo_spark.operators``); this
module just adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q3 shape
    (3-way join + aggregation + deterministic top-k)."""
    return REGISTRY["tpch_q3_topk"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query. Queries
    without an oracle (LSH/SimHash approximations, governance fixtures,
    streaming shapes) get the driver's rows-only check; their exactness
    is asserted in tests/."""
    return {
        name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle
    }
