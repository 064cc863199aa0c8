"""Registry invariants.

Round-15 finding: last-wins registration silently shadowed a
refactored ``dedup_phash_index_probe`` with a stale inline copy.
The decorator now raises on duplicate names (``replace=True`` is the
explicit escape), making that failure class extinct.
"""

import pytest

from tf_aws_lakeformation_governed_datalake_demo_spark.operators import REGISTRY
from tf_aws_lakeformation_governed_datalake_demo_spark.operators.registry import query


def test_duplicate_registration_raises():
    name = "__test_dup_query__"
    assert name not in REGISTRY

    @query(name, None, "first")
    def first(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError

    try:
        with pytest.raises(ValueError, match="duplicate query registration"):

            @query(name, None, "second")
            def second(spark, sf_dir):  # pragma: no cover
                raise AssertionError

        assert REGISTRY[name].description == "first"

        @query(name, None, "third", replace=True)
        def third(spark, sf_dir):  # pragma: no cover
            raise AssertionError

        assert REGISTRY[name].description == "third"
    finally:
        REGISTRY.pop(name, None)


def test_registry_has_no_shadowed_names():
    """The full package imports with the duplicate guard active, so
    every registered name has exactly one live definition."""
    assert len(REGISTRY) >= 281
    # builder callables must be unique objects — a shared function
    # registered under two names is fine, but the same NAME cannot
    # map to two defs (the guard enforces this at import time; this
    # assert documents the invariant for readers).
    assert all(spec.name == name for name, spec in REGISTRY.items())
