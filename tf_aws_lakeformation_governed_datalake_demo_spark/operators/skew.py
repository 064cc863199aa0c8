"""Skew handling: explicit key salting for joins AQE can't fix.

AQE's skew-join split (on by default in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
fallback when one join key dominates so heavily that even split
partitions hot-spot — the classic 100 TB mitigation:

- big side: append a random-ish salt in [0, n) to the key;
- small side: explode each row into n copies, one per salt value;
- join on (key, salt) — the hot key's rows now spread over n tasks.

The salt must be *deterministic* here (driver re-runs queries and
compares hashes), so it derives from a row-unique column, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an n-way salted key.

    ``salt_source`` is any column expression on ``big`` that varies per
    row (defaults to a hash of all columns); the salt is its value mod
    ``n_salts``. The small side is exploded n_salts-fold — keep it
    broadcast-sized times n_salts.
    """
    salt = (
        F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
        if salt_source is None
        else F.pmod(salt_source, F.lit(n_salts))
    )
    big_salted = big.withColumn("__salt", salt.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_salted.join(
        small_salted,
        (big_salted[big_key] == small_salted[small_key])
        & (big_salted["__salt"] == small_salted["__salt"]),
        how,
    )
    return joined.drop("__salt")


def stats_salted_join(
    catalog,
    qualified: str,
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> "tuple[DataFrame, list]":
    """Histogram-driven join-strategy flip (round-16): consult
    ANALYZE's equi-height histogram for the BIG side's join key
    (catalog.histogram_skewed_values — metadata-only); when a value
    provably holds >=1/HISTOGRAM_BINS of the rows, salt the join,
    otherwise plain equi-join. The CBO pattern: statistics evidence
    changes the STRATEGY, never the rows — both branches produce
    identical results (pinned in tests/test_analyze.py). Returns
    (joined, skewed_values) so callers/tests can see which branch
    the evidence chose."""
    skewed = catalog.histogram_skewed_values(qualified, big_key)
    if not skewed:
        return big.join(small, big[big_key] == small[small_key], how), []
    return (
        salt_join(big, small, big_key, small_key, n_salts=n_salts, how=how),
        skewed,
    )
