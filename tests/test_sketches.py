"""Misra-Gries heavy hitters: the undercount bound under adversarially
small capacity, and the two-pass exact query's completeness (its
oracle equality is covered by test_oracle_diff)."""

from __future__ import annotations

import pandas as pd

from tf_aws_lakeformation_governed_datalake_demo_spark.operators.sketches import (
    misra_gries_partial,
)


def _run_mg(series, cap, batch=500):
    gen = misra_gries_partial(cap)
    batches = [
        pd.DataFrame({"key": series[i : i + batch]})
        for i in range(0, len(series), batch)
    ]
    (out,) = list(gen(iter(batches)))
    return dict(zip(out["key"], out["cnt"]))


def test_mg_exact_when_under_capacity():
    series = [1] * 50 + [2] * 30 + [3] * 20
    got = _run_mg(series, cap=8)
    assert got == {1: 50, 2: 30, 3: 20}


def test_mg_undercount_bounded_and_heavy_key_survives():
    # one dominant key among many singletons, capacity far too small
    import random

    rng = random.Random(7)
    series = [999] * 400 + list(range(1000))  # n = 1400, heavy freq 400
    rng.shuffle(series)
    cap = 4
    got = _run_mg(series, cap)
    assert len(got) <= cap
    # guarantee: any key with count > n/cap (=350) survives
    assert 999 in got
    # undercount bound: estimate >= true - n/cap
    assert got[999] >= 400 - len(series) / cap
    # never overcounts
    assert got[999] <= 400


def test_mg_multiple_partitions_union_covers_heavies():
    # two "partitions" with different heavy keys; the union of partials
    # must contain both (the completeness the two-pass query relies on)
    s1 = [1] * 300 + list(range(100, 400))
    s2 = [2] * 300 + list(range(400, 700))
    got1 = _run_mg(s1, cap=4)
    got2 = _run_mg(s2, cap=4)
    assert 1 in got1 and 2 in got2
