"""Mask-expression unit tests on edge inputs (SURVEY.md §5.2).

The two masks are the reference's entire scalar-function surface
(outputs.tf:48-49): email local-part collapse and SSN digit mask.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EMAIL_PATTERN = r"^([^@]{1,3}).*@"
EMAIL_REPL = "***@"
SSN_PATTERN = r"\d"
SSN_REPL = "*"


@pytest.mark.parametrize(
    "raw,masked",
    [
        ("alice.j@example.com", "***@example.com"),
        ("a@b.com", "***@b.com"),  # 1-char local part still collapses
        ("@example.com", "@example.com"),  # empty local part: no match ({1,3} needs >=1)
        ("no-at-sign", "no-at-sign"),  # no @: unchanged
        ("x@y@z.com", "***@z.com"),  # greedy .* spans to the last @
    ],
)
def test_email_mask(spark, raw, masked):
    row = (
        spark.range(1)
        .select(F.regexp_replace(F.lit(raw), EMAIL_PATTERN, EMAIL_REPL).alias("m"))
        .first()
    )
    assert row.m == masked


@pytest.mark.parametrize(
    "raw,masked",
    [
        ("123-45-6789", "***-**-****"),
        ("000-11-2222", "***-**-****"),
        ("no digits", "no digits"),
        ("a1b2", "a*b*"),
    ],
)
def test_ssn_mask(spark, raw, masked):
    row = (
        spark.range(1)
        .select(F.regexp_replace(F.lit(raw), SSN_PATTERN, SSN_REPL).alias("m"))
        .first()
    )
    assert row.m == masked
