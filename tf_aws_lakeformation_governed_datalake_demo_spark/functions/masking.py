"""PII masking expressions.

The reference's complete scalar-function surface is two REGEXP_REPLACE
masks inside the sales_masked view (outputs.tf:48-49):

- email: ``REGEXP_REPLACE(col, '^([^@]{1,3}).*@', '***@')`` — local part
  collapsed, domain kept (``alice.j@example.com`` -> ``***@example.com``).
- SSN: ``REGEXP_REPLACE(col, '\\d', '*')`` — every digit starred
  (``123-45-6789`` -> ``***-**-****``).

Both patterns behave identically under Athena's RE2-style engine and
Spark's Java regex (SURVEY.md §7.5); Spark's regexp_replace is global
like Presto's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_MASK_PATTERN = r"^([^@]{1,3}).*@"
EMAIL_MASK_REPLACEMENT = "***@"
SSN_MASK_PATTERN = r"\d"
SSN_MASK_REPLACEMENT = "*"


def mask_email(col: Column | str) -> Column:
    """F1 — collapse the email local part, keep the domain."""
    return F.regexp_replace(col, EMAIL_MASK_PATTERN, EMAIL_MASK_REPLACEMENT)


def mask_digits(col: Column | str) -> Column:
    """F2 — star every digit (SSN-style mask)."""
    return F.regexp_replace(col, SSN_MASK_PATTERN, SSN_MASK_REPLACEMENT)


def mask_for_column(name: str, col: Column | str | None = None) -> Column:
    """Tag-driven mask selection: email-ish column names get the email
    mask, everything else the digit mask — the policy the reference
    hand-writes per column in its view DDL, automated from LF-tags."""
    target = F.col(name) if col is None else (F.col(col) if isinstance(col, str) else col)
    if "email" in name.lower() or "mail" in name.lower():
        return mask_email(target)
    return mask_digits(target)
