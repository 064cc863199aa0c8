"""Scalar function library: the reference's masking expressions plus
tag-driven mask selection (SURVEY.md §2.8 F1-F3)."""

from .masking import (
    EMAIL_MASK_PATTERN,
    EMAIL_MASK_REPLACEMENT,
    SSN_MASK_PATTERN,
    SSN_MASK_REPLACEMENT,
    mask_digits,
    mask_email,
    mask_for_column,
)

__all__ = [
    "EMAIL_MASK_PATTERN",
    "EMAIL_MASK_REPLACEMENT",
    "SSN_MASK_PATTERN",
    "SSN_MASK_REPLACEMENT",
    "mask_digits",
    "mask_email",
    "mask_for_column",
]
