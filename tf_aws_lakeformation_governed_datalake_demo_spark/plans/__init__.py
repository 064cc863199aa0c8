"""Plan inspection helpers (SURVEY.md §4 discipline)."""

from .explain import (
    assert_broadcast_join,
    assert_pushed_filter,
    assert_read_schema_pruned,
    assert_top_k,
    final_plan,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_pushed_filter",
    "assert_read_schema_pruned",
    "assert_top_k",
    "final_plan",
    "physical_plan",
]
