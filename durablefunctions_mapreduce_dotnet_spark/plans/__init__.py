from .inspect import explain_str, assert_pushed_filters, assert_read_schema_only, assert_no_cartesian

__all__ = [
    "explain_str",
    "assert_pushed_filters",
    "assert_read_schema_only",
    "assert_no_cartesian",
]
