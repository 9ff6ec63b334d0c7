from .inspect import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)

__all__ = [
    "explain_str",
    "has_pushed_filters",
    "has_broadcast_join",
    "scan_read_schema",
    "wholestage_codegen_ids",
]
