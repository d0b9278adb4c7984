from tdataframe_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_join",
    "has_whole_stage_codegen",
]
