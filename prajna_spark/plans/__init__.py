"""Physical-plan introspection and assertions.

The 100 TB contract is enforced here: every operator's plan is checked for
the properties that decide whether it survives a 1000-executor scale-up —
filters/columns pushed into the parquet scan, small dims broadcast, no
accidental single-partition funnels, codegen coverage. SURVEY.md §4.2 maps
each reference execution technique to the Spark behavior these helpers
assert on.
"""

from prajna_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_single_partition_exchange,
    assert_pushdown,
    codegen_stage_count,
    explain_str,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_single_partition_exchange",
    "assert_pushdown",
    "codegen_stage_count",
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
]
