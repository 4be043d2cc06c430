"""Operator library: every data-path operator of the reference (SURVEY.md §2),
re-expressed as composable DataFrame transforms."""

from aqueduct_core_spark.operators.cdc_log import (  # noqa: F401
    compact_log,
    consistency_sum,
    count_by_type,
    global_latest_offset,
    latest_deletes,
    lww_latest,
    max_offset_before,
    max_offset_for_types,
    read_page,
    routing_filter,
)
