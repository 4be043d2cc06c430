"""Physical-plan inspection helpers — the engine's "would this survive 100x?"
checklist, assertable in tests.

The reference hand-tunes its plans in SQL (SURVEY.md §4); we let Catalyst plan
and then VERIFY the plan has the properties we require: filters pushed into the
parquet scan, small dimensions broadcast, no surplus exchanges.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower is better;
    every one is a full network rewrite of the data)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    plan = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
