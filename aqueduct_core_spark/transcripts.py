"""User-facing views and invariants over the transcript lake table.

All views go through read_resolved: a copy-on-write table is already resolved
at write time (no extra cost); a merge-on-read table gets its LWW resolution +
cascade applied here over base ∪ delta files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aqueduct_core_spark.lake.merge import read_resolved
from aqueduct_core_spark.lake.table import LakeTable


def read_transcripts(table: LakeTable, version: int | None = None) -> DataFrame:
    """The live transcript view (exact `input_hint` shape + any evolved columns):
    engine metadata columns and sentinel/tombstone rows filtered out."""
    df = read_resolved(table, version=version)
    user_cols = [c for c in df.columns if not c.startswith("_")]
    return (
        df.filter((F.col("turn_idx") >= 0) & (~F.col("_deleted")))
        .select(*user_cols)
    )


def table_consistency_sum(table: LakeTable) -> int:
    """Sum of winning LSNs over live keys — the cheap cross-run equality invariant
    (reference: offset-consistency sum, SQLiteQueries.java:57-64)."""
    df = read_resolved(table)
    row = df.filter((~F.col("_deleted")) & (F.col("turn_idx") != -2)).agg(
        F.coalesce(F.sum("_lsn"), F.lit(0)).alias("s")
    ).collect()[0]
    return int(row["s"])


def count_by_entity(table: LakeTable) -> DataFrame:
    """Visibility metric: live row counts by record kind (reference A5:
    PostgresqlStorage.java:507-509 count-by-type)."""
    df = read_resolved(table)
    kind = (
        F.when(F.col("turn_idx") >= 0, F.lit("turn"))
        .when(F.col("turn_idx") == -1, F.lit("conversation"))
        .otherwise(F.lit("conversation_tombstone"))
    )
    return (
        df.filter(~F.col("_deleted") | (F.col("turn_idx") == -2))
        .groupBy(kind.alias("entity"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
