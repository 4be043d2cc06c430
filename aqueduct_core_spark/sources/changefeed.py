"""Change-feed sources: schema-enforced batch and streaming readers.

The reference tails an HTTP pipe (pipe-http-client/.../HttpPipeClient.java:36-63);
here the feed is a directory of LSN-range-ordered segments in parquet / json / csv.
Readers always impose CHANGE_EVENT_SCHEMA explicitly — never infer — so a feed
written by any producer parses identically on every executor, and the parquet
path gets vectorized reading + predicate pushdown on change_lsn/ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aqueduct_core_spark.schema import CHANGE_EVENT_SCHEMA

_FORMATS = {"parquet", "json", "csv"}


def read_feed(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    start_lsn: int | None = None,
    end_lsn: int | None = None,
) -> DataFrame:
    """Batch read of the change log, optionally LSN-bounded (the visibility
    window F2: reads never pass the published watermark,
    PostgresqlStorage.java:450-452). Bounds are plain predicates, so they push
    into the scan (min-max pruning skips whole segments)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported feed format {fmt!r}")
    reader = spark.read.schema(CHANGE_EVENT_SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", "true")
    df = reader.format(fmt).load(path)
    if start_lsn is not None:
        df = df.filter(F.col("change_lsn") >= start_lsn)
    if end_lsn is not None:
        df = df.filter(F.col("change_lsn") <= end_lsn)
    return df


def read_feed_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
):
    """Streaming tail of the segment directory. maxFilesPerTrigger is the batch
    admission control (reference read limit + byte cap, W1/O2)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported feed format {fmt!r}")
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)
