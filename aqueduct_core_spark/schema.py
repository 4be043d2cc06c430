"""Schemas for the change-event feed, the transcript target table, and lineage.

Mapping to the reference (see SURVEY.md section 1):
  change event  <-> Message / EVENTS log  (pipe-api/.../Message.java:14-27,
                    PostgresqlStorageIntegrationSpec.groovy:65-76)
  transcripts   <-> applied edge store    (pipe-storage-sqlite/.../SQLiteQueries.java:20-29)
  lineage       <-> OFFSETS registers     (pipe-api/.../OffsetName.java:3-5)

`change_lsn` is the reference's `msg_offset` (BIGSERIAL total order); `op='D'` is the
reference's `data IS NULL` tombstone (PostgresqlStorage.java:479).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Ordered change-event feed — the analog of the reference's central EVENTS log.
CHANGE_EVENT_SCHEMA = StructType(
    [
        StructField("change_lsn", LongType(), nullable=False),
        StructField("op", StringType(), nullable=False),  # 'I' | 'U' | 'D'
        StructField("entity", StringType(), nullable=False),  # 'conversation' | 'turn'
        StructField("conv_id", StringType(), nullable=False),
        # NULL for entity='conversation' events in the feed; stored as -1 in the table.
        StructField("turn_idx", IntegerType(), nullable=True),
        StructField("role", StringType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("tool", StringType(), nullable=True),
        StructField("ts", TimestampType(), nullable=False),
        # routing partition (reference: routing_id / cluster_id)
        StructField("routing_id", LongType(), nullable=True),
        # serialized payload size (reference: event_size, drives the byte-cap window)
        StructField("event_size", IntegerType(), nullable=True),
    ]
)

#: The user-facing transcript table shape (exact `input_hint` shape).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), nullable=False),
        StructField("turn_idx", IntegerType(), nullable=False),
        StructField("role", StringType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("tool", StringType(), nullable=True),
        StructField("ts", TimestampType(), nullable=False),
    ]
)

#: Physical transcript-table schema: user columns + engine metadata columns.
#: `_lsn` persists the LWW tiebreak across micro-batches; `_deleted` keeps
#: tombstones physically present (late-data-safe deletes, reference T5:
#: PostgresqlStorage.java:394-408 — deletions retained until a threshold so
#: stragglers still observe them). Conversation-level records use turn_idx = -1.
TRANSCRIPT_PHYSICAL_SCHEMA = StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [
        StructField("_lsn", LongType(), nullable=False),
        StructField("_deleted", BooleanType(), nullable=False),
    ]
)

#: Sentinel turn_idx for conversation-level records inside the physical table.
CONV_SENTINEL_TURN_IDX = -1

#: Sentinel turn_idx holding the latest conversation-level DELETE per conv_id.
#: Kept separately from the -1 metadata row so a conversation re-insert does not
#: erase the cascade boundary — mirrors the reference, where deletion compaction
#: removes every message older than the latest delete per key even when newer
#: inserts exist (PostgresqlStorage.java:473-488,
#: PostgresqlStorageIntegrationSpec.groovy:284-334).
CONV_DELETE_SENTINEL_TURN_IDX = -2

#: Per-partition high-watermark lineage (reference OFFSETS: LOCAL/GLOBAL_LATEST_OFFSET).
LINEAGE_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), nullable=False),
        StructField("high_watermark_lsn", LongType(), nullable=False),
        StructField("batch_id", LongType(), nullable=False),
        StructField("applied_at", TimestampType(), nullable=False),
    ]
)
