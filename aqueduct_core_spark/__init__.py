"""aqueduct_core_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Reproduces the semantics of the reference engine (Tesco Aqueduct, a Java/Micronaut
"data pipe": ordered offset-addressed change-event log, tailed and applied into edge
stores with last-writer-wins compaction, tombstone deletion, exactly-once offset
bookkeeping, routing filters and a parent->child apply hierarchy) as an idiomatic
Spark Structured Streaming job writing to a snapshot-versioned lake table of
multi-turn conversation transcripts.

Nothing here is a translation of the reference's Java — every operator is
re-expressed as DataFrame / Spark SQL plans (see SURVEY.md for the per-operator
file:line mapping into /root/reference).
"""

__version__ = "0.1.0"

from aqueduct_core_spark.schema import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
    LINEAGE_SCHEMA,
)
