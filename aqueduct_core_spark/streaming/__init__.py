from aqueduct_core_spark.streaming.engine import IngestEngine  # noqa: F401
