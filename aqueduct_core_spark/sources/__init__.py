from aqueduct_core_spark.sources.changefeed import (  # noqa: F401
    read_feed,
    read_feed_stream,
)
