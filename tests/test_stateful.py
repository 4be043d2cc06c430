"""applyInPandasWithState: state persists across micro-batches."""

from __future__ import annotations

from aqueduct_core_spark.sources import read_feed_stream
from aqueduct_core_spark.streaming.stateful import conversation_progress

from tests.util import ev, events_df


def test_conversation_progress_accumulates_across_batches(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    b1 = [ev(1, conv="A", turn=0), ev(2, conv="A", turn=1), ev(3, conv="B", turn=0)]
    b2 = [ev(4, "D", conv="A", turn=0), ev(5, conv="B", turn=1)]
    events_df(spark, b1).coalesce(1).write.mode("append").parquet(feed_dir)
    events_df(spark, b2).coalesce(1).write.mode("append").parquet(feed_dir)

    stream = read_feed_stream(spark, feed_dir, max_files_per_trigger=1)
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql(
        "SELECT conv_id, max(n_events) n, max(n_deletes) d, max(max_lsn) m "
        "FROM conv_progress GROUP BY conv_id ORDER BY conv_id"
    ).collect()
    got = {(r["conv_id"]): (r["n"], r["d"], r["m"]) for r in rows}
    # cumulative across BOTH micro-batches (state survived the batch boundary)
    assert got["A"] == (3, 1, 4)
    assert got["B"] == (2, 0, 5)
