"""Real Structured-Streaming execution: readStream → watermark →
windowed agg → memory sink, drained with an availableNow trigger.

The registered `stream_*` queries prove windowing SEMANTICS against the
DuckDB oracle in batch mode; this test proves the same plan actually
runs as a stream (stateful aggregation + watermark + trigger), and that
the bounded-drain result matches the batch result exactly.
"""

from __future__ import annotations

from spark_etl_pipeline_spark.streaming.windows import (
    stream_events_tumbling,
    stream_tumbling_counts,
)
from tests.conftest import SF_SMOKE


def test_streaming_matches_batch(spark):
    stream_df = stream_events_tumbling(spark, SF_SMOKE)
    assert stream_df.isStreaming

    query = (
        stream_df.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(120)
    finally:
        query.stop()

    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM tumbling_test").collect()
    )
    want = sorted(tuple(r) for r in stream_tumbling_counts(spark, SF_SMOKE).collect())
    assert got == want and len(got) > 0


def test_foreachbatch_parquet_sink(spark, tmp_path):
    """Streaming → foreachBatch → partitioned parquet: the streaming
    half of the sink surface (append-only file sinks can't re-aggregate;
    foreachBatch bridges a complete-mode agg into any batch writer)."""
    from spark_etl_pipeline_spark.sources import write_parquet
    from spark_etl_pipeline_spark.streaming.windows import stream_events_tumbling

    out_dir = str(tmp_path / "windowed")

    def sink(batch_df, batch_id):
        write_parquet(batch_df, out_dir, mode="overwrite")

    q = (
        stream_events_tumbling(spark, SF_SMOKE)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    written = spark.read.parquet(out_dir)
    want = sorted(tuple(r) for r in stream_tumbling_counts(spark, SF_SMOKE).collect())
    assert sorted(tuple(r) for r in written.collect()) == want


def test_stream_stream_interval_join_matches_batch(spark):
    from spark_etl_pipeline_spark.streaming.windows import (
        stream_interval_join,
        stream_stream_join,
    )

    stream = stream_stream_join(spark, SF_SMOKE)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    got = spark.sql(
        "SELECT count(*) AS n_pairs, count(DISTINCT purchase_id) AS n_p FROM ssj_test"
    ).collect()[0]
    want = stream_interval_join(spark, SF_SMOKE).collect()[0]
    assert (got["n_pairs"], got["n_p"]) == (
        want["n_pairs"],
        want["n_purchases_with_click"],
    ) and got["n_pairs"] > 0


def test_stream_dedup_replayed_files(spark, tmp_path):
    """Two byte-identical file drops of the same events →
    dropDuplicatesWithinWatermark keeps exactly one row per event_id."""
    import shutil

    from spark_etl_pipeline_spark.plans.registry import _nanos_columns
    from spark_etl_pipeline_spark.streaming.windows import stream_events_dedup

    src = f"{SF_SMOKE}/events.parquet"
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    shutil.copy(src, drop_dir / "batch_000.parquet")
    shutil.copy(src, drop_dir / "batch_001.parquet")

    nanos = _nanos_columns(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema

    stream = stream_events_dedup(spark, f"{drop_dir}/*.parquet", schema, nanos)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS ids FROM dedup_test"
    ).collect()[0]
    want = spark.read.parquet(src).count()
    assert got["n"] == got["ids"] == want and want > 0
