"""Streaming incremental upsert: stream → versioned parquet snapshot.

Two micro-batches (file-per-trigger, modification-time-ordered) drain
through the foreachBatch upsert sink; the final snapshot must equal the
same batches applied sequentially with the batch ``upsert`` — and the
intermediate generation must still be readable (snapshot isolation).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.plans.etl import upsert
from spark_etl_pipeline_spark.streaming.incremental import (
    latest_snapshot_path,
    read_snapshot,
    run_stream_upsert,
)

SCHEMA = "user_id long, status string, total double"


def _write_batch(spark, path: str, rows, mtime: int) -> None:
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    # FileStreamSource orders batches by modification time — pin it
    for name in os.listdir(path):
        os.utime(os.path.join(path, name), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_stream_upsert_matches_sequential_batch_merge(spark, tmp_path):
    src = tmp_path / "src"
    b1 = [(1, "new", 10.0), (2, "new", 20.0)]
    b2 = [(2, "updated", 25.0), (3, "new", 30.0)]
    _write_batch(spark, str(src / "b1"), b1, 1_000_000)
    _write_batch(spark, str(src / "b2"), b2, 2_000_000)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    snap = str(tmp_path / "snapshot")
    run_stream_upsert(stream, "user_id", snap, str(tmp_path / "ckpt"))

    got = {
        r.user_id: (r.status, r.total)
        for r in read_snapshot(spark, snap).collect()
    }
    want_df = upsert(
        spark.createDataFrame(b1, SCHEMA), spark.createDataFrame(b2, SCHEMA), "user_id"
    )
    want = {r.user_id: (r.status, r.total) for r in want_df.collect()}
    assert got == want == {
        1: ("new", 10.0),
        2: ("updated", 25.0),
        3: ("new", 30.0),
    }

    # snapshot isolation: the superseded generation is still readable
    latest = latest_snapshot_path(snap)
    assert latest is not None and latest.endswith("v1")
    v0 = os.path.join(snap, "v0")
    assert {r.user_id for r in spark.read.parquet(v0).collect()} == {1, 2}


def test_stream_upsert_is_restart_idempotent(spark, tmp_path):
    # a second availableNow run with the SAME checkpoint must be a no-op
    src = tmp_path / "src"
    _write_batch(spark, str(src / "b1"), [(1, "new", 1.0)], 1_000_000)
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")

    run_stream_upsert(stream(), "user_id", snap, ckpt)
    first = latest_snapshot_path(snap)
    run_stream_upsert(stream(), "user_id", snap, ckpt)
    assert latest_snapshot_path(snap) == first, "re-run re-processed old data"
    rows = read_snapshot(spark, snap).collect()
    assert [(r.user_id, r.status) for r in rows] == [(1, "new")]


def test_latest_state_sink_is_batch_order_independent(spark, tmp_path):
    """CDC compaction: feeding the same event batches in either order
    must converge to the identical latest-per-key snapshot (the sink
    re-argmaxes snapshot ∪ batch — file-listing order is NOT event
    order, so order-independence is the correctness contract)."""
    import datetime as dt

    from spark_etl_pipeline_spark.streaming.incremental import latest_state_sink

    eschema = "user_id long, ts timestamp, event_id long, event_type string, value double"
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    newer = [(1, t.replace(hour=14), 103, "purchase", 9.0)]
    older = [(1, t, 101, "view", 1.0), (2, t, 102, "click", 2.0)]

    def run(order):
        snap = str(tmp_path / f"snap_{order}")
        sink = latest_state_sink("user_id", snap)
        batches = [newer, older] if order == "no" else [older, newer]
        for i, rows in enumerate(batches):
            sink(spark.createDataFrame(rows, eschema), i)
        from spark_etl_pipeline_spark.streaming.incremental import read_snapshot

        return sorted(
            (r.user_id, r.event_id, r.event_type) for r in read_snapshot(spark, snap).collect()
        )

    assert run("fwd") == run("no") == [(1, 103, "purchase"), (2, 102, "click")]


def test_vacuum_keeps_latest_and_n_newest(spark, tmp_path):
    from spark_etl_pipeline_spark.streaming.incremental import (
        _commit_pointer,
        vacuum_snapshots,
    )

    snap = str(tmp_path / "snapshot")
    os.makedirs(snap)
    for i in range(5):
        d = os.path.join(snap, f"v{i}")
        spark.createDataFrame([(i,)], "x int").write.mode("overwrite").parquet(d)
    _commit_pointer(snap, "v4")
    deleted = vacuum_snapshots(snap, keep=2)
    # deletion walks newest-to-oldest (reader-safety: deletions approach
    # an old reader from above, never strand it with the pointer far off)
    assert deleted == ["v2", "v1", "v0"]
    assert sorted(d for d in os.listdir(snap) if d.startswith("v")) == ["v3", "v4"]
    # the pointed-to generation must survive even if older than keep-window
    _commit_pointer(snap, "v3")
    spark.createDataFrame([(9,)], "x int").write.mode("overwrite").parquet(
        os.path.join(snap, "v9")
    )
    deleted = vacuum_snapshots(snap, keep=1)
    assert "v3" not in deleted  # current pointer protected
    assert "v9" not in deleted  # newest kept
    assert deleted == ["v4"]
