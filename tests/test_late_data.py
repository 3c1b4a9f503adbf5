"""Watermark late-data semantics, demonstrated deterministically.

What Spark guarantees (and this test pins): in append mode a window is
EMITTED exactly once — when the watermark passes its end — and its
state is then evicted, so a late row arriving after emission is
dropped rather than double-counted. (Rows merely *older* than the
watermark but targeting never-seen windows MAY still be admitted —
Spark documents dropping as best-effort — so that is deliberately not
asserted.)

Spark 4 admits a late row into a window whose state is still live
(eviction happens at batch end, input is not pre-filtered — measured:
numRowsDroppedByWatermark stays 0 for such rows), so the late row here
arrives one batch AFTER the window was emitted and evicted.

Four files drained as four micro-batches (maxFilesPerTrigger=1, file
order pinned via mtime):

- batch 1: two events in the 12:00 window (watermark still epoch)
- batch 2: one event a day later → watermark advances past 13:00
- batch 3: another day-2 event; the 12:00 window is finalized during
  this batch — emitted with count 2, state evicted
- batch 4: a LATE event for the already-emitted 12:00 window → must
  not re-emit or recount it
"""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def three_batch_dir(spark, tmp_path):
    base = str(tmp_path / "stream_in")
    batches = [
        [(1, "2024-01-01 12:00:00"), (2, "2024-01-01 12:10:00")],
        [(3, "2024-01-02 12:00:00")],   # advances watermark past 13:00
        [(5, "2024-01-02 13:00:00")],   # 12:00 window emits during this batch
        [(4, "2024-01-01 12:20:00")],   # late, AFTER emission+eviction
    ]

    def write(rows, mtime):
        before = set(glob.glob(f"{base}/*.parquet"))
        (
            spark.createDataFrame(rows, "event_id long, ts_s string")
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
            .drop("ts_s")
            .coalesce(1)
            .write.mode("append")
            .parquet(base)
        )
        # FileStreamSource orders files by modification time — pin the
        # batch order explicitly
        for f in set(glob.glob(f"{base}/*.parquet")) - before:
            os.utime(f, (mtime, mtime))

    now = time.time()
    for i, rows in enumerate(batches):
        write(rows, now - 3600 * (len(batches) - i))
    return base


def test_window_emits_once_and_late_rows_drop(spark, three_batch_dir):
    schema = spark.read.parquet(three_batch_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(three_batch_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("w"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM late_test").collect()
    emitted = [(r["w"], r["n"]) for r in rows]
    # exactly one emission of the 12:00 window, with the pre-eviction
    # count — the late batch-3 row neither re-emits nor re-counts it
    assert emitted.count(("2024-01-01 12:00", 2)) == 1
    assert all(w != "2024-01-01 12:00" or n == 2 for w, n in emitted)
    # the day-2 window is never finalized (watermark never passes it)
    assert all(not w.startswith("2024-01-02") for w, _ in emitted)
