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


def test_stateful_drain_kill_and_resume_matches_uninterrupted(
    spark, tmp_path, monkeypatch
):
    """Kill a RUNNING ``applyInPandasWithState`` drain partway through
    its input, restart from the same checkpoint, and prove the state
    store picks up EXACTLY where the kill left it: the per-user final
    profiles across the two query incarnations equal the batch oracle
    (= an uninterrupted run), with no key double-counted and none
    reset to zero — the exactly-once-state claim a production
    deployment leans on (VERDICT r12 task 6).

    The events table is staged as 12 files and the stream capped at
    one file per micro-batch so the kill lands mid-stream; the source
    injection point (``stateful._events_stream``) is monkeypatched to
    carry ``maxFilesPerTrigger`` over the pre-normalized staging — the
    stateful operator under test (update fn, state schema, update
    output mode) runs unmodified.
    """
    import time

    from pyspark.sql import functions as F

    import spark_etl_pipeline_spark.streaming.stateful as st
    from spark_etl_pipeline_spark.plans.registry import table
    from tests.conftest import SF_SMOKE

    src = tmp_path / "staged"
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    ev.repartition(12).write.parquet(str(src / "events.parquet"))
    staged = spark.read.parquet(str(src / "events.parquet"))
    n_files = len(
        [f for f in os.listdir(str(src / "events.parquet")) if f.endswith(".parquet")]
    )
    assert n_files >= 10, "need many micro-batches for a mid-stream kill"

    # batch oracle == what an uninterrupted drain converges to (the
    # plain drain-vs-batch equivalence is pinned elsewhere); NULL total
    # for a user with zero finite measurements, like the operator
    finite = F.when(
        ~F.isnan("value") & (F.abs("value") != float("inf")), F.col("value")
    )
    oracle = {
        r.user_id: (r.n, r.tot)
        for r in staged.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(finite).alias("tot"))
        .collect()
    }

    monkeypatch.setattr(
        st,
        "_events_stream",
        lambda s, sf_dir: s.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events.*"),
    )
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "emissions")

    # a memory sink refuses checkpoint recovery ("this query does not
    # support recovering from checkpoint location"), so the drain goes
    # through the fault-tolerant foreachBatch path — parquet-append per
    # micro-batch, stamped with batch id and incarnation
    def sink_for(incarnation: str):
        def sink(bdf, bid):
            (
                bdf.withColumn("batch_id", F.lit(bid))
                .withColumn("incarnation", F.lit(incarnation))
                .write.mode("append")
                .parquet(outdir)
            )

        return sink

    # ---- incarnation 1: run, then KILL after >=2 committed batches --
    q1 = (
        st.running_user_profiles(spark, str(src))
        .writeStream.foreachBatch(sink_for("pre"))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q1.lastProgress
        if p and p["batchId"] >= 2:
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    pre = spark.read.parquet(outdir).where("incarnation = 'pre'").toPandas()
    assert len(pre), "kill landed before any batch committed"
    pre_final = pre.loc[pre.groupby("user_id")["n_events"].idxmax()]
    consumed = int(pre_final["n_events"].sum())
    total_rows = sum(n for n, _ in oracle.values())
    assert consumed < total_rows, (
        "kill landed after the whole input was consumed — premise lost "
        f"({consumed}/{total_rows}); raise the file count"
    )

    # ---- incarnation 2: SAME checkpoint, drain the remainder --------
    q2 = (
        st.running_user_profiles(spark, str(src))
        .writeStream.foreachBatch(sink_for("post"))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300), "resume drain did not finish"
    q2.stop()
    both = spark.read.parquet(outdir).toPandas()
    post = both[both.incarnation == "post"]
    assert len(post), "resume consumed nothing — the kill was not mid-stream"

    # ---- final per-user state across both incarnations --------------
    # (a batch whose sink write landed but whose offset commit the kill
    # interrupted is REPLAYED on restart — foreachBatch is
    # at-least-once — with identical emissions, since the state store
    # restored the pre-batch state; max-n_events dedup absorbs it)
    import pandas as pd

    final = both.loc[both.groupby("user_id")["n_events"].idxmax()]
    got = {
        int(r.user_id): (int(r.n_events), r.total_value)
        for r in final.itertuples()
    }
    assert set(got) == set(oracle), "key set drifted across the restart"
    for uid, (n, tot) in oracle.items():
        gn, gtot = got[uid]
        # exactly-once state: a replayed batch must not double-count
        # (gn > n) and a reset state must not undercount (gn < n)
        assert gn == n, f"user {uid}: n_events {gn} != {n}"
        if tot is None:
            assert gtot is None or pd.isna(gtot), f"user {uid}: fabricated total"
        else:
            assert abs(gtot - tot) <= 1e-6 * max(1.0, abs(tot)), (
                f"user {uid}: total {gtot} != {tot}"
            )

