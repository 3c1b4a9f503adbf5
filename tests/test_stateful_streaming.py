"""applyInPandasWithState + dropDuplicatesWithinWatermark, executed as
real streams (availableNow drain) and checked against batch oracles."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.plans.registry import table
from spark_etl_pipeline_spark.streaming.stateful import (
    dedup_events_within_watermark,
    running_user_profiles,
)
from tests.conftest import SF_SMOKE


def drain(df, name: str, mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()


def test_stateful_user_profiles(spark):
    stream = running_user_profiles(spark, SF_SMOKE)
    assert stream.isStreaming
    drain(stream, "profiles_test", "update")

    # last emitted row per user == final state == batch aggregate
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER
                     (PARTITION BY user_id ORDER BY n_events DESC) AS rn
                 FROM profiles_test) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_within_watermark(spark):
    stream = dedup_events_within_watermark(spark, SF_SMOKE)
    assert stream.isStreaming
    drain(stream, "dedup_test", "append")
    got = spark.sql("SELECT count(*) AS n FROM dedup_test").collect()[0]["n"]
    want = (
        table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    )
    assert got == want > 0


def test_idle_session_timeout_flushes_exactly_idle_users(spark, tmp_path):
    """EventTimeTimeout contract on a CONTROLLED stream: users idle for
    >gap before end-of-stream flush a closed summary once; a user active
    at stream end stays open (state alive, no closed row)."""
    import datetime as dt

    from spark_etl_pipeline_spark.streaming.stateful import idle_session_summaries

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two events, long idle afterwards -> must close (n=2)
        (1, t0, 101, "view", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=5), 102, "click", 1.0, "{}"),
        # user 2: single event near the end -> watermark never passes
        # its timeout; stays open
        (2, t0 + dt.timedelta(hours=6), 201, "view", 1.0, "{}"),
    ]
    src = str(tmp_path / "events_src")
    schema = (
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    # ONE file -> ONE data batch: with multiple files the listing order
    # is timestamp-tied and nondeterministic, and if the late-ts file
    # processes first the watermark jumps ahead and drops user 1's rows
    # as late data (observed flaking under the full suite).
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    out = idle_session_summaries(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("idle_sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    rows_out = spark.sql(
        "SELECT user_id, n_events, closed FROM idle_sessions_test"
    ).collect()
    closed = {(r.user_id, r.n_events) for r in rows_out if r.closed}
    open_updates = {(r.user_id, r.n_events) for r in rows_out if not r.closed}
    assert closed == {(1, 2)}  # idle user flushed once, with full count
    assert (2, 1) in open_updates  # active-at-end user emitted only updates
    assert not any(u == 2 for (u, _) in closed)


def test_idle_session_timer_state_survives_kill_and_resume(spark, tmp_path):
    """An ARMED EventTimeTimeout must survive a query restart: the
    timer is state-store state, distinct from the value state the
    profiles kill-resume test covers (tests/test_incremental.py).

    Incarnation 1 sees only user 1's events (watermark too low to fire
    anything), arms user 1's idle timer, and is killed. User 1 never
    appears in the input again; a watermark-advancing event lands
    AFTER the kill. If the restored incarnation closes user 1 with the
    FULL pre-kill count, three things held across the restart at once:
    the value state (n=2), the armed timer (the hasTimedOut branch ran
    with NO new data for the key), and exactly-once emission (one
    closed row, not zero, not two)."""
    import datetime as dt
    import time

    from spark_etl_pipeline_spark.streaming.stateful import (
        idle_session_summaries,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "src"
    outdir = str(tmp_path / "emissions")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows, mtime):
        p = str(src / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))
        os.utime(p, (mtime, mtime))

    # batch 1: user 1's whole session — present BEFORE the kill only
    write_file(
        "b1",
        [
            (1, t0, 101, "view", 1.0, "{}"),
            (1, t0 + dt.timedelta(minutes=5), 102, "click", 1.0, "{}"),
        ],
        1_000_000,
    )

    def query(sink_name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
            .withWatermark("ts", "10 minutes")
        )
        out = idle_session_summaries(stream, gap="30 minutes")

        def sink(bdf, bid):
            (
                bdf.withColumn("incarnation", F.lit(sink_name))
                .write.mode("append")
                .parquet(outdir)
            )

        return (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
        )

    # ---- incarnation 1: consume b1, arm the timer, KILL -------------
    q1 = query("pre").trigger(processingTime="0 seconds").start()
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q1.lastProgress
        if p and int(p["numInputRows"]) > 0:
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    pre = spark.read.parquet(outdir).where("incarnation = 'pre'").toPandas()
    assert len(pre), "kill landed before the first batch committed"
    assert not pre.closed.any(), (
        "premise lost: the session closed BEFORE the kill — the "
        "watermark should still be below user 1's timeout"
    )

    # the watermark-advancer arrives only after the kill: the restart
    # must fire user 1's timer from RESTORED state, with no new rows
    # for the key anywhere in incarnation 2's input
    write_file(
        "b2",
        [(2, t0 + dt.timedelta(hours=6), 201, "view", 1.0, "{}")],
        2_000_000,
    )

    # ---- incarnation 2: same checkpoint, availableNow ----------------
    q2 = query("post").trigger(availableNow=True).start()
    assert q2.awaitTermination(300), "resume drain did not finish"
    q2.stop()
    post = spark.read.parquet(outdir).where("incarnation = 'post'").toPandas()

    closed = post[post.closed]
    assert len(closed) == 1, f"expected exactly one closed row: {closed}"
    assert int(closed.iloc[0].user_id) == 1
    assert int(closed.iloc[0].n_events) == 2, (
        "value state lost across restart: closed with "
        f"{int(closed.iloc[0].n_events)} events, not the pre-kill 2"
    )
    # user 1 had no data after the kill — its close can only have come
    # from the restored timer; user 2 (active at end) must stay open
    assert not post[(post.user_id == 2) & post.closed].shape[0]


def test_streaming_dedup_state_survives_kill_and_resume(spark, tmp_path):
    """Third state-store surface across a restart (value state:
    tests/test_incremental.py; timer state: the test above): the KEYED
    DEDUP state of ``dropDuplicatesWithinWatermark``. A replay of an
    already-emitted event arriving AFTER the kill is absorbed only if
    the restarted query recovered the seen-keys state — without it the
    replay re-emits and downstream double-counts, the exact
    at-least-once-source failure the operator exists to absorb."""
    import datetime as dt
    import time

    import spark_etl_pipeline_spark.streaming.stateful as st

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "src"
    outdir = str(tmp_path / "emissions")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows, mtime):
        p = str(src / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))
        os.utime(p, (mtime, mtime))

    # batch 1: events A (101), B (102), and a SAME-BATCH replay of A
    a = (1, t0, 101, "view", 1.0, "{}")
    write_file("b1", [a, (2, t0 + dt.timedelta(minutes=1), 102, "click", 2.0, "{}"), a], 1_000_000)

    monkeypatched = st._events_stream

    def staged_stream(s, sf_dir):
        return (
            s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{sf_dir}/b*")
        )

    st._events_stream = staged_stream
    try:
        def query(sink_name):
            out = st.dedup_events_within_watermark(spark, str(src))

            def sink(bdf, bid):
                (
                    bdf.withColumn("incarnation", F.lit(sink_name))
                    .write.mode("append")
                    .parquet(outdir)
                )

            return (
                out.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
            )

        # ---- incarnation 1: consume b1 (A dedups in-batch), KILL ----
        q1 = query("pre").trigger(processingTime="0 seconds").start()
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q1.lastProgress
            if p and int(p["numInputRows"]) > 0:
                break
            time.sleep(0.05)
        q1.stop()
        q1.awaitTermination(60)
        pre = spark.read.parquet(outdir).where("incarnation = 'pre'").toPandas()
        assert sorted(pre.event_id) == [101, 102], (
            f"in-batch dedup premise lost: {sorted(pre.event_id)}"
        )

        # the CROSS-RESTART replay of A lands only after the kill,
        # inside the watermark horizon, plus one genuinely new event C
        write_file(
            "b2",
            [a, (3, t0 + dt.timedelta(minutes=10), 103, "view", 3.0, "{}")],
            2_000_000,
        )

        # ---- incarnation 2: same checkpoint, availableNow ------------
        q2 = query("post").trigger(availableNow=True).start()
        assert q2.awaitTermination(300), "resume drain did not finish"
        q2.stop()
    finally:
        st._events_stream = monkeypatched

    both = spark.read.parquet(outdir).toPandas()
    post = both[both.incarnation == "post"]
    assert sorted(post.event_id) == [103], (
        "dedup state lost across restart: the post-kill replay of event "
        f"101 re-emitted (post incarnation emitted {sorted(post.event_id)})"
    )
    assert sorted(both.event_id) == [101, 102, 103], (
        f"exactly-once violated across the restart: {sorted(both.event_id)}"
    )


def test_session_window_merge_state_survives_kill_and_resume(spark, tmp_path):
    """Fourth state surface across a restart: the built-in
    ``session_window`` MERGE state. A post-restart event lands within
    the gap of a session whose earlier events were consumed before the
    kill — the restarted query must EXTEND that session (one row,
    full count, original start) rather than open a fragment, which is
    only possible if the windowed-aggregation state recovered."""
    import datetime as dt
    import time

    from spark_etl_pipeline_spark.streaming.windows import session

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "src"
    outdir = str(tmp_path / "emissions")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows, mtime):
        p = str(src / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))
        os.utime(p, (mtime, mtime))

    write_file(
        "b1",
        [
            (1, t0, 101, "view", 1.0, "{}"),
            (1, t0 + dt.timedelta(minutes=10), 102, "click", 1.0, "{}"),
        ],
        1_000_000,
    )

    def query(sink_name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
            .withWatermark("ts", "10 minutes")
        )
        agg = (
            session(stream, "ts", "30 minutes", ["user_id"])
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss")
                .alias("session_start"),
                "n_events",
            )
        )

        def sink(bdf, bid):
            (
                bdf.withColumn("incarnation", F.lit(sink_name))
                .withColumn("batch_id", F.lit(bid))
                .write.mode("append")
                .parquet(outdir)
            )

        return (
            agg.writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
        )

    # ---- incarnation 1: consume b1 (open session, 2 events), KILL ---
    q1 = query("pre").trigger(processingTime="0 seconds").start()
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q1.lastProgress
        if p and int(p["numInputRows"]) > 0:
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    pre = spark.read.parquet(outdir).where("incarnation = 'pre'").toPandas()
    assert len(pre), "kill landed before the first batch committed"
    pre_last = pre[pre.batch_id == pre.batch_id.max()]
    assert (
        len(pre_last[pre_last.user_id == 1]) == 1
        and int(pre_last[pre_last.user_id == 1].n_events.iloc[0]) == 2
    ), f"pre-kill premise lost: {pre_last.to_dict('records')}"

    # the extender lands within 30 min of the pre-kill session's last
    # event — same session, ONLY if the merge state survived the kill
    write_file(
        "b2",
        [
            (1, t0 + dt.timedelta(minutes=25), 103, "view", 1.0, "{}"),
            (2, t0 + dt.timedelta(hours=6), 201, "view", 1.0, "{}"),
        ],
        2_000_000,
    )

    # ---- incarnation 2: same checkpoint, availableNow ----------------
    q2 = query("post").trigger(availableNow=True).start()
    assert q2.awaitTermination(300), "resume drain did not finish"
    q2.stop()
    post = spark.read.parquet(outdir).toPandas()
    post = post[post.incarnation == "post"]
    final = post[post.batch_id == post.batch_id.max()]
    u1 = final[final.user_id == 1]
    assert len(u1) == 1, (
        "session merge state lost: user 1 shows "
        f"{len(u1)} sessions after the restart: {u1.to_dict('records')}"
    )
    assert int(u1.n_events.iloc[0]) == 3, (
        f"session fragment: n_events {int(u1.n_events.iloc[0])} != 3"
    )
    assert u1.session_start.iloc[0] == "2024-01-01 12:00:00", (
        "merged session lost its pre-kill start: "
        f"{u1.session_start.iloc[0]}"
    )


def test_stream_stream_join_buffer_survives_kill_and_resume(spark, tmp_path):
    """Fifth and last stateful surface across a restart: the
    STREAM-STREAM JOIN buffer. A click consumed BEFORE the kill is
    buffered in the join state awaiting a future purchase; the matching
    purchase arrives only AFTER the restart. The pair can form only if
    the buffered side survived the checkpoint — lose it and the join
    silently emits nothing (no error, just a missing row: the worst
    failure shape)."""
    import datetime as dt
    import time

    import spark_etl_pipeline_spark.streaming.windows as w

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "src"
    outdir = str(tmp_path / "emissions")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows, mtime):
        p = str(src / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))
        os.utime(p, (mtime, mtime))

    # b1: the click only — it must sit in the join buffer across the kill
    write_file("b1", [(1, t0, 101, "click", 1.0, "{}")], 1_000_000)

    orig = w.events_stream

    def staged_stream(s, sf_dir):
        return (
            s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{sf_dir}/b*")
        )

    w.events_stream = staged_stream
    try:
        def query(sink_name):
            out = w.stream_stream_join(spark, str(src))

            def sink(bdf, bid):
                (
                    bdf.withColumn("incarnation", F.lit(sink_name))
                    .write.mode("append")
                    .parquet(outdir)
                )

            return (
                out.writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
            )

        q1 = query("pre").trigger(processingTime="0 seconds").start()
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q1.lastProgress
            if p and int(p["numInputRows"]) > 0:
                break
            time.sleep(0.05)
        q1.stop()
        q1.awaitTermination(60)
        import os as _os

        pre_rows = 0
        if _os.path.isdir(outdir):
            df = spark.read.parquet(outdir)
            pre_rows = df.where("incarnation = 'pre'").count()
        assert pre_rows == 0, (
            "premise lost: a pair emitted before the purchase existed"
        )

        # the matching purchase lands only after the kill: click.ts is
        # inside [purchase.ts - 1h, purchase.ts), so the buffered click
        # is the only possible match source
        write_file(
            "b2",
            [(1, t0 + dt.timedelta(minutes=30), 201, "purchase", 9.0, "{}")],
            2_000_000,
        )

        q2 = query("post").trigger(availableNow=True).start()
        assert q2.awaitTermination(300), "resume drain did not finish"
        q2.stop()
    finally:
        w.events_stream = orig

    got = spark.read.parquet(outdir).toPandas()
    pairs = sorted(
        (int(r.purchase_id), int(r.click_id)) for r in got.itertuples()
    )
    assert pairs == [(201, 101)], (
        "join buffer lost across restart — expected the pre-kill click "
        f"to match the post-restart purchase; got {pairs}"
    )
