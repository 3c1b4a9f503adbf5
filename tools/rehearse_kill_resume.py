#!/usr/bin/env python
"""Cross the random-corpus fuzzer with the kill-and-resume protocol
(VERDICT r14 task 5).

The r13 restart-exactness tests run on FIXED synthetic inputs placed
by hand around the kill; the fuzz corpora (``tools/stage_random.py``)
have only ever exercised batch reads and full uninterrupted drains.
This tool drives a seeded random corpus through the kill-resume
protocol on six stateful surfaces — the five r13 surfaces plus the
``applyInPandasWithState`` value-state profiles:

1. ``profiles``      — applyInPandasWithState value state
2. ``idle_timer``    — EventTimeTimeout session summaries
3. ``dedup_replay``  — dropDuplicatesWithinWatermark seen-keys state
                       (the staging plants cross-file replays of
                       recent events so the resumed query must absorb
                       duplicates whose first sighting was pre-kill)
4. ``session_merge`` — built-in session_window merge state
5. ``ss_join``       — stream-stream join buffers
6. ``upsert``        — the order-independent latest-state snapshot sink

Protocol per surface: the corpus events are staged as ~12 single-file
micro-batches (``maxFilesPerTrigger=1``, so both runs see the same
batch sequence); the KILLED run starts with a processing-time trigger,
is stopped after at least one committed batch, and resumes from the
same checkpoint with ``availableNow``; the REFERENCE is either an
uninterrupted drain of the identical input into a separate sink
(append surfaces, via the native exactly-once parquet file sink) or
the batch oracle (update-mode profiles / the upsert snapshot, where
per-key finals are the contract). A mismatch means state did NOT
resume exactly where the kill left it — on a distribution the fixed
fixtures never probed.

    python tools/rehearse_kill_resume.py [--seed 33] [--workdir DIR]
        [--provider hdfs|rocksdb] [--kill-after K] [--surfaces NAME ...]
        [--corpus-dir PRE_STAGED]

``--kill-after`` (r15) sweeps the RESTART BOUNDARY: the killed
incarnation stops only after at least K data-bearing batches have
committed, so the kill-point matrix probes first/mid/last boundaries
instead of the single after-first-batch point the r14 protocol used
(the r14 session-composition bug was a batch-boundary artifact — one
kill point is one boundary). ``--surfaces`` narrows a matrix cell to
the surfaces under test.

Prints one JSON object {surface: {match, rows, killed_batches, err}}
and exits non-zero on any mismatch; the per-round artifact is saved
as ``REHEARSAL_r*_fuzz.json`` by the round script that invokes it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCH_FILES = 12
EVENT_COLS = ["event_id", "user_id", "ts", "event_type", "value", "props"]


def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.astype(str)
        .sort_values(by=list(pdf.columns))
        .reset_index(drop=True)
    )


def frames_equal(a, b) -> bool:
    ca, cb = canon(a), canon(b)
    return list(ca.columns) == list(cb.columns) and ca.equals(cb)


def stage_batches(spark, corpus_dir: str, workdir: str) -> str:
    """Corpus events as N single-file micro-batches + planted replays.

    The replay file duplicates a sample of the NEWEST events (their
    dedup state is still inside the watermark horizon at end of
    stream) and is mtime-ordered LAST, so with one-file-per-trigger
    the duplicates arrive after their originals — and, in the killed
    run, after the restart.
    """
    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.plans.registry import table

    staged = os.path.join(workdir, "staged")
    ev = table(spark, corpus_dir, "events").select(*EVENT_COLS)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    path = os.path.join(staged, "events.parquet")
    # TIME-ORDERED batches (range-partitioned on ts): with random
    # row-to-file assignment every file spans the whole corpus range,
    # so batch 1 drives the watermark to (corpus max - delay) and
    # batches 2..N arrive ~entirely late — the watermarked surfaces
    # then exercise state on <10% of the corpus (first-draft finding:
    # 105 of 1020 dedup emissions). Contiguous ranges advance the
    # watermark progressively, the way a real stream's files do.
    ev.repartitionByRange(N_BATCH_FILES, "ts").write.mode(
        "overwrite"
    ).parquet(path)
    # deterministic listing order = batch order: mtime-stagger the
    # originals in part-number order (range partition k holds the
    # k-th time slice)
    parts = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    base = 1_000_000
    for i, f in enumerate(parts):
        os.utime(os.path.join(path, f), (base + i, base + i))
    # plant replays AFTER their originals: the 20 newest events as one
    # more file, mtime-ordered LAST — the duplicates arrive after the
    # (killed run's) restart, inside the watermark horizon, so only a
    # RECOVERED seen-keys state can absorb them
    before = set(os.listdir(path))
    replays = ev.orderBy(F.col("ts").desc()).limit(20)
    replays.coalesce(1).write.mode("append").parquet(path)
    new = [
        f
        for f in set(os.listdir(path)) - before
        if f.endswith(".parquet")
    ]
    assert len(new) == 1, new
    os.utime(os.path.join(path, new[0]), (base + 100, base + 100))
    return staged


def staged_events_stream(max_files: int = 1):
    """An events_stream twin over the staged directory with bounded
    batches — patched over the engine's source hook so every surface
    under test runs its UNMODIFIED operator code."""

    from spark_etl_pipeline_spark.streaming import source

    def reader(spark, sf_dir, ts_col="ts", table_name="events"):
        path = f"{sf_dir}/{table_name}.parquet"
        schema = spark.read.parquet(path).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .format("parquet")
            .load(f"{sf_dir}/{table_name}.*")
        )
        return source.guard_event_time(
            source.normalize_event_time(stream, ts_col), ts_col
        )

    return reader


def run_stream(builder, sink_dir: str, ckpt: str, kill: bool,
               foreach=None, output_mode: str = "append",
               kill_after: int = 1) -> int:
    """One query incarnation pair: killed-then-resumed, or straight
    availableNow drain. Returns the number of data-bearing batches the
    killed incarnation committed before the stop (0 for kill=False).

    ``kill_after`` places the restart boundary: the killed incarnation
    stops only after AT LEAST that many batches with input rows have
    committed (VERDICT r14 task 2 — the r14 session-composition bug
    was precisely a batch-boundary artifact, and a single early kill
    point probes exactly one boundary; the sweep varies k across
    first/mid/last so consolidation effects at EVERY position get a
    reference comparison). The stop is asynchronous, so the actual
    committed count can exceed ``kill_after`` — the caller records the
    measured count, and a count >= the request is the premise check.
    """
    def start(trigger_kwargs):
        df = builder()
        w = df.writeStream
        if foreach is not None:
            w = w.foreachBatch(foreach)
        else:
            w = w.format("parquet").option("path", sink_dir)
        return (
            w.outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    committed = 0
    if kill:
        q1 = start({"processingTime": "0 seconds"})
        deadline = time.time() + 240
        while time.time() < deadline:
            committed = len(
                [p for p in q1.recentProgress if int(p["numInputRows"]) > 0]
            )
            if committed >= kill_after:
                break
            time.sleep(0.05)
        q1.stop()
        q1.awaitTermination(120)
        # recount after the stop settles — batches kept committing
        # between the poll and the stop call
        committed = len(
            [p for p in q1.recentProgress if int(p["numInputRows"]) > 0]
        )
        if committed < kill_after:
            raise RuntimeError(
                f"kill landed after only {committed} committed batches "
                f"(requested >= {kill_after}) — the deadline expired "
                "before the stream reached the requested boundary"
            )
    q2 = start({"availableNow": True})
    if not q2.awaitTermination(600):
        q2.stop()
        raise RuntimeError("drain did not finish inside 600s")
    q2.stop()
    return committed


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--workdir", default="/tmp/spark_graft_kill_resume")
    p.add_argument("--src", default="/root/testdata/sf0.001")
    p.add_argument(
        "--provider",
        choices=["hdfs", "rocksdb"],
        default="hdfs",
        help="state store provider for every query in the sweep — "
        "rocksdb crosses this protocol with the store a production "
        "deployment runs (tests/test_rocksdb_state.py rationale)",
    )
    p.add_argument(
        "--kill-after",
        type=int,
        default=1,
        help="restart boundary: minimum committed data-bearing batches "
        "before the kill (VERDICT r14 task 2 — sweep across "
        "first/mid/last; the corpus stages ~13 single-file batches)",
    )
    p.add_argument(
        "--corpus-dir",
        default=None,
        help="use a pre-staged corpus directory instead of staging one "
        "from --seed (r15: feed a hostile-damaged random corpus — e.g. "
        "the times mode's DST instants — through the stateful "
        "surfaces with a restart boundary)",
    )
    p.add_argument(
        "--surfaces",
        nargs="*",
        default=None,
        help="run only these surfaces (default: all six) — the "
        "kill-point matrix targets idle_timer, the surface whose "
        "boundary bug the r14 cross found",
    )
    a = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import spark_etl_pipeline_spark.streaming.stateful as st
    import spark_etl_pipeline_spark.streaming.windows as wd
    from spark_etl_pipeline_spark.streaming import incremental as inc
    from spark_etl_pipeline_spark.streaming.windows import session
    from tools.stage_random import stage

    shutil.rmtree(a.workdir, ignore_errors=True)
    os.makedirs(a.workdir, exist_ok=True)
    if a.corpus_dir:
        # pre-staged (possibly hostile-damaged) corpus: the r15
        # cross-axis runs feed a times-damaged random corpus through
        # the stateful surfaces — DST-transition and extreme-but-legal
        # instants meeting watermarks, timers, and a restart boundary
        # is a joint neither the batch sweeps nor the seeded kill
        # protocol covers alone. The ingest guard still applies (the
        # pre-epoch/far-future garbage never reaches a watermark; the
        # DST instants pass the gate by design).
        corpus = a.corpus_dir
    else:
        corpus = os.path.join(a.workdir, f"corpus_seed{a.seed}")
        stage(a.src, corpus, a.seed)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    if a.provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    staged = stage_batches(spark, corpus, a.workdir)
    # batch twin of the staged stream, INCLUDING the stream's ingest
    # guard (pre-epoch / future timestamps never reach a watermark, so
    # they must not reach the batch oracle either). The planted replay
    # rows stay IN: profiles counts every arriving row (no dedup in
    # that operator — stream and oracle must both see the replays),
    # and the upsert argmax is invariant to exact-duplicate rows.
    from spark_etl_pipeline_spark.streaming.source import guard_event_time

    batch_events = guard_event_time(
        spark.read.parquet(f"{staged}/events.parquet"), "ts"
    )

    # patch the source hook: every surface reads the staged batches
    orig_st, orig_wd = st._events_stream, wd.events_stream
    st._events_stream = staged_events_stream()
    wd.events_stream = staged_events_stream()

    results: dict[str, dict] = {}

    killed_batches: dict[str, int] = {}

    def surface(name):
        def deco(fn):
            if a.surfaces is not None and name not in a.surfaces:
                return
            try:
                match, rows = fn()
                results[name] = {"match": bool(match), "rows": int(rows),
                                 "err": None}
            except Exception as exc:
                results[name] = {"match": False, "rows": 0,
                                 "err": f"{type(exc).__name__}: {exc}"}
            if name in killed_batches:
                results[name]["killed_batches"] = killed_batches[name]
            print(f"[kill-resume] {name}: {results[name]}", file=sys.stderr)
        return deco

    def dirs(name):
        d = os.path.join(a.workdir, name)
        return (os.path.join(d, "killed_out"), os.path.join(d, "killed_ckpt"),
                os.path.join(d, "ref_out"), os.path.join(d, "ref_ckpt"))

    def append_surface(name, builder):
        """Killed+resumed vs uninterrupted, native parquet sink both."""
        ko, kc, ro, rc = dirs(name)
        killed_batches[name] = run_stream(
            builder, ko, kc, kill=True, kill_after=a.kill_after
        )
        run_stream(builder, ro, rc, kill=False)
        killed = spark.read.parquet(ko).toPandas()
        ref = spark.read.parquet(ro).toPandas()
        return frames_equal(killed, ref) and len(ref) > 0, len(killed)

    @surface("profiles")
    def _profiles():
        # update-mode: final per-user row == batch aggregate (finite
        # values only, mirroring the operator's running total)
        ko, kc, _, _ = dirs("profiles")

        def sink(bdf, bid):
            bdf.write.mode("append").parquet(ko)

        killed_batches["profiles"] = run_stream(
            lambda: st.running_user_profiles(spark, staged),
            ko, kc, kill=True, foreach=sink, output_mode="update",
            kill_after=a.kill_after,
        )
        killed = spark.read.parquet(ko).toPandas()
        # last emission per user (highest n_events) == final state
        final = (
            killed.sort_values("n_events")
            .groupby("user_id", as_index=False)
            .last()[["user_id", "n_events", "total_value"]]
        )
        final["total_value"] = final["total_value"].round(6)
        # finite-only SUM with all-damaged groups NULL (the operator's
        # fuzz-seed-7 contract), NOT 0.0
        want = (
            batch_events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(
                    F.when(
                        F.col("value").isNotNull()
                        & ~F.isnan("value")
                        & (F.abs("value") != float("inf")),
                        F.col("value"),
                    )
                ).alias("total_value"),
            )
            .toPandas()[["user_id", "n_events", "total_value"]]
        )
        want["total_value"] = want["total_value"].round(6)
        return frames_equal(final, want) and len(want) > 0, len(final)

    @surface("idle_timer")
    def _idle():
        def build():
            stream = st._events_stream(spark, staged).withWatermark(
                "ts", "10 minutes"
            )
            return st.idle_session_summaries(stream, gap="30 minutes")

        # compare CLOSED sessions only — the operator's restart-exact
        # product. Open-session progress rows are per-batch telemetry,
        # and the batch GRID is not restart-stable: this very harness
        # measured Spark consolidating two files into the first
        # post-restart batch under maxFilesPerTrigger=1 (which is also
        # what exposed the operator's original boundary-dependent
        # composition — see idle_session_summaries' docstring).
        ko, kc, ro, rc = dirs("idle_timer")
        killed_batches["idle_timer"] = run_stream(
            build, ko, kc, kill=True, kill_after=a.kill_after
        )
        run_stream(build, ro, rc, kill=False)
        killed = spark.read.parquet(ko).filter("closed").toPandas()
        ref = spark.read.parquet(ro).filter("closed").toPandas()
        return frames_equal(killed, ref) and len(ref) > 0, len(killed)

    @surface("dedup_replay")
    def _dedup():
        eq, rows = append_surface(
            "dedup_replay",
            lambda: st.dedup_events_within_watermark(spark, staged),
        )
        # instrument-honesty premise: with time-ordered batches nearly
        # the whole corpus must flow through (and the planted replays
        # be absorbed, not re-emitted) — a thin emission count means
        # the watermark dropped the corpus as late data and the state
        # was never really exercised (first-draft finding)
        n_distinct = batch_events.select("event_id").distinct().count()
        if rows < 0.9 * n_distinct or rows > n_distinct:
            raise RuntimeError(
                f"dedup emitted {rows} of {n_distinct} distinct events "
                "— watermark late-drop or replay leak, not a clean run"
            )
        return eq, rows

    @surface("session_merge")
    def _session():
        def build():
            stream = st._events_stream(spark, staged).withWatermark(
                "ts", "1 hour"
            )
            return (
                session(stream, "ts", "30 minutes", ["user_id"])
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(
                    "user_id",
                    F.col("session_window.start").alias("session_start"),
                    "n_events",
                )
            )
        return append_surface("session_merge", build)

    @surface("ss_join")
    def _join():
        # same operator shape as windows.stream_stream_join (two
        # watermarked sides, user-key + time-range condition, buffered
        # state evicted by watermark+bound) with CORPUS-ADAPTIVE
        # parameters: the engine query's fixed purchase/click sides
        # match zero rows on a random corpus whose type distribution
        # is itself random (seed 33 draws no 'purchase' at all), and a
        # zero-row reference proves nothing about the join buffers.
        # Sides = the two most common event types; bound = span/10
        # clamped to [1h, 72h].
        import datetime as dt

        types = [
            r[0]
            for r in batch_events.groupBy("event_type")
            .count()
            .orderBy(F.desc("count"), "event_type")
            .limit(2)
            .collect()
        ]
        if len(types) < 2:
            raise RuntimeError(f"corpus has <2 event types: {types}")
        lo, hi = batch_events.agg(
            F.min("ts"), F.max("ts")
        ).first()
        hours = int((hi - lo).total_seconds() / 3600 / 10)
        hours = max(1, min(72, hours))

        def build():
            def side(t, alias):
                return (
                    st._events_stream(spark, staged)
                    .filter(F.col("event_type") == t)
                    .withWatermark("ts", "1 hour")
                    .alias(alias)
                )

            return side(types[0], "p").join(
                side(types[1], "c"),
                (F.col("c.user_id") == F.col("p.user_id"))
                & (F.col("c.ts") >= F.col("p.ts")
                   - F.expr(f"INTERVAL {hours} HOURS"))
                & (F.col("c.ts") < F.col("p.ts")),
            ).select(
                F.col("p.event_id").alias("a_id"),
                F.col("c.event_id").alias("b_id"),
            )

        return append_surface("ss_join", build)

    @surface("upsert")
    def _upsert():
        ko, kc, _, _ = dirs("upsert")
        snap = os.path.join(a.workdir, "upsert", "snapshots")

        def build():
            # latest_state_sink's compaction schema: key + the CDC
            # payload columns it re-argmaxes on
            return st._events_stream(spark, staged).select(
                "user_id", "ts", "event_id", "event_type", "value"
            )

        killed_batches["upsert"] = run_stream(
            build, ko, kc, kill=True,
            foreach=inc.latest_state_sink("user_id", snap),
            output_mode="append", kill_after=a.kill_after,
        )
        got = inc.read_snapshot(spark, snap).toPandas()
        # the sink's own ordering: lexicographic max of the full
        # payload struct (ties from replayed identical rows collapse)
        want = (
            batch_events.groupBy("user_id")
            .agg(
                F.max(
                    F.struct("ts", "event_id", "event_type", "value")
                ).alias("s")
            )
            .select(
                "user_id", "s.ts", "s.event_id", "s.event_type", "s.value"
            )
            .toPandas()
        )
        return frames_equal(got, want) and len(want) > 0, len(got)

    st._events_stream, wd.events_stream = orig_st, orig_wd
    spark.stop()
    print(json.dumps(results, indent=1))
    return 0 if all(r["match"] for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
