"""Custom stateful streaming operators.

Beyond the built-in window aggregations (``windows.py``), a real
pipeline needs *arbitrary* per-key streaming state — running profiles,
custom session logic, dedup over unbounded keys. Spark's contract for
that is ``applyInPandasWithState`` (Arrow-batched per-key state
functions) and ``dropDuplicatesWithinWatermark`` (state-bounded
streaming dedup). Both are exercised here on the events stream and
verified in the test suite against their batch equivalents via an
``availableNow`` drain.

Scale notes: state lives in the state store partitioned by key — the
shuffle is on the grouping key and state size is O(distinct keys), so
watermarks/timeouts that expire state are mandatory at 100 TB/day (an
unexpired-state operator eventually OOMs every executor).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_etl_pipeline_spark.streaming.source import events_stream as _events_stream

if TYPE_CHECKING:
    import pandas as pd

PROFILE_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, n_finite bigint, total double"


def running_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running profile via ``applyInPandasWithState``.

    Keeps (event count, value total) per user in the state store and
    emits the updated profile every micro-batch. The state function is
    Arrow-batched: each call receives all of a key's rows in the batch
    as pandas DataFrames — the custom-operator escape hatch when no
    built-in aggregation fits (here the logic is deliberately simple so
    the batch groupBy is an exact oracle for the drain test).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, n_finite, total = state.get if state.exists else (0, 0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # finite values only: pandas .sum() already skips NaN, but
            # a single +-Inf cell would poison the running total forever
            # (and NaN-vs-skip semantics differ from SQL SUM) — damaged
            # measurements drop out of the total while n_events still
            # counts them, mirroring the oracle's CASE filter
            v = pdf["value"]
            import numpy as np

            fin = v[np.isfinite(v)]
            n_finite += len(fin)
            total += float(fin.sum())
        state.update((n, n_finite, total))
        # SQL SUM over zero (finite) observations is NULL, not 0: a
        # user whose every measurement is damaged has an UNKNOWN total,
        # and emitting the 0.0 initial state silently fabricates a
        # value (random-corpus fuzzer seed 7: a one-event user whose
        # only value was -Inf — engine said 0.0, oracle NULL)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total if n_finite else None],
            }
        )

    return (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_events_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on event_id, state-bounded by a watermark.

    ``dropDuplicatesWithinWatermark`` expires each key's dedup state one
    watermark-delay after its event time — duplicates are only expected
    within that horizon (retries, at-least-once sources), so state stays
    bounded no matter how long the stream runs. This is the streaming
    twin of the batch ``dedup_exact`` operator.
    """
    return (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )


SESSION_SUMMARY_SCHEMA = "user_id bigint, n_events bigint, closed boolean"


def idle_session_summaries(
    stream: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user session summaries emitted on INACTIVITY, via
    ``applyInPandasWithState`` + ``EventTimeTimeout``: each batch
    updates the user's running count and re-arms a timeout at
    (max seen event time + gap); when the WATERMARK passes that mark
    with no new events, Spark calls the function one last time with
    ``state.hasTimedOut`` — the flush-on-idle branch — and the closed
    summary is emitted exactly once as state is removed.

    This is the custom-session-close pattern the built-in
    ``session_window`` can't express when the close action is
    side-effectful or the summary needs arbitrary state (last page,
    funnel stage, model features). State is O(active users) and the
    timeout is what bounds it — an idle key cannot linger past
    watermark + gap.

    Session COMPOSITION is decided by event-time gap splitting inside
    the update function, NOT by when timeouts fire: micro-batch
    boundaries are not a stable grid (Spark consolidates batches on
    restart — the r14 fuzz kill-resume crossing measured a resumed
    query taking two files in its first batch under
    ``maxFilesPerTrigger=1``), so anything composition-affecting must
    depend on the data alone. Closed-session rows are therefore
    restart-exact; the per-batch OPEN-session progress rows are
    update-stream telemetry whose granularity follows the batch grid
    by nature.

    The caller must ``withWatermark`` the stream on ``ts`` BEFORE
    calling (event-time timeouts require a watermark).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "closed": [True]}
            )
            return
        n, last_us = state.get if state.exists else (0, 0)
        # EVENT-TIME gap splitting (r14): walk this batch's event times
        # in order and close a session the moment the NEXT event proves
        # the gap elapsed — session COMPOSITION is then a function of
        # the event times alone, not of where micro-batch boundaries
        # fall. The first draft closed sessions only via the timeout,
        # which fires at batch-boundary watermark evaluations; Spark
        # legitimately CONSOLIDATES batches on restart (the fuzz
        # kill-resume crossing caught the first post-restart batch
        # taking two files under maxFilesPerTrigger=1), so a
        # boundary-dependent composition diverged between a killed-and-
        # resumed run and an uninterrupted one. With gap splitting the
        # timeout's only job is flushing the FINAL open session of an
        # idle key. Composition is exact for streams delivered in
        # event-time order across batches (within-batch disorder is
        # sorted here); a cross-batch straggler joins the open session,
        # the same at-arrival semantics every restart sees identically.
        gap_us = _gap_to_ms(gap) * 1000
        closed_ns: list[int] = []
        ts_us: list[int] = []
        for pdf in pdfs:
            # pin the unit before the integer view: Arrow can hand the
            # batch datetime64 in ns today and us under other configs,
            # and a silent unit change would rescale every gap
            vals = pdf["ts"].values.astype("datetime64[ns]").astype("int64")
            ts_us.extend(int(v) // 1000 for v in vals.tolist())
        ts_us.sort()
        for t in ts_us:
            if n > 0 and t - last_us > gap_us:
                closed_ns.append(n)
                n = 0
            n += 1
            last_us = max(last_us, t)
        state.update((n, last_us))
        if closed_ns:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed_ns),
                    "n_events": closed_ns,
                    "closed": [True] * len(closed_ns),
                }
            )
        # re-arm: flush the open session when the watermark passes
        # last event + gap. CLAMP to the current watermark: with
        # multiple micro-batches a key's desired timeout can already
        # lie behind the watermark (a late-ish key in a stream whose
        # watermark other keys advanced) — Spark rejects a timeout in
        # the past, and the correct semantics is "flush at the next
        # opportunity".
        desired = last_us // 1000 + _gap_to_ms(gap)
        state.setTimeoutTimestamp(max(desired, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "closed": [False]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SUMMARY_SCHEMA,
        stateStructType="n bigint, last_us bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _gap_to_ms(gap: str) -> int:
    qty, unit = gap.split()
    scale = {"minute": 60_000, "minutes": 60_000, "hour": 3_600_000,
             "hours": 3_600_000, "second": 1_000, "seconds": 1_000}[unit]
    return int(qty) * scale
