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
STATE_SCHEMA = "n bigint, total double"


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

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
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
