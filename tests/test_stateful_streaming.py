"""applyInPandasWithState + dropDuplicatesWithinWatermark, executed as
real streams (availableNow drain) and checked against batch oracles."""

from __future__ import annotations

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
