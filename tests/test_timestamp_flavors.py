"""Timestamp-flavor robustness: µs-NTZ, µs-LTZ, and INT64-NANOS parquet
must all drain through every watermark helper and load via ``table()``.

This data-drift class has bitten twice (INT96 sniffer in r5's bench
layout change; NTZ watermark against the r5 testdata), so the contract
is pinned here: the streaming source layer normalizes whatever flavor
the files carry into a watermarkable LTZ event-time column, and the
batch ``table()`` reader stays loadable and row-complete on all three.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from spark_etl_pipeline_spark.plans.registry import _nanos_columns, table
from spark_etl_pipeline_spark.streaming.source import events_stream
from spark_etl_pipeline_spark.streaming.stateful import (
    dedup_events_within_watermark,
    running_user_profiles,
)
from spark_etl_pipeline_spark.streaming.windows import (
    stream_events_dedup,
    stream_events_tumbling,
    stream_stream_join,
)

N_ROWS = 120
FLAVORS = ["us_ntz", "us_ltz", "int64_nanos"]


def _events_table(flavor: str) -> pa.Table:
    base = 1_700_000_000_000_000  # µs epoch, 2023-11-14T22:13:20Z
    event_ids = list(range(N_ROWS))
    ts_us = [base + i * 600_000_000 for i in event_ids]  # 10-min spacing
    types = ["click", "purchase", "view"]
    cols = {
        "event_id": pa.array(event_ids, pa.int64()),
        "user_id": pa.array([i % 7 for i in event_ids], pa.int64()),
        "event_type": pa.array([types[i % 3] for i in event_ids], pa.string()),
        "value": pa.array([round(i * 0.25, 2) for i in event_ids], pa.float64()),
        "props": pa.array(["{}"] * N_ROWS, pa.string()),
    }
    if flavor == "us_ntz":
        ts = pa.array(ts_us, pa.timestamp("us"))
    elif flavor == "us_ltz":
        ts = pa.array(ts_us, pa.timestamp("us", tz="UTC"))
    else:  # int64_nanos
        ts = pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))
    cols["ts"] = ts
    return pa.table(cols)


@pytest.fixture(scope="module", params=FLAVORS)
def flavor_dir(request, tmp_path_factory):
    """A testdata-shaped sf dir whose events.parquet uses one ts flavor."""
    flavor = request.param
    d = tmp_path_factory.mktemp(f"flavor_{flavor}")
    # version="2.6" keeps ns as INT64 TIMESTAMP(NANOS) instead of
    # coercing — that is the drift case being pinned.
    pq.write_table(_events_table(flavor), d / "events.parquet", version="2.6")
    return flavor, str(d)


def _drain(df, name: str, mode: str = "append"):
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


def test_written_flavor_is_as_intended(flavor_dir):
    flavor, d = flavor_dir
    schema = pq.read_schema(f"{d}/events.parquet")
    t = schema.field("ts").type
    if flavor == "us_ntz":
        assert t == pa.timestamp("us")
    elif flavor == "us_ltz":
        assert t == pa.timestamp("us", tz="UTC")
    else:
        assert t == pa.timestamp("ns")
        assert _nanos_columns(f"{d}/events.parquet") == ["ts"]


def test_table_loads_every_flavor(spark, flavor_dir):
    _, d = flavor_dir
    df = table(spark, d, "events")
    assert df.count() == N_ROWS
    # ts must be usable as a timestamp regardless of flavor
    hours = df.select(F.date_trunc("hour", "ts").alias("h")).distinct().count()
    assert hours > 1


def test_events_stream_is_watermarkable(spark, flavor_dir):
    _, d = flavor_dir
    stream = events_stream(spark, d)
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    # withWatermark must not raise EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    stream.withWatermark("ts", "1 hour")


def test_tumbling_drains_every_flavor(spark, flavor_dir):
    flavor, d = flavor_dir
    _drain(stream_events_tumbling(spark, d), f"flv_tumble_{flavor}", "append")
    got = spark.sql(
        f"SELECT sum(n) AS total FROM flv_tumble_{flavor}"
    ).collect()[0]["total"]
    # watermark-append emits only windows closed by the final watermark;
    # the last window stays open, so expect a strict but near-total count
    assert got is not None and got >= N_ROWS - 12


def test_stateful_and_dedup_drain_every_flavor(spark, flavor_dir):
    flavor, d = flavor_dir
    _drain(
        running_user_profiles(spark, d), f"flv_profiles_{flavor}", "update"
    )
    n_users = spark.sql(
        f"SELECT count(DISTINCT user_id) AS n FROM flv_profiles_{flavor}"
    ).collect()[0]["n"]
    assert n_users == 7

    _drain(
        dedup_events_within_watermark(spark, d), f"flv_dedup_{flavor}", "append"
    )
    n = spark.sql(f"SELECT count(*) AS n FROM flv_dedup_{flavor}").collect()[0]["n"]
    assert n == N_ROWS


def test_stream_stream_join_builds_every_flavor(spark, flavor_dir):
    flavor, d = flavor_dir
    joined = stream_stream_join(spark, d)
    assert joined.isStreaming  # watermark + range condition accepted
    _drain(joined, f"flv_ssj_{flavor}", "append")
    n = spark.sql(f"SELECT count(*) AS n FROM flv_ssj_{flavor}").collect()[0]["n"]
    assert n >= 0  # join cardinality depends on flavor-invariant data; drain ran


def test_stream_events_dedup_glob_every_flavor(spark, flavor_dir):
    flavor, d = flavor_dir
    path = f"{d}/events.parquet"
    nanos = _nanos_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = stream_events_dedup(spark, f"{d}/events.*", schema, nanos)
    _drain(stream, f"flv_gdedup_{flavor}", "append")
    n = spark.sql(f"SELECT count(*) AS n FROM flv_gdedup_{flavor}").collect()[0]["n"]
    assert n == N_ROWS


def test_tumbling_alignment_is_utc_grid_under_hostile_session_tz(spark):
    """r10 Asia/Kathmandu-sweep regression, pinned.

    The driver's bare session inherits the HOST zone. Under a non-UTC
    session zone the streaming path's NTZ->LTZ cast shifts the internal
    micros by the zone offset, and ``F.window``'s epoch-grid alignment
    then regroups tumbling/sliding windows onto offset boundaries — a
    +05:45 zone moved every 1-hour window onto :45 and changed the row
    count (3391 vs 3385 at sf0.01). Whole-hour zones coincide with the
    UTC grid modulo an hour, so the r9 America/New_York sweep could
    not catch this; the batch twins are NTZ end-to-end and were never
    affected. The source builders must force the UTC session zone
    themselves (the ``nanosAsLong`` runtime-conf pattern)."""
    from spark_etl_pipeline_spark.streaming.windows import (
        stream_tumbling_drain,
    )
    from tests.conftest import SF_SMOKE

    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    try:
        out = stream_tumbling_drain(spark, SF_SMOKE).collect()
        assert out
        minutes = {r["window_start"][14:16] for r in out}
        assert minutes == {"00"}, minutes  # UTC/naive 1-hour grid
        # the builder itself must have re-pinned the zone
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_utc_pin_warns_when_overriding_a_non_utc_session(spark, capfd):
    """The pin is a session-wide side effect that outlives the builder
    (stream analysis happens at start(), so it cannot be
    scoped-and-restored); overriding a caller's non-UTC zone must be
    OBSERVABLE on stderr, and pinning an already-UTC session must stay
    silent (the common path cannot spam)."""
    from spark_etl_pipeline_spark.streaming.source import _pin_session_utc

    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        _pin_session_utc(spark)
        err = capfd.readouterr().err
        assert "Asia/Kathmandu" in err and "UTC" in err
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

        _pin_session_utc(spark)  # already UTC: silent
        assert "timeZone" not in capfd.readouterr().err
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_batch_ntz_rendering_is_dst_gap_safe(spark, tmp_path):
    """r11 DST-transition-sweep regression, pinned.

    ``date_format`` on a TIMESTAMP_NTZ column implicitly casts through
    the session zone, and ``date_trunc`` on NTZ returns the zone-bound
    TIMESTAMP type — so under a DST session zone a wall clock inside
    the spring-forward gap comes back SHIFTED (Europe/Dublin renders
    NTZ 2021-03-28 01:30 as 02:30 and its hour-trunc as 02:00).
    Fixed-offset zones round-trip as identity at every instant, which
    is why the r9/r10 offset sweeps (New_York, Kathmandu, Chatham)
    could not catch this. ``registry.table`` must pin the UTC session
    zone at the load path — the batch twin of the r10 streaming pin."""
    from datetime import datetime

    p = tmp_path / "gap.parquet"
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    [datetime(2021, 3, 28, 1, 30)], pa.timestamp("us")
                )
            }
        ),
        str(p),
    )
    spark.conf.set("spark.sql.session.timeZone", "Europe/Dublin")
    try:
        df = table(spark, str(tmp_path), "gap")
        # the load path itself must have re-pinned the zone
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        row = df.select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("fmt"),
            F.date_format(F.date_trunc("hour", "ts"), "HH:mm").alias("h"),
        ).first()
        assert row["fmt"] == "2021-03-28 01:30:00", row
        assert row["h"] == "01:00", row
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
