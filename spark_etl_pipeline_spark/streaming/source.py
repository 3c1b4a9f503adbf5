"""Shared streaming source plumbing: schema-sniffed readStream + event-time repair.

Two independent data-drift hazards live at the parquet/stream boundary,
and both have bitten real test data:

1. **INT64 TIMESTAMP(NANOS)** — Spark's vectorized reader rejects it
   unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, and then
   surfaces raw nano longs that must be integer-divided back to
   microsecond timestamps (see ``plans.registry._nanos_columns``).
2. **TIMESTAMP_NTZ** — parquet timestamps written without
   ``isAdjustedToUTC`` infer as ``TimestampNTZType``, which
   ``withWatermark`` rejects outright
   (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``). The cast to LTZ is
   value-preserving ONLY when the session timezone is UTC — the
   engine's own session factory pins it, but the DRIVER builds a bare
   session that inherits the host zone, so the source builders here
   force the conf at runtime (the same pattern ``registry.table`` uses
   for ``nanosAsLong``). Under a non-UTC session the cast shifts the
   internal micros by the zone offset, and ``F.window``'s epoch-grid
   alignment then lands on the UTC grid *as seen from the shifted
   values*: invisible for whole-hour zones (the grids coincide modulo
   an hour — the r9 America/New_York sweep could not catch it), but a
   +05:45 zone regroups every tumbling/sliding window onto :45
   boundaries (the r10 Asia/Kathmandu sweep's finding — batch twins
   stay green because the batch path is NTZ end-to-end and never
   touches the zone). Session windows are gap-based, no epoch grid,
   so they were invariant either way.

``events_stream`` handles both in one place so every watermark helper
(windows, stream-stream join, stateful dedup, profiles) reads the same
normalized stream; ``normalize_event_time`` is the reusable cast for
callers that build their own reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampNTZType

from spark_etl_pipeline_spark.plans.registry import (
    _nanos_columns,
    _unified_directory_schema,
)


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Cast an inferred TIMESTAMP_NTZ event-time column to LTZ.

    ``withWatermark`` requires ``TimestampType`` (local-timezone); parquet
    written without UTC adjustment infers as ``TimestampNTZType``. With the
    session timezone pinned to UTC the cast is value-preserving, so this
    is a schema repair, not a semantic change. No-op on LTZ columns and on
    frames where ``col`` is absent or non-timestamp (e.g. already repaired
    from nanos longs).
    """
    try:
        dtype = df.schema[col].dataType
    except KeyError:
        return df
    if isinstance(dtype, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def repair_nanos(df: DataFrame, nanos: list[str]) -> DataFrame:
    """Convert nanosAsLong bigint columns back to microsecond timestamps."""
    for col in nanos:
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    return df


def guard_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Drop events with garbage event times BEFORE they reach a watermark.

    Watermarks advance to ``max(event time) - delay``: a SINGLE event
    timestamped in the future (clock-skew garbage, a corrupted field)
    pushes the watermark past every real row, evicting join/dedup state
    and silently dropping the rest of the stream — the
    hostile-timestamps sweep demonstrated exactly that with one 2038
    instant. The guard is the standard two-sided ingest rule: reject
    pre-epoch sentinels (epoch-zero "unset" defaults and earlier) and
    anything timestamped after wall-clock now. Mirrors
    ``operators.timeseries.epoch_gated`` (same bounds, batch flavor);
    the streaming oracles carry the same WHERE. A no-op on any sane
    corpus.
    """
    from spark_etl_pipeline_spark.operators.timeseries import TS_EPOCH_LO

    try:
        df.schema[col]
    except KeyError:
        return df
    return df.filter(
        (F.col(col) >= F.lit(TS_EPOCH_LO).cast("timestamp"))
        & (F.col(col) <= F.current_timestamp())
    )


# Shared with registry.table (r11): the batch load path needs the same
# pin — see session.pin_session_utc for both measured hazards.
from spark_etl_pipeline_spark.session import pin_session_utc as _pin_session_utc


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    ts_col: str = "ts",
    table_name: str = "events",
) -> DataFrame:
    """The events table as a bounded file stream, watermark-ready.

    Sniffs the parquet footer for INT64-NANOS columns, reads with the
    legacy nanos path when needed, repairs nanos longs to µs timestamps,
    and normalizes an NTZ event-time column to LTZ — so the returned
    stream accepts ``withWatermark(ts_col, ...)`` no matter which
    timestamp flavor the files carry (µs-LTZ, µs-NTZ, or INT64-NANOS).
    """
    import os

    # The NTZ->LTZ event-time cast and F.window's epoch-grid alignment
    # are value-preserving only under a UTC session zone (module
    # docstring, hazard 2) — force it on the driver's bare session,
    # the same runtime-conf pattern as nanosAsLong below.
    _pin_session_utc(spark)
    path = f"{sf_dir}/{table_name}.parquet"
    nanos = _nanos_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource takes its schema up front and never revisits it,
    # so a directory spanning ingest generations MUST hand it the
    # promoted footer union: single-footer inference here is
    # listing-order dependent — sampling the narrow (float) generation
    # makes every wide (double) file unreadable mid-stream
    # (PARQUET_COLUMN_DATA_TYPE_MISMATCH), the widen-sweep finding.
    schema = None
    if os.path.isdir(path):
        schema = _unified_directory_schema(path, nanos)
    if schema is None:
        schema = spark.read.parquet(path).schema
    # FileStreamSource needs a directory base path; a glob keeps this
    # working when the dataset is a single file as well as a directory
    # of parts.
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/{table_name}.*")
    )
    return guard_event_time(
        normalize_event_time(repair_nanos(stream, nanos), ts_col), ts_col
    )


def stream_from_glob(
    spark: SparkSession,
    src_glob: str,
    schema: StructType,
    nanos: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """readStream over an arbitrary glob with the same two repairs applied.

    For callers that stage their own replay directories (the streaming
    dedup tests) and therefore already hold the schema + nanos sniff.
    """
    # same UTC pin as events_stream (module docstring, hazard 2)
    _pin_session_utc(spark)
    stream = spark.readStream.schema(schema).format("parquet").load(src_glob)
    return guard_event_time(
        normalize_event_time(repair_nanos(stream, nanos), ts_col), ts_col
    )
