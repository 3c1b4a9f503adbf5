"""Custom Python data source (Spark 4 DataSource API).

The reference pipeline's source surface is fixed at what the JVM ships
(JDBC, files — `/root/reference/jobs/etl_jobs.py:21-40`); Spark 4's
Python DataSource API opens that surface to pure-Python connectors that
still parallelize: ``partitions()`` declares the split plan, each
``read(partition)`` runs on an executor, rows stream back through Arrow.
This module implements the pattern end to end with a DETERMINISTIC
synthetic-events generator — the md5-keyed value derivation is
reproducible in ANSI SQL, so the connector's whole read path
(partition planning → executor-side generation → aggregation) is
verifiable against the DuckDB oracle like any other query.

At 100 TB the same shape wraps any sharded external system (REST
pages, message-queue offsets, proprietary file formats): one
InputPartition per shard, no driver-side materialization, natural
executor parallelism.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from spark_etl_pipeline_spark.plans.registry import register

#: Generator spec shared by the source and its oracle.
SYNTH_ROWS = 10_000
SYNTH_PARTS = 8
SYNTH_BUCKETS = 7
SYNTH_MOD = 10_000


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", SYNTH_ROWS))
        self.parts = int(options.get("parts", SYNTH_PARTS))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            digest = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, i % SYNTH_BUCKETS, int(digest[:6], 16) % SYNTH_MOD)


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events")`` — registered per
    session via :func:`register_python_sources`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "id bigint, bucket int, cents bigint"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register_python_sources(spark: SparkSession) -> None:
    """Idempotently register the Python data sources on a session."""
    spark.dataSource.register(SyntheticEventsSource)


@register(
    "src_python_datasource",
    oracle=f"""
    WITH gen AS (
        SELECT i AS id,
               i % {SYNTH_BUCKETS} AS bucket,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 6))
                    AS BIGINT) % {SYNTH_MOD} AS cents
        FROM generate_series(0, {SYNTH_ROWS - 1}) t(i)
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MIN(id) AS BIGINT) AS first_id,
           CAST(MAX(id) AS BIGINT) AS last_id
    FROM gen GROUP BY bucket
    """,
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end drive of the Python DataSource API: the partitioned
    synthetic generator is read through ``spark.read.format(...)`` —
    {SYNTH_PARTS} (``SYNTH_PARTS``) executor-side InputPartitions, no driver
    materialization — and aggregated per bucket. The md5-derived
    payload makes the generated data SQL-reproducible, so the oracle
    replays the identical generation in DuckDB and hash-verifies that
    partition planning and executor-side reads lose/duplicate nothing
    (first/last id per bucket pin the range edges; ``sf_dir`` is
    unused — the source IS the data).
    """
    register_python_sources(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", SYNTH_ROWS)
        .option("parts", SYNTH_PARTS)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.min("id").cast("bigint").alias("first_id"),
        F.max("id").cast("bigint").alias("last_id"),
    )


# ---------------------------------------------------------------------------
# Streaming read path (SimpleDataSourceStreamReader) + exactly-once drain
# ---------------------------------------------------------------------------

STREAM_ROWS = 600
STREAM_BATCH = 250


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-paged micro-batch reader over the same deterministic
    generator: each trigger advances ``pos`` by ``batch`` rows; the
    engine checkpoints the offset, so a restarted query resumes at the
    committed position — the contract every offset-based connector
    (queue consumers, CDC cursors, paginated APIs) must honor."""

    def __init__(self, options: dict):
        self.batch = int(options.get("batch", STREAM_BATCH))
        self.limit = int(options.get("limit", STREAM_ROWS))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        # A LIST, not a generator: the engine pickles the prefetched
        # rows alongside the offset when planning the micro-batch.
        return [
            (
                i,
                i % SYNTH_BUCKETS,
                int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
                % SYNTH_MOD,
            )
            for i in range(start, end)
        ]

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch, self.limit)
        # iter(list): the engine's prefetch cache requires an iterator
        # over materialized rows (a bare list fails next(); a bare
        # generator fails pickling).
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["pos"], end["pos"]))


def _stream_reader(self, schema) -> SyntheticEventsStreamReader:
    return SyntheticEventsStreamReader(self.options)


SyntheticEventsSource.simpleStreamReader = _stream_reader


@register(
    "stream_pysource_drain",
    oracle=f"""
    WITH gen AS (
        SELECT i AS id,
               i % {SYNTH_BUCKETS} AS bucket,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 6))
                    AS BIGINT) % {SYNTH_MOD} AS cents
        FROM generate_series(0, {STREAM_ROWS - 1}) t(i)
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM gen GROUP BY bucket
    """,
)
def stream_pysource_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL micro-batch drive of the custom Python STREAMING source:
    the offset-paged generator is drained through
    ``readStream → parquet sink`` across MULTIPLE ``availableNow``
    restarts sharing one checkpoint — each restart resumes from the
    committed offset, and the final per-bucket aggregate hash-matching
    the oracle proves the connector+checkpoint contract delivers every
    row exactly once across restarts (a duplicated or dropped
    micro-batch would shift counts and cent sums). One extra restart
    past exhaustion pins that a fully-consumed source is a no-op. The
    sink parquet is re-read and eagerly materialized before the temp
    dirs are removed (``sf_dir`` unused — the source IS the data).
    """
    import math
    import shutil
    import tempfile

    register_python_sources(spark)
    tmp = tempfile.mkdtemp(prefix="pystream_drain_")
    out, ck = f"{tmp}/out", f"{tmp}/ck"
    try:
        for _ in range(math.ceil(STREAM_ROWS / STREAM_BATCH) + 1):
            q = (
                spark.readStream.format("synthetic_events")
                .option("batch", STREAM_BATCH)
                .option("limit", STREAM_ROWS)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(300)
            finally:
                q.stop()
        drained = (
            spark.read.parquet(out)
            .groupBy(F.col("bucket").cast("int").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("cents").cast("bigint").alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return drained


# ---------------------------------------------------------------------------
# ORC format-fidelity query (registered driver-checkable row)
# ---------------------------------------------------------------------------


@register(
    "src_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(TRY_CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents,
           CAST(SUM(TRY_CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC format fidelity, driver-checkable: the lineitem table is
    rewritten as ORC (temp dir), read back through the ORC scan, and
    aggregated — hash-matching the PARQUET-side oracle proves the ORC
    write→read path loses nothing (types, row counts, exact values).
    The pytest side (`tests/test_sources.py`) covers pushdown; this
    row puts the format itself under the external correctness gate.
    The aggregate is eagerly materialized before the temp dir is
    removed.
    """
    import shutil
    import tempfile

    from spark_etl_pipeline_spark.plans.registry import table
    from spark_etl_pipeline_spark.sources import read_orc, write_orc

    li = table(spark, sf_dir, "lineitem")
    tmp = tempfile.mkdtemp(prefix="orc_roundtrip_")
    try:
        write_orc(li, f"{tmp}/lineitem")
        back = read_orc(spark, f"{tmp}/lineitem")
        out = (
            back.groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(
                    F.expr("try_cast(round(l_extendedprice * 100) as bigint)")
                )
                .cast("bigint")
                .alias("price_cents"),
                F.sum(F.expr("try_cast(round(l_quantity * 100) as bigint)"))
                .cast("bigint")
                .alias("qty_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
