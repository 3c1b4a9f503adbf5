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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
    {SYNTH_PARTS} executor-side InputPartitions, no driver
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
