"""Sources and sinks: parquet / JDBC / CSV, read and write.

Re-expresses the reference's IO surface Spark-first:

- Parquet scan (reference ``jobs/etl_job.py:78-89``) — but reading the
  dataset ROOT and filtering on partition columns, instead of baking a
  partition directory into the path (the reference hardcodes
  ``.../yyyymm=201906/*.parquet``; predicate-based partition pruning
  achieves the same IO skip and stays declarative).
- JDBC scan (``jobs/etl_job.py:92-105``) — extended with
  partitionColumn/numPartitions parallel reads; the reference reads the
  whole table through a single connection, which caps ingest at one
  executor regardless of cluster size.
- JDBC append sink (``jobs/etl_job.py:108-122``), parquet append sink
  (``:441-452``), single-file CSV export (``:426-438``), parquet
  overwrite (``:521-524``).

The JDBC option builders are pure functions so they are unit-testable
without a database; the parquet/CSV paths round-trip in the test suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: Column | None = None,
    schema=None,
) -> DataFrame:
    """Parquet scan with optional projection/filter applied immediately.

    Applying them here (rather than later in the caller's plan) is not
    required for correctness — Catalyst pushes them down anyway — but it
    documents intent: the scan should show PushedFilters + a pruned
    ReadSchema in ``explain``, and partition-column predicates prune
    whole directories before any file IO.

    Pass ``schema`` (a ``StructType``) for any dataset whose schema the
    caller already knows. Two reasons: (1) inference reads file footers
    — on a 100-TB dataset with millions of files that is a real listing
    cost; (2) a born-partitioned table that has not received data yet
    (zero partition directories, just ``_SUCCESS``) cannot be inferred
    at all — the cold-start read fails with UNABLE_TO_INFER_SCHEMA
    unless the schema is supplied. Partition columns present in
    ``schema`` are re-read from directory names and appended after the
    data columns, so use an explicit ``select`` (or ``columns=``) when
    column order matters.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across schema generations (promoted footer union).

    Long-lived datasets gain columns over time, and numeric columns get
    re-declared WIDER when their range outgrows the original type; this
    read reconciles all file footers into the promoted union schema —
    absent columns null-filled, narrower generations served under the
    widened type (float32 → double exactly). ``mergeSchema`` handles
    only the added-column case and HARD-FAILS the widened one
    (CANNOT_MERGE_SCHEMAS), so this delegates to the same
    footer-union logic the engine's own tables use
    (``plans.registry._unified_directory_schema``; renames still need a
    migration). Unifying costs a metadata-only footer read per file, so
    it is a separate reader, not the default: on a 100-TB dataset with
    millions of files, use it at the ingest boundary and write back a
    uniform schema.
    """
    import os

    from spark_etl_pipeline_spark.plans.registry import (
        _nanos_columns,
        _unified_directory_schema,
    )

    reader = spark.read
    if os.path.isdir(path):
        unified = _unified_directory_schema(path, _nanos_columns(path))
        if unified is not None:
            reader = reader.schema(unified)
    return reader.parquet(path)


def jdbc_read_options(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a (parallel) JDBC read.

    With ``partition_column`` + bounds + ``num_partitions``, Spark issues
    one range-predicate query per partition — N connections scanning
    concurrently. Without them the read is a single connection (the
    reference's shape, ``jobs/etl_job.py:99-105``): fine for a small
    dimension, a bottleneck for anything fact-sized.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetchsize),
    }
    if driver:
        opts["driver"] = driver
    partitioned = [partition_column, lower_bound, upper_bound, num_partitions]
    if any(v is not None for v in partitioned):
        if any(v is None for v in partitioned):
            raise ValueError(
                "partitioned JDBC read needs ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """JDBC scan; kwargs as in :func:`jdbc_read_options`."""
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs)).load()


def jdbc_write_options(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str | None = None,
    batchsize: int = 10_000,
    isolation_level: str = "READ_UNCOMMITTED",
) -> dict[str, str]:
    """Options for a JDBC append (reference ``jobs/etl_job.py:108-122``).

    ``batchsize`` controls rows per INSERT batch per partition;
    READ_UNCOMMITTED avoids lock contention for pure-append loads.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
    }
    if driver:
        opts["driver"] = driver
    return opts


def write_jdbc_append(df: DataFrame, **kwargs) -> None:
    """Append to a JDBC table. One connection per partition — size the
    partition count to what the database can absorb (repartition first
    if the upstream stage produced thousands of tiny partitions)."""
    (
        df.write.format("jdbc")
        .options(**jdbc_write_options(**kwargs))
        .mode("append")
        .save()
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink (reference ``jobs/etl_job.py:441-452`` append,
    ``:521-524`` overwrite) + ``partitionBy`` for scale: downstream
    readers prune on the partition columns, and each partition writes
    independently."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_single_file(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file CSV export (reference ``jobs/etl_job.py:426-438``).

    ``coalesce(1)`` deliberately collapses parallelism — this is a
    report-export path for human-sized results, not a data sink. Keep
    fact-scale output in parquet.
    """
    df.coalesce(1).write.mode(mode).option("header", True).option(
        "encoding", "utf-8"
    ).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffled storage for co-located joins.

    Writing both sides of a hot join bucketed (and optionally sorted) by
    the join key lets Spark plan the join with ZERO exchanges — the
    shuffle is paid once at write time instead of on every query. This
    is the storage-layout half of the 100 TB join strategy (the other
    half, AQE + broadcast, handles the dims). Requires saveAsTable (the
    bucket metadata lives in the catalog, not the parquet files).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV scan with a REQUIRED explicit schema.

    Schema inference on CSV triggers an extra full pass over the data
    and types by guesswork — both wrong at scale, so this reader does
    not offer it. PERMISSIVE mode nulls malformed fields instead of
    failing the job; pass mode='FAILFAST' for strict loads.
    """
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", mode)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSON-lines scan with a REQUIRED explicit schema (same rationale
    as :func:`read_csv`; declared-but-absent fields read as null)."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the columnar alternative when the downstream stack is
    Hive/Trino-flavored. Same partitioning contract as
    :func:`write_parquet`; ORC's stripe-level statistics give the same
    predicate-pushdown behavior parquet row groups do.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan with the engine's usual pushdown expectations (filters
    and column pruning reach the stripe reader — asserted in
    tests/test_sources.py)."""
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession, path: str, target_files: int
) -> None:
    """Compact a small-files parquet dataset to ``target_files`` files.

    The small-files problem is the dominant operational failure of
    long-running ingest at scale (every micro-batch appends a few
    files; a year later the table has millions and planning time
    dwarfs IO). Compaction rewrites to a temp directory first and
    atomically swaps via rename, so readers never observe a
    half-rewritten table and a mid-compaction crash leaves the
    original intact. ``coalesce`` (not ``repartition``) avoids a
    shuffle — file merging is pure IO.
    """
    import os
    import shutil
    import uuid

    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


ZORDER_BITS = 16


def zorder_column(c1: Column, c2: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton (Z-order) interleave of two pre-binned non-negative ints.

    Bit i of ``c1`` lands at position 2i+1 and bit i of ``c2`` at 2i, so
    sorting by the result interleaves locality across BOTH dimensions —
    the curve underlying multi-dimensional file clustering. Inputs must
    already be binned to ``[0, 2^bits)`` (see :func:`write_zorder` for
    min/max binning); pure JVM bit arithmetic, codegen-friendly.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def write_zorder(
    df: DataFrame, path: str, col1: str, col2: str, num_files: int
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of two
    columns.

    Single-column range clustering (``repartitionByRange + sort``)
    narrows per-file min/max stats on ONE column; filters on the other
    column still read every file. Z-ordering interleaves both key
    spaces, so each file covers a small rectangle of the 2-D domain and
    row-group/file skipping prunes on EITHER predicate — the layout
    technique behind multi-dimensional OPTIMIZE in lakehouse table
    formats. Binning is min/max-normalized to ``2^bits`` buckets per
    dimension (one tiny stats aggregate, broadcast back); the z value
    is computed per-row in JVM bit arithmetic, used only for layout,
    and not written.
    """
    stats = df.agg(
        F.min(col1).alias("mn1"),
        F.max(col1).alias("mx1"),
        F.min(col2).alias("mn2"),
        F.max(col2).alias("mx2"),
    )
    scale = (1 << ZORDER_BITS) - 1
    binned = (
        df.join(F.broadcast(stats))
        .withColumn(
            "__b1",
            ((F.col(col1) - F.col("mn1")) * scale
             / F.greatest(F.col("mx1") - F.col("mn1"), F.lit(1))).cast("long"),
        )
        .withColumn(
            "__b2",
            ((F.col(col2) - F.col("mn2")) * scale
             / F.greatest(F.col("mx2") - F.col("mn2"), F.lit(1))).cast("long"),
        )
        .withColumn("__z", zorder_column(F.col("__b1"), F.col("__b2")))
        .drop("mn1", "mx1", "mn2", "mx2", "__b1", "__b2")
    )
    (
        binned.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Dirty-ingest CSV scan: (clean_rows, quarantined_rows).

    PERMISSIVE mode with ``columnNameOfCorruptRecord`` keeps the whole
    malformed line in a ``_corrupt`` column instead of silently nulling
    fields (the default) or failing the load (FAILFAST) — the
    production contract for 100 TB ingest, where a 0.001% bad-line
    rate is thousands of lines a day that must be ROUTED (re-parsed,
    alerted on, replayed), never dropped on the floor and never able
    to kill the job. The clean frame drops the marker column; the
    quarantine frame carries the raw line for forensics.

    Note Spark requires the corrupt-record column to be PRESENT in the
    declared schema, and quarantined rows must be materialized from the
    same scan the filter runs on (SPARK-21610: a bare
    ``filter(_corrupt.isNotNull).count()`` over a pruned scan is
    undefined) — hence the explicit select of data columns + marker.
    """
    full_schema = f"{schema}, _corrupt string"
    df = (
        spark.read.schema(full_schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        # one scan serves both splits (and satisfies SPARK-21610's
        # materialize-before-filtering requirement); localCheckpoint
        # rather than cache() so the backing blocks are released by
        # GC when the caller drops the frames — an explicit unpersist
        # hook isn't part of this API's contract
        .localCheckpoint(eager=True)
    )
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    quarantine = df.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
    return clean, quarantine


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines twin of :func:`read_csv_quarantine`: (clean,
    quarantined) with the raw malformed line preserved. JSON adds a
    failure mode CSV doesn't have — a syntactically valid line whose
    TYPE mismatches the schema (e.g. a string where a long is declared)
    also routes to quarantine rather than silently nulling."""
    full_schema = f"{schema}, _corrupt string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .localCheckpoint(eager=True)  # same one-scan/GC-release contract
    )
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    quarantine = df.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
    return clean, quarantine
