"""Incremental materialization: stream → upserted parquet snapshot.

The production pattern for keeping a queryable table continuously
up-to-date from a stream when no transactional table format
(Delta/Iceberg) is available: ``foreachBatch`` turns each micro-batch
into a batch MERGE (``plans.etl.upsert``) against the current snapshot,
written as a NEW immutable generation and atomically re-pointed.

Generation directories (``v0``, ``v1``, ...) + an atomically-renamed
``_LATEST`` pointer file give readers snapshot isolation without a
table format: a reader either sees the old pointer or the new one,
never a half-written directory (the generation is fully written before
the pointer moves). This is exactly the commit protocol Delta's
transaction log generalizes; with Delta/Iceberg available, swap the
body for ``MERGE INTO`` and keep the same call sites.

Scale notes: each micro-batch pays one key-shuffle for the merge join
(zero if snapshot generations are written bucketed on the key — see
``sources.write_bucketed``) and rewrites the snapshot. Full rewrites
are the honest cost of format-less upserts; at 100 TB you partition the
snapshot (e.g. by key range or date) and rewrite only the partitions a
batch touches (``spark.sql.sources.partitionOverwriteMode=dynamic``).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_etl_pipeline_spark.plans.etl import upsert

_LATEST = "_LATEST"


def latest_snapshot_path(snapshot_dir: str) -> str | None:
    """Path of the current snapshot generation, or None before the
    first commit."""
    pointer = os.path.join(snapshot_dir, _LATEST)
    try:
        with open(pointer, encoding="utf-8") as fh:
            return os.path.join(snapshot_dir, fh.read().strip())
    except FileNotFoundError:
        return None


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """The current snapshot as a DataFrame (None before first commit)."""
    path = latest_snapshot_path(snapshot_dir)
    return None if path is None else spark.read.parquet(path)


def _commit_pointer(snapshot_dir: str, generation: str) -> None:
    # write-then-rename: readers see the old or the new pointer, never a
    # partial write (rename is atomic on POSIX within a filesystem)
    pointer = os.path.join(snapshot_dir, _LATEST)
    tmp = pointer + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(generation)
    os.replace(tmp, pointer)


def upsert_snapshot_sink(
    key: str, snapshot_dir: str
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function that merges each micro-batch into a
    versioned parquet snapshot by ``key``.

    Batches must be pre-deduplicated on ``key`` (use
    ``dropDuplicates``/``dropDuplicatesWithinWatermark`` upstream, or an
    aggregation that yields one row per key) — with several rows per key
    in one batch, "which one wins" is not well-defined for a MERGE.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = read_snapshot(spark, snapshot_dir)
        merged = batch_df if current is None else upsert(current, batch_df, key)
        generation = f"v{batch_id}"
        os.makedirs(snapshot_dir, exist_ok=True)
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, generation)
        )
        _commit_pointer(snapshot_dir, generation)

    return apply


def run_stream_upsert(
    stream: DataFrame,
    key: str,
    snapshot_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available input through the upsert sink (availableNow
    trigger: process everything pending, then stop — the batch-job shape
    of an always-on incremental pipeline; drop ``availableNow`` for a
    continuously running query)."""
    (
        stream.writeStream.foreachBatch(upsert_snapshot_sink(key, snapshot_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
