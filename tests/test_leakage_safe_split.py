"""Cluster-aware splitting must put zero near-dup pairs across splits —
and the naive per-doc hash split must demonstrably straddle (otherwise
the corpus no longer proves the operator matters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.operators.dedup import (
    connected_components,
    dedup_minhash_lsh,
)
from spark_etl_pipeline_spark.operators.traindata import split_column
from spark_etl_pipeline_spark.plans.registry import table
from tests.conftest import SF_SMOKE


def _straddle_count(spark, assign_df) -> int:
    """Pairs whose two endpoints land in different splits."""
    pairs = dedup_minhash_lsh(spark, SF_SMOKE).select("doc_a", "doc_b")
    a = assign_df.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = assign_df.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )


def test_cluster_split_never_straddles_but_doc_split_does(spark):
    docs = table(spark, SF_SMOKE, "documents")
    pairs = dedup_minhash_lsh(spark, SF_SMOKE).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b")

    by_cluster = (
        docs.join(labels, docs.doc_id == labels.id, "left")
        .withColumn("grp", F.coalesce("label", "doc_id"))
        .select("doc_id", split_column("grp").alias("split"))
    )
    assert _straddle_count(spark, by_cluster) == 0

    by_doc = docs.select("doc_id", split_column("doc_id").alias("split"))
    assert _straddle_count(spark, by_doc) > 0, (
        "per-doc split no longer straddles any dup pair — the corpus "
        "stopped demonstrating the leakage bug this operator prevents"
    )
