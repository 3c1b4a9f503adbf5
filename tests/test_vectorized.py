"""pandas UDFs must agree with their JVM twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.functions.vectorized import (
    jvm_token_count,
    py_token_count,
    py_vector_norm,
)
from tests.conftest import SF_SMOKE


def test_token_count_udf_matches_jvm(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    diff = docs.select(
        (py_token_count("text") != jvm_token_count("text")).alias("neq")
    ).filter("neq")
    assert diff.count() == 0


def test_vector_norm_udf_matches_jvm(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    jvm = F.sqrt(
        F.expr(
            "aggregate(zip_with(v, v, (x, y) -> x * y), "
            "cast(0.0 as double), (s, x) -> s + x)"
        )
    )
    close = emb.select(
        (F.abs(py_vector_norm("v") - jvm) < 1e-12).alias("ok")
    ).filter(~F.col("ok"))
    assert close.count() == 0
