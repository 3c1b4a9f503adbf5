"""Salting helpers: salted plans must equal their unsalted twins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.functions import cents
from spark_etl_pipeline_spark.operators.skew import (
    salted_count,
    salted_join,
    salted_sum,
)
from tests.conftest import SF_SMOKE


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_count_matches_plain(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = salted_count(li, ["l_returnflag"], salt=8)
    want = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    assert canon(got) == canon(want)


def test_salted_sum_matches_plain(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = salted_sum(li, ["l_linestatus"], cents("l_quantity"), "qty_c", salt=8)
    want = li.groupBy("l_linestatus").agg(F.sum(cents("l_quantity")).alias("qty_c"))
    assert canon(got) == canon(want)


def test_salted_join_matches_plain(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    got = salted_join(orders, cust, on="o_custkey", salt=4).select(
        "o_orderkey", "c_mktsegment"
    )
    want = orders.join(cust, "o_custkey").select("o_orderkey", "c_mktsegment")
    assert canon(got) == canon(want)


def test_salted_join_rejects_outer_preserving_small_side(spark):
    # right/full would emit each unmatched small-side row once per salt
    # replica — the builder must refuse rather than silently multiply.
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    for how in ("right", "full_outer", "full"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, cust, on="o_custkey", salt=4, how=how)
