"""Unit tests for the declarative DQ-audit helpers on hand-built frames
(the registered dq_audit query is oracle-verified; these pin the rule
semantics — especially the NULL-counts-as-violation convention)."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_etl_pipeline_spark.operators.profile import (
    audit_referential,
    audit_rules,
    audit_unique,
)


def test_audit_rules_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1.0,), (-2.0,), (None,), (3.0,)], "x double"
    )
    out = audit_rules(df, "t", [("x_nonneg", F.col("x") >= 0)]).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.table_name, row.rule) == ("t", "x_nonneg")
    assert row.n_checked == 4
    assert row.n_violations == 2  # -2.0 and NULL


def test_audit_rules_multiple_rules_single_pass(spark):
    df = spark.createDataFrame([(1, "a"), (60, "b"), (5, None)], "q int, s string")
    out = {
        r.rule: r.n_violations
        for r in audit_rules(
            df,
            "t",
            [
                ("q_in_range", F.col("q").between(1, 50)),
                ("s_not_null", F.col("s").isNotNull()),
            ],
        ).collect()
    }
    assert out == {"q_in_range": 1, "s_not_null": 1}


def test_audit_unique(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (3,), (3,)], "k int")
    row = audit_unique(df, "t", "k").collect()[0]
    assert row.n_checked == 6
    assert row.n_violations == 3  # 6 rows - 3 distinct


def test_audit_referential(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = audit_referential(child, parent, "fk", "pk", "child.fk_refs_parent").collect()[0]
    assert row.table_name == "child"
    assert row.n_checked == 4
    assert row.n_violations == 2  # both orphan 9s count
