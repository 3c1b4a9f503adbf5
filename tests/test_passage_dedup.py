"""Semantic pins for passage-level dedup beyond the oracle parity check:
the reassembly invariants that make "drop the repeat, keep the rest"
trustworthy as a curation step.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_etl_pipeline_spark.operators.dedup import docs_dedup_passages
from tests.conftest import SF_CORRECTNESS


def test_passage_dedup_invariants(spark):
    out = docs_dedup_passages(spark, SF_CORRECTNESS)
    bad = out.filter(
        (F.col("n_kept") > F.col("n_passages"))
        | (F.col("n_kept") < 0)
        | ((F.col("n_kept") == 0) & (F.col("kept_text") != ""))
        | ((F.col("n_kept") > 0) & (F.col("kept_text") == ""))
    )
    assert bad.count() == 0

    # Every kept text is a subsequence of the doc's own passages in order:
    # cheap proxy — token count of kept_text == n_kept passages' tokens,
    # and total kept passages across the corpus == number of DISTINCT
    # passages (first-wins keeps exactly one occurrence of each).
    from spark_etl_pipeline_spark.operators.dedup import PASSAGE_TOKENS
    from spark_etl_pipeline_spark.operators.text import with_tokens
    from spark_etl_pipeline_spark.plans.registry import table

    docs = with_tokens(table(spark, SF_CORRECTNESS, "documents"))
    n_pass = F.expr(f"CAST(ceil(size(tokens) / {PASSAGE_TOKENS}.0) AS INT) - 1")
    passages = (
        docs.filter(F.size("tokens") > 0)
        .select("doc_id", F.explode(F.sequence(F.lit(0), n_pass)).alias("idx"), "tokens")
        .select(
            F.expr(
                f"concat_ws(' ', slice(tokens, idx * {PASSAGE_TOKENS} + 1, {PASSAGE_TOKENS}))"
            ).alias("ptext")
        )
    )
    n_distinct_passages = passages.distinct().count()
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    assert total_kept == n_distinct_passages


def test_passage_dedup_drops_only_repeats(spark):
    # A corpus with zero repeated passages must pass through unchanged.
    out = docs_dedup_passages(spark, SF_CORRECTNESS)
    # Documents whose passages are all globally unique keep everything;
    # at minimum, SOME doc must be fully kept (the corpus is not 100%
    # boilerplate) and reassembly preserves its original token stream.
    kept_full = out.filter(F.col("n_kept") == F.col("n_passages"))
    assert kept_full.count() > 0
    from spark_etl_pipeline_spark.plans.registry import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    joined = kept_full.join(docs, "doc_id").select(
        "doc_id",
        F.expr("concat_ws(' ', split(trim(text), '\\\\s+'))").alias("norm_text"),
        "kept_text",
    )
    mismatched = joined.filter(F.col("norm_text") != F.col("kept_text"))
    assert mismatched.count() == 0
