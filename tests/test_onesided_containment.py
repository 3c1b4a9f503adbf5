"""One-sided anchor blocking finds the length-skewed planted pair that
two-sided MinHash banding provably misses on the same corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.operators.dedup import (
    PLANTED_DOC_ID,
    _planted_corpus,
    candidate_pairs,
    dedup_containment_onesided,
    lsh_bands,
    minhash_signatures,
    onesided_candidates,
    shingle_set,
)
from spark_etl_pipeline_spark.plans.registry import table
from tests.conftest import SF_SMOKE


def _planted_partners(pairs_df):
    return {
        r["doc_a"]
        for r in pairs_df.filter(F.col("doc_b") == PLANTED_DOC_ID).collect()
    }


def test_planted_pair_found_onesided_missed_twosided(spark):
    docs = table(spark, SF_SMOKE, "documents")
    corpus = _planted_corpus(docs)
    shingles = shingle_set(corpus)

    # the quote doc: shortest shingle-bearing document
    quote_id = (
        docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 3)
        .orderBy("n_chars", "doc_id")
        .select("doc_id")
        .first()["doc_id"]
    )

    onesided = _planted_partners(onesided_candidates(shingles))
    assert quote_id in onesided, "one-sided blocking must recall the quote"

    twosided = _planted_partners(
        candidate_pairs(lsh_bands(minhash_signatures(shingles)))
    )
    assert quote_id not in twosided, (
        "two-sided banding unexpectedly recalls the planted pair — "
        "the planted skew no longer demonstrates the gap"
    )


def test_registered_query_emits_full_containment(spark):
    result = dedup_containment_onesided(spark, SF_SMOKE)
    planted = result.filter(F.col("doc_b") == PLANTED_DOC_ID).collect()
    assert any(r["cont_a"] == 1.0 for r in planted), (
        "quote must be 100% contained in the planted container"
    )
