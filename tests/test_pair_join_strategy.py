"""Candidate-pair join-strategy gates for the LSH verifiers.

The pair table is usually tiny (broadcast is right), but on dup-heavy
corpora it can rival the corpus — so both verifiers expose a
``broadcast`` knob (True | False | "auto"-via-AQE). These tests pin
that every strategy is ROW-IDENTICAL (the knob may only ever change the
physical join, never the result) and that the forced-shuffle path
really does avoid a broadcast of the pair side.
"""

from __future__ import annotations

from spark_etl_pipeline_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    candidate_pairs,
    jaccard_verified,
    lsh_bands,
    minhash_signatures,
    shingle_set,
)
from spark_etl_pipeline_spark.operators.similarity import dedup_embedding_cosine
from spark_etl_pipeline_spark.plans.registry import table
from tests.conftest import SF_CORRECTNESS


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jaccard_verified_all_strategies_row_identical(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    shingles = shingle_set(docs)
    pairs = candidate_pairs(lsh_bands(minhash_signatures(shingles)))

    def run(mode):
        return _rows(
            jaccard_verified(pairs, shingles, broadcast=mode).filter(
                f"jaccard >= {JACCARD_THRESHOLD}"
            )
        )

    bcast = run(True)
    assert len(bcast) > 0  # non-vacuous: the corpus does contain dups
    assert run(False) == bcast
    assert run("auto") == bcast


def test_embedding_cosine_all_strategies_row_identical(spark):
    bcast = _rows(dedup_embedding_cosine(spark, SF_CORRECTNESS, broadcast=True))
    assert len(bcast) > 0
    assert _rows(dedup_embedding_cosine(spark, SF_CORRECTNESS, broadcast=False)) == bcast
    assert _rows(dedup_embedding_cosine(spark, SF_CORRECTNESS, broadcast="auto")) == bcast


def test_forced_shuffle_path_has_no_pair_broadcast(spark):
    # broadcast=False must keep the pair side out of any BroadcastExchange
    # (AQE may still broadcast *other* sides; the pair join itself must be
    # a shuffled hash join). ShuffledHashJoin appears twice: one per
    # verify-side join.
    df = dedup_embedding_cosine(spark, SF_CORRECTNESS, broadcast=False)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
