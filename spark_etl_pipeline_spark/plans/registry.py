"""Query registry: every engine capability registers itself here.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
*equivalent ANSI SQL* that DuckDB can run on the same parquet tables —
keeping the two in one place is what keeps them in sync. The driver's
correctness gate (``__spark_entry__.queries()`` / ``oracle_sql()``) is
generated straight from this registry.

Determinism rules for oracle-checked queries (both sides must follow them):

- **Money/quantity aggregates use integer-cents arithmetic**:
  ``CAST(round(x * 100) AS BIGINT)`` before SUM, divide back at the end.
  Integer sums are associative, so Spark's partition-order float summation
  and DuckDB's sequential summation produce bit-identical results.
- **Averages** are computed as ``exact_integer_sum / count`` in *double*
  arithmetic (both engines perform one IEEE754 division on identical
  operands).
- **Timestamps** are emitted as formatted strings (Spark reads parquet
  timestamps at µs, DuckDB at ns — raw values would hash differently).
- **Top-k / ranking** always carries a unique-key tiebreak so the surviving
  rows are deterministic.
- Every computed column is aliased identically on both sides (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _nanos_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), from the file footer.

    Spark's vectorized reader rejects nanosecond timestamps outright
    (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong``
    is set — and then it surfaces them as raw nano longs. We sniff the
    footer driver-side (metadata-only read, no data IO) so ``table()`` can
    convert those columns back to real timestamps transparently.
    """
    import glob
    import os

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    candidate = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        candidate = files[0]
    try:
        schema = pq.read_schema(candidate)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table (TESTDATA.md layout) as a DataFrame.

    Nanosecond-timestamp parquet (the driver's ``events`` table) is read
    via the legacy nanos-as-long path and converted to microsecond
    timestamps with integer division (``ts div 1000`` — a double division
    would lose precision above 2^53 nanos ≈ 1970+104 days).
    """
    path = f"{sf_dir}/{name}.parquet"
    nanos = _nanos_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos:
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    return df


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from spark_etl_pipeline_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        profile,
        similarity,
        skew,
        text,
        traindata,
    )
    from spark_etl_pipeline_spark.plans import etl, relational  # noqa: F401
    from spark_etl_pipeline_spark.streaming import windows  # noqa: F401


#: Driver-facing emission order for ``queries()`` / ``oracles()``.
#:
#: The driver's correctness gate checks the first ~50 entries in emission
#: order, so ordering is a verification-coverage decision, not cosmetics.
#: Round-4 rotation: front of the list is exactly the 35 queries WITHOUT
#: a round-3 driver-green row (they were green in round 2, but several of
#: their modules — dedup.py, text.py, relational.py, profile.py — changed
#: since that check), plus every query whose plan or oracle changed in
#: round 4, plus round-4 additions. Back of the list: the round-3 green
#: rows that are untouched this round — if the window clips anything, it
#: clips re-verification of results with a fresh green row on record.
_EMIT_FIRST = (
    # --- driver-green in r2 but not re-checked in r3; modules changed since ---
    "text_chunking",
    "etl_events_pipeline",
    "etl_upsert_merge",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_top_orders",
    "q5_region_revenue",
    "rel_agg_stats",
    "rel_window_rank",
    "rel_window_running",
    "rel_window_frame",
    "dedup_exact",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "dedup_ngram_jaccard",  # calls jaccard_verified, rewritten in r3
    "dedup_fuzzy_levenshtein",
    "mm_frame_sample",
    "text_quality_score",
    "rel_filter_isin",
    "rel_filter_nested_struct",
    "rel_filter_null",
    "rel_project_ops",
    "rel_rename_upper",
    "rel_join_inner_2key",
    "rel_join_left",
    "rel_join_semi",
    "rel_join_anti",
    "rel_join_full",
    "rel_join_cross",
    "rel_union_dedup",
    "rel_dedup_keyed",
    "rel_rollup",
    "rel_cube",
    "rel_pivot",
    "rel_sort_limit",
    # --- plan or oracle changed in round 4 ---
    "text_decontaminate",  # short-doc shingle guard
    "text_repetition_score",  # short-doc bigram guard
    "events_zscore",  # var > 0 NULL guard (both engines)
    "dedup_components",  # connected_components convergence guard
    "text_stratified_sample",  # bounded-window hash pre-filter
    "docs_mixture_sample",  # bounded-window hash pre-filter
    "mm_decode_features",  # real PNG/JPEG header decode with fake fallback
    # --- new in round 4 ---
    "docs_pack_sequences_sharded",
)

_EMIT_LAST = (
    # Driver-green in round 3, untouched in round 4; safe to clip.
    "rel_range_join",
    "rel_asof_join",
    "rel_percentiles",
    "rel_sql_exists",
    "rel_sql_scalar_subquery",
    "rel_sql_not_in",
    "q13_customer_distribution",
    "rel_window_analytics",
    "q19_disjunctive_filter",
    "etl_json_struct",
    "rel_grouping_sets",
    "rel_set_ops",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_time_rollup",
    "stream_interval_join",
    "profile_orders",
    "text_token_stats",
    "text_lang_stats_pandas",
    "text_vocab_topk",
    "sim_ivf_search",
    "sim_kmeans",
    "text_train_test_split",
    "text_pii_scrub",
    "docs_pack_sequences",
    "events_weighted_sample",
    "sim_ann_recall",
    "events_user_sequences",
    "events_rolling_features",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q18_large_orders",
    "docs_length_histogram",
    "mm_resize",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "sim_ann_hyperplane",
    "dedup_embedding_cosine",
    "text_lang_id",
    "text_fingerprint",
    "text_bpe_token_count",
    "text_lang_id_ngram",
)


def _ordered_names() -> list[str]:
    first = [n for n in _EMIT_FIRST if n in REGISTRY]
    last = [n for n in _EMIT_LAST if n in REGISTRY]
    pinned = set(first) | set(last)
    middle = [n for n in REGISTRY if n not in pinned]
    return first + middle + last


def queries() -> dict[str, Builder]:
    load_all()
    return {name: REGISTRY[name].builder for name in _ordered_names()}


def oracles() -> dict[str, str]:
    load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
