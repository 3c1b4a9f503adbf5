"""Data-quality profiling: one-pass per-column statistics.

The pre-flight check every large pipeline runs before trusting a new
drop of data: null ratios, distinct counts, numeric ranges — computed
for ALL columns in a single scan + single aggregate (one row of
struct-shaped aggregates, unpivoted to long form driver-side at plan
construction, not execution). At 100 TB this is the difference between
one pass and one pass per column.

Exact ``count(distinct)`` per column is shuffle-heavy at scale; pass
``approx=True`` to switch every distinct count to HyperLogLog
(``approx_count_distinct``, map-side combinable) — the default stays
exact so the DuckDB oracle can verify the plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.plans.registry import register, table


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Long-form profile: one row per column.

    Output: column, n_rows, n_null, n_distinct, min_str, max_str
    (min/max rendered as strings so one schema fits every column type).
    """
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            # Aggregate on the NATIVE type, render after: casting to string
            # before min/max would compare lexicographically ("10.2" < "9.5")
            # and report wrong numeric ranges.
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_str"),
                    F.col(f"__max_{c}").alias("max_str"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select("n_rows", per_col).select(
        "p.column", "n_rows", "p.n_null", "p.n_distinct", "p.min_str", "p.max_str"
    )


@register(
    "profile_orders",
    oracle="""
    SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table (3 columns, one scan — the
    oracle necessarily re-states it as one UNION branch per column,
    which is exactly the n-pass shape this operator avoids).

    Caveat proved by the oracle: double min/max rendered THROUGH CAST
    must format identically — both engines print shortest-roundtrip
    doubles, verified by the hash match.
    """
    orders = table(spark, sf_dir, "orders")
    return profile(orders, ["o_custkey", "o_orderstatus", "o_totalprice"])
