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
        text,
    )
    from spark_etl_pipeline_spark.plans import etl, relational  # noqa: F401
    from spark_etl_pipeline_spark.streaming import windows  # noqa: F401


def queries() -> dict[str, Builder]:
    load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
