#!/usr/bin/env python
"""Stage HOSTILE copies of a testdata dir for invariance sweeps.

Two layouts the 100-TB world guarantees and the pristine fixtures never
exercise:

- ``shuffled``: same rows, pseudo-randomly reordered (xxhash64 of all
  columns) and split 13 ways — catches any result that silently depends
  on file/row order (non-commutative aggregation, head-of-file
  assumptions). Parquet TIMESTAMP(NANOS) columns are normalized to
  micros by the shared loader before re-write, so both engines read
  the copy identically.
- ``empty``: same schemas, ZERO rows — the cold-start / empty-slice
  layout (a fresh source, an empty date partition, a filter that
  matched nothing upstream). Every query must return its defined
  empty-input result without crashing, and agree with DuckDB on what
  that result IS (0 rows for grouped aggregates, 1 all-NULL row for
  global aggregates, empty joins/windows).
- ``nulls``: same tables with a deterministic ~3% of values in
  non-key scalar columns nulled (xxhash64-seeded per cell), plus ~2%
  of array columns emptied. Both engines see the SAME damaged rows, so
  the DuckDB gate tests cross-engine NULL-semantics AGREEMENT (Spark
  sorts NULLS FIRST on ASC, DuckDB NULLS LAST; null arithmetic,
  null grouping, null joins) — the divergence class that produced the
  round-8 precision splits, probed deliberately.

    python tools/stage_hostile.py --mode shuffled|nulls \
        [--sf-dir /root/testdata/sf0.01] [--out /tmp/sf001_hostile]

Key columns (join/identity: ``*key``, ``*_id``, ``ts``) are never
nulled so the damage changes aggregates and orderings, not the join
topology, keeping result diffs attributable.
"""

from __future__ import annotations

import argparse
import sys

NULL_FRAC = 0.03
EMPTY_ARRAY_FRAC = 0.02
MOD = 1_000_000


def _is_key(col: str) -> bool:
    return col.endswith("key") or col.endswith("_id") or col in ("ts",)


def stage(mode: str, sf_dir: str, out: str, spark=None) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    sys.path.insert(0, ".")
    from spark_etl_pipeline_spark.plans.registry import TABLES, table

    own_session = spark is None
    if own_session:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
    for t in TABLES:
        df = table(spark, sf_dir, t)
        if mode == "empty":
            df = df.limit(0).coalesce(1)
        elif mode == "shuffled":
            df = df.orderBy(
                F.xxhash64(*[F.col(c) for c in df.columns])
            ).repartition(13)
        elif mode == "floats":
            # NaN / +Inf / -Inf into ~1% of non-key float/double cells:
            # the parquet-legal float damage every 100-TB corpus carries
            # (bad upstream math, sensor glitches, div-by-zero leaks).
            row_salt = [F.col(x) for x in df.columns]
            out_cols = []
            for field in df.schema.fields:
                c = field.name
                if _is_key(c) or not isinstance(
                    field.dataType, (T.DoubleType, T.FloatType)
                ):
                    out_cols.append(F.col(c))
                    continue
                coin = F.pmod(F.xxhash64(F.lit(c), *row_salt), F.lit(MOD))
                ftype = field.dataType.simpleString()
                out_cols.append(
                    F.when(
                        coin < int(MOD * 0.005),
                        F.expr(f"cast('NaN' as {ftype})"),
                    )
                    .when(
                        coin < int(MOD * 0.0075),
                        F.expr(f"cast('Infinity' as {ftype})"),
                    )
                    .when(
                        coin < int(MOD * 0.01),
                        F.expr(f"cast('-Infinity' as {ftype})"),
                    )
                    .otherwise(F.col(c))
                    .alias(c)
                )
            df = df.select(*out_cols)
        else:
            # per-cell deterministic coin: hash(col name, WHOLE ROW) —
            # the row fingerprint salt keeps low-cardinality columns
            # from flipping all-or-nothing, and the damage is baked
            # into the parquet so both engines read identical rows.
            # All coins are computed against the ORIGINAL row in one
            # select, never against already-damaged neighbors.
            row_salt = [F.col(x) for x in df.columns]
            out_cols = []
            for field in df.schema.fields:
                c = field.name
                coin = F.pmod(
                    F.xxhash64(F.lit(c), *row_salt), F.lit(MOD)
                )
                if _is_key(c):
                    out_cols.append(F.col(c))
                elif isinstance(field.dataType, T.ArrayType):
                    out_cols.append(
                        F.when(
                            coin < int(MOD * EMPTY_ARRAY_FRAC),
                            F.array().cast(field.dataType),
                        )
                        .otherwise(F.col(c))
                        .alias(c)
                    )
                elif isinstance(
                    field.dataType,
                    (T.StringType, T.DoubleType, T.FloatType,
                     T.IntegerType, T.LongType, T.DateType,
                     T.TimestampType, T.DecimalType),
                ):
                    out_cols.append(
                        F.when(
                            coin < int(MOD * NULL_FRAC),
                            F.lit(None).cast(field.dataType),
                        )
                        .otherwise(F.col(c))
                        .alias(c)
                    )
                else:
                    out_cols.append(F.col(c))
            df = df.select(*out_cols)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"[hostile] staged {t} ({mode})", file=sys.stderr)
    if own_session:
        spark.stop()


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--mode", choices=["shuffled", "nulls", "floats", "empty"],
        required=True
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    a = p.parse_args()
    stage(a.mode, a.sf_dir, a.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
