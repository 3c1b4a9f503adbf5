#!/usr/bin/env python
"""Empirical scale evidence: the top headline plans at 10× bench data.

Builds a benchmark-only sf1-equivalent dataset (the driver ships
sf0.001/0.01/0.1 only) by replicating sf0.1 ten times with KEY
OFFSETTING, so cardinality structure scales the way TPC-H's own sf
scaling does — 10× orders, 10× parts, 10× documents, with basket sizes
and per-document duplicate structure UNCHANGED:

- ``lineitem``: l_orderkey and l_partkey offset per replica (baskets
  keep their size; the co-purchase graph becomes 10 same-shaped
  components, as sf1's does).
- ``part``: p_partkey offset per replica; p_brand kept, so the BFS
  seed brand has 10× seed parts — seed density constant.
- ``documents``: doc_id offset per replica; every token of replicas
  1..9 is suffixed with a replica tag, so each replica reproduces the
  corpus's internal near-dup structure WITHOUT creating cross-replica
  duplicates (a plain copy would turn every doc into a 10-way exact-dup
  cluster and blow candidate pairs up 45×, which sf1 does not do).

Then times the five most expensive headline queries at both scales with
bench.py's exact methodology (schema-warmed, noop sink, multi-file
layout) and prints one JSON line with per-query sf0.1→sf1 wall ratios.
A ratio near DATA_SCALE (10) is linear scaling on fixed cores; well
below 10 means the base run under-utilized local[32]; well above 10
flags super-linear work. Results are recorded in BASELINE.md.

    python tools/scale_bench.py [--scale 10] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

QUERIES = [
    "graph_reachability",
    "mm_decode_features",
    "docs_dedup_corpus",
    "dedup_minhash_lsh",
    "docs_dedup_incremental",
]
TABLES = ["lineitem", "part", "documents"]
N_FILES = 8  # per-table files at base scale (bench.py layout)

ORDER_OFFSET = 100_000_000
PART_OFFSET = 10_000_000
DOC_OFFSET = 10_000_000


def build_scaled(spark, sf_dir: str, root: str, scale: int) -> None:
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.plans.registry import table

    for name in TABLES:
        base = table(spark, sf_dir, name)
        reps = []
        for i in range(scale):
            r = base
            if name == "lineitem":
                r = r.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * ORDER_OFFSET)
                ).withColumn(
                    "l_partkey", F.col("l_partkey") + F.lit(i * PART_OFFSET)
                )
            elif name == "part":
                r = r.withColumn(
                    "p_partkey", F.col("p_partkey") + F.lit(i * PART_OFFSET)
                )
            elif name == "documents":
                r = r.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * DOC_OFFSET)
                )
                if i > 0:
                    r = r.withColumn(
                        "text",
                        F.expr(f"regexp_replace(text, '(\\\\S+)', '$1_x{i}')"),
                    )
            reps.append(r)
        df = reduce(DataFrame.unionByName, reps)
        df.repartition(N_FILES * scale).write.mode("overwrite").parquet(
            f"{root}/{name}.parquet"
        )
        print(f"[scale] built {name} x{scale}", file=sys.stderr)


def time_queries(spark, qs, sf_dir: str, runs: int) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in QUERIES:
        builder = qs[name]
        builder(spark, sf_dir).schema  # plan analysis / listing warm-up
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"[scale] {sf_dir.rstrip('/').rsplit('/', 1)[-1]} "
              f"{name}: {out[name]:.3f}s", file=sys.stderr)
    return out


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scale", type=int, default=10)
    parser.add_argument("--runs", type=int, default=2)
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_etl_pipeline_spark.plans import registry
    from spark_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale_bench")
    qs = registry.queries()

    # base-scale copy in the same multi-file layout bench.py uses
    base_root = f"/tmp/spark_graft_scale/base_{N_FILES}f"
    scaled_root = f"/tmp/spark_graft_scale/x{args.scale}"
    if not os.path.exists(f"{base_root}/_DONE"):
        from spark_etl_pipeline_spark.plans.registry import table

        for name in TABLES:
            table(spark, args.sf_dir, name).repartition(N_FILES).write.mode(
                "overwrite"
            ).parquet(f"{base_root}/{name}.parquet")
        open(f"{base_root}/_DONE", "w").write("ok")
    if not os.path.exists(f"{scaled_root}/_DONE"):
        t0 = time.monotonic()
        build_scaled(spark, args.sf_dir, scaled_root, args.scale)
        open(f"{scaled_root}/_DONE", "w").write("ok")
        print(f"[scale] dataset built in {time.monotonic() - t0:.1f}s",
              file=sys.stderr)

    # Scale-CORRECTNESS check before timing: the replicas are disjoint
    # same-shaped components, so the exact graph query must return
    # exactly `scale`x the base counts per hop (n_parts and cents both
    # scale linearly; any deviation means the key offsetting leaked
    # edges across replicas or dropped rows).
    base_hops = {
        r["hop"]: (r["n_parts"], r["retail_cents"])
        for r in qs["graph_reachability"](spark, base_root).collect()
    }
    scaled_hops = {
        r["hop"]: (r["n_parts"], r["retail_cents"])
        for r in qs["graph_reachability"](spark, scaled_root).collect()
    }
    for hop, (n, cents) in base_hops.items():
        sn, scents = scaled_hops[hop]
        assert (sn, scents) == (n * args.scale, cents * args.scale), (
            f"hop {hop}: scaled {(sn, scents)} != {args.scale}x base {(n, cents)}"
        )
    print(f"[scale] graph_reachability is exactly {args.scale}x base "
          f"at every hop ({sorted(base_hops)})", file=sys.stderr)

    base = time_queries(spark, qs, base_root, args.runs)
    scaled = time_queries(spark, qs, scaled_root, args.runs)
    report = {
        "data_scale": args.scale,
        "base": base,
        "scaled": scaled,
        "wall_ratio": {
            q: round(scaled[q] / base[q], 2) if base[q] > 0 else None
            for q in QUERIES
        },
    }
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
