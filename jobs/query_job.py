#!/usr/bin/env python
"""Submit-able query runner: execute any registered engine query.

Generalizes the reference's one-job-per-pipeline shape (reference
``jobs/etl_job.py``) into a parameterized entry point over the query
registry — every operator in ``SURVEY.md §2`` plus the extension
surface becomes runnable from ``spark-submit`` without writing a job:

    spark-submit jobs/query_job.py --query q1_pricing_summary \\
        --sf-dir /data/tables --out /data/results/q1

    # list what's available
    python jobs/query_job.py --list

Output is parquet by default (``--format csv`` uses the single-file
CSV export — report-sized results only). ``--explain`` prints the
formatted physical plan instead of executing, for plan review in CI.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--query", help="registered query name")
    parser.add_argument("--sf-dir", help="directory holding the parquet tables")
    parser.add_argument("--out", help="output path (omit with --explain)")
    parser.add_argument(
        "--format", choices=("parquet", "csv"), default="parquet",
        help="parquet (default) or single-file CSV for report-sized results",
    )
    parser.add_argument(
        "--explain", action="store_true",
        help="print the formatted physical plan instead of executing",
    )
    parser.add_argument(
        "--list", action="store_true", help="list registered queries and exit"
    )
    args = parser.parse_args(argv)

    from spark_etl_pipeline_spark.plans import registry

    if args.list:
        registry.load_all()
        for name, spec in sorted(registry.REGISTRY.items()):
            doc = spec.doc.splitlines()[0] if spec.doc else ""
            print(f"{name}: {doc}")
        return 0

    if not args.query or not args.sf_dir:
        parser.error("--query and --sf-dir are required (or use --list)")

    registry.load_all()
    spec = registry.REGISTRY.get(args.query)
    if spec is None:
        print(f"unknown query: {args.query!r} (try --list)", file=sys.stderr)
        return 2

    from spark_etl_pipeline_spark.logging import Log4j
    from spark_etl_pipeline_spark.session import get_spark
    from spark_etl_pipeline_spark.sources import (
        write_csv_single_file,
        write_parquet,
    )

    spark = get_spark(f"query_{args.query}")
    log = Log4j(spark)
    df = spec.builder(spark, args.sf_dir)

    if args.explain:
        df.explain("formatted")
        return 0
    if not args.out:
        parser.error("--out is required unless --explain is given")

    if args.format == "csv":
        write_csv_single_file(df, args.out)
    else:
        write_parquet(df, args.out, mode="overwrite")
    log.info(f"{args.query}: wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
