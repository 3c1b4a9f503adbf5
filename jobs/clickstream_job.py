#!/usr/bin/env python
"""Submit-able clickstream ETL job — the reference's EP1, Spark-first.

The reference's production entry point is ``spark-submit …
jobs/etl_job.py`` (reference jobs/etl_job.py:39-75 via :545-546); this
is its equivalent over the new engine: config-driven extract →
single-pass transform → gated load. A reference user switches by
pointing this at their existing ``etl_config.json``:

    spark-submit --packages mysql:mysql-connector-java:8.0.15 \\
        jobs/clickstream_job.py --config configs/etl_config.json

Differences from the reference, all deliberate:
- one scan instead of 9 (CASE WHEN family normalization),
- explicit ``--config`` path preferred, with the reference's
  SparkFiles ``*config.json`` scan as the fallback (reference
  dependencies/spark.py:92-112) so the reference's exact submit line
  — ``spark-submit --files configs/etl_config.json
  jobs/clickstream_job.py`` with no ``--config`` flag — works
  unchanged,
- partitioned parquet output (partitionBy TRANSACTION_DATE) so
  downstream readers prune,
- the JDBC read is partitioned when bounds are configured.
"""

from __future__ import annotations

import argparse
import sys


def discover_config() -> str | None:
    """Reference-parity config discovery for ``--files`` submits.

    The reference ships its config to executors/driver with
    ``spark-submit --files configs/etl_config.json`` and then scans
    ``SparkFiles.getRootDirectory()`` for any ``*config.json``
    (reference dependencies/spark.py:92-112). Same behavior here: first
    match in sorted order wins, so a user's exact submit line — no
    ``--config`` flag — works unchanged. Returns None when nothing was
    staged, which is an argparse error upstream.
    """
    import os

    from pyspark import SparkFiles

    root = SparkFiles.getRootDirectory()
    try:
        names = sorted(os.listdir(root))
    except OSError:
        return None
    for name in names:
        if name.endswith("config.json"):
            return os.path.join(root, name)
    return None


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config",
        help=(
            "job config JSON path; omit to discover a --files-staged "
            "*config.json the way the reference job does"
        ),
    )
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="build and explain the plan without executing any sink",
    )
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.config import (
        families_from_config,
        load_config,
        sink_flags,
    )
    from spark_etl_pipeline_spark.logging import Log4j
    from spark_etl_pipeline_spark.plans.etl import clickstream_pipeline
    from spark_etl_pipeline_spark.session import get_spark
    from spark_etl_pipeline_spark.sources import (
        read_jdbc,
        read_parquet,
        write_jdbc_append,
        write_parquet,
    )

    spark = get_spark("clickstream_etl")
    log = Log4j(spark)

    config_path = args.config
    if config_path is None:
        config_path = discover_config()
        if config_path is None:
            parser.error(
                "--config not given and no *config.json staged via --files"
            )
        log.info(f"discovered staged config: {config_path}")
    cfg = load_config(config_path)

    logs = read_parquet(spark, cfg["file"]["load"]["path"])
    # dim source: MySQL in production (reference parity); a parquet
    # export of the dimension is accepted for air-gapped/test runs.
    dim_parquet = cfg.get("file", {}).get("dim_path")
    if dim_parquet:
        dim = read_parquet(spark, dim_parquet)
    else:
        dim = read_jdbc(spark, **cfg["mysql"]["load"])
    out = clickstream_pipeline(logs, dim, families_from_config(cfg))

    if args.dry_run:
        out.explain("formatted")
        log.info("dry run: plan built, no sink executed")
        return 0

    to_jdbc, to_file = sink_flags(cfg)
    if to_jdbc:
        log.info("appending to JDBC sink")
        write_jdbc_append(out, **cfg["mysql"]["save"])
    if to_file:
        log.info("appending partitioned parquet")
        write_parquet(
            out,
            cfg["file"]["save"]["path"],
            mode="append",
            partition_by=["TRANSACTION_DATE"],
        )
    if not (to_jdbc or to_file):
        log.warn("no sink enabled in config; computed nothing")
    return 0


if __name__ == "__main__":
    sys.exit(main())
