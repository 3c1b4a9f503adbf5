#!/usr/bin/env python
"""Rehearse the FULL registry concurrently on two directories.

The late-r12 concurrency fix (``tests/test_concurrency.py``) replaced
session-global temp-view binding with parameterized ``spark.sql``
DataFrame args after a measured cross-directory race: the same SQL
front-door builder invoked simultaneously on two directories silently
returned the other directory's rows. The live-race test covers three
representatives; this tool closes the universal claim: EVERY registered
query, invoked at the same instant on two different directories from two
threads of ONE shared SparkSession, returns its own directory's
oracle-correct rows.

Two worker threads run the same query name in lock-step (a
``threading.Barrier`` before each builder call maximises collision
pressure on any session-global state the builder might still touch),
each against its own directory, each compared to its own DuckDB oracle
— the same rows/schema/values comparison the round driver applies
(``tools/rehearse_gate.py``).

    python tools/rehearse_concurrent.py \
        [--dir-a /root/testdata/sf0.01] [--dir-b /root/testdata/sf0.001] \
        [--window 0 (= full registry)] [--names ...]

Prints one JSON object ``{query: {"a": row, "b": row}}`` and exits
non-zero if any side of any query mismatches its oracle.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import threading
import time


def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(
        drop=True
    )


def cells_match(a, b) -> bool:
    a_nan = a is None or (isinstance(a, float) and math.isnan(a))
    b_nan = b is None or (isinstance(b, float) and math.isnan(b))
    if a_nan or b_nan:
        return a_nan and b_nan
    return str(a) == str(b)


def compare(spdf, dpdf) -> dict:
    row: dict = {
        "rows_match": len(spdf) == len(dpdf),
        "schema_match": sorted(spdf.columns) == sorted(dpdf.columns),
        "values_match": False,
        "err": None,
    }
    if row["rows_match"] and row["schema_match"]:
        s, d = canon(spdf), canon(dpdf)
        row["values_match"] = all(
            cells_match(a, b)
            for col in s.columns
            for a, b in zip(s[col].tolist(), d[col].tolist())
        )
    return row


def open_oracle(sf_dir: str, tables):
    import duckdb

    duck = duckdb.connect()
    for t in tables:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            duck.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{path}/*.parquet', union_by_name=true)"
            )
        else:
            duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return duck


def soak(spark, qs, oracles, names, args) -> int:
    """Mixed-soak: N threads, each running every query once in its own
    deterministic shuffle, each call on a deterministic per-(thread,
    query) directory choice. No barrier — the interleaving is whatever
    the scheduler produces, which is exactly the production regime of a
    shared session behind a thread-pooled job runner."""
    import random
    import zlib

    dirs = [args.dir_a, args.dir_b]
    oracle_cache = {d: open_oracle(d, __import__(
        "spark_etl_pipeline_spark.plans.registry", fromlist=["TABLES"]
    ).TABLES) for d in dirs}
    oracle_lock = {d: threading.Lock() for d in dirs}

    failures: list[tuple[str, str, str, dict]] = []
    lock = threading.Lock()
    done = [0]

    def worker(tid: int) -> None:
        order = names[:]
        random.Random(tid).shuffle(order)
        for name in order:
            # builtin hash() is salted per process; crc32 keeps the
            # per-(thread, query) directory choice reproducible
            d = dirs[(tid + zlib.crc32(name.encode())) % 2]
            row: dict = {"err": None}
            try:
                spdf = qs[name](spark, d).toPandas()
                with oracle_lock[d]:
                    dpdf = oracle_cache[d].sql(oracles[name]).df()
                row = compare(spdf, dpdf)
            except Exception as exc:  # noqa: BLE001 — report, don't abort
                row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("values_match")
            )
            with lock:
                done[0] += 1
                if not ok:
                    failures.append((name, f"t{tid}", d, row))
                    print(f"FAIL {name} t{tid} {d}", file=sys.stderr)
                elif done[0] % 50 == 0:
                    print(f"... {done[0]} calls done", file=sys.stderr)

    t0 = time.monotonic()
    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(args.soak_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    total = len(names) * args.soak_threads

    print(
        json.dumps(
            {
                "mode": "soak",
                "threads": args.soak_threads,
                "calls": total,
                "failures": [
                    {"query": n, "thread": t, "dir": d, **row}
                    for n, t, d, row in failures
                ],
                "wall_s": round(wall, 1),
            }
        )
    )
    if failures:
        print(f"SOAK FAILURES: {len(failures)}/{total}", file=sys.stderr)
        return 1
    print(
        f"soak clean: {total} oracle-compared calls across "
        f"{args.soak_threads} mixed threads ({wall:.1f}s)",
        file=sys.stderr,
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dir-a", default="/root/testdata/sf0.01")
    parser.add_argument("--dir-b", default="/root/testdata/sf0.001")
    parser.add_argument(
        "--window", type=int, default=0, help="0 = full registry"
    )
    parser.add_argument("--names", nargs="*")
    parser.add_argument(
        "--soak-threads",
        type=int,
        default=0,
        metavar="N",
        help=(
            "mixed-soak mode: instead of two lock-step threads running "
            "the SAME query, N threads each run the full query list in "
            "a different deterministic shuffle, each call on a "
            "per-(thread,query) deterministic directory — exercising "
            "cross-BUILDER interleavings (UDTF registration, runtime "
            "conf pinning, catalog caches) rather than same-builder "
            "collisions. Every call is still oracle-compared."
        ),
    )
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from spark_etl_pipeline_spark.plans.registry import TABLES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs)
    if args.window:
        names = names[: args.window]

    if args.soak_threads:
        return soak(spark, qs, oracles, names, args)

    barrier = threading.Barrier(2)
    report = {n: {} for n in names}
    lock = threading.Lock()

    def worker(side: str, sf_dir: str) -> None:
        duck = open_oracle(sf_dir, TABLES)
        for name in names:
            row: dict = {
                "rows_match": False,
                "schema_match": False,
                "values_match": False,
                "err": None,
            }
            try:
                barrier.wait(timeout=600)
                spdf = qs[name](spark, sf_dir).toPandas()
                row = compare(spdf, duck.sql(oracles[name]).df())
            except Exception as exc:  # noqa: BLE001 — report, don't abort
                row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            with lock:
                report[name][side] = row
                if len(report[name]) == 2:
                    ok = all(
                        r["rows_match"] and r["schema_match"] and r["values_match"]
                        for r in report[name].values()
                    )
                    print(f"{'PASS' if ok else 'FAIL'} {name}", file=sys.stderr)

    t0 = time.monotonic()
    threads = [
        threading.Thread(target=worker, args=("a", args.dir_a)),
        threading.Thread(target=worker, args=("b", args.dir_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    print(json.dumps(report))
    bad = [
        n
        for n, sides in report.items()
        if not all(
            r.get("rows_match") and r.get("schema_match") and r.get("values_match")
            for r in sides.values()
        )
        or len(sides) != 2
    ]
    if bad:
        print(f"MISMATCH ({len(bad)}): {bad}", file=sys.stderr)
        return 1
    print(
        f"all {len(report)} queries green on BOTH directories "
        f"under lock-step concurrency ({wall:.1f}s)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
