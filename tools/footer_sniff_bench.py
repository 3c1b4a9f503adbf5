#!/usr/bin/env python
"""Measure `_unified_directory_schema`'s footer sniff at deployment
file counts.

A 100-TB directory implies 10⁴–10⁶ part files; the promoted
footer-union read costs one metadata-only footer read per file on the
driver. This stages N tiny part files across TWO schema generations
(so the union path actually runs, not the homogeneous early-exit),
then times three strategies:

- ``sequential``: plain loop over ``pq.read_schema`` (the warm-local
  winner — each read is ~0.07–0.2 ms of mostly GIL-held parse, so a
  thread pool only adds contention there);
- ``pooled``: 32-thread fan-out (measured 2.5–7× SLOWER than
  sequential on warm local metadata — kept here as the honest negative
  result);
- ``engine``: the shipped adaptive sniff (latency-probe: sequential on
  local, fan-out when per-footer latency says IO-bound).

Plus a ``simulated_store`` section: the same comparison with a 10 ms
GIL-released delay injected per read (an object-store GET's shape) on
a smaller file count — the regime the pool exists for.

    python tools/footer_sniff_bench.py [--files 10000] [--dir /tmp/footer_bench]

Prints one JSON line. Re-runnable; staging is skipped when the
directory already holds the requested count.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor


def stage(out_dir: str, n_files: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    existing = glob.glob(os.path.join(out_dir, "*.parquet"))
    if len(existing) == n_files:
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    # Two generations: gen B adds a column and widens value to double —
    # the drift+widen shape the union reader exists for.
    gen_a = pa.table({"k": pa.array([1], pa.int64()), "value": pa.array([1.0], pa.float32())})
    gen_b = pa.table(
        {
            "k": pa.array([2], pa.int64()),
            "value": pa.array([2.0], pa.float64()),
            "added": pa.array(["x"], pa.string()),
        }
    )
    for i in range(n_files):
        pq.write_table(gen_a if i % 2 else gen_b, os.path.join(out_dir, f"part-{i:06d}.parquet"))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--files", type=int, default=10_000)
    parser.add_argument("--dir", default="/tmp/footer_bench")
    parser.add_argument("--sim-files", type=int, default=1_000)
    parser.add_argument("--sim-latency-ms", type=float, default=10.0)
    args = parser.parse_args(argv)

    import pyarrow.parquet as pq

    import sys

    sys.path.insert(0, ".")
    from spark_etl_pipeline_spark.plans.registry import _unified_directory_schema

    stage(args.dir, args.files)
    files = sorted(glob.glob(os.path.join(args.dir, "*.parquet")))

    t0 = time.perf_counter()
    seq = [pq.read_schema(f) for f in files]
    t_seq = time.perf_counter() - t0
    assert len(seq) == args.files

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=32) as pool:
        pooled = list(pool.map(pq.read_schema, files))
    t_pool = time.perf_counter() - t0
    assert len(pooled) == args.files

    t0 = time.perf_counter()
    schema = _unified_directory_schema(args.dir, [])
    t_engine = time.perf_counter() - t0
    assert schema is not None and len(schema.fields) == 3, schema

    # Object-store regime: a GIL-released delay per read (the shape of
    # an S3/GCS GET) on a smaller count — here the pool's latency
    # hiding is the whole game and sequential is the pathological arm.
    sim = sorted(files)[: args.sim_files]
    delay = args.sim_latency_ms / 1000.0

    def slow_read(f):
        time.sleep(delay)
        return pq.read_schema(f)

    t_sim_seq = t_sim_pool = 0.0
    if sim:
        t0 = time.perf_counter()
        _ = [slow_read(f) for f in sim]
        t_sim_seq = time.perf_counter() - t0
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=32) as pool:
            _ = list(pool.map(slow_read, sim))
        t_sim_pool = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "files": args.files,
                "local": {
                    "sequential_sec": round(t_seq, 3),
                    "pooled32_sec": round(t_pool, 3),
                    "engine_adaptive_sec": round(t_engine, 3),
                    "sequential_ms_per_file": round(1000 * t_seq / args.files, 4),
                },
                "simulated_store": {
                    "files": len(sim),
                    "latency_ms": args.sim_latency_ms,
                    "sequential_sec": round(t_sim_seq, 3),
                    "pooled32_sec": round(t_sim_pool, 3),
                    "speedup": round(t_sim_seq / t_sim_pool, 1) if t_sim_pool else None,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
