#!/usr/bin/env python
"""Ad-hoc per-query timer for optimization A/B runs (r15).

Times each named registered query with the bench's methodology — same
session factory, noop sink, fresh builder call per pass, per-query min
across N passes — but without the canaries/multifile staging, so a
single query's before/after can be read in seconds instead of a full
bench run. NOT the driver surface; bench.py stays authoritative.

    python tools/time_queries.py --sf-dir /root/testdata/sf0.1 \
        --passes 3 name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from spark_etl_pipeline_spark.plans import registry
    from spark_etl_pipeline_spark.session import get_spark

    spark = get_spark("time_queries")
    qs = registry.queries()

    # untimed warm-up (JIT/codegen/shuffle service)
    qs["q6_forecast_revenue"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in args.names:
        builder = qs[name]
        builder(spark, args.sf_dir).schema  # untimed plan/file-listing warm
        secs = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            builder(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            secs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(secs), "passes": secs}
        print(f"[time] {name}: min {min(secs):.3f} {secs}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
