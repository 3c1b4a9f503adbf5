#!/usr/bin/env python
"""Scale curve for the r11-rewritten ``events_gap_fill_lerp`` frame.

The r11 rewrite replaced ``first(ignorenulls) over (currentRow,
unboundedFollowing)`` — Spark's UnboundedFollowingWindowFunctionFrame
re-scans the partition remainder per row, O(rows²) per key — with
``last(ignorenulls)`` over the DESCENDING running frame (identical
semantics, O(n log n): one extra in-partition sort, no extra shuffle).
The 20k/40k/80k rows-per-key microbench proved the quadratic; this
script records the CURVE at the query's real scale knob, SPINE WIDTH:
the per-key hourly slot count between the series' min and max hour,
which is what the dense ``sequence()`` explode materializes and both
window passes traverse.

Staging: sf0.1 ``events`` (100k rows, 5 event types, 30-day span ≈
720 hourly slots/key) with timestamps stretched BACKWARD from the max
instant — ``ts' = t1 - (t1 - ts)·K`` for K ∈ {1, 10, 100} — so the
span grows to ~7.2k and ~72k slots/key while the row count, key
cardinality, and the epoch gate's validity (min stays ≥ 1990, max
fixed in 2024) all hold. Only the spine widens: exactly the axis the
r11 DST corpus widened when it turned the old frame into a ~90 s
crawl at sf0.01.

For the A/B, the OLD frame shape is reproduced inline at K=1 and
K=10 (at K=100 its projected cost is ~100× the K=10 reading — not
worth an hour of wall to re-prove a measured quadratic).

    python tools/lerp_scale_bench.py [--sf-dir /root/testdata/sf0.1]

Prints ONE JSON line:
    {"metric": "lerp_scale_curve", "points": {"1x": {...}, ...}}

No other timing work may run concurrently (local[32] contention).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def old_quadratic_lerp(spark, sf_dir: str):
    """events_gap_fill_lerp with the PRE-r11 forward frame — the
    O(rows²)-per-key shape the registry-wide plan gate
    (``tests/test_plan_quality.py::test_no_quadratic_window_frames``)
    now rejects. Kept here, outside the registry, purely as the A/B
    arm of the scale measurement."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.operators.timeseries import (
        _CENTS,
        epoch_gated,
    )
    from spark_etl_pipeline_spark.plans.registry import table

    events = epoch_gated(table(spark, sf_dir, "events"))
    hourly = (
        events.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.expr(_CENTS).alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    wseq = Window.partitionBy("event_type").orderBy("h")
    wb = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = wseq.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j = (
        spine.join(hourly, ["event_type", "h"], "left")
        .withColumn("i", F.row_number().over(wseq))
        .withColumn("obs_i", F.when(F.col("n").isNotNull(), F.col("i")))
    )
    prev_i = F.last("obs_i", ignorenulls=True).over(wb)
    prev_c = F.last("cents", ignorenulls=True).over(wb)
    next_i = F.first("obs_i", ignorenulls=True).over(wf)
    next_c = F.first("cents", ignorenulls=True).over(wf)
    frac = (F.col("i") - prev_i).cast("double") / (
        next_i - prev_i
    ).cast("double")
    interp = (
        F.when(F.col("n").isNotNull(), F.col("cents").cast("double"))
        .when(next_i.isNull(), prev_c.cast("double"))
        .otherwise(
            prev_c.cast("double") + (next_c - prev_c).cast("double") * frac
        )
    )
    return j.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        (F.col("cents").cast("double") / 100.0).alias("amount"),
        (interp / F.lit(100.0)).alias("interp_amount"),
        F.when(F.col("n").isNotNull(), F.lit("obs"))
        .when(next_i.isNull(), F.lit("ffill"))
        .otherwise(F.lit("lerp"))
        .alias("fill_kind"),
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-root", default="/tmp/lerp_scale")
    args = ap.parse_args()

    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.plans.registry import REGISTRY, load_all, table
    from spark_etl_pipeline_spark.session import get_spark

    load_all()
    spark = get_spark("lerp-scale-bench")
    builder = REGISTRY["events_gap_fill_lerp"].builder

    points: dict[str, dict] = {}
    for k in (1, 10, 100):
        staged = f"{args.out_root}/x{k}"
        shutil.rmtree(staged, ignore_errors=True)
        ev = table(spark, args.sf_dir, "events")
        if k == 1:
            stretched = ev
        else:
            mx = ev.agg(F.max("ts").alias("t1"))
            stretched = ev.crossJoin(F.broadcast(mx)).select(
                *[c for c in ev.columns if c != "ts"],
                F.expr(
                    "cast(timestamp_micros(unix_micros(cast(t1 as timestamp)) - "
                    "(unix_micros(cast(t1 as timestamp)) - "
                    f"unix_micros(cast(ts as timestamp))) * {k}) "
                    "as timestamp_ntz)"
                ).alias("ts"),
            )
        stretched.write.mode("overwrite").parquet(f"{staged}/events.parquet")

        spine_slots = (
            table(spark, staged, "events")
            .groupBy("event_type")
            .agg(
                (
                    F.floor(
                        (
                            F.unix_micros(F.max("ts").cast("timestamp"))
                            - F.unix_micros(F.min("ts").cast("timestamp"))
                        )
                        / 3_600_000_000
                    )
                    + 1
                ).alias("slots")
            )
            .agg(F.max("slots"))
            .collect()[0][0]
        )

        entry: dict = {"spine_slots_per_key": int(spine_slots)}
        # new (registry) shape: min-of-2 noop writes
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            builder(spark, staged).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        entry["new_frame_sec"] = round(best, 3)
        # old quadratic shape: single run, skipped at 100x (projected
        # ~100x the 10x reading — a measured quadratic, not worth the
        # wall time)
        if k <= 10:
            t0 = time.monotonic()
            old_quadratic_lerp(spark, staged).write.format("noop").mode(
                "overwrite"
            ).save()
            entry["old_frame_sec"] = round(time.monotonic() - t0, 3)
        points[f"{k}x"] = entry
        print(f"[lerp-scale] {k}x: {entry}", file=sys.stderr)

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "lerp_scale_curve",
                "sf_dir": args.sf_dir,
                "points": points,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
