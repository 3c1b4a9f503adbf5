#!/usr/bin/env python
"""Adjudicate a bench run against the canary-anchored baseline.

BASELINE.md's round-10 gate, applied programmatically instead of by
hand each round: given a candidate ``bench.py`` JSON line (or driver
``BENCH_r*.json`` wrapper) and an anchor (default: the round-10
min-of-2 record embedded below), emit per-query CANARY-NORMALIZED
ratios and a verdict per query:

- normalized ratio = (query_sec * anchor_canary / run_canary)
                     / anchor_query_sec
- ``flag``  : normalized ratio > FLAG_RATIO (default 1.5) — candidate
              code regression, read the plan.
- ``noise`` : |ratio - 1| <= NOISE_BAND (0.05) — below the measured
              same-host noise floor (BASELINE.md: back-to-back totals
              differ 5.5% at equal canaries); not adjudicable.
- ``band``  : everything between — compare the ratio SHAPE across
              queries (uniform & inflation-biased = host band,
              concentrated = code) before blaming a plan.

If the run carries ``io_canary_sec`` and the anchor has one, a second
normalization is printed: CPU-flat-but-IO-high runs are storage-side
host band the CPU canary cannot see (the r9 adjudication gap). The
ratio is CLASSIFIED, not just printed (round 11 — the r10 verdict
found a bare 5.075 reading uninterpreted):

- ``ok``                  : 0.75 <= ratio <= 1.25 — the run saw the
                            same scan-side regime the reference did.
- ``contended``           : 1.25 < ratio <= 2.0 — storage-side host
                            band; read flagged queries with that in
                            mind before blaming a plan.
- ``unreliable_this_run`` : ratio > 2.0 OR < 0.75 — the quiet-host
                            reference does not describe this run's io
                            regime in either direction (protocol
                            change, writeback race, cold cache, or a
                            different /tmp device); the io reading
                            should not be cited for or against any
                            query this run.

Queries whose normalized ratio falls BELOW 1/FLAG_RATIO are listed
under ``suspect_fast`` (round 11): an anomalous speedup can mean lost
work — an empty intermediate, a filter that now prunes everything — so
it gets human review too, though it does not fail the exit-code gate
(a deliberately smaller-sf run against the sf0.1 anchor makes every
query "fast" and is not an error).

Usage:
    python tools/bench_adjudicate.py BENCH_r10.json
    python tools/bench_adjudicate.py run.json --anchor other.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

FLAG_RATIO = 1.5
NOISE_BAND = 0.05
IO_OK_MAX = 1.25
IO_OK_MIN = 0.75
IO_CONTENDED_MAX = 2.0


def classify_io_ratio(ratio: float) -> str:
    """Classify run_io_canary / reference_io_canary (see module doc)."""
    if IO_OK_MIN <= ratio <= IO_OK_MAX:
        return "ok"
    if IO_OK_MAX < ratio <= IO_CONTENDED_MAX:
        return "contended"
    return "unreliable_this_run"

#: Round-10 anchor: per-query MIN of the two back-to-back
#: canary-bearing runs recorded in BASELINE.md (2026-08-15). The
#: io_canary reference is recorded separately once measured on a quiet
#: host; None means "skip the IO normalization".
ANCHOR = {
    "canary_sec": 0.409,
    # quiet-host reference re-recorded in round 11 under the fixed
    # raw-byte-read protocol (bench.py module doc): min of two
    # back-to-back sf0.1 runs, 0.530/0.527 (CPU canaries 0.425/0.408).
    # Comparable ONLY to r11+ bench records — the r10 Spark-scan
    # readings (0.508 quiet / 2.578 raced) measured a different thing.
    "io_canary_sec": 0.527,
    "queries": {
        "q1_pricing_summary": 1.404,
        "q6_forecast_revenue": 0.406,
        "q3_top_orders": 1.641,
        "q5_region_revenue": 1.749,
        "rel_window_running": 0.674,
        "rel_dedup_keyed": 0.861,
        "etl_events_pipeline": 1.405,
        "rel_asof_join": 0.699,
        "dedup_minhash_lsh": 2.089,
        "dedup_simhash": 1.111,
        "dedup_embedding_cosine": 3.143,
        "text_quality_score": 0.351,
        "text_fingerprint": 0.330,
        "sim_topk_cosine": 0.568,
        "sim_ivf_search": 1.092,
        "stream_tumbling_counts": 0.405,
        "stream_session_windows": 0.738,
        "mm_decode_features": 2.272,
        "sim_kmeans": 1.450,
        "text_decontaminate": 0.801,
        "docs_pack_sequences": 0.306,
        "events_weighted_sample": 0.263,
        "docs_dedup_corpus": 2.277,
        "docs_dedup_incremental": 1.956,
        "text_repetition_filter": 1.512,
        "q8_market_share": 1.299,
        "q10_returned_items": 0.836,
        "rel_scd2_history": 0.862,
        "events_sessionize": 0.718,
        "events_gap_fill": 0.674,
        "text_pmi_bigrams": 0.678,
        "graph_reachability": 2.704,
        "docs_bm25_topk": 0.726,
        "docs_source_divergence": 0.733,
        # r12 headline addition (dense-spine window family; BASELINE.md
        # round-12 section): min of the 2026-08-15 quiet-host pair
        # 0.642/0.680 at CPU canaries 0.418/0.396 — canary-comparable
        # to the r10 anchor band (0.409).
        "events_gap_fill_lerp": 0.642,
    },
}


def _load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    # driver BENCH_r*.json wraps the bench line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key (not a bench JSON)")
    # write-path records (--sink parquet) time execution+write+commit;
    # normalizing them against the noop anchor's execution-only seconds
    # would flag every query bogusly — they are documented as NOT part
    # of this gate, so refuse rather than mis-adjudicate
    metric = d.get("metric")
    if metric is not None and metric != "total_wall_sec":
        raise SystemExit(
            f"{path}: metric {metric!r} is not adjudicable against the "
            "noop anchor (only 'total_wall_sec' records are)"
        )
    return d


def adjudicate(run: dict, anchor: dict) -> dict:
    rc = run.get("canary_sec")
    ac = anchor.get("canary_sec")  # pre-r9 records carry no canary
    scale = (ac / rc) if (rc and ac) else 1.0
    rows = {}
    ratios = []
    for name, a_sec in anchor["queries"].items():
        r_sec = run["queries"].get(name)
        # either side's -1.0 is bench.py's errored-query sentinel — a
        # negative anchor must not produce a negative "band" ratio
        if r_sec is None or r_sec < 0 or a_sec is None or a_sec <= 0:
            rows[name] = {"status": "missing_or_errored"}
            continue
        norm = (r_sec * scale) / a_sec
        ratios.append(norm)
        if norm > FLAG_RATIO:
            status = "flag"
        elif norm < 1 / FLAG_RATIO:
            status = "fast"  # anomalous speedup: review, don't gate
        elif abs(norm - 1) <= NOISE_BAND:
            status = "noise"
        else:
            status = "band"
        rows[name] = {
            "raw_sec": r_sec,
            "raw_ratio": round(r_sec / a_sec, 3),
            "norm_ratio": round(norm, 3),
            "status": status,
        }
    out = {
        "canary_scale": round(scale, 4),
        "canary_applied": bool(rc and ac),
        "median_norm_ratio": round(statistics.median(ratios), 3)
        if ratios
        else None,
        "flagged": sorted(
            n for n, r in rows.items() if r.get("status") == "flag"
        ),
        # anomalous speedups (norm < 1/FLAG_RATIO): possible lost work
        # (empty intermediate, over-pruning filter) — human review, not
        # an exit-code failure
        "suspect_fast": sorted(
            n for n, r in rows.items() if r.get("status") == "fast"
        ),
        # run-side queries the anchor has never seen: the gate cannot
        # adjudicate them, and silence would read as "all green" for a
        # query it never examined — list them explicitly
        "unanchored": sorted(
            set(run["queries"]) - set(anchor["queries"])
        ),
        "queries": rows,
    }
    rio, aio = run.get("io_canary_sec"), anchor.get("io_canary_sec")
    if rio and aio:
        ratio = rio / aio
        out["io_canary_ratio"] = round(ratio, 3)
        out["io_canary_status"] = classify_io_ratio(ratio)
        # A mid-run re-stage (bench.py wrote 3.2 GB right before the
        # timed reads) is the staging-races-measurement regime the r11
        # protocol eliminates for the normal path — downgrade the
        # status so the reading is discounted, never trusted as "ok".
        if run.get("io_canary_restaged") and out["io_canary_status"] == "ok":
            out["io_canary_status"] = "restaged_mid_run"
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run", help="bench JSON line file or driver BENCH_r*.json")
    p.add_argument(
        "--anchor",
        help="another bench JSON as the anchor (default: the r10 record)",
    )
    a = p.parse_args()
    run = _load(a.run)
    anchor = _load(a.anchor) if a.anchor else ANCHOR
    result = adjudicate(run, anchor)
    json.dump(result, sys.stdout, indent=1)
    print()
    return 1 if result["flagged"] else 0


if __name__ == "__main__":
    sys.exit(main())
