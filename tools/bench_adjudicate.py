#!/usr/bin/env python
"""Adjudicate a bench run against the canary-anchored baseline.

BASELINE.md's round-10 gate, applied programmatically instead of by
hand each round: given a candidate ``bench.py`` JSON line (or driver
``BENCH_r*.json`` wrapper) and an anchor (default: the round-14
min-of-2-protocol record embedded below; the single-pass r13 and
2026-08-15 vectors are kept as ``ANCHOR_R13_SINGLEPASS`` /
``ANCHOR_2026_08_15`` for replaying older records), emit per-query
CANARY-NORMALIZED ratios and
a verdict per query:

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

The CPU canary READING itself is classified against the measured
quiet-host band (round 13 — the r12 driver bench carried a 0.357
canary, BELOW every recorded quiet run, and the blind 1.146x scale-UP
manufactured the round's only two flags): ``ok`` inside the band,
``fast_transient`` below it (normalized-only flags move to
``suppressed_flags``; a real regression still flags on its raw ratio),
``unreliable_this_run`` above it (the scale-DOWN can mask a real
regression, so raw-only exceedances are listed under
``masked_raw_flags`` for bracketing-run review). Only ``flagged``
gates the exit code.

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

Round-14 additions: (1) r14+ bench records time every query twice and
``queries`` carries the per-query min — the anchor is already a
per-query min across runs, so the comparison is like-for-like; the raw
passes ride along on each adjudicated row (a flag whose two passes
straddle the line is the transient term visible inside one run).
(2) ``sustained_canary_sec`` (the sprint xxhash fold at 32× rows,
min-of-2) is classified against its own quiet-host band — the r13
host generation ran the headline set ~1.35× at EQUAL sprint canary, a
regime only a ~10 s workload can see. Classification-only; it
contextualizes uniform flag inflation, it never gates or rescales.

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

#: Measured quiet-host CPU-canary band (re-recorded r14; BASELINE.md's
#: canary-band record). A canary OUTSIDE this band in either direction
#: means the host regime differs from everything the anchor describes,
#: so the blind ac/rc multiplier stops being a correction and starts
#: MANUFACTURING results: r12's driver run carried a 0.357 canary
#: (below the then-band) whose 1.146x scale-UP pushed two in-band
#: queries past the flag line — the instrument artifact this
#: classification exists to name (VERDICT r12 task 2). The r12-derived
#: band was [0.39, 0.47]; by r14 three of four fresh quiet readings
#: sat below its floor (0.439/0.366/0.375/0.371 this session,
#: 0.397/0.360/0.394 in the r13 judge bracketing pair), so the floor
#: is re-recorded from the pooled quiet evidence rather than left
#: misclassifying quiet runs as fast transients. r15's five quiet
#: readings (0.373/0.347/0.336/0.356/0.392, BASELINE.md r15 section)
#: put two below the 0.355 floor — the recurrence the r15 watch item
#: named — so the floor widens to cover the pooled minimum (0.336)
#: with margin. The sprint canary's quiet dispersion is now
#: 0.336–0.439 (±13%) while the sustained canary holds 7.5–8.8
#: (±8%) with flat headline totals: on this generation the sustained
#: reading is the more trustworthy host-speed instrument, and
#: sub-floor sprint readings keep their conservative fast-transient
#: handling (normalized-only flags suppressed, raw still decisive).
CPU_BAND_LO = 0.33
CPU_BAND_HI = 0.45

#: Measured quiet-host SUSTAINED-canary band (round 14; BASELINE.md's
#: r14 sustained-canary record — two quiet min-of-2 readings
#: 8.263/7.471 plus contended-context corroboration at 8.5–9.2 under a
#: concurrent 8-thread job; widen as rounds accumulate readings). The
#: sprint canary reads turbo/idle-burst speed and was EQUAL across the
#: two host generations whose headline throughput differed ~1.35× (the
#: r13 re-base finding) — the sustained canary (same xxhash fold, 32×
#: rows, ~8–9 s all-core, min-of-2 in bench.py) is the instrument that
#: can see that regime. A reading ABOVE the band means the host's
#: sustained throughput is slower than every regime the anchor
#: describes: normalized flags on such a run are host-suspect (read
#: them with the sustained ratio in hand before blaming a plan). BELOW
#: the band mirrors the CPU fast-transient hazard at sustained scale.
SUSTAINED_BAND_LO = 6.9
SUSTAINED_BAND_HI = 9.3


def classify_sustained_canary(
    sustained: float | None,
    lo: float = SUSTAINED_BAND_LO,
    hi: float = SUSTAINED_BAND_HI,
) -> str:
    """Classify the run's sustained-canary reading against the band.

    Same taxonomy as :func:`classify_cpu_canary`: ``ok`` inside the
    band, ``fast_transient`` below, ``unreliable_this_run`` above,
    ``absent`` when the run predates the instrument (pre-r14 records).
    Like the CPU band, the sustained band is a HOST-GENERATION
    property: each anchor carries its own (``sustained_band``) and
    adjudicate() classifies against the anchor's band (ADVICE r14) —
    replaying an r14 record after a future host-generation re-base
    must use the r14 generation's band, not the then-current module
    constants (which record only the CURRENT generation).
    Classification-only: the sustained reading CONTEXTUALIZES flags
    (a uniformly-inflated run with sprint-flat/sustained-high canaries
    is the r13 host-generation regime, not a plan regression); it does
    not gate the exit code.
    """
    if not sustained:
        return "absent"
    if lo <= sustained <= hi:
        return "ok"
    return "fast_transient" if sustained < lo else "unreliable_this_run"


def classify_cpu_canary(
    canary: float | None,
    lo: float = CPU_BAND_LO,
    hi: float = CPU_BAND_HI,
) -> str:
    """Classify the run's CPU canary READING against the quiet-host band.

    The band is a HOST-GENERATION property, so each embedded anchor
    carries its own (``cpu_band``) and adjudicate() classifies against
    the anchor's band — replaying a 2026-08-15 record must use that
    generation's [0.39, 0.47], not today's. The module constants are
    the CURRENT generation's record (the default).

    - ``ok``: inside [CPU_BAND_LO, CPU_BAND_HI] — the ac/rc
      normalization interpolates within measured regimes; trust it.
    - ``fast_transient``: BELOW the band — a turbo/idle-burst host ran
      the tiny canary faster than any recorded quiet run; the resulting
      scale-UP inflates every normalized ratio and can manufacture
      flags out of in-band queries. Normalized-only flags are
      suppressed to ``suppressed_flags`` (a real regression still flags
      via its RAW ratio).
    - ``unreliable_this_run``: ABOVE the band — contention beyond any
      recorded regime; the scale-DOWN deflates ratios and can MASK a
      real regression, so raw-only exceedances are surfaced under
      ``masked_raw_flags`` for bracketing-run review.
    - ``absent``: no canary on the run (pre-r9 records) — raw ratios
      only, nothing to classify.
    """
    if not canary:
        return "absent"
    if lo <= canary <= hi:
        return "ok"
    return "fast_transient" if canary < lo else "unreliable_this_run"


def classify_io_ratio(ratio: float) -> str:
    """Classify run_io_canary / reference_io_canary (see module doc)."""
    if IO_OK_MIN <= ratio <= IO_OK_MAX:
        return "ok"
    if IO_OK_MAX < ratio <= IO_CONTENDED_MAX:
        return "contended"
    return "unreliable_this_run"

#: Round-14 anchor (2026-08-16, MIN-OF-2 PROTOCOL): bench.py now
#: times every query twice and reports the per-query min, which
#: measures the WARM regime (pass 2 is systematically faster —
#: page cache + Python workers + per-plan codegen warm; e.g.
#: mm_decode_features 2.2 s cold / 0.37 s warm in every recorded
#: run), so the single-pass r13 anchor stopped being
#: protocol-comparable (a min-of-2 run adjudicated against it reads
#: median ~0.8 with a 10-deep suspect_fast list). Re-based to the
#: per-query min across the two back-to-back final-code sf0.1 runs
#: recorded in BASELINE.md's r14 section (totals 31.29/32.95 s;
#: CPU canaries 0.375/0.371; sustained 8.263/7.471; io
#: 0.693/0.699). canary_sec/io/sustained are the mins of the
#: in-band readings. The superseded single-pass r13 anchor is kept
#: below as ANCHOR_R13_SINGLEPASS for replaying BENCH_r13 and
#: earlier records.
ANCHOR = {
    "canary_sec": 0.371,
    "cpu_band": [CPU_BAND_LO, CPU_BAND_HI],
    "sustained_canary_sec": 7.471,
    # host-generation property, carried per-anchor like cpu_band so
    # replays of this record survive a future band re-base (ADVICE r14)
    "sustained_band": [SUSTAINED_BAND_LO, SUSTAINED_BAND_HI],
    "io_canary_sec": 0.693,
    "queries": {
        "q1_pricing_summary": 0.877,
        "q6_forecast_revenue": 0.363,
        "q3_top_orders": 1.124,
        "q5_region_revenue": 1.469,
        "rel_window_running": 0.42,
        "rel_dedup_keyed": 0.57,
        "etl_events_pipeline": 1.116,
        "rel_asof_join": 0.513,
        "dedup_minhash_lsh": 1.276,
        "dedup_simhash": 0.861,
        "dedup_embedding_cosine": 2.02,
        "text_quality_score": 0.272,
        "text_fingerprint": 0.218,
        "sim_topk_cosine": 0.434,
        "sim_ivf_search": 0.842,
        "stream_tumbling_counts": 0.448,
        "stream_session_windows": 0.489,
        "mm_decode_features": 0.36,
        "sim_kmeans": 1.302,
        "text_decontaminate": 0.722,
        "docs_pack_sequences": 0.218,
        "events_weighted_sample": 0.29,
        "docs_dedup_corpus": 2.131,
        "docs_dedup_incremental": 1.898,
        "text_repetition_filter": 0.874,
        "q8_market_share": 0.985,
        "q10_returned_items": 0.871,
        "rel_scd2_history": 0.549,
        "events_sessionize": 0.527,
        "events_gap_fill": 0.549,
        "text_pmi_bigrams": 0.545,
        "graph_reachability": 2.968,
        "docs_bm25_topk": 0.753,
        "docs_source_divergence": 0.579,
        "events_gap_fill_lerp": 0.655,
    },
}

#: SUPERSEDED round-13 anchor (2026-08-16, single-pass protocol): per-query MIN of the three
#: back-to-back sf0.1 runs recorded in BASELINE.md's r13 canary-band
#: section (totals 59.99/54.66/50.92 s; CPU canaries 0.397/0.360/0.394;
#: io canaries 0.720/0.622/0.600). The r13 host generation runs the
#: headline set ~1.35x the 2026-08-15 host at EQUAL CPU canary — a
#: sustained-throughput difference the 1.5 s all-core sprint canary
#: cannot see — so the old anchor stopped being host-comparable (three
#: runs against it produced three DISJOINT flag sets, every one a
#: transient). canary_sec is the min of the IN-BAND readings (the
#: 0.360 reading is the below-band fast-transient class and would bias
#: the scale); io_canary_sec likewise. The superseded 2026-08-15
#: anchor is kept below for history / --anchor replay.
ANCHOR_R13_SINGLEPASS = {
    "canary_sec": 0.394,
    # the r12/r13-generation quiet band this record was classified with
    "cpu_band": [0.39, 0.47],
    "io_canary_sec": 0.600,
    "queries": {
        "q1_pricing_summary": 1.912,
        "q6_forecast_revenue": 0.523,
        "q3_top_orders": 2.011,
        "q5_region_revenue": 2.156,
        "rel_window_running": 0.97,
        "rel_dedup_keyed": 0.991,
        "etl_events_pipeline": 1.851,
        "rel_asof_join": 0.886,
        "dedup_minhash_lsh": 2.512,
        "dedup_simhash": 1.229,
        "dedup_embedding_cosine": 3.342,
        "text_quality_score": 0.394,
        "text_fingerprint": 0.353,
        "sim_topk_cosine": 0.752,
        "sim_ivf_search": 1.138,
        "stream_tumbling_counts": 0.572,
        "stream_session_windows": 0.859,
        "mm_decode_features": 1.967,
        "sim_kmeans": 1.528,
        "text_decontaminate": 0.882,
        "docs_pack_sequences": 0.285,
        "events_weighted_sample": 0.328,
        "docs_dedup_corpus": 2.703,
        "docs_dedup_incremental": 2.215,
        "text_repetition_filter": 1.702,
        "q8_market_share": 1.374,
        "q10_returned_items": 1.055,
        "rel_scd2_history": 0.901,
        "events_sessionize": 0.829,
        "events_gap_fill": 0.843,
        "text_pmi_bigrams": 0.806,
        "graph_reachability": 3.274,
        "docs_bm25_topk": 0.935,
        "docs_source_divergence": 0.966,
        "events_gap_fill_lerp": 0.888,
    },
}

#: SUPERSEDED round-10 anchor: per-query MIN of the two back-to-back
#: canary-bearing runs recorded in BASELINE.md (2026-08-15). Kept for
#: history and for replaying r9–r12 bench records on their own host
#: generation; not the default.
ANCHOR_2026_08_15 = {
    "canary_sec": 0.409,
    # the r12-generation quiet band (seven-run span) this host recorded
    "cpu_band": [0.39, 0.47],
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
    cpu_band = anchor.get("cpu_band", [CPU_BAND_LO, CPU_BAND_HI])
    cpu_status = classify_cpu_canary(rc, cpu_band[0], cpu_band[1])
    run_passes = run.get("passes") or {}  # r14+ records: raw min-of-2
    # r16 (VERDICT r15 item 7): per-query sustained-normalized values
    # ride along so a contended host self-identifies in the row data —
    # the r15 driver's 46.47 s 32-core run (sustained 9.906, above
    # band) read as a 27% regression until hand-divided by the canary.
    # Reporting-only: never gates, never rescales the CPU-normalized
    # ratio (a second blind scale would compound with the first).
    run_sus = run.get("sustained_canary_sec")
    anchor_sus = anchor.get("sustained_canary_sec")
    rows = {}
    ratios = []
    for name, a_sec in anchor["queries"].items():
        r_sec = run["queries"].get(name)
        # either side's -1.0 is bench.py's errored-query sentinel — a
        # negative anchor must not produce a negative "band" ratio
        if r_sec is None or r_sec < 0 or a_sec is None or a_sec <= 0:
            rows[name] = {"status": "missing_or_errored"}
            continue
        raw = r_sec / a_sec
        norm = (r_sec * scale) / a_sec
        ratios.append(norm)
        if norm > FLAG_RATIO:
            # an out-of-band-FAST canary scales every ratio UP: a flag
            # that exists only after that scale-up is the instrument
            # talking, not the plan (r12: canary 0.357 manufactured two
            # flags out of raw 1.42/1.32) — suppress unless the RAW
            # ratio independently exceeds the line
            if cpu_status == "fast_transient" and raw <= FLAG_RATIO:
                status = "flag_suppressed_fast_canary"
            else:
                status = "flag"
        elif norm < 1 / FLAG_RATIO:
            status = "fast"  # anomalous speedup: review, don't gate
        elif abs(norm - 1) <= NOISE_BAND:
            status = "noise"
        else:
            status = "band"
        rows[name] = {
            "raw_sec": r_sec,
            "raw_ratio": round(raw, 3),
            "norm_ratio": round(norm, 3),
            "status": status,
        }
        if run_sus:
            # seconds in units of this run's own sustained throughput:
            # comparable across hosts/contention levels by construction
            rows[name]["sec_per_sustained"] = round(r_sec / run_sus, 4)
            if anchor_sus:
                rows[name]["sustained_norm_ratio"] = round(
                    (r_sec * anchor_sus / run_sus) / a_sec, 3
                )
        # r14+ runs carry both raw passes per query: keep them on the
        # row for shape analysis — a flag whose two passes straddle
        # the line (e.g. 4.1/1.3) is the transient term showing up
        # INSIDE one run, corroborating host over plan.
        if name in run_passes:
            rows[name]["passes"] = run_passes[name]
    out = {
        "canary_scale": round(scale, 4),
        "canary_applied": bool(rc and ac),
        "cpu_canary_status": cpu_status,
        "cpu_canary_band": cpu_band,
        "median_norm_ratio": round(statistics.median(ratios), 3)
        if ratios
        else None,
        "flagged": sorted(
            n for n, r in rows.items() if r.get("status") == "flag"
        ),
        # normalized-only exceedances under a below-band canary: the
        # scale-up manufactured them; listed for the record, not gating
        "suppressed_flags": sorted(
            n
            for n, r in rows.items()
            if r.get("status") == "flag_suppressed_fast_canary"
        ),
        # the mirror hazard: an ABOVE-band canary scales ratios DOWN,
        # so a genuinely slow query can hide under the line — surface
        # raw-only exceedances for bracketing-run review (not gating:
        # on a merely-contended host raw ratios inflate legitimately)
        "masked_raw_flags": sorted(
            n
            for n, r in rows.items()
            if cpu_status == "unreliable_this_run"
            and r.get("status") not in ("flag", "missing_or_errored")
            and r.get("raw_ratio", 0) > FLAG_RATIO
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
    rs = run.get("sustained_canary_sec")
    sus_band = anchor.get(
        "sustained_band", [SUSTAINED_BAND_LO, SUSTAINED_BAND_HI]
    )
    out["sustained_canary_status"] = classify_sustained_canary(
        rs, sus_band[0], sus_band[1]
    )
    out["sustained_canary_band"] = sus_band
    a_sus = anchor.get("sustained_canary_sec")
    if rs and a_sus:
        # run-vs-anchor sustained ratio: the multiplier a sprint-flat/
        # sustained-slow host applies to every query — context for
        # reading uniform flag inflation, never a normalizer (a second
        # blind scale would compound with the CPU one)
        out["sustained_ratio"] = round(rs / a_sus, 3)
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
        help="another bench JSON as the anchor (default: the r13 record)",
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
