"""Unit pins for tools/bench_adjudicate.py (the r10 canary protocol).

Pure-Python — no Spark. The protocol's arithmetic is the thing worth
pinning: a host running uniformly slower (canary up by the same factor
as every query) must normalize to ratio 1.0 / ``noise``, while a single
query that truly regressed must flag even when the canary is flat.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench_adjudicate",
    Path(__file__).resolve().parents[1] / "tools" / "bench_adjudicate.py",
)
badj = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(badj)

ANCHOR = {
    "canary_sec": 0.4,
    "io_canary_sec": 0.6,
    "queries": {"qa": 1.0, "qb": 2.0, "qc": 0.5},
}


def test_uniform_host_slowdown_normalizes_to_noise():
    """Canary and every query 1.5x slower: pure host band — every
    normalized ratio is exactly 1.0 and nothing flags."""
    run = {
        "canary_sec": 0.6,
        "queries": {"qa": 1.5, "qb": 3.0, "qc": 0.75},
    }
    out = badj.adjudicate(run, ANCHOR)
    assert out["flagged"] == []
    assert out["median_norm_ratio"] == 1.0
    assert all(r["status"] == "noise" for r in out["queries"].values())
    assert all(r["raw_ratio"] == 1.5 for r in out["queries"].values())


def test_real_regression_flags_through_flat_canary():
    """Canary flat, one query 2x: that is code, and only it flags."""
    run = {"canary_sec": 0.4, "queries": {"qa": 2.0, "qb": 2.0, "qc": 0.5}}
    out = badj.adjudicate(run, ANCHOR)
    assert out["flagged"] == ["qa"]
    assert out["queries"]["qa"]["norm_ratio"] == 2.0
    assert out["queries"]["qb"]["status"] == "noise"


def test_band_between_noise_and_flag():
    run = {"canary_sec": 0.4, "queries": {"qa": 1.2, "qb": 2.0, "qc": 0.5}}
    out = badj.adjudicate(run, ANCHOR)
    assert out["queries"]["qa"]["status"] == "band"
    assert out["flagged"] == []


def test_missing_canary_falls_back_to_raw():
    run = {"canary_sec": None, "queries": {"qa": 1.6, "qb": 2.0, "qc": 0.5}}
    out = badj.adjudicate(run, ANCHOR)
    assert out["canary_applied"] is False
    assert out["canary_scale"] == 1.0
    assert out["flagged"] == ["qa"]


def test_errored_query_reported_not_ratioed():
    run = {"canary_sec": 0.4, "queries": {"qa": -1.0, "qb": 2.0, "qc": 0.5}}
    out = badj.adjudicate(run, ANCHOR)
    assert out["queries"]["qa"] == {"status": "missing_or_errored"}
    assert "qa" not in out["flagged"]


def test_errored_anchor_query_reported_not_ratioed():
    """bench.py writes -1.0 for an errored query on EITHER side; a
    negative anchor must not produce a negative 'band' ratio or poison
    the median."""
    anchor = {"canary_sec": 0.4, "queries": {"qa": -1.0, "qb": 2.0}}
    run = {"canary_sec": 0.4, "queries": {"qa": 1.0, "qb": 2.0}}
    out = badj.adjudicate(run, anchor)
    assert out["queries"]["qa"] == {"status": "missing_or_errored"}
    assert out["median_norm_ratio"] == 1.0


def test_pre_canary_anchor_falls_back_to_raw():
    """Pre-r9 bench records carry no canary_sec at all — the anchor
    side must degrade to raw ratios exactly like the run side."""
    anchor = {"queries": {"qa": 1.0}}
    run = {"canary_sec": 0.4, "queries": {"qa": 1.2}}
    out = badj.adjudicate(run, anchor)
    assert out["canary_applied"] is False
    assert out["queries"]["qa"]["norm_ratio"] == 1.2


def test_unanchored_run_queries_are_listed():
    """A run-side query the anchor has never seen cannot be
    adjudicated — silence would read as 'all green' for a query the
    gate never examined."""
    run = {
        "canary_sec": 0.4,
        "queries": {"qa": 1.0, "qb": 2.0, "qc": 0.5, "q_new": 99.0},
    }
    out = badj.adjudicate(run, ANCHOR)
    assert out["unanchored"] == ["q_new"]
    assert "q_new" not in out["queries"]


def test_io_canary_ratio_emitted_and_classified():
    run = {
        "canary_sec": 0.4,
        "io_canary_sec": 0.9,
        "queries": {"qa": 1.0, "qb": 2.0, "qc": 0.5},
    }
    out = badj.adjudicate(run, ANCHOR)
    assert out["io_canary_ratio"] == 1.5
    assert out["io_canary_status"] == "contended"


def test_io_ratio_classification_boundaries():
    """The r11 classification: ok inside [0.75, 1.25], contended up to
    2.0, unreliable beyond 2.0 AND below 0.75 (a reference that doesn't
    describe this run's regime is unreliable in either direction —
    the r10 finding was a bare 5.075 printed uninterpreted)."""
    assert badj.classify_io_ratio(1.0) == "ok"
    assert badj.classify_io_ratio(0.75) == "ok"
    assert badj.classify_io_ratio(1.25) == "ok"
    assert badj.classify_io_ratio(1.26) == "contended"
    assert badj.classify_io_ratio(2.0) == "contended"
    assert badj.classify_io_ratio(2.01) == "unreliable_this_run"
    assert badj.classify_io_ratio(5.075) == "unreliable_this_run"
    assert badj.classify_io_ratio(0.4) == "unreliable_this_run"


def test_suspect_fast_listed_but_not_gating():
    """An anomalous speedup (norm < 1/FLAG_RATIO) can be lost work — it
    must be listed for review, but must not fail the exit-code gate
    (a smaller-sf run against the sf0.1 anchor makes everything fast)."""
    run = {"canary_sec": 0.4, "queries": {"qa": 0.3, "qb": 2.0, "qc": 0.5}}
    out = badj.adjudicate(run, ANCHOR)
    assert out["suspect_fast"] == ["qa"]
    assert out["queries"]["qa"]["status"] == "fast"
    assert out["flagged"] == []


def test_fast_boundary_is_inverse_of_flag():
    """Exactly 1/FLAG_RATIO is band (symmetric with FLAG_RATIO being
    the last unflagged slow ratio)."""
    edge = 1.0 / badj.FLAG_RATIO
    run = {
        "canary_sec": 0.4,
        "queries": {"qa": round(1.0 * edge, 6), "qb": 2.0, "qc": 0.5},
    }
    out = badj.adjudicate(run, ANCHOR)
    assert out["queries"]["qa"]["status"] == "band"
    assert out["suspect_fast"] == []


def test_driver_wrapper_loading(tmp_path):
    """Driver BENCH_r*.json wraps the line under 'parsed'."""
    inner = {"canary_sec": 0.4, "queries": {"qa": 1.0}}
    p = tmp_path / "BENCH_rX.json"
    p.write_text(json.dumps({"n": 1, "parsed": inner}))
    assert badj._load(str(p))["queries"] == {"qa": 1.0}


def test_write_path_records_are_refused(tmp_path):
    """A --sink parquet record times execution+write+commit; normalizing
    it against the noop anchor would flag every query bogusly — the
    loader must refuse it, not mis-adjudicate it."""
    import pytest

    p = tmp_path / "write.json"
    p.write_text(
        json.dumps(
            {
                "metric": "write_path_total_sec",
                "queries": {"qa": 3.0},
                "sink": "parquet",
            }
        )
    )
    with pytest.raises(SystemExit, match="not adjudicable"):
        badj._load(str(p))


def test_cpu_canary_classification_boundaries():
    """The r13 band classification (VERDICT r12 task 2): ok inside the
    measured quiet-host band, fast_transient below it, unreliable above
    it, absent when the record carries no canary. The band is a
    HOST-GENERATION property carried on each anchor (r14): the r12 run's
    0.357 canary is below ITS generation's [0.39, 0.47] band but inside
    the current generation's band, whose quiet floor moved to 0.355 at
    r14 and widened to 0.33 at r15 when sub-floor quiet readings
    recurred (0.347/0.336; BASELINE.md r15 section)."""
    lo, hi = badj.CPU_BAND_LO, badj.CPU_BAND_HI
    assert badj.classify_cpu_canary(lo) == "ok"
    assert badj.classify_cpu_canary(hi) == "ok"
    assert badj.classify_cpu_canary((lo + hi) / 2) == "ok"
    assert badj.classify_cpu_canary(lo - 0.001) == "fast_transient"
    # the r12 driver run, against its own generation's band
    assert badj.classify_cpu_canary(0.357, 0.39, 0.47) == "fast_transient"
    assert badj.classify_cpu_canary(hi + 0.001) == "unreliable_this_run"
    assert badj.classify_cpu_canary(None) == "absent"
    assert badj.classify_cpu_canary(0) == "absent"
    # every embedded anchor carries its generation's band, and its own
    # canary reading is inside it
    for anchor in (badj.ANCHOR, badj.ANCHOR_R13_SINGLEPASS,
                   badj.ANCHOR_2026_08_15):
        alo, ahi = anchor["cpu_band"]
        assert alo <= anchor["canary_sec"] <= ahi


def test_below_band_canary_suppresses_manufactured_flags():
    """The r12 driver-bench artifact, in miniature: a below-band canary
    scales every ratio UP; a query whose RAW ratio is under the flag
    line must land in suppressed_flags, not flagged — and must not
    gate."""
    anchor = {"canary_sec": 0.40, "queries": {"qa": 1.0, "qb": 1.0}}
    run = {
        "canary_sec": 0.32,  # below band -> scale 1.25
        # qa: raw 1.30 <= 1.5 but norm 1.625 > 1.5 -> manufactured
        # qb: raw 1.60 > 1.5 (norm 2.0) -> real even without the scale
        "queries": {"qa": 1.30, "qb": 1.60},
    }
    out = badj.adjudicate(run, anchor)
    assert out["cpu_canary_status"] == "fast_transient"
    assert out["suppressed_flags"] == ["qa"]
    assert out["flagged"] == ["qb"]
    assert out["queries"]["qa"]["status"] == "flag_suppressed_fast_canary"


def test_above_band_canary_surfaces_masked_raw_flags():
    """The mirror hazard: an above-band canary scales ratios DOWN, so a
    genuinely slow query can hide under the line — it must be listed
    under masked_raw_flags for bracketing review, without gating."""
    anchor = {"canary_sec": 0.40, "queries": {"qa": 1.0, "qb": 1.0}}
    run = {
        "canary_sec": 0.60,  # above band -> scale 0.667
        # qa: raw 1.80 > 1.5 but norm 1.2 -> masked by the scale-down
        "queries": {"qa": 1.80, "qb": 1.0},
    }
    out = badj.adjudicate(run, anchor)
    assert out["cpu_canary_status"] == "unreliable_this_run"
    assert out["flagged"] == []
    assert out["masked_raw_flags"] == ["qa"]
    assert out["queries"]["qa"]["status"] == "band"


def test_in_band_canary_keeps_normalized_flags():
    """Inside the band the scale-up is a trusted interpolation: a
    normalized-only exceedance still flags (no suppression)."""
    anchor = {"canary_sec": 0.46, "queries": {"qa": 1.0}}
    run = {"canary_sec": 0.40, "queries": {"qa": 1.35}}  # norm 1.5525
    out = badj.adjudicate(run, anchor)
    assert out["cpu_canary_status"] == "ok"
    assert out["flagged"] == ["qa"]
    assert out["suppressed_flags"] == []


def test_r12_driver_bench_adjudicates_clean(tmp_path):
    """The real test case from VERDICT r12 task 2: re-adjudicating the
    r12 driver bench (canary 0.357, below band) against ITS OWN host
    generation's anchor must yield ZERO flags, with text_decontaminate
    and text_pmi_bigrams explained under suppressed_flags."""
    import pytest

    path = Path(__file__).resolve().parents[1] / "BENCH_r12.json"
    if not path.exists():
        pytest.skip("BENCH_r12.json not present")
    out = badj.adjudicate(badj._load(str(path)), badj.ANCHOR_2026_08_15)
    assert out["cpu_canary_status"] == "fast_transient"
    assert out["flagged"] == []
    assert out["suppressed_flags"] == [
        "text_decontaminate",
        "text_pmi_bigrams",
    ]


def test_embedded_anchor_matches_baseline_record():
    """The embedded anchors are BASELINE.md's min-of-N vectors: spot-pin
    the totals so a drive-by edit of one can't drift from the other."""
    # r14 default anchor (min-of-2 protocol, 2026-08-16)
    assert badj.ANCHOR["canary_sec"] == 0.371
    assert badj.ANCHOR["io_canary_sec"] == 0.693
    assert badj.ANCHOR["sustained_canary_sec"] == 7.471
    assert len(badj.ANCHOR["queries"]) == 35
    assert round(sum(badj.ANCHOR["queries"].values()), 2) == 30.09
    # the anchor canary must itself be IN the band it classifies
    # against — an out-of-band anchor would bias every future scale
    assert (
        badj.CPU_BAND_LO <= badj.ANCHOR["canary_sec"] <= badj.CPU_BAND_HI
    )
    # the anchor's sustained reading sits in the sustained band too
    assert (
        badj.SUSTAINED_BAND_LO
        <= badj.ANCHOR["sustained_canary_sec"]
        <= badj.SUSTAINED_BAND_HI
    )
    # superseded r13 single-pass anchor (2026-08-16 host, min-of-3)
    r13 = badj.ANCHOR_R13_SINGLEPASS
    assert r13["canary_sec"] == 0.394
    assert r13["io_canary_sec"] == 0.600
    assert len(r13["queries"]) == 35
    assert round(sum(r13["queries"].values()), 2) == 45.93
    assert set(r13["queries"]) == set(badj.ANCHOR["queries"])
    # superseded 2026-08-15 anchor, kept for history/replay
    hist = badj.ANCHOR_2026_08_15
    assert hist["canary_sec"] == 0.409
    # r11 raw-byte-read io reference (min-of-2: 0.530/0.527)
    assert hist["io_canary_sec"] == 0.527
    # 34 r10 entries + the r12 headline addition (events_gap_fill_lerp)
    assert len(hist["queries"]) == 35
    assert hist["queries"]["events_gap_fill_lerp"] == 0.642
    # the r10 vector sums to 38.733 (the "38.73 s" record, rounded);
    # + 0.642 = 39.375 -> 39.38
    assert round(sum(hist["queries"].values()), 2) == 39.38
    # both anchors cover the same headline set
    assert set(hist["queries"]) == set(badj.ANCHOR["queries"])


def test_sustained_canary_classification_boundaries():
    """The r14 sustained-throughput band: the sprint canary was EQUAL
    across two host generations whose headline throughput differed
    ~1.35x, so the ~8 s workload gets its own band and taxonomy."""
    lo, hi = badj.SUSTAINED_BAND_LO, badj.SUSTAINED_BAND_HI
    assert badj.classify_sustained_canary(lo) == "ok"
    assert badj.classify_sustained_canary(hi) == "ok"
    assert badj.classify_sustained_canary(lo - 0.01) == "fast_transient"
    assert badj.classify_sustained_canary(hi + 0.01) == "unreliable_this_run"
    # pre-r14 records carry no sustained reading
    assert badj.classify_sustained_canary(None) == "absent"


def test_sustained_canary_classified_and_ratio_emitted():
    """A run carrying sustained_canary_sec gets a classification and,
    when the anchor has one too, the run/anchor ratio — context only,
    never a normalizer or a gate."""
    anchor = {
        "canary_sec": 0.40,
        "sustained_canary_sec": 8.0,
        "queries": {"qa": 1.0},
    }
    run = {
        "canary_sec": 0.40,
        "sustained_canary_sec": 16.0,  # sustained-slow regime
        "queries": {"qa": 1.0},
    }
    out = badj.adjudicate(run, anchor)
    assert out["sustained_canary_status"] == "unreliable_this_run"
    assert out["sustained_ratio"] == 2.0
    assert out["flagged"] == []  # classification-only: no gating effect
    # absent on the run -> absent status, no ratio
    out2 = badj.adjudicate({"canary_sec": 0.40, "queries": {"qa": 1.0}}, anchor)
    assert out2["sustained_canary_status"] == "absent"
    assert "sustained_ratio" not in out2


def test_min_of_2_passes_ride_along_on_rows():
    """r14+ bench records carry both raw passes per query; the
    adjudicated row keeps them for shape analysis (a flag whose two
    passes straddle the line is the transient term visible inside one
    run), and queries without a pass record stay unadorned."""
    anchor = {"canary_sec": 0.40, "queries": {"qa": 1.0, "qb": 1.0}}
    run = {
        "canary_sec": 0.40,
        "queries": {"qa": 1.0, "qb": 1.0},
        "passes": {"qa": [4.1, 1.0]},
    }
    out = badj.adjudicate(run, anchor)
    assert out["queries"]["qa"]["passes"] == [4.1, 1.0]
    assert "passes" not in out["queries"]["qb"]


def test_sustained_normalized_row_fields_are_reporting_only():
    """r16 (VERDICT r15 item 7): per-query sec/sustained and the
    sustained-normalized ratio ride on each row when the readings
    exist, and change NOTHING about statuses or the exit-gating flag
    list (reporting-only; the CPU normalization stays the only scale).
    """
    anchor = dict(ANCHOR, sustained_canary_sec=8.0)
    run = {
        "canary_sec": 0.4,
        "sustained_canary_sec": 16.0,  # host delivering half throughput
        "queries": {"qa": 2.0, "qb": 2.0, "qc": 0.5},
    }
    out = badj.adjudicate(run, anchor)
    qa = out["queries"]["qa"]
    assert qa["sec_per_sustained"] == round(2.0 / 16.0, 4)
    # (r_sec * anchor_sus / run_sus) / a_sec = (2.0 * 8/16) / 1.0
    assert qa["sustained_norm_ratio"] == 1.0
    # statuses and gating identical to the sustained-less adjudication
    base = badj.adjudicate(
        {"canary_sec": 0.4, "queries": run["queries"]}, ANCHOR
    )
    assert out["flagged"] == base["flagged"] == ["qa"]
    assert all(
        out["queries"][n]["status"] == base["queries"][n]["status"]
        for n in run["queries"]
    )
    # without a sustained reading the fields are absent entirely
    assert "sec_per_sustained" not in base["queries"]["qa"]
    assert "sustained_norm_ratio" not in base["queries"]["qa"]
