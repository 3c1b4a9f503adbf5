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


def test_embedded_anchor_matches_baseline_record():
    """The embedded anchor is the BASELINE.md min-of-2 vector: spot-pin
    the totals so a drive-by edit of one can't drift from the other."""
    assert badj.ANCHOR["canary_sec"] == 0.409
    # r11 raw-byte-read io reference (min-of-2: 0.530/0.527)
    assert badj.ANCHOR["io_canary_sec"] == 0.527
    # 34 r10 entries + the r12 headline addition (events_gap_fill_lerp,
    # anchored at its own quiet-host pair min — BASELINE.md r12 section)
    assert len(badj.ANCHOR["queries"]) == 35
    assert badj.ANCHOR["queries"]["events_gap_fill_lerp"] == 0.642
    # the r10 vector sums to 38.733 (the "38.73 s" record, rounded);
    # + 0.642 = 39.375 -> 39.38
    assert round(sum(badj.ANCHOR["queries"].values()), 2) == 39.38
