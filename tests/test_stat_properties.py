"""Independent property tests for the statistical fourth-wave operators.

Each operator is driven END-TO-END (through ``registry.table`` on a
synthetic random events parquet) and checked against a plain-Python
reference that shares NO formulation with either the Spark builder or
the DuckDB oracle — the same second-axis discipline as
``test_leg3_properties.py``, extended to the round-7 driver-window
statistics: Theil–Sen trend, Markov stationary distribution, survival
curve. All three are exact-arithmetic designs (integer cents / scaled
bigints / integer counts), so comparisons are equality, not tolerance.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """A random events table: 60 users x ~25 events, 5 types, 40 days."""
    rng = random.Random(101)
    base = datetime(2024, 2, 1, 0, 0, 0)
    types = ["click", "view", "purchase", "signup", "error"]
    rows = []
    eid = 0
    for uid in range(60):
        for _ in range(rng.randrange(5, 45)):
            eid += 1
            ts = base + timedelta(
                days=rng.randrange(0, 40), seconds=rng.randrange(0, 86_400)
            )
            rows.append(
                (eid, ts, uid, rng.choice(types), rng.randrange(0, 50_000) / 100.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = tmp_path_factory.mktemp("stat_props")
    df.write.parquet(str(out / "events.parquet"))
    return str(out), rows


def _daily_cents(rows):
    daily: dict[tuple[str, str], int] = {}
    for _eid, ts, _uid, etype, value, _p in rows:
        key = (etype, ts.strftime("%Y-%m-%d"))
        daily[key] = daily.get(key, 0) + round(value * 100)
    return daily


def test_theilsen_matches_pairwise_median(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_theilsen_trend

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: (r["n_days"], r["n_slopes"], r["slope_per_day"])
        for r in events_theilsen_trend(spark, sf_dir).collect()
    }

    daily = _daily_cents(rows)
    by_type: dict[str, list[tuple[str, int]]] = {}
    for (etype, day), cents in daily.items():
        by_type.setdefault(etype, []).append((day, cents))
    for etype, series in by_type.items():
        series.sort()
        d0 = datetime.strptime(series[0][0], "%Y-%m-%d")
        pts = [
            ((datetime.strptime(day, "%Y-%m-%d") - d0).days, float(cents))
            for day, cents in series
        ]
        slopes = sorted(
            (y2 - y1) / float(x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        m = len(slopes)
        med = slopes[m // 2] if m % 2 == 1 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
        assert got[etype] == (len(pts), m, med / 100.0), etype


def test_markov_stationary_matches_integer_power_iteration(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import (
        MARKOV_ITERS,
        MARKOV_SCALE,
        events_markov_stationary,
    )

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: r["stationary_scaled"]
        for r in events_markov_stationary(spark, sf_dir).collect()
    }

    by_user: dict[int, list] = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    pairs: dict[tuple[str, str], int] = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    rt: dict[str, int] = {}
    for (a, _b), n in pairs.items():
        rt[a] = rt.get(a, 0) + n
    v = {t: MARKOV_SCALE for t in rt}
    for _ in range(MARKOV_ITERS):
        nxt: dict[str, int] = {}
        for (a, b), n in pairs.items():
            if a in v:
                nxt[b] = nxt.get(b, 0) + (v[a] * n) // rt[a]
        v = nxt
    assert got == v


def test_survival_curve_matches_lifetime_ccdf(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import (
        SURVIVAL_MAX_DAYS,
        events_survival_curve,
    )

    sf_dir, rows = events_dir
    got = {
        r["day"]: (r["n_surviving"], r["survival_rate"])
        for r in events_survival_curve(spark, sf_dir).collect()
    }

    spans: dict[int, tuple[str, str]] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        day = ts.strftime("%Y-%m-%d")
        lo, hi = spans.get(uid, (day, day))
        spans[uid] = (min(lo, day), max(hi, day))
    lifetimes = [
        (
            datetime.strptime(hi, "%Y-%m-%d") - datetime.strptime(lo, "%Y-%m-%d")
        ).days
        for lo, hi in spans.values()
    ]
    n_users = len(lifetimes)
    expected: dict[int, tuple[int, float]] = {}
    for d in range(0, SURVIVAL_MAX_DAYS + 1):
        n = sum(1 for lt in lifetimes if min(lt, SURVIVAL_MAX_DAYS) >= d)
        if n:
            expected[d] = (n, n / float(n_users))
    assert got == expected
