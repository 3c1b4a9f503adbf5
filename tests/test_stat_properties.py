"""Independent property tests for the statistical fourth-wave operators.

Each operator is driven END-TO-END (through ``registry.table`` on a
synthetic random events parquet) and checked against a plain-Python
reference that shares NO formulation with either the Spark builder or
the DuckDB oracle — the same second-axis discipline as
``test_leg3_properties.py``, extended to the round-7 driver-window
statistics: Theil–Sen trend, Markov stationary distribution, survival
curve, chi-squared independence, activity streaks, new-vs-returning,
segment bitmask, burst detection, the Benford first-digit screen,
inter-arrival percentiles, MAD outliers, the lateness audit, and the
Holt walk-forward backtest.
All are exact-arithmetic designs (integer cents / scaled bigints /
integer counts / micro-unit-rounded cells), so comparisons are
equality, not tolerance.
"""

from __future__ import annotations

# Second-verification-axis marker: tests in this module check operators
# against an INDEPENDENT reference (plain Python/pandas/declared
# allowlists), not the DuckDB oracle. COVERAGE.md's property-test tally
# is derived by counting test functions in marked modules
# (tests/test_registry_contract.py::test_doc_counts_are_derived).
SECOND_AXIS_INDEPENDENT_REFERENCE = True

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


def _round_half_up(x: float) -> int:
    # mirrors Spark's round() on doubles: BigDecimal.valueOf (shortest
    # decimal rendering) then HALF_UP — not Python's bankers' rounding
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_chi2_independence_matches_contingency_python(spark, events_dir):
    from spark_etl_pipeline_spark.operators.profile import events_chi2_independence

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: (r["n"], r["chi2_micro"])
        for r in events_chi2_independence(spark, sf_dir).collect()
    }

    cells: dict[tuple[str, int], int] = {}
    for _eid, ts, _uid, etype, _v, _p in rows:
        key = (etype, ts.isoweekday())
        cells[key] = cells.get(key, 0) + 1
    rtot: dict[str, int] = {}
    ctot: dict[int, int] = {}
    for (etype, dow), o in cells.items():
        rtot[etype] = rtot.get(etype, 0) + o
        ctot[dow] = ctot.get(dow, 0) + o
    gtot = sum(cells.values())
    expected: dict[str, tuple[int, int]] = {}
    for etype in rtot:
        n = rtot[etype]
        chi2 = 0
        for (et, dow), o in cells.items():
            if et != etype:
                continue
            e = float(rtot[et]) * float(ctot[dow]) / float(gtot)
            chi2 += _round_half_up((float(o) - e) ** 2 / e * 1_000_000)
        expected[etype] = (n, chi2)
    assert got == expected


def test_activity_streaks_matches_gaps_islands_python(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_activity_streaks

    sf_dir, rows = events_dir
    got = {
        r["user_id"]: (r["longest_streak"], r["n_streaks"], r["last_active_day"])
        for r in events_activity_streaks(spark, sf_dir).collect()
    }

    days: dict[int, set] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        days.setdefault(uid, set()).add(ts.date())
    expected = {}
    for uid, ds in days.items():
        sds = sorted(ds)
        streaks = [1]
        for a, b in zip(sds, sds[1:]):
            if (b - a).days == 1:
                streaks[-1] += 1
            else:
                streaks.append(1)
        expected[uid] = (max(streaks), len(streaks), sds[-1].strftime("%Y-%m-%d"))
    assert got == expected


def test_new_vs_returning_matches_first_day_partition(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_new_vs_returning

    sf_dir, rows = events_dir
    got = {
        r["day"]: (r["new_user_events"], r["returning_user_events"], r["new_users"])
        for r in events_new_vs_returning(spark, sf_dir).collect()
    }

    first: dict[int, str] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        d = ts.strftime("%Y-%m-%d")
        if uid not in first or d < first[uid]:
            first[uid] = d
    expected: dict[str, list] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        d = ts.strftime("%Y-%m-%d")
        cur = expected.setdefault(d, [0, 0, set()])
        if d == first[uid]:
            cur[0] += 1
            cur[2].add(uid)
        else:
            cur[1] += 1
    assert got == {d: (a, b, len(s)) for d, (a, b, s) in expected.items()}


def test_segment_bitmask_matches_python_bit_or(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import (
        _SEGMENT_TYPES,
        events_segment_bitmask,
    )

    sf_dir, rows = events_dir
    got = {
        r["mask"]: (r["segments"], r["n_user_days"])
        for r in events_segment_bitmask(spark, sf_dir).collect()
    }

    bit = {t: 1 << i for i, t in enumerate(_SEGMENT_TYPES)}
    masks: dict[tuple[int, str], int] = {}
    for _eid, ts, uid, etype, _v, _p in rows:
        key = (uid, ts.strftime("%Y-%m-%d"))
        masks[key] = masks.get(key, 0) | bit.get(etype, 0)
    hist: dict[int, int] = {}
    for m in masks.values():
        hist[m] = hist.get(m, 0) + 1
    expected = {
        m: ("+".join(t for t in _SEGMENT_TYPES if m & bit[t]), n)
        for m, n in hist.items()
    }
    assert got == expected


def test_burst_users_matches_minute_rate_python(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import (
        BURST_THRESHOLD,
        events_burst_users,
    )

    sf_dir, rows = events_dir
    got = {
        r["user_id"]: (r["peak_per_minute"], r["n_events"], r["n_active_minutes"])
        for r in events_burst_users(spark, sf_dir).collect()
    }

    per_min: dict[tuple[int, str], int] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        key = (uid, ts.strftime("%Y-%m-%d %H:%M"))
        per_min[key] = per_min.get(key, 0) + 1
    by_user: dict[int, list[int]] = {}
    for (uid, _m), n in per_min.items():
        by_user.setdefault(uid, []).append(n)
    expected = {
        uid: (max(ns), sum(ns), len(ns))
        for uid, ns in by_user.items()
        if max(ns) >= BURST_THRESHOLD
    }
    assert got == expected


def test_benford_matches_digit_histogram_python(spark, tmp_path):
    from spark_etl_pipeline_spark.plans.relational import rel_benford_deviation

    rng = random.Random(31)
    # log-uniform-ish totals so every first digit appears
    totals = [
        round(10 ** rng.uniform(1, 5), 2) for _ in range(4000)
    ]
    spark.createDataFrame(
        [(t,) for t in totals], "o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["first_digit"]: (r["n"], r["share"], r["deviation_micro"])
        for r in rel_benford_deviation(spark, str(tmp_path)).collect()
    }

    import math

    counts: dict[int, int] = {}
    for t in totals:
        if t > 0:
            d = int(str(round(t * 100))[0])
            counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    expected = {}
    for d, n in counts.items():
        share = float(n) / float(total)
        bexp = math.log10(1.0 + 1.0 / d)
        # the operator embeds the Benford constants as shortest-roundtrip
        # literals; float(repr()) round-trips to the same double
        expected[d] = (n, share, _round_half_up(abs(share - bexp) * 1_000_000))
    assert got == expected


def _spark_percentile(sorted_vals: list[float], q: float) -> float:
    # Spark's exact Percentile: position = (n-1)*q, then
    # lower*(higher-pos) + higher*(pos-lower) — NOT lo + frac*(hi-lo);
    # the operand order matters for bit-exactness.
    import math

    pos = (len(sorted_vals) - 1) * q
    lo, hi = math.floor(pos), math.ceil(pos)
    if lo == hi:
        return float(sorted_vals[lo])
    return float(sorted_vals[lo]) * (hi - pos) + float(sorted_vals[hi]) * (pos - lo)


def test_interarrival_matches_python_gaps(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_interarrival

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: (r["n_gaps"], r["p50_gap_s"], r["p90_gap_s"])
        for r in events_interarrival(spark, sf_dir).collect()
    }

    by_key: dict[tuple[str, int], list] = {}
    epoch = datetime(1970, 1, 1)
    for eid, ts, uid, etype, _v, _p in rows:
        us = int((ts - epoch).total_seconds() * 1_000_000)
        by_key.setdefault((etype, uid), []).append((us, eid))
    gaps: dict[str, list[int]] = {}
    for (etype, _uid), seq in by_key.items():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            gaps.setdefault(etype, []).append(b - a)
    expected = {}
    for etype, gs in gaps.items():
        gs.sort()
        expected[etype] = (
            len(gs),
            _spark_percentile(gs, 0.5) / 1_000_000.0,
            _spark_percentile(gs, 0.9) / 1_000_000.0,
        )
    assert got == expected


def test_mad_outliers_matches_python_double_median(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_mad_outliers

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: (r["n"], r["n_outliers"], r["mad_value"])
        for r in events_mad_outliers(spark, sf_dir).collect()
    }

    cents: dict[str, list[int]] = {}
    for _eid, _ts, _uid, etype, value, _p in rows:
        cents.setdefault(etype, []).append(round(value * 100))
    expected = {}
    for etype, cs in cents.items():
        med = _spark_percentile(sorted(cs), 0.5)
        ads = sorted(abs(float(c) - med) for c in cs)
        mad = _spark_percentile(ads, 0.5)
        n_out = sum(1 for ad in ads if ad > 3.0 * mad)
        expected[etype] = (len(cs), n_out, mad / 100.0)
    assert got == expected


def test_lateness_audit_matches_python_frontier(spark, events_dir):
    import math

    from spark_etl_pipeline_spark.operators.timeseries import events_lateness_audit

    sf_dir, rows = events_dir
    got = {
        (r["event_type"], r["late_minutes_bucket"]): r["n"]
        for r in events_lateness_audit(spark, sf_dir).collect()
    }

    epoch = datetime(1970, 1, 1)
    by_type: dict[str, list] = {}
    for eid, ts, _uid, etype, _v, _p in rows:
        us = int((ts - epoch).total_seconds() * 1_000_000)
        by_type.setdefault(etype, []).append((eid, us))
    expected: dict[tuple[str, int], int] = {}
    for etype, seq in by_type.items():
        seq.sort()
        frontier = -1
        for _eid, us in seq:
            frontier = max(frontier, us)
            bucket = min(math.floor((frontier - us) / 60_000_000.0), 60)
            key = (etype, bucket)
            expected[key] = expected.get(key, 0) + 1
    assert got == expected


def test_holt_backtest_matches_python_walkforward(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_holt_backtest

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: (r["n_days"], r["n_forecasts"], r["mae"])
        for r in events_holt_backtest(spark, sf_dir).collect()
    }

    daily = _daily_cents(rows)
    by_type: dict[str, list[float]] = {}
    for (etype, day) in sorted(daily):
        by_type.setdefault(etype, []).append(float(daily[(etype, day)]))
    expected = {}
    for etype, xs in by_type.items():
        if len(xs) < 3:
            continue
        a, b = 0.3, 0.2
        lvl, trend, err = xs[0], xs[1] - xs[0], 0.0
        for x in xs[2:]:
            forecast = lvl + trend
            err = err + float(_round_half_up(abs(x - forecast)))
            new_lvl = a * x + (1.0 - a) * (lvl + trend)
            trend = b * (new_lvl - lvl) + (1.0 - b) * trend
            lvl = new_lvl
        n = len(xs)
        expected[etype] = (n, n - 2, err / float(n - 2) / 100.0)
    assert got == expected


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """A random documents table whose vocabulary includes the BM25
    query terms, several languages, mixed-case + digits + punctuation
    so the BPE regex has real work."""
    rng = random.Random(211)
    vocab = [
        "spark", "window", "merge", "stream", "the", "quick", "brown",
        "Fox", "jumps", "OVER", "lazy", "dog", "42", "3.14", "hello,",
        "world!", "data", "Pipeline", "shuffle", "join",
    ]
    langs = ["en", "de", "fr"]
    rows = []
    for doc_id in range(300):
        words = [rng.choice(vocab) for _ in range(rng.randrange(5, 60))]
        text = " ".join(words)
        rows.append(
            (doc_id, text, rng.choice(langs), f"src{rng.randrange(4)}", len(text))
        )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("docs_props")
    df.write.parquet(str(out / "documents.parquet"))
    return str(out), rows


def test_tokenizer_fertility_matches_python_regex(spark, docs_dir):
    import re

    from spark_etl_pipeline_spark.operators.text import (
        BPE_PATTERN,
        text_tokenizer_fertility,
    )

    sf_dir, rows = docs_dir
    got = {
        r["lang"]: (r["n_docs"], r["bpe_tokens"], r["ws_tokens"], r["fertility"])
        for r in text_tokenizer_fertility(spark, sf_dir).collect()
    }

    agg: dict[str, list[int]] = {}
    for _doc_id, text, lang, _src, _n in rows:
        bpe = len(re.findall(BPE_PATTERN, text.lower()))
        ws = len(re.split(r"\s+", text.strip()))
        cur = agg.setdefault(lang, [0, 0, 0])
        cur[0] += 1
        cur[1] += bpe
        cur[2] += ws
    expected = {
        lang: (n, b, w, float(b) / float(w)) for lang, (n, b, w) in agg.items()
    }
    assert got == expected


def test_bm25_topk_matches_python_scoring(spark, docs_dir):
    import re

    from spark_etl_pipeline_spark.operators.text import (
        BM25_TERMS,
        BM25_TOP_DOCS,
        docs_bm25_topk,
    )

    sf_dir, rows = docs_dir
    got = [
        (r["doc_id"], r["n_terms"], r["score_micro"])
        for r in docs_bm25_topk(spark, sf_dir).collect()
    ]

    toks = {
        doc_id: re.split(r"\s+", text.strip()) for doc_id, text, *_ in rows
    }
    n_docs = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    tf: dict[tuple[int, str], int] = {}
    for doc_id, ts in toks.items():
        for w in ts:
            if w in BM25_TERMS:
                tf[(doc_id, w)] = tf.get((doc_id, w), 0) + 1
    df_t: dict[str, int] = {}
    for (_d, w) in tf:
        df_t[w] = df_t.get(w, 0) + 1
    k1, b = 1.2, 0.75
    scores: dict[int, list[int]] = {}
    for (doc_id, w), f in tf.items():
        idf = (float(n_docs) - float(df_t[w]) + 0.5) / (float(df_t[w]) + 0.5)
        num = float(f) * (k1 + 1.0)
        den = float(f) + k1 * (
            1.0 - b + b * (float(len(toks[doc_id])) / (float(sum_dl) / float(n_docs)))
        )
        scores.setdefault(doc_id, []).append(
            _round_half_up(idf * num / den * 1_000_000)
        )
    ranked = sorted(
        ((doc_id, len(ms), sum(ms)) for doc_id, ms in scores.items()),
        key=lambda t: (-t[2], t[0]),
    )[:BM25_TOP_DOCS]
    assert got == ranked


def test_user_diversity_matches_gini_python(spark, events_dir):
    import math

    from spark_etl_pipeline_spark.operators.timeseries import events_user_diversity

    sf_dir, rows = events_dir
    got = {
        r["impurity_bin"]: (r["n_user_days"], r["n_events"])
        for r in events_user_diversity(spark, sf_dir).collect()
    }

    mix: dict[tuple[int, str], dict[str, int]] = {}
    for _eid, ts, uid, etype, _v, _p in rows:
        key = (uid, ts.strftime("%Y-%m-%d"))
        day = mix.setdefault(key, {})
        day[etype] = day.get(etype, 0) + 1
    expected: dict[int, list[int]] = {}
    for counts in mix.values():
        total = sum(counts.values())
        sq = sum(n * n for n in counts.values())
        impurity = 1.0 - float(sq) / (float(total) * float(total))
        b = math.floor(impurity * 10.0)
        cur = expected.setdefault(b, [0, 0])
        cur[0] += 1
        cur[1] += total
    assert got == {b: tuple(v) for b, v in expected.items()}


def test_transition_matrix_matches_python_pairs(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_transition_matrix

    sf_dir, rows = events_dir
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["share"])
        for r in events_transition_matrix(spark, sf_dir).collect()
    }

    by_user: dict[int, list] = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    pairs: dict[tuple[str, str], int] = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    rowtot: dict[str, int] = {}
    for (a, _b), n in pairs.items():
        rowtot[a] = rowtot.get(a, 0) + n
    expected = {
        (a, b): (n, float(n) / float(rowtot[a])) for (a, b), n in pairs.items()
    }
    assert got == expected


def test_top_paths_matches_python_triples(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import (
        PATHS_TOP_K,
        events_top_paths,
    )

    sf_dir, rows = events_dir
    got = [
        (r["t1"], r["t2"], r["t3"], r["n"])
        for r in events_top_paths(spark, sf_dir).collect()
    ]

    by_user: dict[int, list] = {}
    for eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    triples: dict[tuple[str, str, str], int] = {}
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        for i in range(len(types) - 2):
            k = (types[i], types[i + 1], types[i + 2])
            triples[k] = triples.get(k, 0) + 1
    expected = sorted(
        ((t1, t2, t3, n) for (t1, t2, t3), n in triples.items()),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )[:PATHS_TOP_K]
    assert got == expected


def test_seasonality_matches_python_cells(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_seasonality

    sf_dir, rows = events_dir
    got = {
        (r["dow"], r["hod"]): (r["n"], r["events_per_day"], r["sum_value"])
        for r in events_seasonality(spark, sf_dir).collect()
    }

    cells: dict[tuple[int, int], list] = {}
    for _eid, ts, _uid, _t, value, _p in rows:
        key = (ts.isoweekday(), ts.hour)
        cur = cells.setdefault(key, [0, set(), 0])
        cur[0] += 1
        cur[1].add(ts.date())
        cur[2] += round(value * 100)
    expected = {
        k: (n, float(n) / float(len(days)), float(cents) / 100.0)
        for k, (n, days, cents) in cells.items()
    }
    assert got == expected


def test_value_winsorized_matches_python_clip(spark, events_dir):
    import math

    from spark_etl_pipeline_spark.operators.traindata import events_value_winsorized

    sf_dir, rows = events_dir
    got = {
        r["event_type"]: (r["n"], r["n_clipped"], r["sum_raw"], r["sum_winsorized"])
        for r in events_value_winsorized(spark, sf_dir).collect()
    }

    all_vc = sorted(round(v * 100) for _e, _t, _u, _ty, v, _p in [
        (r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows
    ])
    n = len(all_vc)
    # percentile_disc(p): first value whose cumulative fraction >= p,
    # i.e. the ceil(p*n)-th (1-indexed) element of the sorted list
    lo = all_vc[math.ceil(0.05 * n) - 1]
    hi = all_vc[math.ceil(0.95 * n) - 1]
    agg: dict[str, list] = {}
    for _eid, _ts, _uid, etype, value, _p in rows:
        vc = round(value * 100)
        wc = min(max(vc, lo), hi)
        cur = agg.setdefault(etype, [0, 0, 0, 0])
        cur[0] += 1
        cur[1] += 1 if wc != vc else 0
        cur[2] += vc
        cur[3] += wc
    expected = {
        t: (c, cl, float(sr) / 100.0, float(sw) / 100.0)
        for t, (c, cl, sr, sw) in agg.items()
    }
    assert got == expected


def test_cumulative_reach_matches_first_day_running_sum(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_cumulative_reach

    sf_dir, rows = events_dir
    got = {
        (r["event_type"], r["day"]): (r["new_users"], r["cum_users"])
        for r in events_cumulative_reach(spark, sf_dir).collect()
    }

    first: dict[tuple[str, int], str] = {}
    for _eid, ts, uid, etype, _v, _p in rows:
        d = ts.strftime("%Y-%m-%d")
        key = (etype, uid)
        if key not in first or d < first[key]:
            first[key] = d
    daily: dict[tuple[str, str], int] = {}
    for (etype, _uid), d in first.items():
        daily[(etype, d)] = daily.get((etype, d), 0) + 1
    expected = {}
    for etype in {t for t, _d in daily}:
        cum = 0
        for d in sorted(d for t, d in daily if t == etype):
            cum += daily[(etype, d)]
            expected[(etype, d)] = (daily[(etype, d)], cum)
    assert got == expected


def test_audience_overlap_matches_python_sets(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_audience_overlap

    sf_dir, rows = events_dir
    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
        for r in events_audience_overlap(spark, sf_dir).collect()
    }

    users: dict[str, set] = {}
    for _eid, _ts, uid, etype, _v, _p in rows:
        users.setdefault(etype, set()).add(uid)
    expected = {}
    types = sorted(users)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            nc = len(users[a] & users[b])
            if nc:
                na, nb = len(users[a]), len(users[b])
                expected[(a, b)] = (na, nb, nc, float(nc) / float(na + nb - nc))
    assert got == expected


def test_autocorr_matches_python_moments(spark, events_dir):
    import math

    from spark_etl_pipeline_spark.operators.timeseries import (
        ACF_LAGS,
        events_autocorr,
    )

    sf_dir, rows = events_dir
    got = {
        (r["event_type"], r["lag"]): (r["n"], r["acf"])
        for r in events_autocorr(spark, sf_dir).collect()
    }

    hourly: dict[tuple[str, object], int] = {}
    for _eid, ts, _uid, etype, value, _p in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        key = (etype, h)
        hourly[key] = hourly.get(key, 0) + round(value * 100)
    series: dict[str, list[int]] = {}
    for etype in {t for t, _h in hourly}:
        hs = sorted(h for t, h in hourly if t == etype)
        h0, h1 = hs[0], hs[-1]
        xs, h = [], h0
        while h <= h1:
            xs.append(hourly.get((etype, h), 0))
            h += timedelta(hours=1)
        series[etype] = xs
    expected = {}
    for etype, xs in series.items():
        for k in ACF_LAGS:
            pairs = [(xs[t], xs[t - k]) for t in range(k, len(xs))]
            if not pairs:
                continue
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            nd = float(n)
            vx = nd * sxx - float(sx) * sx
            vy = nd * syy - float(sy) * sy
            acf = (
                (nd * sxy - float(sx) * sy) / (math.sqrt(vx) * math.sqrt(vy))
                if vx > 0 and vy > 0
                else None
            )
            expected[(etype, k)] = (n, acf)
    assert got == expected


@pytest.fixture(scope="module")
def lineitem_dir(spark, tmp_path_factory):
    """A random lineitem incidence with a dense hub (so the 80-core is
    non-empty) plus a sparse tail, and random supplier assignments for
    the bipartite PageRank."""
    rng = random.Random(307)
    hub = list(range(1000, 1100))  # 100 hub parts
    rows = []
    for ok in range(30):  # dense orders: ~90 hub parts each
        for pk in rng.sample(hub, 90):
            rows.append((ok, pk, rng.randrange(1, 40), round(rng.uniform(10, 5000), 2)))
    for ok in range(30, 330):  # sparse tail
        for pk in rng.sample(range(2000, 2400), rng.randrange(2, 8)):
            rows.append((ok, pk, rng.randrange(1, 40), round(rng.uniform(10, 5000), 2)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double",
    )
    out = tmp_path_factory.mktemp("graph_props")
    df.write.parquet(str(out / "lineitem.parquet"))
    parts = sorted({pk for _ok, pk, _sk, _ep in rows})
    spark.createDataFrame(
        [(pk, f"TYPE#{pk % 6}") for pk in parts], "p_partkey long, p_type string"
    ).write.parquet(str(out / "part.parquet"))
    return str(out), rows


def _python_copurchase_edges(rows):
    orders: dict[int, set] = {}
    for ok, pk, _sk, _ep in rows:
        orders.setdefault(ok, set()).add(pk)
    edges = set()
    for pks in orders.values():
        s = sorted(pks)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                edges.add((a, b))
    return edges


def _python_triangles(edges):
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # each triangle is seen from all 3 of its edges
    return sum(len(adj[a] & adj[b]) for a, b in edges) // 3


def test_graph_triangles_matches_python(spark, lineitem_dir):
    from spark_etl_pipeline_spark.operators.graph import graph_triangles

    sf_dir, rows = lineitem_dir
    [r] = graph_triangles(spark, sf_dir).collect()
    edges = _python_copurchase_edges(rows)
    assert (r["n_edges"], r["n_triangles"]) == (
        len(edges),
        _python_triangles(edges),
    )


def test_clustering_coeff_matches_python(spark, lineitem_dir):
    from spark_etl_pipeline_spark.operators.graph import graph_clustering_coeff

    sf_dir, rows = lineitem_dir
    [r] = graph_clustering_coeff(spark, sf_dir).collect()
    edges = _python_copurchase_edges(rows)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    nw = sum(d * (d - 1) // 2 for d in deg.values())
    nt = _python_triangles(edges)
    assert (
        r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"], r["global_cc"]
    ) == (len(deg), len(edges), nw, nt, float(3 * nt) / float(nw))


def test_kcore_matches_python_bounded_peeling(spark, lineitem_dir):
    from spark_etl_pipeline_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        graph_kcore,
    )

    sf_dir, rows = lineitem_dir
    got = {
        r["degree"]: r["n_nodes"] for r in graph_kcore(spark, sf_dir).collect()
    }

    edges = _python_copurchase_edges(rows)
    alive = {n for e in edges for n in e}
    for _ in range(KCORE_ROUNDS):
        deg: dict[int, int] = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= KCORE_K}
    hist: dict[int, int] = {}
    final_deg: dict[int, int] = {}
    for a, b in edges:
        if a in alive and b in alive:
            final_deg[a] = final_deg.get(a, 0) + 1
            final_deg[b] = final_deg.get(b, 0) + 1
    for d in final_deg.values():
        hist[d] = hist.get(d, 0) + 1
    assert got == hist
    assert got, "fixture produced an empty k-core — test has no teeth"


def test_pagerank_matches_python_integer_iteration(spark, lineitem_dir):
    from spark_etl_pipeline_spark.operators.graph import (
        PR_ITERS,
        PR_TOP_K,
        RANK_SCALE,
        graph_pagerank_suppliers,
    )

    sf_dir, rows = lineitem_dir
    got = [
        (r["s_suppkey"], r["rank"])
        for r in graph_pagerank_suppliers(spark, sf_dir).collect()
    ]

    pairs = {(pk * 2, sk * 2 + 1) for _ok, pk, sk, _ep in rows}
    edges = [(p, s) for p, s in pairs] + [(s, p) for p, s in pairs]
    deg: dict[int, int] = {}
    for src, _dst in edges:
        deg[src] = deg.get(src, 0) + 1
    reset = (15 * RANK_SCALE) // 100
    r = {n: RANK_SCALE for n in deg}
    for _ in range(PR_ITERS):
        sc: dict[int, int] = {}
        for src, dst in edges:
            if src in r:
                sc[dst] = sc.get(dst, 0) + r[src] // deg[src]
        r = {n: reset + (85 * s) // 100 for n, s in sc.items()}
    sups = sorted(
        (((n - 1) // 2, v) for n, v in r.items() if n % 2 == 1),
        key=lambda t: (-t[1], t[0]),
    )[:PR_TOP_K]
    assert got == sups


def test_attribution_matches_python_last_touch(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_attribution

    sf_dir, rows = events_dir
    got = {
        r["purchase_id"]: (
            r["user_id"], r["purchase_ts"], r["click_id"], r["us_since_click"]
        )
        for r in events_attribution(spark, sf_dir).collect()
    }

    epoch = datetime(1970, 1, 1)

    def us(ts):
        return int((ts - epoch).total_seconds() * 1_000_000)

    clicks: dict[int, list] = {}
    for eid, ts, uid, etype, _v, _p in rows:
        if etype == "click":
            clicks.setdefault(uid, []).append((ts, eid))
    expected = {}
    for eid, ts, uid, etype, _v, _p in rows:
        if etype != "purchase":
            continue
        lo = ts - timedelta(hours=1)
        cands = [
            (cts, cid) for cts, cid in clicks.get(uid, []) if lo <= cts < ts
        ]
        best = max(cands) if cands else None
        expected[eid] = (
            uid,
            ts.strftime("%Y-%m-%d %H:%M:%S"),
            best[1] if best else None,
            us(ts) - us(best[0]) if best else None,
        )
    assert got == expected


def test_gap_fill_lerp_matches_python_interpolation(spark, events_dir):
    from spark_etl_pipeline_spark.operators.timeseries import events_gap_fill_lerp

    sf_dir, rows = events_dir
    got = {
        (r["event_type"], r["hour"]): (r["amount"], r["interp_amount"], r["fill_kind"])
        for r in events_gap_fill_lerp(spark, sf_dir).collect()
    }

    hourly: dict[tuple[str, object], int] = {}
    for _eid, ts, _uid, etype, value, _p in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        key = (etype, h)
        hourly[key] = hourly.get(key, 0) + round(value * 100)
    expected = {}
    for etype in {t for t, _h in hourly}:
        hs = sorted(h for t, h in hourly if t == etype)
        spine, h = [], hs[0]
        while h <= hs[-1]:
            spine.append(h)
            h += timedelta(hours=1)
        obs = [
            (i + 1, hourly.get((etype, h))) for i, h in enumerate(spine)
        ]
        for idx, (i, c) in enumerate(obs):
            h = spine[idx]
            hour_str = h.strftime("%Y-%m-%d %H:%M:%S")
            if c is not None:
                expected[(etype, hour_str)] = (
                    float(c) / 100.0, float(c) / 100.0, "obs"
                )
                continue
            prev = next(
                ((j, cc) for j, cc in reversed(obs[:idx]) if cc is not None), None
            )
            nxt = next(
                ((j, cc) for j, cc in obs[idx + 1 :] if cc is not None), None
            )
            if nxt is None:
                expected[(etype, hour_str)] = (None, float(prev[1]) / 100.0, "ffill")
            else:
                pi, pc = prev
                ni, nc = nxt
                lerp = float(pc) + float(nc - pc) * (
                    float(i - pi) / float(ni - pi)
                )
                expected[(etype, hour_str)] = (None, lerp / 100.0, "lerp")
    assert got == expected


def test_funnel_windowed_matches_python_stages(spark, events_dir):
    from spark_etl_pipeline_spark.operators.traindata import (
        FUNNEL_WINDOW_HOURS,
        events_funnel_windowed,
    )

    sf_dir, rows = events_dir
    got = {
        r["step"]: r["n_users"]
        for r in events_funnel_windowed(spark, sf_dir).collect()
    }

    w = timedelta(hours=FUNNEL_WINDOW_HOURS)
    by_user: dict[int, list] = {}
    for _eid, ts, uid, etype, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, etype))
    t1, t2, t3 = {}, {}, {}
    for uid, evs in by_user.items():
        views = [ts for ts, t in evs if t == "view"]
        if not views:
            continue
        t1[uid] = min(views)
        clicks = [ts for ts, t in evs if t == "click" and t1[uid] <= ts <= t1[uid] + w]
        if not clicks:
            continue
        t2[uid] = min(clicks)
        buys = [ts for ts, t in evs if t == "purchase" and t2[uid] <= ts <= t2[uid] + w]
        if buys:
            t3[uid] = min(buys)
    assert got == {"1_view": len(t1), "2_click": len(t2), "3_purchase": len(t3)}


@pytest.fixture(scope="module")
def orders_dir(spark, tmp_path_factory):
    """Random orders spanning ~4 years with whale customers, so every
    RFM band and the Pareto head are populated."""
    from datetime import date

    rng = random.Random(401)
    rows = []
    okey = 0
    for ck in range(80):
        n = rng.randrange(1, 21)
        whale = rng.random() < 0.15
        for _ in range(n):
            okey += 1
            d = date(2021, 1, 1) + timedelta(days=rng.randrange(0, 1500))
            tp = round(rng.uniform(1000, 20000) * (3 if whale else 1), 2)
            rows.append((okey, ck, d, tp))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = tmp_path_factory.mktemp("orders_props")
    df.write.parquet(str(out / "orders.parquet"))
    return str(out), rows


def _cust_cents(rows):
    rev: dict[int, int] = {}
    for _ok, ck, _d, tp in rows:
        rev[ck] = rev.get(ck, 0) + round(tp * 100)
    return rev


def test_pareto_matches_python_cumshare(spark, orders_dir):
    from spark_etl_pipeline_spark.plans.relational import rel_pareto_customers

    sf_dir, rows = orders_dir
    got = [
        (r["rnk"], r["o_custkey"], r["revenue"], r["cum_share"], r["cust_share"])
        for r in rel_pareto_customers(spark, sf_dir).collect()
    ]

    rev = _cust_cents(rows)
    total = sum(rev.values())
    n_cust = len(rev)
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    expected = []
    for i, (ck, cents) in enumerate(ranked[:25], start=1):
        cum += cents
        expected.append(
            (
                i,
                ck,
                float(cents) / 100.0,
                float(cum) / float(total),
                float(i) / float(n_cust),
            )
        )
    assert got == expected


def test_gini_matches_python_rank_formula(spark, orders_dir):
    from spark_etl_pipeline_spark.plans.relational import rel_gini_revenue

    sf_dir, rows = orders_dir
    [r] = rel_gini_revenue(spark, sf_dir).collect()

    rev = _cust_cents(rows)
    ranked = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    total = sum(c for _, c in ranked)
    weighted = sum(i * c for i, (_, c) in enumerate(ranked, start=1))
    # exact-integer numerator, ONE double conversion — the engine's
    # contract (a double-domain subtraction loses cancelled low bits
    # once 2w and (n+1)t pass 2^53; Python ints make the ref exact)
    gini = float(2 * weighted - (n + 1) * total) / (n * float(total))
    assert (r["n"], r["total_revenue"], r["gini"]) == (
        n, float(total) / 100.0, gini
    )


def test_rfm_matches_python_banding(spark, orders_dir):
    from spark_etl_pipeline_spark.plans.relational import (
        RFM_FREQ,
        RFM_MONETARY_CENTS,
        RFM_RECENT_DAYS,
        rel_rfm_segmentation,
    )

    sf_dir, rows = orders_dir
    got = {
        r["custkey"]: (
            r["recency_days"], r["frequency"], r["monetary"],
            r["r_score"], r["f_score"], r["m_score"],
        )
        for r in rel_rfm_segmentation(spark, sf_dir).collect()
    }

    refd = max(d for _ok, _ck, d, _tp in rows)
    per: dict[int, list] = {}
    for _ok, ck, d, tp in rows:
        cur = per.setdefault(ck, [None, 0, 0])
        cur[0] = d if cur[0] is None else max(cur[0], d)
        cur[1] += 1
        cur[2] += round(tp * 100)
    expected = {}
    for ck, (last, freq, cents) in per.items():
        rec = (refd - last).days
        expected[ck] = (
            rec,
            freq,
            float(cents) / 100.0,
            3 if rec <= RFM_RECENT_DAYS[0] else 2 if rec <= RFM_RECENT_DAYS[1] else 1,
            3 if freq >= RFM_FREQ[0] else 2 if freq >= RFM_FREQ[1] else 1,
            3 if cents >= RFM_MONETARY_CENTS[0] else 2 if cents >= RFM_MONETARY_CENTS[1] else 1,
        )
    assert got == expected


def test_cap_per_source_matches_python_md5_order(spark, docs_dir):
    import hashlib

    from spark_etl_pipeline_spark.operators.traindata import (
        SOURCE_CAP,
        docs_cap_per_source,
    )

    sf_dir, rows = docs_dir
    got = {
        r["doc_id"]: (r["source"], r["lang"], r["n_source"])
        for r in docs_cap_per_source(spark, sf_dir).collect()
    }

    by_source: dict[str, list] = {}
    for doc_id, _text, lang, source, _n in rows:
        by_source.setdefault(source, []).append((doc_id, lang))
    expected = {}
    for source, docs in by_source.items():
        ordered = sorted(
            docs,
            key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]),
        )
        for doc_id, lang in ordered[:SOURCE_CAP]:
            expected[doc_id] = (source, lang, len(docs))
    assert got == expected


def test_supplier_hhi_matches_python_squared_shares(spark, lineitem_dir):
    from spark_etl_pipeline_spark.plans.relational import rel_supplier_hhi

    sf_dir, rows = lineitem_dir
    got = {
        r["p_type"]: (r["n_suppliers"], r["hhi_micro"])
        for r in rel_supplier_hhi(spark, sf_dir).collect()
    }

    cells: dict[tuple[str, int], int] = {}
    for _ok, pk, sk, ep in rows:
        key = (f"TYPE#{pk % 6}", sk)
        cells[key] = cells.get(key, 0) + round(ep * 100)
    tot: dict[str, int] = {}
    for (t, _sk), c in cells.items():
        tot[t] = tot.get(t, 0) + c
    expected: dict[str, list] = {}
    for (t, _sk), c in cells.items():
        cur = expected.setdefault(t, [0, 0])
        cur[0] += 1
        cur[1] += _round_half_up((float(c) / float(tot[t])) ** 2 * 1_000_000)
    assert got == {t: tuple(v) for t, v in expected.items()}
