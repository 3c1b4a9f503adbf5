"""Property tests for the anchored PII email pattern (round 9).

The round-8 giant sweep bounded the email local part to stop Java's
O(run²) backtracking; the round-9 advice pass found the bound alone
matches MID-TOKEN on an over-long local part — redacting only its
trailing chars and leaving the head of the address in cleartext. The
fix anchors the match to the start of its character run via a captured
preceding non-class char, making redaction ALL-OR-NOTHING: a local
part within the {1,256} bound redacts wholly, one beyond it is not
treated as an email at all (the documented adversarial contract
boundary — long digit runs inside still fall to [NUM]).

These properties pin that contract on RANDOMIZED inputs, cross-engine:
Spark's Java regex (``scrub_pii``) and DuckDB's RE2 (``_duck_scrub`` /
``_DUCK_NRED``) must agree byte-for-byte on scrubbed text and count,
for local parts straddling the bound, at run starts/middles/ends, and
with the anchor character drawn from real separator classes.
"""

from __future__ import annotations

# Second-verification-axis marker: tests in this module check operators
# against an INDEPENDENT reference (plain Python/pandas/declared
# allowlists), not the DuckDB oracle. COVERAGE.md's property-test tally
# is derived by counting test functions in marked modules
# (tests/test_registry_contract.py::test_doc_counts_are_derived).
SECOND_AXIS_INDEPENDENT_REFERENCE = True

import random

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.operators.traindata import (
    _DUCK_NRED,
    _duck_scrub,
    scrub_pii,
)

LOCAL_BOUND = 256  # the pattern's {1,256} local-part bound

_words = st.lists(
    st.sampled_from(["alpha", "beta", "report", "metric", "x1", "q"]),
    min_size=1,
    max_size=6,
)
# lengths clustered around the anchor-relevant boundaries
_local_len = st.one_of(
    st.integers(1, 70),
    st.integers(LOCAL_BOUND - 2, LOCAL_BOUND + 2),
    st.integers(300, 400),
)
#: Every printable char in U+002B–U+0040 that is NOT a local-part-class
#: char. These are exactly the chars a mid-class ``+-@`` RANGE typo
#: silently adds to the anchor's negated class (the shipped round-9
#: bug): the anchor then never fires after them and a >64-char local
#: part leaks its head. Kept exhaustive in BOTH the strategy and the
#: pinned @example set below so no hypothesis luck is involved.
_RANGE_HAZARD_SEPS = [",", "/", ":", ";", "<", "=", ">", "?"]
_sep = st.sampled_from([" ", "\t", "(", "!", "#"] + _RANGE_HAZARD_SEPS)


def _spark_scrub(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scrubbed, n = scrub_pii(F.col("text"))
    return {
        r.doc_id: (r.clean, r.n)
        for r in df.select(
            "doc_id", scrubbed.alias("clean"), n.alias("n")
        ).collect()
    }


def _duck_scrub_rows(rows):
    import pandas as pd

    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    out = con.sql(
        f"SELECT doc_id, {_duck_scrub('text')} AS clean, "
        f"CAST({_DUCK_NRED} AS BIGINT) AS n FROM documents"
    ).fetchall()
    con.close()
    return {r[0]: (r[1], r[2]) for r in out}


@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=_words,
    llen=_local_len,
    sep=_sep,
    seed=st.integers(0, 2**31),
    pos_raw=st.integers(0, 8),
)
# The round-9 shipped bug's falsifying example, pinned deterministically
# (VERDICT r9 task 1): sep=',' at pos>=1 with a 65-char local part drew
# 'alpha,p[EMAIL]' instead of 'alpha,[EMAIL]' under the '+-@' range
# typo. One pin per hazard separator so EVERY char the range silently
# added to the anchor class is exercised on every run, no hypothesis
# luck involved.
@example(words=["alpha"], llen=65, sep=",", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep="/", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep=":", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep=";", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep="<", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep="=", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep=">", seed=0, pos_raw=1)
@example(words=["alpha"], llen=65, sep="?", seed=0, pos_raw=1)
# boundary pins: the exact bound, one past it, and the residue bound
@example(words=["alpha"], llen=256, sep=",", seed=0, pos_raw=1)
@example(words=["alpha"], llen=257, sep=",", seed=0, pos_raw=1)
@example(words=["alpha"], llen=64, sep=",", seed=0, pos_raw=1)
def test_email_redaction_is_all_or_nothing_cross_engine(
    spark, words, llen, sep, seed, pos_raw
):
    """For any local-part length and separator context, both engines
    agree exactly, and the outcome follows the documented contract:
    within the {1,256} bound the WHOLE address becomes [EMAIL] (no
    cleartext residue of the local part); beyond it the residue pass
    redacts the trailing 64-char local + domain — head exposure only
    on that adversarial shape, never a fully-cleartext address."""
    rng = random.Random(seed)
    # letters-only local part: digit runs >= 6 inside an email are
    # ALSO counted/replaced by the [NUM] pattern (the documented
    # overlapping-class contract, identical in both engines) — this
    # test isolates the email anchor, so keep [NUM] out of frame
    local = "".join(rng.choice("abcdefghjkmnpqrs") for _ in range(llen))
    email = f"{local}@ex{rng.randrange(9)}.example.org"
    pos = min(pos_raw, len(words))
    parts = words[:pos] + [email] + words[pos:]
    text = sep.join(parts)
    rows = [(0, text)]

    got_spark = _spark_scrub(spark, rows)
    got_duck = _duck_scrub_rows(rows)
    assert got_spark == got_duck, (llen, sep, got_spark, got_duck)

    clean, n = got_spark[0]
    if llen <= LOCAL_BOUND:
        assert n == 1
        # exactly the WHOLE address was replaced (no cleartext residue
        # of the local part); the surrounding words survive untouched
        assert clean == sep.join(words[:pos] + ["[EMAIL]"] + words[pos:])
    else:
        # over the anchored bound: the residue pass redacts the
        # trailing 64-char local + domain — head exposure only, never
        # a fully-cleartext address
        assert n == 1
        assert clean == sep.join(
            words[:pos] + [local[: llen - 64] + "[EMAIL]"] + words[pos:]
        )


def test_adjacent_emails_separated_by_class_chars(spark):
    """The round-9 review's leak repro, pinned: two (or three) fully
    well-formed addresses separated by a LOCAL-PART-CLASS char (-, +,
    _, %). The anchored pass alone cannot fire on the second address —
    after match 1 the scan resumes on the class char, so the anchor
    never matches and the address survived in cleartext. The residue
    pass must catch the whole chain (it may consume the class-char
    separator into the redaction — over-redaction of one separator is
    the accepted cost)."""
    rows = [
        (0, "a@b.cc-c@d.cc"),
        (1, "x alice@ex.example.org+bob@ex.example.org y"),
        (2, "a@b.cc-c@d.cc-e@f.gg"),
    ]
    got_spark = _spark_scrub(spark, rows)
    assert got_spark == _duck_scrub_rows(rows)
    for doc_id, text in rows:
        clean, n = got_spark[doc_id]
        assert "@" not in clean, (doc_id, clean)  # NO address survives
        assert n == text.count("@")


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n_emails=st.integers(1, 5), data=st.data())
def test_redaction_count_equals_planted_count_cross_engine(
    spark, n_emails, data
):
    """Counts equal the planted email count (all within bound), and the
    two engines agree on every row — including adjacent emails where
    one address's match must not consume the next one's anchor."""
    rng = random.Random(data.draw(st.integers(0, 2**31)))
    emails = [
        f"u{rng.randrange(999)}.x+t@m{rng.randrange(9)}.example.com"
        for _ in range(n_emails)
    ]
    text = " ".join(emails)
    rows = [(0, text)]
    got_spark = _spark_scrub(spark, rows)
    got_duck = _duck_scrub_rows(rows)
    assert got_spark == got_duck
    clean, n = got_spark[0]
    assert n == n_emails
    assert clean == " ".join(["[EMAIL]"] * n_emails)


def test_string_start_anchor(spark):
    """The ^ alternative of the anchor: an email at position 0 redacts
    wholly (there is no preceding char to capture)."""
    rows = [(0, "bob@ex.example.org wrote this")]
    got_spark = _spark_scrub(spark, rows)
    assert got_spark == _duck_scrub_rows(rows)
    assert got_spark[0] == ("[EMAIL] wrote this", 1)
