"""Char-by-char membership pins for every PII/text regex class (r10).

Round 9 shipped a one-character bug whose entire blast radius was a
character-class RANGE: ``[^a-zA-Z0-9._%+-@]`` — the ``+-@`` intended as
three literals parses as U+002B–U+0040, silently adding ``,;:<=>?/`` to
the class, so the email anchor never fired after a comma and a >64-char
local part leaked its head in cleartext. Hypothesis caught it — but
only probabilistically (the builder's run passed, the judge's failed).

This suite is the deterministic commit-time version (VERDICT r9 task
3): extract every bracket class from the pattern constants in
``traindata.py`` / ``text.py`` and assert its membership CHAR-BY-CHAR
over printable ASCII against a declared allowlist. ASCII class
semantics are identical across Python ``re``, Java ``j.u.regex``, and
RE2, so a Python-side pin guards both engines. No randomness — an
accidental range cannot pass, because every char it would add is
asserted individually.
"""

from __future__ import annotations

# Second-verification-axis marker: tests in this module check operators
# against an INDEPENDENT reference (plain Python/pandas/declared
# allowlists), not the DuckDB oracle. COVERAGE.md's property-test tally
# is derived by counting test functions in marked modules
# (tests/test_registry_contract.py::test_doc_counts_are_derived).
SECOND_AXIS_INDEPENDENT_REFERENCE = True

import re
import string

import pytest

from spark_etl_pipeline_spark.operators.text import BPE_PATTERN
from spark_etl_pipeline_spark.operators.traindata import (
    EMAIL_ANCHORED,
    EMAIL_RESIDUE,
    PII_PATTERNS,
)

#: Probe alphabet: all printable ASCII plus the whitespace controls the
#: patterns can meet in real text. ASCII-only on purpose — the classes
#: are ASCII-only, and ASCII is where Python/Java/RE2 agree exactly.
PROBE = [chr(c) for c in range(0x20, 0x7F)] + ["\t", "\n", "\r"]

_CLASS_RX = re.compile(r"\[\^?(?:\\.|[^\]\\])*\]")


def classes_of(pattern: str) -> list[str]:
    """All bracket classes of *pattern*, in source order."""
    return _CLASS_RX.findall(pattern)


def membership(cls: str) -> set[str]:
    """The exact subset of PROBE the class *cls* matches."""
    rx = re.compile(cls)
    return {ch for ch in PROBE if rx.fullmatch(ch)}


#: The email local-part alphabet — the single source of truth the
#: allowlists below derive from. Matches the class spelled in
#: ``EMAIL_ANCHORED`` pass-2 group and ``EMAIL_RESIDUE``.
LOCAL_CHARS = set(string.ascii_letters + string.digits + "._%+-")
DOMAIN_CHARS = set(string.ascii_letters + string.digits + ".-")
TLD_CHARS = set(string.ascii_letters)

#: The anchor class is NEGATED: it must match exactly everything in
#: PROBE that is neither a local-part char nor ``@`` (the one non-class
#: char that occurs inside an email's own span — see the constant's
#: docstring). The round-9 bug removed ``, / : ; < = > ?`` from this
#: set; each is asserted individually below.
ANCHOR_EXPECTED = set(PROBE) - LOCAL_CHARS - {"@"}


def test_email_anchored_class_inventory():
    """EMAIL_ANCHORED has exactly four classes, in this order."""
    got = classes_of(EMAIL_ANCHORED)
    assert got == [
        "[^a-zA-Z0-9._%@+-]",  # anchor (negated; dash LAST = literal)
        "[a-zA-Z0-9._%+-]",  # local part
        "[a-zA-Z0-9.-]",  # domain
        "[a-zA-Z]",  # TLD
    ]


def test_email_anchor_class_membership_char_by_char():
    got = membership(classes_of(EMAIL_ANCHORED)[0])
    missing = ANCHOR_EXPECTED - got
    extra = got - ANCHOR_EXPECTED
    assert not missing and not extra, (sorted(missing), sorted(extra))


@pytest.mark.parametrize("sep", [",", "/", ":", ";", "<", "=", ">", "?"])
def test_range_hazard_separators_anchor_individually(sep):
    """The eight chars the ``+-@`` range typo silently excluded: each
    MUST be an anchor (the class matches it), or pass 1 never fires
    after it and over-long local parts leak their head."""
    anchor = re.compile(classes_of(EMAIL_ANCHORED)[0])
    assert anchor.fullmatch(sep), (
        f"{sep!r} (U+{ord(sep):04X}) is not an anchor char — "
        "check the class for an accidental range"
    )


def test_email_local_and_residue_class_membership():
    local_anch = membership(classes_of(EMAIL_ANCHORED)[1])
    res_classes = classes_of(EMAIL_RESIDUE)
    assert res_classes == ["[a-zA-Z0-9._%+-]", "[a-zA-Z0-9.-]", "[a-zA-Z]"]
    assert local_anch == LOCAL_CHARS
    assert membership(res_classes[0]) == LOCAL_CHARS
    assert membership(res_classes[1]) == DOMAIN_CHARS
    assert membership(res_classes[2]) == TLD_CHARS
    assert membership(classes_of(EMAIL_ANCHORED)[2]) == DOMAIN_CHARS
    assert membership(classes_of(EMAIL_ANCHORED)[3]) == TLD_CHARS


def test_anchored_and_residue_local_classes_are_identical():
    """Pass 1 and pass 2 must agree on what a local-part char IS —
    divergence would let pass 2 re-match inside pass 1's replacements."""
    assert membership(classes_of(EMAIL_ANCHORED)[1]) == membership(
        classes_of(EMAIL_RESIDUE)[0]
    )


def test_pii_ip_and_num_patterns_have_no_bracket_classes():
    """[IP]/[NUM] use only \\d and literals — keep it that way; a
    bracket class appearing here should force a conscious pin."""
    for pat, _tag in PII_PATTERNS:
        assert classes_of(pat) == [], pat


def test_bpe_pattern_class_membership():
    """BPE_PATTERN's three classes: lower, digit, and the negated
    catch-all (everything printable except lower/digit/whitespace).

    The negated class carries an EXPLICIT \\x0b: this is the one spot
    where the module docstring's "ASCII class semantics are identical
    across Python/Java/RE2" does not hold — \\s includes vertical tab
    in Python ``re`` and Java but NOT in RE2, so DuckDB counted a
    \\x0b as a punctuation token where Spark saw whitespace (r14
    seed-505 fuzz finding). Python ``re`` models the JAVA side here,
    so the explicit escape is membership-redundant under this suite's
    engine but load-bearing for the oracle's RE2."""
    got = classes_of(BPE_PATTERN)
    assert got == ["[a-z]", "[0-9]", "[^a-z0-9\\s\\x0b]"]
    assert membership(got[0]) == set(string.ascii_lowercase)
    assert membership(got[1]) == set(string.digits)
    expected = (
        set(PROBE)
        - set(string.ascii_lowercase)
        - set(string.digits)
        - {" ", "\t", "\n", "\r"}
    )
    assert membership(got[2]) == expected
    # the class must reject vertical tab under BOTH \s conventions:
    # via \s in Python/Java, via the explicit \x0b in RE2
    assert not re.compile(got[2]).fullmatch("\x0b")


def test_no_mid_class_dash_range_in_any_pii_class():
    """Generic guard over every class in the PII constants: an unescaped
    ``-`` must be first, last, or part of a DECLARED range (a-z, A-Z,
    0-9). Any other position is the exact hazard that shipped in r9."""
    allowed_ranges = {"a-z", "A-Z", "0-9"}
    pats = [EMAIL_ANCHORED, EMAIL_RESIDUE, BPE_PATTERN]
    pats += [p for p, _ in PII_PATTERNS]
    for pat in pats:
        for cls in classes_of(pat):
            body = cls[1:-1]
            if body.startswith("^"):
                body = body[1:]
            i = 0
            while i < len(body):
                if body[i] == "\\":
                    i += 2
                    continue
                if body[i] == "-" and 0 < i < len(body) - 1:
                    rng = body[i - 1 : i + 2]
                    assert rng in allowed_ranges, (cls, rng)
                    i += 2
                    continue
                i += 1
