"""Random-corpus (distribution-fuzz) pins.

``tools/stage_random.py`` draws a fresh corpus per seed that honors the
documented corpus contract (schemas, unique keys, real categorical
domains) while randomizing every distribution. Its first full-registry
sweep (seed 1) found three oracle divergences the fixed driver corpus
can never surface — all traceable to two data edges the fixtures don't
contain:

- EMPTY text cells (min ``n_chars`` in the driver corpus is 47):
  SQL-split of ``''`` yields ``['']`` in both engines, but the UDTF
  chunker tokenizes Python-side where ``''.split()`` is ``[]``
  (text_chunks_udtf), and mm_resize's oracle built its byte-sample
  over ``generate_series(0, -1)`` → NULL where the engine resizes an
  empty payload to 0 bytes;
- an ALL-SPECIAL day (a day whose every ``value`` is NaN/±Inf, so the
  special-guarded cents sum is NULL): a NULL inside the sorted
  pairwise-slope list lands FIRST in Spark's ``sort_array`` but LAST
  in DuckDB's ``list_sort``, silently shifting the Theil-Sen median
  (equal n_slopes, different slope). Both sides now drop
  unobservable days.

Seed 2 then found the CRASH class seed 1 happened to miss: ZERO-NORM
embeddings. One all-zero vector crashed 11 similarity-family queries
with ANSI ``DIVIDE_BY_ZERO`` (the cosine denominator). The shared
``load_vectors`` usable-vector gate now drops direction-less vectors
with the arithmetic-free, bit-portable ``exists(v, x -> x != 0)``,
mirrored by 14 ``len(list_filter(embedding, x -> x <> 0)) > 0``
oracle predicates.

Seed 7 found the fabricated-aggregate class: a user whose EVERY value
is non-finite. The stateful profile accumulator
(``running_user_profiles``) emitted its 0.0 initial state where SQL
SUM over zero finite observations is NULL — silently fabricating a
total for a fully-damaged key. The state now tracks ``n_finite`` and
emits NULL until a finite measurement arrives.

The ``--props-edge`` band (exotic-but-real JSON payloads: boundary
ints, floats, nulls, wrong types, oversized ints, malformed text)
found three CRASH classes in the three props consumers — VARIANT
``parse_json`` FAILFAST, an ANSI sum overflow through a bigint-declared
field, and CAST_INVALID_INPUT on a non-integral extracted token — plus
a twin asymmetry: DuckDB's string→int TRY_CAST ROUNDS decimals
('3.5' → 4) where Spark's try_cast rejects them. All three paths now
extract with try-semantics at every layer, and the oracles guard with
``json_valid`` + a ``json_type`` whitelist of the cross-engine
coercible JSON types. r13 tightened the whitelist's VARCHAR arm to
INTEGER-SHAPED strings (ADVICE r12): DuckDB's string→int TRY_CAST
coerces quoted decimals/scientific notation ('3.5' → 4, '1e3' → 1000)
where Spark's try_cast rejects both — the corpus now carries those
payloads and a whitespace-padded quoted integer that BOTH engines
accept. r13 also fixed the UDTF chunker's oracle guard: text whose
first character after the space-trim is a TAB/NEWLINE splits to a
leading EMPTY token in BOTH tokenizers, so only the genuinely-empty
single-empty-token split may be dropped — make_text now pads a few
docs with leading/trailing non-space whitespace to hold the premise.

r14 widened the VARCHAR arm's pad class to [\x00-\x20\x7f] — the
EXACT set Spark's cast strips (exhaustive codepoint probe; ADVICE
r13) — with a regexp-strip before DuckDB's narrower TRY_CAST, and the
corpus now plants control-char-padded payloads (every hazard class at
least once per staging).

Seed 202 (r14, full-registry refresh sweep) found the metric-mismatch
class: DuckDB's levenshtein counts UTF-8 BYTES where Spark's counts
codepoints, so a near-dup pair containing 'été' scored 7 oracle-side
vs 6 engine-side. dedup_fuzzy_levenshtein's contract is now BYTE-level
edit distance (the standard large-scale metric), computed Spark-side
via latin1 reinterpretation of the UTF-8 bytes — exact in both
engines on any corpus.

r15 pinned the byte contract at the UTF-8 boundary (VERDICT r14 task
5): the token pool grew NFD-decomposed twins, U+FFFD replacement
residue, astral-plane 4-byte codepoints, and latin1-misdecoded
double-encoding, with a three-way premise pin (python byte-DP vs
DuckDB vs the Spark latin1 trick) and a proof that lone surrogates
cannot reach a parquet string column at all (so "malformed UTF-8" is
outside the corpus contract by construction, not by hope).

This module pins the staged premises (the edges are actually present)
and the post-fix agreement on the seed-1, seed-2, seed-7, and
props-edge corpora.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from spark_etl_pipeline_spark.plans import registry
from tests.conftest import SF_SMOKE
from tests.test_hostile_inputs import _assert_matches_oracle

PINNED = [
    "text_chunks_udtf",
    "text_chunking",
    "mm_resize",
    "events_theilsen_trend",
]


@pytest.fixture(scope="module")
def random_dir(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.stage_random import stage

    out = str(tmp_path_factory.mktemp("randcorpus") / "seed1")
    stage(SF_SMOKE, out, seed=1)
    return out


@pytest.fixture(scope="module")
def random_duck(random_dir):
    con = duckdb.connect()
    for t in registry.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{random_dir}/{t}.parquet'")
    yield con
    con.close()


def test_premise_contains_the_fuzzed_edges(random_duck):
    """The seed-1 corpus actually contains the two data edges the pins
    exist for; if the generator drifts, fail here, not silently."""
    n_empty = random_duck.sql(
        "SELECT count(*) FROM documents WHERE trim(text) = ''"
    ).fetchone()[0]
    assert n_empty >= 1, "seed-1 corpus lost its empty-text documents"
    n_unobservable_days = random_duck.sql(
        """
        SELECT count(*) FROM (
            SELECT event_type, CAST(ts AS DATE) AS d
            FROM events GROUP BY 1, 2
            HAVING SUM(TRY_CAST(round(value * 100) AS BIGINT)) IS NULL
        )
        """
    ).fetchone()[0]
    assert n_unobservable_days >= 1, (
        "seed-1 corpus lost its all-special (unobservable-cents) day"
    )
    # non-space-whitespace-PADDED text with real content: a space-only
    # trim keeps the pad, so the whitespace split yields an EMPTY
    # boundary token — both tokenizers emit it and the UDTF oracle must
    # keep the row (ADVICE r12: the old t[1] <> '' guard dropped it).
    # \x0b joined the WS_PAD pool in r14 with the [\s\x0b] oracle-split
    # widening, so the premise class includes it.
    n_ws_padded = random_duck.sql(
        r"""
        SELECT count(*) FROM documents
        WHERE trim(text) <> ''
          AND regexp_matches(trim(text), '^[\t\n\r\f\x0b]|[\t\n\r\f\x0b]$')
        """
    ).fetchone()[0]
    assert n_ws_padded >= 1, (
        "seed-1 corpus lost its tab/newline-padded non-empty documents"
    )


@pytest.mark.parametrize("name", PINNED)
def test_agrees_with_oracle_on_random_corpus(
    spark, random_dir, random_duck, name
):
    registry.load_all()
    spdf = registry.queries()[name](spark, random_dir).toPandas()
    dpdf = random_duck.sql(registry.oracles()[name]).df()
    _assert_matches_oracle(name, spdf, dpdf)


SIM_PINNED = [
    "sim_topk_cosine",
    "sim_ivf_kmeans",
    "dedup_embedding_cosine",
]


@pytest.fixture(scope="module")
def random_dir2(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.stage_random import stage

    out = str(tmp_path_factory.mktemp("randcorpus") / "seed2")
    stage(SF_SMOKE, out, seed=2)
    return out


@pytest.fixture(scope="module")
def random_duck2(random_dir2):
    con = duckdb.connect()
    for t in registry.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{random_dir2}/{t}.parquet'"
        )
    yield con
    con.close()


def test_premise_seed2_contains_zero_vectors(random_duck2):
    n_zero = random_duck2.sql(
        "SELECT count(*) FROM embeddings "
        "WHERE len(list_filter(embedding, x -> x <> 0)) = 0"
    ).fetchone()[0]
    assert n_zero >= 1, "seed-2 corpus lost its zero-norm embeddings"


@pytest.mark.parametrize("name", SIM_PINNED)
def test_similarity_survives_zero_vectors(
    spark, random_dir2, random_duck2, name
):
    """Pre-fix these crashed with ANSI DIVIDE_BY_ZERO; post-fix the
    usable-vector gate drops zero-norm rows on both sides and the
    results match the oracle."""
    registry.load_all()
    spdf = registry.queries()[name](spark, random_dir2).toPandas()
    dpdf = random_duck2.sql(registry.oracles()[name]).df()
    _assert_matches_oracle(name, spdf, dpdf)


@pytest.fixture(scope="module")
def random_dir7(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.stage_random import stage

    out = str(tmp_path_factory.mktemp("randcorpus") / "seed7")
    stage(SF_SMOKE, out, seed=7)
    return out


@pytest.fixture(scope="module")
def random_duck7(random_dir7):
    con = duckdb.connect()
    for t in registry.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{random_dir7}/{t}.parquet'"
        )
    yield con
    con.close()


def test_premise_seed7_contains_fully_damaged_user(random_duck7):
    n = random_duck7.sql(
        """
        SELECT count(*) FROM (
            SELECT user_id FROM events GROUP BY user_id
            HAVING SUM(CASE WHEN isnan(value) OR isinf(value)
                            THEN NULL ELSE value END) IS NULL
        )
        """
    ).fetchone()[0]
    assert n >= 1, "seed-7 corpus lost its all-nonfinite-values user"


def test_stateful_profile_emits_null_for_fully_damaged_user(
    spark, random_dir7, random_duck7
):
    """Pre-fix the state store's 0.0 initial total leaked out as a
    fabricated aggregate for a user with zero finite measurements;
    post-fix the drain agrees with SQL SUM's NULL."""
    registry.load_all()
    spdf = registry.queries()["stream_profiles_drain"](
        spark, random_dir7
    ).toPandas()
    dpdf = random_duck7.sql(
        registry.oracles()["stream_profiles_drain"]
    ).df()
    _assert_matches_oracle("stream_profiles_drain", spdf, dpdf)


PROPS_PINNED = [
    "rel_variant_props",
    "etl_json_struct",
    "etl_events_pipeline",
]


@pytest.fixture(scope="module")
def props_dir(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.stage_random import stage

    out = str(tmp_path_factory.mktemp("randcorpus") / "seed21_props")
    stage(SF_SMOKE, out, seed=21, props_edge=True)
    return out


@pytest.fixture(scope="module")
def props_duck(props_dir):
    con = duckdb.connect()
    for t in registry.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{props_dir}/{t}.parquet'")
    yield con
    con.close()


def test_premise_props_edge_payloads_present(props_duck):
    """The edge corpus actually carries malformed and boundary
    payloads of each hazard class."""
    got = {
        r[0]
        for r in props_duck.sql(
            "SELECT DISTINCT props FROM events WHERE NOT json_valid(props)"
            " OR json_type(props, '$.k') NOT IN ('BIGINT', 'UBIGINT')"
            " OR TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)"
            "   NOT BETWEEN -2147483648 AND 2147483647"
        ).fetchall()
    }
    assert any(not s or "json" in s for s in got), "malformed payloads lost"
    assert '{"k": 3.5}' in got, "decimal payload lost"
    assert '{"k": 9223372036854775807}' in got, "boundary-int payload lost"
    # quoted non-integral numerics: DuckDB TRY_CAST coerces ('3.5'->4,
    # '1e3'->1000) where Spark try_cast is NULL — present so the sweep
    # exercises the oracle's integer-shaped VARCHAR guard (ADVICE r12)
    assert '{"k": "3.5"}' in got, "quoted-decimal payload lost"
    assert '{"k": "1e3"}' in got, "quoted-scientific payload lost"
    # whitespace-padded quoted integers flow through as VALUES on both
    # sides (both engines trim before the parse) — the guard must keep
    # them while rejecting the quoted decimals above
    assert '{"k": " 12 "}' in got, "whitespace-padded quoted-int lost"
    # control-char-padded quoted integers (ADVICE r13): Spark's cast
    # strips exactly [\x00-\x20\x7f]; the oracle regexp-strips the same
    # class before DuckDB's narrower TRY_CAST — these must flow through
    # as VALUES, while the NEL/NBSP pads below are NULL on BOTH sides
    assert '{"k": "\\u001f12"}' in got, "ctrl-char-padded quoted-int lost"
    assert '{"k": "\\u007f12"}' in got, "DEL-padded quoted-int lost"
    assert '{"k": "\\u008512"}' in got, "NEL-padded payload lost"


def test_premise_duckdb_coerces_what_spark_rejects(spark):
    """The cross-engine fact behind the oracles' integer-shaped VARCHAR
    guard (ADVICE r12): DuckDB's string->int TRY_CAST COERCES
    non-integral numeric strings (rounds '3.5' to 4, parses '1e3' to
    1000) where Spark's try_cast yields NULL for both; BOTH engines
    trim whitespace around a plain integer. If either engine changes,
    this pin explains which guard to revisit."""
    con = duckdb.connect()
    duck = {
        s: con.execute(
            "SELECT TRY_CAST(? AS INTEGER)", [s]
        ).fetchone()[0]
        for s in ["3.5", "1e3", " 12 ", "12\n"]
    }
    con.close()
    assert duck == {"3.5": 4, "1e3": 1000, " 12 ": 12, "12\n": 12}
    rows = spark.createDataFrame(
        [("3.5",), ("1e3",), (" 12 ",), ("12\n",)], "s string"
    ).selectExpr("s", "try_cast(s as int) AS i").collect()
    got = {r.s: r.i for r in rows}
    assert got == {"3.5": None, "1e3": None, " 12 ": 12, "12\n": 12}


def test_props_edge_every_hazard_payload_lands(props_duck):
    """Structural (not probabilistic) placement guarantee (ADVICE r14):
    stage_random force-places any Bernoulli shortfall, so EVERY
    PROPS_EDGE payload — not just the spot-checked classes above —
    appears at least once in an edge corpus of any size. A silently
    dropped tail payload would turn a hazard class the fuzz sweep
    claims to exercise into dead weight."""
    from tools.stage_random import PROPS_EDGE

    present = {
        r[0]
        for r in props_duck.sql("SELECT DISTINCT props FROM events").fetchall()
    }
    missing = [p for p in PROPS_EDGE if p not in present]
    assert not missing, f"hazard payloads absent from edge corpus: {missing}"


def test_premise_spark_cast_strip_class_is_exactly_00_20_7f(spark):
    """The cross-engine fact behind the [\\x00-\\x20\\x7f] pad class in
    the JSON-cast oracles (ADVICE r13, closed r14): Spark's try_cast
    strips EVERY ASCII control char plus space and DEL around an
    integer — but NOT NEL (U+0085), APC (U+009F), NBSP (U+00A0), or
    the Unicode space family (U+2008, U+3000 probed here), where both
    engines agree on NULL. DuckDB's own TRY_CAST trims only
    [\\x09-\\x0d\\x20], which is why the oracle regexp-strips the pads
    before casting. Derived by exhaustive codepoint probe over
    U+0001..U+02FF; if either engine changes, this pin names the guard
    to revisit."""
    pads = {
        "\x1f12": 12, "12\x07": 12, "\x7f12": 12, "\x0b12": 12,
        "\x8512": None, "\x9f12": None, "\xa012": None,
        " 12": None, "　12": None,
    }
    rows = spark.createDataFrame(
        [(s,) for s in pads], "s string"
    ).selectExpr("s", "try_cast(s as int) AS i").collect()
    assert {r.s: r.i for r in rows} == pads
    con = duckdb.connect()
    for s, want in pads.items():
        duck = con.execute(
            r"""SELECT CASE WHEN regexp_matches(
                    ?, '^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$')
                THEN TRY_CAST(regexp_replace(
                    ?, '^[\x00-\x20\x7f]+|[\x00-\x20\x7f]+$', '', 'g')
                    AS INTEGER) END""",
            [s, s],
        ).fetchone()[0]
        assert duck == want, f"oracle guard diverges from Spark on {s!r}"
    con.close()


@pytest.mark.parametrize("name", PROPS_PINNED)
def test_props_consumers_survive_edge_payloads(
    spark, props_dir, props_duck, name
):
    """Pre-fix: VARIANT FAILFAST / ANSI sum overflow /
    CAST_INVALID_INPUT — one damaged payload killed the whole query."""
    registry.load_all()
    spdf = registry.queries()[name](spark, props_dir).toPandas()
    dpdf = props_duck.sql(registry.oracles()[name]).df()
    _assert_matches_oracle(name, spdf, dpdf)


def test_empty_document_chunk_semantics(spark, random_dir):
    """The two chunkers differ on empty docs BY CONSTRUCTION: the
    Python UDTF tokenizes to nothing, the JVM split keeps one empty
    token. Pin both so neither drifts silently."""
    registry.load_all()
    empty_ids = {
        r.doc_id
        for r in registry.table(spark, random_dir, "documents")
        .where("trim(text) = ''")
        .select("doc_id")
        .collect()
    }
    assert empty_ids
    udtf = (
        registry.queries()["text_chunks_udtf"](spark, random_dir)
        .toPandas()
    )
    assert not set(udtf.doc_id) & empty_ids, (
        "UDTF chunker must emit NO chunks for an empty document"
    )
    jvm = registry.queries()["text_chunking"](spark, random_dir).toPandas()
    one = jvm[jvm.doc_id.isin(empty_ids)]
    assert (one.groupby("doc_id").size() == 1).all() and (
        one.n_tokens == 1
    ).all(), "JVM chunker keeps split('')'s one-empty-token chunk"


def test_premise_duckdb_levenshtein_counts_bytes_spark_codepoints(spark):
    """The cross-engine fact behind dedup_fuzzy_levenshtein's BYTE-level
    contract (seed-202 fuzz finding, r14): DuckDB's levenshtein counts
    UTF-8 BYTES while Spark's counts codepoints, so there is no exact
    SQL twin for codepoint distances on non-ASCII text. The operator
    adopts the byte metric — Spark computes it exactly by
    reinterpreting the UTF-8 bytes as latin1 (one char per byte). If
    either engine changes semantics, this pin names the contract to
    revisit."""
    con = duckdb.connect()
    duck = {
        s: con.execute("SELECT levenshtein(?, ?)", [s, t]).fetchone()[0]
        for s, t in [("é", "e"), ("漢", ""), ("👩‍💻", "")]
    }
    con.close()
    assert duck == {"é": 2, "漢": 3, "👩‍💻": 11}  # 2/3/(4+3+4)-byte forms
    rows = spark.sql(
        "SELECT levenshtein('é','e') AS cp,"
        " levenshtein(decode(encode('é','utf-8'),'ISO-8859-1'),"
        "             decode(encode('e','utf-8'),'ISO-8859-1')) AS by_e,"
        " levenshtein(decode(encode('漢','utf-8'),'ISO-8859-1'), '') AS by_h,"
        " levenshtein(decode(encode('👩\\u200d💻','utf-8'),'ISO-8859-1'), '')"
        "   AS by_z"
    ).collect()[0]
    assert rows.cp == 1  # Spark native: codepoints
    # latin1 reinterpretation: byte-exact against the DuckDB readings
    assert (rows.by_e, rows.by_h, rows.by_z) == (2, 3, 11)


def test_premise_byte_levenshtein_exact_at_utf8_boundary(spark):
    """The latin1-reinterpretation byte metric, pinned where encodings
    get ugly (VERDICT r14 task 5): NFC-vs-NFD twins (same rendered
    text, different byte sequences), U+FFFD replacement residue,
    astral-plane 4-byte codepoints, and latin1-misdecoded UTF-8
    double-encoding. For each pair, Spark's
    ``levenshtein(decode(encode(x,'utf-8'),'ISO-8859-1'), ...)`` must
    equal DuckDB's native byte-level ``levenshtein`` must equal a
    python DP over the raw UTF-8 bytes — three independent
    computations of the operator contract."""
    import duckdb

    def dp(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    pairs = [
        ("été", "été"),  # NFC vs NFD twin
        ("caf��", "cafes"),          # replacement residue
        ("\U0001d518\U0001d52b\U0001d526", "Uni"),  # astral vs ASCII
        ("Ã©tÃ©", "été"),  # double-enc
        ("é", "é"),                 # single combining pair
    ]
    con = duckdb.connect()
    for a, b in pairs:
        want = dp(a.encode("utf-8"), b.encode("utf-8"))
        duck = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = spark.sql(
            "SELECT levenshtein(decode(encode(:a,'utf-8'),'ISO-8859-1'),"
            "                   decode(encode(:b,'utf-8'),'ISO-8859-1')) AS d",
            args={"a": a, "b": b},
        ).collect()[0].d
        assert duck == want and got == want, (a, b, want, duck, got)
    con.close()


def test_premise_lone_surrogates_cannot_reach_parquet(tmp_path):
    """Why the fuzz pool carries U+FFFD but no lone surrogates (VERDICT
    r14 task 5): a parquet string column is well-formed UTF-8 by spec,
    and the Arrow write path REJECTS a python str containing an
    unpaired surrogate — so 'malformed UTF-8' is unrepresentable in
    the corpus contract and the byte-levenshtein operator can assume
    well-formed input. If Arrow ever started accepting surrogates
    (surrogatepass semantics), this pin fails and the contract needs a
    malformed-bytes clause."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    df = pd.DataFrame({"doc_id": [1], "text": ["bad \ud800 surrogate"]})
    with _pytest.raises(Exception):
        pq.write_table(
            pa.Table.from_pandas(df), str(tmp_path / "surrogate.parquet")
        )


def test_premise_every_unicode_token_family_lands(random_duck):
    """Structural placement guarantee, unicode flavor (ADVICE r14 /
    VERDICT r14 task 5): every UNICODE_TOKENS family — including the
    r15 mojibake-adjacent additions the byte-levenshtein boundary
    sweep exists to exercise — appears at least once in EVERY staged
    corpus, force-spliced when the 6% Bernoulli flavor misses one
    (seed 404 drew zero mojibake tokens before this)."""
    from tools.stage_random import UNICODE_TOKENS

    missing = [
        tok
        for tok in UNICODE_TOKENS
        if random_duck.sql(
            "SELECT count(*) FROM documents WHERE contains(text, ?)",
            params=[tok],
        ).fetchone()[0]
        == 0
    ]
    assert not missing, f"unicode families absent from staged corpus: {missing}"
