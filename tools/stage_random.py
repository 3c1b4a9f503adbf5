#!/usr/bin/env python
"""Stage a RANDOM corpus for oracle-differential fuzzing.

The hostile stager (``tools/stage_hostile.py``) damages the FIXED
driver corpus along one axis at a time; every sweep therefore sees the
same joint distribution underneath the damage. This tool closes the
remaining axis — distribution itself. Each seed draws a fresh corpus
that honors the documented corpus contract:

- same schemas, byte-for-byte (incl. ``events.ts`` TIMESTAMP(NANOS),
  ``embeddings.embedding`` list<float> of the reference dimension);
- primary keys unique (``event_id``/``doc_id``/``vec_id``/TPC-H keys;
  ``(l_orderkey, l_linenumber)`` composite kept unique per order);
- every CATEGORICAL column draws from the REAL corpus's distinct value
  set (query literals like mktsegments, priorities, event types, langs
  keep matching) — but with fresh random weights, so group sizes,
  join fan-outs, and filter selectivities differ every seed;
- ``region``/``nation`` are copied verbatim (canonical dimensions);
- ``n_chars`` = len(text); timestamps stay inside the epoch gates.

Everything else is randomized: numeric magnitudes (mixed
uniform/heavy-tail, negatives, a low rate of NaN/±Inf in ``value`` —
all inside the float-specials territory the ``floats`` sweep proved),
document text (drawn from the real token vocabulary, with seeded
near-duplicate pairs, exact-duplicate text under distinct doc_ids,
repetition blocks, and a low rate of hostile-unicode tokens),
embeddings (assorted norms incl. zero vectors), join fan-outs and
dangling foreign keys.

Any query that diverges from its DuckDB oracle on such a corpus has a
distribution assumption the fixed fixtures never probed — a real bug
or an undocumented contract clause; either is worth pinning.

    python tools/stage_random.py --seed 7 [--out /tmp/spark_etl_rand_7]
        [--src /root/testdata/sf0.001]

Prints the staged directory; feed it to rehearse_gate --sf-dir.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

#: Hostile-but-legal unicode tokens (same families the ``unicode``
#: sweep plants): ZWJ emoji, spaceless CJK, RTL, combining marks,
#: fullwidth, case traps. The r15 additions pin the byte-levenshtein
#: contract where encodings get ugly (VERDICT r14 task 5) — the
#: mojibake-adjacent families a 100-TB web corpus actually carries:
#: an NFD-decomposed twin of the NFC 'e\u0301te\u0301' (same rendered
#: text, byte distance 4 per accent vs the precomposed form), U+FFFD
#: replacement chars (what every decoder emits on malformed input —
#: actual malformed byte sequences and lone surrogates CANNOT exist in
#: a parquet string column, which is well-formed UTF-8 by spec;
#: tests/test_random_corpus.py pins that premise), astral-plane 4-byte
#: codepoints, and latin1-misdecoded UTF-8 ('\u00c3\u00a9' — the
#: classic double-encoding artifact).
UNICODE_TOKENS = [
    "👩‍💻🔥",
    "漢字テキスト処理",
    "النص العربي",
    "été",
    "ＦＵＬＬｗｉｄｔｈ",
    "ıstanbul",
    "straße",
    "a​b​c",
    "e\u0301te\u0301",  # NFD decomposed: combining acutes
    "caf\ufffd\ufffd",  # replacement chars: decoded mojibake residue
    "\U0001d518\U0001d52b\U0001d526\U0001d11e",  # astral 4-byte codepoints
    "\u00c3\u00a9t\u00c3\u00a9",  # UTF-8-as-latin1 double-encoded accents
]


#: Exotic-but-plausible props payloads for --props-edge: a 100-TB JSON
#: column always carries boundary ints, floats where ints are expected,
#: nulls, missing keys, wrong types, oversized ints, and outright
#: malformed text. Extraction must treat every one as data, not poison.
PROPS_EDGE = [
    '{"k": 9223372036854775807}',
    '{"k": -9223372036854775808}',
    '{"k": 2147483648}',
    '{"k": 3.5}',
    '{"k": null}',
    "{}",
    '{"k": "12"}',
    '{"k": "abc"}',
    # quoted NON-INTEGRAL numerics: DuckDB's string->int TRY_CAST
    # coerces these ('3.5' rounds to 4, '1e3' -> 1000) where Spark's
    # try_cast yields NULL — the oracle's VARCHAR arm must reject them
    # (ADVICE r12; pinned in tests/test_random_corpus.py)
    '{"k": "3.5"}',
    '{"k": "1e3"}',
    # whitespace-padded integers: BOTH engines trim before the parse,
    # so these must flow through as values, not NULLs
    '{"k": " 12 "}',
    '{"k": "12\\n"}',
    # control-char-padded integers (ADVICE r13): Spark's cast strips
    # the exact class [\x00-\x20\x7f] (exhaustive codepoint probe,
    # r14) — \x1f/\x07/\x7f pads must flow through as values; the
    # oracle regexp-strips them before DuckDB's narrower TRY_CAST
    '{"k": "\\u001f12"}',
    '{"k": "12\\u0007"}',
    '{"k": "\\u007f12"}',
    # NEL/NBSP pads are NOT stripped by either engine: NULL both sides
    '{"k": "\\u008512"}',
    '{"k": "\\u00a012"}',
    '{"k": 99999999999999999999999999}',
    '{"k": [1, 2]}',
    '{"k": {"nested": 1}}',
    "not json at all",
    "",
]


#: Leading/trailing whitespace pads for document text (see make_text):
#: tab/newline survive a space-only trim, so the downstream ASCII \s+
#: split produces an EMPTY boundary token — a tokenizer edge the
#: space-joined vocabulary can never reach. \x0b joined the pool in
#: r14 when every oracle split site widened to '[\s\x0b]+' (Java \s
#: and Python re.ASCII \s include vertical tab, RE2 \s does not —
#: ADVICE r13); the corpus now exercises the widened class.
WS_PAD = ["\t", "\n", "\t\t", "\n ", " \t", "\x0b", "\x0b "]


def _rs(seed: int, salt: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, salt]))


def _pick(rng, pool, n, skew: float):
    """Draw n values from pool with a fresh dirichlet weighting; skew>1
    concentrates mass (hot values), skew<1 flattens."""
    w = rng.dirichlet(np.full(len(pool), 1.0 / skew))
    return rng.choice(pool, size=n, p=w)


def _money(rng, n, lo=0.0, hi=100000.0, neg_rate=0.02):
    v = np.round(rng.uniform(lo, hi, n), 2)
    neg = rng.random(n) < neg_rate
    v[neg] = -v[neg]
    return v


def stage(src: str, out: str, seed: int, props_edge: bool = False) -> str:
    import os
    import shutil

    os.makedirs(out, exist_ok=True)

    real = {
        t: pq.read_table(f"{src}/{t}.parquet")
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }

    def dom(table: str, col: str) -> np.ndarray:
        return real[table].column(col).unique().to_numpy(zero_copy_only=False)

    # canonical dimensions verbatim
    for t in ("region", "nation"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    n_cust = real["customer"].num_rows
    n_supp = real["supplier"].num_rows
    n_part = real["part"].num_rows
    n_ord = real["orders"].num_rows
    n_li = real["lineitem"].num_rows
    n_ev = real["events"].num_rows
    n_doc = real["documents"].num_rows
    n_emb = real["embeddings"].num_rows
    nationkeys = dom("nation", "n_nationkey")

    # ---- customer -------------------------------------------------
    rng = _rs(seed, 1)
    custkeys = rng.permutation(np.arange(1, n_cust + 1, dtype=np.int64))
    customer = pd.DataFrame(
        {
            "c_custkey": custkeys,
            "c_name": [f"Customer#{k:09d}" for k in custkeys],
            "c_nationkey": _pick(rng, nationkeys, n_cust, rng.uniform(0.5, 4)).astype(
                np.int32
            ),
            "c_acctbal": _money(rng, n_cust, -999.99, 9999.99, 0.0),
            "c_mktsegment": _pick(
                rng, dom("customer", "c_mktsegment"), n_cust, rng.uniform(0.5, 4)
            ),
        }
    )

    # ---- supplier -------------------------------------------------
    rng = _rs(seed, 2)
    suppkeys = rng.permutation(np.arange(1, n_supp + 1, dtype=np.int64))
    supplier = pd.DataFrame(
        {
            "s_suppkey": suppkeys,
            "s_name": [f"Supplier#{k:09d}" for k in suppkeys],
            "s_nationkey": _pick(rng, nationkeys, n_supp, rng.uniform(0.5, 4)).astype(
                np.int32
            ),
            "s_acctbal": _money(rng, n_supp, -999.99, 9999.99, 0.0),
        }
    )

    # ---- part -----------------------------------------------------
    rng = _rs(seed, 3)
    partkeys = rng.permutation(np.arange(1, n_part + 1, dtype=np.int64))
    name_vocab = np.array(
        list(
            {
                w
                for nm in real["part"].column("p_name").to_pylist()
                for w in str(nm).split()
            }
        )
    )
    name_vocab.sort()
    part = pd.DataFrame(
        {
            "p_partkey": partkeys,
            "p_name": [
                " ".join(rng.choice(name_vocab, rng.integers(2, 6)))
                for _ in range(n_part)
            ],
            "p_brand": _pick(rng, dom("part", "p_brand"), n_part, rng.uniform(0.5, 4)),
            "p_type": _pick(rng, dom("part", "p_type"), n_part, rng.uniform(0.5, 4)),
            "p_size": rng.integers(1, 51, n_part).astype(np.int32),
            "p_retailprice": _money(rng, n_part, 100.0, 2100.0, 0.0),
        }
    )

    # ---- orders ---------------------------------------------------
    rng = _rs(seed, 4)
    orderkeys = rng.permutation(np.arange(1, n_ord + 1, dtype=np.int64))
    odates_real = real["orders"].column("o_orderdate").to_pandas()
    lo, hi = odates_real.min(), odates_real.max()
    span_s = max(1, int((hi - lo).total_seconds()))
    # some customer keys dangle (deleted customers still have orders)
    cust_pool = np.concatenate(
        [custkeys, np.arange(n_cust + 1, n_cust + 1 + max(1, n_cust // 20))]
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": orderkeys,
            "o_custkey": _pick(rng, cust_pool, n_ord, rng.uniform(0.5, 6)).astype(
                np.int64
            ),
            "o_orderstatus": _pick(
                rng, dom("orders", "o_orderstatus"), n_ord, rng.uniform(0.5, 4)
            ),
            "o_totalprice": _money(rng, n_ord, 900.0, 500000.0, 0.0),
            "o_orderdate": (
                lo + pd.to_timedelta(rng.integers(0, span_s, n_ord), unit="s")
            ).floor("ms"),
            "o_orderpriority": _pick(
                rng, dom("orders", "o_orderpriority"), n_ord, rng.uniform(0.5, 4)
            ),
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[ms]")

    # ---- lineitem -------------------------------------------------
    rng = _rs(seed, 5)
    # fan-out per order is itself random (1..13 with a heavy tail)
    ord_pool = np.concatenate(
        [orderkeys, np.arange(n_ord + 1, n_ord + 1 + max(1, n_ord // 25))]
    )
    owner = _pick(rng, ord_pool, n_li, rng.uniform(0.5, 8)).astype(np.int64)
    owner.sort()
    linenumber = np.ones(n_li, dtype=np.int32)
    for i in range(1, n_li):
        linenumber[i] = linenumber[i - 1] + 1 if owner[i] == owner[i - 1] else 1
    sdates_real = real["lineitem"].column("l_shipdate").to_pandas()
    slo, shi = sdates_real.min(), sdates_real.max()
    sspan = max(1, int((shi - slo).total_seconds()))
    lineitem = pd.DataFrame(
        {
            "l_orderkey": owner,
            "l_partkey": _pick(rng, partkeys, n_li, rng.uniform(0.5, 6)).astype(
                np.int64
            ),
            "l_suppkey": _pick(rng, suppkeys, n_li, rng.uniform(0.5, 4)).astype(
                np.int64
            ),
            "l_linenumber": linenumber,
            "l_quantity": np.round(rng.uniform(1, 50, n_li)),
            "l_extendedprice": _money(rng, n_li, 900.0, 100000.0, 0.0),
            "l_discount": np.round(rng.uniform(0.0, 0.10, n_li), 2),
            "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
            "l_returnflag": _pick(
                rng, dom("lineitem", "l_returnflag"), n_li, rng.uniform(0.5, 4)
            ),
            "l_linestatus": _pick(
                rng, dom("lineitem", "l_linestatus"), n_li, rng.uniform(0.5, 4)
            ),
            "l_shipdate": (
                slo + pd.to_timedelta(rng.integers(0, sspan, n_li), unit="s")
            ).floor("ms"),
        }
    )
    lineitem["l_shipdate"] = lineitem["l_shipdate"].astype("datetime64[ms]")
    perm = rng.permutation(n_li)
    lineitem = lineitem.iloc[perm].reset_index(drop=True)

    # ---- events ---------------------------------------------------
    rng = _rs(seed, 6)
    eids = rng.permutation(np.arange(1, n_ev + 1, dtype=np.int64))
    ets_real = real["events"].column("ts").to_pandas()
    elo, ehi = ets_real.min(), ets_real.max()
    espan_ns = max(1, int((ehi - elo).value if hasattr((ehi - elo), "value") else (ehi - elo).total_seconds() * 1e9))
    n_users = int(rng.integers(5, 200))
    user_pool = np.arange(1, n_users + 1, dtype=np.int64)
    value = _money(rng, n_ev, 0.0, 1000.0, 0.05)
    specials = rng.random(n_ev)
    value[specials < 0.004] = np.nan
    value[(specials >= 0.004) & (specials < 0.006)] = np.inf
    value[(specials >= 0.006) & (specials < 0.008)] = -np.inf
    props_k = rng.integers(-5, 100, n_ev)
    props = [f'{{"k": {int(k)}}}' for k in props_k]
    if props_edge:
        # every hazard class lands AT LEAST once (the first hits take
        # the payload list in order — r14: a grown pool left seed 21
        # without the quoted-scientific payload when all hits drew at
        # random); remaining hits draw randomly for volume. The ~5%
        # Bernoulli draw alone only guarantees this when it yields
        # >= len(PROPS_EDGE) hits, so on a small corpus the shortfall
        # is force-placed at distinct random rows (ADVICE r14) — the
        # guarantee is structural, not probabilistic.
        hit = np.flatnonzero(rng.random(n_ev) < 0.05)
        if len(hit) < len(PROPS_EDGE):
            if n_ev < len(PROPS_EDGE):
                raise ValueError(
                    f"props_edge corpus too small: {n_ev} events cannot "
                    f"carry all {len(PROPS_EDGE)} hazard payloads"
                )
            spare = np.setdiff1d(np.arange(n_ev), hit)
            extra = rng.choice(spare, len(PROPS_EDGE) - len(hit), replace=False)
            hit = np.concatenate([hit, extra])
        assert len(hit) >= len(PROPS_EDGE)
        for j, i in enumerate(hit):
            if j < len(PROPS_EDGE):
                props[i] = PROPS_EDGE[j]
            else:
                props[i] = PROPS_EDGE[int(rng.integers(0, len(PROPS_EDGE)))]
    events = pd.DataFrame(
        {
            "event_id": eids,
            "ts": elo + pd.to_timedelta(rng.integers(0, espan_ns, n_ev), unit="ns"),
            "user_id": _pick(rng, user_pool, n_ev, rng.uniform(0.5, 8)).astype(
                np.int64
            ),
            "event_type": _pick(
                rng, dom("events", "event_type"), n_ev, rng.uniform(0.5, 4)
            ),
            "value": value,
            "props": props,
        }
    )
    # match the corpus's physical unit (micros; sub-us detail dropped)
    events["ts"] = events["ts"].astype("datetime64[us]")

    # ---- documents ------------------------------------------------
    rng = _rs(seed, 7)
    docids = rng.permutation(np.arange(1, n_doc + 1, dtype=np.int64))
    vocab = np.array(
        sorted(
            {
                w
                for t in real["documents"].column("text").to_pylist()
                for w in str(t).split()
            }
        )
    )

    def make_text() -> str:
        n_words = int(rng.integers(0, 120))
        words = list(rng.choice(vocab, n_words)) if n_words else []
        # low-rate hostile unicode and repetition blocks
        if words and rng.random() < 0.06:
            words[int(rng.integers(0, len(words)))] = str(
                UNICODE_TOKENS[int(rng.integers(0, len(UNICODE_TOKENS)))]
            )
        if words and rng.random() < 0.08:
            i = int(rng.integers(0, len(words)))
            words[i: i + 1] = [words[i]] * int(rng.integers(3, 12))
        text = " ".join(words)
        # low-rate leading/trailing NON-SPACE whitespace: a space-only
        # trim keeps it, so the ASCII \s+ split yields a leading (or
        # trailing) EMPTY token in BOTH tokenizers — the UDTF-vs-oracle
        # guard edge ADVICE r12 flagged (space-joined tokens alone can
        # never produce it)
        if rng.random() < 0.03:
            pad = str(WS_PAD[int(rng.integers(0, len(WS_PAD)))])
            text = pad + text if rng.random() < 0.5 else text + pad
        return text

    texts = [make_text() for _ in range(n_doc)]
    # every UNICODE_TOKENS family lands AT LEAST once per staging —
    # structural, like the PROPS_EDGE placement above (ADVICE r14): the
    # 6% Bernoulli flavor left seed 404 with zero mojibake tokens, so a
    # sweep meant to exercise the byte-levenshtein contract at the
    # UTF-8 boundary would silently not have. Each missing token is
    # spliced into a random non-empty document as one more word.
    nonempty = [i for i, t in enumerate(texts) if t.strip()]
    if nonempty:
        for tok in UNICODE_TOKENS:
            if not any(tok in t for t in texts):
                i = int(nonempty[int(rng.integers(0, len(nonempty)))])
                w = texts[i].split(" ")
                w.insert(int(rng.integers(0, len(w) + 1)), tok)
                texts[i] = " ".join(w)
    # seeded near-duplicates: ~8% of docs are a light edit of another,
    # ~2% exact text copies under a DIFFERENT doc_id (legal — only the
    # keys are contract-unique; finding these is the dedup operators'
    # whole job)
    for _ in range(max(1, n_doc // 12)):
        a, b = rng.integers(0, n_doc, 2)
        w = texts[int(a)].split()
        if len(w) > 4:
            w[int(rng.integers(0, len(w)))] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts[int(b)] = " ".join(w)
    for _ in range(max(1, n_doc // 50)):
        a, b = rng.integers(0, n_doc, 2)
        texts[int(b)] = texts[int(a)]
    documents = pd.DataFrame(
        {
            "doc_id": docids,
            "text": texts,
            "lang": _pick(rng, dom("documents", "lang"), n_doc, rng.uniform(0.5, 4)),
            "source": _pick(
                rng, dom("documents", "source"), n_doc, rng.uniform(0.5, 6)
            ),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )

    # ---- embeddings -----------------------------------------------
    rng = _rs(seed, 8)
    dim = len(real["embeddings"].column("embedding")[0].as_py())
    vecids = rng.permutation(np.arange(1, n_emb + 1, dtype=np.int64))
    base = rng.normal(0, 1, (n_emb, dim))
    # assorted norms: most unit-ish, some tiny, some huge, a few zero
    scale = rng.choice(
        [1.0, 0.001, 100.0], size=n_emb, p=[0.9, 0.05, 0.05]
    ) * rng.uniform(0.5, 2.0, n_emb)
    vecs = base * scale[:, None]
    zero = rng.random(n_emb) < 0.01
    vecs[zero] = 0.0
    # seeded near-neighbor pairs so ANN/dedup queries have positives
    for _ in range(max(1, n_emb // 20)):
        a, b = rng.integers(0, n_emb, 2)
        vecs[int(b)] = vecs[int(a)] + rng.normal(0, 0.01, dim)
    labels = dom("embeddings", "label")
    embeddings = pd.DataFrame(
        {
            "vec_id": vecids,
            "label": _pick(rng, labels, n_emb, rng.uniform(0.5, 4)).astype(np.int32),
        }
    )

    # ---- write, preserving exact arrow schemas --------------------
    def write(name: str, pdf: pd.DataFrame, schema: pa.Schema) -> None:
        tbl = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
        pq.write_table(tbl, f"{out}/{name}.parquet")

    write("customer", customer, real["customer"].schema)
    write("supplier", supplier, real["supplier"].schema)
    write("part", part, real["part"].schema)
    write("orders", orders, real["orders"].schema)
    write("lineitem", lineitem, real["lineitem"].schema)
    write("events", events, real["events"].schema)
    write("documents", documents, real["documents"].schema)
    emb_tbl = pa.Table.from_arrays(
        [
            pa.array(embeddings["vec_id"].to_numpy(), type=pa.int64()),
            pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=real["embeddings"].schema.field("embedding").type,
            ),
            pa.array(embeddings["label"].to_numpy(), type=pa.int32()),
        ],
        schema=real["embeddings"].schema,
    )
    pq.write_table(emb_tbl, f"{out}/embeddings.parquet")
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seed", type=int, required=True)
    parser.add_argument("--src", default="/root/testdata/sf0.001")
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--props-edge",
        action="store_true",
        help="replace ~5%% of events.props with exotic/malformed JSON "
        "payloads (boundary ints, floats, nulls, wrong types, non-JSON)",
    )
    args = parser.parse_args(argv)
    suffix = "_props" if args.props_edge else ""
    out = args.out or f"/tmp/spark_etl_rand_{args.seed}{suffix}"
    print(stage(args.src, out, args.seed, props_edge=args.props_edge))
    return 0


if __name__ == "__main__":
    sys.exit(main())
