"""Property tests for the multi-generation directory reader.

``registry._unified_directory_schema`` is new core read-path code
(round 8's drift/widen modes); these tests prove its CONTRACT on
randomized schema-evolution histories rather than the two staged
corpora: for any base table and any sequence of generation edits
(drop a nullable column, reverse column order, narrow a numeric's
declared type), the directory read must

- return the UNION of all generations' columns (nothing vanishes),
- promote every column to a type at least as wide as every
  generation's declared type,
- lose no rows, and
- null-fill a dropped column exactly on the generations that lack it.

Hypothesis drives the edit sequence; pyarrow writes each generation
with its own footer so the directory really is heterogeneous. This is
the same second-axis discipline as ``test_stat_properties.py``: no
DuckDB, no shared code with the oracle path — the reference model is
plain Python set/row arithmetic over what was written.
"""

from __future__ import annotations

# Second-verification-axis marker: tests in this module check operators
# against an INDEPENDENT reference (plain Python/pandas/declared
# allowlists), not the DuckDB oracle. COVERAGE.md's property-test tally
# is derived by counting test functions in marked modules
# (tests/test_registry_contract.py::test_doc_counts_are_derived).
SECOND_AXIS_INDEPENDENT_REFERENCE = True

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_etl_pipeline_spark.plans import registry

#: (name, current arrow type, narrower arrow types oldest-first).
#: Narrowing must keep VALUES representable, so test values are chosen
#: inside the narrowest type's exact range.
_COLUMNS = [
    ("k", pa.int64(), []),  # key: never dropped, never narrowed
    ("qty", pa.float64(), [pa.float32()]),
    ("n", pa.int64(), [pa.int32(), pa.int16()]),
    ("price", pa.float64(), [pa.float32()]),
    ("tag", pa.string(), []),
]

#: Values exact in float32/int16 so narrowing round-trips losslessly
#: and the cross-generation comparison stays bit-true.
_ROWS_PER_GEN = 5


def _gen_values(col: str, gen: int, n: int):
    if col == "k":
        return [gen * 1000 + i for i in range(n)]
    if col == "qty":
        return [float(i) + 0.5 for i in range(n)]
    if col == "n":
        return [gen * 10 + i for i in range(n)]
    if col == "price":
        return [float(2 * i) + 0.25 for i in range(n)]
    return [f"g{gen}r{i}" for i in range(n)]


@st.composite
def _histories(draw):
    """A list of per-generation edits, newest generation first.

    Each generation independently: maybe drops one droppable column,
    maybe narrows each narrowable column by a random number of steps,
    maybe reverses column order. Generation 0 is always the full
    current schema (the newest writer).
    """
    n_gens = draw(st.integers(min_value=2, max_value=4))
    edits = [{"drop": None, "narrow": {}, "reverse": False}]
    for _ in range(n_gens - 1):
        droppable = [c for c, _, _ in _COLUMNS[1:]]
        drop = draw(st.sampled_from([None] + droppable))
        narrow = {}
        for name, _, steps in _COLUMNS:
            if steps and name != drop:
                k = draw(st.integers(min_value=0, max_value=len(steps)))
                if k:
                    narrow[name] = steps[k - 1]
        edits.append(
            {"drop": drop, "narrow": narrow, "reverse": draw(st.booleans())}
        )
    return edits


def _write_history(root: str, edits) -> list[dict]:
    """Write one parquet file per generation; return expected rows."""
    expected = []
    for gen, e in enumerate(edits):
        cols = [(n, t) for n, t, _ in _COLUMNS if n != e["drop"]]
        if e["reverse"]:
            cols = list(reversed(cols))
        arrays, meta = [], []
        for name, cur_type in cols:
            typ = e["narrow"].get(name, cur_type)
            vals = _gen_values(name, gen, _ROWS_PER_GEN)
            arrays.append(pa.array(vals, typ))
            meta.append((name, vals))
        pq.write_table(
            pa.table(dict(zip([n for n, _ in cols], arrays))),
            f"{root}/gen{gen}.parquet",
        )
        for i in range(_ROWS_PER_GEN):
            row = {name: vals[i] for name, vals in meta}
            if e["drop"]:
                row[e["drop"]] = None
            expected.append(row)
    return expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edits=_histories())
def test_directory_union_contract_on_random_histories(
    spark, tmp_path_factory, edits
):
    import os

    root = str(tmp_path_factory.mktemp("hist") / "t.parquet")
    os.makedirs(root)
    expected = _write_history(root, edits)

    df = registry.table(spark, str(os.path.dirname(root)), "t")
    # union of columns, nothing vanished
    assert set(df.columns) == {c for c, _, _ in _COLUMNS}
    got = [r.asDict() for r in df.collect()]
    assert len(got) == len(expected)  # no generation dropped

    # promoted types are at least the current declared width
    dtypes = dict(df.dtypes)
    assert dtypes["qty"] == "double" and dtypes["price"] == "double"
    assert dtypes["n"] in ("smallint", "int", "bigint")

    # row-level: narrowing was value-exact, dropped columns null-fill
    for g, e in zip(
        sorted(got, key=lambda r: r["k"]),
        sorted(expected, key=lambda r: r["k"]),
    ):
        for name in g:
            if e[name] is None:
                assert g[name] is None, (name, g, e)
            elif isinstance(e[name], str):
                assert g[name] == e[name], (name, g, e)
            else:
                assert float(g[name]) == float(e[name]), (name, g, e)


def test_homogeneous_directory_skips_the_machinery(spark, tmp_path):
    """All-identical footers must return None from the sniff (plain
    one-footer inference is already safe and cheaper)."""
    import os

    root = str(tmp_path / "t.parquet")
    os.makedirs(root)
    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    pq.write_table(t, f"{root}/a.parquet")
    pq.write_table(t, f"{root}/b.parquet")
    assert registry._unified_directory_schema(root, []) is None


def test_adaptive_sniff_pooled_arm_equals_sequential(tmp_path, monkeypatch):
    """The latency probe's two arms must compute the SAME union.

    On warm local metadata the sniff stays sequential (a thread pool is
    GIL-contention, measured 2.5–8× slower — BASELINE.md round-9
    table); on a latency-bound store it fans out 32-wide. Force the
    pooled arm by injecting a GIL-released delay into ``read_schema``
    and pin that both arms agree field-for-field.
    """
    import os
    import time

    import pyarrow.parquet as _pq

    root = str(tmp_path / "t.parquet")
    os.makedirs(root)
    gen_a = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0], pa.float32())})
    gen_b = pa.table(
        {
            "k": pa.array([2], pa.int64()),
            "v": pa.array([2.0], pa.float64()),
            "added": pa.array(["x"], pa.string()),
        }
    )
    # > 8 files so the probe window doesn't swallow the whole listing
    for i in range(24):
        _pq.write_table(gen_a if i % 2 else gen_b, f"{root}/p{i:02d}.parquet")

    sequential = registry._unified_directory_schema(root, [])
    assert sequential is not None

    real_read = _pq.read_schema
    calls = {"n": 0}

    def slow_read(f, **kw):
        calls["n"] += 1
        time.sleep(0.004)  # above the 2 ms/footer probe threshold
        return real_read(f, **kw)

    monkeypatch.setattr("pyarrow.parquet.read_schema", slow_read)
    pooled = registry._unified_directory_schema(root, [])
    monkeypatch.undo()

    assert calls["n"] == 24  # every footer read — sampling is the bug
    assert pooled is not None
    assert [(f.name, f.dataType) for f in pooled.fields] == [
        (f.name, f.dataType) for f in sequential.fields
    ]
