"""Materialized signature store: build → probe must equal the in-plan
incremental dedup, and append must equal a from-scratch rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_pipeline_spark.operators.dedup import (
    append_signature_store,
    build_signature_store,
    incremental_survivors,
    probe_signature_store,
)
from spark_etl_pipeline_spark.plans.registry import table
from tests.conftest import SF_SMOKE


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_store_probe_equals_inplan_incremental(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents")
    is_delta = F.col("doc_id") % 4 == 3
    store = str(tmp_path / "store")

    build_signature_store(docs.filter(~is_delta), store)
    got = probe_signature_store(spark, store, docs.filter(is_delta))
    want = incremental_survivors(docs, lambda c: c % 4 == 3)

    got_ids, want_ids = _ids(got), _ids(want)
    assert got_ids == want_ids and len(got_ids) > 0


def test_append_equals_rebuild(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 3)
    delta = docs.filter(F.col("doc_id") % 4 == 3)

    # Incremental build: half the base first, the other half appended.
    grown = str(tmp_path / "grown")
    build_signature_store(base.filter(F.col("doc_id") % 2 == 0), grown)
    append_signature_store(base.filter(F.col("doc_id") % 2 == 1), grown)

    rebuilt = str(tmp_path / "rebuilt")
    build_signature_store(base, rebuilt)

    assert _ids(probe_signature_store(spark, grown, delta)) == _ids(
        probe_signature_store(spark, rebuilt, delta)
    )


def test_store_layout_roundtrip(spark, tmp_path):
    """Both store tables read back with the schema the probe expects."""
    docs = table(spark, SF_SMOKE, "documents").limit(50)
    store = str(tmp_path / "layout")
    build_signature_store(docs, store)

    bands = spark.read.parquet(f"{store}/bands")
    assert set(bands.columns) == {"doc_id", "band", "bh"}
    ss = spark.read.parquet(f"{store}/shingles")
    assert set(ss.columns) == {"doc_id", "ss"}
    assert ss.count() == bands.select("doc_id").distinct().count()


def test_embedding_store_probe_equals_full_filtered(spark, tmp_path):
    """Probe(store, delta) == full-corpus pairs restricted to delta."""
    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.operators.similarity import (
        _vec,
        build_embedding_store,
        dedup_embedding_cosine,
        probe_embedding_store,
    )

    emb = table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", _vec().alias("v")
    )
    is_delta = F.col("vec_id") % 4 == 3
    store = str(tmp_path / "embstore")
    build_embedding_store(emb.filter(~is_delta), store)

    got = {
        (r["vec_a"], r["vec_b"], round(r["cos"], 9))
        for r in probe_embedding_store(
            spark, store, emb.filter(is_delta)
        ).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], round(r["cos"], 9))
        for r in dedup_embedding_cosine(spark, SF_SMOKE)
        .filter((F.col("vec_a") % 4 == 3) | (F.col("vec_b") % 4 == 3))
        .collect()
    }
    assert got == want and len(got) > 0


def test_embedding_store_directed_probe_contracts(spark, tmp_path):
    """Directed probing against the stored corpus: probes=BITS is
    exactly the default full radius-1 probe, and the candidate budget
    nests monotonically (probes=0 ⊆ probes=2 ⊆ default) — so dialing
    the knob down can only drop candidates, never invent pairs."""
    from pyspark.sql import functions as F

    from spark_etl_pipeline_spark.operators.similarity import (
        BITS_PER_TABLE,
        _vec,
        build_embedding_store,
        probe_embedding_store,
    )

    emb = table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", _vec().alias("v")
    )
    is_delta = F.col("vec_id") % 4 == 3
    store = str(tmp_path / "embstore_directed")
    build_embedding_store(emb.filter(~is_delta), store)
    delta = emb.filter(is_delta)

    def pairs(probes):
        return {
            (r["vec_a"], r["vec_b"], round(r["cos"], 9))
            for r in probe_embedding_store(
                spark, store, delta, probes=probes
            ).collect()
        }

    full = pairs(None)
    assert pairs(BITS_PER_TABLE) == full and len(full) > 0
    p0, p2 = pairs(0), pairs(2)
    assert p0 <= p2 <= full


def test_store_refuses_constants_mismatch(spark, tmp_path):
    """A persisted store is a function of its constants: probing or
    appending one built under DIFFERENT constants must fail LOUDLY
    (without the stamp it returns garbage similarities, not an error).
    Covers both store families and both failure shapes (mismatched
    stamp, missing stamp)."""
    import pytest

    from spark_etl_pipeline_spark.operators.dedup import (
        append_signature_store,
        probe_signature_store,
    )
    from spark_etl_pipeline_spark.operators.similarity import (
        build_embedding_store,
        probe_embedding_store,
    )
    from spark_etl_pipeline_spark.operators.store_meta import write_store_stamp

    docs = table(spark, SF_SMOKE, "documents")
    base, delta = docs.filter("doc_id % 4 != 3"), docs.filter("doc_id % 4 = 3")

    # text store: fresh build carries the stamp and probes fine
    store = str(tmp_path / "sigstore")
    build_signature_store(base, store)
    assert probe_signature_store(spark, store, delta).count() >= 0

    # ...then a stamp from "older constants" poisons probe AND append
    write_store_stamp(spark, store, "minhash", "deadbeef-old-constants")
    with pytest.raises(ValueError, match="different\\s+constants"):
        probe_signature_store(spark, store, delta)
    with pytest.raises(ValueError, match="different\\s+constants"):
        append_signature_store(delta, store)

    # unstamped store (pre-versioning provenance) is refused too
    import shutil

    shutil.rmtree(f"{store}/constants_stamp")
    with pytest.raises(ValueError, match="no constants stamp"):
        probe_signature_store(spark, store, delta)

    # embedding store: same contract, hyperplane family
    from spark_etl_pipeline_spark.operators.similarity import load_vectors

    emb = load_vectors(spark, SF_SMOKE)
    vstore = str(tmp_path / "embstore")
    build_embedding_store(emb.filter("vec_id % 4 != 3"), vstore)
    vdelta = emb.filter("vec_id % 4 = 3")
    assert probe_embedding_store(spark, vstore, vdelta).count() >= 0
    write_store_stamp(spark, vstore, "hyperplane", "deadbeef-old-constants")
    with pytest.raises(ValueError, match="different\\s+constants"):
        probe_embedding_store(spark, vstore, vdelta)
