"""The stateful family under ``RocksDBStateStoreProvider`` (VERDICT
r14 task 4).

Every stateful test in the repo ran against the DEFAULT HDFS-backed
state store, which holds state in executor heap — but a 100-TB
streaming deployment runs RocksDB (state spills to local disk, heap
stays bounded), and the two providers share none of their storage
code: checkpoint layout, snapshot/changelog files, and the
timer/value-state encodings are provider-specific. This module proves
the SAME engine code is provider-agnostic:

- the five kill-and-resume exactness surfaces (event-time-timeout
  sessions, dedup-within-watermark replay, session-window merge state,
  stream-stream join buffers, and the mid-stream-killed
  ``applyInPandasWithState`` drain) re-run under RocksDB by invoking
  the SAME test bodies — the protocol, inputs, and assertions are
  byte-identical, only the provider conf differs, so a divergence here
  isolates the provider;
- every registered ``*_drain`` query runs under BOTH providers and the
  results are compared frame-for-frame (the default-provider side is
  already DuckDB-oracle-checked by the parity suite, so equality
  chains RocksDB to the oracle).

The provider conf is session-settable and read at QUERY START, and
each test uses a fresh checkpoint dir, so flipping it per-test is
sound (a checkpoint never migrates providers mid-life here).
"""

from __future__ import annotations

import pytest

from spark_etl_pipeline_spark.plans import registry
from tests import test_incremental as ti
from tests import test_stateful_streaming as tss
from tests.conftest import SF_SMOKE

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture()
def rocks(spark):
    """The shared session with the RocksDB provider pinned for the
    duration of one test, restored afterwards (other modules in the
    same pytest session must keep seeing the default provider)."""
    try:
        old = spark.conf.get(PROVIDER_CONF)
    except Exception:
        old = None
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    try:
        yield spark
    finally:
        if old is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, old)


def test_rocksdb_idle_session_timer_kill_resume(rocks, tmp_path):
    tss.test_idle_session_timer_state_survives_kill_and_resume(
        rocks, tmp_path
    )


def test_rocksdb_streaming_dedup_kill_resume(rocks, tmp_path):
    tss.test_streaming_dedup_state_survives_kill_and_resume(rocks, tmp_path)


def test_rocksdb_session_window_merge_kill_resume(rocks, tmp_path):
    tss.test_session_window_merge_state_survives_kill_and_resume(
        rocks, tmp_path
    )


def test_rocksdb_stream_stream_join_buffer_kill_resume(rocks, tmp_path):
    tss.test_stream_stream_join_buffer_survives_kill_and_resume(
        rocks, tmp_path
    )


def test_rocksdb_stateful_drain_kill_resume(rocks, tmp_path, monkeypatch):
    ti.test_stateful_drain_kill_and_resume_matches_uninterrupted(
        rocks, tmp_path, monkeypatch
    )


def _frame(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.astype(str)
        .sort_values(by=list(pdf.columns))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "name", sorted(n for n in registry.queries() if n.endswith("_drain"))
)
def test_rocksdb_drain_matches_default_provider(spark, name, request):
    """Full drain under the default provider, then the identical drain
    under RocksDB: frame-for-frame equal. The default side is already
    oracle-checked (parity suite), so equality here chains the RocksDB
    run to the DuckDB oracle without re-running it."""
    builder = registry.queries()[name]
    base = _frame(builder(spark, SF_SMOKE))
    try:
        old = spark.conf.get(PROVIDER_CONF)
    except Exception:
        old = None
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    try:
        got = _frame(builder(spark, SF_SMOKE))
    finally:
        if old is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, old)
    assert len(got) == len(base) > 0, name
    assert got.equals(base), f"{name}: RocksDB drain diverges from default"
