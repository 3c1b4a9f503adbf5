"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join handling (enabled in the session factory) covers most
runtime skew, but two cases still need explicit salting at 100 TB:

- **hot-key aggregation**: one key holding 10% of all rows serializes
  its entire partial-aggregate merge into one task. Two-phase salted
  aggregation splits the hot key across ``salt`` tasks, then merges the
  per-salt partials — both phases stay map-side-combinable.
- **hot-key join against a small-but-not-broadcastable side**: salt the
  big side's key, replicate each small-side row ``salt`` times (one per
  salt value), join on (key, salt). Replication multiplies the small
  side by the salt factor — use the smallest salt that flattens the
  skew.

Both helpers are pure plan builders; correctness does not depend on the
salt value (tests verify salted result == unsalted result).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.plans.registry import register, table

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt: int) -> DataFrame:
    """Uniform random salt in [0, salt). Nondeterministic by design —
    and safe: every salt value yields the same final result, so a task
    retry re-salting rows cannot change the output (unlike using
    rand() as a join or dedup key)."""
    return df.withColumn(SALT_COL, (F.rand() * salt).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    Phase 1 groups by (keys + salt) — the hot key fans out over
    ``salt`` reducers; phase 2 merges the per-salt partials **with
    SUM**, so ``aggs`` must hold sum-remergeable phase-1 aggregates
    only (count → sum, sum → sum; build avg as sum/sum upstream).
    Use :func:`salted_count` / :func:`salted_sum` for the common cases.
    """
    phase1 = with_salt(df, salt).groupBy(*keys, SALT_COL).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def salted_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()`` (count re-merges as sum)."""
    return salted_agg(df, keys, {"n": F.count(F.lit(1))}, salt)


def salted_sum(
    df: DataFrame, keys: list[str], value: Column, name: str, salt: int = 16
) -> DataFrame:
    """Skew-safe ``groupBy(keys).agg(sum(value))``."""
    return salted_agg(df, keys, {name: F.sum(value)}, salt)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    The small side is cross-joined with the salt range (×``salt`` rows)
    so every (key, salt) bucket of the big side finds its match; the
    join key becomes (key, salt), splitting each hot key over ``salt``
    tasks. Use when the small side is too big to broadcast but small
    enough to replicate.

    Only ``inner`` and ``left`` are supported: under ``right`` or
    ``full_outer``, a small-side key absent from the big side would
    survive once PER REPLICA — ``salt`` spurious unmatched rows each.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "outer-preserving the replicated side would emit each "
            "unmatched small-side row once per salt value"
        )
    salted_big = with_salt(big, salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias(SALT_COL)
    replicated = small.select("*", salts)
    # shuffle_hash by contract: salted_join exists precisely for the
    # small-but-NOT-broadcastable side. Letting the planner broadcast
    # the replicated side would silently turn the whole construction
    # into a no-op (broadcast joins have no shuffle skew to flatten) —
    # if the side fits the broadcast threshold, call a plain join.
    out = salted_big.join(replicated.hint("shuffle_hash"), [on, SALT_COL], how)
    return out.drop(SALT_COL)


# ---------------------------------------------------------------------------
# Registered queries: the salted plans with their UNSALTED SQL as oracle
# (salting must never change a result — the oracle IS that contract).
# ---------------------------------------------------------------------------


@register(
    "events_skew_salted_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(TRY_CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
               AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def events_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the skewed ``events.user_id``.

    Phase 1 groups by (user_id, salt) — a hot user fans out across
    ``salt`` reducers; phase 2 sum-merges the per-salt partials. The
    oracle is the plain unsalted GROUP BY: identical output is the
    whole point (integer-cents sums keep the merge associative, so the
    salt split cannot change a bit). Plan-gated: the phase-1 exchange
    must hash on (user_id, __salt).
    """
    ev = table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": F.count(F.lit(1)),
            "cents": F.sum(F.round(F.col("value") * 100).try_cast("long")),
        },
        salt=8,
    )
    return out.select(
        "user_id",
        "n_events",
        (F.col("cents").cast("double") / 100).alias("total_value"),
    )


@register(
    "events_skew_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def events_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: skewed ``events.user_id`` against a customer
    dim standing in for the small-but-not-broadcastable side.

    The big side salts its key, the dim replicates ×salt, and the join
    key becomes (user_id, salt) — each hot user spreads over ``salt``
    tasks instead of serializing into one. The oracle is the plain
    unsalted join; the plan gate asserts the exchange hashes on the
    salt column.
    """
    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    return salted_join(ev, dim, "user_id", salt=8).select(
        "event_id", "user_id", "c_name"
    )


@register(
    "events_heavy_hitters",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n_total FROM events),
    per_key AS (
        SELECT user_id, COUNT(*) AS n
        FROM events GROUP BY user_id
    )
    SELECT p.user_id, p.n,
           CAST(p.n AS DOUBLE) / t.n_total AS share
    FROM per_key p, tot t
    ORDER BY p.n DESC, p.user_id
    LIMIT 5
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew DIAGNOSTIC: the top-5 heaviest join/agg keys with their
    share of the table — the query an operator runs before deciding
    between a plain shuffle, AQE skew-join, or explicit salting
    (``events_skew_salted_*`` are the fixes; this measures the
    disease). One aggregate on the key, a 1-row broadcast total, and a
    TakeOrderedAndProject top-5 — the driver never sees the key set.
    """
    events = table(spark, sf_dir, "events")
    tot = events.agg(F.count(F.lit(1)).alias("n_total"))
    per_key = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("n_total")).alias("share"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(5)
    )
