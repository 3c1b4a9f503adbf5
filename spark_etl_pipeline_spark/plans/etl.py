"""The clickstream ETL pipeline, re-expressed Spark-first.

The reference builds its normalized log by scanning the input once per
site-family × logtype branch and gluing the branches together with eight
``unionAll`` calls (reference jobs/etl_job.py:146-161 and 164-270) — at
100 TB that is 9+ scans of the same parquet. This module computes the same
result in a **single pass**: one scan, one ``json_tuple`` pulling every
JSON key any family uses, and a CASE WHEN choosing per-row which extracted
value is the product code/name.

Pipeline stages (reference parity, jobs/etl_job.py:138-161):

1. family/logtype filter + JSON key selection  (select_default/type1/2/3)
2. timestamp repair + UTC→KST + date/time split (adjust_* / split_timestamp)
3. comma/quote string surgery → array<string>    (remove_comma/remove_quote)
4. arrays_zip + explode_outer                    (explode_list)
5. userid←maid fallback (coalesce, not filter+union) (select_valid_id)
6. category-dimension join + login null-pad branch   (join_dfs)
7. full-row dedup                                     (drop_duplicates)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.functions import (
    date_time_parts,
    json_array_literal_to_array,
    last_url_segment,
    parse_utc_to_zone,
    repair_secondless_iso,
    strip_stray_commas,
)
from spark_etl_pipeline_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# Config model (replaces configs/etl_config.json 'transform' section)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FamilySpec:
    """One site family: which site ids belong to it, and which JSON keys
    hold the product code/name per logtype ('*' = any other logtype)."""

    site_ids: tuple[str, ...]
    keys: dict[str, tuple[str, str]] = field(default_factory=dict)
    #: logtypes whose extracted code is a URL → take the last path segment
    url_code_logtypes: tuple[str, ...] = ()


def reference_families(
    default_ids: tuple[str, ...],
    type1_ids: tuple[str, ...],
    type2_ids: tuple[str, ...],
    type3_ids: tuple[str, ...],
) -> dict[str, FamilySpec]:
    """The four families of the reference (key table: SURVEY.md §2.8 X1)."""
    return {
        "default": FamilySpec(
            default_ids,
            {"view": ("rb:itemId", "rb:itemName"), "*": ("productCode", "productName")},
        ),
        "type1": FamilySpec(
            type1_ids,
            {
                "cart": ("goodsCode", "name"),
                "view": ("tas:productCode", "og:title"),
                "*": ("goodsCode", "goodsName"),
            },
        ),
        "type2": FamilySpec(
            type2_ids,
            {"view": ("og:url", "og:title"), "*": ("productCode", "productName")},
            url_code_logtypes=("view",),
        ),
        "type3": FamilySpec(
            type3_ids,
            {"view": ("tas:productCode", "Title"), "*": ("productCode", "productName")},
        ),
    }


LOGTYPES = ("login", "purchase", "cart", "view")


# ---------------------------------------------------------------------------
# Single-pass normalization
# ---------------------------------------------------------------------------


def normalize_clickstream(df: DataFrame, families: dict[str, FamilySpec]) -> DataFrame:
    """One scan + CASE WHEN replaces the reference's 9-branch union cascade.

    Output columns: maid, siteseq, userid, timestamp, logtype,
    productCode, productName (same shape the reference's select_* stage
    produces, jobs/etl_job.py:174-176).
    """
    # Every JSON key any family/logtype needs, extracted once.
    all_keys = sorted({k for spec in families.values() for pair in spec.keys.values() for k in pair})
    extracted = df.select(
        "maid",
        F.col("info.siteseq").alias("siteseq"),
        "userid",
        "timestamp",
        "logtype",
        F.json_tuple(F.col("custom"), *all_keys).alias(*[f"__k_{k}" for k in all_keys]),
    )

    def pick(which: int) -> Column:
        """CASE WHEN over (family, logtype) choosing code (0) or name (1)."""
        expr: Column | None = None
        for spec in families.values():
            in_family = F.col("siteseq").isin(*spec.site_ids)
            fallback = spec.keys.get("*")
            for logtype in LOGTYPES:
                key = spec.keys.get(logtype, fallback)
                if key is None:
                    continue
                value = F.col(f"__k_{key[which]}")
                if which == 0 and logtype in spec.url_code_logtypes:
                    value = last_url_segment(value)
                cond = in_family & (F.col("logtype") == logtype)
                expr = F.when(cond, value) if expr is None else expr.when(cond, value)
        assert expr is not None
        return expr

    all_ids = [i for spec in families.values() for i in spec.site_ids]
    return (
        extracted.filter(F.col("logtype").isin(*LOGTYPES) & F.col("siteseq").isin(*all_ids))
        .withColumn("productCode", pick(0))
        .withColumn("productName", pick(1))
        .select("maid", "siteseq", "userid", "timestamp", "logtype", "productCode", "productName")
    )


def clean_timestamps(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Repair + parse + KST shift + date/time split (reference stages 2)."""
    kst = parse_utc_to_zone(repair_secondless_iso(ts_col))
    d, t = date_time_parts(kst)
    return df.withColumn("transaction_date", d).withColumn("transaction_time", t).drop(ts_col)


def explode_products(df: DataFrame) -> DataFrame:
    """String surgery → parallel arrays → zip → explode_outer.

    Keeps the reference's exact semantics (jobs/etl_job.py:310-350): the
    json_tuple extraction returns array-valued keys as raw `["a","b"]`
    literal text, which is comma/quote-stripped and split; explode_outer
    keeps rows whose arrays are null/empty.
    """
    zipped = (
        df.withColumn("productCode", json_array_literal_to_array(strip_stray_commas("productCode")))
        .withColumn("productName", json_array_literal_to_array(strip_stray_commas("productName")))
        .withColumn("pair", F.explode_outer(F.arrays_zip("productCode", "productName")))
    )
    keep = [c for c in df.columns if c not in ("productCode", "productName")]
    return zipped.select(
        *keep,
        F.col("pair.productCode").alias("productCode"),
        F.col("pair.productName").alias("productName"),
    )


def fallback_userid(df: DataFrame) -> DataFrame:
    """userid ← maid when null: one coalesce instead of the reference's
    filter-isNull + filter-isNotNull + union (jobs/etl_job.py:353-366)."""
    return df.withColumn("userid", F.coalesce(F.col("userid"), F.col("maid"))).drop("maid")


DIM_COLS = (
    "INTG_ID",
    "ITEM_NAME",
    "CAT1",
    "CAT2",
    "CAT3",
    "CAT4",
    "INTG_CAT1",
    "INTG_CAT2",
    "INTG_CAT3",
    "INTG_CAT4",
)


def join_category_dim(df: DataFrame, dim: DataFrame) -> DataFrame:
    """Dimension join + login null-pad branch (reference join_dfs,
    jobs/etl_job.py:380-423).

    The dim is a small lookup → broadcast. Branch semantics preserved
    exactly: *every* row with a (siteseq, productCode) match joins (the
    inner join doubles as the validity filter); *login* rows additionally
    flow through a null-padded branch.
    """
    up = df.toDF(*[c.upper() for c in df.columns])
    joined = up.join(
        F.broadcast(dim),
        (up.SITESEQ == dim.SHOPPING_ID) & (up.PRODUCTCODE == dim.ITEM_CODE),
    ).select(
        F.col("USERID").alias("USER_ID"),
        F.col("SITESEQ").alias("SHOPPING_ID"),
        "TRANSACTION_DATE",
        "TRANSACTION_TIME",
        F.col("LOGTYPE").alias("LOG_TYPE"),
        "INTG_ID",
        "ITEM_CODE",
        *DIM_COLS[1:],
    )
    login = up.filter(F.col("LOGTYPE") == "login").select(
        F.col("USERID").alias("USER_ID"),
        F.col("SITESEQ").alias("SHOPPING_ID"),
        "TRANSACTION_DATE",
        "TRANSACTION_TIME",
        F.col("LOGTYPE").alias("LOG_TYPE"),
        F.lit(None).cast("string").alias("ITEM_CODE"),
        *[F.lit(None).cast("string").alias(c) for c in DIM_COLS],
    )
    return joined.unionByName(login).withColumn("USER_ID", F.substring("USER_ID", 1, 100))


def clickstream_pipeline(
    logs: DataFrame, category_dim: DataFrame, families: dict[str, FamilySpec]
) -> DataFrame:
    """End-to-end parity pipeline (reference transform_data,
    jobs/etl_job.py:138-161) — one scan, one shuffle for the dedup."""
    return (
        logs.transform(lambda d: normalize_clickstream(d, families))
        .transform(clean_timestamps)
        .transform(explode_products)
        .transform(fallback_userid)
        .transform(lambda d: join_category_dim(d, category_dim))
        .dropDuplicates()
    )


# ---------------------------------------------------------------------------
# Registered query: the same pipeline shape over the driver's events table
# ---------------------------------------------------------------------------


@register(
    "etl_events_pipeline",
    oracle=r"""
    WITH normalized AS (
        SELECT CASE WHEN user_id % 10 = 0 THEN 'anon-' || CAST(event_id AS VARCHAR)
                    ELSE CAST(user_id AS VARCHAR) END AS user_key,
               user_id,
               event_type,
               strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d') AS transaction_date,
               strftime(ts + INTERVAL 9 HOUR, '%H:%M:%S') AS transaction_time,
               -- VARCHAR arm restricted to integer-shaped strings:
               -- DuckDB's string->int TRY_CAST coerces '3.5' (rounds
               -- to 4) and '1e3' (1000) where Spark's try_cast yields
               -- NULL for both; pad class [\x00-\x20\x7f] is the exact
               -- set Spark's cast strips (exhaustive codepoint probe,
               -- r14) and must be regexp-stripped before DuckDB's cast
               -- (which only trims [\x09-\x0d\x20]) — full derivation
               -- at rel_variant_props.
               CASE WHEN event_type IN ('purchase','click')
                        THEN TRY_CAST(CASE WHEN json_valid(props)
                                           AND (json_type(props, '$.k')
                                                    IN ('BIGINT','UBIGINT')
                                                OR (json_type(props, '$.k')
                                                        = 'VARCHAR'
                                                    AND regexp_matches(
                                                        json_extract_string(
                                                            props, '$.k'),
                                                        '^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$')))
                                           THEN regexp_replace(
                                                    json_extract_string(
                                                        props, '$.k'),
                                                    '^[\x00-\x20\x7f]+|[\x00-\x20\x7f]+$',
                                                    '', 'g')
                                      END AS BIGINT)
                    WHEN event_type IN ('view','error')
                        THEN TRY_CAST(round(value) AS BIGINT)
               END AS code
        FROM events
        WHERE ts >= TIMESTAMP '1990-01-01'
          AND ts <= (now() AT TIME ZONE 'UTC')
    ),
    joined AS (
        SELECT n.user_key, n.transaction_date, n.transaction_time,
               n.event_type AS log_type, n.code, c.c_mktsegment AS segment
        FROM normalized n JOIN customer c ON n.user_id = c.c_custkey
        WHERE n.code IS NOT NULL
        UNION ALL
        SELECT user_key, transaction_date, transaction_time,
               event_type AS log_type, NULL AS code, NULL AS segment
        FROM normalized WHERE event_type = 'signup'
    )
    SELECT DISTINCT * FROM joined
    """,
)
def etl_events_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline's shape on the driver's events table.

    Same stages as :func:`clickstream_pipeline`: single-pass CASE WHEN
    family normalization (families keyed on event_type), JSON extraction,
    UTC→KST date/time split, id fallback, dim join (no broadcast hint —
    customer scales with the data; AQE decides at runtime) with a
    null-padded 'signup' branch (the reference's 'login' branch), dedup.

    The epoch gate (``timeseries.epoch_gated``) matters here for a
    subtle reason: the engine converts UTC→KST with the NAMED zone
    (full IANA history — before 1908 Seoul was LMT +8:27:52, 1948-61
    was +8:30, 1987-88 had DST) while the oracle mirrors the modern
    fixed +9:00. Inside the declared epoch (1990+) the two are
    identical; a single pre-1990 garbage timestamp would expose the
    historical-offset divergence the hostile-timestamps sweep caught.
    """
    from spark_etl_pipeline_spark.operators.timeseries import epoch_gated

    events = epoch_gated(table(spark, sf_dir, "events"))
    cust = table(spark, sf_dir, "customer")

    kst = F.from_utc_timestamp("ts", "Asia/Seoul")
    d, t = date_time_parts(kst)
    normalized = events.select(
        F.when(F.col("user_id") % 10 == 0, F.concat(F.lit("anon-"), F.col("event_id")))
        .otherwise(F.col("user_id").cast("string"))
        .alias("user_key"),
        "user_id",
        "event_type",
        d.alias("transaction_date"),
        t.alias("transaction_time"),
        F.when(
            F.col("event_type").isin("purchase", "click"),
            # try_cast: get_json_object already NULLs malformed JSON,
            # but a non-integral or out-of-range extracted token
            # ('3.5', an over-bigint literal) turned ONE damaged
            # payload into a job-killing ANSI CAST_INVALID_INPUT
            # (props-edge fuzz corpus)
            F.get_json_object("props", "$.k").try_cast("long"),
        )
        .when(F.col("event_type").isin("view", "error"), F.round("value").try_cast("long"))
        .alias("code"),
    )
    # r16 (guide §2/§6): the two branches are DISJOINT by construction
    # (the code CASE never fires for 'signup', the signup branch keeps
    # only 'signup'), yet the union form re-ran the whole normalization
    # — JSON extraction, the IANA timezone conversion, the date/time
    # split — over the full events table once per branch (Catalyst
    # does not CSE across union arms, and neither filter can push past
    # the computed columns). One pass now: keep a row if it is a
    # signup OR carries a code, LEFT-join customer only for the
    # non-signup rows (join condition false for signups → one
    # null-padded row each, exactly the old padding), and re-require
    # the match for non-signups (the old INNER join). Same rows, same
    # types, one events scan instead of two.
    is_signup = F.col("event_type") == "signup"
    rows = normalized.filter(is_signup | F.col("code").isNotNull())
    return (
        rows.join(
            cust,
            (rows.user_id == cust.c_custkey) & ~is_signup,
            "left",
        )
        .filter(is_signup | F.col("c_custkey").isNotNull())
        .select(
            "user_key",
            "transaction_date",
            "transaction_time",
            F.col("event_type").alias("log_type"),
            F.when(is_signup, F.lit(None).cast("long"))
            .otherwise(F.col("code"))
            .alias("code"),
            F.when(is_signup, F.lit(None).cast("string"))
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
        )
        .dropDuplicates()
    )


# ---------------------------------------------------------------------------
# Upsert / merge (SCD-style) — the load pattern appends can't express
# ---------------------------------------------------------------------------


def upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Merge ``updates`` into ``current`` by key: update matches, insert
    new keys, keep untouched rows.

    Full-outer join + per-column coalesce(updates, current) — the
    engine-agnostic MERGE. At scale: one shuffle on the key for each
    side (or zero if both are bucketed on the key — see
    ``sources.write_bucketed``); with a table format that supports
    MERGE INTO (Delta/Iceberg), swap this for the native command and
    keep the same call site.
    """
    cols = current.columns
    u = updates.alias("u")
    c = current.alias("c")
    return u.join(c, F.col(f"u.{key}") == F.col(f"c.{key}"), "full_outer").select(
        *[
            F.coalesce(F.col(f"u.{col}"), F.col(f"c.{col}")).alias(col)
            for col in cols
        ]
    )


@register(
    "etl_upsert_merge",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100.0 AS c_acctbal, 'UPDATED' AS c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT 900000 + c_custkey, 'new-' || c_name, c_nationkey,
               0.0 AS c_acctbal, 'NEW' AS c_mktsegment
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT COALESCE(u.c_custkey, c.c_custkey) AS c_custkey,
           COALESCE(u.c_name, c.c_name) AS c_name,
           COALESCE(u.c_nationkey, c.c_nationkey) AS c_nationkey,
           COALESCE(u.c_acctbal, c.c_acctbal) AS c_acctbal,
           COALESCE(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
    FROM updates u FULL OUTER JOIN customer c ON u.c_custkey = c.c_custkey
    """,
)
def etl_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-style merge: a deterministic update/insert batch applied to
    the customer table (updates bump acctbal by a constant — one
    addition of identical doubles, engine-exact; inserts shift the key
    range). Exercises the full-outer + coalesce MERGE shape."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    updates = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("c_mktsegment", F.lit("UPDATED"))
    ).unionByName(
        cust.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 900000).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
            "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    return upsert(cust, updates, "c_custkey")
