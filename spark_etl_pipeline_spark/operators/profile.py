"""Data-quality profiling: one-pass per-column statistics.

The pre-flight check every large pipeline runs before trusting a new
drop of data: null ratios, distinct counts, numeric ranges — computed
for ALL columns in a single scan + single aggregate (one row of
struct-shaped aggregates, unpivoted to long form driver-side at plan
construction, not execution). At 100 TB this is the difference between
one pass and one pass per column.

Exact ``count(distinct)`` per column is shuffle-heavy at scale; pass
``approx=True`` to switch every distinct count to HyperLogLog
(``approx_count_distinct``, map-side combinable) — the default stays
exact so the DuckDB oracle can verify the plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.plans.registry import register, table


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Long-form profile: one row per column.

    Output: column, n_rows, n_null, n_distinct, min_str, max_str
    (min/max rendered as strings so one schema fits every column type).
    """
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            # Aggregate on the NATIVE type, render after: casting to string
            # before min/max would compare lexicographically ("10.2" < "9.5")
            # and report wrong numeric ranges.
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_str"),
                    F.col(f"__max_{c}").alias("max_str"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select("n_rows", per_col).select(
        "p.column", "n_rows", "p.n_null", "p.n_distinct", "p.min_str", "p.max_str"
    )


@register(
    "profile_orders",
    oracle="""
    SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           -- special doubles render differently per engine ('nan'/'inf'
           -- vs 'NaN'/'Infinity'); the profile contract canonicalizes
           -- on the Java tokens, so the oracle states them explicitly
           CASE WHEN isnan(MIN(o_totalprice)) THEN 'NaN'
                WHEN MIN(o_totalprice) = 'inf'::DOUBLE THEN 'Infinity'
                WHEN MIN(o_totalprice) = '-inf'::DOUBLE THEN '-Infinity'
                ELSE CAST(MIN(o_totalprice) AS VARCHAR) END,
           CASE WHEN isnan(MAX(o_totalprice)) THEN 'NaN'
                WHEN MAX(o_totalprice) = 'inf'::DOUBLE THEN 'Infinity'
                WHEN MAX(o_totalprice) = '-inf'::DOUBLE THEN '-Infinity'
                ELSE CAST(MAX(o_totalprice) AS VARCHAR) END
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table (3 columns, one scan — the
    oracle necessarily re-states it as one UNION branch per column,
    which is exactly the n-pass shape this operator avoids).

    Caveat proved by the oracle: double min/max rendered THROUGH CAST
    must format identically — both engines print shortest-roundtrip
    doubles, verified by the hash match.
    """
    orders = table(spark, sf_dir, "orders")
    return profile(orders, ["o_custkey", "o_orderstatus", "o_totalprice"])


# ---------------------------------------------------------------------------
# Declarative data-quality constraint audit (Deequ-style "unit tests for
# data": each rule is a boolean predicate; the audit reports how many rows
# fail each rule, in ONE pass per table).
# ---------------------------------------------------------------------------


def audit_rules(
    df: DataFrame, table_name: str, rules: list[tuple[str, F.Column]]
) -> DataFrame:
    """One-pass rule audit: conditional-sum every rule in a single
    aggregate over a single scan (same n-rules-one-pass shape as
    :func:`profile`). A row VIOLATES a rule when the predicate is not
    true — NULL predicates count as violations, the conservative DQ
    convention (an unknown is not a pass).

    Output: table_name, rule, n_checked, n_violations.
    """
    aggs = [F.count(F.lit(1)).alias("n_checked")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).cast("bigint").alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    per_rule = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__v_{name}").alias("n_violations"),
                )
                for name, _ in rules
            ]
        )
    ).alias("r")
    return one.select("n_checked", per_rule).select(
        F.lit(table_name).alias("table_name"),
        F.col("r.rule").alias("rule"),
        "n_checked",
        F.col("r.n_violations").alias("n_violations"),
    )


def audit_unique(df: DataFrame, table_name: str, col: str) -> DataFrame:
    """Uniqueness rule: violations = n_rows - n_distinct (0 when the
    column is a true key). Exact distinct is one shuffle on the key;
    at 100 TB swap in approx_count_distinct exactly as :func:`profile`
    does."""
    return df.agg(
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct(col)).cast("bigint").alias("n_violations"),
    ).select(
        F.lit(table_name).alias("table_name"),
        F.lit(f"unique_{col}").alias("rule"),
        "n_checked",
        "n_violations",
    )


def audit_referential(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, rule: str
) -> DataFrame:
    """Referential-integrity rule: count child rows whose key has no
    parent. LEFT JOIN against the DISTINCT parent keys + conditional
    count — one scan of each side, the parent key set broadcast/AQE
    sized, and (unlike an anti-join + separate total count) n_checked
    and n_violations come out of the same aggregate."""
    parent_keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    joined = child.join(
        parent_keys, child[child_key] == F.col("__pk"), "left_outer"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit(rule.split(".")[0]).alias("table_name"),
        F.lit(rule).alias("rule"),
        "n_checked",
        "n_violations",
    )


_DQ_ORACLE = """
    SELECT 'lineitem' AS table_name, 'quantity_in_1_50' AS rule,
           COUNT(*) AS n_checked,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'customer', 'acctbal_nonnegative', COUNT(*),
           CAST(SUM(CASE WHEN c_acctbal >= 0 THEN 0 ELSE 1 END) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'documents', 'min_100_chars', COUNT(*),
           CAST(SUM(CASE WHEN n_chars >= 100 THEN 0 ELSE 1 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'documents', 'lang_allowlisted', COUNT(*),
           CAST(SUM(CASE WHEN lang IN ('en', 'de', 'fr', 'es') THEN 0 ELSE 1 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'customer', 'unique_c_custkey', COUNT(*),
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'orders', 'orders.custkey_references_customer', COUNT(*),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
           ON c.c_custkey = o.o_custkey
    """


@register("dq_audit", oracle=_DQ_ORACLE)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit across four tables: range, policy, allowlist,
    uniqueness, and referential-integrity rules, each reporting
    (n_checked, n_violations) — the admission gate a pipeline runs on
    every new data drop before letting it downstream (the rules with
    nonzero counts here are the POLICY tier: report-and-route, not
    reject).

    Scale: per-table predicate rules share ONE scan each (conditional
    sums, map-side combinable); uniqueness is one distinct-aggregate
    shuffle; the referential check joins orders against the distinct
    customer key set (AQE broadcasts it when bounded). Nothing is
    row-expanded and no rule adds a pass over the data it checks.
    """
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    docs = table(spark, sf_dir, "documents")
    orders = table(spark, sf_dir, "orders")
    parts = [
        audit_rules(
            li,
            "lineitem",
            [("quantity_in_1_50", F.col("l_quantity").between(1, 50))],
        ),
        audit_rules(
            cust, "customer", [("acctbal_nonnegative", F.col("c_acctbal") >= 0)]
        ),
        audit_rules(
            docs,
            "documents",
            [
                ("min_100_chars", F.col("n_chars") >= 100),
                ("lang_allowlisted", F.col("lang").isin("en", "de", "fr", "es")),
            ],
        ),
        audit_unique(cust, "customer", "c_custkey"),
        audit_referential(
            orders, cust, "o_custkey", "c_custkey",
            "orders.custkey_references_customer",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Chi-squared independence profile (categorical association audit)
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
    WITH cells AS (
        SELECT event_type, isodow(ts) AS dow, COUNT(*) AS o
        FROM events GROUP BY event_type, isodow(ts)
    ),
    rt AS (SELECT event_type, SUM(o) AS rtot FROM cells GROUP BY event_type),
    ct AS (SELECT dow, SUM(o) AS ctot FROM cells GROUP BY dow),
    g  AS (SELECT SUM(o) AS gtot FROM cells),
    contrib AS (
        SELECT c.event_type,
               c.o,
               TRY_CAST(round(
                   power(CAST(c.o AS DOUBLE)
                         - CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE)
                           / CAST(g.gtot AS DOUBLE), 2)
                   / (CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE)
                      / CAST(g.gtot AS DOUBLE))
                   * 1000000) AS BIGINT) AS chi2_micro
        FROM cells c
        JOIN rt ON rt.event_type = c.event_type
        JOIN ct ON ct.dow = c.dow
        CROSS JOIN g
    )
    SELECT event_type,
           CAST(SUM(o) AS BIGINT) AS n,
           CAST(SUM(chi2_micro) AS BIGINT) AS chi2_micro
    FROM contrib GROUP BY event_type
    """


@register("events_chi2_independence", oracle=_CHI2_ORACLE)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between event type and ISO
    weekday — the drift/association audit a profiling pass runs to
    answer "does event mix depend on day of week, and which event type
    drives it?". Output: per-type row count and that type's summed
    chi-squared contribution.

    Determinism discipline (the ``rel_corr_stats`` pattern): the
    contingency table is EXACT integer counts from one map-side-
    combinable aggregate (collapses to |types|x7 cells regardless of
    input volume); expected counts and per-cell (o-e)^2/e are then
    evaluated in double on identical exact-integer operands — written
    as the SAME expression tree in both engines — and each cell's
    contribution is rounded to integer micro-units BEFORE the final
    sum, so the cross-cell sum is associative integer addition, never
    order-dependent float accumulation. Row/column totals and the
    grand total join back onto the cell table as broadcasts
    (cell table is tiny by construction; at 100 TB only the first
    aggregate sees data-scale rows).
    """
    events = table(spark, sf_dir, "events")
    cells = (
        events.select(
            "event_type", F.expr("weekday(ts) + 1").alias("dow")  # ISO: Mon=1
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("rtot"))
    ct = cells.groupBy("dow").agg(F.sum("o").alias("ctot"))
    g = cells.agg(F.sum("o").alias("gtot"))
    contrib = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "o",
            F.expr(
                "try_cast(round(power(cast(o as double) - cast(rtot as double) * "
                "cast(ctot as double) / cast(gtot as double), 2) / "
                "(cast(rtot as double) * cast(ctot as double) / "
                "cast(gtot as double)) * 1000000) as bigint)"
            ).alias("chi2_micro"),
        )
    )
    return contrib.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n"),
        F.sum("chi2_micro").cast("bigint").alias("chi2_micro"),
    )
