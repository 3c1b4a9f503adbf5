"""Relational core query suite.

Covers the reference's entire relational operator surface (SURVEY.md §2:
filters F1-F5, projections P1-P5, join J1 + the full Spark join surface,
unions U1, dedup D1, aggregates D2 generalized) plus sort/limit, window
functions, rollup/cube/pivot, range and as-of joins — each registered with
a DuckDB oracle.

All Spark implementations are declarative DataFrame plans: filters and
projections push into the parquet scan, small dimensions are broadcast,
and aggregates use integer-cents arithmetic for cross-engine determinism
(see plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.functions import cents
from spark_etl_pipeline_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# Flagship aggregation queries (scan → filter → groupBy → agg)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
           CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
           CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - TRY_CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
           CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - TRY_CAST(round(l_discount*100) AS BIGINT))
                    * (100 + TRY_CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE)/1000000.0 AS sum_charge,
           CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_qty,
           CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
           CAST(SUM(TRY_CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the engine's flagship query.

    Single scan, filter pushed to parquet, one hash aggregate with
    map-side partial aggregation — the plan Catalyst should pick with no
    hints at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-31 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_c) * (100 + tax_c)).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / 100.0 / n).alias("avg_qty"),
            (F.sum(price_c).cast("double") / 100.0 / n).alias("avg_price"),
            (F.sum(disc_c).cast("double") / 100.0 / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)
                    * TRY_CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND round(l_discount*100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: conjunctive range filters → global sum (no shuffle
    beyond the final single-partition agg)."""
    li = table(spark, sf_dir, "lineitem")
    disc_c = cents("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(cents("l_extendedprice") * disc_c).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "q3_top_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)
                    * (100 - TRY_CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY SUM(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)
                 * (100 - TRY_CAST(round(l.l_discount*100) AS BIGINT))) DESC,
             o.o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: 3-way join → agg → deterministic top-10.

    customer scales with the fact data, so it gets NO broadcast hint —
    AQE converts the customer⋈orders join to broadcast at runtime when
    the filtered side genuinely fits, and shuffles otherwise. The
    orders⋈lineitem join shuffles on orderkey (both huge at 100 TB — the
    right plan). Top-k uses exact integer revenue with an orderkey
    tiebreak, so LIMIT is deterministic.
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev_c = F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_c.alias("_rev_c"))
        .orderBy(F.col("_rev_c").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            (F.col("_rev_c").cast("double") / 10000.0).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)
                    * (100 - TRY_CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: 6-way join with broadcast dims.

    nation/region are broadcast — genuinely bounded tables (25/5 rows at
    any scale). supplier and customer scale with the data, so they get no
    hint; AQE broadcasts them at runtime only if they actually fit. The
    customer⋈orders⋈lineitem chain shuffles on its keys.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # r15: lineitem is the PROBE side — written fact-first so the
        # planner builds the hash relation from the filtered
        # customer⋈orders chain, never from the fact table (the
        # estimate-driven plan broadcast lineitem itself: collecting
        # the biggest table to the driver, 1.5 s of the 1.5 s query;
        # guide-correct shape is stream-the-fact, build-the-dims).
        li.join(
            cust.join(orders, cust.c_custkey == orders.o_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double")
                / 10000.0
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Filters (SURVEY.md §2.3 F1-F5)
# ---------------------------------------------------------------------------


@register(
    "rel_filter_isin",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
    FROM lineitem
    WHERE l_returnflag IN ('A','R') AND l_linestatus = 'F'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def rel_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F5: IN-list + equality + conjunction, pushed to the scan."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
        )
    )


@register(
    "rel_filter_nested_struct",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority, COUNT(*) AS n
    FROM orders
    WHERE o_orderstatus IN ('O','P') AND o_orderpriority IN ('1-URGENT','2-HIGH')
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def rel_filter_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: IN-list on a nested struct field via dot-path access.

    Mirrors the reference's ``df.info.siteseq.isin(...)`` pattern
    (reference jobs/etl_job.py:173): build a struct column, filter on its
    fields by dot path. Catalyst collapses the struct creation, so the plan
    is identical to filtering the flat columns.
    """
    orders = table(spark, sf_dir, "orders").withColumn(
        "info", F.struct(F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority"))
    )
    return (
        orders.filter(
            F.col("info.status").isin("O", "P")
            & F.col("info.priority").isin("1-URGENT", "2-HIGH")
        )
        .groupBy(F.col("info.status").alias("status"), F.col("info.priority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "rel_filter_null",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN NULLIF(c_mktsegment,'BUILDING') IS NULL THEN 1 END) AS n_null,
           COUNT(CASE WHEN NULLIF(c_mktsegment,'BUILDING') IS NOT NULL THEN 1 END) AS n_not_null
    FROM customer
    GROUP BY c_nationkey
    """,
)
def rel_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: isNull / isNotNull predicates (null synthesized via NULLIF)."""
    cust = table(spark, sf_dir, "customer").withColumn(
        "seg", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("seg").isNull(), 1)).alias("n_null"),
        F.count(F.when(F.col("seg").isNotNull(), 1)).alias("n_not_null"),
    )


# ---------------------------------------------------------------------------
# Projections (SURVEY.md §2.4 P1-P5)
# ---------------------------------------------------------------------------


@register(
    "rel_project_ops",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 8) AS name8,
           CAST(NULL AS VARCHAR) AS pad,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class
    FROM part
    WHERE p_retailprice > 500
    """,
)
def rel_project_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P4/P5: select + withColumn + null padding + SQL-expression col.

    The null pad mirrors the reference's ``lit(None).cast(StringType())``
    union-schema-alignment trick (reference jobs/etl_job.py:400-410);
    substring mirrors its ``expr('substring(USER_ID, 1, 100)')``
    (jobs/etl_job.py:423).
    """
    part = table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 500)
    return (
        part.withColumn("size_class", F.when(F.col("p_size") > 25, "big").otherwise("small"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.lit(None).cast("string").alias("pad"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            "size_class",
        )
    )


@register(
    "rel_rename_upper",
    oracle="""
    SELECT n.n_nationkey AS N_NATIONKEY, n.n_name AS N_NAME, r.r_name AS R_NAME
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def rel_rename_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: bulk rename-to-upper via toDF (replaces the reference's
    per-column withColumnRenamed loop, jobs/etl_job.py:388-389)."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    return joined.toDF(*[c.upper() for c in joined.columns])


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.5 J1 + full Spark join surface)
# ---------------------------------------------------------------------------


@register(
    "rel_join_inner_2key",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT l.l_returnflag, COUNT(*) AS n,
           CAST(SUM(TRY_CAST(round(l.l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
    FROM lineitem l
    JOIN dim d ON l.l_partkey = d.l_partkey AND l.l_suppkey = d.l_suppkey
    WHERE l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def rel_join_inner_2key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join on a 2-key conjunctive condition (the reference's
    SITESEQ+PRODUCTCODE join shape, jobs/etl_job.py:392)."""
    li = table(spark, sf_dir, "lineitem")
    dim = (
        li.filter(F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select(F.col("l_partkey").alias("d_partkey"), F.col("l_suppkey").alias("d_suppkey"))
        .distinct()
    )
    fact = li.filter(F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    return (
        fact.join(
            dim,
            on=(fact.l_partkey == dim.d_partkey) & (fact.l_suppkey == dim.d_suppkey),
            how="inner",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
        )
    )


@register(
    "rel_join_left",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_rows,
           COUNT(o.o_orderkey) AS n_matched,
           CAST(SUM(COALESCE(TRY_CAST(round(o.o_totalprice*100) AS BIGINT), 0)) AS DOUBLE)/100.0 AS sum_price
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def rel_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: unmatched left rows survive with nulls."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_matched"),
            (F.sum(F.coalesce(cents("o_totalprice"), F.lit(0))).cast("double") / 100.0).alias(
                "sum_price"
            ),
        )
    )


@register(
    "rel_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "rel_join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "rel_join_full",
    oracle="""
    WITH neg AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0),
         big AS (SELECT o_custkey,
                        CAST(SUM(TRY_CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS big_total
                 FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey)
    SELECT COALESCE(n.c_custkey, b.o_custkey) AS custkey,
           n.c_acctbal AS acctbal, b.big_total AS big_total
    FROM neg n FULL OUTER JOIN big b ON n.c_custkey = b.o_custkey
    """,
)
def rel_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    cust = table(spark, sf_dir, "customer")
    neg = cust.filter(F.col("c_acctbal") < 0).select("c_custkey", "c_acctbal")
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg((F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("big_total"))
    )
    return neg.join(big, neg.c_custkey == big.o_custkey, "full").select(
        F.coalesce(neg.c_custkey, big.o_custkey).alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        "big_total",
    )


@register(
    "rel_join_cross",
    oracle="""
    SELECT r.r_name, s.status
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    """,
)
def rel_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (small × small only — a cartesian product is never the
    right plan for two large inputs)."""
    region = table(spark, sf_dir, "region")
    status = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return region.crossJoin(F.broadcast(status)).select("r_name", "status")


# ---------------------------------------------------------------------------
# Set ops / dedup (SURVEY.md §2.6 U1, §2.7 D1)
# ---------------------------------------------------------------------------


@register(
    "rel_union_dedup",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def rel_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+D1: union by name + distinct (reference's unionAll cascade,
    jobs/etl_job.py:260-270, with unionByName killing positional bugs)."""
    cust = table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.unionByName(b).distinct()


@register(
    "rel_dedup_keyed",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def rel_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup: latest row per key via row_number with explicit tiebreak.

    The scale-correct form of the reference's full-row ``dropDuplicates()``
    (jobs/etl_job.py:369-377): one shuffle on the key, deterministic
    survivor (SURVEY.md §4 hazard 4).
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregates (SURVEY.md §2.7 D2 generalized)
# ---------------------------------------------------------------------------


@register(
    "rel_agg_stats",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_cust,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(SUM(TRY_CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price,
           CAST(SUM(TRY_CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def rel_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / countDistinct / min / max / sum / avg in one hash aggregate."""
    orders = table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    return orders.groupBy("o_orderpriority").agg(
        n.alias("n"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("sum_price"),
        (F.sum(cents("o_totalprice")).cast("double") / 100.0 / n).alias("avg_price"),
    )


@register(
    "rel_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (hierarchical subtotals + grand total).

    Empty-input note: on a zero-row table Spark emits 0 rows while
    ANSI/DuckDB emit the ``()`` grand-total row — a pinned, documented
    divergence (``test_grouping_sets_empty_input_divergence_pinned``).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "rel_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations).

    Empty-input note: same pinned Spark-vs-ANSI divergence as
    ``rel_rollup`` — 0 rows vs the single ``()`` grouping-set row.
    """
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@register(
    "rel_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN TRY_CAST(round(l_quantity*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0 AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN TRY_CAST(round(l_quantity*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0 AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never pivot on unbounded
    cardinality at scale — the value list bounds the output width)."""
    li = table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(cents("l_quantity")))
    )
    return pivoted.select(
        "l_returnflag",
        (F.coalesce(F.col("O"), F.lit(0)).cast("double") / 100.0).alias("qty_O"),
        (F.coalesce(F.col("F"), F.lit(0)).cast("double") / 100.0).alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------


@register(
    "rel_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def rel_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    no full sort, each partition keeps k rows."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "rel_window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    """,
)
def rel_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (row_number with unique tiebreak).

    Scale contract: a FULL per-group ranking inherently serializes each
    group into one task (the total order is the semantics — unlike a
    windowed count, it cannot be rewritten as groupBy + join, cf. the
    de-windowed ``sim_ann_hyperplane``). Partition-key cardinality is
    therefore the parallelism bound; for low-cardinality keys at corpus
    scale, ask for the top-K variant instead (``text_vocab_topk``'s
    TakeOrderedAndProject-then-window shape), which this engine gates."""
    cust = table(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_rank = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_rank).alias("rnk"),
        F.dense_rank().over(w_rank).alias("drnk"),
    )


@register(
    "rel_window_running",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
               AS running_qty,
           lag(l_quantity)  OVER (PARTITION BY l_suppkey
                                  ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty,
           lead(l_quantity) OVER (PARTITION BY l_suppkey
                                  ORDER BY l_shipdate, l_orderkey, l_linenumber) AS next_qty
    FROM lineitem WHERE l_suppkey <= 10
    """,
)
def rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead over a deterministic total order."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = Window.partitionBy("l_suppkey").orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(cents("l_quantity")).over(w_run).cast("double") / 100.0).alias("running_qty"),
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
    )


@register(
    "rel_window_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT))
                OVER w AS DOUBLE)/100.0 / COUNT(*) OVER w AS moving_avg_price
    FROM lineitem WHERE l_suppkey <= 5
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def rel_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: 3-row moving average (exact-integer sum / count)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber"))
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.sum(cents("l_extendedprice")).over(w).cast("double")
            / 100.0
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_price"),
    )


# ---------------------------------------------------------------------------
# Range join + as-of join (beyond the reference's join surface)
# ---------------------------------------------------------------------------


@register(
    "rel_range_join",
    oracle="""
    WITH buckets(bucket, lo, hi) AS (VALUES ('low', 0, 10), ('mid', 10, 25), ('high', 25, 51))
    SELECT b.bucket, COUNT(*) AS n,
           CAST(SUM(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price
    FROM lineitem l JOIN buckets b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket
    """,
)
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: fact rows against a tiny bucket table.

    The bucket side is broadcast, so the inequality join is a broadcast
    nested-loop over 3 rows — the only sane physical plan for band joins
    with a small band table.
    """
    li = table(spark, sf_dir, "lineitem")
    buckets = spark.createDataFrame(
        [("low", 0, 10), ("mid", 10, 25), ("high", 25, 51)], "bucket string, lo int, hi int"
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias("sum_price"),
        )
    )


@register(
    "rel_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id, strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
    FROM (SELECT * FROM events WHERE user_id <= 60) e
    ASOF JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order at-or-before it.

    Implemented via the operators.asof module (join + windowed argmax).
    Only the matched *date* is projected — the as-of key — because ties on
    (custkey, orderdate) make the full matched row engine-dependent.
    """
    from spark_etl_pipeline_spark.operators.asof import asof_join

    events = table(spark, sf_dir, "events").filter(F.col("user_id") <= 60)
    orders = table(spark, sf_dir, "orders")
    matched = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_keys=["event_id"],
    )
    return matched.select(
        "event_id",
        "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    )


@register(
    "rel_asof_nearest",
    oracle="""
    WITH e AS (SELECT * FROM events WHERE user_id <= 60),
    cand AS (
        SELECT e.event_id, e.user_id, o.o_orderdate,
               abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) - epoch_us(e.ts))
                   AS dist,
               CAST(o.o_orderdate AS TIMESTAMP) > e.ts AS fwd
        FROM e JOIN orders o ON o.o_custkey = e.user_id
    )
    SELECT event_id, user_id,
           strftime(o_orderdate, '%Y-%m-%d') AS nearest_orderdate
    FROM (SELECT *, row_number() OVER (PARTITION BY event_id
              ORDER BY dist, fwd, o_orderdate) AS rn
          FROM cand)
    WHERE rn = 1
    """,
)
def rel_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each event matched to the order
    CLOSEST in time, before or after, with exact-distance ties resolved
    to the backward row (the pandas ``merge_asof`` convention,
    hypothesis-pinned against it in ``tests/test_asof_properties.py``).
    Backward-only as-of (``rel_asof_join``) answers "what was in effect";
    nearest answers "what does this reading belong to" — sensor
    alignment, trade-to-quote matching. Distance compares integer
    microseconds, so the argmin is exact in both engines.
    """
    from spark_etl_pipeline_spark.operators.asof import asof_join

    events = table(spark, sf_dir, "events").filter(F.col("user_id") <= 60)
    orders = table(spark, sf_dir, "orders")
    matched = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_keys=["event_id"],
        direction="nearest",
    )
    return matched.select(
        "event_id",
        "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("nearest_orderdate"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles + SQL-API subqueries (engine surface beyond reference)
# ---------------------------------------------------------------------------


@register(
    "rel_percentiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           quantile_cont(CASE WHEN isnan(l_extendedprice)
                               OR isinf(l_extendedprice) THEN NULL
                              ELSE l_extendedprice END, 0.5) AS p50,
           quantile_cont(CASE WHEN isnan(l_extendedprice)
                               OR isinf(l_extendedprice) THEN NULL
                              ELSE l_extendedprice END, 0.9) AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — of the FINITE
    distribution.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    sort-and-interpolate definition — verified bit-identical on doubles.
    NaN/±Inf cells (the float damage class) are nulled INTO the
    aggregate on both sides: the engines disagree on where specials
    sort (Spark ranks NaN greatest; DuckDB lets it poison the
    interpolation), and a percentile of measurement damage is
    meaningless anyway — while ``n`` still counts every row, so the
    damage stays visible. Exact percentiles sort each group (one
    shuffle); at 100 TB prefer ``approx_percentile`` (t-digest,
    map-side combinable) when a bounded error is acceptable — kept
    exact here so the oracle can check it.
    """
    finite = (
        "CASE WHEN isnan(l_extendedprice) "
        "  OR abs(l_extendedprice) = double('Infinity') THEN NULL "
        "ELSE l_extendedprice END"
    )
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"percentile({finite}, 0.5)").alias("p50"),
        F.expr(f"percentile({finite}, 0.9)").alias("p90"),
    )


@register(
    "rel_sql_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    """,
)
def rel_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via the SQL API (TPC-H-Q4-shaped).

    Catalyst rewrites the correlated EXISTS into a left-semi hash join
    on l_orderkey — the same physical plan the DataFrame
    ``join(how='left_semi')`` builds, proving both front doors reach one
    engine. Tables enter as parameterized-``spark.sql`` DataFrame args,
    not temp views: ``createOrReplaceTempView`` is a session-GLOBAL
    binding, so two concurrent invocations of one builder on different
    ``sf_dir``\\ s raced and silently read each other's data (measured:
    6 of 12 concurrent runs returned the other directory's rows).
    """
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n
        FROM {orders} o
        WHERE EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        GROUP BY o.o_orderpriority
        """,
        orders=table(spark, sf_dir, "orders"),
        lineitem=table(spark, sf_dir, "lineitem"),
    )


@register(
    "rel_sql_scalar_subquery",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS n_above
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c.c_nationkey
    """,
)
def rel_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's mean
    balance. Catalyst decorrelates into an aggregate + join — no
    per-row re-execution (the naive reading would be O(n²)). The table
    enters as a parameterized-``spark.sql`` DataFrame arg (see
    ``rel_sql_exists`` for why temp views are a concurrency hazard)."""
    return spark.sql(
        """
        SELECT c.c_nationkey, COUNT(*) AS n_above
        FROM {customer} c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM {customer} c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c.c_nationkey
        """,
        customer=table(spark, sf_dir, "customer"),
    )


@register(
    "rel_sql_not_in",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_idle
    FROM customer c
    WHERE c.c_custkey NOT IN
        (SELECT o.o_custkey FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def rel_sql_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery → customers with no *recent* orders, per segment.

    o_custkey is non-nullable here, so Catalyst plans a null-aware
    anti-join as a plain left-anti hash join — the DataFrame twin of
    ``join(how='left_anti')``. (With a nullable subquery column, NOT IN
    needs the null-aware variant — a real semantic difference from NOT
    EXISTS worth keeping behind a SQL test.)
    """
    return spark.sql(
        """
        SELECT c.c_mktsegment, COUNT(*) AS n_idle
        FROM {customer} c
        WHERE c.c_custkey NOT IN
            (SELECT o.o_custkey FROM {orders} o
             WHERE o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
        GROUP BY c.c_mktsegment
        """,
        customer=table(spark, sf_dir, "customer"),
        orders=table(spark, sf_dir, "orders"),
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: orders-per-customer histogram.

    Left outer join keeps order-less customers (COUNT of the null key
    gives 0), then a second aggregate builds the distribution — the
    two-level agg is two small shuffles, both map-side combinable.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "rel_window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(lag(o_orderdate) OVER w, '%Y-%m-%d') AS prev_orderdate,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS next_orderdate,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def rel_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window breadth: lag / lead / ntile / percent_rank over
    one window spec — one shuffle on the partition key, every function
    evaluated in the same sorted pass. Deterministic via the
    (o_orderdate, o_orderkey) tiebreak; percent_rank is (rank-1)/(n-1)
    in both engines — identical integers, one double division."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format(F.lag("o_orderdate").over(w), "yyyy-MM-dd").alias("prev_orderdate"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("next_orderdate"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )


@register(
    "q19_disjunctive_filter",
    oracle="""
    SELECT CAST(SUM(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)
                    * (100 - TRY_CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 30)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: OR-of-ANDs across both join sides.

    Catalyst extracts the common join key as an equi-join and keeps the
    disjunction as a post-join filter, while pushing each side's
    derivable disjuncts (brand/size on part, quantity on lineitem) down
    to the scans — the plan to check when a user writes 'messy' OR
    predicates.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        ((part.p_brand == "Brand#1") & part.p_size.between(1, 15) & (li.l_quantity >= 10))
        | ((part.p_brand == "Brand#2") & part.p_size.between(10, 30) & (li.l_quantity >= 20))
        | ((part.p_brand == "Brand#3") & part.p_size.between(20, 50) & (li.l_quantity >= 30))
    )
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double")
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "etl_json_struct",
    oracle="""
    WITH x AS (
        -- STRICT-typing twin of from_json's declared int field: only
        -- a JSON INTEGER that fits int32 yields k (a quoted "12", a
        -- 3.5, an array, or an oversized int is NULL — from_json does
        -- not coerce across JSON types), and json_valid guards
        -- malformed payloads that DuckDB json functions ERROR on.
        SELECT event_type,
               TRY_CAST(CASE WHEN json_valid(props)
                              AND json_type(props, '$.k')
                                  IN ('BIGINT', 'UBIGINT')
                             THEN json_extract_string(props, '$.k')
                        END AS INTEGER) AS k,
               CASE WHEN NOT json_valid(props)
                         OR json_extract_string(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END AS null_missing
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(null_missing) AS BIGINT) AS n_null_missing
    FROM x
    GROUP BY event_type
    """,
)
def etl_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-schema JSON parsing: ``from_json`` with a declared
    struct (the blessed path per SURVEY §1 — no schema inference in
    production), including a declared-but-absent field that must come
    back null rather than error.

    ``k`` is declared INT, the contract's 32-bit counter type: an
    out-of-int32 payload nulls the FIELD (permissive parse), and the
    64-bit SUM over int32 inputs cannot hit ANSI ARITHMETIC_OVERFLOW —
    with k declared bigint, two adversarial int64-extreme payloads
    made the aggregate itself the job-killer (props-edge fuzz
    corpus)."""
    events = table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "p", F.from_json("props", "struct<k: int, missing: string>")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p.k")).alias("sum_k"),
        F.sum(F.when(F.col("p.missing").isNull(), 1).otherwise(0)).alias(
            "n_null_missing"
        ),
    )


@register(
    "rel_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube) via
    the SQL API — one Expand + one aggregate, not one scan per set.

    Empty-input note: the ``()`` set carries the same pinned
    Spark-vs-ANSI divergence as ``rel_rollup`` (0 rows vs 1).
    """
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
        FROM {lineitem}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
        lineitem=table(spark, sf_dir, "lineitem"),
    )


@register(
    "rel_set_ops",
    oracle="""
    WITH recent AS (SELECT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
    old AS (SELECT o_custkey FROM orders
            WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
    SELECT 'both' AS bucket, COUNT(*) AS n
    FROM (SELECT o_custkey FROM recent INTERSECT SELECT o_custkey FROM old)
    UNION ALL
    SELECT 'recent_only' AS bucket, COUNT(*) AS n
    FROM (SELECT o_custkey FROM recent EXCEPT SELECT o_custkey FROM old)
    UNION ALL
    SELECT 'old_only' AS bucket, COUNT(*) AS n
    FROM (SELECT o_custkey FROM old EXCEPT SELECT o_custkey FROM recent)
    """,
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics): customer-activity overlap
    between eras. Each set op compiles to a semi/anti hash aggregate —
    the full Spark set-operation surface beyond the reference's
    positional unionAll."""
    orders = table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp")
    recent = orders.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    old = orders.filter(F.col("o_orderdate") < cut).select("o_custkey")
    n = F.count(F.lit(1)).alias("n")
    return (
        recent.intersect(old).agg(n).select(F.lit("both").alias("bucket"), "n")
        .unionByName(
            recent.subtract(old).agg(n)
            .select(F.lit("recent_only").alias("bucket"), "n")
        )
        .unionByName(
            old.subtract(recent).agg(n)
            .select(F.lit("old_only").alias("bucket"), "n")
        )
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped: join + CONDITIONAL aggregation (CASE inside
    SUM) — one join, one hash agg; the CASE evaluates per-row inside
    the partial aggregate, so both counts come from the same pass.
    (The synthetic lineitem has no shipmode column; l_returnflag plays
    the grouping role — the plan shape is what Q12 exercises.)"""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    WITH j AS (
        SELECT p.p_type,
               TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)
                   * (100 - TRY_CAST(round(l.l_discount*100) AS BIGINT)) AS disc_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    )
    SELECT (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_c ELSE 0 END)
                 AS DOUBLE)
            / SUM(disc_c)) * 100.0 AS promo_revenue_pct
    FROM j
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped: ratio-of-conditional-sums (market-share query).

    Both sums are integer-cents (associative, partition-order-proof);
    the ratio is ONE double division of identical integers followed by
    one exact multiply — bit-identical across engines. One join + one
    global aggregate; part is dimension-sized, left to AQE to broadcast.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    disc_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc_c).otherwise(0))
    total = F.sum(disc_c)
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .agg(((promo.cast("double") / total) * 100.0).alias("promo_revenue_pct"))
    )


Q18_MIN_QTY_CENTS = 30_000  # orders totalling > 300 units


@register(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS qty_c
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) > {Q18_MIN_QTY_CENTS}
    )
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice,
           CAST(b.qty_c AS DOUBLE) / 100.0 AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: HAVING-filtered aggregate drives a join chain
    (large-volume-customer query). The per-order quantity aggregate
    reduces lineitem to order grain BEFORE any join — the filter-early
    plan; the surviving 'big orders' set is small, so AQE broadcasts it
    up the orders/customer joins at runtime."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))
        .filter(F.col("qty_c") > Q18_MIN_QTY_CENTS)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            (F.col("qty_c").cast("double") / 100.0).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Partition pruning as a registered capability (SURVEY §4: read the
# dataset ROOT and filter the partition column — the reference instead
# hardcodes one partition's path into its config)
# ---------------------------------------------------------------------------


def _partitioned_orders_copy(spark: SparkSession, sf_dir: str) -> str:
    """One-time partitioned-by-status copy of ``orders`` under /tmp.

    Hive-style layout (``o_orderstatus=F/...``) is what makes pruning
    possible; the copy is cached per sf_dir and rebuilt only when
    missing, so the registered query measures the READ path, not the
    write. Production tables are born partitioned — this stand-in
    exists because the driver's flat test tables are not.
    """
    import hashlib
    import os

    from spark_etl_pipeline_spark.sources import write_parquet

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    root = f"/tmp/spark_graft_cache/orders_by_status_{key}"
    if not os.path.exists(os.path.join(root, "_SUCCESS")):
        write_parquet(
            table(spark, sf_dir, "orders"),
            root,
            mode="overwrite",
            partition_by=["o_orderstatus"],
        )
    return root


@register(
    "rel_partition_prune",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def rel_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-level partition pruning: scan the partitioned root with
    a predicate on the partition column. The predicate lands in the
    scan's ``PartitionFilters`` (plan-gated), so non-matching
    directories are never even LISTED — at 100 TB this is the difference
    between reading one status partition and reading the table. The
    oracle runs the same filter over the flat table: pruning must be
    invisible in the result.

    The read supplies the known schema explicitly: it skips footer
    inference, and it is what keeps the cold-start case alive — a
    born-partitioned table with zero partitions yet (the empty-input
    sweep stages exactly this) is uninferrable but reads fine as an
    empty frame when the schema is declared.
    """
    from spark_etl_pipeline_spark.sources import read_parquet

    root = _partitioned_orders_copy(spark, sf_dir)
    df = read_parquet(
        spark,
        root,
        predicate=F.col("o_orderstatus") == "F",
        schema=table(spark, sf_dir, "orders").schema,
    )
    return df.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


# ---------------------------------------------------------------------------
# TPC-H widening (round 5): the remaining classic shapes expressible on
# this schema (no partsupp / commit-receipt dates / phone columns in the
# synthetic tables, so q2/q11/q12/q21's exact text can't run; q4/q17/q22
# are adapted to equivalent shapes on the columns that exist).
# ---------------------------------------------------------------------------

_REV_DUCK = (
    "TRY_CAST(round(l_extendedprice*100) AS BIGINT)"
    " * (100 - TRY_CAST(round(l_discount*100) AS BIGINT))"
)


def _rev_cents():
    return cents("l_extendedprice") * (100 - cents("l_discount"))


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: order-priority checking via EXISTS (adapted —
    the synthetic lineitem has no commit/receipt dates, so "late" is a
    shipment >60 days after the order date).

    The correlated EXISTS becomes a LEFT SEMI join on l_orderkey with
    the 60-day comparison as a join-side predicate — one shuffle pair
    on orderkey, then a tiny 5-group aggregate. No decorrelation
    subquery machinery needed when you write the semi-join directly.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_DUCK}) AS DOUBLE)/10000.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: shipping volume between two nations by year.

    The nation-pair disjunction lands on the two BROADCAST nation dims
    (25 rows each) — it prunes after the broadcast joins, while the
    fact-side chain (lineitem⋈orders, ⋈customer, ⋈supplier) shuffles
    on its keys exactly once each. Year extraction is cast to long so
    both engines agree on the rendered type.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.sum(_rev_cents()).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               n1.n_name AS supp_nation,
               {_REV_DUCK} AS rev_cents
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev_cents
                         ELSE 0 END) AS DOUBLE) / SUM(rev_cents)
               AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped: one supplier nation's market share, by year, of
    STANDARD-part revenue sold into ASIA-region customers.

    Ratio-of-conditional-sums over exact integer cents (one double
    division at the end — bit-identical across engines). nation/region
    broadcast explicitly (bounded); part/supplier/customer are left to
    AQE. The share needs no self-join: a CASE inside the aggregate.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    rev = _rev_cents()
    nation5 = F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(part, part.p_partkey == li.l_partkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((nation5.cast("double") / F.sum(rev)).alias("mkt_share"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_REV_DUCK}) AS DOUBLE)/10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY SUM({_REV_DUCK}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: top-20 customers by returned-item revenue.

    The ORDER BY ... LIMIT compiles to TakeOrderedAndProject (each
    partition keeps its local top-20; the driver merges 20xP rows, not
    the customer set). Sort key is the EXACT cents sum with a custkey
    tiebreak — float formatting can never reorder the result. Returned
    flag filters lineitem at the scan (pushed predicate) before any
    join.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
        .orderBy(F.col("rev_cents").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("rev_cents").cast("double") / 10000.0).alias("revenue"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, SUM({_REV_DUCK}) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_cents AS DOUBLE)/10000.0 AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: the quarter's top revenue supplier(s) via a
    scalar MAX subquery (ties all returned, exactly as the spec demands).

    The revenue CTE aggregates once; the scalar MAX over its 100-ish
    rows broadcasts as a 1-row cross input, so the "subquery" costs one
    extra reduction — never a re-scan of lineitem. Equality is on EXACT
    integer cents: a double-rounded max would silently drop tied
    suppliers.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("total_cents"))
    best = rev.agg(F.max("total_cents").alias("best_cents"))
    return (
        supp.join(rev, supp.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(best), F.col("total_cents") == F.col("best_cents"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents").cast("double") / 10000.0).alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS qty_cents_sum,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS small_qty_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND TRY_CAST(round(l.l_quantity*100) AS BIGINT) * a.n * 5
          < a.qty_cents_sum
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: revenue from lineitems under 20% of their
    part's average quantity (the correlated-AVG subquery, decorrelated
    by hand into a per-part aggregate joined back).

    The avg comparison is INTEGER algebra — ``qty*n*5 < sum`` instead
    of ``qty < 0.2*avg`` — so no float summation order can flip a
    boundary row between engines (max qty_cents*n*5 ~ 5e3*6e5*5 ≈
    1.5e10, far inside bigint). Two shuffles on l_partkey (aggregate +
    join-back, co-partitioned) and a broadcast part-brand filter.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(cents("l_quantity")).alias("qty_cents_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(per_part, F.col("pp_key") == li.l_partkey)
        .filter(
            cents("l_quantity") * F.col("n") * 5 < F.col("qty_cents_sum")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias(
                "small_qty_revenue"
            ),
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT SUM(TRY_CAST(round(c_acctbal*100) AS BIGINT)) AS bal_sum,
               COUNT(*) AS n
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(TRY_CAST(round(c.c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0
               AS totacctbal
    FROM customer c, pos
    WHERE TRY_CAST(round(c.c_acctbal*100) AS BIGINT) * pos.n > pos.bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: above-average-balance customers gone DORMANT
    (no order since 1999 — the synthetic data gives every customer at
    least one lifetime order, so the spec's "never ordered" predicate
    is restated as a recency cutoff; no phone column either, so
    nationkey stands in for the country code).

    NOT EXISTS compiles to a LEFT ANTI join against the date-filtered
    orders (predicate pushed to the scan, one shuffle pair on custkey);
    the global average is the usual 1-row broadcast, compared in exact
    integer cents (``bal*n > sum`` — no float boundary drift). The
    positive-balance average deliberately includes active customers,
    per the original query's intent.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents("c_acctbal")).alias("bal_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        cust.join(F.broadcast(pos))
        .filter(cents("c_acctbal") * F.col("n") > F.col("bal_sum"))
        .join(orders, orders.o_custkey == cust.c_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias(
                "totacctbal"
            ),
        )
    )


@register(
    "rel_scd2_history",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    runs AS (
        SELECT user_id, event_id, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flagged
    ),
    versions AS (
        SELECT user_id, run_id, event_type,
               MIN(event_id) AS valid_from_id,
               COUNT(*) AS n_events
        FROM runs
        GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, event_type, valid_from_id,
           lead(valid_from_id) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_id) AS valid_to_id,
           n_events
    FROM versions
    """,
)
def rel_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    user's consecutive same-state runs into version rows with
    [valid_from, valid_to) id ranges, open-ended for the current
    version — the gaps-and-islands shape every warehouse dim build
    runs.

    Two window passes partitioned by user_id (change-flag + running
    run_id, then lead over the collapsed versions) with ONE exchange:
    the run aggregation and both windows share the user_id hash, so
    Catalyst plans window → agg → window without re-shuffling. Version
    ordering is event_id (generation order) — deterministic in both
    engines, unlike same-µs timestamps. Per-user state is bounded by
    that user's history; a hot user skews a task but never an executor
    (AQE skew split applies to the exchange).
    """
    w = Window.partitionBy("user_id").orderBy("event_id")
    flagged = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("event_id").alias("valid_from_id"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_ver = Window.partitionBy("user_id").orderBy("valid_from_id")
    return versions.select(
        "user_id",
        "event_type",
        "valid_from_id",
        F.lead("valid_from_id").over(w_ver).alias("valid_to_id"),
        "n_events",
    )


@register(
    "rel_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
                   AS qty_cents,
               CAST(SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                   AS price_cents,
               CAST(SUM(TRY_CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)
                   AS disc_cents
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_cents' AS measure, qty_cents AS value_cents
    FROM wide
    UNION ALL
    SELECT l_returnflag, 'price_cents', price_cents FROM wide
    UNION ALL
    SELECT l_returnflag, 'disc_cents', disc_cents FROM wide
    """,
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag measures back to long
    (flag, measure, value) rows — the inverse of ``rel_pivot`` and the
    standard long-format prep for metric stores.

    ``DataFrame.unpivot`` compiles to Expand (each input row emits one
    row per measure inside the same task) — NO shuffle beyond the
    source aggregate, versus the UNION-of-three-projections form which
    would re-read the aggregate three times. Measures stay exact
    integer cents.
    """
    wide = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(cents("l_quantity")).alias("qty_cents"),
            F.sum(cents("l_extendedprice")).alias("price_cents"),
            F.sum(cents("l_discount")).alias("disc_cents"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_cents", "price_cents", "disc_cents"],
        variableColumnName="measure",
        valueColumnName="value_cents",
    )


@register(
    "rel_higher_order_funcs",
    oracle="""
    WITH arrs AS (
        SELECT l_orderkey,
               list_sort(list(TRY_CAST(round(l_quantity*100) AS BIGINT)))
                   AS qtys
        FROM lineitem
        WHERE l_orderkey <= 1000 AND l_quantity IS NOT NULL
          AND NOT isnan(l_quantity) AND NOT isinf(l_quantity)
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INTEGER) AS n_lines,
           CAST(list_aggregate(qtys, 'sum') AS BIGINT) AS qty_sum,
           CAST(list_aggregate(qtys, 'max') AS BIGINT) AS qty_max,
           CAST(len(list_filter(qtys, x -> x % 200 = 0)) AS INTEGER)
               AS n_even_units,
           array_to_string(list_transform(qtys, x -> x // 100), ',')
               AS whole_units
    FROM arrs
    """,
)
def rel_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over per-key collected arrays:
    sort_array / aggregate (fold) / array_max / filter / transform —
    the SQL-lambda surface that keeps per-row array logic JVM-side
    (whole-stage codegen) instead of in a Python UDF.

    One hash aggregate builds the per-order array (bounded by order
    width, never corpus size); every lambda then evaluates per-row
    with zero additional exchanges. The fold keeps bigint cents; the
    per-element division is integer div — nothing float anywhere.
    """
    # l_quantity IS NOT NULL in BOTH engines: Spark's collect_list
    # silently drops nulls while DuckDB's list() keeps them (round-8
    # null-injection finding) — the explicit filter makes the shared
    # semantics visible instead of relying on collect_list's behavior.
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") <= 1000)
        & F.col("l_quantity").isNotNull()
        & ~F.isnan("l_quantity")
        & (F.abs("l_quantity") != F.lit(float("inf")))
    )
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(cents("l_quantity"))).alias("qtys")
    )
    return arrs.select(
        "l_orderkey",
        F.size("qtys").alias("n_lines"),
        F.expr(
            "aggregate(qtys, cast(0 as bigint), (acc, x) -> acc + x)"
        ).alias("qty_sum"),
        F.array_max("qtys").alias("qty_max"),
        F.size(F.expr("filter(qtys, x -> x % 200 = 0)")).alias("n_even_units"),
        F.expr("concat_ws(',', transform(qtys, x -> x div 100))").alias(
            "whole_units"
        ),
    )


# ---------------------------------------------------------------------------
# TPC-H completion: q2 / q9 / q11 / q16 / q20 / q21 shapes
# (the testdata has no partsupp table and no commit/receipt dates —
#  each query keeps its spec shape with documented stand-ins, exactly
#  as q17/q22 above restate their missing columns)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH offers AS (
        SELECT l.l_partkey, l.l_suppkey,
               MIN(TRY_CAST(round(l.l_extendedprice*100) AS BIGINT)) AS offer_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, MIN(offer_cents) AS best_cents
        FROM offers GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           CAST(o.offer_cents AS DOUBLE)/100.0 AS supply_cost
    FROM part p
    JOIN offers o ON o.l_partkey = p.p_partkey
    JOIN best b   ON b.l_partkey = p.p_partkey AND o.offer_cents = b.best_cents
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 10
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped: for each qualifying part, the EU supplier(s)
    offering it at minimum cost (ties kept), top-20 by account balance.

    No partsupp table in this dataset, so the per-(part, supplier)
    supply cost is derived as the minimum observed sale price from
    lineitem — same correlated-MIN-per-part shape as the spec,
    decorrelated into a per-part aggregate joined back on exact integer
    cents equality (a double min would drop tied suppliers). Dimension
    joins (supplier/nation/region, part filter) broadcast; the only
    shuffles are the two partkey aggregates, co-partitioned. The
    ORDER BY carries a full (acctbal, nation, name, partkey) tiebreak
    so the LIMIT boundary is deterministic across engines.
    """
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents("l_extendedprice")).alias("offer_cents"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("bp_key")).agg(
        F.min("offer_cents").alias("best_cents")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("bp_key"))
            & (F.col("offer_cents") == F.col("best_cents")),
        )
        .join(F.broadcast(part), part.p_partkey == F.col("l_partkey"))
        .join(F.broadcast(eu_supp), eu_supp.s_suppkey == F.col("l_suppkey"))
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("offer_cents").cast("double") / 100.0).alias("supply_cost"),
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(SUM({_REV_DUCK}
                    - TRY_CAST(round(p.p_retailprice*100) AS BIGINT)
                      * TRY_CAST(round(l.l_quantity) AS BIGINT) * 100)
                AS DOUBLE)/10000.0 AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped: profit on 'red' product lines by supplier
    nation and order year.

    No partsupp.ps_supplycost here, so cost is the part's retail price
    times quantity (deterministic stand-in with the same join
    topology). Profit is pure bigint algebra in 1e-4-dollar units —
    revenue cents4 minus retail_cents x integer quantity x 100 — so
    partition order can never flip a cent. part/supplier/nation
    broadcast; the single real shuffle pair is lineitem⋈orders on
    orderkey, then the (nation, year) aggregate with map-side partials.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    profit4 = _rev_cents() - (
        cents("p_retailprice")
        * F.round(F.col("l_quantity")).try_cast("long")
        * F.lit(100)
    )
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nation), nation.n_nationkey == supp.s_nationkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(profit4).cast("double") / 10000.0).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH natsupp AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = 1),
    vals AS (
        SELECT l.l_partkey, SUM({_REV_DUCK}) AS value4
        FROM lineitem l JOIN natsupp s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1
    ),
    tot AS (SELECT SUM(value4) AS total4 FROM vals)
    SELECT v.l_partkey AS p_partkey,
           CAST(v.value4 AS DOUBLE)/10000.0 AS value
    FROM vals v, tot
    WHERE v.value4 * 500 > tot.total4
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: parts representing a significant share
    (> 1/500th) of nation 1's suppliers' total traded value.

    partsupp availqty x supplycost becomes summed lineitem revenue for
    the nation's suppliers — the same group-then-compare-to-scalar
    shape. The global total is a 1-row broadcast compared in EXACT
    integer cents4 x 500 (bigint headroom to ~4x10^16 at this schema's
    price scale; at larger SF swap the literal for a DECIMAL(38)
    comparison). One shuffle for the partkey aggregate; the threshold
    join is a broadcast nested loop over ONE row — the correct plan.
    """
    li = table(spark, sf_dir, "lineitem")
    natsupp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 1)
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(natsupp), natsupp.s_suppkey == li.l_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("value4"))
    )
    tot = vals.agg(F.sum("value4").alias("total4"))
    return (
        vals.join(F.broadcast(tot), F.col("value4") * 500 > F.col("total4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value4").cast("double") / 10000.0).alias("value"),
        )
    )


@register(
    "q16_parts_suppliers",
    oracle="""
    WITH rel AS (
        SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_size <= 8
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    )
    SELECT p_brand, p_type, p_size, COUNT(*) AS supplier_cnt
    FROM rel
    GROUP BY 1, 2, 3
    """,
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped: how many distinct suppliers can provide each
    (brand, type, size) combination, excluding flagged suppliers.

    The spec's complaint-comment NOT IN becomes negative-balance
    suppliers (no comment column) — still a NOT IN compiled to a
    broadcast LEFT ANTI join, never a filter-side subquery re-scan.
    The distinct-then-count is one shuffle on the full grouping key;
    countDistinct over the pre-distinct frame is a plain count, so no
    second expansion. Part filter broadcasts.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 8)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    rel = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(bad), bad.s_suppkey == li.l_suppkey, "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return rel.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


@register(
    "q20_potential_promotion",
    oracle="""
    WITH gp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
    shipped AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(TRY_CAST(round(l.l_quantity) AS BIGINT)) AS qty
        FROM lineitem l JOIN gp ON gp.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    part_tot AS (SELECT l_partkey, SUM(qty) AS tot FROM shipped GROUP BY 1),
    big AS (
        SELECT DISTINCT s.l_suppkey
        FROM shipped s JOIN part_tot t ON t.l_partkey = s.l_partkey
        WHERE s.qty * 5 > t.tot
    )
    SELECT s.s_suppkey, s.s_name,
           TRY_CAST(round(s.s_acctbal*100) AS BIGINT) AS acctbal_cents
    FROM supplier s
    JOIN big b ON b.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey < 5
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped: suppliers in nations 0-4 who dominated (>20%)
    the 1996 shipped volume of any 'blue' part.

    The spec's partsupp-availability threshold becomes a share of the
    part's total shipped quantity — the same correlated-threshold
    shape, decorrelated into per-part totals joined back (exact
    integer quantities, co-partitioned on partkey). Supplier
    membership is a LEFT SEMI join — the IN-subquery chain compiled
    the way Catalyst does it, with the (tiny) qualifying-supplier set
    broadcast.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    gp = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    supp = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    shipped = (
        li.join(F.broadcast(gp), gp.p_partkey == li.l_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).try_cast("long")).alias("qty"))
    )
    part_tot = shipped.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("qty").alias("tot")
    )
    big = (
        shipped.join(part_tot, F.col("l_partkey") == F.col("pt_key"))
        .filter(F.col("qty") * 5 > F.col("tot"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(big), big.l_suppkey == supp.s_suppkey, "left_semi"
        )
        .select(
            "s_suppkey",
            "s_name",
            cents("s_acctbal").alias("acctbal_cents"),
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH forders AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
    l1 AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN forders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped: suppliers SOLELY at fault on finalized
    multi-supplier orders — EXISTS another supplier on the order, NOT
    EXISTS another supplier who also failed.

    No receipt/commit dates in this dataset, so "failed the order"
    is the returned flag ('R') — the exists/not-exists topology is the
    point and survives intact: the EXISTS compiles to a LEFT SEMI and
    the NOT EXISTS to a LEFT ANTI join against the lineitem scan, both
    shuffling on orderkey only (the inequality on suppkey rides along
    as a join residual, never a nested loop). Supplier names broadcast;
    top-10 with a name tiebreak compiles to TakeOrderedAndProject.
    """
    li = table(spark, sf_dir, "lineitem")
    fo = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = table(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(fo, fo.o_orderkey == li.l_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    others_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(
            others,
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            others_r,
            (F.col("ok3") == F.col("l_orderkey"))
            & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), supp.s_suppkey == waiting.l_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "rel_corr_stats",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)) AS sx,
               SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
               SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)
                   * TRY_CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy,
               SUM(TRY_CAST(round(l_quantity*100) AS BIGINT)
                   * TRY_CAST(round(l_quantity*100) AS BIGINT)) AS sxx,
               SUM(TRY_CAST(round(l_extendedprice*100) AS BIGINT)
                   * TRY_CAST(round(l_extendedprice*100) AS BIGINT)) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
           / nullif(sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                    * sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy), 0)
               AS qty_price_corr
    FROM s
    """,
)
def rel_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Pearson correlation with DETERMINISTIC float output.

    The built-in ``corr`` aggregate accumulates doubles in partition
    order, so two runs (or two engines) can disagree in the last bits —
    un-hashable. This plan instead reduces the five EXACT integer
    moment sums (n, Σx, Σy, Σxy, Σx², Σy² in cents — associative bigint
    adds, map-side combinable) and evaluates the closed form once in
    double: identical operands, identical IEEE-754 ops, bit-identical
    result on any cluster size. Overflow headroom: cents products are
    ≲1e11 and row counts ≲1e7 per group at bench scale stay under 2^63;
    at larger scale the sums switch to DECIMAL(38,0) unchanged in shape.
    One shuffle on the group key.
    """
    li = table(spark, sf_dir, "lineitem")
    x = cents("l_quantity")
    y = cents("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    # try_divide, with nullif(denominator, 0) in the oracle: an n=1 (or
    # constant-valued) group has zero variance, so the closed form hits
    # 0/0 — ANSI Spark would throw DIVIDE_BY_ZERO (the one-row hostile
    # sweep caught exactly that) and correlation is undefined anyway.
    # Both engines emit NULL for such groups.
    return s.select(
        "l_returnflag",
        "n",
        F.try_divide(
            nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"),
            F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            * F.sqrt(nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")),
        ).alias("qty_price_corr"),
    )


@register(
    "rel_window_range_time",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(TRY_CAST(round(value*100) AS BIGINT)) OVER w AS DOUBLE)/100.0
               AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def rel_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based rolling window: each event's count/sum over the user's
    trailing hour — a RANGE frame over epoch seconds, not a ROWS frame.

    The distinction matters for correctness AND determinism: a ROWS
    frame over irregular event times is data-cadence-dependent, while a
    RANGE frame's membership is a pure function of the timestamp
    VALUES — peer rows (equal ts) always share a frame, so no ordering
    tiebreak can change the result. This is the rolling-feature shape
    feature stores actually need ("activity in the last hour"), exact
    in integer cents. One shuffle on user_id; frame input bounded by
    per-user activity within the hour.
    """
    events = table(spark, sf_dir, "events")
    # NTZ-safe epoch: TIMESTAMP_NTZ refuses a direct bigint cast; the
    # LTZ hop is value-preserving under the pinned-UTC session (same
    # normalization contract as streaming/source.py). The long cast
    # TRUNCATES to the containing second — the oracle must floor() its
    # epoch() double before the bigint cast (a bare CAST rounds
    # half-up, flipping frame membership for events that straddle the
    # 3600 s boundary by under half a second; surfaced by the full
    # sf0.1 sweep, where ~half the rows carry >=0.5 s fractions).
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-3600, 0)
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (F.sum(cents("value")).over(w).cast("double") / 100.0).alias(
            "value_last_hour"
        ),
    )


# ---------------------------------------------------------------------------
# RFM segmentation + calendar dimension generation
# ---------------------------------------------------------------------------

RFM_RECENT_DAYS = (365, 1095)     # <=1y -> 3, <=3y -> 2, else 1
RFM_FREQ = (13, 8)                # >=13 orders -> 3, >=8 -> 2, else 1
RFM_MONETARY_CENTS = (200_000_00, 100_000_00)  # >= $200k -> 3, >= $100k -> 2


@register(
    "rel_rfm_segmentation",
    oracle=f"""
    WITH ref AS (SELECT max(o_orderdate) AS refd FROM orders),
    base AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate), (SELECT refd FROM ref))
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           frequency,
           CAST(monetary_cents AS DOUBLE) / 100.0 AS monetary,
           CASE WHEN recency_days <= {RFM_RECENT_DAYS[0]} THEN 3
                WHEN recency_days <= {RFM_RECENT_DAYS[1]} THEN 2
                ELSE 1 END AS r_score,
           CASE WHEN frequency >= {RFM_FREQ[0]} THEN 3
                WHEN frequency >= {RFM_FREQ[1]} THEN 2
                ELSE 1 END AS f_score,
           CASE WHEN monetary_cents >= {RFM_MONETARY_CENTS[0]} THEN 3
                WHEN monetary_cents >= {RFM_MONETARY_CENTS[1]} THEN 2
                ELSE 1 END AS m_score
    FROM base
    """,
)
def rel_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing-analytics scoring: days since last order, order
    count, lifetime spend, each banded 1–3 by fixed business
    thresholds. Fixed thresholds (not ntile) keep scores meaningful
    across reruns and data growth AND keep the plan window-free: one
    map-side-combinable aggregate per customer plus a broadcast scalar
    reference date; banding is per-row CASE arithmetic. Recency
    differences are integer days on µs-identical timestamps; spend
    accumulates integer cents.
    """
    orders = table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("refd"))
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents("o_totalprice")).alias("monetary_cents"),
    )
    rec = F.datediff(F.col("refd"), F.col("last_order"))
    return (
        base.crossJoin(F.broadcast(ref))
        .select(
            F.col("o_custkey").alias("custkey"),
            rec.cast("bigint").alias("recency_days"),
            "frequency",
            (F.col("monetary_cents").cast("double") / 100.0).alias("monetary"),
            F.when(rec <= RFM_RECENT_DAYS[0], 3)
            .when(rec <= RFM_RECENT_DAYS[1], 2)
            .otherwise(1)
            .alias("r_score"),
            F.when(F.col("frequency") >= RFM_FREQ[0], 3)
            .when(F.col("frequency") >= RFM_FREQ[1], 2)
            .otherwise(1)
            .alias("f_score"),
            F.when(F.col("monetary_cents") >= RFM_MONETARY_CENTS[0], 3)
            .when(F.col("monetary_cents") >= RFM_MONETARY_CENTS[1], 2)
            .otherwise(1)
            .alias("m_score"),
        )
    )


@register(
    "rel_calendar_spine",
    oracle="""
    WITH b AS (
        SELECT min(o_orderdate) AS d0, max(o_orderdate) AS d1 FROM orders
        WHERE o_orderdate >= TIMESTAMP '1990-01-01'
          AND o_orderdate <= (now() AT TIME ZONE 'UTC')
    ),
    days AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM b
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(isodow(d) AS BIGINT) AS iso_dow,
           CAST(weekofyear(d) AS BIGINT) AS iso_week,
           CAST(month(d) AS BIGINT) AS month,
           CAST(quarter(d) AS BIGINT) AS quarter,
           CAST(year(d) AS BIGINT) AS year,
           isodow(d) >= 6 AS is_weekend,
           d = date_trunc('month', d) AS is_month_start,
           d = last_day(d)::TIMESTAMP AS is_month_end
    FROM days
    """,
)
def rel_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generation: one row per day spanning the fact
    table's date domain, with the derived attributes (ISO day-of-week
    and week, month/quarter/year, weekend and month-boundary flags)
    every warehouse join needs. Generated IN-PLAN from the fact table's
    min/max (``sequence`` + explode over a single aggregated row) — no
    hand-maintained CSV, and the spine tracks the data automatically.
    Output is |days| rows regardless of fact volume; the bounds
    aggregate is map-side combinable. The epoch gate matters here more
    than anywhere: the spine's SIZE is min/max-driven, so one
    epoch-zero sentinel or far-future garbage date would stretch the
    calendar to centuries (see ``timeseries.TS_EPOCH_LO``).
    """
    from spark_etl_pipeline_spark.operators.timeseries import epoch_gated

    orders = epoch_gated(table(spark, sf_dir, "orders"), "o_orderdate")
    days = (
        orders.agg(
            F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
        )
        .select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"))
    )
    iso_dow = F.expr("weekday(d) + 1")
    return days.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        iso_dow.cast("bigint").alias("iso_dow"),
        F.weekofyear("d").cast("bigint").alias("iso_week"),
        F.month("d").cast("bigint").alias("month"),
        F.quarter("d").cast("bigint").alias("quarter"),
        F.year("d").cast("bigint").alias("year"),
        (iso_dow >= 6).alias("is_weekend"),
        (F.col("d") == F.date_trunc("month", F.col("d"))).alias("is_month_start"),
        (F.col("d") == F.expr("cast(last_day(d) as timestamp)")).alias(
            "is_month_end"
        ),
    )


# ---------------------------------------------------------------------------
# Market-basket association rules (support / lift over co-ordered parts)
# ---------------------------------------------------------------------------

BASKET_MIN_PAIR = 3  # minimum co-occurrence count for a candidate rule
BASKET_TOP_K = 20


_BASKET_ORACLE = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    tot AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
    item AS (SELECT pk, COUNT(*) AS n_item FROM op GROUP BY pk),
    pair AS (
        SELECT x.pk AS part_a, y.pk AS part_b, COUNT(*) AS n_pair
        FROM op x JOIN op y ON y.ok = x.ok AND y.pk > x.pk
        GROUP BY 1, 2
        HAVING COUNT(*) >= {BASKET_MIN_PAIR}
    )
    SELECT p.part_a, p.part_b, p.n_pair,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST(p.n_pair AS DOUBLE) / t.n_orders AS support,
           CAST(p.n_pair * t.n_orders AS DOUBLE)
               / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
    FROM pair p
    JOIN item ia ON ia.pk = p.part_a
    JOIN item ib ON ib.pk = p.part_b
    CROSS JOIN tot t
    ORDER BY lift DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """


@register("rel_basket_rules", oracle=_BASKET_ORACLE)
def rel_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: top-{BASKET_TOP_K} part pairs by LIFT
    (co-occurrence enrichment over independence) with a minimum
    co-occurrence support — the recommendation/assortment primitive.

    Exactness across engines: support and lift are single IEEE
    divisions whose operands are exact integer products
    (n_pair·n_orders and n_a·n_b fit bigint at any realistic scale),
    so the ranking is bit-deterministic; ties break on the part ids.

    Scale: pair generation self-joins the per-order part list
    CO-PARTITIONED on l_orderkey (candidates bounded by order size²,
    ~7² in TPC-H — never a catalog cross product); the HAVING
    threshold prunes the pair table before the item-count joins
    (node-scale sides, AQE-broadcastable); the single-row order total
    broadcasts; the final ranking compiles to TakeOrderedAndProject.
    """
    from spark_etl_pipeline_spark.operators.graph import copurchase_items

    # one materialization feeds all four consumers (pair self-join x2,
    # item counts, order total) — otherwise four lineitem scans
    op = copurchase_items(spark, sf_dir)
    tot = op.agg(F.countDistinct("ok").alias("n_orders"))
    item = op.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
    pair = (
        op.alias("x")
        .join(
            op.alias("y"),
            (F.col("y.ok") == F.col("x.ok")) & (F.col("y.pk") > F.col("x.pk")),
        )
        .groupBy(F.col("x.pk").alias("part_a"), F.col("y.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= BASKET_MIN_PAIR)
    )
    ia = item.select(F.col("pk").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            (F.col("n_pair").cast("double") / F.col("n_orders")).alias("support"),
            (
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )


# ---------------------------------------------------------------------------
# Pareto / revenue-concentration curve
# ---------------------------------------------------------------------------


@register(
    "rel_pareto_customers",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
                   COUNT(*) AS n_cust FROM rev),
    ranked AS (
        SELECT o_custkey, cents,
               row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk,
               CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT r.rnk, r.o_custkey,
           CAST(r.cents AS DOUBLE) / 100.0 AS revenue,
           CAST(r.cum_cents AS DOUBLE) / t.total_cents AS cum_share,
           CAST(r.rnk AS DOUBLE) / t.n_cust AS cust_share
    FROM ranked r CROSS JOIN tot t
    WHERE r.rnk <= 25
    ORDER BY r.rnk
    """,
)
def rel_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: customers ranked by total
    spend with cumulative revenue share and cumulative customer share —
    the "what fraction of customers drives 80% of revenue" table.

    Exactness: per-customer revenue and the running total are integer
    cents (associative), shares are single IEEE divisions against the
    broadcast single-row totals. The ranking window is GLOBAL — the
    honest cost of an exact cumulative distribution — but it sorts the
    CUSTOMER-level aggregate (|customers| rows, not |orders|), and only
    the top-25 rows survive. At 100 TB with billions of customers,
    compute the same curve banded: repartitionByRange on revenue, per-
    partition partial sums, then a driver-size prefix-sum of partition
    totals — the two-phase distributed cumsum (documented here, not
    needed at this row count).
    """
    orders = table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("try_cast(round(o_totalprice * 100) as bigint)")).alias("cents")
    )
    tot = rev.agg(
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    w = Window.orderBy(F.col("cents").desc(), "o_custkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = rev.select(
        "o_custkey",
        "cents",
        F.row_number().over(w).alias("rnk"),
        F.sum("cents").over(wrun).cast("bigint").alias("cum_cents"),
    ).filter(F.col("rnk") <= 25)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "o_custkey",
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
            (F.col("cum_cents").cast("double") / F.col("total_cents")).alias(
                "cum_share"
            ),
            (F.col("rnk").cast("double") / F.col("n_cust")).alias("cust_share"),
        )
        .orderBy("rnk")
    )


@register(
    "rel_gini_revenue",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS i
        FROM rev
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS total,
               CAST(SUM(i * cents) AS BIGINT) AS weighted
        FROM ranked
    )
    SELECT n,
           CAST(total AS DOUBLE) / 100.0 AS total_revenue,
           CAST(2 * weighted - (n + 1) * total AS DOUBLE)
               / (n * CAST(total AS DOUBLE)) AS gini
    FROM s
    """,
)
def rel_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the single-number
    inequality complement to the Pareto curve
    (:func:`rel_pareto_customers`): 0 = every customer spends alike,
    →1 = one whale carries the book.

    Exact-rank formula G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x) over
    integer cents: both Σ terms are exact bigints (associative, any
    partitioning), and the NUMERATOR is also folded in exact bigint
    arithmetic before the single double conversion — 2·Σi·x and
    (n+1)·Σx are nearly equal and can exceed 2^53, so a double-domain
    subtraction loses the cancelled low bits (observed: a 1-ulp
    engine split at sf0.1, where DuckDB's DECIMAL literal `2.0` made
    ITS numerator exact while the double path was not). One bigint
    subtraction (|2w| < 2^57 ≪ 2^63 at any realistic scale) keeps the
    statistic bit-identical cross-engine AND more accurate; ties
    broken by customer key. The rank window sorts the customer-level
    aggregate (same honest global-sort cost and same banded-cumsum
    scale-out note as the Pareto curve).
    """
    orders = table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("try_cast(round(o_totalprice * 100) as bigint)")).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = rev.select("cents", F.row_number().over(w).alias("i"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("weighted"),
    )
    return s.select(
        "n",
        (F.col("total").cast("double") / 100.0).alias("total_revenue"),
        (
            (
                F.lit(2) * F.col("weighted")
                - (F.col("n") + F.lit(1)) * F.col("total")
            ).cast("double")
            / (F.col("n") * F.col("total").cast("double"))
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Native recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------


@register(
    "rel_recursive_month_spine",
    oracle="""
    WITH RECURSIVE spine AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS m,
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1990-01-01'
          AND o_orderdate <= (now() AT TIME ZONE 'UTC')
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx FROM spine WHERE m < mx
    ),
    monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS n_orders,
               SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1990-01-01'
          AND o_orderdate <= (now() AT TIME ZONE 'UTC')
        GROUP BY 1
    )
    SELECT strftime(s.m, '%Y-%m') AS month,
           CAST(COALESCE(mo.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(mo.cents, 0) AS DOUBLE) / 100.0 AS revenue,
           CAST(SUM(COALESCE(mo.cents, 0))
                    OVER (ORDER BY s.m) AS DOUBLE) / 100.0
               AS cumulative_revenue
    FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
    """,
)
def rel_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly revenue on a NATIVELY RECURSIVE month spine
    (Spark 4 ``WITH RECURSIVE``): the anchor row carries (first month,
    last month), each recursion step advances one month until the
    bound — so empty months appear as genuine zero rows and the running
    total is continuous. Same business answer as the
    ``sequence()``-generated ``rel_calendar_spine``, deliberately built
    through the OTHER front door: the recursive-CTE engine surface the
    reference era (Spark 2.4) lacked, exercised end to end against
    DuckDB's recursive CTE.

    Scale: recursion depth = number of months. The r11 DST-instant
    sweep falsified the r7 assumption that Spark's default 100-level
    recursion cap is "fine for any sane calendar span": the epoch gate
    admits [1990, now], and a corpus whose GATED dates legitimately
    span >8.3 years (one 2021 cell in a 1992-1998 corpus — or simply
    a decade of real orders, routine at 100 TB) exceeds 100 months
    and threw RECURSION_LEVEL_LIMIT_EXCEEDED. The spine now declares
    ``MAX RECURSION LEVEL 2400``: depth stays epoch-bounded at
    months(1990, now) ≈ 440 by the gate, so the 2400 bound (two
    centuries) never trips on gated data while still stopping a
    runaway if the gate is ever bypassed. Pinned by
    ``tests/test_hostile_inputs.py`` (in-gate decade-span instant).
    That is also why the EPOCH GATE here is a crash guard, not just
    hygiene: one pre-1990 garbage date would otherwise stretch the
    month count without bound (r7 hostile-timestamps finding).
    The spine is rows-per-month tiny; monthly revenue is one map-side-
    combinable cents aggregate; the join is spine-sized and the
    cumulative window orders months only.
    """
    from spark_etl_pipeline_spark.operators.timeseries import epoch_gated

    gated = epoch_gated(table(spark, sf_dir, "orders"), "o_orderdate")
    return spark.sql(
        """
        WITH RECURSIVE spine MAX RECURSION LEVEL 2400 AS (
            SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS m,
                   CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
            FROM {orders}
            UNION ALL
            SELECT add_months(m, 1), mx FROM spine WHERE m < mx
        ),
        monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   COUNT(*) AS n_orders,
                   SUM(TRY_CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM {orders} GROUP BY 1
        )
        SELECT date_format(s.m, 'yyyy-MM') AS month,
               CAST(COALESCE(mo.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(mo.cents, 0) AS DOUBLE) / 100.0 AS revenue,
               CAST(SUM(COALESCE(mo.cents, 0))
                        OVER (ORDER BY s.m) AS DOUBLE) / 100.0
                   AS cumulative_revenue
        FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
        """,
        orders=gated,
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 open variant type)
# ---------------------------------------------------------------------------


@register(
    "rel_variant_props",
    oracle=r"""
    WITH x AS (
        -- try-semantics twin of the engine's
        -- try_cast(try_variant_get(try_parse_json(props)) as int):
        -- malformed JSON (json_valid guard — DuckDB json_extract
        -- ERRORS on it), wrong-typed/array/huge values, and
        -- out-of-int32 ints all become NULL instead of poisoning the
        -- aggregate. The json_type guard matters because DuckDB's
        -- string->int TRY_CAST COERCES non-integral numeric strings
        -- ('3.5' -> 4 by rounding, '1e3' -> 1000) where Spark's
        -- try_cast rejects both, so the VARCHAR arm is further
        -- restricted to INTEGER-SHAPED strings: optional sign, digits,
        -- padded by [\x00-\x20\x7f] — the EXACT class Spark's cast
        -- strips, derived by exhaustive codepoint probe (r14, ADVICE
        -- r13: every ASCII control char incl. \x1f/\x7f is stripped;
        -- NEL U+0085, APC U+009F, NBSP and the Unicode space family
        -- are NOT — both engines yield NULL there, so the class above
        -- is the whole divergence surface). DuckDB's own TRY_CAST
        -- strips only [\x09-\x0d\x20], so the pads are regexp-stripped
        -- before the cast. k is a 32-bit counter by contract, so the
        -- integer SUM cannot overflow. (props-edge fuzz corpus.)
        SELECT event_type,
               TRY_CAST(CASE WHEN json_valid(props)
                              AND (json_type(props, '$.k')
                                       IN ('BIGINT', 'UBIGINT')
                                   OR (json_type(props, '$.k') = 'VARCHAR'
                                       AND regexp_matches(
                                           json_extract_string(props, '$.k'),
                                           '^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$')))
                             THEN regexp_replace(
                                      json_extract_string(props, '$.k'),
                                      '^[\x00-\x20\x7f]+|[\x00-\x20\x7f]+$',
                                      '', 'g')
                        END AS INTEGER) AS k
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM x
    GROUP BY event_type
    """,
)
def rel_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property aggregation through Spark 4's VARIANT
    type: ``parse_json`` once into the binary variant encoding, then
    typed ``variant_get`` extraction — the schema-on-read path for
    payloads whose shape isn't known at write time, superseding the
    string-re-parse-per-access ``get_json_object`` pattern the
    reference pipeline used (reference `jobs/etl_jobs.py:61-67`'s
    json_tuple cascade). Shredding happens ONCE per row at scan time;
    every downstream access is a binary field lookup, not a JSON parse.

    The oracle reaches the same numbers through DuckDB's JSON
    extraction, pinning that the variant path is semantically plain
    JSON access. One map-side-combinable aggregate; the variant column
    never shuffles (extraction projects it away before the exchange).
    """
    ev = table(spark, sf_dir, "events")
    # TRY at every layer: try_parse_json (malformed payload → NULL
    # variant, where parse_json FAILFAST kills the whole query on ONE
    # bad row — props-edge fuzz corpus), extraction as string, then
    # try_cast to the contract's 32-bit counter type (floats, quoted
    # non-numerics, arrays, out-of-range ints → NULL). One damaged
    # payload in 10^12 rows must cost one NULL, not the job.
    return (
        ev.select(
            "event_type",
            F.expr(
                "try_cast(try_variant_get(try_parse_json(props), "
                "'$.k', 'string') as int)"
            ).alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL top-N (per-group top-k via lateral subquery)
# ---------------------------------------------------------------------------


@register(
    "rel_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, t.revenue
    FROM nation n,
    LATERAL (
        SELECT c.c_name,
               CAST(SUM(TRY_CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue,
               c.c_custkey
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_nationkey = n.n_nationkey
        GROUP BY c.c_name, c.c_custkey
        ORDER BY SUM(TRY_CAST(round(o.o_totalprice * 100) AS BIGINT)) DESC,
                 c.c_custkey
        LIMIT 2
    ) t
    """,
)
def rel_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 revenue customers PER NATION through a correlated LATERAL
    subquery — the SQL front door for per-group top-k (the DataFrame
    twin is a rank window, e.g. ``docs_cap_per_source``). Registered
    because LATERAL is the form analysts write and the decorrelation
    is Catalyst's job: the optimizer rewrites the correlated aggregate
    + LIMIT into a join + per-key ranking, so the executed plan never
    re-runs the subquery per outer row (nation count × customer scan
    would be the naive cost). Exact-cents revenue, c_custkey tiebreak —
    deterministic top-2 on both engines.
    """
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.revenue
        FROM {nation} n,
        LATERAL (
            SELECT c.c_name,
                   CAST(SUM(TRY_CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS revenue,
                   c.c_custkey
            FROM {customer} c
            JOIN {orders} o ON o.o_custkey = c.c_custkey
            WHERE c.c_nationkey = n.n_nationkey
            GROUP BY c.c_name, c.c_custkey
            ORDER BY SUM(TRY_CAST(round(o.o_totalprice * 100) AS BIGINT)) DESC,
                     c.c_custkey
            LIMIT 2
        ) t
        """,
        nation=table(spark, sf_dir, "nation"),
        customer=table(spark, sf_dir, "customer"),
        orders=table(spark, sf_dir, "orders"),
    )


# ---------------------------------------------------------------------------
# LIKE / string-predicate pushdown
# ---------------------------------------------------------------------------


@register(
    "rel_like_filter",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(TRY_CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_retail
    FROM part
    WHERE p_name LIKE '%widget%' AND p_type LIKE 'ECO%'
    GROUP BY p_brand
    """,
)
def rel_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-pattern filtering: contains (``LIKE '%widget%'``) and
    prefix (``LIKE 'ECO%'``) predicates — the filter family the
    relational surface was missing an explicit row for. Both compile
    to data-source-pushable filters (``StringContains`` /
    ``StringStartsWith`` in the parquet scan's PushedFilters, gated in
    ``tests/test_plan_quality.py``), so at 100 TB non-matching row
    groups are skipped by footer statistics before any decompression.
    One map-side-combinable cents aggregate after the scan.
    """
    part = table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").contains("widget")
            & F.col("p_type").startswith("ECO")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.expr("try_cast(round(p_retailprice * 100) as bigint)"))
                .cast("double")
                / 100.0
            ).alias("total_retail"),
        )
    )


# ---------------------------------------------------------------------------
# Fulfillment lead time (date-difference distribution)
# ---------------------------------------------------------------------------


@register(
    "rel_ship_lag",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(datediff('day', o.o_orderdate, l.l_shipdate)) AS DOUBLE)
               / COUNT(*) AS avg_lag_days,
           quantile_cont(CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                              AS DOUBLE), 0.5) AS p50_lag_days,
           quantile_cont(CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                              AS DOUBLE), 0.9) AS p90_lag_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def rel_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship fulfillment lead time per order priority: count,
    exact mean, and exact interpolated p50/p90 of the day lag — the
    SLA distribution an operations team tracks (does URGENT actually
    ship faster, and what does the tail look like?).

    Day differences are exact integers (DATEDIFF on date-truncated
    timestamps); the mean is one integer-sum division and the
    percentiles ride the verified ``percentile``/``quantile_cont``
    pairing (``rel_percentiles``). One orderkey-co-partitioned join —
    at 100 TB both fact tables shuffle on the same key, or none at all
    when bucketed by orderkey (``sources.write_bucketed``). The exact
    ``percentile`` buffers each of the 5 priority groups' lags in one
    aggregator — at full scale swap for ``approx_percentile``
    (t-digest, bounded memory) as ``events_mad_outliers`` documents.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag"
        ),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("lag").cast("double") / F.count(F.lit(1))).alias(
            "avg_lag_days"
        ),
        F.expr("percentile(cast(lag as double), 0.5)").alias("p50_lag_days"),
        F.expr("percentile(cast(lag as double), 0.9)").alias("p90_lag_days"),
    )


# ---------------------------------------------------------------------------
# Market concentration (Herfindahl–Hirschman index)
# ---------------------------------------------------------------------------


@register(
    "rel_supplier_hhi",
    oracle="""
    WITH rev AS (
        SELECT p.p_type, l.l_suppkey,
               SUM(TRY_CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_type, l.l_suppkey
    ),
    tot AS (SELECT p_type, SUM(cents) AS total FROM rev GROUP BY p_type)
    SELECT r.p_type,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(TRY_CAST(round(
               power(CAST(r.cents AS DOUBLE) / CAST(t.total AS DOUBLE), 2)
               * 1000000) AS BIGINT)) AS BIGINT) AS hhi_micro
    FROM rev r JOIN tot t ON t.p_type = r.p_type
    GROUP BY r.p_type
    """,
)
def rel_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-market concentration per part type: the
    Herfindahl–Hirschman index (Σ revenue-share², micro-units) — the
    antitrust/procurement-risk metric distinguishing a competitive
    supply base (HHI→0) from a captive one (HHI→1). Complements the
    Gini/Pareto concentration family with the economist's squared-share
    form.

    Exact integer revenue cells (one co-partitioned join + aggregate,
    map-side combinable); per-type totals join back (|types|-sized,
    broadcast); each share² rounds to micro-units BEFORE the final
    associative integer sum — the ``rel_corr_stats`` discipline.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = (
        li.join(p, p["p_partkey"] == li["l_partkey"])
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(cents("l_extendedprice")).alias("cents"))
    )
    tot = rev.groupBy("p_type").agg(F.sum("cents").alias("total"))
    return (
        rev.join(F.broadcast(tot), "p_type")
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum(
                F.expr(
                    "try_cast(round(power(cast(cents as double) "
                    "/ cast(total as double), 2) * 1000000) as bigint)"
                )
            )
            .cast("bigint")
            .alias("hhi_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Open-order backlog over time (sweep-line interval counting)
# ---------------------------------------------------------------------------


@register(
    "rel_order_backlog",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS placed,
               MAX(CAST(l.l_shipdate AS DATE)) AS done
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ),
    deltas AS (
        SELECT placed AS day, 1 AS d FROM spans
        UNION ALL
        SELECT done, -1 FROM spans
    ),
    daily AS (
        SELECT day, SUM(d) AS net FROM deltas GROUP BY day
    )
    SELECT strftime(day, '%Y-%m') AS month,
           CAST(MAX(run) AS BIGINT) AS peak_backlog,
           CAST(MIN(run) AS BIGINT) AS min_backlog
    FROM (
        SELECT day, SUM(net) OVER (ORDER BY day) AS run FROM daily
    )
    GROUP BY strftime(day, '%Y-%m')
    """,
)
def rel_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by SWEEP-LINE interval counting:
    each order contributes +1 at placement and −1 at completion (its
    last line's ship date); the running sum of the day-grain deltas IS
    the number of simultaneously-open orders — reported as monthly
    peak/min, the capacity-planning curve.

    The sweep-line rewrite is the scale story: counting "orders open
    on day D" directly is an interval-stabbing range join (|days| ×
    |orders| candidate pairs); the delta encoding needs one
    completion aggregate (orderkey-co-partitioned), one day-grain
    hash aggregate of ±1s, and one running-sum window over |days|
    rows. An order whose last line ships the day it was placed
    contributes +1 and −1 to the same day-grain cell — net zero, as
    it should be.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("placed"))
        .agg(F.max(F.to_date("l_shipdate")).alias("done"))
    )
    deltas = spans.select(
        F.col("placed").alias("day"), F.lit(1).alias("d")
    ).unionByName(spans.select(F.col("done").alias("day"), F.lit(-1).alias("d")))
    daily = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    run = daily.select(
        "day",
        F.sum("net").over(Window.orderBy("day")).alias("run"),
    )
    return run.groupBy(F.date_format("day", "yyyy-MM").alias("month")).agg(
        F.max("run").cast("bigint").alias("peak_backlog"),
        F.min("run").cast("bigint").alias("min_backlog"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen (fraud / data-fabrication audit)
# ---------------------------------------------------------------------------

#: log10(1 + 1/d), materialized as shared shortest-roundtrip literals so
#: both engines parse the IDENTICAL doubles (no runtime log10 — libm-free).
_BENFORD = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN CAST({v} AS DOUBLE)" for d, v in _BENFORD.items()
) + " END"


@register(
    "rel_benford_deviation",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(TRY_CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
        FROM orders WHERE o_totalprice > 0
    ),
    counts AS (
        SELECT first_digit, COUNT(*) AS n FROM digits GROUP BY first_digit
    ),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT first_digit,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           TRY_CAST(round(abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                          - {_BENFORD_CASE}) * 1000000) AS BIGINT)
               AS deviation_micro
    FROM counts CROSS JOIN tot
    """,
)
def rel_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed
    first-significant-digit shares vs the log10(1+1/d) expectation —
    the standard forensic-accounting test (fabricated or
    systematically-manipulated amounts drift from Benford; organic
    transaction amounts follow it). Deviation is reported per digit in
    micro-units; an auditor thresholds the large ones.

    The nine Benford expectations are SHARED shortest-roundtrip double
    LITERALS (no runtime log10 — float rendering is injective, so both
    engines parse bit-identical constants and no libm enters the
    plan). First digit comes from the exact integer-cents decimal
    rendering — no float log/pow tricks; one map-side-combinable
    digit histogram + a 9-row broadcast total.
    """
    o = table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.expr(
            "cast(substr(cast(try_cast(round(o_totalprice * 100) as bigint) "
            "as string), 1, 1) as int)"
        ).alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
            F.expr(
                f"try_cast(round(abs(cast(n as double) / cast(total as double) "
                f"- {_BENFORD_CASE}) * 1000000) as bigint)"
            ).alias("deviation_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment
# ---------------------------------------------------------------------------

ALLOC_UNITS = 1_000_000


@register(
    "rel_budget_allocation",
    oracle=f"""
    WITH rev AS (
        SELECT n.n_name,
               SUM(TRY_CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    ),
    tot AS (SELECT SUM(cents) AS total FROM rev),
    quota AS (
        SELECT r.n_name, r.cents,
               (r.cents * {ALLOC_UNITS}) // t.total AS floor_units,
               (r.cents * {ALLOC_UNITS}) % t.total AS remainder
        FROM rev r CROSS JOIN tot t
    ),
    shortfall AS (
        SELECT {ALLOC_UNITS} - SUM(floor_units) AS extra FROM quota
    ),
    ranked AS (
        SELECT q.*, s.extra,
               row_number() OVER (ORDER BY q.remainder DESC, q.n_name)
                   AS rnk
        FROM quota q CROSS JOIN shortfall s
    )
    SELECT n_name,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(floor_units + CASE WHEN rnk <= extra THEN 1 ELSE 0 END
                AS BIGINT) AS units
    FROM ranked
    """,
)
def rel_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split exactly
    {ALLOC_UNITS} budget units across nations proportional to their
    exact-cents order revenue — floor the integer quotas, then hand
    the leftover units to the largest remainders. The defining
    guarantee is SUM PRESERVATION: the units column totals exactly
    {ALLOC_UNITS}, which naive per-row ``round(share · units)`` does
    not (off-by-a-few errors that finance reconciliation rejects).

    Everything is integer arithmetic on exact cents (products ≲1e17 —
    within bigint), so quotas, remainders, and the remainder ranking
    are bit-identical cross-engine; ties break on the name. The rank
    window orders |nations| rows — constant-bounded after one
    fact-table aggregate; both scalar totals broadcast.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rev = (
        o.join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(cents("o_totalprice")).alias("cents"))
    )
    tot = rev.agg(F.sum("cents").alias("total"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "cents",
        F.expr(f"(cents * {ALLOC_UNITS}) div total").alias("floor_units"),
        F.expr(f"(cents * {ALLOC_UNITS}) % total").alias("remainder"),
    )
    shortfall = quota.agg(
        (F.lit(ALLOC_UNITS) - F.sum("floor_units")).alias("extra")
    )
    w = Window.orderBy(F.col("remainder").desc(), "n_name")
    ranked = quota.crossJoin(F.broadcast(shortfall)).withColumn(
        "rnk", F.row_number().over(w)
    )
    return ranked.select(
        "n_name",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (
            F.col("floor_units")
            + F.when(F.col("rnk") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("units"),
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation (migration / backfill diff)
# ---------------------------------------------------------------------------


@register(
    "rel_snapshot_reconcile",
    oracle="""
    WITH a AS (
        SELECT l_orderkey, l_linenumber,
               TRY_CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM lineitem WHERE l_orderkey % 97 != 0
    ),
    b AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_orderkey % 89 = 0
                    THEN TRY_CAST(round(l_extendedprice * 100) AS BIGINT) + 1
                    ELSE TRY_CAST(round(l_extendedprice * 100) AS BIGINT) END
                   AS price_cents
        FROM lineitem
    )
    SELECT CAST(SUM(CASE WHEN a.l_orderkey IS NOT NULL
                          AND b.l_orderkey IS NOT NULL
                          AND a.price_cents = b.price_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           CAST(SUM(CASE WHEN a.l_orderkey IS NOT NULL
                          AND b.l_orderkey IS NOT NULL
                          AND a.price_cents != b.price_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN a.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN b.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM a FULL OUTER JOIN b
      ON b.l_orderkey = a.l_orderkey AND b.l_linenumber = a.l_linenumber
    """,
)
def rel_snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every keyed row across two
    table versions as unchanged / changed / added / removed — the
    acceptance gate of every migration, backfill, or engine swap
    ("the new pipeline's output differs from the old one WHERE,
    exactly?"). Snapshot B is derived in-plan from snapshot A with
    deterministic synthetic drift (keys dropped by one modulus =
    additions seen from A's side; prices bumped by another = changes)
    so the classifier's four counts are all exercised and
    oracle-pinned.

    One FULL OUTER join on the composite key (both sides shuffle on
    the same key — or neither, bucketed) and one conditional-sum
    aggregate; the diff never materializes row payloads beyond the
    compared columns. At 100 TB compare md5 row-hashes instead of raw
    columns — same plan shape, constant row width.
    """
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 97 != 0).select(
        "l_orderkey", "l_linenumber", cents("l_extendedprice").alias("price_cents")
    )
    b = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_orderkey") % 89 == 0, cents("l_extendedprice") + 1
        )
        .otherwise(cents("l_extendedprice"))
        .alias("price_cents"),
    )
    j = a.alias("a").join(
        b.alias("b"),
        (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber")),
        "full_outer",
    )
    both = F.col("a.l_orderkey").isNotNull() & F.col("b.l_orderkey").isNotNull()
    return j.agg(
        F.sum(
            F.when(
                both & (F.col("a.price_cents") == F.col("b.price_cents")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_unchanged"),
        F.sum(
            F.when(
                both & (F.col("a.price_cents") != F.col("b.price_cents")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(F.col("a.l_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("b.l_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
    )
