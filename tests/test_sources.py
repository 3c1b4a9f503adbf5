"""Sinks/sources: parquet + CSV round-trips, JDBC option building.

JDBC has no live database in this environment, so the option builders
(pure functions) are verified directly; the reader/writer wrappers are
one `.format('jdbc').options(...)` away and share that logic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_etl_pipeline_spark.sources import (
    jdbc_read_options,
    jdbc_write_options,
    read_jdbc,
    read_parquet_evolving,
    write_jdbc_append,
    read_parquet,
    write_csv_single_file,
    write_parquet,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def nation(spark):
    return spark.read.parquet(f"{SF_SMOKE}/nation.parquet")


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip_partitioned(spark, nation, tmp_path):
    path = str(tmp_path / "nation_parquet")
    write_parquet(nation, path, mode="overwrite", partition_by=["n_regionkey"])
    back = read_parquet(spark, path).select(*nation.columns)
    # partition column type survives via the directory layout
    assert canon(back.withColumn("n_regionkey", F.col("n_regionkey").cast("int"))) == canon(nation)


def test_parquet_append_doubles_rows(spark, nation, tmp_path):
    path = str(tmp_path / "nation_append")
    write_parquet(nation, path, mode="overwrite")
    write_parquet(nation, path, mode="append")
    assert read_parquet(spark, path).count() == 2 * nation.count()


def test_parquet_read_pushdown(spark, nation, tmp_path):
    path = str(tmp_path / "nation_pd")
    write_parquet(nation, path, mode="overwrite")
    df = read_parquet(
        spark, path, columns=["n_name"], predicate=F.col("n_nationkey") < 5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(n_nationkey)" in plan
    assert df.count() == 5


def test_csv_single_file_roundtrip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_csv")
    write_csv_single_file(nation, path)
    files = [f for f in __import__("os").listdir(path) if f.endswith(".csv")]
    assert len(files) == 1  # coalesce(1) → exactly one data file
    back = (
        spark.read.option("header", True).csv(path)
        .select(
            F.col("n_nationkey").cast("int"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
    )
    assert canon(back) == canon(nation)


def test_jdbc_read_options_partitioned():
    opts = jdbc_read_options(
        url="jdbc:mysql://db:3306/shop",
        table="EP_INFO_VIEW",
        user="u",
        password="p",
        driver="com.mysql.cj.jdbc.Driver",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"


def test_jdbc_read_options_rejects_partial_partitioning():
    with pytest.raises(ValueError, match="ALL of"):
        jdbc_read_options(
            url="jdbc:mysql://db/shop", table="t", user="u", password="p",
            partition_column="id",
        )


def test_jdbc_write_options():
    opts = jdbc_write_options(
        url="jdbc:mysql://db/shop", table="OUT", user="u", password="p"
    )
    assert opts["isolationLevel"] == "READ_UNCOMMITTED"
    assert opts["batchsize"] == "10000"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from spark_etl_pipeline_spark.sources import write_bucketed

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    try:
        joined = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the key -> sort-merge join with NO
        # shuffle exchange on either side
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert joined.count() == lineitem.count()  # FK join keeps all lineitems
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_csv_explicit_schema_roundtrip(spark, nation, tmp_path):
    from spark_etl_pipeline_spark.sources import read_csv

    path = str(tmp_path / "nation_csv2")
    write_csv_single_file(nation, path)
    back = read_csv(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )
    assert canon(back) == canon(nation)


def test_json_lines_roundtrip(spark, nation, tmp_path):
    from spark_etl_pipeline_spark.sources import read_json

    path = str(tmp_path / "nation_json")
    nation.write.json(path)
    back = read_json(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    ).select(*nation.columns)
    assert canon(back) == canon(nation)


def test_jdbc_roundtrip_embedded_derby(spark, nation):
    # A LIVE JDBC round-trip: Spark ships Derby (for the Hive metastore),
    # so an in-memory Derby DB exercises the real JDBC write + read path
    # in-process — same code path as MySQL/Postgres in production, no
    # external server needed.
    url = "jdbc:derby:memory:sparketl_smoke;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src = nation.select("n_nationkey", "n_name")
    write_jdbc_append(
        src, url=url, table="nation_rt", user="app", password="app", driver=driver
    )
    back = read_jdbc(
        spark, url=url, table="nation_rt", user="app", password="app", driver=driver
    )
    assert back.count() == src.count()
    got = {(r.n_nationkey, r.n_name) for r in back.collect()}
    want = {(r.n_nationkey, r.n_name) for r in src.collect()}
    assert got == want

    # partitioned parallel read against the same table
    par = read_jdbc(
        spark, url=url, table="nation_rt", user="app", password="app",
        driver=driver, partition_column="n_nationkey",
        lower_bound=0, upper_bound=30, num_partitions=4,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == src.count()


def test_parquet_schema_evolution_merged_read(spark, nation, tmp_path):
    # generation 1: two columns; generation 2 adds a third
    path = str(tmp_path / "evolving")
    nation.select("n_nationkey", "n_name").write.parquet(path)
    nation.select(
        "n_nationkey", "n_name", F.lit("emea").alias("region_tag")
    ).write.mode("append").parquet(path)

    merged = read_parquet_evolving(spark, path)
    assert set(merged.columns) == {"n_nationkey", "n_name", "region_tag"}
    rows = merged.count()
    assert rows == nation.count() * 2
    # generation-1 rows surface the new column as null
    assert merged.filter(F.col("region_tag").isNull()).count() == nation.count()


def test_parquet_schema_evolution_widened_read(spark, nation, tmp_path):
    # generation 1 declared the balance column FLOAT; generation 2
    # widened it to DOUBLE and added a column. mergeSchema hard-fails
    # this directory (CANNOT_MERGE_SCHEMAS); the evolving reader must
    # promote the union instead.
    path = str(tmp_path / "widening")
    nation.select(
        "n_nationkey", F.lit(1.5).cast("float").alias("bal")
    ).write.parquet(path)
    nation.select(
        "n_nationkey",
        F.lit(2.5).cast("double").alias("bal"),
        F.lit("emea").alias("region_tag"),
    ).write.mode("append").parquet(path)

    merged = read_parquet_evolving(spark, path)
    assert dict(merged.dtypes)["bal"] == "double"
    assert set(merged.columns) == {"n_nationkey", "bal", "region_tag"}
    assert merged.count() == nation.count() * 2
    # float32 1.5 is exact under promotion
    assert merged.filter(F.col("bal") == 1.5).count() == nation.count()


def test_table_does_not_misrepair_int96_timestamps(spark, tmp_path):
    # Spark's default parquet timestamp encoding (INT96) surfaces as
    # timestamp[ns] in arrow schemas, but Spark reads it natively — the
    # footer sniffer must only flag INT64 TIMESTAMP(NANOS) (the driver
    # testdata encoding) for the nanosAsLong repair. Regression: the
    # sniffer once flagged INT96 and table() then applied `ts div 1000`
    # to a real timestamp column (analysis error).
    from spark_etl_pipeline_spark.plans.registry import table

    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        src = spark.sql(
            "SELECT 1 AS id, timestamp'2026-01-02 03:04:05.123456' AS ts"
        )
        src.write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    got = table(spark, str(tmp_path), "t")
    assert dict(got.dtypes)["ts"] == "timestamp"
    assert str(got.collect()[0]["ts"]) == "2026-01-02 03:04:05.123456"


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from spark_etl_pipeline_spark.plans.registry import table
    from spark_etl_pipeline_spark.sources import read_orc, write_orc

    src = table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path, partition_by=["o_orderstatus"])

    back = read_orc(spark, path)
    assert back.count() == src.count()
    # partition pruning: the status filter must prune directories
    pruned = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" not in plan.split("ReadSchema")[-1][:200], (
        "partition column should come from the directory, not the file"
    )
    want = src.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == want


def test_clustered_write_narrows_file_stats(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions clusters rows so each
    parquet file covers a narrow, mostly-disjoint user_id range — the
    data-layout prerequisite for row-group skipping on key filters at
    scale (min/max stats only prune when values are clustered)."""
    import pyarrow.parquet as pq
    from spark_etl_pipeline_spark.plans.registry import table

    events = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "clustered")
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(path)
    )

    import glob
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(len(md.schema.names))
            if md.schema.column(i).name == "user_id"
        )
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) >= 4
    # ranges must be (mostly) disjoint: sorted by lo, each file's lo is
    # at least the previous file's hi (range partitioner boundaries)
    spans.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert lo_b >= hi_a, f"file ranges overlap: {spans}"
    # and each file covers a strict subset of the global domain
    global_lo = min(s[0] for s in spans)
    global_hi = max(s[1] for s in spans)
    assert all(hi - lo < (global_hi - global_lo) for lo, hi in spans)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from spark_etl_pipeline_spark.plans.registry import table
    from spark_etl_pipeline_spark.sources import compact_parquet

    events = table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    path = str(tmp_path / "many_small")
    events.repartition(16).write.parquet(path)

    import glob
    assert len(glob.glob(f"{path}/*.parquet")) >= 16
    want = events.count()

    compact_parquet(spark, path, target_files=2)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) <= 2
    assert spark.read.parquet(path).count() == want


def test_parquet_bloom_filter_written(spark, tmp_path):
    """Bloom filters on the join key give probabilistic row-group
    skipping for point lookups on high-cardinality columns where
    min/max stats are useless (uniformly spread keys)."""
    import glob
    import pyarrow.parquet as pq
    from spark_etl_pipeline_spark.plans.registry import table

    import os

    events = table(spark, SF_SMOKE, "events").select("event_id", "user_id")

    def one_file_bytes(path, with_bloom):
        w = events.coalesce(1).write
        if with_bloom:
            w = w.option("parquet.bloom.filter.enabled#event_id", "true")
        w.parquet(path)
        f = glob.glob(f"{path}/*.parquet")[0]
        # same rows either way
        assert pq.ParquetFile(f).metadata.num_rows == events.count()
        return os.path.getsize(f)

    plain = one_file_bytes(str(tmp_path / "plain"), with_bloom=False)
    bloomed = one_file_bytes(str(tmp_path / "bloomed"), with_bloom=True)
    # identical data + layout; the only delta is the serialized bloom
    # filter (~1 bit+overhead per distinct key — clearly nonzero for
    # 10k distinct event_ids)
    assert bloomed > plain + 1000, (plain, bloomed)


def test_zorder_write_narrows_both_dimensions(spark, tmp_path):
    """Z-order clustering bounds per-file min/max spans on BOTH key
    columns; single-column range clustering narrows one and leaves the
    other at (almost) full domain — the difference that makes file
    skipping work for predicates on either column."""
    import glob

    import pyarrow.parquet as pq

    from spark_etl_pipeline_spark.plans.registry import table
    from spark_etl_pipeline_spark.sources import write_zorder

    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )

    def spans(path, col):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(len(md.schema.names))
                if md.schema.column(i).name == col
            )
            st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
            out.append((min(s.min for s in st), max(s.max for s in st)))
        return out

    zpath = str(tmp_path / "zorder")
    write_zorder(li, zpath, "l_partkey", "l_suppkey", num_files=8)
    onedim = str(tmp_path / "onedim")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(onedim)
    )

    for col in ("l_partkey", "l_suppkey"):
        sp = spans(zpath, col)
        assert len(sp) >= 4
        glo = min(s[0] for s in sp)
        ghi = max(s[1] for s in sp)
        # files cover proper sub-ranges of EACH dimension; one straddler
        # is tolerated where a z-range boundary crosses the dimension's
        # bit boundary (unavoidable on tiny domains like 10 suppliers)
        narrow = [(hi - lo) <= 0.7 * (ghi - glo) for lo, hi in sp]
        assert sum(narrow) >= len(sp) - 1, (col, sp)

    # the single-column layout leaves the second dimension unclustered:
    # (at least one, in practice every) file spans ~the whole suppkey domain
    sp2 = spans(onedim, "l_suppkey")
    glo2 = min(s[0] for s in sp2)
    ghi2 = max(s[1] for s in sp2)
    assert max(hi - lo for lo, hi in sp2) > 0.9 * (ghi2 - glo2)


def test_csv_quarantine_routes_malformed_rows(spark, tmp_path):
    from spark_etl_pipeline_spark.sources import read_csv_quarantine

    csv = tmp_path / "dirty.csv"
    csv.write_text(
        "id,qty,name\n"
        "1,10,alpha\n"
        "2,notanumber,beta\n"   # qty fails int parse -> quarantined
        "3,30,gamma\n"
        "4,40\n"                # short row: CSV treats as malformed too
    )
    clean, quarantine = read_csv_quarantine(
        spark, str(csv), "id int, qty int, name string"
    )
    assert clean.count() == 2
    assert {r.id for r in clean.collect()} == {1, 3}
    bad = sorted(r._corrupt for r in quarantine.collect())
    # forensics contract: quarantined rows are the RAW lines, intact
    assert bad == ["2,notanumber,beta", "4,40"]


def test_json_quarantine_routes_malformed_rows(spark, tmp_path):
    from spark_etl_pipeline_spark.sources import read_json_quarantine

    jl = tmp_path / "dirty.jsonl"
    jl.write_text(
        '{"id": 1, "qty": 10}\n'
        "{not json at all\n"
        '{"id": 3, "qty": "notanumber"}\n'
        '{"id": 4}\n'  # missing field -> null, NOT corrupt (JSON semantics)
    )
    clean, quarantine = read_json_quarantine(spark, str(jl), "id long, qty long")
    assert {r.id for r in clean.collect()} == {1, 4}
    bad = sorted(r._corrupt for r in quarantine.collect())
    assert bad == sorted(["{not json at all", '{"id": 3, "qty": "notanumber"}'])


def test_python_datasource_partition_plan(spark):
    # partitions() must drive real split parallelism: 8 declared
    # InputPartitions -> 8 scan tasks, and the union of ranges must
    # reconstruct the full id space exactly (no loss, no duplication).
    from spark_etl_pipeline_spark.sources.pysource import (
        SYNTH_PARTS,
        SYNTH_ROWS,
        register_python_sources,
    )

    register_python_sources(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", SYNTH_ROWS)
        .option("parts", SYNTH_PARTS)
        .load()
    )
    assert df.rdd.getNumPartitions() == SYNTH_PARTS
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("id").alias("d"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).collect()[0]
    assert (row["n"], row["d"], row["lo"], row["hi"]) == (
        SYNTH_ROWS,
        SYNTH_ROWS,
        0,
        SYNTH_ROWS - 1,
    )


def test_python_stream_source_resumes_from_checkpoint(spark, tmp_path):
    # Each availableNow restart must consume exactly one `batch` page
    # from the committed offset: sink row count goes 250 -> 500 -> 600
    # -> 600 (exhausted source is a no-op, never a re-read).
    from spark_etl_pipeline_spark.sources.pysource import (
        STREAM_BATCH,
        STREAM_ROWS,
        register_python_sources,
    )

    register_python_sources(spark)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    expected = [
        min((r + 1) * STREAM_BATCH, STREAM_ROWS) for r in range(3)
    ] + [STREAM_ROWS]
    for want in expected:
        q = (
            spark.readStream.format("synthetic_events")
            .option("batch", STREAM_BATCH)
            .option("limit", STREAM_ROWS)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
        assert spark.read.parquet(out).count() == want
