"""The submit-able job entry point, end-to-end against fixture files."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "jobs")

from tests.test_etl_golden import DIM, DIM_SCHEMA, EXPECTED, LOGS, LOG_SCHEMA


def test_job_runs_config_driven(spark, tmp_path):
    import clickstream_job

    logs_path = str(tmp_path / "logs")
    dim_path = str(tmp_path / "dim")
    out_path = str(tmp_path / "out")
    spark.createDataFrame(LOGS, LOG_SCHEMA).write.parquet(logs_path)
    spark.createDataFrame(DIM, DIM_SCHEMA).write.parquet(dim_path)

    cfg = {
        "transform": {
            "default": [154992],
            "type1": [-48],
            "type2": [155138],
            "type3": [4550],
        },
        "mysql": {"insert": False},
        "file": {
            "write": True,
            "load": {"path": logs_path},
            "dim_path": dim_path,
            "save": {"path": out_path},
        },
    }
    cfg_path = tmp_path / "etl_config.json"
    cfg_path.write_text(json.dumps(cfg))

    assert clickstream_job.main(["--config", str(cfg_path)]) == 0

    from pyspark.sql import functions as F

    got = sorted(
        [tuple(r) for r in spark.read.parquet(out_path).select(
            "USER_ID", "SHOPPING_ID",
            # the partitionBy directory round-trips as a DATE via
            # partition-column type inference; normalize for compare
            F.date_format("TRANSACTION_DATE", "yyyy-MM-dd").alias("TRANSACTION_DATE"),
            "TRANSACTION_TIME",
            "LOG_TYPE", "INTG_ID", "ITEM_CODE", "ITEM_NAME",
            "CAT1", "CAT2", "CAT3", "CAT4",
            "INTG_CAT1", "INTG_CAT2", "INTG_CAT3", "INTG_CAT4",
        ).collect()],
        key=lambda r: tuple("" if v is None else str(v) for v in r),
    )
    assert got == EXPECTED


def test_job_discovers_files_staged_config(spark, tmp_path, capsys):
    """Reference submit-line parity: ``--files etl_config.json`` and NO
    ``--config`` flag — the job must scan SparkFiles' root directory for
    ``*config.json`` exactly like reference dependencies/spark.py:92-112."""
    import clickstream_job

    logs_path = str(tmp_path / "logs")
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(LOGS, LOG_SCHEMA).write.parquet(logs_path)
    spark.createDataFrame(DIM, DIM_SCHEMA).write.parquet(dim_path)
    cfg_path = tmp_path / "etl_config.json"
    cfg_path.write_text(json.dumps({
        "transform": {"default": [154992], "type1": [-48],
                      "type2": [155138], "type3": [4550]},
        "mysql": {"insert": False},
        "file": {"write": False, "load": {"path": logs_path},
                 "dim_path": dim_path, "save": {"path": str(tmp_path / 'o')}},
    }))
    # local-mode equivalent of `spark-submit --files etl_config.json`
    spark.sparkContext.addFile(str(cfg_path))

    assert clickstream_job.main(["--dry-run"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_job_dry_run(spark, tmp_path, capsys):
    import clickstream_job

    logs_path = str(tmp_path / "logs")
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(LOGS, LOG_SCHEMA).write.parquet(logs_path)
    spark.createDataFrame(DIM, DIM_SCHEMA).write.parquet(dim_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "transform": {"default": [154992], "type1": [-48],
                      "type2": [155138], "type3": [4550]},
        "mysql": {"insert": False},
        "file": {"write": False, "load": {"path": logs_path},
                 "dim_path": dim_path, "save": {"path": str(tmp_path / 'o')}},
    }))
    assert clickstream_job.main(["--config", str(cfg_path), "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out  # explain("formatted") reached stdout


def test_query_job_runs_any_registered_query(spark, tmp_path):
    import query_job

    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "q1_out")
    assert query_job.main(
        ["--query", "q1_pricing_summary", "--sf-dir", SF_SMOKE, "--out", out]
    ) == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert "sum_qty" in got.columns


def test_query_job_rejects_unknown_query(tmp_path, capsys):
    import query_job

    assert query_job.main(
        ["--query", "nope", "--sf-dir", "/tmp", "--out", str(tmp_path / "o")]
    ) == 2


def test_query_job_explain_prints_plan(spark, capsys):
    import query_job

    from tests.conftest import SF_SMOKE

    assert query_job.main(
        ["--query", "q6_forecast_revenue", "--sf-dir", SF_SMOKE, "--explain"]
    ) == 0
    assert "Physical Plan" in capsys.readouterr().out
