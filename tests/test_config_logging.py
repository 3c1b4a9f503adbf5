"""Config loader (C3) + Log4j wrapper (C2)."""

from __future__ import annotations

import json

import pytest

from spark_etl_pipeline_spark.config import (
    families_from_config,
    load_config,
    sink_flags,
)
from spark_etl_pipeline_spark.logging import Log4j

REFERENCE_SHAPE = {
    "transform": {
        "default": [154992, 155357],
        "type1": [-48],
        "type2": [155138],
        "type3": [4550],
    },
    "mysql": {"insert": True, "load": {"url": "jdbc:mysql://db/shop"}},
    "file": {"write": False, "load": {"path": "/data/in"}},
}


def test_load_and_families(tmp_path):
    p = tmp_path / "etl_config.json"
    p.write_text(json.dumps(REFERENCE_SHAPE))
    cfg = load_config(p)
    fams = families_from_config(cfg)
    assert set(fams) == {"default", "type1", "type2", "type3"}
    assert fams["default"].site_ids == ("154992", "155357")  # ints → strings
    assert fams["type2"].url_code_logtypes == ("view",)
    assert sink_flags(cfg) == (True, False)


def test_load_config_validates(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"transform": {"default": []}}))
    with pytest.raises(ValueError, match="missing families"):
        load_config(p)
    p2 = tmp_path / "worse.json"
    p2.write_text("{}")
    with pytest.raises(ValueError, match="transform"):
        load_config(p2)


def test_log4j_wrapper(spark):
    log = Log4j(spark)
    # JVM logger: must accept all three levels without raising
    log.info("info message")
    log.warn("warn message")
    log.error("error message")
