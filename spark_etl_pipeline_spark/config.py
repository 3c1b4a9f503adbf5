"""Job-config loading (reference C3: ``configs/etl_config.json``).

The reference discovers its config by scanning ``SparkFiles`` for any
``*config.json`` shipped via ``--files`` (reference
``dependencies/spark.py:92-112``) and destructures it KeyError-unsafe
(``jobs/etl_job.py:52-59``). Here the path is explicit, the schema is
validated, and the site-family section constructs the
:class:`~spark_etl_pipeline_spark.plans.etl.FamilySpec` model directly —
so a user of the reference can point their existing JSON at this engine.

Supported shape (the reference's ``configs/etl_config.json:1-34``):

.. code-block:: json

    {
      "transform": {"default": [154992], "type1": [-48],
                    "type2": [155138], "type3": [4550]},
      "mysql": {"insert": true, "load": {...}, "save": {...}},
      "file":  {"write": true, "load": {"path": "..."},
                "save": {"path": "..."}}
    }
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from spark_etl_pipeline_spark.plans.etl import FamilySpec, reference_families

FAMILY_KEYS = ("default", "type1", "type2", "type3")


def load_config(path: str | Path) -> dict[str, Any]:
    """Read and validate a job-config JSON file."""
    cfg = json.loads(Path(path).read_text())
    if "transform" not in cfg:
        raise ValueError(f"{path}: missing required 'transform' section")
    missing = [k for k in FAMILY_KEYS if k not in cfg["transform"]]
    if missing:
        raise ValueError(f"{path}: transform section missing families {missing}")
    return cfg


def families_from_config(cfg: dict[str, Any]) -> dict[str, FamilySpec]:
    """Build the four reference site families from a loaded config.

    Site ids are normalized to strings (the JSON carries ints; the log
    data's ``info.siteseq`` is a string column).
    """
    ids = {
        k: tuple(str(i) for i in cfg["transform"][k]) for k in FAMILY_KEYS
    }
    return reference_families(
        ids["default"], ids["type1"], ids["type2"], ids["type3"]
    )


def sink_flags(cfg: dict[str, Any]) -> tuple[bool, bool]:
    """(write_jdbc, write_file): the two sink gates the reference job
    reads from config (``jobs/etl_job.py:67-70``)."""
    return (
        bool(cfg.get("mysql", {}).get("insert", False)),
        bool(cfg.get("file", {}).get("write", False)),
    )
