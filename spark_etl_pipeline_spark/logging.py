"""Log4j wrapper (reference C2: ``dependencies/logging.py:10-51``).

Same surface as the reference's ``Log4j`` class — ``error`` / ``warn``
/ ``info`` routed to the JVM's log4j so engine messages interleave with
Spark's own logs under one logger named ``<app_name app_id>`` — but it
degrades to Python's stdlib logging when no JVM is reachable (e.g. unit
code paths that never start a session), instead of failing.
"""

from __future__ import annotations

import logging as _pylogging

from pyspark.sql import SparkSession


class Log4j:
    """JVM log4j handle scoped to the application name + id."""

    def __init__(self, spark: SparkSession) -> None:
        conf = spark.sparkContext.getConf()
        name = f"{conf.get('spark.app.name')} {conf.get('spark.app.id')}"
        try:
            log4j = spark._jvm.org.apache.log4j  # type: ignore[union-attr]
            self._logger = log4j.LogManager.getLogger(name)
        except Exception:  # no JVM bridge — stdlib fallback
            self._logger = _pylogging.getLogger(name)

    def error(self, message: str) -> None:
        self._logger.error(message)

    def warn(self, message: str) -> None:
        self._logger.warning(message) if isinstance(
            self._logger, _pylogging.Logger
        ) else self._logger.warn(message)

    def info(self, message: str) -> None:
        self._logger.info(message)
