"""Vectorized (Arrow-batched) pandas UDFs — the extension surface E3.

The engine's rule is JVM built-ins first (everything in ``functions``,
``operators.text``, ``operators.dedup`` is pure Catalyst expressions);
this module is the documented escape hatch for logic that genuinely
needs Python — with ``@pandas_udf`` (Arrow columnar batches, ~10-100×
row-at-a-time ``udf``), never per-row Python.

Each UDF here has a JVM twin in the engine so tests can prove the
vectorized path agrees with the built-in path — the pattern to copy
when adding real Python-only logic (model scoring, tokenizers, ...).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType


@F.pandas_udf(IntegerType())
def py_token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count (vectorized twin of
    ``size(split(trim(text), '\\s+'))``)."""
    return text.str.strip().str.split(r"\s+").str.len().astype("int32")


@F.pandas_udf(DoubleType())
def py_vector_norm(vec: pd.Series) -> pd.Series:
    """L2 norm of an array<float|double> column (twin of the
    ``aggregate(zip_with(...))`` fold in ``operators.similarity``)."""
    import numpy as np

    return vec.map(lambda v: float(np.sqrt(np.dot(v, v))))


def jvm_token_count(col: str | Column) -> Column:
    """The JVM-side twin used by the text operators."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))
