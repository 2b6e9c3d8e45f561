"""CGR trajectory UDF (P7) — per-char affine prefix scan.

composition/src/cgr.rs:127-144; a row with an OOV character yields null
(the reference raises; Spark cannot raise per-row, SURVEY §2.10).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

from ..oracle.kernels import cgr_batch

_POINT = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])


def cgr_points(vecsize: float = 1.0):
    """pandas UDF: text -> array<struct<x,y>> CGR walk (null on OOV)."""

    @pandas_udf(ArrayType(_POINT))
    def _udf(texts: pd.Series) -> pd.Series:
        out = []
        for tr in cgr_batch(texts.tolist(), vecsize):
            if tr is None:
                out.append(None)
            else:
                out.append([{"x": float(x), "y": float(y)} for x, y in tr])
        return pd.Series(out)

    return _udf
