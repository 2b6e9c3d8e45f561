"""CGR trajectory UDF (P7) — per-char affine prefix scan.

composition/src/cgr.rs:127-144; a row with an OOV character yields null
(the reference raises; Spark cannot raise per-row, SURVEY §2.10).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

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


CGR_ERR = "Bad nucleotide, unable to proceed"  # composition/src/cgr.rs:139

_RESULT = StructType(
    [StructField("cgr", ArrayType(_POINT)), StructField("err", StringType())]
)


def cgr_points_with_error(vecsize: float = 1.0):
    """pandas UDF: text -> struct<cgr array<struct<x,y>>, err string>.

    The reference RAISES on an OOV character
    (Err("Bad nucleotide, unable to proceed"), composition/src/cgr.rs:
    131-140) and the pyapi surface replicates that raise; a distributed
    column cannot raise per-row, so this surface carries the reference's
    exact error string in ``err`` (null on success; ``cgr`` null iff
    ``err`` set) — closing the per-row error-semantics gap (VERDICT r1
    missing item 4). ``cgr_points`` remains the null-collapsing variant.
    """

    @pandas_udf(_RESULT)
    def _udf(texts: pd.Series) -> pd.DataFrame:
        pts, errs = [], []
        for tr in cgr_batch(texts.tolist(), vecsize):
            if tr is None:
                pts.append(None)
                errs.append(CGR_ERR)
            else:
                pts.append([{"x": float(x), "y": float(y)} for x, y in tr])
                errs.append(None)
        return pd.DataFrame({"cgr": pts, "err": errs})

    return _udf
