"""Shingle-hash UDF builders: MinHash signatures, SimHash, fingerprints.

Arrow-batched wrappers around the batch-vectorized kernels in
kmertools_spark.oracle.hashing — the integer constants there are
mirrored verbatim into the DuckDB oracle SQL, so these UDFs are exactly
reproducible in plain SQL. All hashing runs as one numpy pass over the
concatenated bytes of each Arrow batch (no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..oracle.hashing import fingerprint_batch, minhash_batch, simhash_batch


def minhash_sig(width: int = 8):
    """pandas UDF: text -> array<long> MinHash signature (null if no shingle)."""

    @pandas_udf(ArrayType(LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(minhash_batch(texts.tolist(), width))

    return _udf


def simhash_value(width: int = 8):
    """pandas UDF: text -> long SimHash (null if no shingle)."""

    @pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(texts.tolist(), width), dtype="Int64")

    return _udf


def doc_fingerprint(width: int = 16):
    """pandas UDF: text -> long min-window rolling-hash fingerprint."""

    @pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(fingerprint_batch(texts.tolist(), width), dtype="Int64")

    return _udf
