"""Global k-mer counting + coverage features (A4/A5/A6, J1/J2).

The reference's whole out-of-core counting machinery
(counter/src/lib.rs: chunk loop, `min_mer % n_parts` sharding, spill
files, per-partition merge) collapses into: Arrow-batch partial
aggregation (kmer_count_pairs) -> groupBy(kmer).sum — Spark's
partial/final hash aggregation IS the reference's X1-X3 strategy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.composition import coverage_vector
from ..functions.kmers import kmer_count_pairs
from .skew import salted_sum


def global_kmer_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    canonical: bool = True,
    salt: int | None = None,
) -> DataFrame:
    """(kmer, cnt) global counts over all rows.

    ``salt`` forces an explicit two-phase aggregation over (kmer, salt)
    for pathologically skewed token distributions — normally unneeded
    because the Arrow-batch pre-aggregation in kmer_count_pairs plus
    Spark's partial HashAggregate already combine map-side.
    """
    pairs = kmer_count_pairs(df, text_col=text_col, k=k, canonical=canonical)
    if salt:
        return salted_sum(pairs, keys=["kmer"], value="cnt", n_salts=salt)
    return pairs.groupBy("kmer").agg(F.sum("cnt").alias("cnt"))


def coverage_features(
    df: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    k: int = 4,
    bin_size: int = 16,
    bin_count: int = 16,
    norm: bool = True,
    out_col: str = "cov_vec",
) -> DataFrame:
    """Attach per-row coverage histograms against a global count table.

    Physical strategy (X10): the count table is collected and broadcast
    (bounded by the 4^k domain — always safe for k <= 12; for larger k
    at 100 TB, pre-filter `counts` to the frequent tail or switch to the
    exploded-join formulation in the oracle SQL). The probe itself is
    map-side vectorized binning — no join, no shuffle.
    """
    spark = df.sparkSession
    rows = counts.select("kmer", "cnt").toPandas()
    udf = coverage_vector(
        k,
        rows["kmer"].to_numpy(dtype=np.int64),
        rows["cnt"].to_numpy(dtype=np.int64),
        bin_size=bin_size,
        bin_count=bin_count,
        norm=norm,
        spark=spark,
    )
    return df.withColumn(out_col, udf(F.col(text_col)))
