"""Feature-table writers: the Iceberg-shaped partition layout on parquet.

The target catalog layout (SURVEY §1.3) is an Iceberg table partitioned
by days(ts) + bucket(conv_id, N). This container has no Iceberg jars,
so the same layout is produced as hive-style parquet partitions — the
write pattern (and the pruning behavior readers get from it) is
identical; swapping `format("parquet")` for `format("iceberg")` plus a
catalog identifier is the only cluster-side change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_COL = "__day"
BUCKET_COL = "__bucket"


def write_feature_table(
    df: DataFrame,
    path: str,
    n_buckets: int = 16,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write partitioned by (days(ts), bucket(conv_id, n)).

    Readers filtering on a day range or probing single conversations
    prune to matching directories (DataFilters/PartitionFilters in the
    scan); within partitions rows are sorted by (conv_id, turn_idx) —
    the deterministic-order invariant (O2) via sort, not mmap offsets.
    """
    import json
    import os

    meta_path = os.path.join(path, "_kt_meta.json")
    if mode == "append" and os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f).get("n_buckets")
        if existing != n_buckets:
            # appending under a different modulus would leave old rows
            # laid out under the old buckets while the meta claims the
            # new one — conv_id probes would silently miss them
            # (code-review r4)
            raise ValueError(
                f"write_feature_table: table at {path} was written with "
                f"n_buckets={existing}; appending with n_buckets="
                f"{n_buckets} would break conv_id bucket pruning"
            )
    out = (
        df.withColumn(DAY_COL, F.to_date(F.col(ts_col)))
        .withColumn(
            BUCKET_COL, F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
        )
        .repartition(F.col(DAY_COL), F.col(BUCKET_COL))
        # partition columns FIRST: without them the dynamic-partition
        # writer inserts its own sort on (day, bucket), duplicating
        # work and leaving the documented (conv_id, turn_idx) file
        # order resting on that sort's stability (code-review r4)
        .sortWithinPartitions(DAY_COL, BUCKET_COL, "conv_id", "turn_idx")
    )
    out.write.mode(mode).partitionBy(DAY_COL, BUCKET_COL).parquet(path)
    # persist the bucket count: a reader probing with a different modulus
    # would silently miss rows, so reads resolve it from the table itself
    with open(meta_path, "w") as f:
        json.dump({"n_buckets": n_buckets}, f)


def read_feature_table(
    spark: SparkSession,
    path: str,
    conv_id: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Read back; a conv_id probe adds the bucket predicate so the scan
    prunes to 1/n_buckets of the partitions. The bucket modulus is
    resolved from the table's own metadata (a caller-supplied value
    that disagreed with the writer's would silently miss rows)."""
    import json
    import os

    meta = os.path.join(path, "_kt_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            n_buckets = json.load(f)["n_buckets"]
    elif n_buckets is None:
        raise ValueError(f"no _kt_meta.json under {path} and no n_buckets given")
    df = spark.read.parquet(path)
    if conv_id is not None:
        df = df.where(
            (F.col(BUCKET_COL) == F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(n_buckets)).cast("int"))
            & (F.col("conv_id") == conv_id)
        )
    return df.drop(DAY_COL, BUCKET_COL)
