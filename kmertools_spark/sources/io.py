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
_META_NAME = "_kt_meta.json"


def _fs_and_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for any supported scheme — file://,
    hdfs://, s3a://. os.path/open would silently no-op the meta
    bookkeeping on a real cluster target (r4 ADVICE)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def _read_meta(spark: SparkSession, path: str) -> dict | None:
    import json

    fs, table = _fs_and_path(spark, path)
    meta = spark._jvm.org.apache.hadoop.fs.Path(table, _META_NAME)
    if not fs.exists(meta):
        return None
    stream = fs.open(meta)
    try:
        # java.io.InputStream.readAllBytes (Java 9+) -> python bytes;
        # a py4j bytearray read-buffer would NOT see Java-side writes
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    import json

    fs, table = _fs_and_path(spark, path)
    target = spark._jvm.org.apache.hadoop.fs.Path(table, _META_NAME)
    stream = fs.create(target, True)
    try:
        stream.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        stream.close()


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
    spark = df.sparkSession
    if mode == "ignore":
        # "ignore" no-ops the parquet save when the table exists — the
        # meta write must then no-op too, or it would claim the new
        # modulus over the old layout (code-review r5 finding 2).
        # (error/errorifexists need no guard: the writer throws before
        # the meta write.)
        fs, table = _fs_and_path(spark, path)
        if fs.exists(table):
            return
    if mode == "append":
        meta = _read_meta(spark, path)
        fs, table = _fs_and_path(spark, path)
        if meta is None and fs.exists(table):
            # a pre-existing table with no meta has an UNKNOWN layout —
            # appending would rewrite meta to the new modulus while the
            # old rows keep the old buckets (r4 ADVICE): refuse rather
            # than guess; overwrite or backfill the meta explicitly
            raise ValueError(
                f"write_feature_table: table at {path} exists but has no "
                f"{_META_NAME}; refusing to append with an unverifiable "
                "bucket modulus (use mode='overwrite' to rebuild)"
            )
        if meta is not None and meta.get("n_buckets") != n_buckets:
            # appending under a different modulus would leave old rows
            # laid out under the old buckets while the meta claims the
            # new one — conv_id probes would silently miss them
            # (code-review r4)
            raise ValueError(
                f"write_feature_table: table at {path} was written with "
                f"n_buckets={meta.get('n_buckets')}; appending with n_buckets="
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
    _write_meta(spark, path, {"n_buckets": n_buckets})


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
    meta = _read_meta(spark, path)
    if meta is not None:
        n_buckets = meta["n_buckets"]
    elif n_buckets is None:
        raise ValueError(f"no {_META_NAME} under {path} and no n_buckets given")
    df = spark.read.parquet(path)
    if conv_id is not None:
        df = df.where(
            (F.col(BUCKET_COL) == F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(n_buckets)).cast("int"))
            & (F.col("conv_id") == conv_id)
        )
    return df.drop(DAY_COL, BUCKET_COL)
