"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kmertools_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 4096,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession.

    Defaults favor the same plan shape locally and on a cluster:
    AQE on (runtime coalescing + skew-join mitigation), Arrow transport
    for pandas UDFs with a bounded batch size (the analog of the
    reference's 4 GiB batch buffer, composition/src/oligo.rs:13,151 —
    bounded so a (rows x 4^k) kernel matrix stays in executor memory).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # getOrCreate silently reuses a live session, applying only
    # runtime-settable confs — a bench/harness asking for local[8]
    # while a local[4] fixture session exists would run with the wrong
    # parallelism and no error (code-review r5): surface it loudly
    actual = spark.sparkContext.master
    if actual != master:
        import warnings

        warnings.warn(
            f"get_spark({app_name!r}): reusing existing SparkSession with "
            f"master={actual!r}; the requested master={master!r} (and any "
            "static confs like driver memory) were NOT applied",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark
