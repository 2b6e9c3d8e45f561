"""Training-data prep job for spark-submit (the q52 pipeline as a
deployable artifact).

    python jobs/package.py
    spark-submit --py-files dist/kmertools_spark.zip \\
        jobs/prep_job.py \\
        --input /root/testdata/sf0.1 --output /tmp/packed \\
        [--capacity 2048] [--min-quality 0.5] [--min-rep 0.3]
        [--min-tokens 5] [--rate en=0.8 --rate fr=1.0] [--default-rate 0.3]

Normalize -> quality/repetition/token filters -> per-language
stratified sampling -> deterministic shuffle + fixed-capacity sequence
packing; writes the (doc_id, bin, tok_start, pos_in_bin, n_tok) window
map partitioned by bin bucket (a downstream tokenizer joins it back to
the documents to emit the actual token stream), prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import time

import _bootstrap


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-rep", type=float, default=0.3)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument(
        "--rate",
        action="append",
        default=[],
        metavar="LANG=FRACTION",
        help="per-language keep rate (repeatable)",
    )
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--bin-buckets", type=int, default=64)
    ap.add_argument(
        "--checkpoint",
        choices=("local", "reliable", "none"),
        default="local",
        help="packing's (id, tok) pin: 'reliable' survives executor "
        "loss (requires spark.checkpoint.dir / setCheckpointDir)",
    )
    args = ap.parse_args()
    rates = {}
    for kv in args.rate:
        if "=" not in kv:
            ap.error(f"--rate expects LANG=FRACTION, got {kv!r}")
        lang, _, frac = kv.partition("=")
        try:
            rates[lang] = float(frac)
        except ValueError:
            ap.error(f"--rate fraction must be numeric, got {kv!r}")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("kmertools-prep").getOrCreate()
    _bootstrap.ensure_executors(spark)

    from kmertools_spark.operators import training_prep

    path = args.input
    if not path.endswith(".parquet"):
        path = f"{path}/documents.parquet"
    docs = spark.read.parquet(path)

    t0 = time.time()
    packed = training_prep(
        docs,
        capacity=args.capacity,
        min_quality=args.min_quality,
        min_rep=args.min_rep,
        min_tokens=args.min_tokens,
        rates=rates,
        default_rate=args.default_rate,
        checkpoint=args.checkpoint,
    ).withColumn("bin_bucket", F.pmod(F.col("bin"), args.bin_buckets))
    packed.write.mode("overwrite").partitionBy("bin_bucket").parquet(args.output)
    wall = time.time() - t0

    # an all-filtered run writes only _SUCCESS: read the written frame
    # lazily off the in-memory plan instead of re-inferring a schema
    # from an empty dir, and NULL-guard the sums (code-review r4)
    agg = packed.agg(
        F.countDistinct("doc_id").alias("docs"),
        F.countDistinct("bin").alias("bins"),
        F.sum("n_tok").alias("tokens"),
    ).first()
    n_in = docs.count()
    print(
        json.dumps(
            {
                "job": "prep",
                "input": path,
                "output": args.output,
                "docs_in": int(n_in),
                "docs_packed": int(agg["docs"] or 0),
                "windows": int(agg["bins"] or 0),
                "tokens": int(agg["tokens"] or 0),
                "capacity": args.capacity,
                "wall_sec": round(wall, 3),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
