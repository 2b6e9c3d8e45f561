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
    args = ap.parse_args()
    rates = dict(
        (kv.split("=", 1)[0], float(kv.split("=", 1)[1])) for kv in args.rate
    )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("kmertools-prep").getOrCreate()
    _bootstrap.ensure_executors(spark)

    from kmertools_spark.functions import (
        lang_guess,
        normalize_text,
        quality_score,
        repetition_ratio,
        token_count,
    )
    from kmertools_spark.operators import pack_documents, stratified_sample

    path = args.input
    if not path.endswith(".parquet"):
        path = f"{path}/documents.parquet"
    docs = spark.read.parquet(path)

    t0 = time.time()
    norm = normalize_text(F.col("text"))
    feats = docs.select(
        "doc_id",
        token_count(norm).alias("n_tok"),
        quality_score(norm).alias("q"),
        repetition_ratio(norm, 4).alias("rep"),
        lang_guess(norm).alias("lang"),
    )
    kept = feats.where(
        (F.col("q") >= args.min_quality)
        & (F.col("rep") >= args.min_rep)
        & (F.col("n_tok") >= args.min_tokens)
    )
    if rates or args.default_rate < 1.0:
        kept = stratified_sample(kept, "doc_id", "lang", rates, args.default_rate)
    packed = pack_documents(
        kept, capacity=args.capacity, tokens_col="n_tok", order="hash"
    ).withColumn("bin_bucket", F.pmod(F.col("bin"), args.bin_buckets))
    packed.write.mode("overwrite").partitionBy("bin_bucket").parquet(args.output)
    wall = time.time() - t0

    out = spark.read.parquet(args.output)
    agg = out.agg(
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
                "docs_packed": int(agg["docs"]),
                "windows": int(agg["bins"]),
                "tokens": int(agg["tokens"]),
                "capacity": args.capacity,
                "wall_sec": round(wall, 3),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
