"""Corpus dedup job for spark-submit.

Cluster invocation (the training-data-pipeline deployment shape):

    python jobs/package.py                       # builds dist/kmertools_spark.zip
    spark-submit --py-files dist/kmertools_spark.zip \\
        jobs/dedup_job.py \\
        --input /root/testdata/sf0.1 --output /tmp/dedup \\
        [--bands 4] [--ngram 4] [--threshold 0.4] [--max-bucket 256] \\
        [--checkpoint-dir /tmp/dedup_ckpt]

Runs the full MinHash -> capped LSH -> candidate-driven Jaccard verify
-> connected components pipeline (operators.dedup.dedup_keep) over the
documents table and writes the keep list as parquet
(doc_id, cluster_id, keep), then prints a one-line JSON summary.

Scale defaults differ from the gate query: the hot-band cap is ON
(star-capped flooded buckets, connectivity-exact — docs/SCALE.md item
3) and connected components use a reliable checkpoint dir when one is
given (executor-loss-safe lineage truncation on a real cluster).
"""

from __future__ import annotations

import argparse
import json
import time

import _bootstrap


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="scale-factor dir or parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--ngram", type=int, default=4)
    # 0.4 (vs the operator/gate default 0.5) is the DELIBERATE corpus-scale
    # default: with the hot-band cap on, star candidates verify against the
    # bucket minimum only, and the looser threshold compensates the recall
    # the cap trades away (code-review r4 — previously undocumented)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--max-bucket", type=int, default=256)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("kmertools-dedup").getOrCreate()
    _bootstrap.ensure_executors(spark)

    from kmertools_spark.operators import dedup_keep

    path = args.input
    if not path.endswith(".parquet"):
        path = f"{path}/documents.parquet"
    docs = spark.read.parquet(path)

    t0 = time.time()
    keep = dedup_keep(
        docs,
        bands=args.bands,
        n=args.ngram,
        threshold=args.threshold,
        max_bucket=args.max_bucket,
        checkpoint_dir=args.checkpoint_dir,
    )
    keep.write.mode("overwrite").parquet(args.output)
    wall = time.time() - t0

    out = spark.read.parquet(args.output)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).first()
    print(
        json.dumps(
            {
                "job": "dedup",
                "input": path,
                "output": args.output,
                "docs": int(agg["docs"]),
                "kept": int(agg["kept"] or 0),
                "clusters": int(agg["clusters"] or 0),
                "dup_fraction": round(
                    1 - (agg["kept"] or 0) / max(1, agg["docs"]), 6
                ),
                "wall_sec": round(wall, 3),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
