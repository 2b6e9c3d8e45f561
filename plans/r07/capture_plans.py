"""Capture .explain('formatted') for every bench leg (and the operators
touched in r7) into plans/r07/<leg>_<tag>.txt.

Usage: python plans/r07/capture_plans.py before|after
"""

from __future__ import annotations

import os
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "plans", "r07")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import functions as F  # noqa: E402

from kmertools_spark.functions import (  # noqa: E402
    cgr_points,
    exploded_minimisers,
    vocab_token_counts,
)
from kmertools_spark.functions.tokenize import DEMO_VOCAB  # noqa: E402
from kmertools_spark.operators import (  # noqa: E402
    asof_join,
    backfill_features_stream,
    coverage_features,
    cosine_topk,
    global_kmer_counts,
    lsh_candidate_pairs,
    minhash_signatures,
    pack_documents,
    training_prep,
)
from kmertools_spark.session import get_spark  # noqa: E402
from kmertools_spark.sources import probes_df, transcripts_df  # noqa: E402
from kmertools_spark.sources.bench_corpus import ensure_bench_corpus  # noqa: E402

spark = get_spark(
    "kmertools-plans-r07", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
)

corpus_root = os.environ.get(
    "SPARK_GRAFT_BENCH_CORPUS", os.path.join(REPO, ".bench_corpus")
)
corpus_dir = ensure_bench_corpus(corpus_root, 100000, 50000)

t = transcripts_df(spark, sf_dir)
docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
p = probes_df(spark, sf_dir).distinct()
clean_expr = F.regexp_replace("text", "[^ACGTUacgtu]", "")

counts = global_kmer_counts(t, k=4)
sigs = minhash_signatures(docs)

plans = {
    "backfill": lambda: backfill_features_stream(t, k=4, n_turns=3),
    "asof": lambda: asof_join(
        t.withColumn("text_len", F.length("text")),
        p,
        value_cols=("turn_idx", "text_len"),
    ),
    "counts_cov": lambda: coverage_features(
        t, counts, k=4, bin_size=4, bin_count=8
    ),
    "minruns": lambda: exploded_minimisers(t, w=8, m=5),
    "cgr": lambda: t.select(cgr_points(1.0)(clean_expr).alias("cgr")).agg(
        F.sum(F.size("cgr"))
    ),
    "dedup_sigs": lambda: sigs,
    "dedup_pairs": lambda: lsh_candidate_pairs(sigs, bands=4),
    "ann": lambda: cosine_topk(emb, emb.where("vec_id < 8"), k=5),
    "tokenize": lambda: vocab_token_counts(docs, DEMO_VOCAB),
    "pack": lambda: pack_documents(docs, capacity=256),
    "prep": lambda: training_prep(
        docs, capacity=256, rates={"en": 0.8}, default_rate=0.3
    ),
}

for name, fn in plans.items():
    try:
        df = fn()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # pragma: no cover
        txt = f"ERROR capturing plan: {e}"
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)} chars)")

spark.stop()
