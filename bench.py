"""Bench harness — prints ONE JSON line with headline timings.

Queries (over $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1, on
local[$SPARK_GRAFT_CPUS]):

  backfill   sessionize + per-turn composition vectors + rolling 3-turn
             vectors for every turn (the headline turns/sec metric)
  asof       leakage-free as-of join of derived probes
  counts_cov global k-mer counts + per-turn coverage histograms
  minruns    windowed minimizer-run state machine (w=8, m=5), exploded
  cgr        CGR trajectories (bit-exact FP recurrence) over all turns
  dedup      minhash signatures -> LSH candidate pairs (documents)
  ann        brute-force cosine top-k (embeddings)
  pack       deterministic shuffle + 256-token sequence packing
  prep       full training-prep pipeline (normalize -> quality/rep/
             token filters -> per-language sampling -> packing)

All queries force full computation via the noop sink / count; nothing
is collected to the driver. Each leg is timed best-of-N
(SPARK_GRAFT_BENCH_BEST, default 2) — single-run numbers on a shared
box swing 2-3x with page-cache/JIT luck, and the steady-state time is
the one that predicts cluster throughput. SPARK_GRAFT_SCALING=1 makes
this process emit its single-run JSON for use by bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(df) -> int:
    """Force evaluation via count — valid ONLY for plans whose every
    operator is cardinality-determining (mapInPandas kernels, joins,
    explodes, aggregations). A projection-only tail (scalar UDF column,
    Window function) gets PRUNED by count(): Catalyst drops the unused
    column and the Window's Sort with it, so the leg times a no-op
    (measured 0.32s vs 16.9s true cost on a 16M-row as-of). Use
    force_cols for those plans."""
    return df.count()


def force_cols(df) -> int:
    """Force every output column: hash-reduce all columns to one row.
    xxhash64 + bit_xor are cheap JVM-side and overflow-free, so the
    timing stays dominated by the plan under test."""
    from pyspark.sql import functions as F

    df.select(F.xxhash64(*df.columns).alias("__h")).agg(
        F.expr("bit_xor(__h)")
    ).collect()
    return 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pyspark.sql import functions as F

    from kmertools_spark.operators import (
        asof_join,
        backfill_features_stream,
        coverage_features,
        cosine_topk,
        global_kmer_counts,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kmertools_spark.session import get_spark
    from kmertools_spark.sources import probes_df, transcripts_df

    # host-load context (r4 VERDICT item 6): the sandbox host is shared,
    # and a loaded box inflates every leg 2-5x — the recorded numbers
    # are only adjudicable round-over-round with the load attached
    load_before = os.getloadavg()
    rep = int(os.environ.get("SPARK_GRAFT_BENCH_REP", "1"))
    spark = get_spark(
        "kmertools-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    timings: dict[str, float] = {}
    t_all = time.time()

    t = transcripts_df(spark, sf_dir)
    if rep > 1:
        # deterministic scale-up: replicate conversations (preserves the
        # per-conv turn/skew profile; used by bench_scaling.py)
        reps = spark.range(rep).select(F.col("id").alias("__r"))
        t = t.crossJoin(reps).withColumn(
            "conv_id", F.concat_ws("_r", "conv_id", "__r")
        ).drop("__r")
    t = t.cache()
    n_turns = t.count()
    log(f"input: {n_turns} turns from {sf_dir} (rep={rep}) on local[{cpus}]")

    # partition the doc corpus by size, as a multi-file scan would be
    # (over-splitting 5k docs across 32 workers just measures per-task
    # overhead; at real scale maxPartitionBytes does this automatically)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    doc_parts = max(1, min(cpus, n_docs // 2000))
    if doc_parts > 1:
        docs = docs.repartition(doc_parts)

    # Fleet warm-up: every python worker must import the kernel modules
    # (numpy + kmertools_spark, ~2s cold) BEFORE the timed legs, or the
    # first leg measures a 1-per-core import stampede instead of
    # compute. Each warm pass spreads a small slice over `cpus`
    # partitions so all workers load the module the leg will use; the
    # tiny end-to-end dedup run additionally JIT-warms the join codegen.
    force(backfill_features_stream(t.limit(1024).repartition(cpus), k=4, n_turns=3))
    force(
        lsh_candidate_pairs(
            minhash_signatures(docs.limit(256).repartition(cpus)), bands=4
        )
    )

    best = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_BEST", "2")))

    def timed(name: str, leg) -> None:
        took = []
        for _ in range(best):
            t0 = time.time()
            leg()
            took.append(time.time() - t0)
        timings[name] = min(took)
        log(f"{name}: best {timings[name]:.2f}s of {[round(x, 2) for x in took]}")

    timed("backfill", lambda: force(backfill_features_stream(t, k=4, n_turns=3)))

    p = probes_df(spark, sf_dir).distinct()
    # force_cols, not count: the as-of result is a Window projection —
    # count() prunes the window AND its sort, timing nothing (r4 find)
    timed(
        "asof",
        lambda: force_cols(
            asof_join(
                t.withColumn("text_len", F.length("text")),
                p,
                value_cols=("turn_idx", "text_len"),
            )
        ),
    )

    def counts_cov_leg():
        counts = global_kmer_counts(t, k=4)
        # broadcast-path coverage is a scalar-UDF projection: force the
        # histogram column itself (count() would prune the UDF)
        force_cols(coverage_features(t, counts, k=4, bin_size=4, bin_count=8))

    timed("counts_cov", counts_cov_leg)

    # the two most kernel-bound gate queries (q26/q29), tracked
    # round-over-round; warm slices spread over all workers first so the
    # timed legs measure the kernels, not per-core module imports
    from kmertools_spark.functions import cgr_points, exploded_minimisers

    warm = t.limit(1024).repartition(cpus)
    clean_expr = F.regexp_replace("text", "[^ACGTUacgtu]", "")
    force(exploded_minimisers(warm, w=8, m=5))
    warm.select(cgr_points(1.0)(clean_expr).alias("cgr")).agg(
        F.sum(F.size("cgr"))
    ).collect()

    timed("minruns", lambda: force(exploded_minimisers(t, w=8, m=5)))

    timed(
        "cgr",
        lambda: t.select(cgr_points(1.0)(clean_expr).alias("cgr"))
        .agg(F.sum(F.size("cgr")))
        .collect(),
    )

    # signatures are cached before the banding self-join — otherwise the
    # join's two branches each recompute the minhash UDF over the whole
    # corpus (the shape any real pipeline persists)
    def dedup_leg():
        sigs = minhash_signatures(docs).cache()
        force(sigs)
        force(lsh_candidate_pairs(sigs, bands=4))
        sigs.unpersist()

    # one untimed full-size pass first: this leg's banding self-join
    # takes ~2 executions for whole-stage codegen/JIT to settle
    # (measured r5: reps [4.2, 4.1, 2.1, 2.1, 2.3, 1.9] — best-of-2
    # alone records the warm-up regime, which once read as inverse
    # scaling in the r4 table)
    dedup_leg()
    timed("dedup", dedup_leg)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("ann", lambda: force(cosine_topk(emb, emb.where("vec_id < 8"), k=5)))

    # the training-prep pipeline legs (r3 VERDICT item 4): packing's
    # distributed prefix sum alone, then the full normalize -> filter ->
    # stratified-sample -> pack composition (q46/q52 shapes)
    from kmertools_spark.operators import pack_documents, training_prep

    # greedy vocab tokenizer (vectorized kernel, r4 VERDICT item 4):
    # count() is valid forcing — mapInPandas determines cardinality
    from kmertools_spark.functions import vocab_token_counts
    from kmertools_spark.functions.tokenize import DEMO_VOCAB

    force(vocab_token_counts(docs.limit(256).repartition(cpus), DEMO_VOCAB))  # warm
    timed("tokenize", lambda: force(vocab_token_counts(docs, DEMO_VOCAB)))

    timed("pack", lambda: force(pack_documents(docs, capacity=256)))
    timed(
        "prep",
        lambda: force(
            training_prep(
                docs,
                capacity=256,
                rates={"en": 0.8},
                default_rate=0.3,
            )
        ),
    )

    total = time.time() - t_all
    spark.stop()

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline suite wall time (turns/sec in extras.turns_per_sec)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extras": {
            "n_turns": n_turns,
            "cpus": cpus,
            "turns_per_sec": round(n_turns / timings["backfill"], 1),
            "total_wall_sec": round(total, 3),
            "best_of": best,
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
