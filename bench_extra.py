"""Auxiliary r7 benchmarks — NOT part of the frozen driver contract.

bench.py is frozen for measurement (the driver re-runs the round-start
copy), so everything extra lives here:

  * host-health probe: CPU steal%% and spin throughput measured around
    every timing block. On this shared microVM, loadavg only counts OUR
    runnable threads — external interference shows up as steal/cycle
    starvation, which once inflated a whole suite 1.6x with loadavg
    looking "normal" (VERDICT r6 item 6 asked for self-marking bench
    artifacts; the frozen bench.py cannot grow the field, so the probe
    lives here and in OPTIMIZATION_r07.md's protocol).
  * stage decomposition of the dedup leg (signatures vs banding pairs),
    noop-style forcing via count on cardinality-determining plans.
  * the PRODUCTION dedup regime (VERDICT r6 item 3): dedup_keep with
    max_bucket=256 over the 100k- and 200k-doc corpora — the star-capped
    path the 100 TB plan depends on, which the gate's uncapped q42
    cannot time. A doubling ratio near 2x (vs the uncapped leg's ~3x)
    is the evidence the cap linearizes the flood regime.

Usage: python bench_extra.py [--docs 100000 200000] [--best 3]
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def host_probe(seconds: float = 2.0) -> dict:
    """CPU steal%% + single-thread spin rate over a short window."""

    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    a = snap()
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        for _ in range(100000):
            x += 1
    dt = time.time() - t0
    b = snap()
    d = [y - z for z, y in zip(a, b)]
    tot = max(1, sum(d))
    return {
        "steal_pct": round(100.0 * d[7] / tot, 2),
        "spin_mops": round(x / dt / 1e6, 1),
        "loadavg1": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="*", default=[100000, 200000])
    ap.add_argument("--best", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

    from kmertools_spark.operators import (
        dedup_keep,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kmertools_spark.session import get_spark
    from kmertools_spark.sources.bench_corpus import ensure_bench_corpus

    for n_docs in args.docs:
        # fresh session per corpus size: the repeated dedup_keep runs
        # leave localCheckpoint label blocks behind (they free only on
        # JVM GC of the RDD handles), and a prior size's accumulation
        # once drove a later broadcast build into
        # notEnoughMemoryToBuildAndBroadcastTableError
        spark = get_spark(
            "kmertools-bench-extra",
            master=f"local[{args.cpus}]",
            shuffle_partitions=max(args.cpus, 8),
        )

        def best_of(fn, n):
            best = float("inf")
            for _ in range(n):
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return round(best, 3)

        corpus_root = os.environ.get(
            "SPARK_GRAFT_BENCH_CORPUS", os.path.join(repo, ".bench_corpus")
        )
        # emb count pinned to the bench.py default so the 100k corpus dir
        # is shared with the main bench instead of generated twice
        corpus_dir = ensure_bench_corpus(corpus_root, n_docs, 50000)
        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        docs.count()

        # warm python workers / JIT (two passes — the banding agg needs ~2).
        # sigs timing runs BEFORE the long-lived cache below, or the
        # cache manager would serve it the cached plan and time a read.
        minhash_signatures(docs).count()

        def sigs_stage():
            s = minhash_signatures(docs).cache()
            s.count()
            s.unpersist()

        sigs_stage()
        probe_before = host_probe()
        t_sigs = best_of(sigs_stage, args.best)

        sigs_w = minhash_signatures(docs).cache()
        sigs_w.count()
        lsh_candidate_pairs(sigs_w, bands=4).count()
        lsh_candidate_pairs(sigs_w, bands=4).count()
        dedup_keep(docs, max_bucket=256).count()

        t_pairs = best_of(
            lambda: lsh_candidate_pairs(sigs_w, bands=4).count(), args.best
        )
        # two cap levels: 256 is the production default (a NO-OP at
        # these corpus sizes — max bucket is 85 at 100k / 170 at 200k
        # docs, so pair sets are identical and this times the cap's
        # overhead); 64 ENGAGES at both sizes, so its pair-count
        # doubling ratio is the evidence the star cap linearizes the
        # flood regime that makes the uncapped leg superlinear.
        t_pairs_capped = {}
        n_pairs_capped = {}
        for cap in (256, 64):
            t_pairs_capped[cap] = best_of(
                lambda: lsh_candidate_pairs(
                    sigs_w, bands=4, max_bucket=cap
                ).count(),
                args.best,
            )
            n_pairs_capped[cap] = lsh_candidate_pairs(
                sigs_w, bands=4, max_bucket=cap
            ).count()
        # the production end-to-end regime: capped pipeline through
        # Jaccard verify + components + keep list
        t_keep_capped = best_of(
            lambda: dedup_keep(docs, max_bucket=256).count(), args.best
        )
        n_pairs = lsh_candidate_pairs(sigs_w, bands=4).count()
        sigs_w.unpersist()
        probe_after = host_probe()

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "cpus": args.cpus,
                    "best_of": args.best,
                    "sigs_s": t_sigs,
                    "pairs_uncapped_s": t_pairs,
                    "pairs_capped256_s": t_pairs_capped[256],
                    "pairs_capped64_s": t_pairs_capped[64],
                    "dedup_keep_capped256_s": t_keep_capped,
                    "n_pairs_uncapped": n_pairs,
                    "n_pairs_capped256": n_pairs_capped[256],
                    "n_pairs_capped64": n_pairs_capped[64],
                    "host_before": probe_before,
                    "host_after": probe_after,
                }
            ),
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()
