"""Scaling-efficiency evidence: run bench.py at N and 4N local cores.

The sandbox stand-in for the north rule's N -> 4N executor criterion
(BASELINE.json): same job, same input, local[8] vs local[32]; report
both throughputs + efficiency into BENCH/BASELINE.md.

Self-adjudicating protocol (r7, VERDICT r6 item 1): ONE full-suite pair
provides the per-query table, then SPARK_GRAFT_SCALE_PAIRS - 1 (default
3 - 1 = 2) additional backfill-only pairs run interleaved
(N, 4N, N, 4N, ...); the recorded headline efficiency is the MEDIAN
over all pairs, with per-pair values shown in the AUTOGEN table. A
single pair on this shared box carries ~±25% run-to-run spread (the
r5/r6 adjudication pain); the median of >= 3 interleaved pairs
self-adjudicates without prose.

Usage: python bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

N = int(os.environ.get('SPARK_GRAFT_SCALE_N', '2'))
N4 = 4 * N  # both within physical cores: the honest N->4N executor proxy
PAIRS = max(1, int(os.environ.get('SPARK_GRAFT_SCALE_PAIRS', '3')))


def run(cpus: int, sf_dir: str, legs: str | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    env.setdefault("SPARK_GRAFT_BENCH_REP", "20")
    # one visit (= cold+warm sample pair) per leg: scaling runs compare
    # throughput across parallelism levels, and the low-parallelism side
    # pays minutes per execution — best-of-visits adds nothing here
    env.setdefault("SPARK_GRAFT_BENCH_BEST", "1")
    if legs:
        env["SPARK_GRAFT_BENCH_LEGS"] = legs
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r_n = run(N, sf_dir)
    r_4n = run(N4, sf_dir)
    pair_rows = [(
        r_n["extras"]["turns_per_sec"],
        r_4n["extras"]["turns_per_sec"],
        "full suite",
    )]
    # additional interleaved backfill-only pairs for the median — the
    # headline leg only, so each extra pair costs ~a minute, not the
    # whole low-parallelism suite
    for _ in range(PAIRS - 1):
        pn = run(N, sf_dir, legs="backfill")
        p4 = run(N4, sf_dir, legs="backfill")
        pair_rows.append((
            pn["extras"]["turns_per_sec"],
            p4["extras"]["turns_per_sec"],
            "backfill only",
        ))
    effs = [(t4 / tn) / (N4 / N) for tn, t4, _ in pair_rows]
    eff = statistics.median(effs)
    tp_n = r_n["extras"]["turns_per_sec"]
    tp_4n = r_4n["extras"]["turns_per_sec"]
    rows = r_n["extras"]["n_turns"]
    pair_table = "\n".join(
        f"| {i + 1} ({kind}) | {tn:.1f} | {t4:.1f} | {e:.3f} |"
        for i, ((tn, t4, kind), e) in enumerate(zip(pair_rows, effs))
    )
    md = f"""# BENCH — measured numbers (scaling evidence)

Same job (bench.py backfill: sessionize + per-turn composition + rolling
3-turn vectors, full materialization via count) on the same input, at two
parallelism levels — the sandbox evidence for the north rule's N -> 4N
executor scaling criterion. The headline efficiency is the MEDIAN over
{len(pair_rows)} interleaved pairs (per-pair values below); a single
pair on this shared box carries ~±25% run-to-run spread.

| run | parallelism | input turns | backfill turns/sec (pair 1) | median scaling efficiency |
|---|---|---|---|---|
| backfill @ N  | local[{N}]  | {rows} | {tp_n} | — |
| backfill @ 4N | local[{N4}] | {rows} | {tp_4n} | **{eff:.3f}** |

Per-pair efficiencies (interleaved N / 4N executions):

| pair | turns/sec @local[{N}] | turns/sec @local[{N4}] | efficiency |
|---|---|---|---|
{pair_table}

Full per-query timings (seconds, pair 1):

| query | local[{N}] | local[{N4}] |
|---|---|---|
""" + "\n".join(
        f"| {q} | {r_n['queries'][q]} | {r_4n['queries'][q]} |"
        for q in r_n["queries"]
    ) + f"""

Input: {sf_dir}. Efficiency = (turns/sec at 4N / turns/sec at N) / 4.

Leg-volume note (updated r6): the doc legs run over the right-sized
synthetic corpus (default 100k docs / 50k embeddings,
sources/bench_corpus.py), so dedup/prep/ann/tokenize now carry real
data volume; pack remains fixed-overhead-bound by design (~24 B/doc
shuffled). The backfill leg on {rows} replicated turns is the headline
scaling signal. Timing protocol: one interleaved visit per leg
(cold+warm sample pair, min reported), between-leg JVM GC — see
bench.py's docstring.
"""
    os.makedirs("BENCH", exist_ok=True)
    begin = "<!-- AUTOGEN:SCALING:BEGIN (bench_scaling.py rewrites this block) -->"
    end_m = "<!-- AUTOGEN:SCALING:END -->"
    path = "BENCH/BASELINE.md"
    block = begin + "\n" + md + end_m
    if os.path.exists(path):
        cur = open(path).read()
        if begin in cur and end_m in cur:
            pre = cur[: cur.index(begin)]
            post = cur[cur.index(end_m) + len(end_m):]
            out_doc = pre + block + post
        else:
            out_doc = block + "\n" + cur
    else:
        out_doc = block
    with open(path, "w") as f:
        f.write(out_doc)
    print(json.dumps({
        "n": {"cpus": N, "turns_per_sec": tp_n},
        "n4": {"cpus": N4, "turns_per_sec": tp_4n},
        "pairs": [
            {"tp_n": tn, "tp_4n": t4, "kind": kind, "eff": round(e, 3)}
            for (tn, t4, kind), e in zip(pair_rows, effs)
        ],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
