"""Scaling-efficiency evidence: run bench.py at N and 4N local cores.

The sandbox stand-in for the north rule's N -> 4N executor criterion
(BASELINE.json): same job, same input, local[8] vs local[32]; report
both throughputs + efficiency into BENCH/BASELINE.md.

Usage: python bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get('SPARK_GRAFT_SCALE_N', '2'))
N4 = 4 * N  # both within physical cores: the honest N->4N executor proxy


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    env.setdefault("SPARK_GRAFT_BENCH_REP", "20")
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
    tp_n = r_n["extras"]["turns_per_sec"]
    tp_4n = r_4n["extras"]["turns_per_sec"]
    # efficiency: achieved speedup / ideal speedup (4x)
    eff = (tp_4n / tp_n) / (N4 / N)
    rows = r_n["extras"]["n_turns"]
    md = f"""# BENCH — measured numbers (scaling evidence)

Same job (bench.py backfill: sessionize + per-turn composition + rolling
3-turn vectors, full materialization via count) on the same input, at two
parallelism levels — the sandbox evidence for the north rule's N -> 4N
executor scaling criterion.

| run | parallelism | input turns | backfill wall s | turns/sec | scaling efficiency |
|---|---|---|---|---|---|
| backfill @ N  | local[{N}]  | {rows} | {r_n['queries']['backfill']} | {tp_n} | — |
| backfill @ 4N | local[{N4}] | {rows} | {r_4n['queries']['backfill']} | {tp_4n} | {eff:.3f} |

Full per-query timings (seconds):

| query | local[{N}] | local[{N4}] |
|---|---|---|
""" + "\n".join(
        f"| {q} | {r_n['queries'][q]} | {r_4n['queries'][q]} |"
        for q in r_n["queries"]
    ) + f"""

Input: {sf_dir}. Efficiency = (turns/sec at 4N / turns/sec at N) / 4.

Small-leg caveat (r4 VERDICT item 5, measured r5): the dedup/ann/pack/
prep legs run over the tiny side tables (5,000 docs / 2,000 embeddings
at sf0.1), where wall time is fixed overhead (task rounds, python
worker startup, JIT) rather than data work — their N vs 4N deltas are
noise of +-0.2s, not plan behavior. The r4 table's apparent dedup
inversion (5.4s -> 12.8s) was the JIT warm-up regime: isolated
6-rep runs converge to ~2.0s at local[8] vs ~2.4s at local[2]
(no inversion); bench.py now runs one untimed full-size dedup pass
before timing. Scaling conclusions should be read off the
backfill/cgr/counts_cov/minruns legs, which carry real data volume.
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
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
