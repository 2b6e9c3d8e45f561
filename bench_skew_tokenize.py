"""Whale-doc crossover measurement for the tokenizer count strategies
(r5 VERDICT item 7).

batch_greedy_token_counts builds one greedy-jump chain per batch and
then counts tokens per document with one of two exact strategies:

  lanes     one lane per doc, one ntex-wide gather per token rank —
            total random accesses == total tokens. Wins on the usual
            corpus shape (many docs, all short relative to the batch).
  doubling  pointer doubling over the whole chain — O(N log mx) full-
            array gathers, immune to a single whale doc dominating the
            lane round count (rounds == longest doc's token count).

The kernel picks via a measured cost model
(mx * (ntex + 4096) < 2 * rounds * (N + 4096), functions/tokenize.py);
this probe times BOTH strategies on identical inputs at two batch
shapes — a uniform 5k x 2KB corpus and the same corpus plus one 10 MB
whale — and reports whether the model picked the measured winner on
each. Kernel-level (no Spark): the branch runs per Arrow batch inside
mapInPandas, so the honest measurement is the kernel itself.

Prints ONE JSON line; recorded in BENCH/BASELINE.md. Env:
SPARK_GRAFT_TOKSKEW_DOCS (default 5000 small docs),
SPARK_GRAFT_TOKSKEW_WHALE (default 10_000_000 chars),
SPARK_GRAFT_BENCH_BEST (default 3 reps, best taken).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np

    from kmertools_spark.functions.tokenize import (
        DEMO_VOCAB,
        batch_greedy_token_counts,
        lane_walk_wins,
    )

    n_docs = int(os.environ.get("SPARK_GRAFT_TOKSKEW_DOCS", "5000"))
    whale_n = int(os.environ.get("SPARK_GRAFT_TOKSKEW_WHALE", "10000000"))
    best_of = int(os.environ.get("SPARK_GRAFT_BENCH_BEST", "3"))
    vocab = sorted(DEMO_VOCAB)
    max_len = max(len(t) for t in vocab)

    rng = random.Random(0xC0FFEE)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    small = [
        "".join(rng.choice(alphabet) for _ in range(2048)) for _ in range(n_docs)
    ]
    whale = "".join(rng.choice(alphabet) for _ in range(whale_n))
    shapes = {"uniform": small, "whale": small + [whale]}

    def model_pick(texts: list[str]) -> str:
        # the kernel's OWN predicate, with the kernel's own inputs:
        # mx spans texts AND vocab tokens (the jump chain covers both),
        # n_codes is the full concatenated length
        parts = list(texts) + list(vocab)
        ntex = len(texts)
        mx = max((len(p) for p in parts), default=1)
        n_codes = sum(len(p) for p in parts)
        return "lanes" if lane_walk_wins(ntex, mx, n_codes) else "doubling"

    # warm pass: arena buffers + numpy code paths (CLAUDE.md invariant —
    # first-touch page faults would otherwise dominate the first rep)
    for strat in ("lanes", "doubling"):
        batch_greedy_token_counts(shapes["whale"], vocab, max_len, _force_strategy=strat)

    t_res: dict[str, float] = {}
    checks: dict[str, object] = {}
    for shape_name, texts in shapes.items():
        outs = {}
        for strat in ("lanes", "doubling"):
            best = float("inf")
            for _ in range(best_of):
                t0 = time.time()
                out = batch_greedy_token_counts(
                    texts, vocab, max_len, _force_strategy=strat
                )
                best = min(best, time.time() - t0)
            outs[strat] = out
            t_res[f"{shape_name}_{strat}"] = round(best, 3)
        if not np.array_equal(outs["lanes"], outs["doubling"]):
            raise AssertionError(f"strategy mismatch on {shape_name}")
        picked = model_pick(texts)
        winner = min(("lanes", "doubling"), key=lambda s: t_res[f"{shape_name}_{s}"])
        checks[f"{shape_name}_model_picked"] = picked
        checks[f"{shape_name}_measured_winner"] = winner
        checks[f"{shape_name}_model_correct"] = picked == winner
        print(
            f"{shape_name}: lanes={t_res[f'{shape_name}_lanes']}s "
            f"doubling={t_res[f'{shape_name}_doubling']}s "
            f"model->{picked} measured->{winner}",
            file=sys.stderr,
            flush=True,
        )

    out = {
        "metric": "tokenizer whale-doc strategy crossover (sec per strategy x shape)",
        "value": t_res["whale_lanes"] - t_res["whale_doubling"],
        "unit": "sec",
        "queries": t_res,
        "sf": f"docs={n_docs}x2048,whale={whale_n}",
        "extras": {"best_of": best_of, **checks},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
