"""Pluggable tokenizer plumbing for sequence packing (r3 VERDICT
item 6).

pack_documents(tokens_col=...) already accepts any precomputed token
count; this module supplies the reference integration: a deterministic
greedy longest-match ("WordPiece/BPE-style") tokenizer over a
USER-SUPPLIED vocabulary, run as a mapInPandas stage so the packing
window map reflects real token budgets instead of whitespace counts.

No tokenizer library ships with the engine — the vocab is data the
user owns (e.g. the `vocab.json` of any public BPE/HF tokenizer,
loaded to a dict and passed in). The greedy longest-match rule is the
deterministic core shared by WordPiece and by BPE inference over a
merged vocab; unmatched characters fall back to one token each (the
byte-fallback convention), so every text tokenizes to a finite count.

The batch kernel is fully vectorized (r4 VERDICT item 4 — the former
per-character Python loop is retained only as the pytest oracle,
``greedy_token_count``). Formulation:

1. the batch's texts plus the vocab tokens are concatenated into ONE
   code-point array (utf-32), so token packs and window packs live in
   the same identifier space;
2. every position gets a dense vocab-alphabet id; substring identity
   for each vocab length l is a base-2^bits integer pack built by
   suffix-array-style doubling (levels identify lengths 2^k; arbitrary
   l = overlapping pair of level floor(log2 l)), rank-compressed via
   np.unique only when a pack would overflow 62 bits (long tokens);
3. per length, windows match tokens via searchsorted on the sorted
   token packs; matches whose window would cross a document boundary
   are masked off, so no separator chars are needed (texts containing
   NUL, or NUL inside vocab tokens, need no special-casing);
4. the greedy scan is a functional-graph jump chain (next = i + match
   length, else i + 1); counts for every position at once come from
   pointer doubling (O(N log N) vector ops), and a document's token
   count is the count-to-end difference between its start and the next
   document's start — exact because masked matches never cross a
   boundary, so every chain passes through every downstream doc start.

Scale shape: the vocab is shipped ONCE per executor via
SparkContext.broadcast (never per task, never per row); the stage is a
mapInPandas projection — no shuffle, and the engine's column-pruning
invariant applies (the input is .select()ed to (id, text) immediately
before the Python boundary).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


# the demo vocabulary pinned by gate q55 (shared with the DuckDB
# recursive-CTE oracle in oracle/sql_queries.py — both sides tokenize
# with the SAME table; ASCII only, no quotes)
DEMO_VOCAB: tuple[str, ...] = (
    "the", " ", "and", "of", "ing", "tion", "er", "an", "re", "he",
    "in", "on", "at", "en", "nd", "ti", "es", "or",
    "a", "e", "i", "o", "u", "s", "t", "n",
)


def greedy_token_count(text: str, vocab: set[str], max_len: int) -> int:
    """Number of greedy longest-match tokens for one text (pure python
    twin used by tests as the oracle for the vectorized kernel)."""
    i, n, count = 0, len(text), 0
    while i < n:
        for length in range(min(max_len, n - i), 0, -1):
            if text[i : i + length] in vocab:
                i += length
                break
        else:
            i += 1  # byte-fallback: unknown char is its own token
        count += 1
    return count


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def batch_greedy_token_counts(
    texts: list[str], vocab_list: list[str], max_len: int
) -> np.ndarray:
    """Vectorized greedy longest-match token counts for a batch of
    texts (int64 array, one count per text). Exact twin of
    ``greedy_token_count`` (hypothesis-tested), no per-character
    Python in the hot path."""
    ntex = len(texts)
    if ntex == 0:
        return np.zeros(0, dtype=np.int64)
    parts = list(texts) + list(vocab_list)
    plens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
    offs = np.concatenate([[0], np.cumsum(plens)])
    codes = _codes("".join(parts))
    N = codes.size
    if N == 0:
        return np.zeros(ntex, dtype=np.int64)

    # dense vocab-alphabet ids: 1..A for chars any token uses, 0 else
    alph = np.unique(_codes("".join(vocab_list)))
    pos = np.searchsorted(alph, codes)
    np.clip(pos, 0, max(alph.size - 1, 0), out=pos)
    ids = np.where(alph[pos] == codes, pos + 1, 0).astype(np.int64)
    bits = max(1, int(np.ceil(np.log2(alph.size + 1))))

    # levels[k] identifies substrings of length 2^k in `width` bits
    levels: dict[int, tuple[np.ndarray, int]] = {0: (ids, bits)}

    def _compressed(k: int) -> tuple[np.ndarray, int]:
        arr, w = levels[k]
        if 2 * w > 62:
            _, arr = np.unique(arr, return_inverse=True)
            arr = arr.astype(np.int64)
            w = max(1, int(np.ceil(np.log2(arr.max() + 2))))
            levels[k] = (arr, w)
        return arr, w

    k, span = 0, 1
    while span * 2 <= max_len:
        arr, w = _compressed(k)
        up = arr << w
        up[: N - span] |= arr[span:]
        levels[k + 1] = (up, 2 * w)
        k += 1
        span *= 2

    def packs(l: int) -> np.ndarray:
        kk = l.bit_length() - 1
        if (1 << kk) == l:
            return levels[kk][0]
        a = 1 << kk
        arr, w = _compressed(kk)
        p = arr << w
        p[: N - (l - a)] |= arr[l - a :]
        return p

    by_len: dict[int, list[int]] = {}
    for t, s in zip(vocab_list, offs[ntex:]):
        by_len.setdefault(len(t), []).append(int(s))

    # boundary mask: end-of-part for every position (no separators —
    # a match is simply forbidden from crossing a part boundary)
    ends = np.repeat(offs[1:], plens)
    posarr = np.arange(N, dtype=np.int64)

    L = np.zeros(N, dtype=np.int64)
    for l in sorted(by_len):
        if l == 0 or l > N:
            continue
        pk = packs(l)
        tvals = np.unique(pk[np.array(by_len[l], dtype=np.int64)])
        j = np.searchsorted(tvals, pk)
        np.clip(j, 0, tvals.size - 1, out=j)
        match = tvals[j] == pk
        match &= posarr + l <= ends
        L = np.where(match, l, L)

    # greedy jump chain + pointer doubling; node N is the absorber
    step = np.where(L > 0, L, 1)
    nxt = np.concatenate([posarr + step, [N]])
    cnt = np.ones(N + 1, dtype=np.int64)
    cnt[N] = 0
    rounds = int(np.ceil(np.log2(N + 1)))
    for _ in range(rounds):
        cnt += cnt[nxt]
        nxt = nxt[nxt]
    # tokens in doc d = count-to-end(start_d) - count-to-end(start_{d+1})
    return cnt[offs[: ntex + 1]][:-1] - cnt[offs[1 : ntex + 1]]


def vocab_token_counts(
    df: DataFrame,
    vocab: Iterable[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_tok",
) -> DataFrame:
    """(id, text) -> (id, n_tok) under a user-supplied vocabulary.

    Feed the result straight into the packer::

        counts = vocab_token_counts(docs, my_vocab)
        windows = pack_documents(counts, capacity=2048, tokens_col="n_tok")

    The gate queries (q46/q52) pin the engine's whitespace counter and
    are unaffected; this is the opt-in real-tokenizer path.
    """
    vocab_list = sorted({t for t in vocab if t})
    if not vocab_list:
        raise ValueError("vocab must contain at least one non-empty token")
    max_len = max(len(t) for t in vocab_list)
    bc = df.sparkSession.sparkContext.broadcast((vocab_list, max_len))
    schema = StructType(
        [StructField(id_col, LongType()), StructField(out_col, LongType())]
    )

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vl, ml = bc.value
        for pdf in batches:
            texts = [t if isinstance(t, str) else "" for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    out_col: batch_greedy_token_counts(texts, vl, ml),
                }
            )

    # select() before mapInPandas: the Python boundary blocks column
    # pruning, so only (id, text) may cross it
    return (
        df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col))
        .mapInPandas(count_batches, schema)
    )
