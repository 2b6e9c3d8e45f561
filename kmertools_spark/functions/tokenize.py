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

Scale shape: the vocab is shipped ONCE per executor via
SparkContext.broadcast (never per task, never per row); the stage is a
mapInPandas projection — no shuffle, and the engine's column-pruning
invariant applies (the input is .select()ed to (id, text) immediately
before the Python boundary).
"""

from __future__ import annotations

from typing import Iterable, Iterator

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
    twin used by tests as the oracle)."""
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
    vocab_set = {t for t in vocab if t}
    if not vocab_set:
        raise ValueError("vocab must contain at least one non-empty token")
    max_len = max(len(t) for t in vocab_set)
    bc = df.sparkSession.sparkContext.broadcast((vocab_set, max_len))
    schema = StructType(
        [StructField(id_col, LongType()), StructField(out_col, LongType())]
    )

    def count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vs, ml = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    out_col: [
                        greedy_token_count(t if isinstance(t, str) else "", vs, ml)
                        for t in pdf[text_col]
                    ],
                }
            )

    # select() before mapInPandas: the Python boundary blocks column
    # pruning, so only (id, text) may cross it
    return (
        df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col))
        .mapInPandas(count_batches, schema)
    )
