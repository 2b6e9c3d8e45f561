"""Rolling / session-to-date composition-vector windows per conversation.

The per-window work is O(1): per-turn count vectors are prefix-summed
once per conversation and each window is a difference of two prefix
rows — the windowed analog of the reference's incremental rolling
encode (X6, kmer/src/kmer.rs:93-95). Runs in ``applyInPandas`` with the
whole kernel vectorized over the conversation's turns.

Skew handling (north rule): ``rolling_turn_vectors`` supports *chunked*
execution — conversations are split into fixed-size turn blocks with a
(window-1)-row carry replicated into the next block, so the group key
becomes (conv_id, block) and a million-turn conversation spreads over
many tasks instead of one. This is the salted-repartition analog of the
reference's explicit `min_mer % n_parts` sharding (X2,
counter/src/lib.rs:127).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .timeutil import epoch_ms
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.composition import _pos_map
from ..oracle.kernels import composition_matrix

_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("vec", ArrayType(DoubleType())),
    ]
)


def _window_matrix(
    pdf: pd.DataFrame,
    k: int,
    mode: str,
    n_turns: int,
    time_ms: int,
    norm: bool,
) -> np.ndarray:
    """Per-turn rolling window vectors for ONE conversation slice,
    ordered by turn_idx. mode in {turns, time, session}."""
    pos_map, _, kcount = _pos_map(k)
    counts = composition_matrix(
        pdf["text"].tolist(), k, canonical=True, norm=False, pos_map=pos_map, kcount=kcount
    )
    prefix = np.vstack([np.zeros((1, counts.shape[1])), np.cumsum(counts, axis=0)])
    t = len(pdf)
    if mode == "turns":
        lo = np.maximum(np.arange(t) - (n_turns - 1), 0)
    elif mode == "time":
        ts = pdf["__ts_ms"].to_numpy(dtype=np.int64)
        # window = rows with ts in [ts_i - time_ms, ts_i] (inclusive,
        # rangeBetween(-time_ms, 0) semantics); ts is non-decreasing
        lo = np.searchsorted(ts, ts - time_ms, side="left")
    elif mode == "session":
        sess = pdf["session_seq"].to_numpy()
        # first row index of each session (session_seq non-decreasing)
        first = np.zeros(t, dtype=np.int64)
        if t:
            change = np.flatnonzero(np.diff(sess)) + 1
            starts = np.concatenate(([0], change))
            first = starts[np.searchsorted(starts, np.arange(t), side="right") - 1]
        lo = first
    else:  # pragma: no cover
        raise ValueError(mode)
    win = prefix[1 + np.arange(t)] - prefix[lo]
    if norm:
        win = win / np.maximum(1.0, win.sum(axis=1))[:, None]
    return win


def rolling_turn_vectors(
    df: DataFrame,
    k: int = 4,
    mode: str = "turns",
    n_turns: int = 3,
    time_seconds: float = 600.0,
    norm: bool = True,
    chunk: int | None = 4096,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """(conv_id, turn_idx, vec): rolling composition vector per turn.

    mode='turns':   last ``n_turns`` turns (current inclusive)
    mode='time':    turns with ts within ``time_seconds`` before current
    mode='session': session-to-date (requires/derives session_seq via
                    the ``gap_seconds`` inactivity rule)

    ``chunk`` bounds the rows a single task must hold for mode='turns'
    (carry replication); None groups whole conversations.
    """
    time_ms = int(time_seconds * 1000)
    need = ["conv_id", "turn_idx", "text"]
    work = df
    if mode == "time":
        work = work.withColumn("__ts_ms", epoch_ms("ts"))
        need.append("__ts_ms")
    if mode == "session":
        from .sessionize import sessionize

        if "session_seq" not in work.columns:
            work = sessionize(work, gap_seconds=gap_seconds)
        need.append("session_seq")
    work = work.select(*need)

    chunked = chunk is not None and mode == "turns"
    if chunked:
        # block id + replicate the last (n_turns-1) rows of each block
        # into the next block as carry (emit=False there)
        blk = (F.col("turn_idx") / chunk).cast("long")
        own = work.withColumn("__blk", blk).withColumn("__emit", F.lit(True))
        carry = (
            work.withColumn("__blk", blk + 1)
            .withColumn("__emit", F.lit(False))
            .where((F.col("turn_idx") % chunk) >= chunk - (n_turns - 1))
        )
        work = own.unionByName(carry) if n_turns > 1 else own
        group_keys = ["conv_id", "__blk"]
    else:
        group_keys = ["conv_id"]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort").reset_index(drop=True)
        win = _window_matrix(pdf, k, mode, n_turns, time_ms, norm)
        out = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "vec": list(win),
            }
        )
        if "__emit" in pdf.columns:
            out = out[pdf["__emit"].to_numpy()]
        return out

    return work.groupBy(*group_keys).applyInPandas(fn, _OUT_SCHEMA)
