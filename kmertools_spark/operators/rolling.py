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

from .timeutil import epoch_ms, guard_null_ts
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

def _carry_blocks(df: DataFrame, chunk: int, n_turns: int) -> DataFrame:
    """Assign position-based chunk blocks with an (n_turns-1)-row carry.

    Block id derives from a row_number over (conv_id ORDER BY turn_idx),
    NOT from raw turn_idx values, so filtered/sparse inputs (e.g. a
    user-turns-only subset) chunk correctly: the carry rows are the
    previous (n_turns-1) ROWS of the conversation regardless of
    turn_idx gaps (round-1 advice — value-derived blocks silently
    dropped boundary carries on sparse inputs). Carry rows are emitted
    into the next block too (emit=False there); explode() keeps this a
    single scan.
    """
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("conv_id").orderBy("turn_idx")) - 1
    df = df.withColumn("__rn", rn)
    blk = F.expr(f"__rn div {chunk}")
    # row rn is needed by every block whose first row reaches back to it:
    # blocks blk .. (rn + n_turns - 1) div chunk. For n_turns - 1 <=
    # chunk this is the classic next-block carry; for windows WIDER than
    # a chunk it replicates as many blocks ahead as the window needs
    # (code-review r4: the two-block special case silently truncated
    # windows when n_turns - 1 > chunk)
    last_needed = F.expr(f"(__rn + {n_turns - 1}) div {chunk}")
    return (
        df.withColumn("__own", blk)
        .withColumn("__blk", F.explode(F.sequence(blk, last_needed)))
        .withColumn("__emit", F.col("__own") == F.col("__blk"))
        .drop("__own", "__rn")
    )


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
        guard_null_ts(pdf["__ts_ms"], "rolling_turn_vectors(mode='time')")
        ts = pdf["__ts_ms"].to_numpy(dtype=np.int64)
        # window = rows of this conversation with ts in
        # [ts_i - time_ms, ts_i], ROW-bounded at the current turn: an
        # equal-ts peer row AFTER the current turn is EXCLUDED (the
        # leakage-safe rule the tests pin). This intentionally differs
        # from SQL RANGE BETWEEN ... AND CURRENT ROW, which includes
        # all frame peers sharing the current ts — do not pair this
        # operator with a RANGE-framed SQL twin (code-review r5).
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
        work = _carry_blocks(work, chunk, n_turns)
        group_keys = ["conv_id", "__blk"]
    else:
        group_keys = ["conv_id"]
    # explicit exchange on the grouping keys: groupBy's own shuffle is
    # AQE-coalesced by DATA size, and these groups are compute-heavy per
    # byte — a 40 MB post-shuffle stage would collapse to one task and
    # serialize the kernel (measured in bench_skew.py)
    work = work.repartition(
        work.sparkSession.sparkContext.defaultParallelism, *group_keys
    )

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


_BACKFILL_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("session_seq", IntegerType()),
        StructField("vec", ArrayType(DoubleType())),
        StructField("roll_vec", ArrayType(DoubleType())),
    ]
)


def backfill_features(
    df: DataFrame,
    k: int = 4,
    n_turns: int = 3,
    gap_seconds: float = 1800.0,
    norm: bool = True,
    chunk: int | None = 4096,
) -> DataFrame:
    """Fused backfill kernel: per-turn + rolling vectors in ONE pass.

    The per-turn count matrix is computed once per group and reused for
    both outputs (per-turn normalized vector AND rolling n-turn window),
    avoiding the vector-vs-vector join of the composable formulation —
    at 100 TB that join shuffles two 1 KB-per-row columns; this shuffles
    none. Sessionization stays a scalar window (cheap, exact across
    chunk boundaries); chunking replicates only (n_turns-1) carry rows.
    """
    from .sessionize import sessionize

    work = df if "session_seq" in df.columns else sessionize(df, gap_seconds)
    work = work.select("conv_id", "turn_idx", "session_seq", "text")

    if chunk is not None:
        work = _carry_blocks(work, chunk, n_turns)
        group_keys = ["conv_id", "__blk"]
    else:
        group_keys = ["conv_id"]
    # explicit exchange: see rolling_turn_vectors — AQE would coalesce
    # the small-by-bytes shuffle to one task and serialize the kernel
    work = work.repartition(
        work.sparkSession.sparkContext.defaultParallelism, *group_keys
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort").reset_index(drop=True)
        pos_map, _, kcount = _pos_map(k)
        counts = composition_matrix(
            pdf["text"].tolist(), k, canonical=True, norm=False,
            pos_map=pos_map, kcount=kcount,
        )
        per_turn = counts / np.maximum(1.0, counts.sum(axis=1))[:, None] if norm else counts
        t = len(pdf)
        prefix = np.vstack([np.zeros((1, kcount)), np.cumsum(counts, axis=0)])
        lo = np.maximum(np.arange(t) - (n_turns - 1), 0)
        roll = prefix[1 + np.arange(t)] - prefix[lo]
        if norm:
            roll = roll / np.maximum(1.0, roll.sum(axis=1))[:, None]
        out = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "session_seq": pdf["session_seq"].astype("int32"),
                "vec": list(per_turn),
                "roll_vec": list(roll),
            }
        )
        if "__emit" in pdf.columns:
            out = out[pdf["__emit"].to_numpy()]
        return out

    return work.groupBy(*group_keys).applyInPandas(fn, _BACKFILL_SCHEMA)


def backfill_features_stream(
    df: DataFrame,
    k: int = 4,
    n_turns: int = 3,
    gap_seconds: float = 1800.0,
    norm: bool = True,
    n_partitions: int | None = None,
    mode: str = "turns",
    time_seconds: float = 600.0,
    max_carry: int = 100_000,
) -> DataFrame:
    """Sorted-stream backfill: the range-partitioned sorted-merge plan.

    repartition(conv_id) + sortWithinPartitions(conv_id, turn_idx) +
    mapInPandas with cross-batch carry. Unlike applyInPandas, this never
    materializes one pandas frame per conversation — Arrow batches of
    ~maxRecordsPerBatch rows stream through one vectorized kernel, with
    the open conversation's last (n_turns-1) count rows carried between
    batches. Same outputs as backfill_features; ~5x less overhead and a
    bounded memory footprint regardless of conversation length (the
    skew answer for the rolling window: a 10^6-turn conversation costs
    one task time-wise but never more than one batch memory-wise).
    

    Ordering contract (code-review r4): the kernel sorts by (conv_id,
    turn_idx) and computes session gaps in TURN order, while the SQL
    sessionize path orders by (ts, turn_idx) — identical whenever ts is
    non-decreasing in turn_idx within a conversation (guaranteed by the
    transcript derivation and asserted by the q38 oracle); out-of-order
    producer clocks are outside the contract and should be repaired
    upstream before backfill.
    """
    if mode not in ("turns", "time"):
        raise ValueError(f"mode must be 'turns' or 'time', got {mode!r}")
    # sessionization happens IN-KERNEL over the same sorted stream (gap
    # cumsum with cross-batch carry) unless session_seq is already
    # present — saving a second full-data shuffle (the window pass).
    # mode='time' windows over [ts_i - time_seconds, ts_i]; its carry is
    # the open conversation's rows within the horizon of its last ts,
    # bounded by max_carry — a conversation denser than that within one
    # horizon gets a truncated window and a RuntimeWarning on the
    # executor (see the clamp below).
    have_sess = "session_seq" in df.columns
    need_ts = (not have_sess) or mode == "time"
    cols = ["conv_id", "turn_idx", "text"]
    if have_sess:
        cols.append("session_seq")
    work = df.select(
        *cols, *([epoch_ms("ts").alias("__ts_ms")] if need_ts else [])
    )
    parts = n_partitions or work.sparkSession.sparkContext.defaultParallelism
    work = work.repartition(parts, "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    )
    gap_ms = int(gap_seconds * 1000)

    horizon_ms = int(time_seconds * 1000)

    _NO_CARRY = object()  # distinguishes "no carry yet" from a carry
    # for the NULL conv_id group (str(None) == 'None' used to collide
    # with both, restarting NULL-group windows at every batch boundary
    # and colliding with a literal 'None' key — code-review r4)

    def gen(batches):
        pos_map, _, kcount = _pos_map(k)
        carry_conv = _NO_CARRY
        carry_counts = np.zeros((0, kcount))
        carry_ts_arr = np.zeros(0, dtype=np.int64)  # time mode: ts of carried rows
        carry_ts: int = 0
        carry_seq: int = 0
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            conv = pdf["conv_id"].to_numpy()
            counts = composition_matrix(
                pdf["text"].tolist(), k, canonical=True, norm=False,
                pos_map=pos_map, kcount=kcount,
            )
            carried = carry_conv is not _NO_CARRY and conv[0] == carry_conv
            cc = carry_counts if carried else np.zeros((0, kcount))
            m = cc.shape[0]
            full = np.vstack([cc, counts]) if m else counts
            prefix = np.vstack([np.zeros((1, kcount)), np.cumsum(full, axis=0)])
            newseg = np.flatnonzero(conv[1:] != conv[:-1]) + 1  # batch idx
            seg_starts_batch = np.concatenate(([0], newseg))
            # in full (carry-prefixed) index space the first segment
            # starts at 0 (its carry rows included), later ones at +m
            seg_starts_full = seg_starts_batch + m
            seg_starts_full[0] = 0
            seg_of_row = (
                np.searchsorted(seg_starts_batch, np.arange(B), side="right") - 1
            )
            idx = np.arange(B) + m
            if need_ts:
                guard_null_ts(pdf["__ts_ms"], "backfill_features_stream")
                ts = pdf["__ts_ms"].to_numpy(dtype=np.int64)
            if mode == "turns":
                lo = np.maximum(seg_starts_full[seg_of_row], idx - (n_turns - 1))
            else:
                # window = rows of the same conversation with
                # ts in [ts_i - horizon, ts_i]; per-segment searchsorted
                # over the carry-prefixed ts array (ts sorted per conv)
                ts_full = np.concatenate([carry_ts_arr, ts]) if m else ts
                lo = np.empty(B, dtype=np.int64)
                seg_ends = np.concatenate((seg_starts_batch[1:], [B]))
                for si, (sb, se) in enumerate(zip(seg_starts_batch, seg_ends)):
                    fs = int(seg_starts_full[si])  # segment start, full space
                    fe = int(se) + m  # segment end (exclusive), full space
                    seg_ts = ts_full[fs:fe]
                    probes_ts = ts[sb:se] - horizon_ms
                    lo[sb:se] = fs + np.searchsorted(seg_ts, probes_ts, side="left")
            roll = prefix[idx + 1] - prefix[lo]
            per_turn = (
                counts / np.maximum(1.0, counts.sum(axis=1))[:, None]
                if norm
                else counts
            )
            if norm:
                roll = roll / np.maximum(1.0, roll.sum(axis=1))[:, None]

            if have_sess:
                sess = pdf["session_seq"].to_numpy()
            else:
                prev = np.empty(B, dtype=np.int64)
                prev[1:] = ts[:-1]
                prev[0] = carry_ts if carried else ts[0]
                is_first = np.zeros(B, dtype=bool)
                is_first[seg_starts_batch] = True
                if carried:
                    is_first[0] = False
                newsess = ((ts - prev > gap_ms) & ~is_first).astype(np.int64)
                # per-conv cumulative sum: subtract the running total at
                # each segment start (vectorized cumsum reset)
                cum = np.cumsum(newsess)
                seg_base = np.zeros(B, dtype=np.int64)
                seg_base[:] = (cum - newsess)[seg_starts_batch][seg_of_row]
                sess = cum - seg_base
                if carried:
                    first_len = int(
                        (newseg[0] if newseg.size else B)
                    )
                    sess[:first_len] += carry_seq
                carry_ts = int(ts[-1])
                carry_seq = int(sess[-1])

            # carry: last conversation's trailing window context
            last_rows = full.shape[0] - int(seg_starts_full[-1])
            carry_conv = conv[-1]
            if mode == "turns":
                take = min(n_turns - 1, last_rows)
            else:
                # rows of the open conv within the horizon of its last ts
                ts_tail = ts_full[seg_starts_full[-1] :]
                within = int(
                    ts_tail.size
                    - np.searchsorted(ts_tail, ts_tail[-1] - horizon_ms, "left")
                )
                take = min(within, last_rows)
                if take > max_carry:
                    import warnings

                    warnings.warn(
                        f"backfill_features_stream: conversation {carry_conv!r} "
                        f"has {take} rows inside one {horizon_ms}ms horizon; "
                        f"carry clamped to max_carry={max_carry} — windows "
                        "crossing the next batch boundary will be truncated",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    take = max_carry
            carry_counts = full[full.shape[0] - take :] if take else np.zeros((0, kcount))
            if mode == "time":
                carry_ts_arr = (
                    ts_full[ts_full.size - take :] if take else np.zeros(0, np.int64)
                )
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"].astype("int32"),
                    "session_seq": np.asarray(sess, dtype=np.int32),
                    "vec": list(per_turn),
                    "roll_vec": list(roll),
                }
            )

    return work.mapInPandas(gen, _BACKFILL_SCHEMA)


def backfill_features_auto(
    df: DataFrame,
    k: int = 4,
    n_turns: int = 3,
    gap_seconds: float = 1800.0,
    norm: bool = True,
    hot_threshold: int = 65536,
    chunk: int = 4096,
    hot_ids: list | None = None,
) -> DataFrame:
    """Skew-routing backfill: the measured answer to docs/SCALE.md
    playbook item 1 (bench_skew.py holds the numbers).

    Neither pure plan wins on skewed input: the sorted-merge stream
    kernel serializes a 10^6-turn conversation onto one task, while the
    chunked applyInPandas plan pays per-group overhead on every tiny
    conversation (40k cold groups cost more than the straggler saves).
    This router sends each tier to the plan that is right for it:

      cold (<= hot_threshold turns)  backfill_features_stream — one
           exchange, no per-group frames, O(batch) memory
      hot  (> hot_threshold turns)   backfill_features(chunk=N) — the
           (conv_id, block) carry plan; a hot conversation of T turns
           becomes ceil(T/chunk) parallel groups, and with only a
           handful of hot conversations the group overhead is noise

    ``hot_ids`` skips the sizing aggregation when the caller already
    knows the hot keys (e.g. from yesterday's partition stats); the
    sizing pass itself is a map-side-combined count per conv_id. The
    hot-id list is collected to the driver — by construction it is tiny
    (conversations longer than hot_threshold); a corpus where MOST keys
    are hot wants backfill_features(chunk=...) outright.
    """
    if hot_ids is None:
        hot_ids = [
            r[0]
            for r in df.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > hot_threshold)
            .select("conv_id")
            .collect()
        ]
    if not hot_ids:
        return backfill_features_stream(
            df, k=k, n_turns=n_turns, gap_seconds=gap_seconds, norm=norm
        )
    # coalesce: isin(...) is NULL for NULL conv_id, and both where(pred)
    # and where(~pred) drop NULL predicates — NULL-key rows route cold
    is_hot = F.coalesce(F.col("conv_id").isin(list(hot_ids)), F.lit(False))
    cold = backfill_features_stream(
        df.where(~is_hot), k=k, n_turns=n_turns, gap_seconds=gap_seconds, norm=norm
    )
    hot = backfill_features(
        df.where(is_hot),
        k=k,
        n_turns=n_turns,
        gap_seconds=gap_seconds,
        norm=norm,
        chunk=chunk,
    )
    return cold.unionByName(hot)
