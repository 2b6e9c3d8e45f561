"""Structured Streaming surface (SURVEY §2.9 — engine addition).

The reference is strictly batch; these builders give the engine an
incremental path for the same semantics:

  * streaming_sessionize: event-time session windows with a watermark
    (the streaming analog of the gap-sessionization cumulative-flag sum)
  * streaming_kmer_counts: incremental global k-mer counting — the
    streaming form of the reference's chunked counter (A4): each
    micro-batch is a chunk, state-store aggregation is the merge.

Both return unstarted DataFrames; callers attach writeStream sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(conv_id, session_window) turn counts + char totals.

    Uses Spark's native session_window (gap-based, event time) with a
    watermark for late data — semantics match batch sessionize for data
    arriving within the watermark. Gap handling (code-review r4): the
    gap is applied at MILLISECOND precision — int() used to truncate
    fractional seconds, and gap_seconds=0.5 became the rejected
    "0 seconds". session_window's merge rule is inclusive (windows
    merge when diff <= gap), which matches batch sessionize's strict
    `diff > gap` split exactly — the empirical evidence is
    test_streaming_sessionize_ntz_and_exact_gap_boundary, which pins
    a diff == gap event into the SAME session with the raw gap passed
    through.
    """
    gap_ms = int(gap_seconds * 1000)
    if gap_ms <= 0:
        raise ValueError(f"gap_seconds must be >= 1ms, got {gap_seconds}")
    return (
        # withWatermark requires TIMESTAMP; driver parquet event time is
        # TIMESTAMP_NTZ (exact under the engine's session TZ=UTC pin)
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window("ts", f"{gap_ms} milliseconds").alias("win"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            "conv_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_turns",
            "n_chars",
        )
    )


def streaming_kmer_counts(stream: DataFrame, k: int = 4) -> DataFrame:
    """Incremental canonical k-mer counts (update-mode aggregation).

    Deliberately UNwatermarked: global counts aggregate forever and the
    state is O(distinct k-mers) — bounded by 4^k, not by time — so a
    watermark would bound nothing (the old dead ``watermark`` parameter
    advertised a state bound that did not exist; code-review r4)."""
    from ..functions.kmers import kmer_count_pairs

    pairs = kmer_count_pairs(stream, k=k)
    return pairs.groupBy("kmer").agg(F.sum("cnt").alias("cnt"))


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: first-seen document per sha256 digest.

    The incremental form of operators.dedup.exact_dedup(digest=True):
    dropDuplicates on the digest keeps one row per distinct text; the
    watermark bounds the digest state store (a doc repeated later than
    the watermark re-emits — at 100 TB/day pick the watermark to the
    dedup horizon the pipeline contracts). The state key is the 32-byte
    digest, never the document, so state size is O(distinct) regardless
    of text length.

    Keep-choice contract (code-review r4): across micro-batches the
    FIRST-arriving batch's row wins (state blocks later ones); WITHIN a
    micro-batch the survivor among duplicates is whichever row the
    tasks process first — arbitrary, unlike batch exact_dedup's
    deterministic min(id). Pipelines that need the batch keep rule
    should treat this stream as a candidate filter and resolve keeps
    with the batch operator at the compaction boundary.
    """
    # withWatermark requires TIMESTAMP; parquet event time often arrives
    # as TIMESTAMP_NTZ (reinterpretation is exact under the engine's
    # session TZ=UTC pin)
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("__digest", F.sha2(F.col(text_col).cast("binary"), 256))
        .dropDuplicatesWithinWatermark(["__digest"])
        .select(id_col, "__digest")
    )
