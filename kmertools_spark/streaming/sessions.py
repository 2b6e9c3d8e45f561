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
    arriving within the watermark.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window("ts", f"{int(gap_seconds)} seconds").alias("win"),
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


def streaming_kmer_counts(
    stream: DataFrame, k: int = 4, watermark: str = "1 hour"
) -> DataFrame:
    """Incremental canonical k-mer counts (update-mode aggregation)."""
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
    dropDuplicates on the digest keeps the FIRST arrival of each
    distinct text; the watermark bounds the digest state store (a doc
    repeated later than the watermark re-emits — at 100 TB/day pick the
    watermark to the dedup horizon the pipeline contracts). The state
    key is the 32-byte digest, never the document, so state size is
    O(distinct) regardless of text length.
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
