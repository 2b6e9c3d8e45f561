"""Structured Streaming surface."""

from .sessions import (
    streaming_exact_dedup,
    streaming_kmer_counts,
    streaming_sessionize,
)
from .stateful import rolling_vectors_stream

__all__ = [
    "streaming_exact_dedup",
    "streaming_kmer_counts",
    "streaming_sessionize",
    "rolling_vectors_stream",
]
