"""Structured Streaming surface."""

from .asof import streaming_asof
from .dedup import streaming_lsh_candidates
from .sessions import (
    streaming_exact_dedup,
    streaming_kmer_counts,
    streaming_sessionize,
)
from .stateful import rolling_vectors_stream

__all__ = [
    "streaming_asof",
    "streaming_exact_dedup",
    "streaming_kmer_counts",
    "streaming_lsh_candidates",
    "streaming_sessionize",
    "rolling_vectors_stream",
]
