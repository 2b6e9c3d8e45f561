"""Structured Streaming surface."""

from .sessions import streaming_kmer_counts, streaming_sessionize

__all__ = ["streaming_kmer_counts", "streaming_sessionize"]
