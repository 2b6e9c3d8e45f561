"""Input sources: shared transcript derivation, synthetic generator,
and multimodal binary-column plumbing."""

from .transcripts import (
    BASE_TABLES,
    PROBES_SQL,
    TRANSCRIPTS_SQL,
    probes_df,
    register_base_tables,
    synth_transcripts,
    synth_transcripts_pdf,
    transcripts_df,
)

__all__ = [
    "BASE_TABLES",
    "PROBES_SQL",
    "TRANSCRIPTS_SQL",
    "probes_df",
    "register_base_tables",
    "synth_transcripts",
    "synth_transcripts_pdf",
    "transcripts_df",
]
