from .transcripts import (
    generate_transcripts,
    generate_transcripts_table,
    TRANSCRIPT_SCHEMA,
    PAYLOAD_SCHEMA,
)

__all__ = [
    "generate_transcripts",
    "generate_transcripts_table",
    "TRANSCRIPT_SCHEMA",
    "PAYLOAD_SCHEMA",
]
