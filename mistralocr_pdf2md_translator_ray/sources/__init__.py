from .binary_ingest import decode_data_url_column, read_conversation_files
from .transcripts import (
    generate_transcripts,
    generate_transcripts_table,
    TRANSCRIPT_SCHEMA,
    PAYLOAD_SCHEMA,
)

__all__ = [
    "decode_data_url_column",
    "generate_transcripts",
    "generate_transcripts_table",
    "read_conversation_files",
    "TRANSCRIPT_SCHEMA",
    "PAYLOAD_SCHEMA",
]
