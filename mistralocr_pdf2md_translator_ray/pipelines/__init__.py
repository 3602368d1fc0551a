from .extract_pipeline import extract_turns, extract_documents

__all__ = ["extract_turns", "extract_documents"]
