"""External source readers (reference JSON corpus, etc.)."""
