from .analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    StandardAnalyzer,
    analyze_batch,
    tokenize,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "StandardAnalyzer",
    "analyze_batch",
    "tokenize",
]
