from .analyzer import ANALYZERS, STOP_WORDS, analyze, analyze_batch, tokenize_default, tokenize_en
from .porter2 import stem

__all__ = [
    "ANALYZERS", "STOP_WORDS", "analyze", "analyze_batch",
    "tokenize_default", "tokenize_en", "stem",
]
