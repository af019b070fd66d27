"""Analyzer chains replicating the reference's tokenizers.

Reference configuration (/root/reference/crates/spyglass-searcher/src/schema.rs:78-89):

``spyglass_tokenizer_en`` (used for ``content`` and ``description`` fields):
    SimpleTokenizer            — split on non-alphanumeric (Unicode); token
                                 position = running index assigned at
                                 tokenize time, BEFORE any filter
    RemoveLongFilter(40)       — drop tokens with UTF-8 byte length >= 40
    LowerCaser                 — Unicode lowercase
    AsciiFoldingFilter         — fold accented latin to ASCII
    StopWordFilter (44 words)  — stop_word_filter.rs:29-34; positions are NOT
                                 renumbered (holes remain). The list contains
                                 "I" uppercase but runs AFTER LowerCaser, so
                                 the token "i" is never removed — quirk kept.
    Stemmer(English)           — Snowball english ("Porter2")

``default`` tokenizer (used for the ``title`` field, schema.rs:172 uses plain
TEXT): SimpleTokenizer + RemoveLongFilter(40) + LowerCaser — no folding,
no stopwords, no stemming (tantivy-0.19.2 public source).

Untokenized STRING fields (id/domain/url, schema.rs:169-175) index the raw
value as a single term; u64 fields (tags) index each value as its decimal
string term here.

All functions are pure and deterministic; batch variants are used inside
Arrow/pandas UDFs (no per-row Python at the Spark plan level).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable

from .porter2 import stem

# tantivy SimpleTokenizer splits on `!char::is_alphanumeric()`. Python's
# closest vectorizable equivalent: runs of word chars excluding underscore
# (`\w` minus `_`). Identical on ASCII source code; exotic Unicode numeric
# classes (Nl/No) may differ — acceptable, pinned by golden tests.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# stop_word_filter.rs:29-34 — verbatim, including the duplicate "the" and
# uppercase "I" (which never matches post-lowercasing).
STOP_WORDS = frozenset(
    [
        "a", "about", "an", "and", "are", "as", "at", "be", "but", "by",
        "com", "for", "from", "how", "if", "I", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such", "that", "the", "their",
        "then", "there", "these", "they", "this", "to", "was", "what",
        "when", "where", "who", "will", "with", "www",
    ]
)

MAX_TOKEN_BYTES = 40  # RemoveLongFilter::limit(40), schema.rs:80

# AsciiFoldingFilter approximation: NFKD + strip combining marks, plus the
# common latin special forms the NFKD decomposition does not cover
# (Lucene/tantivy folding table entries for lowercase latin).
_SPECIAL_FOLD = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
    "þ": "th", "ł": "l", "ħ": "h", "ŋ": "n", "ı": "i", "ĸ": "k",
}


def ascii_fold(token: str) -> str:
    if token.isascii():
        return token
    out = []
    for ch in token:
        if ch.isascii():
            out.append(ch)
            continue
        repl = _SPECIAL_FOLD.get(ch)
        if repl is not None:
            out.append(repl)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(kept if kept else ch)
    return "".join(out)


# Raw-token → final-token caches (None = dropped by a filter). Token
# streams are zipfian, so one dict probe replaces the whole filter chain
# for almost every token. Pure functions of the token → identical results
# with or without the cache (oracle and engine share this module).
_CACHE_LIMIT = 1 << 20
_en_cache: dict = {}
_default_cache: dict = {}
_MISS = object()


def _default_token(tok: str):
    if len(tok.encode("utf-8")) >= MAX_TOKEN_BYTES:
        return None
    return tok.lower()


def _en_token(tok: str):
    if len(tok.encode("utf-8")) >= MAX_TOKEN_BYTES:
        return None
    t = ascii_fold(tok.lower())
    if t in STOP_WORDS:
        return None
    return stem(t)


def tokenize_default(text: str) -> list[tuple[int, str]]:
    """tantivy ``default`` tokenizer (title field): simple split +
    RemoveLong(40) + lowercase. Returns [(position, token)]."""
    cache = _default_cache
    out = []
    for pos, tok in enumerate(_TOKEN_RE.findall(text)):
        r = cache.get(tok, _MISS)
        if r is _MISS:
            r = _default_token(tok)
            if len(cache) < _CACHE_LIMIT:
                cache[tok] = r
        if r is not None:
            out.append((pos, r))
    return out


def tokenize_en(text: str) -> list[tuple[int, str]]:
    """``spyglass_tokenizer_en`` chain (content field). Returns
    [(position, token)] with stopword holes preserved."""
    cache = _en_cache
    out = []
    for pos, tok in enumerate(_TOKEN_RE.findall(text)):
        r = cache.get(tok, _MISS)
        if r is _MISS:
            r = _en_token(tok)
            if len(cache) < _CACHE_LIMIT:
                cache[tok] = r
        if r is not None:
            out.append((pos, r))
    return out


ANALYZERS = {
    "content": tokenize_en,
    "description": tokenize_en,
    "title": tokenize_default,
}


def analyze(field: str, text: str) -> list[tuple[int, str]]:
    """Tokenize ``text`` with the analyzer of ``field``. STRING fields
    (id/domain/url) index the raw value as one term at position 0."""
    fn = ANALYZERS.get(field)
    if fn is None:
        return [(0, text)] if text else []
    return fn(text)


def analyze_batch(field: str, texts: Iterable[str]) -> list[list[tuple[int, str]]]:
    fn = ANALYZERS.get(field)
    if fn is None:
        return [[(0, t)] if t else [] for t in texts]
    return [fn(t or "") for t in texts]
