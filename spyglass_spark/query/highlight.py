"""Highlight preview + description helpers — display layer, not
rank-affecting.

Replicates generate_highlight_preview at
/root/reference/crates/spyglass-searcher/src/utils.rs:64-138 exactly:
whitespace word split, per-word analyzer normalization (FIRST emitted
token), ±5-word windows around matches, overlap merge, ≤5 matches
(the reference's `> MAX_HIGHLIGHT_MATCHES` check runs AFTER append, so up
to 6 matches are collected), scan stops after token index 10_000 (the
`> MAX_HIGHLIGHT_SCAN` check also runs post-processing — 10_001 tokens
examined), ≤4 windows emitted
(`> 3` after increment), '...' separators, <mark>/<span> wrapping.
Golden test mirrors utils.rs:161-174.

first_words replicates the description snippet maker at
crawler/mod.rs:632-637.
"""

from __future__ import annotations

from ..analysis.analyzer import tokenize_en

MAX_HIGHLIGHT_SCAN = 10_000
MAX_HIGHLIGHT_MATCHES = 5


def _normalize(word: str) -> str:
    toks = tokenize_en(word)
    return toks[0][1] if toks else word


def generate_highlight_preview(query: str, content: str) -> str:
    terms = {t for _, t in tokenize_en(query)}
    tokens = content.split()

    matched = []
    for idx, w in enumerate(tokens):
        # utils.rs:79-97 ordering: the token is processed BEFORE either
        # break, and the scan counter is incremented first — so the token
        # at index MAX_HIGHLIGHT_SCAN is still examined (10001 scanned)
        if _normalize(w) in terms:
            matched.append(idx)
        if len(matched) > MAX_HIGHLIGHT_MATCHES:
            break
        if idx + 1 > MAX_HIGHLIGHT_SCAN:
            break

    # merge ±5-word windows (utils.rs:100-115)
    ranges: list[list] = []  # [start, end, [match idxs]]
    for idx in matched:
        start = max(idx - 5, 0)
        end = min(idx + 5, len(tokens) - 1)
        if ranges and ranges[-1][0] <= start <= ranges[-1][1] or \
           ranges and ranges[-1][0] <= end <= ranges[-1][1]:
            last = ranges[-1]
            last[0] = min(last[0], start)
            last[1] = max(last[1], end)
            last[2].append(idx)
        else:
            ranges.append([start, end, [idx]])

    desc: list[str] = []
    num_windows = 0
    for start, end, matches in ranges:
        piece = tokens[start:end + 1]
        if piece:
            for idx in matches:
                piece[idx - start] = f"<mark>{piece[idx - start]}</mark>"
            desc.extend(piece)
            desc.append("...")
            num_windows += 1
            if num_windows > 3:
                break
    return f"<span>{' '.join(desc)}</span>"


def first_words(content: str, n: int = 20) -> str:
    """First-N-words description (crawler/mod.rs:632-637)."""
    return " ".join(content.split()[:n])


def group_urls_by_scheme(urls: list[str]) -> dict[str, list[str]]:
    """utils.rs:140-152."""
    out: dict[str, list[str]] = {}
    for url in urls:
        scheme = url.split(":")[0]
        out.setdefault(scheme, []).append(url)
    return out
