"""Deterministic synthetic source-code corpus for tests (FIXTURES.md §1).

Seeded, no external data. Content deliberately exercises every analyzer
quirk: hot terms (fn/import), snake_case/camelCase splits, accented chars
(folding), ≥40-byte tokens (RemoveLong), stopwords incl. bare i/I
(position holes + the uppercase-"I" quirk), repeated terms (tf>1), files
>255 tokens (fieldnorm buckets) and an empty file.
"""

from __future__ import annotations

import hashlib
import random

LANGS = ["c", "cpp", "js", "rs", "ts"]  # extensions.rs:63-69

_WORDS = [
    "fn", "import", "return", "struct", "impl", "let", "mut", "pub", "use",
    "match", "loop", "while", "async", "await", "spawn", "index", "search",
    "query", "token", "parse", "parser", "parsing", "merge", "merged",
    "merging", "score", "scoring", "ranked", "ranking", "postings",
    "segment", "buffer", "stream", "naïve", "café", "résumé", "московский",
    "the", "and", "I", "i", "is", "was", "salinas", "gabilan", "soledad",
    "foo_bar", "camelCase", "snake_case", "x", "config", "deadline",
    "retry", "retries", "hash", "hashing", "shuffle", "partition",
    "partitions", "broadcast", "vector", "vectorized", "compress",
    "compressed", "varint", "delta", "block", "wand",
]
_LONG_TOKEN = "z" * 45  # dropped by RemoveLongFilter(40)


def synth_corpus(n_docs: int = 200, seed: int = 42) -> list[dict]:
    """Returns corpus rows (repo, path, commit, lang, content)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 13}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/mod{i % 11}/file_{i}.{lang}"
        commit = hashlib.sha256(f"c{i}".encode()).hexdigest()[:40]
        if i == 0:
            content = ""  # empty file
        elif i == 1:
            content = " ".join(["tokens"] * 300)  # >255 tokens → norm buckets
        else:
            n_words = rng.randint(5, 120)
            words = [rng.choice(_WORDS) for _ in range(n_words)]
            if i % 9 == 0:
                words.append(_LONG_TOKEN)
            if i % 4 == 0:
                words.extend(["fn", "main", "import", "sys"])
            content = " ".join(words)
        rows.append(dict(repo=repo, path=path, commit=commit, lang=lang, content=content))
    return rows


def corpus_to_documents(rows: list[dict]) -> tuple[list[dict], list[dict]]:
    """Pure-python analog of corpus.to_documents + build_tags_dim (for the
    oracle side of parity tests). Returns (documents, tags_dim)."""
    import uuid

    from .corpus import SPYGLASS_NS, lastmodified_py, published_py

    tagvals = sorted({("lens", r["lang"]) for r in rows} |
                     {("repository", r["repo"]) for r in rows})
    tags_dim = [{"id": i + 1, "label": lbl, "value": val}
                for i, (lbl, val) in enumerate(tagvals)]
    tag_id = {(t["label"], t["value"]): t["id"] for t in tags_dim}
    docs = []
    for r in rows:
        url = f"repo://{r['repo']}/{r['path']}@{r['commit']}"
        docs.append({
            "doc_id": str(uuid.uuid5(SPYGLASS_NS, url)),
            "url": url,
            "domain": r["repo"],
            "title": r["path"],
            "content": r["content"],
            "tags": sorted([tag_id[("lens", r["lang"])],
                            tag_id[("repository", r["repo"])]]),
            "content_sha256": hashlib.sha256(r["content"].encode()).hexdigest(),
            "published": published_py(url),
            "lastmodified": lastmodified_py(url),
        })
    return docs, tags_dim
