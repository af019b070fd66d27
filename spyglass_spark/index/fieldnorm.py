"""Fieldnorm u8 quantization, matching tantivy-0.19.2's scheme
(tantivy src/fieldnorm/code.rs, public source; configured for spyglass's
text fields via /root/reference/crates/spyglass-searcher/src/schema.rs:150-155).

Token counts 0..=40 are stored exactly (ids 0..=40); above 40 the table
grows exponentially: 8 steps per doubling of the increment (the
Lucene-SmallFloat-style layout tantivy uses). Encoding rounds DOWN to the
nearest representable value. BM25's per-document length |d| is the DECODED
value of the stored id — reproducing this lossy roundtrip is mandatory for
score parity on long documents (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    table = list(range(41))  # ids 0..=40 exact
    cur, delta = 40, 2
    while len(table) < 256:
        for _ in range(8):
            cur += delta
            table.append(cur)
            if len(table) == 256:
                break
        delta *= 2
    return np.asarray(table, dtype=np.uint32)


FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(fieldnorm):
    """Encode token count(s) -> u8 id(s), rounding down (binary-search
    semantics of tantivy's fieldnorm_to_id)."""
    arr = np.asarray(fieldnorm, dtype=np.int64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, np.minimum(arr, int(FIELD_NORMS_TABLE[-1])), side="right") - 1
    return ids.astype(np.uint8)


def id_to_fieldnorm(norm_id):
    """Decode u8 id(s) -> representable token count(s)."""
    return FIELD_NORMS_TABLE[np.asarray(norm_id, dtype=np.int64)]
