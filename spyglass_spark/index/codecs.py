"""Posting-list codecs: delta + varint (LEB128) compression, numpy-vectorized.

Layout mirrors the reference's physical index at block granularity
(tantivy-0.19.2 public source: bitpacked blocks of 128 docs + VInt tail;
we use delta+varint uniformly per BASELINE.json north_star: "delta-encoded +
varint-compressed docID gaps and term-frequency blocks"), with per-block
metadata (last_doc, max_tf, min_norm_id) retained for block-max WAND
pruning (SURVEY.md §2.6).

All encode/decode paths are numpy-vectorized (≤10 fixed-iteration passes
over byte planes) — no per-value Python loops — so they run fast inside
Arrow batches on executors.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per block, mirroring tantivy's block size


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    if a.max() < 128:
        # every value fits one LEB128 byte — identical output, one cast
        return a.astype(np.uint8).tobytes()
    # bytes needed per value: ceil(bitlen/7), min 1
    nbytes = np.ones(a.shape, dtype=np.int64)
    for j in range(1, 10):
        nbytes += (a >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        vals = (a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = vals.astype(np.uint8) | cont
    return out.tobytes()


def _encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """varint_encode + cumulative byte offsets (n+1) in one pass — the
    bulk encoder needs both; computing nbytes twice was ~1/3 of its cost.
    When every value < 128 the stream is a raw uint8 cast and offsets are
    simply arange."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    if a.max() < 128:
        return (a.astype(np.uint8).tobytes(),
                np.arange(a.size + 1, dtype=np.int64))
    nb = _varint_nbytes(a)
    offs = np.concatenate(([0], np.cumsum(nb)))
    out = np.zeros(int(offs[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        vals = (a[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[offs[:-1][mask] + j] = vals.astype(np.uint8) | cont
    return out.tobytes(), offs


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte stream into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        out[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing array -> gap array (first value kept raw)."""
    a = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if a.size == 0:
        return a
    gaps = np.empty_like(a)
    gaps[0] = a[0]
    np.subtract(a[1:], a[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def _varint_nbytes(a: np.ndarray) -> np.ndarray:
    if a.size and a.max() < 16384:  # ≤2-byte varints: one compare
        return 1 + (a >= 128).astype(np.int64)
    nbytes = np.ones(a.shape, dtype=np.int64)
    for j in range(1, 10):
        nbytes += (a >= np.uint64(1) << np.uint64(7 * j)).astype(np.int64)
    return nbytes


def encode_postings(doc_ords: np.ndarray, tfs: np.ndarray, norm_ids: np.ndarray | None = None):
    """Encode one term's posting list.

    Returns (doc_bytes, tf_bytes, block_meta_bytes) where block_meta is a
    packed struct per 128-doc block:
      last_doc u64 | max_tf u32 | min_norm u8 | doc_off u64 | tf_off u64
    The byte offsets let block-max WAND decode individual blocks without
    touching the rest of the payload (delta base for block i is block
    i-1's last_doc, available from the meta — blocks are self-contained).
    ``norm_ids`` are per-doc fieldnorm ids (WAND score upper bounds);
    if None, 255 (loosest bound) is recorded.
    """
    doc_ords = np.ascontiguousarray(doc_ords, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = doc_ords.size
    gaps = delta_encode(doc_ords)
    doc_bytes = varint_encode(gaps)
    tf_bytes = varint_encode(tfs)
    doc_offs = np.concatenate(([0], np.cumsum(_varint_nbytes(gaps))))
    tf_offs = np.concatenate(([0], np.cumsum(_varint_nbytes(tfs))))
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    meta = np.zeros(nblocks, dtype=_BLOCK_META_DTYPE)
    for i in range(nblocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, n)
        meta[i]["last_doc"] = doc_ords[hi - 1]
        meta[i]["max_tf"] = tfs[lo:hi].max()
        meta[i]["min_norm"] = 255 if norm_ids is None else norm_ids[lo:hi].min()
        meta[i]["doc_off"] = doc_offs[lo]
        meta[i]["tf_off"] = tf_offs[lo]
    return doc_bytes, tf_bytes, meta.tobytes()


_BLOCK_META_DTYPE = np.dtype(
    [("last_doc", "<u8"), ("max_tf", "<u4"), ("min_norm", "u1"), ("_pad", "V3"),
     ("doc_off", "<u8"), ("tf_off", "<u8")]
)


def bulk_encode_postings(term_starts: np.ndarray, ords: np.ndarray,
                         tfs: np.ndarray, norm_ids: np.ndarray,
                         pos_concat: np.ndarray | None):
    """Encode MANY terms' posting lists in one vectorized pass.

    term_starts: int64 array (T+1) — posting index boundaries per term.
    ords/tfs/norm_ids: concatenated per-posting arrays (term-major,
      ord-sorted within each term).
    pos_concat: concatenated position values (posting-major; tfs[i] values
      per posting), or None for fields whose every posting has the single
      position 0 (untokenized STRING/tag fields).

    Returns (doc_bytes_list, tf_bytes_list, pos_bytes_list, meta_bytes_list)
    with outputs byte-identical to per-term encode_postings/encode_positions
    (asserted in tests) — this is purely a constant-factor optimization for
    the build's hot path.
    """
    T = term_starts.size - 1
    n = ords.size
    ords = np.ascontiguousarray(ords, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    starts = term_starts[:-1]
    ends = term_starts[1:]

    # doc gaps with per-term reset
    gaps = np.empty_like(ords)
    if n:
        gaps[0] = ords[0]
        np.subtract(ords[1:], ords[:-1], out=gaps[1:])
        gaps[starts] = ords[starts]
    doc_stream, doc_nb = _encode_with_offsets(gaps)
    tf_stream, tf_nb = _encode_with_offsets(tfs)

    # positions flat stream: per posting [count, delta positions...]
    if pos_concat is None:
        # every posting: [1, 0]
        flat = np.zeros(2 * n, dtype=np.uint64)
        flat[0::2] = 1
        rec_starts = np.arange(0, 2 * n + 1, 2, dtype=np.int64)
    else:
        pos_concat = np.ascontiguousarray(pos_concat, dtype=np.uint64)
        total_pos = pos_concat.size
        rec_starts = np.concatenate(([0], np.cumsum(tfs.astype(np.int64) + 1)))
        flat = np.empty(n + total_pos, dtype=np.uint64)
        flat[rec_starts[:-1]] = tfs
        pos_starts = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
        pgaps = np.empty_like(pos_concat)
        if total_pos:
            pgaps[0] = pos_concat[0]
            np.subtract(pos_concat[1:], pos_concat[:-1], out=pgaps[1:])
            pgaps[pos_starts[:-1]] = pos_concat[pos_starts[:-1]]
        shift = np.repeat(rec_starts[:-1] + 1 - pos_starts[:-1],
                          tfs.astype(np.int64))
        flat[np.arange(total_pos, dtype=np.int64) + shift] = pgaps
    pos_stream, pos_nb = _encode_with_offsets(flat)

    # single-block meta for the common case df <= BLOCK_SIZE, bulk-built
    meta_bulk = np.zeros(T, dtype=_BLOCK_META_DTYPE)
    if n:
        meta_bulk["last_doc"] = ords[ends - 1]
        meta_bulk["max_tf"] = np.maximum.reduceat(tfs, starts) if n else 0
        meta_bulk["min_norm"] = np.minimum.reduceat(
            np.ascontiguousarray(norm_ids, dtype=np.uint8), starts)

    doc_out, tf_out, pos_out, meta_out = [], [], [], []
    for t in range(T):
        s, e = int(starts[t]), int(ends[t])
        doc_out.append(doc_stream[doc_nb[s]:doc_nb[e]])
        tf_out.append(tf_stream[tf_nb[s]:tf_nb[e]])
        pos_out.append(pos_stream[pos_nb[rec_starts[s]]:pos_nb[rec_starts[e]]])
        df = e - s
        if df <= BLOCK_SIZE:
            meta_out.append(meta_bulk[t].tobytes())
        else:
            nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
            m = np.zeros(nblocks, dtype=_BLOCK_META_DTYPE)
            for i in range(nblocks):
                lo, hi = s + i * BLOCK_SIZE, min(s + (i + 1) * BLOCK_SIZE, e)
                m[i]["last_doc"] = ords[hi - 1]
                m[i]["max_tf"] = tfs[lo:hi].max()
                m[i]["min_norm"] = norm_ids[lo:hi].min()
                m[i]["doc_off"] = doc_nb[lo] - doc_nb[s]
                m[i]["tf_off"] = tf_nb[lo] - tf_nb[s]
            meta_out.append(m.tobytes())
    return doc_out, tf_out, pos_out, meta_out


def decode_block(doc_bytes: bytes, tf_bytes: bytes, meta: np.ndarray, block_idx: int):
    """Decode a single 128-doc block using the meta byte offsets."""
    m = meta[block_idx]
    doc_end = meta[block_idx + 1]["doc_off"] if block_idx + 1 < len(meta) else len(doc_bytes)
    tf_end = meta[block_idx + 1]["tf_off"] if block_idx + 1 < len(meta) else len(tf_bytes)
    gaps = varint_decode(doc_bytes[int(m["doc_off"]):int(doc_end)])
    base = np.uint64(meta[block_idx - 1]["last_doc"]) if block_idx > 0 else np.uint64(0)
    docs = base + np.cumsum(gaps, dtype=np.uint64)
    tfs = varint_decode(tf_bytes[int(m["tf_off"]):int(tf_end)])
    return docs, tfs


def decode_block_meta(meta_bytes: bytes) -> np.ndarray:
    return np.frombuffer(meta_bytes, dtype=_BLOCK_META_DTYPE)


def decode_postings(doc_bytes: bytes, tf_bytes: bytes):
    """Decode a posting list -> (doc_ords uint64, tfs uint64)."""
    return delta_decode(varint_decode(doc_bytes)), varint_decode(tf_bytes)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Encode per-doc token positions: for each doc, varint(count) then
    delta+varint positions. Used for phrase scoring (fields indexed
    WithFreqsAndPositions, schema.rs:152)."""
    parts: list[np.ndarray] = []
    for pos in positions_per_doc:
        pos = np.ascontiguousarray(pos, dtype=np.uint64)
        parts.append(np.array([pos.size], dtype=np.uint64))
        if pos.size:
            parts.append(delta_encode(pos))
    if not parts:
        return b""
    return varint_encode(np.concatenate(parts))


def decode_positions_selected(buf: bytes, tfs: np.ndarray,
                              sel: np.ndarray) -> list[np.ndarray]:
    """Positions for SELECTED posting indexes only. One vectorized varint
    pass over the stream, then record boundaries derived from the tf array
    (record i = [count, count deltas] → length tf[i]+1), so per-posting
    slicing touches only the requested docs — no full per-doc Python walk.
    Used by the phrase scorers where the intersected candidate set is far
    smaller than the posting list."""
    flat = varint_decode(buf)
    rec_starts = np.concatenate(([0], np.cumsum(tfs.astype(np.int64) + 1)))
    out = []
    for i in sel:
        s = int(rec_starts[i]) + 1
        out.append(np.cumsum(flat[s:s + int(tfs[i])], dtype=np.uint64))
    return out


def decode_positions(buf: bytes, ndocs: int) -> list[np.ndarray]:
    flat = varint_decode(buf)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(ndocs):
        cnt = int(flat[i]); i += 1
        out.append(np.cumsum(flat[i : i + cnt], dtype=np.uint64))
        i += cnt
    return out


def decode_positions_stream(flat: np.ndarray, rec_starts: np.ndarray,
                            tfs: np.ndarray):
    """Restore ALL records' positions from the flat varint stream in one
    vectorized pass: returns ``(pos, cum)`` where ``pos`` is the
    record-major concatenation of every record's cumsum-restored
    positions and ``cum[i]`` is record i's exclusive offset into it
    (``cum[-1] == pos.size``). The per-query phrase scorers then slice
    selected records out of this cache (``phrase_keys_select``) instead
    of re-walking the delta stream per query — the cross-query phrase
    decode cache for batch mode."""
    lens = tfs.astype(np.int64)
    total = int(lens.sum())
    cum = np.concatenate(([0], np.cumsum(lens)))
    if total == 0:
        return np.empty(0, np.int64), cum
    starts = rec_starts[:-1].astype(np.int64) + 1  # skip the count slot
    out_idx = (np.repeat(starts, lens)
               + (np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], lens)))
    deltas = flat[out_idx].astype(np.int64)
    g = np.cumsum(deltas)
    base = (g - deltas)[cum[:-1]]  # exclusive global prefix at record start
    pos = g - np.repeat(base, lens)
    return pos, cum


def phrase_keys_all(pos: np.ndarray, cum: np.ndarray) -> np.ndarray:
    """Batched phrase-counter keys for EVERY record of a cached position
    stream: ``rec_idx·2^40 + position``. When a query's candidate set
    covers the whole posting list (hot-term intersections) this cached
    array is used as-is — zero per-query gather."""
    n = cum.size - 1
    lens = (cum[1:] - cum[:-1]).astype(np.int64)
    return (np.repeat(np.arange(n, dtype=np.int64), lens) << 40) + pos


def phrase_keys_select(pos: np.ndarray, cum: np.ndarray,
                       sel: np.ndarray) -> np.ndarray:
    """Batched phrase-counter keys (``cand_idx·2^40 + position``) for the
    SELECTED records of a cached position stream — one gather over the
    already-restored positions, no delta re-decode (compare
    ``phrase_position_keys``, which re-walks the flat stream)."""
    lens = (cum[sel + 1] - cum[sel]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    c2 = np.concatenate(([0], np.cumsum(lens)))
    out_idx = (np.repeat(cum[sel].astype(np.int64), lens)
               + (np.arange(total, dtype=np.int64) - np.repeat(c2[:-1], lens)))
    cand_idx = np.repeat(np.arange(sel.size, dtype=np.int64), lens)
    return (cand_idx << 40) + pos[out_idx]


def phrase_position_keys(flat: np.ndarray, rec_starts: np.ndarray,
                         tfs: np.ndarray, sel: np.ndarray) -> np.ndarray:
    """Build the batched phrase counter's keyed positions for the SELECTED
    posting records: ``cand_idx·2^40 + position`` — one vectorized gather
    over the decoded flat stream (records are [count, delta positions...];
    per-record cumsum restored via a segmented-prefix trick)."""
    lens = tfs[sel].astype(np.int64) if sel.size else np.empty(0, np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = rec_starts[sel].astype(np.int64) + 1  # skip the count slot
    cum = np.concatenate(([0], np.cumsum(lens)))
    out_idx = (np.repeat(starts, lens)
               + (np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], lens)))
    deltas = flat[out_idx].astype(np.int64)
    g = np.cumsum(deltas)
    base = (g - deltas)[cum[:-1]]  # exclusive global prefix at record start
    pos = g - np.repeat(base, lens)
    cand_idx = np.repeat(np.arange(sel.size, dtype=np.int64), lens)
    return (cand_idx << 40) + pos
