"""Varint/delta codec roundtrips + fieldnorm quantization goldens."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spyglass_spark.index.codecs import (
    BLOCK_SIZE,
    decode_block_meta,
    decode_positions,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_postings,
    varint_decode,
    varint_encode,
)
from spyglass_spark.index.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id, id_to_fieldnorm


def test_varint_known_values():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=400))
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_postings_roundtrip_and_blockmeta():
    n = 1000
    rng = np.random.default_rng(42)
    docs = np.cumsum(rng.integers(1, 50, size=n)).astype(np.uint64)
    tfs = rng.integers(1, 20, size=n).astype(np.uint64)
    norms = rng.integers(0, 255, size=n).astype(np.uint8)
    db, tb, mb = encode_postings(docs, tfs, norms)
    d2, t2 = decode_postings(db, tb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    meta = decode_block_meta(mb)
    assert len(meta) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert meta[0]["last_doc"] == docs[BLOCK_SIZE - 1]
    assert meta[0]["max_tf"] == tfs[:BLOCK_SIZE].max()
    assert meta[0]["min_norm"] == norms[:BLOCK_SIZE].min()
    assert meta[-1]["last_doc"] == docs[-1]


def test_positions_roundtrip():
    plists = [np.array([0, 5, 9], dtype=np.uint64), np.array([], dtype=np.uint64),
              np.array([3], dtype=np.uint64), np.arange(100, dtype=np.uint64) * 7]
    buf = encode_positions(plists)
    out = decode_positions(buf, len(plists))
    for a, b in zip(plists, out):
        assert np.array_equal(a, b)


def test_positions_selected_matches_full_decode():
    """decode_positions_selected(sel) ≡ full decode then select, for any
    selection — the phrase scorers rely on this equivalence."""
    from spyglass_spark.index.codecs import decode_positions_selected

    rng = np.random.default_rng(3)
    plists = [np.cumsum(rng.integers(0, 9, size=rng.integers(1, 30)))
              .astype(np.uint64) for _ in range(50)]
    tfs = np.array([p.size for p in plists], dtype=np.uint64)
    buf = encode_positions(plists)
    full = decode_positions(buf, len(plists))
    for sel in ([0], [49], [7, 7], list(range(50)), [3, 40, 12], []):
        got = decode_positions_selected(buf, tfs, np.asarray(sel, dtype=np.int64))
        assert len(got) == len(sel)
        for g, i in zip(got, sel):
            assert np.array_equal(g, full[i]), (sel, i)


# --- fieldnorm goldens: exact 0..40, exponential buckets above -------------

def test_fieldnorm_exact_below_41():
    for n in range(41):
        assert int(id_to_fieldnorm(fieldnorm_to_id(n))) == n


def test_fieldnorm_table_shape():
    assert FIELD_NORMS_TABLE.shape == (256,)
    assert FIELD_NORMS_TABLE[40] == 40
    assert FIELD_NORMS_TABLE[41] == 42
    assert FIELD_NORMS_TABLE[48] == 56
    assert FIELD_NORMS_TABLE[49] == 60
    assert list(FIELD_NORMS_TABLE[41:49]) == [42, 44, 46, 48, 50, 52, 54, 56]
    assert list(FIELD_NORMS_TABLE[49:57]) == [60, 64, 68, 72, 76, 80, 84, 88]
    assert np.all(np.diff(FIELD_NORMS_TABLE.astype(np.int64)) > 0)


def test_fieldnorm_round_down():
    assert int(fieldnorm_to_id(41)) == 40  # 41 rounds down to 40
    assert int(id_to_fieldnorm(fieldnorm_to_id(43))) == 42
    assert int(id_to_fieldnorm(fieldnorm_to_id(10_000))) <= 10_000


def test_fieldnorm_vectorized():
    arr = np.array([0, 1, 40, 41, 42, 1000, 10**6])
    ids = fieldnorm_to_id(arr)
    dec = id_to_fieldnorm(ids)
    assert np.all(dec <= arr)
    assert ids.dtype == np.uint8


def test_decode_block_random_access():
    from spyglass_spark.index.codecs import decode_block
    n = 1000
    rng = np.random.default_rng(7)
    docs = np.cumsum(rng.integers(1, 9, size=n)).astype(np.uint64)
    tfs = rng.integers(1, 30, size=n).astype(np.uint64)
    db, tb, mb = encode_postings(docs, tfs)
    meta = decode_block_meta(mb)
    for bi in range(len(meta)):
        d, t = decode_block(db, tb, meta, bi)
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        assert np.array_equal(d, docs[lo:hi])
        assert np.array_equal(t, tfs[lo:hi])


def test_bulk_encode_matches_per_term():
    from spyglass_spark.index.codecs import bulk_encode_postings
    rng = np.random.default_rng(11)
    # terms with df 1, 3, 200 (multi-block), 128 (boundary)
    term_dfs = [1, 3, 200, 128, 7]
    ords_l, tfs_l, pos_l, starts = [], [], [], [0]
    for df in term_dfs:
        o = np.sort(rng.choice(100000, size=df, replace=False)).astype(np.uint64)
        t = rng.integers(1, 6, size=df).astype(np.uint64)
        ords_l.append(o); tfs_l.append(t)
        pos_l.append([np.sort(rng.choice(500, size=int(x), replace=False)).astype(np.uint64) for x in t])
        starts.append(starts[-1] + df)
    ords = np.concatenate(ords_l); tfs = np.concatenate(tfs_l)
    norm_ids = rng.integers(0, 256, size=ords.size).astype(np.uint8)
    pos_concat = np.concatenate([p for plist in pos_l for p in plist])
    db, tb, pb, mb = bulk_encode_postings(np.array(starts, dtype=np.int64),
                                          ords, tfs, norm_ids, pos_concat)
    k = 0
    for i, df in enumerate(term_dfs):
        s, e = starts[i], starts[i + 1]
        d_ref, t_ref, m_ref = encode_postings(ords[s:e], tfs[s:e], norm_ids[s:e])
        p_ref = encode_positions(pos_l[i])
        assert db[i] == d_ref, f"term {i} doc bytes"
        assert tb[i] == t_ref, f"term {i} tf bytes"
        assert pb[i] == p_ref, f"term {i} pos bytes"
        assert mb[i] == m_ref, f"term {i} meta bytes"


def test_bulk_encode_string_field_path():
    from spyglass_spark.index.codecs import bulk_encode_postings
    # pos_concat=None: every posting [1, 0]
    starts = np.array([0, 2, 3], dtype=np.int64)
    ords = np.array([4, 9, 1], dtype=np.uint64)
    tfs = np.ones(3, dtype=np.uint64)
    norm_ids = np.array([1, 1, 1], dtype=np.uint8)
    db, tb, pb, mb = bulk_encode_postings(starts, ords, tfs, norm_ids, None)
    d_ref, t_ref, m_ref = encode_postings(ords[:2], tfs[:2], norm_ids[:2])
    p_ref = encode_positions([np.array([0], dtype=np.uint64)] * 2)
    assert db[0] == d_ref and tb[0] == t_ref and pb[0] == p_ref and mb[0] == m_ref
