"""Property tests: the vectorized greedy sloppy-phrase matcher must equal
a straightforward scalar reference implementation on random inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spyglass_spark.query.scoring import sloppy_phrase_count


def _scalar_reference(position_lists, offsets, slop):
    if any(len(p) == 0 for p in position_lists):
        return 0
    count = 0
    for p0 in position_lists[0]:
        anchor = int(p0) - offsets[0]
        prev = int(p0)
        ok = True
        for plist, off in zip(position_lists[1:], offsets[1:]):
            target = anchor + off
            lo, hi = max(target - slop, prev + 1), target + slop
            cand = [p for p in plist if lo <= p <= hi]
            if not cand:
                ok = False
                break
            prev = cand[0]
        if ok:
            count += 1
    return count


@st.composite
def phrase_case(draw):
    n_terms = draw(st.integers(2, 4))
    offsets = sorted(draw(st.lists(st.integers(0, 8), min_size=n_terms,
                                   max_size=n_terms, unique=True)))
    lists = []
    for _ in range(n_terms):
        vals = draw(st.sets(st.integers(0, 60), min_size=0, max_size=15))
        lists.append(np.array(sorted(vals), dtype=np.uint64))
    slop = draw(st.integers(0, 3))
    return lists, offsets, slop


@settings(max_examples=300, deadline=None)
@given(phrase_case())
def test_vectorized_equals_scalar(case):
    lists, offsets, slop = case
    assert sloppy_phrase_count(lists, offsets, slop) == \
        _scalar_reference(lists, offsets, slop)


def test_exact_phrase_basics():
    a = np.array([0, 5, 9], dtype=np.uint64)
    b = np.array([1, 6], dtype=np.uint64)
    assert sloppy_phrase_count([a, b], [0, 1], 0) == 2


def test_batch_counter_equals_scalar():
    """sloppy_phrase_counts_batch ≡ per-doc sloppy_phrase_count for random
    multi-doc position sets, offsets (with holes) and every slop 0..3."""
    import random

    import numpy as np

    from spyglass_spark.query.scoring import (sloppy_phrase_count,
                                              sloppy_phrase_counts_batch)

    rng = random.Random(77)
    for trial in range(60):
        nterms = rng.randint(2, 4)
        # query offsets strictly increasing, possibly with stopword holes
        offs = [rng.randint(0, 2)]
        for _ in range(nterms - 1):
            offs.append(offs[-1] + rng.randint(1, 3))
        slop = rng.randint(0, 3)
        ndocs = rng.randint(1, 12)
        per_doc = []  # per doc: list per term of sorted unique positions
        for _ in range(ndocs):
            per_doc.append([sorted(rng.sample(range(0, 40),
                                              rng.randint(1, 10)))
                            for _ in range(nterms)])
        expected = np.array(
            [sloppy_phrase_count([np.asarray(p, dtype=np.uint64)
                                  for p in doc], offs, slop)
             for doc in per_doc], dtype=np.int64)
        keyed = []
        for ti in range(nterms):
            parts = [(np.int64(di) << 40) + np.asarray(per_doc[di][ti],
                                                       dtype=np.int64)
                     for di in range(ndocs)]
            keyed.append(np.concatenate(parts))
        got = sloppy_phrase_counts_batch(keyed, offs, slop, ndocs)
        assert np.array_equal(got, expected), (trial, offs, slop)
