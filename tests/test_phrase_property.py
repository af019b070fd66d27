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
