"""Analyzer golden tests — every quirk from SURVEY.md §2.1."""

import numpy as np

from spyglass_spark.analysis import analyze, tokenize_default, tokenize_en


def test_simple_split_positions():
    # '_' is not alphanumeric: identifiers split; positions count ALL tokens
    assert tokenize_default("fn foo_bar(x)") == [(0, "fn"), (1, "foo"), (2, "bar"), (3, "x")]


def test_title_no_stop_no_stem():
    # default tokenizer: lowercase only — no stopword removal, no stemming
    assert tokenize_default("The Running") == [(0, "the"), (1, "running")]


def test_content_stopword_holes():
    # "is" (pos 1) and "a" (pos 2) removed, positions NOT renumbered
    toks = tokenize_en("rust is a language")
    assert toks == [(0, "rust"), (3, "languag")]


def test_stopword_uppercase_i_quirk():
    # list has "I" but runs after lowercasing → "i" survives
    toks = tokenize_en("I think")
    assert toks == [(0, "i"), (1, "think")]


def test_remove_long_40_bytes():
    long_tok = "x" * 40
    ok_tok = "y" * 39
    toks = tokenize_en(f"{long_tok} {ok_tok}")
    # long token dropped but still consumed position 0
    assert toks == [(1, ok_tok)]


def test_ascii_folding():
    assert tokenize_en("café Pâté") == [(0, "cafe"), (1, "pate")]


def test_folding_after_lowercase():
    assert tokenize_en("ÉLÈVE") == [(0, "elev")]  # lowercase → fold → stem


def test_stemming_applied():
    assert tokenize_en("parsing indexes") == [(0, "pars"), (1, "index")]


def test_empty_and_whitespace():
    assert tokenize_en("") == []
    assert tokenize_en("   \n\t ") == []


def test_string_field_identity():
    assert analyze("url", "repo://a/b@c") == [(0, "repo://a/b@c")]
    assert analyze("id", "some-uuid") == [(0, "some-uuid")]


def test_unicode_tokens():
    # unicode alphanumerics stay as one token, then fold
    toks = tokenize_en("naïve café_über")
    assert toks == [(0, "naiv"), (1, "cafe"), (2, "uber")]


def test_tokenize_arrays_matches_scalar_path():
    """The vectorized batch tokenizer (factorize + numpy sorts) must
    reproduce the scalar tokenize_en/tokenize_default postings exactly:
    same sorted vocab, same (term→[(ord, tf, positions)]) structure, same
    per-doc surviving counts — stopword holes and all."""
    import numpy as np

    from spyglass_spark.analysis.analyzer import (tokenize_arrays,
                                                  tokenize_default,
                                                  tokenize_en)

    texts = [
        "The quick brown Fox jumps over the lazy dog the fox",
        "",
        None,
        "Füße naïve Grüße straße über café — ß æ œ",
        "x" * 45 + " ok " + "y" * 39 + " end",   # long-token boundary (39 vs 45)
        "spark spark spark merge JOIN join filter a an and I i",
        "snake_case splits_here but digits123 stay456 mixed",
        "repeated doc " * 50,
    ]
    for kind, fn in (("en", tokenize_en), ("default", tokenize_default)):
        # chunk_chars=30 forces many chunks → exercises the growing-vocab
        # remap and cross-chunk concatenation
        vocab, ts, ords, tfs, pos, counts = tokenize_arrays(
            list(texts), kind, chunk_chars=30)
        full = tokenize_arrays(list(texts), kind)
        assert vocab == full[0] and counts.tolist() == full[5].tolist()
        assert (ts.tolist() == full[1].tolist()
                and ords.tolist() == full[2].tolist()
                and tfs.tolist() == full[3].tolist()
                and pos.tolist() == full[4].tolist())
        # scalar reconstruction
        by_term: dict = {}
        scounts = []
        for ord_, t in enumerate(texts):
            toks = fn(t or "")
            scounts.append(len(toks))
            d: dict = {}
            for p, term in toks:
                d.setdefault(term, []).append(p)
            for term, ps in d.items():
                by_term.setdefault(term, []).append((ord_, len(ps), ps))
        svocab = sorted(by_term)
        assert vocab == svocab, kind
        assert counts.tolist() == scounts, kind
        s_ords, s_tfs, s_pos, s_starts = [], [], [], [0]
        for term in svocab:
            posts = by_term[term]  # already ord-ascending
            s_starts.append(s_starts[-1] + len(posts))
            for o, tf, ps in posts:
                s_ords.append(o)
                s_tfs.append(tf)
                s_pos.extend(ps)
        assert ts.tolist() == s_starts, kind
        assert ords.tolist() == s_ords, kind
        assert tfs.tolist() == s_tfs, kind
        assert pos.tolist() == s_pos, kind


def test_tokenize_arrays_property_fuzz():
    """Property: the vectorized batch tokenizer equals the scalar path on
    arbitrary inputs — exercises the u64-pack tier boundary (8/9 bytes),
    the RemoveLong boundary (39/40), the S40 tier, the non-ASCII regex
    fallback, and multi-chunk splits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spyglass_spark.analysis.analyzer import (tokenize_arrays,
                                                  tokenize_default,
                                                  tokenize_en)

    token = st.one_of(
        st.text(alphabet="abcXYZ019", min_size=1, max_size=12),
        st.text(alphabet="a", min_size=7, max_size=10),    # 8-byte boundary
        st.text(alphabet="k", min_size=38, max_size=42),   # 40-byte boundary
        st.sampled_from(["the", "and", "I", "was", "über", "naïve", "日本",
                         "mixé", "ß"]),
    )
    doc = st.lists(token, min_size=0, max_size=25).map(" ".join)
    docs = st.lists(st.one_of(doc, st.none()), min_size=0, max_size=8)

    @settings(max_examples=120, deadline=None)
    @given(docs=docs, kind=st.sampled_from(["en", "default"]),
           chunk=st.sampled_from([25, 10_000]))
    def check(docs, kind, chunk):
        fn = tokenize_en if kind == "en" else tokenize_default
        vocab, ts, ords, tfs, pos, counts = tokenize_arrays(
            list(docs), kind, chunk_chars=chunk)
        by_term: dict = {}
        scounts = []
        for ord_, t in enumerate(docs):
            toks = fn(t or "")
            scounts.append(len(toks))
            d: dict = {}
            for p, term in toks:
                d.setdefault(term, []).append(p)
            for term, ps in d.items():
                by_term.setdefault(term, []).append((ord_, len(ps), ps))
        assert vocab == sorted(by_term)
        assert counts.tolist() == scounts
        s_ords, s_tfs, s_pos, s_starts = [], [], [], [0]
        for term in sorted(by_term):
            posts = by_term[term]
            s_starts.append(s_starts[-1] + len(posts))
            for o, tf, ps in posts:
                s_ords.append(o)
                s_tfs.append(tf)
                s_pos.extend(ps)
        assert ts.tolist() == s_starts
        assert ords.tolist() == s_ords
        assert tfs.tolist() == s_tfs
        assert pos.tolist() == s_pos

    check()


def test_tokenize_arrays_wide_vocab_uint32_path():
    """Vocab > 2^16 forces the uint32 sort-key path (the narrow uint16
    remap covers small-vocab batches); both must reproduce the scalar
    grouping. 70k distinct tokens across docs exercises the wide branch
    plus the narrow/wide boundary invariance on a prefix subset."""
    import numpy as np

    from spyglass_spark.analysis.analyzer import tokenize_arrays

    toks = [f"tok{i}x" for i in range(70_000)]
    # mix in repeats so tfs > 1 appear
    texts = [" ".join(toks[i::7]) + " common common" for i in range(7)]
    vocab, ts, ords, tfs, pos, counts = tokenize_arrays(list(texts), "default")
    assert len(vocab) == 70_001
    # scalar reconstruction (default analyzer: lowercase alnum runs <40B)
    by_term: dict = {}
    scounts = []
    for ord_, t in enumerate(texts):
        words = t.split()
        scounts.append(len(words))
        d: dict = {}
        for p, term in enumerate(words):
            d.setdefault(term, []).append(p)
        for term, ps in d.items():
            by_term.setdefault(term, []).append((ord_, len(ps), ps))
    svocab = sorted(by_term)
    assert vocab == svocab
    assert counts.tolist() == scounts
    s_ords, s_tfs, s_starts = [], [], [0]
    for term in svocab:
        posts = by_term[term]
        s_starts.append(s_starts[-1] + len(posts))
        for o, tf, _ in posts:
            s_ords.append(o)
            s_tfs.append(tf)
    assert ts.tolist() == s_starts
    assert ords.tolist() == s_ords
    assert tfs.tolist() == s_tfs
