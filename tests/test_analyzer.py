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
