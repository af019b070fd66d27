"""Golden tests for the highlight preview — mirrors the reference's own
test at /root/reference/crates/spyglass-searcher/src/utils.rs:161-174."""

from spyglass_spark.query.highlight import (first_words,
                                            generate_highlight_preview,
                                            group_urls_by_scheme)


def test_find_highlights_reference_golden():
    blurb = "Rust rust is a multi-paradigm, high-level, general-purpose programming"
    desc = generate_highlight_preview("rust programming", blurb)
    assert desc == ("<span><mark>Rust</mark> <mark>rust</mark> is a "
                    "multi-paradigm, high-level, general-purpose "
                    "<mark>programming</mark> ...</span>")


def test_no_match():
    assert generate_highlight_preview("zzz", "nothing here") == "<span></span>"


def test_window_merge_and_cap():
    words = []
    for i in range(40):
        words.append("filler%d" % i)
        if i % 10 == 0:
            words.append("target")
    text = " ".join(words)
    out = generate_highlight_preview("target", text)
    assert out.count("<mark>target</mark>") == 4
    assert out.startswith("<span>") and out.endswith("</span>")


def test_max_matches_stop():
    text = " ".join(["hit"] * 50)
    out = generate_highlight_preview("hit", text)
    # scan stops once matches exceed 5 (reference checks after append)
    assert out.count("<mark>hit</mark>") == 6


def test_first_words():
    assert first_words("a b c d e", 3) == "a b c"


def test_group_urls_by_scheme():
    g = group_urls_by_scheme(["https://a", "file://b", "https://c"])
    assert g == {"https": ["https://a", "https://c"], "file": ["file://b"]}
