"""Text analysis operators for training-data pipelines: quality scoring,
token counting, document fingerprinting, language-marker id. All pure JVM
DataFrame expressions with exact DuckDB-SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..analysis.analyzer import STOP_WORDS

TOKEN_RE = "[a-z0-9]+"
# BPE-ish word/punct segmentation: word pieces OR single non-space symbols
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def quality_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality features: token count, char length, mean token
    length, stopword ratio (spyglass's 44-word list), distinct-token ratio."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    n = F.size(toks)
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(F.when(n > 0, F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, v: a + v) / n)
            .otherwise(F.lit(0.0)), 4).alias("mean_tok_len"),
        F.round(F.when(n > 0, F.size(F.filter(
            toks, lambda t: F.array_contains(stop_arr, t))) / n)
            .otherwise(F.lit(0.0)), 4).alias("stopword_ratio"),
        F.round(F.when(n > 0, F.size(F.array_distinct(toks)) / n)
            .otherwise(F.lit(0.0)), 4).alias("distinct_ratio"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per doc."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE)).cast("long").alias("n_bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str,
                window: int = 24, stride: int = 10) -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over character windows
    sampled every ``stride`` chars (a 1-min winnowing sketch). Identical
    docs → identical fingerprints; robust to small appends."""
    starts = F.sequence(F.lit(1),
                        F.greatest(F.length(text_col) - F.lit(window - 1), F.lit(1)),
                        F.lit(stride))
    hashes = F.transform(starts, lambda i: F.md5(F.col(text_col).substr(i, F.lit(window))))
    return df.select(F.col(id_col).alias("id"),
                     F.array_min(hashes).alias("fingerprint"))


LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "y"],
}


def langid_ngram(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-token language id heuristic: predict the language whose
    marker set hits the most tokens; 'und' when nothing matches.
    Deterministic tie-break by language code."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        scores.append(F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
            F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"))


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1): per doc,
    the fraction of alphanumeric characters covered by the single most
    frequent token 2-gram and 3-gram (count x gram-char-length /
    total-token-chars; ties broken by gram text ascending). High values
    mark boilerplate/spam for corpus filtering.

    JVM-only plan: the n-gram arrays are built with transform/sequence
    inside codegen; one partial-aggregated groupBy per doc-gram — keys
    are doc-local so the shuffle has no skew and the combine collapses
    each doc's grams map-side."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"),
                     F.aggregate(toks, F.lit(0).cast("long"),
                                 lambda acc, x: acc + F.length(x))
                     .alias("char_total"))

    def gram_structs(n: int):
        arr = F.when(
            F.size("t") >= n,
            F.transform(F.sequence(F.lit(0), F.size("t") - n),
                        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)))
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(arr, lambda g: F.struct(F.lit(n).alias("n"),
                                                   g.alias("gram")))

    # BOTH gram sizes ride one explode → one groupBy → one window: a
    # single corpus scan and two shuffles total, no caching needed
    exploded = base.select(
        "id", "char_total",
        F.explode(F.concat(gram_structs(2), gram_structs(3))).alias("g"))
    counts = (exploded
              .select("id", "char_total", F.col("g.n").alias("n"),
                      F.col("g.gram").alias("gram"))
              .groupBy("id", "char_total", "n", "gram")
              .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("id", "n").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (counts.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .withColumn("frac",
                       F.round((F.col("cnt") * (F.length("gram") - (F.col("n") - 1)))
                               / F.col("char_total"), 4)))
    fracs = top.groupBy("id").agg(
        F.max(F.when(F.col("n") == 2, F.col("frac"))).alias("f2"),
        F.max(F.when(F.col("n") == 3, F.col("frac"))).alias("f3"))
    return (base.select("id").join(fracs, "id", "left")
            .select("id",
                    F.coalesce("f2", F.lit(0.0)).alias("top2gram_char_frac"),
                    F.coalesce("f3", F.lit(0.0)).alias("top3gram_char_frac")))
