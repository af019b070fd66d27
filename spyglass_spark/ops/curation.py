"""Corpus-curation operators for LLM training-data pipelines: LM quality
scoring (the perplexity-filter step), benchmark decontamination, and
deterministic stratified sampling/mixing.

All pure DataFrame plans (JVM expressions, no Python UDFs) built on
md5/sha256/string builtins that exist identically in Spark SQL and DuckDB,
so each has an exact cross-engine oracle.

100-TB posture:
- LM scoring: the bigram model is O(charset²) rows → broadcast join; the
  doc pass is a narrow explode + one agg.
- Decontamination: the benchmark (eval-set) shingle side is tiny next to
  the corpus → broadcast equi-join; cost ∝ corpus shingles.
- Sampling: a pure hash predicate in the scan stage — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import shingles


def _bigrams(text_col: str):
    """Character bigrams of the raw text as an array column. The inner
    greatest(…, 1) guards Spark's sequence(1, 0), which would generate a
    DESCENDING [1, 0]; the length filter then drops the <2-char tails of
    empty/1-char docs."""
    return F.expr(
        f"filter(transform(sequence(1, greatest(length({text_col}) - 1, 1)), "
        f"i -> substring({text_col}, i, 2)), b -> length(b) = 2)")


def char_bigram_model(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus character-bigram model: (bigram, cnt, total) — total is the
    corpus-wide bigram count, so cnt/total is the joint probability."""
    bg = (df.select(F.explode(_bigrams(text_col)).alias("bigram"))
          .groupBy("bigram").agg(F.count("*").alias("cnt")))
    return bg.crossJoin(F.broadcast(bg.agg(F.sum("cnt").alias("total"))))


def lm_quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc mean JOINT log-probability of its character bigrams under
    the corpus's own bigram model — the cheap stand-in for the perplexity
    filter of C4/RefinedWeb-style pipelines: documents made of bigrams
    the corpus rarely produces (mojibake, binary spill, exotic
    boilerplate) score far below the corpus mean. (Joint, not
    conditional: P(c2|c1) would score a unique-prefix garbage char as
    perfectly predictable.) Returns (id, n_bigrams, lm_logprob) with
    lm_logprob = round(avg ln(cnt/total), 4); docs shorter than 2 chars
    score 0.0 over 0 bigrams.

    The model side is O(charset²) rows → broadcast; scoring is one
    explode + one broadcast join + one agg.
    """
    model = char_bigram_model(df, text_col)
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(_bigrams(text_col)).alias("bigram"))
    scored = (toks.join(F.broadcast(model), "bigram")
              .groupBy("id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.round(F.avg(F.log(F.col("cnt").cast("double")
                                       / F.col("total"))), 4)
                   .alias("lm_logprob")))
    base = df.select(F.col(id_col).alias("id"))
    return (base.join(scored, "id", "left")
            .select("id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("lm_logprob", F.lit(0.0)).alias("lm_logprob")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, text_col: str,
                  id_col: str, n: int = 3, min_overlap: int = 1) -> DataFrame:
    """Benchmark decontamination (GPT-3/The-Pile style): flag corpus docs
    sharing >= ``min_overlap`` distinct word n-gram shingles with ANY
    benchmark (eval-set) document. Returns (id, n_overlap) for flagged
    docs. The benchmark shingle set is tiny → broadcast equi-join."""
    doc_sh = shingles(docs, text_col, id_col, n=n)
    bench_sh = (shingles(benchmark, text_col, id_col, n=n)
                .select("shingle").distinct())
    return (doc_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy("id").agg(F.count("*").alias("n_overlap"))
            .filter(F.col("n_overlap") >= min_overlap))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      rates: dict, default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixing step: keep a
    row iff sha256(key) lands under its stratum's rate. Pure predicate in
    the scan stage (no shuffle, no RNG, reproducible across runs and
    engines). ``rates`` maps stratum value → keep fraction in [0, 1]."""
    h = (F.conv(F.substring(F.sha2(F.col(key_col).cast("string"), 256),
                            1, 15), 16, 10)
         .cast("long") % F.lit(1_000_000))
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))) \
            .otherwise(rate)
    # round() — not a truncating cast — so a rate whose double product is
    # fractionally under the intended integer (0.567 → 566999.999…) still
    # maps to the exact threshold an oracle computes with round()
    return df.filter(h < F.round(rate * 1_000_000).cast("long"))


def pack_sequences(df: DataFrame, budget: int, token_col: str,
                   order_col: str, group_col: str | None = None) -> DataFrame:
    """Sequence packing — assign documents to fixed-token-budget training
    packs (the sample-packing step before batching): docs are taken in
    deterministic ``order_col`` order and greedily filled;
    ``pack_id = floor(cumulative_tokens_before_doc / budget)``. A pack
    may overflow by less than one document (contiguous-fill semantics —
    the window-expressible form; bin-perfect packing needs sequential
    state and buys little at corpus scale).

    Scale: with ``group_col`` the running sum is a per-group window —
    embarrassing parallelism across groups (pack per source/shard, the
    realistic layout). Without it the window is global = ONE task;
    documented small-frame-only."""
    w = (Window.partitionBy(group_col) if group_col else
         Window.partitionBy(F.lit(0))).orderBy(order_col)
    cum_before = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0)).cast("long")
    return df.withColumn(
        "pack_id", F.floor(cum_before / F.lit(int(budget))).cast("long"))


# conservative patterns that parse identically in Java regex (Spark) and
# DuckDB's RE2: no lookarounds, no \b-adjacent unicode classes
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("hexkey", r"[0-9a-fA-F]{32,}", "<KEY>"),
    ("longdigits", r"[0-9][0-9 -]{9,}[0-9]", "<NUM>"),
]


def c4_line_clean(df: DataFrame, text_col: str, id_col: str,
                  min_words: int = 3,
                  boilerplate_doc_threshold: int = 5,
                  require_terminal_punct: bool = False) -> DataFrame:
    """C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2): the
    line filters that turn raw web text into training text.

    Per line: drop lines with fewer than ``min_words`` whitespace-words,
    optionally lines without terminal punctuation
    (``require_terminal_punct`` — C4 uses it for prose; off by default
    for code corpora). Corpus-wide: a surviving line whose normalized
    form (lower+trim) occurs in at least ``boilerplate_doc_threshold``
    DISTINCT docs is boilerplate (cookie banners, nav menus, license
    headers) and every occurrence is dropped — a deterministic variant
    of C4's keep-one-of-three-sentence-spans rule; reference semantics
    only, the published pipeline is the spec, not this repo's upstream.

    Returns (id, clean_text, n_lines_kept, n_lines_total) for EVERY
    input doc — a doc whose lines are all dropped comes back with
    clean_text = ''.

    Scale shape: one posexplode (row-multiply — repartition the input
    first when it arrives as few parquet splits), line filters in
    codegen, ONE groupBy on the normalized-line hash for the document
    frequencies (identical lines co-locate; partial aggregation
    map-side), one shuffle back on the line key (AQE turns it into a
    broadcast when the boilerplate set is small — the common case, since
    the threshold filter keeps only heavy hitters), one groupBy(id) to
    reassemble. No Python in the plan.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    wc = F.size(F.filter(F.split(F.trim(F.col("line")), "\\s+"),
                         lambda x: x != ""))
    keep = wc >= min_words
    if require_terminal_punct:
        keep = keep & F.col("line").rlike("[.!?\"']\\s*$")
    eligible = (lines.withColumn("norm", F.lower(F.trim(F.col("line"))))
                .filter(keep))
    boiler = (eligible.groupBy("norm")
              .agg(F.count_distinct("id").alias("docs"))
              .filter(F.col("docs") >= boilerplate_doc_threshold)
              .select("norm"))
    kept = eligible.join(boiler, "norm", "left_anti")
    out = (kept.groupBy("id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"]),
                    "\n").alias("clean_text"),
                F.count("*").alias("n_lines_kept")))
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines_total"))
    return (totals.join(out, "id", "left")
            .select("id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
                    "n_lines_total"))


def redact_pii(df: DataFrame, text_col: str,
               out_col: str = "redacted") -> DataFrame:
    """PII scrubbing — the pre-training redaction pass: replace emails,
    IPv4 addresses, ≥32-hex-char strings (keys/hashes), and ≥11-char
    digit runs (phone/card shapes) with typed placeholder tokens, plus a
    ``pii_hits`` count of replacements. Pure regexp_replace chain in
    whole-stage codegen — no Python, no shuffle, linear scan at any
    scale. Pattern ORDER matters (hexkey before longdigits would differ
    the other way around) and is part of the contract."""
    col = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    n_tokens = sum(
        (F.length(col) - F.length(F.regexp_replace(col, F.lit(tok), "")))
        / len(tok)
        for _, _, tok in PII_PATTERNS)
    return df.withColumn(out_col, col) \
             .withColumn("pii_hits", n_tokens.cast("long"))
