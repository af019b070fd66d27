"""URL-based lens rules — the reference's lens definitions resolve domains,
url prefixes and rules into ALLOW/SKIP regexes that decide which URLs belong
to a lens (/root/reference/crates/spyglass-lens/src/lib.rs:74-96 into_regexes,
types.rs:13-70 LensRule, utils.rs:1-51 regex builders). Crawl-time in the
reference; re-expressed Spark-first as a compiled JVM `rlike` predicate over
the url column, used two ways:

  * index-time: `apply_lens` selects the docs that belong to a lens so the
    lens tag can be assigned (search-time lens filtering then rides the
    normal tag Must filter — the test_url_lens_search shape,
    spyglass-searcher/src/lib.rs:293-303);
  * query-time: `lens_url_predicate` is a plain Column usable as a filter
    on any url-bearing DataFrame.

Regex semantics are kept identical across Spark (Java regex), DuckDB (RE2)
and Python `re` so lens membership has an exact cross-engine oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

# Characters escaped before building a regex from a literal fragment.
# (Python re.escape over-escapes for Java; this set is the common ASCII
# metacharacter set valid and identical in Java regex, RE2 and Python re.)
_META = set("\\.+*?()|[]{}^$")


def _escape(s: str) -> str:
    return "".join("\\" + ch if ch in _META else ch for ch in s)


def regex_for_domain(domain: str) -> str:
    """Base domain → URL regex; '*' is a wildcard
    (utils.rs:3-13: ``^(http://|https://){domain}.*``)."""
    body = "".join(".*" if ch == "*" else _escape(ch) for ch in domain)
    return f"^(http://|https://){body}.*"


def regex_for_prefix(prefix: str) -> str:
    """URL prefix → regex (utils.rs:15-22). A trailing ``$`` pins an exact
    match; otherwise everything under the prefix matches. The prefix is a
    pre-built regex fragment in the reference (not escaped) — kept as-is."""
    if prefix.endswith("$"):
        return f"^{prefix}"
    return f"^{prefix}.*"


def regex_for_robots(rule: str) -> str | None:
    """robots.txt-style rule → regex (utils.rs:24-51): '*' → '.*',
    '^' kept (marks an anchored end), everything else escaped; an
    unanchored rule gets a trailing '.*'."""
    if not rule:
        return None
    out = []
    has_end = False
    for ch in rule:
        if ch == "*":
            out.append(".*")
        elif ch == "^":
            out.append("^")
            has_end = True
        else:
            out.append(_escape(ch))
    regex = "".join(out)
    if not has_end and not regex.endswith(".*"):
        regex += ".*"
    return regex


@dataclass(frozen=True)
class LimitURLDepth:
    """Limit URLs under ``prefix`` to ``depth`` path segments
    (types.rs:16-20, to_regex types.rs:56-60).

    The reference emits ``{{0, N}}`` with a space, which the Rust regex
    crate parses as a repetition; Java regex / RE2 / Python treat the
    spaced form as a literal brace — we emit the equivalent spaceless
    quantifier so the semantics (not the bytes) match."""

    prefix: str
    depth: int

    def to_regex(self) -> str:
        prefix = self.prefix.rstrip("/")
        return f"^{prefix}/?(/[^/]+/?){{0,{self.depth}}}$"


@dataclass(frozen=True)
class SkipURL:
    """URLs matching the rule are excluded from the lens (types.rs:21-22)."""

    rule: str

    def to_regex(self) -> str:
        regex = regex_for_robots(self.rule)
        if regex is None:
            raise ValueError("Invalid SkipURL regex")
        return regex


@dataclass(frozen=True)
class SanitizeUrls:
    """URL rewrite rule (types.rs:23-32): URLs matching ``rule`` get their
    query parameters stripped when ``remove_query_parameter`` is set."""

    rule: str
    remove_query_parameter: bool = True

    def to_regex(self) -> str:
        regex = regex_for_robots(self.rule)
        if regex is None:
            raise ValueError("Invalid SanitizeUrls regex")
        return regex


def lens_filters(domains=(), urls=(), rules=()) -> tuple[list[str], list[str]]:
    """LensConfig::into_regexes (lib.rs:74-96): (allowed, skipped) regex
    lists. Domains and url prefixes allow; LimitURLDepth allows; SkipURL
    skips; SanitizeUrls contributes no filter."""
    allowed = [regex_for_domain(d) for d in domains]
    allowed += [regex_for_prefix(u) for u in urls]
    skipped = []
    for r in rules:
        if isinstance(r, LimitURLDepth):
            allowed.append(r.to_regex())
        elif isinstance(r, SkipURL):
            skipped.append(r.to_regex())
        # SanitizeUrls: no filter contribution
    return allowed, skipped


def lens_url_predicate(url_col: str | Column, allowed: list[str],
                       skipped: list[str]) -> Column:
    """One JVM boolean Column: url matches ≥1 allowed regex and no skipped
    regex (the crawler's should_crawl decision as a pushable predicate)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    if allowed:
        cond = None
        for rx in allowed:
            m = col.rlike(rx)
            cond = m if cond is None else (cond | m)
    else:
        cond = F.lit(False)
    for rx in skipped:
        cond = cond & ~col.rlike(rx)
    return cond


def apply_lens(df: DataFrame, url_col: str, domains=(), urls=(),
               rules=()) -> DataFrame:
    """Rows of ``df`` whose url belongs to the lens."""
    allowed, skipped = lens_filters(domains, urls, rules)
    return df.filter(lens_url_predicate(url_col, allowed, skipped))


def sanitize_urls(df: DataFrame, url_col: str, rules=()) -> DataFrame:
    """Apply SanitizeUrls rewrites: strip '?query' from urls matching a
    remove_query_parameter rule (types.rs:23-32). Non-matching urls pass
    through unchanged."""
    out = F.col(url_col)
    for r in rules:
        if isinstance(r, SanitizeUrls) and r.remove_query_parameter:
            out = F.when(F.col(url_col).rlike(r.to_regex()),
                         F.regexp_replace(out, r"\?.*$", "")).otherwise(out)
    return df.withColumn(url_col, out)


def tag_lens_docs(docs: DataFrame, url_col: str, tag_id: int,
                  domains=(), urls=(), rules=(),
                  tags_col: str = "tags") -> DataFrame:
    """Append ``tag_id`` to the tags of every doc whose url the lens
    matches — the index-time analog of the reference assigning lens tags
    to crawled docs; search-time lens filtering is then the ordinary
    Must(tag) path."""
    allowed, skipped = lens_filters(domains, urls, rules)
    pred = lens_url_predicate(url_col, allowed, skipped)
    tagged = F.array_sort(F.array_union(
        F.coalesce(F.col(tags_col), F.array().cast("array<long>")),
        F.array(F.lit(tag_id).cast("long"))))
    return docs.withColumn(tags_col, F.when(pred, tagged).otherwise(F.col(tags_col)))
