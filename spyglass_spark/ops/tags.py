"""Tag/lens sidecar operations (the SQLite-dimension joins of the
reference, re-expressed as broadcast DataFrame joins).

check_query_for_tags — /root/reference/crates/entities/src/models/tag.rs:372-383:
  tokens of the query equijoined against lower(tags.value) → tag ids to
  boost at 1.5 (wired into search at api/handler/search.rs:50-57).
resolve_lenses — search.rs:39-47: lens names → 'lens'-label tag ids used
  as filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_query_for_tags(query: str, tags_dim: DataFrame) -> DataFrame:
    """Tag ids whose lower(value) equals a whitespace token of the query.
    Returns (id, label, value) — broadcast-join against the tiny dim."""
    tokens = [t.lower() for t in query.split() if t]
    if not tokens:
        return tags_dim.filter(F.lit(False))
    return (tags_dim.filter(F.lower(F.col("value")).isin(tokens))
            .select("id", "label", "value"))


def resolve_lenses(lenses: list[str], tags_dim: DataFrame) -> list[int]:
    """Lens names → tag ids (labels 'lens'), driver-side (dims are tiny)."""
    if not lenses:
        return []
    rows = (tags_dim.filter((F.col("label") == "lens") &
                            F.col("value").isin(list(lenses)))
            .select("id").collect())
    return sorted(int(r["id"]) for r in rows)


def search_with_lenses(engine, query: str, lenses: list[str],
                       tags_dim: DataFrame, k: int = 5, offset: int = 0):
    """The full search_docs prep pipeline (search.rs:23-129): lens names →
    tag filters; query tokens ∩ tag values → 1.5-boosted tag ids; then the
    BM25 engine."""
    filters = [("tag", t) for t in resolve_lenses(lenses, tags_dim)]
    boost_ids = [int(r["id"]) for r in check_query_for_tags(query, tags_dim).collect()]
    boosts = [("tag", t) for t in sorted(boost_ids)]
    return engine.search(query, filters=filters, boosts=boosts, k=k, offset=offset)
