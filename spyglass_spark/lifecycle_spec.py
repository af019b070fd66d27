"""Deterministic spec of the driver-graded index-lifecycle sequence.

The ``search_lifecycle`` / ``search_lifecycle_marker`` driver rows grade
the full mutation surface — upsert (delete+re-add delta generation,
client/local.rs:39-66), predicate + url tombstone deletes
(api/handler/mod.rs:256-293), and whole-index compaction — by applying
ONE fixed, corpus-derived mutation sequence and searching the result.
Post-compaction the index is definitionally a fresh build over the
mutated corpus (builder.compact_index re-indexes the live rows), so the
pure-Python scalar oracle can precompute the expected hits exactly
(tools/make_search_fixtures.py) without replicating multi-generation
stats accounting.

Both the live entry (__spark_entry__._get_lifecycle_engine) and the
fixture generator derive the mutation set from the corpus itself via
these constants — pure data, importable from either side without
touching engine code (the generator's self-certification constraint).
"""

# every url in this domain is tombstoned via the predicate-delete path
DELETE_DOMAIN = "src3"

# the N lexicographically-smallest urls of this domain are tombstoned
# via the url-list delete path (a second, independent tombstone dir)
DELETE_URLS_DOMAIN = "src7"
DELETE_URLS_N = 2

# the lexicographically-smallest url of this domain gets its content
# replaced by content + "\n" + MARKER (same url => same UUIDv5 doc_id:
# the delete+re-add upsert contract), sha256 recomputed to keep the
# input_hint invariant
MODIFY_DOMAIN = "src5"
MARKER = "zzlifecyclemarker zzlifecyclemarker spark merge join"


def modified_content(content: str) -> str:
    return content + "\n" + MARKER
