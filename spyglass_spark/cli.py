"""spark-submit entry point (BASELINE north_star: "runs via spark-submit
--py-files on multi-executor clusters").

Usage:
  # package the library for executors
  zip -r spyglass_spark.zip spyglass_spark

  spark-submit --py-files spyglass_spark.zip -m ... spyglass_spark/cli.py \
      build  --corpus /path/corpus.parquet --index /path/index \
             [--partitions 128] [--waves 4]
  spark-submit ... cli.py search --index /path/index --query "fn main" \
             [--k 5] [--offset 0] [--tag 3] [--algo auto]
  spark-submit ... cli.py stats  --index /path/index

The RPC surface of the reference (search_docs / add_document_batch /
delete_document, spyglass-rpc/src/lib.rs:35-51) maps to:
  build → add_document_batch (bulk), search → search_docs,
  delete → spyglass_spark.index.builder.delete_by_ids.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):  # run as a bare script (spark-submit cli.py)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None, spark=None) -> int:
    """CLI entry. ``spark`` may be injected (tests); an injected session
    is not stopped on exit."""
    p = argparse.ArgumentParser(prog="spyglass-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index from a corpus table")
    b.add_argument("--corpus", required=True,
                   help="parquet path with (repo,path,commit,lang,content) "
                        "or a documents table with (doc_id,url,domain,title,content,tags)")
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=128)
    b.add_argument("--waves", type=int, default=4)

    s = sub.add_parser("search", help="BM25 top-k search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--tag", type=int, action="append", default=[],
                   help="tag-id filter (repeatable)")
    s.add_argument("--boost-tag", type=int, action="append", default=[])
    s.add_argument("--modified-since-us", type=int, default=None,
                   help="lastmodified >= µs-epoch fast-field filter")
    s.add_argument("--modified-before-us", type=int, default=None)
    s.add_argument("--published-since-us", type=int, default=None)
    s.add_argument("--published-before-us", type=int, default=None)
    s.add_argument("--mode", default="text",
                   choices=["text", "prefix", "fuzzy", "wildcard", "regex",
                            "phrase-prefix", "term-range", "term-set",
                            "parsed"],
                   help="query interpretation: free text (default) or a "
                        "multi-term pattern rewrite over the dictionary "
                        "(phrase-prefix = search-as-you-type: the last "
                        "token is a prefix completing the phrase; "
                        "term-range = tantivy RangeQuery, --query "
                        "'lower,upper' with either side empty for "
                        "unbounded, lower inclusive / upper exclusive "
                        "unless --include-upper; parsed = the full "
                        "query-string grammar: +must -not field:term "
                        "\"phrase\"~slop term^boost field:[a TO b])")
    s.add_argument("--fuzzy-distance", type=int, default=1)
    s.add_argument("--include-upper", action="store_true",
                   help="term-range mode: make the upper bound inclusive")
    s.add_argument("--algo", default="auto", choices=["auto", "exhaustive"])
    s.add_argument("--combiner", default="sum", choices=["sum", "dismax"],
                   help="Should-group score combiner: clause sum "
                        "(default, tantivy BooleanQuery) or dismax "
                        "(Lucene DisjunctionMaxQuery: best clause + "
                        "tie-breaker x the rest; text mode)")
    s.add_argument("--tie-breaker", type=float, default=0.0,
                   help="dismax tie breaker in [0, 1]")
    s.add_argument("--min-should-match", default="0",
                   help="require at least this many distinct Should "
                        "clauses to match (Lucene BooleanQuery "
                        "setMinimumNumberShouldMatch / ES "
                        "minimum_should_match; 0/1 = plain union; "
                        "accepts ES spec strings: -1 = all but one, "
                        "75%% / -25%% of the compiled Should count, "
                        "floor-rounded; text and parsed modes)")
    s.add_argument("--as-of", type=int, default=None,
                   help="search the manifest snapshot at this commit_seq "
                        "(time travel; see index stats for current seq)")
    s.add_argument("--sort-by", default=None,
                   choices=["lastmodified", "published"],
                   help="order the match set by this fast field instead "
                        "of BM25 score (TopDocs::order_by_u64_field "
                        "collector analog; url-asc tie-break)")
    s.add_argument("--sort-asc", action="store_true",
                   help="with --sort-by: ascending instead of descending")
    s.add_argument("--after-value", type=int, default=None,
                   help="with --sort-by: deep-paging cursor — the sort "
                        "value of the previous page's last hit (pair "
                        "with --after-url; replaces --offset, O(k) at "
                        "any depth)")
    s.add_argument("--after-url", default=None,
                   help="with --sort-by: the url of the previous page's "
                        "last hit (the unique tie-break half of the "
                        "cursor)")
    s.add_argument("--collapse-by", default=None,
                   help="ES field collapsing: keep only the best-scored "
                        "hit per distinct value of this doc-meta column "
                        "(e.g. domain), then the usual top-k page")
    s.add_argument("--rescore-query", default=None,
                   help="ES rescore phase: re-rank the top "
                        "--rescore-window primary hits by "
                        "query_weight*primary + rescore_weight*secondary")
    s.add_argument("--rescore-window", type=int, default=50,
                   help="with --rescore-query: primary window size")
    s.add_argument("--query-weight", type=float, default=1.0,
                   help="with --rescore-query: primary score weight")
    s.add_argument("--rescore-weight", type=float, default=1.0,
                   help="with --rescore-query: secondary score weight")

    u = sub.add_parser("upsert", help="delete+re-add documents by url "
                                      "(delta generation)")
    u.add_argument("--corpus", required=True,
                   help="corpus or documents shaped parquet of the new rows")
    u.add_argument("--index", required=True)
    u.add_argument("--partitions", type=int, default=16)
    u.add_argument("--max-generations", type=int, default=None,
                   help="auto-merge policy: fold oldest generation pairs "
                        "until at most this many remain (tantivy "
                        "background-merge analog)")

    st = sub.add_parser("stats", help="print the committed manifest")
    st.add_argument("--index", required=True)

    sn = sub.add_parser("snapshots", help="list manifest-history snapshots "
                                          "(the valid search --as-of "
                                          "targets), newest last")
    sn.add_argument("--index", required=True)
    sn.add_argument("--expire-keep", type=int, default=None,
                    help="expire_snapshots maintenance: drop all but the "
                         "newest N history pointers (small JSON only — "
                         "segment data is reclaimed by merges/compaction, "
                         "never by this)")

    sg = sub.add_parser("suggest", help="spelling suggestions for a term "
                                        "(Lucene DirectSpellChecker / ES "
                                        "term-suggester analog; pyarrow "
                                        "metadata plane, no Spark session)")
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument("--field", default="content")
    sg.add_argument("--distance", type=int, default=2)
    sg.add_argument("--limit", type=int, default=5)
    sg.add_argument("--mode", default="popular",
                    choices=["missing", "popular", "always"],
                    help="ES suggest_mode: missing = only when the term "
                         "is absent; popular = only more-frequent "
                         "corrections (default); always = all in-distance")
    sg.add_argument("--whole-query", action="store_true",
                    help="treat --term as a whole query: analyze it with "
                         "the field's analyzer, correct each analyzed "
                         "term (Lucene SpellChecker collate-style "
                         "rewrite; use --mode missing for the classic "
                         "fix-only-absent-terms shape) and print the "
                         "rewritten query — one dictionary read, no "
                         "Spark session")

    d = sub.add_parser("delete", help="tombstone doc ids or urls "
                                      "(delete_document_by_url RPC analog)")
    d.add_argument("--index", required=True)
    d.add_argument("--doc-id", action="append", default=[])
    d.add_argument("--url", action="append", default=[],
                   help="tombstone every live copy of this url by ordinal "
                        "(cluster-side side table, nothing collected)")
    d.add_argument("--domain", action="append", default=[],
                   help="tombstone every doc in a domain "
                        "(delete_domain RPC analog)")
    d.add_argument("--tag", type=int, action="append", default=[],
                   help="tombstone every doc carrying a tag id "
                        "(uninstall_lens document-cleanup analog)")

    c = sub.add_parser("compact", help="full rewrite: collapse ALL "
                                       "generations from the row store")
    c.add_argument("--index", required=True)
    c.add_argument("--corpus", required=True,
                   help="system-of-record table (corpus or documents shape)")
    c.add_argument("--partitions", type=int, default=None)

    mg = sub.add_parser("merge", help="incremental merge of the two oldest "
                                      "generations (no row store needed)")
    mg.add_argument("--index", required=True)
    mg.add_argument("--gen", type=int, action="append", default=None,
                    help="generation ids to merge (repeatable; default: "
                         "the two oldest)")
    mg.add_argument("--policy", choices=("log",), default=None,
                    help="run a merge POLICY instead of one explicit merge: "
                         "'log' = tantivy LogMergePolicy analog (size-tiered "
                         "levels, merges fire when a level has "
                         "--min-num-segments members)")
    mg.add_argument("--min-num-segments", type=int, default=8)
    mg.add_argument("--max-docs-before-merge", type=int, default=10_000_000)
    mg.add_argument("--min-layer-size", type=int, default=10_000)
    mg.add_argument("--level-log-size", type=float, default=0.75)

    fs = sub.add_parser("fsck", help="distributed integrity audit: decode/"
                                     "re-encode every posting chunk, check "
                                     "norms/doc_meta bounds and term_stats "
                                     "consistency; exit 1 on any violation")
    fs.add_argument("--index", required=True)
    fs.add_argument("--corpus", default=None,
                    help="optional system-of-record table: also verify "
                         "every live doc's stored content_sha256 against "
                         "sha256 of the source content")

    ex = sub.add_parser("export", help="materialize a query's FULL match "
                                       "set as a parquet dataset (the "
                                       "training-data extraction sink)")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--corpus", required=True,
                    help="system-of-record table — the export carries its "
                         "full rows, matched by url against the index")
    ex.add_argument("--out", required=True, help="output parquet directory")
    ex.add_argument("--columns", default=None,
                    help="comma-separated exported columns (default: all)")
    ex.add_argument("--partition-by", default=None,
                    help="comma-separated layout columns (e.g. domain)")
    ex.add_argument("--num-files", type=int, default=None)
    ex.add_argument("--tag", type=int, action="append", default=[],
                    help="tag filter Musts, repeatable")
    ex.add_argument("--as-of", type=int, default=None)
    ex.add_argument("--scored", action="store_true",
                    help="attach a float32 BM25 score column (full scored "
                         "match set, export_scored)")
    ex.add_argument("--min-score", type=float, default=None,
                    help="with --scored: export only docs with score >= "
                         "this relevance threshold")
    ex.add_argument("--parsed", action="store_true",
                    help="interpret --query with the query-string grammar "
                         "(--mode parsed of search) instead of free text")

    pc = sub.add_parser("percolate", help="reverse search: which stored "
                        "queries match each document of a corpus (ES "
                        "percolator analog — one Spark job, no index)")
    pc.add_argument("--corpus", required=True,
                    help="documents-or-raw-corpus parquet (the build "
                         "command's loader)")
    pc.add_argument("--spec", action="append", required=True,
                    dest="specs",
                    help="stored query: a plain query string, or a JSON "
                         "object {key, query, filters, boosts, "
                         "min_should_match, exclude_tags}; repeatable")

    ag = sub.add_parser("agg", help="unscored aggregations over a query's "
                                    "FULL match set (not top-k)")
    ag.add_argument("--index", required=True)
    ag.add_argument("--query", required=True)
    ag.add_argument("--parsed", action="store_true",
                    help="interpret --query with the query-string grammar "
                         "(--mode parsed of search) instead of free text")
    ag.add_argument("--kind", default="facets",
                    choices=["facets", "date-histogram", "histogram",
                             "histogram-stats", "stats", "percentiles",
                             "percentile-ranks", "facet-stats", "range",
                             "cardinality", "extended-stats", "top-hits",
                             "terms", "count", "significant-terms",
                             "filters", "rare-terms", "composite",
                             "missing", "value-count", "weighted-avg",
                             "median-absolute-deviation", "boxplot",
                             "multi-terms", "adjacency-matrix",
                             "auto-date-histogram", "string-stats"])
    ag.add_argument("--filter", action="append", default=[],
                    dest="filter_specs", metavar="KEY:COL:OP:VALUE",
                    help="filters only: one condition of bucket KEY "
                         "(conditions sharing a KEY are ANDed; buckets "
                         "may overlap); OP one of eq/ne/lt/lte/gt/gte/"
                         "like/contains; all-digit VALUE auto-cast to "
                         "int; repeatable, request order")
    ag.add_argument("--other-bucket", action="store_true",
                    help="filters only: append the ES _other_ bucket "
                         "(docs matching NO filter)")
    ag.add_argument("--max-doc-count", type=int, default=1,
                    help="rare-terms only: keep facet values with "
                         "doc_count <= this (ES default 1)")
    ag.add_argument("--source", action="append", default=[],
                    dest="sources", metavar="NAME:COL[:KIND[:INTERVAL]]",
                    help="composite only: bucket source — KIND terms "
                         "(default) | histogram | date_histogram "
                         "(INTERVAL in µs); repeatable, key-tuple order")
    ag.add_argument("--after", action="append", default=[],
                    help="composite only: previous page's last key "
                         "tuple, one value per source in order "
                         "(all-digit values auto-cast to int)")
    ag.add_argument("--weight-col", default="published",
                    choices=["lastmodified", "published"],
                    help="weighted-avg only: the weight field")
    ag.add_argument("--multi-col", action="append", default=[],
                    dest="multi_cols",
                    help="multi-terms only: facet column of the value "
                         "tuple; repeatable, key order")
    ag.add_argument("--target-buckets", type=int, default=10,
                    help="auto-date-histogram only: the bucket budget "
                         "the chosen ladder interval must fit")
    ag.add_argument("--col", default="domain",
                    help="cardinality only: column to distinct-count")
    ag.add_argument("--rsd", type=float, default=None,
                    help="cardinality only: use the HLL++ sketch at this "
                         "relative error (bounded-memory scale path) "
                         "instead of the exact two-phase agg")
    ag.add_argument("--range", action="append", default=[],
                    dest="ranges", metavar="KEY:LO:HI",
                    help="range only: half-open [LO,HI) bucket in µs, "
                         "empty bound = unbounded; repeatable")
    ag.add_argument("--sig-field", default="content",
                    help="significant-terms only: the indexed text field "
                         "whose terms are scored")
    ag.add_argument("--value", type=float, action="append", default=[],
                    dest="values",
                    help="percentile-ranks only: probe value, repeatable")
    ag.add_argument("--percent", type=float, action="append", default=[],
                    help="percentiles only: requested percent, repeatable "
                         "(default 1/5/25/50/75/95/99)")
    ag.add_argument("--approx-accuracy", type=int, default=None,
                    help="percentiles only: use the Greenwald-Khanna "
                         "sketch at this accuracy (the bounded-memory "
                         "scale path) instead of the exact aggregate")
    ag.add_argument("--facet-col", default="tags")
    ag.add_argument("--interval-us", type=int, default=86_400_000_000,
                    help="date-histogram bucket width in µs (default 1 day)")
    ag.add_argument("--date-col", default="lastmodified",
                    choices=["lastmodified", "published"])
    ag.add_argument("--shift", type=int, default=0,
                    help="extended-stats only: translation constant c in "
                         "µs — variance is shift-invariant, and shifting "
                         "by a corpus epoch keeps Σ(x−c)² inside "
                         "decimal(38,0) at any match count")
    ag.add_argument("--sigma", type=float, default=2.0,
                    help="extended-stats only: std bound multiplier")
    ag.add_argument("--k-hits", type=int, default=3,
                    help="top-hits only: docs kept per facet bucket")
    ag.add_argument("--hits-asc", action="store_true",
                    help="top-hits only: oldest-first instead of "
                         "most-recent-first")
    ag.add_argument("--min-doc-count", type=int, default=None,
                    help="histogram kinds only: 0 = tantivy's gap-filled "
                         "default (empty buckets between first and last "
                         "emitted as n=0), k>0 = keep buckets with >= k "
                         "docs; omit for occupied-only")
    ag.add_argument("--offset", type=int, default=0,
                    help="histogram kinds only: bucket grid translation "
                         "(HistogramAggregation offset)")
    ag.add_argument("--stats-col", default="published",
                    choices=["lastmodified", "published"],
                    help="histogram-stats only: the nested stats metric "
                         "column")
    ag.add_argument("--pipeline", default=None,
                    choices=["cumulative-sum", "derivative", "serial-diff",
                             "moving-fn"],
                    help="histogram kinds only: apply an ES parent "
                         "pipeline aggregation to the bucket counts "
                         "(prints (bucket, value) instead)")
    ag.add_argument("--lag", type=int, default=1,
                    help="serial-diff only: difference distance in buckets")
    ag.add_argument("--window", type=int, default=5,
                    help="moving-fn only: sliding window size (previous N "
                         "buckets excluding the current — ES shift=0)")
    ag.add_argument("--moving-func", default="unweightedAvg",
                    help="moving-fn only: one of the ES MovingFunctions "
                         "(unweightedAvg sum min max stdDev "
                         "linearWeightedAvg)")
    ag.add_argument("--hard-bounds", default=None, metavar="LO:HI",
                    help="histogram only: values outside the closed "
                         "[LO, HI] range are ignored")
    ag.add_argument("--extended-bounds", default=None, metavar="LO:HI",
                    help="histogram only (with --min-doc-count 0): widen "
                         "the gap-filled grid to cover [LO, HI]")
    ag.add_argument("--size", type=int, default=10,
                    help="terms only: buckets kept (count desc, key asc); "
                         "sum_other_doc_count reports what fell outside")
    ag.add_argument("--tag", type=int, action="append", default=[],
                    help="tag filter Musts, repeatable")
    ag.add_argument("--k", type=int, default=None,
                    help="facets only: top-k facet values")
    ag.add_argument("--as-of", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "stats":
        from spyglass_spark.index.manifest import load_manifest

        m = load_manifest(args.index)
        print(m.to_json() if m else "{}")
        return 0
    if args.cmd == "snapshots":
        from spyglass_spark.index.manifest import (expire_history,
                                                   list_snapshots)

        expired = (expire_history(args.index, keep_last=args.expire_keep)
                   if args.expire_keep is not None else [])
        print(json.dumps({"snapshots": list_snapshots(args.index),
                          "expired": expired}))
        return 0
    if args.cmd == "suggest":
        import os

        from spyglass_spark.index.fuzzy_dict import fuzzy_dict_path
        from spyglass_spark.index.manifest import load_manifest
        from spyglass_spark.query.expand import (normalize_pattern,
                                                 suggest_terms)

        m = load_manifest(args.index)
        if m is None or not m.committed:
            p.error(f"no committed index manifest in {args.index}")
        stats = [f"{args.index}/{g['prefix']}/term_stats"
                 for g in m.gen_list()]
        fz = fuzzy_dict_path(args.index, m.commit_seq)
        fuzzy_paths = ([fz] if os.path.exists(os.path.join(fz, "_SUCCESS"))
                       else None)
        if args.whole_query:
            from spyglass_spark.analysis.analyzer import (tokenize_default,
                                                          tokenize_en)
            from spyglass_spark.query.expand import suggest_query_terms

            tok = (tokenize_en if args.field == "content"
                   else tokenize_default)
            toks = [t for _, t in tok(args.term or "")]
            sug = suggest_query_terms(stats, args.field, toks,
                                      distance=args.distance,
                                      limit=args.limit, mode=args.mode,
                                      fuzzy_paths=fuzzy_paths)
            corrected = " ".join(sug[t][0][0] if sug.get(t) else t
                                 for t in toks)
            print(json.dumps({
                "query": " ".join(toks), "corrected": corrected,
                "changed": corrected != " ".join(toks),
                "terms": [{"term": t, "suggestions": [
                    {"term": s, "df": d, "dist": x}
                    for s, d, x in sug.get(t, [])]}
                    for t in dict.fromkeys(toks)]}))
            return 0
        norm = normalize_pattern(args.term)
        out = (suggest_terms(stats, args.field, norm,
                             distance=args.distance, limit=args.limit,
                             mode=args.mode, fuzzy_paths=fuzzy_paths)
               if norm else [])
        print(json.dumps({"term": norm, "suggestions": [
            {"term": t, "df": d, "dist": x} for t, d, x in out]}))
        return 0
    if args.cmd == "delete":
        if not (args.doc_id or args.url or args.domain or args.tag):
            p.error("delete: provide --doc-id, --url, --domain and/or --tag")
        if args.doc_id:
            from spyglass_spark.index.builder import delete_by_ids

            m = delete_by_ids(args.index, args.doc_id)
            if not (args.url or args.domain or args.tag):
                print(json.dumps({"tombstones": len(m.tombstones)}))
                return 0
        # url/domain/tag deletes need a session (ordinals resolved
        # cluster-side)

    owns_session = spark is None
    if owns_session:
        from spyglass_spark.session import get_spark

        spark = get_spark(f"spyglass-{args.cmd}")
        spark.sparkContext.setLogLevel("WARN")
    try:
        if args.cmd == "compact":
            from spyglass_spark.corpus import to_documents
            from spyglass_spark.index.builder import compact_index
            from spyglass_spark.sources import read_corpus

            df = read_corpus(spark, args.corpus)
            if "url" not in df.columns:
                df = to_documents(df)
            m = compact_index(spark, df, args.index,
                              num_partitions=args.partitions)
            print(m.to_json())
        elif args.cmd == "merge":
            if args.policy == "log":
                from spyglass_spark.index.merge_policy import \
                    apply_log_merge_policy

                m = apply_log_merge_policy(
                    spark, args.index,
                    min_num_segments=args.min_num_segments,
                    max_docs_before_merge=args.max_docs_before_merge,
                    min_layer_size=args.min_layer_size,
                    level_log_size=args.level_log_size)
            else:
                from spyglass_spark.index.builder import merge_generations

                m = merge_generations(spark, args.index, gen_ids=args.gen)
            print(m.to_json())
        elif args.cmd == "delete":  # --url/--domain/--tag (ids above)
            from spyglass_spark.index.builder import (delete_by_domain,
                                                      delete_by_tag,
                                                      delete_by_urls)

            if args.url:
                m = delete_by_urls(spark, args.index, args.url)
            for dom in args.domain:
                m = delete_by_domain(spark, args.index, dom)
            for tag in args.tag:
                m = delete_by_tag(spark, args.index, tag)
            print(json.dumps({"tombstones": len(m.tombstones),
                              "tombstone_dirs": m.tombstone_dirs}))
        elif args.cmd == "build":
            from spyglass_spark.corpus import to_documents
            from spyglass_spark.index.builder import build_index
            from spyglass_spark.sources import read_corpus

            # read_corpus validates shape and synthesizes the corpus from
            # the raw testdata table when given one
            df = read_corpus(spark, args.corpus)
            if "url" not in df.columns:  # corpus shape → documents shape
                df = to_documents(df)
            m = build_index(spark, df, args.index,
                            num_partitions=args.partitions, waves=args.waves)
            print(m.to_json())
        elif args.cmd == "percolate":
            from spyglass_spark.corpus import to_documents
            from spyglass_spark.ops.percolate import percolate
            from spyglass_spark.sources import read_corpus

            df = read_corpus(spark, args.corpus)
            if "url" not in df.columns:
                df = to_documents(df)
            specs = []
            for s in args.specs:
                s = s.strip()
                specs.append(json.loads(s) if s.startswith("{") else s)
            for r in percolate(spark, df, specs).collect():
                print(json.dumps({"query_key": r["query_key"],
                                  "url": r["url"]}))
        elif args.cmd == "upsert":
            from spyglass_spark.corpus import to_documents
            from spyglass_spark.index.builder import upsert_documents
            from spyglass_spark.sources import read_corpus

            df = read_corpus(spark, args.corpus)
            if "url" not in df.columns:
                df = to_documents(df)
            m = upsert_documents(spark, df, args.index,
                                 num_partitions=args.partitions,
                                 max_generations=args.max_generations)
            print(m.to_json())
        elif args.cmd == "fsck":
            from spyglass_spark.index.fsck import fsck

            source = None
            if args.corpus:
                from spyglass_spark.corpus import to_documents
                from spyglass_spark.sources import read_corpus

                source = read_corpus(spark, args.corpus)
                if "url" not in source.columns:
                    source = to_documents(source)
            rows = (fsck(spark, args.index, source=source)
                    .orderBy("gen", "field").collect())
            bad = 0
            for r in rows:
                print(json.dumps({c: r[c] for c in r.asDict()}))
                bad += r["violations"] + r["stats_mismatches"]
            return 0 if bad == 0 else 1
        elif args.cmd == "search":
            from spyglass_spark.query.executor import SearchEngine

            eng = SearchEngine(spark, args.index, as_of=args.as_of)
            filters = [("tag", t) for t in args.tag]
            for kind, v in (("lastmodified_ge", args.modified_since_us),
                            ("lastmodified_le", args.modified_before_us),
                            ("published_ge", args.published_since_us),
                            ("published_le", args.published_before_us)):
                if v is not None:
                    filters.append((kind, v))
            boosts = [("tag", t) for t in args.boost_tag]
            if args.rescore_query is not None:
                for r in eng.search_rescore(
                        args.query, args.rescore_query, filters=filters,
                        boosts=boosts, window_size=args.rescore_window,
                        query_weight=args.query_weight,
                        rescore_weight=args.rescore_weight,
                        k=args.k).collect():
                    print(json.dumps({
                        "rank": r["rank"], "url": r["url"],
                        "domain": r["domain"], "title": r["title"],
                        "score": float(r["score"]),
                        "primary_score": float(r["primary_score"])}))
                return 0
            if args.collapse_by is not None:
                for r in eng.search_collapse(
                        args.query, filters=filters, boosts=boosts,
                        collapse_col=args.collapse_by, k=args.k,
                        offset=args.offset).collect():
                    print(json.dumps({
                        "rank": r["rank"], "url": r["url"],
                        args.collapse_by: r[args.collapse_by],
                        "title": r["title"],
                        "score": float(r["score"])}))
                return 0
            if args.sort_by is not None:
                if (args.after_value is None) != (args.after_url is None):
                    p.error("--after-value and --after-url go together")
                after = (None if args.after_value is None
                         else (args.after_value, args.after_url))
                for r in eng.search_sorted(
                        args.query, filters=filters, boosts=boosts,
                        col=args.sort_by, k=args.k, offset=args.offset,
                        asc=args.sort_asc, after=after).collect():
                    print(json.dumps({
                        "rank": r["rank"], "url": r["url"],
                        "domain": r["domain"], "title": r["title"],
                        args.sort_by: int(r[args.sort_by])}))
                return 0
            common = dict(filters=filters, boosts=boosts, k=args.k,
                          offset=args.offset, algo=args.algo)
            if args.mode == "text":
                rows = eng.search(args.query, combiner=args.combiner,
                                  tie_breaker=args.tie_breaker,
                                  min_should_match=args.min_should_match,
                                  **common).collect()
            elif args.mode == "parsed":
                rows = eng.search_parsed(args.query,
                                         combiner=args.combiner,
                                         tie_breaker=args.tie_breaker,
                                         min_should_match=args.min_should_match,
                                         **common).collect()
            elif args.mode == "fuzzy":
                rows = eng.search_fuzzy(args.query,
                                        distance=args.fuzzy_distance,
                                        **common).collect()
            elif args.mode == "term-range":
                # --query "lower,upper" (either side empty = unbounded)
                lo, _, hi = args.query.partition(",")
                rows = eng.search_term_range(
                    lo or None, hi or None,
                    include_upper=args.include_upper, **common).collect()
            elif args.mode == "term-set":
                # --query "term1,term2,..." (exact terms, comma-separated)
                terms = [t for t in args.query.split(",") if t]
                rows = eng.search_term_set(terms, **common).collect()
            else:
                fn = {"prefix": eng.search_prefix,
                      "wildcard": eng.search_wildcard,
                      "regex": eng.search_regex,
                      "phrase-prefix": eng.search_phrase_prefix}[args.mode]
                rows = fn(args.query, **common).collect()
            for r in rows:
                print(json.dumps({"rank": r["rank"], "doc_id": r["doc_id"],
                                  "url": r["url"], "score": float(r["score"])}))
        elif args.cmd == "export":
            from spyglass_spark.corpus import to_documents
            from spyglass_spark.query.executor import SearchEngine
            from spyglass_spark.sources import read_corpus

            eng = SearchEngine(spark, args.index, as_of=args.as_of)
            df = read_corpus(spark, args.corpus)
            if "url" not in df.columns:
                df = to_documents(df)
            q_arg = ({"parsed": args.query} if args.parsed
                     else args.query)
            kwargs = dict(
                filters=[("tag", t) for t in args.tag],
                columns=args.columns.split(",") if args.columns else None,
                partition_by=(args.partition_by.split(",")
                              if args.partition_by else ()),
                num_files=args.num_files)
            if args.scored:
                stats = eng.export_scored(q_arg, df, args.out,
                                          min_score=args.min_score, **kwargs)
            else:
                stats = eng.export_matches(q_arg, df, args.out, **kwargs)
            print(json.dumps(stats))
        elif args.cmd == "agg":
            from spyglass_spark.query.executor import SearchEngine

            eng = SearchEngine(spark, args.index, as_of=args.as_of)
            filters = [("tag", t) for t in args.tag]
            q_arg = ({"parsed": args.query} if args.parsed
                     else args.query)

            def _print_buckets(df):
                """Shared histogram/date-histogram emitter: raw
                (bucket, n) counts, or (bucket, value) after the
                requested parent pipeline aggregation (integer-exact
                for the difference/sum kinds, double for moving-fn)."""
                if args.pipeline == "moving-fn":
                    out = eng.moving_fn(df, window=args.window,
                                        func=args.moving_func)
                    for r in out.collect():
                        print(json.dumps({"bucket": int(r["bucket"]),
                                          "value": float(r["value"])}))
                    return
                if args.pipeline:
                    fn = {"cumulative-sum": eng.cumulative_sum,
                          "derivative": eng.derivative,
                          "serial-diff": lambda d: eng.serial_diff(
                              d, lag=args.lag)}[args.pipeline]
                    for r in fn(df).collect():
                        print(json.dumps({"bucket": int(r["bucket"]),
                                          "value": int(r["value"])}))
                    return
                for r in df.collect():
                    print(json.dumps({"bucket": int(r["bucket"]),
                                      "n": int(r["n"])}))

            if args.kind == "facets":
                rows = eng.facet_counts(q_arg, filters=filters,
                                        k_tags=args.k).collect()
                for r in rows:
                    print(json.dumps({"tag_id": r["tag_id"],
                                      "n": int(r["n"])}))
            elif args.kind == "date-histogram":
                df = eng.date_histogram(
                    q_arg, filters=filters,
                    interval_us=args.interval_us, date_col=args.date_col,
                    min_doc_count=args.min_doc_count)
                _print_buckets(df)
            elif args.kind == "histogram":
                def _bounds(spec):
                    if spec is None:
                        return None
                    lo, hi = spec.split(":")
                    return (int(lo), int(hi))
                df = eng.histogram(
                    q_arg, filters=filters, col=args.date_col,
                    interval=args.interval_us, offset=args.offset,
                    min_doc_count=args.min_doc_count,
                    hard_bounds=_bounds(args.hard_bounds),
                    extended_bounds=_bounds(args.extended_bounds))
                _print_buckets(df)
            elif args.kind == "terms":
                rows = eng.terms_agg(q_arg, filters=filters,
                                     facet_col=args.facet_col,
                                     size=args.size).collect()
                for r in rows:
                    print(json.dumps({
                        "tag_id": r["tag_id"],
                        "doc_count": int(r["doc_count"]),
                        "sum_other_doc_count":
                            int(r["sum_other_doc_count"])}))
            elif args.kind == "percentiles":
                from spyglass_spark.query.percentile import DEFAULT_PERCENTS
                rows = eng.percentiles(
                    q_arg, filters=filters, col=args.date_col,
                    percents=tuple(args.percent) or DEFAULT_PERCENTS,
                    approx_accuracy=args.approx_accuracy).collect()
                for r in rows:
                    print(json.dumps({"pct": float(r["pct"]),
                                      "value": float(r["value"])}))
            elif args.kind == "percentile-ranks":
                rows = eng.percentile_ranks(
                    q_arg, filters=filters, col=args.date_col,
                    values=tuple(args.values)).collect()
                for r in rows:
                    print(json.dumps({"value": float(r["value"]),
                                      "pct": float(r["pct"])}))
            elif args.kind == "range":
                ranges = []
                for spec in args.ranges:
                    key, lo, hi = spec.split(":")
                    ranges.append((key, int(lo) if lo else None,
                                   int(hi) if hi else None))
                rows = eng.range_agg(q_arg, filters=filters,
                                     col=args.date_col,
                                     ranges=ranges).collect()
                for r in rows:
                    print(json.dumps({
                        "range_key": r["range_key"],
                        "lo": None if r["lo"] is None else int(r["lo"]),
                        "hi": None if r["hi"] is None else int(r["hi"]),
                        "n": int(r["n"])}))
            elif args.kind == "significant-terms":
                rows = eng.significant_terms(
                    q_arg, filters=filters, field=args.sig_field,
                    size=args.size,
                    min_doc_count=(3 if args.min_doc_count is None
                                   else args.min_doc_count)).collect()
                for r in rows:
                    print(json.dumps({
                        "term": r["term"], "fg": int(r["fg"]),
                        "bg": int(r["bg"]), "score": float(r["score"])}))
            elif args.kind == "count":
                rows = eng.count_matches(q_arg,
                                         filters=filters).collect()
                print(json.dumps({"n": int(rows[0]["n"])}))
            elif args.kind == "cardinality":
                rows = eng.cardinality(q_arg, filters=filters,
                                       col=args.col, rsd=args.rsd).collect()
                print(json.dumps({"n_distinct": int(rows[0]["n_distinct"])}))
            elif args.kind == "histogram-stats":
                def _hbounds(spec):
                    if spec is None:
                        return None
                    lo, hi = spec.split(":")
                    return (int(lo), int(hi))
                rows = eng.histogram_stats(
                    q_arg, filters=filters, col=args.date_col,
                    interval=args.interval_us, offset=args.offset,
                    stats_col=args.stats_col,
                    min_doc_count=args.min_doc_count,
                    hard_bounds=_hbounds(args.hard_bounds)).collect()
                for r in rows:
                    print(json.dumps({
                        "bucket": int(r["bucket"]),
                        "doc_count": int(r["doc_count"]), "n": int(r["n"]),
                        "min": None if r["min"] is None else int(r["min"]),
                        "max": None if r["max"] is None else int(r["max"]),
                        "sum": None if r["sum"] is None else int(r["sum"]),
                        "avg": None if r["avg"] is None
                        else float(r["avg"])}))
            elif args.kind == "facet-stats":
                rows = eng.facet_stats(q_arg, filters=filters,
                                       facet_col=args.facet_col,
                                       col=args.date_col,
                                       k_tags=args.k).collect()
                for r in rows:
                    print(json.dumps({
                        "tag_id": r["tag_id"],
                        "doc_count": int(r["doc_count"]), "n": int(r["n"]),
                        "min": None if r["min"] is None else int(r["min"]),
                        "max": None if r["max"] is None else int(r["max"]),
                        "sum": None if r["sum"] is None else int(r["sum"]),
                        "avg": None if r["avg"] is None
                        else float(r["avg"])}))
            elif args.kind == "extended-stats":
                r = eng.extended_stats(q_arg, filters=filters,
                                       col=args.date_col, sigma=args.sigma,
                                       shift=args.shift).collect()[0]
                print(json.dumps({
                    "n": int(r["n"]),
                    "min": None if r["min"] is None else int(r["min"]),
                    "max": None if r["max"] is None else int(r["max"]),
                    "sum": None if r["sum"] is None else int(r["sum"]),
                    "avg": None if r["avg"] is None else float(r["avg"]),
                    "sum_of_squares": None if r["sum_of_squares"] is None
                    else float(r["sum_of_squares"]),
                    "variance": None if r["variance"] is None
                    else float(r["variance"]),
                    "std_deviation": None if r["std_deviation"] is None
                    else float(r["std_deviation"]),
                    "std_upper": None if r["std_upper"] is None
                    else float(r["std_upper"]),
                    "std_lower": None if r["std_lower"] is None
                    else float(r["std_lower"])}))
            elif args.kind == "filters":
                specs: dict = {}
                for spec in args.filter_specs:
                    key, col, op, val = spec.split(":", 3)
                    specs.setdefault(key, []).append(
                        (col, op, int(val) if val.isdigit() else val))
                rows = eng.filters_agg(
                    q_arg, filters=filters, specs=specs,
                    other_bucket=args.other_bucket).collect()
                for r in rows:
                    print(json.dumps({"filter_key": r["filter_key"],
                                      "n": int(r["n"])}))
            elif args.kind == "rare-terms":
                rows = eng.rare_terms(
                    q_arg, filters=filters, facet_col=args.facet_col,
                    max_doc_count=args.max_doc_count).collect()
                for r in rows:
                    print(json.dumps({"tag_id": r["tag_id"],
                                      "doc_count": int(r["doc_count"])}))
            elif args.kind == "composite":
                srcs = []
                for spec in args.sources:
                    parts = spec.split(":")
                    s = {"name": parts[0], "col": parts[1]}
                    if len(parts) > 2:
                        s["kind"] = parts[2]
                    if len(parts) > 3:
                        s["interval"] = int(parts[3])
                    srcs.append(s)
                after = tuple(int(v) if v.isdigit() else v
                              for v in args.after) or None
                rows = eng.composite_agg(
                    q_arg, filters=filters, sources=tuple(srcs),
                    size=args.size, after=after).collect()
                for r in rows:
                    d = {s["name"]: r[s["name"]] for s in srcs}
                    d["doc_count"] = int(r["doc_count"])
                    print(json.dumps(d))
            elif args.kind == "missing":
                rows = eng.missing_count(q_arg, filters=filters,
                                         col=args.col).collect()
                print(json.dumps({"n": int(rows[0]["n"])}))
            elif args.kind == "value-count":
                rows = eng.value_count(q_arg, filters=filters,
                                       col=args.col).collect()
                print(json.dumps({"n": int(rows[0]["n"])}))
            elif args.kind == "weighted-avg":
                r = eng.weighted_avg(q_arg, filters=filters,
                                     col=args.date_col,
                                     weight_col=args.weight_col) \
                       .collect()[0]
                print(json.dumps({
                    "n": int(r["n"]),
                    "value": None if r["value"] is None
                    else float(r["value"])}))
            elif args.kind == "median-absolute-deviation":
                r = eng.median_absolute_deviation(
                    q_arg, filters=filters, col=args.date_col).collect()[0]
                print(json.dumps({
                    "n": int(r["n"]),
                    "mad": None if r["mad"] is None else float(r["mad"])}))
            elif args.kind == "boxplot":
                r = eng.boxplot(q_arg, filters=filters,
                                col=args.date_col).collect()[0]
                print(json.dumps({
                    "n": int(r["n"]),
                    **{k: (None if r[k] is None else float(r[k]))
                       for k in ("min", "max", "q1", "q2", "q3",
                                 "lower", "upper")}}))
            elif args.kind == "multi-terms":
                mcols = args.multi_cols or ["domain", "tags"]
                rows = eng.multi_terms(q_arg, filters=filters,
                                       facet_cols=tuple(mcols),
                                       size=args.size).collect()
                for r in rows:
                    d = {c: r[c] for c in mcols}
                    d["doc_count"] = int(r["doc_count"])
                    d["sum_other_doc_count"] = int(r["sum_other_doc_count"])
                    print(json.dumps(d))
            elif args.kind == "adjacency-matrix":
                specs: dict = {}
                for spec in args.filter_specs:
                    key, col, op, val = spec.split(":", 3)
                    specs.setdefault(key, []).append(
                        (col, op, int(val) if val.isdigit() else val))
                rows = eng.adjacency_matrix(q_arg, filters=filters,
                                            specs=specs).collect()
                for r in rows:
                    print(json.dumps({"filter_key": r["filter_key"],
                                      "n": int(r["n"])}))
            elif args.kind == "string-stats":
                r = eng.string_stats(q_arg, filters=filters,
                                     col=args.col).collect()[0]
                print(json.dumps({
                    "count": int(r["count"]),
                    "min_length": None if r["min_length"] is None
                    else int(r["min_length"]),
                    "max_length": None if r["max_length"] is None
                    else int(r["max_length"]),
                    "avg_length": None if r["avg_length"] is None
                    else float(r["avg_length"]),
                    "entropy": float(r["entropy"])}))
            elif args.kind == "auto-date-histogram":
                rows = eng.auto_date_histogram(
                    q_arg, filters=filters, date_col=args.date_col,
                    target_buckets=args.target_buckets).collect()
                for r in rows:
                    print(json.dumps({
                        "bucket": int(r["bucket"]), "n": int(r["n"]),
                        "interval_us": int(r["interval_us"])}))
            elif args.kind == "top-hits":
                rows = eng.top_hits(q_arg, filters=filters,
                                    facet_col=args.facet_col,
                                    sort_col=args.date_col,
                                    k_hits=args.k_hits,
                                    asc=args.hits_asc).collect()
                for r in rows:
                    print(json.dumps({
                        "tag_id": r["tag_id"], "rank": int(r["rank"]),
                        "url": r["url"],
                        "sort_value": int(r["sort_value"])}))
            else:
                r = eng.field_stats(q_arg, filters=filters,
                                    col=args.date_col).collect()[0]
                print(json.dumps({
                    "n": int(r["n"]),
                    "min": None if r["min"] is None else int(r["min"]),
                    "max": None if r["max"] is None else int(r["max"]),
                    "sum": None if r["sum"] is None else int(r["sum"]),
                    "avg": None if r["avg"] is None else float(r["avg"])}))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
