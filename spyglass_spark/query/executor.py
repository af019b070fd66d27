"""Distributed BM25 top-k query execution over the segment store.

Execution model (mirrors the reference searcher's per-segment scoring +
global heap, /root/reference/crates/spyglass-searcher/src/client/local.rs:98-154,
re-expressed Spark-first):

1. Compile queries driver-side with the SAME analyzer code as indexing
   (terms_for_field parity, query.rs:237-259).
2. Look up global term stats (df) from the term-sorted stats store —
   parquet min/max pruning makes this a tiny selective scan; N, avgdl come
   from the manifest. BM25 weights are computed once per query in float32
   (the reference builds Bm25Weight once per query from searcher-global
   stats).
3. Scan ONLY the query terms' posting chunks (predicate pushdown on the
   term-sorted store), cogroup them with the per-partition fieldnorm
   arrays on part_id — posting chunks of all query terms for the same doc
   range land together, so scoring (incl. positional phrase matching and
   block-max WAND pruning) runs vectorized per partition with NO
   doc-level shuffle.
4. Each partition emits its local top-(k+offset); the global top-k merge
   is a tiny sort (parts × (k+offset) rows) — the TopDocs collector analog.
5. Hits join back to doc_meta (broadcast) for display fields; score > 0
   post-filter per client/local.rs:138; tie-break (score desc, doc_ord asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..index.builder import ORD_SHIFT
from ..index.codecs import decode_block_meta, decode_positions, decode_postings
from ..index.manifest import Manifest, load_manifest
from .compiler import CompiledQuery, compile_query
from .scoring import K1, idf, norm_cache, score_postings, sloppy_phrase_count

RESULT_SCHEMA = "query_id long, doc_ord long, score float"


def _wand_eligible(specs) -> bool:
    """Block-max WAND handles the standard search shape: a scoring Should
    group + zero-boost Must filters (+ MustNots). Scoring musts /
    favorite-Should extras fall back to the exhaustive scorer."""
    for s in specs:
        if s["role"] in ("should_extra", "extra_group"):
            return False
        if s["role"] == "must" and s["scoring"]:
            return False
    return any(s["role"] == "should" for s in specs)


def _run_wand(q, payload, caches, norm_arrays, limit, local_tomb):
    """Execute one query via block-max WAND. Returns (local_ords, scores)
    or None to fall back (e.g. a filter term longer than this chunk)."""
    from .wand import _ClauseData, wand_top_k

    scoring = []
    for spec in q["specs"]:
        if spec["role"] != "should":
            continue
        rows = [payload.get((spec["field"], t)) for t in spec["terms"]]
        if any(r is None for r in rows):
            continue  # clause can't match in this part
        scoring.append(_ClauseData(spec, rows, caches[spec["field"]],
                                   norm_arrays.get(spec["field"])))
    if not scoring:
        return np.empty(0, np.int64), np.empty(0, np.float32)

    include = None
    exclude = local_tomb
    for spec in q["specs"]:
        if spec["role"] == "must":
            row = payload.get((spec["field"], spec["terms"][0]))
            m = (np.empty(0, np.int64) if row is None else
                 decode_postings(row["doc_bytes"], row["tf_bytes"])[0].astype(np.int64))
            include = m if include is None else np.intersect1d(
                include, m, assume_unique=True)
        elif spec["role"] == "must_not":
            row = payload.get((spec["field"], spec["terms"][0]))
            if row is not None:
                m = decode_postings(row["doc_bytes"], row["tf_bytes"])[0].astype(np.int64)
                exclude = m if exclude is None else np.union1d(exclude, m)
    if include is not None and include.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    return wand_top_k(scoring, include, exclude, limit)


def _clause_specs(cq: CompiledQuery, dfs: dict, n_docs: int) -> list[dict]:
    """Flatten a compiled query into serializable clause specs with
    precomputed float32 weights. Clause order defines float32 sum order —
    keep identical to the oracle (should_group, musts, should_extra)."""
    specs = []

    def weight_for(clause) -> float:
        if clause.kind == "term":
            d = dfs.get((clause.field, clause.terms[0]), 0)
            return float(np.float32(clause.boost) * idf(d, n_docs) * (K1 + np.float32(1.0)))
        idf_sum = np.float32(0.0)
        for t in clause.terms:
            idf_sum += idf(dfs.get((clause.field, t), 0), n_docs)
        return float(np.float32(clause.boost) * idf_sum * (K1 + np.float32(1.0)))

    def add(clause, role, group=0):
        specs.append({
            "kind": clause.kind, "field": clause.field, "terms": list(clause.terms),
            "positions": list(clause.positions), "slop": clause.slop,
            "boost": clause.boost, "weight": weight_for(clause),
            "scoring": clause.scoring, "role": role, "group": group,
        })

    for c in cq.should_group:
        add(c, "should")
    for gi, grp in enumerate(cq.extra_groups):
        for c in grp:
            add(c, "extra_group", gi)
    for c in cq.musts:
        add(c, "must")
    for c in cq.should_extra:
        add(c, "should_extra")
    for c in cq.must_nots:
        add(c, "must_not")
    return specs


def _score_partition(plan: dict, postings_pdf: pd.DataFrame, norms_pdf: pd.DataFrame):
    """Score every query of ``plan`` against one doc partition. Returns
    (query_id, doc_ord, score) rows for the per-partition top candidates."""
    if len(postings_pdf) == 0:
        return pd.DataFrame({"query_id": [], "doc_ord": [], "score": []}).astype(
            {"query_id": "int64", "doc_ord": "int64", "score": "float32"})
    part_id = int(postings_pdf["part_id"].iloc[0])
    base = np.uint64(part_id) << np.uint64(ORD_SHIFT)
    norm_arrays = {r["field"]: np.frombuffer(r["norm_bytes"], dtype=np.uint8)
                   for _, r in norms_pdf.iterrows()}
    # posting payloads for this part, keyed (field, term)
    payload = {(r["field"], r["term"]): r for _, r in postings_pdf.iterrows()}
    caches = plan["caches"]
    limit = plan["limit"]
    tomb = plan.get("tombstone_ords")
    algo = plan.get("algo", "auto")
    out_q, out_d, out_s = [], [], []

    def term_postings(field, term):
        row = payload.get((field, term))
        if row is None:
            return None
        docs, tfs = decode_postings(row["doc_bytes"], row["tf_bytes"])
        return docs, tfs, row

    def local_tombstones():
        if tomb is None or not tomb.size:
            return None
        lt = tomb[(tomb >> ORD_SHIFT) == part_id] & ((1 << ORD_SHIFT) - 1)
        return lt.astype(np.int64) if lt.size else None

    for q in plan["queries"]:
        if algo != "exhaustive" and _wand_eligible(q["specs"]):
            res = _run_wand(q, payload, caches, norm_arrays, limit,
                            local_tombstones())
            if res is not None:
                ords_w, scores_w = res
                if ords_w.size:
                    sel = np.lexsort((ords_w, -scores_w.astype(np.float64)))[:limit]
                    out_q.append(np.full(sel.size, q["query_id"], dtype=np.int64))
                    out_d.append((base + ords_w[sel].astype(np.uint64)).astype(np.int64))
                    out_s.append(scores_w[sel])
                continue
        # per-clause (ords, scores) in clause order
        clause_results = []
        for spec in q["specs"]:
            field = spec["field"]
            cache = caches[field]
            norms = norm_arrays.get(field)
            if spec["kind"] == "term":
                tp = term_postings(field, spec["terms"][0])
                if tp is None:
                    clause_results.append((np.empty(0, np.int64), np.empty(0, np.float32), spec))
                    continue
                docs, tfs, _ = tp
                local = docs.astype(np.int64)
                nids = norms[local] if norms is not None else np.zeros(local.size, np.uint8)
                scores = (score_postings(tfs, nids, spec["weight"], cache)
                          if spec["scoring"] else np.zeros(local.size, np.float32))
                clause_results.append((local, scores, spec))
            else:  # phrase
                tps = [term_postings(field, t) for t in spec["terms"]]
                if any(tp is None for tp in tps):
                    clause_results.append((np.empty(0, np.int64), np.empty(0, np.float32), spec))
                    continue
                common = tps[0][0].astype(np.int64)
                for tp in tps[1:]:
                    common = np.intersect1d(common, tp[0].astype(np.int64),
                                            assume_unique=True)
                if common.size == 0:
                    clause_results.append((common, np.empty(0, np.float32), spec))
                    continue
                # decode positions only for common docs
                pos_per_term = []
                for tp in tps:
                    docs_t = tp[0].astype(np.int64)
                    row = tp[2]
                    plists = decode_positions(row["pos_bytes"], docs_t.size)
                    sel = np.searchsorted(docs_t, common)
                    pos_per_term.append([plists[i] for i in sel])
                offs = list(spec["positions"])
                slop = spec["slop"]
                tf_counts = np.fromiter(
                    (sloppy_phrase_count([pos_per_term[ti][ci] for ti in range(len(tps))],
                                         offs, slop)
                     for ci in range(common.size)), dtype=np.int64, count=common.size)
                mask = tf_counts > 0
                ords_m = common[mask]
                nids = norms[ords_m] if norms is not None else np.zeros(ords_m.size, np.uint8)
                scores = (score_postings(tf_counts[mask], nids, spec["weight"], cache)
                          if spec["scoring"] else np.zeros(ords_m.size, np.float32))
                clause_results.append((ords_m, scores, spec))

        # candidate set: Must(union of should group) ∩ each extra group ∩ musts − must_nots
        should = [r for r in clause_results if r[2]["role"] == "should"]
        must_sets = []
        if should:
            u = np.unique(np.concatenate([r[0] for r in should])) if should else \
                np.empty(0, np.int64)
            must_sets.append(u)
        groups: dict[int, list] = {}
        for r in clause_results:
            if r[2]["role"] == "extra_group":
                groups.setdefault(r[2]["group"], []).append(r[0])
        for gi in sorted(groups):
            must_sets.append(np.unique(np.concatenate(groups[gi])))
        for r in clause_results:
            if r[2]["role"] == "must":
                must_sets.append(r[0])
        if not must_sets:
            continue
        cand = must_sets[0]
        for s_ in must_sets[1:]:
            cand = np.intersect1d(cand, s_, assume_unique=True)
        for r in clause_results:
            if r[2]["role"] == "must_not":
                cand = np.setdiff1d(cand, r[0], assume_unique=True)
        if tomb is not None and tomb.size:
            local_tomb = tomb[(tomb >> ORD_SHIFT) == part_id] & ((1 << ORD_SHIFT) - 1)
            if local_tomb.size:
                cand = np.setdiff1d(cand, local_tomb.astype(np.int64), assume_unique=True)
        if cand.size == 0:
            continue
        # accumulate float32 scores in clause order (oracle-identical)
        acc = np.zeros(cand.size, dtype=np.float32)
        for ords_c, scores_c, spec in clause_results:
            if spec["role"] == "must_not" or ords_c.size == 0:
                continue
            pos = np.searchsorted(cand, ords_c)
            ok = (pos < cand.size)
            ok[ok] = cand[pos[ok]] == ords_c[ok]
            acc[pos[ok]] = acc[pos[ok]] + scores_c[ok]
        keep = acc > 0.0
        cand, acc = cand[keep], acc[keep]
        if cand.size == 0:
            continue
        if cand.size > limit:
            sel = np.lexsort((cand, -acc.astype(np.float64)))[:limit]
        else:
            sel = np.lexsort((cand, -acc.astype(np.float64)))
        out_q.append(np.full(sel.size, q["query_id"], dtype=np.int64))
        out_d.append((base + cand[sel].astype(np.uint64)).astype(np.int64))
        out_s.append(acc[sel])

    if not out_q:
        return pd.DataFrame({"query_id": [], "doc_ord": [], "score": []}).astype(
            {"query_id": "int64", "doc_ord": "int64", "score": "float32"})
    return pd.DataFrame({
        "query_id": np.concatenate(out_q),
        "doc_ord": np.concatenate(out_d),
        "score": np.concatenate(out_s)})


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        m = load_manifest(index_dir)
        if m is None or not m.committed:
            raise FileNotFoundError(f"no committed index manifest in {index_dir}")
        if m.version > 1:
            raise ValueError(
                f"index manifest version {m.version} is newer than this "
                "engine supports (1) — run a compaction/migration first "
                "(the v3→v4 whole-index rewrite pattern, SURVEY §1.1)")
        self.manifest: Manifest = m
        self.gens = m.gen_list()
        # base frames created once: Spark caches their file indexes, so
        # per-query work skips the parquet listing round trips
        self._postings_base = spark.read.parquet(*self._paths("postings"))
        self._norms_base = spark.read.parquet(*self._paths("norms"))
        self._doc_meta_base = spark.read.parquet(*self._paths("doc_meta"))

    def _paths(self, name: str) -> list[str]:
        return [f"{self.index_dir}/{g['prefix']}/{name}" for g in self.gens]

    # -- public API (Searcher::search analog) ---------------------------

    def search(self, query: str, filters=(), boosts=(), k: int = 5,
               offset: int = 0, algo: str = "auto") -> DataFrame:
        return self.search_many(
            [{"query": query, "filters": filters, "boosts": boosts}],
            k=k, offset=offset, algo=algo).drop("query_id")

    def search_many(self, queries: list[dict], k: int = 5, offset: int = 0,
                    algo: str = "auto") -> DataFrame:
        """Batch mode: one Spark job scores all queries. Each dict:
        {query, filters?, boosts?}. Returns (query_id, rank, doc_id, url,
        domain, title, score). ``algo``: 'auto' (block-max WAND where the
        query shape allows, exhaustive otherwise) or 'exhaustive'."""
        compiled = [compile_query(q["query"], q.get("filters", ()), q.get("boosts", ()))
                    for q in queries]
        return self._execute_compiled(compiled, k=k, offset=offset, algo=algo)

    def _execute_compiled(self, compiled: list[CompiledQuery], k: int = 5,
                          offset: int = 0, algo: str = "auto") -> DataFrame:
        spark = self.spark
        m = self.manifest
        keys = set()
        for cq in compiled:
            keys |= cq.term_keys()
        if not keys:
            return self._empty_result()

        fields = sorted({f for f, _ in keys})
        terms = sorted({t for _, t in keys})
        postings = (self._postings_base
                    .filter(F.col("field").isin(fields) & F.col("term").isin(terms))
                    .persist())
        # global df per (field, term) straight from the scanned chunk rows —
        # one cached scan serves both stats and scoring (df counts
        # tombstoned docs, matching tantivy's searcher-global stats)
        dfs = {(r["field"], r["term"]): int(r["df"]) for r in
               postings.groupBy("field", "term")
                       .agg(F.sum("df_part").alias("df")).collect()
               if (r["field"], r["term"]) in keys}
        cache_fields = set(m.field_totals) | {f for f, _ in keys}
        caches = {f: norm_cache(m.field_totals.get(f, 0) / m.num_docs
                                if m.num_docs else 1.0)
                  for f in cache_fields}
        plan = {
            "queries": [{"query_id": qi, "specs": _clause_specs(cq, dfs, m.num_docs)}
                        for qi, cq in enumerate(compiled)],
            "caches": caches,
            "limit": k + offset,
            "tombstone_ords": self._tombstone_ords(),
            "algo": algo,
        }

        # ship ONLY the norm arrays of partitions that actually hold chunks
        # of the query terms — at 10^12-doc scale the norms store is huge
        # and most queries touch a sliver of partitions
        touched_parts = postings.select("part_id").distinct()
        norms = (self._norms_base
                 .filter(F.col("field").isin(fields))
                 .join(touched_parts, "part_id", "leftsemi"))

        def run(pkey, post_pdf, norm_pdf):
            return _score_partition(plan, post_pdf, norm_pdf)

        partial = (postings.groupBy("part_id")
                   .cogroup(norms.groupBy("part_id"))
                   .applyInPandas(run, RESULT_SCHEMA))

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_ord"))
        topk = (partial.withColumn("rank", F.row_number().over(w))
                .filter((F.col("rank") > offset) & (F.col("rank") <= k + offset))
                .localCheckpoint(eager=True))  # scoring runs exactly once

        # prune the doc_meta scan to the hit partitions (store is sorted by
        # part_id → parquet row-group stats prune) before the broadcast join
        hit_parts = [int(r["part_id"]) for r in
                     topk.select((F.col("doc_ord") / F.lit(1 << ORD_SHIFT))
                                 .cast("long").alias("part_id"))
                         .distinct().collect()]
        doc_meta = (self._doc_meta_base.filter(F.col("part_id").isin(hit_parts))
                    if hit_parts else self._doc_meta_base)
        out = (topk.join(doc_meta.select("doc_ord", "doc_id", "url", "domain", "title"),
                         "doc_ord", "left")
               .select("query_id", "rank", "doc_id", "url", "domain", "title",
                       F.col("score").cast("float").alias("score"), "doc_ord")
               .orderBy("query_id", "rank"))
        postings.unpersist()
        return out

    def more_like_this(self, doc_id: str, documents: DataFrame, k: int = 5,
                       max_terms: int = 10) -> DataFrame:
        """Find documents similar to ``doc_id``: pick its ``max_terms``
        highest tf·idf content terms (idf from the index's global stats)
        and run them as a Should-group BM25 query, excluding the seed doc.
        ``documents`` is the stored row store (source table)."""
        from collections import Counter

        from ..analysis.analyzer import tokenize_en
        from .scoring import idf as idf_fn

        row = (documents.filter(F.col("doc_id") == doc_id)
               .select("content").collect())
        if not row:
            return self._empty_result().drop("query_id")
        tf = Counter(t for _, t in tokenize_en(row[0]["content"] or ""))
        dfs = self._term_dfs({("content", t) for t in tf})
        n = self.manifest.num_docs
        ranked = sorted(
            tf, key=lambda t: (-(tf[t] * float(idf_fn(dfs.get(("content", t), 0), n))), t))
        terms = ranked[:max_terms]
        if not terms:
            return self._empty_result().drop("query_id")
        # terms are ALREADY analyzed — build the clause tree directly
        # (re-analysis would double-stem)
        from .compiler import CompiledQuery as CQ
        from .compiler import _term

        cq = CQ(should_group=[_term("content", t, 1.0) for t in terms])
        hits = self._execute_compiled([cq], k=k + 1).drop("query_id")
        return (hits.filter(F.col("doc_id") != doc_id)
                .orderBy("rank").limit(k))

    def get_documents(self, doc_ids: list[str]) -> DataFrame:
        """Doc-store get-by-id (client/local.rs:71-95 analog): fetch the
        stored fields for exact doc ids. Tombstoned ids are excluded."""
        dm = (self.spark.read.parquet(*self._paths("doc_meta"))
              .filter(F.col("doc_id").isin(list(doc_ids))))
        tomb = self._tombstone_ords()
        if tomb.size:
            dm = dm.filter(~F.col("doc_ord").isin([int(t) for t in tomb]))
        return dm.select("doc_id", "url", "domain", "title", "doc_ord")

    def document_query(self, urls=(), ids=(), tags=(), exclude_tags=()) -> DataFrame:
        """Unscored document-set query (build_document_query +
        DocSetCollector, query.rs:184-231, client/local.rs:234-241):
        Must(any urls) AND Must(any ids) AND each tag AND NOT exclude_tags.
        Returns the full match set (no top-k, no scores)."""
        dm = self.spark.read.parquet(*self._paths("doc_meta"))
        cond = F.lit(True)
        if urls:
            cond = cond & F.col("url").isin(list(urls))
        if ids:
            cond = cond & F.col("doc_id").isin(list(ids))
        out = dm.filter(cond)
        for t in tags:
            ords = self._tag_ords(int(t))
            out = out.join(ords, "doc_ord", "leftsemi")
        for t in exclude_tags:
            ords = self._tag_ords(int(t))
            out = out.join(ords, "doc_ord", "leftanti")
        tomb = self._tombstone_ords()
        if tomb.size:
            out = out.filter(~F.col("doc_ord").isin([int(x) for x in tomb]))
        return out.select("doc_id", "url", "domain", "title", "doc_ord")

    def _tag_ords(self, tag_id: int) -> DataFrame:
        """Decode one tag term's posting chunks into a doc_ord DataFrame
        (Arrow-batched; the chunks are term-pruned at the parquet scan)."""
        import pandas as pd

        rows = (self.spark.read.parquet(*self._paths("postings"))
                .filter((F.col("field") == "tags") & (F.col("term") == str(tag_id)))
                .select("part_id", "doc_bytes", "tf_bytes"))

        def decode(batches):
            for pdf in batches:
                outs = []
                for _, r in pdf.iterrows():
                    docs, _ = decode_postings(r["doc_bytes"], r["tf_bytes"])
                    base = np.uint64(int(r["part_id"])) << np.uint64(ORD_SHIFT)
                    outs.append(pd.DataFrame(
                        {"doc_ord": (base + docs).astype(np.int64)}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame({"doc_ord": pd.Series([], dtype="int64")}))

        return rows.mapInPandas(decode, "doc_ord long")

    def materialize(self, hits: DataFrame, documents: DataFrame,
                    query: str, preview_words: int = 20) -> DataFrame:
        """Hit materialization (api/handler/search.rs:142-188 analog):
        join the top-k back to the source documents (broadcast the tiny
        hit side), add a highlight preview (utils.rs:64-138) and a
        first-N-words description (crawler/mod.rs:632-637)."""
        import pandas as pd
        from pyspark.sql.types import StringType

        from .highlight import first_words, generate_highlight_preview

        @F.pandas_udf(StringType())
        def preview_udf(content: pd.Series) -> pd.Series:
            return content.map(lambda c: generate_highlight_preview(query, c or ""))

        @F.pandas_udf(StringType())
        def desc_udf(content: pd.Series) -> pd.Series:
            return content.map(lambda c: first_words(c or "", preview_words))

        joined = documents.join(
            F.broadcast(hits.select("rank", "doc_id", "score",
                                    *(["query_id"] if "query_id" in hits.columns else []))),
            "doc_id", "inner")
        return (joined
                .withColumn("preview", preview_udf(F.col("content")))
                .withColumn("description", desc_udf(F.col("content")))
                .select(*(["query_id"] if "query_id" in hits.columns else []),
                        "rank", "doc_id", "url", "domain", "title",
                        "description", "preview", "score")
                .orderBy(*(["query_id"] if "query_id" in hits.columns else []),
                         "rank"))

    # -- helpers ---------------------------------------------------------

    def _term_dfs(self, keys: set) -> dict:
        fields = sorted({f for f, _ in keys})
        terms = sorted({t for _, t in keys})
        rows = (self.spark.read.parquet(*self._paths("term_stats"))
                .filter(F.col("field").isin(fields) & F.col("term").isin(terms))
                .collect())
        out: dict = {}
        for r in rows:  # sum df across generations
            k = (r["field"], r["term"])
            if k in keys:
                out[k] = out.get(k, 0) + int(r["df"])
        return out

    def _tombstone_ords(self):
        ords = set(int(o) for o in self.manifest.tombstoned_ords)
        if self.manifest.tombstones:
            rows = (self.spark.read.parquet(*self._paths("doc_meta"))
                    .filter(F.col("doc_id").isin(list(self.manifest.tombstones)))
                    .select("doc_ord").collect())
            ords |= {int(r["doc_ord"]) for r in rows}
        return np.array(sorted(ords), dtype=np.int64)

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "query_id long, rank int, doc_id string, url string, "
                "domain string, title string, score float, doc_ord long")
