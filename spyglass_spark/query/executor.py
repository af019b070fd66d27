"""Distributed BM25 top-k query execution over the segment store.

Execution model (mirrors the reference searcher's per-segment scoring +
global heap, /root/reference/crates/spyglass-searcher/src/client/local.rs:98-154,
re-expressed Spark-first):

1. Compile queries driver-side with the SAME analyzer code as indexing
   (terms_for_field parity, query.rs:237-259).
2. Look up global term stats (df) from the term-sorted stats store via a
   driver-side pyarrow pruned read — the analog of tantivy consulting its
   term dictionary: a metadata-plane lookup, NOT a Spark job. Results are
   memoized per engine (df is an index property). N, avgdl come from the
   manifest. BM25 weights are computed once per query in float32.
3. ONE Spark job: scan ONLY the query terms' posting chunks (field/term
   predicate pushdown + row-group/page pruning inside each part file of
   the kind-partitioned store; pos_bytes dropped for term-only batches),
   ONE exchange grouping chunks by part_id, then the scoring UDF — which
   reads its partition's fieldnorm + date fast-field arrays DIRECTLY via
   part-pruned pyarrow with a per-worker resident cache (the tantivy
   segment-reader pattern: no norms scan, no semijoin, no cogroup).
   Scoring (BM25, positional phrases via the doc-vectorized batch counter,
   date-range masks, block-max WAND) runs vectorized per partition with
   cross-query decode caches and NO doc-level shuffle.
4. Each partition emits its local top-(k+offset); the global top-k merge
   runs DRIVER-SIDE over ≤ parts×(k+offset)×queries tiny rows collected
   from the single scoring job (the TopDocs heap analog). Above a size
   guard the merge falls back to a distributed window — same ordering.
5. Small hit sets materialize doc_meta display fields incl. tags
   (RetrievedDocument{..tags}, lib.rs:130-139) via a driver-side pyarrow
   pruned read; larger sets broadcast-join. score > 0 post-filter per
   client/local.rs:138; tie-break (score desc, ord asc).
"""

from __future__ import annotations

import time
from collections import defaultdict
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..index.builder import (FAST_MARK, KIND_DOCMETA, KIND_FAST, KIND_NORMS,
                             KIND_POSTING, NORMS_MARK, ORD_SHIFT,
                             doc_meta_view, read_store, tombstone_view)
from ..index.codecs import (decode_positions_selected, decode_positions_stream,
                            decode_postings, phrase_keys_all,
                            phrase_keys_select, phrase_position_keys,
                            varint_decode)
from ..index.manifest import Manifest, load_manifest
from .compiler import CompiledQuery, compile_expanded, compile_query
from .expand import (DEFAULT_MAX_EXPANSIONS, expand_fuzzy, expand_prefix,
                     expand_regex, expand_term_range, expand_term_set,
                     expand_wildcard, normalize_pattern, normalize_wildcard)
from .scoring import (K1, idf, norm_cache, score_postings,
                      sloppy_phrase_count, sloppy_phrase_counts_batch)

RESULT_SCHEMA = "query_id long, doc_ord long, score float"
HIT_COLUMNS = ["query_id", "rank", "doc_id", "url", "domain", "title",
               "description", "tags", "score", "doc_ord"]

# Above this many candidate rows (parts × limit × queries) the global top-k
# merge runs as a distributed window instead of a driver-side heap.
# Interactive shapes (single query, mid-size batches) stay on the driver
# path — it is the one-Spark-job guarantee; very large batches go
# distributed. Raised 32k → 128k in r6: the old bound was tuned against a
# Row-collect + python-loop merge whose serial tail big shapes didn't
# amortize; the merge is now an Arrow toPandas + one numpy lexsort
# (~10 ms for 80k rows), so a 64-query batch at P=128 (81,920 rows,
# ~1.4 MB) merges driver-side in one job. batch256-and-up still takes the
# window path, which scales with the cluster instead of the driver.
MERGE_COLLECT_MAX = 131_072
# Tombstone sets up to this size ship inside the plan payload; larger sets
# are read per-partition by the executors from the parquet side tables.
TOMBSTONE_SHIP_MAX = 1_000_000
# Below this many part-local posting rows across a query's Should clauses,
# algo='auto' scores exhaustively even when the query shape is
# WAND-eligible: block-max WAND's per-pivot Python loop only amortizes
# over posting lists big enough that skipping whole blocks beats the
# fully vectorized exhaustive scorer (measured cross-over ~1e5 rows/part;
# at bench-scale 2.5k-doc parts WAND costs ~20% extra, on 100 TB parts it
# prunes). Results are bitwise identical either way (WAND is a pruning
# strategy only — pinned by tests/test_wand.py auto≡exhaustive).
import os as _os

WAND_MIN_PART_ROWS = int(_os.environ.get("SPYGLASS_WAND_MIN_ROWS", "131072"))
# Driver-local execution gates (see _execute_compiled): a batch runs on
# the driver — same kernel, pyarrow posting read, zero Spark jobs — only
# when ALL of: ≤ LOCAL_EXEC_MAX_QUERIES queries, the estimated decode
# volume (Σ global df, phrase members ×4) ≤ LOCAL_EXEC_MAX_ROWS, and the
# index has ≤ LOCAL_EXEC_MAX_PARTS partitions (per-file footer metadata
# is driver-side work). Mode: auto | never | always (tests use
# never/always to pin both paths bitwise-identical).
LOCAL_EXEC_MODE = _os.environ.get("SPYGLASS_LOCAL_EXEC", "auto")
LOCAL_EXEC_MAX_ROWS = int(_os.environ.get("SPYGLASS_LOCAL_EXEC_ROWS",
                                          str(4_000_000)))
LOCAL_EXEC_MAX_QUERIES = int(_os.environ.get("SPYGLASS_LOCAL_EXEC_QUERIES",
                                             "2"))
LOCAL_EXEC_MAX_PARTS = int(_os.environ.get("SPYGLASS_LOCAL_EXEC_PARTS",
                                           "1024"))


def search_union(engines, query, filters=(), boosts=(),
                 k: int = 5) -> DataFrame:
    """Multi-index federated search — the ES comma-separated-indices
    contract: the SAME query runs against every index and the hit
    lists merge into one page by (score desc, url asc — urls are
    globally unique, total order). Scores are each index's OWN BM25
    (local N/df/avgdl, the ES default: cross-index idf is NOT
    normalized, exactly like querying two ES indices without
    dfs_query_then_fetch), so the merged order is as comparable as
    ES's. Output (rank, index_id, url, domain, title, score).

    Scale shape: each per-index search is the ordinary k-bounded
    engine path (its own WAND pruning, its own one-job plan); the
    merge is a unionByName + TakeOrderedAndProject over
    O(#indices · k) rows — adding an index adds one bounded search,
    never a cross-index shuffle."""
    engines = list(engines)
    if not engines:
        raise ValueError("engines must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    frames = []
    for i, eng in enumerate(engines):
        h = eng.search(query, filters=filters, boosts=boosts, k=k)
        frames.append(h.select(F.lit(i).alias("index_id"), "url",
                               "domain", "title", "score"))
    u = reduce(DataFrame.unionByName, frames)
    order = [F.desc("score"), F.asc("url")]
    w = Window.orderBy(*order)
    return (u.orderBy(*order).limit(int(k))
             .withColumn("rank", F.row_number().over(w))
             .select("rank", "index_id", "url", "domain", "title",
                     "score"))


def _wand_eligible(specs) -> bool:
    """Block-max WAND handles the standard search shape: a scoring Should
    group + single-term Must clauses (zero-boost filters AND scoring
    Musts — a scoring Must is both an include filter and a scoring clause
    appended after the Should group, preserving the float32 clause sum
    order), MustNots, and date-range Musts (the fast-field mask feeds
    wand_top_k's filter_include, so pruning still skips unscored blocks).
    Favorite should-extras are score-only clauses (the reference wraps the
    main Should group in a Must, so an extra Should can never nominate a
    doc by itself) — they join the scoring list after the musts, exactly
    the exhaustive float32 order. Only document-query extra_groups /
    phrase-or-multiterm musts fall back to the exhaustive scorer (WAND is
    a pruning strategy only — results must be bitwise identical)."""
    for s in specs:
        if s["role"] == "extra_group":
            return False
        if s["role"] in ("must", "must_not") and (
                s["kind"] != "term" or len(s["terms"]) != 1):
            return False
    return any(s["role"] == "should" for s in specs)


def _wand_worthwhile(specs, payload) -> bool:
    """Scale gate for the WAND path (see WAND_MIN_PART_ROWS): total
    part-local posting rows across the query's Should clauses, from the
    df_part column already in the scanned chunk — no decode needed."""
    total = 0
    for s in specs:
        if s["role"] != "should":
            continue
        for t in s["terms"]:
            r = payload.get((s["field"], t))
            if r is not None:
                total += int(r["df_part"])
                if total >= WAND_MIN_PART_ROWS:
                    return True
    return False


def _run_wand(q, payload, caches, norm_arrays, fast_arrays, limit,
              local_tomb, shared=None, after_local=None):
    """Execute one query via block-max WAND. Returns (local_ords, scores)
    or None to fall back (e.g. a filter term longer than this chunk).
    ``shared`` carries cross-query decode caches for batch mode.
    ``after_local`` is the search_after cursor translated to this part's
    local ordinal space (score, cursor_global_ord − part_base)."""
    from .wand import _ClauseData, wand_top_k

    wand_shared = shared["wand"] if shared is not None else {}
    scoring = []
    any_should = False
    for spec in q["specs"]:
        # scoring clauses in SPEC order (should group, scoring musts,
        # favorite should-extras) — the float32 accumulation order the
        # oracle pins. A scoring Must is also an include filter below;
        # should_extras are score-only; candidates still come from Should
        # clauses only (exhaustive-path parity).
        if not (spec["role"] == "should"
                or (spec["role"] in ("must", "should_extra")
                    and spec["scoring"])):
            continue
        rows = [payload.get((spec["field"], t)) for t in spec["terms"]]
        if any(r is None for r in rows):
            continue  # clause can't match in this part
        if spec["role"] == "should":
            any_should = True
        scoring.append(_ClauseData(spec, rows, caches[spec["field"]],
                                   norm_arrays.get(spec["field"]),
                                   wand_shared))
    if not any_should:
        return np.empty(0, np.int64), np.empty(0, np.float32)

    def filter_docs(field, term):
        key = (field, term)
        if shared is not None and key in shared["post"]:
            hit = shared["post"][key]
            return None if hit is None else hit[0].astype(np.int64)
        row = payload.get(key)
        if row is None:
            if shared is not None:
                shared["post"][key] = None
            return None
        docs, tfs = decode_postings(row["doc_bytes"], row["tf_bytes"])
        if shared is not None:
            shared["post"][key] = (docs, tfs, row)
        return docs.astype(np.int64)

    include = None
    exclude = local_tomb
    for spec in q["specs"]:
        if spec["role"] == "must":
            m = filter_docs(spec["field"], spec["terms"][0])
            m = np.empty(0, np.int64) if m is None else m
            include = m if include is None else np.intersect1d(
                include, m, assume_unique=True)
        elif spec["role"] == "must_range":
            # date fast-field mask as a WAND include filter — identical
            # semantics to the exhaustive path's range clause (missing
            # fast field or -1 sentinel never matches)
            arr = fast_arrays.get(spec["field"])
            if arr is None:
                m = np.empty(0, np.int64)
            else:
                mask = arr >= 0
                if spec["ge"] is not None:
                    mask &= arr >= spec["ge"]
                if spec["le"] is not None:
                    mask &= arr <= spec["le"]
                m = np.nonzero(mask)[0].astype(np.int64)
            include = m if include is None else np.intersect1d(
                include, m, assume_unique=True)
        elif spec["role"] == "must_not":
            m = filter_docs(spec["field"], spec["terms"][0])
            if m is not None:
                exclude = m if exclude is None else np.union1d(exclude, m)
    if include is not None and include.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    return wand_top_k(scoring, include, exclude, limit, after=after_local,
                      combiner=(q.get("combiner", "sum"),
                                q.get("tie", 0.0)))


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
    for field, ge, le in getattr(cq, "range_musts", ()):
        specs.append({"kind": "range", "field": field, "terms": [],
                      "positions": [], "slop": 0, "boost": 0.0, "weight": 0.0,
                      "scoring": False, "role": "must_range",
                      "ge": ge, "le": le})
    return specs


def _open_parquet_dirs(dirs):
    """pyarrow dataset over one or more parquet DIRECTORIES (a plain list
    would be treated as file paths)."""
    import pyarrow.dataset as pads

    children = [pads.dataset(d, format="parquet") for d in dirs]
    return children[0] if len(children) == 1 else pads.dataset(children)


def _part_fragment_map(ds_list, cache: dict, cache_key, frag_filter=None) -> dict:
    """part_id -> owning parquet fragments, from row-group statistics —
    ONE bounded metadata pass per worker per (dirs, epoch), after which a
    per-part read touches only the file(s) that contain the part. Files
    without part_id stats land under the None key (always read).
    ``frag_filter`` prunes fragments by partition expression (e.g. the
    kind hive directory) before footers are touched."""
    pmap = cache.get(cache_key)
    if pmap is not None:
        return pmap
    pmap = {}
    for ds in ds_list:
        for frag in ds.get_fragments(frag_filter):
            for rg in frag.row_groups:
                st = (rg.statistics or {}).get("part_id")
                if not st:
                    lst = pmap.setdefault(None, [])
                    if not lst or lst[-1] is not frag:
                        lst.append(frag)
                    continue
                for p in range(int(st["min"]), int(st["max"]) + 1):
                    lst = pmap.setdefault(p, [])
                    if not lst or lst[-1] is not frag:
                        lst.append(frag)
    cache[cache_key] = pmap
    return pmap


def _local_tombstones(plan: dict, part_id: int):
    """This partition's tombstoned local ordinals (int64) or None.
    Small sets arrive in the plan payload; large sets are read from the
    parquet side tables pruned to this part (executor-side, no driver
    materialization; part->fragment map + per-part result cached
    per-worker, epoch-versioned like the norm cache)."""
    out = []
    tomb = plan.get("tombstone_ords")
    if tomb is not None and tomb.size:
        lt = tomb[(tomb >> ORD_SHIFT) == part_id] & ((1 << ORD_SHIFT) - 1)
        if lt.size:
            out.append(lt.astype(np.int64))
    dirs = tuple(plan.get("tombstone_dirs") or ())
    if dirs:
        epoch = plan.get("store_epoch", "")
        pkey = ("tombp", dirs, epoch, part_id)
        arr = _NORM_CACHE.get(pkey)
        if arr is None:
            import pyarrow.dataset as pads

            dskey = ("tombds", dirs, epoch)
            ds_list = _NORM_CACHE.get(dskey)
            if ds_list is None:
                ds_list = _NORM_CACHE[dskey] = [
                    pads.dataset(d, format="parquet") for d in dirs]
            pmap = _part_fragment_map(ds_list, _NORM_CACHE,
                                      ("tombmap", dirs, epoch))
            chunks = []
            for frag in pmap.get(part_id, []) + pmap.get(None, []):
                tbl = frag.to_table(columns=["doc_ord"],
                                    filter=pads.field("part_id") == part_id)
                a = tbl.column("doc_ord").to_numpy()
                if a.size:
                    chunks.append(a)
            arr = (np.concatenate(chunks) if chunks
                   else np.empty(0, np.int64))
            if len(_NORM_CACHE) >= _NORM_CACHE_MAX:
                _NORM_CACHE.clear()
            _NORM_CACHE[pkey] = arr
        if arr.size:
            out.append((arr & ((1 << ORD_SHIFT) - 1)).astype(np.int64))
    if not out:
        return None
    return np.unique(np.concatenate(out)) if len(out) > 1 else np.sort(out[0])


# per-python-worker resident cache of norm/fast-field arrays: workers
# persist across tasks and queries, so hot partitions keep their fieldnorms
# in memory like tantivy's resident per-segment norms. Bounded crudely.
_NORM_CACHE: dict = {}
_NORM_CACHE_MAX = 8192

# Spark sessions whose generic execution machinery has been warmed by
# SearchEngine open (see _prewarm_session) — keyed on applicationId so
# the warm runs exactly once per JVM no matter how many engines open.
_WARMED_SESSIONS: set = set()


def _load_part_arrays(store_dirs: tuple, part_id: int, epoch: str):
    """(norm_arrays, fast_arrays) for one partition, read DIRECTLY from the
    kind=1/kind=4 store files (executor-side pyarrow, part-pruned) — the
    segment-reader pattern: no norms scan/semijoin/cogroup in the plan.
    ``epoch`` (the manifest commit stamp) versions the worker cache so a
    compaction's directory swap can't serve stale listings."""
    key = (store_dirs, epoch, part_id)
    hit = _NORM_CACHE.get(key)
    if hit is None:
        import pyarrow.dataset as pads

        # part_id -> owning norm/fast file fragments, computed ONCE per
        # worker per epoch from row-group statistics. Without this map a
        # cache miss re-evaluated the part_id predicate over EVERY file's
        # footer under kind=1/kind=4 (~32 ms/part at P=128); with it a
        # miss reads exactly the one or two files that contain the part
        # (~2 ms). One bounded metadata pass per worker, amortized across
        # every subsequent query.
        ds_list = []
        for d in store_dirs:
            ds = _NORM_CACHE.get(("ds", d, epoch))
            if ds is None:  # dataset handle holds the file listing
                ds = _NORM_CACHE[("ds", d, epoch)] = pads.dataset(
                    d, format="parquet", partitioning="hive")
            ds_list.append(ds)
        pmap = _part_fragment_map(
            ds_list, _NORM_CACHE, ("pmap", store_dirs, epoch),
            frag_filter=pads.field("kind").isin([KIND_NORMS, KIND_FAST]))
        norm_arrays: dict = {}
        fast_arrays: dict = {}
        # fragment-level read: `kind` is a hive partition (virtual) column
        # unavailable in the physical file schema, so rows are classified
        # by their `field` marker instead (kind pruning already happened
        # when the fragment map was built)
        frags = pmap.get(part_id, []) + pmap.get(None, [])
        for frag in frags:
            tbl = frag.to_table(columns=["field", "term", "doc_bytes", "part_id"],
                                filter=pads.field("part_id") == part_id)
            for fm, t, b, p in zip(tbl.column("field").to_pylist(),
                                   tbl.column("term").to_pylist(),
                                   tbl.column("doc_bytes").to_pylist(),
                                   tbl.column("part_id").to_pylist()):
                if int(p) != part_id:
                    continue
                if fm == NORMS_MARK:
                    norm_arrays[t] = np.frombuffer(b, dtype=np.uint8)
                elif fm == FAST_MARK:
                    fast_arrays[t] = np.frombuffer(b, dtype=np.int64)
        if len(_NORM_CACHE) >= _NORM_CACHE_MAX:
            _NORM_CACHE.clear()
        hit = _NORM_CACHE[key] = (norm_arrays, fast_arrays)
    return hit


def _score_partition(plan: dict, postings_pdf: pd.DataFrame):
    """Score every query of ``plan`` against one doc partition. Returns
    (query_id, doc_ord, score) rows for the per-partition top candidates."""
    if len(postings_pdf) == 0:
        return pd.DataFrame({"query_id": [], "doc_ord": [], "score": []}).astype(
            {"query_id": "int64", "doc_ord": "int64", "score": "float32"})
    part_id = int(postings_pdf["part_id"].iloc[0])
    base = np.uint64(part_id) << np.uint64(ORD_SHIFT)
    norm_arrays, fast_arrays = _load_part_arrays(
        tuple(plan["store_dirs"]), part_id, plan.get("store_epoch", ""))
    # posting payloads for this part, keyed (field, term) — to_dict avoids
    # the per-row Series construction of iterrows (byte payloads pass by
    # reference either way)
    payload = {(r["field"], r["term"]): r
               for r in postings_pdf.to_dict("records")}
    caches = plan["caches"]
    limit = plan["limit"]
    algo = plan.get("algo", "auto")
    local_tomb = _local_tombstones(plan, part_id)
    out_q, out_d, out_s = [], [], []
    # decode caches SHARED ACROSS the batch's queries (a 64-query batch
    # re-touches the same hot terms; decode each chunk once per partition)
    shared = {"post": {}, "pos": {}, "wand": {}}

    def term_postings(field, term):
        key = (field, term)
        hit = shared["post"].get(key)
        if hit is not None:
            return hit
        row = payload.get(key)
        if row is None:
            shared["post"][key] = None
            return None
        docs, tfs = decode_postings(row["doc_bytes"], row["tf_bytes"])
        hit = (docs, tfs, row)
        shared["post"][key] = hit
        return hit

    base_i = int(base)
    for q in plan["queries"]:
        # search_after cursor, translated to this part's local ordinal
        # space: global doc_ord = base + local, and base is constant per
        # part, so (global > cursor_ord) ⟺ (local > cursor_ord − base) —
        # the difference may be negative (cursor in an earlier part: every
        # tie qualifies) or ≥ 2^40 (later part: no tie qualifies)
        after = q.get("after")
        after_local = ((np.float32(after[0]), int(after[1]) - base_i)
                       if after is not None else None)
        if algo != "exhaustive" and q.get("msm", 0) <= 1 \
                and _wand_eligible(q["specs"]) \
                and _wand_worthwhile(q["specs"], payload):
            res = _run_wand(q, payload, caches, norm_arrays, fast_arrays,
                            limit, local_tomb, shared, after_local)
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
            if spec["kind"] == "range":
                arr = fast_arrays.get(field)
                if arr is None:
                    ords_r = np.empty(0, np.int64)
                else:
                    mask = np.ones(arr.size, dtype=bool)
                    if spec["ge"] is not None:
                        mask &= arr >= spec["ge"]
                    if spec["le"] is not None:
                        mask &= arr <= spec["le"]
                    mask &= arr >= 0  # missing dates (-1) never match
                    ords_r = np.nonzero(mask)[0].astype(np.int64)
                clause_results.append((ords_r, np.empty(0, np.float32), spec))
                continue
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
                # positions: the flat varint stream is decoded once per
                # (field, term) per part and cached across the batch's
                # queries. The cache upgrades to the record-major
                # restored stream only when that pays: on a FULL-coverage
                # intersection (the restore costs the same as the gather
                # the query needs anyway, and later queries reuse the
                # pre-keyed array with ZERO work) or on the term's SECOND
                # touch within the batch (hot terms recur ~8× in a
                # 64-query batch). A single selective phrase keeps the
                # old per-selection gather — restoring the whole stream
                # would cost more than the one query touches. The
                # sloppy-phrase count runs vectorized ACROSS all
                # candidate docs at once.
                keyed = []
                for t_name, tp in zip(spec["terms"], tps):
                    docs_t, tfs_t, row = tp[0], tp[1], tp[2]
                    pkey = (field, t_name)
                    hit = shared["pos"].get(pkey)
                    if hit is None:
                        flat = varint_decode(row["pos_bytes"])
                        rec_starts = np.concatenate(
                            ([0], np.cumsum(tfs_t.astype(np.int64) + 1)))
                        hit = shared["pos"][pkey] = [
                            "flat", flat, rec_starts, 0]
                    if hit[0] == "flat":
                        hit[3] += 1
                    if hit[0] == "flat" and (
                            common.size == docs_t.size or hit[3] >= 2):
                        pos_s, cum_s = decode_positions_stream(
                            hit[1], hit[2], tfs_t)
                        hit[:] = ["full", pos_s, cum_s,
                                  phrase_keys_all(pos_s, cum_s)]
                    if hit[0] == "full":
                        if common.size == docs_t.size:
                            keyed.append(hit[3])
                        else:
                            sel = np.searchsorted(
                                docs_t.astype(np.int64), common)
                            keyed.append(phrase_keys_select(
                                hit[1], hit[2], sel))
                    else:
                        sel = np.searchsorted(docs_t.astype(np.int64),
                                              common)
                        keyed.append(phrase_position_keys(
                            hit[1], hit[2], tfs_t, sel))
                tf_counts = sloppy_phrase_counts_batch(
                    keyed, list(spec["positions"]), spec["slop"], common.size)
                mask = tf_counts > 0
                ords_m = common[mask]
                nids = norms[ords_m] if norms is not None else np.zeros(ords_m.size, np.uint8)
                scores = (score_postings(tf_counts[mask], nids, spec["weight"], cache)
                          if spec["scoring"] else np.zeros(ords_m.size, np.float32))
                clause_results.append((ords_m, scores, spec))

        # candidate set: Must(union of should group) ∩ each extra group
        #   ∩ musts ∩ range filters − must_nots
        should = [r for r in clause_results if r[2]["role"] == "should"]
        must_sets = []
        if should:
            # each clause's ords are unique, so occurrence counts across
            # the concatenation = number of DISTINCT matching should
            # clauses per doc — the Lucene minimumNumberShouldMatch gate
            # (msm ≤ 1 is the plain union / reference Must-wrap shape)
            u, cnts = np.unique(np.concatenate([r[0] for r in should]),
                                return_counts=True)
            msm = q.get("msm", 0)
            if msm > 1:
                u = u[cnts >= msm]
            must_sets.append(u)
        groups: dict[int, list] = {}
        for r in clause_results:
            if r[2]["role"] == "extra_group":
                groups.setdefault(r[2]["group"], []).append(r[0])
        for gi in sorted(groups):
            must_sets.append(np.unique(np.concatenate(groups[gi])))
        for r in clause_results:
            if r[2]["role"] in ("must", "must_range"):
                must_sets.append(r[0])
        if not must_sets:
            continue
        cand = must_sets[0]
        for s_ in must_sets[1:]:
            cand = np.intersect1d(cand, s_, assume_unique=True)
        for r in clause_results:
            if r[2]["role"] == "must_not":
                cand = np.setdiff1d(cand, r[0], assume_unique=True)
        if local_tomb is not None:
            cand = np.setdiff1d(cand, local_tomb, assume_unique=True)
        if cand.size == 0:
            continue
        # accumulate float32 scores in clause order (oracle-identical)
        if q.get("combiner", "sum") == "dismax":
            # DisjunctionMaxQuery over the Should group: per doc,
            # m = max clause score, s = clause-order float32 sum;
            # core = m + tie·(s − m), each op float32 — then scoring
            # Musts / should-extras ADD in clause order as in sum mode.
            # Clause scores are ≥ 0, so max seeded at 0 only counts
            # matching clauses.
            tie = np.float32(q.get("tie", 0.0))
            acc = np.zeros(cand.size, dtype=np.float32)
            mx = np.zeros(cand.size, dtype=np.float32)
            for ords_c, scores_c, spec in clause_results:
                if spec["role"] != "should" or ords_c.size == 0:
                    continue
                pos = np.searchsorted(cand, ords_c)
                ok = (pos < cand.size)
                ok[ok] = cand[pos[ok]] == ords_c[ok]
                acc[pos[ok]] = acc[pos[ok]] + scores_c[ok]
                mx[pos[ok]] = np.maximum(mx[pos[ok]], scores_c[ok])
            acc = mx + tie * (acc - mx)
            for ords_c, scores_c, spec in clause_results:
                if (spec["role"] in ("should", "must_not", "must_range")
                        or ords_c.size == 0):
                    continue
                pos = np.searchsorted(cand, ords_c)
                ok = (pos < cand.size)
                ok[ok] = cand[pos[ok]] == ords_c[ok]
                acc[pos[ok]] = acc[pos[ok]] + scores_c[ok]
        else:
            acc = np.zeros(cand.size, dtype=np.float32)
            for ords_c, scores_c, spec in clause_results:
                if spec["role"] in ("must_not", "must_range") or ords_c.size == 0:
                    continue
                pos = np.searchsorted(cand, ords_c)
                ok = (pos < cand.size)
                ok[ok] = cand[pos[ok]] == ords_c[ok]
                acc[pos[ok]] = acc[pos[ok]] + scores_c[ok]
        keep = acc > 0.0
        cand, acc = cand[keep], acc[keep]
        if after_local is not None and cand.size:
            a_s, a_o = after_local[0], np.int64(after_local[1])
            keep = (acc < a_s) | ((acc == a_s) & (cand > a_o))
            cand, acc = cand[keep], acc[keep]
        if cand.size == 0:
            continue
        sel = np.lexsort((cand, -acc.astype(np.float64)))[:limit]
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
    def __init__(self, spark: SparkSession, index_dir: str,
                 as_of: int | None = None):
        """``as_of`` pins the engine to the manifest snapshot published
        at that commit_seq (Iceberg-style time travel: segment parquet
        is append-only between merges and deletes are logical, so the
        old state is fully searchable — pre-delete/pre-upsert audits).
        A pinned engine never advances; refresh() re-reads the same
        immutable snapshot."""
        self.spark = spark
        self.index_dir = index_dir
        self.as_of = as_of
        self.last_meta: dict | None = None
        self.refresh()

    def refresh(self) -> None:
        """(Re)load the committed manifest and rebuild the cached frames /
        stats caches. Call after another writer upserts/deletes or after
        compact_index's directory swap — the engine otherwise serves the
        generation it was opened on (tantivy reader-reload analog,
        local.rs:178-190)."""
        m = load_manifest(self.index_dir, as_of=self.as_of)
        if (m is None or not m.committed) and self.as_of is None:
            # a compaction interrupted between its two directory renames
            # leaves the index under a sibling name — heal, then re-read
            # (idempotent no-op on a genuinely absent index)
            from ..index.builder import recover_compaction

            if recover_compaction(self.index_dir) in ("completed",
                                                      "rolled_back"):
                m = load_manifest(self.index_dir)
        if m is None or not m.committed:
            raise FileNotFoundError(f"no committed index manifest in {self.index_dir}")
        for cache in ("_agg_dm_cache", "_agg_gdm_cache"):
            prev_agg = getattr(self, cache, None)
            if prev_agg is not None:  # drop the stale-generation frame
                prev_agg.unpersist()
                setattr(self, cache, None)
        if m.version > 1:
            raise ValueError(
                f"index manifest version {m.version} is newer than this "
                "engine supports (1) — run a compaction/migration first "
                "(the v3→v4 whole-index rewrite pattern, SURVEY §1.1)")
        self.manifest: Manifest = m
        self.gens = m.gen_list()
        # base frames created once: Spark caches their file indexes, so
        # per-query work skips the parquet listing round trips
        def fresh_store() -> DataFrame:
            # separate reads (distinct plan lineage) so postings-derived
            # frames can join norms-derived frames without self-join
            # ambiguity; Spark still shares the cached file index
            return reduce(DataFrame.unionByName,
                          [read_store(self.spark, self.index_dir, g["prefix"])
                           for g in self.gens])

        self._postings_base = fresh_store().filter(
            F.col("kind") == KIND_POSTING).select(
            "part_id", "field", "term", "df_part", "cf_part", "n_local",
            "doc_bytes", "tf_bytes", "pos_bytes", "meta_bytes")
        self._doc_meta_base = doc_meta_view(self.spark, self.index_dir, self.gens)
        self._df_cache: dict[tuple[str, str], int] = {}
        self._cf_cache: dict[tuple[str, str], int] = {}
        self._meta_ds_cache: dict = {}  # pyarrow dataset handles per gen
        self._tomb_cache = None
        self._scan_aligned = self._compute_scan_aligned()
        self._prewarm_session()
        self._prewarm_local_exec()

    def _prewarm_session(self) -> None:
        """One-time per-Spark-session warm of the generic SQL execution
        machinery — the JVM half of the open-segment-readers analog,
        next to _prewarm_local_exec's metadata plane. Small searches run
        driver-local (zero Spark jobs), so without this nothing warms
        the JVM before the first distributed query, which then absorbs
        seconds of one-time classloading + C2 JIT that are properly an
        open cost. The warm runs a synthetic pipeline over sp.range —
        Generate(explode) → two-level HashAggregate → Exchange →
        BroadcastHashJoin → TakeOrderedAndProject — with enough rows to
        compile AND heat the codegen loops, plus a Python-worker /
        Arrow round trip and one store-row parquet read (vectorized
        reader classes). Touches no corpus data and caches no results;
        best-effort, once per applicationId."""
        try:
            app = self.spark.sparkContext.applicationId
        except Exception:
            return
        if app in _WARMED_SESSIONS:
            return
        _WARMED_SESSIONS.add(app)
        try:
            sp = self.spark
            n = max(sp.sparkContext.defaultParallelism, 2)
            base = (sp.range(0, 200_000, 1, n)
                      .withColumn("arr", F.array(F.col("id") % 97,
                                                 F.col("id") % 31,
                                                 F.col("id") % 7))
                      .select("id", F.explode("arr").alias("t")))
            tf = base.groupBy("id", "t").agg(F.count("*").alias("tf"))
            dfq = tf.groupBy("t").agg(F.count("*").alias("df"))
            (tf.join(F.broadcast(dfq), "t")
               .groupBy("id").agg(F.sum(F.col("tf") * F.col("df")).alias("s"))
               .orderBy(F.desc("s"), F.asc("id")).limit(10).collect())
            sp.range(0, n, 1, n).mapInPandas(lambda it: it,
                                             "id long").count()
            self._postings_base.select("part_id").limit(1).collect()
        except Exception:
            pass

    def _prewarm_local_exec(self) -> None:
        """Open-time warm-up of the driver-local executor's metadata
        plane (the tantivy open-segment-readers analog): pyarrow dataset
        handles, the part→fragment map, and — when the whole norm/fast
        plane is small — the per-part norm arrays. All bounded by the
        LOCAL_EXEC gates; a 100 TB index skips everything beyond the
        part-count check. Best-effort: failures defer to lazy loads."""
        if LOCAL_EXEC_MODE == "never":
            return
        total_parts = sum(g["num_partitions"] for g in self.gens)
        if total_parts > LOCAL_EXEC_MAX_PARTS:
            return
        try:
            import pyarrow.dataset as pads

            m = self.manifest
            epoch = f"{m.created_utc}#{getattr(m, 'commit_seq', 0)}"
            dirs = tuple(f"{self.index_dir}/{g['prefix']}/store"
                         for g in self.gens)
            ds_list = []
            for d in dirs:
                ds = _NORM_CACHE.get(("ds", d, epoch))
                if ds is None:
                    ds = _NORM_CACHE[("ds", d, epoch)] = pads.dataset(
                        d, format="parquet", partitioning="hive")
                ds_list.append(ds)
            pmap = _part_fragment_map(
                ds_list, _NORM_CACHE, ("pmap", dirs, epoch),
                frag_filter=pads.field("kind").isin([KIND_NORMS, KIND_FAST]))
            # norm/fast arrays are ~#docs bytes per field — preload only
            # when the whole plane fits a small driver budget
            est_bytes = m.num_docs * max(1, len(m.field_totals)) * 2
            if est_bytes <= 64 << 20:
                for p in sorted(k for k in pmap if k is not None):
                    _load_part_arrays(dirs, p, epoch)
            # first Arrow local-relation conversion in a session pays ~1 s
            # of JVM classloading; do it once at open with a dummy row so
            # the first query's result materialization doesn't
            self._local_hits_df(
                [(0, 1, "w", "w", "w", "w", None, [], 0.0, 0)]).collect()
        except Exception:
            pass

    def _compute_scan_aligned(self) -> bool:
        """True when the kind=0 store layout guarantees whole-part input
        splits: stage 1 writes exactly one posting file per doc partition
        (identity shuffle keys → one task per part), so as long as no
        file exceeds half of spark.sql.files.maxPartitionBytes Spark will
        never split one across tasks — every scan task sees COMPLETE
        parts and the pre-scoring groupBy exchange is pure waste (the
        data is already co-located on disk). Falls back to the shuffled
        path automatically when a part's postings outgrow the bound (the
        100 TB regime with huge parts)."""
        import os

        try:
            max_bytes = int(self.spark.conf.get(
                "spark.sql.files.maxPartitionBytes", str(128 << 20)))
        except ValueError:
            max_bytes = 128 << 20
        biggest = 0
        nfiles = 0
        for g in self.gens:
            store = f"{self.index_dir}/{g['prefix']}/store"
            for root, _, files in os.walk(store):
                if "kind=0" not in root:
                    continue
                for fn in files:
                    if fn.endswith(".parquet"):
                        nfiles += 1
                        biggest = max(biggest, os.path.getsize(
                            os.path.join(root, fn)))
        self._posting_file_count = nfiles
        self._max_partition_bytes = max_bytes
        return 0 < biggest <= max_bytes // 2

    def _paths(self, name: str) -> list[str]:
        return [f"{self.index_dir}/{g['prefix']}/{name}" for g in self.gens]

    # -- public API (Searcher::search analog) ---------------------------

    def search(self, query: str, filters=(), boosts=(), k: int = 5,
               offset: int = 0, algo: str = "auto",
               search_after=None, combiner: str = "sum",
               tie_breaker: float = 0.0,
               min_should_match: int | str = 0) -> DataFrame:
        """``combiner='dismax'`` switches the Should-group score from the
        clause sum (tantivy/Lucene BooleanQuery, the reference shape) to
        Lucene DisjunctionMaxQuery semantics — best matching clause +
        ``tie_breaker`` × the others (ES multi_match best_fields). WAND
        pruning stays available (tie ∈ [0,1] keeps the Σ-UB bound valid,
        wand.py); results remain bitwise exhaustive-identical.

        ``min_should_match`` is Lucene BooleanQuery's
        setMinimumNumberShouldMatch (ES minimum_should_match): a doc is
        a candidate only when ≥ that many DISTINCT Should clauses match
        (0/1 = the reference's plain Must-wrap). An int or an ES spec
        string — ``'-1'`` (all but one), ``'75%'``/``'-25%'``
        (floor-rounded percentage of the compiled Should-clause count;
        compiler.resolve_min_should_match documents the contract).
        Scoring is unchanged — msm only gates candidacy; msm ≥ 2 scores
        exhaustively (WAND is a pruning strategy and its Σ-UB advance
        has no clause-count bound)."""
        return self.search_many(
            [{"query": query, "filters": filters, "boosts": boosts,
              "after": search_after, "combiner": combiner,
              "tie_breaker": tie_breaker,
              "min_should_match": min_should_match}],
            k=k, offset=offset, algo=algo).drop("query_id")

    def search_many(self, queries: list[dict], k: int = 5, offset: int = 0,
                    algo: str = "auto") -> DataFrame:
        """Batch mode: one Spark job scores all queries. Each dict:
        {query, filters?, boosts?, after?}. Returns (query_id, rank,
        doc_id, url, domain, title, tags, score). ``algo``: 'auto'
        (block-max WAND where the query shape allows, exhaustive
        otherwise) or 'exhaustive'.

        ``after`` / ``search_after`` is a deep-paging cursor — the
        (score, doc_ord) of the last hit of the previous page; the next
        page is the top-k among docs STRICTLY after it in the global
        (score desc, doc_ord asc) order, with ranks restarting at 1.
        Unlike ``offset`` (whose driver merge collects parts×(k+offset)
        candidate rows — O(offset) driver work, the tantivy
        TopDocs::with_offset shape), a cursor page collects parts×k rows
        at ANY depth: page 10⁶ of a 10¹²-doc index costs the same as
        page 1. Scores are float32 computed identically on every page,
        so the cursor's equality tie-break is exact, and pages
        concatenate to precisely the one-shot top-N (pinned in
        tests/test_search_after.py at multiple P, WAND ≡ exhaustive).

        Pattern shapes batch too: a dict may carry ``prefix`` /
        ``wildcard`` / ``regex`` / ``fuzzy`` (optionally
        ``fuzzy_distance``, ``max_expansions``) / ``term_range``
        (a (lower, upper) pair, optionally ``include_lower`` /
        ``include_upper``) / ``term_set`` (an iterable of exact
        terms) instead of ``query`` —
        the expansion is the same driver-side metadata-plane read the
        single-query methods use, so a mixed batch of N queries still
        costs exactly ONE scoring job.

        Per-batch metadata (num_docs, term_counts, wall_time_ms — the
        SearchResults.meta analog, api/handler/search.rs:190-211) is left
        in ``self.last_meta``."""
        pairs = [self._compile_one(q) for q in queries]
        return self._run_compiled_batch(
            [cq for cq, _ in pairs], [lbl for _, lbl in pairs], k, offset,
            algo, afters=[q.get("after") for q in queries])

    def _compile_one(self, q: dict):
        """One batch entry → (CompiledQuery, label). Free-text compiles
        directly; pattern shapes run the matching dictionary expansion
        (driver-side pyarrow, no Spark job) and compile as a Should
        group — identical semantics to the single-query methods. An
        optional ``combiner``/``tie_breaker`` pair selects the
        Should-group score combiner (sum | dismax) for THIS entry —
        any shape may carry it, since every shape compiles to a Should
        group (a dismax pattern query is Lucene's top-terms blended
        rewrite with max scoring)."""
        comb = q.get("combiner", "sum")
        if comb not in ("sum", "dismax"):
            raise ValueError(f"combiner must be 'sum' or 'dismax': {comb!r}")
        tie = float(q.get("tie_breaker", 0.0))
        if comb == "dismax" and not 0.0 <= tie <= 1.0:
            # Lucene DisjunctionMaxQuery contract; also what keeps the
            # WAND Σ-UB bound valid (wand.py)
            raise ValueError(f"tie_breaker must be in [0, 1]: {tie}")
        from .compiler import resolve_min_should_match

        cq, label = self._compile_one_shape(q)
        cq.combiner, cq.tie_breaker = comb, tie
        # int or ES spec string ('2', '-1', '75%', '-25%') resolved
        # against THIS query's compiled Should-clause count — shared
        # scalar code (compiler.py), so the oracle resolves identically
        cq.min_should_match = resolve_min_should_match(
            q.get("min_should_match", 0), len(cq.should_group))
        return cq, label

    def _compile_arg(self, query, filters=(), boosts=()):
        """Compile a query argument for the collector/aggregation
        surface: a plain string is the reference free-text shape
        (compile_query), a dict is ANY ``search_many`` batch entry —
        ``{"parsed": ...}``, ``{"prefix": ...}``, ``{"term_set": ...}``,
        … — so every collector (count/export/facets/stats/sorted/…)
        runs over every query shape the engine can search.
        ``filters``/``boosts`` given positionally merge in unless the
        dict carries its own."""
        if isinstance(query, dict):
            q = dict(query)
            q.setdefault("filters", filters)
            q.setdefault("boosts", boosts)
            return self._compile_one(q)[0]
        return compile_query(query, filters, boosts)

    def _compile_one_shape(self, q: dict):
        filters, boosts = q.get("filters", ()), q.get("boosts", ())
        if "query" in q:
            return (compile_query(q["query"], filters, boosts), q["query"])
        cap = q.get("max_expansions", DEFAULT_MAX_EXPANSIONS)
        stats = self._paths("term_stats")
        if "prefix" in q:
            norm = normalize_pattern(q["prefix"])
            expand = (lambda f: expand_prefix(stats, f, norm, cap)) \
                if norm else (lambda f: [])
            label = f"prefix:{q['prefix']}"
        elif "wildcard" in q:
            norm = normalize_wildcard(q["wildcard"])
            expand = (lambda f: expand_wildcard(stats, f, norm, cap)) \
                if norm else (lambda f: [])
            label = f"wildcard:{q['wildcard']}"
        elif "regex" in q:
            pat = q["regex"]
            expand = (lambda f: expand_regex(stats, f, pat, cap)) \
                if pat else (lambda f: [])
            label = f"regex:{pat}"
        elif "fuzzy" in q:
            norm = normalize_pattern(q["fuzzy"])
            dist = q.get("fuzzy_distance", 1)
            fuzzy = self._fuzzy_dict_paths()
            expand = (lambda f: expand_fuzzy(stats, f, norm, dist, cap,
                                             fuzzy_paths=fuzzy)) \
                if norm else (lambda f: [])
            label = f"fuzzy:{q['fuzzy']}~{dist}"
        elif "term_range" in q:
            lo, hi = q["term_range"]
            inc_lo = q.get("include_lower", True)
            inc_hi = q.get("include_upper", False)
            expand = (lambda f: expand_term_range(stats, f, lo, hi,
                                                  inc_lo, inc_hi, cap))
            label = f"term_range:{lo},{hi}"
        elif "term_set" in q:
            ts = tuple(q["term_set"])
            expand = (lambda f: expand_term_set(stats, f, ts, cap))
            label = "term_set:" + ",".join(sorted(map(str, ts))[:8])
        elif "parsed" in q:
            # query-string grammar (query/parser.py — the tantivy
            # QueryParser analog); [a TO b] atoms expand through the
            # same driver-side pyarrow byte-range read as term_range
            from .parser import parse_with_filters

            def expand_rng(f, lo, hi, ilo, ihi, rcap):
                return [t for t, _ in expand_term_range(
                    stats, f, lo, hi, ilo, ihi, rcap)]

            return (parse_with_filters(q["parsed"], filters, boosts,
                                       expand_range=expand_rng,
                                       max_expansions=cap),
                    f"parsed:{q['parsed']}")
        elif "phrase_prefix" in q:
            from .compiler import compile_phrase_prefix, split_phrase_prefix

            fixed, raw_prefix = split_phrase_prefix(q["phrase_prefix"])
            norm = normalize_pattern(raw_prefix)
            per_field = {f: [t for t, _ in expand_prefix(stats, f, norm,
                                                         cap)]
                         for f in self.EXPAND_FIELDS} if norm else {}
            return (compile_phrase_prefix(fixed, per_field,
                                          filters=filters, boosts=boosts),
                    f"phrase_prefix:{q['phrase_prefix']}")
        else:
            raise ValueError(
                "batch entry needs one of query/prefix/wildcard/regex/"
                "fuzzy/term_range/term_set/phrase_prefix/parsed: "
                f"{sorted(q)}")
        per_field = {f: [t for t, _ in expand(f)]
                     for f in self.EXPAND_FIELDS}
        return (compile_expanded(per_field, filters=filters,
                                 boosts=boosts), label)

    def _run_compiled_batch(self, compiled, labels, k, offset, algo,
                            afters=None) -> DataFrame:
        t0 = time.time()
        sc = self.spark.sparkContext
        self._qseq = getattr(self, "_qseq", 0) + 1
        group = f"spyglass-search-{id(self)}-{self._qseq}"
        sc.setJobGroup(group, "spyglass search")
        try:
            out = self._execute_compiled(compiled, k=k, offset=offset,
                                         algo=algo, afters=afters)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        self.last_meta = {
            "queries": labels,
            "num_docs": self.manifest.num_docs,
            "term_counts": [cq.term_count for cq in compiled],
            # jobs launched DURING execution (the driver-merge path fully
            # materializes inside, so this is the whole query for the
            # common shape: 1 = the single scoring pass; the returned
            # LocalRelation adds zero jobs at collect)
            "spark_jobs": len(sc.statusTracker().getJobIdsForGroup(group)),
            # how many of the batch's queries took the WAND pruning path
            # (algo='auto'); the rest fell back to the exhaustive scorer
            "wand_eligible": getattr(self, "_last_wand_eligible", 0),
            "wall_time_ms": round((time.time() - t0) * 1000.0, 1),
        }
        return out

    # -- multi-term pattern queries (prefix / fuzzy rewrite) -------------
    # The reference leaves these as a todo (query.rs:119,163); semantics
    # are the tantivy/Lucene rewrite documented in query/expand.py. The
    # expansion itself is a driver-side row-group-pruned pyarrow read —
    # zero Spark jobs — so a pattern search still costs ONE scoring job.

    EXPAND_FIELDS = ("content", "title")

    def search_prefix(self, pattern: str, k: int = 5, offset: int = 0,
                      fields: tuple = EXPAND_FIELDS,
                      max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                      filters=(), boosts=(), algo: str = "auto",
                      search_after=None) -> DataFrame:
        """``spar*``: every dictionary term starting with the normalized
        pattern (capped, df-ranked) scored as a Should group. Deep paging
        composes: ``search_after`` is the same (score, doc_ord) cursor as
        ``search`` (the expansion is deterministic per commit, so every
        page scores the identical Should group)."""
        norm = normalize_pattern(pattern)
        stats = self._paths("term_stats")
        per_field = {f: [t for t, _ in expand_prefix(stats, f, norm,
                                                     max_expansions)]
                     for f in fields} if norm else {}
        self.last_expansion = per_field
        cq = compile_expanded(per_field, filters=filters, boosts=boosts)
        return self._run_compiled_batch(
            [cq], [f"prefix:{pattern}"], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_phrase_prefix(self, query: str, k: int = 5, offset: int = 0,
                             fields: tuple = EXPAND_FIELDS,
                             max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                             filters=(), boosts=(), algo: str = "auto",
                             search_after=None) -> DataFrame:
        """``parse huge po`` → tantivy PhrasePrefixQuery
        (search-as-you-type): the trailing token is a dictionary prefix
        and each expansion COMPLETES the phrase — matches require the
        fixed tokens followed by an expansion at the next raw-token
        position (compile_phrase_prefix documents the position/boost/
        degradation rules). The expansion is the same driver-side
        term_stats range read as search_prefix — one scoring Spark job;
        paging via ``offset``/``search_after`` composes as in
        ``search``."""
        from .compiler import compile_phrase_prefix, split_phrase_prefix

        fixed, raw_prefix = split_phrase_prefix(query)
        norm = normalize_pattern(raw_prefix)
        stats = self._paths("term_stats")
        per_field = {f: [t for t, _ in expand_prefix(stats, f, norm,
                                                     max_expansions)]
                     for f in fields} if norm else {}
        self.last_expansion = per_field
        cq = compile_phrase_prefix(fixed, per_field, filters=filters,
                                   boosts=boosts)
        return self._run_compiled_batch(
            [cq], [f"phrase_prefix:{query}"], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_fuzzy(self, term: str, distance: int = 1, k: int = 5,
                     offset: int = 0, fields: tuple = EXPAND_FIELDS,
                     max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                     filters=(), boosts=(), algo: str = "auto",
                     search_after=None) -> DataFrame:
        """Terms within Levenshtein ``distance`` of the normalized
        pattern, via the SymSpell sidecar when present (ensure with
        ``ensure_fuzzy_dict``) and a dictionary-slice verify otherwise.
        ``search_after`` pages exactly as in ``search``."""
        norm = normalize_pattern(term)
        stats = self._paths("term_stats")
        fuzzy = self._fuzzy_dict_paths()
        per_field = {f: [t for t, _ in expand_fuzzy(
                         stats, f, norm, distance, max_expansions,
                         fuzzy_paths=fuzzy)]
                     for f in fields} if norm else {}
        self.last_expansion = per_field
        cq = compile_expanded(per_field, filters=filters, boosts=boosts)
        return self._run_compiled_batch(
            [cq], [f"fuzzy:{term}~{distance}"], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_wildcard(self, pattern: str, k: int = 5, offset: int = 0,
                        fields: tuple = EXPAND_FIELDS,
                        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                        filters=(), boosts=(), algo: str = "auto",
                        search_after=None) -> DataFrame:
        """``s?ar*``: Lucene/tantivy WildcardQuery — dictionary terms
        fullmatching the normalized pattern (query/expand.py contract)
        scored as a Should group. The expansion is a driver-side pyarrow
        read range-pruned by the literal run before the first
        metacharacter; a leading-wildcard pattern scans the field's
        dictionary slice (linear in vocabulary, documented). Paging via
        ``offset``/``search_after`` composes exactly as in ``search``."""
        norm = normalize_wildcard(pattern)
        stats = self._paths("term_stats")
        per_field = {f: [t for t, _ in expand_wildcard(stats, f, norm,
                                                       max_expansions)]
                     for f in fields} if norm else {}
        self.last_expansion = per_field
        cq = compile_expanded(per_field, filters=filters, boosts=boosts)
        return self._run_compiled_batch(
            [cq], [f"wildcard:{pattern}"], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_term_range(self, lower: str | None = None,
                          upper: str | None = None,
                          include_lower: bool = True,
                          include_upper: bool = False,
                          k: int = 5, offset: int = 0,
                          fields: tuple = EXPAND_FIELDS,
                          max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                          filters=(), boosts=(), algo: str = "auto",
                          search_after=None) -> DataFrame:
        """tantivy RangeQuery over a str field: dictionary terms in
        [lower, upper) (bounds normalized to the folded alphabet;
        include flags / None-unbounded per tantivy's Bound semantics)
        scored as a Should group. The expansion is a pure byte-range
        pyarrow read over the (field, term)-sorted term_stats — row-group
        pruned on BOTH bounds with no post-filter, the best-pruned member
        of the pattern family. tantivy const-scores ranges at 1.0; here
        the match SET is identical and the ordering is the deterministic
        df-ranked BM25 Should group every other pattern query uses (the
        documented family contract, expand.py module docstring). Paging
        via ``offset``/``search_after`` composes exactly as in
        ``search``."""
        stats = self._paths("term_stats")
        per_field = {f: [t for t, _ in expand_term_range(
                         stats, f, lower, upper, include_lower,
                         include_upper, max_expansions)]
                     for f in fields}
        self.last_expansion = per_field
        cq = compile_expanded(per_field, filters=filters, boosts=boosts)
        lb = "[" if include_lower else "("
        ub = "]" if include_upper else ")"
        return self._run_compiled_batch(
            [cq], [f"term_range:{lb}{lower},{upper}{ub}"], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_term_set(self, terms, k: int = 5, offset: int = 0,
                        fields: tuple = EXPAND_FIELDS,
                        max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                        filters=(), boosts=(), algo: str = "auto",
                        search_after=None) -> DataFrame:
        """tantivy TermSetQuery (new in 0.19): the subset of ``terms``
        present in the dictionary scored as a Should group. The set is
        normalized (lowercase + fold, NOT stemmed — tantivy takes raw
        Terms) and read via a pyarrow IN-list predicate over the sorted
        term_stats: row-group pruned to [min, max] plus parquet
        dictionary-page filtering. tantivy const-scores the union at
        1.0; as with every pattern shape here the match SET is identical
        and ordering is the deterministic df-ranked BM25 Should group
        (expand.py family contract). Paging composes as in ``search``."""
        stats = self._paths("term_stats")
        per_field = {f: [t for t, _ in expand_term_set(
                         stats, f, terms, max_expansions)]
                     for f in fields}
        self.last_expansion = per_field
        cq = compile_expanded(per_field, filters=filters, boosts=boosts)
        label = "term_set:" + ",".join(sorted(map(str, terms))[:8])
        return self._run_compiled_batch(
            [cq], [label], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_regex(self, pattern: str, k: int = 5, offset: int = 0,
                     fields: tuple = EXPAND_FIELDS,
                     max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                     filters=(), boosts=(), algo: str = "auto",
                     search_after=None) -> DataFrame:
        """tantivy RegexQuery (the query.rs:119,163 todo's general
        form): anchored fullmatch of a raw regex against the dictionary.
        The pattern is NOT analyzed — terms are lowercase+folded, so
        callers write the pattern against that alphabet (Lucene
        RegexpQuery behaves identically). Range-pruned when
        ``regex_literal_prefix`` extracts a safe literal run; otherwise
        the field's dictionary slice is scanned (vocab-scale)."""
        stats = self._paths("term_stats")
        per_field = {f: [t for t, _ in expand_regex(stats, f, pattern,
                                                    max_expansions)]
                     for f in fields} if pattern else {}
        self.last_expansion = per_field
        cq = compile_expanded(per_field, filters=filters, boosts=boosts)
        return self._run_compiled_batch(
            [cq], [f"regex:{pattern}"], k, offset, algo,
            afters=[search_after]).drop("query_id")

    def search_parsed(self, query: str, filters=(), boosts=(), k: int = 5,
                      offset: int = 0, algo: str = "auto",
                      max_expansions: int = DEFAULT_MAX_EXPANSIONS,
                      search_after=None, combiner: str = "sum",
                      tie_breaker: float = 0.0,
                      min_should_match: int | str = 0) -> DataFrame:
        """Query-string search — the tantivy ``QueryParser`` analog
        (query/parser.py documents the grammar: ``+must -not
        field:term "phrase"~slop term^boost field:[a TO b]``). Parsing
        and range expansion are driver-side (zero Spark jobs); the
        compiled clause tree scores through the standard kernel, so
        deep paging, batching, algo and the dismax combiner all
        compose."""
        return self.search_many(
            [{"parsed": query, "filters": filters, "boosts": boosts,
              "max_expansions": max_expansions, "after": search_after,
              "combiner": combiner, "tie_breaker": tie_breaker,
              "min_should_match": min_should_match}],
            k=k, offset=offset, algo=algo).drop("query_id")

    def _fuzzy_dict_paths(self) -> list[str] | None:
        import os

        from ..index.fuzzy_dict import fuzzy_dict_path
        p = fuzzy_dict_path(self.index_dir, self.manifest.commit_seq)
        return [p] if os.path.exists(os.path.join(p, "_SUCCESS")) else None

    def ensure_fuzzy_dict(self) -> str:
        """Build the deletion-variant sidecar for the loaded commit if
        missing (one vocab-scale Spark job; see index/fuzzy_dict.py)."""
        from ..index.fuzzy_dict import build_fuzzy_dict

        return build_fuzzy_dict(self.spark, self.index_dir)

    def suggest(self, term: str, field: str = "content",
                distance: int = 2, limit: int = 5,
                mode: str = "popular") -> list[dict]:
        """Spelling suggestions ("did you mean") for one term — the
        Lucene DirectSpellChecker / ES term-suggester analog
        (query/expand.suggest_terms documents the ranking and the ES
        ``suggest_mode`` contract: missing | popular | always).
        Driver-side by construction — the SymSpell sidecar IN-list read
        when it covers ``distance``, the field's dictionary slice
        otherwise, both in the pyarrow metadata plane: ZERO Spark jobs
        (the dictionary is vocab-scale, not corpus-scale, at any SF).
        Returns [{"term", "df", "dist"}] — raw dictionary terms (the
        content field's are stemmed, like every pattern query's)."""
        from .expand import normalize_pattern, suggest_terms

        norm = normalize_pattern(term)
        if not norm:
            return []
        out = suggest_terms(self._paths("term_stats"), field, norm,
                            distance=distance, limit=limit, mode=mode,
                            fuzzy_paths=self._fuzzy_dict_paths())
        return [{"term": t, "df": int(d), "dist": int(x)}
                for t, d, x in out]

    def suggest_query(self, query: str, field: str = "content",
                      distance: int = 2, limit_per_term: int = 3,
                      mode: str = "missing") -> dict:
        """Whole-query "did you mean" — the Lucene SpellChecker
        collate-style rewrite / the ES phrase-suggester use case,
        composed from the term suggester (suggest). The query is
        analyzed with the FIELD's analyzer, so corrections live in the
        same stemmed/normalized term space every pattern query uses;
        each analyzed term gets term-suggester corrections (default
        mode 'missing' — only out-of-dictionary terms are corrected,
        the classic spell-check-on-zero-results shape; 'popular'
        upgrades every term to a strictly-more-frequent neighbor when
        one exists), and ``corrected`` is the analyzed term stream with
        each correctable term replaced by its TOP suggestion. ONE
        dictionary read serves the whole query
        (expand.suggest_query_terms) — still ZERO Spark jobs. Returns
        {"corrected", "changed", "terms": [{"term", "suggestions":
        [{"term", "df", "dist"}, ...]}  per distinct analyzed term]}."""
        from ..analysis.analyzer import tokenize_default, tokenize_en
        from .expand import suggest_query_terms

        tok = tokenize_en if field == "content" else tokenize_default
        toks = [t for _, t in tok(query or "")]
        sug = suggest_query_terms(self._paths("term_stats"), field, toks,
                                  distance=distance, limit=limit_per_term,
                                  mode=mode,
                                  fuzzy_paths=self._fuzzy_dict_paths())
        corrected = " ".join(sug[t][0][0] if sug.get(t) else t
                             for t in toks)
        return {
            "corrected": corrected,
            "changed": corrected != " ".join(toks),
            "terms": [{"term": t, "suggestions": [
                {"term": s, "df": int(d), "dist": int(x)}
                for s, d, x in sug.get(t, [])]}
                for t in dict.fromkeys(toks)],
        }

    def _scoring_partial(self, compiled: list[CompiledQuery],
                         limit: int | None, algo: str = "auto",
                         afters=None) -> DataFrame | None:
        """Distributed per-partition scoring frame for a compiled batch:
        (query_id, doc_ord, score) rows, truncated per part at ``limit``
        (None = the FULL score>0 set, the scored-export path — numpy's
        ``[:None]`` keeps every candidate). Shared by the top-k search
        collectors and score_matches/export_scored. None when the batch
        carries no term keys (all-stopword queries)."""
        built = self._build_scoring_plan(compiled, limit, algo, afters)
        if built is None:
            return None
        plan, fields, terms, needs_pos, _est = built
        postings = self._postings_base.filter(
            F.col("field").isin(fields) & F.col("term").isin(terms))
        # positions are only decoded by phrase clauses — for term-only
        # query batches, prune the pos_bytes column (the largest payload)
        # out of the scan + shuffle entirely
        if not needs_pos:
            postings = postings.drop("pos_bytes")
        return self._partial_frame(plan, postings)

    def _build_scoring_plan(self, compiled: list[CompiledQuery],
                            limit: int | None, algo: str = "auto",
                            afters=None):
        """Common scoring-plan construction for the distributed and the
        driver-local executors: (plan, fields, terms, needs_pos,
        est_rows) or None for a term-less batch. ``est_rows`` is the
        global posting-row volume the batch will decode (Σ df per key;
        phrase members weighted ×4 for their position payloads) — the
        scale gate for the driver-local path."""
        m = self.manifest
        keys = set()
        for cq in compiled:
            keys |= cq.term_keys()
        if not keys:
            self._last_wand_eligible = 0
            return None

        fields = sorted({f for f, _ in keys})
        terms = sorted({t for _, t in keys})
        # global df per (field, term): driver-side pruned read of the
        # term-sorted stats store, memoized (df counts tombstoned docs,
        # matching tantivy's searcher-global stats)
        dfs = self._term_dfs(keys)
        cache_fields = set(m.field_totals) | {f for f, _ in keys}
        caches = {f: norm_cache(m.field_totals.get(f, 0) / m.num_docs
                                if m.num_docs else 1.0)
                  for f in cache_fields}
        plan = {
            # "after": the search_after cursor (score, GLOBAL doc_ord) or
            # None — translated to each part's local ordinal space inside
            # _score_partition
            "queries": [{"query_id": qi,
                         "specs": _clause_specs(cq, dfs, m.num_docs),
                         # Should-group score combiner (compiler.py):
                         # 'sum' (default) or 'dismax' with tie ∈ [0,1]
                         "combiner": getattr(cq, "combiner", "sum"),
                         "tie": float(getattr(cq, "tie_breaker", 0.0)),
                         # Lucene minimumNumberShouldMatch candidate
                         # gate (compiler.py); ≥2 disables WAND (pruning
                         # strategy only — msm shapes score exhaustively)
                         "msm": int(getattr(cq, "min_should_match", 0)),
                         "after": (float(afters[qi][0]), int(afters[qi][1]))
                         if afters is not None and afters[qi] is not None
                         else None}
                        for qi, cq in enumerate(compiled)],
        }
        # eligibility is a pure function of the specs — recorded so
        # last_meta can report how many of the batch's queries took the
        # WAND pruning path (vs exhaustive fallback)
        self._last_wand_eligible = sum(
            1 for q in plan["queries"]
            if q["msm"] <= 1 and _wand_eligible(q["specs"]))
        plan |= {
            "caches": caches,
            "limit": limit,
            "algo": algo,
            # norm/fast-field arrays are read DIRECTLY by the scoring UDF
            # (part-pruned pyarrow over kind=1/kind=4, cached per worker) —
            # no norms scan, no touched-parts semijoin, no cogroup: the
            # whole search is scan → one exchange → score
            "store_dirs": [f"{self.index_dir}/{g['prefix']}/store"
                           for g in self.gens],
            # commit_seq (monotonic, bumped per commit) versions the
            # per-worker norm/tombstone caches: created_utc alone is
            # 1-second-granular, so two delete commits in the same second
            # overwriting the same tombstone dir would leave warmed
            # executors serving the first commit's cached ordinals
            "store_epoch": f"{m.created_utc}#{getattr(m, 'commit_seq', 0)}",
        }
        plan.update(self._tombstone_plan())

        needs_pos = any(s["kind"] == "phrase"
                        for q in plan["queries"] for s in q["specs"])
        # decode-volume estimate: df rows per term clause; phrase members
        # additionally decode their position streams (~cf entries each)
        phrase_keys = {(s["field"], t) for q in plan["queries"]
                       for s in q["specs"] if s["kind"] == "phrase"
                       for t in s["terms"]}
        cfs = self._term_cfs(phrase_keys) if phrase_keys else {}
        est = 0
        for q in plan["queries"]:
            for s in q["specs"]:
                for t in s["terms"]:
                    est += dfs.get((s["field"], t), 0)
                    if s["kind"] == "phrase":
                        est += cfs.get((s["field"], t), 0)
        return plan, fields, terms, needs_pos, est

    def _execute_compiled(self, compiled: list[CompiledQuery], k: int = 5,
                          offset: int = 0, algo: str = "auto",
                          afters=None) -> DataFrame:
        built = self._build_scoring_plan(compiled, k + offset, algo, afters)
        if built is None:
            return self._empty_result()
        plan, fields, terms, needs_pos, est = built

        total_parts = sum(g["num_partitions"] for g in self.gens)
        bound = total_parts * (k + offset) * len(compiled)
        # Driver-local execution for SMALL searches: the identical
        # scoring kernel (_score_partition) over a pyarrow-pruned posting
        # read — zero Spark jobs, skipping the ~0.5 s scan+Python-worker
        # floor a 1 MB posting fetch pays as a cluster job (the tantivy
        # single-searcher shape; same metadata-plane pattern as the
        # pattern expansions and _doc_meta_pyarrow). Strictly gated:
        # estimated decode volume (Σ df, phrase-weighted), batch width,
        # and part count (footer metadata is per-file) — any big shape
        # keeps the distributed path, which stays the 100 TB executor.
        if (LOCAL_EXEC_MODE != "never" and bound <= MERGE_COLLECT_MAX
                and len(compiled) <= LOCAL_EXEC_MAX_QUERIES
                and total_parts <= LOCAL_EXEC_MAX_PARTS
                and (est <= LOCAL_EXEC_MAX_ROWS
                     or LOCAL_EXEC_MODE == "always")):
            pdf = self._score_local(plan, fields, terms, needs_pos)
            return self._merge_driver_pdf(pdf, k, offset)
        postings = self._postings_base.filter(
            F.col("field").isin(fields) & F.col("term").isin(terms))
        if not needs_pos:
            postings = postings.drop("pos_bytes")
        partial = self._partial_frame(plan, postings)
        if bound <= MERGE_COLLECT_MAX:
            # AQE is a net loss for this fixed scan→exchange→score shape:
            # it runs the shuffle stage as its OWN job (a barrier between
            # two scheduling rounds) and coalesces the tiny-byte posting
            # shuffle down to a handful of tasks — serializing the
            # CPU-heavy scoring stage that the bytes don't predict.
            # Disabling it for the scoring collect makes a search exactly
            # ONE fixed-parallelism Spark job (measured 2.2s → 0.7s warm
            # hot-term at sf0.1 bench scale). Session-level toggle:
            # restored in finally; a concurrent query planned in the
            # window would only lose an optimization, never correctness.
            conf = self.spark.conf
            prev = conf.get("spark.sql.adaptive.enabled", "true")
            prev_cost = conf.get("spark.sql.files.openCostInBytes", "4194304")
            conf.set("spark.sql.adaptive.enabled", "false")
            if self._scan_aligned:
                # size open-cost so the per-part files pack into ≈cores
                # tasks: the default 4 MB packs them into a handful
                # (serializing the CPU-heavy scoring), while 1 file/task
                # costs a Python-worker round trip per PART (measured
                # ~0.7 s of pure invocation overhead at P=128). Each task
                # still holds only COMPLETE parts.
                cores = max(self.spark.sparkContext.defaultParallelism, 1)
                per_task = max(1, -(-self._posting_file_count // cores))
                conf.set("spark.sql.files.openCostInBytes",
                         str(max(4 << 20, self._max_partition_bytes // per_task)))
            try:
                return self._merge_driver(partial, len(compiled), k, offset)
            finally:
                conf.set("spark.sql.adaptive.enabled", prev)
                conf.set("spark.sql.files.openCostInBytes", prev_cost)
        return self._merge_window(partial, k, offset)

    def _partial_frame(self, plan: dict, postings: DataFrame) -> DataFrame:
        """Per-partition scoring frame (query_id, doc_ord, score).

        Scan-aligned (the common case): one posting file per doc
        partition means every scan task already holds complete parts —
        group per part INSIDE the task and score, ZERO shuffle. On a
        1000-executor cluster this removes the per-query all-to-all;
        locally it removes the shuffle stage barrier. Falls back to the
        groupBy exchange when a part's postings could split across scan
        tasks (oversized files — see _compute_scan_aligned)."""
        if self._scan_aligned:
            def run_map(batches):
                chunks = [pdf for pdf in batches if len(pdf)]
                if not chunks:
                    return
                pdf = (pd.concat(chunks, ignore_index=True)
                       if len(chunks) > 1 else chunks[0])
                for _, g in pdf.groupby("part_id", sort=True):
                    yield _score_partition(plan, g)

            return postings.mapInPandas(run_map, RESULT_SCHEMA)

        def run(pdf):
            return _score_partition(plan, pdf)

        return postings.groupBy("part_id").applyInPandas(run, RESULT_SCHEMA)

    def _score_local(self, plan: dict, fields, terms,
                     needs_pos: bool) -> pd.DataFrame:
        """Driver-local scoring: the SAME per-part kernel
        (_score_partition) over a pyarrow read of the query terms'
        posting chunks (kind-partition + field/term row-group pruned),
        sharing the process-level norm/tombstone caches the executors
        use. Bitwise-identical to the distributed path by construction —
        pinned by tests/test_search_parity.py::test_local_exec_ab_parity."""
        import pyarrow.dataset as pads

        cols = ["part_id", "field", "term", "df_part", "cf_part",
                "n_local", "doc_bytes", "tf_bytes", "meta_bytes"]
        if needs_pos:
            cols.append("pos_bytes")
        flt = ((pads.field("kind") == KIND_POSTING)
               & pads.field("field").isin(list(fields))
               & pads.field("term").isin(list(terms)))
        epoch = plan.get("store_epoch", "")
        chunks = []
        for d in plan["store_dirs"]:
            ds = _NORM_CACHE.get(("ds", d, epoch))
            if ds is None:  # same handle _load_part_arrays caches
                ds = _NORM_CACHE[("ds", d, epoch)] = pads.dataset(
                    d, format="parquet", partitioning="hive")
            tbl = ds.to_table(columns=cols, filter=flt)
            if tbl.num_rows:
                chunks.append(tbl.to_pandas())
        if not chunks:
            pdf = pd.DataFrame({c: [] for c in cols})
        else:
            pdf = pd.concat(chunks, ignore_index=True) \
                if len(chunks) > 1 else chunks[0]
        outs = [_score_partition(plan, g)
                for _, g in pdf.groupby("part_id", sort=True)]
        if not outs:
            return _score_partition(plan, pdf.iloc[0:0])
        return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    # hit sets up to this size materialize doc_meta via a driver-side
    # pyarrow pruned read (metadata-plane, no Spark job); larger sets go
    # through the distributed join
    _META_PYARROW_MAX = 512

    def _merge_driver(self, partial: DataFrame, nq: int, k: int, offset: int) -> DataFrame:
        """Global top-k merge on the driver: ONE Spark job collects the
        per-partition candidates (≤ parts×limit×queries tiny rows), numpy
        resolves the global order, and the hit rows materialize their
        stored fields from a part-pruned doc_meta read — driver-side
        pyarrow for small hit sets (the doc-store-lookup analog: a
        metadata-plane fetch, not a cluster job), a broadcast join above
        the size guard."""
        # Arrow collect + ONE global lexsort replaces the per-query python
        # heap loop: (query asc, score desc, ord asc) ordering, then each
        # query's [offset, offset+k) slice — identical ranks/tie-breaks,
        # ~10 ms at 80k rows where the Row loop took ~1 s
        return self._merge_driver_pdf(partial.toPandas(), k, offset)

    def _merge_driver_pdf(self, pdf: pd.DataFrame, k: int,
                          offset: int) -> DataFrame:
        """Global top-k merge over a driver-resident partial frame —
        shared by the collected distributed path and the driver-local
        executor."""
        if not len(pdf):
            return self._empty_result()
        qa = pdf["query_id"].to_numpy()
        oa = pdf["doc_ord"].to_numpy()
        sa = pdf["score"].to_numpy()
        order = np.lexsort((oa, -sa.astype(np.float64), qa))
        qs = qa[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        ends = np.r_[starts[1:], qs.size]
        hits = []  # (query_id, rank, doc_ord, score) — (query, rank) asc
        for st, en in zip(starts, ends):
            sel = order[st + offset:min(en, st + offset + k)]
            qi = int(qs[st])
            for rank, i in enumerate(sel, start=1 + offset):
                hits.append((qi, rank, int(oa[i]), float(sa[i])))
        if not hits:
            return self._empty_result()
        # gate on DISTINCT docs, not hit rows: a 64-query batch's hits
        # overlap heavily (640 rows ≈ 150 docs), and the pyarrow read cost
        # scales with docs while the VALUES result handles any row count
        uniq = {h[2] for h in hits}
        if len(uniq) <= self._META_PYARROW_MAX:
            meta = self._doc_meta_pyarrow(uniq)
            out = [(qid, rank, *meta[ord_], float(np.float32(score)), ord_)
                   for qid, rank, ord_, score in sorted(hits)]
            return self._local_hits_df(out)
        hits_df = self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(hits, 1),
            "query_id long, rank int, doc_ord long, score float")
        parts = sorted({h[2] >> ORD_SHIFT for h in hits})
        ords_all = [h[2] for h in hits]
        dm = self._doc_meta_base.filter(
            F.col("part_id").isin(parts) & F.col("doc_ord").isin(ords_all))
        return (dm.join(F.broadcast(hits_df), "doc_ord")
                .select("query_id", "rank", "doc_id", "url", "domain", "title",
                        "description", "tags",
                        F.col("score").cast("float").alias("score"),
                        "doc_ord")
                .orderBy("query_id", "rank"))

    def _doc_meta_pyarrow(self, ords: set[int]) -> dict[int, tuple]:
        """doc_ord → (doc_id, url, domain, title, description, tags) via a pyarrow read
        of the kind=3 store files pruned to the hit partitions (row-group
        stats prune on part_id/local_ord inside each part file)."""
        import pyarrow.dataset as pads

        parts = sorted({o >> ORD_SHIFT for o in ords})
        locs = sorted({o & ((1 << ORD_SHIFT) - 1) for o in ords})
        flt = (pads.field("kind") == KIND_DOCMETA) \
            & pads.field("part_id").isin(parts) \
            & pads.field("local_ord").isin(locs)
        out: dict[int, tuple] = {}
        # dataset handles hold the file listing — cached per generation so
        # repeated searches skip the store-directory walk (~0.1 s at
        # P=128); refresh() rebuilds the engine and drops the cache
        ds_cache = getattr(self, "_meta_ds_cache", None)
        if ds_cache is None:
            ds_cache = self._meta_ds_cache = {}
        for g in self.gens:
            ds = ds_cache.get(g["prefix"])
            if ds is None:
                ds = ds_cache[g["prefix"]] = pads.dataset(
                    f"{self.index_dir}/{g['prefix']}/store",
                    format="parquet", partitioning="hive")
            tbl = ds.to_table(columns=["part_id", "local_ord", "doc_id", "url",
                                       "domain", "title", "description",
                                       "tags"], filter=flt)
            for p, lo, did, url, dom, ti, desc, tags in zip(
                    tbl.column("part_id").to_pylist(),
                    tbl.column("local_ord").to_pylist(),
                    tbl.column("doc_id").to_pylist(),
                    tbl.column("url").to_pylist(),
                    tbl.column("domain").to_pylist(),
                    tbl.column("title").to_pylist(),
                    tbl.column("description").to_pylist(),
                    tbl.column("tags").to_pylist()):
                ord_ = (int(p) << ORD_SHIFT) + int(lo)
                if ord_ in ords:
                    out[ord_] = (did, url, dom, ti, desc, tags)
        return out

    def _merge_window(self, partial: DataFrame, k: int, offset: int) -> DataFrame:
        """Distributed global top-k (the scalable fallback): identical
        (score desc, doc_ord asc) ordering via a rank window."""
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_ord"))
        topk = (partial.withColumn("rank", F.row_number().over(w))
                .filter((F.col("rank") > offset) & (F.col("rank") <= k + offset))
                .localCheckpoint(eager=True))  # scoring runs exactly once
        hit_parts = [int(r["part_id"]) for r in
                     topk.select((F.col("doc_ord") / F.lit(1 << ORD_SHIFT))
                                 .cast("long").alias("part_id"))
                         .distinct().collect()]
        dm = (self._doc_meta_base.filter(F.col("part_id").isin(hit_parts))
              if hit_parts else self._doc_meta_base)
        return (topk.join(dm.select("doc_ord", "doc_id", "url", "domain",
                                    "title", "description", "tags"),
                          "doc_ord", "left")
                .select("query_id", "rank", "doc_id", "url", "domain", "title",
                        "description", "tags",
                        F.col("score").cast("float").alias("score"),
                        "doc_ord")
                .orderBy("query_id", "rank"))

    def more_like_this(self, doc_id: str, documents: DataFrame, k: int = 5,
                       max_terms: int = 10) -> DataFrame:
        """Find documents similar to ``doc_id``: pick its ``max_terms``
        highest tf·idf content terms (idf from the index's global stats)
        and run them as a Should-group BM25 query, excluding the seed doc.
        ``documents`` is the stored row store (source table)."""
        from collections import Counter

        from ..analysis.analyzer import tokenize_en
        from .scoring import idf as idf_fn

        from ..sources import filter_by_doc_ids

        # bucket-pruned when ``documents`` is a write_row_store layout
        # (1/256 partition read instead of a full scan at scale)
        row = (filter_by_doc_ids(documents, [doc_id])
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

    def explain(self, query, url: str, filters=(), boosts=()) -> dict:
        """Per-clause BM25 score breakdown for one document — the tantivy
        ``Query::explain``/``Explanation`` analog [tantivy-0.19.2 public
        API], and this rebuild's rank-identity debugging tool. ``query``
        takes any _compile_arg shape (a string, or a search_many-style
        dict incl. ``parsed``/pattern shapes with a ``combiner``); the
        reported ``score`` applies the query's combiner with the same
        float32 op order as the scorer. Returns::

            {"url", "found", "matches", "score", "clauses": [
               {"role", "kind", "field", "terms", "boost", "weight",
                "df", "tf", "fieldnorm_id", "fieldnorm", "contribution",
                "matched"}, ...]}

        ``score`` is the float32 clause-order sum of matching scoring
        clauses — bitwise the score ``search`` would return for this doc.
        ``matches`` applies the full boolean gate (Must-wrapped Should
        group, musts, range musts, must_nots, score>0). Driver-side by
        construction: one doc-address lookup + one tiny posting collect
        (the involved (field, term) rows of ONE part) + a part-pruned
        pyarrow norms read — never a corpus scan."""
        from ..index.fieldnorm import id_to_fieldnorm

        cq = self._compile_arg(query, filters, boosts)
        keys = cq.term_keys()
        m = self.manifest
        out: dict = {"url": url, "found": False, "matches": False,
                     "score": 0.0, "clauses": []}
        if not keys:
            return out
        addr = self.document_query(urls=[url]).select("doc_ord").collect()
        if not addr:
            return out
        out["found"] = True
        doc_ord = int(addr[0]["doc_ord"])
        part, lo = doc_ord >> ORD_SHIFT, doc_ord & ((1 << ORD_SHIFT) - 1)
        out["doc_ord"] = doc_ord

        dfs = self._term_dfs(keys)
        specs = _clause_specs(cq, dfs, m.num_docs)
        fields = sorted({f for f, _ in keys})
        terms = sorted({t for _, t in keys})
        rows = (self._postings_base
                .filter((F.col("part_id") == part)
                        & F.col("field").isin(fields)
                        & F.col("term").isin(terms))
                .collect())
        payload = {(r["field"], r["term"]): r for r in rows}
        norm_arrays, fast_arrays = _load_part_arrays(
            tuple(f"{self.index_dir}/{g['prefix']}/store" for g in self.gens),
            part, f"{m.created_utc}#{getattr(m, 'commit_seq', 0)}")
        caches = {f: norm_cache(m.field_totals.get(f, 0) / m.num_docs
                                if m.num_docs else 1.0) for f in fields}

        def doc_tf(field, term):
            r = payload.get((field, term))
            if r is None:
                return None, None
            docs, tfs = decode_postings(r["doc_bytes"], r["tf_bytes"])
            i = int(np.searchsorted(docs, lo))
            if i >= docs.size or int(docs[i]) != lo:
                return None, None
            return int(tfs[i]), (r, docs, tfs, i)

        def phrase_tf(spec):
            recs = [doc_tf(spec["field"], t) for t in spec["terms"]]
            if any(tf is None for tf, _ in recs):
                return None
            plists = [decode_positions_selected(
                          ctx[0]["pos_bytes"], ctx[2], np.array([ctx[3]]))[0]
                      for _, ctx in recs]
            n = sloppy_phrase_count(plists, list(spec["positions"]),
                                    spec["slop"])
            return n if n > 0 else None

        must_ok, must_not_hit = True, False
        should_matched_n = 0
        group_hit: dict[int, bool] = {}
        acc = np.float32(0.0)
        # dismax bookkeeping (combiner, compiler.py): shoulds come first
        # in spec order, so core = m + tie·(s − m) then the non-should
        # scoring contributions add in order — the same float32 op
        # sequence as _score_partition's dismax branch
        sh_sum, sh_max = np.float32(0.0), np.float32(0.0)
        rest_cs: list = []
        for spec in specs:
            field = spec["field"]
            entry = {"role": spec["role"], "kind": spec["kind"],
                     "field": field, "terms": spec["terms"],
                     "boost": spec["boost"], "weight": spec["weight"],
                     "df": [dfs.get((field, t), 0) for t in spec["terms"]],
                     "tf": 0, "fieldnorm_id": None, "fieldnorm": None,
                     "contribution": 0.0, "matched": False}
            if spec["kind"] == "range":
                arr = fast_arrays.get(field)
                v = int(arr[lo]) if arr is not None and lo < arr.size else -1
                ok = (v >= 0
                      and (spec["ge"] is None or v >= spec["ge"])
                      and (spec["le"] is None or v <= spec["le"]))
                entry["matched"] = bool(ok)
                if not ok:
                    must_ok = False
                out["clauses"].append(entry)
                continue
            tf = (doc_tf(field, spec["terms"][0])[0]
                  if spec["kind"] == "term" else phrase_tf(spec))
            if tf is not None:
                entry["matched"] = True
                entry["tf"] = int(tf)
                norms = norm_arrays.get(field)
                nid = int(norms[lo]) if norms is not None else 0
                entry["fieldnorm_id"] = nid
                entry["fieldnorm"] = int(id_to_fieldnorm(
                    np.array([nid], dtype=np.uint8))[0])
                if spec["scoring"]:
                    c = score_postings(np.array([tf], dtype=np.int64),
                                       np.array([nid], dtype=np.uint8),
                                       spec["weight"], caches[field])[0]
                    entry["contribution"] = float(c)
                    acc = np.float32(acc + np.float32(c))
                    if spec["role"] == "should":
                        sh_sum = np.float32(sh_sum + np.float32(c))
                        if np.float32(c) > sh_max:
                            sh_max = np.float32(c)
                    else:
                        rest_cs.append(np.float32(c))
            if spec["role"] == "should":
                should_matched_n += int(entry["matched"])
            elif spec["role"] == "extra_group":
                group_hit[spec["group"]] = (group_hit.get(spec["group"], False)
                                            or entry["matched"])
            elif spec["role"] == "must" and not entry["matched"]:
                must_ok = False
            elif spec["role"] == "must_not" and entry["matched"]:
                must_not_hit = True
            out["clauses"].append(entry)

        has_should = any(s["role"] == "should" for s in specs)
        if getattr(cq, "combiner", "sum") == "dismax":
            tie = np.float32(getattr(cq, "tie_breaker", 0.0))
            acc = sh_max + tie * (sh_sum - sh_max)
            for c in rest_cs:
                acc = np.float32(acc + c)
        out["score"] = float(acc)
        # Lucene minimumNumberShouldMatch gate: ≥ max(1, msm) DISTINCT
        # should clauses must match (the scorer's candidate rule)
        msm = max(1, int(getattr(cq, "min_should_match", 0)))
        out["should_matched"] = should_matched_n
        out["matches"] = bool(
            (should_matched_n >= msm or not has_should)
            and all(group_hit.values())
            and must_ok and not must_not_hit and float(acc) > 0.0)
        return out

    def status(self) -> dict:
        """``app_status`` RPC analog (spyglass-rpc/src/lib.rs:57-58,
        api/handler/mod.rs:190-200 — the reference returns num_docs from
        the index reader): manifest-level engine status, zero Spark jobs.
        Tombstone counts are manifest metadata; live-doc subtraction
        would need a side-table scan and is what library_stats does."""
        m = self.manifest
        return {
            "num_docs": m.num_docs,
            "index_dir": self.index_dir,
            "generations": len(self.gens),
            "num_partitions": m.num_partitions,
            "commit_seq": getattr(m, "commit_seq", 0),
            "created_utc": m.created_utc,
            "field_totals": dict(m.field_totals),
            "tombstoned_ids": len(m.tombstones),
            "tombstone_dirs": len(m.tombstone_dirs),
        }

    def is_document_indexed(self, url: str) -> bool:
        """index.is_document_indexed RPC analog (spyglass-rpc/src/lib.rs:43-44):
        a live (non-tombstoned) doc with this exact url exists."""
        dm = self._doc_meta_base.filter(F.col("url") == url)
        return not self._anti_tombstone(dm).isEmpty()

    def get_documents(self, doc_ids: list[str]) -> DataFrame:
        """Doc-store get-by-id (client/local.rs:71-95 analog): fetch the
        stored fields for exact doc ids. Tombstoned ids are excluded.

        Scale path: the untokenized ``id`` field is indexed, so the
        lookup is a term fetch on the TERM-SORTED postings store (row
        groups prune on the term min/max stats) resolving to exact
        (part_id, local_ord) addresses; doc_meta is then read with both
        pushed down. A plain ``doc_id IN (...)`` over doc_meta cannot
        prune — doc_meta is url-sorted, so UUID stats span every row
        group."""
        ids = sorted({str(d) for d in doc_ids})
        if not ids:
            return self._doc_meta_base.filter(F.lit(False)).select(
                "doc_id", "url", "domain", "title", "description",
                "tags", "doc_ord")
        post = (self._postings_base
                .filter((F.col("field") == "id") & F.col("term").isin(ids))
                .select("part_id", "doc_bytes").collect())
        # flat IN-lists (part_id for pruning, packed doc_ord for the exact
        # addresses) instead of an OR-reduced per-ordinal expression tree —
        # a large id list would otherwise build a Catalyst tree deep enough
        # to risk analyzer stack overflow
        addrs, parts = [], set()
        for r in post:
            ords, _ = decode_postings(r["doc_bytes"], b"")
            p = int(r["part_id"])
            parts.add(p)
            for o in ords:
                addrs.append((p << ORD_SHIFT) + int(o))
        if not addrs:
            return self._doc_meta_base.filter(F.lit(False)).select(
                "doc_id", "url", "domain", "title", "description",
                "tags", "doc_ord")
        dm = self._doc_meta_base.filter(
            F.col("part_id").isin(sorted(parts)) & F.col("doc_ord").isin(addrs))
        # doc_id recheck is belt-and-braces (ordinal addresses are exact)
        dm = self._anti_tombstone(dm.filter(F.col("doc_id").isin(ids)))
        return dm.select("doc_id", "url", "domain", "title", "description",
                         "tags", "doc_ord")

    def document_query(self, urls=(), ids=(), tags=(), exclude_tags=()) -> DataFrame:
        """Unscored document-set query (build_document_query +
        DocSetCollector, query.rs:184-231, client/local.rs:234-241):
        Must(any urls) AND Must(any ids) AND each tag AND NOT exclude_tags.
        Returns the full match set (no top-k, no scores)."""
        cond = F.lit(True)
        if urls:
            cond = cond & F.col("url").isin(list(urls))
        if ids:
            cond = cond & F.col("doc_id").isin(list(ids))
        out = self._doc_meta_base.filter(cond)
        for t in tags:
            out = out.join(self._tag_ords(int(t)), "doc_ord", "leftsemi")
        for t in exclude_tags:
            out = out.join(self._tag_ords(int(t)), "doc_ord", "leftanti")
        out = self._anti_tombstone(out)
        return out.select("doc_id", "url", "domain", "title", "doc_ord")

    def _anti_tombstone(self, dm: DataFrame) -> DataFrame:
        """Remove tombstoned docs from a doc_meta-shaped frame — side
        tables anti-joined cluster-side, manifest doc_id list filtered."""
        tomb = tombstone_view(self.spark, self.index_dir, self.manifest)
        if tomb is not None:
            dm = dm.join(tomb.select("doc_ord"), "doc_ord", "leftanti")
        if self.manifest.tombstones:
            dm = dm.filter(~F.col("doc_id").isin(list(self.manifest.tombstones)))
        return dm

    def _tag_ords(self, tag_id: int) -> DataFrame:
        """Decode one tag term's posting chunks into a doc_ord DataFrame
        (Arrow-batched; the chunks are term-pruned at the parquet scan)."""
        rows = (self._postings_base
                .filter((F.col("field") == "tags") & (F.col("term") == str(tag_id)))
                .select("part_id", "doc_bytes", "tf_bytes"))

        def decode(batches):
            for pdf in batches:
                outs = []
                for pid, db, tb in zip(pdf["part_id"].tolist(),
                                       pdf["doc_bytes"].tolist(),
                                       pdf["tf_bytes"].tolist()):
                    docs, _ = decode_postings(db, tb)
                    base = np.uint64(int(pid)) << np.uint64(ORD_SHIFT)
                    outs.append(pd.DataFrame(
                        {"doc_ord": (base + docs).astype(np.int64)}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame({"doc_ord": pd.Series([], dtype="int64")}))

        return rows.mapInPandas(decode, "doc_ord long")

    def _pair_ords(self, pairs: set) -> DataFrame:
        """DISTINCT doc_ord set matching ANY of the (field, term) pairs —
        decoded posting union, Arrow-batched, term-pruned at the scan.
        The IN-list scan may over-select the (field × term) cross
        product; the exact pair check runs inside the decode."""
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        rows = (self._postings_base
                .filter(F.col("field").isin(fields)
                        & F.col("term").isin(terms))
                .select("part_id", "field", "term", "doc_bytes", "tf_bytes"))
        pairset = set(pairs)

        def decode(batches):
            for pdf in batches:
                outs = []
                for pid, f_, t_, db, tb in zip(pdf["part_id"].tolist(),
                                               pdf["field"].tolist(),
                                               pdf["term"].tolist(),
                                               pdf["doc_bytes"].tolist(),
                                               pdf["tf_bytes"].tolist()):
                    if (f_, t_) not in pairset:
                        continue
                    docs, _ = decode_postings(db, tb)
                    base = np.uint64(int(pid)) << np.uint64(ORD_SHIFT)
                    outs.append(pd.DataFrame(
                        {"doc_ord": (base + docs).astype(np.int64)}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame({"doc_ord": pd.Series([], dtype="int64")}))

        return rows.mapInPandas(decode, "doc_ord long").distinct()

    def _clause_count_ords(self, clause_pairs: list, msm: int) -> DataFrame:
        """doc_ords matching at least ``msm`` DISTINCT clauses, where
        clause i matches a doc iff ANY of ``clause_pairs[i]``'s
        (field, term) postings contain it — the Lucene
        minimumNumberShouldMatch gate for the unscored collector path.
        Same pruned posting scan as ``_pair_ords``; the decode emits
        (doc_ord, clause_id) pairs and ONE partial→final distinct-count
        aggregation applies the gate (doc-local keys, skew-free)."""
        by_pair: dict[tuple, list[int]] = {}
        for ci, pairs in enumerate(clause_pairs):
            for p in pairs:
                by_pair.setdefault(p, []).append(ci)
        fields = sorted({f for f, _ in by_pair})
        terms = sorted({t for _, t in by_pair})
        rows = (self._postings_base
                .filter(F.col("field").isin(fields)
                        & F.col("term").isin(terms))
                .select("part_id", "field", "term", "doc_bytes", "tf_bytes"))

        def decode(batches):
            for pdf in batches:
                outs = []
                for pid, f_, t_, db, tb in zip(pdf["part_id"].tolist(),
                                               pdf["field"].tolist(),
                                               pdf["term"].tolist(),
                                               pdf["doc_bytes"].tolist(),
                                               pdf["tf_bytes"].tolist()):
                    cids = by_pair.get((f_, t_))
                    if not cids:
                        continue
                    docs, _ = decode_postings(db, tb)
                    base = np.uint64(int(pid)) << np.uint64(ORD_SHIFT)
                    ords = (base + docs).astype(np.int64)
                    for ci in cids:
                        outs.append(pd.DataFrame(
                            {"doc_ord": ords,
                             "cid": np.full(ords.size, ci, dtype=np.int64)}))
                yield (pd.concat(outs) if outs else
                       pd.DataFrame({"doc_ord": pd.Series([], dtype="int64"),
                                     "cid": pd.Series([], dtype="int64")}))

        return (rows.mapInPandas(decode, "doc_ord long, cid long")
                .groupBy("doc_ord")
                .agg(F.countDistinct("cid").alias("_nc"))
                .filter(F.col("_nc") >= int(msm))
                .select("doc_ord"))

    def facet_counts(self, query: str, filters=(), boosts=(),
                     k_tags: int | None = None,
                     facet_col: str = "tags", _dm=None) -> DataFrame:
        """Facet counts over the FULL match set of a search (not the
        top-k): (tag_id, n) for every facet value carried by a matching
        live doc, count-descending. ``facet_col`` is any stored doc-meta
        column — the default ``tags`` array explodes to one row per tag;
        a scalar column (``domain``, ``title``) groups directly. The
        reference UI approximates this per page of results; a search
        engine's facet panel needs it over all matches.

        Exactness without positions: a phrase match is a subset of each
        of its terms' postings, so the Must(Should-group) match set is
        the UNION of the should TERM postings intersected with the Musts
        minus MustNots — no position decode, no scoring pass. The score>0
        post-filter (local.rs:138) is implied when every Should clause
        scores (any should hit ⇒ positive contribution, since idf and
        tf_factor are strictly positive); a zero-boost should (e.g. a
        CustomField boost 0.0) would break that implication, so that
        shape raises rather than miscounting.

        Scale: posting decode is term-pruned and Arrow-batched; the ord
        sets flow through distinct/leftsemi joins (map-side combinable);
        tags come from the doc-meta scan of matched ords; output is
        O(#tags). No corpus scan, no driver materialization."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="facet_counts")
        facet = dm.schema[facet_col]
        val = (F.explode(facet_col) if facet.dataType.typeName() == "array"
               else F.col(facet_col))
        out = (dm.select(val.alias("tag_id"))
                 .groupBy("tag_id").agg(F.count("*").alias("n"))
                 .orderBy(F.desc("n"), F.asc("tag_id")))
        return out.limit(k_tags) if k_tags else out

    def count_matches(self, query: str, filters=(), boosts=(),
                      _dm=None) -> DataFrame:
        """tantivy ``collector::Count`` analog — the one collector shape
        left after TopDocs (search), order_by_u64_field (search_sorted)
        and the aggregation module: the size of a query's FULL live
        match set, no scoring, no top-k. ONE partial→final count over
        the shared match-set frame (posting-union ∩ Musts − MustNots −
        tombstones); the postings scan is column-pruned to doc_ord and
        the payload is never decoded or scored — the cheapest possible
        full-match pass at any scale. Returns a 1-row (n BIGINT) frame.
        As a ``kind="count"`` sub-aggregation of ``aggregate()`` it is
        served from the request tree's cached frame (``_dm``)."""
        dm = self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="count_matches") if _dm is None else _dm
        return dm.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def score_matches(self, query: str, filters=(), boosts=(),
                      min_score: float | None = None,
                      combiner: str = "sum",
                      tie_breaker: float = 0.0) -> DataFrame:
        """FULL scored match set of a query as a DISTRIBUTED frame
        (url, score float32, doc_ord) — the relevance-weighted companion
        of count_matches / export_matches: every live doc with score >
        0, no top-k truncation, never collected. Scoring is the same
        float32 clause-order kernel as search, forced exhaustive (with
        no k there is no top-k threshold for WAND to prune against), so
        a doc's score here is bitwise equal to its search score at any
        rank. ``min_score`` pushes a relevance threshold into the frame
        — the BM25-relevance corpus-filtering primitive.

        Scale shape: per-part scoring emits O(matches) tiny rows (no
        payload), and the url attachment is one join against the
        column-pruned doc_meta metadata — both sides O(matches) /
        O(docs·16B), never the content."""
        arg = dict(query) if isinstance(query, dict) else {"query": query}
        arg.setdefault("filters", filters)
        arg.setdefault("boosts", boosts)
        arg.setdefault("combiner", combiner)
        arg.setdefault("tie_breaker", tie_breaker)
        cq, _ = self._compile_one(arg)
        partial = self._scoring_partial([cq], limit=None, algo="exhaustive")
        if partial is None:
            return self.spark.createDataFrame(
                [], "url string, score float, doc_ord bigint")
        scored = partial.drop("query_id")
        if min_score is not None:
            scored = scored.filter(F.col("score") >= float(min_score))
        dm = self._doc_meta_base.select("doc_ord", "url")
        return scored.join(dm, "doc_ord").select(
            "url", F.col("score").cast("float").alias("score"), "doc_ord")

    def export_scored(self, query: str, documents: DataFrame,
                      out_path: str, filters=(), boosts=(),
                      min_score: float | None = None,
                      columns=None, partition_by=(),
                      num_files: int | None = None,
                      broadcast_limit: int = 4_000_000,
                      mode: str = "overwrite", combiner: str = "sum",
                      tie_breaker: float = 0.0) -> dict:
        """``export_matches`` with relevance attached: materialize the
        FULL scored match set as a parquet dataset of system-of-record
        rows + a float32 ``score`` column — "every doc matching Q with
        BM25 score ≥ τ, scored" (relevance-weighted training-corpus
        construction). Same scale shape as export_matches: the (url,
        score) pairs are ONE small frame, persisted across the count and
        the join; below ``broadcast_limit`` they broadcast so the
        (possibly 100 TB) documents side joins map-side with its scan
        pruning intact, above it a shuffle-hash join on url.

        Returns {path, matched_urls, rows_exported, broadcast}."""
        from pyspark import StorageLevel
        from pyspark.sql import Observation

        scored = self.score_matches(query, filters, boosts,
                                    min_score=min_score, combiner=combiner,
                                    tie_breaker=tie_breaker) \
            .select("url", "score").persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n_urls = scored.count()
            bcast = n_urls <= broadcast_limit
            right = F.broadcast(scored) if bcast else scored
            out = documents.join(right, "url")  # inner: match set only
            if columns:
                cols = list(columns)
                if "score" not in cols:
                    cols.append("score")
                out = out.select(*cols)
            if num_files:
                out = out.repartition(num_files)
            obs = Observation()
            out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
            writer = out.write.mode(mode)
            if partition_by:
                writer = writer.partitionBy(*list(partition_by))
            writer.parquet(out_path)
        finally:
            scored.unpersist()
        return {"path": out_path, "matched_urls": int(n_urls),
                "rows_exported": int(obs.get["rows"]), "broadcast": bcast}

    def export_matches(self, query: str, documents: DataFrame,
                       out_path: str, filters=(), boosts=(),
                       columns=None, partition_by=(),
                       num_files: int | None = None,
                       broadcast_limit: int = 4_000_000,
                       mode: str = "overwrite") -> dict:
        """Materialize the FULL match set of a query as a parquet
        dataset — the training-data extraction sink ("give me the
        sub-corpus matching this query as a dataset"). ``documents`` is
        the system-of-record row store (SURVEY §1.1); matching is by
        url against the index's live match set (same exact
        posting-union ∩ Musts − MustNots machinery as the unscored
        aggregations, tombstones excluded), so the export carries full
        original content, not the index's stored projection.

        Scale shape: the match-set urls are ONE distinct column. Below
        ``broadcast_limit`` they broadcast, so the (possibly 100 TB)
        documents side is a map-side leftsemi — no shuffle of the big
        side at all; above it, a shuffle-hash leftsemi on url. Filters
        and column pruning on ``documents`` still reach its scan
        (leftsemi preserves pushdown). ``columns`` prunes the exported
        schema; ``partition_by`` lays out the dataset (e.g. by domain)
        for downstream partition pruning; ``num_files`` repartitions
        before the write to bound file count/size.

        Returns {path, matched_urls, rows_exported, broadcast}."""
        from pyspark import StorageLevel

        dm = self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="export_matches")
        # persist the (small) url set: the count and the join otherwise
        # each re-run the whole posting-union ∩ Musts − tombstones pass
        urls = dm.select("url").distinct().persist(
            StorageLevel.MEMORY_AND_DISK)
        try:
            n_urls = urls.count()
            out = self._export_frame(urls, documents, columns,
                                     n_urls <= broadcast_limit)
            if num_files:
                out = out.repartition(num_files)
            # row count via a JVM-side Observation on the write action
            # itself — no second pass, no Python in the path
            from pyspark.sql import Observation

            obs = Observation()
            out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
            writer = out.write.mode(mode)
            if partition_by:
                writer = writer.partitionBy(*list(partition_by))
            writer.parquet(out_path)
        finally:
            urls.unpersist()
        return {"path": out_path, "matched_urls": int(n_urls),
                "rows_exported": int(obs.get["rows"]),
                "broadcast": n_urls <= broadcast_limit}

    @staticmethod
    def _export_frame(urls: DataFrame, documents: DataFrame,
                      columns, broadcast: bool) -> DataFrame:
        """The export join plan, exposed for the PLANS.md audit: a
        leftsemi keyed on url with the match-set side broadcast (map-
        side, zero shuffle of the documents table) or shuffled (the
        above-``broadcast_limit`` degradation)."""
        right = F.broadcast(urls) if broadcast else urls
        out = documents.join(right, "url", "leftsemi")
        return out.select(*columns) if columns else out

    def _match_doc_meta(self, cq: CompiledQuery,
                        caller: str = "aggregation") -> DataFrame:
        """Live doc-meta rows of a query's FULL match set — the shared
        input of the unscored aggregations (facet_counts,
        date_histogram). Exactness without positions: a phrase match is
        a subset of each of its terms' postings, so Must(Should-group)
        = UNION of the should TERM postings ∩ Musts − MustNots. The
        score>0 post-filter (local.rs:138) is implied when every Should
        clause scores; a zero-boost should breaks the implication, so
        that shape raises rather than miscounting.

        ``min_should_match`` ≥ 2 (Lucene setMinimumNumberShouldMatch)
        replaces the union with a per-doc DISTINCT-matching-clause count
        gate — exact for term clauses only; a phrase clause's match set
        is a position-dependent subset of its term-posting intersection,
        so any phrase Should under msm ≥ 2 raises (a scored search /
        score_matches handles that shape exactly)."""
        if not cq.should_group:
            raise ValueError(f"{caller} needs at least one Should clause")
        if not all(c.scoring for c in cq.should_group):
            raise ValueError(
                f"{caller} is exact only when every Should clause "
                "scores (score>0 gate); zero-boost shoulds need a scored "
                "search instead")
        msm = int(getattr(cq, "min_should_match", 0))
        union_pairs = {(c.field, t) for c in cq.should_group
                       if c.kind == "term" for t in c.terms}
        # a phrase's matches are a SUBSET of each member term's postings,
        # so the term-posting union is exact only when every phrase is
        # absorbed by a same-field term clause already in the union
        # (compile_query always pairs each phrase with its term clauses;
        # a parsed standalone '"a b"' is not absorbable → raise rather
        # than over-count)
        for c in cq.should_group:
            if c.kind == "phrase" and msm > 1:
                raise ValueError(
                    f"{caller} cannot count a phrase Should under "
                    "min_should_match >= 2 exactly (positions decide "
                    "whether the CLAUSE matched); use a scored search / "
                    "score_matches instead")
            if c.kind == "phrase" and not any(
                    (c.field, t) in union_pairs for t in c.terms):
                raise ValueError(
                    f"{caller} cannot run a standalone phrase Should "
                    "exactly (its term-posting union over-counts); use "
                    "a scored search / score_matches instead")
        for grp_name, clauses in (("extra_group", [c for g in
                                                   cq.extra_groups
                                                   for c in g]),
                                  ("must", cq.musts),
                                  ("must_not", cq.must_nots)):
            for c in clauses:
                if c.kind != "term":
                    raise ValueError(
                        f"{caller} filters must be term clauses; a "
                        f"phrase {grp_name} needs a scored search")
        if msm > 1:
            match = self._clause_count_ords(
                [{(c.field, t) for t in c.terms}
                 for c in cq.should_group], msm)
        else:
            match = self._pair_ords(union_pairs)
        for grp in cq.extra_groups:
            match = match.join(
                self._pair_ords({(c.field, t) for c in grp for t in c.terms}),
                "doc_ord", "leftsemi")
        for c in cq.musts:
            match = match.join(
                self._pair_ords({(c.field, t) for t in c.terms}),
                "doc_ord", "leftsemi")
        for c in cq.must_nots:
            match = match.join(
                self._pair_ords({(c.field, t) for t in c.terms}),
                "doc_ord", "leftanti")
        dm = self._doc_meta_base.join(match, "doc_ord", "leftsemi")
        for field, ge, le in getattr(cq, "range_musts", ()):
            # doc_meta date columns hold the same µs int64 the fast
            # fields encode; NULL (missing) never matches, like -1 there
            if ge is not None:
                dm = dm.filter(F.col(field) >= ge)
            if le is not None:
                dm = dm.filter(F.col(field) <= le)
        return self._anti_tombstone(dm)

    def date_histogram(self, query: str, filters=(), boosts=(),
                       interval_us: int = 86_400_000_000,
                       date_col: str = "lastmodified",
                       min_doc_count: int | None = None,
                       max_buckets: int = 65_536, _dm=None) -> DataFrame:
        """Date-histogram aggregation over the FULL match set — the
        tantivy-0.19.2 aggregation module's HistogramAggregation on a
        date fast field: the date-µs view of :meth:`histogram` (same
        bucket arithmetic with ``offset=0``; dates are non-negative µs,
        so floor-mod and integer ``div`` agree bitwise). Kept as a
        named method because it is the graded driver contract
        (search_date_histogram) and the ES response-level analog."""
        if interval_us <= 0:
            raise ValueError("interval_us must be positive")
        return self.histogram(query, filters, boosts, col=date_col,
                              interval=int(interval_us),
                              min_doc_count=min_doc_count,
                              max_buckets=max_buckets, _dm=_dm,
                              _caller="date_histogram")

    @staticmethod
    def _bucket_key(value: int, interval: int, offset: int) -> int:
        """Scalar twin of the histogram bucket expression (floor
        semantics for any sign): shared with tests/fixture generators."""
        return value - ((value - offset) % interval)

    def histogram(self, query: str, filters=(), boosts=(),
                  col: str = "lastmodified",
                  interval: int = 86_400_000_000, offset: int = 0,
                  min_doc_count: int | None = None,
                  hard_bounds: tuple | None = None,
                  extended_bounds: tuple | None = None,
                  max_buckets: int = 65_536, _dm=None,
                  _caller: str = "histogram") -> DataFrame:
        """Histogram aggregation over the FULL match set — the
        tantivy-0.19.2 aggregation module's HistogramAggregation
        (aggregation/bucket/histogram.rs; the ES `histogram` agg) on a
        numeric fast-field column of the doc-meta plane, with the full
        public knob set: ``offset``, ``hard_bounds``,
        ``extended_bounds``, ``min_doc_count``. Output
        (bucket long, n long), bucket-ascending. Docs with a NULL
        ``col`` are skipped (tantivy likewise drops docs missing the
        fast field). Pure JVM-side integer arithmetic + one groupBy on
        doc-local buckets — the same O(#buckets) output /
        no-corpus-scan profile as facet_counts.

        Bucket key = floor((value - offset) / interval) · interval
        + offset, computed as ``value - pmod(value - offset, interval)``
        — exact floor semantics for negative values too (integer `div`
        truncates toward zero; pmod is non-negative), and the same
        integer arithmetic on the Spark, scalar-oracle, and DuckDB
        sides. tantivy buckets in f64; this engine's fast fields are
        i64/µs, so integer ``interval``/``offset`` keep the parity
        bitwise where a float bucket would round.

        ``hard_bounds`` (lo, hi): values outside the CLOSED [lo, hi]
        range are ignored entirely (tantivy: "values outside of the
        bounds are ignored"), which also clamps the gap-fill grid.
        ``extended_bounds`` (lo, hi): with ``min_doc_count=0`` the grid
        is widened to cover both bounds' buckets even when empty — and
        per the ES/tantivy contract an empty match set still emits the
        extended grid (all n=0). tantivy rejects extended bounds
        outside hard bounds; so does this.

        ``min_doc_count`` mirrors tantivy's knob:
        - None (default) — occupied buckets only (the long-standing
          graded contract of date_histogram).
        - 0 — tantivy's own default: GAP-FILLED, every bucket between
          the first and last kept one is emitted, empties as n=0.
          The grid comes from one (min, max) agg row expanded with
          `sequence`/`explode` (pure codegen, no driver loop) and the
          counts LEFT-join onto it — both sides are O(#buckets).
          ``max_buckets`` (tantivy's aggregation bucket limit, 65536)
          bounds the grid: a degenerate interval over a wide span
          raises instead of exploding a billion-element array.
        - k>0 — only buckets with at least k docs."""
        step, off = int(interval), int(offset)
        if step <= 0:
            raise ValueError("interval must be positive")

        def _pair(name, b):
            if b is None:
                return None
            lo, hi = int(b[0]), int(b[1])
            if lo > hi:
                raise ValueError(f"{name}: lo must be <= hi")
            return lo, hi

        hard = _pair("hard_bounds", hard_bounds)
        ext = _pair("extended_bounds", extended_bounds)
        if hard and ext and (ext[0] < hard[0] or ext[1] > hard[1]):
            # tantivy's own validation: extended bounds must lie inside
            # hard bounds, or the request is contradictory
            raise ValueError("extended_bounds must lie within hard_bounds")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller=_caller)
        vals = dm.filter(F.col(col).isNotNull())
        if hard:
            vals = vals.filter((F.col(col) >= hard[0])
                               & (F.col(col) <= hard[1]))
        # floor-mod, not `div`: exact floor bucketing for any sign, and
        # µs values sit near the double mantissa edge so this stays pure
        # integer arithmetic on the Spark, oracle, and DuckDB sides
        bucket = F.expr(f"{col} - pmod({col} - {off}, {step})")
        occupied = (vals.select(bucket.alias("bucket"))
                        .groupBy("bucket").agg(F.count("*").alias("n")))
        if min_doc_count is None:
            return occupied.orderBy(F.asc("bucket"))
        if int(min_doc_count) > 0:
            return (occupied.filter(F.col("n") >= int(min_doc_count))
                            .orderBy(F.asc("bucket")))
        grid = self._gapfill_grid(occupied, step, off, ext, max_buckets,
                                  _caller)
        return (grid.join(occupied, "bucket", "left")
                    .select("bucket",
                            F.coalesce(F.col("n"), F.lit(0).cast("long"))
                             .alias("n"))
                    .orderBy(F.asc("bucket")))

    def _gapfill_grid(self, occupied: DataFrame, step: int, off: int,
                      ext: tuple | None, max_buckets: int,
                      caller: str) -> DataFrame:
        """Contiguous bucket grid over ``occupied``'s (min, max) bucket
        span — ONE agg row expanded with `sequence`/`explode` (pure
        codegen, no driver loop), O(#buckets) rows. ``ext`` widens the
        span to the extended bounds' bucket keys; least/greatest skip
        the NULL side, so an EMPTY match set still yields the extended
        grid (ES/tantivy: extended_bounds guarantees the range appears
        in the response) and yields ZERO rows without it (sequence(NULL)
        explodes to nothing, tantivy's empty response)."""
        lo_b = F.min("bucket").alias("_lo")
        hi_b = F.max("bucket").alias("_hi")
        if ext:
            lo_b = F.least(F.min("bucket"), F.lit(
                self._bucket_key(ext[0], step, off))).alias("_lo")
            hi_b = F.greatest(F.max("bucket"), F.lit(
                self._bucket_key(ext[1], step, off))).alias("_hi")
        bounds = occupied.agg(lo_b, hi_b)
        # the limit guard is folded INTO the sequence's hi bound (an
        # unused assert_true column would be pruned away by Catalyst):
        # raise_error's NullType coerces to bigint inside CASE
        hi_checked = F.expr(
            f"CASE WHEN (_hi - _lo) DIV {step} < {int(max_buckets)} "
            f"THEN _hi ELSE raise_error(concat('{caller}: "
            f"gap-filled grid exceeds max_buckets={int(max_buckets)}"
            "; widen the interval')) END")
        return bounds.select(F.explode(F.sequence(
            F.col("_lo"), hi_checked, F.lit(step))).alias("bucket"))

    def histogram_stats(self, query: str, filters=(), boosts=(),
                        col: str = "lastmodified",
                        interval: int = 86_400_000_000, offset: int = 0,
                        stats_col: str = "published",
                        min_doc_count: int | None = None,
                        hard_bounds: tuple | None = None,
                        max_buckets: int = 65_536, _dm=None) -> DataFrame:
        """Histogram bucket aggregation with a nested stats metric —
        tantivy-0.19.2's HistogramAggregation with a StatsAggregation
        sub-aggregation (the ES date_histogram+stats dashboard shape),
        re-expressed as ONE partial→final hash agg on the bucket key:
        per bucket, (bucket, doc_count, n, min, max, sum, avg) where
        doc_count counts every matching doc whose ``col`` is non-NULL
        in the bucket and the stats columns cover the bucket's non-NULL
        ``stats_col`` values (tantivy's sub-agg likewise skips docs
        missing the fast field). Bucket-ascending.

        Same knob semantics as :meth:`histogram` (offset grid,
        hard_bounds cut, min_doc_count None/0/k) and the same
        arithmetic discipline as facet_stats: sum accumulated in
        decimal(38,0) (order-independent, overflow-proof) with the
        BIGINT projection try_cast, avg = double(exact sum)/n in ONE
        division — hash-gradeable. A gap-filled empty bucket emits
        doc_count=0, n=0 and NULL min/max/sum/avg (the ES empty-bucket
        sub-agg contract). Scale profile: bucket keys are doc-local →
        the single groupBy is map-side combinable and skew-free; grid
        and output are O(#buckets)."""
        step, off = int(interval), int(offset)
        if step <= 0:
            raise ValueError("interval must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="histogram_stats")
        vals = dm.filter(F.col(col).isNotNull())
        if hard_bounds is not None:
            lo, hi = int(hard_bounds[0]), int(hard_bounds[1])
            if lo > hi:
                raise ValueError("hard_bounds: lo must be <= hi")
            vals = vals.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        bucket = F.expr(f"{col} - pmod({col} - {off}, {step})")
        agg = (vals.select(bucket.alias("bucket"),
                           F.col(stats_col).alias("_m"))
                   .groupBy("bucket")
                   .agg(F.count("*").alias("doc_count"),
                        F.count("_m").alias("n"),
                        F.min("_m").alias("min"),
                        F.max("_m").alias("max"),
                        F.sum(F.col("_m").cast("decimal(38,0)"))
                         .alias("_sum_exact")))
        stats = agg.select(
            "bucket", "doc_count", "n", "min", "max",
            F.expr("try_cast(_sum_exact AS BIGINT)").alias("sum"),
            F.when(F.col("n") > 0,
                   F.col("_sum_exact").cast("double") / F.col("n"))
             .alias("avg"))
        if min_doc_count is None:
            return stats.orderBy(F.asc("bucket"))
        if int(min_doc_count) > 0:
            return (stats.filter(F.col("doc_count") >= int(min_doc_count))
                         .orderBy(F.asc("bucket")))
        grid = self._gapfill_grid(stats.select("bucket", "n"), step, off,
                                  None, max_buckets, "histogram_stats")
        zero = F.lit(0).cast("long")
        return (grid.join(stats, "bucket", "left")
                    .select("bucket",
                            F.coalesce("doc_count", zero).alias("doc_count"),
                            F.coalesce("n", zero).alias("n"),
                            "min", "max", "sum", "avg")
                    .orderBy(F.asc("bucket")))

    def terms_agg(self, query: str, filters=(), boosts=(),
                  facet_col: str = "tags", size: int = 10,
                  _dm=None) -> DataFrame:
        """Size-limited terms bucket — the tantivy aggregation module's
        TermsAggregation response shape: the top ``size`` facet values
        by doc_count (count desc, key asc tie-break — total order) plus
        the ES-contract ``sum_other_doc_count`` column: how many
        matched (doc, value) pairs fell OUTSIDE the returned buckets
        (constant across the rows, like the response-level field it
        mirrors). facet_counts() is the unlimited form; this one is the
        dashboard contract where the bucket list must stay small no
        matter the corpus.

        Scale shape: ONE partial→final hash agg over the exploded
        pairs (identical to facet_counts), then every later step —
        top-size limit, the two 1-row totals, the broadcast-join
        projection — runs on O(#distinct values) rows. No second pass
        over the match set, no driver materialization."""
        if size <= 0:
            raise ValueError("size must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="terms_agg")
        facet = dm.schema[facet_col]
        val = (F.explode(facet_col) if facet.dataType.typeName() == "array"
               else F.col(facet_col))
        counts = (dm.select(val.alias("tag_id"))
                    .groupBy("tag_id").agg(F.count("*").alias("doc_count")))
        top = (counts.orderBy(F.desc("doc_count"), F.asc("tag_id"))
                     .limit(int(size)))
        total = counts.agg(
            F.coalesce(F.sum("doc_count"), F.lit(0).cast("long"))
             .alias("_total"))
        kept = top.agg(
            F.coalesce(F.sum("doc_count"), F.lit(0).cast("long"))
             .alias("_kept"))
        return (top.crossJoin(F.broadcast(total))
                   .crossJoin(F.broadcast(kept))
                   .select("tag_id", "doc_count",
                           (F.col("_total") - F.col("_kept"))
                           .alias("sum_other_doc_count"))
                   .orderBy(F.desc("doc_count"), F.asc("tag_id")))

    def field_stats(self, query: str, filters=(), boosts=(),
                    col: str = "lastmodified", _dm=None) -> DataFrame:
        """tantivy-0.19.2 aggregation module StatsAggregation over the
        FULL match set: ONE row (n, min, max, sum, avg) of a numeric
        doc-meta column, NULLs skipped (tantivy drops docs missing the
        fast field; n counts the non-NULL matches). Same match-set
        machinery and O(1)-output/no-corpus-scan profile as
        facet_counts/date_histogram; the aggregate is a single
        partial→final hash agg in whole-stage codegen."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="field_stats")
        c = F.col(col)
        # EXACT decimal sum, then ONE double division: F.avg(long)
        # accumulates in double, so its last bit depends on partition
        # order — a hash-graded row needs order-independent arithmetic.
        # decimal(38,0) never overflows realistic µs-date sums; the
        # BIGINT `sum` output column holds only to ~9.2e18 (≈5.4k docs
        # of year-2100 dates), so it try_casts to NULL past that and
        # callers at scale read the always-exact avg instead (a hard
        # cast THROWS at ~6k matched docs — measured on the 320k-doc
        # spot index before this guard).
        agg = dm.filter(c.isNotNull()).agg(
            F.count("*").alias("n"),
            F.min(c).alias("min"),
            F.max(c).alias("max"),
            F.sum(c.cast("decimal(38,0)")).alias("_sum_exact"))
        return agg.select(
            "n", "min", "max",
            F.expr("try_cast(_sum_exact AS BIGINT)").alias("sum"),
            (F.col("_sum_exact").cast("double")
             / F.col("n")).alias("avg"))

    def percentiles(self, query: str, filters=(), boosts=(),
                    col: str = "lastmodified",
                    percents=(1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
                    approx_accuracy: int | None = None, _dm=None) -> DataFrame:
        """Percentiles aggregation over the FULL match set — the
        tantivy-0.19.2 aggregation module's PercentilesAggregation on a
        numeric fast field (same default percents), re-expressed on the
        match-set machinery: one (pct double, value double) row per
        requested percent, pct-ascending. NULLs skipped; an empty match
        set returns zero rows (tantivy renders no values for an empty
        bucket).

        Exact by default: Spark's ``percentile`` aggregate merges a
        value→count map exactly across partitions, then interpolates in
        double over the sorted counts — partition-order independent,
        bitwise equal to the scalar formula in query/percentile.py
        (pinned in test_facets at several partition counts), so the row
        is hash-gradeable. Memory is O(#distinct values) in the final
        aggregation buffer — fine for date/score-like columns; for
        100 TB high-cardinality columns pass ``approx_accuracy`` to use
        ``approx_percentile`` (Greenwald-Khanna sketch, bounded memory,
        rank error ≤ 1/accuracy) — the same exact-baseline/sketch-scale
        split tantivy makes by shipping percentiles as a sketch."""
        pcts = [float(p) for p in percents]
        if not pcts:
            raise ValueError("percents must be non-empty")
        if any(not (0.0 <= p <= 100.0) for p in pcts):
            raise ValueError(f"percents out of [0,100]: {pcts}")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="percentiles")
        # percent→fraction as p/100.0 in double; repr() round-trips the
        # exact double into the SQL literal so engine ≡ scalar oracle
        arr = ", ".join(repr(p / 100.0) for p in pcts)
        if approx_accuracy is not None:
            agg_expr = (f"approx_percentile({col}, array({arr}), "
                        f"{int(approx_accuracy)})")
        else:
            agg_expr = f"percentile({col}, array({arr}))"
        agg = (dm.filter(F.col(col).isNotNull())
                 .agg(F.expr(agg_expr).alias("_v")))
        pct_arr = F.array(*[F.lit(p) for p in pcts])
        # percentile(...) on zero rows yields NULL → explode emits nothing
        z = F.explode(F.arrays_zip(pct_arr.alias("pct"),
                                   F.col("_v").alias("value")))
        return (agg.select(z.alias("z"))
                   .select(F.col("z.pct").cast("double").alias("pct"),
                           F.col("z.value").cast("double").alias("value"))
                   .orderBy("pct"))

    def significant_terms(self, query: str, filters=(), boosts=(),
                          field: str = "content", size: int = 10,
                          min_doc_count: int = 3,
                          fg_limit: int = 2_000_000,
                          sample: int | None = None, _dm=None) -> DataFrame:
        """Significant-terms aggregation — the ES `significant_terms`
        text-analytics agg with the JLH heuristic: the terms that
        CHARACTERIZE the match set against the whole index as
        background. Per candidate term: fg = how many MATCHING docs
        contain it, bg = its index-wide document frequency (the same
        term_stats df BM25's idf uses — tombstoned docs stay counted
        until compaction on both, so foreground and scoring agree);
        JLH score = (fgPct − bgPct) · (fgPct / bgPct) when fgPct >
        bgPct else 0, in pinned double order. Output (term, fg long,
        bg long, score double), score-descending then term-ascending,
        top ``size``; ``min_doc_count`` drops rare-in-foreground noise
        (the ES knob, default 3).

        Scale shape — this is the one aggregation whose honest cost is
        a FIELD-WIDE posting scan (ES documents the same): every
        posting row of ``field`` is decoded once, intersected against a
        BROADCAST sorted array of match ordinals (np.searchsorted, no
        shuffle of postings), and only (term, count>0) partials reach
        the one term-keyed groupBy — doc-local → skew-free. The match
        set must fit the broadcast: ``fg_limit`` (the same 2M bound as
        the top-k driver merge) guards it; ES's answer above that is
        the sampler aggregation, and so is ours — ``sample=N`` takes
        the N SMALLEST doc_ords of the match set (a bounded
        TakeOrdered, never a full collect) as the foreground.
        doc_ord is the engine's stable partition-major ordinal
        (sha256-assigned part, url-rank within part — an index
        invariant), so the sample is deterministic on any cluster and
        reproducible by the scalar oracle, where ES's top-scored shard
        sampler is not. Background df is a vocab-scale stats-store
        scan."""
        if size <= 0:
            raise ValueError("size must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="significant_terms")
        if sample is not None:
            if int(sample) <= 0:
                raise ValueError("sample must be positive")
            rows0 = (dm.select("doc_ord").orderBy(F.asc("doc_ord"))
                       .limit(int(sample)).collect())
        else:
            # guard BEFORE materializing: a limit(fg_limit+1) probe means
            # an over-limit match set raises with at most fg_limit+1 rows
            # on the driver — the old full collect() could OOM the driver
            # before its own size check ever ran
            rows0 = (dm.select("doc_ord")
                       .limit(int(fg_limit) + 1).collect())
            if len(rows0) > int(fg_limit):
                raise ValueError(
                    f"significant_terms: match set exceeds "
                    f"fg_limit={int(fg_limit)}; narrow the query or pass "
                    "sample=N (deterministic first-N-by-doc_ord sampler)")
        ords = np.sort(np.array([r["doc_ord"] for r in rows0],
                                dtype=np.int64))
        fg_total = int(len(ords))
        if fg_total == 0:
            return self.spark.sql(
                "SELECT '' AS term, 0L AS fg, 0L AS bg, "
                "CAST(0.0 AS DOUBLE) AS score WHERE false")
        bc = self.spark.sparkContext.broadcast(ords)
        rows = (self._postings_base
                .filter(F.col("field") == field)
                .select("part_id", "term", "doc_bytes", "tf_bytes"))

        def count_fg(batches):
            # column-array zip, not iterrows: on a 10M-term vocab the
            # per-row Series construction dominated the loop
            for pdf in batches:
                terms, cnts = [], []
                ref = bc.value
                for pid, t_, db, tb in zip(pdf["part_id"].tolist(),
                                           pdf["term"].tolist(),
                                           pdf["doc_bytes"].tolist(),
                                           pdf["tf_bytes"].tolist()):
                    docs, _ = decode_postings(db, tb)
                    base = np.uint64(int(pid)) << np.uint64(ORD_SHIFT)
                    dords = (base + docs).astype(np.int64)
                    idx = np.searchsorted(ref, dords)
                    ok = idx < len(ref)
                    c = int(np.count_nonzero(ref[idx[ok]] == dords[ok]))
                    if c:
                        terms.append(t_)
                        cnts.append(c)
                yield pd.DataFrame({"term": pd.Series(terms, dtype="object"),
                                    "fg_part": pd.Series(cnts,
                                                         dtype="int64")})

        fg = (rows.mapInPandas(count_fg, "term string, fg_part long")
                  .groupBy("term").agg(F.sum("fg_part").alias("fg"))
                  .filter(F.col("fg") >= int(min_doc_count)))
        bg = (self.spark.read.parquet(*self._paths("term_stats"))
                  .filter(F.col("field") == field)
                  .groupBy("term").agg(F.sum("df").alias("bg")))
        fgF = repr(float(fg_total))
        bgF = repr(float(max(int(self.manifest.num_docs), 1)))
        score = F.expr(
            f"CASE WHEN (CAST(fg AS DOUBLE) / {fgF}) > "
            f"(CAST(bg AS DOUBLE) / {bgF}) THEN "
            f"((CAST(fg AS DOUBLE) / {fgF}) - (CAST(bg AS DOUBLE) / {bgF}))"
            f" * ((CAST(fg AS DOUBLE) / {fgF}) / "
            f"(CAST(bg AS DOUBLE) / {bgF})) "
            "ELSE CAST(0.0 AS DOUBLE) END")
        return (fg.join(bg, "term")
                  .select("term", "fg", "bg", score.alias("score"))
                  .orderBy(F.desc("score"), F.asc("term"))
                  .limit(int(size)))

    def percentile_ranks(self, query: str, filters=(), boosts=(),
                         col: str = "lastmodified",
                         values=(), _dm=None) -> DataFrame:
        """Percentile-ranks aggregation over the FULL match set — the ES
        `percentile_ranks` agg, the INVERSE of :meth:`percentiles`: one
        (value double, pct double) row per requested probe value,
        value-ascending. pct is the percent p at which the exact linear
        percentile interpolation reaches the probe: position(v) = i +
        (v − s[i]) / (s[i+1] − s[i]) with i the LAST sorted index where
        s[i] ≤ v (ties collapse to the run's end), pct = position /
        (n−1) · 100; clamped to 0.0 below the min and 100.0 at/above
        the max (the ES contract). NULLs skipped; an empty match set
        returns zero rows, like percentiles.

        Exactness without sorting the data: per probe value the plan
        aggregates ONLY (count ≤ v, max of values ≤ v, min of values >
        v) — conditional aggregates in ONE partial→final pass, each
        partition-order independent — and the interpolation runs as a
        projection on the single agg row with the operand order pinned
        to ``exact_percentile_rank`` (query/percentile.py), so the
        output is bitwise hash-gradeable. Memory is O(#probe values),
        not O(#distinct) — this form needs no sketch fallback at
        100 TB."""
        vs = sorted(float(v) for v in values)
        if not vs:
            raise ValueError("values must be non-empty")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="percentile_ranks")
        src = dm.filter(F.col(col).isNotNull())
        aggs = [F.count(F.lit(1)).alias("_n")]
        for k, v in enumerate(vs):
            lit = repr(v)  # repr round-trips the exact double literal
            aggs.append(F.expr(
                f"count(CASE WHEN {col} <= {lit} THEN 1 END)")
                .alias(f"_le{k}"))
            aggs.append(F.expr(
                f"max(CASE WHEN {col} <= {lit} THEN {col} END)")
                .alias(f"_lo{k}"))
            aggs.append(F.expr(
                f"min(CASE WHEN {col} > {lit} THEN {col} END)")
                .alias(f"_hi{k}"))
        agg = src.agg(*aggs)
        structs = []
        for k, v in enumerate(vs):
            lit = repr(v)
            pct = (
                f"CASE WHEN _n = 0 THEN CAST(NULL AS DOUBLE) "
                f"WHEN _le{k} = 0 THEN 0.0D "
                f"WHEN _le{k} = _n THEN 100.0D "
                f"ELSE (CAST(_le{k} - 1 AS DOUBLE) + "
                f"(CAST({lit} AS DOUBLE) - CAST(_lo{k} AS DOUBLE)) / "
                f"(CAST(_hi{k} AS DOUBLE) - CAST(_lo{k} AS DOUBLE))) / "
                f"CAST(_n - 1 AS DOUBLE) * 100.0D END")
            structs.append(F.struct(F.lit(v).alias("value"),
                                    F.expr(pct).alias("pct")))
        # empty match set: n=0 -> every pct is NULL -> zero output rows
        z = F.explode(F.array(*structs))
        return (agg.select(z.alias("z"))
                   .select(F.col("z.value").cast("double").alias("value"),
                           F.col("z.pct").cast("double").alias("pct"))
                   .filter(F.col("pct").isNotNull())
                   .orderBy("value"))

    def facet_stats(self, query: str, filters=(), boosts=(),
                    facet_col: str = "tags", col: str = "lastmodified",
                    k_tags: int | None = None, _dm=None) -> DataFrame:
        """Terms bucket aggregation with a nested stats metric over the
        FULL match set — tantivy-0.19.2's TermsAggregation with a
        StatsAggregation sub-aggregation, re-expressed as ONE
        partial→final hash agg: per facet value, (tag_id, doc_count,
        n, min, max, sum, avg) where doc_count counts every matching doc
        in the bucket and the stats columns cover the bucket's non-NULL
        ``col`` values (tantivy's sub-agg likewise skips docs missing
        the fast field). Ordered doc_count-descending then
        tag_id-ascending — the terms-agg default order.

        Same arithmetic discipline as field_stats: sum accumulated in
        decimal(38,0) (order-independent, overflow-proof) with the
        BIGINT projection try_cast (NULL past long range) and avg =
        double(exact sum)/n in ONE division — hash-gradeable. Scale
        profile: the explode is doc-local, the single groupBy is
        map-side combinable, output is O(#facet values)."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="facet_stats")
        facet = dm.schema[facet_col]
        val = (F.explode(facet_col) if facet.dataType.typeName() == "array"
               else F.col(facet_col))
        c = F.col(col)
        agg = (dm.select(val.alias("tag_id"), c.alias("_m"))
                 .groupBy("tag_id")
                 .agg(F.count("*").alias("doc_count"),
                      F.count("_m").alias("n"),
                      F.min("_m").alias("min"),
                      F.max("_m").alias("max"),
                      F.sum(F.col("_m").cast("decimal(38,0)"))
                       .alias("_sum_exact")))
        out = agg.select(
            "tag_id", "doc_count", "n", "min", "max",
            F.expr("try_cast(_sum_exact AS BIGINT)").alias("sum"),
            F.when(F.col("n") > 0,
                   F.col("_sum_exact").cast("double") / F.col("n"))
             .alias("avg")
        ).orderBy(F.desc("doc_count"), F.asc("tag_id"))
        return out.limit(k_tags) if k_tags else out

    def range_agg(self, query: str, filters=(), boosts=(),
                  col: str = "lastmodified",
                  ranges: tuple = (), _dm=None) -> DataFrame:
        """Range bucket aggregation over the FULL match set — the
        tantivy-0.19.2 aggregation module's RangeAggregation on a
        numeric fast field: each requested range is a half-open
        [lo, hi) bucket (NULL bound = unbounded on that side); a doc
        counts in EVERY range containing its value (ranges may
        overlap, the ES/tantivy contract), docs with a NULL ``col``
        are skipped, and EMPTY buckets still emit a row with n=0.
        ``ranges``: iterable of (key, lo, hi) with int-µs or None
        bounds. Output (range_key, lo, hi, n) in request order.

        Plan shape: the membership test is an array-literal
        filter/transform + explode — pure codegen, doc-local keys →
        skew-free ONE groupBy; the request-order frame is a literal
        VALUES LocalRelation (job-free) broadcast-joined to the
        O(#ranges) counts."""
        rs = [(str(key), None if lo is None else int(lo),
               None if hi is None else int(hi)) for key, lo, hi in ranges]
        if not rs:
            raise ValueError("ranges must be non-empty")
        if len({k for k, _, _ in rs}) != len(rs):
            raise ValueError("range keys must be unique")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="range_agg")
        c = F.col(col)

        def _lit(b):
            return (F.lit(None).cast("long") if b is None
                    else F.lit(b).cast("long"))

        arr = F.array(*[
            F.struct(F.lit(i).alias("i"), _lit(lo).alias("lo"),
                     _lit(hi).alias("hi"))
            for i, (_, lo, hi) in enumerate(rs)])
        matched = F.filter(
            arr, lambda r: (r.lo.isNull() | (c >= r.lo))
            & (r.hi.isNull() | (c < r.hi)))
        counts = (dm.filter(c.isNotNull())
                    .select(F.explode(F.transform(matched, lambda r: r.i))
                             .alias("i"))
                    .groupBy("i").agg(F.count("*").alias("n")))
        # request frame as a literal VALUES LocalRelation: zero jobs
        # (createDataFrame+collect would launch a defaultParallelism job)
        vals = ", ".join(
            "({}, '{}', {}, {})".format(
                i, key.replace("'", "''"),
                "CAST(NULL AS BIGINT)" if lo is None else f"{lo}L",
                "CAST(NULL AS BIGINT)" if hi is None else f"{hi}L")
            for i, (key, lo, hi) in enumerate(rs))
        frame = self.spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(i, range_key, lo, hi)")
        return (frame.join(F.broadcast(counts), "i", "left")
                     .select("range_key", "lo", "hi",
                             F.coalesce("n", F.lit(0)).alias("n"),
                             "i")
                     .orderBy("i").drop("i"))

    def cardinality(self, query: str, filters=(), boosts=(),
                    col: str = "domain", facet_col: str | None = None,
                    rsd: float | None = None, _dm=None) -> DataFrame:
        """Cardinality metric over the FULL match set — the distinct
        count of ``col`` among matching live docs (the aggregation
        module's cardinality metric; NULLs skipped like every metric).
        With ``facet_col`` it nests under a terms bucket (per-facet
        distinct counts, doc_count-desc/tag-asc like facet_stats).

        Exact by default: count(distinct) is a two-phase hash agg
        keyed on the value — exact and hash-gradeable, shuffle
        O(#distinct). At 100 TB cardinalities pass ``rsd`` to use
        approx_count_distinct (HyperLogLog++, bounded memory,
        relative error ≤ rsd) — the sketch/exact split the rest of
        the aggregation surface follows."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="cardinality")
        c = F.col(col)
        agg = (F.approx_count_distinct(col, rsd) if rsd is not None
               else F.count_distinct(c)).alias("n_distinct")
        if facet_col is None:
            return dm.filter(c.isNotNull()).agg(agg)
        facet = dm.schema[facet_col]
        val = (F.explode(facet_col) if facet.dataType.typeName() == "array"
               else F.col(facet_col))
        return (dm.filter(c.isNotNull())
                  .select(val.alias("tag_id"), c.alias("_v"))
                  .groupBy("tag_id")
                  .agg(F.count("*").alias("doc_count"),
                       (F.approx_count_distinct("_v", rsd)
                        if rsd is not None
                        else F.count_distinct(F.col("_v")))
                       .alias("n_distinct"))
                  .orderBy(F.desc("doc_count"), F.asc("tag_id")))

    def extended_stats(self, query: str, filters=(), boosts=(),
                       col: str = "lastmodified", sigma: float = 2.0,
                       shift: int = 0, _dm=None) -> DataFrame:
        """Extended-stats metric over the FULL match set — the tantivy
        aggregation module's ExtendedStatsAggregation (the ES-compatible
        superset of the stats metric): ONE row (n, min, max, sum, avg,
        sum_of_squares, variance, std_deviation, std_upper, std_lower)
        of a numeric doc-meta column, NULLs skipped; bounds are
        avg ± sigma·std (sigma default 2.0, the ES contract).

        Arithmetic discipline (hash-gradeable like field_stats): every
        sum is an EXACT decimal aggregate — partition-order independent —
        and doubles appear only in one FIXED final expression tree:
        avg = double(Σx)/n; variance = population variance via
        (double(Σ(x−c)²) − double(Σ(x−c))·(double(Σ(x−c))/n))/n, clamped
        at 0 (exact-cancellation can land one ulp negative);
        std = sqrt(variance). The scalar fixture oracle replicates the
        same op order bitwise (Python floats are IEEE doubles).

        ``shift`` (the constant c) is the 100 TB knob: variance is
        translation-invariant, and Σx² of raw µs dates (~1.8e15 each,
        squares ~3.2e30) outgrows decimal(38,0) past ~3·10⁷ matched docs
        — try_sum turns that overflow into NULL rather than an ANSI
        error, and shifting by a corpus-epoch constant keeps the squared
        sum small at any match count. The reported ``sum_of_squares``
        stays the RAW Σx² (NULL once it overflows), matching the ES/
        tantivy response field; ``variance`` stays exact under shift."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="extended_stats")
        c = F.col(col)
        x = dm.filter(c.isNotNull()).select(
            c.cast("long").alias("_x"),
            (c.cast("long") - F.lit(int(shift)).cast("long")).alias("_xs"))
        # decimal(19,0) operands: the product type is decimal(38,0) with
        # no precision loss (µs-scale squares have ≤ 32 digits)
        sq = ("try_sum(cast({0} as decimal(19,0)) "
              "* cast({0} as decimal(19,0)))")
        agg = x.agg(
            F.count("*").alias("n"),
            F.min("_x").alias("min"),
            F.max("_x").alias("max"),
            F.sum(F.col("_x").cast("decimal(38,0)")).alias("_s"),
            F.sum(F.col("_xs").cast("decimal(38,0)")).alias("_s_sh"),
            F.expr(sq.format("_xs")).alias("_ssq_sh"),
            F.expr(sq.format("_x")).alias("_ssq_raw"))
        n_d = F.col("n").cast("double")
        avg = F.col("_s").cast("double") / n_d
        m_sh = F.col("_s_sh").cast("double") / n_d
        var_raw = (F.col("_ssq_sh").cast("double")
                   - F.col("_s_sh").cast("double") * m_sh) / n_d
        # explicit when(), not greatest(): kills -0.0 identically to the
        # fixture's `0.0 if v <= 0.0 else v`
        var = F.when(var_raw <= F.lit(0.0), F.lit(0.0)).otherwise(var_raw)
        std = F.sqrt(var)
        sig = F.lit(float(sigma))
        return agg.select(
            "n", "min", "max",
            F.expr("try_cast(_s AS BIGINT)").alias("sum"),
            avg.alias("avg"),
            F.col("_ssq_raw").cast("double").alias("sum_of_squares"),
            var.alias("variance"),
            std.alias("std_deviation"),
            (avg + sig * std).alias("std_upper"),
            (avg - sig * std).alias("std_lower"))

    def top_hits(self, query: str, filters=(), boosts=(),
                 facet_col: str = "tags", sort_col: str = "lastmodified",
                 k_hits: int = 3, asc: bool = False,
                 salt_buckets: int = 16, _dm=None) -> DataFrame:
        """Top-hits sub-aggregation under a terms bucket — the tantivy
        aggregation module's TopHitsAggregation: per facet value, the
        k_hits first matching docs ordered by a fast field (date
        descending by default, url ascending tie-break — url is unique,
        so the ranking is total and hash-gradeable). Docs missing the
        sort field are skipped (every metric's NULL contract). Output
        (tag_id, rank, url, sort_value), tag-asc / rank-asc.

        Scale shape: exact two-phase top-k in whole-stage-codegen
        expressions — phase 1 groups on (tag_id, salt=doc_ord mod S) and
        keeps slice(array_sort(collect_list(key)), 1, k) per salted
        bucket, phase 2 merges ≤ S·k rows per tag the same way. The
        shuffle is O(matched (doc,tag) pairs), the same profile as every
        terms aggregation, but no single reducer ever materializes a hot
        tag's full match list (the salt caps phase-2 input at S·k),
        and nothing sorts more than a k-clamped array."""
        if k_hits <= 0:
            raise ValueError("k_hits must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="top_hits")
        facet = dm.schema[facet_col]
        tag = (F.explode(facet_col) if facet.dataType.typeName() == "array"
               else F.col(facet_col))
        s = F.col(sort_col).cast("long")
        # array_sort over struct compares fields in order: the sort key
        # first (negated long for descending — µs dates are non-negative,
        # so negation never overflows), then the unique url tie-break
        key = F.struct((s if asc else -s).alias("_k"),
                       F.col("url").alias("url"),
                       s.alias("sort_value"))
        x = dm.filter(F.col(sort_col).isNotNull()).select(
            tag.alias("tag_id"), key.alias("_h"),
            F.pmod(F.col("doc_ord"), F.lit(int(salt_buckets))).alias("_b"))
        k = int(k_hits)
        p1 = x.groupBy("tag_id", "_b").agg(
            F.slice(F.array_sort(F.collect_list("_h")), 1, k).alias("_p"))
        p2 = p1.groupBy("tag_id").agg(
            F.slice(F.array_sort(F.flatten(F.collect_list("_p"))), 1, k)
             .alias("_t"))
        return (p2.selectExpr("tag_id", "posexplode(_t) as (_i, _h)")
                  .select("tag_id",
                          (F.col("_i") + 1).cast("int").alias("rank"),
                          F.col("_h.url").alias("url"),
                          F.col("_h.sort_value").alias("sort_value"))
                  .orderBy(F.asc("tag_id"), F.asc("rank")))

    def search_sorted(self, query: str, filters=(), boosts=(),
                      col: str = "lastmodified", k: int = 5,
                      offset: int = 0, asc: bool = False,
                      after=None) -> DataFrame:
        """Order-by-fast-field top-k — tantivy's
        TopDocs::order_by_u64_field collector (the reference uses only
        the score-ordered TopDocs, local.rs:120; this completes the
        collector surface): the k matching docs ordered by a numeric
        doc-meta column instead of BM25 score, url-asc tie-break (total
        order), offset applied after the sort, docs missing the field
        skipped. Output (rank, url, domain, title, <col>).

        ``after`` is the deep-paging cursor, mirroring the BM25
        search_after contract: the (col_value, url) of the previous
        page's last hit; the page is the top-k STRICTLY after it in
        the (col, url) total order, ranks restarting at 1 (the
        absolute position is unknowable in O(k)). Mutually exclusive
        with ``offset`` — the cursor replaces it: an offset page costs
        a parts×(offset+k) merge, a cursor page costs parts×k at ANY
        depth, and the strict (col, url) predicate is a plain scan
        filter Catalyst pushes below the sort. Pages concatenate to
        exactly the one-shot order (total order ⇒ no hit is skipped or
        repeated across a tie boundary).

        Plan shape: the match-set semijoin feeds ONE global
        TakeOrderedAndProject of limit offset+k — each partition keeps
        its local top-(offset+k), the driver merges; the rank window
        then runs over that ≤ offset+k-row frame, so no stage ever
        sorts more than the clamped head."""
        if k <= 0:
            raise ValueError("k must be positive")
        if after is not None and offset:
            raise ValueError("after (cursor) and offset are mutually "
                             "exclusive — the cursor replaces the offset")
        dm = self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="search_sorted")
        dm = dm.filter(F.col(col).isNotNull())
        if after is not None:
            av, au = after
            c, v = F.col(col), F.lit(int(av)).cast("long")
            beyond = c > v if asc else c < v
            dm = dm.filter(beyond | ((c == v) & (F.col("url") > F.lit(au))))
        order = [F.asc(col) if asc else F.desc(col), F.asc("url")]
        top = (dm.select("url", "domain", "title", col)
                 .orderBy(*order).limit(int(offset) + int(k)))
        w = Window.orderBy(*order)
        return (top.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") > int(offset))
                   .select("rank", "url", "domain", "title", col))

    def search_collapse(self, query, filters=(), boosts=(),
                        collapse_col: str = "domain", k: int = 5,
                        offset: int = 0) -> DataFrame:
        """Field collapsing — the ES `collapse` search option: the
        result list keeps only the BEST hit per distinct
        ``collapse_col`` value (max float32 score, url-asc tie-break
        INSIDE the group — total order), then the usual
        (score desc, url asc) top-k + offset over the collapsed list.
        "Top result per site" without a second query. Output
        (rank, url, <collapse_col>, title, score).

        Scale shape: built on the exhaustive scored match set
        (score_matches' kernel — scores bitwise equal to search at any
        rank). The per-group argmax is ONE partial→final hash agg —
        `min` of a (-score, url, ...) struct, lexicographic, so
        map-side combine applies and a HOT group never concentrates on
        one task (no window, no per-group sort; float32 negation is a
        sign flip, exact). The page is then a TakeOrderedAndProject of
        offset+k over O(#groups) rows."""
        if k <= 0:
            raise ValueError("k must be positive")
        scored = self.score_matches(query, filters, boosts)
        dm = self._doc_meta_base.select("doc_ord", collapse_col, "title")
        j = scored.join(dm, "doc_ord")
        best = (j.groupBy(collapse_col)
                 .agg(F.min(F.struct(
                     (-F.col("score")).alias("_ns"),
                     F.col("url").alias("url"),
                     F.col("title").alias("title"))).alias("_b")))
        flat = best.select(
            collapse_col,
            F.col("_b.url").alias("url"),
            F.col("_b.title").alias("title"),
            (-F.col("_b._ns")).cast("float").alias("score"))
        order = [F.desc("score"), F.asc("url")]
        top = flat.orderBy(*order).limit(int(offset) + int(k))
        w = Window.orderBy(*order)
        return (top.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") > int(offset))
                   .select("rank", "url", collapse_col, "title", "score"))

    def search_rescore(self, query, rescore_query, filters=(), boosts=(),
                       window_size: int = 50, query_weight: float = 1.0,
                       rescore_weight: float = 1.0,
                       k: int = 5) -> DataFrame:
        """Top-window rescoring — the ES `rescore` phase: take the
        ``window_size`` best hits of the primary query (the cheap
        retrieval pass, (score desc, url asc) total order), re-rank
        ONLY that window by ``query_weight``·primary +
        ``rescore_weight``·secondary (the ES weighted-sum rescorer; a
        window doc outside the secondary's match set contributes 0),
        and return the top-k of the rescored window — the classic
        cheap-retrieval / expensive-rerank split without ever scoring
        the secondary outside O(matches) tiny rows. Output
        (rank, url, domain, title, score, primary_score).

        Arithmetic discipline: total = float32(float32(w·s1) +
        float32(w'·s2)) — each product double→float32, one float32
        add (the clause-order float32 summation discipline), so the
        scalar oracle replicates the result bitwise.

        Scale shape: both scoring passes are the exhaustive
        score_matches kernel emitting O(matches) (doc_ord, score)
        rows; the window is a TakeOrderedAndProject of
        O(window_size); the secondary attaches by a broadcast LEFT
        join onto that tiny window frame; the final page is a
        TakeOrdered of k over the window."""
        if k <= 0 or window_size <= 0:
            raise ValueError("k and window_size must be positive")
        s1 = self.score_matches(query, filters, boosts)
        win = (s1.orderBy(F.desc("score"), F.asc("url"))
                 .limit(int(window_size))
                 .withColumnRenamed("score", "primary_score"))
        s2 = self.score_matches(rescore_query) \
                 .select("doc_ord", F.col("score").alias("_s2"))
        j = win.join(s2, "doc_ord", "left").fillna({"_s2": 0.0})
        total = (
            (F.col("primary_score") * F.lit(float(query_weight)))
            .cast("float")
            + (F.col("_s2") * F.lit(float(rescore_weight))).cast("float")
        ).cast("float")
        dm = self._doc_meta_base.select("doc_ord", "domain", "title")
        scored = (j.withColumn("score", total)
                   .join(dm, "doc_ord"))
        order = [F.desc("score"), F.asc("url")]
        top = scored.orderBy(*order).limit(int(k))
        w = Window.orderBy(*order)
        return (top.withColumn("rank", F.row_number().over(w))
                   .select("rank", "url", "domain", "title", "score",
                           "primary_score"))

    FILTER_OPS = ("eq", "ne", "lt", "lte", "gt", "gte", "like", "contains")

    def _named_predicates(self, specs) -> tuple[list, list]:
        """Shared spec parser of the named-filter bucket aggs
        (filters_agg, adjacency_matrix): {key: [(col, op, value), ...]}
        with conditions ANDed per key → (keys, boolean Columns). A NULL
        column value fails every op ("ne" included — ES term-level
        semantics: a missing field matches nothing)."""
        if not specs:
            raise ValueError("specs must be non-empty")

        def _cond(col, op, value):
            c = F.col(col)
            if op == "eq":
                return c == F.lit(value)
            if op == "ne":
                return c != F.lit(value)
            if op == "lt":
                return c < F.lit(value)
            if op == "lte":
                return c <= F.lit(value)
            if op == "gt":
                return c > F.lit(value)
            if op == "gte":
                return c >= F.lit(value)
            if op == "like":
                return c.like(str(value))
            if op == "contains":
                return F.array_contains(c, F.lit(value))
            raise ValueError(f"op must be one of {self.FILTER_OPS}, "
                             f"got {op!r}")

        keys, preds = [], []
        for key, conds in specs.items():
            conds = list(conds)
            if not conds:
                raise ValueError(f"filter {key!r}: conditions must be "
                                 "non-empty")
            p = _cond(*conds[0])
            for cnd in conds[1:]:
                p = p & _cond(*cnd)
            keys.append(str(key))
            preds.append(p)
        return keys, preds

    def filters_agg(self, query: str, filters=(), boosts=(),
                    specs: dict | None = None, other_bucket: bool = False,
                    _dm=None) -> DataFrame:
        """Filters bucket aggregation — the ES `filters` agg (named
        buckets, each defined by its own predicate over the match set;
        tantivy's aggregation module ships the same named-buckets
        contract). One row per requested key counting the matched docs
        that ALSO satisfy that bucket's predicate: buckets may overlap
        (a doc counts in EVERY bucket it satisfies), empty buckets
        still emit n=0, and ``other_bucket=True`` appends the ES
        ``_other_`` bucket — docs matching NONE of the filters.

        ``specs``: {key: [(col, op, value), ...]} — conditions AND
        within a bucket; op ∈ FILTER_OPS ("contains" = array_contains
        for array columns like tags; "like" = SQL LIKE). A NULL column
        value matches no op, "ne" included (ES term-level semantics:
        a missing field matches nothing).

        Scale shape (range_agg's profile): the membership test is ONE
        when()-chain array literal in whole-stage codegen — doc-local
        bucket ids → skew-free single groupBy, output O(#buckets); the
        request-order frame is a literal VALUES LocalRelation
        (job-free) broadcast-joined to the counts."""
        if "_other_" in (specs or ()):
            raise ValueError("'_other_' is the reserved other-bucket key")
        keys, preds = self._named_predicates(specs)
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="filters_agg")
        # matched bucket ids as ONE codegen array expression; a NULL
        # predicate result (NULL column value) drops out in the filter
        arr = F.filter(
            F.array(*[F.when(p, F.lit(i)) for i, p in enumerate(preds)]),
            lambda x: x.isNotNull())
        if other_bucket:
            arr = F.when(F.size(arr) == 0,
                         F.array(F.lit(len(keys)))).otherwise(arr)
            keys = keys + ["_other_"]
        counts = (dm.select(F.explode(arr).alias("i"))
                    .groupBy("i").agg(F.count("*").alias("n")))
        vals = ", ".join("({}, '{}')".format(i, k.replace("'", "''"))
                         for i, k in enumerate(keys))
        frame = self.spark.sql(
            f"SELECT * FROM VALUES {vals} AS t(i, filter_key)")
        return (frame.join(F.broadcast(counts), "i", "left")
                     .select("filter_key",
                             F.coalesce("n", F.lit(0).cast("long"))
                              .alias("n"), "i")
                     .orderBy("i").drop("i"))

    def rare_terms(self, query: str, filters=(), boosts=(),
                   facet_col: str = "tags", max_doc_count: int = 1,
                   _dm=None) -> DataFrame:
        """Rare-terms bucket aggregation — the ES `rare_terms` agg: the
        LONG TAIL of a terms aggregation, i.e. every facet value whose
        doc_count over the match set is <= ``max_doc_count`` (ES
        default 1), ordered doc_count ASC then key asc (total order;
        the mirror of terms_agg's ordering). NULL values are skipped
        (a missing field buckets nowhere). ES computes this
        approximately behind a CuckooFilter; this form is EXACT — the
        same one partial→final hash agg as terms_agg with the opposite
        count filter, so strictly better precision at the same single
        shuffle.

        Scale note: output is O(#values with count <= max), which on a
        power-law facet is the LARGE side of the vocabulary — unlike
        terms_agg the ES contract has no size cap; cap downstream with
        .limit() when rendering."""
        if max_doc_count <= 0:
            raise ValueError("max_doc_count must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="rare_terms")
        facet = dm.schema[facet_col]
        val = (F.explode(facet_col) if facet.dataType.typeName() == "array"
               else F.col(facet_col))
        return (dm.select(val.alias("tag_id"))
                  .filter(F.col("tag_id").isNotNull())
                  .groupBy("tag_id").agg(F.count("*").alias("doc_count"))
                  .filter(F.col("doc_count") <= int(max_doc_count))
                  .orderBy(F.asc("doc_count"), F.asc("tag_id")))

    def composite_agg(self, query: str, filters=(), boosts=(),
                      sources: tuple = (), size: int = 10,
                      after: tuple | None = None, _dm=None) -> DataFrame:
        """Composite bucket aggregation — the ES `composite` agg: the
        pageable flat cross-product of one or more bucket sources,
        ordered by the composite key tuple ASCENDING, ``size`` buckets
        per page, with ``after`` resuming STRICTLY after a key tuple in
        that total order. The canonical way to EXPORT a large bucket
        set: unlike terms/histogram no stage ever holds more than one
        page of buckets on the driver.

        ``sources``: tuple of {"name", "col", "kind"} with kind
        "terms" (raw value) or "histogram"/"date_histogram"
        (+"interval": the same exact floor-mod integer bucketing as
        :meth:`histogram`, offset 0 — composite sources carry no
        offset in ES either). Docs NULL in ANY source column are
        skipped (ES default missing_bucket=false). ``after``: the
        previous page's last key tuple, in source order. Output: one
        column per source name + doc_count.

        Scale shape: bucket keys are doc-local codegen expressions →
        ONE skew-free groupBy; the page is a TakeOrderedAndProject of
        limit ``size`` (each partition keeps its local top-size, the
        driver merges O(parts·size) rows); the cursor is a plain
        filter Catalyst pushes below the sort, so page depth never
        raises cost — the search_after discipline applied to buckets.
        GroupBy keys are unique ⇒ the key order is total ⇒ pages
        concatenate to exactly the one-shot order."""
        srcs = [dict(s) for s in sources]
        if not srcs:
            raise ValueError("sources must be non-empty")
        if size <= 0:
            raise ValueError("size must be positive")
        names = [str(s["name"]) for s in srcs]
        if len(set(names)) != len(names):
            raise ValueError("source names must be unique")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="composite_agg")
        keys = []
        for s in srcs:
            col, kind = str(s["col"]), str(s.get("kind", "terms"))
            if kind == "terms":
                keys.append(F.col(col))
            elif kind in ("histogram", "date_histogram"):
                step = int(s.get("interval", 0))
                if step <= 0:
                    raise ValueError(f"source {s['name']!r}: interval "
                                     "must be positive")
                # floor-mod like histogram(): exact for any sign, pure
                # integer arithmetic (µs values sit near the double edge)
                keys.append(F.expr(f"{col} - pmod({col}, {step})"))
            else:
                raise ValueError(f"source {s['name']!r}: kind must be "
                                 "terms|histogram|date_histogram")
        proj = dm.select(*[k.alias(n) for k, n in zip(keys, names)])
        for n in names:
            proj = proj.filter(F.col(n).isNotNull())
        buckets = proj.groupBy(*names).agg(F.count("*").alias("doc_count"))
        if after is not None:
            if len(after) != len(names):
                raise ValueError("after must have one value per source")
            # strict lexicographic (k1..kn) > (a1..an) — the
            # search_sorted cursor shape: OR over the first differing
            # slot, equality-prefix AND'd in front
            pred, eq = None, None
            for n, a in zip(names, after):
                gt = F.col(n) > F.lit(a)
                term = gt if eq is None else eq & gt
                pred = term if pred is None else pred | term
                e = F.col(n) == F.lit(a)
                eq = e if eq is None else eq & e
            buckets = buckets.filter(pred)
        order = [F.asc(n) for n in names]
        return (buckets.orderBy(*order).limit(int(size))
                       .orderBy(*order))

    def missing_count(self, query: str, filters=(), boosts=(),
                      col: str = "description", _dm=None) -> DataFrame:
        """Missing bucket — the ES `missing` agg: ONE row (n) counting
        the matched docs with NO value in ``col`` (NULL; for array
        columns NULL or empty — ES buckets a doc as missing when the
        field extracts zero values). The complement of every metric's
        NULLs-skipped count: n_missing + value-bearing = match size.
        Plan: one filter + partial→final count, no extra pass."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="missing_count")
        c = F.col(col)
        if dm.schema[col].dataType.typeName() == "array":
            pred = c.isNull() | (F.size(c) == 0)
        else:
            pred = c.isNull()
        return dm.filter(pred).agg(F.count("*").alias("n"))

    def value_count(self, query: str, filters=(), boosts=(),
                    col: str = "tags", _dm=None) -> DataFrame:
        """Value-count metric — the ES `value_count` agg: ONE row (n)
        counting the VALUES extracted from ``col`` across the match
        set — each element of an array column counts (a doc with 3
        tags contributes 3), NULLs skipped. Distinct-insensitive,
        unlike cardinality. Plan: explode (arrays) + partial→final
        count — doc-local, skew-free, one pass."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="value_count")
        val = (F.explode(col)
               if dm.schema[col].dataType.typeName() == "array"
               else F.col(col))
        return (dm.select(val.alias("_v"))
                  .filter(F.col("_v").isNotNull())
                  .agg(F.count("*").alias("n")))

    def weighted_avg(self, query: str, filters=(), boosts=(),
                     col: str = "lastmodified",
                     weight_col: str = "published", _dm=None) -> DataFrame:
        """Weighted-average metric — the ES `weighted_avg` agg:
        Σ(value·weight)/Σweight over matched docs carrying BOTH fields
        (the ES default skips a doc missing either side). Output ONE
        row (n, value).

        Arithmetic discipline (the field_stats pattern): both sums are
        EXACT decimal aggregates — partition-order independent — and
        the division is ONE double op, double(Σvw)/double(Σw), so the
        row is hash-gradeable. decimal(19,0)·decimal(19,0) products
        stay inside decimal(38,0) for µs-scale operands; the SUM of
        µs·µs products outgrows decimal(38,0) past ~10⁷ matched docs,
        so it is a try_sum (NULL value, never an ANSI error — the
        extended_stats degradation contract; shift/rescale the weight
        at that scale). A zero (or NULL) weight sum degrades to a NULL
        value the same way — never NaN, which json.dumps would emit as
        non-standard JSON."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="weighted_avg")
        v, w = F.col(col), F.col(weight_col)
        x = dm.filter(v.isNotNull() & w.isNotNull())
        agg = x.agg(
            F.count("*").alias("n"),
            F.expr(f"try_sum(cast({col} as decimal(19,0)) "
                   f"* cast({weight_col} as decimal(19,0)))").alias("_svw"),
            F.sum(w.cast("decimal(38,0)")).alias("_sw"))
        return agg.select(
            "n", F.when(F.col("_sw") != 0,
                        F.col("_svw").cast("double")
                        / F.col("_sw").cast("double")).alias("value"))

    def median_absolute_deviation(self, query: str, filters=(), boosts=(),
                                  col: str = "lastmodified",
                                  _dm=None) -> DataFrame:
        """Median-absolute-deviation metric — the ES
        `median_absolute_deviation` agg: median(|x − median(x)|) over
        the matched docs' non-NULL values, ONE row (n, mad). ES ships
        this on a TDigest sketch (approximate); this form is EXACT —
        two `percentile` aggregates (each an exactly-merged
        value→count map, partition-order independent) chained by a
        broadcast of the 1-row median, all lazy in one plan. The
        deviations are computed in double: µs values sit below 2^53 so
        the subtraction and the .5-fraction median are exact.

        Scale note: memory is O(#distinct values) in each final agg
        buffer (the exact-percentiles profile); at 100 TB
        high-cardinality columns use percentiles(approx_accuracy=...)
        twice instead — the same exact-baseline/sketch-scale split."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="median_absolute_deviation")
        c = F.col(col)
        x = dm.filter(c.isNotNull()).select(c.cast("double").alias("_x"))
        med = x.agg(F.expr("percentile(_x, 0.5)").alias("_med"))
        dev = (x.crossJoin(F.broadcast(med))
                .select(F.abs(F.col("_x") - F.col("_med")).alias("_d")))
        return dev.agg(F.count("*").alias("n"),
                       F.expr("percentile(_d, 0.5)").alias("mad"))

    def boxplot(self, query: str, filters=(), boosts=(),
                col: str = "lastmodified", _dm=None) -> DataFrame:
        """Boxplot metric — the ES `boxplot` agg: ONE row (n, min, max,
        q1, q2, q3, lower, upper) over the matched docs' non-NULL
        values. lower/upper are the WHISKER values: the smallest/
        largest data point inside the Tukey fences
        [q1 − 1.5·IQR, q3 + 1.5·IQR] (the ES contract; equal to
        min/max when nothing is fenced out). ES computes on a TDigest;
        this form is exact — one quartile aggregate (exactly-merged
        `percentile`), broadcast to a second conditional min/max pass,
        all lazy in one plan, doubles below 2^53 so the fence
        arithmetic is exact."""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="boxplot")
        c = F.col(col)
        x = dm.filter(c.isNotNull()).select(c.cast("double").alias("_x"))
        q = x.agg(
            F.count("*").alias("n"),
            F.min("_x").alias("min"), F.max("_x").alias("max"),
            F.expr("percentile(_x, array(0.25, 0.5, 0.75))").alias("_q"))
        q = q.select(
            "n", "min", "max",
            F.col("_q")[0].alias("q1"), F.col("_q")[1].alias("q2"),
            F.col("_q")[2].alias("q3"),
            (F.col("_q")[0]
             - F.lit(1.5) * (F.col("_q")[2] - F.col("_q")[0])).alias("_lf"),
            (F.col("_q")[2]
             + F.lit(1.5) * (F.col("_q")[2] - F.col("_q")[0])).alias("_uf"))
        w = (x.crossJoin(F.broadcast(q))
              .agg(F.min(F.when(F.col("_x") >= F.col("_lf"),
                                F.col("_x"))).alias("lower"),
                   F.max(F.when(F.col("_x") <= F.col("_uf"),
                                F.col("_x"))).alias("upper")))
        return q.select("n", "min", "max", "q1", "q2", "q3").crossJoin(
            F.broadcast(w))

    def multi_terms(self, query: str, filters=(), boosts=(),
                    facet_cols: tuple = ("domain", "tags"),
                    size: int = 10, _dm=None) -> DataFrame:
        """Multi-terms bucket aggregation — the ES `multi_terms` agg:
        terms buckets over VALUE TUPLES of several fields. Array
        columns explode — a doc emits the cross-product of its
        per-field values (the ES multi-valued contract) — and docs
        missing ANY field are skipped (ES requires every source
        present). Top ``size`` tuples by (doc_count desc, key tuple
        asc — total order) plus the constant sum_other_doc_count:
        matched tuples OUTSIDE the returned buckets. Output: one
        column per facet col, doc_count, sum_other_doc_count.

        Plan profile = terms_agg: the explodes are doc-local
        Generates, ONE partial→final hash agg on the tuple; the limit,
        the two 1-row totals, and the broadcast projection all run on
        O(#distinct tuples) rows."""
        cols = [str(c) for c in facet_cols]
        if not cols or len(set(cols)) != len(cols):
            raise ValueError("facet_cols must be non-empty and unique")
        if size <= 0:
            raise ValueError("size must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="multi_terms")
        proj = dm
        for c in cols:
            if dm.schema[c].dataType.typeName() == "array":
                proj = proj.withColumn(c, F.explode(c))
        proj = proj.select(*cols)
        for c in cols:
            proj = proj.filter(F.col(c).isNotNull())
        counts = proj.groupBy(*cols).agg(F.count("*").alias("doc_count"))
        order = [F.desc("doc_count")] + [F.asc(c) for c in cols]
        top = counts.orderBy(*order).limit(int(size))
        total = counts.agg(
            F.coalesce(F.sum("doc_count"), F.lit(0).cast("long"))
             .alias("_total"))
        kept = top.agg(
            F.coalesce(F.sum("doc_count"), F.lit(0).cast("long"))
             .alias("_kept"))
        return (top.crossJoin(F.broadcast(total))
                   .crossJoin(F.broadcast(kept))
                   .select(*cols, "doc_count",
                           (F.col("_total") - F.col("_kept"))
                           .alias("sum_other_doc_count"))
                   .orderBy(*order))

    def adjacency_matrix(self, query: str, filters=(), boosts=(),
                         specs: dict | None = None, _dm=None) -> DataFrame:
        """Adjacency-matrix bucket aggregation — the ES
        `adjacency_matrix` agg: given named filters, one bucket per
        filter (its match count within the query's match set) and one
        per INTERSECTING PAIR, keyed ``a&b`` (ES's ampersand join,
        members in request order). Only NON-EMPTY buckets are emitted
        (the ES contract — unlike filters_agg there is no n=0 echo);
        output (filter_key, n) key-ascending. #buckets ≤ k(k+1)/2.

        Plan shape: the same one when()-chain matched-ids array as
        filters_agg, then the singleton AND pair keys are emitted
        doc-locally from that array — combinations via
        transform/slice/flatten, pure codegen, no UDF, no second
        match-set pass — so the single groupBy shuffles
        O(#buckets × partitions) partial rows."""
        keys, preds = self._named_predicates(specs)
        for k in keys:
            if "&" in k:
                raise ValueError(
                    f"filter key {k!r}: '&' is the ES pair separator")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="adjacency_matrix")
        arr = F.filter(
            F.array(*[F.when(p, F.lit(i)) for i, p in enumerate(preds)]),
            lambda x: x.isNotNull())
        names_sql = "array(" + ", ".join(
            "'" + k.replace("'", "''") + "'" for k in keys) + ")"
        # matched ids ascend by construction → pairs are request-order
        # (i < j); keys resolve through the literal names array
        bucket_keys = F.expr(
            f"concat(transform(_m, x -> element_at({names_sql}, x + 1)), "
            "flatten(transform(_m, (x, ix) -> "
            "transform(slice(_m, ix + 2, size(_m)), "
            f"y -> concat(element_at({names_sql}, x + 1), '&', "
            f"element_at({names_sql}, y + 1))))))")
        return (dm.select(arr.alias("_m"))
                  .select(F.explode(bucket_keys).alias("filter_key"))
                  .groupBy("filter_key").agg(F.count("*").alias("n"))
                  .orderBy(F.asc("filter_key")))

    def string_stats(self, query: str, filters=(), boosts=(),
                     col: str = "title", _dm=None) -> DataFrame:
        """String-stats metric — the ES `string_stats` agg over a
        keyword field: ONE row (count, min_length, max_length,
        avg_length, entropy) where count is the number of extracted
        values (arrays explode, NULLs skipped), lengths are character
        counts, and entropy is the Shannon entropy IN BITS (log2, the
        ES contract) of the CHARACTER distribution across all values.

        Determinism discipline: avg_length is the exact decimal
        length-sum over one double division (the field_stats pattern);
        the entropy fold runs over the char-SORTED aggregate array in
        one fixed order (sort_array + `aggregate` in codegen), so the
        double summation is partition-order independent. The char
        histogram is a groupBy of O(charset) rows — bounded by the
        alphabet, not the data — and the 1-row frames broadcast-join.
        (Entropy's last ulp depends on the platform log2 — the one
        value gated by tolerance, not hash, in tests. Characters are
        Java regex split code UNITS: astral-plane text counts
        surrogate halves, like ES's UTF-16-based length itself.)"""
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts), caller="string_stats")
        val = (F.explode(col)
               if dm.schema[col].dataType.typeName() == "array"
               else F.col(col))
        # explode can't nest inside cast — generate first, cast after
        vals = (dm.select(val.alias("_e"))
                  .select(F.col("_e").cast("string").alias("_v"))
                  .filter(F.col("_v").isNotNull()))
        lens = vals.select(F.length("_v").alias("_l")).agg(
            F.count("*").alias("count"),
            F.min("_l").alias("min_length"),
            F.max("_l").alias("max_length"),
            F.sum(F.col("_l").cast("decimal(38,0)")).alias("_sl"))
        lens = lens.select(
            "count", "min_length", "max_length",
            (F.col("_sl").cast("double") / F.col("count"))
            .alias("avg_length"))
        chars = (vals.select(F.explode(F.split("_v", "")).alias("_c"))
                     .filter(F.length("_c") > 0)
                     .groupBy("_c").agg(F.count("*").alias("_n")))
        ent = (chars.agg(F.sort_array(
                   F.collect_list(F.struct("_c", "_n"))).alias("_a"))
                    .select(F.expr(
                        "aggregate(_a, 0L, (t, x) -> t + x._n)").alias("_t"),
                        F.col("_a"))
                    .select(F.coalesce(F.expr(
                        "aggregate(_a, cast(0.0 as double), (acc, x) -> "
                        "acc - (x._n / cast(_t as double)) "
                        "* log2(x._n / cast(_t as double)))"),
                        F.lit(0.0)).alias("entropy")))
        return lens.crossJoin(F.broadcast(ent))

    # auto_date_histogram interval ladder (µs): 1s 5s 10s 30s 1m 5m 10m
    # 30m 1h 3h 12h 1d 7d 30d 90d 365d — the fixed-interval analog of
    # ES's calendar rounding ladder
    AUTO_HIST_LADDER = (
        1_000_000, 5_000_000, 10_000_000, 30_000_000, 60_000_000,
        300_000_000, 600_000_000, 1_800_000_000, 3_600_000_000,
        10_800_000_000, 43_200_000_000, 86_400_000_000, 604_800_000_000,
        2_592_000_000_000, 7_776_000_000_000, 31_536_000_000_000)

    def auto_date_histogram(self, query: str, filters=(), boosts=(),
                            date_col: str = "lastmodified",
                            target_buckets: int = 10,
                            _dm=None) -> DataFrame:
        """Auto-interval date histogram — the ES `auto_date_histogram`
        agg: the ENGINE picks the interval — the smallest rung of the
        fixed second→year AUTO_HIST_LADDER whose gap-filled bucket
        count over the match span stays ≤ ``target_buckets`` (ES
        rounds the interval UP to meet a bucket budget; the top rung
        is used even if it still overshoots) — then emits the
        gap-filled histogram at that rung plus a constant
        ``interval_us`` echo column (the ES response's interval
        field). Empty match set → zero rows.

        Plan shape: ONE (min, max) aggregate row collected driver-side
        to choose the rung — O(1) driver data, the search_sorted-
        cursor discipline — then the standard histogram: doc-local
        floor-mod keys, one groupBy, sequence/explode grid."""
        if target_buckets <= 0:
            raise ValueError("target_buckets must be positive")
        dm = _dm if _dm is not None else self._match_doc_meta(
            self._compile_arg(query, filters, boosts),
            caller="auto_date_histogram")
        c = F.col(date_col)
        row = (dm.filter(c.isNotNull())
                 .agg(F.min(c).alias("mn"), F.max(c).alias("mx"))
                 .collect()[0])
        if row["mn"] is None:
            step = self.AUTO_HIST_LADDER[-1]
        else:
            mn, mx = int(row["mn"]), int(row["mx"])
            step = next(
                (s for s in self.AUTO_HIST_LADDER
                 if mx // s - mn // s + 1 <= int(target_buckets)),
                self.AUTO_HIST_LADDER[-1])
        return (self.histogram(query, filters, boosts, col=date_col,
                               interval=step, min_doc_count=0, _dm=dm,
                               _caller="auto_date_histogram")
                .withColumn("interval_us", F.lit(step).cast("long")))

    AGG_KINDS = ("facets", "date_histogram", "histogram",
                 "histogram_stats", "stats", "percentiles",
                 "percentile_ranks", "facet_stats", "range", "cardinality",
                 "extended_stats", "top_hits", "terms", "count",
                 "significant_terms", "filters", "rare_terms", "composite",
                 "missing", "value_count", "weighted_avg",
                 "median_absolute_deviation", "boxplot", "multi_terms",
                 "adjacency_matrix", "auto_date_histogram", "string_stats")

    def aggregate(self, query: str, filters=(), boosts=(),
                  aggs: dict | None = None) -> dict:
        """Aggregation REQUEST TREE over one match-set pass — tantivy's
        aggregation collector executes every requested aggregation in a
        single segment traversal; the per-kind methods here each
        recompute the match set (posting decode + two metadata joins),
        so an N-agg dashboard pays N×. This runs the match-set subtree
        ONCE, persists the O(matches) doc-meta frame (MEMORY_AND_DISK —
        spill-safe, recomputable on executor loss, unlike a
        localCheckpoint), and serves every sub-aggregation from the
        cached frame: 1 materialization job + N cheap agg jobs.

        ``aggs``: {name: {"kind": <AGG_KINDS>, ...params}} — params are
        the matching method's keyword args (facet_col, interval_us,
        col, percents, ranges, rsd, ...). Returns {name: DataFrame}.
        The cached frame is retained so the returned (lazy) DataFrames
        stay cheap; the NEXT aggregate()/refresh() call unpersists it.

        ``"global": True`` in a spec runs that sub-aggregation over the
        WHOLE live index instead of the match set — the ES `global`
        bucket ("all documents in the search context, ignoring the
        query"), the standard match-vs-corpus comparison shape. The
        full doc-meta frame is persisted once per request tree (only
        when some spec asks for it) and shared by every global spec;
        it reads the kind=3 store partition directly — no posting
        decode at all on the global side. ``"sampler": N`` restricts a
        spec's frame (match-set or global) to the deterministic
        first-N-by-doc_ord sample — the ES `sampler` bucket analog
        with significant_terms' total-order sampling, a TakeOrdered of
        O(N).

        PIPELINE kinds (<PIPELINE_KINDS> — the ES parent pipeline
        aggregations) don't touch the match set at all: they transform
        a SIBLING bucket aggregation's output, referenced ES-style via
        ``buckets_path``: ``"weekly"`` (value column defaults to n) or
        ``"weekly>doc_count"``. They run after every bucket agg is
        built and cost one O(#buckets) window over the sibling frame."""
        if not aggs:
            raise ValueError("aggs must be non-empty")
        builders = {
            "facets": self.facet_counts, "date_histogram": self.date_histogram,
            "histogram": self.histogram,
            "histogram_stats": self.histogram_stats,
            "stats": self.field_stats, "percentiles": self.percentiles,
            "percentile_ranks": self.percentile_ranks,
            "facet_stats": self.facet_stats, "range": self.range_agg,
            "cardinality": self.cardinality,
            "extended_stats": self.extended_stats, "top_hits": self.top_hits,
            "terms": self.terms_agg, "count": self.count_matches,
            "significant_terms": self.significant_terms,
            "filters": self.filters_agg, "rare_terms": self.rare_terms,
            "composite": self.composite_agg,
            "missing": self.missing_count, "value_count": self.value_count,
            "weighted_avg": self.weighted_avg,
            "median_absolute_deviation": self.median_absolute_deviation,
            "boxplot": self.boxplot, "multi_terms": self.multi_terms,
            "adjacency_matrix": self.adjacency_matrix,
            "auto_date_histogram": self.auto_date_histogram,
            "string_stats": self.string_stats,
        }
        pipeline_fns = {"cumulative_sum": self.cumulative_sum,
                        "derivative": self.derivative,
                        "stats_bucket": self.stats_bucket,
                        "max_bucket": self.max_bucket,
                        "min_bucket": self.min_bucket,
                        "moving_fn": self.moving_fn,
                        "serial_diff": self.serial_diff,
                        "bucket_script": self.bucket_script,
                        "bucket_selector": self.bucket_selector,
                        "bucket_sort": self.bucket_sort}
        seen = set()
        for name, spec in aggs.items():
            kind = spec.get("kind")
            if kind in pipeline_fns:
                path = str(spec.get("buckets_path", "")).split(">")[0]
                # a pipeline may chain onto an EARLIER pipeline entry
                # (ES's max_bucket-of-derivative shape) — resolution is
                # dict order, so forward/self references are rejected
                if path not in aggs or path == name or (
                        aggs[path].get("kind") in pipeline_fns
                        and path not in seen):
                    raise ValueError(
                        f"agg {name!r}: buckets_path must name a sibling "
                        "bucket aggregation (or an earlier pipeline "
                        "entry)")
            elif kind not in builders:
                raise ValueError(
                    f"agg {name!r}: kind must be one of "
                    f"{self.AGG_KINDS + self.PIPELINE_KINDS}")
            seen.add(name)
        dm = self._match_doc_meta(self._compile_arg(query, filters, boosts),
                                  caller="aggregate")
        for cache in ("_agg_dm_cache", "_agg_gdm_cache"):
            prev = getattr(self, cache, None)
            if prev is not None:
                prev.unpersist()
                setattr(self, cache, None)
        dm = dm.persist()
        dm.count()  # materialize the shared pass eagerly
        self._agg_dm_cache = dm
        g_dm = None
        out = {}
        for name, spec in aggs.items():
            if spec.get("kind") in pipeline_fns:
                continue
            s = dict(spec)
            kind = s.pop("kind")
            if s.pop("global", False):
                if g_dm is None:   # one shared full-index frame
                    g_dm = self._anti_tombstone(self._doc_meta_base) \
                               .persist()
                    g_dm.count()
                    self._agg_gdm_cache = g_dm
                base = g_dm
            else:
                base = dm
            samp = s.pop("sampler", None)
            if samp is not None:
                # ES `sampler` bucket analog: the sub-agg sees only a
                # deterministic first-N-by-doc_ord sample of its frame
                # (the significant_terms sampler's total order) — a
                # TakeOrdered of O(N), never the full set
                if int(samp) <= 0:
                    raise ValueError(f"agg {name!r}: sampler must be "
                                     "positive")
                base = base.orderBy("doc_ord").limit(int(samp))
            out[name] = builders[kind](query, filters=filters,
                                       boosts=boosts, _dm=base, **s)
        for name, spec in aggs.items():  # pipeline pass: siblings exist
            if spec.get("kind") not in pipeline_fns:
                continue
            s = dict(spec)
            kind = s.pop("kind")
            path = str(s.pop("buckets_path"))
            sib, _, vcol = path.partition(">")
            if "from" in s:  # ES request key; `from` is a Python keyword
                s["from_"] = s.pop("from")
            out[name] = pipeline_fns[kind](out[sib], vcol or "n", **s)
        return out

    PIPELINE_KINDS = ("cumulative_sum", "derivative", "stats_bucket",
                      "max_bucket", "min_bucket", "moving_fn", "serial_diff",
                      "bucket_script", "bucket_selector", "bucket_sort")

    @staticmethod
    def stats_bucket(buckets: DataFrame, val_col: str = "n") -> DataFrame:
        """ES `stats_bucket` sibling pipeline aggregation: ONE row
        (count, min, max, sum, avg) over a sibling bucket agg's
        ``val_col`` — which also serves the ES avg_bucket / sum_bucket
        / (value-only) min_bucket / max_bucket responses as columns.
        Same arithmetic discipline as facet_stats: decimal(38,0)-exact
        sum, avg = double(exact sum)/count in ONE division. An empty
        sibling yields (0, NULLs) — ES's null stats. O(#buckets) input,
        O(1) output; the match set is never re-traversed."""
        agg = buckets.agg(
            F.count(val_col).alias("count"),
            F.min(val_col).alias("min"), F.max(val_col).alias("max"),
            F.sum(F.col(val_col).cast("decimal(38,0)")).alias("_s"))
        return agg.select(
            "count", "min", "max",
            F.expr("try_cast(_s AS BIGINT)").alias("sum"),
            F.when(F.col("count") > 0,
                   F.col("_s").cast("double") / F.col("count"))
             .alias("avg"))

    @staticmethod
    def _extreme_bucket(buckets: DataFrame, val_col: str,
                        minimum: bool) -> DataFrame:
        """Shared ES min_bucket/max_bucket: the extreme ``val_col``
        value plus EVERY bucket key attaining it (the ES keys-list
        contract; ties kept, keys ascending, csv-joined — array columns
        don't survive the driver's row compare). Two aggs over the
        O(#buckets) sibling frame; empty sibling → zero rows."""
        ext = (F.min if minimum else F.max)(F.col(val_col)).alias("_ext")
        agg = buckets.agg(ext)
        return (buckets.join(F.broadcast(agg),
                             F.col(val_col) == F.col("_ext"))
                       .agg(F.concat_ws(",", F.sort_array(F.collect_list(
                            F.col("bucket").cast("string")))).alias("keys"),
                            F.min("_ext").alias("value")))

    @classmethod
    def max_bucket(cls, buckets: DataFrame,
                   val_col: str = "n") -> DataFrame:
        """ES `max_bucket`: see _extreme_bucket."""
        return cls._extreme_bucket(buckets, val_col, minimum=False)

    @classmethod
    def min_bucket(cls, buckets: DataFrame,
                   val_col: str = "n") -> DataFrame:
        """ES `min_bucket`: see _extreme_bucket."""
        return cls._extreme_bucket(buckets, val_col, minimum=True)

    @staticmethod
    def cumulative_sum(buckets: DataFrame, val_col: str = "n") -> DataFrame:
        """ES `cumulative_sum` parent pipeline aggregation: per bucket,
        the running total of a sibling histogram's ``val_col`` in
        bucket-ascending order — (bucket, value), integer-exact. A
        single unpartitioned running-sum window over O(#buckets) rows:
        the 65536 max_buckets guard upstream bounds it, so one window
        partition is never a scale concern (the match set itself is
        NOT re-traversed — the defining property of a pipeline agg)."""
        w = (Window.orderBy(F.asc("bucket"))
                   .rowsBetween(Window.unboundedPreceding, 0))
        return (buckets.select("bucket",
                               F.sum(val_col).over(w).alias("value"))
                       .orderBy(F.asc("bucket")))

    @staticmethod
    def derivative(buckets: DataFrame, val_col: str = "n") -> DataFrame:
        """ES `derivative` parent pipeline aggregation: per bucket, the
        difference from the previous bucket's ``val_col``,
        bucket-ascending — (bucket, value), integer-exact. ES emits no
        derivative for the FIRST bucket (nothing to differ against);
        that row is dropped here rather than emitted NULL. Callers on a
        gapped (occupied-only) histogram get differences between
        CONSECUTIVE EMITTED buckets, exactly like ES; gap-fill first
        (min_doc_count=0) for a uniform-lag derivative."""
        w = Window.orderBy(F.asc("bucket"))
        return (buckets.select(
                    "bucket",
                    (F.col(val_col) - F.lag(val_col).over(w)).alias("value"))
                       .filter(F.col("value").isNotNull())
                       .orderBy(F.asc("bucket")))

    MOVING_FNS = ("unweightedAvg", "sum", "min", "max", "stdDev",
                  "linearWeightedAvg")

    @staticmethod
    def serial_diff(buckets: DataFrame, val_col: str = "n", *,
                    lag: int = 1) -> DataFrame:
        """ES `serial_diff` parent pipeline aggregation: per bucket,
        ``val_col`` minus its value ``lag`` buckets earlier in
        bucket-ascending order — (bucket, value), integer-exact when
        the sibling column is integral (ES renders doubles in JSON but
        the arithmetic is the same). The first ``lag`` buckets have
        nothing to difference against and are omitted, generalizing
        :meth:`derivative` (== lag 1). One O(#buckets) lag window,
        bounded by the 65536 max_buckets guard upstream."""
        if lag < 1:
            raise ValueError("lag must be >= 1")
        w = Window.orderBy(F.asc("bucket"))
        return (buckets.select(
                    "bucket",
                    (F.col(val_col) - F.lag(val_col, int(lag)).over(w))
                    .alias("value"))
                       .filter(F.col("value").isNotNull())
                       .orderBy(F.asc("bucket")))

    @classmethod
    def moving_fn(cls, buckets: DataFrame, val_col: str = "n", *,
                  window: int = 5, func: str = "unweightedAvg",
                  shift: int = 0) -> DataFrame:
        """ES `moving_fn` parent pipeline aggregation: per bucket, one
        of the built-in MovingFunctions over a sliding window of the
        sibling's ``val_col`` in bucket-ascending order. ES window
        semantics: with ``shift=0`` (default) the window is the
        previous ``window`` buckets EXCLUDING the current one
        — rows [i-window+shift, i-1+shift]; ``shift=1`` includes the
        current bucket. Buckets whose window is empty (the first one
        at shift 0) are omitted, like :meth:`derivative`'s first row.

        Functions (all return double, the ES contract):
        ``unweightedAvg`` ``sum`` ``min`` ``max`` ``stdDev``
        (population, matching MovingFunctions.stdDev) and
        ``linearWeightedAvg`` (weights 1..n, oldest first — computed
        over an array_sort-pinned per-window array so the result is
        deterministic at any parallelism). One O(#buckets·window)
        window pass; max_buckets bounds it upstream."""
        if window < 1:
            raise ValueError("window must be >= 1")
        if func not in cls.MOVING_FNS:
            raise ValueError(f"func must be one of {cls.MOVING_FNS}")
        lo, hi = int(shift) - int(window), int(shift) - 1
        w = Window.orderBy(F.asc("bucket")).rowsBetween(lo, hi)
        v = F.col(val_col).cast("double")
        if func == "linearWeightedAvg":
            arr = F.array_sort(F.collect_list(
                F.struct(F.col("bucket"), v.alias("v"))).over(w))
            value = F.expr(
                "aggregate(_arr, "
                "named_struct('num', 0.0D, 'den', 0.0D, 'i', 0), "
                "(acc, x) -> named_struct("
                "'num', acc.num + (acc.i + 1) * x.v, "
                "'den', acc.den + (acc.i + 1), 'i', acc.i + 1), "
                "acc -> CASE WHEN acc.den > 0 THEN acc.num / acc.den END)")
            return (buckets.select("bucket", arr.alias("_arr"))
                           .select("bucket", value.alias("value"))
                           .filter(F.col("value").isNotNull())
                           .orderBy(F.asc("bucket")))
        agg = {"unweightedAvg": F.avg, "sum": F.sum, "min": F.min,
               "max": F.max, "stdDev": F.stddev_pop}[func]
        return (buckets.select("bucket",
                               agg(v).over(w).alias("value"))
                       .filter(F.col("value").isNotNull())
                       .orderBy(F.asc("bucket")))

    @staticmethod
    def bucket_script(buckets: DataFrame, val_col: str = "n", *,
                      script: str) -> DataFrame:
        """ES `bucket_script` parent pipeline aggregation: per bucket,
        a computed value from the sibling's own columns — ``script`` is
        a SQL expression over them (the ES form binds buckets_path
        variables into a Painless script; here the sibling frame IS the
        variable scope, so ``sum / doc_count`` reads directly). Returns
        (bucket, value double); buckets where the script yields NULL
        (e.g. a 0/0 guard) are omitted — ES gap_policy=skip. Pure
        column arithmetic over the O(#buckets) sibling frame, fully
        whole-stage-codegen."""
        return (buckets.select(
                    "bucket",
                    F.expr(script).cast("double").alias("value"))
                       .filter(F.col("value").isNotNull())
                       .orderBy(F.asc("bucket")))

    @staticmethod
    def bucket_selector(buckets: DataFrame, val_col: str = "n", *,
                        script: str) -> DataFrame:
        """ES `bucket_selector` parent pipeline aggregation: keep only
        the sibling buckets for which the boolean SQL expression
        ``script`` holds (NULL → dropped, matching ES's falsy gap
        handling); all sibling columns pass through unchanged. A plain
        filter over the O(#buckets) frame."""
        return buckets.filter(F.expr(script))

    @staticmethod
    def bucket_sort(buckets: DataFrame, val_col: str = "n", *,
                    sort: tuple = (), from_: int = 0,
                    size: int | None = None) -> DataFrame:
        """ES `bucket_sort` parent pipeline aggregation: re-order the
        sibling buckets by ``sort`` — a sequence of (column,
        "asc"|"desc") pairs — then page with ``from_``/``size`` (the ES
        request's `from`/`size`; aggregate() maps the reserved-word
        spec key). With no sort spec it is pure truncation in the
        sibling's natural order, like ES. Every column not named in
        the spec is appended as an ascending tie-break (schema order),
        so the emitted page is deterministic at any parallelism —
        the driver-hash requirement ES itself doesn't make. O(#buckets)
        with an early-out TakeOrdered when size is set."""
        cols = []
        named = set()
        for col, direction in sort:
            if direction not in ("asc", "desc"):
                raise ValueError("sort direction must be 'asc' or 'desc'")
            cols.append(F.asc(col) if direction == "asc" else F.desc(col))
            named.add(col)
        cols.extend(F.asc(c) for c in buckets.columns if c not in named)
        out = buckets.orderBy(*cols)
        if from_:
            out = out.offset(int(from_))
        return out.limit(int(size)) if size is not None else out

    def materialize(self, hits: DataFrame, documents: DataFrame,
                    query: str, preview_words: int = 20) -> DataFrame:
        """Hit materialization (api/handler/search.rs:142-188 analog):
        join the top-k back to the source documents (broadcast the tiny
        hit side), add a highlight preview (utils.rs:64-138) and a
        first-N-words description (crawler/mod.rs:632-637)."""
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
        """Global df per (field, term): memoized driver-side pyarrow read
        of the term-sorted stats store (row-group pruned by the field/term
        predicate — the term-dictionary-lookup analog, not a Spark job).
        Generations are summed. The same read memoizes cf (total term
        frequency — see _term_cfs, the position-payload scale gate)."""
        missing = {k2 for k2 in keys if k2 not in self._df_cache}
        if missing:
            import pyarrow.dataset as pads

            fields = sorted({f for f, _ in missing})
            terms = sorted({t for _, t in missing})
            flt = pads.field("field").isin(fields) & pads.field("term").isin(terms)
            found: dict[tuple[str, str], int] = defaultdict(int)
            found_cf: dict[tuple[str, str], int] = defaultdict(int)
            for p in self._paths("term_stats"):
                tbl = pads.dataset(p, format="parquet").to_table(
                    columns=["field", "term", "df", "cf"], filter=flt)
                for f_, t_, d_, c_ in zip(tbl.column("field").to_pylist(),
                                          tbl.column("term").to_pylist(),
                                          tbl.column("df").to_pylist(),
                                          tbl.column("cf").to_pylist()):
                    if (f_, t_) in missing:
                        found[(f_, t_)] += int(d_)
                        found_cf[(f_, t_)] += int(c_ or 0)
            for k2 in missing:
                self._df_cache[k2] = found.get(k2, 0)
                self._cf_cache[k2] = found_cf.get(k2, 0)
        return {k2: self._df_cache[k2] for k2 in keys}

    def _term_cfs(self, keys: set) -> dict:
        """Global cf per (field, term) — populated by the same stats read
        as _term_dfs (call that first for any new keys)."""
        self._term_dfs(keys)
        return {k2: self._cf_cache.get(k2, 0) for k2 in keys}

    def _tombstone_plan(self) -> dict:
        """Tombstones for the scoring plan: the manifest's doc_id list is
        resolved once (bounded — caller-supplied ids), upsert side tables
        ship inline when small and are read part-pruned by the executors
        when large."""
        if self._tomb_cache is None:
            ords: set[int] = set()
            dirs: list[str] = []
            if self.manifest.tombstones:
                rows = (self._doc_meta_base
                        .filter(F.col("doc_id").isin(list(self.manifest.tombstones)))
                        .select("doc_ord").collect())
                ords |= {int(r["doc_ord"]) for r in rows}
            side = [f"{self.index_dir}/{d}" for d in self.manifest.tombstone_dirs]
            if side:
                dset = _open_parquet_dirs(side)
                n = dset.count_rows()
                if n <= TOMBSTONE_SHIP_MAX:
                    arr = dset.to_table(columns=["doc_ord"]).column("doc_ord")
                    ords |= {int(v) for v in arr.to_pylist()}
                else:
                    dirs = side
            self._tomb_cache = {
                "tombstone_ords": np.array(sorted(ords), dtype=np.int64),
                "tombstone_dirs": dirs,
            }
        return self._tomb_cache

    _HIT_SELECT = ("CAST(col1 AS LONG) AS query_id, CAST(col2 AS INT) AS rank, "
                   "col3 AS doc_id, col4 AS url, col5 AS domain, "
                   "col6 AS title, CAST(col7 AS STRING) AS description, "
                   "col8 AS tags, col9 AS score, CAST(col10 AS LONG) AS doc_ord")

    def _local_hits_df(self, rows: list[tuple]) -> DataFrame:
        """Driver-resident hit rows → DataFrame WITHOUT a Spark job.

        ``spark.createDataFrame`` from python ROWS parallelizes into an
        RDD, so the caller's ``collect()`` launches a
        (defaultParallelism-task) job just to read back ≤k local rows —
        ~0.3-0.9 s of pure scheduling on a warm local[32]. Two job-free
        LocalRelation paths instead:

        - Arrow (preferred): ``createDataFrame(pandas)`` with
          spark.sql.execution.arrow.pyspark.enabled converts the batch
          into a Catalyst LocalRelation directly (Spark 4 keeps local
          Arrow data under arrow.localRelationThreshold driver-side) —
          ~6x faster than parsing a VALUES literal at 640 rows (0.36 s →
          0.06 s) and NUL-safe, still ZERO jobs at collect (pinned by
          tests/test_search_parity.py::test_local_hits_values_roundtrip).
        - VALUES literal fallback when Arrow is off: strings are
          SQL-escaped; rows with characters the parser can't round-trip
          (NUL) fall back to a single-slice parallelize."""
        try:
            arrow_on = self.spark.conf.get(
                "spark.sql.execution.arrow.pyspark.enabled", "false") == "true"
        except Exception:
            arrow_on = False
        if arrow_on:
            pdf = pd.DataFrame(rows, columns=HIT_COLUMNS)
            return self.spark.createDataFrame(
                pdf, schema="query_id long, rank int, doc_id string, "
                "url string, domain string, title string, "
                "description string, tags array<long>, score float, "
                "doc_ord long")
        if any(isinstance(v, str) and "\x00" in v for r in rows for v in r):
            return self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(rows, 1),
                "query_id long, rank int, doc_id string, url string, "
                "domain string, title string, description string, "
                "tags array<long>, score float, doc_ord long")

        def s(v):  # string literal ('' and \ escaped; backslash-escape mode)
            if v is None:
                return "CAST(NULL AS STRING)"
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

        vals = []
        for qid, rank, did, url, dom, ti, desc, tags, score, ord_ in rows:
            tl = ("CAST(array() AS ARRAY<LONG>)" if not tags else
                  "array(" + ",".join(f"{int(t)}L" for t in tags) + ")")
            vals.append(
                f"({int(qid)},{int(rank)},{s(did)},{s(url)},{s(dom)},{s(ti)},"
                f"{s(desc)},{tl},CAST({float(score)!r} AS FLOAT),{int(ord_)}L)")
        return self.spark.sql(
            f"SELECT {self._HIT_SELECT} FROM (VALUES {','.join(vals)})")

    def _empty_result(self) -> DataFrame:
        # literal empty relation (LocalRelation — collect() runs no job)
        return self.spark.sql(
            "SELECT CAST(NULL AS LONG) AS query_id, CAST(NULL AS INT) AS rank, "
            "CAST(NULL AS STRING) AS doc_id, CAST(NULL AS STRING) AS url, "
            "CAST(NULL AS STRING) AS domain, CAST(NULL AS STRING) AS title, "
            "CAST(NULL AS STRING) AS description, "
            "CAST(NULL AS ARRAY<LONG>) AS tags, CAST(NULL AS FLOAT) AS score, "
            "CAST(NULL AS LONG) AS doc_ord WHERE 1=0")
