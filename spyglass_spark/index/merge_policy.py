"""Size-tiered generation merge planning — tantivy LogMergePolicy analog.

The reference's IndexWriter runs tantivy's default background merge policy
(`LogMergePolicy`) over its segments; our analog plans merges over index
GENERATIONS (each delta commit = one generation, the segment analog in
this engine's layout). Spec source is tantivy's published
``src/indexer/log_merge_policy.rs`` (defaults: ``min_num_segments=8``,
``max_docs_before_merge=10_000_000``, ``min_layer_size=10_000``,
``level_log_size=0.75``); the reference wires it in
crates/spyglass-searcher/src/client/local.rs:191-203 via IndexWriter.

Semantics preserved from tantivy:

- Segments (generations) larger than ``max_docs_before_merge`` never
  merge.
- The rest are sorted by doc count descending and grouped into LEVELS:
  a new level starts whenever ``log2(max(num_docs, min_layer_size))``
  drops more than ``level_log_size`` below the current level's anchor.
- A level merges only when it holds at least ``min_num_segments``
  members — so write amplification is O(log N) per doc over the index
  lifetime instead of the O(N) of always-merge-the-oldest-pair. At
  100 TB / millions of delta commits this is the difference between a
  background merge load proportional to ingest and one proportional to
  index size.

One deviation, forced by the store layout: our ``merge_generations``
requires the merged generations to be CONTIGUOUS in part space
(ordinal-preserving rewrite — see builder.py). A level whose members
are not one contiguous run is split into maximal contiguous runs and
each run of >= 2 merges. In practice delta commits allocate part
offsets sequentially, so same-size neighbours are adjacent and levels
are contiguous; the split is a safety valve, not the common path.

The planner is pure manifest arithmetic — no Spark jobs, no data reads:
at any scale it is O(generations · log generations) on the driver.
"""
from __future__ import annotations

import math

# tantivy log_merge_policy.rs defaults
MIN_NUM_SEGMENTS = 8
MAX_DOCS_BEFORE_MERGE = 10_000_000
MIN_LAYER_SIZE = 10_000
LEVEL_LOG_SIZE = 0.75


def plan_log_merges(gens: list[dict],
                    min_num_segments: int = MIN_NUM_SEGMENTS,
                    max_docs_before_merge: int = MAX_DOCS_BEFORE_MERGE,
                    min_layer_size: int = MIN_LAYER_SIZE,
                    level_log_size: float = LEVEL_LOG_SIZE) -> list[list[int]]:
    """Return merge candidates as lists of gen ids (tantivy's
    ``compute_merge_candidates``). ``gens`` are manifest generation dicts
    (``gen``, ``num_docs``, ``part_offset``, ``num_partitions``)."""
    eligible = [g for g in gens if g["num_docs"] <= max_docs_before_merge]
    if not eligible:
        return []
    by_size = sorted(eligible, key=lambda g: -g["num_docs"])

    # group_by on the running level anchor, exactly tantivy's loop
    levels: list[list[dict]] = []
    current_anchor = float("inf")
    for g in by_size:
        log_size = math.log2(max(g["num_docs"], min_layer_size))
        if log_size < current_anchor - level_log_size:
            current_anchor = log_size
            levels.append([])
        levels[-1].append(g)

    candidates: list[list[int]] = []
    for level in levels:
        if len(level) < min_num_segments:
            continue
        # store-layout constraint: emit maximal part-space-contiguous runs
        for run in _contiguous_runs(level):
            if len(run) >= 2:
                candidates.append([g["gen"] for g in run])
    return candidates


def _contiguous_runs(level: list[dict]) -> list[list[dict]]:
    """Split a level into maximal runs contiguous in part space."""
    by_part = sorted(level, key=lambda g: g["part_offset"])
    runs: list[list[dict]] = [[by_part[0]]]
    for g in by_part[1:]:
        prev = runs[-1][-1]
        if g["part_offset"] == prev["part_offset"] + prev["num_partitions"]:
            runs[-1].append(g)
        else:
            runs.append([g])
    return runs


def apply_log_merge_policy(spark, index_dir: str,
                           min_num_segments: int = MIN_NUM_SEGMENTS,
                           max_docs_before_merge: int = MAX_DOCS_BEFORE_MERGE,
                           min_layer_size: int = MIN_LAYER_SIZE,
                           level_log_size: float = LEVEL_LOG_SIZE,
                           max_rounds: int = 16):
    """Plan-and-merge until the policy finds no candidate (tantivy's
    ``consider_merge_options`` loop after each commit). Every executed
    merge is its own atomic manifest commit (crash-safe: a half-applied
    policy leaves a committed, searchable index). Returns the final
    Manifest."""
    from spyglass_spark.index.builder import merge_generations
    from spyglass_spark.index.manifest import load_manifest

    m = load_manifest(index_dir)
    for _ in range(max_rounds):
        cands = plan_log_merges(m.gen_list(), min_num_segments,
                                max_docs_before_merge, min_layer_size,
                                level_log_size)
        if not cands:
            break
        for gen_ids in cands:
            m = merge_generations(spark, index_dir, gen_ids=gen_ids)
    return m
