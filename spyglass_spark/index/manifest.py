"""Index manifest — the commit protocol.

Mirrors the reference's commit/generation model (tantivy writer.commit +
reader reload OnCommit, /root/reference/crates/spyglass-searcher/src/client/local.rs:173-211)
as an atomic write-new-then-rename manifest swap over Parquet segment files,
with build checkpoints (wave progress) for resumability and per-partition
lineage + metrics (docs/sec, postings/sec, skew ratio) per BASELINE.json
north_rule.

Layout under <index_dir>/:
  manifest.json            — committed generation (atomic rename)
  checkpoint.json          — stage-1 wave progress (resume point)
  segments/store/wave=<w>/kind=<k>/ — the single-pass segment store
      kind=0 postings (term-sorted per part) · kind=1 fieldnorms ·
      kind=2 lineage · kind=3 doc_meta · kind=4 date fast fields
  segments/term_stats/     — global (field,term) → df/cf, term-sorted
  tombstones/gen<k>/       — upsert tombstone ordinals (parquet side table)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class Manifest:
    version: int = 1
    num_docs: int = 0  # global, across generations, INCLUDING tombstoned
    num_partitions: int = 0
    waves: int = 1
    field_totals: dict = field(default_factory=dict)  # field -> exact token total
    tombstones: list = field(default_factory=list)  # deleted doc_ids (all copies)
    # upsert-precise ordinal tombstones live in parquet side tables (written
    # by the cluster, never collected to the driver); this lists their
    # directories relative to index_dir
    tombstone_dirs: list = field(default_factory=list)
    generations: list = field(default_factory=list)
    # each generation: {gen, prefix, part_offset, num_partitions, num_docs}
    # streaming: ids of micro-batch epochs already applied — a replayed
    # epoch (crash between manifest commit and stream-checkpoint ack) is
    # skipped instead of re-upserted, so N/df/avgdl never drift
    applied_epochs: list = field(default_factory=list)
    metrics: dict = field(default_factory=dict)
    created_utc: str = ""
    # monotonic commit counter: bumped by EVERY commit_manifest call.
    # Per-worker caches version on this, NOT on created_utc — two commits
    # inside the same wall-clock second (e.g. back-to-back delete_by_urls
    # overwriting the same tombstone dir) must still change the cache key
    # or warmed executors would serve the first commit's cached ordinals.
    commit_seq: int = 0
    committed: bool = False

    def gen_list(self) -> list[dict]:
        if self.generations:
            return self.generations
        return [{"gen": 0, "prefix": "segments", "part_offset": 0,
                 "num_partitions": self.num_partitions, "num_docs": self.num_docs}]

    def next_part_offset(self) -> int:
        return max(g["part_offset"] + g["num_partitions"] for g in self.gen_list())

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        m = cls()
        m.__dict__.update(json.loads(s))
        return m


HISTORY_DIR = "manifest_history"


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def history_path(index_dir: str, seq: int) -> str:
    return os.path.join(index_dir, HISTORY_DIR, f"manifest_{seq:08d}.json")


def list_snapshots(index_dir: str) -> list[int]:
    """Commit seqs with a retained history snapshot, ascending."""
    d = os.path.join(index_dir, HISTORY_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("manifest_") and name.endswith(".json"):
            out.append(int(name[len("manifest_"):-len(".json")]))
    return sorted(out)


def load_manifest(index_dir: str, as_of: int | None = None) -> Manifest | None:
    """Load the current committed manifest, or — with ``as_of`` — the
    immutable snapshot published at that commit_seq (Iceberg-style time
    travel over the index: segment parquet is append-only between
    merges, deletes are logical tombstones, so an old manifest still
    describes a fully readable index state).

    A snapshot whose segment directories were physically reclaimed by a
    later merge/compaction raises FileNotFoundError naming the missing
    prefix — the expire-snapshots semantics of the lakehouse model."""
    if as_of is None:
        p = manifest_path(index_dir)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return Manifest.from_json(f.read())
    p = history_path(index_dir, as_of)
    if not os.path.exists(p):
        avail = list_snapshots(index_dir)
        raise FileNotFoundError(
            f"no manifest snapshot for commit_seq={as_of} in {index_dir} "
            f"(available: {avail or 'none — index predates history'})")
    with open(p) as f:
        m = Manifest.from_json(f.read())
    missing = [g["prefix"] for g in m.gen_list()
               if not os.path.isdir(os.path.join(index_dir, g["prefix"]))]
    if missing:
        raise FileNotFoundError(
            f"snapshot commit_seq={as_of} references segment dirs "
            f"physically reclaimed by a later merge/compaction: {missing}")
    return m


def expire_history(index_dir: str, keep_last: int = 8) -> list[int]:
    """Drop all but the newest ``keep_last`` manifest snapshots (the
    expire_snapshots maintenance step). Returns the expired seqs. Only
    the small JSON pointers are removed — segment data is reclaimed by
    merges/compaction, never by this."""
    seqs = list_snapshots(index_dir)
    expired = seqs[:-keep_last] if keep_last > 0 else seqs
    for s in expired:
        os.unlink(history_path(index_dir, s))
    return expired


def commit_manifest(index_dir: str, manifest: Manifest) -> None:
    """Atomic publish: write manifest.json.tmp then rename (the analog of
    writer.commit(), local.rs:173-177). Every commit also lands an
    immutable per-seq snapshot under manifest_history/ — O(1) small JSON,
    no data copied — enabling as_of reads until expire_history."""
    manifest.committed = True
    manifest.created_utc = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    # monotonic vs whatever is on disk (the in-memory object may be a
    # fresh Manifest that never saw the previous commits)
    prev = load_manifest(index_dir)
    manifest.commit_seq = max(manifest.commit_seq,
                              prev.commit_seq if prev else 0) + 1
    tmp = manifest_path(index_dir) + ".tmp"
    os.makedirs(index_dir, exist_ok=True)
    with open(tmp, "w") as f:
        f.write(manifest.to_json())
    os.replace(tmp, manifest_path(index_dir))
    hist = history_path(index_dir, manifest.commit_seq)
    os.makedirs(os.path.dirname(hist), exist_ok=True)
    with open(hist + ".tmp", "w") as f:
        f.write(manifest.to_json())
    os.replace(hist + ".tmp", hist)


def load_checkpoint(index_dir: str) -> dict:
    p = os.path.join(index_dir, "checkpoint.json")
    if not os.path.exists(p):
        return {"completed_waves": [], "stage1_done": False}
    with open(p) as f:
        return json.load(f)


def save_checkpoint(index_dir: str, ckpt: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "checkpoint.json.tmp")
    with open(tmp, "w") as f:
        json.dump(ckpt, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, "checkpoint.json"))
