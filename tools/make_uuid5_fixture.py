"""Generate fixtures/uuid5_urls.parquet: (url, doc_id=UUIDv5(SPYGLASS_NS, url))
for every corpus url derivable from the driver testdata (all sf dirs, r=0).

UUIDv5 is a pure function of the url (SHA-1 based — DuckDB 1.0 has no sha1,
so the oracle can't compute it inline); precomputing it into a parquet
fixture the DuckDB oracle joins by url turns doc_ids_uuid5 from a rows-only
check into an exact value-hash check. Regenerate with:

    python tools/make_uuid5_fixture.py
"""
import hashlib
import os
import sys
import uuid

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spyglass_spark.corpus import LANG_TO_EXT, SPYGLASS_NS  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "uuid5_urls.parquet")


def corpus_urls(sf_dir: str) -> list[str]:
    rows = duckdb.sql(
        f"SELECT doc_id, source, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    urls = []
    for doc_id, source, lang in rows:
        ext = LANG_TO_EXT.get(lang, "txt")
        path = f"src/{source}/file_{doc_id}_0.{ext}"
        commit = hashlib.sha256(f"{doc_id}:0".encode()).hexdigest()[:40]
        urls.append(f"repo://{source}/{path}@{commit}")
    return urls


def main() -> None:
    urls = set()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if os.path.exists(f"{d}/documents.parquet"):
            urls.update(corpus_urls(d))
    rows = sorted(urls)
    tbl = pa.table({
        "url": rows,
        "doc_id": [str(uuid.uuid5(SPYGLASS_NS, u)) for u in rows],
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {len(rows)} rows to {OUT}")


if __name__ == "__main__":
    main()
