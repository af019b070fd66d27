"""Hot-term skew handling: a term present in EVERY doc must have its
posting chunks spread across merge output partitions (the part_id in the
repartitionByRange key is the salt), not concentrated on one reducer."""

import pytest

pyspark = pytest.importorskip("pyspark")
from pyspark.sql import functions as F  # noqa: E402


def test_hot_term_chunks_spread_across_merge_partitions(spark, tmp_path):
    import hashlib
    import uuid

    from spyglass_spark.corpus import SPYGLASS_NS
    from spyglass_spark.index.builder import build_index

    # tiny vocabulary so the hot term's chunk rows dominate range buckets —
    # the regime where skew handling matters (a hot term's chunks must
    # straddle merge-partition boundaries instead of landing on one reducer;
    # chunk rows also BOUND the per-row payload to one doc-partition's docs)
    docs = []
    for i in range(800):
        url = f"repo://skew/src/f{i}.rs@{'0' * 40}"
        content = f"fn main import unique{i} " + ("fn " * (i % 3 + 1))
        docs.append(dict(doc_id=str(uuid.uuid5(SPYGLASS_NS, url)), url=url,
                         domain="skew", title=f"f{i}.rs", content=content,
                         tags=[1],
                         content_sha256=hashlib.sha256(content.encode()).hexdigest()))
    idx = str(tmp_path / "skewidx")
    m = build_index(spark, spark.createDataFrame(docs), idx,
                    num_partitions=128, waves=1, merge_partitions=64)
    # 'fn' appears in every doc → df = 800 split into 128 bounded chunks
    assert m.metrics["term_df_skew_ratio"] > 2

    from spyglass_spark.index.builder import KIND_POSTING, read_store

    post = (read_store(spark, idx).filter(F.col("kind") == KIND_POSTING)
            .filter((F.col("field") == "content") & (F.col("term") == "fn"))
            .select(F.input_file_name().alias("f"), "part_id", "df_part"))
    rows = post.collect()
    assert sum(r["df_part"] for r in rows) == 800
    assert len(rows) >= 64  # chunked: no single monolithic posting row
    files = {r["f"] for r in rows}
    # the hot term's 16 chunks land in multiple output files, not one
    assert len(files) > 1, f"hot term concentrated in a single file: {files}"
