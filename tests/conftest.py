import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from spyglass_spark.session import get_spark

    s = get_spark("spyglass-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    from spyglass_spark.testing import synth_corpus

    return synth_corpus(n_docs=200, seed=42)


@pytest.fixture(scope="session")
def built_index(spark, corpus_rows, tmp_path_factory):
    """Spark index over the synthetic corpus + matching oracle index."""
    from spyglass_spark.index.builder import build_index
    from spyglass_spark.oracle.engine import OracleIndex
    from spyglass_spark.testing import corpus_to_documents

    docs, tags_dim = corpus_to_documents(corpus_rows)
    P = 8
    index_dir = str(tmp_path_factory.mktemp("index"))
    sdf = spark.createDataFrame(docs)
    manifest = build_index(spark, sdf, index_dir, num_partitions=P, waves=2)
    oracle = OracleIndex.build(docs, num_partitions=P)
    return dict(index_dir=index_dir, manifest=manifest, oracle=oracle,
                docs=docs, tags_dim=tags_dim, P=P)
