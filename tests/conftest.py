import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yase_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # BASELINE.json:14: the verifier runs at N and 4N executors —
    # YASE_TEST_CPUS=8 (default) and =32 select the level.
    cpus = int(os.environ.get("YASE_TEST_CPUS", "8"))
    s = get_spark(cpus=cpus, app="yase-tests", shuffle_partitions=2 * cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    from yase_spark.synth import corpus_df

    return corpus_df(spark, 1000, partitions=8).persist()


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    """Built index over the 1000-doc synthetic corpus, shared by tests."""
    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index

    root = str(tmp_path_factory.mktemp("index"))
    cfg = IndexConfig(build_groups=4, shuffle_partitions=16, hot_term_df=400, salt_shards=4)
    summary = build_index(spark, tiny_corpus, root, cfg)
    return root, cfg, summary


@pytest.fixture(scope="session")
def pos_index(spark, tiny_corpus, tiny_index):
    """Positional sibling index over tiny_index, shared session-wide.

    Session scope matters: build_positions is incremental, so a second
    module-scoped invocation on the same root is a noop — sharing one
    build avoids order-dependent noop/assert races between test modules.
    """
    from yase_spark.config import IndexConfig
    from yase_spark.positions import build_positions

    root, cfg, _ = tiny_index
    # small row cap so hot terms actually chunk into multiple shard rows
    pcfg = IndexConfig(**{**cfg.__dict__, "pos_row_docs": 256})
    summary = build_positions(spark, root, tiny_corpus, pcfg)
    assert summary["positions_docs"] == 1000
    return root, pcfg


@pytest.fixture(scope="session")
def doc_texts(spark, tiny_corpus, pos_index):
    from yase_spark.query import IndexReader

    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    return {
        r["doc_id"]: r["content"]
        for r in rd.cat.read(spark, "docs")
        .join(
            tiny_corpus.select("repo", "path", "commit", "content"),
            ["repo", "path", "commit"],
        )
        .select("doc_id", "content")
        .collect()
    }
