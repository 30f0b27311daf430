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
