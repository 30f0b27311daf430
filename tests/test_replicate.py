"""Cross-cluster replication (replicate.py): follower tails leader by
manifest diff + verified file copy.

Gates: bootstrap parity (every query identical on the replica);
incremental follow copies ONLY the delta (new_versions == the appends,
prior data dirs not re-copied); idempotent no-op; divergence refused;
time travel works on the replica; a vacuumed leader replicates its
live snapshot; the replica is append-able AFTER promotion but a
diverged ex-follower can never follow again.
"""

import os

import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder
from yase_spark.query import IndexReader
from yase_spark.replicate import follow

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _corpus(spark, n0, n1):
    rows = [
        ("r", f"{i:04d}", "c", "py",
         f"alpha{i % 7} merge table scan beta{i % 3}")
        for i in range(n0, n1)
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def leader(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ccr") / "leader")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    IndexBuilder(spark, root, cfg).build(_corpus(spark, 0, 120))
    return root, cfg


def test_bootstrap_and_incremental(spark, leader, tmp_path_factory):
    root, cfg = leader
    frot = str(tmp_path_factory.mktemp("ccr_f") / "follower")
    s1 = follow(root, frot)
    assert all(t["new_versions"] >= 1 for t in s1["tables"].values())
    rl, rf = IndexReader(spark, root, cfg), IndexReader(spark, frot, cfg)
    for q in ("merge table", "alpha3 beta1", "scan"):
        assert rf.topk(q, 10) == rl.topk(q, 10)
    # versions match table by table
    lc, fc = Catalog(root), Catalog(frot)
    for name in lc.tables():
        assert fc.current_version(name) == lc.current_version(name)

    # idempotent no-op
    s2 = follow(root, frot)
    assert sum(t["new_versions"] for t in s2["tables"].values()) == 0

    # leader appends -> one more follow ships ONLY the delta commits
    IndexBuilder(spark, root, cfg).append(_corpus(spark, 120, 160))
    pre_files = sum(len(fs) for _r, _d, fs in os.walk(frot))
    s3 = follow(root, frot)
    assert s3["tables"]["segments"]["new_versions"] >= 1
    # replica serves the post-append corpus identically
    IndexReader.clear_shared_meta()
    rl2, rf2 = IndexReader(spark, root, cfg), IndexReader(spark, frot, cfg)
    assert rf2.n_docs == rl2.n_docs == 160
    for q in ("merge table", "alpha5 beta2"):
        assert rf2.topk(q, 10) == rl2.topk(q, 10)
    post_files = sum(len(fs) for _r, _d, fs in os.walk(frot))
    # delta-sized: the bootstrap shipped far more files than the append
    assert post_files - pre_files < pre_files

    # time travel on the replica: pre-append segments version readable
    segs_v = Catalog(frot).current_version("segments")
    assert segs_v >= 2
    old = fc.read(spark, "segments", version=segs_v - 1)
    assert old.count() > 0


def test_divergence_refused(spark, leader, tmp_path_factory):
    root, cfg = leader
    frot = str(tmp_path_factory.mktemp("ccr_d") / "follower")
    follow(root, frot)
    # the follower is promoted and independently written to (a fork)
    IndexBuilder(spark, frot, cfg).delete(predicate="path = '0001'")
    # leader also advances so shared-version check sees a mismatch at
    # the follower's head... deletes table exists only on the fork; the
    # segments table is still shared — force a real fork on segments:
    IndexBuilder(spark, frot, cfg).append(_corpus(spark, 500, 510))
    IndexBuilder(spark, root, cfg).append(_corpus(spark, 600, 605))
    with pytest.raises(ValueError, match="diverged|AHEAD"):
        follow(root, frot)


def test_vacuumed_leader_replicates_live_snapshot(spark, tmp_path_factory):
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, hot_term_df=10**9)
    root = str(tmp_path_factory.mktemp("ccr_v") / "leader")
    b = IndexBuilder(spark, root, cfg)
    b.build(_corpus(spark, 0, 40))
    b.append(_corpus(spark, 40, 60))
    b.vacuum(keep_last=1)
    frot = str(tmp_path_factory.mktemp("ccr_v") / "follower")
    follow(root, frot)
    rf = IndexReader(spark, frot, cfg)
    assert rf.n_docs == 60
    rl = IndexReader(spark, root, cfg)
    assert rf.topk("merge table", 10) == rl.topk("merge table", 10)
