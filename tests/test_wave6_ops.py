"""Round-5 sixth-wave gates: deterministic split assignment and
dup-cluster representative selection by quality.

Driver oracles: split_counts / dup_keep_best in __spark_entry__.
"""

import pytest
from pyspark.sql import functions as F

from yase_spark.mixing import split_assign, split_counts, split_thresholds
from yase_spark.neardup import dup_keep_best


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i}", "en", "s0", 100 + i) for i in range(1, 101)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).persist()


def test_split_partitions_and_is_deterministic(docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_assign(docs, fr).select("doc_id", "split").collect()
    b = split_assign(docs, fr).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assigned = {r["doc_id"]: r["split"] for r in a}
    assert set(assigned) == set(range(1, 101))
    assert set(assigned.values()) <= {"train", "val", "test"}
    # counts readout sums to the corpus
    c = split_counts(docs, fr).collect()
    assert sum(r["n_docs"] for r in c) == 100
    assert sum(r["n_chars_sum"] for r in c) == sum(100 + i for i in range(1, 101))


def test_split_salt_rerolls_membership(docs):
    fr = {"train": 0.5, "test": 0.5}
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, fr, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs, fr, salt="s2").collect()}
    assert a != b  # 2^-100 false-failure probability


def test_split_thresholds_use_accumulated_floats():
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    th = split_thresholds(fr)
    assert [n for n, _ in th] == ["train", "val"]
    assert th[0][1] == int(0.9 * (1 << 60))
    # the accumulated 0.9 + 0.05 (not the literal 0.95)
    assert th[1][1] == int((0.9 + 0.05) * (1 << 60))


def test_split_validation(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="positive"):
        split_assign(docs, {"a": 1.2, "b": -0.2})
    with pytest.raises(ValueError, match="non-empty"):
        split_assign(docs, {})


def test_dup_keep_best_policy(spark):
    all_docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # clusters: {1,2,3} (chain), {4,5}; 6 singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (6, 1)], "doc_id long, q long"
    )  # doc 5 has NO quality row
    out = {r["doc_id"]: r for r in dup_keep_best(all_docs, pairs, quality).collect()}
    # cluster {1,2,3}: q ties 99/99 between 2 and 3 -> lower doc_id (2)
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    # cluster {4,5}: 5 has NULL q -> never beats scored 4
    assert out[4]["keep"] and not out[5]["keep"]
    assert out[5]["q"] is None
    # singleton keeps itself
    assert out[6]["keep"]
    # exactly one keeper per cluster
    keeps = {}
    for r in out.values():
        keeps.setdefault(r["cluster_id"], 0)
        keeps[r["cluster_id"]] += int(r["keep"])
    assert set(keeps.values()) == {1}
