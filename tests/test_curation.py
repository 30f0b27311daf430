"""Curation operators (curation.py): decontamination, stratified
sampling, chunking, packing.

Gates:
* decontaminate: a bench doc present in the corpus flags itself; short
  docs (< n tokens) emit n_grams=0/uncontaminated; the bench gram side
  broadcasts (no corpus-wide shuffle).
* stratified_sample: map-only plan (zero exchanges), deterministic
  across runs, rate-1.0 strata keep everything / rate-0.0 keep nothing.
* chunk_docs: non-overlapping chunks reassemble the token stream
  exactly; overlap window math matches a python reference; empty docs
  emit no chunks.
* pack_sequences: bin invariants (fit within max_tokens unless a
  single oversize doc; offsets are prefix sums; bins contiguous) and
  exact agreement with a pure-python next-fit replay; output invariant
  under shuffle-partition count.
"""

import pytest
from pyspark.sql import functions as F

from yase_spark.curation import (
    WORD_RE,
    chunk_docs,
    decontaminate,
    pack_sequences,
    stratified_sample,
)

TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "alpha beta gamma delta epsilon zeta eta theta",  # dup of 0
    "one two three",                                   # < n tokens for n=5
    "",                                                # empty
    "x " * 40,                                         # 40 tokens, repetitive
    "unique words only here never elsewhere in corpus today",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, t, ["en", "de", "fr"][i % 3], f"s{i % 2}", len(t)) for i, t in enumerate(TEXTS)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def toks(t):
    import re

    return re.findall(WORD_RE, t.lower())


# ------------------------------------------------------------ decontaminate
def test_decontaminate_self_and_short(spark, docs):
    bench = docs.filter("doc_id = 0")
    out = {r["doc_id"]: r.asDict() for r in decontaminate(docs, bench, n=5).collect()}
    assert len(out) == len(TEXTS)  # every doc is reported
    assert out[0]["contaminated"] and out[1]["contaminated"]  # self + dup
    assert out[2]["n_grams"] == 0 and not out[2]["contaminated"]  # short
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]  # empty
    assert not out[5]["contaminated"]
    # gram counting is over DISTINCT grams: doc 4 is 'x'*40 -> 1 gram
    assert out[4]["n_grams"] == 1


def test_decontaminate_broadcasts(spark, docs):
    plan = decontaminate(docs, docs.limit(2), n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------- stratified_sample
def test_stratified_sample_rates_and_determinism(spark, docs):
    out1 = stratified_sample(docs, {"en": 1.0, "de": 0.0, "fr": 0.5}).collect()
    out2 = stratified_sample(docs, {"en": 1.0, "de": 0.0, "fr": 0.5}).collect()
    assert sorted(out1) == sorted(out2)
    kept = {r["doc_id"]: r["stratum"] for r in out1}
    en_ids = {r["doc_id"] for r in docs.filter("lang = 'en'").collect()}
    assert en_ids <= set(kept)            # rate 1.0 keeps all
    assert "de" not in kept.values()      # rate 0.0 keeps none


def test_stratified_sample_map_only(spark, docs):
    plan = (
        stratified_sample(docs, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------- chunk_docs
def test_chunks_reassemble(spark, docs):
    out = chunk_docs(docs, chunk=4, stride=4).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(TEXTS):
        ref = toks(t)
        got = by_doc.get(i, [])
        if not ref:
            assert got == []
            continue
        joined = " ".join(c["chunk_text"] for c in got)
        assert joined == " ".join(ref)
        assert sum(c["n_tokens"] for c in got) == len(ref)
        assert all(len(c["chunk_text"].split()) == c["n_tokens"] for c in got)


def test_chunks_overlap_reference(spark, docs):
    chunk, stride = 5, 3
    out = chunk_docs(docs, chunk=chunk, stride=stride).collect()
    got = {(r["doc_id"], r["chunk_id"]): r for r in out}
    for i, t in enumerate(TEXTS):
        ref = toks(t)
        n = len(ref)
        exp = 0 if n == 0 else 1 + (max(n - chunk, 0) + stride - 1) // stride
        ids = [c for (d, c) in got if d == i]
        assert len(ids) == exp, (i, n)
        for c in range(exp):
            want = ref[c * stride : c * stride + chunk]
            assert got[(i, c)]["chunk_text"] == " ".join(want)
            assert got[(i, c)]["n_tokens"] == len(want)


# --------------------------------------------------------- pack_sequences
def _py_pack(items, max_tokens):
    """Reference next-fit over (doc_id, len) sorted by doc_id."""
    res, cur, used = {}, 0, 0
    for d, ln in sorted(items):
        if used > 0 and used + ln > max_tokens:
            cur, used = cur + 1, 0
        res[d] = (cur, used)
        used += ln
    return res


def test_pack_matches_reference_and_invariants(spark):
    import random

    rng = random.Random(7)
    rows = [(i, "w " * rng.randint(0, 30)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = pack_sequences(docs, max_tokens=24, n_groups=4, salt="p0").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert len(out) == 200
    for grp, rs in by_grp.items():
        ref = _py_pack([(r["doc_id"], r["n_tokens"]) for r in rs], 24)
        for r in rs:
            bin_l = r["bin_id"] - grp * (1 << 40)
            assert (bin_l, r["off"]) == ref[r["doc_id"]], r
        # bins are contiguous and fit unless a lone oversize doc
        bins = {}
        for r in rs:
            bins.setdefault(r["bin_id"], []).append(r)
        locals_ = sorted(b - grp * (1 << 40) for b in bins)
        assert locals_ == list(range(len(bins)))
        for members in bins.values():
            total = sum(m["n_tokens"] for m in members)
            assert total <= 24 or len(members) == 1


def test_pack_parallelism_invariance(spark):
    rows = [(i, "t " * (i % 17)) for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, pack_sequences(docs.repartition(2), 24, 4).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), 24, 4).collect()))
    assert a == b


def test_pii_scrub_redacts_and_counts(spark):
    from yase_spark.curation import pii_scrub

    rows = [
        (1, "mail me at jo.doe+x@sub.example.co.uk or call +44 20 7946 0958"),
        (2, "server 192.168.1.250 handled it; ssn 078-05-1120 on file"),
        (3, "nothing sensitive here, just 1.2 version and a-b-c"),
        (4, "two mails a@b.io c.d@e.org and ip 10.0.0.1 10.0.0.2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}

    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["clean_text"] == "mail me at [PII] or call [PII]"
    assert got[2]["n_ipv4"] == 1 and got[2]["n_ssn"] == 1
    assert got[2]["clean_text"] == "server [PII] handled it; ssn [PII] on file"
    # no false positives on version strings / hyphenated words
    assert tuple(got[3])[2:] == (0, 0, 0, 0)
    assert got[3]["clean_text"] == rows[2][1]
    assert got[4]["n_email"] == 2 and got[4]["n_ipv4"] == 2
    assert got[4]["clean_text"] == "two mails [PII] [PII] and ip [PII] [PII]"


def test_pii_scrub_map_only(spark):
    from yase_spark.curation import pii_scrub

    docs = spark.createDataFrame([(1, "x@y.io")], "doc_id bigint, text string")
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
