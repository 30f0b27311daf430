"""Mixture-operator gates — yase_spark.mixing.

The replays recompute everything from scratch in Python, including the
60-bit md5 Bernoulli key (hashlib) — so the keep/drop sets and shard
layouts are checked EXACTLY, not statistically.
"""

import hashlib
import math
import re

import pytest

from yase_spark.mixing import domain_weights, mix_sample, shuffle_export

SPLIT = "[^a-z0-9_]+"

DOCS = [
    # domain a: 2 docs, 8 tokens; domain b: 1 doc, 2 tokens
    (1, "a", "one two three four"),
    (2, "a", "five six seven eight"),
    (3, "b", "nine ten"),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(t: str) -> int:
    return len([w for w in re.split(SPLIT, t.lower()) if w])


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "source", "text"])


def test_weights_closed_form(docs):
    rows = {
        r["domain"]: r for r in domain_weights(docs, alpha=0.5).collect()
    }
    pa, pb = 8 / 10, 2 / 10
    den = math.sqrt(pa) + math.sqrt(pb)
    assert rows["a"]["n_docs"] == 2 and rows["a"]["n_tokens"] == 8
    assert rows["a"]["share_r"] == round(pa, 6)
    assert rows["a"]["weight_r"] == round(math.sqrt(pa) / den, 6)
    assert rows["b"]["weight_r"] == round(math.sqrt(pb) / den, 6)


def test_alpha_one_is_proportional(docs):
    rows = domain_weights(docs, alpha=1.0).collect()
    for r in rows:
        assert r["weight_r"] == r["share_r"]
    assert round(sum(r["weight_r"] for r in rows), 5) == 1.0


def test_alpha_range_enforced(docs):
    for bad in (0.0, -1.0, 1.5):
        with pytest.raises(ValueError):
            domain_weights(docs, alpha=bad)
    with pytest.raises(ValueError):
        mix_sample(docs, 0)
    with pytest.raises(ValueError):
        shuffle_export(docs, 0)


def _py_mix(budget, alpha=0.5):
    per = {}
    for doc_id, dom, text in DOCS:
        per.setdefault(dom, []).append((doc_id, _toks(text)))
    tot = sum(n for v in per.values() for _, n in v)
    pw = {d: (sum(n for _, n in v) / tot) ** alpha for d, v in per.items()}
    den = sum(pw.values())
    kept = set()
    for d, v in per.items():
        nd = sum(n for _, n in v)
        rate = min(1.0, budget * (pw[d] / den) / nd)
        for doc_id, _ in v:
            if _h60(f"mx{doc_id}") < rate * float(1 << 60):
                kept.add(doc_id)
    return kept


@pytest.mark.parametrize("budget", [3, 6, 100])
def test_mix_sample_exact_replay(docs, budget):
    got = {r["doc_id"] for r in mix_sample(docs, budget).collect()}
    assert got == _py_mix(budget)


def test_budget_monotone_and_cap(docs):
    small = {r["doc_id"] for r in mix_sample(docs, 4).collect()}
    big = {r["doc_id"] for r in mix_sample(docs, 10**6).collect()}
    assert small <= big
    assert big == {1, 2, 3}  # rate capped at 1 keeps everything


def test_shuffle_export_exact_replay(docs):
    got = sorted(
        (r["shard"], r["pos"], r["doc_id"])
        for r in shuffle_export(docs, 2).collect()
    )
    by_shard = {}
    for doc_id, _, _ in DOCS:
        h = _h60(f"sh{doc_id}")
        by_shard.setdefault(h % 2, []).append((h, doc_id))
    want = sorted(
        (s, pos, doc_id)
        for s, v in by_shard.items()
        for pos, (_, doc_id) in enumerate(sorted(v), start=1)
    )
    assert got == want


def test_mix_sample_broadcasts_rates(docs):
    plan = (
        mix_sample(docs, 10)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
