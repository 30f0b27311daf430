"""Best-passage highlighting over the positional index (positions.py
best_windows / query.py highlight_topk / positions.snippet_df).

Gates: best_windows == a brute-force scan over ALL anchored windows
(pure Python, no two-pointer); highlight_topk rides topk bitwise and
each window starts at an actual hit; parts_column (the JVM snippet
tokenizer) == the pure-Python parts stream on a camelCase corpus;
snippet_df cuts exactly the [win_start, win_start+width) token slice.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.positions import parts_column, snippet_df
from yase_spark.query import IndexReader
from yase_spark.tokenize import _ident, analyze_phrase, split_parts

from test_positions import parts_stream  # noqa: F401


def brute_best_window(text: str, terms: list[str], width: int):
    """All anchored windows, max distinct terms, smallest start."""
    stream = parts_stream(text)
    tset = set(terms)
    hits = [(i, t) for i, t in enumerate(stream) if t in tset]
    if not hits:
        return None
    best = (-1, -1)
    for s, _ in hits:
        n = len({t for i, t in hits if s <= i < s + width})
        if n > best[0]:
            best = (n, s)
    return (best[1], best[0])


QUERIES = [
    (["get", "page"], 6),
    (["json", "exec", "sync"], 10),
    (["copy", "zone", "lock"], 4),
    (["get"], 3),
]


def test_best_windows_match_brute_force(spark, pos_index, doc_texts):
    from yase_spark.positions import PositionsReader

    root, cfg = pos_index
    pr = PositionsReader(spark, root, cfg)
    checked = 0
    for terms, width in QUERIES:
        # candidate docs: any doc containing at least one term
        cand = [
            d for d, text in doc_texts.items()
            if any(t in parts_stream(text) for t in terms)
        ][:40]
        got = pr.best_windows(terms, cand, width=width)
        assert sorted(got) == sorted(cand)
        for d in cand:
            ref = brute_best_window(doc_texts[d], terms, width)
            assert got[d] == ref, (terms, width, d)
            checked += 1
    assert checked > 60


def test_highlight_topk_rides_topk(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    q = "get page"
    plain = rd.topk(q, 10)
    got = rd.highlight_topk(q, k=10, width=8)
    assert [(r, d, s) for r, d, s, _, _ in got] == plain  # bitwise ride
    parts = set(analyze_phrase(q))
    for _, d, _, ws, nh in got:
        stream = parts_stream(doc_texts[d])
        assert stream[ws] in parts          # window anchored at a hit
        assert nh == len(parts & set(stream[ws:ws + 8]))


def test_parts_column_parity(spark, tiny_corpus):
    """The JVM regexp chain must produce the exact parts stream the
    positional build kernel indexed (camelCase + underscores live in
    the synth corpus)."""
    rows = (
        tiny_corpus.limit(30)
        .select("content", parts_column(F.col("content")).alias("parts"))
        .collect()
    )
    assert any("_" in r["content"] or r["content"].lower() != r["content"]
               for r in rows)  # corpus actually exercises the splits
    for r in rows:
        assert list(r["parts"]) == parts_stream(r["content"])


def test_snippet_df_cuts_window(spark, tiny_corpus, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    got = rd.highlight_topk("get page", k=5, width=8)
    wins = spark.createDataFrame(
        [(d, ws) for _, d, _, ws, _ in got], schema="doc_id long, win_start long"
    )
    snips = {
        r["doc_id"]: r["snippet"]
        for r in snippet_df(
            wins, rd.cat.read(spark, "docs"), tiny_corpus, width=8
        ).collect()
    }
    assert sorted(snips) == sorted(d for _, d, _, _, _ in got)
    for _, d, _, ws, _ in got:
        expect = " ".join(parts_stream(doc_texts[d])[ws:ws + 8])
        assert snips[d] == expect
