"""Declared per-field analysis chains (analysis.py + the build/query
plumbing): the three chain implementations (driver chain_terms, Catalyst
chain_tokens_sql, the fused kernel's dictionary-level application) are
one spec; a chained index equals an unchained index over pre-chained
content bitwise; query-side parity is structural (reader adopts the
chain from catalog properties); the fields surface analyzes per field;
positions refuse chained indexes loudly."""

import random

import pytest
from pyspark.sql import functions as F

from yase_spark.analysis import (
    AnalyzerChain,
    chain_from_config,
    chain_terms,
    chain_tokens_sql,
    s_stem_col,
)
from yase_spark.config import IndexConfig
from yase_spark.expand import s_stem
from yase_spark.index import build_index
from yase_spark.query import IndexReader

STOPS = ("the", "of", "and", "to")
CHAIN = AnalyzerChain(stop_words=frozenset(STOPS), stem=True)
SCHEMA = "repo string, path string, commit string, lang string, content string"

# plain lowercase words only: the code tokenizer's parts stream is then
# exactly the whitespace split (no multipart identifiers -> no extra
# full/bigram tokens), which makes content-level pre-chaining an exact
# oracle for the in-kernel chain
DOCS = [
    "the tables of values and the indexes",
    "table value index to query",
    "queries and tables the engines use",
    "engine uses caches to cache misses",
    "misses of the caches and queries",
    "status pass passes classes class",
    "berries cherries goes oes aes trees",
]


def _words(s):
    return s.split()


def _chained_content(s):
    return " ".join(
        s_stem(w) for w in _words(s) if w not in CHAIN.stop_words
    )


def _corpus(spark, texts):
    return spark.createDataFrame(
        [("r", f"{i:04d}", "c", "py", t) for i, t in enumerate(texts)],
        schema=SCHEMA,
    )


# ------------------------------------------------ spec-parity properties
def test_s_stem_col_matches_driver_s_stem(spark):
    rng = random.Random(7)
    suffixes = ["ies", "es", "s", "us", "ss", "aes", "ees", "oes",
                "eies", "aies", "y", ""]
    words = [
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 6)))
        + rng.choice(suffixes)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [r["s"] for r in df.select(s_stem_col(F.col("w")).alias("s")).collect()]
    assert got == [s_stem(w) for w in words]


def test_chain_terms_matches_chain_tokens_sql(spark):
    rng = random.Random(11)
    vocab = ["the", "tables", "to", "index", "misses", "caches", "us",
             "classes", "berries", "of", "go", "goes"]
    rows = [
        [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        for _ in range(100)
    ]
    df = spark.createDataFrame([(r,) for r in rows], "toks array<string>")
    got = [
        r["out"]
        for r in df.select(
            chain_tokens_sql(F.col("toks"), CHAIN).alias("out")
        ).collect()
    ]
    assert got == [chain_terms(r, CHAIN) for r in rows]


def test_fused_kernel_chain_matches_driver_chain():
    # the dictionary-level application inside tokenize_count_arrow is
    # the third impl of the same spec: multiset of (doc, term, tf) and
    # doc_lens must equal the token-level driver chain
    import numpy as np
    import pandas as pd

    from yase_spark.tokenize import tokenize_count_arrow, tokenize_text

    di, codes, tfs, dic, dlens = tokenize_count_arrow(
        pd.Series(DOCS), ngrams=False, chain=CHAIN
    )
    dic_py = dic.to_pylist()
    got = sorted(
        (int(d), dic_py[int(c)], int(t)) for d, c, t in zip(di, codes, tfs)
    )
    want = []
    want_lens = []
    for d, text in enumerate(DOCS):
        toks = chain_terms(tokenize_text(text, ngrams=False), CHAIN)
        want_lens.append(len(toks))
        cnt = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        want.extend((d, t, n) for t, n in cnt.items())
    assert got == sorted(want)
    assert dlens.tolist() == want_lens
    assert np.all(dlens >= 0)


# ------------------------------------------------ end-to-end equivalence
@pytest.fixture(scope="module")
def chained_pair(spark, tmp_path_factory):
    """Index A: raw corpus built WITH the chain. Index B: pre-chained
    content built WITHOUT. One spec -> same index."""
    cfg_a = IndexConfig(
        build_groups=2, shuffle_partitions=4, ngrams=False,
        stop_words=" ".join(STOPS), stem_tokens=True,
    )
    cfg_b = IndexConfig(build_groups=2, shuffle_partitions=4, ngrams=False)
    ra = str(tmp_path_factory.mktemp("chain_a"))
    rb = str(tmp_path_factory.mktemp("chain_b"))
    build_index(spark, _corpus(spark, DOCS), ra, cfg_a)
    build_index(
        spark, _corpus(spark, [_chained_content(t) for t in DOCS]), rb, cfg_b
    )
    return (ra, cfg_a), (rb, cfg_b)


def test_chained_build_equals_prechained_content(spark, chained_pair):
    (ra, cfg_a), (rb, cfg_b) = chained_pair
    a, b = IndexReader(spark, ra, cfg_a), IndexReader(spark, rb, cfg_b)
    # identical corpus stats (stopword tf excluded from doc_len)
    assert a.n_docs == b.n_docs and a.avgdl == b.avgdl
    # identical vocabulary: no stopwords, stems only
    va = {r["term"] for r in a.cat.read(spark, "segments").select("term").collect()}
    vb = {r["term"] for r in b.cat.read(spark, "segments").select("term").collect()}
    assert va == vb
    assert not (va & set(STOPS))
    assert all(t == s_stem(t) for t in va)
    # surface-form queries through A == pre-chained queries through B,
    # scores bitwise (the B query is the chain's own output, e.g.
    # 'indexes' -> 'indexe' under the S-stemmer's plain-es rule)
    for q in (
        "tables",
        "the queries of indexes",
        "caches misses",
        "berries trees",
    ):
        qb = " ".join(chain_terms(q.split(), CHAIN))
        assert a.topk(q, 5) == b.topk(qb, 5), q
    # a query that is ALL stopwords matches nothing
    assert a.topk("the of and", 5) == []


def test_reader_adopts_chain_and_mismatch_is_loud(spark, chained_pair):
    (ra, cfg_a), _ = chained_pair
    # a fresh reader with no cfg adopts the persisted chain
    rd = IndexReader(spark, ra)
    assert rd.chain == chain_from_config(cfg_a)
    assert rd._analyze("the tables") == ["table"]
    # a mismatched chain is a semantic-config error like k1/b
    with pytest.raises(ValueError, match="mismatch"):
        IndexReader(
            spark, ra,
            IndexConfig(build_groups=2, shuffle_partitions=4, ngrams=False),
        )


def test_chained_append_equals_oneshot(spark, tmp_path):
    cfg = IndexConfig(
        build_groups=2, shuffle_partitions=4, ngrams=False,
        stop_words=" ".join(STOPS), stem_tokens=True,
    )
    from yase_spark.index import IndexBuilder

    r1 = str(tmp_path / "grow")
    r2 = str(tmp_path / "oneshot")
    build_index(spark, _corpus(spark, DOCS[:4]), r1, cfg)
    extra = spark.createDataFrame(
        [("r", f"{i + 100:04d}", "c", "py", t)
         for i, t in enumerate(DOCS[4:])],
        schema=SCHEMA,
    )
    IndexBuilder(spark, r1, cfg).append(extra)
    both = _corpus(spark, DOCS[:4]).unionByName(extra)
    build_index(spark, both, r2, cfg)
    a, b = IndexReader(spark, r1, cfg), IndexReader(spark, r2, cfg)
    assert a.n_docs == b.n_docs and a.avgdl == b.avgdl
    for q in ("tables queries", "caches", "berries"):
        assert a.topk(q, 5) == b.topk(q, 5), q


def test_positions_refuse_chained_index(spark, chained_pair):
    from yase_spark.positions import build_positions

    (ra, cfg_a), _ = chained_pair
    with pytest.raises(ValueError, match="analysis chains"):
        build_positions(spark, ra, _corpus(spark, DOCS), cfg_a)


def test_fields_surface_analyzes_per_field(spark, chained_pair):
    """One chained + one unchained field over the same rows: the
    surface-form query stems for the chained field only, and the blend
    equals the hand-built sum of each field's own lane."""
    from yase_spark.fields import fields_cross_topk, fields_topk

    (ra, cfg_a), (rb, cfg_b) = chained_pair
    a, b = IndexReader(spark, ra, cfg_a), IndexReader(spark, rb, cfg_b)
    got = {
        r["doc_id"]: r["score"]
        for r in fields_topk([(a, 1.0), (b, 2.0)], "tables", k=10).collect()
    }
    sa = {d: s for _r, d, s in a.topk("tables", 10)}     # stems -> table
    sb = {d: s for _r, d, s in b.topk("tables", 10)}     # raw: no match
    assert sb == {}
    want = {d: sa.get(d, 0.0) * 1.0 + sb.get(d, 0.0) * 2.0 for d in sa}
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=0)
    # cross_fields requires one shared chain
    with pytest.raises(ValueError, match="one analysis chain"):
        fields_cross_topk([(a, 1.0), (b, 1.0)], "tables", k=5)
