"""Trigram grep gates (yase_spark/grep.py).

The load-bearing property is PREFILTER SOUNDNESS: intersecting the
required trigrams' posting lists must never drop a document the real
matcher would accept. The parity tests compare the prefiltered engine
result against the engine's OWN full-scan path (identical verify
expression, so any difference is a prefilter bug, not a regex-engine
semantics difference), including a hypothesis sweep over generated
patterns.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from yase_spark.grep import (
    GrepReader,
    build_trigrams,
    factor_trigrams,
    literal_factors,
)


@pytest.fixture(scope="session")
def grep_index(spark, tiny_corpus, tiny_index):
    """Trigram sibling index over the shared 1000-doc fixture (session
    scope: build_trigrams is incremental, a rebuild on the same root is
    a noop — same sharing rationale as pos_index)."""
    from yase_spark.config import IndexConfig

    root, cfg, _ = tiny_index
    gcfg = IndexConfig(**{**cfg.__dict__, "pos_row_docs": 256})
    summary = build_trigrams(spark, root, tiny_corpus, gcfg)
    assert summary["trigram_docs"] == 1000
    assert summary["trigram_rows"] > 0
    return root, gcfg


@pytest.fixture(scope="module")
def rd(spark, tiny_corpus, grep_index):
    root, gcfg = grep_index
    return GrepReader(spark, root, tiny_corpus, gcfg)


# ------------------------------------------------------ factor analysis
def test_literal_factors_basics():
    assert literal_factors("getUserName") == ["getUserName"]
    assert literal_factors("get.*Name") == ["get", "Name"]
    assert literal_factors("colou?r") == ["colo", "r"]
    # '+' keeps the char but breaks adjacency after it
    assert literal_factors("ab+c") == ["ab", "c"]
    # optional group contributes nothing; required tail stays
    assert literal_factors("(abc)?def") == ["def"]
    # '+'-quantified group is required
    assert literal_factors("(abc)+def") == ["abc", "def"]
    # top-level alternation: nothing is individually required
    assert literal_factors("foo|bar") == []
    # alternation inside a group poisons only that group
    assert literal_factors("pre(foo|bar)post") == ["pre", "post"]
    # classes, dots, anchors, escapes all break runs
    assert literal_factors("^cus[a-z]*mer query$") == ["cus", "mer query"]
    assert literal_factors(r"foo\.bar") == ["foo", "bar"]
    assert literal_factors("a{2,3}bcd") == ["bcd"]
    assert literal_factors("(?:abc)def") == ["abc", "def"]
    assert literal_factors("(?=abc)def") == ["def"]
    # lazy quantifiers
    assert literal_factors("abc.*?def") == ["abc", "def"]


def test_factor_trigrams_packing():
    got = factor_trigrams(["AbCd"])  # lowercased before packing
    b = b"abcd"
    want = {
        (b[i] << 16) | (b[i + 1] << 8) | b[i + 2] for i in range(2)
    }
    assert got == want
    assert factor_trigrams(["ab"]) == set()  # too short
    assert factor_trigrams(["cafés"]) == set()  # non-ASCII dropped


# ------------------------------------------------------------- parity
def _ids(df):
    return [r["doc_id"] for r in df.select("doc_id").collect()]


@pytest.mark.parametrize(
    "pattern,cs",
    [
        ("getPage", False),
        ("getpage", True),
        ("sync_list", False),
        ("json", True),
        ("zz_nonexistent_zz", False),
    ],
)
def test_grep_literal_parity(rd, pattern, cs):
    got = _ids(rd.grep(pattern, case_sensitive=cs))
    want = _ids(rd.grep(pattern, case_sensitive=cs, _force_full_scan=True))
    assert got == want
    assert got == sorted(got)


@pytest.mark.parametrize(
    "pattern,cs",
    [
        (r"get[A-Za-z]*Page", True),
        (r"sync_\w+", False),
        (r"json.*getPage", False),
        (r"(getPage|syncList)", False),
        (r"def [a-z_]+\(", True),
    ],
)
def test_grep_regex_parity(rd, pattern, cs):
    got = _ids(rd.grep(pattern, regex=True, case_sensitive=cs))
    want = _ids(
        rd.grep(pattern, regex=True, case_sensitive=cs, _force_full_scan=True)
    )
    assert got == want


_ATOM = st.sampled_from(
    ["json", "get", "page", "sync", "list", "user", "name", "a", "x_"]
)
_GLUE = st.sampled_from(["", ".", ".*", "[a-z]", "\\w", "?", "+", "*"])


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_ATOM, _GLUE), min_size=1, max_size=3))
def test_grep_random_pattern_soundness(rd, pieces):
    """Prefiltered result == full-scan result for generated patterns —
    the pattern is built from literal atoms interleaved with regex glue
    (including quantifiers that make preceding atoms optional)."""
    pattern = "".join(a + g for a, g in pieces)
    got = _ids(rd.grep(pattern, regex=True))
    want = _ids(rd.grep(pattern, regex=True, _force_full_scan=True))
    assert got == want, pattern


# ------------------------------------------------------------- pruning
def test_candidates_prune_and_cover(rd, spark):
    """For a selective literal the candidate set must be well under the
    corpus AND a superset of the true matches."""
    tris = factor_trigrams(["getpage"])
    cand = rd.candidates(tris)
    assert cand is not None and 0 < cand.size < 1000
    truth = set(_ids(rd.grep("getPage", _force_full_scan=True)))
    assert truth <= set(cand.tolist())


def test_fetch_plan_prunes_buckets(rd):
    """The trigram fetch must reach the parquet scan as bucket partition
    pruning + tri predicate (same plan gate as the term fetch)."""
    from pyspark.sql import functions as F

    tris = sorted(factor_trigrams(["getpage"]))
    bs = sorted({t % rd.cfg.term_buckets for t in tris})
    plan = (
        rd._segments.filter(F.col("bucket").isin(bs) & F.col("tri").isin(tris))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "bucket" in plan


def test_short_literal_full_scan_fallback(rd):
    """A sub-3-byte literal has no trigram and must still answer
    correctly through the full-scan path."""
    got = _ids(rd.grep("ab"))
    want = _ids(rd.grep("ab", _force_full_scan=True))
    assert got == want


def test_no_factor_regex_full_scan(rd):
    got = _ids(rd.grep("a|b", regex=True))
    want = _ids(rd.grep("a|b", regex=True, _force_full_scan=True))
    assert got == want


def test_grep_topk_matches_manual_compose(rd, spark, grep_index):
    """grep_topk == (grep match set) ∩-scored by the ordinary ranked
    path: every returned doc matches the pattern, scores equal the
    engine's own topk scores for those docs, order is (score DESC,
    doc_id ASC)."""
    from yase_spark.query import IndexReader

    root, gcfg = grep_index
    ir = IndexReader(spark, root)
    rows = rd.grep_topk(ir, "getPage", "json getPage", k=5)
    assert rows and [r for r, _, _ in rows] == list(range(1, len(rows) + 1))
    match_set = set(_ids(rd.grep("getPage")))
    assert {d for _, d, _ in rows} <= match_set
    # scores must agree with rank_doc_set over the full match set
    manual = ir.rank_doc_set(
        np.array(sorted(match_set), dtype=np.int64), "json getPage", 5
    )
    assert rows == manual
    scores = [s for _, _, s in rows]
    assert scores == sorted(scores, reverse=True)


# ----------------------------------------------------------- lifecycle
def test_stale_after_docs_change(spark, tiny_corpus, grep_index, tmp_path):
    """A docs-table rewrite (compaction renumbering) must invalidate the
    trigram index loudly, never silently serve wrong candidates."""
    import shutil

    from yase_spark.catalog import Catalog

    root, gcfg = grep_index
    clone = str(tmp_path / "idx")
    shutil.copytree(root, clone)
    cat = Catalog(clone)
    docs = cat.read(spark, "docs")
    cat.write("docs", docs, mode="overwrite", tag={"unit": "touch"})
    with pytest.raises(ValueError, match="stale"):
        GrepReader(spark, clone, tiny_corpus, gcfg)


def test_incremental_append(spark, tmp_path):
    """build(half) -> trigrams -> append(half) -> trigrams again: the
    second build must only scan the delta (cost ∝ delta), append new
    generation rows without touching old ones, and serve identically to
    the full-scan path over the whole corpus."""
    from pyspark.sql import functions as F

    from yase_spark.config import IndexConfig
    from yase_spark.index import IndexBuilder, build_index
    from yase_spark.synth import corpus_df

    corpus = corpus_df(spark, 300, partitions=4)
    half = F.pmod(F.xxhash64("path"), F.lit(2)) == 0
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    build_index(spark, corpus.filter(half), root, cfg)
    s1 = build_trigrams(spark, root, corpus.filter(half), cfg)
    IndexBuilder(spark, root, cfg).append(corpus.filter(~half))
    s2 = build_trigrams(spark, root, corpus, cfg)
    assert not s2["noop"]
    assert s1["trigram_docs"] + s2["trigram_docs"] == 300
    rd = GrepReader(spark, root, corpus, cfg)
    got = _ids(rd.grep("getPage"))
    want = _ids(rd.grep("getPage", _force_full_scan=True))
    assert got == want and len(got) > 0
    # a third run with the same corpus is a noop
    assert build_trigrams(spark, root, corpus, cfg)["noop"]


def test_compaction_rewrites_trigrams(spark, tmp_path):
    """apply_deletes must rewrite the trigram sibling (drop deleted
    docs, renumber survivors) so grep stays valid — and must serve
    identically to the full-scan path over the compacted docs table."""
    from pyspark.sql import functions as F

    from yase_spark.config import IndexConfig
    from yase_spark.index import IndexBuilder, build_index
    from yase_spark.synth import corpus_df

    corpus = corpus_df(spark, 300, partitions=4)
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    build_index(spark, corpus, root, cfg)
    build_trigrams(spark, root, corpus, cfg)
    b = IndexBuilder(spark, root, cfg)
    assert b.delete(predicate="pmod(doc_id, 5) = 2")["tombstoned"] > 0
    b.apply_deletes()
    rd = GrepReader(spark, root, corpus, cfg)  # must not raise stale
    got = _ids(rd.grep("getPage"))
    want = _ids(rd.grep("getPage", _force_full_scan=True))
    assert got == want and len(got) > 0
    assert max(got) <= 240  # ids renumbered densely below the new count


def test_deleted_mask(rd, spark, tiny_corpus, grep_index):
    """Tombstoned docs must disappear from both the prefiltered and the
    full-scan lanes."""
    root, gcfg = grep_index
    truth = _ids(rd.grep("getPage"))
    assert len(truth) >= 2
    dels = np.array(truth[:2], dtype=np.int64)
    rd2 = GrepReader(spark, root, tiny_corpus, gcfg, deleted=dels)
    got = _ids(rd2.grep("getPage"))
    got_full = _ids(rd2.grep("getPage", _force_full_scan=True))
    assert got == [d for d in truth if d not in set(dels.tolist())]
    assert got_full == got
