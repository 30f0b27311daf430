"""Round-4 sixth block operators: exact duplicated-substring detection
(Lee et al. 2022), CCNet/RefinedWeb line-level boilerplate removal,
the weighted_avg / top_metrics / auto_date_histogram aggregations, the
query-level dis_max and pinned compound queries, and sort +
search_after cursor paging.

Gates: both curation operators are replayed by independent pure-Python
recomputes over planted inputs (duplicated spans / boilerplate lines);
dis_max is replayed from the engine's own per-sub-query rankings with
both degenerate ends (tie=0 pure max, tie=1 summed union) checked;
pinned checks order/exclusion/budget/unknown-id semantics; sort_after
pages must tile the full sorted browse exactly; the histogram ladder
choice is forced both ways.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from yase_spark.aggs import auto_date_histogram, top_metrics, weighted_avg
from yase_spark.curation import line_dedup
from yase_spark.neardup import dup_spans
from yase_spark.query import IndexReader


# ------------------------------------------------- dup_spans (D15)
def _py_dup_spans(texts: dict, k: int, stride: int = 1):
    from collections import Counter

    occ = Counter()
    wins = {}
    for d, t in texts.items():
        ws = []
        for i in range(0, len(t) - k + 1, stride):
            w = t[i : i + k]
            ws.append((i, w))
            occ[w] += 1
        wins[d] = ws
    out = {}
    for d, t in texts.items():
        dups = [(i, w) for i, w in wins[d] if occ[w] >= 2]
        cover = set()
        for i, _ in dups:
            cover.update(range(i, i + k))
        n_wins = len(wins[d])
        out[d] = (
            len(t),
            n_wins,
            len(dups),
            len(cover),
            (len(cover) / len(t)) if len(t) else 0.0,
        )
    return out


def test_dup_spans_python_replay(spark):
    # doc 0 and 1 share a verbatim 30-char paragraph; doc 2 repeats its
    # own phrase internally; doc 3 is novel; doc 4 is shorter than k
    para = "the quick brown fox jumps over"  # 30 chars
    texts = {
        0: "alpha beta " + para + " gamma delta epsilon",
        1: "unrelated prefix text " + para + " and a suffix",
        2: "zz repeat me now repeat me now yy",
        3: "totally novel content with no copies anywhere at all",
        4: "tiny",
    }
    k = 12
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_chars"],
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_chars"],
            round(r["dup_char_frac"], 12),
        )
        for r in dup_spans(docs, k=k).collect()
    }
    want = {
        d: (a, b, c, e, round(f, 12))
        for d, (a, b, c, e, f) in _py_dup_spans(texts, k).items()
    }
    assert got == want
    # the planted paragraph must actually be detected (non-vacuous)
    assert got[0][2] > 0 and got[1][2] > 0
    assert got[2][2] > 0  # intra-doc repeat counts too
    assert got[3][2] == 0 and got[3][3] == 0
    assert got[4] == (4, 0, 0, 0, 0.0)  # shorter than k: all zeros


def test_dup_spans_stride_replay(spark):
    # stride=3: the engine must equal the python replay at the same
    # stride, and the phase-aligned long copy must still be caught
    base = "x" * 5 + "SHARED-SPAN-THAT-IS-LONG-ENOUGH-TO-SURVIVE"
    texts = {0: base + "u1", 1: base + "v2", 2: "no duplicates here at all ok"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_chars"])
        for r in dup_spans(docs, k=10, stride=3).collect()
    }
    want = {
        d: (b, c, e)
        for d, (_, b, c, e, _) in _py_dup_spans(texts, 10, stride=3).items()
    }
    assert got == want
    assert got[0][1] > 0 and got[1][1] > 0


# ------------------------------------------------ line_dedup (D16)
def _py_line_dedup(texts: dict, min_docs: int):
    from collections import defaultdict

    docs_per_line = defaultdict(set)
    for d, t in texts.items():
        for ln in t.split("\n"):
            if ln.strip():
                docs_per_line[ln].add(d)
    boiler = {ln for ln, ds in docs_per_line.items() if len(ds) >= min_docs}
    out = {}
    for d, t in texts.items():
        lines = t.split("\n")
        kept = [ln for ln in lines if not (ln.strip() and ln in boiler)]
        removed = [ln for ln in lines if ln.strip() and ln in boiler]
        out[d] = (
            "\n".join(kept),
            len(lines),
            len(removed),
            sum(len(ln) for ln in removed),
        )
    return out


def test_line_dedup_python_replay(spark):
    header = "=== COPYRIGHT 2026 EXAMPLE CORP ==="
    nav = "home | products | contact"
    texts = {
        0: header + "\nunique first doc line\n\n" + nav,
        1: header + "\nsecond doc body\n" + nav + "\ntrailer one",
        2: header + "\nthird doc body here",
        3: "a fully unique document\nwith its own lines only",
        4: "\n\n",  # blanks only: everything survives
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_lines"],
            r["n_removed"],
            r["removed_chars"],
        )
        for r in line_dedup(docs, min_docs=2).collect()
    }
    assert got == _py_line_dedup(texts, 2)
    # non-vacuous: the header (3 docs) and nav (2 docs) were stripped,
    # blank lines and unique lines survived in order
    assert header not in got[0][0] and nav not in got[0][0]
    assert "unique first doc line" in got[0][0]
    assert got[0][0].count("\n") == 1  # kept: unique line + the blank
    assert got[4] == ("\n\n", 3, 0, 0)


def test_line_dedup_min_docs_threshold(spark):
    texts = {0: "shared\nown0", 1: "shared\nown1", 2: "other\nown2"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    # min_docs=3: nothing qualifies, every doc unchanged
    got = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(docs, min_docs=3).collect()
    }
    assert got == {d: t for d, t in texts.items()}


# ------------------------------------------------------- aggs trio
@pytest.fixture(scope="module")
def wdocs(spark):
    rows = [
        ("en", 100, 1, 10),
        ("en", 200, 3, 11),
        ("en", 300, 1, 12),
        ("zh", 50, 2, 13),
        ("zh", 150, 2, 14),
    ]
    return spark.createDataFrame(
        rows, "lang string, n_chars long, w long, doc_id long"
    )


def test_weighted_avg_hand(wdocs):
    got = {
        r["lang"]: (r["vw_sum"], r["w_sum"], r["wavg"])
        for r in weighted_avg(wdocs, ["lang"], "n_chars", "w").collect()
    }
    # en: (100*1 + 200*3 + 300*1) / (1+3+1) = 1000/5 = 200.0
    # zh: (50*2 + 150*2) / 4 = 400/4 = 100.0
    assert got == {"en": (1000, 5, 200.0), "zh": (400, 4, 100.0)}


def test_weighted_avg_skips_null_values(spark):
    # ES skips a doc missing the VALUE field: its weight must not
    # deflate the average (regression — w_sum used to count it)
    rows = [
        ("en", 100, 1, 1),
        ("en", None, 99, 2),   # null value, huge weight: skipped
        ("en", 300, 1, 3),
        ("zh", 50, None, 4),   # null weight: skipped
        ("zh", 150, 2, 5),
    ]
    d = spark.createDataFrame(
        rows, "lang string, n_chars long, w long, doc_id long"
    )
    got = {
        r["lang"]: (r["vw_sum"], r["w_sum"], r["wavg"])
        for r in weighted_avg(d, ["lang"], "n_chars", "w").collect()
    }
    assert got == {"en": (400, 2, 200.0), "zh": (300, 2, 150.0)}


def test_top_metrics_window_and_ties(spark):
    rows = [
        ("a", 5, 100.0, 1),
        ("a", 9, 200.0, 2),
        ("a", 9, 300.0, 3),  # tie on sort col: doc_id 2 wins
        ("b", 1, 400.0, 4),
    ]
    d = spark.createDataFrame(
        rows, "grp string, sort_v long, metric double, doc_id long"
    )
    got = [
        (r["grp"], r["metric_rank"], r["sort_v"], r["metric"], r["doc_id"])
        for r in top_metrics(
            d, ["grp"], "sort_v", ["metric", "doc_id"], size=1
        ).collect()
    ]
    assert got == [("a", 1, 9, 200.0, 2), ("b", 1, 1, 400.0, 4)]
    got2 = [
        (r["grp"], r["metric_rank"], r["doc_id"])
        for r in top_metrics(
            d, ["grp"], "sort_v", ["doc_id"], size=2
        ).collect()
    ]
    assert got2 == [("a", 1, 2), ("a", 2, 3), ("b", 1, 4)]


def test_auto_date_histogram_ladder(spark):
    base = datetime.datetime(2024, 1, 1)
    # 90 events one minute apart: span 89 min
    rows = [(i, base + datetime.timedelta(minutes=i)) for i in range(90)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    # target 20 -> 60s gives 90 buckets, 300s gives 18 <= 20: pick 300
    out = auto_date_histogram(ev, target_buckets=20).collect()
    assert {r["interval_s"] for r in out} == {300}
    assert sum(r["n"] for r in out) == 90
    assert len(out) == 18
    # generous target: the smallest rung wins
    out2 = auto_date_histogram(ev, target_buckets=1000).collect()
    assert {r["interval_s"] for r in out2} == {60}
    assert len(out2) == 90 and all(r["n"] == 1 for r in out2)
    # impossible target: the largest rung is the fallback
    rows3 = [(i, base + datetime.timedelta(days=i)) for i in range(10)]
    ev3 = spark.createDataFrame(rows3, "event_id long, ts timestamp")
    out3 = auto_date_histogram(ev3, target_buckets=2).collect()
    assert {r["interval_s"] for r in out3} == {86400}


# -------------------------------------------- dis_max / pinned query
def _full_scores(rd, q):
    return {d: s for _, d, s in rd.topk(q, 10**9, use_wand=False)}


def test_dis_max_replay_and_degenerate_ends(spark, tiny_index):
    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    qs = ["json page", "get sync"]
    s0, s1 = _full_scores(rd, qs[0]), _full_scores(rd, qs[1])
    assert s0 and s1, "fixture terms made the test vacuous"

    for tie in (0.0, 0.3, 1.0):
        got = {
            r["doc_id"]: r["score"]
            for r in rd.dis_max_topk(qs, k=10**9, tie_breaker=tie).collect()
        }
        want = {}
        for d in set(s0) | set(s1):
            vals = [s for s in (s0.get(d), s1.get(d)) if s is not None]
            best = max(vals)
            want[d] = best + tie * (sum(vals) - best)
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=1e-9), (tie, d)

    # single sub-query degenerates to the plain ranking
    got1 = {
        r["doc_id"]: r["score"]
        for r in rd.dis_max_topk([qs[0]], k=10**9).collect()
    }
    assert set(got1) == set(s0)
    for d in s0:
        assert got1[d] == pytest.approx(s0[d], abs=1e-9)

    # the k cap returns a global best-3 by (score desc, doc_id asc) —
    # tolerance-aware: near-ulp fused ties may legally order either way
    # between the replay (eager-lane scores) and the contribution lane
    rows = rd.dis_max_topk(qs, k=3, tie_breaker=0.3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    want03 = {}
    for d in set(s0) | set(s1):
        vals = [s for s in (s0.get(d), s1.get(d)) if s is not None]
        best = max(vals)
        want03[d] = best + 0.3 * (sum(vals) - best)
    boundary = sorted(want03.values(), reverse=True)[2]
    for r in rows:
        assert want03[r["doc_id"]] >= boundary - 1e-9


def test_pinned_topk_semantics(spark, tiny_index):
    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json"  # df 996 on the tiny corpus: a few non-matching docs exist
    organic = rd.topk(q, 10)
    assert len(organic) == 10
    # pin two docs: one from mid-ranking, one that does not match at all
    pin_mid = organic[4][1]
    all_match = {d for _, d, _ in rd.topk(q, 10**9, use_wand=False)}
    pin_nomatch = next(
        d for d in range(1, rd.n_docs + 1) if d not in all_match
    )
    rows = rd.pinned_topk([pin_nomatch, pin_mid], q, k=10).collect()
    assert [r["doc_id"] for r in rows[:2]] == [pin_nomatch, pin_mid]
    assert [r["pinned"] for r in rows] == [1, 1] + [0] * 8
    assert [r["rank"] for r in rows] == list(range(1, 11))
    # organic tail: the plain ranking with the pinned doc excluded
    want_tail = [d for _, d, _ in organic if d != pin_mid][:8]
    assert [r["doc_id"] for r in rows[2:]] == want_tail
    # organic scores carried through
    sc = {d: s for _, d, s in organic}
    for r in rows[2:]:
        assert r["score"] == pytest.approx(sc[r["doc_id"]], abs=0)
    # unknown ids are skipped (ES semantics)
    rows2 = rd.pinned_topk([10**9], q, k=5).collect()
    assert [r["pinned"] for r in rows2] == [0] * 5
    assert [r["doc_id"] for r in rows2] == [d for _, d, _ in organic[:5]]
    # regression: unknown ids must be dropped BEFORE the k-truncation —
    # k dead ids up front must not evict a valid pinned id at position
    # k+1 while budget remains (ES pins the survivors up to k)
    dead = [10**9 + i for i in range(3)]
    rows3 = rd.pinned_topk(dead + [pin_mid], q, k=3).collect()
    assert rows3[0]["doc_id"] == pin_mid and rows3[0]["pinned"] == 1
    assert [r["pinned"] for r in rows3] == [1, 0, 0]


# -------------------------------------------- sort + search_after
def test_sort_after_pages_tile(spark, tiny_index):
    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json get"
    full = rd.topk_sort_field(q, "doc_len", k=20, early_terminate=False)
    full_rows = [(r["doc_id"], r["doc_len"]) for r in full.collect()]
    assert len(full_rows) == 20
    p1 = rd.topk_sort_field(q, "doc_len", k=10, early_terminate=False)
    p1_rows = [(r["doc_id"], r["doc_len"]) for r in p1.collect()]
    cursor = (p1_rows[-1][1], p1_rows[-1][0])
    p2 = rd.topk_sort_field(q, "doc_len", k=10, after=cursor)
    p2_rows = [(r["doc_id"], r["doc_len"]) for r in p2.collect()]
    assert p1_rows + p2_rows == full_rows
    # ascending cursor order too
    fa = rd.topk_sort_field(
        q, "doc_len", k=20, ascending=True, early_terminate=False
    ).collect()
    pa1 = rd.topk_sort_field(
        q, "doc_len", k=10, ascending=True, early_terminate=False
    ).collect()
    ca = (pa1[-1]["doc_len"], pa1[-1]["doc_id"])
    pa2 = rd.topk_sort_field(
        q, "doc_len", k=10, ascending=True, after=ca
    ).collect()
    assert [r["doc_id"] for r in pa1 + pa2] == [r["doc_id"] for r in fa]
    # round-5 contract change: cursor pages RIDE the early-terminated
    # lane when the sibling exists (gated in test_sortindex.py); on an
    # index WITHOUT the sibling, demanding it raises the missing-index
    # error (early_terminate=True means "require the sibling")
    with pytest.raises(ValueError, match="no sort index"):
        rd.topk_sort_field(
            q, "doc_len", k=10, early_terminate=True, after=cursor
        )


# --------------------------------------- semantic decontamination
def test_semantic_decontaminate_replay(spark):
    import numpy as np

    from yase_spark.similarity import semantic_decontaminate

    rng = np.random.default_rng(7)
    bench = rng.standard_normal((3, 8)).astype("float32")
    rows = []
    for i, b in enumerate(bench):
        rows.append((i, [float(x) for x in b], 1))
    # candidate 10 = a scaled copy of bench 0 (cosine 1.0), candidate 11
    # = a noisy paraphrase of bench 1, candidates 12.. random
    rows.append((10, [float(x) for x in bench[0] * 3.0], 0))
    noisy = bench[1] + 0.1 * rng.standard_normal(8).astype("float32")
    rows.append((11, [float(x) for x in noisy], 0))
    for i in range(12, 20):
        rows.append((i, [float(x) for x in rng.standard_normal(8)], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, is_bench int"
    )
    got = {
        r["vec_id"]: (r["max_sim_r"], r["contaminated"])
        for r in semantic_decontaminate(
            emb, "is_bench = 1", threshold=0.9
        ).collect()
    }
    assert set(got) == set(range(10, 20))  # bench rows are not candidates
    # python replay
    B = bench.astype("float64")
    for vid, vec, isb in rows:
        if isb:
            continue
        v = np.array(vec, dtype="float64")
        sims = (B @ v) / (np.linalg.norm(B, axis=1) * np.linalg.norm(v))
        want = round(float(sims.max()), 6)
        assert got[vid][0] == pytest.approx(want, abs=2e-6), vid
        assert got[vid][1] == int(got[vid][0] >= 0.9)
    assert got[10][1] == 1 and got[11][1] == 1
    assert sum(c for _, c in got.values()) == 2  # randoms stay clean


# --------------------------------------- diversified sampler / t_test
def _h60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_diversified_sampler_replay(spark):
    from yase_spark.aggs import diversified_sampler

    rows = [(i, ["a", "b", "c"][i % 3] if i < 30 else "a") for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, grp string")
    got = [
        (r["doc_id"], r["grp"], r["h"])
        for r in diversified_sampler(
            d, "grp", n=8, max_per_value=3, id_col="doc_id"
        ).collect()
    ]
    # python replay: per-value 3 lowest hashes, then global 8 lowest
    by_val = {}
    for i, g in rows:
        by_val.setdefault(g, []).append((_h60_py(f"d0{i}"), i))
    kept = []
    for g, hs in by_val.items():
        for h, i in sorted(hs)[:3]:
            kept.append((h, i, g))
    want = [(i, g, h) for h, i, g in sorted(kept)[:8]]
    assert got == want
    # diversity bound holds even though value 'a' dominates the input
    from collections import Counter

    assert max(Counter(g for _, g, _ in got).values()) <= 3


def test_t_test_hand_computed(spark):
    from yase_spark.aggs import t_test

    rows = [(1, "a", 10), (2, "a", 12), (3, "a", 14),
            (4, "b", 20), (5, "b", 26)]
    d = spark.createDataFrame(rows, "doc_id long, grp string, v long")
    r = t_test(d, "grp = 'a'", "grp = 'b'", "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["mean_a_r"] == 12.0 and r["mean_b_r"] == 23.0
    # Welch by hand: var_a = 4, var_b = 18; t = -11 / sqrt(4/3 + 9)
    import math

    want = (12.0 - 23.0) / math.sqrt(4.0 / 3.0 + 18.0 / 2.0)
    assert r["t_r"] == pytest.approx(round(want, 6), abs=1e-9)


# ------------------------------ match_bool_prefix / request cache
def test_match_bool_prefix_replay(spark, tiny_index):
    from yase_spark.query import naive_topk

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    # "json ge" — full term 'json', prefix 'ge' (getPage/get... parts)
    exp = rd._expander().prefix_capped("ge", 50)
    assert exp, "prefix 'ge' expands to nothing — fixture term is wrong"
    terms = list(dict.fromkeys(["json"] + exp))
    got = rd.match_bool_prefix("json ge", k=10, max_expansions=50)
    tps = [tp for tp in rd.fetch_terms(terms).values() if tp is not None]
    want = naive_topk(tps, 10, cfg.k1, cfg.b, rd.avgdl)
    assert [(d, round(s, 9)) for _r, d, s in got] == [
        (d, round(s, 9)) for _r, d, s in want
    ]
    # single-token query (uncapped) degenerates to the pure prefix
    # ranking of the same expansion set
    got1 = rd.match_bool_prefix("ge", k=5, max_expansions=1024)
    want1 = rd.multi_term_topk("prefix", "ge", k=5)
    assert [(d, round(s, 9)) for _r, d, s in got1] == [
        (d, round(s, 9)) for _r, d, s in want1
    ]
    # the cap degrades, never raises
    assert rd.match_bool_prefix("json g", k=5, max_expansions=2)


def test_topk_cached_hit_share_and_invalidate(spark, tmp_path):
    import pytest as _pt

    from yase_spark.config import IndexConfig
    from yase_spark.index import IndexBuilder, build_index

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    corpus = spark.createDataFrame(
        [
            ("r", f"{i:04d}", "c", "py",
             f"alpha{i % 7} beta gamma json getPage delta{i % 3}")
            for i in range(40)
        ],
        schema=schema,
    )
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, ngrams=False)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    rd = IndexReader(spark, root, cfg)
    q = "json getpage alpha1"
    r1 = rd.topk_cached(q, 5)
    assert r1 == rd.topk(q, 5)
    # a second call must not touch the index at all
    rd.fetch_terms = None  # any fetch would raise TypeError
    assert rd.topk_cached(q, 5) == r1
    # the cache is shared ACROSS readers of the same version
    rd2 = IndexReader(spark, root, cfg)
    rd2.fetch_terms = None
    assert rd2.topk_cached(q, 5) == r1
    # a commit (delete) bumps the version: new readers miss, and the
    # fresh result reflects the tombstone
    top_doc = r1[0][1]
    IndexBuilder(spark, root, cfg).delete([top_doc])
    rd3 = IndexReader(spark, root, cfg)
    r3 = rd3.topk_cached(q, 5)
    assert top_doc not in [d for _r, d, _s in r3]
    # LRU bound holds
    rd4 = IndexReader(spark, root, cfg)
    with _pt.MonkeyPatch.context() as mp:
        mp.setattr(type(rd4), "RESULTS_CACHE_MAX", 3)
        for i in range(6):
            rd4.topk_cached(f"alpha{i % 7} beta", 3)
        assert len(rd4._shared.results) <= 3
    # an unshared reader serves uncached (and still correctly)
    rd5 = IndexReader(spark, root, cfg, shared_meta=False)
    assert rd5.topk_cached(q, 5) == r3


# ----------------------------------------------- rank_feature query
def test_rank_feature_replay_and_functions(spark, tiny_index):
    import math

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json page"
    bm25 = _full_scores(rd, q)
    dl = {
        r["doc_id"]: r["doc_len"]
        for r in rd.cat.read(spark, "docs").select("doc_id", "doc_len").collect()
    }

    def feat(x, fn, pivot, boost=2.0, e=2.0):
        if fn == "saturation":
            return boost * x / (x + pivot)
        if fn == "log":
            return boost * math.log(pivot + x)
        return boost * x**e / (x**e + pivot**e)

    for fn in ("saturation", "log", "sigmoid"):
        got = {
            r["doc_id"]: r["score"]
            for r in rd.topk_rank_feature(
                q, "doc_len", k=10**9, function=fn, pivot=100.0,
                boost=2.0, exponent=2.0,
            ).collect()
        }
        assert set(got) == set(bm25)
        for d in bm25:
            want = bm25[d] + feat(float(dl[d]), fn, 100.0)
            assert got[d] == pytest.approx(want, rel=1e-9), (fn, d)

    # additive semantics: matching is unchanged, every matched doc's
    # score strictly exceeds its BM25 (the feature is positive here)
    got_sat = {
        r["doc_id"]: r["score"]
        for r in rd.topk_rank_feature(q, "doc_len", k=10**9).collect()
    }
    assert all(got_sat[d] > bm25[d] for d in bm25)
    with pytest.raises(ValueError, match="rank_feature function"):
        rd.topk_rank_feature(q, "doc_len", function="linear")
