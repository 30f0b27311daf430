"""Lazy block decode + executor-side WAND (VERDICT round 1 items 2/3):

* ``topk_lazy`` must return rank- and bitwise-score-identical results to
  both driver executors while decoding STRICTLY FEWER blocks than exist
  (the stored skip structure must actually skip);
* the ``topk`` driver/distributed dispatch must trigger on the
  dictionary-only df estimate and agree with the driver results;
* ``topk_set_distributed`` (executor-side WAND per query) must be
  bitwise-identical to the driver path;
* after an incremental append the stored block bounds are stale — the
  idf-rescale must keep lazy results identical to the full-decode path.
"""

import pytest

from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder, build_index
from yase_spark.query import IndexReader
from yase_spark.synth import corpus_df, reference_query_set


@pytest.fixture(scope="module")
def small_block_index(spark, tiny_corpus, tmp_path_factory):
    """block_size=16 so the 1000-doc corpus has enough blocks per common
    term for pruning to be observable."""
    root = str(tmp_path_factory.mktemp("lazyidx"))
    cfg = IndexConfig(build_groups=2, shuffle_partitions=16, block_size=16)
    build_index(spark, tiny_corpus, root, cfg)
    return root


def _topk_queries():
    return [q for q in reference_query_set() if q["kind"] == "topk"]


def test_lazy_equals_eager_and_skips_blocks(spark, small_block_index):
    rd = IndexReader(spark, small_block_index)
    decoded = total = 0
    for q in _topk_queries():
        k = q.get("k", 10)
        eager = rd.topk(q["query"], k, use_wand=True)
        naive = rd.topk(q["query"], k, use_wand=False)
        lazy, stats = rd.topk_lazy(q["query"], k, return_stats=True)
        assert eager == naive, q["query"]
        assert lazy == eager, q["query"]  # bitwise: same floats, same ranks
        decoded += stats["blocks_decoded"]
        total += stats["blocks_total"]
    assert total > 0
    assert decoded < total, (
        f"lazy WAND decoded every block ({decoded}/{total}) — the skip "
        "structure is write-only"
    )


def test_driver_distributed_dispatch(spark, small_block_index):
    rd = IndexReader(spark, small_block_index)
    q = "json getPage"
    want = rd.topk(q, 10)

    rd2 = IndexReader(spark, small_block_index)
    rd2.driver_fetch_max_postings = 1  # force the cluster-side path
    got = rd2.topk(q, 10)
    assert not rd2._cache, "dispatch must not have fetched payloads driver-side"
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-9  # distributed sum order may differ in ulps


def test_topk_set_distributed_bitwise(spark, small_block_index):
    rd = IndexReader(spark, small_block_index)
    qs = _topk_queries()
    got = {
        qid: sorted(rows, key=lambda r: r[0])
        for qid, rows in _group(rd.topk_set_distributed(qs).collect())
    }
    for q in qs:
        want = rd.topk(q["query"], q.get("k", 10))
        have = got.get(q["query_id"], [])
        assert [tuple(r) for r in have] == [tuple(w) for w in want], q["query"]


def test_bool_distributed_equals_driver(spark, small_block_index):
    """bool_and_df / bool_or_df (executor-side decode, DataFrame
    results) must equal the driver ndarray path — including under
    forced cluster dispatch of the ndarray API, which must not fetch
    payloads driver-side."""
    rd = IndexReader(spark, small_block_index)
    queries = ["json getPage", "sync_list json", "getUserName parse"]
    for q in queries:
        want_and = [int(x) for x in rd.bool_and(q)]
        want_or = [int(x) for x in rd.bool_or(q)]
        got_and = sorted(r["doc_id"] for r in rd.bool_and_df(q).collect())
        got_or = sorted(r["doc_id"] for r in rd.bool_or_df(q).collect())
        assert got_and == want_and, q
        assert got_or == want_or, q

    rd2 = IndexReader(spark, small_block_index)
    rd2._total_postings_upper = 10**12  # defeat the whole-index skip
    rd2.driver_fetch_max_postings = 1   # force the cluster-side path
    for q in queries:
        rd_ref = IndexReader(spark, small_block_index)
        assert [int(x) for x in rd2.bool_and(q)] == [int(x) for x in rd_ref.bool_and(q)], q
        assert [int(x) for x in rd2.bool_or(q)] == [int(x) for x in rd_ref.bool_or(q)], q
    assert not rd2._cache, "dispatch must not have fetched payloads driver-side"


def _group(rows):
    by = {}
    for r in rows:
        by.setdefault(r["query_id"], []).append(
            (int(r["rank"]), int(r["doc_id"]), float(r["score"]))
        )
    return by.items()


def test_lazy_after_append_rescales_bounds(spark, tmp_path):
    corpus = corpus_df(spark, 400, partitions=4)
    delta = corpus_df(spark, 520, partitions=4).join(
        corpus.select("repo", "path", "commit"), ["repo", "path", "commit"], "left_anti"
    )
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16)
    b = IndexBuilder(spark, root, cfg)
    b.build(corpus)
    b.append(delta)

    rd = IndexReader(spark, root)
    for q in _topk_queries()[:8]:
        k = q.get("k", 10)
        eager = rd.topk(q["query"], k, use_wand=True)
        lazy = rd.topk_lazy(q["query"], k)
        assert lazy == eager, q["query"]


def test_topk_sharded_exact_pruned_multitask(spark, small_block_index):
    """VERDICT round 2 item 1: the over-cap lane must both PRUNE and
    SHARD one query. Gates: (a) results bitwise-identical to the driver
    executors, (b) >1 range task serves a single query, (c) blocks
    decoded cluster-side < blocks shipped (block-max pruning is live
    in the executor, not just the driver)."""
    rd = IndexReader(spark, small_block_index)
    dec = tot = 0
    multi = 0
    for q in _topk_queries():
        k = q.get("k", 10)
        want = rd.topk(q["query"], k, use_wand=False)
        # WAND kernel: the pruning gate (blocks decoded < shipped)
        got, stats = rd.topk_sharded(
            q["query"], k, n_ranges=6, return_stats=True, kernel="wand"
        )
        assert got == want, q["query"]  # bitwise: same floats, same ranks
        # dense kernel (the flat-distribution auto pick): same bits
        got_d = rd.topk_sharded(q["query"], k, n_ranges=6, kernel="dense")
        assert got_d == want, q["query"]
        multi = max(multi, stats["n_ranges"])
        dec += stats["blocks_decoded"]
        tot += stats["blocks_total"]
    assert multi > 1, "sharded executor never used more than one range task"
    assert tot > 0 and dec < tot, (
        f"executor-side WAND decoded every shipped block ({dec}/{tot})"
    )


def test_est_surviving_fraction_flat_vs_spiky():
    """Round-3 open item 3: the metadata-only pruning-potential estimate
    must read ~1.0 on flat block-max distributions (dense territory) and
    near the spike fraction on skewed ones (WAND territory)."""
    import numpy as np

    from yase_spark.query import est_surviving_fraction

    n = 100
    first = np.arange(n, dtype=np.int64) * 10
    last = first + 9
    flat = np.full(n, 1.0)
    assert est_surviving_fraction([(first, last, flat, flat)], 3) == 1.0

    spiky = flat.copy()
    spiky[[7, 40, 77]] = 10.0
    frac = est_surviving_fraction([(first, last, spiky, spiky)], 3)
    assert frac <= 5 / n, frac
    # fewer blocks than k -> no certified bound -> assume nothing prunes
    assert est_surviving_fraction([(first[:2], last[:2], flat[:2], flat[:2])], 3) == 1.0


def test_topk_sharded_auto_kernel_picks_by_pruning_potential(spark, tmp_path):
    """auto must route a spiky-bounds query through the per-range WAND
    (blocks decoded < shipped) and a flat-bounds query through the dense
    kernel (every shipped block decoded), with results exact in both."""
    schema = "repo string, path string, commit string, lang string, content string"
    rows = []
    for i in range(8000):
        body = "filler pad"
        if i % 2 == 0:
            # ~8 spike docs per range of 2000: enough that every range
            # certifies theta from k=3 blocks, few enough that the
            # surviving fraction stays well under the WAND pick cutoff
            body += " needle" * (50 if i % 250 == 0 else 1)
        rows.append(("r", f"{i:05d}", "c", "python", body))
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16,
                      ngrams=False)
    IndexBuilder(spark, root, cfg).build(
        spark.createDataFrame(rows, schema=schema)
    )
    rd = IndexReader(spark, root)

    got, stats = rd.topk_sharded("needle", 3, n_ranges=4, return_stats=True,
                                 kernel="auto")
    assert got == rd.topk("needle", 3, use_wand=False)
    assert stats["blocks_decoded"] < stats["blocks_total"], (
        "auto picked dense on a spiky distribution", stats
    )

    got_f, stats_f = rd.topk_sharded("filler pad", 3, n_ranges=4,
                                     return_stats=True, kernel="auto")
    assert got_f == rd.topk("filler pad", 3, use_wand=False)
    assert stats_f["blocks_decoded"] == stats_f["blocks_total"], (
        "auto picked WAND on a flat distribution", stats_f
    )


def test_topk_sharded_survives_append(spark, tmp_path):
    """Sharded executor on an appended index: stored bounds are stale
    (idf AND avgdl changed); the slice-and-rescale path must still be
    exact vs the full-decode driver scorer."""
    schema = "repo string, path string, commit string, lang string, content string"
    short = [
        ("r", f"{i:04d}", "c", "python", "needle " * (1 + i % 7) + "pad hay")
        for i in range(600)
    ]
    longd = [
        ("r", f"9{i:04d}", "c", "python",
         " ".join(f"w{j} hay" for j in range(150)))
        for i in range(120)
    ]
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16,
                      ngrams=False)
    b = IndexBuilder(spark, root, cfg)
    b.build(spark.createDataFrame(short, schema=schema))
    b.append(spark.createDataFrame(longd, schema=schema))
    rd = IndexReader(spark, root)
    for q in ("needle", "hay", "needle hay", "needle pad hay"):
        for k in (1, 5, 10):
            assert rd.topk_sharded(q, k, n_ranges=5) == rd.topk(
                q, k, use_wand=False
            ), (q, k)


def test_topk_overcap_dispatch_hits_sharded(spark, small_block_index):
    """topk()'s over-cap dispatch must route to the sharded lane and
    agree with the driver result."""
    rd = IndexReader(spark, small_block_index)
    q = "json getPage sync"
    want = rd.topk(q, 10)
    rd2 = IndexReader(spark, small_block_index)
    rd2.driver_fetch_max_postings = 10
    rd2._total_postings_upper = 10**9
    called = {}
    orig = rd2.topk_sharded

    def spy(query, k=10, **kw):
        called["yes"] = True
        return orig(query, k, **kw)

    rd2.topk_sharded = spy
    got = rd2.topk(q, 10)
    assert called.get("yes"), "over-cap dispatch did not use topk_sharded"
    assert got == want


def test_topk_block_selected_exact_and_partial_fetch(spark, small_block_index):
    """VERDICT round 2 item 3 / block-selected cold fetch: results must
    be bitwise-identical to the full-decode scorer while fetching
    STRICTLY FEWER blocks than exist (the theta0 lower bound + interval
    upper-bound sweep must actually exclude blocks)."""
    rd = IndexReader(spark, small_block_index)
    sel = tot = 0
    for q in _topk_queries():
        k = q.get("k", 10)
        want = rd.topk(q["query"], k, use_wand=False)
        got, stats = rd.topk_block_selected(q["query"], k, return_stats=True)
        assert got == want, q["query"]
        sel += stats["blocks_selected"]
        tot += stats["blocks_total"]
    assert tot > 0 and sel < tot, (
        f"block selection fetched every block ({sel}/{tot})"
    )


def test_topk_block_selected_survives_append(spark, tmp_path):
    """Block selection on an appended index: theta0 and the sweep use
    RESCALED bounds (idf and avgdl both moved); must remain exact in
    both directions of the avgdl shift."""
    schema = "repo string, path string, commit string, lang string, content string"
    short = [
        ("r", f"{i:04d}", "c", "python", "needle " * (1 + i % 9) + "pad hay")
        for i in range(500)
    ]
    longd = [
        ("r", f"9{i:04d}", "c", "python",
         " ".join(f"w{j} hay needle" for j in range(120)))
        for i in range(100)
    ]
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16,
                      ngrams=False)
    b = IndexBuilder(spark, root, cfg)
    b.build(spark.createDataFrame(short, schema=schema))
    b.append(spark.createDataFrame(longd, schema=schema))
    rd = IndexReader(spark, root)
    for q in ("needle", "hay", "needle hay", "needle pad"):
        for k in (1, 3, 10):
            assert rd.topk_block_selected(q, k) == rd.topk(
                q, k, use_wand=False
            ), (q, k)


def test_topk_block_selected_adaptive_two_rare_terms(spark, tmp_path):
    """Round-3 open item 2: on a two-rare-term query theta0 (a
    single-term bound) prunes nothing — the summed upper bounds beat it
    in every interval — so the lane used to bail to eager. The adaptive
    probe must fetch a small budget of highest-UB intervals, certify
    theta1 from their ACHIEVED scores, and re-select down to the
    co-occurrence intervals: exact result, no fallback, and total moved
    blocks (probe + final) well under the bail threshold."""
    schema = "repo string, path string, commit string, lang string, content string"
    rows = []
    for i in range(60_000):
        filler = f"common{i % 7} filler pad"
        if i % 33 == 5:
            extra = " alpha"          # rare term 1, spread over doc space
        elif i % 33 == 21:
            extra = " beta"           # rare term 2, spread over doc space
        elif i % 8191 == 700:
            extra = " alpha alpha alpha beta beta beta"   # co-occurrence
        else:
            extra = ""
        rows.append(("r", f"{i:06d}", "c", "python", filler + extra))
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16,
                      ngrams=False)
    IndexBuilder(spark, root, cfg).build(
        spark.createDataFrame(rows, schema=schema)
    )
    rd = IndexReader(spark, root)
    q, k = "alpha beta", 5
    want = rd.topk(q, k, use_wand=False)
    got, stats = rd.topk_block_selected(q, k, return_stats=True)
    assert got == want
    assert not stats.get("fallback"), stats
    assert stats["theta1"] is not None and stats["probe_blocks"] > 0, stats
    moved = stats["blocks_selected"] + stats["probe_blocks"]
    assert moved < stats["blocks_total"] * rd.BLOCKSEL_MAX_FRACTION, stats


def test_topk_set_splits_overcap_queries_to_sharded(spark, small_block_index):
    """Batch executor WAND: a query whose dictionary-estimated postings
    exceed the per-task cap must be served via the sharded per-range
    lane (bounded task memory) and still return driver-identical
    results alongside the normally-grouped queries."""
    rd = IndexReader(spark, small_block_index)
    qs = [
        {"query_id": "light", "query": "itemscan", "k": 5},
        {"query_id": "heavy", "query": "json getPage sync", "k": 10},
    ]
    want = {
        q["query_id"]: rd.topk(q["query"], q["k"], use_wand=False) for q in qs
    }

    rd2 = IndexReader(spark, small_block_index)
    rd2.driver_fetch_max_postings = 500   # 'heavy' exceeds, 'light' not
    rd2._total_postings_upper = 10**9
    called = []
    orig = rd2.topk_sharded
    rd2.topk_sharded = lambda q, k=10, **kw: (called.append(q), orig(q, k, **kw))[1]

    rows = rd2.topk_set_distributed(qs).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (int(r["rank"]), int(r["doc_id"]), float(r["score"]))
        )
    for qid in got:
        got[qid].sort()
    assert called, "over-cap query was not routed through topk_sharded"
    assert got["heavy"] == want["heavy"]
    assert got["light"] == want["light"]
