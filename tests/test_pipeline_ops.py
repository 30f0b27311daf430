"""LLM-pipeline operators (round 2): near-dup family, similarity
search, text analysis. The exact operators are oracle-gated by the
driver (tests/test_entry.py runs the same contract); here we gate the
parts an SQL oracle can't: LSH recall, banding exactness, and the
approximate ANN's recall@k vs the exact path.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_minhash_lsh_recall_is_total(spark, docs):
    """With 128 rows-per-band=1 bands, LSH candidates must cover every
    true pair at j >= 0.1 on this corpus (P(miss) < 2e-6 per pair)."""
    from yase_spark.neardup import jaccard_pairs, minhash_lsh_pairs

    exact = {(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert exact, "fixture should contain near-dup pairs"
    assert lsh == exact, f"LSH missed {exact - lsh} / extra {lsh - exact}"


def test_simhash_banding_is_exact(spark, docs):
    """4-band pigeonhole must find exactly the hamming<=3 pairs that a
    brute-force comparison over all simhashes finds."""
    from yase_spark.neardup import simhash_docs, simhash_pairs

    sims = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
    ids = sorted(sims)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    banded = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs).collect()}
    assert banded == brute


def test_ann_lsh_recall(spark, emb):
    """Bucketed ANN must reach recall@10 >= 0.9 vs the exact top-k at
    this SF with the default multi-table parameters."""
    from yase_spark.similarity import cosine_topk, lsh_ann_topk

    exact = cosine_topk(emb).collect()
    approx = lsh_ann_topk(emb).collect()
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(want[q] & got.get(q, set())) / len(want[q]) for q in want
    ]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.9, f"recall@10 = {recall:.3f} (per-query {recalls})"


def test_ann_candidates_are_pruned(spark, emb):
    """The bucketed variant must actually score fewer candidates than
    brute force (the scale story: buckets prune the join)."""
    from yase_spark.similarity import lsh_buckets

    n = emb.count()
    n_queries = 8
    b = lsh_buckets(emb)
    q = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = (
        b.select("vec_id", "table", "bucket")
        .join(q, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    assert cand < 0.8 * n_queries * n, (
        f"scoring {cand} of {n_queries * n} pairs — no pruning"
    )


def test_ann_ivf_full_probe_equals_exact_and_partitions(spark, emb):
    """IVF invariants: (a) the assignment is a PARTITION of the vectors
    (every vec_id in exactly one inverted list — the property that makes
    cid a partition key at scale and full-probe == brute force), (b)
    nprobe == n_centroids reproduces the exact top-k row-for-row."""
    from yase_spark.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_ann_topk,
        train_ivf_centroids,
    )

    C = train_ivf_centroids(emb, n_centroids=16, iters=3)
    a = ivf_assign(emb, C)
    n = emb.count()
    assert a.count() == n
    assert a.select("vec_id").distinct().count() == n

    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["sim_r"])
    exact = sorted(cosine_topk(emb).collect(), key=key)
    full = sorted(ivf_ann_topk(emb, n_centroids=16).collect(), key=key)
    assert [key(r) for r in full] == [key(r) for r in exact]


def test_ann_ivf_pruned_recall_and_candidates(spark, emb):
    """nprobe << n_centroids must prune the scored candidates while
    keeping recall@10 high (probing the nearest lists finds most true
    neighbors — random fixture vectors are the hard case)."""
    from yase_spark.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivf_assign,
        train_ivf_centroids,
    )

    n = emb.count()
    n_queries, nprobe, K = 8, 4, 16
    exact = cosine_topk(emb).collect()
    approx = ivf_ann_topk(emb, n_queries=n_queries, k=10,
                          n_centroids=K, nprobe=nprobe).collect()
    want, got = {}, {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(want[q] & got.get(q, set())) / len(want[q]) for q in want]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.5, f"recall@10 = {recall:.3f} (per-query {recalls})"

    # candidate pruning: probed lists cover well under the full table
    C = train_ivf_centroids(emb, n_centroids=K, iters=5)
    sizes = {r["cid"]: r["n"] for r in
             ivf_assign(emb, C).groupBy("cid").agg(F.count("*").alias("n")).collect()}
    biggest = sum(sorted(sizes.values(), reverse=True)[:nprobe])
    assert biggest < 0.8 * n, f"probing {biggest}/{n} vectors — no pruning"


def test_quality_and_langid_shapes(spark, docs):
    from yase_spark.textstats import lang_id, quality_scores, token_stats

    n = docs.count()
    assert lang_id(docs).count() == n
    assert quality_scores(docs).count() == n
    ts = token_stats(docs)
    assert ts.count() == n
    row = ts.agg(F.min("n_bpe"), F.min("n_ws")).collect()[0]
    assert row[0] >= 0 and row[1] >= 0


def test_cosine_dup_pairs_total_recall(spark, emb):
    """LSH-candidate + exact-verify must equal the brute-force cosine
    pairs at the pinned threshold (64 tables make misses negligible even
    at this fixture's hard low-similarity threshold)."""
    from yase_spark.similarity import cosine_dup_pairs, cosine_topk

    got = {(r["vec_a"], r["vec_b"]) for r in cosine_dup_pairs(emb).collect()}
    # brute force via a crossJoin in Spark (sandbox-size only)
    from pyspark.sql import functions as F

    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding"))
    cos = (
        "aggregate(zip_with(qe, embedding, (x, y) -> cast(x as double) * cast(y as double)), "
        "0D, (acc, v) -> acc + v) / "
        "(sqrt(aggregate(qe, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))) * "
        "sqrt(aggregate(embedding, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))))"
    )
    want = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b).where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("s", F.round(F.expr(cos), 6))
        .filter(F.col("s") >= 0.45)
        .collect()
    }
    assert want, "fixture should yield at least one pair at 0.45"
    assert got == want, f"missing {want - got} / extra {got - want}"


def test_bucket_pairs_matches_combinations(spark):
    """_bucket_pairs (the shared LSH candidate core) must emit exactly
    the a<b combinations of each bucket, drop singletons, and drop
    buckets above max_bucket."""
    import itertools

    from yase_spark.neardup import _bucket_pairs

    rows = []
    buckets = {
        (0, 1): [5, 3, 9],          # 3 pairs
        (0, 2): [7],                # singleton -> none
        (1, 1): [2, 8],             # 1 pair
        (1, 3): [10, 11, 12, 13],   # 6 pairs, dropped when max_bucket=3
    }
    for (b, v), members in buckets.items():
        rows += [(b, v, m) for m in members]
    df = spark.createDataFrame(rows, schema="b int, v int, id long")

    def expect(cap):
        out = set()
        for members in buckets.values():
            if len(members) < 2 or len(members) > cap:
                continue
            out |= set(itertools.combinations(sorted(members), 2))
        return out

    got = {
        (r["a"], r["b"])
        for r in _bucket_pairs(df, ["b", "v"], "id").collect()
    }
    assert got == expect(10_000)
    got_capped = {
        (r["a"], r["b"])
        for r in _bucket_pairs(df, ["b", "v"], "id", max_bucket=3).collect()
    }
    assert got_capped == expect(3)


def test_bucket_pairs_chunked_is_exact_over_cap(spark):
    """over_cap="chunk" (the SimHash exactness path) must emit the FULL
    a<b combination set of buckets larger than max_bucket — distributed
    across chunk-pair rows, never silently dropped."""
    import itertools

    from yase_spark.neardup import _bucket_pairs

    buckets = {
        (0, 1): list(range(100, 120)),   # 20 members > cap=6 -> chunked
        (0, 2): [1, 2, 3],               # small -> triangle path
        (1, 1): [7],                     # singleton -> none
        (1, 2): list(range(200, 207)),   # 7 members > cap=6 -> chunked
    }
    rows = [(b, v, m) for (b, v), ms in buckets.items() for m in ms]
    df = spark.createDataFrame(rows, schema="b int, v int, id long")

    want = set()
    for ms in buckets.values():
        if len(ms) >= 2:
            want |= set(itertools.combinations(sorted(ms), 2))
    got = {
        (r["a"], r["b"])
        for r in _bucket_pairs(df, ["b", "v"], "id", max_bucket=6,
                               over_cap="chunk").collect()
    }
    assert got == want, f"missing {want - got} / extra {got - want}"


def test_simhash_exact_with_degenerate_band_buckets(spark):
    """End-to-end exactness under band-bucket overflow: many docs share
    a band value; with a tiny cap the chunked path must still find all
    hamming<=3 pairs (brute-force oracle)."""
    from unittest import mock

    from yase_spark import neardup

    docs = spark.createDataFrame(
        [(i, "common words everywhere " + ("alpha" if i % 2 else "beta")
          + f" x{i % 5}")
         for i in range(40)],
        schema="doc_id long, text string",
    )
    sims = {r["doc_id"]: r["simhash"]
            for r in neardup.simhash_docs(docs).collect()}
    want = {
        (a, b)
        for a in sims for b in sims if a < b
        and bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    orig = neardup._bucket_pairs

    def capped(rows, cols, payload, max_bucket=10_000, over_cap="drop"):
        return orig(rows, cols, payload, max_bucket=4, over_cap=over_cap)

    with mock.patch.object(neardup, "_bucket_pairs", side_effect=capped):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in neardup.simhash_pairs(docs).collect()
        }
    assert got == want, f"missing {want - got} / extra {got - want}"


def test_dup_groups_components_and_keep_policy(spark):
    """dup_groups must compute exact connected components (chains force
    multiple propagation rounds), label each with its min doc_id, mark
    only that doc keep=true, and keep singletons as their own cluster."""
    from yase_spark.neardup import dup_groups

    pair_list = [
        (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),   # chain -> cluster 2
        (10, 11), (12, 11),                        # -> cluster 10
        (20, 21),                                  # -> cluster 20
        (31, 30), (32, 30), (33, 31),              # star -> cluster 30
    ]
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 41)], schema="doc_id long"
    )
    pairs = spark.createDataFrame(pair_list, schema="doc_a long, doc_b long")

    # union-find oracle (test-side only)
    parent = {i: i for i in range(1, 41)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in parent}

    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dup_groups(docs, pairs).collect()
    }
    assert set(got) == set(want)
    for d, (c, keep) in got.items():
        assert c == want[d], (d, c, want[d])
        assert keep == (d == c)


def test_repetition_stats_vs_python(spark):
    """Gopher repetition metrics == a pure-python replay over docs
    with real newlines, duplicated lines, and repeated n-grams."""
    import re
    from collections import Counter

    from yase_spark.textstats import repetition_stats

    rows = [
        (0, "alpha beta\nalpha beta\ngamma delta\n"),
        (1, "one two three four five one two three four five extra"),
        (2, "unique line one\nunique line two"),
        (3, "x y x y x y x y"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs, n_top=2, n_dup=5).collect()}

    for d, text in rows:
        lines = [l for l in text.split("\n") if l]
        lc = Counter(lines)
        n_lines = len(lines)
        dup_lines = sum(c for c in lc.values() if c > 1)
        line_chars = sum(len(l) for l in lines)
        dup_line_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
        words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        w_chars = len(" ".join(words))
        g2 = Counter(" ".join(words[i:i+2]) for i in range(len(words) - 1))
        if g2:
            top_g, top_c = sorted(g2.items(), key=lambda x: (-x[1], x[0]))[0]
            top_cov = top_c * len(top_g)
        else:
            top_cov = 0
        g5 = Counter(" ".join(words[i:i+5]) for i in range(len(words) - 4))
        dup_cov = sum((c - 1) * len(g) for g, c in g5.items() if c > 1)

        r = got[d]
        assert r["n_lines"] == n_lines
        assert r["dup_line_frac"] == round(dup_lines / n_lines, 6) if n_lines else r["dup_line_frac"] == 0.0
        assert r["dup_line_char_frac"] == (round(dup_line_chars / line_chars, 6) if line_chars else 0.0)
        assert r["top_ngram_char_frac"] == (round(top_cov / w_chars, 6) if w_chars else 0.0)
        assert r["dup_ngram_char_frac"] == (round(dup_cov / w_chars, 6) if w_chars else 0.0)

    # sanity of the signals themselves
    assert got[0]["dup_line_frac"] > 0.5        # 2 of 3 lines duplicated
    assert got[3]["dup_ngram_char_frac"] > 0.5  # heavy 5-gram repetition
    assert got[2]["dup_line_frac"] == 0.0
