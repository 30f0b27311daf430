"""Round-5 operator gates: combined_fields (BM25F) and the
matrix_stats / string_stats / dispersion_stats / bucket_stats aggs.

Each operator also carries a full driver oracle (__spark_entry__:
fields_combined, matrix_stats, string_stats, dispersion_stats,
stats_bucket); these tests gate the math against driver-side
brute-force recomputations and hand cases, plus the mode's validation
rules.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.fields import fields_combined_topk
from yase_spark.index import build_index
from yase_spark.query import IndexReader
from yase_spark.tokenize import analyze_query


@pytest.fixture(scope="module")
def two_fields(spark, tiny_corpus, tiny_index, tmp_path_factory):
    """content index (shared fixture) + a path-field index over the
    same corpus rows — same analysis chain, aligned doc ids."""
    root, cfg, _ = tiny_index
    froot = str(tmp_path_factory.mktemp("cfields") / "path_idx")
    fcorpus = tiny_corpus.withColumn("content", F.col("path"))
    build_index(spark, fcorpus, froot, cfg)
    return (root, froot, cfg)


def test_combined_single_field_weight1_equals_distributed(spark, two_fields):
    """One field at weight 1 degenerates to plain BM25: tf'=tf, dl'=dl,
    df'=df, avgdl'=avgdl."""
    root, _froot, cfg = two_fields
    rd = IndexReader(spark, root, cfg)
    got = fields_combined_topk([(rd, 1.0)], "json getPage", k=10).collect()
    want = rd.topk_distributed("json getPage", k=10).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [
        (r["rank"], r["doc_id"]) for r in want
    ]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9


def test_combined_matches_eager_bm25f(spark, two_fields):
    """fields_combined_topk == a driver-side BM25F recomputation:
    blended tf/dl/avgdl, max-df pseudo stats, one saturation."""
    root, froot, cfg = two_fields
    rd1 = IndexReader(spark, root, cfg)
    rd2 = IndexReader(spark, froot, cfg)
    w1, w2 = 1.0, 2.0
    query = "json java src"
    tokens = list(dict.fromkeys(analyze_query(query)))

    dfs = [rd.term_dfs(tokens) for rd in (rd1, rd2)]
    blended = {
        t: max(int(d.get(t, 0)) for d in dfs)
        for t in tokens
        if max(int(d.get(t, 0)) for d in dfs) > 0
    }
    dls = []
    for rd in (rd1, rd2):
        dls.append(
            {
                r["doc_id"]: r["doc_len"]
                for r in rd.cat.read(spark, "docs")
                .select("doc_id", "doc_len")
                .collect()
            }
        )
    cavgdl = w1 * rd1.avgdl + w2 * rd2.avgdl
    n = rd1.n_docs

    ctf: dict[tuple, float] = {}
    for rd, w in ((rd1, w1), (rd2, w2)):
        got = rd.fetch_terms(list(blended))
        for t in blended:
            tp = got.get(t)
            if tp is None:
                continue
            for d, tf in zip(tp.doc_ids.tolist(), tp.tfs.tolist()):
                ctf[(t, d)] = ctf.get((t, d), 0.0) + w * tf

    expected: dict[int, float] = {}
    for (t, d), v in ctf.items():
        dfv = blended[t]
        idf = math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
        cdl = w1 * dls[0][d] + w2 * dls[1][d]
        s = (
            idf
            * (v * (cfg.k1 + 1.0))
            / (v + cfg.k1 * (1.0 - cfg.b + cfg.b * cdl / cavgdl))
        )
        expected[d] = expected.get(d, 0.0) + s
    want = sorted(expected.items(), key=lambda x: (-x[1], x[0]))[:10]

    got = fields_combined_topk(
        [(rd1, w1), (rd2, w2)], query, k=10
    ).collect()
    assert [(r["doc_id"]) for r in got] == [d for d, _ in want]
    for g, (_, s) in zip(got, want):
        assert abs(g["score"] - s) < 1e-9


def test_combined_rejects_sub_one_weights(spark, two_fields):
    root, _froot, cfg = two_fields
    rd = IndexReader(spark, root, cfg)
    with pytest.raises(ValueError, match=">= 1"):
        fields_combined_topk([(rd, 0.5)], "json", k=5)


def test_matrix_stats_matches_numpy(spark):
    from yase_spark.aggs import matrix_stats

    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, 400)
    b = a * 3 + rng.integers(0, 25, 400)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "x long, y long"
    )
    rows = {r["field"]: r for r in matrix_stats(df, "x", "y").collect()}
    assert set(rows) == {"x", "y"}
    for field, v in (("x", a.astype(np.float64)), ("y", b.astype(np.float64))):
        r = rows[field]
        n = v.size
        mu = v.mean()
        m2 = ((v - mu) ** 2).sum()
        m3 = ((v - mu) ** 3).sum()
        m4 = ((v - mu) ** 4).sum()
        assert r["n"] == n
        assert r["mean_r"] == pytest.approx(mu, abs=2e-6)
        assert r["variance_r"] == pytest.approx(m2 / (n - 1), abs=2e-6)
        assert r["skew_r"] == pytest.approx(
            math.sqrt(n) * m3 / m2**1.5, abs=2e-6
        )
        # non-excess kurtosis: a normal field reads ~3
        assert r["kurt_r"] == pytest.approx(n * m4 / (m2 * m2), abs=2e-6)
    af, bf = a.astype(np.float64), b.astype(np.float64)
    cov = ((af - af.mean()) * (bf - bf.mean())).sum() / (af.size - 1)
    corr = cov / math.sqrt(af.var(ddof=1) * bf.var(ddof=1))
    for r in rows.values():
        assert r["cov_r"] == pytest.approx(cov, abs=2e-6)
        assert r["corr_r"] == pytest.approx(corr, abs=2e-6)


def test_string_stats_hand_case(spark):
    from yase_spark.aggs import string_stats

    df = spark.createDataFrame(
        [("abca",), ("",), ("bb",)], "text string"
    )
    r = string_stats(df, "text").collect()[0]
    assert (r["count"], r["min_length"], r["max_length"]) == (3, 0, 4)
    assert r["avg_length_r"] == pytest.approx(2.0)
    # chars: a:2 b:3 c:1 over 6
    ps = [2 / 6, 3 / 6, 1 / 6]
    ent = -sum(p * math.log2(p) for p in ps)
    assert r["entropy_r"] == pytest.approx(ent, abs=1e-6)


def test_dispersion_stats_hand_case(spark):
    from yase_spark.aggs import dispersion_stats

    df = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 4, 100)], "n_chars long"
    )
    r = dispersion_stats(df, "n_chars").collect()[0]
    assert (r["min_r"], r["median_r"], r["max_r"]) == (1.0, 3.0, 100.0)
    assert r["q1_r"] == pytest.approx(np.percentile([1, 2, 3, 4, 100], 25))
    assert r["q3_r"] == pytest.approx(np.percentile([1, 2, 3, 4, 100], 75))
    # MAD = median(|x - 3|) = median([2,1,0,1,97]) = 1
    assert r["mad_r"] == pytest.approx(1.0)


def test_bucket_stats_gap_fill(spark):
    from yase_spark.aggs import bucket_stats

    rows = [
        ("x", "2024-01-01 00:10:00"),
        ("x", "2024-01-01 00:20:00"),
        ("x", "2024-01-01 02:30:00"),  # hour 1 is a GAP bucket
        ("y", "2024-01-01 05:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {r["event_type"]: r for r in bucket_stats(ev, hours=1).collect()}
    x = got["x"]
    assert (x["n_buckets"], x["min_n"], x["max_n"], x["sum_n"]) == (3, 0, 2, 3)
    assert x["avg_n_r"] == pytest.approx(1.0)
    y = got["y"]
    assert (y["n_buckets"], y["min_n"], y["max_n"], y["sum_n"]) == (1, 1, 1, 1)


def test_geo_bounds_matches_brute(spark):
    from yase_spark.geo import geo_bounds, with_geo

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    pts = with_geo(df).select("lat", "lon").collect()
    r = geo_bounds(df).collect()[0]
    assert r["top_left_lat"] == max(p["lat"] for p in pts)
    assert r["top_left_lon"] == min(p["lon"] for p in pts)
    assert r["bottom_right_lat"] == min(p["lat"] for p in pts)
    assert r["bottom_right_lon"] == max(p["lon"] for p in pts)


def test_geo_centroid_matches_brute(spark):
    from yase_spark.geo import geo_centroid

    ids = list(range(3, 400, 7))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    r = geo_centroid(df).collect()[0]
    lat = sum((i * 7919) % 18000 for i in ids) / len(ids) / 100.0 - 90.0
    lon = sum((i * 104729) % 36000 for i in ids) / len(ids) / 100.0 - 180.0
    assert r["count"] == len(ids)
    assert r["lat_r"] == pytest.approx(lat, abs=1e-6)
    assert r["lon_r"] == pytest.approx(lon, abs=1e-6)


def test_rate_agg_gap_fill(spark):
    from yase_spark.aggs import rate_agg

    rows = [
        ("x", "2024-01-01 00:10:00", 30.0),
        ("x", "2024-01-01 00:50:00", 30.0),
        ("x", "2024-01-01 02:30:00", 120.0),  # hour 1 is a gap
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    ).select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    got = rate_agg(ev, hours=1, unit_minutes=1).collect()
    assert [(r["n"], r["rate_r"], r["value_rate_r"]) for r in got] == [
        (2, round(2 / 60.0, 6), 1.0),
        (0, 0.0, 0.0),
        (1, round(1 / 60.0, 6), 2.0),
    ]


def test_cumulative_cardinality_counts_first_appearances(spark):
    from yase_spark.aggs import cumulative_cardinality

    rows = [
        (1, "2024-01-01 00:05:00"),
        (2, "2024-01-01 00:15:00"),
        (1, "2024-01-01 02:05:00"),  # returning user: NOT new in h2
        (3, "2024-01-01 02:10:00"),
        (1, "2024-01-01 03:10:00"),  # h3: no new users at all
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = cumulative_cardinality(ev, hours=1, key="user_id").collect()
    assert [(r["new_values"], r["cum_distinct"]) for r in got] == [
        (2, 2),  # h0: users 1, 2
        (0, 2),  # h1: gap bucket
        (1, 3),  # h2: user 3 is new, user 1 is not
        (0, 3),  # h3: only returning users
    ]


def test_span_multi_matches_brute_force(spark, pos_index, doc_texts):
    from tests.test_positions import parts_stream

    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    prefix, other, slop = "s", "json", 1
    alts = rd.expand_terms("prefix", prefix)
    assert len(alts) >= 2, "need a real multi-term expansion"
    eng = rd.span_multi_near("prefix", prefix, [other], slop=slop).tolist()

    hits = []
    limit = 1 + slop
    for d, text in doc_texts.items():
        pos = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        a = [p for t in pos if t.startswith(prefix) for p in pos[t]]
        b = pos.get(other, [])
        if any(abs(pa - pb) <= limit for pa in a for pb in b):
            hits.append(d)
    assert eng == sorted(hits)
    assert len(eng) > 0


def test_span_multi_empty_expansion(spark, pos_index):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    assert rd.span_multi_near("prefix", "zzzq", ["json"]).size == 0


def test_span_multi_fuzzy_matches_brute_force(spark, pos_index, doc_texts):
    """span_multi over a FUZZY rewrite (SURVEY's last span-family
    residual): the levenshtein<=1 dictionary expansion becomes a
    span_or clause, same as the prefix rewrite. Brute force replays
    positions over the engine's own (separately gated) expansion set."""
    from yase_spark.tokenize import analyze_phrase
    from tests.test_positions import parts_stream

    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    seed, other, slop = None, "json", 2
    for cand in ["sync", "list", "hash", "page", "node"]:
        alts = [
            t for t in rd.expand_terms("fuzzy", cand, max_edits=1)
            if len(analyze_phrase(t)) == 1
        ]
        if len(alts) >= 2:
            seed = cand
            break
    assert seed is not None, "no fuzzy multi-term rewrite in this vocab"
    eng = rd.span_multi_near(
        "fuzzy", seed, [other], slop=slop, max_edits=1
    ).tolist()

    hits = []
    limit = 1 + slop
    aset = set(alts)
    for d, text in doc_texts.items():
        pos = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        a = [p for t in aset if t in pos for p in pos[t]]
        b = pos.get(other, [])
        if any(abs(pa - pb) <= limit for pa in a for pb in b):
            hits.append(d)
    assert eng == sorted(hits)
    assert len(eng) > 0


def test_terms_sharded_error_bounds_brute(spark):
    """Engine == a from-scratch replay of the ES merged-shard
    semantics, on data engineered so truncation actually bites."""
    from yase_spark.aggs import terms_sharded

    # asymmetric shards: shard 0 is a-heavy (plus unique rares pushing
    # its table past shard_size), shard 1 is b-heavy with a0 appearing
    # only 3 times — below shard 1's floor, so shard 1 truncates a0 and
    # the merged a0 count undercounts the true global 23 by exactly the
    # error bound's covered amount
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, f"a0 a1 a2 a3 r{i}"))
        else:
            rows.append((i, "b0 b1 b2 b3" + (" a0" if i < 6 else "")))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_shards, shard_size, size = 2, 4, 6
    got = terms_sharded(
        df, n_shards=n_shards, shard_size=shard_size, size=size
    ).collect()

    # brute force
    per_shard: dict[int, dict[str, int]] = {}
    for i, text in rows:
        for t in set(text.split()):
            per_shard.setdefault(i % n_shards, {}).setdefault(t, 0)
            per_shard[i % n_shards][t] += 1
    returned, floors = {}, {}
    for sh, tbl in per_shard.items():
        ranked = sorted(tbl.items(), key=lambda x: (-x[1], x[0]))
        top = ranked[:shard_size]
        floors[sh] = top[-1][1] if len(ranked) >= shard_size else 0
        for t, c in top:
            returned.setdefault(t, {})[sh] = c
    merged = []
    for t, by_shard in returned.items():
        cnt = sum(by_shard.values())
        err = sum(f for sh, f in floors.items() if sh not in by_shard)
        merged.append((t, cnt, err))
    merged.sort(key=lambda x: (-x[1], x[0]))
    want = merged[:size]
    assert [
        (r["term"], r["doc_count"], r["doc_count_error_upper_bound"])
        for r in got
    ] == want
    assert any(e > 0 for _, _, e in want), "test data must force truncation"


def test_normalize_buckets_hand_case(spark):
    from yase_spark.aggs import normalize_buckets

    rows = [
        ("x", "2024-01-01 00:10:00"),
        ("x", "2024-01-01 00:20:00"),
        ("x", "2024-01-01 02:30:00"),  # axis: n = [2, 0, 1]
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = normalize_buckets(ev, hours=1).collect()
    ns = [2, 0, 1]
    mean = 1.0
    var = sum((n - mean) ** 2 for n in ns) / 3
    for r, n in zip(got, ns):
        assert r["n"] == n
        assert r["rescale_r"] == pytest.approx(n / 2.0)
        assert r["pct_of_sum_r"] == pytest.approx(n / 3.0, abs=1e-6)
        assert r["zscore_r"] == pytest.approx((n - mean) / var**0.5, abs=1e-6)


def test_filters_agg_brute(spark):
    """filters_agg == a row-at-a-time replay: overlapping named
    buckets, disjoint _other_, NULL avg on an empty bucket."""
    from yase_spark.aggs import filters_agg

    rows = [
        (1, "en", 100, "alpha spark"),
        (2, "en", 900, "beta"),
        (3, "de", 900, "spark gamma"),
        (4, "fr", 50, "delta"),
        (5, "en", 700, "spark epsilon"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )
    filters = {
        "english": "lang = 'en'",
        "long_doc": "n_chars >= 700",
        "spark": "text like '%spark%'",
        "never": "n_chars < 0",  # empty bucket: avg must be NULL
    }
    got = {
        r["bucket"]: (r["n_docs"], r["avg_metric_r"])
        for r in filters_agg(df, filters, other_bucket=True).collect()
    }

    preds = {
        "english": lambda r: r[1] == "en",
        "long_doc": lambda r: r[2] >= 700,
        "spark": lambda r: "spark" in r[3],
        "never": lambda r: r[2] < 0,
    }
    want = {}
    for name, p in preds.items():
        hit = [r for r in rows if p(r)]
        avg = round(sum(r[2] for r in hit) / len(hit), 6) if hit else None
        want[name] = (len(hit), avg)
    other = [r for r in rows if not any(p(r) for p in preds.values())]
    want["_other_"] = (
        len(other),
        round(sum(r[2] for r in other) / len(other), 6) if other else None,
    )
    assert got == want
    assert want["never"] == (0, None)          # empty named bucket
    assert want["_other_"][0] == 1             # doc 4 matches nothing
    # buckets overlap: doc 5 is in english AND long_doc AND spark
    assert sum(n for n, _ in want.values()) > len(rows)


def test_filters_agg_validation(spark):
    from yase_spark.aggs import filters_agg

    df = spark.range(1)
    with pytest.raises(ValueError):
        filters_agg(df, {})
    with pytest.raises(ValueError, match="reserved"):
        filters_agg(df, {"_other_": "id > 0"})


def test_missing_agg_brute(spark):
    """missing + value_count over a sparse derived field, per group;
    the ES invariant n_values + n_missing == n_docs holds per row."""
    from yase_spark.aggs import missing_agg

    rows = [
        (1, "en", "uses vectorization heavily"),
        (2, "en", "no match here"),
        (3, "en", "vector ops"),
        (4, "de", "plain text"),
        (5, "de", "vectors everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    expr = "nullif(regexp_extract(text, 'vector[a-z]*', 0), '')"
    got = missing_agg(df, expr, group_col="lang").collect()
    by = {r["grp"]: (r["n_docs"], r["n_values"], r["n_missing"]) for r in got}
    assert by == {"de": (2, 1, 1), "en": (3, 2, 1)}
    for n, v, m in by.values():
        assert v + m == n


def test_categorize_text_templates(spark):
    """numeric and 0x-hex tokens wildcard to '#'; the category is the
    first-N-token normalized template; top-size by count then text."""
    from yase_spark.aggs import categorize_text

    rows = [
        (1, "Error 404 at /api/users"),
        (2, "error 500 at /api/posts"),
        (3, "ERROR 503 at 0xdeadbeef"),
        (4, "login ok for user 7"),
        (5, "login ok for user 9"),
        (6, "???"),  # tokenizes to nothing -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = categorize_text(df, "text", prefix_tokens=3, size=10).collect()
    assert [(r["category"], r["n_docs"], r["exemplar_doc_id"]) for r in got] == [
        ("error # at", 3, 3),
        ("login ok for", 2, 5),
    ]

    with pytest.raises(ValueError):
        categorize_text(df, "text", prefix_tokens=0)


def test_categorize_text_size_and_ties(spark):
    from yase_spark.aggs import categorize_text

    rows = [(1, "b x"), (2, "a y"), (3, "c z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = categorize_text(df, "text", prefix_tokens=2, size=2).collect()
    # all counts tie at 1 -> lexicographic category order, capped at 2
    assert [r["category"] for r in got] == ["a y", "b x"]


def test_boxplot_agg_matches_numpy(spark):
    """Exact quartiles == numpy linear interpolation; whiskers are the
    nearest observed values inside the Tukey fences (a planted outlier
    is excluded from the whisker but still sets max)."""
    from yase_spark.aggs import boxplot_agg

    vals = [10.0, 12.0, 13.0, 15.0, 16.0, 18.0, 20.0, 22.0, 500.0]
    rows = [(i, "s0", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    r = boxplot_agg(df, "n_chars", group_col="source").collect()[0]

    q1, q2, q3 = (float(np.percentile(vals, p)) for p in (25, 50, 75))
    iqr = q3 - q1
    lo_fence, hi_fence = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    lower = min(v for v in vals if v >= lo_fence)
    upper = max(v for v in vals if v <= hi_fence)
    assert r["min_r"] == pytest.approx(min(vals))
    assert r["q1_r"] == pytest.approx(q1)
    assert r["median_r"] == pytest.approx(q2)
    assert r["q3_r"] == pytest.approx(q3)
    assert r["max_r"] == pytest.approx(max(vals))   # outlier IS the max
    assert r["lower_r"] == pytest.approx(lower)
    assert r["upper_r"] == pytest.approx(upper)
    assert r["upper_r"] < 500.0                     # ...but not the whisker


def test_boxplot_agg_groups_independent(spark):
    from yase_spark.aggs import boxplot_agg

    rows = [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 10.0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    got = {r["grp"]: r for r in boxplot_agg(df, "n_chars").collect()}
    assert got["a"]["median_r"] == pytest.approx(2.0)
    # single-value group: every stat collapses to the value
    b = got["b"]
    assert {b[c] for c in ("min_r", "q1_r", "median_r", "q3_r", "max_r",
                           "lower_r", "upper_r")} == {10.0}


# ----------------------------------------- distance_feature query
def test_distance_feature_replay(spark, tiny_index):
    from yase_spark.index import build_index  # noqa: F401  (fixture dep)

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json page"
    bm25 = {d: s for _, d, s in rd.topk(q, 10**9, use_wand=False)}
    dl = {
        r["doc_id"]: r["doc_len"]
        for r in rd.cat.read(spark, "docs").select("doc_id", "doc_len").collect()
    }
    origin, pivot, boost = 900.0, 150.0, 2.0
    got = {
        r["doc_id"]: r["score"]
        for r in rd.topk_distance_feature(
            q, "doc_len", origin=origin, pivot=pivot, boost=boost, k=10**9
        ).collect()
    }
    assert set(got) == set(bm25)
    for d in bm25:
        want = bm25[d] + boost * pivot / (pivot + abs(float(dl[d]) - origin))
        assert got[d] == pytest.approx(want, rel=1e-9)
    # proximity semantics: the boost is maximal AT the origin and
    # monotone-decreasing in |dl - origin|
    feats = sorted(
        (abs(float(dl[d]) - origin), got[d] - bm25[d]) for d in bm25
    )
    assert all(f <= boost for _, f in feats)
    for (d1, f1), (d2, f2) in zip(feats, feats[1:]):
        if d1 < d2:
            assert f1 > f2
    with pytest.raises(ValueError, match="pivot"):
        rd.topk_distance_feature(q, "doc_len", origin=0.0, pivot=0.0)


# ----------------------------------------- moving_fn / bucket_script
def test_moving_fn_hand_case(spark):
    from yase_spark.aggs import moving_fn

    rows = [
        ("x", "2024-01-01 00:10:00"),
        ("x", "2024-01-01 00:20:00"),
        ("x", "2024-01-01 00:30:00"),   # h0: 3
        ("x", "2024-01-01 01:30:00"),   # h1: 1
        # h2: gap -> 0
        ("x", "2024-01-01 03:10:00"),
        ("x", "2024-01-01 03:20:00"),   # h3: 2
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    alpha = 0.3
    got = moving_fn(ev, hours=1, window=3, alpha=alpha).collect()
    ns = [3, 1, 0, 2]

    def ewma(vs):
        acc = float(vs[0])
        for v in vs[1:]:
            acc = v * alpha + acc * (1 - alpha)
        return acc

    for i, r in enumerate(got):
        w = ns[max(0, i - 2): i + 1]
        assert r["n"] == ns[i]
        assert r["mov_min"] == min(w)
        assert r["mov_max"] == max(w)
        assert r["mov_sum"] == sum(w)
        m = sum(w) / len(w)
        std = (sum(v * v for v in w) / len(w) - m * m) ** 0.5
        assert r["mov_stddev_r"] == pytest.approx(std, abs=1e-6)
        assert r["ewma_r"] == pytest.approx(ewma(w), abs=1e-6)


def test_moving_fn_validation(spark):
    from yase_spark.aggs import moving_fn

    ev = spark.createDataFrame(
        [("x", "2024-01-01 00:00:00")], "event_type string, ts_s string"
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="window"):
        moving_fn(ev, window=0)
    with pytest.raises(ValueError, match="alpha"):
        moving_fn(ev, alpha=0.0)


def test_bucket_script_hand_case(spark):
    from yase_spark.aggs import bucket_script

    rows = [
        ("error", "2024-01-01 00:05:00", 2.0),
        ("click", "2024-01-01 00:15:00", 4.0),
        ("click", "2024-01-01 00:25:00", 6.0),   # h0: 1/3 err, avg 4.0
        ("click", "2024-01-01 01:05:00", 10.0),  # h1: 0/1 err
        ("error", "2024-01-01 02:05:00", 1.0),   # h2: 1/1 err
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    ).select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    got = bucket_script(ev, hours=1, numer_type="error").collect()
    assert [
        (r["n_total"], r["n_numer"], r["rate_r"], r["intensity_r"],
         r["selected"])
        for r in got
    ] == [
        (3, 1, pytest.approx(1 / 3, abs=1e-6), pytest.approx(4.0), True),
        (1, 0, 0.0, 10.0, False),
        (1, 1, 1.0, 1.0, True),
    ]


# ------------------------------------- geo_distance rings aggregation
def test_geo_distance_rings_hand(spark):
    import math as m

    from yase_spark.geo import geo_distance_rings

    ids = list(range(1, 60))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    edges = [4000.0, 9000.0]
    got = geo_distance_rings(df, 10.0, 20.0, edges_km=edges).collect()

    def hav(lat, lon):
        dphi = m.radians(lat) - m.radians(10.0)
        dl = m.radians(lon) - m.radians(20.0)
        a = (
            m.sin(dphi / 2) ** 2
            + m.cos(m.radians(10.0)) * m.cos(m.radians(lat))
            * m.sin(dl / 2) ** 2
        )
        return 2 * 6371.0088 * m.asin(m.sqrt(a))

    rings = {0: [], 1: [], 2: []}
    for i in ids:
        lat = (i * 7919) % 18000 / 100.0 - 90.0
        lon = (i * 104729) % 36000 / 100.0 - 180.0
        d = hav(lat, lon)
        rings[0 if d < 4000 else 1 if d < 9000 else 2].append(d)
    assert [(r["ring"], r["from_km"], r["to_km"], r["doc_count"]) for r in got] == [
        (0, None, 4000.0, len(rings[0])),
        (1, 4000.0, 9000.0, len(rings[1])),
        (2, 9000.0, None, len(rings[2])),
    ]
    for r in got:
        ds = rings[r["ring"]]
        if ds:
            assert r["avg_km_r"] == pytest.approx(sum(ds) / len(ds), abs=1e-5)
        else:
            assert r["avg_km_r"] is None

    with pytest.raises(ValueError, match="increasing"):
        geo_distance_rings(df, 0, 0, edges_km=[5.0, 5.0])


def test_geo_distance_rings_empty_ring_reported(spark):
    from yase_spark.geo import geo_distance_rings

    df = spark.createDataFrame([(1,)], "doc_id long")
    got = geo_distance_rings(df, 0.0, 0.0, edges_km=[1.0, 2.0]).collect()
    assert len(got) == 3
    assert sum(r["doc_count"] for r in got) == 1
    assert sum(1 for r in got if r["doc_count"] == 0) == 2


# --------------------------------------- context-aware completion
def test_contexts_complete_max_boost(spark):
    from yase_spark.expand import contexts_complete

    rows = [
        (1, "en", "tableau table"),
        (2, "en", "table set"),
        (3, "de", "table tab"),
        (4, "de", "table tab"),
        (5, "fr", "table tabby tabby"),  # fr NOT requested: invisible
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = contexts_complete(
        df, "ta", {"en": 2.0, "de": 1.5}, k=10, ctx_col="lang"
    ).collect()
    # df(en): table 2, tableau 1; df(de): table 2, tab 2
    # score = max(2.0*df_en, 1.5*df_de): table max(4,3)=4; tab 3; tableau 2
    assert [(r["term"], r["score_r"]) for r in got] == [
        ("table", 4.0), ("tab", 3.0), ("tableau", 2.0),
    ]
    with pytest.raises(ValueError, match="context"):
        contexts_complete(df, "ta", {})
    with pytest.raises(ValueError, match="prefix"):
        contexts_complete(df, "", {"en": 1.0})


# --------------------------------------- frequent_item_sets
def test_frequent_item_sets_brute(spark):
    import itertools as it

    from yase_spark.aggs import frequent_item_sets

    rows = [
        (1, "a b c"),
        (2, "a b c"),
        (3, "a b"),
        (4, "a c x"),
        (5, "b y"),
        (6, "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    min_support, vocab_size = 0.34, 4  # threshold = ceil(0.34*6) = 3
    got = [
        (r["item_set"], r["size"], r["support"])
        for r in frequent_item_sets(
            df, vocab_size=vocab_size, min_support=min_support, max_size=3
        ).collect()
    ]

    # reference: full enumeration + closedness
    docs = {d: set(t.split()) for d, t in rows}
    dfreq = {}
    for s in docs.values():
        for t in s:
            dfreq[t] = dfreq.get(t, 0) + 1
    vocab = set(
        t for t, _ in sorted(dfreq.items(), key=lambda x: (-x[1], x[0]))[:vocab_size]
    )
    support = {}
    for k in (1, 2, 3):
        for combo in it.combinations(sorted(vocab), k):
            sup = sum(1 for s in docs.values() if set(combo) <= s)
            if sup >= 3:
                support[combo] = sup
    closed = [
        (" ".join(c), len(c), sup)
        for c, sup in support.items()
        if not any(
            set(c) < set(c2) and s2 == sup for c2, s2 in support.items()
        )
    ]
    closed.sort(key=lambda x: (-x[2], x[0]))
    assert got == closed
    # the hand-checkable core: {a,b,c} (support 3) is closed and
    # absorbs {b,c} (equal support 3); {a,c} (support 4) absorbs
    # {c} (equal support 4); {a} and {b} (support 5) stay
    assert ("a b c", 3, 3) in got
    assert ("a b", 2, 4) in got
    assert ("a c", 2, 4) in got
    assert ("b c", 2, 3) not in got
    assert ("c", 1, 4) not in got
    assert ("a", 1, 5) in got and ("b", 1, 5) in got


def test_frequent_item_sets_space_containing_terms(spark):
    """Under a custom split, a TERM may itself contain a space; the
    r6 array-keyed aggregate must keep such a 1-set distinct from a
    genuine 2-set whose space-join collides with it (the string-keyed
    shape merged their supports and misclassified the size)."""
    from yase_spark.aggs import frequent_item_sets

    rows = [(i, "x y,z") for i in range(4)] + [(9, "x,y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["item_set"], r["size"], r["support"])
        for r in frequent_item_sets(
            df, vocab_size=4, min_support=0.2, split=","
        ).collect()
    ]
    # closedness folds every 1-set into its equal-support superset;
    # the set {'x y','z'} and the set {'x','y'} survive — and the
    # latter's rendering 'x y' must NOT have absorbed the 4-doc
    # support of the space-containing TERM 'x y'
    assert got == [("x y z", 2, 4), ("x y", 2, 1)]


def test_frequent_item_sets_validation(spark):
    from yase_spark.aggs import frequent_item_sets

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_size"):
        frequent_item_sets(df, max_size=4)
    with pytest.raises(ValueError, match="min_support"):
        frequent_item_sets(df, min_support=0.0)
    with pytest.raises(ValueError, match="min_set_size"):
        frequent_item_sets(df, min_set_size=5)


# ----------------------------------------- ip_range / percentiles_bucket
def test_ip_range_hand(spark):
    from yase_spark.aggs import ip_range_agg, with_ip

    ids = list(range(1, 200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    ranges = [(None, "64.0.0.0"), ("64.0.0.0", "192.0.0.0"),
              ("128.0.0.0", None)]
    got = {r["bucket"]: r["doc_count"]
           for r in ip_range_agg(df, ranges).collect()}
    ips = [(i * 2654435761) % 2**32 for i in ids]
    b0, b1, b2 = 64 << 24, 192 << 24, 128 << 24
    want = {
        "*-64.0.0.0": sum(1 for v in ips if v < b0),
        "64.0.0.0-192.0.0.0": sum(1 for v in ips if b0 <= v < b1),
        "128.0.0.0-*": sum(1 for v in ips if v >= b2),
    }
    assert got == want
    # overlap: the middle and last ranges both see [128, 192) ips
    assert sum(want.values()) > len(ids) * 0.99  # overlapping by design

    # the dotted string round-trips the integer
    row = with_ip(df).filter(F.col("doc_id") == 7).collect()[0]
    parts = [int(x) for x in row["ip_s"].split(".")]
    assert ((parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8)
            | parts[3]) == row["ip"]

    with pytest.raises(ValueError, match="range"):
        ip_range_agg(df, [])
    with pytest.raises(ValueError, match="IPv4"):
        ip_range_agg(df, [("1.2.3", None)])


def test_percentiles_bucket_hand(spark):
    import numpy as np

    from yase_spark.aggs import percentiles_bucket

    rows = (
        [("x", "2024-01-01 00:10:00")] * 3
        + [("x", "2024-01-01 01:10:00")]
        # h2 gap -> 0
        + [("x", "2024-01-01 03:10:00")] * 2
    )
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    r = percentiles_bucket(ev, hours=1).collect()[0]
    ns = [3.0, 1.0, 0.0, 2.0]
    assert r["p25_r"] == pytest.approx(float(np.percentile(ns, 25)), abs=1e-6)
    assert r["p50_r"] == pytest.approx(float(np.percentile(ns, 50)), abs=1e-6)
    assert r["p75_r"] == pytest.approx(float(np.percentile(ns, 75)), abs=1e-6)


# --------------------------------------- substring dedup REMOVAL
def _brute_dedup_substrings(rows, k):
    """From-scratch replay: windows by VALUE, keeper = globally-first
    (doc_id, pos) per duplicated substring, cut the rest, fold."""
    wins = {}
    for d, t in rows:
        for p in range(1, len(t) - k + 2):
            wins.setdefault(t[p - 1: p - 1 + k], []).append((d, p))
    cuts = {}
    for occs in wins.values():
        if len(occs) >= 2:
            keeper = min(occs)
            for d, p in occs:
                if (d, p) != keeper:
                    cuts.setdefault(d, []).append(p)
    out = {}
    for d, t in rows:
        ps = sorted(cuts.get(d, []))
        txt, cur = "", 1
        for p in ps:
            if p > cur:
                txt += t[cur - 1: p - 1]
            cur = max(cur, p + k)
        txt += t[cur - 1:]
        out[d] = txt
    return out


def test_dedup_substrings_brute(spark):
    from yase_spark.neardup import dedup_substrings

    pasta = "x" * 0 + "the same copied paragraph body"  # len 30
    rows = [
        (1, f"alpha {pasta} omega"),
        (2, f"beta {pasta} gamma"),          # later copy: cut
        (3, f"{pasta} {pasta} tail"),        # intra-doc repeat too
        (4, "completely novel text with nothing repeated at all here"),
        (5, "tiny"),                          # below k: untouched
    ]
    k = 25
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["removed_chars"])
        for r in dedup_substrings(df, k=k).collect()
    }
    want = _brute_dedup_substrings(rows, k)
    for d, t in rows:
        assert got[d][0] == want[d], d
        assert got[d][1] == len(t) - len(want[d])
    # exactly one copy of the pasta survives across the corpus
    joined = " | ".join(got[d][0] for d, _ in rows)
    assert joined.count(pasta) == 1
    # the globally-first occurrence (doc 1) is the survivor
    assert pasta in got[1][0]
    assert got[4] == (rows[3][1], 0)
    assert got[5] == ("tiny", 0)


def test_dedup_substrings_randomized(spark):
    import numpy as np

    from yase_spark.neardup import dedup_substrings

    rng = np.random.default_rng(23)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = []
    for d in range(1, 13):
        n = int(rng.integers(10, 30))
        rows.append((d, "".join(rng.choice(vocab, size=n))))
    k = 8
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_substrings(df, k=k).collect()
    }
    want = _brute_dedup_substrings(rows, k)
    assert got == want


# --------------------------------------- random_sampler agg
def test_random_sampler_hand(spark):
    from yase_spark.aggs import random_sampler_agg

    rows = [(i, "en" if i % 3 else "de") for i in range(1, 400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    p = 0.25
    got = {r["grp"]: r for r in random_sampler_agg(df, p).collect()}
    thresh = int(p * 2**32)
    for grp in ("en", "de"):
        ids = [i for i, l in rows if l == grp]
        sampled = sum(1 for i in ids if (i * 2654435761) % 2**32 < thresh)
        r = got[grp]
        assert r["sampled_docs"] == sampled
        assert r["exact_docs"] == len(ids)
        assert r["est_docs_r"] == pytest.approx(sampled / p, abs=1e-6)
        # the estimator lands near truth (hash uniformity sanity)
        assert abs(r["est_docs_r"] - len(ids)) / len(ids) < 0.35
    with pytest.raises(ValueError, match="probability"):
        random_sampler_agg(df, 0.0)
