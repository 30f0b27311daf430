"""Round-5 fourth-wave operator gates: mget, terms-lookup, nested
query, runtime fields, sliced scroll, geo_polygon, moving_percentiles,
sampler agg.

Each operator also carries a full driver oracle (__spark_entry__:
mget_docs / terms_lookup_topk / nested_topk / runtime_field_topk /
sliced_export / geo_polygon / moving_percentiles_agg / sampler_agg);
these tests gate the semantics against driver-side brute-force
recomputations, hand-built divergence cases, and the validation rules.
"""

import datetime
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.fields import runtime_field_topk, with_runtime_fields
from yase_spark.geo import geo_polygon
from yase_spark.lookup import lookup_terms, mget, terms_lookup
from yase_spark.mixing import sliced_scroll
from yase_spark.nested import nested_match

DOCS = [
    # (doc_id, text, lang, source)
    (1, "spark stream window join hash", "en", "s0"),
    (2, "scan sort part stream stream", "en", "s0"),
    (3, "window window window hash", "de", "s1"),
    # flat-matches the nested query (long token + separate s-token)
    # but has NO single token that is both long and s-prefixed
    (4, "column column scan sort", "de", "s1"),
    (5, "", "fr", "s2"),
    (6, "stream column spark spark spark", "fr", "s2"),
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t, lg, s, len(t)) for i, t, lg, s in DOCS]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).persist()


# ---------------------------------------------------------------- mget


def test_mget_order_and_found(docs):
    out = mget(docs, [3, 99, 1], cols=("lang", "source", "n_chars")).collect()
    assert [r["doc_id"] for r in out] == [3, 99, 1]
    assert [r["req_pos"] for r in out] == [0, 1, 2]
    assert [r["found"] for r in out] == [True, False, True]
    miss = out[1]
    assert miss["lang"] is None and miss["n_chars"] is None
    assert out[0]["lang"] == "de" and out[2]["source"] == "s0"


def test_mget_validation(docs):
    with pytest.raises(ValueError, match="at least one"):
        mget(docs, [])
    with pytest.raises(ValueError, match="unique"):
        mget(docs, [1, 1])


# ------------------------------------------------------- terms lookup


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_lookup_terms_cap_tf_desc_term_asc(docs):
    # doc 6: stream x1, column x1, spark x3 -> top-2 = spark, column
    got = [r["term"] for r in lookup_terms(docs, 6, max_terms=2).collect()]
    assert got == ["spark", "column"]


def test_terms_lookup_matches_bruteforce(docs):
    got = terms_lookup(docs, 6, max_terms=2, k=10).collect()
    # brute force: terms {spark, column}; matched distinct count per doc
    want = {}
    for i, t, _l, _s in DOCS:
        m = len({"spark", "column"} & set(_toks(t)))
        if m:
            want[i] = m
    assert {(r["doc_id"], r["matched_terms"]) for r in got} == set(want.items())
    # ranking: matched desc, doc_id asc
    ranks = [(r["matched_terms"], r["doc_id"]) for r in got]
    assert ranks == sorted(ranks, key=lambda x: (-x[0], x[1]))
    # the lookup doc itself is a hit
    assert 6 in {r["doc_id"] for r in got}


# ------------------------------------------------------- nested query


def test_nested_same_object_vs_flat(docs):
    out = nested_match(docs, min_len=6, prefix="s", k=10).collect()
    ids = {r["doc_id"] for r in out}
    # docs 1/2/6 contain 'stream' (len 6, s-prefix): true same-object hits
    assert ids == {1, 2, 6}
    # doc 4 has long tokens (column) AND s-tokens (scan, sort) but no
    # single token with both -> flat would match, nested must not
    assert 4 not in ids
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["n_hits"] == 2  # stream twice
    assert by_id[2]["first_pos"] == 4  # 1-based among non-empty tokens
    assert all(r["flat_match"] for r in out)


def test_nested_flat_divergence_column_present(docs):
    # the flat verdict for doc 4 is True even though nested rejects it:
    # checked via the raw projection (doc 4 is filtered out of topk)
    from yase_spark.nested import SPLIT

    toks = f"filter(split(lower(text), '{SPLIT}'), t -> t <> '')"
    row = (
        docs.filter("doc_id = 4")
        .select(
            F.expr(f"exists({toks}, t -> length(t) >= 6)").alias("has_long"),
            F.expr(f"exists({toks}, t -> startswith(t, 's'))").alias("has_s"),
        )
        .first()
    )
    assert row["has_long"] and row["has_s"]


def test_nested_validation(docs):
    with pytest.raises(ValueError):
        nested_match(docs, min_len=0)
    with pytest.raises(ValueError):
        nested_match(docs, prefix="s'; drop")


# ------------------------------------------------------ runtime fields


def test_runtime_fields_chain_and_shadow(docs):
    rt = with_runtime_fields(
        docs,
        {"n_tokens": "size(split(text, ' '))", "double_tok": "n_tokens * 2"},
    )
    r = rt.filter("doc_id = 1").first()
    assert r["double_tok"] == 2 * r["n_tokens"]
    with pytest.raises(ValueError, match="shadows"):
        with_runtime_fields(docs, {"lang": "'x'"})


def test_runtime_field_topk_bruteforce(docs):
    out = runtime_field_topk(
        docs,
        {
            "n_tokens": "size(filter(split(lower(text), '[^a-z0-9]+'), t -> t <> ''))",
            "cpt": "cast(n_chars as double) / cast(greatest(n_tokens, 1) as double)",
        },
        where="n_tokens >= 4",
        order_by="cpt",
        k=3,
    ).collect()
    want = []
    for i, t, _l, _s in DOCS:
        nt = len(_toks(t))
        if nt >= 4:
            want.append((i, nt, len(t) / max(nt, 1)))
    want.sort(key=lambda x: (-x[2], x[0]))
    assert [(r["doc_id"], r["n_tokens"]) for r in out] == [
        (i, nt) for i, nt, _ in want[:3]
    ]
    for r, (_, _, cpt) in zip(out, want):
        assert abs(r["cpt"] - cpt) < 1e-12


# ------------------------------------------------------- sliced scroll


def test_slices_partition_the_corpus(docs):
    n = 3
    seen = []
    for i in range(n):
        seen.append({r["doc_id"] for r in sliced_scroll(docs, i, n).collect()})
    allids = set().union(*seen)
    assert allids == {i for i, *_ in DOCS}
    for a in range(n):
        for b in range(a + 1, n):
            assert not (seen[a] & seen[b])


def test_slice_deterministic_and_validated(docs):
    a = [r["doc_id"] for r in sliced_scroll(docs, 1, 3).collect()]
    b = [r["doc_id"] for r in sliced_scroll(docs, 1, 3).collect()]
    assert a == b == sorted(a)
    with pytest.raises(ValueError):
        sliced_scroll(docs, 3, 3)
    with pytest.raises(ValueError):
        sliced_scroll(docs, 0, 0)


# -------------------------------------------------------- geo_polygon


def test_geo_polygon_matches_integer_bruteforce(spark):
    ids = list(range(1, 400))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    V = [(4000, 3000), (12000, 2000), (16000, 9000), (10000, 15000), (3000, 11000)]
    out = geo_polygon(docs, V, k=1000).collect()

    def inside(i):
        y, x = (i * 7919) % 18000, (i * 104729) % 36000
        for j in range(len(V)):
            x1, y1 = V[j]
            x2, y2 = V[(j + 1) % len(V)]
            if (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) < 0:
                return False
        return True

    want = [i for i in ids if inside(i)]
    assert [r["doc_id"] for r in out] == want
    assert all(r["inside_total"] == len(want) for r in out)
    # coordinates equal the with_geo derivation
    for r in out[:5]:
        assert r["lat"] == ((r["doc_id"] * 7919) % 18000) / 100.0 - 90.0
    with pytest.raises(ValueError):
        geo_polygon(docs, V[:2])


# ------------------------------------------------- moving percentiles


def test_moving_percentiles_bruteforce(spark):
    from yase_spark.aggs import moving_percentiles

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # key 'a': counts 3,1,0(gap),5,2 across hours 0..4
    for h, c in [(0, 3), (1, 1), (3, 5), (4, 2)]:
        for j in range(c):
            rows.append((t0 + datetime.timedelta(hours=h, minutes=j), "a"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = moving_percentiles(ev, hours=1, window=3, percents=(0.5, 0.9)).collect()
    series = [3, 1, 0, 5, 2]
    assert [r["n"] for r in out] == series
    for idx, r in enumerate(out):
        w = series[max(0, idx - 2) : idx + 1]
        assert r["p50_r"] == pytest.approx(
            np.percentile(w, 50, method="linear"), abs=1e-6
        )
        assert r["p90_r"] == pytest.approx(
            np.percentile(w, 90, method="linear"), abs=1e-6
        )
    with pytest.raises(ValueError):
        moving_percentiles(ev, window=0)
    with pytest.raises(ValueError):
        moving_percentiles(ev, percents=(1.5,))


# --------------------------------------------------------- sampler agg


def test_sampler_agg_bruteforce(docs):
    from yase_spark.aggs import sampler_agg

    out = sampler_agg(
        docs, ["spark", "stream"], n_shards=2, shard_size=1
    ).collect()
    # scores (distinct matched terms): 1->2, 2->1, 6->2
    # shards: doc%2 -> shard1:{1}, shard0:{2,6}; top-1 per shard by
    # (score desc, doc_id asc): shard1 keeps 1, shard0 keeps 6
    by_lang = {r["lang"]: r for r in out}
    assert set(by_lang) == {"en", "fr"}
    assert by_lang["en"]["n_docs"] == 1 and by_lang["en"]["sum_score"] == 2
    assert by_lang["fr"]["n_docs"] == 1 and by_lang["fr"]["sum_score"] == 2
    assert by_lang["fr"]["avg_chars_r"] == pytest.approx(
        len("stream column spark spark spark"), abs=1e-6
    )
    with pytest.raises(ValueError):
        sampler_agg(docs, [], n_shards=2)
    with pytest.raises(ValueError):
        sampler_agg(docs, ["x"], n_shards=0)


def test_moving_percentiles_randomized_sweep(spark):
    """30 random (seeded) series vs numpy's linear-interpolation
    percentile over every trailing window — the quantile_cont lerp
    must agree everywhere, not just on the hand case."""
    import random

    from yase_spark.aggs import moving_percentiles

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 2, 1)
    for trial in range(30):
        n_h = rng.randint(2, 8)
        counts = [rng.randint(0, 6) for _ in range(n_h)]
        if not any(counts):
            counts[0] = 1
        rows = []
        for h, c in enumerate(counts):
            for j in range(c):
                rows.append((t0 + datetime.timedelta(hours=h, minutes=j), "k"))
        # drop leading/trailing zero-count hours: the dense axis starts
        # at the first OBSERVED bucket
        lo = next(i for i, c in enumerate(counts) if c)
        hi = max(i for i, c in enumerate(counts) if c)
        series = counts[lo : hi + 1]
        w = rng.randint(1, 5)
        ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
        out = moving_percentiles(ev, hours=1, window=w, percents=(0.25, 0.5, 0.9))
        got = out.collect()
        assert [r["n"] for r in got] == series, (trial, counts)
        for idx, r in enumerate(got):
            win = series[max(0, idx - w + 1) : idx + 1]
            for p, col in ((25, "p25_r"), (50, "p50_r"), (90, "p90_r")):
                assert r[col] == pytest.approx(
                    np.percentile(win, p, method="linear"), abs=1e-6
                ), (trial, idx, p, win)
