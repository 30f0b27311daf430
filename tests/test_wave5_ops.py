"""Round-5 fifth-wave operator gates: sparse_vector scoring,
geohash_grid (vs a from-scratch reference encoder), geo_line, the
search-template renderer, field_caps.

Driver oracles: sparse_vector_topk / geohash_grid / geo_line /
template_topk / field_caps in __spark_entry__.
"""

import math
import re

import pytest

from yase_spark.features import sparse_vector_topk
from yase_spark.geo import GEOHASH_ALPHABET, geo_line, geohash_expr, geohash_grid
from yase_spark.lookup import field_caps
from yase_spark.qparse import render_template

DOCS = [
    (1, "spark stream window join hash", "en", "s0"),
    (2, "scan sort part stream stream", "en", "s0"),
    (3, "window window window hash", "de", "s1"),
    (4, "column column scan sort", "de", "s1"),
    (6, "stream column spark spark spark", "fr", "s2"),
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t, lg, s, len(t)) for i, t, lg, s in DOCS]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).persist()


# ------------------------------------------------------ sparse vector


def test_sparse_vector_matches_bruteforce(docs):
    w = {"spark": 2.0, "stream": 1.5}
    out = sparse_vector_topk(docs, w, k=10).collect()
    want = {}
    for i, t, *_ in DOCS:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        # exact BIGINT micro-unit replay (HALF_UP like F.round)
        s_u6 = sum(
            int(math.floor(qw * math.log(1 + toks.count(term)) * 1e6 + 0.5))
            for term, qw in w.items()
            if term in toks
        )
        if s_u6 > 0:
            want[i] = round(s_u6 / 1e6, 6)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["rank"], r["doc_id"]) for r in out] == [
        (j + 1, i) for j, (i, _) in enumerate(ranked)
    ]
    for r in out:
        assert r["score_r"] == want[r["doc_id"]]
    with pytest.raises(ValueError):
        sparse_vector_topk(docs, {})


def test_sparse_vector_lanes_agree(docs):
    """The r6 map-side lane (<= 16 terms) and the broadcast-join lane
    (> 16 terms) must produce identical rows: padding the query map
    with absent terms (zero contribution to every doc, no eligibility
    change) flips the lane without changing the answer."""
    w = {"spark": 2.0, "stream": 1.5, "window": 1.0}
    big = dict(w)
    for i in range(15):
        big[f"zz_absent_{i}"] = 3.0  # matches nothing in the fixture
    small_rows = [tuple(r) for r in sparse_vector_topk(docs, w, k=10).collect()]
    big_rows = [tuple(r) for r in sparse_vector_topk(docs, big, k=10).collect()]
    assert small_rows == big_rows and len(small_rows) > 0


# ----------------------------------------------------------- geohash


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """From-scratch bisection encoder (the textbook algorithm)."""
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    for _ in range(5 * precision):
        r = lon_r if even else lat_r
        v = lon if even else lat
        mid = (r[0] + r[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            r[0] = mid
        else:
            r[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_expr_matches_reference_encoder(spark):
    ids = list(range(1, 300))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["gh"]
        for r in docs.selectExpr(
            "doc_id",
            "(doc_id * 7919) % 18000 AS ilat",
            "(doc_id * 104729) % 36000 AS ilon",
        )
        .selectExpr("doc_id", geohash_expr(4) + " AS gh")
        .collect()
    }
    for i in ids:
        lat = ((i * 7919) % 18000) / 100.0 - 90.0
        lon = ((i * 104729) % 36000) / 100.0 - 180.0
        assert got[i] == _ref_geohash(lat, lon, 4), (i, lat, lon)
    with pytest.raises(ValueError):
        geohash_expr(0)


def test_geohash_grid_counts(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 200)], "doc_id long")
    out = geohash_grid(docs, precision=1, size=50).collect()
    assert sum(r["doc_count"] for r in out) == 199
    counts = [(r["doc_count"], r["geohash"]) for r in out]
    assert counts == sorted(counts, key=lambda x: (-x[0], x[1]))


# ----------------------------------------------------------- geo_line


def test_geo_line_truncation_and_order(docs):
    out = {r["grp"]: r for r in geo_line(docs, size=2).collect()}
    s0 = out["s0"]
    assert s0["n_points"] == 2 and s0["complete"]
    # doc 1 then doc 2, integer lattice pairs
    p1 = f"{(1 * 104729) % 36000}:{(1 * 7919) % 18000}"
    p2 = f"{(2 * 104729) % 36000}:{(2 * 7919) % 18000}"
    assert s0["line"] == f"{p1},{p2}"
    big = geo_line(docs.filter("source = 's1'"), size=1).collect()[0]
    assert big["n_points"] == 2 and not big["complete"]
    assert "," not in big["line"]
    with pytest.raises(ValueError):
        geo_line(docs, size=0)


# ------------------------------------------------------ template / caps


def test_render_template_strict():
    assert (
        render_template("({{a}} OR {{b}}) AND c", {"a": "x", "b": "y"})
        == "(x OR y) AND c"
    )
    with pytest.raises(ValueError, match="missing"):
        render_template("{{a}}", {})
    with pytest.raises(ValueError, match="unused"):
        render_template("{{a}}", {"a": "x", "b": "y"})
    with pytest.raises(ValueError, match="braces"):
        render_template("{{a}}", {"a": "{{b}}"})


def test_field_caps_mapping(docs):
    out = {r["field"]: r for r in field_caps(docs).collect()}
    assert set(out) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert out["text"]["es_type"] == "text" and not out["text"]["aggregatable"]
    assert out["lang"]["es_type"] == "keyword" and out["lang"]["aggregatable"]
    assert out["doc_id"]["es_type"] == "long" and out["doc_id"]["searchable"]
