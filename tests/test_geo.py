"""Geo suite (geo.py): haversine against known ground truth, the
radius query's circumscribing-rectangle prefilter proven LOSSLESS
(identical to the unprefiltered exact filter, including at the
near-pole degenerate band), geotile assignment against an independent
pure-Python slippy-map reference, and top-k against a naive sort.
"""

import math

import pytest
from pyspark.sql import functions as F

from yase_spark.geo import (
    EARTH_RADIUS_KM,
    MERCATOR_MAX_LAT,
    _radius_bbox,
    geo_bounding_box,
    geo_distance_topk,
    geo_within,
    geotile_grid,
    haversine_km,
    with_geo,
)


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def geo_docs(spark):
    df = with_geo(spark.range(0, 400).withColumnRenamed("id", "doc_id"))
    return df, {r["doc_id"]: (r["lat"], r["lon"]) for r in df.collect()}


def test_haversine_known_distance(spark):
    # Paris -> London, surveyed great-circle distance ~343.5 km
    row = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
            ).alias("d")
        )
        .first()
    )
    assert abs(row["d"] - 343.5) < 1.0
    assert abs(row["d"] - _hav(48.8566, 2.3522, 51.5074, -0.1278)) < 1e-9


def test_coords_cover_both_hemispheres(geo_docs):
    _, coords = geo_docs
    lats = [la for la, _ in coords.values()]
    lons = [lo for _, lo in coords.values()]
    assert min(lats) < -45 and max(lats) > 45
    assert min(lons) < -90 and max(lons) > 90


def test_bbox_matches_naive(geo_docs):
    df, coords = geo_docs
    got = {r["doc_id"] for r in geo_bounding_box(df, -30, 30, -90, 90).collect()}
    want = {
        i
        for i, (la, lo) in coords.items()
        if -30 <= la <= 30 and -90 <= lo <= 90
    }
    assert got == want and got


def test_within_prefilter_is_lossless(geo_docs):
    df, coords = geo_docs
    for center, radius in [((10.0, 20.0), 3000.0), ((89.0, 0.0), 1500.0)]:
        got = {r["doc_id"]: r["dist_km_r"] for r in geo_within(df, *center, radius).collect()}
        want = {
            i: round(_hav(*center, la, lo), 3)
            for i, (la, lo) in coords.items()
            if _hav(*center, la, lo) <= radius
        }
        assert got == want and got, f"center={center}"


def test_radius_bbox_degenerates_at_pole():
    lo_lat, hi_lat, lo_lon, hi_lon = _radius_bbox(89.5, 10.0, 500.0)
    assert hi_lat == 90.0 and (lo_lon, hi_lon) == (-180.0, 180.0)


def test_topk_matches_naive_sort(geo_docs):
    df, coords = geo_docs
    got = [r["doc_id"] for r in geo_distance_topk(df, 10.0, 20.0, k=7).collect()]
    want = sorted(coords, key=lambda i: (_hav(10.0, 20.0, *coords[i]), i))[:7]
    assert got == want


def _ref_tile(lat, lon, zoom):
    n = 2**zoom
    lat = max(-MERCATOR_MAX_LAT, min(MERCATOR_MAX_LAT, lat))
    x = min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1)
    phi = math.radians(lat)
    y = min(
        int(math.floor((1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi) / 2.0 * n)),
        n - 1,
    )
    return f"{zoom}/{x}/{y}"


def test_geotile_matches_reference(geo_docs):
    df, coords = geo_docs
    got = {r["tile"]: r["doc_count"] for r in geotile_grid(df, zoom=3).collect()}
    want: dict = {}
    for la, lo in coords.values():
        t = _ref_tile(la, lo, 3)
        want[t] = want.get(t, 0) + 1
    assert got == want
    assert sum(got.values()) == len(coords)
    with pytest.raises(ValueError):
        geotile_grid(df, zoom=30)
