"""Geo search surface (ES parity: ``geo_distance`` / ``geo_bounding_box``
queries, ``geo_distance`` sort, ``geotile_grid`` aggregation).

The documents fixture has no geo_point column, so ``with_geo`` derives
one deterministically from ``doc_id`` with PURE INTEGER arithmetic
(multiply-mod lattice) — exactly replayable in ANSI SQL, which is what
makes every geo operator here full-oracle-checkable. A real deployment
maps its actual lat/lon columns through the same operators; nothing
below depends on how the coordinates were obtained.

Scale shapes:

- bounding box: a map-only conjunctive range predicate — at 100 TB this
  is the class of filter you want FIRST, because with real (non-derived)
  coordinate columns it pushes into the parquet scan as min/max row-group
  pruning.
- distance top-k: map-only haversine + ``TakeOrderedAndProject`` (never
  a full sort); ties broken by doc_id.
- radius query (``geo_within``): the classic bounding-box PREFILTER —
  the radius converts to a lat/lon rectangle that is a strict superset
  of the circle, the cheap rectangle prunes before any trigonometry
  (and, with real columns, before the scan), then the exact haversine
  keeps the circle. The prefilter is what survives 100×: trig on the
  survivors of a pushed-down range predicate, not on the corpus.
- geotile_grid: one hash aggregate keyed by the tile; tile keys are also
  the natural PARTITION key for a geo-bucketed layout (the geo analogue
  of this engine's term-bucketed postings), which is the stated swap-out
  for geo joins at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
# Web-Mercator latitude clamp (tan() diverges at the poles); the exact
# constant every tile scheme uses: atan(sinh(pi)) in degrees
MERCATOR_MAX_LAT = 85.05112878

# multiply-mod lattice constants (primes, coprime to the grid sizes so
# consecutive doc_ids scatter): lat in [-90, 90), lon in [-180, 180),
# 0.01-degree resolution
_LAT_P, _LON_P = 7919, 104729


def with_geo(docs: DataFrame) -> DataFrame:
    """Attach deterministic (lat, lon) derived from doc_id.

    ``lat = (doc_id·7919 mod 18000)/100 − 90``,
    ``lon = (doc_id·104729 mod 36000)/100 − 180`` — integer ops then one
    exact decimal shift, so Spark and any SQL oracle agree bitwise."""
    return docs.withColumn(
        "lat", ((F.col("doc_id") * _LAT_P) % 18000) / 100.0 - 90.0
    ).withColumn(
        "lon", ((F.col("doc_id") * _LON_P) % 36000) / 100.0 - 180.0
    )


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance (km) as a Column expression; the standard
    numerically-stable asin form."""
    dphi = F.radians(lat2) - F.radians(lat1)
    dlmb = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dphi / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def geo_bounding_box(
    docs: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """ES ``geo_bounding_box``: docs inside the rectangle (inclusive).
    Output (doc_id, lat, lon), ordered by doc_id."""
    return (
        with_geo(docs)
        .filter(
            (F.col("lat") >= min_lat)
            & (F.col("lat") <= max_lat)
            & (F.col("lon") >= min_lon)
            & (F.col("lon") <= max_lon)
        )
        .select("doc_id", "lat", "lon")
        .orderBy("doc_id")
    )


def geo_distance_topk(
    docs: DataFrame, lat: float, lon: float, k: int = 10
) -> DataFrame:
    """ES ``geo_distance`` sort: the k docs nearest to (lat, lon).
    Output (doc_id, lat, lon, dist_km_r), distance ascending, doc_id
    tie-break; orderBy().limit(k) compiles to TakeOrderedAndProject."""
    d = with_geo(docs).withColumn(
        "dist_km", haversine_km(F.lit(float(lat)), F.lit(float(lon)), "lat", "lon")
    )
    return (
        d.orderBy(F.asc("dist_km"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "lat", "lon", F.round("dist_km", 3).alias("dist_km_r"))
    )


def _radius_bbox(lat: float, lon: float, radius_km: float) -> tuple:
    """The lat/lon rectangle that circumscribes the radius circle —
    a strict superset, so filtering with it before the exact haversine
    is lossless. One degree of latitude is R·π/180 km everywhere; a
    degree of longitude shrinks by cos(lat), evaluated at the circle's
    widest latitude. Near the poles the longitude band degenerates to
    the full circle (cos→0), handled by clamping to the whole range."""
    deg_lat = math.degrees(radius_km / EARTH_RADIUS_KM)
    lo_lat, hi_lat = lat - deg_lat, lat + deg_lat
    widest = min(90.0, max(abs(lo_lat), abs(hi_lat)))
    c = math.cos(math.radians(widest))
    if c <= 1e-12 or hi_lat >= 90.0 or lo_lat <= -90.0:
        return max(lo_lat, -90.0), min(hi_lat, 90.0), -180.0, 180.0
    deg_lon = math.degrees(radius_km / EARTH_RADIUS_KM) / c
    return lo_lat, hi_lat, max(lon - deg_lon, -180.0), min(lon + deg_lon, 180.0)


def geo_within(
    docs: DataFrame, lat: float, lon: float, radius_km: float
) -> DataFrame:
    """ES ``geo_distance`` query: docs within ``radius_km`` of the
    point. The circumscribing-rectangle prefilter prunes before the
    haversine (with real coordinate columns it would prune at the
    scan); the exact distance keeps the circle. Output (doc_id,
    dist_km_r), ordered by doc_id."""
    lo_lat, hi_lat, lo_lon, hi_lon = _radius_bbox(lat, lon, radius_km)
    d = (
        with_geo(docs)
        .filter(
            (F.col("lat") >= lo_lat)
            & (F.col("lat") <= hi_lat)
            & (F.col("lon") >= lo_lon)
            & (F.col("lon") <= hi_lon)
        )
        .withColumn(
            "dist_km",
            haversine_km(F.lit(float(lat)), F.lit(float(lon)), "lat", "lon"),
        )
        .filter(F.col("dist_km") <= radius_km)
    )
    return d.select("doc_id", F.round("dist_km", 3).alias("dist_km_r")).orderBy(
        "doc_id"
    )


def geotile_grid(docs: DataFrame, zoom: int = 4) -> DataFrame:
    """ES ``geotile_grid`` aggregation: doc counts per Web-Mercator
    map tile ``z/x/y`` (the slippy-map scheme). Latitude clamps to the
    Mercator range exactly as ES does. Output (tile, doc_count),
    ordered by tile. One hash aggregate; the tile is the natural
    partition key for a geo-bucketed layout at scale."""
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")
    n = float(2**zoom)
    d = with_geo(docs).withColumn(
        "mlat",
        F.greatest(
            F.lit(-MERCATOR_MAX_LAT), F.least(F.lit(MERCATOR_MAX_LAT), F.col("lat"))
        ),
    )
    phi = F.radians("mlat")
    x = F.floor((F.col("lon") + 180.0) / 360.0 * n)
    y = F.floor((1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi) / 2.0 * n)
    # the x==2^z / y==2^z edge (lon==180 or lat at the clamp) folds into
    # the last tile, matching the tiling convention
    lim = F.lit(int(n) - 1)
    d = d.withColumn("tx", F.least(x, lim)).withColumn("ty", F.least(y, lim))
    return (
        d.groupBy(
            F.concat_ws("/", F.lit(zoom), F.col("tx"), F.col("ty")).alias("tile")
        )
        .agg(F.count("*").alias("doc_count"))
        .orderBy("tile")
    )

def geo_bounds(docs: DataFrame) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the smallest lat/lon rectangle
    containing every matching point — ONE global min/max reduce (four
    numbers, map-side combinable, no data-keyed shuffle). min/max over
    doubles is order-free, so the result replays bitwise in any
    engine. ES's ``wrap_longitude`` (minimal dateline-crossing box) is
    not implemented: bounds are reported in plain [-180, 180) space.
    Output one row (top_left_lat, top_left_lon, bottom_right_lat,
    bottom_right_lon) — ES's corner convention: top-left = (max lat,
    min lon), bottom-right = (min lat, max lon)."""
    return with_geo(docs).agg(
        F.max("lat").alias("top_left_lat"),
        F.min("lon").alias("top_left_lon"),
        F.min("lat").alias("bottom_right_lat"),
        F.max("lon").alias("bottom_right_lon"),
    )


def geo_centroid(docs: DataFrame) -> DataFrame:
    """ES ``geo_centroid`` aggregation: the arithmetic mean of the
    matching coordinates, plus the point count. Computed over the
    fixture's INTEGER lattice values (``with_geo`` pre-shift), so the
    two sums are exact integers — order-free — and the centroid is two
    shared-text double divisions over them, replayable bitwise (the
    matrix_stats device; a real coordinate column would sum doubles
    and report at the rounded precision instead). One global reduce of
    three numbers. Output (count, lat_r, lon_r)."""
    agg = docs.select(
        ((F.col("doc_id") * _LAT_P) % 18000).alias("ilat"),
        ((F.col("doc_id") * _LON_P) % 36000).alias("ilon"),
    ).agg(
        F.count(F.lit(1)).alias("count"),
        F.sum("ilat").alias("s_lat"),
        F.sum("ilon").alias("s_lon"),
    )
    return agg.select(
        "count",
        F.round(
            F.expr("cast(s_lat as double) / cast(count as double) / 100.0 - 90.0"),
            6,
        ).alias("lat_r"),
        F.round(
            F.expr(
                "cast(s_lon as double) / cast(count as double) / 100.0 - 180.0"
            ),
            6,
        ).alias("lon_r"),
    )


def geo_distance_rings(
    docs: DataFrame, lat: float, lon: float,
    edges_km: list[float] | None = None,
) -> DataFrame:
    """ES ``geo_distance`` AGGREGATION: ring buckets around an origin —
    ``[{to: e0}, {from: e0, to: e1}, ..., {from: eN}]`` (half-open
    ``from <= d < to``, exactly the ES contract), doc count and mean
    distance per ring. Empty rings are reported with zero counts
    (``min_doc_count=0`` shape) so the bucket axis is stable.

    Scale shape: ONE pass — the exact haversine and the ring CASE are
    JVM codegen inside the scan, one hash aggregate on the ring
    ordinal (bounded bucket count), then a broadcast join against the
    ring dimension frame for the gap-fill. No corpus-sized shuffle."""
    edges = [float(e) for e in (edges_km or [1000.0, 5000.0, 10000.0])]
    if edges != sorted(edges) or len(set(edges)) != len(edges) or not edges:
        raise ValueError("edges_km must be strictly increasing and non-empty")
    d = with_geo(docs).withColumn(
        "dist", haversine_km(F.lit(lat), F.lit(lon), "lat", "lon")
    )
    conds = f"CASE WHEN dist < {edges[0]!r}D THEN 0 "
    for i in range(1, len(edges)):
        conds += f"WHEN dist < {edges[i]!r}D THEN {i} "
    conds += f"ELSE {len(edges)} END"
    got = (
        d.groupBy(F.expr(conds).alias("ring"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("dist").alias("sum_dist"),
        )
    )
    spark = docs.sparkSession
    bounds = [(i,
               edges[i - 1] if i > 0 else None,
               edges[i] if i < len(edges) else None)
              for i in range(len(edges) + 1)]
    rings = spark.createDataFrame(
        bounds, schema="ring int, from_km double, to_km double"
    )
    return (
        # left-outer broadcasts its RIGHT side: `got` is the bounded
        # post-aggregate frame (<= |edges|+1 rows), rings the axis
        rings.join(F.broadcast(got), "ring", "left")
        .select(
            F.col("ring").cast("long").alias("ring"),
            "from_km",
            "to_km",
            F.coalesce("doc_count", F.lit(0)).alias("doc_count"),
            F.round(
                F.expr(
                    "CASE WHEN doc_count > 0 "
                    "THEN sum_dist / cast(doc_count as double) END"
                ),
                6,
            ).alias("avg_km_r"),
        )
        .orderBy("ring")
    )


def geo_polygon(
    docs: DataFrame,
    vertices: list[tuple[int, int]],
    k: int = 25,
) -> DataFrame:
    """ES ``geo_polygon`` query over a CONVEX polygon, evaluated in the
    EXACT integer lattice ``with_geo`` derives coordinates from.

    ``vertices`` are (ilon, ilat) pairs in centi-degrees on the lattice
    grid (ilon in [0, 36000), ilat in [0, 18000)), in COUNTER-CLOCKWISE
    order. Containment is the textbook convex test — every edge's 2-D
    cross product ``(x2-x1)(py-y1) - (y2-y1)(px-x1) >= 0`` — done in
    64-bit INTEGER arithmetic, so there is no floating-point boundary
    ambiguity anywhere and any SQL engine replays it bitwise (ES uses
    the same half-plane sweep per triangle of its tessellation).

    Scale shape: the test is a map-only conjunction of |V| integer
    predicates — with real stored coordinate columns the polygon's
    bounding box would be prepended as a pushed-down range prefilter
    (the ``geo_within`` device); the derived-lattice fixture skips
    that only because the inputs aren't stored columns. The total
    count rides a broadcast 1-row aggregate, never a window over the
    corpus.

    Output: top ``k`` contained docs by doc_id with their (lat, lon),
    plus the polygon-wide ``inside_total``.
    """
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    if k < 1:
        raise ValueError("k must be >= 1")
    pts = docs.select(
        "doc_id",
        ((F.col("doc_id") * _LAT_P) % 18000).alias("ilat"),
        ((F.col("doc_id") * _LON_P) % 36000).alias("ilon"),
    )
    cond = F.lit(True)
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        cond = cond & (
            (F.lit(int(x2 - x1)) * (F.col("ilat") - F.lit(int(y1)))
             - F.lit(int(y2 - y1)) * (F.col("ilon") - F.lit(int(x1))))
            >= 0
        )
    inside = pts.filter(cond)
    total = inside.agg(F.count(F.lit(1)).cast("long").alias("inside_total"))
    return (
        inside.select(
            "doc_id",
            (F.col("ilat") / 100.0 - 90.0).alias("lat"),
            (F.col("ilon") / 100.0 - 180.0).alias("lon"),
        )
        .crossJoin(F.broadcast(total))
        .orderBy("doc_id")
        .limit(int(k))
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(precision: int = 4) -> str:
    """SQL expression text for the base32 geohash of the lattice point
    (``ilat`` in [0,18000), ``ilon`` in [0,36000)) at ``precision``
    characters — the SHARED-EXPRESSION-TEXT parity device: the same
    string runs in Spark and in any ANSI-ish SQL oracle, so engine and
    check cannot drift.

    Standard geohash: 5·P bits, even global bit positions (MSB-first)
    from longitude, odd from latitude. The cell ordinates are exact
    integer scalings of the lattice —
    ``lonint = floor(ilon · 2^nlon / 36000)`` (the double division is
    deterministic IEEE in both engines; operands stay far below 2^53)
    — and every bit is a div/mod pair on nonnegative integers."""
    if not 1 <= precision <= 8:
        raise ValueError("precision must be in [1, 8]")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2

    def bit(i: int) -> str:
        # global bit i (0 = MSB): even -> lon, odd -> lat
        if i % 2 == 0:
            src, n, tot = "ilon", nlon, 36000
            j = i // 2
        else:
            src, n, tot = "ilat", nlat, 18000
            j = i // 2
        cell = f"cast(floor(({src} * {2 ** n}) / {tot}.0) as bigint)"
        return f"(cast(floor({cell} / {2 ** (n - 1 - j)}.0) as bigint) % 2)"

    chars = []
    for c in range(precision):
        idx = " + ".join(
            f"{bit(5 * c + b)} * {2 ** (4 - b)}" for b in range(5)
        )
        chars.append(
            f"substring('{GEOHASH_ALPHABET}', cast(({idx}) as int) + 1, 1)"
        )
    return "concat(" + ", ".join(chars) + ")"


def geohash_grid(docs: DataFrame, precision: int = 3, size: int = 20) -> DataFrame:
    """ES ``geohash_grid`` aggregation: bucket docs by their geohash
    cell at ``precision`` chars, top ``size`` cells by doc count
    (count DESC, hash ASC). The encoder is pure integer arithmetic in
    the scan (``geohash_expr``); one hash aggregate keyed by the cell.
    Like geotile_grid, the cell key is the natural PARTITION key for a
    geo-bucketed layout at scale — the geo analogue of term-bucketed
    postings."""
    if size < 1:
        raise ValueError("size must be >= 1")
    pts = docs.select(
        ((F.col("doc_id") * _LAT_P) % 18000).alias("ilat"),
        ((F.col("doc_id") * _LON_P) % 36000).alias("ilon"),
    )
    return (
        pts.withColumn("geohash", F.expr(geohash_expr(precision)))
        .groupBy("geohash")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("geohash"))
        .limit(int(size))
    )


def geo_line(docs: DataFrame, group_col: str = "source", size: int = 10) -> DataFrame:
    """ES ``geo_line`` aggregation: per group, the track — points
    joined in SORT-FIELD order (doc_id here; ES uses e.g. a timestamp)
    — truncated at ``size`` points with the ``complete`` flag saying
    whether anything was dropped. The line is emitted as integer
    lattice pairs ``"ilon:ilat"`` joined with commas: coordinate text
    never goes through float formatting, so the string is
    engine-replayable verbatim (a WKT presentation belongs at the
    display layer).

    Scale shape: one hash aggregate collects each group's points
    (per-group arrays are group-bounded, and ES's own geo_line caps at
    10k points for the same reason); sort/slice/join run over the
    collected array in codegen."""
    if size < 1:
        raise ValueError("size must be >= 1")
    pts = docs.select(
        F.col(group_col).alias("grp"),
        "doc_id",
        ((F.col("doc_id") * _LAT_P) % 18000).alias("ilat"),
        ((F.col("doc_id") * _LON_P) % 36000).alias("ilon"),
    )
    g = pts.groupBy("grp").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "ilon", "ilat"))).alias(
            "pts"
        ),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    line = (
        f"array_join(transform(slice(pts, 1, {int(size)}), "
        "x -> concat(cast(x.ilon as string), ':', cast(x.ilat as string))), ',')"
    )
    return g.select(
        "grp",
        "n_points",
        (F.col("n_points") <= F.lit(int(size))).alias("complete"),
        F.expr(line).alias("line"),
    ).orderBy("grp")
