"""Geo query + aggregation family (the Lucene/ES geo_point surface):
geo_distance top-k, geo_bounding_box filtering, and geo-grid bucketing
(rectangular lat/lon grid plus the slippy-map ``geotile_grid``).

The corpus tables carry no geo column, so :func:`with_coords` derives a
deterministic synthetic geo_point per document from md5(doc_id) — the
same engine-portable hash-to-number trick the MinHash/curation operators
use — documented as a stand-in for a real (lat, lon) pair ingested from
the source table. Every downstream operator takes plain lat/lon DOUBLE
columns and works unchanged on real coordinates.

Pinned semantics (the DuckDB twins implement the same spec):

- Coordinates:  h1 = first 8 md5 hex chars of CAST(doc_id AS string),
  h2 = next 8.  lat = h1/2^32*180 - 90, lon = h2/2^32*360 - 180.
  Exact-in-double products/divisions only, so both engines produce
  bit-identical doubles.
- Distance: haversine on a sphere of radius R = 6371.0088 km (IUGG mean
  Earth radius).  Radians via multiplication by a shared literal
  (PI/180 pre-evaluated in Python) — NOT the engines' radians()
  builtins — so the expression tree is identical across engines.
  dist = 2R * asin(sqrt(sin^2(dphi/2) + cos(p1) cos(p2) sin^2(dl/2))).
- geo_distance ranking: round(dist_km, 6) ASC, doc_id ASC (same
  tie-pinning discipline as every scorer in this repo: libm sin/cos may
  differ by an ulp between the JVM and C, rounding before the window
  keeps mathematical ties from breaking on engine noise).
- Rectangular grid (``geo_grid``): cell_x = floor((lon+180)/360 * 2^z),
  cell_y = floor((lat+90)/180 * 2^z), z cells clamped to [0, 2^z - 1]
  (lon = +180 would land one cell past the edge).  Uses only + * /
  floor on doubles -> bit-identical cells in both engines (this is why
  the ORACLE-twinned grid is the rectangular one).
- ``geotile_grid`` (ES geotile_grid / slippy map tiles): x as above,
  y = floor((1 - asinh(tan(lat_rad))/pi) / 2 * 2^z) with lat clamped to
  +/-85.05112878 (web-mercator limit).  tan/log are libm calls, so this
  variant is pinned by the pytest reference implementation rather than
  a cross-engine hash (a boundary ulp flip is possible in theory; the
  rectangular grid is the cross-engine-exact path).

Scale shape: with_coords / bounding-box / grid assignment are map-only
(one scan, predicates and projections push down); geo_distance is a
scan + filter + per-query top-k window; the grid aggregations are ONE
hash aggregate with map-side combine on the cell key — cells are
metadata-scale (4^z buckets).  Nothing shuffles doc-proportional data
except the single groupBy, same envelope as every facet in this repo.
At 10^12 docs a real deployment would sort/cluster the table by an
interleaved cell key (Z-order) so bounding-box queries prune files;
noted here because the operator is deliberately just a filter — pruning
belongs to the table layout, not the query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
PI_OVER_180 = math.pi / 180.0  # 0.017453292519943295
MERCATOR_LAT_MAX = 85.05112878


def with_coords(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach deterministic synthetic (lat, lon) doubles derived from
    md5(id) — engine-portable stand-in for a real geo_point column."""
    hx = F.md5(F.col(id_col).cast("string"))
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("double")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("double")
    two32 = F.lit(4294967296.0)
    return docs.withColumn("lat", h1 / two32 * F.lit(180.0) - F.lit(90.0)).withColumn(
        "lon", h2 / two32 * F.lit(360.0) - F.lit(180.0)
    )


def haversine_km(lat1, lon1, lat2, lon2):
    """Haversine great-circle distance (km) as a column expression.
    Radians via shared literal multiplication so the Spark and DuckDB
    expression trees match op-for-op."""
    rad = F.lit(PI_OVER_180)
    p1, p2 = lat1 * rad, lat2 * rad
    dphi = (lat2 - lat1) * rad
    dlam = (lon2 - lon1) * rad
    a = (
        F.sin(dphi / F.lit(2.0)) * F.sin(dphi / F.lit(2.0))
        + F.cos(p1) * F.cos(p2) * F.sin(dlam / F.lit(2.0)) * F.sin(dlam / F.lit(2.0))
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_topk(
    docs: DataFrame,
    qlat: float,
    qlon: float,
    radius_km: float,
    k: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_distance query + sort: docs within ``radius_km`` of the
    query point, k nearest first.  -> (rank, doc_id, lat, lon, dist_km).

    Plan: one scan (lat/lon/doc_id pruned), map-only distance + filter,
    then a single top-k window — the query point is a literal, so there
    is no join at all.  At scale the pre-filter a production engine adds
    (bounding-box on the radius, so file pruning can bite on a Z-ordered
    table) is expressed here too: the box predicate is sargable, the
    haversine is not.
    """
    # sargable bounding-box pre-filter (radius -> degree box; lon box is
    # widened by the worst-case cos(lat) within the latitude box).  The box
    # must be a SUPERSET of the circle: if it would cross a pole or the
    # antimeridian (where haversine wraps but a plain lon range does not),
    # the lon predicate is dropped entirely — correctness first, pruning
    # only when the range is honest.
    dlat = radius_km / 111.19492664455873  # km per degree latitude (R*pi/180)
    lat_lo, lat_hi = qlat - dlat, qlat + dlat
    max_abs_lat = min(max(abs(lat_lo), abs(lat_hi)), 89.9)
    dlon = dlat / math.cos(max_abs_lat * PI_OVER_180)
    d = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(float(qlat)), F.lit(float(qlon)))
    pred = (F.col(lat_col) >= F.lit(lat_lo)) & (F.col(lat_col) <= F.lit(lat_hi))
    if lat_hi <= 90.0 and lat_lo >= -90.0 and qlon - dlon >= -180.0 and qlon + dlon <= 180.0:
        pred = (
            pred
            & (F.col(lon_col) >= F.lit(qlon - dlon))
            & (F.col(lon_col) <= F.lit(qlon + dlon))
        )
    boxed = docs.filter(pred)
    within = boxed.withColumn("dist_km", d).filter(
        F.round("dist_km", 6) <= F.lit(float(radius_km))
    )
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps merged on the driver), NOT a single-partition
    # window over every in-radius doc; the rank window then runs on k rows.
    topk = within.orderBy(F.round("dist_km", 6).asc(), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.round("dist_km", 6).asc(), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", lat_col, lon_col, "dist_km")
    )


def geo_bbox_stats(
    docs: DataFrame,
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
    group_col: str = "source",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_bounding_box filter + a terms facet over the survivors:
    -> (group, n_docs, avg_chars).  Map-only predicate (pushes to the
    scan) + one hash aggregate."""
    box = (
        (F.col(lat_col) >= F.lit(float(lat_lo)))
        & (F.col(lat_col) <= F.lit(float(lat_hi)))
        & (F.col(lon_col) >= F.lit(float(lon_lo)))
        & (F.col(lon_col) <= F.lit(float(lon_hi)))
    )
    return (
        docs.filter(box)
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        )
    )


def geo_grid(
    docs: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    top: int = 25,
) -> DataFrame:
    """Rectangular lat/lon grid aggregation (the cross-engine-exact grid;
    ES geohash_grid's role with square cells): cell assignment is pure
    + * / floor arithmetic, so Spark and DuckDB bucket bit-identically.
    -> top cells by (n_docs desc, cell_x, cell_y): (cell_x, cell_y,
    n_docs, avg_chars)."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    cx = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    cy = F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(hi)).cast("long")  # noqa: E731
    cells = docs.select(
        clamp(cx).alias("cell_x"),
        clamp(cy).alias("cell_y"),
        F.col("n_chars").cast("double").alias("n_chars"),
    )
    agg = cells.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
    )
    # cell relation is metadata-scale (4^zoom), but use the distributed
    # top-k anyway (TakeOrderedAndProject) so no single-partition window
    topn = agg.orderBy(F.desc("n_docs"), F.asc("cell_x"), F.asc("cell_y")).limit(top)
    w = Window.orderBy(F.desc("n_docs"), F.asc("cell_x"), F.asc("cell_y"))
    return (
        topn.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "cell_x", "cell_y", "n_docs", "avg_chars")
    )


def geotile_grid(
    docs: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES ``geotile_grid`` aggregation: web-mercator slippy-map tiles
    "z/x/y".  Uses tan + log (libm), so parity is pinned by the pytest
    reference implementation, not a cross-engine hash (see module doc).
    -> (tile, n_docs) — every non-empty tile, no top cut."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    lat = F.least(F.greatest(F.col(lat_col), F.lit(-MERCATOR_LAT_MAX)), F.lit(MERCATOR_LAT_MAX))
    lat_rad = lat * F.lit(PI_OVER_180)
    x = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    # asinh(t) = ln(t + sqrt(t^2 + 1)); Spark has no asinh builtin
    t = F.tan(lat_rad)
    asinh = F.log(t + F.sqrt(t * t + F.lit(1.0)))
    y = F.floor((F.lit(1.0) - asinh / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(hi)).cast("long")  # noqa: E731
    tiles = docs.select(
        F.concat_ws("/", F.lit(str(zoom)), clamp(x), clamp(y)).alias("tile")
    )
    return tiles.groupBy("tile").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


def geo_distance_rings(
    docs: DataFrame,
    qlat: float,
    qlon: float,
    edges_km: list,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES ``geo_distance`` AGGREGATION: concentric distance rings around a
    query point -> per-ring doc count + avg n_chars.  ``edges_km`` are the
    ring boundaries; rings are [0,e1), [e1,e2), ..., [eN,inf) — ES's
    from-inclusive / to-exclusive convention.  Ring assignment compares
    round(dist, 6) so an engine-ulp in libm sin/cos can never flip a
    boundary doc across rings differently in two engines.

    Plan: map-only distance + ring label over the scan, ONE hash aggregate
    on the ring key (ring cardinality = len(edges)+1, metadata-scale).
    -> (ring, from_km, to_km, n_docs, avg_chars).
    """
    d = F.round(
        haversine_km(F.col(lat_col), F.col(lon_col), F.lit(float(qlat)), F.lit(float(qlon))),
        6,
    )
    edges = [float(e) for e in edges_km]
    bounds = [(0.0, edges[0])] + list(zip(edges, edges[1:])) + [(edges[-1], None)]
    ring = F.when(d < F.lit(edges[0]), F.lit(f"*-{edges[0]}"))
    for lo, hi in bounds[1:-1]:
        ring = ring.when(d < F.lit(hi), F.lit(f"{lo}-{hi}"))
    ring = ring.otherwise(F.lit(f"{edges[-1]}-*"))
    lookup = {
        (f"*-{edges[0]}"): (0.0, edges[0]),
        **{f"{lo}-{hi}": (lo, hi) for lo, hi in bounds[1:-1]},
        (f"{edges[-1]}-*"): (edges[-1], None),
    }
    agg = (
        docs.select(ring.alias("ring"), F.col("n_chars").cast("double").alias("n_chars"))
        .groupBy("ring")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
        )
    )
    spark = docs.sparkSession
    bdf = spark.createDataFrame(
        [(k, lo, hi) for k, (lo, hi) in lookup.items()],
        "ring string, from_km double, to_km double",
    )
    return agg.join(F.broadcast(bdf), "ring", "inner").select(
        "ring", "from_km", "to_km", "n_docs", "avg_chars"
    )


def geo_centroid_bounds(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """ES ``geo_centroid`` + ``geo_bounds`` aggregations per group: the
    arithmetic-mean centroid (the ES geo_centroid rule — plain lat/lon
    averages, no spherical weighting) and the envelope corners
    (top_left = max lat / min lon, bottom_right = min lat / max lon).
    One hash aggregate of re-aggregable partials.
    -> (group, n_docs, centroid_lat, centroid_lon,
        top_left_lat, top_left_lon, bottom_right_lat, bottom_right_lon)
    """
    return docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("lat").alias("centroid_lat"),
        F.avg("lon").alias("centroid_lon"),
        F.max("lat").alias("top_left_lat"),
        F.min("lon").alias("top_left_lon"),
        F.min("lat").alias("bottom_right_lat"),
        F.max("lon").alias("bottom_right_lon"),
    )
