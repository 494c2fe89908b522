"""Geo operators — parity with the reference's geo capabilities:

* grid-cell aggregation   — the Kibana geohash-heatmap analog (B12;
  reference mapping src/utils/elasticsearch_utils.py:35-37, README.md:29-31)
* coarse-to-fine polygon filter — bbox prune then exact point-in-polygon
  (A23; reference: src/librecatastro/domain/geometry/geo_polygon.py:36-54)
* lattice generation over a bbox — the grid-scan source (A22; reference:
  src/librecatastro/scrapping/searchers/coordinates_searcher.py:53-96)
* geohash encode — base32 geohash as a vectorized pandas_udf
* geo_distance radius filter — haversine in Catalyst behind a
  conservative bbox pruner (the ES geo_distance query over geo_point)

The exact polygon test is a numpy-vectorized ray cast inside a pandas_udf
(shapely is not in this image; the algorithm is the textbook even-odd
rule). The bbox prune is a plain Catalyst predicate so Parquet min/max
row-group skipping applies before any Python runs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

#: mean Earth radius in meters — the ES/Lucene arc-distance default
EARTH_RADIUS_M = 6_371_000.0


def cell_agg(
    df: DataFrame, lon_col: str = "lon", lat_col: str = "lat", scale: float = 10.0
) -> DataFrame:
    """Count per fixed-size grid cell: groupBy(floor(lon*s), floor(lat*s)).
    The geohash-grid bucket aggregation analog, expressible in any engine."""
    return (
        df.groupBy(
            F.floor(F.col(lon_col) * scale).alias("cell_lon"),
            F.floor(F.col(lat_col) * scale).alias("cell_lat"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bbox_filter(df: DataFrame, bbox: tuple[float, float, float, float],
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Coarse prune: (min_lon, min_lat, max_lon, max_lat) — pure Catalyst,
    pushed to the Parquet scan."""
    x0, y0, x1, y1 = bbox
    return df.where(
        (F.col(lon_col) >= x0) & (F.col(lon_col) < x1)
        & (F.col(lat_col) >= y0) & (F.col(lat_col) < y1)
    )


def haversine_m(lon_col: Column, lat_col: Column, lon0: float, lat0: float) -> Column:
    """Great-circle distance (meters) from each row's point to a fixed
    center — pure Catalyst: radians/sin/cos/asin/sqrt are codegen
    intrinsics, so the whole expression stays JVM-side in the scan
    projection (no Python anywhere). Same haversine the DuckDB oracle
    twin spells out, so the two engines agree to float ulps."""
    dlat = F.radians(lat_col - F.lit(float(lat0)))
    dlon = F.radians(lon_col - F.lit(float(lon0)))
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(F.lit(float(lat0))))
        * F.cos(F.radians(lat_col))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def geo_distance(
    df: DataFrame, lon0: float, lat0: float, radius_m: float,
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """ES ``geo_distance`` query: rows within ``radius_m`` meters of
    (lon0, lat0). Coarse-to-fine like ``points_in_polygon`` (A23): a
    conservative lat/lon bbox derived from the radius prunes FIRST as a
    plain Catalyst predicate (pushed to the Parquet scan — at 100 TB the
    bbox eliminates almost every row group before any trig runs), then
    the exact haversine test filters the survivors. The reference maps
    ``location`` as geo_point (src/utils/elasticsearch_utils.py:35-37);
    radius search is the canonical query against that type.

    The bbox is CONSERVATIVE only: near the poles (cos(lat) → 0) or when
    the lon window would cross the antimeridian, the lon constraint is
    dropped rather than wrapped — correctness always comes from the
    haversine predicate, the bbox is purely a pruner."""
    return df.where(
        geo_distance_cond(F.col(lon_col), F.col(lat_col), lon0, lat0, radius_m)
    )


def radius_bbox(
    lon0: float, lat0: float, radius_m: float
) -> tuple[float, float, float | None, float | None]:
    """(lat_lo, lat_hi, lon_lo, lon_hi) of the CONSERVATIVE prune box for
    a radius query — lon bounds are None near a pole or when the window
    would cross the antimeridian (drop the constraint rather than wrap
    it; the exact haversine test restores correctness). Shared by the
    Catalyst predicate and the pyarrow fast path so the box can't fork."""
    if radius_m <= 0:
        raise ValueError("radius_m must be positive")
    dlat = math.degrees(radius_m / EARTH_RADIUS_M)
    lat_lo, lat_hi = lat0 - dlat, lat0 + dlat
    lon_lo = lon_hi = None
    max_abs_lat = min(max(abs(lat_lo), abs(lat_hi)), 89.999999)
    cos_min = math.cos(math.radians(max_abs_lat))
    if cos_min > 1e-9:
        dlon = math.degrees(radius_m / (EARTH_RADIUS_M * cos_min))
        if dlon < 180.0 and lon0 - dlon >= -180.0 and lon0 + dlon <= 180.0:
            lon_lo, lon_hi = lon0 - dlon, lon0 + dlon
    return lat_lo, lat_hi, lon_lo, lon_hi


def haversine_np(
    lon: np.ndarray, lat: np.ndarray, lon0: float, lat0: float
) -> np.ndarray:
    """numpy twin of ``haversine_m`` (same formula term-for-term) — the
    coordinator fast path's exact re-check after the bbox scan prune."""
    dlat = np.radians(lat - lat0)
    dlon = np.radians(lon - lon0)
    a = (
        np.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat0)) * np.cos(np.radians(lat))
        * np.sin(dlon / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def geo_distance_cond(
    lon_col: Column, lat_col: Column, lon0: float, lat0: float, radius_m: float
) -> Column:
    """The geo_distance filter as ONE Catalyst predicate — conservative
    radius-derived bbox comparisons (simple, Parquet-pushable) ANDed with
    the exact haversine test. Shared by ``geo_distance`` and the search
    engines' ``geo`` filter clause so the semantics can't fork."""
    lat_lo, lat_hi, lon_lo, lon_hi = radius_bbox(lon0, lat0, radius_m)
    cond = (lat_col >= F.lit(lat_lo)) & (lat_col <= F.lit(lat_hi))
    if lon_lo is not None:
        cond = cond & (lon_col >= F.lit(lon_lo)) & (lon_col <= F.lit(lon_hi))
    dist = haversine_m(lon_col, lat_col, lon0, lat0)
    return cond & (dist <= F.lit(float(radius_m)))


def polygon_bbox(polygon: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    return (min(xs), min(ys), max(xs), max(ys))


def ray_cast_np(
    x: np.ndarray, y: np.ndarray, polygon: list[tuple[float, float]]
) -> np.ndarray:
    """Vectorized even-odd ray cast against a fixed polygon (closed
    implicitly) — the ONE membership kernel every polygon path shares
    (Catalyst-side pandas_udf, coordinator numpy re-check), so the
    semantics can't fork. Matches geo_polygon.py:36-44."""
    poly = np.asarray(polygon, dtype=np.float64)
    inside = np.zeros(len(x), dtype=bool)
    px, py = poly[:, 0], poly[:, 1]
    n = len(poly)
    for i in range(n):
        j = (i - 1) % n
        if py[j] == py[i]:
            continue  # horizontal edge never straddles a ray
        straddles = (py[i] > y) != (py[j] > y)
        cond = straddles & (
            x < (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i]) + px[i]
        )
        inside ^= cond
    return inside


def point_in_polygon_udf(polygon: list[tuple[float, float]]):
    """Arrow-vectorized wrapper of ``ray_cast_np`` (exact test after the
    bbox prune)."""
    poly = [tuple(p) for p in polygon]

    @F.pandas_udf(BooleanType())
    def contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            ray_cast_np(
                lon.to_numpy(dtype=np.float64),
                lat.to_numpy(dtype=np.float64),
                poly,
            )
        )

    return contains


def points_in_polygon(
    df: DataFrame, polygon: list[tuple[float, float]],
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """Coarse-to-fine: bbox Catalyst prune, then exact vectorized test —
    the A23 pattern (cheap filter first, exact predicate on survivors)."""
    pruned = bbox_filter(df, polygon_bbox(polygon), lon_col, lat_col)
    contains = point_in_polygon_udf(polygon)
    return pruned.where(contains(F.col(lon_col), F.col(lat_col)))


def parse_geo_clause(geo: tuple) -> tuple[str, str, str, tuple]:
    """Parse the search paths' ``geo=`` filter clause into
    ``(kind, lon_col, lat_col, params)``:

    * radius form  — ``(lon_col, lat_col, lon0, lat0, radius_m)`` →
      ``("radius", lon_col, lat_col, (lon0, lat0, radius_m))`` — the ES
      ``geo_distance`` query;
    * polygon form — ``(lon_col, lat_col, polygon)`` with ``polygon`` a
      sequence of ≥3 (lon, lat) pairs →
      ``("polygon", lon_col, lat_col, (polygon,))`` — the ES
      ``geo_polygon`` query, the reference's flagship geo predicate
      (reference: src/librecatastro/domain/geometry/geo_polygon.py:36-54,
      the Spain outline at src/coordinates/spain_polygon.json).

    One parser shared by the exact engine, the distributed WAND path and
    the coordinator fast path, so the accepted shapes can't fork."""
    if len(geo) == 5:
        lon_c, lat_c, lon0, lat0, radius_m = geo
        return "radius", lon_c, lat_c, (float(lon0), float(lat0), float(radius_m))
    if len(geo) == 3 and isinstance(geo[2], (list, tuple)):
        lon_c, lat_c, polygon = geo
        polygon = [(float(p[0]), float(p[1])) for p in polygon]
        if len(polygon) < 3:
            raise ValueError("geo polygon needs at least 3 vertices")
        return "polygon", lon_c, lat_c, (polygon,)
    raise ValueError(
        "geo clause must be (lon_col, lat_col, lon0, lat0, radius_m) or "
        "(lon_col, lat_col, [(lon, lat), ...])"
    )


def geo_clause_cond(geo: tuple) -> Column:
    """The ``geo=`` clause as ONE predicate for the Catalyst paths —
    radius: conservative bbox + exact haversine (all codegen); polygon:
    bbox prune (plain comparisons, Parquet-pushable) + the exact
    ray-cast pandas_udf on the survivors (Spark evaluates the cheap
    conjuncts first and ships only bbox survivors through Arrow)."""
    kind, lon_c, lat_c, params = parse_geo_clause(geo)
    lon_col, lat_col = F.col(lon_c), F.col(lat_c)
    if kind == "radius":
        lon0, lat0, radius_m = params
        return geo_distance_cond(lon_col, lat_col, lon0, lat0, radius_m)
    (polygon,) = params
    x0, y0, x1, y1 = polygon_bbox(polygon)
    cond = (
        (lon_col >= F.lit(x0)) & (lon_col < F.lit(x1))
        & (lat_col >= F.lit(y0)) & (lat_col < F.lit(y1))
    )
    return cond & point_in_polygon_udf(polygon)(lon_col, lat_col)


def geo_clause_prune_box(
    geo: tuple,
) -> tuple[float, float, float | None, float | None, bool]:
    """(lat_lo, lat_hi, lon_lo, lon_hi, upper_strict) — the coordinator
    fast path's scan-prune box for either ``geo=`` form. Radius: the
    shared conservative ``radius_bbox`` (inclusive bounds). Polygon: the
    vertex bbox with STRICT upper bounds — byte-identical semantics to
    ``geo_clause_cond``'s Catalyst prune, so local and distributed
    results can't diverge on boundary points."""
    kind, _, _, params = parse_geo_clause(geo)
    if kind == "radius":
        lon0, lat0, radius_m = params
        lat_lo, lat_hi, lon_lo, lon_hi = radius_bbox(lon0, lat0, radius_m)
        return lat_lo, lat_hi, lon_lo, lon_hi, False
    (polygon,) = params
    x0, y0, x1, y1 = polygon_bbox(polygon)
    return y0, y1, x0, x1, True


def geo_clause_mask_np(
    geo: tuple, lon: np.ndarray, lat: np.ndarray
) -> np.ndarray:
    """Exact membership re-check for the coordinator fast path — the
    numpy twin of ``geo_clause_cond``'s exact conjunct (haversine or ray
    cast), run on the bbox-pruned survivors."""
    kind, _, _, params = parse_geo_clause(geo)
    if kind == "radius":
        lon0, lat0, radius_m = params
        return haversine_np(lon, lat, lon0, lat0) <= radius_m
    (polygon,) = params
    return ray_cast_np(lon, lat, polygon)


def lattice(spark: SparkSession, bbox: tuple[float, float, float, float],
            scale: int = 10) -> DataFrame:
    """Integer lattice over a bbox at `scale` points per degree — the
    grid-scan source (A22), built from spark.range cross-join (synthetic
    distributed source, no driver-side materialization)."""
    x0, y0, x1, y1 = bbox
    lon = spark.range(int(np.floor(x0 * scale)), int(np.ceil(x1 * scale))).select(
        (F.col("id") / scale).alias("lon")
    )
    lat = spark.range(int(np.floor(y0 * scale)), int(np.ceil(y1 * scale))).select(
        (F.col("id") / scale).alias("lat")
    )
    return lon.crossJoin(lat)


_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def make_geohash_udf(precision: int = 8):
    """Geohash encoder at a chosen precision (cell size), as a vectorized
    pandas_udf — numpy bit-interleave, no per-row Python. Geohash equality
    at precision p is exactly equality of the (qx, qy) quantized pair
    (interleaving is injective), which is how the DuckDB oracle twins it."""

    @F.pandas_udf(StringType())
    def geohash(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return _geohash_np(lon, lat, precision)

    return geohash


def _geohash_np(lon: pd.Series, lat: pd.Series, precision: int) -> pd.Series:
    x = lon.to_numpy(dtype=np.float64)
    y = lat.to_numpy(dtype=np.float64)
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    qx = np.minimum(((x + 180.0) / 360.0 * (1 << lon_bits)).astype(np.uint64), (1 << lon_bits) - 1)
    qy = np.minimum(((y + 90.0) / 180.0 * (1 << lat_bits)).astype(np.uint64), (1 << lat_bits) - 1)
    interleaved = np.zeros(len(x), dtype=np.uint64)
    for b in range(lon_bits):
        interleaved |= ((qx >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
    for b in range(lat_bits):
        interleaved |= ((qy >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
    # top 5-bit groups → base32 chars
    chars = np.empty((precision, len(x)), dtype="S1")
    for c in range(precision):
        shift = np.uint64(nbits - 5 * (c + 1))
        chars[c] = _GEOHASH32[((interleaved >> shift) & np.uint64(31)).astype(np.int64)]
    joined = np.ascontiguousarray(chars.T).view(f"S{precision}").ravel()
    return pd.Series(joined.astype(str))


#: default 8-char encoder (kept as the module-level UDF for callers)
geohash_udf = make_geohash_udf(8)
