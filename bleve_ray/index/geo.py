"""Geo point encoding + distance math (reference geo/geo.go, sloppy.go).

- morton_hash: lon/lat scaled to 32-bit ints (geo.go:54-61) and
  bit-interleaved (lon = even bits, lat = odd bits) into a uint64.
- haversin_km: the reference's latitude-dependent-diameter haversine
  (geo_dist.go:88-99 + sloppy.go earthDiameter table) so distances agree
  to the meter.
- morton_ranges_for_rect: quadtree decomposition of a lon/lat rectangle
  into contiguous morton-code intervals -- the candidate-pruning role of
  ComputeGeoRange (search_geoboundingbox.go:137+).  Intervals are a
  SUPERSET of the rect; searchers apply an exact docvalue filter, so the
  decomposition budget only affects pruning, never correctness.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

GEO_BITS = 32  # geo.go:26
GEO_PRECISION_STEP = 9  # document/field_geopoint.go:35

_MIN_LON, _MAX_LON = -180.0, 180.0
_MIN_LAT, _MAX_LAT = -90.0, 90.0
_LON_SCALE = float((1 << GEO_BITS) - 1) / 360.0
_LAT_SCALE = float((1 << GEO_BITS) - 1) / 180.0


def scale_lon(lon) -> np.ndarray:
    return ((np.asarray(lon, dtype=np.float64) - _MIN_LON) * _LON_SCALE).astype(
        np.uint64
    )


def scale_lat(lat) -> np.ndarray:
    return ((np.asarray(lat, dtype=np.float64) - _MIN_LAT) * _LAT_SCALE).astype(
        np.uint64
    )


_B = [
    np.uint64(0x5555555555555555),
    np.uint64(0x3333333333333333),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0000FFFF0000FFFF),
]


def _spread(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x into the even bit positions."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x | (x << np.uint64(16))) & _B[4]
    x = (x | (x << np.uint64(8))) & _B[3]
    x = (x | (x << np.uint64(4))) & _B[2]
    x = (x | (x << np.uint64(2))) & _B[1]
    x = (x | (x << np.uint64(1))) & _B[0]
    return x


def _squash(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread: collect even bits into the low 32 bits."""
    x = np.asarray(x, dtype=np.uint64) & _B[0]
    x = (x | (x >> np.uint64(1))) & _B[1]
    x = (x | (x >> np.uint64(2))) & _B[2]
    x = (x | (x >> np.uint64(4))) & _B[3]
    x = (x | (x >> np.uint64(8))) & _B[4]
    x = (x | (x >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return x


def interleave(x, y) -> np.ndarray:
    """numeric Interleave: x in even bits, y in odd bits."""
    return _spread(x) | (_spread(y) << np.uint64(1))


def morton_hash(lon, lat) -> np.ndarray:
    return interleave(scale_lon(lon), scale_lat(lat))


def morton_unhash(hash_) -> Tuple[np.ndarray, np.ndarray]:
    h = np.asarray(hash_, dtype=np.uint64)
    lon = _squash(h).astype(np.float64) / _LON_SCALE + _MIN_LON
    lat = _squash(h >> np.uint64(1)).astype(np.float64) / _LAT_SCALE + _MIN_LAT
    return lon, lat


# --- distance (geo_dist.go + sloppy.go) ------------------------------------

_RADIUS_TABS = (1 << 10) + 1
_RADIUS_DELTA = (math.pi / 2) / (_RADIUS_TABS - 1)
_RADIUS_INDEXER = 1 / _RADIUS_DELTA
_DEG2RAD = math.pi / 180.0


def _earth_diameter_table() -> np.ndarray:
    a, b = 6378137.0, 6356752.31420
    a2, b2 = a * a, b * b
    t = np.empty(_RADIUS_TABS, dtype=np.float64)
    t[0] = 2.0 * a / 1000
    t[-1] = 2.0 * b / 1000
    for i in range(1, _RADIUS_TABS - 1):
        lat = math.pi * i / (2 * _RADIUS_TABS - 1)
        one = (a2 * math.cos(lat)) ** 2
        two = (b2 * math.sin(lat)) ** 2
        three = (a * math.cos(lat)) ** 2
        four = (b * math.sin(lat)) ** 2
        t[i] = 2 * math.sqrt((one + two) / (three + four)) / 1000
    return t


_EARTH_DIAM = _earth_diameter_table()


def haversin_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Reference Haversin (geo_dist.go:88-99): result in kilometers."""
    x1 = np.asarray(lat1, dtype=np.float64) * _DEG2RAD
    x2 = np.asarray(lat2, dtype=np.float64) * _DEG2RAD
    h1 = 1 - np.cos(x1 - x2)
    h2 = 1 - np.cos(
        (np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64))
        * _DEG2RAD
    )
    h = (h1 + np.cos(x1) * np.cos(x2) * h2) / 2
    avg_lat = (x1 + x2) / 2
    idx = np.mod(np.abs(avg_lat) * _RADIUS_INDEXER + 0.5, _RADIUS_TABS)
    # NaN coordinates: a 0 diameter propagates NaN through the product
    # (sloppy.go:53-58 earthDiameter returns 0 on a NaN index)
    nan = np.isnan(idx)
    diameter = np.where(
        nan, 0.0, _EARTH_DIAM[np.where(nan, 0, idx).astype(np.int64)]
    )
    with np.errstate(invalid="ignore"):
        return diameter * np.arcsin(np.minimum(1.0, np.sqrt(h)))


_DIST_UNIT_KM = {
    "mm": 1e-6, "cm": 1e-5, "in": 2.54e-5, "yd": 0.0009144,
    "ft": 0.0003048, "km": 1.0, "mi": 1.609344, "m": 0.001,
}


def parse_distance_km(d) -> float:
    """geo/parse.go ParseDistance: number + optional unit, default meters."""
    if isinstance(d, (int, float)):
        return float(d) * 0.001
    s = str(d).strip().lower()
    for u in sorted(_DIST_UNIT_KM, key=len, reverse=True):
        if s.endswith(u):
            return float(s[: -len(u)]) * _DIST_UNIT_KM[u]
    return float(s) * 0.001


# --- rectangle covering ----------------------------------------------------


def rect_from_point_distance(lon: float, lat: float, dist_km: float):
    """geo.go RectFromPointDistance role: bounding rect of the circle.

    Lon bounds are clamped to [-180, 180]; callers that must not lose the
    far side of the antimeridian should use rects_from_point_distance."""
    lat_delta = dist_km / 111.195  # km per degree latitude (mean)
    coslat = max(0.01, math.cos(lat * _DEG2RAD))
    lon_delta = dist_km / (111.195 * coslat)
    return (
        max(_MIN_LON, lon - lon_delta),
        max(_MIN_LAT, lat - lat_delta),
        min(_MAX_LON, lon + lon_delta),
        min(_MAX_LAT, lat + lat_delta),
    )


def rects_from_point_distance(lon: float, lat: float, dist_km: float):
    """Bounding rect(s) of the circle, wrapping across the antimeridian:
    a circle near ±180 yields TWO rects (the reference reaches the same
    effect by boundingRectangleForCircle + the dateline split in
    search/query/geo_boundingbox.go:68-82)."""
    lat_delta = dist_km / 111.195
    coslat = max(0.01, math.cos(lat * _DEG2RAD))
    lon_delta = dist_km / (111.195 * coslat)
    lat_lo = max(_MIN_LAT, lat - lat_delta)
    lat_hi = min(_MAX_LAT, lat + lat_delta)
    if lon_delta >= 180.0:
        return [(_MIN_LON, lat_lo, _MAX_LON, lat_hi)]
    lo, hi = lon - lon_delta, lon + lon_delta
    rects = []
    if lo < _MIN_LON:
        rects.append((lo + 360.0, lat_lo, _MAX_LON, lat_hi))
        lo = _MIN_LON
    if hi > _MAX_LON:
        rects.append((_MIN_LON, lat_lo, hi - 360.0, lat_hi))
        hi = _MAX_LON
    rects.append((lo, lat_lo, hi, lat_hi))
    return rects


def morton_ranges_for_rect(
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
    max_cells: int = 64,
) -> List[Tuple[int, int]]:
    """Quadtree cover of the scaled-integer rect as morton intervals
    (int64, sortable domain).  Cells fully inside emit their whole code
    range; when the cell budget runs out, partial cells emit their range
    too (superset -- the exact filter downstream removes false
    positives)."""
    x1, x2 = int(scale_lon(min_lon)), int(scale_lon(max_lon))
    y1, y2 = int(scale_lat(min_lat)), int(scale_lat(max_lat))
    out: List[Tuple[int, int]] = []
    # stack of (cell_x0, cell_y0, level) where the cell spans 2^level units
    stack = [(0, 0, GEO_BITS)]
    while stack:
        cx, cy, lvl = stack.pop()
        size = 1 << lvl
        if cx > x2 or cy > y2 or cx + size - 1 < x1 or cy + size - 1 < y1:
            continue
        inside = (
            cx >= x1 and cx + size - 1 <= x2
            and cy >= y1 and cy + size - 1 <= y2
        )
        if inside or lvl == 0 or len(stack) + len(out) >= max_cells:
            base = int(interleave(np.uint64(cx), np.uint64(cy)))
            out.append((base, base + (1 << (2 * lvl)) - 1))
            continue
        half = size >> 1
        stack.extend(
            [
                (cx, cy, lvl - 1),
                (cx + half, cy, lvl - 1),
                (cx, cy + half, lvl - 1),
                (cx + half, cy + half, lvl - 1),
            ]
        )
    # to sortable int64 domain (values are indexed as int64 view of uint64);
    # split any interval straddling 2^63 first (only the full-domain cell
    # can, since cells are power-of-4 aligned)
    half_point = 1 << 63
    split: List[Tuple[int, int]] = []
    for a, b in out:
        if a < half_point <= b:
            split.append((a, half_point - 1))
            split.append((half_point, b))
        else:
            split.append((a, b))

    def to_i64(u: int) -> int:
        return u - (1 << 64) if u >= 1 << 63 else u

    merged = sorted((to_i64(a), to_i64(b)) for a, b in split)
    # coalesce adjacent intervals
    res: List[Tuple[int, int]] = []
    for a, b in merged:
        if res and a <= res[-1][1] + 1:
            res[-1] = (res[-1][0], max(res[-1][1], b))
        else:
            res.append((a, b))
    return res


_GEOHASH_MAX_LENGTH = 12


def _numeric(v):
    """geo/parse.go util.ExtractNumericValFloat64: ints/floats yes,
    bool/None/str no."""
    import numbers

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, numbers.Real):  # covers numpy ints/floats too
        return float(v)
    return None


def extract_geo_point(thing):
    """geo/parse.go:50-150 ExtractGeoPoint -> (lon, lat, ok).

    Supported value shapes, matching the reference's rules:
    - 2-element sequence [lon, lat] (GeoJSON order); any other length
      fails;
    - string "lat,lon" (comma-separated, lat FIRST) or a geohash of at
      most 12 chars;
    - mapping with exact keys lat + lon (or lng); failing that, a
      case-insensitive prefix match on lon/lng and lat key names (the
      reference's reflected-struct path);
    - numeric values must be real numbers: bool and None fail.
    """
    if thing is None:
        return 0.0, 0.0, False
    if isinstance(thing, str):
        if "," in thing:
            parts = thing.split(",")
            if len(parts) != 2:
                return 0.0, 0.0, False
            try:
                return float(parts[1]), float(parts[0]), True
            except ValueError:
                return 0.0, 0.0, False
        if 0 < len(thing) <= _GEOHASH_MAX_LENGTH:
            try:
                lat, lon = decode_geohash(thing)
            except KeyError:
                return 0.0, 0.0, False
            return lon, lat, True
        return 0.0, 0.0, False
    if isinstance(thing, dict):
        lon = _numeric(thing.get("lon", thing.get("lng")))
        lat = _numeric(thing.get("lat"))
        if lon is None or lat is None:
            # reflected-struct fallback: case-insensitive prefix match
            for k, v in thing.items():
                lk = str(k).lower()
                if lon is None and (lk.startswith("lon") or lk.startswith("lng")):
                    lon = _numeric(v)
                if lat is None and lk.startswith("lat"):
                    lat = _numeric(v)
        if lon is None or lat is None:
            return 0.0, 0.0, False
        return lon, lat, True
    if isinstance(thing, (list, tuple)) or (
        hasattr(thing, "__len__") and hasattr(thing, "__getitem__")
    ):
        if len(thing) != 2:
            return 0.0, 0.0, False
        lon = _numeric(thing[0])
        lat = _numeric(thing[1])
        if lon is None or lat is None:
            return 0.0, 0.0, False
        return lon, lat, True
    return 0.0, 0.0, False


def decode_geohash(gh: str):
    """geo/geohash.go DecodeGeoHash: -> (lat, lon) cell centers."""
    enc = "0123456789bcdefghjkmnpqrstuvwxyz"
    dec = {c: i for i, c in enumerate(enc)}
    even = True
    lat = [-90.0, 90.0]
    lon = [-180.0, 180.0]
    for ch in gh:
        cd = dec[ch]
        for mask in (16, 8, 4, 2, 1):
            if even:
                if cd & mask:
                    lon[0] = (lon[0] + lon[1]) / 2
                else:
                    lon[1] = (lon[0] + lon[1]) / 2
            else:
                if cd & mask:
                    lat[0] = (lat[0] + lat[1]) / 2
                else:
                    lat[1] = (lat[0] + lat[1]) / 2
            even = not even
    return (lat[0] + lat[1]) / 2, (lon[0] + lon[1]) / 2


def encode_geohash(lat: float, lon: float, precision: int = 12) -> str:
    """geo/geohash.go EncodeGeoHash: (lat, lon) -> base32 geohash.

    Bisects the lat/lon intervals, emitting one base32 char per 5 bits,
    using strict `>` against the midpoint like the reference.
    """
    enc = "0123456789bcdefghjkmnpqrstuvwxyz"
    even = True
    lats = [-90.0, 90.0]
    lons = [-180.0, 180.0]
    out = []
    ch = 0
    bit = 0
    masks = (16, 8, 4, 2, 1)
    while len(out) < precision:
        if even:
            mid = (lons[0] + lons[1]) / 2
            if lon > mid:
                ch |= masks[bit]
                lons[0] = mid
            else:
                lons[1] = mid
        else:
            mid = (lats[0] + lats[1]) / 2
            if lat > mid:
                ch |= masks[bit]
                lats[0] = mid
            else:
                lats[1] = mid
        even = not even
        if bit < 4:
            bit += 1
        else:
            out.append(enc[ch])
            ch = 0
            bit = 0
    return "".join(out)


def point_in_polygon(lon: float, lat: float, coords) -> bool:
    """pnpoly ray-cast with the reference's vertex tolerance
    (search_geopolygon.go:86-150): coords = [(lon, lat), ...]."""
    n = len(coords)
    if n < 3:
        return False
    eps = 1e-6

    def intersects(px, py, ax, ay, bx, by):
        return (ay > py) != (by > py) and (
            px < (bx - ax) * (py - ay) / (by - ay) + ax
        )

    ax, ay = coords[-1]
    bx, by = coords[0]
    inside = intersects(lon, lat, ax, ay, bx, by)
    if abs(coords[0][1] - lat) <= eps and abs(coords[0][0] - lon) <= eps:
        return True
    for j in range(1, n):
        if abs(coords[j][1] - lat) <= eps and abs(coords[j][0] - lon) <= eps:
            return True
        if intersects(
            lon, lat, coords[j - 1][0], coords[j - 1][1],
            coords[j][0], coords[j][1],
        ):
            inside = not inside
    return inside
