"""GeoJSON shape parsing, planar relation predicates, and quadtree
covering-cell tokens for the geoshape FIELD type.

Reference design (document/field_geoshape.go + geo/geo_s2plugin_impl.go +
search/searcher/search_geoshape.go): a shape field is indexed as a set of
s2 cell-union tokens; a geoshape query turns the query shape into tokens,
unions the matching postings (MultiTermSearcher), then filters candidates
with an exact relation check against the docvalue-stored geometry.

This engine re-expresses the same three-part design over its existing
lon/lat quadtree instead of s2:

- a CELL is a path string over '0'..'3' (2 bits per level, lon bit then
  lat bit) descending from the whole world [-180,180]x[-90,90]; the
  indexed token is "s" + path.  Tokens sort so that a cell's descendants
  are exactly the term-dictionary PREFIX RANGE of its token, and its
  ancestors are the token's proper prefixes -- so query-time candidate
  expansion is a handful of prefix scans + exact lookups, no geometry in
  the dictionary walk.
- doc side: cover_cells() emits a mixed-level cover of the shape
  (cells fully inside are kept coarse, boundary cells are refined).
- query side: the same cover at a modest budget; candidates = docs
  holding a token that is an ancestor or descendant of any query cover
  cell; exact relation (intersects/within/contains) decided on the
  parsed docvalue GeoJSON.

Geometry is planar in lon/lat degrees (the reference uses s2 geodesics;
for the small shapes exercised in tests the classifications coincide)
EXCEPT circles, whose radius is in distance units and is evaluated with
the same haversine used by GeoDistanceQuery.
"""

from __future__ import annotations

import json
import math
from typing import Dict, List, Optional, Sequence, Tuple

from .geo import haversin_km, parse_distance_km

EPS = 1e-9
SHAPE_TOKEN_PREFIX = "s"
WORLD = (-180.0, -90.0, 180.0, 90.0)

# ---------------------------------------------------------------------------
# GeoJSON -> primitive list
#
# A primitive is one of
#   ("pt",   (x, y))
#   ("line", [(x, y), ...])                       >= 2 points
#   ("poly", (outer_ring, [hole_ring, ...]))      rings are [(x, y), ...]
#   ("circle", (cx, cy, r_km))
# Envelope becomes a poly; multi* explode; geometrycollection recurses.
# ---------------------------------------------------------------------------


def _pt(c) -> Tuple[float, float]:
    return (float(c[0]), float(c[1]))


def _ring(c) -> List[Tuple[float, float]]:
    r = [_pt(p) for p in c]
    # drop an explicit closing point; predicates close implicitly
    if len(r) > 1 and r[0] == r[-1]:
        r = r[:-1]
    return r


def _rect_poly(x1, y1, x2, y2) -> List[Tuple[float, float]]:
    return [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]


def _unwrap_lons(pts: List[Tuple[float, float]]) -> List[Tuple[float, float]]:
    """Make consecutive longitudes continuous (every delta < 180 in
    magnitude) -- a ring written with a +170 -> -170 jump is really
    crossing the antimeridian, not spanning the globe."""
    out = [pts[0]]
    for x, y in pts[1:]:
        px = out[-1][0]
        while x - px > 180.0:
            x -= 360.0
        while x - px < -180.0:
            x += 360.0
        out.append((x, y))
    return out


def _clip_ring_halfplane(ring, keep_le: bool, bound: float):
    """Sutherland-Hodgman clip of a closed ring against x <= bound
    (keep_le) or x >= bound."""

    def inside(p):
        return p[0] <= bound + EPS if keep_le else p[0] >= bound - EPS

    def crossing(a, b):
        t = (bound - a[0]) / (b[0] - a[0])
        return (bound, a[1] + t * (b[1] - a[1]))

    out: List[Tuple[float, float]] = []
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        if inside(a):
            out.append(a)
            if not inside(b):
                out.append(crossing(a, b))
        elif inside(b):
            out.append(crossing(a, b))
    return out if len(out) >= 3 else []


def _planar_orientation_ok(outer, unwrapped, holes) -> bool:
    """True when the planar (RFC 7946 unwrap) reading of the ring agrees
    with the s2 ORIENTED-loop reading the reference uses: the loop
    interior is LEFT of the directed edges, so a ring whose left region
    exceeds half the sphere means THE COMPLEMENT — e.g. the
    284-degree-lon box of the search_geoshape_polygon vectors.  Decided
    by the loop's turning-angle area (geo_sphere.spherical_left_area):
    no planar reading ever encloses more than a hemisphere, so
    area > 2*pi == divergence."""
    import math as _m

    from .geo_sphere import spherical_left_area

    return spherical_left_area(outer) <= 2.0 * _m.pi


def _split_poly_antimeridian(outer, holes) -> List[tuple]:
    """Geodesic guardrail: a ring whose consecutive longitudes jump by
    more than 180 degrees crosses the antimeridian (RFC 7946 producers
    are told to split such shapes; many don't).  Planar math would read
    it as a globe-spanning sliver and misclassify everything, so unwrap
    the longitudes and split the polygon at the +-180 meridian into two
    in-range polygons (the same treatment geo bbox queries already get
    in search/query.py).  Rings genuinely spanning >180 degrees of
    longitude stay ambiguous in planar space and are rejected."""
    u = _unwrap_lons(outer)
    lo = min(x for x, _ in u)
    hi = max(x for x, _ in u)
    if hi - lo > 180.0:
        # rings genuinely spanning >180 degrees of longitude (polar
        # rings, near-global boxes) have no faithful planar reading:
        # evaluate as an ORIENTED spherical loop with great-circle
        # edges (geo_sphere.py; the s2 semantics the reference uses).
        # Formerly a rejection guardrail.
        from .geo_sphere import SphericalPolygon

        return [("spoly", SphericalPolygon(outer, holes))]
    if not _planar_orientation_ok(outer, u, holes):
        # the ring is listed so that the s2 oriented-loop interior is
        # the COMPLEMENT of the planar reading (reference semantics)
        from .geo_sphere import SphericalPolygon

        return [("spoly", SphericalPolygon(outer, holes))]
    if -180.0 <= lo and hi <= 180.0:
        return [("poly", (u, holes))]
    if lo < -180.0:  # normalize the crossing to the +180 side
        u = [(x + 360.0, y) for x, y in u]
    uh = [_unwrap_lons(h) for h in holes]
    uh = [
        [(x + 360.0, y) for x, y in h] if min(x for x, _ in h) < -180.0
        else h
        for h in uh
    ]
    out: List[tuple] = []
    for keep_le, shift in ((True, 0.0), (False, -360.0)):
        o = _clip_ring_halfplane(u, keep_le, 180.0)
        if not o:
            continue
        hs = [
            _clip_ring_halfplane(h, keep_le, 180.0) for h in uh
        ]
        out.append(
            (
                "poly",
                (
                    [(x + shift, y) for x, y in o],
                    [
                        [(x + shift, y) for x, y in h]
                        for h in hs
                        if h
                    ],
                ),
            )
        )
    return out


def _split_line_antimeridian(pts) -> List[tuple]:
    """Split a dateline-crossing linestring into in-range pieces."""
    u = _unwrap_lons(pts)
    lo = min(x for x, _ in u)
    hi = max(x for x, _ in u)
    if -180.0 <= lo and hi <= 180.0:
        return [("line", u)]
    if hi - lo > 180.0:
        raise ValueError(
            "linestring spans more than 180 degrees of longitude; "
            "split the shape at the antimeridian"
        )
    if lo < -180.0:
        u = [(x + 360.0, y) for x, y in u]
    pieces: List[List[Tuple[float, float]]] = []
    cur: List[Tuple[float, float]] = []
    east = u[0][0] > 180.0
    for i, p in enumerate(u):
        if i > 0:
            a, b = u[i - 1], p
            b_east = b[0] > 180.0
            if b_east != east and a[0] != b[0]:
                t = (180.0 - a[0]) / (b[0] - a[0])
                yc = a[1] + t * (b[1] - a[1])
                cur.append((180.0, yc))
                pieces.append(cur)
                cur = [(180.0, yc)]
                east = b_east
        cur.append(p)
    pieces.append(cur)
    out = []
    for piece in pieces:
        if len(piece) < 2:
            continue
        if any(x > 180.0 for x, _ in piece):
            piece = [(x - 360.0, y) for x, y in piece]
        # points exactly on the seam belong to both halves; clamp
        piece = [(min(max(x, -180.0), 180.0), y) for x, y in piece]
        out.append(("line", piece))
    return out


def parse_geojson(shape) -> List[tuple]:
    """Normalize a GeoJSON value (dict or JSON string) to primitives.
    Type names are case-insensitive (reference geo/parse.go).
    Antimeridian-crossing polygons/linestrings/envelopes are split into
    in-range pieces (geodesic guardrail; see _split_poly_antimeridian)."""
    if shape is None:
        return []
    if isinstance(shape, (bytes, str)):
        shape = json.loads(shape)
    t = str(shape.get("type", "")).lower()
    c = shape.get("coordinates")
    if t == "point":
        return [("pt", _pt(c))]
    if t == "multipoint":
        return [("pt", _pt(p)) for p in c]
    if t == "linestring":
        return _split_line_antimeridian([_pt(p) for p in c])
    if t == "multilinestring":
        out = []
        for part in c:
            out.extend(_split_line_antimeridian([_pt(p) for p in part]))
        return out
    if t == "polygon":
        rings = [_ring(r) for r in c]
        if not rings:
            return []
        return _split_poly_antimeridian(rings[0], rings[1:])
    if t == "multipolygon":
        out = []
        for part in c:
            rings = [_ring(r) for r in part]
            if rings:
                out.extend(_split_poly_antimeridian(rings[0], rings[1:]))
        return out
    if t == "envelope":
        # reference geo/parse.go: [[minLon, maxLat], [maxLon, minLat]].
        # kind "env" behaves exactly like its rect polygon EXCEPT as a
        # WITHIN/CONTAINS container, where the reference's envelope
        # interior is OPEN: shapes touching the rect boundary are not
        # contained (geoshape_within_test.go TestEnvelopePolygonWithin
        # "polygon completely within bounded rectangle" -> false).
        (x1, y2), (x2, y1) = _pt(c[0]), _pt(c[1])
        if x1 > x2:
            # minLon > maxLon = dateline-crossing envelope: split like
            # geo bbox queries (search/query.py)
            return [
                ("env", (_rect_poly(x1, y1, 180.0, y2), [])),
                ("env", (_rect_poly(-180.0, y1, x2, y2), [])),
            ]
        return [("env", (_rect_poly(x1, y1, x2, y2), []))]
    if t == "circle":
        r_km = parse_distance_km(
            shape.get("radius", shape.get("radiusInMeters", 0))
        )
        cx, cy = _pt(c)
        return [("circle", (cx, cy, r_km))]
    if t == "geometrycollection":
        out = []
        for g in shape.get("geometries", []):
            out.extend(parse_geojson(g))
        return out
    raise ValueError(f"unsupported GeoJSON type: {t!r}")


# ---------------------------------------------------------------------------
# scalar predicates (planar, degree space)
# ---------------------------------------------------------------------------


def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_seg(px, py, ax, ay, bx, by) -> bool:
    if abs(_orient(ax, ay, bx, by, px, py)) > EPS:
        return False
    return (
        min(ax, bx) - EPS <= px <= max(ax, bx) + EPS
        and min(ay, by) - EPS <= py <= max(ay, by) + EPS
    )


def seg_seg_intersect(a1, a2, b1, b2) -> bool:
    """Segment intersection incl. touching and collinear overlap."""
    o1 = _orient(*a1, *a2, *b1)
    o2 = _orient(*a1, *a2, *b2)
    o3 = _orient(*b1, *b2, *a1)
    o4 = _orient(*b1, *b2, *a2)
    if ((o1 > EPS and o2 < -EPS) or (o1 < -EPS and o2 > EPS)) and (
        (o3 > EPS and o4 < -EPS) or (o3 < -EPS and o4 > EPS)
    ):
        return True
    return (
        _on_seg(*b1, *a1, *a2)
        or _on_seg(*b2, *a1, *a2)
        or _on_seg(*a1, *b1, *b2)
        or _on_seg(*a2, *b1, *b2)
    )


def point_in_ring(px, py, ring) -> bool:
    """Even-odd ray cast, boundary-inclusive (matches the reference's
    vertex-tolerant pnpoly use in search_geopolygon.go)."""
    n = len(ring)
    inside = False
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if _on_seg(px, py, ax, ay, bx, by):
            return True
        if (ay > py) != (by > py):
            x_at = ax + (py - ay) * (bx - ax) / (by - ay)
            if px < x_at:
                inside = not inside
    return inside


def point_in_poly(px, py, poly) -> bool:
    outer, holes = poly
    if not point_in_ring(px, py, outer):
        return False
    for h in holes:
        # on a hole boundary counts as on the polygon
        onb = any(
            _on_seg(px, py, *h[i], *h[(i + 1) % len(h)])
            for i in range(len(h))
        )
        if not onb and point_in_ring(px, py, h):
            return False
    return True


def _poly_segments(poly):
    outer, holes = poly
    for ring in [outer] + list(holes):
        n = len(ring)
        for i in range(n):
            yield ring[i], ring[(i + 1) % n]


def _line_segments(line):
    for i in range(len(line) - 1):
        yield line[i], line[i + 1]


def seg_rect_overlap(a, b, rect) -> bool:
    """Does segment a-b meet the rect (incl. passing through or lying
    inside)?  Liang-Barsky style clip."""
    x1, y1, x2, y2 = rect
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, ax - x1),
        (dx, x2 - ax),
        (-dy, ay - y1),
        (dy, y2 - ay),
    ):
        if abs(p) < EPS:
            if q < -EPS:
                return False
            continue
        t = q / p
        if p < 0:
            if t > t1:
                return False
            if t > t0:
                t0 = t
        else:
            if t < t0:
                return False
            if t < t1:
                t1 = t
    return True


def point_in_rect(px, py, rect) -> bool:
    x1, y1, x2, y2 = rect
    return x1 - EPS <= px <= x2 + EPS and y1 - EPS <= py <= y2 + EPS


def _clamp(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def _circle_dist_km(cx, cy, px, py) -> float:
    return float(haversin_km(cx, cy, px, py))


def _seg_near_point(a, b, cx, cy, r_km) -> bool:
    """Min distance from segment to circle center <= r, via the planar
    projection parameter then haversine to the nearest point (near-exact
    for small segments; circles are the one distance-unit shape)."""
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    dd = dx * dx + dy * dy
    if dd < EPS:
        return _circle_dist_km(cx, cy, ax, ay) <= r_km
    t = _clamp(((cx - ax) * dx + (cy - ay) * dy) / dd, 0.0, 1.0)
    return _circle_dist_km(cx, cy, ax + t * dx, ay + t * dy) <= r_km


# ---------------------------------------------------------------------------
# primitive-pair predicates
# ---------------------------------------------------------------------------


def _spoly_other_parts(prim):
    """(vertices lon/lat, xyz segments) of a non-spoly primitive, for
    spherical predicates; circles polygonalize geodesically."""
    from .geo_sphere import geodesic_circle_ring, segments_xyz

    k, v = _as_poly(prim)
    if k == "pt":
        return [v], []
    if k == "line":
        return list(v), segments_xyz(v, closed=False)
    if k == "poly":
        verts = list(v[0]) + [q for h in v[1] for q in h]
        segs = segments_xyz(v[0], closed=True)
        for h in v[1]:
            segs.extend(segments_xyz(h, closed=True))
        return verts, segs
    if k == "circle":
        ring = geodesic_circle_ring(v[0], v[1], v[2])
        return ring, segments_xyz(ring, closed=True)
    raise AssertionError(k)


def _spoly_prim_intersects(sp, prim) -> bool:
    from .geo_sphere import arcs_intersect

    k, v = prim
    verts, segs = _spoly_other_parts(prim)
    if any(sp.contains_lonlat(px, py) for px, py in verts):
        return True
    bedges = list(sp.boundary_edges())
    if any(
        arcs_intersect(s, e, a, b) for s, e in segs for a, b in bedges
    ):
        return True
    if k == "poly":
        # the spherical region's boundary may sit entirely inside the
        # planar polygon
        return any(
            point_in_poly(px, py, v) for px, py in sp.lonlat
        )
    if k == "circle":
        return _circle_dist_km(v[0], v[1], *sp.lonlat[0]) <= v[2]
    return False


def _prim_within_spoly(prim, sp) -> bool:
    """Non-spoly primitive entirely inside the spherical polygon:
    every vertex contained (closed boundary) and no strict boundary
    crossing."""
    from .geo_sphere import arcs_cross

    verts, segs = _spoly_other_parts(prim)
    if not all(sp.contains_lonlat(px, py) for px, py in verts):
        return False
    bedges = list(sp.boundary_edges())
    return not any(
        arcs_cross(s, e, a, b) for s, e in segs for a, b in bedges
    )


def _as_poly(p: tuple) -> tuple:
    """Envelopes behave as their rect polygon everywhere except as a
    strict (open-interior) WITHIN container — see _prim_within."""
    return ("poly", p[1]) if p[0] == "env" else p


def _prim_intersects(a: tuple, b: tuple) -> bool:
    a = _as_poly(a)
    b = _as_poly(b)
    ka, va = a
    kb, vb = b
    if ka == "spoly" or kb == "spoly":
        if ka == "spoly" and kb == "spoly":
            from .geo_sphere import arcs_intersect

            ea, eb = list(va.boundary_edges()), list(vb.boundary_edges())
            return (
                any(vb.contains_lonlat(*p) for p in va.lonlat)
                or any(va.contains_lonlat(*p) for p in vb.lonlat)
                or any(
                    arcs_intersect(s, e, c, d)
                    for s, e in ea
                    for c, d in eb
                )
            )
        if ka == "spoly":
            return _spoly_prim_intersects(va, b)
        return _spoly_prim_intersects(vb, a)
    # order so ka <= kb alphabetically for fewer cases
    if (ka, kb) in _SWAP:
        return _prim_intersects(b, a)
    if ka == "pt" and kb == "pt":
        return (
            abs(va[0] - vb[0]) <= EPS and abs(va[1] - vb[1]) <= EPS
        )
    if ka == "pt" and kb == "line":
        return any(_on_seg(*va, *s, *e) for s, e in _line_segments(vb))
    if ka == "pt" and kb == "poly":
        return point_in_poly(*va, vb)
    if ka == "pt" and kb == "circle":
        cx, cy, r = vb
        return _circle_dist_km(cx, cy, *va) <= r
    if ka == "line" and kb == "line":
        # geodesic edges (geo_sphere.py): planar lon/lat misses
        # collinear-overlap sublines on the great circle (reference
        # TestLinestringIntersects 'subline not at vertex')
        from .geo_sphere import geodesic_lines_intersect

        return geodesic_lines_intersect(va, vb)
    if ka == "line" and kb == "poly":
        if any(point_in_poly(*p, vb) for p in va):
            return True
        return any(
            seg_seg_intersect(s1, e1, s2, e2)
            for s1, e1 in _line_segments(va)
            for s2, e2 in _poly_segments(vb)
        )
    if ka == "line" and kb == "circle":
        cx, cy, r = vb
        return any(
            _seg_near_point(s, e, cx, cy, r) for s, e in _line_segments(va)
        )
    if ka == "poly" and kb == "poly":
        if any(point_in_poly(*p, vb) for p in va[0]):
            return True
        if any(point_in_poly(*p, va) for p in vb[0]):
            return True
        return any(
            seg_seg_intersect(s1, e1, s2, e2)
            for s1, e1 in _poly_segments(va)
            for s2, e2 in _poly_segments(vb)
        )
    if ka == "poly" and kb == "circle":
        cx, cy, r = vb
        if point_in_poly(cx, cy, va):
            return True
        return any(
            _seg_near_point(s, e, cx, cy, r) for s, e in _poly_segments(va)
        )
    if ka == "circle" and kb == "circle":
        ax, ay, ra = va
        bx, by, rb = vb
        return _circle_dist_km(ax, ay, bx, by) <= ra + rb
    raise AssertionError((ka, kb))


_SWAP = {
    ("line", "pt"),
    ("poly", "pt"),
    ("circle", "pt"),
    ("poly", "line"),
    ("circle", "line"),
    ("circle", "poly"),
}


def _prim_within_env(a: tuple, ring) -> bool:
    """Envelope containment with the reference's MIXED boundary rule
    (geoshape_within_test.go): POINTS on the rect boundary are within
    (TestEnvelopePointWithin "point on vertex" -> true) but POLYGONS
    touching the boundary are not (TestEnvelopePolygonWithin "polygon
    completely within bounded rectangle" with edge overlap -> false;
    same for contains).  The rect is convex, so vertex tests are
    exact."""
    x1 = min(x for x, _ in ring)
    x2 = max(x for x, _ in ring)
    y1 = min(y for _, y in ring)
    y2 = max(y for _, y in ring)
    ka, va = a
    if ka == "spoly":
        return False
    if ka == "circle":
        cx, cy, r = va
        if not point_in_rect(cx, cy, (x1, y1, x2, y2)):
            return False
        return not any(
            _seg_near_point(s, e, cx, cy, r - EPS)
            for s, e in _poly_segments((ring, []))
        )
    if ka in ("pt", "line"):
        # closed-boundary containees
        return all(
            point_in_rect(px, py, (x1, y1, x2, y2))
            for px, py in _prim_vertices(a)
        )
    # polygon-like containees: open interior (strictly inside)
    return all(
        (px - x1) > EPS
        and (x2 - px) > EPS
        and (py - y1) > EPS
        and (y2 - py) > EPS
        for px, py in _prim_vertices(a)
    )


def _prim_vertices(p: tuple) -> List[Tuple[float, float]]:
    k, v = _as_poly(p)
    if k == "spoly":
        return list(v.lonlat)
    if k == "pt":
        return [v]
    if k == "line":
        return list(v)
    if k == "poly":
        return list(v[0]) + [q for h in v[1] for q in h]
    if k == "circle":
        cx, cy, _ = v
        return [(cx, cy)]
    raise AssertionError(k)


def _prim_within(a: tuple, b: tuple) -> bool:
    """Is primitive ``a`` entirely inside container primitive ``b``?"""
    if b[0] == "env":
        return _prim_within_env(_as_poly(a), b[1][0])
    a = _as_poly(a)
    ka, va = a
    kb, vb = b
    if kb == "spoly":
        if ka == "spoly":
            from .geo_sphere import arcs_cross

            eb = list(vb.boundary_edges())
            return all(
                vb.contains_lonlat(*p) for p in va.lonlat
            ) and not any(
                arcs_cross(s, e, c, d)
                for s, e in va.boundary_edges()
                for c, d in eb
            )
        return _prim_within_spoly(a, vb)
    if ka == "spoly":
        # a >half-sphere / polar region cannot fit inside any planar
        # primitive this engine stores
        return False
    if kb == "pt":
        return ka == "pt" and _prim_intersects(a, b)
    if kb == "circle":
        cx, cy, r = vb
        if ka == "circle":
            ax, ay, ra = va
            return _circle_dist_km(cx, cy, ax, ay) + ra <= r + EPS
        return all(
            _circle_dist_km(cx, cy, *p) <= r for p in _prim_vertices(a)
        )
    if kb == "poly":
        if ka == "circle":
            # conservative: center in poly and boundary farther than r
            cx, cy, r = va
            if not point_in_poly(cx, cy, vb):
                return False
            return not any(
                _seg_near_point(s, e, cx, cy, r - EPS)
                for s, e in _poly_segments(vb)
            )
        verts = _prim_vertices(a)
        if not all(point_in_poly(*p, vb) for p in verts):
            return False
        if ka == "pt":
            return True
        segs = (
            _line_segments(va) if ka == "line" else _poly_segments(va)
        )
        # no proper boundary crossing: all vertices already inside, so a
        # crossing would show as a segment-pair intersection that is not
        # a mere touch of the container boundary by an inside vertex
        bsegs = list(_poly_segments(vb))
        for s1, e1 in segs:
            for s2, e2 in bsegs:
                o1 = _orient(*s2, *e2, *s1)
                o2 = _orient(*s2, *e2, *e1)
                if (o1 > EPS and o2 < -EPS) or (o1 < -EPS and o2 > EPS):
                    o3 = _orient(*s1, *e1, *s2)
                    o4 = _orient(*s1, *e1, *e2)
                    if (o3 > EPS and o4 < -EPS) or (
                        o3 < -EPS and o4 > EPS
                    ):
                        return False
        if ka == "poly":
            # a hole of b strictly inside a would carve a out of b
            for h in vb[1]:
                if h and all(point_in_ring(*p, va[0]) for p in h):
                    return False
        return True
    if kb == "line":
        if ka == "pt":
            return _prim_intersects(a, b)
        # polylines have no interior: the reference reports even
        # COINCIDENT linestrings as not-within
        # (geoshape_within_test.go "coincident linestrings" -> false)
        return False
    raise AssertionError(kb)


# ---------------------------------------------------------------------------
# shape-level relations
# ---------------------------------------------------------------------------


def shapes_intersect(a: Sequence[tuple], b: Sequence[tuple]) -> bool:
    return any(_prim_intersects(pa, pb) for pa in a for pb in b)


def shape_within(a: Sequence[tuple], b: Sequence[tuple]) -> bool:
    """Every primitive of ``a`` inside SOME primitive of ``b`` (exact for
    single-shape containers; conservative for containers whose union --
    but no single part -- contains a part of ``a``)."""
    if not a or not b:
        return False
    return all(any(_prim_within(pa, pb) for pb in b) for pa in a)


def shape_relation(
    doc: Sequence[tuple], query: Sequence[tuple], relation: str
) -> bool:
    """relation semantics per reference search/searcher/search_geoshape.go
    filterShapes: intersects / within (doc within query) / contains
    (doc contains query)."""
    if relation == "intersects":
        return shapes_intersect(doc, query)
    if relation == "within":
        return shape_within(doc, query)
    if relation == "contains":
        return shape_within(query, doc)
    raise ValueError(f"unknown geoshape relation: {relation!r}")


# ---------------------------------------------------------------------------
# quadtree cover
# ---------------------------------------------------------------------------


def _rect_of_path(path: str) -> Tuple[float, float, float, float]:
    x1, y1, x2, y2 = WORLD
    for ch in path:
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        q = ord(ch) - 48
        if q & 2:
            x1 = mx
        else:
            x2 = mx
        if q & 1:
            y1 = my
        else:
            y2 = my
    return (x1, y1, x2, y2)


def _rect_prim(rect) -> tuple:
    x1, y1, x2, y2 = rect
    return ("poly", (_rect_poly(x1, y1, x2, y2), []))


def _rect_intersects_shape(rect, prims) -> bool:
    return shapes_intersect([_rect_prim(rect)], prims)


def _rect_within_shape(rect, prims) -> bool:
    return shape_within([_rect_prim(rect)], prims)


def shape_bbox(prims) -> Tuple[float, float, float, float]:
    xs: List[float] = []
    ys: List[float] = []
    for k, v in prims:
        if k == "circle":
            cx, cy, r = v
            # ~111 km per degree; bbox only guides cover depth
            d = r / 111.0 + 1e-6
            xs.extend((cx - d, cx + d))
            ys.extend((cy - d, cy + d))
        else:
            for px, py in _prim_vertices((k, v)):
                xs.append(px)
                ys.append(py)
    return (min(xs), min(ys), max(xs), max(ys))


def cover_cells(
    prims: Sequence[tuple],
    max_level: int = 12,
    max_cells: int = 64,
) -> List[str]:
    """Mixed-level quadtree cover of the shape: cells fully inside the
    shape (or boundary cells at the refinement floor) are emitted.  The
    refinement floor adapts to the shape's bbox so the cover stays
    ~O(max_cells) regardless of shape size (the s2 RegionCoverer
    max-cells role, geo/geo_s2plugin_impl.go)."""
    if not prims:
        return []
    x1, y1, x2, y2 = shape_bbox(prims)
    span = max(x2 - x1, (y2 - y1) * 2.0, 1e-12)  # lat halves twice as fast
    # cell lon-width at level L is 360/2^L; stop ~2 levels below bbox span
    fit = int(math.floor(math.log2(360.0 / span))) if span < 360 else 0
    floor_level = min(max_level, max(0, fit) + 2)

    out: List[str] = []
    frontier: List[str] = [""]
    level = 0
    while frontier and level <= floor_level:
        nxt: List[str] = []
        for path in frontier:
            rect = _rect_of_path(path)
            if not _rect_intersects_shape(rect, prims):
                continue
            if (
                level == floor_level
                or _rect_within_shape(rect, prims)
            ):
                out.append(path)
            else:
                for q in "0123":
                    nxt.append(path + q)
        # budget: if refining would blow the cap, emit the frontier coarse
        if len(out) + len(nxt) > max_cells and level < floor_level:
            for path in nxt:
                rect = _rect_of_path(path)
                if _rect_intersects_shape(rect, prims):
                    out.append(path)
            return out
        frontier = nxt
        level += 1
    return out


def shape_tokens(shape, max_level: int = 12, max_cells: int = 64) -> List[str]:
    """Indexable cell tokens for a GeoJSON doc value."""
    prims = parse_geojson(shape)
    return [
        SHAPE_TOKEN_PREFIX + p for p in cover_cells(prims, max_level, max_cells)
    ]
