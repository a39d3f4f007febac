"""Great-circle (geodesic) geometry for the geoshape classes planar
lon/lat math cannot answer (reference role: the s2 geometry library
behind geo/geo_s2plugin_impl.go).

Replaces the former guardrail that REJECTED polygons spanning more
than 180 degrees of longitude (polar rings, near-global boxes): such
rings now evaluate as ORIENTED spherical loops — edges are minor
great-circle arcs between consecutive vertices and the interior is the
region to the LEFT of the directed edges, exactly s2's oriented-loop
convention.  That convention is also what makes the reference read a
284-degree-lon ring as "the big box" (the complement of the small
antimeridian-crossing box): the interior may exceed half the sphere.

Scalar numpy on tiny vertex lists: these predicates run only in the
query-time exact relation filter over an already-pruned candidate set.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

_EARTH_KM = 6371.0088


def to_xyz(lon: float, lat: float) -> np.ndarray:
    lam, phi = math.radians(lon), math.radians(lat)
    cp = math.cos(phi)
    return np.array(
        [cp * math.cos(lam), cp * math.sin(lam), math.sin(phi)]
    )


def _norm(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n else v


def point_on_arc(
    p: np.ndarray, a: np.ndarray, b: np.ndarray, tol: float = 1e-9
) -> bool:
    """p lies on the minor arc a-b (endpoints inclusive)."""
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn < 1e-15:
        # degenerate edge (a == b or antipodal): treat as the point a
        return float(np.linalg.norm(np.cross(a, p))) < tol
    n = n / nn
    if abs(float(np.dot(n, p))) > tol:
        return False
    return (
        float(np.dot(np.cross(a, p), n)) >= -tol
        and float(np.dot(np.cross(p, b), n)) >= -tol
    )


def arcs_intersect(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, d: np.ndarray,
    tol: float = 1e-9,
) -> bool:
    """Minor arcs AB and CD share at least one point: proper crossing,
    endpoint touch, or collinear overlap (same great circle)."""
    n1, n2 = np.cross(a, b), np.cross(c, d)
    x = np.cross(n1, n2)
    nx = np.linalg.norm(x)
    if (
        nx < 1e-12
        or np.linalg.norm(n1) < 1e-15
        or np.linalg.norm(n2) < 1e-15
    ):
        # same (or degenerate) great circle: overlap iff an endpoint of
        # one arc lies on the other
        return (
            point_on_arc(c, a, b, tol)
            or point_on_arc(d, a, b, tol)
            or point_on_arc(a, c, d, tol)
            or point_on_arc(b, c, d, tol)
        )
    x = x / nx
    return (point_on_arc(x, a, b, tol) and point_on_arc(x, c, d, tol)) or (
        point_on_arc(-x, a, b, tol) and point_on_arc(-x, c, d, tol)
    )


def arcs_cross(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, d: np.ndarray
) -> bool:
    """STRICT proper crossing (interiors intersect transversally) —
    the predicate parity counting needs; touches don't flip parity."""
    n1, n2 = np.cross(a, b), np.cross(c, d)
    sc, sd = float(np.dot(n1, c)), float(np.dot(n1, d))
    sa, sb = float(np.dot(n2, a)), float(np.dot(n2, b))
    if sc * sd >= 0 or sa * sb >= 0:
        return False
    x = np.cross(n1, n2)
    nx = np.linalg.norm(x)
    if nx < 1e-15:
        return False
    x = x / nx
    for t in (x, -x):
        if (
            float(np.dot(np.cross(a, t), n1)) > 0
            and float(np.dot(np.cross(t, b), n1)) > 0
            and float(np.dot(np.cross(c, t), n2)) > 0
            and float(np.dot(np.cross(t, d), n2)) > 0
        ):
            return True
    return False


def spherical_left_area(ring: Sequence[Tuple[float, float]]) -> float:
    """Area of the region LEFT of the directed loop (steradians, in
    [0, 4pi)), via total turning: for a simple spherical polygon,
    sum-of-turn-angles T = 2pi - A_left.  A CCW small ring gives
    A ~ its area; the same ring listed CW gives A ~ 4pi - area (the
    complement) — exactly the s2 oriented-loop interior."""
    v = [to_xyz(*p) for p in _dedupe_ring(ring)]
    n = len(v)
    if n < 3:
        return 0.0
    T = 0.0
    for i in range(n):
        prev, cur, nxt = v[i - 1], v[i], v[(i + 1) % n]
        # unit tangents of the incoming/outgoing arcs at cur
        t_in = _norm(np.cross(np.cross(prev, cur), cur))
        t_out = _norm(np.cross(np.cross(cur, nxt), cur))
        T += math.atan2(
            float(np.dot(np.cross(t_in, t_out), cur)),
            float(np.dot(t_in, t_out)),
        )
    a = 2.0 * math.pi - T
    while a < 0.0:
        a += 4.0 * math.pi
    while a >= 4.0 * math.pi:
        a -= 4.0 * math.pi
    return a


def _dedupe_ring(ring: Sequence[Tuple[float, float]]):
    pts = [tuple(p) for p in ring]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


class SphericalLoop:
    """Oriented spherical loop: interior = left of the directed edges
    (s2 Loop convention; may exceed half the sphere)."""

    __slots__ = ("v", "edges", "seed", "seed_inside")

    def __init__(
        self,
        ring: Sequence[Tuple[float, float]],
        orientation_seed: bool = True,
    ):
        pts = _dedupe_ring(ring)
        self.v = [to_xyz(*p) for p in pts]
        self.edges = list(zip(self.v, self.v[1:] + self.v[:1]))
        if orientation_seed:
            # a point just LEFT of the first edge's midpoint is interior
            # by definition of the orientation convention; the nudge must
            # stay well under the loop's own feature size (a concave
            # 30 m dart would swallow a fixed 1e-6 rad ~ 6 m nudge)
            min_edge = min(
                float(np.linalg.norm(p - q)) for p, q in self.edges
            )
            eps = max(1e-12, 1e-3 * min_edge)
            a, b = self.v[0], self.v[1]
            n = _norm(np.cross(a, b))  # left of travel a->b
            self.seed = _norm(_norm(a + b) + eps * n)
            self.seed_inside = True
        else:
            # even-odd mode (holes): the antipode of the vertex mean is
            # outside any ring smaller than a hemisphere
            self.seed = _norm(-np.sum(self.v, axis=0))
            self.seed_inside = False

    def on_boundary(self, p: np.ndarray, tol: float = 1e-9) -> bool:
        return any(point_on_arc(p, a, b, tol) for a, b in self.edges)

    def contains(self, p: np.ndarray, boundary: bool = True) -> bool:
        if self.on_boundary(p):
            return boundary
        inside = self.seed_inside
        for a, b in self.edges:
            if arcs_cross(p, self.seed, a, b):
                inside = not inside
        return inside


class SphericalPolygon:
    """Outer oriented loop + even-odd holes."""

    __slots__ = ("outer", "holes", "lonlat")

    def __init__(self, outer, holes=()):
        self.outer = SphericalLoop(outer, orientation_seed=True)
        self.holes = [
            SphericalLoop(h, orientation_seed=False) for h in holes
        ]
        self.lonlat = _dedupe_ring(outer) + [
            q for h in holes for q in _dedupe_ring(h)
        ]

    def boundary_edges(self):
        for e in self.outer.edges:
            yield e
        for h in self.holes:
            for e in h.edges:
                yield e

    def contains_xyz(self, p: np.ndarray) -> bool:
        if not self.outer.contains(p, boundary=True):
            return False
        for h in self.holes:
            if h.on_boundary(p):
                return True  # hole boundary belongs to the polygon
            if h.contains(p, boundary=False):
                return False
        return True

    def contains_lonlat(self, lon: float, lat: float) -> bool:
        return self.contains_xyz(to_xyz(lon, lat))


def geodesic_circle_ring(
    cx: float, cy: float, r_km: float, n: int = 64
) -> List[Tuple[float, float]]:
    """Great-circle destination points at bearing steps — the geodesic
    polygonalization of a distance circle."""
    d = r_km / _EARTH_KM
    phi1 = math.radians(cy)
    lam1 = math.radians(cx)
    out = []
    for i in range(n):
        theta = 2.0 * math.pi * i / n
        phi2 = math.asin(
            math.sin(phi1) * math.cos(d)
            + math.cos(phi1) * math.sin(d) * math.cos(theta)
        )
        lam2 = lam1 + math.atan2(
            math.sin(theta) * math.sin(d) * math.cos(phi1),
            math.cos(d) - math.sin(phi1) * math.sin(phi2),
        )
        out.append((math.degrees(lam2), math.degrees(phi2)))
    return out


def segments_xyz(pts: Sequence[Tuple[float, float]], closed: bool):
    v = [to_xyz(*p) for p in pts]
    if closed:
        return list(zip(v, v[1:] + v[:1]))
    return list(zip(v, v[1:]))


def geodesic_lines_intersect(line_a, line_b) -> bool:
    """Linestring-linestring intersection with great-circle edges —
    catches the collinear-overlap cases planar lon/lat math misses
    (reference TestLinestringIntersects 'subline not at vertex' /
    'subline inside linestring')."""
    sa = segments_xyz(line_a, closed=False)
    sb = segments_xyz(line_b, closed=False)
    return any(
        arcs_intersect(a, b, c, d) for a, b in sa for c, d in sb
    )
