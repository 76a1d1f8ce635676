"""Constrained polygon triangulation (PostGIS ``ST_TriangulatePolygon``,
shapely 2.1 ``constrained_delaunay_triangles``).

Partition a polygon (with holes) into triangles whose union is exactly
the polygon. Two classical stages:

1. **Ear clipping** over a single ring: holes are spliced into the
   shell via Eberly bridges (rightmost hole vertex -> horizontal ray ->
   closest visible shell vertex, holes processed by descending
   rightmost-x so later bridges may land on earlier hole chains). The
   combined ring is clipped ear-by-ear with reflex point-in-triangle
   checks — O(n^2), the standard earcut bound.
2. **Lawson flips** turn the ear-clip triangulation into the
   CONSTRAINED DELAUNAY one: every internal edge (never a boundary
   edge) whose adjacent triangle pair forms a strictly convex quad and
   fails the (exact, `geom/delaunay.incircle`) empty-circumcircle test
   is flipped until none remain — Lawson's algorithm converges to the
   CDT for polygon interiors.

The reference has no triangulation surface at all; GEOS grew this in
3.10/3.11. Degenerate inputs (collinear rings, <3 distinct vertices)
yield no triangles rather than raising, matching GEOS's empty output.
"""

from __future__ import annotations

import math

from geopolars_ray.geom.delaunay import incircle, orient2d
from geopolars_ray.geom.overlay import _ring_signed_area


def _ring_area2(r) -> float:
    """Twice the signed ring area (overlay's shoelace is the single
    implementation — its summation order is load-bearing for the
    snap-rounded overlay, so keep one copy)."""
    return 2.0 * _ring_signed_area(r)


def _dedup_ring(r):
    out = []
    for p in r:
        t = (float(p[0]), float(p[1]))
        if not out or out[-1] != t:
            out.append(t)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return out


def _bridge_hole(outer, hole):
    """Splice ``hole`` (CW) into ``outer`` (CCW) with an Eberly bridge.
    Returns the combined ring."""
    # rightmost hole vertex
    mi = max(range(len(hole)), key=lambda i: hole[i])
    mx, my = hole[mi]
    # closest intersection of the +x ray with outer edges
    best_t = math.inf
    best_edge = -1
    n = len(outer)
    for i in range(n):
        x1, y1 = outer[i]
        x2, y2 = outer[(i + 1) % n]
        if (y1 > my) == (y2 > my):
            continue
        xint = x1 + (my - y1) * (x2 - x1) / (y2 - y1)
        if xint >= mx and xint < best_t:
            best_t = xint
            best_edge = i
    if best_edge < 0:
        raise ValueError("triangulate: hole outside the shell")
    x1, y1 = outer[best_edge]
    x2, y2 = outer[(best_edge + 1) % n]
    # candidate visible vertex: the edge endpoint to the RIGHT of M on
    # the hit edge; then reflex outer vertices inside triangle
    # (M, I, P) may occlude — pick the one minimizing the angle to +x
    pi = best_edge if x1 > x2 else (best_edge + 1) % n
    px, py = outer[pi]
    ix, iy = best_t, my
    cand = pi
    best_metric = None
    for j in range(n):
        jx, jy = outer[j]
        if (jx, jy) == (px, py):
            continue
        # inside triangle (M, I, P)?
        o1 = orient2d(mx, my, ix, iy, jx, jy)
        o2 = orient2d(ix, iy, px, py, jx, jy)
        o3 = orient2d(px, py, mx, my, jx, jy)
        inside = (o1 >= 0 and o2 >= 0 and o3 >= 0) or \
                 (o1 <= 0 and o2 <= 0 and o3 <= 0)
        if not inside:
            continue
        # only reflex vertices can occlude
        prv = outer[(j - 1) % n]
        nxt = outer[(j + 1) % n]
        if orient2d(prv[0], prv[1], jx, jy, nxt[0], nxt[1]) >= 0:
            continue
        dx, dy = jx - mx, jy - my
        if dx <= 0:
            continue
        metric = abs(dy) / dx  # tan of the angle to the +x ray
        if best_metric is None or metric < best_metric or \
           (metric == best_metric and jx < outer[cand][0]):
            best_metric = metric
            cand = j
    p = cand
    # splice: outer[..p], hole[mi..], hole[..mi], back to outer[p..]
    return outer[:p + 1] + hole[mi:] + hole[:mi + 1] + outer[p:]


def _earclip(ring):
    """Triangulate a simple (possibly bridge-degenerate) CCW ring by
    ear clipping. Returns coordinate triangles (CCW)."""
    v = list(ring)
    tris = []
    guard = 0
    max_guard = 2 * len(v) * len(v) + 64
    while len(v) > 3 and guard < max_guard:
        guard += 1
        n = len(v)
        clipped = False
        for i in range(n):
            a, b, c = v[(i - 1) % n], v[i], v[(i + 1) % n]
            if orient2d(a[0], a[1], b[0], b[1], c[0], c[1]) <= 0:
                continue  # reflex or collinear corner — not an ear
            ok = True
            for j in range(n):
                p = v[j]
                if p in (a, b, c):
                    continue
                o1 = orient2d(a[0], a[1], b[0], b[1], p[0], p[1])
                o2 = orient2d(b[0], b[1], c[0], c[1], p[0], p[1])
                o3 = orient2d(c[0], c[1], a[0], a[1], p[0], p[1])
                if o1 >= 0 and o2 >= 0 and o3 >= 0:
                    ok = False
                    break
            if ok:
                tris.append((a, b, c))
                del v[i]
                clipped = True
                break
        if not clipped:
            # numerically stuck (degenerate remainder): drop the most
            # collinear corner and continue
            worst = min(range(len(v)), key=lambda i: abs(orient2d(
                v[(i - 1) % len(v)][0], v[(i - 1) % len(v)][1],
                v[i][0], v[i][1],
                v[(i + 1) % len(v)][0], v[(i + 1) % len(v)][1])))
            del v[worst]
    if len(v) == 3:
        a, b, c = v
        if orient2d(a[0], a[1], b[0], b[1], c[0], c[1]) > 0:
            tris.append((a, b, c))
    return tris


def _lawson_flips(tris, constraints):
    """Flip non-constraint internal edges to Delaunay (exact incircle).
    ``constraints``: set of undirected coordinate edges never flipped."""
    tris = [list(t) for t in tris]
    max_rounds = 4 * len(tris) * len(tris) + 64
    rounds = 0
    changed = True
    while changed and rounds < max_rounds:
        changed = False
        edge_map: dict = {}
        for ti, t in enumerate(tris):
            for k in range(3):
                a, b = t[k], t[(k + 1) % 3]
                key = (a, b) if a < b else (b, a)
                edge_map.setdefault(key, []).append((ti, k))
        for key, owners in edge_map.items():
            if len(owners) != 2 or key in constraints:
                continue
            (t1, k1), (t2, k2) = owners
            a, b = key
            c = tris[t1][(k1 + 2) % 3]
            d = tris[t2][(k2 + 2) % 3]
            # quad a-c-b-d must be strictly convex around edge ab
            if orient2d(c[0], c[1], d[0], d[1], a[0], a[1]) * \
               orient2d(c[0], c[1], d[0], d[1], b[0], b[1]) >= 0:
                continue
            # CCW triangle containing c: test d against (its) circumcircle
            p, q, r = tris[t1]
            if orient2d(p[0], p[1], q[0], q[1], r[0], r[1]) < 0:
                p, q, r = p, r, q
            if incircle(p[0], p[1], q[0], q[1], r[0], r[1], d[0], d[1]) <= 0:
                continue
            # flip ab -> cd
            def ccw(x, y, z):
                if orient2d(x[0], x[1], y[0], y[1], z[0], z[1]) < 0:
                    return [x, z, y]
                return [x, y, z]
            tris[t1] = ccw(c, a, d)
            tris[t2] = ccw(d, b, c)
            changed = True
            rounds += 1
            break  # edge_map is stale; rebuild
    return [tuple(t) for t in tris]


def triangulate_polygon_rings(rings, delaunay: bool = True, vertex_budget=None):
    """Triangulate one polygon given as [shell, *holes] (open or closed
    rings, any orientation). Returns coordinate triangles (CCW).

    Per-geometry algorithmic kernel (ear clipping is O(n^2)): guarded
    by the documented vertex budget (:mod:`geopolars_ray.geom.budget`)."""
    from geopolars_ray.geom.budget import check_vertex_budget

    check_vertex_budget(sum(len(r) for r in rings),
                        "triangulate_polygon_rings", vertex_budget)
    shell = _dedup_ring(rings[0])
    if len(shell) < 3:
        return []
    if _ring_area2(shell) < 0:
        shell = shell[::-1]
    if _ring_area2(shell) == 0:
        return []
    holes = []
    for h in rings[1:]:
        h = _dedup_ring(h)
        if len(h) < 3 or _ring_area2(h) == 0:
            continue
        if _ring_area2(h) > 0:
            h = h[::-1]  # holes CW
        holes.append(h)
    constraints = set()
    for r in [shell] + holes:
        n = len(r)
        for i in range(n):
            a, b = r[i], r[(i + 1) % n]
            constraints.add((a, b) if a < b else (b, a))
    ring = shell
    for h in sorted(holes, key=lambda h: -max(p[0] for p in h)):
        ring = _bridge_hole(ring, h)
    tris = _earclip(ring)
    if delaunay and len(tris) > 1:
        tris = _lawson_flips(tris, constraints)
    return tris


def generate_points_arrays(ga, n: int, seed: int = 0):
    """ST_GeneratePoints: ``n`` uniform random points inside each areal
    row, as a MULTIPOINT. Exactly area-uniform — the polygon is
    triangulated (ear clip; Delaunay quality is irrelevant for
    sampling), a triangle is drawn by area weight, and the point is
    uniform in the triangle via the folded-parallelogram map. The
    per-row stream is seeded from (seed, coordinate-bit hash), so
    results are deterministic AND independent of row order, batch
    boundaries, and parallelism. Non-areal rows come back missing."""
    import numpy as np

    from geopolars_ray.geom.array import GeometryArray
    from geopolars_ray.geom.delaunay import coords_of_geom

    out: list = []
    for g in ga.to_pylist():
        if g is None or g[0] not in ("polygon", "multipolygon"):
            out.append(None)
            continue
        polys = [g[1]] if g[0] == "polygon" else g[1]
        tris = []
        for rings in polys:
            tris.extend(triangulate_polygon_rings(rings, delaunay=False))
        if not tris:
            out.append(None)
            continue
        T = np.asarray(tris, dtype=np.float64)  # (t, 3, 2)
        areas = 0.5 * np.abs(
            (T[:, 1, 0] - T[:, 0, 0]) * (T[:, 2, 1] - T[:, 0, 1])
            - (T[:, 1, 1] - T[:, 0, 1]) * (T[:, 2, 0] - T[:, 0, 0]))
        cdf = np.cumsum(areas)
        coords = np.asarray(coords_of_geom(g), dtype=np.float64)
        h = np.bitwise_xor.reduce(coords.view(np.uint64).reshape(-1))
        rng = np.random.default_rng([int(seed) & 0xFFFFFFFF,
                                     int(h & np.uint64(0xFFFFFFFF)),
                                     int(h >> np.uint64(32))])
        ti = np.searchsorted(cdf, rng.random(n) * cdf[-1], side="right")
        ti = np.minimum(ti, len(tris) - 1)
        uv = rng.random((n, 2))
        fold = uv.sum(axis=1) > 1.0
        uv[fold] = 1.0 - uv[fold]
        a, b, c = T[ti, 0], T[ti, 1], T[ti, 2]
        pts = a + uv[:, :1] * (b - a) + uv[:, 1:] * (c - a)
        out.append(("multipoint", [tuple(p) for p in pts]))
    return GeometryArray.from_pylist(out)


def triangulate_arrays(ga, delaunay: bool = True):
    """Per-row ``triangulate_polygon`` kernel: POLYGON/MULTIPOLYGON rows
    become a MULTIPOLYGON of triangles partitioning them; other rows
    come back missing."""
    from geopolars_ray.geom.array import GeometryArray

    out: list = []
    for g in ga.to_pylist():
        if g is None or g[0] not in ("polygon", "multipolygon"):
            out.append(None)
            continue
        polys = [g[1]] if g[0] == "polygon" else g[1]
        tris = []
        for rings in polys:
            tris.extend(triangulate_polygon_rings(rings, delaunay=delaunay))
        if not tris:
            out.append(None)
            continue
        out.append(("multipolygon",
                    [[[a, b, c, a]] for a, b, c in tris]))
    return GeometryArray.from_pylist(out)
