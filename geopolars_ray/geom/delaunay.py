"""Delaunay triangulation, Voronoi polygons, concave hull.

GEOS/shapely parity surface: ``delaunay_triangles`` (per-geometry
triangulation of the vertex set), ``voronoi_polygons`` (cells clipped to
an envelope), ``concave_hull`` (edge-length-ratio border erosion of the
triangulation, GEOS 3.11 ``ConcaveHull``). The reference has none of
these (its `geo`-crate surface stops at predicates,
`geopolars/geopolars-geo/src/ops`) — this extends the overlay-engine
family the same way polygonize does.

Algorithms (textbook, no external geometry libs):

- **Triangulation** is incremental Bowyer–Watson: points inserted in
  lexicographic order, containing triangle found by orientation walk
  from the last-created triangle, cavity = BFS over circumcircle
  violations, re-triangulated as a fan. Predicates (``orient2d``,
  ``incircle``) run in float64 with a Shewchuk-style error filter and
  fall back to EXACT rational arithmetic (``fractions.Fraction`` —
  floats are exact rationals) on near-ties, so co-circular grids and
  collinear runs never corrupt the cavity.
- **Voronoi** cells are built per site as the intersection of bisector
  half-planes against the site's Delaunay NEIGHBORS only (a classical
  exact identity), clipped to the envelope by Sutherland–Hodgman — no
  circumcenter ordering, no unbounded-ray bookkeeping. Collinear
  inputs (no triangles) fall back to sorted-chain neighbors.
- **Concave hull** erodes border triangles in longest-border-edge
  order while the edge exceeds ``min + ratio * (max - min)`` of the
  triangulation's edge lengths (ratio=0 tightest, 1 = convex hull),
  refusing any removal that would pinch the boundary (the exposed
  interior vertex must not already lie on it); the surviving
  triangles' boundary is traced into one ring.
"""

from __future__ import annotations

import math
from collections import defaultdict
from fractions import Fraction

_ORI_EPS = 3.331e-16
_INC_EPS = 1.1e-15


def orient2d(ax, ay, bx, by, cx, cy) -> int:
    """Sign of the (a,b,c) cross product: +1 CCW, -1 CW, 0 collinear.
    Float filter + exact rational fallback."""
    l = (bx - ax) * (cy - ay)
    r = (by - ay) * (cx - ax)
    det = l - r
    bound = _ORI_EPS * (abs(l) + abs(r))
    if det > bound:
        return 1
    if det < -bound:
        return -1
    det = (Fraction(bx) - Fraction(ax)) * (Fraction(cy) - Fraction(ay)) \
        - (Fraction(by) - Fraction(ay)) * (Fraction(cx) - Fraction(ax))
    return (det > 0) - (det < 0)


def incircle(ax, ay, bx, by, cx, cy, dx, dy) -> int:
    """+1 iff d is strictly inside the circumcircle of CCW (a,b,c).
    Float filter + exact rational fallback."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (ad * (bdx * cdy - bdy * cdx)
           + bd * (cdx * ady - cdy * adx)
           + cd * (adx * bdy - ady * bdx))
    perm = (ad * (abs(bdx * cdy) + abs(bdy * cdx))
            + bd * (abs(cdx * ady) + abs(cdy * adx))
            + cd * (abs(adx * bdy) + abs(ady * bdx)))
    bound = _INC_EPS * perm
    if det > bound:
        return 1
    if det < -bound:
        return -1
    fax, fay = Fraction(ax) - Fraction(dx), Fraction(ay) - Fraction(dy)
    fbx, fby = Fraction(bx) - Fraction(dx), Fraction(by) - Fraction(dy)
    fcx, fcy = Fraction(cx) - Fraction(dx), Fraction(cy) - Fraction(dy)
    fad = fax * fax + fay * fay
    fbd = fbx * fbx + fby * fby
    fcd = fcx * fcx + fcy * fcy
    det = (fad * (fbx * fcy - fby * fcx)
           + fbd * (fcx * fay - fcy * fax)
           + fcd * (fax * fby - fay * fbx))
    return (det > 0) - (det < 0)


def delaunay_points(pts, vertex_budget=None):
    """Delaunay triangulation of unique points.

    Returns (unique_sorted_points, triangles) with triangles as CCW
    index triples into the point list, deterministically ordered.
    Fewer than 3 unique points, or all-collinear input, yields no
    triangles.

    Per-geometry algorithmic kernel: guarded by the documented vertex
    budget (:mod:`geopolars_ray.geom.budget`); everything in the
    Delaunay family (voronoi, concave hull, triangles) funnels through
    here, so the guard covers them all.
    """
    from geopolars_ray.geom.budget import check_vertex_budget

    up = sorted(set((float(p[0]), float(p[1])) for p in pts))
    check_vertex_budget(len(up), "delaunay_points", vertex_budget)
    n = len(up)
    if n < 3:
        return up, []
    xs = [p[0] for p in up]
    ys = [p[1] for p in up]
    cx = (min(xs) + max(xs)) / 2.0
    cy = (min(ys) + max(ys)) / 2.0
    size = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
    # Finite super-triangle, pushed FAR out: the result is the exact
    # Delaunay of points + super vertices, whose restriction to the
    # input differs from true Delaunay only for circumradii >= the
    # super distance — i.e. hull slivers flat to ~1e-9 relative, which
    # is where GEOS's float predicates give up too. Exact rational
    # fallback keeps the huge coordinates safe.
    far = 1.0e9 * size
    sp = [(cx - 1.6 * far, cy - 0.9 * far),
          (cx + 1.6 * far, cy - 0.9 * far),
          (cx, cy + 1.8 * far)]
    P = up + sp
    S0, S1, S2 = n, n + 1, n + 2

    tris: dict = {}           # tid -> (i, j, k) CCW
    adj: dict = {}            # directed edge (a, b) -> tid having it CCW
    next_tid = [0]

    def add_tri(i, j, k):
        tid = next_tid[0]
        next_tid[0] += 1
        tris[tid] = (i, j, k)
        adj[(i, j)] = tid
        adj[(j, k)] = tid
        adj[(k, i)] = tid
        return tid

    def drop_tri(tid):
        i, j, k = tris.pop(tid)
        for e in ((i, j), (j, k), (k, i)):
            if adj.get(e) == tid:
                del adj[e]

    add_tri(S0, S1, S2)
    last = 0

    def locate(px, py, start):
        tid = start if start in tris else next(iter(tris))
        for _ in range(4 * (len(tris) + 4)):
            i, j, k = tris[tid]
            moved = False
            for a, b in ((i, j), (j, k), (k, i)):
                if orient2d(P[a][0], P[a][1], P[b][0], P[b][1], px, py) < 0:
                    nxt = adj.get((b, a))
                    if nxt is None:
                        break
                    tid = nxt
                    moved = True
                    break
            if not moved:
                return tid
        # fallback: linear scan (walk trapped by a degeneracy)
        for tid, (i, j, k) in tris.items():
            if all(orient2d(P[a][0], P[a][1], P[b][0], P[b][1], px, py) >= 0
                   for a, b in ((i, j), (j, k), (k, i))):
                return tid
        raise RuntimeError("delaunay: point location failed")

    for pi in range(n):
        px, py = P[pi]
        t0 = locate(px, py, last)
        # cavity: BFS over circumcircle violations
        cavity = {t0}
        stack = [t0]
        while stack:
            t = stack.pop()
            i, j, k = tris[t]
            for a, b in ((i, j), (j, k), (k, i)):
                nb = adj.get((b, a))
                if nb is None or nb in cavity:
                    continue
                ni, nj, nk = tris[nb]
                if incircle(P[ni][0], P[ni][1], P[nj][0], P[nj][1],
                            P[nk][0], P[nk][1], px, py) > 0:
                    cavity.add(nb)
                    stack.append(nb)
        # boundary = directed edges whose opposite triangle is outside
        boundary = []
        for t in cavity:
            i, j, k = tris[t]
            for a, b in ((i, j), (j, k), (k, i)):
                if adj.get((b, a)) not in cavity:
                    boundary.append((a, b))
        for t in list(cavity):
            drop_tri(t)
        for a, b in boundary:
            last = add_tri(pi, a, b)

    out = []
    for i, j, k in tris.values():
        if i < n and j < n and k < n:
            m = min(i, j, k)
            while i != m:  # rotate so the smallest index leads
                i, j, k = j, k, i
            out.append((i, j, k))
    out.sort()
    return up, out


def _triangle_edges(tri):
    i, j, k = tri
    return ((i, j), (j, k), (k, i))


def delaunay_neighbors(n: int, tris, points=None):
    """Undirected neighbor sets per point index. When the input was
    collinear (no triangles), fall back to the sorted-chain neighbors —
    the correct Voronoi adjacency for points on a line."""
    nbr = [set() for _ in range(n)]
    if tris:
        for t in tris:
            for a, b in _triangle_edges(t):
                nbr[a].add(b)
                nbr[b].add(a)
    elif n > 1:
        for i in range(n - 1):  # points arrive lexicographically sorted
            nbr[i].add(i + 1)
            nbr[i + 1].add(i)
    return nbr


def _clip_halfplane(poly, nx, ny, c):
    """Sutherland–Hodgman: keep the side where nx*x + ny*y <= c."""
    if not poly:
        return poly
    out = []
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        d1 = nx * x1 + ny * y1 - c
        d2 = nx * x2 + ny * y2 - c
        if d1 <= 0:
            out.append((x1, y1))
        if (d1 < 0 < d2) or (d2 < 0 < d1):
            t = d1 / (d1 - d2)
            out.append((x1 + t * (x2 - x1), y1 + t * (y2 - y1)))
    return out


def voronoi_cells(pts, envelope=None):
    """Voronoi cell polygon per unique point, clipped to ``envelope``
    (x0, y0, x1, y1). Default envelope: input bbox expanded by half its
    larger side on every edge (GEOS expands the clip envelope around
    the diagram the same spirit). Returns (points, cells) with each
    cell an open CCW coordinate ring (or [] when the envelope clips a
    cell away entirely)."""
    up, tris = delaunay_points(pts)
    n = len(up)
    if n == 0:
        return up, []
    if envelope is None:
        xs = [p[0] for p in up]
        ys = [p[1] for p in up]
        pad = max(max(xs) - min(xs), max(ys) - min(ys), 1.0) * 0.5
        envelope = (min(xs) - pad, min(ys) - pad,
                    max(xs) + pad, max(ys) + pad)
    x0, y0, x1, y1 = envelope
    box = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    nbr = delaunay_neighbors(n, tris)
    cells = []
    for i in range(n):
        sx, sy = up[i]
        cell = box
        for j in sorted(nbr[i]):
            tx, ty = up[j]
            # closer-to-s half-plane: (p - mid) . (t - s) <= 0
            nx, ny = tx - sx, ty - sy
            c = (nx * (sx + tx) + ny * (sy + ty)) / 2.0
            cell = _clip_halfplane(cell, nx, ny, c)
            if not cell:
                break
        cells.append(cell)
    return up, cells


def concave_hull_points(pts, ratio: float = 0.0):
    """Concave hull of a point set (GEOS ``ConcaveHullOfPoints``
    flavor): erode border triangles whose border edge exceeds
    ``min + ratio * (max - min)`` of the Delaunay edge lengths, longest
    first, never pinching the boundary. Returns an open CCW shell ring,
    or None for degenerate input (<3 unique / collinear)."""
    up, tris = delaunay_points(pts)
    if not tris:
        return None

    def elen(a, b):
        return math.hypot(up[a][0] - up[b][0], up[a][1] - up[b][1])

    lens = sorted({elen(a, b) for t in tris for a, b in _triangle_edges(t)})
    target = lens[0] + max(0.0, min(1.0, ratio)) * (lens[-1] - lens[0])

    alive = set(range(len(tris)))
    owner: dict = {}
    for ti, t in enumerate(tris):
        for a, b in _triangle_edges(t):
            owner[(a, b)] = ti

    def border_edges():
        for ti in alive:
            for a, b in _triangle_edges(tris[ti]):
                if owner.get((b, a)) not in alive:
                    yield ti, a, b

    import heapq
    heap = []
    for ti, a, b in border_edges():
        heapq.heappush(heap, (-elen(a, b), ti, a, b))
    while heap:
        negl, ti, a, b = heapq.heappop(heap)
        if -negl <= target or ti not in alive:
            if -negl <= target:
                break
            continue
        if owner.get((b, a)) in alive:
            continue  # stale: edge no longer on the border
        if len(alive) == 1:
            continue
        n_border = sum(1 for x, y in _triangle_edges(tris[ti])
                       if owner.get((y, x)) not in alive)
        if n_border == 3:
            continue  # isolated triangle: nothing left to erode into
        if n_border == 1:
            # exposing the apex: it must not already lie on the boundary,
            # else the hull pinches into two loops. An "ear" (2 border
            # edges) only SHORTENS the boundary — always safe.
            i, j, k = tris[ti]
            apex = i + j + k - a - b
            boundary_pts = {p for _tj, x, y in border_edges() for p in (x, y)}
            if apex in boundary_pts:
                continue
        alive.discard(ti)
        for x, y in _triangle_edges(tris[ti]):
            tn = owner.get((y, x))
            if tn in alive:
                heapq.heappush(heap, (-elen(x, y), tn, y, x))
    # trace the remaining boundary into one ring
    nxt: dict = {}
    for ti, a, b in border_edges():
        nxt[a] = b
    if not nxt:
        return None
    start = min(nxt)
    ring = [start]
    cur = nxt[start]
    while cur != start and len(ring) <= len(nxt):
        ring.append(cur)
        cur = nxt[cur]
    return [up[i] for i in ring]


# --------------------------------------------------------------------------
# GeometryArray kernels (registry wrappers)
# --------------------------------------------------------------------------

def coords_of_geom(g) -> list:
    """Every vertex coordinate of a geometry tuple, flattened."""
    t, data = g
    if t == "point":
        return [data]
    if t in ("linestring", "linearring", "multipoint"):
        return list(data)
    if t in ("multilinestring", "polygon"):
        return [p for part in data for p in part]
    if t == "multipolygon":
        return [p for poly in data for ring in poly for p in ring]
    raise TypeError(f"unknown geometry type {t!r}")


def delaunay_triangles_arrays(ga, only_edges: bool = False):
    """shapely ``delaunay_triangles``: triangulate each geometry's
    vertex set. MULTIPOLYGON of CCW triangles (closed rings), or with
    ``only_edges`` a MULTILINESTRING of the unique edges. Degenerate
    rows (<3 unique / collinear vertices) come back missing."""
    from geopolars_ray.geom.array import GeometryArray

    out: list = []
    for g in ga.to_pylist():
        if g is None:
            out.append(None)
            continue
        up, tris = delaunay_points(coords_of_geom(g))
        if not tris:
            out.append(None)
            continue
        if only_edges:
            edges = sorted({(a, b) if a < b else (b, a)
                            for t in tris for a, b in _triangle_edges(t)})
            out.append(("multilinestring", [[up[a], up[b]] for a, b in edges]))
        else:
            out.append(("multipolygon",
                        [[[up[i], up[j], up[k], up[i]]] for i, j, k in tris]))
    return GeometryArray.from_pylist(out)


def voronoi_polygons_arrays(ga, extend_to=None):
    """shapely ``voronoi_polygons``: one Voronoi cell per vertex of each
    geometry, as a MULTIPOLYGON ordered by site (lexicographic).
    ``extend_to``: (x0, y0, x1, y1) clip envelope; default = the
    geometry's bbox padded by half its larger side."""
    from geopolars_ray.geom.array import GeometryArray

    out: list = []
    for g in ga.to_pylist():
        if g is None:
            out.append(None)
            continue
        _up, cells = voronoi_cells(coords_of_geom(g), envelope=extend_to)
        polys = [[c + [c[0]]] for c in cells if len(c) >= 3]
        out.append(("multipolygon", polys) if polys else None)
    return GeometryArray.from_pylist(out)


def concave_hull_arrays(ga, ratio: float = 0.0):
    """GEOS ``concave_hull`` per geometry (POLYGON, no holes); rows
    whose vertices are degenerate fall back to the convex-hull
    behavior of missing (matching ``delaunay_triangles``)."""
    from geopolars_ray.geom.array import GeometryArray

    out: list = []
    for g in ga.to_pylist():
        if g is None:
            out.append(None)
            continue
        ring = concave_hull_points(coords_of_geom(g), ratio=ratio)
        out.append(("polygon", [ring + [ring[0]]]) if ring else None)
    return GeometryArray.from_pylist(out)
