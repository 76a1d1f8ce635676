"""Triangulation family (geom/delaunay.py): Delaunay structural
invariants (Euler count, empty circumcircle via the module's own exact
predicate, union = convex hull), adversarial co-circular grids, Voronoi
partition-of-envelope and nearest-site properties, concave hull
ratio endpoints, and the kernel/API path through Ray.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom.delaunay import (
    concave_hull_points,
    delaunay_points,
    delaunay_triangles_arrays,
    incircle,
    voronoi_cells,
)
from geopolars_ray.geom import GeometryArray


def _hull_ring(P):
    P = sorted(P)

    def half(Q):
        h = []
        for p in Q:
            while len(h) >= 2 and ((h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                                   - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h
    lo, hi = half(P), half(P[::-1])
    return lo[:-1] + hi[:-1]


def _ring_area(r):
    s = 0.0
    for i in range(len(r)):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % len(r)]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _tri_area(a, b, c):
    return 0.5 * abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_delaunay_invariants_random(seed):
    rng = np.random.default_rng(seed)
    pts = [(float(x), float(y)) for x, y in rng.uniform(0, 100, (70, 2))]
    up, tris = delaunay_points(pts)
    n, h = len(up), len(_hull_ring(up))
    assert len(tris) == 2 * n - 2 - h  # Euler: triangles of a point set
    # empty circumcircle, checked with the module's exact predicate
    for (i, j, k) in tris:
        a, b, c = up[i], up[j], up[k]
        for m, p in enumerate(up):
            if m not in (i, j, k):
                assert incircle(a[0], a[1], b[0], b[1],
                                c[0], c[1], p[0], p[1]) <= 0
    # triangles tile the convex hull
    ta = sum(_tri_area(up[i], up[j], up[k]) for i, j, k in tris)
    assert abs(ta - abs(_ring_area(_hull_ring(up)))) < 1e-7


def test_delaunay_cocircular_grid_exact():
    """Integer grid: every 2x2 cell is exactly co-circular — the exact
    predicate tie-break must still produce a complete triangulation."""
    grid = [(float(x), float(y)) for x in range(7) for y in range(7)]
    up, tris = delaunay_points(grid)
    assert len(tris) == 2 * 49 - 2 - 24
    ta = sum(_tri_area(up[i], up[j], up[k]) for i, j, k in tris)
    assert abs(ta - 36.0) < 1e-12


def test_delaunay_degenerate_inputs():
    assert delaunay_points([(0, 0), (1, 1)])[1] == []
    assert delaunay_points([(0, 0), (1, 1), (2, 2), (5, 5)])[1] == []  # collinear
    # dedup + CCW with the smallest index leading: sorted points are
    # (0,0), (0,1), (1,0) and the CCW order is 0 -> 2 -> 1
    assert delaunay_points([(0, 0), (0, 0), (1, 0), (0, 1)])[1] == [(0, 2, 1)]


def test_voronoi_partitions_envelope_and_nearest_site():
    rng = np.random.default_rng(3)
    pts = [(float(x), float(y)) for x, y in rng.uniform(10, 90, (40, 2))]
    up, cells = voronoi_cells(pts, envelope=(0, 0, 100, 100))
    assert len(cells) == len(up) and all(len(c) >= 3 for c in cells)
    assert abs(sum(_ring_area(c) for c in cells) - 100 * 100) < 1e-6
    # every cell vertex is closest to its own site (ties allowed)
    for i, c in enumerate(cells):
        sx, sy = up[i]
        # probe at the cell centroid (strictly interior for convex cells)
        cx = sum(p[0] for p in c) / len(c)
        cy = sum(p[1] for p in c) / len(c)
        dself = math.hypot(cx - sx, cy - sy)
        for j, (tx, ty) in enumerate(up):
            if j != i:
                assert dself <= math.hypot(cx - tx, cy - ty) + 1e-9


def test_voronoi_collinear_sites():
    up, cells = voronoi_cells([(0.0, 0.0), (2.0, 0.0), (4.0, 0.0)],
                              envelope=(-1, -1, 5, 1))
    # three vertical slabs: cut at x=1 and x=3
    areas = sorted(_ring_area(c) for c in cells)
    assert [round(a, 9) for a in areas] == [4.0, 4.0, 4.0]


def test_concave_hull_ratio_one_is_convex_hull():
    rng = np.random.default_rng(5)
    pts = [(float(x), float(y)) for x, y in rng.uniform(0, 50, (50, 2))]
    ring = concave_hull_points(pts, ratio=1.0)
    up, _ = delaunay_points(pts)
    assert abs(_ring_area(ring) - abs(_ring_area(_hull_ring(up)))) < 1e-9


def test_concave_hull_tightens_around_c_shape():
    """A C-shaped point cloud: low ratio must cut into the concavity
    (area well under the convex hull), stay simple, and keep all points
    covered by... the hull boundary itself staying a single ring."""
    pts = []
    for t in np.linspace(0.25 * np.pi, 1.75 * np.pi, 60):
        for r in (8.0, 10.0):
            pts.append((float(r * np.cos(t)), float(r * np.sin(t))))
    tight = concave_hull_points(pts, ratio=0.05)
    loose = concave_hull_points(pts, ratio=1.0)
    assert len(set(tight)) == len(tight)  # simple: no repeated vertex
    assert _ring_area(tight) > 0  # CCW single ring
    assert _ring_area(tight) < 0.75 * _ring_area(loose)


def test_kernel_wrappers_and_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import decode_wkb, encode_wkb

    geoms = [("multipoint", [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (4.0, 4.0), (2.0, 2.0)]),
             None,
             ("linestring", [(0.0, 0.0), (1.0, 1.0)])]  # degenerate row
    t = pa.table({"geometry": encode_wkb(GeometryArray.from_pylist(geoms)),
                  "rid": pa.array([0, 1, 2])})
    gd = GeoDataset(ray.data.from_arrow(t))

    tri = pa.concat_tables(ray.get(gd.delaunay_triangles().dataset.to_arrow_refs()))
    got = decode_wkb(tri["geometry"]).to_pylist()
    by_rid = dict(zip(tri["rid"].to_pylist(), got))
    assert by_rid[1] is None and by_rid[2] is None
    t0, parts = by_rid[0]
    assert t0 == "multipolygon" and len(parts) == 4  # center point fans 4 tris
    area = sum(abs(_ring_area(p[0][:-1])) for p in parts)
    assert abs(area - 16.0) < 1e-12

    vor = pa.concat_tables(ray.get(
        gd.voronoi_polygons(extend_to=(0, 0, 4, 4)).dataset.to_arrow_refs()))
    v0 = dict(zip(vor["rid"].to_pylist(),
                  decode_wkb(vor["geometry"]).to_pylist()))[0]
    assert v0[0] == "multipolygon" and len(v0[1]) == 5
    assert abs(sum(_ring_area(p[0][:-1]) for p in v0[1]) - 16.0) < 1e-9

    ch = pa.concat_tables(ray.get(gd.concave_hull(ratio=1.0).dataset.to_arrow_refs()))
    c0 = dict(zip(ch["rid"].to_pylist(),
                  decode_wkb(ch["geometry"]).to_pylist()))[0]
    assert c0[0] == "polygon" and abs(_ring_area(c0[1][0][:-1]) - 16.0) < 1e-12

    edges = delaunay_triangles_arrays(
        GeometryArray.from_pylist(geoms[:1]), only_edges=True).to_pylist()[0]
    assert edges[0] == "multilinestring" and len(edges[1]) == 8
