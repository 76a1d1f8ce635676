"""Constrained polygon triangulation (geom/triangulate.py): exact
partition properties (area conservation, Euler triangle counts, all-CCW,
centroids inside), hole bridging, the constrained-Delaunay property of
the flipped result, randomized star polygons, and the kernel/API path.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom.delaunay import incircle, orient2d
from geopolars_ray.geom.triangulate import (
    triangulate_arrays,
    triangulate_polygon_rings,
)


def tri_area(t):
    (ax, ay), (bx, by), (cx, cy) = t
    return 0.5 * ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def _point_in_rings(px, py, rings):
    inside = False
    for r in rings:
        n = len(r)
        for i in range(n):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
    return inside


def _check_partition(rings, tris, expect_area, expect_count=None):
    assert all(tri_area(t) > 0 for t in tris)  # CCW, nonzero
    assert abs(sum(tri_area(t) for t in tris) - expect_area) < 1e-9
    if expect_count is not None:
        assert len(tris) == expect_count
    for t in tris:
        cx = sum(p[0] for p in t) / 3
        cy = sum(p[1] for p in t) / 3
        assert _point_in_rings(cx, cy, rings)


def test_square_and_annulus():
    sq = [[(0, 0), (1, 0), (1, 1), (0, 1)]]
    _check_partition(sq, triangulate_polygon_rings(sq), 1.0, 2)
    ann = [[(0, 0), (4, 0), (4, 4), (0, 4)], [(1, 1), (3, 1), (3, 3), (1, 3)]]
    _check_partition(ann, triangulate_polygon_rings(ann), 12.0, 8)  # n+2h-2


def test_two_holes():
    rings = [[(0, 0), (10, 0), (10, 4), (0, 4)],
             [(1, 1), (3, 1), (3, 3), (1, 3)],
             [(5, 1), (7, 1), (7, 3), (5, 3)]]
    _check_partition(rings, triangulate_polygon_rings(rings), 32.0, 14)


def test_concave_star():
    pts = []
    for k in range(12):
        r = 5 if k % 2 == 0 else 1.5
        a = 2 * math.pi * k / 12
        pts.append((r * math.cos(a), r * math.sin(a)))
    s = sum(pts[i][0] * pts[(i + 1) % 12][1] - pts[(i + 1) % 12][0] * pts[i][1]
            for i in range(12)) / 2
    _check_partition([pts], triangulate_polygon_rings([pts]), s, 10)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_star_polygons(seed):
    rng = np.random.default_rng(seed)
    k = 24
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    r = rng.uniform(1, 6, k)
    pts = [(float(ri * np.cos(a)), float(ri * np.sin(a)))
           for ri, a in zip(r, ang)]
    s = sum(pts[i][0] * pts[(i + 1) % k][1] - pts[(i + 1) % k][0] * pts[i][1]
            for i in range(k)) / 2
    tris = triangulate_polygon_rings([pts])
    _check_partition([pts], tris, s, k - 2)


def test_constrained_delaunay_property():
    """After Lawson flips, no flippable internal edge strictly violates
    the empty-circumcircle test."""
    rng = np.random.default_rng(9)
    k = 16
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    pts = [(float(4 * np.cos(a)), float(4 * np.sin(a) + rng.uniform(0, 0.5)))
           for a in ang]
    constraints = {tuple(sorted((pts[i], pts[(i + 1) % k])))
                   for i in range(k)}
    tris = triangulate_polygon_rings([pts])
    edge_map: dict = {}
    for ti, t in enumerate(tris):
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = tuple(sorted(e))
            edge_map.setdefault(key, []).append(ti)
    for key, owners in edge_map.items():
        if len(owners) != 2 or key in constraints:
            continue
        t1, t2 = tris[owners[0]], tris[owners[1]]
        d = next(p for p in t2 if p not in key)
        a, b = key
        c = next(p for p in t1 if p not in key)
        # skip non-convex quads (unflippable)
        if orient2d(c[0], c[1], d[0], d[1], a[0], a[1]) * \
           orient2d(c[0], c[1], d[0], d[1], b[0], b[1]) >= 0:
            continue
        p, q, r = t1
        assert incircle(p[0], p[1], q[0], q[1], r[0], r[1], d[0], d[1]) <= 0


def test_degenerate_and_type_dispatch():
    assert triangulate_polygon_rings([[(0, 0), (1, 1), (2, 2)]]) == []
    from geopolars_ray.geom import GeometryArray

    ga = GeometryArray.from_pylist([
        ("polygon", [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]]),
        ("multipolygon", [[[(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]],
                          [[(5.0, 5.0), (6.0, 5.0), (5.0, 6.0)]]]),
        ("linestring", [(0.0, 0.0), (1.0, 1.0)]),
        None,
    ])
    out = triangulate_arrays(ga).to_pylist()
    assert out[0][0] == "multipolygon" and len(out[0][1]) == 2
    assert len(out[1][1]) == 2  # one triangle per multipolygon part
    assert out[2] is None and out[3] is None


def test_triangulate_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

    ann = ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                       [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)]])
    t = pa.table({"geometry": encode_wkb(GeometryArray.from_pylist([ann]))})
    out = pa.concat_tables(ray.get(
        GeoDataset(ray.data.from_arrow(t))
        .triangulate_polygon().area("a").dataset.to_arrow_refs()))
    assert abs(out["a"].to_pylist()[0] - 12.0) < 1e-9
    g = decode_wkb(out["geometry"]).to_pylist()[0]
    assert g[0] == "multipolygon" and len(g[1]) == 8


# ----------------------------------------------------------- generate_points
def test_generate_points_uniform_inside_and_deterministic():
    from geopolars_ray.geom import GeometryArray
    from geopolars_ray.geom.triangulate import generate_points_arrays

    ann = ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                       [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)]])
    ga = GeometryArray.from_pylist([ann, None, ("linestring", [(0.0, 0.0), (1.0, 1.0)])])
    out = generate_points_arrays(ga, 4000, seed=7).to_pylist()
    assert out[1] is None and out[2] is None
    t, pts = out[0]
    assert t == "multipoint" and len(pts) == 4000
    # all inside the shell, none in the hole
    for x, y in pts:
        assert 0 <= x <= 4 and 0 <= y <= 4
        assert not (1 < x < 3 and 1 < y < 3)
    # area-uniform: corner quadrant [0,1]x[0,1] holds ~ 1/12 of the area
    frac = sum(1 for x, y in pts if x < 1 and y < 1) / 4000
    assert abs(frac - 1.0 / 12.0) < 0.02
    # deterministic
    again = generate_points_arrays(ga, 4000, seed=7).to_pylist()[0]
    assert again == out[0]
    # different seed differs
    assert generate_points_arrays(ga, 4000, seed=8).to_pylist()[0] != out[0]


def test_generate_points_layout_independent(ray_session):
    """Same geometry sampled identically regardless of row position,
    batch boundaries, and parallelism."""
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

    sq = ("polygon", [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]])
    tri = ("polygon", [[(5.0, 5.0), (8.0, 5.0), (5.0, 9.0), (5.0, 5.0)]])
    t1 = pa.table({"rid": pa.array([0, 1]),
                   "geometry": encode_wkb(GeometryArray.from_pylist([sq, tri]))})
    t2 = pa.table({"rid": pa.array([1, 0]),
                   "geometry": encode_wkb(GeometryArray.from_pylist([tri, sq]))})
    outs = []
    for t, parts in ((t1, 1), (t2, 2)):
        ds = GeoDataset(ray.data.from_arrow(t).repartition(parts))
        tbl = pa.concat_tables(ray.get(
            ds.generate_points(50, seed=3).dataset.to_arrow_refs()))
        outs.append(dict(zip(tbl["rid"].to_pylist(),
                             decode_wkb(tbl["geometry"]).to_pylist())))
    assert outs[0] == outs[1]
