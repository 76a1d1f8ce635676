"""General buffer (geom/buffer.py): exact analytic anchors (the k-gon
approximation makes strip/corner areas closed-form), a distance-based
membership oracle with the inscribed/circumscribed tolerance band
excluded, fast-path equivalence with the vectorized point kernel, and
the Ray stage path on mixed geometry types."""

import math

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom.array import GeometryArray
from geopolars_ray.geom.buffer import buffer_geom, buffer_geoms
from geopolars_ray.geom import kernels as K


def kgon_area(d, quad_segs=8):
    k = 4 * quad_segs
    return 0.5 * k * d * d * math.sin(2.0 * math.pi / k)


def geom_area(g):
    if g is None:
        return 0.0
    t, data = g
    polys = [data] if t == "polygon" else data
    tot = 0.0
    for poly in polys:
        for ring in poly:
            s = 0.0
            for i in range(len(ring) - 1):
                x1, y1 = ring[i]
                x2, y2 = ring[i + 1]
                s += x1 * y2 - x2 * y1
            tot += 0.5 * s
    return tot


def _edges_of_rings(rings):
    out = []
    for ring in rings:
        n = len(ring)
        closed = n > 1 and tuple(ring[0]) == tuple(ring[-1])
        m = n - 1 if closed else n
        for i in range(m):
            out.append((ring[i], ring[(i + 1) % n]))
    return out


def _geom_rings(g):
    t, data = g
    if t == "polygon":
        return list(data)
    if t == "multipolygon":
        return [r for poly in data for r in poly]
    if t == "linestring":
        return []
    raise AssertionError(t)


def point_in(px, py, g):
    if g is None:
        return False
    inside = False
    for (x1, y1), (x2, y2) in _edges_of_rings(_geom_rings(g)):
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def _seg_dist(px, py, p, q):
    dx, dy = q[0] - p[0], q[1] - p[1]
    L2 = dx * dx + dy * dy
    if L2 == 0.0:
        return math.hypot(px - p[0], py - p[1])
    t = max(0.0, min(1.0, ((px - p[0]) * dx + (py - p[1]) * dy) / L2))
    return math.hypot(px - p[0] - t * dx, py - p[1] - t * dy)


def dist_to_geom(px, py, g):
    """0 inside a polygonal g (even-odd), else distance to the boundary
    (for lines: distance to the path)."""
    t, data = g
    if t == "linestring":
        return min(_seg_dist(px, py, data[i], data[i + 1])
                   for i in range(len(data) - 1))
    if t in ("polygon", "multipolygon") and point_in(px, py, g):
        return 0.0
    return min(_seg_dist(px, py, p, q)
               for p, q in _edges_of_rings(_geom_rings(g)))


def dist_to_boundary(px, py, g):
    return min(_seg_dist(px, py, p, q)
               for p, q in _edges_of_rings(_geom_rings(g)))


# ---------------------------------------------------------------- anchors
def test_segment_buffer_exact_area():
    d, q = 0.5, 8
    g = buffer_geom(("linestring", [(0.0, 0.0), (3.0, 0.0)]), d, q)
    assert geom_area(g) == pytest.approx(2 * d * 3 + kgon_area(d, q), rel=1e-12)


def test_rect_dilate_erode_exact_area():
    d, q = 0.5, 8
    rect = ("polygon", [[(0.0, 0.0), (2.0, 0.0), (2.0, 3.0), (0.0, 3.0)]])
    dil = buffer_geom(rect, d, q)
    # one d-wide strip per edge (d * perimeter) + a full k-gon of corners
    assert geom_area(dil) == pytest.approx(6 + d * 10 + kgon_area(d, q), rel=1e-12)
    ero = buffer_geom(rect, -d, q)
    assert geom_area(ero) == pytest.approx((2 - 2 * d) * (3 - 2 * d), rel=1e-12)
    # erosion past the inradius empties the geometry
    assert buffer_geom(("polygon", [[(0, 0), (1, 0), (1, 1), (0, 1)]]), -0.6, q) is None


def test_donut_dilate_erode_exact_area():
    d, q = 0.25, 8
    donut = ("polygon", [
        [(0, 0), (4, 0), (4, 4), (0, 4)],
        [(1, 1), (3, 1), (3, 3), (1, 3)],
    ])
    dil = buffer_geom(donut, d, q)
    # outer grows by d*P + corner k-gon; the hole SHRINKS to (2-2d)^2
    want = (16 + d * 16 + kgon_area(d, q)) - (2 - 2 * d) ** 2
    assert geom_area(dil) == pytest.approx(want, rel=1e-12)
    ero = buffer_geom(donut, -d, q)
    # outer shrinks to 3.5^2; the hole GROWS by its own dilation
    want = 3.5 ** 2 - (4 + d * 8 + kgon_area(d, q))
    assert geom_area(ero) == pytest.approx(want, rel=1e-12)


def test_point_matches_vectorized_kernel():
    d, q = 0.7, 8
    ga = GeometryArray.from_pylist([("point", (1.0, 2.0)), None, ("point", (-3.0, 0.5))])
    fast = buffer_geoms(ga, d, q)          # all-point fast path
    assert np.allclose(K.area(fast)[[0, 2]], kgon_area(d, q))
    # force the generic path with a mixed batch: point rows must still
    # produce the same ring (same k-gon start angle and orientation)
    mixed = GeometryArray.from_pylist(
        [("point", (1.0, 2.0)), ("linestring", [(0.0, 0.0), (1.0, 0.0)])])
    gen = buffer_geoms(mixed, d, q).to_pylist()
    fast_ring = fast.to_pylist()[0]
    assert geom_area(gen[0]) == pytest.approx(geom_area(fast_ring), rel=1e-12)
    a = np.array(_geom_rings(gen[0])[0])
    b = np.array(_geom_rings(fast_ring)[0])
    # same vertex set regardless of closure convention
    assert np.allclose(sorted(map(tuple, a.tolist()))[: len(a) - 1][:5],
                       sorted(map(tuple, b.tolist()))[: len(b) - 1][:5])


def test_multipoint_union_dissolves_overlap():
    d, q = 1.0, 8
    g = buffer_geom(("multipoint", [(0.0, 0.0), (0.5, 0.0)]), d, q)
    a = geom_area(g)
    assert a < 2 * kgon_area(d, q)  # overlap dissolved, not double counted
    assert a > kgon_area(d, q)
    far = buffer_geom(("multipoint", [(0.0, 0.0), (10.0, 0.0)]), d, q)
    assert geom_area(far) == pytest.approx(2 * kgon_area(d, q), rel=1e-12)
    assert len(far[1]) == 2


# ------------------------------------------------------- membership oracle
@pytest.mark.parametrize("seed", range(6))
def test_membership_oracle_random_shapes(seed):
    """p in buffer(g, d) must agree with dist(p, g) <= d outside the
    inscribed/circumscribed band [d*cos(pi/k), d] of the k-gon circles."""
    rng = np.random.default_rng(300 + seed)
    q = 8
    k = 4 * q
    d = float(rng.uniform(0.2, 0.6))
    kind = ("linestring", "polygon")[seed % 2]
    if kind == "linestring":
        pts = [(float(x), float(y)) for x, y in rng.uniform(-2, 2, (5, 2))]
        g = ("linestring", pts)
    else:
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        rr = rng.uniform(0.8, 2.0, 7)
        g = ("polygon", [[(ri * np.cos(t), ri * np.sin(t)) for ri, t in zip(rr, ang)]])
    res = buffer_geom(g, d, q)
    lo_band = d * math.cos(math.pi / k) - 1e-9
    hi_band = d + 1e-9
    checked = 0
    for _ in range(500):
        px, py = rng.uniform(-3.5, 3.5, 2)
        dist = dist_to_geom(px, py, g)
        if lo_band <= dist <= hi_band:
            continue  # inside the approximation band: either answer legal
        got = point_in(px, py, res)
        assert got == (dist < lo_band), (px, py, dist, d)
        checked += 1
    assert checked > 300


@pytest.mark.parametrize("seed", range(3))
def test_erosion_membership_oracle(seed):
    rng = np.random.default_rng(400 + seed)
    q = 8
    k = 4 * q
    d = float(rng.uniform(0.1, 0.3))
    ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
    rr = rng.uniform(1.2, 2.5, 8)
    g = ("polygon", [[(ri * np.cos(t), ri * np.sin(t)) for ri, t in zip(rr, ang)]])
    res = buffer_geom(g, -d, q)
    lo_band = d * math.cos(math.pi / k) - 1e-9
    hi_band = d + 1e-9
    checked = 0
    for _ in range(500):
        px, py = rng.uniform(-3, 3, 2)
        inside = point_in(px, py, g)
        bdist = dist_to_boundary(px, py, g)
        if inside and lo_band <= bdist <= hi_band:
            continue
        got = point_in(px, py, res) if res is not None else False
        want = inside and bdist > hi_band
        assert got == want, (px, py, inside, bdist)
        checked += 1
    assert checked > 300


# ------------------------------------------------------------------ errors
def test_errors_and_nulls():
    with pytest.raises(ValueError, match="nonzero"):
        buffer_geom(("point", (0.0, 0.0)), 0.0)
    with pytest.raises(ValueError, match="negative"):
        buffer_geom(("linestring", [(0, 0), (1, 0)]), -0.5)
    with pytest.raises(ValueError, match="quad_segs"):
        buffer_geom(("point", (0.0, 0.0)), 1.0, quad_segs=0)
    assert buffer_geom(None, 1.0) is None
    ga = GeometryArray.from_pylist([None, ("linestring", [(0.0, 0.0), (2.0, 0.0)])])
    out = buffer_geoms(ga, 0.5).to_pylist()
    assert out[0] is None
    assert geom_area(out[1]) == pytest.approx(2 * 0.5 * 2 + kgon_area(0.5), rel=1e-12)


# ----------------------------------------------------------- Ray stage path
def test_buffer_stage_mixed_types(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import decode_wkb, encode_wkb

    geoms = [
        ("point", (0.0, 0.0)),
        ("linestring", [(0.0, 0.0), (4.0, 0.0)]),
        ("polygon", [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]]),
        None,
    ]
    t = pa.table({
        "geometry": encode_wkb(GeometryArray.from_pylist(geoms)),
        "rid": pa.array([0, 1, 2, 3]),
    })
    gds = GeoDataset(ray.data.from_arrow(t))
    out_ds = gds.buffer(0.5).area("buf_area").dataset
    tbl = pa.concat_tables(ray.get(out_ds.to_arrow_refs()))
    got = dict(zip(tbl["rid"].to_pylist(),
                   tbl["buf_area"].to_numpy(zero_copy_only=False)))
    assert got[0] == pytest.approx(kgon_area(0.5), rel=1e-12)
    assert got[1] == pytest.approx(2 * 0.5 * 4 + kgon_area(0.5), rel=1e-12)
    assert got[2] == pytest.approx(4 + 0.5 * 8 + kgon_area(0.5), rel=1e-12)
    assert math.isnan(got[3])
