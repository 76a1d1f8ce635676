"""Tests: offset_curve (ST_OffsetCurve, geom/offset.py)."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray
from geopolars_ray.geom.offset import offset_curve


def _length(chain):
    c = np.asarray(chain)
    return float(np.hypot(*np.diff(c, axis=0).T).sum())


def test_offset_anchors():
    rows = [
        ("linestring", [(0., 0.), (10., 0.)]),
        ("linestring", [(0., 0.), (10., 0.), (10., 10.)]),   # inside (left) turn
        ("linestring", [(0., 0.), (10., 0.), (10., -10.)]),  # outside turn -> arc
        ("linestring", [(0., 0.), (10., 0.), (10., 10.), (0., 10.), (0., 0.)]),
        ("point", (1., 1.)),
        None,
    ]
    out = offset_curve(GeometryArray.from_pylist(rows), 1.0).to_pylist()
    assert out[0] == ("linestring", [(0., 1.), (10., 1.)])
    # concave joint trims at the offset crossing (9,1): exact GEOS shape
    assert out[1] == ("linestring", [(0., 1.), (9., 1.), (9., 10.)])
    # convex joint: quarter arc of radius 1 at the corner
    assert abs(_length(out[2][1]) - (20 + np.pi / 2)) < 0.02
    # CCW closed square, left offset = the inner side-8 square, closed
    c3 = np.asarray(out[3][1])
    assert abs(_length(c3) - 32.0) < 1e-9 and (c3[0] == c3[-1]).all()
    assert out[4] is None and out[5] is None


def test_offset_sign_and_direction():
    line = ("linestring", [(0., 0.), (10., 0.), (10., 10.)])
    ga = GeometryArray.from_pylist([line])
    right = offset_curve(ga, -1.0).to_pylist()[0]
    c = np.asarray(right[1])
    # right offset of an east-then-north path: starts at (0,-1), rounds
    # the corner outside, direction retained (starts near x=0)
    assert abs(c[0, 0]) < 1e-9 and c[0, 1] == -1.0
    # 10 along the bottom + quarter arc (radius 1) + 10 up the right side
    assert abs(_length(c) - (20 + np.pi / 2)) < 0.02
    # zero distance is the identity
    assert offset_curve(ga, 0.0).to_pylist()[0] == line


def test_offset_distance_property():
    """Every point of the offset curve lies at distance ~|d| from the
    input line (>= arc-chord tolerance, <= |d|), for random polylines
    and both signs."""
    from geopolars_ray.geom.offset import _min_dist_per_point

    rng = np.random.default_rng(23)
    for t in range(12):
        n = int(rng.integers(3, 9))
        steps = rng.uniform(-2, 2, (n, 2))
        c = np.cumsum(np.vstack([[0.0, 0.0], steps]), axis=0)
        d = float(rng.choice([-0.3, 0.3, 0.7]))
        ga = GeometryArray.from_pylist(
            [("linestring", [(float(x), float(y)) for x, y in c])])
        res = offset_curve(ga, d).to_pylist()[0]
        if res is None:
            continue
        chains = [res[1]] if res[0] == "linestring" else res[1]
        pts = np.asarray([p for ch in chains for p in ch])
        dist = _min_dist_per_point(pts, c[:-1], c[1:])
        thr = abs(d) * np.cos(np.pi / 32.0) * (1.0 - 1e-9)
        # exact piece-distance filter: EVERY surviving vertex honors the
        # arc-chord tolerance band [thr, |d|]
        assert dist.min() >= thr - 1e-9, (t, dist.min(), thr)
        assert dist.max() <= abs(d) + 1e-7, (t, dist.max())


def test_offset_multilinestring_and_split():
    # two parallel parts offset independently
    ml = ("multilinestring", [[(0., 0.), (5., 0.)], [(0., 5.), (5., 5.)]])
    out = offset_curve(GeometryArray.from_pylist([ml]), 0.5).to_pylist()[0]
    assert out[0] == "multilinestring" and len(out[1]) == 2
    # U-shape narrower than 2d: the inner offset collapses to split chains
    u = ("linestring", [(0., 0.), (0., 10.), (1., 10.), (1., 0.)])
    res = offset_curve(GeometryArray.from_pylist([u]), 0.8).to_pylist()[0]
    assert res is not None  # something survives on the outside of the bends


def test_offset_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import decode_wkb, encode_wkb

    t = pa.table({"geometry": encode_wkb(GeometryArray.from_pylist(
        [("linestring", [(0., 0.), (10., 0.)])]))})
    out = GeoDataset(ray.data.from_arrow(t)).offset_curve(2.0).dataset
    got = decode_wkb(pa.concat_tables(
        ray.get(out.to_arrow_refs()))["geometry"]).to_pylist()
    assert got[0] == ("linestring", [(0., 2.), (10., 2.)])


def test_offset_quad_segs_validation():
    ga = GeometryArray.from_pylist([("linestring", [(0., 0.), (1., 0.)])])
    with pytest.raises(ValueError, match="quad_segs"):
        offset_curve(ga, 1.0, quad_segs=0)
