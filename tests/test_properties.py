"""Property-based tests (hypothesis): codec round trips + kernel invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geopolars_ray.geom import GeometryArray, encode_wkb, decode_wkb
from geopolars_ray.geom import kernels as K
from geopolars_ray.geom import s2 as s2_mod
from geopolars_ray.geom.geoarrow import encode_geoarrow, decode_geoarrow
from geopolars_ray.geom.array import POLYGON

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)
pt = st.tuples(coord, coord)


def ring_strategy():
    return st.lists(pt, min_size=3, max_size=8).map(lambda ps: ps + [ps[0]])


geometry = st.one_of(
    st.none(),
    st.tuples(st.just("point"), pt),
    st.tuples(st.just("linestring"), st.lists(pt, min_size=2, max_size=10)),
    st.tuples(st.just("polygon"), st.lists(ring_strategy(), min_size=1, max_size=3)),
    st.tuples(st.just("multipoint"), st.lists(pt, min_size=1, max_size=6)),
    st.tuples(st.just("multilinestring"), st.lists(st.lists(pt, min_size=2, max_size=5), min_size=1, max_size=3)),
    st.tuples(st.just("multipolygon"), st.lists(st.lists(ring_strategy(), min_size=1, max_size=2), min_size=1, max_size=3)),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(geometry, min_size=0, max_size=12))
def test_wkb_round_trip_fuzz(geoms):
    ga = GeometryArray.from_pylist(geoms)
    back = decode_wkb(encode_wkb(ga))
    assert back.to_pylist() == ga.to_pylist()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.just("polygon"), st.lists(ring_strategy(), min_size=1, max_size=2)), min_size=1, max_size=8))
def test_geoarrow_round_trip_fuzz(geoms):
    ga = GeometryArray.from_pylist(geoms)
    back = decode_geoarrow(encode_geoarrow(ga), geom_type=POLYGON)
    assert back.to_pylist() == ga.to_pylist()


@settings(max_examples=40, deadline=None)
@given(st.lists(pt, min_size=1, max_size=40), st.floats(-1e3, 1e3), st.floats(-1e3, 1e3))
def test_translate_preserves_shape_measures(points, dx, dy):
    ga = GeometryArray.from_pylist([("multipoint", points)])
    moved = K.translate(ga, dx, dy)
    # hull area and path length are translation-invariant (up to fp)
    np.testing.assert_allclose(K.area(K.convex_hull(moved)), K.area(K.convex_hull(ga)), rtol=1e-6, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(st.lists(pt, min_size=3, max_size=40))
def test_hull_contains_all_points(points):
    ga = GeometryArray.from_pylist([("multipoint", points)])
    hull = K.convex_hull(ga)
    if hull.types[0] != POLYGON:
        return  # collinear collapse
    from geopolars_ray.geom.strtree import points_in_polygon_single

    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    ring = hull.coords
    inside = points_in_polygon_single(xs, ys, [ring])
    # every input point is inside or on the hull boundary
    d = np.abs
    on_bound = ~inside
    # for points not strictly inside, verify they lie on the boundary
    if on_bound.any():
        from geopolars_ray.geom.kernels import _min_point_to_segments

        segs = np.stack([ring[:-1], ring[1:]], axis=1)
        for i in np.nonzero(on_bound)[0]:
            dmin = _min_point_to_segments(np.array([[xs[i], ys[i]]]), segs)
            span = max(xs.max() - xs.min(), ys.max() - ys.min(), 1.0)
            assert dmin <= 1e-9 * span + 1e-9


@settings(max_examples=30, deadline=None)
@given(
    st.floats(min_value=-179.999, max_value=179.999),
    st.floats(min_value=-89.0, max_value=89.0),
    st.integers(min_value=1, max_value=29),
)
def test_s2_parent_invariant(lon, lat, level):
    la = np.array([lon]), np.array([lat])
    fine = s2_mod.s2_cell_id(la[0], la[1], level=min(level + 1, 30))
    coarse = s2_mod.s2_cell_id(la[0], la[1], level=level)
    assert s2_mod.parent_at_level(fine, level)[0] == coarse[0]
    assert s2_mod.cell_level(coarse)[0] == level


@settings(max_examples=40, deadline=None)
@given(st.lists(pt, min_size=2, max_size=30), st.floats(min_value=1e-6, max_value=100.0))
def test_simplify_invariants(points, tol):
    ga = GeometryArray.from_pylist([("linestring", points)])
    s = K.simplify(ga, tol)
    out = s.to_pylist()[0][1]
    # endpoints preserved, no new points, subset of originals
    assert out[0] == points[0] and out[-1] == points[-1]
    orig = set(points)
    assert all(p in orig for p in out)
    assert len(out) <= len(points)
