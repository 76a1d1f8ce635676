"""Tests: DE-9IM relate + binary predicate family (geom/relate.py).

Ground-truth matrices hand-derived from the OGC definitions (matrix
order [II, IB, IE, BI, BB, BE, EI, EB, EE]); cross-checked against the
published shapely/PostGIS values for the classic configurations.
"""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray
from geopolars_ray.geom.relate import (
    PREDICATES,
    matches,
    predicate,
    relate,
    relate_pair,
    relate_pattern,
)

SQ = ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)]])
SQ2 = ("polygon", [[(2., 2.), (6., 2.), (6., 6.), (2., 6.), (2., 2.)]])
INNER = ("polygon", [[(1., 1.), (2., 1.), (2., 2.), (1., 2.), (1., 1.)]])
ADJ = ("polygon", [[(4., 0.), (8., 0.), (8., 4.), (4., 4.), (4., 0.)]])
CORNER = ("polygon", [[(4., 4.), (6., 4.), (6., 6.), (4., 6.), (4., 4.)]])
FAR = ("polygon", [[(10., 10.), (11., 10.), (11., 11.), (10., 11.), (10., 10.)]])


def R(a, b):
    return relate(GeometryArray.from_pylist([a]), GeometryArray.from_pylist([b]))[0]


def P(name, a, b):
    return bool(predicate(GeometryArray.from_pylist([a]),
                          GeometryArray.from_pylist([b]), name)[0])


def test_relate_polygon_polygon():
    assert R(SQ, SQ2) == "212101212"     # partial overlap
    assert R(SQ, INNER) == "212FF1FF2"   # contains
    assert R(INNER, SQ) == "2FF1FF212"   # within
    assert R(SQ, ADJ) == "FF2F11212"     # shared edge
    assert R(SQ, CORNER) == "FF2F01212"  # corner touch
    assert R(SQ, FAR) == "FF2FF1212"     # disjoint
    assert R(SQ, SQ) == "2FFF1FFF2"      # equal
    # hole cases: donut vs its hole-filling square
    donut = ("polygon", [[(0., 0.), (6., 0.), (6., 6.), (0., 6.), (0., 0.)],
                         [(2., 2.), (2., 4.), (4., 4.), (4., 2.), (2., 2.)]])
    plug = ("polygon", [[(2., 2.), (4., 2.), (4., 4.), (2., 4.), (2., 2.)]])
    # interiors disjoint, the plug's WHOLE boundary is the donut's hole
    # ring (so E(donut) meets none of B(plug)), plug interior lies in the
    # donut's exterior (the hole IS exterior)
    assert R(donut, plug) == "FF2F112F2"


def test_relate_line_polygon():
    cross = ("linestring", [(-1., 2.), (5., 2.)])
    assert R(cross, SQ) == "101FF0212"
    assert R(SQ, cross) == "1F20F1102"   # exact transpose
    touch = ("linestring", [(-1., -1.), (0., 0.)])  # endpoint at corner
    assert R(touch, SQ) == "FF1F00212"
    inside = ("linestring", [(1., 1.), (3., 3.)])
    assert R(inside, SQ) == "1FF0FF212"
    edge = ("linestring", [(0., 0.), (4., 0.)])     # along the boundary
    assert R(edge, SQ) == "F1FF0F212"
    half_in = ("linestring", [(2., 2.), (7., 2.)])  # start inside, exits
    assert R(half_in, SQ) == "1010F0212"


def test_relate_line_line():
    l1 = ("linestring", [(0., 0.), (4., 0.)])
    assert R(l1, ("linestring", [(2., -2.), (2., 2.)])) == "0F1FF0102"  # cross
    assert R(l1, ("linestring", [(1., 0.), (3., 0.)])) == "101FF0FF2"   # contains
    assert R(l1, ("linestring", [(4., 0.), (8., 0.)])) == "FF1F00102"   # endpoint touch
    assert R(l1, ("linestring", [(2., 0.), (6., 0.)])) == "1010F0102"   # collinear overlap
    assert R(l1, l1) == "1FFF0FFF2"                                      # equal
    # T-touch: l2's endpoint on l1's interior
    assert R(l1, ("linestring", [(2., 0.), (2., 5.)])) == "F01FF0102"


def test_relate_points():
    pt = ("point", (1., 1.))
    line = ("linestring", [(-1., 2.), (5., 2.)])
    assert R(pt, SQ) == "0FFFFF212"
    assert R(("point", (0., 0.)), SQ) == "F0FFFF212"   # on boundary
    assert R(("point", (9., 9.)), SQ) == "FF0FFF212"   # outside
    assert R(pt, line) == "FF0FFF102"
    assert R(("point", (2., 2.)), line) == "0FFFFF102"  # on interior
    assert R(("point", (-1., 2.)), line) == "F0FFFF102"  # on endpoint
    assert R(pt, pt) == "0FFFFFFF2"
    assert R(pt, ("point", (5., 5.))) == "FF0FFF0F2"
    mp = ("multipoint", [(1., 1.), (9., 9.)])
    assert R(mp, SQ) == "0F0FFF212"   # one in, one out
    # flipped order = exact transpose
    m = relate_pair(GeometryArray.from_pylist([SQ]), 0,
                    GeometryArray.from_pylist([pt]), 0)
    assert "".join("F" if d < 0 else str(d) for d in m) == "0F2FF1FF2"
    assert R(SQ, pt) == "0F2FF1FF2"


def test_predicate_family():
    inside_line = ("linestring", [(1., 1.), (3., 3.)])
    edge_line = ("linestring", [(0., 0.), (4., 0.)])
    cross_line = ("linestring", [(-1., 2.), (5., 2.)])
    l1 = ("linestring", [(0., 0.), (4., 0.)])
    l5 = ("linestring", [(2., 0.), (6., 0.)])
    assert P("overlaps", SQ, SQ2) and not P("overlaps", SQ, INNER)
    assert P("contains", SQ, INNER) and P("within", INNER, SQ)
    assert P("touches", SQ, ADJ) and P("touches", SQ, CORNER)
    assert not P("touches", SQ, SQ2)
    assert P("disjoint", SQ, FAR) and not P("intersects", SQ, FAR)
    assert P("intersects", SQ, ADJ)  # boundary-only contact intersects
    assert P("equals", SQ, SQ) and not P("equals", SQ, SQ2)
    assert P("crosses", cross_line, SQ)
    assert P("crosses", l1, ("linestring", [(2., -2.), (2., 2.)]))
    assert not P("crosses", l1, l5) and P("overlaps", l1, l5)
    assert P("covers", SQ, INNER) and P("covers", SQ, edge_line)
    assert P("covered_by", edge_line, SQ)
    assert not P("contains", SQ, edge_line)   # classic covers-not-contains
    assert P("contains", SQ, inside_line)
    # point predicates
    assert P("within", ("point", (1., 1.)), SQ)
    assert P("touches", ("point", (0., 0.)), SQ)
    assert P("intersects", ("point", (2., 2.)), cross_line)
    # missing rows are False for every predicate
    ga = GeometryArray.from_pylist([None])
    gb = GeometryArray.from_pylist([SQ])
    for name in PREDICATES:
        assert not predicate(ga, gb, name)[0]


def test_relate_pattern_and_matcher():
    assert relate_pattern(GeometryArray.from_pylist([SQ]),
                          GeometryArray.from_pylist([INNER]), "T*****FF*")[0]
    assert matches([2, -1, 2, -1, 1, -1, 2, 1, 2], "T*T***T**")
    assert not matches([2, -1, 2, -1, 1, -1, 2, 1, 2], "T*F******")
    assert matches([0, -1, 1, -1, -1, 0, 1, 0, 2], "0********")
    with pytest.raises(ValueError):
        matches([0] * 9, "T*")


def test_predicates_consistent_with_join_semantics():
    """Random rect pairs: intersects == bbox-overlap for axis-aligned
    rects; contains matches the arithmetic truth; touches only on
    measure-zero contact."""
    rng = np.random.default_rng(31)
    rows_a, rows_b, exp_int, exp_cont = [], [], [], []
    for _ in range(60):
        ax0, ay0 = rng.integers(0, 8, 2).astype(float)
        aw, ah = rng.integers(1, 5, 2).astype(float)
        bx0, by0 = rng.integers(0, 8, 2).astype(float)
        bw, bh = rng.integers(1, 5, 2).astype(float)
        A = ("polygon", [[(ax0, ay0), (ax0 + aw, ay0), (ax0 + aw, ay0 + ah),
                          (ax0, ay0 + ah), (ax0, ay0)]])
        B = ("polygon", [[(bx0, by0), (bx0 + bw, by0), (bx0 + bw, by0 + bh),
                          (bx0, by0 + bh), (bx0, by0)]])
        rows_a.append(A)
        rows_b.append(B)
        exp_int.append(ax0 <= bx0 + bw and bx0 <= ax0 + aw
                       and ay0 <= by0 + bh and by0 <= ay0 + ah)
        exp_cont.append(ax0 < bx0 and bx0 + bw < ax0 + aw
                        and ay0 < by0 and by0 + bh < ay0 + ah)
    ga = GeometryArray.from_pylist(rows_a)
    gb = GeometryArray.from_pylist(rows_b)
    got_int = predicate(ga, gb, "intersects")
    got_cont = predicate(ga, gb, "contains")
    assert list(got_int) == exp_int
    # strict containment implies contains (boundary-touch containment is
    # covers, checked separately above)
    for g, e in zip(got_cont, exp_cont):
        assert g or not e


def test_relate_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import encode_wkb

    t = pa.table({
        "geometry": encode_wkb(GeometryArray.from_pylist([SQ, SQ, SQ])),
        "other": encode_wkb(GeometryArray.from_pylist([INNER, ADJ, FAR])),
    })
    gd = GeoDataset(ray.data.from_arrow(t))
    out = gd.relate("other").intersects("other").touches("other").dataset.take_all()
    assert [r["relate"] for r in out] == ["212FF1FF2", "FF2F11212", "FF2FF1212"]
    assert [r["intersects"] for r in out] == [True, True, False]
    assert [r["touches"] for r in out] == [False, True, False]


def test_relate_vs_distance_oracle_fuzz():
    """Independent cross-kernel oracle: for closed geometries,
    intersects(a, b) <=> distance(a, b) == 0 (the distance kernel shares
    no code with the DE-9IM path). Plus family coherence laws."""
    from geopolars_ray.geom import kernels as K

    rng = np.random.default_rng(41)
    rows_a, rows_b = [], []
    for _ in range(80):
        kind = rng.integers(0, 3)
        x0, y0 = rng.integers(0, 10, 2).astype(float)
        if kind == 0:
            rows_a.append(("point", (x0, y0)))
        elif kind == 1:
            x1, y1 = rng.integers(0, 10, 2).astype(float)
            if (x0, y0) == (x1, y1):
                x1 += 1.0
            rows_a.append(("linestring", [(x0, y0), (x1, y1)]))
        else:
            w, h = rng.integers(1, 4, 2).astype(float)
            rows_a.append(("polygon", [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                                        (x0, y0 + h), (x0, y0)]]))
        kind = rng.integers(0, 3)
        x0, y0 = rng.integers(0, 10, 2).astype(float)
        if kind == 0:
            rows_b.append(("point", (x0, y0)))
        elif kind == 1:
            x1, y1 = rng.integers(0, 10, 2).astype(float)
            if (x0, y0) == (x1, y1):
                y1 += 1.0
            rows_b.append(("linestring", [(x0, y0), (x1, y1)]))
        else:
            w, h = rng.integers(1, 4, 2).astype(float)
            rows_b.append(("polygon", [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                                        (x0, y0 + h), (x0, y0)]]))
    ga = GeometryArray.from_pylist(rows_a)
    gb = GeometryArray.from_pylist(rows_b)
    inter = predicate(ga, gb, "intersects")
    dist = K.distance(ga, gb)
    np.testing.assert_array_equal(inter, dist == 0.0)
    # coherence: disjoint = !intersects; touches/within/contains imply
    # intersects; touches excludes within & contains
    disj = predicate(ga, gb, "disjoint")
    np.testing.assert_array_equal(disj, ~inter)
    tch = predicate(ga, gb, "touches")
    win = predicate(ga, gb, "within")
    con = predicate(ga, gb, "contains")
    cov = predicate(ga, gb, "covers")
    cvb = predicate(ga, gb, "covered_by")
    assert not (tch & ~inter).any()
    assert not (win & ~inter).any()
    assert not (tch & win).any() and not (tch & con).any()
    assert not (con & ~cov).any() and not (win & ~cvb).any()


def test_relate_float_containment_no_epsilon_failures():
    """Regression: the AA matrix is combinatorial (no float area
    comparisons), so float-coordinate contained polygons are always
    'within' — the old area-identity path failed ~8% of these."""
    rng = np.random.default_rng(7)
    outer = ("polygon", [[(-1., -1.), (11., -1.), (11., 11.), (-1., 11.), (-1., -1.)]])
    for _ in range(50):
        k = 8
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rr = rng.uniform(1, 4, k)
        cx, cy = rng.uniform(4, 6, 2)
        pts = [(float(cx + ri * np.cos(a)), float(cy + ri * np.sin(a)))
               for ri, a in zip(rr, ang)]
        inner = ("polygon", [pts + [pts[0]]])
        assert P("within", inner, outer)
        assert P("contains", outer, inner)


def test_relate_snapped_endpoint_consistency():
    """Regression: boundary endpoints must be canonicalized through the
    snap-rounding — a 1e-13 endpoint gap is a BB touch, never a
    boundary-in-interior claim."""
    a = ("linestring", [(0., 0.), (4., 0.)])
    b = ("linestring", [(4. + 1e-13, 0.), (8., 0.)])
    assert R(a, b) == "FF1F00102"


def test_relate_misaligned_inputs_raise():
    ga2 = GeometryArray.from_pylist([("point", (0., 0.)), ("point", (1., 1.))])
    gb1 = GeometryArray.from_pylist([("point", (0., 0.))])
    with pytest.raises(ValueError, match="aligned"):
        predicate(ga2, gb1, "intersects")
    with pytest.raises(ValueError, match="aligned"):
        relate_pattern(ga2, gb1, "T********")


def test_relate_fully_shared_boundary_family():
    """Regression: when one operand's boundary is ENTIRELY shared (disk
    over donut, plug in donut's hole) the interior side is resolved by
    an interior probe, not boundary pieces."""
    donut = ("polygon", [[(0., 0.), (6., 0.), (6., 6.), (0., 6.), (0., 0.)],
                         [(2., 2.), (2., 4.), (4., 4.), (4., 2.), (2., 2.)]])
    disk = ("polygon", [[(0., 0.), (6., 0.), (6., 6.), (0., 6.), (0., 0.)]])
    plug = ("polygon", [[(2., 2.), (4., 2.), (4., 4.), (2., 4.), (2., 2.)]])
    assert R(donut, disk) == "2FF11F2F2"   # annulus within disk
    assert R(disk, donut) == "212F1FFF2"   # exact transpose
    assert R(plug, donut) == "FF2F1F212"
    assert P("within", donut, disk) and P("contains", disk, donut)
    assert P("touches", donut, plug)
    assert P("within", plug, disk)


def test_sjoin_nearest_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset

    left = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "lon": pa.array([0.0, 10.0]),
                     "lat": pa.array([0.0, 0.0])})
    right = pa.table({"id": pa.array([10, 20, 30], pa.int64()),
                      "lon": pa.array([0.5, 9.0, 50.0]),
                      "lat": pa.array([0.0, 0.0, 0.0])})
    gd = GeoDataset(ray.data.from_arrow(left))
    joined = gd.sjoin_nearest(ray.data.from_arrow(right), k=1)
    # output carries the CALLER's id names (suffixed on collision), and is
    # a plain attribute table — no phantom geometry_col (ADVICE r4)
    assert joined.geometry_col is None and joined.crs is None
    out = joined.dataset.take_all()
    got = {r["id_left"]: (r["id_right"], r["distance"]) for r in out}
    assert got[1] == (10, 0.5) and got[2] == (20, 1.0)
    # max_distance filters the far match
    out2 = gd.sjoin_nearest(ray.data.from_arrow(right), k=1,
                            max_distance=0.6).dataset.take_all()
    assert [r["id_left"] for r in out2] == [1]
    # distinct id column names pass through un-suffixed (k>1 path too)
    right2 = right.rename_columns(["rid", "lon", "lat"])
    out3 = gd.sjoin_nearest(ray.data.from_arrow(right2), k=2,
                            other_id_col="rid").dataset.take_all()
    assert {"id", "rid", "distance"} <= set(out3[0].keys())
    assert sum(r["id"] == 1 for r in out3) == 2


def test_relate_shared_component_in_multipolygon():
    """Regression: the fully-shared-boundary probe must run PER PART —
    a multipolygon combining a hole-plug (boundary entirely shared with
    A's hole ring) and a separate strictly-interior square used to skip
    the probe and report contains=True although the plug's interior is
    in A's exterior."""
    A = ("polygon", [[(0., 0.), (10., 0.), (10., 10.), (0., 10.), (0., 0.)],
                     [(2., 2.), (2., 5.), (5., 5.), (5., 2.), (2., 2.)]])
    B = ("multipolygon", [
        [[(2., 2.), (5., 2.), (5., 5.), (2., 5.), (2., 2.)]],   # plug = hole
        [[(6., 6.), (8., 6.), (8., 8.), (6., 8.), (6., 6.)]],   # inside A
    ])
    m = R(A, B)
    assert m[6] == "2", m       # EI: plug interior is in A's exterior
    assert m[0] == "2", m       # II: the inner square IS inside A
    assert not P("contains", A, B)
    assert not P("within", B, A)


def test_fast_paths_match_sweep_exactly():
    """The vectorized rect/point fast paths must produce the EXACT
    matrices the arrangement sweep produces, across all contact classes
    and both ring windings (routing equivalence, 400+ random pairs)."""
    from geopolars_ray.geom.relate import _all_matrices, relate_pair

    rng = np.random.default_rng(55)

    def rect(x0, y0, w, h, rev=False):
        ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]
        if rev:
            ring = ring[::-1]
        return ("polygon", [[(float(a), float(b)) for a, b in ring]])

    rows_a, rows_b = [], []
    for _ in range(150):
        rows_a.append(rect(rng.integers(0, 6), rng.integers(0, 6),
                           rng.integers(1, 5), rng.integers(1, 5),
                           rev=bool(rng.integers(2))))
        rows_b.append(rect(rng.integers(0, 6), rng.integers(0, 6),
                           rng.integers(1, 5), rng.integers(1, 5),
                           rev=bool(rng.integers(2))))
    for _ in range(60):
        rows_a.append(("point", (float(rng.integers(0, 8)), float(rng.integers(0, 8)))))
        rows_b.append(rect(rng.integers(0, 6), rng.integers(0, 6),
                           rng.integers(1, 4), rng.integers(1, 4)))
        rows_a.append(rect(rng.integers(0, 6), rng.integers(0, 6),
                           rng.integers(1, 4), rng.integers(1, 4)))
        rows_b.append(("point", (float(rng.integers(0, 8)), float(rng.integers(0, 8)))))
    for _ in range(30):
        rows_a.append(("point", (float(rng.integers(0, 3)), float(rng.integers(0, 3)))))
        rows_b.append(("point", (float(rng.integers(0, 3)), float(rng.integers(0, 3)))))
    # non-rect rows exercise the fallback routing in the same batch
    rows_a.append(("polygon", [[(0., 0.), (4., 0.), (2., 3.), (0., 0.)]]))
    rows_b.append(rect(1, 1, 2, 2))
    rows_a.append(None)
    rows_b.append(rect(0, 0, 1, 1))
    ga = GeometryArray.from_pylist(rows_a)
    gb = GeometryArray.from_pylist(rows_b)
    fast = _all_matrices(ga, gb)
    for i in range(len(ga)):
        assert fast[i] == relate_pair(ga, i, gb, i), (i, rows_a[i], rows_b[i])


def test_fast_path_snap_band_falls_back_to_sweep():
    """Regression: contacts inside the arrangement's snap tolerance must
    give the SWEEP's tolerant answer, whatever the encoding — a 1e-13
    gap between rects is a touch, not disjoint; and the same geometry as
    a 6-coord ring (sweep path) must agree."""
    a5 = ("polygon", [[(0., 0.), (1., 0.), (1., 1.), (0., 1.), (0., 0.)]])
    b5 = ("polygon", [[(1. + 1e-13, 0.), (2., 0.), (2., 1.),
                       (1. + 1e-13, 1.), (1. + 1e-13, 0.)]])
    # 6-coord encoding of the same rect a5 (midpoint on the bottom edge)
    a6 = ("polygon", [[(0., 0.), (0.5, 0.), (1., 0.), (1., 1.), (0., 1.), (0., 0.)]])
    ga = GeometryArray.from_pylist([a5, a6])
    gb = GeometryArray.from_pylist([b5, b5])
    m = relate(ga, gb)
    assert m[0] == m[1]  # encoding-independent
    assert P("touches", a5, b5) and P("intersects", a5, b5)
    # degenerate 5-coord spike ring is NOT detected as a rectangle
    spike = ("polygon", [[(0., 0.), (1., 0.), (0., 0.), (0., 1.), (0., 0.)]])
    rect = ("polygon", [[(0., 0.), (1., 0.), (1., 1.), (0., 1.), (0., 0.)]])
    from geopolars_ray.geom.relate import _all_matrices, relate_pair
    gs = GeometryArray.from_pylist([spike])
    gr = GeometryArray.from_pylist([rect])
    assert _all_matrices(gs, gr)[0] == relate_pair(gs, 0, gr, 0)


def test_gate_query_rects_engage_fast_path():
    """The geo_type_flags gate rects must actually route through the
    rectangle fast path (regression: open 4-coord rings silently fell
    back to the per-pair sweep — equivalence tests alone cannot catch a
    routing no-op, engagement must be asserted)."""
    from geopolars_ray.geom.relate import _rect_boxes

    k = np.arange(64)
    x0 = (k % 11).astype(float)
    y0 = (k % 13).astype(float)
    w = (4 + k % 3).astype(float)
    h = (5 + k % 4).astype(float)
    ga = GeometryArray.from_pylist([
        ("polygon", [[(a, b), (a + c, b), (a + c, b + d), (a, b + d), (a, b)]])
        for a, b, c, d in zip(x0, y0, w, h)])
    mask, _boxes = _rect_boxes(ga)
    assert mask.all()


def _star(cx, cy, radii, rng):
    """Simple (star-shaped) polygon: radially sorted vertices around a
    center — never self-intersecting."""
    k = len(radii)
    ang = np.sort(rng.uniform(0.0, 2 * np.pi, k))
    ring = [(float(cx + r * np.cos(a)), float(cy + r * np.sin(a)))
            for r, a in zip(radii, ang)]
    return ("polygon", [ring + [ring[0]]])


def test_general_poly_fast_path_matches_sweep():
    """r5: the general simple-polygon classifier (crossing / containment /
    disjoint via flattened seg-pair numpy) must equal the sweep exactly —
    random stars at offsets covering every contact class, including
    borderline rows that must silently fall back."""
    from geopolars_ray.geom.relate import _all_matrices, relate_pair

    rng = np.random.default_rng(77)
    rows_a, rows_b = [], []
    for _ in range(120):
        rows_a.append(_star(0.0, 0.0, rng.uniform(2, 5, rng.integers(4, 9)), rng))
        # offset sweeps: overlap (0-3), touch-ish (5-7), contained (tiny
        # star inside), far disjoint, bbox-overlap disjoint (diagonal)
        mode = rng.integers(5)
        if mode == 0:
            rows_b.append(_star(float(rng.uniform(0, 3)), float(rng.uniform(0, 3)),
                                rng.uniform(2, 5, rng.integers(4, 9)), rng))
        elif mode == 1:
            rows_b.append(_star(0.0, 0.0, rng.uniform(0.2, 0.8, rng.integers(4, 8)), rng))
        elif mode == 2:
            rows_b.append(_star(30.0, 30.0, rng.uniform(1, 4, rng.integers(4, 8)), rng))
        elif mode == 3:
            # big far corner star whose bbox overlaps A's bbox but body is clear
            rows_b.append(("polygon", [[(4.9, 4.9), (9., 5.5), (9., 9.), (5.5, 9.), (4.9, 4.9)]]))
        else:
            rows_b.append(_star(float(rng.uniform(4, 6)), float(rng.uniform(4, 6)),
                                rng.uniform(1, 3, rng.integers(4, 8)), rng))
    # exact shared-edge touch and equal polygons: must route to the sweep
    tri = ("polygon", [[(0., 0.), (4., 0.), (2., 3.), (0., 0.)]])
    tri2 = ("polygon", [[(4., 0.), (0., 0.), (2., -3.), (4., 0.)]])
    rows_a += [tri, tri]
    rows_b += [tri2, tri]
    ga = GeometryArray.from_pylist(rows_a)
    gb = GeometryArray.from_pylist(rows_b)
    fast = _all_matrices(ga, gb)
    for i in range(len(ga)):
        assert fast[i] == relate_pair(ga, i, gb, i), (i, rows_a[i], rows_b[i])


def test_bbox_disjoint_fast_path_all_families():
    """r5: bbox-separated pairs of EVERY family (incl. holes, multiparts,
    open/closed lines) classify without the sweep and equal it."""
    import geopolars_ray.geom.relate as REL

    shapes = [
        ("point", (0.0, 0.0)),
        ("multipoint", [(0.0, 0.0), (1.0, 1.0)]),
        ("linestring", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]),
        ("linestring", [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]),  # closed
        ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)], [(1.0, 0.0), (1.0, 1.0)]]),
        ("polygon", [[(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)],
                     [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]]),
        ("multipolygon", [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]],
                          [[(2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 2.0)]]]),
    ]

    def shift(s, dx, dy):
        t, c = s
        if t == "point":
            return (t, (c[0] + dx, c[1] + dy))
        if t in ("multipoint", "linestring"):
            return (t, [(x + dx, y + dy) for x, y in c])
        if t == "multilinestring":
            return (t, [[(x + dx, y + dy) for x, y in p] for p in c])
        if t == "polygon":
            return (t, [[(x + dx, y + dy) for x, y in r] for r in c])
        return (t, [[[(x + dx, y + dy) for x, y in r] for r in part] for part in c])

    rows_a, rows_b = [], []
    for sa in shapes:
        for sb in shapes:
            rows_a.append(sa)
            rows_b.append(shift(sb, 100.0, -50.0))
    ga = GeometryArray.from_pylist(rows_a)
    gb = GeometryArray.from_pylist(rows_b)
    expected = [relate_pair(ga, i, gb, i) for i in range(len(ga))]
    # engagement: the sweep must never be consulted for separated pairs
    orig = REL.relate_pair
    REL.relate_pair = lambda *a: (_ for _ in ()).throw(AssertionError("sweep hit"))
    try:
        fast = REL._all_matrices(ga, gb)
    finally:
        REL.relate_pair = orig
    assert fast == expected


def test_general_poly_fast_path_engagement():
    """r5: crossing / containment / bbox-overlap-disjoint / point-in-poly
    simple-ring cases classify WITHOUT the sweep (monkeypatched to raise)."""
    import geopolars_ray.geom.relate as REL

    tri_a = ("polygon", [[(0., 0.), (10., 0.), (5., 8.), (0., 0.)]])
    rows_a = [
        tri_a,                                                       # crossing
        tri_a,                                                       # contains
        tri_a,                                                       # bbox-overlap disjoint
        ("point", (5.0, 3.0)),                                       # point in tri
        tri_a,                                                       # tri vs point (flip)
    ]
    rows_b = [
        ("polygon", [[(6., -3.), (14., 4.), (6., 11.), (6., -3.)]]),
        ("polygon", [[(4., 1.), (6., 1.), (5., 2.), (4., 1.)]]),
        ("polygon", [[(9., 6.), (12., 6.), (12., 9.), (9., 9.), (9., 6.)]]),
        ("polygon", [[(0., 0.), (10., 0.), (5., 8.), (0., 0.)]]),
        ("point", (20.0, 3.0)),
    ]
    ga = GeometryArray.from_pylist(rows_a)
    gb = GeometryArray.from_pylist(rows_b)
    expected = [relate_pair(ga, i, gb, i) for i in range(len(ga))]
    orig = REL.relate_pair
    REL.relate_pair = lambda *a: (_ for _ in ()).throw(AssertionError("sweep hit"))
    try:
        fast = REL._all_matrices(ga, gb)
    finally:
        REL.relate_pair = orig
    assert fast == expected
    assert fast[0] == [2, 1, 2, 1, 0, 1, 2, 1, 2]
    assert fast[1] == [2, 1, 2, -1, -1, 1, -1, -1, 2]
    assert fast[2] == [-1, -1, 2, -1, -1, 1, 2, 1, 2]


def test_vertex_budget_guards():
    """r5: per-geometry algorithmic kernels fail FAST and LOUD over the
    documented vertex budget; vertex_budget=0 disables, explicit budget
    overrides (geom/budget.py)."""
    import pytest

    from geopolars_ray.geom import kernels as K
    from geopolars_ray.geom.budget import DEFAULT_VERTEX_BUDGET, VertexBudgetError
    from geopolars_ray.geom.delaunay import delaunay_points
    from geopolars_ray.geom.relate import relate

    assert DEFAULT_VERTEX_BUDGET == 50_000
    pts = [(float(i), float((i * 7919) % 101)) for i in range(300)]
    with pytest.raises(VertexBudgetError, match="delaunay_points.*vertex_budget"):
        delaunay_points(pts, vertex_budget=100)
    assert len(delaunay_points(pts, vertex_budget=0)[1]) > 0   # disabled
    assert len(delaunay_points(pts)[1]) > 0                    # under default

    ring = [(float(np.cos(t)), float(np.sin(t)))
            for t in np.linspace(0, 2 * np.pi, 200)[:-1]]
    ga = GeometryArray.from_pylist([("polygon", [ring + [ring[0]]])])
    with pytest.raises(VertexBudgetError, match="minimum_clearance"):
        K.minimum_clearance(ga, vertex_budget=50)
    assert np.isfinite(K.minimum_clearance(ga)[0])
    with pytest.raises(VertexBudgetError, match="maximum_inscribed_circle"):
        K.maximum_inscribed_circle(ga, vertex_budget=50)

    # relate: only SWEEP-routed rows pay the guard — fast-path rows never do
    tri = ("polygon", [[(0., 0.), (4., 0.), (2., 3.), (0., 0.)]])
    tri_touch = ("polygon", [[(4., 0.), (0., 0.), (2., -3.), (4., 0.)]])
    far = ("polygon", [[(100., 100.), (104., 100.), (102., 103.), (100., 100.)]])
    assert relate(GeometryArray.from_pylist([tri]),
                  GeometryArray.from_pylist([far]),
                  vertex_budget=7)[0] == "FF2FF1212"  # fast path: no guard
    with pytest.raises(VertexBudgetError, match="arrangement sweep"):
        relate(GeometryArray.from_pylist([tri]),
               GeometryArray.from_pylist([tri_touch]), vertex_budget=7)
