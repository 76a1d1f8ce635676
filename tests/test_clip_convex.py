"""clip_by_convex: rational-arithmetic oracle, rect equivalence, properties."""

from fractions import Fraction

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from geopolars_ray.geom import GeometryArray
from geopolars_ray.geom import kernels as K
from geopolars_ray.geom.clip import clip_by_convex, clip_by_rect


def rational_convex_clip_area(subject, clip_ring):
    """EXACT intersection area of two convex polygons: Sutherland–Hodgman
    in Fraction arithmetic (S-H is an exact overlay when both are convex),
    then the rational shoelace. Both rings CCW, open."""
    poly = [(Fraction(x), Fraction(y)) for x, y in subject]
    cr = [(Fraction(x), Fraction(y)) for x, y in clip_ring]
    k = len(cr)
    for i in range(k):
        (x1, y1), (x2, y2) = cr[i], cr[(i + 1) % k]
        ex, ey = x2 - x1, y2 - y1

        def inside(p):
            return ex * (p[1] - y1) - ey * (p[0] - x1) >= 0

        out = []
        m = len(poly)
        for j in range(m):
            cur, prv = poly[j], poly[j - 1]
            ic, ip = inside(cur), inside(prv)
            if ic != ip:
                dx, dy = cur[0] - prv[0], cur[1] - prv[1]
                den = ex * dy - ey * dx
                t = (ey * (prv[0] - x1) - ex * (prv[1] - y1)) / den
                out.append((prv[0] + t * dx, prv[1] + t * dy))
            if ic:
                out.append(cur)
        poly = out
        if not poly:
            return Fraction(0)
    s = Fraction(0)
    for j in range(len(poly)):
        x1, y1 = poly[j]
        x2, y2 = poly[(j + 1) % len(poly)]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2


TRI = [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0)]
PENT = [(1.0, 0.0), (3.0, 0.0), (4.0, 2.0), (2.0, 4.0), (0.0, 2.0)]


def test_convex_convex_exact_vs_rational_oracle():
    subjects = [
        [(0.5, 0.5), (3.5, 0.5), (3.5, 3.5), (0.5, 3.5)],
        [(-1.0, -1.0), (5.0, -1.0), (5.0, 5.0), (-1.0, 5.0)],
        [(2.0, -1.0), (6.0, 3.0), (2.0, 7.0), (-2.0, 3.0)],
        [(10.0, 10.0), (11.0, 10.0), (10.0, 11.0)],  # disjoint
    ]
    for mask in (TRI, PENT):
        ga = GeometryArray.from_pylist([("polygon", [[*s, s[0]]]) for s in subjects])
        out = clip_by_convex(ga, mask)
        areas = K.area(out)
        for i, s in enumerate(subjects):
            exact = float(rational_convex_clip_area(s, mask))
            got = 0.0 if np.isnan(areas[i]) else areas[i]
            assert got == pytest.approx(exact, abs=1e-9), (i, mask[:1])


def test_rect_ring_matches_clip_by_rect():
    """A rectangle ring through the convex path == the dedicated rect path
    (same kept sets; coords may differ by ~ULP on oblique interpolation,
    none here — the rect edges are axis-aligned so results are identical)."""
    rng = np.random.default_rng(3)
    geoms = []
    for _ in range(60):
        c = rng.uniform(-2, 2, 2)
        r = rng.uniform(0.2, 2.0)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        ring = [(c[0] + r * np.cos(a), c[1] + r * np.sin(a)) for a in ang]
        geoms.append(("polygon", [[*ring, ring[0]]]))
    geoms += [("linestring", [tuple(p) for p in rng.uniform(-2, 2, (5, 2))]) for _ in range(20)]
    geoms += [("multipoint", [tuple(p) for p in rng.uniform(-2, 2, (6, 2))]) for _ in range(10)]
    ga = GeometryArray.from_pylist(geoms)
    rect = (-1.0, -0.5, 1.5, 1.0)
    a = clip_by_rect(ga, *rect)
    ring = [(rect[0], rect[1]), (rect[2], rect[1]), (rect[2], rect[3]), (rect[0], rect[3])]
    b = clip_by_convex(ga, ring)
    assert (a.types == b.types).all()
    aa, bb = K.area(a), K.area(b)
    fin = ~np.isnan(aa)
    assert (np.isnan(bb) == ~fin).all()
    np.testing.assert_allclose(aa[fin], bb[fin], rtol=0, atol=1e-12)
    la, lb = K.euclidean_length(a), K.euclidean_length(b)
    fin = ~np.isnan(la)
    np.testing.assert_allclose(la[fin], lb[fin], rtol=0, atol=1e-12)


def test_validation_and_winding():
    ga = GeometryArray.from_pylist([("point", (0.5, 0.5))])
    # either winding accepted, closing duplicate tolerated
    for ring in (TRI, TRI[::-1], [*TRI, TRI[0]]):
        out = clip_by_convex(ga, ring)
        assert K.get_x(out)[0] == 0.5  # point survives unchanged
    with pytest.raises(ValueError, match="not convex"):
        clip_by_convex(ga, [(0, 0), (4, 0), (1, 1), (0, 4)])
    with pytest.raises(ValueError, match="degenerate"):
        clip_by_convex(ga, [(0, 0), (1, 1), (2, 2)])
    with pytest.raises(ValueError, match=">= 3"):
        clip_by_convex(ga, [(0, 0), (1, 1)])


coord = st.floats(-5, 5)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(st.floats(0.3, 3.0), st.floats(-0.45, 0.45)), min_size=4, max_size=10),
    st.tuples(coord, coord),
    st.lists(st.floats(-0.4, 0.4), min_size=3, max_size=8),
    st.floats(0.5, 3.0),
)
def test_convex_clip_properties(polar, center, mask_jit, mask_r):
    """Containment (result inside the mask within 1 ULP-scale eps), area
    monotonicity on star-shaped subjects, idempotence within float noise."""
    k = len(polar)
    jit = np.array([p[1] for p in polar])
    ang = 2.0 * np.pi * (np.arange(k) + 0.5 + jit) / k
    r = np.array([p[0] for p in polar])
    cx, cy = center
    ring = [(cx + ri * np.cos(a), cy + ri * np.sin(a)) for ri, a in zip(r, ang)]
    ga = GeometryArray.from_pylist([("polygon", [[*ring, ring[0]]])])

    m = len(mask_jit)
    mang = 2.0 * np.pi * (np.arange(m) + 0.5 + np.array(mask_jit)) / m
    mask = [(mask_r * np.cos(a), mask_r * np.sin(a)) for a in mang]

    once = clip_by_convex(ga, mask)
    if np.isnan(K.area(once))[0]:
        return
    # containment: every vertex satisfies the mask half-planes (eps-scaled)
    from geopolars_ray.geom.clip import _convex_halfplanes

    A, D = _convex_halfplanes(mask)
    pts = once.coords
    viol = (pts @ A.T - D[None, :]).max()
    assert viol <= 1e-9 * max(1.0, mask_r, np.abs(pts).max())
    # monotone on simple (star-shaped by construction) subjects
    assert K.area(once)[0] <= K.area(ga)[0] + 1e-9
    # idempotence within float noise (no axis snap on oblique edges).
    # A float-noise-scale sliver may legitimately collapse to EMPTY
    # (missing row, NaN area) on the second pass — same tolerance class
    # as the post-first-clip NaN guard above.
    twice = clip_by_convex(once, mask)
    if np.isnan(K.area(twice))[0]:
        assert K.area(once)[0] <= 1e-9
        return
    assert abs(K.area(twice)[0] - K.area(once)[0]) <= 1e-9 * max(1.0, K.area(once)[0])
