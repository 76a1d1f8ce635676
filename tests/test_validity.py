"""Tests: OGC validity (is_valid / is_valid_reason, geom/validity.py)."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray
from geopolars_ray.geom.validity import VALID, is_valid, is_valid_reason


def test_validity_semantics_matrix():
    rows = [
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)]]),
        # bowtie: edges cross at (2,2)
        ("polygon", [[(0., 0.), (4., 4.), (4., 0.), (0., 4.), (0., 0.)]]),
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)],
                     [(1., 1.), (1., 3.), (3., 3.), (3., 1.), (1., 1.)]]),
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)],
                     [(5., 5.), (5., 6.), (6., 6.), (6., 5.), (5., 5.)]]),
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)],
                     [(1., 1.), (1., 3.), (3., 3.), (3., 1.), (1., 1.)],
                     [(1.5, 1.5), (1.5, 2.5), (2.5, 2.5), (2.5, 1.5), (1.5, 1.5)]]),
        # hole touching the shell at ONE vertex is valid
        ("polygon", [[(0., 0.), (2., 0.), (2., 2.), (0., 2.), (0., 0.)],
                     [(0., 0.), (1., 0.5), (0.5, 1.), (0., 0.)]]),
        ("polygon", [[(0., 0.), (1., 0.), (0., 0.)]]),
        # figure-8: vertex (2,0) repeated non-consecutively
        ("polygon", [[(0., 0.), (2., 0.), (4., 0.), (4., 4.), (2., 0.),
                      (0., 4.), (0., 0.)]]),
        ("multipolygon", [[[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)]],
                          [[(1., 1.), (2., 1.), (2., 2.), (1., 2.), (1., 1.)]]]),
        ("multipolygon", [[[(0., 0.), (1., 0.), (1., 1.), (0., 1.), (0., 0.)]],
                          [[(5., 5.), (6., 5.), (6., 6.), (5., 6.), (5., 5.)]]]),
        # a self-crossing LINE is valid (GEOS)
        ("linestring", [(0., 0.), (4., 4.), (4., 0.), (0., 4.)]),
        ("linestring", [(1., 1.), (1., 1.)]),
        ("point", (1., 2.)),
        None,
        # hole vertex touching the INTERIOR of a shell edge: still a valid
        # single-point touch (the probe must not sit on the boundary)
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)],
                     [(2., 0.), (3., 1.), (1., 1.), (2., 0.)]]),
        # shared-edge (collinear overlap) between shell and hole: invalid
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)],
                     [(0., 1.), (0., 3.), (2., 2.), (0., 1.)]]),
    ]
    ga = GeometryArray.from_pylist(rows)
    v = list(is_valid(ga))
    reasons = is_valid_reason(ga)
    expect = [True, False, True, False, False, True, False, False, False,
              True, True, False, True, False, True, False]
    assert v == expect, list(zip(v, expect, reasons))
    assert reasons[0] == VALID
    assert reasons[1].startswith("Self-intersection[")
    assert reasons[3].startswith("Hole lies outside shell[")
    assert reasons[4].startswith("Holes are nested[")
    assert reasons[6].startswith("Too few points")
    assert reasons[7].startswith("Ring Self-intersection[2 0]")
    assert reasons[8].startswith("Nested shells[")
    assert reasons[13] is None


def test_make_valid_fixes_what_is_valid_flags():
    """Round-trip property: every invalid-polygonal fixture becomes valid
    after make_valid, and valid fixtures pass through still valid."""
    from geopolars_ray.geom.overlay import make_valid_arrays

    rng = np.random.default_rng(5)
    rows = []
    for _ in range(25):
        # random stars are valid; random closed 6-gons are often bowties
        k = 6
        pts = [(float(x), float(y)) for x, y in rng.uniform(-5, 5, (k, 2))]
        rows.append(("polygon", [pts + [pts[0]]]))
    ga = GeometryArray.from_pylist(rows)
    before = is_valid(ga)
    assert not before.all()  # fixture sanity: some random 6-gons self-cross
    fixed = make_valid_arrays(ga)
    after = is_valid(fixed)
    from geopolars_ray.geom.array import MISSING

    for i in range(len(rows)):
        if fixed.types[i] == MISSING:  # degenerate collapse
            continue
        assert after[i], (i, is_valid_reason(fixed)[i])


def test_is_valid_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import encode_wkb

    rows = [
        ("polygon", [[(0., 0.), (4., 0.), (4., 4.), (0., 4.), (0., 0.)]]),
        ("polygon", [[(0., 0.), (4., 4.), (4., 0.), (0., 4.), (0., 0.)]]),
    ]
    t = pa.table({"geometry": encode_wkb(GeometryArray.from_pylist(rows)),
                  "rid": pa.array([0, 1])})
    out = GeoDataset(ray.data.from_arrow(t)).is_valid().is_valid_reason().dataset.take_all()
    by = {r["rid"]: r for r in out}
    assert by[0]["is_valid"] and by[0]["is_valid_reason"] == VALID
    assert not by[1]["is_valid"] and "Self-intersection" in by[1]["is_valid_reason"]


def test_overlay_outputs_always_valid():
    """Engine invariant: every boolean_op output is a VALID geometry
    (pinched figure-8 rings from 4-valent crossing nodes must be split
    into minimal loops by the tracer)."""
    from geopolars_ray.geom.array import MISSING
    from geopolars_ray.geom.overlay import boolean_op

    def star(cx, cy, k, r0, r1, rng):
        pts = []
        for j in range(2 * k):
            a = np.pi * j / k + rng.uniform(0, 0.2)
            r = r0 if j % 2 else r1
            pts.append((cx + r * np.cos(a), cy + r * np.sin(a)))
        pts.append(pts[0])
        return ("polygon", [pts])

    rng = np.random.default_rng(17)
    for _ in range(30):
        a = star(rng.uniform(-1, 1), rng.uniform(-1, 1), int(rng.integers(4, 9)), 0.5, 2.0, rng)
        b = star(rng.uniform(-1, 1), rng.uniform(-1, 1), int(rng.integers(4, 9)), 0.5, 2.0, rng)
        for op in ("intersection", "union", "difference", "symmetric_difference"):
            res = boolean_op(a, b, op)
            if res is None:
                continue
            ga = GeometryArray.from_pylist([res])
            if ga.types[0] == MISSING:
                continue
            assert is_valid(ga)[0], (op, is_valid_reason(ga)[0])


def test_ring_t_junction_self_touch_invalid():
    """Regression: a ring vertex lying on the interior of a non-incident
    edge of the SAME ring (T-junction pinch) is a Ring Self-intersection
    — the arrangement check alone cannot see it (no new vertex, no
    multiplicity)."""
    tj = ("polygon", [[(0., 0.), (4., 0.), (4., 2.), (2., 0.), (0., 2.), (0., 0.)]])
    r = is_valid_reason(GeometryArray.from_pylist([tj]))[0]
    assert r.startswith("Ring Self-intersection")


def test_shell_inside_hole_touching_hole_is_valid():
    """Regression: a second element inside the first element's HOLE,
    touching the hole ring at one vertex, is VALID — the nested-shell
    probe must avoid the whole other element's boundary and classify by
    even-odd over ALL its rings."""
    mp = ("multipolygon", [
        [[(0., 0.), (10., 0.), (10., 10.), (0., 10.), (0., 0.)],
         [(2., 2.), (2., 8.), (8., 8.), (8., 2.), (2., 2.)]],
        [[(5., 8.), (4., 6.), (6., 6.), (5., 8.)]],
    ])
    assert is_valid_reason(GeometryArray.from_pylist([mp]))[0] == VALID
    # and a truly nested shell still flags
    bad = ("multipolygon", [[[(0., 0.), (10., 0.), (10., 10.), (0., 10.), (0., 0.)]],
                            [[(1., 1.), (2., 1.), (2., 2.), (1., 2.), (1., 1.)]]])
    assert is_valid_reason(GeometryArray.from_pylist([bad]))[0].startswith("Nested shells")
