"""Tests: S2 hierarchy, boundaries, edge neighbors, rect covering.

Structural invariants of the published s2geometry cell system: children
partition the parent's Hilbert range exactly, edge-neighbor symmetry
(including across cube-face edges and at face corners), boundary quads
containing the cell center, and covering completeness vs point sampling.
"""

import numpy as np
import pytest

from geopolars_ray.geom import s2


def _sample(n=500, seed=5, level=12):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return lon, lat, s2.s2_cell_id(lon, lat, level)


def test_children_partition_hilbert_range():
    _, _, ids = _sample()
    ch = s2.cell_to_children(ids)
    assert ch.shape == (len(ids), 4)
    assert (s2.cell_level(ch.ravel()) == 13).all()
    assert (s2.parent_at_level(ch.ravel(), 12).reshape(-1, 4) == ids[:, None]).all()
    lo, hi = s2.cell_id_range(ids)
    clo, chi = (a.reshape(-1, 4) for a in s2.cell_id_range(ch.ravel()))
    assert (clo.min(axis=1) == lo).all() and (chi.max(axis=1) == hi).all()
    # contiguous, non-overlapping in Hilbert order (leaf ids are odd, so
    # adjacent sibling ranges abut with a +2 step between range endpoints)
    srt = np.sort(ch, axis=1)
    slo, shi = (a.reshape(-1, 4) for a in s2.cell_id_range(srt.ravel()))
    assert (slo[:, 1:] == shi[:, :-1] + np.uint64(2)).all()
    assert s2.cell_contains(ids, ch[:, 0]).all()
    with pytest.raises(ValueError, match="leaf"):
        s2.cell_to_children(s2.s2_cell_id(np.array([1.0]), np.array([1.0]), 30))


def test_edge_neighbors_symmetric_across_faces():
    _, _, ids = _sample(n=150, level=10)
    nb = s2.edge_neighbors(ids)
    assert (s2.cell_level(nb.ravel()) == 10).all()
    assert (nb != ids[:, None]).all()
    for r in range(len(ids)):
        for c in range(4):
            back = s2.edge_neighbors(np.array([nb[r, c]], np.uint64)).ravel()
            assert ids[r] in back


def test_edge_neighbors_at_cube_corner():
    # (1,1,1)/sqrt(3): the meeting point of faces 0, 1 and 2
    lat_c = np.degrees(np.arctan2(1.0, np.sqrt(2.0)))
    cid = s2.s2_cell_id(np.array([45.0]), np.array([lat_c]), 8)
    nbs = s2.edge_neighbors(cid).ravel()
    assert len(set(nbs.tolist())) == 4
    faces = (nbs >> np.uint64(s2.POS_BITS)).astype(int)
    assert len(set(faces.tolist())) >= 2  # the wrap crossed a face edge
    for x in nbs:
        assert cid[0] in s2.edge_neighbors(np.array([x], np.uint64)).ravel()


def test_boundary_quad_contains_center():
    lon, _, ids = _sample(n=400, level=12)
    keep = np.abs(lon) < 170  # stay off the lon seam for the bbox check
    blon, blat = s2.cell_to_boundary(ids[keep])
    clon, clat = s2.cell_center_lonlat(ids[keep])
    seam = (blon.max(axis=1) - blon.min(axis=1)) > 180.0
    lon_in = (clon >= blon.min(axis=1) - 1e-9) & (clon <= blon.max(axis=1) + 1e-9)
    lat_in = (clat >= blat.min(axis=1) - 1e-9) & (clat <= blat.max(axis=1) + 1e-9)
    assert (lon_in | seam).all() and lat_in.all()
    # corners of adjacent levels nest: parent bbox contains child bbox
    ch = s2.cell_to_children(ids[keep][:50])[:, 0]
    pl, pa = s2.cell_to_boundary(s2.parent_at_level(ch, 12))
    cl, ca = s2.cell_to_boundary(ch)
    pseam = (pl.max(axis=1) - pl.min(axis=1)) > 180.0
    ok = (cl.min(axis=1) >= pl.min(axis=1) - 1e-9) & (cl.max(axis=1) <= pl.max(axis=1) + 1e-9)
    assert (ok | pseam).all()
    assert ((ca.min(axis=1) >= pa.min(axis=1) - 1e-9) & (ca.max(axis=1) <= pa.max(axis=1) + 1e-9)).all()


def test_rect_covering_complete_and_bounded():
    rng = np.random.default_rng(9)
    cov = set(s2.rect_covering(-10.0, 40.0, 5.0, 50.0, level=8).tolist())
    gl = rng.uniform(-10, 5, 4000)
    ga = rng.uniform(40, 50, 4000)
    pts = set(s2.s2_cell_id(gl, ga, 8).tolist())
    assert pts <= cov
    assert len(cov) < 3 * len(pts)  # conservative but not absurdly so
    with pytest.raises(ValueError, match="max_cells"):
        s2.rect_covering(-10.0, 40.0, 5.0, 50.0, level=14, max_cells=100)
    with pytest.raises(ValueError, match="empty"):
        s2.rect_covering(5.0, 40.0, -10.0, 50.0, level=8)


def test_rect_covering_antimeridian_edge():
    # regression: cells whose corners sit at [176, 180] also contain
    # lon == -180 and must be kept when the window starts there
    cov = set(s2.rect_covering(-180.0, -85.0, -140.0, -45.0, level=8).tolist())
    lon = np.full(41, -180.0)
    lat = np.linspace(-85.0, -45.0, 41)
    assert set(s2.s2_cell_id(lon, lat, 8).tolist()) <= cov


def test_polygon_covering_modes_and_completeness():
    rng = np.random.default_rng(21)
    ring = np.array([[0.0, -8.0], [10.0, 0.0], [0.0, 8.0], [-10.0, 0.0], [0.0, -8.0]])
    cov = s2.polygon_covering([ring], level=8, mode="cover")
    cen = s2.polygon_covering([ring], level=8, mode="center")
    assert set(cen.tolist()) <= set(cov.tolist())
    # completeness: the cell of every interior point is in the cover
    u = rng.uniform(-1, 1, (20000, 2)) * [10, 8]
    m = (np.abs(u[:, 0]) / 10 + np.abs(u[:, 1]) / 8) < 1
    assert set(s2.s2_cell_id(u[m, 0], u[m, 1], 8).tolist()) <= set(cov.tolist())
    # center-mode semantics: centers inside
    lo, la = s2.cell_center_lonlat(cen)
    assert ((np.abs(lo) / 10 + np.abs(la) / 8) <= 1 + 1e-9).all()
    # hole support: ring with a hole removes interior cells
    hole = ring * 0.4
    cen_h = s2.polygon_covering([ring, hole], level=8, mode="center")
    lo_h, la_h = s2.cell_center_lonlat(cen_h)
    assert ((np.abs(lo_h) / 4 + np.abs(la_h) / 3.2) >= 1 - 1e-9).all()
    assert len(cen_h) < len(cen)
    with pytest.raises(ValueError, match="max_cells"):
        s2.polygon_covering([ring], level=12, max_cells=50)
    with pytest.raises(ValueError, match="mode"):
        s2.polygon_covering([ring], level=8, mode="exact")


def test_compact_cells_round_trip():
    ring = np.array([[0.0, -8.0], [10.0, 0.0], [0.0, 8.0], [-10.0, 0.0], [0.0, -8.0]])
    cen = s2.polygon_covering([ring], level=8, mode="center")
    comp = s2.compact_cells(cen)
    assert len(comp) < len(cen)
    levels = s2.cell_level(comp)
    assert levels.max() <= 8
    # expanding every compacted cell back to level 8 reproduces the set
    exp = []
    for c, lv in zip(comp, levels):
        cur = np.array([c], np.uint64)
        for _ in range(int(lv), 8):
            cur = s2.cell_to_children(cur).ravel()
        exp.append(cur)
    assert (np.sort(np.concatenate(exp)) == np.sort(cen)).all()
    # no complete sibling set survives
    for lv in np.unique(levels):
        lv = int(lv)
        if lv == 0:
            continue
        sub = comp[levels == lv]
        _, cnt = np.unique(s2.parent_at_level(sub, lv - 1), return_counts=True)
        assert (cnt < 4).all()
    assert len(s2.compact_cells(np.array([], np.uint64))) == 0


def test_cell_area_partitions_sphere():
    R = 6371.0088
    sphere = 4.0 * np.pi * R * R
    faces = np.array([(f << s2.POS_BITS) | (1 << (s2.POS_BITS - 1))
                      for f in range(6)], np.uint64)
    cur = faces
    for level in range(4):
        np.testing.assert_allclose(s2.cell_area(cur).sum(), sphere, rtol=1e-12)
        if level < 3:
            cur = s2.cell_to_children(cur).ravel()
    # steradians via radius 1; level-12 cells are ~3-7 km^2
    _, _, ids = _sample(n=200, level=12)
    a = s2.cell_area(ids)
    assert (a > 2.0).all() and (a < 8.0).all()
    np.testing.assert_allclose(s2.cell_area(ids, radius_km=1.0) * R * R, a, rtol=1e-12)
