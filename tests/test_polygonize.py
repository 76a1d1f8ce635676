"""Polygonize (geom/polygonize.py + stages/polygonize.py): GEOS
Polygonizer golden cases (faces, holes, dangles, cut edges), a lattice
determinism/stress case, a randomized face-partition property (faces
tile the covered region: areas sum to the outer hull of the linework's
closed part), and the Ray grouped stage vs the local core.
"""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom.polygonize import polygonize_full, polygonize_geoms


def ring(*pts):
    return ("linearring", list(pts))


def ls(*pts):
    return ("linestring", list(pts))


def poly_area(g):
    """Shoelace over every ring (holes CW subtract automatically)."""
    tot = 0.0
    for r in g[1]:
        s = 0.0
        for i in range(len(r) - 1):
            x1, y1 = r[i]
            x2, y2 = r[i + 1]
            s += x1 * y2 - x2 * y1
        tot += 0.5 * s
    return tot


SQ = ls((0, 0), (2, 0), (2, 2), (0, 2), (0, 0))


# ------------------------------------------------------------- golden cases
def test_square_diagonal_two_triangles():
    polys, dangles, cuts = polygonize_full([SQ, ls((0, 0), (2, 2))])
    assert len(polys) == 2 and not dangles and not cuts
    assert all(abs(poly_area(p) - 2.0) < 1e-12 for p in polys)
    # shells closed and CCW
    for p in polys:
        assert p[1][0][0] == p[1][0][-1]


def test_concentric_squares_annulus_plus_inner():
    outer = ring((0, 0), (4, 0), (4, 4), (0, 4))
    inner = ring((1, 1), (3, 1), (3, 3), (1, 3))
    polys, _, _ = polygonize_full([outer, inner])
    assert len(polys) == 2
    by_rings = sorted(polys, key=lambda p: len(p[1]))
    assert len(by_rings[0][1]) == 1 and abs(poly_area(by_rings[0]) - 4.0) < 1e-12
    assert len(by_rings[1][1]) == 2 and abs(poly_area(by_rings[1]) - 12.0) < 1e-12


def test_two_side_by_side_holes_chain_to_shell():
    big = ring((0, 0), (10, 0), (10, 4), (0, 4))
    h1 = ring((1, 1), (3, 1), (3, 3), (1, 3))
    h2 = ring((5, 1), (7, 1), (7, 3), (5, 3))
    polys, _, _ = polygonize_full([big, h1, h2])
    assert sorted(len(p[1]) for p in polys) == [1, 1, 3]
    shell3 = next(p for p in polys if len(p[1]) == 3)
    assert abs(poly_area(shell3) - (40 - 8)) < 1e-12


def test_dangle_removed_and_reported():
    polys, dangles, cuts = polygonize_full([SQ, ls((2, 2), (5, 5))])
    assert len(polys) == 1 and not cuts
    assert dangles == [("linestring", [(2.0, 2.0), (5.0, 5.0)])]


def test_cut_edge_bridge_between_squares():
    sq2 = ls((5, 0), (7, 0), (7, 2), (5, 2), (5, 0))
    polys, dangles, cuts = polygonize_full([SQ, sq2, ls((2, 1), (5, 1))])
    assert len(polys) == 2 and not dangles
    assert cuts == [("linestring", [(2.0, 1.0), (5.0, 1.0)])]
    assert all(abs(poly_area(p) - 4.0) < 1e-12 for p in polys)


def test_open_crossing_lines_yield_nothing():
    polys, dangles, cuts = polygonize_full(
        [ls((0, 0), (2, 2)), ls((0, 2), (2, 0))])
    assert polys == [] and len(dangles) == 4 and cuts == []


def test_figure_eight_shared_corner():
    a = ring((0, 0), (1, 0), (1, 1), (0, 1))
    b = ring((1, 1), (2, 1), (2, 2), (1, 2))
    polys, _, _ = polygonize_full([a, b])
    assert len(polys) == 2
    assert all(abs(poly_area(p) - 1.0) < 1e-12 for p in polys)


def test_duplicate_lines_collapse():
    assert len(polygonize_geoms([SQ, SQ])) == 1


def test_multilinestring_input_and_nulls():
    ml = ("multilinestring", [[(0, 0), (2, 0), (2, 2)], [(2, 2), (0, 2), (0, 0)]])
    polys = polygonize_geoms([ml, None])
    assert len(polys) == 1 and abs(poly_area(polys[0]) - 4.0) < 1e-12


def test_polygon_input_rejected():
    with pytest.raises(TypeError, match="linework"):
        polygonize_geoms([("polygon", [[(0, 0), (1, 0), (1, 1)]])])


def test_crossing_lines_noded_into_faces():
    # square 0..2 with a horizontal and a vertical midline -> 4 unit faces
    h = [ls((0, y), (2, y)) for y in (0, 1, 2)]
    v = [ls((x, 0), (x, 2)) for x in (0, 1, 2)]
    polys, _, _ = polygonize_full(h + v)
    assert len(polys) == 4
    assert all(abs(poly_area(p) - 1.0) < 1e-12 for p in polys)


# ------------------------------------------------------ lattice determinism
def test_lattice_stress_and_determinism():
    n = 8
    lines = [ls((0, y), (n, y)) for y in range(n + 1)]
    lines += [ls((x, 0), (x, n)) for x in range(n + 1)]
    a = polygonize_geoms(lines)
    b = polygonize_geoms(list(reversed(lines)))
    assert len(a) == n * n
    assert a == b  # face order + coords independent of input order
    assert abs(sum(poly_area(p) for p in a) - n * n) < 1e-9


# ------------------------------------------------------- randomized property
def test_random_chords_tile_the_disk():
    """Random chords of a convex ring partition it: face areas must sum
    to the ring's area (faces tile, no overlap, no gap)."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        m = 12
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        pts = [(float(np.cos(a)), float(np.sin(a))) for a in ang]
        hull_area = 0.0
        for i in range(m):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % m]
            hull_area += 0.5 * (x1 * y2 - x2 * y1)
        lines = [ring(*pts)]
        for _ in range(6):  # chords between random hull vertices
            i, j = rng.choice(m, size=2, replace=False)
            lines.append(ls(pts[int(i)], pts[int(j)]))
        polys, dangles, cuts = polygonize_full(lines)
        tot = sum(poly_area(p) for p in polys)
        assert abs(tot - hull_area) < 1e-9, (trial, tot, hull_area)
        assert not dangles and not cuts


# ----------------------------------------------------------------- node
def test_node_splits_self_crossing():
    from geopolars_ray.geom.polygonize import node_lines

    # bowtie path: crossing at (1,1) becomes a node; the closed lobe is
    # chained through its degree-2 corners, the junction stays split
    out = node_lines([ls((0, 0), (2, 2), (2, 0), (0, 2))])
    assert out[0] == "multilinestring"
    assert sorted(len(p) for p in out[1]) == [2, 2, 4]
    assert all(p[0] == (1.0, 1.0) or p[-1] == (1.0, 1.0) for p in out[1])


def test_node_collapses_duplicates_and_passes_simple():
    from geopolars_ray.geom.polygonize import node_lines

    assert node_lines([ls((0, 0), (1, 0)), ls((0, 0), (1, 0))]) == \
        ("linestring", [(0.0, 0.0), (1.0, 0.0)])
    assert node_lines([ls((0, 0), (1, 0), (2, 1))]) == \
        ("linestring", [(0.0, 0.0), (1.0, 0.0), (2.0, 1.0)])


def test_node_kernel_via_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

    geoms = [("linestring", [(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)]),
             None]
    t = pa.table({"geometry": encode_wkb(GeometryArray.from_pylist(geoms)),
                  "rid": pa.array([0, 1])})
    out = pa.concat_tables(ray.get(
        GeoDataset(ray.data.from_arrow(t)).node().dataset.to_arrow_refs()))
    got = dict(zip(out["rid"].to_pylist(), decode_wkb(out["geometry"]).to_pylist()))
    assert got[1] is None
    assert got[0][0] == "multilinestring" and len(got[0][1]) == 3


# ------------------------------------------------------------- Ray stage
def test_polygonize_by_matches_local(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

    keys, geoms = [], []
    # key 0: square + diagonal; key 1: concentric squares; key 2: dangle only
    keys += [0, 0]
    geoms += [SQ, ls((0, 0), (2, 2))]
    keys += [1, 1]
    geoms += [ring((0, 0), (4, 0), (4, 4), (0, 4)),
              ring((1, 1), (3, 1), (3, 3), (1, 3))]
    keys += [2]
    geoms += [ls((0, 0), (9, 9))]
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "geometry": encode_wkb(GeometryArray.from_pylist(geoms))})
    out = (GeoDataset(ray.data.from_arrow(t))
           .polygonize("k", num_partitions=4).dataset)
    tbl = pa.concat_tables(
        [x for x in ray.get(out.to_arrow_refs()) if x.num_rows])
    rows = sorted(zip(tbl["k"].to_pylist(), tbl["face_id"].to_pylist()))
    assert rows == [(0, 0), (0, 1), (1, 0), (1, 1)]  # key 2: no faces
    got = {(k, f): g for k, f, g in zip(
        tbl["k"].to_pylist(), tbl["face_id"].to_pylist(),
        decode_wkb(tbl["geometry"]).to_pylist())}
    for k, lines in ((0, geoms[0:2]), (1, geoms[2:4])):
        for fid, want in enumerate(polygonize_geoms(lines)):
            assert got[(k, fid)] == want


# ---------------------------------------------------------- shared_paths
def test_shared_paths_directions():
    from geopolars_ray.geom.polygonize import shared_paths_pair

    a = ("linestring", [(0, 0), (10, 0)])
    same, opp = shared_paths_pair(a, ("linestring", [(3, 0), (7, 0), (7, 5)]))
    assert same == ("multilinestring", [[(3.0, 0.0), (7.0, 0.0)]]) and opp is None
    same, opp = shared_paths_pair(a, ("linestring", [(7, 0), (3, 0)]))
    assert same is None and opp == ("multilinestring", [[(3.0, 0.0), (7.0, 0.0)]])
    assert shared_paths_pair(a, ("linestring", [(5, -1), (5, 1)])) == (None, None)
    same, opp = shared_paths_pair(
        a, ("multilinestring", [[(1, 0), (2, 0)], [(9, 0), (8, 0)]]))
    assert same == ("multilinestring", [[(1.0, 0.0), (2.0, 0.0)]])
    assert opp == ("multilinestring", [[(8.0, 0.0), (9.0, 0.0)]])


def test_shared_paths_merges_chains():
    from geopolars_ray.geom.polygonize import shared_paths_pair

    # B retraces A in two abutting pieces -> ONE merged chain
    a = ("linestring", [(0, 0), (4, 0), (8, 0)])
    b = ("multilinestring", [[(1, 0), (4, 0)], [(4, 0), (6, 0)]])
    same, opp = shared_paths_pair(a, b)
    assert opp is None
    assert same == ("multilinestring", [[(1.0, 0.0), (4.0, 0.0), (6.0, 0.0)]])


def test_shared_paths_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

    t = pa.table({
        "geometry": encode_wkb(GeometryArray.from_pylist(
            [("linestring", [(0.0, 0.0), (10.0, 0.0)])] * 2)),
        "other": encode_wkb(GeometryArray.from_pylist(
            [("linestring", [(2.0, 0.0), (5.0, 0.0)]),
             ("linestring", [(5.0, 0.0), (2.0, 0.0)])])),
    })
    out = pa.concat_tables(ray.get(
        GeoDataset(ray.data.from_arrow(t)).shared_paths("other")
        .dataset.to_arrow_refs()))
    same = decode_wkb(out["shared_same"]).to_pylist()
    opp = decode_wkb(out["shared_opposite"]).to_pylist()
    assert same[0] == ("multilinestring", [[(2.0, 0.0), (5.0, 0.0)]]) and opp[0] is None
    assert same[1] is None and opp[1] == ("multilinestring", [[(2.0, 0.0), (5.0, 0.0)]])
