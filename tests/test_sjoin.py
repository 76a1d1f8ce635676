"""Spatial-join tests: reference golden fixture F5 + broadcast/partitioned joins."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray, encode_wkb
from geopolars_ray.stages.join import spatial_join_table

F5_POINTS = [(0.0, 10.0), (1.0, 1.0), (10.0, 1.0), (1.0, -1.0), (0.0, -10.0),
             (-1.0, -1.0), (-10.0, 0.0), (-1.0, 1.0), (0.0, 10.0)]


def _f5_tables():
    pts = GeometryArray.from_points(
        np.array([p[0] for p in F5_POINTS]), np.array([p[1] for p in F5_POINTS])
    )
    lhs = pa.table(
        {"geometry": encode_wkb(pts), "point_values": pa.array([float(i + 1) for i in range(9)])}
    )
    poly = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)]])]
    )
    rhs = pa.table({"geometry": encode_wkb(poly), "string_col": pa.array(["test"])})
    return lhs, rhs


def test_f5_inner_shape():
    """Golden: inner join is exactly (2, 4); matches are (1,1) and (10,1)
    (`spatial_index.rs:479`)."""
    lhs, rhs = _f5_tables()
    out = spatial_join_table(lhs, rhs, how="inner")
    assert out.shape == (2, 4)
    assert sorted(out["point_values_left"].to_pylist()) == [2.0, 3.0]
    assert out["string_col_right"].to_pylist() == ["test", "test"]


def test_f5_left_shape():
    """Golden: left join keeps all 9 rows (`spatial_index.rs:480`)."""
    lhs, rhs = _f5_tables()
    out = spatial_join_table(lhs, rhs, how="left")
    assert out.shape == (9, 4)
    vals = out["point_values_left"].to_pylist()
    assert sorted(vals) == [float(i + 1) for i in range(9)]
    matched = [s for s in out["string_col_right"].to_pylist() if s is not None]
    assert matched == ["test", "test"]


def test_f5_suffixes():
    """Golden column order/names with custom suffixes (`spatial_index.rs:544-552`)."""
    lhs, rhs = _f5_tables()
    out = spatial_join_table(lhs, rhs, how="inner", l_suffix="_left!", r_suffix="_right!")
    assert out.column_names == [
        "geometry_left!",
        "point_values_left!",
        "geometry_right!",
        "string_col_right!",
    ]


def test_predicate_dispatch_quirks():
    """point⊗polygon ignores the predicate; polygon⊗multipolygon contains=false."""
    lhs, rhs = _f5_tables()
    # contains behaves identically to intersects for point⊗polygon (`:90-96`)
    inner_c = spatial_join_table(lhs, rhs, how="inner", predicate="contains")
    assert inner_c.shape == (2, 4)

    poly = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (30.0, 0.0), (30.0, 30.0), (0.0, 30.0), (0.0, 0.0)]])]
    )
    mpoly = GeometryArray.from_pylist(
        [("multipolygon", [[[(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]]])]
    )
    lt = pa.table({"geometry": encode_wkb(poly), "a": pa.array([1])})
    rt = pa.table({"geometry": encode_wkb(mpoly), "b": pa.array([2])})
    # polygon⊗multipolygon supports only Intersects (`:118-123`)
    assert spatial_join_table(lt, rt, predicate="intersects").num_rows == 1
    assert spatial_join_table(lt, rt, predicate="contains").num_rows == 0


def test_polygon_polygon_contains():
    big = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])]
    )
    small = GeometryArray.from_pylist(
        [("polygon", [[(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]])]
    )
    disjoint = GeometryArray.from_pylist(
        [("polygon", [[(20.0, 20.0), (21.0, 20.0), (21.0, 21.0), (20.0, 21.0), (20.0, 20.0)]])]
    )
    lt = pa.table({"geometry": encode_wkb(big), "a": pa.array([1])})
    assert spatial_join_table(lt, pa.table({"geometry": encode_wkb(small), "b": pa.array([2])}),
                              predicate="contains").num_rows == 1
    assert spatial_join_table(lt, pa.table({"geometry": encode_wkb(disjoint), "b": pa.array([2])}),
                              predicate="contains").num_rows == 0
    # overlapping-but-not-contained intersects
    overlap = GeometryArray.from_pylist(
        [("polygon", [[(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)]])]
    )
    rt = pa.table({"geometry": encode_wkb(overlap), "b": pa.array([2])})
    assert spatial_join_table(lt, rt, predicate="intersects").num_rows == 1
    assert spatial_join_table(lt, rt, predicate="contains").num_rows == 0


def test_line_contains_point():
    line = GeometryArray.from_pylist([("linestring", [(0.0, 0.0), (10.0, 0.0)])])
    pts = GeometryArray.from_points(np.array([5.0, 5.0]), np.array([0.0, 1.0]))
    lt = pa.table({"geometry": encode_wkb(line), "a": pa.array([1])})
    rt = pa.table({"geometry": encode_wkb(pts), "b": pa.array([1, 2])})
    out = spatial_join_table(lt, rt)
    assert out.num_rows == 1
    assert out["b_right"].to_pylist() == [1]


def test_unsupported_join_type():
    lhs, rhs = _f5_tables()
    with pytest.raises(ValueError):
        spatial_join_table(lhs, rhs, how="outer")  # `:200-203`


def test_broadcast_join_dataset(ray_session):
    import ray
    from geopolars_ray.stages.join import broadcast_spatial_join

    rng = np.random.default_rng(11)
    n = 20000
    lon = rng.uniform(-50, 50, n)
    lat = rng.uniform(-50, 50, n)
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat)})
    # two diamond polygons
    polys = GeometryArray.from_pylist(
        [
            ("polygon", [[(-10.0, 0.0), (0.0, -10.0), (10.0, 0.0), (0.0, 10.0), (-10.0, 0.0)]]),
            ("polygon", [[(20.0, 30.0), (30.0, 20.0), (40.0, 30.0), (30.0, 40.0), (20.0, 30.0)]]),
        ]
    )
    admin = pa.table({"admin_id": pa.array(["a", "b"]), "geometry": encode_wkb(polys)})
    ds = ray.data.from_arrow(pts)
    out = broadcast_spatial_join(ds, admin, how="inner", concurrency=2).to_pandas()
    # brute-force expectation
    in_a = (np.abs(lon) + np.abs(lat)) < 10.0
    in_b = (np.abs(lon - 30.0) + np.abs(lat - 30.0)) < 10.0
    expect = {(int(i), "a") for i in np.nonzero(in_a)[0]} | {(int(i), "b") for i in np.nonzero(in_b)[0]}
    got = set(zip(out["pid"].astype(int), out["admin_id"]))
    assert got == expect
    # left join keeps all points
    left = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="left", concurrency=2)
    assert left.count() == n


def test_partitioned_join_matches_broadcast(ray_session):
    import ray
    from geopolars_ray.stages.join import broadcast_spatial_join, partitioned_spatial_join

    rng = np.random.default_rng(12)
    n = 5000
    lon = rng.uniform(-40, 40, n)
    lat = rng.uniform(-40, 40, n)
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat)})
    polys = []
    ids = []
    for k in range(25):
        cx, cy = rng.uniform(-35, 35, 2)
        r = rng.uniform(1, 4)
        polys.append(("polygon", [[(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r), (cx - r, cy)]]))
        ids.append(f"p{k}")
    admin = pa.table(
        {"admin_id": pa.array(ids), "geometry": encode_wkb(GeometryArray.from_pylist(polys))}
    )
    b = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="inner", concurrency=2).to_pandas()
    p = partitioned_spatial_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(admin), cell_deg=10.0, num_partitions=8
    ).to_pandas()
    assert set(zip(b["pid"].astype(int), b["admin_id"])) == set(zip(p["pid"].astype(int), p["admin_id"]))


def test_contains_rejects_proper_crossing():
    """Vertices inside but edges crossing out -> NOT contained (plus-sign vs square)."""
    outer = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])]
    )
    # thin cross whose 4 arms poke out of the square but whose VERTICES near
    # the center are inside... use a bowtie-ish quad with vertices inside but
    # an edge passing outside: concave "C" shape exceeding the boundary
    spike = GeometryArray.from_pylist(
        [("polygon", [[(2.0, 2.0), (15.0, 5.0), (2.0, 8.0), (2.0, 2.0)]])]
    )
    lt = pa.table({"geometry": encode_wkb(outer), "a": pa.array([1])})
    rt = pa.table({"geometry": encode_wkb(spike), "b": pa.array([2])})
    assert spatial_join_table(lt, rt, predicate="contains").num_rows == 0
    assert spatial_join_table(lt, rt, predicate="intersects").num_rows == 1


def test_reversed_operand_orders():
    """Reference matches both operand orders (`spatial_index.rs:90-96,125-135`):
    polygon-left x point-right -> contains; point-left x line-right -> contains."""
    poly = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)]])]
    )
    pts = GeometryArray.from_points(np.array([1.0, 30.0]), np.array([1.0, 1.0]))
    lt = pa.table({"geometry": encode_wkb(poly), "a": pa.array([1])})
    rt = pa.table({"geometry": encode_wkb(pts), "b": pa.array([1, 2])})
    out = spatial_join_table(lt, rt)
    assert out.num_rows == 1
    assert out["b_right"].to_pylist() == [1]
    # predicate is ignored for point/polygon pairs, either order
    assert spatial_join_table(lt, rt, predicate="contains").num_rows == 1

    # point-left x linestring-right
    line = GeometryArray.from_pylist([("linestring", [(0.0, 0.0), (10.0, 0.0)])])
    pl = GeometryArray.from_points(np.array([5.0, 5.0]), np.array([0.0, 1.0]))
    lt2 = pa.table({"geometry": encode_wkb(pl), "a": pa.array([1, 2])})
    rt2 = pa.table({"geometry": encode_wkb(line), "b": pa.array([9])})
    out2 = spatial_join_table(lt2, rt2)
    assert out2.num_rows == 1
    assert out2["a_left"].to_pylist() == [1]


def test_multipolygon_left_point_right():
    mpoly = GeometryArray.from_pylist(
        [("multipolygon", [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]])]
    )
    pts = GeometryArray.from_points(np.array([1.0]), np.array([1.0]))
    lt = pa.table({"geometry": encode_wkb(mpoly), "a": pa.array([1])})
    rt = pa.table({"geometry": encode_wkb(pts), "b": pa.array([5])})
    assert spatial_join_table(lt, rt).num_rows == 1


def test_strtree_slices_are_compact():
    """STR packing tiles items into ~sqrt slices in x THEN y: leaf groups of
    consecutive items must stay spatially compact, not full-width y-bands."""
    from geopolars_ray.geom.strtree import STRTree, _NODE_CAP

    # 1024 unit boxes on a 32x32 grid
    g = np.arange(1024)
    x = (g % 32).astype(np.float64)
    y = (g // 32).astype(np.float64)
    boxes = np.column_stack([x, y, x + 1.0, y + 1.0])
    tree = STRTree(boxes)
    level1 = tree.levels[1]  # parents of leaf entries (groups of 16)
    widths = level1[:, 2] - level1[:, 0]
    # proper STR: each slice spans ~4 grid columns -> node width <= ~6;
    # the degenerate single-slice packing would give full-width (32) bands
    assert widths.max() <= 8.0


def test_within_predicate_flipped_contains():
    """within(l, r) == contains(r, l): a small left polygon inside a big
    right polygon matches under 'within' but NOT under 'contains' (the small
    one does not contain the big one); point-left within polygon-right
    matches (PIP either-order quirk keeps that working for all predicates)."""
    big = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)]])]
    )
    small = GeometryArray.from_pylist(
        [("polygon", [[(5.0, 5.0), (8.0, 5.0), (8.0, 8.0), (5.0, 8.0), (5.0, 5.0)]])]
    )
    lt_small = pa.table({"geometry": encode_wkb(small), "a": pa.array([1])})
    rt_big = pa.table({"geometry": encode_wkb(big), "b": pa.array([2])})
    assert spatial_join_table(lt_small, rt_big, predicate="within").num_rows == 1
    assert spatial_join_table(lt_small, rt_big, predicate="contains").num_rows == 0
    # and the mirror: big within small is false
    lt_big = pa.table({"geometry": encode_wkb(big), "a": pa.array([1])})
    rt_small = pa.table({"geometry": encode_wkb(small), "b": pa.array([2])})
    assert spatial_join_table(lt_big, rt_small, predicate="within").num_rows == 0
    # point within polygon
    pt = GeometryArray.from_points(np.array([6.0]), np.array([6.0]))
    lt_pt = pa.table({"geometry": encode_wkb(pt), "a": pa.array([1])})
    assert spatial_join_table(lt_pt, rt_big, predicate="within").num_rows == 1
    with pytest.raises(ValueError, match="unsupported predicate"):
        spatial_join_table(lt_pt, rt_big, predicate="touches")


def test_broadcast_join_dwithin(ray_session):
    """dwithin predicate: inside OR within d of the boundary, vs brute force
    (diamond polygons have a closed-form L2 distance via per-edge projection
    — the brute oracle just reuses a point-to-segment scan)."""
    import ray
    from geopolars_ray.stages.join import broadcast_spatial_join

    rng = np.random.default_rng(12)
    n = 20000
    lon = rng.uniform(-30, 30, n)
    lat = rng.uniform(-30, 30, n)
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat)})
    ring = [(-10.0, 0.0), (0.0, -10.0), (10.0, 0.0), (0.0, 10.0), (-10.0, 0.0)]
    polys = GeometryArray.from_pylist([("polygon", [ring])])
    admin = pa.table({"admin_id": pa.array(["a"]), "geometry": encode_wkb(polys)})
    d = 3.0
    out = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="inner",
                                 concurrency=2, predicate="dwithin", distance=d).to_pandas()
    got = set(out["pid"].astype(int))

    # brute: inside (L1 diamond) or min point-to-edge distance <= d
    inside = (np.abs(lon) + np.abs(lat)) < 10.0
    R = np.array(ring)
    a, b = R[:-1], R[1:]
    ab = b - a
    L2 = (ab**2).sum(axis=1)
    P = np.column_stack([lon, lat])
    ap = P[:, None, :] - a[None, :, :]
    t = np.clip((ap * ab[None, :, :]).sum(axis=2) / L2[None, :], 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    dmin = np.sqrt(((P[:, None, :] - proj) ** 2).sum(axis=2)).min(axis=1)
    expect = set(np.nonzero(inside | (dmin <= d))[0].astype(int))
    assert got == expect
    # sanity: strictly more matches than plain intersects, none farther than d
    plain = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="inner",
                                   concurrency=2).to_pandas()
    assert len(got) > len(plain)

    import pytest as _pytest
    with _pytest.raises(Exception, match="distance"):
        broadcast_spatial_join(ray.data.from_arrow(pts), admin,
                               predicate="dwithin").take_all()


def test_partitioned_join_dwithin_matches_broadcast(ray_session):
    import ray
    from geopolars_ray.stages.join import broadcast_spatial_join, partitioned_spatial_join

    rng = np.random.default_rng(13)
    n = 8000
    lon = rng.uniform(-40, 40, n)
    lat = rng.uniform(-40, 40, n)
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat)})
    polys = GeometryArray.from_pylist(
        [
            ("polygon", [[(-10.0, 0.0), (0.0, -10.0), (10.0, 0.0), (0.0, 10.0), (-10.0, 0.0)]]),
            ("polygon", [[(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0), (20.0, 20.0)]]),
        ]
    )
    admin = pa.table({"admin_id": pa.array(["a", "b"]), "geometry": encode_wkb(polys)})
    d = 4.0
    b = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="inner", concurrency=2,
                               predicate="dwithin", distance=d).to_pandas()
    p = partitioned_spatial_join(ray.data.from_arrow(pts), ray.data.from_arrow(admin),
                                 cell_deg=8.0, num_partitions=16,
                                 predicate="dwithin", distance=d).to_pandas()
    got_b = set(zip(b["pid"].astype(int), b["admin_id"]))
    got_p = set(zip(p["pid"].astype(int), p["admin_id"]))
    assert got_b == got_p and len(got_b) > 0


def test_partitioned_join_h3_exchange_matches_grid(ray_session):
    """h3_res co-shuffle (canonical H3 covers on the polygon side, one
    latlng_to_cell id per point) must produce the exact same match set as
    the grid exchange and the broadcast join — including polygons far from
    the equator where grid cells distort but H3 cells stay equal-area."""
    import ray
    from geopolars_ray.stages.join import broadcast_spatial_join, partitioned_spatial_join

    rng = np.random.default_rng(21)
    n = 4000
    lon = rng.uniform(-60, 60, n)
    lat = rng.uniform(-75, 75, n)
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat)})
    polys, ids = [], []
    for k in range(20):
        cx = rng.uniform(-55, 55)
        cy = rng.uniform(-70, 70)  # include high-latitude diamonds
        r = rng.uniform(1, 5)
        polys.append(("polygon", [[(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r), (cx - r, cy)]]))
        ids.append(f"p{k}")
    admin = pa.table(
        {"admin_id": pa.array(ids), "geometry": encode_wkb(GeometryArray.from_pylist(polys))}
    )
    b = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="inner", concurrency=2).to_pandas()
    h = partitioned_spatial_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(admin), num_partitions=8, h3_res=3
    ).to_pandas()
    assert set(zip(b["pid"].astype(int), b["admin_id"])) == set(zip(h["pid"].astype(int), h["admin_id"]))
    # dwithin stays grid-only, loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="intersects"):
        partitioned_spatial_join(ray.data.from_arrow(pts), ray.data.from_arrow(admin),
                                 predicate="dwithin", distance=1.0, h3_res=3)


def test_partitioned_join_point_side_geometry_collision(ray_session):
    """A point side that carries its own 'geometry' column (e.g. built by
    from_xy) must not poison the refine: hash_join suffixes the polygon
    geometry to geometry_r and the refine must pick the SUFFIXED (polygon)
    column, not the point WKBs."""
    import ray
    from geopolars_ray.stages.join import partitioned_spatial_join

    rng = np.random.default_rng(3)
    n = 1500
    lon = rng.uniform(-20, 20, n)
    lat = rng.uniform(-20, 20, n)
    pt_geom = encode_wkb(GeometryArray.from_points(lon, lat))
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon),
                    "lat": pa.array(lat), "geometry": pt_geom})
    sq = [("polygon", [[(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0), (-5.0, -5.0)]])]
    admin = pa.table({"admin_id": pa.array(["center"]),
                      "geometry": encode_wkb(GeometryArray.from_pylist(sq))})
    got = partitioned_spatial_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(admin), num_partitions=4
    ).to_pandas()
    want = set(np.nonzero((np.abs(lon) <= 5.0) & (np.abs(lat) <= 5.0))[0].tolist())
    assert set(got["pid"].astype(int)) == want and len(want) > 0
    # the point side's own geometry column survives untouched
    assert "geometry" in got.columns


def test_partitioned_join_s2_exchange_matches_grid(ray_session):
    """s2_level co-shuffle (S2 polygon_covering covers on the polygon side,
    one s2_cell_id per point) must produce the exact same match set as the
    broadcast join — same contract as the H3 exchange."""
    import ray
    from geopolars_ray.stages.join import broadcast_spatial_join, partitioned_spatial_join

    rng = np.random.default_rng(23)
    n = 4000
    lon = rng.uniform(-60, 60, n)
    lat = rng.uniform(-75, 75, n)
    pts = pa.table({"pid": pa.array(np.arange(n)), "lon": pa.array(lon), "lat": pa.array(lat)})
    polys, ids = [], []
    for k in range(20):
        cx = rng.uniform(-55, 55)
        cy = rng.uniform(-70, 70)
        r = rng.uniform(1, 5)
        polys.append(("polygon", [[(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r), (cx - r, cy)]]))
        ids.append(f"p{k}")
    admin = pa.table(
        {"admin_id": pa.array(ids), "geometry": encode_wkb(GeometryArray.from_pylist(polys))}
    )
    b = broadcast_spatial_join(ray.data.from_arrow(pts), admin, how="inner", concurrency=2).to_pandas()
    s = partitioned_spatial_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(admin), num_partitions=8, s2_level=6
    ).to_pandas()
    assert set(zip(b["pid"].astype(int), b["admin_id"])) == set(zip(s["pid"].astype(int), s["admin_id"]))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mutually exclusive"):
        partitioned_spatial_join(ray.data.from_arrow(pts), ray.data.from_arrow(admin),
                                 h3_res=3, s2_level=6)
    with _pytest.raises(ValueError, match="intersects"):
        partitioned_spatial_join(ray.data.from_arrow(pts), ray.data.from_arrow(admin),
                                 predicate="dwithin", distance=1.0, s2_level=6)
