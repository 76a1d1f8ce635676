"""Conic / azimuthal / cylindrical CRS additions (r4): ellipsoidal Mercator,
Lambert conformal conic, Albers equal-area, polar stereographic.

Verification strategy (module docstring `geom/crs.py`): no PROJ exists in the
sandbox, so each projection is pinned by its DEFINING invariant, measured by
finite differences on the WGS84 ellipsoid —

- conformal projections (merc, lcc, stere): meridian scale h == parallel
  scale k at every sampled point, and k == 1 exactly on the standard
  parallels / true-scale parallel;
- equal-area projections (aea): |d(x,y)/d(lam,phi)| == M*N*cos(phi), the
  ellipsoid surface element, at every sampled point;
- every projection: forward∘inverse == identity to <1e-6 deg over its
  published domain, and the false origin maps (lon_0, lat_0) -> (x_0, y_0)
  exactly (pins the EPSG parameter tables);
- one EXTERNAL anchor: the EPSG Guidance Note 7-2 worked example for Polar
  Stereographic variant B (lat_ts=-71, lon_0=70, FE=FN=6e6; 75S 120E ->
  E 7255380.79 N 7053389.56), which transitively anchors the shared
  _t_conf/_m_par/_phi_from_t helpers used by merc and lcc as well.
"""

import numpy as np
import pytest

from geopolars_ray.geom import crs as C

A, E2 = C.WGS84_A, C._E2


def _MN(lat):
    s = np.sin(np.radians(lat))
    W = np.sqrt(1.0 - E2 * s * s)
    return A * (1.0 - E2) / W**3, A / W  # meridian radius M, prime vertical N


def _fd_scales(fwd, lon, lat, d=1e-6):
    """(h, k, area_scale) of a forward projection at one point, by central
    finite differences; h/k are distance scale along meridian/parallel
    relative to true ellipsoid distance, area_scale is |Jacobian| over the
    ellipsoid surface element."""
    x1, y1 = fwd(np.array([lon]), np.array([lat - d]))
    x2, y2 = fwd(np.array([lon]), np.array([lat + d]))
    xp1, yp1 = fwd(np.array([lon - d]), np.array([lat]))
    xp2, yp2 = fwd(np.array([lon + d]), np.array([lat]))
    M, N = _MN(lat)
    dphi = dlam = np.radians(2 * d)
    h = float(np.hypot(x2 - x1, y2 - y1)[0]) / (M * dphi)
    k = float(np.hypot(xp2 - xp1, yp2 - yp1)[0]) / (N * np.cos(np.radians(lat)) * dlam)
    jac = float(((x2 - x1) * (yp2 - yp1) - (y2 - y1) * (xp2 - xp1))[0]) / (dphi * dlam)
    return h, k, abs(jac) / (M * N * np.cos(np.radians(lat)))


def test_mercator_3395_invariants():
    fwd = lambda lo, la: C.mercator_forward(lo, la)
    # natural origin and the exact closed form x = a*lam
    x, y = fwd(np.array([0.0]), np.array([0.0]))
    assert x[0] == 0.0 and y[0] == 0.0
    x, _ = fwd(np.array([90.0]), np.array([10.0]))
    np.testing.assert_allclose(x[0], A * np.pi / 2.0, rtol=1e-15)
    # conformal at every sampled latitude; k = 1 on the equator
    for lat in (0.0, 20.0, 45.0, 70.0, -60.0):
        h, k, _ = _fd_scales(fwd, 10.0, lat)
        assert abs(h - k) < 1e-6
    _, k0, _ = _fd_scales(fwd, 10.0, 0.0)
    assert abs(k0 - 1.0) < 1e-6
    # ellipsoidal y differs from spherical EPSG:3857 by ~0.5% at 45N
    y5 = fwd(np.array([0.0]), np.array([45.0]))[1][0]
    y7 = C.lonlat_to_webmercator(np.array([0.0]), np.array([45.0]))[1][0]
    assert 0.992 < y5 / y7 < 0.997
    # round-trip
    rng = np.random.default_rng(0)
    lon = rng.uniform(-179.0, 179.0, 4000)
    lat = rng.uniform(-84.0, 84.0, 4000)
    X, Y = fwd(lon, lat)
    lon2, lat2 = C.mercator_inverse(X, Y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # only the exact poles clamp to finite y; high latitudes are NOT
    # squeezed into the WebMercator square (review: 86N must project true)
    _, yp = fwd(np.array([0.0]), np.array([90.0]))
    assert np.isfinite(yp[0])
    lon89, lat89 = C.mercator_inverse(*fwd(np.array([0.0]), np.array([89.0])))
    assert abs(lat89[0] - 89.0) < 1e-9
    y86 = fwd(np.array([0.0]), np.array([86.0]))[1][0]
    y8505 = fwd(np.array([0.0]), np.array([85.051128779806604]))[1][0]
    assert y86 > y8505 + 1e6  # ~1,300 km taller, not clamped equal


def test_lcc_2154_invariants():
    p = dict(lon0=3.0, lat0=46.5, lat1=49.0, lat2=44.0, x0=700_000.0, y0=6_600_000.0)
    fwd = lambda lo, la: C.lcc_forward(lo, la, p["lon0"], p["lat0"], p["lat1"], p["lat2"], p["x0"], p["y0"])
    # false origin exact
    x, y = fwd(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700_000.0) < 1e-6 and abs(y[0] - 6_600_000.0) < 1e-5
    # scale is 1 on BOTH standard parallels and the projection is conformal
    for lat in (44.0, 49.0):
        h, k, _ = _fd_scales(fwd, 2.0, lat)
        assert abs(k - 1.0) < 1e-6 and abs(h - k) < 1e-6
    for lat in (42.0, 46.5, 51.0):
        h, k, _ = _fd_scales(fwd, 5.0, lat)
        assert abs(h - k) < 1e-6
        assert k > 1.0 - 2e-3  # secant cone: k >= sec-of-SPs minimum ~0.999
    # coarse real-world sanity: Paris city center in Lambert-93
    x, y = fwd(np.array([2.3522]), np.array([48.8566]))
    assert 650_000 < x[0] < 655_000 and 6_859_000 < y[0] < 6_865_000
    # round-trip over the published domain
    rng = np.random.default_rng(1)
    lon = rng.uniform(-5.0, 10.0, 4000)
    lat = rng.uniform(41.0, 52.0, 4000)
    X, Y = fwd(lon, lat)
    lon2, lat2 = C.lcc_inverse(X, Y, p["lon0"], p["lat0"], p["lat1"], p["lat2"], p["x0"], p["y0"])
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_lcc_southern_cone_and_1sp():
    # southern hemisphere => n < 0: exercises the sign handling in the inverse
    fwd = lambda lo, la: C.lcc_forward(lo, la, 140.0, -37.0, -36.0, -38.0)
    rng = np.random.default_rng(2)
    lon = rng.uniform(135.0, 145.0, 2000)
    lat = rng.uniform(-42.0, -33.0, 2000)
    X, Y = fwd(lon, lat)
    lon2, lat2 = C.lcc_inverse(X, Y, 140.0, -37.0, -36.0, -38.0)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    h, k, _ = _fd_scales(fwd, 140.0, -36.0)
    assert abs(k - 1.0) < 1e-6 and abs(h - k) < 1e-6
    # 1SP (lat_1 == lat_2) with k_0: tangent cone, scale k_0 on the SP
    f1 = lambda lo, la: C.lcc_forward(lo, la, 0.0, 45.0, 45.0, 45.0, k0=0.99)
    h, k, _ = _fd_scales(f1, 1.0, 45.0)
    assert abs(k - 0.99) < 1e-6 and abs(h - k) < 1e-6
    X, Y = f1(np.array([3.0]), np.array([47.0]))
    lon2, lat2 = C.lcc_inverse(X, Y, 0.0, 45.0, 45.0, 45.0, k0=0.99)
    assert abs(lon2[0] - 3.0) < 1e-9 and abs(lat2[0] - 47.0) < 1e-9
    # equator-straddling standard parallels are not a cone: refused loudly
    with pytest.raises(ValueError, match="one side of the equator"):
        C.lcc_forward(np.array([0.0]), np.array([10.0]), 0.0, 0.0, 10.0, -10.0)


def test_aea_5070_invariants():
    p = (-96.0, 23.0, 29.5, 45.5)
    fwd = lambda lo, la: C.aea_forward(lo, la, *p)
    x, y = fwd(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-5
    # the DEFINING property: area scale == 1 everywhere (to FD accuracy)
    for lon, lat in ((-120.0, 35.0), (-96.0, 23.0), (-75.0, 45.0), (-100.0, 49.0)):
        _, k, area = _fd_scales(fwd, lon, lat)
        assert abs(area - 1.0) < 1e-6
    # parallel scale 1 exactly on both standard parallels
    for lat in (29.5, 45.5):
        _, k, _ = _fd_scales(fwd, -96.0, lat)
        assert abs(k - 1.0) < 1e-6
    rng = np.random.default_rng(3)
    lon = rng.uniform(-125.0, -65.0, 4000)
    lat = rng.uniform(24.0, 50.0, 4000)
    X, Y = fwd(lon, lat)
    lon2, lat2 = C.aea_inverse(X, Y, *p)
    assert np.abs(lon2 - lon).max() < 1e-9
    # lat limited by the authalic-latitude series truncation (~1e-8 deg)
    assert np.abs(lat2 - lat).max() < 1e-7
    with pytest.raises(ValueError, match="distinct standard parallels"):
        C.aea_forward(np.array([0.0]), np.array([40.0]), 0.0, 0.0, 40.0, 40.0)


def test_polar_stereographic_epsg_gn72_anchor():
    """EPSG Guidance Note 7-2, Polar Stereographic variant B worked example
    (WGS84 / Australian Antarctic): lat_ts=-71, lon_0=70, FE=FN=6000000;
    input 75S 120E -> E 7255380.79, N 7053389.56. Anchors _t_conf/_m_par/
    _phi_from_t externally (shared with merc and lcc)."""
    x, y = C.stere_polar_forward(np.array([120.0]), np.array([-75.0]), 70.0, -71.0, True,
                                 6_000_000.0, 6_000_000.0)
    assert abs(x[0] - 7_255_380.79) < 0.01
    assert abs(y[0] - 7_053_389.56) < 0.01
    lon2, lat2 = C.stere_polar_inverse(np.array([7_255_380.79]), np.array([7_053_389.56]),
                                       70.0, -71.0, True, 6_000_000.0, 6_000_000.0)
    assert abs(lon2[0] - 120.0) < 1e-6 and abs(lat2[0] + 75.0) < 1e-6


def test_polar_stereographic_3413_3031():
    # north (EPSG:3413): pole -> (0,0); k = 1 on the true-scale parallel; conformal
    f_n = lambda lo, la: C.stere_polar_forward(lo, la, -45.0, 70.0, False)
    x, y = f_n(np.array([17.0]), np.array([90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    for lat in (60.0, 70.0, 85.0):
        h, k, _ = _fd_scales(f_n, -30.0, lat)
        assert abs(h - k) < 1e-6
    _, k, _ = _fd_scales(f_n, -30.0, 70.0)
    assert abs(k - 1.0) < 1e-6
    # a point on the central meridian lies on the -y axis (grid convention)
    x, y = f_n(np.array([-45.0]), np.array([70.0]))
    assert abs(x[0]) < 1e-6 and y[0] < -2_000_000
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180.0, 180.0, 3000)
    lat = rng.uniform(50.0, 89.99, 3000)
    X, Y = f_n(lon, lat)
    lon2, lat2 = C.stere_polar_inverse(X, Y, -45.0, 70.0, False)
    assert np.abs((lon2 - lon + 180.0) % 360.0 - 180.0).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # south (EPSG:3031): central-meridian point has POSITIVE y (toward lon_0)
    f_s = lambda lo, la: C.stere_polar_forward(lo, la, 0.0, -71.0, True)
    x, y = f_s(np.array([0.0]), np.array([-71.0]))
    assert abs(x[0]) < 1e-6 and y[0] > 2_000_000
    X, Y = f_s(lon, -lat)
    lon2, lat2 = C.stere_polar_inverse(X, Y, 0.0, -71.0, True)
    assert np.abs((lon2 - lon + 180.0) % 360.0 - 180.0).max() < 1e-9
    assert np.abs(lat2 + lat).max() < 1e-9


def test_stere_k0_at_pole_variant():
    # UPS-style +lat_0=90 +k_0=0.994 (variant A): scale at the pole == k_0
    fwd = lambda lo, la: C.stere_polar_forward(lo, la, 0.0, 90.0, False, k0=0.994)
    h, k, _ = _fd_scales(fwd, 10.0, 89.99)
    assert abs(k - 0.994) < 1e-4 and abs(h - k) < 1e-6
    X, Y = fwd(np.array([33.0]), np.array([80.0]))
    lon2, lat2 = C.stere_polar_inverse(X, Y, 0.0, 90.0, False, k0=0.994)
    assert abs(lon2[0] - 33.0) < 1e-9 and abs(lat2[0] - 80.0) < 1e-9


def test_oblique_stereographic_sterea():
    """EPSG Guidance Note 7-2, Oblique Stereographic (method 9809) worked
    example — Amersfoort / RD New on Bessel 1841: lat_0=52°09'22.178\"N,
    lon_0=5°23'15.500\"E, k_0=0.9999079, FE=155000, FN=463000; input
    53°N 6°E -> E 196105.283, N 557057.739. The (a, e) parametrization lets
    the Bessel example anchor the math; the proj-string surface is WGS84."""
    a = 6_377_397.155
    f = 1.0 / 299.1528128
    e = np.sqrt(2.0 * f - f * f)
    lat0 = 52.0 + 9.0 / 60.0 + 22.178 / 3600.0
    lon0 = 5.0 + 23.0 / 60.0 + 15.500 / 3600.0
    x, y = C.stere_oblique_forward(np.array([6.0]), np.array([53.0]), lon0, lat0,
                                   0.9999079, 155_000.0, 463_000.0, a=a, e=e)
    assert abs(x[0] - 196_105.283) < 0.001
    assert abs(y[0] - 557_057.739) < 0.001
    lon2, lat2 = C.stere_oblique_inverse(np.array([196_105.283]), np.array([557_057.739]),
                                         lon0, lat0, 0.9999079, 155_000.0, 463_000.0,
                                         a=a, e=e)
    assert abs(lon2[0] - 6.0) < 1e-8 and abs(lat2[0] - 53.0) < 1e-8

    # WGS84 proj-string surface: conformal (h == k), scale k_0 at the origin,
    # and roundtrip through transform_points
    crs = "+proj=sterea +lat_0=52.15 +lon_0=5.39 +k_0=0.9999079 +x_0=155000 +y_0=463000"
    fwd = lambda lo, la: C.transform_points(lo, la, "EPSG:4326", crs)
    h, k, _ = _fd_scales(fwd, 5.39, 52.15)
    assert abs(k - 0.9999079) < 1e-6 and abs(h - k) < 1e-6
    for lon_s, lat_s in ((7.5, 54.0), (3.0, 50.5)):
        h, k, _ = _fd_scales(fwd, lon_s, lat_s)
        assert abs(h - k) < 1e-6  # conformal away from the origin too
    rng = np.random.default_rng(9)
    lon = rng.uniform(-10.0, 20.0, 3000)
    lat = rng.uniform(40.0, 62.0, 3000)
    X, Y = fwd(lon, lat)
    lon2, lat2 = C.transform_points(X, Y, crs, "EPSG:4326")
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_parse_crs_new_codes_and_pivot():
    assert C.parse_crs("EPSG:3395")["proj"] == "merc"
    assert C.parse_crs("EPSG:2154") == {"proj": "lcc", "lat_0": 46.5, "lon_0": 3.0,
                                        "lat_1": 49.0, "lat_2": 44.0, "x_0": 700_000.0,
                                        "y_0": 6_600_000.0, "k_0": 1.0}
    assert C.parse_crs("EPSG:5070")["proj"] == "aea"
    assert C.parse_crs("EPSG:3413")["south"] is False
    assert C.parse_crs("EPSG:3031")["south"] is True
    # +proj=merc is the ELLIPSOIDAL Mercator (PROJ semantics), not webmerc
    assert C.parse_crs("+proj=merc")["proj"] == "merc"
    assert C.parse_crs("+proj=webmerc")["proj"] == "webmerc"
    s = C.parse_crs("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96")
    assert s["lat_2"] == 45.0 and s["k_0"] == 1.0
    # 1SP default: lat_2 falls back to lat_1
    s = C.parse_crs("+proj=lcc +lat_1=40 +lat_0=40 +lon_0=0 +k_0=0.9999")
    assert s["lat_2"] == 40.0 and s["k_0"] == 0.9999
    # r5: the oblique single-projection aspect is now accepted (stere_ob)
    assert C.parse_crs("+proj=stere +lat_0=52 +lon_0=4")["proj"] == "stere_ob"
    s = C.parse_crs("+proj=sterea +lat_0=52.15 +lon_0=5.38 +k_0=0.9999079 "
                    "+x_0=155000 +y_0=463000")
    assert s["proj"] == "sterea" and s["k_0"] == 0.9999079 and s["y_0"] == 463_000.0
    # generic pivot: UTM 18N -> CONUS Albers -> back, through transform_points
    lon = np.array([-77.03])
    lat = np.array([38.90])
    e, n = C.transform_points(lon, lat, "EPSG:4326", "EPSG:32618")
    x, y = C.transform_points(e, n, "EPSG:32618", "EPSG:5070")
    lon2, lat2 = C.transform_points(x, y, "EPSG:5070", "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_to_crs_geometry_new_projection():
    from geopolars_ray.geom.array import GeometryArray

    ga = GeometryArray.from_points(np.array([2.3522, 5.0]), np.array([48.8566, 44.0]))
    out = C.to_crs(ga, "EPSG:4326", "EPSG:2154")
    back = C.to_crs(out, "EPSG:2154", "EPSG:4326")
    np.testing.assert_allclose(back.coords, ga.coords, atol=1e-8)


def test_aea_southern_cone_epsg3577():
    """EPSG:3577 (Australian Albers): n < 0 exercises the inverse's sign
    handling; same invariants — exact natural origin, k=1 on both (southern)
    standard parallels, area scale 1, round-trip over the continent."""
    spec = C.parse_crs("EPSG:3577")
    assert spec["proj"] == "aea" and spec["lat_1"] == -18.0
    fwd = lambda lo, la: C.aea_forward(lo, la, 132.0, 0.0, -18.0, -36.0)
    x, y = fwd(np.array([132.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-5
    for lat in (-18.0, -36.0):
        _, k, _ = _fd_scales(fwd, 132.0, lat)
        assert abs(k - 1.0) < 1e-6
    for lon, lat in ((115.0, -32.0), (147.0, -42.0), (132.0, -12.0)):
        _, _, area = _fd_scales(fwd, lon, lat)
        assert abs(area - 1.0) < 1e-6
    rng = np.random.default_rng(7)
    lon = rng.uniform(112.0, 154.0, 3000)
    lat = rng.uniform(-44.0, -9.0, 3000)
    X, Y = fwd(lon, lat)
    lon2, lat2 = C.aea_inverse(X, Y, 132.0, 0.0, -18.0, -36.0)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-7
    # Sydney is east of the central meridian and well south: +x, -y
    x, y = C.transform_points(np.array([151.21]), np.array([-33.87]), "EPSG:4326", "EPSG:3577")
    assert x[0] > 1_000_000 and y[0] < -3_000_000


def test_swiss_oblique_mercator_somerc():
    """swisstopo 'Swiss conformal cylindrical projection' rigorous-formulas
    worked example (Rigi, CH1903/LV03 on Bessel 1841): projection centre
    Bern 46°57'08.66"N 7°26'22.50"E, FE 600000, FN 200000; input
    47°03'28.956559233"N 8°29'11.11127154"E -> E 679520.05, N 212273.44."""
    a = 6_377_397.155
    f = 1.0 / 299.1528128
    e = np.sqrt(2.0 * f - f * f)
    lat0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
    lon0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0
    lat = 47.0 + 3.0 / 60.0 + 28.956559233 / 3600.0
    lon = 8.0 + 29.0 / 60.0 + 11.11127154 / 3600.0
    E, N = C.somerc_forward(np.array([lon]), np.array([lat]), lon0, lat0,
                            1.0, 600_000.0, 200_000.0, a=a, e=e)
    assert abs(E[0] - 679_520.05) < 0.001
    assert abs(N[0] - 212_273.44) < 0.002
    lo, la = C.somerc_inverse(E, N, lon0, lat0, 1.0, 600_000.0, 200_000.0, a=a, e=e)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9
    # centre maps exactly to the false origin
    E0, N0 = C.somerc_forward(np.array([lon0]), np.array([lat0]), lon0, lat0,
                              1.0, 600_000.0, 200_000.0, a=a, e=e)
    assert abs(E0[0] - 600_000.0) < 1e-6 and abs(N0[0] - 200_000.0) < 1e-6

    # WGS84 proj-string surface (LV95-shaped): conformal, scale k_0 at the
    # centre, roundtrip through transform_points
    crs = "+proj=somerc +lat_0=46.9524055 +lon_0=7.4395833 +k_0=1 +x_0=2600000 +y_0=1200000"
    fwd = lambda lo, la: C.transform_points(lo, la, "EPSG:4326", crs)
    h, k, _ = _fd_scales(fwd, 7.4395833, 46.9524055)
    assert abs(k - 1.0) < 1e-6 and abs(h - k) < 1e-6
    for lon_s, lat_s in ((9.8, 46.2), (6.1, 47.5)):
        h, k, _ = _fd_scales(fwd, lon_s, lat_s)
        assert abs(h - k) < 1e-6  # conformal away from the centre too
    rng = np.random.default_rng(11)
    lon_r = rng.uniform(5.9, 10.5, 3000)
    lat_r = rng.uniform(45.8, 47.9, 3000)
    X, Y = fwd(lon_r, lat_r)
    lo2, la2 = C.transform_points(X, Y, crs, "EPSG:4326")
    assert np.abs(lo2 - lon_r).max() < 1e-9
    assert np.abs(la2 - lat_r).max() < 1e-9


def test_generic_tmerc():
    """+proj=tmerc = the already-anchored Krüger series + lat_0 origin shift."""
    rng = np.random.default_rng(12)
    lon = rng.uniform(6.5, 11.5, 4000)
    lat = rng.uniform(-80.0, 84.0, 4000)
    # parameter-matched tmerc is bit-identical to UTM zone 32
    e1, n1 = C.utm_forward(lon, lat, 32, True)
    e2, n2 = C.tmerc_forward(lon, lat, 9.0, 0.0, 0.9996, 500_000.0, 0.0)
    assert np.abs(e1 - e2).max() == 0.0 and np.abs(n1 - n2).max() == 0.0
    # OSGB-shaped grid on the WGS84 surface: natural origin -> false origin,
    # conformal with scale k_0 on the central meridian
    crs = "+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 +x_0=400000 +y_0=-100000"
    E, N = C.transform_points(np.array([-2.0]), np.array([49.0]), "EPSG:4326", crs)
    assert abs(E[0] - 400_000.0) < 1e-6 and abs(N[0] + 100_000.0) < 1e-6
    fwd = lambda lo, la: C.transform_points(lo, la, "EPSG:4326", crs)
    h, k, _ = _fd_scales(fwd, -2.0, 53.0)
    assert abs(k - 0.9996012717) < 1e-6 and abs(h - k) < 1e-6
    h, k, _ = _fd_scales(fwd, 0.5, 51.5)  # off-meridian: still conformal
    assert abs(h - k) < 1e-6
    lon_r = np.random.default_rng(13).uniform(-7.5, 2.0, 3000)
    lat_r = np.random.default_rng(14).uniform(49.9, 60.8, 3000)
    X, Y = fwd(lon_r, lat_r)
    lo2, la2 = C.transform_points(X, Y, crs, "EPSG:4326")
    assert np.abs(lo2 - lon_r).max() < 1e-8
    assert np.abs(la2 - lat_r).max() < 1e-8
    s = C.parse_crs(crs)
    assert s["proj"] == "tmerc" and s["k_0"] == 0.9996012717 and s["y_0"] == -100_000.0


def test_eqc_and_cea():
    """eqc (EPSG 1028): y IS the geodesic meridian arc; cea (EPSG 9835):
    exactly equal-area everywhere; EASE-Grid 2.0 (EPSG:6933) width anchor."""
    from geopolars_ray.geom.geodesic import geodesic_inverse_m

    # eqc northing == true meridian distance from the equator (Karney inverse)
    lats = np.array([-80.0, -33.3, 0.0, 12.5, 47.9, 89.0])
    _, y = C.eqc_forward(np.zeros_like(lats), lats)
    m_true = np.where(
        lats == 0.0, 0.0,
        np.sign(lats) * geodesic_inverse_m(np.zeros_like(lats), np.zeros_like(lats),
                                           np.zeros_like(lats), np.abs(lats)))
    assert np.abs(y - m_true).max() < 1e-3  # sub-mm
    # roundtrip + equator scale
    rng = np.random.default_rng(30)
    lon = rng.uniform(-179.0, 179.0, 3000)
    lat = rng.uniform(-89.0, 89.0, 3000)
    X, Y = C.transform_points(lon, lat, "EPSG:4326", "EPSG:4087")
    lo, la = C.transform_points(X, Y, "EPSG:4087", "EPSG:4326")
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-8

    # cea: the area-scale Jacobian is 1 at every sampled point
    crs = "+proj=cea +lat_ts=30 +lon_0=0"
    fwd = lambda lo_, la_: C.transform_points(lo_, la_, "EPSG:4326", crs)
    for lon_s, lat_s in ((0.0, 0.0), (120.0, 55.0), (-60.0, -70.0), (10.0, 30.0)):
        _, _, area_scale = _fd_scales(fwd, lon_s, lat_s)
        assert abs(area_scale - 1.0) < 1e-6, (lon_s, lat_s)
    # EASE-Grid 2.0 published full-map half-width: x(180deg) = 17367530.45 m
    X6, _ = C.transform_points(np.array([180.0 - 1e-12]), np.array([0.0]),
                               "EPSG:4326", "EPSG:6933")
    assert abs(X6[0] - 17_367_530.45) < 0.01
    X2, Y2 = C.transform_points(lon, lat, "EPSG:4326", "EPSG:6933")
    lo2, la2 = C.transform_points(X2, Y2, "EPSG:6933", "EPSG:4326")
    # authalic->geodetic series truncation: ~1.5e-8 deg (~1.6 mm)
    assert np.abs(lo2 - lon).max() < 1e-9 and np.abs(la2 - lat).max() < 5e-8


# ---------------------------------------------------------------- r5: datums


def test_osgb36_tmerc_airy_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' worked
    example (projection step on Airy 1830, no datum shift): OSGB36
    geodetic 52°39'27.2531\"N 1°43'4.5177\"E -> E 651409.903 N 313177.270.
    Pins the ellipsoid-parametrized Krüger series to the published
    milli-metre table."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    grid = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy")
    e, n = C.transform_points([lon], [lat], "+proj=longlat +ellps=airy", grid)
    assert abs(e[0] - 651409.903) < 2e-3
    assert abs(n[0] - 313177.270) < 2e-3
    lon2, lat2 = C.transform_points(e, n, grid, "+proj=longlat +ellps=airy")
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


def test_epsg27700_helmert_datum_step():
    """EPSG:27700 carries the published OSGB36 Helmert set. Anchors:
    (a) the WGS84 prime meridian at Greenwich sits ~5.3\" EAST of the
    OSGB36 zero meridian (the documented ~102 m Greenwich offset) — our
    single-set Helmert must land within ~1\" of it; (b) mm round-trips;
    (c) the datum step moves grid coords 50-180 m vs the naive
    projection-only result (GN7-2's documented shift magnitude)."""
    # (a) transit-circle longitude anchor
    lon, lat = C.transform_points([-5.3101 / 3600], [51.4769],
                                  "EPSG:4326", "+proj=longlat +datum=OSGB36")
    assert abs(lon[0]) * 3600 < 1.0, lon[0] * 3600
    # (b) round-trip
    e, n = C.transform_points([-1.5, -4.0], [52.5, 56.0], "EPSG:4326", "EPSG:27700")
    lon2, lat2 = C.transform_points(e, n, "EPSG:27700", "EPSG:4326")
    assert np.allclose(lon2, [-1.5, -4.0], atol=1e-8)
    assert np.allclose(lat2, [52.5, 56.0], atol=1e-8)
    # (c) shift magnitude vs projection-only (same WGS84 lon/lat fed in)
    grid = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy")
    e0, n0 = C.transform_points([-1.5], [52.5], "+proj=longlat +ellps=airy", grid)
    d = float(np.hypot(e[0] - e0[0], n[0] - n0[0]))
    assert 50.0 < d < 180.0, d


def test_swiss_lv03_lv95_swisstopo_anchor():
    """swisstopo's published example (approximate-formula doc):
    LV03 (700000, 100000) <-> WGS84 46°02'38.87\"N 8°43'49.79\"E; the
    rigorous somerc + granit87 translations must land within ~0.5 m.
    EPSG:2056 (LV95) is the same frame shifted by (+2,000,000 /
    +1,000,000)."""
    lon, lat = C.transform_points([700000.0], [100000.0], "EPSG:21781", "EPSG:4326")
    assert abs(lon[0] - (8 + 43 / 60 + 49.79 / 3600)) * 3600 < 0.03
    assert abs(lat[0] - (46 + 2 / 60 + 38.87 / 3600)) * 3600 < 0.03
    e, n = C.transform_points(lon, lat, "EPSG:4326", "EPSG:21781")
    assert abs(e[0] - 700000.0) < 0.5 and abs(n[0] - 100000.0) < 0.5
    e95, n95 = C.transform_points(lon, lat, "EPSG:4326", "EPSG:2056")
    assert abs(e95[0] - 2_700_000.0) < 0.5 and abs(n95[0] - 1_100_000.0) < 0.5


def test_rd_new_28992_origin_and_roundtrip():
    """EPSG:28992 (Amersfoort / RD New): the projection origin (the OLV
    tower) maps to the false origin (155000, 463000) BY DEFINITION when
    fed Amersfoort-datum geodetic coords; WGS84 round-trips are mm."""
    lat0 = 52 + 9 / 60 + 22.178 / 3600
    lon0 = 5 + 23 / 60 + 15.5 / 3600
    e, n = C.transform_points([lon0], [lat0],
                              "+proj=longlat +datum=amersfoort", "EPSG:28992")
    assert abs(e[0] - 155000.0) < 1e-6 and abs(n[0] - 463000.0) < 1e-6
    lon, lat = C.transform_points([5.0], [52.2], "EPSG:4326", "EPSG:28992")
    back = C.transform_points(lon, lat, "EPSG:28992", "EPSG:4326")
    assert abs(back[0][0] - 5.0) < 1e-8 and abs(back[1][0] - 52.2) < 1e-8


def test_helmert_towgs84_projstring_and_guards():
    """+towgs84/+ellps proj-string surface: 3-param pads to 7; the
    EPSG:27700 alias equals the spelled-out proj-string; non-WGS84
    ellipsoids refuse projections whose formulas are not ellipsoid-
    parametrized; unknown datum names fail loudly."""
    full = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 +x_0=400000 "
            "+y_0=-100000 +ellps=airy "
            "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894")
    assert C.parse_crs(full) == C.parse_crs("EPSG:27700")
    # 3-param pad
    spec = C.parse_crs("+proj=longlat +ellps=bessel +towgs84=674.374,15.056,405.346")
    assert spec["datum"]["towgs84"] == (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)
    with pytest.raises(ValueError, match="ellipsoid-parametrized"):
        C.parse_crs("+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +ellps=airy "
                    "+towgs84=1,2,3")
    with pytest.raises(ValueError, match="unknown .datum"):
        C.parse_crs("+proj=longlat +datum=NAD27X")
    # geocentric pivot round-trips to mm through a rotation+scale datum
    lon, lat = np.array([-1.2, 3.4]), np.array([51.2, 47.9])
    d = C.DATUMS["OSGB36"]
    l2, p2 = C.wgs84_to_datum(*C.datum_to_wgs84(lon, lat, d), d)
    assert np.allclose(l2, lon, atol=1e-11) and np.allclose(p2, lat, atol=1e-11)


def test_oblique_stere_snyder_anchor_and_invariants():
    """r5: single-projection oblique stereographic (+proj=stere,
    |lat_0|<90). Snyder's ellipsoid worked example (Clarke 1866,
    k0=0.9999, phi1=40N, lam0=100W; point 30N 90W -> x=971630.8,
    y=-1063049.3), exact round-trip, scale k0 at the origin, and
    sub-meter agreement with the EPSG-9809 double projection near the
    origin (both conformal with scale k0 there)."""
    a, e = 6378206.4, float(np.sqrt(0.00676866))
    x, y = C.stere_ob_forward(np.array([-90.0]), np.array([30.0]),
                              -100.0, 40.0, 0.9999, 0.0, 0.0, a, e)
    assert abs(x[0] - 971630.8) < 0.5 and abs(y[0] + 1063049.3) < 0.5
    lon, lat = C.stere_ob_inverse(x, y, -100.0, 40.0, 0.9999, 0.0, 0.0, a, e)
    assert abs(lon[0] + 90.0) < 1e-9 and abs(lat[0] - 30.0) < 1e-9
    # parse surface: oblique aspect now accepted
    grid = "+proj=stere +lat_0=46 +lon_0=8 +k_0=0.99"
    assert C.parse_crs(grid)["proj"] == "stere_ob"
    x2, y2 = C.transform_points([7.0], [47.0], "EPSG:4326", grid)
    back = C.transform_points(x2, y2, grid, "EPSG:4326")
    assert abs(back[0][0] - 7.0) < 1e-9 and abs(back[1][0] - 47.0) < 1e-9
    # scale at origin == k0 (finite difference along the meridian)
    eps = 1e-6
    y0 = C.transform_points([8.0], [46.0], "EPSG:4326", grid)[1]
    y1 = C.transform_points([8.0], [46.0 + eps], "EPSG:4326", grid)[1]
    e2 = C.WGS84_F * (2 - C.WGS84_F)
    import math
    M = C.WGS84_A * (1 - e2) / (1 - e2 * math.sin(math.radians(46.0)) ** 2) ** 1.5
    assert abs((y1[0] - y0[0]) / (math.radians(eps) * M) - 0.99) < 1e-4
    # mutual anchor vs sterea ~25 km from origin
    xa, ya = C.transform_points([8.3], [46.2], "EPSG:4326",
                                "+proj=sterea +lat_0=46 +lon_0=8")
    xb, yb = C.transform_points([8.3], [46.2], "EPSG:4326",
                                "+proj=stere +lat_0=46 +lon_0=8")
    assert np.hypot(xa[0] - xb[0], ya[0] - yb[0]) < 1.0
