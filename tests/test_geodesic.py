"""Karney geodesic inverse: anchors, Vincenty cross-validation, kernel wiring."""

import numpy as np

from geopolars_ray.geom.geodesic import geodesic_inverse_m
from geopolars_ray.geom.kernels import _vincenty_m, geodesic_length
from geopolars_ray.geom import GeometryArray


def test_known_anchors():
    # quarter meridian (equator -> pole): 10001965.7293 m on WGS84
    m = geodesic_inverse_m(np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([90.0]))
    assert abs(m[0] - 10001965.7293) < 0.001
    # 1 degree along the equator: a * pi/180
    e = geodesic_inverse_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert abs(e[0] - 111319.4907932736) < 1e-6
    # same point
    z = geodesic_inverse_m(np.array([10.0]), np.array([45.0]), np.array([10.0]), np.array([45.0]))
    assert z[0] == 0.0


def test_vincenty_agreement():
    rng = np.random.default_rng(5)
    n = 5000
    lon1, lat1 = rng.uniform(-180, 180, n), rng.uniform(-80, 80, n)
    lon2, lat2 = rng.uniform(-180, 180, n), rng.uniform(-80, 80, n)
    g = geodesic_inverse_m(lon1, lat1, lon2, lat2)
    v = _vincenty_m(lon1, lat1, lon2, lat2, iterations=200)
    ok = np.isfinite(g) & np.isfinite(v)
    assert ok.sum() >= n - 5  # essentially all converge
    assert np.abs(g - v)[ok].max() < 1e-3  # < 1 mm


def test_kernel_method_dispatch():
    ga = GeometryArray.from_pylist([("linestring", [(0.0, 0.0), (1.0, 0.0)])])
    geo = geodesic_length(ga, "geodesic")[0]
    vin = geodesic_length(ga, "vincenty")[0]
    assert abs(geo - 111319.4907932736) < 1e-6
    assert abs(geo - vin) < 1e-3


def test_vincenty_direct_inverse_vs_karney():
    """The two INDEPENDENT geodesic formulations in geom/geodesic.py agree:
    Vincenty inverse distance within 0.1 mm of the Karney series over 3000
    random non-antipodal pairs, and direct∘inverse closes to <1e-12 deg."""
    import numpy as np

    from geopolars_ray.geom.geodesic import (
        geodesic_inverse_m,
        vincenty_direct,
        vincenty_inverse,
    )

    rng = np.random.default_rng(0)
    lon1 = rng.uniform(-180, 180, 3000); lat1 = rng.uniform(-85, 85, 3000)
    lon2 = rng.uniform(-180, 180, 3000); lat2 = rng.uniform(-85, 85, 3000)
    d_k = geodesic_inverse_m(lon1, lat1, lon2, lat2)
    ok = d_k < 19_000_000  # exclude Vincenty's near-antipodal slice
    s, az = vincenty_inverse(lon1[ok], lat1[ok], lon2[ok], lat2[ok])
    assert np.nanmax(np.abs(s - d_k[ok])) < 1e-4  # 0.1 mm
    lo2, la2 = vincenty_direct(lon1[ok], lat1[ok], az, s)
    assert np.nanmax(np.abs((lo2 - lon2[ok] + 180) % 360 - 180)) < 1e-12
    assert np.nanmax(np.abs(la2 - lat2[ok])) < 1e-12
    # meridian anchor: due north from the equator by a quarter meridian
    lo, la = vincenty_direct(np.array([9.0]), np.array([0.0]), np.array([0.0]),
                             np.array([10001965.7293]))
    assert abs(lo[0] - 9.0) < 1e-9 and abs(la[0] - 90.0) < 1e-7


def test_aeqd_projection_invariants():
    """AEQD's defining property: the projected radius IS the geodesic
    distance from the center (vs the independent Karney inverse); exact
    round-trips; the center maps to the false origin."""
    import numpy as np

    from geopolars_ray.geom import crs as C
    from geopolars_ray.geom.geodesic import geodesic_inverse_m

    spec = "+proj=aeqd +lat_0=48.8566 +lon_0=2.3522 +x_0=100 +y_0=-50"
    assert C.parse_crs(spec)["proj"] == "aeqd"
    x, y = C.transform_points(np.array([2.3522]), np.array([48.8566]), "EPSG:4326", spec)
    assert abs(x[0] - 100.0) < 1e-9 and abs(y[0] + 50.0) < 1e-9
    rng = np.random.default_rng(1)
    lon = rng.uniform(-120.0, 130.0, 500)
    lat = rng.uniform(-70.0, 80.0, 500)
    x, y = C.transform_points(lon, lat, "EPSG:4326", spec)
    s = np.hypot(x - 100.0, y + 50.0)
    d = geodesic_inverse_m(np.full(500, 2.3522), np.full(500, 48.8566), lon, lat)
    assert np.abs(s - d).max() < 1e-3  # 1 mm over up to ~15,000 km
    lo2, la2 = C.transform_points(x, y, spec, "EPSG:4326")
    assert np.abs((lo2 - lon + 180) % 360 - 180).max() < 1e-9
    assert np.abs(la2 - lat).max() < 1e-9


def test_geodesic_buffer_points():
    """Every ring vertex sits at EXACTLY the buffer distance (vs Karney);
    rings are CCW; non-point/oversize-distance inputs refuse loudly."""
    import numpy as np
    import pytest

    from geopolars_ray.geom import kernels as K
    from geopolars_ray.geom.array import GeometryArray
    from geopolars_ray.geom.geodesic import geodesic_inverse_m

    pts = GeometryArray.from_points(np.array([2.3522, 151.21, -70.0]),
                                    np.array([48.8566, -33.87, 80.0]))
    buf = K.geodesic_buffer_points(pts, 250_000.0, quad_segs=8)
    co = buf.coord_offsets()
    for i in range(3):
        ring = buf.coords[co[i]:co[i + 1] - 1]
        d = geodesic_inverse_m(np.full(len(ring), pts.coords[i, 0]),
                               np.full(len(ring), pts.coords[i, 1]),
                               ring[:, 0], ring[:, 1])
        assert np.abs(d - 250_000.0).max() < 2e-3
    assert (K.area(buf) > 0).all()  # CCW
    with pytest.raises(ValueError, match="antipodal"):
        K.geodesic_buffer_points(pts, 20_000_000.0)
    with pytest.raises(NotImplementedError):
        K.geodesic_buffer_points(GeometryArray.from_pylist(
            [("linestring", [(0.0, 0.0), (1.0, 1.0)])]), 1000.0)


def test_geodesic_area_anchors():
    """Octant = exactly 1/8 of the WGS84 ellipsoid surface (edges along
    meridians/equator are great circles of the authalic sphere, so the
    trapezoid-excess sum is closed-form exact there)."""
    from geopolars_ray.geom.kernels import geodesic_area
    from geopolars_ray.geom.crs import WGS84_A, WGS84_F

    e = np.sqrt(WGS84_F * (2 - WGS84_F))
    b = WGS84_A * (1 - WGS84_F)
    s_ell = 2 * np.pi * WGS84_A**2 + np.pi * b**2 / e * np.log((1 + e) / (1 - e))
    ga = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (90.0, 0.0), (0.0, 90.0), (0.0, 0.0)]])]
    )
    a = geodesic_area(ga)[0]
    assert abs(a - s_ell / 8) / (s_ell / 8) < 1e-12
    # orientation-insensitive (abs of the signed sum)
    cw = GeometryArray.from_pylist(
        [("polygon", [[(0.0, 0.0), (0.0, 90.0), (90.0, 0.0), (0.0, 0.0)]])]
    )
    assert np.isclose(geodesic_area(cw)[0], a)


def test_geodesic_area_band_convergence_and_semantics():
    """Edges are geodesics (pyproj.Geod semantics), NOT parallels: a lat-lon
    'band' polygon converges O(1/k²) to the closed-form authalic band area as
    its parallel edges densify."""
    from geopolars_ray.geom.kernels import geodesic_area
    from geopolars_ray.geom.crs import _R_AUTH, _authalic_lat

    b1, b2 = _authalic_lat(np.radians(np.array([10.0, 30.0])))
    band = _R_AUTH**2 * np.radians(30.0) * (np.sin(b2) - np.sin(b1))

    def ring(k):
        lons = np.linspace(20.0, 50.0, k)
        return (
            [(float(l), 10.0) for l in lons]
            + [(float(l), 30.0) for l in lons[::-1]]
            + [(20.0, 10.0)]
        )

    errs = []
    for k in (2, 10, 100):
        ga = GeometryArray.from_pylist([("polygon", [ring(k)])])
        errs.append(abs(geodesic_area(ga)[0] - band) / band)
    assert errs[0] < 0.02 and errs[1] < 3e-4 and errs[2] < 3e-6
    # segment counts 1 -> 9 -> 99: error drops ~(9/1)² then ~(99/9)²
    assert errs[0] > 50 * errs[1] and errs[1] > 50 * errs[2]


def test_geodesic_area_vs_utm_planar_holes_antimeridian():
    from geopolars_ray.geom.kernels import geodesic_area
    from geopolars_ray.geom import crs as C

    # small square vs UTM planar area: ratio = 1/k² at the point (k≈0.9996
    # near the central meridian)
    lonc, latc = 9.1, 48.7
    sq = [(lonc, latc), (lonc + 0.01, latc), (lonc + 0.01, latc + 0.01),
          (lonc, latc + 0.01), (lonc, latc)]
    E, N = C.utm_forward(np.array([p[0] for p in sq]), np.array([p[1] for p in sq]), 32, True)
    planar = 0.5 * abs(np.sum(E[:-1] * N[1:] - E[1:] * N[:-1]))
    ga = GeometryArray.from_pylist([("polygon", [sq])])
    a = geodesic_area(ga)[0]
    assert abs(a / planar - 1.0 / 0.9996**2) < 2e-4

    # conventionally-wound hole subtracts
    outer = [(20.0, 10.0), (50.0, 10.0), (50.0, 30.0), (20.0, 30.0), (20.0, 10.0)]
    hole = [(20.0, 15.0), (25.0, 15.0), (25.0, 20.0), (20.0, 20.0), (20.0, 15.0)][::-1]
    a_outer = geodesic_area(GeometryArray.from_pylist([("polygon", [outer])]))[0]
    a_hole_solid = geodesic_area(GeometryArray.from_pylist([("polygon", [hole[::-1]])]))[0]
    a_with = geodesic_area(GeometryArray.from_pylist([("polygon", [outer, hole])]))[0]
    assert np.isclose(a_with, a_outer - a_hole_solid, rtol=1e-12)

    # antimeridian-crossing polygon: equals the same polygon shifted to lon 0
    am = [(175.0, 10.0), (-175.0, 10.0), (-175.0, 20.0), (175.0, 20.0), (175.0, 10.0)]
    sh = [(-5.0, 10.0), (5.0, 10.0), (5.0, 20.0), (-5.0, 20.0), (-5.0, 10.0)]
    a_am = geodesic_area(GeometryArray.from_pylist([("polygon", [am])]))[0]
    a_sh = geodesic_area(GeometryArray.from_pylist([("polygon", [sh])]))[0]
    assert np.isclose(a_am, a_sh, rtol=1e-12)

    # non-areal -> 0, missing -> NaN, multipolygon sums
    mixed = GeometryArray.from_pylist(
        [("linestring", [(0.0, 0.0), (1.0, 1.0)]), None,
         ("multipolygon", [[outer], [hole[::-1]]])]
    )
    r = geodesic_area(mixed)
    assert r[0] == 0.0 and np.isnan(r[1])
    assert np.isclose(r[2], a_outer + a_hole_solid, rtol=1e-12)
