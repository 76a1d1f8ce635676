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
