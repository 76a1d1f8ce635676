"""Coordinate reprojection (`to_crs`) — closed-form CRS family, no PROJ.

The reference reprojects point-wise through a PROJ pipeline
(``/root/reference/geopolars/geopolars-geo/src/ops/proj.rs:33-70``), carrying
CRS as explicit from/to arguments because Polars can't persist extension
metadata (``geoseries.rs:148-161``). No PROJ is available here, so the CRS
family real pipelines use is implemented closed-form from the published math
(Snyder, *Map Projections — A Working Manual*; Karney's transverse-Mercator
series as used by every modern UTM implementation):

- EPSG:4326 (lon/lat WGS84) and EPSG:3857 (WebMercator) — exact closed form;
- UTM zones 1-60 N/S (EPSG:326xx / 327xx) — 3rd-order Krüger series on
  WGS84 (sub-mm forward accuracy, round-trips < 1e-9 deg);
- Lambert azimuthal equal-area (ellipsoidal via authalic latitude), incl.
  EPSG:3035 (European LAEA);
- ellipsoidal Mercator (Snyder ch. 7), incl. EPSG:3395 (World Mercator);
- Lambert conformal conic 1/2SP (Snyder ch. 15), incl. EPSG:2154
  (RGF93 / Lambert-93);
- Albers equal-area conic 2SP (Snyder ch. 14), incl. EPSG:5070
  (CONUS Albers);
- polar stereographic with true-scale parallel (Snyder ch. 21), incl.
  EPSG:3413 (NSIDC Arctic) and EPSG:3031 (Antarctic);
- oblique ("double") stereographic, EPSG method 9809 (``+proj=sterea``,
  RD-New-style grids) and Swiss oblique Mercator, EPSG method 9814
  (``+proj=somerc``, CH1903-style grids) — both via the conformal Gauss
  sphere, anchored on their published Bessel worked examples;
- generic transverse Mercator ``+proj=tmerc`` (Krüger series + lat_0
  origin), parametrized by ellipsoid (Airy, Bessel, ... — the same series
  coefficients recomputed per ellipsoid);
- r5: DATUM transformations — geocentric 7-parameter Helmert, EPSG method
  9606 position-vector convention (= PROJ ``+towgs84``), through the WGS84
  hub, with the published parameter sets for OSGB36, CH1903/CH1903+,
  Amersfoort and DHDN. The formerly-refused national grids are now aliased:
  EPSG:27700 (British National Grid, anchored on the OS GN7-2 worked
  example + the documented ~5.3" Greenwich meridian offset), EPSG:21781 /
  EPSG:2056 (Swiss LV03/LV95, anchored on swisstopo's published example to
  ~5 cm) and EPSG:28992 (RD New). Accuracy = the published single-set
  Helmert accuracy over each grid's home extent (~2-10 m), documented per
  entry in ``DATUMS``;
- r5: oblique/equatorial SINGLE-projection stereographic (``+proj=stere``
  with |lat_0| < 90, Snyder ch. 21 ellipsoidal oblique aspect via the
  conformal latitude, anchored on Snyder's Clarke-1866 worked example) —
  closing the last documented aspect refusal;
- equidistant cylindrical (EPSG method 1028, y = true meridian arc via the
  Krüger rectifying series), incl. EPSG:4087; cylindrical equal-area
  (EPSG method 9835 on the authalic machinery), incl. EPSG:6933
  (NSIDC EASE-Grid 2.0, anchored on its published half-width);
- proj-strings: ``+proj=longlat | webmerc | merc (ellipsoidal) |
  utm +zone=N [+south] | tmerc | laea | lcc | aea | stere | sterea |
  somerc | aeqd | eqc | cea`` with the usual
  ``+lat_0 +lon_0 +lat_1 +lat_2 +lat_ts +x_0 +y_0 +k_0`` parameters.

All projections use the WGS84 ellipsoid. EPSG:2154/5070 are nominally GRS80;
GRS80 and WGS84 differ by ~0.1 mm in semi-minor axis (|Δf| ≈ 1.6e-11), far
below the series truncation here, so the distinction is documented rather
than parameterized. Every non-closed-form projection is verified in tests by
its defining invariant (conformality h=k, equal-area Jacobian = ellipsoid
surface element, scale 1 at standard parallels, false-origin anchors) rather
than by external anchor coordinates — no PROJ exists in this sandbox to
disagree with.

Like the reference, transformation is point-wise with no implicit
densification (same documented dateline caveat); the explicit recipe is
``segmentize(..., method="geodesic")`` before ``to_crs`` (`geom/kernels.py`).
"""

from __future__ import annotations

import re

import numpy as np

from geopolars_ray.geom.array import GeometryArray

WEBMERCATOR_R = 6378137.0
_MAX_LAT = 85.051128779806604  # atan(sinh(pi)) in degrees — WebMercator clamp

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
_E1 = np.sqrt(_E2)


def _norm(crs: str) -> str:
    c = crs.upper().replace(" ", "")
    aliases = {
        "EPSG:4326": "EPSG:4326",
        "WGS84": "EPSG:4326",
        "CRS84": "EPSG:4326",
        "OGC:CRS84": "EPSG:4326",
        "EPSG:3857": "EPSG:3857",
        "WEBMERCATOR": "EPSG:3857",
        "EPSG:900913": "EPSG:3857",
    }
    if c not in aliases:
        raise ValueError(f"unsupported CRS {crs!r} (supported: EPSG:4326, EPSG:3857)")
    return aliases[c]


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -_MAX_LAT, _MAX_LAT)
    x = WEBMERCATOR_R * np.radians(lon)
    y = WEBMERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = np.degrees(x / WEBMERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEBMERCATOR_R)) - np.pi / 2.0)
    return lon, lat


# --------------------------------------------------------------------------
# transverse Mercator / UTM (Krüger series, 3rd order in n — sub-mm on WGS84)
# --------------------------------------------------------------------------

_UTM_K0 = 0.9996
_UTM_E0 = 500_000.0
_UTM_N0_SOUTH = 10_000_000.0

_TM_CONST_CACHE: dict = {}


def _tm_constants(a: float, f: float):
    """Krüger-series constants for an ellipsoid (a, f): third flattening
    n, rectifying radius A-bar, the alpha/beta coefficient triples and
    the conformal-latitude constant c2n. Cached per ellipsoid — the
    series coefficients are what make the national-grid datums (Airy,
    Bessel) share this machinery with WGS84 UTM."""
    key = (a, f)
    hit = _TM_CONST_CACHE.get(key)
    if hit is not None:
        return hit
    n = f / (2.0 - f)
    a_bar = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0,
        61.0 * n**3 / 240.0,
    )
    beta = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0,
        n**2 / 48.0 + n**3 / 15.0,
        17.0 * n**3 / 480.0,
    )
    c2n = 2.0 * np.sqrt(n) / (1.0 + n)
    out = (a_bar, alpha, beta, c2n)
    _TM_CONST_CACHE[key] = out
    return out


def tm_forward(lon, lat, lon0: float, k0: float = _UTM_K0, e0: float = 0.0, n0: float = 0.0,
               a: float = WGS84_A, f: float = WGS84_F):
    """Ellipsoidal transverse Mercator forward (Karney-style series)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    a_bar, alpha, _beta, c2n = _tm_constants(a, f)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    s = np.sin(phi)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # at the exact poles arctanh(±1) = ±inf and the infinities propagate
        # correctly: t=±inf -> xi' = ±pi/2, eta' = 0 — no clamping needed
        t = np.sinh(np.arctanh(s) - c2n * np.arctanh(c2n * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, aj in enumerate(alpha, start=1):
        xi += aj * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += aj * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return e0 + k0 * a_bar * eta, n0 + k0 * a_bar * xi


def tm_inverse(E, N, lon0: float, k0: float = _UTM_K0, e0: float = 0.0, n0: float = 0.0,
               a: float = WGS84_A, f: float = WGS84_F):
    """Ellipsoidal transverse Mercator inverse (series)."""
    E = np.asarray(E, np.float64)
    N = np.asarray(N, np.float64)
    a_bar, _alpha, beta, c2n = _tm_constants(a, f)
    xi = (N - n0) / (k0 * a_bar)
    eta = (E - e0) / (k0 * a_bar)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    # conformal -> geodetic latitude: Newton on t(phi) = tan(chi), where
    # t = sinh(psi), psi = artanh(sin phi) - c * artanh(c sin phi),
    # dt/dphi = sqrt(1+t^2) * (1/cos phi - c^2 cos phi / (1 - c^2 sin^2 phi))
    phi = chi.copy()
    tgt = np.tan(chi)
    for _ in range(6):
        s = np.sin(phi)
        cphi = np.maximum(np.cos(phi), 1e-300)
        t = np.sinh(np.arctanh(np.clip(s, -1 + 1e-15, 1 - 1e-15)) - c2n * np.arctanh(c2n * s))
        dt = np.sqrt(1.0 + t * t) * (1.0 / cphi - c2n * c2n * cphi / (1.0 - (c2n * s) ** 2))
        phi = phi - (t - tgt) / dt
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + np.degrees(lam), np.degrees(phi)


def utm_zone_of(lon: np.ndarray) -> np.ndarray:
    """UTM zone number (1-60) from longitude."""
    lon = np.asarray(lon, np.float64)
    return np.clip(np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1, 1, 60)


def utm_forward(lon, lat, zone: int, north: bool = True):
    lon0 = float(zone) * 6.0 - 183.0
    n0 = 0.0 if north else _UTM_N0_SOUTH
    return tm_forward(lon, lat, lon0, _UTM_K0, _UTM_E0, n0)


def utm_inverse(E, N, zone: int, north: bool = True):
    lon0 = float(zone) * 6.0 - 183.0
    n0 = 0.0 if north else _UTM_N0_SOUTH
    return tm_inverse(E, N, lon0, _UTM_K0, _UTM_E0, n0)


def _tmerc_n0(lon0: float, lat0: float, k0: float, y0: float,
              a: float = WGS84_A, f: float = WGS84_F) -> float:
    """Effective false northing for a tmerc natural origin at lat_0.

    PROJ semantics: northings are measured from lat_0 on the central
    meridian, i.e. N = y_0 + k0*(rectifying northing(phi) - rectifying
    northing(lat_0)). The origin northing comes from the same Krüger
    series, so origin subtraction is exact (no separate meridian-arc
    formula to disagree with)."""
    _, n_org = tm_forward(np.array([lon0]), np.array([lat0]), lon0, k0, 0.0, 0.0, a, f)
    return y0 - float(n_org[0])


def tmerc_forward(lon, lat, lon0: float, lat0: float = 0.0, k0: float = 1.0,
                  x0: float = 0.0, y0: float = 0.0,
                  a: float = WGS84_A, f: float = WGS84_F):
    """Generic transverse Mercator (+proj=tmerc): Krüger series + lat_0
    origin, parametrized by ellipsoid (Airy for OSGB, Bessel, ...)."""
    return tm_forward(lon, lat, lon0, k0, x0, _tmerc_n0(lon0, lat0, k0, y0, a, f), a, f)


def tmerc_inverse(E, N, lon0: float, lat0: float = 0.0, k0: float = 1.0,
                  x0: float = 0.0, y0: float = 0.0,
                  a: float = WGS84_A, f: float = WGS84_F):
    return tm_inverse(E, N, lon0, k0, x0, _tmerc_n0(lon0, lat0, k0, y0, a, f), a, f)


# --------------------------------------------------------------------------
# Lambert azimuthal equal-area (ellipsoidal via authalic latitude, Snyder 24)
# --------------------------------------------------------------------------


def _q_auth(s: np.ndarray) -> np.ndarray:
    """Snyder's q function of sin(lat)."""
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E1)) * np.log((1.0 - _E1 * s) / (1.0 + _E1 * s))
    )


_QP = float(_q_auth(np.array([1.0]))[0])
_R_AUTH = WGS84_A * np.sqrt(_QP / 2.0)  # authalic radius


def _authalic_lat(lat_rad: np.ndarray) -> np.ndarray:
    q = _q_auth(np.sin(lat_rad))
    return np.arcsin(np.clip(q / _QP, -1.0, 1.0))


def _authalic_to_geodetic(beta: np.ndarray) -> np.ndarray:
    """Inverse authalic latitude (series, Snyder 3-18)."""
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return (
        beta
        + (e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0) * np.sin(2 * beta)
        + (23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0) * np.sin(4 * beta)
        + (761.0 * e6 / 45360.0) * np.sin(6 * beta)
    )


def _laea_d(lat0: float) -> float:
    """Snyder's D scaling factor (eq. 24-20): D = a*m1 / (Rq*cos(beta1)).

    m1 = cos(lat0)/sqrt(1 - e^2 sin^2(lat0)) (eq. 14-15).  D compensates the
    authalic-sphere mapping so scale is true along the central parallel;
    omitting it offsets EPSG:9820 coordinates by ~100-900 m across Europe
    for lat_0=52 (D ~ 1.000425).
    """
    if abs(lat0) > 89.5:
        # the oblique formula divides by cos(beta1): at the poles both
        # m1 and cos(beta1) underflow to rounding noise and D becomes a
        # quotient of float garbage. The polar aspect needs Snyder's
        # separate polar equations (24-23/24-25), which are not implemented
        # — refuse loudly rather than emit corrupted coordinates.
        raise ValueError(
            f"polar-aspect ellipsoidal LAEA (lat_0={lat0}) is not supported; "
            "only the oblique/equatorial aspect (|lat_0| <= 89.5) is implemented"
        )
    lat0r = np.radians(lat0)
    s0 = float(np.sin(lat0r))
    m1 = float(np.cos(lat0r)) / np.sqrt(1.0 - _E2 * s0 * s0)
    beta0 = float(_authalic_lat(np.array([lat0r]))[0])
    return float(WGS84_A * m1 / (_R_AUTH * np.cos(beta0)))


def laea_forward(lon, lat, lon0: float, lat0: float, x0: float = 0.0, y0: float = 0.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam = np.radians(lon - lon0)
    beta = _authalic_lat(np.radians(lat))
    beta0 = float(_authalic_lat(np.radians(np.array([lat0])))[0])
    D = _laea_d(lat0)
    sb, cb = np.sin(beta), np.cos(beta)
    sb0, cb0 = np.sin(beta0), np.cos(beta0)
    denom = 1.0 + sb0 * sb + cb0 * cb * np.cos(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        bprime = _R_AUTH * np.sqrt(2.0 / np.maximum(denom, 1e-300))
    x = x0 + bprime * D * cb * np.sin(lam)
    y = y0 + (bprime / D) * (cb0 * sb - sb0 * cb * np.cos(lam))
    return x, y


def laea_inverse(x, y, lon0: float, lat0: float, x0: float = 0.0, y0: float = 0.0):
    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    beta0 = float(_authalic_lat(np.radians(np.array([lat0])))[0])
    D = _laea_d(lat0)
    sb0, cb0 = np.sin(beta0), np.cos(beta0)
    # Snyder eq. 24-28/29: undo the D anisotropy before the spherical inverse
    rho = np.sqrt((x / D) ** 2 + (D * y) ** 2)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * _R_AUTH), -1.0, 1.0))
    sc, cc = np.sin(ce), np.cos(ce)
    with np.errstate(divide="ignore", invalid="ignore"):
        beta = np.where(
            rho == 0.0,
            beta0,
            np.arcsin(np.clip(cc * sb0 + np.where(rho == 0, 0.0, D * y * sc * cb0 / np.maximum(rho, 1e-300)), -1.0, 1.0)),
        )
        lam = np.arctan2(x * sc, D * rho * cb0 * cc - D * D * y * sb0 * sc)
    lat = np.degrees(_authalic_to_geodetic(beta))
    lon = lon0 + np.degrees(lam)
    return lon, lat


# --------------------------------------------------------------------------
# shared conformal/conic helpers (Snyder eqs 7-10, 14-15, 7-9)
# --------------------------------------------------------------------------


def _t_conf(phi: np.ndarray) -> np.ndarray:
    """Snyder's isometric-colatitude function t (eq. 15-9 / 7-10).

    t = tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin phi))^(e/2); 0 at the
    north pole, +inf at the south pole — both propagate correctly through the
    conic/stereographic radius formulas.
    """
    phi = np.asarray(phi, np.float64)
    s = np.sin(phi)
    with np.errstate(divide="ignore", over="ignore"):
        return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - _E1 * s) / (1.0 + _E1 * s)) ** (_E1 / 2.0)


def _m_par(phi: float | np.ndarray) -> np.ndarray:
    """Snyder's m = cos(phi)/sqrt(1 - e^2 sin^2 phi) (eq. 14-15)."""
    phi = np.asarray(phi, np.float64)
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _phi_from_t(t: np.ndarray) -> np.ndarray:
    """Invert _t_conf by Snyder's fixed-point iteration (eq. 7-9).

    Contraction factor is O(e^2) ~ 6.7e-3 per step; 8 steps reach float64
    round-off from the spherical seed for any t in [0, inf).
    """
    t = np.asarray(t, np.float64)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - _E1 * s) / (1.0 + _E1 * s)) ** (_E1 / 2.0))
    return phi


def _wrap_lam(lam: np.ndarray) -> np.ndarray:
    """Wrap a longitude difference (radians) to [-pi, pi)."""
    return (lam + np.pi) % (2.0 * np.pi) - np.pi


# --------------------------------------------------------------------------
# equidistant cylindrical (EPSG method 1028, ellipsoidal) — +proj=eqc,
# EPSG:4087. y IS the meridian arc, reusing the anchored Krüger series
# (the transverse-Mercator northing on the central meridian is exactly
# A_BAR * rectifying latitude).
# --------------------------------------------------------------------------


def _nu_cos(lat_ts: float) -> float:
    p = np.radians(lat_ts)
    return float(WGS84_A * np.cos(p) / np.sqrt(1.0 - _E2 * np.sin(p) ** 2))


def eqc_forward(lon, lat, lon0: float = 0.0, lat_ts: float = 0.0,
                x0: float = 0.0, y0: float = 0.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x = x0 + _nu_cos(lat_ts) * _wrap_lam(np.radians(lon - lon0))
    _, M = tm_forward(np.full_like(lat, lon0), lat, lon0, 1.0)
    return x, y0 + M


def eqc_inverse(x, y, lon0: float = 0.0, lat_ts: float = 0.0,
                x0: float = 0.0, y0: float = 0.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = lon0 + np.degrees((x - x0) / _nu_cos(lat_ts))
    _, lat = tm_inverse(np.zeros_like(y), y - y0, lon0, 1.0)
    return lon, lat


# --------------------------------------------------------------------------
# cylindrical equal-area (EPSG method 9835, ellipsoidal) — +proj=cea,
# EPSG:6933 (NSIDC EASE-Grid 2.0 Global, lat_ts=30). Authalic machinery
# shared with LAEA: y = a*q(phi)/(2*m(lat_ts)), exactly area-preserving.
# --------------------------------------------------------------------------


def cea_forward(lon, lat, lon0: float = 0.0, lat_ts: float = 0.0,
                x0: float = 0.0, y0: float = 0.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    m = _nu_cos(lat_ts) / WGS84_A  # cos(ts)/sqrt(1-e^2 sin^2 ts)
    x = x0 + _nu_cos(lat_ts) * _wrap_lam(np.radians(lon - lon0))
    y = y0 + WGS84_A * _q_auth(np.sin(np.radians(lat))) / (2.0 * m)
    return x, y


def cea_inverse(x, y, lon0: float = 0.0, lat_ts: float = 0.0,
                x0: float = 0.0, y0: float = 0.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    m = _nu_cos(lat_ts) / WGS84_A
    lon = lon0 + np.degrees((x - x0) / _nu_cos(lat_ts))
    q = 2.0 * m * (y - y0) / WGS84_A
    beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    return lon, np.degrees(_authalic_to_geodetic(beta))


# --------------------------------------------------------------------------
# ellipsoidal Mercator (Snyder ch. 7) — EPSG:3395
# --------------------------------------------------------------------------


def mercator_forward(lon, lat, lon0: float = 0.0, k0: float = 1.0, x0: float = 0.0, y0: float = 0.0):
    """Ellipsoidal Mercator forward: x = a k0 lam, y = a k0 (atanh s - e atanh e s).

    Only the EXACT poles are clamped (to +-(90 - 1e-5) deg — the margin
    keeps sin(lat) < 1 in float64, y ~ +-1e8 m) so +-inf never enters
    downstream arithmetic. EPSG:3395 is finite to arbitrarily high
    latitudes — the earlier WebMercator-square clamp (+-85.051 deg)
    silently displaced valid Arctic points by ~100s of km (review
    finding); the square belongs to EPSG:3857 only.
    """
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -90.0 + 1e-5, 90.0 - 1e-5)
    lam = _wrap_lam(np.radians(lon - lon0))
    s = np.sin(np.radians(lat))
    x = x0 + WGS84_A * k0 * lam
    y = y0 + WGS84_A * k0 * (np.arctanh(s) - _E1 * np.arctanh(_E1 * s))
    return x, y


def mercator_inverse(x, y, lon0: float = 0.0, k0: float = 1.0, x0: float = 0.0, y0: float = 0.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = lon0 + np.degrees((x - x0) / (WGS84_A * k0))
    t = np.exp(-(y - y0) / (WGS84_A * k0))
    lat = np.degrees(_phi_from_t(t))
    return lon, lat


# --------------------------------------------------------------------------
# Lambert conformal conic 1/2SP (Snyder ch. 15) — EPSG:2154 et al.
# --------------------------------------------------------------------------


def _lcc_constants(lat0: float, lat1: float, lat2: float, k0: float = 1.0):
    """(n, aF, rho0) for an LCC aspect; lat1 == lat2 degrades to the 1SP cone."""
    if not (-90.0 < lat1 < 90.0 and -90.0 < lat2 < 90.0):
        raise ValueError("LCC standard parallels must lie strictly between the poles")
    if lat1 * lat2 < 0.0 or (lat1 == 0.0 and lat2 == 0.0):
        raise ValueError("LCC standard parallels must be on one side of the equator (use merc at the equator)")
    p1, p2 = np.radians(lat1), np.radians(lat2)
    t1 = float(_t_conf(np.array([p1]))[0])
    m1 = float(_m_par(p1))
    if abs(lat1 - lat2) < 1e-9:
        n = float(np.sin(p1))
    else:
        t2 = float(_t_conf(np.array([p2]))[0])
        m2 = float(_m_par(p2))
        n = float(np.log(m1 / m2) / np.log(t1 / t2))
    aF = WGS84_A * k0 * m1 / (n * t1**n)
    t0 = float(_t_conf(np.array([np.radians(lat0)]))[0])
    rho0 = aF * t0**n
    return n, aF, rho0


def lcc_forward(lon, lat, lon0: float, lat0: float, lat1: float, lat2: float,
                x0: float = 0.0, y0: float = 0.0, k0: float = 1.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    n, aF, rho0 = _lcc_constants(lat0, lat1, lat2, k0)
    t = _t_conf(np.radians(lat))
    with np.errstate(over="ignore"):
        # the pole OPPOSITE the cone apex has t^n = inf -> rho = inf; that
        # point is outside every published LCC domain and stays inf/nan
        rho = aF * t**n
    theta = n * _wrap_lam(np.radians(lon - lon0))
    return x0 + rho * np.sin(theta), y0 + rho0 - rho * np.cos(theta)


def lcc_inverse(x, y, lon0: float, lat0: float, lat1: float, lat2: float,
                x0: float = 0.0, y0: float = 0.0, k0: float = 1.0):
    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    n, aF, rho0 = _lcc_constants(lat0, lat1, lat2, k0)
    sgn = 1.0 if n >= 0.0 else -1.0
    rho = sgn * np.sqrt(x * x + (rho0 - y) ** 2)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))
    with np.errstate(divide="ignore"):
        t = np.where(rho == 0.0, 0.0 if n >= 0 else np.inf, (rho / aF) ** (1.0 / n))
    lat = np.degrees(_phi_from_t(t))
    lon = lon0 + np.degrees(theta / n)
    return lon, lat


# --------------------------------------------------------------------------
# Albers equal-area conic 2SP (Snyder ch. 14) — EPSG:5070 et al.
# --------------------------------------------------------------------------


def _aea_constants(lat0: float, lat1: float, lat2: float):
    if abs(lat1 - lat2) < 1e-9:
        raise ValueError("Albers needs two distinct standard parallels (lat_1 != lat_2)")
    if abs(lat1 + lat2) < 1e-9:
        raise ValueError("Albers standard parallels symmetric about the equator degenerate to a cylinder")
    p1, p2 = np.radians(lat1), np.radians(lat2)
    m1, m2 = float(_m_par(p1)), float(_m_par(p2))
    q1 = float(_q_auth(np.array([np.sin(p1)]))[0])
    q2 = float(_q_auth(np.array([np.sin(p2)]))[0])
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    q0 = float(_q_auth(np.array([np.sin(np.radians(lat0))]))[0])
    rho0 = WGS84_A * np.sqrt(C - n * q0) / n
    return n, C, rho0


def aea_forward(lon, lat, lon0: float, lat0: float, lat1: float, lat2: float,
                x0: float = 0.0, y0: float = 0.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    n, C, rho0 = _aea_constants(lat0, lat1, lat2)
    q = _q_auth(np.sin(np.radians(lat)))
    rho = WGS84_A * np.sqrt(np.maximum(C - n * q, 0.0)) / n
    theta = n * _wrap_lam(np.radians(lon - lon0))
    return x0 + rho * np.sin(theta), y0 + rho0 - rho * np.cos(theta)


def aea_inverse(x, y, lon0: float, lat0: float, lat1: float, lat2: float,
                x0: float = 0.0, y0: float = 0.0):
    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    n, C, rho0 = _aea_constants(lat0, lat1, lat2)
    sgn = 1.0 if n >= 0.0 else -1.0
    rho = np.sqrt(x * x + (rho0 - y) ** 2)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))
    q = (C - (rho * n / WGS84_A) ** 2) / n
    beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    lat = np.degrees(_authalic_to_geodetic(beta))
    lon = lon0 + np.degrees(theta / n)
    return lon, lat


# --------------------------------------------------------------------------
# polar stereographic, true-scale parallel variant (Snyder ch. 21)
# EPSG:3413 (north, lat_ts=70, lon_0=-45) / EPSG:3031 (south, lat_ts=-71)
# --------------------------------------------------------------------------


def _stere_tc_mc(lat_ts: float) -> tuple[float, float]:
    """(t_c, m_c) at the (northern-frame) true-scale latitude."""
    pts = np.radians(abs(lat_ts))
    if abs(lat_ts) > 89.999:
        # k0-at-pole variant: rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))
        # expressed as the same t_c/m_c quotient via its limit
        tc = np.sqrt((1.0 - _E1) ** (1.0 - _E1) * (1.0 + _E1) ** (1.0 + _E1)) / 2.0
        return float(tc), 1.0
    return float(_t_conf(np.array([pts]))[0]), float(_m_par(pts))


def stere_polar_forward(lon, lat, lon0: float, lat_ts: float, south: bool,
                        x0: float = 0.0, y0: float = 0.0, k0: float = 1.0):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    tc, mc = _stere_tc_mc(lat_ts)
    phi = np.radians(-lat if south else lat)
    t = _t_conf(phi)
    rho = WGS84_A * k0 * mc * t / tc
    lam = _wrap_lam(np.radians(lon - lon0))
    if south:
        # southern aspect: x east along lon0+90E, y north along lon0
        return x0 + rho * np.sin(lam), y0 + rho * np.cos(lam)
    return x0 + rho * np.sin(lam), y0 - rho * np.cos(lam)


def stere_polar_inverse(x, y, lon0: float, lat_ts: float, south: bool,
                        x0: float = 0.0, y0: float = 0.0, k0: float = 1.0):
    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    tc, mc = _stere_tc_mc(lat_ts)
    rho = np.sqrt(x * x + y * y)
    t = rho * tc / (WGS84_A * k0 * mc)
    phi = _phi_from_t(t)
    if south:
        lam = np.arctan2(x, y)
        return lon0 + np.degrees(lam), np.degrees(-phi)
    lam = np.arctan2(x, -y)
    return lon0 + np.degrees(lam), np.degrees(phi)


# --------------------------------------------------------------------------
# oblique/equatorial stereographic, EPSG method 9809 ("double projection",
# PROJ +proj=sterea — used by RD New and other national grids): conformal
# mapping ellipsoid -> Gauss sphere -> spherical oblique stereographic.
# Formulas from EPSG Guidance Note 7-2 §"Oblique and Equatorial
# Stereographic"; parametrized (a, e) so the Bessel worked example anchors
# the math while the proj-string surface stays WGS84.
# --------------------------------------------------------------------------


def _sterea_constants(lat0: float, k0: float, a: float, e: float):
    p0 = np.radians(lat0)
    e2 = e * e
    sp0, cp0 = np.sin(p0), np.cos(p0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * sp0 * sp0) ** 1.5
    nu0 = a / np.sqrt(1.0 - e2 * sp0 * sp0)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1.0 + e2 * cp0**4 / (1.0 - e2))
    S1 = (1.0 + sp0) / (1.0 - sp0)
    S2 = (1.0 - e * sp0) / (1.0 + e * sp0)
    w1 = (S1 * S2**e) ** n
    sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
    c = (n + sp0) * (1.0 - sin_chi0) / ((n - sp0) * (1.0 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
    return float(R), float(n), float(c), float(chi0)


def _sterea_chi_lam(lon, lat, lon0: float, n: float, c: float, e: float):
    lam0 = np.radians(lon0)
    lam = lam0 + n * _wrap_lam(np.radians(lon) - lam0)
    phi = np.radians(lat)
    sp = np.sin(phi)
    Sa = (1.0 + sp) / (1.0 - sp)
    Sb = (1.0 - e * sp) / (1.0 + e * sp)
    w = c * (Sa * Sb**e) ** n
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    return chi, lam, lam0


def stere_oblique_forward(lon, lat, lon0: float, lat0: float, k0: float = 1.0,
                          x0: float = 0.0, y0: float = 0.0,
                          a: float = WGS84_A, e: float | None = None):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    e = _E1 if e is None else e
    R, n, c, chi0 = _sterea_constants(lat0, k0, a, e)
    chi, lam, lam0 = _sterea_chi_lam(lon, lat, lon0, n, c, e)
    dl = lam - lam0
    B = 1.0 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(dl)
    x = x0 + 2.0 * R * k0 * np.cos(chi) * np.sin(dl) / B
    y = y0 + 2.0 * R * k0 * (np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(dl)) / B
    return x, y


def stere_oblique_inverse(x, y, lon0: float, lat0: float, k0: float = 1.0,
                          x0: float = 0.0, y0: float = 0.0,
                          a: float = WGS84_A, e: float | None = None):
    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    e = _E1 if e is None else e
    R, n, c, chi0 = _sterea_constants(lat0, k0, a, e)
    lam0 = np.radians(lon0)
    g = 2.0 * R * k0 * np.tan(np.pi / 4.0 - chi0 / 2.0)
    h = 4.0 * R * k0 * np.tan(chi0) + g
    i = np.arctan2(x, h + y)
    j = np.arctan2(x, g - y) - i
    chi = chi0 + 2.0 * np.arctan((y - x * np.tan(j / 2.0)) / (2.0 * R * k0))
    lam = j + 2.0 * i + lam0
    lon = np.degrees(_wrap_lam(lam - lam0) / n + lam0)
    # isometric latitude on the ellipsoid from the conformal-sphere chi,
    # then Newton-style fixed point for phi (converges in ~4 iterations)
    psi = 0.5 * np.log((1.0 + np.sin(chi)) / (c * (1.0 - np.sin(chi)))) / n
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    e2 = e * e
    for _ in range(6):
        sp = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0) * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e2 * sp * sp) / (1.0 - e2)
    return lon, np.degrees(phi)


# --------------------------------------------------------------------------
# Swiss oblique Mercator, EPSG method 9814 (PROJ +proj=somerc — CH1903/LV03
# and CH1903+/LV95): conformal ellipsoid -> Gauss sphere -> rotation of the
# sphere so the projection centre lies on the pseudo-equator -> spherical
# Mercator. Formulas from the published swisstopo reference ("Formulas and
# constants for the calculation of the Swiss conformal cylindrical
# projection", rigorous formulas) / Snyder's oblique-Mercator-on-sphere.
# Parametrized (a, e) so the Bessel worked example anchors the math while
# the proj-string surface stays WGS84 (module docstring convention).
# --------------------------------------------------------------------------


def _somerc_constants(lat0: float, a: float, e: float):
    p0 = np.radians(lat0)
    e2 = e * e
    sp0, cp0 = np.sin(p0), np.cos(p0)
    R = a * np.sqrt(1.0 - e2) / (1.0 - e2 * sp0 * sp0)  # Gauss sphere radius
    alpha = np.sqrt(1.0 + e2 * cp0**4 / (1.0 - e2))
    b0 = np.arcsin(sp0 / alpha)
    # K fixes the sphere's latitude origin so b(phi0) == b0
    K = (np.log(np.tan(np.pi / 4.0 + b0 / 2.0))
         - alpha * np.log(np.tan(np.pi / 4.0 + p0 / 2.0))
         + alpha * e / 2.0 * np.log((1.0 + e * sp0) / (1.0 - e * sp0)))
    return float(R), float(alpha), float(b0), float(K)


def somerc_forward(lon, lat, lon0: float, lat0: float, k0: float = 1.0,
                   x0: float = 0.0, y0: float = 0.0,
                   a: float = WGS84_A, e: float | None = None):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    e = _E1 if e is None else e
    R, alpha, b0, K = _somerc_constants(lat0, a, e)
    phi = np.radians(lat)
    sp = np.sin(phi)
    # conformal (Gauss) sphere latitude b and sphere longitude l
    S = (alpha * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
         - alpha * e / 2.0 * np.log((1.0 + e * sp) / (1.0 - e * sp)) + K)
    b = 2.0 * (np.arctan(np.exp(S)) - np.pi / 4.0)
    l = alpha * _wrap_lam(np.radians(lon - lon0))
    # rotate the sphere: projection centre (b0, 0) -> pseudo-equator origin
    sb, cb = np.sin(b), np.cos(b)
    sl, cl = np.sin(l), np.cos(l)
    sin_bb = np.cos(b0) * sb - np.sin(b0) * cb * cl
    bb = np.arcsin(np.clip(sin_bb, -1.0, 1.0))
    lb = np.arctan2(cb * sl, np.sin(b0) * sb + np.cos(b0) * cb * cl)
    # spherical Mercator on the rotated sphere
    E = x0 + k0 * R * lb
    N = y0 + k0 * R * 0.5 * np.log((1.0 + sin_bb) / (1.0 - sin_bb))
    return E, N


def somerc_inverse(E, N, lon0: float, lat0: float, k0: float = 1.0,
                   x0: float = 0.0, y0: float = 0.0,
                   a: float = WGS84_A, e: float | None = None):
    E = np.asarray(E, np.float64)
    N = np.asarray(N, np.float64)
    e = _E1 if e is None else e
    R, alpha, b0, K = _somerc_constants(lat0, a, e)
    lb = (E - x0) / (k0 * R)
    bb = 2.0 * (np.arctan(np.exp((N - y0) / (k0 * R))) - np.pi / 4.0)
    sbb, cbb = np.sin(bb), np.cos(bb)
    slb, clb = np.sin(lb), np.cos(lb)
    b = np.arcsin(np.clip(np.cos(b0) * sbb + np.sin(b0) * cbb * clb, -1.0, 1.0))
    l = np.arctan2(cbb * slb, np.cos(b0) * cbb * clb - np.sin(b0) * sbb)
    lon = np.degrees(_wrap_lam(l / alpha + np.radians(lon0)))
    # sphere latitude -> ellipsoid latitude: invert the isometric relation
    # alpha*psi(phi) + K = ln(tan(pi/4 + b/2)) with the same Newton loop as
    # the sterea inverse (psi is the ellipsoidal isometric latitude)
    psi = (np.log(np.tan(np.pi / 4.0 + b / 2.0)) - K) / alpha
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    e2 = e * e
    for _ in range(6):
        sp = np.sin(phi)
        psi_i = np.log(np.tan(phi / 2.0 + np.pi / 4.0) * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e2 * sp * sp) / (1.0 - e2)
    return lon, np.degrees(phi)


# --------------------------------------------------------------------------
# azimuthal equidistant (ellipsoidal, via Vincenty geodesics) — +proj=aeqd
# --------------------------------------------------------------------------


def aeqd_forward(lon, lat, lon0: float, lat0: float, x0: float = 0.0, y0: float = 0.0):
    """Ellipsoidal AEQD: x = s*sin(az), y = s*cos(az) where (s, az) is the
    true geodesic distance/azimuth from the projection center — the
    projection's DEFINING property (hypot(x, y) == geodesic distance) is
    what tests pin, against the independent Karney implementation.

    This is the projection behind the standard project→buffer→unproject
    geodesic-buffer recipe. Near-antipodal points (Vincenty's documented
    non-convergence slice, ~>19,900 km) come back NaN rather than wrong.
    """
    from geopolars_ray.geom.geodesic import vincenty_inverse

    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    c_lon = np.full_like(lon, lon0)
    c_lat = np.full_like(lat, lat0)
    s, az = vincenty_inverse(c_lon, c_lat, lon, lat)
    # enforce the documented contract: inside the near-antipodal slice the
    # lambda iteration may return a plausible-looking but unverifiable
    # value — emit NaN there instead of a silently-degraded coordinate
    with np.errstate(invalid="ignore"):
        s = np.where(s > 19_900_000.0, np.nan, s)
    azr = np.radians(az)
    return x0 + s * np.sin(azr), y0 + s * np.cos(azr)


def aeqd_inverse(x, y, lon0: float, lat0: float, x0: float = 0.0, y0: float = 0.0):
    from geopolars_ray.geom.geodesic import vincenty_direct

    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    s = np.hypot(x, y)
    az = np.degrees(np.arctan2(x, y))
    c_lon = np.full_like(x, lon0)
    c_lat = np.full_like(y, lat0)
    return vincenty_direct(c_lon, c_lat, az, s)


# --------------------------------------------------------------------------
# oblique/equatorial SINGLE-projection stereographic (+proj=stere with
# |lat_0| < 90): Snyder ch. 21 ellipsoidal oblique aspect via the conformal
# latitude — closes the last documented aspect refusal (VERDICT r4 #7).
# Distinct from +proj=sterea (EPSG 9809 DOUBLE projection via the Gauss
# sphere): the two agree at the origin (both conformal, scale k0) and
# diverge by O(r^3/R^2) away from it — that mutual anchor is pinned in
# tests along with round-trip identity and the polar-aspect limit.
# --------------------------------------------------------------------------


def _conformal_lat(phi: np.ndarray, e: float) -> np.ndarray:
    es = e * np.sin(phi)
    return 2.0 * np.arctan(np.tan(np.pi / 4.0 + phi / 2.0)
                           * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)) - np.pi / 2.0


def stere_ob_forward(lon, lat, lon0: float, lat0: float, k0: float = 1.0,
                     x0: float = 0.0, y0: float = 0.0,
                     a: float = WGS84_A, e: float | None = None):
    """Snyder 21-27..21-31 / 3-1: ellipsoidal oblique stereographic."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    e = _E1 if e is None else e
    p1 = np.radians(lat0)
    chi1 = float(_conformal_lat(np.asarray(p1), e))
    m1 = np.cos(p1) / np.sqrt(1.0 - (e * np.sin(p1)) ** 2)
    chi = _conformal_lat(np.radians(lat), e)
    dl = _wrap_lam(np.radians(lon - lon0))
    A = (2.0 * a * k0 * m1
         / (np.cos(chi1) * (1.0 + np.sin(chi1) * np.sin(chi)
                            + np.cos(chi1) * np.cos(chi) * np.cos(dl))))
    x = x0 + A * np.cos(chi) * np.sin(dl)
    y = y0 + A * (np.cos(chi1) * np.sin(chi) - np.sin(chi1) * np.cos(chi) * np.cos(dl))
    return x, y


def stere_ob_inverse(x, y, lon0: float, lat0: float, k0: float = 1.0,
                     x0: float = 0.0, y0: float = 0.0,
                     a: float = WGS84_A, e: float | None = None):
    """Snyder 21-38..21-40 / 3-5: inverse via the conformal sphere angle."""
    x = np.asarray(x, np.float64) - x0
    y = np.asarray(y, np.float64) - y0
    e = _E1 if e is None else e
    p1 = np.radians(lat0)
    chi1 = float(_conformal_lat(np.asarray(p1), e))
    m1 = np.cos(p1) / np.sqrt(1.0 - (e * np.sin(p1)) ** 2)
    rho = np.hypot(x, y)
    ce = 2.0 * np.arctan2(rho * np.cos(chi1), 2.0 * a * k0 * m1)
    with np.errstate(divide="ignore", invalid="ignore"):
        chi = np.where(
            rho > 0.0,
            np.arcsin(np.clip(np.cos(ce) * np.sin(chi1)
                              + np.where(rho > 0, y * np.sin(ce) * np.cos(chi1) / np.where(rho > 0, rho, 1.0), 0.0),
                              -1.0, 1.0)),
            chi1)
    lam = np.arctan2(x * np.sin(ce),
                     rho * np.cos(chi1) * np.cos(ce) - y * np.sin(chi1) * np.sin(ce))
    lam = np.where(rho > 0.0, lam, 0.0)
    # conformal -> geodetic latitude (fixed point, ~5 iterations to 1e-12)
    phi = chi.copy()
    for _ in range(8):
        es = e * np.sin(phi)
        phi = 2.0 * np.arctan(np.tan(np.pi / 4.0 + chi / 2.0)
                              * ((1.0 + es) / (1.0 - es)) ** (e / 2.0)) - np.pi / 2.0
    return lon0 + np.degrees(lam), np.degrees(phi)


# --------------------------------------------------------------------------
# datums: ellipsoid registry + 7-parameter Helmert (EPSG method 9606,
# position-vector convention == PROJ +towgs84). Closes the documented
# national-grid refusals (OSGB 27700, CH1903 21781/2056, RD New 28992):
# reference semantics = any-CRS reprojection through a datum hub
# (`geopolars-geo/src/ops/proj.rs:33-70` goes through PROJ's WGS84 hub).
# The transform pivots geodetic -> geocentric XYZ (h=0, the standard 2D
# convention) -> Helmert -> WGS84 geodetic; published parameter sets are
# accurate to ~2-10 m over their home extents (documented per entry).
# --------------------------------------------------------------------------

# name -> (a, 1/f is stored as f) — public defining constants
ELLIPSOIDS: dict[str, tuple[float, float]] = {
    "WGS84": (WGS84_A, WGS84_F),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "bessel": (6377397.155, 1.0 / 299.1528128),
    "intl": (6378388.0, 1.0 / 297.0),
    "krass": (6378245.0, 1.0 / 298.3),
    "clrk66": (6378206.4, 1.0 / 294.9786982),
}

# datum name -> {"ellps", "towgs84"}: the 7 parameters transform THIS
# datum's geocentric coords TO WGS84 (tx, ty, tz in m; rx, ry, rz in
# arc-seconds, position-vector sign; ds in ppm) — the published PROJ/EPSG
# +towgs84 sets.
DATUMS: dict[str, dict] = {
    "WGS84": {"ellps": "WGS84", "towgs84": (0.0,) * 7},
    # OS Guide "A guide to coordinate systems in Great Britain" (GN7-2
    # family), single-set Helmert, ~5 m accuracy over GB
    "OSGB36": {"ellps": "airy",
               "towgs84": (446.448, -125.157, 542.060,
                           0.1502, 0.2470, 0.8421, -20.4894)},
    # swisstopo granit87 translations (CH1903/LV03 and CH1903+/LV95)
    "CH1903": {"ellps": "bessel",
               "towgs84": (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)},
    "CH1903+": {"ellps": "bessel",
                "towgs84": (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)},
    # NL Amersfoort (RD New), the widely-published legacy 7-param set
    "amersfoort": {"ellps": "bessel",
                   "towgs84": (565.417, 50.3319, 465.552,
                               -0.398957, 0.343988, -1.8774, 4.0725)},
    # DHDN (Potsdam / Rauenberg), Germany-wide set
    "potsdam": {"ellps": "bessel",
                "towgs84": (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)},
}

_AS2R = np.pi / (180.0 * 3600.0)


def _datum_is_wgs84(datum: dict | None) -> bool:
    if datum is None:
        return True
    ell = datum["ellps"]
    zero = all(abs(v) < 1e-12 for v in datum["towgs84"])
    # GRS80 == WGS84 to ~0.1 mm (module docstring) — hub-identical
    return zero and ell in ("WGS84", "GRS80")


def _datum_ell(datum: dict | None) -> tuple[float, float]:
    if datum is None:
        return WGS84_A, WGS84_F
    return ELLIPSOIDS[datum["ellps"]]


def geodetic_to_geocentric(lon, lat, a: float, f: float):
    """(lon, lat, h=0) -> geocentric XYZ on the given ellipsoid."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    e2 = f * (2.0 - f)
    sp = np.sin(phi)
    N = a / np.sqrt(1.0 - e2 * sp * sp)
    cp = np.cos(phi)
    return N * cp * np.cos(lam), N * cp * np.sin(lam), N * (1.0 - e2) * sp


def geocentric_to_geodetic(X, Y, Z, a: float, f: float):
    """Geocentric XYZ -> (lon, lat), iterative (h discarded — the 2D
    convention; 6 iterations converge to < 1e-11 deg for |h| < 10 km)."""
    X = np.asarray(X, np.float64)
    Y = np.asarray(Y, np.float64)
    Z = np.asarray(Z, np.float64)
    e2 = f * (2.0 - f)
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(6):
        sp = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * sp * sp)
        phi = np.arctan2(Z + e2 * N * sp, p)
    return np.degrees(lam), np.degrees(phi)


def _helmert_matrix(p: tuple) -> tuple[np.ndarray, np.ndarray]:
    """(M, t): x_wgs84 = M @ x + t for the position-vector 7 parameters."""
    tx, ty, tz, rx, ry, rz, ds = p
    rx, ry, rz = rx * _AS2R, ry * _AS2R, rz * _AS2R
    s = 1.0 + ds * 1e-6
    M = s * np.array([[1.0, -rz, ry],
                      [rz, 1.0, -rx],
                      [-ry, rx, 1.0]])
    return M, np.array([tx, ty, tz])


def datum_to_wgs84(lon, lat, datum: dict):
    a, f = _datum_ell(datum)
    X, Y, Z = geodetic_to_geocentric(lon, lat, a, f)
    M, t = _helmert_matrix(datum["towgs84"])
    V = M @ np.stack([X, Y, Z]) + t[:, None]
    return geocentric_to_geodetic(V[0], V[1], V[2], WGS84_A, WGS84_F)


def wgs84_to_datum(lon, lat, datum: dict):
    a, f = _datum_ell(datum)
    X, Y, Z = geodetic_to_geocentric(lon, lat, WGS84_A, WGS84_F)
    M, t = _helmert_matrix(datum["towgs84"])
    # exact inverse of the linearized transform — mm round-trips
    Minv = np.linalg.inv(M)
    V = Minv @ (np.stack([X, Y, Z]) - t[:, None])
    return geocentric_to_geodetic(V[0], V[1], V[2], a, f)


# --------------------------------------------------------------------------
# CRS spec parsing + generic transform
# --------------------------------------------------------------------------


# projections whose formulas here are parametrized by ellipsoid — the only
# ones a non-WGS84-ellipsoid datum may combine with (everything else keeps
# its WGS84 closed form; GRS80 counts as WGS84, module docstring)
_ELL_PARAM_PROJS = {"longlat", "tmerc", "sterea", "somerc", "stere_ob"}


def _parse_datum_params(params: dict) -> dict | None:
    """+datum= / +ellps= / +towgs84= -> datum dict (None when it is the
    WGS84 hub itself)."""
    if "datum" in params:
        name = str(params["datum"])
        if name == "WGS84":
            return None
        if name not in DATUMS:
            raise ValueError(
                f"unknown +datum={name} (known: {sorted(DATUMS)})")
        d = DATUMS[name]
        return None if _datum_is_wgs84(d) else d
    tow = params.get("towgs84")
    ell = params.get("ellps")
    if tow is None and ell is None:
        return None
    ellname = str(ell) if ell else "WGS84"
    if ellname not in ELLIPSOIDS:
        raise ValueError(
            f"unknown +ellps={ellname} (known: {sorted(ELLIPSOIDS)})")
    t = (0.0,) * 7
    if tow is not None and tow is not True:
        vals = [float(v) for v in str(tow).split(",")]
        if len(vals) == 3:
            vals += [0.0] * 4
        if len(vals) != 7:
            raise ValueError("+towgs84 takes 3 or 7 comma-separated values")
        t = tuple(vals)
    d = {"ellps": ellname, "towgs84": t}
    return None if _datum_is_wgs84(d) else d


def _validate_spec_datum(spec: dict) -> None:
    d = spec.get("datum")
    if d is None or d["ellps"] in ("WGS84", "GRS80"):
        return
    if spec["proj"] not in _ELL_PARAM_PROJS:
        raise ValueError(
            f"+proj={spec['proj']} on the {d['ellps']} ellipsoid is not "
            f"implemented (ellipsoid-parametrized projections here: "
            f"{sorted(_ELL_PARAM_PROJS)}); shift-only datums (WGS84/GRS80 "
            f"ellipsoid + towgs84) work with every projection"
        )


def parse_crs(crs: str) -> dict:
    """Parse an EPSG code or proj-string to a projection spec dict."""
    c = crs.strip()
    up = c.upper().replace(" ", "")
    if up in ("EPSG:4326", "WGS84", "CRS84", "OGC:CRS84") or (
            up.startswith("+PROJ=LONGLAT")
            and not any(k in up for k in ("DATUM=", "TOWGS84=", "ELLPS="))):
        return {"proj": "longlat"}
    if up in ("EPSG:3857", "WEBMERCATOR", "EPSG:900913") or up.startswith("+PROJ=WEBMERC"):
        return {"proj": "webmerc"}
    if re.fullmatch(r"EPSG:32[67]\d{2}", up):
        # 5-digit codes only: EPSG:326xx/327xx are UTM zones; 4-digit
        # EPSG:3260-3279 are unrelated CRSs and fall through to the
        # generic unsupported-CRS error below.
        code = int(up.split(":")[1])
        zone = code % 100
        if not 1 <= zone <= 60:
            raise ValueError(f"bad UTM EPSG code {crs!r}")
        return {"proj": "utm", "zone": zone, "north": code < 32700}
    if up == "EPSG:3035":
        return {"proj": "laea", "lat_0": 52.0, "lon_0": 10.0, "x_0": 4_321_000.0, "y_0": 3_210_000.0}
    if up == "EPSG:3395":  # World Mercator (ellipsoidal, natural origin)
        return {"proj": "merc", "lon_0": 0.0, "k_0": 1.0, "x_0": 0.0, "y_0": 0.0}
    if up == "EPSG:2154":  # RGF93 / Lambert-93 (GRS80 ~ WGS84, module docstring)
        return {"proj": "lcc", "lat_0": 46.5, "lon_0": 3.0, "lat_1": 49.0, "lat_2": 44.0,
                "x_0": 700_000.0, "y_0": 6_600_000.0, "k_0": 1.0}
    if up == "EPSG:5070":  # NAD83 / CONUS Albers (GRS80 ~ WGS84; datum shift NAD83~WGS84 < 2 m, documented)
        return {"proj": "aea", "lat_0": 23.0, "lon_0": -96.0, "lat_1": 29.5, "lat_2": 45.5,
                "x_0": 0.0, "y_0": 0.0}
    if up == "EPSG:3577":  # GDA94 / Australian Albers (southern cone, n < 0)
        return {"proj": "aea", "lat_0": 0.0, "lon_0": 132.0, "lat_1": -18.0, "lat_2": -36.0,
                "x_0": 0.0, "y_0": 0.0}
    if up == "EPSG:4087":  # WGS84 / World Equidistant Cylindrical (method 1028)
        return {"proj": "eqc", "lon_0": 0.0, "lat_ts": 0.0, "x_0": 0.0, "y_0": 0.0}
    if up == "EPSG:6933":  # WGS84 / NSIDC EASE-Grid 2.0 Global (method 9835)
        return {"proj": "cea", "lon_0": 0.0, "lat_ts": 30.0, "x_0": 0.0, "y_0": 0.0}
    if up == "EPSG:3413":  # NSIDC Sea Ice Polar Stereographic North
        return {"proj": "stere", "lat_ts": 70.0, "lon_0": -45.0, "south": False,
                "x_0": 0.0, "y_0": 0.0, "k_0": 1.0}
    if up == "EPSG:3031":  # Antarctic Polar Stereographic
        return {"proj": "stere", "lat_ts": -71.0, "lon_0": 0.0, "south": True,
                "x_0": 0.0, "y_0": 0.0, "k_0": 1.0}
    # --- national grids on non-WGS84 datums (Helmert datum step; the
    # r4-documented refusals, now closed) ---
    if up == "EPSG:27700":  # OSGB36 / British National Grid (Airy 1830)
        return {"proj": "tmerc", "lat_0": 49.0, "lon_0": -2.0,
                "k_0": 0.9996012717, "x_0": 400_000.0, "y_0": -100_000.0,
                "datum": DATUMS["OSGB36"]}
    if up in ("EPSG:21781", "EPSG:2056"):  # CH1903/LV03, CH1903+/LV95 (Bessel)
        lv95 = up == "EPSG:2056"
        return {"proj": "somerc",
                "lat_0": 46.0 + 57.0 / 60.0 + 8.66 / 3600.0,
                "lon_0": 7.0 + 26.0 / 60.0 + 22.5 / 3600.0, "k_0": 1.0,
                "x_0": 2_600_000.0 if lv95 else 600_000.0,
                "y_0": 1_200_000.0 if lv95 else 200_000.0,
                "datum": DATUMS["CH1903+" if lv95 else "CH1903"]}
    if up == "EPSG:28992":  # Amersfoort / RD New (Bessel, double stereographic)
        return {"proj": "sterea",
                "lat_0": 52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
                "lon_0": 5.0 + 23.0 / 60.0 + 15.5 / 3600.0,
                "k_0": 0.9999079, "x_0": 155_000.0, "y_0": 463_000.0,
                "datum": DATUMS["amersfoort"]}
    if c.startswith("+"):
        params: dict[str, str | bool] = {}
        for tok in c.split():
            tok = tok.lstrip("+")
            if "=" in tok:
                k, v = tok.split("=", 1)
                params[k] = v
            else:
                params[tok] = True
        datum = _parse_datum_params(params)
        spec = _projstring_spec(params, crs)
        if datum is not None:
            spec = {**spec, "datum": datum}
        _validate_spec_datum(spec)
        return spec
    raise ValueError(
        f"unsupported CRS {crs!r} (supported: EPSG:4326/3857/3035/3395/2154/5070/3413/3031/"
        "4087/6933/27700/21781/2056/28992, EPSG:326xx/327xx UTM, +proj=longlat|webmerc|merc|"
        "utm|tmerc|laea|lcc|aea|stere|sterea|somerc|aeqd|eqc|cea strings with optional "
        "+datum/+ellps/+towgs84)"
    )


def _projstring_spec(params: dict, crs: str) -> dict:
    proj = params.get("proj")
    if True:
        if proj == "utm":
            return {"proj": "utm", "zone": int(params["zone"]), "north": not params.get("south", False)}
        if proj == "tmerc":
            return {"proj": "tmerc", "lat_0": float(params.get("lat_0", 0.0)),
                    "lon_0": float(params.get("lon_0", 0.0)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0)),
                    "k_0": float(params.get("k_0", params.get("k", 1.0)))}
        if proj == "somerc":
            # EPSG 9814 Swiss oblique Mercator (CH1903-style national grids)
            return {"proj": "somerc", "lat_0": float(params.get("lat_0", 0.0)),
                    "lon_0": float(params.get("lon_0", 0.0)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0)),
                    "k_0": float(params.get("k_0", params.get("k", 1.0)))}
        if proj == "laea":
            return {
                "proj": "laea",
                "lat_0": float(params.get("lat_0", 0.0)),
                "lon_0": float(params.get("lon_0", 0.0)),
                "x_0": float(params.get("x_0", 0.0)),
                "y_0": float(params.get("y_0", 0.0)),
            }
        if proj == "longlat":
            return {"proj": "longlat"}
        if proj == "webmerc" or (proj == "merc" and params.get("R") == str(int(WEBMERCATOR_R))):
            return {"proj": "webmerc"}
        if proj == "merc":
            # PROJ semantics: +proj=merc on the default WGS84 ellipsoid is the
            # ELLIPSOIDAL Mercator (EPSG:3395 family); the spherical web tile
            # projection is +proj=webmerc / EPSG:3857.
            return {"proj": "merc", "lon_0": float(params.get("lon_0", 0.0)),
                    "k_0": float(params.get("k_0", params.get("k", 1.0))),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0))}
        if proj == "lcc":
            lat_1 = float(params.get("lat_1", 0.0))
            return {"proj": "lcc", "lat_0": float(params.get("lat_0", 0.0)),
                    "lon_0": float(params.get("lon_0", 0.0)), "lat_1": lat_1,
                    "lat_2": float(params.get("lat_2", lat_1)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0)),
                    "k_0": float(params.get("k_0", params.get("k", 1.0)))}
        if proj == "aea":
            return {"proj": "aea", "lat_0": float(params.get("lat_0", 0.0)),
                    "lon_0": float(params.get("lon_0", 0.0)),
                    "lat_1": float(params.get("lat_1", 29.5)),
                    "lat_2": float(params.get("lat_2", 45.5)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0))}
        if proj == "aeqd":
            return {"proj": "aeqd", "lat_0": float(params.get("lat_0", 0.0)),
                    "lon_0": float(params.get("lon_0", 0.0)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0))}
        if proj in ("eqc", "cea"):
            return {"proj": proj, "lon_0": float(params.get("lon_0", 0.0)),
                    "lat_ts": float(params.get("lat_ts", 0.0)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0))}
        if proj == "sterea":
            # EPSG 9809 oblique/equatorial stereographic (double projection)
            lat_0s = float(params.get("lat_0", 0.0))
            if abs(lat_0s) > 89.0:
                # the Gauss-sphere constants divide by (1 - sin lat_0):
                # at the poles they produce silent NaN, and the polar
                # aspect belongs to +proj=stere anyway
                raise ValueError(
                    f"+proj=sterea is the OBLIQUE/equatorial aspect (got "
                    f"lat_0={lat_0s}); use polar +proj=stere for |lat_0|=90"
                )
            return {"proj": "sterea", "lat_0": float(params.get("lat_0", 0.0)),
                    "lon_0": float(params.get("lon_0", 0.0)),
                    "x_0": float(params.get("x_0", 0.0)), "y_0": float(params.get("y_0", 0.0)),
                    "k_0": float(params.get("k_0", params.get("k", 1.0)))}
        if proj == "stere":
            lat_0 = float(params.get("lat_0", 90.0))
            if abs(lat_0) != 90.0:
                # oblique/equatorial SINGLE-projection aspect (Snyder ch.
                # 21) — r5: the last documented aspect refusal, closed
                return {"proj": "stere_ob", "lat_0": lat_0,
                        "lon_0": float(params.get("lon_0", 0.0)),
                        "x_0": float(params.get("x_0", 0.0)),
                        "y_0": float(params.get("y_0", 0.0)),
                        "k_0": float(params.get("k_0", params.get("k", 1.0)))}
            south = lat_0 < 0.0
            lat_ts = float(params.get("lat_ts", lat_0))
            if (lat_ts < 0.0) != south and abs(lat_ts) > 1e-9:
                raise ValueError("stere lat_ts must be in the same hemisphere as lat_0")
            return {"proj": "stere", "lat_ts": lat_ts, "lon_0": float(params.get("lon_0", 0.0)),
                    "south": south, "x_0": float(params.get("x_0", 0.0)),
                    "y_0": float(params.get("y_0", 0.0)),
                    "k_0": float(params.get("k_0", params.get("k", 1.0)))}
        raise ValueError(f"unsupported proj-string {crs!r}")


def _spec_ell(spec: dict) -> tuple[float, float, float]:
    """(a, f, e) for the spec's datum ellipsoid (WGS84 when none)."""
    a, f = _datum_ell(spec.get("datum"))
    return a, f, float(np.sqrt(f * (2.0 - f)))


def _to_lonlat(x: np.ndarray, y: np.ndarray, spec: dict):
    p = spec["proj"]
    if p == "longlat":
        return x, y
    if p == "webmerc":
        return webmercator_to_lonlat(x, y)
    if p == "utm":
        return utm_inverse(x, y, spec["zone"], spec["north"])
    if p == "laea":
        return laea_inverse(x, y, spec["lon_0"], spec["lat_0"], spec["x_0"], spec["y_0"])
    if p == "merc":
        return mercator_inverse(x, y, spec["lon_0"], spec["k_0"], spec["x_0"], spec["y_0"])
    if p == "lcc":
        return lcc_inverse(x, y, spec["lon_0"], spec["lat_0"], spec["lat_1"], spec["lat_2"],
                           spec["x_0"], spec["y_0"], spec["k_0"])
    if p == "aea":
        return aea_inverse(x, y, spec["lon_0"], spec["lat_0"], spec["lat_1"], spec["lat_2"],
                           spec["x_0"], spec["y_0"])
    if p == "stere":
        return stere_polar_inverse(x, y, spec["lon_0"], spec["lat_ts"], spec["south"],
                                   spec["x_0"], spec["y_0"], spec["k_0"])
    if p == "sterea":
        a, _f, e = _spec_ell(spec)
        return stere_oblique_inverse(x, y, spec["lon_0"], spec["lat_0"],
                                     spec["k_0"], spec["x_0"], spec["y_0"], a, e)
    if p == "stere_ob":
        a, _f, e = _spec_ell(spec)
        return stere_ob_inverse(x, y, spec["lon_0"], spec["lat_0"],
                                spec["k_0"], spec["x_0"], spec["y_0"], a, e)
    if p == "somerc":
        a, _f, e = _spec_ell(spec)
        return somerc_inverse(x, y, spec["lon_0"], spec["lat_0"],
                              spec["k_0"], spec["x_0"], spec["y_0"], a, e)
    if p == "tmerc":
        a, f, _e = _spec_ell(spec)
        return tmerc_inverse(x, y, spec["lon_0"], spec["lat_0"],
                             spec["k_0"], spec["x_0"], spec["y_0"], a, f)
    if p == "aeqd":
        return aeqd_inverse(x, y, spec["lon_0"], spec["lat_0"], spec["x_0"], spec["y_0"])
    if p == "eqc":
        return eqc_inverse(x, y, spec["lon_0"], spec["lat_ts"], spec["x_0"], spec["y_0"])
    if p == "cea":
        return cea_inverse(x, y, spec["lon_0"], spec["lat_ts"], spec["x_0"], spec["y_0"])
    raise ValueError(f"unsupported projection {p!r}")


def _from_lonlat(lon: np.ndarray, lat: np.ndarray, spec: dict):
    p = spec["proj"]
    if p == "longlat":
        return lon, lat
    if p == "webmerc":
        return lonlat_to_webmercator(lon, lat)
    if p == "utm":
        return utm_forward(lon, lat, spec["zone"], spec["north"])
    if p == "laea":
        return laea_forward(lon, lat, spec["lon_0"], spec["lat_0"], spec["x_0"], spec["y_0"])
    if p == "merc":
        return mercator_forward(lon, lat, spec["lon_0"], spec["k_0"], spec["x_0"], spec["y_0"])
    if p == "lcc":
        return lcc_forward(lon, lat, spec["lon_0"], spec["lat_0"], spec["lat_1"], spec["lat_2"],
                           spec["x_0"], spec["y_0"], spec["k_0"])
    if p == "aea":
        return aea_forward(lon, lat, spec["lon_0"], spec["lat_0"], spec["lat_1"], spec["lat_2"],
                           spec["x_0"], spec["y_0"])
    if p == "stere":
        return stere_polar_forward(lon, lat, spec["lon_0"], spec["lat_ts"], spec["south"],
                                   spec["x_0"], spec["y_0"], spec["k_0"])
    if p == "sterea":
        a, _f, e = _spec_ell(spec)
        return stere_oblique_forward(lon, lat, spec["lon_0"], spec["lat_0"],
                                     spec["k_0"], spec["x_0"], spec["y_0"], a, e)
    if p == "stere_ob":
        a, _f, e = _spec_ell(spec)
        return stere_ob_forward(lon, lat, spec["lon_0"], spec["lat_0"],
                                spec["k_0"], spec["x_0"], spec["y_0"], a, e)
    if p == "somerc":
        a, _f, e = _spec_ell(spec)
        return somerc_forward(lon, lat, spec["lon_0"], spec["lat_0"],
                              spec["k_0"], spec["x_0"], spec["y_0"], a, e)
    if p == "tmerc":
        a, f, _e = _spec_ell(spec)
        return tmerc_forward(lon, lat, spec["lon_0"], spec["lat_0"],
                             spec["k_0"], spec["x_0"], spec["y_0"], a, f)
    if p == "aeqd":
        return aeqd_forward(lon, lat, spec["lon_0"], spec["lat_0"], spec["x_0"], spec["y_0"])
    if p == "eqc":
        return eqc_forward(lon, lat, spec["lon_0"], spec["lat_ts"], spec["x_0"], spec["y_0"])
    if p == "cea":
        return cea_forward(lon, lat, spec["lon_0"], spec["lat_ts"], spec["x_0"], spec["y_0"])
    raise ValueError(f"unsupported projection {p!r}")


def transform_points(x, y, from_crs: str, to_crs: str):
    """Generic point transform via the WGS84 lon/lat hub. When the two
    CRSs sit on different datums the hub applies the 7-parameter Helmert
    step(s) (source datum -> WGS84 -> target datum)."""
    fs = parse_crs(from_crs)
    ts = parse_crs(to_crs)
    if fs == ts:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    lon, lat = _to_lonlat(np.asarray(x, np.float64), np.asarray(y, np.float64), fs)
    fd, td = fs.get("datum"), ts.get("datum")
    if fd != td:
        if not _datum_is_wgs84(fd):
            lon, lat = datum_to_wgs84(lon, lat, fd)
        if not _datum_is_wgs84(td):
            lon, lat = wgs84_to_datum(lon, lat, td)
    return _from_lonlat(lon, lat, ts)


def to_crs(ga: GeometryArray, from_crs: str, to_crs: str) -> GeometryArray:
    """Reproject every coordinate (`geoseries.rs:148-161` semantics).

    The 4326<->3857 pair keeps its direct closed form (bit-exact with the
    documented SQL mirror); every other supported pair goes through the
    lon/lat pivot in :func:`transform_points`.
    """
    x, y = ga.coords[:, 0], ga.coords[:, 1]
    try:
        f, t = _norm(from_crs), _norm(to_crs)
        if f == t:
            return ga
        if f == "EPSG:4326":
            nx, ny = lonlat_to_webmercator(x, y)
        else:
            nx, ny = webmercator_to_lonlat(x, y)
    except ValueError:
        nx, ny = transform_points(x, y, from_crs, to_crs)
    return ga.with_coords(np.column_stack([nx, ny]))
