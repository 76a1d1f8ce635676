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
- proj-strings: ``+proj=longlat | merc (web) | utm +zone=N [+south] |
  laea +lat_0 +lon_0 [+x_0 +y_0]``.

Like the reference, transformation is point-wise with no densification (same
documented dateline caveat).
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

_N = WGS84_F / (2.0 - WGS84_F)
_A_BAR = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)
_UTM_K0 = 0.9996
_UTM_E0 = 500_000.0
_UTM_N0_SOUTH = 10_000_000.0


def tm_forward(lon, lat, lon0: float, k0: float = _UTM_K0, e0: float = 0.0, n0: float = 0.0):
    """Ellipsoidal transverse Mercator forward (Karney-style series)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    s = np.sin(phi)
    c2n = 2.0 * np.sqrt(_N) / (1.0 + _N)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # at the exact poles arctanh(±1) = ±inf and the infinities propagate
        # correctly: t=±inf -> xi' = ±pi/2, eta' = 0 — no clamping needed
        t = np.sinh(np.arctanh(s) - c2n * np.arctanh(c2n * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return e0 + k0 * _A_BAR * eta, n0 + k0 * _A_BAR * xi


def tm_inverse(E, N, lon0: float, k0: float = _UTM_K0, e0: float = 0.0, n0: float = 0.0):
    """Ellipsoidal transverse Mercator inverse (series)."""
    E = np.asarray(E, np.float64)
    N = np.asarray(N, np.float64)
    xi = (N - n0) / (k0 * _A_BAR)
    eta = (E - e0) / (k0 * _A_BAR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    # conformal -> geodetic latitude: Newton on t(phi) = tan(chi), where
    # t = sinh(psi), psi = artanh(sin phi) - c * artanh(c sin phi),
    # dt/dphi = sqrt(1+t^2) * (1/cos phi - c^2 cos phi / (1 - c^2 sin^2 phi))
    phi = chi.copy()
    c2n = 2.0 * np.sqrt(_N) / (1.0 + _N)
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
# CRS spec parsing + generic transform
# --------------------------------------------------------------------------


def parse_crs(crs: str) -> dict:
    """Parse an EPSG code or proj-string to a projection spec dict."""
    c = crs.strip()
    up = c.upper().replace(" ", "")
    if up in ("EPSG:4326", "WGS84", "CRS84", "OGC:CRS84") or up.startswith("+PROJ=LONGLAT"):
        return {"proj": "longlat"}
    if up in ("EPSG:3857", "WEBMERCATOR", "EPSG:900913") or up.startswith("+PROJ=MERC"):
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
    if c.startswith("+"):
        params: dict[str, str | bool] = {}
        for tok in c.split():
            tok = tok.lstrip("+")
            if "=" in tok:
                k, v = tok.split("=", 1)
                params[k] = v
            else:
                params[tok] = True
        proj = params.get("proj")
        if proj == "utm":
            return {"proj": "utm", "zone": int(params["zone"]), "north": not params.get("south", False)}
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
        if proj in ("merc", "webmerc"):
            return {"proj": "webmerc"}
        raise ValueError(f"unsupported proj-string {crs!r}")
    raise ValueError(
        f"unsupported CRS {crs!r} (supported: EPSG:4326/3857/3035, EPSG:326xx/327xx UTM, "
        "+proj=longlat|merc|utm|laea strings)"
    )


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
    raise ValueError(f"unsupported projection {p!r}")


def transform_points(x, y, from_crs: str, to_crs: str):
    """Generic point transform via the lon/lat pivot."""
    fs = parse_crs(from_crs)
    ts = parse_crs(to_crs)
    if fs == ts:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    lon, lat = _to_lonlat(np.asarray(x, np.float64), np.asarray(y, np.float64), fs)
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
