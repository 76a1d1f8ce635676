"""Aperture-7 icosahedral hexagonal tiles (H3-style), from public math.

BASELINE.json's north star names H3-res-7 tile assignment. This module
implements the geometric structure that defines H3 — gnomonic projection
onto the 20 faces of an icosahedron, a hexagonal lattice per face, and the
aperture-7 hierarchy in which each resolution's lattice is the previous
one's index-7 sublattice (scaled by 1/sqrt(7) and rotated by atan(sqrt(3)/5)
= 19.10660535...deg, the (2,1) lattice-vector relation) — as vectorized
NumPy over lon/lat columns.

Id parity: by default this index does NOT reproduce canonical H3 ids
(see geom/h3.py, which now DOES: the base-cell orientation structure was
derived in-sandbox and validated against five published anchor ids; pass
``canonical=True`` here to route through it). The default h3ish ids remain
for speed and layout stability; they deliver the same *properties* the
pipelines rely on —
global coverage, ~equal-area cells, deterministic assignment, 7-fold
hierarchy with parent/child navigation — behind the engine's abstract
tile-id contract (SURVEY.md §7: any deterministic space partition satisfies
the rollup/join contract). Faces are seamed: a cell straddling a face edge
is represented per-face (more boundary cells than canonical H3's pentagon
mechanism, same partition semantics).

Id layout (int64): [res:4][face:5][q+2^21:22][r+2^21:22]  (res <= 10).
"""

from __future__ import annotations

import numpy as np

_PHI = (1.0 + np.sqrt(5.0)) / 2.0

# aperture-7 sublattice rotation: angle of lattice vector (2,1), atan(sqrt(3)/5)
APERTURE7_ROT = float(np.arctan(np.sqrt(3.0) / 5.0))

# base hex circumradius on the gnomonic plane, calibrated so res 0 has
# ~6 cells per face (~120 globally, the H3 res-0 scale)
_S0 = 0.2187

MAX_RES = 10
_QR_BITS = 22
_QR_OFF = 1 << (_QR_BITS - 1)
_QR_MASK = (1 << _QR_BITS) - 1


def _icosahedron():
    """(face_centers (20,3), face_e1 (20,3), face_e2 (20,3)) — deterministic."""
    v = []
    for a in (-1.0, 1.0):
        for b in (-_PHI, _PHI):
            v.append((0.0, a, b))
            v.append((a, b, 0.0))
            v.append((b, 0.0, a))
    verts = np.array(sorted(set(v)))
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    # faces = vertex triples at mutual edge distance (the minimum distance)
    d = np.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=2)
    edge = np.min(d[d > 1e-9])
    adj = np.abs(d - edge) < 1e-9
    faces = []
    n = len(verts)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces = sorted(faces)
    assert len(faces) == 20
    centers = np.array([verts[list(f)].mean(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    e1 = np.empty_like(centers)
    e2 = np.empty_like(centers)
    for fi, f in enumerate(faces):
        c = centers[fi]
        v0 = verts[f[0]]
        t = v0 - np.dot(v0, c) * c
        e1[fi] = t / np.linalg.norm(t)
        e2[fi] = np.cross(c, e1[fi])
    return centers, e1, e2


_CENTERS, _E1, _E2 = _icosahedron()


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    cp = np.cos(phi)
    return np.column_stack([cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)])


def _xyz_to_lonlat(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.degrees(np.arctan2(v[:, 1], v[:, 0])),
        np.degrees(np.arcsin(np.clip(v[:, 2], -1.0, 1.0))),
    )


def _res_scale_rot(res: int) -> tuple[float, float]:
    s = _S0 / np.sqrt(7.0) ** res
    theta = res * APERTURE7_ROT
    return float(s), float(theta)


def _axial_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube rounding of fractional axial coords (hex lattice)."""
    x, z = q, r
    y = -x - z
    # np.rint == np.round(x, 0) for all doubles (round-half-even) but skips
    # numpy's decimal-scaling path (~50x faster on 2M rows)
    rx, ry, rz = np.rint(x), np.rint(y), np.rint(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def h3ish_cell_id(lon: np.ndarray, lat: np.ndarray, res: int = 7,
                  canonical: bool = False) -> np.ndarray:
    """Aperture-7 icosahedral hex cell id per point, vectorized.

    canonical=False (default): fast h3ish int64 ids (layout in module doc).
    canonical=True: bit-exact Uber H3 ids (uint64) via geom/h3.py.
    """
    if canonical:
        from . import h3 as _h3
        return _h3.latlng_to_cell(np.asarray(lat, np.float64),
                                  np.asarray(lon, np.float64), res)
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    cp = np.cos(phi)
    vx = cp * np.cos(lam)
    vy = cp * np.sin(lam)
    vz = np.sin(phi)
    # nearest face center by running max over the 20 faces — avoids the
    # (n, 20) dots matrix + argmax scan (320 MB of traffic at 2M points; the
    # big temporaries were the kernel's bottleneck in long-running processes)
    best = vx * _CENTERS[0, 0] + vy * _CENTERS[0, 1] + vz * _CENTERS[0, 2]
    face = np.zeros(len(best), dtype=np.int64)
    for f in range(1, 20):
        d = vx * _CENTERS[f, 0] + vy * _CENTERS[f, 1] + vz * _CENTERS[f, 2]
        m = d > best
        np.copyto(best, d, where=m)
        face[m] = f
    # gnomonic projection onto the face tangent plane; v.c is the running
    # max itself — no second row-wise product
    scale = 1.0 / best
    cg = _CENTERS[face]
    e1 = _E1[face]
    e2 = _E2[face]
    px = vx * scale - cg[:, 0]
    py = vy * scale - cg[:, 1]
    pz = vz * scale - cg[:, 2]
    u = px * e1[:, 0] + py * e1[:, 1] + pz * e1[:, 2]
    w = px * e2[:, 0] + py * e2[:, 1] + pz * e2[:, 2]
    s, theta = _res_scale_rot(res)
    ct, st = np.cos(theta), np.sin(theta)
    ur = (ct * u + st * w) / s
    wr = (-st * u + ct * w) / s
    # pointy-top axial coords
    q = np.sqrt(3.0) / 3.0 * ur - wr / 3.0
    r = 2.0 / 3.0 * wr
    qi, ri = _axial_round(q, r)
    return (
        (np.int64(res) << np.int64(54))
        | (face.astype(np.int64) << np.int64(49))
        | ((qi + _QR_OFF) << np.int64(_QR_BITS))
        | (ri + _QR_OFF)
    )


def h3ish_resolution(ids: np.ndarray) -> np.ndarray:
    return (np.asarray(ids, np.int64) >> np.int64(54)) & np.int64(0xF)


def h3ish_face(ids: np.ndarray) -> np.ndarray:
    return (np.asarray(ids, np.int64) >> np.int64(49)) & np.int64(0x1F)


def h3ish_cell_center(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) of each cell's center."""
    ids = np.asarray(ids, np.int64)
    res = h3ish_resolution(ids)
    face = h3ish_face(ids)
    qi = ((ids >> np.int64(_QR_BITS)) & np.int64(_QR_MASK)) - _QR_OFF
    ri = (ids & np.int64(_QR_MASK)) - _QR_OFF
    out = np.empty((len(ids), 3))
    for rv in np.unique(res):
        m = res == rv
        s, theta = _res_scale_rot(int(rv))
        ur = s * (np.sqrt(3.0) * qi[m] + np.sqrt(3.0) / 2.0 * ri[m])
        wr = s * 1.5 * ri[m]
        ct, st = np.cos(theta), np.sin(theta)
        u = ct * ur - st * wr
        w = st * ur + ct * wr
        f = face[m]
        p = _CENTERS[f] + u[:, None] * _E1[f] + w[:, None] * _E2[f]
        out[m] = p / np.linalg.norm(p, axis=1, keepdims=True)
    return _xyz_to_lonlat(out)


def h3ish_to_parent(ids: np.ndarray) -> np.ndarray:
    """Parent cell at res-1 (the cell containing this cell's center)."""
    ids = np.asarray(ids, np.int64)
    res = h3ish_resolution(ids)
    if (res == 0).any():
        raise ValueError("res-0 cells have no parent")
    lon, lat = h3ish_cell_center(ids)
    out = np.empty(len(ids), dtype=np.int64)
    for rv in np.unique(res):
        m = res == rv
        out[m] = h3ish_cell_id(lon[m], lat[m], int(rv) - 1)
    return out
