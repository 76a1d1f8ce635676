"""Offset curve (GEOS ``OffsetCurve`` / PostGIS ST_OffsetCurve / shapely
``offset_curve``): the curve parallel to a line at signed distance ``d``
(positive = left of the travel direction, negative = right).

The reference has no offset op (GeoPolars' geo crate exposes none); this
is the standard cartography/routing primitive (lane casings, parallel
labels, setback lines). Classic raw-offset + cleanup construction, all on
engine-local machinery:

1. **Raw offset**: each segment translated by ``d * left_normal``;
   at OUTSIDE joints (turn away from the offset side) a circular-arc
   fan of ``quad_segs`` steps per quadrant around the joint vertex; at
   INSIDE joints both offset endpoints are kept — the crossing is
   resolved by the next step.
2. **Node** the raw polyline against itself (`overlay.node_segments`,
   the same snap-rounded fixed-point sweep the boolean overlay uses).
3. **Distance filter**: keep only noded pieces whose midpoint is at
   distance >= ``|d| * cos(arc_step / 2)`` from the input line — inside
   spurs sit at ``|d| * cos(turn)`` from the NEXT segment and drop out,
   while genuine arc chords (sagitta ``1 - cos(step/2)``) survive.
   Concave turns shallower than the arc step leave sub-tolerance spurs,
   the same epsilon behavior GEOS' own curve builder has.
4. **Merge** kept pieces at degree-2 endpoints (`kernels.line_merge`)
   and orient every chain along the input's travel direction (GEOS
   keeps the input direction for both signs of ``d``).

Output: LINESTRING for a single chain, MULTILINESTRING when the curve is
split (input self-proximity swallows part of the offset), missing for
``d``-collapsed or non-lineal rows. ``d == 0`` returns the input
unchanged. Closed paths offset to closed rings (joint at the seam too).
"""

from __future__ import annotations

import math

import numpy as np

from geopolars_ray.geom.array import (
    LINEARRING,
    LINESTRING,
    MULTILINESTRING,
    GeometryArray,
)
from geopolars_ray.geom.overlay import CLIPPING, SUBJECT, node_segments


def _paths_of_row(ga: GeometryArray, i: int) -> list[np.ndarray]:
    return ga.coord_paths(i)


def _raw_offset(c: np.ndarray, d: float, quad_segs: int) -> np.ndarray | None:
    """Raw offset polyline of one path (arc fans at outside joints)."""
    closed = bool((c[0] == c[-1]).all()) and len(c) >= 4
    v = c[:-1] if closed else c
    seg_p = v if closed else c[:-1]
    seg_q = np.roll(v, -1, axis=0) if closed else c[1:]
    dv = seg_q - seg_p
    L = np.hypot(dv[:, 0], dv[:, 1])
    ok = L > 0
    seg_p, seg_q, dv, L = seg_p[ok], seg_q[ok], dv[ok], L[ok]
    m = len(seg_p)
    if m == 0:
        return None
    u = dv / L[:, None]
    normal = np.column_stack([-u[:, 1], u[:, 0]])  # left of travel
    off = normal * d
    step = math.pi / (2.0 * quad_segs)
    pts: list[np.ndarray] = []
    n_joints = m if closed else m - 1
    pts.append(seg_p[0] + off[0])
    for j in range(n_joints):
        k = (j + 1) % m
        pts.append(seg_q[j] + off[j])
        cross = u[j, 0] * u[k, 1] - u[j, 1] * u[k, 0]
        if cross * d < 0:  # outside joint: arc fan around the vertex
            a0 = math.atan2(off[j, 1], off[j, 0])
            a1 = math.atan2(off[k, 1], off[k, 0])
            delta = (a1 - a0 + math.pi) % (2.0 * math.pi) - math.pi
            steps = max(1, int(math.ceil(abs(delta) / step)))
            vx, vy = float(seg_q[j, 0]), float(seg_q[j, 1])
            r = abs(d)
            # a0/a1 are the angles of the offset VECTORS themselves (sign
            # of d already folded in), so the fan sweeps the actual arc
            for s in range(1, steps):
                a = a0 + delta * s / steps
                pts.append(np.array([vx + r * math.cos(a), vy + r * math.sin(a)]))
        pts.append(seg_p[k] + off[k])
    if not closed:
        pts.append(seg_q[-1] + off[-1])
    else:
        pts.append(pts[0])
    arr = np.asarray(pts)
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
    arr = arr[keep]
    return arr if len(arr) >= 2 else None


def _min_dist_per_point(pts: np.ndarray, segs_p: np.ndarray, segs_q: np.ndarray,
                        pair_budget: int = 4_000_000) -> np.ndarray:
    """Per-point min distance to a segment set, strip-chunked."""
    a = segs_p
    dseg = segs_q - segs_p
    L2 = (dseg ** 2).sum(axis=1)
    L2s = np.where(L2 == 0, 1.0, L2)
    out = np.empty(len(pts))
    chunk = max(1, pair_budget // max(len(a), 1))
    for lo in range(0, len(pts), chunk):
        P = pts[lo:lo + chunk]
        ap = P[:, None, :] - a[None, :, :]
        t = np.clip((ap * dseg[None, :, :]).sum(axis=2) / L2s[None, :], 0.0, 1.0)
        proj = a[None, :, :] + t[:, :, None] * dseg[None, :, :]
        out[lo:lo + chunk] = np.sqrt(((P[:, None, :] - proj) ** 2).sum(axis=2)).min(axis=1)
    return out


def _nearest_seg_idx(probe: np.ndarray, segs_p: np.ndarray,
                     segs_q: np.ndarray) -> int:
    """Index of the segment nearest to one probe point (the arg variant
    of the clip/project distance used throughout this module)."""
    dseg = segs_q - segs_p
    L2 = (dseg ** 2).sum(axis=1)
    L2s = np.where(L2 == 0, 1.0, L2)
    ap = probe[None, :] - segs_p
    t = np.clip((ap * dseg).sum(axis=1) / L2s, 0.0, 1.0)
    proj = segs_p + t[:, None] * dseg
    return int(((probe[None, :] - proj) ** 2).sum(axis=1).argmin())


def _min_vertex_to_pieces(verts: np.ndarray, pieces: np.ndarray,
                          pair_budget: int = 4_000_000) -> np.ndarray:
    """Per-PIECE min distance from any of ``verts`` to the piece segment
    ((m, 2, 2) pieces), strip-chunked over vertices."""
    a = pieces[:, 0]
    dseg = pieces[:, 1] - pieces[:, 0]
    L2 = (dseg ** 2).sum(axis=1)
    L2s = np.where(L2 == 0, 1.0, L2)
    out = np.full(len(pieces), np.inf)
    chunk = max(1, pair_budget // max(len(pieces), 1))
    for lo in range(0, len(verts), chunk):
        V = verts[lo:lo + chunk]
        ap = V[:, None, :] - a[None, :, :]
        t = np.clip((ap * dseg[None, :, :]).sum(axis=2) / L2s[None, :], 0.0, 1.0)
        proj = a[None, :, :] + t[:, :, None] * dseg[None, :, :]
        dd = np.sqrt(((V[:, None, :] - proj) ** 2).sum(axis=2)).min(axis=0)
        out = np.minimum(out, dd)
    return out


def _offset_one(paths: list[np.ndarray], d: float, quad_segs: int):
    from geopolars_ray.geom import kernels as K

    raws = [r for r in (_raw_offset(c, d, quad_segs) for c in paths)
            if r is not None]
    if not raws:
        return None
    # node the raw curve against ITSELF and against the INPUT (CLIPPING
    # polarity): pieces that cross the input line must be split at the
    # crossing, or a midsection filter would keep a chord that dives
    # through the input
    segments = []
    for r in raws:
        for k in range(len(r) - 1):
            segments.append(((float(r[k, 0]), float(r[k, 1])),
                             (float(r[k + 1, 0]), float(r[k + 1, 1])), SUBJECT))
    for c in paths:
        for k in range(len(c) - 1):
            segments.append(((float(c[k, 0]), float(c[k, 1])),
                             (float(c[k + 1, 0]), float(c[k + 1, 1])), CLIPPING))
    groups = [(p, q) for p, q, m_s, _m_c in node_segments(segments) if m_s >= 1]
    if not groups:
        return None
    in_p = np.concatenate([c[:-1] for c in paths])
    in_q = np.concatenate([c[1:] for c in paths])
    in_v = np.concatenate([c for c in paths])
    # exact piece<->input distance (no crossings remain after noding):
    # min over piece-endpoint->input-segment and input-vertex->piece
    ends = np.array([[p, q] for p, q in groups])  # (m, 2, 2)
    d_p = _min_dist_per_point(ends[:, 0], in_p, in_q)
    d_q = _min_dist_per_point(ends[:, 1], in_p, in_q)
    d_v = _min_vertex_to_pieces(in_v, ends)
    dist = np.minimum(np.minimum(d_p, d_q), d_v)
    thr = abs(d) * math.cos(math.pi / (4.0 * quad_segs)) * (1.0 - 1e-9)
    kept = [pq for pq, di in zip(groups, dist) if di >= thr]
    if not kept:
        return None
    mls = GeometryArray.from_pylist(
        [("multilinestring", [[p, q] for p, q in kept])])
    merged = K.line_merge(mls).to_pylist()[0]
    if merged is None:
        return None
    chains = [merged[1]] if merged[0] == "linestring" else merged[1]
    # orient each chain along the input travel direction: compare the
    # chain's middle segment against its NEAREST input segment
    dseg = in_q - in_p
    out_chains = []
    for ch in chains:
        cc = np.asarray(ch)
        mid = len(cc) // 2
        a = cc[max(mid - 1, 0)]
        b = cc[min(mid, len(cc) - 1)]
        if (a == b).all() and len(cc) >= 2:
            a, b = cc[0], cc[1]
        j = _nearest_seg_idx((a + b) / 2.0, in_p, in_q)
        if float(np.dot(b - a, dseg[j])) < 0:
            cc = cc[::-1]
        out_chains.append([(float(x), float(y)) for x, y in cc])
    if len(out_chains) == 1:
        return ("linestring", out_chains[0])
    return ("multilinestring", out_chains)


def offset_curve(ga: GeometryArray, distance: float,
                 quad_segs: int = 8) -> GeometryArray:
    """Offset curve per lineal row (see module docstring). ``distance``
    > 0 = left of travel, < 0 = right; 0 returns the row unchanged.
    Non-lineal / missing rows come back missing."""
    if quad_segs < 1:
        raise ValueError("quad_segs must be >= 1")
    out: list = []
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t not in (LINESTRING, LINEARRING, MULTILINESTRING):
            out.append(None)
            continue
        paths = _paths_of_row(ga, i)
        if not paths:
            out.append(None)
            continue
        if distance == 0.0:
            kind = ("linestring" if len(paths) == 1 else "multilinestring")
            body = ([(float(x), float(y)) for x, y in paths[0]]
                    if len(paths) == 1 else
                    [[(float(x), float(y)) for x, y in c] for c in paths])
            out.append((kind, body))
            continue
        out.append(_offset_one(paths, float(distance), int(quad_segs)))
    return GeometryArray.from_pylist(out)
