"""clip_by_rect — clip every geometry to an axis-aligned rectangle.

Beyond-reference operator (the reference exposes no overlay/clip ops; this
mirrors the shapely/GeoPandas ``clip_by_rect`` surface users reach for
first). The coordinate-proportional work is vectorized over the flat ragged
buffers (each Sutherland–Hodgman pass runs over ALL rings of the batch at
once); ragged-output reassembly is O(#rings) index bookkeeping:

- points / multipoints: inclusive containment mask;
- polygons / multipolygons: Sutherland–Hodgman against the four half-planes,
  one vectorized pass per edge over ALL rings at once (pair classification
  -> per-pair emission counts -> cumsum offsets -> two scatters);
- linestrings / multilinestrings: Liang–Barsky per segment, then vectorized
  chain splitting (a new part starts wherever the previous segment was
  dropped or either shared endpoint was moved by clipping).

Known Sutherland–Hodgman property (documented, not hidden): a CONCAVE ring
whose intersection with the rectangle is disconnected comes back as a single
ring whose pieces are joined by zero-width bridges along the clip boundary.
Area, point-membership and bounds are still exact (the bridges are
degenerate); only ring topology is coarser than a full overlay would give.
Holes are clipped ring-by-ring, which is correct for a convex clip window.

Empty results become MISSING geometries (0 parts), the array's null
representation — ``is_empty`` reports them.
"""

from __future__ import annotations

import numpy as np

from geopolars_ray.geom.array import (
    LINEARRING,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryArray,
)

_POINTISH = (POINT, MULTIPOINT)
# LINEARRING clips as a stored-closed polyline; output degrades to
# LineString/MultiLineString (a clipped ring is no longer a ring)
_LINEISH = (LINESTRING, LINEARRING, MULTILINESTRING)
_POLYISH = (POLYGON, MULTIPOLYGON)


def _seg_sums(cnt: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-range sums of ``cnt`` over ``offsets`` ranges (safe for empty
    ranges, unlike ``np.add.reduceat``)."""
    cs = np.concatenate([[0], np.cumsum(cnt)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def _sh_pass(coords: np.ndarray, offsets: np.ndarray, axis: int, c: float, keep_ge: bool):
    """One Sutherland–Hodgman half-plane pass over OPEN rings.

    ``keep_ge``: keep the side ``coords[:, axis] >= c`` (else ``<= c``).
    Returns (new_coords, new_offsets) with the same number of rings (some
    possibly empty).
    """
    n = len(coords)
    if n == 0:
        return coords, offsets
    last = offsets[1:] - 1
    first = offsets[:-1]
    ok = last >= first  # non-empty rings
    # pair every vertex with its PREDECESSOR (vp), built as one contiguous
    # shift + a small per-ring wrap scatter (a full row-gather was the
    # pass's hot spot). This alignment emits kept vertex i at slot i, so a
    # fully-inside ring is a FIXED POINT vertex-for-vertex — pairing with
    # the successor instead rotates the ring by one per pass (caught by the
    # idempotence property test on degenerate rings).
    vp = np.empty_like(coords)
    vp[1:] = coords[:-1]
    vp[first[ok]] = coords[last[ok]]
    val = coords[:, axis]
    if keep_ge:
        in_cur = val >= c
    else:
        in_cur = val <= c
    in_prev = np.empty_like(in_cur)
    in_prev[1:] = in_cur[:-1]
    in_prev[first[ok]] = in_cur[last[ok]]
    cross = in_prev != in_cur
    cnt = in_cur.astype(np.int64)
    cnt += cross
    pos = np.cumsum(cnt)
    total = int(pos[-1])
    pos -= cnt
    out = np.empty((total, 2), dtype=np.float64)
    ci = np.nonzero(cross)[0]
    if len(ci):
        vp_c = vp[ci]
        vc_c = coords[ci]
        t = (c - vp_c[:, axis]) / (vc_c[:, axis] - vp_c[:, axis])
        inter = vp_c + t[:, None] * (vc_c - vp_c)
        inter[:, axis] = c  # exact on the clip line
        # the FREE coordinate can escape the endpoints' interval by rounding
        # (e.g. 1 + 1*(tiny - 1) -> 0.0 when `tiny` is subnormal), which
        # would leak a vertex outside the rect and break clip idempotence;
        # clamp to the segment's endpoint hull (both endpoints are already
        # inside every previously-applied half-plane)
        o = 1 - axis
        inter[:, o] = np.clip(inter[:, o], np.minimum(vp_c[:, o], vc_c[:, o]),
                              np.maximum(vp_c[:, o], vc_c[:, o]))
        out[pos[ci]] = inter
    ji = np.nonzero(in_cur)[0]
    if len(ji):
        out[pos[ji] + cross[ji]] = coords[ji]
    new_offsets = np.concatenate([[0], np.cumsum(_seg_sums(cnt, offsets))])
    return out, new_offsets


def _sh_pass_halfplane(coords: np.ndarray, offsets: np.ndarray, a: float, b: float, d: float):
    """One Sutherland–Hodgman pass against the half-plane a*x + b*y <= d.

    The general-line sibling of :func:`_sh_pass` (same pairing/emission
    scheme). Intersections cannot be snapped exactly onto an oblique line
    in floats, so they are clamped to the segment's endpoint hull only —
    clip-by-convex is idempotent to ~1 ULP rather than bit-exactly (the
    axis-aligned rect path keeps its exact contract).
    """
    n = len(coords)
    if n == 0:
        return coords, offsets
    last = offsets[1:] - 1
    first = offsets[:-1]
    ok = last >= first
    vp = np.empty_like(coords)
    vp[1:] = coords[:-1]
    vp[first[ok]] = coords[last[ok]]
    f_cur = a * coords[:, 0] + b * coords[:, 1]
    in_cur = f_cur <= d
    in_prev = np.empty_like(in_cur)
    in_prev[1:] = in_cur[:-1]
    in_prev[first[ok]] = in_cur[last[ok]]
    cross = in_prev != in_cur
    cnt = in_cur.astype(np.int64)
    cnt += cross
    pos = np.cumsum(cnt)
    total = int(pos[-1])
    pos -= cnt
    out = np.empty((total, 2), dtype=np.float64)
    ci = np.nonzero(cross)[0]
    if len(ci):
        vp_c = vp[ci]
        vc_c = coords[ci]
        f_p = a * vp_c[:, 0] + b * vp_c[:, 1]
        f_c = f_cur[ci]
        t = (d - f_p) / (f_c - f_p)
        inter = vp_c + t[:, None] * (vc_c - vp_c)
        # rounding can push the interpolated point outside the segment's
        # bounding box; clamp to the endpoint hull (both endpoints satisfy
        # every previously-applied half-plane)
        inter[:, 0] = np.clip(inter[:, 0], np.minimum(vp_c[:, 0], vc_c[:, 0]),
                              np.maximum(vp_c[:, 0], vc_c[:, 0]))
        inter[:, 1] = np.clip(inter[:, 1], np.minimum(vp_c[:, 1], vc_c[:, 1]),
                              np.maximum(vp_c[:, 1], vc_c[:, 1]))
        out[pos[ci]] = inter
    ji = np.nonzero(in_cur)[0]
    if len(ji):
        out[pos[ji] + cross[ji]] = coords[ji]
    new_offsets = np.concatenate([[0], np.cumsum(_seg_sums(cnt, offsets))])
    return out, new_offsets


def _clip_rings(coords: np.ndarray, offsets: np.ndarray, rect) -> tuple[np.ndarray, np.ndarray]:
    """Clip OPEN rings by the rectangle (4 S-H passes)."""
    xmin, ymin, xmax, ymax = rect
    for axis, c, keep_ge in ((0, xmin, True), (0, xmax, False), (1, ymin, True), (1, ymax, False)):
        coords, offsets = _sh_pass(coords, offsets, axis, c, keep_ge)
    return coords, offsets


class _RectClip:
    """Axis-aligned clip window (exact snap-to-line contract)."""

    def __init__(self, rect):
        self.rect = rect

    def clip_rings(self, coords, offsets):
        return _clip_rings(coords, offsets, self.rect)

    def seg_params(self, p, d):
        return _lb_params(p, d, self.rect)

    def clamp(self, pts):
        return _clamp_rect(pts, self.rect)

    def point_mask(self, pts):
        xmin, ymin, xmax, ymax = self.rect
        return ((pts[:, 0] >= xmin) & (pts[:, 0] <= xmax)
                & (pts[:, 1] >= ymin) & (pts[:, 1] <= ymax))


class _ConvexClip:
    """Convex clip polygon as half-planes A @ p <= D (CCW inward-left)."""

    def __init__(self, A: np.ndarray, D: np.ndarray):
        self.A = A
        self.D = D

    def clip_rings(self, coords, offsets):
        for (a, b), d in zip(self.A, self.D):
            coords, offsets = _sh_pass_halfplane(coords, offsets, a, b, d)
        return coords, offsets

    def seg_params(self, p, d):
        """Cyrus–Beck entry/exit parameters against every half-plane."""
        t0 = np.zeros(len(p))
        t1 = np.ones(len(p))
        for (a, b), dd in zip(self.A, self.D):
            f = a * p[:, 0] + b * p[:, 1]
            den = a * d[:, 0] + b * d[:, 1]
            with np.errstate(divide="ignore", invalid="ignore"):
                ts = (dd - f) / den
            par = den == 0.0
            inside_par = f <= dd
            # den > 0: heading outward -> exit bound; den < 0: entry bound
            t0 = np.where(par, np.where(inside_par, t0, 1.0),
                          np.where(den < 0.0, np.maximum(t0, ts), t0))
            t1 = np.where(par, np.where(inside_par, t1, 0.0),
                          np.where(den > 0.0, np.minimum(t1, ts), t1))
        return t0, t1

    def clamp(self, pts):
        return pts  # no per-axis snap exists for oblique edges

    def point_mask(self, pts):
        mask = np.ones(len(pts), dtype=bool)
        for (a, b), d in zip(self.A, self.D):
            mask &= a * pts[:, 0] + b * pts[:, 1] <= d
        return mask


def _convex_halfplanes(ring) -> tuple[np.ndarray, np.ndarray]:
    """(A, D) half-planes of a convex ring; validates convexity.

    Accepts an (k, 2) array-like of vertices (closing duplicate optional,
    either winding); consecutive duplicate vertices and collinear runs are
    tolerated, reflex corners are refused loudly.
    """
    v = np.asarray(ring, dtype=np.float64)
    if v.ndim != 2 or v.shape[1] != 2 or len(v) < 3:
        raise ValueError("convex clip ring needs >= 3 (x, y) vertices")
    if len(v) > 1 and v[0, 0] == v[-1, 0] and v[0, 1] == v[-1, 1]:
        v = v[:-1]
    keep = np.ones(len(v), dtype=bool)
    keep[1:] = (v[1:] != v[:-1]).any(axis=1)
    v = v[keep]
    if len(v) < 3:
        raise ValueError("convex clip ring needs >= 3 distinct vertices")
    area2 = float(np.sum(v[:, 0] * np.roll(v[:, 1], -1) - np.roll(v[:, 0], -1) * v[:, 1]))
    if area2 == 0.0:
        raise ValueError("convex clip ring is degenerate (zero area)")
    if area2 < 0.0:
        v = v[::-1]  # normalize to CCW
    e = np.roll(v, -1, axis=0) - v
    crossz = e[:, 0] * np.roll(e[:, 1], -1) - e[:, 1] * np.roll(e[:, 0], -1)
    if (crossz < 0.0).any():
        raise ValueError("clip ring is not convex (reflex corner found)")
    nz = (e != 0.0).any(axis=1)
    v, e = v[nz], e[nz]
    # CCW ring: inside is LEFT of each edge -> ey*x - ex*y <= ey*vx - ex*vy
    A = np.column_stack([e[:, 1], -e[:, 0]])
    D = e[:, 1] * v[:, 0] - e[:, 0] * v[:, 1]
    return A, D


def _clip_polygons_vec(ga: GeometryArray, clip) -> GeometryArray:
    """Fully-vectorized polygon clip for arrays of ONLY (Multi)Polygon /
    MISSING rows — every step is cumsum/repeat/gather over the flat ragged
    buffers; no per-geometry Python (0.05 -> 0.25-0.31 M polys/s on the
    16-gon micro, within ~1.5x of the pure S-H pass floor). The mixed-type
    generic path in :func:`clip_by_rect` keeps the same semantics for
    heterogeneous batches.
    """
    from geopolars_ray.geom.array import _expand_ranges

    n = len(ga)
    rings_per_part = np.diff(ga.part_offsets)
    r_s = ga.ring_offsets[:-1]
    r_e = np.maximum(ga.ring_offsets[1:] - 1, r_s)  # drop the closing vertex
    sizes = r_e - r_s
    flat = ga.coords[_expand_ranges(r_s, r_e)]
    offs = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    cc, oo = clip.clip_rings(flat, offs)
    new_sizes = np.diff(oo)

    # validity: a part survives iff its EXTERIOR (first) ring keeps >= 3
    # vertices; its holes survive independently by the same size rule
    n_parts = len(rings_per_part)
    ring_part = np.repeat(np.arange(n_parts, dtype=np.int64), rings_per_part)
    ext_ring = ga.part_offsets[:-1]
    has_rings = rings_per_part > 0
    ext_size = np.zeros(n_parts, dtype=np.int64)
    ext_size[has_rings] = new_sizes[np.minimum(ext_ring[has_rings], len(new_sizes) - 1)] if len(new_sizes) else 0
    part_valid = ext_size >= 3
    ring_keep = (new_sizes >= 3)
    if n_parts:
        ring_keep &= part_valid[ring_part]

    kr = np.nonzero(ring_keep)[0]
    ks = new_sizes[kr]
    out_sizes = ks + 1  # re-close each kept ring
    ring_offsets_out = np.zeros(len(kr) + 1, dtype=np.int64)
    np.cumsum(out_sizes, out=ring_offsets_out[1:])
    total = int(ring_offsets_out[-1])
    out_idx = np.empty(total, dtype=np.int64)
    body = np.ones(total, dtype=bool)
    ends = ring_offsets_out[1:]
    body[ends - 1] = False
    out_idx[ends - 1] = oo[kr]  # closing vertex = ring start
    out_idx[body] = _expand_ranges(oo[kr], oo[kr + 1])
    coords_out = cc[out_idx]

    cs_keep = np.zeros(len(ring_keep) + 1, dtype=np.int64)
    np.cumsum(ring_keep, out=cs_keep[1:])
    rings_kept_per_part = cs_keep[ga.part_offsets[1:]] - cs_keep[ga.part_offsets[:-1]]
    kp = np.nonzero(part_valid)[0]
    part_offsets_out = np.zeros(len(kp) + 1, dtype=np.int64)
    np.cumsum(rings_kept_per_part[kp], out=part_offsets_out[1:])

    cs_part = np.zeros(n_parts + 1, dtype=np.int64)
    np.cumsum(part_valid, out=cs_part[1:])
    parts_kept_per_geom = cs_part[ga.geom_offsets[1:]] - cs_part[ga.geom_offsets[:-1]]
    geom_offsets_out = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(parts_kept_per_geom, out=geom_offsets_out[1:])
    types_out = np.where(parts_kept_per_geom > 0, ga.types, MISSING).astype(np.int8)
    return GeometryArray(
        types=types_out,
        geom_offsets=geom_offsets_out,
        part_offsets=part_offsets_out,
        ring_offsets=ring_offsets_out,
        coords=coords_out,
    )


def _lb_params(p: np.ndarray, d: np.ndarray, rect) -> tuple[np.ndarray, np.ndarray]:
    """Liang–Barsky entry/exit parameters per segment (vectorized)."""
    xmin, ymin, xmax, ymax = rect
    t0 = np.zeros(len(p))
    t1 = np.ones(len(p))
    for axis, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = (lo - p[:, axis]) / d[:, axis]
            tb = (hi - p[:, axis]) / d[:, axis]
            tlo = np.minimum(ta, tb)
            thi = np.maximum(ta, tb)
        par = d[:, axis] == 0.0
        inside_par = (p[:, axis] >= lo) & (p[:, axis] <= hi)
        t0 = np.where(par, np.where(inside_par, t0, 1.0), np.maximum(t0, tlo))
        t1 = np.where(par, np.where(inside_par, t1, 0.0), np.minimum(t1, thi))
    return t0, t1


def _clamp_rect(pts: np.ndarray, rect) -> np.ndarray:
    """Clamp clipped endpoints into the rectangle: the t-interpolation can
    overshoot a bound by rounding (subnormal bounds, absorption) — in-rect
    points are untouched, so this only snaps the rounding overshoot and
    makes the line clip idempotent (property-tested)."""
    xmin, ymin, xmax, ymax = rect
    out = pts.copy()
    out[:, 0] = np.clip(out[:, 0], xmin, xmax)
    out[:, 1] = np.clip(out[:, 1], ymin, ymax)
    return out


def _clip_endpoints(p: np.ndarray, q: np.ndarray, d: np.ndarray,
                    t0: np.ndarray, t1: np.ndarray, clip) -> tuple[np.ndarray, np.ndarray]:
    """Clipped segment endpoints with EXACT originals at t==0 / t==1.

    ``p + 1.0*d`` is not ``q`` in floats (catastrophic cancellation in
    ``d = q - p``), so interpolating at the trivial parameters moves an
    on-boundary vertex by ~1 ULP of the SPAN — breaking idempotence
    (property-tested counterexample: a vertex exactly on ymax drifted
    inward on re-clip). Untrimmed ends keep their original vertex, clamped
    only for true rounding overshoot."""
    a = np.where((t0 == 0.0)[:, None], p, p + t0[:, None] * d)
    b = np.where((t1 == 1.0)[:, None], q, p + t1[:, None] * d)
    return clip.clamp(a), clip.clamp(b)


def _clip_lines_vec(ga: GeometryArray, clip) -> GeometryArray:
    """Fully-vectorized line clip for arrays of ONLY line-ish / MISSING rows:
    Liang–Barsky over every segment of the batch at once, chain starts from
    one global break mask (part firsts, dropped/shortened predecessors,
    mid-segment entries), ragged output via cumsum/scatter — the same
    no-per-geometry-Python contract as :func:`_clip_polygons_vec`.
    """
    from geopolars_ray.geom.array import _expand_ranges

    n = len(ga)
    p_s = ga.ring_offsets[:-1]  # line part == single ring
    p_e = ga.ring_offsets[1:]
    nseg = np.maximum(p_e - p_s - 1, 0)
    seg_idx = _expand_ranges(p_s, np.maximum(p_e - 1, p_s))
    p = ga.coords[seg_idx]
    q = ga.coords[np.minimum(seg_idx + 1, max(len(ga.coords) - 1, 0))]
    d = q - p
    t0, t1 = clip.seg_params(p, d)
    keep = t0 < t1
    a, b = _clip_endpoints(p, q, d, t0, t1, clip)

    seg_off = np.zeros(len(nseg) + 1, dtype=np.int64)
    np.cumsum(nseg, out=seg_off[1:])
    brk = np.zeros(len(p), dtype=bool)
    brk[seg_off[:-1][nseg > 0]] = True  # first segment of every part
    brk[1:] |= (~keep[:-1]) | (t1[:-1] < 1.0)
    brk |= t0 > 0.0  # entered mid-segment

    ki = np.nonzero(keep)[0]
    n_rings_out = 0
    chain_part = np.empty(0, dtype=np.int64)
    chain_sizes = np.empty(0, dtype=np.int64)
    coords_out = np.empty((0, 2))
    if len(ki):
        starts = brk[ki].copy()
        starts[1:] |= np.diff(ki) > 1
        starts[0] = True
        cnts = 1 + starts.astype(np.int64)
        pos = np.cumsum(cnts) - cnts
        total = int(cnts.sum())
        coords_out = np.empty((total, 2))
        coords_out[pos[starts]] = a[ki[starts]]
        coords_out[pos + starts] = b[ki]
        start_pos = np.nonzero(starts)[0]
        seg_per_chain = np.diff(np.concatenate([start_pos, [len(ki)]]))
        chain_sizes = seg_per_chain + 1
        seg_part = np.repeat(np.arange(len(nseg), dtype=np.int64), nseg)
        chain_part = seg_part[ki[start_pos]]
        n_rings_out = len(start_pos)

    ring_offsets_out = np.zeros(n_rings_out + 1, dtype=np.int64)
    np.cumsum(chain_sizes, out=ring_offsets_out[1:])
    part_offsets_out = np.arange(n_rings_out + 1, dtype=np.int64)  # 1 chain = 1 part
    chains_per_part = np.bincount(chain_part, minlength=len(nseg)) if len(nseg) else np.zeros(0, np.int64)
    cs = np.zeros(len(nseg) + 1, dtype=np.int64)
    np.cumsum(chains_per_part, out=cs[1:])
    chains_per_geom = cs[ga.geom_offsets[1:]] - cs[ga.geom_offsets[:-1]]
    geom_offsets_out = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(chains_per_geom, out=geom_offsets_out[1:])
    types_out = np.where(
        chains_per_geom == 0,
        MISSING,
        np.where(chains_per_geom > 1, MULTILINESTRING,
                 np.where(ga.types == MULTILINESTRING, MULTILINESTRING, LINESTRING)),
    ).astype(np.int8)
    return GeometryArray(
        types=types_out,
        geom_offsets=geom_offsets_out,
        part_offsets=part_offsets_out,
        ring_offsets=ring_offsets_out,
        coords=coords_out,
    )


def clip_by_rect(ga: GeometryArray, xmin: float, ymin: float, xmax: float, ymax: float) -> GeometryArray:
    """Clip every geometry to [xmin, xmax] x [ymin, ymax]."""
    if not (xmin < xmax and ymin < ymax):
        raise ValueError("clip rectangle must have xmin < xmax and ymin < ymax")
    rect = (float(xmin), float(ymin), float(xmax), float(ymax))
    return _clip_dispatch(ga, _RectClip(rect))


def clip_by_convex(ga: GeometryArray, ring) -> GeometryArray:
    """Clip every geometry to a CONVEX polygon (the ``gpd.clip(mask)``
    shape for convex masks).

    ``ring``: (k, 2) vertices of the convex clip polygon (either winding,
    closing duplicate optional); reflex corners are refused loudly rather
    than silently mis-clipped — a concave mask needs a full overlay, which
    Sutherland–Hodgman cannot provide. Same family semantics and concave-
    SUBJECT bridge caveat as :func:`clip_by_rect`; intersection vertices on
    oblique edges are exact to ~1 ULP (no axis snap exists), so
    idempotence is approximate rather than bit-exact.
    """
    A, D = _convex_halfplanes(ring)
    return _clip_dispatch(ga, _ConvexClip(A, D))


def _clip_dispatch(ga: GeometryArray, clip) -> GeometryArray:
    if bool(np.all(np.isin(ga.types, _POLYISH) | (ga.types == MISSING))):
        return _clip_polygons_vec(ga, clip)
    if bool(np.all(np.isin(ga.types, _LINEISH) | (ga.types == MISSING))):
        return _clip_lines_vec(ga, clip)

    # outputs accumulated as flat lists of arrays, one entry per geometry
    out_types = np.array(ga.types, dtype=np.int8, copy=True)
    geom_parts: list[list[tuple[np.ndarray, np.ndarray]]] = [[] for _ in range(len(ga))]
    # each part entry: (ring_sizes int64[], coords float64[k,2]) CLOSED rings

    co = ga.coord_offsets()
    types = ga.types

    # ---- point family: one containment mask over every point coordinate
    pt_geoms = np.nonzero(np.isin(types, _POINTISH))[0]
    for gi in pt_geoms:
        pts = ga.coords[co[gi]:co[gi + 1]]
        kept = pts[clip.point_mask(pts)]
        for p in kept:
            geom_parts[gi].append((np.array([1], dtype=np.int64), p[None, :]))

    # ---- polygon family: batch ALL rings through the shared S-H passes
    poly_geoms = np.nonzero(np.isin(types, _POLYISH))[0]
    if len(poly_geoms):
        ring_lo = ga.part_offsets[ga.geom_offsets[poly_geoms]]
        ring_hi = ga.part_offsets[ga.geom_offsets[poly_geoms + 1]]
        ring_idx = np.concatenate([np.arange(a, b) for a, b in zip(ring_lo, ring_hi)]) if len(ring_lo) else np.empty(0, np.int64)
        # open the rings (drop the closing vertex) into one flat buffer
        r_s = ga.ring_offsets[ring_idx]
        r_e = np.maximum(ga.ring_offsets[ring_idx + 1] - 1, r_s)  # open length
        sizes = r_e - r_s
        flat = np.concatenate([ga.coords[s:e] for s, e in zip(r_s, r_e)]) if sizes.sum() else np.empty((0, 2))
        offs = np.concatenate([[0], np.cumsum(sizes)])
        cc, oo = clip.clip_rings(flat, offs)
        new_sizes = np.diff(oo)
        # map rings back to (geom, part) and rebuild with S-H validity rules
        ring_ptr = 0
        for k, gi in enumerate(poly_geoms):
            for part in range(ga.geom_offsets[gi], ga.geom_offsets[gi + 1]):
                pr_lo, pr_hi = ga.part_offsets[part], ga.part_offsets[part + 1]
                n_rings = pr_hi - pr_lo
                ring_sizes = new_sizes[ring_ptr:ring_ptr + n_rings]
                ring_coords = [cc[oo[ring_ptr + r]:oo[ring_ptr + r + 1]] for r in range(n_rings)]
                ring_ptr += n_rings
                if n_rings == 0 or ring_sizes[0] < 3:
                    continue  # exterior clipped away -> whole part gone
                keep_rings = [0] + [r for r in range(1, n_rings) if ring_sizes[r] >= 3]
                sizes_out = np.array([ring_sizes[r] + 1 for r in keep_rings], dtype=np.int64)
                closed = np.concatenate([
                    np.concatenate([ring_coords[r], ring_coords[r][:1]]) for r in keep_rings
                ])
                geom_parts[gi].append((sizes_out, closed))

    # ---- line family: Liang–Barsky per segment + vectorized chain splits
    line_geoms = np.nonzero(np.isin(types, _LINEISH))[0]
    for gi in line_geoms:
        for part in range(ga.geom_offsets[gi], ga.geom_offsets[gi + 1]):
            ring = ga.part_offsets[part]  # line part = single "ring"
            s, e = ga.ring_offsets[ring], ga.ring_offsets[ring + 1]
            pts = ga.coords[s:e]
            if len(pts) < 2:
                continue
            p = pts[:-1]
            q = pts[1:]
            d = q - p
            t0, t1 = clip.seg_params(p, d)
            keep = t0 < t1
            if not keep.any():
                continue
            a, b = _clip_endpoints(p, q, d, t0, t1, clip)
            # chain break before segment i when: i dropped, or i-1 dropped,
            # or the shared vertex moved (t1[i-1] < 1 or t0[i] > 0)
            brk = np.ones(len(p), dtype=bool)
            brk[1:] = (~keep[:-1]) | (t1[:-1] < 1.0) | (t0[1:] > 0.0)
            ki = np.nonzero(keep)[0]
            starts = brk[ki]
            # contiguity within kept runs: also break when kept segs not adjacent
            starts[1:] |= np.diff(ki) > 1
            starts[0] = True
            # emit: chain start contributes a+b, continuation contributes b
            cnts = 1 + starts.astype(np.int64)
            pos = np.cumsum(cnts) - cnts
            total = int(cnts.sum())
            outc = np.empty((total, 2))
            outc[pos[starts]] = a[ki[starts]]
            outc[pos + starts] = b[ki]
            # chain sizes: distance between consecutive chain starts
            start_pos = np.nonzero(starts)[0]
            seg_per_chain = np.diff(np.concatenate([start_pos, [len(ki)]]))
            sizes_out = seg_per_chain + 1
            geom_parts[gi].append((sizes_out.astype(np.int64), outc))

    # ---- assemble the ragged output
    n = len(ga)
    types_out = np.empty(n, dtype=np.int8)
    geom_offsets = np.zeros(n + 1, dtype=np.int64)
    part_sizes: list[int] = []
    ring_sizes_all: list[np.ndarray] = []
    coord_chunks: list[np.ndarray] = []
    for gi in range(n):
        parts = geom_parts[gi]
        t = int(out_types[gi])
        if t in _POINTISH or t in _LINEISH:
            # a (multi)point/line part may itself carry multiple chains
            flat_parts: list[tuple[np.ndarray, np.ndarray]] = []
            for sizes, cs in parts:
                o = np.concatenate([[0], np.cumsum(sizes)])
                for r in range(len(sizes)):
                    flat_parts.append((sizes[r:r + 1], cs[o[r]:o[r + 1]]))
            parts = flat_parts
        if not parts:
            types_out[gi] = MISSING
            geom_offsets[gi + 1] = geom_offsets[gi]
            continue
        if t == POINT and len(parts) > 1:  # cannot happen (1 coord in)
            t = MULTIPOINT
        if t == LINEARRING:
            t = LINESTRING  # a clipped ring is no longer a ring
        if t == LINESTRING and len(parts) > 1:
            t = MULTILINESTRING  # a clipped line may split into pieces
        if t == POLYGON and len(parts) > 1:  # cannot happen (1 part in)
            t = MULTIPOLYGON
        types_out[gi] = t
        geom_offsets[gi + 1] = geom_offsets[gi] + len(parts)
        for sizes, cs in parts:
            part_sizes.append(len(sizes))
            ring_sizes_all.append(sizes)
            coord_chunks.append(cs)
    part_offsets = np.concatenate([[0], np.cumsum(np.array(part_sizes, dtype=np.int64))]) if part_sizes else np.zeros(1, np.int64)
    ring_sizes = np.concatenate(ring_sizes_all) if ring_sizes_all else np.empty(0, np.int64)
    ring_offsets = np.concatenate([[0], np.cumsum(ring_sizes)])
    coords = np.concatenate(coord_chunks) if coord_chunks else np.empty((0, 2))
    return GeometryArray(
        types=types_out,
        geom_offsets=geom_offsets,
        part_offsets=part_offsets.astype(np.int64),
        ring_offsets=ring_offsets.astype(np.int64),
        coords=coords,
    )


def subdivide(ga: GeometryArray, max_vertices: int = 256, max_depth: int = 24):
    """PostGIS ``ST_Subdivide``: recursively split geometries until no piece
    has more than ``max_vertices`` coords. Returns (pieces, parent_index) —
    the explode() contract, so other columns replicate with ``take``.

    Each round shifts every oversized geometry so its own bbox CENTER sits
    at the origin (per-geometry vectorized), clips against the two
    half-planes of each geometry's LONGER bbox axis (a k-d-style split —
    per-geometry axis choice, so axis-aligned lines never split along their
    zero-extent axis, where the boundary-inclusive clips would keep the
    whole geometry in BOTH halves and duplicate it), shifts back, and
    re-queues pieces still over the budget. A geometry that a split cannot
    shrink (both halves keep every coord — e.g. a plus-shaped line whose
    long arm lies exactly on the split line, or all-coincident coords) is
    emitted ONCE as-is with a loud warning rather than duplicated or
    looped. Pieces share their split-boundary vertices, exactly like
    PostGIS output.

    The classic use is join-side preparation at scale: subdividing a
    continent-sized polygon into tile-sized pieces turns one hot task in a
    partitioned spatial join into many small ones.
    """
    import logging

    from geopolars_ray.geom import kernels as K

    if max_vertices < 8:
        raise ValueError("max_vertices must be >= 8")

    done_pieces: list[GeometryArray] = []
    done_parents: list[np.ndarray] = []
    cur = ga
    parents = np.arange(len(ga), dtype=np.int64)
    for depth in range(max_depth + 1):
        nv = cur.coords_per_geom()
        big = (nv > max_vertices) & ~cur.is_missing()
        small_rows = np.flatnonzero(~big)
        if len(small_rows):
            done_pieces.append(cur.take(small_rows))
            done_parents.append(parents[small_rows])
        big_rows = np.flatnonzero(big)
        if not len(big_rows):
            break
        if depth == max_depth:
            logging.getLogger("geopolars_ray.clip").warning(
                "subdivide: %d geometries still exceed max_vertices=%d at "
                "max_depth=%d (degenerate/coincident coords?) — emitted as-is",
                len(big_rows), max_vertices, max_depth,
            )
            done_pieces.append(cur.take(big_rows))
            done_parents.append(parents[big_rows])
            break
        sub_all = cur.take(big_rows)
        par_all = parents[big_rows]
        x0a, y0a, x1a, y1a = K.bounds(sub_all)
        # per-geometry split axis: the LONGER bbox side; zero-extent-both
        # geometries (all-coincident coords) cannot shrink — emit as-is
        ext_x = x1a - x0a
        ext_y = y1a - y0a
        degenerate = (ext_x <= 0) & (ext_y <= 0)
        if degenerate.any():
            drows = np.flatnonzero(degenerate)
            logging.getLogger("geopolars_ray.clip").warning(
                "subdivide: %d oversized geometries have zero bbox extent "
                "(all-coincident coords) — emitted as-is", len(drows),
            )
            done_pieces.append(sub_all.take(drows))
            done_parents.append(par_all[drows])
        split_x_mask = (ext_x >= ext_y) & ~degenerate
        halves, half_parents = [], []
        # (multi)point rows split by DIRECT half-open coordinate partition
        # (x <= center goes lo, x > center goes hi): boundary points are
        # genuine duplicates for point clouds, unlike the shared boundary
        # VERTICES of clipped lines/polygons
        from geopolars_ray.geom.array import MULTIPOINT, POINT
        is_mp = np.isin(sub_all.types, (MULTIPOINT, POINT)) & ~degenerate
        mp_rows = np.flatnonzero(is_mp)
        if len(mp_rows):
            mp = sub_all.take(mp_rows)
            mp_par = par_all[mp_rows]
            g = mp.geom_index_of_coords()
            on_x_g = split_x_mask[mp_rows]
            center = np.where(on_x_g, 0.5 * (x0a + x1a)[mp_rows], 0.5 * (y0a + y1a)[mp_rows])
            val = np.where(on_x_g[g], mp.coords[:, 0], mp.coords[:, 1])
            lo_mask = val <= center[g]
            for side in (lo_mask, ~lo_mask):
                counts = np.bincount(g[side], minlength=len(mp))
                geom_off = np.zeros(len(mp) + 1, dtype=np.int64)
                np.cumsum(counts, out=geom_off[1:])
                k = int(counts.sum())
                side_ga = GeometryArray(
                    types=np.where(counts > 0, np.int8(MULTIPOINT), np.int8(-1)).astype(np.int8),
                    geom_offsets=geom_off,
                    part_offsets=np.arange(k + 1, dtype=np.int64),
                    ring_offsets=np.arange(k + 1, dtype=np.int64),
                    coords=mp.coords[side],
                )
                rows = np.flatnonzero(counts > 0)
                if len(rows):
                    halves.append(side_ga.take(rows))
                    half_parents.append(mp_par[rows])
        for group_mask, on_x in ((split_x_mask & ~is_mp, True),
                                 ((~split_x_mask) & ~degenerate & ~is_mp, False)):
            grows = np.flatnonzero(group_mask)
            if not len(grows):
                continue
            sub = sub_all.take(grows)
            sub_parents = par_all[grows]
            nv_parent = sub.coords_per_geom()
            x0, y0, x1, y1 = K.bounds(sub)
            cx = 0.5 * (x0 + x1)
            cy = 0.5 * (y0 + y1)
            gidx = sub.geom_index_of_coords()
            shifted = GeometryArray(
                types=sub.types, geom_offsets=sub.geom_offsets,
                part_offsets=sub.part_offsets, ring_offsets=sub.ring_offsets,
                coords=sub.coords - np.column_stack([cx, cy])[gidx],
            )
            lim = float(np.abs(shifted.coords).max()) + 1.0 if len(shifted.coords) else 1.0
            if on_x:
                lo = clip_by_rect(shifted, -lim, -lim, 0.0, lim)
                hi = clip_by_rect(shifted, 0.0, -lim, lim, lim)
            else:
                lo = clip_by_rect(shifted, -lim, -lim, lim, 0.0)
                hi = clip_by_rect(shifted, -lim, 0.0, lim, lim)
            # no-progress guard: if BOTH halves kept every coord, the split
            # duplicated the geometry (it lies on the split line) — emit the
            # parent once instead
            stuck = (lo.coords_per_geom() >= nv_parent) & (hi.coords_per_geom() >= nv_parent)
            if stuck.any():
                srows = np.flatnonzero(stuck)
                logging.getLogger("geopolars_ray.clip").warning(
                    "subdivide: %d oversized geometries lie on their own "
                    "split line and cannot shrink — emitted as-is", len(srows),
                )
                done_pieces.append(sub.take(srows))
                done_parents.append(sub_parents[srows])
            for h in (lo, hi):
                back = GeometryArray(
                    types=h.types, geom_offsets=h.geom_offsets,
                    part_offsets=h.part_offsets, ring_offsets=h.ring_offsets,
                    coords=h.coords + np.column_stack([cx, cy])[h.geom_index_of_coords()]
                    if len(h.coords) else h.coords,
                )
                keep = ~back.is_missing() & (back.coords_per_geom() > 0) & ~stuck
                rows = np.flatnonzero(keep)
                if len(rows):
                    halves.append(back.take(rows))
                    half_parents.append(sub_parents[rows])
        if not halves:
            break
        cur = _concat_geoms(halves)
        parents = np.concatenate(half_parents)
    if not done_pieces:
        empty = GeometryArray.from_pylist([])
        return empty, np.empty(0, dtype=np.int64)
    out = _concat_geoms(done_pieces)
    par = np.concatenate(done_parents)
    return out, par


def _concat_geoms(parts: list[GeometryArray]) -> GeometryArray:
    """Concatenate GeometryArrays (offsets re-based)."""
    if len(parts) == 1:
        return parts[0]
    types = np.concatenate([p.types for p in parts])
    geom_off = [np.zeros(1, dtype=np.int64)]
    part_off = [np.zeros(1, dtype=np.int64)]
    ring_off = [np.zeros(1, dtype=np.int64)]
    coords = []
    g = p = r = 0
    for x in parts:
        geom_off.append(x.geom_offsets[1:] + g)
        part_off.append(x.part_offsets[1:] + p)
        ring_off.append(x.ring_offsets[1:] + r)
        coords.append(x.coords)
        g += x.geom_offsets[-1]
        p += x.part_offsets[-1]
        r += x.ring_offsets[-1]
    return GeometryArray(
        types=types,
        geom_offsets=np.concatenate(geom_off),
        part_offsets=np.concatenate(part_off),
        ring_offsets=np.concatenate(ring_off),
        coords=np.concatenate(coords) if coords else np.empty((0, 2)),
    )
