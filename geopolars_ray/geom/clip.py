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
_LINEISH = (LINESTRING, MULTILINESTRING)
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
    n_rings = len(offsets) - 1
    if n == 0:
        return coords, offsets
    nxt = np.arange(1, n + 1, dtype=np.int64)
    last = offsets[1:] - 1
    first = offsets[:-1]
    ok = last >= first  # non-empty rings
    nxt[last[ok]] = first[ok]
    vj = coords[np.clip(nxt, 0, n - 1)]
    val_i = coords[:, axis]
    val_j = vj[:, axis]
    if keep_ge:
        in_i, in_j = val_i >= c, val_j >= c
    else:
        in_i, in_j = val_i <= c, val_j <= c
    cross = in_i != in_j
    cnt = in_j.astype(np.int64) + cross
    pos = np.cumsum(cnt) - cnt
    total = int(pos[-1] + cnt[-1]) if n else 0
    out = np.empty((total, 2), dtype=np.float64)
    if cross.any():
        vi_c = coords[cross]
        vj_c = vj[cross]
        t = (c - vi_c[:, axis]) / (vj_c[:, axis] - vi_c[:, axis])
        inter = vi_c + t[:, None] * (vj_c - vi_c)
        inter[:, axis] = c  # exact on the clip line
        out[pos[cross]] = inter
    if in_j.any():
        out[pos[in_j] + cross[in_j]] = vj[in_j]
    new_offsets = np.concatenate([[0], np.cumsum(_seg_sums(cnt, offsets))])
    return out, new_offsets


def _clip_rings(coords: np.ndarray, offsets: np.ndarray, rect) -> tuple[np.ndarray, np.ndarray]:
    """Clip OPEN rings by the rectangle (4 S-H passes)."""
    xmin, ymin, xmax, ymax = rect
    for axis, c, keep_ge in ((0, xmin, True), (0, xmax, False), (1, ymin, True), (1, ymax, False)):
        coords, offsets = _sh_pass(coords, offsets, axis, c, keep_ge)
    return coords, offsets


def clip_by_rect(ga: GeometryArray, xmin: float, ymin: float, xmax: float, ymax: float) -> GeometryArray:
    """Clip every geometry to [xmin, xmax] x [ymin, ymax]."""
    if not (xmin < xmax and ymin < ymax):
        raise ValueError("clip rectangle must have xmin < xmax and ymin < ymax")
    rect = (float(xmin), float(ymin), float(xmax), float(ymax))

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
        keep = (pts[:, 0] >= xmin) & (pts[:, 0] <= xmax) & (pts[:, 1] >= ymin) & (pts[:, 1] <= ymax)
        kept = pts[keep]
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
        cc, oo = _clip_rings(flat, offs, rect)
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
            # Liang–Barsky clip params per segment
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
            keep = t0 < t1
            if not keep.any():
                continue
            a = p + t0[:, None] * d
            b = p + t1[:, None] * d
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
