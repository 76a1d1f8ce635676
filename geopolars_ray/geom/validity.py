"""OGC validity checking: ``is_valid`` / ``is_valid_reason`` (ST_IsValid /
ST_IsValidReason, shapely ``is_valid`` / ``is_valid_reason``).

The reference has no validity op (GeoPolars delegates geometry semantics to
the `geo` crate and never exposes GEOS IsValidOp); pipelines need it
constantly — "drop invalid polygons before the spatial join" is a standard
cleaning stage. Checks implemented, in GEOS reason priority:

- **Too few points in geometry component**: any polygon ring with fewer
  than 4 points once closed (consecutive duplicates collapsed first), or a
  line part with fewer than 2 distinct points.
- **Ring Self-intersection**: a repeated non-consecutive vertex within one
  ring (figure-8 self-touch), or a noding vertex created by one ring's own
  segments.
- **Self-intersection**: the snap-rounded arrangement (`overlay.node_segments`
  — the same fixed-point noding the boolean overlay uses) introduces a
  vertex not present in the input, or leaves a multiplicity-2 group
  (collinear overlapping edges between rings).
- **Hole lies outside shell** / **Holes are nested** / **Nested shells**:
  even-odd probe-point containment, probing a vertex (or edge midpoint)
  not shared with the other ring so single-point touches stay valid.

Documented deltas vs GEOS IsValidOp: intersections are detected at the
overlay engine's snap tolerance (~1e-12 relative) rather than with exact
arithmetic, and the "Interior is disconnected" error (a hole chain touching
the shell at two points) is NOT detected — such polygons pass. Points,
lines and multipoints are valid whenever parts have enough coordinates,
matching GEOS (a self-crossing LineString IS valid).
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
from geopolars_ray.geom.overlay import (
    SUBJECT,
    _point_in_even_odd,
    _point_in_ring,
    _point_on_path,
    node_segments,
)

VALID = "Valid Geometry"


def _clean_closed(ring: np.ndarray) -> np.ndarray:
    """Drop the closing duplicate and consecutive repeats; returns the
    open vertex cycle."""
    r = ring
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    if len(r) >= 2:
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]).any(axis=1)
        r = r[keep]
    return r


def _rings_of_row(ga: GeometryArray, i: int) -> list[list[np.ndarray]]:
    """Rings of polygonal row i, grouped per part: [[shell, hole...], ...]."""
    out = []
    for p in range(int(ga.geom_offsets[i]), int(ga.geom_offsets[i + 1])):
        part = []
        for r in range(int(ga.part_offsets[p]), int(ga.part_offsets[p + 1])):
            part.append(ga.coords[ga.ring_offsets[r]:ga.ring_offsets[r + 1]])
        out.append(part)
    return out


def _on_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """True when (px, py) lies ON the closed ring's boundary (vertex or
    edge interior) — delegates to the shared exact test."""
    return _point_on_path(px, py, ring, closed=True)


def _probe_off(ring: np.ndarray, others: list) -> tuple[float, float] | None:
    """A point of ``ring`` that does NOT lie on the boundary of ANY ring
    in ``others``: first such vertex, else the first edge midpoint off
    all of them (valid single-point touches — at a vertex or interior to
    an edge — must not decide containment). None when every sample
    touches (boundary fully shared; the arrangement check already
    rejected any OVERLAP, so such configurations are not containment
    violations)."""
    for k in range(len(ring)):
        px, py = float(ring[k, 0]), float(ring[k, 1])
        if not any(_on_ring(px, py, o) for o in others):
            return (px, py)
    n = len(ring)
    for k in range(n):
        px = (float(ring[k, 0]) + float(ring[(k + 1) % n, 0])) / 2.0
        py = (float(ring[k, 1]) + float(ring[(k + 1) % n, 1])) / 2.0
        if not any(_on_ring(px, py, o) for o in others):
            return (px, py)
    return None


def _in_rings(px: float, py: float, rings: list) -> bool:
    """Even-odd membership over a ring set (shared impl in overlay)."""
    return _point_in_even_odd(px, py, rings)


def _ring_vertex_on_edge(r: np.ndarray):
    """A vertex of the closed cycle ``r`` lying on the INTERIOR of a
    non-incident edge of the same ring (T-junction self-touch — the
    arrangement check cannot see it: splitting an edge at an EXISTING
    same-ring vertex creates no new vertex and no multiplicity).
    Exact collinear + bbox test, vertex-chunked; None if clean."""
    n = len(r)
    a = r
    b = np.roll(r, -1, axis=0)
    chunk = max(1, 4_000_000 // max(n, 1))
    for lo in range(0, n, chunk):
        V = r[lo:lo + chunk]
        cross = ((b[None, :, 0] - a[None, :, 0]) * (V[:, None, 1] - a[None, :, 1])
                 - (b[None, :, 1] - a[None, :, 1]) * (V[:, None, 0] - a[None, :, 0]))
        inbox = ((V[:, None, 0] >= np.minimum(a[None, :, 0], b[None, :, 0]))
                 & (V[:, None, 0] <= np.maximum(a[None, :, 0], b[None, :, 0]))
                 & (V[:, None, 1] >= np.minimum(a[None, :, 1], b[None, :, 1]))
                 & (V[:, None, 1] <= np.maximum(a[None, :, 1], b[None, :, 1])))
        hit = (cross == 0.0) & inbox
        rows = np.arange(len(V))
        vi = np.arange(lo, lo + len(V))
        hit[rows, vi % n] = False          # edge starting at the vertex
        hit[rows, (vi - 1) % n] = False    # edge ending at the vertex
        if hit.any():
            i, _k = np.argwhere(hit)[0]
            return (float(V[i, 0]), float(V[i, 1]))
    return None


def _check_polygonal(parts: list[list[np.ndarray]]) -> str:
    # 1. ring shape + intra-ring repeated vertices + T-junction self-touch
    cleaned: list[list[np.ndarray]] = []
    for part in parts:
        cp = []
        for ring in part:
            r = _clean_closed(ring)
            if len(r) < 3:
                return (f"Too few points in geometry component"
                        f"[{ring[0, 0]:g} {ring[0, 1]:g}]" if len(ring) else
                        "Too few points in geometry component")
            uniq, cnt = np.unique(r, axis=0, return_counts=True)
            if (cnt > 1).any():
                d = uniq[cnt > 1][0]
                return f"Ring Self-intersection[{d[0]:g} {d[1]:g}]"
            tj = _ring_vertex_on_edge(r)
            if tj is not None:
                return f"Ring Self-intersection[{tj[0]:g} {tj[1]:g}]"
            cp.append(r)
        cleaned.append(cp)

    # 2. arrangement: new vertices or overlapping edges = self-intersection
    segments = []
    in_verts: set[tuple[float, float]] = set()
    for part in cleaned:
        for r in part:
            for k in range(len(r)):
                p = (float(r[k, 0]), float(r[k, 1]))
                q = (float(r[(k + 1) % len(r), 0]), float(r[(k + 1) % len(r), 1]))
                in_verts.add(p)
                segments.append((p, q, SUBJECT))
    groups = node_segments(segments)
    for p, q, m_s, _m_c in groups:
        if m_s > 1:
            return f"Self-intersection[{p[0]:g} {p[1]:g}]"
        for v in (p, q):
            if v not in in_verts:
                return f"Self-intersection[{v[0]:g} {v[1]:g}]"

    # 3. containment rules (single-point touches already proven by the
    # arrangement to be the only contacts). Probes are chosen off EVERY
    # ring they are tested against — a probe sitting exactly on a tested
    # ring has ambiguous even-odd parity (found as a real false-positive:
    # a shell inside a hole, touching that hole at one vertex).
    for part in cleaned:
        shell = part[0]
        for hi in range(1, len(part)):
            hole = part[hi]
            probe = _probe_off(hole, [shell])
            if probe is not None and not _point_in_ring(probe[0], probe[1], shell):
                return f"Hole lies outside shell[{probe[0]:g} {probe[1]:g}]"
            for hj in range(1, len(part)):
                if hj == hi:
                    continue
                other = part[hj]
                probe2 = _probe_off(hole, [other])
                if probe2 is not None and _point_in_ring(probe2[0], probe2[1], other):
                    return f"Holes are nested[{probe2[0]:g} {probe2[1]:g}]"
    for pi in range(len(cleaned)):
        for pj in range(len(cleaned)):
            if pi == pj:
                continue
            shell_i = cleaned[pi][0]
            # off the WHOLE element pj, then even-odd over ALL its rings:
            # "inside the element's region" directly (a shell sitting in
            # pj's hole is fine; inside its filled region is not)
            probe = _probe_off(shell_i, cleaned[pj])
            if probe is not None and _in_rings(probe[0], probe[1], cleaned[pj]):
                return f"Nested shells[{probe[0]:g} {probe[1]:g}]"
    return VALID


def _check_lineal(ga: GeometryArray, i: int) -> str:
    for p in range(int(ga.geom_offsets[i]), int(ga.geom_offsets[i + 1])):
        for r in range(int(ga.part_offsets[p]), int(ga.part_offsets[p + 1])):
            c = ga.coords[ga.ring_offsets[r]:ga.ring_offsets[r + 1]]
            if len(c) >= 2:
                distinct = len(np.unique(c, axis=0))
            else:
                distinct = len(c)
            if distinct < 2:
                loc = (f"[{c[0, 0]:g} {c[0, 1]:g}]" if len(c) else "")
                return f"Too few points in geometry component{loc}"
    return VALID


def is_valid_reason(ga: GeometryArray) -> list:
    """GEOS ``isValidReason`` per row: ``"Valid Geometry"`` or the first
    violated rule with its location, None for missing rows."""
    out: list = []
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING:
            out.append(None)
        elif t in (POINT, MULTIPOINT):
            out.append(VALID)
        elif t in (LINESTRING, LINEARRING, MULTILINESTRING):
            out.append(_check_lineal(ga, i))
        else:
            out.append(_check_polygonal(_rings_of_row(ga, i)))
    return out


def is_valid(ga: GeometryArray) -> np.ndarray:
    """Boolean validity per row (False for missing, matching shapely's
    ``is_valid`` on None)."""
    reasons = is_valid_reason(ga)
    return np.array([r == VALID for r in reasons], dtype=bool)
