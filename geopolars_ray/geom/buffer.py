"""General geometry buffer built on the boolean-overlay engine.

``buffer(g, d)`` for ANY geometry type, closing the long-documented
"buffer covers points only" gap (reference: shapely/GEOS ``buffer``;
the GeoPolars surface exposes it via the geo crate — this engine now
matches the operation for every input type, with the k-gon circle
approximation convention shared with ``kernels.buffer_points``):

- **point / multipoint**: union of inscribed ``4*quad_segs``-gon circles
  (single points take the vectorized ``buffer_points`` path upstream).
- **line / multiline**: the Minkowski sum of the path with the k-gon
  disk = cascaded union of one rectangle per segment plus one circle
  per vertex (round caps and joins, GEOS' default style).
- **polygon / multipolygon, d > 0**: ``body UNION (boundary (+) disk)``
  — the exact identity ``{p : dist(p, S) <= d} = S ∪ {p : dist(p, ∂S)
  <= d}`` for closed S, so holes shrink and exteriors grow correctly
  with no special casing.
- **polygon / multipolygon, d < 0** (erosion): ``body MINUS
  (boundary (+) disk)`` — the same identity for the complement.
  Erosion may empty a geometry: the result row becomes null.
  Negative distances on non-polygonal rows raise.

Pieces are folded with a balanced binary union tree over
``overlay.boolean_op`` (pieces are generated in path order, so adjacent
folds are spatially local and intermediate results stay small). Each
piece is a separate overlay OPERAND — parity cancellation between
overlapping pieces (which even-odd fill would apply WITHIN one operand)
therefore never occurs.

Scale note: like overlay itself this is per-geometry sequential work
(O(m log m) sweeps for m pieces); the Ray-scale story is row
parallelism via ``map_batches``. The vectorized all-point fast path is
preserved — mixed batches only pay the generic cost on non-point rows.
"""

from __future__ import annotations

import numpy as np

from geopolars_ray.geom.overlay import boolean_op


def _circle(cx: float, cy: float, d: float, k: int) -> list:
    ang = np.arange(k) * (2.0 * np.pi / k)
    xs = cx + d * np.cos(ang)
    ys = cy + d * np.sin(ang)
    return [(float(x), float(y)) for x, y in zip(xs, ys)]


def _seg_rect(p, q, d: float) -> list | None:
    dx, dy = q[0] - p[0], q[1] - p[1]
    L = (dx * dx + dy * dy) ** 0.5
    if L == 0.0:
        return None
    nx, ny = -dy / L * d, dx / L * d
    return [
        (p[0] + nx, p[1] + ny),
        (q[0] + nx, q[1] + ny),
        (q[0] - nx, q[1] - ny),
        (p[0] - nx, p[1] - ny),
    ]


def _union_tree(pieces: list):
    """Balanced pairwise union fold; each input piece its own operand."""
    pieces = [p for p in pieces if p is not None]
    if not pieces:
        return None
    if len(pieces) == 1:
        # never passed through boolean_op: normalize so rings come back
        # CLOSED (ring[0] == ring[-1]) like every other overlay output —
        # a raw open _circle ring here would serialize as invalid WKB
        return boolean_op(pieces[0], None, "union")
    while len(pieces) > 1:
        nxt = []
        for i in range(0, len(pieces) - 1, 2):
            nxt.append(boolean_op(pieces[i], pieces[i + 1], "union"))
        if len(pieces) % 2:
            nxt.append(pieces[-1])
        pieces = nxt
    g = pieces[0]
    if g is not None and g[0] == "polygon":
        g = ("multipolygon", [g[1]])
    return g


def _boundary_pieces(rings, d: float, k: int) -> list:
    """One rectangle per edge + one circle per vertex over OPEN rings."""
    out = []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            p, q = ring[i], ring[(i + 1) % n]
            r = _seg_rect(p, q, d)
            if r is not None:
                out.append(("polygon", [r]))
            out.append(("polygon", [_circle(p[0], p[1], d, k)]))
    return out


def _path_pieces(path, d: float, k: int) -> list:
    """Rect per segment + circle per vertex over an OPEN path (no wrap)."""
    out = []
    for i in range(len(path) - 1):
        r = _seg_rect(path[i], path[i + 1], d)
        if r is not None:
            out.append(("polygon", [r]))
    for p in path:
        out.append(("polygon", [_circle(p[0], p[1], d, k)]))
    return out


def _open_rings(rings) -> list:
    out = []
    for r in rings:
        r = [(p[0], p[1]) for p in r]
        if len(r) > 1 and r[0] == r[-1]:
            r = r[:-1]
        if r:
            out.append(r)
    return out


def buffer_geom(geom, distance: float, quad_segs: int = 8):
    """Buffer ONE geometry in pylist tuple form. Returns a
    ("multipolygon", parts) tuple or None (null input / eroded away)."""
    if geom is None:
        return None
    if distance == 0.0:
        raise ValueError("buffer distance must be nonzero")
    if quad_segs < 1:
        raise ValueError("quad_segs must be >= 1")
    k = 4 * int(quad_segs)
    t, data = geom
    if t in ("polygon", "multipolygon"):
        rings = _open_rings(data if t == "polygon"
                            else [r for poly in data for r in poly])
        body = ("multipolygon", [[r] for r in rings])
        capsules = _union_tree(_boundary_pieces(rings, abs(distance), k))
        if distance > 0.0:
            return boolean_op(body, capsules, "union") if capsules is not None \
                else _normalize(body)
        return boolean_op(body, capsules, "difference") if capsules is not None \
            else _normalize(body)
    if distance < 0.0:
        raise ValueError(
            "negative buffer distance is only defined for polygonal "
            f"geometries, got {t!r}"
        )
    if t == "point":
        ring = _circle(data[0], data[1], distance, k)
        return ("multipolygon", [[ring + [ring[0]]]])  # closed, like overlay
    if t == "multipoint":
        return _union_tree(
            [("polygon", [_circle(p[0], p[1], distance, k)]) for p in data]
        )
    if t == "linestring":
        paths = [data]
    elif t == "multilinestring":
        paths = list(data)
    else:
        raise TypeError(f"buffer does not support geometry type {t!r}")
    pieces = []
    for path in paths:
        pieces.extend(_path_pieces([(p[0], p[1]) for p in path], distance, k))
    return _union_tree(pieces)


def _normalize(body):
    """Even-odd normalize a bare ring set (degenerate: no boundary pieces)."""
    return boolean_op(body, None, "union")


def buffer_geoms(ga, distance: float, quad_segs: int = 8):
    """Buffer a GeometryArray of ANY geometry types.

    All-point arrays take the vectorized ``kernels.buffer_points`` fast
    path (bit-identical rings: same k-gon start angle and orientation);
    anything else goes per-row through the overlay union construction.
    Single-part results collapse to POLYGON; empty results are null.
    """
    from geopolars_ray.geom import kernels as K
    from geopolars_ray.geom.array import GeometryArray

    if distance > 0.0:
        is_pt = ga.types == K.POINT
        is_missing = ga.types == K.MISSING
        if bool((is_pt | is_missing).all()):
            return K.buffer_points(ga, distance, quad_segs)
    out = []
    for g in ga.to_pylist():
        r = buffer_geom(g, distance, quad_segs)
        if r is not None and len(r[1]) == 1:
            r = ("polygon", r[1][0])
        out.append(r)
    return GeometryArray.from_pylist(out)
