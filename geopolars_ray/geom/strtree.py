"""Spatial indexes: packed STR-tree, uniform grid index, point-in-polygon.

Reimplements the role of the reference's ``SpatialIndex`` — an rstar R-tree
over ``(row_index, envelope)`` nodes
(``/root/reference/geopolars/src/spatial_index.rs:278-350``) — as NumPy
structures that are cheap to pickle (so one index object can be built on the
driver, ``ray.put`` once, and hydrated in every join actor).

Two indexes, two roles:

- :class:`STRTree` — packed (bulk-loaded, Sort-Tile-Recursive) R-tree over
  envelopes; generic bbox queries; reproduces the reference's envelope-query
  fixtures (`spatial_index.rs:361-430`).
- :class:`GridIndex` — uniform grid over the envelopes; the hot-path
  candidate generator for point-in-polygon joins (candidate lookup for a
  whole batch of points is pure vectorized indexing, no per-point tree walk).

Exact refinement: :func:`points_in_polygon` implements boundary-*exclusive*
containment (even-odd crossing parity minus on-boundary points), matching the
geo crate's ``contains`` behavior that the reference's golden join fixture
depends on (boundary-touching points do NOT match —
`spatial_index.rs:479-480`, FIXTURES.md F5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from geopolars_ray.geom.array import GeometryArray, _expand_ranges
from geopolars_ray.geom import kernels

_NODE_CAP = 16


# --------------------------------------------------------------------------
# point-in-polygon refinement
# --------------------------------------------------------------------------


def _crossings_and_boundary(px, py, ring: np.ndarray):
    """(crossing_count, on_boundary) of points vs one ring, vectorized.

    px, py: (n,) point coords; ring: (m, 2) ring coords (closed or open).
    """
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    if len(ring) >= 2 and not (ring[0] == ring[-1]).all():
        x1 = np.append(x1, ring[-1, 0])
        y1 = np.append(y1, ring[-1, 1])
        x2 = np.append(x2, ring[0, 0])
        y2 = np.append(y2, ring[0, 1])
    px = px[:, None]
    py = py[:, None]
    # crossing test (half-open rule avoids double counting at vertices)
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = (x2 - x1)[None, :] * (py - y1[None, :]) / np.where(y2 == y1, 1.0, y2 - y1)[None, :] + x1[None, :]
    crossings = (cond & (px < x_at)).sum(axis=1)
    # on-boundary test: colinear and within segment bbox
    cross = (x2 - x1)[None, :] * (py - y1[None, :]) - (y2 - y1)[None, :] * (px - x1[None, :])
    within = (
        (px >= np.minimum(x1, x2)[None, :])
        & (px <= np.maximum(x1, x2)[None, :])
        & (py >= np.minimum(y1, y2)[None, :])
        & (py <= np.maximum(y1, y2)[None, :])
    )
    on_boundary = ((cross == 0.0) & within).any(axis=1)
    return crossings, on_boundary


def points_in_polygon_single(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Boundary-exclusive containment of points in one (multi)polygon.

    Even-odd parity across ALL rings (exterior(s) + holes of every part), so
    holes and disjoint parts fall out of the parity automatically.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    total = np.zeros(len(px), dtype=np.int64)
    boundary = np.zeros(len(px), dtype=bool)
    for ring in rings:
        if len(ring) < 3:
            continue
        c, b = _crossings_and_boundary(px, py, ring)
        total += c
        boundary |= b
    return (total % 2 == 1) & ~boundary


def points_dwithin_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray],
                         distance: float) -> np.ndarray:
    """contains OR boundary within ``distance`` — the ST_DWithin test.

    Interior points hit via the PIP test; the rest take one vectorized
    (points x boundary segments) min-distance block (the grouped-by-polygon
    refine shape, so the block is candidates-of-one-polygon sized, never
    batch sized)."""
    hit = points_in_polygon_single(px, py, rings)
    todo = ~hit
    if not todo.any():
        return hit
    segs_a, segs_b = [], []
    for ring in rings:
        if len(ring) >= 2:
            segs_a.append(ring[:-1])
            segs_b.append(ring[1:])
    if not segs_a:
        return hit
    a = np.concatenate(segs_a)
    dv = np.concatenate(segs_b) - a
    L2 = (dv**2).sum(axis=1)
    p = np.column_stack([np.asarray(px, np.float64)[todo], np.asarray(py, np.float64)[todo]])
    ap = p[:, None, :] - a[None, :, :]
    t = np.clip((ap * dv[None, :, :]).sum(axis=2) / np.where(L2 == 0, 1, L2)[None, :], 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * dv[None, :, :]
    dd2 = ((p[:, None, :] - proj) ** 2).sum(axis=2)
    hit[todo] = dd2.min(axis=1) <= distance * distance
    return hit


@dataclass
class PreparedPolygons:
    """Pickle-friendly polygon set for repeated containment tests.

    Built once (driver or actor ``__init__``) from a polygon GeometryArray;
    per-polygon ring slices are stored as flat arrays.
    """

    n: int
    ring_coords: np.ndarray  # (c, 2)
    ring_offsets: np.ndarray  # int64[R+1]
    rings_per_poly_offsets: np.ndarray  # int64[n+1] -> ring range of polygon i
    bounds: np.ndarray  # (n, 4) xmin ymin xmax ymax

    @classmethod
    def from_geometry_array(cls, ga: GeometryArray) -> "PreparedPolygons":
        xmin, ymin, xmax, ymax = kernels.bounds(ga)
        ring_range = ga.part_offsets[ga.geom_offsets]  # ring span per geometry
        return cls(
            n=len(ga),
            ring_coords=ga.coords,
            ring_offsets=ga.ring_offsets,
            rings_per_poly_offsets=ring_range,
            bounds=np.column_stack([xmin, ymin, xmax, ymax]),
        )

    def rings_of(self, i: int) -> list[np.ndarray]:
        out = []
        for r in range(self.rings_per_poly_offsets[i], self.rings_per_poly_offsets[i + 1]):
            out.append(self.ring_coords[self.ring_offsets[r] : self.ring_offsets[r + 1]])
        return out

    def contains_points(self, i: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        return points_in_polygon_single(px, py, self.rings_of(i))

    def dwithin_points(self, i: int, px: np.ndarray, py: np.ndarray, distance: float) -> np.ndarray:
        return points_dwithin_rings(px, py, self.rings_of(i), distance)


# --------------------------------------------------------------------------
# packed STR-tree
# --------------------------------------------------------------------------


class STRTree:
    """Packed Sort-Tile-Recursive R-tree over envelopes; NumPy arrays only.

    Bulk-loaded bottom-up: leaves are item envelopes sorted by STR (sort by
    center-x, tile into vertical slices, sort each slice by center-y); each
    internal level groups ``_NODE_CAP`` children. Query returns candidate item
    ids whose envelopes intersect the query box — the same contract as the
    reference's ``intersection_candidates_with_other_tree`` step
    (`spatial_index.rs:73-76`).
    """

    def __init__(self, boxes: np.ndarray):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        valid = ~np.isnan(boxes).any(axis=1)
        idx = np.nonzero(valid)[0]
        b = boxes[idx]
        if len(b) == 0:
            self.item_ids = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            return
        cx = (b[:, 0] + b[:, 2]) / 2.0
        cy = (b[:, 1] + b[:, 3]) / 2.0
        n = len(b)
        n_slices = max(1, int(np.ceil(np.sqrt(np.ceil(n / _NODE_CAP)))))
        slice_size = int(np.ceil(n / n_slices))  # items per vertical slice (standard STR)
        order_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(n_slices):
            sl = order_x[s * slice_size : (s + 1) * slice_size]
            # sort the slice by center-y
            sl = sl[np.argsort(cy[sl], kind="stable")]
            order[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.item_ids = idx[order]
        level = b[order]
        self.levels = [level]
        while len(level) > 1:
            m = len(level)
            n_nodes = int(np.ceil(m / _NODE_CAP))
            parent = np.empty((n_nodes, 4))
            for k in range(n_nodes):
                ch = level[k * _NODE_CAP : (k + 1) * _NODE_CAP]
                parent[k] = [ch[:, 0].min(), ch[:, 1].min(), ch[:, 2].max(), ch[:, 3].max()]
            self.levels.append(parent)
            level = parent

    def query_box(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Item ids whose envelope intersects [xmin,xmax]×[ymin,ymax] (inclusive)."""
        if self.n == 0 or not self.levels:
            return np.empty(0, dtype=np.int64)
        hits: list[np.ndarray] = []
        # descend from the root level
        stack = [(len(self.levels) - 1, np.arange(len(self.levels[-1])))]
        while stack:
            lvl, nodes = stack.pop()
            boxes = self.levels[lvl]
            bb = boxes[nodes]
            ok = (bb[:, 0] <= xmax) & (bb[:, 2] >= xmin) & (bb[:, 1] <= ymax) & (bb[:, 3] >= ymin)
            matched = nodes[ok]
            if len(matched) == 0:
                continue
            if lvl == 0:
                hits.append(self.item_ids[matched])
            else:
                child_ranges = [
                    np.arange(m * _NODE_CAP, min((m + 1) * _NODE_CAP, len(self.levels[lvl - 1])))
                    for m in matched
                ]
                stack.append((lvl - 1, np.concatenate(child_ranges)))
        if not hits:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(hits))

    def query_boxes(self, boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Bulk query: returns (query_idx, item_id) candidate pairs."""
        qs, its = [], []
        for i, (x0, y0, x1, y1) in enumerate(np.asarray(boxes, dtype=np.float64).reshape(-1, 4)):
            ids = self.query_box(x0, y0, x1, y1)
            if len(ids):
                qs.append(np.full(len(ids), i, dtype=np.int64))
                its.append(ids)
        if not qs:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(qs), np.concatenate(its)


# --------------------------------------------------------------------------
# uniform grid index (hot-path candidate generation for PIP joins)
# --------------------------------------------------------------------------


class GridIndex:
    """Uniform grid over item envelopes with CSR cell->item lists.

    Candidate lookup for N points is fully vectorized (digitize + CSR expand)
    — no per-point work — which is what makes the broadcast PIP join stream
    at memory bandwidth. Grid resolution defaults to ~2x the item count so
    average cell occupancy stays O(1) for evenly-sized polygons.
    """

    def __init__(self, boxes: np.ndarray, nx: int | None = None, ny: int | None = None):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        valid = ~np.isnan(boxes).any(axis=1)
        self.n_items = len(boxes)
        vb = boxes[valid]
        if len(vb) == 0:
            self.nx = self.ny = 1
            self.x0 = self.y0 = 0.0
            self.dx = self.dy = 1.0
            self.cell_offsets = np.zeros(2, dtype=np.int64)
            self.cell_items = np.empty(0, dtype=np.int64)
            return
        self.x0 = float(vb[:, 0].min())
        self.y0 = float(vb[:, 1].min())
        x1 = float(vb[:, 2].max())
        y1 = float(vb[:, 3].max())
        if nx is None:
            k = max(1, int(np.ceil(np.sqrt(2 * len(vb)))))
            nx = ny = k
        self.nx, self.ny = int(nx), int(ny)
        self.dx = max((x1 - self.x0) / self.nx, 1e-300)
        self.dy = max((y1 - self.y0) / self.ny, 1e-300)

        ids = np.nonzero(valid)[0]
        cx0 = np.clip(((vb[:, 0] - self.x0) / self.dx).astype(np.int64), 0, self.nx - 1)
        cx1 = np.clip(((vb[:, 2] - self.x0) / self.dx).astype(np.int64), 0, self.nx - 1)
        cy0 = np.clip(((vb[:, 1] - self.y0) / self.dy).astype(np.int64), 0, self.ny - 1)
        cy1 = np.clip(((vb[:, 3] - self.y0) / self.dy).astype(np.int64), 0, self.ny - 1)
        pairs_cell = []
        pairs_item = []
        # expand each item's covered cell rectangle (items usually cover few cells)
        spans = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        for i in range(len(vb)):
            xs = np.arange(cx0[i], cx1[i] + 1)
            ys = np.arange(cy0[i], cy1[i] + 1)
            cells = (xs[:, None] * self.ny + ys[None, :]).ravel()
            pairs_cell.append(cells)
            pairs_item.append(np.full(len(cells), ids[i], dtype=np.int64))
        cell = np.concatenate(pairs_cell)
        item = np.concatenate(pairs_item)
        order = np.argsort(cell, kind="stable")
        cell, item = cell[order], item[order]
        counts = np.bincount(cell, minlength=self.nx * self.ny)
        self.cell_offsets = np.zeros(self.nx * self.ny + 1, dtype=np.int64)
        np.cumsum(counts, out=self.cell_offsets[1:])
        self.cell_items = item

    def point_cells(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        finite = np.isfinite(px) & np.isfinite(py)
        fx = np.where(finite, px, 0.0)
        fy = np.where(finite, py, 0.0)
        cx = np.floor((fx - self.x0) / self.dx).astype(np.int64)
        cy = np.floor((fy - self.y0) / self.dy).astype(np.int64)
        inside = finite & (cx >= 0) & (cx < self.nx) & (cy >= 0) & (cy < self.ny)
        cell = cx * self.ny + cy
        cell[~inside] = -1
        return cell

    def candidates_for_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, item_id) candidate pairs for a batch of points, vectorized."""
        cell = self.point_cells(np.asarray(px, np.float64), np.asarray(py, np.float64))
        ok = cell >= 0
        pidx = np.nonzero(ok)[0]
        c = cell[ok]
        starts = self.cell_offsets[c]
        stops = self.cell_offsets[c + 1]
        counts = stops - starts
        point_idx = np.repeat(pidx, counts)
        item_idx = self.cell_items[_expand_ranges(starts, stops)]
        return point_idx, item_idx
