"""Spatial joins: reference-parity local join, broadcast PIP join, partitioned join.

Reimplements ``spatial_join(lhs, rhs, SpatialJoinArgs)``
(``/root/reference/geopolars/src/spatial_index.rs:37-204``) in three forms:

- :func:`spatial_join_table` — local (two Arrow tables), bit-for-bit parity
  with the reference's semantics incl. its predicate dispatch table
  (`spatial_index.rs:89-137`) and suffix naming (`:164-184`); reproduces the
  golden fixture shapes (2,4)/(9,4) (FIXTURES.md F5).
- :class:`BroadcastPIPJoin` — the scale path for the north-star shape:
  small polygon side broadcast (``ray.put`` once), an actor pool holds the
  prepared polygons + grid index (built once per actor in ``__init__``,
  mirroring the reference's ``Arc<SpatialIndex>`` amortization,
  `spatial_index.rs:15-35`) and streams point batches through with fully
  vectorized candidate generation. Joined rows are emitted directly with the
  point payload — no equi-join tail needed (SURVEY.md §3.3).
- :func:`partitioned_spatial_join` — large-large: replicate each polygon to
  the grid cells its bbox overlaps, assign each point its cell, then a native
  hash ``Dataset.join`` on the cell id + exact refinement. A point lives in
  exactly one cell so no output dedup is needed. Partitioning assumption:
  polygon bboxes are small relative to the cell size (replication factor
  stays O(1)); choose ``cell_deg`` accordingly.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa

import ray

from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb
from geopolars_ray.geom import kernels as K
from geopolars_ray.geom.array import (
    POINT,
    LINESTRING,
    LINEARRING,
    POLYGON,
    MULTIPOINT,
    MULTILINESTRING,
    MULTIPOLYGON,
)
from geopolars_ray.geom.strtree import (
    STRTree,
    GridIndex,
    PreparedPolygons,
    points_in_polygon_single,
)
from geopolars_ray.geom import tiles as tiles_mod

_POLYISH = (POLYGON, MULTIPOLYGON)
_LINEISH = (LINESTRING, LINEARRING, MULTILINESTRING)


# --------------------------------------------------------------------------
# exact predicate refinement (reference dispatch table, spatial_index.rs:89-137)
# --------------------------------------------------------------------------


def _rings_of(ga: GeometryArray, i: int) -> list[np.ndarray]:
    rings = []
    for p in range(ga.geom_offsets[i], ga.geom_offsets[i + 1]):
        for r in range(ga.part_offsets[p], ga.part_offsets[p + 1]):
            rings.append(ga.coords[ga.ring_offsets[r] : ga.ring_offsets[r + 1]])
    return rings


def _segments_of_rings(rings: list[np.ndarray]) -> np.ndarray | None:
    segs = []
    for c in rings:
        if len(c) >= 2:
            segs.append(np.stack([c[:-1], c[1:]], axis=1))
    if not segs:
        return None
    return np.concatenate(segs, axis=0)


# segment-segment intersection lives in the kernel layer (shared with
# distance()); keep the historical private alias for local callers
_segments_cross = K.segments_cross


def _point_in_or_on(rings: list[np.ndarray], px: float, py: float) -> tuple[bool, bool]:
    """(strictly inside, on boundary)."""
    inside = points_in_polygon_single(np.array([px]), np.array([py]), rings)[0]
    segs = _segments_of_rings(rings)
    on_b = False
    if segs is not None:
        a = segs[:, 0]
        b = segs[:, 1]
        cross = (b[:, 0] - a[:, 0]) * (py - a[:, 1]) - (b[:, 1] - a[:, 1]) * (px - a[:, 0])
        within = (
            (px >= np.minimum(a[:, 0], b[:, 0]))
            & (px <= np.maximum(a[:, 0], b[:, 0]))
            & (py >= np.minimum(a[:, 1], b[:, 1]))
            & (py <= np.maximum(a[:, 1], b[:, 1]))
        )
        on_b = bool(((cross == 0) & within).any())
    return bool(inside), on_b


def _poly_poly(l_rings, r_rings, want_contains: bool, l_contains_r: bool) -> bool:
    """Polygon-polygon Intersects, or Contains (container side chosen by flag)."""
    sl = _segments_of_rings(l_rings)
    sr = _segments_of_rings(r_rings)
    la = np.concatenate([r for r in l_rings if len(r)]) if l_rings else np.empty((0, 2))
    ra = np.concatenate([r for r in r_rings if len(r)]) if r_rings else np.empty((0, 2))
    if want_contains:
        outer = l_rings if l_contains_r else r_rings
        inner_pts = ra if l_contains_r else la
        inside = points_in_polygon_single(inner_pts[:, 0], inner_pts[:, 1], outer)
        # boundary-inclusive vertex test: a vertex on the outer boundary is ok
        if not inside.all():
            for k in np.nonzero(~inside)[0]:
                _, on_b = _point_in_or_on(outer, float(inner_pts[k, 0]), float(inner_pts[k, 1]))
                if not on_b:
                    return False
        # a proper (transversal) edge crossing falsifies containment even
        # with every vertex inside-or-on; boundary touches are allowed
        if sl is not None and sr is not None and _segments_cross(sl, sr, proper_only=True):
            return False
        return True
    # intersects
    if sl is not None and sr is not None and _segments_cross(sl, sr):
        return True
    if len(ra) and points_in_polygon_single(ra[:, 0], ra[:, 1], l_rings).any():
        return True
    if len(la) and points_in_polygon_single(la[:, 0], la[:, 1], r_rings).any():
        return True
    return False


def _line_contains_point(segs: np.ndarray | None, px: float, py: float) -> bool:
    if segs is None:
        return False
    a, b = segs[:, 0], segs[:, 1]
    cross = (b[:, 0] - a[:, 0]) * (py - a[:, 1]) - (b[:, 1] - a[:, 1]) * (px - a[:, 0])
    within = (
        (px >= np.minimum(a[:, 0], b[:, 0]))
        & (px <= np.maximum(a[:, 0], b[:, 0]))
        & (py >= np.minimum(a[:, 1], b[:, 1]))
        & (py <= np.maximum(a[:, 1], b[:, 1]))
    )
    return bool(((cross == 0) & within).any())


def refine_pair(lhs: GeometryArray, rhs: GeometryArray, li: int, ri: int, predicate: str) -> bool:
    """Exact test for one candidate pair, following the reference's dispatch
    (`spatial_index.rs:89-137`) including its quirks:

    - Point ⊗ (Multi)Polygon — IN EITHER OPERAND ORDER (`:90-96`) — uses
      polygon-contains-point regardless of the requested predicate,
      boundary-exclusive;
    - (Multi)Polygon ⊗ Polygon honors Contains vs Intersects (`:98-116`);
    - Polygon ⊗ MultiPolygon supports only Intersects (`:118-123`);
    - Line-ish ⊗ Point — in either order (`:125-135`) — uses
      line-contains-point;
    - every other type pair is silently false (`:136`).
    """
    lt, rt = int(lhs.types[li]), int(rhs.types[ri])
    co_l = lhs.coord_offsets()
    co_r = rhs.coord_offsets()
    if lt == POINT and rt in _POLYISH:
        p = lhs.coords[co_l[li]]
        return bool(points_in_polygon_single(np.array([p[0]]), np.array([p[1]]), _rings_of(rhs, ri))[0])
    if lt in _POLYISH and rt == POINT:
        p = rhs.coords[co_r[ri]]
        return bool(points_in_polygon_single(np.array([p[0]]), np.array([p[1]]), _rings_of(lhs, li))[0])
    if lt in _POLYISH and rt == POLYGON:
        return _poly_poly(
            _rings_of(lhs, li), _rings_of(rhs, ri), want_contains=(predicate == "contains"), l_contains_r=True
        )
    if lt == POLYGON and rt == MULTIPOLYGON:
        if predicate == "contains":
            return False
        return _poly_poly(_rings_of(lhs, li), _rings_of(rhs, ri), want_contains=False, l_contains_r=True)
    if lt in _LINEISH and rt == POINT:
        p = rhs.coords[co_r[ri]]
        return _line_contains_point(_segments_of_rings(_rings_of(lhs, li)), p[0], p[1])
    if lt == POINT and rt in _LINEISH:
        p = lhs.coords[co_l[li]]
        return _line_contains_point(_segments_of_rings(_rings_of(rhs, ri)), p[0], p[1])
    return False


# --------------------------------------------------------------------------
# local reference-parity join
# --------------------------------------------------------------------------


def spatial_join_table(
    lhs: pa.Table,
    rhs: pa.Table,
    how: str = "inner",
    predicate: str = "intersects",
    l_suffix: str = "_left",
    r_suffix: str = "_right",
    geometry_col: str = "geometry",
) -> pa.Table:
    """Reference-parity spatial join of two Arrow tables.

    Pipeline mirrors `spatial_index.rs:37-204`: envelope R-trees on both
    sides -> bbox candidate pairs -> exact predicate refinement -> suffix

    ``predicate``: ``intersects`` / ``contains`` (the reference's dispatch)
    plus ``within`` (GeoPandas-parity extension: ``within(l, r)`` ==
    ``contains(r, l)``, refined with operand sides flipped).
    every column of both sides (`:164-184`) -> inner/left finish
    (`:186-204`). Row identity is positional within the tables, which is
    sound here because both tables are local (Ray blocks would not preserve a
    global order — the Dataset-level joins below use key columns instead,
    SURVEY.md §7 "hard" #3).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")  # `:200-203`
    if predicate not in ("intersects", "contains", "within"):
        raise ValueError(f"unsupported predicate {predicate!r}")
    for t, side in ((lhs, "lhs"), (rhs, "rhs")):
        if geometry_col not in t.column_names:
            raise ValueError(f"{side} table lacks required column {geometry_col!r}")  # `:44-45`

    lg = decode_wkb(lhs[geometry_col])
    rg = decode_wkb(rhs[geometry_col])
    lb = np.column_stack(K.bounds(lg))
    rb = np.column_stack(K.bounds(rg))
    tree = STRTree(rb)
    li_list: list[int] = []
    ri_list: list[int] = []
    for i in range(len(lg)):
        if np.isnan(lb[i]).any():
            continue
        cand = tree.query_box(lb[i, 0], lb[i, 1], lb[i, 2], lb[i, 3])
        for j in cand:
            # within(l, r) == contains(r, l) (GeoPandas-parity extension
            # beyond the reference's intersects/contains dispatch); bbox
            # candidates are symmetric so only the refinement flips sides
            if predicate == "within":
                hit = refine_pair(rg, lg, int(j), i, "contains")
            else:
                hit = refine_pair(lg, rg, i, int(j), predicate)
            if hit:
                li_list.append(i)
                ri_list.append(int(j))
    li = np.array(li_list, dtype=np.int64)
    ri = np.array(ri_list, dtype=np.int64)

    lhs_sfx = lhs.rename_columns([c + l_suffix for c in lhs.column_names])
    rhs_sfx = rhs.rename_columns([c + r_suffix for c in rhs.column_names])

    if how == "inner":
        out_l = lhs_sfx.take(pa.array(li))
        out_r = rhs_sfx.take(pa.array(ri))
    else:  # left: every lhs row, null-extended where unmatched (`:192-199`)
        matched = np.zeros(len(lhs), dtype=bool)
        matched[li] = True
        unmatched = np.nonzero(~matched)[0]
        all_l = np.concatenate([li, unmatched])
        order = np.argsort(all_l, kind="stable")
        take_l = all_l[order]
        take_r = np.concatenate([ri, np.full(len(unmatched), -1, dtype=np.int64)])[order]
        out_l = lhs_sfx.take(pa.array(take_l))
        r_idx = pa.array([None if v < 0 else int(v) for v in take_r], pa.int64())
        out_r = rhs_sfx.take(r_idx)
    cols = list(out_l.columns) + list(out_r.columns)
    names = out_l.column_names + out_r.column_names
    return pa.table(dict(zip(names, cols)))


# --------------------------------------------------------------------------
# broadcast PIP join (the north-star hot path)
# --------------------------------------------------------------------------


class BroadcastPIPJoin:
    """Actor-pool stage: stream point batches against broadcast polygons.

    ``polygons`` is a ``ray.ObjectRef`` to (or the value of) an Arrow table
    with a WKB ``geometry`` column plus payload columns. The prepared
    polygon set + grid index are built ONCE per actor; every batch then runs
    vectorized candidate generation + grouped-by-polygon PIP refinement.

    ``how="inner"`` keeps only matched points; ``"left"`` keeps all points
    with null payload for unmatched ones. Points matching k polygons emit k
    rows (non-overlapping admin cells -> k<=1 in the flagship).

    ``predicate="dwithin"`` (with ``distance``) matches points inside OR
    within ``distance`` of each polygon's boundary (GeoPandas
    ``sjoin(predicate="dwithin")`` parity): candidate boxes expand by the
    distance, the refine adds one (points x segments) block per polygon.
    """

    def __init__(
        self,
        polygons,
        lon_col: str = "lon",
        lat_col: str = "lat",
        how: str = "inner",
        payload_cols: Iterable[str] | None = None,
        geometry_col: str = "geometry",
        predicate: str = "intersects",
        distance: float | None = None,
    ):
        if predicate not in ("intersects", "dwithin"):
            raise ValueError(f"unsupported broadcast-join predicate {predicate!r}")
        if predicate == "dwithin" and not (distance is not None and distance >= 0):
            raise ValueError("predicate='dwithin' requires distance >= 0")
        table = ray.get(polygons) if isinstance(polygons, ray.ObjectRef) else polygons
        ga = decode_wkb(table[geometry_col])
        self.prep = PreparedPolygons.from_geometry_array(ga)
        self.predicate = predicate
        self.distance = float(distance) if distance is not None else 0.0
        # dwithin: candidate generation must see by-distance-expanded boxes
        boxes = self.prep.bounds
        if predicate == "dwithin" and self.distance > 0:
            boxes = boxes + np.array([-self.distance, -self.distance, self.distance, self.distance])
        self.grid = GridIndex(boxes)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.how = how
        names = payload_cols if payload_cols is not None else [c for c in table.column_names if c != geometry_col]
        self.payload = table.select(list(names))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        pidx, items = self.grid.candidates_for_points(np.where(ok, lon, np.inf), np.where(ok, lat, np.inf))
        # refine grouped by polygon so each polygon tests its points vectorized
        m_points: list[np.ndarray] = []
        m_items: list[np.ndarray] = []
        if len(pidx):
            order = np.argsort(items, kind="stable")
            items_s = items[order]
            pidx_s = pidx[order]
            cut = np.nonzero(np.diff(items_s))[0] + 1
            for grp_items, grp_pts in zip(np.split(items_s, cut), np.split(pidx_s, cut)):
                poly = int(grp_items[0])
                if self.predicate == "dwithin":
                    inside = self.prep.dwithin_points(poly, lon[grp_pts], lat[grp_pts], self.distance)
                else:
                    inside = self.prep.contains_points(poly, lon[grp_pts], lat[grp_pts])
                sel = grp_pts[inside]
                if len(sel):
                    m_points.append(sel)
                    m_items.append(np.full(len(sel), poly, dtype=np.int64))
        if m_points:
            mp = np.concatenate(m_points)
            mi = np.concatenate(m_items)
        else:
            mp = np.empty(0, dtype=np.int64)
            mi = np.empty(0, dtype=np.int64)

        if self.how == "inner":
            out = batch.take(pa.array(mp))
            pay = self.payload.take(pa.array(mi))
        else:
            matched = np.zeros(len(batch), dtype=bool)
            matched[mp] = True
            unmatched = np.nonzero(~matched)[0]
            all_p = np.concatenate([mp, unmatched])
            order = np.argsort(all_p, kind="stable")
            take_p = all_p[order]
            take_i = np.concatenate([mi, np.full(len(unmatched), -1, dtype=np.int64)])[order]
            out = batch.take(pa.array(take_p))
            pay = self.payload.take(pa.array([None if v < 0 else int(v) for v in take_i], pa.int64()))
        for name, col in zip(pay.column_names, pay.columns):
            out = out.append_column(name, col)
        return out


def broadcast_spatial_join(
    points_ds,
    polygons: pa.Table,
    lon_col: str = "lon",
    lat_col: str = "lat",
    how: str = "inner",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 65536,
    predicate: str = "intersects",
    distance: float | None = None,
):
    """points Dataset ⋈ broadcast polygon table (point-in-polygon).

    The polygon table is ``ray.put`` ONCE; each actor reads the object ref in
    ``__init__`` — never re-shipped per batch.

    Default ``concurrency=(1, 4)`` autoscales from ONE actor: a fixed actor
    count is a hard CPU reservation, and a pool of 4 deadlocks a 4-CPU
    cluster when any other operator needs a slot.

    Parallelism note: the pool can launch at most one task PER INPUT BLOCK.
    An in-memory single-block source (``from_arrow`` of one table) therefore
    serializes the whole join onto one actor — ``repartition(...)`` such
    inputs first (file-backed reads are already multi-block).
    """
    ref = ray.put(polygons)
    return points_ds.map_batches(
        BroadcastPIPJoin,
        fn_constructor_kwargs=dict(polygons=ref, lon_col=lon_col, lat_col=lat_col, how=how,
                                   predicate=predicate, distance=distance),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# partitioned (large-large) spatial join
# --------------------------------------------------------------------------


def partitioned_spatial_join(
    points_ds,
    polygons_ds,
    cell_deg: float = 5.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    geometry_col: str = "geometry",
    num_partitions: int = 64,
    predicate: str = "intersects",
    distance: float | None = None,
    h3_res: int | None = None,
    s2_level: int | None = None,
):
    """Large-large PIP join: co-partition both sides by grid cell, hash-join,
    refine exactly. Returns matched point rows + polygon payload columns.

    ``h3_res`` switches the exchange key from lat/lon grid cells to
    CANONICAL Uber H3 cells at that resolution: each polygon replicates to
    its complete intersection cover (`geom/h3.py polygon_to_cells
    mode="cover"` — shape-following, so no dead bbox corners, and
    equal-area globally, so no polar-cell skew), each point carries its
    single `latlng_to_cell` id, and the refinement is unchanged. The cover
    is computed per polygon (one geometry = one unit of work, as in
    dissolve); intersects-only — use the grid mode for dwithin.

    ``s2_level`` is the same exchange on S2 cells (`geom/s2.py
    polygon_covering mode="cover"` per polygon, `s2_cell_id` per point) —
    hierarchical Hilbert keys, near-equal-area. Mutually exclusive with
    ``h3_res``; intersects-only.

    Shuffle plan: polygons replicate to every cell their bbox overlaps
    (flat_map-style batch kernel); points carry their single cell id; a
    native hash ``Dataset.join`` on ``_cell`` co-locates them; a final
    vectorized PIP refinement drops bbox-only false positives. Each point
    has exactly one cell, so no pair dedup is needed. Hot cells can be split
    further by salting the cell id on the polygon side and duplicating the
    point-side lookup — not needed while polygon side per cell stays small.

    ``predicate="dwithin"`` (with ``distance``): polygons replicate to the
    cells of their by-distance-EXPANDED bbox and the refine swaps PIP for
    the inside-or-within-distance test — same exchange plan, same
    grouped-by-polygon vectorization (`geom/strtree.py points_dwithin_rings`).
    """
    from geopolars_ray.geom.array import _expand_ranges
    from geopolars_ray.geom.strtree import points_dwithin_rings

    if predicate not in ("intersects", "dwithin"):
        raise ValueError(f"unsupported partitioned-join predicate {predicate!r}")
    if predicate == "dwithin" and not (distance is not None and distance >= 0):
        raise ValueError("predicate='dwithin' requires distance >= 0")
    if h3_res is not None and s2_level is not None:
        raise ValueError("h3_res and s2_level are mutually exclusive")
    if (h3_res is not None or s2_level is not None) and predicate != "intersects":
        raise ValueError("cell-id exchanges support predicate='intersects' only")
    pad = float(distance) if predicate == "dwithin" and distance else 0.0

    ny = int(np.ceil(180.0 / cell_deg))

    def poly_to_h3_cells(batch: pa.Table) -> pa.Table:
        from geopolars_ray.geom import h3 as h3_mod

        ga = decode_wkb(batch[geometry_col])
        rows_l, cells_l = [], []
        for i in range(len(ga.types)):
            rings = [r for r in _rings_of(ga, i) if len(r) >= 3]
            if not rings:
                continue
            cov = h3_mod.polygon_to_cells(rings, h3_res, mode="cover")
            rows_l.append(np.full(len(cov), i, dtype=np.int64))
            cells_l.append(cov.view(np.int64))
        if not rows_l:
            return batch.slice(0, 0).append_column("_cell", pa.array([], pa.int64()))
        out = batch.take(pa.array(np.concatenate(rows_l)))
        return out.append_column("_cell", pa.array(np.concatenate(cells_l), pa.int64()))

    def point_h3_cell(batch: pa.Table) -> pa.Table:
        from geopolars_ray.geom import h3 as h3_mod

        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        cell = h3_mod.latlng_to_cell(np.where(ok, lat, 0.0), np.where(ok, lon, 0.0),
                                     h3_res).view(np.int64)
        batch = batch.append_column("_cell", pa.array(np.where(ok, cell, -1), type=pa.int64()))
        return batch.filter(pa.array(ok))

    def poly_to_s2_cells(batch: pa.Table) -> pa.Table:
        from geopolars_ray.geom import s2 as s2_mod

        ga = decode_wkb(batch[geometry_col])
        rows_l, cells_l = [], []
        for i in range(len(ga.types)):
            rings = [r for r in _rings_of(ga, i) if len(r) >= 3]
            if not rings:
                continue
            cov = s2_mod.polygon_covering(rings, s2_level, mode="cover")
            rows_l.append(np.full(len(cov), i, dtype=np.int64))
            cells_l.append(cov.view(np.int64))
        if not rows_l:
            return batch.slice(0, 0).append_column("_cell", pa.array([], pa.int64()))
        out = batch.take(pa.array(np.concatenate(rows_l)))
        return out.append_column("_cell", pa.array(np.concatenate(cells_l), pa.int64()))

    def point_s2_cell(batch: pa.Table) -> pa.Table:
        from geopolars_ray.geom import s2 as s2_mod

        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        cell = s2_mod.s2_cell_id(np.where(ok, lon, 0.0), np.where(ok, lat, 0.0),
                                 s2_level).view(np.int64)
        batch = batch.append_column("_cell", pa.array(np.where(ok, cell, -1), type=pa.int64()))
        return batch.filter(pa.array(ok))

    def poly_to_cells(batch: pa.Table) -> pa.Table:
        # vectorized cell-rectangle expansion: each polygon replicates to
        # every grid cell its bbox overlaps (no per-polygon Python loop)
        ga = decode_wkb(batch[geometry_col])
        xmin, ymin, xmax, ymax = K.bounds(ga)
        if pad:
            xmin, ymin, xmax, ymax = xmin - pad, ymin - pad, xmax + pad, ymax + pad
        valid = ~np.isnan(xmin)
        pidx = np.nonzero(valid)[0]
        ix0 = np.floor((xmin[pidx] + 180.0) / cell_deg).astype(np.int64)
        ix1 = np.floor((xmax[pidx] + 180.0) / cell_deg).astype(np.int64)
        iy0 = np.floor((ymin[pidx] + 90.0) / cell_deg).astype(np.int64)
        iy1 = np.floor((ymax[pidx] + 90.0) / cell_deg).astype(np.int64)
        nxv = ix1 - ix0 + 1
        nyv = iy1 - iy0 + 1
        pair_v = np.repeat(np.arange(len(pidx), dtype=np.int64), nxv)  # (poly, col)
        col_ix = _expand_ranges(ix0, ix1 + 1)
        pair2 = np.repeat(np.arange(len(pair_v), dtype=np.int64), nyv[pair_v])
        row_iy = _expand_ranges(iy0[pair_v], iy1[pair_v] + 1)
        rows = pidx[pair_v[pair2]]
        cells = col_ix[pair2] * ny + row_iy
        out = batch.take(pa.array(rows))
        return out.append_column("_cell", pa.array(cells, pa.int64()))

    def point_cell(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        cell = tiles_mod.grid_tile_id(np.where(ok, lon, 0.0), np.where(ok, lat, 0.0), cell_deg)
        batch = batch.append_column("_cell", pa.array(np.where(ok, cell, -1), type=pa.int64()))
        return batch.filter(pa.array(ok))

    from geopolars_ray.stages.hashjoin import hash_join

    if h3_res is not None:
        pts = points_ds.map_batches(point_h3_cell, batch_format="pyarrow")
        polys = polygons_ds.map_batches(poly_to_h3_cells, batch_format="pyarrow")
    elif s2_level is not None:
        pts = points_ds.map_batches(point_s2_cell, batch_format="pyarrow")
        polys = polygons_ds.map_batches(poly_to_s2_cells, batch_format="pyarrow")
    else:
        pts = points_ds.map_batches(point_cell, batch_format="pyarrow")
        polys = polygons_ds.map_batches(poly_to_cells, batch_format="pyarrow")
    # union-based hash_join, NOT Dataset.join: cell ids are sparse keys and
    # Ray 2.49's native hash-shuffle join crashes when a hash partition
    # receives no rows on one side (see stages/hashjoin.py)
    joined = hash_join(
        pts, polys, on=["_cell"], how="inner", num_partitions=num_partitions, r_suffix="_r"
    )

    def refine(batch: pa.Table) -> pa.Table:
        # group candidate rows by polygon identity (exact, via Arrow
        # dictionary-encode of the WKB blob) so each distinct polygon tests
        # all of its candidate points in ONE vectorized PIP call — the same
        # pattern as BroadcastPIPJoin; no per-row Python
        import pyarrow.compute as pc

        # the polygon geometry is suffixed by hash_join when the POINT side
        # also carries a same-named column (e.g. from_xy point WKBs) — the
        # suffixed name, when present, is always the polygon side
        gcol = (geometry_col + "_r" if geometry_col + "_r" in batch.column_names
                else geometry_col)
        if batch.num_rows == 0:
            return batch.drop_columns([c for c in ("_cell", gcol) if c in batch.column_names])
        enc = pc.dictionary_encode(batch[gcol].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uga = decode_wkb(enc.dictionary)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = np.zeros(len(batch), dtype=bool)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        cut = np.nonzero(np.diff(codes_s))[0] + 1
        for grp_rows in np.split(order, cut):
            poly = int(codes[grp_rows[0]])
            if predicate == "dwithin":
                keep[grp_rows] = points_dwithin_rings(
                    lon[grp_rows], lat[grp_rows], _rings_of(uga, poly), pad
                )
            else:
                keep[grp_rows] = points_in_polygon_single(
                    lon[grp_rows], lat[grp_rows], _rings_of(uga, poly)
                )
        out = batch.filter(pa.array(keep))
        return out.drop_columns([c for c in ("_cell", gcol) if c in out.column_names])

    return joined.map_batches(refine, batch_format="pyarrow")
