"""Euclidean kNN of a point Dataset against a broadcast query-point set.

The north star's "ST_Distance kNN" (BASELINE.json): the reference only has
row-wise distance (`geoseries.rs:141-146`), so kNN is a new composition —
per-batch partial top-k against the broadcast query matrix (one vectorized
distance computation per batch), then a per-query merge. Per-batch partials
are (queries x k) rows, so the shuffle moves O(q*k*blocks) tiny rows, never
the point table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class EuclideanTopK:
    """Per-batch partial top-k: distances from batch points to query points."""

    def __init__(self, queries, k: int, x_col: str = "x", y_col: str = "y", id_col: str = "id"):
        q = ray.get(queries) if isinstance(queries, ray.ObjectRef) else queries
        self.qid = np.asarray(q["qid"], dtype=np.int64)
        self.qx = np.asarray(q["qx"], dtype=np.float64)
        self.qy = np.asarray(q["qy"], dtype=np.float64)
        self.k = k
        self.x_col, self.y_col, self.id_col = x_col, y_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        x = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        dx = x[:, None] - self.qx[None, :]
        dy = y[:, None] - self.qy[None, :]
        d = np.sqrt(dx * dx + dy * dy)  # (n, q)
        k = min(self.k, len(ids))
        top = np.argpartition(d, kth=k - 1, axis=0)[:k]  # (k, q)
        qn = len(self.qid)
        rows = top.T.reshape(-1)
        return pa.table(
            {
                "qid": pa.array(np.repeat(self.qid, k)),
                self.id_col: pa.array(ids[rows]),
                "distance": pa.array(d[rows, np.repeat(np.arange(qn), k)]),
            }
        )


def knn_join(
    points_ds,
    targets_ds,
    k: int,
    cell_deg: float = 5.0,
    x_col: str = "x",
    y_col: str = "y",
    point_id: str = "pid",
    target_id: str = "tid",
    num_partitions: int = 16,
):
    """Large-large exact kNN join: each left point's k nearest right points.

    Scale path (SURVEY.md §7 M7): targets replicate to their grid cell plus
    the 8 neighbors; points hash-join on their own cell, so every candidate
    within ``cell_deg`` of a query is co-located (worst-case coverage radius
    of the 3x3 block). Per-point top-k runs vectorized per hash partition.
    Points whose k-th candidate is not provably within the coverage radius
    (kth distance >= cell_deg, or fewer than k candidates) fall back to an
    exact broadcast scan — a small remainder when ``cell_deg`` is chosen so
    the expected k neighbors fit one cell.

    Returns (point_id, target_id, distance, rank); ties break on target id.
    """
    import pyarrow.compute as pc

    from geopolars_ray.geom import tiles as tiles_mod
    from geopolars_ray.stages.agg import hash_partitioned_map

    ny = int(np.ceil(180.0 / cell_deg))

    def target_cells(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        cell = tiles_mod.grid_tile_id(x, y, cell_deg)
        # replicate to the 3x3 neighborhood
        reps = []
        cells = []
        for dx in (-ny, 0, ny):
            for dy in (-1, 0, 1):
                reps.append(np.arange(len(x)))
                cells.append(cell + dx + dy)
        rows = np.concatenate(reps)
        out = batch.select([target_id, x_col, y_col]).take(pa.array(rows))
        out = out.rename_columns([target_id, "_tx", "_ty"])
        return out.append_column("_cell", pa.array(np.concatenate(cells)))

    def point_cells(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        cell = tiles_mod.grid_tile_id(x, y, cell_deg)
        return batch.select([point_id, x_col, y_col]).append_column("_cell", pa.array(cell))

    pts = points_ds.map_batches(point_cells, batch_format="pyarrow")
    tgt = targets_ds.map_batches(target_cells, batch_format="pyarrow")
    joined = pts.join(
        tgt, join_type="inner", num_partitions=num_partitions, on=("_cell",)
    )

    def topk_per_point(part: pa.Table) -> pa.Table:
        pid = np.asarray(part[point_id].to_pylist(), dtype=np.int64)
        px = part[x_col].to_numpy(zero_copy_only=False)
        py = part[y_col].to_numpy(zero_copy_only=False)
        tid = np.asarray(part[target_id].to_pylist(), dtype=np.int64)
        tx = part["_tx"].to_numpy(zero_copy_only=False)
        ty = part["_ty"].to_numpy(zero_copy_only=False)
        d = np.sqrt((px - tx) ** 2 + (py - ty) ** 2)
        order = np.lexsort((tid, d, pid))
        pid, tid, d = pid[order], tid[order], d[order]
        cut = np.nonzero(np.diff(pid))[0] + 1
        out_p, out_t, out_d, out_r, out_ok = [], [], [], [], []
        for p_ids, t_ids, dists in zip(np.split(pid, cut), np.split(tid, cut), np.split(d, cut)):
            kk = min(k, len(t_ids))
            complete = len(t_ids) >= k and dists[k - 1] < cell_deg
            out_p.append(p_ids[:kk])
            out_t.append(t_ids[:kk])
            out_d.append(dists[:kk])
            out_r.append(np.arange(1, kk + 1, dtype=np.int64))
            out_ok.append(np.full(kk, complete))
        if not out_p:
            return pa.table({point_id: pa.array([], pa.int64()), target_id: pa.array([], pa.int64()),
                             "distance": pa.array([], pa.float64()), "rank": pa.array([], pa.int64()),
                             "_complete": pa.array([], pa.bool_())})
        return pa.table(
            {
                point_id: pa.array(np.concatenate(out_p)),
                target_id: pa.array(np.concatenate(out_t)),
                "distance": pa.array(np.concatenate(out_d)),
                "rank": pa.array(np.concatenate(out_r)),
                "_complete": pa.array(np.concatenate(out_ok)),
            }
        )

    ranked = hash_partitioned_map(joined, [point_id], topk_per_point, num_partitions)
    ranked = ranked.materialize()
    complete = ranked.map_batches(
        lambda t: t.filter(pc.equal(t["_complete"], True)).drop_columns(["_complete"]),
        batch_format="pyarrow",
    )

    # Exact fallback for the incomplete remainder (k-th neighbor not provably
    # inside the 3x3 coverage radius, or no candidates at all). The remainder
    # id set is collected on the driver — fine while it is small (dense
    # targets / well-chosen cell_deg); the fully-distributed alternative is
    # an expanding-ring second pass keyed on the same cells.
    incomplete_ids = set(
        r[point_id]
        for r in ranked.map_batches(
            lambda t: t.filter(pc.equal(t["_complete"], False)).select([point_id]),
            batch_format="pyarrow",
        ).take_all()
    )
    all_pids = set(r[point_id] for r in pts.select_columns([point_id]).take_all())
    seen_pids = set(r[point_id] for r in ranked.select_columns([point_id]).take_all())
    incomplete_ids |= all_pids - seen_pids
    if not incomplete_ids:
        return complete

    wanted = np.fromiter(incomplete_ids, dtype=np.int64)
    fb_pts = pts.map_batches(
        lambda t: t.filter(
            pa.array(np.isin(np.asarray(t[point_id].to_pylist(), dtype=np.int64), wanted))
        ),
        batch_format="pyarrow",
    )
    fb = fb_pts.select_columns([point_id, x_col, y_col]).take_all()
    queries = {
        "qid": np.array([r[point_id] for r in fb], dtype=np.int64),
        "qx": np.array([r[x_col] for r in fb]),
        "qy": np.array([r[y_col] for r in fb]),
    }
    fallback = euclidean_knn(
        targets_ds, queries, k, x_col=x_col, y_col=y_col, id_col=target_id
    )

    def rn(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("qid")
        return batch.set_column(idx, point_id, batch["qid"])

    fallback = fallback.map_batches(rn, batch_format="pyarrow")
    return complete.union(fallback.select_columns(complete.schema().names))


def euclidean_knn(points_ds, queries: dict, k: int, x_col="x", y_col="y", id_col="id", concurrency=2):
    """Exact kNN rows (qid, id, distance, rank); ties broken by id asc."""
    ref = ray.put(queries)
    partials = points_ds.map_batches(
        EuclideanTopK,
        fn_constructor_kwargs=dict(queries=ref, k=k, x_col=x_col, y_col=y_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge(group: pa.Table) -> pa.Table:
        d = np.asarray(group["distance"].to_pylist())
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        qid = group["qid"][0].as_py()
        order = np.lexsort((ids, d))[:k]
        return pa.table(
            {
                "qid": pa.array(np.full(len(order), qid, dtype=np.int64)),
                id_col: pa.array(ids[order]),
                "distance": pa.array(d[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return partials.groupby("qid").map_groups(merge, batch_format="pyarrow")
