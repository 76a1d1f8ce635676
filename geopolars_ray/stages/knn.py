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
