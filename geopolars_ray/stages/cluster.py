"""Spatial clustering: ST_ClusterDBSCAN and ST_ClusterKMeans.

PostGIS exposes both as window functions that label every input row
(`ST_ClusterDBSCAN(geom, eps, minpoints) OVER ()`,
`ST_ClusterKMeans(geom, k) OVER ()`); the reference has neither. Here
they are Dataset->Dataset stages over point tables, built so every step
is one of the engine's existing scale-safe exchanges:

- **DBSCAN** = one `dwithin_join` self-join (cell-partitioned, each
  eps-pair materializes exactly once) -> combiner-first neighbor counts
  -> semi-join pairs down to core-core edges -> `connected_components`
  (label propagation + pointer jumping, O(log diameter) rounds) ->
  border points take the MIN component among their core neighbors.
  Labels are deterministic: a cluster's id is the minimum point id it
  contains (PostGIS ids are arbitrary; min-id is replayable in SQL).
  Noise rows get a null cluster.
- **KMeans** = exact distributed Lloyd: k-means++ seeding on a
  deterministic bounded sample (smallest Knuth-hash of the coordinate
  bits — layout-independent), then per-iteration ONE `map_batches`
  pass emitting (k, 3) partial sums per block + a tiny hash exchange;
  each centroid update is snap-rounded to a power-of-two lattice
  (~2^-33 of the data scale) so block-split-dependent float
  reassociation cannot leak into the iteration — centroids and labels
  come out bit-identical across parallelism levels (asserted in
  tests). Final centroid ids are renumbered lexicographically by
  (x, y) so labels are stable across runs and cluster counts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from geopolars_ray.stages.agg import hash_aggregate
from geopolars_ray.stages.hashjoin import hash_join
from geopolars_ray.stages.cc import connected_components
from geopolars_ray.stages.knn import dwithin_join

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def dbscan(
    ds,
    eps: float,
    min_points: int,
    *,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
    num_partitions: int = 32,
    cell_size: float | None = None,
):
    """Density-based clustering (ST_ClusterDBSCAN semantics).

    A point is CORE when at least ``min_points`` points (counting
    itself) lie within ``eps``; core points within ``eps`` of each
    other share a cluster; a non-core point within ``eps`` of a core
    point joins that core's cluster (ties -> the minimum cluster id,
    deterministic where PostGIS is arbitrary); everything else is
    noise (null cluster). Returns a Dataset ``(id_col, cluster)`` —
    join it back to the input by id for the window-function shape.
    """
    pts = ds.map_batches(
        lambda b: pa.table({"pid": b[id_col], "x": b[x_col], "y": b[y_col]}),
        batch_format="pyarrow")
    tgts = ds.map_batches(
        lambda b: pa.table({"tid": b[id_col], "x": b[x_col], "y": b[y_col]}),
        batch_format="pyarrow")
    # every eps-pair once (pid < tid), no self pairs
    pairs = dwithin_join(
        pts, tgts, eps, point_id="pid", target_id="tid",
        canonical=True, num_partitions=num_partitions, cell_size=cell_size,
    ).map_batches(lambda b: b.select(["pid", "tid"]), batch_format="pyarrow")
    pairs = pairs.materialize()  # consumed three times below

    # neighbor counts: each canonical pair counts for BOTH endpoints;
    # +1 for self happens in the threshold
    both = pairs.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [b["pid"].combine_chunks(), b["tid"].combine_chunks()])}),
        batch_format="pyarrow")
    counts = hash_aggregate(both, ["node"], [("node", "count", "n_nbrs")],
                            num_partitions=num_partitions)
    need = int(min_points) - 1  # the point itself always counts

    def _core_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(b["n_nbrs"], need)).select(["node"])

    core_ids = counts.map_batches(_core_only, batch_format="pyarrow")
    core_ids = core_ids.materialize()  # small relative to pairs; reused 3x

    # core-core edges -> connected components
    cc_edges = hash_join(
        hash_join(pairs, core_ids, on=("pid",), right_on=("node",),
                  how="left_semi", num_partitions=num_partitions),
        core_ids, on=("tid",), right_on=("node",),
        how="left_semi", num_partitions=num_partitions)
    labels = connected_components(
        cc_edges, src="pid", dst="tid",
        node_col="node", label_col="cluster",
        num_partitions=num_partitions)

    # isolated core points (no core neighbor) are their own cluster
    lonely = hash_join(core_ids, labels, on=("node",),
                       how="left_anti", num_partitions=num_partitions)
    lonely = lonely.map_batches(
        lambda b: pa.table({"node": b["node"], "cluster": b["node"]}),
        batch_format="pyarrow")
    core_labels = labels.union(lonely).materialize()

    # border points: non-core endpoint of a pair whose other endpoint is
    # core -> min component among those core neighbors
    def _directed(b: pa.Table) -> pa.Table:
        p = b["pid"].combine_chunks()
        t = b["tid"].combine_chunks()
        return pa.table({"a": pa.concat_arrays([p, t]),
                         "b": pa.concat_arrays([t, p])})

    directed = pairs.map_batches(_directed, batch_format="pyarrow")
    # keep rows whose b-side is core, then swap in b's cluster label
    to_core = hash_join(directed, core_labels, on=("b",), right_on=("node",),
                        how="inner", num_partitions=num_partitions)
    # drop rows whose a-side is itself core (those are already labeled)
    border_edges = hash_join(to_core, core_ids, on=("a",), right_on=("node",),
                             how="left_anti", num_partitions=num_partitions)
    border = hash_aggregate(
        border_edges.map_batches(
            lambda b: pa.table({"node": b["a"], "cluster": b["cluster"]}),
            batch_format="pyarrow"),
        ["node"], [("cluster", "min", "cluster")],
        num_partitions=num_partitions)

    # noise: never emitted — left-join the result back in the caller, or
    # use the id->cluster map as-is (absent id == noise/null)
    return core_labels.union(border)


def _seed_sample(ds, x_col: str, y_col: str, sample_size: int):
    """Deterministic, layout-independent sample: the ``sample_size``
    points with the smallest Knuth hash of their coordinate bit
    patterns. One per-block partial top-k, one small sort+limit."""

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = (x.view(np.uint64) * _KNUTH) ^ (y.view(np.uint64) + _KNUTH)
        h = h * _KNUTH
        k = min(sample_size, len(h))
        idx = np.argpartition(h, k - 1)[:k] if k < len(h) else np.arange(len(h))
        return pa.table({"x": x[idx], "y": y[idx], "h": h[idx]})

    part = ds.map_batches(partial, batch_format="pyarrow")
    top = part.sort("h").limit(sample_size).take_all()
    return np.array([[r["x"], r["y"]] for r in top], dtype=np.float64)


def _kmeanspp(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = len(sample)
    first = int(rng.integers(n))
    cents = [sample[first]]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = float(d2.sum())
        if tot <= 0:
            cents.append(sample[int(rng.integers(n))])
            continue
        r = rng.random() * tot
        i = int(np.searchsorted(np.cumsum(d2), r))
        i = min(i, n - 1)
        cents.append(sample[i])
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
    return np.asarray(cents, dtype=np.float64)


def kmeans(
    ds,
    k: int,
    *,
    x_col: str = "x",
    y_col: str = "y",
    max_iter: int = 20,
    tol: float = 1e-9,
    sample_size: int = 8192,
    seed: int = 7,
    cluster_col: str = "cluster",
):
    """K-means point clustering (ST_ClusterKMeans semantics): exact
    distributed Lloyd iterations, then one assignment pass appending
    ``cluster_col``. Returns ``(labeled_ds, centroids)`` with centroids
    renumbered lexicographically by (x, y) so cluster ids are stable
    across runs and parallelism levels."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sample = _seed_sample(ds, x_col, y_col, sample_size)
    if len(sample) < k:
        raise ValueError(f"k={k} exceeds the {len(sample)} distinct sampled points")
    cents = _kmeanspp(sample, k, seed)

    for _ in range(max_iter):
        c = cents.copy()

        def partial(b: pa.Table, cents_=c) -> pa.Table:
            x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
            y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
            # (n, k) distance block; k is small so this is fine per batch
            d2 = (x[:, None] - cents_[None, :, 0]) ** 2 \
                + (y[:, None] - cents_[None, :, 1]) ** 2
            a = d2.argmin(axis=1)
            sx = np.bincount(a, weights=x, minlength=len(cents_))
            sy = np.bincount(a, weights=y, minlength=len(cents_))
            ct = np.bincount(a, minlength=len(cents_))
            return pa.table({"cid": np.arange(len(cents_), dtype=np.int64),
                             "sx": sx, "sy": sy, "ct": ct.astype(np.float64)})

        parts = ds.map_batches(partial, batch_format="pyarrow")
        agg = hash_aggregate(parts, ["cid"],
                             [("sx", "sum", "sx"), ("sy", "sum", "sy"),
                              ("ct", "sum", "ct")], num_partitions=8).take_all()
        new = cents.copy()
        for r in agg:
            if r["ct"] > 0:
                new[int(r["cid"])] = (r["sx"] / r["ct"], r["sy"] / r["ct"])
        # Snap each update to a power-of-two lattice ~2^-33 of the data
        # scale: block-split-dependent float reassociation perturbs the
        # partial sums by ~1e-12 relative, and without absorbing it the
        # iteration (and therefore labels) would depend on parallelism.
        scale = max(1.0, float(np.abs(new).max()))
        q = 2.0 ** (math.ceil(math.log2(scale)) - 33)
        new = np.round(new / q) * q
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break

    # stable ids: renumber by (x, y)
    order = np.lexsort((cents[:, 1], cents[:, 0]))
    cents = cents[order]
    final = cents.copy()

    def assign(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d2 = (x[:, None] - final[None, :, 0]) ** 2 \
            + (y[:, None] - final[None, :, 1]) ** 2
        return b.append_column(cluster_col,
                               pa.array(d2.argmin(axis=1).astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow"), cents
