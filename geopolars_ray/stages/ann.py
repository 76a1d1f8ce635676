"""Similarity search over an embedding column: brute-force + LSH-bucketed ANN.

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast (``ray.put`` once, loaded per actor in ``__init__``), each batch
does one matmul and emits per-batch partial top-k rows — tiny (queries x k)
outputs — and a final per-query reduce merges partials. The LSH variant
(:class:`geopolars_ray.stages.dedup.EmbeddingLSH`) restricts the scan to
matching buckets — the scale path when the corpus no longer fits a
full scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class BruteForceTopK:
    """Per-batch exact cosine top-k against a broadcast query matrix."""

    def __init__(self, queries, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
        q = ray.get(queries) if isinstance(queries, ray.ObjectRef) else queries
        self.qids = np.asarray(q["qid"], dtype=np.int64)
        qm = np.asarray(q["qvec"], dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.qmat = qm / qn
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        emb = np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        sim = (emb / norm) @ self.qmat.T  # (n, q)
        k = min(self.k, len(ids))
        top = np.argpartition(-sim, kth=k - 1, axis=0)[:k]  # (k, q)
        qn = self.qmat.shape[0]
        out_q = np.repeat(self.qids, k)
        out_id = ids[top.T.reshape(-1)]
        out_sim = sim[top.T.reshape(-1), np.repeat(np.arange(qn), k)]
        return pa.table(
            {
                "qid": pa.array(out_q),
                "vec_id": pa.array(out_id),
                "cosine": pa.array(out_sim),
            }
        )


def merge_topk(k: int = 10):
    """map_groups fn: merge per-batch partials into the global per-query top-k.

    Deterministic tie-break: (-cosine, vec_id).
    """

    def fn(group: pa.Table) -> pa.Table:
        sim = np.asarray(group["cosine"].to_pylist())
        ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        qid = group["qid"][0].as_py()
        order = np.lexsort((ids, -sim))[:k]
        return pa.table(
            {
                "qid": pa.array(np.full(len(order), qid, dtype=np.int64)),
                "vec_id": pa.array(ids[order]),
                "cosine": pa.array(sim[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return fn


def brute_force_knn(ds, queries: dict, k: int = 10, concurrency=2,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """embeddings Dataset -> exact top-k rows (qid, vec_id, cosine, rank).

    ``queries`` = {"qid": (q,), "qvec": (q, d)}; broadcast once.
    """
    ref = ray.put(queries)
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries=ref, k=k, id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return partials.groupby("qid").map_groups(merge_topk(k), batch_format="pyarrow")


def lsh_knn(ds, queries: dict, dim: int, k: int = 10, n_planes: int = 8, concurrency=2,
            id_col: str = "vec_id", emb_col: str = "embedding"):
    """Approximate top-k: scan only rows whose LSH bucket matches a query's.

    Recall < 1.0 by design (bucket-boundary misses); n_planes trades recall
    for scan fraction (2^-n_planes of the corpus per query in expectation).
    """
    from geopolars_ray.stages.dedup import EmbeddingLSH

    rng_planes = EmbeddingLSH(dim, n_planes, id_col=id_col, emb_col=emb_col)
    qm = np.asarray(queries["qvec"], dtype=np.float64)
    qbits = (qm @ rng_planes.planes > 0).astype(np.uint64)
    with np.errstate(over="ignore"):
        qkeys = np.zeros(len(qm), dtype=np.uint64)
        for p in range(n_planes):
            qkeys |= qbits[:, p] << np.uint64(p)
    wanted = set(qkeys.view(np.int64).tolist())

    bucketed = ds.map_batches(
        EmbeddingLSH,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    filtered = bucketed.map_batches(
        lambda t: t.filter(pa.array(np.isin(np.asarray(t["lsh_bucket"].to_pylist()), list(wanted)))),
        batch_format="pyarrow",
    )
    return brute_force_knn(filtered, queries, k=k, concurrency=concurrency, id_col=id_col, emb_col=emb_col)
