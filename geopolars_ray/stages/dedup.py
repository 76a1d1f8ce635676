"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding.

Scale shapes (per the standard web-corpus dedup pipeline structure —
shingle -> minhash -> band -> bucket-groupby):

- exact: vectorized content hash per batch (polars xxhash), then ONE
  groupby(hash) aggregate — hash-partition + per-group-first; no full-row
  shuffle of payloads when only ids are needed.
- MinHash-LSH near-dup: per batch shingle+sign (stateful actor: permutation
  coefficients built once), flat-map to (band, band_hash, doc_id) rows —
  ~bands× small int rows, not text — groupby the band key, emit candidate
  pairs per bucket, verify exact Jaccard on re-shingled pairs.
- SimHash: 64-bit sketch; candidates via 4x16-bit chunk banding (hamming<=3
  within buckets).
- embedding cosine: random-hyperplane LSH buckets, exact cosine within
  buckets.

All randomized state is seeded -> byte-identical across retries and
parallelism levels.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def content_hash(cols: Iterable[str], out_col: str = "content_hash") -> Callable[[pa.Table], pa.Table]:
    """Vectorized 64-bit content hash of one or more columns (polars xxhash)."""
    cols = list(cols)

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(cols))
        h = df.hash_rows(seed=0).to_numpy().view(np.int64)
        return batch.append_column(out_col, pa.array(h))

    return fn


def _inter_count(sa: np.ndarray, sb: np.ndarray) -> int:
    """|sa ∩ sb| for sorted unique uint64 arrays (searchsorted: O(n log m),
    ~3x faster than intersect1d's concatenate+sort per pair)."""
    if len(sa) == 0 or len(sb) == 0:
        return 0
    if len(sa) > len(sb):
        sa, sb = sb, sa
    idx = np.searchsorted(sb, sa)
    ok = idx < len(sb)
    return int(np.count_nonzero(sb[idx[ok]] == sa[ok]))


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char-shingle hashes of a document (uint64, sorted)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    with np.errstate(over="ignore"):
        # polynomial rolling hash of each k-gram (2^64 ring)
        h = np.zeros(len(b) - k + 1, dtype=np.uint64)
        for i in range(k):
            h = h * np.uint64(1099511628211) + b[i : len(b) - k + 1 + i].astype(np.uint64)
    return np.unique(h)


class MinHasher:
    """Stateful minhash stage: 64-permutation signatures, banded for LSH.

    ``__init__`` draws the (a, b) permutation coefficients ONCE per actor
    from a fixed seed; ``__call__`` emits ``bands`` rows per document:
    (band, band_hash, doc_id) — the compact exchange that the band groupby
    shuffles instead of document text.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
    ):
        if num_perm % bands:
            raise ValueError("bands must divide num_perm")
        rng = np.random.default_rng(1234)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col
        self.text_col = text_col
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts: list) -> np.ndarray:
        """(n, num_perm) minhash signatures, batch-vectorized.

        All documents' shingle hashes are concatenated into ONE flat array;
        each permutation computes its universal hash over the flat array and
        reduces to per-document minima with ``np.minimum.reduceat`` — no
        per-document Python in the numeric path (the r1 per-doc dense
        (shingles x 64) product was the slowest bench entry at 19s).
        """
        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        shingle_lists = [_shingle_hashes(t or "", self.k) for t in texts]
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum([len(s) for s in shingle_lists[:-1]], out=starts[1:])
        flat = np.concatenate(shingle_lists) if n else np.empty(0, dtype=np.uint64)
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            # universal hash family modulo the Mersenne prime 2^61-1
            for j in range(self.num_perm):
                prod = (flat * self.a[j] + self.b[j]) % _MERSENNE
                sig[:, j] = np.minimum.reduceat(prod, starts)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        sig = self.signatures(texts)
        # band hashes: mix each band's rows into one int64 key
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int64), n)
        doc_ids = np.tile(np.asarray(ids, dtype=np.int64), self.bands)
        bh = np.empty((self.bands, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bnd in range(self.bands):
                rows = sig[:, bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                acc = np.uint64(1469598103934665603)
                for r in range(self.rows_per_band):
                    acc = (acc ^ rows[:, r]) * np.uint64(1099511628211)
                bh[bnd] = acc
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "doc_id": pa.array(doc_ids),
            }
        )


def lsh_candidate_pairs(bands_ds, max_bucket: int = 1000, num_partitions: int = 16):
    """(band, band_hash) buckets -> unordered candidate (a, b) pairs, a < b.

    Bucket cardinality ~ n_docs x bands, so per-bucket ``map_groups`` (with
    Ray's ~200µs/group Python overhead) would dominate at scale; instead
    buckets are hash-partitioned (``hash_partitioned_map``) and each
    partition emits pairs for ALL its buckets in one call. Buckets larger
    than ``max_bucket`` are truncated (quadratic-blowup guard). Pair dedup
    across bands is a hash_aggregate.
    """
    from geopolars_ray.stages.agg import hash_aggregate, hash_partitioned_map

    def to_pairs(part: pa.Table) -> pa.Table:
        band = part["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = part["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, bh, band))
        band, bh, did = band[order], bh[order], did[order]
        # bucket boundaries within this partition
        cut = np.nonzero((np.diff(band) != 0) | (np.diff(bh) != 0))[0] + 1
        a_out, b_out = [], []
        n_truncated = 0
        for ids in np.split(did, cut):
            if len(ids) > max_bucket:
                n_truncated += 1
            ids = ids[:max_bucket]
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            a_out.append(ids[ii])
            b_out.append(ids[jj])
        if n_truncated:
            # silent caps read as full coverage — surface the truncation
            import logging

            logging.getLogger("geopolars_ray.dedup").warning(
                "lsh_candidate_pairs: truncated %d bucket(s) to max_bucket=%d; "
                "near-dup recall inside those buckets is partial",
                n_truncated,
                max_bucket,
            )
        if not a_out:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table(
            {"a": pa.array(np.concatenate(a_out)), "b": pa.array(np.concatenate(b_out))}
        )

    pairs = hash_partitioned_map(bands_ds, ["band", "band_hash"], to_pairs, num_partitions)
    return hash_aggregate(pairs, ["a", "b"], [("a", "count", "n_bands")], num_partitions)


def jaccard_verify(pairs_ds, docs_ds, id_col="doc_id", text_col="text", k: int = 5, threshold: float = 0.7,
                   num_partitions: int = 16, broadcast_max_docs: int = 100_000):
    """Join candidate pairs back to texts and compute exact shingle Jaccard.

    When the corpus fits ``broadcast_max_docs``, the id->text map is
    broadcast (``ray.put`` once) and verification is a single map_batches
    over the pairs — skipping two hash joins whose fixed cost dominates on
    small inputs. Larger corpora take the partitioned join path.
    """
    import ray as _ray

    docs = docs_ds.select_columns([id_col, text_col])
    n_docs = docs.count()
    if n_docs <= broadcast_max_docs:
        # Shingle every doc ONCE, distributed, then broadcast the id->shingle
        # map; verification tasks are pure sorted-set intersections. (The r1
        # per-pair re-shingling made verify the 19s bench bottleneck — each
        # doc appears in many candidate pairs.)
        def shingle_batch(batch: pa.Table) -> pa.Table:
            ids = batch[id_col]
            sh = [
                _shingle_hashes(t or "", k).view(np.int64)
                for t in batch[text_col].to_pylist()
            ]
            return pa.table({id_col: ids, "shingles": pa.array([s.tolist() for s in sh], pa.list_(pa.int64()))})

        lookup = {
            r[id_col]: np.asarray(r["shingles"], dtype=np.int64).view(np.uint64)
            for r in docs.map_batches(shingle_batch, batch_format="pyarrow").take_all()
        }
        ref = _ray.put(lookup)
        empty = np.empty(0, dtype=np.uint64)

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            sh = _ray.get(ref)  # zero-copy numpy views from the object store
            a_ids = np.asarray(batch["a"].to_pylist(), dtype=np.int64)
            b_ids = np.asarray(batch["b"].to_pylist(), dtype=np.int64)
            jac = np.zeros(len(a_ids))
            for i in range(len(a_ids)):
                sa = sh.get(int(a_ids[i]), empty)
                sb = sh.get(int(b_ids[i]), empty)
                inter = _inter_count(sa, sb)
                union = len(sa) + len(sb) - inter
                jac[i] = inter / union if union else 0.0
            out = batch.select(["a", "b"]).append_column("jaccard", pa.array(jac))
            return out.filter(pa.array(jac >= threshold))

        return pairs_ds.map_batches(verify_broadcast, batch_format="pyarrow", batch_size=8192)
    # union-based hash_join, not Dataset.join (Ray 2.49's native hash-shuffle
    # join crashes when a hash partition receives no rows on one side)
    from geopolars_ray.stages.hashjoin import hash_join

    j1 = hash_join(
        pairs_ds, docs, on=["a"], right_on=[id_col], how="inner",
        num_partitions=num_partitions, r_suffix="_a",
    )
    j2 = hash_join(
        j1, docs, on=["b"], right_on=[id_col], how="inner",
        num_partitions=num_partitions, r_suffix="_b",
    )

    def verify(batch: pa.Table) -> pa.Table:
        # after two joins the two text columns carry the _a/_b (or bare+_b) names
        names = [c for c in batch.column_names if c.startswith(text_col)]
        ca, cb = names[0], names[1]
        a_ids = np.asarray(batch["a"].to_pylist(), dtype=np.int64)
        b_ids = np.asarray(batch["b"].to_pylist(), dtype=np.int64)
        A = batch[ca].to_pylist()
        B = batch[cb].to_pylist()
        # per-batch shingle cache: docs repeat across the pairs of a batch
        cache: dict[int, np.ndarray] = {}

        def shingles(doc: int, text) -> np.ndarray:
            s = cache.get(doc)
            if s is None:
                s = _shingle_hashes(text or "", k)
                cache[doc] = s
            return s

        jac = np.zeros(len(A))
        for i in range(len(A)):
            sa = shingles(int(a_ids[i]), A[i])
            sb = shingles(int(b_ids[i]), B[i])
            inter = _inter_count(sa, sb)
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 0.0
        out = batch.select(["a", "b"]).append_column("jaccard", pa.array(jac))
        return out.filter(pa.array(jac >= threshold))

    return j2.map_batches(verify, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash sketches + 16-bit chunk keys for near-dup banding."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        texts = batch[self.text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t or "", 4)
            if not len(sh):
                continue
            bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            with np.errstate(over="ignore"):
                out[i] = np.sum((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        t = batch.append_column("simhash", pa.array(out.view(np.int64)))
        for c in range(4):
            chunk = ((out >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            t = t.append_column(f"sim_chunk{c}", pa.array(chunk))
        return t


class EmbeddingLSH:
    """Random-hyperplane LSH over an embedding list<float> column.

    ``__init__`` draws the (seeded) hyperplane matrix once per actor;
    ``__call__`` emits a bucket key (int64 sign pattern) per row for a
    bucket-groupby + exact-cosine-within-bucket near-dup pass.
    """

    def __init__(self, dim: int, n_planes: int = 16, id_col: str = "vec_id", emb_col: str = "embedding"):
        rng = np.random.default_rng(99)
        self.planes = rng.standard_normal((dim, n_planes))
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        proj = emb @ self.planes
        bits = (proj > 0).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = np.zeros(len(emb), dtype=np.uint64)
            for p in range(self.planes.shape[1]):
                key |= bits[:, p] << np.uint64(p)
        return batch.append_column("lsh_bucket", pa.array(key.view(np.int64)))


def cosine_pairs_within_bucket(threshold: float = 0.95, id_col: str = "vec_id", emb_col: str = "embedding"):
    """map_groups fn: exact pairwise cosine inside one LSH bucket."""

    def fn(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        emb = np.asarray(group[emb_col].to_pylist(), dtype=np.float64)
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        u = emb / norm
        sim = u @ u.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sim[ii, jj] >= threshold
        order = np.argsort(ids)
        a = np.minimum(ids[ii[keep]], ids[jj[keep]])
        b = np.maximum(ids[ii[keep]], ids[jj[keep]])
        return pa.table({"a": pa.array(a), "b": pa.array(b), "cosine": pa.array(sim[ii, jj][keep])})

    return fn
