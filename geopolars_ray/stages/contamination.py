"""Benchmark-contamination detection: token-n-gram overlap vs a probe set.

The standard decontamination stage of open-corpus pipelines (GPT-3 appx C,
FineWeb, Dolma): a training document is flagged when it shares >= threshold
word-n-grams (n~13) with any benchmark/probe text. Scale shape: the probe
set is tiny (benchmarks), so its n-gram hash set is built once on the
driver, deduplicated, sorted, and broadcast via ``ray.put``; the corpus
side is one stateless streaming ``map_batches`` doing a vectorized
``searchsorted`` membership per batch — no shuffle, no second pass.

Hashes are content-stable (polars xxhash of the token string, combined with
a base-31 polynomial over the n-token window in the 2^64 ring), so corpus
and probe sides agree regardless of batching.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_B = np.uint64(31)


def _token_hashes(texts_arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat stable token hashes uint64, tokens-per-text int64) for a string
    array; tokens are whitespace-split."""
    import polars as pl

    lists = pc.split_pattern_regex(
        pc.coalesce(pc.cast(texts_arr, pa.string()), ""), r"\s+"
    )
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return np.empty(0, np.uint64), counts
    h = (
        pl.from_arrow(pa.table({"t": flat}))
        .hash_rows(seed=0)
        .to_numpy()
        .astype(np.uint64)
    )
    return h, counts


def _ngram_hashes(tok_hashes: np.ndarray, counts: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling base-31 combine of every within-text n-token window.

    Returns (window hashes uint64, windows-per-text int64); texts shorter
    than ``n`` tokens contribute no windows.
    """
    total = int(counts.sum())
    n_windows = np.maximum(counts - (n - 1), 0)
    if total < n or n_windows.sum() == 0:
        return np.empty(0, np.uint64), n_windows
    with np.errstate(over="ignore"):
        acc = tok_hashes[: total - n + 1].copy()
        for j in range(1, n):
            acc *= _B
            acc += tok_hashes[j : total - n + 1 + j]
    # drop windows that cross a text boundary: a window starting at flat
    # position s is valid iff tokens s and s+n-1 belong to the same text
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = doc_idx[: total - n + 1] == doc_idx[n - 1 :]
    return acc[keep], n_windows


def probe_ngram_set(probe_texts, n: int = 13) -> np.ndarray:
    """Sorted unique n-gram hash set of the probe/benchmark texts — build
    once on the driver, ``ray.put`` the result."""
    th, counts = _token_hashes(pa.array(list(probe_texts), pa.string()))
    h, _ = _ngram_hashes(th, counts, n)
    return np.unique(h)


def ngram_contamination(
    docs_ds,
    probe_texts,
    n: int = 13,
    text_col: str = "text",
    threshold: int = 1,
):
    """Append ``n_contaminated_ngrams`` / ``contaminated`` per document.

    ``probe_texts``: iterable of benchmark strings (or a precomputed sorted
    hash set from :func:`probe_ngram_set`).
    """
    import ray

    probe = (
        probe_texts
        if isinstance(probe_texts, np.ndarray)
        else probe_ngram_set(probe_texts, n)
    )
    ref = ray.put(probe)

    def fn(batch: pa.Table) -> pa.Table:
        p = ray.get(ref)
        th, counts = _token_hashes(batch[text_col])
        h, n_windows = _ngram_hashes(th, counts, n)
        hits_flat = np.zeros(len(h), dtype=np.int64)
        if len(h) and len(p):
            idx = np.searchsorted(p, h)
            idx[idx == len(p)] = 0
            hits_flat = (p[idx] == h).astype(np.int64)
        # per-doc sums over the ragged window layout
        bounds = np.concatenate([[0], np.cumsum(n_windows)[:-1]])
        n_hits = np.zeros(len(batch), dtype=np.int64)
        nz = n_windows > 0
        if hits_flat.size:
            sums = np.add.reduceat(hits_flat, bounds[nz]) if nz.any() else []
            n_hits[nz] = sums
        batch = batch.append_column("n_contaminated_ngrams", pa.array(n_hits))
        return batch.append_column(
            "contaminated", pa.array(n_hits >= threshold)
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")
