"""HyperLogLog distinct-count sketch — cardinality without a shuffle.

Flajolet et al. 2007 (+ the standard small-range linear-counting and
large-range corrections). Scale shape mirrors the t-digest path
(`stages/quantile.py`): every block folds its values into one fixed
2^p-register row, rows tree-merge with elementwise ``max`` (associative,
commutative, idempotent — retry/ordering safe), and the driver folds the
final ≤fanin rows. Exchange volume is blocks × 2^p bytes regardless of
input size; at p=12 that is 4 KB/block for ~1.6% standard error.

Hashing is the same content-stable polars xxhash used by
``dedup.content_hash``, so estimates are layout- and batching-invariant.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash_columns(batch: pa.Table, cols: Sequence[str]) -> np.ndarray:
    import polars as pl

    return (
        pl.from_arrow(batch.select(list(cols)))
        .hash_rows(seed=0)
        .to_numpy()
        .astype(np.uint64)
    )


def _registers_from_hashes(h: np.ndarray, p: int) -> np.ndarray:
    """(2^p,) uint8 register vector: max leading-zero-rank per bucket."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining 64-p bits + 1 (capped by the
    # sentinel bit injected above so rank <= 64-p+1)
    # leading zeros via float64 exponent is exact for any nonzero uint64
    fl = rest.astype(np.float64)
    exp = ((fl.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF)).astype(np.int64)
    lz = 1086 - exp  # 1023 + 63 - exp
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    two64 = 2.0**64
    if est > two64 / 30.0:
        return -two64 * np.log1p(-est / two64)
    return float(est)


def approx_distinct(ds, cols: Sequence[str] | str, p: int = 12, fanin: int = 64) -> float:
    """Approximate COUNT(DISTINCT cols) in one streaming pass (~1.04/√2^p
    standard error; p=12 → ~1.6%)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    m = 1 << p

    def block_regs(batch: pa.Table) -> pa.Table:
        regs = _registers_from_hashes(_hash_columns(batch, cols), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m, dtype=np.uint8)
        for b in batch["regs"].to_pylist():
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    sk = ds.select_columns(cols).map_batches(block_regs, batch_format="pyarrow")
    n = sk.count()
    while n > fanin:
        sk = sk.map_batches(
            merge_batch, batch_format="pyarrow", batch_size=fanin
        ).materialize()
        n = sk.count()
    acc = np.zeros(m, dtype=np.uint8)
    for b in sk.iter_batches(batch_format="pyarrow", batch_size=fanin):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for rb in t["regs"].to_pylist():
            np.maximum(acc, np.frombuffer(rb, dtype=np.uint8), out=acc)
    return _estimate(acc)
