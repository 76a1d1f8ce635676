"""Sampling stages.

``Dataset.random_sample(frac, seed=...)`` covers seeded Bernoulli sampling,
but its accept/reject depends on Ray's internal block RNG stream — the result
changes with block layout, so it cannot be oracle-checked and a re-run with a
different partitioning samples different rows. ``deterministic_sample`` is
the reproducible alternative for keyed tables: accept/reject is a pure
function of the KEY (Knuth multiplicative hash in the uint64 ring), so the
sample is stable under any repartitioning, restart, or engine — the same
predicate runs in SQL. For keys in [0, ~3.4e9] the hash never wraps and the
plain-int64 form ``((key * 2654435761 + seed) % 4294967296) % m < n``
matches; for the full int64 domain the exact replay is HUGEINT arithmetic:
``(((CASE WHEN k < 0 THEN k + 18446744073709551616 ELSE k END)
* 2654435761 + seed) % 18446744073709551616) % 4294967296 % m < n``
(negative keys map by two's complement, products reduce mod 2^64 exactly
like the uint64 multiply below).

At 100 TB this is also the property you want for resumable pipelines: a
re-run samples exactly the same rows without coordinating state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative-hash constant
MOD32 = 4294967296


def _knuth_hash32(col: pa.ChunkedArray, seed: int) -> np.ndarray:
    """hash(key) in [0, 2^32) as uint64, exact for the FULL int64 key domain.

    All arithmetic stays in the uint64 ring (np.uint64 constants — a bare
    Python int would promote uint64 ops through float64 on NumPy<2 and
    silently lose low bits). Negative keys map by two's complement
    (``view(np.uint64)``), the multiply wraps mod 2^64 — both replayable in
    SQL with HUGEINT (module docstring has the exact form).

    CAVEAT: the final mod 2^32 makes this hash BLIND to any key bit >= 32
    whenever the low 32 bits are constant across keys (k = hi*2^33 + c
    gives hi*KNUTH*2^33 ≡ 0 mod 2^32).  Coarse H3 ids are exactly that
    shape (shared low filler bits) — use :func:`spatial_split` /
    splitmix64 for cell-id keys, and keep this hash for row-id keys where
    the SQL replay matters.
    """
    k = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    # map the seed into the ring explicitly: np.uint64(-7) raises on NumPy>=2
    seed_u = np.uint64(int(seed) & 0xFFFFFFFFFFFFFFFF)
    return (k * np.uint64(KNUTH) + seed_u) % np.uint64(MOD32)


def deterministic_sample(ds, key_col: str, numerator: int = 1, denominator: int = 10, seed: int = 0):
    """Keep rows where hash(key) mod ``denominator`` < ``numerator``.

    Computed in the uint64 ring (wraparound is well-defined and
    SQL-replayable via HUGEINT mod 2^64 — see module docstring), so keys
    anywhere in the int64 domain hash exactly; vectorized per batch.
    """

    def fn(batch: pa.Table) -> pa.Table:
        h = _knuth_hash32(batch[key_col], seed)
        return batch.filter(pa.array((h % np.uint64(denominator)) < np.uint64(numerator)))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample_frac(ds, key_col: str, strata_col: str, fracs, seed: int = 0,
                           default_frac: float = 0.0):
    """Per-stratum Bernoulli sampling with DETERMINISTIC accept/reject.

    ``fracs``: {stratum value -> sampling fraction} (or a single float for
    all strata). Accept iff hash(key) / 2^32 < frac(stratum) — a pure
    function of (key, stratum), so the sample is layout/restart-invariant
    like :func:`deterministic_sample`, and NO shuffle happens: the filter
    streams. The fracs dict rides the task closure (broadcast once per
    worker, not per batch — it is a plain small dict).

    The standard corpus-balancing move (e.g. downsample en to 10%, keep rare
    languages at 100%) expressed as one stateless stage.
    """
    if not isinstance(fracs, dict):
        fracs = None if fracs is None else float(fracs)

    def fn(batch: pa.Table) -> pa.Table:
        h = _knuth_hash32(batch[key_col], seed).astype(np.float64) / MOD32
        if isinstance(fracs, dict):
            strata = batch[strata_col].to_pylist()
            thr = np.fromiter(
                (fracs.get(s, default_frac) for s in strata), np.float64, len(strata)
            )
        else:
            thr = fracs
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample_n(ds, key_col: str, weight_col: str, n: int,
                      seed: int = 0, batch_size: int = 65536):
    """Weighted sampling WITHOUT replacement: ``n`` rows, inclusion odds
    proportional to ``weight_col`` — the Efraimidis–Spirakis A-ES scheme
    (key = u^(1/w), keep the top n), with the uniform u derived from
    hash(key) instead of an RNG, so the draw is a pure function of table
    contents: layout-, restart- and engine-invariant like
    :func:`deterministic_sample`.

    Scale shape: per-batch partial top-n (one vectorized score + argpartition
    per batch, emitting ≤n rows), then one driver-side merge of the ≤n-row
    partials via ``sort().limit()`` — never a global sort of the data, and
    the exchange carries at most blocks×n candidate rows. Non-positive
    weights never win (score −inf → dropped up front).
    """
    import pyarrow.compute as pc

    def partial_topn(batch: pa.Table) -> pa.Table:
        from geopolars_ray.stages.agg import _splitmix

        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # rank-based sampling needs a MIXING hash: the additive-seed Knuth
        # form shifts every key's u by the same constant, which preserves
        # ranks — the seed would barely change the draw. splitmix64 of
        # (key ^ mixed seed) decorrelates fully.
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            sseed = _splitmix(np.uint64(int(seed) & 0xFFFFFFFFFFFFFFFF))
            h = _splitmix(k ^ sseed)
        # u in (0, 1): top-11-bit mantissa fill keeps it off both endpoints
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        with np.errstate(divide="ignore", invalid="ignore"):
            # rank by u^(1/w) desc == ln(u)/w desc (monotone; avoids pow)
            score = np.where(w > 0, np.log(u) / w, -np.inf)
        keep = np.flatnonzero(score > -np.inf)
        if len(keep) > n:
            keep = keep[np.argpartition(-score[keep], n - 1)[:n]]
        out = batch.take(pa.array(keep.astype(np.int64)))
        return out.append_column("_ws_score", pa.array(score[keep]))

    partials = ds.map_batches(partial_topn, batch_format="pyarrow", batch_size=batch_size)
    top = partials.sort(["_ws_score", key_col], descending=[True, False]).limit(n)
    return top.map_batches(lambda b: b.drop_columns(["_ws_score"]), batch_format="pyarrow")


def stratified_sample_n(ds, key_col: str, strata_col: str, n_per_stratum: int,
                        seed: int = 0, num_partitions: int = 32):
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen deterministically.

    Rows of each stratum are ranked by hash(key) (ties by key) and the first
    n survive — equivalent to a seeded uniform draw without replacement, but
    a pure function of the table contents. One hash co-partition exchange
    (``hash_partitioned_map`` keyed on the stratum), then a vectorized
    argsort + per-group take inside each partition; no per-key Python loop.
    """
    from geopolars_ray.stages.agg import hash_partitioned_map
    import pyarrow.compute as pc

    def per_partition(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return part
        h = _knuth_hash32(part[key_col], seed)
        part = part.append_column("_h", pa.array(h.astype(np.int64)))
        order = pc.sort_indices(
            part, sort_keys=[(strata_col, "ascending"), ("_h", "ascending"),
                             (key_col, "ascending")]
        )
        t = part.take(order)
        from geopolars_ray.stages.agg import rank_within_runs

        rank = rank_within_runs(t, [strata_col])
        return t.filter(pa.array(rank < n_per_stratum)).drop_columns(["_h"])

    return hash_partitioned_map(ds, [strata_col], per_partition, num_partitions)


def spatial_split(ds, cell_col: str, test_frac: float = 0.2, seed: int = 0,
                  fold_col: str = "fold", n_folds: int | None = None):
    """Leakage-safe spatial split: assign every row a fold by hashing its
    CELL id (H3/S2/grid tile), so all rows of a cell — and therefore all
    spatially co-located records — land in the same fold.  This is the
    standard guard against spatial autocorrelation leaking between train
    and test (spatial cross-validation / block CV).

    Two modes:
    - ``n_folds=None`` (default): binary split; ``fold`` is 0 (train) or 1
      (test) with P(test) = ``test_frac`` over cells.
    - ``n_folds=k``: k-fold assignment; ``fold`` in [0, k) uniform over
      cells (use for block k-fold CV); ``test_frac`` is ignored.

    Deterministic (same cells -> same folds for a given seed), stateless,
    and shuffle-free: one hash per row inside ``map_batches``.

    Hash note: cell ids vary in their HIGH bits (coarse H3 ids share all
    their low filler bits), which the SQL-replayable ``_knuth_hash32``
    (mod 2^32) is blind to — it collapses to a constant on res<=5 H3
    columns.  This op therefore uses splitmix64 (full 64-bit avalanche,
    `stages/agg.py _splitmix`), trading SQL replayability for uniformity.
    """
    if n_folds is None and not 0.0 < test_frac < 1.0:
        raise ValueError("test_frac must be in (0, 1)")
    if n_folds is not None and n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    from geopolars_ray.stages.agg import _splitmix

    seed_u = _splitmix(np.atleast_1d(np.uint64(int(seed) & 0xFFFFFFFFFFFFFFFF)))[0]

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        h = _splitmix(k ^ seed_u)
        if n_folds is not None:
            fold = (h % np.uint64(n_folds)).astype(np.int64)
        else:
            fold = (h < np.uint64(int(test_frac * 2.0 ** 64))).astype(np.int64)
        return batch.append_column(fold_col, pa.array(fold))

    return ds.map_batches(fn, batch_format="pyarrow")
