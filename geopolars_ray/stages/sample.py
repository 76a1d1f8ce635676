"""Sampling stages.

``Dataset.random_sample(frac, seed=...)`` covers seeded Bernoulli sampling,
but its accept/reject depends on Ray's internal block RNG stream — the result
changes with block layout, so it cannot be oracle-checked and a re-run with a
different partitioning samples different rows. ``deterministic_sample`` is
the reproducible alternative for keyed tables: accept/reject is a pure
function of the KEY (Knuth multiplicative hash, exact int64 arithmetic), so
the sample is stable under any repartitioning, restart, or engine — the same
predicate runs in SQL (``((key * 2654435761 + seed) % 4294967296) % m < n``).

At 100 TB this is also the property you want for resumable pipelines: a
re-run samples exactly the same rows without coordinating state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative-hash constant
MOD32 = 4294967296


def deterministic_sample(ds, key_col: str, numerator: int = 1, denominator: int = 10, seed: int = 0):
    """Keep rows where hash(key) mod ``denominator`` < ``numerator``.

    Exact int64 arithmetic throughout (no overflow for keys < ~3.4e9 since
    key*2654435761 + seed must stay under 2^63); vectorized per batch.
    """

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * KNUTH + seed) % MOD32
        return batch.filter(pa.array((h % denominator) < numerator))

    return ds.map_batches(fn, batch_format="pyarrow")
