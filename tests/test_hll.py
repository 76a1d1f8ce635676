"""HyperLogLog distinct-count sketch tests (stages/hll.py)."""

import numpy as np
import pyarrow as pa

from geopolars_ray.stages.hll import (
    _estimate,
    _registers_from_hashes,
    approx_distinct,
)


def test_register_fold_is_order_invariant():
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2**63, 10_000).astype(np.uint64)
    a = _registers_from_hashes(h, 12)
    # two halves folded separately then max-merged == one pass
    b = np.maximum(
        _registers_from_hashes(h[:5000], 12), _registers_from_hashes(h[5000:], 12)
    )
    assert np.array_equal(a, b)


def test_estimate_error_bounds(ray_session):
    import ray

    rng = np.random.default_rng(5)
    for true_n, tol in ((100, 0.05), (10_000, 0.05), (300_000, 0.05)):
        vals = rng.integers(0, true_n, 4 * true_n)
        exact = len(np.unique(vals))
        est = approx_distinct(
            ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4),
            "v",
            p=12,
        )
        assert abs(est - exact) / exact < tol, (true_n, est, exact)


def test_layout_invariance(ray_session):
    import ray

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 5000, 50_000)
    t = pa.table({"v": pa.array(vals)})
    a = approx_distinct(ray.data.from_arrow(t).repartition(2), "v", p=11)
    b = approx_distinct(ray.data.from_arrow(t).repartition(13), "v", p=11)
    assert a == b  # register max-merge is associative/commutative/idempotent


def test_multi_column_keys(ray_session):
    import ray

    t = pa.table({
        "a": pa.array([1, 1, 2, 2] * 100),
        "b": pa.array(["x", "y", "x", "y"] * 100),
    })
    est = approx_distinct(ray.data.from_arrow(t), ["a", "b"], p=12)
    assert abs(est - 4) < 0.5


def test_grouped_distinct_matches_exact_within_tolerance(ray_session):
    import pandas as pd
    import ray

    from geopolars_ray.stages.hll import approx_distinct_grouped

    rng = np.random.default_rng(2)
    n = 200_000
    key = rng.integers(0, 5, n)
    val = rng.integers(0, (key + 1) * 2000)
    t = pa.table({"k": pa.array(key), "v": pa.array(val)})
    out = {
        r["k"]: r["approx_distinct"]
        for r in approx_distinct_grouped(
            ray.data.from_arrow(t).repartition(6), "k", "v", p=11,
            num_partitions=4,
        ).take_all()
    }
    exact = pd.DataFrame({"k": key, "v": val}).groupby("k")["v"].nunique()
    assert set(out) == set(exact.index)
    for k, e in exact.items():
        assert abs(out[k] - e) / e < 0.08, (k, out[k], e)
