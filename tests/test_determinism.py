"""Parallelism-independence: identical results across partition counts and
block layouts (the determinism contract the scaling protocol verifies on the
flagship, pinned here at unit level for the aggregation/join cores)."""

import numpy as np
import pyarrow as pa


def _events(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 500, n)),
        "v": pa.array(rng.integers(0, 1000, n)),
    })


def test_hash_aggregate_partition_count_invariant(ray_session):
    import ray
    from geopolars_ray.stages.agg import hash_aggregate

    t = _events()
    results = []
    for p in (2, 7, 32):
        out = hash_aggregate(
            ray.data.from_arrow(t), ["k"],
            [("v", "sum", "s"), ("v", "count", "n"), ("v", "min", "lo")],
            num_partitions=p,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        results.append(out)
    for r in results[1:]:
        assert results[0].equals(r)


def test_hash_join_block_layout_invariant(ray_session):
    import ray
    from geopolars_ray.stages.hashjoin import hash_join

    t = _events(5000)
    r = pa.table({"k": pa.array(np.arange(0, 500, 3)), "w": pa.array(np.arange(0, 500, 3) * 10)})

    def run(left_blocks, parts):
        tabs = [t.slice(i * (5000 // left_blocks), 5000 // left_blocks) for i in range(left_blocks)]
        lds = ray.data.from_arrow_refs([ray.put(x) for x in tabs])
        out = hash_join(lds, ray.data.from_arrow(r), on=["k"], how="inner", num_partitions=parts)
        return sorted((row["k"], row["v"], row["w"]) for row in out.take_all())

    a = run(1, 4)
    b = run(10, 16)
    assert a == b and len(a) > 0
