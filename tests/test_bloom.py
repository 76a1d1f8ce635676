"""Bloom-filter semi-join tests."""

import numpy as np
import pyarrow as pa
import ray

from geopolars_ray.stages.bloom import (
    BloomFilter,
    build_bloom,
    bloom_filter_probe,
    bloom_semi_join,
    _key_hash,
)


def test_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 2**62, 50_000).astype(np.uint64)
    bf = BloomFilter.for_capacity(len(keys), bits_per_key=10, k=7)
    bf.add(keys)
    assert bf.contains(keys).all()  # never a false negative
    other = rng.integers(0, 2**62, 50_000).astype(np.uint64)
    fresh = other[~np.isin(other, keys)]
    fpr = bf.contains(fresh).mean()
    assert fpr < 0.02, fpr  # theory ~0.008 at 10 bits/key


def test_build_bloom_distributed_equals_local(ray_session):
    k = np.arange(10_000, dtype=np.int64) * 3
    t = pa.table({"k": pa.array(k)})
    ds = ray.data.from_arrow(t).repartition(16)
    dist = build_bloom(ds, ["k"], n_keys_hint=10_000, fanin=4)
    local = BloomFilter(dist.m_bits, dist.k)
    local.add(_key_hash(t, ["k"]))
    assert np.array_equal(dist.bits, local.bits)


def test_bloom_probe_superset_and_semi_join_exact(ray_session):
    rng = np.random.default_rng(31)
    build_keys = np.unique(rng.integers(0, 1_000_000, 2_000)).astype(np.int64)
    probe_keys = rng.integers(0, 1_000_000, 40_000).astype(np.int64)
    probe = pa.table({"k": pa.array(probe_keys),
                      "v": pa.array(np.arange(len(probe_keys)))})
    build = pa.table({"k": pa.array(build_keys)})
    probe_ds = ray.data.from_arrow(probe).repartition(8)
    build_ds = ray.data.from_arrow(build).repartition(4)

    want = set(np.nonzero(np.isin(probe_keys, build_keys))[0].tolist())

    # bloom-only: superset, bounded blowup
    bloom = build_bloom(build_ds, ["k"])
    pref = bloom_filter_probe(probe_ds, bloom, ["k"]).take_all()
    got_pref = {r["v"] for r in pref}
    assert want <= got_pref
    assert len(got_pref) <= len(want) + 0.02 * len(probe_keys)

    # exact semi-join: identical to the true membership set
    out = bloom_semi_join(probe_ds, build_ds, ["k"], num_partitions=4).take_all()
    assert {r["v"] for r in out} == want
    assert all(set(r) == {"k", "v"} for r in out)


def test_bloom_semi_join_multi_column_key(ray_session):
    probe = pa.table({
        "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "b": pa.array(["x", "y", "x", "y", "x"]),
    })
    build = pa.table({
        "a": pa.array([1, 2], pa.int64()),
        "b": pa.array(["y", "x"]),
    })
    out = bloom_semi_join(
        ray.data.from_arrow(probe), ray.data.from_arrow(build),
        ["a", "b"], num_partitions=4,
    ).take_all()
    assert sorted((r["a"], r["b"]) for r in out) == [(1, "y"), (2, "x")]
