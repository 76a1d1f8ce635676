"""Heavy hitters + stratified sampling tests."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from geopolars_ray.stages.freq import heavy_hitters, _mg_summarize
from geopolars_ray.stages.sample import (
    stratified_sample_frac,
    stratified_sample_n,
)


def test_mg_summarize_bound():
    rng = np.random.default_rng(5)
    counts = rng.integers(1, 1000, 500).astype(np.int64)
    idx, dec = _mg_summarize(counts, 50)
    assert len(idx) <= 50
    err = counts.sum() - dec.sum()
    # every survivor undercounts by the same decrement, <= err
    assert np.all(dec <= counts[idx])
    assert err > 0


def test_heavy_hitters_exact_when_capacity_ample(ray_session):
    vals = ["a"] * 500 + ["b"] * 300 + ["c"] * 150 + ["d"] * 50
    rng = np.random.default_rng(2)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    out = heavy_hitters(ds, ["v"], k=3, capacity=100, num_partitions=4).take_all()
    assert [(r["v"], r["count_lb"], r["count_ub"]) for r in out] == [
        ("a", 500, 500), ("b", 300, 300), ("c", 150, 150)
    ]


def test_heavy_hitters_zipf_bounds_hold(ray_session):
    rng = np.random.default_rng(9)
    v = rng.zipf(1.5, 60_000)
    v = v[v < 10_000]
    true = Counter(v.tolist())
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v.astype(np.int64))})).repartition(16)
    out = heavy_hitters(ds, ["v"], k=5, capacity=64, num_partitions=4).take_all()
    assert len(out) == 5
    true_top = [kv[0] for kv in true.most_common(3)]
    got_keys = [r["v"] for r in out]
    for t in true_top:  # the unambiguous heavy keys must surface
        assert t in got_keys
    for r in out:  # the interval is always sound
        assert r["count_lb"] <= true[r["v"]] <= r["count_ub"]


def test_stratified_frac_deterministic_and_balanced(ray_session):
    n = 30_000
    key = np.arange(n, dtype=np.int64)
    lang = np.where(key % 10 < 8, "en", np.where(key % 10 == 8, "fr", "sw"))
    t = pa.table({"id": pa.array(key), "lang": pa.array(lang)})
    ds = ray.data.from_arrow(t).repartition(8)
    fracs = {"en": 0.1, "fr": 1.0, "sw": 1.0}
    out = stratified_sample_frac(ds, "id", "lang", fracs, seed=4).take_all()
    by_lang = Counter(r["lang"] for r in out)
    assert by_lang["fr"] == 3000 and by_lang["sw"] == 3000
    assert 0.08 * 24000 < by_lang["en"] < 0.12 * 24000
    # deterministic: identical rows on a different layout
    out2 = stratified_sample_frac(
        ray.data.from_arrow(t).repartition(3), "id", "lang", fracs, seed=4
    ).take_all()
    assert sorted(r["id"] for r in out) == sorted(r["id"] for r in out2)


def test_stratified_n_exact_counts_and_layout_invariance(ray_session):
    n = 5_000
    key = np.arange(n, dtype=np.int64)
    s = (key % 7).astype(np.int64)
    t = pa.table({"id": pa.array(key), "s": pa.array(s), "payload": pa.array(key * 2)})
    a = stratified_sample_n(
        ray.data.from_arrow(t).repartition(9), "id", "s", 25, seed=1, num_partitions=4
    ).take_all()
    by = Counter(r["s"] for r in a)
    assert all(v == 25 for v in by.values()) and len(by) == 7
    b = stratified_sample_n(
        ray.data.from_arrow(t).repartition(2), "id", "s", 25, seed=1, num_partitions=8
    ).take_all()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    # small strata survive whole
    tiny = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                     "s": pa.array([0, 0, 1], pa.int64())})
    c = stratified_sample_n(ray.data.from_arrow(tiny), "id", "s", 10).take_all()
    assert len(c) == 3


def test_weighted_sample_n_properties(ray_session):
    from geopolars_ray.stages.sample import weighted_sample_n

    rng = np.random.default_rng(6)
    n_rows = 30_000
    keys = np.arange(n_rows, dtype=np.int64)
    # two weight classes: heavy rows 100x more likely
    heavy = keys % 100 == 0
    w = np.where(heavy, 100.0, 1.0)
    t = pa.table({"k": keys, "w": w})
    ds = ray.data.from_arrow(t).repartition(6)
    got = weighted_sample_n(ds, "k", "w", n=300, seed=1).take_all()
    assert len(got) == 300
    ks = {r["k"] for r in got}
    assert len(ks) == 300  # without replacement
    # expected heavy share: 300 heavy rows carry 100x weight ->
    # total weight 30000 heavy vs 29700 light, so ~ half the sample is heavy
    n_heavy = sum(1 for k in ks if k % 100 == 0)
    assert 90 < n_heavy < 240, n_heavy
    # layout invariance: different partitioning, identical sample
    got2 = weighted_sample_n(ray.data.from_arrow(t).repartition(17), "k", "w",
                             n=300, seed=1).take_all()
    assert ks == {r["k"] for r in got2}
    # seed changes the draw
    got3 = weighted_sample_n(ds, "k", "w", n=300, seed=2).take_all()
    assert ks != {r["k"] for r in got3}
    # zero/negative weights never selected
    w2 = np.where(keys < 29_000, 0.0, 1.0)
    t2 = pa.table({"k": keys, "w": w2})
    got4 = weighted_sample_n(ray.data.from_arrow(t2), "k", "w", n=500).take_all()
    assert all(r["k"] >= 29_000 for r in got4) and len(got4) == 500


def test_weighted_sample_seed_zero_differs_from_one(ray_session):
    # review r4-2: the `or 1` guard made seed=0 alias seed=1
    from geopolars_ray.stages.sample import weighted_sample_n

    t = pa.table({"k": np.arange(5000, dtype=np.int64),
                  "w": np.ones(5000)})
    ds = ray.data.from_arrow(t)
    s0 = {r["k"] for r in weighted_sample_n(ds, "k", "w", n=100, seed=0).take_all()}
    s1 = {r["k"] for r in weighted_sample_n(ds, "k", "w", n=100, seed=1).take_all()}
    assert s0 != s1
