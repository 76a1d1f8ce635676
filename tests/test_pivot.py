"""Distributed pivot tests (stages/pivot.py)."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.stages.pivot import pivot


def _tbl(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "nation": pa.array(rng.integers(0, 25, n)),
        "status": pa.array(np.array(["A", "B", "C"])[rng.integers(0, 3, n)]),
        "amt": pa.array(rng.uniform(0, 100, n)),
    })


def test_pivot_matches_pandas(ray_session):
    import ray

    t = _tbl()
    out = (
        pivot(ray.data.from_arrow(t).repartition(4), "nation", "status", "amt",
              "sum", num_partitions=4)
        .to_pandas().sort_values("nation").reset_index(drop=True)
    )
    ref = t.to_pandas().pivot_table(
        index="nation", columns="status", values="amt", aggfunc="sum"
    )
    assert len(out) == len(ref)
    for s in "ABC":
        np.testing.assert_allclose(
            out[f"status_{s}"], ref[s].to_numpy(), rtol=1e-9
        )


def test_pivot_missing_cells_null_and_multi_index(ray_session):
    import ray

    t = pa.table({
        "a": pa.array([1, 1, 2], pa.int64()),
        "b": pa.array(["x", "x", "y"]),
        "c": pa.array(["p", "q", "p"]),
        "v": pa.array([1.0, 2.0, 3.0]),
    })
    out = {
        (r["a"], r["b"]): r
        for r in pivot(ray.data.from_arrow(t), ["a", "b"], "c", "v",
                       "sum", num_partitions=2).take_all()
    }
    assert out[(1, "x")]["c_p"] == 1.0 and out[(1, "x")]["c_q"] == 2.0
    assert out[(2, "y")]["c_p"] == 3.0 and out[(2, "y")]["c_q"] is None


def test_pivot_rejects_wide_column(ray_session):
    import ray

    t = pa.table({
        "i": pa.array(np.arange(100)),
        "c": pa.array([f"v{j}" for j in range(100)]),
        "v": pa.array(np.ones(100)),
    })
    with pytest.raises(ValueError, match="max_columns"):
        pivot(ray.data.from_arrow(t), "i", "c", "v", num_partitions=2,
              max_columns=10)


def test_melt_roundtrips_pivot(ray_session):
    import ray

    t = _tbl(1000)
    wide = pivot(ray.data.from_arrow(t), "nation", "status", "amt", "sum",
                 num_partitions=4).materialize()
    from geopolars_ray.stages.pivot import melt

    long = melt(wide, ["nation"], [f"status_{s}" for s in "ABC"]).take_all()
    # every (nation, status) sum appears exactly once
    ref = t.to_pandas().groupby(["nation", "status"])["amt"].sum()
    got = {
        (r["nation"], r["variable"].removeprefix("status_")): r["value"]
        for r in long if r["value"] is not None
    }
    assert len(got) == len(ref)
    for (nation, s), v in ref.items():
        assert abs(got[(nation, s)] - v) < 1e-9
