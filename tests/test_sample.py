"""Tests: spatial (cell-coherent) train/test split."""

import numpy as np
import pyarrow as pa


def test_spatial_split_cell_coherent(ray_session):
    import ray
    from geopolars_ray.geom import h3
    from geopolars_ray.stages.sample import spatial_split

    rng = np.random.default_rng(41)
    n = 30000
    lat = rng.uniform(-60, 60, n)
    lng = rng.uniform(-170, 170, n)
    cells = h3.latlng_to_cell(lat, lng, 2).view(np.int64)   # ~5.8k cells: ~5 rows/cell
    t = pa.table({"h3": pa.array(cells), "v": pa.array(rng.uniform(0, 1, n))})
    out = spatial_split(ray.data.from_arrow(t).repartition(4), "h3",
                        test_frac=0.25, seed=7).to_pandas()
    # every cell maps to exactly one fold (no leakage)
    per_cell = out.groupby("h3")["fold"].nunique()
    assert (per_cell == 1).all()
    # the CELL-level test fraction is ~25%
    cell_fold = out.groupby("h3")["fold"].first()
    frac = cell_fold.mean()
    assert 0.18 < frac < 0.32
    # deterministic across invocations
    again = spatial_split(ray.data.from_arrow(t), "h3", test_frac=0.25, seed=7).to_pandas()
    a = out.sort_values(["h3", "v"]).reset_index(drop=True)
    b = again.sort_values(["h3", "v"]).reset_index(drop=True)
    assert (a["fold"].values == b["fold"].values).all()
    # k-fold mode: folds uniform-ish over cells, still cell-coherent
    kf = spatial_split(ray.data.from_arrow(t), "h3", n_folds=5, seed=7).to_pandas()
    assert (kf.groupby("h3")["fold"].nunique() == 1).all()
    counts = kf.groupby("h3")["fold"].first().value_counts(normalize=True)
    assert len(counts) == 5 and counts.min() > 0.1
    import pytest as _pt
    with _pt.raises(ValueError, match="test_frac"):
        spatial_split(ray.data.from_arrow(t), "h3", test_frac=1.5)
    with _pt.raises(ValueError, match="n_folds"):
        spatial_split(ray.data.from_arrow(t), "h3", n_folds=1)
