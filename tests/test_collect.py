"""Grouped ST_Collect (`geom/kernels.py collect`, `stages/geo.py collect_by`)
— the inverse of explode. Reference has explode (`geoseries.rs:49-50`) but no
collect; this is beyond-reference GeoPandas/PostGIS-parity surface."""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom import GeometryArray
from geopolars_ray.geom import kernels as K


def test_collect_kernel_points_lines_polys():
    ga = GeometryArray.from_pylist(
        [
            ("point", (0.0, 0.0)),
            ("point", (1.0, 1.0)),
            ("multipoint", [(2.0, 2.0), (3.0, 3.0)]),  # parts flatten in
            ("linestring", [(0.0, 0.0), (1.0, 0.0)]),
            ("linestring", [(5.0, 5.0), (5.0, 7.0)]),
            ("polygon", [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]]),
        ]
    )
    out = K.collect(ga, np.array([0, 3, 5]))
    lst = out.to_pylist()
    assert lst[0] == ("multipoint", [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0)])
    assert lst[1] == ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)], [(5.0, 5.0), (5.0, 7.0)]])
    assert lst[2] == ("multipolygon", [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]]])


def test_collect_explode_roundtrip():
    multis = [
        (
            "multipolygon",
            [
                [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]],
                [[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]],
            ],
        ),
        ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)], [(5.0, 5.0), (5.0, 7.0)]]),
        ("multipoint", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]),
    ]
    ga = GeometryArray.from_pylist(multis)
    exploded, parent = K.explode(ga)
    starts = np.flatnonzero(np.diff(parent, prepend=parent[0] - 1))
    back = K.collect(exploded, starts)
    assert back.to_pylist() == multis


def test_collect_missing_and_mixed():
    ga = GeometryArray.from_pylist(
        [None, None, ("point", (1.0, 1.0)), None]
    )
    out = K.collect(ga, np.array([0, 2]))
    lst = out.to_pylist()
    assert lst[0] is None  # all-missing group collapses to missing
    assert lst[1] == ("multipoint", [(1.0, 1.0)])  # missing rows drop out

    mixed = GeometryArray.from_pylist(
        [("point", (0.0, 0.0)), ("linestring", [(0.0, 0.0), (1.0, 0.0)])]
    )
    with pytest.raises(ValueError, match="mixes"):
        K.collect(mixed, np.array([0]))
    # same rows in separate groups are fine
    ok = K.collect(mixed, np.array([0, 1]))
    assert ok.to_pylist()[0][0] == "multipoint"
    assert ok.to_pylist()[1][0] == "multilinestring"


def test_collect_by_distributed(ray_session):
    import ray.data

    from geopolars_ray.geom import encode_wkb
    from geopolars_ray.stages.geo import collect_by

    rng = np.random.default_rng(7)
    n = 4000
    keys = rng.integers(0, 97, n)
    pts = [("point", (float(x), float(y))) for x, y in rng.uniform(0, 10, (n, 2))]
    ga = GeometryArray.from_pylist(pts)
    t = pa.table({"k": keys, "geometry": encode_wkb(ga)})
    ds = ray.data.from_arrow(t).repartition(8)
    out = collect_by(ds, "k", num_partitions=8).take_all()
    assert len(out) == 97
    got = {r["k"]: r for r in out}
    from geopolars_ray.geom import decode_wkb

    for k in (0, 42, 96):
        exp = sorted((float(x), float(y)) for (kk, (_, (x, y))) in zip(keys, pts) if kk == k)
        row = got[k]
        assert row["n_parts"] == len(exp)
        g = decode_wkb(pa.chunked_array([pa.array([row["geometry"]], pa.large_binary())]))
        typ, coords = g.to_pylist()[0]
        assert typ == "multipoint"
        assert sorted(coords) == exp


def test_collect_by_null_key_raises(ray_session):
    import ray.data

    from geopolars_ray.geom import encode_wkb
    from geopolars_ray.stages.geo import collect_by

    ga = GeometryArray.from_pylist([("point", (0.0, 0.0)), ("point", (1.0, 1.0))])
    t = pa.table({"k": pa.array([1, None], pa.int64()), "geometry": encode_wkb(ga)})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="null"):
        collect_by(ds, "k", num_partitions=2).take_all()
