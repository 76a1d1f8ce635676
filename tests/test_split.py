"""ST_Split (geom/split.py): line-by-point / line-by-line /
polygon-by-line goldens, area conservation of polygon pieces, hole
handling, miss semantics, randomized chord splits, and the Ray path.
"""

import numpy as np
import pyarrow as pa
import pytest

from geopolars_ray.geom.split import split_pair


def area(rings):
    s = 0.0
    for r in rings:
        for i in range(len(r) - 1):
            s += r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
    return s / 2.0


def test_line_by_point():
    line = ("linestring", [(0.0, 0.0), (10.0, 0.0)])
    assert split_pair(line, ("point", (4.0, 0.0))) == \
        ("multilinestring", [[(0.0, 0.0), (4.0, 0.0)], [(4.0, 0.0), (10.0, 0.0)]])
    # off the line: unchanged (as a multi)
    assert split_pair(line, ("point", (4.0, 1.0))) == \
        ("multilinestring", [[(0.0, 0.0), (10.0, 0.0)]])
    # at an interior vertex
    assert split_pair(("linestring", [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0)]),
                      ("point", (5.0, 0.0))) == \
        ("multilinestring", [[(0.0, 0.0), (5.0, 0.0)], [(5.0, 0.0), (10.0, 0.0)]])
    # multipoint blade, ordered cuts
    out = split_pair(line, ("multipoint", [(7.0, 0.0), (2.0, 0.0)]))
    assert out == ("multilinestring", [[(0.0, 0.0), (2.0, 0.0)],
                                       [(2.0, 0.0), (7.0, 0.0)],
                                       [(7.0, 0.0), (10.0, 0.0)]])


def test_line_by_line():
    line = ("linestring", [(0.0, 0.0), (10.0, 0.0)])
    out = split_pair(line, ("linestring", [(3.0, -1.0), (3.0, 1.0),
                                           (7.0, 1.0), (7.0, -1.0)]))
    assert len(out[1]) == 3
    assert sorted(p[0] for p in out[1]) == [(0.0, 0.0), (3.0, 0.0), (7.0, 0.0)]
    # non-crossing blade: single part, interior vertices kept
    bent = ("linestring", [(0.0, 0.0), (5.0, 1.0), (10.0, 0.0)])
    out = split_pair(bent, ("linestring", [(0.0, 5.0), (1.0, 5.0)]))
    assert out == ("multilinestring", [[(0.0, 0.0), (5.0, 1.0), (10.0, 0.0)]])


def test_polygon_by_line():
    sq = ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]])
    out = split_pair(sq, ("linestring", [(2.0, -1.0), (2.0, 5.0)]))
    assert out[0] == "multipolygon" and len(out[1]) == 2
    assert sorted(round(area(p), 9) for p in out[1]) == [8.0, 8.0]
    # through a hole: two C-shaped pieces of area 6 each
    ann = ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                       [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)]])
    out = split_pair(ann, ("linestring", [(2.0, -1.0), (2.0, 5.0)]))
    assert len(out[1]) == 2
    assert sorted(round(area(p), 9) for p in out[1]) == [6.0, 6.0]
    # miss: whole polygon back as the single part
    out = split_pair(sq, ("linestring", [(10.0, 10.0), (12.0, 12.0)]))
    assert len(out[1]) == 1 and abs(area(out[1][0]) - 16.0) < 1e-9


def test_polygon_random_chords_conserve_area():
    rng = np.random.default_rng(3)
    for trial in range(6):
        k = 10
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(2, 5, k)
        pts = [(float(ri * np.cos(a)), float(ri * np.sin(a)))
               for ri, a in zip(r, ang)]
        poly = ("polygon", [pts + [pts[0]]])
        a0 = area(poly[1])
        th = rng.uniform(0, np.pi)
        blade = ("linestring", [(-8 * np.cos(th), -8 * np.sin(th)),
                                (8 * np.cos(th), 8 * np.sin(th))])
        out = split_pair(poly, blade)
        tot = sum(area(p) for p in out[1])
        assert abs(tot - a0) < 1e-9, (trial, tot, a0)
        assert len(out[1]) >= 2  # a through-origin chord always cuts


def test_type_errors_and_nulls():
    with pytest.raises(TypeError, match="split"):
        split_pair(("point", (0.0, 0.0)), ("linestring", [(0.0, 0.0), (1.0, 1.0)]))
    with pytest.raises(TypeError, match="line blades"):
        split_pair(("polygon", [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)]]),
                   ("point", (0.5, 0.5)))
    assert split_pair(None, ("point", (0.0, 0.0))) is None
    assert split_pair(("linestring", [(0.0, 0.0), (1.0, 0.0)]), None) == \
        ("multilinestring", [[(0.0, 0.0), (1.0, 0.0)]])


def test_split_api(ray_session):
    import ray

    from geopolars_ray.api import GeoDataset
    from geopolars_ray.geom import GeometryArray, decode_wkb, encode_wkb

    sq = ("polygon", [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]])
    t = pa.table({
        "geometry": encode_wkb(GeometryArray.from_pylist([sq])),
        "blade": encode_wkb(GeometryArray.from_pylist(
            [("linestring", [(0.0, -1.0), (4.0, 5.0)])])),
    })
    out = pa.concat_tables(ray.get(
        GeoDataset(ray.data.from_arrow(t)).split("blade").area("a")
        .dataset.to_arrow_refs()))
    g = decode_wkb(out["geometry"]).to_pylist()[0]
    assert g[0] == "multipolygon" and len(g[1]) == 2
    assert abs(out["a"].to_pylist()[0] - 16.0) < 1e-9  # pieces conserve area
