"""sessionize: vectorized per-partition sessionization (no per-group Python).

Pins equality with a plain per-user reference fold on randomized data
(duplicate timestamps, single-event users, gap-boundary ties) across
multiple partitions and input block layouts.
"""

import numpy as np
import pyarrow as pa

from geopolars_ray.stages.window import sessionize

GAP = 1000


def _reference(uid, ts, gap):
    out = {}
    for u in np.unique(uid):
        t = np.sort(ts[uid == u])
        breaks = np.ones(len(t), dtype=bool)
        breaks[1:] = np.diff(t) > gap
        lens = np.diff(np.append(np.flatnonzero(breaks), len(t)))
        out[int(u)] = (len(lens), int(lens.max()))
    return out


def test_sessionize_matches_reference(ray_session):
    import ray

    rng = np.random.default_rng(11)
    n = 20_000
    uid = rng.integers(0, 900, n).astype(np.int64)
    ts = rng.integers(0, 200_000, n).astype(np.int64)  # plenty of exact ties
    want = _reference(uid, ts, GAP)

    ds = ray.data.from_arrow(
        pa.table({"user_id": uid, "ts": ts})
    ).repartition(7)
    got = sessionize(ds, "user_id", "ts", gap_us=GAP, num_partitions=5).take_all()
    assert len(got) == len(want)
    for r in got:
        assert (r["n_sessions"], r["max_session_events"]) == want[r["user_id"]], r


def test_sessionize_edge_cases(ray_session):
    import ray

    # single event user, all-one-session user, gap-exactly-equal (NOT a break:
    # the predicate is diff > gap), empty-partition schemas
    t = pa.table({
        "user_id": pa.array([1, 2, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array([5, 0, GAP, 2 * GAP, 0, GAP + 1], pa.int64()),
    })
    got = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
           for r in sessionize(ray.data.from_arrow(t), "user_id", "ts",
                               gap_us=GAP, num_partitions=4).take_all()}
    assert got == {1: (1, 1), 2: (1, 3), 3: (2, 1)}


def test_windowed_columns_vs_duckdb(ray_session):
    """row_number/lag/lead per key == the DuckDB window functions (unique
    order keys -> tie-free deterministic compare)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from geopolars_ray.stages.window import windowed_columns

    rng = np.random.default_rng(0)
    n = 20000
    tab = pa.table({
        "k": pa.array(rng.integers(0, 500, n)),
        "ts": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.normal(size=n)),
    })
    out = windowed_columns(
        ray.data.from_arrow(tab), ["k"], "ts", row_number="rn",
        lag=[("v", "v_lag"), ("v", "v_lag2", 2)], lead=[("v", "v_lead")],
        num_partitions=8,
    )
    df = out.to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    src = tab.to_pandas()
    exp = duckdb.connect().execute("""
        SELECT k, ts, v,
               row_number() OVER w - 1 AS rn,
               lag(v)     OVER w AS v_lag,
               lag(v, 2)  OVER w AS v_lag2,
               lead(v)    OVER w AS v_lead
        FROM src WINDOW w AS (PARTITION BY k ORDER BY ts) ORDER BY k, ts
    """).df()
    for c in ("rn", "v_lag", "v_lag2", "v_lead"):
        a, b = df[c], exp[c]
        assert bool(((a.isna() & b.isna()) | (a == b)).all()), c
    # descending: rn flips to the group-size-1-minus-ascending rank
    out_d = windowed_columns(ray.data.from_arrow(tab), ["k"], "ts",
                             row_number="rn_d", descending=True, num_partitions=8)
    dd = out_d.to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    sizes = df.groupby("k")["rn"].transform("max")
    assert (dd["rn_d"].to_numpy() == (sizes - df["rn"]).to_numpy()).all()

    import pytest as _p
    with _p.raises(ValueError, match="offset"):
        windowed_columns(ray.data.from_arrow(tab), ["k"], "ts", lag=[("v", "x", 0)])


def test_windowed_columns_null_keys_one_partition(ray_session):
    """NULL keys form ONE window partition (SQL semantics) — review
    finding: NaN != NaN made every null-key row its own run."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from geopolars_ray.stages.window import windowed_columns

    tab = pa.table({
        "k": pa.array([1.0, None, None, 2.0, None, 1.0], pa.float64()),
        "ts": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    out = windowed_columns(ray.data.from_arrow(tab), ["k"], "ts",
                           row_number="rn", lag=[("v", "v_lag")], num_partitions=4)
    df = out.to_pandas().sort_values("ts").reset_index(drop=True)
    src = tab.to_pandas()
    exp = duckdb.connect().execute("""
        SELECT ts, row_number() OVER w - 1 AS rn, lag(v) OVER w AS v_lag
        FROM src WINDOW w AS (PARTITION BY k ORDER BY ts) ORDER BY ts
    """).df()
    assert (df["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    a, b = df["v_lag"], exp["v_lag"]
    assert bool(((a.isna() & b.isna()) | (a == b)).all())


def test_windowed_columns_fuzz_vs_duckdb(ray_session):
    """Hypothesis fuzz: arbitrary key skew / group sizes / offsets still
    match DuckDB window functions exactly (unique order keys keep the
    compare tie-free)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray
    from hypothesis import given, settings, strategies as st

    from geopolars_ray.stages.window import windowed_columns

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(st.integers(0, 5), min_size=1, max_size=80),
        st.integers(1, 4),
        st.booleans(),
    )
    def run(keys, off, desc):
        n = len(keys)
        rng = np.random.default_rng(n)
        tab = pa.table({
            "k": pa.array(np.array(keys, dtype=np.int64)),
            "ts": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.normal(size=n)),
        })
        out = windowed_columns(ray.data.from_arrow(tab), ["k"], "ts", row_number="rn",
                               lag=[("v", "vl", off)], lead=[("v", "vf", off)],
                               descending=desc, num_partitions=3)
        df = out.to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
        src = tab.to_pandas()
        order = "DESC" if desc else "ASC"
        exp = duckdb.connect().execute(f"""
            SELECT k, ts, row_number() OVER w - 1 AS rn,
                   lag(v, {off}) OVER w AS vl, lead(v, {off}) OVER w AS vf
            FROM src WINDOW w AS (PARTITION BY k ORDER BY ts {order})
            ORDER BY k, ts ASC
        """).df()
        for c in ("rn", "vl", "vf"):
            a, b = df[c], exp[c]
            assert bool(((a.isna() & b.isna()) | (a == b)).all()), (c, keys, off, desc)

    run()


def test_windowed_rank_dense_cumsum_vs_duckdb(ray_session):
    """rank/dense_rank/cumsum == DuckDB RANK()/DENSE_RANK()/SUM() OVER —
    order keys deliberately contain ties so the rank families diverge."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from geopolars_ray.stages.window import windowed_columns

    rng = np.random.default_rng(1)
    n = 20000
    tab = pa.table({
        "k": pa.array(rng.integers(0, 300, n)),
        "ts": pa.array(rng.integers(0, 40, n)),  # heavy ties
        "v": pa.array(rng.normal(size=n), mask=rng.random(n) < 0.05),
    })
    out = windowed_columns(
        ray.data.from_arrow(tab), ["k"], "ts",
        row_number="rn", rank="r", dense_rank="dr", cumsum=[("v", "vsum")],
        num_partitions=8,
    )
    # ties make row order nondeterministic: compare rank cols on (k, ts)
    # pairs (constant within a tie group) and cumsum at tie-group BOUNDARIES
    df = out.to_pandas()
    src = tab.to_pandas()
    exp = duckdb.connect().execute("""
        SELECT k, ts,
               rank()       OVER w - 1 AS r,
               dense_rank() OVER w - 1 AS dr,
               sum(coalesce(v, 0))
                   OVER (PARTITION BY k ORDER BY ts
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS vsum_group
        FROM src WINDOW w AS (PARTITION BY k ORDER BY ts) ORDER BY k, ts
    """).df().drop_duplicates(["k", "ts"])
    got = df.drop_duplicates(["k", "ts"])[["k", "ts", "r", "dr"]]
    merged = got.merge(exp[["k", "ts", "r", "dr"]], on=["k", "ts"], suffixes=("", "_exp"))
    assert len(merged) == len(got)
    assert (merged["r"] == merged["r_exp"]).all()
    assert (merged["dr"] == merged["dr_exp"]).all()
    # cumsum at the LAST row of each tie group == RANGE-frame running sum
    last = (df.sort_values(["k", "ts", "rn"])
              .groupby(["k", "ts"], as_index=False).last())
    m2 = last.merge(exp[["k", "ts", "vsum_group"]], on=["k", "ts"])
    assert np.allclose(m2["vsum"], m2["vsum_group"], rtol=1e-9, atol=1e-9)
