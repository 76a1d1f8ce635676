"""Sequence packing (stages/pack.py): greedy vs a pure-Python reference,
chunked vs a DuckDB window-SQL replay, and the per-sequence invariants."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _docs(n=500, seed=0, max_tok=700):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_tokens": pa.array(rng.integers(1, max_tok, n).astype(np.int64)),
    })


def _greedy_reference(tok, budget):
    """Straight-line greedy packer (the spec, unvectorized).

    An oversize doc is ALONE in its sequence — the current sequence closes
    if it holds ANY doc, including zero-token docs (an acc>0 test would
    merge an oversize doc with preceding zero-token docs, violating the
    documented invariant; caught by the hypothesis fuzz)."""
    seq, s, acc, n_in_seq = [], 0, 0, 0
    for t in tok:
        if t > budget:
            if n_in_seq > 0:
                s += 1
            seq.append(s)
            s += 1
            acc = 0
            n_in_seq = 0
            continue
        if acc + t > budget:
            s += 1
            acc = 0
            n_in_seq = 0
        seq.append(s)
        acc += t
        n_in_seq += 1
    return np.array(seq, dtype=np.int64)


def test_pack_greedy_matches_reference_single_partition(ray_session):
    from geopolars_ray.stages.pack import pack_greedy

    tab = _docs(800, seed=1)
    out = pack_greedy(ray.data.from_arrow(tab), budget=2048, num_partitions=1)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    tok = tab["n_tokens"].to_numpy()
    expect = _greedy_reference(tok, 2048)
    # seq ids embed partition 0 -> local ids are the raw ids
    got = df["seq_id"].to_numpy() & ((1 << 40) - 1)
    np.testing.assert_array_equal(got, expect)
    assert not df["oversize"].any()


def test_pack_greedy_invariants_multi_partition(ray_session):
    from geopolars_ray.stages.pack import pack_greedy

    # include oversize docs
    tab = _docs(1000, seed=2, max_tok=3000)
    df = pack_greedy(ray.data.from_arrow(tab), budget=2048, num_partitions=8).to_pandas()
    assert len(df) == 1000
    g = df.groupby("seq_id")["n_tokens"].agg(["sum", "count"])
    over = df[df["oversize"]]
    # every oversize doc is alone in its sequence
    assert (g.loc[over["seq_id"], "count"] == 1).all()
    # every non-oversize sequence fits the budget
    normal = g.drop(index=over["seq_id"])
    assert (normal["sum"] <= 2048).all()
    # sequence membership is contiguous in doc_id order within a partition
    part = df["seq_id"].to_numpy() >> 40
    for p in np.unique(part):
        sub = df[part == p].sort_values("doc_id")
        s = sub["seq_id"].to_numpy()
        assert (np.diff(s) >= 0).all()  # non-decreasing = contiguous runs
        # greedy-maximality: the first doc of each new sequence would NOT
        # have fit into the previous sequence (unless prev holds an oversize)
        tok = sub["n_tokens"].to_numpy()
        starts = np.nonzero(np.diff(s) > 0)[0] + 1
        sums = pd.Series(tok).groupby(pd.Series(s)).sum()
        for i in starts:
            prev_sum = sums.loc[s[i - 1]]
            assert prev_sum + tok[i] > 2048 or tok[i - 1] > 2048 or tok[i] > 2048


def test_pack_chunked_matches_sql_window(ray_session):
    from geopolars_ray.stages.pack import pack_chunked

    tab = _docs(600, seed=3)
    budget = 1024
    df = (pack_chunked(ray.data.from_arrow(tab), budget=budget, num_partitions=4)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # replay per partition in SQL: same splitmix partition tag, then the
    # documented window cumsum arithmetic
    part = (df["seq_id"].to_numpy() >> 40).astype(np.int64)
    con = duckdb.connect()
    src = tab.to_pandas()
    src["part"] = part  # partition assignment verified implicitly: ids must match
    exp = con.execute(f"""
        SELECT doc_id,
               (sum(n_tokens) OVER w - n_tokens) // {budget} AS seq_local,
               (sum(n_tokens) OVER w - n_tokens) % {budget}  AS "offset"
        FROM src WINDOW w AS (PARTITION BY part ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        ORDER BY doc_id
    """).df()
    np.testing.assert_array_equal(df["seq_id"].to_numpy() & ((1 << 40) - 1),
                                  exp["seq_local"].to_numpy())
    np.testing.assert_array_equal(df["offset"].to_numpy(), exp["offset"].to_numpy())
    # conservation: last sequence index == ceil(total/budget) - 1 per partition
    for p in np.unique(part):
        tot = src.loc[src["part"] == p, "n_tokens"].sum()
        last = (df.loc[part == p, "seq_last"].to_numpy() & ((1 << 40) - 1)).max()
        assert last == max(0, -(-int(tot) // budget) - 1)


def test_pack_validation(ray_session):
    from geopolars_ray.stages.pack import pack_greedy

    with pytest.raises(ValueError, match="budget"):
        pack_greedy(ray.data.from_arrow(_docs(4)), budget=0)


def test_pack_greedy_fuzz_vs_reference(ray_session):
    """Hypothesis fuzz: greedy packing matches the straight-line reference
    for arbitrary token-count sequences (incl. zeros, oversize runs, budget
    edge hits) in a single partition."""
    from hypothesis import given, settings, strategies as st

    from geopolars_ray.stages.pack import pack_greedy

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(0, 300), min_size=1, max_size=120),
           st.integers(1, 400))
    def run(toks, budget):
        tab = pa.table({
            "doc_id": pa.array(np.arange(len(toks), dtype=np.int64)),
            "n_tokens": pa.array(np.array(toks, dtype=np.int64)),
        })
        df = (pack_greedy(ray.data.from_arrow(tab), budget=budget, num_partitions=1)
              .to_pandas().sort_values("doc_id"))
        got = df["seq_id"].to_numpy() & ((1 << 40) - 1)
        np.testing.assert_array_equal(got, _greedy_reference(np.array(toks), budget))

    run()
