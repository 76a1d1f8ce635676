"""Windowed aggregation over event-time columns.

Beyond-reference operators for event tables (the reference has no temporal
ops; SURVEY.md §2.7 notes it is strictly batch). Tumbling windows are plain
bucket arithmetic + ``hash_aggregate`` (see ``q_rel_user_hours``); this
module adds SLIDING windows: each event replicates to the
``window/slide`` overlapping windows that contain it (a small constant
fan-out, vectorized per batch), then one combiner-first aggregation on
``(keys..., window_start)``. The replication happens before the combiner,
so a hot key still ships at most ``window/slide`` partial rows per block.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def sliding_window_aggregate(
    ds,
    ts_col: str,
    window_us: int,
    slide_us: int,
    keys: Sequence[str],
    spec,
    num_partitions: int = 16,
    window_col: str = "window_start",
):
    """Aggregate per (keys..., sliding window of ``window_us`` every
    ``slide_us``). ``window_us`` must be a multiple of ``slide_us``.

    ``window_col`` holds the window's start as the integer slide index
    (``start_us = window_col * slide_us``) — exact integer arithmetic, so
    results are bit-comparable to a SQL UNION-ALL-of-shifted-buckets oracle.
    """
    from geopolars_ray.stages.agg import hash_aggregate

    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    fanout = window_us // slide_us

    def assign(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = us // slide_us
        n = len(batch)
        rows = np.tile(np.arange(n, dtype=np.int64), fanout)
        starts = np.concatenate([base - j for j in range(fanout)])
        out = batch.take(pa.array(rows))
        return out.append_column(window_col, pa.array(starts))

    replicated = ds.map_batches(assign, batch_format="pyarrow")
    return hash_aggregate(replicated, list(keys) + [window_col], spec, num_partitions)


def sessionize(
    ds,
    user_col: str,
    ts_col: str,
    gap_us: int,
    num_partitions: int = 16,
    n_col: str = "n_sessions",
    max_col: str = "max_session_events",
):
    """Gap-based sessionization: one output row per user with session count
    and the largest session's event count.

    Shape: one hash co-partition on ``user_col``, then a SINGLE vectorized
    kernel per partition — lexsort(user, ts), session breaks from one
    ``np.diff`` over the sorted timestamps, per-session lengths and per-user
    folds via ``reduceat`` over the break positions. No per-group Python
    callable anywhere: ``groupby(user).map_groups`` pays Ray's ~200 µs/group
    dispatch, which dominates at millions of users; this pays one Python
    call per PARTITION regardless of user count (the same pattern
    ``paragraph_dedup`` uses for reassembly).
    """
    from geopolars_ray.stages.agg import hash_partitioned_map

    def per_partition(part: pa.Table) -> pa.Table:
        uid_t = part[user_col]
        if part.num_rows == 0:
            return pa.table({
                user_col: pa.array([], uid_t.type),
                n_col: pa.array([], pa.int64()),
                max_col: pa.array([], pa.int64()),
            })
        uid = uid_t.to_numpy(zero_copy_only=False)
        us = part[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        uid_s, us_s = uid[order], us[order]
        n = len(uid_s)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid_s[1:] != uid_s[:-1]
        new_sess = new_user.copy()
        np.logical_or(new_sess[1:], np.diff(us_s) > gap_us, out=new_sess[1:])
        sess_start = np.flatnonzero(new_sess)           # row index of each session start
        sess_len = np.diff(np.append(sess_start, n))    # events per session
        user_first = np.flatnonzero(new_user[sess_start])  # session index of each user's first session
        n_sessions = np.diff(np.append(user_first, len(sess_start)))
        max_events = np.maximum.reduceat(sess_len, user_first)
        take = pa.array(order[sess_start[user_first]].astype(np.int64))
        return pa.table({
            user_col: uid_t.combine_chunks().take(take),
            n_col: pa.array(n_sessions.astype(np.int64)),
            max_col: pa.array(max_events.astype(np.int64)),
        })

    return hash_partitioned_map(ds, [user_col], per_partition, num_partitions)


def grouped_topk(
    ds,
    keys: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
    salt: int = 8,
    num_partitions: int = 16,
):
    """Top-k rows per key group, hot-key safe (salted two-phase), with a
    MAP-SIDE pre-combine.

    Top-k is a combiner: top-k(union) = top-k(union of per-part top-ks)
    under the deterministic total order (``order_col`` descending by
    default, ties broken by ``tie_cols`` ascending). So each input block
    first collapses to ≤k rows per key it contains — the exchanges then
    carry blocks×keys×k candidate rows, never the input (r4: the two sort
    exchanges over all 150k joined rows were 2.05s each at sf0.1 while the
    actual top-k compute was 0.3s). Phase 1 then computes a top-k on each
    salt split of every group and phase 2 merges the per-split partials —
    a hot key's candidates spread over ``salt`` parallel partials instead
    of one giant group.
    """
    import pyarrow.compute as pc

    from geopolars_ray.stages.agg import salted_group_map

    keys = list(keys)
    tie_cols = list(tie_cols)

    def per_batch_topk(batch: pa.Table) -> pa.Table:
        from geopolars_ray.stages.agg import rank_within_runs

        if batch.num_rows <= k:
            return batch
        sort_keys = [(c, "ascending") for c in keys]
        sort_keys.append((order_col, "descending" if descending else "ascending"))
        sort_keys.extend((c, "ascending") for c in tie_cols)
        t = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
        return t.filter(pa.array(rank_within_runs(t, keys) < k))

    def topk(g: pa.Table) -> pa.Table:
        v = g[order_col].to_numpy(zero_copy_only=False)
        primary = -v if descending else v
        ties = [g[c].to_numpy(zero_copy_only=False) for c in reversed(tie_cols)]
        order = np.lexsort((*ties, primary))[:k]
        return g.take(pa.array(order))

    partials = ds.map_batches(per_batch_topk, batch_format="pyarrow")
    return salted_group_map(partials, keys, topk, topk, salt=salt, num_partitions=num_partitions)


def windowed_columns(
    ds,
    keys: Sequence[str],
    order_col: str,
    row_number: str | None = None,
    lag: Sequence[tuple] = (),
    lead: Sequence[tuple] = (),
    rank: str | None = None,
    dense_rank: str | None = None,
    cumsum: Sequence[tuple] = (),
    descending: bool = False,
    num_partitions: int = 32,
):
    """Per-key window columns: ``row_number`` / ``lag`` / ``lead`` /
    ``rank`` / ``dense_rank`` / running ``cumsum``.

    The hash-co-partition analogue of SQL's
    ``f(...) OVER (PARTITION BY keys ORDER BY order_col)``: one
    ``hash_partitioned_map`` exchange, then ONE lexsort per partition and
    pure shift arithmetic — no per-group Python (same pattern as
    ``sessionize``). Ordering ties are broken by input position within the
    partition (stable sort), so add a tiebreaker to ``order_col``'s table if
    cross-engine determinism on ties matters.

    - ``row_number``: name for a 0-based rank within the key group in
      ``order_col`` order (descending if ``descending``).
    - ``lag`` / ``lead``: tuples ``(src_col, out_col)`` or ``(src_col,
      out_col, offset)`` — the value of ``src_col`` ``offset`` rows
      before/after within the group, null at the group edge.
    - ``rank`` / ``dense_rank``: 0-BASED SQL RANK()/DENSE_RANK() over
      ``order_col`` ties (SQL's are 1-based: add 1 in the consumer or the
      oracle). Ties = equal ``order_col`` within the key group.
    - ``cumsum``: tuples ``(src_col, out_col)`` — running sum of
      ``src_col`` within the group in window order (nulls count as 0,
      SQL SUM-ignores-nulls semantics), float64 output.
    """
    import pyarrow.compute as pc

    from geopolars_ray.stages.agg import hash_partitioned_map, rank_within_runs

    keys = list(keys)
    lag = [t if len(t) == 3 else (*t, 1) for t in lag]
    lead = [t if len(t) == 3 else (*t, 1) for t in lead]
    for _, _, off in (*lag, *lead):
        if off < 1:
            raise ValueError("lag/lead offset must be >= 1")

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(c, "ascending") for c in keys]
        sort_keys.append((order_col, "descending" if descending else "ascending"))
        t = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        n = t.num_rows
        rk = rank_within_runs(t, keys)
        rank_ = rk  # run-position, reused by lag/lead below
        if row_number is not None:
            t = t.append_column(row_number, pa.array(rk))
        if rank is not None or dense_rank is not None:
            # tie-group position: runs keyed by (keys..., order_col)
            tie = rank_within_runs(t, keys + [order_col])
            if rank is not None:
                # SQL RANK (0-based): position of the tie group's first row
                t = t.append_column(rank, pa.array(rk - tie))
            if dense_rank is not None:
                # distinct order values before this one within the run
                is_new = (tie == 0).astype(np.int64)
                csum = np.cumsum(is_new)
                run_start = np.arange(n, dtype=np.int64) - rk
                dense = csum - csum[run_start] if n else csum
                t = t.append_column(dense_rank, pa.array(dense))
        for src, out in cumsum:
            v = t[src].to_numpy(zero_copy_only=False).astype(np.float64)
            v0 = np.where(np.isnan(v), 0.0, v)
            g = np.cumsum(v0)
            run_start = np.arange(n, dtype=np.int64) - rk
            run_sum = g - g[run_start] + v0[run_start] if n else g
            t = t.append_column(out, pa.array(run_sum))
        # group size at each row = rank of the LAST row of its run + 1;
        # shifted values are valid only while staying inside the run
        for specs, sign in ((lag, -1), (lead, +1)):
            for src, out, off in specs:
                idx = np.arange(n, dtype=np.int64) + sign * off
                if sign < 0:
                    valid = rank_ >= off
                elif n:
                    # within-run lookahead: the row off ahead exists in the
                    # same run iff its rank is rank+off (runs are contiguous)
                    idx_c = np.clip(idx, 0, n - 1)
                    valid = (idx < n) & (rank_[idx_c] == rank_ + off)
                else:
                    valid = np.zeros(0, bool)
                idx_safe = np.clip(idx, 0, max(n - 1, 0))
                shifted = t[src].take(pa.array(idx_safe))
                t = t.append_column(out, pc.if_else(pa.array(valid), shifted, pa.nulls(n, shifted.type)))
        return t

    return hash_partitioned_map(ds, keys, per_partition, num_partitions)
