"""Euclidean kNN of a point Dataset against a broadcast query-point set.

The north star's "ST_Distance kNN" (BASELINE.json): the reference only has
row-wise distance (`geoseries.rs:141-146`), so kNN is a new composition —
per-batch partial top-k against the broadcast query matrix (one vectorized
distance computation per batch), then a per-query merge. Per-batch partials
are (queries x k) rows, so the shuffle moves O(q*k*blocks) tiny rows, never
the point table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class EuclideanTopK:
    """Per-batch partial top-k: distances from batch points to query points."""

    def __init__(self, queries, k: int, x_col: str = "x", y_col: str = "y", id_col: str = "id"):
        q = ray.get(queries) if isinstance(queries, ray.ObjectRef) else queries
        self.qid = np.asarray(q["qid"], dtype=np.int64)
        self.qx = np.asarray(q["qx"], dtype=np.float64)
        self.qy = np.asarray(q["qy"], dtype=np.float64)
        self.k = k
        self.x_col, self.y_col, self.id_col = x_col, y_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        dx = x[:, None] - self.qx[None, :]
        dy = y[:, None] - self.qy[None, :]
        d = np.sqrt(dx * dx + dy * dy)  # (n, q)
        k = min(self.k, len(ids))
        top = np.argpartition(d, kth=k - 1, axis=0)[:k]  # (k, q)
        qn = len(self.qid)
        rows = top.T.reshape(-1)
        return pa.table(
            {
                "qid": pa.array(np.repeat(self.qid, k)),
                self.id_col: pa.array(ids[rows]),
                "distance": pa.array(d[rows, np.repeat(np.arange(qn), k)]),
            }
        )


def knn_join(
    points_ds,
    targets_ds,
    k: int,
    cell_deg: float = 5.0,
    x_col: str = "x",
    y_col: str = "y",
    point_id: str = "pid",
    target_id: str = "tid",
    num_partitions: int = 16,
):
    """Large-large exact kNN join: each left point's k nearest right points.

    Scale path (SURVEY.md §7 M7), fully distributed — NOTHING is ever
    collected on the driver:

    - Each pass keys targets to their grid cell plus the 8 neighbors and
      points to their own cell, hash-joins on the cell id, and takes a
      vectorized per-point top-k per hash partition. A point is *complete*
      when its k-th candidate distance is provably inside the 3x3 coverage
      radius (< cell_deg).
    - Incomplete points (k-th not proven, or no candidates at all) go to the
      next pass with the cell size grown 4x — the expanding-ring second pass.
      The remainder is computed distributively with a native ``left_anti``
      join against the completed point ids; only its (small) per-pass row
      COUNT reaches the driver. Once the cell covers the whole domain the
      3x3 block holds every target and the pass is exact by construction, so
      the loop terminates in <= ~5 passes.

    Partitioning assumption: ``cell_deg`` is chosen so most points find k
    targets in their 3x3 block on the first pass; each extra pass re-keys the
    full target set (one distributed scan) but only the remainder points.

    Returns (point_id, target_id, distance, rank); ties break on target id.
    """
    import pyarrow.compute as pc

    from geopolars_ray.geom import tiles as tiles_mod
    from geopolars_ray.stages.agg import hash_partitioned_map
    from geopolars_ray.stages.hashjoin import hash_join

    p_schema = points_ds.schema()
    t_schema = targets_ds.schema()
    if p_schema is None or t_schema is None:
        raise ValueError(
            "knn_join could not resolve input schemas (lazy pipeline whose "
            "first block is empty?) — materialize or re-read the inputs first"
        )
    p_types = dict(zip(p_schema.names, p_schema.types))
    t_types = dict(zip(t_schema.names, t_schema.types))
    id_type = p_types[point_id]
    tid_type = t_types[target_id]
    for _nm, _t in ((point_id, id_type), (target_id, tid_type)):
        # the partition kernel runs on int64 numpy views; non-integer ids
        # (strings) can't ride that path — callers add a dense surrogate key
        if not pa.types.is_integer(_t):
            raise ValueError(
                f"knn_join requires integer id columns; {_nm!r} is {_t} "
                "(for string ids, attach a dense integer surrogate key first)"
            )

    def _ids_out(pid_np: np.ndarray, tid_np: np.ndarray):
        """Emit id columns in the INPUT id types so 'complete' blocks union
        cleanly with the original-typed remainder (int32 ids etc.)."""
        return pa.array(pid_np).cast(id_type), pa.array(tid_np).cast(tid_type)

    def one_pass(pts_in, cd: float, covers_all: bool):
        """One expanding-ring pass as a SINGLE exchange: points and their
        3x3-replicated targets union into one stream keyed by cell, and each
        cell partition computes its points' top-k directly — no separate
        hash-join stage, and the candidate cross-product lives only in
        partition-local NumPy, never in the object store."""
        ny = int(np.ceil(180.0 / cd))

        def target_side(batch: pa.Table) -> pa.Table:
            x = batch[x_col].to_numpy(zero_copy_only=False)
            y = batch[y_col].to_numpy(zero_copy_only=False)
            cell = tiles_mod.grid_tile_id(x, y, cd)
            # replicate to the 3x3 neighborhood
            reps = []
            cells = []
            for dx in (-ny, 0, ny):
                for dy in (-1, 0, 1):
                    reps.append(np.arange(len(x)))
                    cells.append(cell + dx + dy)
            rows = np.concatenate(reps)
            rep = batch.select([target_id, x_col, y_col]).take(pa.array(rows))
            n = len(rows)
            return pa.table(
                {
                    point_id: pa.nulls(n, id_type),
                    target_id: rep[target_id],
                    "_x": rep[x_col],
                    "_y": rep[y_col],
                    "_cell": pa.array(np.concatenate(cells)),
                    "_side": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        def point_side(batch: pa.Table) -> pa.Table:
            x = batch[x_col].to_numpy(zero_copy_only=False)
            y = batch[y_col].to_numpy(zero_copy_only=False)
            cell = tiles_mod.grid_tile_id(x, y, cd)
            n = len(batch)
            return pa.table(
                {
                    point_id: batch[point_id],
                    target_id: pa.nulls(n, tid_type),
                    "_x": batch[x_col],
                    "_y": batch[y_col],
                    "_cell": pa.array(cell),
                    "_side": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        both = pts_in.map_batches(point_side, batch_format="pyarrow").union(
            targets_ds.map_batches(target_side, batch_format="pyarrow")
        )

        def topk_cell_partition(part: pa.Table) -> pa.Table:
            lm = pc.equal(part["_side"], 0)
            P = part.filter(lm)
            T = part.filter(pc.invert(lm))
            if P.num_rows == 0 or T.num_rows == 0:
                # points with no candidate targets emit nothing: they stay in
                # the remainder and re-try at the next (coarser) pass
                return pa.table({point_id: pa.array([], id_type), target_id: pa.array([], tid_type),
                                 "distance": pa.array([], pa.float64()), "rank": pa.array([], pa.int64()),
                                 "_complete": pa.array([], pa.bool_())})
            ppid = P[point_id].to_numpy(zero_copy_only=False).astype(np.int64)
            px = P["_x"].to_numpy(zero_copy_only=False)
            py = P["_y"].to_numpy(zero_copy_only=False)
            pcell = P["_cell"].to_numpy(zero_copy_only=False)
            ttid = T[target_id].to_numpy(zero_copy_only=False).astype(np.int64)
            tx = T["_x"].to_numpy(zero_copy_only=False)
            ty = T["_y"].to_numpy(zero_copy_only=False)
            tcell = T["_cell"].to_numpy(zero_copy_only=False)
            # sort targets by (cell, tid): within each cell the columns of the
            # distance block are then tid-ordered, so a STABLE row argsort on
            # distance alone breaks ties by tid — the oracle's tie-break
            tor = np.lexsort((ttid, tcell))
            tcell_s, ttid_s, tx_s, ty_s = tcell[tor], ttid[tor], tx[tor], ty[tor]
            por = np.argsort(pcell, kind="stable")
            pcell_s = pcell[por]
            cuts = np.nonzero(np.diff(pcell_s))[0] + 1
            cand_p, cand_t, cand_d = [], [], []
            for rows in np.split(por, cuts):
                c = pcell[rows[0]]
                t0, t1 = np.searchsorted(tcell_s, [c, c + 1])
                if t0 == t1:
                    continue
                ct, cx, cy = ttid_s[t0:t1], tx_s[t0:t1], ty_s[t0:t1]
                # drop aliased duplicates (coarse passes: 3x3 offsets can
                # collide and replicate a target into the same cell twice);
                # tid-sorted -> duplicates adjacent
                if len(ct) > 1:
                    uniq = np.ones(len(ct), dtype=bool)
                    uniq[1:] = ct[1:] != ct[:-1]
                    ct, cx, cy = ct[uniq], cx[uniq], cy[uniq]
                m_c = len(ct)
                take = min(k, m_c)
                # chunk the cell's points: the n x m distance block AND the
                # retained candidates stay bounded (O(points*k) accumulation)
                step = max(1, 4_000_000 // m_c)
                for s0 in range(0, len(rows), step):
                    blk = rows[s0 : s0 + step]
                    dd = np.sqrt(
                        (px[blk, None] - cx[None, :]) ** 2 + (py[blk, None] - cy[None, :]) ** 2
                    )
                    # per-point exact top-k: stable argsort on d, ties in tid
                    # order by construction of the column ordering above
                    sel = np.argsort(dd, axis=1, kind="stable")[:, :take]
                    cand_p.append(np.repeat(ppid[blk], take))
                    cand_t.append(ct[sel].reshape(-1))
                    cand_d.append(np.take_along_axis(dd, sel, axis=1).reshape(-1))
            if not cand_p:
                return pa.table({point_id: pa.array([], id_type), target_id: pa.array([], tid_type),
                                 "distance": pa.array([], pa.float64()), "rank": pa.array([], pa.int64()),
                                 "_complete": pa.array([], pa.bool_())})
            pid = np.concatenate(cand_p)
            tid = np.concatenate(cand_t)
            d = np.concatenate(cand_d)
            order = np.lexsort((tid, d, pid))
            pid, tid, d = pid[order], tid[order], d[order]
            cut = np.nonzero(np.diff(pid))[0] + 1
            out_p, out_t, out_d, out_r, out_ok = [], [], [], [], []
            for p_ids, t_ids, dists in zip(np.split(pid, cut), np.split(tid, cut), np.split(d, cut)):
                kk = min(k, len(t_ids))
                complete = covers_all or (len(t_ids) >= k and dists[k - 1] < cd)
                out_p.append(p_ids[:kk])
                out_t.append(t_ids[:kk])
                out_d.append(dists[:kk])
                out_r.append(np.arange(1, kk + 1, dtype=np.int64))
                out_ok.append(np.full(kk, complete))
            if not out_p:
                return pa.table({point_id: pa.array([], id_type), target_id: pa.array([], tid_type),
                                 "distance": pa.array([], pa.float64()), "rank": pa.array([], pa.int64()),
                                 "_complete": pa.array([], pa.bool_())})
            pid_a, tid_a = _ids_out(np.concatenate(out_p), np.concatenate(out_t))
            return pa.table(
                {
                    point_id: pid_a,
                    target_id: tid_a,
                    "distance": pa.array(np.concatenate(out_d)),
                    "rank": pa.array(np.concatenate(out_r)),
                    "_complete": pa.array(np.concatenate(out_ok)),
                }
            )

        return hash_partitioned_map(both, ["_cell"], topk_cell_partition, num_partitions)

    remaining = points_ds.select_columns([point_id, x_col, y_col])
    n_remaining = remaining.count()
    outs = []
    cd = float(cell_deg)
    while True:
        covers_all = cd >= 360.0  # one cell spans the lon/lat domain -> exact
        ranked = one_pass(remaining, cd, covers_all).materialize()
        complete = ranked.map_batches(
            lambda t: t.filter(pc.equal(t["_complete"], True)).drop_columns(["_complete"]),
            batch_format="pyarrow",
        )
        outs.append(complete)
        if covers_all:
            break
        # early exit without an anti-join pass: every complete point has
        # exactly k rows, so (no incomplete rows) + (k*|remaining| rows) means
        # no point is missing either
        n_rows = ranked.count()
        n_bad = ranked.map_batches(
            lambda t: t.filter(pc.equal(t["_complete"], False)).select([point_id]),
            batch_format="pyarrow",
        ).count()
        if n_bad == 0 and n_rows == k * n_remaining:
            break
        # remainder = points not yet complete. The anti-join tolerates
        # duplicate right keys, so the complete rows' id column is used
        # directly (no dedup aggregate). Ray's map_groups can emit
        # zero-column empty blocks for empty partitions; normalize them.
        empty_ids = pa.table({point_id: pa.array([], id_type)})
        done_ids = complete.map_batches(
            lambda t: t.select([point_id]) if point_id in t.column_names else empty_ids,
            batch_format="pyarrow",
        )
        remaining = hash_join(
            remaining, done_ids, on=[point_id], how="left_anti", num_partitions=num_partitions,
            left_schema=pa.schema(
                [(point_id, id_type), (x_col, p_types[x_col]), (y_col, p_types[y_col])]
            ),
            right_schema=pa.schema([(point_id, id_type)]),
        ).materialize()
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        cd *= 4.0
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def euclidean_knn(
    points_ds, queries: dict, k: int, x_col="x", y_col="y", id_col="id",
    concurrency=None, num_partitions: int = 8,
):
    """Exact kNN rows (qid, id, distance, rank); ties broken by id asc.

    Per-block partial top-k (so the exchange carries O(q·k·blocks) rows,
    never points), then ONE vectorized merge per hash partition of qids —
    not a per-qid ``map_groups`` (Ray's sort-based per-group dispatch costs
    ~200µs+/group; with thousands of query points the merge would dominate
    the whole join)."""
    from geopolars_ray.stages.agg import hash_partitioned_map

    ref = ray.put(queries)

    def partial(batch: pa.Table) -> pa.Table:
        # task-based: the only state is the broadcast query arrays, and
        # ray.get(ref) is a cached zero-copy object-store read per worker —
        # tasks skip the actor pool's multi-second spin-up (same reasoning
        # as the task-based MinHasher, stages/dedup.py)
        return EuclideanTopK(ref, k, x_col=x_col, y_col=y_col, id_col=id_col)(batch)

    partials = points_ds.map_batches(
        partial,
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency is not None else {}),
    )

    def merge_part(tab: pa.Table) -> pa.Table:
        qids = tab["qid"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = tab["distance"].to_numpy(zero_copy_only=False)
        ids = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, d, qids))
        qs, dd, ii = qids[order], d[order], ids[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        sizes = np.diff(np.r_[starts, len(qs)])
        rank = np.arange(len(qs)) - np.repeat(starts, sizes)
        keep = rank < k
        return pa.table(
            {
                "qid": pa.array(qs[keep]),
                id_col: pa.array(ii[keep]),
                "distance": pa.array(dd[keep]),
                "rank": pa.array(rank[keep] + 1),
            }
        )

    return hash_partitioned_map(partials, ["qid"], merge_part, num_partitions=num_partitions)


def sjoin_nearest(
    points_ds,
    targets_ds,
    max_distance: float | None = None,
    cell_deg: float = 5.0,
    x_col: str = "x",
    y_col: str = "y",
    point_id: str = "pid",
    target_id: str = "tid",
    distance_col: str = "distance",
    num_partitions: int = 16,
):
    """GeoPandas-style nearest join: each left point matched to its single
    nearest right point (``knn_join`` with k=1), optionally dropped when
    farther than ``max_distance``.

    Semantics delta vs GeoPandas (documented, deterministic): exact distance
    ties keep the LOWEST target id, not all tied rows — the engine's kNN
    tie-break. Output: (point_id, target_id, distance_col); points with no
    target within ``max_distance`` are absent (inner-join shape).
    """
    out = knn_join(points_ds, targets_ds, k=1, cell_deg=cell_deg, x_col=x_col,
                   y_col=y_col, point_id=point_id, target_id=target_id,
                   num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.drop_columns(["rank"])
        if max_distance is not None:
            import pyarrow.compute as pc

            t = t.filter(pc.less_equal(t["distance"], max_distance))
        if distance_col != "distance":
            t = t.rename_columns([distance_col if c == "distance" else c for c in t.column_names])
        return t

    return out.map_batches(finish, batch_format="pyarrow")


def dwithin_join(
    points_ds,
    targets_ds,
    distance: float,
    x_col: str = "x",
    y_col: str = "y",
    point_id: str = "pid",
    target_id: str = "tid",
    cell_size: float | None = None,
    canonical: bool = False,
    num_partitions: int = 32,
    strip_cost: int = 4_000_000,
):
    """All-pairs within-distance join (ST_DWithin): every (point, target)
    pair with planar euclidean distance <= ``distance``.

    Single exact pass — with cell size >= distance, any qualifying pair is
    inside the point's 3x3 cell block, so targets replicate to the 9
    neighbors, points key to their own cell, and each pair materializes in
    EXACTLY one partition (the point's cell): no dedup exchange needed.
    Per-partition scoring is strip-chunked (one (strip, m) distance block at
    a time, ``strip_cost`` bounds the block area) so a dense cell can't blow
    a task heap; the only quadratic term left is the OUTPUT itself, which is
    the query's answer.

    ``canonical=True`` keeps only ``pid < tid`` pairs — the self-join form
    used for coordinate near-duplicate dedup (feed the pairs to
    ``stages/cc.connected_components`` and keep one representative per
    cluster, exactly like the MinHash/embedding near-dup paths).

    Coordinates are treated planar (same contract as ``knn_join``); for
    lon/lat data pass ``distance`` in degrees or project first. Output:
    (point_id, target_id, distance).
    """
    import pyarrow.compute as pc

    from geopolars_ray.geom import tiles as tiles_mod
    from geopolars_ray.stages.agg import hash_partitioned_map

    if not distance > 0:
        raise ValueError("distance must be > 0")
    cd = float(cell_size) if cell_size is not None else float(distance)
    if cd < distance:
        raise ValueError(
            f"cell_size ({cd}) must be >= distance ({distance}) — the 3x3 "
            "block is only provably complete when one cell covers the radius"
        )
    p_schema = points_ds.schema()
    t_schema = targets_ds.schema()
    if p_schema is None or t_schema is None:
        raise ValueError("dwithin_join could not resolve input schemas")
    id_type = dict(zip(p_schema.names, p_schema.types))[point_id]
    tid_type = dict(zip(t_schema.names, t_schema.types))[target_id]
    for _nm, _t in ((point_id, id_type), (target_id, tid_type)):
        if not pa.types.is_integer(_t):
            raise ValueError(
                f"dwithin_join requires integer id columns; {_nm!r} is {_t}"
            )
    ny = int(np.ceil(180.0 / cd))

    def target_side(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        cell = tiles_mod.grid_tile_id(x, y, cd)
        reps, cells = [], []
        for dx in (-ny, 0, ny):
            for dy in (-1, 0, 1):
                reps.append(np.arange(len(x)))
                cells.append(cell + dx + dy)
        rows = np.concatenate(reps)
        rep = batch.select([target_id, x_col, y_col]).take(pa.array(rows))
        n = len(rows)
        return pa.table({
            point_id: pa.nulls(n, id_type),
            target_id: rep[target_id],
            "_x": rep[x_col], "_y": rep[y_col],
            "_cell": pa.array(np.concatenate(cells)),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def point_side(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table({
            point_id: batch[point_id],
            target_id: pa.nulls(n, tid_type),
            "_x": batch[x_col], "_y": batch[y_col],
            "_cell": pa.array(tiles_mod.grid_tile_id(x, y, cd)),
            "_side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    both = points_ds.map_batches(point_side, batch_format="pyarrow").union(
        targets_ds.map_batches(target_side, batch_format="pyarrow")
    )

    empty = pa.table({point_id: pa.array([], id_type), target_id: pa.array([], tid_type),
                      "distance": pa.array([], pa.float64())})

    def pairs_cell_partition(part: pa.Table) -> pa.Table:
        lm = pc.equal(part["_side"], 0)
        P = part.filter(lm)
        T = part.filter(pc.invert(lm))
        if P.num_rows == 0 or T.num_rows == 0:
            return empty
        ppid = P[point_id].to_numpy(zero_copy_only=False).astype(np.int64)
        px = P["_x"].to_numpy(zero_copy_only=False)
        py = P["_y"].to_numpy(zero_copy_only=False)
        pcell = P["_cell"].to_numpy(zero_copy_only=False)
        ttid = T[target_id].to_numpy(zero_copy_only=False).astype(np.int64)
        tx = T["_x"].to_numpy(zero_copy_only=False)
        ty = T["_y"].to_numpy(zero_copy_only=False)
        tcell = T["_cell"].to_numpy(zero_copy_only=False)
        tor = np.lexsort((ttid, tcell))
        tcell_s, ttid_s, tx_s, ty_s = tcell[tor], ttid[tor], tx[tor], ty[tor]
        por = np.argsort(pcell, kind="stable")
        pcell_s = pcell[por]
        cuts = np.nonzero(np.diff(pcell_s))[0] + 1
        out_p, out_t, out_d = [], [], []
        d2max = float(distance) * float(distance)
        for rows in np.split(por, cuts):
            c = pcell[rows[0]]
            t0, t1 = np.searchsorted(tcell_s, [c, c + 1])
            if t0 == t1:
                continue
            ct, cx, cy = ttid_s[t0:t1], tx_s[t0:t1], ty_s[t0:t1]
            if len(ct) > 1:  # drop 3x3-offset alias duplicates (tid-adjacent)
                uniq = np.ones(len(ct), dtype=bool)
                uniq[1:] = ct[1:] != ct[:-1]
                ct, cx, cy = ct[uniq], cx[uniq], cy[uniq]
            m = len(ct)
            step = max(1, strip_cost // m)
            for s0 in range(0, len(rows), step):
                blk = rows[s0 : s0 + step]
                d2 = (px[blk, None] - cx[None, :]) ** 2 + (py[blk, None] - cy[None, :]) ** 2
                ii, jj = np.nonzero(d2 <= d2max)
                if not len(ii):
                    continue
                gp = ppid[blk][ii]
                gt = ct[jj]
                if canonical:
                    keep = gp < gt
                    gp, gt, ii, jj = gp[keep], gt[keep], ii[keep], jj[keep]
                    if not len(gp):
                        continue
                out_p.append(gp)
                out_t.append(gt)
                out_d.append(np.sqrt(d2[ii, jj]))
        if not out_p:
            return empty
        return pa.table({
            point_id: pa.array(np.concatenate(out_p)).cast(id_type),
            target_id: pa.array(np.concatenate(out_t)).cast(tid_type),
            "distance": pa.array(np.concatenate(out_d)),
        })

    return hash_partitioned_map(both, ["_cell"], pairs_cell_partition,
                                num_partitions=num_partitions)
