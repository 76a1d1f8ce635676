"""Polygonize a line soup into the faces of its planar arrangement.

GEOS ``Polygonizer`` / shapely ``polygonize_full`` semantics: node the
input linework (split at crossings), drop **dangles** (edges with a free
end) and **cut edges** (bridges that border the same face on both
sides), then emit every bounded face of the remaining subdivision as a
polygon — nested faces become shells with holes (two concentric squares
polygonize to the annulus-with-hole plus the inner square, exactly like
GEOS). The reference has no polygonize (its `geo`-crate surface stops at
predicates, `geopolars/geopolars-geo/src/ops`); this exceeds reference
parity the same way the overlay engine does.

Algorithm (all pieces shared with or mirroring `overlay.py`):

1. **Noding** reuses ``overlay.node_segments`` — the Bentley–Ottmann
   sweep + fixed-point snap-rounding, so crossing lines split at exact
   shared vertices and duplicate segments collapse to one undirected
   edge (GEOS also merges duplicates).
2. **Dangle removal** iteratively deletes edges with a degree-1
   endpoint. **Cut edges** are then the graph bridges (iterative
   Tarjan low-link); removing them leaves every edge on a cycle, so no
   new dangles appear.
3. **Face traversal**: each undirected edge becomes two directed
   half-edges; the successor of ``u→v`` is the outgoing edge at ``v``
   immediately *before* the twin ``v→u`` in CCW angular order (the
   clockwise-most continuation). This traces every face boundary once
   with interior on the LEFT, so bounded faces have positive signed
   area and the unbounded face (plus hole-side boundaries) negative.
4. **Hole assignment**: a negative cycle's parent face is found with a
   half-open leftward ray cast from its lexicographically-smallest
   vertex: the nearest edge strictly west whose span straddles the ray
   (``(y1>vy) != (y2>vy)``) is a boundary of the face immediately west
   of the hole; its *descending* orientation has that face on its left,
   so the traced cycle owning that half-edge is the parent. Chains
   (hole west of hole) terminate because each hop strictly decreases
   the leftmost x; negative cycles whose ray escapes border the
   unbounded face and are dropped. The half-open rule makes grazing
   local-maxima vertices and collinear-on-ray horizontal edges resolve
   by face continuation around the touching vertex — no perturbation
   needed.

Scale note: like overlay, polygonize is a collective op with
data-dependent control flow — the Ray-scale story is KEY parallelism:
``stages/polygonize.py`` hash-partitions lines per key so each group's
arrangement is built in one task while groups fan out across the
cluster.
"""

from __future__ import annotations

import math
from collections import defaultdict

from geopolars_ray.geom.overlay import (
    CLIPPING,
    SUBJECT,
    _ring_signed_area,
    node_segments,
)

_LINE_TYPES = ("linestring", "linearring", "multilinestring")


def _segments_of(geoms) -> list:
    """Flatten line-typed geometry tuples into raw (p, q, SUBJECT)
    segments. Nulls skip; polygonal/point input raises (GEOS polygonize
    consumes linework only)."""
    segs: list = []

    def add_path(path, closed: bool):
        pts = [(float(p[0]), float(p[1])) for p in path]
        for i in range(len(pts) - 1):
            if pts[i] != pts[i + 1]:
                segs.append((pts[i], pts[i + 1], SUBJECT))
        if closed and len(pts) > 1 and pts[-1] != pts[0]:
            segs.append((pts[-1], pts[0], SUBJECT))

    for g in geoms:
        if g is None:
            continue
        t, data = g
        if t == "linestring":
            add_path(data, closed=False)
        elif t == "linearring":
            add_path(data, closed=True)
        elif t == "multilinestring":
            for part in data:
                add_path(part, closed=False)
        else:
            raise TypeError(
                f"polygonize consumes linework only, got {t!r}; "
                "use boundary/exterior to turn polygons into lines first"
            )
    return segs


def _prune_dangles(edges: list, alive: list) -> list:
    """Kill edges with a degree-1 endpoint, cascading (worklist, O(E)):
    returns the indices removed (the dangles), mutating ``alive``."""
    deg: dict = defaultdict(int)
    incident: dict = defaultdict(list)
    for i, (p, q) in enumerate(edges):
        deg[p] += 1
        deg[q] += 1
        incident[p].append(i)
        incident[q].append(i)
    work = [v for v, d in deg.items() if d == 1]
    removed: list = []
    while work:
        v = work.pop()
        if deg[v] != 1:
            continue
        for i in incident[v]:
            if not alive[i]:
                continue
            alive[i] = False
            removed.append(i)
            for w in edges[i]:
                deg[w] -= 1
                if deg[w] == 1:
                    work.append(w)
        deg[v] = 0
    return removed


def _find_bridges(edges: list, alive: list) -> set:
    """Bridge edge indices of the live multigraph (iterative Tarjan).

    Parallel edges never arise (noding collapses duplicates), so the
    classic parent-edge-skip rule is exact."""
    adj: dict = defaultdict(list)
    for i, (p, q) in enumerate(edges):
        if alive[i]:
            adj[p].append((q, i))
            adj[q].append((p, i))
    disc: dict = {}
    low: dict = {}
    bridges: set = set()
    timer = 0
    for root in adj:
        if root in disc:
            continue
        stack = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            v, pedge, it = stack[-1]
            advanced = False
            for w, ei in it:
                if ei == pedge:
                    continue
                if w not in disc:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, ei, iter(adj[w])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        bridges.add(pedge)
    return bridges


def _trace_faces(edges: list):
    """Trace every face boundary of the edge set (each undirected edge
    used once per direction). Returns ``(faces, cycle_of)``: the vertex
    cycles (interior on the left, so bounded faces are CCW / positive
    signed area) and the directed-edge-id -> face-index map."""
    # outgoing directed edges per vertex: directed id 2i = p->q, 2i+1 = q->p
    out: dict = defaultdict(list)
    for i, (p, q) in enumerate(edges):
        out[p].append(2 * i)
        out[q].append(2 * i + 1)

    def d_src(d):
        p, q = edges[d >> 1]
        return p if (d & 1) == 0 else q

    def d_dst(d):
        p, q = edges[d >> 1]
        return q if (d & 1) == 0 else p

    # sort each vertex's outgoing edges by angle; successor of incoming d
    # (ending at v) = predecessor of its twin in v's CCW circular order
    pos_in_sorted: dict = {}
    sorted_out: dict = {}
    for v, ds in out.items():
        ds.sort(key=lambda d: math.atan2(d_dst(d)[1] - v[1],
                                         d_dst(d)[0] - v[0]))
        sorted_out[v] = ds
        for k, d in enumerate(ds):
            pos_in_sorted[d] = k

    faces: list = []
    cycle_of: dict = {}
    for start in range(2 * len(edges)):
        if start in cycle_of:
            continue
        cycle: list = []
        d = start
        while d not in cycle_of:
            cycle_of[d] = len(faces)
            cycle.append(d_src(d))
            v = d_dst(d)
            twin = d ^ 1
            ds = sorted_out[v]
            if len(ds) == 1:
                d = twin  # dead end (can't occur after dangle removal)
            else:
                d = ds[pos_in_sorted[twin] - 1]  # CCW predecessor of twin
        faces.append(cycle)
    return faces, cycle_of


def _leftward_hit(vx: float, vy: float, edges: list, cycle_of: dict):
    """Nearest half-open straddling edge strictly west of (vx, vy);
    returns the traced-cycle id owning its DESCENDING half-edge (the
    face east of the hit, i.e. the face the probe point sits in), or
    None when the ray escapes to the unbounded face. Ties at one x
    (several up-edges fanning from a vertex on the ray) resolve to the
    eastmost-leaning up-edge — the one actually bounding the probe's
    face."""
    best_x = -math.inf
    best: list = []
    for i, (p, q) in enumerate(edges):
        (x1, y1), (x2, y2) = p, q
        if (y1 > vy) == (y2 > vy):
            continue
        xint = x1 + (vy - y1) * (x2 - x1) / (y2 - y1)
        if xint >= vx:
            continue
        if xint > best_x:
            best_x, best = xint, [i]
        elif xint == best_x:
            best.append(i)
    if not best:
        return None
    if len(best) == 1:
        i = best[0]
    else:
        # all tied hits are up-edges from one vertex at (best_x, vy);
        # the face east of the vertex is bounded by the most-eastward one
        def up_angle(i):
            p, q = edges[i]
            top = q if q[1] > p[1] else p
            bot = p if q[1] > p[1] else q
            return math.atan2(top[1] - bot[1], top[0] - bot[0])
        i = min(best, key=up_angle)
    p, q = edges[i]
    descending = 2 * i if p[1] > q[1] else 2 * i + 1
    return cycle_of[descending]


def polygonize_full(geoms):
    """Polygonize line-typed geometry tuples.

    Returns ``(polygons, dangles, cuts)``: the bounded faces as
    ``("polygon", [closed shell CCW, *closed holes CW])`` tuples sorted
    by their shell's smallest vertex, plus the removed dangle and
    cut-edge segments as ``("linestring", [p, q])`` tuples.
    """
    segs = _segments_of(geoms)
    if not segs:
        return [], [], []
    groups = node_segments(segs)
    edges = [(p, q) for p, q, m_s, m_c in groups if m_s + m_c > 0]
    alive = [True] * len(edges)
    dangle_idx = _prune_dangles(edges, alive)
    cut_idx = _find_bridges(edges, alive)
    for i in cut_idx:
        alive[i] = False
    # bridges sit between cycles, so their removal leaves all degrees >= 2
    dangles = [("linestring", [edges[i][0], edges[i][1]])
               for i in sorted(dangle_idx)]
    cuts = [("linestring", [edges[i][0], edges[i][1]])
            for i in sorted(cut_idx)]
    live = [edges[i] for i in range(len(edges)) if alive[i]]
    if not live:
        return [], dangles, cuts

    faces, cycle_of = _trace_faces(live)
    areas = [_ring_signed_area(c) for c in faces]
    shells = [ci for ci, a in enumerate(areas) if a > 0.0]
    holes_of: dict = {ci: [] for ci in shells}
    parent_cache: dict = {}

    def resolve(ci, seen):
        """Walk parent pointers west until a shell or the void."""
        if ci in parent_cache:
            return parent_cache[ci]
        if areas[ci] > 0.0:
            parent_cache[ci] = ci
            return ci
        if ci in seen:
            parent_cache[ci] = None  # defensive: degenerate pinch
            return None
        seen.add(ci)
        v = min(faces[ci])
        hit = _leftward_hit(v[0], v[1], live, cycle_of)
        parent = None if hit is None else resolve(hit, seen)
        parent_cache[ci] = parent
        return parent

    for ci, a in enumerate(areas):
        if a >= 0.0:
            continue
        parent = resolve(ci, set())
        if parent is not None:
            holes_of[parent].append(ci)

    polys = []
    for ci in shells:
        shell = faces[ci]
        rings = [shell + [shell[0]]]
        for hi in sorted(holes_of[ci], key=lambda h: min(faces[h])):
            h = faces[hi]
            rings.append(h + [h[0]])
        polys.append(("polygon", rings))
    polys.sort(key=lambda g: min(g[1][0]))
    return polys, dangles, cuts


def polygonize_geoms(geoms):
    """The polygons only (see ``polygonize_full``)."""
    return polygonize_full(geoms)[0]


def node_lines(geoms):
    """ST_Node / shapely ``node`` over a list of line geometries: the
    fully-noded linework (segments split at every crossing, duplicates
    collapsed) as one MULTILINESTRING of maximal chains — noded
    segments are re-joined through degree-2 nodes, junctions stay
    split. Returns None for empty input."""
    from geopolars_ray.geom.array import GeometryArray
    from geopolars_ray.geom.kernels import line_merge

    segs = _segments_of(geoms)
    if not segs:
        return None
    groups = node_segments(segs)
    parts = [[p, q] for p, q, m_s, m_c in sorted(groups) if m_s + m_c > 0]
    ml = ("multilinestring", parts)
    merged = line_merge(GeometryArray.from_pylist([ml])).to_pylist()[0]
    return merged


def _directed_segments(geoms) -> list:
    """Raw (p, q) segments of line geometries, keeping input direction."""
    return [(p, q) for p, q, _pol in _segments_of(geoms)]


def shared_paths_pair(a, b):
    """ST_SharedPaths / shapely ``shared_paths`` for ONE pair of line
    geometries: the linework common to both, split into same-direction
    and opposite-direction parts. Returns (same, opposite) as
    multilinestring tuples (or None where empty).

    Noding reuses ``node_segments`` with per-operand multiplicity
    labels: a noded piece with BOTH multiplicities positive lies on
    both inputs (the sweep already subdivides partial collinear
    overlaps exactly). Direction is recovered per piece by locating the
    original segment of each operand nearest the piece midpoint and
    comparing traversal signs. Pieces merge through degree-2 nodes via
    ``line_merge`` so output chains are maximal, like GEOS."""
    import numpy as np

    from geopolars_ray.geom.array import GeometryArray
    from geopolars_ray.geom.kernels import line_merge

    segs_a = [(p, q, SUBJECT) for p, q in _directed_segments([a])]
    segs_b = [(p, q, CLIPPING) for p, q in _directed_segments([b])]
    if not segs_a or not segs_b:
        return None, None
    groups = node_segments(segs_a + segs_b)
    shared = [(p, q) for p, q, m_s, m_c in groups if m_s > 0 and m_c > 0]
    if not shared:
        return None, None

    def dir_sign(piece, segs):
        (px, py), (qx, qy) = piece
        mx, my = (px + qx) / 2.0, (py + qy) / 2.0
        best_d, best_sign = math.inf, 1.0
        for (ax, ay), (bx, by) in ((s[:2][0], s[:2][1]) for s in
                                   ((sp, sq) for sp, sq, _ in segs)):
            dx, dy = bx - ax, by - ay
            L2 = dx * dx + dy * dy
            if L2 == 0:
                continue
            t = max(0.0, min(1.0, ((mx - ax) * dx + (my - ay) * dy) / L2))
            d = math.hypot(mx - (ax + t * dx), my - (ay + t * dy))
            if d < best_d:
                best_d = d
                best_sign = 1.0 if (qx - px) * dx + (qy - py) * dy >= 0 else -1.0
        return best_sign

    same, opp = [], []
    for piece in shared:
        sa = dir_sign(piece, segs_a)
        sb = dir_sign(piece, segs_b)
        (same if sa == sb else opp).append([piece[0], piece[1]])

    def pack(parts):
        if not parts:
            return None
        merged = line_merge(GeometryArray.from_pylist(
            [("multilinestring", parts)])).to_pylist()[0]
        if merged[0] == "linestring":
            merged = ("multilinestring", [merged[1]])
        return merged

    return pack(same), pack(opp)


def shared_paths_arrays(lhs, rhs):
    """Row-wise ``shared_paths`` over aligned columns. Returns
    (same_dir, opposite_dir) GeometryArrays of MULTILINESTRINGs —
    GEOS wraps the two in a GeometryCollection, which this engine
    deliberately rejects (reference parity), so they come back as two
    separate columns instead."""
    from geopolars_ray.geom.array import GeometryArray

    same_out, opp_out = [], []
    for g, h in zip(lhs.to_pylist(), rhs.to_pylist()):
        if g is None or h is None:
            same_out.append(None)
            opp_out.append(None)
            continue
        s, o = shared_paths_pair(g, h)
        same_out.append(s)
        opp_out.append(o)
    return (GeometryArray.from_pylist(same_out),
            GeometryArray.from_pylist(opp_out))


def node_arrays(ga):
    """Per-row ST_Node kernel: each geometry's own linework noded
    against itself (registry kernel `stages/geo.py`)."""
    from geopolars_ray.geom.array import GeometryArray

    out = [None if g is None else node_lines([g]) for g in ga.to_pylist()]
    return GeometryArray.from_pylist(out)
