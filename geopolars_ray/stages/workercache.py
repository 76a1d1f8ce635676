"""Per-worker-process cached batch callables — the task-based alternative to
an actor pool when the stage's state is CHEAP to build.

Ray actor pools are the right shape when per-actor setup is expensive
(model load, big index build): pay it once per actor, amortize over
batches. But a pool is also a hard CPU reservation with multi-second
spin-up per dataset execution — for a stage whose state is a few compiled
regexes or a small LUT, the pool costs more than it saves (measured
1.5-2s of the 2.2-2.6s walls of the langid/fingerprint/simhash gate
queries at sf0.1). ``worker_cached(Cls, **kwargs)`` returns a plain
function for task-based ``map_batches``: the instance is constructed once
per WORKER PROCESS (Ray workers persist across tasks) and reused — same
once-per-worker semantics as an actor's ``__init__``, none of the pool's
fixed costs or scheduling constraints.

Rule of thumb: state build > ~100ms or holds GBs → actor pool
(``map_batches(Cls, concurrency=N)``); otherwise → ``worker_cached``.
"""

from __future__ import annotations

_CACHE: dict = {}


def worker_cached(cls, /, **kwargs):
    """A batch function that lazily constructs ``cls(**kwargs)`` once per
    worker process and delegates every batch to it. ``kwargs`` must be
    picklable and hashable-by-repr (they key the per-process cache)."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items(), key=lambda kv: kv[0])))

    def fn(batch):
        inst = _CACHE.get(key)
        if inst is None:
            inst = _CACHE[key] = cls(**kwargs)
        return inst(batch)

    fn.__name__ = f"worker_cached_{cls.__name__}"
    return fn
