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

import hashlib
from collections import OrderedDict

# bounded per-process cache: entries may hold ObjectRef-keyed broadcast
# state, which pins object-store entries while referenced — evicting the
# least-recently-used beyond a small cap keeps long sessions (bench loops,
# many invocations) from ratcheting worker memory monotonically
_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_CACHE_MAX = 32


def worker_cached(cls, /, **kwargs):
    """A batch function that lazily constructs ``cls(**kwargs)`` once per
    worker process and delegates every batch to it.

    The cache key includes a fingerprint of the CLASS DEFINITION itself
    (its cloudpickle bytes), so factory/closure-defined classes that share
    a qualname but capture different state never alias one instance.
    ``kwargs`` must be picklable and hashable (they complete the key) —
    validated here, on the driver, so a mistake fails at wrap time instead
    of as a confusing remote traceback inside the first task.
    """
    import ray.cloudpickle as cloudpickle

    cls_fp = hashlib.sha1(cloudpickle.dumps(cls)).hexdigest()
    key = (cls_fp, tuple(sorted(kwargs.items(), key=lambda kv: kv[0])))
    try:
        hash(key)
    except TypeError as e:
        raise TypeError(
            f"worker_cached kwargs must be hashable (they key the per-worker "
            f"cache); got {sorted(kwargs)}: {e}"
        ) from None

    def fn(batch):
        # resolve the cache through the WORKER'S imported module at call
        # time: cloudpickle captures a closure's referenced globals BY
        # VALUE, so touching _CACHE directly would give every deserialized
        # task its own private snapshot and silently rebuild per task
        # (caught by the reuse assertion in tests/test_agg.py)
        from geopolars_ray.stages import workercache as _wc

        cache = _wc._CACHE
        inst = cache.get(key)
        if inst is None:
            inst = cls(**kwargs)
            cache[key] = inst
            while len(cache) > _wc._CACHE_MAX:
                cache.popitem(last=False)
        else:
            cache.move_to_end(key)
        return inst(batch)

    fn.__name__ = f"worker_cached_{cls.__name__}"
    return fn
