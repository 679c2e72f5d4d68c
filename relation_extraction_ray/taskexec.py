"""Task-mode stage execution: per-worker-process stage cache.

A Ray `map_batches` over a plain function runs as tasks on the cluster's
long-lived worker processes — caching the stage instance per process gives
actor-pool amortization WITHOUT actor-pool spin-up, which measured ~8 s
(two 32-actor pools) on the 40k-doc KG headline and ~3 s on single-stage
queries.  Use for stages whose state is cheap to build (a `ray.get` of a
broadcast ref, a compiled table); keep real actor pools for stages whose
state must be loaded once and bounded in memory (a heavy model).

Per worker, the ``_PER_CLASS_CAPACITY`` most recently used keys of each
class stay live (LRU): older generations are evicted so a new vocab
broadcast replaces a stale one instead of accumulating, while two
concurrently executing datasets using the same stage class with different
keys (e.g. two interleaved knn calls) no longer evict each other per
batch (advisor round 2).
"""

from __future__ import annotations

_STAGE_CACHE: dict = {}
_CLASS_LRU: dict = {}  # (module, qualname) -> [cache keys, oldest first]
_PER_CLASS_CAPACITY = 2


def _run_cached(cls, key, ctor_kwargs, batch):
    """Worker-side cache lookup + call.  Module-level ON PURPOSE: the
    dynamic closure in :func:`cached_stage_fn` must reference the cache
    only through this importable function — cloudpickle captures the
    globals a dynamic function uses BY VALUE, so a closure touching
    ``_STAGE_CACHE`` directly would ship the driver's live cache contents
    (and choke on any unimportable instances in it) with every task."""
    cls_key = (cls.__module__, cls.__qualname__)
    k = cls_key + (key,)
    st = _STAGE_CACHE.get(k)
    if st is None:
        st = _STAGE_CACHE[k] = cls(**ctor_kwargs)
    lru = _CLASS_LRU.setdefault(cls_key, [])
    if k in lru:
        lru.remove(k)
    lru.append(k)
    while len(lru) > _PER_CLASS_CAPACITY:
        _STAGE_CACHE.pop(lru.pop(0), None)
    return st(batch)


def cached_stage_fn(cls, key, ctor_kwargs):
    """A picklable task function constructing ``cls(**ctor_kwargs)`` once
    per worker process per ``key``."""

    def run(batch):
        return _run_cached(cls, key, ctor_kwargs, batch)

    return run
