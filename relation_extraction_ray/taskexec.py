"""Task-mode stage execution: per-worker-process stage cache.

A Ray `map_batches` over a plain function runs as tasks on the cluster's
long-lived worker processes — caching the stage instance per process gives
actor-pool amortization WITHOUT actor-pool spin-up, which measured ~8 s
(two 32-actor pools) on the 40k-doc KG headline and ~3 s on single-stage
queries.  Use for stages whose state is cheap to build (a `ray.get` of a
broadcast ref, a compiled table); keep real actor pools for stages whose
state must be loaded once and bounded in memory (a heavy model).

One instance per (class, key) is live per worker; older generations of the
same class are evicted (e.g. a new vocab broadcast replaces the previous
one instead of accumulating).
"""

from __future__ import annotations

_STAGE_CACHE: dict = {}


def cached_stage_fn(cls, key, ctor_kwargs):
    """A picklable task function constructing ``cls(**ctor_kwargs)`` once
    per worker process per ``key``."""

    def run(batch):
        k = (cls.__module__, cls.__qualname__, key)
        st = _STAGE_CACHE.get(k)
        if st is None:
            for old in [x for x in _STAGE_CACHE if x[:2] == k[:2]]:
                del _STAGE_CACHE[old]
            st = _STAGE_CACHE[k] = cls(**ctor_kwargs)
        return st(batch)

    return run
