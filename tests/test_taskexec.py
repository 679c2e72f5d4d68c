"""Per-worker stage cache: per-class LRU so two interleaved datasets using
the same stage class with different keys don't evict each other per batch
(advisor round 2)."""

from relation_extraction_ray import taskexec
from relation_extraction_ray.taskexec import cached_stage_fn


class _Stage:
    built = 0

    def __init__(self, tag: str) -> None:
        type(self).built += 1
        self.tag = tag

    def __call__(self, batch):
        return (self.tag, batch)


class _Other(_Stage):
    built = 0


def setup_function(_fn):
    taskexec._STAGE_CACHE.clear()
    taskexec._CLASS_LRU.clear()
    _Stage.built = 0
    _Other.built = 0


def test_interleaved_keys_share_cache():
    a = cached_stage_fn(_Stage, "ka", {"tag": "a"})
    b = cached_stage_fn(_Stage, "kb", {"tag": "b"})
    for _ in range(5):  # alternating batches, both instances stay live
        assert a(1) == ("a", 1)
        assert b(2) == ("b", 2)
    assert _Stage.built == 2


def test_stale_generation_evicted():
    fns = [cached_stage_fn(_Stage, f"k{i}", {"tag": str(i)}) for i in range(4)]
    for f in fns:
        f(0)
    assert _Stage.built == 4
    live = [k for k in taskexec._STAGE_CACHE if k[1] == _Stage.__qualname__]
    assert len(live) == taskexec._PER_CLASS_CAPACITY
    # the two most recent keys stay warm
    fns[2](0)
    fns[3](0)
    assert _Stage.built == 4


def test_classes_do_not_evict_each_other():
    s = cached_stage_fn(_Stage, "k", {"tag": "s"})
    o = cached_stage_fn(_Other, "k", {"tag": "o"})
    for _ in range(3):
        s(0)
        o(0)
    assert _Stage.built == 1 and _Other.built == 1


def test_cached_fn_pickle_excludes_driver_cache(ray_session):
    """Regression: the pickled task fn must NOT ship the driver's live
    stage cache (cloudpickle captures a dynamic closure's referenced
    globals by value — instances of a test-local class in the cache used
    to break worker deserialization with ModuleNotFoundError)."""
    import ray

    fn = cached_stage_fn(_Stage, "poison", {"tag": "x"})
    fn(0)  # driver cache now holds a test-local (unimportable) instance

    import pyarrow as pa

    import ray.data as rd

    from relation_extraction_ray.pipelines.kg import ParseStage
    from relation_extraction_ray.sources.synth import documents_dataset

    ds = documents_dataset(8, override_num_blocks=2).map_batches(
        cached_stage_fn(ParseStage, (), {}), batch_format="pyarrow"
    )
    assert ds.count() > 0  # would raise RaySystemError before the fix
