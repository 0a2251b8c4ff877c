"""Worker-cached task stages: the fast path for cheap-init callables.

An actor-pool ``map_batches(Cls, concurrency=...)`` stage pays 1–2 s of
pool spin-up per query on this sandbox (measured: the broadcast-join
queries dropped 2.6 s → 0.4 s when converted). That price buys one
``__init__`` per actor — worth it when init is expensive (model load,
big index build), pure overhead when init is milliseconds (seeded RNG
draw, regex string concat, plasma ``ray.get`` of a broadcast ref,
which is a zero-copy read).

``worker_cached_stage`` gives cheap-init stages the same
once-per-worker amortization WITHOUT dedicated actors: a plain task fn
that builds the instance on first use in each worker process and
caches it keyed by (class, ctor args). Tasks schedule on any core (no
pool sizing) and the cache survives across queries in the same Ray
session. Keep actor pools for genuinely expensive ``__init__``
(multimodal decoders with model-shaped state are the documented
exemplar) — this helper asserts the class is top-level, because
closure-carrying local classes can't be cache-keyed safely.
"""

from __future__ import annotations

_CACHE: dict = {}


def _key_of(v):
    import ray

    if isinstance(v, ray.ObjectRef):
        return v.hex()
    # only types whose repr is total and value-faithful may be cache
    # keys: numpy arrays (ellipsis-truncating reprs) or default-repr
    # objects would let two DIFFERENT parameter values share one cached
    # stage instance (round-2 ADVICE item 4) — pass big values via
    # ray.put refs instead
    if v is None or isinstance(v, (bool, int, float, str, bytes)):
        return repr(v)
    if isinstance(v, tuple):
        return "(" + ",".join(_key_of(x) for x in v) + ")"
    raise TypeError(
        f"worker_cached_stage ctor kwarg of type {type(v).__name__} cannot be "
        "cache-keyed safely; pass it through ray.put() and hand the ObjectRef in"
    )


def worker_cached_stage(cls, **ctor_kwargs):
    """Return a map_batches task fn that lazily builds ``cls(**kwargs)``
    once per worker process. ``cls`` must be module-top-level (its
    behavior fully determined by ctor args — pass arrays/tables via
    ``ray.put`` refs, whose hex is the stable cache key)."""
    assert "<locals>" not in cls.__qualname__, (
        "worker_cached_stage needs a top-level class: a local class can "
        "capture closure state the cache key cannot see"
    )
    cache_key = (
        cls.__module__,
        cls.__qualname__,
        tuple(sorted((k, _key_of(v)) for k, v in ctor_kwargs.items())),
    )

    def stage_fn(batch):
        # resolve the cache through the module AT CALL TIME: stage_fn is
        # a closure, so cloudpickle ships it by value — naming _CACHE
        # directly would capture the DRIVER's cache dict with its current
        # contents into every task spec (re-shipping cached instances,
        # and poisoning the spec with entries whose classes workers
        # cannot import). The module attribute lookup makes each process
        # use its own cache.
        from approximate_quantiles_ray.engine import stages as _stages

        cache = _stages._CACHE
        inst = cache.get(cache_key)
        if inst is None:
            if len(cache) > 16:  # bound growth across many queries
                cache.clear()
            inst = cls(**ctor_kwargs)
            cache[cache_key] = inst
        return inst(batch)

    stage_fn.__name__ = f"cached_{cls.__name__}"
    return stage_fn
