"""Small shared helpers for stage construction."""

from __future__ import annotations

import ray

#: per-worker-process instance cache for task-based stages (see
#: ``cached_stage_fn``); at most a handful of live configs, so unbounded
_FN_CACHE: dict = {}


def cached_stage_fn(cls, kwargs: dict):
    """Wrap a callable-class stage as a plain ``map_batches`` function with
    a per-worker cached instance.

    Stage state that builds in microseconds-to-milliseconds (compiled
    regexes, matcher objects, spec lists) does NOT justify an actor pool:
    pools ramp from cold actor processes that re-pay the import cost, and
    a fixed pool reserves CPUs other stages could use. Plain tasks reuse
    warm worker processes; the instance is constructed once per worker per
    config (keyed by the pickled constructor kwargs). Reserve actor pools
    for genuinely heavy state (models, big dictionaries)."""
    from ray import cloudpickle  # plain pickle cannot key lambda/closure state

    key = (cls.__module__, cls.__qualname__, cloudpickle.dumps(kwargs))

    def stage_fn(batch):
        inst = _FN_CACHE.get(key)
        if inst is None:
            inst = cls(**kwargs)
            _FN_CACHE[key] = inst
        return inst(batch)

    stage_fn.__name__ = cls.__name__
    return stage_fn


def map_stage(
    ds,
    cls,
    kwargs: dict,
    batch_size: int,
    concurrency: int | tuple[int, int] | None = None,
):
    """``map_batches`` a callable-class stage: task-based with a per-worker
    cached instance by default (cheap state), an actor pool only when the
    caller explicitly passes ``concurrency`` (heavy state)."""
    if concurrency is not None:
        return ds.map_batches(
            cls,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        cached_stage_fn(cls, kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def default_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool size ``(1, num_cpus)``.

    Letting the pool scale between 1 and the CPU count means concurrent
    stages share the node without one pool starving the others; the
    streaming executor adds actors only while a stage is the bottleneck."""
    cpus = 4
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    if cap is not None:
        cpus = min(cpus, cap)
    return (1, max(cpus, 1))
