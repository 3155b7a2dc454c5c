"""Small shared helpers for stage construction."""

from __future__ import annotations

import ray


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
