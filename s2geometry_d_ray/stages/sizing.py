"""Actor-pool sizing shared by every stateful stage.

A pool hardcoded at concurrency=2 runs 2-wide on a 32-CPU box and
starves on a 100x cluster; a pool that reserves EVERY cpu starves the
producer stages and the pipeline stalls (the q5 deadlock lesson).  The
rule here: size to the cluster, leave headroom for producers.
"""

from __future__ import annotations


def auto_concurrency_range(requested=None, reserve=2):
    """(1, cap) autoscaling actor-pool range: scales up to the cluster
    when there are enough blocks, but never reserves more actors than
    the input has blocks (avoids the min-actors > inputs warning and
    idle reserved CPUs on small inputs)."""
    return (1, auto_concurrency(requested, reserve=reserve))


def auto_concurrency(requested=None, reserve=2, floor=1):
    """Pool width = cluster CPUs minus `reserve` for producer stages,
    clamped to `requested` when the caller passed one."""
    try:
        import ray
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    cap = max(floor, total - reserve)
    if requested is None:
        return cap
    return max(floor, min(int(requested), cap))
