"""Broadcast helper: ship a small object to every task/actor via one
`ray.put` (Plasma shared memory per node) instead of re-pickling it into
every map_batches closure.

Usage:
    ref = broadcast(obj)                # driver, once
    ...
    class Stage:
        def __init__(self, ref):        # actor __init__, once per actor
            self.obj = fetch(ref)
Works transparently when Ray is not initialised (plain passthrough) so the
pure-python unit tests don't need a Ray session.
"""

from __future__ import annotations


def broadcast(obj):
    try:
        import ray
        if ray.is_initialized():
            return ray.put(obj)
    except Exception:
        pass
    return obj


def fetch(ref):
    try:
        import ray
        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except Exception:
        pass
    return ref
