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

broadcast() returns a BroadcastRef WRAPPER, not the raw ObjectRef: Ray
resolves top-level ObjectRefs in `fn_constructor_args` by storing them in
the object store, and a restartable actor (max_restarts > 0) whose
constructor args were spilled can fail to restart (ray#53727 — the
core_worker warning seen in BENCH_r03).  The wrapper hides the ref from
that resolution; fetch() re-gets it lazily inside the worker (zero-copy
from local Plasma).
"""

from __future__ import annotations


class BroadcastRef:
    """Opaque holder for a ray.ObjectRef (see module docstring)."""

    __slots__ = ("ref",)

    def __init__(self, ref):
        self.ref = ref

    def hex(self):
        """Stable cache key (delegates to the ObjectRef hex)."""
        return self.ref.hex()


def broadcast(obj):
    try:
        import ray
        if ray.is_initialized():
            return BroadcastRef(ray.put(obj))
    except Exception:
        pass
    return obj


def fetch(ref):
    if isinstance(ref, BroadcastRef):
        import ray
        return ray.get(ref.ref)
    try:
        import ray
        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except Exception:
        pass
    return ref


def cache_get_or_build(cache: dict, key, builder):
    """Bounded per-worker-process cache for broadcast-backed stage
    state: a stage only ever uses one broadcast at a time, so inserting
    a new key evicts the old entries (long-lived workers otherwise
    accumulate one plasma-backed copy per distinct ref across queries
    — ADVICE r3)."""
    inst = cache.get(key)
    if inst is None:
        cache.clear()
        inst = builder()
        cache[key] = inst
    return inst
