"""Stateful per-batch stages as TASKS with a per-worker instance cache.

`map_batches(Cls, fn_constructor_args=..., concurrency=N)` (an actor
pool) is the textbook shape for a stage that builds state once and
streams batches, but on this Ray version EVERY ActorPoolMapOperator
start places constructor arguments in the object store (the MapWorker
ctor receives the DataContext and the map transformer by value) and,
with Ray Data's default max_restarts > 0, an actor restart after those
args are spilled or lost can fail — ray#53727, the core_worker warning
seen in the BENCH_r03 tail.  Plain tasks with a once-per-worker-process
instance cache give the identical setup-once/stream-batches semantics:
the broadcast fetch inside ``cls.__init__`` is a zero-copy local Plasma
get and the instance is built once per worker process (not per batch),
while reserving no CPUs ahead of demand (the q5 small-cluster deadlock
lesson) and restarting cleanly from the task spec alone.

Caches are bounded per stage class: a stage only ever uses one state
at a time, so a new key evicts that class's old entries, and two
different stages interleaving on one worker never evict each other
(separate per-class dicts).
"""

from __future__ import annotations

from collections import defaultdict

from ..state.broadcast import cache_get_or_build

# One cache dict per stage class name, per worker process.
_CACHES: dict = defaultdict(dict)


def _arg_key(a):
    """Stable-enough cache key component, computed ON THE DRIVER at
    closure-creation time and shipped as a constant: BroadcastRef ->
    its ObjectRef hex; primitives by value; anything else by driver-side
    identity (distinct states get distinct keys; equal keys only ever
    alias the same driver object)."""
    if hasattr(a, "hex") and not isinstance(a, (str, bytes)):
        return a.hex()
    if isinstance(a, (int, float, str, bool, bytes, type(None))):
        return a
    return id(a)


def stateful_map_batches(ds, cls, cargs=(), ckwargs=None, **map_kwargs):
    """``ds.map_batches`` over instances of ``cls`` built once per
    worker process (per distinct constructor args).

    Drop-in replacement for the actor-pool form
    ``ds.map_batches(cls, fn_constructor_args=cargs, concurrency=...)``;
    ``map_kwargs`` pass straight through to ``map_batches`` (an int
    ``concurrency`` here bounds concurrent tasks, not reserved actors).
    """
    ckwargs = ckwargs or {}
    key = (cls.__module__, cls.__qualname__,
           tuple(_arg_key(a) for a in cargs),
           tuple(sorted((k, _arg_key(v)) for k, v in ckwargs.items())))
    name = cls.__name__

    def fn(batch):
        cache = _CACHES[name]
        inst = cache_get_or_build(cache, key,
                                  lambda: cls(*cargs, **ckwargs))
        return inst(batch)

    fn.__name__ = name  # ds.stats() / plan shows the stage class name
    return ds.map_batches(fn, **map_kwargs)
