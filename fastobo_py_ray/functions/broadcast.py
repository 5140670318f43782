"""Per-worker-process cache for broadcast (``ray.put``) objects.

Raw numpy arrays come out of the object store zero-copy, but anything
else — a pandas Series/Index, a dict, a compiled automaton — pays a
FULL deserialization on every ``ray.get``.  A ``map_batches`` stage
that calls ``ray.get(ref)`` per batch therefore re-deserializes the
whole broadcast object once per batch; caching the resolved object in
a module-global keyed by the ObjectRef keeps the cost at once per
WORKER PROCESS, which is the semantics a broadcast join/lookup wants
(the resolve_index pattern, ``stages/mentions.py``).

The cache is intentionally tiny (a handful of live broadcasts per
job) and clears wholesale when it grows past ``_MAX`` — broadcast
objects are job-scoped, so eviction precision doesn't matter, only
that a long-lived worker can't accumulate dead refs.
"""

from __future__ import annotations

_CACHE: dict = {}
_MAX = 8


def worker_cached(ref):
    """Resolve a ``ray.put`` ObjectRef once per worker process."""
    import ray

    key = ref.hex()
    obj = _CACHE.get(key)
    if obj is None:
        if len(_CACHE) >= _MAX:
            _CACHE.clear()
        obj = ray.get(ref)
        _CACHE[key] = obj
    return obj
