"""Task-result cache (reference vaex-core/vaex/cache.py).

Scalar statistics (sum/mean/count/...) are memoized on a fingerprint of
(logical plan, state, aggregate expressions).  Spark already caches
*data* (``df.persist``) — what it lacks and vaex has is cross-query
RESULT reuse: calling ``df.x.sum()`` twice costs one job.  Keys derive
from Catalyst's resolved logical plan string, so they are stable across
sessions reading the same files the way the reference's
data-hash/mtime fingerprints are.

Usage (same shapes as the reference):

>>> import vaex_spark as vs
>>> vs.cache.memory_infinite()           # on globally
>>> with vs.cache.memory(maxsize=128):   # or as a context manager
...     df.sum('x')
>>> vs.cache.off()
"""

from __future__ import annotations

import collections
from typing import Any, MutableMapping

cache: MutableMapping | None = None


class _LRUCache(collections.OrderedDict):
    """Minimal LRU (the reference suggests cachetools; stdlib is enough
    for the result-sized values we store)."""

    def __init__(self, maxsize: int = 1024):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        value = super().__getitem__(key)
        self.move_to_end(key)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)


class _restore:
    """Context manager returned by on/off/memory* — restores the
    previous cache on exit (reference cache.py:80 _cleanup)."""

    def __init__(self, previous):
        self._previous = previous

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        global cache
        cache = self._previous
        return False

    def __repr__(self):
        return "<cache restore context manager>"


def memory_infinite(clear: bool = False) -> _restore:
    global cache
    prev = cache
    if clear or not isinstance(cache, dict):
        cache = {}
    return _restore(prev)


def memory(maxsize: int = 1024, clear: bool = False) -> _restore:
    global cache
    prev = cache
    if clear or not isinstance(cache, _LRUCache):
        cache = _LRUCache(maxsize)
    return _restore(prev)


def on(type: str = "memory_infinite", **kwargs) -> _restore:  # noqa: A002
    return {"memory_infinite": memory_infinite, "memory": memory}[type](**kwargs)


def off() -> _restore:
    global cache
    prev = cache
    cache = None
    return _restore(prev)


def is_on() -> bool:
    return cache is not None


def set(key: str, value: Any, type=None, duration_wallclock=None) -> None:  # noqa: A001,A002
    if cache is not None:
        cache[key] = value


def get(key: str, default: Any = None, type=None) -> Any:  # noqa: A002
    if cache is None:
        return default
    return cache.get(key, default)


def fingerprint(*args, **kwargs) -> str:
    import hashlib
    import json
    payload = json.dumps([args, kwargs], sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


# ---------------------------------------------------------------------------
# operator-internal persists
# ---------------------------------------------------------------------------
# Several operators persist() a shared subframe for CORRECTNESS (global-
# order windows, LSH band relations, range-join row ids): plan branches
# must read one materialization because range boundaries and mono-ids
# are nondeterministic per materialization.  Those cached relations
# outlive the operator call; long-running sessions can release them in
# one sweep without touching user-created caches.

_OP_PERSISTED: list = []


def _register_persist(sdf):
    """Persist ``sdf`` and track it for release_operator_caches()."""
    sdf = sdf.persist()
    _OP_PERSISTED.append(sdf)
    return sdf


def release_operator_caches() -> int:
    """Unpersist every operator-internal cached relation; returns how
    many were released.  Safe to call anytime — subsequent operator
    calls re-persist what they need."""
    n = 0
    while _OP_PERSISTED:
        sdf = _OP_PERSISTED.pop()
        try:
            sdf.unpersist()
            n += 1
        except Exception:  # session torn down - nothing to release
            pass
    return n
