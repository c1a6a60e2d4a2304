"""The public ``@delayed`` decorator (reference vaex/delayed.py:42).

Composes computations over delayed statistics: the wrapped function is
not called until ``.get()``, by which point the scheduled statistics
have been resolved by ``df.execute()`` in one batched pass.

>>> s = df.sum('x', delay=True)
>>> c = df.count(delay=True)
>>> @vs.delayed
... def mean(s, c):
...     return s / c
>>> m = mean(s, c)
>>> df.execute()
>>> m.get()
"""

from __future__ import annotations

__all__ = ["delayed", "delayed_args", "delayed_list"]


def _resolve(v):
    if isinstance(v, _DelayedCall):
        return v.get()
    # our executor promises: _Delayed with .get() and ._done
    if hasattr(v, "get") and hasattr(v, "_done"):
        return v.get()
    if isinstance(v, (list, tuple)):
        return type(v)(_resolve(x) for x in v)
    return v


class _DelayedCall:
    def __init__(self, fn, args, kwargs):
        self.fn, self.args, self.kwargs = fn, args, kwargs

    def get(self):
        out = self.fn(*[_resolve(a) for a in self.args],
                      **{k: _resolve(v) for k, v in self.kwargs.items()})
        return _resolve(out)


def delayed(f):
    """Make ``f`` transparently accept delayed (promise) arguments."""
    def wrapped(*args, **kwargs):
        return _DelayedCall(f, args, kwargs)
    wrapped.__name__ = getattr(f, "__name__", "delayed")
    wrapped.__doc__ = f.__doc__
    return wrapped


def delayed_args(*args):
    """reference delayed.py:89 — a promise for a tuple of promises."""
    return _DelayedCall(lambda *a: a, args, {})


def delayed_list(values):
    """reference delayed.py:98 — a promise for a list of promises."""
    return _DelayedCall(lambda *a: list(a), tuple(values), {})
