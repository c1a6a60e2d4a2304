"""Symbolic statistic expressions (reference vaex/stat.py).

``vs.stat.mean('x') / vs.stat.std('y')`` builds an arithmetic tree over
statistics; ``.calculate(df, binby=..., ...)`` evaluates it.  All leaf
statistics are scheduled on the df's delayed executor FIRST and then
resolved with a single ``df.execute()`` — one Spark pass for the whole
tree (vaex's multi-statistic batching, SURVEY §4 #3); the arithmetic
runs driver-side on the scalar/grid results.  Grid (``binby``) leaves
that don't support delayed scheduling evaluate eagerly — still correct,
just not batched.
"""

from __future__ import annotations

import operator

import numpy as np

__all__ = ["count", "sum", "mean", "std", "covar", "correlation"]


class Expression:
    """A (composition of) statistic(s); supports + - * / ** and unary neg."""

    def calculate(self, df, binby=[], shape=128, limits=None, selection=None):
        kw = dict(binby=binby, shape=shape, limits=limits, selection=selection)
        thunk = self._schedule(df, kw)
        df.execute()
        return thunk()

    def _schedule(self, df, kw):
        raise NotImplementedError

    def __add__(self, o): return _BinOp("+", operator.add, self, o)
    def __radd__(self, o): return _BinOp("+", operator.add, o, self)
    def __sub__(self, o): return _BinOp("-", operator.sub, self, o)
    def __rsub__(self, o): return _BinOp("-", operator.sub, o, self)
    def __mul__(self, o): return _BinOp("*", operator.mul, self, o)
    def __rmul__(self, o): return _BinOp("*", operator.mul, o, self)
    def __truediv__(self, o): return _BinOp("/", operator.truediv, self, o)
    def __rtruediv__(self, o): return _BinOp("/", operator.truediv, o, self)
    def __pow__(self, o): return _BinOp("**", operator.pow, self, o)
    def __neg__(self): return _BinOp("*", operator.mul, -1.0, self)


class _BinOp(Expression):
    def __init__(self, code, fn, a, b):
        self.code, self.fn, self.a, self.b = code, fn, a, b

    def __repr__(self):
        return f"({self.a!r} {self.code} {self.b!r})"

    def _schedule(self, df, kw):
        ta = self.a._schedule(df, kw) if isinstance(self.a, Expression) \
            else (lambda a=self.a: a)
        tb = self.b._schedule(df, kw) if isinstance(self.b, Expression) \
            else (lambda b=self.b: b)
        return lambda: self.fn(np.asarray(ta()), np.asarray(tb()))


class _Leaf(Expression):
    def __init__(self, name, args):
        self.name, self.args = name, args

    def __repr__(self):
        return f"stat.{self.name}({', '.join(map(str, self.args))})"

    def _schedule(self, df, kw):
        import inspect
        fn = getattr(df, self.name)
        accepted = set(inspect.signature(fn).parameters)
        passed = {k: v for k, v in kw.items() if k in accepted}
        dropped = {k: v for k, v in kw.items()
                   if k not in accepted and v not in (None, [], 128)}
        if dropped:
            raise ValueError(f"stat.{self.name} does not support {sorted(dropped)}")
        out = fn(*self.args, delay=True, **passed)
        return lambda: out.get() if hasattr(out, "get") else out


def count(expression="*"):
    return _Leaf("count", [] if expression in ("*", None) else [expression])


def sum(expression):
    return _Leaf("sum", [expression])


def mean(expression):
    return _Leaf("mean", [expression])


def std(expression):
    return _Leaf("std", [expression])


def covar(x, y):
    return _Leaf("covar", [x, y])


def correlation(x, y):
    return _Leaf("correlation", [x, y])
