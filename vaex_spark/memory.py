"""Driver-side memory guard for dense-grid materializations.

Reference parity: vaex's MemoryTracker (packages/vaex-core/vaex/memory.py:24
``pre_alloc(bytes, reason)``) meters grid allocations before they happen;
the enterprise tracker raises when a budget would be exceeded.  Here the
distributed side is never the risk — binby grids aggregate to at most
(occupied cells × aggs) rows — but the DRIVER densifies the sparse result
into a numpy ndarray of the full requested shape, and a mis-typed
``shape=100_000`` on a 3-d grid would OOM the driver before a single task
ran.  ``pre_alloc`` turns that into a typed, actionable raise at plan
time instead.

The default budget is deliberately generous (4 GiB — a 512×512×512
float64 grid) and tunable per-process via ``set_grid_limit`` or the
``VS_GRID_LIMIT_BYTES`` environment variable; ``set_grid_limit(None)``
disables the guard.
"""

from __future__ import annotations

import os

__all__ = ["GridMemoryError", "pre_alloc", "set_grid_limit", "grid_limit"]

DEFAULT_LIMIT_BYTES = 4 * 1024 ** 3


class GridMemoryError(MemoryError):
    """A requested dense grid would exceed the driver-side budget."""


_limit: "int | None" = int(os.environ.get("VS_GRID_LIMIT_BYTES",
                                          DEFAULT_LIMIT_BYTES))


def grid_limit() -> "int | None":
    return _limit


def set_grid_limit(n_bytes: "int | None") -> None:
    """Set the driver-side dense-grid budget (None disables)."""
    global _limit
    _limit = None if n_bytes is None else int(n_bytes)


def pre_alloc(n_bytes: int, reason: str) -> None:
    """Raise GridMemoryError if an ``n_bytes`` driver allocation would
    exceed the budget (vaex memory.py:29 pre_alloc parity)."""
    if _limit is not None and n_bytes > _limit:
        raise GridMemoryError(
            f"{reason} needs {n_bytes / 1024**3:.2f} GiB on the driver, over "
            f"the {_limit / 1024**3:.2f} GiB grid budget; reduce shape=, "
            f"aggregate fewer statistics per call, or raise the budget via "
            f"vaex_spark.memory.set_grid_limit / VS_GRID_LIMIT_BYTES")
