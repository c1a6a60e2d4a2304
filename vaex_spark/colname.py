"""Single source of truth for non-identifier column-name quoting.

The reference keeps ORIGINAL column names ('a b', 'c.d', unicode…) and
spells access as ``df['a b']`` (packages/vaex-core/vaex/utils.py:415
valid_expression).  Our Spark equivalent backtick-quotes such names so
Spark does not read ``.`` as a struct path.  r13 ADVICE: this logic had
been reimplemented in four call sites (window._fcol, expresso
subscript, DataFrame.__getitem__, Expression.__init__), each with its
own escape handling — hoisted here so a future escape-rule change
cannot diverge per path.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def quote_name(name: str) -> str:
    """Name as Spark accepts it in a column reference: identifiers pass
    through; anything else is backtick-quoted with `` doubling."""
    if name.isidentifier():
        return name
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str):
    """``F.col`` that survives non-identifier column names."""
    return F.col(quote_name(name))
