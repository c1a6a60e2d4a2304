"""String function family (reference: vaex-core/vaex/functions.py:963-2403,
C++ kernels src/strings.cpp:855-893 / src/superstring.hpp).

Every function maps to a built-in Spark SQL string expression — these run
in whole-stage codegen on UTF8String, which is the Spark analogue of
vaex's C++ superstring kernels (no Python in the loop).  Semantics notes:

* vaex follows pandas ``.str`` conventions — 0-based indices, regex via
  ``re2``-ish syntax; Spark locate/substring are 1-based (adapted here),
  regex is Java regex (documented divergence for exotic patterns).
* ``count``/``contains``/``replace`` take ``regex=`` flags like pandas.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import register_function, _c


class StringAccessor:
    """``expr.str.*`` — mirrors vaex's StringOperations scope
    (registered via register_function(scope='str'), functions.py:963+)."""

    def __init__(self, expr):
        self.expr = expr

    def _w(self, col: Column):
        return type(self.expr)(self.expr.df, col)

    # pandas-style names
    def capitalize(self):
        c = self.expr.col
        return self._w(F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.expr(f"substring({_sql(c)}, 2)"))))

    def cat(self, other):
        return self._w(F.concat(self.expr.col, _c(other)))

    def center(self, width, fillchar=" "):
        return self._w(str_center(self.expr.col, width, fillchar))

    def contains(self, pattern, regex=True):
        c = self.expr.col
        return self._w(c.rlike(pattern) if regex else c.contains(pattern))

    def count(self, pat, regex=False):
        import re as _re
        pattern = pat if regex else _re.escape(pat)
        return self._w(F.regexp_count(self.expr.col, F.lit(pattern)))

    def endswith(self, pat):
        return self._w(self.expr.col.endswith(pat))

    def startswith(self, pat):
        return self._w(self.expr.col.startswith(pat))

    def find(self, sub, start=0):
        # pandas: -1 when absent, 0-based
        return self._w(F.locate(sub, self.expr.col, start + 1) - 1)

    def rfind(self, sub):
        return self._w(str_rfind(self.expr.col, sub))

    def index(self, sub, start=0):
        return self.find(sub, start)

    def rindex(self, sub):
        return self.rfind(sub)

    def get(self, i):
        return self._w(F.substring(self.expr.col, i + 1, 1) if i >= 0 else F.substring(self.expr.col, i, 1))

    def join(self, sep):
        return self._w(F.array_join(self.expr.col, sep))

    def len(self):
        return self._w(F.length(self.expr.col))

    def byte_length(self):
        return self._w(F.octet_length(self.expr.col))

    def ljust(self, width, fillchar=" "):
        c = self.expr.col
        return self._w(F.when(F.length(c) >= width, c).otherwise(F.rpad(c, width, fillchar)))

    def rjust(self, width, fillchar=" "):
        c = self.expr.col
        return self._w(F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, fillchar)))

    def pad(self, width, side="left", fillchar=" "):
        if side == "left":
            return self.rjust(width, fillchar)
        if side == "right":
            return self.ljust(width, fillchar)
        return self.center(width, fillchar)

    def zfill(self, width):
        return self.rjust(width, "0")

    def lower(self):
        return self._w(F.lower(self.expr.col))

    def upper(self):
        return self._w(F.upper(self.expr.col))

    def title(self):
        return self._w(str_title(self.expr.col))

    def strip(self, to_strip=None):
        return self._w(F.trim(self.expr.col) if to_strip is None else F.btrim(self.expr.col, F.lit(to_strip)))

    def lstrip(self, to_strip=None):
        # PySpark 4 signature is ltrim(src, trim) — source column FIRST
        return self._w(F.ltrim(self.expr.col) if to_strip is None else F.ltrim(self.expr.col, F.lit(to_strip)))

    def rstrip(self, to_strip=None):
        return self._w(F.rtrim(self.expr.col) if to_strip is None else F.rtrim(self.expr.col, F.lit(to_strip)))

    def match(self, pattern):
        return self._w(self.expr.col.rlike(f"^(?:{pattern})"))

    def repeat(self, n):
        return self._w(F.repeat(self.expr.col, n))

    def replace(self, pat, repl, regex=False):
        c = self.expr.col
        if regex:
            return self._w(F.regexp_replace(c, pat, repl))
        return self._w(F.replace(c, F.lit(pat), F.lit(repl)))

    def slice(self, start=0, stop=None):
        c = self.expr.col
        if stop is None:
            return self._w(F.expr(f"substring({_sql(c)}, {start + 1})") if start >= 0 else F.substring(c, start, 1 << 30))
        return self._w(F.substring(c, start + 1, stop - start))

    def split(self, pattern=None, n=-1):
        import re as _re
        pat = r"\s+" if pattern is None else _re.escape(pattern)
        return self._w(F.split(self.expr.col, pat, n if n and n > 0 else -1))

    def rsplit(self, pattern=None, n=-1):
        # Spark lacks rsplit; reverse-trick keeps it JVM-side
        import re as _re
        pat = r"\s+" if pattern is None else _re.escape(pattern)
        rev = F.reverse(self.expr.col)
        parts = F.split(rev, pat, n if n and n > 0 else -1)
        return self._w(F.reverse(F.transform(parts, lambda s: F.reverse(s))))

    def extract_regex(self, pattern, group=1):
        return self._w(F.regexp_extract(self.expr.col, pattern, group))

    def equals(self, other):
        return self._w(self.expr.col == _c(other))

    def notequals(self, other):
        return self._w(self.expr.col != _c(other))

    def isalnum(self):
        return self._w(self.expr.col.rlike(r"^[a-zA-Z0-9]+$"))

    def isalpha(self):
        return self._w(self.expr.col.rlike(r"^[a-zA-Z]+$"))

    def isdigit(self):
        return self._w(self.expr.col.rlike(r"^[0-9]+$"))

    def isspace(self):
        return self._w(self.expr.col.rlike(r"^\s+$"))

    def islower(self):
        c = self.expr.col
        return self._w((c == F.lower(c)) & c.rlike("[a-zA-Z]"))

    def isupper(self):
        c = self.expr.col
        return self._w((c == F.upper(c)) & c.rlike("[a-zA-Z]"))

    def istitle(self):
        c = self.expr.col
        return self._w((c == F.initcap(c)) & c.rlike("[a-zA-Z]"))


def _sql(col: Column) -> str:
    # Render a column reference for the few functions needing F.expr text.
    return col._jc.toString()  # noqa: SLF001 — canonical Column->SQL text


def str_center(c: Column, width: int, fillchar: str = " ") -> Column:
    left = F.floor((F.lit(width) - F.length(c)) / 2) + F.length(c)
    out = F.rpad(F.lpad(c, left.cast("int"), fillchar), width, fillchar)
    return F.when(F.length(c) >= width, c).otherwise(out)


def str_title(c: Column) -> Column:
    """Python str.title semantics (a letter is uppercased when the
    previous char is not a letter) — initcap only splits on spaces.
    Per-char transform over the split array; stays in codegen."""
    chars = F.split(F.lower(c), "")
    titled = F.transform(chars, lambda ch, i: F.when(
        (i == 0) | ~F.element_at(chars, i).rlike(r"\p{L}"),
        F.upper(ch)).otherwise(ch))
    return F.array_join(titled, "")


def str_rfind(c: Column, sub: str) -> Column:
    # last index of sub (0-based, -1 if absent): search in reversed string
    rev_pos = F.locate(sub[::-1], F.reverse(c))
    return F.when(rev_pos == 0, F.lit(-1)).otherwise(F.length(c) - rev_pos - len(sub) + 1)


# Flat names for the expression-string compiler (vaex exposes str_len(x)
# style names in expression strings; registry.py:9-15 scope='str').
_FLAT = {
    "lower": lambda x: F.lower(_c(x)),
    "upper": lambda x: F.upper(_c(x)),
    "title": lambda x: str_title(_c(x)),
    "len": lambda x: F.length(_c(x)),
    "byte_length": lambda x: F.octet_length(_c(x)),
    "strip": lambda x, t=None: F.trim(_c(x)) if t is None else F.btrim(_c(x), F.lit(t)),
    "lstrip": lambda x: F.ltrim(_c(x)),
    "rstrip": lambda x: F.rtrim(_c(x)),
    "contains": lambda x, p, regex=True: _c(x).rlike(p) if regex else _c(x).contains(p),
    "startswith": lambda x, p: _c(x).startswith(p),
    "endswith": lambda x, p: _c(x).endswith(p),
    "cat": lambda x, y: F.concat(_c(x), _c(y)),
    "replace": lambda x, a, b, regex=False: F.regexp_replace(_c(x), a, b) if regex else F.replace(_c(x), F.lit(a), F.lit(b)),
    "split": lambda x, p=r"\s+": F.split(_c(x), p),
    "slice": lambda x, a=0, b=None: F.substring(_c(x), a + 1, (b - a) if b is not None else (1 << 30)),
    "get": lambda x, i: F.substring(_c(x), i + 1, 1),
    "zfill": lambda x, w: F.lpad(_c(x), w, "0"),
    "repeat": lambda x, n: F.repeat(_c(x), n),
    "extract_regex": lambda x, p, g=1: F.regexp_extract(_c(x), p, g),
    "count": lambda x, p: F.regexp_count(_c(x), F.lit(p)),
    "find": lambda x, s: F.locate(s, _c(x)) - 1,
    "rfind": lambda x, s: str_rfind(_c(x), s),
    "equals": lambda x, y: _c(x) == _c(y),
    "isdigit": lambda x: _c(x).rlike(r"^[0-9]+$"),
    "isalpha": lambda x: _c(x).rlike(r"^[a-zA-Z]+$"),
    "isalnum": lambda x: _c(x).rlike(r"^[a-zA-Z0-9]+$"),
}

for _n, _f in _FLAT.items():
    register_function(scope="str", name=_n)(_f)
