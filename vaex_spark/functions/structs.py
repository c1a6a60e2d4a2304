"""Struct accessor (reference: vaex-core/vaex/struct.py:19-240).

vaex structs are Arrow StructArrays with field access / projection /
flatten; Spark StructType columns support all of it natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register_function, _c


class StructAccessor:
    def __init__(self, expr):
        self.expr = expr

    def _w(self, col):
        return type(self.expr)(self.expr.df, col)

    def get(self, field):
        """struct.py:173 struct_get."""
        return self._w(self.expr.col.getField(field))

    def project(self, fields):
        """struct.py:223 struct_project — keep a subset of fields."""
        return self._w(F.struct(*[self.expr.col.getField(f).alias(f) for f in fields]))

    def keys(self):
        df = self.expr.df
        dtype = df._spark_df().select(self.expr.col.alias("_s")).schema[0].dataType
        return [f.name for f in dtype.fields]

    def __getitem__(self, field):
        return self.get(field)


register_function(scope="struct", name="get")(lambda x, f: _c(x).getField(f))
register_function(scope="struct", name="project")(
    lambda x, fields: F.struct(*[_c(x).getField(f).alias(f) for f in fields]))
