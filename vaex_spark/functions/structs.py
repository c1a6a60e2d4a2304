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

    def _fields(self):
        df = self.expr.df
        return df._spark_df().select(self.expr.col.alias("_s")).schema[0].dataType.fields

    def dtypes(self):
        """struct.py:157 — field name -> dtype as a pandas Series."""
        import pandas as pd
        fields = self._fields()
        return pd.Series([f.dataType.simpleString() for f in fields],
                         index=[f.name for f in fields])

    def values(self):
        """struct.py:196 — the field expressions, in declaration order."""
        return [self.get(f.name) for f in self._fields()]

    def items(self):
        """struct.py:212 — (name, expression) pairs."""
        return [(f.name, self.get(f.name)) for f in self._fields()]

    def __getitem__(self, field):
        return self.get(field)


register_function(scope="struct", name="get")(lambda x, f: _c(x).getField(f))
register_function(scope="struct", name="project")(
    lambda x, fields: F.struct(*[_c(x).getField(f).alias(f) for f in fields]))


class DataFrameStructAccessor:
    """df.struct — DataFrame-level struct operations (struct.py:24)."""

    def __init__(self, df):
        self.df = df

    def flatten(self, column=None, recursive: bool = True, join_char: str = "_"):
        """struct.py:24 — expand each struct column into one column per
        field, named <col><join_char><field>; recursive expands nested
        structs.  Pure projection — Catalyst prunes unaccessed fields
        from the parquet scan."""
        from pyspark.sql.types import StructType

        sdf = self.df._spark_df()
        filter_columns = set(sdf.columns if column is None
                             else ([column] if isinstance(column, str) else list(column)))
        schema = {f.name: f.dataType for f in sdf.schema.fields}
        out_cols, queue = [], [(c, F.col(c), schema[c]) for c in sdf.columns]
        while queue:
            name, col, dtype = queue.pop(0)
            if name in filter_columns and isinstance(dtype, StructType):
                children = []
                for fld in dtype.fields:
                    child_name = f"{name}{join_char}{fld.name}"
                    if recursive:
                        filter_columns.add(child_name)
                    children.append((child_name, col.getField(fld.name), fld.dataType))
                queue = children + queue
            else:
                out_cols.append(col.alias(name))
        return self.df._wrap_rows(sdf.select(*out_cols))


class JsonAccessor:
    """expr.js — JSON-string column operations (no reference equivalent;
    training pipelines constantly parse JSON metadata).  All methods are
    built-in Column expressions (get_json_object / json_tuple family) —
    scan-speed, no UDF."""

    def __init__(self, expr):
        self.expr = expr

    def _w(self, col):
        return type(self.expr)(self.expr.df, col)

    def get(self, path: str):
        """Extract by JSONPath; bare keys get '$.' prefixed.  Returns a
        string expression (cast as needed)."""
        p = path if path.startswith("$") else f"$.{path}"
        return self._w(F.get_json_object(self.expr.col, p))

    def __getitem__(self, path):
        return self.get(path)

    def keys(self):
        """Top-level object keys as array<string>."""
        return self._w(F.json_object_keys(self.expr.col))

    def array_length(self, path: str | None = None):
        c = self.expr.col if path is None else F.get_json_object(
            self.expr.col, path if path.startswith("$") else f"$.{path}")
        return self._w(F.json_array_length(c))

    def parse(self, schema: str):
        """Parse to a typed struct with an explicit DDL schema
        (from_json) — the scale path when many fields are read."""
        return self._w(F.from_json(self.expr.col, schema))

    def is_valid(self):
        return self._w(F.try_parse_json(self.expr.col).isNotNull())
