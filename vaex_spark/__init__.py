"""vaex_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vaexio/vaex.

Design (SURVEY.md §7): a thin lazy DataFrame façade over pyspark.sql.
Expressions compile to Catalyst Column trees; statistics compile to
(conditional) aggregates; binby compiles to groupBy-on-computed-bins;
everything heavy runs JVM-side in whole-stage codegen.  Beyond-parity
modules: Structured Streaming surface (:mod:`vaex_spark.streaming`) and
large-scale training-data ops (:mod:`vaex_spark.datapipe` — dedup,
similarity search, text analysis, multimodal plumbing).
"""

from . import agg  # noqa: F401
from . import ml  # noqa: F401
from .dataframe import DataFrame  # noqa: F401
from .expression import Expression  # noqa: F401
from .functions import register_function, registry  # noqa: F401
from .groupby import Binner, BinnerTime, GrouperLimited, RowLimitException  # noqa: F401
from .session import get_session  # noqa: F401
from .sources import (  # noqa: F401
    connect,
    example,
    from_arrays,
    from_arrow_table,
    from_ascii,
    from_csv,
    from_csv_arrow,
    from_dict,
    from_items,
    from_json,
    from_pandas,
    from_records,
    from_scalars,
    open,
    open_many,
    vconstant,
    vrange,
)

__version__ = "0.1.0"


def concat(dfs, resolver="flexible"):
    """vaex.concat (reference __init__.py:819)."""
    first, *rest = dfs
    return first.concat(*rest, resolver=resolver)
