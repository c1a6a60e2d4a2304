"""ML transformers: fit -> virtual-column emitters (Spark-first port of
vaex-ml/vaex/ml/transformations.py:51-1280).

Design: ``fit`` runs ONE distributed aggregation collecting the (small)
fitted state to the driver; ``transform`` adds virtual columns — pure
Column expressions over literals, zero Python in the hot path.  State is
a plain dict (``state_get``/``state_set``) so fitted pipelines serialize
like the reference's HasState traitlets.

Naming follows the reference prefixes exactly
(``standard_scaled_<col>``, ``minmax_scaled_``, ``absmax_scaled_``,
``robust_scaled_``, ``label_encoded_``, ``frequency_encoded_``,
``PCA_<i>``, one-hot ``<col>_<value>``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


class Transformer:
    """transformations.py:33 parity — fit / transform / fit_transform /
    state roundtrip."""

    prefix = ""
    _state_keys: tuple = ()

    def __init__(self, features, prefix: str | None = None):
        self.features = [features] if isinstance(features, str) else list(features)
        if prefix is not None:
            self.prefix = prefix

    def fit(self, df):
        raise NotImplementedError

    def transform(self, df):
        raise NotImplementedError

    def fit_transform(self, df):
        self.fit(df)
        return self.transform(df)

    def state_get(self) -> dict:
        return {"features": list(self.features), "prefix": self.prefix,
                **{k: getattr(self, k) for k in self._state_keys}}

    def state_set(self, state: dict) -> None:
        self.features = list(state["features"])
        self.prefix = state["prefix"]
        for k in self._state_keys:
            setattr(self, k, state[k])


class StandardScaler(Transformer):
    """transformations.py:582 — (x - mean) / std (population std)."""

    prefix = "standard_scaled_"
    _state_keys = ("mean_", "std_")

    def __init__(self, features, with_mean=True, with_std=True, prefix=None):
        super().__init__(features, prefix)
        self.with_mean, self.with_std = with_mean, with_std
        self.mean_: dict = {}
        self.std_: dict = {}

    def fit(self, df):
        aggs = []
        for f in self.features:
            c = df._to_expr(f).col
            aggs += [F.avg(c).alias(f"{f}__m"), F.stddev_pop(c).alias(f"{f}__s")]
        row = df._spark_df().agg(*aggs).collect()[0]
        self.mean_ = {f: float(row[f"{f}__m"]) for f in self.features}
        self.std_ = {f: float(row[f"{f}__s"]) for f in self.features}

    def transform(self, df):
        out = df._copy()
        for f in self.features:
            c = df._to_expr(f).col.cast("double")
            if self.with_mean:
                c = c - self.mean_[f]
            if self.with_std:
                c = c / self.std_[f]
            out[self.prefix + f] = c
        return out


class MinMaxScaler(Transformer):
    """transformations.py:653 — scale into feature_range."""

    prefix = "minmax_scaled_"
    _state_keys = ("min_", "max_", "feature_range")

    def __init__(self, features, feature_range=(0.0, 1.0), prefix=None):
        super().__init__(features, prefix)
        self.feature_range = tuple(feature_range)
        self.min_: dict = {}
        self.max_: dict = {}

    def fit(self, df):
        aggs = []
        for f in self.features:
            c = df._to_expr(f).col
            aggs += [F.min(c).alias(f"{f}__lo"), F.max(c).alias(f"{f}__hi")]
        row = df._spark_df().agg(*aggs).collect()[0]
        self.min_ = {f: float(row[f"{f}__lo"]) for f in self.features}
        self.max_ = {f: float(row[f"{f}__hi"]) for f in self.features}

    def transform(self, df):
        out = df._copy()
        lo, hi = self.feature_range
        for f in self.features:
            c = df._to_expr(f).col.cast("double")
            span = self.max_[f] - self.min_[f]
            out[self.prefix + f] = F.lit(lo) + (hi - lo) * (c - self.min_[f]) / span
        return out


class MaxAbsScaler(Transformer):
    """transformations.py:726 — x / max(|x|)."""

    prefix = "absmax_scaled_"
    _state_keys = ("absmax_",)

    def __init__(self, features, prefix=None):
        super().__init__(features, prefix)
        self.absmax_: dict = {}

    def fit(self, df):
        aggs = [F.max(F.abs(df._to_expr(f).col)).alias(f) for f in self.features]
        row = df._spark_df().agg(*aggs).collect()[0]
        self.absmax_ = {f: float(row[f]) for f in self.features}

    def transform(self, df):
        out = df._copy()
        for f in self.features:
            out[self.prefix + f] = df._to_expr(f).col.cast("double") / self.absmax_[f]
        return out


class RobustScaler(Transformer):
    """transformations.py:784 — (x - median) / IQR via approx percentiles
    (the reference also uses approximate percentiles_)."""

    prefix = "robust_scaled_"
    _state_keys = ("center_", "scale_", "percentile_range")

    def __init__(self, features, with_centering=True, with_scaling=True,
                 percentile_range=(25.0, 75.0), prefix=None):
        super().__init__(features, prefix)
        self.with_centering, self.with_scaling = with_centering, with_scaling
        self.percentile_range = tuple(percentile_range)
        self.center_: dict = {}
        self.scale_: dict = {}

    def fit(self, df):
        lo_p, hi_p = self.percentile_range
        aggs = []
        for f in self.features:
            c = df._to_expr(f).col
            aggs.append(F.percentile_approx(
                c, [lo_p / 100.0, 0.5, hi_p / 100.0], 10000).alias(f))
        row = df._spark_df().agg(*aggs).collect()[0]
        for f in self.features:
            lo, med, hi = [float(v) for v in row[f]]
            self.center_[f] = med
            self.scale_[f] = hi - lo

    def transform(self, df):
        out = df._copy()
        for f in self.features:
            c = df._to_expr(f).col.cast("double")
            if self.with_centering:
                c = c - self.center_[f]
            if self.with_scaling:
                c = c / self.scale_[f]
            out[self.prefix + f] = c
        return out


class LabelEncoder(Transformer):
    """transformations.py:302 — codes 0..n-1 by sorted label order;
    unseen -> -1 when allow_unseen else null (error surfaces on use)."""

    prefix = "label_encoded_"
    _state_keys = ("labels_", "allow_unseen")

    def __init__(self, features, allow_unseen=False, prefix=None):
        super().__init__(features, prefix)
        self.allow_unseen = allow_unseen
        self.labels_: dict = {}

    def fit(self, df):
        for f in self.features:
            vals = [v for v in df.unique(f) if v is not None]
            self.labels_[f] = {v: i for i, v in enumerate(sorted(vals))}

    def transform(self, df):
        out = df._copy()
        for f in self.features:
            c = df._to_expr(f).col
            labels = self.labels_[f]
            arr = F.array(*[F.lit(v) for v in labels])
            code = (F.array_position(arr, c) - 1).cast("int")
            if self.allow_unseen:
                code = F.when(code >= 0, code).otherwise(F.lit(-1))
            else:
                code = F.when(code >= 0, code)  # unseen -> null
            out[self.prefix + f] = code
        return out


class FrequencyEncoder(Transformer):
    """transformations.py:523 — value -> relative frequency.  The fit is
    a value_counts per feature; transform is a literal-map lookup (the
    mapping is category-sized)."""

    prefix = "frequency_encoded_"
    _state_keys = ("mappings_", "unseen")

    def __init__(self, features, unseen="nan", prefix=None):
        super().__init__(features, prefix)
        self.unseen = unseen
        self.mappings_: dict = {}

    def fit(self, df):
        n = df._spark_df().count()
        for f in self.features:
            rows = (df._spark_df().groupBy(df._to_expr(f).col.alias("_v"))
                    .count().collect())
            self.mappings_[f] = {r["_v"]: r["count"] / n for r in rows if r["_v"] is not None}

    def transform(self, df):
        out = df._copy()
        default = {"zero": 0.0, "nan": float("nan")}[self.unseen]
        for f in self.features:
            c = df._to_expr(f).col
            m = self.mappings_[f]
            expr = F.lit(default)
            mapping = F.map_from_arrays(
                F.array(*[F.lit(k) for k in m]),
                F.array(*[F.lit(float(v)) for v in m.values()]))
            expr = F.coalesce(F.element_at(mapping, c), F.lit(default))
            out[self.prefix + f] = expr
        return out


class OneHotEncoder(Transformer):
    """transformations.py:366 — one indicator column per seen value,
    named <prefix><feature>_<value>."""

    prefix = ""
    _state_keys = ("uniques_", "one", "zero")

    def __init__(self, features, one=1, zero=0, prefix=None):
        super().__init__(features, prefix)
        self.one, self.zero = one, zero
        self.uniques_: dict = {}

    def fit(self, df):
        for f in self.features:
            vals = [v for v in df.unique(f) if v is not None]
            self.uniques_[f] = sorted(vals)

    def transform(self, df):
        out = df._copy()
        for f in self.features:
            c = df._to_expr(f).col
            for v in self.uniques_[f]:
                name = f"{self.prefix}{f}_{v}"
                out[name] = F.when(c == F.lit(v), F.lit(self.one)).otherwise(F.lit(self.zero))
        return out


class PCA(Transformer):
    """transformations.py:51 — principal components.  The covariance
    matrix is computed DISTRIBUTED (one aggregation of second moments,
    df.cov); only the d x d eigendecomposition runs on the driver —
    exactly the split that scales (d is small, n is huge)."""

    prefix = "PCA_"
    _state_keys = ("means_", "eigen_vectors_", "eigen_values_", "n_components")

    def __init__(self, features, n_components=None, prefix=None):
        super().__init__(features, prefix)
        self.n_components = n_components or len(self.features)
        self.means_: list = []
        self.eigen_vectors_: list = []
        self.eigen_values_: list = []

    def fit(self, df):
        cov = np.asarray(df.cov(self.features), dtype="float64")
        aggs = [F.avg(df._to_expr(f).col).alias(f) for f in self.features]
        row = df._spark_df().agg(*aggs).collect()[0]
        self.means_ = [float(row[f]) for f in self.features]
        eigvals, eigvecs = np.linalg.eigh(cov)
        order = np.argsort(eigvals)[::-1]
        self.eigen_values_ = eigvals[order].tolist()
        self.eigen_vectors_ = eigvecs[:, order].tolist()  # columns = components
    def transform(self, df, n_components=None):
        k = n_components or self.n_components
        out = df._copy()
        V = np.asarray(self.eigen_vectors_)
        centered = [df._to_expr(f).col.cast("double") - self.means_[i]
                    for i, f in enumerate(self.features)]
        for comp in range(k):
            expr = None
            for i in range(len(self.features)):
                term = centered[i] * float(V[i, comp])
                expr = term if expr is None else expr + term
            out[f"{self.prefix}{comp}"] = expr
        return out
