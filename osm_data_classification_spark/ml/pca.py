"""Distributed PCA (SURVEY.md §2 A10).

The reference runs sklearn PCA on the normalized per-user feature
matrix `[U: upstream analysis PCA]`. Distributed shape: sufficient
statistics (n, Σx, XᵀX) are accumulated per partition behind an
Arrow-batched `mapInPandas` (one dim×dim matrix per partition — the
only driver-bound data), combined on the driver, eigendecomposed with
numpy, and the component matrix is broadcast back for the projection
pandas UDF. No row-level data ever reaches the driver, so the same
code runs at 10^9 rows: the reduce payload is p² per partition,
independent of row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _suffstats(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum, XtX) via per-partition partial aggregation."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty input")
    dim = first["d"]

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        xtx = np.zeros((dim, dim))
        for pdf in batches:
            x = np.vstack(pdf["v"].to_numpy())
            n += x.shape[0]
            s += x.sum(axis=0)
            xtx += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
            )

    parts = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(partials, "n long, s array<double>, xtx array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    xtx = np.sum([np.array(r["xtx"]).reshape(dim, dim) for r in parts], axis=0)
    return n, s, xtx


def pca_fit(df: DataFrame, vec_col: str = "features", q: int = 2) -> dict:
    """Fit: returns {mean, components (q×p), explained_var} — the
    driver-side eigh is O(p³), p = feature count (tiny)."""
    n, s, xtx = _suffstats(df, vec_col)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:q]
    comps = evecs[:, order].T  # q × p
    # deterministic sign: largest-|coefficient| entry of each component >= 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_var": evals[order],
        "n": n,
    }


def pca_project_df(
    df: DataFrame, model: dict, vec_col: str = "features", out_col: str = "pc"
) -> DataFrame:
    """Project rows onto the fitted components — one scalar pandas UDF
    (numpy matmul per Arrow batch), model ships via closure broadcast."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {"mean": model["mean"], "components": model["components"]}
    )

    @pandas_udf("array<double>")
    def project(v: pd.Series) -> pd.Series:
        m = bc.value
        x = np.vstack(v.to_numpy()) - m["mean"]
        out = x @ m["components"].T
        return pd.Series(list(out))

    return df.withColumn(out_col, project(F.col(vec_col).cast("array<double>")))
