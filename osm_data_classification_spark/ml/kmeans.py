"""Distributed KMeans (SURVEY.md §2 A11).

The reference runs sklearn KMeans (elbow-selected k) on PCA
coordinates `[U: upstream analysis KMeans]`. Distributed shape: the
centers (k×p, tiny) broadcast each iteration; assignment is a
vectorized pandas-UDF argmin; the center update is a single
`groupBy(cluster)` over exploded dims — partial aggregation keeps the
shuffle at k·p rows regardless of input size. Driver loop over
iterations is the standard Spark pattern (MLlib does the same); the
per-iteration driver payload is k·p doubles.

Determinism: init = first k rows by id order (seedless and stable
across partitionings); ties in argmin break toward the lower cluster
index (numpy argmin semantics, mirrored in the test oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _assign_udf(spark, centers: np.ndarray):
    bc = spark.sparkContext.broadcast(centers)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        c = bc.value
        x = np.vstack(v.to_numpy())
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
        d = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return assign


def kmeans_fit(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "features",
    id_col: str = "id",
    max_iter: int = 20,
) -> dict:
    """Lloyd iterations; returns {centers, inertia, iterations}.
    Converges early when centers move < 1e-12."""
    spark = df.sparkSession
    data = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    data.persist()
    try:
        init_rows = data.orderBy("id").limit(k).collect()
        centers = np.array([r["v"] for r in init_rows])
        n_iter = 0
        for n_iter in range(1, max_iter + 1):
            assign = _assign_udf(spark, centers)
            assigned = data.withColumn("cluster", assign("v"))
            stats = (
                assigned.select(
                    "cluster", F.posexplode("v").alias("dim", "x")
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new_centers = centers.copy()
            dim = centers.shape[1]
            sums = np.zeros((k, dim))
            counts = np.zeros(k)
            for r in stats:
                sums[r["cluster"], r["dim"]] = r["s"]
                counts[r["cluster"]] = r["n"]
            nonempty = counts > 0
            new_centers[nonempty] = sums[nonempty] / counts[nonempty, None]
            shift = float(np.max(np.abs(new_centers - centers)))
            centers = new_centers
            if shift < 1e-12:
                break
        assign = _assign_udf(spark, centers)
        inertia_df = data.withColumn("cluster", assign("v"))
        bc = spark.sparkContext.broadcast(centers)

        @pandas_udf("double")
        def sqdist(v: pd.Series, c: pd.Series) -> pd.Series:
            cent = bc.value
            x = np.vstack(v.to_numpy())
            cc = cent[c.to_numpy()]
            return pd.Series(((x - cc) ** 2).sum(axis=1))

        inertia = (
            inertia_df.select(sqdist("v", "cluster").alias("d")).agg(F.sum("d")).first()[0]
        )
        return {"centers": centers, "inertia": float(inertia), "iterations": n_iter}
    finally:
        data.unpersist()


def kmeans_assign_df(
    df: DataFrame, centers: np.ndarray, vec_col: str = "features", out_col: str = "cluster"
) -> DataFrame:
    assign = _assign_udf(df.sparkSession, centers)
    return df.withColumn(out_col, assign(F.col(vec_col).cast("array<double>")))


def elbow_inertia(df: DataFrame, ks: list[int], **kw) -> dict[int, float]:
    """Inertia per k — the reference's elbow-method input `[U]`."""
    return {k: kmeans_fit(df, k=k, **kw)["inertia"] for k in ks}
