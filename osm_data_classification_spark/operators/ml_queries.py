"""Catalog entries for the classification chain (SURVEY.md §2 A10/A11).

PCA and KMeans are iterative/eigendecomposition algorithms — not
SQL-expressible — so these are rows-only entries for the driver; the
real correctness gates are tests/test_ml.py (numpy-oracle parity on
sufficient statistics, reconstruction error, fixed-seed label parity)
per SURVEY.md §5.2 L1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..ml import kmeans_assign_df, kmeans_fit, pca_fit, pca_project_df
from .relational import QuerySpec

CATALOG: dict[str, QuerySpec] = {}


def _register(name: str, sql=None):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn, sql)
        return fn

    return deco


@_register("pca_project")  # rows-only (eigendecomposition)
def pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: PCA over the embeddings table — distributed sufficient
    statistics, driver eigh, broadcast projection to 2 components."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, vec_col="embedding", q=2)
    out = pca_project_df(emb, model, vec_col="embedding")
    return out.select(
        "vec_id",
        F.round(F.element_at("pc", 1), 6).alias("pc1"),
        F.round(F.element_at("pc", 2), 6).alias("pc2"),
    )


@_register("kmeans_assign")  # rows-only (iterative)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: KMeans (k=5, deterministic first-k init) over embeddings;
    returns per-vector cluster labels."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=5, vec_col="embedding", id_col="vec_id")
    return kmeans_assign_df(emb, model["centers"], vec_col="embedding").select(
        "vec_id", "cluster"
    )


@_register("kmeans_elbow")  # rows-only (iterative)
def kmeans_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11's k-selection input: inertia per k (the reference picks k at
    the elbow `[U: upstream analysis KMeans]`)."""
    from ..ml.kmeans import elbow_inertia

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = elbow_inertia(
        emb, ks=[2, 3, 4, 5], vec_col="embedding", id_col="vec_id", max_iter=8
    )
    rows = [(k, float(round(v, 6))) for k, v in sorted(pairs.items())]
    return spark.createDataFrame(rows, "k int, inertia double")
