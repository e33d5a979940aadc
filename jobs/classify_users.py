"""User-classification job: the reference analytics chain A3→A9→A10→A11
(SURVEY.md §3.3, §7 M5) as a spark-submit entry point.

Run::

    spark-submit --py-files engine.zip jobs/classify_users.py \
        --sf-dir /root/testdata/sf0.1 --k 4 --out /tmp/user_clusters

Chain: per-user feature matrix (events analog of the OSM history
features) → min-max normalization → PCA to q components → KMeans(k)
→ labeled users + centers. The reference runs this as
luigi→pandas→sklearn `[U: upstream analysis_tasks]`; here every stage
is a DataFrame program and the only driver-side math is the p×p eigh
and the k×p center update.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_data_classification_spark.io import load_table  # noqa: E402
from osm_data_classification_spark.ml import (  # noqa: E402
    kmeans_assign_df,
    kmeans_fit,
    pca_fit,
    pca_project_df,
)
from osm_data_classification_spark.session import get_spark  # noqa: E402

FEATURES = [
    "n_events",
    "n_days",
    "n_types",
    "total_value",
    "n_errors",
    "n_purchases",
    "events_per_day",
]


def user_features(spark, sf_dir):
    """A3 analog over the events table: one wide groupBy."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.countDistinct(F.to_date("ts")).cast("double").alias("n_days"),
        F.countDistinct("event_type").cast("double").alias("n_types"),
        F.sum("value").alias("total_value"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("double")
        .alias("n_errors"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("n_purchases"),
        (
            F.count(F.lit(1)) / F.countDistinct(F.to_date("ts"))
        ).alias("events_per_day"),
    )


def normalize(df, cols):
    """A9: global min-max → broadcast → (x-min)/(max-min)."""
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"max_{c}") - F.col(f"min_{c}")
        out = out.withColumn(
            c, F.when(rng > 0, (F.col(c) - F.col(f"min_{c}")) / rng).otherwise(0.0)
        )
    return out.select("user_id", *cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--q", type=int, default=3, help="PCA components")
    ap.add_argument("--out", default="")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("classify-users", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    from tools.package import build

    spark.sparkContext.addPyFile(build("/tmp/engine_classify.zip"))

    feats = user_features(spark, args.sf_dir)
    norm = normalize(feats, FEATURES)
    vecs = norm.select("user_id", F.array(*FEATURES).alias("features"))

    q = min(args.q, len(FEATURES))
    pca = pca_fit(vecs, vec_col="features", q=q)
    coords = pca_project_df(vecs, pca, vec_col="features", out_col="pc")

    model = kmeans_fit(coords, k=args.k, vec_col="pc", id_col="user_id")
    labeled = kmeans_assign_df(coords, model["centers"], vec_col="pc").select(
        "user_id", "cluster", "pc"
    )

    print(
        f"classified {labeled.count()} users into {args.k} clusters; "
        f"inertia={model['inertia']:.6f}; "
        f"explained_var={[round(v, 6) for v in pca['explained_var']]}"
    )
    sizes = labeled.groupBy("cluster").count().orderBy("cluster").collect()
    print("cluster sizes:", {r["cluster"]: r["count"] for r in sizes})
    if args.out:
        labeled.write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
