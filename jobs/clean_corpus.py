"""Training-corpus cleaning job: the canonical pre-training pipeline
as one spark-submit entry point.

    spark-submit --py-files engine.zip jobs/clean_corpus.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/clean_corpus

Stages: quality filter (text.py score) → exact dedup → MinHash near-dup
clusters (connected components) → keep each cluster's canonical doc →
write the cleaned corpus + per-partition lineage.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from osm_data_classification_spark.io import checkpoint_write, load_table  # noqa: E402
from osm_data_classification_spark.operators import dedup, text  # noqa: E402
from osm_data_classification_spark.operators.components import (  # noqa: E402
    connected_components,
)
from osm_data_classification_spark.session import get_spark  # noqa: E402

MIN_QUALITY_X1000 = 500


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="/tmp/clean_corpus")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("clean-corpus", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    from tools.package import build

    spark.sparkContext.addPyFile(build("/tmp/engine_clean.zip"))
    t0 = time.perf_counter()

    docs = load_table(spark, args.sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate
    quality = text.text_quality_score(spark, args.sf_dir).select(
        "doc_id", "quality_x1000"
    )
    kept = docs.join(
        quality.filter(F.col("quality_x1000") >= MIN_QUALITY_X1000), "doc_id"
    )
    n1 = kept.count()

    # 2. exact dedup (md5 fingerprint, min doc_id survives)
    fp = kept.select("doc_id", F.md5("text").alias("fp"))
    canon_exact = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = kept.join(canon_exact.select("doc_id"), "doc_id", "left_semi")
    n2 = kept.count()

    # 3. near-dup clusters → canonical survivor per cluster
    sh = dedup.shingles(dedup.spread(kept.select("doc_id", "text"))).distinct().persist()
    pairs = dedup._jaccard_pairs(sh).filter(
        F.col("jaccard_x1000") >= dedup.JACCARD_THRESH
    )
    comp = connected_components(pairs.select("da", "db"), "da", "db")
    survivors = (
        kept.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("cluster", F.coalesce("comp", F.col("doc_id")))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("cluster").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .drop("comp", "cluster", "rn")
    )
    n3 = survivors.count()

    checkpoint_write(survivors, args.out)
    dt = time.perf_counter() - t0
    print(
        f"clean_corpus: {n0} docs -> quality {n1} -> exact-dedup {n2} "
        f"-> near-dedup {n3} in {dt:.1f}s; wrote {args.out}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
