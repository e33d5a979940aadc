"""Catalog entries for the geo operators (SURVEY.md §2 J5/J6/J9/A7/A8).

DuckDB cannot express the cell/PIP/kNN kernels, so these are rows-only
entries for the driver (__spark_entry__.py:35–36); their real
correctness gates are the L1/L3 pytest suites (tests/test_geo_spark.py)
which compare against the single-threaded numpy oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cells import cell_encode_col
from ..io import lineage_rows
from ..operators.geo_ops import (
    knn_auto_res,
    knn_join,
    pip_join,
    tile_aggregate,
    tile_ladder,
)
from ..operators.relational import QuerySpec
from ..sources.boundaries import packed_boundaries
from ..sources.pages import geocoded_pages

CATALOG: dict[str, QuerySpec] = {}


def _register(name: str, sql=None):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn, sql)
        return fn

    return deco


@_register("geo_cell_encode")
def geo_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 geo scalars: batched cell encoding at res 5–12 over the
    geocoded pages — one JVM-side expression per resolution, single
    pass (BASELINE.json:6 'batched H3/S2 cell encoding')."""
    pages = geocoded_pages(spark, sf_dir, res=7)
    cols = [
        cell_encode_col(F.col("lon"), F.col("lat"), r).alias(f"cell_r{r}")
        for r in range(5, 13)
    ]
    return pages.select("url", "warc_ts", *cols)


@_register("geo_pip_join")
def geo_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: ray-cast PIP join, (url, boundary_id) assignment pairs."""
    pages = geocoded_pages(spark, sf_dir, res=7)
    packed = packed_boundaries(50)
    return pip_join(pages, packed, res=7).select("url", "warc_ts", "boundary_id")


@_register("geo_knn_join")
def geo_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: grid-partitioned kNN join — every page's 5 nearest distinct
    documents' locations (probe = candidate set here; self-match at
    rank 1 with dist 0 is part of the contract)."""
    pages = geocoded_pages(spark, sf_dir, res=6).dropDuplicates(["url"])
    pts = pages.select(
        F.xxhash64("url").alias("qid"), "lon", "lat"
    ).persist()
    res = knn_auto_res(pts.count(), k=5)
    return knn_join(pts, pts.withColumnRenamed("qid", "cid"), k=5, res=res)


@_register("geo_tile_agg")
def geo_tile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-tile contributor/edit-count feature vectors at res 7."""
    pages = geocoded_pages(spark, sf_dir, res=7).withColumn(
        "contributor", F.regexp_extract("url", r"site(\d+)", 1).cast("long")
    )
    return tile_aggregate(pages, res=7, cell_col="cell")


@_register("rollup_res_ladder")
def rollup_res_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: resolution ladder 9→5 by pure parent-cell arithmetic."""
    pages = geocoded_pages(spark, sf_dir, res=9).withColumn(
        "contributor", F.regexp_extract("url", r"site(\d+)", 1).cast("long")
    )
    tiles9 = tile_aggregate(pages, res=9, cell_col="cell")
    return tile_ladder(tiles9, 9, 5)


@_register("lineage_metrics")
def lineage_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: per-partition lineage rows (partition_id, input_rows,
    output_rows, cell_range, checksum) of the tile table
    (BASELINE.json:6)."""
    pages = geocoded_pages(spark, sf_dir, res=7).withColumn(
        "contributor", F.regexp_extract("url", r"site(\d+)", 1).cast("long")
    )
    tiles = tile_aggregate(pages, res=7, cell_col="cell").drop("activity_hist")
    return lineage_rows(tiles, cell_col="cell")
