"""functions/geo_udfs.py parity: the Arrow-UDF family must equal the
JVM Column family value-for-value (SURVEY.md §2.8 geo scalars)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_data_classification_spark.functions.geo_udfs import (
    cell_encode_udf,
    cell_parent_udf,
    geocode_and_encode,
    geocode_udf,
)
from osm_data_classification_spark.geo.cells import cell_encode_col, cell_parent_col
from osm_data_classification_spark.sources.pages import geocode_cols, synth_pages


def test_cell_encode_udf_equals_jvm(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    lon, lat = geocode_cols(F.col("text"))
    df = pages.select("url", lon.alias("lon"), lat.alias("lat"))
    for res in (5, 9, 12):
        bad = (
            df.withColumn("jvm", cell_encode_col(F.col("lon"), F.col("lat"), res))
            .withColumn("py", cell_encode_udf(res)(F.col("lon"), F.col("lat")))
            .filter(F.col("jvm") != F.col("py"))
            .count()
        )
        assert bad == 0, f"res {res}"


def test_geocode_udf_equals_jvm(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    lon, lat = geocode_cols(F.col("text"))
    df = pages.select(
        lon.alias("jlon"),
        lat.alias("jlat"),
        geocode_udf(F.col("text")).alias("g"),
    )
    bad = df.filter(
        (F.col("jlon") != F.col("g.lon")) | (F.col("jlat") != F.col("g.lat"))
    ).count()
    assert bad == 0


def test_fused_geocode_encode(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    lon, lat = geocode_cols(F.col("text"))
    df = pages.select(
        cell_encode_col(lon, lat, 7).alias("jvm"),
        geocode_and_encode(F.col("text"), 7).alias("f"),
    )
    assert df.filter(F.col("jvm") != F.col("f.cell")).count() == 0


def test_cell_parent_udf_equals_jvm(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    lon, lat = geocode_cols(F.col("text"))
    df = pages.select(cell_encode_col(lon, lat, 10).alias("c10"))
    bad = (
        df.withColumn("jvm", cell_parent_col(F.col("c10"), 10, 6))
        .withColumn("py", cell_parent_udf(6)(F.col("c10")))
        .filter(F.col("jvm") != F.col("py"))
        .count()
    )
    assert bad == 0
