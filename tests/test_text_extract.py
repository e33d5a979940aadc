"""S4 invariant gate: extracted text is byte-identical per url across
crawls and matches the source text column exactly (BASELINE.json:6,15)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_data_classification_spark.operators.skew_queries import (
    extract_text,
    pages_text_extract,
)
from osm_data_classification_spark.sources.pages import synth_pages


def test_extraction_matches_source_bytes(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    ext = extract_text(pages)
    joined = ext.join(
        pages.select("url", "warc_ts", "text"), ["url", "warc_ts"]
    )
    n_bad = joined.filter(F.col("extracted") != F.col("text")).count()
    assert n_bad == 0
    assert ext.count() == pages.count()


def test_byte_identity_per_url(spark, sf_dir):
    out = pages_text_extract(spark, sf_dir)
    assert out.filter(~F.col("identical")).count() == 0
    # crawl chains exist (every 5th page: 2-5 crawls)
    assert out.filter(F.col("n_crawls") > 1).count() > 0


def test_extractor_handles_malformed_html(spark):
    pages = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00", bytearray(b"no body tags here")),
            ("u2", "2024-01-01 00:00:00", bytearray(b"<html><body></body></html>")),
            ("u3", "2024-01-01 00:00:00", bytearray(b"\xff\xfe garbage <body>x</body>")),
        ],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    rows = {r["url"]: r["extracted"] for r in extract_text(pages).collect()}
    assert rows["u1"] == ""
    assert rows["u2"] == ""
    assert rows["u3"] == "x"
