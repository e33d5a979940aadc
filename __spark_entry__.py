"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in ``osm_data_classification_spark``;
this module is a thin adapter over its operator catalog.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship spatial-join + tiling query on sf0.001 (SURVEY.md §3.2):
    pages → geocode → H3-style cell encode → point-in-polygon join vs
    broadcast boundary index → per-tile feature vectors. The
    day-of-week histogram is flattened to a '|'-joined string at this
    driver boundary — pandas canonicalization of array columns crashes
    (round-1 lesson)."""
    from pyspark.sql import functions as F

    from osm_data_classification_spark.jobs_api import flagship

    df = flagship(spark, SF0001)
    return df.withColumn(
        "activity_hist", F.array_join(F.col("activity_hist").cast("array<string>"), "|")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osm_data_classification_spark.catalog import full_catalog

    return {name: spec.fn for name, spec in full_catalog().items()}


def oracle_sql() -> dict[str, str]:
    from osm_data_classification_spark.catalog import full_catalog

    return {
        name: spec.sql for name, spec in full_catalog().items() if spec.sql is not None
    }
