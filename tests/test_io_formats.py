"""S2 interchange formats: CSV (the reference's luigi hand-off medium)
and JSON checkpoints round-trip with schema fidelity."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from osm_data_classification_spark.io import (
    load_table,
    read_csv_checkpoint,
    read_json_checkpoint,
    table_checksum,
    write_csv_checkpoint,
    write_json_checkpoint,
)


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="iofmt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_checkpoint_roundtrip_schema_and_values(spark, sf_dir, tmp):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    write_csv_checkpoint(ev, tmp)
    back = read_csv_checkpoint(spark, tmp)
    assert back.schema == ev.schema  # CSV alone is typeless; sidecar restores
    assert back.count() == ev.count()
    assert table_checksum(back.select("event_id", "user_id", "event_type")) == \
        table_checksum(ev.select("event_id", "user_id", "event_type"))


def test_json_checkpoint_roundtrip(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents")
    write_json_checkpoint(docs, tmp)
    back = read_json_checkpoint(
        spark, tmp, "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert back.count() == docs.count()
    assert table_checksum(back) == table_checksum(docs)


def test_upsert_merge_semantics(spark, sf_dir, tmp):
    from osm_data_classification_spark.io import upsert

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = ev.filter("event_id < 500")
    state1 = upsert(spark, base, tmp, keys=["event_id"])
    assert state1.count() == base.count()

    # updates (overlapping keys, new values) + inserts (new keys)
    updates = ev.filter("event_id >= 400 AND event_id < 600").withColumn(
        "value", F.col("value") + 1000.0
    )
    state2 = upsert(spark, updates, tmp, keys=["event_id"])
    assert state2.count() == 600  # 0..599, each key exactly once
    assert state2.select("event_id").distinct().count() == 600
    # overlapped keys carry the NEW values
    overlap = state2.filter("event_id >= 400 AND event_id < 500")
    assert overlap.filter(F.col("value") < 1000.0).count() == 0
    # untouched keys keep their old values
    untouched = state2.filter("event_id < 400")
    assert untouched.filter(F.col("value") >= 1000.0).count() == 0


def test_upsert_idempotent(spark, sf_dir, tmp):
    from osm_data_classification_spark.io import table_checksum, upsert

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    upsert(spark, ev, tmp, keys=["event_id"])
    a = table_checksum(spark.read.parquet(f"{tmp}/data"))
    upsert(spark, ev, tmp, keys=["event_id"])  # same rows again
    b = table_checksum(spark.read.parquet(f"{tmp}/data"))
    assert a == b
