"""S2 interchange formats: CSV (the reference's luigi hand-off medium)
and JSON checkpoints round-trip with schema fidelity."""

from __future__ import annotations

import shutil
import tempfile

import pytest

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
