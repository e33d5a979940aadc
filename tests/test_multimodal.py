"""Multimodal plumbing: Spark-side schema/batching vs the
single-threaded stub oracle; the decode stub's NotImplemented gate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_data_classification_spark.io import load_table
from osm_data_classification_spark.operators import multimodal as mm


def test_decode_stub_rejects_real_media():
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"\xff\xd8\xff\xe0JFIF")


def test_decode_stub_deterministic():
    a = mm.decode_stub(b"hello world payload")
    b = mm.decode_stub(b"hello world payload")
    assert a == b
    assert len(a["features"]) == mm.N_FEATURES
    assert all(0.0 <= f < 1.0 for f in a["features"])


def test_extract_features_matches_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in mm.extract_features(docs).collect()
    }
    src = {r["doc_id"]: bytes(r["payload"]) for r in docs.collect()}
    assert set(got) == set(src)
    for doc_id, payload in src.items():
        exp = mm.decode_stub(payload)
        row = got[doc_id]
        assert row["n_bytes"] == len(payload)
        assert row["width"] == exp["width"] and row["height"] == exp["height"]
        assert row["features"] == pytest.approx(exp["features"])


def test_frame_sampling_matches_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    got: dict[tuple, str] = {
        (r["doc_id"], r["frame_idx"]): r["frame_md5"]
        for r in mm.sample_frames(docs).collect()
    }
    src = {r["doc_id"]: bytes(r["payload"]) for r in docs.collect()}
    n_expected = 0
    for doc_id, payload in src.items():
        n_frames = max(1, len(payload) // mm.FRAME_BYTES)
        take = min(mm.MAX_FRAMES, n_frames)
        n_expected += take
        for j in range(take):
            fi = (j * n_frames) // take
            chunk = payload[fi * mm.FRAME_BYTES : (fi + 1) * mm.FRAME_BYTES]
            assert got[(doc_id, fi)] == hashlib.md5(chunk).hexdigest()
    assert len(got) == n_expected


def test_partitioning_invariance(spark, sf_dir):
    """Same features regardless of partition count — the mapInPandas
    kernel is stateless per row (SURVEY.md §5.2 L4)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    one = mm.extract_features(docs.coalesce(1)).orderBy("doc_id").collect()
    many = mm.extract_features(docs.repartition(16)).orderBy("doc_id").collect()
    assert one == many


def test_frames_oracle_ascii_precondition(spark, sf_dir):
    """The mm_frame_sample DuckDB oracle slices VARCHAR (DuckDB 1.0 has
    no BLOB substring), which equals the Spark kernel's byte slicing
    only when the payload is pure ASCII — assert that precondition on
    the actual input."""
    from pyspark.sql import functions as F

    from osm_data_classification_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    bad = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert bad == 0
