"""Training-prep operators (training_prep.py) vs independent
python/pandas oracles — the DuckDB gate checks the values; these pin
the kernels against a second formulation so twin bugs can't hide."""

from __future__ import annotations

import hashlib

from osm_data_classification_spark.operators.training_prep import (
    CHUNK,
    CTX,
    PACK_BUCKET,
    STRIDE,
    sample_pack_sequences,
    text_chunk_tokens,
)


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )


def test_chunking_matches_python_oracle(spark, sf_dir):
    got = {}
    for r in text_chunk_tokens(spark, sf_dir).collect():
        got[(r["doc_id"], r["chunk_id"])] = (r["chunk_len"], r["chunk_md5"])
    pdf = _docs(spark, sf_dir)
    n_expected = 0
    saw_short = saw_overlap = False
    for _, row in pdf.iterrows():
        toks = row.text.strip().split()
        n_chunks = (len(toks) + STRIDE - 1) // STRIDE
        n_expected += n_chunks
        for i in range(n_chunks):
            c = toks[i * STRIDE : i * STRIDE + CHUNK]
            md5 = hashlib.md5(" ".join(c).encode()).hexdigest()
            assert got[(row.doc_id, i)] == (len(c), md5), (row.doc_id, i)
            saw_short = saw_short or len(c) < CHUNK
        saw_overlap = saw_overlap or n_chunks > 1
    assert len(got) == n_expected
    # the corpus must exercise both the partial trailing chunk and
    # the multi-chunk overlap path
    assert saw_short and saw_overlap


def test_packing_matches_single_window_oracle(spark, sf_dir):
    """The distributed two-level prefix sum must equal the one-line
    global-window formulation — and the test sf must span multiple
    buckets, or the bucket-offset join was never exercised."""
    pdf = _docs(spark, sf_dir)
    pdf["n"] = pdf.text.str.strip().str.split().str.len()
    pdf["start"] = pdf.n.cumsum() - pdf.n
    assert pdf.doc_id.max() // PACK_BUCKET >= 2, "need >= 3 buckets"
    got = {
        r["doc_id"]: r for r in sample_pack_sequences(spark, sf_dir).collect()
    }
    assert len(got) == len(pdf)
    multi_pack = False
    for _, row in pdf.iterrows():
        g = got[row.doc_id]
        assert g["n_tokens"] == row.n
        assert g["start_tok"] == row.start
        assert g["pack_id"] == row.start // CTX
        assert g["pack_offset"] == row.start % CTX
        multi_pack = multi_pack or g["pack_id"] > 0
    assert multi_pack
    # packs are dense: every pack id up to the max must be hit by some
    # doc start or be fully covered by a long document spanning it
    total = int(pdf.n.sum())
    assert max(g["pack_id"] for g in got.values()) == (total - int(pdf.n.iloc[-1])) // CTX


def test_packing_windows_are_bucket_partitioned(spark, sf_dir):
    """Scale gate: the corpus-sized window must partition on bucket
    (hash exchange), never run the whole table through a single
    partition — only the tiny bucket-totals window may be global."""
    from osm_data_classification_spark.plans import audit

    df = sample_pack_sequences(spark, sf_dir)
    plan = audit.formatted_plan(df)
    # exactly one SinglePartition exchange (the bucket-totals level)
    assert plan.count("SinglePartition") == 1, plan
    assert "hashpartitioning(bucket" in plan, plan


# ---------------------------------------------------------------------------
# temperature mixing weights
# ---------------------------------------------------------------------------


def test_mix_weights_match_python_oracle(spark, sf_dir):
    """sample_mix_weights vs an independent pandas/math derivation,
    plus the semantic invariant: the head language is downsampled by
    the sqrt temperature, at least one tail language is upsampled,
    and the ppm weights sum to <= 1e6 (floor division)."""
    import math

    from osm_data_classification_spark.operators.training_prep import (
        sample_mix_weights,
    )

    rows = {r["lang"]: r for r in sample_mix_weights(spark, sf_dir).collect()}
    pdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    n = pdf.groupby("lang").size().to_dict()
    toks = (
        pdf.assign(nt=pdf.text.str.strip().str.split().str.len())
        .groupby("lang")["nt"]
        .sum()
        .to_dict()
    )
    sq = {k: math.floor(math.sqrt(v)) for k, v in n.items()}
    tot_sq, tot_n = sum(sq.values()), sum(n.values())
    assert set(rows) == set(n)
    for lang, r in rows.items():
        assert r["n_docs"] == n[lang]
        assert r["n_tokens"] == toks[lang]
        assert r["sqrt_docs"] == sq[lang]
        assert r["w_ppm"] == 1_000_000 * sq[lang] // tot_sq
        assert r["prop_ppm"] == 1_000_000 * n[lang] // tot_n
        assert r["upsampled"] == (r["w_ppm"] > r["prop_ppm"])
    head = max(rows.values(), key=lambda r: r["n_docs"])
    assert not head["upsampled"]
    assert any(r["upsampled"] for r in rows.values())
    assert sum(r["w_ppm"] for r in rows.values()) <= 1_000_000


def test_mix_apply_moves_shares_toward_temperature(spark, sf_dir):
    """curate_mix_apply's semantic contract: the head language's kept
    share shrinks toward its temperature share, tail languages keep
    everything (rate capped at 1e6), and every kept set is exactly the
    portable-hash threshold set (independent python re-derivation)."""
    import math

    from osm_data_classification_spark.operators.training_prep import (
        curate_mix_apply,
    )

    rows = {r["lang"]: r for r in curate_mix_apply(spark, sf_dir).collect()}
    pdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .toPandas()
    )
    n = pdf.groupby("lang").size().to_dict()
    sq = {k: math.floor(math.sqrt(v)) for k, v in n.items()}
    tot_sq, tot_n = sum(sq.values()), sum(n.values())

    def keep_ppm(lang):
        return min(1_000_000, 1_000_000 * sq[lang] * tot_n // (tot_sq * n[lang]))

    def phash(v: int) -> int:
        import hashlib

        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    head = max(n, key=n.get)
    assert rows[head]["keep_ppm"] < 1_000_000
    assert any(rows[l]["keep_ppm"] == 1_000_000 for l in n if l != head)
    for lang, r in rows.items():
        assert r["n_in"] == n[lang]
        assert r["keep_ppm"] == keep_ppm(lang)
        kept = [
            int(d)
            for d, lg in zip(pdf.doc_id, pdf.lang)
            if lg == lang and phash(int(d)) % 1_000_000 < keep_ppm(lang)
        ]
        assert r["n_kept"] == len(kept)
        assert r["sum_kept_doc_id"] == sum(kept)
