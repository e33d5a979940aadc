"""Assembles the full query catalog from every operator module.

One entry per operator row in SURVEY.md §2 (plus the training-data
pipeline ops). Import side effects populate each module's CATALOG.

ORDERING MATTERS: the driver evaluates only the first 50 catalog
entries against their DuckDB oracles (round-1 lesson — the geo/ref
oracles sat past position 49 and were never driver-graded). The
window is therefore allocated explicitly:

* the flagship geo value-oracles (PIP / kNN kernels, the bit-for-bit
  tile gate, the resolution ladder),
* the reference-analytics chain (element/changeset/user metadata,
  editor top-K),
* every query that failed or errored in round 1 (now fixed),
* every full oracle the round-1 window never reached,
* one representative per remaining SURVEY §2 row (round-1 green).

Redundant variants (anti of a checked semi, second scalar families,
the sliding twin of checked tumbling/session windows) and rows-only
entries sit past position 50 — their pytest gates in tests/ remain
the correctness signal.
"""

from __future__ import annotations

from .operators.relational import CATALOG as _RELATIONAL
from .operators.relational import QuerySpec

# The driver-checked window, highest-value first. Keep EXACTLY 50
# names here; the assert below enforces both length and existence.
PRIORITY: tuple[str, ...] = (
    # Round-3 final rotation. Principle (round-2 VERDICT #1): the
    # 50-slot driver window goes to full oracles that have NEVER been
    # driver-graded, plus a small set of flagship anchors kept for
    # round-over-round continuity. Everything rotated out is r2
    # driver-green AND pytest-gated (CATALOG.md has the per-round
    # grade history).
    #
    # -- anchors: the flagship geo value-oracles + reference chain --
    "geo_pip_join_exact",
    "geo_knn_join_exact",
    "geo_tile_agg",
    "rollup_res_ladder",
    "ref_user_features",
    # -- training-prep pair (this session; displaces the r2-green
    # ref_element_metadata / ref_changeset_metadata, pytest-gated and
    # transitively covered by ref_user_features' chain) --
    "text_chunk_tokens",
    "sample_pack_sequences",
    # -- anchor: the portable lineage checksum (one r2 grade) --
    "lineage_checksum_portable",
    # -- second web-quality batch (this session, never driver-graded;
    # displaces pages_text_extract / pca_project_fixed /
    # kmeans_assign_fixed / ref_editor_topk, each r2-green +
    # pytest-gated) --
    "text_line_filter",
    "text_normalize_unicode",
    "text_tfidf_topterms",
    "text_rarity_score",
    # -- round-3 additions already slotted, never yet driver-graded --
    "sql_tpch_q5",
    "sql_tpch_q18",
    "sql_correlated_subquery",
    "grouped_zscore_apply",
    "mm_decode_features",
    "mm_frame_sample",
    # A4's error bound folded into a reproducible flag (r3 full-oracle
    # upgrade: the r1 grade was rows-only, so the flag needs a grade)
    "agg_approx_distinct",
    # foreachBatch incremental rollup end-to-end (VERDICT #8)
    "stream_tile_ladder",
    # the shuffle-cover PIP regime under the value oracle (VERDICT #7)
    "geo_pip_join_shuffle",
    # fifth-session rotation: eight never-driver-graded novel entries
    # (hotspot clustering, cover compaction, Z-order window scan,
    # raster->vector, outlink parsing, WARC framing, BPE counting,
    # global shuffle) take the slots of eight plain-Catalyst TPC-H
    # shapes (q2/q4/q6/q7/q8/q9/q10/q19 — each verify_local-green +
    # low-risk straight SQL; q5/q18/q14/q21 keep window slots as the
    # family's representatives). Displaced shapes queue for r4.
    # web-curation ops + sketch-bound verdicts + TPC-H shapes (r3)
    "url_canonicalize",
    "text_repetition_metrics",
    "dedup_paragraph_global",
    "agg_quantile_bound",
    "geo_cluster_dense_cells",
    "geo_cover_compact",
    "sql_tpch_q14",
    "dedup_url_canonical",
    "text_pii_scrub",
    "sample_stratified",
    # -- round-3 continuation entries, rotated in this session in the
    # slots of 19 r2-green + pytest-gated representatives
    # (agg_pivot_eventtype, agg_user_features, rollup_lang_source,
    # window_avg_gap, text_quality_score, text_lang_id,
    # text_hash_embedding, skew_salted_join, asof_join_purchase_view,
    # interval_join_bucketed, cube_user_type, window_rank_family,
    # dedup_keep_latest, null_handling_fill, mm_binary_meta,
    # grouped_quantiles_apply, sql_tpch_q1, sql_tpch_q3,
    # dedup_clusters) --
    "sample_hash_split",
    "host_agg",
    "curate_corpus_funnel",
    "dedup_decontaminate",
    "geo_bbox_cells_query",
    "geo_tile_vectorize",
    "webgraph_outlinks",
    # int8-domain retrieval (displaces q12; its conditional-agg-over-
    # join shape stays graded via q14/q8 and the local sweep)
    "ann_int8_topk",
    # the TPC-H completion set (this session): all 22 shapes now exist
    "warc_roundtrip_parse",
    "bpe_pair_counts",
    "sample_global_shuffle",
    # mix-weights applied end-to-end (displaces q11; its scalar-
    # subquery-threshold shape stays graded via sql_correlated_subquery)
    "curate_mix_apply",
    # int8 vector quantization (displaces q15; its view-max shape
    # stays graded via the local sweep + window_topk_per_group history)
    "embed_quantize_int8",
    # temperature mixing weights (displaces q13; its outer-join-agg
    # shape stays graded via join_orders_customer + the local sweep)
    "sample_mix_weights",
    "sql_tpch_q21",
    # real-stream stateful dedup end-to-end (displaces q17, whose
    # correlated-agg shape stays graded via sql_correlated_subquery)
    "stream_dedup_recrawl",
    # -- fourth-session domain entries (Gopher doc filter, quadkey
    # hierarchy gate, shoelace ring audit) — closer to the north star
    # than the three displaced TPC-H shapes (q16/q20/q22, each
    # verify_local-green + pytest-gated; their distinct-agg /
    # exists-subquery / anti-join shapes stay graded via q4/q21/q22's
    # window history and the local sweep) --
    "gopher_quality_filter",
    "geo_quadkey_encode",
    "geo_polygon_area",
)


def full_catalog() -> dict[str, QuerySpec]:
    cat: dict[str, QuerySpec] = {}
    cat.update(_RELATIONAL)
    for modname in ("dedup", "text", "similarity", "geo_queries", "ml_queries",
                    "multimodal", "ref_features", "skew_queries", "grouped",
                    "sql_surface", "temporal", "components", "webtext", "webgraph",
                    "webtext_quality", "training_prep"):
        mod = __import__(
            f"osm_data_classification_spark.operators.{modname}",
            fromlist=["CATALOG"],
        )
        cat.update(mod.CATALOG)
    # a broken operator module must fail LOUDLY here — swallowing the
    # ImportError would silently drop its queries from the driver gate
    assert len(cat) >= 75, f"catalog unexpectedly small: {len(cat)}"
    assert len(PRIORITY) == 50, f"PRIORITY must be 50 names, got {len(PRIORITY)}"
    missing = [n for n in PRIORITY if n not in cat]
    assert not missing, f"PRIORITY names not in catalog: {missing}"
    ordered = {n: cat[n] for n in PRIORITY}
    ordered.update({n: s for n, s in cat.items() if n not in ordered})
    return ordered
