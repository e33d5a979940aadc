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
    # -- flagship geo value-oracles (never driver-checked in r1) --
    "geo_pip_join_exact",
    "geo_knn_join_exact",
    "geo_tile_agg",
    "rollup_res_ladder",
    # -- reference analytics chain --
    "ref_element_metadata",
    "ref_changeset_metadata",
    "ref_user_features",
    "ref_editor_topk",
    # -- round-1 FAIL/ERROR, fixed this round --
    "agg_pivot_eventtype",
    "agg_user_features",
    "rollup_lang_source",
    "window_avg_gap",
    "text_quality_score",
    "text_lang_id",
    "text_hash_embedding",
    # -- full oracles the round-1 window never reached --
    "skew_salted_join",
    "asof_join_purchase_view",
    "interval_join_bucketed",
    "cube_user_type",
    "window_rank_family",
    "dedup_keep_latest",
    "null_handling_fill",
    "mm_binary_meta",
    "grouped_quantiles_apply",
    "sql_tpch_q1",
    "sql_tpch_q3",
    # -- round-2 oracle upgrades: first driver signal for S4 (byte-
    # exact extraction), S5 (portable lineage checksum), A10/A11
    # (fixed-parameter projection and assignment), and duplicate-
    # cluster closure --
    "pages_text_extract",
    "lineage_checksum_portable",
    "pca_project_fixed",
    "kmeans_assign_fixed",
    "dedup_clusters",
    # -- round-3 rotation (round-2 VERDICT #1): the six never-driver-
    # graded full oracles take the slots of entries green in BOTH
    # rounds (scan_pages, filter_lang_en, distinct_users,
    # join_orders_customer, semi_join_active_users, union_sources,
    # star_join_3way, window_running_sum, sort_limit_report — all now
    # past the window on their pytest + two-round driver history) --
    "sql_tpch_q5",
    "sql_tpch_q18",
    "sql_correlated_subquery",
    "grouped_zscore_apply",
    "mm_decode_features",
    "mm_frame_sample",
    # -- round-3 new driver-gradable entries --
    # A4's error bound folded into a reproducible flag (VERDICT #2)
    "agg_approx_distinct",
    # foreachBatch incremental rollup end-to-end (VERDICT #8)
    "stream_tile_ladder",
    # the shuffle-cover PIP regime under the value oracle (VERDICT #7)
    "geo_pip_join_shuffle",
    # -- round-3 additions: web-curation ops (URL canonicalization,
    # Gopher repetition signals, CCNet global paragraph dedup), the
    # quantile-sketch bound verdict (A4's percentile sibling), and
    # three more TPC-H shapes (pushdown-only Q6, EXISTS Q4,
    # conditional-agg Q14). They take the slots of seven MORE
    # both-rounds-green entries (normalize_minmax,
    # window_version_chain, window_topk_per_group, json_extract_props,
    # stream_session_agg, dedup_exact, ann_lsh_bucketed — all past the
    # window now on pytest + two-round driver history) --
    "url_canonicalize",
    "text_repetition_metrics",
    "dedup_paragraph_global",
    "agg_quantile_bound",
    "sql_tpch_q6",
    "sql_tpch_q4",
    "sql_tpch_q14",
    # canonical-URL dedup, PII scrub, and stratified sampling take
    # the last three both-rounds-green slots (geo_cell_encode,
    # dedup_minhash_lsh, ann_ivf_topk — each with two driver greens
    # AND a pytest oracle suite behind it)
    "dedup_url_canonical",
    "text_pii_scrub",
    "sample_stratified",
)


def full_catalog() -> dict[str, QuerySpec]:
    cat: dict[str, QuerySpec] = {}
    cat.update(_RELATIONAL)
    for modname in ("dedup", "text", "similarity", "geo_queries", "ml_queries",
                    "multimodal", "ref_features", "skew_queries", "grouped",
                    "sql_surface", "temporal", "components", "webtext"):
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
