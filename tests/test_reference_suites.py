"""The reference's three analysis fixture suites (BASELINE.json:6
"metadata extraction, user-feature aggregation, editor-classification
fixtures"; SURVEY.md §5.1), reproduced over the hand-written +
generated history fixtures against an independent pandas oracle, plus
hand-computed golden spot checks.
"""

from __future__ import annotations

import pandas as pd
import pytest

import tests.fixtures_edits as fx
import tests.oracle_features as oracle
from osm_data_classification_spark import features as feats


@pytest.fixture(scope="module")
def hand(spark):
    return fx.to_spark(spark, fx.hand_history())


@pytest.fixture(scope="module")
def gen(spark):
    return fx.to_spark(spark, fx.generated_history(4000))


def _cmp(spark_df, oracle_pdf, keys):
    got = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    exp = oracle_pdf.sort_values(keys).reset_index(drop=True)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    assert list(got.columns) == list(exp.columns), (
        f"columns differ: {got.columns} vs {exp.columns}"
    )
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f":
            pd.testing.assert_series_equal(g, e.astype(g.dtype), check_names=False)
        else:
            assert g.astype(str).tolist() == e.astype(str).tolist(), f"col {c}"


# ---------------------------------------------------------------------------
# Suite 1: metadata extraction (W1 enrichment + A1 element metadata)
# ---------------------------------------------------------------------------


class TestMetadataExtraction:
    def test_enrichment_matches_oracle_hand(self, spark, hand):
        got = feats.enrich_history(hand)
        exp = oracle.enrich(fx.hand_history())
        _cmp(got, exp, ["elem", "id", "version"])

    def test_enrichment_matches_oracle_generated(self, spark, gen):
        got = feats.enrich_history(gen)
        exp = oracle.enrich(fx.generated_history(4000))
        _cmp(got, exp, ["elem", "id", "version"])

    def test_element_metadata_matches_oracle(self, spark, hand):
        got = feats.element_metadata(hand)
        exp = oracle.element_meta(fx.hand_history())
        _cmp(got, exp, ["elem", "id"])

    def test_hand_goldens(self, spark, hand):
        """Hand-computed expectations for node 1 and node 3."""
        em = {
            (r["elem"], r["id"]): r.asDict()
            for r in feats.element_metadata(hand).collect()
        }
        n1 = em[("node", 1)]
        assert n1["n_versions"] == 3
        assert n1["n_uids"] == 2
        assert n1["n_chgsets"] == 3
        assert n1["lifespan_s"] == 3 * 86400 + 2 * 3600  # Jan1 09:00→Jan4 11:00
        assert n1["mean_update_gap_s"] == n1["lifespan_s"] // 2
        n3 = em[("node", 3)]
        assert n3["cur_visible"] is False

        enr = {
            (r["elem"], r["id"], r["version"]): r.asDict()
            for r in feats.enrich_history(hand).collect()
        }
        assert enr[("node", 1, 1)]["init"] is True
        assert enr[("node", 1, 1)]["willbe_corr"] is True  # 100 → 200
        assert enr[("node", 1, 2)]["is_corr"] is True
        assert enr[("node", 1, 3)]["up_to_date"] is True
        assert enr[("way", 10, 1)]["willbe_autocorr"] is True  # 100 → 100
        assert enr[("node", 2, 1)]["time_to_next_s"] == (
            19 * 86400 - 1800
        )  # Jan1 09:30 → Jan20 09:00


# ---------------------------------------------------------------------------
# Suite 2: user-feature aggregation (A3 + A5)
# ---------------------------------------------------------------------------


class TestUserFeatureAggregation:
    def test_user_matrix_matches_oracle_hand(self, spark, hand):
        got = feats.user_metadata(feats.enrich_history(hand))
        exp = oracle.user_meta(oracle.enrich(fx.hand_history()))
        _cmp(got, exp, ["uid"])

    def test_user_matrix_matches_oracle_generated(self, spark, gen):
        got = feats.user_metadata(feats.enrich_history(gen))
        exp = oracle.user_meta(oracle.enrich(fx.generated_history(4000)))
        _cmp(got, exp, ["uid"])

    def test_hand_goldens(self, spark, hand):
        um = {r["uid"]: r.asDict() for r in
              feats.user_metadata(feats.enrich_history(hand)).collect()}
        u400 = um[400]  # the one-day power mapper
        assert u400["n_edits"] == 8
        assert u400["n_chgsets"] == 1
        assert u400["n_active_days"] == 1
        assert u400["edits_per_chgset_x1000"] == 8000
        assert u400["n_node_edits"] == 5 and u400["n_way_edits"] == 3
        u100 = um[100]
        # uid 100 rows: node1v1(init), node1v3, node2v1(init), way10v1(init),
        # way10v2, relation20v2, node9v2 → 7 edits, 3 inits
        assert u100["n_edits"] == 7
        assert u100["n_init"] == 3


# ---------------------------------------------------------------------------
# Suite 3: editor classification (S3 + A6 + A11 parity)
# ---------------------------------------------------------------------------


class TestEditorClassification:
    def test_normalization_and_topk(self, spark, hand):
        ed = feats.editor_table(hand)
        got = {r["chgset"]: r["editor"] for r in ed.collect()}
        exp = oracle.editor_per_chgset(fx.hand_history()).set_index("chgset")[
            "editor"
        ].to_dict()
        assert got == exp
        # 'JOSM/1.5 (19000 en)' and 'josm' normalize to the same token
        assert got[1000] == "josm" and got[3000] == "josm"
        topk = feats.top_editors(ed, 3).collect()
        exp_top = oracle.top_editors(oracle.editor_per_chgset(fx.hand_history()), 3)
        assert [(r["editor"], r["n_chgsets"]) for r in topk] == list(
            exp_top.itertuples(index=False, name=None)
        )

    def test_user_editor_counts(self, spark, hand):
        ed = feats.editor_table(hand)
        got = feats.user_editor_counts(hand, ed, k=3)
        exp = oracle.user_editor_counts(
            fx.hand_history(), oracle.editor_per_chgset(fx.hand_history()), k=3
        )
        _cmp(got, exp, ["uid"])

    def test_kmeans_label_parity_vs_numpy(self, spark, sf_dir):
        """A11: fixed-init KMeans on embeddings matches a numpy oracle
        running the identical algorithm."""
        import numpy as np

        from osm_data_classification_spark.io import load_table
        from osm_data_classification_spark.ml import kmeans_assign_df, kmeans_fit

        emb = load_table(spark, sf_dir, "embeddings")
        model = kmeans_fit(emb, k=4, vec_col="embedding", id_col="vec_id", max_iter=10)
        got = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign_df(emb, model["centers"], vec_col="embedding")
            .select("vec_id", "cluster")
            .collect()
        }

        pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
        x = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
        centers = x[:4].copy()
        for _ in range(10):
            d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)
            new = np.vstack(
                [x[lab == j].mean(axis=0) if (lab == j).any() else centers[j] for j in range(4)]
            )
            if np.max(np.abs(new - centers)) < 1e-12:
                centers = new
                break
            centers = new
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        exp_lab = d.argmin(axis=1)
        exp = dict(zip(pdf["vec_id"].tolist(), exp_lab.tolist()))
        agree = sum(got[k] == exp[k] for k in exp) / len(exp)
        assert agree >= 0.99, f"label agreement {agree}"
