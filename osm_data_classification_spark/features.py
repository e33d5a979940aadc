"""Reference-analytics operators: the OSM-history metadata chain.

This module reproduces, Spark-first, the reference pipeline's three
metadata granularities and the editor stage (SURVEY.md §1.1, §3.1;
`[U: upstream OSMElementEnrichment / ElementMetadataExtract /
ChangeSetMetadataExtract / UserMetadataExtract / extract_user_editor]`
— /root/reference is empty, so semantics are pinned by SURVEY.md §0.2
and gated by the fixture suites in tests/test_reference_suites.py,
the `python -m pytest -x -q` gate of BASELINE.json:6).

Input: an element-history DataFrame
    (elem:string, id:long, version:int, visible:boolean,
     ts:timestamp, uid:long, chgset:long, ntags:int, editor:string)

The reference's pandas idiom — global sort + `shift` — becomes one
Window per (elem, id): a single hash-partitioned sort, no global
ordering anywhere, which is the whole reason this scales (SURVEY.md
§2 W1/J8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ELEM_TYPES = ("node", "way", "relation")


# ---------------------------------------------------------------------------
# W1: version-chain enrichment
# ---------------------------------------------------------------------------


def enrich_history(hist: DataFrame) -> DataFrame:
    """Order-dependent flags via lead/lag over the (elem,id) chain:
    `init` (first version), `up_to_date` (last), `willbe_corr` (next
    version by a different uid), `willbe_autocorr` (next version by
    the same uid), `is_corr`/`is_autocorr` (this version corrects the
    previous one), `time_to_next_s`."""
    w = Window.partitionBy("elem", "id").orderBy("version")
    nxt_uid = F.lead("uid").over(w)
    prv_uid = F.lag("uid").over(w)
    nxt_ts = F.lead("ts").over(w)
    return (
        hist.withColumn("init", F.row_number().over(w) == 1)
        .withColumn(
            "up_to_date",
            F.row_number().over(
                Window.partitionBy("elem", "id").orderBy(F.desc("version"))
            )
            == 1,
        )
        .withColumn("willbe_corr", nxt_uid.isNotNull() & (nxt_uid != F.col("uid")))
        .withColumn("willbe_autocorr", nxt_uid.isNotNull() & (nxt_uid == F.col("uid")))
        .withColumn("is_corr", prv_uid.isNotNull() & (prv_uid != F.col("uid")))
        .withColumn("is_autocorr", prv_uid.isNotNull() & (prv_uid == F.col("uid")))
        .withColumn(
            "time_to_next_s",
            (F.unix_timestamp(nxt_ts) - F.unix_timestamp("ts")).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# A1: per-element metadata
# ---------------------------------------------------------------------------


def element_metadata(hist: DataFrame) -> DataFrame:
    """One row per element: version/user/changeset counts, lifetime,
    mean inter-update gap, current visibility."""
    w_last = Window.partitionBy("elem", "id").orderBy(F.desc("version"))
    last_visible = hist.withColumn("rn", F.row_number().over(w_last)).filter(
        F.col("rn") == 1
    ).select("elem", "id", F.col("visible").alias("cur_visible"))
    agg = hist.groupBy("elem", "id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.countDistinct("uid").alias("n_uids"),
        F.countDistinct("chgset").alias("n_chgsets"),
        F.min("ts").alias("created_at"),
        F.max("ts").alias("lastmodif_at"),
    )
    lifespan = (
        F.unix_timestamp("lastmodif_at") - F.unix_timestamp("created_at")
    ).cast("long")
    return (
        agg.join(last_visible, ["elem", "id"])
        .withColumn("lifespan_s", lifespan)
        .withColumn(
            "mean_update_gap_s",
            F.when(
                F.col("n_versions") > 1,
                F.expr("lifespan_s div (n_versions - 1)"),
            ).otherwise(F.lit(0)),
        )
    )


# ---------------------------------------------------------------------------
# A2: per-changeset metadata
# ---------------------------------------------------------------------------


def changeset_metadata(enriched: DataFrame) -> DataFrame:
    """One row per changeset: author, per-type modification counts
    (conditional sums — deterministic schema, no pivot), creations,
    deletions, duration."""
    per_type = [
        F.sum(F.when(F.col("elem") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ELEM_TYPES
    ]
    return enriched.groupBy("chgset").agg(
        F.first("uid").alias("uid"),  # a changeset has one author
        F.count(F.lit(1)).alias("n_mods"),
        *per_type,
        F.sum(F.when(F.col("init"), 1).otherwise(0)).alias("n_created"),
        F.sum(F.when(~F.col("visible"), 1).otherwise(0)).alias("n_deleted"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("long").alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# A3 + A5: per-user feature matrix
# ---------------------------------------------------------------------------


def user_metadata(enriched: DataFrame) -> DataFrame:
    """The wide per-user feature matrix (~20 features): edit counts
    split by type and by create/modify/delete, correction counters,
    activity span, per-changeset rate, and the 7-bin day-of-week
    activity histogram (BASELINE.json:6 'changesets, node/way/relation
    edit counts, temporal activity histograms'). One groupBy pass."""
    per_type = [
        F.sum(F.when(F.col("elem") == t, 1).otherwise(0)).alias(f"n_{t}_edits")
        for t in ELEM_TYPES
    ]
    dow_bins = [
        F.sum(F.when(F.dayofweek("ts") == d, 1).otherwise(0)).alias(f"dow_{d}")
        for d in range(1, 8)
    ]
    flags = [
        F.sum(F.when(F.col(c), 1).otherwise(0)).alias(f"n_{c}")
        for c in ("init", "willbe_corr", "willbe_autocorr", "is_corr", "is_autocorr")
    ]
    agg = enriched.groupBy("uid").agg(
        F.count(F.lit(1)).alias("n_edits"),
        F.countDistinct("chgset").alias("n_chgsets"),
        F.countDistinct("elem", "id").alias("n_elements"),
        *per_type,
        *flags,
        F.sum(F.when(~F.col("visible"), 1).otherwise(0)).alias("n_deletions"),
        F.min("ts").alias("first_at"),
        F.max("ts").alias("last_at"),
        F.countDistinct(F.to_date("ts")).alias("n_active_days"),
        *dow_bins,
    )
    return (
        agg.withColumn(
            "activity_s",
            (F.unix_timestamp("last_at") - F.unix_timestamp("first_at")).cast("long"),
        )
        .withColumn("edits_per_chgset_x1000", F.expr("(n_edits * 1000) div n_chgsets"))
        .withColumn(
            "update_freq_x1000",
            F.when(
                F.col("n_elements") > 0,
                F.expr("(n_edits * 1000) div n_elements"),
            ).otherwise(F.lit(0)),
        )
    )


# ---------------------------------------------------------------------------
# S3 + A6: editor normalization, top-K vocabulary, per-user usage
# ---------------------------------------------------------------------------


def normalize_editor(col) -> F.Column:
    """'JOSM/1.5 (19000 en)' → 'josm': lowercase, take the token before
    the first '/', ' ' or version digits `[U: extract_user_editor]`."""
    return F.regexp_extract(F.lower(F.trim(col)), r"^([a-z!]+)", 1)


def editor_table(hist: DataFrame) -> DataFrame:
    """(chgset, editor) — normalized editor per changeset."""
    return (
        hist.groupBy("chgset")
        .agg(F.first("editor").alias("raw_editor"))
        .withColumn("editor", normalize_editor(F.col("raw_editor")))
        .drop("raw_editor")
    )


def top_editors(editors: DataFrame, k: int = 5) -> DataFrame:
    return (
        editors.groupBy("editor")
        .agg(F.count(F.lit(1)).alias("n_chgsets"))
        .orderBy(F.desc("n_chgsets"), F.asc("editor"))
        .limit(k)
    )


def user_editor_counts(hist: DataFrame, editors: DataFrame, k: int = 5) -> DataFrame:
    """Per-user usage counts of the top-K editors (+ 'other'), merged
    the reference way: left join then zero-fill (J1/P4). The K-row
    vocabulary is a collected literal; the per-changeset editor table
    scales with |changesets|, so its join carries NO broadcast hint —
    AQE broadcasts it while small and shuffles at 10^8 changesets."""
    vocab = [r["editor"] for r in top_editors(editors, k).collect()]
    per_chgset = hist.select("uid", "chgset").distinct().join(
        editors, "chgset", "left"
    )
    bucket = F.when(F.col("editor").isin(vocab), F.col("editor")).otherwise(
        F.lit("other")
    )
    counts = [
        F.sum(F.when(bucket == e, 1).otherwise(0)).alias(f"ed_{e}")
        for e in [*vocab, "other"]
    ]
    return per_chgset.groupBy("uid").agg(*counts)
