"""Single-threaded pandas oracle for the reference-analytics chain
(FIXTURES.md §2.4). Written independently of the Spark module —
classic sort+shift idioms — so agreement is meaningful.
"""

from __future__ import annotations

import re

import pandas as pd


def enrich(hist: pd.DataFrame) -> pd.DataFrame:
    df = hist.sort_values(["elem", "id", "version"]).reset_index(drop=True)
    g = df.groupby(["elem", "id"], sort=False)
    df["init"] = g["version"].transform("min") == df["version"]
    df["up_to_date"] = g["version"].transform("max") == df["version"]
    nxt_uid = g["uid"].shift(-1)
    prv_uid = g["uid"].shift(1)
    nxt_ts = g["ts"].shift(-1)
    df["willbe_corr"] = nxt_uid.notna() & (nxt_uid != df["uid"])
    df["willbe_autocorr"] = nxt_uid.notna() & (nxt_uid == df["uid"])
    df["is_corr"] = prv_uid.notna() & (prv_uid != df["uid"])
    df["is_autocorr"] = prv_uid.notna() & (prv_uid == df["uid"])
    df["time_to_next_s"] = (
        (nxt_ts - df["ts"]).dt.total_seconds().astype("Int64")
    )
    return df


def element_meta(hist: pd.DataFrame) -> pd.DataFrame:
    def per_elem(g: pd.DataFrame) -> pd.Series:
        last = g.loc[g["version"].idxmax()]
        lifespan = int((g["ts"].max() - g["ts"].min()).total_seconds())
        nv = len(g)
        return pd.Series(
            {
                "n_versions": nv,
                "n_uids": g["uid"].nunique(),
                "n_chgsets": g["chgset"].nunique(),
                "created_at": g["ts"].min(),
                "lastmodif_at": g["ts"].max(),
                "cur_visible": bool(last["visible"]),
                "lifespan_s": lifespan,
                "mean_update_gap_s": lifespan // (nv - 1) if nv > 1 else 0,
            }
        )

    out = hist.groupby(["elem", "id"]).apply(per_elem, include_groups=False)
    return out.reset_index()


def user_meta(enriched: pd.DataFrame) -> pd.DataFrame:
    def per_user(g: pd.DataFrame) -> pd.Series:
        row = {
            "n_edits": len(g),
            "n_chgsets": g["chgset"].nunique(),
            "n_elements": g[["elem", "id"]].drop_duplicates().shape[0],
        }
        for t in ("node", "way", "relation"):
            row[f"n_{t}_edits"] = int((g["elem"] == t).sum())
        for c in ("init", "willbe_corr", "willbe_autocorr", "is_corr", "is_autocorr"):
            row[f"n_{c}"] = int(g[c].sum())
        row["n_deletions"] = int((~g["visible"]).sum())
        row["first_at"] = g["ts"].min()
        row["last_at"] = g["ts"].max()
        row["n_active_days"] = g["ts"].dt.date.nunique()
        # pandas dayofweek: Mon=0; Spark dayofweek: Sun=1 → convert
        spark_dow = (g["ts"].dt.dayofweek + 1) % 7 + 1
        for d in range(1, 8):
            row[f"dow_{d}"] = int((spark_dow == d).sum())
        row["activity_s"] = int((g["ts"].max() - g["ts"].min()).total_seconds())
        row["edits_per_chgset_x1000"] = (len(g) * 1000) // row["n_chgsets"]
        row["update_freq_x1000"] = (
            (len(g) * 1000) // row["n_elements"] if row["n_elements"] else 0
        )
        return pd.Series(row)

    return enriched.groupby("uid").apply(per_user, include_groups=False).reset_index()


def normalize_editor(s: str) -> str:
    m = re.match(r"^([a-z!]+)", s.strip().lower())
    return m.group(1) if m else ""


def editor_per_chgset(hist: pd.DataFrame) -> pd.DataFrame:
    first = hist.sort_index().groupby("chgset", sort=False)["editor"].first()
    return (
        first.map(normalize_editor)
        .rename("editor")
        .reset_index()
    )


def top_editors(editors: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    counts = (
        editors.groupby("editor").size().rename("n_chgsets").reset_index()
    )
    return counts.sort_values(
        ["n_chgsets", "editor"], ascending=[False, True]
    ).head(k)


def user_editor_counts(hist: pd.DataFrame, editors: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    vocab = top_editors(editors, k)["editor"].tolist()
    uc = hist[["uid", "chgset"]].drop_duplicates().merge(editors, on="chgset", how="left")
    uc["bucket"] = uc["editor"].where(uc["editor"].isin(vocab), "other")
    out = []
    for uid, g in uc.groupby("uid"):
        row = {"uid": uid}
        for e in [*vocab, "other"]:
            row[f"ed_{e}"] = int((g["bucket"] == e).sum())
        out.append(row)
    return pd.DataFrame(out)
