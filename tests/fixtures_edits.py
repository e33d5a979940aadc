"""Element-history fixtures (FIXTURES.md §2.3).

The 30-row HAND fixture covers every enrichment edge: single-version
elements, multi-version chains with same-uid and cross-uid
transitions, a deleted element, all three elem types, messy editor
strings. The generated fixture (seed 42) scales the same shapes to
10k rows for distribution-invariance tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EDITORS = [
    "JOSM/1.5 (19000 en)",
    "iD 2.19.5",
    "josm",
    "StreetComplete 42.0",
    "iD",
    "Potlatch 2",
]


def _ts(day: int, hour: int = 0, minute: int = 0) -> pd.Timestamp:
    return pd.Timestamp(2024, 1, day, hour, minute)


def hand_history() -> pd.DataFrame:
    """30 rows, hand-written. Element map:
      node 1: v1..v3 by uids 100,200,100 (corr + autocorr mix)
      node 2: v1 only by 100 (one-shot)
      node 3: v1..v2 by 300,300 (autocorr), v2 invisible (deleted)
      way 10: v1..v4 by 100,100,200,200
      way 11: v1 by 200
      relation 20: v1..v2 by 300,100
      node 4..8: singles by 400 (one-shot power day)
      way 12: v1..v3 all by 400 same changeset
    """
    rows = [
        # elem, id, version, visible, ts, uid, chgset, ntags, editor
        ("node", 1, 1, True, _ts(1, 9), 100, 1000, 2, EDITORS[0]),
        ("node", 1, 2, True, _ts(2, 10), 200, 2000, 2, EDITORS[1]),
        ("node", 1, 3, True, _ts(4, 11), 100, 1001, 3, EDITORS[0]),
        ("node", 2, 1, True, _ts(1, 9, 30), 100, 1000, 1, EDITORS[0]),
        ("node", 3, 1, True, _ts(3, 8), 300, 3000, 2, EDITORS[2]),
        ("node", 3, 2, False, _ts(5, 8), 300, 3001, 0, EDITORS[2]),
        ("way", 10, 1, True, _ts(1, 12), 100, 1000, 4, EDITORS[0]),
        ("way", 10, 2, True, _ts(1, 13), 100, 1000, 4, EDITORS[0]),
        ("way", 10, 3, True, _ts(6, 9), 200, 2001, 5, EDITORS[4]),
        ("way", 10, 4, True, _ts(8, 9), 200, 2002, 5, EDITORS[1]),
        ("way", 11, 1, True, _ts(2, 15), 200, 2000, 2, EDITORS[1]),
        ("relation", 20, 1, True, _ts(4, 7), 300, 3002, 6, EDITORS[2]),
        ("relation", 20, 2, True, _ts(9, 7), 100, 1002, 6, EDITORS[0]),
        ("node", 4, 1, True, _ts(7, 10, 0), 400, 4000, 1, EDITORS[3]),
        ("node", 5, 1, True, _ts(7, 10, 5), 400, 4000, 1, EDITORS[3]),
        ("node", 6, 1, True, _ts(7, 10, 10), 400, 4000, 1, EDITORS[3]),
        ("node", 7, 1, True, _ts(7, 10, 15), 400, 4000, 1, EDITORS[3]),
        ("node", 8, 1, True, _ts(7, 10, 20), 400, 4000, 1, EDITORS[3]),
        ("way", 12, 1, True, _ts(7, 11), 400, 4000, 2, EDITORS[3]),
        ("way", 12, 2, True, _ts(7, 11, 30), 400, 4000, 2, EDITORS[3]),
        ("way", 12, 3, True, _ts(7, 12), 400, 4000, 3, EDITORS[3]),
        ("node", 9, 1, True, _ts(10, 9), 500, 5000, 1, EDITORS[5]),
        ("node", 9, 2, True, _ts(11, 9), 100, 1003, 2, EDITORS[0]),
        ("node", 9, 3, True, _ts(12, 9), 500, 5001, 2, EDITORS[5]),
        ("node", 9, 4, False, _ts(13, 9), 500, 5001, 0, EDITORS[5]),
        ("way", 13, 1, True, _ts(14, 9), 500, 5002, 2, EDITORS[5]),
        ("way", 13, 2, True, _ts(15, 9), 500, 5002, 3, EDITORS[5]),
        ("relation", 21, 1, True, _ts(16, 9), 200, 2003, 4, EDITORS[1]),
        ("relation", 21, 2, True, _ts(17, 9), 200, 2004, 4, EDITORS[1]),
        ("node", 2, 2, True, _ts(20, 9), 200, 2005, 2, EDITORS[4]),
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "elem", "id", "version", "visible", "ts", "uid", "chgset",
            "ntags", "editor",
        ],
    )


def generated_history(n: int = 10_000, seed: int = 42) -> pd.DataFrame:
    """Seeded random history with realistic chain structure."""
    rng = np.random.default_rng(seed)
    n_elems = max(1, n // 3)
    elems = rng.choice(["node", "way", "relation"], size=n_elems, p=[0.7, 0.25, 0.05])
    ids = np.arange(n_elems)
    n_versions = rng.geometric(0.45, size=n_elems).clip(1, 12)
    rows = []
    for e, i, nv in zip(elems, ids, n_versions):
        base = rng.integers(0, 60 * 24 * 80)  # minutes into 2024
        uid_pool = rng.integers(1, 40, size=3)
        for v in range(1, int(nv) + 1):
            uid = int(rng.choice(uid_pool))
            rows.append(
                (
                    e,
                    int(i),
                    v,
                    bool(rng.random() > 0.05),
                    pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=int(base + v * rng.integers(1, 2000))),
                    uid,
                    int(uid * 100_000 + rng.integers(0, 50)),
                    int(rng.integers(0, 8)),
                    EDITORS[int(rng.integers(0, len(EDITORS)))],
                )
            )
            if len(rows) >= n:
                break
        if len(rows) >= n:
            break
    return pd.DataFrame(
        rows,
        columns=[
            "elem", "id", "version", "visible", "ts", "uid", "chgset",
            "ntags", "editor",
        ],
    )


HISTORY_SCHEMA = (
    "elem string, id long, version int, visible boolean, ts timestamp, "
    "uid long, chgset long, ntags int, editor string"
)


def to_spark(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf, schema=HISTORY_SCHEMA)
