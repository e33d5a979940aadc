"""Skew handling (SURVEY.md §2 J9; BASELINE.json:6 "skew from
mega-cells … salted repartitioning and AQE skew-join hints").

Two mechanisms, used where AQE cannot help:

- AQE skew-join splitting handles oversized *shuffle blocks* of
  sort-merge joins and is enabled globally (session.py). It cannot fix
  a semantic hot KEY inside an aggregation or a broadcast-refine stage.
- Explicit key salting handles the semantic hot key: the fact side's
  key is widened to (key, salt), the dim side is replicated NSALT ways,
  so one mega-cell's rows spread over NSALT reducers. Aggregations use
  the two-phase shape instead (partial agg on (key, salt) or on the
  natural sub-key), already built into tile_aggregate.

The salt must be deterministic per row (pmod of a row hash), never
random — result invariance across retries/parallelism is a correctness
gate here (SURVEY.md §5.2 L4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], nsalt: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, nsalt) from a hash of ``cols``."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(nsalt)).cast("int"))


def replicate(df: DataFrame, nsalt: int, salt_col: str = "__salt") -> DataFrame:
    """Cross the (small) dim side with the salt domain — nsalt copies."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1))).alias(salt_col)
    return df.select("*", salts)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    nsalt: int = 8,
    salt_src: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """fact ⨝ dim on ``on``, with the fact side salted and the dim side
    replicated ``nsalt``× — identical results to the plain join (tested),
    but a hot join key's rows land on nsalt reducers instead of one.

    ``salt_src`` defaults to all fact columns, giving a near-uniform
    deterministic spread of each hot key's rows."""
    salt_src = salt_src or fact.columns
    f = with_salt(fact, salt_src, nsalt)
    d = replicate(dim, nsalt)
    return f.join(d, [*on, "__salt"], how).drop("__salt")


def hot_keys(df: DataFrame, key_cols: list[str], top_n: int = 20) -> DataFrame:
    """Cheap frequency sketch of the hottest keys — drives the choice of
    nsalt (SURVEY.md §4.2: 'salt count chosen from a cheap
    groupBy(cell).count() sketch')."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(top_n)
    )
