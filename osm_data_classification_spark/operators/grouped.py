"""Grouped-map pandas UDF operators (SURVEY.md §2.10 applyInPandas).

Most per-group logic in this engine is expressible relationally and
stays JVM-side; these operators cover the genuinely-custom per-group
shape — arbitrary numpy over one group's rows — with the
`applyInPandas` contract (one pandas DataFrame per group, Arrow both
ways). Each is oracle-checked: the group statistics are defined with
discrete (index-based) semantics so DuckDB computes identical values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .relational import QuerySpec

CATALOG: dict[str, QuerySpec] = {}


def _register(name: str, sql=None):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn, sql)
        return fn

    return deco


def grouped_quantiles(
    df: DataFrame, key: str, value: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Exact per-group discrete quantiles: the value at index
    ceil(n·q)−1 of the sorted group — the type-1 (SQL `quantile_disc`)
    definition, so the DuckDB oracle is value-exact.
    `applyInPandas`: each group becomes one pandas frame in one task;
    groups are the unit of parallelism, so the shuffle is one exchange
    on the group key and skewed groups are bounded by group size."""
    out_cols = ", ".join(f"q{int(q * 100)} double" for q in qs)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf[value].to_numpy())
        n = len(v)
        row = {key: [pdf[key].iloc[0]], "n": [n]}
        for q in qs:
            idx = max(0, int(np.ceil(n * q)) - 1)
            row[f"q{int(q * 100)}"] = [float(v[idx])]
        return pd.DataFrame(row)

    schema = f"{key} long, n long, {out_cols}"
    return df.select(key, value).groupBy(key).applyInPandas(per_group, schema)


@_register(
    "grouped_quantiles_apply",
    """
    SELECT user_id,
           count(*) AS n,
           CAST(quantile_disc(value, 0.25) AS DOUBLE) AS q25,
           CAST(quantile_disc(value, 0.50) AS DOUBLE) AS q50,
           CAST(quantile_disc(value, 0.75) AS DOUBLE) AS q75
    FROM events GROUP BY user_id
    """,
)
def grouped_quantiles_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value quantiles via applyInPandas; DuckDB's
    quantile_disc uses the same floor((n-1)q) discrete definition, so
    the oracle is value-exact."""
    ev = load_table(spark, sf_dir, "events")
    return grouped_quantiles(ev, "user_id", "value")


@_register(
    "grouped_zscore_apply",
    """
    WITH stats AS (
        SELECT user_id,
               CAST(sum(CAST(round(value, 4) AS DECIMAL(38,6))) AS DOUBLE)
                   / count(*) AS mu,
               count(*) AS n
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           CAST(floor((e.value - s.mu) * 1000) AS BIGINT) AS dev_x1000
    FROM events e JOIN stats s USING (user_id)
    """,
)
def grouped_zscore_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group centering (deviation from the group mean) as a
    grouped-map kernel — the normalize-within-group shape. The mean is
    an order-insensitive decimal sum so both engines agree bit-for-bit;
    output integer-scaled."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        # HALF_UP quantize, not Python round(): round() is banker's
        # rounding, but DuckDB ROUND (and Spark F.round) are
        # half-away-from-zero — exact scale-4 midpoints like 0.03125
        # would diverge (round-2 ADVICE)
        q4 = Decimal("0.0001")
        total = sum(
            Decimal(repr(float(v))).quantize(q4, rounding=ROUND_HALF_UP)
            for v in pdf["value"]
        )
        mu = float(total) / len(pdf)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "dev_x1000": np.floor((pdf["value"].to_numpy() - mu) * 1000).astype(
                    "int64"
                ),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        per_group, "event_id long, user_id long, dev_x1000 long"
    )


# ---------------------------------------------------------------------------
# real Python UDTF (Spark 4 table function surface, §2.10)
# ---------------------------------------------------------------------------

_UDTF_SQL = """
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT doc_id, term, COUNT(*) AS n
    FROM words GROUP BY doc_id, term HAVING COUNT(*) >= 2
"""


@_register("udtf_term_counts", _UDTF_SQL)
def udtf_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10's table-function row made REAL: a Python UDTF (Spark 4
    `@udtf`, Arrow-optimized) fans each document out to its repeated
    terms (count >= 2) via LATERAL join — the genuine user-defined
    table function API, not an explode equivalent. This is the
    API-surface demo; the hot-path twin of this computation is the
    all-JVM text_tfidf_topterms. FULL oracle: DuckDB re-counts with
    unnest + HAVING."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="term: string, n: long", useArrow=True)
    class RepeatedTerms:
        def eval(self, text: str):
            if not text:
                return
            for term, n in Counter(text.split(" ")).items():
                if n >= 2:
                    yield term, n

    spark.udtf.register("repeated_terms", RepeatedTerms)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        "SELECT d.doc_id, t.term, t.n "
        "FROM docs_udtf_in d, LATERAL repeated_terms(d.text) t"
    )
