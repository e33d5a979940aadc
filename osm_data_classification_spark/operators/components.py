"""Duplicate-cluster formation: distributed connected components over
near-dup pairs.

Pairwise dedup (dedup.py) yields EDGES; a training-data pipeline needs
CLUSTERS — each document assigned the minimum doc_id of its duplicate
group, then one canonical survivor per group. Connected components run
as iterative label propagation (each node takes the min label in its
neighborhood until fixpoint) — a DataFrame loop whose per-iteration
work is one join + one groupBy, converging in O(diameter) rounds;
duplicate-cluster diameters are tiny in practice, and the classic
large-star/small-star optimization slots in here if they are not.

Driver check is rows-only (iterative); the exact gate is
tests/test_components.py vs a single-threaded union-find oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import CORPUS_SQL, _minhash_sql, corpus, dedup_minhash_lsh
from .relational import QuerySpec

CATALOG: dict[str, QuerySpec] = {}


def _register(name: str, sql=None):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn, sql)
        return fn

    return deco


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(node, component) with component = min node id reachable.
    Undirected; isolated nodes of the edge set keep their own id.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (a component with diameter > max_iter) —
    silently returning unconverged labels would hand the caller a
    WRONG clustering (round-2 ADVICE). Label propagation converges in
    O(diameter); raise max_iter or swap in large-star/small-star for
    pathological graphs."""
    if max_iter < 1:
        # Guard up front: with an empty loop range the for/else branch
        # below would reference `changed` unbound (ADVICE r2).
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    for _ in range(max_iter):
        # each node pulls the smallest label among itself and neighbors
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "node")
        )
        # localCheckpoint, not persist: persist caches the DATA but the
        # LOGICAL plan still grows by one join+agg per round, and
        # Catalyst re-analyzes the whole lineage every iteration —
        # quadratic-and-worse planning time by round ~20 (measured:
        # a 24-round path graph ran minutes/round). Checkpointing
        # truncates the plan to the materialized result each round —
        # the standard Spark iterative-algorithm shape.
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations (last round changed {changed} labels); "
            "raise max_iter for graphs with diameter > max_iter"
        )
    sym.unpersist()
    return labels


# FULL oracle despite the iterative Spark fixpoint: connected
# components of the (tiny-diameter) near-dup graph are expressible as
# a recursive-CTE transitive closure — each node's component is the
# min label it can reach over the symmetrized LSH pair set, which is
# exactly what label propagation converges to.
def _clusters_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT da, db FROM ({_minhash_sql()})
    ),
    sym AS (
        SELECT da AS a, db AS b FROM pairs
        UNION
        SELECT db, da FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach AS (
        SELECT node, node AS lab FROM nodes
        UNION
        SELECT s.a AS node, r.lab FROM sym s JOIN reach r ON r.node = s.b
    ),
    comp AS (SELECT node, min(lab) AS comp FROM reach GROUP BY node),
    alldocs AS (SELECT doc_id FROM ({CORPUS_SQL})),
    labeled AS (
        SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster
        FROM alldocs d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT cluster, COUNT(*) AS size, MIN(doc_id) AS canonical
    FROM labeled GROUP BY cluster
    """


@_register("dedup_clusters", _clusters_sql())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (MinHash+LSH) → duplicate clusters → per-cluster
    canonical (min doc_id) and size. Docs with no duplicate partner
    form singleton clusters. FULL oracle: recursive-CTE transitive
    closure over the same LSH pairs (label propagation's fixpoint is
    min-reachable-id, which the closure computes directly)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("da", "db")
    comp = connected_components(pairs, "da", "db")
    all_docs = corpus(spark, sf_dir).select("doc_id")
    labeled = (
        all_docs.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("comp", F.col("doc_id")).alias("cluster")
        )
    )
    return labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("size"),
        F.min("doc_id").alias("canonical"),
    )
