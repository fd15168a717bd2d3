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

    prev_sum = None
    for _ in range(max_iter):
        # hash-min step: label[v] <- min(label[v], min label of neighbors)
        nbr_min = (
            sym.join(labels, sym["v"] == labels["vertex"])
            .groupBy(sym["u"].alias("vertex2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        l1 = (
            labels.join(nbr_min, labels["vertex"] == nbr_min["vertex2"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        # pointer-jump step: label[v] <- label[label[v]] (path halving) —
        # turns O(diameter) convergence into ~O(log diameter) rounds;
        # valid because label[u] <= u always, so the jump only shrinks.
        tgt = l1.select(
            F.col("vertex").alias("t_vertex"), F.col("label").alias("t_label")
        )
        new_labels = (
            l1.join(tgt, l1["label"] == tgt["t_vertex"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce("t_label", F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint(eager=True)
        # convergence: labels only ever decrease, so the label sum is a
        # strictly-monotone progress measure — equal sum ⇔ fixpoint.
        # One tiny agg job instead of a join+count per round.
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
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
