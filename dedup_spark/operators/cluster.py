"""Stage 5: connected components — verified edges → cluster ids.

Min-contraction connected components (the MapReduce CC family — Kiveris
et al. SOCC'14): each round every vertex adopts the minimum id in its
closed neighborhood as representative, the edge set is rewritten onto
representatives, self-edges vanish, and the (much smaller) contracted
graph iterates. Near-dup graphs are clique-heavy, so the edge set
collapses after the first round and convergence is O(log n) rounds on
pathological chains. All join+agg — no driver-side graph state; each
round localCheckpoints to cut lineage (SURVEY.md §4.3).

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
                         n_partitions: int | None = None) -> DataFrame:
    """Return (file_id, cluster_id) for every vertex appearing in edges.

    ``n_partitions`` sizes the per-round shuffles. The contracted graph
    shrinks drastically after round one, so a small fixed width avoids
    paying hundreds of near-empty tasks per round; at true cluster scale
    pass something proportional to the edge count.
    """
    spark = edges.sparkSession
    if n_partitions is None:
        n_partitions = max(8, spark.sparkContext.defaultParallelism // 4)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        return _cc_loop(edges, max_iter, n_partitions)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


DRIVER_FINALIZE_EDGES = 500_000  # collect threshold: ~8 MB of (u,v) longs


def _finalize_on_driver(e: DataFrame, mapping: DataFrame) -> DataFrame:
    """Small-remainder finalize: union-find the contracted graph on the
    driver (a few MB at most — the distributed rounds only stop when the
    edge count is under DRIVER_FINALIZE_EDGES) and apply the root map to
    the vertex mapping with one broadcast join. Saves 2-3 full join
    rounds of barrier latency; at real scale the distributed contraction
    keeps running until the remainder fits."""
    from ..oracle import UnionFind

    spark = e.sparkSession
    uf = UnionFind()
    for u, v in e.select("u", "v").collect():
        uf.union(u, v)
    roots: dict[int, int] = {}
    comp: dict[int, int] = {}
    for x in list(uf.parent):
        r = uf.find(x)
        comp.setdefault(r, r)
        comp[r] = min(comp[r], x)
    for x in list(uf.parent):
        roots[x] = comp[uf.find(x)]
    if not roots:
        return mapping
    from pyspark.sql import functions as F2

    rmap = spark.createDataFrame(
        list(roots.items()), "label long, final_label long"
    )
    return mapping.join(F2.broadcast(rmap), "label", "left").select(
        "vertex",
        F2.coalesce("final_label", F2.col("label")).alias("label"),
    )


def _cc_loop(edges: DataFrame, max_iter: int, n_partitions: int) -> DataFrame:
    from pyspark import StorageLevel

    # persist BEFORE the probe: on the big-graph branch the probe's partial
    # compute is reused by the localCheckpoint instead of re-deriving the
    # whole canon lineage (which may be an expensive pair-gen pipeline)
    canon = _canon(edges).persist(StorageLevel.DISK_ONLY)
    # Fast path: small graphs skip the distributed rounds entirely — ONE
    # limit-guarded collect (no separate count job), union-find on the
    # driver, one createDataFrame back. The limit probe is the size test:
    # getting <= threshold rows back means we got ALL rows.
    probe = canon.limit(DRIVER_FINALIZE_EDGES + 1).collect()
    if len(probe) <= DRIVER_FINALIZE_EDGES:
        from ..oracle import UnionFind, oracle_clusters

        canon.unpersist()
        uf = UnionFind()
        pairs = [(r[0], r[1]) for r in probe]
        for u, v in pairs:
            uf.union(u, v)
        assign = oracle_clusters(list(uf.parent), pairs)
        spark = edges.sparkSession
        return spark.createDataFrame(
            list(assign.items()), "file_id long, cluster_id long"
        )

    e = canon.repartition(n_partitions).localCheckpoint(eager=True)
    canon.unpersist()
    mapping = (
        e.select(F.col("u").alias("vertex"))
        .unionAll(e.select(F.col("v").alias("vertex")))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        n_edges = e.count()
        if n_edges == 0:
            break
        if n_edges <= DRIVER_FINALIZE_EDGES:
            mapping = _finalize_on_driver(e, mapping)
            break
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # representative = min of closed neighborhood
        rep = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("rep"))
        )
        # compose into the vertex→label mapping (labels are current reps;
        # isolated roots keep their label via the left join)
        mapping = (
            mapping.join(
                rep.withColumnsRenamed({"u": "label", "rep": "new_label"}),
                "label",
                "left",
            )
            .select(
                "vertex",
                F.coalesce("new_label", F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # contract edges onto representatives; self-edges vanish
        ru = rep.withColumnsRenamed({"u": "u", "rep": "ru"})
        rv = rep.withColumnsRenamed({"u": "v", "rep": "rv"})
        e = (
            e.join(ru, "u")
            .join(rv, "v")
            .select(
                F.least("ru", "rv").alias("u"),
                F.greatest("ru", "rv").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    return mapping.select(
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
