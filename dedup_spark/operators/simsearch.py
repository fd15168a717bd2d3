"""Similarity search over embedding columns (driver extras).

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  Pure JVM math: zip_with + aggregate, no Python. O(Q·N) dot products;
  fine when the query set is small or N fits a broadcast.
- ``lsh_topk``: random-hyperplane (sign) LSH bucketing — the scale path:
  candidates only within matching buckets, with multi-probe (Hamming-1
  bucket flips on the query side) and/or multiple independent hash tables
  for recall. Tested against the brute-force baseline (recall >= 0.9 at
  k=5, tests/test_extras.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_pairs(embeddings: DataFrame, queries: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 min_cos: float = 0.0) -> DataFrame:
    """All (query, item) cosine scores >= min_cos (query != item).

    The query side is broadcast (small by contract); the big side streams —
    no shuffle of the embedding table at all.
    """
    # norms computed per ROW on each side before the join (guide §2.3):
    # inlining them in the pair expression re-evaluates the item norm
    # once per (query, item) pair — Q× the work for bit-identical values
    # (same aggregate, same operand order in the divisor product).
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    x = embeddings.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("item_vec"),
    ).withColumn("item_norm", _norm(F.col("item_vec")))
    cos = _dot(F.col("q_vec"), F.col("item_vec")) / (
        F.col("q_norm") * F.col("item_norm")
    )
    return (
        x.join(F.broadcast(q))
        .where(F.col("q_id") != F.col("item_id"))
        .withColumn("cosine", F.round(cos, 6))
        .where(F.col("cosine") >= min_cos)
        .select("q_id", "item_id", "cosine")
    )


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query; deterministic tiebreak on item_id."""
    scored = cosine_pairs(embeddings, queries, id_col, vec_col, min_cos=-1.0)
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("item_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "item_id", "cosine", "rank")
    )


def hyperplane_signature(embeddings: DataFrame, n_bits: int = 16,
                         dim: int = 64, seed: int = 97,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane SimHash bucket id per vector (Charikar '02) —
    deterministic pseudo-random planes from the shared coefficient stream;
    sign pattern packed into a long. Pure JVM: the planes are a literal
    array baked into the plan (n_bits*dim doubles)."""
    import random

    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]
    vec = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return embeddings.select(
        F.col(id_col), F.col(vec_col), bucket.alias("bucket")
    )


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int,
             n_bits: int = 12, dim: int = 64,
             n_probes: int = 1, n_tables: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share a hyperplane bucket; exact
    cosine + rank within candidates. Scale path: the join is on bucket id
    (equi-join, shuffle on a short key), never all-pairs.

    Recall levers (single-probe single-table hyperplane LSH at realistic
    n_bits misses neighbors that straddle one plane):

    * ``n_probes`` — multi-probe (Lv et al., VLDB'07 style): each query
      additionally probes the buckets at Hamming distance 1 from its own
      (bit flips), up to ``n_probes`` buckets total. Costs query-side
      replication only; the item table is scanned/bucketed once.
    * ``n_tables`` — independent plane sets; a neighbor is found if ANY
      table buckets it with the query. Costs one signature pass per table.
    """
    cands = None
    for t in range(n_tables):
        seed = 97 + 131 * t
        sig = hyperplane_signature(embeddings, n_bits, dim, seed, id_col, vec_col)
        qsig = hyperplane_signature(queries, n_bits, dim, seed, id_col, vec_col)
        masks = [0] + [1 << i for i in range(n_bits)]
        masks = masks[: max(1, min(n_probes, len(masks)))]
        qprobe = qsig.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(m)).cast("long")
                      for m in masks]
                )
            ).alias("bucket"),
        )
        c = (
            sig.alias("x")
            .join(
                F.broadcast(qprobe.alias("q")),
                F.col("x.bucket") == F.col("q.bucket"),
            )
            .where(F.col(f"x.{id_col}") != F.col(f"q.{id_col}"))
            .select(
                F.col(f"q.{id_col}").alias("q_id"),
                F.col(f"q.{vec_col}").cast("array<double>").alias("q_vec"),
                F.col(f"x.{id_col}").alias("item_id"),
                F.col(f"x.{vec_col}").cast("array<double>").alias("item_vec"),
            )
        )
        cands = c if cands is None else cands.unionByName(c)
    # a (query, item) pair can match through several probes/tables
    cand = cands.dropDuplicates(["q_id", "item_id"])
    # per-pair norms, but written as the same divisor product as
    # cosine_pairs (q first) so both paths stay value-identical
    cos = _dot(F.col("q_vec"), F.col("item_vec")) / (
        _norm(F.col("q_vec")) * _norm(F.col("item_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "item_id", "cosine", "rank")
    )
