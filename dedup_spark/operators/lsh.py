"""Stage 4a: LSH banding — signatures → candidate pairs (SURVEY.md J7).

Plan shape (all relational):

  signatures
    → explode K minhash values into b bands of r rows        (JVM-side)
    → band_hash = xxhash64(band_id, r-slice)                 (JVM-side)
    → mega-bucket pre-filter: partial-agg count on the band key (shuffle
      volume = distinct keys) finds >max_bucket·salt keys; they are
      broadcast-anti-joined out so no window task ever buffers one
    → shuffle on (band_id, band_hash); bucket sizes via a window count
      over that partitioning (no join back)
    → skew ladder per bucket size s (north_rule: explicit skew handling,
      no silent truncation):
        s ≤ max_bucket          → direct in-partition pair-gen
        s ≤ max_bucket·salt     → SALTED pair-gen: members split into
          ceil(s/max_bucket) blocks; every block pair (i ≤ j) becomes its
          own task key, so no task ever materializes more than
          ~2·max_bucket members. Recall-neutral — every member pair lands
          in exactly one block pair.
        s > max_bucket·salt     → dropped WITH LOGGED METRICS (true
          boilerplate mega-buckets: quadratic pair-gen is never the right
          answer there at any parallelism)
    → distinct pairs

The window count buffers each bucket group in-partition
(ExternalAppendOnlyUnsafeRowArray — spills, never OOMs); the downstream
collect_list group sizes are bounded by max_bucket after the filter. At
100 TB the band shuffle is the dominant cost: payload is
(band_hash, file_id) only — 16 bytes a row — never content or signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig


def band_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode signatures into (band_id, band_hash, file_id)."""
    r = cfg.rows_per_band
    # slice(minhash, band*r+1, r) per band; band ids 0..b-1
    bands = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(cfg.bands - 1)),
            lambda band: F.struct(
                band.alias("band_id"),
                F.xxhash64(
                    band, F.slice(F.col("minhash"), band * r + 1, r)
                ).alias("band_hash"),
            ),
        )
    )
    return (
        signatures.where(F.col("n_shingles") > 0)  # empty files never match
        .select("file_id", bands.alias("band"))
        .select("file_id", "band.band_id", "band.band_hash")
    )


def bucket_stats(buckets: DataFrame) -> DataFrame:
    """Bucket-size distribution — the skew metric table."""
    return (
        buckets.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
    )


def dropped_bucket_metrics(signatures: DataFrame,
                           cfg: DedupConfig) -> DataFrame:
    """The candidate ladder's dropped-bucket accounting as a standalone
    LAZY one-row frame (dropped_buckets, dropped_rows, max_bucket_size) —
    ``run_pipeline`` returns it so batch runs surface the capped-bucket
    regime the same way the incremental fold's metrics.jsonl does; it
    costs a job only when actually collected."""
    salt_cap = cfg.max_bucket * max(1, cfg.salt)
    return bucket_stats(band_buckets(signatures, cfg)).where(
        F.col("bucket_size") > salt_cap
    ).agg(
        F.count("*").alias("dropped_buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("dropped_rows"),
        F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_bucket_size"),
    )


_PAIRS_IN_LIST = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids) - i - 1), "
    "y -> struct(least(x, y) AS src, greatest(x, y) AS dst))))"
)

_PAIRS_ACROSS_LISTS = (
    "flatten(transform(ids, x -> "
    "transform(ids_r, y -> "
    "struct(least(x, y) AS src, greatest(x, y) AS dst))))"
)


# Below this many band rows the mega-bucket PRE-FILTER is cost-gated
# off: its dedicated aggregation job + broadcast future serialize ~1 s of
# driver latency per run, while the damage it prevents — one window task
# buffering a whole boilerplate bucket in a spillable array before the
# cap drops it — is bounded by TOTAL band rows, i.e. ≤ ~80 MB of 16-byte
# rows at this threshold (linear scan + spill, not a quadratic blow-up).
# Callers that KNOW the row count (the pipeline measures it when
# materializing the signature cache) pass it; unknown defaults to the
# pre-filter staying on, which is the correct 100 TB posture.
PREFILTER_MIN_BAND_ROWS = 5_000_000


def candidate_pairs(signatures: DataFrame, cfg: DedupConfig,
                    return_metrics: bool = False,
                    n_rows: int | None = None,
                    prefilter: bool | None = None):
    """Distinct (src, dst) candidate pairs from banded MinHash.

    One unified salted path: every bucket is split into
    ``nb = ceil(size / max_bucket)`` blocks and every block pair (i ≤ j)
    becomes its own aggregation group, so no task ever materializes more
    than ~2·max_bucket members. ``nb = 1`` (the common case) degenerates to
    plain in-bucket pair generation with zero replication, so small and hot
    buckets share one plan: scan → window count (the only wide exchange) →
    in-partition groupBy (prefix partitioning, no second exchange) → pair
    explode → distinct. Buckets beyond ``max_bucket * salt`` are excluded
    and surfaced in the metrics frame — explicit, logged skew handling
    instead of a silent quadratic blow-up.

    ``n_rows``: measured signature-row count, if the caller has one (the
    pipeline's cache-materialization barrier returns it for free). Small
    measured inputs drop the mega-bucket pre-filter job — the cap itself
    still applies inside the window pass, so the pair OUTPUT is identical
    either way; only the plan shape changes. An explicit ``prefilter``
    overrides the row-count heuristic (the pipeline's overlapped-tail
    path decides from driver-measured corpus bytes before any count
    exists).
    """
    if prefilter is None:
        prefilter = (n_rows is None
                     or n_rows * cfg.bands > PREFILTER_MIN_BAND_ROWS)
    return salted_pairs(
        band_buckets(signatures, cfg), cfg.max_bucket, cfg.salt,
        return_metrics=return_metrics, prefilter=prefilter,
    )


def salted_pairs(buckets: DataFrame, max_b: int, salt: int | None,
                 key_cols: tuple[str, ...] = ("band_id", "band_hash"),
                 id_col: str = "file_id",
                 return_metrics: bool = False,
                 dedupe: bool = True,
                 prefilter: bool = True):
    """The skew-laddered pair generator over arbitrary bucket frames.

    ``buckets`` holds one row per (bucket key, member id); key columns and
    the id column are parametric so every bucketed pair-gen in the repo
    (MinHash band buckets, the entry-level SQL-parity band twin, the
    within-exact-group audit expansions, salted block tests) shares ONE
    implementation of the ladder:
      size ≤ max_b        → direct in-partition pair-gen
      size ≤ max_b·salt   → salted blocks, ≤ ~2·max_b members per task
      size > max_b·salt   → dropped, surfaced in the metrics frame

    ``salt=None`` runs the ladder UNCAPPED: nothing is ever dropped, but
    every bucket still flows through the salted-block scheme, so no single
    task materializes more than ~2·max_b members' pairs — the contract the
    audit/parity surfaces need (they must emit the complete pair set, yet
    a 10^5-member exact-dup boilerplate group must not land C(n,2) pairs
    in one task). ``dedupe=False`` skips the trailing distinct exchange —
    correct whenever each member pair can reach at most one bucket (e.g.
    bucket key = the group key of a partition of the ids), where the block
    scheme already emits each pair exactly once.
    """
    keys = list(key_cols)
    cap = None
    if salt is None:
        cold, hot = buckets, None
    else:
        salt_cap = max_b * max(1, salt)
        if prefilter:
            # mega-bucket pre-filter (ADVICE r2): the window pass buffers
            # each bucket in ONE task's spillable array, so a power-law
            # boilerplate band would serialize a whole task on rows that
            # are dropped anyway. A groupBy count first (map-side partial
            # agg — shuffle volume is distinct keys, not rows) finds the
            # >salt_cap keys; they are broadcast-anti-joined out BEFORE
            # the window ever buffers them. Hot keys are bounded by
            # total_rows/salt_cap (each needs >salt_cap rows), so the
            # broadcast side stays tiny by construction.
            hot = (
                buckets.groupBy(*keys)
                .agg(F.count("*").alias("bucket_size"))
                .where(F.col("bucket_size") > salt_cap)
            )
            cold = buckets.join(
                F.broadcast(hot.select(*keys)), keys, "left_anti"
            )
        else:
            # cost-gated OFF for measured-small inputs (candidate_pairs):
            # the cap moves inside the window pass — same buckets dropped,
            # identical pair output — and the tail loses the pre-filter's
            # dedicated job + serialized broadcast future. Worst case a
            # task buffers every band row of the (small) input once,
            # linearly, before the cap filter drops the bucket.
            hot = None
            cold = buckets
            cap = salt_cap
    groups = _block_tasks(cold, max_b, keys, id_col, cap=cap)
    pairs = groups.select(
        F.explode(
            F.when(F.col("bi") == F.col("bj"), F.expr(_PAIRS_IN_LIST))
            .otherwise(F.expr(_PAIRS_ACROSS_LISTS))
        ).alias("p")
    ).select("p.src", "p.dst")
    if dedupe:
        pairs = pairs.distinct()
    if not return_metrics:
        return pairs
    # the dropped-bucket metrics ARE the pre-filter's hot-key table — no
    # extra pass over the bucket frame (uncapped mode drops nothing by
    # definition and reports literal zeros)
    if salt is not None and hot is None:
        # capped but pre-filter gated off: same accounting, rebuilt lazily
        # from the bucket frame (costs a job only if actually collected)
        hot = (
            buckets.groupBy(*keys)
            .agg(F.count("*").alias("bucket_size"))
            .where(F.col("bucket_size") > cap)
        )
    if hot is None:
        spark = buckets.sparkSession
        dropped = spark.range(1).select(
            F.lit(0).alias("dropped_buckets"),
            F.lit(0).alias("dropped_rows"),
            F.lit(0).alias("max_bucket_size"),
        )
    else:
        dropped = hot.agg(
            F.count("*").alias("dropped_buckets"),
            F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("dropped_rows"),
            F.coalesce(F.max("bucket_size"), F.lit(0)).alias(
                "max_bucket_size"),
        )
    return pairs, dropped


def _block_tasks(cold: DataFrame, max_b: int, keys: list[str],
                 id_col: str, cap: int | None = None) -> DataFrame:
    """Bucket members → one row per block-pair task with its (bounded)
    member lists. Split out of ``salted_pairs`` so tests can assert the
    per-task list-size bound directly. ``cap``: drop buckets larger than
    this AFTER the window count (the no-pre-filter plan shape)."""
    w = Window.partitionBy(*keys)
    size_ok = F.col("bucket_size") >= 2
    if cap is not None:
        size_ok = size_ok & (F.col("bucket_size") <= cap)
    counted = cold.withColumn("bucket_size", F.count("*").over(w)).where(
        size_ok
    )
    # block id per member + one row per block-pair task it belongs to; a
    # member in block b joins tasks (min(b,t), max(b,t)) for every t. The
    # diagonal task pairs within its own member list; off-diagonal tasks
    # cross-pair their two disjoint lists ("l"/"r" by block order).
    nb = F.ceil(F.col("bucket_size") / max_b).cast("int")
    tasked = counted.select(
        *keys,
        id_col,
        F.pmod(F.xxhash64(id_col), nb).cast("int").alias("blk"),
        F.explode(F.sequence(F.lit(0), nb - 1)).alias("t"),
    ).select(
        *keys,
        id_col,
        F.least("blk", "t").alias("bi"),
        F.greatest("blk", "t").alias("bj"),
        F.when(F.col("blk") == F.col("t"), F.lit("d"))
        .when(F.col("blk") < F.col("t"), F.lit("l"))
        .otherwise(F.lit("r"))
        .alias("side"),
    )
    # no sort_array: pair canonicalization is least/greatest inside the
    # pair expressions, and the caller dedupes if needed — list order is
    # irrelevant (and sorting every bucket was measurable CPU)
    return tasked.groupBy(*keys, "bi", "bj").agg(
        F.collect_list(
            F.when(F.col("side") != "r", F.col(id_col))
        ).alias("ids"),
        F.collect_list(
            F.when(F.col("side") == "r", F.col(id_col))
        ).alias("ids_r"),
    )
