"""End-to-end near-dup pipeline with checkpoint/resume + per-stage metrics.

Stage DAG (north_star):
  corpus → signatures → candidates (LSH) → edges (verify) → clusters (CC)

Every stage can checkpoint to ``workdir/<stage>`` (parquet + _SUCCESS);
``resume=True`` skips any stage whose checkpoint exists — the reference's
error-latch/drain protocol (writer.go:380-388) becomes idempotent
stage-overwrite + skip-if-done (SURVEY.md §2.7). A ``metrics`` table
records per-stage, per-output-file lineage (rows, bytes, wall_ms).

Storage: plain parquet directories in the sandbox; the same API writes
Iceberg tables when an iceberg-spark-runtime jar + catalog are configured
(no Maven access here — SURVEY.md §7 environment facts).
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig

# Corpora whose driver-measured parquet footprint is at or under this are
# "tail-latency" runs: the pipeline overlaps the cache-materialization
# count with tail-plan construction and pins the pair-side broadcast +
# drops the mega-bucket pre-filter job (all output-identical plan-shape
# choices). Compressed bytes, so ~2 GB ≈ a few tens of GB of text — well
# inside what a bounded candidate set can broadcast; everything larger
# keeps the strict stats-driven 100 TB plan shape.
SMALL_TAIL_MAX_BYTES = 2 << 30


def _dir_parquet_bytes(path: str) -> int:
    """Committed parquet bytes under a LOCAL directory — driver-side
    metadata only, no Spark job. Returns 0 when the path is not locally
    walkable (object-store URI, missing dir): ``os.walk`` yields nothing
    there, and callers MUST treat 0 as unmeasured-therefore-LARGE — a
    100 TB ``s3://`` corpus must never classify as a small-tail run just
    because the driver can't stat it."""
    total = 0
    for dirpath, _, names in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(dirpath, n))
            for n in names if n.endswith(".parquet")
        )
    return total


def _small_tail_gate(corpus_path: str | None, cfg: DedupConfig) -> bool:
    """True only for a POSITIVELY-measured small local corpus with the
    LCS gate off. No path, an unwalkable path (object-store URI), or an
    empty measurement all mean unmeasured → strict stats-driven planning;
    min_lcs > 0 keeps the strict path because the LCS stage joins the
    corpus itself, a stats-sensitive choice the small-tail overlap would
    otherwise freeze against unpopulated estimates."""
    if corpus_path is None or cfg.min_lcs > 0:
        return False
    return 0 < _dir_parquet_bytes(corpus_path) <= SMALL_TAIL_MAX_BYTES

# Bump whenever a checkpointed stage's SEMANTICS change (round 2: stages
# moved from member-level to representative-level frames). Folded into the
# checkpoint fingerprint so resume over an old workdir recomputes instead
# of silently loading stale-semantics data.
PIPELINE_SEMVER = 2


def config_fingerprint(cfg: DedupConfig) -> str:
    """Canonical JSON of every semantics-bearing knob + the pipeline
    schema version. A checkpoint written under a different fingerprint is
    never resumed: round-2's near-miss was ``resume=True`` over a workdir
    whose 'candidates' held member-level pairs under rep-level semantics —
    the silent-drop class this guard closes."""
    import dataclasses

    d = dataclasses.asdict(cfg)
    # state-layout knobs are not semantics-bearing (every layout remains
    # readable and results are identical), so they never invalidate a
    # checkpoint
    for k in ("state_buckets", "state_bucket_min_rows"):
        d.pop(k, None)
    return json.dumps({"semver": PIPELINE_SEMVER, **d}, sort_keys=True)


class Checkpointer:
    def __init__(self, spark: SparkSession, workdir: str | None,
                 fingerprint: str | None = None):
        self.spark = spark
        self.workdir = workdir
        self.fingerprint = fingerprint
        if workdir:
            os.makedirs(workdir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def has(self, stage: str) -> bool:
        if not (self.workdir and os.path.exists(
                os.path.join(self._path(stage), "_SUCCESS"))):
            return False
        if self.fingerprint is None:
            return True
        fp_file = os.path.join(self._path(stage), "_fingerprint.json")
        try:
            with open(fp_file) as f:
                return f.read() == self.fingerprint
        except OSError:
            return False  # pre-fingerprint checkpoint: recompute

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def write(self, stage: str, df: DataFrame, t0: float) -> DataFrame:
        """Materialize df, record lineage metrics, return the re-read frame
        (so downstream plans start from the checkpoint, cutting lineage)."""
        path = self._path(stage)
        # observe() rides the write job itself — row count measured AT
        # write time, zero extra scan, cross-checked against the committed
        # parquet footers below (a mismatch would mean lost/duplicated
        # rows between the job and the commit).
        obs = Observation(f"ckpt_{stage}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(path)
        observed_rows = int(obs.get["rows"])
        wall_ms = int((time.time() - t0) * 1000)
        out = self.spark.read.parquet(path)
        # per-file lineage from the parquet FOOTERS (driver-side metadata
        # read) — one output file per write partition, so this is the
        # per-partition row/byte lineage and costs no second Spark scan
        import pyarrow.parquet as pq

        files = []
        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(path, name)
            files.append(
                {
                    "file": name,
                    "rows": int(pq.ParquetFile(fp).metadata.num_rows),
                    "bytes": os.path.getsize(fp),
                }
            )
        meta = {
            "stage": stage,
            "wall_ms": wall_ms,
            "rows": int(sum(f["rows"] for f in files)),
            "observed_rows": observed_rows,
            "files": files,
        }
        with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(meta) + "\n")
        # the cross-check the lineage exists for (ADVICE r3: it was only
        # recorded, never compared). Footers holding MORE rows than the
        # write job observed means rows appeared that no task counted —
        # genuine corruption, refuse the checkpoint (raised before the
        # fingerprint lands, so resume will recompute). Observed > footers
        # is only a warning: task retries / speculative attempts can
        # double-count the observe() accumulator while the committed
        # output stays correct (exactly-once is per committed file, not
        # per attempt).
        if meta["rows"] > observed_rows:
            # remove the _SUCCESS marker BEFORE raising: the dir is already
            # committed, and a Checkpointer built without a fingerprint
            # would otherwise happily resume the checkpoint this check just
            # declared corrupt (ADVICE r4).
            try:
                os.remove(os.path.join(path, "_SUCCESS"))
            except OSError:
                pass
            raise RuntimeError(
                f"checkpoint '{stage}': committed footers hold "
                f"{meta['rows']} rows but the write job observed only "
                f"{observed_rows} — corrupt checkpoint, not resuming from it"
            )
        if meta["rows"] != observed_rows:
            import warnings

            warnings.warn(
                f"checkpoint '{stage}': observed {observed_rows} rows vs "
                f"{meta['rows']} committed (task retries can inflate the "
                "observation; recorded in metrics.jsonl)",
                stacklevel=2,
            )
        if self.fingerprint is not None:
            with open(os.path.join(path, "_fingerprint.json"), "w") as f:
                f.write(self.fingerprint)
        return out


def run_pipeline(
    corpus: DataFrame,
    cfg: DedupConfig | None = None,
    workdir: str | None = None,
    resume: bool = True,
    content_col: str = "content",
    id_col: str = "file_id",
    corpus_path: str | None = None,
) -> dict[str, DataFrame]:
    """Run (or resume) the full near-dup pipeline.

    ``corpus_path`` (optional): parquet directory backing ``corpus``.
    When given, the signature stage uses the Python-native columnar feed
    (``compute_signatures_direct`` — workers read their own row-group
    splits with pyarrow instead of being fed over JVM→Python Arrow IPC;
    row-for-row identical output, measured materially better feed
    scaling). All other stages consume ``corpus`` as usual.

    Returned frames:
      signatures   per-file MinHash/SimHash/shingle-sketch rows
      groups       exact-sketch group membership (file_id → rep)
      candidates   representative-level LSH candidate pairs
      edges_rep    representative-level verified/rejected edges (COMPACT —
                   the artifact to persist at corpus scale)
      edges        member-level pair surface: within-group pairs (jaccard
                   1) + verified rep pairs fanned out through membership —
                   lazy and quadratic in group sizes; collect/materialize
                   only for pair-level audits (the recall gate)
      clusters     (file_id, cluster_id) for every corpus row
    """
    from .operators.cluster import cluster_assignments
    from .operators.lsh import candidate_pairs, dropped_bucket_metrics
    from .operators.signatures import (
        compute_signatures, compute_signatures_direct,
    )
    from .operators.verify import verify_pairs

    cfg = cfg or DedupConfig()
    spark = corpus.sparkSession
    ckpt = Checkpointer(spark, workdir, config_fingerprint(cfg))

    from pyspark import StorageLevel

    def stage(name: str, build, persist: bool = True):
        t0 = time.time()
        if resume and ckpt.has(name):
            return ckpt.read(name)
        df = build()
        if workdir:
            return ckpt.write(name, df, t0)
        if not persist:
            # single-consumer stage: serializing it buys no reuse — let
            # the consumer fuse it into one stage chain
            return df
        # no checkpoint dir: persist multi-consumer stages so the
        # chunk+signature scan runs once, not once per downstream action.
        # MEMORY_AND_DISK_DESER (A/B-measured vs DISK_ONLY, both core
        # counts): the persisted signature frame is bounded by the sketch
        # caps (~10 KB/row whatever the file sizes), so it always fits the
        # heap, and the serialized-batch disk round-trip per tail scan was
        # pure overhead. The env knob exists for memory-tight deployments.
        lvl = getattr(StorageLevel,
                      os.environ.get("DEDUP_PERSIST_LEVEL",
                                     "MEMORY_AND_DISK_DESER"))
        return df.persist(lvl)

    from .operators.groups import (
        expand_group_edges, group_star_pairs, representative_ids,
        sketch_groups, with_groups,
    )

    _GROUP_COLS = ["g1", "g2", "rep", "group_size"]

    def _signatures():
        if corpus_path is not None:
            return compute_signatures_direct(
                spark, corpus_path, cfg, content_col, id_col
            )
        return compute_signatures(corpus, cfg, content_col, id_col)

    # signatures carry the distinct shingle sets too — ONE corpus scan
    # feeds both LSH banding and exact-Jaccard verification. Exact-sketch
    # group contraction (operators/groups.py — the 100 TB lever against
    # exact-copy-heavy corpora) makes LSH + verify run on one
    # representative per identical-signature group; candidate coverage and
    # pair jaccard are provably unchanged.
    if workdir:
        # checkpoint layout: narrow 'groups' stage + join-back (each stage
        # readable/resumable on its own)
        signatures = stage("signatures", _signatures)
        groups = stage("groups", lambda: sketch_groups(signatures))
        rep_sigs = signatures.join(representative_ids(groups), "file_id")
        verify_side = rep_sigs
        n_sigs = None  # not measured on this path: pre-filter stays on
        small_tail = False
        count_thread = None
    else:
        # fused plan: ONE wide exchange (window over the full signature
        # rows) yields signatures, groups, and rep_sigs as projections of
        # a single persisted frame — the narrow-window + wide-join layout
        # costs an extra exchange of the signature table for nothing when
        # no checkpoint needs the narrow frame on disk
        sig_groups = stage(
            "sig_groups", lambda: with_groups(_signatures())
        )
        # Materialize the persist NOW, in one dedicated job: the first
        # downstream action otherwise races its non-AQE broadcast-subquery
        # futures (LSH over-cap key scan) against its own main job, and
        # two concurrent jobs pulling an unpopulated cache compute the
        # signature kernel twice while thrashing the executor cores
        # (event-log measured: two overlapping ~10 s jobs at local[8]).
        # count() scans every partition fully, unlike a limit probe, so
        # the cache is complete before any consumer plans against it.
        # (A separate narrow "core" cache without the shingle arrays was
        # measured too: the extra cache-build pass cost more than the
        # narrower tail scans saved.)
        #
        # Measured-SMALL corpora (driver-side parquet footprint — known
        # before any job) additionally OVERLAP the count with the tail's
        # DataFrame construction: ~1-1.4 s of py4j round-trips + per-frame
        # analysis otherwise sit between the bulk job and the first tail
        # job (event-log gap), at every parallelism level. The overlap is
        # safe only because the one stats-sensitive physical choice in
        # the tail — the pair side of the verify joins — is PINNED by an
        # explicit broadcast hint on this path, so the edges_rep plan
        # frozen at persist-registration (against the not-yet-populated
        # cache) is identical to the plan the post-count statistics would
        # pick. Large or UNMEASURED corpora keep the strict count-first
        # sequencing and fully stats-driven planning (see
        # _small_tail_gate for the full opt-in conditions).
        small_tail = _small_tail_gate(corpus_path, cfg)
        count_thread = None
        if small_tail:
            count_thread = threading.Thread(target=sig_groups.count)
            count_thread.start()
            n_sigs = None  # unknown during overlapped construction
        else:
            n_sigs = sig_groups.count()
        signatures = sig_groups.drop(*_GROUP_COLS)
        groups = sig_groups.select("file_id", *_GROUP_COLS)
        rep_sigs = sig_groups.where(
            F.col("file_id") == F.col("rep")
        ).drop(*_GROUP_COLS)
        verify_side = rep_sigs
    shingles = verify_side.select("file_id", "shingles")
    # the cache-materialization count doubles as the measured row count
    # that cost-gates the mega-bucket pre-filter (small measured inputs
    # drop its dedicated job + broadcast future; output identical); on
    # the overlapped path the same gate decides from corpus bytes
    pairs = stage(
        "candidates",
        lambda: candidate_pairs(
            rep_sigs, cfg, n_rows=n_sigs,
            prefilter=False if small_tail else None,
        ),
        persist=False,
    )
    # stage name is "edges_rep", NOT round-1's "edges": the frame holds
    # REPRESENTATIVE-level edges now, and reusing the old name would let
    # resume=True silently load a pre-contraction member-level checkpoint
    # whose non-representative endpoints vanish in the expansion join.
    edges_rep = stage(
        "edges_rep",
        lambda: verify_pairs(pairs, verify_side, shingles, cfg,
                             broadcast_pairs=small_tail),
    )

    if cfg.min_lcs > 0:
        # the LCS gate is byte-level, so sketch-identical members cannot
        # inherit the representative's verdict: expand FIRST, gate every
        # member pair (opt-in quadratic cost), and cluster on the gated set.
        from .operators.verify import apply_lcs_gate

        edges_out = stage(
            "edges_lcs",
            lambda: apply_lcs_gate(
                expand_group_edges(edges_rep, groups),
                corpus, cfg, content_col, id_col,
            ),
        )
        cluster_input = edges_out.where("verified")
    else:
        # lazy quadratic pair surface for audits; clustering uses the
        # LINEAR compact set (group spanning stars + verified rep pairs) —
        # identical components by construction.
        edges_out = expand_group_edges(edges_rep, groups)
        cluster_input = group_star_pairs(groups).unionByName(
            edges_rep.where("verified").select("src", "dst")
        )

    # cluster over ids from the signature-derived frames (one row per
    # corpus row by construction of the kernel) — re-scanning the corpus
    # parquet for one column costs a listing + footer + scan pass per run.
    # with_groups keeps zero-shingle files (unique group keys), so the
    # no-workdir 'groups' projection is a complete id universe; the
    # checkpointed sketch_groups frame excludes them, so the workdir path
    # reads ids off the signatures checkpoint instead.
    id_frame = signatures if workdir else groups
    # star pairs (rep=group-min < member) and verified rep edges
    # (least/greatest distinct, cross-group) are canonical and disjoint by
    # construction, so CC may skip its canonicalization exchange; the
    # LCS-gated member-level set is not proven so and keeps the default.
    if count_thread is not None:
        # overlapped path: the cache MUST be fully populated before the
        # first tail action runs (the clusters stage below) — an
        # unpopulated multi-consumer cache double-computes the kernel
        # under concurrent broadcast futures. (If construction above
        # raises first, the thread just finishes its count on its own —
        # no state to clean up.)
        count_thread.join()
    clusters = stage(
        "clusters",
        lambda: cluster_assignments(
            id_frame.select("file_id"), cluster_input,
            edges_canonical=cfg.min_lcs <= 0
        ),
    )
    return {
        "signatures": signatures,
        "groups": groups,
        "shingles": shingles,
        "candidates": pairs,
        "edges_rep": edges_rep,
        "edges": edges_out,
        "clusters": clusters,
        # lazy one-row dropped-bucket accounting (no job unless collected):
        # the batch-path twin of the incremental fold's metrics.jsonl skew
        # counters — no silent truncation on either path
        "candidate_metrics": dropped_bucket_metrics(rep_sigs, cfg),
    }
