"""Incremental + Structured Streaming dedup: two-batch fold equals the
one-shot batch result; state is append-only and replay-idempotent
(SURVEY.md §2.7 incremental mode)."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.pipeline import run_pipeline
from dedup_spark.streaming import (
    compact_state, current_clusters, expanded_edges, incremental_update,
    stream_corpus,
)
from dedup_spark.synth import corpus_df

CFG = DedupConfig()


def _pairs(df):
    return {(r["src"], r["dst"]) for r in df.select("src", "dst").collect()}


def _file_digests(root):
    """sha256 of every data file under root, keyed by relative path."""
    out = {}
    for dirpath, _, names in os.walk(root):
        for name in names:
            if name.startswith("."):
                continue
            fp = os.path.join(dirpath, name)
            with open(fp, "rb") as f:
                out[os.path.relpath(fp, root)] = hashlib.sha256(
                    f.read()
                ).hexdigest()
    return out


def test_incremental_matches_batch(spark, tmp_path_factory):
    corpus = corpus_df(spark, 200, seed=11).cache()
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))

    state = str(tmp_path_factory.mktemp("state"))
    first = corpus.where("file_id < 120")
    second = corpus.where("file_id >= 120")
    incremental_update(first, state, CFG)
    out = incremental_update(second, state, CFG)
    inc_edges = _pairs(out["edges"].where("verified"))
    assert inc_edges == batch_edges

    # clusters over cumulative state match batch clusters as a partition
    batch_cl = {
        r["file_id"]: r["cluster_id"]
        for r in run_pipeline(corpus, CFG)["clusters"].collect()
    }
    inc_cl = {
        r["file_id"]: r["cluster_id"]
        for r in current_clusters(spark, state).collect()
    }
    assert inc_cl == batch_cl


def test_state_is_append_only(spark, tmp_path_factory):
    """VERDICT r2 #3: a second batch must not rewrite the first batch's
    state files — per-batch write volume scales with the batch, not the
    corpus. Every batch-0 file stays byte-identical."""
    corpus = corpus_df(spark, 120, seed=17).cache()
    state = str(tmp_path_factory.mktemp("state_ao"))
    incremental_update(corpus.where("file_id < 60"), state, CFG)

    before = _file_digests(os.path.join(state, "signatures"))
    assert before, "first batch wrote no signature files"
    assert all("batch_id=0" in p for p in before)

    incremental_update(corpus.where("file_id >= 60"), state, CFG)
    after = _file_digests(os.path.join(state, "signatures"))
    for path, digest in before.items():
        assert after.get(path) == digest, f"batch-0 file rewritten: {path}"
    assert any("batch_id=1" in p for p in after)

    # per-batch skew/lineage metrics recorded (ADVICE r2: the incremental
    # path surfaces dropped buckets like the batch path)
    lines = [
        json.loads(l)
        for l in open(os.path.join(state, "metrics.jsonl"))
    ]
    assert [m["batch_id"] for m in lines] == [0, 1]
    assert all("dropped_buckets" in m and "new_rows" in m for m in lines)


def test_replay_is_idempotent(spark, tmp_path_factory):
    """Re-folding an already-committed batch id is a no-op (Structured
    Streaming restart semantics)."""
    corpus = corpus_df(spark, 80, seed=19).cache()
    state = str(tmp_path_factory.mktemp("state_replay"))
    incremental_update(corpus.where("file_id < 40"), state, CFG, batch_id=0)
    incremental_update(corpus.where("file_id >= 40"), state, CFG, batch_id=1)
    edges_once = _pairs(expanded_edges(spark, state))
    sig_before = _file_digests(os.path.join(state, "signatures"))

    # replay batch 1 with the SAME id: state unchanged
    incremental_update(corpus.where("file_id >= 40"), state, CFG, batch_id=1)
    assert _pairs(expanded_edges(spark, state)) == edges_once
    assert _file_digests(os.path.join(state, "signatures")) == sig_before


def test_incremental_cost_proportional_to_batch(spark, tmp_path_factory):
    """VERDICT r3 #2: the per-batch fold must not re-shuffle the full
    cumulative signature table. The fold's own lineage counters (written
    per batch to metrics.jsonl) pin it: after a large bootstrap batch, a
    small batch's group-delta/born/touched-bucket row counts scale with
    the SMALL batch, not with the state."""
    corpus = corpus_df(spark, 170, seed=23).cache()
    state = str(tmp_path_factory.mktemp("state_prop"))
    incremental_update(corpus.where("file_id < 150"), state, CFG)
    incremental_update(corpus.where("file_id >= 150 AND file_id < 160"),
                       state, CFG)
    incremental_update(corpus.where("file_id >= 160"), state, CFG)

    m = [json.loads(l) for l in open(os.path.join(state, "metrics.jsonl"))]
    assert [x["batch_id"] for x in m] == [0, 1, 2]
    # state written per batch ∝ batch
    for x in m[1:]:
        assert x["new_rows"] == 10
        assert x["new_groups"] <= 10
        assert x["born_groups"] <= 10
    # bootstrap wrote the big batch's groups once
    assert m[0]["new_groups"] > 100
    # touched band state ∝ batch: each new rep touches ≤ bands buckets,
    # and each touched bucket's OLD membership is what gets read — far
    # below the full band index of the 150-file bootstrap state
    total_band_state = m[0]["born_groups"] * CFG.bands
    for x in m[1:]:
        assert x["touched_old_band_rows"] <= 10 * CFG.bands * 4
        assert x["touched_old_band_rows"] < total_band_state / 3
    # and the result still equals the one-shot batch run
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == batch_edges


def test_stranded_batch_recovery(spark, tmp_path_factory):
    """ADVICE r3 (medium): in auto-id mode, a batch that committed its
    signatures but crashed before its edges partition must be re-folded
    before the next id is assigned — otherwise its rows silently age into
    the 'old' window and their near-dup edges are lost forever."""
    import shutil

    corpus = corpus_df(spark, 120, seed=29).cache()
    state = str(tmp_path_factory.mktemp("state_crash"))
    incremental_update(corpus.where("file_id < 60"), state, CFG)
    incremental_update(corpus.where("file_id >= 60 AND file_id < 90"),
                       state, CFG)
    # simulate the crash window: batch 1's signatures are committed but
    # its edges (the commit marker) never landed
    shutil.rmtree(os.path.join(state, "edges", "batch_id=1"))

    incremental_update(corpus.where("file_id >= 90"), state, CFG)
    # batch 1 was re-folded (edges partition restored), batch 2 appended
    assert os.path.exists(
        os.path.join(state, "edges", "batch_id=1", "_SUCCESS"))
    assert os.path.exists(
        os.path.join(state, "edges", "batch_id=2", "_SUCCESS"))
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == batch_edges
    # lineage (ADVICE r4): the re-fold appends a SECOND metrics line for
    # batch 1, flagged so consumers can tell it from the first fold
    with open(os.path.join(state, "metrics.jsonl")) as f:
        lines = [json.loads(ln) for ln in f]
    b1 = [m for m in lines if m["batch_id"] == 1]
    assert len(b1) == 2
    assert "refold" not in b1[0] and b1[1]["refold"] is True
    assert not any(m.get("refold") for m in lines if m["batch_id"] != 1)


def test_state_compaction(spark, tmp_path_factory):
    """Maintenance compaction merges the per-batch narrow delta dirs into
    one base partition without changing any derived result, later batches
    fold against the base, and pre-watermark replays stay no-ops."""
    corpus = corpus_df(spark, 160, seed=43).cache()
    state = str(tmp_path_factory.mktemp("state_compact"))
    for lo, hi in ((0, 60), (60, 100), (100, 130)):
        incremental_update(
            corpus.where(f"file_id >= {lo} AND file_id < {hi}"), state, CFG)
    edges_before = _pairs(expanded_edges(spark, state).where("verified"))

    out = compact_state(spark, state)
    assert out["through"] == 2 and out["merged_batches"] == 3
    for table in ("groups", "members", "repsigs", "bands", "edges"):
        dirs = os.listdir(os.path.join(state, table))
        assert dirs == ["batch_id=2"], (table, dirs)
    # signatures are replay inputs — never compacted
    assert sorted(os.listdir(os.path.join(state, "signatures"))) == [
        "batch_id=0", "batch_id=1", "batch_id=2",
    ]
    assert _pairs(expanded_edges(spark, state).where("verified")) == edges_before

    # a replay of a pre-watermark batch id is a committed no-op
    sig_digests = _file_digests(state)
    incremental_update(corpus.where("file_id < 60"), state, CFG, batch_id=1)
    assert _file_digests(state) == sig_digests

    # the next batch folds against the compacted base and the cumulative
    # result still equals the one-shot batch run
    incremental_update(corpus.where("file_id >= 130"), state, CFG)
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == batch_edges
    batch_cl = {
        r["file_id"]: r["cluster_id"]
        for r in run_pipeline(corpus, CFG)["clusters"].collect()
    }
    inc_cl = {
        r["file_id"]: r["cluster_id"]
        for r in current_clusters(spark, state).collect()
    }
    assert inc_cl == batch_cl


def test_old_format_state_migration(spark, tmp_path_factory):
    """A state holding only signatures+edges (the pre-narrow-index layout)
    must be transparently migrated at the next fold: the narrow index
    partitions are rebuilt in batch order from the stored signatures, and
    the subsequent batch pairs against ALL prior state, not just itself."""
    import shutil

    corpus = corpus_df(spark, 120, seed=47).cache()
    state = str(tmp_path_factory.mktemp("state_mig"))
    incremental_update(corpus.where("file_id < 50"), state, CFG)
    incremental_update(corpus.where("file_id >= 50 AND file_id < 90"),
                       state, CFG)
    # strip the narrow index tables — what an old-release state dir holds
    for table in ("groups", "members", "repsigs", "bands"):
        shutil.rmtree(os.path.join(state, table))

    incremental_update(corpus.where("file_id >= 90"), state, CFG)
    for table in ("groups", "members", "repsigs", "bands"):
        assert sorted(os.listdir(os.path.join(state, table))) == [
            "batch_id=0", "batch_id=1", "batch_id=2",
        ], table
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == batch_edges


def test_state_frames_lazy_mapping(spark, tmp_path_factory):
    """incremental_update returns a LAZY frame mapping (plan construction
    deferred to first access); every dict-style read path must go through
    the lazy builder — a plain dict .get/.items would silently return
    nothing."""
    corpus = corpus_df(spark, 60, seed=3).cache()
    state = str(tmp_path_factory.mktemp("state_lazy"))
    out = incremental_update(corpus, state, CFG)
    assert set(out.keys()) == {"signatures", "edges_compact", "edges"}
    assert len(out) == 3 and "edges" in out
    assert out.get("edges") is not None
    assert out.get("nope", 42) == 42
    assert {k for k, _ in out.items()} == set(out.keys())
    assert all(v is not None for v in out.values())
    assert out["signatures"].count() == 60
    # memoized: second access returns the same DataFrame object
    assert out["edges"] is out["edges"]


def test_broadcast_gate_is_bytes_based(spark, tmp_path_factory, monkeypatch):
    """VERDICT r4 #3: the explicit-broadcast gate measures committed
    parquet BYTES, so a wide-key schema cannot smuggle an oversized
    broadcast past a row-count cap — few rows but fat payload must drop
    the hint."""
    from dedup_spark import streaming as st

    p = os.path.join(str(tmp_path_factory.mktemp("wide")), "part")
    spark.range(64).select(
        "id",
        F.sha2(F.col("id").cast("string"), 512).alias("wide_key"),
    ).write.mode("overwrite").parquet(p)
    committed = st._part_bytes(p)
    assert committed > 0
    # cap below the committed size: hint must degrade to identity even
    # though the row count (64) is trivially broadcastable
    monkeypatch.setattr(st, "_BROADCAST_MAX_BYTES", committed - 1)
    assert st._part_hint(p) is not F.broadcast
    df = spark.range(3)
    assert st._part_hint(p)(df) is df  # identity, not a hinted copy
    # cap above: broadcast allowed
    monkeypatch.setattr(st, "_BROADCAST_MAX_BYTES", committed + 1)
    assert st._part_hint(p) is F.broadcast


def test_bucketed_band_state_and_pruned_fold(spark, tmp_path_factory,
                                             monkeypatch):
    """100 TB scale path: bands + repsigs state committed in the
    self-describing bucketed layouts (bh<P>= / fb<P>= hive subdirs) lets
    a small batch's fold partition-prune BOTH the prior band index (to
    its touched buckets) and the prior rep-sketch table (to its verify
    endpoints' buckets) — scan cost follows the batch, not the state —
    with results identical to the flat layout and the one-shot batch
    run."""
    from dedup_spark import streaming as st

    cfg = DedupConfig(state_buckets=64, state_bucket_min_rows=0)
    corpus = corpus_df(spark, 142, seed=37).cache()
    state = str(tmp_path_factory.mktemp("state_bucket"))
    incremental_update(corpus.where("file_id < 139"), state, cfg)
    b0 = os.path.join(state, "bands", "batch_id=0")
    assert st._bucket_scheme(b0, "bh") == 64
    assert any(n.startswith("bh64=") for n in os.listdir(b0))
    r0 = os.path.join(state, "repsigs", "batch_id=0")
    assert st._bucket_scheme(r0, "fb") == 64
    assert st._bucket_scheme(r0, "bh") is None  # prefixes don't cross-match
    assert any(n.startswith("fb64=") for n in os.listdir(r0))

    # a 1-file batch touches ≤ cfg.bands buckets of the 64 — with the
    # prune gate forced on, the fold must read strictly fewer bucket
    # dirs than exist (for the band index AND the wide rep-sketch
    # endpoint fetch), and still produce batch-identical results
    monkeypatch.setattr(st, "_PRUNE_MIN_BYTES", 0)
    incremental_update(corpus.where("file_id = 139"), state, cfg)
    lines = [json.loads(l) for l in open(os.path.join(state, "metrics.jsonl"))]
    m1 = lines[1]
    assert "touched_buckets" in m1["phase_ms"]
    assert 0 < m1["band_state_buckets_read"] <= CFG.bands
    assert m1["band_state_buckets_read"] < m1["band_state_buckets_total"]
    assert "touched_endpoints" in m1["phase_ms"]
    assert 0 < m1["repsig_state_buckets_read"]
    assert m1["repsig_state_buckets_read"] < m1["repsig_state_buckets_total"]
    part = _pairs(run_pipeline(
        corpus.where("file_id < 140"), CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == part

    # compaction keeps the bucketed layout on the merged base (that is
    # where bucketing pays most) and changes no derived result
    out = compact_state(spark, state, cfg)
    assert out["merged_batches"] == 2
    base = os.path.join(state, "bands", "batch_id=1")
    assert st._bucket_scheme(base, "bh") == 64
    assert st._bucket_scheme(
        os.path.join(state, "repsigs", "batch_id=1"), "fb") == 64
    assert _pairs(expanded_edges(spark, state).where("verified")) == part

    # a further small fold against the bucketed base (mixed-reader path)
    # still prunes and still matches the one-shot batch run
    incremental_update(corpus.where("file_id >= 140"), state, cfg)
    lines = [json.loads(l) for l in open(os.path.join(state, "metrics.jsonl"))]
    m2 = lines[-1]
    assert m2["band_state_buckets_read"] < m2["band_state_buckets_total"]
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == batch_edges


def test_concurrent_writer_failure_fails_fold(spark, tmp_path_factory,
                                              monkeypatch):
    """The group-delta and bands partitions commit on concurrent threads;
    a failure there must fail the fold (no edges marker = batch not
    committed) and be recoverable by the stranded-batch re-fold — never
    be swallowed into a half-indexed committed batch."""
    from dedup_spark import streaming as st

    corpus = corpus_df(spark, 80, seed=31).cache()
    state = str(tmp_path_factory.mktemp("state_thfail"))
    incremental_update(corpus.where("file_id < 40"), state, CFG)

    real_timed = st._timed

    def boom(phases, key, fn):
        if key == "groups_write":
            raise RuntimeError("injected delta-commit failure")
        return real_timed(phases, key, fn)

    monkeypatch.setattr(st, "_timed", boom)
    with pytest.raises(RuntimeError, match="injected delta-commit"):
        incremental_update(corpus.where("file_id >= 40"), state, CFG)
    # the batch is NOT committed: signatures landed, edges marker did not
    assert os.path.isdir(os.path.join(state, "signatures", "batch_id=1"))
    assert not os.path.exists(
        os.path.join(state, "edges", "batch_id=1", "_SUCCESS"))

    # next fold re-folds the stranded batch and the result equals batch
    monkeypatch.setattr(st, "_timed", real_timed)
    incremental_update(corpus.where("file_id >= 40"), state, CFG,
                       batch_id=1)
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    assert _pairs(expanded_edges(spark, state).where("verified")) == batch_edges


def test_structured_streaming_wrapper(spark, tmp_path_factory):
    corpus = corpus_df(spark, 120, seed=13).cache()
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    state = str(tmp_path_factory.mktemp("stream_state"))

    # two "arrivals" written as separate files
    corpus.where("file_id < 60").write.mode("append").parquet(in_dir)
    corpus.where("file_id >= 60").write.mode("append").parquet(in_dir)

    q = stream_corpus(spark, in_dir, state, CFG)
    q.awaitTermination(300)

    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))
    # state stores COMPACT rep edges; the member-level surface is derived
    got = _pairs(expanded_edges(spark, state).where("verified"))
    # micro-batch boundaries may differ from the 60/60 split (file-based
    # triggers), but the cumulative edge set must equal the batch result
    assert got == batch_edges
