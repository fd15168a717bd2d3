"""Near-dup pipeline tests: recall vs single-node oracle (north_rule gate),
cluster agreement, skew guard, resume semantics."""

import os

import pytest
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.oracle import run_oracle
from dedup_spark.pipeline import run_pipeline
from dedup_spark.synth import corpus_df

CFG = DedupConfig()


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_df(spark, 400, seed=7).cache()


@pytest.fixture(scope="module")
def result(spark, corpus):
    return run_pipeline(corpus, CFG)


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = [(r["file_id"], r["content"]) for r in corpus.collect()]
    return run_oracle(rows, CFG)


def test_dup_pair_recall(result, oracle):
    """north_rule: dup-pair recall >= 0.99 vs reference-semantics oracle."""
    oracle_pairs, _ = oracle
    got = {
        (r["src"], r["dst"])
        for r in result["edges"].where("verified").collect()
    }
    missed = oracle_pairs - got
    recall = 1 - len(missed) / len(oracle_pairs) if oracle_pairs else 1.0
    assert len(oracle_pairs) > 50, "oracle found too few dup pairs to gate on"
    assert recall >= 0.99, f"recall {recall}: missed {sorted(missed)[:5]}"


def test_verified_pairs_precision(result, oracle):
    """Every verified edge must be a true >= threshold pair (the verify
    stage computes EXACT Jaccard, so precision is 1.0 by construction)."""
    oracle_pairs, _ = oracle
    got = {
        (r["src"], r["dst"])
        for r in result["edges"].where("verified").collect()
    }
    assert got <= oracle_pairs


def test_cluster_agreement(result, oracle):
    """Connected components over the same edges → same partition of files."""
    _, oracle_clusters = oracle
    got = {
        r["file_id"]: r["cluster_id"] for r in result["clusters"].collect()
    }
    assert set(got) == set(oracle_clusters)
    # same partition ⇔ identical min-member labels when recall/precision hold
    agree = sum(
        1 for fid in got if got[fid] == oracle_clusters[fid]
    )
    assert agree / len(got) >= 0.99


def test_ground_truth_sanity(corpus, result, oracle):
    """Injected exact copies must cluster together."""
    gt = {
        r["file_id"]: r["cluster_gt"]
        for r in corpus.select("file_id", "cluster_gt").collect()
    }
    sha = {
        r["file_id"]: r["content_sha256"]
        for r in corpus.select("file_id", "content_sha256").collect()
    }
    got = {r["file_id"]: r["cluster_id"] for r in result["clusters"].collect()}
    by_sha = {}
    for fid, h in sha.items():
        by_sha.setdefault(h, []).append(fid)
    for members in by_sha.values():
        if len(members) > 1:
            labels = {got[m] for m in members}
            assert len(labels) == 1, f"exact copies split: {members}"


def test_skew_guard_metrics(spark, corpus):
    """Hot band buckets above the salt ceiling are dropped WITH metrics, and
    the pipeline still returns (no silent failure on a pathological corpus)."""
    from dedup_spark.operators.lsh import candidate_pairs
    from dedup_spark.operators.signatures import compute_signatures

    tiny = DedupConfig(max_bucket=4, salt=1)  # salt=1 → drop above max_bucket
    sigs = compute_signatures(corpus, tiny)
    pairs, metrics = candidate_pairs(sigs, tiny, return_metrics=True)
    m = metrics.collect()[0]
    assert m["dropped_buckets"] > 0  # the giant injected cluster trips the cap
    assert pairs.count() >= 0


def test_salted_pairs_recall_neutral(spark, corpus):
    """Salted block pair-gen over oversize buckets must produce EXACTLY the
    pairs a direct (uncapped) pair-gen would — salting redistributes the
    quadratic work, it never loses a pair (VERDICT round-1 item 5)."""
    from dedup_spark.operators.lsh import candidate_pairs
    from dedup_spark.operators.signatures import compute_signatures

    sigs = compute_signatures(corpus, CFG).cache()
    # max_bucket=4 forces nearly every real bucket through the salted path
    salted_cfg = DedupConfig(max_bucket=4, salt=1_000_000)
    uncapped = DedupConfig(max_bucket=1_000_000, salt=1)
    got = {(r["src"], r["dst"])
           for r in candidate_pairs(sigs, salted_cfg).collect()}
    want = {(r["src"], r["dst"])
            for r in candidate_pairs(sigs, uncapped).collect()}
    assert got == want
    assert len(want) > 100
    sigs.unpersist()


def test_salted_pairs_generic_keys(spark):
    """salted_pairs is the ONE pair-gen ladder for every bucketed surface
    (VERDICT r3 #4): with string bucket keys and a custom id column it
    must enumerate exactly the brute-force pair set, salting included."""
    from itertools import combinations

    from dedup_spark.operators.lsh import salted_pairs

    rows = [("b0", i) for i in range(7)] + \
           [("b1", i) for i in range(5, 11)] + [("b2", 99)]
    buckets = spark.createDataFrame(rows, "bkt string, doc_id long")
    want = set()
    for b in ("b0", "b1"):
        ids = sorted(d for k, d in rows if k == b)
        want |= {tuple(sorted(p)) for p in combinations(ids, 2)}
    # max_b=2 forces the salted path on both buckets (sizes 7 and 6)
    got = {(r["src"], r["dst"]) for r in salted_pairs(
        buckets, 2, 1000, key_cols=("bkt",), id_col="doc_id"
    ).collect()}
    assert got == want
    # drop ladder: salt_cap=6 kills the 7-member bucket, keeps the 6
    pairs, dropped = salted_pairs(
        buckets, 3, 2, key_cols=("bkt",), id_col="doc_id",
        return_metrics=True,
    )
    ids1 = sorted(d for k, d in rows if k == "b1")
    assert {(r["src"], r["dst"]) for r in pairs.collect()} == {
        tuple(sorted(p)) for p in combinations(ids1, 2)
    }
    d = dropped.collect()[0]
    assert d["dropped_buckets"] == 1 and d["dropped_rows"] == 7


def test_salted_pairs_prefilter_gate_equivalent(spark):
    """The mega-bucket pre-filter is a PLAN choice, not a semantics knob
    (round 5: cost-gated off for measured-small inputs to drop its
    dedicated job + broadcast future from the tail): with it on or off,
    the pair set AND the dropped-bucket accounting must be identical —
    the cap just moves inside the window pass."""
    from dedup_spark.operators.lsh import salted_pairs

    rows = [("b0", i) for i in range(7)] + \
           [("b1", i) for i in range(5, 11)] + [("b2", 99)]
    buckets = spark.createDataFrame(rows, "bkt string, doc_id long")
    # max_b=3, salt=2 → salt_cap=6: b0 (7 members) dropped, b1 salted
    on_pairs, on_drop = salted_pairs(
        buckets, 3, 2, key_cols=("bkt",), id_col="doc_id",
        return_metrics=True, prefilter=True,
    )
    off_pairs, off_drop = salted_pairs(
        buckets, 3, 2, key_cols=("bkt",), id_col="doc_id",
        return_metrics=True, prefilter=False,
    )
    assert {(r["src"], r["dst"]) for r in on_pairs.collect()} == \
           {(r["src"], r["dst"]) for r in off_pairs.collect()}
    assert on_drop.collect() == off_drop.collect()
    assert off_drop.collect()[0]["dropped_buckets"] == 1
    # the no-pre-filter plan must not contain the broadcast anti-join
    assert "BroadcastExchange" not in off_pairs._jdf.queryExecution() \
        .executedPlan().toString()


def test_salted_pairs_uncapped_ladder(spark):
    """salt=None (VERDICT r4 #1): the UNCAPPED ladder must emit the
    COMPLETE pair set of any bucket — nothing dropped at any size — while
    still splitting the work into blocks so no task holds more than
    ~2·max_b members. dedupe=False must emit each pair exactly once when
    the bucket key partitions the ids."""
    from itertools import combinations

    from dedup_spark.operators.lsh import _block_sides, salted_pairs

    n = 100  # 25x the direct cap of max_b=4 — deep into the block regime
    buckets = spark.createDataFrame(
        [("g", i) for i in range(n)], "bkt string, doc_id long"
    )
    rows = salted_pairs(
        buckets, 4, None, key_cols=("bkt",), id_col="doc_id", dedupe=False
    ).collect()
    got = [(r["src"], r["dst"]) for r in rows]
    want = {tuple(sorted(p)) for p in combinations(range(n), 2)}
    assert set(got) == want
    assert len(got) == len(want)  # exactly-once: no distinct needed
    # per-task bound: no join key (bucket, bi, bj) sees more than a small
    # multiple of max_b members on either side of the block-pair join
    # (hash-multinomial block sizes concentrate at bucket_size/nb ≤ max_b;
    # deterministic via xxhash64) — the memory contract of the ladder
    left, right, _ = _block_sides(buckets, 4, ["bkt"], "doc_id")
    for side in (left, right):
        sizes = [
            r["m"]
            for r in side.groupBy("bkt", "bi", "bj")
            .agg(F.count("*").alias("m"))
            .collect()
        ]
        assert max(sizes) <= 4 * 4, max(sizes)
    # uncapped metrics surface reports literal zeros
    _, dropped = salted_pairs(
        buckets, 4, None, key_cols=("bkt",), id_col="doc_id",
        return_metrics=True,
    )
    d = dropped.collect()[0]
    assert d["dropped_buckets"] == 0 and d["dropped_rows"] == 0


def test_within_group_pairs_bounded_tasks(spark):
    """VERDICT r4 #1: a mega exact-dup group flows through the salted
    block ladder — complete within-group pair output (audit contract:
    nothing dropped), but no single task flattens C(n,2) of one group."""
    from itertools import combinations

    from dedup_spark.operators.groups import within_group_pairs

    n = 120
    groups = spark.createDataFrame(
        [(i, 7, 9, 0, n) for i in range(n)]
        + [(200, 1, 2, 200, 1)],  # singleton group: must emit nothing
        "file_id long, g1 long, g2 long, rep long, group_size long",
    )
    out = within_group_pairs(groups, max_b=10).collect()
    got = [(r["src"], r["dst"]) for r in out]
    want = {tuple(sorted(p)) for p in combinations(range(n), 2)}
    assert set(got) == want
    assert len(got) == len(want)  # exactly once each, no singleton pairs
    assert all(
        r["jaccard"] == 1.0 and r["hamming"] == 0 and r["verified"]
        for r in out
    )


def test_capped_bucket_regime_e2e(spark, corpus, tmp_path_factory):
    """VERDICT r4 #6: drive buckets past max_bucket·salt through the FULL
    pipeline AND the incremental fold. The dropped-bucket counters must
    land on both metrics surfaces, verified edges from un-dropped buckets
    survive, and the incremental path is strictly more complete in the
    capped regime (a bucket keeps the edges it earned while small)."""
    import json

    tiny = DedupConfig(max_bucket=4, salt=1)
    res = run_pipeline(corpus, tiny)
    m = res["candidate_metrics"].collect()[0]
    assert m["dropped_buckets"] > 0
    assert m["max_bucket_size"] > tiny.max_bucket * tiny.salt
    capped = {
        (r["src"], r["dst"])
        for r in res["edges"].where("verified").collect()
    }
    uncapped = {
        (r["src"], r["dst"])
        for r in run_pipeline(corpus, DedupConfig(max_bucket=1_000_000))[
            "edges"
        ].where("verified").collect()
    }
    assert capped <= uncapped  # drops never invent pairs
    assert len(capped) > 0

    # incremental: fold two halves under the same tiny caps
    from dedup_spark.streaming import expanded_edges, incremental_update

    state = str(tmp_path_factory.mktemp("state_capped"))
    incremental_update(corpus.where("file_id < 200"), state, tiny)
    incremental_update(corpus.where("file_id >= 200"), state, tiny)
    with open(os.path.join(state, "metrics.jsonl")) as f:
        lines = [json.loads(ln) for ln in f]
    assert sum(ln["dropped_buckets"] for ln in lines) > 0
    inc = {
        (r["src"], r["dst"])
        for r in expanded_edges(spark, state).where("verified").collect()
    }
    # documented capped-regime semantics: incremental keeps edges earned
    # before a bucket crossed the cap — never fewer than the one-shot run
    assert inc >= capped
    assert inc <= uncapped


def test_verify_two_phase_equivalence(result):
    """Size-tiered verify (VERDICT r3 #6): with the hamming gate active,
    the two-phase plan (narrow simhash joins first, shingle sketches only
    for survivors) must emit exactly the single-phase edge rows."""
    from dedup_spark.operators.verify import verify_pairs

    gated = DedupConfig(simhash_hamming_max=20)
    sigs = result["signatures"]
    pairs = result["candidates"]
    sh = sigs.select("file_id", "shingles")

    def rows(df):
        return {
            (r["src"], r["dst"], r["hamming"], round(r["jaccard"], 9),
             r["verified"])
            for r in df.collect()
        }

    two = rows(verify_pairs(pairs, sigs, sh, gated, two_phase=True))
    one = rows(verify_pairs(pairs, sigs, sh, gated, two_phase=False))
    assert two == one
    assert len(two) > 20  # the gate leaves a real comparison surface
    # and the gate actually gated something relative to hamming-off
    allp = rows(verify_pairs(pairs, sigs, sh, CFG))
    assert len(two) < len(allp)


@pytest.mark.parametrize("mode", ["entropy", "fixed"])
def test_pipeline_recall_all_chunk_modes(spark, mode):
    """VERDICT r3 #7: the recall/cluster gates previously ran only the
    default dynamic CDC; entropy and fixed modes go through the identical
    full-pipeline gate against the reference-semantics oracle."""
    cfg = DedupConfig(mode=mode)
    corpus_m = corpus_df(spark, 200, seed=31).cache()
    res = run_pipeline(corpus_m, cfg)
    got = {
        (r["src"], r["dst"])
        for r in res["edges"].where("verified").select("src", "dst").collect()
    }
    rows = [(r["file_id"], r["content"]) for r in corpus_m.collect()]
    oracle_pairs, oracle_clusters = run_oracle(rows, cfg)
    assert len(oracle_pairs) > 30, f"mode={mode}: oracle surface too small"
    missed = oracle_pairs - got
    recall = 1 - len(missed) / len(oracle_pairs)
    assert recall >= 0.99, f"mode={mode} recall {recall}"
    cl = {
        r["file_id"]: r["cluster_id"] for r in res["clusters"].collect()
    }
    assert set(cl) == set(oracle_clusters)
    corpus_m.unpersist()


def test_resume_skips_stages(spark, corpus, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("ckpt"))
    r1 = run_pipeline(corpus.limit(60), CFG, workdir=workdir)
    n1 = r1["clusters"].count()
    # wreck nothing; rerun must read checkpoints (same result, no recompute)
    r2 = run_pipeline(corpus.limit(60), CFG, workdir=workdir)
    assert r2["clusters"].count() == n1
    assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))
    stages = {s for s in os.listdir(workdir) if not s.endswith(".jsonl")}
    assert {"signatures", "groups", "candidates", "edges_rep",
            "clusters"} <= stages


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="FIXTURES.md 5k recall gate; run with RUN_SLOW=1 (evidence in "
           "BENCH/BASELINE.md §5: recall 1.0 on 11,229 oracle pairs)",
)
def test_recall_gate_5k(spark):
    cfg = DedupConfig()
    corpus = corpus_df(spark, 5000, seed=123).cache()
    res = run_pipeline(corpus, cfg)
    got = {(r["src"], r["dst"])
           for r in res["edges"].where("verified").collect()}
    rows = [(r["file_id"], r["content"]) for r in corpus.collect()]
    op, _ = run_oracle(rows, cfg)
    assert len(op) > 5000
    assert got <= op  # exact precision
    assert 1 - len(op - got) / len(op) >= 0.99


def test_lcs_gate_in_pipeline(spark, corpus):
    """min_lcs wires the suffix-array gate into the pipeline: a sane
    threshold keeps true near-dups, an impossible one demotes all."""
    # dup clusters are appended after base singletons in synth — take the
    # tail so the slice actually contains near-dups
    small = corpus.where("file_id >= 300").cache()
    plain = run_pipeline(small, CFG)["edges"].where("verified").count()
    sane = run_pipeline(small, DedupConfig(min_lcs=40))["edges"].where(
        "verified").count()
    none = run_pipeline(small, DedupConfig(min_lcs=10**6))["edges"].where(
        "verified").count()
    assert none == 0
    assert 0 < sane <= plain


def test_lcs_gate(spark):
    """Suffix-array LCS filter: shared block found, unrelated pair rejected."""
    from dedup_spark.operators.verify import lcs_filter, longest_common_substring

    a = "A" * 50 + "SHARED-BLOCK-OF-TEXT" * 5 + "B" * 50
    b = "C" * 70 + "SHARED-BLOCK-OF-TEXT" * 5 + "D" * 30
    assert longest_common_substring(a.encode(), b.encode()) == 100
    df = spark.createDataFrame(
        [(1, 2, a, b), (3, 4, "xyz", "qrs")],
        "src long, dst long, content_src string, content_dst string",
    )
    kept = lcs_filter(df, min_lcs=50).collect()
    assert [(r["src"], r["dst"]) for r in kept] == [(1, 2)]


def test_group_contraction_semantics(spark):
    """sketch_groups/expand_group_edges: rep = min file_id per identical
    sketch; expansion emits every within-group pair (jaccard 1) and fans a
    verified rep pair out to all member combinations."""
    from dedup_spark.operators.groups import (
        expand_group_edges, group_star_pairs, sketch_groups,
    )

    rows = [
        (1, 2, [10, 20]), (5, 2, [10, 20]), (3, 2, [10, 20]),  # group A
        (2, 2, [30, 40]), (8, 2, [30, 40]),                    # group B
        (9, 1, [50]),                                          # singleton
        (7, 0, []),                                            # no shingles
    ]
    sigs = spark.createDataFrame(
        [(f, n, sh, sh, n) for f, n, sh in rows],
        "file_id long, n_shingles int, shingles array<long>, "
        "minhash array<long>, simhash long",
    )
    g = sketch_groups(sigs)
    reps = {r["file_id"]: r["rep"] for r in g.collect()}
    assert reps == {1: 1, 5: 1, 3: 1, 2: 2, 8: 2, 9: 9}
    stars = {(r["src"], r["dst"]) for r in group_star_pairs(g).collect()}
    assert stars == {(1, 5), (1, 3), (2, 8)}

    edges_rep = spark.createDataFrame(
        [(1, 2, 0, 0.9, True), (1, 9, 0, 0.1, False)],
        "src long, dst long, hamming int, jaccard double, verified boolean",
    )
    out = expand_group_edges(edges_rep, g).collect()
    verified = {(r["src"], r["dst"]) for r in out if r["verified"]}
    # cross: {1,3,5} x {2,8}; within: A pairs + B pair
    assert verified == {
        (1, 2), (1, 8), (2, 3), (3, 8), (2, 5), (5, 8),
        (1, 3), (1, 5), (3, 5), (2, 8),
    }
    rejected = [(r["src"], r["dst"]) for r in out if not r["verified"]]
    assert rejected == [(1, 9)]


def test_resume_rejects_stale_fingerprint(spark, corpus, tmp_path_factory):
    """A checkpoint written under different config semantics must be
    recomputed, not resumed (ADVICE r2: config/semantics fingerprint).
    Here the jaccard threshold changes between runs; a naive resume would
    serve the old edge set."""
    workdir = str(tmp_path_factory.mktemp("ckpt_fp"))
    small = corpus.where("file_id >= 300")
    loose = run_pipeline(small, DedupConfig(jaccard_threshold=0.3),
                         workdir=workdir)["edges"].where("verified").count()
    strict = run_pipeline(small, DedupConfig(jaccard_threshold=0.95),
                          workdir=workdir)["edges"].where("verified").count()
    assert strict < loose  # stale resume would return the 0.3 edges
    # and resuming with the SAME config still loads the checkpoint
    again = run_pipeline(small, DedupConfig(jaccard_threshold=0.95),
                         workdir=workdir)["edges"].where("verified").count()
    assert again == strict


def test_cc_distributed_loop_matches_driver_path(spark, monkeypatch):
    """Force DRIVER_FINALIZE_EDGES tiny so the distributed alternating
    large-star/small-star loop actually runs before the bounded toPandas
    driver finalize (the suites otherwise always take the small-graph fast
    path), and assert identical clusters (VERDICT r2 #8)."""
    from dedup_spark.operators import cluster as cl

    # a 60-vertex chain (worst case for contraction rounds), two cliques,
    # and a couple of isolated-by-edges stars
    pairs = [(i, i + 1) for i in range(60)]
    pairs += [(100 + a, 100 + b) for a in range(8) for b in range(a + 1, 8)]
    pairs += [(200, 201), (200, 202), (300, 301)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    ids = spark.range(0, 310).select(F.col("id").alias("file_id"))

    want = {
        (r["file_id"], r["cluster_id"])
        for r in cl.cluster_assignments(ids, edges).collect()
    }
    monkeypatch.setattr(cl, "DRIVER_FINALIZE_EDGES", 4)
    got = {
        (r["file_id"], r["cluster_id"])
        for r in cl.cluster_assignments(ids, edges).collect()
    }
    assert got == want
    # sanity: the chain really is one component rooted at 0
    assert (59, 0) in got and (107, 100) in got


def test_cc_edges_canonical_flag_equivalence(spark):
    """edges_canonical=True (pipeline fast path: skips the canonicalization
    exchange) must produce identical clusters to the default path when the
    input really is canonical — and the default path must canonicalize a
    messy edge list (reversed, duplicated, self-loop) to the same answer."""
    from dedup_spark.operators.cluster import cluster_assignments

    canonical = [(0, 1), (1, 2), (5, 6), (8, 9)]
    messy = canonical + [(2, 1), (1, 0), (6, 5), (7, 7)]
    ids = spark.range(0, 10).select(F.col("id").alias("file_id"))

    fast = {
        (r["file_id"], r["cluster_id"])
        for r in cluster_assignments(
            ids, spark.createDataFrame(canonical, "src long, dst long"),
            edges_canonical=True,
        ).collect()
    }
    safe = {
        (r["file_id"], r["cluster_id"])
        for r in cluster_assignments(
            ids, spark.createDataFrame(messy, "src long, dst long")
        ).collect()
    }
    assert fast == safe
    assert (2, 0) in fast and (9, 8) in fast and (7, 7) in fast
