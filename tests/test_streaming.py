"""Incremental + Structured Streaming dedup: two-batch fold equals the
one-shot batch result (SURVEY.md §2.7 incremental mode)."""

import pytest
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.pipeline import run_pipeline
from dedup_spark.streaming import current_clusters, incremental_update, stream_corpus
from dedup_spark.synth import corpus_df

CFG = DedupConfig()


def _pairs(df):
    return {(r["src"], r["dst"]) for r in df.select("src", "dst").collect()}


def test_incremental_matches_batch(spark, tmp_path_factory):
    corpus = corpus_df(spark, 200, seed=11).cache()
    batch_edges = _pairs(run_pipeline(corpus, CFG)["edges"].where("verified"))

    state = str(tmp_path_factory.mktemp("state"))
    first = corpus.where("file_id < 120")
    second = corpus.where("file_id >= 120")
    incremental_update(first, state, CFG)
    out = incremental_update(second, state, CFG)
    inc_edges = _pairs(out["edges"])
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
    got = _pairs(spark.read.parquet(f"{state}/edges"))
    # micro-batch boundaries may differ from the 60/60 split (file-based
    # triggers), but the cumulative edge set must equal the batch result
    assert got == batch_edges
