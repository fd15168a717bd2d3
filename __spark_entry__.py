"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dedup slice on sf0.001.
``queries()`` / ``oracle_sql()`` — operator surface checked against DuckDB
at sf0.01 (row-count + schema + order-insensitive value-hash).

Conventions for oracle parity:
- every computed column aliased identically on both sides;
- DuckDB SUM() casts to BIGINT (DuckDB sums to HUGEINT, Spark to long);
- doubles rounded to 6 dp on both sides;
- hashing uses sha256 hex (DuckDB has no sha1; our engine's hash is
  pluggable — SURVEY.md H2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CHUNK = 1000  # fixed-mode chunk size for SQL-parity queries (chars)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-mode chunk manifest over documents, pure JVM (no Python UDF):
    chunk → sha256 → first-occurrence window (SURVEY.md C1+J1+J2)."""
    from dedup_spark.operators.chunk import fixed_chunks_relational

    chunks = fixed_chunks_relational(
        _docs(spark, sf_dir), CHUNK, content_col="text", id_col="doc_id"
    )
    w = Window.partitionBy("hash").orderBy("file_id", "seq")
    return (
        chunks.withColumn("rn", F.row_number().over(w))
        .withColumn("is_new", F.col("rn") == 1)
        .drop("rn")
        .withColumnRenamed("file_id", "doc_id")
    )


_CHUNKS_CTE = f"""
WITH chunks AS (
    SELECT d.doc_id,
           CAST(i.i AS INT) AS seq,
           CAST(i.i * {CHUNK} AS BIGINT) AS "offset",
           CAST(length(substring(d.text, CAST(i.i * {CHUNK} + 1 AS INT), {CHUNK})) AS INT) AS length,
           sha256(substring(d.text, CAST(i.i * {CHUNK} + 1 AS INT), {CHUNK})) AS hash
    FROM documents d,
         (SELECT unnest(generate_series(0, 9999)) AS i) i
    WHERE length(d.text) > 0
      AND i.i <= CAST(ceil(length(d.text) / {CHUNK}.0) AS INT) - 1
),
manifest AS (
    SELECT *,
           row_number() OVER (PARTITION BY hash ORDER BY doc_id, seq) = 1 AS is_new
    FROM chunks
)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 at document granularity: groups of byte-identical docs."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.sum("n_chars").alias("group_chars"),
        )
        .where(F.col("n_docs") > 1)
    )


def q_doc_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: corpus-level dedup ratio at document granularity."""
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.sha2("text", 256)).alias("n_unique"),
        F.round(
            1.0 - F.countDistinct(F.sha2("text", 256)) / F.count("*"), 6
        ).alias("dup_ratio"),
    )


def q_doc_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2 at document granularity: first-occurrence flag + backref to
    the latest previous identical doc (writer.go:499-508 semantics)."""
    d = _docs(spark, sf_dir).withColumn("text_hash", F.sha2("text", 256))
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return d.select(
        "doc_id",
        "text_hash",
        (F.row_number().over(w) == 1).alias("is_new"),
        (F.col("doc_id") - F.lag("doc_id").over(w)).alias("backref"),
    )


def q_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+J1: fixed-mode chunk manifest over documents (pure JVM path)."""
    return _chunk_manifest(spark, sf_dir).select(
        "doc_id", "seq", "offset", "length", "hash", "is_new"
    )


def q_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 over the chunk manifest: Blocks()/removed-bytes metrics."""
    m = _chunk_manifest(spark, sf_dir)
    return m.agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_unique"),
        F.sum("length").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("is_new"), F.col("length")).otherwise(0))
        .cast("long").alias("unique_chars"),
    )


def q_max_mem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 MaxMem peak-liveness sweep (reader.go:324-349) over the chunk
    manifest: +length at first occurrence, -length after last, max running
    sum in stream order. Deltas pre-aggregated per position so the running
    sum is tie-order independent."""
    m = _chunk_manifest(spark, sf_dir)
    m = m.withColumn(
        "gseq", F.col("doc_id").cast("long") * (1 << 20) + F.col("seq")
    )
    spans = m.groupBy("hash").agg(
        F.min("gseq").alias("first_seq"),
        F.max("gseq").alias("last_seq"),
        F.first("length").alias("length"),
    )
    events = spans.select(
        F.col("first_seq").alias("pos"), F.col("length").cast("long").alias("delta")
    ).unionAll(
        spans.select(
            (F.col("last_seq") + 1).alias("pos"),
            (-F.col("length")).cast("long").alias("delta"),
        )
    ).groupBy("pos").agg(F.sum("delta").alias("delta"))
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("live", F.sum("delta").over(w)).agg(
        F.max("live").alias("max_mem")
    )


def q_dup_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 grouped: duplicate-document counts per language."""
    d = _docs(spark, sf_dir).withColumn("text_hash", F.sha2("text", 256))
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        d.withColumn("is_new", F.row_number().over(w) == 1)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).cast("long")
            .alias("n_dup_docs"),
        )
        .orderBy("lang")
    )


def q_zpaq_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (ZPAQ CDC) over documents via the Arrow UDF — not SQL-expressible
    (data-dependent byte recurrence); driver records rows-only check.
    Golden parity is covered by tests/test_chunkers.py instead."""
    from dedup_spark.operators.chunk import chunk_and_hash
    from dedup_spark.operators.dedup import build_manifest

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("file_id"), F.col("text").alias("content")
    )
    m = build_manifest(chunk_and_hash(docs, mode="dynamic", max_size=1024))
    return m.agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("long").alias("n_unique"),
        F.sum("length").cast("long").alias("total_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dup_groups": q_exact_dup_groups,
        "doc_dedup_stats": q_doc_dedup_stats,
        "doc_manifest": q_doc_manifest,
        "chunk_manifest": q_chunk_manifest,
        "chunk_dedup_stats": q_chunk_dedup_stats,
        "max_mem": q_max_mem,
        "dup_docs_by_lang": q_dup_docs_by_lang,
        "zpaq_chunk_stats": q_zpaq_chunk_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dup_groups": """
            SELECT sha256(text) AS text_hash,
                   count(*) AS n_docs,
                   min(doc_id) AS first_doc,
                   CAST(sum(n_chars) AS BIGINT) AS group_chars
            FROM documents
            GROUP BY 1
            HAVING count(*) > 1
        """,
        "doc_dedup_stats": """
            SELECT count(*) AS n_docs,
                   count(DISTINCT sha256(text)) AS n_unique,
                   round(1.0 - count(DISTINCT sha256(text)) / count(*), 6)
                     AS dup_ratio
            FROM documents
        """,
        "doc_manifest": """
            SELECT doc_id,
                   sha256(text) AS text_hash,
                   row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1
                     AS is_new,
                   doc_id - lag(doc_id) OVER (PARTITION BY sha256(text) ORDER BY doc_id)
                     AS backref
            FROM documents
        """,
        "chunk_manifest": _CHUNKS_CTE + """
            SELECT doc_id, seq, "offset", length, hash, is_new FROM manifest
        """,
        "chunk_dedup_stats": _CHUNKS_CTE + """
            SELECT count(*) AS n_chunks,
                   CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
                   CAST(sum(length) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN is_new THEN length ELSE 0 END) AS BIGINT)
                     AS unique_chars
            FROM manifest
        """,
        "max_mem": _CHUNKS_CTE + """
            , spans AS (
                SELECT hash,
                       min(doc_id * (1 << 20) + seq) AS first_seq,
                       max(doc_id * (1 << 20) + seq) AS last_seq,
                       min(length) AS length
                FROM manifest GROUP BY hash
            ), events AS (
                SELECT pos, CAST(sum(delta) AS BIGINT) AS delta FROM (
                    SELECT first_seq AS pos, CAST(length AS BIGINT) AS delta FROM spans
                    UNION ALL
                    SELECT last_seq + 1 AS pos, CAST(-length AS BIGINT) AS delta FROM spans
                ) GROUP BY pos
            )
            SELECT max(live) AS max_mem FROM (
                SELECT sum(delta) OVER (ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
                FROM events
            )
        """,
        "dup_docs_by_lang": """
            WITH m AS (
                SELECT lang,
                       row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1
                         AS is_new
                FROM documents
            )
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_docs
            FROM m GROUP BY lang ORDER BY lang
        """,
        # zpaq_chunk_stats: intentionally omitted (non-SQL-expressible CDC
        # kernel; rows-only check; golden parity in tests/test_chunkers.py)
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact-dedup manifest stats by language on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    return q_dup_docs_by_lang(spark, sf_dir)
