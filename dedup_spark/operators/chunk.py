"""Stage 1: chunk_and_hash — corpus DataFrame → chunks DataFrame.

Spark-first translation of the reference Splitter path
(/root/reference/writer.go:284-342, 586-607): one corpus row = one logical
stream; the chunker runs as a vectorized Arrow UDF (``mapInArrow``) so bytes
never leave the executor, and per-chunk payloads are **not** materialized —
a chunk is ``(file_id, seq, offset, length, hash)`` and payload bytes are
recovered later by slicing ``content`` with JVM-side ``substring`` (see
dedup.unique_chunks). This keeps the shuffle payload tiny at 100 TB scale.

Chunker state is per-file (each row is an independent stream), matching how
we feed the reference: exactly one Write(content) + Close per file.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..chunkers import chunk_fn

CHUNK_SCHEMA = (
    "file_id long, seq int, offset long, length int, hash binary"
)


def chunk_and_hash(
    corpus: DataFrame,
    mode: str = "dynamic",
    max_size: int = 4096,
    hash_name: str = "sha1",
    content_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """Chunk every file; emit one row per chunk with its content hash.

    hash is the digest of the chunk payload (default SHA-1, matching the
    reference's ``HashSize = sha1.Size`` — writer.go:33-34; swappable per
    README.md:110-115 / SURVEY.md H2).
    """
    fn = chunk_fn(mode)

    def chunk_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            contents = batch.column(1).to_pylist()  # binary → bytes
            out_fid, out_seq, out_off, out_len, out_hash = [], [], [], [], []
            for fid, data in zip(ids, contents):
                data = data or b""
                mv = memoryview(data)  # no per-chunk bytes copy
                for seq, (off, length) in enumerate(fn(data, max_size)):
                    out_fid.append(fid)
                    out_seq.append(seq)
                    out_off.append(off)
                    out_len.append(length)
                    out_hash.append(
                        hashlib.new(hash_name, mv[off:off + length]).digest()
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_fid, pa.int64()),
                    pa.array(out_seq, pa.int32()),
                    pa.array(out_off, pa.int64()),
                    pa.array(out_len, pa.int32()),
                    pa.array(out_hash, pa.binary()),
                ],
                names=["file_id", "seq", "offset", "length", "hash"],
            )

    # Column pruning: ship only (id, content) through Arrow; string→binary
    # is a zero-copy reinterpretation JVM-side and saves the Arrow utf-8
    # decode + Python re-encode of every byte of the corpus.
    return corpus.select(
        F.col(id_col).alias("file_id"),
        F.col(content_col).cast("binary").alias("content"),
    ).mapInArrow(chunk_batches, CHUNK_SCHEMA)


def fixed_chunks_relational(
    corpus: DataFrame,
    max_size: int,
    content_col: str = "content",
    id_col: str = "file_id",
    hash_expr: str = "sha2(payload, 256)",
) -> DataFrame:
    """Fixed-mode chunking expressed purely relationally (no Python UDF).

    ModeFixed (writer.go:609-653) is just substring slicing — the whole
    stage stays inside whole-stage codegen. Used for SQL-parity queries and
    as the fast path when mode='fixed' precision isn't chunk-content-defined.
    Empty files produce zero chunks (the reference emits no block for an
    empty stream — writer_test.go's empty-input example writes only EOS).
    """
    n_chunks = f"int(ceil(length({content_col}) / {max_size}.0))"
    return (
        corpus.select(
            F.col(id_col).alias("file_id"),
            F.col(content_col).alias("_c"),
        )
        .where(F.length("_c") > 0)
        .select(
            "file_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {n_chunks.replace(content_col, '_c')} - 1),"
                    f" i -> substring(_c, i * {max_size} + 1, {max_size}))"
                )
            ).alias("seq", "payload"),
        )
        .select(
            "file_id",
            "seq",
            (F.col("seq").cast("long") * max_size).alias("offset"),
            F.length("payload").alias("length"),
            F.expr(hash_expr).alias("hash"),
        )
    )
