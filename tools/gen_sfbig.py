"""Approximate large-SF profiling data generator.

The driver generates its own deterministic sf1.0 tables for measurement;
that data is not present in this sandbox. This tool produces an
APPROXIMATION with the same schemas, row counts and value distributions
(measured from /root/testdata/sf0.1) so that large-scale plan shapes and
timings can be profiled locally. It is NOT the driver's generator and its
outputs must never be used for correctness (oracle) checks.

Star-schema tables are built as N key-shifted copies of sf0.1 (join
fan-outs and value distributions preserved exactly); `documents` and
`embeddings` are freshly sampled from the measured distributions
(uniform 10..100 tokens over the 30-word vocab + rare 'dup' token;
unit-normalised 64-dim Gaussian vectors) because key-shifted copies
would multiply every text 10x and distort the dedup workload.

Usage: python tools/gen_sfbig.py [out_dir] [scale_multiplier]
Defaults: /root/sfbig/sf1.0  10
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def shifted_union(con, table, key_shifts, n_copies):
    """UNION ALL of n_copies of sf0.1/table with key columns shifted by
    copy_index * (max_key + 1) so each copy is internally consistent."""
    cols = [r[0] for r in con.sql(
        f"describe select * from read_parquet('{SRC}/{table}.parquet')"
    ).fetchall()]
    parts = []
    for i in range(n_copies):
        sel = []
        for c in cols:
            if c in key_shifts:
                sel.append(f"{c} + {i * key_shifts[c]} as {c}")
            else:
                sel.append(c)
        parts.append(
            f"select {', '.join(sel)} from read_parquet('{SRC}/{table}.parquet')"
        )
    return " union all ".join(parts)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    shifts = {
        "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                     "l_suppkey": 1000},
        "orders": {"o_orderkey": 150000, "o_custkey": 15000},
        "customer": {"c_custkey": 15000},
        "part": {"p_partkey": 20000},
        "supplier": {"s_suppkey": 1000},
        "events": {"event_id": 100000, "user_id": 1500},
    }
    for t, ks in shifts.items():
        q = shifted_union(con, t, ks, mult)
        con.sql(f"copy ({q}) to '{out}/{t}.parquet' (format parquet)")
        print(t, con.sql(
            f"select count(*) from read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0], flush=True)
    for t in ("region", "nation"):
        con.sql(
            f"copy (select * from read_parquet('{SRC}/{t}.parquet')) "
            f"to '{out}/{t}.parquet' (format parquet)"
        )

    # --- documents: fresh sample, 5000 * mult docs ---
    rng = np.random.RandomState(42)
    n_docs = 5000 * mult
    vocab = np.array(VOCAB)
    lens = rng.randint(10, 101, size=n_docs)
    texts = []
    for n in lens:
        toks = vocab[rng.randint(0, len(vocab), size=n)]
        if rng.random_sample() < 0.05:  # rare 'dup' token, ~0.09% of tokens
            toks = toks.copy()
            toks[rng.randint(0, n)] = "dup"
        texts.append(" ".join(toks))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = np.array([f"src{i}" for i in range(20)])[
        rng.randint(0, 20, size=n_docs)]
    import pyarrow as pa
    import pyarrow.parquet as pq
    doc_tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array(sources.tolist()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    # one big row group, matching the driver's observed file layout
    pq.write_table(doc_tbl, f"{out}/documents.parquet",
                   row_group_size=n_docs)
    print("documents", n_docs, flush=True)

    # --- embeddings: unit-norm 64-dim Gaussian, 2000 * mult rows ---
    n_vec = 2000 * mult
    V = rng.randn(n_vec, 64).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    emb_tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(V.tolist(), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, size=n_vec), pa.int32()),
    })
    pq.write_table(emb_tbl, f"{out}/embeddings.parquet",
                   row_group_size=n_vec)
    print("embeddings", n_vec, flush=True)


if __name__ == "__main__":
    main()
