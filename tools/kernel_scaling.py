"""No-Spark control for the scaling study: the raw signature kernel
(chunk → shingle → MinHash/SimHash) over real corpus bytes, multiprocessing
fork pool pinned to N cores. If THIS doesn't scale N→4N, the residue is
machine memory bandwidth, not Spark orchestration.

Usage: python tools/kernel_scaling.py <corpus_dir> <n_files> <procs,procs,...>
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load(corpus_dir, n_files):
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(corpus_dir)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(corpus_dir, name),
                          columns=["content"])
        for v in t.column(0):
            out.append(v.as_py().encode())
            if len(out) >= n_files:
                return out
    return out


_docs = None


def _work(idx):
    from dedup_spark.config import DedupConfig, minhash_coeffs
    from dedup_spark.operators.signatures import (
        minhash_simhash, shingle_hashes,
    )
    import numpy as np

    cfg = DedupConfig()
    a_l, b_l = minhash_coeffs(cfg.num_perm, cfg.seed)
    a = np.asarray(a_l, dtype=np.int64)
    b = np.asarray(b_l, dtype=np.int64)
    acc = 0
    for i in idx:
        x, _ = shingle_hashes(_docs[i], cfg)
        mh, sim = minhash_simhash(x, a, b)
        u = np.unique(x)[:cfg.max_shingles]
        acc ^= int(mh[0]) ^ sim ^ u.size
    return acc


def main():
    global _docs
    corpus_dir, n_files = sys.argv[1], int(sys.argv[2])
    procs_list = [int(x) for x in sys.argv[3].split(",")]
    _docs = load(corpus_dir, n_files)
    total_mb = sum(len(d) for d in _docs) / 1e6
    print(f"{len(_docs)} files, {total_mb:.0f} MB")
    import multiprocessing as mp

    base = {}
    for procs in procs_list:
        os.sched_setaffinity(0, set(range(procs)))
        chunks = [list(range(i, len(_docs), procs * 4))
                  for i in range(procs * 4)]
        with mp.get_context("fork").Pool(procs) as pool:
            pool.map(_work, chunks[:procs])  # warm the pool
            t0 = time.time()
            pool.map(_work, chunks)
            wall = time.time() - t0
        base[procs] = wall
        mbs = total_mb / wall
        line = f"procs={procs} wall={wall:.2f}s {mbs:.0f} MB/s"
        if procs_list[0] in base and procs != procs_list[0]:
            sp = base[procs_list[0]] / wall
            line += (f" speedup={sp:.2f} eff={sp / (procs / procs_list[0]):.3f}"
                     f" (vs {procs_list[0]})")
        print(line)
    os.sched_setaffinity(0, set(range(os.cpu_count())))


if __name__ == "__main__":
    main()
