"""Feed-only control: pyarrow row-group read + binary materialization
(exactly what compute_signatures_direct workers do before the kernel),
multiprocessing pinned to N cores, no Spark, no kernel.

Usage: python tools/feed_scaling.py <corpus_dir> <n_parquet_files> <procs,...>
"""
import os
import sys
import time


def _read(args):
    import pyarrow as pa
    import pyarrow.parquet as pq

    total = 0
    for path in args:
        pf = pq.ParquetFile(path)
        for rg in range(pf.metadata.num_row_groups):
            for tb in pf.iter_batches(batch_size=64, row_groups=[rg],
                                      columns=["file_id", "content"],
                                      use_threads=False):
                col = tb.column(1)
                if pa.types.is_string(col.type):
                    col = col.cast(pa.binary())
                elif pa.types.is_large_string(col.type):
                    col = col.cast(pa.large_binary())
                for b in col.to_pylist():
                    total += len(b)
    return total


def main():
    corpus_dir, n_pq = sys.argv[1], int(sys.argv[2])
    procs_list = [int(x) for x in sys.argv[3].split(",")]
    paths = sorted(
        os.path.join(corpus_dir, n) for n in os.listdir(corpus_dir)
        if n.endswith(".parquet")
    )[:n_pq]
    import multiprocessing as mp

    base = {}
    for procs in procs_list:
        os.sched_setaffinity(0, set(range(procs)))
        shards = [paths[i::procs * 2] for i in range(procs * 2)]
        with mp.get_context("fork").Pool(procs) as pool:
            pool.map(_read, [paths[:1]] * procs)  # warm
            t0 = time.time()
            sizes = pool.map(_read, shards)
            wall = time.time() - t0
        gb = sum(sizes) / 1e9
        base[procs] = wall
        line = f"procs={procs} wall={wall:.2f}s {gb:.1f}GB {gb / wall:.2f} GB/s"
        if procs != procs_list[0] and procs_list[0] in base:
            sp = base[procs_list[0]] / wall
            line += f" speedup={sp:.2f} eff={sp / (procs / procs_list[0]):.3f}"
        print(line)
    os.sched_setaffinity(0, set(range(os.cpu_count())))


if __name__ == "__main__":
    main()
