"""Reference-shaped chunker microbench (writer_test.go:450-711 shapes):
10 MiB deterministic buffer + 50 injected duplicate blocks, throughput in
MB/s per mode and block size, C kernel vs pure Python. Prints JSON lines.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dedup_spark import chunkers as ck  # noqa: E402


def corpus(size=10 << 20, block=65536, ndup=50, seed=0):
    rng = random.Random(seed)
    b = bytearray(rng.randrange(255) for _ in range(size))
    for i in range(ndup):  # writer_test.go:36-43 injection pattern
        src = (i % 10) * block
        dst = (10 + i) * block
        b[dst:dst + block] = b[src:src + block]
    return bytes(b)


def main():
    data = corpus()
    mb = len(data) / (1 << 20)
    for mode, fn in [
        ("fixed", ck.fixed_chunks),
        ("zpaq_c", ck.zpaq_chunks),
        ("zpaq_py", ck.zpaq_chunks_py),
        ("entropy_c", ck.entropy_chunks),
        ("entropy_py", ck.entropy_chunks_py),
    ]:
        for size in (65536, 4096):
            if mode.endswith("_py") and size == 4096:
                continue  # pure-python is slow; one size is evidence enough
            t0 = time.time()
            n = len(fn(data, size))
            dt = time.time() - t0
            print(json.dumps({
                "kernel": mode, "max_size": size,
                "mb_per_sec": round(mb / dt, 1), "chunks": n,
            }))


if __name__ == "__main__":
    main()
