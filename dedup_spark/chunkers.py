"""Content-defined chunking kernels (pure Python + optional C fast path).

These replicate, bit-exactly, the boundary decisions of the reference
chunkers (klauspost/dedup):

- fixed   : /root/reference/writer.go:609-653  (``fixedWriter``)
- zpaq    : /root/reference/writer.go:682-769  (``zpaqWriter`` — public-domain
            ZPAQ order-1-prediction rolling hash)
- entropy : /root/reference/writer.go:772-890  (``entWriter``)

Semantics notes (verified against the reference source):

* zpaq: per byte ``c``: if ``c == o1[c1]`` then ``h = (h+c+1)*314159265``
  else ``h = (h+c+1)*271828182`` (both mod 2^32); then ``o1[c1]=c; c1=c``.
  Boundary when ``(off >= minFragment and h < maxHash) or off >= maxFragment``.
  On emit ``off=0, h=0, c1=0`` — **o1 is NOT reset** (writer.go:739-744).
  Params: ``minFragment = maxSize//64``, ``maxFragment = maxSize``,
  ``maxHash = uint32(2^(22 - log2(maxSize/4096)))`` (writer.go:698-706).

* entropy: first ``minFragment`` bytes of each *Write call* are histogrammed
  without touching ``h`` (writer.go:815-829); remaining bytes use predicate
  ``hist[c] >= avgHist`` to pick the odd/even constant.  After an emit the
  histogram is zeroed but the phase-(a) refill only happens at the top of the
  next ``Write`` call — we model exactly one ``Write(content)`` + ``Close``
  per file, which matches how the reference golden vectors were produced
  (io.Copy delivered the whole sampledata.zip in a single Write).
  Params: ``minFragment = clamp(maxSize//32, 512, 65535)``,
  ``avgHist = minFragment // 255`` (writer.go:789-805).

Each kernel returns a list of ``(offset, length)`` tuples covering the input
exactly (final partial block included — the reference's ``Close``/``Split``
flush, writer.go:638-653, 752-769, 870-890).

MinBlockSize validation mirrors writer.go:37, 173-175.
"""

from __future__ import annotations

import hashlib
import math

MIN_BLOCK_SIZE = 512  # writer.go:37 (MinBlockSize)
_U32 = 0xFFFFFFFF

MODE_FIXED = 0  # writer.go:53 ModeFixed
MODE_DYNAMIC = 1  # writer.go:61 ModeDynamic
MODE_ENTROPY = 2  # writer.go:69 ModeDynamicEntropy

_MODES = {"fixed": MODE_FIXED, "dynamic": MODE_DYNAMIC, "entropy": MODE_ENTROPY}


class MaxSizeTooSmall(ValueError):
    """maxSize below MinBlockSize (writer.go:173-175 ErrMaxSizeTooSmall)."""


def _check_max_size(max_size: int) -> None:
    if max_size < MIN_BLOCK_SIZE:
        raise MaxSizeTooSmall(f"max_size {max_size} < MinBlockSize {MIN_BLOCK_SIZE}")


def _max_hash(max_size: int) -> int:
    # writer.go:698-706 — float math, then uint32 truncation.
    fragment = math.log2(max_size / 4096.0)
    return int(2.0 ** (22 - fragment)) & _U32


def fixed_chunks(data: bytes, max_size: int) -> list[tuple[int, int]]:
    """Fixed-size boundaries (writer.go:609-653)."""
    _check_max_size(max_size)
    n = len(data)
    out = [(off, min(max_size, n - off)) for off in range(0, n, max_size)]
    return out


def _scan_zpaq(data: bytes, max_size: int):
    """Core zpaq scan → (bounds, trailing_off). trailing_off > 0 means the
    final chunk is a Close-flush (writer.go:391-406 EOS remainder), not a
    boundary emit."""
    min_f = max_size // 64
    max_f = max_size
    max_hash = _max_hash(max_size)
    o1 = bytearray(256)
    h = 0
    c1 = 0
    off = 0
    start = 0
    out = []
    append = out.append
    for i, c in enumerate(data):
        if c == o1[c1]:
            h = ((h + c + 1) * 314159265) & _U32
        else:
            h = ((h + c + 1) * 271828182) & _U32
        o1[c1] = c
        c1 = c
        off += 1
        if (off >= min_f and h < max_hash) or off >= max_f:
            append((start, off))
            start = i + 1
            off = 0
            h = 0
            c1 = 0
    if off:
        append((start, off))
    return out, off


def zpaq_chunks_py(data: bytes, max_size: int) -> list[tuple[int, int]]:
    """ZPAQ CDC boundaries, pure-Python reference kernel (writer.go:714-749)."""
    _check_max_size(max_size)
    return _scan_zpaq(data, max_size)[0]


def _scan_entropy(data: bytes, max_size: int):
    """Entropy CDC scan → (bounds, trailing_off); pure-Python kernel
    (writer.go:813-890).

    Models exactly one Write(data) + Close per stream: the phase-(a)
    histogram fill runs once at the top; post-emit blocks inside the same
    call hash against the zeroed histogram (the reference quirk).
    """
    min_f = max_size // 32
    if min_f > 65535:
        min_f = 65535
    if min_f < 512:
        min_f = 512
    max_f = max_size
    max_hash = _max_hash(max_size)
    avg_hist = min_f // 255

    n = len(data)
    hist = [0] * 256
    # phase (a): first min_f bytes of the single Write call
    take = n if n < min_f else min_f
    for i in range(take):
        hist[data[i]] += 1
    off = take
    h = 0
    start = 0
    out = []
    append = out.append
    pos = take
    while pos < n:
        c = data[pos]
        if hist[c] >= avg_hist:
            h = ((h + c + 1) * 314159265) & _U32
        else:
            h = ((h + c + 1) * 271828182) & _U32
        off += 1
        pos += 1
        if (off >= min_f and h < max_hash) or off >= max_f:
            append((start, off))
            start = pos
            hist = [0] * 256
            off = 0
            h = 0
    if off:
        append((start, off))
    return out, off


def entropy_chunks_py(data: bytes, max_size: int) -> list[tuple[int, int]]:
    """Entropy CDC boundaries, pure-Python kernel (writer.go:813-890)."""
    _check_max_size(max_size)
    return _scan_entropy(data, max_size)[0]


def chunks_with_flush(data: bytes, mode, max_size: int):
    """(bounds, trailing_flush). trailing_flush=True means the final chunk
    is the Close()-time remainder (EOS-carried in the wire formats), not a
    boundary-emitted block. Uses the pure-Python kernels (exporter path)."""
    _check_max_size(max_size)
    if isinstance(mode, str):
        mode = _MODES[mode]
    if mode == MODE_FIXED:
        bounds = fixed_chunks(data, max_size)
        return bounds, len(data) % max_size != 0
    scan = _scan_zpaq if mode == MODE_DYNAMIC else _scan_entropy
    bounds, trailing = scan(data, max_size)
    return bounds, trailing > 0


# ---------------------------------------------------------------------------
# Optional C fast path (ctypes).  Built lazily, falls back to pure Python.
# The CDC loop is a data-dependent byte recurrence (SURVEY.md §4) — it cannot
# be numpy-vectorized, so a tiny compiled kernel is the honest fast path.
# ---------------------------------------------------------------------------

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

/* Returns number of boundaries written to ends[] (end offsets, exclusive).
   Caller sizes ends[] to at least len/min_f + 2. */
long zpaq_bounds(const uint8_t *data, long n, long min_f, long max_f,
                 uint32_t max_hash, long *ends) {
    uint8_t o1[256];
    memset(o1, 0, sizeof(o1));
    uint32_t h = 0;
    uint8_t c1 = 0;
    long off = 0, cnt = 0;
    for (long i = 0; i < n; i++) {
        uint8_t c = data[i];
        if (c == o1[c1]) h = (h + c + 1) * 314159265u;
        else             h = (h + c + 1) * 271828182u;
        o1[c1] = c;
        c1 = c;
        off++;
        if ((off >= min_f && h < max_hash) || off >= max_f) {
            ends[cnt++] = i + 1;
            off = 0; h = 0; c1 = 0;
        }
    }
    if (off) ends[cnt++] = n;
    return cnt;
}

long entropy_bounds(const uint8_t *data, long n, long min_f, long max_f,
                    uint32_t max_hash, uint16_t avg_hist, long *ends) {
    uint16_t hist[256];
    memset(hist, 0, sizeof(hist));
    long take = n < min_f ? n : min_f;
    for (long i = 0; i < take; i++) hist[data[i]]++;
    uint32_t h = 0;
    long off = take, cnt = 0;
    for (long i = take; i < n; i++) {
        uint8_t c = data[i];
        if (hist[c] >= avg_hist) h = (h + c + 1) * 314159265u;
        else                     h = (h + c + 1) * 271828182u;
        off++;
        if ((off >= min_f && h < max_hash) || off >= max_f) {
            ends[cnt++] = i + 1;
            memset(hist, 0, sizeof(hist));
            off = 0; h = 0;
        }
    }
    if (off) ends[cnt++] = n;
    return cnt;
}
"""

_clib = None
_clib_tried = False


def _load_clib():
    """Compile + load the C kernel once per process; None on any failure."""
    global _clib, _clib_tried
    if _clib_tried:
        return _clib
    _clib_tried = True
    try:
        import ctypes
        import os
        import subprocess
        import tempfile

        cache = os.path.join(tempfile.gettempdir(), "dedup_spark_cdc")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, "cdc_kernel.so")
        if not os.path.exists(so):
            src = os.path.join(cache, "cdc_kernel.c")
            with open(src, "w") as f:
                f.write(_C_SRC)
            tmp_so = so + f".{os.getpid()}"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp_so, so)  # atomic for concurrent workers
        lib = ctypes.CDLL(so)
        import ctypes as ct

        for fn in (lib.zpaq_bounds, lib.entropy_bounds):
            fn.restype = ct.c_long
        lib.zpaq_bounds.argtypes = [
            ct.c_char_p, ct.c_long, ct.c_long, ct.c_long,
            ct.c_uint32, ct.POINTER(ct.c_long),
        ]
        lib.entropy_bounds.argtypes = [
            ct.c_char_p, ct.c_long, ct.c_long, ct.c_long,
            ct.c_uint32, ct.c_uint16, ct.POINTER(ct.c_long),
        ]
        _clib = lib
    except Exception:
        _clib = None
    return _clib


def _ends_to_chunks(ends, cnt: int) -> list[tuple[int, int]]:
    out = []
    prev = 0
    for i in range(cnt):
        e = ends[i]
        out.append((prev, e - prev))
        prev = e
    return out


def zpaq_chunks(data: bytes, max_size: int) -> list[tuple[int, int]]:
    """ZPAQ CDC boundaries — C fast path when available, else pure Python."""
    _check_max_size(max_size)
    lib = _load_clib()
    if lib is None:
        return zpaq_chunks_py(data, max_size)
    import ctypes as ct

    min_f = max_size // 64
    n = len(data)
    cap = (n // max(1, min_f)) + 2
    ends = (ct.c_long * cap)()
    cnt = lib.zpaq_bounds(data, n, min_f, max_size, _max_hash(max_size), ends)
    return _ends_to_chunks(ends, cnt)


def entropy_chunks(data: bytes, max_size: int) -> list[tuple[int, int]]:
    """Entropy CDC boundaries — C fast path when available, else pure Python."""
    _check_max_size(max_size)
    lib = _load_clib()
    if lib is None:
        return entropy_chunks_py(data, max_size)
    import ctypes as ct

    min_f = max_size // 32
    min_f = max(512, min(65535, min_f))
    avg_hist = min_f // 255
    n = len(data)
    cap = (n // max(1, min_f)) + 2
    ends = (ct.c_long * cap)()
    cnt = lib.entropy_bounds(data, n, min_f, max_size, _max_hash(max_size),
                             avg_hist, ends)
    return _ends_to_chunks(ends, cnt)


def chunk_fn(mode):
    """Chunker registry (writer.go:43-70 Mode enum)."""
    if isinstance(mode, str):
        mode = _MODES[mode]
    return {
        MODE_FIXED: fixed_chunks,
        MODE_DYNAMIC: zpaq_chunks,
        MODE_ENTROPY: entropy_chunks,
    }[mode]


def split_stream(data: bytes, mode, max_size: int, hash_name: str = "sha1"):
    """Chunk ``data`` and return fragments like the reference Splitter
    (writer.go:284-342, 586-607): list of dicts with 0-based ``n``,
    ``offset``, ``length``, ``hash`` (digest bytes), ``new`` (first
    occurrence within this stream — insert-once semantics,
    writer.go:595-601).
    """
    fn = chunk_fn(mode)
    seen = set()
    frags = []
    for n, (off, length) in enumerate(fn(data, max_size)):
        digest = hashlib.new(hash_name, data[off:off + length]).digest()
        is_new = digest not in seen
        seen.add(digest)
        frags.append(
            {"n": n, "offset": off, "length": length, "hash": digest, "new": is_new}
        )
    return frags


def birthday_problem(blocks: int, hash_bytes: int = 20) -> str:
    """Collision-probability string (dedup.go:26-42 BirthdayProblem).

    Exact-format port: ``p = k(k-1)/2N``; inverse printed with 0 decimals
    (Go big.Rat.FloatString(0) — round half away from zero), probability
    with Go ``%v`` float formatting (shortest round-trip, same as Python
    repr for these magnitudes).
    """
    from fractions import Fraction

    two_n = 2 * (1 << (hash_bytes * 8))
    p = Fraction(blocks * (blocks - 1), two_n)
    inv = 1 / p
    # round half away from zero, like big.Rat.FloatString(0)
    inv_int = (inv.numerator * 2 + inv.denominator) // (2 * inv.denominator)
    f64 = float(p)
    return f"Collision probability is ~ 1/{inv_int} ~ {f64!r}"
