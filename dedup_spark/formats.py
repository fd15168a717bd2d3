"""Reference-compatible stream codec (FORMAT.md; SURVEY.md S5-S8, H3).

Byte-exact implementation of the reference's two wire formats:

* Format 1 (indexed): separate index + data streams
  (/root/reference/writer.go:475-532, reader.go:167-229).
* Format 2 (single stream, bounded backref): interleaved records
  (/root/reference/writer.go:536-582, reader.go:408-493).

Golden anchors (reference test outputs, writer_test.go:747-809):
  50,000 zero bytes, fixed @1000 → index 67 B, data 1,000 B;
  stream format with maxMemory 10 blocks → 1,068 B total.

This is a single-node exporter/importer — the distributed engine stores
manifests columnar (SURVEY.md §1); these streams exist for
interoperability with reference-format archives.
"""

from __future__ import annotations

import hashlib
import io

from .chunkers import chunk_fn

MAX_U64 = (1 << 64) - 1


def write_uvarint(buf: io.BytesIO, x: int) -> None:
    """Go encoding/binary.PutUvarint (FORMAT.md:5-13)."""
    while x >= 0x80:
        buf.write(bytes((x & 0x7F | 0x80,)))
        x >>= 7
    buf.write(bytes((x,)))


def read_uvarint(buf: io.BytesIO) -> int:
    x = 0
    s = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated uvarint")
        v = b[0]
        if v < 0x80:
            return x | (v << s)
        x |= (v & 0x7F) << s
        s += 7


def _encode_blocks(data: bytes, mode, max_size: int, max_backref: int | None,
                   max_index_blocks: int = 0):
    """Chunk + dedup-index walk shared by both writers.

    Returns (records, trailer_bytes): records are (payload|None, offset)
    tuples for boundary-emitted blocks (None ⇒ dup); trailer_bytes is the
    Close()-time remainder carried raw by the EOS record — the reference
    neither hashes nor indexes it (writer.go:391-406, 409-424).

    ``max_index_blocks`` > 0 enables the format-1 bounded-memory index
    eviction (writer.go:510-527): whenever the index exceeds that many
    entries, sort the stored block numbers ascending and drop every entry
    older than the ``maxBlocks/4``-th one — the reference's amortized
    approximate LRU ("Cut the oldest quarter blocks since this isn't
    free"). Required for byte-exact interop with memory-bounded reference
    archives.
    """
    from .chunkers import chunks_with_flush

    bounds, trailing_flush = chunks_with_flush(data, mode, max_size)
    emitted = bounds[:-1] if (trailing_flush and bounds) else bounds
    trailer = (
        data[bounds[-1][0]:bounds[-1][0] + bounds[-1][1]]
        if (trailing_flush and bounds) else b""
    )
    index: dict[bytes, int] = {}
    records = []
    for n, (off, length) in enumerate(emitted):
        payload = data[off:off + length]
        h = hashlib.sha1(payload).digest()
        match = index.get(h)
        if match is not None and (max_backref is None or n - match <= max_backref):
            records.append((None, n - match))
        else:
            records.append((payload, 0))
        index[h] = n  # "Update hash to latest match" (writer.go:507-508)
        if max_index_blocks > 0 and len(index) > max_index_blocks:
            ar = sorted(index.values())
            cutoff = ar[max_index_blocks // 4]
            index = {k: v for k, v in index.items() if v >= cutoff}
    return records, trailer


def encode_format1(data: bytes, mode="fixed", max_size: int = 1024,
                   max_memory: int = 0):
    """Returns (index_bytes, data_bytes).

    ``max_memory`` > 0 bounds the dedup index to ``max_memory // max_size``
    blocks via the reference's quartile-cut eviction (NewWriter's maxMemory
    knob, writer.go:132-155, 510-527); 0 keeps the index unbounded.
    """
    idx = io.BytesIO()
    dat = io.BytesIO()
    write_uvarint(idx, 1)
    write_uvarint(idx, max_size)
    records, trailer = _encode_blocks(
        data, mode, max_size, None, max_index_blocks=max_memory // max_size
    )
    for payload, off in records:
        if payload is None:
            write_uvarint(idx, off)
        else:
            write_uvarint(idx, 0)
            write_uvarint(idx, max_size - len(payload))
            dat.write(payload)
    write_uvarint(idx, MAX_U64)
    write_uvarint(idx, max_size - len(trailer))
    write_uvarint(idx, 0)
    dat.write(trailer)  # idxClose copies the remainder to the data stream
    return idx.getvalue(), dat.getvalue()


def decode_format1(index: bytes, data: bytes) -> bytes:
    idx = io.BytesIO(index)
    dat = io.BytesIO(data)
    if read_uvarint(idx) != 1:
        raise ValueError("not a format-1 index stream")
    max_size = read_uvarint(idx)
    if max_size < 512:
        raise ValueError("MaxBlockSize < 512")
    blocks: list[bytes] = []
    out = io.BytesIO()
    while True:
        offset = read_uvarint(idx)
        if offset == 0 or offset == MAX_U64:
            x = read_uvarint(idx)
            if x > max_size:
                raise ValueError("bad block size")
            size = max_size - x
            block = dat.read(size)
            if len(block) != size:
                raise ValueError("data stream truncated")
            if offset == MAX_U64:
                out.write(block)
                if read_uvarint(idx) != 0:
                    raise ValueError("bad stream terminator")
                return out.getvalue()
            # every non-EOS new record occupies a backref position, even a
            # zero-length one — the reference reader appends an rblock
            # unconditionally (reader.go:195), so later offsets count it
            blocks.append(block)
            out.write(block)
        else:
            src = len(blocks) - offset
            if src < 0:
                raise ValueError("backreference before stream start")
            block = blocks[src]
            blocks.append(block)
            out.write(block)


def format1_max_mem(index: bytes) -> int:
    """Reader MaxMem over a format-1 index stream (reader.go:167-229 parse +
    324-349 sweep): each unique block is live from its first to its last
    occurrence; peak = max running sum of readData over block positions.
    The trailing EOS block (first=last=its own position in the walk, like
    the reference's zero-value rblock fields) never accumulates."""
    idx = io.BytesIO(index)
    if read_uvarint(idx) != 1:
        raise ValueError("not a format-1 index stream")
    max_size = read_uvarint(idx)
    # blocks[i] = shared [first, last, read_data] cell; position 0 unused
    blocks: list[list[int]] = [[0, 0, 0]]
    i = 0
    while True:
        i += 1
        offset = read_uvarint(idx)
        if offset == 0:
            r = read_uvarint(idx)
            if r > max_size:
                # reader.go validates r > size for new AND EOS records; a
                # corrupt index otherwise yields a negative readData and a
                # nonsense peak instead of an error
                raise ValueError("bad block size")
            blocks.append([i, i, max_size - r])
        elif offset == MAX_U64:
            r = read_uvarint(idx)
            if r > max_size:
                raise ValueError("bad block size")
            blocks.append([0, 0, max_size - r])
            if read_uvarint(idx) != 0:
                raise ValueError("bad stream terminator")
            break
        else:
            pos = len(blocks) - offset
            if pos <= 0:
                raise ValueError("invalid offset")
            org = blocks[pos]
            org[1] = i
            blocks.append(org)
    cur = peak = 0
    for i in range(1, len(blocks)):
        first, last, read_data = blocks[i]
        if first == i:
            cur += read_data
        peak = max(peak, cur)
        if last == i:
            cur -= read_data
    return peak


def encode_format2(data: bytes, mode="fixed", max_size: int = 1024,
                   max_blocks: int = 1) -> bytes:
    """Single interleaved stream with bounded backref distance
    (writer.go:536-582; maxBlocks = maxMemory // maxSize)."""
    max_blocks = max(1, max_blocks)
    s = io.BytesIO()
    write_uvarint(s, 2)
    write_uvarint(s, max_size)
    write_uvarint(s, max_blocks)
    records, trailer = _encode_blocks(data, mode, max_size, max_blocks)
    for payload, off in records:
        if payload is None:
            write_uvarint(s, off)
        else:
            write_uvarint(s, 0)
            write_uvarint(s, max_size - len(payload))
            s.write(payload)
    write_uvarint(s, MAX_U64)
    write_uvarint(s, max_size - len(trailer))
    s.write(trailer)  # streamClose: remainder precedes the terminator
    write_uvarint(s, 0)
    return s.getvalue()


def decode_format2(stream: bytes) -> bytes:
    s = io.BytesIO(stream)
    if read_uvarint(s) != 2:
        raise ValueError("not a format-2 stream")
    max_size = read_uvarint(s)
    max_len = read_uvarint(s)
    if max_size < 512 or max_len < 1:
        raise ValueError("bad header")
    blocks: list[bytes] = []  # reference keeps a max_len ring; list is fine here
    out = io.BytesIO()
    while True:
        offset = read_uvarint(s)
        if offset == 0 or offset == MAX_U64:
            x = read_uvarint(s)
            if x > max_size:
                raise ValueError("bad block size")
            size = max_size - x
            block = s.read(size)
            if len(block) != size:
                raise ValueError("stream truncated")
            if offset == MAX_U64:
                out.write(block)
                if read_uvarint(s) != 0:
                    raise ValueError("bad stream terminator")
                return out.getvalue()
            # non-EOS records occupy a backref position even at size 0
            # (position parity with the reference reader, reader.go:440ff)
            blocks.append(block)
            out.write(block)
        else:
            if offset > max_len:
                raise ValueError("backreference exceeds MaxLength")
            src = len(blocks) - offset
            if src < 0:
                raise ValueError("backreference before stream start")
            block = blocks[src]
            blocks.append(block)
            out.write(block)
