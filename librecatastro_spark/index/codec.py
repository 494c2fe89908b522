"""docID-delta + varbyte posting-block codec — numpy-vectorized.

The Spark-native analog of the Lucene postings format inside the
reference's 5 ES shards (reference: src/utils/elasticsearch_utils.py:28-30).
MSB-first varbyte: 7 payload bits per byte, high bit set on every byte
except the last of a value. Doc ids are sorted and delta-encoded
(first value absolute) before varbyte.

Everything operates on whole numpy arrays — no per-value Python in either
direction (input_hint: vectorized only). Encode loops are over the ≤10
byte-positions of a uint64, not over values.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def _byte_lengths(v: np.ndarray) -> np.ndarray:
    """Varbyte length (1..10) per value, vectorized."""
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    return nb


def encode_varbyte(values: np.ndarray) -> bytes:
    """Encode a uint64 array to MSB-first varbyte."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if len(v) == 0:
        return b""
    nb = _byte_lengths(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for j in range(max_nb):
        mask = nb > j
        # byte j of a value occupying nb bytes holds bits (nb-1-j)*7 ..
        shift = ((nb[mask] - 1 - j) * 7).astype(np.uint64)
        out[starts[mask] + j] = ((v[mask] >> shift) & _U64(0x7F)).astype(np.uint8)
        cont = mask & (nb - 1 > j)
        out[starts[cont] + j] |= 0x80
    return out.tobytes()


def decode_varbyte(buf: bytes) -> np.ndarray:
    """Decode MSB-first varbyte back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    if is_last.all():
        # every value fits 7 bits (tf/dl/position-delta streams mostly do):
        # the buffer IS the value array — skip the boundary/shift machinery
        # (~3x on such streams, measured on the hot-phrase position decode)
        return b.astype(_U64)
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=_U64)
    payload = (b & 0x7F).astype(_U64)
    max_len = int(lengths.max())
    for j in range(max_len):
        mask = lengths > j
        vals[mask] = (vals[mask] << _U64(7)) | payload[starts[mask] + j]
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64/uint64 ids → (first, gaps...) as uint64."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if len(a) == 0:
        return np.empty(0, dtype=_U64)
    out = np.empty(len(a), dtype=np.int64)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    if len(a) > 1 and out[1:].min() <= 0:
        raise ValueError("doc ids must be strictly increasing within a block")
    return out.astype(_U64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64)).astype(np.int64)


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """One posting block: sorted doc_ids delta+varbyte, tfs varbyte."""
    return (
        encode_varbyte(delta_encode(doc_ids)),
        encode_varbyte(np.ascontiguousarray(tfs, dtype=_U64)),
    )


def decode_block(docs_enc: bytes, tfs_enc: bytes) -> tuple[np.ndarray, np.ndarray]:
    return (
        delta_decode(decode_varbyte(docs_enc)),
        decode_varbyte(tfs_enc).astype(np.int64),
    )


def _encode_varbyte_sliced(values: np.ndarray, slice_starts: np.ndarray) -> list[bytes]:
    """Varbyte-encode ONE array, return it pre-sliced at the given value
    boundaries. One numpy pass for arbitrarily many blocks — the bulk path
    that replaces per-block encode calls (each ~50 µs of numpy dispatch
    overhead; a 10M-posting shard has ~80k blocks × 3 streams)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if len(v) == 0:
        return []
    nb = _byte_lengths(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for j in range(max_nb):
        mask = nb > j
        shift = ((nb[mask] - 1 - j) * 7).astype(np.uint64)
        out[starts[mask] + j] = ((v[mask] >> shift) & _U64(0x7F)).astype(np.uint8)
        cont = mask & (nb - 1 > j)
        out[starts[cont] + j] |= 0x80
    buf = out.tobytes()
    # byte offset where each slice begins
    b_starts = np.append(starts[slice_starts], int(ends[-1]))
    return [buf[b_starts[i]:b_starts[i + 1]] for i in range(len(slice_starts))]


def encode_positions_bulk(
    positions: np.ndarray, row_starts: np.ndarray
) -> list[bytes]:
    """Per-ROW position streams (Lucene .prx analog): ``positions`` holds
    every occurrence position (token index within its document, ascending
    per row) for MANY (doc, term) rows concatenated; ``row_starts`` marks
    where each row's run begins. Each row is delta-encoded with an
    absolute first value, then the whole batch is varbyte-encoded in ONE
    vectorized pass and sliced at the row boundaries — the same bulk
    shape as the doc-id stream in ``encode_blocks_bulk``. Rows with tf=1
    cost one varbyte value; typical gaps are small so most bytes are
    single-byte."""
    n = len(positions)
    if n == 0:
        return []
    p = np.ascontiguousarray(positions, dtype=np.int64)
    row_starts = np.ascontiguousarray(row_starts, dtype=np.int64)
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = p[0]
    np.subtract(p[1:], p[:-1], out=deltas[1:])
    deltas[row_starts] = p[row_starts]
    inner = np.ones(n, dtype=bool)
    inner[row_starts] = False
    if inner.any() and deltas[inner].min() <= 0:
        raise ValueError("positions must be strictly increasing within a row")
    return _encode_varbyte_sliced(deltas.astype(_U64), row_starts)


def decode_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of the concatenation of ``encode_positions_bulk`` slices:
    ``counts`` gives the number of positions per (doc, term) row in stream
    order; returns the flat position array with the per-row delta resets
    undone (cumsum-minus-base, the same trick the doc-id decode uses)."""
    d = decode_varbyte(buf).astype(np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    if len(d) == 0:
        return d
    starts = np.zeros(len(counts), dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    c = np.cumsum(d)
    return c - np.repeat(c[starts] - d[starts], counts)


def encode_blocks_bulk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    weights: np.ndarray,
    run_starts: np.ndarray,
    block_size: int,
) -> dict[str, object]:
    """Chunk many (term, salt) posting runs into fixed-size blocks and
    encode every stream in ONE vectorized pass each.

    Inputs are the full sorted bucket group: ``run_starts`` marks where a
    new (term, salt) run begins (position indices, first must be 0).
    Returns per-block columns: run_idx (index into run_starts), block_seq,
    n_docs, first/last doc id, docs_enc / tfs_enc / dls_enc bytes, and
    block_max_w. Byte-identical to per-block encode_block output
    (equality-tested)."""
    n = len(doc_ids)
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    run_starts = np.ascontiguousarray(run_starts, dtype=np.int64)
    run_ends = np.append(run_starts[1:], n)
    pos_in_run = np.arange(n, dtype=np.int64) - np.repeat(
        run_starts, run_ends - run_starts
    )
    # block start positions: every position where pos_in_run % block_size == 0
    blk_starts = np.flatnonzero(pos_in_run % block_size == 0)
    blk_ends = np.append(blk_starts[1:], n)
    # delta with absolute value at every block start
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    deltas[blk_starts] = ids[blk_starts]
    inner = np.ones(n, dtype=bool)
    inner[blk_starts] = False
    if inner.any() and deltas[inner].min() <= 0:
        raise ValueError("doc ids must be strictly increasing within a block")
    return {
        "blk_starts": blk_starts,  # row-position block boundaries, for
        "blk_ends": blk_ends,      # callers slicing parallel streams
        "run_idx": np.searchsorted(run_starts, blk_starts, side="right") - 1,
        "block_seq": (pos_in_run[blk_starts] // block_size).astype(np.int64),
        "n_docs": (blk_ends - blk_starts).astype(np.int64),
        "first_doc_id": ids[blk_starts],
        "last_doc_id": ids[blk_ends - 1],
        "docs_enc": _encode_varbyte_sliced(deltas.astype(_U64), blk_starts),
        "tfs_enc": _encode_varbyte_sliced(
            np.ascontiguousarray(tfs, dtype=_U64), blk_starts
        ),
        "dls_enc": _encode_varbyte_sliced(
            np.ascontiguousarray(dls, dtype=_U64), blk_starts
        ),
        "block_max_w": np.maximum.reduceat(weights, blk_starts),
    }
