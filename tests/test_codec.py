from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from librecatastro_spark.index.codec import (
    decode_block,
    decode_varbyte,
    delta_decode,
    delta_encode,
    encode_block,
    encode_varbyte,
)


def test_varbyte_roundtrip_edges():
    cases = [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([127, 128, 129], dtype=np.uint64),
        np.array([2**7 - 1, 2**7, 2**14 - 1, 2**14, 2**63, 2**64 - 1], dtype=np.uint64),
    ]
    for c in cases:
        out = decode_varbyte(encode_varbyte(c))
        assert np.array_equal(out, c), c


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(decode_varbyte(encode_varbyte(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_block_roundtrip_property(ids):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    tfs = (doc_ids % 17 + 1).astype(np.int64)
    d, t = decode_block(*encode_block(doc_ids, tfs))
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)


def test_delta_requires_strictly_increasing():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 3, 4]))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 4]))


def test_delta_roundtrip():
    ids = np.array([0, 1, 128, 10**12], dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_compression_is_effective():
    ids = np.arange(0, 128 * 50, 3, dtype=np.int64)  # small gaps
    enc, _ = encode_block(ids, np.ones(len(ids), dtype=np.int64))
    assert len(enc) < len(ids) * 2  # ~1 byte/gap vs 8 raw


def test_encode_blocks_bulk_matches_per_block():
    import numpy as np

    from librecatastro_spark.index.codec import (
        encode_block,
        encode_blocks_bulk,
        encode_varbyte,
    )

    rng = np.random.RandomState(7)
    # three runs of varying lengths, sorted ids within each run
    runs = [
        np.sort(rng.choice(100_000, size=s, replace=False))
        for s in (1, 130, 700)
    ]
    run_starts = np.array([0, 1, 131], dtype=np.int64)
    ids = np.concatenate(runs).astype(np.int64)
    tfs = rng.randint(1, 50, size=len(ids)).astype(np.int64)
    dls = rng.randint(10, 3000, size=len(ids)).astype(np.int64)
    w = rng.rand(len(ids))
    bs = 128
    out = encode_blocks_bulk(ids, tfs, dls, w, run_starts, bs)

    # reference: per-run, per-block encode_block
    k = 0
    for ri, (s, e) in enumerate(
        zip(run_starts, list(run_starts[1:]) + [len(ids)])
    ):
        for seq, lo in enumerate(range(s, e, bs)):
            hi = min(lo + bs, e)
            d_ref, t_ref = encode_block(ids[lo:hi], tfs[lo:hi])
            assert out["docs_enc"][k] == d_ref
            assert out["tfs_enc"][k] == t_ref
            assert out["dls_enc"][k] == encode_varbyte(
                dls[lo:hi].astype(np.uint64)
            )
            assert out["run_idx"][k] == ri
            assert out["block_seq"][k] == seq
            assert out["n_docs"][k] == hi - lo
            assert out["first_doc_id"][k] == ids[lo]
            assert out["last_doc_id"][k] == ids[hi - 1]
            assert abs(out["block_max_w"][k] - w[lo:hi].max()) < 1e-12
            k += 1
    assert k == len(out["docs_enc"])
