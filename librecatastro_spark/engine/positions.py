"""Positional phrase evaluation over pos-enabled posting blocks.

The index-only phrase path (Lucene ``.prx`` analog): an index built with
``index_options="positions"`` stores every occurrence's token position
next to its posting block (builder.py / codec.encode_positions_bulk), so
``match_phrase`` semantics can be answered ENTIRELY from the postings —
no scan of the source table at query time. At 100 TB the source scan is
the dominant cost of the verify-first path (engine/wand.py match_phrase);
this path reads only the phrase terms' posting+position blocks, the same
O(query-term postings) bill every other index query pays.

Semantics are EXACTLY the verify-first path's (rank-identity-tested):
terms adjacent in analyzed-token order, ``slop`` = max intervening tokens
PER GAP (analyzer._phrase_body documents the per-gap divergence from ES's
edit-distance slop). Position adjacency over the analyzer's token stream
is definitionally the same predicate as the anchored regex over maximal
token runs, so the DuckDB regex twins remain exact oracles for this path.

All numpy batch ops — the chain step is vectorized over ALL candidate
documents at once via packed (doc-ordinal, position) keys, never a
per-document Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..bm25 import ROUND_DECIMALS
from ..index.codec import decode_positions, decode_varbyte


def _decode_term(rows: pd.DataFrame, with_pos: bool):
    """Decode one term's block rows (already doc-ordered: block doc ranges
    are sorted and salt sub-ranges disjoint, caller sorts by first_doc_id)
    into flat (ids, tfs, dls, pos). ``pos`` is the per-occurrence position
    stream aligned with ``repeat(ids, tfs)``; None when with_pos=False."""
    counts = rows["n_docs"].to_numpy(dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    d = decode_varbyte(b"".join(rows["docs_enc"])).astype(np.int64)
    c = np.cumsum(d)
    ids = c - np.repeat(c[starts] - d[starts], counts)
    tfs = decode_varbyte(b"".join(rows["tfs_enc"])).astype(np.int64)
    dls = decode_varbyte(b"".join(rows["dls_enc"])).astype(np.int64)
    pos = None
    if with_pos:
        pos = decode_positions(
            b"".join(x for x in rows["pos_enc"] if x is not None), tfs
        )
    return ids, tfs, dls, pos


#: pseudo-term key for the type-ahead expansion stream — analyzer tokens
#: can never contain NUL, so it cannot collide with a real term
_NEXT = "\x00next"


def phrase_verify(
    term_data: dict, seq: list[str], slop: int,
    next_term_data: tuple | None = None,
) -> np.ndarray:
    """Documents whose analyzed token stream contains ``seq`` with at most
    ``slop`` intervening tokens per gap. ``term_data[t] = (ids, tfs, pos)``
    with ids sorted, pos aligned to repeat(ids, tfs).

    ``next_term_data`` (ids, tfs, pos — ids need NOT be sorted: it is a
    concatenation of many expansion terms' streams) is the type-ahead
    tail: when given, a document additionally needs one of those
    occurrences at EXACTLY last-kept-position + 1 (the ES
    match_phrase_prefix adjacency), chained as one more step with a
    zero-slop window. The expansion never constrains the candidate doc
    set (docs must contain all of ``seq``; the tail only gates the final
    keep), and is only ever a probe array — so its ordering is free.

    Vectorized chain: candidates = docs containing ALL distinct terms;
    occurrences are packed into int64 keys ordinal*CAP + position (ordinal
    = rank in the candidate list, so the key space is dense regardless of
    absolute doc ids — no overflow at 10^12-doc id spaces). Step i keeps
    an occurrence of seq[i] at position p iff some kept occurrence of
    seq[i-1] sits at q with 1 <= p-q <= slop+1 (same doc, enforced by
    clamping the probe window at the ordinal's key base). The kept side
    is always ascending, so the window test is two searchsorteds over the
    whole occurrence array at once."""
    distinct = sorted(set(seq))
    common = None
    for t in distinct:
        ids = term_data[t][0]
        common = ids if common is None else np.intersect1d(common, ids)
        if len(common) == 0:
            return np.empty(0, dtype=np.int64)
    if len(seq) == 1 and next_term_data is None:
        return common
    streams = {t: term_data[t] for t in distinct}
    if next_term_data is not None:
        streams[_NEXT] = next_term_data
    maxpos = 0
    occ = {}
    for t, (ids, tfs, pos) in streams.items():
        mask_d = np.isin(ids, common)
        ord_d = np.searchsorted(common, ids)
        occ_mask = np.repeat(mask_d, tfs)
        ord_occ = np.repeat(ord_d, tfs)[occ_mask]
        pos_occ = pos[occ_mask]
        if len(pos_occ):
            maxpos = max(maxpos, int(pos_occ.max()))
        occ[t] = (ord_occ, pos_occ)
    if next_term_data is not None and len(occ[_NEXT][0]) == 0:
        return np.empty(0, dtype=np.int64)
    cap = np.int64(1) << np.int64(max(1, int(maxpos) + slop + 2).bit_length())
    # int32 keys when the packed space fits: halves the bytes every
    # searchsorted of the chain touches (the measured hot-phrase cost)
    kdt = np.int32 if len(common) * int(cap) < 2**31 else np.int64
    cap = kdt(cap)
    keys = {
        t: occ[t][0].astype(kdt) * cap + occ[t][1].astype(kdt)
        for t in occ
    }
    steps = [(t, slop) for t in seq[1:]]
    if next_term_data is not None:
        steps.append((_NEXT, 0))  # "immediately followed": gap exactly 1
    cur = keys[seq[0]]
    for t, s in steps:
        if len(cur) == 0:
            return np.empty(0, dtype=np.int64)
        kt = keys[t]
        base = (kt // cap) * cap  # same-doc clamp for the probe window
        lo = np.maximum(kt - kdt(s + 1), base)
        hit = np.searchsorted(cur, lo, side="left") < np.searchsorted(
            cur, kt, side="left"
        )
        cur = kt[hit]
    if len(cur) == 0:
        return np.empty(0, dtype=np.int64)
    return common[np.unique(cur // cap)]


def phrase_topk_fn(
    seq: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    slop: int = 0,
):
    """Per-shard (or whole-index — no θ pruning, so the split is
    irrelevant to the result) positional phrase scorer:
    ``fn(blocks) -> (doc_id, score)`` top-k.

    Intersection-aware decode (the AND-branch pattern from
    _shard_topk_fn): the rarest term decodes fully and seeds the
    candidate doc set; every other term's blocks are range-pruned against
    the candidates BEFORE decode — a selective phrase ("def uid00123")
    decodes ~the rare term's postings plus a handful of hot-term blocks,
    not the hot terms' full posting lists. Scoring is BM25 require_all
    over the distinct terms, accumulated in sorted-term order with the
    same _impact factoring as every other path — bit-identical floats to
    the verify-first match_phrase (rank-identity-tested)."""
    distinct = sorted(set(seq))

    def fn(blocks: pd.DataFrame, attrs=None) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
        if len(blocks) == 0:
            return empty
        per_term = {}
        for t in distinct:
            sub = blocks[blocks["term"] == t]
            if len(sub) == 0:
                return empty
            per_term[t] = sub.sort_values("first_doc_id", kind="stable")
        rare = max(distinct, key=lambda t: idfs[t])
        decoded = {}
        r_ids, r_tfs, r_dls, r_pos = _decode_term(per_term[rare], True)
        decoded[rare] = (r_ids, r_tfs, r_dls, r_pos)
        cand = r_ids  # unique & sorted: one posting row per (doc, term)
        for t in distinct:
            if t == rare:
                continue
            sub = per_term[t]
            lo = np.searchsorted(
                cand, sub["first_doc_id"].to_numpy(dtype=np.int64), side="left"
            )
            hi = np.searchsorted(
                cand, sub["last_doc_id"].to_numpy(dtype=np.int64), side="right"
            )
            sub = sub[hi > lo]
            if len(sub) == 0:
                return empty
            decoded[t] = _decode_term(sub, True)
        verified = phrase_verify(
            {t: (decoded[t][0], decoded[t][1], decoded[t][3]) for t in distinct},
            seq,
            slop,
        )
        if len(verified) == 0:
            return empty
        return _score_verified(decoded, distinct, idfs, avgdl, verified, k)

    return fn


def _score_verified(
    decoded: dict, distinct: list[str], idfs: dict, avgdl: float,
    verified: np.ndarray, k: int,
) -> pd.DataFrame:
    """BM25 require_all over ``distinct`` terms for the ``verified`` doc
    set, term-major accumulation in sorted-term order — the same _impact
    factoring as every other path, so floats are bit-identical to the
    verify-first phrase scorers (rank-identity-tested). Shared by the
    phrase and phrase-prefix positional kernels."""
    from .wand import _impact

    acc = np.zeros(len(verified), dtype=np.float64)
    for t in distinct:
        ids, tfs, dls, _ = decoded[t]
        m = np.isin(ids, verified)
        idx = np.searchsorted(verified, ids[m])
        w = idfs[t] * _impact(
            tfs[m].astype(np.float64), dls[m].astype(np.float64), avgdl
        )
        acc += np.bincount(idx, weights=w, minlength=len(verified))
    scores = np.round(acc, ROUND_DECIMALS)
    if len(verified) > k:
        order = np.lexsort((verified, -scores))[:k]
        verified, scores = verified[order], scores[order]
    return pd.DataFrame(
        {
            "doc_id": verified.astype(np.int64, copy=False),
            "score": scores.astype(np.float64, copy=False),
        }
    )


def phrase_prefix_topk_fn(
    seq: list[str],
    pfx: str,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
):
    """Per-shard positional type-ahead scorer (ES match_phrase_prefix,
    index-only): ``seq`` = the COMPLETE analyzed terms (scored, BM25
    require_all), ``pfx`` = the trailing prefix (membership only — a doc
    qualifies iff the complete sequence appears adjacent in order with a
    token starting with ``pfx`` at the NEXT position).

    The input blocks carry BOTH roles: rows whose term is in ``seq`` and
    rows whose term starts with ``pfx`` (the Catalyst scan unions the two
    pushed predicates); a complete term that itself starts with ``pfx``
    legitimately serves both. Complete terms decode intersection-aware
    (rarest seeds candidates, exactly phrase_topk_fn); the expansion rows
    are range-pruned against those candidates BEFORE decode, then their
    occurrence streams concatenate into the chain's zero-slop tail —
    never collected, never scored, so there is no max_expansions
    dependence (the verify-first semantics, preserved exactly)."""
    distinct = sorted(set(seq))

    def fn(blocks: pd.DataFrame, attrs=None) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
        if len(blocks) == 0:
            return empty
        exp_rows = blocks[blocks["term"].str.startswith(pfx)]
        if len(exp_rows) == 0:
            return empty
        per_term = {}
        for t in distinct:
            sub = blocks[blocks["term"] == t]
            if len(sub) == 0:
                return empty
            per_term[t] = sub.sort_values("first_doc_id", kind="stable")
        rare = max(distinct, key=lambda t: idfs[t])
        decoded = {rare: _decode_term(per_term[rare], True)}
        cand = decoded[rare][0]
        for t in distinct:
            if t == rare:
                continue
            sub = per_term[t]
            lo = np.searchsorted(
                cand, sub["first_doc_id"].to_numpy(dtype=np.int64), side="left"
            )
            hi = np.searchsorted(
                cand, sub["last_doc_id"].to_numpy(dtype=np.int64), side="right"
            )
            sub = sub[hi > lo]
            if len(sub) == 0:
                return empty
            decoded[t] = _decode_term(sub, True)
        lo = np.searchsorted(
            cand, exp_rows["first_doc_id"].to_numpy(dtype=np.int64), side="left"
        )
        hi = np.searchsorted(
            cand, exp_rows["last_doc_id"].to_numpy(dtype=np.int64), side="right"
        )
        exp_rows = exp_rows[hi > lo]
        if len(exp_rows) == 0:
            return empty
        ids_l, tfs_l, pos_l = [], [], []
        for _, grp in exp_rows.groupby("term", sort=False):
            gi, gt, _, gp = _decode_term(
                grp.sort_values("first_doc_id", kind="stable"), True
            )
            ids_l.append(gi)
            tfs_l.append(gt)
            pos_l.append(gp)
        nxt = (
            np.concatenate(ids_l),
            np.concatenate(tfs_l),
            np.concatenate(pos_l),
        )
        verified = phrase_verify(
            {t: (decoded[t][0], decoded[t][1], decoded[t][3]) for t in distinct},
            seq,
            0,
            next_term_data=nxt,
        )
        if len(verified) == 0:
            return empty
        return _score_verified(decoded, distinct, idfs, avgdl, verified, k)

    return fn
