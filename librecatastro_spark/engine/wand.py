"""Block-max top-k retrieval over the compressed index (capability B14).

Per-shard scorer + global merge — exactly the reference's ES architecture:
5 shards each return local top-k, the coordinator re-ranks (reference:
src/utils/elasticsearch_utils.py:28-30 config; inherent to every
es.search). Here: cogrouped ``applyInPandas`` per shard (blocks × doc
attrs) → local top-k → Catalyst ``TakeOrderedAndProject`` global merge.

The classic block-max WAND pointer walk is per-document Python — banned
(input_hint). We use a **vectorized two-pass block-max prune** with the
same skipping benefit and provable exactness:

1. θ := k-th best *partial* score from fully scoring the rarest query term
   (a valid lower bound on the final k-th score).
2. Prune any block b of term t with ``block_max_w(b) + Σ_{t'≠t} U_{t'} < θ``
   where U_t is term t's global max block weight. For a doc d whose blocks
   are ALL pruned, taking t* = argmax block_max over d's terms gives
   score(d) ≤ block_max(b_{t*}) + Σ_{t'≠t*} U_{t'} < θ — so d can never
   enter the top-k. Every potential top-k doc therefore appears in ≥1
   surviving block.
3. TAAT-score surviving blocks (vectorized decode + groupby-sum), take the
   candidate set, then add back the contributions hiding in pruned blocks
   whose [first_doc_id, last_doc_id] range intersects a candidate
   (targeted decode) — candidates' scores are now exact; final top-k.

Boolean composition (B7): keyword/prefix filters and must_not exclusions
are applied to the candidate mask before θ and before top-k (constant-score
clauses, ES `bool.must` filter semantics). `require_all` (AND of analyzed
terms, scores summed) disables block pruning and filters on
matched-term-count — must queries have small match sets, skipping buys
little there.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import analyze_text
from ..bm25 import B, K1, ROUND_DECIMALS
from ..index.builder import (
    load_attrs,
    load_postings,
    load_term_stats,
    read_meta,
)
from ..index.codec import decode_block, decode_varbyte, delta_decode

_RESULT_SCHEMA = "doc_id long, score double"


def _score_arrays(tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    return idf * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))


def _shard_topk_fn(
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    filters: dict[str, str] | None,
    prefix: tuple[str, str] | None,
    must_not_terms: list[str],
    require_all: bool,
):
    """Build the cogrouped per-shard scorer. Everything inside is numpy /
    pandas batch ops — no per-row Python."""
    U = None  # computed per shard from block metadata

    def fn(blocks: pd.DataFrame, attrs: pd.DataFrame) -> pd.DataFrame:
        if len(blocks) == 0 or len(attrs) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        dl_map = pd.Series(
            attrs["dl"].to_numpy(dtype=np.float64),
            index=attrs["doc_id"].to_numpy(dtype=np.int64),
        )
        # --- constant-score filter clauses → allowed doc set (B4/B5) ---
        allowed = None
        if filters or prefix:
            m = pd.Series(True, index=attrs.index)
            for col, val in (filters or {}).items():
                m &= attrs[col] == val
            if prefix is not None:
                m &= attrs[prefix[0]].str.startswith(prefix[1])
            allowed = np.sort(attrs.loc[m, "doc_id"].to_numpy(dtype=np.int64))
        # --- must_not exclusion set (decode doc ids only) (B7) ---
        excluded = None
        if must_not_terms:
            nb = blocks[blocks["term"].isin(must_not_terms)]
            parts = [delta_decode(decode_varbyte(enc)) for enc in nb["docs_enc"]]
            if parts:
                excluded = np.unique(np.concatenate(parts))
        qb = blocks[blocks["term"].isin(terms)]
        if len(qb) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})

        def ok_mask(ids: np.ndarray) -> np.ndarray:
            m = np.ones(len(ids), dtype=bool)
            if allowed is not None:
                m &= np.isin(ids, allowed, assume_unique=False)
            if excluded is not None:
                m &= ~np.isin(ids, excluded)
            return m

        def score_block_rows(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
            ids_l, w_l, t_l = [], [], []
            for r in rows.itertuples(index=False):
                ids, tfs = decode_block(r.docs_enc, r.tfs_enc)
                w = _score_arrays(
                    tfs.astype(np.float64),
                    dl_map.reindex(ids).to_numpy(dtype=np.float64),
                    idfs[r.term],
                    avgdl,
                )
                ids_l.append(ids)
                w_l.append(w)
                t_l.append(np.full(len(ids), hash(r.term), dtype=np.int64))
            if not ids_l:
                e = np.empty(0)
                return e.astype(np.int64), e, e.astype(np.int64)
            return np.concatenate(ids_l), np.concatenate(w_l), np.concatenate(t_l)

        # rescale stored bounds to current idf (grows with appends; see
        # builder.py idf_build note) — keeps them valid upper bounds
        qb = qb.assign(
            bound=qb["block_max_w"].to_numpy()
            * qb["term"].map(idfs).to_numpy()
            / np.maximum(qb["idf_build"].to_numpy(), 1e-12)
        )
        if require_all:
            ids, w, th = score_block_rows(qb)
            dfagg = pd.DataFrame({"doc_id": ids, "w": w, "t": th})
            agg = dfagg.groupby("doc_id").agg(score=("w", "sum"), n=("t", "nunique"))
            agg = agg[agg["n"] == len(set(terms))]
            cand_ids = agg.index.to_numpy(dtype=np.int64)
            keep = ok_mask(cand_ids)
            out = pd.DataFrame({"doc_id": cand_ids[keep], "score": agg["score"].to_numpy()[keep]})
        else:
            # ---- pass 1: θ from the rarest term, then block prune --------
            u_per_term = qb.groupby("term")["bound"].max()
            theta = -math.inf
            rare = u_per_term.index[np.argmax([idfs[t] for t in u_per_term.index])]
            r_ids, r_w, _ = score_block_rows(qb[qb["term"] == rare])
            if len(r_ids):
                km = ok_mask(r_ids)
                r_w = r_w[km]
                if len(r_w) >= k:
                    theta = float(np.partition(r_w, -k)[-k])
            sum_u = float(u_per_term.sum())
            others = sum_u - qb["term"].map(u_per_term).to_numpy()
            survive = (qb["bound"].to_numpy() + others) >= theta
            kept, pruned = qb[survive], qb[~survive]
            ids, w, _ = score_block_rows(kept)
            m = ok_mask(ids)
            scores = pd.Series(w[m]).groupby(pd.Series(ids[m])).sum()
            if len(pruned) and len(scores):
                cand = scores.index.to_numpy(dtype=np.int64)
                lo = pruned["first_doc_id"].to_numpy(dtype=np.int64)
                hi = pruned["last_doc_id"].to_numpy(dtype=np.int64)
                # a pruned block matters only if its id range holds a candidate
                pos_lo = np.searchsorted(np.sort(cand), lo, side="left")
                pos_hi = np.searchsorted(np.sort(cand), hi, side="right")
                need = pos_hi > pos_lo
                if need.any():
                    p_ids, p_w, _ = score_block_rows(pruned[need])
                    sel = np.isin(p_ids, cand)
                    if sel.any():
                        add = pd.Series(p_w[sel]).groupby(pd.Series(p_ids[sel])).sum()
                        scores = scores.add(add, fill_value=0.0)
            out = scores.reset_index()
            out.columns = ["doc_id", "score"]
        if len(out) > k:
            out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return out.astype({"doc_id": "int64", "score": "float64"})

    return fn


class CompressedIndex:
    """Query engine over an on-disk index built by index.builder."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.meta = read_meta(out_dir)
        self.postings = load_postings(spark, out_dir)
        self.attrs = load_attrs(spark, out_dir)
        self.term_stats = load_term_stats(spark, out_dir)

    def _idfs(self, terms: list[str]) -> dict[str, float]:
        rows = self.term_stats.where(F.col("term").isin(terms)).collect()
        n = float(self.meta.n_docs)
        return {
            r["term"]: math.log1p((n - r["df"] + 0.5) / (r["df"] + 0.5))
            for r in rows
        }

    def search(
        self,
        text: str,
        k: int = 10,
        require_all: bool = False,
        filters: dict[str, str] | None = None,
        prefix: tuple[str, str] | None = None,
        must_not_text: str | None = None,
    ) -> DataFrame:
        terms = sorted(set(analyze_text(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]  # drop zero-df terms
        must_not_terms = sorted(set(analyze_text(must_not_text or "")))
        empty = self.spark.createDataFrame([], _RESULT_SCHEMA)
        if not terms:
            return empty
        wanted = terms + must_not_terms
        blocks = self.postings.where(F.col("term").isin(wanted))
        attr_cols = ["shard", "doc_id", "dl"]
        for c in (filters or {}):
            attr_cols.append(c)
        if prefix is not None:
            attr_cols.append(prefix[0])
        attrs = self.attrs.select(*dict.fromkeys(attr_cols))
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, k, filters, prefix,
            must_not_terms, require_all,
        )
        partial = (
            blocks.groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(lambda bl, at: fn(bl, at), schema=_RESULT_SCHEMA)
        )
        return (
            partial.withColumn("score", F.round("score", ROUND_DECIMALS))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
