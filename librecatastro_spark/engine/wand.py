"""Block-max top-k retrieval over the compressed index (capability B14).

Per-shard scorer + global merge — exactly the reference's ES architecture:
5 shards each return local top-k, the coordinator re-ranks (reference:
src/utils/elasticsearch_utils.py:28-30 config; inherent to every
es.search). Here: per-shard ``applyInPandas`` → local top-k → Catalyst
``TakeOrderedAndProject`` global merge.

Scale design:
  * Document lengths travel INSIDE the posting blocks (``dls_enc`` —
    the Lucene-norms analog), so an unfiltered query shuffles only the
    query terms' blocks: cost O(postings of Q terms), independent of
    corpus size. No doc-table join, ever.
  * Keyword/prefix filter queries evaluate the predicate in CATALYST
    first (pushed to the attrs Parquet scan: equality and StartsWith both
    appear as PushedFilters) and cogroup only the surviving
    (shard, doc_id) pairs with the blocks — the scorer never sees a
    non-matching attrs row, so filtered-query shuffle is
    O(matching docs + query-term postings).
  * Block bounds are rescaled by idf_now / idf_build so pruning stays
    safe after incremental appends grow N (see builder.py).

The classic block-max WAND pointer walk is per-document Python — banned
(input_hint). We use a **vectorized two-pass block-max prune** with the
same skipping benefit and provable exactness:

1. θ := k-th best *partial* score from fully scoring the rarest query term
   (a valid lower bound on the final k-th score).
2. Prune any block b of term t with ``bound(b) + Σ_{t'≠t} U_{t'} < θ``
   where U_t is term t's max block bound. For a doc d whose blocks are ALL
   pruned, taking t* = argmax bound over d's terms gives
   score(d) ≤ bound(b_{t*}) + Σ_{t'≠t*} U_{t'} < θ — d can never enter the
   top-k. Every potential top-k doc therefore survives in ≥1 block.
3. TAAT-score surviving blocks (vectorized decode + groupby-sum), then add
   back contributions hiding in pruned blocks whose doc-id range intersects
   a candidate (targeted decode) — candidate scores are exact; final top-k.

Boolean composition (B7): must_not exclusions and constant-score filters
are applied before θ and before top-k. ``require_all`` (AND, scores
summed) disables pruning and filters on matched-term count.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
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
from ..index.codec import decode_varbyte, delta_decode

_RESULT_SCHEMA = "doc_id long, score double"


def _prefix_successor(p: str) -> str | None:
    """Smallest string ordering strictly above EVERY string with prefix p
    (codepoint-lexicographic, matching Parquet min/max stats on UTF-8):
    increment the last incrementable codepoint, dropping any trailing
    U+10FFFF chars; None when p is all-U+10FFFF (no finite upper bound).
    Skips the surrogate range, which cannot appear in valid UTF-8."""
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i]) + 1
        if 0xD800 <= c <= 0xDFFF:
            c = 0xE000
        if c <= 0x10FFFF:
            return p[:i] + chr(c)
    return None


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
    )


def _shard_topk_fn(
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    filtered: bool,
    must_not_terms: list[str],
    require_all: bool,
    should_terms: list[str] | None = None,
):
    """Per-shard scorer factory. ``fn(blocks)`` for the blocks-only fast
    path; ``fn(blocks, allowed_docs)`` for filtered queries, where
    ``allowed_docs`` holds ONLY the doc_ids that already survived the
    keyword/prefix predicates — the predicates themselves are evaluated
    upstream (Catalyst with Parquet pushdown on the distributed path,
    pyarrow scan filters on the coordinator path), never in pandas here.
    All numpy/pandas batch ops — no per-row Python."""

    def fn(blocks: pd.DataFrame, attrs: pd.DataFrame | None = None) -> pd.DataFrame:
        if len(blocks) == 0:
            return _empty()
        allowed = None
        if filtered:
            if attrs is None or len(attrs) == 0:
                return _empty()
            allowed = np.sort(attrs["doc_id"].to_numpy(dtype=np.int64))
        excluded = None
        if must_not_terms:
            nb = blocks[blocks["term"].isin(must_not_terms)]
            if len(nb):
                nc = nb["n_docs"].to_numpy(dtype=np.int64)
                ns = np.zeros(len(nc), dtype=np.int64)
                ns[1:] = np.cumsum(nc)[:-1]
                nd = decode_varbyte(b"".join(nb["docs_enc"])).astype(np.int64)
                ncum = np.cumsum(nd)
                excluded = np.unique(
                    ncum - np.repeat(ncum[ns] - nd[ns], nc)
                )
        score_terms = terms + [t for t in (should_terms or []) if t not in terms]
        qb = blocks[blocks["term"].isin(score_terms)]
        if len(qb) == 0:
            return _empty()

        def ok_mask(ids: np.ndarray) -> np.ndarray:
            m = np.ones(len(ids), dtype=bool)
            if allowed is not None:
                m &= np.isin(ids, allowed)
            if excluded is not None:
                m &= ~np.isin(ids, excluded)
            return m

        def score_block_rows(rows: pd.DataFrame):
            """Decode + BM25-weight every posting of the given block rows in
            BULK: varbyte is self-delimiting, so the concatenation of many
            blocks' buffers decodes in ONE numpy pass; per-block delta
            resets are undone with a cumsum-minus-base trick. Replaces a
            per-block decode loop that cost ~0.25 ms × thousands of blocks
            per query."""
            if len(rows) == 0:
                e = np.empty(0)
                return e.astype(np.int64), e, e.astype(np.int64)
            counts = rows["n_docs"].to_numpy(dtype=np.int64)
            starts = np.zeros(len(counts), dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            d = decode_varbyte(b"".join(rows["docs_enc"])).astype(np.int64)
            # per-block absolute ids: cumsum of deltas minus the running
            # total just before each block start (first delta is absolute)
            c = np.cumsum(d)
            base = c[starts] - d[starts]
            ids = c - np.repeat(base, counts)
            tfs = decode_varbyte(b"".join(rows["tfs_enc"])).astype(np.float64)
            dls = decode_varbyte(b"".join(rows["dls_enc"])).astype(np.float64)
            idf_b = rows["term"].map(idfs).to_numpy(dtype=np.float64)
            idf = np.repeat(idf_b, counts)
            w = idf * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
            th_b = np.fromiter(
                (hash(t) for t in rows["term"]), dtype=np.int64, count=len(rows)
            )
            return ids, w, np.repeat(th_b, counts)

        # rescale stored bounds to current idf (appends grow N; builder.py)
        qb = qb.assign(
            bound=qb["block_max_w"].to_numpy()
            * qb["term"].map(idfs).to_numpy()
            / np.maximum(qb["idf_build"].to_numpy(), 1e-12)
        )
        if require_all or should_terms:
            # matched-must-term counting constrains the result (AND
            # semantics / should boosts), so block-max pruning by score
            # bound doesn't apply — but INTERSECTION-AWARE pruning does:
            # every qualifying doc must occur in the seed terms' postings
            # (the rarest must term under AND; all must terms otherwise),
            # so any other block whose doc-id range contains no seed
            # candidate can be skipped before decode, and decoded postings
            # of non-candidates dropped before the aggregation. Exact:
            # a doc absent from the seed postings can never satisfy
            # n_matched == len(terms) (AND) / n_matched >= 1 (should), and
            # a candidate's postings all live in range-intersecting blocks.
            if require_all and len(qb):
                rare = max(terms, key=lambda t: idfs[t])
                seed_mask = qb["term"] == rare
            else:
                seed_mask = qb["term"].isin(terms)
            seed_rows, other = qb[seed_mask], qb[~seed_mask]
            s_ids, s_w, s_th = score_block_rows(seed_rows)
            cand = np.unique(s_ids)
            pos_lo = np.searchsorted(
                cand, other["first_doc_id"].to_numpy(dtype=np.int64), side="left"
            )
            pos_hi = np.searchsorted(
                cand, other["last_doc_id"].to_numpy(dtype=np.int64), side="right"
            )
            o_ids, o_w, o_th = score_block_rows(other[pos_hi > pos_lo])
            sel = np.isin(o_ids, cand)
            ids = np.concatenate([s_ids, o_ids[sel]])
            w = np.concatenate([s_w, o_w[sel]])
            th = np.concatenate([s_th, o_th[sel]])
            must_hashes = {hash(t) for t in terms}
            dfagg = pd.DataFrame({"doc_id": ids, "w": w, "t": th})
            # one posting row per (doc, term) ⇒ sum of the must indicator ==
            # number of distinct must terms matched
            dfagg["m"] = dfagg["t"].isin(must_hashes)
            agg = dfagg.groupby("doc_id").agg(score=("w", "sum"), n=("m", "sum"))
            agg = agg[agg["n"] == len(set(terms))] if require_all else agg[agg["n"] >= 1]
            cand_ids = agg.index.to_numpy(dtype=np.int64)
            keep = ok_mask(cand_ids)
            out = pd.DataFrame(
                {"doc_id": cand_ids[keep], "score": agg["score"].to_numpy()[keep]}
            )
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
                cand = np.sort(scores.index.to_numpy(dtype=np.int64))
                lo = pruned["first_doc_id"].to_numpy(dtype=np.int64)
                hi = pruned["last_doc_id"].to_numpy(dtype=np.int64)
                # a pruned block matters only if its id range holds a candidate
                pos_lo = np.searchsorted(cand, lo, side="left")
                pos_hi = np.searchsorted(cand, hi, side="right")
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

    # term dictionaries below this size live in coordinator (driver) memory
    # — the ES analog: every shard keeps its Lucene term dictionary resident.
    # Above it, lookups fall back to a cached Spark scan.
    _LOCAL_TERMSTATS_BYTES = 256 * 1024 * 1024

    def __init__(self, spark: SparkSession, out_dir: str, tune_for_queries: bool = True):
        self.spark = spark
        self.out_dir = out_dir
        if tune_for_queries:
            # AQE's per-shuffle re-optimization rounds cost ~2× scheduling
            # latency on small interactive query jobs (measured ~950→520 ms
            # at 30k docs) and buys nothing there — the query shuffle is a
            # fixed n_shards-way partial top-k. The override can't be scoped
            # per-query (execution of the returned DataFrame is lazy), so it
            # is session-wide; build_index/append_batch protect themselves
            # by forcing AQE on for their own duration, and
            # tune_for_queries=False leaves the session untouched.
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.refresh()

    def refresh(self) -> None:
        """(Re)load meta, term stats and dataset listings. An open index
        SNAPSHOTS these for query latency (the ES analog: a shard's term
        dictionary is resident); after ``append_batch`` rewrites
        term_stats/meta/postings, call ``refresh()`` (or reopen) so
        queries see the new N/avgdl/df and the appended posting files."""
        spark, out_dir = self.spark, self.out_dir
        self.meta = read_meta(out_dir)
        self.postings = load_postings(spark, out_dir)
        self.attrs = load_attrs(spark, out_dir)
        self.term_stats = load_term_stats(spark, out_dir)
        self._pads_postings = None
        self._pads_attrs = None
        self._df_local: dict[str, int] | None = None
        ts_dir = os.path.join(out_dir, "term_stats")
        try:
            from ..index.builder import stats_delta_dirs

            dirs = stats_delta_dirs(out_dir) or [ts_dir]
            files = [
                os.path.join(d, f)
                for d in dirs
                for f in os.listdir(d)
                if f.endswith(".parquet")
            ]
            size = sum(os.path.getsize(f) for f in files)
            if size <= self._LOCAL_TERMSTATS_BYTES and files:
                import pyarrow.dataset as pads

                tbl = pads.dataset(files).to_table(columns=["term", "df"])
                if len(dirs) > 1:  # merge stats deltas (post-append)
                    tbl = tbl.group_by("term").aggregate([("df", "sum")])
                    tbl = tbl.rename_columns(["term", "df"])
                self._df_local = dict(
                    zip(
                        tbl.column("term").to_pylist(),
                        tbl.column("df").to_pylist(),
                    )
                )
        except OSError:
            pass
        if self._df_local is None:
            self.term_stats = self.term_stats.cache()

    def _idfs(self, terms: list[str]) -> dict[str, float]:
        n = float(self.meta.n_docs)

        def idf(df: int) -> float:
            return math.log1p((n - df + 0.5) / (df + 0.5))

        if self._df_local is not None:
            return {
                t: idf(self._df_local[t]) for t in terms if t in self._df_local
            }
        rows = self.term_stats.where(F.col("term").isin(terms)).collect()
        return {r["term"]: idf(r["df"]) for r in rows}

    def search(
        self,
        text: str,
        k: int = 10,
        offset: int = 0,
        require_all: bool = False,
        filters: dict[str, str] | None = None,
        prefix: tuple[str, str] | None = None,
        must_not_text: str | None = None,
        should_text: str | None = None,
    ) -> DataFrame:
        terms = sorted(set(analyze_text(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        should_terms = [
            t for t in sorted(set(analyze_text(should_text or ""))) if t not in terms
        ]
        idfs = self._idfs(terms + should_terms)
        terms = [t for t in terms if t in idfs]  # drop zero-df terms
        should_terms = [t for t in should_terms if t in idfs]
        must_not_terms = sorted(set(analyze_text(must_not_text or "")))
        if not terms:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        wanted = terms + should_terms + must_not_terms
        blocks = self.postings.where(F.col("term").isin(wanted))
        local_k = k + offset  # each shard must surface the whole window
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, local_k, bool(filters or prefix),
            must_not_terms, require_all, should_terms,
        )
        if filters or prefix:
            # filter clauses stay in Catalyst: the predicate reaches the
            # attrs Parquet scan (PushedFilters — equality and StartsWith
            # both push down), so the cogroup ships only the SURVIVING
            # (shard, doc_id) pairs into the scorer — O(selectivity ×
            # corpus), not O(corpus), per shard
            cond = F.lit(True)
            for col, val in (filters or {}).items():
                cond = cond & (F.col(col) == F.lit(val))
            if prefix is not None:
                cond = cond & F.col(prefix[0]).startswith(prefix[1])
            allowed = self.attrs.where(cond).select("shard", "doc_id")
            partial = (
                blocks.groupBy("shard")
                .cogroup(allowed.groupBy("shard"))
                .applyInPandas(lambda bl, at: fn(bl, at), schema=_RESULT_SCHEMA)
            )
        else:
            # blocks-only fast path: shuffle is O(query-term postings)
            partial = blocks.groupBy("shard").applyInPandas(
                lambda key, bl: fn(bl), schema=_RESULT_SCHEMA
            )
        ranked = partial.withColumn(
            "score", F.round("score", ROUND_DECIMALS)
        ).orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    def search_local(
        self,
        text: str,
        k: int = 10,
        offset: int = 0,
        require_all: bool = False,
        filters: dict[str, str] | None = None,
        prefix: tuple[str, str] | None = None,
        must_not_text: str | None = None,
        should_text: str | None = None,
    ) -> pd.DataFrame:
        """Coordinator fast path: identical semantics and the SAME numpy
        kernel as ``search`` (rank-identity tested in test_fastpath), but
        the per-shard scorer runs on the driver over pyarrow reads of ONLY
        the query terms' posting blocks — Parquet row-group stats prune the
        term-sorted files, the Lucene term-dictionary-seek analog. This is
        how an interactive query node serves ms-latency queries off the
        same index the cluster built: data read is O(postings of the query
        terms) regardless of corpus size, so a thin coordinator handles it
        at any scale. Use ``search`` (the distributed path) when the
        candidate set itself is cluster-sized (batch scoring, analytics
        joins); this is the ES coordinator+shard-fanout collapsed onto one
        node, exactly the reference's single-ES-box deployment
        (docker-compose.yml:7)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        terms = sorted(set(analyze_text(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        should_terms = [
            t for t in sorted(set(analyze_text(should_text or ""))) if t not in terms
        ]
        idfs = self._idfs(terms + should_terms)
        terms = [t for t in terms if t in idfs]  # drop zero-df terms
        should_terms = [t for t in should_terms if t in idfs]
        must_not_terms = sorted(set(analyze_text(must_not_text or "")))
        if not terms:
            return _empty()
        wanted = terms + should_terms + must_not_terms
        if getattr(self, "_pads_postings", None) is None:
            # dataset discovery (file listing + schema) once per index open
            self._pads_postings = pads.dataset(
                os.path.join(self.out_dir, "postings"), partitioning="hive"
            )
            self._pads_attrs = pads.dataset(
                os.path.join(self.out_dir, "attrs"), partitioning="hive"
            )
        blocks = self._pads_postings.to_table(
            columns=[
                "shard", "term", "n_docs", "docs_enc", "tfs_enc", "dls_enc",
                "block_max_w", "idf_build", "first_doc_id", "last_doc_id",
            ],
            filter=pc.field("term").isin(wanted),
        ).to_pandas()
        attrs = None
        if filters or prefix:
            # predicates pushed into the pyarrow scan (row-group stats +
            # dictionary filtering), and only (shard, doc_id) is
            # materialized — the coordinator never holds the full attrs
            # table, so filtered fast-path memory is O(matching docs)
            expr = None
            for col, val in (filters or {}).items():
                e = pc.field(col) == val
                expr = e if expr is None else expr & e
            if prefix is not None:
                p = prefix[1]
                # range form for row-group/dictionary pruning only: every
                # string with prefix p satisfies p <= s < successor(p)
                # (a strict SUPERSET of the prefix match — e.g. 'src1z'
                # falls in ['src1', 'src2') without starting a longer
                # prefix); the exact starts_with re-check below restores
                # semantics identical to the distributed path's Catalyst
                # StartsWith
                e = pc.field(prefix[0]) >= p
                upper = _prefix_successor(p)
                if upper is not None:
                    e = e & (pc.field(prefix[0]) < upper)
                expr = e if expr is None else expr & e
            cols = ["shard", "doc_id"]
            if prefix is not None:
                cols.append(prefix[0])
            tbl = self._pads_attrs.to_table(columns=cols, filter=expr)
            if prefix is not None:
                tbl = tbl.filter(
                    pc.starts_with(pc.field(prefix[0]), prefix[1])
                ).select(["shard", "doc_id"])
            attrs = tbl.to_pandas()
        local_k = k + offset
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, local_k, bool(filters or prefix),
            must_not_terms, require_all, should_terms,
        )
        # shard scorers run on a thread pool: the kernel is numpy bulk ops
        # (varbyte decode, BM25 math, searchsorted) that release the GIL,
        # so a coordinator with a few cores scores its 16 shards nearly
        # concurrently — same fan-out an ES coordinator gets from its data
        # nodes, collapsed into one process. Result order is immaterial:
        # the final (score desc, doc_id asc) sort is a total order.
        groups = list(blocks.groupby("shard", sort=False))
        if not groups:
            return _empty()

        def run_one(item):
            shard, bl = item
            if filters or prefix:
                return fn(bl, attrs[attrs["shard"] == shard])
            return fn(bl)

        if len(groups) > 1:
            from concurrent.futures import ThreadPoolExecutor

            n_workers = min(
                len(groups), int(os.environ.get("LC_FASTPATH_THREADS", "8"))
            )
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                parts = list(ex.map(run_one, groups))
        else:
            parts = [run_one(groups[0])]
        out = pd.concat(parts, ignore_index=True)
        out["score"] = out["score"].round(ROUND_DECIMALS)
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).iloc[offset : offset + k]
        return out.reset_index(drop=True)

    def term_prefix_search(self, prefix: str, k: int = 10) -> DataFrame:
        """B5 prefix query as a term-dictionary RANGE scan: the predicate
        ``term >= p AND term < p + U+10FFFF`` reaches the Parquet scan as
        min/max row-group pruning (postings are written sorted by term, so
        non-matching row groups are skipped — the Lucene term-dictionary
        seek analog). Constant-score 1.0, deterministic doc_id order."""
        # [prefix, successor(prefix)) is EXACTLY the startswith set under
        # codepoint-lexicographic comparison (Spark's UTF8String order),
        # with both endpoints plain literals the Parquet scan prunes on
        hi = _prefix_successor(prefix)
        cond = F.col("term") >= prefix
        if hi is not None:
            cond = cond & (F.col("term") < hi)
        blocks = self.postings.where(cond)

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            parts = [delta_decode(decode_varbyte(e)) for e in pdf["docs_enc"]]
            ids = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
            return pd.DataFrame(
                {"doc_id": ids[:k].astype(np.int64), "score": 1.0}
            )

        partial = blocks.groupBy("shard").applyInPandas(
            lambda key, b: fn(b), schema=_RESULT_SCHEMA
        )
        return partial.orderBy(F.asc("doc_id")).limit(k)
