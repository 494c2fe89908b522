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
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import Analyzer, tokenize_expr
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


def _lev_within(a: str, b: str, max_edits: int) -> bool:
    """Classic Levenshtein distance(a, b) <= max_edits — full DP with a
    per-row early exit (once every cell of a row exceeds the bound no
    path can come back under it). Same metric as F.levenshtein/DuckDB
    levenshtein, so the coordinator fuzzy expansion matches the
    distributed one term-for-term. Tokens are short (analyzer-bounded),
    so the O(len a × len b) row loop is ns-scale per candidate."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_edits:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        best = i
        for j in range(1, lb + 1):
            v = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
            cur[j] = v
            if v < best:
                best = v
        if best > max_edits:
            return False
        prev = cur
    return prev[lb] <= max_edits


def _impact(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """Idf-independent BM25 factor per posting: score = idf * impact.
    Factored out so the decoded-postings cache can precompute it once per
    index generation and every scoring path multiplies by the SAME float
    values — cached and uncached results stay bit-identical."""
    return tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))


def _shard_topk_fn(
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    filtered: bool,
    must_not_terms: list[str],
    require_all: bool,
    should_terms: list[str] | None = None,
    decoder=None,
    dense_hint: int = 0,
    cursor: tuple[float, int] | None = None,
    min_match: int | None = None,
):
    """Per-shard scorer factory. ``fn(blocks)`` for the blocks-only fast
    path; ``fn(blocks, allowed_docs)`` for filtered queries, where
    ``allowed_docs`` holds ONLY the doc_ids that already survived the
    keyword/prefix predicates — the predicates themselves are evaluated
    upstream (Catalyst with Parquet pushdown on the distributed path,
    pyarrow scan filters on the coordinator path), never in pandas here.
    All numpy/pandas batch ops — no per-row Python.

    ``decoder`` (coordinator path only) substitutes the inline varbyte
    decode with ``decoder(rows) -> (ids, impact)`` — the same doc ids and
    the same idf-independent BM25 impacts (see ``_impact``) in the same
    posting order, gathered from the index's decoded-postings cache. The
    distributed path always passes None (executors are stateless per
    query), so its results are byte-identical with or without the
    cache."""
    # dense doc-id spaces (the builder assigns shards by id range over
    # n_docs, so ids are 0..N-ish) let per-doc sums run as one
    # np.bincount over a dense array instead of np.unique's O(n log n)
    # sort — same accumulation order (bincount adds in input order), so
    # identical floats. Sparse/foreign id spaces fall back to unique.
    dense_cap = min(4 * dense_hint, 1 << 25) if dense_hint else 0

    def agg_sums(ids: np.ndarray, w: np.ndarray, w2: np.ndarray | None = None):
        """(unique_ids, sum_w[, sum_w2]) grouped by doc id; BM25 weights
        are strictly positive, so a dense bin is occupied iff its sum>0.
        Bins are offset by min(ids), so a per-shard call (distributed
        path — ids span only the shard's contiguous range) allocates
        O(shard span), not O(corpus)."""
        if len(ids) and dense_cap:
            lo = int(ids.min())
            span = int(ids.max()) - lo + 1
            if lo >= 0 and span <= dense_cap:
                off = ids - lo
                acc = np.bincount(off, weights=w, minlength=span)
                nz = np.flatnonzero(acc)
                if w2 is None:
                    return nz + lo, acc[nz]
                acc2 = np.bincount(off, weights=w2, minlength=span)
                return nz + lo, acc[nz], acc2[nz]
        uids, inv = np.unique(ids, return_inverse=True)
        sums = np.bincount(inv, weights=w, minlength=len(uids))
        if w2 is None:
            return uids, sums
        return uids, sums, np.bincount(inv, weights=w2, minlength=len(uids))

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
                if decoder is not None:
                    excluded = np.unique(decoder(nb)[0])
                else:
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

        def score_block_rows(rows: pd.DataFrame, with_th: bool = False):
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
            if decoder is not None:
                # fb is the idf-independent BM25 impact, precomputed once
                # per index generation in the decoded-postings cache
                ids, fb = decoder(rows)
            else:
                starts = np.zeros(len(counts), dtype=np.int64)
                starts[1:] = np.cumsum(counts)[:-1]
                d = decode_varbyte(b"".join(rows["docs_enc"])).astype(np.int64)
                # per-block absolute ids: cumsum of deltas minus the
                # running total just before each block start (first delta
                # is absolute)
                c = np.cumsum(d)
                base = c[starts] - d[starts]
                ids = c - np.repeat(base, counts)
                tfs = decode_varbyte(b"".join(rows["tfs_enc"])).astype(np.float64)
                dls = decode_varbyte(b"".join(rows["dls_enc"])).astype(np.float64)
                # same factoring as _impact (idf * fb), so cached and
                # uncached paths produce bit-identical floats
                fb = _impact(tfs, dls, avgdl)
            idf_b = rows["term"].map(idfs).to_numpy(dtype=np.float64)
            w = np.repeat(idf_b, counts) * fb
            if not with_th:
                return ids, w, None
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
        if require_all or should_terms or (min_match and min_match > 1):
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
            s_ids, s_w, s_th = score_block_rows(seed_rows, with_th=True)
            cand = np.unique(s_ids)
            pos_lo = np.searchsorted(
                cand, other["first_doc_id"].to_numpy(dtype=np.int64), side="left"
            )
            pos_hi = np.searchsorted(
                cand, other["last_doc_id"].to_numpy(dtype=np.int64), side="right"
            )
            o_ids, o_w, o_th = score_block_rows(
                other[pos_hi > pos_lo], with_th=True
            )
            sel = np.isin(o_ids, cand)
            ids = np.concatenate([s_ids, o_ids[sel]])
            w = np.concatenate([s_w, o_w[sel]])
            th = np.concatenate([s_th, o_th[sel]])
            must_hashes = np.fromiter(
                (hash(t) for t in set(terms)), dtype=np.int64
            )
            # numpy aggregation instead of a pandas groupby: same sums, no
            # factorize/lexsort machinery. One posting row per (doc, term)
            # ⇒ the must-indicator sum == number of distinct must terms
            # matched.
            is_must = np.isin(th, must_hashes)
            uids, score, n = agg_sums(ids, w, is_must.astype(np.float64))
            # require_all ⇒ need every distinct must term; min_match ⇒ ES
            # minimum_should_match (n can never exceed the distinct-term
            # count, so >= expresses both)
            need = len(set(terms)) if require_all else (min_match or 1)
            good = n >= need
            cand_ids = uids[good]
            keep = ok_mask(cand_ids)
            out_ids, out_scores = cand_ids[keep], score[good][keep]
        else:
            # ---- pass 1: θ from the rarest term, then block prune --------
            u_per_term = qb.groupby("term")["bound"].max()
            theta = -math.inf
            rare = u_per_term.index[np.argmax([idfs[t] for t in u_per_term.index])]
            r_ids, r_w, _ = score_block_rows(qb[qb["term"] == rare])
            if len(r_ids) and cursor is None:
                # a search_after cursor excludes the head of the ranking,
                # so the k-th best single-term weight is NOT a lower bound
                # on the k-th QUALIFYING total — block-max pruning is
                # disabled for cursor queries (cost stays O(query-term
                # postings), the same bill the AND branch always pays, and
                # crucially independent of page depth — unlike offset,
                # whose per-shard window is k+offset)
                km = ok_mask(r_ids)
                r_w = r_w[km]
                if len(r_w) >= k:
                    theta = float(np.partition(r_w, -k)[-k])
            sum_u = float(u_per_term.sum())
            others = sum_u - qb["term"].map(u_per_term).to_numpy()
            # prune with one rounding quantum of slack: a doc whose raw
            # upper bound is below θ − 10^-R has ROUNDED score strictly
            # below the rounded k-th result, so pruning is exact under the
            # rounded total order the merge uses — per-shard and
            # whole-index passes (whose θ differ) then agree even when a
            # raw score straddles θ within rounding distance.
            margin = 10.0 ** (-ROUND_DECIMALS)
            survive = (qb["bound"].to_numpy() + others) >= theta - margin
            kept, pruned = qb[survive], qb[~survive]
            # canonical per-doc accumulation order: a doc has at most ONE
            # posting per term (salt sub-ranges are disjoint), so decoding
            # block rows in lexicographic term order makes every doc's
            # float sum associate over its terms identically on EVERY
            # path. The per-shard and whole-index passes prune with
            # different θ — without a canonical order, a doc whose
            # kept/pruned split differs between the two would sum in a
            # different order, drift by an ulp, and could flip a
            # ROUND_DECIMALS rounding boundary that the rank-identity
            # asserts (bench.py, tests/test_fastpath.py) compare at.
            kept = kept.sort_values(["term", "first_doc_id"], kind="stable")
            ids, w, _ = score_block_rows(kept)
            m = ok_mask(ids)
            # numpy aggregation (see the AND branch) — unique ids come
            # back sorted, so the pruned-block patch below can merge by
            # searchsorted instead of a pandas aligned add
            uids, sums = agg_sums(ids[m], w[m])
            if len(pruned) and len(uids):
                lo = pruned["first_doc_id"].to_numpy(dtype=np.int64)
                hi = pruned["last_doc_id"].to_numpy(dtype=np.int64)
                # a pruned block matters only if its id range holds a candidate
                pos_lo = np.searchsorted(uids, lo, side="left")
                pos_hi = np.searchsorted(uids, hi, side="right")
                need = pos_hi > pos_lo
                if need.any():
                    p_rows = pruned[need].sort_values(
                        ["term", "first_doc_id"], kind="stable"
                    )
                    p_ids, p_w, _ = score_block_rows(p_rows)
                    sel = np.isin(p_ids, uids)
                    if sel.any():
                        # recompute each patched doc's sum FROM SCRATCH in
                        # the same canonical term order the kept-only sums
                        # used — adding the patch on top of the kept
                        # partial (`sums += adds`) would associate the
                        # floats by the θ-dependent kept/pruned split,
                        # which differs between passes (see above). A
                        # patched doc's full posting set is always
                        # kept ∪ this patch: any pruned block holding a
                        # candidate is in `need` by the range test.
                        patched = np.unique(p_ids[sel])
                        tcode = {
                            t: i
                            for i, t in enumerate(sorted(set(score_terms)))
                        }
                        k_tk = np.repeat(
                            kept["term"].map(tcode).to_numpy(dtype=np.int64),
                            kept["n_docs"].to_numpy(dtype=np.int64),
                        )
                        p_tk = np.repeat(
                            p_rows["term"].map(tcode).to_numpy(dtype=np.int64),
                            p_rows["n_docs"].to_numpy(dtype=np.int64),
                        )
                        mk = np.isin(ids, patched)
                        cat_ids = np.concatenate([ids[mk], p_ids[sel]])
                        cat_w = np.concatenate([w[mk], p_w[sel]])
                        cat_tk = np.concatenate([k_tk[mk], p_tk[sel]])
                        order = np.lexsort((cat_tk, cat_ids))
                        r_uids, r_sums = agg_sums(cat_ids[order], cat_w[order])
                        # every r_uid is in uids by the sel mask above
                        sums[np.searchsorted(uids, r_uids)] = r_sums
            out_ids, out_scores = uids, sums
        # rank on the ROUNDED score — the same total order the global
        # merge uses (search: F.round then orderBy; search_local: round
        # then sort). Cutting on raw floats here while merging on rounded
        # ones upstream would let a raw-score boundary disagree with a
        # rounded tie, making per-shard and whole-index passes diverge.
        out_scores = np.round(out_scores, ROUND_DECIMALS)
        if cursor is not None:
            # keyset predicate on the ROUNDED total order the merge uses:
            # strictly after (s0, d0) under (score DESC, doc_id ASC)
            s0, d0 = cursor
            after = (out_scores < s0) | ((out_scores == s0) & (out_ids > d0))
            out_ids, out_scores = out_ids[after], out_scores[after]
        if len(out_ids) > k:
            # top-k by (score desc, doc_id asc): lexsort's last key is
            # primary; doc_id (already the unique-sorted minor order)
            # breaks ties ascending
            order = np.lexsort((out_ids, -out_scores))[:k]
            out_ids, out_scores = out_ids[order], out_scores[order]
        return pd.DataFrame(
            {
                "doc_id": out_ids.astype(np.int64, copy=False),
                "score": out_scores.astype(np.float64, copy=False),
            }
        )

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
        # query analysis uses the INDEX's analyzer (meta.analyzer_re, the
        # ES per-field analyzer hook) — ES match semantics: the query text
        # is analyzed with the field's analyzer, so a custom-analyzer
        # index can never silently mismatch its own postings. The
        # verify-first phrase paths derive their source-verify regex's
        # token boundaries from the SAME pattern (analyzer_classes), so
        # they agree with the index's tokenization too; an analyzer
        # outside the derivable '[^X]+' shape makes them raise with a
        # pointer to the positional (index-only) paths.
        self._analyze = Analyzer(
            getattr(self.meta, "analyzer_re", None),
            stopwords=frozenset(getattr(self.meta, "stopwords", None) or ()),
            synonyms=getattr(self.meta, "synonyms", None),
        ).analyze
        self.postings = load_postings(spark, out_dir)
        self.attrs = load_attrs(spark, out_dir)
        self.term_stats = load_term_stats(spark, out_dir)
        self._pads_attrs = None
        self._seek_handles = None
        self._dec_cache = None
        self._dec_cache_bytes = 0
        self._df_local: dict[str, int] | None = None
        self._cf_local: dict[str, int] | None = None
        try:
            from ..index.builder import term_stats_sources

            srcs, merge = term_stats_sources(out_dir)
            files = [
                os.path.join(s, f)
                for s in srcs
                if os.path.isdir(s)
                for f in os.listdir(s)
                if f.endswith(".parquet")
            ] + [s for s in srcs if not os.path.isdir(s)]
            size = sum(os.path.getsize(f) for f in files)
            if size <= self._LOCAL_TERMSTATS_BYTES and files:
                import pyarrow.dataset as pads

                tbl = pads.dataset(files).to_table(
                    columns=["term", "df", "cf"]
                )
                if merge:  # stats deltas present (post-append)
                    tbl = tbl.group_by("term").aggregate(
                        [("df", "sum"), ("cf", "sum")]
                    )
                    tbl = tbl.rename_columns(["term", "df", "cf"])
                terms_l = tbl.column("term").to_pylist()
                self._df_local = dict(zip(terms_l, tbl.column("df").to_pylist()))
                # cf (total occurrences) powers the phrase twins' decode-
                # volume routing — same snapshot, one extra column
                self._cf_local = dict(zip(terms_l, tbl.column("cf").to_pylist()))
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
        search_after: tuple[float, int] | None = None,
        ranges: dict[str, tuple] | None = None,
        min_match: int | None = None,
        exists_cols: list[str] | None = None,
        ids: list[int] | None = None,
        geo: tuple | None = None,
    ) -> DataFrame:
        """Top-k BM25 (doc_id, score), score DESC / doc_id ASC.

        ``exists_cols`` is the ES exists query (attr non-null);
        ``ids`` the ES ids query (doc-id In list) — both evaluated in
        Catalyst beside the other filters, pushed to the attrs scan
        (IsNotNull / In reach Parquet row-group pruning).

        ``geo`` is the ES geo_distance query over geo_point attr columns
        — (lon_col, lat_col, lon0, lat0, radius_m) — OR the ES
        geo_polygon query — (lon_col, lat_col, [(lon, lat), …]), the
        reference's flagship geo predicate (geo_polygon.py:36-54). Both
        compile through the shared ops.geo.geo_clause_cond: a
        scan-pushable bbox prune (radius-derived or vertex bbox) ANDed
        with the exact test (Catalyst haversine / Arrow ray cast on the
        bbox survivors), evaluated beside the other filter clauses so
        the scorer cogroup ships only surviving (shard, doc_id) pairs.

        ``min_match`` is ES ``minimum_should_match`` on a match query: a
        doc qualifies only if it matches at least that many DISTINCT
        analyzed query terms (1 = the default OR; len(terms) ≡
        require_all). Query terms absent from the index can never be
        matched, so a min_match above the indexed-term count returns
        empty — the ES behavior.

        ``ranges`` is the ES range query over keyword/numeric attr
        columns: {col: (lo, hi)}, bounds inclusive, either side None for
        open-ended — evaluated in Catalyst like the equality filters, so
        the comparison reaches the attrs Parquet scan as PushedFilters
        (GreaterThanOrEqual/LessThanOrEqual row-group pruning).

        Pagination, two forms (ES ``from`` vs ``search_after``):
        ``offset`` makes every shard surface the whole k+offset window —
        O(offset) per shard, fine for page 2, wrong for page 10 000.
        ``search_after=(score, doc_id)`` of the last hit keysets instead:
        each shard filters on the rounded (score, doc_id) tuple and
        returns only its local top-k AFTER the cursor, so shuffle and
        merge stay O(shards × k) at ANY page depth — the ES search_after
        scale story, reproduced on the same rounded total order both
        engines rank by (mutually exclusive with ``offset``)."""
        if search_after is not None and offset:
            raise ValueError("offset and search_after are mutually exclusive")
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        should_terms = [
            t for t in sorted(set(self._analyze(should_text or ""))) if t not in terms
        ]
        idfs = self._idfs(terms + should_terms)
        terms = [t for t in terms if t in idfs]  # drop zero-df terms
        should_terms = [t for t in should_terms if t in idfs]
        must_not_terms = sorted(set(self._analyze(must_not_text or "")))
        if min_match is not None and (min_match < 1 or require_all):
            raise ValueError("min_match must be >= 1 and not combine with require_all")
        if not terms or (min_match or 1) > len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        wanted = terms + should_terms + must_not_terms
        blocks = self.postings.where(F.col("term").isin(wanted))
        local_k = k + offset  # each shard must surface the whole window
        has_filter = bool(
            filters or prefix or ranges or exists_cols or ids is not None
            or geo is not None
        )
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, local_k,
            has_filter,
            must_not_terms, require_all, should_terms,
            dense_hint=int(self.meta.n_docs), cursor=search_after,
            min_match=min_match,
        )
        if has_filter:
            # filter clauses stay in Catalyst: the predicate reaches the
            # attrs Parquet scan (PushedFilters — equality and StartsWith
            # both push down), so the cogroup ships only the SURVIVING
            # (shard, doc_id) pairs into the scorer — O(selectivity ×
            # corpus), not O(corpus), per shard
            cond = F.lit(True)
            for col, val in (filters or {}).items():
                # list/tuple/set value = ES `terms` query: col IN (…) —
                # pushed to the attrs scan as an In filter
                if isinstance(val, (list, tuple, set)):
                    cond = cond & F.col(col).isin(*sorted(val))
                else:
                    cond = cond & (F.col(col) == F.lit(val))
            if prefix is not None:
                cond = cond & F.col(prefix[0]).startswith(prefix[1])
            for col, (lo, hi) in (ranges or {}).items():
                if lo is not None:
                    cond = cond & (F.col(col) >= F.lit(lo))
                if hi is not None:
                    cond = cond & (F.col(col) <= F.lit(hi))
            for col in exists_cols or []:
                cond = cond & F.col(col).isNotNull()
            if ids is not None:
                cond = cond & F.col("doc_id").isin([int(i) for i in ids])
            if geo is not None:
                from ..ops.geo import geo_clause_cond

                cond = cond & geo_clause_cond(geo)
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
        )
        if search_after is not None:
            # the shards already filtered; restating the predicate in
            # Catalyst keeps the plan self-describing and the merge exact
            # even if a custom fn variant ever skips the cursor
            s0, d0 = search_after
            ranked = ranked.where(
                (F.col("score") < F.lit(s0))
                | ((F.col("score") == F.lit(s0)) & (F.col("doc_id") > F.lit(d0)))
            )
        ranked = ranked.orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    def match_phrase(
        self,
        text: str,
        source: DataFrame,
        k: int = 10,
        offset: int = 0,
        source_id_col: str = "doc_id",
        source_text_col: str = "content",
        slop: int = 0,
    ) -> DataFrame:
        """ES match_phrase analog (B6 extension) over the compressed
        index — verify-first, no positional postings. ``slop`` admits up
        to that many intervening tokens PER GAP between consecutive
        phrase terms, in order (analyzer._phrase_body documents the
        deliberate divergence from ES's total-edit-distance slop); the
        verify regex, the exact engine, and the DuckDB twin all share
        the one pattern, so the semantics are identical on every path.

        1. **Verify on source**: the contiguous-sequence predicate
           (analyzer.phrase_match_udf — one Arrow-batched CPython-regex
           pass; ~6x the JVM RLIKE, ~80x the split/array_join Catalyst
           form on this pattern, measured) IS the exact phrase
           membership test,
           so it runs directly against the source table and yields the
           true phrase doc set, not a candidate superset. The scan is
           pruned to the doc-id window where all phrase terms coexist —
           [max over terms of min(first_doc_id), min over terms of
           max(last_doc_id)], read from posting-block METADATA with one
           vocab-bounded collect (no posting decode) — pushed as a
           BETWEEN so Parquet/Iceberg row-group stats skip the rest.
        2. **Score verified docs through the index**: the verified ids
           join attrs (the authoritative doc->shard map — shard ranges
           shift across appends, so no arithmetic shortcut) and feed the
           FILTERED shard scorer exactly like a keyword-filtered query,
           with the top-k cut ENABLED — shuffle O(shards x (k+offset)).

        An earlier shape scored the full AND match set uncut and joined
        it to the verified rows; on a stop-word phrase that materialized
        (and cached) a corpus-sized intermediate just to throw away all
        but k rows. Verify-first keeps every intermediate O(phrase
        matches) and the merge O(k) — measured 5.5 s -> sub-second on
        the hot-bigram bench query at 60 k docs.

        Scoring = BM25 sum over the phrase's distinct terms (the
        require_all score), rank (score DESC, doc_id ASC) — identical to
        ExactBM25.match_phrase (rank-identity-tested) and twinned in the
        DuckDB oracle. ES's phrase-frequency scoring is intentionally not
        reproduced (documented divergence).
        """
        seq = self._analyze(text)
        if not seq:
            raise ValueError("phrase analyzes to zero terms")
        if getattr(self.meta, "stopwords", None):
            raise ValueError(
                "match_phrase on a stopword-analyzer index needs the "
                "positional path (match_phrase_positional / _local) — a "
                "source regex cannot express adjacency after stopword "
                "removal"
            )
        from ..analyzer import phrase_match_udf

        terms = sorted(set(seq))
        idfs = self._idfs(terms)
        if len(idfs) < len(terms):
            # a phrase term absent from the corpus -> no document can match
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = self.postings.where(F.col("term").isin(terms))
        # doc-id window where every phrase term has postings (block
        # metadata only — no decode; vocab-bounded collect)
        spans = blocks.groupBy("term").agg(
            F.min("first_doc_id").alias("lo"), F.max("last_doc_id").alias("hi")
        ).collect()
        if len(spans) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        lo = max(int(r["lo"]) for r in spans)
        hi = min(int(r["hi"]) for r in spans)
        if lo > hi:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        # the window also prunes the postings scan itself: blocks wholly
        # outside [lo, hi] can hold no phrase doc (min/max columns are in
        # the Parquet footer stats, so this prunes row groups too)
        blocks = blocks.where(
            (F.col("last_doc_id") >= lo) & (F.col("first_doc_id") <= hi)
        )
        verified = (
            source.select(
                F.col(source_id_col).alias("doc_id"),
                F.col(source_text_col).alias("_text"),
            )
            .where(F.col("doc_id").between(lo, hi))
            .where(
                phrase_match_udf(
                    seq, slop,
                    split_re=getattr(self.meta, "analyzer_re", None),
                    synonyms=getattr(self.meta, "synonyms", None),
                )(F.col("_text"))
            )
            .select("doc_id")
        )
        allowed = self.attrs.select("shard", "doc_id").where(
            F.col("doc_id").between(lo, hi)
        ).join(verified, "doc_id")
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, k + offset, filtered=True,
            must_not_terms=[], require_all=True,
            dense_hint=int(self.meta.n_docs),
        )
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(lambda bl, at: fn(bl, at), schema=_RESULT_SCHEMA)
        )
        ranked = partial.withColumn(
            "score", F.round("score", ROUND_DECIMALS)
        ).orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    def match_phrase_prefix(
        self,
        text: str,
        source: DataFrame,
        k: int = 10,
        offset: int = 0,
        source_id_col: str = "doc_id",
        source_text_col: str = "content",
    ) -> DataFrame:
        """ES match_phrase_prefix analog ("type-ahead phrase") over the
        compressed index — verify-first like ``match_phrase``: the
        complete terms must appear adjacent in order, immediately
        followed by a token STARTING WITH the last analyzed token.

        Scoring contract matches ExactBM25.match_phrase_prefix: BM25
        require_all over the COMPLETE terms only (the prefix gates
        membership, not score — documented divergence from ES's
        max_expansions-dependent expansion scoring), rank (score DESC,
        doc_id ASC). A single-token query has no complete terms to score
        and routes to ``term_prefix_search`` (constant score 1.0,
        doc_id ASC — the same contract, and the vocab-range scan is the
        cheaper plan for pure type-ahead).

        Plan shape: identical to match_phrase — the doc-id window where
        all COMPLETE terms coexist prunes both the source verify scan
        and the postings scan (block metadata only, one vocab-bounded
        collect); the Arrow CPython-regex verify yields the TRUE match
        set (not a candidate superset); verified ids feed the FILTERED
        shard scorer with the top-k cut enabled — every intermediate
        O(phrase-prefix matches), merge O(shards × (k+offset)).
        """
        seq = self._analyze(text)
        if not seq:
            raise ValueError("phrase analyzes to zero terms")
        if getattr(self.meta, "stopwords", None):
            raise ValueError(
                "match_phrase_prefix on a stopword-analyzer index needs "
                "the positional path (match_phrase_prefix_positional / "
                "_local) — a source regex cannot express adjacency after "
                "stopword removal"
            )
        if getattr(self.meta, "synonyms", None):
            raise ValueError(
                "match_phrase_prefix on a synonym-analyzer index needs "
                "the positional path (match_phrase_prefix_positional / "
                "_local) — the prefix expands over CANONICAL dictionary "
                "terms, whose surface preimages a source regex cannot "
                "enumerate"
            )
        from ..analyzer import phrase_prefix_match_udf

        complete, pfx = seq[:-1], seq[-1]
        if not complete:
            return self.term_prefix_search(pfx, k=k, offset=offset)
        terms = sorted(set(complete))
        idfs = self._idfs(terms)
        if len(idfs) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = self.postings.where(F.col("term").isin(terms))
        spans = blocks.groupBy("term").agg(
            F.min("first_doc_id").alias("lo"), F.max("last_doc_id").alias("hi")
        ).collect()
        if len(spans) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        lo = max(int(r["lo"]) for r in spans)
        hi = min(int(r["hi"]) for r in spans)
        if lo > hi:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = blocks.where(
            (F.col("last_doc_id") >= lo) & (F.col("first_doc_id") <= hi)
        )
        verified = (
            source.select(
                F.col(source_id_col).alias("doc_id"),
                F.col(source_text_col).alias("_text"),
            )
            .where(F.col("doc_id").between(lo, hi))
            .where(
                phrase_prefix_match_udf(
                    complete, pfx,
                    split_re=getattr(self.meta, "analyzer_re", None),
                )(F.col("_text"))
            )
            .select("doc_id")
        )
        allowed = self.attrs.select("shard", "doc_id").where(
            F.col("doc_id").between(lo, hi)
        ).join(verified, "doc_id")
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, k + offset, filtered=True,
            must_not_terms=[], require_all=True,
            dense_hint=int(self.meta.n_docs),
        )
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(lambda bl, at: fn(bl, at), schema=_RESULT_SCHEMA)
        )
        ranked = partial.withColumn(
            "score", F.round("score", ROUND_DECIMALS)
        ).orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    def match_phrase_positional(
        self,
        text: str,
        k: int = 10,
        offset: int = 0,
        slop: int = 0,
    ) -> DataFrame:
        """ES match_phrase answered ENTIRELY from the index — requires an
        index built with ``index_options="positions"``. Identical
        semantics, scoring contract and rank to ``match_phrase`` (the
        verify-first path; rank-identity-tested), but the source table is
        never touched: phrase membership is decided by position-chain
        intersection over the terms' position streams
        (engine/positions.py), so the query's data volume is O(phrase
        terms' postings) regardless of corpus size — at 100 TB the
        verify-first path's pruned source scan is still corpus-shaped for
        hot phrases, while this path reads exactly what a keyword AND
        reads plus the position bytes. Intersection-aware decode prunes
        hot terms' blocks against the rarest term's candidates before
        any varbyte work.

        Plan: postings scan pruned to the phrase terms (In filter +
        doc-window BETWEEN from block metadata, as match_phrase) →
        per-shard grouped map (verify + BM25 require_all top-k in one
        decode pass) → global rounded (score DESC, doc_id ASC) merge.
        """
        if self.meta.index_options != "positions":
            raise ValueError(
                "match_phrase_positional needs index_options='positions' "
                f"(index has {self.meta.index_options!r}); use match_phrase"
            )
        seq = self._analyze(text)
        if not seq:
            raise ValueError("phrase analyzes to zero terms")
        terms = sorted(set(seq))
        idfs = self._idfs(terms)
        if len(idfs) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = self.postings.where(F.col("term").isin(terms))
        spans = blocks.groupBy("term").agg(
            F.min("first_doc_id").alias("lo"), F.max("last_doc_id").alias("hi")
        ).collect()
        if len(spans) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        lo = max(int(r["lo"]) for r in spans)
        hi = min(int(r["hi"]) for r in spans)
        if lo > hi:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = blocks.where(
            (F.col("last_doc_id") >= lo) & (F.col("first_doc_id") <= hi)
        )
        from .positions import phrase_topk_fn

        fn = phrase_topk_fn(seq, idfs, self.meta.avgdl, k + offset, slop)
        partial = blocks.groupBy("shard").applyInPandas(
            lambda key, bl: fn(bl), schema=_RESULT_SCHEMA
        )
        ranked = partial.withColumn(
            "score", F.round("score", ROUND_DECIMALS)
        ).orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    def match_phrase_prefix_positional(
        self,
        text: str,
        k: int = 10,
        offset: int = 0,
    ) -> DataFrame:
        """ES match_phrase_prefix answered ENTIRELY from the index —
        requires ``index_options="positions"``. Identical semantics,
        scoring contract and rank to ``match_phrase_prefix`` (the
        verify-first path; rank-identity-tested): the complete terms must
        appear adjacent in order with a token starting with the last
        analyzed token at the NEXT position; BM25 require_all over the
        COMPLETE terms only.

        Plan: ONE postings scan covering both roles — In(complete terms)
        OR the [pfx, successor) vocab range (both predicates push to the
        term-sorted Parquet files; the range prunes row groups exactly
        like ``term_prefix_search``), doc-window BETWEEN from the
        complete terms' block metadata → per-shard grouped map
        (positions.phrase_prefix_topk_fn: chain the complete positions,
        then a zero-slop step into the concatenated expansion streams) →
        global rounded merge. Data volume is O(complete-term postings +
        window-pruned expansion postings) at any corpus size — the
        source-table verify scan the type-ahead shape previously paid is
        gone. The expansion is never collected and never scored, so
        there is no max_expansions dependence (verify-first semantics
        preserved exactly). Single-token queries route to
        ``term_prefix_search`` (index-only already, and the cheaper
        plan). Falls back conceptually to ``match_phrase_prefix`` when
        the index lacks positions — callers keep that path for
        position-less indexes."""
        if self.meta.index_options != "positions":
            raise ValueError(
                "match_phrase_prefix_positional needs index_options="
                f"'positions' (index has {self.meta.index_options!r}); "
                "use match_phrase_prefix"
            )
        seq = self._analyze(text)
        if not seq:
            raise ValueError("phrase analyzes to zero terms")
        complete, pfx = seq[:-1], seq[-1]
        if not complete:
            return self.term_prefix_search(pfx, k=k, offset=offset)
        terms = sorted(set(complete))
        idfs = self._idfs(terms)
        if len(idfs) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        cblocks = self.postings.where(F.col("term").isin(terms))
        spans = cblocks.groupBy("term").agg(
            F.min("first_doc_id").alias("lo"), F.max("last_doc_id").alias("hi")
        ).collect()
        if len(spans) < len(terms):
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        lo = max(int(r["lo"]) for r in spans)
        hi = min(int(r["hi"]) for r in spans)
        if lo > hi:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        pfx_hi = _prefix_successor(pfx)
        exp_cond = F.col("term") >= pfx
        if pfx_hi is not None:
            exp_cond = exp_cond & (F.col("term") < pfx_hi)
        blocks = self.postings.where(
            (F.col("term").isin(terms) | exp_cond)
            & (F.col("last_doc_id") >= lo)
            & (F.col("first_doc_id") <= hi)
        )
        from .positions import phrase_prefix_topk_fn

        fn = phrase_prefix_topk_fn(
            complete, pfx, idfs, self.meta.avgdl, k + offset
        )
        partial = blocks.groupBy("shard").applyInPandas(
            lambda key, bl: fn(bl), schema=_RESULT_SCHEMA
        )
        ranked = partial.withColumn(
            "score", F.round("score", ROUND_DECIMALS)
        ).orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    #: routing threshold for the coordinator phrase twins: above this
    #: estimated POSITIONS-DECODE volume the single-core driver kernel
    #: loses to the distributed path, so the twin transparently routes
    #: there and the "serving-latency story" claim holds on hot phrases
    #: too. The estimate is window-share × total occurrences:
    #: (min df / N) × Σ cf — the kernel intersection-prunes every term's
    #: blocks against the rarest term's candidate windows
    #: (engine/positions.py), so it decodes roughly the window's share
    #: of each term's occurrence stream. Neither Σ df (mis-routes the
    #: hot+rare phrase: its rare window skips almost all hot blocks) nor
    #: min df alone (blind to tf — hot code keywords run 75-160
    #: occurrences/doc, so equal candidate counts can differ 100× in
    #: positions decoded) separates the regimes; the product does, by
    #: ~170× on the bench shapes (hot-hot ≈ 4.7M, hot+rare ≈ 27k at the
    #: 20k-doc calibration corpus; measured 1.53 s vs 64 ms local).
    #: Env-overridable (LC_PHRASE_LOCAL_MAX_POSTINGS); results are
    #: identical either way (rank-identity tested), only latency moves.
    _PHRASE_LOCAL_MAX_POSTINGS = 1_000_000

    def _phrase_decode_estimate(self, terms: list[str]) -> int:
        """Estimated positions-decode volume of the local phrase kernel:
        (min df over terms / N) × Σ cf over terms — 0 if any term is
        unindexed (the result is empty and the local path answers
        instantly). O(terms), answered from the resident term-stats
        snapshot when present; one tiny term_stats collect otherwise."""
        if not terms:
            return 0
        if self._df_local is not None and self._cf_local is not None:
            dfs = [self._df_local.get(t, 0) for t in terms]
            cfs = [self._cf_local.get(t, 0) for t in terms]
        else:
            rows = self.term_stats.where(F.col("term").isin(terms)).collect()
            by = {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}
            dfs = [by.get(t, (0, 0))[0] for t in terms]
            cfs = [by.get(t, (0, 0))[1] for t in terms]
        if min(dfs) == 0:
            return 0
        n = max(int(self.meta.n_docs), 1)
        return int(min(dfs) / n * sum(cfs))

    def _phrase_local_cap(self) -> int:
        return int(os.environ.get(
            "LC_PHRASE_LOCAL_MAX_POSTINGS", self._PHRASE_LOCAL_MAX_POSTINGS
        ))

    def match_phrase_local(
        self,
        text: str,
        k: int = 10,
        offset: int = 0,
        slop: int = 0,
    ) -> pd.DataFrame:
        """Coordinator fast path for ``match_phrase_positional`` — the
        same kernel (engine/positions.py) over a term-dictionary-seek
        pyarrow read of the phrase terms' posting+position blocks, run
        once whole-index on the driver (the phrase scorer has no θ
        pruning, so the shard split cannot change results;
        rank-identity with the distributed path is tested). This is the
        serving-latency story for phrase queries: ms-latency off the
        same index, no Spark job, no source scan — and it stays true on
        HOT phrases because the twin routes by estimated positions-
        decode volume ((min df / N) × Σ cf — window share times total
        occurrences, read from the resident term-stats snapshot before
        any data I/O): above ``_PHRASE_LOCAL_MAX_POSTINGS`` it runs the
        distributed kernel instead, which wins there."""
        if self.meta.index_options != "positions":
            raise ValueError(
                "match_phrase_local needs index_options='positions'"
            )
        seq = self._analyze(text)
        if not seq:
            raise ValueError("phrase analyzes to zero terms")
        terms = sorted(set(seq))
        if self._phrase_decode_estimate(terms) > self._phrase_local_cap():
            return self.match_phrase_positional(
                text, k=k, offset=offset, slop=slop
            ).toPandas()
        idfs = self._idfs(terms)
        if len(idfs) < len(terms):
            return _empty()
        blocks = self._seek_blocks(terms, extra_cols=("pos_enc",))
        if len(blocks) == 0:
            return _empty()
        from .positions import phrase_topk_fn

        fn = phrase_topk_fn(seq, idfs, self.meta.avgdl, k + offset, slop)
        out = fn(blocks)
        out["score"] = out["score"].round(ROUND_DECIMALS)
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).iloc[offset : offset + k]
        return out.reset_index(drop=True)

    def match_phrase_prefix_local(
        self,
        text: str,
        k: int = 10,
        offset: int = 0,
    ) -> pd.DataFrame:
        """Coordinator fast path for ``match_phrase_prefix_positional`` —
        the same kernel (positions.phrase_prefix_topk_fn) over a
        term-dictionary-seek pyarrow read of the complete terms' AND the
        [pfx, …) expansion terms' posting+position blocks, run once
        whole-index on the driver (no θ pruning in the phrase kernel, so
        the shard split cannot change results; rank-identity tested).
        The expansion enumerates the RESIDENT term dictionary
        (``_df_local`` — required, like the fuzzy coordinator twin);
        single-token queries fall back to the constant-score local tail.
        This is the type-ahead serving story: ms-latency per keystroke,
        no Spark job, no source scan."""
        if self.meta.index_options != "positions":
            raise ValueError(
                "match_phrase_prefix_local needs index_options='positions'"
            )
        seq = self._analyze(text)
        if not seq:
            raise ValueError("phrase analyzes to zero terms")
        complete, pfx = seq[:-1], seq[-1]
        if self._df_local is None:
            raise ValueError(
                "match_phrase_prefix_local needs the resident term "
                "dictionary; use match_phrase_prefix_positional"
            )
        expansion = [t for t in self._df_local if t.startswith(pfx)]
        if not complete:
            return self._constant_score_local(sorted(expansion), k, offset=offset)
        terms = sorted(set(complete))
        # same decode-volume routing as match_phrase_local: the
        # expansion streams are pruned against the COMPLETE terms'
        # windows, so the rarest complete term's window share bounds
        # the kernel's work
        if self._phrase_decode_estimate(terms) > self._phrase_local_cap():
            return self.match_phrase_prefix_positional(
                text, k=k, offset=offset
            ).toPandas()
        idfs = self._idfs(terms)
        if len(idfs) < len(terms) or not expansion:
            return _empty()
        blocks = self._seek_blocks(
            sorted(set(terms) | set(expansion)), extra_cols=("pos_enc",)
        )
        if len(blocks) == 0:
            return _empty()
        from .positions import phrase_prefix_topk_fn

        fn = phrase_prefix_topk_fn(
            complete, pfx, idfs, self.meta.avgdl, k + offset
        )
        out = fn(blocks)
        out["score"] = out["score"].round(ROUND_DECIMALS)
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).iloc[offset : offset + k]
        return out.reset_index(drop=True)

    _SEEK_COLS = (
        "term", "n_docs", "docs_enc", "tfs_enc", "dls_enc",
        "block_max_w", "idf_build", "first_doc_id", "last_doc_id",
    )

    def _executor(self):
        """Persistent coordinator thread pool, shared by the seek's
        per-file reads and the per-shard scorers. Thread SPAWN on this VM
        costs ~35 ms (the round-2 host memory-wall), so a per-query
        ThreadPoolExecutor added ~0.2 s of pure thread creation to every
        fast-path call; one long-lived pool per open index amortizes it
        to zero. Pool size is read from LC_FASTPATH_THREADS at first use;
        the pool never affects results (test_fastpath_threading_invariant),
        only concurrency."""
        want = int(os.environ.get("LC_FASTPATH_THREADS", "8"))
        ex = getattr(self, "_pool", None)
        if ex is None or self._pool_size != want:
            if ex is not None:
                ex.shutdown(wait=False)
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(max_workers=want)
            self._pool = ex
            self._pool_size = want
        return ex

    def _seek_blocks(
        self, wanted: list[str], extra_cols: tuple[str, ...] = ()
    ) -> pd.DataFrame:
        """Coordinator term-dictionary seek: posting files are term-sorted
        (builder sorts ("shard", "term", ...) into the partitioned write),
        so each file's row-group term min/max forms two ascending lists and
        the row groups that can hold a term are exactly
        [bisect_left(maxs, t), bisect_right(mins, t)). Footers and stats
        are parsed ONCE per index open (the resident Lucene term dictionary
        analog — ~1 ms/file); a query then reads only its own row groups
        via ParquetFile.read_row_groups. Conservative by construction:
        parquet stat truncation only widens [min, max], and a file whose
        stats are missing or out of order (a legacy unsorted index) demotes
        to reading all its row groups — never a missed posting."""
        import bisect

        import pyarrow as pa
        import pyarrow.compute as pc

        if self._seek_handles is None:
            # stats only — no file handle is kept open (an index can have
            # thousands of files; pinning one fd each would exhaust ulimit)
            handles = []
            post_dir = os.path.join(self.out_dir, "postings")
            for entry in sorted(os.listdir(post_dir)):
                if not entry.startswith("shard="):
                    continue
                shard = int(entry.split("=", 1)[1])
                d = os.path.join(post_dir, entry)
                for fname in sorted(os.listdir(d)):
                    if not fname.endswith(".parquet"):
                        continue
                    path = os.path.join(d, fname)
                    pf = pq.ParquetFile(path)
                    try:
                        md = pf.metadata
                        n_rgs = md.num_row_groups
                        mins: list[str] | None = []
                        maxs: list[str] = []
                        if n_rgs:
                            rg0 = md.row_group(0)
                            tcol = next(
                                j
                                for j in range(rg0.num_columns)
                                if rg0.column(j).path_in_schema == "term"
                            )
                            for i in range(n_rgs):
                                s = md.row_group(i).column(tcol).statistics
                                if s is None or not s.has_min_max:
                                    mins = None  # no stats → scan whole file
                                    break
                                mins.append(s.min)
                                maxs.append(s.max)
                    finally:
                        pf.close()
                    if mins is not None and (
                        any(a > b for a, b in zip(mins, mins[1:]))
                        or any(a > b for a, b in zip(maxs, maxs[1:]))
                    ):
                        mins = None  # not term-sorted → scan whole file
                    handles.append((path, n_rgs, shard, mins, maxs))
            self._seek_handles = handles
        value_set = pa.array(sorted(set(wanted)), pa.string())
        cols = list(self._SEEK_COLS) + list(extra_cols)

        def read_one(handle):
            path, n_rgs, shard, mins, maxs = handle
            if mins is None:
                rgs = list(range(n_rgs))
            else:
                rgs = sorted(
                    {
                        i
                        for t in wanted
                        for i in range(
                            bisect.bisect_left(maxs, t),
                            bisect.bisect_right(mins, t),
                        )
                    }
                )
            if not rgs:
                return None
            pf = pq.ParquetFile(path)
            try:
                tbl = pf.read_row_groups(rgs, columns=cols, use_threads=False)
            finally:
                pf.close()
            tbl = tbl.filter(pc.is_in(tbl.column("term"), value_set=value_set))
            if not tbl.num_rows:
                return None
            return tbl.append_column(
                "shard", pa.array(np.full(tbl.num_rows, shard, dtype=np.int32))
            )

        # per-file reads fan out on the persistent pool (arrow IO +
        # decompression release the GIL); use_threads=False inside keeps
        # one decode per task instead of pool-on-pool thrash
        tabs = [
            t
            for t in self._executor().map(read_one, self._seek_handles)
            if t is not None
        ]
        if not tabs:
            return pd.DataFrame(columns=["shard", *cols])
        return pa.concat_tables(tabs).to_pandas()

    def _make_decoder(self, blocks: pd.DataFrame):
        """Decoded-postings cache + row-aligned gather. Returns
        ``decoder(rows) -> (ids, impact)`` emitting postings in exactly
        the order the inline decode would (rows order, block order within
        each row), so scoring is bit-identical with and without the cache.

        The cache is the coordinator analog of Lucene's hot-segment page
        cache: postings are immutable for an index generation (refresh()
        clears it), so a (shard, term)'s varbyte streams decode at most
        once per generation; later queries gather slices. Entries fill
        LAZILY, only when the scorer actually asks for ≥half the term's
        postings — a selective AND that decodes 0.5% of a hot term via
        intersection pruning must NOT pay (or pin) the full decode, so
        small requests decode inline and cache nothing. Blocks are
        located by first_doc_id (unique per (shard, term): salt
        sub-ranges are disjoint and block doc ranges are sorted). LRU by
        bytes, budget LC_POSTING_CACHE_MB (default 512; 0 disables);
        entries touched by the current query are pinned against its own
        eviction, and an entry that alone exceeds the budget is served
        inline rather than cached."""
        from collections import OrderedDict

        if self._dec_cache is None:
            self._dec_cache = OrderedDict()
            self._dec_cache_bytes = 0
        cache = self._dec_cache
        avgdl = self.meta.avgdl
        budget = int(os.environ.get("LC_POSTING_CACHE_MB", "512")) * (1 << 20)
        full_idx = blocks.groupby(["shard", "term"], sort=False).indices
        all_counts = blocks["n_docs"].to_numpy(dtype=np.int64)
        pinned: set = set()

        def raw_decode(sub: pd.DataFrame):
            counts = sub["n_docs"].to_numpy(dtype=np.int64)
            starts = np.zeros(len(counts), dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            d = decode_varbyte(b"".join(sub["docs_enc"])).astype(np.int64)
            c = np.cumsum(d)
            ids = c - np.repeat(c[starts] - d[starts], counts)
            tfs = decode_varbyte(b"".join(sub["tfs_enc"])).astype(np.float64)
            dls = decode_varbyte(b"".join(sub["dls_enc"])).astype(np.float64)
            return starts, ids, _impact(tfs, dls, avgdl)

        def fill(key, gkey) -> tuple | None:
            """Decode the FULL (shard, term) block set into a cache entry;
            an entry that alone exceeds the whole budget is returned for
            this query's use but not cached."""
            sub = blocks.iloc[full_idx[gkey]]
            starts, ids, fb = raw_decode(sub)
            firsts = sub["first_doc_id"].to_numpy(dtype=np.int64)
            order = np.argsort(firsts, kind="stable")
            ent = (firsts[order], starts[order], ids, fb)
            nbytes = ids.nbytes + fb.nbytes + 2 * firsts.nbytes
            if nbytes > budget:
                return ent  # serve from it this query, but don't cache
            while cache and self._dec_cache_bytes + nbytes > budget:
                victim = next((k for k in cache if k not in pinned), None)
                if victim is None:
                    break
                _, old_bytes = cache.pop(victim)
                self._dec_cache_bytes -= old_bytes
            cache[key] = (ent, nbytes)
            self._dec_cache_bytes += nbytes
            return ent

        def decoder(rows: pd.DataFrame):
            fdi = rows["first_doc_id"].to_numpy(dtype=np.int64)
            bcount = rows["n_docs"].to_numpy(dtype=np.int64)
            total = int(bcount.sum())
            out_ids = np.empty(total, dtype=np.int64)
            out_fb = np.empty(total, dtype=np.float64)
            ro = np.zeros(len(bcount), dtype=np.int64)
            ro[1:] = np.cumsum(bcount)[:-1]
            for gkey, m in rows.groupby(
                ["shard", "term"], sort=False
            ).indices.items():
                key = (int(gkey[0]), gkey[1])
                cn = bcount[m]
                tot = int(cn.sum())
                within = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(cn) - cn, cn
                )
                oidx = np.repeat(ro[m], cn) + within
                hit = cache.get(key)
                if hit is not None:
                    cache.move_to_end(key)
                    ent = hit[0]
                else:
                    term_total = int(all_counts[full_idx[gkey]].sum())
                    if 2 * tot < term_total:
                        # small slice of a big term (intersection-pruned
                        # AND, must_not probe): decode inline, keep the
                        # pruning win, don't fault the whole term in
                        _, i_ids, i_fb = raw_decode(rows.iloc[m])
                        out_ids[oidx] = i_ids
                        out_fb[oidx] = i_fb
                        continue
                    ent = fill(key, gkey)
                pinned.add(key)
                firsts, starts, ids, fb = ent
                pos = np.searchsorted(firsts, fdi[m])
                gidx = np.repeat(starts[pos], cn) + within
                out_ids[oidx] = ids[gidx]
                out_fb[oidx] = fb[gidx]
            return out_ids, out_fb

        return decoder

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
        search_after: tuple[float, int] | None = None,
        ranges: dict[str, tuple] | None = None,
        min_match: int | None = None,
        exists_cols: list[str] | None = None,
        ids: list[int] | None = None,
        geo: tuple | None = None,
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

        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        should_terms = [
            t for t in sorted(set(self._analyze(should_text or ""))) if t not in terms
        ]
        idfs = self._idfs(terms + should_terms)
        terms = [t for t in terms if t in idfs]  # drop zero-df terms
        should_terms = [t for t in should_terms if t in idfs]
        must_not_terms = sorted(set(self._analyze(must_not_text or "")))
        if min_match is not None and (min_match < 1 or require_all):
            raise ValueError("min_match must be >= 1 and not combine with require_all")
        if not terms or (min_match or 1) > len(terms):
            return _empty()
        wanted = terms + should_terms + must_not_terms
        if getattr(self, "_pads_attrs", None) is None:
            # dataset discovery (file listing + schema) once per index open
            self._pads_attrs = pads.dataset(
                os.path.join(self.out_dir, "attrs"), partitioning="hive"
            )
        blocks = self._seek_blocks(wanted)
        attrs = None
        has_filter = bool(
            filters or prefix or ranges or exists_cols or ids is not None
            or geo is not None
        )
        if has_filter:
            # predicates pushed into the pyarrow scan (row-group stats +
            # dictionary filtering), and only (shard, doc_id) is
            # materialized — the coordinator never holds the full attrs
            # table, so filtered fast-path memory is O(matching docs)
            expr = None
            for col, val in (filters or {}).items():
                if isinstance(val, (list, tuple, set)):
                    e = pc.field(col).isin(sorted(val))
                else:
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
            for col, (lo, hi) in (ranges or {}).items():
                # same inclusive-range semantics as the Catalyst path;
                # pyarrow pushes both bounds into row-group stats pruning
                if lo is not None:
                    e = pc.field(col) >= lo
                    expr = e if expr is None else expr & e
                if hi is not None:
                    e = pc.field(col) <= hi
                    expr = e if expr is None else expr & e
            for col in exists_cols or []:
                e = ~pc.field(col).is_null()
                expr = e if expr is None else expr & e
            if ids is not None:
                e = pc.field("doc_id").isin([int(i) for i in ids])
                expr = e if expr is None else expr & e
            if geo is not None:
                # the clause's prune box pushed into the pyarrow scan
                # (radius: the shared conservative radius_bbox; polygon:
                # the vertex bbox with strict uppers — byte-identical to
                # the Catalyst path's prune); the exact re-check
                # (haversine / ray cast) runs below on the survivors
                from ..ops.geo import geo_clause_prune_box, parse_geo_clause

                _, g_lon, g_lat, _ = parse_geo_clause(geo)
                lat_lo, lat_hi, lon_lo, lon_hi, strict = (
                    geo_clause_prune_box(geo)
                )
                e = pc.field(g_lat) >= lat_lo
                e = e & (
                    (pc.field(g_lat) < lat_hi) if strict
                    else (pc.field(g_lat) <= lat_hi)
                )
                if lon_lo is not None:
                    e = e & (pc.field(g_lon) >= lon_lo)
                    e = e & (
                        (pc.field(g_lon) < lon_hi) if strict
                        else (pc.field(g_lon) <= lon_hi)
                    )
                expr = e if expr is None else expr & e
            cols = ["shard", "doc_id"]
            if prefix is not None:
                cols.append(prefix[0])
            if geo is not None:
                cols += [c for c in (g_lon, g_lat) if c not in cols]
            tbl = self._pads_attrs.to_table(columns=cols, filter=expr)
            if prefix is not None:
                tbl = tbl.filter(
                    pc.starts_with(pc.field(prefix[0]), prefix[1])
                )
            if geo is not None:
                from ..ops.geo import geo_clause_mask_np

                mask = geo_clause_mask_np(
                    geo,
                    tbl.column(g_lon).to_numpy(zero_copy_only=False),
                    tbl.column(g_lat).to_numpy(zero_copy_only=False),
                )
                import pyarrow as pa

                tbl = tbl.filter(pa.array(mask))
            attrs = tbl.select(["shard", "doc_id"]).to_pandas()
        local_k = k + offset
        decoder = None
        if len(blocks) and int(os.environ.get("LC_POSTING_CACHE_MB", "512")) > 0:
            decoder = self._make_decoder(blocks)
        if search_after is not None and offset:
            raise ValueError("offset and search_after are mutually exclusive")
        fn = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, local_k,
            has_filter,
            must_not_terms, require_all, should_terms, decoder=decoder,
            dense_hint=int(self.meta.n_docs), cursor=search_after,
            min_match=min_match,
        )
        if not len(blocks):
            return _empty()
        # one whole-index numpy pass instead of 16 per-shard passes: shards
        # partition the doc-id space, so a doc's postings all live in one
        # shard, and the scorer accumulates every doc's sum in canonical
        # term order (see _shard_topk_fn) — bit-identical either way, even
        # though this pass prunes with the GLOBAL theta (strictly tighter
        # than any per-shard theta, so the kept/pruned split differs). One
        # pass pays the pandas fixed costs once. The distributed path
        # keeps the per-shard split (that is what parallelizes it across
        # executors); rank-identity between the two is asserted in
        # bench.py and tests/test_fastpath.py.
        if decoder is not None:
            parts = [fn(blocks, attrs) if has_filter else fn(blocks)]
        else:
            # cache disabled: per-shard scoring on the pool (inline decode
            # is the dominant cost and releases the GIL in bulk ufuncs)
            groups = list(blocks.groupby("shard", sort=False))

            def run_one(item):
                shard, bl = item
                if has_filter:
                    return fn(bl, attrs[attrs["shard"] == shard])
                return fn(bl)

            if len(groups) > 1:
                parts = list(self._executor().map(run_one, groups))
            else:
                parts = [run_one(groups[0])]
        out = pd.concat(parts, ignore_index=True)
        out["score"] = out["score"].round(ROUND_DECIMALS)
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).iloc[offset : offset + k]
        return out.reset_index(drop=True)

    def more_like_this(
        self,
        doc_id,
        source: DataFrame,
        k: int = 10,
        max_query_terms: int = 12,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
        source_id_col: str = "doc_id",
        source_text_col: str = "content",
    ) -> DataFrame:
        """ES more_like_this analog over the compressed index.

        1. Point-lookup the source doc's text (pushed equality filter on
           the source table — the A5/A9 shape; ES re-analyzes _source the
           same way) and re-analyze it driver-side (one doc — constant).
        2. Select its characteristic terms with mlt_select_terms (shared
           float-free tf/df rank; df from the term dictionary, resident
           when small, else a vocab-bounded collect).
        3. Run the standard block-max OR match over the selected terms
           with the source doc excluded (ES include=false default).
        """
        row = (
            source.where(F.col(source_id_col) == F.lit(doc_id))
            .select(source_text_col)
            .collect()
        )
        if not row:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        toks = self._analyze(row[0][0])
        want = sorted(set(toks))
        if self._df_local is not None:
            dfs = {t: self._df_local[t] for t in want if t in self._df_local}
        else:
            dfs = {
                r["term"]: r["df"]
                for r in self.term_stats.where(F.col("term").isin(want)).collect()
            }
        from .exact import mlt_select_terms

        sel = mlt_select_terms(
            toks, dfs, max_query_terms, min_term_freq, min_doc_freq
        )
        if not sel:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        # k+1 local window: the excluded source doc can displace at most
        # one row of the global top-k
        res = self.search(" ".join(sel), k=k + 1).where(
            F.col("doc_id") != F.lit(doc_id)
        )
        return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_highlighted(
        self,
        text: str,
        source: DataFrame,
        k: int = 10,
        frag_tokens: int = 5,
        source_id_col: str = "doc_id",
        source_text_col: str = "content",
        **kwargs,
    ) -> DataFrame:
        """ES highlight analog on the production path: block-max top-k,
        then snippets for ONLY the k hit rows of the source table (the
        broadcast semi-join restricts the tokenize to O(k) docs). Frozen
        fragment semantics in engine/highlight.py."""
        from .highlight import highlight_snippets

        hits = self.search(text, k=k, **kwargs)
        terms = sorted(set(self._analyze(text)))
        cand = source.join(
            F.broadcast(
                hits.withColumnRenamed("doc_id", source_id_col).select(source_id_col)
            ),
            source_id_col,
            "left_semi",
        )
        hl = highlight_snippets(
            cand, terms, id_col=source_id_col, text_col=source_text_col,
            frag_tokens=frag_tokens,
            split_re=getattr(self.meta, "analyzer_re", None),
            stopwords=frozenset(getattr(self.meta, "stopwords", None) or ())
            or None,
            synonyms=getattr(self.meta, "synonyms", None),
        )
        return hits.join(hl, "doc_id", "left").select("doc_id", "score", "snippet")

    def _constant_score_docs(
        self, blocks: DataFrame, k: int, offset: int = 0
    ) -> DataFrame:
        """Distinct doc_ids of the given posting blocks, constant score 1.0,
        deterministic doc_id order — the shared tail of the term-expansion
        queries (prefix, fuzzy). Per-shard decode keeps only its local
        top-(k+offset) by doc_id, so the merge shuffles O(shards ×
        (k+offset)) rows; the page cut (offset → limit) happens after the
        global doc_id sort, the same keyset-free pagination contract the
        scored paths use."""
        n = k + offset

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            parts = [delta_decode(decode_varbyte(e)) for e in pdf["docs_enc"]]
            ids = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
            return pd.DataFrame(
                {"doc_id": ids[:n].astype(np.int64), "score": 1.0}
            )

        partial = blocks.groupBy("shard").applyInPandas(
            lambda key, b: fn(b), schema=_RESULT_SCHEMA
        )
        ranked = partial.orderBy(F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(k)

    _COLLAPSE_SCHEMA = "doc_id long, score double, collapse_key string"

    def collapse_search(self, text: str, collapse_col: str, k: int = 10) -> DataFrame:
        """ES field collapsing: the top-k distinct values of
        ``collapse_col``, each represented by its best-scoring document
        (score DESC, doc_id ASC within a key; keys ranked by their best).
        The reference's flagship dedup query is morally this shape —
        one representative hit per address key.

        Exact with O(shards x k) shuffle even though collapse keys SPAN
        shards: each shard emits its per-key best capped at its local
        top-k keys. If a key's global best doc (living in shard s) is not
        among shard s's k best keys, then >= k keys beat it inside s, and
        each of those keys' global bests are at least their s-local
        bests — so >= k keys beat it globally and it cannot be in the
        answer. The global pass re-collapses (a key's per-shard bests
        collide here) with a key-partitioned Window, then
        TakeOrderedAndProject merges.

        The shard kernel reuses the single-field scorer uncut (decode is
        O(query-term postings) like every path; the collapse cut bounds
        the SHUFFLE) and joins the shard's attrs slice for the key column
        — the same cogroup shape as a filtered query.
        """
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        if collapse_col not in self.attrs.columns:
            raise ValueError(f"index attrs lack column {collapse_col!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        if not terms:
            return self.spark.createDataFrame([], self._COLLAPSE_SCHEMA)
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"),
                     "score": pd.Series(dtype="float64"),
                     "collapse_key": pd.Series(dtype="object")}
                )
            m = r.merge(
                at.rename(columns={collapse_col: "collapse_key"})[
                    ["doc_id", "collapse_key"]
                ],
                on="doc_id",
            )
            m = m.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            )
            best = m.drop_duplicates("collapse_key", keep="first")
            return best.head(k)[["doc_id", "score", "collapse_key"]]

        allowed = self.attrs.select("shard", "doc_id", collapse_col)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema=self._COLLAPSE_SCHEMA)
        )
        from pyspark.sql import Window

        w = Window.partitionBy("collapse_key").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            partial.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def suggest_terms(self, prefix: str, k: int = 10) -> DataFrame:
        """ES completion-suggester lite: the top-k dictionary terms
        starting with ``prefix``, ranked by document frequency DESC (term
        ASC tiebreak) — the autocomplete primitive. A vocab-bounded scan
        of term_stats with the [prefix, successor) range predicate pushed
        to the Parquet scan; no postings are touched. Returns
        (term, df)."""
        if not prefix:
            raise ValueError("suggest needs a non-empty prefix")
        hi = _prefix_successor(prefix)
        cond = F.col("term") >= prefix
        if hi is not None:
            cond = cond & (F.col("term") < hi)
        return (
            self.term_stats.where(cond)
            .select("term", F.col("df").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k)
        )

    def function_score(
        self,
        text: str,
        field: str,
        k: int = 10,
        modifier: str = "log1p",
        factor: float = 1.0,
        boost_mode: str = "multiply",
    ) -> DataFrame:
        """ES function_score / field_value_factor over the compressed
        index: rescore the OR match by a function of a numeric attr
        column (engine/fscore.py freezes the modifier math + rounding for
        all paths; engine/score_queries.py has the kernel). Score
        reshaping invalidates BM25 block-max pruning, so the kernel
        decodes the query terms' postings fully — the AND-branch bill —
        and the field values cogroup shard-locally (each shard ships only
        its own (doc_id, field) rows). Rank-identical to
        ExactBM25.function_score (tested)."""
        from .fscore import _check
        from .score_queries import function_score_fn

        _check(modifier, boost_mode)
        if field not in self.attrs.columns:
            raise ValueError(f"index attrs lack column {field!r}")
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        if not terms:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = self.postings.where(F.col("term").isin(terms))
        fn = function_score_fn(
            terms, idfs, self.meta.avgdl, k, modifier, factor, boost_mode
        )
        allowed = self.attrs.select(
            "shard", "doc_id", F.col(field).try_cast("double").alias("_fv")
        )
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(lambda bl, at: fn(bl, at), schema=_RESULT_SCHEMA)
        )
        return (
            partial.withColumn("score", F.round("score", ROUND_DECIMALS))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def dis_max(
        self, texts: list[str], k: int = 10, tie_breaker: float = 0.0
    ) -> DataFrame:
        """ES dis_max over match clauses on the analyzed field: score =
        best clause + tie_breaker * (sum of the others); membership = any
        clause matches. One postings scan covers every clause's terms;
        per-shard the kernel computes each clause's rounded sums and
        combines — no pruning (max-combine invalidates the BM25 bound),
        cost O(all clauses' postings). Rank-identical to
        ExactBM25.dis_max (tested)."""
        from .score_queries import dis_max_fn

        if not texts:
            raise ValueError("dis_max needs at least one clause")
        clause_terms = [sorted(set(self._analyze(t))) for t in texts]
        if any(not ct for ct in clause_terms):
            raise ValueError("a dis_max clause analyzes to zero terms")
        all_terms = sorted({t for ct in clause_terms for t in ct})
        idfs = self._idfs(all_terms)
        clause_terms = [[t for t in ct if t in idfs] for ct in clause_terms]
        clause_terms = [ct for ct in clause_terms if ct]
        if not clause_terms:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        wanted = sorted({t for ct in clause_terms for t in ct})
        blocks = self.postings.where(F.col("term").isin(wanted))
        fn = dis_max_fn(
            clause_terms, idfs, self.meta.avgdl, k, float(tie_breaker)
        )
        partial = blocks.groupBy("shard").applyInPandas(
            lambda key, bl: fn(bl), schema=_RESULT_SCHEMA
        )
        return (
            partial.withColumn("score", F.round("score", ROUND_DECIMALS))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def boosting(
        self,
        positive: str,
        negative: str,
        k: int = 10,
        negative_boost: float = 0.5,
    ) -> DataFrame:
        """ES boosting query: positive match scores, demoted (×
        negative_boost) where the doc also matches the negative clause —
        contrast with must_not, which excludes. One postings scan covers
        both clauses; the negative side only needs doc ids. Rank-identical
        to ExactBM25.boosting (tested)."""
        from .score_queries import boosting_fn

        pos_terms = sorted(set(self._analyze(positive)))
        neg_terms = sorted(set(self._analyze(negative)))
        if not pos_terms:
            raise ValueError("positive clause analyzes to zero terms")
        idfs = self._idfs(pos_terms + neg_terms)
        pos_terms = [t for t in pos_terms if t in idfs]
        neg_terms = [t for t in neg_terms if t in idfs]
        if not pos_terms:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        blocks = self.postings.where(
            F.col("term").isin(pos_terms + neg_terms)
        )
        fn = boosting_fn(
            pos_terms, neg_terms, idfs, self.meta.avgdl, k,
            float(negative_boost),
        )
        partial = blocks.groupBy("shard").applyInPandas(
            lambda key, bl: fn(bl), schema=_RESULT_SCHEMA
        )
        return (
            partial.withColumn("score", F.round("score", ROUND_DECIMALS))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def constant_score(
        self, k: int = 10, boost: float = 1.0, **filter_kwargs
    ) -> DataFrame:
        """ES constant_score: every doc passing the filter clauses scores
        ``boost`` — pure Catalyst over the attrs table (filters/prefix/
        ranges/exists/ids pushed to the Parquet scan), postings never
        touched. doc_id ASC, the constant-score contract every
        filter-only path uses."""
        cond = F.lit(True)
        for col, val in (filter_kwargs.get("filters") or {}).items():
            if isinstance(val, (list, tuple, set)):
                cond = cond & F.col(col).isin(*sorted(val))
            else:
                cond = cond & (F.col(col) == F.lit(val))
        prefix = filter_kwargs.get("prefix")
        if prefix is not None:
            cond = cond & F.col(prefix[0]).startswith(prefix[1])
        for col, (lo, hi) in (filter_kwargs.get("ranges") or {}).items():
            if lo is not None:
                cond = cond & (F.col(col) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(col) <= F.lit(hi))
        for col in filter_kwargs.get("exists_cols") or []:
            cond = cond & F.col(col).isNotNull()
        ids = filter_kwargs.get("ids")
        if ids is not None:
            cond = cond & F.col("doc_id").isin([int(i) for i in ids])
        return (
            self.attrs.where(cond)
            .select("doc_id", F.lit(float(boost)).alias("score"))
            .orderBy(F.asc("doc_id"))
            .limit(k)
        )

    def facet_counts(self, text: str, facet_col: str, top_n: int = 10) -> DataFrame:
        """ES terms aggregation over the query's FULL match set: how many
        matching docs per distinct ``facet_col`` value, top_n values by
        count DESC (value ASC tiebreak). Each shard counts its own match
        set locally (the map-side combine), so the shuffle is O(shards x
        distinct values), never O(matches). EXACT, unlike ES — whose
        terms agg is approximate across shards (per-shard shard_size
        truncation) — because emitting every shard-local (value, count)
        pair costs a bounded cardinality, not a ranking guarantee.
        """
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        if facet_col not in self.attrs.columns:
            raise ValueError(f"index attrs lack column {facet_col!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        if not terms:
            return self.spark.createDataFrame([], "facet_key string, cnt long")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame(
                    {"facet_key": pd.Series(dtype="object"),
                     "cnt": pd.Series(dtype="int64")}
                )
            m = r.merge(at[["doc_id", facet_col]], on="doc_id")
            vc = m[facet_col].value_counts()
            return pd.DataFrame(
                {"facet_key": vc.index.astype(str), "cnt": vc.to_numpy()}
            )

        allowed = self.attrs.select("shard", "doc_id", facet_col)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema="facet_key string, cnt long")
        )
        return (
            partial.groupBy("facet_key")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("facet_key"))
            .limit(top_n)
        )

    def term_prefix_search(
        self, prefix: str, k: int = 10, offset: int = 0
    ) -> DataFrame:
        """B5 prefix query as a term-dictionary RANGE scan: the predicate
        ``term >= p AND term < p + U+10FFFF`` reaches the Parquet scan as
        min/max row-group pruning (postings are written sorted by term, so
        non-matching row groups are skipped — the Lucene term-dictionary
        seek analog). Constant-score 1.0, deterministic doc_id order;
        ``offset`` pages within it (the single-token type-ahead routes
        thread theirs through here)."""
        # [prefix, successor(prefix)) is EXACTLY the startswith set under
        # codepoint-lexicographic comparison (Spark's UTF8String order),
        # with both endpoints plain literals the Parquet scan prunes on
        hi = _prefix_successor(prefix)
        cond = F.col("term") >= prefix
        if hi is not None:
            cond = cond & (F.col("term") < hi)
        return self._constant_score_docs(
            self.postings.where(cond), k, offset=offset
        )

    def pinned(self, ids: list[int], text: str, k: int = 10) -> DataFrame:
        """ES ``pinned`` query — promoted ids above organic hits; see
        engine.score_queries.pinned_compose (shared composition)."""
        from .score_queries import pinned_compose

        return pinned_compose(self, ids, text, k=k)

    def fetch_fields(
        self, hits: DataFrame, cols: list[str], max_fetch: int = 10_000
    ) -> DataFrame:
        """ES ``_source``/``docvalue_fields`` analog: decorate a top-k
        result frame with stored attr columns — (doc_id, score, *cols),
        hit order preserved. The hit ids collect to the driver (bounded
        by ``max_fetch``; a top-k result is coordinator-resident in ES
        too) and push an ``In(doc_id)`` filter into the attrs Parquet
        scan — the attrs files carry monotone doc_id row-group stats
        (builder sorts ("shard", "doc_id")), so the fetch reads O(hits)
        row groups at any corpus size, never the attrs table."""
        missing = [c for c in cols if c not in self.attrs.columns]
        if missing:
            raise ValueError(f"index attrs lack columns {missing}")
        ids = [
            int(r["doc_id"])
            for r in hits.select("doc_id").limit(max_fetch + 1).collect()
        ]
        if len(ids) > max_fetch:
            raise ValueError(
                f"fetch_fields over {max_fetch} hits — raise max_fetch or "
                "join the attrs table directly for batch exports"
            )
        sel = self.attrs.where(F.col("doc_id").isin(ids)).select(
            "doc_id", *cols
        )
        return (
            hits.join(F.broadcast(sel), "doc_id", "left")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def rescore(self, text: str, rescore_text: str, k: int = 10,
                window_size: int = 50, query_weight: float = 1.0,
                rescore_query_weight: float = 1.0,
                score_mode: str = "total") -> DataFrame:
        """ES ``rescore``: re-rank the primary query's top
        ``window_size`` hits by a weighted combination with a secondary
        query's BM25 — see engine.score_queries.rescore_compose (the one
        frozen composition both engines share)."""
        from .score_queries import rescore_compose

        return rescore_compose(
            self, text, rescore_text, k=k, window_size=window_size,
            query_weight=query_weight,
            rescore_query_weight=rescore_query_weight,
            score_mode=score_mode,
        )

    def _constant_score_local(
        self, cands: list[str], k: int, offset: int = 0
    ) -> pd.DataFrame:
        """Coordinator twin of ``_constant_score_docs``: term-dictionary
        seek of the candidate terms' posting blocks (pyarrow row-group
        pruning, no Spark job), distinct doc ids, constant score 1.0,
        doc_id ASC page [offset, offset+k) — the shared tail of the
        local term-expansion queries."""
        if not cands:
            return _empty()
        blocks = self._seek_blocks(cands)
        if len(blocks) == 0:
            return _empty()
        parts = [delta_decode(decode_varbyte(e)) for e in blocks["docs_enc"]]
        ids = np.unique(np.concatenate(parts))[offset : offset + k]
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64),
             "score": np.full(len(ids), 1.0, dtype=np.float64)}
        )

    def fuzzy_term_search_local(
        self, term: str, k: int = 10, max_edits: int = 1, prefix_len: int = 0,
        max_expansions: int = 50,
    ) -> pd.DataFrame:
        """Coordinator fast path for ``fuzzy_term_search`` — identical
        semantics and results (rank-identity-tested), no Spark job: the
        expansion walks the RESIDENT term dictionary (``_df_local``, the
        Lucene-FST-analog snapshot the index keeps when term_stats fits
        the local cap) with a length band + early-exit bounded
        Levenshtein, caps at ``max_expansions`` best-by-df exactly like
        ``_cap_expansion``, and reads only the matched terms' posting
        blocks via the term-dictionary seek. This is the serving story
        for the fuzzy DSL shape: ms-latency typo queries off the same
        index the cluster built."""
        q = self._analyze(term)
        if len(q) != 1:
            raise ValueError("fuzzy_term_search takes exactly one analyzed term")
        qt = q[0]
        pfx = qt[:prefix_len]
        cands = self._expansion_local(
            lambda t: (not prefix_len or t.startswith(pfx))
            and abs(len(t) - len(qt)) <= max_edits
            and _lev_within(t, qt, max_edits),
            max_expansions,
        )
        return self._constant_score_local(cands, k)

    def _expansion_local(self, match_fn, max_expansions: int) -> list[str]:
        """Shared local-expansion tail: walk the RESIDENT term dictionary
        with ``match_fn``, cap at ``max_expansions`` best-by-df (same
        (-df, term) order as ``_cap_expansion``, so local and distributed
        expansions are term-for-term identical)."""
        if max_expansions <= 0:
            raise ValueError("max_expansions must be positive")
        if self._df_local is None:
            raise ValueError(
                "coordinator expansion needs the resident term dictionary "
                "(term_stats exceeds the local cap); use the distributed path"
            )
        cands = [(t, d) for t, d in self._df_local.items() if match_fn(t)]
        cands.sort(key=lambda td: (-td[1], td[0]))
        return [t for t, _ in cands[:max_expansions]]

    def wildcard_term_search_local(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> pd.DataFrame:
        """Coordinator fast path for ``wildcard_term_search`` — identical
        results (the anchored translation below is the same regex the
        distributed rlike evaluates; its ``.*``/``.``/escaped-literal
        alphabet behaves identically in Java regex and CPython sre), no
        Spark job: resident-dictionary expansion + term-dictionary-seek
        postings read."""
        if not pattern:
            raise ValueError("wildcard_term_search needs a non-empty pattern")
        rx = re.compile(
            "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in pattern.lower()
            ) + "$"
        )
        cands = self._expansion_local(
            lambda t: rx.match(t) is not None, max_expansions
        )
        return self._constant_score_local(cands, k)

    def regexp_term_search_local(
        self, regex: str, k: int = 10, max_expansions: int = 50
    ) -> pd.DataFrame:
        """Coordinator fast path for ``regexp_term_search`` — identical
        results within the engine's documented Java∩RE2 pattern subset
        (char classes, alternation, quantifiers — no backrefs), which
        CPython sre evaluates identically; no Spark job."""
        if not regex:
            raise ValueError("regexp_term_search needs a non-empty regex")
        rx = re.compile(f"^(?:{regex})$")
        cands = self._expansion_local(
            lambda t: rx.match(t) is not None, max_expansions
        )
        return self._constant_score_local(cands, k)

    def composite_agg_local(
        self,
        text: str,
        facet_col: str,
        size: int = 10,
        after: str | None = None,
    ) -> pd.DataFrame:
        """Coordinator fast path for ``composite_agg`` — identical
        buckets/counts (equality-tested), no Spark job: the match set
        decodes from a term-dictionary seek of the query terms' posting
        blocks (the whole-index run is exact — the facet kernel has no
        θ pruning, so the shard split cannot change results), and the
        facet values come from a columnar pyarrow read of the attrs
        (doc_id, facet_col) pair — the ES doc-values analog, resident on
        a serving node. Driver bill: O(matches + that one column pair),
        the same order the facet computation itself costs; use
        ``composite_agg`` when the corpus-side column no longer fits a
        coordinator."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        if facet_col not in self.attrs.columns:
            raise ValueError(f"index attrs lack column {facet_col!r}")
        empty = pd.DataFrame(
            {"facet_key": pd.Series(dtype="object"),
             "cnt": pd.Series(dtype="int64")}
        )
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        if not terms:
            return empty
        blocks = self._seek_blocks(terms)
        if len(blocks) == 0:
            return empty
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )
        r = fd(blocks)
        if len(r) == 0:
            return empty
        if getattr(self, "_pads_attrs", None) is None:
            self._pads_attrs = pads.dataset(
                os.path.join(self.out_dir, "attrs"), partitioning="hive"
            )
        tbl = self._pads_attrs.to_table(columns=["doc_id", facet_col])
        m = pc.is_in(
            tbl.column("doc_id"),
            value_set=pa.array(r["doc_id"].to_numpy(dtype=np.int64)),
        )
        # mirror the distributed kernel's conversion EXACTLY: Arrow →
        # pandas → astype(str), so nulls become counted 'None' (object
        # columns) / 'nan' (numeric-with-null columns) buckets just like
        # the applyInPandas kernel's m[facet_col].astype(str). A pyarrow
        # string cast instead would KEEP nulls, which value_counts then
        # silently drops — breaking the twins' bucket identity on any
        # nullable facet column.
        keys = tbl.column(facet_col).filter(m).to_pandas().astype(str)
        if after is not None:
            keys = keys[keys > after]
        if len(keys) == 0:
            return empty
        vc = keys.value_counts().sort_index().iloc[:size]
        return pd.DataFrame(
            {"facet_key": vc.index.astype(str),
             "cnt": vc.to_numpy(dtype=np.int64)}
        )

    def _cap_expansion(self, vocab: DataFrame, max_expansions: int) -> list[str]:
        """ES ``max_expansions`` contract (default 50 there and here):
        keep the best ``max_expansions`` matched dictionary terms by df
        (desc; term asc tiebreak — deterministic), silently dropping the
        tail like ES. The cut is an ``orderBy().limit()`` —
        TakeOrderedAndProject, each task keeps only ``max_expansions``
        candidates — so the driver NEVER materializes O(vocab) terms:
        a leading wildcard or hot fuzzy stem over a billion-term code
        vocabulary (the uid tail) collects at most ``max_expansions``
        rows, not the expansion."""
        if max_expansions <= 0:
            raise ValueError("max_expansions must be positive")
        rows = (
            vocab.select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .collect()
        )
        return [r["term"] for r in rows]

    def fuzzy_term_search(
        self, term: str, k: int = 10, max_edits: int = 1, prefix_len: int = 0,
        max_expansions: int = 50,
    ) -> DataFrame:
        """ES ``fuzzy`` query analog (B5 sibling): docs containing ≥1
        indexed term within ``max_edits`` Levenshtein edits of ``term``.

        Candidate expansion runs over the TERM DICTIONARY, not the
        postings: Lucene walks an edit-distance automaton over its FST;
        the Spark-first analog is a column-pruned scan of term_stats with
        a codegen'd length band + F.levenshtein filter — O(vocab), which
        is orders of magnitude below O(corpus), embarrassingly parallel,
        and (like ES's ``prefix_length``) an optional common-prefix
        constraint pushes StringStartsWith into the vocab scan. The
        matched terms — capped at ``max_expansions`` best-by-df via a
        distributed TakeOrderedAndProject (see ``_cap_expansion``) —
        then push an ``In(term, …)`` filter into the postings scan.

        Constant score 1.0 with deterministic doc_id order — the same
        contract as ``term_prefix_search`` (ES scores fuzzy matches with
        a fuzziness-discounted BM25; constant-score is this engine's
        documented choice, twinned in the oracle). Classic Levenshtein
        (Spark == DuckDB); ES additionally counts transpositions as one
        edit by default — documented divergence.
        """
        q = self._analyze(term)
        if len(q) != 1:
            raise ValueError("fuzzy_term_search takes exactly one analyzed term")
        qt = q[0]
        vocab = self.term_stats.select("term", "df")
        if prefix_len > 0:
            vocab = vocab.where(F.col("term").startswith(qt[:prefix_len]))
        vocab = vocab.where(
            F.length("term").between(len(qt) - max_edits, len(qt) + max_edits)
        ).where(F.levenshtein(F.col("term"), F.lit(qt)) <= max_edits)
        cands = self._cap_expansion(vocab, max_expansions)
        if not cands:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        return self._constant_score_docs(
            self.postings.where(F.col("term").isin(cands)), k
        )

    def wildcard_term_search(
        self, pattern: str, k: int = 10, max_expansions: int = 50
    ) -> DataFrame:
        """ES ``wildcard`` query: docs containing ≥1 indexed term matching
        ``pattern``, where ``*`` = any sequence and ``?`` = one character
        (anchored full-term match, ES semantics).

        Same architecture as ``fuzzy_term_search``: expansion runs over
        the TERM DICTIONARY (O(vocab), never O(corpus)) — the literal
        prefix before the first wildcard pushes a [prefix, successor)
        range into the vocab Parquet scan (so ``sp*k`` prunes row groups
        like a prefix query; a leading wildcard degrades to a full vocab
        scan, exactly ES's documented wildcard hazard — the scan stays
        distributed and the driver holds at most ``max_expansions``
        survivors via ``_cap_expansion``), the survivors are matched
        with one codegen'd ``rlike`` on an anchored regex, and the
        matched terms push ``In(term, …)`` into the postings scan.
        Constant score 1.0, deterministic doc_id order (same contract and
        oracle shape as prefix/fuzzy; ES wildcard is constant-score too).
        """
        if not pattern:
            raise ValueError("wildcard_term_search needs a non-empty pattern")
        lit_prefix = ""
        for ch in pattern:
            if ch in "*?":
                break
            lit_prefix += ch
        # translate to an anchored regex, escaping everything else —
        # the analyzer lowercases, so match case-insensitively via lower()
        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern.lower()
        ) + "$"
        vocab = self.term_stats.select("term", "df")
        if lit_prefix:
            hi = _prefix_successor(lit_prefix.lower())
            cond = F.col("term") >= lit_prefix.lower()
            if hi is not None:
                cond = cond & (F.col("term") < hi)
            vocab = vocab.where(cond)
        vocab = vocab.where(F.col("term").rlike(rx))
        cands = self._cap_expansion(vocab, max_expansions)
        if not cands:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        return self._constant_score_docs(
            self.postings.where(F.col("term").isin(cands)), k
        )

    def regexp_term_search(
        self, regex: str, k: int = 10, max_expansions: int = 50
    ) -> DataFrame:
        """ES ``regexp`` query: docs containing ≥1 indexed term whose
        ENTIRE text matches ``regex`` (ES anchors implicitly; so does
        this). Dictionary-expansion architecture as above — one rlike
        over the vocab scan, ``max_expansions``-capped best-by-df
        (``_cap_expansion``), then In(term) into the postings. Patterns
        must stay in the Java-regex ∩ RE2 common subset (char classes,
        alternation, quantifiers — no backrefs) so the DuckDB twin
        (regexp_full_match) is exact; documented engine contract, same
        restriction ES's RE2-like Lucene syntax imposes in practice.
        Constant score 1.0, deterministic doc_id order."""
        if not regex:
            raise ValueError("regexp_term_search needs a non-empty regex")
        vocab = self.term_stats.select("term", "df").where(
            F.col("term").rlike(f"^(?:{regex})$")
        )
        cands = self._cap_expansion(vocab, max_expansions)
        if not cands:
            return self.spark.createDataFrame([], _RESULT_SCHEMA)
        return self._constant_score_docs(
            self.postings.where(F.col("term").isin(cands)), k
        )

    _STATS_SCHEMA = (
        "cnt long, min_val double, max_val double, sum_val double, avg_val double"
    )

    def stats_agg(self, text: str, num_col: str) -> DataFrame:
        """ES ``stats`` aggregation over the query's FULL match set:
        count / min / max / sum / avg of a numeric attr column. Each
        shard reduces its own match set to ONE partial row (the map-side
        combine), so the shuffle is O(shards) regardless of match count;
        the final reduce is a single Catalyst agg. Exact — sums are
        integer-valued attr counts here, and avg is derived from
        (sum, cnt) after the merge, so parallelism cannot reorder a
        float accumulation."""
        terms, idfs = self._match_terms(text)
        if not terms:
            return self.spark.createDataFrame([], self._STATS_SCHEMA)
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame(
                    {"cnt": pd.Series(dtype="int64"),
                     "min_val": pd.Series(dtype="float64"),
                     "max_val": pd.Series(dtype="float64"),
                     "sum_val": pd.Series(dtype="float64")}
                )
            cols = ["doc_id"] if num_col == "doc_id" else ["doc_id", num_col]
            v = r.merge(at[cols], on="doc_id")[num_col]
            v = v.astype("float64")
            if len(v) == 0:
                return pd.DataFrame(
                    {"cnt": pd.Series(dtype="int64"),
                     "min_val": pd.Series(dtype="float64"),
                     "max_val": pd.Series(dtype="float64"),
                     "sum_val": pd.Series(dtype="float64")}
                )
            return pd.DataFrame(
                {"cnt": [len(v)], "min_val": [float(v.min())],
                 "max_val": [float(v.max())], "sum_val": [float(v.sum())]}
            )

        sel = ["shard", "doc_id"] + ([num_col] if num_col != "doc_id" else [])
        allowed = self.attrs.select(*sel)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(
                fn, schema="cnt long, min_val double, max_val double, sum_val double"
            )
        )
        return partial.agg(
            F.sum("cnt").alias("cnt"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.sum("sum_val").alias("sum_val"),
        ).select(
            "cnt", "min_val", "max_val", "sum_val",
            F.round(F.col("sum_val") / F.col("cnt"), ROUND_DECIMALS).alias("avg_val"),
        )

    def histogram_agg(self, text: str, num_col: str, interval: int) -> DataFrame:
        """ES ``histogram`` aggregation over the full match set: doc
        counts per fixed-width bucket ``floor(val / interval) *
        interval``. Per-shard bucket partials (map-side combine) keep the
        shuffle O(shards × buckets); the final reduce sums per bucket.
        Exact and complete (every non-empty bucket), bucket ASC order —
        ES's min_doc_count=1 default."""
        if interval <= 0:
            raise ValueError("interval must be positive")
        terms, idfs = self._match_terms(text)
        if not terms:
            return self.spark.createDataFrame([], "bucket double, cnt long")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame(
                    {"bucket": pd.Series(dtype="float64"),
                     "cnt": pd.Series(dtype="int64")}
                )
            cols = ["doc_id"] if num_col == "doc_id" else ["doc_id", num_col]
            v = r.merge(at[cols], on="doc_id")[num_col]
            b = np.floor(v.to_numpy(dtype=np.float64) / interval) * interval
            vc = pd.Series(b).value_counts()
            return pd.DataFrame(
                {"bucket": vc.index.to_numpy(dtype=np.float64),
                 "cnt": vc.to_numpy()}
            )

        sel = ["shard", "doc_id"] + ([num_col] if num_col != "doc_id" else [])
        allowed = self.attrs.select(*sel)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema="bucket double, cnt long")
        )
        return (
            partial.groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.asc("bucket"))
        )

    def cardinality_agg(self, text: str, col: str) -> DataFrame:
        """ES ``cardinality`` aggregation over the full match set —
        EXACT distinct count of ``col``, where ES ships an HLL++ sketch.
        Per-shard local distinct (map-side dedup bounds the shuffle at
        O(shards × distinct values)), then one global distinct count.
        For web-scale cardinalities where exactness is not required,
        ``F.approx_count_distinct`` over the same per-shard values is the
        drop-in HLL twin (documented scale path; not gated because its
        estimate is not oracle-reproducible)."""
        terms, idfs = self._match_terms(text)
        if not terms:
            return self.spark.createDataFrame([], "cardinality long")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame({"val": pd.Series(dtype="object")})
            cols = ["doc_id"] if col == "doc_id" else ["doc_id", col]
            m = r.merge(at[cols], on="doc_id")
            return pd.DataFrame({"val": m[col].astype(str).unique()})

        sel = ["shard", "doc_id"] + ([col] if col != "doc_id" else [])
        allowed = self.attrs.select(*sel)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema="val string")
        )
        return partial.agg(
            F.count_distinct(F.col("val")).alias("cardinality")
        )

    def filters_agg(
        self, text: str, buckets: dict[str, dict[str, str]]
    ) -> DataFrame:
        """ES ``filters`` aggregation: NAMED buckets, each defined by
        keyword equality filters, counting the query's matching docs per
        bucket (a doc can land in several buckets — ES semantics, unlike
        a terms agg). Per-shard map-side combine: each shard reduces its
        match set to one partial count per bucket, so the shuffle is
        O(shards × buckets). Rows ordered bucket ASC; empty buckets
        reported with cnt 0 (ES keeps them too)."""
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        names = sorted(buckets)
        need_cols = sorted({c for b in buckets.values() for c in b})
        for c in need_cols:
            if c not in self.attrs.columns:
                raise ValueError(f"index attrs lack column {c!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        schema = "bucket string, cnt long"
        zero = self.spark.createDataFrame(
            [(n, 0) for n in names], schema
        )
        if not terms:
            return zero.orderBy("bucket")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )
        spec = {n: dict(buckets[n]) for n in names}

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"bucket": pd.Series(dtype="object"),
                 "cnt": pd.Series(dtype="int64")}
            )
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return empty
            m = r.merge(at[["doc_id"] + need_cols], on="doc_id")
            rows = []
            for n in names:
                mask = pd.Series(True, index=m.index)
                for c, v in spec[n].items():
                    mask &= m[c] == v
                rows.append((n, int(mask.sum())))
            return pd.DataFrame(rows, columns=["bucket", "cnt"])

        allowed = self.attrs.select("shard", "doc_id", *need_cols)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema=schema)
        )
        return (
            partial.unionByName(zero)
            .groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.asc("bucket"))
        )

    def range_agg(
        self, text: str, num_col: str, bounds: list[tuple]
    ) -> DataFrame:
        """ES ``range`` aggregation: custom numeric buckets over the
        match set — each (lo, hi) is a half-open [lo, hi) interval, None
        for an open end (the ES from/to contract). Per-shard map-side
        combine, shuffle O(shards × buckets); empty buckets kept with
        cnt 0. Rows come back in CALLER bounds order (key = "lo-hi").
        Duplicate (lo, hi) bounds are rejected up front: the bucket key
        doubles as a map key in the ordering expression (duplicate map
        keys throw under Spark's default mapKeyDedupPolicy=EXCEPTION)
        and the zero-frame groupBy would silently merge their counts."""
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        if num_col not in self.attrs.columns and num_col != "doc_id":
            raise ValueError(f"index attrs lack column {num_col!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        keys = [
            f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            for lo, hi in bounds
        ]
        if len(set(keys)) != len(keys):
            raise ValueError(f"duplicate (lo, hi) bounds in {bounds!r}")
        schema = "bucket string, cnt long"
        zero = self.spark.createDataFrame([(k, 0) for k in keys], schema)
        order = {k: i for i, k in enumerate(keys)}
        oexpr = F.element_at(
            F.create_map(*[F.lit(x) for k in keys for x in (k, order[k])]),
            F.col("bucket"),
        )
        if not terms:
            return zero.orderBy(oexpr).select("bucket", "cnt")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )
        bspec = list(zip(keys, bounds))

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"bucket": pd.Series(dtype="object"),
                 "cnt": pd.Series(dtype="int64")}
            )
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return empty
            cols = ["doc_id"] + ([num_col] if num_col != "doc_id" else [])
            m = r.merge(at[cols], on="doc_id")
            v = m[num_col].astype("float64")
            rows = []
            for k, (lo, hi) in bspec:
                mask = pd.Series(True, index=m.index)
                if lo is not None:
                    mask &= v >= lo
                if hi is not None:
                    mask &= v < hi
                rows.append((k, int(mask.sum())))
            return pd.DataFrame(rows, columns=["bucket", "cnt"])

        acols = ["shard", "doc_id"] + (
            [num_col] if num_col not in ("shard", "doc_id") else []
        )
        allowed = self.attrs.select(*acols)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema=schema)
        )
        return (
            partial.unionByName(zero)
            .groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
            .orderBy(oexpr)
            .select("bucket", "cnt")
        )

    def geo_distance_agg(
        self,
        text: str,
        lon_col: str,
        lat_col: str,
        origin_lon: float,
        origin_lat: float,
        bounds: list[tuple],
    ) -> DataFrame:
        """ES ``geo_distance`` aggregation: distance-ring buckets from an
        origin over the match set — each (lo, hi) a half-open [lo, hi)
        ring in METERS, None for an open end, rows in caller bounds
        order (key = "lo-hi"), empty rings kept with cnt 0. The ring
        metric is the same haversine as the geo_distance query
        (ops.geo.haversine_np — numpy twin of the Catalyst/SQL formula),
        evaluated inside the per-shard kernel on each shard's own
        matched (lon, lat) pairs, so the shape is exactly ``range_agg``:
        per-shard map-side combine, shuffle O(shards × rings), never
        O(matches). Duplicate bounds rejected like range_agg (the bucket
        key doubles as an ordering-map key)."""
        from ..ops.geo import haversine_np

        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        for c in (lon_col, lat_col):
            if c not in self.attrs.columns:
                raise ValueError(f"index attrs lack column {c!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        keys = [
            f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            for lo, hi in bounds
        ]
        if len(set(keys)) != len(keys):
            raise ValueError(f"duplicate (lo, hi) bounds in {bounds!r}")
        schema = "bucket string, cnt long"
        zero = self.spark.createDataFrame([(k, 0) for k in keys], schema)
        order = {k: i for i, k in enumerate(keys)}
        oexpr = F.element_at(
            F.create_map(*[F.lit(x) for k in keys for x in (k, order[k])]),
            F.col("bucket"),
        )
        if not terms:
            return zero.orderBy(oexpr).select("bucket", "cnt")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )
        bspec = list(zip(keys, bounds))

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"bucket": pd.Series(dtype="object"),
                 "cnt": pd.Series(dtype="int64")}
            )
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return empty
            m = r.merge(at[["doc_id", lon_col, lat_col]], on="doc_id")
            v = haversine_np(
                m[lon_col].to_numpy(dtype=np.float64),
                m[lat_col].to_numpy(dtype=np.float64),
                origin_lon, origin_lat,
            )
            rows = []
            for kk, (lo, hi) in bspec:
                mask = np.ones(len(v), dtype=bool)
                if lo is not None:
                    mask &= v >= lo
                if hi is not None:
                    mask &= v < hi
                rows.append((kk, int(mask.sum())))
            return pd.DataFrame(rows, columns=["bucket", "cnt"])

        allowed = self.attrs.select("shard", "doc_id", lon_col, lat_col)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema=schema)
        )
        return (
            partial.unionByName(zero)
            .groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
            .orderBy(oexpr)
            .select("bucket", "cnt")
        )

    def facet_metric_agg(
        self,
        text: str,
        facet_col: str,
        num_col: str,
        top_n: int = 10,
    ) -> DataFrame:
        """ES terms aggregation WITH SUB-AGGREGATIONS: per facet bucket,
        the doc count plus min/max/sum/avg of a numeric attr over the
        query's full match set — the "terms + metrics" shape that powers
        every ES dashboard panel. top_n buckets by count DESC (key ASC
        tiebreak). Exact (ES's cross-shard terms agg is approximate).

        Plan shape: each shard reduces its own match set to ONE partial
        row per facet value — (key, cnt, sum, min, max) are all
        mergeable, so the shuffle is O(shards × distinct keys) and the
        final reduce derives avg from (sum, cnt) AFTER the merge
        (parallelism cannot reorder a float accumulation).
        """
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        for c in (facet_col, num_col):
            if c not in self.attrs.columns and c != "doc_id":
                raise ValueError(f"index attrs lack column {c!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        schema = (
            "facet_key string, cnt long, sum_val double, "
            "min_val double, max_val double"
        )
        if not terms:
            return self.spark.createDataFrame([], schema)
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"facet_key": pd.Series(dtype="object"),
                 "cnt": pd.Series(dtype="int64"),
                 "sum_val": pd.Series(dtype="float64"),
                 "min_val": pd.Series(dtype="float64"),
                 "max_val": pd.Series(dtype="float64")}
            )
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return empty
            cols = ["doc_id", facet_col] + (
                [num_col] if num_col not in ("doc_id", facet_col) else []
            )
            m = r.merge(at[cols], on="doc_id")
            if len(m) == 0:
                return empty
            v = m[num_col].astype("float64")
            g = v.groupby(m[facet_col].astype(str)).agg(
                ["count", "sum", "min", "max"]
            )
            return pd.DataFrame(
                {"facet_key": g.index.to_numpy(dtype=object),
                 "cnt": g["count"].to_numpy(dtype="int64"),
                 "sum_val": g["sum"].to_numpy(dtype="float64"),
                 "min_val": g["min"].to_numpy(dtype="float64"),
                 "max_val": g["max"].to_numpy(dtype="float64")}
            )

        sel = ["shard", "doc_id", facet_col] + (
            [num_col] if num_col not in ("doc_id", facet_col) else []
        )
        allowed = self.attrs.select(*sel)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema=schema)
        )
        return (
            partial.groupBy("facet_key")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("sum_val").alias("sum_val"),
                F.min("min_val").alias("min_val"),
                F.max("max_val").alias("max_val"),
            )
            .select(
                "facet_key", "cnt", "min_val", "max_val",
                F.round(F.col("sum_val") / F.col("cnt"), ROUND_DECIMALS)
                .alias("avg_val"),
            )
            .orderBy(F.desc("cnt"), F.asc("facet_key"))
            .limit(top_n)
        )

    def percentiles_agg(
        self, text: str, num_col: str, percentiles: list[float] | None = None
    ) -> DataFrame:
        """ES ``percentiles`` aggregation over the full match set —
        EXACT linear-interpolated quantiles, where ES ships a t-digest
        sketch. Exact quantiles are not mergeable from constant-size
        shard partials, so each shard emits its matched VALUES (an
        O(matches) single-column shuffle — the honest cost of
        exactness) and one Catalyst ``percentile`` aggregate reduces
        them; Spark and DuckDB both interpolate at rank p·(n−1), so the
        oracle twin (``quantile_cont``) is exact. For web-scale match
        sets where the value shuffle is too big, ``F.percentile_approx``
        over the same per-shard values is the drop-in t-digest twin
        (documented scale path; not gated — its estimate is not
        oracle-reproducible). Output: one (pct, value) row per requested
        percentile, pct ASC."""
        pcts = percentiles if percentiles is not None else [25.0, 50.0, 75.0, 95.0]
        if not pcts or any(p < 0 or p > 100 for p in pcts):
            raise ValueError("percentiles must be within [0, 100]")
        terms, idfs = self._match_terms(text)
        if not terms:
            return self.spark.createDataFrame([], "pct double, value double")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame({"val": pd.Series(dtype="float64")})
            cols = ["doc_id"] if num_col == "doc_id" else ["doc_id", num_col]
            v = r.merge(at[cols], on="doc_id")[num_col]
            return pd.DataFrame({"val": v.astype("float64").to_numpy()})

        sel = ["shard", "doc_id"] + ([num_col] if num_col != "doc_id" else [])
        allowed = self.attrs.select(*sel)
        vals = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema="val double")
        )
        qs = vals.agg(
            F.percentile(
                F.col("val"), F.array(*[F.lit(p / 100.0) for p in sorted(pcts)])
            ).alias("qs")
        ).select(
            F.posexplode("qs").alias("pos", "value")
        )
        pct_arr = F.array(*[F.lit(float(p)) for p in sorted(pcts)])
        return qs.select(
            F.element_at(pct_arr, F.col("pos") + 1).alias("pct"),
            F.round(F.col("value"), ROUND_DECIMALS).alias("value"),
        ).orderBy("pct")

    def composite_agg(
        self,
        text: str,
        facet_col: str,
        size: int = 10,
        after: str | None = None,
    ) -> DataFrame:
        """ES ``composite`` aggregation: paginate through ALL buckets of
        a terms source in key order, ``size`` buckets per page, resuming
        from ``after`` (the last key of the previous page) — the ES-side
        answer to "export every bucket" that terms-agg top-n cannot do.

        Scale shape: the after-key predicate is applied INSIDE the
        per-shard combine before partials are emitted (a predicate on
        the group key commutes with sum-by-key), so a deep page's
        shuffle carries only keys AFTER the cursor — O(shards ×
        remaining keys), and the page cut is a TakeOrderedAndProject,
        never a full sort. Same keyset-pagination contract as
        ``search_after`` (engine/wand.py search), applied to buckets.
        Exact counts (map-side per-shard combine), key ASC.
        """
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        if facet_col not in self.attrs.columns:
            raise ValueError(f"index attrs lack column {facet_col!r}")
        idfs = self._idfs(terms)
        terms = [t for t in terms if t in idfs]
        if not terms:
            return self.spark.createDataFrame([], "facet_key string, cnt long")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )

        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"facet_key": pd.Series(dtype="object"),
                 "cnt": pd.Series(dtype="int64")}
            )
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return empty
            m = r.merge(at[["doc_id", facet_col]], on="doc_id")
            keys = m[facet_col].astype(str)
            if after is not None:
                keys = keys[keys > after]
            if len(keys) == 0:
                return empty
            vc = keys.value_counts()
            return pd.DataFrame(
                {"facet_key": vc.index.astype(str), "cnt": vc.to_numpy()}
            )

        allowed = self.attrs.select("shard", "doc_id", facet_col)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema="facet_key string, cnt long")
        )
        return (
            partial.groupBy("facet_key")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.asc("facet_key"))
            .limit(size)
        )

    def top_hits_agg(
        self, text: str, group_col: str, k_per_group: int = 3, n_groups: int = 5
    ) -> DataFrame:
        """ES ``top_hits`` sub-aggregation under a terms bucket: the top
        ``n_groups`` values of ``group_col`` (ranked by their best hit's
        score, value ASC tiebreak), each carrying its own top
        ``k_per_group`` hits. Generalizes ``collapse_search``
        (k_per_group=1).

        Each shard emits its per-key local top-j for EVERY key in its
        match set — collapse's top-k-keys pigeonhole does NOT extend to
        depth j ≥ 2 (a key's j-th-best hit can be locally dominated in
        its shard while the key still ranks top-n on a best hit living
        elsewhere), so the cap here is the key cardinality, exactly
        facet_counts' bound: shuffle O(shards × distinct keys × j),
        never O(matches). The global pass re-ranks with one key-
        partitioned Window (per-key top-j), then picks the winning keys
        with a map-side-combined groupBy + orderBy().limit(n_groups)
        (TakeOrderedAndProject) — never a partition-less Window, whose
        single task would sort O(distinct keys in the match set) rows
        (millions for a hot query grouped by repo at 100×)."""
        if group_col == "doc_id" or group_col not in self.attrs.columns:
            raise ValueError(f"index attrs lack group column {group_col!r}")
        terms, idfs = self._match_terms(text)
        schema = "doc_id long, score double, group_key string"
        if not terms:
            return self.spark.createDataFrame([], schema)
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )
        def fn(bl: pd.DataFrame, at: pd.DataFrame) -> pd.DataFrame:
            r = fd(bl)
            if len(r) == 0 or len(at) == 0:
                return pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"),
                     "score": pd.Series(dtype="float64"),
                     "group_key": pd.Series(dtype="object")}
                )
            m = r.merge(
                at.rename(columns={group_col: "group_key"})[
                    ["doc_id", "group_key"]
                ],
                on="doc_id",
            ).sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            )
            top = m.groupby("group_key", sort=False).head(k_per_group)
            return top[["doc_id", "score", "group_key"]]

        allowed = self.attrs.select("shard", "doc_id", group_col)
        partial = (
            blocks.groupBy("shard")
            .cogroup(allowed.groupBy("shard"))
            .applyInPandas(fn, schema=schema)
        )
        from pyspark.sql import Window

        in_key = Window.partitionBy("group_key").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = (
            partial.withColumn("_rn", F.row_number().over(in_key))
            .where(F.col("_rn") <= k_per_group)
        )
        # winning keys = top n_groups by best score: a map-side-combined
        # groupBy + orderBy().limit() = TakeOrderedAndProject; each task
        # keeps only n_groups candidates. (group_key is unique per row
        # after the agg, so this is exactly the old dense_rank cut —
        # minus the partition-less Window that sorted ALL distinct keys
        # in the match set on a single task.)
        keys = (
            ranked.groupBy("group_key")
            .agg(F.max("score").alias("_best"))
            .orderBy(F.desc("_best"), F.asc("group_key"))
            .limit(n_groups)
            .select("group_key")
        )
        return (
            ranked.join(F.broadcast(keys), "group_key", "left_semi")
            .select("doc_id", "score", "group_key")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def match_doc_ids(self, text: str) -> DataFrame:
        """The query's FULL match set as a (doc_id) DataFrame — the
        shared head of set-valued aggregations. Per-shard decode of the
        query terms' postings only; no global ranking, no k cut."""
        terms, idfs = self._match_terms(text)
        if not terms:
            return self.spark.createDataFrame([], "doc_id long")
        blocks = self.postings.where(F.col("term").isin(terms))
        fd = _shard_topk_fn(
            terms, idfs, self.meta.avgdl, 1 << 60, filtered=False,
            must_not_terms=[], require_all=False,
            dense_hint=int(self.meta.n_docs),
        )
        return (
            blocks.groupBy("shard")
            .applyInPandas(lambda key, bl: fd(bl), schema=_RESULT_SCHEMA)
            .select("doc_id")
        )

    def significant_terms(
        self,
        text: str,
        source: DataFrame,
        top_n: int = 10,
        source_id_col: str = "doc_id",
        source_text_col: str = "content",
        min_doc_count: int = 1,
    ) -> DataFrame:
        """ES ``significant_terms`` aggregation: the terms most
        over-represented in the query's match set (foreground) relative
        to the whole index (background). Like ES, the stored source text
        of the matching docs supplies the foreground counts (``source``
        is the corpus table, the engine's _source analog — the same
        contract as ``match_phrase``); the background df comes from the
        index's term dictionary, never a corpus rescan.

        Score is the JLH heuristic ES defaults to, on exact counts:
        ``(fg_rate − bg_rate) · (fg_rate / bg_rate)`` with
        fg_rate = fg_df / |match set| and bg_rate = df / N, keeping only
        terms with fg_rate > bg_rate, rounded to ROUND_DECIMALS and
        ranked (score DESC, term ASC). EXACT, unlike ES (whose fg counts
        come from the top shard_size hits per shard) — the plan is one
        semi-join of the tokenized match set (array_distinct before the
        explode, so per-doc dedup is shuffle-free) against the match-id
        set, one groupBy(term), and one join to term_stats; every stage
        is O(match-set tokens + vocab), never O(corpus tokens).
        Returns (term, fg long, score double).
        """
        matched = self.match_doc_ids(text)
        n_fg = matched.agg(F.count(F.lit(1)).alias("n_fg"))
        fg = (
            source.join(
                matched.withColumnRenamed("doc_id", source_id_col),
                source_id_col,
                "left_semi",
            )
            .select(
                F.explode(
                    F.array_distinct(tokenize_expr(source_text_col))
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("fg"))
            .where(F.col("fg") >= min_doc_count)
        )
        n = float(self.meta.n_docs)
        scored = (
            fg.join(self.term_stats.select("term", "df"), "term")
            .crossJoin(F.broadcast(n_fg))
            .withColumn("fg_rate", F.col("fg") / F.col("n_fg"))
            .withColumn("bg_rate", F.col("df") / F.lit(n))
            .where(F.col("fg_rate") > F.col("bg_rate"))
            .withColumn(
                "score",
                F.round(
                    (F.col("fg_rate") - F.col("bg_rate"))
                    * (F.col("fg_rate") / F.col("bg_rate")),
                    ROUND_DECIMALS,
                ),
            )
        )
        return (
            scored.select("term", F.col("fg").cast("long").alias("fg"), "score")
            .orderBy(F.desc("score"), F.asc("term"))
            .limit(top_n)
        )

    def _match_terms(self, text: str) -> tuple[list[str], dict[str, float]]:
        """Analyzed query terms restricted to the dictionary + their idfs
        (shared head of every full-match-set aggregation)."""
        terms = sorted(set(self._analyze(text)))
        if not terms:
            raise ValueError("query analyzes to zero terms")
        idfs = self._idfs(terms)
        return [t for t in terms if t in idfs], idfs
