"""Positional postings (index_options="positions") — exactness gates.

The positional phrase path (CompressedIndex.match_phrase_positional /
match_phrase_local, engine/positions.py) must be RANK-IDENTICAL to the
verify-first match_phrase over the same index parameters, for every
phrase shape: hot bigrams, selective phrases, repeated terms, slop > 0,
absent terms. The position codec must round-trip arbitrary ascending
streams, and a default ("freqs") index must refuse positional queries
rather than silently mis-answer.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index
from librecatastro_spark.index.codec import (
    decode_positions,
    encode_positions_bulk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_corpus(spark, 400, min_tokens=20, max_tokens=150, partitions=4)
    return assign_doc_ids(docs).cache()


@pytest.fixture(scope="module")
def pidx(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("posidx"))
    build_index(
        spark, corpus, out, attr_cols=("repo", "path", "lang"),
        n_shards=4, block_size=16, salt_threshold=120, n_salts=4,
        index_options="positions",
    )
    return CompressedIndex(spark, out)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def lrows(pdf):
    return list(zip(pdf["doc_id"].tolist(), pdf["score"].tolist()))


# ---------------------------------------------------------------- codec --

def test_position_codec_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n_rows = int(rng.integers(1, 40))
        counts, vals = [], []
        for _r in range(n_rows):
            c = int(rng.integers(1, 12))
            # strictly ascending positions per row, arbitrary magnitudes
            p = np.cumsum(rng.integers(1, 1000, size=c)) + int(
                rng.integers(0, 10)
            )
            counts.append(c)
            vals.append(p)
        counts = np.array(counts, dtype=np.int64)
        flat = np.concatenate(vals)
        starts = np.cumsum(counts) - counts
        encoded = encode_positions_bulk(flat, starts)
        assert len(encoded) == n_rows
        # concatenated row slices decode back with per-row delta reset
        got = decode_positions(b"".join(encoded), counts)
        np.testing.assert_array_equal(got, flat)
        # any contiguous subsequence of rows decodes independently
        a, b = sorted(rng.integers(0, n_rows + 1, size=2))
        if a < b:
            got_ab = decode_positions(b"".join(encoded[a:b]), counts[a:b])
            np.testing.assert_array_equal(
                got_ab, np.concatenate(vals[a:b])
            )


def test_position_codec_rejects_nonascending():
    with pytest.raises(ValueError):
        encode_positions_bulk(
            np.array([3, 3], dtype=np.int64), np.array([0], dtype=np.int64)
        )


# ----------------------------------------------------- rank identity -----

PHRASES = [
    ("def return", 0),
    ("spark session builder", 0),
    ("return return", 0),          # repeated term: adjacency required
    ("import def", 0),
    ("def return", 1),
    ("def return", 2),
    ("spark session", 3),
]


@pytest.mark.parametrize("phrase,slop", PHRASES)
def test_positional_matches_verify_first(pidx, corpus, phrase, slop):
    vf = rows(
        pidx.match_phrase(
            phrase, corpus, k=10_000, source_text_col="content", slop=slop
        )
    )
    po = rows(pidx.match_phrase_positional(phrase, k=10_000, slop=slop))
    assert po == vf
    lo = lrows(pidx.match_phrase_local(phrase, k=10_000, slop=slop))
    assert lo == vf


def test_positional_topk_and_offset(pidx, corpus):
    phrase = "def return"
    full = rows(pidx.match_phrase(phrase, corpus, k=20, source_text_col="content"))
    assert rows(pidx.match_phrase_positional(phrase, k=20)) == full
    assert rows(pidx.match_phrase_positional(phrase, k=5, offset=5)) == full[5:10]
    assert lrows(pidx.match_phrase_local(phrase, k=5, offset=5)) == full[5:10]


def test_positional_single_term_equals_term_match(pidx):
    """A one-term 'phrase' is just the term match (require_all on one
    term) — same contract as the verify-first path."""
    po = rows(pidx.match_phrase_positional("def", k=50))
    se = [
        (r["doc_id"], r["score"])
        for r in pidx.search("def", k=50, require_all=True).collect()
    ]
    assert po == se


def test_positional_absent_term_empty(pidx):
    assert rows(pidx.match_phrase_positional("def zzznotindexed")) == []
    assert lrows(pidx.match_phrase_local("def zzznotindexed")) == []


def test_positional_rejects_empty_phrase(pidx):
    with pytest.raises(ValueError):
        pidx.match_phrase_positional("!!!")


def test_freqs_index_refuses_positional(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fidx"))
    build_index(
        spark, corpus, out, attr_cols=("repo",),
        n_shards=2, block_size=16, salt_threshold=120, n_salts=4,
    )
    idx = CompressedIndex(spark, out)
    assert idx.meta.index_options == "freqs"
    with pytest.raises(ValueError):
        idx.match_phrase_positional("def return")
    # and the pos_enc column of a freqs build is all-null (no dead bytes)
    nn = (
        idx.postings.where(F.col("pos_enc").isNotNull()).limit(1).count()
    )
    assert nn == 0


def test_append_preserves_positions(spark, corpus, tmp_path_factory):
    """append_batch to a positional index must carry positions for the
    appended docs (and rebuilt shards), so phrase queries stay identical
    to a fresh positional build of the combined corpus."""
    from librecatastro_spark.streaming.incremental import append_batch

    base = corpus.where(F.col("doc_id") < 300)
    extra = corpus.where(F.col("doc_id") >= 300)
    out = str(tmp_path_factory.mktemp("apposidx"))
    build_index(
        spark, base, out, attr_cols=("repo", "path", "lang"),
        n_shards=4, block_size=16, salt_threshold=120, n_salts=4,
        index_options="positions",
    )
    n = append_batch(spark, out, extra)
    assert n == extra.count()
    idx = CompressedIndex(spark, out)
    ref = str(tmp_path_factory.mktemp("refposidx"))
    build_index(
        spark, corpus, ref, attr_cols=("repo", "path", "lang"),
        n_shards=4, block_size=16, salt_threshold=120, n_salts=4,
        index_options="positions",
    )
    fresh = CompressedIndex(spark, ref)
    for phrase, slop in (("def return", 0), ("def return", 1)):
        a = rows(idx.match_phrase_positional(phrase, k=10_000, slop=slop))
        b = rows(fresh.match_phrase_positional(phrase, k=10_000, slop=slop))
        # FULL (doc_id, score) row equality: append merges term stats, so
        # df/cf/avgdl — and therefore every BM25 weight — must equal the
        # fresh build's exactly; a set-only check would let score/rank
        # drift after append_batch go undetected (r3 ADVICE)
        assert a == b and a


# ------------------------------------------- match_phrase_prefix (r4) ----

PREFIX_QUERIES = [
    "def re",       # hot complete term + hot prefix
    "spark sessio", # selective: exactly one matching doc
    "import d",
    "def return",   # prefix == a complete indexed term
    "return retu",  # repeated-stem: complete term also matches pfx
]


@pytest.mark.parametrize("q", PREFIX_QUERIES)
def test_phrase_prefix_positional_matches_verify_first(pidx, corpus, q):
    """The index-only type-ahead path must be RANK-IDENTICAL to the
    verify-first match_phrase_prefix (scores included — both score BM25
    require_all over the complete terms only); the coordinator twin
    (match_phrase_prefix_local) likewise."""
    vf = rows(
        pidx.match_phrase_prefix(q, corpus, k=10_000, source_text_col="content")
    )
    po = rows(pidx.match_phrase_prefix_positional(q, k=10_000))
    assert po == vf and vf
    lo = lrows(pidx.match_phrase_prefix_local(q, k=10_000))
    assert lo == vf


def test_phrase_prefix_local_single_token_and_offset(pidx):
    a = lrows(pidx.match_phrase_prefix_local("retu", k=15))
    b = rows(pidx.term_prefix_search("retu", k=15))
    assert a == b and a
    full = rows(pidx.match_phrase_prefix_positional("def re", k=20))
    assert lrows(pidx.match_phrase_prefix_local("def re", k=5, offset=5)) == full[5:10]


def test_phrase_prefix_positional_topk_offset_and_edges(pidx, corpus):
    full = rows(
        pidx.match_phrase_prefix(
            "def re", corpus, k=20, source_text_col="content"
        )
    )
    assert rows(pidx.match_phrase_prefix_positional("def re", k=20)) == full
    assert (
        rows(pidx.match_phrase_prefix_positional("def re", k=5, offset=5))
        == full[5:10]
    )
    # single token routes to term_prefix_search (constant score, id ASC)
    a = rows(pidx.match_phrase_prefix_positional("retu", k=15))
    b = rows(pidx.term_prefix_search("retu", k=15))
    assert a == b and a
    # absent complete term / absent prefix -> empty
    assert rows(pidx.match_phrase_prefix_positional("zzznope re")) == []
    assert rows(pidx.match_phrase_prefix_positional("def zzznope")) == []
    with pytest.raises(ValueError):
        pidx.match_phrase_prefix_positional("!!!")


def test_freqs_index_refuses_phrase_prefix_positional(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fidx2"))
    build_index(
        spark, corpus, out, attr_cols=("repo",),
        n_shards=2, block_size=16, salt_threshold=120, n_salts=4,
    )
    idx = CompressedIndex(spark, out)
    with pytest.raises(ValueError):
        idx.match_phrase_prefix_positional("def re")


def test_positional_build_is_rank_identical_on_keyword_queries(pidx, spark):
    """Positions must not perturb the non-phrase query surface: BM25
    top-k over the positional index equals the same query over a freqs
    index of the same corpus (same params) — asserted via the exact
    scorer's contract queries on both paths."""
    a = rows(pidx.search("def return", k=10))
    b = lrows(pidx.search_local("def return", k=10))
    assert a == b


def test_single_token_type_ahead_offset_pages(pidx, corpus):
    """r5 regression: the single-token routes of all four type-ahead
    paths must THREAD their offset (they silently dropped it, so page 2
    repeated page 1). All pages tile against the un-paged prefix
    contract (constant score 1.0, doc_id ASC)."""
    full = rows(pidx.term_prefix_search("re", k=20))
    assert len(full) > 10
    want = full[5:10]
    assert rows(pidx.term_prefix_search("re", k=5, offset=5)) == want
    assert rows(
        pidx.match_phrase_prefix_positional("re", k=5, offset=5)
    ) == want
    assert lrows(pidx.match_phrase_prefix_local("re", k=5, offset=5)) == want
    assert rows(
        pidx.match_phrase_prefix(
            "re", corpus, k=5, offset=5, source_text_col="content"
        )
    ) == want


def test_phrase_local_volume_routing(pidx, monkeypatch):
    """Cost-based routing (r5): the coordinator phrase twins route to
    the distributed kernel when the estimated decode volume (Σ df)
    exceeds the cap — results identical on BOTH routes at every
    threshold, so only latency ever changes."""
    want = lrows(pidx.match_phrase_local("def return", k=25))
    want_pp = lrows(pidx.match_phrase_prefix_local("def re", k=25))
    for cap in ("0", "1000000000"):
        monkeypatch.setenv("LC_PHRASE_LOCAL_MAX_POSTINGS", cap)
        assert lrows(pidx.match_phrase_local("def return", k=25)) == want
        assert lrows(
            pidx.match_phrase_prefix_local("def re", k=25)
        ) == want_pp
    monkeypatch.delenv("LC_PHRASE_LOCAL_MAX_POSTINGS")
    # the estimator is window-share × total occurrences
    # ((min df / N) × Σ cf): a hot-hot phrase estimates far above a
    # hot+rare one (the rare window skips the hot blocks), and an
    # unindexed term estimates 0 (empty result, instant local answer)
    hot = pidx._phrase_decode_estimate(["def", "return"])
    mixed = pidx._phrase_decode_estimate(["def", "spark"])
    assert 0 < mixed < hot
    assert pidx._phrase_decode_estimate(["def", "zzznotindexed"]) == 0
