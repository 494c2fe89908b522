"""Randomized rank-identity sweep over the three scoring paths.

The golden-query tests (test_fastpath.py, test_wand.py) pin a handful of
fixed shapes; this sweep draws ~30 seeded pseudo-random queries against a
skewed synthetic corpus and asserts, for every one of them:

    distributed per-shard pass  ==  coordinator whole-index pass

and, for the pure-match subset, both == ExactBM25 (the exactness oracle).

Why it matters: the two production passes prune with DIFFERENT θ (the
whole-index pass sees the global k-th bound, each shard only its own), so
their kept/pruned block splits differ per query. The scorer guarantees
bit-identical per-doc floats anyway by accumulating every doc's sum in
canonical term order and recomputing patched docs from scratch in that
same order (engine/wand.py _shard_topk_fn) — a property a fixed golden
set can under-exercise because it depends on where θ lands relative to
block bounds, which varies with query mix, k, and term frequencies.

The index is built with tiny blocks and a low salt threshold so block
pruning, block patching, and the salted sub-range layout all trigger at
400 docs.
"""

from __future__ import annotations

import random

import pytest

from librecatastro_spark.corpus import _COMMON, assign_doc_ids, generate_corpus
from librecatastro_spark.engine import ExactBM25
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index

ATTRS = ("lang", "repo")
N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return assign_doc_ids(
        generate_corpus(spark, N_DOCS, min_tokens=30, max_tokens=150,
                        partitions=4)
    ).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rand_sweep") / "idx")
    build_index(
        spark, corpus, out, id_col="doc_id", text_col="content",
        attr_cols=ATTRS, n_shards=4, shards_per_job=4, block_size=8,
        salt_threshold=64, n_salts=4, resume=False,
    )
    return CompressedIndex(spark, out)


def _queries(n: int, seed: int = 20260819) -> list[dict]:
    """Seeded pseudo-random query shapes over the generator's vocabulary:
    hot stop-terms (def/return/...), mid-frequency identifiers, and the
    ultra-rare uid tail, across k values that put θ above, inside, and
    below typical block-bound ranges."""
    rng = random.Random(seed)
    hot = _COMMON[:20]
    mid = [f"id{i:04d}" for i in range(0, 60)]
    rare = [f"uid{rng.randrange(50000):05d}" for _ in range(8)]
    pool = hot * 3 + mid + rare  # skew draws toward hot terms
    out = []
    for _ in range(n):
        terms = rng.sample(pool, rng.randint(1, 4))
        q: dict = {"text": " ".join(terms), "k": rng.choice([3, 10, 50])}
        shape = rng.random()
        if shape < 0.15:
            q["require_all"] = True
        elif shape < 0.30:
            q["must_not_text"] = rng.choice(hot + mid)
        elif shape < 0.40:
            q["should_text"] = rng.choice(hot)
        elif shape < 0.50:
            q["offset"] = rng.choice([3, 10])
        elif shape < 0.60:
            q["filters"] = {"lang": rng.choice(["py", "java", "go"])}
        out.append(q)
    return out


def _spark_rows(index, q):
    q = dict(q)
    text, k = q.pop("text"), q.pop("k")
    return [(r["doc_id"], r["score"])
            for r in index.search(text, k=k, **q).collect()]


def _local_rows(index, q):
    q = dict(q)
    text, k = q.pop("text"), q.pop("k")
    pdf = index.search_local(text, k=k, **q)
    return list(zip(pdf["doc_id"].tolist(), pdf["score"].tolist()))


def test_random_sweep_local_matches_distributed(index):
    for q in _queries(30):
        assert _local_rows(index, q) == _spark_rows(index, q), q


def test_random_sweep_match_queries_match_exact(spark, corpus, index):
    exact = ExactBM25(corpus, id_col="doc_id", text_col="content",
                      attr_cols=ATTRS)
    for q in _queries(30):
        if set(q) != {"text", "k"}:
            continue  # exactness oracle: pure-match shapes only
        want = [(r["doc_id"], r["score"])
                for r in exact.search(q["text"], k=q["k"]).collect()]
        assert _local_rows(index, q) == want, q
