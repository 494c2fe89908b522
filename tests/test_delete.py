"""delete_batch / update_batch — the index write-API completion.

Contract: a delete CONVERGES IMMEDIATELY to the batch build of the
remaining corpus, bit-for-bit (N, avgdl, df all updated — stronger than
ES/Lucene tombstones, which leave stats stale until merge). Crash safety
is roll-forward: recover_index completes a crashed delete from any
injected crash point, and the result still equals the fresh build.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index, read_meta
from librecatastro_spark.streaming.incremental import (
    _InjectedCrash,
    delete_batch,
    recover_index,
    update_batch,
)

QUERIES = ("def return", "class self", "import")
DEAD = list(range(0, 300, 7))

BUILD_KW = dict(
    attr_cols=("repo", "lang"), n_shards=4, block_size=16,
    salt_threshold=120, n_salts=4,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_corpus(spark, 300, min_tokens=20, max_tokens=120, partitions=4)
    return assign_doc_ids(docs).cache()


@pytest.fixture(scope="module")
def ref_idx(spark, corpus, tmp_path_factory):
    """Fresh build of the corpus MINUS the victims — the convergence
    target every delete below must equal bit-for-bit."""
    out = str(tmp_path_factory.mktemp("refdel"))
    remaining = corpus.where(~F.col("doc_id").isin(DEAD))
    build_index(spark, remaining, out, **BUILD_KW)
    return CompressedIndex(spark, out)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def assert_converged(spark, out, ref_idx):
    idx = CompressedIndex(spark, out)
    assert idx.meta.n_docs == ref_idx.meta.n_docs
    assert idx.meta.avgdl == pytest.approx(ref_idx.meta.avgdl, abs=1e-12)
    for q in QUERIES:
        assert rows(idx.search(q, k=10_000)) == rows(ref_idx.search(q, k=10_000))
        lo = idx.search_local(q, k=10_000)
        assert list(zip(lo["doc_id"], lo["score"])) == rows(
            ref_idx.search(q, k=10_000)
        )


def test_delete_converges_to_fresh_build(spark, corpus, ref_idx, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, **BUILD_KW)
    n = delete_batch(spark, out, DEAD)
    assert n == len([d for d in DEAD if d < 300])
    assert_converged(spark, out, ref_idx)
    # deleting the same ids again is a no-op
    assert delete_batch(spark, out, DEAD) == 0
    # unknown ids are ignored
    assert delete_batch(spark, out, [99999, 123456]) == 0


@pytest.mark.parametrize(
    "step", ["wal", "stats", "staged", "attrs", "meta", "blocks"]
)
def test_delete_crash_recovery_rolls_forward(
    spark, corpus, ref_idx, tmp_path, step
):
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, **BUILD_KW)
    with pytest.raises(_InjectedCrash):
        delete_batch(spark, out, DEAD, _fail_after=step)
    assert recover_index(spark, out)  # roll-forward completes the delete
    assert not os.path.exists(os.path.join(out, "_pending_delete.json"))
    assert_converged(spark, out, ref_idx)


def test_delete_dataframe_ids(spark, corpus, ref_idx, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, **BUILD_KW)
    ids_df = spark.createDataFrame([(int(i),) for i in DEAD], "doc_id long")
    assert delete_batch(spark, out, ids_df) == len(DEAD)
    assert_converged(spark, out, ref_idx)


def test_update_batch_last_write_wins(spark, corpus, tmp_path):
    """Replace a doc's content; queries must reflect ONLY the new text,
    and the index must equal a fresh build of the updated corpus."""
    out = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    build_index(spark, corpus, out, **BUILD_KW)
    new_rows = corpus.where(F.col("doc_id") < 5).withColumn(
        "content", F.concat(F.col("content"), F.lit(" zzzupdated marker"))
    )
    n_rep, n_idx = update_batch(spark, out, new_rows)
    assert n_rep == 5 and n_idx == 5
    updated = corpus.where(F.col("doc_id") >= 5).unionByName(new_rows)
    build_index(spark, updated, ref, **BUILD_KW)
    idx, fidx = CompressedIndex(spark, out), CompressedIndex(spark, ref)
    assert idx.meta.n_docs == fidx.meta.n_docs
    # the marker term finds exactly the updated docs, on both
    got = rows(idx.search("zzzupdated", k=100))
    assert {d for d, _ in got} == {0, 1, 2, 3, 4}
    assert got == rows(fidx.search("zzzupdated", k=100))
    for q in QUERIES:
        assert rows(idx.search(q, k=10_000)) == rows(fidx.search(q, k=10_000))


def test_delete_on_positional_index(spark, corpus, tmp_path):
    """Deletes preserve positions: phrase queries over the shrunk index
    equal a fresh positional build of the remaining corpus."""
    out = str(tmp_path / "pidx")
    ref = str(tmp_path / "pref")
    build_index(spark, corpus, out, index_options="positions", **BUILD_KW)
    delete_batch(spark, out, DEAD)
    remaining = corpus.where(~F.col("doc_id").isin(DEAD))
    build_index(spark, remaining, ref, index_options="positions", **BUILD_KW)
    idx, fidx = CompressedIndex(spark, out), CompressedIndex(spark, ref)
    assert read_meta(out).index_options == "positions"
    for phrase in ("def return", "class self"):
        assert rows(idx.match_phrase_positional(phrase, k=10_000)) == rows(
            fidx.match_phrase_positional(phrase, k=10_000)
        )
