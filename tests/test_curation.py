"""Incremental curation (streaming/curation.py): batch-by-batch dedup
against accumulated state must converge to the one-shot pipeline, be
idempotent under replay, recover from a crash between state writes and
the commit marker, and reject non-monotone batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from librecatastro_spark.ops.pipeline import training_data_pipeline
from librecatastro_spark.streaming.curation import (
    _committed,
    accepted_docs,
    curate_batch,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    if not os.path.exists(f"{SF_DIR}/documents.parquet"):
        pytest.skip("driver testdata not present")
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_two_batches_converge_to_one_shot(spark, corpus, tmp_path):
    state = str(tmp_path / "state")
    n = corpus.agg(F.max("doc_id")).collect()[0][0]
    cut = n // 3  # uneven split: batch 2 must dedup against batch 1
    b1 = corpus.where(F.col("doc_id") <= cut)
    b2 = corpus.where(F.col("doc_id") > cut)
    a1 = _rows(curate_batch(spark, state, b1))
    a2 = _rows(curate_batch(spark, state, b2))
    assert a1 and a2 and not (a1 & a2)
    one_shot = _rows(training_data_pipeline(corpus))
    assert a1 | a2 == one_shot
    assert _rows(accepted_docs(spark, state)) == one_shot


def test_replay_is_idempotent(spark, corpus, tmp_path):
    state = str(tmp_path / "state")
    b1 = corpus.where(F.col("doc_id") <= 100)
    first = _rows(curate_batch(spark, state, b1))
    replay = _rows(curate_batch(spark, state, b1))  # resent batch
    assert first and replay == set()
    assert _rows(accepted_docs(spark, state)) == first
    assert len(_committed(state)) == 1


def test_crash_before_commit_recovers(spark, corpus, tmp_path):
    state = str(tmp_path / "state")
    b1 = corpus.where(F.col("doc_id") <= 100)
    b2 = corpus.where((F.col("doc_id") > 100) & (F.col("doc_id") <= 200))
    curate_batch(spark, state, b1)
    curate_batch(spark, state, b2)
    # simulate a crash: batch-2 state fully written but the marker lost
    markers = [f for f in os.listdir(state) if f.startswith("_commit_")]
    victim = sorted(markers)[-1]
    os.remove(os.path.join(state, victim))
    assert len(_committed(state)) == 1
    # replaying batch 2 must purge the orphan dirs and re-commit cleanly
    redo = _rows(curate_batch(spark, state, b2))
    full = _rows(
        training_data_pipeline(corpus.where(F.col("doc_id") <= 200))
    )
    assert _rows(accepted_docs(spark, state)) == full
    assert redo <= full and len(_committed(state)) == 2


def test_non_monotone_batch_raises(spark, corpus, tmp_path):
    state = str(tmp_path / "state")
    curate_batch(spark, state, corpus.where(F.col("doc_id").between(50, 100)))
    with pytest.raises(ValueError, match="non-monotone"):
        curate_batch(spark, state, corpus.where(F.col("doc_id") < 50))


def test_curate_then_index_end_to_end(spark, corpus, tmp_path):
    """The full production loop — crawl batches → incremental curation →
    incremental index append → query — converges to building the index
    once over the one-shot-curated corpus: identical (doc_id, score)
    top-k on the golden query."""
    from librecatastro_spark.engine.wand import CompressedIndex
    from librecatastro_spark.index.builder import build_index
    from librecatastro_spark.streaming.incremental import append_batch

    state = str(tmp_path / "state")
    inc_idx = str(tmp_path / "inc_idx")
    ref_idx = str(tmp_path / "ref_idx")
    n = corpus.agg(F.max("doc_id")).collect()[0][0]
    kw = dict(id_col="doc_id", text_col="text")
    common = dict(
        attr_cols=("lang", "source"), n_shards=2, shards_per_job=2,
        resume=False, **kw,
    )

    first = True
    for batch in (
        corpus.where(F.col("doc_id") <= n // 2),
        corpus.where(F.col("doc_id") > n // 2),
    ):
        acc = curate_batch(spark, state, batch)
        docs = batch.join(acc.select("doc_id"), "doc_id", "left_semi")
        if first:
            build_index(spark, docs, inc_idx, **common)
            first = False
        else:
            append_batch(spark, inc_idx, docs, **kw)

    one_shot = training_data_pipeline(corpus).select("doc_id")
    build_index(
        spark, corpus.join(one_shot, "doc_id", "left_semi"), ref_idx, **common
    )
    got = CompressedIndex(spark, inc_idx).search("spark join merge", k=10).collect()
    want = CompressedIndex(spark, ref_idx).search("spark join merge", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ] and len(got) > 0
