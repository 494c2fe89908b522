"""Index build: roundtrip vs staged truth, resume idempotence, sha invariant,
parallelism-independence of the built blocks."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
from librecatastro_spark.index.builder import (
    build_index,
    load_attrs,
    load_postings,
    load_staged_postings,
    manifest_records,
    read_meta,
    verify_content_sha,
)
from librecatastro_spark.index.codec import decode_block


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_corpus(spark, 300, min_tokens=20, max_tokens=120, partitions=4)
    return assign_doc_ids(docs).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    meta = build_index(
        spark, corpus, out,
        attr_cols=("repo", "path", "lang", "content_sha256"),
        n_shards=4, block_size=16, salt_threshold=150, n_salts=4,
        shards_per_job=2,
    )
    return out, meta


def test_meta_and_manifest(built):
    out, meta = built
    assert meta.n_docs == 300
    recs = manifest_records(out)
    assert "stage" in recs
    assert {"shards_0_1", "shards_2_3"} <= set(recs)
    assert read_meta(out).avgdl == pytest.approx(meta.avgdl)


def test_blocks_roundtrip_to_staged_truth(spark, built):
    """Decoding every block reproduces exactly the staged (term, doc_id, tf)."""
    out, meta = built
    blocks = load_postings(spark, out).collect()
    got = set()
    for b in blocks:
        ids, tfs = decode_block(bytes(b["docs_enc"]), bytes(b["tfs_enc"]))
        assert len(ids) == b["n_docs"] <= meta.block_size
        assert ids[0] == b["first_doc_id"] and ids[-1] == b["last_doc_id"]
        assert np.all(np.diff(ids) > 0)
        for i, t in zip(ids.tolist(), tfs.tolist()):
            got.add((b["term"], i, t))
    truth = {
        (r["term"], r["doc_id"], r["tf"])
        for r in load_staged_postings(spark, out).collect()
    }
    assert got == truth


def test_salting_applied_to_hot_terms(spark, built):
    out, meta = built
    blocks = load_postings(spark, out)
    hot = blocks.groupBy("term").agg(F.countDistinct("salt").alias("s"))
    assert hot.where(F.col("s") > 1).count() > 0  # zipfian head got salted
    # per-salt doc ranges are disjoint within (shard, term)
    rows = (
        blocks.groupBy("shard", "term", "salt")
        .agg(F.min("first_doc_id").alias("lo"), F.max("last_doc_id").alias("hi"))
        .collect()
    )
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r["shard"], r["term"]), []).append((r["salt"], r["lo"], r["hi"]))
    for spans in by_key.values():
        spans.sort()
        for (_, _, hi1), (_, lo2, _) in zip(spans, spans[1:]):
            assert hi1 < lo2


def test_content_sha_invariant(spark, corpus, built):
    out, _ = built
    assert verify_content_sha(corpus, spark, out) is True
    # negative: corrupting one row must be detected
    bad = corpus.withColumn(
        "content_sha256",
        F.when(F.col("doc_id") == 7, F.lit("deadbeef")).otherwise(F.col("content_sha256")),
    )
    assert verify_content_sha(bad, spark, out) is False


def test_resume_skips_done_and_finishes_missing(spark, corpus, built, tmp_path):
    out, meta = built
    # simulate a crash after shard group 0: delete group 1's manifest + data
    os.remove(os.path.join(out, "_manifest", "shards_2_3.json"))
    import shutil

    shutil.rmtree(os.path.join(out, "postings", "shard=3"))
    before = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(out, "postings", "shard=0", "*.parquet"))}
    build_index(
        spark, corpus, out,
        attr_cols=("repo", "path", "lang", "content_sha256"),
        n_shards=4, block_size=16, salt_threshold=150, n_salts=4,
        shards_per_job=2,
    )
    after = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(out, "postings", "shard=0", "*.parquet"))}
    assert before == after  # completed unit untouched
    assert "shards_2_3" in manifest_records(out)
    # and the rebuilt shard is complete again
    assert load_postings(spark, out).where(F.col("shard") == 3).count() > 0


def test_build_is_parallelism_independent(spark, corpus, built, tmp_path):
    """Same corpus at different partitioning → identical block bytes."""
    out1, _ = built
    out2 = str(tmp_path / "idx2")
    build_index(
        spark, corpus.repartition(13), out2,
        attr_cols=("repo", "path", "lang", "content_sha256"),
        n_shards=4, block_size=16, salt_threshold=150, n_salts=4,
        shards_per_job=4,
    )

    def block_set(out):
        return {
            (r["shard"], r["term"], r["salt"], r["block_seq"],
             bytes(r["docs_enc"]), bytes(r["tfs_enc"]), round(r["block_max_w"], 9))
            for r in load_postings(spark, out).collect()
        }

    assert block_set(out1) == block_set(out2)


def test_attrs_table_complete(spark, corpus, built):
    out, meta = built
    attrs = load_attrs(spark, out)
    assert attrs.count() == 300
    assert attrs.select(F.countDistinct("doc_id")).collect()[0][0] == 300
    # dl deliberately absent: doc lengths travel inside the posting blocks
    assert set(attrs.columns) >= {"doc_id", "repo", "path", "lang", "content_sha256", "shard"}


def test_assign_term_ids_unique_dense_deterministic(spark):
    """tid invariants the stage-2 numeric grouped map depends on: unique
    per term, dense [0, vocab), and identical across partitionings."""
    from librecatastro_spark.index.builder import assign_term_ids

    terms = [f"tok{i:04d}" for i in range(500)]
    ts = spark.createDataFrame(
        [(t, i % 7 + 1, i % 11 + 1) for i, t in enumerate(terms)],
        "term string, df long, cf long",
    )
    a = {r["term"]: r["tid"] for r in assign_term_ids(ts).collect()}
    assert sorted(a.values()) == list(range(500))
    b = {r["term"]: r["tid"] for r in assign_term_ids(ts.repartition(17)).collect()}
    assert a == b


def test_posting_files_term_sorted(built):
    """Regression: the dynamic-partition parquet writer inserts its own
    NON-STABLE shard sort when the explicit sort doesn't lead with the
    partition column, silently scrambling term order inside every file
    (and with it all row-group term-stats pruning — the term-dictionary
    seek). Assert every postings file is term-sorted with monotone
    row-group [min, max] term ranges."""
    import pyarrow.parquet as pq

    out, _ = built
    files = glob.glob(os.path.join(out, "postings", "**", "*.parquet"),
                      recursive=True)
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        rg0 = md.row_group(0)
        tcol = next(
            j for j in range(rg0.num_columns)
            if rg0.column(j).path_in_schema == "term"
        )
        mins, maxs = [], []
        for i in range(md.num_row_groups):
            s = md.row_group(i).column(tcol).statistics
            assert s is not None and s.has_min_max
            mins.append(s.min)
            maxs.append(s.max)
        assert mins == sorted(mins), f
        assert maxs == sorted(maxs), f
        terms = pq.read_table(f, columns=["term"]).column("term").to_pylist()
        assert terms == sorted(terms), f


def test_materialize_corpus_layout_and_values(spark, tmp_path):
    """materialize_corpus writes bounded-size files WITHOUT changing any
    row value or doc_id vs the in-memory generation path (file layout is
    performance-only: unsplittable giant row groups caused the stage-1
    sort-spill cliff — see materialize_corpus docstring)."""
    from librecatastro_spark.corpus import (
        assign_doc_ids,
        generate_corpus,
        materialize_corpus,
    )

    out = str(tmp_path / "corpus")
    materialize_corpus(spark, 500, out, target_file_bytes=64 << 10)
    files = glob.glob(os.path.join(out, "*.parquet"))
    # bounded-size layout: many small files, none a giant unsplittable blob
    assert len(files) >= 8
    assert max(os.path.getsize(f) for f in files) < (64 << 10) * 8
    got = {
        (r["doc_id"], r["content_sha256"])
        for r in spark.read.parquet(out).select("doc_id", "content_sha256").collect()
    }
    want = {
        (r["doc_id"], r["content_sha256"])
        for r in assign_doc_ids(generate_corpus(spark, 500))
        .select("doc_id", "content_sha256")
        .collect()
    }
    assert got == want and len(got) == 500


def test_corpus_cache_manifest_validation(spark, tmp_path):
    """A cached corpus dir is only reusable when its manifest matches the
    current generator version AND the exact (n_docs, seed) — anything
    else (pre-versioning dir, different size, partial write) is stale;
    a silently reused stale corpus changes what the bench queries measure
    without any error (e.g. a pre-uid corpus zeroes q_must_selective's
    uid term df)."""
    import json as _json

    from librecatastro_spark.corpus import (
        CORPUS_VERSION,
        corpus_cache_valid,
        materialize_corpus,
    )

    out = str(tmp_path / "ccorpus")
    assert corpus_cache_valid(out, 300) is False  # nothing there yet
    materialize_corpus(spark, 300, out, target_file_bytes=64 << 10)
    assert corpus_cache_valid(out, 300) is True
    assert corpus_cache_valid(out, 400) is False  # different size
    assert corpus_cache_valid(out, 300, seed=7) is False  # different seed
    mpath = os.path.join(out, "_corpus_manifest.json")
    with open(mpath) as fh:
        m = _json.load(fh)
    assert m["corpus_version"] == CORPUS_VERSION
    m["corpus_version"] -= 1  # corpus written by an older generator
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    assert corpus_cache_valid(out, 300) is False
    os.remove(mpath)  # pre-versioning / crashed-mid-write dir
    assert corpus_cache_valid(out, 300) is False
