from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
from librecatastro_spark.engine import ExactBM25
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index, load_term_stats
from librecatastro_spark.ops.multimodal import (
    decode_image_stub,
    extract_features,
    resize_meta,
    sample_frames,
    synthetic_media,
)
from librecatastro_spark.streaming.incremental import append_batch, stream_into_index

ATTRS = ("repo", "path", "lang")


@pytest.fixture(scope="module")
def corpus(spark):
    docs = generate_corpus(spark, 260, min_tokens=20, max_tokens=100, partitions=4)
    return assign_doc_ids(docs).cache()


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_incremental_append_matches_full_rebuild(spark, corpus, tmp_path):
    out = str(tmp_path / "incr_idx")
    first = corpus.where(F.col("doc_id") < 200)
    rest = corpus.where(F.col("doc_id") >= 200)
    build_index(spark, first, out, attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    added = append_batch(spark, out, rest, id_col="doc_id", text_col="content")
    assert added == 60
    # idempotence: replay is a no-op (A16 skip-if-present)
    assert append_batch(spark, out, rest, id_col="doc_id", text_col="content") == 0

    exact = ExactBM25(corpus, attr_cols=ATTRS)
    idx = CompressedIndex(spark, out)
    for q in ["def return import", "spark session", "id0003", "partition shuffle"]:
        assert rows(idx.search(q, k=10)) == rows(exact.search(q, k=10)), q
    assert idx.meta.n_docs == 260


def test_append_touches_only_batch_and_touched_shards(spark, corpus, tmp_path):
    """Scale property of the additive stats merge: an append must never
    re-read untouched shards' staged postings. Proven destructively — an
    untouched staged partition is DELETED before the append; the append
    still succeeds and global term_stats stay correct (they come from the
    old stats table + batch deltas, not from re-aggregating staged)."""
    import shutil

    out = str(tmp_path / "touch_idx")
    first = corpus.where(F.col("doc_id") < 200)
    rest = corpus.where(F.col("doc_id") >= 200)  # lands in tail shards only
    build_index(spark, first, out, attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    before = {
        r["term"]: (r["df"], r["cf"])
        for r in load_term_stats(spark, out).collect()
    }
    # shard 0 holds doc_ids far below 200 — untouched by the append
    shutil.rmtree(f"{out}/_stage/postings/shard=0")
    assert append_batch(spark, out, rest, id_col="doc_id", text_col="content") == 60
    after = {
        r["term"]: (r["df"], r["cf"])
        for r in load_term_stats(spark, out).collect()
    }
    # stats merged additively: nothing lost from the deleted partition,
    # batch deltas folded in
    assert set(before) <= set(after)
    assert all(after[t][0] >= df for t, (df, _) in before.items())
    exact = ExactBM25(corpus, attr_cols=ATTRS)
    idx = CompressedIndex(spark, out)
    assert rows(idx.search("def return import", k=10)) == rows(
        exact.search("def return import", k=10)
    )


def test_append_with_zero_token_doc_converges(spark, corpus, tmp_path):
    """ADVICE r1: n_docs/avgdl must count zero-token docs exactly like the
    batch build (N = all docs, avgdl = Σcf/N), and empty docs must get
    attrs rows (sha invariant + anti-join idempotence)."""
    out = str(tmp_path / "zt_idx")
    empty = spark.createDataFrame(
        [(9000, "r", "p", "py", "", "c", "sha")],
        "doc_id long, repo string, path string, lang string, content string,"
        " commit string, content_sha256 string",
    )
    full = corpus.unionByName(empty.select(*corpus.columns))
    out_batch = str(tmp_path / "zt_batch")
    build_index(spark, full, out_batch, attr_cols=ATTRS, n_shards=4,
                block_size=16, salt_threshold=100, n_salts=4)
    build_index(spark, corpus, out, attr_cols=ATTRS, n_shards=4,
                block_size=16, salt_threshold=100, n_salts=4)
    assert append_batch(spark, out, empty, id_col="doc_id",
                        text_col="content") == 1
    m_incr = CompressedIndex(spark, out).meta
    m_batch = CompressedIndex(spark, out_batch).meta
    assert m_incr.n_docs == m_batch.n_docs == 261
    assert abs(m_incr.avgdl - m_batch.avgdl) < 1e-9
    # the empty doc has an attrs row (anti-join treats it as indexed)
    attrs = spark.read.parquet(f"{out}/attrs")
    assert attrs.where(F.col("doc_id") == 9000).count() == 1
    assert append_batch(spark, out, empty, id_col="doc_id",
                        text_col="content") == 0  # idempotent


def test_stream_into_index(spark, corpus, tmp_path):
    out = str(tmp_path / "s_idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    first = corpus.where(F.col("doc_id") < 200)
    build_index(spark, first, out, attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    schema = ("repo string, path string, lang string, content string, "
              "commit string, content_sha256 string, doc_id long")
    corpus.where(F.col("doc_id") >= 200).select(
        "repo", "path", "lang", "content", "commit", "content_sha256", "doc_id"
    ).write.mode("overwrite").parquet(src)
    q = stream_into_index(spark, out, src, schema, id_col="doc_id",
                          text_col="content", checkpoint_dir=ckpt)
    q.awaitTermination(120)
    idx = CompressedIndex(spark, out)
    assert idx.meta.n_docs == 260
    exact = ExactBM25(corpus, attr_cols=ATTRS)
    assert rows(idx.search("def return", k=10)) == rows(exact.search("def return", k=10))


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r["feature"] for r in feats}
    assert all(len(v) == 16 for v in by_id.values())
    # deterministic: same payload bytes → same features
    feats2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert by_id == feats2

    sized = {r["media_id"]: r["target"] for r in resize_meta(media, 128).collect()}
    for r in media.collect():
        t = sized[r["media_id"]]
        assert max(t["width"], t["height"]) <= 128
        assert t["width"] <= r["meta"]["width"] and t["height"] <= r["meta"]["height"]

    frames = sample_frames(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == 10  # one third are videos
    for r in got:
        assert r["count"] >= 5  # ≥5s duration → ≥5 sampled frames

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"notreal")


def test_windowed_event_counts_stream_equals_batch(spark, tmp_path):
    """The SAME windowed-agg plan runs as a batch job and as a Structured
    Streaming query (watermark is a no-op on batch); both must agree."""
    import datetime

    from librecatastro_spark.streaming.windowed import windowed_event_counts

    rows = []
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    for i in range(300):
        rows.append(
            (i, base + datetime.timedelta(minutes=7 * i), i % 5,
             f"t{i % 3}", float(i % 11))
        )
    schema = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double")
    src = str(tmp_path / "ev_src")
    df = spark.createDataFrame(rows, schema)
    # two files → two potential micro-batches
    df.where(F.col("event_id") < 150).write.mode("append").parquet(src)
    df.where(F.col("event_id") >= 150).write.mode("append").parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in windowed_event_counts(spark.read.parquet(src)).collect()
    }
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == batch and len(batch) > 10


def test_feature_rows_matches_vector_form(spark):
    from librecatastro_spark.ops.multimodal import feature_rows

    media = synthetic_media(spark, 12)
    vecs = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    rows_ = feature_rows(media).collect()
    assert len(rows_) == 12 * 16
    import numpy as np

    for r in rows_:
        # the exploded float64 value float32-rounds to the vector entry
        assert np.float32(r["value"]) == np.float32(vecs[r["media_id"]][r["dim"]])


def test_append_crash_recovery_all_fail_points(spark, corpus, tmp_path):
    """Crash-idempotence (ADVICE r2): kill the append after EVERY protocol
    step; the WAL rollback at the next append must restore the pre-batch
    state so the replay converges to the batch-built index — no duplicate
    staged rows, no double-counted df/cf, no phantom attrs."""
    from librecatastro_spark.streaming.incremental import (
        _InjectedCrash,
        recover_index,
    )

    first = corpus.where(F.col("doc_id") < 200)
    rest = corpus.where(F.col("doc_id") >= 200)
    out_ref = str(tmp_path / "crash_ref")
    build_index(spark, corpus, out_ref, attr_cols=ATTRS, n_shards=4,
                block_size=16, salt_threshold=100, n_salts=4)
    ref_stats = {r["term"]: (r["df"], r["cf"])
                 for r in load_term_stats(spark, out_ref).collect()}
    exact = ExactBM25(corpus, attr_cols=ATTRS)

    for point in ("wal", "staged", "stats", "meta", "blocks", "attrs"):
        out = str(tmp_path / f"crash_{point}")
        build_index(spark, first, out, attr_cols=ATTRS, n_shards=4,
                    block_size=16, salt_threshold=100, n_salts=4)
        with pytest.raises(_InjectedCrash):
            append_batch(spark, out, rest, id_col="doc_id",
                         text_col="content", _fail_after=point)
        assert os.path.exists(f"{out}/_pending_append.json"), point
        # replay (recovery runs inside); anti-join must re-admit the batch
        assert append_batch(spark, out, rest, id_col="doc_id",
                            text_col="content") == 60, point
        assert not os.path.exists(f"{out}/_pending_append.json"), point
        got = {r["term"]: (r["df"], r["cf"])
               for r in load_term_stats(spark, out).collect()}
        assert got == ref_stats, point  # additive stats, not double-counted
        staged = spark.read.parquet(f"{out}/_stage/postings")
        assert staged.count() == staged.dropDuplicates(["doc_id", "term"]).count(), point
        idx = CompressedIndex(spark, out)
        assert idx.meta.n_docs == 260, point
        for q in ["def return import", "id0003"]:
            assert rows(idx.search(q, k=10)) == rows(exact.search(q, k=10)), (point, q)
    # recovery on a healthy index is a no-op
    assert recover_index(spark, str(tmp_path / "crash_attrs")) is False


def test_append_stats_write_is_batch_sized(spark, corpus, tmp_path):
    """VERDICT r2 #7: per-batch stats write volume must be O(batch vocab),
    not O(global vocab) — the append adds ONE delta partition whose rows
    are exactly the batch's distinct terms."""
    from librecatastro_spark.index.builder import stats_delta_dirs
    from librecatastro_spark.stats import term_freqs_arrow

    out = str(tmp_path / "delta_idx")
    first = corpus.where(F.col("doc_id") < 200)
    rest = corpus.where(F.col("doc_id") >= 200)
    build_index(spark, first, out, attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    before = stats_delta_dirs(out)
    assert len(before) == 1
    append_batch(spark, out, rest, id_col="doc_id", text_col="content")
    after = stats_delta_dirs(out)
    assert len(after) == 2
    new_delta = [d for d in after if d not in before][0]
    batch_vocab = (
        term_freqs_arrow(rest.withColumnRenamed("doc_id", "doc_id"),
                         "doc_id", "content")
        .select("term").distinct().count()
    )
    assert spark.read.parquet(new_delta).count() == batch_vocab
    # merged view equals the batch-built aggregation
    merged = {r["term"]: (r["df"], r["cf"])
              for r in load_term_stats(spark, out).collect()}
    out_ref = str(tmp_path / "delta_ref")
    build_index(spark, corpus, out_ref, attr_cols=ATTRS, n_shards=4,
                block_size=16, salt_threshold=100, n_salts=4)
    ref = {r["term"]: (r["df"], r["cf"])
           for r in load_term_stats(spark, out_ref).collect()}
    assert merged == ref


def test_stats_compaction_preserves_stats_and_results(spark, corpus, tmp_path):
    """After COMPACT_AFTER deltas accumulate, the next append folds them
    into one generation; stats and search results are unchanged."""
    from librecatastro_spark.index.builder import stats_delta_dirs
    from librecatastro_spark.streaming.incremental import compact_term_stats

    out = str(tmp_path / "compact_idx")
    build_index(spark, corpus.where(F.col("doc_id") < 200), out,
                attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    # 6 appends of 10 docs each → 7 deltas
    for lo in range(200, 260, 10):
        batch = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10))
        assert append_batch(spark, out, batch, id_col="doc_id",
                            text_col="content") == 10
    assert len(stats_delta_dirs(out)) == 7
    before = {r["term"]: (r["df"], r["cf"])
              for r in load_term_stats(spark, out).collect()}
    assert compact_term_stats(spark, out, max_deltas=4) is True
    assert len(stats_delta_dirs(out)) == 1
    after = {r["term"]: (r["df"], r["cf"])
             for r in load_term_stats(spark, out).collect()}
    assert before == after
    exact = ExactBM25(corpus, attr_cols=ATTRS)
    idx = CompressedIndex(spark, out)
    assert rows(idx.search("def return import", k=10)) == rows(
        exact.search("def return import", k=10)
    )


def _flatten_to_legacy_layout(out: str) -> None:
    """Rewrite term_stats as the pre-delta FLAT layout (files directly in
    term_stats/, no delta= dirs) — what indexes built before the delta
    layout shipped look like on disk."""
    import shutil

    ts = os.path.join(out, "term_stats")
    d0 = os.path.join(ts, "delta=0")
    assert os.path.isdir(d0), "expected a delta-layout index to de-migrate"
    for f in os.listdir(d0):
        os.rename(os.path.join(d0, f), os.path.join(ts, f))
    os.rmdir(d0)
    shutil.rmtree(os.path.join(ts, "_delta0_tmp"), ignore_errors=True)


def test_append_onto_legacy_flat_stats_layout(spark, corpus, tmp_path):
    """Appending to a pre-delta index (flat term_stats/*.parquet) must
    migrate the flat base into delta=0 first — without the migration,
    delta-only readers would silently drop the ENTIRE pre-existing
    vocabulary and the touched-shard rebuild would delete every
    old-vocabulary posting from those shards."""
    from librecatastro_spark.index.builder import stats_delta_dirs

    out = str(tmp_path / "legacy_idx")
    first = corpus.where(F.col("doc_id") < 200)
    rest = corpus.where(F.col("doc_id") >= 200)
    build_index(spark, first, out, attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    _flatten_to_legacy_layout(out)
    # sanity: legacy layout reads correctly pre-append
    assert load_term_stats(spark, out).where(F.col("term") == "def").count() == 1

    assert append_batch(spark, out, rest, id_col="doc_id",
                        text_col="content") == 60
    dirs = [os.path.basename(d) for d in stats_delta_dirs(out)]
    assert dirs == ["delta=0", "delta=1"], dirs

    exact = ExactBM25(corpus, attr_cols=ATTRS)
    idx = CompressedIndex(spark, out)
    # old-vocabulary terms must still hit docs in the rebuilt shards
    for q in ["def return import", "spark session", "id0003"]:
        assert rows(idx.search(q, k=10)) == rows(exact.search(q, k=10)), q
    assert idx.meta.n_docs == 260


def test_term_stats_reads_exact_mid_migration(spark, corpus, tmp_path):
    """Every intermediate state of the flat→delta migration (flat
    remainder + _delta0_tmp + deltas) reads to the same stats — the file
    sets are disjoint, so the additive merge is exact at any crash point."""
    from librecatastro_spark.index.builder import (
        load_term_stats,
        migrate_flat_stats,
    )

    out = str(tmp_path / "midmig_idx")
    build_index(spark, corpus.where(F.col("doc_id") < 200), out,
                attr_cols=ATTRS, n_shards=4, block_size=16,
                salt_threshold=100, n_salts=4)
    want = {r["term"]: (r["df"], r["cf"])
            for r in load_term_stats(spark, out).collect()}
    _flatten_to_legacy_layout(out)
    ts = os.path.join(out, "term_stats")
    # simulate a crash mid-migration: HALF the files moved into the tmp dir
    tmp = os.path.join(ts, "_delta0_tmp")
    os.makedirs(tmp)
    parts = sorted(f for f in os.listdir(ts)
                   if f.endswith(".parquet") and not f.startswith((".", "_")))
    for f in parts[: max(1, len(parts) // 2)]:
        os.rename(os.path.join(ts, f), os.path.join(tmp, f))
    got = {r["term"]: (r["df"], r["cf"])
           for r in load_term_stats(spark, out).collect()}
    assert got == want
    # re-running the migration completes it; stats unchanged
    assert migrate_flat_stats(out) is True
    spark.catalog.refreshByPath(ts)
    assert os.path.isdir(os.path.join(ts, "delta=0"))
    assert not os.path.isdir(tmp)
    got2 = {r["term"]: (r["df"], r["cf"])
            for r in load_term_stats(spark, out).collect()}
    assert got2 == want
