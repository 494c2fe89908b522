"""Incremental index maintenance — the Structured-Streaming analog of the
reference's long-running incremental crawler with resume-on-restart
(A16/A29/A30; reference: src/librecatastro/scrapping/parsers/
parser_xml.py:149-151 skip-if-present, src/utils/catastro_logger.py
progress journal, README.md:43-46 suspend/resume).

Model: the corpus is append-only. New document batches arrive (files in a
watched directory, or any stream source); each micro-batch is

  1. anti-joined against the index's attrs manifest (already-indexed docs
     are skipped — the reference's check_if_address_present),
  2. tokenized and staged (appended to _stage/postings),
  3. the affected shards' posting blocks are rebuilt from the staged
     postings (delta shards only), term_stats/meta refreshed.

``foreachBatch`` gives exactly-once-per-batch semantics on top of the
builder's idempotent per-shard overwrite: replaying a batch converges to
the same index (the upsert-by-id analog, cadaster_entry.py:53).

Scale note: per-batch cost is O(new docs + touched shards + vocabulary),
not O(corpus): the batch is tokenized once, term_stats are maintained by
an ADDITIVE merge (old stats ∪ batch deltas → sum — df/cf are additive,
N and Σcf are counters), and only the touched shards' posting blocks are
rebuilt from their partition-pruned staged postings. The full staged
corpus is never re-read (pytest-asserted by deleting an untouched staged
partition before an append). BM25 scores reflect the full corpus after
every batch, which is what ES's refresh gives (B15).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (
    _bucket_builder,
    assign_term_ids,
    _small_arrow_batches,
    _write_manifest,
    BLOCK_SCHEMA_TID,
    IndexMeta,
    load_attrs,
    read_meta,
)
from ..stats import term_freqs_arrow


def append_batch(
    spark: SparkSession,
    out_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> int:
    """Merge a batch of new documents into an existing index at out_dir.
    Returns number of newly indexed docs. Idempotent per batch content.
    Already-open CompressedIndex objects snapshot stats at open — call
    refresh() (or reopen) after an append."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        return _append_batch(spark, out_dir, new_docs, id_col, text_col)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _append_batch(
    spark: SparkSession,
    out_dir: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
) -> int:
    meta = read_meta(out_dir)
    attrs = load_attrs(spark, out_dir)
    # A16 skip-if-present: only genuinely new doc_ids are indexed
    fresh = new_docs.withColumnRenamed(id_col, "doc_id").join(
        attrs.select("doc_id"), "doc_id", "left_anti"
    ).cache()
    n_new = fresh.count()
    if n_new == 0:
        return 0
    new_n_docs = meta.n_docs + n_new
    shard_expr = F.least(
        F.lit(meta.n_shards - 1),
        F.floor(F.col("doc_id") * meta.n_shards / F.lit(new_n_docs)).cast("int"),
    )
    # NB: growing N shifts range boundaries; for an append-only corpus with
    # monotonically assigned doc_ids, new docs land in the tail shards and
    # the boundary shift is handled by rebuilding every TOUCHED shard below
    # (staged rows keep their original shard; doc_ids are absolute; a doc's
    # attrs and postings use the SAME shard expression, so they agree).
    staged_new = term_freqs_arrow(fresh, "doc_id", text_col).withColumn(
        "shard", shard_expr
    ).cache()
    # small Arrow batches scoped to the tokenize pass — the same
    # allocation-churn mitigation as the batch build (builder.py:
    # _small_arrow_batches); the cache() above materializes here, so the
    # downstream stats/block stages run at the default batch size
    with _small_arrow_batches(spark):
        staged_new.write.mode("append").partitionBy("shard").parquet(
            os.path.join(out_dir, "_stage", "postings")
        )

    # ---- additive stats merge: O(vocabulary + batch terms), NOT O(staged).
    # df/cf are additive across disjoint doc sets; N counts ALL docs
    # (zero-token ones included, matching build_index's docs.count()), and
    # avgdl = Σcf / N — identical to the batch-build derivation, so an
    # appended index converges to the batch-built one bit-for-bit.
    ts_path = os.path.join(out_dir, "term_stats")
    batch_stats = staged_new.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    merged = (
        spark.read.parquet(ts_path)
        .unionByName(batch_stats)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    tmp = ts_path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    total_tokens = (
        spark.read.parquet(tmp).agg(F.sum("cf")).collect()[0][0]
    )
    shutil.rmtree(ts_path)
    os.replace(tmp, ts_path)
    meta = IndexMeta(
        n_docs=new_n_docs,
        avgdl=float(total_tokens or 0) / new_n_docs if new_n_docs else 0.0,
        n_shards=meta.n_shards,
        block_size=meta.block_size,
        salt_threshold=meta.salt_threshold,
        n_salts=meta.n_salts,
        attr_cols=meta.attr_cols,
        n_buckets=meta.n_buckets,
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(meta.__dict__, fh)

    # rebuild blocks for touched shards only (idf changed globally, but
    # block_max_w is an upper bound built from the CURRENT df at build
    # time; the scorer recomputes true idf at query time, so untouched
    # shards stay valid as long as df only grows — idf shrinks, bounds
    # stay upper bounds)
    touched = [r["shard"] for r in staged_new.select("shard").distinct().collect()]
    tstats = spark.read.parquet(os.path.join(out_dir, "term_stats"))
    # ephemeral term→tid map so the grouped map below moves only numerics
    # (same design as the batch build — assign_term_ids docstring)
    tids = assign_term_ids(tstats).cache()
    # lazily open the staged postings; the isin(touched) predicate below is
    # partition pruning, so only the touched shards' files are ever read
    staged = spark.read.parquet(os.path.join(out_dir, "_stage", "postings"))
    part = staged.where(F.col("shard").isin(touched)).join(
        F.broadcast(tids.select("term", "df", "tid")), "term"
    ).drop("term")
    shard_span = meta.n_docs / meta.n_shards
    rel = F.col("doc_id") - F.col("shard") * F.lit(shard_span)
    salt = F.when(
        F.col("df") > meta.salt_threshold,
        F.least(
            F.lit(meta.n_salts - 1),
            F.floor(rel * meta.n_salts / F.lit(shard_span)).cast("int"),
        ),
    ).otherwise(F.lit(0))
    part = part.withColumn("salt", salt).withColumn(
        "tbucket",
        F.pmod(F.xxhash64("tid", "salt"), F.lit(meta.n_buckets)).cast("int"),
    )
    blocks = part.groupBy("shard", "tbucket").applyInPandas(
        _bucket_builder(meta.block_size, float(meta.n_docs), meta.avgdl),
        schema=BLOCK_SCHEMA_TID,
    ).join(tids.select("tid", "term"), "tid").drop("tid", "tbucket")
    for s in touched:
        blocks.where(F.col("shard") == s).sortWithinPartitions(
            "term", "salt", "block_seq"
        ).write.mode("overwrite").option(
            "parquet.block.size", str(1 << 20)  # tight row groups → term pruning
        ).parquet(os.path.join(out_dir, "postings", f"shard={s}"))
    tids.unpersist()
    # append attrs rows LAST, for ALL fresh docs (projected from fresh, not
    # from staged postings — a zero-token doc has no postings but must
    # exist in attrs for the sha invariant and the A16 anti-join).
    # ORDERING MATTERS: this write triggers refreshByPath(attrs), which
    # invalidates every cached plan referencing the attrs files —
    # including `fresh` itself (its anti-join reads attrs). Any action on
    # fresh/staged_new AFTER this point would recompute against the
    # updated attrs and silently see ZERO fresh docs, so this must be the
    # final consumer. (Crash between the block rebuild and here ⇒ the
    # batch replays from scratch; production would wrap the append in an
    # Iceberg transaction.)
    new_attrs = fresh.select("doc_id", *meta.attr_cols).withColumn(
        "shard", shard_expr
    )
    new_attrs.write.mode("append").partitionBy("shard").parquet(
        os.path.join(out_dir, "attrs")
    )
    _write_manifest(
        out_dir, f"incr_{int(time.time() * 1000)}",
        docs_added=n_new, shards=touched,
    )
    staged_new.unpersist()
    fresh.unpersist()
    return n_new


def stream_into_index(
    spark: SparkSession,
    out_dir: str,
    source_dir: str,
    schema: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    checkpoint_dir: str | None = None,
):
    """Structured Streaming driver: watch source_dir for new parquet files
    and fold each micro-batch into the index via foreachBatch."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        append_batch(spark, out_dir, batch_df, id_col=id_col, text_col=text_col)

    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
