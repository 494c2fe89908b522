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

Scale note: rebuilding a shard's blocks reads only that shard's staged
partition (partition-pruned), so per-batch cost is O(new docs + touched
shards), not O(corpus). Stats (df/idf) are recomputed from staged postings
— BM25 scores therefore reflect the full corpus after every batch, which
is what ES's refresh gives (B15).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (
    _bucket_builder,
    _write_manifest,
    BLOCK_SCHEMA,
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
    Returns number of newly indexed docs. Idempotent per batch content."""
    meta = read_meta(out_dir)
    attrs = load_attrs(spark, out_dir)
    # A16 skip-if-present: only genuinely new doc_ids are indexed
    fresh = new_docs.withColumnRenamed(id_col, "doc_id").join(
        attrs.select("doc_id"), "doc_id", "left_anti"
    )
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
    # (staged rows keep their original shard; doc_ids are absolute).
    staged_new = term_freqs_arrow(fresh, "doc_id", text_col).withColumn("shard", shard_expr)
    staged_new.write.mode("append").partitionBy("shard").parquet(
        os.path.join(out_dir, "_stage", "postings")
    )
    staged = spark.read.parquet(os.path.join(out_dir, "_stage", "postings"))

    # refresh global stats (single small agg over staged dl projection)
    dl = staged.select("doc_id", "dl").distinct()
    row = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    meta = IndexMeta(
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"]),
        n_shards=meta.n_shards,
        block_size=meta.block_size,
        salt_threshold=meta.salt_threshold,
        n_salts=meta.n_salts,
        attr_cols=meta.attr_cols,
        n_buckets=meta.n_buckets,
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(meta.__dict__, fh)
    staged.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "term_stats"))

    # rebuild attrs (append only the new docs' rows; attrs carries keyword
    # columns only — dl lives inside the posting blocks)
    new_attrs = (
        staged_new.select("shard", "doc_id").distinct()
        .join(fresh.select("doc_id", *meta.attr_cols), "doc_id")
    )
    new_attrs.write.mode("append").partitionBy("shard").parquet(
        os.path.join(out_dir, "attrs")
    )

    # rebuild blocks for touched shards only (idf changed globally, but
    # block_max_w is an upper bound built from the CURRENT df at build
    # time; the scorer recomputes true idf at query time, so untouched
    # shards stay valid as long as df only grows — idf shrinks, bounds
    # stay upper bounds)
    touched = [r["shard"] for r in staged_new.select("shard").distinct().collect()]
    tstats = spark.read.parquet(os.path.join(out_dir, "term_stats"))
    part = staged.where(F.col("shard").isin(touched)).join(
        tstats.select("term", "df"), "term"
    )
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
        F.pmod(F.xxhash64("term", "salt"), F.lit(meta.n_buckets)).cast("int"),
    )
    blocks = part.groupBy("shard", "tbucket").applyInPandas(
        _bucket_builder(meta.block_size, float(meta.n_docs), meta.avgdl),
        schema=BLOCK_SCHEMA,
    )
    for s in touched:
        blocks.where(F.col("shard") == s).sortWithinPartitions(
            "term", "salt", "block_seq"
        ).write.mode("overwrite").option(
            "parquet.block.size", str(1 << 20)  # tight row groups → term pruning
        ).parquet(os.path.join(out_dir, "postings", f"shard={s}"))
    _write_manifest(
        out_dir, f"incr_{int(time.time() * 1000)}",
        docs_added=n_new, shards=touched,
    )
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
