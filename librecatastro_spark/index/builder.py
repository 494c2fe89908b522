"""Partitioned inverted-index build — staged, doc-sharded, salted, resumable.

Architecture (the Spark-native analog of the reference's 5-shard ES index,
reference: src/utils/elasticsearch_utils.py:28-30):

  * **Doc-sharding**: dense doc_ids are range-split into ``n_shards`` shards
    (ES routes docs to shards; range split keeps doc-id deltas small for
    varbyte). Every shard holds postings for all its docs' terms, so WAND
    runs shard-locally and the coordinator merges top-k (capability B14).
  * **Stage 1 (one pass over the corpus)**: tokenize → (doc_id, term, tf, dl)
    staged to Parquet partitioned by shard. This is the only full-corpus
    shuffle; it is the resume checkpoint for everything downstream.
  * **Stage 2 (per shard group, independently resumable)**: read one shard's
    staged postings (partition-pruned), salt hot terms (df > threshold) by
    doc-id sub-range so per-salt blocks stay sorted and concatenation-free,
    groupBy(shard, term, salt) → applyInPandas building 128-doc
    delta+varbyte blocks with per-block max BM25 weight, write sorted
    Parquet, then append a manifest/lineage record (rows, blocks, duration
    — the A29 tracking-journal analog, reference:
    src/utils/catastro_logger.py:15-45). Restart skips completed units
    (A16/A30 analog: skip-if-present, reference:
    src/librecatastro/scrapping/parsers/parser_xml.py:149-151).

Layout under ``out_dir``::

    meta.json                     N, avgdl, n_shards, block_size, …
    attrs/shard=S/…               doc_id, dl, content_sha256, keyword cols
    term_stats/…                  term, df, cf
    _stage/postings/shard=S/…     doc_id, term, tf, dl
    postings/shard=S/…            term, salt, block_seq, n_docs,
                                  first_doc_id, last_doc_id,
                                  docs_enc, tfs_enc, block_max_w
    _manifest/*.json              one lineage record per completed unit
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Iterable
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..bm25 import B, K1
from ..stats import corpus_stats, term_freqs
from .codec import encode_block, encode_varbyte

BLOCK_SCHEMA = (
    "shard int, term string, salt int, block_seq int, n_docs int, "
    "first_doc_id long, last_doc_id long, docs_enc binary, tfs_enc binary, "
    "dls_enc binary, block_max_w double, idf_build double"
)


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    n_shards: int
    block_size: int
    salt_threshold: int
    n_salts: int
    attr_cols: list[str]
    version: int = 1


# ------------------------------------------------------------- manifest --

def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_records(out_dir: str) -> dict[str, dict]:
    recs = {}
    d = _manifest_dir(out_dir)
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    r = json.load(fh)
                recs[r["unit"]] = r
    return recs


def _write_manifest(out_dir: str, unit: str, **fields) -> None:
    """Atomic lineage record: written AFTER the unit's data is durable, via
    tmp+rename, so a crash can only lose the record (unit re-runs and
    overwrites idempotently) — never record-without-data."""
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    path = os.path.join(_manifest_dir(out_dir), f"{unit}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"unit": unit, "finished_at": time.time(), **fields}, fh)
    os.replace(tmp, path)


def read_meta(out_dir: str) -> IndexMeta:
    with open(os.path.join(out_dir, "meta.json")) as fh:
        return IndexMeta(**json.load(fh))


# --------------------------------------------------------------- builder --

def _block_builder(block_size: int, n_docs: float, avgdl: float):
    """Grouped-map fn: one (shard, term, salt) group → encoded blocks."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls_i = pdf["dl"].to_numpy(dtype=np.int64)
        dls = dls_i.astype(np.float64)
        df_t = float(pdf["df"].iloc[0])
        idf = math.log1p((n_docs - df_t + 0.5) / (df_t + 0.5))
        w = idf * tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
        rows = []
        shard = int(pdf["shard"].iloc[0])
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        for seq, lo in enumerate(range(0, len(doc_ids), block_size)):
            hi = min(lo + block_size, len(doc_ids))
            docs_enc, tfs_enc = encode_block(doc_ids[lo:hi], tfs[lo:hi])
            # dl travels inside the block (Lucene norms analog) so scoring
            # needs NO doc-table join/shuffle at query time
            dls_enc = encode_varbyte(dls_i[lo:hi].astype(np.uint64))
            rows.append(
                (
                    shard, term, salt, seq, hi - lo,
                    int(doc_ids[lo]), int(doc_ids[hi - 1]),
                    docs_enc, tfs_enc, dls_enc, float(w[lo:hi].max()),
                    # idf at build time: incremental appends grow N (idf up),
                    # so the query-time scorer rescales the bound by
                    # idf_now / idf_build to keep pruning safe (wand.py).
                    idf,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "shard", "term", "salt", "block_seq", "n_docs",
                "first_doc_id", "last_doc_id", "docs_enc", "tfs_enc",
                "dls_enc", "block_max_w", "idf_build",
            ],
        )

    return fn


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    attr_cols: Iterable[str] = (),
    n_shards: int = 8,
    block_size: int = 128,
    salt_threshold: int = 100_000,
    n_salts: int = 16,
    shards_per_job: int = 4,
    resume: bool = True,
) -> IndexMeta:
    """Build (or resume building) the index at out_dir. Idempotent: a
    completed out_dir is a no-op; a partially built one finishes only the
    missing units."""
    attr_cols = list(attr_cols)
    os.makedirs(out_dir, exist_ok=True)
    done = manifest_records(out_dir) if resume else {}

    # ---- stage 1: corpus pass -> staged postings + attrs + term stats ----
    if "stage" not in done:
        t0 = time.time()
        postings = term_freqs(docs, id_col, text_col)
        stats = corpus_stats(postings)
        shard_expr = F.least(
            F.lit(n_shards - 1),
            F.floor(F.col("doc_id") * n_shards / F.lit(stats.n_docs)).cast("int"),
        )
        staged = postings.withColumn("shard", shard_expr)
        staged.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(out_dir, "_stage", "postings")
        )
        staged_r = spark.read.parquet(os.path.join(out_dir, "_stage", "postings"))
        # keyword/attr table (the .keyword analog) + per-row sha invariant;
        # dl recomputed as size(tokens) pre-explode — zero shuffle
        from ..analyzer import tokenize_expr

        attrs = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokenize_expr(text_col)).alias("dl"),
            *[F.col(c) for c in attr_cols],
        ).withColumn("shard", shard_expr)
        attrs.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(out_dir, "attrs")
        )
        staged_r.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "term_stats"))
        meta = IndexMeta(
            n_docs=stats.n_docs,
            avgdl=stats.avgdl,
            n_shards=n_shards,
            block_size=block_size,
            salt_threshold=salt_threshold,
            n_salts=n_salts,
            attr_cols=attr_cols,
        )
        with open(os.path.join(out_dir, "meta.json"), "w") as fh:
            json.dump(asdict(meta), fh)
        _write_manifest(
            out_dir, "stage",
            n_docs=stats.n_docs, avgdl=stats.avgdl, secs=time.time() - t0,
        )
        done = manifest_records(out_dir)
    meta = read_meta(out_dir)

    # ---- stage 2: per shard-group block build (resumable units) ----------
    staged = spark.read.parquet(os.path.join(out_dir, "_stage", "postings"))
    tstats = spark.read.parquet(os.path.join(out_dir, "term_stats"))
    shard_span = meta.n_docs / meta.n_shards
    for lo in range(0, meta.n_shards, shards_per_job):
        shards = list(range(lo, min(lo + shards_per_job, meta.n_shards)))
        unit = f"shards_{shards[0]}_{shards[-1]}"
        if unit in done:
            continue
        t0 = time.time()
        part = staged.where(F.col("shard").isin(shards)).join(tstats.select("term", "df"), "term")
        # salt hot terms by doc-id sub-range within the shard: per-salt
        # groups are disjoint, sorted ranges, so blocks need no re-merge.
        rel = F.col("doc_id") - F.col("shard") * F.lit(shard_span)
        salt = F.when(
            F.col("df") > meta.salt_threshold,
            F.least(
                F.lit(meta.n_salts - 1),
                F.floor(rel * meta.n_salts / F.lit(shard_span)).cast("int"),
            ),
        ).otherwise(F.lit(0))
        part = part.withColumn("salt", salt)
        blocks = part.groupBy("shard", "term", "salt").applyInPandas(
            _block_builder(meta.block_size, float(meta.n_docs), meta.avgdl),
            schema=BLOCK_SCHEMA,
        )
        # one job per group: dynamic partition overwrite replaces only the
        # shard dirs this group produced (idempotent re-run of the unit)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
        try:
            (
                blocks.repartition(len(shards), "shard")
                .sortWithinPartitions("term", "salt", "block_seq")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(os.path.join(out_dir, "postings"))
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        _write_manifest(out_dir, unit, shards=shards, secs=time.time() - t0)
    return meta


# ---------------------------------------------------------------- readers

def load_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    df = spark.read.option("basePath", os.path.join(out_dir, "postings")).parquet(
        os.path.join(out_dir, "postings")
    )
    return df.withColumn("shard", F.col("shard").cast("int"))


def load_attrs(spark: SparkSession, out_dir: str) -> DataFrame:
    df = spark.read.option("basePath", os.path.join(out_dir, "attrs")).parquet(
        os.path.join(out_dir, "attrs")
    )
    return df.withColumn("shard", F.col("shard").cast("int"))


def load_term_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "term_stats"))


def load_staged_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_stage", "postings"))


def verify_content_sha(docs: DataFrame, spark: SparkSession, out_dir: str,
                       id_col: str = "doc_id", sha_col: str = "content_sha256") -> bool:
    """Per-row content_sha256 equality corpus↔index (north_rule invariant)."""
    idx = load_attrs(spark, out_dir).select(
        F.col("doc_id").alias(id_col), F.col(sha_col).alias("_idx_sha")
    )
    joined = docs.select(id_col, sha_col).join(idx, id_col, "full_outer")
    bad = joined.where(
        F.col(sha_col).isNull()
        | F.col("_idx_sha").isNull()
        | (F.col(sha_col) != F.col("_idx_sha"))
    )
    return bad.limit(1).count() == 0
