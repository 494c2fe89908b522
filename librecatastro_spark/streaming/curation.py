"""Incremental training-data curation — the streaming twin of
``ops.pipeline.training_data_pipeline``.

A 100 TB corpus is not curated in one shot: crawl batches arrive over
time and each must be deduplicated against EVERYTHING already curated,
not just against itself. This module keeps a durable curation state
(parquet under ``state_dir``) and folds one batch in per call:

    state_dir/
      canon/batch=<tok>/     doc_id, fingerprint, sz   (exact-dedup
                             survivors — including near-dup REJECTED
                             docs: one-shot semantics drop doc_b for any
                             qualifying pair whose doc_a is an exact-
                             dedup survivor, accepted or not)
      bands/batch=<tok>/     doc_id, band, key         (LSH buckets)
      shingles/batch=<tok>/  doc_id, sh                (exact-verify set)
      accepted/batch=<tok>/  doc_id, lang_pred, quality, n_tokens
      seen/batch=<tok>/      doc_id  (EVERY processed id, accepted or
                             not — the replay anti-join set, the A16
                             resume-list analog)
      _commit_<tok>.json     batch commit marker {token, max_doc_id}

Crash safety mirrors streaming/incremental.py: all five tables land in
per-batch subdirectories and the tiny ``_commit`` marker is written
LAST; readers only see committed batches, and ``curate_batch`` purges
orphan (uncommitted) batch dirs on entry, so a replay after a crash at
any point converges — replayed rows of an already-committed batch are
dropped by the doc_id anti-join against the committed ``seen`` set.

Convergence contract (tested in tests/ and oracle-gated as the
``incremental_curation`` extra query): for batches with monotonically
increasing doc_id ranges (the append-log order the index builder also
assumes), the union of per-batch ``accepted`` outputs is EXACTLY
``training_data_pipeline`` run once over the concatenated corpus — the
LSH band keys are the same deterministic function of content in both
modes, so even the approximate candidate set matches. Non-monotone
batches raise (a later batch cannot retroactively drop an earlier
accepted doc).

Scale shape: every join is an equi-join — fingerprint anti-join,
(band, key) candidate join (batch side is batch-sized), shingle-verify
joins restricted to candidate pairs. Per-batch write volume is
O(batch), never O(corpus); nothing rewrites prior state.

Reference analog: the crawl's skip-if-already-stored check before each
new entry (reference:
src/librecatastro/scrapping/parsers/parser_xml.py:149-151 and the ES
dedup existence probe, elasticsearch_utils.py:110-130), extended from
exact-id to content-level exact + near duplicates.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..bm25 import ROUND_DECIMALS
from ..ops.dedup import minhash_signature, shingles_expr
from ..ops.pipeline import _score_docs

_CANON_SCHEMA = "doc_id long, fingerprint string, sz long"
_BANDS_SCHEMA = "doc_id long, band int, key string"
_SHINGLES_SCHEMA = "doc_id long, sh string"
_ACCEPTED_SCHEMA = "doc_id long, lang_pred string, quality double, n_tokens int"
_SEEN_SCHEMA = "doc_id long"
_TABLES = ("canon", "bands", "shingles", "accepted", "seen")


def _committed(state_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(state_dir):
        return out
    for fn in sorted(os.listdir(state_dir)):
        if fn.startswith("_commit_") and fn.endswith(".json"):
            with open(os.path.join(state_dir, fn)) as fh:
                out.append(json.load(fh))
    return out


def _purge_uncommitted(state_dir: str, committed_tokens: set[str]) -> None:
    for table in _TABLES:
        root = os.path.join(state_dir, table)
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith("batch=") and d[len("batch="):] not in committed_tokens:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def _read_state(
    spark: SparkSession, state_dir: str, table: str, schema: str,
    tokens: list[str],
) -> DataFrame:
    dirs = [
        os.path.join(state_dir, table, f"batch={t}")
        for t in tokens
        if os.path.isdir(os.path.join(state_dir, table, f"batch={t}"))
    ]
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*dirs)


def _band_keys(
    sig: DataFrame, n_hashes: int, bands: int,
) -> DataFrame:
    """(doc_id, band, key) — SAME construction as ops.dedup
    minhash_lsh_pairs, so batch-mode and incremental-mode bucket
    identically (the convergence contract depends on this)."""
    rows = n_hashes // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh{bi * rows + r}") for r in range(rows)]
                )
            ).alias("key"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def accepted_docs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Union of every committed batch's accepted output."""
    tokens = [c["token"] for c in _committed(state_dir)]
    return _read_state(spark, state_dir, "accepted", _ACCEPTED_SCHEMA, tokens)


def curate_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    n_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Curate one batch against the accumulated state; returns this
    batch's accepted rows (doc_id, lang_pred, quality, n_tokens) and
    appends them (plus the dedup state of every exact-dedup survivor)
    to ``state_dir``. Idempotent under replay; raises on non-monotone
    doc_id ranges (see module docstring)."""
    os.makedirs(state_dir, exist_ok=True)
    committed = _committed(state_dir)
    tokens = [c["token"] for c in committed]
    _purge_uncommitted(state_dir, set(tokens))
    state_max = max((c["max_doc_id"] for c in committed), default=-1)

    canon = _read_state(spark, state_dir, "canon", _CANON_SCHEMA, tokens)
    scored = _score_docs(
        batch.withColumn(id_col, F.col(id_col).cast("long")), id_col, text_col
    )
    # replay idempotence: rows of an already-committed batch vanish here
    # (seen holds every processed id, so rows the filters rejected last
    # time cannot masquerade as out-of-order new data on replay)
    seen = _read_state(spark, state_dir, "seen", _SEEN_SCHEMA, tokens)
    scored = scored.join(seen, "doc_id", "left_anti")
    stats = scored.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not stats["n"]:
        return spark.createDataFrame([], _ACCEPTED_SCHEMA)
    if stats["lo"] <= state_max:
        raise ValueError(
            f"non-monotone batch: doc_id {stats['lo']} <= committed max "
            f"{state_max}; incremental curation consumes an append log"
        )
    token = f"b{stats['lo']}_{stats['hi']}_{stats['n']}"

    kept = scored.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= min_quality)
    )
    # exact dedup: against state (fingerprint anti-join), then within
    # batch (min doc_id per fingerprint — one hash-partitioned window)
    kept = kept.join(canon.select("fingerprint"), "fingerprint", "left_anti")
    w = Window.partitionBy("fingerprint")
    uniq = (
        kept.withColumn("keep_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )

    # ---- stage this batch's dedup state (committed only by the marker) --
    def _dir(table: str) -> str:
        return os.path.join(state_dir, table, f"batch={token}")

    scored.select("doc_id").write.mode("overwrite").parquet(_dir("seen"))

    shing = uniq.select(
        "doc_id", F.explode(shingles_expr(F.col("text"), shingle_n)).alias("sh")
    ).distinct()
    shing.write.mode("overwrite").parquet(_dir("shingles"))
    shing_b = spark.read.schema(_SHINGLES_SCHEMA).parquet(_dir("shingles"))

    sig = minhash_signature(uniq, "doc_id", "text", n_hashes, shingle_n)
    _band_keys(sig, n_hashes, bands).write.mode("overwrite").parquet(_dir("bands"))
    bands_b = spark.read.schema(_BANDS_SCHEMA).parquet(_dir("bands"))

    sizes_b = shing_b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    uniq.select("doc_id", "fingerprint").join(sizes_b, "doc_id", "left").select(
        "doc_id", "fingerprint", F.coalesce("sz", F.lit(0)).alias("sz")
    ).write.mode("overwrite").parquet(_dir("canon"))
    canon_b = spark.read.schema(_CANON_SCHEMA).parquet(_dir("canon"))

    # ---- near-dup candidates: batch×state + batch×batch band matches ----
    bands_s = _read_state(spark, state_dir, "bands", _BANDS_SCHEMA, tokens)
    shing_s = _read_state(spark, state_dir, "shingles", _SHINGLES_SCHEMA, tokens)
    cand_sb = (
        bands_s.select(F.col("doc_id").alias("doc_a"), "band", "key")
        .join(bands_b.select(F.col("doc_id").alias("doc_b"), "band", "key"),
              ["band", "key"])
        .select("doc_a", "doc_b")
    )
    ba, bb = bands_b.alias("a"), bands_b.alias("b")
    cand_bb = (
        ba.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    cand = cand_sb.union(cand_bb).where(F.col("doc_a") < F.col("doc_b")).distinct()

    # exact-Jaccard verify, restricted to candidates (same arithmetic as
    # ops.dedup.minhash_lsh_pairs so thresholds round identically)
    sh_all_a = shing_s.union(shing_b).select(
        F.col("doc_id").alias("doc_a"), "sh"
    )
    sh_b = shing_b.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sh_all_a, "doc_a")
        .join(sh_b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes_all = _read_state(spark, state_dir, "canon", _CANON_SCHEMA, tokens).select(
        "doc_id", "sz"
    ).union(canon_b.select("doc_id", "sz"))
    sa = sizes_all.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes_all.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    drop = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .where(
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                ROUND_DECIMALS,
            )
            >= jaccard_threshold
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )

    accepted = (
        canon_b.select("doc_id")
        .join(F.broadcast(drop), "doc_id", "left_anti")
        .join(
            uniq.select("doc_id", "lang_pred", "quality", "n_tokens"), "doc_id"
        )
        .select("doc_id", "lang_pred", "quality", "n_tokens")
    )
    accepted.write.mode("overwrite").parquet(_dir("accepted"))

    # commit marker LAST — everything above is invisible until this lands
    marker = os.path.join(state_dir, f"_commit_{token}.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"token": token, "max_doc_id": int(stats["hi"])}, fh)
    os.replace(tmp, marker)
    return spark.read.schema(_ACCEPTED_SCHEMA).parquet(_dir("accepted"))
