"""Training-data chunking: split documents into overlapping token windows.

The packing primitive every pretraining pipeline needs: a document's
analyzed token stream becomes chunks of at most ``max_tokens`` tokens,
consecutive chunks overlapping by ``overlap`` (context stitching). Frozen
semantics, twinned verbatim in DuckDB (duckdb_chunks_sql):

  * tokens = the standard analyzer chain (analyzer.tokenize_expr);
  * stride = max_tokens - overlap; chunk i starts at token i*stride
    (0-based) and takes min(max_tokens, n - start) tokens;
  * the last chunk is the one whose window first reaches the end:
    i_max = ceil((n - max_tokens) / stride), clamped to >= 0 — no
    trailing chunk that is a strict suffix of the previous window;
  * a doc with zero tokens emits no chunks;
  * chunk_text = tokens joined with single spaces (analyzed form — the
    chunker feeds tokenizers downstream, not renderers).

Everything is pure Catalyst (sequence/transform/slice/array_join over a
token array materialized behind an explode(array(...)) Generate barrier —
see engine/highlight.py for why a bare projection would go quadratic).
One Generate per doc for the token array, one for the chunk fan-out; no
shuffle at all — chunking is embarrassingly parallel and the output
inherits the input partitioning, which is exactly what a 100 TB corpus
pass needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analyzer import duckdb_tokens_sql, tokenize_expr


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — see module docstring."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokenize_expr(text_col))).alias("_toks"),
    )
    n = F.size("_toks")
    # last chunk index = ceil((n - max) / stride), clamped at 0 so short
    # docs emit exactly one chunk (explicit ceil on BOTH engines — DuckDB's
    # // truncates toward zero, so a shared floor-div trick would diverge)
    i_max = F.greatest(
        F.lit(0), F.ceil((n - F.lit(max_tokens)) / F.lit(stride)).cast("int")
    )
    chunks = toks.where(n > 0).select(
        "doc_id",
        "_toks",
        F.explode(F.sequence(F.lit(0), i_max)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride  # 0-based token offset
    frag: Column = F.slice(F.col("_toks"), start + 1, max_tokens)  # 1-based
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(frag).cast("long").alias("n_tokens"),
        F.array_join(frag, " ").alias("chunk_text"),
    )


def duckdb_chunks_sql(
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> str:
    """Full SELECT — the DuckDB twin of chunk_documents over the
    ``documents`` view."""
    stride = max_tokens - overlap
    toks = duckdb_tokens_sql(text_col)
    return f"""
WITH ct AS (SELECT doc_id, {toks} AS toks FROM documents),
cn AS (SELECT doc_id, toks, len(toks) AS n FROM ct WHERE len(toks) > 0),
cx AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, greatest(0, ceil((n - {max_tokens})::DOUBLE / {stride})::INT))) AS chunk_id
  FROM cn
)
SELECT doc_id,
       chunk_id::BIGINT AS chunk_id,
       len(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {max_tokens}])::BIGINT AS n_tokens,
       array_to_string(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {max_tokens}], ' ') AS chunk_text
FROM cx"""


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Sequence packing — the other half of the pretraining packing story
    (chunk_documents splits long docs; this bins short ones): assign every
    document to a fixed-token-budget training sequence by cumulative token
    count. Returns ``(bucket, seq_id, doc_id, n_tokens, begin)`` where
    ``begin`` is the number of tokens packed before this doc within its
    bucket and ``seq_id = floor(begin / budget)`` — the sequence in which
    the doc STARTS (docs may straddle a boundary; the trainer's collator
    handles the tail, as in GPT-style packed pretraining).

    Scale shape: a single global cumulative-sum window would serialize the
    corpus through one partition, so packing is BUCKET-PARALLEL — docs are
    hash-assigned to ``n_buckets`` independent streams (pmod(doc_id)),
    each packed by a window partitioned on the bucket and ordered by
    doc_id. One shuffle on the bucket key; n_buckets scales with the
    cluster, and determinism holds at any parallelism because the order
    inside a bucket is the doc_id total order, never partition layout.
    Twinned verbatim in DuckDB (pack_sequences_sql).
    """
    if budget < 1 or n_buckets < 1:
        raise ValueError("budget and n_buckets must be >= 1")
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_expr(text_col)).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    begin = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("begin")
    return base.select(
        "bucket",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget))
        .cast("long")
        .alias("seq_id"),
        "doc_id",
        "n_tokens",
        begin,
    )


def pack_sequences_sql(
    budget: int = 256,
    n_buckets: int = 8,
    text_col: str = "text",
) -> str:
    """DuckDB twin of pack_sequences over the ``documents`` view."""
    toks = duckdb_tokens_sql(text_col)
    return f"""
WITH base AS (
  SELECT doc_id,
         len({toks})::BIGINT AS n_tokens,
         (doc_id % {n_buckets})::BIGINT AS bucket
  FROM documents
),
cum AS (
  SELECT bucket, doc_id, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)::BIGINT AS begin
  FROM base
)
SELECT bucket,
       (begin // {budget})::BIGINT AS seq_id,
       doc_id, n_tokens, begin
FROM cum"""
