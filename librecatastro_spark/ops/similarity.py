"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline; pure Catalyst
  (zip_with + aggregate), JVM-side, no Python.
* random-hyperplane LSH ANN — the scale path: 2^n_planes buckets,
  query probes its bucket plus all Hamming-1 neighbors; recall is
  measured against the brute-force baseline in tests.
* all-pairs embedding near-dup — LSH-bucketed self-join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..bm25 import ROUND_DECIMALS


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine: one scan, TakeOrderedAndProject
    merge — the distributed exact baseline every ANN path is judged by."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col(vec_col).cast("array<double>")
    return (
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(emb, q), ROUND_DECIMALS).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_sql(query_vec: list[float], k: int = 10, id_col="vec_id", vec_col="embedding") -> str:
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    # explicit dot/norms (same summation order as the Spark aggregate)
    return f"""
SELECT {id_col} AS vec_id,
       round(
         list_sum(list_transform(list_zip({vec_col}::DOUBLE[], {q}), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform({vec_col}::DOUBLE[], x -> x * x)))
            * sqrt(list_sum(list_transform({q}, x -> x * x)))),
         {ROUND_DECIMALS}) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


# ------------------------------------------------------------------ LSH --

def _planes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign bits against fixed seeded hyperplanes (Catalyst).
    The dot product is rounded to 6 decimals before the sign test so the
    bit is stable across summation orders (Spark fold vs DuckDB list_sum
    vs numpy) — same stabilization the IVF assignment uses."""
    acc = F.lit(0)
    for i, p in enumerate(planes):
        q = F.array(*[F.lit(float(x)) for x in p])
        acc = acc + F.when(F.round(_dot(vec_col, q), 6) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    )


def _sql_arr(v) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def ann_lsh_topk_sql(
    query_id: int = 0,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 13,
) -> str:
    """DuckDB twin of ann_lsh_topk: the seeded hyperplanes are frozen as
    SQL literals (the IVF-oracle pattern), buckets recomputed with the
    same round-6 sign test, multiprobe = bucket equality or Hamming-1
    (xor is a power of two)."""
    planes = _planes(dim, n_planes, seed)
    bucket = " + ".join(
        f"(CASE WHEN round({_sql_dot('v', _sql_arr(p))}, 6) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(str(1 << i) for i in range(n_planes))
    cos = (
        f"round({_sql_dot('b.v', 'q.v')} / (sqrt({_sql_dot('b.v', 'b.v')})"
        f" * sqrt({_sql_dot('q.v', 'q.v')})), {ROUND_DECIMALS})"
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket FROM embeddings
),
q AS (SELECT vec_id, v, bucket FROM b WHERE vec_id = {query_id})
SELECT b.vec_id AS vec_id, {cos} AS cosine
FROM b, q
WHERE b.bucket = q.bucket OR xor(b.bucket, q.bucket) IN ({probes})
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def ann_lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """ANN: score only vectors in the query's bucket or any Hamming-1
    neighbor bucket (multiprobe). Partition-prunable when the table is
    written partitioned/bucketed by `bucket`."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qb = int(
        sum((1 << i) for i, p in enumerate(planes) if round(float(p @ qv), 6) > 0)
    )
    probe = [qb] + [qb ^ (1 << i) for i in range(n_planes)]
    emb = F.col(vec_col).cast("array<double>")
    bucketed = vectors.withColumn("bucket", lsh_bucket_expr(emb, planes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("bucket").isin(probe))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(emb, q), ROUND_DECIMALS).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# ------------------------------------------------------------------ IVF --

def _ivf_centroids(
    vectors: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid pick: the embeddings of the n_cells smallest
    ids (production would run k-means; the assignment/probe plumbing —
    the part that matters at scale — is identical either way)."""
    rows = (
        vectors.select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("i")
        .limit(n_cells)
        .collect()
    )
    return [(int(r["i"]), [float(x) for x in r["v"]]) for r in rows]


def ivf_cell_expr(
    vec_col: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Cell id = argmax-cosine centroid (ties → smallest cid), computed
    JVM-side against broadcast centroid literals. Cosines rounded to 6
    decimals so the choice is stable across summation orders (Spark
    aggregate vs DuckDB list_sum vs numpy)."""
    structs = [
        F.struct(
            F.round(cosine_expr(vec_col, F.array(*[F.lit(x) for x in cv])), 6).alias("c"),
            F.lit(-cid).alias("ncid"),  # max(-cid) = smallest cid on ties
        )
        for cid, cv in centroids
    ]
    return (-F.array_max(F.array(*structs))["ncid"]).alias("cell")


def ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize every vector to its nearest centroid cell,
    probe only the n_probe cells nearest the query, exact cosine top-k
    within them. The 100 TB path: the table is written partitioned by
    `cell`, so the probe filter becomes partition pruning and a query
    scans n_probe/n_cells of the data; centroids are a broadcast literal
    (no shuffle, no Python)."""
    cents = _ivf_centroids(vectors, n_cells, id_col, vec_col)
    qv = [float(x) for x in query_vec]

    def _cos(cv: list[float]) -> float:
        dot = 0.0
        na = 0.0
        nb = 0.0
        for a, b in zip(cv, qv):
            dot += a * b
            na += a * a
            nb += b * b
        return round(dot / ((na ** 0.5) * (nb ** 0.5)), 6)

    probe = [
        cid
        for cid, _ in sorted(cents, key=lambda c: (-_cos(c[1]), c[0]))[:n_probe]
    ]
    emb = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(x) for x in qv])
    return (
        vectors.withColumn("cell", ivf_cell_expr(emb, cents))
        .where(F.col("cell").isin(probe))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(emb, q), ROUND_DECIMALS).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk_sql(
    query_id: int = 0, k: int = 10, n_cells: int = 8, n_probe: int = 2
) -> str:
    """DuckDB twin of ivf_topk with the query vector taken from
    embeddings[vec_id=query_id] (same deterministic centroids, same
    round-6 assignment/probe tie rules, same round-4 output)."""

    def cos(a: str, b: str) -> str:
        return (
            f"(list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
            f" / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
            f" * sqrt(list_sum(list_transform({b}, x -> x * x)))))"
        )

    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
  ORDER BY vec_id ASC LIMIT {n_cells}
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_id}),
asg AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({cos('e.embedding::DOUBLE[]', 'c.cv')}, 6) DESC, c.cid ASC
         ) AS rn
  FROM embeddings e CROSS JOIN cent c
),
cell AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
probe AS (
  SELECT c.cid FROM cent c, q
  ORDER BY round({cos('c.cv', 'q.qv')}, 6) DESC, c.cid ASC LIMIT {n_probe}
)
SELECT e.vec_id AS vec_id,
       round({cos('e.embedding::DOUBLE[]', 'q.qv')}, {ROUND_DECIMALS}) AS cosine
FROM embeddings e
JOIN cell ON cell.vec_id = e.vec_id, q
WHERE cell.cid IN (SELECT cid FROM probe)
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def _empty_pairs(vectors: DataFrame, id_col: str) -> DataFrame:
    """Empty (vec_a, vec_b, cosine) frame with the id column's type —
    what every pair-producing near-dup path returns on empty input (the
    LSH paths can't even size their hyperplanes without a first row)."""
    from pyspark.sql import types as T

    idt = vectors.schema[id_col].dataType
    return vectors.sparkSession.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("vec_a", idt),
                T.StructField("vec_b", idt),
                T.StructField("cosine", T.DoubleType()),
            ]
        ),
    )


def _band_exprs(vec_col: Column, planes: np.ndarray, bands: int) -> list[Column]:
    """Band values from hyperplane sign bits: n_planes bits split into
    `bands` contiguous groups of r = n_planes // bands bits each."""
    n = len(planes)
    r = n // bands
    bits = [
        F.when(
            F.round(_dot(vec_col, F.array(*[F.lit(float(x)) for x in p])), 6) > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in planes
    ]
    out = []
    for b in range(bands):
        acc = F.lit(0)
        for k in range(r):
            acc = acc * 2 + bits[b * r + k]
        out.append(acc)
    return out


def embedding_near_dup_banded(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-dup via BANDED hyperplane LSH — the scale
    path: candidate pairs come from an equi-self-join on
    (band_idx, band_val), never a cartesian product, then exact cosine
    verify (the dedup_minhash_lsh pattern applied to embeddings).

    This operator is APPROXIMATE, like every banded-LSH dedup: a pair at
    angle θ agrees on one plane w.p. s = 1 - θ/π, on an r-bit band w.p.
    s^r, and is missed by all b bands w.p. ≤ (1 - s^r)^b — at cos ≥ 0.4
    (s ≥ 0.631) with r=2, b=8 that per-pair miss bound is ≤ 0.017.
    Measured recall vs the exact brute-force baseline: 100% on the
    sf0.001/sf0.01 corpora, 907/920 pairs (98.6%) at sf0.1 — consistent
    with the bound, and why its correctness oracle is
    ``embedding_near_dup_banded_sql`` (the SAME banding with the seeded
    planes frozen as SQL literals — the ann_lsh_topk oracle pattern),
    which matches on every corpus by construction, rather than the exact
    cross product, which an approximate operator cannot promise. Recall
    vs ``brute_force_pairs`` stays pytest-measured. 0.4 is a loose gate
    threshold; at production near-dup thresholds (≥ 0.9, s ≥ 0.93) use
    r=8, b=16 for real pruning (band match prob 0.56 for dups vs 0.004
    for random pairs)."""
    emb = F.col(vec_col).cast("array<double>")
    dim_row = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_row:  # empty input → empty pairs, same as brute force
        return _empty_pairs(vectors, id_col)
    planes = _planes(int(dim_row[0]["d"]), n_planes, seed)
    base = vectors.select(F.col(id_col).alias("vec_id"), emb.alias("v"))
    keyed = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.array(*_band_exprs(emb, planes, bands))).alias(
            "band_idx", "band_val"
        ),
    )
    cand = (
        keyed.alias("l")
        .join(
            keyed.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b")
        )
        .distinct()
    )
    return (
        cand.join(base.alias("a"), F.col("vec_a") == F.col("a.vec_id"))
        .join(base.alias("b"), F.col("vec_b") == F.col("b.vec_id"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), ROUND_DECIMALS).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dup_banded_sql(
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 13,
) -> str:
    """DuckDB twin of embedding_near_dup_banded: the seeded hyperplanes
    are frozen as SQL literals and the band values recomputed with the
    same round-6 sign test and the same MSB-first bit packing as
    _band_exprs, so the candidate set — and therefore the verified output
    — is identical to the Spark path on ANY corpus (no recall assumption;
    the exact cross product is NOT a valid oracle for an approximate
    operator). Candidate generation mirrors the plan shape too: per-band
    unnest + equi-self-join on (band_idx, band_val), never a cartesian."""
    planes = _planes(dim, n_planes, seed)
    r = n_planes // bands
    band_exprs = []
    for b in range(bands):
        acc = "0"
        for k in range(r):
            p = planes[b * r + k]
            bit = (
                f"(CASE WHEN round({_sql_dot('v', _sql_arr(p))}, 6) > 0"
                " THEN 1 ELSE 0 END)"
            )
            acc = f"({acc}) * 2 + {bit}"
        band_exprs.append(acc)
    bands_list = "[" + ", ".join(band_exprs) + "]"
    cos = (
        f"round({_sql_dot('a.v', 'b.v')} / (sqrt({_sql_dot('a.v', 'a.v')})"
        f" * sqrt({_sql_dot('b.v', 'b.v')})), {ROUND_DECIMALS})"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bands_list} AS bands
  FROM embeddings
),
keyed AS (
  SELECT vec_id, unnest(range({bands})) AS band_idx, unnest(bands) AS band_val
  FROM base
),
cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM keyed l JOIN keyed r
    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
   AND l.vec_id < r.vec_id
)
SELECT cand.vec_a AS vec_a, cand.vec_b AS vec_b, {cos} AS cosine
FROM cand
JOIN base a ON a.vec_id = cand.vec_a
JOIN base b ON b.vec_id = cand.vec_b
WHERE {cos} >= {threshold}
"""


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket self-join (same bucket ⇒
    candidate) then exact cosine verify. Scale path for all-pairs dedup."""
    emb = F.col(vec_col).cast("array<double>")
    dim_row = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_row:  # empty input → empty pairs, same as brute force
        return _empty_pairs(vectors, id_col)
    planes = _planes(int(dim_row[0]["d"]), n_planes, seed)
    b = vectors.select(
        F.col(id_col).alias("vec_id"), emb.alias("v"),
        lsh_bucket_expr(emb, planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vec_id") < F.col("r.vec_id")))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("l.v"), F.col("r.v")), ROUND_DECIMALS).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def brute_force_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (verification baseline)."""
    emb = F.col(vec_col).cast("array<double>")
    v = vectors.select(F.col(id_col).alias("vec_id"), emb.alias("v"))
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("l.v"), F.col("r.v")), ROUND_DECIMALS).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
