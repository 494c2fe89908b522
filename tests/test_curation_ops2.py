"""Round-3 curation additions: paragraph-level dedup, sequence packing,
stratified domain-mixing sampling. Each op's Spark result is asserted
against hand-computed goldens AND against its own DuckDB twin on the
sf0.001 corpus (the same twin __spark_entry__ registers as the extra
oracle), so the gate and the unit test check the same frozen semantics.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from librecatastro_spark.ops.chunk import pack_sequences, pack_sequences_sql
from librecatastro_spark.ops.dedup import dedup_paragraphs, dedup_paragraphs_sql
from librecatastro_spark.ops.sampling import (
    stratified_sample,
    stratified_sample_sql,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


# --------------------------------------------------------------------- #
# dedup_paragraphs
# --------------------------------------------------------------------- #


def test_dedup_paragraphs_golden(spark):
    # W=2 paragraphs: doc0 = [a b][c d][e], doc1 = [a b][x y], doc2 = [c d]
    rows = [(0, "a b c d e"), (1, "a b x y"), (2, "c d"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = {
        x["doc_id"]: x
        for x in dedup_paragraphs(docs, para_tokens=2, min_df=2).collect()
    }
    # "a b" in docs 0,1; "c d" in docs 0,2 -> both removed; "e","x y" kept
    assert (r[0]["n_paras"], r[0]["n_removed"], r[0]["clean_text"]) == (3, 2, "e")
    assert (r[1]["n_paras"], r[1]["n_removed"], r[1]["clean_text"]) == (2, 1, "x y")
    assert (r[2]["n_paras"], r[2]["n_removed"], r[2]["clean_text"]) == (1, 1, "")
    # zero-token doc keeps its row
    assert (r[3]["n_paras"], r[3]["n_removed"], r[3]["clean_text"]) == (0, 0, "")


def test_dedup_paragraphs_order_preserved(spark):
    # kept paragraphs re-join in original order even when removals interleave
    rows = [(0, "k1 k1 d1 d1 k2 k2 d1 d1 k3"), (1, "d1 d1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = dedup_paragraphs(docs, para_tokens=2, min_df=2).where(
        F.col("doc_id") == 0
    ).collect()[0]
    assert r["clean_text"] == "k1 k1 k2 k2 k3"
    assert r["n_removed"] == 2


def test_dedup_paragraphs_oracle_parity(spark, documents, duck):
    res = (
        dedup_paragraphs(documents, para_tokens=3, min_df=2)
        .orderBy("doc_id")
        .toPandas()
    )
    ora = duck.sql(dedup_paragraphs_sql(3, 2) + " ORDER BY doc_id").df()
    assert res.reset_index(drop=True).equals(ora.reset_index(drop=True))
    assert res["n_removed"].sum() > 0  # the gate corpus actually exercises it


# --------------------------------------------------------------------- #
# pack_sequences
# --------------------------------------------------------------------- #


def test_pack_sequences_golden(spark):
    # one bucket: token counts 3,4,5 -> begins 0,3,7; budget 4 -> seqs 0,0,1
    rows = [(0, "a b c"), (4, "a b c d"), (8, "a b c d e")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = (
        pack_sequences(docs, budget=4, n_buckets=4, text_col="text")
        .orderBy("doc_id")
        .collect()
    )
    assert [(x["bucket"], x["seq_id"], x["begin"]) for x in r] == [
        (0, 0, 0),
        (0, 0, 3),
        (0, 1, 7),
    ]


def test_pack_sequences_parallelism_invariant(spark, documents):
    # bucket-parallel packing must not depend on partition layout
    a = (
        pack_sequences(documents.repartition(1), budget=200, n_buckets=4,
                       text_col="text")
        .orderBy("bucket", "doc_id")
        .collect()
    )
    b = (
        pack_sequences(documents.repartition(16), budget=200, n_buckets=4,
                       text_col="text")
        .orderBy("bucket", "doc_id")
        .collect()
    )
    assert a == b


def test_pack_sequences_oracle_parity(spark, documents, duck):
    res = (
        pack_sequences(documents, budget=200, n_buckets=4, text_col="text")
        .orderBy("bucket", "doc_id")
        .toPandas()
    )
    ora = duck.sql(
        pack_sequences_sql(budget=200, n_buckets=4) + " ORDER BY bucket, doc_id"
    ).df()
    assert (
        res.reset_index(drop=True)
        .astype("int64")
        .equals(ora.reset_index(drop=True).astype("int64"))
    )
    # budget respected at sequence STARTS: every seq_id is floor(begin/budget)
    assert (res["seq_id"] == res["begin"] // 200).all()


# --------------------------------------------------------------------- #
# stratified_sample
# --------------------------------------------------------------------- #

RATES = {"en": 0.8, "de": 0.25, "fr": 0.5}


def test_stratified_sample_deterministic_and_rate_shaped(spark, documents):
    a = stratified_sample(documents, RATES).orderBy("doc_id").collect()
    b = (
        stratified_sample(documents.repartition(16), RATES)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b  # pure function of doc_id — layout-independent
    n_by = {
        r["lang"]: r["n"]
        for r in stratified_sample(documents, RATES)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tot = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, rate in RATES.items():
        got = n_by.get(lang, 0) / tot[lang]
        assert abs(got - rate) < 0.25, (lang, got, rate)
    # unconfigured strata are dropped entirely
    assert set(n_by) <= set(RATES)


def test_stratified_sample_salt_redraws(spark, documents):
    a = {r["doc_id"] for r in stratified_sample(documents, RATES, salt="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(documents, RATES, salt="s2").collect()}
    assert a != b
    # similar size, different membership — a redraw, not a reshuffle of rates
    assert abs(len(a) - len(b)) < 0.3 * max(len(a), len(b))


def test_stratified_sample_oracle_parity(spark, documents, duck):
    res = stratified_sample(documents, RATES).orderBy("doc_id").toPandas()
    ora = duck.sql(stratified_sample_sql(RATES) + " ORDER BY doc_id").df()
    assert res.reset_index(drop=True).equals(
        ora[list(res.columns)].reset_index(drop=True)
    )


def test_stratified_sample_validates_rates(spark, documents):
    with pytest.raises(ValueError):
        stratified_sample(documents, {"en": 1.5})
