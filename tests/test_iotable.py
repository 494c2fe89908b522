"""Source-table seam (iotable.py): catalog identifiers resolve through
spark.read.table — the Iceberg read path on a production session — and
filesystem paths through parquet, with identical rows either way."""

from __future__ import annotations

import pytest

from librecatastro_spark.iotable import is_path_ref, read_docs_table


@pytest.mark.parametrize(
    "ref,expected",
    [
        ("/data/docs.parquet", True),
        ("data/docs", True),
        ("file:/data/docs", True),
        ("s3a://bucket/prefix", True),
        ("./docs", True),
        ("docs.parquet", True),
        ("warehouse.code.documents", False),
        ("code_documents", False),
        ("iceberg_cat.db.tbl", False),
    ],
)
def test_is_path_ref(ref, expected):
    assert is_path_ref(ref) is expected


def test_read_docs_table_both_modes(spark, tmp_path):
    df = spark.range(50).selectExpr(
        "id as doc_id", "concat('repo', id % 3) as repo",
        "concat('f', id, '.py') as path", "'c0' as commit",
        "'py' as lang", "concat('def f', id, '(): pass') as content",
    )
    path = str(tmp_path / "docs.parquet")
    df.write.parquet(path)

    via_path = read_docs_table(spark, path)
    assert via_path.count() == 50

    # catalog-identifier mode: spark.read.table resolves temp views with
    # the same code path a production Iceberg catalog table takes
    spark.read.parquet(path).createOrReplaceTempView("iotable_docs_view")
    try:
        via_table = read_docs_table(spark, "iotable_docs_view")
        got = {r["doc_id"] for r in via_table.collect()}
        want = {r["doc_id"] for r in via_path.collect()}
        assert got == want
    finally:
        spark.catalog.dropTempView("iotable_docs_view")


def test_bare_name_that_exists_locally_is_a_path(tmp_path, monkeypatch):
    """A bare name with no separator reads as parquet when it exists on
    the local filesystem (cwd-relative CLI invocations like
    ``build --input mycorpus`` predate the catalog seam and must keep
    working); with no local presence it stays a catalog identifier."""
    monkeypatch.chdir(tmp_path)
    assert is_path_ref("mycorpus") is False  # nothing on disk → catalog
    (tmp_path / "mycorpus").mkdir()
    assert is_path_ref("mycorpus") is True  # local dir → filesystem path
