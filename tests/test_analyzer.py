from __future__ import annotations

from pyspark.sql import functions as F

from librecatastro_spark.analyzer import analyze_text, tokenize_expr, tokenize_udf


def test_analyze_text_golden():
    # frozen analyzer spec goldens (SURVEY.md §7.4: fidelity is defined, not chased)
    assert analyze_text("Hello, World!") == ["hello", "world"]
    assert analyze_text("CL TESTTEST 17 03005 AJALVIR (MURCIA)") == [
        "cl", "testtest", "17", "03005", "ajalvir", "murcia",
    ]
    assert analyze_text("def foo_bar(x): return x+1") == [
        "def", "foo_bar", "x", "return", "x", "1",
    ]
    assert analyze_text("") == []
    assert analyze_text("   ") == []
    assert analyze_text(None) == []


def test_expr_udf_python_equivalence(spark):
    texts = [
        "Spark SQL; DataFrame.filter(col('x') > 1)",
        "UPPER lower MiXeD_case_1",
        "",
        "   leading trailing   ",
        "ünïcode stays ascii-split",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        tokenize_expr("text").alias("by_expr"),
        tokenize_udf(F.col("text")).alias("by_udf"),
    ).collect()
    for r in rows:
        expected = analyze_text(r["text"])
        if r["text"] is None:
            assert r["by_udf"] == []
            continue  # Catalyst split(NULL) yields NULL — engine never feeds NULL text
        assert r["by_expr"] == expected
        assert r["by_udf"] == expected


def test_term_freqs_arrow_matches_catalyst(spark, documents):
    """The fused Arrow tokenize+tf pass (builder hot path) must produce
    exactly the (doc_id, term, tf, dl) set of the Catalyst
    tokenize→explode→groupBy pipeline."""
    from librecatastro_spark.stats import term_freqs, term_freqs_arrow

    docs = documents.limit(200)
    a = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_freqs_arrow(docs, "doc_id", "text").collect()
    }
    b = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_freqs(docs, "doc_id", "text").collect()
    }
    assert a == b and len(a) > 0


def test_token_count_udf_matches_size_expr(spark, documents):
    from librecatastro_spark.analyzer import token_count_udf

    rows = (
        documents.limit(200)
        .select(
            F.size(tokenize_expr("text")).alias("jvm"),
            token_count_udf(F.col("text")).alias("py"),
        )
        .collect()
    )
    assert len(rows) and all(r["jvm"] == r["py"] for r in rows)
