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
