"""A19 bounded probe loop, A25 glob file-source fan-out, and the salted
build path at gate scale (round-3 additions)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from librecatastro_spark.ops.probe import bounded_probe_scan


def _probe_reference(pairs: dict[int, list[int]], k: int = 10) -> set[tuple[int, int]]:
    """Literal sequential probe loop (the reference's semantics) to check
    the closed-form window version against."""
    out = set()
    for key, vals in pairs.items():
        present = set(vals)
        misses = 0
        n = 1
        while misses < k:
            if n in present:
                out.add((key, n))
                misses = 0
            else:
                misses += 1
            n += 1
    return out


def test_bounded_probe_scan_matches_sequential_loop(spark):
    pairs = {
        1: [1, 2, 3, 30],          # 30 unreachable (gap 26 >= 10)
        2: [5, 14, 23, 40],        # all reachable until 40? gaps: 4,8,8,16
        3: [11],                   # gap before 11 is 10 -> unreachable
        4: [10, 21],               # 10 reachable (gap 9), 21 reachable (gap 10?) -> gap 21-10-1=10 -> stop
        5: [],                     # nothing
        6: [1, 1, 2],              # duplicates collapse
    }
    rows = [(k, v) for k, vs in pairs.items() for v in vs]
    df = spark.createDataFrame(rows or [(0, 0)], "key long, n long")
    got = {
        (r["key"], r["n"])
        for r in bounded_probe_scan(df, "key", "n", max_misses=10).collect()
    }
    assert got == _probe_reference(pairs, 10)


def test_glob_scan_excludes_decoys(spark, tmp_path):
    from librecatastro_spark.ops.filesource import glob_scan, materialize_glob_dir

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("driver testdata not present")
    d = materialize_glob_dir(sf, str(tmp_path / "glob"))
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    matched = glob_scan(spark, d, "docs_*.parquet")
    assert matched.count() == docs.count()  # decoy parquet excluded
    # leaking the decoy would inflate the count
    leaked = spark.read.option("pathGlobFilter", "*.parquet").parquet(d)
    assert leaked.count() > docs.count()
    # idempotent rematerialization
    assert materialize_glob_dir(sf, d) == d


def test_salted_build_is_rank_identical_and_recorded(spark, tmp_path):
    from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
    from librecatastro_spark.engine import ExactBM25
    from librecatastro_spark.engine.wand import CompressedIndex
    from librecatastro_spark.index.builder import build_index, manifest_records

    corpus = assign_doc_ids(
        generate_corpus(spark, 200, min_tokens=20, max_tokens=80, partitions=4)
    ).cache()
    out = str(tmp_path / "salted")
    build_index(spark, corpus, out, attr_cols=("lang",), n_shards=4,
                block_size=16, salt_threshold=20, n_salts=4)
    rec = manifest_records(out)["stage"]
    assert rec["salted_terms"] > 0  # the threshold really triggered
    # salt column populated beyond 0 in the posting blocks
    posts = spark.read.parquet(f"{out}/postings")
    assert posts.where(F.col("salt") > 0).count() > 0
    exact = ExactBM25(corpus, attr_cols=("lang",))
    idx = CompressedIndex(spark, out)
    for q in ["def return import", "spark partition", "id0003"]:
        a = [(r["doc_id"], r["score"]) for r in idx.search(q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in exact.search(q, k=10).collect()]
        assert a == b, q
