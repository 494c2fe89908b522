from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from librecatastro_spark.ops.address import parse_address
from librecatastro_spark.ops.geo import (
    EARTH_RADIUS_M,
    cell_agg,
    geo_distance,
    geohash_udf,
    lattice,
    points_in_polygon,
    polygon_bbox,
)
from librecatastro_spark.ops.similarity import (
    ann_lsh_topk,
    brute_force_pairs,
    cosine_topk,
    embedding_near_dup_banded,
    embedding_near_dup_pairs,
)

# a concave polygon (arrow shape) — exercises real ray casting, not bbox
POLY = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 2.0), (0.0, 4.0)]


def test_point_in_polygon_goldens(spark):
    # golden true/false membership (coordinates_searcher_tests.py:34-40 analog)
    pts = [(1.0, 1.0, True), (2.0, 1.9, True), (2.0, 3.5, False),
           (3.5, 3.9, False), (0.5, 3.0, True), (5.0, 1.0, False),
           (-1.0, -1.0, False)]
    df = spark.createDataFrame([(x, y) for x, y, _ in pts], "lon double, lat double")
    got = {(r["lon"], r["lat"]) for r in points_in_polygon(df, POLY).collect()}
    expected = {(x, y) for x, y, inside in pts if inside}
    assert got == expected


def test_bbox(spark):
    assert polygon_bbox(POLY) == (0.0, 0.0, 4.0, 4.0)


def test_lattice_grid_scan(spark):
    df = lattice(spark, (0.0, 0.0, 1.0, 1.0), scale=5)
    assert df.count() == 25
    inside = points_in_polygon(df, [(0, 0), (1, 0), (1, 1), (0, 1)]).count()
    assert inside == 25


def test_cell_agg(spark):
    df = spark.createDataFrame(
        [(0.01, 0.01), (0.05, 0.09), (0.11, 0.01), (-0.01, 0.0)],
        "lon double, lat double",
    )
    got = {(r["cell_lon"], r["cell_lat"]): r["n"] for r in cell_agg(df, scale=10).collect()}
    assert got == {(0, 0): 2, (1, 0): 1, (-1, 0): 1}


def _haversine_ref(lon, lat, lon0, lat0):
    import math

    p1, p2 = math.radians(lat0), math.radians(lat)
    dp = math.radians(lat - lat0)
    dl = math.radians(lon - lon0)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


def test_geo_distance_matches_brute_force(spark):
    """ES geo_distance: membership equals the textbook haversine ≤ r
    test on every lattice point — the bbox pruner must be conservative
    (never drop a true member)."""
    df = lattice(spark, (-30.0, -30.0, 30.0, 30.0), scale=1)
    got = {(r["lon"], r["lat"]) for r in
           geo_distance(df, 5.0, 10.0, 1_500_000.0).collect()}
    pts = [(r["lon"], r["lat"]) for r in df.collect()]
    want = {(x, y) for x, y in pts
            if _haversine_ref(x, y, 5.0, 10.0) <= 1_500_000.0}
    assert got == want and got


def test_geo_distance_pole_and_antimeridian_conservative(spark):
    """Near a pole (cos lat → 0) and across the antimeridian the lon
    bbox constraint must be DROPPED, not wrapped wrongly — membership
    still exact via the haversine predicate."""
    df = spark.createDataFrame(
        [(-179.5, 0.0), (179.5, 0.0), (0.0, 89.5), (180.0 - 0.5, 89.5),
         (10.0, 0.0)],
        "lon double, lat double",
    )
    # center just west of the antimeridian: (-179.5, 0) is ~0 km away,
    # (179.5, 0) is ~111 km away across the line — both within 200 km
    got = {(r["lon"], r["lat"]) for r in
           geo_distance(df, -179.9, 0.0, 200_000.0).collect()}
    assert got == {(-179.5, 0.0), (179.5, 0.0)}
    # polar center: every lon at lat 89.5 is within ~56 km of the pole
    got = {(r["lon"], r["lat"]) for r in
           geo_distance(df, 0.0, 90.0, 100_000.0).collect()}
    assert got == {(0.0, 89.5), (179.5, 89.5)}
    with pytest.raises(ValueError):
        geo_distance(df, 0.0, 0.0, 0.0)


def test_geo_filter_search_paths_identical(spark, tmp_path):
    """ES geo_distance as a search filter clause: exact engine and the
    compressed index agree rank-for-rank, and membership equals the
    unfiltered search intersected with the brute-force radius set."""
    from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
    from librecatastro_spark.engine import ExactBM25
    from librecatastro_spark.engine.wand import CompressedIndex
    from librecatastro_spark.index.builder import build_index

    docs = assign_doc_ids(
        generate_corpus(spark, 200, min_tokens=20, max_tokens=80, partitions=2)
    ).withColumn(
        "lon", (F.col("doc_id") % 360).cast("double") - 180.0
    ).withColumn(
        "lat", ((F.col("doc_id") * 7) % 180).cast("double") - 90.0
    ).cache()
    geo = ("lon", "lat", 20.0, 10.0, 3_000_000.0)
    exact = ExactBM25(docs, attr_cols=("lon", "lat"))
    out = str(tmp_path / "gidx")
    build_index(spark, docs, out, attr_cols=("lon", "lat"), n_shards=2,
                block_size=16, salt_threshold=1000, n_salts=2)
    cidx = CompressedIndex(spark, out)
    e = [(r["doc_id"], r["score"]) for r in
         exact.search("def return", k=10_000, geo=geo).collect()]
    c = [(r["doc_id"], r["score"]) for r in
         cidx.search("def return", k=10_000, geo=geo).collect()]
    assert e == c and e
    lo = cidx.search_local("def return", k=10_000, geo=geo)
    assert list(zip(lo["doc_id"].tolist(), lo["score"].tolist())) == e
    base = {r["doc_id"] for r in exact.search("def return", k=10_000).collect()}
    inside = {
        r["doc_id"] for r in docs.collect()
        if _haversine_ref(r["lon"], r["lat"], 20.0, 10.0) <= 3_000_000.0
    }
    assert {d for d, _ in e} == base & inside
    # geo_distance AGGREGATION over the same index: ring counts equal a
    # brute-force recompute; caller ring order; duplicate bounds rejected
    rings = [(None, 3e6), (3e6, 9e6), (9e6, None)]
    got = [(r["bucket"], r["cnt"]) for r in
           cidx.geo_distance_agg("def return", "lon", "lat", 20.0, 10.0,
                                 rings).collect()]
    dists = {
        r["doc_id"]: _haversine_ref(r["lon"], r["lat"], 20.0, 10.0)
        for r in docs.collect()
    }
    want = []
    for lo_b, hi_b in rings:
        n = sum(
            1 for d in base
            if (lo_b is None or dists[d] >= lo_b)
            and (hi_b is None or dists[d] < hi_b)
        )
        want.append(n)
    assert [c for _, c in got] == want and sum(want) == len(base)
    assert [b for b, _ in got] == ["*-3000000.0", "3000000.0-9000000.0",
                                   "9000000.0-*"]
    with pytest.raises(ValueError):
        cidx.geo_distance_agg("def return", "lon", "lat", 0.0, 0.0,
                              [(None, 1.0), (None, 1.0)])
    with pytest.raises(ValueError):
        cidx.geo_distance_agg("def return", "lon", "nope", 0.0, 0.0, rings)


def test_geohash_known_values(spark):
    # geopy-verifiable goldens: geohash of (lon=-5.6, lat=42.6) etc.
    df = spark.createDataFrame(
        [(-0.1278, 51.5074), (2.3522, 48.8566), (0.0, 0.0)],
        "lon double, lat double",
    )
    got = [r[0] for r in df.select(geohash_udf(F.col("lon"), F.col("lat"))).collect()]
    assert got[0].startswith("gcpv")   # London
    assert got[1].startswith("u09t")   # Paris
    assert got[2].startswith("s000")   # null island
    assert all(len(g) == 8 for g in got)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(3)
    base = rng.standard_normal((30, 8)).astype(np.float64)
    base[7] = base[0] + 0.001 * rng.standard_normal(8)  # planted near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_cosine_topk_exact(spark, vectors):
    q = [float(x) for x in vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(vectors, q, k=3).collect()]
    assert got[0] == (0, 1.0)
    assert got[1][0] == 7 and got[1][1] > 0.999


def test_ann_lsh_recall(spark, vectors):
    q = [float(x) for x in vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in cosine_topk(vectors, q, k=5).collect()]
    approx = [r["vec_id"] for r in ann_lsh_topk(vectors, q, k=5, n_planes=6).collect()]
    # multiprobe LSH must recover the near-identical neighbors
    assert exact[0] in approx and exact[1] in approx


def test_embedding_near_dup_pairs(spark, vectors):
    exact = {(r["vec_a"], r["vec_b"]) for r in brute_force_pairs(vectors, 0.99).collect()}
    lsh = {(r["vec_a"], r["vec_b"]) for r in
           embedding_near_dup_pairs(vectors, 0.99, n_planes=6).collect()}
    assert (0, 7) in exact
    assert lsh == exact  # near-identical vectors share every LSH bucket


def test_embedding_near_dup_banded_precision_and_recall(spark):
    """The banded path is exact-precision (every emitted pair is cosine-
    verified, so banded ⊆ brute ALWAYS) and high-but-not-total recall —
    which is why its driver oracle is the banded SQL twin, not the brute
    force. Measure recall against brute force at the gate corpus and
    assert both properties (measured: 100% @ sf0.001/sf0.01, 98.6%
    [907/920] @ sf0.1 — per the ≤1.7%-miss band bound in the docstring)."""
    import os

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    brute = {(r["vec_a"], r["vec_b"], r["cosine"])
             for r in brute_force_pairs(emb, 0.4).collect()}
    banded = {(r["vec_a"], r["vec_b"], r["cosine"])
              for r in embedding_near_dup_banded(
                  emb, 0.4, n_planes=16, bands=8).collect()}
    assert banded <= brute  # exact precision: no false pair, ever
    assert len(brute) > 0
    assert len(banded) / len(brute) >= 0.95  # recall at the band bound


def test_embedding_near_dup_banded_sql_twin_matches(spark):
    """The frozen-plane SQL twin must reproduce the Spark banded path
    bit-for-bit (rounded) — this is the driver-gate contract."""
    import os

    import duckdb

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    from librecatastro_spark.ops.similarity import embedding_near_dup_banded_sql

    emb = spark.read.parquet(path)
    banded = {(r["vec_a"], r["vec_b"], r["cosine"])
              for r in embedding_near_dup_banded(
                  emb, 0.4, n_planes=16, bands=8).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    twin = set(map(tuple, con.sql(
        embedding_near_dup_banded_sql(0.4, dim=64, n_planes=16, bands=8)
    ).fetchall()))
    assert banded == twin


def test_embedding_near_dup_banded_empty_input(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = embedding_near_dup_banded(emb, 0.4)
    assert out.columns == ["vec_a", "vec_b", "cosine"]
    assert out.count() == 0


def test_embedding_near_dup_pairs_empty_input(spark):
    from librecatastro_spark.ops.similarity import embedding_near_dup_pairs

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = embedding_near_dup_pairs(emb, 0.4)
    assert out.columns == ["vec_a", "vec_b", "cosine"]
    assert out.count() == 0


def test_embedding_near_dup_banded_no_cartesian(spark):
    import os

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    plan = embedding_near_dup_banded(emb, 0.4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoopJoin" not in plan


def test_geohash_precision_param(spark):
    from librecatastro_spark.ops.geo import make_geohash_udf

    df = spark.createDataFrame(
        [(-0.1278, 51.5074), (2.3522, 48.8566)], "lon double, lat double"
    )
    gh4 = make_geohash_udf(4)
    got = [r[0] for r in df.select(gh4(F.col("lon"), F.col("lat"))).collect()]
    assert got == ["gcpv", "u09t"]  # prefixes of the precision-8 values


def test_address_extraction_reference_shapes(spark):
    rows = [
        (0, "CL TESTTEST 17 03005 AJALVIR (MURCIA)"),
        (1, "CL NOCP 5 SOMEWHERE (MADRID)"),
        (2, "AV GRAN VIA 12 Es:1 Pl:02 Pt:A 28013 MADRID (MADRID)"),
        (3, "Polígono 12 Parcela 345 EL CAMPO (CÁCERES)"),
    ]
    df = spark.createDataFrame(rows, "id long, full_address string")
    got = {r["id"]: r["addr"] for r in df.select("id", parse_address("full_address").alias("addr")).collect()}
    a0 = got[0]
    assert a0["cp"] == "03005" and a0["province"] == "MURCIA"
    assert a0["city"] == "AJALVIR" and a0["street"] == "CL TESTTEST 17"
    a1 = got[1]
    assert a1["cp"] is None and a1["province"] == "MADRID"  # no-CP case
    a2 = got[2]
    assert (a2["doorway"], a2["floor"], a2["door"]) == ("1", "02", "A")
    assert a2["cp"] == "28013"
    a3 = got[3]
    assert (a3["site"], a3["lot"]) == ("12", "345")
    assert a3["province"] == "CÁCERES"


def test_address_line_split_13_field_parity(spark):
    # full reference Address semantics (address.py:51-84): split at '####'
    # (HTML) or at the first 5-digit CP (XML); street aliases first_line;
    # city = second_line minus parens minus separator minus cp
    rows = [
        (0, "CL TESTTEST 17 Es:1 Pl:02 Pt:A 03005 AJALVIR (MURCIA)"),
        (1, "CL HTML 9 Pl:01####28001 MADRID (MADRID)"),
        (2, "Polígono 12 Parcela 345 EL CAMPO (CÁCERES)"),
    ]
    df = spark.createDataFrame(rows, "id long, full_address string")
    from librecatastro_spark.ops.address import parse_address

    got = {r["id"]: r["addr"]
           for r in df.select("id", parse_address("full_address").alias("addr")).collect()}
    a0 = got[0]
    assert a0["first_line"] == "CL TESTTEST 17 Es:1 Pl:02 Pt:A"
    assert a0["second_line"] == "03005 AJALVIR (MURCIA)"
    assert a0["street"] == a0["first_line"]
    assert a0["province_parentheses"] == "(MURCIA)"
    assert len(a0.asDict()) == 13
    a1 = got[1]  # '####' separator wins over the CP position
    assert a1["first_line"] == "CL HTML 9 Pl:01"
    assert a1["second_line"] == "####28001 MADRID (MADRID)"
    assert a1["cp"] == "28001" and a1["city"] == "MADRID"
    assert a1["floor"] == "01"
    a2 = got[2]  # no split → both lines are the whole string (reference quirk)
    assert a2["first_line"] == a2["second_line"] == rows[2][1]
    assert a2["city"] == "Polígono 12 Parcela 345 EL CAMPO"


def test_geo_polygon_filter_search_paths_identical(spark, tmp_path):
    """ES geo_polygon as a search filter clause (r5) — the reference's
    flagship geo predicate (geo_polygon.py:36-54) available like every
    other filter: all three search paths agree rank-for-rank, and
    membership equals the unfiltered search intersected with the
    brute-force ray-cast set."""
    from librecatastro_spark.corpus import assign_doc_ids, generate_corpus
    from librecatastro_spark.engine import ExactBM25
    from librecatastro_spark.engine.wand import CompressedIndex
    from librecatastro_spark.index.builder import build_index
    from librecatastro_spark.ops.geo import ray_cast_np

    docs = assign_doc_ids(
        generate_corpus(spark, 200, min_tokens=20, max_tokens=80, partitions=2)
    ).withColumn(
        "lon", (F.col("doc_id") % 360).cast("double") - 180.0
    ).withColumn(
        "lat", ((F.col("doc_id") * 7) % 180).cast("double") - 90.0
    ).cache()
    polygon = [(-60.0, -40.0), (80.0, -30.0), (70.0, 60.0), (-50.0, 50.0)]
    geo = ("lon", "lat", polygon)
    exact = ExactBM25(docs, attr_cols=("lon", "lat"))
    out = str(tmp_path / "gpidx")
    build_index(spark, docs, out, attr_cols=("lon", "lat"), n_shards=2,
                block_size=16, salt_threshold=1000, n_salts=2)
    cidx = CompressedIndex(spark, out)
    e = [(r["doc_id"], r["score"]) for r in
         exact.search("def return", k=10_000, geo=geo).collect()]
    c = [(r["doc_id"], r["score"]) for r in
         cidx.search("def return", k=10_000, geo=geo).collect()]
    assert e == c and e
    lo = cidx.search_local("def return", k=10_000, geo=geo)
    assert list(zip(lo["doc_id"].tolist(), lo["score"].tolist())) == e
    base = {r["doc_id"] for r in exact.search("def return", k=10_000).collect()}
    pts = docs.select("doc_id", "lon", "lat").collect()
    xs = np.array([r["lon"] for r in pts])
    ys = np.array([r["lat"] for r in pts])
    inside = {
        r["doc_id"] for r, ok in zip(pts, ray_cast_np(xs, ys, polygon)) if ok
    }
    assert {d for d, _ in e} == base & inside
    # malformed clauses are rejected on every path
    for bad in (("lon", "lat", [(0.0, 0.0), (1.0, 1.0)]),
                ("lon", "lat", 1.0, 2.0)):
        with pytest.raises(ValueError):
            exact.search("def", k=5, geo=bad).collect()
        with pytest.raises(ValueError):
            cidx.search("def", k=5, geo=bad).collect()
        with pytest.raises(ValueError):
            cidx.search_local("def", k=5, geo=bad)
