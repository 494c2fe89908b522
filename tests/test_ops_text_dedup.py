from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from librecatastro_spark.ops.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    shingles_expr,
    simhash16_expr,
    simhash64_udf,
    simhash_near_pairs,
)
from librecatastro_spark.ops.text import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs away fast today"
    near = "the quick brown fox jumps over the lazy dog and runs away fast tonight"
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, "Exact  DUP, of zero!? " + base[4:]),   # same tokens, diff punct? no — different
        (3, near),                                  # near dup of 0
        (4, "def foo return bar import baz class qux lambda spam yield eggs while"),
        (5, "completely different content about spark partitions shuffles and joins here"),
        (6, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_count_and_fingerprint(spark, docs):
    r = {x["doc_id"]: x for x in docs.select(
        "doc_id", token_count_expr("text").alias("n"),
        fingerprint_expr("text").alias("fp")).collect()}
    assert r[0]["n"] == 14
    assert r[6]["n"] == 2
    assert r[0]["fp"] == r[1]["fp"]
    assert r[0]["fp"] != r[3]["fp"]


def test_exact_duplicates(docs):
    dups = {r["fingerprint"]: r for r in exact_duplicates(docs).collect()}
    counts = sorted(r["n_docs"] for r in dups.values())
    assert counts == [1, 1, 1, 1, 1, 2]
    dup_group = [r for r in dups.values() if r["n_docs"] == 2][0]
    assert dup_group["keep_id"] == 0


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",), ("",)], "text string")
    got = [r[0] for r in df.select(shingles_expr("text", 3)).collect()]
    assert got == [[], ["a b c"], []]


def test_jaccard_pairs_finds_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             jaccard_pairs(docs, threshold=0.4).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and 0.5 < pairs[(0, 3)] < 1.0
    assert (0, 5) not in pairs


def test_minhash_lsh_matches_exact_on_near_dups(docs):
    exact = {(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(docs, threshold=0.6).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_pairs(docs, threshold=0.6, n_hashes=16, bands=8).collect()}
    assert lsh <= exact  # verification guarantees precision
    assert exact == lsh  # with 8 bands × 2 rows recall at j≥0.6 is ~certain


def test_minhash_signature_identical_for_identical_docs(docs):
    sig = {r["doc_id"]: tuple(r)[1:] for r in minhash_signature(docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[5]
    # near-dup signatures agree on most components
    agree = sum(a == b for a, b in zip(sig[0], sig[3]))
    assert agree >= 8


def test_simhash_variants(docs):
    rows = {r["doc_id"]: r for r in docs.select(
        "doc_id", simhash16_expr("text").alias("s16"),
        simhash64_udf(F.col("text")).alias("s64")).collect()}
    assert rows[0]["s16"] == rows[1]["s16"]
    assert rows[0]["s64"] == rows[1]["s64"]
    assert 0 <= rows[0]["s16"] < (1 << 16)
    ham = bin(rows[0]["s64"] ^ rows[3]["s64"]).count("1")
    assert ham <= 12  # near dup → small hamming distance
    ham_far = bin(rows[0]["s64"] ^ rows[5]["s64"]).count("1")
    assert ham_far > ham


def test_simhash_near_pairs(docs):
    got = {(r["doc_a"], r["doc_b"]) for r in
           simhash_near_pairs(docs, max_hamming=12, bands=16).collect()}
    assert (0, 1) in got


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [(0, "the cat is on the mat and it is a fine day for the cats of the town"),
         (1, "def foo(x): return x " * 5)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", lang_id_expr("text").alias("lang"),
        quality_score_expr("text").alias("q")).collect()}
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "unk"
    assert 0.0 <= rows[1]["q"] <= 1.0


def test_simhash_band_keys_sign_safe(spark):
    """Band-0 keys must be the raw low bits even when the signed 64-bit
    simhash is negative (bit 63 set) — extracting with `%` instead of
    bitwiseAND gave sign-carrying keys, so a pair agreeing ONLY on band 0
    across the sign boundary never collided (missed-pair bug found at
    sf0.1, hamming 7, bands=8)."""
    from librecatastro_spark.ops.dedup import simhash_band_keys

    lo = 0x3A  # shared low byte
    neg = -(1 << 63) | lo          # bit 63 set → negative long
    pos = lo                        # bit 63 clear
    df = spark.createDataFrame([(neg,), (pos,)], "sh long")
    rows = df.select(
        F.explode(simhash_band_keys("sh", 8)).alias("c")
    ).select(F.col("c.band").alias("band"), F.col("c.key").alias("key"))
    keys = {}
    for r in rows.collect():
        keys.setdefault(r["band"], []).append(r["key"])
    # band 0: identical low byte → identical non-negative key
    assert keys[0][0] == keys[0][1] == lo
    # every key is within [0, 2^width)
    assert all(0 <= k < 256 for ks in keys.values() for k in ks)
    # band 7 differs (bit 63): 0x80 vs 0x00
    assert sorted(keys[7]) == [0, 128]


def test_simhash_near_pairs_matches_brute_force(docs):
    """Pigeonhole exact recall: for max_hamming < bands the banded join
    must return EXACTLY the brute-force all-pairs result."""
    sh = docs.select(
        "doc_id", simhash64_udf(F.col("text")).alias("sh")
    ).cache()
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= 7)
        .collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(docs, max_hamming=7, bands=8).collect()
    }
    assert banded == brute


def test_training_data_pipeline_composes(spark):
    """The composed curation chain (ops/pipeline.py) equals its DuckDB
    twin on the driver corpus, survivors are pairwise non-duplicate, and
    the plan contains no cartesian product."""
    import os

    import duckdb

    from librecatastro_spark.ops.pipeline import (
        training_data_pipeline,
        training_data_pipeline_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    docs_df = spark.read.parquet(path)
    out = training_data_pipeline(docs_df)
    assert "CartesianProduct" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = {tuple(r) for r in con.sql(training_data_pipeline_sql()).fetchall()}
    assert rows == want and len(rows) > 0
    # survivors: unique fingerprints AND no exact-jaccard pair >= 0.5 left
    ids = [r[0] for r in rows]
    kept_docs = docs_df.where(F.col("doc_id").isin(ids))
    fps = kept_docs.select(fingerprint_expr("text")).collect()
    assert len({r[0] for r in fps}) == len(ids)
    assert jaccard_pairs(kept_docs, threshold=0.5).count() == 0


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_gated_lsh_recall_complete_on_shipped_corpora(spark, sf):
    """The gated dedup_minhash_lsh config (32 hashes x 16 bands, j>=0.5)
    is recall-complete vs exact Jaccard on EVERY shipped test corpus —
    the measured counterpart of the banded oracle twin (which only
    proves Spark==DuckDB on the same candidate set). Precision is
    structural (exact verify), so set equality checks recall."""
    import os

    path = f"/root/testdata/{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    docs_df = spark.read.parquet(path).select(
        F.col("doc_id"), F.col("text")
    )
    exact = {(r["doc_a"], r["doc_b"]) for r in
             jaccard_pairs(docs_df, threshold=0.5).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_pairs(docs_df, threshold=0.5, n_hashes=32, bands=16).collect()}
    assert lsh <= exact
    assert exact == lsh, f"missed {len(exact - lsh)}/{len(exact)} pairs"


def test_simhash_combo_keys_exact_recall(spark):
    """Block-combination keys (combo=5 of 8 blocks, 40-bit keys) must
    return EXACTLY the brute-force pairs at h<=3 — the pigeonhole bound
    max_hamming <= blocks - combo at the production operating point —
    on the shipped sf0.001 corpus."""
    docs_df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    sh = docs_df.select(
        "doc_id", simhash64_udf(F.col("text")).alias("sh")
    ).cache()
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    combo = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_pairs(
            docs_df, max_hamming=3, bands=8, combo=5
        ).collect()
    }
    assert combo == brute and len(brute) > 0


def test_simhash_combo_recall_condition_enforced():
    with pytest.raises(ValueError):
        from librecatastro_spark.ops.dedup import simhash_near_pairs as snp
        # h=7 with combo=2 of 8 blocks breaks pigeonhole (7 > 8-2)
        snp(None, max_hamming=7, bands=8, combo=2)


def test_simhash_dedup_survivors(spark):
    """simhash_dedup drop-list semantics on sf0.001: survivors are
    exactly the min-id reps whose rep is never the higher element of a
    qualifying (hamming<=3) rep pair; every dropped non-rep shares a sig
    with a surviving-or-dropped lower id."""
    from librecatastro_spark.ops.dedup import simhash_dedup

    docs_df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    sh = docs_df.select(
        "doc_id", simhash64_udf(F.col("text")).alias("sh")
    ).cache()
    survivors = {r[0] for r in simhash_dedup(docs_df).collect()}
    reps = {r["rep"] for r in
            sh.groupBy("sh").agg(F.min("doc_id").alias("rep")).collect()}
    assert survivors <= reps and len(survivors) > 0
    # reference: brute-force rep pairs, greedy drop-higher
    rep_sig = {r["rep"]: r["sig"] for r in
               sh.groupBy("sh").agg(F.min("doc_id").alias("rep"),
                                    F.first("sh").alias("sig")).collect()}
    rl = sorted(rep_sig)
    drop = set()
    for i, ra in enumerate(rl):
        for rb in rl[i + 1:]:
            # mask to 64 bits: sigs are SIGNED longs, and Python's xor of
            # negatives would otherwise popcount the wrong bit pattern
            if bin((rep_sig[ra] ^ rep_sig[rb]) & ((1 << 64) - 1)).count("1") <= 3:
                drop.add(rb)
    assert survivors == reps - drop


# ---------------------------------------------------- chunking / LM ----

def test_chunk_windows_exact(spark):
    """Chunk boundaries against a driver-side replica: stride = max -
    overlap, last chunk is the first window reaching the end, no
    strict-suffix trailing chunk, zero-token docs emit nothing."""
    from librecatastro_spark.ops.chunk import chunk_documents

    toks = [f"t{i}" for i in range(11)]
    rows = [
        (0, " ".join(toks)),        # 11 tokens
        (1, " ".join(toks[:5])),    # 5 tokens -> one chunk
        (2, " ".join(toks[:7])),    # exactly max_tokens -> one chunk
        (3, "!!! ???"),             # zero tokens -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=7, overlap=2, text_col="text")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }

    def replica(tokens, mx=7, ov=2):
        st = mx - ov
        if not tokens:
            return {}
        i_max = max(0, -(-(len(tokens) - mx) // st))  # python ceil
        return {
            i: (len(tokens[i * st:i * st + mx]),
                " ".join(tokens[i * st:i * st + mx]))
            for i in range(i_max + 1)
        }

    want = {}
    for doc_id, text in rows:
        ts = [t for t in text.lower().split() if t.isalnum() or "_" in t]
        ts = [t for t in ts if t not in ("!!!", "???")]
        for cid, v in replica(ts).items():
            want[(doc_id, cid)] = v
    assert got == want
    # every consecutive pair overlaps by exactly `overlap` tokens except
    # possibly the last (clamped at doc end)
    c0 = [v[1].split() for k, v in sorted(got.items()) if k[0] == 0]
    assert c0[0][-2:] == c0[1][:2]


def test_chunk_invalid_overlap_raises(spark):
    from librecatastro_spark.ops.chunk import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4, text_col="text")


def test_unigram_logprob_ranks_rare_docs_low(spark, docs):
    """A doc of one-off identifiers must score below a doc made of the
    corpus's most common tokens, and every score is a negative mean of
    per-token corpus log-probabilities (verified per doc vs a driver
    replica)."""
    import math

    from librecatastro_spark.analyzer import analyze_text
    from librecatastro_spark.ops.text import unigram_logprob

    out = {r["doc_id"]: r["lm_score"]
           for r in unigram_logprob(docs, text_col="text").collect()}
    cf: dict[str, int] = {}
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        for t in analyze_text(r["text"]):
            cf[t] = cf.get(t, 0) + 1
    total = sum(cf.values())
    for r in rows:
        ts = analyze_text(r["text"])
        if not ts:
            assert r["doc_id"] not in out
            continue
        want = round(sum(math.log(cf[t] / total) for t in ts) / len(ts), 4)
        assert abs(out[r["doc_id"]] - want) <= 1e-4
    assert out[4] < out[0]  # identifier soup below common-token doc


# ----------------------------------------------- duplicate clustering ----

def test_connected_components_chains_cycles_cliques(spark):
    """Transitivity through chains (multi-round propagation), cycles,
    cliques, direction- and duplicate-insensitivity, and singleton
    omission."""
    from librecatastro_spark.ops.cluster import connected_components

    edges = [
        (2, 1), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),  # chain
        (10, 11), (11, 10),                                      # dup/dir
        (30, 31), (31, 32), (32, 30),                            # cycle
        (40, 40),                                                # self-loop
    ]
    df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(df, checkpoint_every=2).collect()}
    want = {n: 1 for n in range(1, 9)}
    want.update({10: 10, 11: 10, 30: 30, 31: 30, 32: 30})
    assert got == want  # 40's self-loop emits nothing


def test_connected_components_max_iter_raises(spark):
    from librecatastro_spark.ops.cluster import connected_components

    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "doc_id_a long, doc_id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=2)


# -------------------------------- decontamination + repetition signals ----

def test_decontaminate_hand_checked(spark):
    """Doc 1 shares a 3-gram with the bench doc 0; doc 2 shares none;
    doc 0 (in the bench itself) is fully contaminated; a too-short doc
    has zero n-grams and is clean by definition."""
    from librecatastro_spark.ops.decontaminate import decontaminate

    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "prefix words then beta gamma delta and more tail words"),
        (2, "totally different tokens nothing shared with the benchmark"),
        (3, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") == 0)
    got = {r["doc_id"]: r for r in
           decontaminate(docs, bench, text_col="text", n=3).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["contaminated"] and got[0]["n_contaminated"] == got[0]["n_ngrams"] == 3
    assert got[1]["contaminated"] and got[1]["n_contaminated"] == 1
    assert not got[2]["contaminated"] and got[2]["n_contaminated"] == 0
    assert not got[3]["contaminated"] and got[3]["n_ngrams"] == 0


def test_decontaminate_counts_distinct_ngrams_once(spark):
    """A doc repeating one contaminated n-gram 3x still counts it ONCE
    (set semantics on both sides)."""
    from librecatastro_spark.ops.decontaminate import decontaminate

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c x a b c y a b c")],
        "doc_id long, text string",
    )
    bench = docs.where(F.col("doc_id") == 0)
    got = {r["doc_id"]: r for r in
           decontaminate(docs, bench, text_col="text", n=3).collect()}
    assert got[1]["n_contaminated"] == 1


def test_repetition_signals_hand_checked(spark):
    """top_bigram_frac = max bigram multiplicity / total bigrams;
    dup_trigram_frac = 1 - distinct/total trigrams; zero-gram docs 0.0."""
    from librecatastro_spark.ops.text import repetition_signals

    rows = [
        (0, "a b a b a b"),        # bigrams: ab,ba,ab,ba,ab -> top 3/5
        (1, "w x y z"),            # all bigrams distinct -> 1/3
        (2, "solo"),               # no bigrams/trigrams
        (3, "a b c a b c a b c"),  # trigrams: 7 total, 3 distinct
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           repetition_signals(docs, text_col="text").collect()}
    assert got[0]["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert got[1]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert got[2]["top_bigram_frac"] == 0.0 and got[2]["dup_trigram_frac"] == 0.0
    assert got[3]["dup_trigram_frac"] == pytest.approx(1 - 3 / 7, abs=1e-4)


def test_redact_pii_hand_checked(spark):
    from librecatastro_spark.ops.pii import redact_pii

    rows = [
        (0, "mail a.b+c@ex-ample.org then 192.168.001.42 then +34912345678 ok"),
        (1, "no pii here just words"),
        (2, "two mails x@y.io and z@w.co; ip 1.2.3.4"),
        (3, "digits 12345678 too short; 1234567890123456 too long"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs, text_col="text").collect()}
    assert got[0]["n_email"] == got[0]["n_ip"] == got[0]["n_phone"] == 1
    assert got[0]["clean_text"] == "mail <EMAIL> then <IP> then <PHONE> ok"
    assert got[1]["clean_text"] == "no pii here just words"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (0, 0, 0)
    assert got[2]["n_email"] == 2 and got[2]["n_ip"] == 1
    # 8 digits: below the phone floor; 16 digits: above the ceiling
    assert got[3]["n_phone"] == 0 and "<PHONE>" not in got[3]["clean_text"]


def test_redact_pii_sequential_no_double_count(spark):
    """The email pass consumes 'user123456789@x.io' whole — the phone
    pass must NOT count the digit run inside it."""
    from librecatastro_spark.ops.pii import redact_pii

    docs = spark.createDataFrame(
        [(0, "user123456789@x.io wrote")], "doc_id long, text string"
    )
    r = redact_pii(docs, text_col="text").collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0
    assert r["clean_text"] == "<EMAIL> wrote"
