"""Physical-plan audit → PLANS.md.

Dumps `.explain("formatted")` for the engine's key paths and greps each
plan for the scale-critical properties (SURVEY.md §4): Parquet
PushedFilters reaching the scan, partition pruning on the shard dirs,
WholeStageCodegen spans around the Catalyst parts, broadcast joins where
a small side exists, and the absence of unexpected exchanges.

Usage: python tools/explain_audit.py [sf_dir]   (default sf0.001)
Writes PLANS.md at the repo root.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.builder import build_index, load_term_stats
from librecatastro_spark.session import get_spark


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    "pushed_filter": "PushedFilters: [",
    "codegen": "codegen id :",  # formatted-mode marker for WholeStageCodegen spans
    "broadcast": "BroadcastHashJoin",
    "exchange": "Exchange",
    "take_ordered": "TakeOrderedAndProject",
    "cartesian": "CartesianProduct",
    "pushed_startswith": "StartsWith",
    "window": "Window",
    "explode": "Generate",
    "arrow_eval": "ArrowEvalPython",
    "grouped_map": "FlatMapGroupsInPandas",
    "cogrouped_map": "FlatMapCoGroupsInPandas",
    "single_partition": "Exchange SinglePartition",
}


def audit(name: str, df, expect: dict[str, bool], notes: str) -> tuple[str, list[str]]:
    plan = formatted_plan(df)
    problems = []
    for key, want in expect.items():
        have = CHECKS[key] in plan
        if have != want:
            problems.append(
                f"{name}: expected {CHECKS[key]!r} {'present' if want else 'absent'}"
            )
    lines = [f"## {name}", "", notes, ""]
    for key, want in expect.items():
        have = CHECKS[key] in plan
        mark = "OK " if have == want else "!! "
        lines.append(
            f"- {mark}`{CHECKS[key]}` {'present' if have else 'absent'}"
            f" (expected {'present' if want else 'absent'})"
        )
    lines += ["", "```", plan.strip(), "```", ""]
    return "\n".join(lines), problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", cores=4, shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="lc_audit_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx_dir = os.path.join(work, "index")
    build_index(
        spark, docs, idx_dir, id_col="doc_id", text_col="text",
        attr_cols=("lang", "source", "n_chars"), n_shards=4, shards_per_job=4,
        salt_threshold=10_000, n_salts=4, resume=False,
    )
    index = CompressedIndex(spark, idx_dir)

    sections: list[str] = []
    problems: list[str] = []

    s, p = audit(
        "Keyword-filtered corpus scan (B4 analog)",
        docs.where(F.col("lang") == "py").select("doc_id", "lang"),
        {"pushed_filter": True, "codegen": True, "exchange": False},
        "Equality on a keyword column must reach the Parquet scan as a "
        "pushed filter, stay in codegen, and shuffle nothing.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "Term lookup into the posting table (query fast path)",
        index.postings.where(F.col("term").isin(["query", "scan"])),
        {"pushed_filter": True, "codegen": True, "exchange": False},
        "The isin(term) predicate must be pushed to Parquet; files are "
        "written term-sorted per shard so min/max row-group stats prune "
        "(the Lucene term-dictionary seek analog).",
    )
    sections.append(s); problems += p

    s, p = audit(
        "BM25 top-k via WAND scorer (unfiltered)",
        index.search("query scan", k=10),
        {"take_ordered": True},
        "Per-shard grouped-map scorer then a single global "
        "TakeOrderedAndProject merge — the ES shard-fanout/coordinator "
        "pattern; the only exchange is the query-term blocks.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "Keyword-FILTERED WAND query (B4+B14 — r2 pushdown fix)",
        index.search("query scan", k=10, filters={"lang": "py"}),
        {"pushed_filter": True, "take_ordered": True},
        "The keyword predicate is applied to the attrs table in CATALYST "
        "before the cogroup, so it reaches the attrs Parquet scan as a "
        "PushedFilter and the scorer receives only surviving "
        "(shard, doc_id) pairs — round 1 shipped the whole attrs "
        "partition into pandas instead.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "Prefix-FILTERED WAND query (B5+B14 — r2 pushdown fix)",
        index.search("query scan", k=10, prefix=("lang", "p")),
        {"pushed_filter": True, "pushed_startswith": True, "take_ordered": True},
        "StartsWith pushes to the Parquet scan exactly like equality.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "match_phrase verify-first plan (r3)",
        index.match_phrase("the scan", docs, k=10, source_text_col="text"),
        {
            "pushed_filter": True, "take_ordered": True, "cartesian": False,
        },
        "Verify-first: the Arrow CPython-regex phrase predicate "
        "(ArrowEvalPython) runs on the source scan pruned by the "
        "phrase terms' posting-range window (BETWEEN pushed as "
        "PushedFilters); the verified ids join attrs (doc->shard) and "
        "feed the FILTERED cogroup scorer with the top-k cut enabled — "
        "every intermediate O(phrase matches), merge via "
        "TakeOrderedAndProject. The window also prunes the postings "
        "scan (first/last_doc_id footer stats). No cartesian.",
    )
    sections.append(s); problems += p

    pos_dir = os.path.join(work, "posindex")
    build_index(
        spark, docs, pos_dir, id_col="doc_id", text_col="text",
        attr_cols=("lang", "source"), n_shards=4, shards_per_job=4,
        salt_threshold=10_000, n_salts=4, resume=False,
        index_options="positions",
    )
    pindex = CompressedIndex(spark, pos_dir)
    s, p = audit(
        "match_phrase_positional index-only plan (r3 positional postings)",
        pindex.match_phrase_positional("the scan", k=10),
        {
            "pushed_filter": True, "take_ordered": True, "cartesian": False,
            "arrow_eval": False, "grouped_map": True,
        },
        "Index-only phrase: the ONLY relation in the plan is the postings "
        "scan (In(term) + doc-window BETWEEN pushed to Parquet footer "
        "stats); NO ArrowEvalPython means the source table is never "
        "scanned — phrase verify + BM25 scoring happen inside the one "
        "per-shard grouped map (FlatMapGroupsInPandas) over decoded "
        "position streams, and the merge is TakeOrderedAndProject. The "
        "query's data volume is O(phrase terms' postings) at any corpus "
        "size — the property the verify-first path cannot give on hot "
        "phrases.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "match_phrase_prefix positional index-only plan (r4)",
        pindex.match_phrase_prefix_positional("the sc", k=10),
        {
            "pushed_filter": True, "take_ordered": True, "cartesian": False,
            "arrow_eval": False, "grouped_map": True,
        },
        "Index-only type-ahead: ONE postings scan covers both roles — "
        "In(complete terms) OR the [pfx, successor) range, both pushed "
        "to the term-sorted Parquet files, doc-window BETWEEN from the "
        "complete terms' block metadata. NO ArrowEvalPython (the source "
        "table is never scanned — the cost verify-first pays on every "
        "type-ahead keystroke); the expansion streams chain inside the "
        "per-shard grouped map with a zero-slop step and are never "
        "collected. Merge is TakeOrderedAndProject.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "function_score field-boost plan (r3 compound scoring)",
        index.function_score("the scan", "n_chars", k=10),
        {
            "pushed_filter": True, "take_ordered": True, "cartesian": False,
            "cogrouped_map": True,
        },
        "Score reshaping voids BM25 block-max bounds, so the kernel "
        "decodes the query terms' postings fully (the AND-branch bill); "
        "the numeric field cogroups shard-locally (each shard ships only "
        "its own (doc_id, field) rows — never a global join), the "
        "In(term) predicate is pushed to the postings scan, and the "
        "merge is TakeOrderedAndProject.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "dis_max multi-clause plan (r3 compound scoring)",
        index.dis_max(["the scan", "data model"], k=10, tie_breaker=0.3),
        {
            "pushed_filter": True, "take_ordered": True, "cartesian": False,
            "grouped_map": True,
        },
        "ONE postings scan covers every clause's terms (union of In "
        "filters); per-shard the kernel computes each clause's sums and "
        "max-combines — no second scan per clause, no cartesian.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "constant_score filter plan (r3 compound scoring)",
        index.constant_score(k=10, filters={"lang": "py"}),
        {
            "pushed_filter": True, "codegen": True, "grouped_map": False,
            "arrow_eval": False,
        },
        "Pure Catalyst over the attrs table: the filter reaches the "
        "Parquet scan as PushedFilters, postings are never read, and no "
        "Python stage exists anywhere in the plan — a filter-only query "
        "costs a pruned columnar scan plus a top-k, nothing else.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "fuzzy_term_search expansion plan (r3)",
        index.fuzzy_term_search("scen", k=10, max_edits=1),
        {"pushed_filter": True, "cartesian": False},
        "Dictionary expansion (vocab scan + codegen Levenshtein) runs "
        "eagerly and is vocab-bounded; the final plan pushes the matched "
        "terms into the postings scan as In(term,…) — row-group pruning "
        "via the term-sorted files, exactly like an exact term query.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "search_highlighted snippet plan (r3)",
        index.search_highlighted("the scan", docs, k=10, source_text_col="text"),
        {"broadcast": True, "cartesian": False, "explode": True},
        "Snippets tokenize ONLY the k hit docs: the hit ids broadcast into "
        "a semi-join against the source before the higher-order-function "
        "fragment projection. The Generate (explode-array barrier) must "
        "stay in the plan — it pins the token array to ONE evaluation per "
        "row; without it CollapseProject re-inlines tokenize under the "
        "HOF lambdas and the fragment step goes O(tokens^2) per doc.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "search_after keyset page plan (r3)",
        index.search("the scan", k=10, search_after=(2.0, 100)),
        {"take_ordered": True, "cartesian": False},
        "Keyset cursor: each shard filters on the rounded (score, doc_id) "
        "tuple INSIDE the scorer and returns only its local top-k past "
        "the cursor, restated as a Catalyst Filter above the partial — "
        "shuffle stays O(shards x k) at any page depth (offset pages "
        "grow every shard's window to k+offset instead).",
    )
    sections.append(s); problems += p

    s, p = audit(
        "collapse_search field-collapsing plan (r3)",
        index.collapse_search("the scan", "lang", k=5),
        {"window": True, "take_ordered": True, "cartesian": False},
        "Each shard emits its per-key best capped at its local top-k "
        "keys (exact by pigeonhole even though keys span shards), so the "
        "key-partitioned Window re-collapse and the TakeOrderedAndProject "
        "merge see O(shards x k) rows, never the match set.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "top_hits terms-bucket plan (r4 de-serialized key rank)",
        index.top_hits_agg("the scan", "lang", k_per_group=2, n_groups=3),
        {"window": True, "single_partition": False, "take_ordered": True,
         "cartesian": False},
        "Per-key top-j is a key-PARTITIONED Window; the winning keys are "
        "a map-side-combined groupBy + orderBy().limit(n_groups) "
        "(TakeOrderedAndProject) semi-joined back — NO partition-less "
        "Window (Exchange SinglePartition absent), so no single task "
        "ever sorts the O(distinct group keys) frame of a hot query.",
    )
    sections.append(s); problems += p

    # multi-field: two sub-indexes over the same docs/shard split
    from librecatastro_spark.engine.multifield import MultiFieldIndex

    mf_dir = os.path.join(work, "mf_idx")
    mf = MultiFieldIndex.build(
        spark, docs, mf_dir, fields=("text", "source"),
        n_shards=4, block_size=32,
    )
    s, p = audit(
        "multi_match shard-local combine plan (r3)",
        mf.multi_match("the src3", k=10, tie_breaker=0.3),
        {"pushed_filter": True, "take_ordered": True, "cartesian": False},
        "Per-field posting blocks (In(term,…) pushed to each sub-index "
        "scan) union and group by shard ONCE — sub-indexes share the "
        "doc-id range split, so a doc's postings for every field are in "
        "the same task and the cross-field combine (max/sum of per-field "
        "BM25) happens inside the grouped kernel: ONE shuffle keyed by "
        "shard, exact post-combine top-k, TakeOrderedAndProject merge.",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.chunk import chunk_documents

    s, p = audit(
        "doc chunking fan-out plan (r3)",
        chunk_documents(docs, max_tokens=40, overlap=8, text_col="text"),
        {"explode": True, "exchange": False, "cartesian": False},
        "Overlapping token windows are pure per-row fan-out: tokenize "
        "behind the Generate barrier, sequence+slice per chunk — NO "
        "Exchange anywhere; output inherits the corpus partitioning, "
        "which is what a 100 TB packing pass needs.",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.text import unigram_logprob

    s, p = audit(
        "unigram-LM scoring plan (r3)",
        unigram_logprob(docs, text_col="text"),
        {"broadcast": True, "cartesian": False},
        "The vocab-sized corpus-frequency table broadcasts into the "
        "token-explode scan (BroadcastHashJoin); the only shuffle is the "
        "doc-keyed mean with map-side partial aggregation.",
    )
    sections.append(s); problems += p

    emb_path = f"{sf_dir}/embeddings.parquet"
    if os.path.exists(emb_path):
        from librecatastro_spark.ops.similarity import embedding_near_dup_banded

        s, p = audit(
            "Embedding near-dup, banded-LSH path (r2 scale fix)",
            embedding_near_dup_banded(spark.read.parquet(emb_path), 0.4),
            {"cartesian": False},
            "Candidates come from an equi-self-join on (band_idx, "
            "band_val) — NO cartesian product anywhere in the plan "
            "(round 1 gated the brute-force cross join).",
        )
        sections.append(s); problems += p

    from librecatastro_spark.ops.dedup import minhash_lsh_pairs

    s, p = audit(
        "MinHash-LSH near-dup (band equi-join + explode-barrier signature, r3)",
        minhash_lsh_pairs(docs),
        {"cartesian": False, "explode": True},
        "Candidates come from an equi-self-join on (band, key) — no "
        "cartesian anywhere. The signature array is materialized behind an "
        "explode(array(...)) barrier (Generate present) so the 16 mh "
        "columns are attribute indexings, not 16 re-inlined copies of the "
        "tokenize→shingle→md5 pipeline (the r3 O(tokens²) fix).",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.pipeline import training_data_pipeline

    s, p = audit(
        "Composed training-data curation pipeline (r3)",
        training_data_pipeline(docs),
        {"cartesian": False, "window": True, "broadcast": True},
        "lang-ID + quality filters fold into the scan projection; exact "
        "dedup is one hash-partitioned Window (min doc_id per "
        "fingerprint); near-dup candidates come from the LSH band "
        "equi-join (no cartesian); the final drop-set anti-join is an "
        "explicit broadcast.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "match_phrase_prefix verify-first plan (r3)",
        index.match_phrase_prefix("the sc", docs, k=10, source_text_col="text"),
        {"pushed_filter": True, "take_ordered": True, "cartesian": False},
        "Type-ahead phrase shares match_phrase's shape: source verify "
        "scan pruned to the COMPLETE terms' posting-range window "
        "(BETWEEN pushed), Arrow CPython-regex predicate with the open "
        "prefix tail, verified ids feed the filtered scorer, "
        "TakeOrderedAndProject merge. No cartesian.",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.decontaminate import decontaminate

    s, p = audit(
        "Benchmark decontamination plan (r3)",
        decontaminate(docs, docs.where(F.col("doc_id") % 97 == 0),
                      text_col="text", n=5),
        {"broadcast": True, "cartesian": False, "explode": True},
        "The eval slice's distinct n-grams BROADCAST into the corpus-side "
        "n-gram explode as a LeftSemi BroadcastHashJoin — the corpus is "
        "never shuffled on the join key; the only corpus-keyed exchange "
        "is the per-doc hit-count aggregate (map-side combined).",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.text import repetition_signals

    s, p = audit(
        "Gopher repetition signals plan (r3)",
        repetition_signals(docs, text_col="text"),
        {"exchange": False, "explode": False, "cartesian": False},
        "Both signals are per-row Catalyst expressions — the top-bigram "
        "multiplicity is a sorted-run fold over the row's own bigram "
        "array (max run of equal neighbours == max multiplicity), so the "
        "plan is a bare scan projection: NO Exchange, NO Generate. The "
        "explode→groupBy(doc,bigram)→groupBy(doc) alternative would cost "
        "two corpus-sized shuffles.",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.pii import redact_pii

    s, p = audit(
        "PII redaction plan (r3)",
        redact_pii(docs, text_col="text"),
        {"exchange": False, "codegen": True, "cartesian": False},
        "Sequential regexp_count/regexp_replace passes are JVM intrinsics "
        "in one codegen'd scan projection — shuffle-free, Python-free.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "composite agg keyset page plan (r3)",
        index.composite_agg("the scan", "lang", size=4, after="a"),
        {"take_ordered": True, "cartesian": False},
        "The after-cursor filters keys INSIDE the per-shard combine "
        "(key predicates commute with sum-by-key), so the shuffle "
        "carries only post-cursor keys and the page cut is a "
        "TakeOrderedAndProject, never a full sort.",
    )
    sections.append(s); problems += p

    geo_dir = os.path.join(work, "geo_idx")
    geo_docs = docs.withColumn(
        "lon", (F.col("doc_id") % 720) / 2.0 - 180.0
    ).withColumn("lat", ((F.col("doc_id") * 7) % 360) / 2.0 - 90.0)
    build_index(
        spark, geo_docs, geo_dir, id_col="doc_id", text_col="text",
        attr_cols=("lon", "lat"), n_shards=4, shards_per_job=4,
        salt_threshold=10_000, n_salts=4, resume=False,
    )
    geo_index = CompressedIndex(spark, geo_dir)
    s, p = audit(
        "geo_distance-FILTERED WAND query (r4)",
        geo_index.search("the scan", k=10,
                         geo=("lon", "lat", 0.0, 0.0, 2_000_000.0)),
        {"pushed_filter": True, "take_ordered": True, "cartesian": False},
        "The conservative radius bbox is four plain comparisons that "
        "reach the attrs Parquet scan as PushedFilters (row-group min/"
        "max pruning eliminates almost every file before any trig); the "
        "exact haversine predicate evaluates in codegen above the scan, "
        "and the scorer cogroup ships only surviving (shard, doc_id) "
        "pairs. Merge is TakeOrderedAndProject.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "geo_polygon-FILTERED WAND query (r5)",
        geo_index.search(
            "the scan", k=10,
            geo=("lon", "lat",
                 [(-60.0, -40.0), (80.0, -30.0), (70.0, 60.0),
                  (-50.0, 50.0)]),
        ),
        {"pushed_filter": True, "take_ordered": True, "cartesian": False,
         "arrow_eval": True},
        "The vertex bbox is four plain comparisons that reach the attrs "
        "Parquet scan as PushedFilters; ONLY the bbox survivors flow "
        "through the Arrow-batched ray-cast re-check (ArrowEvalPython — "
        "O(bbox selectivity × corpus) rows cross the Python boundary, "
        "never the corpus), and the scorer cogroup ships only surviving "
        "(shard, doc_id) pairs. Merge is TakeOrderedAndProject.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "Shard partition pruning (resume-unit read)",
        index.postings.where(F.col("shard") == 2),
        {"pushed_filter": False, "codegen": True, "exchange": False},
        "shard is a PARTITION column: the predicate prunes directories at "
        "planning time (PartitionFilters), never reaching row filters.",
    )
    sections.append(s); problems += p

    s, p = audit(
        "Bounded probe loop (A19 — closed-form window, r3)",
        __import__(
            "librecatastro_spark.ops.probe", fromlist=["bounded_probe_scan"]
        ).bounded_probe_scan(docs.select("lang", "n_chars"), "lang", "n_chars"),
        {"window": True, "explode": False},
        "Probe-until-k-consecutive-misses is two window functions over the "
        "PRESENT values (O(rows), one hash partition by key) — no "
        "sequence()+explode materialization of the probe space, which at "
        "100 TB would generate billions of phantom probe rows (Generate "
        "absent).",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.dedup import dedup_paragraphs

    s, p = audit(
        "Paragraph-level dedup plan (r3)",
        dedup_paragraphs(docs, para_tokens=3, min_df=2),
        {"broadcast": True, "cartesian": False, "explode": True},
        "Paragraph df counts are one map-side-combinable groupBy over the "
        "exploded paragraphs; the duplicate SET (df >= min_df — a tiny "
        "fraction of distinct paragraphs) is explicitly BROADCAST back, "
        "so the removal pass is a broadcast-hash probe, not a "
        "corpus-keyed equi-join on paragraph text; the rebuild is one "
        "doc-keyed shuffle.",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.chunk import pack_sequences

    s, p = audit(
        "Sequence packing plan (r3)",
        pack_sequences(docs, budget=200, n_buckets=8, text_col="text"),
        {"window": True, "explode": False, "cartesian": False},
        "Cumulative-token packing is BUCKET-PARALLEL: one shuffle on the "
        "hash bucket, then a per-bucket running-sum Window ordered by "
        "doc_id — no single global window serializing the corpus through "
        "one partition, and no Generate (token counts come from size(), "
        "never an exploded token table).",
    )
    sections.append(s); problems += p

    from librecatastro_spark.ops.sampling import stratified_sample

    s, p = audit(
        "Stratified sampling plan (r3)",
        stratified_sample(docs, {"py": 0.5, "md": 0.25}),
        {"exchange": False, "codegen": True, "cartesian": False},
        "The md5-bucket survival test is a pure scan-projection filter "
        "(md5/conv/CASE are codegen intrinsics) — shuffle-free, "
        "Python-free, deterministic at any parallelism.",
    )
    sections.append(s); problems += p

    # broadcast evidence: stage-2 stats join
    staged = spark.read.parquet(os.path.join(idx_dir, "_stage", "postings"))
    tstats = load_term_stats(spark, idx_dir)
    s, p = audit(
        "Stage-2 df-per-term join (build path)",
        staged.join(F.broadcast(tstats.select("term", "df")), "term"),
        {"broadcast": True},
        "Vocabulary-sized stats side is explicitly broadcast — no shuffle "
        "of the full postings for the join.",
    )
    sections.append(s); problems += p

    header = [
        "# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
        "",
        f"Input: `{sf_dir}`. Every section greps the formatted plan for the",
        "scale-critical properties and marks violations with `!!`.",
        "",
        ("**ALL CHECKS PASS.**" if not problems else
         "**VIOLATIONS:** " + "; ".join(problems)),
        "",
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(header) + "\n" + "\n".join(sections))
    print("PLANS.md written;", "OK" if not problems else f"problems: {problems}")
    shutil.rmtree(work, ignore_errors=True)
    return 0 if not problems else 1


if __name__ == "__main__":
    raise SystemExit(main())
