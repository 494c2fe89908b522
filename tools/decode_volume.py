"""Measure the decode-volume effect of intersection-aware block pruning
on AND (require_all) queries.

The scorer's require_all branch (engine/wand.py, _shard_topk_fn) decodes:
  * the SEED rows — every block of the rarest must term, and
  * of the remaining query-term blocks, ONLY those whose [first_doc_id,
    last_doc_id] range contains at least one seed candidate
(the pre-round-3 code decoded every block of every query term). Decoded
posting volume is exactly sum(n_docs) over the decoded block rows, so this
tool reproduces the engine's selection arithmetic on the real index blocks
(same pyarrow dataset read as search_local) and reports pruned vs unpruned
posting counts per query. Rank-identity of the pruned path is separately
gated (wand_bool_must / fastpath tests); this measures the saving.

Usage: python tools/decode_volume.py <index_dir> "<query text>" ...
       (no index_dir: builds bench.py's index on BENCH_CORPUS_DIR first)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from librecatastro_spark.analyzer import analyze_text
from librecatastro_spark.engine.wand import CompressedIndex
from librecatastro_spark.index.codec import decode_varbyte


def measure(index: CompressedIndex, text: str) -> dict:
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    terms = sorted(set(analyze_text(text)))
    idfs = index._idfs(terms)
    terms = [t for t in terms if t in idfs]
    ds = pads.dataset(
        os.path.join(index.out_dir, "postings"), partitioning="hive"
    )
    blocks = ds.to_table(
        columns=["shard", "term", "n_docs", "docs_enc",
                 "first_doc_id", "last_doc_id"],
        filter=pc.field("term").isin(terms),
    ).to_pandas()
    unpruned = pruned = 0
    for _, qb in blocks.groupby("shard", sort=False):
        unpruned += int(qb["n_docs"].sum())
        rare = max(terms, key=lambda t: idfs[t])
        seed_mask = qb["term"] == rare
        seed, other = qb[seed_mask], qb[~seed_mask]
        # decode ONLY the seed postings to find candidates (the engine pays
        # this too — it is part of the pruned volume)
        counts = seed["n_docs"].to_numpy(dtype=np.int64)
        starts = np.zeros(len(counts), dtype=np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        d = decode_varbyte(b"".join(seed["docs_enc"])).astype(np.int64)
        c = np.cumsum(d)
        ids = c - np.repeat(c[starts] - d[starts], counts)
        cand = np.unique(ids)
        lo = np.searchsorted(cand, other["first_doc_id"].to_numpy(np.int64), "left")
        hi = np.searchsorted(cand, other["last_doc_id"].to_numpy(np.int64), "right")
        pruned += int(counts.sum()) + int(other["n_docs"].to_numpy()[hi > lo].sum())
    return {
        "query": text,
        "terms": terms,
        "seed_term": max(terms, key=lambda t: idfs[t]) if terms else None,
        "postings_decoded_unpruned": unpruned,
        "postings_decoded_pruned": pruned,
        "decode_volume_ratio": round(pruned / unpruned, 4) if unpruned else None,
    }


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        idx_dir, queries = args[0], args[1:]
        spark = None
    else:
        import tempfile

        from librecatastro_spark.index.builder import build_index
        from librecatastro_spark.session import get_spark

        queries = args
        corpus = os.environ.get(
            "BENCH_CORPUS_DIR", "/tmp/lc_bench_corpus_800000"
        )
        spark = get_spark("decode_volume", cores=32, shuffle_partitions=32)
        idx_dir = os.path.join(tempfile.mkdtemp(prefix="dv_"), "index")
        build_index(
            spark, spark.read.parquet(corpus), idx_dir, id_col="doc_id",
            text_col="content",
            attr_cols=("lang", "repo", "path", "content_sha256"),
            n_shards=16, block_size=128, salt_threshold=20_000, n_salts=8,
            shards_per_job=16, resume=False,
        )
    if spark is None:
        from librecatastro_spark.session import get_spark

        spark = get_spark("decode_volume", cores=8, shuffle_partitions=8)
    index = CompressedIndex(spark, idx_dir)
    if not queries:
        queries = ["select filter group", "def id0042", "return id0007 id1234"]
    for q in queries:
        print(json.dumps(measure(index, q)))


if __name__ == "__main__":
    main()
