"""Source-table seam — how the engine reads the north-rule input table.

The production input is an Iceberg catalog table of source-code
repositories ``(repo, path, commit, lang, content)`` at 10^12-file
scale; this sandbox has no Iceberg jars (verified at survey time), so
the seam is deliberately thin and format-agnostic:

- a **catalog identifier** (``catalog.db.table`` / ``db.table`` — no
  path separator, no URI scheme, no ``.parquet`` suffix) resolves via
  ``spark.read.table``. That call IS the Iceberg read path the moment
  the session is configured with an Iceberg catalog
  (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
  + ``--packages org.apache.iceberg:iceberg-spark-runtime-*``): Spark's
  DataSourceV2 resolution hands the scan to Iceberg, which supplies the
  same pushdown/pruning surface the engine's plans rely on (PLANS.md) —
  predicate + partition pruning from table metadata, column projection,
  and snapshot-isolated reads. No engine code changes.
- a **filesystem path** reads parquet directly — the local test/bench
  mode, byte-identical semantics.

The INDEX side intentionally stays on explicit partitioned-parquet
layouts (index/builder.py): posting files must be term-sorted within
shard directories and the coordinator fast path (engine/wand.py)
row-group-seeks them via pyarrow, which wants stable file paths. A
production deployment that wants Iceberg's commit protocol for the
index itself would register ``postings``/``attrs`` as external Iceberg
tables partitioned by ``shard`` and swap the two mutation sites for
Iceberg commits:

- the per-unit dynamic-partition overwrite in stage 2
  (builder.py) → ``overwritePartitions()``;
- the append WAL + rollback in streaming/incremental.py → a single
  multi-table transaction (staged + stats delta + attrs), which is
  exactly the seam the WAL documents itself as emulating.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_URI_SCHEMES = ("file:", "hdfs:", "s3:", "s3a:", "gs:", "abfs:", "wasb:")


def is_path_ref(ref: str) -> bool:
    """True if ``ref`` names a filesystem location rather than a catalog
    table: any path separator, URI scheme, relative-dir prefix, a
    ``.parquet`` suffix — or a bare name that EXISTS as a local file or
    directory. The existence check keeps cwd-relative invocations like
    ``build --input mycorpus`` working (they read parquet, as they did
    before the catalog seam existed); a bare name with no local presence
    is a catalog identifier. Catalog names that collide with a local
    directory can always disambiguate as ``catalog.db.table``."""
    return (
        os.sep in ref
        or "/" in ref
        or ref.startswith(_URI_SCHEMES)
        or ref.startswith((".", "~"))
        or ref.endswith(".parquet")
        or os.path.exists(ref)
    )


def read_docs_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read the source-document table named by ``ref`` — catalog
    identifier via ``spark.read.table`` (the Iceberg path on a session
    with an Iceberg catalog; also resolves temp views and metastore
    tables), filesystem path via parquet."""
    if is_path_ref(ref):
        return spark.read.parquet(ref)
    return spark.read.table(ref)
