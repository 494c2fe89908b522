"""File-source fan-out (A25) — the reference walks a coordinates
directory and keeps only the files matching its extension filter
(reference: src/librecatastro/scrapping/searchers/
coordinates_searcher.py:28-50, os.listdir + '.json' suffix check).

Spark-first re-expression: one ``spark.read.option("pathGlobFilter",
pattern).parquet(dir)`` scan — file enumeration and the glob filter run
in the driver's listing phase (cheap, names only), every matching file
becomes scan splits processed in parallel, and non-matching files (other
formats, archived copies) are never opened. At 100 TB this is the
standard landing-zone ingest shape: no per-file driver loop, no union of
per-file DataFrames, partition/split planning handled by the source.

``materialize_glob_dir`` builds the deterministic test fixture for the
gate: one parquet file per language plus decoy files — an extra parquet
whose rows would corrupt every aggregate if the glob failed to exclude
it, and non-parquet files that would crash the scan if opened.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def materialize_glob_dir(sf_dir: str, dest: str) -> str:
    """Deterministically split <sf_dir>/documents.parquet into
    dest/docs_<lang>.parquet (one file per language, pyarrow-written so
    they are plain FILES, not Spark part-dirs) plus decoys:
    archive_old.parquet (duplicate rows — poison if the glob leaks) and
    notes.json / readme.txt (non-parquet — crash if opened). Idempotent
    via a completion marker."""
    marker = os.path.join(dest, "_complete")
    if os.path.exists(marker):
        return dest
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dest, exist_ok=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    langs = pc.unique(tbl.column("lang")).to_pylist()
    for lang in sorted(langs):
        part = tbl.filter(pc.equal(tbl.column("lang"), lang))
        pq.write_table(part, os.path.join(dest, f"docs_{lang}.parquet"))
    # decoys the glob must exclude
    pq.write_table(tbl.slice(0, min(50, tbl.num_rows)),
                   os.path.join(dest, "archive_old.parquet"))
    with open(os.path.join(dest, "notes.json"), "w") as fh:
        fh.write('{"note": "not parquet"}\n')
    with open(os.path.join(dest, "readme.txt"), "w") as fh:
        fh.write("decoy\n")
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return dest


def glob_scan(spark: SparkSession, directory: str, pattern: str) -> DataFrame:
    """A25: batch directory fan-out with a file-name glob filter pushed
    into the source's file listing (never opens non-matching files)."""
    return (
        spark.read.option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "false")
        .parquet(directory)
    )
