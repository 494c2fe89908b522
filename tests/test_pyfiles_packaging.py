"""spark-submit --py-files viability: the engine must run END-TO-END from
a zip archive of the package alone — no repo checkout on the import path.

The north rule deploys via ``spark-submit --py-files
librecatastro_spark.zip`` on a multi-executor cluster; the mechanisms
that can silently break under it are (a) zipimport (any ``__file__``-
relative data read or filesystem assumption inside the package dies in
a zip) and (b) executor-side imports of UDF closures (workers unpickle
pandas/Arrow UDFs and must import the package themselves — shipped here
exactly as spark-submit does it, via ``sparkContext.addPyFile``).

The subprocess gets NO repo path: its sys.path holds only the zip (plus
site-packages), its cwd is the temp dir, and the build it runs exercises
the full hot path — mapInArrow tokenize, applyInPandas block build,
broadcast term-id join, WAND query — so an executor that cannot import
the package from the zip fails loudly.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_JOB = """\
import sys

zip_path, corpus, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, zip_path)  # driver-side zipimport

from librecatastro_spark.session import get_spark
from librecatastro_spark.index.builder import build_index, verify_content_sha
from librecatastro_spark.engine.wand import CompressedIndex

spark = get_spark("pyfiles_job", cores=2, shuffle_partitions=2)
spark.sparkContext.addPyFile(zip_path)  # worker-side: the --py-files path

docs = spark.read.parquet(corpus)
build_index(
    spark, docs, out_dir, id_col="doc_id", text_col="content",
    attr_cols=("lang", "content_sha256"), n_shards=2, shards_per_job=2,
    block_size=16, salt_threshold=1000, n_salts=2, resume=False,
)
assert verify_content_sha(docs, spark, out_dir) is True
idx = CompressedIndex(spark, out_dir)
rows = idx.search("def return", k=5).collect()
assert len(rows) == 5, rows
print("RESULT_OK", len(rows))
spark.stop()
"""


def test_engine_runs_from_zip_only(spark, tmp_path):
    import librecatastro_spark as pkg

    from librecatastro_spark.corpus import assign_doc_ids, generate_corpus

    corpus = str(tmp_path / "corpus")
    assign_doc_ids(
        generate_corpus(spark, 150, min_tokens=20, max_tokens=80,
                        partitions=2)
    ).write.parquet(corpus)

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zip_path = shutil.make_archive(
        str(tmp_path / "librecatastro_spark"), "zip",
        root_dir=os.path.dirname(pkg_dir), base_dir="librecatastro_spark",
    )
    job = tmp_path / "job.py"
    job.write_text(_JOB)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(job), zip_path, corpus,
         str(tmp_path / "idx")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    assert "RESULT_OK 5" in out.stdout, out.stdout[-2000:]
