"""North-rule deployment shape: the build job runs via
``spark-submit --py-files <packaged engine>`` in its own JVM/driver, and the
resulting index serves queries."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_build(spark, tmp_path):
    # package the engine exactly as a cluster submit would
    pkg = tmp_path / "wse.zip"
    with zipfile.ZipFile(pkg, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "websearchengine_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # input: a small transcripts parquet written by the host session
    from pyspark.sql import functions as F

    src = str(tmp_path / "turns")
    spark.createDataFrame(
        [("c", i, "user", f"submit smoke turn {i} alpha beta", None) for i in range(30)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp()).write.parquet(src)

    out = str(tmp_path / "idx")
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    env = dict(os.environ, PYSPARK_PYTHON=shutil.which("python"))
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(pkg),
            os.path.join(REPO, "scripts", "build_index_job.py"),
            "--input", src, "--output", out,
            "--n-buckets", "2", "--num-partitions", "2", "--build-id", "smoke",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["n_docs"] == 30 and metrics["n_buckets_built"] == 2

    # the index the separate driver built is queryable here
    from websearchengine_spark.operators.wand import BlockIndexReader

    hits = BlockIndexReader(out).search("alpha beta", conjunctive=True, k=40)
    assert len(hits) == 30


def test_spark_submit_py_files_merge(spark, tmp_path):
    """The incremental-merge job (scripts/merge_index_job.py) in the same
    deployment shape: base + delta indexes built here, merged by a separate
    spark-submit driver, result queryable and doc-complete."""
    pkg = tmp_path / "wse.zip"
    with zipfile.ZipFile(pkg, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "websearchengine_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    from pyspark.sql import functions as F

    from websearchengine_spark.plans.block_index import build_block_index

    def tdf(prefix, n):
        return spark.createDataFrame(
            [(f"{prefix}{i}", 0, "user", f"merge smoke {prefix} turn gamma delta", None)
             for i in range(n)],
            "conv_id string, turn_idx int, role string, text string, tool string",
        ).withColumn("ts", F.current_timestamp())

    base_idx, delta_idx = str(tmp_path / "base"), str(tmp_path / "delta")
    build_block_index(tdf("a", 12), base_idx, resume=False, n_buckets=2,
                      num_partitions=2)
    build_block_index(tdf("b", 6), delta_idx, resume=False, n_buckets=2,
                      num_partitions=2)

    out = str(tmp_path / "merged")
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    env = dict(os.environ, PYSPARK_PYTHON=shutil.which("python"))
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(pkg),
            os.path.join(REPO, "scripts", "merge_index_job.py"),
            "--base", base_idx, "--delta", delta_idx, "--output", out,
            "--build-id", "smoke-merge", "--num-partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["n_docs"] == 18

    from websearchengine_spark.operators.wand import BlockIndexReader

    hits = BlockIndexReader(out).search("gamma delta", conjunctive=True, k=40)
    assert len(hits) == 18  # docs from both sides serve from the merged index
