"""Deployment-path test: the REAL ``spark-submit --py-files`` launch.

Everything else in the suite imports bern2_spark from the repo cwd;
this test proves the cluster deployment mode instead — the job script
plus a zip are handed to spark-submit in an EMPTY cwd, so every
executor-side import must resolve through --py-files alone (the
north-rule launch: "ships via spark-submit --py-files")."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(tmp) -> str:
    pkg = os.path.join(REPO, "bern2_spark")
    zip_path = str(tmp / "bern2_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _d, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full,
                                                   os.path.dirname(pkg)))
    return zip_path


INPUT = os.environ.get("SPARK_GRAFT_SUBMIT_INPUT",
                       "/root/testdata/sf0.001/documents.parquet")


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
@pytest.mark.skipif(not os.path.exists(INPUT),
                    reason=f"test corpus missing: {INPUT}")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = _build_zip(tmp_path)
    out_dir = str(tmp_path / "sink")
    workdir = str(tmp_path / "emptycwd")
    os.mkdir(workdir)
    cmd = ["spark-submit", "--master", "local[4]",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zip_path,
           os.path.join(REPO, "tools", "submit_job.py"),
           "--input", INPUT,
           "--output", out_dir]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    r1 = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                        text=True, timeout=600)
    assert r1.returncode == 0, r1.stderr[-3000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["resumed"] is False and m1["triples"] > 0

    # second launch with --resume reads the committed snapshot instead
    # of recomputing (manifest-committed lineage, the S5 contract)
    r2 = subprocess.run(cmd + ["--resume"], cwd=workdir, env=env,
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["resumed"] is True and m2["triples"] == m1["triples"]


def test_submit_code_pipeline_in_process(spark, tmp_path, capsys):
    """--pipeline code over a (repo, path, commit, lang, content)
    parquet: curate -> extract -> link -> triples through the same
    checkpointed sink + --resume contract.  In-process (main() attaches
    to the running session via getOrCreate); the launcher/zip path is
    proven once by the subprocess test above and is pipeline-agnostic."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import submit_job

    inp = str(tmp_path / "code.parquet")
    spark.createDataFrame(
        [("r1", "a.py", "c1", "python", "import os\ndef main():\n"),
         ("r1", "b.py", "c2", "python", "import os\nimport sys\n"),
         # fails the quality gate (>1000-char line): must be curated out
         ("r2", "c.py", "c3", "python", "import dropped\n" + "x" * 2000)],
        ["repo", "path", "commit", "lang", "content"]
    ).write.parquet(inp)
    out_dir = str(tmp_path / "sink")

    assert submit_job.main(["--input", inp, "--output", out_dir,
                            "--pipeline", "code"]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["resumed"] is False and m1["triples"] == 3  # os, sys, main

    from bern2_spark.sources.sink import CheckpointedSink
    sink = CheckpointedSink(out_dir)
    rows = {(r.subj, r.pred, r.obj)
            for r in sink.read_stage(spark, "triples").collect()}
    assert rows == {("repo:r1", "imports", "pkg:os"),
                    ("repo:r1", "imports", "pkg:sys"),
                    ("repo:r1", "declares", "fn:main")}

    assert submit_job.main(["--input", inp, "--output", out_dir,
                            "--pipeline", "code", "--resume"]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["resumed"] is True and m2["triples"] == 3
