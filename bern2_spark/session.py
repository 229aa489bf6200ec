"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every conf here is chosen for a
multi-executor cluster at large scale:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow on (all inference UDFs are Arrow-batched),
* a raised broadcast threshold (all lexicons are broadcast dims),
* shuffle partitions sized for the local harness; a real deployment
  overrides via ``spark-submit --conf`` (AQE coalesces down anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dense Arrow batches for the tagging/embedding UDFs; re-batched to
    # model-optimal size inside the UDF (reference batches 32/1024).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Lexicons are tens of MB; broadcast them rather than shuffling docs.
    "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
    # NOTE (r6 A/B, kept for the record): two guide-suggested conf
    # levers were measured and REJECTED here.  16 MB scan splits (to
    # parallelize multi-row-group files) lost to the default 128 MB on
    # every lineitem query (task overhead > row-group parallelism at
    # this scale; single-row-group files are handled by the _spread
    # repartition instead).  preferSortMergeJoin=false + a 64 MB
    # shuffled-hash threshold sped the iterative graph loops ~10% but
    # slowed the flagship KG pipeline 13s -> 17s at sf1.0 — net wash,
    # worst on the headline — so the default SMJ planning stays.
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # The driver's bench artifact was unparseable two rounds running
    # because \r console-progress output interleaved with the single
    # JSON result line in the captured stream (BENCH_r04/r05 "parsed":
    # null / tail-recovery).  The bench session is built through this
    # factory, so the progress bar is silenced here — purely cosmetic,
    # no effect on any plan or result.
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "bern2_spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entry point serves tests, bench, and the two-parallelism
    scaling run required by BENCH/BASELINE.md.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``bern2_spark`` importable on executor Python workers.

    Equivalent to ``spark-submit --py-files bern2_spark.zip`` (the
    deployment mode this job ships with): zip the package once and
    ``addPyFile`` it, so pandas-UDF closures that reference package
    modules resolve on every executor regardless of cwd."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "bern2_spark_pyfiles.zip")
    # rebuild every session: cheap, and a cached zip could ship stale code
    tmp = f"{zip_path}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
