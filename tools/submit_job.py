"""The production entry point — the job the north rule ships via
``spark-submit --py-files``:

    spark-submit --master <cluster> \
        --py-files /tmp/bern2_spark_pyfiles.zip \
        tools/submit_job.py --input <docs parquet> --output <dir> \
        [--resume] [--pipeline bio|code]

``--pipeline code`` runs the code-KG construction instead (curate ->
import/def extraction -> root-package linking -> (repo, pred, entity)
triples, dataprep/codekg.py) over the same
(repo, path, commit, lang, content) input shape.

Reads the documents table, runs the full KG pipeline (preprocess ->
tag -> mutations -> sieve normalize -> neural fallback -> canonicalize),
and writes triples + mention provenance through CheckpointedSink
(partitioned parquet snapshots, per-partition lineage rows, manifest
commit LAST so a crash mid-write is invisible to resume).  Emits one
JSON metrics line on stdout.

Unlike tests/bench (which build their session through
bern2_spark.session.get_spark), this script takes the session
spark-submit hands it — master, executor conf, and --py-files come from
the LAUNCHER, the cluster deployment mode.  tests/test_submit.py runs
it through a real ``spark-submit`` subprocess to prove the deployment
path (zip-only imports on executors, no repo cwd).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet path OR catalog table "
                         "name (catalog.db.table — the Iceberg "
                         "source-table shape; doc_id/text or "
                         "repo/path/commit/lang/content columns)")
    ap.add_argument("--output", required=True,
                    help="sink base dir (snapshots + manifests)")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages already committed in the manifest")
    ap.add_argument("--pipeline", choices=["bio", "code"], default="bio",
                    help="bio: BERN2-style NER+normalize over content; "
                         "code: curate -> import/def extraction -> "
                         "root-package linking -> (repo, pred, entity) "
                         "triples (dataprep/codekg.py)")
    args = ap.parse_args(argv)

    # spark-submit owns the session: no master/conf set here beyond
    # what the pipeline requires semantically (Arrow for the UDFs).
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("bern2-kg-construct")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from bern2_spark import corpus
    from bern2_spark.pipeline import run_pipeline
    from bern2_spark.sources.sink import CheckpointedSink

    sink = CheckpointedSink(args.output)
    t0 = time.time()
    if args.resume and sink.is_committed("triples"):
        out = {"resumed": True,
               "triples": sink.read_stage(spark, "triples").count(),
               "sec": round(time.time() - t0, 2)}
        print(json.dumps(out))
        return 0

    from bern2_spark.sources.sink import read_input
    docs = read_input(spark, args.input)
    if "content" not in docs.columns:
        # test-corpus shape (doc_id, text, lang, source, ...) -> the
        # north-rule input shape run_pipeline consumes (same adapter as
        # the flagship driver query, queries.py kg_pipeline_triples)
        from pyspark.sql import functions as F
        docs = docs.select(
            F.col("source").alias("repo"),
            F.concat(F.lit("docs/"), F.col("doc_id").cast("string"),
                     F.lit(".txt")).alias("path"),
            F.sha2(F.col("doc_id").cast("string"), 256).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"))
    if args.pipeline == "code":
        from bern2_spark.dataprep.codekg import (code_triples,
                                                 extract_defs,
                                                 extract_imports)
        from bern2_spark.dataprep.codeqc import stack_quality_features
        cur = (stack_quality_features(docs).filter("passes")
               .select(*docs.columns))
        triples = code_triples(extract_imports(cur), extract_defs(cur))
    else:
        res = run_pipeline(docs, corpus.DRIVER_VOCAB_LEXICON, spark)
        triples = res.triples
    sink.write_stage(triples, "triples", partition_by=["pred"])
    n = sink.read_stage(spark, "triples").count()
    print(json.dumps({"resumed": False, "triples": n,
                      "sec": round(time.time() - t0, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
