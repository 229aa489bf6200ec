"""S5/S8 — partitioned sink with per-stage checkpoints and anti-join
resume.

The reference memo-caches whole results per pmid in MongoDB and evicts
corrupt entries (bern2/bern2.py:92-98, 130-157). The batch equivalent:
each stage writes a snapshot directory (parquet + manifest — the same
layout an Iceberg snapshot-per-stage deployment would give; on a
cluster with an Iceberg catalog, swap ``parquet`` for
``writeTo(...).append()``), and a re-run anti-joins input doc_ids
against already-committed output, processing only the remainder.

Output layout under ``base_dir``:
    annotations/   partitioned by obj (entity type)
    triples/       partitioned by pred
    lineage/       per-stage, per-partition row counts
    manifests/<stage>.json
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bern2_spark.operators.metrics import partition_lineage


class CheckpointedSink:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        os.makedirs(os.path.join(base_dir, "manifests"), exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, "manifests", f"{stage}.json")

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(self.manifest_path(stage))

    def write_stage(self, df: DataFrame, stage: str,
                    partition_by: Optional[List[str]] = None,
                    lineage: bool = True) -> str:
        """Write a stage snapshot + lineage rows + manifest. The
        manifest is written LAST (commit point): a crash mid-write
        leaves no manifest, so resume re-runs the stage — all-or-
        nothing per stage, like an Iceberg snapshot commit."""
        path = self._path(stage)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        n_rows = None
        if lineage:
            lin = partition_lineage(
                df.sparkSession.read.parquet(path), stage)
            lin.write.mode("append").parquet(self._path("lineage"))
            n_rows = lin.agg(F.sum("rows")).first()[0] or 0
        with open(self.manifest_path(stage), "w") as f:
            json.dump({"stage": stage, "path": path, "rows": n_rows,
                       "partition_by": partition_by or [],
                       "committed_at": time.time()}, f)
        return path

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._path(stage))

    def resume_filter(self, docs: DataFrame, stage: str,
                      doc_col: str = "doc_id") -> DataFrame:
        """S5 — left anti-join of input docs against doc ids already in
        a committed stage: only unprocessed docs flow. The done-set is
        a distinct projection of one column read straight off the
        partitioned parquet (column-pruned scan)."""
        if not self.is_committed(stage):
            return docs
        done = (self.read_stage(docs.sparkSession, stage)
                .select(F.col(self._doc_column(stage)).alias(doc_col))
                .distinct())
        return docs.join(done, doc_col, "left_anti")

    @staticmethod
    def _doc_column(stage: str) -> str:
        return "subj" if stage == "triples" else "doc_id"


def write_outputs(sink: CheckpointedSink, annotations: DataFrame,
                  triples: DataFrame,
                  docs: Optional[DataFrame] = None) -> None:
    sink.write_stage(annotations, "annotations", partition_by=["obj"])
    sink.write_stage(triples, "triples", partition_by=["pred"])
    if docs is not None:
        # the resume ledger: INPUT doc ids, not output doc ids — a doc
        # that legitimately produced zero annotations must still count
        # as done, or resume re-processes it forever
        sink.write_stage(docs.select("doc_id").distinct(), "processed_docs",
                         lineage=False)


def resume_docs(sink: CheckpointedSink, docs: DataFrame) -> DataFrame:
    """Filter the input table down to not-yet-processed docs."""
    return sink.resume_filter(docs, "processed_docs")
