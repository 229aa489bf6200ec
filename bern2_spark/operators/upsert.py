"""Snapshot upsert (SCD type 1 + tombstones) for KG tables.

Between full pipeline reruns a KG deployment maintains its triples
table incrementally: an updates batch carries new/changed triples plus
delete tombstones, and the next snapshot is ``MERGE INTO`` semantics —
update rows win over base rows on the merge key, tombstoned keys
disappear.  The reference rebuilds its whole output per request
(server.py caches aside); at 10^12 files a rebuild is not an option,
so the merge IS the maintenance loop.

Spark-first shape: union the two sides with a precedence column and
keep the highest-precedence row per key via one window — exactly the
copy-on-write plan Iceberg/Delta MERGE INTO compiles to when the
update set is not clustered.  One shuffle on the merge key; with both
sides bucketed by the key (sources/bucketed.py) the exchange
disappears entirely.  Skewed keys are AQE territory — the window
partitions by the full merge key, so only a pathological single-key
firehose concentrates.

Multi-batch catch-up composes by precedence: pass ``updates`` as the
concatenation of batches with ascending ``prec`` values (later batch =
higher precedence); the same single window resolves the full history.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_snapshot(base: DataFrame, updates: DataFrame,
                    keys: List[str], op_col: str = "op",
                    prec_col: Optional[str] = None) -> DataFrame:
    """Merge ``updates`` into ``base`` on ``keys``.

    ``updates`` rows with ``op_col == 'D'`` are tombstones (the key is
    removed); anything else upserts.  ``prec_col`` (optional, on the
    updates side) orders multiple update batches — higher wins; base
    is always precedence 0.  Returns the merged snapshot with base's
    columns."""
    cols = [c for c in base.columns]
    prec_u = (F.col(prec_col).cast("long") + 1 if prec_col
              else F.lit(1))
    b = base.select(*cols,
                    F.lit("").alias("_op"), F.lit(0).alias("_prec"))
    u = updates.select(*cols,
                       F.col(op_col).alias("_op"),
                       prec_u.alias("_prec"))
    value_cols = [c for c in cols if c not in keys]
    # deterministic tie-break on the value columns: a key duplicated
    # WITHIN one side resolves the same way on every engine/run
    w = Window.partitionBy(*keys).orderBy(
        F.desc("_prec"), *[F.asc(c) for c in value_cols])
    return (b.unionByName(u)
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
            .select(*cols))
