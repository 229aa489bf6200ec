"""Bucketed table layout — shuffle-free co-located joins.

At 100 TB the dominant repeated cost of the KG store is joining the
triple/mention tables back to entity-keyed dimensions (catalog, degree,
PageRank): every such join shuffles BOTH sides on ``cui`` unless the
data already lives hash-partitioned by it.  Spark's bucketing is the
persistent form of that partitioning: ``bucketBy(n, key)`` at write
time records the hash layout in the catalog, and every later equi-join
or aggregation on the key reads the buckets co-located — the Exchange
disappears from the plan (verified by ``assert_no_exchange`` in
tests/test_bucketed.py).

Rules of thumb encoded here:

* bucket count is fixed at WRITE time and shared by every table that
  joins on the key — pick ~2-4x the target cluster's executor count so
  one bucket is one task's worth of work (at 10^12 triples: thousands
  of buckets, not 8; the default here is sized for local tests).
* ``sortBy`` the same key inside buckets: the downstream sort-merge
  join then skips its per-task sort too.
* bucketed tables must go through ``saveAsTable`` (the catalog carries
  the layout); a plain ``parquet(path)`` write silently drops it.  The
  ``path`` option keeps the data external so tests can place it in a
  tmp dir.

The reference has no table layout story at all (its lookups are
in-process dicts, e.g. normalizers/chemical_normalizer.py); this module
is part of the Spark-first scale design, not a port.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8, path: Optional[str] = None,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) catalog
    table on ``key``.  ``path`` makes the table external."""
    w = df.write.mode("overwrite").format("parquet") \
          .bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str,
                   right_table: str, key: str,
                   how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: with bucketing metadata in the catalog the planner emits a
    sort-merge join with NO Exchange on either side.  The merge hint
    pins SMJ so the demonstration doesn't silently degrade to a
    broadcast (which would also skip the shuffle, but for the wrong
    reason at this table size)."""
    l = spark.table(left_table).hint("merge")
    r = spark.table(right_table)
    return l.join(r, key, how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the final physical
    plan — the metric bucketing is supposed to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "ReusedExchange" not in line)
