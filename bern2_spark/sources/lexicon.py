"""S6 — dictionary file scan.

The reference loads ``CUI||name1|name2|...`` text files into in-process
dicts (normalizers/chemical_normalizer.py:8-15 and three clones). Here
the same format becomes a DataFrame in three native ops: read ->
split('||') -> explode(split(names, '|')) — then broadcast at the join
sites."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lexicon_file(spark: SparkSession, path: str,
                      ent_type: str) -> DataFrame:
    lines = spark.read.text(path)
    parsed = lines.select(
        F.lit(ent_type).alias("ent_type"),
        F.split_part("value", F.lit("||"), F.lit(1)).alias("cui"),
        F.explode(
            F.split(F.split_part("value", F.lit("||"), F.lit(2)), r"\|")
        ).alias("name"),
    )
    return parsed.filter((F.col("cui") != "") & (F.col("name") != ""))


def write_lexicon_file(rows, path: str) -> None:
    """Inverse codec for fixtures: (ent_type, cui, name) rows of ONE
    type -> reference file format, names grouped per cui."""
    by_cui = {}
    for _t, cui, name in rows:
        by_cui.setdefault(cui, []).append(name)
    with open(path, "w", encoding="utf-8") as f:
        for cui, names in by_cui.items():
            f.write(f"{cui}||{'|'.join(names)}\n")
