"""Dictionary BUILDERS — raw ontology dump -> reference dict format.

The reference regenerates its normalizer dictionaries with two one-off
driver scripts (/root/reference/preprocess/preprocess_cellosaurus.py:1-32
and preprocess_cellontology.py:1-26): a stateful line loop over the
Cellosaurus flat file (ID/AC/SY tagged records) and a csv loop over a
Cell Ontology export, both emitting ``CUI||name|syn1|...`` lines that
the normalizers (and our S6 reader, sources/lexicon.py:15) consume.

Spark-first redesign: the flat file is a RECORD-delimited source, not a
line stream — every record begins with an ``ID `` line, so reading with
``lineSep="\\nID "`` hands Spark one record per row and the per-record
parse becomes pure column expressions (split/filter/transform — all
codegen, no UDF, no cross-row state).  That turns the reference's
inherently serial accumulator loop into an embarrassingly parallel scan
that partitions at any scale; the ontology CSV is a plain
``spark.read.csv`` + column ops.

At 100 TB these are dimension-build jobs (lexicons are broadcast-sized
by definition), so the only scale property that matters is that the raw
dump scan is splittable — which the record delimiter gives us for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _tagged(lines: Column, tag: str) -> Column:
    """Lines of a record carrying ``tag``, payload only, trimmed.

    Mirrors the reference's ``line.split()[1:]`` per-tag extraction
    (preprocess_cellosaurus.py:10-16) and its skip of continuation
    lines that start with whitespace (line 7).
    """
    own = F.filter(lines, lambda l: l.rlike(f"^{tag}\\s"))
    # ``' '.join(line.split()[1:])`` = drop the tag, collapse every
    # whitespace run to one space, strip the ends.
    return F.transform(own, lambda l: F.trim(F.regexp_replace(
        F.regexp_replace(l, f"^{tag}\\s+", ""), r"\s+", " ")))


def parse_cellosaurus_records(records: DataFrame,
                              record_col: str = "record") -> DataFrame:
    """(record) -> (cui, names) with names ``name|syn1|syn2|...``.

    One Cellosaurus record per input row, ``ID `` prefix already
    normalized onto the first line.  Semantics match the reference loop
    (preprocess_cellosaurus.py:4-28): ID -> primary name, AC -> CUI,
    every SY line appends its ';'-separated synonyms in order.
    """
    lines = F.filter(F.split(F.col(record_col), "\n"),
                     lambda l: ~l.rlike(r"^\s"))  # drop continuations
    name = F.element_at(_tagged(lines, "ID"), 1)
    cui = F.element_at(_tagged(lines, "AC"), 1)
    syns = F.flatten(F.transform(
        _tagged(lines, "SY"),
        lambda sy: F.transform(F.split(sy, ";"), lambda s: F.trim(s))))
    names = F.array_join(F.concat(F.array(name), syns), "|")
    return (records.select(cui.alias("cui"), names.alias("names"))
            .filter(F.col("cui").isNotNull() & (F.col("cui") != "")
                    & F.col("names").isNotNull() & (F.col("names") != "")))


def read_cellosaurus(spark: SparkSession, path: str) -> DataFrame:
    """Cellosaurus flat-file dump -> (cui, names) DataFrame.

    ``lineSep="\\nID "`` makes each record one row (splittable scan —
    Hadoop's record reader resynchronizes on the delimiter at block
    boundaries, so a 100 GB dump parses partition-parallel).  The first
    record of each file keeps its ``ID `` prefix; later rows lost it to
    the delimiter, so it is re-normalized before the shared parse.
    """
    raw = spark.read.option("lineSep", "\nID ").text(path)
    rec = F.concat(F.lit("ID "),
                   F.regexp_replace("value", r"^ID\s+", ""))
    return parse_cellosaurus_records(raw.select(rec.alias("record")))


def parse_cellontology_rows(df: DataFrame, class_col: str = "class_id",
                            name_col: str = "name",
                            syn_col: str = "synonyms") -> DataFrame:
    """(class_id url, name, '|'-joined synonyms) -> (cui, names).

    Reference semantics (preprocess_cellontology.py:8-22): keep only
    ids whose last URL segment starts with ``CL``; names is the primary
    name alone when synonyms are blank, else ``name|syn1|...``.
    """
    cui = F.element_at(F.split(F.col(class_col), "/"), -1)
    blank = F.trim(F.coalesce(F.col(syn_col), F.lit(""))) == ""
    names = F.when(blank, F.col(name_col)).otherwise(
        F.concat_ws("|", F.col(name_col), F.col(syn_col)))
    return (df.select(cui.alias("cui"), names.alias("names"))
            .filter(F.col("cui").startswith("CL")))


def read_cellontology_csv(spark: SparkSession, path: str) -> DataFrame:
    """Cell Ontology CSV export -> (cui, names).

    The reference reads every row including the header (its CL-prefix
    filter happens to drop it); we read with header=True for the same
    net rows without relying on that accident.
    """
    raw = (spark.read.option("header", True).csv(path)
           .toDF("class_id", "name", "synonyms"))
    return parse_cellontology_rows(raw)


def dict_lines(df: DataFrame) -> DataFrame:
    """(cui, names) -> one ``cui||names`` line per row (the reference's
    output format, round-trippable through sources/lexicon.py:15)."""
    return df.select(
        F.concat_ws("||", F.col("cui"), F.col("names")).alias("value"))


def write_best_dict(df: DataFrame, path: str) -> None:
    """Write (cui, names) as a ``CUI||name|syn...`` text directory —
    the scale path (one file per partition, no driver collect)."""
    dict_lines(df).write.mode("overwrite").text(path)


def write_best_dict_file(df: DataFrame, path: str) -> None:
    """Single local file for fixtures/tools — bounded by construction:
    lexicons are broadcast-sized dimension tables (the reference holds
    every dictionary fully in driver memory; chemical_normalizer.py:8)."""
    rows = dict_lines(df).collect()
    with open(path, "w", encoding="utf-8") as f:
        for (line,) in rows:
            f.write(line + "\n")
