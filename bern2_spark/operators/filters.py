"""Mention-level filters — operators P6 (species human-mention filter)
and A6 (filtered-species lineage metric) of SURVEY §2.2/§2.4."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# SR4GN human-synonym blocklist (multi_ner/ops.py:287-294): species
# mentions with EXACTLY these surfaces (case-sensitive) are dropped.
SPECIES_HUMAN_BLOCKLIST = (
    "person|infant|Child|people|participants|woman|"
    "Girls|Man|Peoples|Men|Participant|Patients|"
    "humans|Persons|mans|participant|Infants|Boys|"
    "Human|Humans|Women|children|Mans|child|Participants|Girl|"
    "Infant|girl|patient|patients|boys|men|infants|"
    "man|girls|Children|Boy|women|persons|human|Woman|"
    "peoples|Patient|People|boy|Person"
).split("|")


def filter_species_human(mentions: DataFrame) -> DataFrame:
    """P6 — drop species mentions whose surface is a human synonym
    (multi_ner/ops.py:296-322). A literal isin filter beats an anti-join
    here: 46 constants fold into the scan predicate, no broadcast."""
    return mentions.filter(
        ~((F.col("ent_type") == "species")
          & F.col("mention").isin(SPECIES_HUMAN_BLOCKLIST)))


def filtered_species_metric(mentions: DataFrame) -> DataFrame:
    """A6 — per-doc count of filtered species mentions (lineage metric,
    multi_ner/ops.py:315-320)."""
    return (mentions
            .filter((F.col("ent_type") == "species")
                    & F.col("mention").isin(SPECIES_HUMAN_BLOCKLIST))
            .groupBy("doc_id")
            .agg(F.count("*").alias("num_filtered_species")))
