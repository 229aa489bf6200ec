"""Schwartz–Hearst abbreviation resolution tests (operator M4 + the
disease sieve's abbreviation-expanded level)."""

import pytest
from pyspark.sql import functions as F

from bern2_spark import schemas
from bern2_spark.operators.abbrev import (
    abbreviation_table, apply_abbreviation_level, extract_abbreviations,
    find_best_long_form,
)


@pytest.mark.parametrize("short,long,want", [
    ("DNA", "deoxyribonucleic acid", "deoxyribonucleic acid"),
    ("HSP", "heat shock protein", "heat shock protein"),
    ("PCR", "we ran polymerase chain reaction", "polymerase chain reaction"),
    ("ER", "estrogen receptor", "estrogen receptor"),
    ("XYZ", "completely unrelated words", None),
])
def test_find_best_long_form(short, long, want):
    assert find_best_long_form(short, long) == want


def test_extract_abbreviations_canonical():
    text = ("Patients with heat shock protein (HSP) elevation and "
            "polymerase chain reaction (PCR) tests showed results.")
    got = dict(extract_abbreviations(text))
    assert got["HSP"] == "heat shock protein"
    assert got["PCR"] == "polymerase chain reaction"


def test_extract_abbreviations_rejects_junk():
    text = "A trivial remark (see above) and numbers (123) only."
    got = extract_abbreviations(text)
    assert all(sf not in ("see above", "123") for sf, _ in got)


def test_abbreviation_table_and_sieve_level(spark):
    docs = spark.createDataFrame(
        [("d1", "Heat shock protein (HSP) was high. HSP binds stuff."),
         ("d2", "No abbreviations here at all.")],
        ["doc_id", "text"])
    ab = abbreviation_table(docs)
    rows = {(r.doc_id, r.short_form): r.long_form for r in ab.collect()}
    assert rows[("d1", "HSP")] == "Heat shock protein"

    lexicon = spark.createDataFrame(
        [("disease", "MESH:D77", "heat shock protein")], schemas.LEXICON)
    normalized = spark.createDataFrame(
        [("d1", 1, "disease", 36, 39, "HSP", 0.9, None, None, "CUI-less",
          False),
         ("d2", 2, "disease", 0, 2, "No", 0.5, None, None, "CUI-less",
          False)],
        schemas.NORMALIZED)
    out = {r.mention_id: r.cui
           for r in apply_abbreviation_level(normalized, lexicon,
                                             ab).collect()}
    # HSP -> long form 'Heat shock protein' -> biosyn sieve level hits
    assert out[1] == "MESH:D77"
    assert out[2] == "CUI-less"
