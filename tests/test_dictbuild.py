"""Dictionary builders: raw ontology dump -> reference dict format.

Parity oracle is a faithful in-test reimplementation of the reference's
two build loops (/root/reference/preprocess/preprocess_cellosaurus.py:4-28
and preprocess_cellontology.py:6-22 — both are top-level scripts with
hard-coded paths, so they cannot be imported and run like ops.py is in
test_golden_parity.py).
"""

import csv
import os

import pytest

from bern2_spark.sources.dictbuild import (
    dict_lines, read_cellontology_csv, read_cellosaurus,
    write_best_dict, write_best_dict_file,
)
from bern2_spark.sources.lexicon import read_lexicon_file

CELLOSAURUS = """\
ID HeLa
AC CVCL_0030
SY Hela; He La; HELA
CA Cancer cell line
//
ID U-2 OS
   continuation line that the parser must skip
AC CVCL_0042
SY U2-OS; U2OS
SY U-2OS
//
ID NIH 3T3
AC CVCL_0594
CA Spontaneously immortalized
//
"""


def _reference_cellosaurus_loop(text):
    """preprocess_cellosaurus.py:4-28, verbatim semantics."""
    cui2names, name = {}, ""
    for line in text.splitlines(keepends=True):
        if line.startswith(" "):
            continue
        line = line.strip()
        if line.startswith("ID"):
            name = " ".join(line.split()[1:])
        elif line.startswith("AC"):
            cui = " ".join(line.split()[1:])
            cui2names[cui] = name
            name = ""
        elif line.startswith("SY"):
            synonyms = [sy.strip()
                        for sy in " ".join(line.split()[1:]).split(";")]
            cui2names[cui] = "|".join([cui2names[cui]] + synonyms)
    return cui2names


def _reference_cellontology_loop(rows):
    """preprocess_cellontology.py:6-22, verbatim semantics."""
    cui2names = {}
    for line in rows:
        class_id = line[0]
        if not class_id.split("/")[-1].startswith("CL"):
            continue
        cui = class_id.split("/")[-1]
        name, synonyms = line[1], line[2].split("|")
        if line[2].strip() != "":
            cui2names[cui] = "|".join([name] + synonyms)
        else:
            cui2names[cui] = name
    return cui2names


@pytest.fixture()
def cellosaurus_file(tmp_path):
    p = tmp_path / "cellosaurus_raw.txt"
    p.write_text(CELLOSAURUS, encoding="utf-8")
    return str(p)


def test_cellosaurus_matches_reference_loop(spark, cellosaurus_file):
    got = {r["cui"]: r["names"]
           for r in read_cellosaurus(spark, cellosaurus_file).collect()}
    assert got == _reference_cellosaurus_loop(CELLOSAURUS)
    # spot-check the tricky record: continuation skipped, two SY lines
    # accumulated in order
    assert got["CVCL_0042"] == "U-2 OS|U2-OS|U2OS|U-2OS"
    assert got["CVCL_0594"] == "NIH 3T3"  # no SY line at all


def test_cellosaurus_first_record_keeps_id_prefix(spark, tmp_path):
    # the lineSep="\nID " split leaves the FIRST record with its 'ID '
    # prefix and strips it from the rest — both shapes must parse
    p = tmp_path / "two.txt"
    p.write_text("ID only-one\nAC CVCL_1\n//\nID second\nAC CVCL_2\n//\n",
                 encoding="utf-8")
    got = {r["cui"]: r["names"]
           for r in read_cellosaurus(spark, str(p)).collect()}
    assert got == {"CVCL_1": "only-one", "CVCL_2": "second"}


def test_cellontology_matches_reference_loop(spark, tmp_path):
    rows = [
        ["http://purl.obolibrary.org/obo/CL_0000000", "cell", ""],
        ["http://purl.obolibrary.org/obo/CL_0000540", "neuron",
         "nerve cell|neuronal cell"],
        ["http://purl.obolibrary.org/obo/UBERON_0000955", "brain", "organ"],
        ["http://www.w3.org/2002/07/owl#Thing", "thing", ""],
    ]
    p = tmp_path / "cl.csv"
    with open(p, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["Class ID", "Preferred Label", "Synonyms"])
        w.writerows(rows)
    got = {r["cui"]: r["names"]
           for r in read_cellontology_csv(spark, str(p)).collect()}
    assert got == _reference_cellontology_loop(rows)
    assert got == {"CL_0000000": "cell",
                   "CL_0000540": "neuron|nerve cell|neuronal cell"}


def test_round_trip_through_lexicon_reader(spark, cellosaurus_file,
                                           tmp_path):
    built = read_cellosaurus(spark, cellosaurus_file)
    out = str(tmp_path / "best_dict_CellLine.txt")
    write_best_dict_file(built, out)
    lex = read_lexicon_file(spark, out, "cell_line")
    names = {(r["cui"], r["name"]) for r in lex.collect()}
    assert ("CVCL_0030", "HeLa") in names
    assert ("CVCL_0030", "He La") in names
    assert ("CVCL_0042", "U-2OS") in names
    assert len(names) == len(set(names))
    # scale writer produces the same lines, one part-file per partition
    d = str(tmp_path / "dict_dir")
    write_best_dict(built, d)
    files = [os.path.join(d, f) for f in os.listdir(d)
             if f.startswith("part-")]
    lines = set()
    for f in files:
        with open(f, encoding="utf-8") as fh:
            lines.update(l.rstrip("\n") for l in fh if l.strip())
    want = {r["value"] for r in dict_lines(built).collect()}
    assert lines == want


def test_builder_plan_has_no_udf_or_shuffle(spark, cellosaurus_file):
    plan = read_cellosaurus(spark, cellosaurus_file)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure per-record map over the scan
