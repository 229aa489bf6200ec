"""Mutation battery tests: detection, normalized names, nth-occurrence
offset recovery — all native SQL (no Python in the plan)."""

import pytest
from pyspark.sql import functions as F

from bern2_spark.operators.mutations import detect_mutations


@pytest.fixture(scope="module")
def muts(spark):
    rows = [
        ("d1", "We found p.V600E and c.123A>G plus rs113488022 here."),
        ("d2", "p.V600E was seen. Again p.V600E was seen. And p.V600E once more."),
        ("d3", "Standalone V600E and p.Lys27Met and c.1521_1523delCTT."),
        ("d4", "no mutations whatsoever in this text"),
        ("d5", ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = detect_mutations(df).collect()
    return {(r.doc_id, r.start): r for r in out}, out


def test_detection_and_offsets(muts):
    idx, out = muts
    texts = {
        "d1": "We found p.V600E and c.123A>G plus rs113488022 here.",
        "d2": "p.V600E was seen. Again p.V600E was seen. And p.V600E once more.",
        "d3": "Standalone V600E and p.Lys27Met and c.1521_1523delCTT.",
    }
    # span invariant for every detected mention
    for r in out:
        assert texts[r.doc_id][r.start:r.end] == r.mention


def test_repeated_mentions_all_found(muts):
    _, out = muts
    d2 = sorted(r.start for r in out if r.doc_id == "d2")
    assert d2 == [0, 24, 46]


def test_types_and_normalized_names(muts):
    idx, out = muts
    by_mention = {r.mention: r for r in out if r.doc_id in ("d1", "d3")}
    assert by_mention["p.V600E"].mutation_type == "ProteinMutation"
    assert by_mention["p.V600E"].normalized_name == "p|SUB|V|600|E"
    assert by_mention["c.123A>G"].mutation_type == "DNAMutation"
    assert by_mention["c.123A>G"].normalized_name == "c|SUB|A|123|G"
    assert by_mention["rs113488022"].mutation_type == "SNP"
    assert by_mention["p.Lys27Met"].normalized_name == "p|SUB|Lys|27|Met"
    assert by_mention["c.1521_1523delCTT"].normalized_name == "c|del|1521_1523|CTT"
    assert by_mention["V600E"].mutation_type == "ProteinMutation"


def test_bare_form_not_double_counted(muts):
    _, out = muts
    # d1 has p.V600E: bare 'V600E' inside it must NOT emit a second span
    d1_spans = sorted((r.start, r.mention) for r in out if r.doc_id == "d1")
    assert d1_spans == [(9, "p.V600E"), (21, "c.123A>G"), (35, "rs113488022")]


def test_empty_and_clean_docs(muts):
    _, out = muts
    assert not [r for r in out if r.doc_id in ("d4", "d5")]


def test_plan_is_pure_sql(spark):
    df = spark.createDataFrame([("d", "x p.V600E")], ["doc_id", "text"])
    plan = detect_mutations(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
