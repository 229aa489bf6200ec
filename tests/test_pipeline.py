"""End-to-end pipeline tests on the deterministic synthetic corpus."""

import pytest
from pyspark.sql import functions as F

from bern2_spark.pipeline import run_pipeline, run_synthetic
from bern2_spark.schemas import CUI_LESS


@pytest.fixture(scope="module")
def result(spark):
    r = run_synthetic(spark, n_docs=60)
    r.annotations.cache().count()
    return r


def test_triples_exist_and_shape(result):
    rows = result.triples.collect()
    assert len(rows) > 20
    assert all(r.pred.startswith("has_") for r in rows)
    assert all(r.obj != CUI_LESS for r in rows)


def test_annotation_span_invariant(result):
    joined = result.annotations.join(
        result.docs.select("doc_id", "text"), "doc_id")
    bad = joined.filter(
        "substring(text, begin + 1, end - begin) != mention").count()
    assert bad == 0


def test_mutations_present_with_null_prob(result):
    muts = result.annotations.filter("obj = 'mutation'").collect()
    assert muts and all(m.prob is None for m in muts)
    assert any(m.mutationType == "ProteinMutation" for m in muts)


def test_species_blocklist_filtered(result):
    surfaced = {r.mention for r in
                result.annotations.filter("obj = 'species'").collect()}
    assert "patients" not in surfaced and "human" not in surfaced
    assert "Homo sapiens" in surfaced


def test_prefix_standardization(result):
    objs = result.triples.select("obj").distinct().collect()
    vals = {r.obj for r in objs}
    assert not any(v.startswith("EntrezGene:") for v in vals)
    assert any(v.startswith("NCBIGene:") for v in vals)
    assert any(v.startswith("NCBITaxon:") for v in vals)
    assert any(v.startswith("mesh:") for v in vals)


def test_neural_fallback_links_suffixy_surfaces(result):
    neural = result.annotations.filter("is_neural_normalized").collect()
    assert neural  # granulomatosis-style surfaces got linked by embedding


def test_determinism(spark, result):
    r2 = run_synthetic(spark, n_docs=60)
    a = sorted(map(tuple, result.annotations.drop("prob").collect()))
    b = sorted(map(tuple, r2.annotations.drop("prob").collect()))
    assert a == b


def test_no_overlap_conflicts(result):
    # after W1, every (doc, span) among non-mutation rows carries a
    # single (cui-set, type)
    non_mut = result.annotations.filter("obj != 'mutation'")
    conflict = (non_mut.groupBy("doc_id", "begin", "end")
                .agg(F.countDistinct("obj").alias("n_types"))
                .filter("n_types > 1").count())
    assert conflict == 0


def test_tag_only_sentinel_never_escapes(spark):
    """ADVICE r1: tag-only gazetteer rows (cui sentinel) must never be
    emitted as real object ids — the neural index is built from the
    NORMALIZATION lexicon only, so a tag-only surface can't match
    itself at cosine 1.0 and smuggle the sentinel into the triples."""
    from bern2_spark import corpus
    from bern2_spark.queries import _docs

    docs = (_docs(spark, "/root/testdata/sf0.001")
            .selectExpr("source as repo",
                        "concat('docs/', doc_id, '.txt') as path",
                        "sha2(cast(doc_id as string), 256) as commit",
                        "lang", "text as content"))
    with run_pipeline(docs, corpus.DRIVER_VOCAB_LEXICON, spark) as res:
        bad = res.triples.filter(
            F.col("obj").contains(corpus.TAG_ONLY)).count()
        assert bad == 0
        # tag-only surfaces still flow through tagging: they appear as
        # mentions (the tagger knows more surfaces than the dictionaries)
        tagged = res.mentions.filter(F.col("mention").isin(
            "group", "sort", "agg")).count()
        assert tagged > 0


def test_release_unpersists(spark):
    before = len([r for r in spark.sparkContext._jsc.getPersistentRDDs()])
    res = run_synthetic(spark, n_docs=30)
    res.triples.count()
    assert len(res._persisted) > 0
    res.release()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before
