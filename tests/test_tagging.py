"""Tagging-stage tests: fused vs relational path equivalence, and decode
parity against the reference's get_prob (multi_ner/ops.py:148-207) fed
with the surrogate's own tags/logits."""

import math

import pytest

from bern2_spark.corpus import documents_df, make_lexicon
from bern2_spark.operators.preprocess import preprocess
from bern2_spark.operators.segment import conll_tokens, segment, segment_text
from bern2_spark.operators.tagging import (
    NER_TYPES, SurrogateTagger, build_gazetteer, extract_mentions,
    mentions_via_relational, token_prob,
)

LEX = make_lexicon(seed=42, per_type=50)


@pytest.fixture(scope="module")
def pre_docs(spark):
    return preprocess(documents_df(spark, n_docs=40)).cache()


def _key(rows):
    return sorted((r.doc_id, r.ent_type, r.start, r.end, r.mention,
                   round(r.prob, 9)) for r in rows)


def test_fused_equals_relational(spark, pre_docs):
    fused = extract_mentions(pre_docs, LEX)
    words = segment(pre_docs)
    rel = mentions_via_relational(pre_docs, words, LEX)
    assert _key(fused.collect()) == _key(rel.collect())
    assert fused.count() > 10


def test_mention_ids_unique(spark, pre_docs):
    fused = extract_mentions(pre_docs, LEX)
    n = fused.count()
    assert fused.select("mention_id").distinct().count() == n


def test_span_invariant(spark, pre_docs):
    joined = extract_mentions(pre_docs, LEX).join(
        pre_docs.select("doc_id", "text"), "doc_id")
    bad = joined.filter(
        "substring(text, start + 1, end - start) != mention").count()
    assert bad == 0


def test_decode_parity_with_reference_get_prob(ref_ops):
    """Feed the reference decoder the surrogate's tags+logits and check
    our fused decode emits identical spans and probabilities."""
    tagger = SurrogateTagger(build_gazetteer(LEX))
    texts = [
        "The alphaosis0 disease met ALPHAKINASE1 in p53 samples. "
        "betaumab1 drug helped. A granulomatosis case!",
        "GAMMAVIRUS2 species and deltacyte3 and p53 and p53 again.",
    ]
    for text in texts:
        # reference path: build predicDict/logitsDict per sentence
        data = [{"pmid": "x", "title": text, "abstract": "",
                 "entities": {t: [] for t in NER_TYPES}}]
        sent_data = ref_ops.json_to_sent(data)
        sent_data = ref_ops.input_form(sent_data)
        predic = {t: {"x": []} for t in NER_TYPES}
        logits = {t: {"x": []} for t in NER_TYPES}
        for words in sent_data["x"]["words"]:
            by_type = tagger.tag_sentence(list(words))
            for t in NER_TYPES:
                tags = ["O"] * len(words)
                for i, tag in by_type.get(t, []):
                    tags[i] = tag
                predic[t]["x"].append(tags)
                # logits whose max-softmax equals our token_prob
                ls = []
                for w in words:
                    p = token_prob(t, w)
                    ls.append([math.log(p), math.log((1 - p) / 2),
                               math.log((1 - p) / 2)])
                logits[t]["x"].append(ls)
        ref_out = ref_ops.get_prob(data, sent_data, predic, logits,
                                   entity_types=NER_TYPES)[0]
        ref_mentions = sorted(
            (t, e["start"], e["end"] + 1, round(p, 9))
            for t in NER_TYPES
            for e, p in ((m, pr[1]) for m, pr in
                         zip(ref_out["entities"][t], ref_out["prob"][t])))
        # our path (pure-Python core, same as the Spark UDF body)
        from bern2_spark.operators.tagging import _decode_runs
        got = []
        sents = {}
        for s_i, _w, _t, w, st, en in segment_text(text):
            sents.setdefault(s_i, []).append((w, st, en))
        for s_i in sorted(sents):
            word_rows = sents[s_i]
            for t, tags in tagger.tag_sentence(
                    [w for w, _s, _e in word_rows]).items():
                for st, en, pr in _decode_runs(word_rows, tags, t):
                    got.append((t, st, en, round(pr, 9)))
        assert sorted(got) == ref_mentions


def test_gazetteer_multiword_longest_match():
    gaz = build_gazetteer([("disease", "D1", "alpha osis"),
                           ("disease", "D2", "alpha"),
                           ("gene", "G1", "alpha")])
    tagger = SurrogateTagger(gaz, suffix_rules=[])
    words = conll_tokens("alpha osis here")
    out = tagger.tag_sentence(words)
    assert out["disease"] == [(0, "B"), (1, "I")]   # longest match wins
    assert out["gene"] == [(0, "B")]                # types independent
