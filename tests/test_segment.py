"""Parity tests: bern2_spark segmentation vs the reference's pure-Python
segmentation (multi_ner/ops.py) imported as an oracle."""

import string

import pytest
from hypothesis import given, settings, strategies as st

from bern2_spark.operators.segment import (
    conll_tokens, segment_text, sentence_split, split_document,
)

# ASCII-only alphabet: P2 guarantees segmentation sees ASCII-only text.
_ALPHABET = string.ascii_letters + string.digits + " .?!,;:'\"()-%/"
texts = st.text(alphabet=_ALPHABET, min_size=0, max_size=400)


def ref_segment(ref_ops, text):
    """Run the reference path: json_to_sent -> input_form (title=text,
    abstract='' — the /plain path, bern2/bern2.py:353-357)."""
    data = [{"pmid": "x", "title": text, "abstract": ""}]
    sent_data = ref_ops.json_to_sent(data)
    sent_data = ref_ops.input_form(sent_data)
    return sent_data["x"]


@given(texts)
@settings(max_examples=300, deadline=None)
def test_sentence_split_parity(ref_ops, text):
    assert sentence_split(text) == ref_ops.sentence_split(text)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_tokenizer_parity(ref_ops, text):
    assert conll_tokens(text) == ref_ops.CoNLL_tokenizer(text)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_word_rows_parity(ref_ops, text):
    ref = ref_segment(ref_ops, text)
    got = segment_text(text)
    # flatten reference output: words + inclusive wordPos per sentence
    flat = []
    for s_i, (words, poss) in enumerate(zip(ref["words"], ref["wordPos"])):
        for w_i, (w, (st_, en_)) in enumerate(zip(words, poss)):
            flat.append((s_i, w_i, w, st_, en_ + 1))  # -> exclusive end
    assert [(r[0], r[1], r[3], r[4], r[5]) for r in got] == flat
    # sentences concatenate to the doc and offsets slice correctly
    for s_i, w_i, t_i, w, st_, en_ in got:
        if len(text[st_:en_]) <= 20:
            assert text[st_:en_] == w


@pytest.mark.parametrize("text,expect_words", [
    ("", 0),
    ("   ", 0),
    ("Hello world.", 3),
])
def test_edges(text, expect_words):
    assert len(segment_text(text)) == expect_words


def test_long_sentence_chunking(ref_ops):
    text = ("tok " * 260).strip() + ". And more. " + "x y " * 120
    assert sentence_split(text) == ref_ops.sentence_split(text)
    ref = ref_segment(ref_ops, text)
    got = segment_text(text)
    assert len(got) == sum(len(ws) for ws in ref["words"])


def test_word_cap():
    w = "a" * 25
    rows = segment_text(f"short {w} tail")
    capped = [r for r in rows if r[3] == "a" * 10]
    assert len(capped) == 1
    # offsets still cover the full word
    assert capped[0][5] - capped[0][4] == 25


def test_split_document_title_rule(ref_ops):
    short = "One two three."  # <50 tokens: kept whole
    assert split_document(short) == [short]
    long = "word . " * 60
    assert split_document(long) == ref_ops.sentence_split(long)


def test_segment_dataframe(spark):
    df = spark.createDataFrame(
        [("d1", "Hello world. A test!"), ("d2", "")], ["doc_id", "text"])
    from bern2_spark.operators.segment import segment
    rows = segment(df).collect()
    assert {r.doc_id for r in rows} == {"d1"}
    r0 = sorted(rows, key=lambda r: r.tok_idx)[0]
    assert (r0.word, r0.start, r0.end) == ("Hello", 0, 5)
