"""Shape/tokenizer-compatibility gate for a REAL HF checkpoint bundle.

The sandbox has no torch, no GPU, and no network, so the actual
dmis-lab/bern2-ner weights can never run here — what CAN be proven is
that a bundle with exactly that checkpoint's layout (vocab.txt line
ids, roberta.embeddings.word_embeddings.weight, five
{dise,chem,gene,spec,cell}_classifier Linear heads — see
/root/reference/multi_ner/modeling.py:29-33,129) loads through the
same code path the frozen-numpy checkpoint uses and drives the full
X5 -> forward -> M2 -> X6 -> BIO pipeline end-to-end. Every shape
mismatch a deployment could hit is asserted to fail loudly.
"""

import numpy as np
import pytest

from bern2_spark.operators.checkpoint import (
    HF_EMBEDDING_KEY,
    HF_HEAD_PREFIXES,
    checkpoint_logits_factory,
    load_hf_checkpoint,
)
from bern2_spark.operators.wordpiece import WordpieceVocab

HIDDEN = 8

# BERT-style vocab file: [PAD] at 0, specials scattered like real
# files, pieces for the test sentence's words
VOCAB_LINES = [
    "[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]",
    "spark", "shuf", "##fle", "joins", "the", "rows", ".",
]


def _config(**over):
    cfg = {"vocab_size": len(VOCAB_LINES), "hidden_size": HIDDEN,
           "num_labels": 3, "max_position_embeddings": 514,
           "model_type": "roberta"}
    cfg.update(over)
    return cfg


def _state_dict(rng=None, heads=HF_HEAD_PREFIXES.values()):
    rng = rng or np.random.default_rng(7)
    sd = {HF_EMBEDDING_KEY:
          rng.standard_normal((len(VOCAB_LINES), HIDDEN),
                              dtype=np.float32)}
    for p in heads:
        sd[f"{p}_classifier.weight"] = rng.standard_normal(
            (3, HIDDEN), dtype=np.float32)
        sd[f"{p}_classifier.bias"] = rng.standard_normal(
            3, dtype=np.float32)
    return sd


def test_vocab_lines_fix_ids_to_file_order():
    vocab = WordpieceVocab.from_vocab_lines(VOCAB_LINES)
    assert vocab.tok2id["[PAD]"] == 0
    assert vocab.tok2id["[UNK]"] == 2
    assert vocab.tok2id["##fle"] == 7
    # greedy wordpiece over the file vocab
    assert vocab.tokenize("shuffle") == ["shuf", "##fle"]
    assert vocab.tokenize("unseen") == ["[UNK]"]


def test_vocab_lines_require_specials():
    with pytest.raises(ValueError, match=r"special tokens.*SEP"):
        WordpieceVocab.from_vocab_lines(["[PAD]", "[UNK]", "[CLS]", "a"])


def test_load_validates_and_transposes():
    ckpt = load_hf_checkpoint(VOCAB_LINES, _config(), _state_dict())
    assert ckpt.E.shape == (len(VOCAB_LINES), HIDDEN)
    assert set(ckpt.heads) == set(HF_HEAD_PREFIXES)
    w, b = ckpt.heads["drug"]          # the reference's chem head
    assert w.shape == (HIDDEN, 3) and b.shape == (3,)
    # transposition, not reshape: W[d, l] == hf_weight[l, d]
    hf_w = _state_dict()["chem_classifier.weight"]
    assert np.allclose(w, hf_w.T)


@pytest.mark.parametrize("mutate, err", [
    (lambda c, s: c.update(vocab_size=4), "index past the embedding"),
    (lambda c, s: s.update({HF_EMBEDDING_KEY:
                            np.zeros((3, HIDDEN), np.float32)}),
     "embedding table"),
    (lambda c, s: c.update(hidden_size=HIDDEN + 1), "hidden_size"),
    (lambda c, s: c.update(max_position_embeddings=16),
     "max_position_embeddings"),
    (lambda c, s: s.update({"dise_classifier.weight":
                            np.zeros((3, HIDDEN + 1), np.float32)}),
     "dise_classifier.weight"),
    (lambda c, s: s.pop(HF_EMBEDDING_KEY), "lacks"),
    (lambda c, s: [s.pop(k) for k in list(s) if "classifier" in k],
     "no per-type classifier"),
])
def test_load_rejects_shape_mismatches(mutate, err):
    cfg, sd = _config(), _state_dict()
    mutate(cfg, sd)
    with pytest.raises(ValueError, match=err):
        load_hf_checkpoint(VOCAB_LINES, cfg, sd)


def test_forward_shapes_and_missing_head_fallback():
    ckpt = load_hf_checkpoint(VOCAB_LINES, _config(),
                              _state_dict(heads=["dise", "gene"]))
    from bern2_spark.operators.wordpiece import convert_words_to_features
    windows = convert_words_to_features(
        ["spark", "shuffle", "joins", "the", "rows", "."],
        ["O"] * 6, ckpt.vocab, max_seq_length=16)
    ids = [w["input_ids"] for w in windows]
    mask = [w["attention_mask"] for w in windows]
    logits = ckpt.forward(ids, mask, "disease")
    assert logits.shape == (len(windows), 16, 3)
    assert np.isfinite(logits).all()
    # a type whose head the bundle doesn't ship degrades to all-O
    o_logits = ckpt.forward(ids, mask, "drug")
    assert (o_logits.argmax(axis=2) == 2).all()


def test_hf_bundle_drives_pipeline_end_to_end(spark):
    """The loaded bundle plugs into extract_mentions_real exactly where
    the frozen checkpoint does: features are built against the
    CHECKPOINT's vocab (broadcast), logits flow through the batched
    numpy forward, spans decode — and the run is deterministic."""
    from bern2_spark.operators.wordpiece import extract_mentions_real
    ckpt = load_hf_checkpoint(VOCAB_LINES, _config(), _state_dict())
    docs = spark.createDataFrame(
        [("d1", "spark shuffle joins the rows ."),
         ("d2", "the rows spark .")],
        "doc_id string, text string")
    factory = checkpoint_logits_factory(ckpt)
    out1 = extract_mentions_real(docs, [], logits_fn_factory=factory,
                                 vocab=ckpt.vocab).collect()
    out2 = extract_mentions_real(docs, [], logits_fn_factory=factory,
                                 vocab=ckpt.vocab).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    for r in out1:  # span invariant holds for whatever the heads tag
        text = "spark shuffle joins the rows ." if r.doc_id == "d1" \
            else "the rows spark ."
        assert text[r.start:r.end] == r.mention
