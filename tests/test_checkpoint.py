"""M1-real with REAL weights: the frozen numpy checkpoint's batched
forward over input_ids/attention_mask, hand-verified, plus the full
extract_mentions_real path against a hand-computed expectation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bern2_spark.operators.checkpoint import (
    BATCH_SIZE, TinyNumpyCheckpoint, checkpoint_logits_factory,
)

LEX = [
    ("gene", "G1", "spark"),       # pieces: spar, ##k
    ("gene", "G2", "vector"),      # pieces: vect, ##or
    ("disease", "D1", "stream"),   # pieces: stre, ##am
]
TYPES = ["gene", "disease"]


@pytest.fixture(scope="module")
def ckpt():
    return TinyNumpyCheckpoint.from_lexicon(LEX, TYPES)


def test_forward_hand_computed(ckpt):
    """One window, numbers done on paper. Vocab ids: [PAD]=0 [UNK]=1
    [CLS]=2 [SEP]=3 then sorted pieces ##am=4 ##k=5 ##or=6 spar=7
    stre=8 vect=9. Window [CLS] spar [SEP] [PAD], mask 1 1 1 0:
    ctx = (e2 + e7 + e3)/3; for the gene head W[7]=[6,0,0], the other
    rows [0,0,6], so logits(pos=1) = W[7] + 0.1*(W[2]+W[7]+W[3])/3
    = [6,0,0] + 0.1*[2,0,4] = [6.2, 0, 0.4]."""
    assert ckpt.vocab.tok2id["spar"] == 7
    ids = [[2, 7, 3, 0]]
    mask = [[1, 1, 1, 0]]
    out = ckpt.forward(ids, mask, "gene")
    assert out.shape == (1, 4, 3)
    np.testing.assert_allclose(out[0][1], [6.2, 0.0, 0.4], atol=1e-6)
    # [CLS] position: W[2]=[0,0,6] + same ctx term -> [0.2, 0, 6.4]
    np.testing.assert_allclose(out[0][0], [0.2, 0.0, 6.4], atol=1e-6)
    # the disease head sees 'spar' as O: W[7]=[0,0,6] there, and the
    # ctx rows are all O too -> [0,0,6] + 0.1*[0,0,6] = [0,0,6.6]
    out_d = ckpt.forward(ids, mask, "disease")
    np.testing.assert_allclose(out_d[0][1], [0.0, 0.0, 6.6], atol=1e-6)


def test_forward_mask_is_load_bearing(ckpt):
    """Same ids, different attention mask -> different logits (the
    context term is a masked mean): proves the mask tensor is actually
    consumed, not decorative."""
    ids = [[2, 7, 3, 0]]
    a = ckpt.forward(ids, [[1, 1, 1, 0]], "gene")
    b = ckpt.forward(ids, [[1, 1, 1, 1]], "gene")
    assert not np.allclose(a, b)
    # but the argmax never flips (bounded perturbation < margin)
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_forward_batching_matches_reference_semantics(ckpt):
    """70 windows -> ceil(70/32)=3 reference-style batches; per-window
    independence means chunked == unchunked, and the chunk boundary
    must not shift values."""
    rng = [[2, 7 + (i % 3 - 1), 3, 0] for i in range(70)]
    masks = [[1, 1, 1, 0]] * 70
    full = ckpt.forward(rng, masks, "gene")
    assert full.shape == (70, 4, 3)
    one = ckpt.forward(rng[:1], masks[:1], "gene")
    np.testing.assert_allclose(full[0], one[0])
    edge = ckpt.forward(rng[BATCH_SIZE - 1:BATCH_SIZE + 1],
                        masks[BATCH_SIZE - 1:BATCH_SIZE + 1], "gene")
    np.testing.assert_allclose(full[BATCH_SIZE - 1:BATCH_SIZE + 1], edge)


def test_extract_mentions_real_hand_expectation(spark, ckpt):
    """Full Spark path with the checkpoint: 'spark' and 'vector' tag as
    gene, 'stream' as disease; 'streams' greedily tokenizes stre ##am
    then fails on '##s' -> [UNK] -> O (wordpiece semantics, not string
    matching); capitalized 'Stream' is out-of-vocab for this cased
    checkpoint -> untagged."""
    from bern2_spark.operators.wordpiece import extract_mentions_real
    text = "Stream the spark engine streams a vector stream now."
    docs = spark.createDataFrame([("d1", text)], ["doc_id", "text"])
    out = extract_mentions_real(
        docs, LEX, logits_fn_factory=checkpoint_logits_factory(ckpt),
        vocab=ckpt.vocab)
    rows = sorted((r.ent_type, r.mention, r.start, r.end)
                  for r in out.collect())
    exp = sorted([
        ("gene", "spark", text.index("spark"), text.index("spark") + 5),
        ("gene", "vector", text.index("vector"), text.index("vector") + 6),
        ("disease", "stream", text.index("stream ", 10),
         text.index("stream ", 10) + 6),
    ])
    assert rows == exp
    # probs are genuine softmax-of-logits values in (1/3, 1)
    assert all(1 / 3 < r.prob < 1.0 for r in out.collect())


def test_checkpoint_probs_depend_on_context(spark, ckpt):
    """The same surface in two different sentences gets DIFFERENT
    probabilities (window context flows through the masked-mean term) —
    the behavior a real contextual model has and a gazetteer lookup
    does not.  The masked-mean context term depends on the FRACTIONS
    of B-row vs O-row tokens in the window, so the two sentences must
    differ in those fractions: doc a tokenizes to 1 gene-B-row token
    of 6 (spar of CLS spar ##k UNK UNK SEP), doc b to 2 of 10
    (spar+vect) — 1/6 vs 1/5.  (The original doc-b sentence had 2 of
    12 = the SAME 1/6, making the probs mathematically equal; float32
    summation noise used to hide that.)"""
    from bern2_spark.operators.wordpiece import extract_mentions_real
    docs = spark.createDataFrame(
        [("a", "spark runs."), ("b", "spark stream vector thing.")],
        ["doc_id", "text"])
    out = extract_mentions_real(
        docs, LEX, logits_fn_factory=checkpoint_logits_factory(ckpt),
        vocab=ckpt.vocab)
    probs = {r.doc_id: r.prob for r in out.collect()
             if r.mention == "spark"}
    assert set(probs) == {"a", "b"} and probs["a"] != probs["b"]


def test_read_input_resolves_table_or_path(spark, tmp_path):
    """read_input: a catalog table name reads through the session
    catalog (the Iceberg source-table seam — spark_catalog drives the
    same spark.read.table path); a filesystem path reads parquet; a
    bad table name fails as a table, never silently as a path."""
    import pytest

    from bern2_spark.sources.sink import read_input
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)
    assert read_input(spark, p).count() == 2

    spark.sql("CREATE DATABASE IF NOT EXISTS t_ri")
    df.write.mode("overwrite").saveAsTable("t_ri.docs")
    try:
        got = read_input(spark, "t_ri.docs")
        assert sorted(r.doc_id for r in got.collect()) == [1, 2]
        with pytest.raises(Exception):
            read_input(spark, "t_ri.nope").collect()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ri.docs")
        spark.sql("DROP DATABASE IF EXISTS t_ri")
