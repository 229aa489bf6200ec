"""Structured-Streaming incremental variant: backlog -> foreachBatch ->
appended triples, then a second batch arrives and only it is processed."""

import os

import pytest

from bern2_spark import corpus, schemas
from bern2_spark.streaming.incremental import stream_documents


def _write_batch(spark, path, n_docs, seed):
    docs = corpus.documents_df(spark, n_docs=n_docs, seed=seed)
    docs.write.mode("append").parquet(path)


def test_streaming_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lex = corpus.make_lexicon(seed=42)

    _write_batch(spark, inp, 20, seed=42)
    stream_documents(spark, inp, lex, out, ckpt)
    t1 = spark.read.parquet(f"{out}/triples_stream")
    n1 = t1.count()
    assert n1 > 0
    assert t1.columns == ["subj", "pred", "obj", "batch_id"]

    # new files arrive; availableNow picks up ONLY the new backlog
    _write_batch(spark, inp, 10, seed=7)
    stream_documents(spark, inp, lex, out, ckpt)
    t2 = spark.read.parquet(f"{out}/triples_stream")
    assert t2.count() > n1
    # first batch not reprocessed: its triples appear exactly once
    dup = (t2.groupBy("subj", "pred", "obj").count()
           .filter("count > 2").count())
    assert dup == 0
