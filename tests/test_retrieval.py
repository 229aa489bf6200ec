"""BM25 lexical retrieval (dataprep/retrieval.py): hand-computed
scores on a tiny corpus, tie-break determinism, and partition
invariance."""

import math

from pyspark.sql import functions as F

from bern2_spark.dataprep.retrieval import bm25_rank

K1, B = 1.2, 0.75

DOCS = [
    ("r1", "a.py", "spark window merge window"),
    ("r1", "b.py", "merge sort merge sort merge"),
    ("r2", "c.py", "apache license window"),
    ("r2", "d.py", "plain text only here"),
]


def _expected():
    """Reference BM25 computed independently in Python."""
    toks = {(r, p): c.split() for r, p, c in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = ["apache", "merge", "window"]
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for key, v in toks.items():
        s = 0.0
        dl = len(v)
        for t in terms:
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
        if s:
            out[key] = round(s, 6)
    return out


def test_bm25_hand_computed(spark):
    df = spark.createDataFrame(DOCS, ["repo", "path", "content"])
    got = {(r.repo, r.path): r.bm25
           for r in bm25_rank(df, ["apache", "merge", "window"],
                              topk=10).collect()}
    exp = _expected()
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-6, (k, got[k], exp[k])
    # d.py matches no query term -> absent, not zero-scored
    assert ("r2", "d.py") not in got


def test_bm25_topk_and_order(spark):
    df = spark.createDataFrame(DOCS, ["repo", "path", "content"])
    rows = bm25_rank(df, ["apache", "merge", "window"], topk=2).collect()
    assert len(rows) == 2
    assert rows[0].bm25 >= rows[1].bm25
    # the top hit is the rare-term doc (apache has the highest idf)
    assert (rows[0].repo, rows[0].path) == ("r2", "c.py")


def test_bm25_partition_invariance(spark):
    df = spark.createDataFrame(DOCS * 5, ["repo", "path", "content"])
    df = df.withColumn("path",
                       F.concat_ws("#", "path",
                                   F.monotonically_increasing_id()))
    a = bm25_rank(df, ["merge", "window"], topk=5)
    b = bm25_rank(df.repartition(7), ["merge", "window"], topk=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rrf_fuse_hand_computed(spark):
    from bern2_spark.dataprep.retrieval import rrf_fuse
    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                                ["doc_id", "rank"])
    sem = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    got = {r.doc_id: r.rrf_score
           for r in rrf_fuse([lex, sem], topk=10).collect()}
    exp = {1: 1 / 61, 2: 1 / 62, 3: 1 / 63 + 1 / 61, 4: 1 / 62}
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - round(exp[k], 9)) < 1e-12
    # doc 3 (present in both lists) outranks every single-list doc
    assert got[3] == max(got.values())


def test_rrf_fuse_topk_tie_break(spark):
    from bern2_spark.dataprep.retrieval import rrf_fuse
    a = spark.createDataFrame([(i, 1) for i in range(5)],
                              ["doc_id", "rank"])
    rows = rrf_fuse([a], topk=3).collect()
    # all five tie at 1/61: the deterministic cut keeps lowest ids
    assert [r.doc_id for r in rows] == [0, 1, 2]
