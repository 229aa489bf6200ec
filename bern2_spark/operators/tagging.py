"""Stage 3 — multi-type BIO tagging. Operators M1/M2/W2 + A3 of SURVEY §2.

The reference runs a RoBERTa multi-head tagger over 9 entity types
(multi_ner/modeling.py:125-186) batched on GPU (main.py:702-801). Our
engine keeps the same *interface* — an Arrow-batched UDF mapping
documents to per-type BIO mentions with probabilities — behind a
``Tagger`` seam with two implementations:

* ``SurrogateTagger`` (this module): deterministic gazetteer + suffix
  rules with hash-seeded probabilities. Hermetic, CPU-only; used by
  tests/bench (SURVEY §5, §7 "model determinism").
* a real transformer checkpoint can drop in by implementing
  ``tag_sentence_probs`` with model inference — the Spark plumbing
  (batching, schema, decode, prob aggregation) is identical.

Two execution paths produce identical mentions (tested against each
other and against the reference's get_prob decode):

* ``extract_mentions`` — the FUSED scale path: one ``mapInPandas`` over
  (doc_id, text) doing segment+tag+decode in a single pass. Zero
  shuffles; Arrow batch memory bounded by docs-per-batch.
* ``tag_words`` + ``bio_decode`` — the RELATIONAL path: per-word tag
  rows, then W2 as a running-sum window (run ids) + groupBy. Used to
  validate the fused path and to expose W2 as a first-class operator.

Probability semantics copy the reference exactly (A3,
multi_ner/ops.py:188-206 with its token-slicing quirk): mention prob =
mean of per-token max-softmax over the run's tokens, EXCLUDING the last
token when it is single-character and the run has more than one token.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bern2_spark import schemas
from bern2_spark.operators.segment import conll_tokens, segment_text

# NER types tagged by the multi-task model (multi_ner/main.py:523).
NER_TYPES = ["disease", "drug", "gene", "species", "cell_line", "DNA",
             "RNA", "cell_type"]

# Suffix heuristics: deterministic stand-ins for the neural model's
# ability to tag surfaces absent from any lexicon (these produce the
# CUI-less mentions that exercise the neural-normalization fallback).
SUFFIX_RULES: List[Tuple[str, str]] = [
    ("osis", "disease"),
    ("umab", "drug"),
    ("kinase", "gene"),
    ("virus", "species"),
    ("cyte", "cell_type"),
]

MAX_GAZ_TOKENS = 4


# ------------------------------------------------------------- gazetteer

def build_gazetteer(lexicon_rows: Sequence[Tuple[str, str, str]]
                    ) -> Dict[str, List[Tuple[Tuple[str, ...], str]]]:
    """first-token -> [(token tuple, ent_type)] sorted longest-first.
    Surfaces are CoNLL-tokenized and lowercased; matching is greedy
    longest-match per type."""
    gaz: Dict[str, List[Tuple[Tuple[str, ...], str]]] = {}
    seen = set()
    for ent_type, _cui, name in lexicon_rows:
        toks = tuple(t.lower() for t in conll_tokens(name))
        if not toks or len(toks) > MAX_GAZ_TOKENS:
            continue
        key = (toks, ent_type)
        if key in seen:
            continue
        seen.add(key)
        gaz.setdefault(toks[0], []).append((toks, ent_type))
    for k in gaz:
        gaz[k].sort(key=lambda e: len(e[0]), reverse=True)
    return gaz


def token_prob(ent_type: str, word: str) -> float:
    """Deterministic per-(type, token) pseudo max-softmax in [0.5, 0.99]."""
    h = hashlib.md5(f"{ent_type}|{word.lower()}".encode()).digest()
    return 0.5 + (int.from_bytes(h[:4], "big") % 10**6) / 10**6 * 0.49


class SurrogateTagger:
    """Deterministic multi-type BIO tagger (the M1 surrogate)."""

    def __init__(self, gazetteer, suffix_rules=None):
        self.gaz = gazetteer
        self.suffix_rules = (SUFFIX_RULES if suffix_rules is None
                             else suffix_rules)

    def tag_sentence(self, words: List[str]) -> Dict[str, List[Tuple[int, str]]]:
        """-> {ent_type: [(word_idx, 'B'|'I'), ...]} (O implicit).

        Each type is tagged independently (like the per-type heads of
        the reference model) with greedy longest-match; implemented as
        ONE candidate-collection pass over the tokens plus a per-type
        greedy reconciliation — output-equivalent to scanning the
        sentence once per type, but ~|types|x faster on the (dominant)
        no-match tokens."""
        lowered = [w.lower() for w in words]
        n = len(words)
        cands: Dict[str, List[Tuple[int, int, int]]] = {}
        for i, lw in enumerate(lowered):
            for toks, etype in self.gaz.get(lw, ()):
                k = len(toks)
                if i + k <= n and tuple(lowered[i:i + k]) == toks:
                    cands.setdefault(etype, []).append((i, k, 1))
            for suffix, etype in self.suffix_rules:
                if len(lw) > len(suffix) + 2 and lw.endswith(suffix):
                    cands.setdefault(etype, []).append((i, 1, 0))
        out: Dict[str, List[Tuple[int, str]]] = {}
        for etype, lst in cands.items():
            # per position: gazetteer beats suffix rule, longest first
            lst.sort(key=lambda c: (c[0], -c[2], -c[1]))
            tags: List[Tuple[int, str]] = []
            next_free = 0
            for i, k, _g in lst:
                if i < next_free:
                    continue
                tags.append((i, "B"))
                tags.extend((j, "I") for j in range(i + 1, i + k))
                next_free = i + k
            out[etype] = tags
        return out


# ------------------------------------------------- shared decode (A3 rule)

def mention_prob(probs: List[float], last_tok_len: int) -> float:
    """A3 — reference token-slice semantics (multi_ner/ops.py:188-206):
    drop the final token iff it is a single character AND the run has
    more than one token."""
    if len(probs) > 1 and last_tok_len == 1:
        probs = probs[:-1]
    return sum(probs) / len(probs)


def _decode_runs(word_rows, tags: List[Tuple[int, str]], ent_type: str):
    """BIO runs -> (start, end_exclusive, prob). ``word_rows`` is the
    sentence's [(word, start, end), ...]."""
    runs: List[List[int]] = []
    for idx, tag in tags:
        if tag == "B":
            runs.append([idx])
        else:  # 'I' always continues the preceding B in surrogate output
            runs[-1].append(idx)
    out = []
    for run in runs:
        first, last = run[0], run[-1]
        start = word_rows[first][1]
        end = word_rows[last][2]
        probs = [token_prob(ent_type, word_rows[i][0]) for i in run]
        out.append((start, end, mention_prob(probs, word_rows[last][2]
                                             - word_rows[last][1])))
    return out


# ---------------------------------------------------------- fused path

def extract_mentions(docs: DataFrame, lexicon_rows,
                     text_col: str = "text") -> DataFrame:
    """M1+M2+W2 fused: (doc_id, text) -> MENTIONS rows in one
    mapInPandas pass. The gazetteer rides a SparkContext broadcast
    (reference keeps its dicts in RAM per process, normalizers/*.py)."""
    import pandas as pd

    spark = docs.sparkSession
    gaz_bc = spark.sparkContext.broadcast(build_gazetteer(lexicon_rows))
    src = docs.select("doc_id", text_col)

    out_schema = ("doc_id string, ent_type string, start int, end int, "
                  "mention string, prob double")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        tagger = SurrogateTagger(gaz_bc.value)
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "ent_type", "start", "end", "mention", "prob")}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                text = text or ""
                # group word rows by sentence
                sents: Dict[int, list] = {}
                for s_i, _w_i, _t_i, w, st, en in segment_text(text):
                    sents.setdefault(s_i, []).append((w, st, en))
                for s_i in sorted(sents):
                    word_rows = sents[s_i]
                    words = [w for w, _s, _e in word_rows]
                    for ent_type, tags in tagger.tag_sentence(words).items():
                        for start, end, prob in _decode_runs(
                                word_rows, tags, ent_type):
                            rows["doc_id"].append(doc_id)
                            rows["ent_type"].append(ent_type)
                            rows["start"].append(start)
                            rows["end"].append(end)
                            rows["mention"].append(text[start:end])
                            rows["prob"].append(prob)
            yield pd.DataFrame(rows)

    mentions = src.mapInPandas(gen, schema=out_schema)
    return finalize_mentions(mentions)


def finalize_mentions(mentions: DataFrame) -> DataFrame:
    """Attach the stable ``mention_id`` (J6 replacement: a deterministic
    hash key instead of the reference's fragile positional zip,
    bern2/normalizer.py:162-170 — embarrassingly parallel, no global
    row_number shuffle) and the mutation columns (null here)."""
    return (mentions
            .withColumn("mention_id",
                        F.xxhash64("doc_id", "ent_type", "start", "end"))
            .withColumn("mutation_type", F.lit(None).cast("string"))
            .withColumn("normalized_name", F.lit(None).cast("string"))
            .select([f.name for f in schemas.MENTIONS.fields]))


# -------------------------------------------------------- relational path

def tag_words(words: DataFrame, lexicon_rows) -> DataFrame:
    """Per-word tag rows (B/I only; O rows carry no information and are
    not materialized). Grouped per sentence so the tagger sees whole
    sentences: applyInPandas over (doc_id, sent_idx)."""
    import pandas as pd

    spark = words.sparkSession
    gaz_bc = spark.sparkContext.broadcast(build_gazetteer(lexicon_rows))

    out_schema = ("doc_id string, sent_idx int, word_idx int, word string, "
                  "start int, end int, ent_type string, tag string, "
                  "prob double")

    def tag_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        tagger = SurrogateTagger(gaz_bc.value)
        pdf = pdf.sort_values("word_idx")
        word_list = list(pdf["word"])
        rows = []
        for ent_type, tags in tagger.tag_sentence(word_list).items():
            for idx, tag in tags:
                r = pdf.iloc[idx]
                rows.append((r["doc_id"], int(r["sent_idx"]), int(idx),
                             r["word"], int(r["start"]), int(r["end"]),
                             ent_type, tag, token_prob(ent_type, r["word"])))
        return pd.DataFrame(rows, columns=[
            "doc_id", "sent_idx", "word_idx", "word", "start", "end",
            "ent_type", "tag", "prob"])

    return (words.groupBy("doc_id", "sent_idx")
            .applyInPandas(tag_group, schema=out_schema))


def bio_decode(tags: DataFrame) -> DataFrame:
    """W2 — relational BIO decode: running count of B's as run id
    (window), then one groupBy per run for span + A3 probability.
    SURVEY §2.5 W2's window formulation."""
    w = (Window.partitionBy("doc_id", "ent_type", "sent_idx")
         .orderBy("word_idx"))
    runs = tags.withColumn(
        "run_id", F.sum((F.col("tag") == "B").cast("int")).over(w))
    run_w = Window.partitionBy("doc_id", "ent_type", "sent_idx", "run_id")
    enriched = (runs
                .withColumn("run_n", F.count("*").over(run_w))
                .withColumn("max_word_idx", F.max("word_idx").over(run_w))
                .withColumn("last_len",
                            F.max(F.when(F.col("word_idx") == F.col("max_word_idx"),
                                         F.col("end") - F.col("start"))).over(run_w)))
    # A3: exclude the last token from the average iff single-char & run>1
    included = enriched.withColumn(
        "in_avg",
        ~((F.col("word_idx") == F.col("max_word_idx"))
          & (F.col("last_len") == 1) & (F.col("run_n") > 1)))
    return (included.groupBy("doc_id", "ent_type", "sent_idx", "run_id")
            .agg(F.min("start").alias("start"),
                 F.max("end").alias("end"),
                 (F.sum(F.when(F.col("in_avg"), F.col("prob")))
                  / F.sum(F.col("in_avg").cast("int"))).alias("prob"))
            .drop("sent_idx", "run_id"))


def mentions_via_relational(docs: DataFrame, words: DataFrame,
                            lexicon_rows) -> DataFrame:
    """Full relational path: tag -> W2 decode -> join doc text for the
    mention surface (P11: substring projection, bern2/normalizer.py:129)."""
    decoded = bio_decode(tag_words(words, lexicon_rows))
    with_text = decoded.join(docs.select("doc_id", "text"), "doc_id")
    mentions = with_text.select(
        "doc_id", "ent_type", "start", "end",
        F.expr("substring(text, start + 1, end - start)").alias("mention"),
        "prob")
    return finalize_mentions(mentions)
