"""Stage 2 — segmentation. Operators X1-X4 of SURVEY.md §2.8.

Re-implements the observable semantics of the reference segmentation
(multi_ner/ops.py: sentence_split :78-146, CoNLL_tokenizer :72-76,
input_form :36-62, json_to_sent :15-34) as one Arrow-batched
``mapInPandas`` UDF emitting word rows. The lookahead heuristics of the
splitter are not expressible in native SQL (SURVEY §2.8 X1), so this is
a designed Python region — everything downstream is relational again.

Implementation is from scratch (regex scanning rather than the
reference's char-by-char loop) but bit-for-bit output-equivalent; see
tests/test_segment.py which property-compares against the reference
module imported as a pure-Python oracle.

Conventions:
* spans are character offsets into the *cleaned* text, end EXCLUSIVE
  (the reference emits inclusive ends, multi_ner/ops.py:56-57; we add 1
  here once instead of patching downstream like bern2/normalizer.py:121).
* one row per word occurrence, with per-sentence ``word_idx`` and
  doc-global ``tok_idx`` (the reference recovers global token indices by
  re-tokenizing prefixes, multi_ner/ops.py:188-206 — we carry the index
  instead: O(1) vs O(n^2)).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

# Same token alphabet as the reference (multi_ner/ops.py:13): maximal
# alphanumeric runs, every other char its own token.
_TOKEN_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z]")

# '.' splits only when followed by space + one of these (ops.py:94-95).
_AFTER_DOT = set('ABCDEFGHIJKLMNOPQRSTUVWXYZ-"\'')

MAX_SENT_TOKENS = 100   # ops.py:101
RAW_CHUNK = 200         # ops.py:104-105
TITLE_WHOLE_LIMIT = 50  # ops.py:20
WORD_CAP_TRIGGER = 20   # ops.py:49
WORD_CAP_KEEP = 10      # ops.py:50 (quirk: >20-char words keep 10 chars)


def raw_tokens(text: str) -> List[str]:
    """All regex tokens including single spaces (reference's rawTok)."""
    return _TOKEN_RE.findall(text)


def conll_tokens(text: str) -> List[str]:
    """X2 — CoNLL tokens: raw tokens minus single-space tokens."""
    return [t for t in _TOKEN_RE.findall(text) if t != " "]


def _chunk_oversized(sent: str, out: List[str]) -> None:
    """Hard-wrap a >100-token sentence into 200-raw-token chunks
    (ops.py:101-117/127-143). Note the asymmetric bounds: entered when
    token count > 100, exits when a remainder drops below 100 — an
    exactly-100-token remainder is chunked again, as in the reference."""
    while True:
        raw = raw_tokens(sent)
        out.append("".join(raw[:RAW_CHUNK]))
        sent = "".join(raw[RAW_CHUNK:])
        if len(conll_tokens(sent)) < MAX_SENT_TOKENS:
            if sent.strip() != "":
                out.append(sent)
            return


def _emit(sent: str, out: List[str]) -> None:
    if len(conll_tokens(sent)) > MAX_SENT_TOKENS:
        _chunk_oversized(sent, out)
    else:
        out.append(sent)


def sentence_split(text: str) -> List[str]:
    """X1 — rule-based splitter, output-equivalent to ops.py:78-146.

    Split after '?'/'!' anywhere, and after '.' only when followed by
    ' ' + uppercase/dash/quote; the last two characters never split
    (idx > len-3 takes the rest). Sentences concatenate back to the
    exact input text — offsets stay absolute."""
    n = len(text)
    sentences: List[str] = []
    piv = 0
    for idx in range(n):
        ch = text[idx]
        if ch in "?!":
            if idx > n - 3:
                _emit(text[piv:], sentences)
                return sentences
            _emit(text[piv:idx + 1], sentences)
            piv = idx + 1
        elif ch == ".":
            if idx > n - 3:
                _emit(text[piv:], sentences)
                return sentences
            if text[idx + 1] == " " and text[idx + 2] in _AFTER_DOT:
                _emit(text[piv:idx + 1], sentences)
                piv = idx + 1
    _emit(text[piv:], sentences)
    return sentences


def split_document(text: str) -> List[str]:
    """X4 — document-level sentence list. The /plain path feeds the whole
    text as the PubTator title (bern2/bern2.py:353-357), so: keep whole
    if under 50 tokens, else split (ops.py:20-26); drop a lone
    empty/whitespace sentence."""
    if len(conll_tokens(text)) < TITLE_WHOLE_LIMIT:
        sents = [text]
    else:
        sents = sentence_split(text)
    if len(sents) == 1 and sents[0].strip() == "":
        return []
    return sents


def segment_text(text: str) -> List[Tuple[int, int, int, str, int, int]]:
    """X3 — word rows for one document.

    Returns (sent_idx, word_idx, tok_idx, word, start, end_exclusive).
    ``word`` carries the reference's model-facing cap: words longer than
    20 chars keep only their first 10 (ops.py:49-52) — offsets still
    describe the full original word."""
    rows: List[Tuple[int, int, int, str, int, int]] = []
    doc_piv = 0
    tok_idx = 0
    for sent_idx, sent in enumerate(split_document(text)):
        sent_piv = 0
        for word_idx, w in enumerate(conll_tokens(sent)):
            rel = sent.index(w, sent_piv)
            start = doc_piv + rel
            end = start + len(w)  # exclusive
            sent_piv = rel + len(w)
            word = w[:WORD_CAP_KEEP] if len(w) > WORD_CAP_TRIGGER else w
            rows.append((sent_idx, word_idx, tok_idx, word, start, end))
            tok_idx += 1
        doc_piv += len(sent)
    return rows


WORDS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("sent_idx", IntegerType(), False),
    StructField("word_idx", IntegerType(), False),
    StructField("tok_idx", IntegerType(), False),
    StructField("word", StringType(), False),
    StructField("start", IntegerType(), False),
    StructField("end", IntegerType(), False),
])


def segment(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """DataFrame op: (doc_id, text) -> word rows via mapInPandas.

    Emits exploded rows directly (no giant nested arrays per doc), so
    Arrow batch memory stays bounded by words-per-batch, not by the
    widest document. Narrow transformation — no shuffle."""
    import pandas as pd  # local import: resolved on executors

    src = docs.select("doc_id", text_col)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "sent_idx", "word_idx", "tok_idx",
                    "word", "start", "end")}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                for s_i, w_i, t_i, w, st, en in segment_text(text or ""):
                    out["doc_id"].append(doc_id)
                    out["sent_idx"].append(s_i)
                    out["word_idx"].append(w_i)
                    out["tok_idx"].append(t_i)
                    out["word"].append(w)
                    out["start"].append(st)
                    out["end"].append(en)
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=WORDS_SCHEMA)
