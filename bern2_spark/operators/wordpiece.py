"""X5/X6 — the real-model feature path: wordpiece tokenization, the
128-token sliding-window feature builder, first-subtoken labeling, and
detokenization.

Re-implements the observable semantics of the reference's
``convert_examples_to_features`` (multi_ner/main.py:242-416) and
``detokenize`` (multi_ner/ops.py:209-246) WITHOUT torch/transformers:
the greedy wordpiece matcher follows the published WordPiece algorithm
(Wu et al. 2016; the HuggingFace BertTokenizer reference behavior), and
the window/label bookkeeping mirrors the reference line-for-line,
including its quirks:

* window 0 holds ``max_seq - specials`` tokens but windows i>=1 are
  sliced ``max_seq`` wide (main.py:309-317) — a FULL continuation
  window therefore overflows after [CLS]/[SEP] are added, where the
  reference fails its length assert (main.py:388); we raise
  ``WindowOverflowError`` with the same trigger condition.
* the window count is ``len(tokens)//max_seq + 1`` (main.py:309), so a
  sentence with e.g. ``max_seq - 1`` wordpieces silently drops its last
  piece (window 0 keeps ``max_seq - 2``, no window 1 is scheduled).
* the first subtoken of each word carries the word's label id; the
  remaining subtokens carry ``pad_token_label_id`` (main.py:285).
* ``det_tokens`` mark continuation pieces with a ``##`` prefix
  (main.py:287-295) so ``detokenize`` can merge them back, INCLUDING
  the cross-window case where a window starts mid-word and the piece
  is appended to the previous window's last token (ops.py:233-238).

A real BioBERT/RoBERTa checkpoint drops in by supplying
``window_logits_fn`` to ``RealModelTagger`` — everything else
(batching, schema, windowing, detokenize, BIO decode, A3 probability)
is engine code and is exercised hermetically by a deterministic fake.

NB: no ``from __future__ import annotations`` — keep runtime-real type
hints for any pandas_udf interop.
"""

import math
from collections.abc import Iterator
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLS, SEP, PAD, UNK = "[CLS]", "[SEP]", "[PAD]", "[UNK]"
NULL_TOKEN = "**NULL**"          # main.py:377 padding display token
PAD_LABEL_ID = -100              # main.py:255 pad_token_label_id
SPECIAL_TOKENS_COUNT = 2         # BERT: [CLS] + [SEP] (main.py:301)

BIO_LABELS = ["B", "I", "O"]     # per-type head label set
LABEL_MAP = {lab: i for i, lab in enumerate(BIO_LABELS)}


class WindowOverflowError(ValueError):
    """Raised where the reference's length assert fails (main.py:388):
    a continuation window sliced max_seq wide plus [CLS]/[SEP] exceeds
    max_seq. The reference crashes on such sentences too; callers
    wanting resilience pre-chunk (X1 already bounds sentences)."""


class WordpieceVocab:
    """Greedy longest-match-first wordpiece tokenizer over a fixed
    vocabulary. Continuation pieces are stored WITH their '##' prefix
    (BERT convention). Special ids: [PAD]=0, [UNK]=1, [CLS]=2, [SEP]=3,
    then the pieces in the order given."""

    MAX_CHARS_PER_WORD = 100  # HF WordpieceTokenizer default

    def __init__(self, pieces: Sequence[str]):
        self.tok2id: Dict[str, int] = {PAD: 0, UNK: 1, CLS: 2, SEP: 3}
        for p in pieces:
            if p not in self.tok2id:
                self.tok2id[p] = len(self.tok2id)

    @classmethod
    def from_vocab_lines(cls, lines: Sequence[str]) -> "WordpieceVocab":
        """A CHECKPOINT's vocab.txt: one piece per line, id = line
        number — the HF WordPiece file format (dmis-lab/bern2-ner ships
        one beside its weights; the reference loads it via
        AutoTokenizer, multi_ner/main.py:513). Unlike ``from_words``,
        ids here are fixed by the file so they key the checkpoint's
        embedding rows. The four specials must appear somewhere in the
        file (BERT files put [PAD] at 0 and [UNK] at 100 — any
        positions work, padding uses tok2id[PAD])."""
        self = cls.__new__(cls)
        self.tok2id = {}
        for i, piece in enumerate(lines):
            piece = piece.rstrip("\n")
            if piece and piece not in self.tok2id:
                self.tok2id[piece] = i
        missing = [s for s in (PAD, UNK, CLS, SEP) if s not in self.tok2id]
        if missing:
            raise ValueError(f"vocab file lacks special tokens: {missing}")
        return self

    @classmethod
    def from_words(cls, words: Sequence[str],
                   prefix_len: int = 4) -> "WordpieceVocab":
        """Deterministic corpus vocab: each distinct word contributes
        its whole self (len<=prefix_len) or (word[:prefix_len],
        '##'+word[prefix_len:]). With this construction the greedy
        matcher provably yields exactly those pieces — the closed form
        the SQL oracle twin uses. Pieces are sorted for stable ids."""
        pieces = set()
        for w in words:
            if not w:
                continue
            if len(w) <= prefix_len:
                pieces.add(w)
            else:
                pieces.add(w[:prefix_len])
                pieces.add("##" + w[prefix_len:])
        return cls(sorted(pieces))

    def tokenize(self, word: str) -> List[str]:
        """Published WordPiece greedy algorithm: longest vocab piece
        matching the remainder ('##'-prefixed after the first), whole
        word -> [UNK] when any position has no match."""
        if not word:
            return []
        if len(word) > self.MAX_CHARS_PER_WORD:
            return [UNK]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.tok2id:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def ids(self, tokens: Sequence[str]) -> List[int]:
        unk = self.tok2id[UNK]
        return [self.tok2id.get(t, unk) for t in tokens]


def convert_words_to_features(words: Sequence[str], labels: Sequence[str],
                              vocab: WordpieceVocab,
                              label_map: Optional[Dict[str, int]] = None,
                              max_seq_length: int = 128) -> List[dict]:
    """X5 — one example (a sentence) -> its sliding-window features.
    Mirrors main.py:275-416: first-subtoken labeling, det-token '##'
    bookkeeping, the asymmetric window slices, [SEP]/[CLS] wrapping,
    and right-padding to max_seq_length."""
    label_map = LABEL_MAP if label_map is None else label_map
    stc = SPECIAL_TOKENS_COUNT
    tokens: List[str] = []
    label_ids: List[int] = []
    det_tokens: List[str] = []
    for word, label in zip(words, labels):
        wt = vocab.tokenize(word)
        if not wt:     # main.py:282 — empty tokenization is skipped
            continue
        tokens.extend(wt)
        label_ids.extend([label_map[label]]
                         + [PAD_LABEL_ID] * (len(wt) - 1))
        det_tokens.append(wt[0])
        det_tokens.extend(p if p.startswith("##") else "##" + p
                          for p in wt[1:])

    windows = []
    for i in range((len(tokens) // max_seq_length) + 1):
        if i == 0:
            sl = slice(0, max_seq_length - stc)
        else:
            sl = slice(i * max_seq_length - stc,
                       (i + 1) * max_seq_length - stc)
        w_toks = tokens[sl] + [SEP]
        w_labs = label_ids[sl] + [PAD_LABEL_ID]
        w_dets = det_tokens[sl] + [SEP]
        w_toks = [CLS] + w_toks
        w_labs = [PAD_LABEL_ID] + w_labs
        w_dets = [CLS] + w_dets
        if len(w_toks) > max_seq_length:
            raise WindowOverflowError(
                f"window {i} holds {len(w_toks)} tokens > max_seq_length"
                f"={max_seq_length}; the reference asserts here "
                "(multi_ner/main.py:388) — pre-chunk the sentence")
        input_ids = vocab.ids(w_toks)
        attention_mask = [1] * len(input_ids)
        pad_n = max_seq_length - len(input_ids)
        windows.append({
            "window_idx": i,
            "tokens": w_toks + [NULL_TOKEN] * pad_n,
            "det_tokens": w_dets + [NULL_TOKEN] * pad_n,
            "input_ids": input_ids + [vocab.tok2id[PAD]] * pad_n,
            "attention_mask": attention_mask + [0] * pad_n,
            "label_ids": w_labs + [PAD_LABEL_ID] * pad_n,
        })
    return windows


def detokenize(tokens: Sequence[str], predicts: Sequence,
               logits: Sequence) -> Tuple[List[List[str]], List[list],
                                          List[list]]:
    """X6 — merge wordpieces back to words, keeping the FIRST piece's
    label/logit per word. From-scratch twin of multi_ner/ops.py:209-246
    (same [CLS]-skip, [SEP]-flush, '##'-merge, and the sliding-window
    edge where a window-initial '##' piece joins the PREVIOUS window's
    last word). Inputs must already exclude padding (the reference's
    token files never contain '**NULL**', main.py:428)."""
    words: List[List[str]] = []
    labels: List[list] = []
    logs: List[list] = []
    cur_w: List[str] = []
    cur_l: list = []
    cur_s: list = []
    for t, l, s in zip(tokens, predicts, logits):
        if t in (CLS, "<s>"):
            continue
        if t in (SEP, "</s>"):
            words.append(cur_w)
            labels.append(cur_l)
            logs.append(cur_s)
            cur_w, cur_l, cur_s = [], [], []
            continue
        if t.startswith("##"):
            if cur_w:
                cur_w[-1] = cur_w[-1] + t[2:]
            elif words and words[-1]:
                # window starts mid-word: append to the previous
                # window's final word (ops.py:236-238)
                words[-1][-1] += t[2:]
            else:
                raise WindowOverflowError(
                    f"continuation piece {t!r} with no preceding word "
                    "(malformed window stream)")
        elif t.startswith("Ġ"):   # roberta 'Ġ' piece (ops.py:239)
            if cur_w:
                cur_w[-1] = cur_w[-1] + t.replace("Ġ", " ")
            elif words and words[-1]:
                # window starts mid-word (BPE checkpoint): same
                # previous-window fallback as the '##' branch above.
                # The reference ops.py lacks this and would IndexError.
                words[-1][-1] += t.replace("Ġ", " ")
            else:
                raise WindowOverflowError(
                    f"continuation piece {t!r} with no preceding word "
                    "(malformed window stream)")
        else:
            cur_w.append(t)
            cur_l.append(l)
            cur_s.append(s)
    return words, labels, logs


# ----------------------------------------------------- real-model tagger

def _softmax_max(row) -> float:
    m = max(row)
    exps = [math.exp(x - m) for x in row]
    return max(exps) / sum(exps)


def fake_logits_fn(gazetteer, suffix_rules=None
                   ) -> Callable[[List[str], List[dict], str], List[list]]:
    """Deterministic stand-in for a model forward pass: derives one-hot
    B/I/O logits from the SurrogateTagger's word-level decisions, laid
    out on the first subtoken of each word. Exercises the full X5 ->
    inference -> X6 -> decode round trip; a real checkpoint replaces
    this with a batched forward over input_ids/attention_mask."""
    from bern2_spark.operators.tagging import SurrogateTagger
    tagger = SurrogateTagger(gazetteer, suffix_rules)

    def fn(words: List[str], windows: List[dict], ent_type: str):
        tag_by_idx = dict(tagger.tag_sentence(words).get(ent_type, []))
        word_labels = [tag_by_idx.get(i, "O") for i in range(len(words))]
        out = []
        for win in windows:
            rows = []
            word_cursor = sum(
                1 for prev in windows if prev["window_idx"] < win["window_idx"]
                for lid in prev["label_ids"] if lid != PAD_LABEL_ID)
            for tok, lid in zip(win["tokens"], win["label_ids"]):
                if tok == NULL_TOKEN:
                    break
                if lid == PAD_LABEL_ID:
                    rows.append([0.0, 0.0, 6.0])      # specials/pieces: O
                else:
                    lab = word_labels[word_cursor]
                    word_cursor += 1
                    one_hot = [0.0, 0.0, 0.0]
                    one_hot[LABEL_MAP[lab]] = 6.0
                    rows.append(one_hot)
            out.append(rows)
        return out

    return fn


def tag_sentence_real(words: List[str], vocab: WordpieceVocab,
                      logits_fn, ent_types: Sequence[str],
                      max_seq_length: int = 128
                      ) -> Dict[str, List[Tuple[int, str, float]]]:
    """One sentence through the real-model path for each entity type:
    X5 features -> logits -> argmax (M2) -> X6 detokenize -> word-level
    (idx, 'B'|'I', max-softmax prob) runs the decode layer consumes."""
    out: Dict[str, List[Tuple[int, str, float]]] = {}
    windows = convert_words_to_features(
        words, ["O"] * len(words), vocab, max_seq_length=max_seq_length)
    for ent_type in ent_types:
        logits = logits_fn(words, windows, ent_type)
        flat_toks: List[str] = []
        flat_preds: List[int] = []
        flat_logits: List[list] = []
        for win, win_logits in zip(windows, logits):
            for det, row in zip(win["det_tokens"], win_logits):
                if det == NULL_TOKEN:
                    break
                flat_toks.append(det)
                flat_preds.append(max(range(len(row)), key=row.__getitem__))
                flat_logits.append(row)
        sents_words, sents_labels, sents_logits = detokenize(
            flat_toks, flat_preds, flat_logits)
        # windows of one sentence flush at each [SEP]; re-concatenate
        tags: List[Tuple[int, str, float]] = []
        idx = 0
        for ws, ls, gs in zip(sents_words, sents_labels, sents_logits):
            for _w, lab_id, row in zip(ws, ls, gs):
                lab = BIO_LABELS[lab_id]
                if lab != "O":
                    tags.append((idx, lab, _softmax_max(row)))
                idx += 1
        if tags:
            out[ent_type] = tags
    return out


def extract_mentions_real(docs: DataFrame, lexicon_rows,
                          logits_fn_factory=None,
                          max_seq_length: int = 128,
                          text_col: str = "text",
                          vocab: Optional[WordpieceVocab] = None
                          ) -> DataFrame:
    """M1-real — the fused extract_mentions with the real-model path in
    place of the surrogate: segment -> X5 windows -> logits -> X6 ->
    BIO decode. ``logits_fn_factory(gazetteer)`` builds the per-executor
    inference fn; default is the deterministic fake (a checkpoint
    forward drops in here — see operators/checkpoint.py for the frozen
    numpy one). Pass ``vocab`` to build features against a CHECKPOINT's
    fixed vocabulary (required whenever the logits fn consumes
    input_ids: ids must be keyed to the model's embedding rows, not a
    per-sentence vocab); it is broadcast to executors. Output schema ==
    tagging.extract_mentions."""
    import pandas as pd

    from bern2_spark import schemas
    from bern2_spark.operators.segment import segment_text
    from bern2_spark.operators.tagging import (
        NER_TYPES, build_gazetteer, finalize_mentions,
    )

    spark = docs.sparkSession
    gaz_bc = spark.sparkContext.broadcast(build_gazetteer(lexicon_rows))
    vocab_bc = (spark.sparkContext.broadcast(vocab)
                if vocab is not None else None)
    factory = logits_fn_factory or fake_logits_fn
    src = docs.select("doc_id", text_col)
    out_schema = ("doc_id string, ent_type string, start int, end int, "
                  "mention string, prob double")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        logits_fn = factory(gaz_bc.value)
        # vocab is corpus-independent here: built per batch from the
        # batch's words (deterministic); a real deployment broadcasts
        # the checkpoint's fixed vocab instead
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "ent_type", "start", "end", "mention",
                     "prob")}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                text = text or ""
                sents: Dict[int, list] = {}
                for s_i, _w, _t, w, st, en in segment_text(text):
                    sents.setdefault(s_i, []).append((w, st, en))
                for s_i in sorted(sents):
                    word_rows = sents[s_i]
                    words = [w for w, _s, _e in word_rows]
                    sent_vocab = (vocab_bc.value if vocab_bc is not None
                                  else WordpieceVocab.from_words(words))
                    tagged = tag_sentence_real(
                        words, sent_vocab, logits_fn, NER_TYPES,
                        max_seq_length)
                    for ent_type, tags in tagged.items():
                        _emit_runs(rows, doc_id, ent_type, tags,
                                   word_rows, text)
            yield pd.DataFrame(rows)

    mentions = src.mapInPandas(gen, schema=out_schema)
    return finalize_mentions(mentions)


def _emit_runs(rows, doc_id, ent_type, tags, word_rows, text) -> None:
    """Word-level (idx, B/I, prob) -> span rows with the A3 probability
    rule (shared with the surrogate decode)."""
    from bern2_spark.operators.tagging import mention_prob
    runs: List[List[Tuple[int, float]]] = []
    for idx, lab, prob in tags:
        if lab == "B" or not runs or runs[-1][-1][0] != idx - 1:
            runs.append([(idx, prob)])
        else:
            runs[-1].append((idx, prob))
    for run in runs:
        first, last = run[0][0], run[-1][0]
        start = word_rows[first][1]
        end = word_rows[last][2]
        probs = [p for _i, p in run]
        rows["doc_id"].append(doc_id)
        rows["ent_type"].append(ent_type)
        rows["start"].append(start)
        rows["end"].append(end)
        rows["mention"].append(text[start:end])
        rows["prob"].append(
            mention_prob(probs, word_rows[last][2] - word_rows[last][1]))


# ------------------------------------------------------- Spark plumbing

FEATURE_ROWS_SCHEMA = ("doc_id string, window_idx int, seq_pos int, "
                       "token string, input_id int, label_id int, "
                       "attention_mask int")


def wordpiece_feature_windows(docs: DataFrame, vocab: WordpieceVocab,
                              max_seq_length: int = 32,
                              word_limit: int = 25,
                              text_col: str = "text") -> DataFrame:
    """X5 as a first-class DataFrame op: whitespace words (first
    ``word_limit`` per doc, like example.words.split(), main.py:278)
    -> sliding-window features, exploded to one row per (window,
    position) — including [CLS]/[SEP]/[PAD] bookkeeping rows. Word
    label rule (shared with the SQL oracle): 'B' when len(word) > 6
    else 'O'. The vocab is a driver-built broadcast (S7 pattern)."""
    import pandas as pd

    spark = docs.sparkSession
    vocab_bc = spark.sparkContext.broadcast(vocab)
    src = docs.select("doc_id", text_col)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        voc = vocab_bc.value
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "window_idx", "seq_pos",
                                    "token", "input_id", "label_id",
                                    "attention_mask")}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w != ""]
                words = words[:word_limit]
                labels = ["B" if len(w) > 6 else "O" for w in words]
                for win in convert_words_to_features(
                        words, labels, voc, max_seq_length=max_seq_length):
                    for pos, (tok, iid, lid, am) in enumerate(zip(
                            win["tokens"], win["input_ids"],
                            win["label_ids"], win["attention_mask"])):
                        rows["doc_id"].append(doc_id)
                        rows["window_idx"].append(win["window_idx"])
                        rows["seq_pos"].append(pos)
                        rows["token"].append(tok)
                        rows["input_id"].append(iid)
                        rows["label_id"].append(lid)
                        rows["attention_mask"].append(am)
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=FEATURE_ROWS_SCHEMA)


def corpus_vocab(docs: DataFrame, word_limit: int = 25,
                 prefix_len: int = 4,
                 text_col: str = "text",
                 max_vocab_words: int = 262_144) -> WordpieceVocab:
    """Driver-side vocab build over the corpus' (limited) words — the
    batch analogue of loading a checkpoint's vocab file. At 100 TB a
    real vocab is a fixed file, not derived from the corpus.

    Driver memory is BOUNDED: orderBy+limit plans as
    TakeOrderedAndProject, so at most ``max_vocab_words`` short strings
    ever reach the driver even on a pathological corpus with no
    repeated words. The cap is deterministic (lexicographic first-N),
    matching the sorted-distinct vocab the oracle builds; a corpus
    whose distinct-word count exceeds the cap should load a fixed
    vocab file instead (WordpieceVocab.from_words on the file)."""
    words_col = F.slice(
        F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != ""),
        1, word_limit)
    distinct_words = (docs.select(F.explode(words_col).alias("w"))
                      .distinct().orderBy("w").limit(max_vocab_words)
                      .collect())
    return WordpieceVocab.from_words(sorted(r.w for r in distinct_words),
                                     prefix_len=prefix_len)
