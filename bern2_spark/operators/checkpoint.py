"""M1-real checkpoint — a tiny FROZEN numpy model that proves the
real-model seam end-to-end with REAL weights: X5 features -> batched
numpy forward over ``input_ids``/``attention_mask`` (batch 32, the
reference's inference batch, multi_ner/main.py:702-801) -> M2 argmax ->
X6 detokenize -> BIO decode -> spans.

This is the first path where the consumed inputs are the integer
feature tensors themselves (the surrogate-derived fake in
wordpiece.fake_logits_fn reads tokens/label_ids instead), so it
exercises exactly what a BioBERT checkpoint would: embedding lookup by
input id, a mask-dependent reduction, a matmul head, softmax-able float
logits.

The weights are CONSTRUCTED, not trained — chosen so correctness is
decidable while the math stays real:

* ``E`` — one-hot token embeddings (identity, V x V float32).
* per-type heads ``(W, b)`` — margin-6 B-logit on the id of the FIRST
  wordpiece of each single-token gazetteer surface of that type, O
  everywhere else (continuation '##' pieces are ignored downstream by
  the first-subtoken rule, so their logits are irrelevant by design —
  the same property a trained first-subtoken-labeled head has).
* a context term ``h = emb + 0.1 * masked_mean(emb)`` — the masked mean
  makes the attention mask semantically load-bearing and perturbs every
  logit (so per-mention probabilities genuinely depend on window
  context), but the perturbation is a convex combination of W rows
  scaled by 0.1, bounded by 0.6 < the 6.0 margin, so it provably never
  flips an argmax. Output mention SETS are therefore exactly
  reproducible (golden-able) while logits flow through a real batched
  matmul.

No torch needed; numpy is the reference's own numerical substrate for
this seam (logits land in numpy before decode in main.py:778-801).
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np

from bern2_spark.operators.wordpiece import UNK, WordpieceVocab

BATCH_SIZE = 32  # reference inference batch size, multi_ner/main.py:702

MARGIN = 6.0
CTX_WEIGHT = 0.1


class TinyNumpyCheckpoint:
    """Frozen weights + the vocab they are keyed to (a real deployment
    ships vocab.txt beside the weights the same way)."""

    def __init__(self, vocab: WordpieceVocab, embeddings: np.ndarray,
                 heads: Dict[str, Tuple[np.ndarray, np.ndarray]],
                 ctx_weight: float = CTX_WEIGHT):
        self.vocab = vocab
        self.E = embeddings          # [V, d] float32
        self.heads = heads           # ent_type -> (W [d, 3], b [3])
        self.ctx_weight = ctx_weight

    @classmethod
    def from_lexicon(cls, lexicon_rows: Sequence[Tuple[str, str, str]],
                     ent_types: Sequence[str],
                     prefix_len: int = 4,
                     margin: float = MARGIN,
                     ctx_weight: float = CTX_WEIGHT
                     ) -> "TinyNumpyCheckpoint":
        """Construct the frozen checkpoint from single-token lexicon
        surfaces (lowercased, like the gazetteer; multi-token surfaces
        need sequence context a per-token head cannot carry)."""
        per_type: Dict[str, List[str]] = {t: [] for t in ent_types}
        words = set()
        for ent_type, _cui, name in lexicon_rows:
            w = name.strip().lower()
            if not w or " " in w or ent_type not in per_type:
                continue
            per_type[ent_type].append(w)
            words.add(w)
        vocab = WordpieceVocab.from_words(sorted(words),
                                          prefix_len=prefix_len)
        v_size = len(vocab.tok2id)
        emb = np.eye(v_size, dtype=np.float32)
        heads: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for ent_type in ent_types:
            w_mat = np.zeros((v_size, 3), dtype=np.float32)
            w_mat[:, 2] = margin                     # default: O
            for surface in per_type[ent_type]:
                first = vocab.tokenize(surface)[0]
                if first != UNK:
                    fid = vocab.tok2id[first]
                    w_mat[fid] = (margin, 0.0, 0.0)  # B
            heads[ent_type] = (w_mat, np.zeros(3, dtype=np.float32))
        return cls(vocab, emb, heads, ctx_weight)

    def forward(self, input_ids: Sequence[Sequence[int]],
                attention_mask: Sequence[Sequence[int]],
                ent_type: str) -> np.ndarray:
        """[N, L] windows -> [N, L, 3] float32 logits, processed in
        BATCH_SIZE chunks exactly like the reference's inference loop
        (multi_ner/main.py:702-801: DataLoader(batch_size=32) -> per
        batch forward -> logits concatenated over batches)."""
        if ent_type not in self.heads:
            # no head shipped for this type: constant all-O logits
            # (a zero weight matrix with an O-margin BIAS — independent
            # of the embedding values, unlike a margin column in W,
            # whose sign would follow the hidden-state sum)
            n = len(input_ids)
            length = len(input_ids[0]) if n else 0
            out = np.zeros((n, length, 3), dtype=np.float32)
            out[:, :, 2] = MARGIN
            return out
        w_mat, bias = self.heads[ent_type]
        # accumulate in float64: BLAS reorders the float32 matmul's
        # summation depending on thread count / kernel choice, which
        # wobbles logits by ~1e-8 — enough to flip a downstream
        # round(prob, 6) sitting on a rounding boundary between
        # environments. float64 reorder noise (~1e-16) cannot reach
        # the 1e-6 grid, keeping the pinned golden stable everywhere.
        w64, b64 = w_mat.astype(np.float64), bias.astype(np.float64)
        outs = []
        for i in range(0, len(input_ids), BATCH_SIZE):
            ids = np.asarray(input_ids[i:i + BATCH_SIZE], dtype=np.int64)
            mask = np.asarray(attention_mask[i:i + BATCH_SIZE],
                              dtype=np.float64)
            emb = self.E[ids].astype(np.float64)         # [b, L, d]
            denom = np.clip(mask.sum(axis=1), 1.0, None)  # [b]
            ctx = ((emb * mask[:, :, None]).sum(axis=1)
                   / denom[:, None])                     # [b, d]
            hidden = emb + self.ctx_weight * ctx[:, None, :]
            outs.append(hidden @ w64 + b64)              # [b, L, 3]
        return np.concatenate(outs, axis=0) if outs else \
            np.zeros((0, 0, 3), dtype=np.float64)


# HF state-dict key layout of the reference checkpoint
# (dmis-lab/bern2-ner, RoBERTaMultiNER2 in multi_ner/modeling.py):
# backbone word embeddings at roberta.embeddings.word_embeddings.weight
# (modeling.py:129) and one Linear(hidden, 3) head per entity type
# named {prefix}_classifier (modeling.py:29-33).
HF_EMBEDDING_KEY = "roberta.embeddings.word_embeddings.weight"
HF_HEAD_PREFIXES = {
    "disease": "dise",
    "drug": "chem",       # the reference's chemical head
    "gene": "gene",
    "species": "spec",
    "cell_line": "cell",
}
NUM_LABELS = 3  # B / I / O, multi_ner/modeling.py:23


def load_hf_checkpoint(vocab_lines: Sequence[str], config: Dict,
                       state_dict: Dict[str, np.ndarray],
                       max_seq_length: int = 128,
                       ctx_weight: float = CTX_WEIGHT
                       ) -> TinyNumpyCheckpoint:
    """Adapt an HF-format NER bundle (vocab.txt lines + config dict +
    numpy state dict) onto the checkpoint seam, validating every shape
    the real deployment depends on:

    * ``config['vocab_size']`` == embedding rows == max vocab id + 1 —
      features built from this vocab can never index outside ``E``;
    * each shipped per-type head ``{p}_classifier.weight`` is
      [num_labels=3, hidden_size] (HF Linear stores [out, in];
      multi_ner/modeling.py:29-33) and is transposed here into the
      [d, 3] orientation ``forward`` matmuls with;
    * ``config['max_position_embeddings']`` admits the feature window
      (X5 windows are ``max_seq_length`` wide incl. [CLS]/[SEP]).

    The returned checkpoint runs the same batched numpy forward as the
    frozen one (embedding lookup -> masked-mean context -> head matmul
    -> argmax) — it does NOT run the transformer layers, so its outputs
    are not the reference's; this function is the SHAPE + TOKENIZER
    compatibility gate the sandbox can execute (no torch, no network).
    On a GPU host the torch forward of multi_ner/main.py:702-801
    replaces ``TinyNumpyCheckpoint.forward`` behind the same
    ``checkpoint_logits_factory`` contract; see PARITY.md, "Real
    checkpoint deployment"."""
    vocab = WordpieceVocab.from_vocab_lines(vocab_lines)
    v_size = int(config["vocab_size"])
    max_id = max(vocab.tok2id.values())
    if max_id >= v_size:
        raise ValueError(
            f"vocab file ids reach {max_id} but config.vocab_size is "
            f"{v_size} — features would index past the embedding table")
    if HF_EMBEDDING_KEY not in state_dict:
        raise ValueError(f"state dict lacks {HF_EMBEDDING_KEY}")
    emb = np.asarray(state_dict[HF_EMBEDDING_KEY], dtype=np.float32)
    if emb.ndim != 2 or emb.shape[0] != v_size:
        raise ValueError(
            f"embedding table is {emb.shape}, expected "
            f"({v_size}, hidden_size)")
    hidden = emb.shape[1]
    if int(config.get("hidden_size", hidden)) != hidden:
        raise ValueError(
            f"config.hidden_size={config['hidden_size']} != embedding "
            f"width {hidden}")
    max_pos = int(config.get("max_position_embeddings", max_seq_length))
    if max_pos < max_seq_length:
        raise ValueError(
            f"max_position_embeddings={max_pos} < feature window "
            f"{max_seq_length}")
    heads: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for ent_type, p in HF_HEAD_PREFIXES.items():
        wk, bk = f"{p}_classifier.weight", f"{p}_classifier.bias"
        if wk not in state_dict:
            continue  # a bundle may ship fewer heads; forward -> all-O
        w = np.asarray(state_dict[wk], dtype=np.float32)
        b = np.asarray(state_dict.get(bk, np.zeros(NUM_LABELS)),
                       dtype=np.float32)
        if w.shape != (NUM_LABELS, hidden):
            raise ValueError(
                f"{wk} is {w.shape}, expected ({NUM_LABELS}, {hidden})")
        if b.shape != (NUM_LABELS,):
            raise ValueError(f"{bk} is {b.shape}, expected ({NUM_LABELS},)")
        heads[ent_type] = (w.T.copy(), b)   # -> [d, 3] matmul orientation
    if not heads:
        raise ValueError("state dict ships no per-type classifier head")
    return TinyNumpyCheckpoint(vocab, emb, heads, ctx_weight)


def checkpoint_logits_factory(ckpt: TinyNumpyCheckpoint):
    """Adapter to extract_mentions_real's ``logits_fn_factory``
    contract. Ignores the gazetteer (the checkpoint IS the model);
    consumes the windows' input_ids/attention_mask tensors."""

    def factory(_gazetteer):
        def fn(words: List[str], windows: List[dict], ent_type: str):
            if not windows:
                return []
            logits = ckpt.forward([w["input_ids"] for w in windows],
                                  [w["attention_mask"] for w in windows],
                                  ent_type)
            return [[row.tolist() for row in win] for win in logits]
        return fn

    return factory
