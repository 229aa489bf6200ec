"""Deterministic synthetic corpus + lexicons (FIXTURES.md).

Seed-fixed generator for:
* the input documents table ``(repo, path, commit, lang, content)``
  (BASELINE.json input_hint) with every edge case the operators cite,
* per-type lexicons ``(ent_type, cui, name)`` in the reference's
  ``CUI||name|name`` spirit (normalizers/chemical_normalizer.py:8-15),
* Zipf-skewed hot surfaces (e.g. a p53-like gene in ~30% of docs) so the
  salted-join path is actually exercised.

Pure Python + ``random.Random(seed)`` — no numpy RNG, no wall clock —
so fixtures are bit-stable across runs and machines.
"""

from __future__ import annotations

import hashlib
import random
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession

from bern2_spark import schemas

# ---------------------------------------------------------------- lexicons

_GREEK = ["alpha", "beta", "gamma", "delta", "epsilon", "kappa", "sigma"]

# Surfaces are synthetic but shaped like the real thing; hot gene
# surfaces model the head of the Zipf curve (p53-like).
HOT_GENES = ["p53", "BRCA1", "EGFR", "TNF"]
HUMAN_BLOCK_SAMPLE = ["patients", "human", "mice_not_blocked", "children"]


def _rng(seed: int, *salt) -> random.Random:
    h = hashlib.sha256(("|".join(map(str, salt)) + str(seed)).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def make_lexicon(seed: int = 42, per_type: int = 200) -> List[Tuple[str, str, str]]:
    """Rows (ent_type, cui, name); several synonyms per concept."""
    rows: List[Tuple[str, str, str]] = []
    specs = {
        # ent_type: (cui prefix, surface stem)
        "disease": ("MESH:D", "osis"),
        "drug": ("MESH:C", "umab"),
        "gene": ("", "kinase"),          # Entrez: bare numeric ids
        "species": ("", "virus"),        # taxid*100 stored (P15)
        "cell_line": ("CVCL_", "cell"),
        "cell_type": ("CL_", "cyte"),
    }
    for ent_type, (prefix, stem) in specs.items():
        r = _rng(seed, "lex", ent_type)
        for i in range(per_type):
            if ent_type == "gene":
                cui = str(1000 + i)
            elif ent_type == "species":
                cui = str((9000 + i) * 100)  # dict stores taxid*100
            else:
                cui = f"{prefix}{100000 + i}"
            base = f"{random.Random(r.random()).choice(_GREEK)}{stem}{i}"
            names = [base, base.upper(), f"{base} {ent_type.replace('_', ' ')}"]
            for name in names:
                rows.append((ent_type, cui, name))
    # hot gene surfaces (Zipf head)
    for j, g in enumerate(HOT_GENES):
        rows.append(("gene", str(7157 + j), g))
    # species human-ish decoys that are NOT in the SR4GN blocklist
    rows.append(("species", str(9606 * 100), "Homo sapiens"))
    rows.append(("species", str(10090 * 100), "Mus musculus"))
    return rows


def lexicon_df(spark: SparkSession, seed: int = 42, per_type: int = 200) -> DataFrame:
    return spark.createDataFrame(make_lexicon(seed, per_type), schemas.LEXICON)


# ---------------------------------------------------------------- documents

_FILLER = ("the of study results analysis we observed in with for patients "
           "expression levels treatment clinical significant data based "
           "response effect cases model method measured compared").split()

_MUTATIONS = ["p.V600E", "c.123A>G", "rs113488022", "p.Lys27Met",
              "c.1521_1523delCTT", "V600E"]

# Suffix-rule-taggable surfaces ABSENT from the lexicon (lexicon names
# always end in a digit): these come out of the sieve CUI-less and are
# picked up by the neural fallback (high trigram overlap with lexicon
# concepts of the same stem).
_UNKNOWN_SURFACES = ["alphaosis", "betaosis", "gammaumab", "deltakinase",
                     "epsilonvirus", "kappacyte"]

_EDGE_DOCS = [
    # exercises P1 (control chars) + P4-ish spacing
    "Control\r\nchars\tand\x0bvertical\x0cfeeds\xa0here. BRCA1 was mutated.",
    # P2: non-ascii strip
    "Café au lait spots and ☃ snowman near EGFR. Señor results.",
    # P3/P18: >50-char word and >20-char word
    "A " + "w" * 60 + " word plus " + "y" * 25 + " appears with p53.",
    # X1: >100-token sentence (no sentence breaks)
    " ".join(["tok"] * 130) + " p53",
    # splitter heuristics
    "Results vs. Dr. Smith were clear. The EGFR gene is amplified.",
    # repeated identical mentions (nth occurrence)
    "p.V600E was seen. Again p.V600E was seen. And p.V600E once more.",
    # mutation battery
    "We found p.V600E, c.123A>G and rs113488022 in tumors.",
    # species blocklist words (must be filtered)
    "human patients and children showed response; Homo sapiens confirmed.",
    # zero-ascii-letter doc
    "12345 67890 !!! ???",
    # empty doc
    "",
]


def make_documents(n_docs: int = 200, seed: int = 42,
                   lexicon: List[Tuple[str, str, str]] | None = None,
                   ) -> List[Tuple[str, str, str, str, str]]:
    """Rows (repo, path, commit, lang, content). First len(_EDGE_DOCS)
    docs are the edge cases; the rest are seeded sentence soup with
    lexicon surfaces planted (hot genes at Zipf-head frequency)."""
    lexicon = lexicon if lexicon is not None else make_lexicon(seed)
    surfaces = [name for _, _, name in lexicon]
    rows = []
    for i in range(n_docs):
        r = _rng(seed, "doc", i)
        if i < len(_EDGE_DOCS):
            content = _EDGE_DOCS[i]
        else:
            sents = []
            for s in range(r.randint(2, 6)):
                words = [r.choice(_FILLER) for _ in range(r.randint(6, 14))]
                if r.random() < 0.30:           # Zipf head: hot genes
                    words.insert(r.randint(0, len(words)), r.choice(HOT_GENES))
                if r.random() < 0.5:            # lexicon tail
                    words.insert(r.randint(0, len(words)), r.choice(surfaces))
                if r.random() < 0.15:
                    words.insert(r.randint(0, len(words)), r.choice(_MUTATIONS))
                if r.random() < 0.20:   # CUI-less -> neural fallback fodder
                    words.insert(r.randint(0, len(words)),
                                 r.choice(_UNKNOWN_SURFACES))
                if r.random() < 0.10:           # blocklisted species word
                    words.insert(r.randint(0, len(words)), "patients")
                s = " ".join(words)
                # upper-case only the first char: .capitalize() would
                # lowercase planted surfaces/mutations and break them
                sents.append((s[:1].upper() + s[1:]) + ".")
            content = " ".join(sents)
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        rows.append((f"repo_{i % 10}", f"docs/{i}.txt", commit, "text", content))
    return rows


def documents_df(spark: SparkSession, n_docs: int = 200, seed: int = 42,
                 lexicon=None) -> DataFrame:
    return spark.createDataFrame(make_documents(n_docs, seed, lexicon),
                                 schemas.DOCUMENTS)


# ------------------------------------------------- driver-corpus lexicon

# Sentinel cui: surface is TAGGED by the surrogate model but absent from
# the normalization lexicon -> comes out of the sieve CUI-less -> feeds
# the neural fallback. (Mirrors real corpora where the tagger knows more
# surfaces than the dictionaries.)
TAG_ONLY = "__TAG_ONLY__"

# Deterministic lexicon over the driver testdata vocabulary
# (/root/testdata word-salad docs), so the KG pipeline produces real
# mention/triple volume on the driver tables.
DRIVER_VOCAB_LEXICON = [
    ("gene", "2001", "spark"),
    ("gene", "2002", "vector"),
    ("gene", "2003", "hash"),
    ("gene", "2004-1", "hash join"),      # multi-token + '-' truncation
    ("disease", "MESH:D3001", "stream"),
    ("disease", "MESH:D3002", "merge"),
    ("disease", "MESH:D3003", "slow query"),
    ("drug", "MESH:C4001", "filter"),
    ("drug", "MESH:C4002", "batch"),
    ("species", "960600", "customer"),    # taxid*100 -> NCBI:txid9606
    ("species", "1009000", "window"),
    ("cell_line", "CVCL_S1", "scan"),
    ("cell_type", "CL_0001", "column"),
    # tag-only: neural-fallback fodder
    ("disease", TAG_ONLY, "group"),
    ("drug", TAG_ONLY, "sort"),
    ("gene", TAG_ONLY, "agg"),
]
