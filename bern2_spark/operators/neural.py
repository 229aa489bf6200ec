"""Stage 5 — neural normalization fallback. Operators A2, M5, J5, J7.

Reference behavior (bern2/normalizer.py:181-216,
normalizers/neural_normalizer.py): for disease/drug/gene mentions still
CUI-less after the sieve, embed the DISTINCT surfaces (SapBERT [CLS],
batch 1024) and take the top-1 inner-product neighbor from a broadcast
FAISS index over the lexicon.

Our engine keeps the exact same shape:

* A2 — ``distinct()`` on (ent_type, surface) BEFORE inference: the
  single biggest cost lever at corpus scale (Zipfian surfaces mean the
  distinct set is orders of magnitude smaller than the mention set).
* M5 — embedding inside an Arrow-batched pandas UDF. The default
  implementation is a deterministic hash n-gram embedder (surrogate for
  SapBERT — hermetic, CPU-only); a transformer drops in by replacing
  ``embed_batch``.
* J5 — top-1 search against a driver-built, ``sparkContext.broadcast``
  lexicon matrix per type (the FAISS-index-in-UDF pattern, exact IP
  search; nlist/nprobe approximation unnecessary at lexicon size).
* J7 — broadcast join of the tiny (surface -> cui) result back onto the
  mentions table; mentions are never shuffled.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Dict, List, Tuple

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bern2_spark.schemas import CUI_LESS

NEURAL_TYPES = ["disease", "drug", "gene"]  # bern2/bern2.py:401-414
EMBED_DIM = 64
MIN_SIM = 0.60  # below this, stay CUI-less (reference returns -1)


def _basic_normalize(name: str) -> str:
    """P17 pure-Python twin (lower, punct->space, squeeze) — the
    reference normalizes names before embedding
    (normalizers/neural_normalizer.py:103-108)."""
    import re
    return re.sub(r"[\s\W_]+", " ", name.lower()).strip()


def embed_batch(names: List[str]) -> np.ndarray:
    """M5 surrogate — deterministic char-trigram hash embedding,
    L2-normalized. Same function embeds queries and lexicon, so
    identical surfaces get cosine 1.0."""
    out = np.zeros((len(names), EMBED_DIM), dtype=np.float32)
    for i, raw in enumerate(names):
        name = f"#{_basic_normalize(raw)}#"
        for j in range(len(name) - 2):
            tri = name[j:j + 3].encode()
            h = int.from_bytes(hashlib.md5(tri).digest()[:4], "big")
            out[i, h % EMBED_DIM] += 1.0 if (h >> 31) & 1 else -1.0
        n = np.linalg.norm(out[i])
        if n > 0:
            out[i] /= n
    return out


def build_index(lexicon_rows) -> Dict[str, Tuple[np.ndarray, List[str]]]:
    """Driver-side index build (S7): per neural type, an (embeddings,
    cuis) pair over the lexicon synonyms — the broadcastable stand-in
    for the reference's IVFFlat + pickled (cui, name) list
    (normalizers/neural_normalizer.py:144-166)."""
    by_type: Dict[str, Tuple[List[str], List[str]]] = {
        t: ([], []) for t in NEURAL_TYPES}
    for ent_type, cui, name in lexicon_rows:
        if ent_type in by_type:
            by_type[ent_type][0].append(name)
            by_type[ent_type][1].append(cui)
    index = {}
    for t, (names, cuis) in by_type.items():
        if names:
            # float64: the top-1 argmax and the MIN_SIM threshold sit
            # downstream of a BLAS matmul whose float32 summation order
            # varies by environment (thread count / kernel choice);
            # float64 keeps reorder noise ~1e-16, so near-ties and
            # near-threshold sims cannot flip between environments
            # (same reasoning as operators/checkpoint.py:forward).
            index[t] = (embed_batch(names).astype(np.float64), cuis)
    return index


def neural_normalize(normalized: DataFrame, lexicon_rows) -> DataFrame:
    """NORMALIZED -> NORMALIZED with CUI-less disease/drug/gene mentions
    re-linked by embedding top-1 (is_neural_normalized=true on hits)."""
    spark = normalized.sparkSession
    index_bc = spark.sparkContext.broadcast(build_index(lexicon_rows))

    # A2 — distinct CUI-less surfaces per type (tiny vs mention count)
    cuiless = (normalized
               .filter((F.col("cui") == CUI_LESS)
                       & F.col("ent_type").isin(NEURAL_TYPES))
               .select("ent_type", "mention")
               .distinct())

    def search(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        index = index_bc.value
        for pdf in batches:
            # rows whose ent_type has no index keep the null/0.0 default
            pdf["neural_cui"] = None
            pdf["neural_sim"] = 0.0
            # re-batch per type; reference uses batch 1024 — Arrow
            # batches are already bounded by maxRecordsPerBatch
            for t, grp in pdf.groupby("ent_type"):
                if t not in index:
                    continue
                mat, id_list = index[t]
                q = embed_batch(list(grp["mention"]))
                scores = q @ mat.T                      # exact IP, k=1
                best = scores.argmax(axis=1)
                pdf.loc[grp.index, "neural_cui"] = [
                    id_list[b] for b in best]
                pdf.loc[grp.index, "neural_sim"] = scores[
                    np.arange(len(best)), best].astype(float)
            yield pdf[["ent_type", "mention", "neural_cui", "neural_sim"]]

    hits = (cuiless.mapInPandas(
                search,
                schema=("ent_type string, mention string, "
                        "neural_cui string, neural_sim double"))
            .filter(F.col("neural_sim") >= MIN_SIM)
            .filter(F.col("neural_cui").isNotNull()))

    # J7 — map distinct-surface results back onto mentions (broadcast)
    joined = normalized.join(F.broadcast(hits), ["ent_type", "mention"],
                             "left")
    return (joined
            .withColumn(
                "is_neural_normalized",
                (F.col("cui") == CUI_LESS) & F.col("neural_cui").isNotNull())
            .withColumn(
                "cui",
                F.when((F.col("cui") == CUI_LESS)
                       & F.col("neural_cui").isNotNull(),
                       F.col("neural_cui"))
                 .otherwise(F.col("cui")))
            .drop("neural_cui", "neural_sim"))
