"""KG-embedding link scoring — TransE (Bordes et al. 2013) over
deterministic hash-derived embeddings.

Why a SURROGATE embedding: training real TransE needs SGD over
epochs (out of scope for a batch scoring operator, same posture as
the neural normalizer's trigram surrogate in operators/neural.py).
What a deployment swaps in is the trained entity/relation matrices;
everything this module demonstrates — the scoring expression, the
deterministic negative generation, the margin readout, engine-exact
parity — is the part that runs at 10^12-triple scale and survives
that swap unchanged.

The hash embedding is engine-portable by construction: component d
of entity e is ``frac(md5(e || ':' || d)) - 0.5`` where frac is the
first 8 hex digits as a 32-bit fraction — Spark computes it with
``conv(substring(md5(x), 1, 8), 16, 10)``, the DuckDB oracle with
the positional-hex arithmetic the KMV sketch already uses; both are
EXACT in float64 (32-bit integer / 2^32), so scores hash-match
without tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_embedding(name_col, dim: int = 8):
    """List of ``dim`` double Columns: the deterministic surrogate
    embedding of a name (exact 32-bit md5 fractions, centered)."""
    comps = []
    for d in range(dim):
        hx = F.md5(F.concat(name_col, F.lit(f":{d}")))
        v = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("double")
             / F.lit(float(2 ** 32))) - 0.5
        comps.append(v)
    return comps


def transe_scores(triples: DataFrame, subj_col: str = "subj",
                  pred_col: str = "pred", obj_col: str = "obj",
                  dim: int = 8, round_to: int = 6) -> DataFrame:
    """TransE link plausibility per distinct triple: score = -||h + r
    - t||₁ for the true tail next to a corrupted-tail negative, with
    the margin — the link-prediction readout KG-completion systems
    rank by, and the evidence-quality signal that pairs with
    ``predicate_functionality``.

    Negative generation is DETERMINISTIC and relational: the
    corrupted tail is the next distinct object of the same predicate
    in lexicographic order (wrapping to the first) — a window over
    the (pred, obj) DISTINCT catalog, which is entity-vocab-sized,
    never corpus-sized.  (At 10^12 triples a deployment hash-picks
    negatives instead; the scoring path is identical.)

    Scale shape: embeddings are pure column expressions (3 × dim md5
    fractions per row, codegen'd — no embedding table join at all
    for the surrogate; a trained swap-in becomes two broadcast
    joins); the only exchanges are the distinct and the negative
    window, both over catalog-sized relations.  The |·|₁ fold is a
    fixed-order sum so both engines produce identical doubles.

    Output: (subj, pred, obj, neg_obj, score_pos, score_neg, margin,
    pos_beats_neg)."""
    t = (triples.select(F.col(subj_col).alias("subj"),
                        F.col(pred_col).alias("pred"),
                        F.col(obj_col).alias("obj"))
         .distinct())
    cat = t.select("pred", "obj").distinct()
    w = Window.partitionBy("pred").orderBy("obj")
    neg = cat.select(
        "pred", "obj",
        F.coalesce(F.lead("obj").over(w),
                   F.first("obj").over(
                       w.rowsBetween(Window.unboundedPreceding,
                                     Window.unboundedFollowing)))
        .alias("neg_obj"))
    t = t.join(neg, ["pred", "obj"])

    h = hash_embedding(F.col("subj"), dim)
    r = hash_embedding(F.col("pred"), dim)
    tl = hash_embedding(F.col("obj"), dim)
    ng = hash_embedding(F.col("neg_obj"), dim)

    def l1(tail):
        s = F.lit(0.0)
        for d in range(dim):
            s = s + F.abs(h[d] + r[d] - tail[d])
        return -s

    sp = F.round(l1(tl), round_to)
    sn = F.round(l1(ng), round_to)
    return t.select(
        "subj", "pred", "obj", "neg_obj",
        sp.alias("score_pos"), sn.alias("score_neg"),
        F.round(sp - sn, round_to).alias("margin"),
        (sp > sn).alias("pos_beats_neg"))
