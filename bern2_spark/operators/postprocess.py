"""Stage 6b — output shaping. Operators P9 (CUI split), P10 (prefix
standardization) of SURVEY §2.2, plus the triple emit.

P10's bioregistry lookup (bern2/bern2.py:197-234) is materialized as a
static prefix map (the bioregistry snapshot the reference README
documents, README.md:17-24) — a deterministic build-time table instead
of a runtime dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bern2_spark.schemas import CUI_LESS

# bioregistry snapshot (reference README.md:17-24 mapping table).
PREFIX_MAP = {
    "MESH": "mesh",
    "OMIM": "mim",
    "EntrezGene": "NCBIGene",
    "CL": "CL",
    "CVCL": "cellosaurus",
    "NCBI:txid": "NCBITaxon",
}

# types whose ids get standardized (bern2/bern2.py:203)
_STANDARDIZED_TYPES = ["disease", "gene", "drug", "species", "cell_line",
                       "cell_type"]


def split_cuis(col):
    """P9 — 'OMIM:1,MESH:2' or 'a|b' -> ['OMIM:1','MESH:2']
    (bern2/bern2.py:181-195). Stays array-typed."""
    return F.split(F.translate(col, "|", ","), ",")


def _standardize_prefix_regex(cui):
    """P10 reference formulation (regexp_extract per branch) — kept as
    the equivalence oracle for the optimized version below; property-
    tested identical in tests/test_canonicalize.py."""
    txid = F.regexp_extract(cui, r"NCBI:txid(\d+)", 1)
    us_prefix = F.regexp_extract(cui, r"^([A-Za-z]+)_(.+)$", 1)
    us_rest = F.regexp_extract(cui, r"^([A-Za-z]+)_(.+)$", 2)
    colon_prefix = F.regexp_extract(cui, r"^([^:]+):(.+)$", 1)
    colon_rest = F.regexp_extract(cui, r"^([^:]+):(.+)$", 2)

    def mapped(prefix):
        m = F.create_map(*[x for k, v in PREFIX_MAP.items()
                           for x in (F.lit(k), F.lit(v))])
        return F.coalesce(m[prefix], prefix)

    return (
        F.when(cui == CUI_LESS, cui)
        .when(txid != "", F.concat(F.lit("NCBITaxon:"), txid))
        .when(us_prefix != "",
              # cellosaurus keeps the CVCL_ stem inside the local id
              F.when(mapped(us_prefix) == "cellosaurus",
                     F.concat(F.lit("cellosaurus:"), cui))
               .otherwise(F.concat(mapped(us_prefix), F.lit(":"), us_rest)))
        .when(colon_prefix != "",
              F.concat(mapped(colon_prefix), F.lit(":"), colon_rest))
        .otherwise(cui))


def standardize_prefix(cui):
    """P10 — single-CUI prefix rewrite, mirroring standardize_prefixes
    (bern2/bern2.py:197-234): NCBI:txid first, then '_' split
    (CVCL_J260 -> cellosaurus:CVCL_J260), then ':' split, else as-is.

    HOT-PATH FORMULATION: this runs per id element on every annotation
    row (4M+ rows at bench scale, 10^12 at target scale), so the
    regexp_extract battery of the reference formulation (8+ regex
    evaluations per element) is replaced by guarded substring ops:
    each branch condition leads with a cheap contains/instr test, and
    the two remaining regexes (txid digits, all-alpha head) evaluate
    only on rows whose guard passed — CaseWhen and AND short-circuit
    per row. Measured ~30% faster on the 4M-row standardization stage
    (best-of-3, local[16]); equivalence with the reference formulation
    is property-tested in test_canonicalize.py."""
    m = F.create_map(*[x for k, v in PREFIX_MAP.items()
                       for x in (F.lit(k), F.lit(v))])

    def mapped(prefix):
        return F.coalesce(m[prefix], prefix)

    txid = F.regexp_extract(cui, r"NCBI:txid(\d+)", 1)
    us_head = F.substring_index(cui, "_", 1)
    us_rest = F.substring(cui, F.length(us_head) + 2, F.length(cui))
    colon_head = F.substring_index(cui, ":", 1)
    colon_rest = F.substring(cui, F.length(colon_head) + 2, F.length(cui))

    return (
        F.when(cui == CUI_LESS, cui)
        .when(cui.contains("NCBI:txid") & (txid != ""),
              F.concat(F.lit("NCBITaxon:"), txid))
        .when((F.instr(cui, "_") > 0) & (us_rest != "")
              & us_head.rlike("^[A-Za-z]+$"),
              # cellosaurus keeps the CVCL_ stem inside the local id
              F.when(mapped(us_head) == "cellosaurus",
                     F.concat(F.lit("cellosaurus:"), cui))
               .otherwise(F.concat(mapped(us_head), F.lit(":"), us_rest)))
        .when((F.instr(cui, ":") > 0) & (colon_head != "")
              & (colon_rest != ""),
              F.concat(mapped(colon_head), F.lit(":"), colon_rest))
        .otherwise(cui))


def to_annotations(canonical: DataFrame) -> DataFrame:
    """NORMALIZED (post-W1/U1) -> ANNOTATIONS: split multi-CUIs into an
    array, standardize each element (transform: no explode needed)."""
    ids = split_cuis(F.col("cui"))
    standardized = F.when(
        F.col("ent_type").isin(_STANDARDIZED_TYPES),
        F.transform(ids, standardize_prefix)).otherwise(ids)
    return canonical.select(
        "doc_id",
        F.col("ent_type").alias("obj"),
        F.col("start").alias("begin"),
        F.col("end"),
        "mention",
        standardized.alias("id"),
        "prob",
        "is_neural_normalized",
        F.col("mutation_type").alias("mutationType"),
        F.col("normalized_name").alias("normalizedName"),
    )


def to_pubannotation(annotations: DataFrame, docs: DataFrame,
                     project: str = "BERN",
                     timestamp: str = "") -> DataFrame:
    """PubAnnotation nested output documents (bern2/convert.py:263-335):
    one row per doc — (project, sourcedb, sourceid, text, annotations,
    timestamp) with the annotations array sorted by (span.begin, obj),
    exactly the reference's double sort (convert.py:330-335).

    Divergences, both documented: the reference stamps wall-clock time
    (convert.py:276) — we take ``timestamp`` as a parameter so output
    is deterministic; and the reference's mutation ``end += 1``
    (convert.py:312) converts tmVar's inclusive ends — our spans are
    already exclusive-end internally (schemas.py), so no shift is
    applied. Null fields (mutationType/normalizedName on non-mutations)
    vanish in JSON output (Spark's ignoreNullFields), matching the
    reference's per-type key sets."""
    ann = F.struct(
        F.col("id"),
        F.struct(F.col("begin"), F.col("end")).alias("span"),
        F.col("obj"),
        F.col("mention"),
        F.col("prob"),
        F.col("is_neural_normalized"),
        F.col("mutationType"),
        F.col("normalizedName"))
    per_doc = (annotations
               .groupBy("doc_id")
               .agg(F.collect_list(ann).alias("_anns")))
    ordered = F.array_sort(
        F.col("_anns"),
        lambda a, b: F.when(a["span"]["begin"] < b["span"]["begin"], -1)
                      .when(a["span"]["begin"] > b["span"]["begin"], 1)
                      .when(a["obj"] < b["obj"], -1)
                      .when(a["obj"] > b["obj"], 1)
                      .otherwise(0))
    return (per_doc
            .join(docs.select("doc_id", "text"), "doc_id")
            .select(F.lit(project).alias("project"),
                    F.lit("").alias("sourcedb"),
                    F.col("doc_id").alias("sourceid"),
                    "text",
                    ordered.alias("annotations"),
                    F.lit(timestamp).alias("timestamp")))


def to_triples(annotations: DataFrame, keep_cuiless: bool = False,
               distinct: bool = True) -> DataFrame:
    """(doc_id, has_<type>, cui) triples — one row per id element
    (FIXTURES.md §3). Set semantics by default (a doc mentioning the
    same entity five times asserts the triple once); the P/R gate
    compares triple SETS. Mention-level multiplicity stays available in
    the annotations table."""
    t = (annotations
         .select("doc_id",
                 F.concat(F.lit("has_"), F.col("obj")).alias("pred"),
                 F.explode("id").alias("obj_id"))
         .select(F.col("doc_id").alias("subj"), "pred",
                 F.col("obj_id").alias("obj")))
    if not keep_cuiless:
        t = t.filter(F.col("obj") != CUI_LESS)
    return t.distinct() if distinct else t
