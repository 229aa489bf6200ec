"""Stage 1 — ingest/preprocess. Operators P1-P5, P8 of SURVEY.md §2.2.

All pure Column expressions: whole-stage-codegen'd JVM-side, zero Python.
Order matters for offset stability (SURVEY §7): scrub -> ascii-strip ->
word-cap -> letter-guard, all BEFORE any span is computed, exactly like
the reference (bern2/bern2.py:268-323).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Sentinel substituted when the text has no ASCII letters
# (bern2/bern2.py:316-323).
NO_ASCII_SENTINEL = "No ascii letters. Please enter your text in English."

MAX_WORD_LEN = 50  # bern2/bern2.py:45


def scrub_control_chars(col: Column) -> Column:
    """P1 — CRLF first (2 chars -> 1 space), then each of \\n \\t \\xa0
    \\x0b \\x0c -> one space (bern2/bern2.py:268-297). Bare \\r is kept,
    matching the reference."""
    c = F.regexp_replace(col, "\r\n", " ")
    # single-char class -> single space IS translate semantics; the
    # translate form avoids the per-row Matcher/StringBuilder churn
    # that collapses under concurrent tasks (measured on the code-QC
    # alnum gate: regexp 967 vs translate 18 core-s at 16 tasks,
    # dataprep/codeqc.py)
    return F.translate(c, "\n\t\u00a0\x0b\x0c", "     ")


def strip_non_ascii(col: Column) -> Column:
    """P2 — drop every non-ASCII codepoint (bern2/bern2.py:300). This
    SHIFTS offsets, so it must precede segmentation."""
    return F.regexp_replace(col, "[^\x00-\x7F]", "")


def cap_long_words(col: Column, max_len: int = MAX_WORD_LEN) -> Column:
    """P3 — truncate space-separated words longer than ``max_len``
    (bern2/bern2.py:302-311). split/transform/array_join round-trips
    the text unchanged when nothing is long."""
    words = F.split(col, " ", -1)
    capped = F.transform(words, lambda w: F.substring(w, 1, max_len))
    return F.array_join(capped, " ")


def guard_no_ascii_letters(col: Column) -> Column:
    """P5 — substitute the sentinel when the text contains zero ASCII
    letters (bern2/bern2.py:316-323)."""
    return F.when(col.rlike("[A-Za-z]"), col).otherwise(F.lit(NO_ASCII_SENTINEL))


# P4 character set (multi_ner/ops.py:383-430): unicode spaces -> ' ',
# plus two private-use glyph substitutions. 1:1 mappings go through one
# translate(); the 2-char '\r ' -> ' ' rule runs FIRST, as in the
# reference (later single-char replaces may create new '\r ' pairs the
# reference leaves alone).
_P4_SRC = ("\u2028\u2029\u200a\u2009\u2008\u2005\u2004\u2003\u2002"
           "\u00a0\uf8ff\u202f\ufeff\uf044\uf02d\uf0bb\uf048\uf0b0")
_P4_DST = " " * 16 + "\u0397\u00b0"  # capital eta, degree sign


def normalize_unicode_spaces(col: Column) -> Column:
    """P4 — exotic unicode spaces to ' ' (multi_ner/ops.py:383-430).
    Applied at INGEST (PubTator path), before any span exists: the
    reference applies it on the mtner input where the 2-char '\\r '
    rule shifts offsets against the server text — running it before
    P1/P2 keeps spans aligned while producing identical bytes."""
    return F.translate(F.regexp_replace(col, "\r ", " "), _P4_SRC, _P4_DST)


# O5 quarantine codes (reference returns error_code 1 for any per-doc
# failure, bern2/bern2.py:108-116; we keep distinguishable causes)
ERROR_NO_ASCII_LETTERS = 1
ERROR_EMPTY = 2
ERROR_NULL_CONTENT = 3


def quarantine(docs: DataFrame, content_col: str = "content",
               doc_col: str = "doc_id") -> DataFrame:
    """O5 — error side-output table (doc_id, error_code): docs the
    reference would short-circuit with a nonzero error_code instead of
    silently re-labeling. The main plan still substitutes the P5
    sentinel (annotation output stays total); this table makes the
    substitution REPORTED."""
    c = F.col(content_col)
    code = (F.when(c.isNull(), F.lit(ERROR_NULL_CONTENT))
             .when(F.trim(c) == "", F.lit(ERROR_EMPTY))
             .when(~c.rlike("[A-Za-z]"), F.lit(ERROR_NO_ASCII_LETTERS)))
    return (docs.withColumn("error_code", code)
            .filter(F.col("error_code").isNotNull())
            .select(F.col(doc_col).alias("doc_id"), "error_code"))


def doc_id_col(col: Column) -> Column:
    """P8 — deterministic document id. The reference hashes text+now
    (sha224, bern2/bern2.py:494-497) only to dodge tmp-file collisions;
    we need determinism, so pure sha256 of the ORIGINAL content. Doubles
    as the per-row content-integrity invariant (BASELINE.json)."""
    return F.sha2(col, 256)


def preprocess(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Full stage-1 plan: adds ``doc_id`` (hash of raw content) and
    ``text`` (cleaned). Keeps all source columns for provenance."""
    content = F.col(content_col)
    cleaned = guard_no_ascii_letters(
        cap_long_words(strip_non_ascii(scrub_control_chars(content)))
    )
    return docs.withColumn("doc_id", doc_id_col(content)).withColumn("text", cleaned)
