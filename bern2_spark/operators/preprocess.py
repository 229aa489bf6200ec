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
    return F.regexp_replace(c, "[\\n\\t\\u00a0\\x0b\\x0c]", " ")


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
