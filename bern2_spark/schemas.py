"""Explicit StructType schemas for every stage boundary.

The reference enforces shapes with asserts/key-checks scattered through
the code (bern2/convert.py:291-296, bern2/normalizer.py:425-426); we pin
them as Spark schemas instead so each stage is a typed contract.
Span convention: **exclusive end** everywhere internally (the reference
mixes inclusive word offsets, multi_ner/ops.py:56-57, with `+1` patches
at bern2/normalizer.py:121 and bern2/convert.py:312; we convert at the
boundaries only).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Input table — authoritative shape from BASELINE.json input_hint.
DOCUMENTS = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
])

# After preprocess: doc_id = sha2(content, 256) of the ORIGINAL content
# (row invariant), `text` = cleaned content used downstream.
PREPROCESSED = StructType(DOCUMENTS.fields + [
    StructField("doc_id", StringType(), False),
    StructField("text", StringType(), False),
])

# Segmentation output: one row per word occurrence.
# start/end are character offsets into `text`, end EXCLUSIVE.
WORDS = StructType([
    StructField("doc_id", StringType(), False),
    StructField("sent_idx", IntegerType(), False),
    StructField("word_idx", IntegerType(), False),
    StructField("word", StringType(), False),       # model-facing (20->10 cap)
    StructField("start", IntegerType(), False),
    StructField("end", IntegerType(), False),       # exclusive
])

# Tagger output: one row per (word, entity type).
TAGS = StructType(WORDS.fields + [
    StructField("ent_type", StringType(), False),
    StructField("tag", StringType(), False),        # 'B' | 'I' | 'O'
    StructField("prob", DoubleType(), False),       # max-softmax of the token
])

# Mentions: the central fact table. One row per detected entity mention.
MENTIONS = StructType([
    StructField("doc_id", StringType(), False),
    StructField("mention_id", LongType(), False),   # stable join key (replaces
                                                    # the reference's positional
                                                    # zip, bern2/normalizer.py:162-170)
    StructField("ent_type", StringType(), False),
    StructField("start", IntegerType(), False),
    StructField("end", IntegerType(), False),       # exclusive
    StructField("mention", StringType(), False),
    StructField("prob", DoubleType(), True),        # null for mutations
    StructField("mutation_type", StringType(), True),
    StructField("normalized_name", StringType(), True),
])

# After normalization: + cui (CUI-less sentinel preserved), neural flag.
NORMALIZED = StructType(MENTIONS.fields + [
    StructField("cui", StringType(), False),
    StructField("is_neural_normalized", BooleanType(), False),
])

# Final annotation rows (PubAnnotation-equivalent, bern2/convert.py:263-335).
ANNOTATIONS = StructType([
    StructField("doc_id", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("begin", IntegerType(), False),
    StructField("end", IntegerType(), False),       # exclusive at output
    StructField("mention", StringType(), False),
    StructField("id", ArrayType(StringType()), False),
    StructField("prob", DoubleType(), True),
    StructField("is_neural_normalized", BooleanType(), False),
    StructField("mutation_type", StringType(), True),
    StructField("normalized_name", StringType(), True),
])

# KG triples.
TRIPLES = StructType([
    StructField("subj", StringType(), False),       # doc_id
    StructField("pred", StringType(), False),       # has_<ent_type>
    StructField("obj", StringType(), False),        # CUI
])

# Lexicon: one row per (type, synonym) after explode (FIXTURES.md §2).
LEXICON = StructType([
    StructField("ent_type", StringType(), False),
    StructField("cui", StringType(), False),
    StructField("name", StringType(), False),
])

CUI_LESS = "CUI-less"

# Reference entity-type emission order (multi_ner/main.py:523, mutation
# appended last at bern2/bern2.py:488-489). W1's tie-break depends on it.
ENTITY_TYPE_ORDER = [
    "disease", "drug", "gene", "species", "cell_line", "DNA", "RNA",
    "cell_type", "mutation",
]
