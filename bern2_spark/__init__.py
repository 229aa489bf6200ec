"""bern2_spark — a PySpark-native biomedical knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing semantics of
dmis-lab/BERN2 (reference read-only at /root/reference) as a single batch
DataFrame job:

    documents (repo, path, commit, lang, content)
      -> preprocess (pure column ops)
      -> segmentation (sentences/words/offsets, Arrow UDF)
      -> multi-type BIO tagging (mapInPandas; surrogate or real model)
      -> tmVar-style mutation regex battery (native SQL)
      -> per-type sieve normalization (broadcast lexicon joins)
      -> neural fallback (distinct surfaces -> embed -> top-1)
      -> canonicalization (window dedup) -> (doc_id, has_<type>, cui) triples

Everything is public-API Spark: DataFrame ops + pandas/Arrow UDFs. No
custom Catalyst rules, no RDDs, no per-row Python in the hot path.
"""

__version__ = "0.1.0"
