"""eugl_spark — PySpark-native web-text quality-characterisation engine.

A from-scratch re-expression of the reference's per-granule QA pattern
(/root/reference/eugl: per-scene metric computation, threshold
verdicts, per-acquisition lineage) as a per-document web-text quality
filter over DataFrames: langid → perplexity → heuristic rules → PII
scrub → keep/drop verdict + QA struct + lineage, plus the
training-data-pipeline operator suite (dedup, similarity search,
text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
