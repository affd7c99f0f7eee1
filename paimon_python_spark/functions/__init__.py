"""Column-level function library for text analysis and multimodal
(binary) columns — all built-in-function expressions (JVM-side,
whole-stage codegen), no Python in the hot path."""

from paimon_python_spark.functions.text import (
    text_stats,
    punct_stopword_stats,
    chunk_text,
    lang_id,
    doc_fingerprints,
    token_counts,
    scrub_pii,
    tfidf_top_terms,
    top_ngrams,
    repetition_stats,
    composite_quality_filter,
    contamination_check,
    QF_TOO_FEW_WORDS,
    QF_BAD_LENGTH,
    QF_BAD_WORD_LEN,
    QF_NO_STOPWORDS,
    QF_TOO_MUCH_PUNCT,
    LANG_MARKERS,
    PII_PATTERNS,
)
from paimon_python_spark.functions.multimodal import (
    binary_metadata,
    decode_image_stub,
    frame_sample_stub,
)
from paimon_python_spark.functions.sketches import (
    group_distinct_sketch,
    quantile_summary,
    numeric_histogram,
)

__all__ = [
    "text_stats",
    "punct_stopword_stats",
    "chunk_text",
    "lang_id",
    "doc_fingerprints",
    "token_counts",
    "scrub_pii",
    "tfidf_top_terms",
    "top_ngrams",
    "repetition_stats",
    "composite_quality_filter",
    "contamination_check",
    "QF_TOO_FEW_WORDS",
    "QF_BAD_LENGTH",
    "QF_BAD_WORD_LEN",
    "QF_NO_STOPWORDS",
    "QF_TOO_MUCH_PUNCT",
    "LANG_MARKERS",
    "PII_PATTERNS",
    "binary_metadata",
    "decode_image_stub",
    "frame_sample_stub",
    "group_distinct_sketch",
    "quantile_summary",
    "numeric_histogram",
]
