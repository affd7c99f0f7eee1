"""Text-analysis operators: token counting, quality scoring, language
ID, document fingerprinting.

Everything is integer/string math over built-in functions so results
are deterministic across engines (the quality ratios are scaled
integers, not float divisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny marker-word lists per language (an n-gram/stopword-presence
# heuristic — the classic cheap language-ID baseline). Deterministic
# argmax with a fixed preference order on ties.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "una", "es", "y"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": ["的", "是", "在", "了"],
}

# BPE-ish token pattern: alphanumeric runs or single non-space symbols
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + regex (BPE-ish) tokens per document."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)).alias(
            "n_re_tokens"
        ),
    )


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring stats: word/char counts, scaled-integer ratios,
    and a boolean quality gate — the length/punct/stopword-ratio style
    heuristics used to filter web corpora, in exact integer math."""
    w = F.split(F.col(text_col), " ")
    n_words = F.size(w)
    n_chars = F.length(text_col)
    n_distinct = F.size(F.array_distinct(w))
    sum_word_len = n_chars - (n_words - 1)  # single-space-separated text
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        n_distinct.alias("n_distinct_words"),
        F.floor(sum_word_len * 100 / n_words).cast("long").alias("avg_word_len_x100"),
        F.floor(n_distinct * 100 / n_words).cast("long").alias("distinct_pct"),
        (
            (n_words >= 5)
            & (n_words <= 100000)
            & (F.floor(n_distinct * 100 / n_words) >= 20)
        ).alias("quality_ok"),
    )


#: the tiny English stopword list used for the stopword-ratio quality
#: signal; at corpus scale this inlines into the expression (no join)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def punct_stopword_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Punctuation and stopword ratios — the classic web-corpus quality
    signals — as scaled integers (exact in any engine). One narrow pass,
    all built-ins: regexp_replace length-delta counts punctuation,
    a filtered word-array size counts stopwords."""
    w = F.split(F.col(text_col), " ")
    n_words = F.size(w)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[.,;:!?'\"()\[\]{}-]", "")
    )
    sw_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(
        F.expr(f"filter(w, x -> lower(x) IN ({sw_list}))")
    )
    return (
        df.select(F.col(id_col), F.col(text_col), w.alias("w"))
        .select(
            F.col(id_col),
            n_punct.alias("n_punct"),
            F.floor(n_punct * 10000 / n_chars).cast("long").alias("punct_ratio_x10000"),
            n_stop.alias("n_stopwords"),
            F.floor(n_stop * 10000 / n_words).cast("long").alias("stopword_ratio_x10000"),
        )
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: score = marker hits (with multiplicity);
    argmax with fixed order en>de>es>fr>zh, 'und' when all zero.

    The per-language scores are computed ONCE behind a Generate barrier
    (``inline(array(named_struct(...)))``): a plain projection would let
    CollapseProject inline each interpreted higher-order ``filter`` into
    every argmax CASE branch (~25 copies), which blows up both the
    optimized expression tree (one-shot planning cost measured at 28s)
    and per-row work. CollapseProject cannot merge across Generate, so
    the CASE downstream references real attributes.
    """
    struct_fields = ", ".join(
        f"'s_{lang}', size(filter(w, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    )
    scored = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    ).select(
        F.col(id_col),
        F.expr(f"inline(array(named_struct({struct_fields})))"),
    )
    langs = list(LANG_MARKERS)
    return scored.select(
        F.col(id_col),
        *[F.col(f"s_{lang}") for lang in langs],
        F.expr(lang_id_case_sql()).alias("lang_pred"),
    )


def lang_id_case_sql() -> str:
    """The identical CASE expression for a SQL oracle (same argmax
    tie-order)."""
    langs = list(LANG_MARKERS)
    case = "CASE "
    for i, lang in enumerate(langs):
        rest = [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        conds = rest + [f"s_{lang} > 0"]
        case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    case += "ELSE 'und' END"
    return case


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 100,
    overlap_words: int = 20,
) -> DataFrame:
    """Split documents into fixed-size word chunks with overlap — the
    standard pre-embedding chunking step of an LLM data pipeline.

    Pure built-ins (sequence → transform → explode): the explode is
    narrow (no shuffle), so chunking 100 TB of documents is a single
    map-only stage. Output: (id, chunk_idx, chunk_text, n_words).
    """
    stride = chunk_words - overlap_words
    if stride <= 0:
        raise ValueError("chunk_words must exceed overlap_words")
    w = F.split(F.col(text_col), " ")
    # chunk starts: 1, 1+stride, ... (1-based, SQL slice indexing); the
    # sequence stops once a chunk would add no new words
    chunks = (
        f"transform(sequence(1, greatest(size(w) - {overlap_words}, 1), {stride}), "
        f"s -> slice(w, s, {chunk_words}))"
    )
    return (
        df.select(F.col(id_col), w.alias("w"))
        .select(
            F.col(id_col),
            F.posexplode(F.expr(chunks)).alias("chunk_idx", "chunk_words_arr"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.concat_ws(" ", "chunk_words_arr").alias("chunk_text"),
            F.size("chunk_words_arr").alias("n_words"),
        )
    )


def doc_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (content-defined identity for exact dedup across formatting), plus a
    coarse 8-hex-char prefix usable as a shard/bucket key."""
    # fingerprint is projected FIRST and fp_bucket derived from the named
    # column in a second projection: referencing the md5 subtree twice in
    # one select re-evaluates regexp+md5 per reference (codegen does not
    # CSE across output columns here) — measured 5x slower at sf0.1.
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint")).withColumn(
        "fp_bucket", F.substring("fingerprint", 1, 8)
    )


PII_PATTERNS = {
    # simple, engine-portable character-class regexes (no lookaround):
    # the same pattern string behaves identically in Java regex and RE2
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
}


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing for training corpora: count and mask emails /
    phone numbers / IPv4 literals. Pure regexp projection (JVM-side,
    no shuffle); counts come from ``regexp_count`` and the masked text
    replaces each match class with ``<EMAIL>`` / ``<PHONE>`` / ``<IP>``.

    The pattern set is deliberately lookaround-free so any RE2-class
    engine (the DuckDB oracle included) matches the same spans.
    """
    out = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        *[
            F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{name}")
            for name, p in PII_PATTERNS.items()
        ],
    )
    masked = F.col("__t")
    for name, p in PII_PATTERNS.items():
        masked = F.regexp_replace(masked, p, f"<{name.upper()}>")
    return out.withColumn("masked_len", F.length(masked)).drop("__t")


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Per-document top-k TF-IDF terms.

    The classic corpus-statistics operator for training-data curation
    (keyword extraction, topic skew audits). Shape at scale:

    - tokenize + explode is map-only;
    - term frequency is one shuffle on ``(doc, term)`` with map-side
      partial aggregation;
    - document frequency reuses the TF result (no second pass over raw
      text) and shuffles on ``term`` only;
    - the corpus size joins in as a broadcast single-row aggregate, so
      no ``count()`` action and no driver round-trip.

    Ranking is integer-deterministic — ``(tf DESC, df ASC, term ASC)``
    — so the top-k set never depends on float rounding; the ``tfidf``
    score itself (``tf * ln((N+1)/(df+1))``, smoothed) is exported
    rounded to 2 decimals for cross-engine comparison.
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = df.agg(F.count("*").alias("n_docs"))
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.col("rn").alias("term_rank"),
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 2
            ).alias("tfidf"),
        )
    )


def top_ngrams(
    df: DataFrame, text_col: str, n: int = 2, k: int = 50
) -> DataFrame:
    """Corpus-wide top-k word n-grams by frequency (ties broken by the
    n-gram string so the result is deterministic).

    Adjacent-word pairing happens inside the array domain —
    ``transform`` over index positions, no self-join — so the whole
    n-gram extraction is map-only; the only shuffle is the final count
    aggregation on the n-gram key.
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    # sequence(1, 0) counts DOWN in Spark, so docs shorter than n words
    # must short-circuit to an empty array instead of a reversed range
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> array_join(slice(__w, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        df.select(words.alias("__w"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("ngram"))
        .limit(k)
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Within-document repetition detector (the Gopher-style
    duplicate-n-gram quality rule): fraction of word n-grams that are
    repeats of an earlier n-gram in the same document. High values mark
    degenerate/boilerplate text that poisons LM training data.

    Map-only: the n-gram window runs inside the array domain (transform
    over index positions — no explode, no join, no shuffle at all), and
    the ratio is a scaled integer so any engine agrees exactly. Docs
    with fewer than ``n`` words report zero grams and ratio 0.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> array_join(slice(__w, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    # long arithmetic: at 100 TB a boilerplate doc can carry >2^31/10000
    # duplicate grams, which would wrap the scaled int32 product
    total = F.size("__g").cast("long")
    distinct = F.size(F.array_distinct(F.col("__g"))).cast("long")
    return (
        df.select(F.col(id_col), w.alias("__w"))
        .select(F.col(id_col), grams.alias("__g"))
        .select(
            F.col(id_col),
            total.alias("n_grams"),
            (total - distinct).alias("n_dup_grams"),
            F.when(total > 0, F.floor((total - distinct) * 10000 / total))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_ratio_x10000"),
        )
    )


#: composite-quality-filter reason bits (Gopher/C4-style rule bundle)
QF_TOO_FEW_WORDS = 1  # < 10 words
QF_BAD_LENGTH = 2  # < 100 or > 20000 chars
QF_BAD_WORD_LEN = 4  # mean word length outside [2, 12]
QF_NO_STOPWORDS = 8  # zero stopwords: likely non-prose
QF_TOO_MUCH_PUNCT = 16  # punctuation > 20% of chars


def composite_quality_filter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The classic web-corpus keep/drop rule bundle as ONE narrow pass:
    every rule is integer math over built-ins, and the output carries a
    ``reasons`` bitmask (see QF_* constants) so downstream can audit WHY
    a document was dropped — at 100 TB you never get to re-run the
    filter just to find out.

    keep == (reasons = 0). No shuffle, no UDF; the whole filter inlines
    into the scan projection."""
    w = F.split(F.col(text_col), " ")
    n_words = F.size(F.col("__w"))
    n_chars = F.length(F.col(text_col))
    sum_word_len = n_chars - (n_words - 1)  # single-space-separated text
    sw_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(__w, x -> lower(x) IN ({sw_list}))"))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[.,;:!?'\"()\[\]{}-]", "")
    )
    reasons = (
        F.when(n_words < 10, QF_TOO_FEW_WORDS).otherwise(0)
        + F.when((n_chars < 100) | (n_chars > 20000), QF_BAD_LENGTH).otherwise(0)
        + F.when(
            (sum_word_len < 2 * n_words) | (sum_word_len > 12 * n_words),
            QF_BAD_WORD_LEN,
        ).otherwise(0)
        + F.when(n_stop == 0, QF_NO_STOPWORDS).otherwise(0)
        + F.when(5 * n_punct > n_chars, QF_TOO_MUCH_PUNCT).otherwise(0)
    )
    return (
        df.select(F.col(id_col), F.col(text_col), w.alias("__w"))
        .select(
            F.col(id_col),
            reasons.cast("int").alias("reasons"),
            (reasons == 0).alias("keep"),
        )
    )


def _doc_grams(frame: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, distinct word-n-gram array) — shared by the one-phase and
    bloom decontamination operators so their semantics stay identical.
    Short docs (< n words) get an empty array, not a countdown range."""
    from paimon_python_spark.operators.dedup import _shingle_expr

    return frame.select(
        F.col(id_col),
        F.when(
            F.size(F.split(F.col(text_col), " ")) >= n,
            F.expr(_shingle_expr(text_col, n)),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("g"),
    )


def contamination_check_bloom(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    bits_per_gram: int = 12,
    num_hashes: int = 5,
    bitset_bits: int = 0,
) -> DataFrame:
    """Two-phase benchmark decontamination for LARGE eval sets — same
    result as :func:`contamination_check`, different broadcast budget.
    ``bitset_bits``: fix the bitset size up front (power of two) and
    skip the bench-gram count job — one fewer action when the caller
    already knows the eval-set scale; any size still yields exact
    results (an undersized bitset only grows the confirm-join input).

    ``contamination_check`` broadcasts the benchmark's distinct n-gram
    STRINGS; at tens of millions of grams that broadcast is GBs. Here
    phase 1 folds the bench grams into a Bloom bitset entirely
    JVM-side (k ``xxhash64(gram, seed_i)`` columns -> bit positions ->
    sparse ``(word, bit_or(mask))`` rows), so the driver collects and
    broadcasts ``m/8`` bytes (~``bits_per_gram``/8 per gram, ~1.5 B at
    the default 12 bits) instead of the strings. Phase 2 probes every
    corpus gram with a VECTORIZED numpy kernel over the same k hash
    columns — only int64 hashes cross the Arrow boundary, never
    strings — and only the bloom SURVIVORS enter the exact broadcast
    confirm-join. False positives are culled by that join and false
    negatives are impossible, so the output is bit-identical to the
    one-phase operator; the bloom only shrinks the join input (by
    ~``(1-fpp)`` of the clean corpus) and the broadcast (by ~50x vs
    5-gram strings).
    """
    from pyspark.sql import types as T

    from paimon_python_spark.operators._util import widen

    # the corpus-side shingle expression is the heavy per-row stage; a
    # single small parquet split would run it on 1 of N cores (twice:
    # the probe path and the totals path both consume `grams`)
    grams = _doc_grams(widen(df.select(id_col, text_col)), id_col, text_col, n)
    bench_grams = (
        _doc_grams(bench_df, id_col, text_col, n)
        .select(F.explode("g").alias("gram"))
        .distinct()
    )
    if bitset_bits:
        if bitset_bits & (bitset_bits - 1):
            raise ValueError("bitset_bits must be a power of two")
        m = bitset_bits
    else:
        bench_n = bench_grams.count()  # small side: one sizing job
        m = 1 << max(10, (max(1, bench_n) * bits_per_gram - 1).bit_length())
    k = num_hashes

    def hashed(frame):
        return frame.select(
            "*",
            *[
                F.xxhash64(F.col("gram"), F.lit(i)).alias(f"__h{i}")
                for i in range(k)
            ],
        )

    # phase 1: JVM-side sparse bitset build — one shuffle of long pairs
    positions = hashed(bench_grams).select(
        F.explode(
            F.array(*[F.col(f"__h{i}").bitwiseAND(m - 1) for i in range(k)])
        ).alias("p")
    )
    sparse = (
        positions.select(
            F.shiftright("p", 6).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
        .collect()
    )
    import numpy as np

    bitset = np.zeros(m // 64, dtype=np.int64)
    for r in sparse:
        bitset[r["word"]] = r["mask"]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitset)

    @F.pandas_udf(T.BooleanType())
    def _might_contain(*hs):
        import numpy as _np
        import pandas as _pd

        arr = bc.value
        ok = _np.ones(len(hs[0]), dtype=bool)
        for h in hs:
            pos = h.to_numpy(dtype=_np.int64, na_value=0) & (m - 1)
            ok &= (arr[pos >> 6] >> (pos & 63)).astype(_np.int64) & 1 == 1
        return _pd.Series(ok)

    exploded = hashed(
        grams.select(
            F.col(id_col),
            F.size("g").alias("n_grams"),
            F.explode_outer("g").alias("gram"),
        )
    )
    survivors = exploded.filter(
        F.col("gram").isNotNull()
        & _might_contain(*[F.col(f"__h{i}") for i in range(k)])
    )
    confirmed = survivors.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "gram", "inner"
    )
    hit_counts = confirmed.groupBy(id_col).agg(
        F.count("__hit").cast("long").alias("n_contaminated")
    )
    totals = grams.select(
        F.col(id_col), F.size("g").cast("long").alias("n_grams")
    )
    return (
        totals.join(hit_counts, id_col, "left")
        .withColumn(
            "n_contaminated", F.coalesce("n_contaminated", F.lit(0)).cast("long")
        )
        .withColumn(
            "contamination_x10000",
            F.when(
                F.col("n_grams") > 0,
                F.floor(F.col("n_contaminated") * 10000 / F.col("n_grams")),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def corpus_overlap(
    df: DataFrame,
    source_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Pairwise corpus-overlap matrix: for every pair of sources, how
    many distinct word-n-grams they share and the exact Jaccard — the
    dataset-curation diagnostic for "are these two crawls the same
    data" before mixing weights are chosen.

    Scale shape: ONE shuffle of distinct ``(gram, source)`` pairs; the
    per-gram source set folds to sorted pair combinations JVM-side
    (sources are few — the combination explosion is |S|² per gram max,
    not corpus-sized), then a hash aggregate per pair. No self-join of
    the gram table (an O(grams²/sources) blowup at 100 TB) and nothing
    collects to the driver.
    """
    from paimon_python_spark.operators._cache import shared
    from paimon_python_spark.operators._util import widen

    # shared: the distinct gram table feeds BOTH the per-gram source
    # sets and the per-source totals — unpersisted, the whole widen →
    # gram-explosion → distinct chain executed twice per run (two
    # ~0.6 s single-task map jobs + twin distinct exchanges in the
    # event log). One materialization, both aggregates read the cache.
    grams = shared(
        _doc_grams(
            widen(df.select(F.col(source_col), F.col(text_col))),
            source_col,
            text_col,
            n,
        )
        .select(F.col(source_col).alias("src"), F.explode("g").alias("gram"))
        .distinct()
    )
    per_gram = grams.groupBy("gram").agg(
        F.sort_array(F.collect_set("src")).alias("srcs")
    )
    pairs = per_gram.select(
        F.explode(
            F.flatten(
                F.transform(
                    "srcs",
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("srcs"), i + 2, F.size("srcs")
                        ),
                        lambda b: F.struct(
                            a.alias("src_a"), b.alias("src_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    shared = pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("shared_grams")
    )
    totals = grams.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    return (
        shared.join(
            F.broadcast(totals.select(F.col("src").alias("src_a"),
                                      F.col("n_grams").alias("grams_a"))),
            "src_a",
        )
        .join(
            F.broadcast(totals.select(F.col("src").alias("src_b"),
                                      F.col("n_grams").alias("grams_b"))),
            "src_b",
        )
        .withColumn(
            "jaccard_x10000",
            F.floor(
                F.col("shared_grams")
                * 10000
                / (F.col("grams_a") + F.col("grams_b") - F.col("shared_grams"))
            ).cast("long"),
        )
        .select(
            "src_a", "src_b", "shared_grams", "grams_a", "grams_b",
            "jaccard_x10000",
        )
    )


def contamination_check(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination screening: for every document, the share
    of its distinct word-``n``-grams that also occur anywhere in the
    benchmark (eval-set) corpus ``bench_df`` — the standard decontamination
    pass run before training on web data.

    Scale shape: the benchmark n-gram set is small (eval suites are KBs
    to MBs), so it is ``broadcast()`` and the whole op is a map-side
    join over the exploded training corpus — no shuffle of the 100 TB
    side. Output per doc: ``n_grams``, ``n_contaminated`` and a scaled
    integer ratio (exact, engine-portable).

    Parity note: the reference has no corpus ops (delegates analytics to
    DuckDB, pypaimon/api/table_read.py:47-56); this extends SURVEY §2.5.
    """
    from paimon_python_spark.operators._util import widen

    doc_g = _doc_grams(widen(df.select(id_col, text_col)), id_col, text_col, n)
    bench_grams = (
        _doc_grams(bench_df, id_col, text_col, n)
        .select(F.explode("g").alias("gram"))
        .distinct()
    )
    exploded = doc_g.select(
        F.col(id_col),
        F.size("g").alias("n_grams"),
        F.explode_outer("g").alias("gram"),
    )
    hits = exploded.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "gram", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.count("__hit").cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_x10000",
            F.when(
                F.col("n_grams") > 0,
                F.floor(F.col("n_contaminated") * 10000 / F.col("n_grams")),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """C4-style line-level cleaning: drop lines with fewer than
    ``min_words`` words, keep the rest in order. Pure higher-order
    array functions — no explode, no shuffle; the whole op inlines
    into the scan projection at any scale.

    Output: ``(id, n_lines, n_kept_lines, cleaned_text)``."""
    lines = F.split(F.col(text_col), sep)
    kept = F.filter(
        lines, lambda x: F.size(F.split(x, " ")) >= F.lit(min_words)
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, sep).alias("cleaned_text"),
    )


def paragraph_stats(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """Paragraph-granular exact dedup (the cheap approximation of
    exact-substring dedup, Lee et al. 2022): explode paragraphs, hash
    each, and aggregate occurrence counts — downstream keeps the
    paragraph only in ``keeper_id``.

    Scale shape: explode is map-side; the single agg keys on the
    paragraph hash (high-cardinality) and every aggregate is algebraic,
    so hot boilerplate paragraphs partial-aggregate before the shuffle.
    Output: ``(para_hash, n_occurrences, n_docs, keeper_id)``."""
    paras = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), sep)).alias("__p")
    ).filter(F.length("__p") > 0)
    return paras.groupBy(F.md5(F.col("__p").cast("binary")).alias("para_hash")).agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.min(id_col).alias("keeper_id"),
    )


def normalize_url_col(col) -> "F.Column":
    """Canonical URL key: lowercase, strip scheme (``http://`` /
    ``https://``), a leading ``www.``, everything from the first ``?``
    or ``#`` (query/fragment — the tracking-parameter tail), and a
    trailing slash. Anchored regexes, so Spark's replace-all and
    other engines' replace-first semantics agree."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"[?#].*$", "")
    return F.regexp_replace(c, r"/$", "")


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level deduplication (the C4/CommonCrawl first pass): group
    documents by normalized URL, keep the smallest id per key.

    One projection (the normalization inlines into the scan) + one
    hash-aggregate on the key — map-side combine makes the shuffle
    carry one row per distinct URL, not per document. Output:
    ``(url_key, keeper_id, n_docs)``."""
    return (
        df.select(
            F.col(id_col), normalize_url_col(F.col(url_col)).alias("url_key")
        )
        .groupBy("url_key")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


def unigram_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-proxy quality score without an external LM: the mean
    unigram surprisal of each document against the corpus's own unigram
    distribution (the CCNet-style "does this read like the corpus"
    filter).

    Per-word surprisal is the INTEGER floor(log2(N / n_w)) — computed as
    ``length(bin(N div n_w)) - 1``, pure 64-bit integer ops both here and
    in any SQL engine — so scores hash identically everywhere (no ln()
    ulp drift). Gibberish/rare-token docs score high; boilerplate scores
    low.

    Scale shape: one hash-agg over words for the vocabulary, one shuffle
    join words→vocab (word-partitioned, skew handled by AQE), one
    hash-agg back to docs. The corpus total N is a 1-row broadcast cross
    join. No UDF, no driver state.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("n_w"))
    total = vocab.agg(F.sum("n_w").alias("corpus_n"))
    scored = (
        words.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "s",
            (F.length(F.bin(F.expr("corpus_n div n_w"))) - 1).cast("long"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("total_surprisal"),
        )
        .withColumn(
            "avg_surprisal_x100",
            F.floor(F.col("total_surprisal") * 100 / F.col("n_words")).cast("long"),
        )
    )


def bigram_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-proxy quality score against the corpus's own BIGRAM
    distribution — a sharper "does this read like the corpus" signal
    than :func:`unigram_surprisal` (word salad with common words scores
    low on unigrams but high here, because its TRANSITIONS are rare).

    Per-bigram surprisal is the integer ``floor(log2(c1 / c2))`` where
    ``c2`` counts the (prev, word) pair corpus-wide and ``c1`` counts
    ``prev`` as a predecessor (so c2 ≤ c1 always and the conditional
    p(word|prev) = c2/c1 needs no smoothing for observed pairs) —
    computed as ``length(bin(c1 div c2)) - 1``, pure 64-bit integer ops
    identical in every SQL engine, so scores hash-match the oracle.

    Scale shape: one hash-agg over bigrams for the pair counts (the
    predecessor counts fold from it with a second small agg), one
    word-partitioned shuffle join back, one hash-agg to docs. No UDF,
    no driver state; single-word docs drop (no transitions to score).
    """
    # ONE split evaluation per row: the lambda binding in
    # inline(transform(array(split), w -> ...)) holds the word array as
    # a variable, so CollapseProject can't inline (and re-evaluate) it
    # into every reference — the same trick as the minhash shingler.
    # The size guard lives INSIDE the lambda because Spark's
    # sequence(2, 1) counts DOWN rather than producing empty.
    split_expr = f"split(lower({text_col}), ' ')"
    gen = (
        f"inline(transform(array({split_expr}), w -> struct("
        "CASE WHEN size(w) >= 2 THEN transform(sequence(2, size(w)), "
        "i -> struct(w[i - 2] AS w1, w[i - 1] AS w2)) "
        "ELSE array() END AS bgs)))"
    )
    pairs = (
        df.select(F.col(id_col), F.expr(gen))
        .select(F.col(id_col), F.explode("bgs").alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .withColumn(
            "s", (F.length(F.bin(F.expr("c1 div c2"))) - 1).cast("long")
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("s").cast("long").alias("total_surprisal"),
        )
        .withColumn(
            "avg_surprisal_x100",
            F.floor(F.col("total_surprisal") * 100 / F.col("n_bigrams")).cast(
                "long"
            ),
        )
    )


#: stand-in weights for the quality model (a real deployment drops in
#: trained weights; the pipeline shape — integer features x literal
#: weights, scan-side — is identical)
QUALITY_MODEL_WEIGHTS = {
    "bias": -2.0,
    "n_words": 0.012,
    "stop_ratio_x1000": 0.018,
    "punct_ratio_x1000": -0.025,
    "mean_word_len_x10": 0.005,
}


def quality_model_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model-based quality scoring: a linear model over cheap integer
    text features (the fasttext-classifier-filter shape with a
    deterministic stand-in model). Features are exact integers; the
    logit is a fixed-order double dot product with literal weights, so
    any engine reproduces it bit-for-bit (no sigmoid — thresholding
    the logit at 0 is the same decision and avoids cross-libm exp).

    Scan-side projection only; at 100 TB this filter runs inside the
    ingest scan with zero extra passes."""
    w = QUALITY_MODEL_WEIGHTS
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    sw_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), x -> lower(x) IN ({sw_list}))")).cast("long")
    n_punct = (
        n_chars
        - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?'\"()\[\]{}-]", ""))
    ).cast("long")
    f_stop = F.floor(n_stop * 1000 / n_words).cast("long")
    f_punct = F.floor(n_punct * 1000 / n_chars).cast("long")
    f_mwl = F.floor(n_chars * 10 / n_words).cast("long")
    logit = (
        F.lit(w["bias"])
        + n_words * F.lit(w["n_words"])
        + f_stop * F.lit(w["stop_ratio_x1000"])
        + f_punct * F.lit(w["punct_ratio_x1000"])
        + f_mwl * F.lit(w["mean_word_len_x10"])
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        f_stop.alias("stop_ratio_x1000"),
        f_punct.alias("punct_ratio_x1000"),
        f_mwl.alias("mean_word_len_x10"),
        F.round(logit, 6).alias("quality_logit"),
        (logit > 0).alias("keep"),
    )
