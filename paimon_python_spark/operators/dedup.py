"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are pure DataFrame compositions (built-in functions only — no Python
UDFs in any hot path) so Catalyst/AQE own the physical plan. Shuffle
budget per op is noted; the LSH variants exist precisely because the
exact all-pairs joins don't survive a 100× scale-up.

Determinism contract (what makes these DuckDB-oracle-able): hash
functions are md5 over utf8 (identical bytes in any engine), shingles
use 1-based ``element_at`` indexing (mirrors SQL list indexing), Jaccard
thresholds are integer cross-multiplications.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paimon_python_spark.operators._cache import register, release_cached, shared  # noqa: F401  (release_cached re-exported via operators.__init__)


class ConvergenceError(RuntimeError):
    """Raised by :func:`connected_components` in strict mode when label
    propagation exhausts ``max_iter`` without converging."""


def exact_dedup(df: DataFrame, on: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one survivor (min id) per duplicate group.

    One hash-aggregate shuffle on ``on``; map-side partial aggregation
    makes this the cheapest possible dedup at any scale.
    """
    return (
        df.groupBy(*on)
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


from paimon_python_spark.operators._util import widen as _widen  # noqa: E402


def _shingle_expr(text_col: str, n: int) -> str:
    """SQL expr producing the DISTINCT word-``n``-gram shingle set.

    1-based element_at keeps the expression line-for-line portable to
    DuckDB list indexing (the oracle uses w[i]||' '||w[i+1]...).

    The word array is BOUND AS A LAMBDA VARIABLE (``transform(array(
    split(...)), w -> ...)[0]``) rather than a projected column:
    Catalyst's CollapseProject inlines a ``withColumn`` alias into
    every reference, so the column form re-ran ``split`` once per
    ``element_at`` — ~3·n_shingles evaluations per row, measured 9×
    the whole shingling cost at sf0.1. A lambda binding evaluates the
    split exactly once per row and cannot be inlined apart."""
    parts = ", ".join(f"element_at(w, i + {k})" for k in range(n))
    return (
        f"transform(array(split({text_col}, ' ')), w -> "
        f"array_distinct(transform(sequence(1, size(w) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))))[0]"
    )


def with_shingles(
    df: DataFrame, text_col: str, n: int = 3, min_words: int | None = None
) -> DataFrame:
    """Add ``sh``: the distinct word n-gram shingle set of ``text_col``."""
    min_words = n if min_words is None else min_words
    return df.filter(
        F.size(F.split(F.col(text_col), " ")) >= min_words
    ).withColumn("sh", F.expr(_shingle_expr(text_col, n)))


#: modulus for the affine MinHash family (prime, < 2^30)
MINHASH_P = 1_000_000_007


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) coefficients for the affine hash family
    h_j(x) = (a_j*x + b_j) mod MINHASH_P. a_j < 2^31 and x < 2^28 keep
    a_j*x + b_j well inside a 64-bit signed integer in any engine."""
    return [
        ((j * 2654435761 + 1) % (2**31 - 1) | 1, (j * 40503 + 12345) % MINHASH_P)
        for j in range(num_hashes)
    ]


def minhash_signature_expr(num_hashes: int) -> str:
    """SQL expr: MinHash signature (array of ``num_hashes`` bigints)
    over the shingle set ``sh``.

    Hash family: ONE md5 per shingle, its first 7 hex chars parsed as a
    28-bit integer x, then ``num_hashes`` affine hashes
    h_j(x) = (a_j*x + b_j) mod p — pure 64-bit integer math that any
    engine (the DuckDB oracle included) computes identically, at a
    fraction of the cost of string-rotation minima (integer compare vs
    32-char concat+compare per shingle per hash).
    """
    hashes = ", ".join(
        f"({a}L * x + {b}L) % {MINHASH_P}L" for a, b in minhash_coeffs(num_hashes)
    )
    # ONE aggregate pass keeping all num_hashes running minima at once;
    # md5+conv evaluated once per shingle inside the aggregate input
    return (
        "aggregate("
        "transform(sh, s -> CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT)), "
        f"array_repeat(CAST(NULL AS BIGINT), {num_hashes}), "
        f"(acc, x) -> zip_with(acc, array({hashes}), "
        "(a, h) -> CASE WHEN a IS NULL OR h < a THEN h ELSE a END))"
    )


def _minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    max_bucket: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared LSH front half: shingle → minhash signature → banded
    candidate pairs. Returns ``(sh, cand)``: the PERSISTED shingled
    frame (signatures feed both the band explosion and the verification
    join — at scale, write them to a table and reuse across dedup
    rounds) and the distinct (doc_a, doc_b) band-collision pairs.
    Both verification metrics (Jaccard, containment) build on this."""
    rows_per_band = num_hashes // bands
    # ONE shingle evaluation per row: inline(struct(sh, sig)) binds the
    # shingle array as a lambda variable for the signature, instead of a
    # projected sh column that CollapseProject would inline (and thus
    # re-evaluate) into the sig expression — measured 2.7× on this frame
    combo = (
        f"inline(transform(array({_shingle_expr(text_col, shingle_n)}), "
        f"sh -> struct(sh AS sh, {minhash_signature_expr(num_hashes)} AS sig)))"
    )
    sh = (
        _widen(df.select(id_col, text_col))
        .filter(F.size(F.split(F.col(text_col), " ")) >= shingle_n)
        .select(F.col(id_col), F.expr(combo))
    )
    # persisted LAZILY — the first consuming action populates the cache
    # while doing useful work (eager=True paid a full extra pass). The
    # r7 bisect of the 2.3× gate regression: narrow input partitioning
    # (_widen) was the dominant cost, the eager pass the rest.
    # Re-adjudicated r12: AQE submits this plan's independent leaf
    # exchanges concurrently and each recomputes the shingle pass when
    # the cache is cold (4 parallel 2-task jobs in the event log), but
    # the duplicates run fully OVERLAPPED on otherwise-idle cores —
    # eager measured +0.3-0.5 s wall per query across the family (the
    # extra count pass serializes in front). At cluster scale staggered
    # task starts make later stages hit blocks the first stage already
    # cached, so the transient duplication shrinks with partition count.
    sh = shared(sh)
    return sh, _lsh_candidates(
        sh, id_col, bands, _band_key_expr(rows_per_band), max_bucket
    )


def _band_key_expr(rows_per_band: int):
    """The per-band key — ``rows_per_band`` signature slots joined with
    '-'. ONE parsed SQL expression instead of a listcomp of
    ``F.element_at``/arithmetic Column ops: each Column operation is a
    py4j round-trip, and this expression is rebuilt per consuming
    query (~20 ms of driver latency per build, guide §5.3 / the
    Finding-6 IN-list pattern). The parsed tree is identical to the
    Column-built one (same element_at/+/* nodes), so plans and results
    are unchanged."""
    slots = ", ".join(
        f"element_at(sig, band * {rows_per_band} + {k + 1})"
        for k in range(rows_per_band)
    )
    return F.expr(f"concat_ws('-', {slots})")


def _lsh_candidates(
    sh: DataFrame, id_col: str, bands: int, band_key, max_bucket: int | None = None
) -> DataFrame:
    """Distinct (doc_a, doc_b) band-collision candidates from a shingled
    frame carrying a ``sig`` minhash column. The self-join is keyed on
    (band, band_key) — the only shuffle; cost scales with collisions.

    ``max_bucket`` drops buckets wider than the cap BEFORE the
    self-join (one cheap algebraic agg). A bucket of width w yields
    w(w-1)/2 candidate pairs, so one boilerplate-heavy bucket can turn
    the whole pass quadratic — the scale sweep measured e=1.25 (super-
    linear) on a small-vocabulary corpus without the cap. Capping is
    the standard production guard (oversized buckets are spam/
    boilerplate, not near-duplicate content); None keeps exact
    reference semantics for the oracle-checked path."""
    banded = (
        sh.select(id_col, "sig")
        .withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn("band_key", band_key)
        .select(id_col, "band", "band_key")
    )
    if max_bucket is not None:
        widths = banded.groupBy("band", "band_key").agg(
            F.count("*").alias("__w")
        )
        banded = banded.join(
            widths.filter(F.col("__w") <= max_bucket).drop("__w"),
            ["band", "band_key"],
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_num: int = 1,
    jaccard_den: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified by exact Jaccard.

    Pipeline (the standard shingle→minhash→band→bucket-join shape):
      1. distinct word shingles per doc (narrow, no shuffle),
      2. minhash signature per doc (narrow),
      3. explode into ``bands`` band-keys; self-join on (band, band_key)
         — the ONLY shuffle, keyed on band values, so cost scales with
         collisions rather than |docs|²,
      4. verify candidates with exact Jaccard on the shingle sets using
         integer math: keep iff den·|A∩B| ≥ num·|A∪B|.

    Returns (doc_a, doc_b, intersect_size, union_size), doc_a < doc_b.
    """
    sh, cand = _minhash_candidates(
        df, id_col, text_col, num_hashes, bands, shingle_n, max_bucket
    )
    sets = sh.select(F.col(id_col), F.col("sh"))
    out = (
        cand.join(sets.withColumnsRenamed({id_col: "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sets.withColumnsRenamed({id_col: "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn("intersect_size", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "union_size", F.size("sh_a") + F.size("sh_b") - F.col("intersect_size")
        )
        .filter(
            F.col("intersect_size") * jaccard_den >= F.col("union_size") * jaccard_num
        )
        .select("doc_a", "doc_b", "intersect_size", "union_size")
    )
    # the verified-pair set is SMALL by construction (near-dups, not
    # candidates) and every consumer re-traverses it — an orderBy's
    # range-sampling job, CC iterations in fuzzy_survivors — so persist
    # it; the first action populates while doing useful work
    return shared(out)


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The PERSISTABLE half of MinHash-LSH dedup: one (id, band,
    band_key) row per document per band — the index a production
    pipeline writes to a table ONCE and reuses for every incoming
    batch, instead of re-shingling the corpus per dedup round. Pure
    narrow compute (shingle → signature → band keys), no shuffle."""
    rows_per_band = num_hashes // bands
    sig = (
        df.select(id_col, text_col)
        .filter(F.size(F.split(F.col(text_col), " ")) >= shingle_n)
        .select(
            F.col(id_col),
            F.expr(
                f"transform(array({_shingle_expr(text_col, shingle_n)}), "
                f"sh -> {minhash_signature_expr(num_hashes)})[0]"
            ).alias("sig"),
        )
    )
    return (
        sig.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn("band_key", _band_key_expr(rows_per_band))
        .select(id_col, "band", "band_key")
    )


def minhash_incremental_candidates(
    index: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental near-dup detection — the production ingest shape: a
    NEW batch of documents is banded (narrow compute over the batch
    only) and joined against a PRE-BUILT corpus band index (see
    :func:`minhash_band_index`, typically persisted in a lake table).
    The corpus is never re-shingled and never self-joined; the join is
    keyed on (band, band_key) and AQE broadcasts the batch side when it
    is small (the common ingest case), so a 1k-doc batch against a
    100 TB corpus index costs one index scan. Returns distinct
    (doc_new, doc_ref) candidate pairs."""
    new_bands = minhash_band_index(
        batch, id_col, text_col, num_hashes, bands, shingle_n
    ).withColumnsRenamed({id_col: "doc_new"})
    ref = index.withColumnsRenamed({id_col: "doc_ref"})
    return (
        new_bands.join(ref, ["band", "band_key"])
        .filter(F.col("doc_new") != F.col("doc_ref"))
        .select("doc_new", "doc_ref")
        .distinct()
    )


def _cap_hot_shingles(inv: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles shared by more than ``max_doc_freq`` docs BEFORE an
    inverted-index self-join — the production guard against quadratic
    fan-out on ubiquitous shingles (a shingle in w docs contributes
    w·(w−1)/2 joined rows; a boilerplate phrase across a web corpus is
    the whole job's runtime). The hot set is tiny by construction
    (count-bounded), so it broadcasts into an anti-join — the index
    itself never reshuffles. Mirrors ``max_bucket`` on the LSH path."""
    hot = (
        inv.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("shingle")
    )
    return inv.join(F.broadcast(hot), "shingle", "left_anti")


def _shingle_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    max_doc_freq: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the exact n-gram pair ops: the (doc, shingle)
    inverted index plus per-doc shingle counts, df-capped if asked.

    The split+shingle+explode pipeline feeds FOUR plan branches (hot-
    shingle agg, per-doc sizes, and both self-join sides), so the frame
    is persisted once (lazily — the first action populates it).
    Capped: the raw index is the cached frame and the cheap broadcast
    anti-join re-derives the capped view per branch from cache.
    Uncapped: sizes come straight off the shingle arrays, so the index
    itself is cached. Release via ``release_cached()``."""
    sh = with_shingles(_widen(df.select(id_col, text_col)), text_col, shingle_n)
    if max_doc_freq is not None:
        inv0 = shared(
            sh.select(F.col(id_col), F.explode("sh").alias("shingle")),
        )
        inv = _cap_hot_shingles(inv0, max_doc_freq)
        sizes = inv.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    else:
        sh = shared(sh)
        inv = sh.select(F.col(id_col), F.explode("sh").alias("shingle"))
        sizes = sh.select(F.col(id_col), F.size("sh").alias("n_sh"))
    return inv, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    jaccard_num: int = 3,
    jaccard_den: int = 5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via inverted index (explode + shuffle on
    shingle). Exact but heavier than MinHash-LSH: the shuffle carries one
    row per (doc, shingle) and the join fans out per shared shingle —
    use for moderate corpora or post-LSH verification at scale.

    ``max_doc_freq`` caps the fan-out: shingles in more than that many
    docs are removed from the index AND the per-doc sizes, so the result
    is the exact Jaccard over the df-capped shingle space (the IDF
    intuition — ubiquitous shingles carry no dedup signal). With the cap
    above the corpus' true max document frequency the output is
    bit-identical to the uncapped op; this is the required guard for a
    raw web corpus."""
    inv, sizes = _shingle_index(df, id_col, text_col, shingle_n, max_doc_freq)
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("intersect_size"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({id_col: "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn(
            "union_size", F.col("n_a") + F.col("n_b") - F.col("intersect_size")
        )
        .filter(
            F.col("intersect_size") * jaccard_den >= F.col("union_size") * jaccard_num
        )
        .select("doc_a", "doc_b", "intersect_size", "union_size")
    )


def _simhash_vote(j: int) -> str:
    """SQL expr: the ±1 vote of word-hash halves (h1, h2) for bit j —
    +1 when the j-th hex digit of the md5 digest has its top bit set
    (digit ≥ '8' ⟺ top bit of the nibble), else −1."""
    half, dj = ("h1", j) if j <= 8 else ("h2", j - 8)
    shift = 4 * (8 - dj) + 3  # top bit of the dj-th nibble
    return f"CASE WHEN (shiftright({half}, {shift}) & 1) = 1 THEN 1 ELSE -1 END"


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """Per-document ``bits``-bit SimHash fingerprint as a '0'/'1' string.
    Bit j is the sign of the summed per-word votes (ties → '0').

    Shape: explode words → one md5 per word, parsed once as two 32-bit
    integers → hash aggregate with ``bits`` conditional integer sums.
    Everything stays in whole-stage codegen (no higher-order functions,
    no per-word array allocations — measured 1.5× faster than the
    aggregate/zip_with form), and partial aggregation compacts each
    partition to |docs|×bits longs before the one shuffle on the doc
    key. Pair-finding then goes through band-bucketing like
    ``minhash_lsh_pairs``."""
    if bits > 16:
        raise ValueError("simhash_fingerprints supports at most 16 bits")
    ex = _widen(df.select(id_col, F.col(text_col))).select(
        id_col, F.explode(F.split(text_col, " ")).alias("s")
    ).select(
        id_col,
        F.expr("CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)").alias("h1"),
        F.expr("CAST(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT)").alias("h2"),
    )
    votes = ex.groupBy(id_col).agg(
        *[F.sum(F.expr(_simhash_vote(j))).alias(f"v{j}") for j in range(1, bits + 1)]
    )
    return votes.select(
        id_col,
        F.concat(
            *[
                F.when(F.col(f"v{j}") > 0, "1").otherwise("0")
                for j in range(1, bits + 1)
            ]
        ).alias("simhash"),
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs by cosine similarity.

    All-pairs variant (O(n²/2) compare, one broadcast or shuffle join) —
    correct baseline; at scale swap the candidate generation for
    ``similarity.lsh_bucket_topk``'s hyperplane buckets. The dot product
    is a sequential left-fold in double precision, rounded before the
    threshold so engines agree at the boundary.
    """
    from paimon_python_spark.operators.similarity import dot_expr

    # one norm fold per VECTOR (n folds), not per pair (n^2 folds);
    # sqrt(a.a)*sqrt(b.b) over precomputed values is bit-identical
    normed = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.sqrt(F.expr(dot_expr(vec_col, vec_col))).alias("__n"),
    )
    a = normed.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("va"), F.col("__n").alias("na")
    )
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("vb"), F.col("__n").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(F.expr(f"({dot_expr('va', 'vb')}) / (na * nb)"), round_digits),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_cosine_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dims: int,
    planes: int = 8,
    tables: int = 8,
    round_digits: int = 6,
    max_bucket: int | None = None,
    bucket_method: str = "expr",
) -> DataFrame:
    """Embedding near-duplicate pairs: hyperplane-LSH candidates →
    EXACT cosine verify. This is the scale path (the headline) —
    ``embedding_cosine_pairs`` is the all-pairs oracle-building helper.

    ``bucket_method``: "expr" (default — sequential SQL folds, bit-
    identical to the DuckDB oracle) or "matmul" (Arrow-batched numpy
    matmul, ~dims× less interpreter overhead for billion-vector runs;
    a projection exactly at 0.0 could bucket differently — see
    ``hyperplane_buckets_matmul``). Verification is exact either way,
    so false positives are impossible; the methods can differ only in
    LSH recall at the floating-point boundary.

    Candidate generation: ``tables`` independent sign-LSH tables, each
    hashing a vector to a ``planes``-bit bucket (deterministic
    md5-derived ±1 hyperplanes, so any engine reproduces the exact
    buckets). Vectors meeting in a (table, bucket) become candidates —
    a self-join keyed on (table, bucket), so the shuffle carries
    (id, bucket) rows, never vectors, and the join fans out per
    collision (≈ n²/2^planes per table for unrelated vectors), not n².
    Recall for genuinely-similar pairs follows the standard
    (1 − (θ/π))^planes per-table collision bound, amortized across
    tables. ``max_bucket`` drops over-wide buckets (degenerate
    embedding regions) before the join, like the MinHash guard.

    Verification: candidates (distinct) rejoin the vectors and the
    exact rounded cosine is thresholded — no false positives ever;
    misses only pairs LSH never proposed. Output matches the all-pairs
    op's schema (id_a, id_b, cos_sim).
    """
    from paimon_python_spark.operators.similarity import (
        bucket_expr,
        dot_expr,
        hyperplane_buckets_matmul,
        hyperplane_signs,
    )

    all_signs = hyperplane_signs(tables * planes, dims)
    # widen: the tables×planes hyperplane dot folds and the norm folds
    # below are the heavy per-row stages — a single-split input would
    # run them on one core (and the eager populate pass serializes it)
    df = _widen(df.select(id_col, vec_col))
    if bucket_method == "matmul":
        ex = hyperplane_buckets_matmul(df, id_col, vec_col, all_signs, planes)
    elif bucket_method == "expr":
        bucket_cols = F.array(
            *[
                F.expr(bucket_expr(vec_col, all_signs[t * planes : (t + 1) * planes]))
                for t in range(tables)
            ]
        )
        ex = df.select(F.col(id_col), F.posexplode(bucket_cols).alias("tbl", "bucket"))
    else:
        raise ValueError(f"bucket_method {bucket_method!r} (expr|matmul)")
    # persisted + eager: the hyperplane dot-products per vector feed
    # the widths agg AND both self-join sides — without the cache they
    # recompute ~4× (measured; was the 4 s bench line). release_cached()
    # frees it.
    ex = shared(ex, eager=True)
    if max_bucket is not None:
        widths = ex.groupBy("tbl", "bucket").agg(F.count("*").alias("__w"))
        ex = ex.join(
            F.broadcast(widths.filter(F.col("__w") <= max_bucket).drop("__w")),
            ["tbl", "bucket"],
        )
    a = ex.alias("a")
    b = ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # also shared: the (vector, norm) frame feeds BOTH verification-join
    # sides — one scan + one norm fold instead of two
    normed = shared(
        df.select(
            F.col(id_col),
            F.col(vec_col).alias("__v"),
            F.sqrt(F.expr(dot_expr(vec_col, vec_col))).alias("__n"),
        )
    )
    # the exact-verify stage's cost tracks CANDIDATE COUNT (one
    # dims-element dot fold per pair), not bytes — AQE's byte-based
    # coalescing squeezes the tiny (id, id) shuffle to ONE partition
    # and runs every dot product on one core (measured: two ~500 ms
    # single-task jobs at sf0.1 while 31 cores idle; guide §2.5's
    # "bytes are a bad cost proxy" case). An EXPLICIT partition count
    # on the exchange feeding the compute-bearing join pins its width:
    # AQE never coalesces user-specified repartitions. Width = the
    # widened input's split count or the cluster's parallelism,
    # whichever is larger — scale-adaptive, not a local constant.
    verify_parts = max(
        df.rdd.getNumPartitions(),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    return (
        cand.join(
            normed.select(
                F.col(id_col).alias("id_a"),
                F.col("__v").alias("va"),
                F.col("__n").alias("na"),
            ),
            "id_a",
        )
        .repartition(verify_parts, "id_b")
        .join(
            normed.select(
                F.col(id_col).alias("id_b"),
                F.col("__v").alias("vb"),
                F.col("__n").alias("nb"),
            ),
            "id_b",
        )
        .withColumn(
            "cos_sim",
            F.round(F.expr(f"({dot_expr('va', 'vb')}) / (na * nb)"), round_digits),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_iter: int = 25,
    strict: bool = False,
) -> DataFrame:
    """Connected components over a pair list: (node, cluster) where
    ``cluster`` is the smallest node id reachable from ``node`` —
    min-label propagation iterated to convergence.

    This turns near-duplicate PAIRS (MinHash/LSH output) into dedup
    GROUPS: transitively-linked docs share a cluster, and "keep the
    cluster min" is then one filter. Deterministic (min is
    order-independent), so a recursive-SQL oracle agrees exactly.

    Scale shape: per iteration one join + one hash aggregate, both
    keyed on node id; near-dup clusters are dense, so the common case
    converges in 2-3 rounds. From round 4, ADAPTIVE POINTER JUMPING
    (path halving: also follow cluster → that node's own cluster) kicks
    in, bounding adversarial chain graphs at O(log diameter) rounds
    instead of O(diameter). The convergence check rides INSIDE the
    label update (a ``__changed`` flag aggregated over the
    freshly-cached labels) — no separate old-vs-new join job per round;
    the driver sees only the one-row sum.

    Non-convergence is never silent: exhausting ``max_iter`` raises
    :class:`ConvergenceError` when ``strict`` is set, else logs a
    warning (partial labels can under-merge transitive clusters). The
    returned labels read from a localCheckpoint (freed by the
    ContextCleaner once the frame is unreferenced).
    """
    import warnings
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .persist()
    )
    converged = False
    try:
        for _round in range(max_iter):
            nbr_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("cluster").alias("nbr_min"))
            )
            # localCheckpoint (lazy) instead of persist: the update plan
            # references `labels` TWICE (join + nbr_min), so without
            # lineage truncation the logical plan doubles per round —
            # exponential analysis cost that OOMs the driver on
            # high-diameter graphs. Checkpoint materializes into executor
            # storage at the same action below and cuts the lineage to a
            # leaf; old rounds' blocks are freed by the ContextCleaner
            # when their frames go out of scope. (On a cluster with
            # dynamic allocation, swap for reliable checkpoint() to a
            # fault-tolerant dir — same shape.)
            stepped = labels.join(
                nbr_min, labels.node == nbr_min.src, "left"
            ).select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_min", F.col("cluster"))
                ).alias("cluster"),
                # label shrank ⇔ some neighbor min was strictly smaller
                (F.coalesce(F.col("nbr_min"), F.col("cluster")) < F.col("cluster"))
                .cast("long")
                .alias("__changed"),
            )
            # ADAPTIVE POINTER JUMPING (path halving): from round 4 on,
            # also follow cluster -> that node's own cluster in the same
            # round. Near-dup clusters are dense (diameter ~2-3), so the
            # common case converges in the plain rounds without paying
            # the extra join; a graph still changing by round 4 is
            # chain-like, and the jump collapses a length-D chain in
            # O(log D) further rounds instead of D — the guard that
            # keeps adversarial long-chain graphs from turning the loop
            # into a driver-bound crawl. min-reachable semantics are
            # unchanged (the jump only substitutes an equal-or-smaller
            # label already reachable transitively).
            if _round >= 3:
                hop = stepped.select(
                    F.col("node").alias("__jn"), F.col("cluster").alias("__jc")
                )
                stepped = stepped.join(
                    hop, stepped.cluster == hop.__jn, "left"
                ).select(
                    "node",
                    F.least(
                        F.col("cluster"), F.coalesce("__jc", F.col("cluster"))
                    ).alias("cluster"),
                    (
                        F.col("__changed")
                        + (
                            F.coalesce(F.col("__jc"), F.col("cluster"))
                            < F.col("cluster")
                        ).cast("long")
                    ).alias("__changed"),
                )
            new_labels = stepped.localCheckpoint(eager=False)
            # one action: materializes the checkpoint AND returns the
            # convergence sum — no old-vs-new join job
            changed = new_labels.agg(F.sum("__changed")).collect()[0][0] or 0
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            msg = (
                f"connected_components did not converge in {max_iter} "
                "iterations; labels may under-merge transitive clusters "
                "(raise max_iter, or use large-star/small-star for long chains)"
            )
            if strict:
                raise ConvergenceError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return labels.select("node", "cluster")
    finally:
        edges.unpersist()


def fuzzy_dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    priority_col: str | None = None,
) -> DataFrame:
    """Rows of ``df`` that survive near-dup removal: docs in no pair,
    plus ONE survivor per near-dup cluster. ONE anti-join against the
    (tiny relative to the corpus) losing cluster members — a single
    pass over the corpus.

    Default survivor: the cluster's minimum id (deterministic, no extra
    data access). ``priority_col`` instead keeps the cluster's
    HIGHEST-priority row (ties broken by min id) — the production
    policy "keep the best-quality copy, not the first-crawled one";
    costs one extra broadcast-sized join + window over cluster labels
    only, never over the corpus."""
    comps = connected_components(pairs, a_col, b_col)
    # ONE anti-join against the DROP set (cluster members that lost),
    # instead of anti-join-vs-members ∪ semi-join-vs-winners — the
    # union form scanned the 100 TB corpus TWICE; the drop set is the
    # same size as the member set and the surviving row set is
    # identical (docs in no pair are in neither set and pass the
    # anti-join).
    if priority_col is None:
        drops = comps.filter(F.col("node") != F.col("cluster")).select(
            F.col("node").alias(id_col)
        )
    else:
        from pyspark.sql import Window

        labeled = comps.join(
            df.select(F.col(id_col).alias("node"), F.col(priority_col)),
            "node",
        )
        w = Window.partitionBy("cluster").orderBy(
            F.col(priority_col).desc(), F.col("node").asc()
        )
        drops = (
            labeled.withColumn("__rn", F.row_number().over(w))
            .filter("__rn > 1")
            .select(F.col("node").alias(id_col))
        )
    return df.join(drops, id_col, "left_anti")


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    containment_num: int = 4,
    containment_den: int = 5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ threshold.

    Catches subset duplicates Jaccard misses — a page embedded inside a
    larger page scores low Jaccard (union is big) but full containment.
    Same inverted-index shape as ``ngram_jaccard_pairs`` (shuffle on
    shingle, fan-out only on shared shingles), integer cross-multiplied
    threshold, same ``max_doc_freq`` hot-shingle guard (containment is
    then exact over the df-capped shingle space); at 100 TB set the cap
    or run it on LSH candidates, never raw on a web corpus."""
    inv, sizes = _shingle_index(df, id_col, text_col, shingle_n, max_doc_freq)
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("intersect_size"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({id_col: "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn("min_size", F.least("n_a", "n_b").cast("long"))
        .filter(
            F.col("intersect_size") * containment_den
            >= F.col("min_size") * containment_num
        )
        .withColumn(
            "containment_x10000",
            F.floor(F.col("intersect_size") * 10000 / F.col("min_size")).cast("long"),
        )
        .select("doc_a", "doc_b", "intersect_size", "min_size", "containment_x10000")
    )


def minhash_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    containment_num: int = 4,
    containment_den: int = 5,
) -> DataFrame:
    """Scale-path containment dedup: MinHash-LSH candidate pairs verified
    with EXACT containment |A∩B| / min(|A|,|B|).

    Candidate generation is the banded LSH self-join (collision-scaled,
    never |docs|²); verification is an array_intersect over just the
    candidate pairs. Note the recall caveat: LSH collisions track
    *Jaccard*, so a tiny doc buried in a huge one (high containment, low
    Jaccard) may not collide — for that regime run
    ``ngram_containment_pairs`` on a pre-blocked subset instead."""
    sh, cand = _minhash_candidates(df, id_col, text_col, num_hashes, bands, shingle_n)
    sets = sh.select(F.col(id_col), F.col("sh"))
    out = (
        cand.join(sets.withColumnsRenamed({id_col: "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sets.withColumnsRenamed({id_col: "doc_b", "sh": "sh_b"}), "doc_b")
        # long: the ×10000 scaled ratio would wrap int32 past ~214k
        # shared shingles — exactly the huge-near-dup regime this op is for
        .withColumn(
            "intersect_size", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        )
        .withColumn("min_size", F.least(F.size("sh_a"), F.size("sh_b")).cast("long"))
        .filter(
            F.col("intersect_size") * containment_den
            >= F.col("min_size") * containment_num
        )
        .withColumn(
            "containment_x10000",
            F.floor(F.col("intersect_size") * 10000 / F.col("min_size")).cast("long"),
        )
        .select("doc_a", "doc_b", "intersect_size", "min_size", "containment_x10000")
    )
    # small verified-pair output; persist so a downstream orderBy's
    # range-sampling pass reads the cache instead of re-joining
    return shared(out)


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    anchor_hex: str = "0",
    max_anchor_df: "int | None" = None,
    min_anchors: int = 1,
) -> DataFrame:
    """SPAN-level exact duplicate detection — the ExactSubstr-style
    operator (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): find the word ranges of each document whose text
    also appears verbatim in ANOTHER document, without comparing
    documents pairwise.

    Content-defined anchoring makes copies align regardless of offset
    (the winnowing/MOSS trick, Schleimer et al.): a word position is an
    ANCHOR iff ``md5(word)`` starts with ``anchor_hex`` (≈1/16 of
    positions, deterministic in any engine); each anchor fingerprints
    the ``k``-word window starting there. Two verbatim copies of a
    span share its anchors and therefore its window fingerprints.

    Shape at scale: tokenize (narrow explode) → anchor filter (keeps
    ~1/16) → ONE hash-shuffle on the window fingerprint to find
    cross-document duplicates → per-doc interval merge (one window
    over each doc's few hits). ``max_anchor_df`` drops fingerprints
    shared by more than that many anchor sites BEFORE the join-back —
    the boilerplate guard (a footer shared by a million pages is the
    whole job otherwise); the hot set is count-bounded and broadcasts
    into an anti-join, mirroring ``_cap_hot_shingles``.

    Returns (id, span_start, span_end, n_anchors): 1-based word
    positions, ``span_end`` exclusive, spans merged when their
    anchor windows touch or overlap. ``min_anchors`` filters weak
    single-anchor evidence.
    """
    from pyspark.sql import Window

    anchors = shared(_anchor_fingerprints(df, id_col, text_col, k, anchor_hex))
    dup = anchors.groupBy("__fp").agg(
        F.countDistinct(id_col).alias("__ndocs"), F.count("*").alias("__df")
    )
    dup = dup.filter(F.col("__ndocs") >= 2)
    if max_anchor_df is not None:
        dup = dup.filter(F.col("__df") <= max_anchor_df)
    hits = anchors.join(dup.select("__fp"), "__fp")
    # interval merge: window ends are monotone in pos (fixed k), so a
    # hit starts a new span iff it begins past the previous hit's end
    w = Window.partitionBy(id_col).orderBy("pos")
    grouped = hits.withColumn(
        "__new",
        F.when(
            F.lag(F.col("pos") + k).over(w).isNull()
            | (F.col("pos") > F.lag(F.col("pos") + k).over(w)),
            1,
        ).otherwise(0),
    ).withColumn("__grp", F.sum("__new").over(w))
    return (
        grouped.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
            F.count("*").alias("n_anchors"),
        )
        .filter(F.col("n_anchors") >= min_anchors)
        .select(id_col, "span_start", "span_end", "n_anchors")
    )


def _anchor_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int, anchor_hex: str
) -> DataFrame:
    """(id, pos, __fp): content-defined anchor positions (md5(word)
    prefix match — the winnowing trick that aligns copies regardless
    of offset) with the md5 fingerprint of the k-word window starting
    there. Shared front half of span-level dedup and span-level
    decontamination.

    Shape note: anchor selection and window hashing happen INSIDE the
    per-doc word array (``transform`` + ``filter``) and only the
    surviving (pos, fp) structs explode. The naive
    posexplode-then-slice formulation carries the whole word array on
    every exploded row — O(words²) bytes through the generate, which
    at 100 TB is the job. This one moves O(words·k) compute and
    O(words/16) rows."""
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), "\\s+", " ")))
    base = _widen(df.select(id_col, text_col)).select(
        F.col(id_col), F.split(norm, " ").alias("__w")
    )
    n_hex = len(anchor_hex)
    # sequence(a, b) DESCENDS when b < a — guard short docs to empty
    starts = F.when(
        F.size("__w") >= k, F.sequence(F.lit(1), F.size("__w") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    # anchor-select FIRST on the cheap single-word hash, THEN build the
    # expensive k-word window hash only at the ~1/16 surviving anchors
    anchors_only = F.filter(
        starts,
        lambda p: F.substring(F.md5(F.element_at(F.col("__w"), p)), 1, n_hex)
        == anchor_hex,
    )
    anch = F.transform(
        anchors_only,
        lambda p: F.struct(
            p.cast("int").alias("pos"),  # 1-based
            F.md5(F.concat_ws(" ", F.slice(F.col("__w"), p, F.lit(k)))).alias("__fp"),
        ),
    )
    return base.select(F.col(id_col), F.explode(anch).alias("__s")).select(
        F.col(id_col),
        F.col("__s.pos").alias("pos"),
        F.col("__s.__fp").alias("__fp"),
    )


def contaminated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_df: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    k: int = 8,
    anchor_hex: str = "",
    min_anchors: int = 1,
) -> DataFrame:
    """SPAN-level benchmark decontamination: the word ranges of each
    corpus document that appear VERBATIM in a benchmark/eval set — so
    the pipeline can EXCISE the contaminated span instead of dropping
    the whole document (the doc-level variant is
    ``functions.text.contamination_check``).

    The benchmark side is small by definition: its window fingerprints
    (same content-defined anchoring as :func:`duplicated_spans`;
    ``anchor_hex=""`` anchors every position for exhaustive recall on
    the small side) BROADCAST into a semi-join against the corpus
    anchors — the corpus never reshuffles. Returns (id, span_start,
    span_end, n_anchors), 1-based word positions, end exclusive."""
    from pyspark.sql import Window

    corpus = _anchor_fingerprints(df, id_col, text_col, k, anchor_hex)
    bench_fps = F.broadcast(
        _anchor_fingerprints(bench_df, bench_id_col, bench_text_col, k, anchor_hex)
        .select("__fp")
        .distinct()
    )
    hits = corpus.join(bench_fps, "__fp", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    grouped = hits.withColumn(
        "__new",
        F.when(
            F.lag(F.col("pos") + k).over(w).isNull()
            | (F.col("pos") > F.lag(F.col("pos") + k).over(w)),
            1,
        ).otherwise(0),
    ).withColumn("__grp", F.sum("__new").over(w))
    return (
        grouped.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
            F.count("*").alias("n_anchors"),
        )
        .filter(F.col("n_anchors") >= min_anchors)
        .select(id_col, "span_start", "span_end", "n_anchors")
    )


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "text_clean",
) -> DataFrame:
    """Rewrite documents with the given WORD RANGES removed — the fix
    step that :func:`contaminated_spans` / :func:`duplicated_spans`
    feed: excise the contaminated span, keep the document.

    ``spans`` is (id, span_start, span_end): 1-based positions over the
    normalized tokenization (whitespace-collapsed lowercase — the same
    coordinate space the span detectors emit), ``span_end`` exclusive.
    Returns one row per document that HAS spans: (id, out_col,
    words_kept, words_removed); the rebuilt text is the kept words
    joined by single spaces (fully-excised docs yield '').

    Shape at scale: spans collapse to one small array per doc (a doc
    has few spans by construction) and join the corpus on its id — a
    narrow equi-join, then a per-row array filter inside codegen. No
    explode of the corpus, no shuffle beyond the join.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").cast("long").alias("s"),
                F.col("span_end").cast("long").alias("e"),
            )
        ).alias("__spans")
    )
    norm = F.trim(F.lower(F.regexp_replace(F.col(text_col), "\\s+", " ")))
    base = _widen(df.select(id_col, text_col)).select(
        F.col(id_col), F.split(norm, " ").alias("__w")
    )
    j = base.join(per_doc, id_col)  # inner: only docs with spans change
    kept = F.filter(
        F.transform(
            F.col("__w"),
            lambda w, i: F.struct((i + 1).cast("long").alias("p"), w.alias("w")),
        ),
        lambda s: ~F.exists(
            F.col("__spans"), lambda sp: (s["p"] >= sp["s"]) & (s["p"] < sp["e"])
        ),
    )
    return j.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["w"]), " ").alias(out_col),
        F.size(kept).cast("long").alias("words_kept"),
        (F.size("__w") - F.size(kept)).cast("long").alias("words_removed"),
    )
