"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (one pass, no
index); hyperplane-LSH bucketing is the scale path — candidate sets
shrink by ~2^planes while staying fully deterministic (plane weights are
md5-derived ±1 constants computed in plain Python and inlined into the
expression, so a SQL oracle can inline the very same constants).

No Python UDFs: dot products are ``aggregate(zip_with(...))`` —
sequential left-folds in double precision inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> str:
    """Sequential double-precision dot product of two array columns.
    Left-fold order is what DuckDB's list_sum(list_transform(...)) also
    produces — bit-identical results."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_similarity_col(a: str, b: str) -> Column:
    return F.expr(
        f"({dot_expr(a, b)}) / (sqrt({dot_expr(a, a)}) * sqrt({dot_expr(b, b)}))"
    )


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    One narrow scan + a global top-k (Spark's TakeOrderedAndProject —
    per-partition heaps then a driver merge of k·partitions rows; no full
    sort, no shuffle of the data). Ordering key is (rounded cos desc,
    id) so ranking is engine-independent.
    """
    lit_vec = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in query_vec) + ")"
    scored = df.select(
        F.col(id_col),
        F.round(
            F.expr(
                f"({dot_expr(vec_col, lit_vec)}) / "
                f"(sqrt({dot_expr(vec_col, vec_col)}) * sqrt({dot_expr(lit_vec, lit_vec)}))"
            ),
            round_digits,
        ).alias("cos_sim"),
    )
    # limit(k) compiles to TakeOrderedAndProject; the rank window then
    # runs over k rows only (single tiny partition — intentional).
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))),
        )
        .select(F.col(id_col), "rank", "cos_sim")
    )


def hyperplane_signs(planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane weights: sign of bit derived from
    md5('{plane}:{dim}'). Plain-Python constants — the same numbers can
    be inlined into a SQL oracle or shipped to any engine."""
    signs = []
    for p in range(planes):
        row = []
        for d in range(dims):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) >= 8 else -1)
        signs.append(row)
    return signs


def bucket_expr(vec_col: str, signs: list[list[int]]) -> str:
    """SQL expr: LSH bucket id ('0'/'1' string, one char per plane) —
    sign of the projection of the vector onto each hyperplane."""
    chars = []
    for row in signs:
        lit = "array(" + ", ".join(f"CAST({s} AS DOUBLE)" for s in row) + ")"
        chars.append(
            f"CASE WHEN ({dot_expr(vec_col, lit)}) > 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(chars) + ")"


def ivf_dots_expr(vec_col: str, centroids: list[list[float]]) -> str:
    """SQL expr: array of dot products with each centroid (computed
    once, then reused for the argmax so the 2·nlist·dims fold doesn't
    run twice per row)."""
    dots = ", ".join(
        dot_expr(
            vec_col,
            "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + ")",
        )
        for c in centroids
    )
    return f"array({dots})"


# above this many k*dims values, centroids stop being inlined as literal
# expressions (plan size O(k*dims) — megabytes at k=4096*dims=768) and
# ride a broadcast join instead
CENTROID_LITERAL_LIMIT = 4096


def assign_cells(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    l2: bool = False,
    out_col: str = "cell",
) -> DataFrame:
    """Add ``out_col`` = 1-based index of the best centroid (argmax of
    the dot product; with ``l2`` the argmax of ``x·c − ‖c‖²/2``, i.e.
    squared-L2 argmin). Ties break to the smallest index.

    Two physically different plans with identical semantics:

    - small ``k·dims``: centroids inline as literal expressions — zero
      joins, whole plan in one projection;
    - large ``k·dims``: centroids become a one-row DataFrame holding a
      cell-ordered ``array<struct>``, attached by a **broadcast** cross
      join (single row — no row multiplication, no shuffle), and the
      argmax runs over that array column. Plan size is O(1) in k·dims;
      the data never reshuffles. Same left-fold double arithmetic, same
      first-max tie-break (``array_position`` of the max), so results
      are bit-identical to the literal path.
    """
    if sum(len(c) for c in centroids) <= CENTROID_LITERAL_LIMIT:
        if l2:
            scores = ", ".join(
                f"({dot_expr(vec_col, 'array(' + ', '.join(f'CAST({v!r} AS DOUBLE)' for v in c) + ')')})"
                f" - CAST({sum(float(v) * float(v) for v in c) / 2.0!r} AS DOUBLE)"
                for c in centroids
            )
            score_arr = f"array({scores})"
        else:
            score_arr = ivf_dots_expr(vec_col, centroids)
        return (
            df.withColumn("__ds", F.expr(score_arr))
            .withColumn(out_col, F.expr("array_position(__ds, array_max(__ds))"))
            .drop("__ds")
        )

    spark = df.sparkSession
    rows = [
        (i + 1, [float(v) for v in c], sum(float(v) * float(v) for v in c) / 2.0)
        for i, c in enumerate(centroids)
    ]
    from paimon_python_spark._localdf import local_df

    packed = (
        local_df(spark, rows, "cell int, cvec array<double>, half_sq double", max_slices=1)
        # struct sort key leads with cell, so position i+1 holds cell i+1
        # and array_position over the scores IS the cell id
        .agg(F.array_sort(F.collect_list(F.struct("cell", "cvec", "half_sq"))).alias("__cents"))
    )
    adj = " - c.half_sq" if l2 else ""
    score_arr = (
        f"transform(__cents, c -> ({dot_expr(vec_col, 'c.cvec')}){adj})"
    )
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn("__ds", F.expr(score_arr))
        .withColumn(out_col, F.expr("array_position(__ds, array_max(__ds))"))
        .drop("__ds", "__cents")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-flat approximate top-k: vectors are assigned to the nearest
    of ``nlist`` centroids; the query scans only its ``nprobe`` nearest
    cells.

    The 100 TB shape: centroids are a tiny table trained offline and
    inlined/broadcast; the cell id is a persisted, partition-prunable
    column (write the table partitioned by cell and a probe reads
    nprobe/nlist of the data — same planner path as partition pruning).
    Probe cells are computed driver-side in plain Python with the same
    left-fold double arithmetic, so an external engine agrees on the
    cells chosen.
    """
    probe = sorted(
        range(len(centroids)),
        key=lambda i: (
            -sum(float(a) * float(b) for a, b in zip(centroids[i], query_vec)),
            i,
        ),
    )[:nprobe]
    probe_cells = [i + 1 for i in probe]  # 1-based, matching array_position
    # cell id: 1-based index of the max dot product; ties break to the
    # smallest index via first-occurrence array_position — engine-
    # independent because the folds are bit-identical sequential doubles.
    # Large centroid sets ride a broadcast join instead of plan literals.
    celled = assign_cells(df, vec_col, centroids)
    return brute_force_topk(
        celled.filter(F.col("cell").isin(probe_cells)),
        id_col,
        vec_col,
        query_vec,
        k,
        round_digits,
    )


# centroid-update quantization: elements become round(x * SCALE) longs
# before summing, making the distributed sum order-free and exactly
# mirrorable by plain Python (kmeans_mirror_update)
KMEANS_SCALE = 10_000_000


def kmeans_round(x: float) -> int:
    """Python mirror of Spark's round-half-away-from-zero on doubles
    (Python's built-in round is banker's — would disagree on .5)."""
    import math

    return int(math.copysign(math.floor(abs(x * KMEANS_SCALE) + 0.5), x))


def kmeans_fit_mirror(
    vectors: list[tuple[int, list[float]]], k: int, iters: int = 5
) -> list[list[float]]:
    """Plain-Python replica of :func:`kmeans_fit` over the same rows:
    identical md5 seeding, identical sequential-double assignment
    scores, identical scaled-integer sums and driver-side divisions —
    so the trained centroids match the distributed run bit-for-bit.
    Exists so an external oracle (DuckDB + this) can check the
    iterative path; also pins kmeans_fit in tests."""
    import hashlib

    seeds = sorted(
        vectors,
        key=lambda r: (hashlib.md5(str(int(r[0])).encode()).hexdigest(), r[0]),
    )[:k]
    cents = [[float(v) for v in vec] for _id, vec in seeds]
    for _ in range(iters):
        half = [sum(c * c for c in cent) / 2.0 for cent in cents]
        sums = [[0] * len(cents[0]) for _ in range(k)]
        counts = [0] * k
        for _id, vec in vectors:
            scores = []
            for ci, cent in enumerate(cents):
                acc = 0.0
                for x, c in zip(vec, cent):
                    acc += float(x) * c
                scores.append(acc - half[ci])
            best = scores.index(max(scores))  # first-max, like array_position
            counts[best] += 1
            row = sums[best]
            for d, x in enumerate(vec):
                row[d] += kmeans_round(float(x))
        new = [list(c) for c in cents]
        for ci in range(k):
            if counts[ci]:
                new[ci] = [s / KMEANS_SCALE / counts[ci] for s in sums[ci]]
        cents = new
    return cents


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 5,
) -> list[list[float]]:
    """Distributed Lloyd's k-means: trains the IVF centroids.

    Per iteration: one narrow scan (assign each vector to its nearest
    centroid — argmax of ``x·c − ‖c‖²/2``, the squared-L2 argmin) plus
    one hash-aggregate shuffle whose payload is k·dims running sums —
    map-side combine makes the shuffle size independent of row count,
    so 5 iterations over 100 TB move ~5·k·dims·partitions doubles.
    Driver state is just the k×dims centroid matrix, re-inlined as
    literals each round (same broadcast-small-side pattern as the
    probe path).

    Init is deterministic: the k vectors with the smallest
    ``md5(id)`` — order-independent, partitioning-independent, and
    reproducible across engines (no seed to disagree on). Empty cells
    keep their previous centroid.

    The centroid update is ORDER-FREE: each element is quantized to a
    scaled integer first (``round(x·10⁷)``, a per-value op), the
    integer sums are exact under any partitioning/summation order, and
    the one float division per (cell, dim) happens driver-side — so an
    external mirror (plain Python over the same parquet values)
    reproduces the trained centroids bit-for-bit, which is what lets
    the iterative path be oracle-checked at all. The 1e-7 quantization
    is far below embedding noise.
    """
    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dims = first[0]
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(v) for v in r[1]] for r in seed_rows]
    if len(centroids) < k:
        raise ValueError(f"kmeans_fit: need >= {k} rows, have {len(centroids)}")

    sum_cols = [
        F.sum(
            F.round(F.element_at(F.col(vec_col), d + 1) * KMEANS_SCALE).cast("long")
        ).alias(f"s{d}")
        for d in range(dims)
    ] + [F.count("*").alias("n")]
    for _ in range(iters):
        # score_i = x·c_i − ‖c_i‖²/2; argmax == nearest centroid in L2;
        # literal centroids at small k·dims, broadcast join at large
        assigned = assign_cells(df, vec_col, centroids, l2=True)
        rows = assigned.groupBy("cell").agg(*sum_cols).collect()
        new = list(centroids)
        for r in rows:
            n = int(r["n"])
            new[int(r["cell"]) - 1] = [
                int(r[f"s{d}"]) / KMEANS_SCALE / n for d in range(dims)
            ]
        centroids = new
    return centroids


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: rank only vectors sharing the query's
    hyperplane-LSH bucket. With p planes the candidate set is ~n/2^p —
    the shuffle-free ANN recipe for the 100 TB case (bucket is a
    partition-prunable column when persisted)."""
    dims = len(query_vec)
    signs = hyperplane_signs(planes, dims)
    qbucket = "".join(
        "1" if sum(s * v for s, v in zip(row, query_vec)) > 0 else "0"
        for row in signs
    )
    bucketed = df.withColumn("bucket", F.expr(bucket_expr(vec_col, signs)))
    return brute_force_topk(
        bucketed.filter(F.col("bucket") == qbucket),
        id_col,
        vec_col,
        query_vec,
        k,
        round_digits,
    )


def pq_rerank_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    oversample: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage retrieval — the standard production ANN shape: the
    cheap ADC pass over compressed codes shortlists ``k·oversample``
    candidates, then the exact cosine re-ranks ONLY the shortlist
    against the raw vectors.

    At 100 TB the first stage scans the ~1%-sized codes column and the
    second touches raw embeddings for a few dozen rows (shortlist ids
    broadcast into a semi-join, so the big side never shuffles).
    Recall ≥ single-stage ADC at the same k because the exact metric
    gets the final say."""
    shortlist = pq_adc_topk(
        df, id_col, vec_col, query_vec, codebooks, k=k * oversample,
        round_digits=round_digits,
    ).select(id_col)
    cands = df.join(F.broadcast(shortlist), id_col)
    return brute_force_topk(cands, id_col, vec_col, query_vec, k, round_digits)


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: assign every embedding to
    its nearest centroid cell, then compare pairs **within a cell only**
    and report the documents that would be dropped (the higher id of
    each pair with cosine ≥ ``threshold``).

    The 100 TB shape: the all-pairs comparison is restricted to cells,
    so cost is Σ|cell|² instead of n² — with k balanced cells that is a
    k× reduction, and k grows with the corpus (SemDeDup uses k≈10⁵ for
    web scale). The cell id is the same partition-prunable column the
    IVF path persists, the self-join shuffles both sides on ``cell``
    (co-partitioned equi-join, no broadcast of the big side), and
    centroids inline or ride a broadcast exactly as in
    :func:`assign_cells`.

    Output per dropped doc: ``(id, cell, dup_of = smallest same-cell
    near-dup id, max_cos)`` — deterministic under any partitioning
    because the fold arithmetic is sequential doubles and ties
    aggregate through min/max.
    """
    from paimon_python_spark.operators._cache import shared
    from paimon_python_spark.operators._util import widen

    # norms are precomputed ONCE per vector before the self-join — the
    # pairwise stage then does a single dot fold per pair instead of
    # three (measured 3x less expression work; sqrt(a·a)*sqrt(b·b) on
    # precomputed values is bit-identical to computing them inline).
    # Persisted (scoped cache): the k centroid dot-products per vector
    # feed BOTH self-join sides — unpersisted they compute twice.
    # widen: the k-centroid assignment AND the broadcast within-cell
    # pair compare both inherit the cached frame's partitioning — a
    # single-split input would run both on one core.
    celled = shared(
        assign_cells(widen(df.select(id_col, vec_col)), vec_col, centroids).withColumn(
            "__norm", F.sqrt(F.expr(dot_expr(vec_col, vec_col)))
        ),
        eager=True,
    )
    a = celled.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = celled.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    # Σ|cell|² pairwise work can only spread across min(k, partitions)
    # tasks when keyed by cell alone — with few centroids (or one huge
    # cell) most cores idle (guide §2.5 hot-key skew; AQE skew-join
    # can't split a single key of a self-join whose cost is compute,
    # not bytes). Deterministic sub-cell salt: the a-side carries
    # salt = pmod(xxhash64(id), s), the b-side is replicated across
    # all s salts, so each (a, b) pair still meets EXACTLY once and
    # the pair set is unchanged. s = ceil(parallelism / k) — at web
    # scale (k ≈ 10⁵ ≥ cores) s = 1 and the salt vanishes, so the
    # b-side replication cost exists only where the skew does. The
    # explicit repartition pins the exchange width (AQE's byte-based
    # coalescing would otherwise serialize the dot folds — the
    # embedding-LSH finding).
    sc = df.sparkSession.sparkContext
    k = max(1, len(centroids))
    s = max(1, -(-sc.defaultParallelism // k))
    if s > 1:
        a = a.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("id_a")), F.lit(s)).cast("int")
        )
        b = b.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(s)]))
        )
        join_keys = ["cell", "__salt"]
    else:
        join_keys = ["cell"]
    a = a.repartition(sc.defaultParallelism, *join_keys)
    pairs = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cell",
            "id_a",
            "id_b",
            F.round(
                F.expr(f"({dot_expr('__va', '__vb')}) / (__na * __nb)"),
                round_digits,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return (
        pairs.groupBy(F.col("id_b").alias(id_col))
        .agg(
            F.min("cell").cast("long").alias("cell"),
            F.min("id_a").alias("dup_of"),
            F.max("cos_sim").alias("max_cos"),
        )
        .orderBy(id_col)
    )


def vector_quality_audit(
    df: DataFrame, label_col: str, vec_col: str, zero_eps: float = 1e-12
) -> DataFrame:
    """Embedding-column data-quality audit, grouped by label: vector
    counts, dimension min/max (catches ragged arrays), zero-norm
    vectors (dead embeddings), and norm min/avg/max.

    One narrow scan + one hash-aggregate on ``label`` — sketch-sized
    state per group, map-side combined, no data shuffle. Determinism:
    min/max of doubles are order-free; the average uses the
    scaled-integer-sum trick (see :func:`label_centroids`) so the one
    float division is identical in any engine."""
    norm = F.sqrt(F.expr(dot_expr(vec_col, vec_col)))
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.size(vec_col).alias("__d"),
            norm.alias("__n"),
            F.round(norm * 10000).cast("long").alias("__s"),
        )
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.min("__d").cast("long").alias("min_dims"),
            F.max("__d").cast("long").alias("max_dims"),
            F.sum(F.when(F.col("__n") < zero_eps, 1).otherwise(0))
            .cast("long")
            .alias("n_zero_norm"),
            F.round(F.min("__n"), 4).alias("min_norm"),
            F.round(F.max("__n"), 4).alias("max_norm"),
            (F.round(F.sum("__s") / F.count("*") / 10000.0, 4) + 0.0).alias(
                "avg_norm"
            ),
        )
        .orderBy("label")
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, decimals: int = 2
) -> DataFrame:
    """Per-label centroid of an embedding column, exploded to one row
    per ``(label, dim)``.

    ``posexplode`` is map-only; the single shuffle aggregates on the
    compound ``(label, dim)`` key, which is naturally high-cardinality
    (labels x dims) and therefore skew-free even when one label
    dominates the corpus — a plain ``groupBy(label)`` with an array
    average UDF would concentrate each label on one task instead.
    Determinism: naive ``avg(float)`` is summation-order-dependent, so
    a parallel Spark sum and a sequential single-node sum can round to
    different values at a half boundary. Instead each element is
    rounded to a scaled integer FIRST (per-value op, order-free), the
    integer sum is exact, and the final average is one identical IEEE
    division in any engine.
    """
    scaled = F.round(F.col("v") * 10000).cast("long")
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v"),
        )
        .groupBy("label", "dim")
        .agg(
            F.sum(scaled).alias("sum_s"),
            F.count("*").alias("n_vectors"),
        )
        .select(
            "label",
            "dim",
            # + 0.0 normalizes IEEE negative zero (-0.0 and 0.0 compare
            # equal but stringify differently across engines)
            (
                F.round(F.col("sum_s") / F.col("n_vectors") / 10000.0, decimals) + 0.0
            ).alias("centroid_v"),
            "n_vectors",
        )
    )


# --- Product quantization (PQ) -------------------------------------------
#
# The memory-compression ANN path: each vector is split into M subspaces
# and every subvector is replaced by the id of its nearest codebook
# entry — 64 floats become M small ints. Search uses asymmetric distance
# computation (ADC): the query precomputes an M×K lookup table of
# subspace distances, and a row's approximate distance is M table
# lookups + a fixed-order sum. At 100 TB the codes column is ~1% of the
# vector column and scans/ranks without touching the raw embeddings.


def pq_codebooks_from_rows(vectors: list[list[float]], m: int) -> list[list[list[float]]]:
    """Split ``len(vectors)`` seed vectors into ``m`` equal subspaces:
    codebooks[s][j] = subvector of seed j in subspace s. Deterministic,
    data-driven seeds (production would train with k-means per
    subspace — same shape, same consumers)."""
    dims = len(vectors[0])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    sub = dims // m
    return [
        [[float(v) for v in vec[s * sub : (s + 1) * sub]] for vec in vectors]
        for s in range(m)
    ]


def _sub_l2_expr(vec_col: str, start: int, entry: list[float]) -> str:
    """Sequential-fold squared L2 between vec[start:start+len] and a
    literal codebook entry (1-based slice start)."""
    lit = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in entry) + ")"
    return (
        f"aggregate(zip_with(slice({vec_col}, {start}, {len(entry)}), {lit}, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    out_col: str = "pq_codes",
) -> DataFrame:
    """Add ``out_col``: array of 1-based nearest-codebook-entry ids, one
    per subspace (squared-L2 argmin, first-occurrence tie-break). All
    literal expressions inside whole-stage codegen; at K·dims beyond the
    literal budget the codebooks would ride a broadcast like
    assign_cells.

    The per-subspace distance arrays are materialized once behind a
    Generate barrier (``inline(array(named_struct(...)))`` — the same
    CollapseProject guard as functions.text.lang_id) so the argmin's two
    references don't re-run the M·K fold expressions."""
    sub = len(codebooks[0][0])
    struct_fields = ", ".join(
        f"'__pq{s}', array("
        + ", ".join(_sub_l2_expr(vec_col, s * sub + 1, e) for e in book)
        + ")"
        for s, book in enumerate(codebooks)
    )
    arred = df.select(
        "*", F.expr(f"inline(array(named_struct({struct_fields})))")
    )
    codes = ", ".join(
        f"array_position(__pq{s}, array_min(__pq{s}))" for s in range(len(codebooks))
    )
    return arred.withColumn(out_col, F.expr(f"array({codes})")).drop(
        *[f"__pq{s}" for s in range(len(codebooks))]
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """ADC top-k over PQ codes: driver precomputes the M×K table of
    subspace distances to the query (plain-Python doubles any engine
    reproduces), each row sums M ``element_at`` lookups in fixed
    subspace order, global top-k via TakeOrderedAndProject. Ordering key
    is (rounded dist asc, id) — engine-independent."""
    sub = len(codebooks[0][0])
    lut = [
        [
            sum(
                (float(q) - float(c)) * (float(q) - float(c))
                for q, c in zip(query_vec[s * sub : (s + 1) * sub], entry)
            )
            for entry in book
        ]
        for s, book in enumerate(codebooks)
    ]
    from paimon_python_spark.operators._util import widen

    # the ADC encode+score pass is heavy per-row JVM expression work
    # (M subspace argmins over the vector array); a single-split input
    # runs it one-task-wide — fan out by input bytes (no-op at lake
    # scale where the codes column arrives in many splits)
    encoded = pq_encode(widen(df.select(id_col, vec_col)), vec_col, codebooks)
    terms = [
        "element_at(array("
        + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in lut[s])
        + f"), CAST(element_at(pq_codes, {s + 1}) AS INT))"
        for s in range(len(codebooks))
    ]
    scored = encoded.select(
        F.col(id_col),
        F.round(F.expr(" + ".join(terms)), round_digits).alias("adc_dist"),
    )
    return (
        scored.orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("adc_dist").asc(), F.col(id_col))
            ),
        )
        .select(F.col(id_col), "rank", "adc_dist")
    )


def prototypicality(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    round_digits: int = 6,
) -> DataFrame:
    """Per-vector prototypicality: cosine to the centroid of the cell
    the vector is assigned to (dot-argmax assignment, as everywhere in
    the IVF/SemDeDup family). Low scores mark outliers — vectors far
    from every prototype — the SemDeDup-style pruning signal for
    removing unrepresentative or noisy embeddings.

    One projection: the dot array is computed once, the cell indexes
    into it, the centroid norms are Python-float literals any engine
    reproduces. Output adds ``cell`` and ``proto`` (rounded)."""
    import math

    dots = ivf_dots_expr(vec_col, centroids)
    cnorms = "array(" + ", ".join(
        f"CAST({math.sqrt(sum(float(v) * float(v) for v in c))!r} AS DOUBLE)"
        for c in centroids
    ) + ")"
    return (
        df.withColumn("__ds", F.expr(dots))
        .withColumn("cell", F.expr("array_position(__ds, array_max(__ds))"))
        .withColumn(
            "proto",
            F.round(
                F.expr(
                    f"element_at(__ds, CAST(cell AS INT)) / "
                    f"(sqrt({dot_expr(vec_col, vec_col)}) * "
                    f"element_at({cnorms}, CAST(cell AS INT)))"
                ),
                round_digits,
            ),
        )
        .drop("__ds")
    )


def hyperplane_buckets_matmul(
    df, id_col: str, vec_col: str, signs: list, planes: int
):
    """SCALE-PATH bucket assignment: one Arrow-batched numpy matmul per
    batch ((n, dims) @ (dims, tables*planes)) instead of tables*planes
    interpreted expression folds per row — same ±1 hyperplanes, output
    exploded to (id, tbl, bucket) like the expression path.

    Float caveat, stated plainly: numpy sums in a different order than
    the sequential SQL fold, so a projection EXACTLY at 0.0 could flip
    a bucket bit vs the oracle-checked expression path. Deliberate
    trade for ~dims× less interpreter overhead at billion-vector scale;
    the expression path remains the default and the gate."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    S = np.asarray(signs, dtype=np.float64).T  # (dims, tables*planes)
    tables = S.shape[1] // planes
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bucket", T.StringType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy())  # (n, dims)
            bits = (vecs @ S) > 0  # (n, tables*planes)
            n = len(pdf)
            ids = np.repeat(pdf[id_col].to_numpy(), tables)
            tbls = np.tile(np.arange(tables, dtype=np.int32), n)
            chars = np.where(bits, "1", "0").reshape(n, tables, planes)
            buckets = [
                "".join(chars[i, t])
                for i in range(n)
                for t in range(tables)
            ]
            yield pd.DataFrame({id_col: ids, "tbl": tbls, "bucket": buckets})

    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(assign, out_schema)
    )


def assign_cells_matmul(
    df,
    id_col: str,
    vec_col: str,
    centroids: list,
    l2: bool = False,
    out_col: str = "cell",
):
    """SCALE-PATH IVF cell assignment: one Arrow-batched numpy matmul
    per batch ((n, dims) @ (dims, k)) with the same argmax/tie-break as
    :func:`assign_cells` — ~k× less interpreter overhead than the
    expression folds at billion-vector scale. Same float caveat as
    :func:`hyperplane_buckets_matmul`: numpy sums in a different order,
    so a vector EXACTLY equidistant between two centroids could pick
    the other one; the expression path stays the oracle default."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)  # (k, dims)
    bias = -0.5 * (C * C).sum(axis=1) if l2 else 0.0
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out_col, T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy())
            scores = vecs @ C.T + bias
            cells = scores.argmax(axis=1).astype(np.int32) + 1  # 1-based
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: cells})

    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(assign, out_schema)
    )
