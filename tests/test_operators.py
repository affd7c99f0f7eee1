"""Extension-operator suite: dedup / similarity / text / multimodal over
the driver testdata at sf0.001 (full oracle checks run via
tools/check_oracle.py at sf0.01; these tests pin semantics and the
mapInPandas plumbing that has no SQL oracle)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_groups(spark):
    from paimon_python_spark.operators import exact_dedup

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id long, text string"
    )
    out = exact_dedup(df, on=["text"], id_col="id").orderBy("keep_id").collect()
    assert [(r.keep_id, r.n_copies) for r in out] == [(1, 2), (3, 1)]


def test_minhash_lsh_finds_near_dups(spark):
    from paimon_python_spark.operators import minhash_lsh_pairs

    # high-similarity pair (1 word of 40 changed → Jaccard ≈ 0.93: a band
    # collision is near-certain; LSH recall is probabilistic below ~0.8)
    base = " ".join(f"w{i}" for i in range(40))
    near = base.replace("w39", "changed")
    far = "completely different words about spark window aggregation pipelines here"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(df, "doc_id", "text", jaccard_num=1, jaccard_den=2)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_ngram_jaccard_symmetric_threshold(spark):
    from paimon_python_spark.operators import ngram_jaccard_pairs

    a = "w1 w2 w3 w4 w5 w6"
    df = spark.createDataFrame([(1, a), (2, a), (3, "z1 z2 z3 z4")],
                               "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, "doc_id", "text").collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    assert pairs[0].intersect_size == pairs[0].union_size  # identical docs


def test_simhash_identical_docs_equal(spark):
    from paimon_python_spark.operators import simhash_fingerprints

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert len(fps[1]) == 16 and set(fps[1]) <= {"0", "1"}


def test_brute_force_topk_self_similarity(spark, emb):
    from paimon_python_spark.operators import brute_force_topk

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).head()["embedding"]]
    # query vector included → rank 1 must be the vector itself, cos 1.0
    out = brute_force_topk(emb, "vec_id", "embedding", qvec, k=5).collect()
    assert out[0].vec_id == 1
    assert out[0].cos_sim == pytest.approx(1.0, abs=1e-6)
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_lsh_bucket_subset_of_brute_force_order(spark, emb):
    from paimon_python_spark.operators import brute_force_topk, lsh_bucket_topk

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    brute = [r.vec_id for r in brute_force_topk(rest, "vec_id", "embedding", qvec, k=50).collect()]
    lsh = [r.vec_id for r in lsh_bucket_topk(rest, "vec_id", "embedding", qvec, k=10, planes=2).collect()]
    # LSH results are genuine vectors ranked consistently with brute force
    assert lsh, "bucket should not be empty with 2 planes"
    brute_pos = {v: i for i, v in enumerate(brute)}
    pos = [brute_pos[v] for v in lsh if v in brute_pos]
    assert pos == sorted(pos)


def test_text_stats_integer_math(spark):
    from paimon_python_spark.functions import text_stats

    df = spark.createDataFrame([(1, "aa bb aa")], "doc_id long, text string")
    row = text_stats(df, "doc_id", "text").head()
    assert row.n_words == 3
    assert row.n_chars == 8
    assert row.n_distinct_words == 2
    assert row.avg_word_len_x100 == 200
    assert row.distinct_pct == 66
    assert not row.quality_ok  # fewer than 5 words


def test_lang_id_markers(spark):
    from paimon_python_spark.functions import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is a pet"),
            (2, "der hund und die katze ist"),
            (3, "xyzzy plugh quux"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_fingerprint_normalizes_whitespace(spark):
    from paimon_python_spark.functions import doc_fingerprints

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in doc_fingerprints(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_binary_metadata_and_sniff(spark):
    from paimon_python_spark.functions import binary_metadata

    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0rest")), (2, bytearray(b"plain"))],
        "id long, payload binary",
    )
    out = {r.id: r for r in binary_metadata(df, "id", "payload").collect()}
    assert out[1].mime_sniffed == "image/jpeg"
    assert out[2].mime_sniffed == "application/octet-stream"
    assert out[2].n_bytes == 5
    assert len(out[2].sha256) == 64


def test_image_features_real_decode(spark):
    """REAL decode through the distributed path: encode known pixel
    arrays (BMP and PNG), run the mapInPandas decoder, and check the
    features against the arrays themselves."""
    import numpy as np

    from paimon_python_spark.functions import (
        encode_bmp,
        encode_png,
        image_features,
    )

    rng = np.random.RandomState(3)
    a1 = rng.randint(0, 256, (10, 7, 3)).astype(np.uint8)   # BMP, padded rows
    a2 = rng.randint(0, 256, (5, 8, 3)).astype(np.uint8)    # PNG RGB
    a3 = rng.randint(0, 256, (6, 6, 1)).astype(np.uint8)    # PNG gray
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(a1))),
            (2, bytearray(encode_png(a2))),
            (3, bytearray(encode_png(a3))),
        ],
        "id long, img binary",
    )
    out = {r.id: r for r in image_features(df, "id", "img").collect()}
    for i, arr in ((1, a1), (2, a2), (3, a3)):
        h, w, ch = arr.shape
        assert (out[i].width, out[i].height, out[i].channels) == (w, h, ch)
        assert out[i].sum_intensity == int(arr.sum())
        assert abs(out[i].mean_intensity - arr.mean()) < 1e-9


def test_resize_image_real_nearest_neighbor(spark):
    """Resize output must equal the numpy NN reference exactly, and the
    re-encoded BMP must decode back to those pixels."""
    import numpy as np

    from paimon_python_spark.functions import decode_bmp, encode_bmp, resize_image

    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, (40, 60, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(arr)))], "id long, img binary"
    )
    row = resize_image(df, "id", "img", target_w=30, target_h=20).collect()[0]
    s = min(30 * 1000 // 60, 20 * 1000 // 40)
    w2, h2 = 60 * s // 1000, 40 * s // 1000
    assert (row.in_w, row.in_h, row.out_w, row.out_h) == (60, 40, w2, h2)
    ys = (np.arange(h2) * 40) // h2
    xs = (np.arange(w2) * 60) // w2
    expect = arr[ys][:, xs]
    assert row.out_sum == int(expect.sum())
    assert (decode_bmp(bytes(row.resized)) == expect).all()


def test_decode_image_jpeg_clearly_unsupported(spark):
    from paimon_python_spark.functions import decode_image_bytes

    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image_bytes(b"\xff\xd8\xff\xe0notajpeg")


def test_frame_sample_stub_fanout(spark):
    from paimon_python_spark.functions import frame_sample_stub

    df = spark.createDataFrame(
        [(1, bytearray(b"v" * 1000)), (2, bytearray(b"w" * 100))],
        "id long, video binary",
    )
    out = frame_sample_stub(df, "id", "video", every_nth=5).collect()
    per_id = {}
    for r in out:
        per_id.setdefault(r.id, []).append(r.frame_idx)
    assert per_id[1] == [0, 5]  # 10 frames, every 5th
    assert per_id[2] == [0]


def test_embedding_cosine_pairs_threshold(spark):
    from paimon_python_spark.operators import embedding_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = embedding_cosine_pairs(df, "vec_id", "embedding", threshold=0.99).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_group_distinct_sketch_within_rsd(spark):
    from paimon_python_spark.functions import group_distinct_sketch

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    approx = {
        r.l_returnflag: r.approx_distinct
        for r in group_distinct_sketch(li, ["l_returnflag"], "l_orderkey").collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.15 * n), (k, approx[k], n)


def test_quantile_summary_exact(spark):
    import numpy as np

    from paimon_python_spark.functions import quantile_summary

    df = spark.createDataFrame([(1, float(v)) for v in range(101)], "g int, x double")
    row = quantile_summary(df, ["g"], "x", (0.5, 0.9)).collect()[0]
    assert row.p50 == round(float(np.percentile(range(101), 50)), 2)
    assert row.p90 == round(float(np.percentile(range(101), 90)), 2)


def test_numeric_histogram_counts_and_clamp(spark):
    from paimon_python_spark.functions import numeric_histogram

    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 150.0]], "x double"
    )
    out = {r.bucket: (r.lo, r.n) for r in numeric_histogram(df, "x", 0.0, 100.0, 10).collect()}
    assert out[0] == (0.0, 3)   # -5 clamps in, 0.0 and 9.9 in-range
    assert out[1] == (10.0, 1)
    assert out[2] == (20.0, 1)
    assert out[9] == (90.0, 2)  # 99 in-range, 150 clamps into top bucket
    assert sum(n for _, n in out.values()) == 7


def test_hash_sample_deterministic_and_partition_invariant(spark):
    from paimon_python_spark.operators import hash_sample

    df = spark.range(2000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_sample(df, "k", 0.25).collect())
    b = sorted(r.k for r in hash_sample(df.repartition(13), "k", 0.25).collect())
    assert a == b  # same subset under any partitioning
    assert 0.18 < len(a) / 2000 < 0.32
    # growth-stable: the 0..999 subset of the big sample == sampling 0..1000
    small = sorted(r.k for r in hash_sample(spark.range(1000).withColumnRenamed("id", "k"), "k", 0.25).collect())
    assert [k for k in a if k < 1000] == small
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 2000  # 'g' threshold keeps all


def test_train_val_test_split_assignment(spark):
    from paimon_python_spark.operators import train_val_test_split

    df = spark.range(5000).withColumnRenamed("id", "k")
    counts = {
        r.split: r.n
        for r in train_val_test_split(df, "k").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 5000
    assert 0.75 < counts["train"] / 5000 < 0.85
    # every row gets exactly one split and it is stable across calls
    again = {
        r.split: r.n
        for r in train_val_test_split(df, "k").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert counts == again


def test_stratified_hash_sample_fractions(spark):
    from paimon_python_spark.operators import stratified_hash_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_hash_sample(df, "k", ["s"], {"a": 1.0, "b": 0.1})
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 2000          # fraction 1.0 keeps every row
    assert 100 < counts.get("b", 0) < 320
    with pytest.raises(ValueError, match="one stratum"):
        stratified_hash_sample(df, "k", ["s", "k"], {})


def test_kmeans_fit_recovers_separated_clusters(spark):
    from paimon_python_spark.operators import kmeans_fit

    # three well-separated 4-d clusters
    import itertools

    rows = []
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0]]
    i = 0
    for cx, off in itertools.product(range(3), [-0.5, -0.25, 0.0, 0.25, 0.5]):
        vec = [v + (off if d == cx else 0.0) for d, v in enumerate(centers[cx])]
        rows.append((i, vec))
        i += 1
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = kmeans_fit(df, "id", "vec", k=3, iters=6)
    # every true center is ~matched by one learned centroid
    for c in centers:
        best = min(sum((a - b) ** 2 for a, b in zip(c, g)) for g in got)
        assert best < 1.0, (c, got)
    # deterministic: same input -> same centroids, regardless of partitioning
    again = kmeans_fit(df.repartition(7), "id", "vec", k=3, iters=6)
    for a, b in zip(got, again):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))


def test_kmeans_fit_feeds_ivf(spark, emb):
    from paimon_python_spark.operators import ivf_topk, kmeans_fit

    df = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = kmeans_fit(df, "vec_id", "v", k=4, iters=3)
    assert len(cents) == 4 and len(cents[0]) == 64
    q = [float(v) for v in df.select("v").first()[0]]
    out = ivf_topk(df, "vec_id", "v", q, cents, k=5, nprobe=2).collect()
    assert len(out) == 5
    assert out[0].cos_sim >= out[-1].cos_sim


def test_connected_components_chain_and_clique(spark):
    from paimon_python_spark.operators import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r.node: r.cluster
        for r in connected_components(pairs, "doc_a", "doc_b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_nonconvergence_raises_and_warns(spark):
    from paimon_python_spark.operators import connected_components
    from paimon_python_spark.operators.dedup import ConvergenceError

    # pointer jumping covers ~2^r nodes in r rounds, so a 400-node
    # chain (diameter 399) cannot converge in 2 rounds...
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 400)], "doc_a long, doc_b long"
    )
    with pytest.raises(ConvergenceError, match="did not converge"):
        connected_components(chain, "doc_a", "doc_b", max_iter=2, strict=True)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(chain, "doc_a", "doc_b", max_iter=2).collect()
    # ...but converges EXACTLY in O(log D) rounds — 12 suffice for
    # diameter 399 (min-label alone would need 399)
    got = {
        r.node: r.cluster
        for r in connected_components(chain, "doc_a", "doc_b", max_iter=12).collect()
    }
    assert got == {i: 1 for i in range(1, 401)}


def test_release_cached_empties_persistent_rdds(spark, docs):
    from paimon_python_spark.operators import minhash_lsh_pairs, ngram_jaccard_pairs
    from paimon_python_spark.operators._cache import release_cached

    release_cached()  # clean slate from earlier tests
    # assert on the DataFrame CacheManager (localCheckpoint blocks from
    # other tests live outside it and are GC'd asynchronously)
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty()
    minhash_lsh_pairs(docs, "doc_id", "text").count()
    ngram_jaccard_pairs(docs.limit(50), "doc_id", "text", max_doc_freq=40).count()
    assert not cache_mgr.isEmpty()
    assert release_cached() >= 2
    assert cache_mgr.isEmpty()


def test_cache_scope_isolates_interleaved_pipelines(spark, docs):
    """r5 advisor: two interleaved pipelines must not release each
    other's persisted frames. A scope releases ONLY what was registered
    inside it; the outer pipeline's frame stays cached and its result
    is still correct afterwards."""
    from paimon_python_spark.operators import cache_scope, minhash_lsh_pairs
    from paimon_python_spark.operators._cache import _current, release_cached

    release_cached()  # clean slate from earlier tests
    outer = minhash_lsh_pairs(docs, "doc_id", "text")
    outer_frames = list(_current())
    assert outer_frames
    outer_n = outer.count()  # populate outer's cache
    with cache_scope():
        inner = minhash_lsh_pairs(docs.limit(40), "doc_id", "text")
        inner.count()
        assert _current() and _current() is not outer_frames
    # inner scope exit released inner frames only
    assert all(f.storageLevel.useMemory or f.storageLevel.useDisk for f in outer_frames)
    assert outer.count() == outer_n
    assert release_cached() >= 1
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert cache_mgr.isEmpty()


def test_fuzzy_dedup_survivors(spark):
    from paimon_python_spark.operators import fuzzy_dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r.doc_id
        for r in fuzzy_dedup_survivors(docs, pairs, "doc_id").collect()
    )
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; 4 and 7 untouched
    assert kept == [1, 4, 5, 7]


def test_scrub_pii_counts_and_masks(spark):
    from paimon_python_spark.functions import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob@x.org or call 555-123-4567"),
            (2, "server 192.168.0.1 is fine"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(df, "doc_id", "text").collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 0)
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 0, 1)
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)
    assert out[3].masked_len == len("no pii here")
    assert out[1].masked_len == len("mail me at <EMAIL> or call <PHONE>")


def test_tfidf_top_terms_ranks_rare_terms(spark):
    from paimon_python_spark.functions import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common cherry date date date"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 'apple' (tf=2, df=1) must outrank 'common' (df=3)
    assert by_doc[1][0].term == "apple"
    assert by_doc[1][0].tf == 2 and by_doc[1][0].df == 1
    # every doc got exactly k rows and ranks are 1..k
    for rows in by_doc.values():
        assert [r.term_rank for r in rows] == [1, 2]
    # idf of a term present in all docs is ln(4/4)=0 -> tfidf 0
    common = [r for r in out if r.term == "common"]
    assert all(r.tfidf == 0.0 for r in common)


def test_top_ngrams_counts_and_short_docs(spark):
    from paimon_python_spark.functions import top_ngrams

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "solo")],
        ["doc_id", "text"],
    )
    out = top_ngrams(docs, "text", n=2, k=10).collect()
    freqs = {r.ngram: r.freq for r in out}
    assert freqs["the cat"] == 2
    assert freqs["cat sat"] == 1
    # the single-word doc contributes nothing (no reversed-sequence blowup)
    assert "solo" not in " ".join(freqs)
    # deterministic ordering: freq desc then ngram asc
    assert out[0].ngram == "the cat"


def test_label_centroids_exact_and_orderfree(spark):
    from paimon_python_spark.operators import label_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, -10.0])],
        ["label", "embedding"],
    )
    out = {(r.label, r.dim): r for r in label_centroids(df, "label", "embedding").collect()}
    assert out[(0, 0)].centroid_v == 2.0 and out[(0, 1)].centroid_v == 3.0
    assert out[(1, 0)].centroid_v == 10.0 and out[(1, 1)].centroid_v == -10.0
    assert out[(0, 0)].n_vectors == 2 and out[(1, 0)].n_vectors == 1
    # negative zero is normalized (the -0.0 vs 0.0 cross-engine trap)
    z = label_centroids(
        spark.createDataFrame([(0, [-0.0001]), (0, [0.0])], ["label", "embedding"]),
        "label",
        "embedding",
    ).collect()[0]
    assert str(z.centroid_v) == "-0.0" or z.centroid_v == 0.0


def test_assign_cells_broadcast_matches_literal_path(spark, monkeypatch):
    """At large k*dims, centroid assignment must switch from plan
    literals (O(k*dims) plan size) to a broadcast join (O(1) plan size)
    with bit-identical results."""
    import paimon_python_spark.operators.similarity as sim

    # 200 vectors, 256 centroids, dims 32 -> k*dims = 8192 > default limit
    dims, k = 32, 256
    vecs = [
        (i, [float((i * 31 + d * 7) % 17) - 8.0 for d in range(dims)])
        for i in range(200)
    ]
    cents = [[float((c * 13 + d * 3) % 19) - 9.0 for d in range(dims)] for c in range(k)]
    df = spark.createDataFrame(vecs, "id long, vec array<double>")

    monkeypatch.setattr(sim, "CENTROID_LITERAL_LIMIT", 10**9)
    lit = sim.assign_cells(df, "vec", cents, l2=True)
    lit_plan = lit._jdf.queryExecution().executedPlan().toString()
    lit_rows = {r["id"]: r["cell"] for r in lit.select("id", "cell").collect()}

    monkeypatch.setattr(sim, "CENTROID_LITERAL_LIMIT", 0)
    bc = sim.assign_cells(df, "vec", cents, l2=True)
    bc_plan = bc._jdf.queryExecution().executedPlan().toString()
    bc_rows = {r["id"]: r["cell"] for r in bc.select("id", "cell").collect()}

    assert bc_rows == lit_rows
    assert "Broadcast" in bc_plan  # centroids ride a broadcast join
    assert "Broadcast" not in lit_plan
    # the broadcast plan must not embed the centroid matrix as literals
    assert len(bc_plan) < len(lit_plan) / 4


def test_ivf_topk_large_k_uses_broadcast(spark, emb, monkeypatch):
    """End-to-end: ivf_topk at k over the literal limit plans a
    broadcast join and still returns a valid ranked top-k."""
    import paimon_python_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "CENTROID_LITERAL_LIMIT", 0)
    df = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = [float(v) for v in df.select("v").first()[0]]
    cents = [[1.0 if d == c % 64 else 0.0 for d in range(64)] for c in range(8)]
    out = sim.ivf_topk(df, "vec_id", "v", q, cents, k=5, nprobe=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0].cos_sim >= rows[-1].cos_sim


def test_repetition_stats_detects_loops(spark):
    from paimon_python_spark.functions import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),     # one distinct 3-gram
            (2, "all words here are fully distinct"), # no repeats
            (3, "a b"),                                # shorter than n
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_grams"] == 4 and out[1]["n_dup_grams"] == 3
    assert out[1]["dup_ratio_x10000"] == 7500
    assert out[2]["n_dup_grams"] == 0 and out[2]["dup_ratio_x10000"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["dup_ratio_x10000"] == 0


def test_composite_quality_filter_reason_bits(spark):
    from paimon_python_spark.functions import (
        QF_BAD_LENGTH,
        QF_NO_STOPWORDS,
        QF_TOO_FEW_WORDS,
        composite_quality_filter,
    )

    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "green hills in the morning light while birds sing softly above"
    )
    df = spark.createDataFrame(
        [
            (1, good),  # passes every rule
            (2, "x y z"),  # too few words + too short + no stopwords
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in composite_quality_filter(df, "doc_id", "text").collect()}
    assert out[1]["keep"] is True and out[1]["reasons"] == 0
    assert out[2]["keep"] is False
    assert out[2]["reasons"] & QF_TOO_FEW_WORDS
    assert out[2]["reasons"] & QF_BAD_LENGTH
    assert out[2]["reasons"] & QF_NO_STOPWORDS


def test_contamination_check_overlap_and_short_docs(spark):
    from paimon_python_spark.functions import contamination_check

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark's first 5-gram exactly
            (1, "alpha beta gamma delta epsilon other words here"),
            # no overlap
            (2, "one two three four five six seven"),
            # too short for any 5-gram
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in contamination_check(docs, bench, "doc_id", "text", n=5).collect()
    }
    assert out[1].n_contaminated == 1 and out[1].n_grams == 4
    assert out[1].contamination_x10000 == 2500
    assert out[2].n_contaminated == 0
    assert out[3].n_grams == 0 and out[3].contamination_x10000 == 0


def test_corpus_overlap_exact_jaccard(spark):
    from paimon_python_spark.functions import corpus_overlap

    docs = spark.createDataFrame(
        [
            ("a", "one two three four five six"),      # grams: 2
            ("a", "alpha beta gamma delta epsilon"),   # grams: 1
            ("b", "one two three four five"),          # shares 1 with a
            ("b", "x y z w v u"),                      # grams: 2
            ("c", "tiny"),                             # no 5-grams
        ],
        "source string, text string",
    )
    out = {
        (r.src_a, r.src_b): r
        for r in corpus_overlap(docs, "source", "text", n=5).collect()
    }
    assert set(out) == {("a", "b")}  # c has no grams; zero pairs omitted
    r = out[("a", "b")]
    assert r.shared_grams == 1 and r.grams_a == 3 and r.grams_b == 3
    assert r.jaccard_x10000 == 2000  # 1 / (3 + 3 - 1)


def test_contamination_bloom_bit_identical_even_with_tiny_bitset(spark):
    """The two-phase bloom operator must equal the one-phase join
    exactly: a deliberately TINY bitset (64 bits for dozens of grams)
    makes nearly every probe a false positive, so this asserts the
    confirm-join culls them all — exactness never depends on bloom
    sizing, only the join-input volume does."""
    from paimon_python_spark.functions import (
        contamination_check,
        contamination_check_bloom,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
            for i in range(30)
        ]
        + [(98, "short doc"), (99, "")],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id % 5 = 0")
    base = sorted(
        map(tuple, contamination_check(docs, bench, "doc_id", "text", n=5).collect())
    )
    for bits in (64, 1 << 14):
        got = sorted(
            map(
                tuple,
                contamination_check_bloom(
                    docs, bench, "doc_id", "text", n=5, bitset_bits=bits
                ).collect(),
            )
        )
        assert got == base
    with pytest.raises(ValueError, match="power of two"):
        contamination_check_bloom(
            docs, bench, "doc_id", "text", bitset_bits=100
        )


def test_pack_concat_chunks_offsets_and_spans(spark):
    from paimon_python_spark.operators import pack_concat_chunks

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "a", 100), (10, "b", 600)],
        "id long, stream string, toks int",
    )
    out = {
        r.id: r
        for r in pack_concat_chunks(df, "id", "toks", 256, "stream").collect()
    }
    # stream a: offsets 0,100,200; doc 2 crosses no boundary, doc 3 does
    assert (out[1].offset, out[1].first_chunk, out[1].last_chunk) == (0, 0, 0)
    assert (out[2].offset, out[2].first_chunk, out[2].last_chunk) == (100, 0, 0)
    assert (out[3].offset, out[3].first_chunk, out[3].last_chunk) == (200, 0, 1)
    assert out[3].n_chunks_spanned == 2
    # stream b independent; 600 tokens span chunks 0..2
    assert (out[10].offset, out[10].first_chunk, out[10].last_chunk) == (0, 0, 2)


def test_weighted_mix_sample_rates_and_determinism(spark):
    from paimon_python_spark.operators import weighted_mix_sample

    rows = [(i, "hi" if i % 2 == 0 else "lo") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = weighted_mix_sample(df, "id", "grp", {"hi": 1.0, "lo": 0.0}, 0.5)
    got = out.groupBy("grp").agg(F.sum(F.col("keep").cast("int")).alias("k")).collect()
    k = {r.grp: r.k for r in got}
    assert k["hi"] == 200  # rate 1.0 keeps everything
    assert k["lo"] == 0  # rate 0.0 keeps nothing
    # determinism under repartition
    again = weighted_mix_sample(
        df.repartition(7), "id", "grp", {"hi": 1.0, "lo": 0.0}, 0.5
    )
    assert again.filter("keep").count() == 200


def test_ngram_containment_pairs_subset_doc(spark):
    from paimon_python_spark.operators import ngram_containment_pairs

    big = " ".join(f"w{i}" for i in range(30))
    subset = " ".join(f"w{i}" for i in range(10))  # fully contained in big
    other = "totally different words about engines and pipelines again ok"
    df = spark.createDataFrame(
        [(1, big), (2, subset), (3, other)], "doc_id long, text string"
    )
    out = ngram_containment_pairs(
        df, "doc_id", "text", shingle_n=3, containment_num=4, containment_den=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_x10000 == 10000  # full containment


def test_minhash_containment_matches_exact_on_near_dups(spark):
    from paimon_python_spark.operators import (
        minhash_containment_pairs,
        ngram_containment_pairs,
    )

    base = " ".join(f"w{i}" for i in range(40))
    near = base.replace("w39", "changed")  # high Jaccard -> LSH collides
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, "unrelated words entirely here ok now")],
        "doc_id long, text string",
    )
    lsh = minhash_containment_pairs(
        df, "doc_id", "text", containment_num=4, containment_den=5
    ).collect()
    exact = ngram_containment_pairs(
        df, "doc_id", "text", containment_num=4, containment_den=5
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in lsh} == {(1, 2)}
    got = {(r.doc_a, r.doc_b, r.intersect_size, r.min_size, r.containment_x10000) for r in lsh}
    want = {(r.doc_a, r.doc_b, r.intersect_size, r.min_size, r.containment_x10000) for r in exact}
    assert got == want


def test_unigram_surprisal_rare_words_score_higher(spark):
    from paimon_python_spark.functions import unigram_surprisal

    # 'common' appears 8x in the corpus, 'rare' once
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rare"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_surprisal(df, "doc_id", "text").collect()}
    # corpus_n=8, n_common=7, n_rare=1
    # surprisal(common) = floor(log2(8//7)) = 0; surprisal(rare) = log2(8) = 3
    assert out[1].total_surprisal == 0
    assert out[2].total_surprisal == 3
    assert out[2].avg_surprisal_x100 == 75  # 3*100/4
    assert out[1].n_words == 4 and out[2].n_words == 4


def test_pq_encode_codes_and_self_seeding(spark, emb):
    from paimon_python_spark.operators import pq_codebooks_from_rows, pq_encode

    seeds = [
        [float(x) for x in r.embedding]
        for r in emb.filter("vec_id between 1 and 16").orderBy("vec_id").collect()
    ]
    books = pq_codebooks_from_rows(seeds, 8)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    coded = pq_encode(
        emb.select("vec_id", "embedding"), "embedding", books
    )
    rows = {r.vec_id: list(r.pq_codes) for r in coded.collect()}
    # every code is a valid 1-based entry id
    assert all(1 <= c <= 16 for codes in rows.values() for c in codes)
    # a seed vector encodes to itself in every subspace (distance 0)
    assert rows[1] == [1] * 8
    assert rows[16] == [16] * 8


def test_pq_adc_topk_ranks_close_vectors_first(spark, emb):
    from paimon_python_spark.operators import (
        brute_force_topk,
        pq_adc_topk,
        pq_codebooks_from_rows,
    )

    seeds = [
        [float(x) for x in r.embedding]
        for r in emb.filter("vec_id between 1 and 16").orderBy("vec_id").collect()
    ]
    books = pq_codebooks_from_rows(seeds, 8)
    q = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    adc = pq_adc_topk(
        emb.filter("vec_id <> 0"), "vec_id", "embedding", q, books, k=10
    ).collect()
    assert len(adc) == 10
    assert [r.rank for r in adc] == list(range(1, 11))
    # distances ascend and are non-negative
    d = [r.adc_dist for r in adc]
    assert d == sorted(d) and d[0] >= 0
    # quantized ranking overlaps the exact top-10 (coarse codebooks →
    # moderate recall; determinism is the hard contract, checked above)
    exact = {r.vec_id for r in brute_force_topk(
        emb.filter("vec_id <> 0"), "vec_id", "embedding", q, k=10).collect()}
    assert len(exact & {r.vec_id for r in adc}) >= 1


def test_leakage_safe_split_keeps_near_dups_together(spark):
    from paimon_python_spark.operators import (
        connected_components,
        minhash_lsh_pairs,
        split_column,
    )

    base = " ".join(f"w{i}" for i in range(40))
    rows = [(i, base.replace("w39", f"v{i}")) for i in range(1, 6)]  # near-dup family
    rows += [(100 + i, f"unique doc number {i} " + " ".join(f"u{i}{j}" for j in range(30))) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_num=1, jaccard_den=2)
    clusters = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed(
        "node", "doc_id"
    )
    assigned = (
        docs.join(clusters, "doc_id", "left")
        .withColumn("split_key", F.coalesce("cluster", F.col("doc_id")))
        .withColumn(
            "split", split_column("split_key", (0.8, 0.1, 0.1), ("train", "val", "test"))
        )
    )
    got = {r.doc_id: r.split for r in assigned.collect()}
    # the whole near-dup family shares one split — no eval leakage
    family = {got[i] for i in range(1, 6)}
    assert len(family) == 1, got


def test_incremental_dedup_anti_join_removes_seen_fingerprints(spark, tmp_path):
    from paimon_python_spark import Catalog, Schema
    from paimon_python_spark.functions import doc_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon zeta"),
            (3, "Alpha  beta   GAMMA"),  # normalizes to doc 1's fingerprint
            (4, "brand new content here"),
        ],
        "doc_id long, text string",
    )
    fps = doc_fingerprints(docs, "doc_id", "text")
    cat = Catalog.create({"warehouse": str(tmp_path / "wh")})
    cat.create_database("default", True)
    b1 = fps.filter("doc_id <= 2").select("fingerprint", "doc_id")
    cat.create_table(
        "default.fp",
        Schema(b1.schema, primary_keys=["fingerprint"], options={"bucket": "2"}),
        False,
    )
    t = cat.get_table("default.fp")
    wb = t.new_batch_write_builder()
    w, c = wb.new_write(), wb.new_commit()
    w.write_dataframe(b1)
    c.commit(w.prepare_commit())
    w.close(); c.close()

    seen = t.new_read_builder().new_read().to_df().select("fingerprint")
    b2 = fps.filter("doc_id >= 3").select("fingerprint", "doc_id")
    survivors = b2.join(seen, "fingerprint", "left_anti")
    got = [r.doc_id for r in survivors.collect()]
    assert got == [4], got  # doc 3 is a normalized duplicate of doc 1


def test_sliding_distinct_hll_windows_and_accuracy(spark):
    from paimon_python_spark.functions import sliding_distinct_hll

    # 3 buckets, ids overlap across buckets; window of 2
    rows = [(0, i) for i in range(50)] + [(1, i) for i in range(25, 75)] + [(2, 0)]
    df = spark.createDataFrame([("t", b, i) for b, i in rows], "k string, bucket long, id long")
    out = {
        r.win_end: (r.n_buckets, r.approx_distinct)
        for r in sliding_distinct_hll(df, ["k"], "bucket", "id", 2).collect()
    }
    # window ending at 1 covers buckets 0..1: ids 0..74 -> 75 distinct
    exact = {0: (1, 50), 1: (2, 75), 2: (2, 51), 3: (1, 1)}
    assert set(out) == set(exact)
    for w, (nb, n) in exact.items():
        got_nb, got_est = out[w]
        assert got_nb == nb
        assert abs(got_est - n) <= 0.05 * n + 2, (w, got_est, n)


def test_audio_features_real_wav_decode(spark):
    import numpy as np

    from paimon_python_spark.functions import audio_features, encode_wav_pcm16

    s1 = np.array([100, -200, 300, -400, 0, 50], np.int16)
    s2 = (np.arange(1000) % 512 - 256).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(16000, s1))),
            (2, bytearray(encode_wav_pcm16(8000, s2))),
        ],
        "id long, payload binary",
    )
    out = {r.id: r for r in audio_features(df, "id", "payload").collect()}
    assert (out[1].sample_rate, out[1].n_samples, out[1].duration_ms) == (16000, 6, 0)
    assert out[1].mean_abs_x1000 == int(np.abs(s1.astype(np.int64)).sum()) * 1000 // 6
    assert (out[2].sample_rate, out[2].n_samples) == (8000, 1000)
    assert out[2].duration_ms == 125
    assert out[2].mean_abs_x1000 == int(np.abs(s2.astype(np.int64)).sum()) * 1000 // 1000
    assert out[2].n_bytes == 44 + 2000  # RIFF header + PCM16 payload


def test_semantic_dedup_within_cell_only(spark):
    from paimon_python_spark.operators import semantic_dedup

    # two well-separated cells; near-dup pair inside cell 1, a
    # cross-cell pair with high cosine must NOT be compared
    c1, c2 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),      # cell 1
        (2, [0.99, 0.01, 0.0, 0.0]),    # cell 1, near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # cell 2
        (4, [0.05, 0.9, 0.0, 0.0]),     # cell 2, near 3 but < threshold? cos≈0.9988 → dup
        (5, [0.0, 0.0, 1.0, 0.0]),      # cell 1 or 2 by tie → argmax first-max = cell 1 (dots 0,0)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, "vec_id", "embedding", [c1, c2], threshold=0.99)
    got = {r.vec_id: (r.cell, r.dup_of) for r in out.collect()}
    assert got[2] == (1, 1)
    assert got[4] == (2, 3)
    # 5 has zero cosine to everything in its cell → never dropped
    assert 5 not in got


def test_semantic_dedup_partitioning_invariant(spark, emb):
    from paimon_python_spark.operators import semantic_dedup

    cents = [
        [float(x) for x in r[0]]
        for r in emb.filter(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    a = semantic_dedup(emb, "vec_id", "embedding", cents, threshold=0.35)
    b = semantic_dedup(
        emb.repartition(13), "vec_id", "embedding", cents, threshold=0.35
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_vector_quality_audit_zero_and_ragged(spark):
    from paimon_python_spark.operators import vector_quality_audit

    rows = [
        (0, [3.0, 4.0]),        # norm 5
        (0, [0.0, 0.0]),        # zero vector
        (1, [1.0, 0.0, 0.0]),   # ragged dims (3)
        (1, [0.0, 2.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    out = {r.label: r for r in vector_quality_audit(df, "label", "embedding").collect()}
    assert out[0].n_vecs == 2 and out[0].n_zero_norm == 1
    assert (out[0].min_dims, out[0].max_dims) == (2, 2)
    assert out[0].max_norm == 5.0 and out[0].avg_norm == 2.5
    assert (out[1].min_dims, out[1].max_dims) == (3, 3)
    assert out[1].n_zero_norm == 0
    assert (out[1].min_norm, out[1].max_norm, out[1].avg_norm) == (1.0, 2.0, 1.5)


def test_url_dedup_normalization_groups(spark):
    from paimon_python_spark.functions import url_dedup

    rows = [
        (1, "https://www.Example.com/a/?utm=1"),
        (2, "HTTP://example.com/a"),
        (3, "example.com/a/"),
        (4, "https://example.com/a#frag"),
        (5, "https://example.com/b"),
        (6, "https://sub.example.com/a"),  # subdomain ≠ host: own key
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.url_key: (r.keeper_id, r.n_docs) for r in url_dedup(df, "doc_id", "url").collect()}
    assert out["example.com/a"] == (1, 4)
    assert out["example.com/b"] == (5, 1)
    assert out["sub.example.com/a"] == (6, 1)


def test_duplicated_spans(spark):
    """Span-level exact-dup detection: shared verbatim spans surface at
    the right word ranges in BOTH docs regardless of offset; unrelated
    docs stay clean; the anchor-df cap drops boilerplate fingerprints."""
    from paimon_python_spark.operators import duplicated_spans

    shared_span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, shared_span + " unique one"),
        (2, "prefix words " + shared_span + " trailing"),
        (3, "totally different content with no overlap at all whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # anchor_hex="" makes EVERY position an anchor: exhaustive mode
    out = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicated_spans(df, "doc_id", "text", k=4, anchor_hex="").collect()
    }
    assert out[1] == (1, 11)  # words 1-10, end exclusive
    assert out[2] == (3, 13)  # same 10 words, shifted by the 2-word prefix
    assert 3 not in out
    # boilerplate cap: a fingerprint at >max_anchor_df sites is dropped
    many = [(i, shared_span) for i in range(10, 20)]
    df2 = spark.createDataFrame(rows + many, "doc_id long, text string")
    capped = duplicated_spans(
        df2, "doc_id", "text", k=4, anchor_hex="", max_anchor_df=5
    )
    assert capped.count() == 0  # every window now exceeds the cap


def test_contaminated_spans(spark):
    """Span-level decontamination: only the benchmark-verbatim range of
    a corpus doc is flagged (so it can be excised), clean docs return
    nothing, and spans align regardless of offset."""
    from paimon_python_spark.operators import contaminated_spans

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus_rows = [
        (1, "intro words here " + bench_text + " outro tail words"),
        (2, bench_text),  # full doc is the benchmark string
        (3, "completely unrelated prose with no benchmark overlap at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, bench_text + " with its own continuation")], "bid long, btext string"
    )
    out = {
        r.doc_id: (r.span_start, r.span_end, r.n_anchors)
        for r in contaminated_spans(
            corpus, "doc_id", "text", bench, "bid", "btext", k=4
        ).collect()
    }
    # doc 1: the 8 bench words start at word 4 -> windows 4..8 (k=4),
    # merged span [4, 12) (end exclusive), 5 anchors
    assert out[1] == (4, 12, 5)
    # doc 2: same words at offset 0 -> [1, 9)
    assert out[2] == (1, 9, 5)
    assert 3 not in out


def test_excise_spans(spark):
    """Span excision rewrites only the flagged word ranges, handles
    multiple spans per doc, full excision, and leaves span-free docs
    out of the result (they are unchanged by contract)."""
    from paimon_python_spark.operators import excise_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "one two three"),
            (3, "untouched words stay"),
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 4), (1, 6, 8), (2, 1, 4)],  # doc1: drop b,c and f,g; doc2: all
        "doc_id long, span_start long, span_end long",
    )
    out = {
        r.doc_id: (r.text_clean, r.words_kept, r.words_removed)
        for r in excise_spans(docs, spans, "doc_id", "text").collect()
    }
    assert out[1] == ("a d e h", 4, 4)
    assert out[2] == ("", 0, 3)
    assert 3 not in out


def test_scalable_rank_matches_window(spark):
    """scalable_rank must agree bit-for-bit with Spark's own window
    functions on a tie-heavy frame (unique tiebreak key), both global
    and partitioned — while never planning a single-partition window."""
    from pyspark.sql import Window as W

    from paimon_python_spark.operators.ranking import scalable_rank

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 37).cast("double").alias("v"),  # heavy ties in v
    )
    # global: order (v, id) is total
    w = W.orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("q"),
    )
    got = scalable_rank(
        df,
        ["v", "id"],
        num_buckets=8,
        row_number_col="rn",
        percent_rank_col="pr",
        cume_dist_col="cd",
        ntile=4,
        ntile_col="q",
    ).select("id", "rn", "pr", "cd", "q")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert "SinglePartition" not in got._jdf.queryExecution().executedPlan().toString()
    # partitioned by g
    wp = W.partitionBy("g").orderBy("v", "id")
    wantp = df.select(
        "id",
        F.row_number().over(wp).alias("rn"),
        F.percent_rank().over(wp).alias("pr"),
        F.ntile(3).over(wp).alias("q"),
    )
    gotp = scalable_rank(
        df,
        ["v", "id"],
        ["g"],
        num_buckets=4,
        row_number_col="rn",
        percent_rank_col="pr",
        ntile=3,
        ntile_col="q",
    ).select("id", "rn", "pr", "q")
    assert gotp.exceptAll(wantp).count() == 0 and wantp.exceptAll(gotp).count() == 0
    # n < tiles edge: every tile has 0 or 1 rows
    tiny = spark.range(3).select(F.col("id"), F.col("id").cast("double").alias("v"))
    q = {
        r.id: r.ntile
        for r in scalable_rank(
            tiny, ["v", "id"], num_buckets=2, ntile=5, row_number_col=None
        ).collect()
    }
    assert q == {0: 1, 1: 2, 2: 3}


def test_salted_join_matches_plain_join(spark):
    from paimon_python_spark.operators import salted_join

    big = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ([0] * 3 + [i % 5])],
        "k long, payload long",
    )
    small = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "k long, v string")
    plain = big.join(small, "k").select("k", "payload", "v")
    salted = salted_join(big, small, on=["k"], salt_n=8).select("k", "payload", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched big rows exactly once
    big2 = big.union(spark.createDataFrame([(99, 1)], "k long, payload long"))
    left = salted_join(big2, small, on=["k"], salt_n=4, how="left")
    assert left.filter("k = 99").count() == 1
    assert left.filter("k = 99").select("v").first()[0] is None


def test_salted_join_rejects_right_and_missing_salt_cols(spark):
    import pytest as _pytest

    from paimon_python_spark.operators import salted_join

    df = spark.createDataFrame([(1, 2)], "k long, x long")
    dim = spark.createDataFrame([(1, "a")], "k long, v string")
    with _pytest.raises(ValueError):
        salted_join(df, dim, on=["k"], how="right")
    with _pytest.raises(ValueError):
        salted_join(df.select("k"), dim, on=["k"])


def test_with_salt_deterministic_and_bounded(spark):
    from paimon_python_spark.operators import with_salt

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = with_salt(df, 7).collect()
    b = with_salt(df.repartition(9), 7).collect()
    assert {r.id: r["__salt"] for r in a} == {r.id: r["__salt"] for r in b}
    assert all(0 <= r["__salt"] < 7 for r in a)


def test_exact_distinct_per_key(spark):
    from paimon_python_spark.operators import exact_distinct_per_key

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 5)] * 10 + [("b", 6)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = {r.k: r.n_distinct for r in exact_distinct_per_key(df, ["k"], "v").collect()}
    assert out == {"a": 2, "b": 2}


def test_line_filter_keeps_order_and_counts(spark):
    from paimon_python_spark.functions import line_filter

    df = spark.createDataFrame(
        [(1, "one two three\nshort\nfour five six seven\nx y")],
        "id long, text string",
    )
    r = line_filter(df, "id", "text", min_words=3).first()
    assert (r.n_lines, r.n_kept_lines) == (4, 2)
    assert r.cleaned_text == "one two three\nfour five six seven"


def test_paragraph_stats_counts_and_keeper(spark):
    from paimon_python_spark.functions import paragraph_stats

    df = spark.createDataFrame(
        [
            (5, "dup para\nunique one"),
            (2, "dup para\ndup para"),
            (9, "other\n\ndup para"),
        ],
        "id long, text string",
    )
    out = paragraph_stats(df, "id", "text")
    # 3 distinct non-empty paragraphs; the \n\n empty one is dropped
    assert out.count() == 3
    dup = out.filter("n_occurrences > 1").collect()
    assert len(dup) == 1
    assert (dup[0].n_occurrences, dup[0].n_docs, dup[0].keeper_id) == (4, 3, 2)


def test_minhash_max_bucket_caps_hot_buckets(spark):
    from paimon_python_spark.operators import minhash_lsh_pairs

    # 12 identical docs -> one hot bucket per band (width 12);
    # cap at 8 removes every candidate pair from those buckets
    base = " ".join(f"w{i}" for i in range(30))
    docs = [(i, base) for i in range(12)] + [
        (100, base.replace("w29", "changed")),
        (200, "totally different content about engines and planners here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(df, "doc_id", "text")
    capped = minhash_lsh_pairs(df, "doc_id", "text", max_bucket=8)
    assert uncapped.count() >= 66  # 12*11/2 clone pairs at least
    # clones' buckets exceed the cap -> their pairs vanish
    assert capped.filter("doc_a < 12 AND doc_b < 12").count() == 0
    # cap must not affect buckets under the width limit
    assert capped.count() <= uncapped.count()


def test_profile_columns_nulls_and_approx(spark):
    from paimon_python_spark.functions import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k long, s string"
    )
    out = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert (out["k"].n_rows, out["k"].n_nulls, out["k"].n_distinct) == (4, 1, 2)
    assert (out["k"].min_value, out["k"].max_value) == ("1", "2")
    assert (out["s"].n_nulls, out["s"].n_distinct) == (1, 2)
    # approx path: same shape, estimate within HLL tolerance
    approx = {
        r.column: r
        for r in profile_columns(df, ["k"], exact_distinct=False).collect()
    }
    assert abs(approx["k"].n_distinct - 2) <= 1


def test_binned_interval_join_matches_plain(spark):
    from paimon_python_spark.operators import binned_interval_join

    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i % 3, i, rng.randrange(0, 1000)) for i in range(80)],
        "k long, lid long, lts long",
    )
    right = spark.createDataFrame(
        [(i % 3, 1000 + i, rng.randrange(0, 1000)) for i in range(80)],
        "k long, rid long, rts long",
    )
    for lo, hi in [(-50, 0), (-30, 30), (0, 100), (7, 7)]:
        plain = left.join(
            right,
            (left.k == right.k)
            & (right.rts >= left.lts + lo)
            & (right.rts <= left.lts + hi),
        ).select(left.k, "lid", "rid")
        binned = binned_interval_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", lower=lo, upper=hi
        ).select("k", "lid", "rid")
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, binned.collect())
        ), (lo, hi)


def test_binned_interval_join_rejects_empty_interval(spark):
    import pytest as _pytest

    from paimon_python_spark.operators import binned_interval_join

    df = spark.createDataFrame([(1, 1, 1)], "k long, i long, t long")
    with _pytest.raises(ValueError):
        binned_interval_join(df, df, on=["k"], left_ts="t", right_ts="t",
                             lower=5, upper=4)


def test_pq_rerank_improves_on_adc(spark, emb):
    """Re-ranked top-k must equal the exact brute-force top-k whenever
    the ADC shortlist contains the true top-k (it does here: oversample
    covers the whole 500-vector corpus ranking tail)."""
    from paimon_python_spark.operators import (
        brute_force_topk,
        pq_codebooks_from_rows,
        pq_rerank_topk,
    )

    seeds = [
        [float(x) for x in r[0]]
        for r in emb.filter("vec_id BETWEEN 1 AND 16")
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    books = pq_codebooks_from_rows(seeds, 8)
    q = [float(x) for x in emb.filter("vec_id = 0").select("embedding").first()[0]]
    body = emb.filter("vec_id <> 0")
    exact = brute_force_topk(body, "vec_id", "embedding", q, k=5).collect()
    rer = pq_rerank_topk(
        body, "vec_id", "embedding", q, books, k=5, oversample=100
    ).collect()
    assert [(r.vec_id, r.rank) for r in exact] == [(r.vec_id, r.rank) for r in rer]


def test_kmeans_mirror_bit_identical(spark, emb):
    """The plain-Python training mirror must reproduce the distributed
    k-means exactly — this is what makes ann_ivf_trained oracle-able."""
    from pyspark.sql import functions as F

    from paimon_python_spark.operators import kmeans_fit, kmeans_fit_mirror

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    dist = kmeans_fit(e, "vec_id", "embedding", k=4, iters=2)
    rows = [(int(r[0]), [float(x) for x in r[1]]) for r in e.orderBy("vec_id").collect()]
    mirror = kmeans_fit_mirror(rows, k=4, iters=2)
    assert dist == mirror


def test_token_budget_mix_floors_and_determinism(spark):
    from paimon_python_spark.operators import token_budget_mix

    rows = [(i, "a", 10) for i in range(10)] + [(100 + i, "b", 10) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, src string, toks long")
    out = token_budget_mix(df, "id", "src", "toks", budgets={"a": 25}, default_budget=1000)
    kept = out.filter("keep")
    a = kept.filter("src = 'a'")
    # budget 25 with 10-token docs: 2 fit fully, the 3rd crosses the
    # line and is still included (budget is a floor) -> 3 docs
    assert a.count() == 3
    assert a.agg({"toks": "sum"}).first()[0] == 30
    # group under default budget keeps everything
    assert kept.filter("src = 'b'").count() == 3
    # deterministic under repartition
    again = token_budget_mix(
        df.repartition(7), "id", "src", "toks", budgets={"a": 25}, default_budget=1000
    ).filter("keep")
    assert sorted(r.id for r in again.collect()) == sorted(r.id for r in kept.collect())


def test_prototypicality_scores_and_cells(spark):
    from paimon_python_spark.operators import prototypicality

    c1, c2 = [1.0, 0.0], [0.0, 2.0]  # distinct norms on purpose
    rows = [
        (1, [2.0, 0.0]),   # cell 1, cos = 1.0
        (2, [0.0, 5.0]),   # cell 2 (dot 10 > 0), cos = 1.0
        (3, [1.0, 1.0]),   # dot c1 = 1, dot c2 = 2 -> cell 2, cos = sqrt(.5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.cell, r.proto) for r in
           prototypicality(df, "vec_id", "embedding", [c1, c2]).collect()}
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 1.0)
    assert out[3][0] == 2 and abs(out[3][1] - 0.707107) < 1e-6


def test_png_all_filters_roundtrip_vectorized():
    """Property check of the vectorized PNG filter reconstruction: an
    INDEPENDENT scalar reference encoder filters rows with every type
    (None/Sub/Up/Average/Paeth, cycling) across all four channel
    layouts; decode must reproduce the pixels bit-exactly."""
    import binascii
    import struct
    import zlib

    import numpy as np

    from paimon_python_spark.functions.multimodal import _PNG_MAGIC, decode_png

    def chunk(tag, payload):
        body = tag + payload
        return (
            struct.pack(">I", len(payload))
            + body
            + struct.pack(">I", binascii.crc32(body) & 0xFFFFFFFF)
        )

    def encode_with_filters(arr, ftypes):
        h, w, ch = arr.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        stride = w * ch
        flat = arr.reshape(h, stride).astype(np.int16)
        prev = np.zeros(stride, np.int16)
        out = bytearray()
        for y in range(h):
            f = ftypes[y % len(ftypes)]
            line = flat[y]
            enc = np.zeros(stride, np.int16)
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up = prev[i]
                ul = prev[i - ch] if i >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = left
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    )
                enc[i] = (line[i] - pred) & 0xFF
            out += bytes([f]) + bytes(enc.astype(np.uint8))
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            _PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(42)
    for ch in (1, 2, 3, 4):
        h, w = int(rng.randint(3, 20)), int(rng.randint(3, 20))
        arr = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        got = decode_png(encode_with_filters(arr, [0, 1, 2, 3, 4]))
        assert np.array_equal(got, arr)


def test_temperature_mix_sample(spark, docs):
    """Temperature flattening: the smallest group keeps everything
    (rate 1); larger groups downsample at (n_min/n)^(1-alpha); alpha=1
    is the natural distribution (all kept)."""
    from paimon_python_spark.operators import (
        temperature_mix_rates,
        temperature_mix_sample,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)], "id long, g string"
    )
    rates = {r.g: r.rate for r in temperature_mix_rates(df, "g", alpha=0.5).collect()}
    assert rates["small"] == 1.0
    assert abs(rates["big"] - (10 / 90) ** 0.5) < 1e-12
    out = temperature_mix_sample(df, "id", "g", alpha=0.5)
    kept = {r.g: r.n for r in out.filter("keep").groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert kept["small"] == 10  # rate 1 keeps all
    assert 0 < kept.get("big", 0) < 90
    # alpha=1: natural -> every rate 1, everything kept
    allkept = temperature_mix_sample(df, "id", "g", alpha=1.0)
    assert allkept.filter("NOT keep").count() == 0
    # a rate that rounds to 65536 while still < 1.0 must keep ~all rows
    # — regression: the in-plan hex threshold used to lpad-TRUNCATE
    # '10000' to '1000', silently keeping ~6% of such a group
    near = spark.range(200_001).select(
        F.col("id"),
        F.when(F.col("id") < 100_000, "a").otherwise("b").alias("g"),
    )
    out2 = temperature_mix_sample(near, "id", "g", alpha=0.5)
    kept2 = {
        r.g: r.n
        for r in out2.filter("keep").groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert kept2["a"] == 100_000  # rate exactly 1.0
    assert kept2["b"] > 99_000  # rate 0.9999975 — was ~6,200 with the bug


def test_embedding_lsh_matmul_matches_expr(spark, emb):
    """The Arrow-matmul bucket scale path must produce the same
    verified pairs as the oracle-gated expression path on real data
    (they can differ only on projections exactly at 0.0)."""
    from paimon_python_spark.operators import embedding_cosine_pairs_lsh

    kw = dict(threshold=0.9, dims=64, planes=8, tables=8)
    a = embedding_cosine_pairs_lsh(
        emb, "vec_id", "embedding", bucket_method="expr", **kw
    )
    b = embedding_cosine_pairs_lsh(
        emb, "vec_id", "embedding", bucket_method="matmul", **kw
    )
    pa_ = {(r.id_a, r.id_b, r.cos_sim) for r in a.collect()}
    pb_ = {(r.id_a, r.id_b, r.cos_sim) for r in b.collect()}
    assert pa_ == pb_


def test_fuzzy_dedup_survivors_priority(spark):
    """priority_col keeps the best-quality copy per cluster instead of
    the minimum id (ties -> min id)."""
    from paimon_python_spark.operators import fuzzy_dedup_survivors

    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (9, 1)],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    # default: min id survives
    got = sorted(
        r.doc_id for r in fuzzy_dedup_survivors(df, pairs, "doc_id").collect()
    )
    assert got == [1, 4, 9]
    # priority: doc 2 (quality 99, min id among the 99-tie) survives
    got2 = sorted(
        r.doc_id
        for r in fuzzy_dedup_survivors(
            df, pairs, "doc_id", priority_col="quality"
        ).collect()
    )
    assert got2 == [2, 4, 9]


def test_audio_spectral_features_sinusoid(spark):
    """FFT features verified against analytic sinusoids: the dominant
    frequency must land on the tone's bin, low-band share ~1 for a
    low tone and ~0 for a high tone."""
    import numpy as np

    from paimon_python_spark.functions import (
        audio_spectral_features,
        encode_wav_pcm16,
    )

    rate, n = 8000, 2048
    t = np.arange(n)
    low = (3000 * np.sin(2 * np.pi * 250 * t / rate)).astype(np.int64)   # 250 Hz
    high = (3000 * np.sin(2 * np.pi * 3000 * t / rate)).astype(np.int64)  # 3 kHz
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(rate, low))),
            (2, bytearray(encode_wav_pcm16(rate, high))),
        ],
        "id long, wav binary",
    )
    out = {r.id: r for r in audio_spectral_features(df, "id", "wav", n_fft=512).collect()}
    bin_hz = rate / 512  # 15.625 Hz per bin
    assert abs(out[1].dominant_hz - 250) <= bin_hz
    assert abs(out[2].dominant_hz - 3000) <= bin_hz
    assert out[1].low_band_ratio_x1000 > 900   # 250 Hz < 1 kHz band
    assert out[2].low_band_ratio_x1000 < 100   # 3 kHz above it
    assert out[1].centroid_hz < out[2].centroid_hz


def test_assign_cells_matmul_matches_expr(spark, emb):
    """The matmul IVF scale path must assign the same cells as the
    oracle-gated expression path on real data (both tie-break to the
    first max)."""
    from paimon_python_spark.operators import assign_cells_matmul, kmeans_fit
    from paimon_python_spark.operators.similarity import assign_cells

    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=3)
    a = {
        r.vec_id: r.cell
        for r in assign_cells(
            emb.select("vec_id", "embedding"), "embedding", cents
        ).collect()
    }
    b = {
        r.vec_id: r.cell
        for r in assign_cells_matmul(emb, "vec_id", "embedding", cents).collect()
    }
    assert a == b


def test_cache_scopes_are_per_thread(spark, docs):
    """The scope stack is threading.local: two driver threads composing
    operators never see each other's registries."""
    import threading

    from paimon_python_spark.operators import minhash_lsh_pairs
    from paimon_python_spark.operators._cache import _current, release_cached

    release_cached()
    results = {}

    def work(name, n):
        minhash_lsh_pairs(docs.limit(n), "doc_id", "text").count()
        results[name] = len(_current())
        release_cached()
        results[name + "_after"] = len(_current())

    t1 = threading.Thread(target=work, args=("a", 30))
    t2 = threading.Thread(target=work, args=("b", 40))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert results["a"] >= 1 and results["b"] >= 1
    assert results["a_after"] == 0 and results["b_after"] == 0
    # the main thread's scope never saw either worker's frames
    assert len(_current()) == 0


def test_scalable_rank_null_partition_values(spark):
    """NULL partition columns must not crash the bounded offset
    collect (Python can't order None vs int) — NULL groups rank
    independently, matching Spark's own window semantics."""
    from pyspark.sql import Window as W

    from paimon_python_spark.operators.ranking import scalable_rank

    df = spark.range(300).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 3)
        .alias("g"),
        (F.col("id") % 17).cast("double").alias("v"),
    )
    wp = W.partitionBy("g").orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(wp).alias("rn"),
        F.percent_rank().over(wp).alias("pr"),
    )
    got = scalable_rank(
        df,
        ["v", "id"],
        ["g"],
        num_buckets=4,
        row_number_col="rn",
        percent_rank_col="pr",
    ).select("id", "rn", "pr")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_band_key_expr_matches_column_form(spark):
    """The SQL-compiled band key is the SAME Catalyst expression as the
    per-slot Column construction it replaced (r12: one parsed
    expression instead of one py4j round-trip per slot), so band
    contents — and every minhash family result — are unchanged."""
    from pyspark.sql import functions as F

    from paimon_python_spark.operators.dedup import _band_key_expr

    rows_per_band = 4
    sig = spark.range(8).selectExpr(
        "id",
        "transform(sequence(1, 16), x -> cast(x * (id + 1) as int)) AS sig",
        "cast(id % 2 as int) AS band",
    )
    ref_key = F.concat_ws(
        "-",
        *[
            F.element_at("sig", F.col("band") * rows_per_band + F.lit(k + 1))
            for k in range(rows_per_band)
        ],
    )
    got = sig.select("id", _band_key_expr(rows_per_band).alias("bk"))
    ref = sig.select("id", ref_key.alias("bk"))
    import re

    def norm(df):
        # expression ids (#N) differ between otherwise-identical plans
        return re.sub(
            r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString()
        )

    assert norm(got) == norm(ref)
    assert got.collect() == ref.collect()
