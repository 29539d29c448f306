"""Training-data pipeline operator tests: dedup family invariants, ANN
recall vs the brute-force baseline, text profiling, multimodal plumbing."""

import pytest

from pyspark.sql import functions as F

from logverzcore_spark.operators import dedup, similarity, text

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from logverzcore_spark.engine import read_table

    return read_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    from logverzcore_spark.engine import read_table

    return read_table(spark, SF_DIR, "embeddings")


def test_exact_dedup_partitions_all_docs(docs):
    out = dedup.exact_dedup(docs)
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()
    # keep_id is the min doc_id of its group.
    assert out.where(F.col("keep_id").isNull()).count() == 0


def test_winnow_guarantee_and_density(spark):
    """Winnowing's two contracts: (a) any shared token run of length
    ≥ n + window - 1 (= 6 tokens here) yields at least one COMMON
    selected fingerprint — the detection guarantee; (b) the selected
    set is much smaller than the full shingle set (expected density
    ~2/(window+1))."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    rows = [
        (1, f"one two three {shared} four five six seven"),
        (2, f"red green blue cyan {shared} magenta yellow black white"),
        (3, "totally different words with no overlap at all here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df).cache()
    try:
        by_doc = {
            r["doc_id"]: set(r["fps"])
            for r in fps.groupBy("doc_id").agg(
                F.collect_set("fp").alias("fps")
            ).collect()
        }
        # (a) guarantee: docs 1 and 2 share a fingerprint; 3 shares none
        assert by_doc[1] & by_doc[2]
        assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
        # (b) density: far fewer fingerprints than shingles (len-2 per doc)
        n_shingles = sum(len(t.split()) - 2 for _, t in rows)
        assert sum(len(v) for v in by_doc.values()) < n_shingles
        # pair surface agrees
        pairs = winnow_overlap_pairs(df, threshold=0.01).collect()
        assert {(r["id1"], r["id2"]) for r in pairs} == {(1, 2)}
    finally:
        fps.unpersist()


def test_shingle_hash_array_matches_row_form(spark):
    """The in-row shingle-hash array must stay BIT-IDENTICAL to the
    explode-based reference formulation (_hashed_shingle_rows): same
    multi-arg xxhash64 over the same token tuples in the same order —
    this test is the contract that lets the two implementations coexist
    (streaming state tables hash with one, docs cite the other)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.dedup import (
        _hashed_shingle_rows,
        shingle_hash_array,
    )
    from logverzcore_spark.operators.text import tokens

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    rows = (
        _hashed_shingle_rows(docs)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )
    arrays = docs.select(
        "doc_id", tokens(F.col("text")).alias("_tk")
    ).select(
        "doc_id", F.sort_array(shingle_hash_array(F.col("_tk"))).alias("hs")
    ).where(F.size("hs") > 0)
    assert rows.exceptAll(arrays).count() == 0
    assert arrays.exceptAll(rows).count() == 0


def test_expr_builders_match_column_forms(spark):
    """r13 single-parse expression builders must stay BIT-IDENTICAL to
    the multi-call Column formulations they replaced (the builders exist
    only to cut driver-side py4j round trips — ~2,400 per
    minhash_lsh_pairs construction — never to change a value). Pins:
    the shingle-hash array (the memoized builder must stay the zip
    form — an element_at SQL draft executed 15× slower once projection
    collapse inlined the tokenizer into its per-element lambda), the
    k-min fold, the banded bucket explode, the cosine expression, and
    the MaxSim slice fold incl. its zero-norm guard and association
    order."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.dedup import (
        _band_buckets_expr,
        _minhash_fold,
        _shingle_hash_attr,
        minhash_signature_sets,
        shingle_hash_array,
    )
    from logverzcore_spark.operators.similarity import (
        _as_double,
        _cosine_expr,
        _maxsim_score_expr,
        cosine,
    )
    from logverzcore_spark.operators.text import tokens

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_tk"))

    # shingle hashes: expr form vs legacy zip form
    old = toked.select("doc_id", shingle_hash_array(F.col("_tk"), 3).alias("h"))
    new = toked.select("doc_id", _shingle_hash_attr("_tk", 3).alias("h"))
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0

    # k-min fold: expr form vs legacy nested-lambda fold
    staged = toked.select(
        "doc_id", shingle_hash_array(F.col("_tk"), 3).alias("_hs")
    ).where(F.size("_hs") > 0)
    legacy_fold = F.aggregate(
        F.col("_hs"),
        F.expr("array_repeat(9223372036854775807L, 32)"),
        lambda acc, x: F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: F.least(F.get(acc, i), F.xxhash64(i, x)),
        ),
    )
    o = staged.select("doc_id", legacy_fold.alias("sig"))
    n = staged.select("doc_id", _minhash_fold("_hs", 32).alias("sig"))
    assert o.exceptAll(n).count() == 0 and n.exceptAll(o).count() == 0

    # banded buckets: expr form vs legacy per-band structs
    sig_df = minhash_signature_sets(
        docs, num_hashes=32, n=3, with_sets=False, persist=False
    )

    def _sig_at(i):
        col = F.get("sig", i)
        if i == 31:
            return F.when(
                F.size("sig") < 32,
                F.raise_error(
                    F.concat(
                        F.lit("minhash_band_buckets: signature array has "),
                        F.size("sig").cast("string"),
                        F.lit(" mins, num_hashes=32 expected"),
                    )
                ).cast("long"),
            ).otherwise(col)
        return col

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.lit(b), _sig_at(b * 2), _sig_at(b * 2 + 1)).alias(
                "bucket"
            ),
        )
        for b in range(16)
    ]
    ob = sig_df.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    nb = sig_df.select(
        "doc_id", _band_buckets_expr(32, 16).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    assert ob.exceptAll(nb).count() == 0 and nb.exceptAll(ob).count() == 0

    # cosine + maxsim over the embeddings fixture
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    pair = (
        emb.select(
            F.col("vec_id").alias("qid"),
            _as_double(F.col("embedding")).alias("qvec"),
        )
        .crossJoin(
            emb.select(
                F.col("vec_id").alias("nid"),
                _as_double(F.col("embedding")).alias("nvec"),
            ).limit(20)
        )
        .limit(500)
    )
    oc = pair.select(
        "qid", "nid", cosine(F.col("qvec"), F.col("nvec")).alias("c")
    )
    nc = pair.select("qid", "nid", _cosine_expr("qvec", "nvec").alias("c"))
    assert oc.exceptAll(nc).count() == 0 and nc.exceptAll(oc).count() == 0

    def legacy_maxsim(n_slices, width):
        def slices(col):
            vec = _as_double(col)
            out = []
            for s in range(n_slices):
                sl = F.slice(vec, s * width + 1, width)
                nrm = F.sqrt(
                    F.aggregate(sl, F.lit(0.0), lambda acc, x: acc + x * x)
                )
                out.append((sl, nrm))
            return out

        qs, cs = slices(F.col("qvec")), slices(F.col("nvec"))
        total = F.lit(0.0)
        for qsl, qn in qs:
            best = None
            for csl, cn in cs:
                d = F.aggregate(
                    F.zip_with(qsl, csl, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                cos_ = F.when(qn * cn > 0, d / (qn * cn)).otherwise(F.lit(0.0))
                best = cos_ if best is None else F.greatest(best, cos_)
            total = total + best
        return total

    om = pair.select("qid", "nid", legacy_maxsim(4, 16).alias("m"))
    nm = pair.select(
        "qid", "nid", _maxsim_score_expr("qvec", "nvec", 4, 16).alias("m")
    )
    assert om.exceptAll(nm).count() == 0 and nm.exceptAll(om).count() == 0

    # r14: the pre-staged-norm forms must be value-identical too —
    # cosine with per-row norms and MaxSim with per-row slice norms.
    from logverzcore_spark.operators.similarity import (
        _cosine_prenormed_expr,
        _l2_norm_attr,
        _maxsim_score_prenormed_expr,
        _slice_norm_attr,
    )

    pre = pair.select(
        "qid", "nid", "qvec", "nvec",
        _l2_norm_attr("qvec").alias("_qn"),
        _l2_norm_attr("nvec").alias("_nn"),
        *[_slice_norm_attr("qvec", s, 16).alias(f"_qn{s}") for s in range(4)],
        *[_slice_norm_attr("nvec", s, 16).alias(f"_nn{s}") for s in range(4)],
    )
    pc = pre.select(
        "qid", "nid",
        _cosine_prenormed_expr("qvec", "nvec", "_qn", "_nn").alias("c"),
    )
    assert oc.exceptAll(pc).count() == 0 and pc.exceptAll(oc).count() == 0
    pm = pre.select(
        "qid", "nid",
        _maxsim_score_prenormed_expr("qvec", "nvec", "_qn", "_nn", 4, 16).alias("m"),
    )
    assert om.exceptAll(pm).count() == 0 and pm.exceptAll(om).count() == 0


def test_minhash_pairs_from_sig_matches_lsh_pairs(docs):
    """The streaming-batch pair path (minhash_pairs_from_sig over a
    persisted signature/set frame) must produce exactly the pairs and
    jaccards of the corpus-batch path (minhash_lsh_pairs) on the same
    rows — st22's batch-equals-stream hash rests on it."""
    from logverzcore_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_pairs_from_sig,
        minhash_signature_sets,
    )

    sig = minhash_signature_sets(docs, num_hashes=32, n=3)
    try:
        a = minhash_lsh_pairs(docs, threshold=0.7)
        b = minhash_pairs_from_sig(sig, threshold=0.7)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
    finally:
        sig.unpersist()


def test_minhash_pairs_from_sig_big_batch_degrades_to_shuffle(docs, monkeypatch):
    """r14 (VERDICT task 5): the verify join's broadcast is GUARDED —
    past _BROADCAST_VERIFY_MAX_PAIRS the measured strategy must pick a
    shuffle join (no BroadcastExchange of the melt) with identical
    pairs, so an unbounded batch can't abort on the driver collect."""
    from logverzcore_spark.operators import dedup as ddp
    from logverzcore_spark.operators.dedup import (
        minhash_pairs_from_sig,
        minhash_signature_sets,
    )

    sig = minhash_signature_sets(docs, num_hashes=32, n=3)
    try:
        small = minhash_pairs_from_sig(sig, threshold=0.7)
        # Force the guard to trip: every candidate list is now "big".
        monkeypatch.setattr(ddp, "_BROADCAST_VERIFY_MAX_PAIRS", 0)
        big = minhash_pairs_from_sig(sig, threshold=0.7)
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert big.exceptAll(small).count() == 0
        assert small.exceptAll(big).count() == 0
    finally:
        sig.unpersist()


def test_minhash_candidates_superset_of_high_jaccard(docs):
    """Every pair the exact Jaccard finds at 0.7 must be found by LSH
    (recall ~1 at r=2,b=64)."""
    exact = {
        (r["id1"], r["id2"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.7).collect()
    }
    assert exact == lsh


def test_cosine_topk_blas_matches_jvm(emb):
    """The BLAS variant is an exact drop-in: identical rows, same order
    contract, same 6-dp rounding as the codegen'd HOF path."""
    queries = emb.where(F.col("vec_id") < 10)
    jvm = similarity.cosine_topk(emb, queries, k=5).collect()
    blas = similarity.cosine_topk_blas(emb, queries, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(jvm, key=key) == sorted(blas, key=key)


def test_simhash_symmetry_and_threshold(docs):
    pairs = dedup.simhash_neardup_pairs(docs, max_hamming=3).collect()
    for r in pairs:
        assert r["id1"] < r["id2"]
        assert 0 <= r["hamming"] <= 3


def test_lsh_topk_recall(emb):
    """Bucketed ANN must recover most of the brute-force top-5."""
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    import pytest

    with pytest.raises(ValueError):  # dim is required (no corpus probe job)
        similarity.lsh_topk(emb, queries, k=5)
    approx = similarity.lsh_topk(emb, queries, k=5, dim=64).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"LSH recall {recall}"


def test_ivf_topk_recall(emb):
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall {recall}"


def test_text_profile_ranges(docs):
    prof = text.text_profile(docs, "text")
    bad = prof.where(
        (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
        | (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
        | (F.col("repetition_ratio") < 0) | (F.col("repetition_ratio") > 1)
        | (F.col("n_tokens") < 0)
    )
    assert bad.count() == 0
    langs = {r["lang_guess"] for r in prof.select("lang_guess").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es", "und"}


def test_multimodal_decode_stub(spark):
    """The decode stage is stubbed (no image libs in env) but the Spark
    plumbing — binary column, schema, batch shape — is real."""
    from logverzcore_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG fake")), (2, bytearray(b"RIFF fake"))],
        "id long, payload binary",
    )
    meta = multimodal.extract_binary_meta(df, payload_col="payload", id_col="id")
    rows = {r["id"]: r for r in meta.collect()}
    assert rows[1]["n_bytes"] == 9
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG fake")


def test_asof_join_directions_ties_and_nulls(spark):
    """Backward/forward matching, equal-ts inclusivity, tie-break by the
    greatest tie column, and NULL when no row qualifies."""
    from logverzcore_spark.operators.asofjoin import asof_join

    left = spark.createDataFrame(
        [("u1", 100, "L1"), ("u1", 50, "L2"), ("u2", 10, "L3")],
        "user string, ts long, lid string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 40, "R1"),
            ("u1", 100, "R2"),  # equal ts → matches L1 (inclusive)
            ("u1", 100, "R3"),  # tie at ts=100 → greatest rid (R3) wins
            ("u2", 99, "R4"),   # after L3 → backward finds nothing
        ],
        "user string, ts long, rid string",
    )
    back = {
        r["lid"]: r["rid_matched"]
        for r in asof_join(left, right, on="ts", by="user", tie_break="rid").collect()
    }
    assert back == {"L1": "R3", "L2": "R1", "L3": None}
    fwd = {
        r["lid"]: r["rid_matched"]
        for r in asof_join(
            left, right, on="ts", by="user", direction="forward", tie_break="rid"
        ).collect()
    }
    # Forward: earliest ts >= left.ts; at equal nearest-ts the greatest
    # tie wins (both L1 and L2 resolve to ts=100 → R3, not R2).
    assert fwd == {"L1": "R3", "L2": "R3", "L3": "R4"}


def test_dup_clusters_transitive_and_singletons(spark):
    """A~B, B~C must cluster {A,B,C} together without a direct A~C edge;
    untouched docs stay singleton representatives."""
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4)], "id1 long, id2 long"
    )
    got = {r["doc_id"]: (r["cluster_id"], r["is_rep"]) for r in dedup.dup_clusters(docs, pairs).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (4, False), 6: (6, True),
    }


def test_ivf_topk_lcg_centroids_recall(emb):
    """The engine-portable LCG-centroid IVF variant (hash-verified in the
    suite as s03b) still recovers most of the brute-force top-5."""
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=4,
        centroids=similarity.lcg_centroids(64, 16),
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LCG-IVF recall {recall}"


def test_gopher_quality_flags(docs):
    """Metrics in range, flags consistent with metrics, keep = AND of
    flags."""
    out = text.gopher_quality(docs)
    rows = out.select(
        "n_words", "mean_word_len", "alpha_word_ratio", "n_stop_hits",
        "pass_word_count", "pass_mean_word_len", "pass_alpha_ratio",
        "pass_stopwords", "keep",
    ).collect()
    assert rows
    for r in rows:
        assert r["n_words"] >= 0 and 0 <= r["alpha_word_ratio"] <= 1
        assert r["pass_word_count"] == (50 <= r["n_words"] <= 100_000)
        assert r["keep"] == (
            r["pass_word_count"] and r["pass_mean_word_len"]
            and r["pass_alpha_ratio"] and r["pass_stopwords"]
        )


def test_dup_ngram_fraction_bounds(spark):
    """A fully-repetitive doc scores near 1; an all-distinct doc scores 0;
    docs shorter than n have zero ngrams."""
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 50),          # 2-token loop → ~all 3-grams dup
            (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
            (3, "too short"),               # < 3 tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.dup_ngram_fraction(df).collect()}
    assert got[1]["dup_ngram_frac"] > 0.9
    assert got[2]["dup_ngram_frac"] == 0.0
    assert got[3]["n_ngrams"] == 0 and got[3]["dup_ngram_frac"] == 0.0


def test_quantize_embedding_roundtrip(emb):
    """Scale positive, RMSE small relative to vector norm, checksum
    bounded by 127 * dims."""
    out = similarity.quantize_embedding_stats(emb).collect()
    assert out
    for r in out:
        assert r["scale"] > 0
        assert 0 <= r["recon_rmse"] < 0.1      # int8 on unit-ish 64-dim vectors
        assert 0 <= r["q_l1_checksum"] <= 127 * r["n_dims"]


def test_hash_sample_deterministic_fraction(docs):
    """Same membership on every call; fraction near the 32/256 target."""
    a = {r["doc_id"] for r in docs.where(text.hash_sample(F.col("doc_id"))).collect()}
    b = {r["doc_id"] for r in docs.where(text.hash_sample(F.col("doc_id"))).collect()}
    assert a == b and a
    frac = len(a) / docs.count()
    assert 0.06 <= frac <= 0.20


def test_containment_asymmetry(spark):
    """A short doc fully embedded in a long doc has containment 1.0 in
    the short→long direction and < 1 the other way."""
    short = "alpha beta gamma delta epsilon"
    long = short + " zeta eta theta iota kappa " + "filler " * 20
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.0).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(2, 1)] < 0.5


def test_pack_sequences_bound_and_determinism(docs):
    """Streaming-pack bound: every pack's token total minus its last
    (straddling) doc stays under the budget; assignment is identical
    across calls."""
    out = text.pack_sequences(docs, max_tokens=512).collect()
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for toks in packs.values():
        assert sum(toks) - max(toks) < 512
    again = text.pack_sequences(docs, max_tokens=512).collect()
    assert {(r["doc_id"], r["pack_id"]) for r in again} == {
        (r["doc_id"], r["pack_id"]) for r in out
    }


def test_mixture_sample_rates(docs):
    """Kept fraction per source tracks its target rate; src0 keeps all;
    membership is deterministic."""
    rates = {"src0": 1.0, "src1": 0.5, "src3": 0.0}
    kept = text.mixture_sample(docs, rates, default_rate=0.1)
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src["src0"] == totals["src0"]
    assert "src3" not in by_src
    assert 0.2 <= by_src["src1"] / totals["src1"] <= 0.8  # small-n tolerance
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in text.mixture_sample(docs, rates, default_rate=0.1).collect()}
    assert a == b


def test_semantic_dedup_partitions_and_transitivity(emb):
    """semantic_dedup labels every vector exactly once; cluster reps are
    the min member id; merging is genuinely transitive (a cluster can be
    wider than any single pairwise edge's endpoints)."""
    out = dedup.semantic_dedup(emb, dim=64, threshold=0.25, n_planes=4)
    rows = out.collect()
    assert len(rows) == emb.count()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)  # label = min member id
    reps = [r for r in rows if r["is_rep"]]
    assert len(reps) == len(by_cluster)  # exactly one representative each
    # The survivors must be strictly fewer than the corpus (the sf0.01
    # embeddings contain same-label near-dup groups by construction).
    assert len(by_cluster) < len(rows)


def test_pq_topk_recall_and_determinism(emb):
    """Trained PQ (m=4, 256 codes) holds recall@5 ≥ 0.35 vs brute force
    (measured 0.55 at sf0.01); the LCG-portable variant is deterministic
    across runs (exact same rows — fixed-point ADC leaves no float
    wiggle)."""
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    books = similarity.trained_codebooks(emb, dim=64, m=4, n_codes=256)
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(
            emb, queries, k=5, dim=64, m=4, n_codes=256, codebooks=books
        ).collect()
    }
    assert len(pq & exact) / len(exact) >= 0.35
    run1 = sorted(map(tuple, similarity.pq_topk(emb, queries, k=5, dim=64).collect()))
    run2 = sorted(map(tuple, similarity.pq_topk(emb, queries, k=5, dim=64).collect()))
    assert run1 == run2


def test_cosine_topk_auto_dispatch_both_directions(emb):
    """cosine_topk_auto must route small query blocks to the JVM fold
    (no Python eval node in the plan) and large nq×dim blocks to the
    Arrow/BLAS tier (Python eval node present), with hash-identical
    results between the tiers on the same inputs."""
    small_q = emb.where(F.col("vec_id") < 10)
    auto_small = similarity.cosine_topk_auto(emb, small_q, k=3)
    plan = auto_small._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # JVM tier
    # force the BLAS direction with a tiny crossover
    auto_big = similarity.cosine_topk_auto(emb, small_q, k=3, crossover_cells=1)
    plan_b = auto_big._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan_b  # Arrow/numpy tier
    rows_small = sorted(map(tuple, auto_small.collect()))
    rows_big = sorted(map(tuple, auto_big.collect()))
    assert rows_small == rows_big  # tiers are hash-identical
    # the exact-tier guard still applies through the auto entry
    import pytest

    with pytest.raises(ValueError, match="exact/verification tier"):
        similarity.cosine_topk_auto(emb, emb, k=3, max_queries=5)


def test_pq_topk_rerank_restores_recall(emb):
    """ADC-shortlist + exact-rescore (rerank>0): recall@5 must meet or
    beat the pure-ADC ordering (it re-scores a superset of ADC's top-k
    with TRUE cosines), the returned scores are exact cosine (column
    'cosine', matching cosine_topk's values for agreeing pairs), and
    the corpus prune must survive planning (a trivially-true self-join
    predicate silently disabled it in the first r5 draft)."""
    queries = emb.where(F.col("vec_id") < 20)
    exact_rows = similarity.cosine_topk(emb, queries, k=5).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact_rows
    }
    books = similarity.trained_codebooks(emb, dim=64, m=4, n_codes=256)
    kw = dict(k=5, dim=64, m=4, n_codes=256, codebooks=books)
    plain = similarity.pq_topk(emb, queries, **kw)
    reranked = similarity.pq_topk(emb, queries, rerank=64, **kw)
    assert "cosine" in reranked.columns
    assert "LeftSemi" in reranked._jdf.queryExecution().executedPlan().toString()
    plain_set = {(r["query_id"], r["neighbor_id"]) for r in plain.collect()}
    rr_rows = reranked.collect()
    rr_set = {(r["query_id"], r["neighbor_id"]) for r in rr_rows}
    r_plain = len(plain_set & exact) / len(exact)
    r_rr = len(rr_set & exact) / len(exact)
    assert r_rr >= r_plain and r_rr >= 0.6, (r_plain, r_rr)
    for r in rr_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9


def test_fuzzy_join_pigeonhole_complete(spark):
    """Segment blocking loses no same-length distance-1 pair: operator
    output equals the brute-force cross-join answer."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators import fuzzyjoin

    sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzyjoin.edit_distance_pairs(
            sup, "s_name", "s_suppkey", max_distance=1
        ).collect()
    }
    a = sup.select(F.col("s_suppkey").alias("ka"), F.col("s_name").alias("na"))
    b = sup.select(F.col("s_suppkey").alias("kb"), F.col("s_name").alias("nb"))
    brute = {
        (r["ka"], r["kb"])
        for r in a.crossJoin(b)
        .where(
            (F.col("ka") < F.col("kb"))
            & (F.length("na") == F.length("nb"))
            & (F.levenshtein("na", "nb") <= 1)
        )
        .collect()
    }
    assert got == brute and len(brute) > 0


def test_ip4_functions_roundtrip_and_cidr(spark):
    """ipfn: dotted-quad ↔ long round-trip, malformed → NULL, CIDR
    containment and RFC1918 classification — all codegen expressions."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators import ipfn

    df = spark.createDataFrame(
        [
            ("10.0.0.1",), ("172.31.23.171",), ("192.168.1.9",), ("8.8.8.8",),
            ("256.1.1.1",), ("1.2.3",), ("not-an-ip",), ("0.0.0.0",),
            ("255.255.255.255",),
        ],
        "ip string",
    )
    rows = {
        r["ip"]: r
        for r in df.select(
            "ip",
            ipfn.ip4_to_long(F.col("ip")).alias("v"),
            ipfn.long_to_ip4(ipfn.ip4_to_long(F.col("ip"))).alias("back"),
            ipfn.is_private_ip(F.col("ip")).alias("priv"),
            ipfn.cidr_contains("172.16.0.0/12", F.col("ip")).alias("in172"),
        ).collect()
    }
    assert rows["10.0.0.1"]["v"] == 10 * 16777216 + 1
    for ip in ("10.0.0.1", "172.31.23.171", "192.168.1.9", "8.8.8.8",
               "0.0.0.0", "255.255.255.255"):
        assert rows[ip]["back"] == ip  # round-trip
    for bad in ("256.1.1.1", "1.2.3", "not-an-ip"):
        assert rows[bad]["v"] is None and rows[bad]["priv"] is None
    assert rows["10.0.0.1"]["priv"] and rows["192.168.1.9"]["priv"]
    assert rows["172.31.23.171"]["priv"]  # 172.31 ∈ 172.16/12
    assert rows["8.8.8.8"]["priv"] is False
    assert rows["172.31.23.171"]["in172"] and not rows["8.8.8.8"]["in172"]
    # cidr_range edges
    assert ipfn.cidr_range("0.0.0.0/0") == (0, 4294967295)
    assert ipfn.cidr_range("192.168.1.9/32") == (
        ipfn.cidr_range("192.168.1.9/32")[0],
        ipfn.cidr_range("192.168.1.9/32")[0],
    )


def test_ip_top_talkers_on_vpcflow_fixture(spark, tmpdir_path):
    """The canonical reference query (FIXTURES.md B1: top talkers by
    srcaddr) extended with the IP functions over a real ingested
    VPCFlow table."""
    from pyspark.sql import functions as F

    from logverzcore_spark.ingest import CollectJob, collect
    from logverzcore_spark.operators import ipfn
    from rawfixtures import write_vpcflow_gz

    write_vpcflow_gz(tmpdir_path, n_files=2)
    collect(spark, CollectJob(path=tmpdir_path, datatype="VPCFlow", table_name="ipf_t"))
    try:
        talkers = (
            spark.table("ipf_t")
            .groupBy("srcaddr", ipfn.is_private_ip(F.col("srcaddr")).alias("private"))
            .agg(F.sum("bytes").alias("total_bytes"))
            .orderBy(F.col("total_bytes").desc())
        ).collect()
        assert all(r["private"] is True for r in talkers)  # 10.x sources
        assert talkers[0]["total_bytes"] >= talkers[-1]["total_bytes"]
    finally:
        spark.sql("DROP TABLE IF EXISTS ipf_t")


def test_sniff_image_meta_on_genuine_headers(spark):
    """Parse REAL image headers (a valid 1x1 PNG, a GIF89a, and garbage
    bytes) — the sniffing expressions must read exactly the bytes a
    compliant encoder writes."""
    import struct
    import zlib

    from pyspark.sql import functions as F

    from logverzcore_spark.operators.multimodal import sniff_image_meta

    def png_bytes(w, h):
        sig = bytes([0x89]) + b"PNG\r\n\x1a\n"
        ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
        chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        return sig + chunk

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes([0xF7, 0, 0])
    rows = [
        (1, bytearray(png_bytes(1, 1))),
        (2, bytearray(png_bytes(1920, 1080))),
        (3, bytearray(gif)),
        (4, bytearray(b"\xff\xd8\xff\xe0 not sniffable (jpeg)")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in sniff_image_meta(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 1, 1)
    assert (got[2]["width"], got[2]["height"], got[2]["n_pixels"]) == (
        1920, 1080, 1920 * 1080,
    )
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 320, 200)
    assert got[4]["format"] == "unknown" and got[4]["width"] is None
    # codegen-only: no Python eval nodes in the plan
    plan = sniff_image_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_index_build_probe_prunes_and_matches(spark, tmpdir_path):
    """Build-once/probe-many IVF: the persisted index probe must (a)
    return exactly what the ad-hoc ivf_topk computes with the same
    centroids, and (b) physically read ONLY the probed cell partitions."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_probe,
        ivf_topk,
        lcg_centroids,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = lcg_centroids(dim, 8)
    tbl = "ivf_idx_test"
    try:
        ivf_index_build(emb, tbl, n_cells=8, centroids=cents)
        queries = emb.orderBy("vec_id").limit(3)
        got = ivf_index_probe(spark, queries, tbl, k=5, nprobe=2)
        want = ivf_topk(emb, queries, k=5, n_cells=8, nprobe=2, centroids=cents)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

        # pruning: the probed scan touches fewer partition dirs than exist
        all_cells = {
            r["cell"] for r in spark.table(tbl).select("cell").distinct().collect()
        }
        probed = spark.table(tbl).where(F.col("cell").isin([0, 1]))
        touched = {f.split("cell=")[1].split("/")[0] for f in probed.inputFiles()}
        assert touched <= {"0", "1"} and len(all_cells) > 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_centroids")


def test_ivf_index_append_equals_rebuild_and_touches_only_its_cells(spark):
    """Incremental IVF maintenance: append(delta) over a base index must
    equal a from-scratch build over the union (same centroids), create
    files ONLY under the touched cell directories (untouched partitions'
    file sets unchanged — the O(batch) cost claim), and be idempotent
    under redelivery (the dedupe anti-join)."""
    import os

    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        lcg_centroids,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = lcg_centroids(dim, 8)
    inc, full = "ivf_append_test", "ivf_full_test"
    try:
        base = emb.where(F.col("vec_id") % 4 != 0)
        delta = emb.where(F.col("vec_id") % 4 == 0)
        ivf_index_build(base, inc, n_cells=8, centroids=cents)
        files_before = {
            f for f in spark.table(inc).inputFiles()
        }
        stats = ivf_index_append(spark, delta, inc)
        assert stats["appended"] == delta.count() and stats["skipped_existing"] == 0

        # untouched partitions: identical file sets; touched: superset
        spark.catalog.refreshTable(inc)
        files_after = {f for f in spark.table(inc).inputFiles()}
        assert files_before <= files_after
        touched = {str(c) for c in stats["touched_cells"]}
        for f in files_after - files_before:
            cell = f.split("cell=")[1].split("/")[0]
            assert cell in touched

        # contents equal a from-scratch build over the union
        ivf_index_build(emb, full, n_cells=8, centroids=cents)
        a = spark.table(inc).select("nid", "cell")
        b = spark.table(full).select("nid", "cell")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

        # redelivering the same delta is a no-op
        stats2 = ivf_index_append(spark, delta, inc)
        assert stats2["appended"] == 0
        assert stats2["skipped_existing"] == delta.count()
        spark.catalog.refreshTable(inc)
        assert spark.table(inc).count() == emb.count()

        # duplicates WITHIN one batch (a redelivered source can repeat a
        # row inside a single micro-batch) must also collapse: fresh ids
        # appended once each, repeats counted as skipped, no dup rows.
        fresh = spark.range(100000, 100003).select(
            F.col("id").alias("vec_id"),
            F.expr(f"array_repeat(cast(0.5 as double), {dim})").alias("embedding"),
        )
        doubled = fresh.unionByName(fresh)
        stats3 = ivf_index_append(spark, doubled, inc)
        assert stats3["appended"] == 3
        assert stats3["skipped_existing"] == 3
        spark.catalog.refreshTable(inc)
        dupes = (
            spark.table(inc).groupBy("nid").count().where(F.col("count") > 1)
        )
        assert dupes.count() == 0
    finally:
        for t in (inc, full):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(f"DROP TABLE IF EXISTS {t}_centroids")


def test_ivf_index_apply_changes_follows_dml(spark, tmpdir_path):
    """CDF → IVF index maintenance: applying a read_changes span that
    carries a delete band, an update band (negated vectors — guaranteed
    cell moves), and an appended batch must leave the index EXACTLY
    equal to a from-scratch rebuild over the post-DML corpus (same
    centroids), touch only the span's cells on disk, and converge under
    redelivery (re-applying the same span is an end-state no-op)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivf_index_apply_changes,
        ivf_index_build,
        lcg_centroids,
    )
    from logverzcore_spark.snapshots import SnapshotTable

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = lcg_centroids(dim, 8)
    root = os.path.join(str(tmpdir_path), f"ivfcdf_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(root)
    t.append(emb.repartition(4))
    v0 = t.versions(spark)[-1]
    mx = emb.agg(F.max("vec_id")).first()[0]

    idx = f"ivf_cdf_{uuid.uuid4().hex[:8]}"
    full = f"ivf_cdf_full_{uuid.uuid4().hex[:8]}"
    try:
        ivf_index_build(t.read(spark), idx, n_cells=8, centroids=cents)
        files_before = set(spark.table(idx).inputFiles())

        t.delete_where(
            spark, {"vec_id": {"between": [mx // 5, mx // 4]}}
        )
        t.update_where(
            spark,
            {"vec_id": {"between": [mx // 2, mx // 2 + mx // 10]}},
            {"embedding": "transform(embedding, x -> -x)"},
        )
        fresh = (
            emb.where(F.col("vec_id") <= mx // 20)
            .withColumn("vec_id", F.col("vec_id") + F.lit(mx + 1))
            .withColumn("embedding", F.reverse("embedding"))
        )
        t.append(fresh.coalesce(1))

        changes = t.read_changes(spark, v0, keys="vec_id")
        rep = ivf_index_apply_changes(spark, changes, idx)
        assert rep["upserted"] > 0 and rep["removed"] > 0

        # untouched partitions' file sets are byte-identical
        files_after = set(spark.table(idx).inputFiles())
        touched = {str(c) for c in rep["touched_cells"]}
        for f in files_before.symmetric_difference(files_after):
            assert f.split("cell=")[1].split("/")[0] in touched

        # index == rebuild over the post-DML corpus
        ivf_index_build(t.read(spark), full, n_cells=8, centroids=cents)
        a = spark.table(idx).select("nid", "cell", "nvec")
        b = spark.table(full).select("nid", "cell", "nvec")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

        # redelivered span: end state unchanged (at-least-once safe)
        ivf_index_apply_changes(spark, changes, idx)
        a2 = spark.table(idx).select("nid", "cell", "nvec")
        assert a2.exceptAll(b).count() == 0 and b.exceptAll(a2).count() == 0
    finally:
        for tb in (idx, full):
            spark.sql(f"DROP TABLE IF EXISTS {tb}")
            spark.sql(f"DROP TABLE IF EXISTS {tb}_centroids")


def test_ivf_index_apply_changes_drops_emptied_cells(spark, tmpdir_path):
    """Deleting every source row of one cell must physically DROP that
    cell's partition (a stale partition would keep serving erased
    vectors to probes — the GDPR propagation claim), and a NULL vector
    image must raise rather than silently lose its row."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivf_index_apply_changes,
        ivf_index_build,
        lcg_centroids,
    )
    from logverzcore_spark.snapshots import SnapshotTable

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = lcg_centroids(dim, 8)
    root = os.path.join(str(tmpdir_path), f"ivfdrop_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(root)
    t.append(emb.repartition(2))
    v0 = t.versions(spark)[-1]

    idx = f"ivf_drop_{uuid.uuid4().hex[:8]}"
    try:
        ivf_index_build(t.read(spark), idx, n_cells=8, centroids=cents)
        # pick the smallest populated cell and erase its source ids
        by_cell = (
            spark.table(idx).groupBy("cell").count().orderBy("count", "cell")
        ).first()
        victim = by_cell["cell"]
        ids = [
            r["nid"]
            for r in spark.table(idx)
            .where(F.col("cell") == victim)
            .select("nid")
            .collect()
        ]
        t.delete_where(spark, {"vec_id": {"in": ids}})
        changes = t.read_changes(spark, v0, keys="vec_id")
        rep = ivf_index_apply_changes(spark, changes, idx)
        assert victim in rep["dropped_cells"]
        spark.catalog.refreshTable(idx)
        assert (
            spark.table(idx).where(F.col("cell") == victim).count() == 0
        )
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {idx}")
            .where("col_name='Location'")
            .collect()[0][1]
            .replace("file:", "")
        )
        assert not os.path.exists(os.path.join(loc, f"cell={victim}"))

        # NULL image refuses
        bad = changes.withColumn(
            "embedding",
            F.when(F.lit(True), F.lit(None)).cast("array<float>"),
        )
        with pytest.raises(ValueError, match="NULL vector image"):
            ivf_index_apply_changes(spark, bad, idx)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {idx}")
        spark.sql(f"DROP TABLE IF EXISTS {idx}_centroids")


def test_ivf_index_apply_changes_kill_mid_apply_loses_no_rows(
    spark, tmpdir_path
):
    """r12 verdict task 2 (the crash-atomicity fix, fault-injected):
    the apply's destructive steps are now (1) ONE dynamic partition
    overwrite landing every kept cell's new generation, then (2) drops
    of cells the span emptied. Killing the apply at either point must
    lose no carried row:

    - crash BEFORE the overwrite executes → the index is byte-for-byte
      untouched;
    - crash AFTER the overwrite, BEFORE the emptied-cell drop (the old
      code's data-loss window: partitions were dropped before the
      staged survivors landed) → every carried row is still present,
      the only residue is rows the span resolved ABSENT in the not-yet-
      dropped cell, and re-applying the same span converges to the
      rebuild."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivf_index_apply_changes,
        ivf_index_build,
        lcg_centroids,
    )
    from logverzcore_spark.snapshots import SnapshotTable

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = lcg_centroids(dim, 8)
    root = os.path.join(str(tmpdir_path), f"ivfkill_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(root)
    t.append(emb.repartition(2))
    v0 = t.versions(spark)[-1]
    mx = emb.agg(F.max("vec_id")).first()[0]

    idx = f"ivf_kill_{uuid.uuid4().hex[:8]}"
    full = f"ivf_kill_full_{uuid.uuid4().hex[:8]}"
    try:
        ivf_index_build(t.read(spark), idx, n_cells=8, centroids=cents)
        # DML: erase one whole cell's ids (guarantees an emptied cell →
        # a post-overwrite DROP step to crash before) + negate a band
        # (guarantees kept-cell rewrites with carried rows at stake).
        victim = (
            spark.table(idx).groupBy("cell").count().orderBy("count", "cell")
        ).first()["cell"]
        victim_ids = [
            r["nid"] for r in spark.table(idx)
            .where(F.col("cell") == victim).select("nid").collect()
        ]
        t.delete_where(spark, {"vec_id": {"in": victim_ids}})
        # scale (not negate): cell assignment normalizes, so updated
        # rows keep their cells — the emptied victim cell can never be
        # repopulated by an upsert, making the DROP step deterministic
        t.update_where(
            spark,
            {"vec_id": {"between": [mx // 2, mx // 2 + mx // 10]}},
            {"embedding": "transform(embedding, x -> x * 2.0d)"},
        )
        changes = t.read_changes(spark, v0, keys="vec_id")
        resolved = {r["vec_id"] for r in changes.select("vec_id").collect()}
        before = {
            (r["nid"], r["cell"])
            for r in spark.table(idx).select("nid", "cell").collect()
        }
        carried = {p for p in before if p[0] not in resolved}

        # crash 1: before the overwrite write executes → untouched
        from pyspark.sql.readwriter import DataFrameWriter

        real_insert = DataFrameWriter.insertInto

        def boom_insert(self, *a, **k):
            raise RuntimeError("injected crash before overwrite")

        DataFrameWriter.insertInto = boom_insert
        try:
            with pytest.raises(RuntimeError, match="before overwrite"):
                ivf_index_apply_changes(spark, changes, idx)
        finally:
            DataFrameWriter.insertInto = real_insert
        spark.catalog.refreshTable(idx)
        now = {
            (r["nid"], r["cell"])
            for r in spark.table(idx).select("nid", "cell").collect()
        }
        assert now == before  # nothing mutated

        # crash 2: after the overwrite, before the emptied-cell drop
        real_sql = spark.sql

        def boom_sql(q, *a, **k):
            if "DROP IF EXISTS PARTITION" in str(q):
                raise RuntimeError("injected crash before drop")
            return real_sql(q, *a, **k)

        spark.sql = boom_sql
        try:
            with pytest.raises(RuntimeError, match="before drop"):
                ivf_index_apply_changes(spark, changes, idx)
        finally:
            spark.sql = real_sql
        spark.catalog.refreshTable(idx)
        mid = {
            (r["nid"], r["cell"])
            for r in spark.table(idx).select("nid", "cell").collect()
        }
        # NO carried row was lost (the old code lost every carried row
        # of a touched cell here); the emptied victim cell still holds
        # its resolved-absent residue (the drop never ran — that is
        # the crash), which the re-apply below removes.
        assert carried <= mid
        assert {(i, victim) for i in victim_ids} <= mid

        # re-apply heals: end state == rebuild over the post-DML corpus
        ivf_index_apply_changes(spark, changes, idx)
        ivf_index_build(t.read(spark), full, n_cells=8, centroids=cents)
        a = spark.table(idx).select("nid", "cell", "nvec")
        b = spark.table(full).select("nid", "cell", "nvec")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    finally:
        for tb in (idx, full):
            spark.sql(f"DROP TABLE IF EXISTS {tb}")
            spark.sql(f"DROP TABLE IF EXISTS {tb}_centroids")


def test_cdc_index_stream_composite_key_refused(spark, tmpdir_path):
    """r12 ADVICE: a composite merge key would be collapsed to its
    first component when driving index maintenance — two source rows
    sharing that component net-resolve as one id and the removal join
    deletes both stored vectors. The stream must refuse loudly."""
    import os
    import uuid

    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import cdc_index_stream

    root = os.path.join(str(tmpdir_path), f"cdcck_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(root)
    with pytest.raises(ValueError, match="single unique id column"):
        cdc_index_stream(
            spark,
            stream_df=None,  # refused before the stream is touched
            table=t,
            index_table=f"idx_{uuid.uuid4().hex[:8]}",
            on=["vec_id", "part"],
        )


def test_cdc_index_stream_watermark_rewind_converges(spark, tmpdir_path):
    """cdc_index_stream's crash window: a trigger whose index apply
    landed but whose watermark write didn't re-applies the span on the
    next trigger — which must CONVERGE (net-state upsert), leaving the
    index equal to a from-scratch rebuild. Also proves the watermark
    table tracks the source head and a second drain of the same feed
    is all noops."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from logverzcore_spark.operators.similarity import (
        ivf_index_build,
        lcg_centroids,
    )
    from logverzcore_spark.snapshots import SnapshotTable
    from logverzcore_spark.streaming.avro_stream import cdc_index_stream

    dim = 8

    def vec(col):
        return F.array(*[
            (F.pmod(col * F.lit(s), F.lit(997)) / 997.0 - 0.5)
            for s in (7919, 104729, 1299709, 15485863, 31, 53, 71, 97)
        ]).cast("array<double>")

    base = spark.range(0, 200).select(
        F.col("id").alias("vec_id")
    ).withColumn("embedding", vec(F.col("vec_id")))
    root = os.path.join(str(tmpdir_path), f"cis_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(os.path.join(root, "src"))
    t.append(base.repartition(4))
    cents = lcg_centroids(dim, 8)
    idx = f"cis_idx_{uuid.uuid4().hex[:8]}"
    full = f"{idx}_full"
    try:
        ivf_index_build(t.read(spark), idx, n_cells=8, centroids=cents)
        src = os.path.join(root, "cdc")
        k = F.col("vec_id")
        live = F.lit(False).alias("__deleted")
        dead = F.lit(True).alias("__deleted")
        # batch 1: delete ids 10-29, upsert negated 50-69
        b1 = (
            base.where((k >= 10) & (k < 30)).select(k, "embedding", dead)
            .unionByName(
                base.where((k >= 50) & (k < 70)).select(
                    k,
                    F.transform("embedding", lambda x: -x).alias("embedding"),
                    live,
                )
            )
        )
        b1.coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        ck = os.path.join(root, "ck")
        reports: list = []

        def drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            cdc_index_stream(
                spark, stream, t, idx, on="vec_id",
                delete_col="__deleted", checkpoint_dir=ck,
                on_apply=reports.append,
            ).awaitTermination()

        drain()
        assert reports and not reports[0]["noop"]
        head = t.versions(spark)[-1]
        assert spark.table(f"{idx}_applied").first()["v"] == head

        def assert_equals_rebuild():
            ivf_index_build(t.read(spark), full, n_cells=8, centroids=cents)
            a = spark.table(idx).select("nid", "cell", "nvec")
            b = spark.table(full).select("nid", "cell", "nvec")
            assert a.exceptAll(b).count() == 0
            assert b.exceptAll(a).count() == 0

        assert_equals_rebuild()

        # crash window: the apply landed, the watermark write didn't —
        # rewind it to the pre-stream version and feed one more batch:
        # the next trigger re-covers the already-applied span plus the
        # new commits, and must converge
        spark.createDataFrame(
            [(t.versions(spark)[0],)], "v bigint"
        ).write.mode("overwrite").saveAsTable(f"{idx}_applied")
        import time as _time

        _time.sleep(1.1)
        b2 = base.where((k >= 100) & (k < 110)).select(
            (k + 1000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"), live,
        )
        b2.coalesce(1).write.mode("append").parquet(src)
        drain()
        assert spark.table(f"{idx}_applied").first()["v"] == (
            t.versions(spark)[-1]
        )
        assert_equals_rebuild()

        # same feed again, fresh checkpoint: merges no-op on tags, no
        # new versions, applies are empty-span noops
        import shutil

        shutil.rmtree(ck)
        n = len(reports)
        drain()
        assert all(r["noop"] for r in reports[n:]), reports[n:]
    finally:
        for tb in (idx, full, f"{idx}_applied", f"{idx}_centroids",
                   f"{full}_centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_ivf_index_recenter_refits_and_preserves_rows(spark):
    """Recentering rebuilds the index from its own rows with fresh
    centroids: same row set, a fresh centroid table, and probe still
    answers (the drift-maintenance step for append-maintained indexes)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_probe,
        ivf_index_recenter,
        lcg_centroids,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    tbl = "ivf_recenter_test"
    try:
        # deliberately poor centroids (random directions) → recenter to
        # data-fitted ones
        ivf_index_build(emb, tbl, n_cells=8, centroids=lcg_centroids(dim, 8))
        ids_before = sorted(r["nid"] for r in spark.table(tbl).select("nid").collect())
        ivf_index_recenter(spark, tbl)
        spark.catalog.refreshTable(tbl)
        ids_after = sorted(r["nid"] for r in spark.table(tbl).select("nid").collect())
        assert ids_before == ids_after
        queries = emb.orderBy("vec_id").limit(2)
        got = ivf_index_probe(spark, queries, tbl, k=3, nprobe=3)
        assert (
            got.groupBy("query_id").count().agg(F.min("count")).first()[0] >= 1
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_centroids")


def test_ivf_append_stream_replay_idempotent(spark, tmpdir_path):
    """Streaming wiring: an embedding stream folds into the index via
    foreachBatch; replaying the same files through a FRESH stream (new
    checkpoint — forced redelivery) adds no duplicate rows."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import ivf_index_build, lcg_centroids
    from logverzcore_spark.streaming.ivf_stream import ivf_append_stream

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    base = emb.where(F.col("vec_id") % 4 != 0)
    delta = emb.where(F.col("vec_id") % 4 == 0).select("vec_id", "embedding")
    src = f"{tmpdir_path}/vec_stream"
    delta.write.parquet(src)
    tbl = "ivf_stream_test"
    try:
        ivf_index_build(base, tbl, n_cells=8, centroids=lcg_centroids(dim, 8))
        schema = spark.read.parquet(src).schema
        for ck in ("ck1", "ck2"):  # second pass = full redelivery
            stream = spark.readStream.schema(schema).parquet(src)
            q = ivf_append_stream(
                spark, stream, tbl,
                checkpoint_dir=f"{tmpdir_path}/{ck}",
            )
            q.awaitTermination()
        spark.catalog.refreshTable(tbl)
        assert spark.table(tbl).count() == emb.count()
        assert spark.table(tbl).select("nid").distinct().count() == emb.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_centroids")


def test_curate_embeddings_stage_handoff(spark):
    """Composition invariants: every selected vector is a semantic-dedup
    REPRESENTATIVE, no cell exceeds its quota, and the split labels
    partition the selection."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators import dedup
    from logverzcore_spark.pipeline import curate_embeddings

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = curate_embeddings(emb).cache()
    try:
        reps = {
            r["vec_id"]
            for r in dedup.semantic_dedup(emb, dim=64, threshold=0.25, n_planes=4)
            .where("is_rep")
            .collect()
        }
        assert {r["vec_id"] for r in out.collect()} <= reps
        assert out.groupBy("cell").count().agg(F.max("count")).first()[0] <= 5
        assert {r["split"] for r in out.select("split").distinct().collect()} <= {
            "train", "val", "test",
        }
    finally:
        out.unpersist()


def test_sniff_webp_meta_all_three_layouts(spark):
    """WebP dims from genuine container bytes for VP8X (24-bit LE
    canvas), VP8L (14+14-bit packed), and VP8 lossy (sync-coded 14-bit)
    — plus honest 'unknown' when the layout signature is absent. Stays
    codegen-only (no Python eval nodes in the plan)."""
    import struct

    from logverzcore_spark.operators.multimodal import sniff_image_meta

    def riff(chunk: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    def vp8x(w, h):
        body = b"\x00\x00\x00\x00" + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        return riff(b"VP8X" + struct.pack("<I", len(body)) + body)

    def vp8l(w, h):
        bits = (w - 1) | ((h - 1) << 14)
        body = b"\x2f" + struct.pack("<I", bits)
        return riff(b"VP8L" + struct.pack("<I", len(body)) + body)

    def vp8(w, h):
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
        return riff(b"VP8 " + struct.pack("<I", len(body)) + body)

    rows = [
        (1, bytearray(vp8x(4000, 3000))),
        (2, bytearray(vp8l(1234, 5678))),
        (3, bytearray(vp8(640, 480))),
        # VP8L without the 0x2F signature byte → unknown
        (4, bytearray(riff(b"VP8L" + struct.pack("<I", 5) + b"\x00" + struct.pack("<I", 99)))),
        # VP8 without the 9D012A sync code → unknown
        (5, bytearray(riff(b"VP8 " + struct.pack("<I", 10) + bytes(10)))),
        (6, bytearray(b"RIFF1234WAVEfmt  not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sniffed = sniff_image_meta(df)
    got = {r["doc_id"]: r for r in sniffed.collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("webp", 4000, 3000)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("webp", 1234, 5678)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("webp", 640, 480)
    for bad in (4, 5, 6):
        assert got[bad]["format"] == "unknown" and got[bad]["width"] is None
    plan = sniffed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parse_jpeg_meta_walks_segments(spark):
    """JPEG SOF parsing must survive real segment-chain shapes: leading
    APPn/DQT segments of arbitrary length, fill bytes before markers,
    progressive SOF2, and must honestly report 'unknown' for truncated
    chains, SOS-before-SOF, and non-JPEG bytes."""
    import struct

    from logverzcore_spark.operators.multimodal import parse_jpeg_meta

    def seg(marker, body=b""):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sof(marker, w, h, ncomp=3):
        body = b"\x08" + struct.pack(">HH", h, w) + bytes([ncomp]) + b"\x01\x22\x00" * ncomp
        return seg(marker, body)

    soi, eoi = b"\xff\xd8", b"\xff\xd9"
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes(65))
    rows = [
        (1, bytearray(soi + app0 + dqt + sof(0xC0, 640, 480) + eoi)),
        # fill bytes (0xFF padding) before the SOF marker
        (2, bytearray(soi + app0 + b"\xff" + sof(0xC2, 1920, 1080) + eoi)),
        # SOS before any SOF → unknown
        (3, bytearray(soi + app0 + seg(0xDA, b"\x01\x01\x00") + eoi)),
        # truncated segment length past the buffer → unknown
        (4, bytearray(soi + b"\xff\xe1\xff\xff" + b"short")),
        (5, bytearray(b"GIF89a not a jpeg")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in parse_jpeg_meta(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"],
            got[1]["n_components"], got[1]["progressive"]) == ("jpeg", 640, 480, 3, False)
    assert (got[2]["format"], got[2]["width"], got[2]["height"],
            got[2]["progressive"]) == ("jpeg", 1920, 1080, True)
    for bad in (3, 4, 5):
        assert got[bad]["format"] == "unknown" and got[bad]["width"] is None


def test_sniff_wav_meta_on_genuine_header(spark):
    """Parse a REAL canonical WAV header built with struct.pack, plus
    garbage bytes — offsets must match what an encoder writes."""
    import struct

    from logverzcore_spark.operators.multimodal import sniff_wav_meta

    def wav_bytes(ch, rate, bits):
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                          ch * bits // 8, bits)
        return (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 0))

    # A valid RIFF/WAVE whose fmt chunk is NOT first (JUNK padding, as
    # pro-audio encoders emit) must honestly report 'unknown' rather
    # than read garbage at the canonical offsets (r3 ADVICE).
    junk_first = (b"RIFF" + struct.pack("<I", 60) + b"WAVE"
                  + b"JUNK" + struct.pack("<I", 16) + b"\x00" * 16
                  + b"fmt " + struct.pack("<I", 16)
                  + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
                  + b"data" + struct.pack("<I", 0))

    rows = [
        (1, bytearray(wav_bytes(2, 44100, 16))),
        (2, bytearray(wav_bytes(1, 48000, 24))),
        (3, bytearray(b"OggS not a wav")),
        (4, bytearray(junk_first)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in sniff_wav_meta(df).collect()}
    assert (got[1]["format"], got[1]["channels"], got[1]["sample_rate"],
            got[1]["bits_per_sample"]) == ("wav", 2, 44100, 16)
    assert (got[2]["channels"], got[2]["sample_rate"],
            got[2]["bits_per_sample"]) == (1, 48000, 24)
    assert got[3]["format"] == "unknown" and got[3]["sample_rate"] is None
    assert got[4]["format"] == "unknown" and got[4]["channels"] is None


def test_minhash_band_buckets_mismatch_fails_fast(spark, docs):
    """A num_hashes wider than the signature array must raise loudly
    when buckets are consumed — F.get's out-of-bounds NULL would
    otherwise be silently SKIPPED by xxhash64, collapsing the whole
    corpus into one bucket per band (regression guard for the r5
    packed-sig interface; the old m{i}-column form failed at plan
    time)."""
    import pytest as _pt

    sig = dedup.minhash_signature_sets(
        docs.limit(20), num_hashes=32, with_sets=False, persist=False
    )
    ok = dedup.minhash_band_buckets(sig, num_hashes=32, bands=16)
    assert ok.agg(F.countDistinct("bucket")).first()[0] > 1
    bad = dedup.minhash_band_buckets(sig, num_hashes=64, bands=32)
    with _pt.raises(Exception, match="signature array has 32 mins"):
        bad.agg(F.countDistinct("bucket")).collect()


def test_ivfpq_index_build_probe_prunes_and_reranks(spark):
    """IVF-PQ composed index (r6): the persisted probe must (a) rank
    exactly like an independent in-test ADC replay over the probed
    cells, (b) physically read ONLY the probed cell partitions, and
    (c) with rerank, return TRUE cosines for every returned pair
    (rescored from the raw source, not the codes)."""
    import numpy as np

    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        PQ_SCALE,
        ivfpq_index_build,
        ivfpq_index_probe,
        lcg_centroids,
        lcg_codebooks,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents, books = lcg_centroids(dim, 8), lcg_codebooks(dim, 8, 16)
    tbl = "ivfpq_idx_test"
    try:
        ivfpq_index_build(
            emb, tbl, n_cells=8, m=8, n_codes=16, dim=dim,
            centroids=cents, codebooks=books,
        )
        queries = emb.orderBy("vec_id").limit(3)
        got = ivfpq_index_probe(spark, queries, tbl, k=5, nprobe=2).collect()

        # independent numpy replay of cell-assign + encode + ADC + rank
        E = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
        cmat, C = np.array(cents), np.array(books)
        m, n_codes, sub = C.shape
        c2 = (C * C).sum(axis=2)
        c2i = np.floor(c2 * PQ_SCALE + 0.5).astype(np.int64)
        ids = sorted(E)
        X = np.array([E[i] for i in ids])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cell = np.argsort(-(Xn @ cmat.T), axis=1, kind="stable")[:, 0]
        codes = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            d = c2[s][None, :] - 2.0 * (X[:, s*sub:(s+1)*sub] @ C[s].T)
            codes[:, s] = np.floor(d * PQ_SCALE + 0.5).argmin(axis=1)
        recon = c2i[np.arange(m), codes].sum(axis=1)
        qids = sorted(E)[:3]
        expect = {}
        for qid in qids:
            q = E[qid]
            qn = np.linalg.norm(q)
            pcells = np.argsort(
                -((q / qn) @ cmat.T), kind="stable"
            )[:2]
            lut = np.stack(
                [q[s*sub:(s+1)*sub] @ C[s].T for s in range(m)]
            )
            lut_i = np.floor(lut * PQ_SCALE + 0.5).astype(np.int64)
            cand = [
                (int(lut_i[np.arange(m), codes[b]].sum()), int(recon[b]), ids[b])
                for b in range(len(ids))
                if cell[b] in pcells and ids[b] != qid
            ]
            top = sorted(
                cand, key=lambda t: (-((t[0]/PQ_SCALE)/np.sqrt(t[1]/PQ_SCALE)), t[2])
            )[:5]
            for rank, (_a, _r, nid) in enumerate(top, 1):
                expect[(qid, rank)] = nid
        assert len(got) == len(expect)
        for r in got:
            assert expect[(r["query_id"], r["rank"])] == r["neighbor_id"], r

        # pruning: a 2-cell filter reads only those partition dirs
        probed = spark.table(tbl).where(F.col("cell").isin([0, 1]))
        touched = {f.split("cell=")[1].split("/")[0] for f in probed.inputFiles()}
        all_cells = {
            r["cell"] for r in spark.table(tbl).select("cell").distinct().collect()
        }
        assert touched <= {"0", "1"} and len(all_cells) > 2

        # rerank returns true cosines; rerank without a source raises
        rr = ivfpq_index_probe(
            spark, queries, tbl, k=5, nprobe=2, rerank=16, rerank_source=emb
        ).collect()
        for r in rr:
            q, n = E[r["query_id"]], E[r["neighbor_id"]]
            want = round(
                float(q @ n / (np.linalg.norm(q) * np.linalg.norm(n))), 6
            )
            assert abs(want - r["cosine"]) < 1e-9, r
        import pytest as _pytest

        with _pytest.raises(ValueError, match="rerank_source"):
            ivfpq_index_probe(spark, queries, tbl, k=5, nprobe=2, rerank=16)
    finally:
        for t in (tbl, f"{tbl}_centroids", f"{tbl}_codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivfpq_index_append_equals_rebuild(spark):
    """IVF-PQ append ≡ rebuild: cell AND codes of appended rows match a
    from-scratch build over the union (encode depends only on the
    STORED centroid/codebook tables), untouched partitions keep their
    file sets, and redelivery is a no-op."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        lcg_centroids,
        lcg_codebooks,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents, books = lcg_centroids(dim, 8), lcg_codebooks(dim, 8, 16)
    inc, full = "ivfpq_append_test", "ivfpq_full_test"
    try:
        base = emb.where(F.col("vec_id") % 4 != 0)
        delta = emb.where(F.col("vec_id") % 4 == 0)
        ivfpq_index_build(
            base, inc, n_cells=8, m=8, n_codes=16, dim=dim,
            centroids=cents, codebooks=books,
        )
        files_before = set(spark.table(inc).inputFiles())
        stats = ivfpq_index_append(spark, delta, inc)
        assert stats["appended"] == delta.count()
        assert stats["skipped_existing"] == 0

        spark.catalog.refreshTable(inc)
        files_after = set(spark.table(inc).inputFiles())
        assert files_before <= files_after
        touched = {str(c) for c in stats["touched_cells"]}
        for f in files_after - files_before:
            assert f.split("cell=")[1].split("/")[0] in touched

        ivfpq_index_build(
            emb, full, n_cells=8, m=8, n_codes=16, dim=dim,
            centroids=cents, codebooks=books,
        )
        a = spark.table(inc).select("nid", "cell", "codes", "recon")
        b = spark.table(full).select("nid", "cell", "codes", "recon")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

        stats2 = ivfpq_index_append(spark, delta, inc)
        assert stats2["appended"] == 0
        assert stats2["skipped_existing"] == delta.count()
    finally:
        for t in (inc, full):
            for suffix in ("", "_centroids", "_codebooks"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


def test_ivfpq_probe_recall_floor(spark, emb):
    """s11's configuration at test scale: trained codebooks + exact
    rerank must clear the s03 pruning envelope (the rerank recovers the
    PQ loss, so cell pruning is the binding constraint)."""
    from logverzcore_spark.operators.similarity import (
        cosine_topk,
        ivfpq_index_build,
        ivfpq_index_probe,
        trained_codebooks,
    )

    queries = emb.where(F.col("vec_id") < 10)
    dim = len(emb.select("embedding").first()[0])
    tbl = "ivfpq_recall_test"
    try:
        books = trained_codebooks(emb, dim=dim, m=4, n_codes=256)
        ivfpq_index_build(
            emb, tbl, n_cells=8, m=4, n_codes=256, dim=dim, codebooks=books
        )
        approx = ivfpq_index_probe(
            spark, queries, tbl, k=5, nprobe=4, rerank=64, rerank_source=emb
        ).collect()
        exact = cosine_topk(emb, queries, k=5).collect()
        exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
        approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.5, f"IVF-PQ recall {recall}"
    finally:
        for suffix in ("", "_centroids", "_codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}{suffix}")


def test_parse_mp4_meta_box_walk_and_edges(spark):
    """MP4/ISO-BMFF walk (r6): well-formed v0 and v1 files parse every
    field; 64-bit largesize and size==0 (to-end) boxes are honored;
    the mdat body is skipped by length; truncation after ftyp reports
    'mp4' with NULL media fields; garbage reports 'unknown'."""
    import struct

    from logverzcore_spark.operators.multimodal import parse_mp4_meta

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ, ver, payload):
        return box(typ, bytes([ver, 0, 0, 0]) + payload)

    def mvhd(ver, timescale, duration):
        if ver == 0:
            head = struct.pack(">IIII", 0, 0, timescale, duration)
        else:
            head = struct.pack(">QQIQ", 0, 0, timescale, duration)
        return full(b"mvhd", ver, head + struct.pack(">I", 0x10000)
                    + struct.pack(">HH", 0x0100, 0) + b"\x00" * 8
                    + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2))

    def tkhd(ver, track_id, duration, w, h):
        if ver == 0:
            head = (struct.pack(">IIII", 0, 0, track_id, 0)
                    + struct.pack(">I", duration))
        else:
            head = (struct.pack(">QQI", 0, 0, track_id)
                    + struct.pack(">I", 0) + struct.pack(">Q", duration))
        return full(b"tkhd", ver, head + b"\x00" * 16 + b"\x00" * 36
                    + struct.pack(">II", w << 16, h << 16))

    def video_trak(ver, duration, w, h, codec):
        entry = struct.pack(">I", 16) + codec + b"\x00" * 6 + struct.pack(">H", 1)
        stsd = full(b"stsd", 0, struct.pack(">I", 1) + entry)
        mdia = box(b"mdia", box(b"minf", box(b"stbl", stsd)))
        return box(b"trak", tkhd(ver, 1, duration, w, h) + mdia)

    def mp4(ver=0, brand=b"isom", timescale=600, duration=48000,
            w=320, h=240, codec=b"avc1", largesize_mdat=False):
        ftyp = box(b"ftyp", brand + struct.pack(">I", 0x200) + b"mp41")
        moov = box(b"moov", mvhd(ver, timescale, duration)
                   + video_trak(ver, duration, w, h, codec))
        body = b"\xAB" * 50
        if largesize_mdat:
            mdat = (struct.pack(">I", 1) + b"mdat"
                    + struct.pack(">Q", 16 + len(body)) + body)
        else:
            mdat = box(b"mdat", body)
        return ftyp + moov + mdat

    # size==0 (extends to end) on the LAST box
    to_end = mp4()[:len(mp4()) - 58] + struct.pack(">I", 0) + b"mdat" + b"\xCD" * 46
    rows = [
        (1, mp4()),
        (2, mp4(ver=1, brand=b"mp42", timescale=90000, duration=1234567,
                w=1920, h=1080, codec=b"hev1")),
        (3, mp4(largesize_mdat=True)),
        (4, to_end),
        (5, b"plain text, no container"),
        (6, mp4()[:30]),   # dies inside moov: brand survives, media NULL
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in parse_mp4_meta(df).collect()}
    r1 = got[1]
    assert (r1["format"], r1["major_brand"], r1["codec"]) == ("mp4", "isom", "avc1")
    assert r1["duration_ms"] == 48000 * 1000 // 600
    assert (r1["n_tracks"], r1["width"], r1["height"]) == (1, 320, 240)
    r2 = got[2]
    assert (r2["major_brand"], r2["codec"]) == ("mp42", "hev1")
    assert r2["duration_ms"] == 1234567 * 1000 // 90000
    assert (r2["width"], r2["height"]) == (1920, 1080)
    assert got[3]["format"] == "mp4" and got[3]["width"] == 320
    assert got[4]["format"] == "mp4" and got[4]["width"] == 320
    assert got[5]["format"] == "unknown" and got[5]["major_brand"] is None
    r6 = got[6]
    assert r6["format"] == "mp4" and r6["major_brand"] == "isom"
    assert r6["duration_ms"] is None and r6["n_tracks"] is None
    assert got[7]["format"] == "unknown"


def test_ivfpq_append_stream_replay_idempotent(spark, tmpdir_path):
    """IVF-PQ streaming fold (r6): an embedding stream folds into the
    PQ-coded index via foreachBatch; a FRESH stream over the same files
    (forced redelivery) adds nothing; and the outer session sees the
    appended rows WITHOUT a manual refreshTable (the post-write refresh
    inside the fold — the st23 bug)."""
    from pyspark.sql import functions as F

    from logverzcore_spark.engine import read_table
    from logverzcore_spark.operators.similarity import (
        ivfpq_index_build,
        lcg_centroids,
        lcg_codebooks,
    )
    from logverzcore_spark.streaming.ivf_stream import ivfpq_append_stream

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    base = emb.where(F.col("vec_id") % 4 != 0)
    delta = emb.where(F.col("vec_id") % 4 == 0).select("vec_id", "embedding")
    src = f"{tmpdir_path}/pq_vec_stream"
    delta.coalesce(2).write.parquet(src)
    tbl = "ivfpq_stream_test"
    try:
        ivfpq_index_build(
            base, tbl, n_cells=8, m=8, n_codes=16, dim=dim,
            centroids=lcg_centroids(dim, 8), codebooks=lcg_codebooks(dim, 8, 16),
        )
        schema = spark.read.parquet(src).schema
        for ck in ("ck1", "ck2"):  # second pass = full redelivery
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src)
            )
            q = ivfpq_append_stream(
                spark, stream, tbl, checkpoint_dir=f"{tmpdir_path}/pq_{ck}"
            )
            q.awaitTermination()
            # deliberately NO refreshTable here — the fold must do it
            assert spark.table(tbl).count() == emb.count()
        assert spark.table(tbl).select("nid").distinct().count() == emb.count()
    finally:
        for suffix in ("", "_centroids", "_codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}{suffix}")


def test_semantic_contamination_semantics_and_plan(spark, emb):
    """d16 contract: a train vector equal (or near-equal) to a benchmark
    vector is flagged with that benchmark id as best_match; orthogonal
    vectors are not; the benchmark side is the broadcast side so the
    train corpus never shuffles pre-agg."""
    from logverzcore_spark.operators.dedup import semantic_contamination

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.98] + [0.199] + [0.0] * (dim - 2)   # cos ≈ 0.98
    ortho = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    train = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "vec_id long, embedding array<double>"
    )
    bench = spark.createDataFrame(
        [(100, base), (101, [0.0, 1.0] + [0.0] * (dim - 2))],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_contamination(
        train, bench, dim=dim, threshold=0.9, n_planes=2
    ).collect()}
    assert set(out) == {1, 2}
    assert out[1]["best_match"] == 100 and out[1]["max_cosine"] == 1.0
    assert out[2]["best_match"] == 100 and out[2]["max_cosine"] >= 0.9
    assert out[1]["n_contacts"] == 1

    # plan: benchmark side broadcast, no cartesian
    plan = spark._jvm.PythonSQLUtils.explainString(
        semantic_contamination(
            emb.where(F.col("vec_id") % 10 != 0),
            emb.where(F.col("vec_id") % 10 == 0),
            dim=64, threshold=0.25, n_planes=4,
        )._jdf.queryExecution(), "formatted",
    )
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_decode_image_raw_formats_normalize_identically(spark):
    """decode_image_raw (r6): PPM/PGM/uncompressed-BMP decode is REAL —
    a BMP (bottom-up, BGR, 4-byte-padded rows) of the same image as a
    PPM yields the IDENTICAL normalized top-down RGB byte stream;
    comments in PNM headers parse; truncated/garbage/NULL payloads
    report 'unknown'; oversized dims refuse to allocate."""
    import struct

    from logverzcore_spark.operators.multimodal import decode_image_raw

    def ppm(w, h, px):
        return b"P6\n# cmt\n%d %d\n255\n" % (w, h) + bytes(px)

    def bmp24(w, h, px):
        stride = (w * 3 + 3) & ~3
        rows = b""
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                r, g, b_ = px[(y * w + x) * 3:(y * w + x) * 3 + 3]
                row += bytes([b_, g, r])
            row += b"\x00" * (stride - w * 3)
            rows += bytes(row)
        off = 54
        hdr = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                             2835, 2835, 0, 0))
        return hdr + rows

    rgb = bytes(range(3 * 5 * 3))  # 3x5, all byte values distinct-ish
    huge = b"P6\n100000 100000\n255\n" + b"\x00" * 10
    rows = [
        (1, ppm(3, 5, rgb)),
        (2, bmp24(3, 5, rgb)),
        (3, b"P5\n4 2\n255\n" + bytes(range(8))),
        (4, b"text, not an image"),
        (5, ppm(3, 5, rgb)[:12]),
        (6, None),
        (7, huge),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           decode_image_raw(df, return_pixels=True).collect()}
    assert bytes(out[1]["pixels"]) == rgb
    assert bytes(out[2]["pixels"]) == rgb  # normalization equivalence
    assert out[1]["pixel_sum"] == out[2]["pixel_sum"] == sum(rgb)
    assert (out[1]["format"], out[2]["format"]) == ("ppm", "bmp")
    assert out[3]["format"] == "pgm" and out[3]["channels"] == 1
    assert out[3]["pixel_sum"] == sum(range(8))
    for bad in (4, 5, 6, 7):
        assert out[bad]["format"] == "unknown" and out[bad]["width"] is None
    # stats-only path omits the pixels column entirely
    assert "pixels" not in decode_image_raw(df).columns


def test_remove_duplicate_spans_semantics(spark):
    """Shared 8-token span dropped from BOTH docs at any alignment;
    within-doc repeats dropped too; clean docs pass through verbatim."""
    span = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"intro one two {span} tail1 x"),
        (2, f"{span} other closing words here"),
        (3, "a perfectly unique document with no repeats at all ok"),
        (4, "rep rep rep rep rep rep rep rep rep"),  # 9x same token: every
        # 8-shingle occurs twice (positions 0 and 1) -> all tokens covered
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(df, k=8).collect()}
    # doc 3 untouched, frac 0
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_dup_tokens"] == 0 and out[3]["dup_token_frac"] == 0.0
    # the shared span is gone from both docs 1 and 2, remainder intact
    assert out[1]["clean_text"] == "intro one two tail1 x"
    assert out[2]["clean_text"] == "other closing words here"
    assert out[1]["n_dup_tokens"] == 8 and out[2]["n_dup_tokens"] == 8
    # doc 4: every token covered by a within-doc repeated shingle
    assert out[4]["clean_text"] == "" and out[4]["dup_token_frac"] == 1.0
    # short doc (< k tokens) cannot form a shingle -> untouched
    short = spark.createDataFrame([(9, "just five small words here")], "doc_id long, text string")
    srow = dedup.remove_duplicate_spans(short, k=8).first()
    assert srow["clean_text"] == "just five small words here"
    assert srow["n_dup_tokens"] == 0


def test_mmr_rerank_diversity_and_first_pick(spark):
    """First pick is the plain top-1; a redundant near-copy of it is
    deferred below a less-relevant-but-diverse candidate; plan stays
    JVM-side (no Python eval nodes)."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        (100, unit(0.0)),          # query
        (1, unit(0.05)),           # most relevant
        (2, unit(0.06)),           # near-copy of 1 (redundant)
        (3, unit(0.9)),            # less relevant, diverse
        (4, unit(1.0)),            # filler
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") == 100)
    out = similarity.mmr_rerank(df, q, k=3, n_candidates=4, lam=0.3)
    got = [r["neighbor_id"] for r in out.orderBy("mmr_rank").collect()]
    # 1 first (pure relevance); then 3 or 4 (diverse) before 2 (near-copy of 1)
    assert got[0] == 1
    assert got[1] in (3, 4)
    assert 2 not in got[:2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_sniff_audio_meta_edges(spark):
    """Truncation and near-miss layouts report honestly: short MP3 (tag
    points past EOF) keeps format but NULLs the frame fields; FLAC whose
    first block is NOT STREAMINFO reports format-only; Ogg with a
    multi-segment first page reports format-only; empty payload is
    'unknown'."""
    from logverzcore_spark.operators.multimodal import sniff_audio_meta

    rows = [
        # ID3 tag says 100 bytes but payload ends right after the header
        (1, bytes.fromhex("49443304000000000064")),
        # fLaC with first block type 4 (VORBIS_COMMENT) instead of 0
        (2, b"fLaC" + bytes([4, 0, 0, 10]) + b"\x00" * 10),
        # OggS v0 but n_segments = 2 (not the canonical ident layout)
        (3, b"OggS" + b"\x00\x02" + b"\x00" * 20 + bytes([2, 10, 10]) + b"\x00" * 40),
        (4, b""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in sniff_audio_meta(df).collect()}
    assert out[1]["format"] == "mp3" and out[1]["tag_bytes"] == 100
    assert out[1]["sample_rate"] is None and out[1]["bitrate_kbps"] is None
    assert out[2]["format"] == "flac" and out[2]["channels"] is None
    assert out[3]["format"] == "ogg" and out[3]["sample_rate"] is None
    assert out[4]["format"] == "unknown"


def test_kmeans_refine_inertia_monotone_and_empty_cells(emb):
    """Lloyd guarantee on the exact integer objective: total inertia is
    non-increasing over iterations; a centroid placed unreachably far
    gets no members and keeps its previous position."""
    from logverzcore_spark.suite.similarity import _s13_grid

    grid = _s13_grid()
    inertias = []
    for iters in (1, 2, 3):
        _, stats = similarity.kmeans_refine(emb, grid, iters=iters)
        per_cell = {r["cell"]: r["inertia"] for r in
                    stats.select("cell", "inertia").distinct().collect()}
        inertias.append(sum(per_cell.values()))
    assert inertias[0] >= inertias[1] >= inertias[2]
    # unreachable centroid keeps its position and reports 0 members
    far = [row[:] for row in grid]
    far[7] = [10**6] * 64
    refined, stats = similarity.kmeans_refine(emb, far, iters=2)
    cell7 = stats.where(F.col("cell") == 7).collect()
    assert all(r["n_members"] == 0 for r in cell7)
    assert refined[7] == [10**6] * 64


def test_parse_tiff_meta_edges(spark):
    """Truncation honesty: IFD pointer past EOF keeps format with NULL
    fields; IFD truncated mid-entry reports what was reachable; wrong
    magic number is 'unknown'; SHORT vs LONG value justification is
    endian-correct (MM SHORT value must NOT read as its LONG form)."""
    from logverzcore_spark.operators.multimodal import parse_tiff_meta

    mm_short = (  # MM, IFD@8, 1 entry: width SHORT 0x0102 left-justified
        b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
        + (1).to_bytes(2, "big")
        + (0x0100).to_bytes(2, "big") + (3).to_bytes(2, "big")
        + (1).to_bytes(4, "big") + (0x0102).to_bytes(2, "big") + b"\x00\x00"
        + (0).to_bytes(4, "big")
    )
    rows = [
        (1, b"II" + (42).to_bytes(2, "little") + (9999).to_bytes(4, "little")),
        (2, mm_short[:14]),      # dies mid-first-entry
        (3, b"II" + (43).to_bytes(2, "little") + (8).to_bytes(4, "little")),
        (4, mm_short),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_tiff_meta(df).collect()}
    assert out[1]["format"] == "tiff" and out[1]["n_ifd_entries"] is None
    assert out[2]["format"] == "tiff" and out[2]["n_ifd_entries"] == 1
    assert out[2]["width"] is None
    assert out[3]["format"] == "unknown"
    assert out[4]["width"] == 0x0102  # not 0x01020000


def test_retrieval_metrics_known_values(spark):
    """Hand-checkable metrics: pred hits 2/3 relevant with first hit at
    rank 2 -> recall 2/3·(k=3), mrr 0.5; a query with zero hits scores
    0; perfect prediction scores 1.0/1.0."""
    mk = lambda rows: spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank int"
    )
    truth = mk([(1, 10, 1), (1, 11, 2), (1, 12, 3),
                (2, 20, 1), (2, 21, 2), (2, 22, 3),
                (3, 30, 1), (3, 31, 2), (3, 32, 3)])
    pred = mk([(1, 99, 1), (1, 11, 2), (1, 12, 3),   # 2 hits, first @2
               (2, 98, 1), (2, 97, 2), (2, 96, 3),   # 0 hits
               (3, 30, 1), (3, 31, 2), (3, 32, 3)])  # perfect
    got = {r["query_id"]: r for r in
           similarity.retrieval_metrics(pred, truth, k=3).collect()}
    assert got[1]["n_hits"] == 2 and abs(got[1]["recall_at_k"] - 2/3) < 1e-6
    assert got[1]["mrr"] == 0.5
    assert got[2]["n_hits"] == 0 and got[2]["recall_at_k"] == 0.0
    assert got[2]["mrr"] == 0.0
    assert got[3]["recall_at_k"] == 1.0 and got[3]["mrr"] == 1.0


def test_tfidf_cosine_pairs_weighting(spark):
    """Discriminative overlap outranks bulk overlap: docs sharing a RARE
    token score above docs sharing only ubiquitous tokens (which the
    df-cut removes entirely); identical docs score 1.0."""
    common = "the and of to in " * 3
    rows = [
        (1, common + "zygote"),
        (2, common + "zygote"),
        (3, common + "meiosis"),
        (4, "unrelated totally different words here entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id1"], r["id2"]): r["cosine"] for r in
           dedup.tfidf_cosine_pairs(df, threshold=0.0, max_df=2).collect()}
    # docs 1-2 share the rare 'zygote' (df=2 <= 2): identical weights
    assert out[(1, 2)] == 1.0
    # 1-3 share only the df-cut common tokens -> no surviving shared term
    assert (1, 3) not in out
    assert (1, 4) not in out


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp_rate(spark):
    """The two Bloom contracts: every inserted fingerprint probes
    positive (no false negatives — the correctness-critical half), and
    on a disjoint probe set the false-positive fraction stays near the
    configured fpp (sanity on the sizing math, generous 5x headroom for
    a 500-item sample)."""
    ins = spark.range(0, 500).select(F.md5(F.col("id").cast("string")).alias("fp"))
    probe = spark.range(10_000, 10_500).select(
        F.md5(F.col("id").cast("string")).alias("fp")
    )
    bloom = dedup.build_fp_bloom(ins, fpp=0.01)
    assert bloom["m_bits"] % 64 == 0 and len(bloom["words"]) == bloom["m_bits"] // 64
    missed = ins.where(~dedup.bloom_maybe_contains(bloom, F.col("fp"))).count()
    assert missed == 0
    fps = probe.where(dedup.bloom_maybe_contains(bloom, F.col("fp"))).count()
    assert fps <= 500 * 0.05, f"false-positive rate {fps/500} >> fpp 0.01"


def test_bloom_prefilter_dedup_exact_even_when_bloom_saturated(spark):
    """A deliberately undersized bloom (expected_items=4 for a 300-item
    corpus) saturates and flags nearly EVERYTHING as a suspect — the
    exact confirm join must still produce exactly incremental_dedup's
    answer, proving false positives can never leak into the output."""
    base = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), (F.col("id") % 120).cast("string")).alias("text"),
    )
    batch = base.where(F.col("doc_id") % 3 == 0)
    corpus = base.where(F.col("doc_id") % 2 == 0).select(
        dedup.fingerprint_md5(F.col("text")).alias("fp")
    )
    tiny = dedup.build_fp_bloom(corpus, expected_items=4, fpp=0.01)
    fresh = dedup.exact_dedup(batch)
    suspects = fresh.where(dedup.bloom_maybe_contains(tiny, F.col("fp")))
    # Saturated bloom: (nearly) every fresh fp reads as a suspect.
    assert suspects.count() >= fresh.count() * 0.9
    got = dedup.bloom_prefilter_dedup(batch, corpus, bloom=tiny)
    want = dedup.incremental_dedup(batch, corpus)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bloom_probe_is_codegen_and_definite_branch_joins_nothing(spark):
    """Plan shape: the bloom probe is pure JVM expression work (no
    Python eval nodes anywhere), and the definite-new branch of the
    union is a join-free filter — only the suspect branch carries the
    anti-join."""
    base = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), (F.col("id") % 80).cast("string")).alias("text"),
    )
    batch = base.where(F.col("doc_id") % 3 == 0)
    corpus = base.where(F.col("doc_id") % 2 == 0).select(
        dedup.fingerprint_md5(F.col("text")).alias("fp")
    )
    bloom = dedup.build_fp_bloom(corpus, fpp=0.01)
    out = dedup.bloom_prefilter_dedup(batch, corpus, bloom=bloom)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("LeftAnti") == 1  # exactly one branch joins


def test_parse_jpeg_exif_edges(spark):
    """The EXIF composition's own corners: an INLINE ASCII make
    (count <= 4 lives in the value field, no offset); an offset-valued
    string whose offset runs past the TIFF block -> NULL field, format
    kept; a non-Exif APP1 (XMP) BEFORE the real EXIF APP1 must be
    skipped, not parsed; a JPEG whose chain ends at SOS without any
    APP1 -> format 'jpeg'."""
    from logverzcore_spark.operators.multimodal import parse_jpeg_exif

    def tiff_with(entries: bytes, n: int, extra: bytes = b"") -> bytes:
        return (
            b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + n.to_bytes(2, "little") + entries + (0).to_bytes(4, "little")
            + extra
        )

    def entry_le(tag, typ, cnt, val4: bytes) -> bytes:
        return (
            tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
            + cnt.to_bytes(4, "little") + val4
        )

    def app1(tiff: bytes) -> bytes:
        body = b"Exif\x00\x00" + tiff
        return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body

    inline = tiff_with(entry_le(0x010F, 2, 4, b"AB\x00\x00"), 1)
    bad_off = tiff_with(entry_le(0x0110, 2, 20, (9999).to_bytes(4, "little")), 1)
    xmp_body = b"http://ns.adobe.com/\x00junk"
    xmp = b"\xff\xe1" + (len(xmp_body) + 2).to_bytes(2, "big") + xmp_body
    sos = b"\xff\xda\x00\x02"
    rows = [
        (1, b"\xff\xd8" + app1(inline) + b"\xff\xd9"),
        (2, b"\xff\xd8" + app1(bad_off) + b"\xff\xd9"),
        (3, b"\xff\xd8" + xmp + app1(inline) + b"\xff\xd9"),
        (4, b"\xff\xd8" + sos),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_jpeg_exif(df).collect()}
    assert out[1]["format"] == "jpeg-exif" and out[1]["make"] == "AB"
    assert out[2]["format"] == "jpeg-exif" and out[2]["model"] is None
    assert out[3]["format"] == "jpeg-exif" and out[3]["make"] == "AB"
    assert out[4]["format"] == "jpeg"


def test_knn_graph_matches_bruteforce_within_cell(spark):
    """knn_graph == numpy brute force when every vector lands in one
    cell (co-directional cluster): per-src edge count capped at k, ranks
    ordered by cosine then id, self-edges absent."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    vecs = [(i, (base + 0.1 * rng.normal(size=8)).tolist()) for i in range(12)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = similarity.knn_graph(df, dim=8, k=3, n_planes=2).collect()
    cells = {r["vec_id"] for r in df.collect()}
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    arr = {i: np.array(v) for i, v in vecs}
    # All in one cell by construction (verify implicitly: every src has
    # exactly 3 edges → at least 4 cell-mates each).
    for src, edges in by_src.items():
        assert len(edges) == 3
        assert all(e["dst"] != src for e in edges)
        ranks = sorted(edges, key=lambda e: e["rank"])
        cos = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        want = sorted(
            ((cos(arr[src], arr[j]), j) for j in cells if j != src),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got = [(e["cosine"], e["dst"]) for e in ranks]
        assert [j for _, j in want] == [j for _, j in got]
        for (wc, _), (gc, _) in zip(want, got):
            assert abs(wc - gc) < 1e-5


def test_parse_gif_anim_edges(spark):
    """GIF walk honesty: GIF87a accepted; truncation mid-frame reports
    the frames fully walked before the cut (format kept); a payload
    dying inside a pixel sub-block chain counts no phantom frame; junk
    is 'unknown'."""
    from logverzcore_spark.operators.multimodal import parse_gif_anim

    def le16(v):
        return v.to_bytes(2, "little")

    frame = (
        b"\x21\xf9\x04\x00" + le16(5) + b"\x00\x00"
        + b"\x2c" + le16(0) + le16(0) + le16(3) + le16(2) + b"\x00"
        + b"\x02" + b"\x01\x00" + b"\x00"
    )
    full = b"GIF87a" + le16(3) + le16(2) + b"\x00\x00\x00" + frame + frame + b"\x3b"
    cut_mid_frame2 = full[: len(b"GIF87a") + 7 + len(frame) + 5]
    rows = [
        (1, full),
        (2, cut_mid_frame2),
        (3, b"NOTAGIF at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_gif_anim(df).collect()}
    assert out[1]["format"] == "gif" and out[1]["n_frames"] == 2
    assert out[1]["duration_cs"] == 10 and out[1]["loop_count"] is None
    assert out[2]["format"] == "gif" and out[2]["n_frames"] == 1
    assert out[3]["format"] == "unknown"


def test_parse_png_chunks_edges(spark):
    """PNG walk honesty: truncation inside a chunk keeps the fields
    already walked (format stays 'png'); a chain missing IEND still
    reports its chunks; bad signature is 'unknown'; IDAT bytes sum
    across split chunks without decompression."""
    from logverzcore_spark.operators.multimodal import parse_png_chunks

    def chunk(typ: bytes, data: bytes) -> bytes:
        return len(data).to_bytes(4, "big") + typ + data + b"\x00" * 4

    ihdr = chunk(
        b"IHDR",
        (7).to_bytes(4, "big") + (9).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0]),
    )
    png = (
        b"\x89PNG\r\n\x1a\n" + ihdr
        + chunk(b"IDAT", b"\x00" * 4) + chunk(b"IDAT", b"\x00" * 6)
        + chunk(b"IEND", b"")
    )
    rows = [
        (1, png),
        (2, png[: 8 + len(ihdr) + 5]),   # dies inside the first IDAT
        (3, b"\x89PNG\r\n\x1a\x00 corrupted signature tail"),
        (4, png[: len(png) - len(chunk(b"IEND", b""))]),  # no IEND
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_png_chunks(df).collect()}
    assert out[1]["format"] == "png" and out[1]["idat_bytes"] == 10
    assert out[1]["n_chunks"] == 4 and out[1]["width"] == 7 and out[1]["height"] == 9
    assert out[2]["format"] == "png" and out[2]["n_chunks"] == 1
    assert out[2]["idat_bytes"] == 0
    assert out[3]["format"] == "unknown"
    assert out[4]["n_chunks"] == 3 and out[4]["idat_bytes"] == 10


def test_filtered_topk_respects_constraint_and_underfull_labels(spark):
    """filtered_topk: every neighbor shares the query's label; a label
    with fewer than k mates returns the mates it has (no cross-label
    leakage to fill ranks) — the exact trap of post-filtering an
    unconstrained top-k."""
    rows = [
        (1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"), (3, [0.0, 1.0], "a"),
        (4, [1.0, 0.0], "b"), (5, [0.8, 0.2], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = similarity.filtered_topk(df, df.where(F.col("vec_id").isin(1, 4)), k=3)
    got = {}
    lab = {r[0]: r[2] for r in rows}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(r)
        assert lab[r["neighbor_id"]] == lab[r["query_id"]]
    assert len(got[1]) == 2  # label 'a' has only 2 mates
    assert len(got[4]) == 1  # label 'b' has only 1 mate
    assert got[1][0]["neighbor_id"] == 2  # nearest first


def test_parse_srt_cues_crlf_and_multiline(spark):
    """SRT edges: CRLF line endings parse identically; a multi-line
    caption joins with single spaces; the numeric index line is not
    part of the caption; blocks without a timecode are dropped."""
    from logverzcore_spark.operators.multimodal import parse_srt_cues

    srt = (
        "1\r\n00:00:01,500 --> 00:00:03,250\r\nline one\r\nline two\r\n\r\n"
        "junk block\r\n\r\n"
        "2\r\n01:02:03,004 --> 01:02:04,005\r\nsecond"
    )
    df = spark.createDataFrame([(1, srt)], "doc_id long, srt string")
    out = sorted(parse_srt_cues(df).collect(), key=lambda r: r["cue_idx"])
    assert len(out) == 2
    assert out[0]["start_ms"] == 1500 and out[0]["end_ms"] == 3250
    assert out[0]["caption"] == "line one line two"
    assert out[1]["start_ms"] == 3723004 and out[1]["end_ms"] == 3724005
    assert out[1]["caption"] == "second" and out[1]["cue_idx"] == 2


def test_parse_zip_central_dir_edges(spark):
    """Real zipfile output parses exactly; truncated CD yields the
    entries reached; junk/short/EOCD-less payloads yield zero rows;
    an archive comment displaces the EOCD and the backward scan still
    finds it."""
    import io
    import zipfile

    from logverzcore_spark.operators.multimodal import parse_zip_central_dir

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a.txt", b"hello")
        z.writestr("dir/b.bin", b"\x00" * 9)
        z.comment = b"trailing archive comment"
    real = buf.getvalue()

    # truncate mid-central-directory: keep EOCD intact by rebuilding a
    # zip whose CD claims 2 entries but whose second CD record is cut
    eocd_at = real.rfind(b"PK\x05\x06")
    cd_at = real.find(b"PK\x01\x02")
    second_cd = real.find(b"PK\x01\x02", cd_at + 4)
    cut = real[:second_cd + 2] + real[eocd_at:]

    rows = [
        (0, bytearray(real)),
        (1, bytearray(cut)),
        (2, bytearray(b"not a zip")),
        (3, None),
        (4, bytearray(b"PK\x03\x04 local header only, no EOCD")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = parse_zip_central_dir(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted((r.entry_idx, r.name, r.method, r.comp_bytes, r.uncomp_bytes)
                  for r in by_doc[0]) == [
        (0, "a.txt", 0, 5, 5),
        (1, "dir/b.bin", 0, 9, 9),
    ]
    import zlib
    assert by_doc[0][0].crc_hex == format(zlib.crc32(b"hello"), "08x")
    assert [r.name for r in by_doc[1]] == ["a.txt"]  # partial walk
    assert 2 not in by_doc and 3 not in by_doc and 4 not in by_doc


def test_parse_tar_entries_edges(spark):
    """Real tarfile output parses exactly (incl. a symlink and a
    directory); pre-POSIX/junk payloads and truncation behave."""
    import io
    import tarfile

    from logverzcore_spark.operators.multimodal import parse_tar_entries

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        ti = tarfile.TarInfo("a.txt"); ti.size = 5; ti.mtime = 123
        t.addfile(ti, io.BytesIO(b"hello"))
        d = tarfile.TarInfo("sub"); d.type = tarfile.DIRTYPE
        t.addfile(d)
        ln = tarfile.TarInfo("lnk"); ln.type = tarfile.SYMTYPE; ln.linkname = "a.txt"
        t.addfile(ln)
    real = buf.getvalue()

    rows = [
        (0, bytearray(real)),
        (1, bytearray(real[:700])),   # truncated inside first data block
        (2, bytearray(b"\x00" * 1024)),  # empty archive
        (3, bytearray(b"junk" * 200)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    by_doc = {}
    for r in parse_tar_entries(df).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    got = sorted((r.entry_idx, r.name, r.typeflag, r.size, r.mtime, r.linkname)
                 for r in by_doc[0])
    assert got == [
        (0, "a.txt", "0", 5, 123, None),
        (1, "sub/", "5", 0, 0, None),
        (2, "lnk", "2", 0, 0, "a.txt"),
    ]
    assert [r.name for r in by_doc.get(1, [])] == ["a.txt"]
    assert 2 not in by_doc and 3 not in by_doc


def test_parse_ebml_meta_edges(spark):
    """Truncation mid-element reports what was reachable; a 4-byte
    float duration parses; junk stays 'unknown'."""
    import struct

    from logverzcore_spark.operators.multimodal import parse_ebml_meta

    def vint_size(n):
        return bytes([0x80 | n])

    header = (
        bytes.fromhex("1A45DFA3") + vint_size(7)
        + bytes.fromhex("4282") + vint_size(4) + b"webm"
    )
    info_content = (
        bytes.fromhex("2AD7B1") + vint_size(4) + (1000000).to_bytes(4, "big")
        + bytes.fromhex("4489") + vint_size(4) + struct.pack(">f", 2.5)
    )
    info = bytes.fromhex("1549A966") + vint_size(len(info_content)) + info_content
    seg = bytes.fromhex("18538067") + vint_size(len(info)) + info
    full = header + seg

    rows = [
        (0, bytearray(full)),
        (1, bytearray(full[: len(header) + 6])),  # cut inside Segment
        (2, bytearray(b"RIFFnot ebml")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in parse_ebml_meta(df).collect()}
    assert got[0].doctype == "webm" and got[0].timescale == 1000000
    assert got[0].duration == 2.5 and got[0].n_tracks == 0
    assert got[1].format == "mkv" and got[1].doctype == "webm"
    assert got[1].timescale is None  # Info never reached
    assert got[2].format == "unknown" and got[2].doctype is None


def test_crawl_dedup_report_hand_values(spark):
    from pyspark.sql import functions as F

    from logverzcore_spark.operators.dedup import crawl_dedup_report

    rows = [
        ("http://A.com/x", "alpha"),          # same canon as next,
        ("http://a.com//x/", "beta"),         # different content -> drift
        ("http://b.com/1", "mirror"),         # same content as next,
        ("http://c.com/2", "mirror"),         # different URL -> mirror
        ("http://d.com/solo", "unique"),      # clean page: no report
        ("/relative", "dropped"),             # non-absolute: excluded
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {(r.kind, r.key): (r.n_pages, r.n_variants)
           for r in crawl_dedup_report(df).collect()}
    assert got[("same_url_diff_content", "http://a.com/x")] == (2, 2)
    mirror_fp = [k for k in got if k[0] == "same_content_diff_url"]
    assert len(mirror_fp) == 1 and got[mirror_fp[0]] == (2, 2)
    assert len(got) == 2


def test_probe_pdf_edges(spark):
    """Binary stream bytes pass through the latin-1 decode unharmed;
    /Pages is not counted as a page; truncated tail flags incomplete."""
    from logverzcore_spark.operators.multimodal import probe_pdf

    body = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Pages /Count 1 >>\nendobj\n"
        b"2 0 obj\n<< /Type /Page >>\nendobj\n"
        b"3 0 obj\n<< /Length 4 >>\nstream\n\x00\xff\xfe\x01\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    rows = [(0, bytearray(body)), (1, bytearray(body[:-7])), (2, bytearray(b"hello"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in probe_pdf(df).collect()}
    assert got[0].format == "pdf" and got[0].version == "1.7"
    assert got[0].n_objects == 3 and got[0].n_streams == 1
    assert got[0].n_pages == 1 and got[0].complete is True
    assert got[1].complete is False
    assert got[2].format == "unknown" and got[2].n_pages is None


def test_mixture_allocation_invariants(spark):
    """Allocations sum EXACTLY to the budget; absent weight keys are
    renormalized out; each allocation is within one unit of the exact
    proportional share; bad weights raise."""
    import pytest as _pytest

    from logverzcore_spark.operators.text import mixture_allocation

    rows = [
        (0, "web", "a b c d e f g h"),
        (1, "web", "i j k l"),
        (2, "books", "m n o p q r"),
        (3, "code", "s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # 'wiki' has a weight but no docs -> renormalized over web/books/code.
    out = mixture_allocation(
        df, {"web": 5, "books": 3, "code": 2, "wiki": 7}, total_tokens=1001
    ).collect()
    assert sorted(r.source for r in out) == ["books", "code", "web"]
    assert sum(r.alloc_tokens for r in out) == 1001
    shares = {"web": 5, "books": 3, "code": 2}
    for r in out:
        exact = 1001 * shares[r.source] / 10
        assert abs(r.alloc_tokens - exact) < 1
    avail = {r.source: r.avail_tokens for r in out}
    assert avail == {"web": 12, "books": 6, "code": 2}
    epochs = {r.source: r.epochs_bp for r in out}
    # code gets ~200 tokens against 2 available -> ~100 epochs.
    assert epochs["code"] == (10000 * [r.alloc_tokens for r in out if r.source == "code"][0]) // 2

    with _pytest.raises(ValueError):
        mixture_allocation(df, {}, 100)
    with _pytest.raises(ValueError):
        mixture_allocation(df, {"web": 0}, 100)


def test_repetition_profile_hand_values(spark):
    """Hand-checked Gopher repetition signals: dup-line fractions, mode
    tie-break (lexicographically smallest gram), dup n-gram coverage
    counts each char once, and short/empty-ish docs don't divide by 0."""
    from logverzcore_spark.operators.text import repetition_profile

    rows = [
        (0, "a b\na b\nc d e"),          # 1 dup line of 3; 'a b' x2 top-2gram
        (1, "p q p q p q p q p q p q"),  # total repetition -> everything dup
        (2, "x y"),                      # too short for any 5/10-gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_profile(df, dup_ns=(5, 10)).collect()}

    d0 = out[0]
    assert d0.n_lines == 3 and d0.dup_line_frac_bp == 3333
    # line chars: 3+3+5=11, dup mass 3 -> 2727 bp
    assert d0.dup_line_char_frac_bp == 2727
    # toks = a b a b c d e (7 chars); 'a b' x2 -> 4 chars -> 5714 bp
    assert d0.top2gram_char_frac_bp == 5714
    # all 3-grams unique -> tie -> lexicographically smallest 'a b a' (3 chars)
    assert d0.top3gram_char_frac_bp == 4285
    assert d0.dup5gram_char_frac_bp == 0 and d0.keep is False

    d1 = out[1]
    # 'p q' x6 over 12 chars -> 10000 bp; 5-gram dup coverage = whole doc
    assert d1.top2gram_char_frac_bp == 10000
    assert d1.dup5gram_char_frac_bp == 10000
    assert d1.dup10gram_char_frac_bp == 10000
    assert d1.keep is False

    d2 = out[2]
    assert d2.dup5gram_char_frac_bp == 0 and d2.dup10gram_char_frac_bp == 0
    assert d2.dup_line_frac_bp == 0
    # The single 2-gram covers 100% of chars -> top2 gate trips; short
    # docs are Gopher's word-count rules' job, not this filter's.
    assert d2.top2gram_char_frac_bp == 10000 and d2.keep is False


def test_c4_line_filter_rules(spark):
    """Each C4 rule fires independently: terminal punct, min words,
    javascript line drop, lorem-ipsum / brace page drops, min surviving
    lines; clean_text is '' (not NULL) on dropped pages."""
    from logverzcore_spark.operators.text import c4_line_filter

    rows = [
        (0, "Good line with five words.\nshort.\nno terminal punct here at all\n"
            "Another good line of words!\nA third keeper line right here."),
        (1, "Uses javascript on this line.\nOnly one good line remains here."),
        (2, "lorem ipsum dolor sit amet.\nFine line with many words here."),
        (3, "var x = { a: 1 }\nGood line with five words."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_line_filter(df).collect()}
    assert out[0].keep is True and out[0].n_kept_lines == 3
    assert out[0].clean_text.count("\n") == 2 and "short." not in out[0].clean_text
    assert out[1].keep is False and out[1].drop_reason == "too_few_lines"
    assert out[2].drop_reason == "policy_page"
    assert out[3].drop_reason == "policy_page"
    assert out[1].clean_text == "" and out[2].clean_text == ""


def test_rrf_fuse_hand_values(spark):
    """Integer RRF: an item in both arms outscores a rank-1 single-arm
    item; ties break by item_id; malformed arms raise."""
    import pytest as _pytest

    from logverzcore_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, item_id long, rank int",
    )
    den = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, item_id long, rank int",
    )
    out = rrf_fuse([lex, den], k=10).collect()
    by_item = {r.item_id: r for r in out}
    # item 11: 1e9//62 + 1e9//61 = 16129032 + 16393442
    assert by_item[11].rrf_score == 1_000_000_000 // 62 + 1_000_000_000 // 61
    assert by_item[11].n_arms == 2 and by_item[11].rank == 1
    # single-arm rank-1 (item 10) loses to the double-arm item
    assert by_item[10].rrf_score == 1_000_000_000 // 61
    assert by_item[10].rank == 2
    # equal-score tie (items 12 and 13 both rank-3-ish? 12: //63, 13: //62)
    assert by_item[13].rank == 3 and by_item[12].rank == 4

    with _pytest.raises(ValueError):
        rrf_fuse([])
    with _pytest.raises(ValueError):
        rrf_fuse([lex.drop("rank")])


def test_parse_xml_column_quarantine(spark):
    """Clean rows parse typed with NULL corrupt col; malformed XML and
    type-coercion failures land whole-row in _corrupt_record (the
    CSV/JSON reader quarantine contract); entities unescape."""
    from logverzcore_spark.sources.readers import parse_xml_column

    df = spark.createDataFrame(
        [
            (1, "<r><a>5</a><b>x &amp; y</b></r>"),
            (2, "<r><a>oops</a><b>z</b></r>"),
            (3, "not xml at all"),
        ],
        "id long, xml string",
    )
    out = {r.id: r for r in parse_xml_column(df, "xml", "a INT, b STRING").collect()}
    assert out[1].a == 5 and out[1].b == "x & y" and out[1]._corrupt_record is None
    assert out[2].a is None and out[2]._corrupt_record is not None
    assert out[3]._corrupt_record == "not xml at all"
    assert "xml" not in out[1].asDict()


def test_isqrt_exact_and_temperature_mixture(spark):
    """isqrt is exact at perfect squares and off-by-one boundaries
    (including values where IEEE sqrt rounds the wrong way); T=2
    weights flatten the mixture vs proportional."""
    from pyspark.sql import functions as F

    from logverzcore_spark.operators.text import isqrt, temperature_mixture

    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 24, 25,
            10**12, 10**12 + 1, (10**6 + 1) ** 2 - 1, (10**6 + 1) ** 2,
            4503599761588224]  # (2^26+1)^2 + 2^27: double-rounding trap
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    import math
    got = {r.x: r.s for r in df.select("x", isqrt(F.col("x")).alias("s")).collect()}
    for v in vals:
        assert got[v] == math.isqrt(v), (v, got[v], math.isqrt(v))

    rows = [(i, f"src{i % 2}", "w " * (400 if i % 2 == 0 else 4)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in temperature_mixture(docs, 10_000).collect()}
    assert sum(r.alloc_tokens for r in out.values()) == 10_000
    # proportional would be 100:1; sqrt weights flatten to ~10:1.
    assert out["src0"].weight == 63 and out["src1"].weight == 6  # isqrt(4000), isqrt(40)
    ratio = out["src0"].alloc_tokens / out["src1"].alloc_tokens
    assert 10.0 < ratio < 11.0


def test_parse_avi_meta_edges(spark):
    """Edges the suite corpus can't hit: odd-size JUNK padding honored,
    hdrl whose first chunk isn't avih -> 'avi' NULLs, chunk size
    overrunning the buffer -> 'avi' NULLs, tiny/None payloads."""
    import struct

    from logverzcore_spark.operators.multimodal import parse_avi_meta

    def chunk(cc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return cc + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack("<14I", 40000, 0, 0, 0, 100, 0, 2, 0, 320, 240, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    good = b"RIFF" + struct.pack("<I", 4) + b"AVI " + chunk(b"JUNK", b"\x00" * 5) + hdrl
    bad_first = b"RIFF" + struct.pack("<I", 4) + b"AVI " + chunk(
        b"LIST", b"hdrl" + chunk(b"strl", b"\x00" * 8)
    )
    overrun = b"RIFF" + struct.pack("<I", 4) + b"AVI " + b"JUNK" + struct.pack("<I", 999)
    rows = [(0, good), (1, bad_first), (2, overrun), (3, b"RI"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in parse_avi_meta(df).collect()}
    g = out[0]
    assert g.format == "avi" and g.us_per_frame == 40000 and g.n_frames == 100
    assert g.n_streams == 2 and g.width == 320 and g.height == 240
    assert g.duration_ms == 4000 and g.fps_milli == 25000
    assert out[1].format == "avi" and out[1].us_per_frame is None
    assert out[2].format == "avi" and out[2].width is None
    assert out[3].format == "unknown" and out[4].format == "unknown"


def test_bm25_index_append_replay_idempotent(spark):
    """Appending the same batch twice (and a batch with internal
    duplicates) changes nothing: postings count, stats row, and probe
    ranking all equal the from-scratch rebuild over the union."""
    import uuid as _uuid

    from logverzcore_spark.operators.text import (
        bm25_index_append,
        bm25_index_build,
        bm25_index_topk,
    )

    rows = [(i, f"alpha beta doc{i} gamma " * (1 + i % 3)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = docs.where("doc_id < 15")
    delta = docs.where("doc_id >= 15")
    run = _uuid.uuid4().hex[:8]
    tbl, ref = f"t_bm25a_{run}", f"t_bm25r_{run}"
    try:
        bm25_index_build(base, tbl)
        # duplicate rows INSIDE the batch + a doc already indexed
        noisy = delta.unionAll(delta).unionAll(base.where("doc_id = 0"))
        bm25_index_append(spark, noisy, tbl)
        n1 = spark.table(tbl).count()
        s1 = spark.table(f"{tbl}_stats").collect()[0]
        bm25_index_append(spark, delta, tbl)  # full replay
        assert spark.table(tbl).count() == n1
        s2 = spark.table(f"{tbl}_stats").collect()[0]
        assert (s1.n_docs, s1.l_tok) == (s2.n_docs, s2.l_tok) == (20, s2.l_tok)

        bm25_index_build(docs, ref)
        qt = spark.createDataFrame(
            [(100, "alpha"), (100, "doc17")], "query_id long, term string"
        )
        got = sorted(
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_index_topk(spark, tbl, qt, k=5).collect()
        )
        want = sorted(
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_index_topk(spark, ref, qt, k=5).collect()
        )
        assert got == want and len(got) == 5
    finally:
        for t in (tbl, f"{tbl}_stats", ref, f"{ref}_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bigram_fluency_hand_values(spark):
    """Hand-checked add-one bigram scoring: repeated bigrams score high,
    a hapax bigram scores low, docs under 2 tokens get NULL with 0
    bigrams."""
    from logverzcore_spark.operators.text import bigram_fluency

    rows = [
        (0, "a b a b"),   # bigrams: (a,b)x2, (b,a)x1
        (1, "a b"),       # (a,b) -> shares corpus counts with doc 0
        (2, "z"),         # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_fluency(df).collect()}
    # corpus: c12(a,b)=3, c12(b,a)=1; c1(a)=3, c1(b)=1; V=2
    s_ab = 10000 * (3 + 1) // (3 + 2)   # 8000
    s_ba = 10000 * (1 + 1) // (1 + 2)   # 6666
    assert out[0].n_bigrams == 3
    assert out[0].fluency_mean_bp == (2 * s_ab + s_ba) // 3
    assert out[1].n_bigrams == 1 and out[1].fluency_mean_bp == s_ab
    assert out[2].n_bigrams == 0 and out[2].fluency_mean_bp is None


def test_select_representatives_policy(spark):
    """Max-quality wins within a cluster; quality tie -> smaller id;
    singletons are their own representative."""
    from logverzcore_spark.operators.dedup import select_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 8), (9, 8)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5), (8, 4), (9, 4)],
        "doc_id long, quality long",
    )
    out = {r.doc_id: r.is_rep for r in select_representatives(clusters, quality).collect()}
    # cluster 1: docs 2 and 3 tie at 30 -> 2 wins (smaller id)
    assert out == {1: False, 2: True, 3: False, 7: True, 8: True, 9: False}


def test_sniff_dataset_meta_edges(spark):
    """Head magic on tiny/truncated files still classifies (complete
    false); tail lengths validate; negative-offset wrap can't happen on
    short files."""
    import struct

    from logverzcore_spark.operators.multimodal import sniff_dataset_meta

    footer = b"\xaa" * 16
    pq = b"PAR1" + b"\x00" * 9 + footer + struct.pack("<I", 16) + b"PAR1"
    rows = [
        (0, pq),
        (1, b"PAR1"),                       # exactly the head magic
        (2, b"PAR1" + b"\x00" * 3),         # truncated upload
        (3, b"Obj\x01"),                    # minimal avro
        (4, b"ORC"),                        # 3 bytes: below min -> unknown
        (5, b"garbage here"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in sniff_dataset_meta(df).collect()}
    assert out[0].format == "parquet" and out[0].complete is True
    assert out[0].meta_len == 16
    assert out[1].format == "parquet" and out[1].complete is False
    assert out[1].meta_len is None
    assert out[2].format == "parquet" and out[2].complete is False
    assert out[3].format == "avro" and out[3].complete is True
    assert out[4].format == "unknown"
    assert out[5].format == "unknown" and out[6].format == "unknown"


def test_snapshot_diff_report_statuses(spark):
    """All four statuses fire; formatting-only rewrites (case/whitespace)
    read as UNCHANGED via the normalized fingerprint."""
    from logverzcore_spark.operators.dedup import snapshot_diff_report

    old = spark.createDataFrame(
        [(1, "Alpha Beta"), (2, "gone soon"), (3, "stable text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "  alpha   BETA "), (3, "stable text CHANGED"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in snapshot_diff_report(old, new).collect()}
    assert out == {1: "unchanged", 2: "removed", 3: "changed", 4: "added"}


def test_ivfpq_index_health_tracks_appends(spark):
    """Health totals cover every indexed vector, shares sum to ~10000,
    and an append shows up in the occupancy counts."""
    import uuid as _uuid

    from logverzcore_spark.operators import similarity as sim

    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tbl = f"t_health_{_uuid.uuid4().hex[:8]}"
    try:
        sim.ivfpq_index_build(
            emb.where("vec_id < 30"), tbl, n_cells=4, m=4, n_codes=4, dim=16,
            centroids=sim.lcg_centroids(16, 4),
            codebooks=sim.lcg_codebooks(16, 4, 4),
        )
        h1 = sim.ivfpq_index_health(spark, tbl).collect()
        assert sum(r.n_vecs for r in h1) == 30
        assert abs(sum(r.share_bp for r in h1) - 10000) <= len(h1)
        assert all(r.n_code_patterns >= 1 for r in h1)
        sim.ivfpq_index_append(
            spark, emb.where("vec_id >= 30"), tbl, dedupe=True
        )
        h2 = sim.ivfpq_index_health(spark, tbl).collect()
        assert sum(r.n_vecs for r in h2) == 40
    finally:
        for t in (tbl, f"{tbl}_centroids", f"{tbl}_codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_tokenizer_fertility_hand_values(spark):
    """Hand-checked fertility: 'don't stop' is 2 words but 4 BPE-ish
    pieces (don / ' / t / stop); ratios are integer basis points."""
    from logverzcore_spark.operators.text import tokenizer_fertility

    df = spark.createDataFrame(
        [(0, "a", "don't stop"), (1, "a", "plain words here"), (2, "b", "x1")],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in tokenizer_fertility(df).collect()}
    a = out["a"]
    # words: 2 + 3 = 5; pieces: (don,',t,stop)=4 + 3 = 7; chars 10+16=26
    assert (a.n_words, a.n_pieces, a.n_chars) == (5, 7, 26)
    assert a.fertility_bp == (10000 * 7) // 5
    assert a.chars_per_piece_bp == (10000 * 26) // 7
    b = out["b"]
    # 'x1' -> pieces x, 1
    assert b.n_words == 1 and b.n_pieces == 2


def test_fim_transform_reconstructs(spark):
    """FIM output is a rearrangement, not a rewrite: splicing
    prefix+middle+suffix back together recovers the original token
    stream; cut points stay in range; non-selected docs pass through."""
    from logverzcore_spark.operators.text import fim_transform

    rows = [(i, " ".join(f"w{j}" for j in range(3 + i % 9))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = fim_transform(df).collect()
    originals = dict(rows)
    n_fim = 0
    for r in out:
        if not r.fim_applied:
            assert r.out_text == originals[r.doc_id]
            continue
        n_fim += 1
        assert 0 <= r.cut1 <= r.cut2 <= r.n_tokens
        body = r.out_text
        assert body.startswith("<|fim_prefix|>")
        pre, rest = body[len("<|fim_prefix|>"):].split("<|fim_suffix|>", 1)
        suf, mid = rest.split("<|fim_middle|>", 1)
        spliced = " ".join(x for x in (pre, mid, suf) if x)
        assert spliced == originals[r.doc_id], r.doc_id
    assert 10 < n_fim < 50  # ~50% selection actually fires both ways


def test_hard_negatives_excludes_same_label(spark):
    """Every mined negative has a different label than its query, and
    the nearest same-label vector never appears even when it is the
    global nearest neighbor."""
    from logverzcore_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.99, 0.14], 7),   # same label, nearly identical -> excluded
        (2, [0.9, 0.43], 8),
        (3, [0.0, 1.0], 9),
        (4, [-1.0, 0.0], 8),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = emb.where("vec_id = 0")
    out = hard_negatives(emb, q, k=3).collect()
    got = [(r.negative_id, r.negative_label, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert [g[0] for g in got] == [2, 3, 4]
    assert all(g[1] != 7 for g in got)


def test_parse_npy_meta_real_numpy_files(spark):
    """Ground truth from numpy itself: np.save output parses with the
    right dtype/shape/order; a v2.0 header (u32le length) also parses;
    truncation fails completeness."""
    import io

    import numpy as np

    from logverzcore_spark.operators.multimodal import parse_npy_meta

    def npy_bytes(arr, version=None):
        b = io.BytesIO()
        if version:
            np.lib.format.write_array(b, arr, version=version)
        else:
            np.save(b, arr)
        return b.getvalue()

    rows = [
        (0, npy_bytes(np.zeros((3, 4), dtype="<f4"))),
        (1, npy_bytes(np.arange(5, dtype="<i8"))),
        (2, npy_bytes(np.asfortranarray(np.ones((2, 3, 4), dtype="<f8")))),
        (3, npy_bytes(np.zeros((2, 2), dtype="<f4"), version=(2, 0))),
        (4, npy_bytes(np.zeros((3, 4), dtype="<f4"))[:-10]),  # data truncated
        (5, b"not a tensor"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in parse_npy_meta(df).collect()}
    assert (out[0].dtype, out[0].shape, out[0].n_elems) == ("<f4", "3x4", 12)
    assert out[0].complete is True and out[0].fortran_order is False
    assert (out[1].shape, out[1].item_bytes) == ("5", 8)
    assert out[2].fortran_order is True and out[2].n_elems == 24
    assert out[3].format == "npy" and out[3].shape == "2x2" and out[3].complete is True
    assert out[4].format == "npy" and out[4].complete is False
    assert out[5].format == "unknown"


def test_dedup_threshold_sweep_monotone(spark):
    """Pair and doc counts are monotone non-increasing in the threshold;
    zero-hit thresholds still appear with zeros."""
    from logverzcore_spark.operators.dedup import dedup_threshold_sweep

    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, base), (1, base),                       # exact dup pair -> j=1.0
        (2, base + " eta theta"),                    # high-overlap
        (3, "totally different words entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.threshold: r for r in dedup_threshold_sweep(
        df, thresholds=(0.3, 0.9, 0.999)).collect()}
    assert set(out) == {0.3, 0.9, 0.999}
    assert out[0.3].n_pairs >= out[0.9].n_pairs >= out[0.999].n_pairs
    assert out[0.999].n_pairs == 1 and out[0.999].n_dup_docs == 2  # the exact dup
    assert out[0.999].dup_frac_bp == 5000
    assert out[0.3].n_dup_docs >= 3


def test_seq_len_planning_hand_values(spark):
    """Hand-checked: docs of 3/5/10 tokens at L=4 -> 2 overflow, 1+6
    truncated tokens of 18 total, usable 3+4+4=11, min_packs ceil(11/4)=3;
    at L=16 nothing overflows and min_packs = ceil(18/16) = 2."""
    import pytest as _pytest

    from logverzcore_spark.operators.text import seq_len_planning

    rows = [(0, "a b c"), (1, "a b c d e"), (2, "a b c d e f g h i j")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.max_seq_len: r for r in seq_len_planning(df, lengths=(4, 16)).collect()}
    l4 = out[4]
    assert (l4.n_docs, l4.total_tokens) == (3, 18)
    assert l4.n_docs_over == 2 and l4.over_frac_bp == 6666
    assert l4.truncated_token_share_bp == (10000 * 7) // 18
    assert l4.usable_tokens == 11 and l4.min_packs == 3
    l16 = out[16]
    assert l16.n_docs_over == 0 and l16.truncated_token_share_bp == 0
    assert l16.usable_tokens == 18 and l16.min_packs == 2
    with _pytest.raises(ValueError):
        seq_len_planning(df, lengths=())
    with _pytest.raises(ValueError):
        seq_len_planning(df, lengths=(0,))


def test_canary_scan_and_dup_origin(spark):
    """Canary scan reports only planted docs (empty = gate passes);
    dup-origin classifies cross- vs intra-source groups."""
    import pytest as _pytest

    from logverzcore_spark.operators.dedup import dup_origin_report
    from logverzcore_spark.operators.text import BIGBENCH_CANARY, canary_scan

    rows = [
        (0, "a", f"clean doc then {BIGBENCH_CANARY} leaked"),
        (1, "a", "clean doc"),
        (2, "b", "another clean doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    hits = canary_scan(df).collect()
    assert len(hits) == 1 and hits[0].source == "a" and hits[0].doc_ids == "0"
    assert canary_scan(df.where("doc_id > 0")).count() == 0  # gate passes
    with _pytest.raises(ValueError):
        canary_scan(df, canaries=())
    # id_col parameterization: a frame with a different id column works
    renamed = df.withColumnRenamed("doc_id", "page_id")
    hits2 = canary_scan(renamed, id_col="page_id").collect()
    assert len(hits2) == 1 and hits2[0].doc_ids == "0"

    dups = [
        (0, "a", "Same  Body"), (1, "b", "same body"),   # cross (normalized)
        (2, "c", "local tpl"), (3, "c", "local tpl"),    # intra
        (4, "d", "unique text"),
    ]
    ddf = spark.createDataFrame(dups, "doc_id long, source string, text string")
    out = {r.origin: r for r in dup_origin_report(ddf).collect()}
    assert out["cross_source"].n_copies == 2 and out["cross_source"].sources == "a,b"
    assert out["intra_source"].n_sources == 1 and out["intra_source"].sources == "c"
    assert len(out) == 2  # the unique doc never appears


def test_parse_warc_records_gzip_members_and_truncation(spark):
    """WARC walk edge windows the suite oracle can't reach: the .warc.gz
    member-per-record convention (split on gzip member boundaries),
    mid-header truncation (stop cleanly, keep prior records), a block
    whose Content-Length lies past EOF (record still reported — headers
    were intact; the CHAIN just ends), and a non-mandatory-length
    record (walk stops, prior records kept)."""
    import gzip

    from logverzcore_spark.operators.multimodal import parse_warc_records

    def rec(wtype, uri, body: bytes) -> bytes:
        h = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        if uri:
            h += f"WARC-Target-URI: {uri}\r\n"
        h += f"Content-Length: {len(body)}\r\n\r\n"
        return h.encode() + body + b"\r\n\r\n"

    full = rec("warcinfo", None, b"sw: x\n") + rec(
        "response", "https://a/1", b"B" * 37
    ) + rec("request", "https://a/1", b"C" * 5)
    # 1: plain 3-record file
    # 2: same records, one gzip member each (Common Crawl layout)
    gz = b"".join(
        gzip.compress(r, mtime=0)
        for r in (rec("warcinfo", None, b"sw: x\n"),
                  rec("response", "https://a/1", b"B" * 37),
                  rec("request", "https://a/1", b"C" * 5))
    )
    # 3: truncated mid-header of record 2 -> only record 1 survives
    trunc = rec("warcinfo", None, b"sw: x\n") + b"WARC/1.0\r\nWARC-Ty"
    # 4: record 2's declared length runs past EOF -> both records
    #    reported (headers parsed), chain ends there
    lie = rec("warcinfo", None, b"sw: x\n") + (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a/2\r\nContent-Length: 99999\r\n\r\nxx"
    )
    # 5: missing Content-Length -> mandatory header absent, walk stops
    bad = rec("warcinfo", None, b"ok\n") + (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    )
    # 6: gzip garbage -> unknown
    df = spark.createDataFrame(
        [(1, full), (2, gz), (3, trunc), (4, lie), (5, bad),
         (6, b"\x1f\x8b\x00garbage")],
        "doc_id long, payload binary",
    )
    rows = parse_warc_records(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(
            (r["rec_idx"], r["format"], r["warc_type"],
             r["target_uri"], r["content_length"])
        )
    exp3 = [
        (1, "warc", "warcinfo", None, 6),
        (2, "warc", "response", "https://a/1", 37),
        (3, "warc", "request", "https://a/1", 5),
    ]
    assert sorted(by[1]) == exp3
    assert sorted(by[2]) == exp3  # gzip members == plain content
    assert sorted(by[3]) == exp3[:1]
    assert sorted(by[4]) == [
        (1, "warc", "warcinfo", None, 6),
        (2, "warc", "response", "https://a/2", 99999),
    ]
    assert sorted(by[5]) == [(1, "warc", "warcinfo", None, 3)]
    assert by[6] == [(None, "unknown", None, None, None)]


def test_lsh_bucket_cap_trades_recall_measurably(spark):
    """max_bucket_size (the d03 verify-join pressure-relief valve):
    capping skips mega-buckets, so pairs that ONLY collide there (a
    planted boilerplate cluster whose members minhash alike in every
    band) are lost — measurably, recall 0 on that cluster — while
    ordinary near-dup pairs are untouched (recall 1). Uncapped finds
    everything; exact_dedup first is the documented recovery for the
    boilerplate mass."""
    from logverzcore_spark.operators.dedup import minhash_lsh_pairs

    base = (
        "the alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo tango"
    )
    rows = [(0, base), (1, base.replace("tango", "zulu"))]  # ordinary pair
    boiler = "cookie notice please accept our terms and conditions " * 3
    rows += [(100 + i, boiler) for i in range(30)]  # mega-cluster
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(**kw):
        return {
            (r["id1"], r["id2"])
            for r in minhash_lsh_pairs(df, threshold=0.7, **kw).collect()
        }

    full = pairs()
    capped = pairs(max_bucket_size=10)
    boiler_pairs = {(a, b) for a in range(100, 130) for b in range(a + 1, 130)}
    assert (0, 1) in full and boiler_pairs <= full  # uncapped: everything
    assert (0, 1) in capped  # ordinary pairs survive the cap
    lost = full - capped
    assert lost == boiler_pairs  # the trade is exactly the mega-cluster
    recall = len(capped & full) / len(full)
    assert 0 < recall < 1  # measurable, not silent: 436/435... quantified
    # exact_dedup first collapses the boilerplate mass, so the capped
    # pipeline then finds every surviving pair
    from logverzcore_spark.operators.dedup import exact_dedup

    keep = exact_dedup(df).select(F.col("keep_id").alias("doc_id"))
    survivors = df.join(keep, "doc_id", "semi")
    capped2 = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_pairs(
            survivors, threshold=0.7, max_bucket_size=10
        ).collect()
    }
    assert (0, 1) in capped2


def test_threshold_sweep_lsh_tier_matches_exact_curve(spark):
    """The r8 scale-safe sweep path (VERDICT task 1): on a corpus with
    planted near-dups across the swept range, the LSH-candidate tier's
    sweep curve must equal the exact tier's (auto-derived r=1 banding
    at min=0.3 gives per-pair miss ~1e-5 — on a finite corpus that is
    zero lost pairs), the mega-bucket valve composes, the sample knob
    validates, and an unknown tier fails loudly. The CURVE DELTA is
    quantified, not assumed."""
    import pytest as _pytest

    from logverzcore_spark.operators.dedup import (
        dedup_threshold_sweep,
        sweep_lsh_bands,
    )

    # band auto-derivation: loose thresholds force r=1; tight allow r>1
    assert sweep_lsh_bands(0.3) == 32  # (1-.3^2)^16 ≈ .22 → r=1
    assert sweep_lsh_bands(0.9) == 8   # r=4: (1-.9^4)^8 ≈ 2e-4 ≤ 1e-3
    assert (1 - 0.9 ** (32 // sweep_lsh_bands(0.9))) ** sweep_lsh_bands(0.9) <= 1e-3
    # the r=1 floor's recall contract is loud, never silently degraded:
    # below s≈0.194 with 32 hashes (1-s)^32 > 1e-3 → warn; doubling the
    # hash count restores the bound and the silence
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        with _pytest.raises(UserWarning, match="recall target"):
            sweep_lsh_bands(0.1)
        assert sweep_lsh_bands(0.2) == 32     # 0.8^32 ≈ 8e-4 ≤ 1e-3: quiet
        assert sweep_lsh_bands(0.11, num_hashes=64) == 64  # bound restored

    words = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(15):  # pairs at graded overlap: jaccard spans ~0.25-0.9
        base = " ".join(words)
        mut = " ".join(words[: 30 - 2 * d] + [f"m{d}x{j}" for j in range(2 * d)])
        rows += [(d * 2, base + f" tail{d}"), (d * 2 + 1, mut + f" tail{d}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def curve(**kw):
        out = dedup_threshold_sweep(df, thresholds=(0.3, 0.5, 0.7), **kw)
        return {r["threshold"]: (r["n_pairs"], r["n_dup_docs"]) for r in out.collect()}

    exact = curve(candidates="exact")
    lsh = curve(candidates="lsh")
    assert exact[0.3][0] > exact[0.5][0] > exact[0.7][0] >= 0  # real sweep
    delta = {t: lsh[t][0] - exact[t][0] for t in exact}
    assert delta == {0.3: 0, 0.5: 0, 0.7: 0}  # quantified: zero lost pairs
    # valve composes: capping cannot ADD pairs
    capped = curve(candidates="lsh", max_bucket_size=4)
    assert all(capped[t][0] <= lsh[t][0] for t in lsh)
    # sample knob: a fraction sweeps a deterministic subset (fewer or
    # equal pairs at every threshold), and validates its range
    sampled = curve(candidates="exact", sample_fraction=0.5)
    assert all(sampled[t][0] <= exact[t][0] for t in exact)
    # Horvitz-Thompson tier (the 100 TB full-corpus path): selective
    # r=2 banding with the known inclusion probability divided out —
    # the ESTIMATED curve must track the exact one closely even where
    # p(j) < 1 (this corpus has pairs across 0.3-0.9), and be exact at
    # tight thresholds where p -> 1.
    ht = curve(candidates="lsh", estimator="ht")
    for t in exact:
        if exact[t][0]:
            assert abs(ht[t][0] - exact[t][0]) / exact[t][0] <= 0.25, (t, ht, exact)
    assert ht[0.7][0] == exact[0.7][0]  # p(0.7) = 0.9997: exact in practice
    with _pytest.raises(ValueError):
        curve(candidates="exact", sample_fraction=1.5)
    with _pytest.raises(ValueError):
        curve(candidates="bogus")
    with _pytest.raises(ValueError):
        curve(candidates="exact", estimator="ht")
    with _pytest.raises(ValueError):
        curve(candidates="lsh", estimator="bogus")


def test_threshold_sweep_auto_tier_routing(spark, monkeypatch):
    """candidates='auto' picks the tier from MEASURED inputs and stamps
    the choice on every row (no silent switches): tight sweeps take the
    selective recall-exact LSH tier; loose sweeps stay exact on a small
    corpus and route to the HT estimator past the size boundary — with
    values matching each explicitly-chosen tier."""
    import pytest as _pytest

    from logverzcore_spark.operators import dedup as dd

    words = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(10):
        base = " ".join(words)
        mut = " ".join(words[: 30 - 2 * d] + [f"m{d}x{j}" for j in range(2 * d)])
        rows += [(d * 2, base + f" tail{d}"), (d * 2 + 1, mut + f" tail{d}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def curve(ts, **kw):
        out = dd.dedup_threshold_sweep(df, thresholds=ts, **kw).collect()
        tiers = {r["tier"] for r in out} if "tier" in out[0].asDict() else set()
        return {r["threshold"]: r["n_pairs"] for r in out}, tiers

    # rule 2a: loose sweep (r=1 degeneration) + small corpus → exact
    auto, tiers = curve((0.3, 0.7), candidates="auto")
    exact, _ = curve((0.3, 0.7), candidates="exact")
    assert tiers == {"exact"} and auto == exact

    # rule 1: tight sweep meets the recall bound at r>=2 → lsh
    auto_t, tiers_t = curve((0.7, 0.9), candidates="auto")
    lsh_t, _ = curve((0.7, 0.9), candidates="lsh")
    assert tiers_t == {"lsh"} and auto_t == lsh_t

    # rule 2b: loose sweep + corpus past the boundary → HT estimator
    monkeypatch.setattr(dd, "_SWEEP_AUTO_EXACT_MAX_ROWS", 10)
    auto_h, tiers_h = curve((0.3, 0.7), candidates="auto")
    ht, _ = curve((0.3, 0.7), candidates="lsh", estimator="ht")
    assert tiers_h == {"ht"} and auto_h == ht
    monkeypatch.undo()

    # r10: the boundary is a CALLER-TUNABLE wall-clock budget, not a
    # hidden constant — auto_exact_max_rows moves the 2a/2b switch
    # point and the stamped tier reflects what actually ran
    auto_lo, tiers_lo = curve(
        (0.3, 0.7), candidates="auto", auto_exact_max_rows=10
    )
    assert tiers_lo == {"ht"} and auto_lo == ht
    auto_hi, tiers_hi = curve(
        (0.3, 0.7), candidates="auto", auto_exact_max_rows=10_000
    )
    assert tiers_hi == {"exact"} and auto_hi == exact

    # explicit tiers keep the 4-column schema (no tier column)
    assert "tier" not in dd.dedup_threshold_sweep(
        df, thresholds=(0.7,), candidates="lsh"
    ).columns
    # auto owns the estimator knob
    with _pytest.raises(ValueError, match="owns the estimator"):
        dd.dedup_threshold_sweep(df, candidates="auto", estimator="ht")


def test_webdataset_export_bytes_reproducible(spark, tmpdir_path):
    """m31's write-side contract: re-exporting an unchanged corpus
    yields BYTE-identical shard files (pinned tar metadata + md5 shard
    assignment + key-ordered members) — what makes shard-level caching
    and trainer resume safe — and the manifest counts both members per
    sample."""
    import hashlib
    import os

    from logverzcore_spark import export

    df = spark.createDataFrame(
        [(i, f"doc body {i} " * (1 + i % 3)) for i in range(50)],
        "doc_id long, text string",
    )

    def digest(d):
        out = {}
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    d1 = os.path.join(tmpdir_path, "wds1")
    d2 = os.path.join(tmpdir_path, "wds2")
    m1 = export.export_webdataset_shards(df, d1, n_shards=4).collect()
    export.export_webdataset_shards(df, d2, n_shards=4).count()
    assert digest(d1) == digest(d2)  # byte-identical re-export
    assert sum(r["n_members"] for r in m1) == 100  # 2 per sample
    assert {r["shard"] for r in m1} <= set(range(4))
    # every tar is block-aligned (512) and non-trivial
    assert all(r["n_bytes"] % 512 == 0 and r["n_bytes"] > 1024 for r in m1)
    # manifest n_bytes is the on-disk size (the streaming writer's tell)
    assert all(os.path.getsize(r["path"]) == r["n_bytes"] for r in m1)


def test_webdataset_export_stale_shard_guard(spark, tmpdir_path):
    """A re-export with smaller n_shards into a non-empty directory must
    not leave the previous run's higher-numbered shard-*.tar behind
    (a glob reader would silently include them): default fails fast,
    if_exists='overwrite' removes every pre-existing shard first."""
    import os

    import pytest

    from logverzcore_spark import export

    df = spark.createDataFrame(
        [(i, f"body {i}") for i in range(40)], "doc_id long, text string"
    )
    d = os.path.join(tmpdir_path, "wds_guard")
    export.export_webdataset_shards(df, d, n_shards=8).count()
    assert len([f for f in os.listdir(d) if f.endswith(".tar")]) == 8
    with pytest.raises(FileExistsError, match="shard-.*\\.tar"):
        export.export_webdataset_shards(df, d, n_shards=2)
    export.export_webdataset_shards(df, d, n_shards=2, if_exists="overwrite").count()
    # no stale high-numbered shards survive the smaller re-export
    assert sorted(f for f in os.listdir(d) if f.endswith(".tar")) == [
        "shard-00000.tar", "shard-00001.tar"
    ]


def test_reliability_bins_separates_calibrated_from_noise(spark):
    """t64's operator on controlled inputs: a label that IS a threshold
    of the score yields a step reliability curve (0 bp below, 10000 bp
    above), while a label independent of the score yields a flat curve
    near the base rate in every populated bin — the distinction the
    audit exists to expose. Counts and rates are integer-exact."""
    from logverzcore_spark.operators.text import reliability_bins

    rows = [(i, i * 10, i * 10 >= 500, i % 2 == 0) for i in range(100)]
    df = spark.createDataFrame(
        rows, "i long, score_bp long, calibrated boolean, coin boolean"
    )
    step = {r["bin"]: r for r in
            reliability_bins(df, "score_bp", "calibrated", bin_width=100).collect()}
    assert all(r["pos_rate_bp"] == 0 for b, r in step.items() if b < 5)
    assert all(r["pos_rate_bp"] == 10000 for b, r in step.items() if b >= 5)
    assert sum(r["n_docs"] for r in step.values()) == 100
    flat = reliability_bins(df, "score_bp", "coin", bin_width=100).collect()
    assert all(r["pos_rate_bp"] == 5000 for r in flat)  # 10 per bin, 5 even


def test_canonical_url_dedup_key_rules(spark):
    """t63/st34's dedup KEY pinned (normalize_url().url_canon — the
    package's single URL-canonicalization authority, t42): variants of
    one page collapse to one key, case-sensitive parts survive,
    tracking params go, real params stay sorted, and garbage
    canonicalizes to NULL (caller decides)."""
    from logverzcore_spark.operators.text import normalize_url

    def canonicalize_url(col):
        return normalize_url(col).getField("url_canon")

    rows = [
        (1, "HTTPS://Ex.COM:443/Path/x?utm_source=a&b=2&a=1#frag"),
        (2, "https://ex.com/Path/x?a=1&b=2"),
        (3, "https://ex.com/Path/x/?b=2&a=1&fbclid=z"),
        (4, "http://ex.com:80/q?gclid=1"),   # all params tracked -> no '?'
        (5, "https://ex.com/CASE"),           # path case preserved
        (6, "https://ex.com/case"),
        (7, "no scheme here"),
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("u")).alias("c")).collect()}
    assert got[1] == got[2] == got[3] == "https://ex.com/Path/x?a=1&b=2"
    assert got[4] == "http://ex.com/q"
    assert got[5] != got[6]  # paths stay case-sensitive
    assert got[7] is None


def test_incremental_neardup_index_reuse(spark, tmpdir_path):
    """The d30 production contract: probing a PERSISTED corpus LSH
    index returns the same pairs as building it inline (a batch never
    re-bands the corpus), drifted re-crawl copies are caught across
    the batch/corpus boundary, unrelated docs are not, and the
    mega-bucket valve composes on the corpus index."""
    import os

    from logverzcore_spark.operators.dedup import (
        build_neardup_index,
        incremental_neardup_pairs,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3
    corpus = spark.createDataFrame(
        [(1, base + "kilo lima"), (2, "totally unrelated words only here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, base + "kilo lima drift"),  # re-crawl with a page edit
         (101, "fresh novel content nothing shared at all")],
        "doc_id long, text string",
    )
    inline = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_neardup_pairs(batch, corpus, threshold=0.7).collect()
    }
    assert inline == {(100, 1)}

    # persisted-index path: write, read back, probe — identical pairs
    idx_path = os.path.join(tmpdir_path, "neardup_idx")
    build_neardup_index(corpus).write.parquet(idx_path)
    reused = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_neardup_pairs(
            batch, corpus, threshold=0.7,
            corpus_index=spark.read.parquet(idx_path),
        ).collect()
    }
    assert reused == inline

    # valve composes: capping corpus buckets can only REMOVE pairs
    capped = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_neardup_pairs(
            batch, corpus, threshold=0.7, max_bucket_size=1
        ).collect()
    }
    assert capped <= inline

    # shuffle-verify fallback (the dup-dense/large-batch escape from
    # the array-bearing broadcast collect): identical pairs, and the
    # merge hint actually defeats the planner — no broadcast build
    # carries a shingle-hash array column
    shuffled_df = incremental_neardup_pairs(
        batch, corpus, threshold=0.7, broadcast_verify=False
    )
    assert {
        (r["new_id"], r["corpus_id"]) for r in shuffled_df.collect()
    } == inline
    import re

    fmt = spark._jvm.PythonSQLUtils.explainString(
        shuffled_df._jdf.queryExecution(), "formatted"
    )
    for m in re.finditer(
        r"\(\d+\) BroadcastExchange\nInput \[\d+\]: \[([^\]]*)\]", fmt
    ):
        assert "_h_" not in m.group(1), m.group(1)


def test_neardup_index_lifecycle_policy(spark):
    """d30's bank refresh rule: (1) CORRECTNESS never needs a rebuild —
    banding is deterministic, so appending a batch's index rows is
    provably equivalent to re-banding the union, both as index content
    and as probe results AT the policy boundary; (2) the health report
    measures what DOES decay (new-mass fraction, occupancy drift,
    mega-bucket concentration) and rebuild_when converts it into a
    loud, reasoned decision."""
    from logverzcore_spark.operators.dedup import (
        build_neardup_index,
        incremental_neardup_pairs,
        neardup_index_health,
        rebuild_when,
    )

    def words(i):  # fully distinct vocabularies: baseline buckets are all size 1
        return " ".join(f"c{i}w{j}" for j in range(12))

    corpus = spark.createDataFrame(
        [(i, words(i)) for i in range(40)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, words(i) + " drift") for i in range(25)]
        + [(200 + i, "shared boilerplate body exactly alike") for i in range(30)],
        "doc_id long, text string",
    )

    # (1a) append == rebuild, as INDEX CONTENT (exact row equivalence)
    appended = build_neardup_index(corpus).unionByName(build_neardup_index(batch))
    rebuilt = build_neardup_index(corpus.unionByName(batch))
    assert appended.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(appended).count() == 0

    # (1b) ... and as PROBE RESULTS at the policy boundary: a fresh
    # probe batch sees identical pairs through either index
    probe = spark.createDataFrame(
        [(900, words(3) + " x")], "doc_id long, text string"
    )
    bank = corpus.unionByName(batch)
    pairs_app = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_neardup_pairs(
            probe, bank, threshold=0.5, corpus_index=appended
        ).collect()
    }
    pairs_reb = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in incremental_neardup_pairs(
            probe, bank, threshold=0.5, corpus_index=rebuilt
        ).collect()
    }
    assert pairs_app == pairs_reb and pairs_app  # equal and non-trivial

    # (2) health: fresh-on-fresh is quiet; a boilerplate-heavy append
    # moves all three needles and rebuild_when says WHY
    baseline = neardup_index_health(build_neardup_index(corpus),
                                    mega_bucket_size=8)
    assert baseline["n_rows"] == 40 * 16 and baseline["mega_mass_bp"] == 0
    same = neardup_index_health(build_neardup_index(corpus), baseline=baseline,
                                mega_bucket_size=8)
    assert same["new_mass_bp"] == 0 and same["occupancy_drift_bp"] == 0
    assert rebuild_when(same) == (False, [])
    grown = neardup_index_health(appended, baseline=baseline,
                                 mega_bucket_size=8)
    assert grown["new_mass_bp"] > 5000          # batch outweighs the bank
    assert grown["occupancy_drift_bp"] > 0      # shape changed
    assert grown["mega_mass_bp"] > 2000         # 30 identical docs concentrate
    due, reasons = rebuild_when(grown)
    assert due and len(reasons) == 3
    assert any("mega" in r for r in reasons)


def test_curriculum_schedule_budgets_and_monotonicity(spark):
    """Every stage sums exactly to its budget; a domain whose target
    share exceeds its natural share rises monotonically across stages
    (and vice versa); stage 0 is the natural mixture, the last stage
    the target mixture (both up to Hamilton rounding)."""
    import pytest as _pytest

    from logverzcore_spark.operators.text import curriculum_schedule

    rows = []
    # src0: 80% of tokens but target weight 1; src1: 10% with weight 8
    for i in range(80):
        rows.append((i, "src0", "tok " * 10))
    for i in range(80, 90):
        rows.append((i, "src1", "tok " * 10))
    for i in range(90, 100):
        rows.append((i, "src2", "tok " * 10))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curriculum_schedule(
        df, {"src0": 1, "src1": 8, "src2": 1}, n_stages=4,
        tokens_per_stage=10_000,
    ).collect()
    by_stage: dict[int, dict[str, int]] = {}
    for r in out:
        by_stage.setdefault(r["stage"], {})[r["source"]] = r["alloc_tokens"]
    assert set(by_stage) == {0, 1, 2, 3}
    for allocs in by_stage.values():
        assert sum(allocs.values()) == 10_000  # exact budget per stage
    s0, s3 = by_stage[0], by_stage[3]
    assert s0["src0"] == 8000 and s0["src1"] == 1000  # natural mixture
    assert s3["src1"] == 8000 and s3["src0"] == 1000  # target mixture
    seq = [by_stage[s]["src1"] for s in range(4)]
    assert seq == sorted(seq) and seq[0] < seq[-1]  # under-repped rises
    seq0 = [by_stage[s]["src0"] for s in range(4)]
    assert seq0 == sorted(seq0, reverse=True)  # over-repped falls
    with _pytest.raises(ValueError):
        curriculum_schedule(df, {"src0": 1}, n_stages=1)


def test_maxsim_rewards_multi_aspect_match(spark):
    """MaxSim ranks a document matching EVERY query slice somewhere
    above one that matches a single slice perfectly — the property
    single-vector cosine lacks."""
    from logverzcore_spark.operators.similarity import maxsim_topk

    dim, w = 8, 2  # 4 slices of width 2

    def vec(*slices):
        out = []
        for s in slices:
            out += [float(x) for x in s]
        return out

    q = vec((1, 0), (0, 1), (1, 1), (1, 0))
    # doc A: every query slice appears (shuffled) -> maxsim ~4
    a = vec((0, 1), (1, 0), (1, 0), (1, 1))
    # doc B: one slice matches exactly, others orthogonal-ish
    b = vec((1, 0), (1, 0), (1, 0), (0, 1))
    df = spark.createDataFrame(
        [(0, q), (1, a), (2, b)], "vec_id long, embedding array<double>"
    )
    out = maxsim_topk(
        df, df.where("vec_id = 0"), k=2, n_slices=4, dim=dim
    ).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in ranked] == [1, 2]
    assert ranked[0]["maxsim"] > ranked[1]["maxsim"]


def test_maxsim_zero_norm_slice_scores_zero_not_null(spark):
    """A zero-padded slice (common token-block padding) must contribute
    0, never a NULL that propagates through greatest/sum and silently
    drops or misranks the pair — the r7 ADVICE div-by-zero finding."""
    from logverzcore_spark.operators.similarity import maxsim_topk

    def vec(*slices):
        return [float(x) for s in slices for x in s]

    # query's last slice is all-zero padding; doc C is entirely zero
    q = vec((1, 0), (0, 1), (1, 1), (0, 0))
    a = vec((1, 0), (0, 1), (1, 1), (1, 0))  # matches all real slices
    c = vec((0, 0), (0, 0), (0, 0), (0, 0))  # degenerate corpus vector
    df = spark.createDataFrame(
        [(0, q), (1, a), (2, c)], "vec_id long, embedding array<double>"
    )
    out = maxsim_topk(df, df.where("vec_id = 0"), k=2, n_slices=4, dim=8)
    rows = {r["neighbor_id"]: r for r in out.collect()}
    # BOTH pairs survive with non-NULL scores; the real match wins
    assert set(rows) == {1, 2}
    assert rows[1]["maxsim"] is not None and rows[2]["maxsim"] is not None
    assert rows[1]["maxsim"] > rows[2]["maxsim"] == 0.0


def test_exact_substring_scrub_alignment_and_coverage(spark):
    """The ExactSubstr properties t14's fixed segments lack: a shared
    span is found at ANY alignment (one doc prefixed by an extra
    token), and overlapping duplicated windows never double-count a
    token in the coverage union."""
    from logverzcore_spark.operators.dedup import exact_substring_scrub

    shared = "q w e r t y u i o p"  # 10 tokens -> 3 windows of 8
    rows = [
        (1, shared + " aaa bbb ccc ddd"),
        (2, "zzz " + shared + " eee fff ggg"),  # shifted by one token
        (3, "totally different words here only once never repeated ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in exact_substring_scrub(df, window=8).collect()}
    # 10-token shared run -> windows at 3 alignments, coverage union = 10
    assert got[1]["n_dup_windows"] == 3 and got[1]["covered_tokens"] == 10
    assert got[2]["n_dup_windows"] == 3 and got[2]["covered_tokens"] == 10
    assert got[3]["n_dup_windows"] == 0 and got[3]["covered_tokens"] == 0
    assert got[1]["n_tokens"] == 14 and got[1]["dup_coverage_bp"] == 7142


def test_extract_warc_http_edges(spark):
    """HTTP extraction edges: non-HTTP response block skipped, body
    truncation at max_body_bytes with the true length still reported,
    Transfer-Encoding body passed through raw, request records never
    extracted."""
    from logverzcore_spark.operators.multimodal import extract_warc_http

    def rec(wtype, uri, body: bytes) -> bytes:
        h = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        if uri:
            h += f"WARC-Target-URI: {uri}\r\n"
        h += f"Content-Length: {len(body)}\r\n\r\n"
        return h.encode() + body + b"\r\n\r\n"

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + b"A" * 100
    )
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n0\r\n\r\n"
    )
    blob = (
        rec("response", "https://a/1", http)
        + rec("response", "https://a/2", b"not http at all")
        + rec("request", "https://a/1", b"GET / HTTP/1.1\r\n\r\n")
        + rec("response", "https://a/3", chunked)
    )
    df = spark.createDataFrame([(1, blob)], "doc_id long, payload binary")
    rows = {r["target_uri"]: r for r in
            extract_warc_http(df, max_body_bytes=10).collect()}
    assert set(rows) == {"https://a/1", "https://a/3"}
    r1 = rows["https://a/1"]
    assert r1["status"] == 200 and r1["content_type"] == "text/plain"
    assert r1["n_body_bytes"] == 100  # true length
    assert r1["body_text"] == "A" * 10  # truncated read
    assert "hello" in rows["https://a/3"]["body_text"]  # raw pass-through


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The property t22 (lexical) and d27 (semantic) exist for: every
    member of a near-dup cluster lands in the SAME split (no train/eval
    leak), while t05's per-doc hash split measurably violates it on the
    same corpus."""
    from logverzcore_spark.operators import dedup
    from logverzcore_spark.operators.text import hash_split

    rows = []
    for i in range(40):  # 40 clusters of 3 near-dups, disjoint vocabularies
        v = " ".join(f"tok{i}x{j}" for j in range(20))
        rows += [(i * 10, v), (i * 10 + 1, v + " x"), (i * 10 + 2, v + " y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5)
    clusters = dedup.dup_clusters(df, pairs)
    out = clusters.select(
        "doc_id", "cluster_id", hash_split(F.col("cluster_id")).alias("split")
    ).collect()
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())  # never split
    assert len({next(iter(s)) for s in by_cluster.values()}) > 1  # real mix
    # contrast: per-doc split tears at least one cluster apart here
    naive = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hash_split(F.col("doc_id")).alias("s")
        ).collect()
    }
    cluster_members: dict[int, list] = {}
    for r in out:
        cluster_members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    torn = sum(
        1 for ms in cluster_members.values()
        if len(ms) > 1 and len({naive[m] for m in ms}) > 1
    )
    assert torn > 0


def test_exact_substring_scrub_short_docs_and_maxsim_validation(spark):
    """Regressions from the r7 self-review: documents shorter than the
    window must yield zero windows (not a slice(_, 0, w) crash — Spark
    sequence(1, 0) counts DOWN), and maxsim rejects a dim that does not
    slice evenly instead of silently NULL-scoring."""
    import pytest as _pytest

    from logverzcore_spark.operators.dedup import exact_substring_scrub
    from logverzcore_spark.operators.similarity import maxsim_topk

    rows = [
        (1, ""),                       # empty
        (2, "only three tokens"),      # < window
        (3, "a b c d e f g h"),        # exactly window -> 1 window
        (4, "a b c d e f g h"),        # duplicate of 3 (cross-doc)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in exact_substring_scrub(df, window=8).collect()}
    assert got[1]["n_dup_windows"] == 0 and got[1]["covered_tokens"] == 0
    assert got[2]["n_dup_windows"] == 0 and got[2]["n_tokens"] == 3
    assert got[3]["n_dup_windows"] == 1 and got[3]["covered_tokens"] == 8
    assert got[4]["dup_coverage_bp"] == 10000

    vecs = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError):
        maxsim_topk(vecs, vecs, n_slices=5, dim=64)  # 64 % 5 != 0
    with _pytest.raises(ValueError):
        maxsim_topk(vecs, vecs, n_slices=1, dim=64)


def test_epoch_shuffle_rejects_null_ids(spark):
    """A NULL id would silently vanish through the offsets join —
    the operator must fail loudly instead."""
    import pytest as _pytest

    from logverzcore_spark import export

    df = spark.createDataFrame(
        [(1,), (None,)], "doc_id long"
    )
    with _pytest.raises(Exception, match="NULL doc_id"):
        export.epoch_shuffle(df, seed=7).collect()
