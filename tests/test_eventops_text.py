"""Unit tests for event-analytics operators (funnel / retention / spine
fill) and the round-2 text ops (bigrams, TF-IDF) — semantics the graded
oracles can't isolate (ordering rules, empty buckets, tie-breaks)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logverzcore_spark.operators import eventops, text


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, 1.0) for i, (m, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_requires_step_order(spark):
    # u1 completes view->click; u2 clicks BEFORE viewing (must not count);
    # u3 only views.
    ev = _events(
        spark,
        [
            (0, 1, "view"), (5, 1, "click"),
            (0, 2, "click"), (5, 2, "view"),
            (0, 3, "view"),
        ],
    )
    row = eventops.funnel(ev, ["view", "click"]).first()
    assert row["step1_view_users"] == 3
    assert row["step2_click_users"] == 1


def test_funnel_strictly_after_min_time(spark):
    # u1's only click is simultaneous with the first view -> excluded
    # (strict >); a later view must NOT resurrect it (min-time semantics).
    ev = _events(spark, [(0, 1, "view"), (0, 1, "click"), (9, 1, "view")])
    row = eventops.funnel(ev, ["view", "click"]).first()
    assert row["step2_click_users"] == 0


def test_retention_cohorts_offsets(spark):
    # u1 active week 0 and week 2; u2 only week 1.
    ev = _events(
        spark,
        [(0, 1, "view"), (60 * 24 * 15, 1, "view"), (60 * 24 * 8, 2, "view")],
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in eventops.retention_cohorts(ev, "2024-01-01").collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_hourly_spine_fill_zero_rows(spark):
    # Two events 3 hours apart for type A, one for B -> spine is 4 hours ×
    # 2 types = 8 rows, empties zero-filled.
    ev = _events(spark, [(0, 1, "A"), (180, 1, "A"), (60, 2, "B")])
    out = eventops.hourly_spine_fill(ev).collect()
    assert len(out) == 8
    counts = {(r["hour_ts"], r["key"]): r["n"] for r in out}
    assert counts[("2024-01-01 00:00:00", "A")] == 1
    assert counts[("2024-01-01 01:00:00", "A")] == 0
    assert counts[("2024-01-01 01:00:00", "B")] == 1
    assert sum(counts.values()) == 3


def test_top_bigrams_counts_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    rows = text.top_bigrams(docs, "text", k=10).collect()
    got = [(r["bigram"], r["n"]) for r in rows]
    # 'a b' ×3 ('a b a b' contributes twice), then alphabetical among n=1.
    assert got[0] == ("a b", 3)
    assert got[1:] == [("b a", 1), ("b c", 1)]


def test_tfidf_top_term_tiebreak(spark):
    # doc 1: 'zz' and 'aa' both tf=1 and df=1 -> equal scores; the
    # alphabetically first term must win deterministically.
    docs = spark.createDataFrame(
        [(1, "zz aa shared"), (2, "shared shared")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.tfidf_top_terms(docs, "text").collect()}
    assert rows[1]["term"] == "aa"
    assert rows[1]["score"] == pytest.approx(0.693147, abs=1e-6)
    # doc 2: only 'shared' (df=2, idf=0) -> score 0.0, not negative.
    assert rows[2]["term"] == "shared"
    assert rows[2]["score"] == 0.0


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        eventops.funnel(_events(spark, [(0, 1, "view")]), [])


def test_hll_sketch_within_error_bound(spark):
    """q48's sketches must estimate within HLL's ~2% envelope of the
    exact distinct counts, and the merged union must cover all users."""
    from conftest import SF_DIR
    from logverzcore_spark.suite import SUITE

    est = {r["event_type"]: r["est_users"] for r in SUITE["q48_hll_sketch_users"](spark, SF_DIR).collect()}
    from logverzcore_spark.engine import read_table

    ev = read_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    for k, e in exact.items():
        assert abs(est[k] - e) / e < 0.05, (k, est[k], e)


def test_audio_frame_features_exact(spark):
    """Known byte pattern → hand-computable RMS/peak per 4-byte frame,
    including the short tail frame."""
    from logverzcore_spark.operators.multimodal import audio_frame_features

    df = spark.createDataFrame([(1, bytearray([10, 10, 10, 10, 20, 20]))], "doc_id long, payload binary")
    rows = sorted(
        (r["doc_id"], r["frame_idx"], r["n_bytes"], r["rms"], r["peak"])
        for r in audio_frame_features(df, frame_bytes=4).collect()
    )
    assert rows == [(1, 0, 4, 10.0, 10), (1, 1, 2, 20.0, 20)]


def test_plan_frame_samples_fanout(spark):
    from logverzcore_spark.operators.multimodal import plan_frame_samples

    vids = spark.createDataFrame(
        [(1, 2500), (2, 999), (3, 0)], "doc_id long, duration_ms long"
    )
    rows = sorted(
        (r["doc_id"], r["sample_ms"], r["frame_idx"])
        for r in plan_frame_samples(vids, every_ms=1000, fps=30).collect()
    )
    # 2500ms -> samples at 0/1000/2000; sub-second and zero-length clips
    # still get the t=0 keyframe.
    assert rows == [
        (1, 0, 0), (1, 1000, 30), (1, 2000, 60),
        (2, 0, 0),
        (3, 0, 0),
    ]


# -- round-2b additions: hash split, contamination, argmax, sliding windows --


def test_hash_split_partitions_completely(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    split = docs.select(text.hash_split(F.col("doc_id")).alias("split"))
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    # md5 is uniform: train≈12/16, val≈2/16, test≈2/16.
    assert 0.65 <= counts["train"] / 1000 <= 0.85
    # Deterministic: a second evaluation assigns identically.
    again = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == counts


def test_contamination_check_hits_and_misses(spark):
    from logverzcore_spark.operators.dedup import contamination_check

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # shares the 5-gram "beta gamma delta epsilon zeta"
            (1, "xx beta gamma delta epsilon zeta yy"),
            # no shared 5-gram (word soup reordered)
            (2, "zeta epsilon delta gamma beta alpha"),
            # too short for any 5-gram
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_shared_grams"] for r in contamination_check(train, bench, n=5).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits
    assert 3 not in hits


def test_argmax_packed_equals_window(spark):
    from logverzcore_spark.suite import SUITE

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["o_custkey"]: (r["latest_orderkey"], r["n_orders"])
        for r in SUITE["q50_latest_order_argmax"](spark, sf_dir).collect()
    }
    from pyspark.sql import Window

    from logverzcore_spark.engine import read_table

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ref = (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("o_custkey")))
        .where(F.col("rn") == 1)
    )
    want = {r["o_custkey"]: (r["o_orderkey"], r["n"]) for r in ref.collect()}
    assert got == want


def test_sliding_windows_equal_batch(spark):
    from logverzcore_spark.engine import read_table
    from logverzcore_spark.streaming.collect_stream import run_sliding_windows

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["window_start"]: (r["n"], round(r["total_value"], 2))
        for r in run_sliding_windows(spark, f"{sf_dir}/events.parquet").collect()
    }
    ev = read_table(spark, sf_dir, "events")
    batch = (
        ev.select(F.explode(F.array(F.lit(0), F.lit(1))).alias("k"), "ts", "value")
        .select(
            F.date_format(
                (F.unix_timestamp("ts") - (F.unix_timestamp("ts") % 900) - F.col("k") * 900)
                .cast("timestamp"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "value",
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    want = {r["window_start"]: (r["n"], round(r["total_value"], 2)) for r in batch.collect()}
    assert got == want


def test_decode_batch_plan_respects_budget(spark):
    from logverzcore_spark.operators.multimodal import plan_decode_batches

    rows = [(i, "s", 300 + (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_bytes long")
    plan = plan_decode_batches(
        df, bytes_col="n_bytes", budget_bytes=2000, part_col="source", id_col="doc_id"
    )
    got = plan.orderBy("doc_id").collect()
    # Batch ids are contiguous non-decreasing within the partition.
    ids = [r["batch_id"] for r in got]
    assert ids[0] == 0 and all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))
    # Every batch holds <= budget + one straddling item (drop the last
    # item of each batch and the remainder must fit the budget).
    from collections import defaultdict

    sizes = defaultdict(list)
    for r in got:
        sizes[r["batch_id"]].append(r["n_bytes"])
    for members in sizes.values():
        assert sum(members[:-1]) <= 2000


def test_dedup_segments_cross_doc(spark):
    """Two docs sharing one exact 10-token segment: that segment (and
    only it) is flagged in both docs; a <10-token doc yields zero
    segments but stays in the output with its token count intact."""
    from logverzcore_spark.operators.text import dedup_segments

    shared = "a b c d e f g h i j"
    rows = [
        (1, shared + " k l m n o p q r s t"),  # seg0 shared, seg1 unique
        (2, shared + " z y x w v u t s r q"),  # seg0 shared, seg1 unique
        (3, "tiny doc"),                        # no full segment
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_segments(df, seg_tokens=10).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_dup_segments"] == 1
    assert out[1]["dup_segment_frac"] == 0.5
    assert out[1]["n_tokens_clean"] == 10  # 20 tokens - one 10-token segment
    assert out[2]["n_dup_segments"] == 1
    assert out[3]["n_segments"] == 0 and out[3]["n_dup_segments"] == 0
    assert out[3]["n_tokens"] == 2 and out[3]["n_tokens_clean"] == 2


def test_pii_scrub_order_and_exclusivity(spark):
    """The category chain must be sequentially exclusive in order: a
    dotted quad counts as ip (never also phone), an SSN-shaped id as
    ssn (never phone), an email's host dots never become an ip; counts
    match what redaction removed and the clean text holds no residual
    pattern."""
    rows = [
        (1, "mail bob.smith@corp.example.org now"),
        (2, "server at 10.20.30.40 port open"),
        (3, "ssn 987-65-4320 on file"),
        (4, "call 415-555-0173 today"),
        (5, "multi a@b.io 1.2.3.4 123-45-6789 415-555-0173"),
        (6, "clean text no pii at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 0, 0)
    assert "[EMAIL]" in out[1]["clean"] and "@" not in out[1]["clean"]
    assert (out[2]["n_ip"], out[2]["n_phone"]) == (1, 0)  # quad != phone
    assert (out[3]["n_ssn"], out[3]["n_phone"]) == (1, 0)  # ssn != phone
    assert out[4]["n_phone"] == 1 and "[PHONE]" in out[4]["clean"]
    assert out[5]["n_pii"] == 4 and out[5]["clean"].count("[") == 4
    assert out[6]["n_pii"] == 0 and out[6]["clean"] == rows[5][1]


def test_chunk_documents_windows_and_edges(spark):
    """Window arithmetic: a short doc yields one whole chunk; an exact
    multiple partitions cleanly at stride == size; overlap repeats the
    boundary tokens; every token appears in some chunk (stride <= size
    guarantees no gaps); invalid stride/size raise."""
    import pytest as _pt

    docs = spark.createDataFrame(
        [
            (1, "a b c"),                        # 3 tokens < size
            (2, " ".join(f"t{i}" for i in range(8))),   # exact 2x size 4
            (3, " ".join(f"w{i}" for i in range(10))),  # ragged tail
        ],
        ["doc_id", "text"],
    )
    out = text.chunk_documents(docs, size=4, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    one = by_doc[1]
    assert len(one) == 1 and one[0]["chunk_text"] == "a b c" and one[0]["n_tokens"] == 3
    # doc 2: n=8, size=4, stride=2 -> ceil((8-4)/2)+1 = 3 chunks
    two = sorted(by_doc[2], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in two] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7"
    ]
    # doc 3: n=10 -> 4 chunks, last ragged (10 - 3*2 = 4 tokens? no:
    # ceil((10-4)/2)+1 = 4; last starts at 6, holds w6..w9 (4 tokens))
    three = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert len(three) == 4 and three[-1]["chunk_text"] == "w6 w7 w8 w9"
    # coverage: every token of doc 3 appears in some chunk
    seen = set()
    for r in three:
        seen.update(r["chunk_text"].split())
    assert seen == {f"w{i}" for i in range(10)}
    # stride == size partitions with no overlap
    part = text.chunk_documents(docs.where(F.col("doc_id") == 2), size=4).collect()
    assert [r["chunk_text"] for r in sorted(part, key=lambda r: r["chunk_id"])] == [
        "t0 t1 t2 t3", "t4 t5 t6 t7"
    ]
    with _pt.raises(ValueError, match="drop tokens"):
        text.chunk_documents(docs, size=4, stride=5)
    with _pt.raises(ValueError, match=">= 1"):
        text.chunk_documents(docs, size=0)


def test_pii_redaction_idempotent_batch(spark):
    """redact(redact(x)) == redact(x) over a randomized batch: the
    replacement tokens ([EMAIL] etc.) match no pattern themselves, so a
    double scrub must be a fixed point — the property that makes
    re-running an export pipeline safe. Deterministic LCG inputs (no
    runtime RNG), one Spark job for the whole batch."""
    state = 0x9E3779B9
    frags = [
        "plain words here", "x@y.zz", "10.0.0.1", "999-88-7777",
        "800-555-0100", "a.b@c.dd more", "1.2.3.4.5", "12-34-56",
    ]
    rows = []
    for i in range(64):
        parts = []
        for _ in range(4):
            state = (state * 1103515245 + 12345) % (1 << 31)
            parts.append(frags[state % len(frags)])
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = df.select("doc_id", text.redact_pii(F.col("text")).alias("t"))
    twice = once.select("doc_id", text.redact_pii(F.col("t")).alias("t"))
    diff = (
        once.alias("a")
        .join(twice.alias("b"), "doc_id")
        .where(F.col("a.t") != F.col("b.t"))
    )
    assert diff.count() == 0


def test_chunk_documents_window_algebra_batch(spark):
    """Window-count formula + full coverage over a grid of (n, size,
    stride) shapes in ONE Spark job: chunk count == 1 if n<=size else
    ceil((n-size)/stride)+1; every chunk except the last has exactly
    `size` tokens; concatenating chunks at stride==size reproduces the
    document."""
    import math

    shapes = [
        (n, size, stride)
        for n in (1, 3, 7, 16, 31, 64)
        for size, stride in ((4, 4), (4, 2), (8, 3), (16, 16), (5, 1))
    ]
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)))
        for i, (n, _, _) in enumerate(shapes)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for size, stride in sorted({(s, t) for _, s, t in shapes}):
        out = text.chunk_documents(df, size=size, stride=stride).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, (n, _, _) in enumerate(shapes):
            chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
            expect = 1 if n <= size else math.ceil((n - size) / stride) + 1
            assert len(chunks) == expect, (n, size, stride)
            for c in chunks[:-1]:
                assert c["n_tokens"] == size
            covered = set()
            for c in chunks:
                covered.update(c["chunk_text"].split())
            assert covered == {f"w{j}" for j in range(n)}, (n, size, stride)


def test_strip_html_chain_semantics(spark):
    """strip_html (r6): script/style bodies vanish entirely (including
    raw '<' inside them), comments vanish, tags become whitespace,
    the entity set decodes with &amp; LAST (no double decode), plain
    text passes through, NULLs stay NULL."""
    from logverzcore_spark.operators.text import strip_html

    rows = [
        (1, '<p>a</p><script>if(x<2){}</script><style>p{}</style>b'),
        (2, '&amp;lt; stays &lt; once'),
        (3, 'plain text'),
        (4, '<div class="x">nested <b>bold</b> text</div>'),
        (5, 'q&quot;s &#39;t&#39; &nbsp;sp'),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean"] for r in strip_html(df).collect()}
    assert out[1] == "a b"
    assert out[2] == "&lt; stays < once"
    assert out[3] == "plain text"
    assert out[4] == "nested bold text"
    assert out[5] == "q\"s 't' sp"
    assert out[6] is None
    import pytest

    with pytest.raises(ValueError, match="missing column"):
        strip_html(df, text_col="nope")


def test_dedupe_lines_first_occurrence_order(spark):
    """dedupe_lines (r6): first occurrence of every line survives in
    original order (including a single kept blank line); single-line
    and NULL docs pass through; counts are exact."""
    from logverzcore_spark.operators.text import dedupe_lines

    rows = [
        (1, "a\nb\na\n\nb\nc"),
        (2, "only line"),
        (3, None),
        (4, "x\nx\nx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedupe_lines(df).collect()}
    assert out[1]["clean"] == "a\nb\n\nc"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (6, 4)
    assert out[2]["clean"] == "only line" and out[2]["n_kept"] == 1
    assert out[3]["clean"] is None
    assert out[4]["clean"] == "x" and out[4]["n_lines"] == 3
    import pytest

    with pytest.raises(ValueError, match="missing column"):
        dedupe_lines(df, text_col="nope")


def test_scd2_history_semantics(spark):
    """Consecutive re-assertions collapse; intervals are half-open and
    chain exactly; NULL-attr opening version survives; single window
    sort (one exchange) in the plan."""
    from logverzcore_spark.operators import eventops

    rows = [
        (1, 100, "a"), (2, 100, "a"),   # re-assertion -> no new version
        (3, 100, "b"), (4, 100, None),  # change, change-to-null
        (5, 100, None),                 # null re-assertion -> collapse
        (6, 200, None),                 # opening version IS null
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, state string")
    out = eventops.scd2_history(
        df.withColumn("ts", F.col("event_id").cast("timestamp")),
        key_col="user_id", ts_col="ts", attr_cols=["state"], tie_col="event_id",
    )
    got = {(r["user_id"], r["version"]): r for r in out.collect()}
    assert len(got) == 4  # 3 versions for user 100, 1 for user 200
    v1, v2, v3 = got[(100, 1)], got[(100, 2)], got[(100, 3)]
    assert (v1["state"], v2["state"], v3["state"]) == ("a", "b", None)
    assert v1["valid_to"] == v2["valid_from"] and v2["valid_to"] == v3["valid_from"]
    assert v3["valid_to"] is None and v3["is_current"]
    assert not v1["is_current"] and not v2["is_current"]
    assert got[(200, 1)]["state"] is None and got[(200, 1)]["is_current"]
    import re
    fmt = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    ).split("== Initial Plan ==")[0]  # post-execution AQE repeats the tree
    assert len(re.findall(r"Exchange \(\d+\)", fmt)) == 1


def test_segment_sentences_semantics(spark):
    """Terminator runs close a sentence; trailing fragment kept;
    terminator-only/empty docs contribute zero rows; counts match the
    trimmed sentence."""
    from logverzcore_spark.operators.text import segment_sentences

    rows = [(1, "One two. Three!  Four five six"), (2, "..."), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = segment_sentences(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc and 3 not in by_doc
    s = sorted(by_doc[1], key=lambda r: r["sent_idx"])
    assert [r["sentence"] for r in s] == ["One two.", "Three!", "Four five six"]
    assert [r["n_tokens"] for r in s] == [2, 1, 3]
    assert s[0]["n_chars"] == len("One two.")


def test_hashed_embedding_bridges_to_ann(spark):
    """The hashing-trick vectors plug straight into the similarity
    family: near-identical docs land closer (cosine) than unrelated
    docs; components are exact token counts (sum == token count)."""
    from logverzcore_spark.operators import similarity
    from logverzcore_spark.operators.text import hashed_embedding

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # 7/8 shared
        (3, "one two three four five six seven eight"),        # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_embedding(df, dim=32).withColumnRenamed("doc_id", "vec_id")
    top = similarity.cosine_topk(emb, emb.where("vec_id = 1"), k=2)
    got = [r["neighbor_id"] for r in top.orderBy("rank").collect()]
    assert got[0] == 2  # near-duplicate ranks first
    sums = {r["vec_id"]: r["s"] for r in
            emb.select("vec_id", F.aggregate("embedding", F.lit(0.0),
                                             lambda a, x: a + x).alias("s")).collect()}
    assert sums == {1: 8.0, 2: 8.0, 3: 8.0}


def test_time_weighted_avg_gauge_semantics(spark):
    """Hand-checkable: value 10 held for 3s then 40 for 1s -> TWA 17.5;
    the last observation carries no interval; single-observation keys
    drop out entirely."""
    from logverzcore_spark.operators.eventops import time_weighted_avg

    rows = [
        (1, 100, 0, 10.0), (2, 100, 3, 40.0), (3, 100, 4, 99.0),
        (4, 200, 0, 7.0),  # single obs -> no interval -> no row
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, value double"
    ).withColumn("ts", F.col("sec").cast("timestamp"))
    out = {r["user_id"]: r for r in
           time_weighted_avg(df, tie_col="event_id").collect()}
    assert 200 not in out
    assert out[100]["n_intervals"] == 2
    assert out[100]["total_ms"] == 4000
    assert out[100]["twa"] == (10.0 * 3000 + 40.0 * 1000) / 4000


def _brute_frontier(pts):
    """O(n^2) strict-dominance reference for pareto_frontier_2d."""
    out = {}
    for i, (x, y) in enumerate(pts):
        if any(
            qx <= x and qy >= y and (qx < x or qy > y) for (qx, qy) in pts
        ):
            continue
        key = (x, y)
        n, mid = out.get(key, (0, i))
        out[key] = (n + 1, min(mid, i))
    return {(x, y, n, mid) for (x, y), (n, mid) in out.items()}


def test_pareto_frontier_matches_bruteforce_and_slice_invariant(spark):
    """pareto_frontier_2d == the quadratic dominance scan on adversarial
    data (duplicate frontier points, same-x ties, same-y ties, a strictly
    dominated diagonal), and the answer is invariant to the slice count —
    1 slice (single prefix scan) vs 7 (offset fold engaged)."""
    import random

    rng = random.Random(42)
    pts = [(rng.randint(0, 50) * 1.0, rng.randint(0, 50)) for _ in range(300)]
    pts += [(5.0, 40), (5.0, 40), (5.0, 39), (6.0, 40)]  # dup + dominated ties
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, x double, y long")
    want = _brute_frontier(pts)
    for n_ranges in (1, 7):
        got = {
            (r["x"], r["y"], r["n_points"], r["min_id"])
            for r in eventops.pareto_frontier_2d(
                df, "x", "y", id_col="pid", n_ranges=n_ranges
            ).collect()
        }
        assert got == want, f"n_ranges={n_ranges}"


def test_pareto_frontier_edges(spark):
    """Single point; all-identical points collapse to one counted row."""
    one = spark.createDataFrame([(1, 2.0, 3)], "pid long, x double, y long")
    assert eventops.pareto_frontier_2d(one, "x", "y", id_col="pid").collect() == [
        (2.0, 3, 1, 1)
    ]
    same = spark.createDataFrame(
        [(i, 1.0, 1) for i in range(5)], "pid long, x double, y long"
    )
    r = eventops.pareto_frontier_2d(same, "x", "y", id_col="pid").collect()
    assert len(r) == 1 and r[0]["n_points"] == 5 and r[0]["min_id"] == 0


def test_pagerank_fixed_point_hand_values(spark):
    """Hand-checkable graphs: a 2-cycle is a fixed point (every node
    keeps exactly `scale`); a 3-leaf star (leaves -> hub, hub -> leaf0)
    gives the hub 150000 + 85% of three full leaf scores after round 1;
    total mass never exceeds n_nodes * scale (truncation only leaks
    downward)."""
    from logverzcore_spark.operators import graph

    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["node"]: r["score"] for r in graph.pagerank_fixed_point(cyc, 5).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000}

    star = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (1, 10)], "src long, dst long"
    )
    r1 = {r["node"]: r["score"] for r in graph.pagerank_fixed_point(star, 1).collect()}
    # hub: base + 85% of 3 leaf contributions (each leaf sends its whole
    # score, outdeg 1): 150000 + 85*3000000//100 = 2700000
    assert r1[1] == 150_000 + (85 * 3_000_000) // 100
    # leaf 10 gets the hub's whole score; leaves 11/12 get base only.
    assert r1[10] == 150_000 + (85 * 1_000_000) // 100
    assert r1[11] == r1[12] == 150_000
    r5 = graph.pagerank_fixed_point(star, 5)
    total = r5.agg(F.sum("score")).first()[0]
    assert total <= 4 * 1_000_000
    ranks = {r["node"]: r["score"] for r in r5.collect()}
    assert ranks[1] == max(ranks.values())  # the hub stays the hub


def test_token_diversity_hand_values(spark):
    """Hand-checkable diversity: all-same tokens -> simpson 1 / dominance
    1 / hapax 0; all-distinct -> simpson 0 / hapax 1; single token ->
    simpson NULL (needs two draws) but dominance 1; empty -> NULLs with
    n_types 0; case-folded types ('A a' is one type)."""
    rows = [
        (1, "a a a a"), (2, "a b c d"), (3, "a"), (4, ""), (5, "A a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", text.token_diversity(F.col("text")).alias("d")
        ).select("doc_id", "d.*").collect()
    }
    assert out[1]["simpson"] == 1.0 and out[1]["dominance"] == 1.0
    assert out[1]["hapax_frac"] == 0.0 and out[1]["n_types"] == 1
    assert out[2]["simpson"] == 0.0 and out[2]["dominance"] == 0.25
    assert out[2]["hapax_frac"] == 1.0
    assert out[3]["simpson"] is None and out[3]["dominance"] == 1.0
    assert out[4]["simpson"] is None and out[4]["n_types"] == 0
    assert out[5]["n_types"] == 2 and out[5]["dominance"] == round(2 / 3, 6)


def test_script_profile_hand_values(spark):
    """Known composition: 'ab ж中 12' -> 2 latin, 1 cyrillic, 1 cjk,
    2 digits, 6 non-space chars; all-space text -> NULL ratios."""
    df = spark.createDataFrame(
        [(1, "ab ж中 12"), (2, "   ")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", text.script_profile(F.col("text")).alias("s")
        ).select("doc_id", "s.*").collect()
    }
    r = out[1]
    assert (r["n_latin"], r["n_cyrillic"], r["n_cjk"], r["n_digit"]) == (2, 1, 1, 2)
    assert r["n_nonspace"] == 6 and r["latin_ratio"] == round(2 / 6, 4)
    assert out[2]["n_nonspace"] == 0 and out[2]["latin_ratio"] is None


def test_readability_hand_values(spark):
    """'Hello world. It is fun!' = 5 words, 2 sentence runs, 6 vowel
    groups -> Flesch ease 206.835 - 1.015*2.5 - 84.6*1.2 = 102.7775,
    FK grade -0.455; empty text -> NULL scores with sentence floor 1."""
    df = spark.createDataFrame(
        [(1, "Hello world. It is fun!"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", text.readability(F.col("text")).alias("r"))
        .select("doc_id", "r.*").collect()
    }
    r = out[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 6)
    assert r["flesch_ease"] == 102.7775 and r["fk_grade"] == -0.455
    assert out[2]["n_sentences"] == 1 and out[2]["flesch_ease"] is None


def test_bm25_topk_hand_values(spark):
    """BM25 on a 4-doc corpus: the query doc retrieves itself first;
    a rare query term outranks a ubiquitous one (idf ordering); scores
    replay the documented rational fixed-point formula exactly."""
    from logverzcore_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (0, "zebra zebra apple"),
            (1, "apple banana banana"),
            (2, "banana cherry cherry"),
            (3, "cherry apple banana"),
        ],
        "doc_id long, text string",
    )
    qt = spark.createDataFrame(
        [(0, "zebra"), (0, "apple")], "query_id long, term string"
    )
    out = T.bm25_topk(docs, qt, k=4).orderBy("rank").collect()
    assert [r.doc_id for r in out][0] == 0  # only doc with 'zebra' wins

    # Replay the fixed-point math in Python for doc 0.
    N, L = 4, 12
    adm = (1000 * L) // N  # 3000
    def idf(df_):
        return (100_000 * (2 * N - 2 * df_ + 1)) // (2 * df_ + 1)
    def tfpart(tf, dl):
        return (1000 * 22 * tf * adm) // (10 * tf * adm + 3 * adm + 9000 * dl)
    want = idf(1) * tfpart(2, 3) + idf(3) * tfpart(1, 3)
    assert out[0].score == want

    # Every doc containing any query term is scored (docs 0,1,2,3 all
    # contain apple or zebra except doc 2 — which has neither).
    assert {r.doc_id for r in out} == {0, 1, 3}


def test_bm25_topk_rare_term_dominates(spark):
    """Two docs with equal length: the one matching the RARE query term
    scores above the one matching the common term."""
    from logverzcore_spark.operators import text as T

    rows = [(i, "common filler words here") for i in range(8)]
    rows.append((8, "rare filler words here"))
    rows.append((9, "common filler words here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qt = spark.createDataFrame(
        [(0, "rare"), (0, "common")], "query_id long, term string"
    )
    out = T.bm25_topk(docs, qt, k=1).collect()
    assert out[0].doc_id == 8


def test_normalize_url_hand_values(spark):
    from logverzcore_spark.operators import text as T

    rows = [
        (0, "HTTPS://User:Pw@WWW.Example.CO.UK:443//a//b/?b=2&utm_source=x&a=1#frag"),
        (1, "http://localhost:8080"),
        (2, "not a url at all"),
        (3, "http://sub.deep.example.com/x/?gclid=1&utm_campaign=z"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r.id: r.u for r in df.select("id", T.normalize_url(F.col("url")).alias("u")).collect()}

    u0 = out[0]
    assert u0.scheme == "https" and u0.host == "www.example.co.uk"
    assert u0.domain == "example.co.uk"
    assert u0.path == "/a/b" and u0.query_canon == "a=1&b=2"
    assert u0.url_canon == "https://www.example.co.uk/a/b?a=1&b=2"

    u1 = out[1]
    assert u1.host == "localhost" and u1.domain == "" and u1.path == "/"
    assert u1.url_canon == "http://localhost/"

    assert out[2].scheme == "" and out[2].url_canon is None

    u3 = out[3]
    assert u3.domain == "example.com" and u3.query_canon == ""
    assert u3.url_canon == "http://sub.deep.example.com/x"


def test_triangle_count_hand_graph(spark):
    """K4 on {1,2,3,4} (each vertex in C(3,2)=3 triangles) plus a
    5-leaf star at 10 (no triangles) plus a dangling edge; input
    carries duplicates, reversed directions, and a self-loop."""
    from logverzcore_spark.operators import graph

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = (
        k4
        + [(b, a) for a, b in k4]          # reversed duplicates
        + [(10, 20 + i) for i in range(5)]  # star: no triangles
        + [(7, 7), (1, 2), (100, 101)]      # self-loop, dup, dangle
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.triangles for r in graph.triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_bpe_train_hand_corpus(spark):
    """The classic Sennrich corpus shape: 'low'-family words merge l+o
    first (weighted by word FREQUENCY, not document count), and an
    overlapping run collapses leftmost-first."""
    from logverzcore_spark.operators import text as T

    df = spark.createDataFrame(
        [(0, "low low low lower lowest"), (1, "new newer newest low")],
        "doc_id long, text string",
    )
    out = [(r.it, r.left_sym, r.right_sym, r.pair_n)
           for r in T.bpe_train(df, n_merges=3).orderBy("it").collect()]
    # 'l o' appears in low(4) lower lowest = 6; then 'lo w' = 6; then
    # 'low </w>' = 4 standalone lows.
    assert out == [(1, "l", "o", 6), (2, "lo", "w", 6), (3, "low", "</w>", 4)]

    # overlap greediness: 'aaaa' with merge (a,a) folds to [aa, aa]
    df2 = spark.createDataFrame([(0, "aaaa aaaa ab")], "doc_id long, text string")
    m = T.bpe_train(df2, n_merges=2).orderBy("it").collect()
    assert (m[0].left_sym, m[0].right_sym, m[0].pair_n) == ("a", "a", 6)
    # round 2 counts pairs over [aa, aa, </w>] x2 and [a, b, </w>]:
    # (aa,aa)=2, (aa,</w>)=2, (a,b)=1, (b,</w>)=1 -> tie broken lex:
    # ('aa','</w>') < ('aa','aa')
    assert (m[1].left_sym, m[1].right_sym, m[1].pair_n) == ("aa", "</w>", 2)


def test_bpe_segment_counts(spark):
    """After 3 merges on the low-corpus, 'low' is one token (+</w> fold
    into it): doc token counts reflect the learned vocab; an empty
    merge table degrades to chars+marker per word."""
    from logverzcore_spark.operators import text as T

    df = spark.createDataFrame(
        [(0, "low low low lower lowest"), (1, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = T.bpe_train(df, n_merges=3)
    out = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in T.bpe_segment(df, merges).collect()}
    # merges: l+o, lo+w, low+</w> -> 'low' = ['low</w>'] 1 token;
    # 'lower' = ['low','e','r','</w>'] 4; 'lowest' = 5
    assert out[0] == (5, 3 * 1 + 4 + 5)
    # 'new' = n,e,w,</w> 4; 'newer' 6; 'newest' 7; 'low' 1
    assert out[1] == (4, 4 + 6 + 7 + 1)


def test_extract_links_hand_values(spark):
    from logverzcore_spark.operators import text as T

    html = (
        "<p><a href=\"http://a.com/x\">1</a>"
        "<a href='https://b.org/'>2</a>"
        "<a href='/relative'>3</a>"
        "<img src=\"http://c.com/i.png\"><a href=\"\">empty</a></p>"
    )
    df = spark.createDataFrame([(0, html)], "id long, h string")
    (links,) = df.select(T.extract_links(F.col("h")).alias("l")).first()
    assert links == ["http://a.com/x", "https://b.org/", "/relative", ""]


def test_robots_rules_and_gate(spark):
    """Stateful grouping (consecutive User-agent lines share directives;
    a User-agent after a directive starts a NEW group), comments,
    unknown directives, longest-prefix + allow-wins-tie, own-group
    preemption, and the no-rules default."""
    from logverzcore_spark.operators import text as T

    txt = (
        "# policy\n"
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "Crawl-delay: 5\n"
        "User-agent: GPTBot\n"
        "User-agent: CCBot\n"
        "Disallow: /\n"
    )
    df = spark.createDataFrame([(0, txt)], "id long, robots string")
    rules = df.select(T.robots_rules(F.col("robots")).alias("r"))
    got = [tuple(x) for x in rules.first().r]
    assert got == [
        ("*", False, "/a"), ("*", True, "/a/b"),
        ("gptbot", False, "/"), ("ccbot", False, "/"),
    ]

    def ask(agent, path):
        return rules.select(
            T.robots_allowed(F.col("r"), F.lit(agent), F.lit(path))
        ).first()[0]

    assert ask("GPTBot", "/anything") is False      # own group preempts
    assert ask("ccbot", "/a/b") is False            # own group: no allow rule
    assert ask("bingbot", "/a/b/c") is True         # * group, allow longer
    assert ask("bingbot", "/a/x") is False
    assert ask("bingbot", "/zzz") is True           # no match -> allowed

    empty = spark.createDataFrame([(0, "")], "id long, robots string").select(
        T.robots_rules(F.col("robots")).alias("r")
    )
    assert empty.select(
        T.robots_allowed(F.col("r"), F.lit("x"), F.lit("/p"))
    ).first()[0] is True


def test_vocab_coverage_hand_values(spark):
    from logverzcore_spark.operators import text as T

    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b rare words here")],
        "doc_id long, text string",
    )
    # vocab_size=2 -> {a, b} (counts 4, 3); c/rare/words/here are OOV
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_bp)
           for r in T.vocab_coverage(df, vocab_size=2).collect()}
    assert got[0] == (6, 1, 1666)
    assert got[1] == (5, 3, 6000)


def test_bm25_index_matches_inline_and_zero_exchange(spark):
    """The persisted-index probe ranks identically to the inline path,
    and the bucketed postings give the per-term df aggregation a plan
    with NO Exchange on the corpus side."""
    import uuid

    from logverzcore_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{'%d' % (i % 7)} delta word{'%d' % i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    qt = spark.createDataFrame(
        [(0, "alpha"), (0, "gamma3"), (1, "delta"), (1, "word5")],
        "query_id long, term string",
    )
    table = f"bm25_t_{uuid.uuid4().hex[:8]}"
    try:
        T.bm25_index_build(docs, table, n_buckets=4)
        via_index = T.bm25_index_topk(spark, table, qt, k=5)
        inline = T.bm25_topk(docs, qt, k=5)
        assert sorted(map(tuple, via_index.collect())) == sorted(
            map(tuple, inline.collect())
        )
        dfreq_plan = (
            spark.table(table)
            .groupBy("term")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in dfreq_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_stats")


def test_assemble_sft_samples_spans(spark):
    """Spans cover exactly the assistant CONTENT: slicing the rendered
    text by each span reproduces the original assistant messages."""
    from logverzcore_spark.operators import text as T

    msgs = [
        (1, 0, "system", "be brief"),
        (1, 1, "user", "hi"),
        (1, 2, "assistant", "hello!"),
        (1, 3, "user", "bye"),
        (1, 4, "assistant", "ciao"),
        (2, 0, "user", "solo"),
    ]
    df = spark.createDataFrame(
        msgs, "sample_id long, turn_idx int, role string, content string"
    )
    got = {r.sample_id: r for r in T.assemble_sft_samples(df).collect()}
    s1 = got[1]
    assert s1.n_turns == 5 and s1.total_chars == len(s1.text)
    recovered = [
        s1.text[int(a):int(b)]
        for a, b in (sp.split("-") for sp in s1.target_spans.split(";"))
    ]
    assert recovered == ["hello!", "ciao"]
    assert got[2].target_spans == "" and got[2].n_turns == 1
    assert got[2].text == "<|user|>solo<|end|>"


def test_pack_sft_stream_span_shift(spark):
    """Concatenating samples in pack order and slicing by the SHIFTED
    spans recovers exactly the assistant contents — the loader-side
    invariant the operator exists for."""
    from logverzcore_spark.operators import text as T

    msgs = []
    for s in range(6):
        msgs += [
            (s, 0, "user", f"question {s}"),
            (s, 1, "assistant", f"answer number {s}"),
        ]
    mdf = spark.createDataFrame(
        msgs, "sample_id long, turn_idx int, role string, content string"
    )
    samples = T.assemble_sft_samples(mdf)
    packed = T.pack_sft_stream(samples, max_chars=64, n_shards=2)
    j = samples.join(packed, "sample_id").collect()
    streams = {}
    for r in sorted(j, key=lambda r: (r.shard, r.start_char)):
        assert streams.get(r.shard, 0) == r.start_char  # contiguous
        streams[r.shard] = r.start_char + r.total_chars
    stream_text = {}
    for r in sorted(j, key=lambda r: (r.shard, r.start_char)):
        stream_text[r.shard] = stream_text.get(r.shard, "") + r.text
    for r in j:
        for sp in r.shifted_spans.split(";"):
            a, b = map(int, sp.split("-"))
            assert stream_text[r.shard][a:b] == f"answer number {r.sample_id}"
