"""Scale-operator properties: sessionization invariants and ANN recall."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from sortify_spark.all_queries import REGISTRY
from tests.conftest import SF_DIR


def test_sessions_cover_all_events(spark):
    """Session event counts must sum to the filtered event count and
    session indexes per user must be 1..n without holes."""
    from sortify_spark.tables import load_table

    sessions = REGISTRY["user_sessions"].fn(spark, SF_DIR)
    events = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < 40)
    assert (
        sessions.agg(F.sum("n_events")).first()[0] == events.count()
    )
    per_user = sessions.groupBy("user_id").agg(
        F.max("session_idx").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    assert per_user.filter(F.col("mx") != F.col("n")).count() == 0
    assert sessions.filter(F.col("duration_us") < 0).count() == 0


def test_knn_lsh_recall_vs_exact(spark):
    """LSH top-10 must recover most of the exact L2 top-10."""
    from sortify_spark.tables import load_table
    from pyspark.ml.functions import array_to_vector

    from sortify_spark.queries_scale import knn_lsh_mllib

    lsh_ids = {
        r["vec_id"] for r in knn_lsh_mllib(spark, SF_DIR).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings")
    dim = len(emb.first()["embedding"])
    key = F.array(*[F.lit(0.1)] * dim).cast("array<double>")
    exact = (
        emb.select(
            "vec_id",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        key,
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    assert len(lsh_ids & exact_ids) >= 5, (lsh_ids, exact_ids)


def test_email_ingest_deterministic(spark):
    a = REGISTRY["email_ingest"].fn(spark, SF_DIR).collect()
    b = REGISTRY["email_ingest"].fn(spark, SF_DIR).collect()
    assert a == b
    assert len(a) == 3
    # fallback id for the message without a Message-ID
    assert any(r["_id"].startswith("email-") for r in a)
    # HTML stripped from bodies
    assert all("<" not in r["extracted_text"] for r in a)


def test_count_threshold_trigger(spark, tmp_path):
    """ST2: callback fires when the streamed doc count crosses N."""
    from sortify_spark.streaming.pipeline import count_threshold_trigger
    from sortify_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(25)
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.parquet(inp)
    fired = []
    q = count_threshold_trigger(spark, inp, ckpt, threshold=10, on_threshold=fired.append)
    q.awaitTermination(120)
    assert fired and fired[0] >= 10


def test_count_threshold_trigger_restart_safe(spark, tmp_path):
    """A restart over the same checkpoint must not re-count already
    committed batches (batch_id-keyed persisted counter)."""
    from sortify_spark.streaming.pipeline import count_threshold_trigger
    from sortify_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(8)
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.parquet(inp)
    fired = []
    q = count_threshold_trigger(spark, inp, ckpt, threshold=10, on_threshold=fired.append)
    q.awaitTermination(120)
    assert not fired  # 8 < 10, counter persisted at 8
    # restart: no new files — the drained source must not re-fire or
    # re-count; the persisted count survives
    q2 = count_threshold_trigger(spark, inp, ckpt, threshold=10, on_threshold=fired.append)
    q2.awaitTermination(120)
    assert not fired
    import json as _json

    state = _json.load(open(ckpt + "/counter_state.json"))
    assert state["count"] == 8


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Single-batch availableNow run must equal batch drop_exact_duplicates."""
    from sortify_spark.dedup import drop_exact_duplicates
    from sortify_spark.streaming.pipeline import streaming_exact_dedup
    from sortify_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    # inject exact duplicates with higher ids
    dupes = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    full = docs.unionByName(dupes)
    inp = str(tmp_path / "in")
    full.select("doc_id", "text", "lang", "source", "n_chars").write.parquet(inp)
    q = streaming_exact_dedup(
        spark, inp, str(tmp_path / "ckpt"), out_table="sded1"
    )
    q.awaitTermination(180)
    got = {
        (r["fp"], r["doc_id"])
        for r in spark.sql("SELECT * FROM sded1").collect()
    }
    want_ids = {r["doc_id"] for r in drop_exact_duplicates(full).collect()}
    assert {d for _, d in got} == want_ids
    assert len(got) == len(want_ids)


@pytest.mark.slow
def test_streaming_dedup_state_across_batches(spark, tmp_path):
    """With one file per trigger, a fingerprint seen in batch 1 must be
    suppressed in batch 2 — state outlives the microbatch."""
    from sortify_spark.streaming.pipeline import streaming_exact_dedup

    inp = str(tmp_path / "in")
    rows1 = [(1, "alpha beta gamma", "en", "s", 16)]
    rows2 = [(2, "alpha beta gamma", "en", "s", 16),
             (3, "totally new content", "en", "s", 19)]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    spark.createDataFrame(rows1, cols).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(rows2, cols).coalesce(1).write.mode("append").parquet(inp)
    q = streaming_exact_dedup(
        spark, inp, str(tmp_path / "ckpt"), out_table="sded2",
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT * FROM sded2").collect()
    )
    # doc 1 or 2 wins its fp depending on file order, but never both
    assert len(got) == 2 and 3 in got


def test_decontamination_flags_planted_overlap(spark):
    """A train doc sharing a 5-word run with a bench doc is flagged;
    disjoint docs are not."""
    from sortify_spark.dedup import contaminated_by_shingles

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps right out"),
            (2, "completely different words with no shared run at all"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    flagged = {
        r.id
        for r in contaminated_by_shingles(train, bench, shingle_k=5).collect()
    }
    assert flagged == {1}


def test_approx_percentiles_close_to_exact(spark):
    from sortify_spark.all_queries import REGISTRY
    from tests.conftest import SF_DIR

    exact = {
        r.event_type: r.p50
        for r in REGISTRY["latency_percentiles"].fn(spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.p50
        for r in REGISTRY["latency_percentiles_approx"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(exact[k] - approx[k]) <= max(0.05 * abs(exact[k]), 1e-6)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Streaming sessionization (stateful, event-time timeout) must equal
    the batch user_sessions windows: closed sessions emit with the batch,
    open sessions emit once the watermark passes last_event + gap."""
    from sortify_spark.streaming.pipeline import streaming_sessionize
    from sortify_spark.tables import load_table

    events = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 10)
        .select("event_id", "user_id", "ts")
    )
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    events.coalesce(1).write.parquet(inp)

    # Two sentinel far-future files: with one file per trigger, the
    # watermark advances after each in-run batch, so by the last batch it
    # has passed every real session's (last_event + gap) timeout and the
    # open sessions flush — all within ONE availableNow run.
    for days, eid in ((10, 999_998), (20, 999_999)):
        far = events.agg(F.max("ts").alias("m")).select(
            F.lit(eid).alias("event_id"),
            F.lit(9_999).alias("user_id"),
            (F.col("m") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
        )
        far.coalesce(1).write.mode("append").parquet(inp)

    q = streaming_sessionize(
        spark, inp, ckpt, gap_min=30, out_table="sess_out",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = (
        spark.sql("SELECT * FROM sess_out")
        .filter(F.col("user_id") < 10)
        .select("user_id", "n_events", "duration_us")
        .collect()
    )

    # batch reference: same gap rule via lag/running-sum windows
    from sortify_spark.queries_scale import q_user_sessions  # noqa: F401
    from sortify_spark.queries import REGISTRY

    want = (
        REGISTRY["user_sessions"]
        .fn(spark, SF_DIR)
        .filter(F.col("user_id") < 10)
        .select("user_id", "n_events", "duration_us")
        .collect()
    )
    key = lambda r: (r["user_id"], r["n_events"], r["duration_us"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))


def test_count_threshold_trigger_live_incremental(spark, tmp_path):
    """ST2 under a LIVE trigger: files fed while the query runs; the
    every-N callback fires only once the cumulative count crosses the
    threshold, across micro-batches (the reference's auto-recluster
    after N processed docs, document_tasks_service.py:448+)."""
    import os
    import time

    from sortify_spark.streaming.pipeline import count_threshold_trigger
    from sortify_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") < 10).select(*cols).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    fired = []
    q = count_threshold_trigger(
        spark, inp, ckpt, threshold=15, on_threshold=fired.append,
        available_now=False,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.exists(
            ckpt + "/counter_state.json"
        ):
            time.sleep(0.5)
        assert not fired  # 10 < 15 after the first batch
        docs.filter(
            (F.col("doc_id") >= 10) & (F.col("doc_id") < 20)
        ).select(*cols).coalesce(1).write.mode("append").parquet(inp)
        deadline = time.time() + 90
        while time.time() < deadline and not fired:
            time.sleep(0.5)
    finally:
        q.stop()
    assert fired and fired[0] >= 15  # crossed on the second batch


def test_semdedup_np_twin_matches(spark):
    """The Arrow/BLAS SemDeDup kernel must produce exactly the
    expression kernel's output (same blocks, same drop decisions, same
    survivor checksum) — the round-to-6 contract absorbs the ulp-level
    summation-order difference between BLAS and the sequential fold."""
    from sortify_spark.queries_curation2 import (
        semdedup_stats,
        semdedup_stats_np,
    )
    from sortify_spark.tables import load_table
    from tests.conftest import SF_DIR_MID

    emb = load_table(spark, SF_DIR_MID, "embeddings")
    a = [tuple(r) for r in semdedup_stats(emb).collect()]
    b = [tuple(r) for r in semdedup_stats_np(emb).collect()]
    assert a == b


def test_semdedup_np_twin_edge_blocks(spark):
    """Edge blocks: a zero vector (cosine guard → 0, never dropped at
    tau > 0), a singleton label (no pairs), and an exact-duplicate pair
    (cos 1.0 → later id dropped) — both kernels must agree exactly."""
    from sortify_spark.queries_curation2 import (
        semdedup_stats,
        semdedup_stats_np,
    )

    rows = [
        (1, 0, [0.0] * 4),          # zero vector
        (2, 0, [1.0, 0.0, 0.0, 0.0]),
        (3, 0, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 2 → dropped
        (4, 0, [0.0, 1.0, 0.0, 0.0]),   # orthogonal → kept
        (9, 7, [0.5, 0.5, 0.5, 0.5]),   # singleton block
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    a = [tuple(r) for r in semdedup_stats(emb).collect()]
    b = [tuple(r) for r in semdedup_stats_np(emb).collect()]
    assert a == b
    by_label = {r[0]: r for r in a}
    # label 0: 4 vecs, only vec 3 dropped (dup of 2)
    assert by_label[0][1:] == (4, 1, 3, 1 + 2 + 4)
    # label 7: singleton, nothing dropped
    assert by_label[7][1:] == (1, 0, 1, 9)


def test_sequence_packing_salted_conserves_tokens(spark):
    """The skew path (shards > 1) must conserve exactly the same token
    mass and doc count per source as the single-window shape, keep
    every sequence within budget except for straddle carryover, and pay
    at most `shards` extra tail sequences per source."""
    from sortify_spark.queries_curation2 import (
        PACK_BUDGET,
        pack_sequences,
    )
    from sortify_spark.tables import load_table
    from tests.conftest import SF_DIR_MID

    docs = load_table(spark, SF_DIR_MID, "documents")
    base = pack_sequences(docs).collect()
    salted = pack_sequences(docs, shards=4).collect()

    def tot(rows):
        out = {}
        for r in rows:
            d = out.setdefault(r["source"], [0, 0])
            d[0] += r["docs"]
            d[1] += r["tokens"]
        return out

    assert tot(base) == tot(salted)
    # sequence ids are namespaced per shard
    assert {r["seq_id"] // 1_000_000_000 for r in salted} == {0, 1, 2, 3}
    # every non-tail sequence starts below budget (a doc is assigned to
    # the sequence where it STARTS, so sums can straddle past budget by
    # less than one doc)
    max_doc = max(r["tokens"] / r["docs"] for r in salted)
    assert all(
        r["tokens"] < PACK_BUDGET + max_doc * r["docs"] for r in salted
    )
    # tail-sequence overhead bounded: shards × sources extra sequences
    n_sources = len({r["source"] for r in base})
    assert len(salted) <= len(base) + 4 * n_sources


def test_kmv_sketch_merges(spark):
    """KMV mergeability: shard the events 8 ways, take each shard's k
    smallest hashes, union the shards and re-take k — the merged sketch
    must be IDENTICAL to the sketch computed globally (the property
    that lets 1000 executors sketch independently and combine)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from sortify_spark.queries_curation2 import KMV_K
    from sortify_spark.tables import load_table
    from tests.conftest import SF_DIR_MID

    events = load_table(spark, SF_DIR_MID, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )
    hashes = events.select("event_type", h).distinct()

    def topk(df, extra_part=()):
        rn = F.row_number().over(
            W.partitionBy("event_type", *extra_part).orderBy(F.asc("h"))
        )
        return df.withColumn("rn", rn).filter(F.col("rn") <= KMV_K).drop(
            "rn"
        )

    global_sk = topk(hashes)
    sharded = hashes.withColumn(
        "shard", F.pmod(F.crc32(F.col("h").cast("string")), 8)
    )
    shard_sks = topk(sharded, ("shard",)).drop("shard").distinct()
    merged = topk(shard_sks)
    a = sorted(map(tuple, global_sk.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b and len(a) > 0
