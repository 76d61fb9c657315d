"""Streaming twins of the batch pipelines (SURVEY.md §2.11, ST1-ST4).

The reference's ingestion is an asyncio queue with 2 workers
(``vectorization_queue.py:18-177``); the Spark-native form is a file
source → the SAME ``ingest_vectorize`` plan → ``foreachBatch`` sink,
with ``availableNow`` giving batch parity (drain everything, then stop)
and a live trigger giving continuous ingestion.  Batch/stream share one
code path by construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sortify_spark.pipelines import ingest_vectorize

#: In-flight DEFERRED bootstrap side-table builds, keyed by corpus
#: table path (VERDICT r8 #3): the bootstrap trigger of an indexed
#: admission stream commits the CORPUS and returns — the corpus-sized
#: band/embedding index construction continues in a background thread,
#: because admission decisions never depend on the index being current
#: (the exact-twin screen reads the corpus itself, and every batch's
#: catch-up self-heals a missing index).  Every later trigger — and any
#: other writer — must join these futures before touching the side
#: tables (single-writer protocol); :func:`drain_side_builds` is the
#: public join point for tests/operators reading the sides right after
#: a bootstrap trigger.
_PENDING_SIDE_BUILDS: dict[str, list] = {}


def drain_side_builds(table_path: str) -> None:
    """Block until any deferred bootstrap index build for
    ``table_path`` has committed (no-op when none is pending);
    re-raises a failed build's exception loudly (the next trigger's
    catch-up heals whatever the failure left missing)."""
    for fut in _PENDING_SIDE_BUILDS.pop(table_path, []):
        fut.result()


DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def vectorize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    dim: int = 64,
    processing_time: str | None = None,
    embed_mode: str = "hash",
    chunk_size: int | None = None,
    overlap: int | None = None,
    ivf_index_path: str | None = None,
):
    """ST1: streaming document vectorization.

    File-source parquet stream → ingest_vectorize → parquet append sink.
    ``maxFilesPerTrigger`` is the backpressure knob standing in for the
    reference's 2-worker concurrency cap; checkpointing provides the
    exactly-once bookkeeping the reference lacked.

    ``processing_time`` (e.g. ``"1 second"``) selects a LIVE micro-batch
    trigger instead of the drain-and-stop ``availableNow`` — the
    continuous-ingestion mode of the reference's always-on worker queue
    (``vectorization_queue.py:18-177``); the caller stops the query.

    ``embed_mode="expr"`` runs the pure-Catalyst md5 encoder
    (``pipelines.ingest_vectorize_expr``) instead of the Arrow-batched
    UDF stub — the zero-Python ingest plan under streaming: batch and
    stream share one SQL-replayable code path.

    ``ivf_index_path`` closes the vector-DB loop ONLINE: after each
    micro-batch's vectors land, the persisted IVF artifact at that path
    is maintained — built on the first batch, then incrementally
    ``upsert_ivf_index``-ed (FAISS-add against the stored quantizer;
    only touched bucket partitions rewrite).  Replay-safe: the keyed
    upsert rewrites the same rows idempotently, and a replayed
    first-batch build commits a fresh full snapshot of identical
    content.  Re-training on drift stays a caller decision
    (``built_rows`` is in the assign manifest).
    Returns the started StreamingQuery (caller awaits termination).
    """
    from sortify_spark.pipelines import ingest_vectorize_expr

    reader = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.load(input_dir)
    build = ingest_vectorize_expr if embed_mode == "expr" else ingest_vectorize
    kw = {"dim": dim}
    if chunk_size is not None:
        kw["chunk_size"] = chunk_size
    if overlap is not None:
        kw["overlap"] = overlap

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        out = build(batch_df, **kw)
        if ivf_index_path is not None:
            # sink + index both consume the batch: materialize once
            out = out.localCheckpoint(eager=True)
        out.write.mode("append").parquet(output_dir)
        if ivf_index_path is not None:
            from sortify_spark.search.index import (
                build_ivf_index,
                upsert_ivf_index,
            )
            from sortify_spark.sources.versioned import read_manifest

            vecs = out.select(
                F.col("vector_id").alias("vec_id"), "embedding"
            )
            if read_manifest(f"{ivf_index_path}/assign")["version"] == 0:
                build_ivf_index(vecs, ivf_index_path)
            else:
                upsert_ivf_index(vecs, ivf_index_path)

    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    join_window: str = "1 hour",
    watermark: str = "1 minute",
):
    """Stream-stream event-time interval join (the streaming twin of the
    batch ``range_join_clicks_1h``): purchases ⋈ clicks on user with
    ``click.ts ∈ (purchase.ts − window, purchase.ts]``, both sides
    watermarked.

    This is the join class the reference lacks entirely and batch range
    joins cannot express online: Spark buffers both sides in state and
    the time-range condition + watermark BOUND that state — a click is
    evictable once the watermark passes ``click.ts + window`` (no
    future purchase can match it), so state holds ~one window of each
    side per key, not the stream's history.  Inner join ⇒ every emitted
    pair is final (append mode); the parquet sink + checkpoint give
    exactly-once output across restarts.

    Batch/stream parity contract (``stream_stream_join_replay``): when
    micro-batches are fed in event-time order (later batches never
    older than ``watermark``), the emitted pair set equals the batch
    inner join exactly — hash-checked against the DuckDB oracle.
    """
    ev = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("event_id", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                    T.StructField("user_id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("props", T.StringType()),
                ]
            )
        )
        .format("parquet")
        .load(input_dir)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c_user = p_user "
            f"AND c_ts > p_ts - INTERVAL {join_window} "
            "AND c_ts <= p_ts"
        ),
        "inner",
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("c_ts").alias("click_ts_us"),
    )
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_table: str = "dedup_stream_out",
    max_files_per_trigger: int | None = None,
):
    """Custom stateful streaming operator (applyInPandasWithState):
    exact dedup AT INGEST.

    Groups the stream by content fingerprint; per-group state is one
    boolean ("a representative was already emitted").  The first batch
    containing a fingerprint emits its lowest doc_id and sets the state;
    every later occurrence — in the same batch or any later one — is
    swallowed.  This is the streaming twin of
    ``dedup.drop_exact_duplicates``: identical output when everything
    arrives in one batch, first-arrival-wins across batches (state
    outlives the microbatch, which foreachBatch alone cannot do).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.load(input_dir)
    fp = F.md5(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").cast("binary")
    )
    keyed = docs.select(fp.alias("fp"), "doc_id")

    def _dedup(key, pdf_iter, state):
        if state.exists:
            return  # representative already emitted in a prior batch
        best = None
        for pdf in pdf_iter:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        state.update((True,))
        yield pd.DataFrame({"fp": [key[0]], "doc_id": [best]})

    deduped = keyed.groupBy("fp").applyInPandasWithState(
        _dedup,
        outputStructType="fp string, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # Pin bounded state partitioning (see run_daily_trend_stream).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        return (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(out_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def count_threshold_trigger(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    threshold: int,
    on_threshold,
    available_now: bool = True,
):
    """ST2: auto-trigger an action (the reference fires re-clustering)
    once N new documents have streamed through
    (``document_tasks_service.py:448+``).

    foreachBatch keeps a cumulative processed-row counter; when it
    crosses ``threshold`` the callback fires once with the total and the
    counter resets — the streaming analog of "after every N docs,
    recluster".  The callback runs on the driver; the heavy work it
    launches (e.g. ``clustering.cluster_per_owner``) is a normal batch
    job over the updated tables.

    Restart safety: the counter is persisted batch_id-keyed alongside
    the checkpoint (``<checkpoint_dir>/counter_state.json``).  On a
    restart Structured Streaming may REPLAY the last uncommitted batch;
    a replayed batch_id ≤ the persisted one is skipped, so the every-N
    trigger neither double-counts nor resets across restarts.  The
    callback itself remains at-least-once (a crash between callback and
    state write re-fires it) — callers needing exactly-once must make
    ``on_threshold`` idempotent, same as any foreachBatch side effect.
    """
    state_path = os.path.join(checkpoint_dir, "counter_state.json")
    state = {"count": 0, "last_batch_id": -1}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state.update(json.load(fh))
    docs = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state["last_batch_id"]:
            return  # replayed batch after restart — already counted
        state["count"] += batch_df.count()
        state["last_batch_id"] = batch_id
        fired = state["count"] >= threshold
        total = state["count"]
        if fired:
            state["count"] = 0
        os.makedirs(checkpoint_dir, exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, state_path)
        if fired:
            on_threshold(total)

    writer = docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def daily_trend_stream(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
):
    """ST4: the streaming twin of ``aggregates.daily_trend`` — event-time
    1-day tumbling windows with a watermark bounding state for late data.
    Same semantics as the batch ``date_format`` group-by once windows
    close."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(38,10)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "cnt",
            "avg_value",
        )
    )


def run_daily_trend_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_table: str = "daily_trend_stream_out",
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
    processing_time: str | None = None,
    watermark: str = "1 day",
):
    """Drive the windowed aggregation from a file stream into an
    in-memory sink — used by tests to prove batch/stream parity.

    ``output_mode="complete"`` + ``availableNow`` is the drain-everything
    parity mode; ``output_mode="append"`` emits each day only after the
    watermark passes its window end, which is the mode that actually
    exercises late-data DROP semantics (with a live ``processing_time``
    trigger and ``max_files_per_trigger`` the test feeds files one
    micro-batch at a time and plants late rows)."""
    reader = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    ).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.load(input_dir)
    agg = daily_trend_stream(events, watermark=watermark)
    # Streaming state partitioning is fixed at first run from the session
    # conf; under a default session that is 200 state-store partitions
    # for a ~30-group aggregate.  Pin a bounded value for this query and
    # restore the caller's setting after start.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        writer = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(out_table)
            .option("checkpointLocation", checkpoint_dir)
        )
        if processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gap_min: int = 30,
    watermark: str = "1 minute",
    out_table: str = "sessions_stream_out",
    max_files_per_trigger: int | None = None,
):
    """Custom stateful streaming operator #2: per-user SESSIONIZATION at
    ingest — the streaming twin of the batch ``user_sessions`` query
    (same >gap_min-gap split semantics).

    ``applyInPandasWithState`` keyed by user: state carries the OPEN
    session (start, last-event, count).  Each batch folds its events
    into the state in timestamp order, emitting every session the gap
    rule closes; the still-open session stays in state with an
    EVENT-TIME TIMEOUT at ``last_event + gap``.  When the watermark
    passes that point — no event can extend the session anymore — the
    timeout fires and the session is emitted.  State per user is O(1)
    (three numbers), so total state is bounded by active users, not
    events; in-order arrival per user gives batch-identical output
    (late out-of-order events within a batch are sorted, across batches
    they would start a new session — the standard streaming trade-off,
    bounded by the watermark).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = (
        reader.load(input_dir)
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id")
    )

    def _sessionize(key, pdf_iter, state):
        if state.hasTimedOut:
            start, last, n, idx = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_idx": [idx],
                    "n_events": [n],
                    "duration_us": [last - start],
                }
            )
            return
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        if state.exists:
            start, last, n, idx = state.get
        else:
            start, last, n, idx = None, None, 0, 0
        closed = []
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((idx, start, last, n))
                idx += 1
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n, idx))
        # fire once no in-order event can extend the open session
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "session_idx": [c[0] for c in closed],
                    "n_events": [c[3] for c in closed],
                    "duration_us": [c[2] - c[1] for c in closed],
                }
            )

    sessions = events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=(
            "user_id long, session_idx long, n_events long, duration_us long"
        ),
        stateStructType=(
            "start_us long, last_us long, n long, session_idx long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        return (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(out_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def upsert_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("doc_id",),
    partition_cols: tuple[str, ...] = ("source",),
    available_now: bool = True,
    versioned: bool = False,
    compact_files_over: int | None = None,
):
    """Streaming keyed upsert: every micro-batch MERGEs into the
    partitioned parquet table via :func:`sinks.upsert_partitioned` —
    the CDC-style sink the reference's in-place Mongo updates imply
    (``document_service`` update paths), expressed as stream →
    foreachBatch → keyed partition overwrite.

    ``versioned=True`` commits each micro-batch through
    :mod:`sources.versioned` instead: the merge becomes an ATOMIC
    manifest swap, so a reader never observes a half-applied batch and
    every micro-batch is a time-travelable snapshot (one partition
    column only — the protocol's granularity).

    Replay safety: a restart may re-deliver the last uncommitted batch,
    and keyed upsert is idempotent (re-applying rewrites the same rows
    with the same values), so the table converges to exactly-once
    CONTENT even though foreachBatch is at-least-once.  Within one
    batch, later duplicates of a key win deterministically only if the
    batch is key-unique — dedupe upstream (streaming_exact_dedup) when
    sources can repeat a key inside a single batch.

    At 100 TB: each micro-batch rewrites only the partitions its keys
    touch (the merge plan broadcasts the batch, the table never
    shuffles); partition layout chooses the rewrite amplification.

    ``compact_files_over=N`` (versioned only) closes the small-file
    loop: after each commit, any partition whose current dir exceeds N
    parquet files is rewritten through :func:`sources.versioned.compact`
    — itself an atomic pure-layout version, so readers and time travel
    are unaffected and the maintenance amortizes into the stream
    instead of a separate nightly OPTIMIZE job.
    """
    from sortify_spark.sources.sinks import upsert_partitioned
    from sortify_spark.sources.versioned import compact, upsert_versioned

    if versioned and len(partition_cols) != 1:
        raise ValueError("versioned upsert_stream needs ONE partition col")
    if compact_files_over is not None and not versioned:
        raise ValueError("compact_files_over requires versioned=True")

    docs = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        if versioned:
            upsert_versioned(
                batch_df,
                table_path,
                keys=list(keys),
                partition_col=partition_cols[0],
            )
            if compact_files_over is not None:
                compact(
                    spark,
                    table_path,
                    partition_cols[0],
                    max_files_per_partition=compact_files_over,
                )
        else:
            upsert_partitioned(
                batch_df, table_path, keys=list(keys),
                partition_cols=list(partition_cols),
            )

    writer = docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def admission_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    partition_col: str = "source",
    shingle_k: int = 3,
    threshold: float = 0.5,
    available_now: bool = True,
    semantic_tau: float | None = None,
    use_index: bool = False,
    fold_sides_over: int | None = None,
    lexical_index: bool = False,
):
    """Streaming corpus admission: the full training-data front door as
    one continuous pipeline — new documents stream in, every micro-batch
    is deduplicated in-batch (exact, keep min doc_id), then screened
    against the STANDING corpus (exact fingerprint twin OR verified
    MinHash-LSH near-dup ⇒ rejected), and the admitted survivors commit
    atomically through the versioned store (one time-travelable
    snapshot per micro-batch).

    ``semantic_tau`` adds a third screen — the ``semdedup_docs``
    semantics online: batch and corpus embed with the dim-8 expression
    encoder, block on the hyperplane-sign LSH key, and a batch doc with
    dot ≥ τ against ANY corpus doc in its block is rejected.  This
    catches near-dups the shingle screen misses (e.g. a token
    permutation of a corpus doc: different shingles, near-identical
    bag embedding).  Replay convergence is unchanged: once admitted, a
    re-delivered doc dies at the exact-twin screen.

    ``use_index=True`` is the 100-TB shape: the corpus side of the
    near-dup screens stops being recomputed per batch and instead reads
    versioned SIDE TABLES (``<table>__bands`` keyed (id, band_idx)
    and ``<table>__emb`` keyed id, both LSM-partitioned by the committing
    batch id — append-shaped commits, compacted periodically),
    ``<table>__emb`` keyed id) maintained by the same admission
    commits.  Jaccard-verify token sets are computed only for the
    band-join CANDIDATES (a semi-joined slice of the corpus), never the
    whole corpus.  Commit order is corpus first, index second, so a
    crash can only leave the index BEHIND the corpus — and every batch
    starts with a self-healing catch-up (corpus ids anti-join index
    ids → index rows rebuilt for the gap), which also bootstraps the
    index on first use.  Correctness never depends on the index being
    current: the exact-twin screen always reads the corpus itself.

    ``fold_sides_over=N`` (requires ``use_index=True``) bounds the
    LSM side tables' partition count: when either side table exceeds N
    batch partitions, the cold partitions fold into base level ``-1``
    (``sources.versioned.fold_partitions`` — atomic, pure layout,
    admissions provably unchanged), so a long-running stream's read
    cost stays O(N + 1) files instead of O(batches ever committed).

    BOOTSTRAP latency (VERDICT r8 #3): on the FIRST trigger (empty
    corpus, no screens) the index-side construction is corpus-sized;
    the trigger now returns after the CORPUS commit and builds/commits
    the sides in a background thread (registered in
    ``_PENDING_SIDE_BUILDS``; joined by the next trigger before it
    touches the side tables, or explicitly via
    :func:`drain_side_builds`).  Admission decisions are identical by
    construction — the index is advisory for screens, the exact-twin
    screen reads the corpus, and the per-batch catch-up heals a build
    that crashed mid-flight.  Steady-state triggers keep committing
    their sides synchronously (small, and the LSM append shape).

    ``lexical_index=True`` additionally maintains the persisted BM25
    lexical artifact (``search/lexical``) at ``<table>__lex`` from the
    same admission flow — ordered AFTER the corpus commit each
    trigger, with the band/emb sides' self-healing contract (the
    artifact can only ever be BEHIND the corpus; every trigger
    reconciles corpus ids against the doclen forward table and upserts
    exactly the missing docs).  An admitted document is
    keyword-searchable via ``probe_lexical_index`` at trigger end, and
    the artifact is value-identical to a batch build over the same
    corpus (hash-checked in tests).

    This is the streaming composition of three independently
    oracle-checked kernels: ``textstats.fingerprint`` (exact),
    ``dedup.signature_bands`` + Jaccard verify (the
    ``incremental_dedup_new_docs`` semantics, queries_graph), and
    ``upsert_versioned`` (atomic commit).  Batch/stream parity is
    therefore testable: replaying the same files in ONE batch must
    yield the same final corpus (tests/test_pipelines.py).

    Scale: the batch side is small per trigger — its signatures band
    against the corpus bands with the batch side broadcast into the
    bucket join; the corpus is only ever READ (its banded signatures
    are recomputed here for simplicity; at 100 TB they persist as a
    bucketed side table maintained by the same commits — the join shape
    is unchanged).  Replay safety: a re-delivered batch re-screens
    against a corpus that now contains its own docs' fingerprints —
    re-admission is suppressed by the exact-twin check, so the table
    converges under at-least-once foreachBatch.
    """
    from pyspark.sql.window import Window

    from sortify_spark import dedup, textstats
    from sortify_spark.sources.versioned import (
        read_manifest,
        read_versioned,
        upsert_versioned,
    )

    docs = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )

    bands_path = table_path + "__bands"
    emb_path = table_path + "__emb"
    lex_path = table_path + "__lex"

    def _maintain_lex() -> None:
        """Reconcile the persisted BM25 artifact with the just-committed
        corpus: drifted docs (this trigger's admissions, a crash gap,
        AND re-admitted ids whose text the keyed corpus upsert
        REPLACED) hydrate from the corpus and upsert with exact df /
        n_docs / sum_dl deltas.  Drift = the corpus (doc_id, content
        fingerprint) pair absent from the ANCHOR-PAIRED doclen
        snapshot: the pinned read makes a crash BETWEEN the lexical
        upsert's internal commits (doclen committed, anchor not)
        re-process the doc instead of skipping it — the unpinned
        latest-doclen read would see the orphaned row and never heal
        the anchor's stats (review r9); the keyed merges make the
        re-process idempotent.  Steady-state cost: one corpus scan
        (doc_id + tokenize-fp) + the compact doclen scan; only drifted
        docs build postings."""
        from sortify_spark.search.lexical import (
            build_lexical_index,
            doc_fp,
            upsert_lexical_index,
        )

        if not read_manifest(table_path)["partitions"]:
            return  # nothing admitted yet
        corpus_now = read_versioned(spark, table_path, partition_col)
        anchor = read_manifest(f"{lex_path}/terms")
        if anchor["version"] == 0:
            build_lexical_index(
                corpus_now.select("doc_id", "text"), lex_path
            )
            return
        indexed = read_versioned(
            spark,
            f"{lex_path}/doclen",
            "pd",
            version=anchor.get("doclen_version"),
        ).select("doc_id", "fp")
        w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        drifted = (
            corpus_now.select("doc_id", doc_fp(w).alias("fp"))
            .join(indexed, ["doc_id", "fp"], "left_anti")
            .select("doc_id")
        )
        if drifted.isEmpty():
            return
        upsert_lexical_index(
            corpus_now.join(F.broadcast(drifted), "doc_id", "left_semi")
            .select("doc_id", "text"),
            lex_path,
        )

    def _read_side(path: str, pcol: str):
        return (
            read_versioned(spark, path, pcol)
            if read_manifest(path)["partitions"]
            else None
        )

    def _emb_raw(df: DataFrame, idc: str) -> DataFrame:
        from sortify_spark.functions.sql_embed import expr_embed
        from sortify_spark.queries_curation2 import DOCSEM_DIM

        return df.select(
            F.col("doc_id").alias(idc),
            expr_embed(F.col("text"), dim=DOCSEM_DIM).alias("__e"),
        )

    def _key(emb: DataFrame, center: DataFrame | None) -> DataFrame:
        from sortify_spark.queries_curation2 import DOCSEM_BITS
        from sortify_spark.search.knn import (
            lsh_portable_key,
            lsh_portable_key_centered,
        )

        if center is None:
            return emb.withColumn(
                "__bk", lsh_portable_key("__e", nbits=DOCSEM_BITS)
            )
        return (
            emb.crossJoin(F.broadcast(center))
            .withColumn(
                "__bk",
                lsh_portable_key_centered("__e", "c", DOCSEM_BITS),
            )
            .drop("c")
        )

    def _emb(
        df: DataFrame, idc: str, center: DataFrame | None = None
    ) -> DataFrame:
        return _key(_emb_raw(df, idc), center)

    center_path = emb_path + "_center"

    def _read_center() -> DataFrame | None:
        if os.path.exists(os.path.join(center_path, "_SUCCESS")):
            return spark.read.parquet(center_path)
        return None

    def _write_center(emb_df: DataFrame) -> None:
        """Pin the semantic center: per-dim decimal mean over an
        already-embedded frame's ``__e`` column (the coarse-quantizer
        training set) — written BEFORE the corpus commit so
        at-least-once replay recomputes the byte-identical center from
        the same first batch."""
        from sortify_spark.search.knn import embedding_mean

        embedding_mean(
            emb_df.select(F.col("__e").alias("embedding"))
        ).coalesce(1).write.mode("overwrite").parquet(center_path)

    def _admit(batch_df: DataFrame, _batch_id: int) -> None:
        import os as _os
        import sys as _sys
        import time as _time

        # SORTIFY_ADMIT_DEBUG=1: per-phase wall-clock to stderr.  Debug
        # mode inserts extra materialization points so the lazy plan's
        # cost attributes to the phase that built it — output identical,
        # timing honest.
        dbg = _os.environ.get("SORTIFY_ADMIT_DEBUG") == "1"
        marks: list = []
        t_last = _time.time()

        def _tick(label: str, force=None) -> None:
            nonlocal t_last
            if not dbg:
                return
            if force is not None:
                force.count()
            now = _time.time()
            marks.append((label, round(now - t_last, 2)))
            t_last = now

        if batch_df.isEmpty():
            return
        _tick("batch_poll")
        # join any deferred bootstrap index build (previous trigger or
        # a restarted stream on the same table) BEFORE reading/writing
        # the side tables — the single-writer protocol would otherwise
        # refuse the race loudly; a failed build surfaces here and the
        # catch-up below heals whatever it left missing
        drain_side_builds(table_path)
        fp = textstats.fingerprint(F.col("text"))
        # in-batch exact dedup: deterministic min-doc_id representative
        w = F.row_number().over(
            Window.partitionBy("__fp").orderBy("doc_id")
        )
        batch = (
            batch_df.withColumn("__fp", fp)
            .withColumn("__rn", w)
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        corpus = (
            read_versioned(spark, table_path, partition_col)
            if read_manifest(table_path)["partitions"]
            else None
        )
        center = None
        if semantic_tau is not None:
            center = _read_center()
            if center is None and corpus is not None:
                # legacy table or crash before the center write: pin it
                # from the standing corpus (deterministic given the
                # corpus state; the crash-free path pins from the FIRST
                # admitted batch below)
                _write_center(_emb_raw(corpus, "id"))
                center = _read_center()
        # screen-time frames the COMMIT section reuses (the admitted
        # docs are a subset of the screened batch, so their index rows
        # filter out of the already-computed screen frames instead of
        # re-shingling / re-embedding — VERDICT r5 item 4)
        b_bands = None
        be = None
        if corpus is not None:
            # exact twin in corpus.  The screened batch is
            # localCheckpoint-ed at each screen boundary: every commit
            # and every later screen re-evaluates the batch frame, and
            # without materialization each evaluation re-runs ALL
            # prior screens (corpus scans, band joins, verify) —
            # measured as ~6 re-evaluations per micro-batch, the
            # dominant admission cost.  The frames are batch-sized;
            # blocks are reclaimed by the context cleaner.
            cfp = corpus.select(fp.alias("__fp")).dropDuplicates(["__fp"])
            batch = batch.join(
                F.broadcast(cfp), "__fp", "left_anti"
            ).localCheckpoint(eager=True)
            # near-dup vs corpus: shared banding, bucket join, verify
            b_base, b_bands = dedup.signature_bands(
                batch, use_shingles=shingle_k
            )
            if use_index:
                # read the maintained band index; self-heal any gap
                # (bootstrap, or a crash between corpus and index
                # commits) by rebuilding bands for corpus ids the index
                # lacks
                idx = _read_side(bands_path, "pb")
                # Docs too short to shingle NEVER produce band rows —
                # without this pre-filter they'd sit in `missing`
                # forever and the self-heal would run corpus-shaped
                # shingle jobs every batch even in steady state (the
                # exact-twin screen still covers them; ADVICE r4).
                bandable = corpus.filter(
                    F.size(dedup.words(F.col("text")))
                    >= (shingle_k or 1)
                )
                missing = (
                    bandable
                    if idx is None
                    else bandable.join(
                        idx.select(
                            F.col("id").alias("doc_id")
                        ).distinct(),
                        "doc_id",
                        "left_anti",
                    )
                )
                if not missing.isEmpty():
                    _, m_bands = dedup.signature_bands(
                        missing, use_shingles=shingle_k
                    )
                    # shingle-less docs produce no band rows — skip the
                    # empty commit (they simply have nothing to index)
                    if not m_bands.isEmpty():
                        # checkpoint ONCE: the commit evaluates its
                        # updates twice and the screen reads them again
                        # — on a bootstrap batch each evaluation is a
                        # full-corpus shingle pass (the measured
                        # bootstrap premium, VERDICT r5 item 4)
                        m_bands = m_bands.withColumn(
                            "pb", F.lit(int(_batch_id))
                        ).localCheckpoint(eager=True)
                        upsert_versioned(
                            m_bands,
                            bands_path,
                            keys=["id", "band_idx"],
                            partition_col="pb",
                        )
                        # union the just-committed rows in memory
                        # instead of re-reading the whole side table
                        idx = (
                            m_bands
                            if idx is None
                            else idx.unionByName(m_bands)
                        )
                _tick("band_catchup")
                if idx is None:
                    # corpus has no shingleable docs at all — fall back
                    # to the direct (empty) banding
                    _, idx = dedup.signature_bands(
                        corpus, use_shingles=shingle_k
                    )
                c_bands = idx
            else:
                c_base, c_bands = dedup.signature_bands(
                    corpus, use_shingles=shingle_k
                )
            cand = (
                b_bands.select(
                    F.col("id").alias("bid"), "band_idx", "band_key"
                )
                .join(
                    c_bands.select(
                        F.col("id").alias("cid"), "band_idx", "band_key"
                    ),
                    ["band_idx", "band_key"],
                )
                .select("bid", "cid")
                .dropDuplicates(["bid", "cid"])
            )
            if use_index:
                # verify tokens only for the candidate slice of the
                # corpus — the whole-corpus token sets are never built.
                # Replica-heavy guard (VERDICT r5 item 4): when nearly
                # every indexed doc is a candidate the "slice" IS the
                # corpus, and the semi-join + per-slice banding just
                # adds overhead on top of what a full-corpus pass
                # costs — so past a candidate fraction of 1/2, band
                # the corpus directly (one pass yields all token sets).
                cand = cand.localCheckpoint(eager=True)
                c_ids = cand.select(F.col("cid").alias("doc_id")).distinct()
                n_cand = c_ids.count()
                # indexed docs ≈ band rows / bands-per-doc (exact
                # enough for a threshold; the compact side table is
                # cheap to count, the text corpus is not)
                n_indexed = max(idx.count() // 4, 1)
                if n_cand * 2 >= n_indexed:
                    c_base, _ = dedup.signature_bands(
                        corpus, use_shingles=shingle_k
                    )
                else:
                    c_slice = corpus.join(
                        F.broadcast(c_ids), "doc_id", "left_semi"
                    )
                    c_base, _ = dedup.signature_bands(
                        c_slice, use_shingles=shingle_k
                    )
            near_hit = (
                cand.join(
                    b_base.select(
                        F.col("id").alias("bid"), F.col("toks").alias("tb")
                    ),
                    "bid",
                )
                .join(
                    c_base.select(
                        F.col("id").alias("cid"), F.col("toks").alias("tc")
                    ),
                    "cid",
                )
                .filter(
                    F.round(dedup.jaccard(F.col("tb"), F.col("tc")), 6)
                    >= threshold
                )
                .select(F.col("bid").alias("doc_id"))
                .distinct()
            )
            near_hit = near_hit.localCheckpoint(eager=True)
            _tick("near_dup_screen")
            batch = batch.join(F.broadcast(near_hit), "doc_id", "left_anti")
            if semantic_tau is not None:
                from sortify_spark.functions.vectors import dot

                # checkpoint always: the semantic screen AND the commit
                # section both read the batch embeddings — one embed
                # pass instead of two
                be = _emb(batch, "bid", center).localCheckpoint(
                    eager=True
                )
                _tick("batch_embed")
                if use_index:
                    eidx = _read_side(emb_path, "pb")
                    e_missing = (
                        corpus
                        if eidx is None
                        else corpus.join(
                            eidx.select(
                                F.col("id").alias("doc_id")
                            ).distinct(),
                            "doc_id",
                            "left_anti",
                        )
                    )
                    if not e_missing.isEmpty():
                        # Mirror the band catch-up: LSM-partitioned by
                        # commit batch ("pb"), "bk" as a DATA column —
                        # partitioning by "bk" would strip it from the
                        # files, breaking the eidx.select(..., "bk")
                        # below and every later batch (ADVICE r5 high).
                        # Checkpoint once (commit double-evaluates +
                        # screen reads) and union in memory instead of
                        # re-reading the side table — the bootstrap
                        # batch embeds the corpus exactly once.
                        m_emb = (
                            _emb(e_missing, "id", center)
                            .select(
                                "id",
                                F.col("__e").alias("e"),
                                F.col("__bk").alias("bk"),
                            )
                            .withColumn("pb", F.lit(int(_batch_id)))
                            .localCheckpoint(eager=True)
                        )
                        upsert_versioned(
                            m_emb,
                            emb_path,
                            keys=["id"],
                            partition_col="pb",
                        )
                        eidx = (
                            m_emb
                            if eidx is None
                            else eidx.unionByName(m_emb)
                        )
                    _tick("emb_catchup_check")
                    ce = eidx.select(
                        F.col("id").alias("cid"),
                        F.col("e").alias("__ec"),
                        F.col("bk").alias("__bk"),
                    )
                else:
                    ce = _emb(corpus, "cid", center).select(
                        "cid", F.col("__e").alias("__ec"), "__bk"
                    )
                sem_hit = (
                    be.join(ce, "__bk")
                    .filter(
                        F.round(dot(F.col("__e"), F.col("__ec")), 6)
                        >= semantic_tau
                    )
                    .select(F.col("bid").alias("doc_id"))
                    .distinct()
                )
                sem_hit = sem_hit.localCheckpoint(eager=True)
                _tick("semantic_screen")
                batch = batch.join(
                    F.broadcast(sem_hit), "doc_id", "left_anti"
                )
        admitted = batch.drop("__fp").localCheckpoint(eager=True)
        if not admitted.isEmpty():
            _tick("admit_check")
            bands_fut = None
            if use_index:
                a_ids = F.broadcast(
                    admitted.select(F.col("doc_id").alias("id")).distinct()
                )
                # Derive the index rows from the already-checkpointed
                # SCREEN frames (admitted ⊆ screened batch): a semi-join
                # on the admitted ids replaces a re-shingle / re-embed
                # of the admitted docs — the other half of the r5
                # bootstrap premium.  First batch (no screens ran):
                # compute fresh.
                if b_bands is not None:
                    a_bands = b_bands.join(a_ids, "id", "left_semi")
                else:
                    _, a_bands = dedup.signature_bands(
                        admitted, use_shingles=shingle_k
                    )
                a_bands_pb = a_bands.withColumn(
                    "pb", F.lit(int(_batch_id))
                )
                if corpus is not None:
                    # Steady state: overlap the band COMPUTE (a
                    # side-effect-free materialization) with the corpus
                    # commit below (VERDICT r7 #3).  Only the COMMIT is
                    # ordered after the corpus commit; a crash leaves
                    # at most an un-referenced checkpoint, never an
                    # index row.
                    from concurrent.futures import ThreadPoolExecutor

                    _pool = ThreadPoolExecutor(1)
                    bands_fut = _pool.submit(
                        lambda df: df.localCheckpoint(eager=True),
                        a_bands_pb,
                    )
                    _pool.shutdown(wait=False)
                # BOOTSTRAP (corpus None): bands_fut stays None and the
                # corpus-sized minhash pipeline runs entirely inside
                # the DEFERRED background job — measured (r9, 180k):
                # pre-commit overlap still stole executor CPU from the
                # corpus commit, which was the whole residual +21%
                # premium VERDICT r8 #3 flagged.
            a_emb_raw = None
            if semantic_tau is not None and center is None:
                # first admitted batch pins the semantic center; the
                # write precedes every commit so replay converges.
                # (On every later batch the center already exists and
                # the batch embeddings live in the checkpointed screen
                # frame `be` — no second embed pass.)
                a_emb_raw = _emb_raw(admitted, "id").localCheckpoint(
                    eager=True
                )
                _write_center(a_emb_raw)
                center = _read_center()
                _tick("center_write")
            # corpus FIRST, index second: a crash here leaves the index
            # behind, which the next batch's catch-up heals; the inverse
            # order could reject docs the corpus never received
            upsert_versioned(
                admitted, table_path, keys=["doc_id"],
                partition_col=partition_col,
            )
            _tick("corpus_commit")
            if use_index:
                a_emb = None
                if semantic_tau is not None:
                    if be is not None:
                        a_emb = be.join(
                            a_ids,
                            be["bid"] == a_ids["id"],
                            "left_semi",
                        ).select(
                            F.col("bid").alias("id"),
                            F.col("__e").alias("e"),
                            F.col("__bk").alias("bk"),
                        )
                    else:
                        if a_emb_raw is None:
                            # center exists but the screens never ran:
                            # a crash between _write_center and the
                            # corpus commit leaves the center file
                            # behind an empty corpus, so on replay
                            # `center is not None` skips the
                            # first-batch embed above AND `be is None`
                            # (no corpus -> no screens).  Embed the
                            # admitted batch here or the replay
                            # crashes identically forever.
                            a_emb_raw = _emb_raw(
                                admitted, "id"
                            ).localCheckpoint(eager=True)
                        a_emb = _key(a_emb_raw, center).select(
                            "id",
                            F.col("__e").alias("e"),
                            F.col("__bk").alias("bk"),
                        )
                # LSM-style side-table commits: the partition value is
                # the BATCH id, so each commit writes only its own new
                # partition (append-shaped, zero rewrite amplification)
                # instead of rewriting every band/bucket partition of
                # the whole index per batch; readers scan the union and
                # sources.versioned.compact folds old partitions.  A
                # replayed batch rewrites ITS OWN partition
                # idempotently.  (Checkpoint: each upsert evaluates its
                # updates twice.)
                #
                # Bootstrap-cost hardening (VERDICT r7 #3): (1) the
                # write fan-out scales with the batch — a corpus-sized
                # bootstrap batch writes its partition with up to
                # `par` tasks instead of serializing ~4 band rows/doc
                # through ONE writer, while steady small batches keep
                # 1 file/commit (the LSM file-count contract);
                # (2) the two independent side tables commit in
                # PARALLEL threads — their compute+write pipelines
                # overlap, and each one's catch-up heals a crash gap
                # independently, so inter-side ordering never mattered
                # (corpus-first ordering is preserved above).
                n_adm = admitted.count()
                wf = int(
                    min(
                        spark.sparkContext.defaultParallelism,
                        max(1, n_adm // 5000),
                    )
                )

                def _commit_side(df_, path_, keys_, ready=False):
                    if not ready:
                        df_ = df_.withColumn(
                            "pb", F.lit(int(_batch_id))
                        ).localCheckpoint(eager=True)
                    upsert_versioned(
                        df_,
                        path_,
                        keys=keys_,
                        partition_col="pb",
                        write_files_per_partition=wf,
                    )

                def _run_side_jobs():
                    from concurrent.futures import ThreadPoolExecutor

                    # bands frame: steady state = the overlapped compute
                    # from above (block on the future, usually already
                    # done); bootstrap = compute + checkpoint HERE, in
                    # the deferred background job
                    bands_ready = (
                        bands_fut.result()
                        if bands_fut is not None
                        else a_bands_pb.localCheckpoint(eager=True)
                    )
                    jobs = [
                        (bands_ready, bands_path, ["id", "band_idx"], True)
                    ]
                    if a_emb is not None:
                        jobs.append((a_emb, emb_path, ["id"], False))
                    if len(jobs) > 1:
                        with ThreadPoolExecutor(len(jobs)) as ex:
                            # materialize results to surface exceptions
                            list(ex.map(lambda j: _commit_side(*j), jobs))
                    else:
                        _commit_side(*jobs[0])

                if corpus is None:
                    # BOOTSTRAP trigger (VERDICT r8 #3): the corpus is
                    # committed — return the trigger now and finish the
                    # corpus-sized index construction in the
                    # background.  The next trigger joins the future
                    # before touching the sides; a crash mid-build is
                    # exactly the crash-between-commits case the
                    # per-batch catch-up already heals.
                    #
                    # A DAEMON thread, not ThreadPoolExecutor (ADVICE
                    # r9): executor threads are non-daemon and joined
                    # at interpreter exit, so a caller that never
                    # drained would block shutdown on a corpus-sized
                    # build (and race TemporaryDirectory cleanup).
                    # With a daemon thread an undrained build is simply
                    # abandoned at exit — the per-batch catch-up heals
                    # it, same as a crash.  Failures are LOGGED here
                    # (not only surfaced on drain): an abandoned future
                    # must not swallow its exception silently.
                    import threading
                    from concurrent.futures import Future

                    fut: Future = Future()

                    def _bg_build(fut=fut):
                        try:
                            fut.set_result(_run_side_jobs())
                        except BaseException as e:  # noqa: BLE001
                            import logging

                            logging.getLogger(__name__).exception(
                                "deferred bootstrap side build failed "
                                "for %s (next trigger's catch-up heals "
                                "the missing index)",
                                table_path,
                            )
                            fut.set_exception(e)

                    threading.Thread(
                        target=_bg_build,
                        daemon=True,
                        name="sortify-side-build",
                    ).start()
                    _PENDING_SIDE_BUILDS.setdefault(
                        table_path, []
                    ).append(fut)
                else:
                    _run_side_jobs()
                _tick("side_commits")
        _tick("commits")
        if lexical_index:
            # ordered AFTER the corpus commit (the artifact can only be
            # BEHIND); runs even when nothing was admitted — that is
            # the crash-heal path (corpus committed, lexical didn't,
            # replayed batch admits nothing)
            _maintain_lex()
            _tick("lex_maintain")
        if (
            use_index
            and fold_sides_over is not None
            and table_path not in _PENDING_SIDE_BUILDS
        ):
            # in-stream LSM maintenance: when a side table has
            # accumulated more than `fold_sides_over` batch partitions,
            # fold the cold ones into base level -1 (pure layout —
            # admissions unchanged, proven by the folded admission
            # replay oracle).  The current batch's partition stays out
            # of the fold: zero interaction with an in-flight replay.
            from sortify_spark.sources.versioned import fold_partitions

            for side in (bands_path, emb_path):
                if (
                    len(read_manifest(side)["partitions"])
                    > fold_sides_over
                ):
                    fold_partitions(
                        spark,
                        side,
                        "pb",
                        -1,
                        keep=lambda p: int(p) >= int(_batch_id),
                    )
            _tick("side_fold")
        if dbg:
            print(f"[admit b{_batch_id}] {marks}", file=_sys.stderr)

    writer = docs.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental continuous aggregate (the Timescale-style rollup,
    Spark-native): an events stream maintains a per-day rollup table
    that is ALWAYS correct under late data and at-least-once redelivery.

    Each micro-batch aggregates to per-(day, batch_id) PARTIALS —
    ``cnt`` and an exact decimal ``sum_value`` — and commits them into
    the versioned store keyed by (day, batch_id).  That key choice is
    the exactly-once mechanism: a replayed batch rewrites ITS OWN
    partial rows byte-identically instead of double-adding, with no
    marker file that could desynchronize from the data commit (the
    commit IS the marker).  Late events simply produce partials for old
    days — no watermark drop, unlike the append-mode
    ``daily_trend_stream`` twin, and no unbounded streaming state: the
    state lives in the table, not the state store.

    Readers fold partials with :func:`read_rollup` (decimal-exact sum →
    count-weighted average).  At scale: each commit touches only the
    months its batch's days fall in (partition footprint = batch time
    locality), and partial rows per day grow by one per batch —
    ``sources.versioned.compact`` bounds the file count and a periodic
    keyed rewrite can fold old partials if their row count ever
    matters (day-cardinality × batches is tiny relative to events).
    """
    from sortify_spark.sources.versioned import upsert_versioned

    reader = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    ).format("parquet")
    events = reader.load(input_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = (
            batch_df.groupBy(
                F.date_format("ts", "yyyy-MM-dd").alias("day")
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(38,10)")).alias(
                    "sum_value"
                ),
            )
            .select(
                "day",
                F.lit(batch_id).cast("long").alias("batch_id"),
                "cnt",
                F.col("sum_value").cast("decimal(38,10)"),
                F.substring("day", 1, 7).alias("month"),
            )
        )
        upsert_versioned(
            partial, table_path,
            keys=["day", "batch_id"], partition_col="month",
        )

    writer = events.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, table_path: str) -> DataFrame:
    """Fold the rollup partials: (day, cnt, avg_value) with the same
    decimal-exact average contract as the batch ``daily_trend``."""
    from sortify_spark.sources.versioned import read_versioned

    parts = read_versioned(spark, table_path, "month")
    return (
        parts.groupBy("day")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.round(
                F.sum("sum_value").cast("double") / F.sum("cnt"), 4
            ).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming paragraph-level keep-first dedup (the Dolma contract, online)
# ---------------------------------------------------------------------------


def paradedup_apply(
    batch_df: DataFrame, batch_id: int, table_path: str
) -> None:
    """One micro-batch of online paragraph dedup — exposed at module
    level so tests can drive replay semantics directly.

    Within the batch, keep-first is the MIN over ``pos_key``
    (doc_id, position); across batches, any paragraph whose md5 is in
    the seen side table from a STRICTLY EARLIER batch partition is
    dropped.  Reading only ``pb < batch_id`` is what makes a replayed
    batch recompute the identical decision (its own partition is
    excluded), and the keyed upserts rewrite its own rows
    byte-identically — the LSM discipline every admission side table
    uses.  Docs are re-emitted with surviving paragraphs in order
    (possibly empty).  Commit order: cleaned docs first, then the seen
    hashes — a crash between the two replays into identical commits.

    Scale: the batch-side work is one paragraph explode + a map-side-
    combined winner MIN; the seen anti-join is an equi-join on the
    128-bit hash (corpus-side table is hash-partitioned by pb and only
    grows by each batch's NOVEL paragraphs; md5 collisions are
    cryptographically negligible and only ever cause a false drop).
    """
    if batch_df.isEmpty():
        return
    from sortify_spark.queries_curation2 import paragraphs_of
    from sortify_spark.sources.versioned import (
        read_manifest,
        read_versioned,
        upsert_versioned,
    )

    spark = batch_df.sparkSession
    seen_path = f"{table_path}__seen"
    p = paragraphs_of(batch_df).withColumn(
        "ph", F.md5(F.col("ptext").cast("binary"))
    ).localCheckpoint(eager=False)
    winners = p.groupBy("ptext").agg(F.min("pos_key").alias("w0"))
    kept = p.join(winners, "ptext").filter(
        F.col("pos_key") == F.col("w0")
    )
    if read_manifest(seen_path)["partitions"]:
        seen = read_versioned(spark, seen_path, "pb").filter(
            F.col("pb") < batch_id
        )
        survivors = kept.join(seen.select("ph"), "ph", "left_anti")
    else:
        survivors = kept
    survivors = survivors.localCheckpoint(eager=False)
    from sortify_spark.queries_curation2 import rebuild_expr

    rebuilt = survivors.groupBy("doc_id").agg(
        rebuild_expr().alias("rebuilt"),
        F.count(F.lit(1)).alias("paras_kept"),
    )
    totals = p.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("paras_total")
    )
    out = totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "source",
        "paras_total",
        F.coalesce("paras_kept", F.lit(0)).alias("paras_kept"),
        F.coalesce("rebuilt", F.lit("")).alias("rebuilt"),
        F.lit(batch_id).cast("long").alias("pb"),
    )
    upsert_versioned(out, table_path, keys=["doc_id"], partition_col="pb")
    new_hashes = (
        survivors.select("ph")
        .distinct()
        .withColumn("pb", F.lit(batch_id).cast("long"))
    )
    upsert_versioned(
        new_hashes, seen_path, keys=["ph"], partition_col="pb"
    )


def paradedup_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Online Dolma-style paragraph dedup: a document stream is
    re-emitted with every paragraph seen in any earlier micro-batch (or
    earlier in the same batch) removed — the streaming twin of
    ``paragraph_dedup_keep_first``, sharing its paragraph kernel
    (:func:`queries_curation2.paragraphs_of`).  State is the versioned
    ``__seen`` hash side table, not the streaming state store: bounded
    by novel-paragraph count, foldable with ``fold_partitions``, and
    exactly-once by partition keying rather than a marker file."""
    reader = spark.readStream.schema(
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("source", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        )
    ).format("parquet")
    docs = reader.load(input_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        paradedup_apply(batch_df, batch_id, table_path)

    writer = docs.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_paradedup(spark: SparkSession, table_path: str) -> DataFrame:
    """Cleaned corpus: (doc_id, source, batch, paras_total, paras_kept,
    rebuilt_hash) — the rebuilt text hashed with the repo's md5-prefix
    idiom so the replay row proves the reconstructed strings."""
    from sortify_spark.sources.versioned import read_versioned

    from sortify_spark.queries_curation2 import md5_prefix_bigint

    return read_versioned(spark, table_path, "pb").select(
        "doc_id",
        "source",
        F.col("pb").alias("batch"),
        "paras_total",
        "paras_kept",
        md5_prefix_bigint("rebuilt").alias("rebuilt_hash"),
    )
