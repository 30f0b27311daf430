"""Structured-Streaming ingest: a corpus directory as a stream, indexed
incrementally (SURVEY.md §2.9 note: the SPEC's build is resumable batch;
this wraps the same engine for stream-shaped sources per the pipeline
brief — "readStream -> transformations -> writeStream").

Design: ``spark.readStream`` over the corpus directory feeds
``foreachBatch``; each micro-batch goes through :meth:`IndexBuilder.append`
(copy-on-write segment re-merge, delta-sized cost). Exactly-once falls out
of composing two idempotencies:

* Spark's streaming checkpoint guarantees each source file is delivered
  in exactly one micro-batch (at-least-once across restarts);
* ``append`` is a no-op for a delta whose fingerprint is already
  committed (and left-anti-joins already-indexed natural keys), so a
  replayed batch cannot double-index.

At scale this is the standard lakehouse pattern: the stream only ever
touches delta-sized state; the heavy global state (segments) is updated
via the engine's own COW merge, never via streaming state stores.
"""

from __future__ import annotations

import functools

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import IndexConfig
from .index import IndexBuilder


def stream_index(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    checkpoint_dir: str,
    cfg: IndexConfig | None = None,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
    siblings: tuple[str, ...] = (),
):
    """Start (and in availableNow mode: run to completion) a streaming
    index over corpus files arriving in ``input_dir``. Returns the
    StreamingQuery; callers use ``.awaitTermination()`` — the
    availableNow trigger makes it double as a batch catch-up run.

    ``max_files_per_trigger`` bounds micro-batch size (availableNow
    respects it, so a backlog drains in multiple delta-sized appends
    instead of one giant batch — the knob that keeps per-batch COW
    merge cost flat at scale). ``fmt`` is ``parquet`` (default) or
    ``jsonl`` — the file-source streaming readers share the exactly-
    once file-tracking checkpoint semantics, so the ingest guarantees
    are format-independent.

    ``siblings`` — subset of ``("positions", "trigrams")`` plus any
    number of ``"sort:<field>"`` entries: extend the named sibling
    indexes with each micro-batch, so phrase/proximity, grep, and
    early-terminated sorted-browse queries stay live under streaming
    ingest instead of going loudly stale at the first append. Per batch this calls the
    ordinary incremental ``build_positions`` / ``build_trigrams`` with
    the batch as the corpus delta — the builders' left-anti join
    against covered doc keys makes that equivalent to passing the full
    corpus (cost ∝ delta), and their committed-tag high-water repair
    makes a replayed micro-batch a no-op even if the previous attempt
    crashed between the sibling commit and its props update. The
    suggester siblings (unigrams/bigrams/deletions/synonyms) are
    dictionary-derived rebuilds, not delta-extendable — refresh those
    on a schedule, not per batch. ``"stems"`` IS supported per batch:
    unlike the suggester tables it is a vocabulary-sized aggregate of
    the segments (term, df) projection (one tiny job), and the
    overwrite republish is idempotent under replay — so stemmed search
    stays live under ingest instead of falling back to the (correct,
    unpruned) live-vocabulary path.
    """
    cfg = cfg or IndexConfig()
    sort_fields = [
        s.split(":", 1)[1] for s in siblings if s.startswith("sort:")
    ]
    if any(not f for f in sort_fields):
        raise ValueError("sort sibling needs a field: sort:<field>")
    bad = set(s for s in siblings if not s.startswith("sort:")) - {
        "positions", "trigrams", "stems"
    }
    if bad:
        raise ValueError(
            f"unknown siblings {sorted(bad)}; supported: positions, "
            "trigrams, stems, sort:<field>"
        )

    schema = (
        "repo string, path string, commit string, lang string, content string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt in ("jsonl", "json", "ndjson"):
        stream = reader.json(input_dir)
    elif fmt == "parquet":
        stream = reader.parquet(input_dir)
    else:
        raise ValueError(f"unsupported streaming corpus format {fmt!r}")

    def ingest(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = IndexBuilder(spark, index_root, cfg)
        # first micro-batch bootstraps the index (full build); later
        # ones append. Both are idempotent per input fingerprint (build
        # resumes committed units, append no-ops on a committed delta),
        # so a replayed micro-batch — restart between the sink commit
        # and the checkpoint advance — cannot double-index:
        # exactly-once end to end.
        #
        # The bootstrap/append gate is the BUILD-COMPLETION marker, not
        # table existence (ADVICE round 2): if the bootstrap build
        # crashed after >=1 group-unit commit, segments exists but is
        # missing whole term groups; the append path's left-anti docs
        # join would find nothing to redo and those terms would be lost
        # permanently. While the marker is absent, the replayed batch
        # calls build() again and its unit-level resume finishes the
        # remaining groups.
        props = b.cat.get_properties() or {}
        if "build_complete_fp" not in props:
            b.build(batch_df)
        else:
            b.append(batch_df)
        # sibling extension runs INSIDE the same foreachBatch: if it
        # fails, the checkpoint does not advance and the whole batch
        # replays — the main append no-ops on its fingerprint and the
        # sibling builders no-op on (or resume from) their committed
        # high-water marks, so siblings can never silently lag the
        # docs table by more than the in-flight batch.
        if "positions" in siblings:
            from .positions import build_positions

            build_positions(spark, index_root, batch_df, cfg)
        if "trigrams" in siblings:
            from .grep import build_trigrams

            build_trigrams(spark, index_root, batch_df, cfg)
        if "stems" in siblings:
            # vocabulary-sized republish stamped with the post-append
            # segments version; replayed batch = same overwrite again
            from .expand import build_stems

            build_stems(spark, index_root)
        for f in sort_fields:
            # generational extension reads the docs table itself (no
            # corpus needed): the batch's appended docs sit above the
            # covered high-water mark and sort into their own
            # generation; a replayed batch is adopted from the
            # committed manifest, never written twice
            from .sortindex import build_sort_index

            build_sort_index(spark, index_root, f)

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_event_windows(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    hours: int = 1,
    watermark: str = "0 seconds",
    max_files_per_trigger: int | None = None,
):
    """Streaming tumbling-window aggregation with a WATERMARK for late
    data (pipeline brief: "watermarks + windowed aggs"): the streaming
    twin of :func:`yase_spark.events.event_windows` — same epoch-aligned
    windows, same output schema — run as readStream -> withWatermark ->
    window groupBy -> append-mode parquet sink.

    Append mode emits a window exactly once, when the watermark passes
    its end: events later than ``watermark`` behind the max seen event
    time are dropped from closed windows instead of corrupting emitted
    results, and state size stays bounded by (watermark horizon /
    window) groups per key — the property that keeps this runnable
    forever at 100 TB/day. With the availableNow trigger it doubles as
    a batch catch-up: windows whose end precedes the final watermark
    are flushed, anything newer stays in state for the next run
    (exactly-once across restarts via the checkpoint).
    """
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    win = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{hours} hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value_r"),
        )
        .select(
            F.col("w").start.alias("window_start"), "event_type", "n", "sum_value_r"
        )
    )
    return (
        win.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int | None = None,
):
    """CUSTOM STATEFUL streaming operator (pipeline brief:
    "applyInPandasWithState for custom stateful operators"): gap-based
    sessionization of an event stream — the streaming twin of
    :func:`yase_spark.events.sessionize`, same output schema and the
    same session numbering.

    State per user is ONE open session (seq, start_us, last_us, n):
    sessions are sequential, so that is the entire state no matter how
    long the stream runs — the 100 TB/day property. A session is
    emitted exactly once, when it CLOSES: either a later event arrives
    more than ``gap_minutes`` after its end, or the event-time watermark
    passes end + gap (state timeout), whichever first. Batch
    equivalence: over a drained stream, emitted sessions are precisely
    the batch operator's sessions whose end + gap precedes the final
    watermark, plus any closed by a successor event.

    Arrival contract: micro-batches are time-ordered ACROSS batches
    (within a batch, any order — the kernel sorts); an event older than
    its user's open-session tail merges into that session rather than
    rewriting emitted history (sessions already emitted are immutable —
    the append-mode invariant). That is the standard watermark bargain:
    disorder within the watermark horizon is absorbed, disorder beyond
    it degrades gracefully instead of corrupting output.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize_user(key, pdfs, state):
        import numpy as np
        import pandas as pd

        user_id = int(key[0])
        cols = ["user_id", "session_seq", "n_events", "start_ts", "end_ts",
                "duration_us"]

        def emit(rows):
            return pd.DataFrame(
                [
                    (user_id, seq, n,
                     pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"),
                     e - s)
                    for seq, s, e, n in rows
                ],
                columns=cols,
            )

        if state.hasTimedOut:
            seq, s, e, n = state.get
            # tombstone keeps the sequence counter: a dormant user's
            # NEXT session must continue the batch-identical numbering
            # (start_us == -1 encodes "no open session, seq consumed").
            # No new timeout — a tombstone is one tiny row per dormant
            # user until their next event (or state-store TTL upstream).
            state.update((seq, -1, -1, 0))
            yield emit([(seq, s, e, n)])
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        batch = pd.concat(frames, ignore_index=True)
        # event-time order; event_id breaks ts ties exactly like the
        # batch window (ORDER BY ts, event_id)
        batch = batch.sort_values(["ts", "event_id"])
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()

        open_sess = None
        base_seq = 0
        if state.exists:
            seq, s, e, n = state.get
            if s == -1:
                base_seq = seq  # tombstone: counter only
            else:
                open_sess = (seq, s, e, n)
        closed = []
        for t in ts_us.tolist():
            if open_sess is None:
                open_sess = (base_seq + 1, t, t, 1)
            else:
                seq, s, e, n = open_sess
                if t - e <= gap_us:
                    open_sess = (seq, s, max(e, t), n + 1)
                else:
                    closed.append(open_sess)
                    open_sess = (seq + 1, t, t, 1)
        state.update(open_sess)
        # close-by-silence: when the watermark passes end + gap with no
        # successor, the timeout callback above emits the open session.
        # (Timeout timestamps must sit beyond the current watermark —
        # clamp for sessions that were already stale on arrival.)
        state.setTimeoutTimestamp(
            max((open_sess[2] + gap_us) // 1000 + 1,
                state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield emit(closed)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    out = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_user,
            outputStructType=(
                "user_id long, session_seq long, n_events long, "
                "start_ts timestamp, end_ts timestamp, duration_us long"
            ),
            stateStructType="seq long, start_us long, last_us long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    max_files_per_trigger: int | None = None,
):
    """Streaming EXACTLY-ONCE dedup (``dropDuplicatesWithinWatermark``):
    each ``event_id`` is emitted once even when the same event arrives
    again — in the same micro-batch or a later one — as long as the
    duplicate lands within the watermark horizon of the original. This
    is the at-least-once-transport -> exactly-once-pipeline adapter
    every large ingest needs (Kafka redeliveries, retried uploads,
    backfill overlaps).

    Why the watermark variant: plain streaming ``dropDuplicates`` keeps
    EVERY key ever seen in state (unbounded at 100 TB/day);
    ``dropDuplicatesWithinWatermark`` ages keys out once the watermark
    passes them, so state is bounded by (horizon x arrival rate) while
    still catching every duplicate that can physically occur within the
    transport's redelivery window. Output rows carry the FIRST arrival's
    payload columns."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", F.round("value", 6).alias("value_r"))
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_percolate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    queries,
    max_files_per_trigger: int | None = None,
    registry_cap: int = 1000,
):
    """Continuous percolation — the ES percolator / Watcher and Lucene
    Monitor capability as a STREAM: every arriving document is matched
    against the stored-query registry and (doc_id, query_id) alert rows
    are appended downstream. The serving shape of alerting, routing and
    saved-search notification over a live feed.

    Plan shape (the part that matters at 100 TB/day): the registry
    COMPILES to a per-row boolean expression — tokenize once
    (array_distinct over the split stream), then per stored query an
    AND over its OR-groups of ``arrays_overlap`` against literal
    arrays, stacked as an array of (query_id, matched) structs,
    filtered and exploded. Fully STATELESS map-only streaming: no
    stream-static join, no aggregation, no watermark, no state store —
    append mode trivially, exactly-once via the sink checkpoint, and a
    1000-executor stream scales linearly with input because each row is
    O(registry) work with zero shuffle. The registry side is
    driver-compiled and therefore bounded (``registry_cap``, default
    1000 rules — Catalyst expression size, the honest constraint);
    beyond that use the batch relational lane (percolate.percolate,
    broadcast-join shaped) on micro-batches via foreachBatch.

    Same registry contract (CNF, single-token terms, loud rejection)
    and bitwise-identical match semantics as the batch lane —
    pytest-gated equality on a planted corpus.
    """
    from .percolate import SPLIT, registry_rows

    if len(queries) > registry_cap:
        raise ValueError(
            f"{len(queries)} stored queries > registry_cap={registry_cap}; "
            "use percolate.percolate in foreachBatch for large registries"
        )
    rows = registry_rows(queries)
    groups: dict[int, dict[int, list[str]]] = {}
    for qid, gid, term in rows:
        groups.setdefault(qid, {}).setdefault(gid, []).append(term)

    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col("text")), SPLIT), lambda t: t != "")
    )
    matched = [
        F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            functools.reduce(
                lambda a, c: a & c,
                [
                    F.arrays_overlap(
                        toks, F.array(*[F.lit(t) for t in terms])
                    )
                    for terms in sorted_groups
                ],
            ).alias("m"),
        )
        for qid, gs in sorted(groups.items())
        for sorted_groups in [[gs[g] for g in sorted(gs)]]
    ]
    out = stream.select(
        "doc_id",
        F.explode(
            F.filter(F.array(*matched), lambda s: s["m"])
        ).alias("hit"),
    ).select("doc_id", F.col("hit.query_id").alias("query_id"))

    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_rollover(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    stream_name: str,
    checkpoint_dir: str,
    cfg: IndexConfig | None = None,
    max_docs: int | None = None,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
):
    """Streaming writes into an ILM rollover stream — the ES DATA
    STREAM write path: documents arrive as files, each micro-batch
    lands in the stream's current write generation via
    ``rollover.rollover_append`` (bootstrap build for a fresh
    generation, bucket-COW append otherwise), and the ``max_docs``
    condition seals generations as they fill — so ingest, rollover,
    and the downstream ILM policy compose into the full managed
    lifecycle without a batch scheduler in the loop.

    Exactly-once under replay, for the same reasons as
    ``stream_index`` and one more: a replayed micro-batch re-enters
    ``rollover_append``, whose bootstrap path resumes/no-ops on the
    build fingerprint, whose append path no-ops on the committed delta
    tag, and whose seal decision recomputes from the generation's doc
    count — deterministic, so the state file converges to the same
    bytes. The crash window between a generation's build commit and
    the state-file write replays into the SAME generation name (the
    name derives from the state list length) and resumes the committed
    build rather than starting a sibling.

    ``max_files_per_trigger`` bounds micro-batch size exactly as in
    ``stream_index`` — with rollover it additionally bounds how far a
    generation can overshoot ``max_docs`` (a generation seals at the
    first batch boundary at or past the condition, the ES semantics)."""
    from .rollover import rollover_append

    cfg = cfg or IndexConfig()
    schema = (
        "repo string, path string, commit string, lang string, content string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt in ("jsonl", "json", "ndjson"):
        stream = reader.json(input_dir)
    elif fmt == "parquet":
        stream = reader.parquet(input_dir)
    else:
        raise ValueError(f"unsupported streaming corpus format {fmt!r}")

    def ingest(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rollover_append(
            spark, warehouse, stream_name, batch_df, cfg, max_docs=max_docs
        )

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
