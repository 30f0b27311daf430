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
):
    """Start (and in availableNow mode: run to completion) a streaming
    index over parquet files arriving in ``input_dir``. Returns the
    StreamingQuery; callers use ``.awaitTermination()`` — the
    availableNow trigger makes it double as a batch catch-up run.

    ``max_files_per_trigger`` bounds micro-batch size (availableNow
    respects it, so a backlog drains in multiple delta-sized appends
    instead of one giant batch — the knob that keeps per-batch COW
    merge cost flat at scale).
    """
    cfg = cfg or IndexConfig()

    schema = (
        "repo string, path string, commit string, lang string, content string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

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
