"""Streaming mention detection over a growing pages directory.

The reference is strictly batch (SURVEY.md §2.9: no streaming ops) and
the north_rule's resumability is satisfied with snapshot anti-joins
(plans/checkpoint.py); this module additionally exposes the detection
stage as a Structured Streaming flow for continuously-landing crawls:
file-source pages -> stateless detection (mapInPandas works unchanged
on streaming DataFrames) -> parquet sink with exactly-once via the
streaming checkpoint. Watermarking is unnecessary: detection is
stateless per document.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_detect_mentions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    scorer_factory=None,
    available_now: bool = True,
):
    """Start (and for available_now=True, run to completion) the
    streaming detection job; returns the StreamingQuery."""
    from qizner_spark.operators.mentions import detect_mentions
    from qizner_spark.plans.pipeline import default_scorer_factory, extract_pages_text

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    docs = extract_pages_text(pages, validate=False)
    mentions = detect_mentions(
        docs, scorer_factory or default_scorer_factory,
        key_col="url", text_col="text", lang_col="lang",
    )
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize_events(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
    available_now: bool = True,
):
    """CUSTOM STATEFUL streaming operator via applyInPandasWithState:
    per-user sessionization at a ``gap_seconds`` inactivity gap — the
    streaming twin of the batch ``events_sessions`` query (which uses
    a lag window; no built-in streaming operator expresses 'gap-based
    session with running totals', so this is the documented
    applyInPandasWithState use case).

    State per user: (session_start, last_ts, n_events, total_value)
    as epoch seconds. A session row is emitted when a later event
    arrives past the gap, or when the event-time timeout fires
    (watermark passed last_ts + gap). The final open session per user
    emits only after the watermark passes it — append-mode semantics,
    same caveat as windowed aggregation.

    Watermark choice matters when the backlog spans MULTIPLE
    micro-batches (availableNow splits at maxFilesPerTrigger): file
    order is not event-time order, and Spark drops rows older than
    the watermark BEFORE they reach this function. The default
    '0 seconds' is only exact for single-batch runs / ordered feeds;
    set the watermark to the real out-of-orderness bound (e.g.
    '2 hours') for multi-batch backlogs. In-watermark events that
    still arrive older than the open session's start are absorbed
    (start is min-updated) rather than silently mis-attributed.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StructField as SF, StructType as ST,
    )

    out_schema = ST([
        SF("user_id", LongType()), SF("session_start", LongType()),
        SF("session_end", LongType()), SF("n_events", LongType()),
        SF("total_value", DoubleType()),
    ])
    state_schema = ST([
        SF("start", LongType()), SF("last", LongType()),
        SF("n", LongType()), SF("total", DoubleType()),
    ])

    def fn(key, pdfs, state):
        (user,) = key
        sessions = []
        if state.hasTimedOut:
            if state.exists:
                s0, last, n, tot = state.get
                sessions.append((user, s0, last, n, tot))
                state.remove()
        else:
            pdf = pd.concat(list(pdfs)).sort_values("ts")
            if state.exists:
                s0, last, n, tot = state.get
            else:
                s0 = last = None
                n, tot = 0, 0.0
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = int(pd.Timestamp(ts).timestamp())
                if s0 is None:
                    s0, last, n, tot = t, t, 1, float(val)
                elif t - last > gap_seconds:
                    sessions.append((user, s0, last, n, tot))
                    s0, last, n, tot = t, t, 1, float(val)
                else:
                    # cross-batch stragglers may be older than the
                    # open session's start — absorb, don't misdate
                    s0 = min(s0, t)
                    last, n, tot = max(last, t), n + 1, tot + float(val)
            state.update((s0, last, n, tot))
            # close the session once event time passes last + gap
            state.setTimeoutTimestamp((last + gap_seconds + 1) * 1000)
        yield pd.DataFrame(
            sessions,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )

    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, event_type string, "
            "value double, props string"
        ).parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_entity_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    scorer_factory=None,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """STATEFUL streaming: per-entity-type mention counts in
    event-time (warc_ts) windows with a late-data watermark.

    pages stream -> detection (stateless Arrow UDF, event time rides
    through as a passthrough column — no stream-stream join) ->
    watermark + windowed count. Append mode emits a window only after
    the watermark passes it — the standard late-data-safe pattern for
    continuously-landing crawl data.
    """
    from pyspark.sql import functions as F

    from qizner_spark.operators.mentions import detect_mentions
    from qizner_spark.plans.pipeline import default_scorer_factory, extract_pages_text

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    docs = extract_pages_text(pages, validate=False)
    timed = detect_mentions(
        docs,
        scorer_factory or default_scorer_factory,
        key_col="url", text_col="text", lang_col="lang",
        passthrough_cols=["warc_ts"],
    )
    counts = (
        timed.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration), "ent_type")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "ent_type", "n_mentions",
        )
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
