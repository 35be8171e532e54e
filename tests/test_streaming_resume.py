"""Streaming detection + checkpoint/resume tests."""

import pytest
from pyspark.sql import functions as F

from qizner_spark.plans.checkpoint import pending_only, processed_keys, run_resumable
from qizner_spark.plans.pipeline import default_scorer_factory, extract_pages_text
from qizner_spark.operators.mentions import detect_mentions
from qizner_spark.sources.pages import pages_from_documents
from qizner_spark.streaming.pipeline import (
    stream_detect_mentions,
    stream_windowed_entity_counts,
)


class TestStreaming:
    def test_stream_equals_batch(self, spark, sf_dir, tmp_path):
        pages = pages_from_documents(spark, sf_dir)
        in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
        pages.write.parquet(in_dir)

        q = stream_detect_mentions(spark, in_dir, out_dir, ckpt)
        q.awaitTermination(120)

        streamed = spark.read.parquet(out_dir)
        batch = detect_mentions(
            extract_pages_text(pages, validate=False), default_scorer_factory,
            key_col="url", text_col="text", lang_col="lang",
        )
        cols = ["doc_key", "ent_type", "start", "end"]
        assert streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
        assert batch.select(cols).exceptAll(streamed.select(cols)).count() == 0

    def test_windowed_counts_match_batch(self, spark, sf_dir, tmp_path):
        """Stateful streaming (watermark + event-time window) must
        aggree with the equivalent batch aggregation. availableNow
        processes everything, so every window closes."""
        pages = pages_from_documents(spark, sf_dir)
        in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        pages.write.parquet(in_dir)
        q = stream_windowed_entity_counts(spark, in_dir, out_dir, ckpt,
                                          window_duration="1 hour", watermark="0 seconds")
        q.awaitTermination(180)
        streamed = spark.read.parquet(out_dir)

        batch_m = detect_mentions(
            extract_pages_text(pages, validate=False), default_scorer_factory,
            key_col="url", text_col="text", lang_col="lang",
            passthrough_cols=["warc_ts"],
        )
        max_ts = pages.agg(F.max("warc_ts")).first()[0]
        want = (
            batch_m.groupBy(F.window("warc_ts", "1 hour"), "ent_type")
            .agg(F.count(F.lit(1)).alias("n_mentions"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"), "ent_type", "n_mentions")
        )
        got = streamed.select("window_start", "ent_type", "n_mentions")
        assert got.exceptAll(want.drop("window_end")).count() == 0
        # append mode can only emit windows the final watermark passed;
        # the LAST open window (end > max event time) legitimately
        # stays unemitted — everything else must match the batch agg
        missing = want.join(got, ["window_start", "ent_type", "n_mentions"], "left_anti")
        assert missing.where(F.col("window_end") <= F.lit(max_ts)).count() == 0
        assert streamed.count() > 0

    def test_stream_restart_is_exactly_once(self, spark, sf_dir, tmp_path):
        pages = pages_from_documents(spark, sf_dir)
        in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
        pages.write.parquet(in_dir)
        stream_detect_mentions(spark, in_dir, out_dir, ckpt).awaitTermination(120)
        n1 = spark.read.parquet(out_dir).count()
        # restart with the same checkpoint: no new input -> no new rows
        stream_detect_mentions(spark, in_dir, out_dir, ckpt).awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == n1


class TestResume:
    def test_second_run_is_noop(self, spark, sf_dir, tmp_path):
        pages = pages_from_documents(spark, sf_dir)
        sink = str(tmp_path / "triples")
        m1 = run_resumable(spark, pages, sink)
        assert m1["n_pending"] > 0 and not m1["resumed"]
        m2 = run_resumable(spark, pages, sink)
        assert m2["n_pending"] == 0 and m2["resumed"]

    def test_incremental_append(self, spark, sf_dir, tmp_path):
        pages = pages_from_documents(spark, sf_dir)
        first, rest = pages.limit(20), pages
        sink = str(tmp_path / "triples")
        run_resumable(spark, first, sink)
        n_after_first = spark.read.parquet(sink).count()
        m2 = run_resumable(spark, rest, sink, metrics_path=str(tmp_path / "metrics"))
        assert m2["n_pending"] == pages.count() - 20
        assert spark.read.parquet(sink).count() > n_after_first
        assert spark.read.json(str(tmp_path / "metrics")).count() == 1

    def test_pending_only_antijoin(self, spark):
        pages = spark.createDataFrame([("u1",), ("u2",), ("u3",)], ["url"])
        done = spark.createDataFrame([("u2",)], ["url"])
        assert {r["url"] for r in pending_only(pages, done).collect()} == {"u1", "u3"}
        assert pending_only(pages, None).count() == 3

    def test_processed_keys_missing_sink(self, spark, tmp_path):
        assert processed_keys(spark, str(tmp_path / "nope")) is None

    def test_crash_between_data_and_manifest_no_duplicates(self, spark, sf_dir, tmp_path):
        """Simulate a crash AFTER the triples append but BEFORE the
        manifest append: the manifest dir is deleted. The rerun must
        skip the already-sunk urls (done-set unions the sink itself)
        instead of appending their triples a second time."""
        import shutil

        pages = pages_from_documents(spark, sf_dir).limit(30)
        sink = str(tmp_path / "triples")
        run_resumable(spark, pages, sink)
        n_rows = spark.read.parquet(sink).count()
        shutil.rmtree(f"{sink}_processed")  # lose the manifest
        m2 = run_resumable(spark, pages, sink)
        assert spark.read.parquet(sink).count() == n_rows  # no double-append
        # zero-triple urls (zh pages) may legitimately reprocess;
        # urls with sunk triples must not
        sunk = {r["url"] for r in spark.read.parquet(sink).select("url").distinct().collect()}
        reprocessed = m2["n_pending"]
        assert reprocessed <= pages.count() - len(sunk)

    def test_corrupt_manifest_raises_not_silently_reprocesses(self, spark, sf_dir, tmp_path):
        import os

        pages = pages_from_documents(spark, sf_dir).limit(10)
        sink = str(tmp_path / "triples")
        run_resumable(spark, pages, sink)
        # corrupt the manifest: a non-parquet file in the directory
        mdir = f"{sink}_processed"
        for f in os.listdir(mdir):
            if f.endswith(".parquet"):
                with open(os.path.join(mdir, f), "wb") as fh:
                    fh.write(b"not a parquet file")
        with pytest.raises(Exception):
            processed_keys(spark, sink).collect()
