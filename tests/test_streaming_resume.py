"""Streaming detection + checkpoint/resume tests."""

import pytest
from pyspark.sql import functions as F

from qizner_spark.plans.checkpoint import pending_only, processed_keys, run_resumable
from qizner_spark.plans.pipeline import default_scorer_factory, extract_pages_text
from qizner_spark.operators.mentions import detect_mentions
from qizner_spark.sources.pages import pages_from_documents
from qizner_spark.streaming.pipeline import (
    stream_detect_mentions,
    stream_sessionize_events,
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

    def test_kg_increments_equal_batch(self, spark, sf_dir, tmp_path):
        """Incremental-equals-batch at the TRIPLE level: per-document
        detection streamed micro-batch by micro-batch into the mention
        staging sink, then the corpus-global compaction (assemble_kg)
        over the accumulated sink — must emit EXACTLY the batch DAG's
        triples, and the stream must actually have run incrementally
        (> 1 non-empty micro-batch)."""
        from qizner_spark.plans.pipeline import build_kg
        from qizner_spark.streaming.pipeline import stream_kg_increments

        pages = pages_from_documents(spark, sf_dir)
        in_dir = str(tmp_path / "in")
        # three part FILES -> three micro-batches at maxFilesPerTrigger=1
        # (the streaming file source skips _SUCCESS: leading underscore)
        pages.repartition(3).write.parquet(in_dir)

        out = stream_kg_increments(spark, in_dir, str(tmp_path / "work"))
        assert out["n_batches"] >= 2, "stream did not run incrementally"

        batch = build_kg(spark, pages, persist_intermediates=False)["triples"]
        cols = ["subj", "pred", "obj", "url", "warc_ts", "prob"]
        s, b = out["triples"].select(cols), batch.select(cols)
        assert s.exceptAll(b).count() == 0
        assert b.exceptAll(s).count() == 0

    def test_kg_increments_resume_on_new_drops(self, spark, sf_dir, tmp_path):
        """Continuously-landing crawl: after the first invocation
        drains the initial drop, NEW page files land and a second
        invocation must (a) re-score only the new pages — the
        streaming checkpoint skips processed files, so the mention
        sink holds exactly one row set per page ever landed (no
        duplicates = exactly-once across invocations) — and (b)
        compact the grown sink to EXACTLY the batch DAG's triples
        over all pages."""
        from qizner_spark.plans.pipeline import build_kg
        from qizner_spark.streaming.pipeline import stream_kg_increments

        pages = pages_from_documents(spark, sf_dir)
        first = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
        second = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
        in_dir, work = str(tmp_path / "in"), str(tmp_path / "work")

        first.repartition(2).write.parquet(in_dir)
        out1 = stream_kg_increments(spark, in_dir, work)
        n_first = out1["mentions"].count()
        assert out1["n_batches"] >= 1

        second.repartition(2).write.mode("append").parquet(in_dir)
        out2 = stream_kg_increments(spark, in_dir, work)
        assert out2["n_batches"] >= 1, "second drop produced no micro-batch"

        batch = build_kg(spark, pages, persist_intermediates=False)
        n_all = batch["mentions"].count()
        assert out2["mentions"].count() == n_all, \
            "mention sink duplicated or dropped rows across invocations"
        assert n_first < n_all  # the first drop really was partial

        cols = ["subj", "pred", "obj", "url", "warc_ts", "prob"]
        s, b = out2["triples"].select(cols), batch["triples"].select(cols)
        assert s.exceptAll(b).count() == 0
        assert b.exceptAll(s).count() == 0

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

    def test_sessionize_stateful_matches_batch(self, spark, sf_dir, tmp_path):
        """applyInPandasWithState sessionization must emit exactly the
        CLOSED sessions the batch gap-sessionizer computes (the final
        open session per user stays in state until the watermark
        passes it — append semantics)."""
        import pandas as pd

        ev = f"{sf_dir}/events.parquet"
        in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        spark.read.parquet(ev).write.parquet(in_dir)
        q = stream_sessionize_events(spark, in_dir, out_dir, ckpt, gap_seconds=1800)
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], round(r["total_value"], 6))
            for r in spark.read.parquet(out_dir).collect()
        }

        df = pd.read_parquet(ev).sort_values(["user_id", "ts"])
        max_ts = int(pd.Timestamp(df["ts"].max()).timestamp())  # final watermark
        want = set()
        for uid, g in df.groupby("user_id"):
            s0 = last = None
            n, tot = 0, 0.0
            closed = []
            for ts, val in zip(g["ts"], g["value"]):
                t = int(pd.Timestamp(ts).timestamp())
                if s0 is None:
                    s0, last, n, tot = t, t, 1, float(val)
                elif t - last > 1800:
                    closed.append((int(uid), s0, last, n, round(tot, 6)))
                    s0, last, n, tot = t, t, 1, float(val)
                else:
                    last, n, tot = t, n + 1, tot + float(val)
            # the final session ALSO emits if the global watermark
            # passed its event-time timeout (last + gap + 1)
            if s0 is not None and last + 1801 <= max_ts:
                closed.append((int(uid), s0, last, n, round(tot, 6)))
            want |= set(closed)
        assert got == want
        assert len(got) > 0

    def test_sessionize_multibatch_out_of_order(self, spark, tmp_path):
        """maxFilesPerTrigger=1 + files NOT in event-time order + a
        nonzero watermark: in-watermark stragglers from later files
        must merge into the session they belong to (even bridging a
        gap observed earlier), and a session may only be emitted once
        the watermark seals it. This drives the cross-batch semantics
        the single-batch availableNow test cannot reach."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        B = 1_700_000_000
        gap = 100

        def rows(*evs):
            return [(i, B + t, u, "e", t / 1000.0, "{}") for i, (u, t) in enumerate(evs)]

        # file order != event-time order; max out-of-orderness ~1000 s
        # (< the 1500 s watermark, so nothing is dropped)
        files = [
            rows((1, 1050), (1, 1080), (2, 1150), (1, 2000)),
            rows((1, 1000), (2, 1100), (1, 2050), (2, 3000)),
            rows((999, 100000)),  # sentinel: pushes the final watermark
        ]
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        for i, data in enumerate(files):
            tbl = pa.table({
                "event_id": pa.array([r[0] for r in data], pa.int64()),
                "ts": pa.array([r[1] * 1_000_000 for r in data], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in data], pa.int64()),
                "event_type": pa.array([r[3] for r in data], pa.string()),
                "value": pa.array([r[4] for r in data], pa.float64()),
                "props": pa.array([r[5] for r in data], pa.string()),
            })
            path = str(in_dir / f"f{i}.parquet")
            pq.write_table(tbl, path)
            os.utime(path, (1_000_000 + i * 10, 1_000_000 + i * 10))  # force file order

        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
        q = stream_sessionize_events(
            spark, str(in_dir), out_dir, ckpt,
            gap_seconds=gap, watermark="1500 seconds", max_files_per_trigger=1,
        )
        q.awaitTermination(180)

        got = {
            (r["user_id"], r["session_start"] - B, r["session_end"] - B,
             r["n_events"], round(r["total_value"], 6))
            for r in spark.read.parquet(out_dir).collect()
            if r["user_id"] != 999
        }
        want = {
            # user 1 session 1: the t=1000 straggler arrived one batch
            # AFTER 1050/1080 — start must still be 1000 and n=3
            (1, 1000, 1080, 3, round(1.0 + 1.05 + 1.08, 6)),
            (1, 2000, 2050, 2, round(2.0 + 2.05, 6)),
            (2, 1100, 1150, 2, round(1.1 + 1.15, 6)),
            (2, 3000, 3000, 1, 3.0),
        }
        assert got == want
        # the run actually split into one batch per file
        assert q.lastProgress is not None

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

    def test_remote_sink_uri_rejected_loudly(self, spark, sf_dir):
        """Driver-local rename/rmtree would silently no-op against a
        remote store — the protocol must refuse, not half-run."""
        import pytest as _pytest

        from qizner_spark.plans.checkpoint import recover_sink

        pages = pages_from_documents(spark, sf_dir)
        with _pytest.raises(ValueError, match="local path"):
            run_resumable(spark, pages, "s3a://bucket/triples")
        with _pytest.raises(ValueError, match="local path"):
            recover_sink(spark, "hdfs://nn/triples")

    def test_legacy_manifest_without_run_id_is_tolerated(self, spark, sf_dir, tmp_path):
        """A pre-protocol manifest (url only, no run_id column) means
        no staged commit ever happened: recovery must roll staged dirs
        BACK (not crash), and resume must still honor the legacy urls."""
        import os

        from qizner_spark.plans.checkpoint import recover_sink

        pages = pages_from_documents(spark, sf_dir).limit(10)
        sink = str(tmp_path / "triples")
        legacy_urls = pages.select("url").limit(4)
        legacy_urls.write.parquet(f"{sink}_processed")  # url-only manifest
        # an unmanifested staged dir from a crashed pre-commit run
        os.makedirs(os.path.join(sink, "_staging", "deadbeef"))
        rec = recover_sink(spark, sink)
        assert rec == {"rolled_forward": 0, "rolled_back": 1}
        m = run_resumable(spark, pages, sink)
        assert m["n_pending"] == 6  # 4 legacy urls honored, not reprocessed

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

    def test_crash_after_stage_rolls_back_no_duplicates(self, spark, sf_dir, tmp_path):
        """Crash BEFORE the manifest commit: the staged increment is
        invisible and must be rolled back on the next run; the batch
        reprocesses exactly once with no duplicate rows."""
        from qizner_spark.plans.checkpoint import SimulatedCrash

        pages = pages_from_documents(spark, sf_dir).limit(30)
        sink = str(tmp_path / "triples")
        with pytest.raises(SimulatedCrash):
            run_resumable(spark, pages, sink, crash_after="stage")
        # nothing committed: the sink has no readable data
        assert processed_keys(spark, sink) is None
        m = run_resumable(spark, pages, sink)
        assert m["rolled_back"] == 1 and m["rolled_forward"] == 0
        assert m["n_pending"] == 30
        sunk = spark.read.parquet(sink)
        assert sunk.count() == sunk.dropDuplicates(["url", "subj", "pred", "obj"]).count()
        # and a third run is a clean no-op
        assert run_resumable(spark, pages, sink)["n_pending"] == 0

    def test_crash_after_commit_rolls_forward_no_reprocess(self, spark, sf_dir, tmp_path):
        """Crash BETWEEN manifest commit and publish: the next run
        must finish the rename (roll forward) — no data loss, no
        duplicate, and crucially NO reprocessing (the manifest covers
        every url of the batch, zero-triple urls included)."""
        from qizner_spark.plans.checkpoint import SimulatedCrash

        pages = pages_from_documents(spark, sf_dir).limit(30)
        sink = str(tmp_path / "triples")
        with pytest.raises(SimulatedCrash):
            run_resumable(spark, pages, sink, crash_after="commit")
        m = run_resumable(spark, pages, sink)
        assert m["rolled_forward"] == 1 and m["rolled_back"] == 0
        assert m["n_pending"] == 0  # manifest already covered the batch
        sunk = spark.read.parquet(sink)
        assert sunk.count() > 0
        assert sunk.count() == sunk.dropDuplicates(["url", "subj", "pred", "obj"]).count()
        # parity with an uninterrupted run on the same input
        clean_sink = str(tmp_path / "clean")
        run_resumable(spark, pages, clean_sink)
        clean = spark.read.parquet(clean_sink)
        cols = ["url", "subj", "pred", "obj"]
        assert sunk.select(cols).exceptAll(clean.select(cols)).count() == 0
        assert clean.select(cols).exceptAll(sunk.select(cols)).count() == 0

    def test_empty_staging_dir_means_not_yet_written(self, spark, tmp_path):
        """A crash during the very FIRST append can leave the sink (or
        manifest) directory holding only _temporary: resume must treat
        that as 'nothing committed yet' (None), not raise
        UNABLE_TO_INFER_SCHEMA forever."""
        import os

        sink = str(tmp_path / "triples")
        os.makedirs(os.path.join(sink, "_temporary"))
        os.makedirs(f"{sink}_processed/_temporary")
        assert processed_keys(spark, sink) is None

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


class TestFilesystemSeam:
    """The commit protocol's metadata ops run through the fs seam:
    file:// URIs must behave identically to raw paths (the round-4
    ADVICE half-run bug), and the HadoopFS binding must pass the same
    crash scenarios against Hadoop's local filesystem."""

    def test_file_scheme_sink_round_trips(self, spark, sf_dir, tmp_path):
        """file:///x must publish at /x — before the seam, Spark wrote
        to /x but the publish rename targeted the literal 'file:///x',
        failing AFTER the manifest commit (lost increment)."""
        pages = pages_from_documents(spark, sf_dir).limit(10)
        raw = str(tmp_path / "triples")
        sink = "file://" + raw
        m1 = run_resumable(spark, pages, sink)
        assert m1["n_pending"] == 10
        # published (not stuck in _staging), readable at the raw path
        import os
        assert not os.path.isdir(os.path.join(raw, "_staging")) or \
            os.listdir(os.path.join(raw, "_staging")) == []
        assert spark.read.parquet(raw).count() == m1["n_new_triples"]
        # second run through the RAW path sees the same sink: noop
        m2 = run_resumable(spark, pages, raw)
        assert m2["n_pending"] == 0 and m2["resumed"]

    def test_hadoopfs_crash_after_stage_rolls_back(self, spark, sf_dir, tmp_path):
        from qizner_spark.plans.checkpoint import HadoopFS, SimulatedCrash

        pages = pages_from_documents(spark, sf_dir).limit(10)
        sink = str(tmp_path / "triples")
        fs = HadoopFS(spark, sink)
        import pytest as _pytest
        with _pytest.raises(SimulatedCrash):
            run_resumable(spark, pages, sink, crash_after="stage", fs=fs)
        m = run_resumable(spark, pages, sink, fs=fs)
        assert m["rolled_back"] == 1 and m["rolled_forward"] == 0
        assert m["n_pending"] == 10  # unmanifested stage reprocessed
        assert spark.read.parquet(sink).count() == m["n_new_triples"]

    def test_hadoopfs_crash_after_commit_rolls_forward(self, spark, sf_dir, tmp_path):
        from qizner_spark.plans.checkpoint import HadoopFS, SimulatedCrash

        pages = pages_from_documents(spark, sf_dir).limit(10)
        sink = str(tmp_path / "triples")
        fs = HadoopFS(spark, sink)
        import pytest as _pytest
        with _pytest.raises(SimulatedCrash):
            run_resumable(spark, pages, sink, crash_after="commit", fs=fs)
        m = run_resumable(spark, pages, sink, fs=fs)
        assert m["rolled_forward"] == 1 and m["rolled_back"] == 0
        assert m["n_pending"] == 0  # manifest committed -> no reprocess
        assert spark.read.parquet(sink).count() > 0

    def test_hadoopfs_and_localfs_interoperate(self, spark, sf_dir, tmp_path):
        """The two seams target the same store for local paths: an
        increment written through one resumes through the other."""
        from qizner_spark.plans.checkpoint import HadoopFS

        pages = pages_from_documents(spark, sf_dir).limit(10)
        sink = str(tmp_path / "triples")
        run_resumable(spark, pages, sink)  # LocalFS
        m = run_resumable(spark, pages, sink, fs=HadoopFS(spark, sink))
        assert m["n_pending"] == 0 and m["resumed"]


class TestPerPartitionLineage:
    """north_rule: 'lineage and throughput metrics logged per
    partition' — every increment appends one row per subj_bucket with
    its triple/source counts, keyed by run_id."""

    def test_resumable_logs_partition_lineage(self, spark, sf_dir, tmp_path):
        pages = pages_from_documents(spark, sf_dir)
        sink = str(tmp_path / "triples")
        mpath = str(tmp_path / "metrics")
        first, rest = pages.limit(15), pages
        m1 = run_resumable(spark, first, sink, metrics_path=mpath)
        m2 = run_resumable(spark, rest, sink, metrics_path=mpath)
        lineage = spark.read.json(f"{mpath}_partitions")
        assert set(lineage.columns) >= {
            "subj_bucket", "n_triples", "n_source_urls", "run_id", "ts"}
        runs = {r["run_id"] for r in lineage.select("run_id").distinct().collect()}
        assert runs == {m1["run_id"], m2["run_id"]}
        # lineage totals reconcile exactly with the run metrics
        from pyspark.sql import functions as F
        tot = {r["run_id"]: r["s"] for r in lineage.groupBy("run_id")
               .agg(F.sum("n_triples").alias("s")).collect()}
        assert tot[m1["run_id"]] == m1["n_new_triples"]
        assert tot[m2["run_id"]] == m2["n_new_triples"]
        # and with the published sink itself
        assert spark.read.parquet(sink).count() == sum(tot.values())

    def test_run_with_metrics_partition_breakdown(self, spark, sf_dir, tmp_path):
        from qizner_spark.plans.pipeline import run_with_metrics

        out = run_with_metrics(spark, pages_from_documents(spark, sf_dir).limit(20),
                               out_path=str(tmp_path / "t"))
        pp = spark.read.json(str(tmp_path / "t_metrics_partitions"))
        from pyspark.sql import functions as F
        assert pp.agg(F.sum("n_triples")).first()[0] == out["metrics"]["n_triples"]
        assert pp.where(F.col("n_source_urls") < 1).count() == 0


class TestStreamingDedup:
    """stream_dedup_pages: exact dedup within the watermark window,
    bounded state, exactly-once across restarts."""

    @staticmethod
    def _page_file(spark, path, rows, mtime=None):
        # one single parquet FILE (the streaming file source lists
        # plain files; nested dirs read as partition layout)
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] * 1_000_000 for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([None] * len(rows), pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        })
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(tbl, path)
        if mtime is not None:
            os.utime(path, (mtime, mtime))

    def test_cross_batch_dup_dropped_within_watermark(self, spark, tmp_path):
        from qizner_spark.streaming.pipeline import stream_dedup_pages

        B = 1_700_000_000
        in_dir = str(tmp_path / "in")
        # file 1: A, B. file 2 (separate micro-batch): dup of A's text
        # from a different url 10 min later (inside the 1 h watermark)
        # plus new C
        self._page_file(spark, f"{in_dir}/f1.parquet", [
            ("u/a", B, "alpha text"), ("u/b", B + 60, "beta text")], mtime=1_000_000)
        self._page_file(spark, f"{in_dir}/f2.parquet", [
            ("u/a2", B + 600, "alpha  text "),  # normalizes equal to A
            ("u/c", B + 700, "gamma text")], mtime=1_000_010)
        q = stream_dedup_pages(
            spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
            watermark="1 hour", max_files_per_trigger=1)
        q.awaitTermination(120)
        got = {(r["url"], r["text_key"]) for r in
               spark.read.parquet(str(tmp_path / "out")).collect()}
        urls = {u for u, _ in got}
        assert urls == {"u/a", "u/b", "u/c"}, urls  # u/a2 deduped cross-batch
        assert len({k for _, k in got}) == 3

    def test_restart_is_exactly_once(self, spark, tmp_path):
        from qizner_spark.streaming.pipeline import stream_dedup_pages

        B = 1_700_000_000
        in_dir = str(tmp_path / "in")
        self._page_file(spark, f"{in_dir}/f1.parquet", [
            ("u/a", B, "one"), ("u/b", B + 1, "two")])
        args = (spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"))
        stream_dedup_pages(*args).awaitTermination(120)
        n1 = spark.read.parquet(str(tmp_path / "out")).count()
        stream_dedup_pages(*args).awaitTermination(120)  # no new input
        assert spark.read.parquet(str(tmp_path / "out")).count() == n1 == 2
