"""Resume-from-checkpoint: skip work already committed to the sink.

The reference materializes segmented/sampled datasets and REUSES them
if present (/root/reference/data_reader.py:396-416) — the same
pattern at engine level: every batch run anti-joins its input against
the urls already committed, processes only the remainder, and
APPENDS. Restartable at any point; a url's triples land in the sink
at most once because the done-set is the UNION of the manifest and
the sink's own keys: if a crash lands between the data append and
the manifest append, the rerun sees those urls in the sink and skips
them (zero-triple urls, which never reach the sink, are reprocessed
— and again produce nothing, so the rerun is a no-op for them).
Spark's parquet job commit is atomic at job level (_temporary
staging), so each append is all-or-nothing. In production the sink
is an Iceberg table and the key set comes from the current snapshot.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.errors import AnalysisException


def _keys_if_exists(spark: SparkSession, path: str, key: str) -> DataFrame | None:
    """Distinct key column of a parquet path, or None ONLY when the
    path does not exist. Any other failure (corrupt footer, permission
    denied) re-raises: silently treating a broken manifest as missing
    would re-append every url's triples."""
    try:
        return spark.read.parquet(path).select(key).distinct()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        if "UNABLE_TO_INFER_SCHEMA" in str(e):
            # the directory exists but holds no committed parquet file
            # (e.g. a crash during the very FIRST append left only
            # _temporary): semantically "nothing written yet" — treat
            # as missing so resume stays possible. Corrupt footers
            # raise a different error class and still propagate.
            return None
        raise


def processed_keys(spark: SparkSession, sink_path: str, key: str = "url") -> DataFrame | None:
    """Keys already processed = manifest keys UNION sink keys.

    The manifest records documents that yielded zero triples; the
    sink itself covers the crash window where data committed but the
    manifest append did not. None when neither exists yet."""
    manifest = _keys_if_exists(spark, f"{sink_path}_processed", key)
    sink = _keys_if_exists(spark, sink_path, key)
    if manifest is None:
        return sink
    if sink is None:
        return manifest
    return manifest.union(sink).distinct()


def pending_only(pages: DataFrame, done: DataFrame | None, key: str = "url") -> DataFrame:
    """Anti-join the input against the committed key set."""
    if done is None:
        return pages
    return pages.join(done, key, "left_anti")


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    sink_path: str,
    metrics_path: str | None = None,
    **kg_kwargs,
) -> dict:
    """One resumable increment of the flagship pipeline:
    filter-to-pending -> build KG -> append triples -> log metrics.
    Crash/rerun safe: reprocessing is keyed off the sink itself."""
    from qizner_spark.plans.pipeline import build_kg

    done = processed_keys(spark, sink_path)
    todo = pending_only(pages, done)
    t0 = time.time()
    n_pending = todo.count()
    if n_pending == 0:
        metrics = {"n_pending": 0, "n_new_triples": 0, "wall_sec": round(time.time() - t0, 3),
                   "resumed": done is not None, "ts": int(time.time())}
    else:
        stages = build_kg(spark, todo, **kg_kwargs)
        triples = stages["triples"].withColumn(
            "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(64))
        ).persist()
        triples.write.mode("append").partitionBy("subj_bucket").parquet(sink_path)
        # manifest AFTER the data write: a crash between the two is
        # reconciled on rerun because processed_keys unions the sink's
        # own url column — already-appended urls are skipped, never
        # appended twice
        todo.select("url").distinct().write.mode("append").parquet(f"{sink_path}_processed")
        metrics = {
            "n_pending": n_pending,
            "n_new_triples": triples.count(),  # served from cache, no recompute
            "wall_sec": round(time.time() - t0, 3),
            "resumed": done is not None,
            "ts": int(time.time()),
        }
        triples.unpersist()
    if metrics_path:
        spark.createDataFrame([metrics]).write.mode("append").json(metrics_path)
    return metrics
