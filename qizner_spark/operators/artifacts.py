"""Model-artifact distribution (S9): ship scorer weights to every
worker once, load them once per worker.

The reference loads checkpoint weights from a local path into the
model before predict (/root/reference/train_ner.py:1042-1060). On a
cluster the artifact must reach every executor: ``sc.addFile`` ships
it through the file server exactly once per executor (the same
mechanism ``spark-submit --files`` uses); workers resolve it with
``SparkFiles.get``. Combined with the per-worker scorer singleton in
:mod:`qizner_spark.operators.mentions` (`_get_scorer` memoization),
the artifact is read from disk AT MOST ONCE per executor process —
the per-partition model-load pattern batched transformer inference
needs. For multi-GB weights on a real cluster, swap the file server
for an object store and keep the same factory shape.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import SparkSession


def distribute_artifact(spark: SparkSession, local_path: str) -> str:
    """Register a local artifact with the cluster file server; returns
    the name workers pass to ``SparkFiles.get``."""
    spark.sparkContext.addFile(local_path)
    return os.path.basename(local_path)


def artifact_scorer_factory(
    artifact_name: str, builder: Callable[[str], object]
) -> Callable[[], object]:
    """Factory for :func:`detect_mentions`: on the WORKER, resolve the
    distributed artifact path and build the scorer from it. The
    detection operator memoizes the result per worker, so ``builder``
    (the expensive weights load) runs once per executor process, not
    per batch."""

    def factory():
        from pyspark import SparkFiles

        return builder(SparkFiles.get(artifact_name))

    return factory
