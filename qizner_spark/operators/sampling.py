"""Dataset shaping: splits, K-fold, stratified negative sampling.

Reference parity:
  * ratio split / KFold -> /root/reference/datautils.py:388-424,
    /root/reference/train_ner.py:1031-1067
  * negative sampling (all positives + ratio x |pos| negatives)
    -> /root/reference/datautils.py:2416-2436
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ratio_split(df: DataFrame, weights: list[float], seed: int = 42) -> list[DataFrame]:
    """Seeded train/dev/test split (P3) — Spark's randomSplit."""
    return df.randomSplit(weights, seed=seed)


def kfold(df: DataFrame, k: int, key_col: str, fold: int) -> tuple[DataFrame, DataFrame]:
    """Deterministic K-fold by hashed key: (train, heldout) for one
    fold. Hash-mod instead of sklearn's index KFold so the assignment
    is stable under any row order/partitioning (P3 at scale)."""
    fold_col = F.pmod(F.xxhash64(F.col(key_col)), F.lit(k))
    with_fold = df.withColumn("_fold", fold_col)
    train = with_fold.where(F.col("_fold") != fold).drop("_fold")
    heldout = with_fold.where(F.col("_fold") == fold).drop("_fold")
    return train, heldout


def negative_sample(
    df: DataFrame, is_positive: F.Column, ratio: float = 1.0, seed: int = 42
) -> DataFrame:
    """P1: keep ALL positives + ~ratio x |positives| random negatives
    (fraction from exact counts, like the reference's random.sample of
    the negative pool, datautils.py:2425-2433).

    Fully LAZY plan: the class counts are a 1-row aggregate broadcast
    back via crossJoin instead of a driver-side collect, so the
    operator composes into larger plans without forcing an action
    (the scan runs twice — counts + filter — exactly like the eager
    version, but scheduling stays with Catalyst)."""
    tagged = df.withColumn("_pos", is_positive.cast("int"))
    counts = tagged.groupBy().agg(
        F.sum("_pos").alias("_n_pos"),
        F.sum(1 - F.col("_pos")).alias("_n_neg"),
    )
    frac = F.least(F.lit(ratio) * F.col("_n_pos") / F.col("_n_neg"), F.lit(1.0))
    keep = (
        (F.col("_pos") == 1)
        | (F.col("_n_neg") == 0) | (F.col("_n_pos") == 0)  # degenerate: keep all
        | (F.rand(seed) < frac)
    )
    return (
        tagged.crossJoin(F.broadcast(counts))
        .where(keep)
        .drop("_pos", "_n_pos", "_n_neg")
    )
