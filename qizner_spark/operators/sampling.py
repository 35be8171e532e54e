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
    (sampled fraction computed from exact counts, like the reference's
    random.sample of the negative pool, datautils.py:2425-2433)."""
    tagged = df.withColumn("_pos", is_positive.cast("int"))
    counts = {r["_pos"]: r["n"] for r in tagged.groupBy("_pos").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_pos, n_neg = counts.get(1, 0), counts.get(0, 0)
    if n_neg == 0 or n_pos == 0:
        return tagged.drop("_pos")
    frac = min(ratio * n_pos / n_neg, 1.0)
    pos = tagged.where(F.col("_pos") == 1)
    neg = tagged.where(F.col("_pos") == 0).sample(fraction=frac, seed=seed)
    return pos.unionByName(neg).drop("_pos")
