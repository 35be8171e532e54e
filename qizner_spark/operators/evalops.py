"""Exact-span evaluation as relational operators (E1/E3/E4/E7).

The reference's per-doc set arithmetic (datautils.py:2614-2777)
becomes a full-outer join of pred and gold mention tables on
(doc_key, ent_type, start, end) followed by one aggregation — the
scalable form: no per-doc python, mention tables shuffle once on the
join key, AQE handles hot documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EPS = 1e-10

def _prf_cols():
    return (
        (F.col("tp") / (F.col("tp") + F.col("fp") + F.lit(EPS))).alias("precision"),
        (F.col("tp") / (F.col("tp") + F.col("fn") + F.lit(EPS))).alias("recall"),
    )


def _with_f1(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "f1",
        (2.0 * F.col("precision") * F.col("recall"))
        / (F.col("precision") + F.col("recall") + F.lit(EPS)),
    )


def _match_flags(pred: DataFrame, gold: DataFrame, keys: list[str]) -> DataFrame:
    p = pred.select(*keys, "ent_type", "start", "end").dropDuplicates().withColumn("in_pred", F.lit(1))
    g = gold.select(*keys, "ent_type", "start", "end").dropDuplicates().withColumn("in_gold", F.lit(1))
    return p.join(g, on=keys + ["ent_type", "start", "end"], how="full_outer").select(
        *keys,
        "ent_type",
        F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
        F.coalesce("in_gold", F.lit(0)).alias("in_gold"),
    )


def _counts(flags: DataFrame, group: list[str]) -> DataFrame:
    agg = flags.groupBy(*group) if group else flags.groupBy()
    return agg.agg(
        F.sum(F.col("in_pred") * F.col("in_gold")).cast("double").alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_gold"))).cast("double").alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_gold")).cast("double").alias("fn"),
    )


def evaluate_mentions_df(
    pred: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Micro P/R/F1 over exact (type, start, end) matches — one row.
    Parity: datautils.py:2639-2702 (set semantics, epsilon 1e-10)."""
    keys = keys or ["doc_key"]
    counts = _counts(_match_flags(pred, gold, keys), [])
    return _with_f1(
        counts.select(
            "tp", "fp", "fn",
            (F.col("tp") + F.col("fp")).alias("num_preds"),
            (F.col("tp") + F.col("fn")).alias("num_golds"),
            *_prf_cols(),
        )
    )


def evaluate_mentions_by_type(
    pred: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Per-type breakdown (the reference's detail_stat)."""
    keys = keys or ["doc_key"]
    counts = _counts(_match_flags(pred, gold, keys), ["ent_type"])
    return _with_f1(
        counts.select(
            "ent_type", "tp", "fp", "fn",
            (F.col("tp") + F.col("fp")).alias("num_preds"),
            (F.col("tp") + F.col("fn")).alias("num_golds"),
            *_prf_cols(),
        )
    )


def aggregate_supertypes_df(per_type: DataFrame, type2super: dict[str, str]) -> DataFrame:
    """Re-aggregate a per-type counts table into super-categories via
    a broadcast mapping join (E3, datautils.py:3207-3231)."""
    spark = per_type.sparkSession
    mapping = spark.createDataFrame(
        [(k, v) for k, v in type2super.items()], ["ent_type", "super_type"]
    )
    joined = per_type.join(F.broadcast(mapping), "ent_type", "left").withColumn(
        "super_type", F.coalesce("super_type", "ent_type")
    )
    counts = joined.groupBy("super_type").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
        F.avg("f1").alias("macro_f1"),
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
    )
    return _with_f1(counts.select("super_type", "tp", "fp", "fn", *_prf_cols(),
                                  "macro_precision", "macro_recall", "macro_f1"))


def compare_runs_df(run1: DataFrame, run2: DataFrame, gold: DataFrame,
                    keys: list[str] | None = None) -> DataFrame:
    """Docs where run1 matches gold exactly but run2 does not (E4,
    datautils.py:2790-2815): per-doc aggregation of match flags."""
    keys = keys or ["doc_key"]

    def doc_ok(pred: DataFrame) -> DataFrame:
        flags = _match_flags(pred, gold, keys)
        return flags.groupBy(*keys).agg(
            (F.sum((F.col("in_pred") != F.col("in_gold")).cast("int")) == 0).alias("ok")
        )

    ok1 = doc_ok(run1).withColumnRenamed("ok", "run1_ok")
    ok2 = doc_ok(run2).withColumnRenamed("ok", "run2_ok")
    return (
        ok1.join(ok2, keys, "full_outer")
        .where(F.col("run1_ok") & ~F.coalesce("run2_ok", F.lit(False)))
        .select(*keys)
    )


def confusion_matrix_df(pred: DataFrame, gold: DataFrame,
                        keys: list[str] | None = None) -> DataFrame:
    """E6: confusion counts over BOUNDARY-exact matches — join pred
    and gold mentions on (doc, start, end) (type NOT in the key), then
    crosstab gold type vs predicted type. Unmatched golds count
    against 'O' predictions and vice versa (the reference's two-pointer
    alignment, datautils.py:2282-2306, relationally)."""
    keys = keys or ["doc_key"]
    p = pred.select(*keys, "start", "end", F.col("ent_type").alias("pred_type")).dropDuplicates()
    g = gold.select(*keys, "start", "end", F.col("ent_type").alias("gold_type")).dropDuplicates()
    j = p.join(g, keys + ["start", "end"], "full_outer").select(
        F.coalesce("gold_type", F.lit("O")).alias("gold_type"),
        F.coalesce("pred_type", F.lit("O")).alias("pred_type"),
    )
    return j.groupBy("gold_type", "pred_type").agg(F.count(F.lit(1)).alias("n"))


def mention_set_ops(a: DataFrame, b: DataFrame) -> dict[str, DataFrame]:
    """E7 diagnostics as native set operators."""
    cols = ["doc_key", "ent_type", "start", "end"]
    a_, b_ = a.select(cols).dropDuplicates(), b.select(cols).dropDuplicates()
    return {
        "intersect": a_.intersect(b_),
        "a_only": a_.exceptAll(b_),
        "b_only": b_.exceptAll(a_),
        "union": a_.union(b_).dropDuplicates(),
    }
