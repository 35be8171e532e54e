"""Entity linking: alias-dictionary build (E5) + broadcast-join link.

The reference builds mention<->entity-type frequency maps in memory
(count_entity_mention, /root/reference/datautils.py:2348-2414); at
scale that dictionary is exactly the small dimension table the KG
linking stage BROADCASTS against the big mentions table — the
in-memory dict lookup becomes a broadcast hash join (no shuffle of
the mention side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def build_alias_dictionary(mentions: DataFrame) -> DataFrame:
    """Long-form mentions -> (mention, ent_type, entity_id, freq).

    Frequency counting per (surface, type) = the reference
    mention_to_entity map; ``entity_id`` is a deterministic KB slug.
    One groupBy; map-side partial aggregation applies.
    """
    return (
        mentions.groupBy("mention", "ent_type")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "entity_id",
            F.concat(F.lit("kb:"), F.col("ent_type"), F.lit(":"),
                     F.regexp_replace(F.lower(F.col("mention")), r"\s+", "_")),
        )
        .select("mention", "ent_type", "entity_id", "freq")
    )


def count_unlabeled_occurrences(docs: DataFrame, alias: DataFrame,
                                text_col: str = "text") -> DataFrame:
    """For each dictionary surface, how often it occurs in the corpus
    text OUTSIDE labeled mentions: total substring occurrences minus
    labeled count (the reference's 没有标注 counter,
    datautils.py:2390-2404). The dictionary is broadcast to a pandas
    UDF; counts aggregate map-side."""
    surfaces = [r["mention"] for r in alias.select("mention").distinct().collect()]
    b = docs.sparkSession.sparkContext.broadcast(surfaces)
    schema = StructType([StructField("mention", StringType()), StructField("occurrences", LongType())])

    def count_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        local = Counter()
        for pdf in batches:
            for text in pdf[text_col]:
                for s in b.value:
                    c = text.count(s)
                    if c:
                        local[s] += c
        yield pd.DataFrame(
            {"mention": list(local.keys()), "occurrences": list(local.values())}
        )

    totals = docs.select(text_col).mapInPandas(count_batch, schema=schema) \
        .groupBy("mention").agg(F.sum("occurrences").alias("total_occurrences"))
    labeled = alias.groupBy("mention").agg(F.sum("freq").alias("labeled"))
    return (
        labeled.join(totals, "mention", "left")
        .select(
            "mention",
            F.coalesce("total_occurrences", F.lit(0)).alias("total_occurrences"),
            "labeled",
            (F.coalesce("total_occurrences", F.lit(0)) - F.col("labeled")).alias("unlabeled"),
        )
    )


def link_mentions(mentions: DataFrame, alias: DataFrame) -> DataFrame:
    """Attach ``entity_id`` to every mention row via a broadcast join
    on (mention, ent_type). Ambiguous surfaces resolve to the highest
    frequency entry (the alias dim is reduced BEFORE broadcasting, so
    the mention side never shuffles). Unlinked mentions fall back to a
    deterministic self-canonical id."""
    best = (
        alias.groupBy("mention", "ent_type")
        .agg(F.max_by("entity_id", "freq").alias("entity_id"))
    )
    return (
        mentions.join(F.broadcast(best), ["mention", "ent_type"], "left")
        .withColumn(
            "entity_id",
            F.coalesce(
                "entity_id",
                F.concat(F.lit("kb:"), F.col("ent_type"), F.lit(":"),
                         F.regexp_replace(F.lower(F.col("mention")), r"\s+", "_")),
            ),
        )
    )
