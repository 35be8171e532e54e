"""Reference-format NER corpus IO (JSONL / CoNLL columns / CLUENER).

The reference JSONL line shape (written by ``save_to_jsonl``):

    {"text": ..., "char_lst": [...],
     "ent_dct": {type: [[start, end_or_mention, ...], ...]},
     "pred_ent_dct": {type: [[start, end, prob, ...], ...]}}

A compact "val_at_end" encoding replaces the exclusive ``end`` with
the mention STRING (e.g. ``[2, "JAPAN"]``); the loader reconstructs
``end`` by extending until the deli-joined token slice reaches the
mention's character length.

Reference parity:
  * JSONL load + end reconstruction -> /root/reference/datautils.py:2038-2100
  * JSONL save (prob rounded 3)     -> /root/reference/datautils.py:2026-2036, 1529-1573
  * CoNLL column format             -> /root/reference/datautils.py:1981-2014
  * OntoNotes variant (digit2zero + bracket tokens)
                                    -> /root/reference/datautils.py:2968-3039
  * CLUENER nested label JSON       -> /root/reference/datautils.py:2950-2965
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField, StructType,
)

MENTION_STRUCT = StructType(
    [
        StructField("ent_type", StringType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
        StructField("prob", FloatType()),
    ]
)

CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("tokens", ArrayType(StringType())),
        StructField("token_deli", StringType()),
        StructField("entities", ArrayType(MENTION_STRUCT)),
        StructField("pred_entities", ArrayType(MENTION_STRUCT)),
    ]
)


def _reconstruct_end(tokens: list[str], start: int, mention: str, deli: str) -> int:
    """Greedy exclusive-end reconstruction for the compact encoding.
    Parity: datautils.py:2062-2069."""
    end = start
    while len(deli.join(tokens[start:end])) < len(mention) and end < len(tokens):
        end += 1
    return end


def _parse_positions(tokens: list[str], pos_lst: list, deli: str) -> list[tuple]:
    """One ent_dct position list -> (start, end, prob|None) tuples,
    handling compact ends, trailing mention-text echoes, and probs.
    Parity: datautils.py:2058-2091."""
    out = []
    for pos in pos_lst:
        pos = list(pos)
        start = int(pos[0])
        if isinstance(pos[1], str):
            end = _reconstruct_end(tokens, start, pos[1], deli)
            pos[1] = end
        end = int(pos[1])
        # strip trailing mention-text echo(es)
        while len(pos) > 2 and isinstance(pos[-1], str) and pos[-1] == deli.join(tokens[start:end]):
            pos.pop(-1)
        prob = float(pos[2]) if len(pos) > 2 and isinstance(pos[2], (int, float)) else None
        out.append((start, end, prob))
    return out


def _dedupe(entries: list[dict]) -> list[dict]:
    """Per-type (start, end) dedupe, first wins (datautils.py:1818-1829)."""
    seen = set()
    out = []
    for e in entries:
        key = (e["ent_type"], e["start"], e["end"])
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


def read_corpus_jsonl(
    spark: SparkSession, path: str, token_deli: str = "", dedup: bool = True
) -> DataFrame:
    """Reference-format JSONL -> corpus DataFrame (one row per doc).

    ``doc_id`` is the ordinal line position (reference ``eid``,
    datautils.py:2096-2097); golden eval corpora are small, so the file
    is read as ONE partition to preserve line order (webtext pages use
    url keys instead — no global ordinal needed at scale).
    """
    lines = spark.read.text(path).coalesce(1)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        eid = 0
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                if "char_lst" in obj:
                    tokens = obj["char_lst"]
                elif "text" in obj:
                    tokens = list(obj["text"]) if token_deli == "" else obj["text"].split(token_deli)
                else:
                    raise ValueError("need char_lst or text")
                if not tokens:
                    continue

                def to_entries(dct_key: str) -> list[dict] | None:
                    dct = obj.get(dct_key)
                    if dct is None:
                        return None
                    entries = []
                    for ent_type, pos_lst in dct.items():
                        for start, end, prob in _parse_positions(tokens, pos_lst, token_deli):
                            entries.append(
                                {"ent_type": ent_type, "start": start, "end": end, "prob": prob}
                            )
                    return entries

                entities = to_entries("ent_dct") or []
                if dedup:
                    entities = _dedupe(entities)
                rows.append(
                    {
                        "doc_id": eid,
                        "text": token_deli.join(tokens),
                        "tokens": tokens,
                        "token_deli": token_deli,
                        "entities": entities,
                        "pred_entities": to_entries("pred_ent_dct"),
                    }
                )
                eid += 1
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "tokens", "token_deli", "entities", "pred_entities"]
            )

    return lines.mapInPandas(parse, schema=CORPUS_SCHEMA)


def corpus_to_json_lines(df: DataFrame, compact: bool = False) -> DataFrame:
    """Corpus DataFrame -> one JSON string per doc in the reference
    line shape; probs rounded to 3 decimals (datautils.py:1557).
    Write with ``df.write.text`` (S2)."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                tokens = list(row["tokens"])
                deli = row["token_deli"]
                entities = row["entities"] if row["entities"] is not None else []
                ent_dct: dict[str, list] = {}
                for e in entities:
                    val: list = [int(e["start"])]
                    if compact:
                        val.append(deli.join(tokens[int(e["start"]): int(e["end"])]))
                    else:
                        val.append(int(e["end"]))
                    ent_dct.setdefault(e["ent_type"], []).append(val)
                obj = {"text": row["text"], "ent_dct": ent_dct, "char_lst": tokens}
                pred_entities = row["pred_entities"]
                if pred_entities is not None and len(pred_entities) > 0:
                    pred: dict[str, list] = {}
                    for e in pred_entities:
                        val = [int(e["start"]), int(e["end"])]
                        if e["prob"] is not None:
                            val.append(round(float(e["prob"]), 3))
                        pred.setdefault(e["ent_type"], []).append(val)
                    obj["pred_ent_dct"] = pred
                out.append(json.dumps(obj, ensure_ascii=False))
            yield pd.DataFrame({"value": out})

    return df.mapInPandas(render, schema=StructType([StructField("value", StringType())]))


# ---------------------------------------------------------------------------
# CoNLL column format (S3/S4) — Spark-native sentence assembly
# ---------------------------------------------------------------------------

def read_conll_columns(
    spark: SparkSession,
    path: str,
    deli: str = "\t",
    digit2zero: bool = False,
    normalize_brackets: bool = False,
) -> DataFrame:
    """``token<deli>tag`` lines, blank-line-separated sentences ->
    (doc_id, tokens, tags) via a running blank-line count window (the
    relational form of the reference's accumulation loop,
    datautils.py:1990-2014). Options mirror the OntoNotes variant
    (datautils.py:2968-3039): digit->0 and -LRB-/-RRB- style bracket
    token normalization."""
    from pyspark.sql.window import Window

    lines = (
        spark.read.text(path)
        .coalesce(1)  # golden corpora are small; order = file order
        .withColumn("line_no", F.monotonically_increasing_id())
    )
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines = lines.withColumn("is_blank", (F.trim(F.col("value")) == "").cast("int"))
    lines = lines.withColumn("sent_id", F.sum("is_blank").over(w))

    tok = F.split(F.col("value"), deli).getItem(0)
    if normalize_brackets:
        mapping = {
            "-LRB-": "(", "-RRB-": ")", "-LSB-": "[", "-RSB-": "]", "-LCB-": "{", "-RCB-": "}",
        }
        expr = tok
        for k, v in mapping.items():
            expr = F.when(tok == k, F.lit(v)).otherwise(expr)
        tok = expr
    if digit2zero:
        tok = F.regexp_replace(tok, r"\d", "0")

    rows = (
        lines.where(F.col("is_blank") == 0)
        .select(
            "sent_id",
            F.struct(F.col("line_no"), tok.alias("token"),
                     F.split(F.col("value"), deli).getItem(1).alias("tag")).alias("cell"),
        )
        .groupBy("sent_id")
        .agg(F.sort_array(F.collect_list("cell")).alias("cells"))
        .select(
            F.col("sent_id").alias("doc_id"),
            F.col("cells.token").alias("tokens"),
            F.col("cells.tag").alias("tags"),
        )
        .where(F.size("tokens") > 0)
    )
    return rows


def conll_tags_to_entities(df: DataFrame, schema: str = "IOB") -> DataFrame:
    """Add an ``entities`` column decoded from BIO/IO ``tags`` (the
    reference builds examples via from_tag_lst, datautils.py:2007)."""
    from qizner_spark.core.labels import bio_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ents = [
                [
                    {"ent_type": t, "start": s, "end": e, "prob": None}
                    for t, s, e in bio_decode(list(tags), schema=schema)
                ]
                for tags in pdf["tags"]
            ]
            pdf = pdf.copy()
            pdf["entities"] = ents
            yield pdf

    out_schema = StructType(df.schema.fields + [StructField("entities", ArrayType(MENTION_STRUCT))])
    return df.mapInPandas(decode, schema=out_schema)


# ---------------------------------------------------------------------------
# CLUENER format (S5) — fully native
# ---------------------------------------------------------------------------

CLUENER_LABEL_TYPE = "map<string, map<string, array<array<int>>>>"


def read_cluener(spark: SparkSession, path: str) -> DataFrame:
    """CLUENER ``{"text", "label": {type: {mention: [[s, e_closed]]}}}``
    -> corpus rows; CLOSED ends converted to exclusive (+1).
    Parity: datautils.py:2950-2965. Native from_json/explode plan —
    no python in the row path."""
    raw = spark.read.text(path).coalesce(1).withColumn("doc_id", F.monotonically_increasing_id())
    parsed = raw.select(
        "doc_id",
        F.get_json_object("value", "$.text").alias("text"),
        F.from_json(F.get_json_object("value", "$.label"), CLUENER_LABEL_TYPE).alias("label"),
    )
    mentions = (
        parsed.select("doc_id", F.explode_outer("label").alias("ent_type", "by_mention"))
        .select("doc_id", "ent_type", F.explode_outer("by_mention").alias("mention", "spans"))
        .select("doc_id", "ent_type", F.explode_outer("spans").alias("span"))
        .where(F.col("span").isNotNull())
        .select(
            "doc_id",
            F.struct(
                F.col("ent_type"),
                F.col("span").getItem(0).cast("int").alias("start"),
                (F.col("span").getItem(1) + F.lit(1)).cast("int").alias("end"),
                F.lit(None).cast("float").alias("prob"),
            ).alias("entity"),
        )
    )
    ents = mentions.groupBy("doc_id").agg(F.collect_list("entity").alias("entities"))
    return (
        parsed.join(ents, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            F.split(F.col("text"), "").alias("tokens"),
            F.lit("").alias("token_deli"),
            F.coalesce("entities", F.array().cast(ArrayType(MENTION_STRUCT))).alias("entities"),
            F.lit(None).cast(ArrayType(MENTION_STRUCT)).alias("pred_entities"),
        )
    )
