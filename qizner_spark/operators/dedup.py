"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design:
  * exact dedup is one hash groupBy on a normalized text key (no
    text column in the shuffle — only a 128-bit digest + id);
  * candidate generation (LSH band-bucket join / SimHash band join /
    hyperplane buckets) keeps pair enumeration within buckets, never
    a full cross join;
  * signatures are computed in ONE Arrow pass with numpy (vectorized
    crc32-seeded universal hashing — stable across workers, unlike
    Python ``hash``);
  * verification (exact Jaccard / cosine / Hamming) runs only on
    bucket-collision candidates.

The reference's near-dup doc merge is D7/combine_by_text
(/root/reference/datautils.py:2106-2123) and dedupe E7
(/root/reference/datautils.py:447-547) — exact-key forms; the fuzzy
family generalizes them for webtext training pipelines.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

MERSENNE = (1 << 61) - 1


def normalized_text(col: str = "text") -> F.Column:
    """Whitespace-collapsed, lower-cased canonical text key."""
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def exact_duplicate_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated normalized
    text with the canonical (min) id, member count and ids."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), normalized_text(text_col).alias("norm_text")
    ).withColumn("text_key", F.md5("norm_text"))
    return (
        keyed.groupBy("text_key")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def deduplicate_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per normalized text — the
    window-free form: groupBy + semi join back."""
    keyed = docs.withColumn("text_key", F.md5(normalized_text(text_col)))
    keep = keyed.groupBy("text_key").agg(F.min(F.col(id_col)).alias(id_col))
    return keyed.join(keep, ["text_key", id_col], "left_semi").drop("text_key")


# ---------------------------------------------------------------------------
# word shingles (native) + exact n-gram Jaccard
# ---------------------------------------------------------------------------

def word_shingles_col(text_col: str = "text", k: int = 3) -> F.Column:
    """k-word shingles as a native expression (no UDF): slide over the
    split token array."""
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(0, greatest(size(split({text_col}, ' ')) - {k}, 0)),"
        f"  i -> array_join(slice(split({text_col}, ' '), i + 1, {k}), ' ')))"
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """EXACT Jaccard over k-word shingles: explode -> self-join on
    shingle -> |A∩B| / (|A|+|B|-|A∩B|). Ground truth for the
    approximate variants; at 100 TB run it only on LSH candidates —
    here it doubles as the DuckDB-checkable oracle query."""
    sh = docs.select(F.col(id_col).alias("doc_id"), word_shingles_col(text_col, k).alias("sh"))
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split(" ")
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return np.fromiter((zlib.crc32(s.encode()) for s in shingles), dtype=np.int64)


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text", seed: int = 13,
) -> DataFrame:
    """(doc_id, sig ARRAY<LONG>[num_hashes]) in one Arrow pass.
    Universal hashing (a*h + b) mod p over crc32 shingle hashes —
    deterministic across workers and runs."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, MERSENNE, size=num_hashes, dtype=np.int64)
    schema = StructType([StructField("doc_id", LongType()), StructField("sig", ArrayType(LongType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                h = _shingle_hashes(text, k)  # [S]
                # [num_hashes, S] -> min over shingles
                m = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE
                sigs.append(m.min(axis=1).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signature, bucket-join within (band, band-hash):
    docs sharing any band become candidates. Native explode +
    self-join grouped per bucket — never a global cross join."""
    sig_len_row = signatures.select(F.size("sig").alias("n")).first()
    rows_per_band = int(sig_len_row["n"]) // bands
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'bh', xxhash64(array_join("
                f"slice(sig, b * {rows_per_band} + 1, {rows_per_band}), '_'))))"
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = 0.8, num_hashes: int = 64, bands: int = 16,
    k: int = 3, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """LSH candidates verified by the SIGNATURE Jaccard estimate
    (fraction of agreeing minhashes)."""
    sigs = minhash_signatures(docs, num_hashes, k, id_col, text_col)
    cands = lsh_candidate_pairs(sigs, bands)
    sa = sigs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sig", "sig_a")
    sb = sigs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sig", "sig_b")
    return (
        cands.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.expr(
                "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
            ) / F.size("sig_a"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over unigram token hashes (bit-majority vote),
    vectorized in numpy."""
    schema = StructType([StructField("doc_id", LongType()), StructField("simhash", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = text.split(" ")
                h32 = np.fromiter((zlib.crc32(t.encode()) for t in toks), dtype=np.uint64)
                h32b = np.fromiter((zlib.crc32(t.encode(), 0x9E3779B9) for t in toks), dtype=np.uint64)
                h64 = (h32 << np.uint64(32)) | h32b  # [T]
                bits = (h64[:, None] >> bit_idx[None, :]) & np.uint64(1)  # [T, 64]
                votes = bits.sum(axis=0) * 2 >= len(toks)
                sig = int((votes.astype(np.uint64) << bit_idx).sum())
                out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)  # to signed long
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming, blocked on
    16-bit chunks: any pair within distance 3 shares at least one of
    the 4 chunks exactly (pigeonhole), so the join stays bucketed."""
    chunked = signatures.select(
        "doc_id", "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> named_struct("
                "'chunk', c, 'val', (simhash >> (c * 16)) & 65535))"
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.val") == F.col("b.val")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine >= threshold. Native double-precision
    arithmetic (zip_with/aggregate) — at scale, pre-bucket with the
    similarity module's hyperplane LSH; here the join is on a single
    all-rows key only after norm pre-filtering."""
    dot = "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    v = emb.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn("norm", F.expr("sqrt(aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x))"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.expr(dot) / (F.col("a.norm") * F.col("b.norm")))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round("cosine", 6).alias("cosine"))
    )
