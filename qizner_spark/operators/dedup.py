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

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

MERSENNE = (1 << 61) - 1


_MD5_CACHE_MAX = 1_000_000


def _md5_int(s: str, n_hex: int, _cache: dict = {}) -> int:
    """Integer from the first ``n_hex`` md5 hex chars — the base hash
    for shingles/tokens. Chosen over crc32 because DuckDB computes the
    IDENTICAL value (CAST('0x' || substr(md5(s),1,n) AS BIGINT)), so
    every downstream signature is oracle-checkable.

    Worker-local memo: shingle/token frequencies are Zipfian in web
    text, so hot surfaces hash once per worker (cache cleared past
    _MD5_CACHE_MAX entries — bounded memory)."""
    key = (n_hex, s)
    v = _cache.get(key)
    if v is None:
        if len(_cache) >= _MD5_CACHE_MAX:
            _cache.clear()
        v = _cache[key] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:n_hex], 16)
    return v


def _md5_32(s: str) -> int:
    return _md5_int(s, 8)


def _md5_64_signed(s: str) -> int:
    """Signed 64-bit (two's complement) — DuckDB: hi/lo halves."""
    u = _md5_int(s, 16)
    return u - (1 << 64) if u >= (1 << 63) else u


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
    return np.fromiter((_md5_32(s) for s in shingles), dtype=np.int64)


def minhash_coeffs(num_hashes: int = 64, seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients. Bounded < 2^30 so a*h + b with a
    32-bit base hash stays < 2^62: exact in numpy int64 AND DuckDB
    BIGINT (no silent wraparound on either side)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 30, size=num_hashes).astype(np.int64)
    b = rng.randint(0, 1 << 30, size=num_hashes).astype(np.int64)
    return a, b


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text", seed: int = 13,
) -> DataFrame:
    """(doc_id, sig ARRAY<LONG>[num_hashes]) in one Arrow pass.
    Universal hashing (a*h + b) mod p over md5-prefix shingle hashes —
    deterministic across workers, runs, and engines."""
    a, b = minhash_coeffs(num_hashes, seed)
    schema = StructType([StructField("doc_id", LongType()), StructField("sig", ArrayType(LongType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                h = _shingle_hashes(text, k)  # [S]
                # [num_hashes, S] -> min over shingles. Per-doc small
                # matrices beat one batch-wide matrix here (round-6
                # measurement: a [H, batch-shingles] formulation costs
                # a >200 MB working set and loses cache residency for
                # zero arithmetic savings).
                m = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE
                sigs.append(m.min(axis=1).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, num_hashes: int | None = None
) -> DataFrame:
    """Band the signature, bucket within (band, band-hash): docs
    sharing any band become candidates — never a global cross join.

    Round-6 shape: ONE groupBy of the banded table into sorted
    per-bucket doc-id arrays, then native nested-slice pair
    enumeration — instead of the (band, bh) self-join, which
    exchanged the banded table TWICE (once per join side) and built a
    per-bucket hash table to produce the identical pair set.
    Enumeration from a sorted array with j > i IS the
    a.doc_id < b.doc_id join predicate, so the output is
    row-identical. Per-row memory is O(bucket size) (the tail slice),
    never O(bucket^2); the pair COUNT per bucket is the same k^2/2 in
    both forms — a mega-bucket means a mega-duplicate-cluster, which
    upstream exact dedup should collapse before LSH either way.

    Pass ``num_hashes`` to keep the plan fully lazy; inferring it
    runs a driver-side ``first()`` action mid-plan (fallback only)."""
    if num_hashes is None:
        num_hashes = int(signatures.select(F.size("sig").alias("n")).first()["n"])
    rows_per_band = num_hashes // bands
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
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("_ids"))
        .where(F.size("_ids") > 1)
    )
    return (
        buckets.select(F.posexplode("_ids").alias("_i", "id_a"), "_ids")
        .select(
            "id_a",
            F.explode(F.expr("slice(_ids, _i + 2, size(_ids))")).alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = 0.8, num_hashes: int = 64, bands: int = 16,
    k: int = 3, id_col: str = "doc_id", text_col: str = "text",
    persist_signatures: bool = True,
) -> DataFrame:
    """LSH candidates verified by the SIGNATURE Jaccard estimate
    (fraction of agreeing minhashes).

    The signature table is referenced THREE times (banding + both
    verification sides); without persistence each action re-runs the
    shingle/md5/minhash Arrow pass per reference. ``persist_signatures``
    materializes it once (MEMORY_AND_DISK) — the production analog is
    writing signatures to a staging table between phases, which is
    what a 100 TB pipeline does anyway.

    CACHE OWNERSHIP: the persisted lineage belongs to the CALLER.
    The result DataFrame's ``_qizner_persisted`` attribute holds the
    persisted signature handle — long-lived sessions (benches,
    notebooks) that call this repeatedly should
    ``df._qizner_persisted.unpersist()`` after materializing results,
    or pass ``persist_signatures=False``; otherwise cached blocks
    accumulate until LRU eviction pressure."""
    sigs = minhash_signatures(docs, num_hashes, k, id_col, text_col)
    if persist_signatures:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        # materialization barrier: the banding subtree and both
        # verification sides otherwise race concurrent stage futures
        # into the uncached relation and re-run the signature Arrow
        # pass per reference (same defect class as the KG pipeline's
        # round-6 barriers; cache population coordinates only after a
        # writer finishes a partition)
        sigs.count()
    cands = lsh_candidate_pairs(sigs, bands, num_hashes=num_hashes)
    sa = sigs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sig", "sig_a")
    sb = sigs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sig", "sig_b")
    out = (
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
    if persist_signatures:
        out._qizner_persisted = sigs  # caller owns the cached lineage
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over unigram token hashes (bit-majority vote),
    vectorized in numpy. Token hash = md5 64-bit prefix, identically
    computable in DuckDB (hi/lo hex halves), so signatures and pairs
    are oracle-checkable."""
    schema = StructType([StructField("doc_id", LongType()), StructField("simhash", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = text.split(" ")
                h64 = np.fromiter(
                    (_md5_64_signed(t) for t in toks), dtype=np.int64
                ).astype(np.uint64)  # two's complement view
                bits = (h64[:, None] >> bit_idx[None, :]) & np.uint64(1)  # [T, 64]
                votes = bits.sum(axis=0) * 2 >= len(toks)
                sig = int((votes.astype(np.uint64) << bit_idx).sum())
                out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)  # to signed long
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def simhash_chunk_bounds(max_hamming: int, n_bits: int = 64) -> list[tuple[int, int]]:
    """(shift, width) per blocking chunk. With ``max_hamming + 1``
    chunks, any pair within the distance shares >= 1 exact chunk
    (pigeonhole) — so blocking never drops a qualifying pair. The old
    fixed 4x16-bit scheme silently missed distances 4+."""
    if max_hamming >= n_bits:
        # distance >= n_bits admits EVERY pair (even bitwise
        # complements share no chunk) — no blocking scheme can cover
        # it; callers wanting all-pairs should not use LSH blocking
        raise ValueError(
            f"max_hamming={max_hamming} >= n_bits={n_bits}: pigeonhole "
            "blocking cannot guarantee recall; use an all-pairs join"
        )
    # floor of 2 keeps every chunk <= 32 bits (a 64-bit mask literal
    # overflows LONG); 2 chunks still block distance-0 pairs correctly
    n_chunks = max(min(max_hamming + 1, n_bits), 2)
    bounds = []
    for c in range(n_chunks):
        lo = c * n_bits // n_chunks
        hi = (c + 1) * n_bits // n_chunks
        bounds.append((lo, hi - lo))
    return bounds


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3,
                       persist_signatures: bool = True) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming. Blocking:
    ``max_hamming + 1`` bit-chunks — a qualifying pair shares at least
    one chunk exactly, so the bucketed join is lossless AND never a
    cross join. Output therefore equals the all-pairs filter.

    ``persist_signatures`` (default True) materializes the signature
    input once: the chunk self-join references it from BOTH sides, and
    without the persist each side re-runs the full signature Arrow
    pass (at 10^12 docs: the entire corpus hashed twice). Caller owns
    the cached lineage via the result's ``_qizner_persisted`` handle,
    mirroring minhash_dedup_pairs."""
    if persist_signatures:
        from pyspark import StorageLevel

        signatures = signatures.persist(StorageLevel.MEMORY_AND_DISK)
        signatures.count()  # barrier — see minhash_dedup_pairs
    chunk_exprs = ", ".join(
        f"named_struct('chunk', {c}, 'val', shiftright(simhash, {lo}) & {(1 << width) - 1}L)"
        for c, (lo, width) in enumerate(simhash_chunk_bounds(max_hamming))
    )
    chunked = signatures.select(
        "doc_id", "simhash",
        F.explode(F.expr(f"array({chunk_exprs})")).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    # bucket-grouped pair enumeration (round 6): same rewrite as
    # lsh_candidate_pairs — ONE exchange of the chunked table into
    # sorted per-bucket (doc_id, simhash) arrays, nested-slice pair
    # expansion, instead of the two-sided chunk self-join. Sorted
    # structs lead with doc_id, so j > i enumeration IS the
    # a.doc_id < b.doc_id predicate; rows are identical.
    buckets = (
        chunked.groupBy("chunk", "val")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("_ds"))
        .where(F.size("_ds") > 1)
    )
    out = (
        buckets.select(F.posexplode("_ds").alias("_i", "_a"), "_ds")
        .select(
            "_a", F.explode(F.expr("slice(_ds, _i + 2, size(_ds))")).alias("_b")
        )
        .select(
            F.col("_a.doc_id").alias("id_a"), F.col("_b.doc_id").alias("id_b"),
            F.bit_count(F.col("_a.simhash").bitwiseXOR(F.col("_b.simhash")))
            .cast("int").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    if persist_signatures:
        out._qizner_persisted = signatures  # caller owns the cached lineage
    return out


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, n_planes: int = 4, seed: int = 23, max_hamming: int = 1,
) -> DataFrame:
    """Pairs with cosine >= threshold, candidate-blocked by random
    hyperplane LSH: exact cosine is verified only for pairs whose
    sign-bit buckets are within Hamming distance ``max_hamming`` (the
    symmetric form of ann_topk's multiprobe). The join is an
    equi-join on the probe bucket, never a cross join — the 100 TB
    shape. True near-dups (cosine ~1) agree on every plane w.h.p.
    (recall ~1 at max_hamming=1, tests/test_recall.py); recall for
    BORDERLINE pairs grows with max_hamming at the measured
    candidate-fraction cost in BENCH/RECALL.md.

    Pass ``dim`` to keep the plan lazy (else a first() infers it)."""
    from qizner_spark.operators.similarity import (
        hyperplane_signature,
        probe_masks,
        with_norm,
    )

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    v = hyperplane_signature(
        with_norm(emb.select(F.col(id_col).alias("id"), vec_col), vec_col),
        dim, n_planes, "v", seed,
    ).select("id", "v", "norm", "bucket")
    # each row also probes its bit-flip buckets; pair (a, b) with
    # hamming(bucket_a, bucket_b) <= max_hamming meets on b's bucket
    probes = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(m))
        for m in probe_masks(n_planes, max_hamming)
    ]
    a = v.withColumn("probe", F.explode(F.array(*probes))).alias("a")
    b = v.alias("b")
    dot = "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    return (
        a.join(b, F.col("a.probe") == F.col("b.bucket"))
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.expr(dot) / (F.col("a.norm") * F.col("b.norm")))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round("cosine", 6).alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
    )
