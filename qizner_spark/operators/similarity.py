"""Similarity search over embedding columns (ARRAY<FLOAT>).

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, dot products in native
  zip_with/aggregate expressions (JVM-side, codegen), per-query top-k
  via window rank. The baseline.
* :func:`ann_topk` — LSH-bucketed approximate variant: random
  hyperplane sign signatures put vectors into buckets; candidates are
  scored only within colliding buckets (multi-probe over single-bit
  flips covers neighbors across a plane boundary). The 100 TB path:
  bucket-join instead of cross-join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _as_double(vec_col: str) -> str:
    return f"transform({vec_col}, x -> cast(x as double))"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("v", F.expr(_as_double(vec_col))).withColumn(
        "norm", F.expr("sqrt(aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x))")
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast —
    the corpus never shuffles; ties broken by neighbor id for
    determinism."""
    c = with_norm(corpus.select(F.col(id_col).alias("nbr_id"), vec_col), vec_col) \
        .select("nbr_id", F.col("v").alias("cv"), F.col("norm").alias("cn"))
    q = with_norm(queries.select(F.col(query_id_col).alias("query_id"), vec_col), vec_col) \
        .select("query_id", F.col("v").alias("qv"), F.col("norm").alias("qn"))
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("nbr_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(dot) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def exact_cosine_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id",
    vec_col: str = "embedding", max_broadcast_rows: int = 100_000,
) -> DataFrame:
    """ALL pairs with cosine >= threshold, computed exactly by
    broadcasting one side — the ground-truth twin of
    :func:`brute_force_topk`, used as the RECALL oracle for the
    LSH-bucketed candidate rules (embedding_near_dup / ann_topk).
    Deliberately O(n^2): measurement-only at bounded n (asserted),
    never a scale path."""
    n = emb.count()
    if n > max_broadcast_rows:
        raise ValueError(
            f"exact_cosine_pairs is a recall-measurement baseline; {n} rows "
            f"> {max_broadcast_rows} would broadcast an unbounded side"
        )
    a = with_norm(emb.select(F.col(id_col).alias("id_a"), vec_col), vec_col) \
        .select("id_a", F.col("v").alias("av"), F.col("norm").alias("an"))
    b = with_norm(emb.select(F.col(id_col).alias("id_b"), vec_col), vec_col) \
        .select("id_b", F.col("v").alias("bv"), F.col("norm").alias("bn"))
    dot = "aggregate(zip_with(av, bv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    return (
        a.join(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.expr(dot) / (F.col("an") * F.col("bn")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def hyperplane_signature(df: DataFrame, dim: int, n_planes: int = 8,
                         vec_col: str = "embedding", seed: int = 23) -> DataFrame:
    """Sign-bit LSH signature as a NATIVE expression: the seeded
    hyperplane matrix is inlined as array literals, the dot products
    run in codegen. Adds ``bucket`` (int in [0, 2^n_planes))."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    terms = []
    for p in range(n_planes):
        arr = ", ".join(f"{x!r}D" for x in planes[p])
        dot = (
            f"aggregate(zip_with({_as_double(vec_col)}, array({arr}), (x, y) -> x * y),"
            f" 0D, (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return df.withColumn("bucket", F.expr(" + ".join(terms)).cast("int"))


def probe_masks(n_planes: int, bits: int) -> list[int]:
    """All non-zero XOR masks with popcount <= bits: the query visits
    every bucket within Hamming distance ``bits`` of its own."""
    from itertools import combinations

    masks = []
    for b in range(1, bits + 1):
        for idxs in combinations(range(n_planes), b):
            m = 0
            for i in idxs:
                m |= 1 << i
            masks.append(m)
    return masks


def ann_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, n_planes: int = 6,
    multiprobe_bits: int = 1, id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "vec_id", seed: int = 23, dim: int | None = None,
    broadcast_queries: bool | int = False,
) -> DataFrame:
    """Approximate top-k: score only candidates within Hamming
    distance ``multiprobe_bits`` of the query's LSH bucket. Recall
    grows with multiprobe_bits (and falls with n_planes); the scored
    pair count drops from |Q|x|C| to bucket-local. The measured
    recall/scan-fraction tradeoff on near-orthogonal embeddings is
    recorded in BENCH/RECALL.md and gated by the ``ann_recall``
    driver query + tests/test_recall.py.

    Pass ``dim`` to keep the plan fully lazy (else a driver-side
    first() action infers it mid-plan).

    ``broadcast_queries`` guards the query side of the bucket join —
    the side the multiprobe explode multiplies by
    ``1 + |probe_masks(n_planes, multiprobe_bits)|`` rows BEFORE the
    join, so "my query set is small" is off by that factor:

    * ``False`` (default) — UNHINTED equi-join: AQE's runtime size
      statistics broadcast the exploded query side exactly when it is
      genuinely under spark.sql.autoBroadcastJoinThreshold. The safe
      choice for self-ANN (queries = corpus, the natural 100-TB dedup
      shape), where a forced broadcast is an OOM.
    * ``True`` — force the hint. Only when the caller KNOWS the query
      set is bounded-small (a fixed probe list, a user search batch).
    * ``int n`` — size-guarded hint: counts the query set (one cheap
      action on the un-exploded side) and applies the hint only when
      ``n_queries * (1 + |probe_masks|) <= n``, else falls back to
      the unhinted join. For callers that take arbitrary query sets
      but want the broadcast fast path when it is actually safe.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = hyperplane_signature(
        with_norm(corpus.select(F.col(id_col).alias("nbr_id"), vec_col), vec_col), dim,
        n_planes, vec_col, seed,
    ).select("nbr_id", F.col("v").alias("cv"), F.col("norm").alias("cn"), "bucket")
    q = hyperplane_signature(
        with_norm(queries.select(F.col(query_id_col).alias("query_id"), vec_col), vec_col), dim,
        n_planes, vec_col, seed,
    ).select("query_id", F.col("v").alias("qv"), F.col("norm").alias("qn"), "bucket")
    # multi-probe: query also visits buckets at Hamming distance <= bits
    probes = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(m))
        for m in probe_masks(n_planes, multiprobe_bits)
    ]
    explode_factor = 1 + len(probe_masks(n_planes, multiprobe_bits))
    if broadcast_queries is True:
        hint = True
    elif broadcast_queries is False:
        hint = False
    else:
        hint = queries.count() * explode_factor <= int(broadcast_queries)
    q = q.withColumn("probe", F.explode(F.array(*probes)))
    q_side = F.broadcast(q) if hint else q
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    scored = (
        c.join(q_side, c["bucket"] == q_side["probe"])
        .where(F.col("nbr_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(dot) / (F.col("qn") * F.col("cn")))
        .dropDuplicates(["query_id", "nbr_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
