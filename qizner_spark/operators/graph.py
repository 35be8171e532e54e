"""Connected components over the co-mention graph (canonicalization).

Alternating large-star / small-star map-reduce rounds (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) implemented
with plain DataFrame ops — no GraphFrames dependency. Converges in
O(log n) rounds; each round is two shuffles.

Skew notes (explicit, per north_rule):
  * per-node neighborhood minima are SALTED two-phase aggregates: a
    hub entity with 10^8 neighbors splits into ``salt_buckets``
    deterministic sub-keys (pmod(xxhash64(dst))) before any single
    reducer sees it; the min is re-attached through a salt-replicated
    equi-join, so the hot node's rows spread over ``salt_buckets``
    partitions instead of one;
  * ``salt_buckets=1`` falls back to a window min (one shuffle, fine
    for moderate skew under AQE) — both paths return identical rows;
  * lineage is cut with localCheckpoint each round so the iterative
    plan doesn't snowball.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_SALT_BUCKETS = 16


def _with_neighborhood_min(df: DataFrame, salt_buckets: int) -> DataFrame:
    """Attach ``m`` = min(src, min(dst) over rows sharing src).

    salt_buckets > 1: explicit hub-key salting — phase 1 groups on
    (src, salt) so map-side combine + 'salt_buckets'-way split bound
    any reducer's share of a hub node; phase 2 folds the per-salt
    minima (tiny); the re-attach join keys on (src, salt) so the hub's
    edge rows also never land in one partition. Deterministic salt
    (hash of dst), no rand(): identical results across retries.
    """
    if salt_buckets <= 1:
        w = Window.partitionBy("src")
        return df.withColumn("m", F.least(F.col("src"), F.min("dst").over(w)))
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)))
    partial = salted.groupBy("src", "_salt").agg(F.min("dst").alias("_pm"))
    mins = partial.groupBy("src").agg(F.min("_pm").alias("_mn"))
    replicated = mins.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return (
        salted.join(replicated, ["src", "_salt"])
        .withColumn("m", F.least(F.col("src"), F.col("_mn")))
        .drop("_salt", "_mn")
    )


def _large_star(edges: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's minimum
    neighborhood label min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with_min = _with_neighborhood_min(sym, salt_buckets)
    return (
        with_min.where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Orient edges large->small, then connect every neighbor (and u
    itself) to the minimum label of the oriented neighborhood."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    with_min = _with_neighborhood_min(oriented, salt_buckets)
    nbr_edges = with_min.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edges = with_min.select(F.col("src"), F.col("m").alias("dst"))
    return (
        nbr_edges.union(self_edges)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-independent, overflow-free (ANSI mode safe)
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _union_find_local(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find with min-representative (exact same
    result as the distributed rounds)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in list(parent)}


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    src: str = "src",
    dst: str = "dst",
    driver_threshold: int = 200_000,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """(src, dst) edge list -> (node, component) where component is
    the lexicographically smallest node id in the component.

    Hybrid execution: the ENTITY graph is usually orders of magnitude
    smaller than the mention table (distinct canonical nodes), so when
    the distinct edge count fits under ``driver_threshold`` the
    components are solved with driver-side union-find in one pass —
    saving ~2 shuffles x O(log n) rounds. Larger graphs take the
    distributed large-star/small-star path. Nodes appearing only as
    isolated self-loops should be unioned in by the caller
    (:func:`assign_components` does this).
    """
    spark = edges.sparkSession
    cur = (
        edges.select(F.col(src).cast("string").alias("src"), F.col(dst).cast("string").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = cur.count()
    if n_edges == 0:
        return spark.createDataFrame([], "node string, component string")
    if n_edges <= driver_threshold:
        comp = _union_find_local([(r["src"], r["dst"]) for r in cur.collect()])
        return spark.createDataFrame(list(comp.items()), "node string, component string")
    prev_sig = None
    for _ in range(max_iterations):
        cur = _small_star(_large_star(cur, salt_buckets), salt_buckets).localCheckpoint()
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # At convergence every edge points node -> component root.
    roots = cur.select(F.col("dst").alias("node")).distinct().withColumn("component", F.col("node"))
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def assign_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "node",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """All nodes -> components; isolated nodes become their own
    component."""
    comp = connected_components(edges, salt_buckets=salt_buckets)
    return (
        nodes.select(F.col(node_col).cast("string").alias("node"))
        .distinct()
        .join(comp, "node", "left")
        .withColumn("component", F.coalesce("component", F.col("node")))
    )
