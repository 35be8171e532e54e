"""Connected components over the co-mention graph (canonicalization).

Alternating large-star / small-star map-reduce rounds (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) implemented
with plain DataFrame ops — no GraphFrames dependency. Converges in
O(log n) rounds; each round is two shuffles.

Skew notes (explicit, per north_rule):
  * per-node neighborhood minima use WINDOW MIN (partitioned by node),
    never collect_set/collect_list — a hub entity with 10^8 neighbors
    would OOM an array but streams fine through a window aggregate;
  * AQE skew-join splitting handles the hub partitions on the shuffle;
  * lineage is cut with localCheckpoint each round so the iterative
    plan doesn't snowball.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's minimum
    neighborhood label min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    w = Window.partitionBy("src")
    with_min = sym.withColumn("m", F.least(F.col("src"), F.min("dst").over(w)))
    return (
        with_min.where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small, then connect every neighbor (and u
    itself) to the minimum label of the oriented neighborhood."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src")
    with_min = oriented.withColumn("m", F.least(F.col("src"), F.min("dst").over(w)))
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
        cur = _small_star(_large_star(cur)).localCheckpoint()
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # At convergence every edge points node -> component root.
    roots = cur.select(F.col("dst").alias("node")).distinct().withColumn("component", F.col("node"))
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def assign_components(nodes: DataFrame, edges: DataFrame, node_col: str = "node") -> DataFrame:
    """All nodes -> components; isolated nodes become their own
    component."""
    comp = connected_components(edges)
    return (
        nodes.select(F.col(node_col).cast("string").alias("node"))
        .distinct()
        .join(comp, "node", "left")
        .withColumn("component", F.coalesce("component", F.col("node")))
    )
