"""Deterministic synthetic embedding corpora for recall measurement.

The testdata embeddings are near-orthogonal random vectors — the
worst case for LSH and NOT the regime near-dup detection exists for.
These generators produce CLUSTERED corpora with a controlled
intra-cluster cosine, so the recall/cost tradeoff of the bucketed
retrieval family (ann_topk, embedding_near_dup_pairs) can be
measured where it matters: on data with actual neighbor structure
(BENCH/RECALL.md sweep; floors gated in tests/test_recall.py).

Tightness math: each member is ``c + s * g`` with ``c`` a unit-norm
cluster center and ``g`` iid standard normal. The expected cosine
between two members of the same cluster is ``1 / (1 + s^2 * dim)``,
so ``s = sqrt((1/t - 1) / dim)`` yields intra-cluster cosine ``~t``
(empirically within ±0.01 at dim 64).

Deterministic by construction (seeded RandomState, no ambient
randomness) — the bench sweep and the pytest gates see the identical
corpus.
"""

from __future__ import annotations

import numpy as np


def clustered_embedding_matrix(
    n_clusters: int = 20, per_cluster: int = 25, dim: int = 64,
    tightness: float = 0.85, seed: int = 11,
) -> np.ndarray:
    """(n_clusters * per_cluster, dim) float64 matrix; rows are
    grouped by cluster (row i belongs to cluster i // per_cluster)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    s = float(np.sqrt((1.0 / tightness - 1.0) / dim))
    blocks = [c + s * rng.randn(per_cluster, dim) for c in centers]
    return np.vstack(blocks)


def clustered_embeddings(
    spark, n_clusters: int = 20, per_cluster: int = 25, dim: int = 64,
    tightness: float = 0.85, seed: int = 11,
):
    """The same corpus as a DataFrame (vec_id, cluster_id,
    embedding ARRAY<DOUBLE>) — the shape the retrieval operators
    consume."""
    X = clustered_embedding_matrix(n_clusters, per_cluster, dim, tightness, seed)
    rows = [
        (i, i // per_cluster, [float(x) for x in X[i]])
        for i in range(X.shape[0])
    ]
    return spark.createDataFrame(
        rows, "vec_id long, cluster_id long, embedding array<double>"
    )
