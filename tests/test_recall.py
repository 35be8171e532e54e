"""Recall gates for the approximate retrieval family (VERDICT r3 #5).

The oracles for ann_topk / embedding_near_dup verify the SPEC of the
approximation (DuckDB replays the same bucketing); these tests gate
its QUALITY against the exact baselines — the analog of the
reference's predict-vs-fast_predict quality sweep
(/root/reference/train_ner.py:1136-1191). Two regimes:

* near-orthogonal testdata embeddings (no planted structure — the
  hard case): recall >= 0.9 at probe depth 3, the configuration the
  ann_recall / near_dup_recall driver queries record. The measured
  recall-vs-candidate-fraction sweep lives in BENCH/RECALL.md.
* PLANTED near-duplicates (cosine ~1 — the regime the dedup operator
  exists for): recall ~1 at the cheap default depth 1, because true
  near-dups agree on every hyperplane w.h.p.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.01"


class TestTestdataRecall:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF001}/embeddings.parquet")

    def test_ann_recall_at_depth3_floor(self, spark, emb):
        from qizner_spark.operators.similarity import ann_topk, brute_force_topk

        queries = emb.where(F.col("vec_id") < 50)
        exact = brute_force_topk(emb, queries, k=10).select("query_id", "nbr_id")
        ann = ann_topk(emb, queries, k=10, n_planes=4, dim=64,
                       multiprobe_bits=3).select("query_id", "nbr_id")
        n_exact = exact.count()
        n_hits = exact.join(ann, ["query_id", "nbr_id"]).count()
        assert n_exact == 500  # 50 queries x k=10
        recall = n_hits / n_exact
        assert recall >= 0.9, f"ann recall@10 {recall:.3f} < 0.9 at depth 3"

    def test_near_dup_pair_recall_at_depth3_floor(self, spark, emb):
        from qizner_spark.operators.dedup import embedding_near_dup_pairs
        from qizner_spark.operators.similarity import exact_cosine_pairs

        exact = exact_cosine_pairs(emb, threshold=0.35).select("id_a", "id_b")
        cand = embedding_near_dup_pairs(
            emb, threshold=0.35, dim=64, n_planes=4, max_hamming=3
        ).select("id_a", "id_b")
        n_exact = exact.count()
        recall = exact.join(cand, ["id_a", "id_b"]).count() / n_exact
        assert recall >= 0.9, f"near-dup pair recall {recall:.3f} < 0.9 at depth 3"


class TestPlantedNearDupRecall:
    def test_planted_dups_found_at_cheap_depth1(self, spark):
        """50 base vectors, each with a planted near-duplicate
        (cosine > 0.99): ALL planted pairs must surface at the
        default max_hamming=1 — the cheap configuration IS the right
        one in the regime dedup targets."""
        rng = np.random.RandomState(7)
        base = rng.randn(50, 64)
        noisy = base + 0.02 * rng.randn(50, 64)  # cosine ~0.9998
        rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
        rows += [(100 + i, [float(x) for x in noisy[i]]) for i in range(50)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        from qizner_spark.operators.dedup import embedding_near_dup_pairs

        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=0.99, dim=64, n_planes=4, max_hamming=1
            ).collect()
        }
        planted = {(i, 100 + i) for i in range(50)}
        assert planted <= got, f"missed {sorted(planted - got)[:5]}..."


class TestClusteredRecall:
    """Recall floors on CLUSTERED embeddings (round-4 verdict #5):
    the near-orthogonal testdata is LSH's worst case, so the claim
    "real near-dup structure needs less probe depth" was previously
    only tested at cosine~1. This gates the MID tightness point
    (intra-cluster cosine ~0.85, 20 clusters x 25 members, dim 64)
    at probe depth 2 — one depth cheaper than the structureless gate.
    Full tightness x depth sweep: BENCH/RECALL.md."""

    @pytest.fixture(scope="class")
    def clustered(self, spark):
        from qizner_spark.sources.embeddings import clustered_embeddings

        return clustered_embeddings(spark, tightness=0.85).cache()

    def test_ann_recall_at_depth2_floor(self, spark, clustered):
        from qizner_spark.operators.similarity import ann_topk, brute_force_topk

        queries = clustered.where(F.col("vec_id") < 50)
        exact = brute_force_topk(clustered, queries, k=10).select("query_id", "nbr_id")
        ann = ann_topk(clustered, queries, k=10, n_planes=4, dim=64,
                       multiprobe_bits=2).select("query_id", "nbr_id")
        n_exact = exact.count()
        assert n_exact == 500
        recall = exact.join(ann, ["query_id", "nbr_id"]).count() / n_exact
        # numpy mirror measures 0.974 on this exact corpus (seed 11)
        assert recall >= 0.9, f"clustered ann recall@10 {recall:.3f} < 0.9 at depth 2"

    def test_near_dup_pair_recall_at_depth2_floor(self, spark, clustered):
        from qizner_spark.operators.dedup import embedding_near_dup_pairs
        from qizner_spark.operators.similarity import exact_cosine_pairs

        # threshold just under the intra-cluster cosine: true pairs
        # are overwhelmingly same-cluster members (~5.8k pairs)
        exact = exact_cosine_pairs(clustered, threshold=0.8).select("id_a", "id_b")
        cand = embedding_near_dup_pairs(
            clustered, threshold=0.8, dim=64, n_planes=4, max_hamming=2
        ).select("id_a", "id_b")
        n_exact = exact.count()
        assert n_exact > 1000  # the corpus really is clustered
        recall = exact.join(cand, ["id_a", "id_b"]).count() / n_exact
        # numpy mirror measures 0.987 on this exact corpus
        assert recall >= 0.9, f"clustered pair recall {recall:.3f} < 0.9 at depth 2"
