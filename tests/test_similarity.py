"""Similarity-search tests: brute-force exactness + ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qizner_spark.operators.similarity import ann_topk, brute_force_topk, hyperplane_signature


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


class TestBruteForce:
    def test_topk_matches_numpy(self, spark, emb):
        k = 5
        queries = emb.orderBy("vec_id").limit(3)
        got = brute_force_topk(emb, queries, k=k).collect()
        rows = emb.collect()
        mat = np.array([r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])], dtype=np.float64)
        ids = np.array(sorted(r["vec_id"] for r in rows))
        norms = np.linalg.norm(mat, axis=1)
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["nbr_id"], r["cosine"]))
        for qid, items in by_q.items():
            qv = mat[list(ids).index(qid)]
            cos = mat @ qv / (norms * np.linalg.norm(qv))
            cos[list(ids).index(qid)] = -np.inf
            top = ids[np.argsort(-cos)][:k]
            got_ids = [n for _, n, _ in sorted(items)]
            assert got_ids == top.tolist()

    def test_k_rows_per_query(self, spark, emb):
        out = brute_force_topk(emb, emb.limit(4), k=7)
        counts = out.groupBy("query_id").count().collect()
        assert all(r["count"] == 7 for r in counts)


class TestAnn:
    def test_bucket_signature_deterministic(self, spark, emb):
        dim = 64
        s1 = {r["vec_id"]: r["bucket"] for r in hyperplane_signature(emb, dim).select("vec_id", "bucket").collect()}
        s2 = {r["vec_id"]: r["bucket"] for r in hyperplane_signature(emb, dim).select("vec_id", "bucket").collect()}
        assert s1 == s2
        assert all(0 <= b < 256 for b in s1.values())

    def test_ann_recall_vs_brute_force(self, spark, emb):
        queries = emb.orderBy("vec_id").limit(5)
        exact = brute_force_topk(emb, queries, k=5)
        # tiny SF corpus (~50 vectors): coarse buckets (4 planes = 16
        # buckets) + 1-bit multiprobe keep candidate sets meaningful
        approx = ann_topk(emb, queries, k=5, n_planes=4, multiprobe_bits=1)
        e = {(r["query_id"], r["nbr_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["nbr_id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.4

    def test_ann_subset_of_valid_scores(self, spark, emb):
        """ANN cosines must equal brute-force cosines for the same
        pairs (scoring is exact; only the candidate set is approximate)."""
        queries = emb.limit(3)
        exact = {(r["query_id"], r["nbr_id"]): r["cosine"]
                 for r in brute_force_topk(emb, queries, k=500).collect()}
        for r in ann_topk(emb, queries, k=5).collect():
            key = (r["query_id"], r["nbr_id"])
            assert key in exact and exact[key] == pytest.approx(r["cosine"], abs=1e-9)
