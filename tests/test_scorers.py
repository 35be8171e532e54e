"""Dense vs pruned scorer parity (O1/M17) + dense path through the
detection operator."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from qizner_spark.core.scoring import (
    GazetteerSeqScorer,
    HashBiaffineScorer,
    PrunedBiaffineScorer,
    pseudo_prob,
    stable_hash,
)
from qizner_spark.core.spans import decode_sigmoid, num_spans

ENTS = ["A", "B", "C"]
TOKENS = "the quick brown fox jumps over the lazy dog".split()


class TestHashBiaffine:
    def test_matrix_shape_and_range(self):
        s = HashBiaffineScorer(ENTS)
        mat = s.score_matrix(TOKENS)
        assert mat.shape == (num_spans(len(TOKENS)), len(ENTS))
        assert (mat > 0).all() and (mat < 1).all()

    def test_deterministic_across_instances(self):
        a = HashBiaffineScorer(ENTS).score_matrix(TOKENS)
        b = HashBiaffineScorer(ENTS).score_matrix(TOKENS)
        assert np.allclose(a, b)

    def test_stable_hash_is_stable(self):
        assert stable_hash("spark") == stable_hash("spark")
        assert 0.5 <= pseudo_prob("spark") < 1.0


class TestPrunedVsDense:
    def test_no_threshold_equals_dense(self):
        dense = HashBiaffineScorer(ENTS)
        pruned = PrunedBiaffineScorer(ENTS, link_threshold=-math.inf)
        mat = dense.score_matrix(TOKENS)
        want = sorted(decode_sigmoid(mat, len(TOKENS), dict(enumerate(ENTS))))
        got = sorted(pruned.score_mentions(TOKENS))
        assert [(t, s, e) for t, s, e, _ in got] == [(t, s, e) for t, s, e, _ in want]
        assert np.allclose([m[3] for m in got], [m[3] for m in want])

    def test_pruned_is_subset(self):
        dense = HashBiaffineScorer(ENTS)
        pruned = PrunedBiaffineScorer(ENTS, link_threshold=0.0)
        mat = dense.score_matrix(TOKENS)
        full = {(t, s, e) for t, s, e, _ in decode_sigmoid(mat, len(TOKENS), dict(enumerate(ENTS)))}
        sub = {(t, s, e) for t, s, e, _ in pruned.score_mentions(TOKENS)}
        assert sub <= full
        # unit spans always survive pruning, so sub is not empty if
        # any unit span scored above threshold
        unit_full = {m for m in full if m[2] - m[1] == 1}
        assert unit_full <= sub or not unit_full


class TestDensePathThroughOperator:
    def test_detect_mentions_dense(self, spark):
        from qizner_spark.operators.mentions import detect_mentions

        docs = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "spark shuffles data fast")],
            ["doc_id", "text"],
        )
        out = detect_mentions(
            docs, lambda: HashBiaffineScorer(ENTS), key_col="doc_id",
            text_col="text", lang_col=None, flat=True, threshold=0.5,
        )
        rows = out.collect()
        assert all(r["ent_type"] in ENTS for r in rows)
        assert all(0.5 <= r["prob"] <= 1.0 for r in rows)
        # flat=True guarantees no overlapping mentions per doc
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_key"], []).append((r["start"], r["end"]))
        for spans in by_doc.values():
            spans.sort()
            for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
                assert e1 <= s2


class TestSeqScorerProb:
    def test_prob_semantics(self):
        s = GazetteerSeqScorer({"spark": "TECH"})
        out = s.score_mentions(["use", "spark", "now"])
        assert [(m[0], m[1], m[2]) for m in out] == [("TECH", 1, 2)]
        # mean emission softmax prob of the decoded tag, rounded 4
        assert 0 < out[0][3] <= 1
        assert out[0][3] == round(out[0][3], 4)
