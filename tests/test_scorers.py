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

    @pytest.mark.parametrize(
        "interact", ["self_attn", "biaffine", "add_attn", "simple_concat", "complex_concat"]
    )
    def test_interactions_matrix_pairs_parity(self, interact):
        """M5/M6/M7 knob: for EVERY interact_type the gathered-pair
        view (fast predict) must equal the dense matrix elementwise,
        and the pruned scorer at -inf must reproduce dense decode."""
        from qizner_spark.core.scoring import span_indices

        dense = HashBiaffineScorer(ENTS, interact_type=interact)
        hs, he = dense.heads(TOKENS)
        full = dense.interaction.matrix(hs, he)  # [e,n,n]
        starts, ends = span_indices(len(TOKENS))
        gathered = dense.interaction.pairs(hs[:, starts, :], he[:, ends, :])  # [s,e]
        assert np.allclose(gathered, full[:, starts, ends].T, atol=1e-5)

        pruned = PrunedBiaffineScorer(ENTS, link_threshold=-math.inf, interact_type=interact)
        mat = dense.score_matrix(TOKENS)
        want = sorted(decode_sigmoid(mat, len(TOKENS), dict(enumerate(ENTS))))
        got = sorted(pruned.score_mentions(TOKENS))
        assert [(t, s, e) for t, s, e, _ in got] == [(t, s, e) for t, s, e, _ in want]
        assert np.allclose([m[3] for m in got], [m[3] for m in want], atol=1e-5)

    def test_interactions_differ_from_each_other(self):
        """The knob actually changes scores (no silent aliasing)."""
        mats = {}
        for it in ["self_attn", "biaffine", "add_attn", "simple_concat", "complex_concat"]:
            mats[it] = HashBiaffineScorer(ENTS, interact_type=it).score_matrix(TOKENS)
        kinds = list(mats)
        for i in range(len(kinds)):
            for j in range(i + 1, len(kinds)):
                assert not np.allclose(mats[kinds[i]], mats[kinds[j]])

    def test_unknown_interact_type_rejected(self):
        with pytest.raises(ValueError):
            HashBiaffineScorer(ENTS, interact_type="bogus")

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


class TestLongDocumentSegmentation:
    def test_mentions_beyond_first_segment(self, spark):
        """A 1200-token doc must segment (max 512) INSIDE the UDF and
        still emit document-global offsets — the in-worker D3+D5."""
        from qizner_spark.core.scoring import GazetteerScorer
        from qizner_spark.operators.mentions import detect_mentions

        text = " ".join((["pad"] * 99 + ["spark"]) * 12)  # spark at 99, 199, ...
        docs = spark.createDataFrame([(7, text)], ["doc_id", "text"])
        out = detect_mentions(
            docs, lambda: GazetteerScorer({"spark": "TECH"}, token_deli=" "),
            key_col="doc_id", text_col="text", lang_col=None,
            max_seg_len=512, flat=False,
        ).collect()
        starts = sorted(r["start"] for r in out)
        assert starts == [99 + 100 * i for i in range(12)]
        assert all(r["mention"] == "spark" for r in out)

    def test_prefix_context_does_not_duplicate(self, spark):
        from qizner_spark.core.scoring import GazetteerScorer
        from qizner_spark.operators.mentions import detect_mentions

        text = " ".join((["pad"] * 9 + ["spark"]) * 30)  # 300 tokens
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = detect_mentions(
            docs, lambda: GazetteerScorer({"spark": "TECH"}, token_deli=" "),
            key_col="doc_id", text_col="text", lang_col=None,
            max_seg_len=64, prefix_context_len=8, flat=False,
        ).collect()
        starts = sorted(r["start"] for r in out)
        # overlap regions re-detect the same span; dedupe must collapse
        assert starts == [9 + 10 * i for i in range(30)]


class TestSeqScorerProb:
    def test_prob_semantics(self):
        s = GazetteerSeqScorer({"spark": "TECH"})
        out = s.score_mentions(["use", "spark", "now"])
        assert [(m[0], m[1], m[2]) for m in out] == [("TECH", 1, 2)]
        # mean emission softmax prob of the decoded tag, rounded 4
        assert 0 < out[0][3] <= 1
        assert out[0][3] == round(out[0][3], 4)
