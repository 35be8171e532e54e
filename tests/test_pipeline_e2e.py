"""End-to-end: gold-replay perfect F1 on REAL reference eval sets +
the full KG DAG over the synthetic pages table.

The gold-replay test operationalizes BASELINE.md's "P/R >= 0.95 vs
reference" without torch: the learned scorer is pluggable, and the
deterministic decode/segment/merge/eval machinery (which defines the
emitted spans) must reproduce gold EXACTLY when fed gold scores
(SURVEY.md §5)."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import REFERENCE_CORPORA
from qizner_spark.core.scoring import GoldReplayScorer
from qizner_spark.operators.evalops import (
    evaluate_mentions_by_type,
    evaluate_mentions_df,
)
from qizner_spark.operators.mentions import detect_mentions
from qizner_spark.plans.pipeline import build_kg_from_sf_dir, run_with_metrics
from qizner_spark.sources.corpus import read_corpus_jsonl
from qizner_spark.sources.pages import pages_from_documents

needs_ref = pytest.mark.skipif(
    not os.path.exists(f"{REFERENCE_CORPORA}/conll03/test.jsonl"),
    reason="reference corpora not available",
)


def gold_df(corpus):
    return corpus.select(
        F.col("doc_id").cast("string").alias("doc_key"),
        F.explode("entities").alias("e"),
    ).select("doc_key", "e.ent_type", "e.start", "e.end")


def replay_f1(spark, corpus, lang, flat):
    corpus = corpus.withColumn("lang", F.lit(lang))
    pred = detect_mentions(
        corpus,
        GoldReplayScorer,
        key_col="doc_id",
        text_col="text",
        lang_col="lang",
        tokens_col="tokens",
        gold_col="entities",
        flat=flat,
    )
    return evaluate_mentions_df(pred, gold_df(corpus)).first()


@needs_ref
class TestGoldReplay:
    def test_conll03_flat_en(self, spark):
        corpus = read_corpus_jsonl(
            spark, f"{REFERENCE_CORPORA}/conll03/test.jsonl", token_deli=" "
        ).limit(400)
        m = replay_f1(spark, corpus, "en", flat=True)
        assert m["precision"] > 0.9999 and m["recall"] > 0.9999

    def test_cluener_zh(self, spark):
        corpus = read_corpus_jsonl(
            spark, f"{REFERENCE_CORPORA}/cluener/dev.jsonl", token_deli=""
        ).limit(400)
        m = replay_f1(spark, corpus, "zh", flat=True)
        assert m["precision"] > 0.9999 and m["recall"] > 0.9999

    def test_ace04_nested(self, spark):
        """Nested corpus evaluated UNFLATTENED (reference args.flat=False
        for ace04, train_ner.py:880)."""
        corpus = read_corpus_jsonl(
            spark, f"{REFERENCE_CORPORA}/ace04/test.jsonl", token_deli=" "
        ).limit(200)
        m = replay_f1(spark, corpus, "en", flat=False)
        assert m["precision"] > 0.9999 and m["recall"] > 0.9999

    def test_onto_flat(self, spark):
        corpus = read_corpus_jsonl(
            spark, f"{REFERENCE_CORPORA}/onto/dev.jsonl", token_deli=" "
        ).limit(200)
        m = replay_f1(spark, corpus, "en", flat=True)
        assert m["precision"] > 0.9999 and m["recall"] > 0.9999

    def test_genia_nested(self, spark):
        corpus = read_corpus_jsonl(
            spark, f"{REFERENCE_CORPORA}/genia/dev.jsonl", token_deli=" "
        ).limit(200)
        m = replay_f1(spark, corpus, "en", flat=False)
        assert m["precision"] > 0.9999 and m["recall"] > 0.9999

    def test_per_type_breakdown(self, spark):
        corpus = read_corpus_jsonl(
            spark, f"{REFERENCE_CORPORA}/conll03/test.jsonl", token_deli=" "
        ).limit(100).withColumn("lang", F.lit("en"))
        pred = detect_mentions(
            corpus, GoldReplayScorer, key_col="doc_id", text_col="text",
            lang_col="lang", tokens_col="tokens", gold_col="entities",
        )
        rows = evaluate_mentions_by_type(pred, gold_df(corpus)).collect()
        assert len(rows) >= 3
        assert all(r["f1"] > 0.9999 for r in rows)


@pytest.fixture(scope="module")
def kg_stages(spark, sf_dir):
    stages = build_kg_from_sf_dir(spark, sf_dir)
    for name in ("mentions", "components", "triples"):
        stages[name] = stages[name].cache()
    return stages


class TestKgPipeline:
    def test_flagship_dag(self, kg_stages):
        triples = kg_stages["triples"]
        assert [f.name for f in triples.schema.fields] == [
            "subj", "pred", "obj", "url", "warc_ts", "prob",
        ]
        n = triples.count()
        assert n > 0
        preds = {r["pred"] for r in triples.select("pred").distinct().collect()}
        assert preds == {"type", "alias", "mentioned_with"}

    def test_mentions_match_gazetteer(self, kg_stages):
        surfaces = {r["mention"] for r in kg_stages["mentions"].select("mention").distinct().collect()}
        from qizner_spark.gazetteer import GAZETTEER_FULL
        assert surfaces and surfaces <= set(GAZETTEER_FULL)

    def test_canonicalization_groups_comentioned(self, kg_stages):
        comp = kg_stages["components"]
        # every linked entity got a canonical id
        assert comp.where(F.col("canonical_id").isNull()).count() == 0

    def test_run_with_metrics(self, spark, sf_dir, tmp_path):
        out = run_with_metrics(spark, pages_from_documents(spark, sf_dir),
                               out_path=str(tmp_path / "triples"))
        m = out["metrics"]
        assert m["n_docs"] > 0 and m["n_triples"] > 0 and m["docs_per_sec"] > 0
        back = spark.read.parquet(str(tmp_path / "triples"))
        assert back.count() == m["n_triples"]
        assert "subj_bucket" in back.columns
        metrics_back = spark.read.json(str(tmp_path / "triples_metrics"))
        assert metrics_back.count() == 1
