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


class TestComentionCap:
    """max_entities_per_doc bounds the O(k^2) per-doc pair join — the
    spammy-page fixture the round-4 verdict asked for: one url with
    10^3 distinct entities must emit a bounded pair set."""

    @pytest.fixture(scope="class")
    def spammy_linked(self, spark):
        # one spammy url with 1000 distinct entities (prob encodes a
        # known ranking) + one normal url with 5
        rows = [("u_spam", f"e{i:04d}", 0.5 + (999 - i) / 2000.0)
                for i in range(1000)]
        rows += [("u_ok", f"e{i:04d}", 0.9) for i in range(5)]
        return spark.createDataFrame(rows, ["url", "entity_id", "prob"])

    def test_capped_pair_count_bounded(self, spark, spammy_linked):
        from qizner_spark.plans.pipeline import comention_edges

        e = comention_edges(spammy_linked, max_entities_per_doc=50)
        per_url = {r["url"]: r["n"] for r in
                   e.groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert per_url["u_spam"] == 50 * 49 // 2       # capped: C(50,2)
        assert per_url["u_ok"] == 5 * 4 // 2           # under cap: untouched

    def test_cap_keeps_top_prob_entities(self, spark, spammy_linked):
        from qizner_spark.plans.pipeline import comention_edges

        e = comention_edges(spammy_linked.where(F.col("url") == "u_spam"),
                            max_entities_per_doc=10)
        kept = set()
        for r in e.collect():
            kept.add(r["src"]); kept.add(r["dst"])
        # prob is strictly decreasing in entity index -> top-10 = e0000..e0009
        assert kept == {f"e{i:04d}" for i in range(10)}

    def test_uncapped_path_unchanged(self, spark, spammy_linked):
        from qizner_spark.plans.pipeline import comention_edges

        e = comention_edges(spammy_linked.where(F.col("url") == "u_ok"),
                            max_entities_per_doc=None)
        assert e.count() == 5 * 4 // 2

    def test_prob_tie_breaks_on_entity_id(self, spark):
        from qizner_spark.plans.pipeline import comention_edges

        tied = spark.createDataFrame(
            [("u", f"e{i}", 0.7) for i in range(6)], ["url", "entity_id", "prob"]
        )
        e = comention_edges(tied, max_entities_per_doc=3)
        kept = set()
        for r in e.collect():
            kept.add(r["src"]); kept.add(r["dst"])
        assert kept == {"e0", "e1", "e2"}


def test_triple_sink_partition_pruning(spark, sf_dir, tmp_path):
    """The subj_bucket-partitioned sink must prune at read time: a
    bucket-filtered scan shows the predicate in PartitionFilters (so
    at 10^12 triples a single-entity provenance lookup reads 1/64 of
    the files), and partition pruning composes with column pruning
    (ReadSchema carries only the projected columns)."""
    from qizner_spark.plans.pipeline import build_kg_from_sf_dir, write_triples

    triples = build_kg_from_sf_dir(spark, sf_dir)["triples"]
    path = str(tmp_path / "sink")
    write_triples(triples, path)
    back = spark.read.parquet(path)
    q = back.where(F.col("subj_bucket") == 7).select("subj", "obj")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the bucket predicate must be IN the partition filters, not a
    # post-scan filter over all files
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "subj_bucket" in pf
    assert "ReadSchema" in plan
    rs = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "url" not in rs and "warc_ts" not in rs  # column pruning
