"""Source/sink tests — run against the REAL reference corpora when
present (golden parity) plus synthesized fixture files."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import REFERENCE_CORPORA
from qizner_spark.sources.corpus import (
    conll_tags_to_entities,
    corpus_to_json_lines,
    read_cluener,
    read_conll_columns,
    read_corpus_jsonl,
)
from qizner_spark.sources.pages import (
    pages_from_documents,
    synthetic_pages,
    with_extracted_text,
)

CONLL03_TEST = f"{REFERENCE_CORPORA}/conll03/test.jsonl"
CLUENER_DEV = f"{REFERENCE_CORPORA}/cluener/dev.jsonl"

needs_ref = pytest.mark.skipif(
    not os.path.exists(CONLL03_TEST), reason="reference corpora not available"
)


@needs_ref
class TestJsonlReader:
    def test_conll03_first_doc(self, spark):
        df = read_corpus_jsonl(spark, CONLL03_TEST, token_deli=" ")
        row = df.orderBy("doc_id").first()
        assert row.doc_id == 0
        assert row.text.startswith("SOCCER - JAPAN")
        ents = {(e.ent_type, e.start, e.end) for e in row.entities}
        # compact [2, "JAPAN"] reconstructs to exclusive end 3
        assert ("LOC", 2, 3) in ents
        assert ("PER", 7, 8) in ents

    def test_multiword_compact_end(self, spark):
        df = read_corpus_jsonl(spark, CONLL03_TEST, token_deli=" ")
        row = df.where(F.col("doc_id") == 2).first()
        ents = {(e.ent_type, e.start, e.end) for e in row.entities}
        # [2, "United Arab Emirates"] -> (2, 5)
        assert ("LOC", 2, 5) in ents

    def test_doc_count(self, spark):
        assert read_corpus_jsonl(spark, CONLL03_TEST, token_deli=" ").count() == 3453

    def test_cluener_zh_char_corpus(self, spark):
        df = read_corpus_jsonl(spark, CLUENER_DEV, token_deli="")
        assert df.count() == 1343
        row = df.orderBy("doc_id").first()
        ents = {(e.ent_type, e.start, e.end) for e in row.entities}
        assert ("name", 0, 3) in ents       # 彭小军
        assert ("address", 15, 17) in ents  # 台湾

    def test_roundtrip_write_read(self, spark, tmp_path):
        df = read_corpus_jsonl(spark, CONLL03_TEST, token_deli=" ").limit(50)
        out = str(tmp_path / "roundtrip")
        corpus_to_json_lines(df, compact=True).coalesce(1).write.text(out)
        back = read_corpus_jsonl(spark, out, token_deli=" ")
        a = {(r["text"], tuple(sorted((e.ent_type, e.start, e.end) for e in r["entities"])))
             for r in df.collect()}
        b = {(r["text"], tuple(sorted((e.ent_type, e.start, e.end) for e in r["entities"])))
             for r in back.collect()}
        assert a == b


class TestConllColumns:
    @pytest.fixture()
    def conll_file(self, tmp_path):
        p = tmp_path / "sample.conll"
        p.write_text(
            "EU\tB-ORG\nrejects\tO\nGerman\tB-MISC\ncall\tO\n\n"
            "Peter\tB-PER\nBlackburn\tI-PER\n\n"
            "-LRB-\tO\n1996\tO\n-RRB-\tO\n\n"
        )
        return str(p)

    def test_sentence_assembly(self, spark, conll_file):
        df = read_conll_columns(spark, conll_file)
        rows = df.orderBy("doc_id").collect()
        assert len(rows) == 3
        assert rows[0].tokens == ["EU", "rejects", "German", "call"]
        assert rows[1].tags == ["B-PER", "I-PER"]

    def test_tag_decode(self, spark, conll_file):
        df = conll_tags_to_entities(read_conll_columns(spark, conll_file))
        rows = {r.doc_id: r for r in df.collect()}
        ents0 = {(e.ent_type, e.start, e.end) for e in rows[0].entities}
        assert ents0 == {("ORG", 0, 1), ("MISC", 2, 3)}
        ents1 = {(e.ent_type, e.start, e.end) for e in rows[1].entities}
        assert ents1 == {("PER", 0, 2)}

    def test_ontonotes_options(self, spark, conll_file):
        df = read_conll_columns(spark, conll_file, digit2zero=True, normalize_brackets=True)
        rows = df.orderBy("doc_id").collect()
        assert rows[2].tokens == ["(", "0000", ")"]


class TestCluenerFormat:
    def test_closed_end_plus_one(self, spark, tmp_path):
        p = tmp_path / "cluener.jsonl"
        obj = {
            "text": "彭小军认为台湾不错",
            "label": {"name": {"彭小军": [[0, 2]]}, "address": {"台湾": [[5, 6]]}},
        }
        p.write_text(json.dumps(obj, ensure_ascii=False) + "\n")
        df = read_cluener(spark, str(p))
        row = df.first()
        assert row.tokens == list("彭小军认为台湾不错")
        ents = {(e.ent_type, e.start, e.end) for e in row.entities}
        assert ents == {("name", 0, 3), ("address", 5, 7)}

    def test_unlabeled_doc(self, spark, tmp_path):
        p = tmp_path / "cluener2.jsonl"
        p.write_text(json.dumps({"text": "你好"}, ensure_ascii=False) + "\n")
        row = read_cluener(spark, str(p)).first()
        assert row.entities == []


class TestPages:
    def test_byte_identity_from_documents(self, spark, sf_dir):
        pages = with_extracted_text(pages_from_documents(spark, sf_dir))
        bad = pages.where(F.col("extracted") != F.col("text")).count()
        assert bad == 0
        assert pages.select("url").distinct().count() == pages.count()

    def test_schema(self, spark, sf_dir):
        pages = pages_from_documents(spark, sf_dir)
        assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
        assert dict(pages.dtypes)["html"] == "binary"
        assert dict(pages.dtypes)["warc_ts"] == "timestamp"

    def test_synthetic_deterministic_and_byte_identical(self, spark):
        p1 = synthetic_pages(spark, 200, words_per_page=12)
        p2 = synthetic_pages(spark, 200, words_per_page=12)
        assert p1.exceptAll(p2).count() == 0
        bad = with_extracted_text(p1).where(F.col("extracted") != F.col("text")).count()
        assert bad == 0

    def test_synthetic_skew(self, spark):
        p = synthetic_pages(spark, 1000, words_per_page=4, hot_domain_fraction=0.3)
        hot = p.where(F.col("url").startswith("https://src0.")).count()
        assert 200 < hot < 420  # ~30% on the hot domain

    def test_no_udf_in_plan(self, spark):
        """The pages scan + extraction must stay JVM-side (no
        BatchEvalPython / ArrowEvalPython nodes)."""
        plan = with_extracted_text(synthetic_pages(spark, 10))._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_kernel_control_text_replica_is_byte_identical(self, spark):
        """scripts/kernel_control.py claims to score the IDENTICAL
        text the Spark flagship scores — guard the pure-python replica
        against drift in the synthetic_pages word expression."""
        import sys

        if "/root/repo" not in sys.path:
            sys.path.insert(0, "/root/repo")
        from scripts.kernel_control import page_text

        rows = synthetic_pages(spark, 30, words_per_page=40).select("url", "text").collect()
        for r in rows:
            pid = int(r["url"].rsplit("/", 1)[1])
            assert r["text"] == page_text(pid, 40), f"page {pid} drifted"
