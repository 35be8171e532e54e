"""Session-factory master resolution + detect_mentions input guards."""

import pytest

from qizner_spark.session import _launcher_has_master


class TestLauncherMasterDetection:
    def test_spark_env_loaded_alone_is_not_a_master(self, monkeypatch):
        """Any process that sourced load-spark-env.sh exports
        SPARK_ENV_LOADED and children inherit it; a plain
        `python script.py` from such a shell must still default to
        local[*] instead of dying with 'A master URL must be set'."""
        monkeypatch.delenv("PYSPARK_GATEWAY_PORT", raising=False)
        monkeypatch.setenv("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
        monkeypatch.setenv("SPARK_ENV_LOADED", "1")
        assert not _launcher_has_master()

    def test_explicit_submit_args_master_detected(self, monkeypatch):
        monkeypatch.delenv("PYSPARK_GATEWAY_PORT", raising=False)
        monkeypatch.setenv(
            "PYSPARK_SUBMIT_ARGS", "--master spark://host:7077 pyspark-shell"
        )
        assert _launcher_has_master()


class TestPassthroughCollision:
    def test_colliding_passthrough_rejected(self, spark, sf_dir):
        from qizner_spark.operators.mentions import detect_mentions
        from qizner_spark.plans.pipeline import default_scorer_factory
        from qizner_spark.sources.pages import pages_from_documents

        from pyspark.sql import functions as F

        pages = pages_from_documents(spark, sf_dir).withColumn(
            "prob", F.col("warc_ts").cast("double")
        )
        with pytest.raises(ValueError, match="prob"):
            detect_mentions(
                pages, default_scorer_factory,
                key_col="url", text_col="text", lang_col="lang",
                passthrough_cols=["prob"],
            )
