"""S9 model-artifact distribution: weights file shipped via
sc.addFile, loaded on workers through SparkFiles inside the detection
factory — output must equal a directly-constructed scorer."""

import json

from qizner_spark.operators.artifacts import artifact_scorer_factory, distribute_artifact
from qizner_spark.operators.mentions import detect_mentions


def test_detection_with_distributed_weights(spark, tmp_path):
    # builder defined INSIDE the test: cloudpickle ships closures by
    # value, while module-level test functions pickle by reference to
    # a module the workers don't have
    def _build_from_weights(path: str):
        from qizner_spark.core.scoring import GazetteerScorer

        with open(path) as f:
            alias = json.load(f)
        return GazetteerScorer(alias, token_deli=" ")

    alias = {"spark": "ACTOR", "join": "OP", "hash join": "OP"}
    weights = tmp_path / "gazetteer_weights.json"
    weights.write_text(json.dumps(alias))

    name = distribute_artifact(spark, str(weights))
    factory = artifact_scorer_factory(name, _build_from_weights)

    docs = spark.createDataFrame(
        [(1, "spark runs a hash join fast"), (2, "no entities here at all")],
        ["doc_id", "text"],
    )
    got = detect_mentions(docs, factory, key_col="doc_id", text_col="text",
                          lang_col=None).collect()

    def direct_factory():
        from qizner_spark.core.scoring import GazetteerScorer

        return GazetteerScorer(alias, token_deli=" ")

    want = detect_mentions(docs, direct_factory, key_col="doc_id", text_col="text",
                           lang_col=None).collect()
    key = lambda r: (r["doc_key"], r["start"], r["end"], r["ent_type"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 0 and "spark" in {r["mention"] for r in got}
