"""Supplementary per-stage isolation bench (guide §1.4 noop-sink).

NOT the driver metric — bench.py is frozen for measurement. This file
exists to attribute time inside composite queries (kg_triples,
minhash_dedup, ...) stage by stage, each stage forced through the noop
sink with a job description label.

Usage: python bench_extra.py [sf_dir] [target ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from qizner_spark.session import get_spark  # noqa: E402


def force(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    el = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: {el:.3f}s", flush=True)
    return el


def kg_stages(spark, sf_dir):
    import __spark_entry__ as em
    from qizner_spark.plans.pipeline import build_kg_from_sf_dir

    stages = build_kg_from_sf_dir(
        spark, sf_dir, scorer_factory=em._kg_single_factory,
        broadcast_alias=True, max_entities_per_doc=em.COMENTION_CAP)
    force(spark, "kg: docs(extract)", stages["docs"])
    t0 = time.time()
    force(spark, "kg: mentions (detection, materializes persist)", stages["mentions"])
    force(spark, "kg: alias", stages["alias"])
    force(spark, "kg: linked", stages["linked"])
    force(spark, "kg: edges", stages["edges"])
    force(spark, "kg: components (incl CC job)", stages["components"])
    force(spark, "kg: triples (full assembly)", stages["triples"])
    print(f"kg total-after-detection wall: {time.time()-t0:.3f}s")
    stages["mentions"].unpersist()


def kg_whole(spark, sf_dir):
    import __spark_entry__ as em

    q = em.queries()["kg_triples"]
    for i in range(3):
        df = q(spark, sf_dir)
        force(spark, f"kg_triples end-to-end #{i}", df)


def minhash_stages(spark, sf_dir):
    import __spark_entry__ as em
    from qizner_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_dedup_pairs, minhash_signatures,
    )

    docs = em._documents(spark, sf_dir)
    sigs = minhash_signatures(docs, 64, 3)
    force(spark, "minhash: signatures (unpersisted pass)", sigs)
    from pyspark import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    force(spark, "minhash: signatures persist", sigs)
    cands = lsh_candidate_pairs(sigs, 16, num_hashes=64)
    force(spark, "minhash: lsh candidates", cands)
    out = minhash_dedup_pairs(docs, threshold=0.5)
    force(spark, "minhash: full", out)
    sigs.unpersist()
    getattr(out, "_qizner_persisted", sigs).unpersist()


def tfidf_stages(spark, sf_dir):
    import __spark_entry__ as em
    from qizner_spark.operators.textstats import tfidf_top_terms

    docs = em._documents(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    force(spark, "tfidf: explode only", toks)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    force(spark, "tfidf: tf agg", tf)
    force(spark, "tfidf: full", tfidf_top_terms(docs, k=3))


def pagerank_stages(spark, sf_dir):
    import __spark_entry__ as em
    from qizner_spark.plans.pipeline import comention_edges

    m = em._ner_mentions(spark, sf_dir).select(
        F.col("doc_id").alias("url"), F.col("mention").alias("entity_id"))
    force(spark, "pagerank: mentions", m)
    edges = comention_edges(m, max_entities_per_doc=em.COMENTION_CAP) \
        .select("src", "dst").distinct()
    force(spark, "pagerank: edges", edges)
    q = em.queries()["comention_pagerank"]
    force(spark, "pagerank: full", q(spark, sf_dir))


TARGETS = {
    "kg": kg_stages,
    "kg_whole": kg_whole,
    "minhash": minhash_stages,
    "tfidf": tfidf_stages,
    "pagerank": pagerank_stages,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or list(TARGETS)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("qizner-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + python workers
    import __spark_entry__ as em
    em.queries()["ner_mentions"](spark, "/root/testdata/sf0.001") \
        .write.format("noop").mode("overwrite").save()
    for n in names:
        print(f"--- {n} @ {sf_dir}")
        TARGETS[n](spark, sf_dir)
    spark.stop()




def kg_branches(spark, sf_dir):
    """Attribute the triples-assembly time branch by branch."""
    import __spark_entry__ as em
    from qizner_spark.operators.linking import build_alias_dictionary, link_mentions
    from qizner_spark.plans.pipeline import (
        DEFAULT_MAX_ENTITIES_PER_DOC, build_kg_from_sf_dir,
    )
    from pyspark.sql import Window

    stages = build_kg_from_sf_dir(
        spark, sf_dir, scorer_factory=em._kg_single_factory,
        broadcast_alias=True, max_entities_per_doc=em.COMENTION_CAP)
    mentions, linked, components = stages["mentions"], stages["linked"], stages["components"]
    force(spark, "branch: mentions materialize", mentions)
    canon = linked.join(components, "entity_id").repartition(F.col("url"))
    force(spark, "branch: canon (join+url exchange)", canon)
    type_triples = canon.groupBy("url", "canonical_id", "ent_type").agg(
        F.min("warc_ts").alias("warc_ts"), F.min("prob").alias("prob"))
    force(spark, "branch: type_triples", type_triples)
    alias_triples = canon.groupBy("url", "canonical_id", "mention").agg(
        F.min("warc_ts").alias("warc_ts"), F.min("prob").alias("prob"))
    force(spark, "branch: alias_triples", alias_triples)
    ent_doc = canon.groupBy("url", "entity_id", "canonical_id").agg(
        F.min("warc_ts").alias("warc_ts"), F.min("prob").alias("prob"),
        F.max("prob").alias("_rank_prob"))
    w = Window.partitionBy("url").orderBy(F.col("_rank_prob").desc(), F.col("entity_id").asc())
    ent_doc = ent_doc.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= em.COMENTION_CAP).drop("_rn").drop("_rank_prob")
    force(spark, "branch: ent_doc (agg+capwindow)", ent_doc)
    a, b = ent_doc.alias("a"), ent_doc.alias("b")
    canon_edges = (
        a.join(b, "url")
        .where(F.col("a.entity_id") < F.col("b.entity_id"))
        .groupBy(F.col("url"), F.col("a.canonical_id").alias("subj"),
                 F.col("b.canonical_id").alias("obj"))
        .agg(F.min(F.col("a.warc_ts")).alias("warc_ts"),
             F.min(F.least("a.prob", "b.prob")).alias("prob")))
    force(spark, "branch: canon_edges (selfjoin+agg)", canon_edges)
    force(spark, "branch: full triples", stages["triples"])
    mentions.unpersist()


TARGETS["kg_branches"] = kg_branches

if __name__ == "__main__":
    main()
