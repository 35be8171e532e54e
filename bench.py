"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...extras}

Timing forces FULL materialization of every output column via the
noop sink (count() would let Catalyst prune work).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qizner_spark.session import get_spark  # noqa: E402

# exact all-pairs ngram_jaccard is deliberately NOT a headline: it is
# the ground-truth oracle op; at scale near-dup runs via minhash_dedup
# (LSH) which IS benched.
HEADLINE = [
    "kg_triples",           # flagship end-to-end DAG
    "ner_mentions",         # relational gazetteer NER (no UDF)
    "ner_mentions_udf",     # Arrow detection operator
    "exact_dedup",          # hash-groupBy dedup
    "minhash_dedup",        # MinHash+LSH near-dup (the scale path)
    "similarity_topk",      # brute-force cosine top-k
    "ann_topk",             # LSH-bucketed ANN
    "quality_scores",       # native text analysis
    "multimodal_features",  # Arrow feature extraction over binary
    "q1_pricing",           # agg-heavy relational
    "events_sessions",      # window functions
    "tfidf_top_terms",      # explode -> two aggs -> join -> top-k window
    "comention_pagerank",   # iterative DataFrame-loop graph algorithm
]


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(
        "qizner-bench", master=f"local[{cpus}]",
        # shuffle partitions sized to the DATA (sf0.1 shuffles are MBs;
        # 16 partitions keeps every partition well above the tiny-task
        # floor) rather than to core count — at 100 TB this knob scales
        # with input bytes, not executors
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # JVM/codegen/python-worker warmup on the smallest SF — includes
    # the flagship DAG so its whole-stage codegen and Arrow worker
    # pool are hot before timing (the metric is engine throughput,
    # not first-query JIT latency)
    force(queries["ner_mentions"](spark, "/root/testdata/sf0.001"))
    force(queries["kg_triples"](spark, "/root/testdata/sf0.001"))

    # best-of-N warm sweeps (full sweeps, then min per query): this
    # host has multi-minute silent throttling windows (BENCH/
    # SCALING_NOTES.md); a single-shot per query samples the window,
    # the min of two time-separated sweeps mostly dodges it. The
    # medians harness sets QIZNER_BENCH_PASSES=1 (it aggregates
    # across fresh JVMs itself).
    passes = int(os.environ.get("QIZNER_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in HEADLINE:
            t0 = time.time()
            force(queries[name](spark, sf_dir))
            el = round(time.time() - t0, 3)
            if name not in timings or el < timings[name]:
                timings[name] = el

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "n_docs": n_docs,
        "kg_docs_per_sec": round(n_docs / timings["kg_triples"], 2) if timings.get("kg_triples") else None,
        "timing": f"best-of-{passes} warm sweeps per query",
    }
    print(json.dumps(out), flush=True)
    # orderly shutdown: without it the JVM teardown races the python
    # worker daemons and the tail logs a harmless-but-noisy
    # BrokenPipeError (seen in BENCH_r01)
    spark.stop()


if __name__ == "__main__":
    main()
