"""One flagship-DAG run over N synthetic pages — subprocess worker for
scaling_bench.py. Prints one JSON line {"n_pages", "cpus", "wall_sec",
"docs_per_sec", "n_triples"}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qizner_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("QIZNER_SCALING_PAGES", "40000"))
    shuffle = int(os.environ.get("QIZNER_SHUFFLE_PARTITIONS", max(cpus * 2, 8)))
    spark = get_spark(
        "qizner-flagship-scaling", master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from qizner_spark.plans.pipeline import build_kg
    from qizner_spark.sources.pages import synthetic_pages

    pages = synthetic_pages(spark, n_pages, words_per_page=60)
    # warmup: JVM + python workers + codegen on a small slice
    build_kg(spark, pages.limit(200))["triples"].write.format("noop").mode("overwrite").save()

    t0 = time.time()
    stages = build_kg(spark, pages)
    stages["triples"].write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_triples = stages["triples"].count()
    print(json.dumps({
        "n_pages": n_pages, "cpus": cpus, "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_pages / wall, 2), "n_triples": n_triples,
    }))


if __name__ == "__main__":
    main()
