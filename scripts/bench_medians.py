"""Median-of-N wrapper around bench.py (fresh JVM per run).

The driver's per-round BENCH_r{N}.json is a single run; this host's
wall clock varies +-30% (BENCH/SCALING_NOTES.md), so single-run
per-query deltas between rounds are mostly noise. This records a
local median + spread per query so a regression is attributable.

Writes BENCH/HEADLINE_MEDIANS.md. Usage:
    python scripts/bench_medians.py [n_runs=3] [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    # single pass per JVM: the median across fresh JVMs is this
    # script's own noise estimator (bench.py defaults to best-of-2)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               QIZNER_BENCH_PASSES="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench.py:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    runs = [run_bench(sf_dir, cpus) for _ in range(n_runs)]

    names = list(runs[0]["queries"])
    md = [
        "# BENCH/HEADLINE_MEDIANS — median-of-%d local bench" % n_runs,
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} on "
        f"`{sf_dir}`, local[{cpus}], fresh JVM per run. The driver's "
        "BENCH_r{N}.json is a single run on a host with +-30% wall "
        "variance; compare THESE medians across rounds, not single runs.",
        "",
        "| query | median (s) | min | max |",
        "|---|---|---|---|",
    ]
    for name in names:
        vals = [r["queries"][name] for r in runs]
        md.append(
            f"| {name} | {statistics.median(vals):.3f} | {min(vals):.3f} | {max(vals):.3f} |"
        )
    totals = [r["value"] for r in runs]
    md += [
        f"| **total** | **{statistics.median(totals):.3f}** | {min(totals):.3f} | {max(totals):.3f} |",
        "",
        "## Raw runs",
        "",
        "```json",
        *[json.dumps(r) for r in runs],
        "```",
    ]
    out_path = os.path.join(REPO, "BENCH", "HEADLINE_MEDIANS.md")
    with open(out_path, "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(json.dumps({
        "median_total_sec": statistics.median(totals),
        "runs": totals,
        "out": out_path,
    }))


if __name__ == "__main__":
    main()
