"""Design-scaling WITNESS for scaling_bench.py: the flagship's exact
per-document kernel (tokenize -> segment -> dense HashBiaffine
score_matrix -> sigmoid decode -> dedupe -> prob-greedy flatten) over
the IDENTICAL synthetic page text, run through plain multiprocessing
at two process counts — i.e. the same compute with NO JVM, scheduler,
Arrow stream or shuffle in the path.

Why it exists: on this single-host sandbox the local-mode JVM itself
is a measured bottleneck at higher thread counts (SCALING_NOTES.md §4);
this control separates "the DESIGN doesn't scale" (kernel efficiency
would drop too) from "the single-JVM stand-in doesn't" (kernel scales,
Spark local-mode trails it). Interleaved levels + medians, same
discipline as the Spark runs.

Prints one JSON line. Usage/env:
    QIZNER_SCALING_PAGES / _WORDS / QIZNER_DECODE_THRESHOLD as in
    _flagship_run.py; QIZNER_KERNEL_LOW/HIGH process counts;
    QIZNER_KERNEL_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from multiprocessing import get_context

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qizner_spark.sources.pages import VOCAB  # noqa: E402

ENT_TYPES = [f"T{i}" for i in range(8)]  # = _flagship_run.MODEL_ENT_TYPES
SEED = 42  # = synthetic_pages default


def page_text(page_id: int, words: int) -> str:
    """Pure-python replica of sources/pages.py synthetic_pages word
    expression — byte-identical to what the Spark flagship scores."""
    n = len(VOCAB)
    return " ".join(
        VOCAB[(page_id * 2654435761 + i * 40503 + SEED) % n] for i in range(words)
    )


_scorer = None


def _work(chunk: tuple[int, int, int, float]) -> int:
    """Score pages [lo, hi); returns emitted mention count."""
    global _scorer
    from qizner_spark.core.labels import dedupe_mentions, flatten_by_prob
    from qizner_spark.core.scoring import HashBiaffineScorer
    from qizner_spark.core.segment import segment
    from qizner_spark.core.spans import decode_sigmoid

    lo, hi, words, thr = chunk
    if _scorer is None:
        _scorer = HashBiaffineScorer(ENT_TYPES)
    id2ent = dict(enumerate(_scorer.ent_types))
    n_out = 0
    for pid in range(lo, hi):
        tokens = page_text(pid, words).split(" ")
        found = []
        for seg in segment(tokens, [], max_size=512):
            mat = _scorer.score_matrix(seg.tokens)
            off = seg.doc_offset
            found.extend(
                (t, s + off, e + off, p)
                for t, s, e, p in decode_sigmoid(mat, len(seg.tokens), id2ent, thr)
            )
        n_out += len(flatten_by_prob(len(tokens), dedupe_mentions(found)))
    return n_out


def run_level(procs: int, n_pages: int, words: int, thr: float) -> dict:
    """One fresh-pool run: warm every worker first (gVisor first-touch
    page faults cost 10-45 s on fresh ~100 MB heaps — warmup runs the
    full kernel once per process), then time the real input split into
    64 fixed chunks (mirrors the flagship's 64 input partitions)."""
    n_chunks = 64
    bounds = [
        (n_pages * c // n_chunks, n_pages * (c + 1) // n_chunks, words, thr)
        for c in range(n_chunks)
    ]
    warm = [(n_pages + p, n_pages + p + 1, words, thr) for p in range(procs)]
    ctx = get_context("fork")
    with ctx.Pool(procs) as pool:
        pool.map(_work, warm, chunksize=1)
        t0 = time.time()
        total = sum(pool.map(_work, bounds, chunksize=1))
        wall = time.time() - t0
    return {"procs": procs, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_pages / wall, 2), "n_mentions": total}


def main() -> None:
    low = int(os.environ.get("QIZNER_KERNEL_LOW", "2"))
    high = int(os.environ.get("QIZNER_KERNEL_HIGH", "8"))
    n_pages = int(os.environ.get("QIZNER_SCALING_PAGES", "600"))
    words = int(os.environ.get("QIZNER_SCALING_WORDS", "1000"))
    thr = float(os.environ.get("QIZNER_DECODE_THRESHOLD", "0.94"))
    n_runs = int(os.environ.get("QIZNER_KERNEL_RUNS", "3"))

    lows, highs = [], []
    for _ in range(n_runs):  # interleaved, same discipline as Spark levels
        lows.append(run_level(low, n_pages, words, thr))
        highs.append(run_level(high, n_pages, words, thr))
    lo_s = sorted(r["docs_per_sec"] for r in lows)
    hi_s = sorted(r["docs_per_sec"] for r in highs)
    med_lo, med_hi = statistics.median(lo_s), statistics.median(hi_s)
    print(json.dumps({
        "low": low, "high": high, "n_pages": n_pages, "words": words,
        "docs_per_sec_low": med_lo, "docs_per_sec_high": med_hi,
        "all_low": lo_s, "all_high": hi_s,
        "kernel_efficiency": round((med_hi / med_lo) / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
