"""Evidence-cadence contract: the committed full-sweep artifact
(BENCH/FULL_ORACLES.md, written by scripts/full_oracles_md.py) must
carry a green row for EVERY declared query — so a query can't be
added (or silently dropped from the sweep) without the round's
committed oracle evidence covering it."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_sweep_artifact_covers_every_query():
    import __spark_entry__ as em

    path = os.path.join(REPO, "BENCH", "FULL_ORACLES.md")
    assert os.path.exists(path), "run scripts/full_oracles_md.py at HEAD"
    text = open(path).read()
    ok = set(re.findall(r"^ok\s+(\w+):", text, flags=re.M))
    failed = re.findall(r"^FAIL\s+(\w+)", text, flags=re.M)
    assert not failed, f"sweep artifact records failures: {failed}"
    missing = sorted(set(em.queries()) - ok)
    assert not missing, f"queries missing a green sweep row: {missing}"
