"""Exact-span evaluation: micro/per-type/macro P-R-F1 (pure python).

Matching is SET semantics on (ent_type, start, end) per document;
duplicate predictions of the same span collapse before counting.

Reference parity:
  * eval loop + formulas (epsilon 1e-10)
        -> /root/reference/datautils.py:2614-2777 (2688-2702)
  * streaming F1 accumulator -> /root/reference/datautils.py:1092-1138
  * super-category re-aggregation -> /root/reference/datautils.py:3207-3231
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable, Mapping, Sequence

from qizner_spark.core.labels import Mention

EPS = 1e-10


def _prf(tp: float, fp: float, fn: float) -> tuple[float, float, float]:
    prec = tp / (tp + fp + EPS)
    rec = tp / (tp + fn + EPS)
    f1 = (2.0 * prec * rec) / (prec + rec + EPS)
    return prec, rec, f1


def evaluate_mentions(
    docs: Iterable[tuple[Sequence[Mention], Sequence[Mention]]], macro: bool = False
) -> dict:
    """[(gold_mentions, pred_mentions), ...] -> metrics dict.

    Returns {'precision', 'recall', 'f1', 'tp', 'fp', 'fn',
    'per_type': {type: {...}}, (+ 'macro_*' when requested)}.
    """
    tp = fp = fn = 0
    detail: dict[str, dict[str, float]] = defaultdict(lambda: {"tp": 0.0, "fp": 0.0, "fn": 0.0})
    for gold, pred in docs:
        gold_set = {(m[0], m[1], m[2]) for m in gold}
        pred_set = {(m[0], m[1], m[2]) for m in pred}
        inter = gold_set & pred_set
        tp += len(inter)
        fp += len(pred_set) - len(inter)
        fn += len(gold_set) - len(inter)
        for ent_type in {e[0] for e in gold_set | pred_set}:
            g = {e for e in gold_set if e[0] == ent_type}
            p = {e for e in pred_set if e[0] == ent_type}
            i = g & p
            detail[ent_type]["tp"] += len(i)
            detail[ent_type]["fp"] += len(p) - len(i)
            detail[ent_type]["fn"] += len(g) - len(i)

    prec, rec, f1 = _prf(tp, fp, fn)
    per_type = {}
    for ent_type, v in detail.items():
        tprec, trec, tf1 = _prf(v["tp"], v["fp"], v["fn"])
        per_type[ent_type] = {
            "tp": v["tp"], "fp": v["fp"], "fn": v["fn"],
            "num_preds": v["tp"] + v["fp"], "num_golds": v["tp"] + v["fn"],
            "precision": tprec, "recall": trec, "f1": tf1,
        }
    out = {
        "precision": prec, "recall": rec, "f1": f1,
        "tp": float(tp), "fp": float(fp), "fn": float(fn),
        "num_preds": float(tp + fp), "num_golds": float(tp + fn),
        "per_type": per_type,
    }
    if macro and per_type:
        out["macro_precision"] = sum(v["precision"] for v in per_type.values()) / len(per_type)
        out["macro_recall"] = sum(v["recall"] for v in per_type.values()) / len(per_type)
        out["macro_f1"] = sum(v["f1"] for v in per_type.values()) / len(per_type)
    return out


class F1Meaner:
    """Streaming micro-F1 accumulator (reference F1_Meaner,
    datautils.py:1092-1138)."""

    def __init__(self) -> None:
        self.tp = self.fp = self.fn = 0.0

    def add(self, tp: float, fp: float, fn: float) -> None:
        self.tp += tp
        self.fp += fp
        self.fn += fn

    @property
    def prf(self) -> tuple[float, float, float]:
        return _prf(self.tp, self.fp, self.fn)


def aggregate_supertypes(
    per_type: Mapping[str, Mapping[str, float]], type2super: Mapping[str, str]
) -> dict:
    """Re-aggregate per-type tp/fp/fn into super-categories, micro
    within each plus macro over members (reference metric_aggregater,
    datautils.py:3207-3231). Unmapped types keep their own name."""
    groups: dict[str, list[str]] = defaultdict(list)
    for t in per_type:
        groups[type2super.get(t, t)].append(t)
    out = {}
    for super_t, members in groups.items():
        tp = sum(per_type[m]["tp"] for m in members)
        fp = sum(per_type[m]["fp"] for m in members)
        fn = sum(per_type[m]["fn"] for m in members)
        prec, rec, f1 = _prf(tp, fp, fn)
        member_prf = [_prf(per_type[m]["tp"], per_type[m]["fp"], per_type[m]["fn"]) for m in members]
        out[super_t] = {
            "tp": tp, "fp": fp, "fn": fn,
            "precision": prec, "recall": rec, "f1": f1,
            "macro_precision": sum(p for p, _, _ in member_prf) / len(members),
            "macro_recall": sum(r for _, r, _ in member_prf) / len(members),
            "macro_f1": sum(f for _, _, f in member_prf) / len(members),
        }
    return out


def compare_runs(
    docs: Iterable[tuple[Sequence[Mention], Sequence[Mention], Sequence[Mention]]],
) -> list[dict]:
    """Align two prediction runs against gold per doc; report docs
    where run1 is correct and run2 differs (reference compare_results,
    datautils.py:2790-2815). Input: (gold, pred1, pred2) triples."""
    diffs = []
    for doc_id, (gold, p1, p2) in enumerate(docs):
        g = {(m[0], m[1], m[2]) for m in gold}
        s1 = {(m[0], m[1], m[2]) for m in p1}
        s2 = {(m[0], m[1], m[2]) for m in p2}
        if s1 == g and s2 != g:
            diffs.append({"doc_id": doc_id, "gold": sorted(g), "run2_only": sorted(s2 - g),
                          "run2_missing": sorted(g - s2)})
    return diffs
