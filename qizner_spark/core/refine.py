"""SLR span refinement: pooling link scores over span interiors (M10).

``span_pooling(values)[i, j]`` aggregates ``values[i..j]`` (inclusive)
over the upper triangle — computed with cumulative ops exactly like
the reference's double-cumsum / cummax / logcumsumexp tricks, here in
numpy. Applied to adjacency link scores it yields, per span, a pooled
interior-link score that refines the span logits additively (sigmoid
loss: + for min-family, - for max-family).

Reference parity:
  * sum/mean pooling          -> /root/reference/modules.py:1582-1668
  * max/min (+soft w/ temp)   -> /root/reference/modules.py:1671-1779
  * pad row/col and apply     -> /root/reference/modules.py:289-308, 662-677
  * expected matrices for [1,2,3] spelled out in the reference
    docstrings (modules.py:1592-1777) and __main__ (1887-1896)
"""

from __future__ import annotations

import numpy as np

from qizner_spark.core.spans import span_indices

NEG_INF = -1e12


def span_pooling(values, mode: str = "sum", temp: float = 1.0) -> np.ndarray:
    """[m] -> [m, m] upper-triangular pooled matrix; lower = 0."""
    v = np.asarray(values, dtype=np.float64)
    m = v.shape[0]
    if m == 0:
        return np.zeros((0, 0))
    tri = np.triu(np.ones((m, m), dtype=bool))

    if mode in ("sum", "mean"):
        prefix = np.concatenate([[0.0], np.cumsum(v)])
        i, j = np.indices((m, m))
        out = prefix[j + 1] - prefix[i]
        if mode == "mean":
            out = out / np.maximum(j - i + 1, 1)
    elif mode in ("max", "min", "softmax", "softmin"):
        base = np.where(tri, v[None, :].repeat(m, axis=0), np.nan)
        if mode == "max":
            out = np.fmax.accumulate(np.where(np.isnan(base), NEG_INF, base), axis=1)
        elif mode == "min":
            out = np.fmin.accumulate(np.where(np.isnan(base), -NEG_INF, base), axis=1)
        elif mode == "softmax":
            scaled = np.where(np.isnan(base), NEG_INF, base / temp)
            out = np.logaddexp.accumulate(scaled, axis=1) * temp
        else:  # softmin
            scaled = np.where(np.isnan(base), NEG_INF, -base / temp)
            out = -np.logaddexp.accumulate(scaled, axis=1) * temp
    else:
        raise NotImplementedError(mode)
    return np.where(tri, out, 0.0)


def refined_span_additive(n_tokens: int, links, mode: str = "softmin", temp: float = 1.0) -> np.ndarray:
    """Per-span refinement vector [n(n+1)/2] in row-major enumeration:
    span (s, e_closed) gets pool(links[s .. e_closed-1]); length-1
    spans get 0 (the reference pads a zero row/col, modules.py:306)."""
    links = np.asarray(links, dtype=np.float64)
    starts, ends = span_indices(n_tokens)
    out = np.zeros(starts.shape[0], dtype=np.float64)
    if links.shape[0] == 0:
        return out
    pooled = span_pooling(links, mode=mode, temp=temp)
    multi = ends > starts
    out[multi] = pooled[starts[multi], ends[multi] - 1]
    return out


def apply_refinement(scores: np.ndarray, n_tokens: int, links, mode: str = "softmin",
                     temp: float = 1.0) -> np.ndarray:
    """Sigmoid-loss application (modules.py:667-677): max-family pools
    SUBTRACT (weak interior link kills the span), min/mean/sum ADD."""
    ref = refined_span_additive(n_tokens, links, mode, temp)[:, None]
    if mode.endswith("max"):
        return scores - ref
    return scores + ref
