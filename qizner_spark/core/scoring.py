"""Pluggable span scorers + candidate-span pruning.

The learned BERT scorer (reference modules.py Bert_Span) is NOT
portable to this sandbox (no torch); the scorer is therefore an
interface with three deterministic implementations:

  * :class:`GoldReplayScorer`   — tests: 1.0 at gold (span, type)
    cells; the full pipeline must then reproduce gold exactly
    (P = R = F1 = 1 under E1). FIXTURES.md F6.
  * :class:`GazetteerScorer`    — production-shaped determinism: spans
    whose surface form is in a broadcast alias dictionary score a
    stable pseudo-probability >= 0.5. This is the flagship scorer for
    benchmarks (dictionary NER over webtext).
  * :class:`HashBiaffineScorer` — exercises the real model compute
    shape without torch: hashed token embeddings -> start/end heads ->
    scaled dot-product span interaction (reference 'self_attn'
    default, modules.py:627-631; head size 50 hard-coded at
    modules.py:370-380) -> sigmoid -> full [n(n+1)/2, E] matrix.

Candidate-span pruning mirrors the reference ``fast_predict`` path:
threshold adjacent-token link scores and keep only spans whose entire
interior passes — a predicate-pushdown-style optimization.

Reference parity:
  * span interaction (scaled dot product)  -> modules.py:627-631, 741-745
  * upper-triangle extraction              -> modules.py:688-698
  * link score (shifted elementwise product)/sqrt(h)
                                           -> modules.py:532-549
  * fast_predict span pruning              -> modules.py:810-896, 1782-1855
"""

from __future__ import annotations

import zlib
from collections.abc import Mapping, Sequence

import numpy as np

from qizner_spark.core.labels import Mention
from qizner_spark.core.spans import num_spans, span_indices

HEAD_SIZE = 50  # reference hard-codes hidden 50 (modules.py:370-380)


def stable_hash(s: str, seed: int = 0) -> int:
    """Deterministic 32-bit string hash (crc32 — stable across
    processes/runs, unlike Python's salted ``hash``)."""
    return zlib.crc32(s.encode("utf-8"), seed) & 0xFFFFFFFF


def pseudo_prob(s: str, lo: float = 0.5, hi: float = 1.0, seed: int = 7) -> float:
    """Stable pseudo-probability in [lo, hi) derived from a surface
    string — gives the pipeline non-degenerate, reproducible scores."""
    return lo + (hi - lo) * (stable_hash(s, seed) % 100_000) / 100_000.0


class GoldReplayScorer:
    """scores(tokens, gold) -> mentions with prob 1.0 (identity)."""

    def score_mentions(self, tokens: Sequence[str], gold: Sequence[Mention]) -> list[Mention]:
        return [(t, s, e, 1.0) for t, s, e, *_ in gold]


class GazetteerScorer:
    """Dictionary span scorer: any contiguous token span whose joined
    surface matches an alias-dictionary entry scores a stable pseudo
    probability in [0.5, 1). Spans are scanned only up to the longest
    dictionary entry (O(n * k) instead of O(n^2)) — the same
    candidate-restriction idea as the reference fast path (M17).
    """

    def __init__(self, alias: Mapping[str, str], token_deli: str = " "):
        self.alias = dict(alias)
        self.token_deli = token_deli
        self.max_len = max((len(m.split(token_deli)) if token_deli else len(m) for m in alias), default=1)
        if token_deli == "":
            self.max_len = max((len(m) for m in alias), default=1)

    def score_mentions(self, tokens: Sequence[str], gold: Sequence[Mention] = ()) -> list[Mention]:
        out: list[Mention] = []
        n = len(tokens)
        for s in range(n):
            for e in range(s + 1, min(s + self.max_len, n) + 1):
                surface = self.token_deli.join(tokens[s:e])
                ent_type = self.alias.get(surface)
                if ent_type is not None:
                    out.append((ent_type, s, e, pseudo_prob(surface)))
        return out


class HashBiaffineScorer:
    """Deterministic dense scorer with the reference compute shape.

    Token embeddings are seeded from stable hashes; start/end heads
    are fixed random projections (one per entity type); span score =
    sigmoid(start_h . end_h / sqrt(h)) — the reference 'self_attn'
    interaction (modules.py:627-631). Produces the FULL upper-triangle
    score matrix (M8, row-major) so the decode path and bench exercise
    the true O(n^2 * E) data volume.
    """

    def __init__(self, ent_types: Sequence[str], dim: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.ent_types = list(ent_types)
        self.dim = dim
        n_ent = len(self.ent_types)
        self.w_start = rng.randn(n_ent, dim, HEAD_SIZE).astype(np.float32) * 0.1
        self.w_end = rng.randn(n_ent, dim, HEAD_SIZE).astype(np.float32) * 0.1

    def embed(self, tokens: Sequence[str]) -> np.ndarray:
        n = len(tokens)
        out = np.empty((n, self.dim), dtype=np.float32)
        for i, tok in enumerate(tokens):
            r = np.random.RandomState(stable_hash(tok) % (2**31))
            out[i] = r.randn(self.dim).astype(np.float32)
        return out

    def score_matrix(self, tokens: Sequence[str]) -> np.ndarray:
        """[n(n+1)/2, n_ent] sigmoid scores in row-major span order."""
        x = self.embed(tokens)  # [n, d]
        # per-entity start/end heads: [e, n, h]
        hs = np.einsum("nd,edh->enh", x, self.w_start)
        he = np.einsum("nd,edh->enh", x, self.w_end)
        # scaled dot-product interaction: [e, n, n]
        logits = np.einsum("enh,emh->enm", hs, he) / np.sqrt(HEAD_SIZE)
        starts, ends = span_indices(len(tokens))
        tri = logits[:, starts, ends].T  # [n_spans, e] upper triangle, row-major
        return 1.0 / (1.0 + np.exp(-tri))


class PrunedBiaffineScorer:
    """The reference ``fast_predict`` path (O1/M17) on top of
    :class:`HashBiaffineScorer`: compute adjacency link scores from
    the token embeddings, keep only spans whose ENTIRE interior
    passes ``link_threshold``, and run the expensive interaction only
    on survivors — the model-side predicate pushdown. With
    ``link_threshold = -inf`` it is exactly the dense path.
    Parity: modules.py:810-896 (survivor gather), 225-286
    (fast_decode), train_ner.py:634-643 (assembly)."""

    def __init__(self, ent_types, dim: int = 64, seed: int = 42,
                 link_threshold: float = 0.0, decode_threshold: float = 0.5):
        self.dense = HashBiaffineScorer(ent_types, dim=dim, seed=seed)
        self.ent_types = list(ent_types)
        self.link_threshold = link_threshold
        self.decode_threshold = decode_threshold

    def score_mentions(self, tokens, gold=()):
        n = len(tokens)
        if n == 0:
            return []
        x = self.dense.embed(tokens)
        links = link_scores(x)
        starts, ends, mask = prune_spans(n, links, self.link_threshold)
        if starts.size == 0:
            return []
        # score ONLY survivor spans: gather start/end head vectors
        hs = np.einsum("nd,edh->enh", x, self.dense.w_start)  # [e,n,h]
        he = np.einsum("nd,edh->enh", x, self.dense.w_end)
        logits = np.einsum("esh,esh->se", hs[:, starts, :], he[:, ends, :]) / np.sqrt(HEAD_SIZE)
        probs = 1.0 / (1.0 + np.exp(-logits))
        span_idx, ent_idx = np.where(probs >= self.decode_threshold)
        return [
            (self.ent_types[int(c)], int(starts[i]), int(ends[i]) + 1, float(probs[i, c]))
            for i, c in zip(span_idx, ent_idx)
        ]


class GazetteerSeqScorer:
    """Sequence-labeling (BIO + CRF/Viterbi) twin of the gazetteer
    scorer: emissions favor ``B-<type>`` at dictionary tokens and 'O'
    elsewhere; decoding runs the numpy Viterbi (M16) with hard BIO
    transition constraints and attaches the mean emission-softmax
    prob (I2). Exercises the reference's seq arch end to end
    (modules.py:1122-1146 forward, train_ner.py:463-475 assembly).
    Single-token dictionary entries only (BIO seq path)."""

    def __init__(self, alias: dict, strength: float = 5.0):
        from qizner_spark.core.viterbi import bio_start_transitions, bio_transition_matrix

        self.alias = {k: v for k, v in alias.items() if " " not in k}
        types = sorted(set(self.alias.values()))
        self.tags = ["O"] + [f"{p}-{t}" for t in types for p in ("B", "I")]
        self.tag2id = {t: i for i, t in enumerate(self.tags)}
        self.id2tag = dict(enumerate(self.tags))
        self.trans = bio_transition_matrix(self.tags)
        self.start = bio_start_transitions(self.tags)
        self.strength = strength

    def score_mentions(self, tokens, gold=()):
        from qizner_spark.core.viterbi import assemble_seq_predictions, viterbi_decode

        n = len(tokens)
        if n == 0:
            return []
        em = np.zeros((n, len(self.tags)), dtype=np.float64)
        for i, tok in enumerate(tokens):
            t = self.alias.get(tok)
            if t is not None:
                em[i, self.tag2id[f"B-{t}"]] = self.strength
            else:
                em[i, self.tag2id["O"]] = self.strength
        path = viterbi_decode(em, self.trans, self.start)
        return assemble_seq_predictions(em, path, self.id2tag)


# ---------------------------------------------------------------------------
# Link scores + candidate-span pruning (M9 / M17)
# ---------------------------------------------------------------------------

def link_scores(embeddings: np.ndarray) -> np.ndarray:
    """Adjacent-token link logits: elementwise product of shifted
    embeddings summed over the hidden dim, scaled by 1/sqrt(h) — the
    reference ``fast_impl`` (modules.py:538-547). Returns [n-1]."""
    x = np.asarray(embeddings)
    if x.shape[0] < 2:
        return np.zeros(0, dtype=x.dtype)
    return (x[:-1] * x[1:]).sum(axis=-1) / np.sqrt(x.shape[-1])


def prune_spans(
    n_tokens: int, links: np.ndarray, link_threshold: float = 0.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep only spans whose ENTIRE interior link run passes the
    threshold (length-1 spans always survive) — vectorized with a
    prefix sum over failed links instead of the reference's cumprod
    trick (modules.py:1782-1855). Returns (starts, ends_closed,
    survivor_mask over the row-major enumeration)."""
    starts, ends = span_indices(n_tokens)
    bad = np.concatenate([[0], np.cumsum(np.asarray(links) < link_threshold)])
    # interior links of span (s, e_closed) are positions s .. e_closed-1
    n_bad = bad[ends] - bad[starts]
    mask = n_bad == 0
    return starts[mask], ends[mask], mask
