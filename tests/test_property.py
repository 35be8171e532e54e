"""Property-based tests (hypothesis) over the pure label-space /
segmentation core — the invariants that hold for ANY input, not just
the golden fixtures:

  * BIO round-trip: decode(encode(mentions)) == the flat mention set
    for non-overlapping inputs;
  * flatten_by_prob emits a non-overlapping subset of its input;
  * segmentation partitions tokens exactly and reassembled mention
    offsets match the originals that survived clipping;
  * simhash chunk bounds tile the 64-bit space exactly.
"""

from hypothesis import given, settings, strategies as st

from qizner_spark.core.labels import bio_decode, bio_encode, flatten_by_prob
from qizner_spark.core.segment import segment
from qizner_spark.operators.dedup import simhash_chunk_bounds

TYPES = ["PER", "LOC", "ORG"]


@st.composite
def flat_mentions(draw, max_tokens=40):
    """(n_tokens, non-overlapping mentions sorted by start)."""
    n = draw(st.integers(min_value=1, max_value=max_tokens))
    cuts = sorted(draw(st.sets(st.integers(0, n), max_size=8)) | {0, n})
    mentions = []
    for a, b in zip(cuts, cuts[1:]):
        if b > a and draw(st.booleans()):
            t = draw(st.sampled_from(TYPES))
            mentions.append((t, a, b))
    return n, mentions


@given(flat_mentions())
@settings(max_examples=200, deadline=None)
def test_bio_roundtrip(case):
    n, mentions = case
    tags = bio_encode(n, mentions)
    assert len(tags) == n
    got = sorted((t, s, e) for t, s, e in bio_decode(tags))
    assert got == sorted(mentions)


@st.composite
def scored_mentions(draw, max_tokens=30):
    n = draw(st.integers(min_value=1, max_value=max_tokens))
    k = draw(st.integers(min_value=0, max_value=10))
    ms = []
    for _ in range(k):
        s = draw(st.integers(0, n - 1))
        e = draw(st.integers(s + 1, n))
        t = draw(st.sampled_from(TYPES))
        p = draw(st.floats(0.01, 0.99, allow_nan=False))
        ms.append((t, s, e, p))
    return n, ms


@given(scored_mentions())
@settings(max_examples=200, deadline=None)
def test_flatten_nonoverlapping_subset(case):
    n, ms = case
    out = flatten_by_prob(n, ms)
    spans = sorted((s, e) for _, s, e, _ in out)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2, "flatten emitted overlapping spans"
    # every surviving (type, start, end) existed in the input
    in_keys = {(t, s, e) for t, s, e, _ in ms}
    assert all((t, s, e) in in_keys for t, s, e, _ in out)


@given(flat_mentions(max_tokens=60), st.integers(min_value=2, max_value=15))
@settings(max_examples=150, deadline=None)
def test_segment_partitions_tokens_and_rebases(case, max_size):
    n, mentions = case
    tokens = [f"w{i}" for i in range(n)]
    segs = segment(tokens, mentions, max_size=max_size)
    # tokens partition exactly, in order
    flat = [tok for s in segs for tok in s.tokens]
    assert flat == tokens
    # truncate CLIPS mentions at cuts (D1) rather than dropping them,
    # so the invariant is TOKEN COVERAGE: every (type, position) of
    # the originals is covered exactly once by the rebased segment
    # mentions, and nothing new appears
    from collections import Counter

    got_cover = Counter(
        (t, i)
        for s in segs for (t, a, b) in s.mentions
        for i in range(a + s.doc_offset, b + s.doc_offset)
    )
    want_cover = Counter((t, i) for t, a, b in mentions for i in range(a, b))
    assert got_cover == want_cover


@given(st.integers(min_value=0, max_value=63))
def test_simhash_chunks_tile_64_bits(max_hamming):
    bounds = simhash_chunk_bounds(max_hamming)
    covered = []
    for lo, width in bounds:
        assert 1 <= width <= 32
        covered.extend(range(lo, lo + width))
    assert covered == list(range(64))


@given(st.integers(min_value=64, max_value=200))
def test_simhash_chunks_reject_unblockable_distance(max_hamming):
    # distance >= n_bits admits complement pairs that share NO chunk:
    # the pigeonhole guarantee is unsatisfiable, so it must refuse
    # rather than silently drop qualifying pairs
    import pytest

    with pytest.raises(ValueError):
        simhash_chunk_bounds(max_hamming)
