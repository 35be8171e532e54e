"""Truncate/segment/split/merge golden tests (FIXTURES.md F8 D-cases)."""

from qizner_spark.core.segment import (
    combine,
    segment,
    sliding_context,
    split_by_delimiter,
    truncate,
    truncate_by_subtokens,
)

TOKENS = [f"w{i}" for i in range(10)]


class TestTruncate:
    def test_noop_when_fits(self):
        toks, ms = truncate(TOKENS, [("A", 0, 3)], 10)
        assert toks == TOKENS and ms == [("A", 0, 3)]

    def test_tail(self):
        toks, ms = truncate(TOKENS, [("A", 2, 5), ("B", 5, 9)], 6, "tail")
        assert toks == TOKENS[:6]
        # (2,5) intact; (5,9) clipped to (5,6)
        assert ms == [("A", 2, 5), ("B", 5, 6)]

    def test_head(self):
        toks, ms = truncate(TOKENS, [("A", 0, 3), ("B", 5, 9)], 6, "head")
        assert toks == TOKENS[4:]
        # (0,3) -> (-4,-1): crosses left edge -> dropped (end<0)
        # (5,9) -> (1,5)
        assert ms == [("B", 1, 5)]

    def test_head_partial_clip(self):
        toks, ms = truncate(TOKENS, [("A", 2, 6)], 6, "head")
        # shift 4: (-2, 2) -> clipped to (0, 2)
        assert ms == [("A", 0, 2)]

    def test_bothway(self):
        toks, ms = truncate(TOKENS, [("A", 4, 6)], 6, "bothway")
        # diff=4 -> left=2, right=2; (4,6)->(2,4)
        assert toks == TOKENS[2:8]
        assert ms == [("A", 2, 4)]

    def test_fully_outside_dropped(self):
        _, ms = truncate(TOKENS, [("A", 8, 10)], 6, "tail")
        assert ms == []


class TestTruncateBySubtokens:
    def test_fits(self):
        seg = truncate_by_subtokens(["w0"], [], ["a"], [0], max_size=5)
        assert seg.tokens == ["w0"] and seg.sub_tokens == ["a"]

    def test_removes_whole_words(self):
        # words: w0(1 sub), w1(3 subs), w2(1 sub); max 3 -> need 2 ->
        # removing w2 gives 1, still short -> remove w1 too
        seg = truncate_by_subtokens(
            ["w0", "w1", "w2"], [("A", 0, 1), ("B", 1, 3)],
            ["a", "b1", "b2", "b3", "c"], [0, 1, 1, 1, 2], max_size=3,
        )
        assert seg.tokens == ["w0"]
        assert seg.sub_tokens == ["a"]
        assert seg.ori_indexes == [0]
        # mention A survives; B clipped away entirely
        assert seg.mentions == [("A", 0, 1)]


class TestSegmentPlain:
    def test_no_split_needed(self):
        segs = segment(TOKENS, [("A", 0, 2)], max_size=20)
        assert len(segs) == 1
        assert segs[0].tokens == TOKENS and segs[0].doc_offset == 0

    def test_two_pieces(self):
        segs = segment(TOKENS, [("A", 2, 4), ("B", 6, 9)], max_size=6)
        assert [s.doc_offset for s in segs] == [0, 6]
        assert segs[0].tokens == TOKENS[:6]
        assert segs[1].tokens == TOKENS[6:]
        assert segs[0].mentions == [("A", 2, 4)]
        assert segs[1].mentions == [("B", 0, 3)]

    def test_prefix_context(self):
        segs = segment(TOKENS, [], max_size=6, prefix_context_len=2)
        assert segs[0].tokens == TOKENS[:6]
        assert segs[1].tokens == TOKENS[4:]
        assert segs[1].doc_offset == 4

    def test_entity_crossing_cut_is_clipped(self):
        segs = segment(TOKENS, [("A", 4, 8)], max_size=6)
        assert segs[0].mentions == [("A", 4, 6)]
        assert segs[1].mentions == [("A", 0, 2)]


class TestSegmentSubtokens:
    def test_never_splits_word(self):
        # words: w0 w1 w2; w1 has 3 subtokens; cut at max_size=4 falls
        # inside w2's territory... construct: subs [a, b1,b2,b3, c]
        toks = ["w0", "w1", "w2"]
        subs = ["a", "b1", "b2", "b3", "c"]
        oris = [0, 1, 1, 1, 2]
        segs = segment(toks, [], max_size=3, sub_tokens=subs, ori_indexes=oris)
        # cut=2 backtracks to 0 (inside w1) -> head keeps only w0; the
        # remainder [w1 w2] (4 subtokens) splits again after w1.
        assert [s.tokens for s in segs] == [["w0"], ["w1"], ["w2"]]
        assert [s.sub_tokens for s in segs] == [["a"], ["b1", "b2", "b3"], ["c"]]
        assert segs[1].ori_indexes == [0, 0, 0]
        assert [s.doc_offset for s in segs] == [0, 1, 2]

    def test_fits_exactly(self):
        toks = ["w0", "w1"]
        subs = ["a", "b"]
        segs = segment(toks, [], max_size=2, sub_tokens=subs, ori_indexes=[0, 1])
        assert len(segs) == 1

    def test_oversized_first_word_no_crash(self):
        """A single word with >= max_size subtokens (possible via
        zheng_process, which has no per-word cap) used to underflow
        the backtrack into negative indices; now the oversized word
        ships whole as its own segment."""
        toks = ["huge", "w1", "w2"]
        subs = [f"h{i}" for i in range(5)] + ["a", "b"]
        oris = [0] * 5 + [1, 2]
        segs = segment(toks, [], max_size=3, sub_tokens=subs, ori_indexes=oris)
        assert [s.tokens for s in segs] == [["huge"], ["w1", "w2"]]
        assert segs[0].sub_tokens == ["h0", "h1", "h2", "h3", "h4"]  # whole word
        assert segs[1].doc_offset == 1

    def test_single_oversized_word_document(self):
        toks = ["huge"]
        subs = [f"h{i}" for i in range(7)]
        segs = segment(toks, [], max_size=3, sub_tokens=subs, ori_indexes=[0] * 7)
        # no empty trailing segment may be emitted (it would flow into
        # the detection DAG as a zero-token document slice)
        assert [s.tokens for s in segs] == [["huge"]]
        assert segs[0].sub_tokens == subs

    def test_oversized_last_word_no_empty_tail(self):
        toks = ["w0", "huge"]
        subs = ["a"] + [f"h{i}" for i in range(5)]
        oris = [0] + [1] * 5
        segs = segment(toks, [], max_size=3, sub_tokens=subs, ori_indexes=oris)
        assert all(s.tokens and s.sub_tokens for s in segs)
        # full coverage, in order
        assert [t for s in segs for t in s.tokens] == toks

    def test_multiway_split_offsets(self):
        toks = [f"w{i}" for i in range(9)]
        subs = [f"s{i}" for i in range(9)]
        oris = list(range(9))
        segs = segment(toks, [("A", 0, 2), ("B", 4, 6), ("C", 7, 9)], max_size=3,
                       sub_tokens=subs, ori_indexes=oris)
        assert [s.doc_offset for s in segs] == [0, 3, 6]
        # reassembled global mentions match the original
        reassembled = []
        for s in segs:
            reassembled += [(t, a + s.doc_offset, b + s.doc_offset) for t, a, b in s.mentions]
        assert sorted(reassembled) == [("A", 0, 2), ("B", 4, 6), ("C", 7, 9)]


class TestSplitByDelimiter:
    def test_split_and_rebase(self):
        toks = ["a", "b", "。", "c", "d", "e", "。", "f"]
        ms = [("X", 0, 2), ("Y", 3, 5), ("Z", 1, 4)]  # Z crosses -> dropped
        segs = split_by_delimiter(toks, ms)
        assert [s.tokens for s in segs] == [["a", "b", "。"], ["c", "d", "e", "。"], ["f"]]
        assert segs[0].mentions == [("X", 0, 2)]
        assert segs[1].mentions == [("Y", 0, 2)]
        assert segs[2].mentions == []

    def test_no_trailing_piece_when_ends_with_deli(self):
        segs = split_by_delimiter(["a", "。"], [])
        assert len(segs) == 1


class TestCombine:
    def test_rebase(self):
        from qizner_spark.core.segment import Segment

        s1 = Segment(tokens=["a", "b"], mentions=[("X", 0, 2, 0.9)])
        s2 = Segment(tokens=["c"], mentions=[("Y", 0, 1, 0.8)])
        merged = combine([s1, s2])
        assert merged.tokens == ["a", "b", "c"]
        assert merged.mentions == [("X", 0, 2, 0.9), ("Y", 2, 3, 0.8)]

    def test_split_combine_roundtrip(self):
        toks = ["a", "b", "。", "c", "。"]
        ms = [("X", 0, 2), ("Y", 3, 4)]
        merged = combine(split_by_delimiter(toks, ms))
        assert merged.tokens == toks
        assert sorted(merged.mentions) == sorted(ms)


class TestSlidingContext:
    def test_windows(self):
        toks = ["a", "。", "b", "。", "c", "。"]
        segs = sliding_context(toks, [])
        assert [s.tokens for s in segs] == [
            ["a", "。", "b", "。"],
            ["a", "。", "b", "。", "c", "。"],
            ["b", "。", "c", "。"],
        ]
