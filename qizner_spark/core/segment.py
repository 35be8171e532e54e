"""Document restructuring: truncate / segment / delimiter-split / merge.

All functions operate on the long-form mention representation of
:mod:`qizner_spark.core.labels` and are pure (inputs never mutated),
so they can run inside Arrow-batched UDFs.

Reference parity:
  * truncate (head/tail/bothway + entity clipping)
        -> /root/reference/datautils.py:1287-1343
  * subtoken-aware segmentation (never split a word; optional prefix
    context carried into the rear piece)
        -> /root/reference/datautils.py:1371-1437
  * delimiter split (cross-boundary entities dropped)
        -> /root/reference/datautils.py:2817-2851
  * segment merge with offset rebase
        -> /root/reference/datautils.py:2853-2883
  * sliding multi-sentence context windows
        -> /root/reference/datautils.py:2885-2899
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from qizner_spark.core.labels import Mention


@dataclass
class Segment:
    """One (piece of a) document: tokens + mentions (+ optional
    subtoken view for wordpiece-style models)."""

    tokens: list[str]
    mentions: list[Mention] = field(default_factory=list)
    sub_tokens: list[str] | None = None
    ori_indexes: list[int] | None = None  # subtoken -> token index
    # token offset of this segment within the ORIGINAL document,
    # before prefix-context extension (lets the merge stage emit
    # document-global offsets without a shuffle).
    doc_offset: int = 0


def _clip_mentions(mentions: Sequence[Mention], shift: int, new_len: int) -> list[Mention]:
    """Shift mention coords by -shift, then clip to [0, new_len):
    a mention crossing a cut keeps its inside part; a mention fully
    outside is dropped. Parity: datautils.py:1316-1337 (closed-end
    clipping arithmetic)."""
    out: list[Mention] = []
    for ent_type, start, end, *extra in mentions:
        s = start - shift
        e = end - shift - 1  # closed end, as the reference clips
        if s < 0:
            if e < 0:
                continue
            s = 0
        if e >= new_len:
            if s >= new_len:
                continue
            e = new_len - 1
        out.append((ent_type, s, e + 1, *extra))
    return out


def truncate(
    tokens: Sequence[str],
    mentions: Sequence[Mention],
    max_size: int,
    direction: str = "bothway",
) -> tuple[list[str], list[Mention]]:
    """Cut the token list to ``max_size`` from the head, tail or both
    ends; mention coordinates shifted and clipped accordingly.
    Parity: datautils.py:1287-1343."""
    n = len(tokens)
    if n <= max_size:
        return list(tokens), list(mentions)
    diff = n - max_size
    if direction == "head":
        new_tokens = list(tokens[diff:])
        shift = diff
    elif direction == "tail":
        new_tokens = list(tokens[:-diff])
        shift = 0
    elif direction == "bothway":
        left = diff // 2
        right = diff - left
        new_tokens = list(tokens[left : n - right])
        shift = left
    else:
        raise NotImplementedError(direction)
    return new_tokens, _clip_mentions(mentions, shift, len(new_tokens))


def truncate_by_subtokens(
    tokens: Sequence[str],
    mentions: Sequence[Mention],
    sub_tokens: Sequence[str],
    ori_indexes: Sequence[int],
    max_size: int = 512,
) -> Segment:
    """Truncate in SUBTOKEN units from the tail, removing WHOLE words
    until the subtoken count fits, then clipping mentions to the
    surviving words. Parity: datautils.py:1345-1369
    (truncate_by_bert_tok_char_lst, direction='tail' only)."""
    if len(sub_tokens) <= max_size:
        return Segment(list(tokens), list(mentions), list(sub_tokens), list(ori_indexes))
    need = len(sub_tokens) - max_size
    # subtokens per word, walked from the end
    counts: list[int] = [0] * len(tokens)
    for oi in ori_indexes:
        counts[oi] += 1
    removed_subs = 0
    removed_words = 0
    for c in reversed(counts):
        removed_subs += c
        removed_words += 1
        if removed_subs >= need:
            break
    keep_words = len(tokens) - removed_words
    new_tokens, new_mentions = truncate(tokens, mentions, keep_words, "tail")
    keep_subs = len(sub_tokens) - removed_subs
    return Segment(
        tokens=new_tokens,
        mentions=new_mentions,
        sub_tokens=list(sub_tokens[:keep_subs]),
        ori_indexes=list(ori_indexes[:keep_subs]),
    )


def _split_once(seg: Segment, max_size: int, prefix_context_len: int) -> tuple[Segment, Segment | None]:
    """Split an over-long segment into a fitting head and a remainder.
    With a subtoken view, the cut is chosen in SUBTOKEN units and
    backtracked so it never splits a word (the ori_indexes[o] ==
    ori_indexes[o+1] backtrack, datautils.py:1384-1385); the rear
    piece optionally carries ``prefix_context_len`` tokens of overlap
    with reindexed ori_indexes (datautils.py:1400-1407)."""
    if seg.sub_tokens is not None:
        assert seg.ori_indexes is not None
        if len(seg.sub_tokens) <= max_size:
            return seg, None
        cut = max_size - 1
        while cut > 0 and seg.ori_indexes[cut] == seg.ori_indexes[cut + 1]:
            cut -= 1
        if cut == 0 and seg.ori_indexes[0] == seg.ori_indexes[1]:
            # the FIRST word alone has >= max_size subtokens (possible
            # via zheng_process, whose output has no per-word cap —
            # unlike tokenize_words' 5-subtoken limit): never split a
            # word, so emit it whole as the head; this head exceeds
            # max_size by the word's tail but guarantees progress
            # instead of the old negative-index crash.
            first_word = seg.ori_indexes[0]
            while cut + 1 < len(seg.ori_indexes) and seg.ori_indexes[cut + 1] == first_word:
                cut += 1
        word_cut = seg.ori_indexes[cut]
        n_prev_subs = cut + 1
        n_prev_toks = word_cut + 1

        prev_tokens, prev_mentions = truncate(seg.tokens, seg.mentions, n_prev_toks, "tail")
        prev = Segment(
            tokens=prev_tokens,
            mentions=prev_mentions,
            sub_tokens=seg.sub_tokens[:n_prev_subs],
            ori_indexes=seg.ori_indexes[:n_prev_subs],
            doc_offset=seg.doc_offset,
        )

        # the context prefix can only reach back over words that EXIST
        # before the cut: clamp, else rear_word_start goes negative
        # (never found -> wrong drop) and doc_offset <= 0 stalls the
        # split loop re-emitting the same head forever
        pcl = min(prefix_context_len, word_cut)
        rear_n_toks = len(seg.tokens) - n_prev_toks + pcl
        if rear_n_toks == 0:
            # the oversized-first-word head consumed every token (the
            # word was the only/last content and pcl clamped to 0):
            # emitting a rear here would be an EMPTY segment flowing
            # into the detection DAG
            return prev, None
        rear_tokens, rear_mentions = truncate(seg.tokens, seg.mentions, rear_n_toks, "head")
        rear_word_start = word_cut - pcl
        drop = 0
        for i in range(cut, -1, -1):
            if seg.ori_indexes[i] == rear_word_start:
                drop = i
                break
        n_drop_subs = drop + 1
        rear = Segment(
            tokens=rear_tokens,
            mentions=rear_mentions,
            sub_tokens=seg.sub_tokens[n_drop_subs:],
            ori_indexes=[i - (n_prev_toks - pcl) for i in seg.ori_indexes[n_drop_subs:]],
            doc_offset=seg.doc_offset + n_prev_toks - pcl,
        )
        return prev, rear

    if len(seg.tokens) <= max_size:
        return seg, None
    # clamp: context >= max_size would make the rear start at or
    # before the head start (no progress)
    pcl = min(prefix_context_len, max_size - 1)
    prev_tokens, prev_mentions = truncate(seg.tokens, seg.mentions, max_size, "tail")
    prev = Segment(tokens=prev_tokens, mentions=prev_mentions, doc_offset=seg.doc_offset)
    rear_n = len(seg.tokens) - max_size + pcl
    rear_tokens, rear_mentions = truncate(seg.tokens, seg.mentions, rear_n, "head")
    rear = Segment(
        tokens=rear_tokens,
        mentions=rear_mentions,
        doc_offset=seg.doc_offset + max_size - pcl,
    )
    return prev, rear


def segment(
    tokens: Sequence[str],
    mentions: Sequence[Mention],
    max_size: int = 512,
    prefix_context_len: int = 0,
    sub_tokens: Sequence[str] | None = None,
    ori_indexes: Sequence[int] | None = None,
) -> list[Segment]:
    """Split an over-long document into <= ``max_size``-unit pieces
    (subtoken units when a subtoken view is given, token units
    otherwise), repeatedly cutting a fitting head off the remainder.
    Parity: datautils.py:1424-1437 (loop) + 1371-1422 (single split).
    """
    cur = Segment(
        tokens=list(tokens),
        mentions=list(mentions),
        sub_tokens=list(sub_tokens) if sub_tokens is not None else None,
        ori_indexes=list(ori_indexes) if ori_indexes is not None else None,
        doc_offset=0,
    )
    out: list[Segment] = []
    while True:
        head, rest = _split_once(cur, max_size, prefix_context_len)
        out.append(head)
        if rest is None:
            return out
        cur = rest


def split_by_delimiter(
    tokens: Sequence[str], mentions: Sequence[Mention], deli: str = "。"
) -> list[Segment]:
    """Split a document after every delimiter token; mentions fully
    inside a piece are kept (rebased), CROSS-BOUNDARY mentions are
    dropped. A trailing piece without a delimiter is kept.
    Parity: datautils.py:2817-2851."""
    out: list[Segment] = []
    prev_end = 0

    def emit(seg_start: int, seg_end: int) -> None:
        seg_tokens = list(tokens[seg_start:seg_end])
        seg_mentions = [
            (t, s - seg_start, e - seg_start, *extra)
            for t, s, e, *extra in mentions
            if s >= seg_start and e <= seg_end
        ]
        out.append(Segment(tokens=seg_tokens, mentions=seg_mentions, doc_offset=seg_start))

    for idx, tok in enumerate(tokens):
        if tok == deli:
            emit(prev_end, idx + 1)
            prev_end = idx + 1
    if prev_end < len(tokens):
        emit(prev_end, len(tokens))
    return out


def combine(segments: Sequence[Segment]) -> Segment:
    """Concatenate segments back into one document: token lists
    appended, mention offsets rebased by the running length.
    Parity: datautils.py:2853-2883."""
    tokens: list[str] = []
    mentions: list[Mention] = []
    offset = 0
    for seg in segments:
        tokens.extend(seg.tokens)
        mentions.extend((t, s + offset, e + offset, *extra) for t, s, e, *extra in seg.mentions)
        offset += len(seg.tokens)
    return Segment(tokens=tokens, mentions=mentions, doc_offset=0)


def sliding_context(
    tokens: Sequence[str], mentions: Sequence[Mention], deli: str = "。"
) -> list[Segment]:
    """Sentence-split then re-emit each sentence with one sentence of
    context on each side (2 sentences at the edges, 3 in the middle).
    Parity: datautils.py:2885-2899."""
    sents = split_by_delimiter(tokens, mentions, deli)
    n = len(sents)
    out: list[Segment] = []
    for i in range(n):
        if n == 1:
            group = [sents[0]]
        elif i == 0:
            group = [sents[0], sents[1]]
        elif i == n - 1:
            group = [sents[n - 2], sents[n - 1]]
        else:
            group = [sents[i - 1], sents[i], sents[i + 1]]
        merged = combine(group)
        merged.doc_offset = group[0].doc_offset
        out.append(merged)
    return out
