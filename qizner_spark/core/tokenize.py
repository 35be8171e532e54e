"""Tokenization + raw<->token offset maps (the byte-identity surface).

The reference wraps a HuggingFace fast tokenizer; torch/transformers
are not installed in this sandbox, so the tokenizer is PLUGGABLE: the
offset-map machinery below (the hard, semantics-bearing part) works
with any object exposing

    tokenize_word(word)  -> list[str]          (wordpiece, '##' cont.)
    encode_raw(raw_text) -> (sub_tokens, offset_mapping)

:class:`SimpleWordPiece` is a deterministic stand-in that exercises
the same shapes (multi-subtoken words, '##' continuations, dropped
whitespace, CJK single-char tokens). In production, swap in a HF fast
tokenizer — `zheng_process` consumes exactly the
``encode_plus(..., return_offsets_mapping=True)`` contract.

Reference parity:
  * ZH per-char tokenize (whitespace->[unused1], OOV->[UNK])
        -> /root/reference/data_reader.py:40-70
  * EN pre-split wordpiece + ori_indexes
        -> /root/reference/datautils.py:3074-3082
  * per-word tokenize, empty->[UNK], 5-subtoken cap (URL guard)
        -> /root/reference/datautils.py:3188-3200
  * ZHENG raw-text pipeline (nested '##' merge, char_lst rebuild,
    raw2char/char2raw maps, entity remap with end-collision fix)
        -> /root/reference/datautils.py:3084-3175
  * token-space -> raw-offset restore
        -> /root/reference/datautils.py:3177-3185
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterable, Sequence
from dataclasses import dataclass, field

from qizner_spark.core.labels import Mention

UNK = "[UNK]"
ZH_SPACE = "[unused1]"
MAX_SUBTOKENS_PER_WORD = 5  # reference URL guard, datautils.py:3195-3197


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0xF900 <= cp <= 0xFAFF
        or 0x3000 <= cp <= 0x303F
        or 0xFF00 <= cp <= 0xFFEF
    )


def _is_punct(ch: str) -> bool:
    return unicodedata.category(ch).startswith("P")


class SimpleWordPiece:
    """Deterministic wordpiece-style tokenizer (HF stand-in).

    Words longer than ``piece`` chars split into '##'-continued chunks
    of ``piece`` chars; CJK chars and punctuation are single tokens;
    whitespace is dropped (like BERT basic tokenization). An optional
    vocab set maps OOV single-char CJK tokens to [UNK].
    """

    def __init__(self, piece: int = 4, vocab: set[str] | None = None):
        self.piece = piece
        self.vocab = vocab
        self.unk_token = UNK

    def tokenize_word(self, word: str) -> list[str]:
        if not word or word.isspace():
            return []
        if len(word) == 1 and self.vocab is not None and word not in self.vocab:
            return [UNK]
        chunks = [word[i : i + self.piece] for i in range(0, len(word), self.piece)]
        return [chunks[0]] + [f"##{c}" for c in chunks[1:]]

    def _words_with_offsets(self, raw: str) -> list[tuple[str, int, int]]:
        out: list[tuple[str, int, int]] = []
        i, n = 0, len(raw)
        while i < n:
            ch = raw[i]
            if ch.isspace():
                i += 1
            elif _is_cjk(ch) or _is_punct(ch):
                out.append((ch, i, i + 1))
                i += 1
            else:
                j = i
                while j < n and not (raw[j].isspace() or _is_cjk(raw[j]) or _is_punct(raw[j])):
                    j += 1
                out.append((raw[i:j], i, j))
                i = j
        return out

    def encode_raw(self, raw: str) -> tuple[list[str], list[tuple[int, int]]]:
        """Raw string -> (sub_tokens, offset_mapping), the HF
        ``encode_plus(..., return_offsets_mapping=True,
        add_special_tokens=False)`` contract."""
        sub_tokens: list[str] = []
        offsets: list[tuple[int, int]] = []
        for word, ws, _we in self._words_with_offsets(raw):
            toks = self.tokenize_word(word)
            if toks == [UNK]:
                sub_tokens.append(UNK)
                offsets.append((ws, ws + len(word)))
                continue
            pos = ws
            for t in toks:
                body = t[2:] if t.startswith("##") else t
                sub_tokens.append(t)
                offsets.append((pos, pos + len(body)))
                pos += len(body)
        return sub_tokens, offsets


# ---------------------------------------------------------------------------
# T1: ZH per-character tokenization
# ---------------------------------------------------------------------------

def zh_char_tokenize(text: str, vocab: set[str] | None = None) -> list[str]:
    """One token per character; whitespace -> [unused1]; OOV -> [UNK]
    when a vocab is supplied. Parity: data_reader.py:40-70."""
    out = []
    for ch in text:
        if ch.isspace():
            out.append(ZH_SPACE)
        elif vocab is not None and ch not in vocab:
            out.append(UNK)
        else:
            out.append(ch)
    return out


# ---------------------------------------------------------------------------
# T2/T3: EN pre-split wordpiece
# ---------------------------------------------------------------------------

def tokenize_words(
    words: Sequence[str], tokenizer, max_len: int = MAX_SUBTOKENS_PER_WORD
) -> tuple[list[str], list[int]]:
    """Pre-split words -> flat (sub_tokens, ori_indexes). Empty
    tokenizations become [UNK]; words exceeding ``max_len`` subtokens
    are CAPPED at the first ``max_len`` (URL guard — a semantic detail
    the reference preserves). Parity: datautils.py:3074-3082, 3188-3200.
    """
    sub_tokens: list[str] = []
    ori_indexes: list[int] = []
    for i, word in enumerate(words):
        toks = tokenizer.tokenize_word(word)
        if not toks:
            toks = [getattr(tokenizer, "unk_token", UNK)]
        elif len(toks) > max_len:
            toks = toks[:max_len]
        sub_tokens.extend(toks)
        ori_indexes.extend([i] * len(toks))
    return sub_tokens, ori_indexes


# ---------------------------------------------------------------------------
# T4: ZHENG raw-text pipeline with offset maps
# ---------------------------------------------------------------------------

@dataclass
class ZhengResult:
    raw_text: str                       # preserved VERBATIM (byte identity)
    tokens: list[str]                   # merged word-level view (char_lst)
    sub_tokens: list[str]
    ori_indexes: list[int]              # subtoken -> token index
    raw2char: list[int]                 # raw char offset -> token index
    char2raw: dict[int, int]            # token index -> first raw offset
    mentions: list[Mention] = field(default_factory=list)  # token-space


def zheng_process(
    raw_text: str, mentions_raw: Iterable[Mention] = (), tokenizer=None
) -> ZhengResult:
    """Mixed ZH/EN raw string -> token view + raw<->token offset maps;
    input mention offsets (RAW-string coordinates) are remapped to
    token coordinates. ``raw_text`` is preserved verbatim — this is
    the byte-identity invariant (datautils.py:3099-3101).

    Steps (parity: datautils.py:3084-3175):
      1. tokenizer encodes raw -> sub_tokens + offset_mapping;
      2. '##' continuations merge into nested groups (3113-3121);
      3. tokens rebuilt by stripping '##' (3126-3135);
      4. raw2char built from offsets, gaps (dropped whitespace)
         back-filled from the RIGHT (3138-3147);
      5. char2raw keeps the FIRST raw offset per token, plus the
         closing entry {len(tokens): len(raw)} (3152-3158);
      6. entities remapped; an entity collapsed into its neighbouring
         token (new_end == new_start) gets end+1 (3160-3173); invalid
         (start >= end) dropped (clean_if_invalid_ent, 1249-1269).
    """
    tokenizer = tokenizer or SimpleWordPiece()
    sub_tokens, offsets = tokenizer.encode_raw(raw_text)

    if not sub_tokens:
        return ZhengResult(raw_text, [], [], [], [], {0: len(raw_text)}, [])

    nested_toks: list[list[str]] = [[sub_tokens[0]]]
    nested_offs: list[list[tuple[int, int]]] = [[offsets[0]]]
    for tok, off in zip(sub_tokens[1:], offsets[1:]):
        if len(tok) > 2 and tok[:2] == "##":
            nested_toks[-1].append(tok)
            nested_offs[-1].append(off)
        else:
            nested_toks.append([tok])
            nested_offs.append([off])

    ori_indexes = [i for i, grp in enumerate(nested_toks) for _ in grp]
    tokens = [grp[0] + "".join(t[2:] for t in grp[1:]) for grp in nested_toks]

    raw2char: list[int | None] = [None] * len(raw_text)
    for char_idx, offs in enumerate(nested_offs):
        for rs, re_ in offs:
            for i in range(rs, min(re_, len(raw_text))):
                raw2char[i] = char_idx
    nxt = len(tokens)  # positions past the last covered char map to n
    for i in range(len(raw_text) - 1, -1, -1):
        if raw2char[i] is None:
            raw2char[i] = nxt
        else:
            nxt = raw2char[i]

    char2raw: dict[int, int] = {}
    for r in range(len(raw_text) - 1, -1, -1):
        c = raw2char[r]
        if c < len(tokens):
            char2raw[c] = r  # iterating right->left keeps the FIRST raw offset
    char2raw[len(tokens)] = len(raw_text)

    mentions: list[Mention] = []
    for ent_type, start, end, *extra in mentions_raw:
        new_start = raw2char[start]
        if end == len(raw_text):
            new_end = raw2char[end - 1] + 1
        else:
            new_end = raw2char[end]
        if new_end == new_start:  # entity merged into a neighbouring token
            new_end = new_start + 1
        if new_start < new_end:  # clean_if_invalid_ent
            mentions.append((ent_type, new_start, new_end, *extra))

    return ZhengResult(
        raw_text=raw_text,
        tokens=tokens,
        sub_tokens=sub_tokens,
        ori_indexes=ori_indexes,
        raw2char=[int(x) for x in raw2char],
        char2raw=char2raw,
        mentions=mentions,
    )


def mentions_to_raw(mentions: Iterable[Mention], char2raw: dict[int, int]) -> list[Mention]:
    """Token-space mentions -> raw-string character offsets via the
    char2raw map emitted by :func:`zheng_process` — the final step
    before triple emission. Parity: datautils.py:3177-3185."""
    return [(t, char2raw[s], char2raw[e], *extra) for t, s, e, *extra in mentions]
