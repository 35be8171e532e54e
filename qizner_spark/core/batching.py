"""Batch assembly: dynamic padding + id conversion (M1 / T5 / O4).

Inside ``mapInPandas`` each Arrow batch becomes one padded numpy batch
— padding to the PER-BATCH max length (reference dynamic padding,
data_reader.py:207, 299), never the global 512.

Reference parity:
  * span/seq batchers (dynamic pad, attention mask, ori_indexes
    padded with -1, tags padded with 'O')
        -> /root/reference/data_reader.py:206-380
  * token->id + [CLS]/[SEP] wrapping (post_process)
        -> /root/reference/data_reader.py:126-179
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import numpy as np

CLS = "[CLS]"
SEP = "[SEP]"
UNK = "[UNK]"
PAD_ID = 0
ORI_INDEX_PAD = -1  # reference pads ori_indexes with -1 (data_reader.py:251-253)


def tokens_to_ids(
    tokens: Sequence[str], vocab: Mapping[str, int], add_special: bool = True
) -> list[int]:
    """T5: vocab lookup with [UNK] fallback, [CLS]...[SEP] wrapping.
    The vocab is a BROADCAST dict on executors (Any2Id equivalent,
    datautils.py:616-723)."""
    unk = vocab.get(UNK, 1)
    ids = [vocab.get(t, unk) for t in tokens]
    if add_special:
        ids = [vocab.get(CLS, 2)] + ids + [vocab.get(SEP, 3)]
    return ids


def pad_batch(
    id_lists: Sequence[Sequence[int]], pad_id: int = PAD_ID
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (ids [b, Lmax], attention_mask [b, Lmax], lengths [b]) with
    Lmax = max length IN THIS BATCH (dynamic padding, O4)."""
    lengths = np.asarray([len(x) for x in id_lists], dtype=np.int64)
    lmax = int(lengths.max()) if len(lengths) else 0
    ids = np.full((len(id_lists), lmax), pad_id, dtype=np.int64)
    mask = np.zeros((len(id_lists), lmax), dtype=np.int64)
    for i, x in enumerate(id_lists):
        ids[i, : len(x)] = x
        mask[i, : len(x)] = 1
    return ids, mask, lengths


def pad_ori_indexes(ori_lists: Sequence[Sequence[int]]) -> np.ndarray:
    """Pad subtoken->token maps with -1 (data_reader.py:251-253)."""
    lmax = max((len(x) for x in ori_lists), default=0)
    out = np.full((len(ori_lists), lmax), ORI_INDEX_PAD, dtype=np.int64)
    for i, x in enumerate(ori_lists):
        out[i, : len(x)] = x
    return out


def pad_tags(tag_lists: Sequence[Sequence[str]], pad_tag: str = "O") -> list[list[str]]:
    """Pad BIO tag rows with 'O' ('O' doubles as the pad tag,
    data_reader.py:106, 351-356)."""
    lmax = max((len(x) for x in tag_lists), default=0)
    return [list(x) + [pad_tag] * (lmax - len(x)) for x in tag_lists]


def group_mean_pool(subtoken_vectors: np.ndarray, ori_indexes: Sequence[int],
                    n_tokens: int) -> np.ndarray:
    """M3 SequenceGroupAggregating (mean mode — the mode the reference
    actually uses, modules.py:344, 1006): average subtoken vectors per
    original token via a normalized one-hot projection, negative
    group ids excluded (padding)."""
    ori = np.asarray(ori_indexes)
    valid = ori >= 0
    proj = np.zeros((n_tokens, len(ori)), dtype=subtoken_vectors.dtype)
    proj[ori[valid], np.nonzero(valid)[0]] = 1.0
    counts = proj.sum(axis=1, keepdims=True)
    proj = proj / np.maximum(counts, 1.0)
    return proj @ subtoken_vectors
