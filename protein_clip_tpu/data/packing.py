"""Sequence packing: multiple sequences per padded row, segment-masked.

Length-grouped bucketing (train/clip_engine.tokenize_grouped) still pads
every sequence to its group bucket (~80% fill on Propedia-like lengths).
Packing fills rows to ~95%: first-fit-decreasing places whole tokenized
sequences into rows of a fixed length, and the model applies

- block-diagonal attention (tokens attend within their segment only),
- per-segment RoPE position restart,
- per-segment masked-mean pooling,

so each packed sequence's embedding is bit-comparable to its unpacked one
(tests/test_packing.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PackedBatch:
    ids: np.ndarray          # (R, L) int32 token ids, 1 (<pad>) in gaps
    segment_ids: np.ndarray  # (R, L) int32; 0 = empty, 1..K = segment
    positions: np.ndarray    # (R, L) int32; within-segment position
    # mapping back to input order: owner[i] = (row, segment_id) of seq i
    owner_row: np.ndarray    # (N,) int32
    owner_seg: np.ndarray    # (N,) int32
    n_sequences: int

    @property
    def max_segments(self) -> int:
        return int(self.segment_ids.max())


def pack_sequences(encodings: list[np.ndarray], row_len: int,
                   row_multiple: int = 16) -> PackedBatch:
    """First-fit-decreasing packing of tokenized sequences into rows.

    encodings: per-sequence id arrays (already <cls>...<eos>), each with
    len <= row_len. Rows are padded up to a multiple of ``row_multiple`` so
    compiled shapes repeat across batches.
    """
    n = len(encodings)
    lengths = [len(e) for e in encodings]
    if max(lengths, default=0) > row_len:
        raise ValueError(f"sequence longer than row_len={row_len}")

    order = sorted(range(n), key=lambda i: -lengths[i])
    rows: list[list[int]] = []
    free: list[int] = []
    for i in order:
        L = lengths[i]
        placed = False
        for r in range(len(rows)):
            if free[r] >= L:
                rows[r].append(i)
                free[r] -= L
                placed = True
                break
        if not placed:
            rows.append([i])
            free.append(row_len - L)

    n_rows = -(-len(rows) // row_multiple) * row_multiple
    ids = np.full((n_rows, row_len), 1, np.int32)       # <pad>
    seg = np.zeros((n_rows, row_len), np.int32)
    pos = np.zeros((n_rows, row_len), np.int32)
    owner_row = np.zeros(n, np.int32)
    owner_seg = np.zeros(n, np.int32)
    for r, members in enumerate(rows):
        cursor = 0
        for k, i in enumerate(members, start=1):
            e = encodings[i]
            ids[r, cursor:cursor + len(e)] = e
            seg[r, cursor:cursor + len(e)] = k
            pos[r, cursor:cursor + len(e)] = np.arange(len(e))
            owner_row[i] = r
            owner_seg[i] = k
            cursor += len(e)
    return PackedBatch(ids, seg, pos, owner_row, owner_seg, n)


def segment_pool_matrix(packed: PackedBatch) -> np.ndarray:
    """(N, R, L) one-hot selector: sel[i, r, t] = 1 where (r, t) belongs to
    sequence i. Used as a matmul to pool per-sequence sums from packed rows
    (and to count tokens)."""
    n = packed.n_sequences
    R, L = packed.ids.shape
    sel = np.zeros((n, R, L), np.float32)
    for i in range(n):
        r = packed.owner_row[i]
        sel[i, r] = (packed.segment_ids[r] == packed.owner_seg[i])
    return sel
