"""ESM-2 tokenizer: pure-NumPy table lookup + static-shape padding/bucketing.

The reference tokenizes per batch with HF's ``EsmTokenizer``
(``/root/reference/modules/training_utils.py:66-67``), whose vocabulary is the
fixed 33-token ESM alphabet (one token per residue character plus specials).
A Rust tokenizer is pointless for a 33-symbol character vocabulary: a 256-entry
byte lookup table vectorised with NumPy saturates host memory bandwidth, and a
C++ fast path (``protein_clip_tpu/data/native/tokenize.cc``) covers the
large-corpus offline case.

TPU-specific departure from the reference: the reference pads each batch to its
longest sequence, which on TPU would trigger one XLA recompilation per distinct
length.  Here ``pad_batch`` pads to a *bucket* length drawn from a small fixed
set so every batch reuses one of a handful of compiled programs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

# The canonical ESM alphabet ordering used by every facebook/esm2_* checkpoint.
# (Public constant from the ESM codebase; mirrors the vocab.txt that HF's
# EsmTokenizer loads for facebook/esm2_t30_150M_UR50D.)
ESM2_VOCAB: tuple[str, ...] = (
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K",
    "Q", "N", "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O",
    ".", "-", "<null_1>", "<mask>",
)

CLS_ID = 0
PAD_ID = 1
EOS_ID = 2
UNK_ID = 3
MASK_ID = 32

VOCAB_SIZE = len(ESM2_VOCAB)  # 33

# Default static pad buckets (tokens incl. <cls>/<eos>). The reference caps
# ingest at 2000 residues (modules/data_utils_2protein.py:88) => 2002 tokens.
# Sub-power-of-two steps (multiples of 64; T only needs sublane-8 alignment)
# cut padding waste for length-grouped batches (train.clip_engine.
# tokenize_grouped) at the cost of a few more cached compilations.
DEFAULT_BUCKETS: tuple[int, ...] = (
    32, 64, 128, 192, 256, 320, 384, 448, 512, 640, 768, 1024,
    1280, 1536, 2048,
)


def _build_byte_table() -> np.ndarray:
    table = np.full(256, UNK_ID, dtype=np.int32)
    for idx, tok in enumerate(ESM2_VOCAB):
        if len(tok) == 1:
            table[ord(tok)] = idx
    return table


_BYTE_TABLE = _build_byte_table()

# Multi-char special tokens, longest first, for greedy trie-style matching —
# matches HF's Trie over unique_no_split_tokens (tokenization_esm.py).
_SPECIALS = sorted(
    [t for t in ESM2_VOCAB if len(t) > 1], key=len, reverse=True
)
_SPECIAL_IDS = {t: ESM2_VOCAB.index(t) for t in _SPECIALS}


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    add_special_tokens: bool = True
    buckets: tuple[int, ...] = DEFAULT_BUCKETS
    # C++ batch fast path (data/native/tokenize.cc); falls back to NumPy
    # when the library is unavailable or sequences contain '<' specials.
    use_native: bool = True


_NATIVE = None
_NATIVE_FAILED = False


def _native_lib():
    global _NATIVE, _NATIVE_FAILED
    if _NATIVE is not None or _NATIVE_FAILED:
        return _NATIVE
    try:
        import ctypes
        from .native.build import build_library
        lib = ctypes.CDLL(str(build_library("tokenize")))
        lib.pct_tokenize_batch.restype = ctypes.c_int
        lib.pct_tokenize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _NATIVE = lib
    except Exception:  # pragma: no cover - toolchain missing
        _NATIVE_FAILED = True
        _NATIVE = None
    return _NATIVE


class EsmTokenizer:
    """Drop-in functional equivalent of HF EsmTokenizer for the ESM-2 vocab.

    ``__call__`` mirrors ``tokenizer(seqs, padding=True)`` from the reference
    hot loop but returns NumPy arrays padded to a static bucket length.
    """

    vocab = ESM2_VOCAB
    cls_id, pad_id, eos_id, unk_id, mask_id = CLS_ID, PAD_ID, EOS_ID, UNK_ID, MASK_ID
    vocab_size = VOCAB_SIZE

    def __init__(self, config: TokenizerConfig | None = None):
        self.config = config or TokenizerConfig()

    # -- single-sequence encode ------------------------------------------------
    def encode(self, seq: str, add_special_tokens: bool | None = None) -> np.ndarray:
        if add_special_tokens is None:
            add_special_tokens = self.config.add_special_tokens
        ids = self._encode_body(seq)
        if add_special_tokens:
            ids = np.concatenate(
                ([CLS_ID], ids, [EOS_ID])
            ).astype(np.int32)
        return ids

    @staticmethod
    def _encode_body(seq: str) -> np.ndarray:
        if "<" not in seq:
            # fast path: vectorised byte lookup
            raw = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
            return _BYTE_TABLE[raw].astype(np.int32)
        # slow path with multi-char special tokens (e.g. "<mask>")
        out: list[int] = []
        i = 0
        n = len(seq)
        while i < n:
            if seq[i] == "<":
                for sp in _SPECIALS:
                    if seq.startswith(sp, i):
                        out.append(_SPECIAL_IDS[sp])
                        i += len(sp)
                        break
                else:
                    out.append(_BYTE_TABLE[ord(seq[i]) & 0xFF])
                    i += 1
            else:
                out.append(int(_BYTE_TABLE[ord(seq[i]) & 0xFF]) if ord(seq[i]) < 256 else UNK_ID)
                i += 1
        return np.asarray(out, dtype=np.int32)

    def decode(self, ids: Sequence[int], skip_special: bool = True) -> str:
        toks = []
        for i in ids:
            t = ESM2_VOCAB[int(i)]
            if skip_special and t in ("<cls>", "<eos>", "<pad>"):
                continue
            toks.append(t)
        return "".join(toks)

    # -- batch encode + static-shape padding ------------------------------------
    def bucket_length(self, max_len: int) -> int:
        """Smallest configured bucket >= max_len (last bucket clamps)."""
        for b in self.config.buckets:
            if max_len <= b:
                return b
        return self.config.buckets[-1]

    def __call__(
        self,
        seqs: Sequence[str],
        pad_to: int | None = None,
        bucketed: bool = True,
        padding: bool | None = None,
        return_tensors: str | None = None,
    ) -> dict[str, np.ndarray]:
        """Tokenize a batch -> {'input_ids', 'attention_mask'} int32 arrays.

        pad_to: explicit static length; otherwise the bucket covering the
        longest sequence (or exact max length if bucketed=False, matching the
        reference's pad-to-longest semantics byte for byte).

        padding/return_tensors: HF EsmTokenizer call-compat shims —
        ``padding=True`` selects pad-to-longest (bucketed=False);
        return_tensors accepts 'np' (default behavior) only.
        """
        if padding is True:
            bucketed = False
        if return_tensors not in (None, "np"):
            raise ValueError(
                f"return_tensors={return_tensors!r} unsupported: arrays are "
                "NumPy; wrap with jnp.asarray for device use")
        if (self.config.use_native and seqs
                and not any("<" in s for s in seqs)):
            lib = _native_lib()
            if lib is not None:
                max_len = max(len(s) for s in seqs) + 2
                if pad_to is None:
                    pad_to = (self.bucket_length(max_len) if bucketed
                              else max_len)
                if max_len > pad_to:
                    self._warn_truncated(
                        sum(len(s) + 2 > pad_to for s in seqs), pad_to)
                return self._call_native(lib, seqs, pad_to)

        encs = [self.encode(s) for s in seqs]
        max_len = max((len(e) for e in encs), default=2)
        if pad_to is None:
            pad_to = self.bucket_length(max_len) if bucketed else max_len
        if max_len > pad_to:  # truncate (bucket clamp), keep eos
            self._warn_truncated(sum(len(e) > pad_to for e in encs), pad_to)
            encs = [
                np.concatenate((e[: pad_to - 1], [EOS_ID])) if len(e) > pad_to else e
                for e in encs
            ]
        batch = np.full((len(encs), pad_to), PAD_ID, dtype=np.int32)
        mask = np.zeros((len(encs), pad_to), dtype=np.int32)
        for row, e in enumerate(encs):
            batch[row, : len(e)] = e
            mask[row, : len(e)] = 1
        return {"input_ids": batch, "attention_mask": mask}


    @staticmethod
    def _warn_truncated(count: int, pad_to: int) -> None:
        """Loud truncation, matching the packed path's contract
        (train/packed_engine.py) — silently losing a >2046-residue chain's
        tail in the plain/grouped paths was invisible before."""
        import warnings
        warnings.warn(
            f"EsmTokenizer: {count} sequence(s) longer than the "
            f"pad/bucket cap {pad_to} were truncated (eos kept)",
            stacklevel=3)

    def _call_native(self, lib, seqs, pad_to: int) -> dict[str, np.ndarray]:
        import ctypes
        n = len(seqs)
        ids = np.empty((n, pad_to), dtype=np.int32)
        mask = np.empty((n, pad_to), dtype=np.int32)
        arr = (ctypes.c_char_p * n)(*[s.encode("latin-1") for s in seqs])
        lib.pct_tokenize_batch(
            arr, n, pad_to,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return {"input_ids": ids, "attention_mask": mask}


def write_hf_vocab(path: str) -> None:
    """Write the vocab in HF EsmTokenizer's vocab.txt format (test oracle)."""
    with open(path, "w") as f:
        f.write("\n".join(ESM2_VOCAB))
