"""Tokenizer parity vs HF EsmTokenizer (oracle built from the same vocab).

Mirrors the reference's per-batch tokenize+pad call
(/root/reference/modules/training_utils.py:66-67).
"""

import numpy as np
import pytest

from protein_clip_tpu.data.tokenizer import (
    EsmTokenizer, TokenizerConfig, ESM2_VOCAB, PAD_ID, CLS_ID, EOS_ID, MASK_ID,
    write_hf_vocab,
)

SEQS = [
    "MKTVRQERLKSIVRILERSKEPVSGAQLAEELSVSRQVIVQDIAYLRSLGYNIVAT",
    "ACDEFGHIKLMNPQRSTVWY",
    "GLYALAARG",  # 3-letter resname concatenation style (2protein pipeline)
    "XXBUZO.-",
    "M",
]


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    vocab_path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    write_hf_vocab(str(vocab_path))
    return transformers.EsmTokenizer(str(vocab_path))


def test_encode_matches_hf(hf_tok):
    tok = EsmTokenizer()
    for s in SEQS:
        ours = tok.encode(s).tolist()
        theirs = hf_tok(s)["input_ids"]
        assert ours == theirs, s


def test_batch_pad_matches_hf_padding(hf_tok):
    # bucketed=False reproduces the reference's pad-to-longest exactly
    tok = EsmTokenizer()
    out = tok(SEQS, bucketed=False)
    ref = hf_tok(SEQS, padding=True)
    assert out["input_ids"].tolist() == ref["input_ids"]
    assert out["attention_mask"].tolist() == ref["attention_mask"]


def test_mask_token_roundtrip(hf_tok):
    tok = EsmTokenizer()
    s = "MK<mask>TV"
    ours = tok.encode(s).tolist()
    theirs = hf_tok(s)["input_ids"]
    assert ours == theirs
    assert MASK_ID in ours


def test_bucketing_static_shapes():
    tok = EsmTokenizer(TokenizerConfig(buckets=(8, 16, 32)))
    out = tok(["MKTV", "ACD"])  # max enc len 6 -> bucket 8
    assert out["input_ids"].shape == (2, 8)
    out2 = tok(["A" * 20])  # enc len 22 -> clamped to last bucket 32
    assert out2["input_ids"].shape == (1, 32)
    # clamp truncation keeps EOS and is LOUD (the packed path's contract;
    # a silently tail-less >2046-residue chain was invisible before)
    with pytest.warns(UserWarning, match="truncated"):
        out3 = tok(["A" * 100])
    assert out3["input_ids"].shape == (1, 32)
    assert out3["input_ids"][0, -1] == EOS_ID
    assert out3["input_ids"][0, 0] == CLS_ID


def test_truncation_warns_native_and_numpy():
    for native in (True, False):
        tok = EsmTokenizer(TokenizerConfig(buckets=(16,), use_native=native))
        with pytest.warns(UserWarning, match="1 sequence"):
            out = tok(["A" * 50, "MK"])
        assert out["input_ids"].shape == (2, 16)
        assert out["input_ids"][0, -1] == EOS_ID


def test_special_ids():
    assert ESM2_VOCAB[PAD_ID] == "<pad>"
    assert ESM2_VOCAB[CLS_ID] == "<cls>"
    assert ESM2_VOCAB[EOS_ID] == "<eos>"
    assert ESM2_VOCAB[MASK_ID] == "<mask>"


def test_decode_roundtrip():
    tok = EsmTokenizer()
    s = "MKTVRQERLK"
    assert tok.decode(tok.encode(s)) == s


def test_empty_sequence():
    # the 2protein pipeline can emit '' pairs (data_utils_2protein.py:60-61)
    tok = EsmTokenizer()
    ids = tok.encode("")
    assert ids.tolist() == [CLS_ID, EOS_ID]
    out = tok(["", "MK"])
    assert out["attention_mask"][0].sum() == 2


def test_native_batch_matches_numpy(rng):
    from protein_clip_tpu.data.tokenizer import _native_lib
    if _native_lib() is None:
        pytest.skip("native tokenizer unavailable")
    aas = list("LAGVSERTIDPKQNFYMHWCXBUZO")
    seqs = ["".join(rng.choice(aas, rng.integers(1, 200))) for _ in range(64)]
    seqs += ["", "M", "M1K 2V*zq"]  # edge cases incl. unk bytes
    fast = EsmTokenizer(TokenizerConfig(use_native=True))
    slow = EsmTokenizer(TokenizerConfig(use_native=False))
    a = fast(seqs)
    b = slow(seqs)
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])
    # truncation parity at a clamped bucket
    fast2 = EsmTokenizer(TokenizerConfig(buckets=(16,), use_native=True))
    slow2 = EsmTokenizer(TokenizerConfig(buckets=(16,), use_native=False))
    a2, b2 = fast2(seqs), slow2(seqs)
    np.testing.assert_array_equal(a2["input_ids"], b2["input_ids"])
    np.testing.assert_array_equal(a2["attention_mask"], b2["attention_mask"])


def test_native_falls_back_on_specials():
    t = EsmTokenizer(TokenizerConfig(use_native=True))
    out = t(["MK<mask>TV"])
    assert MASK_ID in out["input_ids"][0].tolist()
