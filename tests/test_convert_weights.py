"""Converter round-trip: HF checkpoint dir -> tools/convert_esm_weights.py
-> npz -> cli loading path -> full parity vs the torch source model.

The reference's every run loads a pretrained HF checkpoint
(/root/reference/main.py:20-24). The real facebook/esm2_* downloads are
network-gated here, but the FORMAT path is not: `save_pretrained` writes
the exact on-disk artifact `from_pretrained` reads, so driving the
converter against a locally-saved random EsmForMaskedLM exercises every
line the real checkpoint would — HF dir load, state-dict key mapping
("esm." prefix, per-layer stacking, torch (out,in)->(in,out) transposes),
npz export, and the `--esm-weights foo.npz` CLI load — leaving only the
downloaded VALUES untested (which cannot break a format contract).
"""

import runpy
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_clip_tpu.models import esm2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

CONVERTER = Path(__file__).resolve().parent.parent / "tools" / \
    "convert_esm_weights.py"


@pytest.fixture(scope="module")
def hf_checkpoint_dir(tmp_path_factory):
    """A real on-disk HF checkpoint (random weights, tiny dims): what
    `EsmForMaskedLM.from_pretrained(<dir>)` reads is exactly what
    `save_pretrained` writes — same artifact a hub download produces."""
    from transformers import EsmConfig, EsmForMaskedLM

    cfg = esm2.ESM2Config.tiny()
    hf_cfg = EsmConfig(
        vocab_size=33, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=1026, position_embedding_type="rotary",
        pad_token_id=1, mask_token_id=32, token_dropout=True,
        emb_layer_norm_before=False, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = EsmForMaskedLM(hf_cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_ckpt")
    model.save_pretrained(d)
    return d, model, cfg


def _run_converter(argv):
    old = sys.argv
    sys.argv = [str(CONVERTER)] + argv
    try:
        runpy.run_path(str(CONVERTER), run_name="__main__")
    finally:
        sys.argv = old


def _batch(rng, B=2, T=18):
    ids = rng.integers(4, 24, size=(B, T)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones((B, T), np.int64)
    ids[0, T - 1] = 2
    ids[1, T - 6] = 2
    ids[1, T - 5:] = 1
    mask[1, T - 5:] = 0
    return ids, mask


def test_converter_roundtrip_backbone_and_lm_head(hf_checkpoint_dir,
                                                  tmp_path, rng):
    ckpt_dir, hf_mlm, cfg = hf_checkpoint_dir
    out = tmp_path / "tiny.npz"
    _run_converter(["--hf", str(ckpt_dir), "--out", str(out),
                    "--config", "tiny", "--lm-head"])
    head_path = tmp_path / "tiny_lm_head.npz"
    assert out.exists() and head_path.exists()

    # load through the SAME path the CLIs use (--esm-weights foo.npz)
    from protein_clip_tpu.cli import common
    args = SimpleNamespace(esm_weights=str(out), esm_dtype="float32")
    params = common.load_esm(args, esm2.ESM2Config.tiny(
        compute_dtype=jnp.float32))

    ids, mask = _batch(rng)
    with torch.no_grad():
        hf_out = hf_mlm.esm(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask))
        ref_hidden = hf_out.last_hidden_state.numpy()
        ref_logits = hf_mlm(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask)).logits.numpy()

    hidden = esm2.forward(params, jnp.asarray(ids, jnp.int32),
                          jnp.asarray(mask, jnp.int32), cfg)
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(hidden)[valid], ref_hidden[valid],
                               atol=2e-5, rtol=2e-5)

    from protein_clip_tpu.train.checkpoint import load_npz
    like = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                        jax.eval_shape(lambda: esm2.init_lm_head(
                            jax.random.key(0), cfg)))
    lm_head = load_npz(head_path, like)
    logits = esm2.lm_logits(params, lm_head, hidden, cfg)
    np.testing.assert_allclose(np.asarray(logits)[valid], ref_logits[valid],
                               atol=2e-4, rtol=2e-4)


def test_hf_dir_loads_directly_via_cli_path(hf_checkpoint_dir, rng):
    """--esm-weights <hf dir> (no npz): the on-the-fly conversion branch of
    cli/common.load_esm must produce the same backbone."""
    ckpt_dir, hf_mlm, cfg = hf_checkpoint_dir
    from protein_clip_tpu.cli import common
    args = SimpleNamespace(esm_weights=str(ckpt_dir), esm_dtype="float32")
    params = common.load_esm(args, esm2.ESM2Config.tiny(
        compute_dtype=jnp.float32))

    ids, mask = _batch(rng)
    with torch.no_grad():
        ref = hf_mlm.esm(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask)
                         ).last_hidden_state.numpy()
    out = esm2.forward(params, jnp.asarray(ids, jnp.int32),
                       jnp.asarray(mask, jnp.int32), cfg)
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid],
                               atol=2e-5, rtol=2e-5)
