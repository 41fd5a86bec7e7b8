"""Opt-in int8 (w8a8) backbone: accuracy envelope + engine integration."""

import numpy as np
import jax
import jax.numpy as jnp

from protein_clip_tpu.models import esm2


def _cos(a, b):
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantized_forward_tracks_f32(rng):
    cfg = esm2.ESM2Config.tiny()
    params = esm2.init_params(jax.random.key(0), cfg)
    qparams = esm2.quantize_params(params)
    B, T = 4, 32
    ids = jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    h32 = np.asarray(esm2.forward(params, ids, mask, cfg))
    h8 = np.asarray(esm2.forward(qparams, ids, mask, cfg))
    assert np.isfinite(h8).all()
    # int8 rounding drift stays small relative to the signal
    assert _cos(h32, h8) > 0.999
    rel = np.linalg.norm(h8 - h32) / np.linalg.norm(h32)
    assert rel < 0.05, rel


def test_quantized_weights_are_int8(rng):
    cfg = esm2.ESM2Config.tiny()
    qparams = esm2.quantize_params(
        esm2.init_params(jax.random.key(0), cfg))
    attn = qparams["layers"]["attn"]
    assert attn["q"]["w_q"].dtype == jnp.int8
    assert "w" not in attn["q"] and "w_s" in attn["q"]
    # LN and embeddings untouched
    assert "w" in attn["ln"]
    assert qparams["embed"]["word"].dtype != jnp.int8


def test_quantized_clip_embeddings_close(rng):
    """End-to-end: CLIP embeddings from the int8 backbone stay close to the
    f32 ones (retrieval ordering is what matters downstream)."""
    from protein_clip_tpu.models import clip

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    B, T = 6, 24
    batch = {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.ones((B, T), jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }
    pep32, rec32 = clip.forward(params, esm_params, batch, mcfg, train=False)
    pep8, rec8 = clip.forward(params, esm2.quantize_params(esm_params),
                              batch, mcfg, train=False)
    for a, b in ((pep32, pep8), (rec32, rec8)):
        for i in range(B):
            assert _cos(np.asarray(a)[i], np.asarray(b)[i]) > 0.99


def test_quantized_train_step_runs(rng):
    """The engine trains against a quantised backbone transparently."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip
    from protein_clip_tpu.train import clip_engine

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    qesm = esm2.quantize_params(esm2.init_params(jax.random.key(0), esm_cfg))
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=4,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    optimizer = optax.adam(1e-3)
    step = clip_engine.make_train_step(cfg, optimizer)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = ["".join(rng.choice(aas, 10)) for _ in range(4)]
    recs = ["".join(rng.choice(aas, 30)) for _ in range(4)]
    batch = clip_engine.tokenize_pair_batch(tok, peps, recs)
    _, _, loss = step(params, optimizer.init(params), qesm, batch,
                      jax.random.key(2))
    assert np.isfinite(float(loss))


def test_int8_defaults_to_tanh_gelu():
    """--esm-dtype int8 implies the tanh gelu (the erf epilogue forfeits
    int8's MXU win: 897 vs 1040 pairs/s at t30_150M, docs/PERF.md);
    --exact-gelu restores erf, and the parity dtypes stay erf-default."""
    from protein_clip_tpu.cli import common

    assert common.esm_config("tiny", "bfloat16").gelu == "erf"
    assert common.esm_config("tiny", "float32").gelu == "erf"
    assert common.esm_config("tiny", "bfloat16", fast_gelu=True).gelu == "tanh"
    assert common.esm_config("tiny", "int8").gelu == "tanh"
    assert common.esm_config("tiny", "int8", exact_gelu=True).gelu == "erf"
