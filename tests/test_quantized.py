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


def test_quantized_specs_shard_w_q(rng):
    """esm_param_specs dispatches on the quantized layout (VERDICT r4 #4):
    w_q splits like w; w_s/b split on column-parallel linears only."""
    from jax.sharding import PartitionSpec as P

    from protein_clip_tpu.parallel import sharding as shard_mod

    cfg = esm2.ESM2Config.tiny()
    qp = esm2.quantize_params(esm2.init_params(jax.random.key(0), cfg))
    specs = shard_mod.esm_param_specs(qp)
    attn, ffn = specs["layers"]["attn"], specs["layers"]["ffn"]
    assert attn["q"]["w_q"] == P(None, None, "model")
    assert attn["q"]["w_s"] == P(None, "model")
    assert attn["o"]["w_q"] == P(None, "model", None)
    assert attn["o"]["w_s"] == P(None)          # dequant needs full scales
    assert ffn["wi"]["w_q"] == P(None, None, "model")
    assert ffn["wo"]["w_q"] == P(None, "model", None)
    # structural match: device_put succeeds leaf-for-leaf
    jax.tree.map(lambda a, b: None, qp, specs,
                 is_leaf=lambda x: isinstance(x, P))


def test_quantized_forward_matches_under_tp(rng):
    """int8 backbone forward over a 4-way 'model' mesh == single-device
    int8 forward exactly (GSPMD partitioning must not change the dynamic
    activation-quant max or the s32 dequant)."""
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel import sharding as shard_mod

    cfg = esm2.ESM2Config.tiny()
    params = esm2.init_params(jax.random.key(0), cfg)
    qp = esm2.quantize_params(params)
    ids = jnp.asarray(rng.integers(4, 24, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)
    ref = np.asarray(esm2.forward(qp, ids, mask, cfg))

    mesh = mesh_mod.make_mesh(data=2, model=4)
    qp_tp = shard_mod.shard_params(mesh, qp, shard_mod.esm_param_specs(qp))
    out = np.asarray(jax.jit(
        lambda p, i, m: esm2.forward(p, i, m, cfg))(qp_tp, ids, mask))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-6)


def test_quantized_sharded_clip_step_dp_x_tp(rng):
    """int8 x DP x TP end-to-end: one sharded CLIP train step over a
    dp2 x tp2 mesh with the quantized backbone matches the dp2-only step."""
    import optax

    from protein_clip_tpu.models import clip
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel import sharding as shard_mod
    from protein_clip_tpu.parallel.step import (make_sharded_train_step,
                                                shard_batch)
    from protein_clip_tpu.train import clip_engine

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    qp = esm2.quantize_params(esm2.init_params(jax.random.key(1), esm_cfg))
    params = clip.init_params(jax.random.key(2), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2)
    optimizer = optax.sgd(0.05)
    B, T = 8, 16
    batch = {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.ones((B, T), jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }
    key = jax.random.key(9)

    def run(mesh, esm_p):
        step = make_sharded_train_step(cfg, optimizer, mesh)
        return step(params, optimizer.init(params), esm_p,
                    shard_batch(mesh, batch), key)

    p_dp, _, loss_dp = run(mesh_mod.make_mesh(data=2, model=1), qp)
    mesh_tp = mesh_mod.make_mesh(data=2, model=2)
    qp_tp = shard_mod.shard_params(mesh_tp, qp,
                                   shard_mod.esm_param_specs(qp))
    p_tp, _, loss_tp = run(mesh_tp, qp_tp)

    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
