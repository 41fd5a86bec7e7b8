"""Pipeline parallelism (parallel/pipeline.py) on the fake-device CPU mesh.

Invariants: the GPipe lockstep schedule computes the SAME per-token op
sequence as ``esm2.forward`` (layer scan merely split into per-stage scans),
so the pipelined backbone matches the single-device forward exactly, and the
pipelined train step matches the single-device engine step-for-step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protein_clip_tpu.models import clip, esm2
from protein_clip_tpu.ops.infonce import clip_infonce
from protein_clip_tpu.parallel import pipeline as pp
from protein_clip_tpu.train import clip_engine, optimizer as opt_mod


def _tiny4_cfg():
    return esm2.ESM2Config(hidden_size=64, num_layers=4, num_heads=4,
                           intermediate_size=128)


@pytest.fixture(scope="module")
def tiny4():
    """4-layer tiny backbone: divides into 2 or 4 stages."""
    esm_cfg = _tiny4_cfg()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = clip.init_params(jax.random.key(2), mcfg)
    return mcfg, esm_params, params


def _ids(rng, B, T):
    mask = np.ones((B, T), np.int32)
    mask[::3, T - 3:] = 0
    ids = rng.integers(4, 24, (B, T)).astype(np.int32)
    ids[mask == 0] = 1  # pad token
    return jnp.asarray(ids), jnp.asarray(mask)


def test_stage_params_shapes(tiny4):
    _, esm_params, _ = tiny4
    staged = pp.stage_esm_params(esm_params, 4)
    qw = staged["layers"]["attn"]["q"]["w"]
    assert qw.shape[:2] == (4, 1)
    with pytest.raises(ValueError):
        pp.stage_esm_params(esm_params, 3)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 2), (4, 7)])
def test_pp_encode_matches_forward(tiny4, rng, n_stages, n_micro):
    _, esm_params, _ = tiny4
    cfg = _tiny4_cfg()
    B, T = n_micro * 2, 12
    ids, mask = _ids(rng, B, T)

    ref = esm2.forward(esm_params, ids, mask, cfg)

    mesh = pp.make_pp_mesh(n_stages)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params,
                                                              n_stages))
    got = pp.make_pp_encode(cfg, mesh, n_micro)(staged, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_train_step_matches_single_device(tiny4, rng):
    mcfg, esm_params, params = tiny4
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=1)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)

    mesh = pp.make_pp_mesh(4)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 4))
    pp_step = pp.make_pp_train_step(cfg, optimizer, mesh, num_microbatches=4)
    single = clip_engine.make_train_step(cfg, optimizer,
                                         loss_fn=clip_infonce)

    ids_p, mask_p = _ids(rng, 8, 12)
    ids_r, mask_r = _ids(rng, 8, 12)
    batch = {"pep_ids": ids_p, "pep_mask": mask_p,
             "rec_ids": ids_r, "rec_mask": mask_r}

    p_pp, o_pp, p_sd, o_sd = params, opt_state, params, opt_state
    for i in range(2):
        key = jax.random.key(7 + i)
        p_pp, o_pp, loss_pp = pp_step(p_pp, o_pp, staged, batch, key)
        p_sd, o_sd, loss_sd = single(p_sd, o_sd, esm_params, batch, key)
        np.testing.assert_allclose(float(loss_pp), float(loss_sd),
                                   rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_sd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("opt_name", ["adam", "sgd"])
def test_pp_dp_train_step_matches_single_device(tiny4, rng, opt_name):
    """DP x PP composed: dp2 x stage4 over 8 fake devices must match the
    single-device engine at equal global batch, step for step. sgd is the
    scale-sensitive probe for the DP gradient pmean (ADVICE r2)."""
    import optax

    mcfg, esm_params, params = tiny4
    # dropout off for exactness: the DP side folds the data index into the
    # dropout rng (parallel/step.py contract), the single device does not
    mcfg = clip.CLIPConfig(**{**mcfg.__dict__, "dropout": 0.0})
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=1)
    optimizer = (opt_mod.adam(cfg.learning_rate) if opt_name == "adam"
                 else optax.sgd(5e-2))
    opt_state = optimizer.init(params)

    mesh = pp.make_pp_dp_mesh(2, 4)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 4))
    dp_pp_step = pp.make_pp_dp_train_step(cfg, optimizer, mesh,
                                          num_microbatches=2)
    single = clip_engine.make_train_step(cfg, optimizer,
                                         loss_fn=clip_infonce)

    ids_p, mask_p = _ids(rng, 8, 12)
    ids_r, mask_r = _ids(rng, 8, 12)
    batch = {"pep_ids": ids_p, "pep_mask": mask_p,
             "rec_ids": ids_r, "rec_mask": mask_r}

    p_pp, o_pp, p_sd, o_sd = params, opt_state, params, opt_state
    for i in range(2):
        key = jax.random.key(11 + i)
        p_pp, o_pp, loss_pp = dp_pp_step(p_pp, o_pp, staged, batch, key)
        p_sd, o_sd, loss_sd = single(p_sd, o_sd, esm_params, batch, key)
        np.testing.assert_allclose(float(loss_pp), float(loss_sd),
                                   rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_sd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pp_dp_tp_train_step_matches_single_device(tiny4, rng):
    """Full 3-axis composition: dp2 x stage2 x model2 over 8 fake devices.
    Staged weights carry Megatron 'model' splits (GSPMD auto axis); the
    step must still match the single-device engine exactly."""
    mcfg, esm_params, params = tiny4
    mcfg = clip.CLIPConfig(**{**mcfg.__dict__, "dropout": 0.0})
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=1)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)

    mesh = pp.make_pp_dp_mesh(2, 2, model=2)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 2))
    # weights must really be tensor-sharded: (S, L/S, in, out) q kernel
    # holds 1/(S*model) of the stack per chip
    qw = staged["layers"]["attn"]["q"]["w"]
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(1, qw.shape[1], qw.shape[2], qw.shape[3] // 2)}

    step = pp.make_pp_dp_train_step(cfg, optimizer, mesh,
                                    num_microbatches=2)
    single = clip_engine.make_train_step(cfg, optimizer,
                                         loss_fn=clip_infonce)

    ids_p, mask_p = _ids(rng, 8, 12)
    ids_r, mask_r = _ids(rng, 8, 12)
    batch = {"pep_ids": ids_p, "pep_mask": mask_p,
             "rec_ids": ids_r, "rec_mask": mask_r}
    key = jax.random.key(21)
    _, _, loss_pp = step(params, opt_state, staged, batch, key)
    _, _, loss_sd = single(params, opt_state, esm_params, batch, key)
    np.testing.assert_allclose(float(loss_pp), float(loss_sd), rtol=2e-5)


def test_pp_packed_train_step_matches_single_device(tiny4, rng):
    """PP x packed wire (VERDICT r3 #7): the GPipe schedule over packed
    ROWS (segment-masked attention, per-segment RoPE restarts,
    owner-permutation pooling) must match train/packed_engine's
    single-device packed step, step for step."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train.packed_engine import (make_train_step_packed,
                                                      tokenize_packed)

    mcfg, esm_params, params = tiny4
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=1)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)

    mesh = pp.make_pp_mesh(4)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 4))
    pp_step = pp.make_pp_packed_train_step(cfg, optimizer, mesh,
                                           num_microbatches=2)
    single = make_train_step_packed(cfg, optimizer, rows_per_chunk=2)

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    batch = tokenize_packed(EsmTokenizer(), seqs(8, 5, 12), seqs(8, 8, 14),
                            pep_row_len=16, rec_row_len=16)

    p_pp, o_pp, p_sd, o_sd = params, opt_state, params, opt_state
    for i in range(2):
        key = jax.random.key(31 + i)
        p_pp, o_pp, loss_pp = pp_step(p_pp, o_pp, staged, batch, key)
        p_sd, o_sd, loss_sd = single(p_sd, o_sd, esm_params, batch, key)
        np.testing.assert_allclose(float(loss_pp), float(loss_sd),
                                   rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_sd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pp_packed_rejects_tiered_packs(tiny4, rng):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    mcfg, esm_params, params = tiny4
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=1)
    optimizer = opt_mod.adam(cfg.learning_rate)
    mesh = pp.make_pp_mesh(2)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 2))
    step = pp.make_pp_packed_train_step(cfg, optimizer, mesh)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = ["".join(np.random.default_rng(i).choice(aas, 5 + 3 * (i % 4)))
            for i in range(8)]
    recs = ["".join(np.random.default_rng(99 + i).choice(aas, 100 + 200 * (i % 2)))
            for i in range(8)]
    batch = tokenize_packed(EsmTokenizer(), peps, recs, tier_widths=[128])
    assert "pep_packs" in batch or "rec_packs" in batch
    with pytest.raises(ValueError, match="flat packs"):
        step(params, optimizer.init(params), staged, batch,
             jax.random.key(0))


def test_pp_weights_actually_sharded(tiny4):
    """Each stage device must hold only its 1/S slice of the layer stack."""
    _, esm_params, _ = tiny4
    mesh = pp.make_pp_mesh(4)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 4))
    qw = staged["layers"]["attn"]["q"]["w"]  # (4, 1, H, H)
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(1, 1) + qw.shape[2:]}


def test_microbatch_divisibility_error(tiny4):
    mcfg, esm_params, params = tiny4
    mesh = pp.make_pp_mesh(2)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(esm_params, 2))
    enc = pp.make_pp_encode(_tiny4_cfg(), mesh, 3)
    ids = jnp.ones((8, 12), jnp.int32)
    with pytest.raises(ValueError, match="not divisible"):
        enc(staged, ids, jnp.ones_like(ids))


def test_pp_encode_quantized_backbone(tiny4, rng):
    """int8-quantized weights stage over 'stage' too (w_q/w_s leaves) and
    the pipelined forward matches the single-device quantized forward."""
    from protein_clip_tpu.models.esm2 import quantize_params

    _, esm_params, _ = tiny4
    cfg = _tiny4_cfg()
    qparams = quantize_params(esm_params)
    ids, mask = _ids(rng, 4, 12)

    ref = esm2.forward(qparams, ids, mask, cfg)

    mesh = pp.make_pp_mesh(2)
    staged = pp.shard_staged_params(mesh, pp.stage_esm_params(qparams, 2))
    assert staged["layers"]["attn"]["q"]["w_q"].dtype == jnp.int8
    got = pp.make_pp_encode(cfg, mesh, 2)(staged, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_finetune_step_matches_single_device(tiny4, rng):
    """UNFROZEN finetune THROUGH the pipeline (VERDICT r4 #5): gradients
    flow backward through the GPipe tick scan (reversed ppermute ring),
    each stage updates only its own f32 layer-slice masters, and the
    result must match the single-device two-pass gradcache finetune
    exactly. The PP side runs with remat=True (per-layer checkpoint) —
    rematerialisation must not change values, so this also pins the
    memory-bounded path's numerics. SGD: scale-sensitive probe."""
    import optax

    from protein_clip_tpu.train import finetune

    mcfg, esm_params, params = tiny4
    mcfg = clip.CLIPConfig(**{**mcfg.__dict__, "dropout": 0.0})
    cfg_sd = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                      accumulated_batches=1, num_chunks=2,
                                      remat=False)
    cfg_pp = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                      accumulated_batches=1, num_chunks=2,
                                      remat=True)
    optimizer = optax.sgd(5e-2)

    single = finetune.make_train_step(cfg_sd, optimizer)
    tr_sd = finetune.init_params(esm_params, params)
    o_sd = optimizer.init(tr_sd)

    mesh = pp.make_pp_mesh(4)
    tr_pp = pp.init_finetune_params(esm_params, params, mesh)
    o_pp = optimizer.init(tr_pp)
    pp_step = pp.make_pp_finetune_step(cfg_pp, optimizer, mesh,
                                       num_microbatches=4)

    ids_p, mask_p = _ids(rng, 8, 12)
    ids_r, mask_r = _ids(rng, 8, 12)
    batch = {"pep_ids": ids_p, "pep_mask": mask_p,
             "rec_ids": ids_r, "rec_mask": mask_r}

    for i in range(2):
        key = jax.random.key(7 + i)
        tr_pp, o_pp, loss_pp = pp_step(tr_pp, o_pp, {}, batch, key)
        tr_sd, o_sd, loss_sd = single(tr_sd, o_sd, {}, batch, key)
        np.testing.assert_allclose(float(loss_pp), float(loss_sd),
                                   rtol=1e-5)

    got = {"esm": pp.unstage_esm_params(tr_pp["esm"]),
           "heads": tr_pp["heads"]}
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(tr_sd)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))
