"""Multi-chip logic on the 8-fake-device CPU mesh.

Key invariant (SURVEY.md §7 build step 5): the sharded global-batch loss and
updates are numerically identical to the single-device computation at the
same global batch — negatives span the mesh via the embedding all-gather.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from protein_clip_tpu.models import clip, esm2
from protein_clip_tpu.parallel import mesh as mesh_mod
from protein_clip_tpu.parallel import sharding as shard_mod
from protein_clip_tpu.parallel.step import (
    make_sharded_eval_step, make_sharded_train_step, shard_batch,
)
from protein_clip_tpu.train import clip_engine


@pytest.fixture(scope="module")
def tiny():
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = clip.init_params(jax.random.key(2), mcfg)
    return mcfg, esm_params, params


def _batch(rng, B, T):
    mask = np.ones((B, T), np.int32)
    mask[::3, T - 2:] = 0
    return {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.asarray(mask),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }


def _opt(name: str) -> optax.GradientTransformation:
    """adam is scale-invariant (up to eps) and would mask an n_data-times
    gradient-scale bug; sgd is the scale-sensitive probe (ADVICE r2: the
    psum-of-global-loss grads were exactly 8x on an 8-device mesh)."""
    return optax.adam(1e-3) if name == "adam" else optax.sgd(5e-2)


BOTH_OPTS = pytest.mark.parametrize("opt_name", ["adam", "sgd"])


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    m = mesh_mod.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh_mod.make_mesh(model=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_sharded_eval_matches_single_device(tiny, rng):
    mcfg, esm_params, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, num_chunks=8)
    b = _batch(rng, 16, 12)
    single = clip_engine.make_eval_step(cfg)(params, esm_params, b)

    m = mesh_mod.make_mesh()  # data=8
    eval_step = make_sharded_eval_step(cfg, m)
    sharded_loss = eval_step(params, esm_params, shard_batch(m, b))
    np.testing.assert_allclose(float(single), float(sharded_loss), rtol=2e-5)


@BOTH_OPTS
def test_sharded_train_step_matches_single_device(tiny, rng, opt_name):
    """One optimizer step, deterministic path: params must match."""
    mcfg, esm_params, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, num_chunks=8,
                                   remat=False)
    # dropout off for exactness
    mcfg_nodrop = clip.CLIPConfig(**{**mcfg.__dict__, "dropout": 0.0})
    cfg = clip_engine.EngineConfig(model=mcfg_nodrop, batch_size=2,
                                   accumulated_batches=8, num_chunks=8,
                                   remat=False)
    b = _batch(rng, 16, 12)
    optimizer = _opt(opt_name)
    opt0 = optimizer.init(params)
    rng_key = jax.random.key(9)

    p1, o1, l1 = clip_engine.make_train_step(cfg, optimizer)(
        params, opt0, esm_params, b, rng_key)

    m = mesh_mod.make_mesh()
    step = make_sharded_train_step(cfg, optimizer, m)
    p2, o2, l2 = step(params, opt0, esm_params, shard_batch(m, b), rng_key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_tensor_parallel_esm_forward(tiny, rng):
    """ESM forward with TP-sharded params == replicated forward."""
    mcfg, esm_params, _ = tiny
    b = _batch(rng, 8, 16)
    ref = esm2.forward(esm_params, b["pep_ids"], b["pep_mask"], mcfg.esm)

    m = mesh_mod.make_mesh(model=2)  # data=4, model=2
    specs = shard_mod.esm_param_specs(esm_params)
    sharded_params = shard_mod.shard_params(m, esm_params, specs)

    fwd = jax.jit(lambda p, i, am: esm2.forward(p, i, am, mcfg.esm))
    out = fwd(sharded_params, b["pep_ids"], b["pep_mask"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_dp_tp_combined_train_step(tiny, rng):
    """data=4 x model=2 mesh: manual DP + GSPMD TP in one step."""
    mcfg, esm_params, params = tiny
    mcfg_nodrop = clip.CLIPConfig(**{**mcfg.__dict__, "dropout": 0.0})
    cfg = clip_engine.EngineConfig(model=mcfg_nodrop, batch_size=4,
                                   accumulated_batches=4, num_chunks=4,
                                   remat=False)
    b = _batch(rng, 16, 12)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)

    p1, _, l1 = clip_engine.make_train_step(cfg, optimizer)(
        params, opt0, esm_params, b, jax.random.key(0))

    m = mesh_mod.make_mesh(model=2)
    esm_sharded = shard_mod.shard_params(
        m, esm_params, shard_mod.esm_param_specs(esm_params))
    step = make_sharded_train_step(cfg, optimizer, m)
    p2, _, l2 = step(params, opt0, esm_sharded, shard_batch(m, b),
                     jax.random.key(0))
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-3)


@BOTH_OPTS
def test_sharded_filip_step_matches_single_device(tiny, rng, opt_name):
    """Multi-chip FILIP: token-gather DP step == single-device step."""
    from protein_clip_tpu.models import filip as filip_mod
    from protein_clip_tpu.parallel.filip_step import (
        make_sharded_filip_train_step)
    from protein_clip_tpu.train import filip_engine

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip_mod.FILIPConfig(input_dim=esm_cfg.hidden_size,
                                 embedding_dim=16, h1=2, h2=2, dropout=0.0,
                                 esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = filip_mod.init_params(jax.random.key(2), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=1, num_chunks=1,
                                   remat=False)
    b = _batch(rng, 16, 12)
    optimizer = _opt(opt_name)
    opt0 = optimizer.init(params)

    single = filip_engine.make_train_step(
        cfg, optimizer, similarity_fn=filip_mod.filip_similarity)
    p1, _, l1 = single(params, opt0, esm_params, b, jax.random.key(0))

    m = mesh_mod.make_mesh()  # data=8, local batch 2
    step = make_sharded_filip_train_step(cfg, optimizer, m)
    p2, _, l2 = step(params, opt0, esm_params, shard_batch(m, b),
                     jax.random.key(0))
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-3)


def test_tp_safe_model_config_switches_fused_to_eager():
    """GSPMD can't partition a Pallas custom call over the auto 'model'
    axis; sharded steps must drop to eager attention exactly when TP is
    real."""
    import dataclasses

    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.step import tp_safe_model_config

    esm_cfg = esm2.ESM2Config.tiny(attention_impl="fused")
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)

    tp_mesh = mesh_mod.make_mesh(data=4, model=2)
    assert tp_safe_model_config(mcfg, tp_mesh).esm.attention_impl == "eager"

    dp_mesh = mesh_mod.make_mesh(data=8, model=1)
    assert tp_safe_model_config(mcfg, dp_mesh).esm.attention_impl == "fused"
    # untouched config object for the pure-DP case
    assert tp_safe_model_config(mcfg, dp_mesh) is mcfg


@BOTH_OPTS
def test_sharded_mlm_step_matches_manual_global_mean(rng, opt_name):
    """DP MLM: psum'd (sum, count) loss == manually reconstructed global
    mean over all shards' masked positions, and one optimizer step on the
    LM head matches the equivalent single-device computation."""
    import optax

    from protein_clip_tpu.models import esm2, mlm
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.mlm_step import (
        make_sharded_mlm_train_step)

    esm_cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), esm_cfg)
    optimizer = _opt(opt_name)
    opt_state = optimizer.init(lm_head)

    n_dp, B, T = 4, 8, 16
    mesh = mesh_mod.make_mesh(data=n_dp, model=1)
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 24, (B, T)),
                      jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    key = jax.random.key(7)

    step = make_sharded_mlm_train_step(esm_cfg, optimizer, mesh,
                                       mask_prob=0.3)
    new_head, _, loss = step(lm_head, opt_state, esm_params, ids, mask, key)

    # reconstruct: each shard masks with fold_in(key, shard_index)
    shard = B // n_dp
    total_s, total_c = 0.0, 0.0
    grads_sum = None
    for i in range(n_dp):
        k = jax.random.fold_in(key, i)
        ids_i = ids[i * shard:(i + 1) * shard]
        mask_i = mask[i * shard:(i + 1) * shard]
        masked, labels = mlm.mask_tokens(k, ids_i, mask_i, 0.3)
        s, c = mlm.mlm_loss_terms(esm_params, lm_head, masked, mask_i,
                                  labels, esm_cfg)
        total_s += float(s)
        total_c += float(c)
    expect_loss = total_s / max(total_c, 1.0)
    np.testing.assert_allclose(float(loss), expect_loss, rtol=1e-5)

    # grads: d(global mean)/d(head) accumulated across shards
    def global_loss(h):
        s_all, c_all = 0.0, 0.0
        for i in range(n_dp):
            k = jax.random.fold_in(key, i)
            ids_i = ids[i * shard:(i + 1) * shard]
            mask_i = mask[i * shard:(i + 1) * shard]
            masked, labels = mlm.mask_tokens(k, ids_i, mask_i, 0.3)
            s, c = mlm.mlm_loss_terms(esm_params, h, masked, mask_i,
                                      labels, esm_cfg)
            s_all = s_all + s
            c_all = c_all + c
        return s_all / jnp.maximum(c_all, 1.0)

    grads = jax.grad(global_loss)(lm_head)
    updates, _ = optimizer.update(grads, optimizer.init(lm_head), lm_head)
    expect_head = optax.apply_updates(lm_head, updates)
    for a, b in zip(jax.tree.leaves(new_head), jax.tree.leaves(expect_head)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@BOTH_OPTS
def test_sharded_packed_mlm_step_matches_manual_global_mean(rng, opt_name):
    """DP packed MLM: rows dealt over 'data' (tokenize_packed_rows_sharded)
    reproduce the manually reconstructed global mean over every shard's
    masked positions (per-shard fold_in masks, segment-aware loss terms),
    and the LM-head update matches the single-device equivalent."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer, PAD_ID
    from protein_clip_tpu.models import esm2, mlm
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.mlm_step import (
        make_sharded_packed_mlm_train_step)
    from protein_clip_tpu.train.packed_engine import (
        derive_segments, tokenize_packed_rows_sharded)

    esm_cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), esm_cfg)
    optimizer = _opt(opt_name)
    opt_state = optimizer.init(lm_head)

    n_dp = 4
    mesh = mesh_mod.make_mesh(data=n_dp, model=1)
    host = np.random.default_rng(3)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(host.choice(aas, int(L)))
            for L in host.integers(4, 13, 12)]
    ids8 = tokenize_packed_rows_sharded(EsmTokenizer(), seqs, n_dp,
                                        row_len=16)
    # wire sanity: every residue survives the deal (non-pad token count ==
    # sum of per-sequence tokenized lengths)
    assert int((np.asarray(ids8) != PAD_ID).sum()) == sum(
        len(s) + 2 for s in seqs)
    r_max = ids8.shape[0] // n_dp
    key = jax.random.key(11)

    step = make_sharded_packed_mlm_train_step(esm_cfg, optimizer, mesh,
                                              mask_prob=0.3)
    new_head, _, loss = step(lm_head, opt_state, esm_params, ids8, key)

    def shard_terms(h, i):
        k = jax.random.fold_in(key, i)
        ids, seg, pos = derive_segments(ids8[i * r_max:(i + 1) * r_max])
        mask = (seg > 0).astype(jnp.int32)
        masked, labels = mlm.mask_tokens(k, ids, mask, 0.3)
        return mlm.mlm_loss_terms(esm_params, h, masked, mask, labels,
                                  esm_cfg, segment_ids=seg, positions=pos)

    def global_loss(h):
        terms = [shard_terms(h, i) for i in range(n_dp)]
        s = sum(t[0] for t in terms)
        c = sum(t[1] for t in terms)
        return s / jnp.maximum(c, 1.0)

    np.testing.assert_allclose(float(loss), float(global_loss(lm_head)),
                               rtol=1e-5)
    grads = jax.grad(global_loss)(lm_head)
    updates, _ = optimizer.update(grads, optimizer.init(lm_head), lm_head)
    expect_head = optax.apply_updates(lm_head, updates)
    for a, b in zip(jax.tree.leaves(new_head), jax.tree.leaves(expect_head)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.parametrize("mode", ["finetune", "lora_packed"])
def test_sharded_mlm_finetune_step_matches_manual(rng, mode):
    """DP MLM continued pretraining: the masked-CE gradient reaches the
    backbone (f32-master view) or the LoRA adapters (merge view) across
    the data mesh, matching the manually reconstructed global-mean loss
    and single-device optimizer step — both wires (plain / packed)."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2, mlm
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.mlm_step import (
        make_sharded_mlm_finetune_step)
    from protein_clip_tpu.train.packed_engine import (
        derive_segments, tokenize_packed_rows_sharded)

    esm_cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), esm_cfg)
    packed = mode == "lora_packed"

    if packed:
        from protein_clip_tpu.train import lora as lora_mod
        targets = lora_mod.ATTN_TARGETS
        alpha = lora_mod.default_alpha(4)
        trainable = {
            "lora": lora_mod.init_lora(jax.random.key(2), esm_params, 4,
                                       targets),
            "head": lm_head}
        esm_view = lambda t, e: lora_mod.merge_lora(e, t["lora"], alpha)
    else:
        from protein_clip_tpu.train.finetune import _cast_esm, init_params
        trainable = {"esm": init_params(esm_params, {})["esm"],
                     "head": lm_head}
        esm_view = lambda t, _e: _cast_esm(t["esm"], esm_cfg.compute_dtype)

    optimizer = optax.sgd(1e-2)
    n_dp = 4
    mesh = mesh_mod.make_mesh(data=n_dp, model=1)
    key = jax.random.key(21)
    host = np.random.default_rng(5)

    if packed:
        aas = list("LAGVSERTIDPKQNFYMHWC")
        seqs = ["".join(host.choice(aas, int(L)))
                for L in host.integers(4, 13, 12)]
        arrs = (tokenize_packed_rows_sharded(EsmTokenizer(), seqs, n_dp,
                                             row_len=16),)
        r_max = arrs[0].shape[0] // n_dp

        def shard_inputs(i):
            ids, seg, pos = derive_segments(
                arrs[0][i * r_max:(i + 1) * r_max])
            return ids, (seg > 0).astype(jnp.int32), seg, pos
    else:
        B, T = 8, 16
        ids_all = jnp.asarray(host.integers(4, 24, (B, T)), jnp.int32)
        mask_all = jnp.ones((B, T), jnp.int32)
        arrs = (ids_all, mask_all)
        shard = B // n_dp

        def shard_inputs(i):
            return (ids_all[i * shard:(i + 1) * shard],
                    mask_all[i * shard:(i + 1) * shard], None, None)

    step = make_sharded_mlm_finetune_step(esm_cfg, optimizer, mesh, 0.3,
                                          esm_view, packed=packed)
    new_t, _, loss = step(trainable, optimizer.init(trainable), esm_params,
                          *arrs, key)

    def global_loss(t):
        s_all, c_all = 0.0, 0.0
        for i in range(n_dp):
            k = jax.random.fold_in(key, i)
            ids, mask, seg, pos = shard_inputs(i)
            masked, labels = mlm.mask_tokens(k, ids, mask, 0.3)
            s, c = mlm.mlm_loss_terms(esm_view(t, esm_params), t["head"],
                                      masked, mask, labels, esm_cfg,
                                      segment_ids=seg, positions=pos)
            s_all, c_all = s_all + s, c_all + c
        return s_all / jnp.maximum(c_all, 1.0)

    np.testing.assert_allclose(float(loss), float(global_loss(trainable)),
                               rtol=1e-5)
    grads = jax.grad(global_loss)(trainable)
    updates, _ = optimizer.update(grads, optimizer.init(trainable),
                                  trainable)
    expect = optax.apply_updates(trainable, updates)
    for a, b in zip(jax.tree.leaves(new_t), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


@BOTH_OPTS
def test_sharded_packed_step_matches_packed(rng, opt_name):
    """Packed rows on a DP mesh: the sharded packed step must match the
    single-device packed step at equal global batch (loss is invariant to
    the host's pair-to-shard dealing; dropout off for exactness)."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import (
        make_sharded_packed_train_step, tokenize_packed_sharded)
    from protein_clip_tpu.train.packed_engine import (
        make_train_step_packed, tokenize_packed)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    optimizer = _opt(opt_name)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    peps, recs = seqs(8, 5, 15), seqs(8, 10, 60)

    single = make_train_step_packed(cfg, optimizer, rows_per_chunk=1)
    sb = tokenize_packed(tok, peps, recs, pep_row_len=32, rec_row_len=64)
    p1, _, l1 = single(params, opt0, esm_params, sb, jax.random.key(2))

    mesh = make_mesh(data=2, model=1)
    step = make_sharded_packed_train_step(cfg, optimizer, mesh,
                                          rows_per_chunk=1)
    db = tokenize_packed_sharded(tok, peps, recs, 2, pep_row_len=32,
                                 rec_row_len=64)
    p2, _, l2 = step(params, opt0, esm_params, db, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_sharded_packed_rejects_model_axis(rng):
    import optax

    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import (
        make_sharded_packed_train_step)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2)
    mesh = make_mesh(data=2, model=2)
    import pytest
    with pytest.raises(ValueError, match="DP-only"):
        make_sharded_packed_train_step(cfg, optax.adam(1e-3), mesh)


@BOTH_OPTS
def test_sharded_packed_filip_step_matches_packed(rng, opt_name):
    """Packed FILIP on a DP mesh == single-device packed FILIP step at
    equal batch (dropout off; pair order differs by the shard dealing but
    the loss is permutation-invariant)."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import filip as filip_mod
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import (
        make_sharded_packed_filip_step, tokenize_packed_sharded)
    from protein_clip_tpu.train import filip_engine
    from protein_clip_tpu.train.filip_packed import (
        make_train_step_packed_filip, tokenize_packed)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip_mod.FILIPConfig(input_dim=esm_cfg.hidden_size,
                                 embedding_dim=16, h1=2, h2=2, dropout=0.0,
                                 esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = filip_mod.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    optimizer = _opt(opt_name)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    peps, recs = seqs(8, 5, 15), seqs(8, 10, 60)

    single = make_train_step_packed_filip(cfg, optimizer, rows_per_chunk=1)
    sb = tokenize_packed(tok, peps, recs, pep_row_len=32, rec_row_len=64)
    p1, _, l1 = single(params, opt0, esm_params, sb, jax.random.key(2))

    mesh = make_mesh(data=2, model=1)
    step = make_sharded_packed_filip_step(cfg, optimizer, mesh,
                                          rows_per_chunk=1)
    db = tokenize_packed_sharded(tok, peps, recs, 2, pep_row_len=32,
                                 rec_row_len=64)
    p2, _, l2 = step(params, opt0, esm_params, db, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_sharded_packed_rejects_shard_mismatch(rng):
    """A batch tokenized for 4 shards on a data=2 mesh must fail loudly —
    silently accepted, it misroutes tokens (finite loss, corrupt grads)."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import (
        make_sharded_packed_train_step, tokenize_packed_sharded)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2)
    optimizer = optax.adam(1e-3)
    mesh = make_mesh(data=2, model=1)
    step = make_sharded_packed_train_step(cfg, optimizer, mesh)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(10, 40, 8)]
    bad = tokenize_packed_sharded(tok, seqs, seqs, 4)
    import pytest
    with pytest.raises(ValueError, match="data axis"):
        step(params, optimizer.init(params), esm_params, bad,
             jax.random.key(2))


def test_deal_pairs_balances_equal_counts():
    """Equal counts per shard AND receptor-token balance (the flatten+
    reslice fixup regressed to ~2x skew on skewed draws)."""
    from protein_clip_tpu.parallel.packed_step import _deal_pairs

    rec_lens = [900, 800, 700, 100, 100, 100]
    shards = _deal_pairs([10] * 6, rec_lens, 3)
    counts = [len(s) for s in shards]
    assert counts == [2, 2, 2]
    loads = sorted(sum(rec_lens[i] for i in s) for s in shards)
    assert loads[-1] <= 1000, loads  # far from the 1700 regression
    assert sorted(i for s in shards for i in s) == list(range(6))


def test_sharded_mlm_step_composes_with_tp(rng):
    """MLM x TP (VERDICT r4 #7): the same step over a dp2 x tp2 mesh —
    backbone weights carrying Megatron splits over the GSPMD 'model' axis —
    must match the dp2-only run bit-for-bit in loss and updated head
    (per-token CE has no cross-shard coupling beyond the psum'd mean)."""
    import optax

    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.parallel.mlm_step import make_sharded_mlm_train_step

    esm_cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), esm_cfg)
    optimizer = optax.sgd(0.05)

    B, T = 8, 16
    ids = jnp.asarray(np.random.default_rng(3).integers(4, 24, (B, T)),
                      jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    key = jax.random.key(11)

    mesh_dp = mesh_mod.make_mesh(data=2, model=1)
    step_dp = make_sharded_mlm_train_step(esm_cfg, optimizer, mesh_dp, 0.3)
    head_dp, _, loss_dp = step_dp(lm_head, optimizer.init(lm_head),
                                  esm_params, ids, mask, key)

    mesh_tp = mesh_mod.make_mesh(data=2, model=2)
    esm_tp = shard_mod.shard_params(mesh_tp, esm_params,
                                    shard_mod.esm_param_specs(esm_params))
    step_tp = make_sharded_mlm_train_step(esm_cfg, optimizer, mesh_tp, 0.3)
    head_tp, _, loss_tp = step_tp(lm_head, optimizer.init(lm_head),
                                  esm_tp, ids, mask, key)

    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(head_tp), jax.tree.leaves(head_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_mlm_finetune_step_composes_with_tp(rng):
    """MLM unfrozen finetune x TP: f32 masters sharded with the same
    Megatron specs; trainable update must match the dp-only step."""
    import optax

    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.parallel.mlm_step import (
        make_sharded_mlm_finetune_step)
    from protein_clip_tpu.train.finetune import _cast_esm, init_params as _fp

    esm_cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), esm_cfg)
    optimizer = optax.sgd(0.05)
    esm_view = lambda t, _e: _cast_esm(t["esm"], esm_cfg.compute_dtype)

    B, T = 8, 16
    ids = jnp.asarray(np.random.default_rng(5).integers(4, 24, (B, T)),
                      jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    key = jax.random.key(13)

    def run(mesh, esm_p, trainable):
        step = make_sharded_mlm_finetune_step(esm_cfg, optimizer, mesh, 0.3,
                                              esm_view, packed=False)
        return step(trainable, optimizer.init(trainable), esm_p, ids, mask,
                    key)

    trainable = {"esm": _fp(esm_params, {})["esm"], "head": lm_head}
    t_dp, _, loss_dp = run(mesh_mod.make_mesh(data=2, model=1), esm_params,
                           trainable)

    mesh_tp = mesh_mod.make_mesh(data=2, model=2)
    specs = shard_mod.esm_param_specs(esm_params)
    trainable_tp = {
        "esm": shard_mod.shard_params(mesh_tp, trainable["esm"], specs),
        "head": lm_head}
    esm_tp = shard_mod.shard_params(mesh_tp, esm_params, specs)
    t_tp, _, loss_tp = run(mesh_tp, esm_tp, trainable_tp)

    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(t_tp), jax.tree.leaves(t_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
