"""LoRA adapters (train/lora.py): merge semantics, exact grads through
the merge, frozen-base invariants, and checkpoint auto-detection."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from protein_clip_tpu.models import clip, esm2
from protein_clip_tpu.ops.infonce import clip_infonce
from protein_clip_tpu.train import clip_engine, lora


@pytest.fixture(scope="module")
def tiny():
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    heads = clip.init_params(jax.random.key(2), mcfg)
    adapters = lora.init_lora(jax.random.key(3), esm_params, rank=4)
    return mcfg, esm_params, lora.init_params(adapters, heads)


def _batch(rng, B, T):
    return {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.ones((B, T), jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }


def test_zero_init_is_identity(tiny, rng):
    """B = 0 at init: the merged model IS the frozen model, exactly."""
    mcfg, esm_params, params = tiny
    merged = lora.merge_lora(esm_params, params["lora"], alpha=8.0)
    ids = jnp.asarray(rng.integers(4, 24, (4, 10)), jnp.int32)
    mask = jnp.ones((4, 10), jnp.int32)
    a = esm2.forward(esm_params, ids, mask, mcfg.esm)
    b = esm2.forward(merged, ids, mask, mcfg.esm)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_changes_only_targets(tiny):
    mcfg, esm_params, params = tiny
    adapters = jax.tree.map(lambda a: a + 0.1, params["lora"])
    merged = lora.merge_lora(esm_params, adapters, alpha=8.0)
    # targeted leaves move ...
    for t in lora.ATTN_TARGETS:
        w0 = np.asarray(esm_params["layers"]["attn"][t]["w"])
        w1 = np.asarray(merged["layers"]["attn"][t]["w"])
        assert np.abs(w1 - w0).max() > 0
        # ... biases and non-targets do not
        np.testing.assert_array_equal(
            np.asarray(esm_params["layers"]["attn"][t]["b"]),
            np.asarray(merged["layers"]["attn"][t]["b"]))
    np.testing.assert_array_equal(
        np.asarray(esm_params["layers"]["ffn"]["wi"]["w"]),
        np.asarray(merged["layers"]["ffn"]["wi"]["w"]))
    np.testing.assert_array_equal(np.asarray(esm_params["embed"]["word"]),
                                  np.asarray(merged["embed"]["word"]))


def test_lora_step_matches_monolithic_grads(tiny, rng):
    """One SGD LoRA step == p - lr * grad of the monolithic merged loss:
    the two-pass gradcache differentiates THROUGH the merge correctly."""
    mcfg, esm_params, params = tiny
    # move off the zero-init saddle so adapter grads are generic
    params = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 3 else a, params)
    b = _batch(rng, 8, 12)
    lr, alpha = 1e-2, 8.0
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=4,
                                   length_groups=1, remat=True)
    opt = optax.sgd(lr)
    step = lora.make_train_step(cfg, opt, loss_fn=clip_infonce, alpha=alpha)
    new_params, _, loss = step(params, opt.init(params), esm_params, b,
                               jax.random.key(0))

    def direct(p):
        merged = lora.merge_lora(esm_params, p["lora"], alpha)
        hp = esm2.forward(merged, b["pep_ids"], b["pep_mask"], mcfg.esm)
        hr = esm2.forward(merged, b["rec_ids"], b["rec_mask"], mcfg.esm)
        pep = clip.encode_side(p["heads"], "pep", hp, b["pep_mask"], mcfg)
        rec = clip.encode_side(p["heads"], "rec", hr, b["rec_mask"], mcfg)
        return clip_infonce(pep, rec)

    dloss, dgrads = jax.value_and_grad(direct)(params)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)
    a_norms = [float(jnp.abs(g["a"]).max())
               for g in jax.tree.leaves(
                   dgrads["lora"], is_leaf=lambda x: isinstance(x, dict)
                   and "a" in x)]
    assert max(a_norms) > 1e-8, "adapter grads must be nonzero"

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_lora_loss_decreases_and_base_frozen(tiny, rng):
    mcfg, esm_params, params = tiny
    base_copy = jax.tree.map(lambda a: np.asarray(a).copy(), esm_params)
    b = _batch(rng, 8, 10)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1, learning_rate=3e-3,
                                   backbone_lr=1e-3)
    opt = lora.make_optimizer(cfg)
    step = lora.make_train_step(cfg, opt)
    opt_state = opt.init(params)
    key = jax.random.key(0)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # adapters moved; the frozen base did not
    b_norm = max(float(jnp.abs(ab["b"]).max())
                 for ab in jax.tree.leaves(
                     params["lora"],
                     is_leaf=lambda x: isinstance(x, dict) and "b" in x))
    assert b_norm > 0, "B matrices should move off zero"
    for a, c in zip(jax.tree.leaves(base_copy), jax.tree.leaves(esm_params)):
        np.testing.assert_array_equal(a, np.asarray(c))


def test_lora_eval_step(tiny, rng):
    mcfg, esm_params, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1)
    ev = lora.make_eval_step(cfg, loss_fn=clip_infonce, alpha=8.0)
    loss = ev(params, esm_params, _batch(rng, 8, 10))
    assert np.isfinite(float(loss))


def test_packed_lora_matches_monolithic_grads(tiny):
    """Packed LoRA (the esm_view hook over the packed finetune two-pass):
    one SGD step == the monolithic packed loss with the merged backbone,
    adapters and heads only — the frozen base gets no grads by
    construction (it is not in params)."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train import finetune
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    mcfg, esm_params, params = tiny
    params = jax.tree.map(lambda a: a + 0.01 if a.ndim == 3 else a, params)
    peps = ["MKTAYIAKQR", "GDSLEHA", "MKV", "AAAAPPPLLLWWYY", "MST",
            "GGHHKLMNPQRSTVW", "MKTAYI", "PLLH"]
    recs = ["MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ", "GDS", "KVALDE", "AACD",
            "MSTNPKRRE", "GGHH", "MKTWYEE", "PLPLPLPL"]
    batch = tokenize_packed(EsmTokenizer(), peps, recs)
    lr, alpha = 1e-2, 8.0
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True,
                                   remat=True)
    opt = optax.sgd(lr)
    step = lora.make_train_step_packed(cfg, opt, loss_fn=clip_infonce,
                                       rows_per_chunk=4, alpha=alpha)
    key = jax.random.key(7)
    new_params, _, loss = step(params, opt.init(params), esm_params, batch,
                               key)

    mono = finetune.make_packed_loss(
        cfg, loss_fn=clip_infonce, rows_per_chunk=4,
        esm_view=lambda p, e: lora.merge_lora(e, p["lora"], alpha))
    dloss, dgrads = jax.value_and_grad(mono)(params, esm_params, batch, key)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_filip_lora_matches_monolithic_grads(tiny, rng):
    """FILIP + LoRA (train/filip_lora.py): the token-level two-pass with
    the adapter-merge backbone view — one SGD step == monolithic grads,
    temperature included."""
    from protein_clip_tpu.models import filip as filip_model
    from protein_clip_tpu.train import filip_finetune, filip_lora

    esm_cfg = esm2.ESM2Config.tiny()
    fcfg = filip_model.FILIPConfig(input_dim=esm_cfg.hidden_size,
                                   embedding_dim=16, h1=2, h2=2,
                                   dropout=0.0, esm=esm_cfg)
    _, esm_params, _ = tiny
    heads = filip_model.init_params(jax.random.key(5), fcfg)
    adapters = lora.init_lora(jax.random.key(6), esm_params, rank=4)
    params = filip_lora.init_params(adapters, heads)
    params = jax.tree.map(lambda a: a + 0.01 if a.ndim == 3 else a, params)

    b = _batch(rng, 8, 12)
    lr, alpha = 1e-2, 8.0
    cfg = clip_engine.EngineConfig(model=fcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=4,
                                   length_groups=1, remat=True)
    opt = optax.sgd(lr)
    step = filip_lora.make_train_step(cfg, opt, alpha=alpha)
    key = jax.random.key(3)
    new_params, _, loss = step(params, opt.init(params), esm_params, b, key)

    mono = filip_finetune.make_token_loss(
        cfg, esm_view=lambda p, e: lora.merge_lora(e, p["lora"], alpha))
    dloss, dgrads = jax.value_and_grad(mono)(params, esm_params, b, key)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_dp_lora_matches_single_device(tiny, rng):
    """8-way DP LoRA == the single-device LoRA step at equal global batch
    (SGD, the scale-sensitive probe for the pmean cotangent fix)."""
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.finetune_step import make_sharded_lora_step
    from protein_clip_tpu.parallel.step import shard_batch

    mcfg, esm_params, params = tiny
    params = jax.tree.map(lambda a: a + 0.01 if a.ndim == 3 else a, params)
    b = _batch(rng, 16, 12)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, num_chunks=8,
                                   length_groups=1, remat=False)
    opt = optax.sgd(5e-2)
    opt0 = opt.init(params)
    key = jax.random.key(9)

    p1, _, l1 = lora.make_train_step(cfg, opt, alpha=8.0)(
        params, opt0, esm_params, b, key)

    m = mesh_mod.make_mesh()  # data=8
    step = make_sharded_lora_step(cfg, opt, m, alpha=8.0)
    p2, _, l2 = step(params, opt0, esm_params, shard_batch(m, b), key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_merge_lora_weights_tool(tiny, tmp_path):
    """tools/merge_lora_weights.py: bakes adapters into a standalone
    backbone npz equal to merge_lora, splitting the heads out."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import merge_lora_weights

    from protein_clip_tpu.train.checkpoint import export_npz, load_npz

    mcfg, esm_params, params = tiny
    params = jax.tree.map(lambda a: a + 0.05 if a.ndim == 3 else a, params)
    base_path = tmp_path / "base.npz"
    ckpt_path = tmp_path / "best_model.npz"
    export_npz(base_path, esm_params)
    export_npz(ckpt_path, {"lora": params["lora"], "heads": params["heads"]})

    out_esm = tmp_path / "merged.npz"
    out_heads = tmp_path / "heads.npz"
    rc = merge_lora_weights.main([
        "--checkpoint", str(ckpt_path), "--esm-weights", str(base_path),
        "--config", "tiny", "--out-esm", str(out_esm),
        "--out-heads", str(out_heads)])
    assert rc == 0

    merged = load_npz(out_esm, esm_params)
    want = lora.merge_lora(esm_params, params["lora"], alpha=8.0)  # 2*rank
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    heads = load_npz(out_heads, params["heads"])
    for a, b in zip(jax.tree.leaves(heads),
                    jax.tree.leaves(params["heads"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ffn_targets(tiny):
    _, esm_params, _ = tiny
    adapters = lora.init_lora(jax.random.key(0), esm_params, rank=2,
                              targets=lora.ATTN_TARGETS + lora.FFN_TARGETS)
    assert set(adapters) == {"attn/q", "attn/k", "attn/v", "attn/o",
                             "ffn/wi", "ffn/wo"}
    moved = lora.merge_lora(
        esm_params, jax.tree.map(lambda a: a + 0.1, adapters), alpha=4.0)
    assert np.abs(np.asarray(moved["layers"]["ffn"]["wi"]["w"])
                  - np.asarray(esm_params["layers"]["ffn"]["wi"]["w"])).max() > 0
