"""Finetune engine (train/finetune.py): unfrozen-backbone gradcache step.

Pins the capability the reference lacks: end-to-end backbone training
at gradcache-accumulated global batches, with grads exactly equal to
the monolithic (unchunked) differentiation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from protein_clip_tpu.models import clip, esm2
from protein_clip_tpu.ops.infonce import clip_infonce
from protein_clip_tpu.train import clip_engine, finetune


@pytest.fixture(scope="module")
def tiny():
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    heads = clip.init_params(jax.random.key(2), mcfg)
    return mcfg, finetune.init_params(esm_params, heads)


def _batch(rng, B, T):
    return {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.ones((B, T), jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }


def test_finetune_step_matches_monolithic_grads(tiny, rng):
    """One SGD finetune step == p - lr * grad of the MONOLITHIC loss:
    backbone grads flow (nonzero), and the two-pass chunked replay
    reproduces them exactly."""
    mcfg, params = tiny
    b = _batch(rng, 8, 12)
    lr = 1e-2

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=4,
                                   length_groups=1, remat=True)
    opt = optax.sgd(lr)
    step = finetune.make_train_step(cfg, opt, loss_fn=clip_infonce)
    new_params, _, loss = step(params, opt.init(params), {}, b,
                               jax.random.key(0))

    def direct(p):
        hp = esm2.forward(p["esm"], b["pep_ids"], b["pep_mask"], mcfg.esm)
        hr = esm2.forward(p["esm"], b["rec_ids"], b["rec_mask"], mcfg.esm)
        pep = clip.encode_side(p["heads"], "pep", hp, b["pep_mask"], mcfg)
        rec = clip.encode_side(p["heads"], "rec", hr, b["rec_mask"], mcfg)
        return clip_infonce(pep, rec)

    dloss, dgrads = jax.value_and_grad(direct)(params)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)

    esm_grad_norms = [float(jnp.abs(g).max())
                      for g in jax.tree.leaves(dgrads["esm"])]
    assert max(esm_grad_norms) > 1e-6, "backbone grads must be nonzero"

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_finetune_two_group_optimizer(tiny, rng):
    """make_optimizer applies learning_rate to heads and backbone_lr to the
    backbone: with backbone_lr=0 the backbone must not move while the
    heads do."""
    mcfg, params = tiny
    b = _batch(rng, 8, 10)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1, backbone_lr=0.0)
    opt = finetune.make_optimizer(cfg)
    step = finetune.make_train_step(cfg, opt)
    new_params, _, loss = step(params, opt.init(params), {}, b,
                               jax.random.key(0))
    assert np.isfinite(float(loss))
    for a, b_ in zip(jax.tree.leaves(params["esm"]),
                     jax.tree.leaves(new_params["esm"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    head_moved = [
        float(jnp.abs(a - b_).max()) for a, b_ in
        zip(jax.tree.leaves(params["heads"]),
            jax.tree.leaves(new_params["heads"]))]
    assert max(head_moved) > 0


def test_finetune_loss_decreases(tiny, rng):
    """A few Adam steps on a fixed batch overfit it: the training signal
    reaches the backbone+heads end to end."""
    mcfg, params = tiny
    b = _batch(rng, 8, 10)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1, learning_rate=3e-3,
                                   backbone_lr=1e-4)
    opt = finetune.make_optimizer(cfg)
    step = finetune.make_train_step(cfg, opt)
    opt_state = opt.init(params)
    key = jax.random.key(0)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {}, b, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_finetune_eval_step(tiny, rng):
    mcfg, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1)
    ev = finetune.make_eval_step(cfg, loss_fn=clip_infonce)
    loss = ev(params, {}, _batch(rng, 8, 10))
    assert np.isfinite(float(loss))


def test_finetune_rejects_packed(tiny):
    mcfg, _ = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8, packed=True)
    with pytest.raises(ValueError, match="plain single-bucket"):
        finetune.make_train_step(cfg, optax.sgd(1e-2))
