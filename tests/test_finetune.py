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


def test_finetune_rejects_grouped(tiny):
    mcfg, _ = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   length_groups=2)
    with pytest.raises(ValueError, match="length-grouped"):
        finetune.make_train_step(cfg, optax.sgd(1e-2))


SEQS_A = ["MKTAYIAKQR", "GDSLEHA", "MKV", "AAAAPPPLLLWWYY", "MST",
          "GGHHKLMNPQRSTVW", "MKTAYI", "PLLH"]
SEQS_B = ["MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ", "GDS", "KVALDE", "AACD",
          "MSTNPKRRE", "GGHH", "MKTWYEE", "PLPLPLPL"]


@pytest.fixture(scope="module")
def packed_batch():
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train.packed_engine import tokenize_packed
    return tokenize_packed(EsmTokenizer(), SEQS_A, SEQS_B)


def test_packed_finetune_matches_monolithic_grads(tiny, packed_batch):
    """Two-pass packed finetune == one SGD step of the monolithic
    (single-graph) packed loss: same chunking, same per-chunk dropout
    keys — pass-2's shared-d_sums trick must reproduce the grads exactly,
    backbone included. Runs with dropout ON to pin the rng invariant."""
    mcfg, params = tiny
    lr = 1e-2
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True,
                                   remat=True)
    opt = optax.sgd(lr)
    from protein_clip_tpu.ops.infonce import clip_infonce
    step = finetune.make_train_step_packed(cfg, opt, loss_fn=clip_infonce,
                                           rows_per_chunk=4)
    key = jax.random.key(7)
    new_params, _, loss = step(params, opt.init(params), {}, packed_batch,
                               key)

    mono = finetune.make_packed_loss(cfg, loss_fn=clip_infonce,
                                     rows_per_chunk=4)
    dloss, dgrads = jax.value_and_grad(mono)(params, {}, packed_batch,
                                            key)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)

    esm_grad_norms = [float(jnp.abs(g).max())
                      for g in jax.tree.leaves(dgrads["esm"])]
    assert max(esm_grad_norms) > 1e-6, "backbone grads must be nonzero"

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_packed_finetune_matches_plain_finetune(tiny, packed_batch, rng):
    """Packed and plain finetune optimize the same objective: with
    dropout off, their losses on the same pairs agree (packing changes
    the data layout, not the math)."""
    mcfg, params = tiny
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.ops.infonce import clip_infonce

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True)
    mono = finetune.make_packed_loss(cfg, loss_fn=clip_infonce,
                                     rows_per_chunk=4)
    packed_loss = float(mono(params, {}, packed_batch,
                             jax.random.key(0)))

    plain = clip_engine.tokenize_pair_batch(EsmTokenizer(), SEQS_A, SEQS_B)
    plain = clip_engine.expand_batch(plain)
    from protein_clip_tpu.models import clip as clip_mod
    hp = esm2.forward(params["esm"], plain["pep_ids"], plain["pep_mask"],
                      mcfg.esm)
    hr = esm2.forward(params["esm"], plain["rec_ids"], plain["rec_mask"],
                      mcfg.esm)
    pep = clip_mod.encode_side(params["heads"], "pep", hp,
                               plain["pep_mask"], mcfg)
    rec = clip_mod.encode_side(params["heads"], "rec", hr,
                               plain["rec_mask"], mcfg)
    plain_loss = float(clip_infonce(pep, rec))
    np.testing.assert_allclose(packed_loss, plain_loss, rtol=2e-4)


@pytest.mark.parametrize("opt_name", ["adam", "sgd"])
def test_dp_finetune_matches_single_device(tiny, rng, opt_name):
    """8-way DP finetune == the single-device finetune step at equal
    global batch: pass-2 replays cover disjoint local chunks, so psum'd
    grads must equal the monolithic gradient EXACTLY (sgd is the
    scale-sensitive probe — a pmean/psum mixup shows up as 8x)."""
    from protein_clip_tpu.models import clip as clip_mod
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.finetune_step import (
        make_sharded_finetune_step)
    from protein_clip_tpu.parallel.step import shard_batch

    mcfg, params = tiny
    assert mcfg.dropout == 0.0  # exactness needs the deterministic path
    b = _batch(rng, 16, 12)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, num_chunks=8,
                                   length_groups=1, remat=False)
    optimizer = (optax.adam(1e-3) if opt_name == "adam"
                 else optax.sgd(5e-2))
    opt0 = optimizer.init(params)
    key = jax.random.key(9)

    p1, _, l1 = finetune.make_train_step(cfg, optimizer)(
        params, opt0, {}, b, key)

    m = mesh_mod.make_mesh()  # data=8
    step = make_sharded_finetune_step(cfg, optimizer, m)
    p2, _, l2 = step(params, opt0, {}, shard_batch(m, b), key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_filip():
    from protein_clip_tpu.models import filip
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    heads = filip.init_params(jax.random.key(2), mcfg)
    return mcfg, finetune.init_params(esm_params, heads)


def test_filip_finetune_matches_monolithic_grads(tiny_filip, rng):
    """Token-level two-pass == monolithic FILIP differentiation: one SGD
    step must match p - lr * grad exactly, temperature and backbone
    included (per-chunk (b,T,D) cotangent slices, train/filip_finetune.py)."""
    from protein_clip_tpu.train import filip_finetune

    mcfg, params = tiny_filip
    b = _batch(rng, 8, 12)
    lr = 1e-2
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=4,
                                   length_groups=1, remat=True)
    opt = optax.sgd(lr)
    step = filip_finetune.make_train_step(cfg, opt)
    key = jax.random.key(3)
    new_params, _, loss = step(params, opt.init(params), {}, b, key)

    mono = filip_finetune.make_token_loss(cfg)
    dloss, dgrads = jax.value_and_grad(mono)(params, {}, b, key)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)

    esm_grad_norms = [float(jnp.abs(g).max())
                      for g in jax.tree.leaves(dgrads["esm"])]
    assert max(esm_grad_norms) > 1e-6, "backbone grads must be nonzero"
    assert float(jnp.abs(dgrads["heads"]["temperature"]).max()) > 1e-8, \
        "temperature grad must flow through the tail"

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_filip_finetune_loss_decreases(tiny_filip, rng):
    from protein_clip_tpu.train import filip_finetune

    mcfg, params = tiny_filip
    b = _batch(rng, 8, 10)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1, learning_rate=3e-3,
                                   backbone_lr=1e-4)
    opt = filip_finetune.make_optimizer(cfg)
    step = filip_finetune.make_train_step(cfg, opt)
    opt_state = opt.init(params)
    key = jax.random.key(0)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {}, b, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_filip_finetune_eval_step(tiny_filip, rng):
    from protein_clip_tpu.train import filip_finetune

    mcfg, params = tiny_filip
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=1)
    ev = filip_finetune.make_eval_step(cfg)
    loss = ev(params, {}, _batch(rng, 8, 10))
    assert np.isfinite(float(loss))


def test_packed_filip_finetune_matches_monolithic_grads(tiny_filip,
                                                        packed_batch):
    """Packed token-level two-pass == monolithic packed FILIP
    differentiation: one SGD step must match p - lr * grad exactly —
    pass-2's per-chunk row-slice cotangents reproduce the backbone grads
    through the scatter (train/filip_finetune.make_train_step_packed)."""
    from protein_clip_tpu.train import filip_finetune

    mcfg, params = tiny_filip
    lr = 1e-2
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True,
                                   remat=True)
    opt = optax.sgd(lr)
    step = filip_finetune.make_train_step(cfg, opt)  # dispatches packed
    key = jax.random.key(5)
    new_params, _, loss = step(params, opt.init(params), {}, packed_batch,
                               key)

    mono = filip_finetune.make_packed_token_loss(cfg)
    dloss, dgrads = jax.value_and_grad(mono)(params, {}, packed_batch, key)
    np.testing.assert_allclose(float(loss), float(dloss), rtol=1e-5)

    esm_grad_norms = [float(jnp.abs(g).max())
                      for g in jax.tree.leaves(dgrads["esm"])]
    assert max(esm_grad_norms) > 1e-6, "backbone grads must be nonzero"
    assert float(jnp.abs(dgrads["heads"]["temperature"]).max()) > 1e-8, \
        "temperature grad must flow through the tail"

    expect = jax.tree.map(lambda p, g: p - lr * g, params, dgrads)
    for got, want in zip(jax.tree.leaves(new_params),
                         jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_packed_filip_finetune_matches_plain(tiny_filip):
    """Packed and plain FILIP finetune compute the same objective: with
    dropout off, the packed monolithic loss equals the plain token loss
    on the same pairs (packing changes layout, not math)."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train import filip_finetune

    mcfg, params = tiny_filip
    cfg_packed = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                          accumulated_batches=1, packed=True)
    from protein_clip_tpu.train.packed_engine import tokenize_packed
    pb = tokenize_packed(EsmTokenizer(), SEQS_A, SEQS_B)
    key = jax.random.key(0)
    packed_loss = float(filip_finetune.make_packed_token_loss(cfg_packed)(
        params, {}, pb, key))

    cfg_plain = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                         accumulated_batches=1,
                                         num_chunks=4, length_groups=1)
    plain = clip_engine.tokenize_pair_batch(EsmTokenizer(), SEQS_A, SEQS_B)
    plain_loss = float(filip_finetune.make_token_loss(cfg_plain)(
        params, {}, plain, key))
    np.testing.assert_allclose(packed_loss, plain_loss, rtol=2e-4)


def test_packed_filip_finetune_scatter_tiers(tiny_filip):
    """scatter_tiers composes with the packed finetune: the tier-pair
    assembly computes the same loss as the flat scatter, and a step runs
    finitely."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train import filip_finetune
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    mcfg, params = tiny_filip
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True,
                                   scatter_tiers=2)
    tok = EsmTokenizer()
    flat = tokenize_packed(tok, SEQS_A, SEQS_B)
    tiered = tokenize_packed(tok, SEQS_A, SEQS_B, scatter_tiers=2)
    key = jax.random.key(1)
    mono = filip_finetune.make_packed_token_loss(cfg)
    np.testing.assert_allclose(float(mono(params, {}, flat, key)),
                               float(mono(params, {}, tiered, key)),
                               rtol=1e-5)

    opt = optax.sgd(1e-2)
    step = filip_finetune.make_train_step_packed(cfg, opt)
    _, _, loss = step(params, opt.init(params), {}, tiered, key)
    assert np.isfinite(float(loss))


def test_packed_filip_finetune_eval_step(tiny_filip, packed_batch):
    from protein_clip_tpu.train import filip_finetune

    mcfg, params = tiny_filip
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True)
    ev = filip_finetune.make_eval_step(cfg)
    loss = ev(params, {}, packed_batch)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("opt_name", ["adam", "sgd"])
def test_dp_packed_finetune_matches_single_device(tiny, rng, opt_name):
    """DP x packed x finetune == the single-device packed finetune at
    equal global batch: pass-2 replays cover disjoint LOCAL row chunks
    and the tail pools only local sequences, yet pmean'd grads must equal
    the monolithic gradient (sgd is the scale probe; InfoNCE is
    permutation-symmetric, so the host's pair-to-shard dealing doesn't
    change the loss)."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.parallel.finetune_step import (
        make_sharded_packed_finetune_step)
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import tokenize_packed_sharded
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    mcfg, params = tiny
    assert mcfg.dropout == 0.0  # exactness needs the deterministic path
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, packed=True,
                                   remat=False)
    optimizer = (optax.adam(1e-3) if opt_name == "adam"
                 else optax.sgd(5e-2))
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    peps, recs = seqs(16, 5, 15), seqs(16, 10, 60)
    key = jax.random.key(4)

    single = finetune.make_train_step_packed(cfg, optimizer,
                                             loss_fn=clip_infonce,
                                             rows_per_chunk=1)
    sb = tokenize_packed(tok, peps, recs, pep_row_len=32, rec_row_len=64)
    p1, _, l1 = single(params, opt0, {}, sb, key)

    mesh = make_mesh()  # data=8
    step = make_sharded_packed_finetune_step(cfg, optimizer, mesh,
                                             loss_fn=clip_infonce,
                                             rows_per_chunk=1)
    db = tokenize_packed_sharded(tok, peps, recs, 8, pep_row_len=32,
                                 rec_row_len=64)
    p2, _, l2 = step(params, opt0, {}, db, key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    # sgd stays tight (the scale probe: a pmean/psum mixup shows up as 8x);
    # adam's update is ~lr*sign(g) wherever sqrt(v_hat) >> eps, so elements
    # with |g| near the eps crossover amplify reduction-order jitter between
    # the two compiled programs up to a few percent of lr — observed flaking
    # at 1/8192 elements, ~3e-5 abs. Bound adam at 10% of lr instead.
    atol = 2e-5 if opt_name == "sgd" else 1e-4
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=atol, rtol=1e-3)


def test_dp_packed_lora_step(tiny, rng):
    """DP x packed x LoRA smoke: adapters move, the frozen base rides the
    esm_params slot untouched, loss finite."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip as clip_mod
    from protein_clip_tpu.parallel.finetune_step import (
        make_sharded_packed_lora_step)
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import tokenize_packed_sharded
    from protein_clip_tpu.train import lora as lora_mod

    mcfg, _ = tiny
    esm_params = esm2.init_params(jax.random.key(1), mcfg.esm)
    params = lora_mod.init_params(
        lora_mod.init_lora(jax.random.key(3), esm_params, rank=2),
        clip_mod.init_params(jax.random.key(2), mcfg))
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, packed=True,
                                   remat=False, backbone_lr=1e-2)
    opt = lora_mod.make_optimizer(cfg)
    mesh = make_mesh()
    step = make_sharded_packed_lora_step(cfg, opt, mesh)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    db = tokenize_packed_sharded(tok, seqs(16, 5, 15), seqs(16, 10, 60), 8,
                                 pep_row_len=32, rec_row_len=64)
    new, _, loss = step(params, opt.init(params), esm_params, db,
                        jax.random.key(0))
    assert np.isfinite(float(loss))
    moved = any(
        float(jnp.max(jnp.abs(ab["b"]))) > 0
        for ab in jax.tree.leaves(
            new["lora"], is_leaf=lambda x: isinstance(x, dict) and "b" in x))
    assert moved, "adapters must move"


def test_dp_tp_finetune_matches_single_device(tiny, rng):
    """data=4 x model=2: the f32 master backbone INSIDE params carries
    Megatron column/row shardings over the GSPMD 'model' auto axis while
    the two-pass gradcache runs manual DP — one Adam step must match the
    single-device finetune step (tp_safe_model_config forces eager
    attention under a real model axis)."""
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel import sharding as shard_mod
    from protein_clip_tpu.parallel.finetune_step import (
        make_sharded_finetune_step)
    from protein_clip_tpu.parallel.step import shard_batch

    mcfg, params = tiny
    b = _batch(rng, 16, 12)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=4,
                                   accumulated_batches=4, num_chunks=4,
                                   length_groups=1, remat=False)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    key = jax.random.key(9)

    p1, _, l1 = finetune.make_train_step(cfg, optimizer)(
        params, opt0, {}, b, key)

    m = mesh_mod.make_mesh(model=2)  # data=4, model=2
    sharded_params = dict(params)
    sharded_params["esm"] = shard_mod.shard_params(
        m, params["esm"], shard_mod.esm_param_specs(params["esm"]))
    step = make_sharded_finetune_step(cfg, optimizer, m)
    p2, _, l2 = step(sharded_params, optimizer.init(sharded_params), {},
                     shard_batch(m, b), key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    # adam-only path: near the sqrt(v_hat)/eps crossover the update
    # amplifies tiny cross-program reduction-order diffs up to a few
    # percent of lr (observed 1/16384 elements at ~1.5e-5 abs, varying
    # run to run) — bound at 10% of lr; scale bugs are caught by the
    # sgd-parametrized DP tests, not here
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-3)


def test_packed_finetune_loss_decreases(tiny, packed_batch):
    mcfg, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, packed=True,
                                   learning_rate=3e-3, backbone_lr=1e-4)
    opt = finetune.make_optimizer(cfg)
    step = finetune.make_train_step(cfg, opt)  # dispatches to packed
    opt_state = opt.init(params)
    key = jax.random.key(0)
    losses = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {}, packed_batch,
                                       sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
