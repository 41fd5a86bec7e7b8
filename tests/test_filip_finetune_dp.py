"""FILIP finetune/LoRA x DP (parallel/filip_finetune_step.py): the sharded
token-level two-pass reproduces single-device grads exactly.

sgd is the scale probe a pmean/psum mixup cannot hide behind (an 8x grad
shows up as 8x the update); adam is the production optimizer. Dropout is
0 everywhere (the sharded step folds the shard index into dropout keys).
"""

import numpy as np
import pytest
import jax
import optax

from protein_clip_tpu.models import esm2, filip
from protein_clip_tpu.train import clip_engine, filip_finetune, finetune

AAS = list("LAGVSERTIDPKQNFYMHWC")


@pytest.fixture(scope="module")
def tiny_filip():
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    heads = filip.init_params(jax.random.key(2), mcfg)
    return mcfg, esm_params, heads


def _seqs(rng, n, lo, hi):
    return ["".join(rng.choice(AAS, int(L)))
            for L in rng.integers(lo, hi, n)]


def _assert_params_close(p1, p2, opt_name):
    # sgd stays tight; adam's ~lr*sign(g) update amplifies reduction-order
    # jitter near the eps crossover (see test_finetune.py's bound note)
    atol = 2e-5 if opt_name == "sgd" else 1e-4
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=atol, rtol=1e-3)


@pytest.mark.parametrize("opt_name", ["adam", "sgd"])
def test_dp_filip_finetune_matches_single_device(tiny_filip, rng, opt_name):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.parallel.filip_finetune_step import (
        make_sharded_filip_finetune_step)
    from protein_clip_tpu.parallel.mesh import make_mesh

    mcfg, esm_params, heads = tiny_filip
    params = finetune.init_params(esm_params, heads)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=1, num_chunks=4,
                                   length_groups=1, remat=False)
    optimizer = (optax.adam(1e-3) if opt_name == "adam"
                 else optax.sgd(5e-2))
    opt0 = optimizer.init(params)
    batch = clip_engine.tokenize_pair_batch(
        EsmTokenizer(), _seqs(rng, 16, 5, 15), _seqs(rng, 16, 10, 40))
    key = jax.random.key(7)

    single = filip_finetune.make_train_step(cfg, optimizer)
    p1, _, l1 = single(params, opt0, {}, batch, key)

    mesh = make_mesh()  # data=8
    step = make_sharded_filip_finetune_step(cfg, optimizer, mesh)
    p2, _, l2 = step(params, opt0, {}, batch, key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    _assert_params_close(p1, p2, opt_name)


@pytest.mark.parametrize("opt_name", ["adam", "sgd"])
def test_dp_packed_filip_finetune_matches_single_device(tiny_filip, rng,
                                                        opt_name):
    """DP x packed x FILIP finetune == the single-device packed two-pass
    at equal batch (the host's pair-to-shard dealing permutes pairs, but
    both FILIP direction losses are permutation-symmetric across pairs)."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.parallel.filip_finetune_step import (
        make_sharded_filip_finetune_step)
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import tokenize_packed_sharded
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    mcfg, esm_params, heads = tiny_filip
    params = finetune.init_params(esm_params, heads)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=1, packed=True,
                                   remat=False)
    optimizer = (optax.adam(1e-3) if opt_name == "adam"
                 else optax.sgd(5e-2))
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    peps, recs = _seqs(rng, 16, 5, 15), _seqs(rng, 16, 10, 60)
    key = jax.random.key(9)

    single = filip_finetune.make_train_step_packed(cfg, optimizer,
                                                   rows_per_chunk=1)
    sb = tokenize_packed(tok, peps, recs, pep_row_len=32, rec_row_len=64)
    p1, _, l1 = single(params, opt0, {}, sb, key)

    mesh = make_mesh()  # data=8
    step = make_sharded_filip_finetune_step(cfg, optimizer, mesh,
                                            packed=True, rows_per_chunk=1)
    db = tokenize_packed_sharded(tok, peps, recs, 8, pep_row_len=32,
                                 rec_row_len=64)
    p2, _, l2 = step(params, opt0, {}, db, key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    _assert_params_close(p1, p2, opt_name)


@pytest.mark.parametrize("packed", [False, True])
def test_dp_filip_lora_matches_single_device(tiny_filip, rng, packed):
    """LoRA rides the sharded FILIP two-pass via the adapter-merge view:
    exact parity with train/filip_lora at equal batch; the frozen base in
    the esm_params slot must not move."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.parallel.filip_finetune_step import (
        make_sharded_filip_finetune_step)
    from protein_clip_tpu.parallel.mesh import make_mesh
    from protein_clip_tpu.parallel.packed_step import tokenize_packed_sharded
    from protein_clip_tpu.train import filip_lora, lora as lora_mod
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    mcfg, esm_params, heads = tiny_filip
    params = lora_mod.init_params(
        lora_mod.init_lora(jax.random.key(3), esm_params, rank=2), heads)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=1, num_chunks=2,
                                   packed=packed, remat=False)
    optimizer = optax.sgd(5e-2)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    peps, recs = _seqs(rng, 16, 5, 15), _seqs(rng, 16, 10, 40)
    key = jax.random.key(11)

    single = filip_lora.make_train_step(cfg, optimizer)
    sb = (tokenize_packed(tok, peps, recs, pep_row_len=32, rec_row_len=64)
          if packed else clip_engine.tokenize_pair_batch(tok, peps, recs))
    p1, _, l1 = single(params, opt0, esm_params, sb, key)

    mesh = make_mesh()
    step = make_sharded_filip_finetune_step(
        cfg, optimizer, mesh, packed=packed, lora=True,
        **({"rows_per_chunk": 1} if packed else {}))
    db = (tokenize_packed_sharded(tok, peps, recs, 8, pep_row_len=32,
                                  rec_row_len=64) if packed else sb)
    p2, _, l2 = step(params, opt0, esm_params, db, key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    _assert_params_close(p1, p2, "sgd")
    # adapters actually moved
    moved = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree.leaves(params["lora"]),
                                jax.tree.leaves(p2["lora"])))
    assert moved > 1e-7
