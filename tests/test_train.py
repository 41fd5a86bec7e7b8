"""Training engine: gradcache equivalences + end-to-end mini fit run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from protein_clip_tpu.data.tokenizer import EsmTokenizer
from protein_clip_tpu.models import clip, esm2
from protein_clip_tpu.ops.infonce import clip_infonce
from protein_clip_tpu.train import clip_engine, loop
from protein_clip_tpu.train.gradcache import (
    encode_hidden_chunked, gradcache_value_and_grad,
)


@pytest.fixture(scope="module")
def tiny():
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = clip.init_params(jax.random.key(2), mcfg)
    return mcfg, esm_params, params


def _batch(rng, B, T):
    return {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.ones((B, T), jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }


def test_chunked_encode_matches_unchunked(tiny, rng):
    mcfg, esm_params, _ = tiny
    b = _batch(rng, 8, 12)
    full = esm2.forward(esm_params, b["pep_ids"], b["pep_mask"], mcfg.esm)
    chunked = encode_hidden_chunked(esm_params, b["pep_ids"], b["pep_mask"],
                                    mcfg.esm, num_chunks=4, remat=False)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5)


def test_frozen_fastpath_grads_match_direct(tiny, rng):
    """stop_grad(chunked backbone) + head grads == grads of the monolithic
    forward (the backbone is frozen, so they must agree)."""
    mcfg, esm_params, params = tiny
    b = _batch(rng, 8, 10)

    def direct(p):
        pep, rec = clip.forward(p, esm_params, b, mcfg, train=False)
        return clip_infonce(pep, rec)

    def fastpath(p):
        hp = encode_hidden_chunked(esm_params, b["pep_ids"], b["pep_mask"],
                                   mcfg.esm, 4, remat=False)
        hr = encode_hidden_chunked(esm_params, b["rec_ids"], b["rec_mask"],
                                   mcfg.esm, 4, remat=False)
        pep = clip.encode_side(p, "pep", hp, b["pep_mask"], mcfg)
        rec = clip.encode_side(p, "rec", hr, b["rec_mask"], mcfg)
        return clip_infonce(pep, rec)

    l1, g1 = jax.value_and_grad(direct)(params)
    l2, g2 = jax.value_and_grad(fastpath)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_generic_gradcache_matches_direct(rng):
    """Two-pass gradcache == direct differentiation for an UNFROZEN encoder."""
    D, H = 6, 10
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = {"w": jax.random.normal(k1, (H, D)) * 0.3,
              "b": jnp.zeros((D,))}
    X = jnp.asarray(rng.normal(size=(4, 4, H)).astype(np.float32))  # 4 chunks of 4
    Y = jnp.asarray(rng.normal(size=(4, 4, H)).astype(np.float32))

    def encode(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    loss, grads = gradcache_value_and_grad(encode, clip_infonce, params, X, Y)

    def direct(p):
        ex = encode(p, X.reshape(16, H))
        ey = encode(p, Y.reshape(16, H))
        return clip_infonce(ex, ey)

    dl, dg = jax.value_and_grad(direct)(params)
    np.testing.assert_allclose(float(loss), float(dl), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["w"]), np.asarray(dg["w"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["b"]), np.asarray(dg["b"]),
                               atol=1e-5)


def test_train_step_reduces_loss(tiny, rng):
    mcfg, esm_params, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = clip_engine.make_train_step(cfg, optimizer)
    b = _batch(rng, 8, 12)
    key = jax.random.key(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, esm_params, b, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_fit_contract(tiny, tmp_path, rng):
    """End-to-end mini run: CSV contract, best checkpoint, metrics."""
    mcfg, esm_params, params = tiny

    class FakeLoader:
        def __init__(self, n_batches, bs, seed):
            self.r = np.random.default_rng(seed)
            self.n, self.bs = n_batches, bs
            aas = list("LAGVSERTIDPKQNFYMHWC")
            self.batches = [
                (["".join(self.r.choice(aas, 10)) for _ in range(bs)],
                 ["".join(self.r.choice(aas, 20)) for _ in range(bs)])
                for _ in range(n_batches)]

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return self.n

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=4,
                                   accumulated_batches=2, num_chunks=2)
    tok = EsmTokenizer()
    res = loop.fit(tmp_path, cfg, params, esm_params,
                   FakeLoader(4, 4, 0), FakeLoader(2, 4, 1), tok,
                   num_epochs=2, rng=jax.random.key(0),
                   test_loader=FakeLoader(2, 4, 2), log=lambda s: None)

    csv = (tmp_path / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert csv[0] == "Epoch,Train Loss,Validation Loss"
    assert len(csv) == 3
    assert csv[1].startswith("1,") and csv[2].startswith("2,")
    assert (tmp_path / "best_model.npz").exists()
    assert (tmp_path / "metrics.jsonl").exists()
    assert res.test_loss is not None and np.isfinite(res.test_loss)
    # checkpoint roundtrip
    from protein_clip_tpu.train.checkpoint import load_npz
    restored = load_npz(tmp_path / "best_model.npz", res.best_params)
    for a, b in zip(jax.tree.leaves(restored),
                    jax.tree.leaves(res.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_batch_roundtrip(rng):
    """int8 wire format: expand_batch reconstructs exact ids + masks."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train.clip_engine import (expand_batch,
                                                    tokenize_pair_batch)
    tok = EsmTokenizer()
    peps = ["MKTV", "", "ACDEFGHIKLMNPQRSTVWY"]
    recs = ["LLLLL", "M", "KKK"]
    compact = tokenize_pair_batch(tok, peps, recs, compact=True)
    full = tokenize_pair_batch(tok, peps, recs, compact=False)
    assert compact["pep_ids"].dtype == jnp.int8
    restored = expand_batch(compact)
    for k in ("pep_ids", "pep_mask", "rec_ids", "rec_mask"):
        np.testing.assert_array_equal(np.asarray(restored[k]),
                                      np.asarray(full[k]))
    # idempotent on already-full batches
    again = expand_batch(full)
    assert again is full


def test_grouped_step_matches_ungrouped_loss(tiny, rng):
    """Length-grouped step: same loss as ungrouped at the same pairs
    (permutation-invariant InfoNCE), dropout off."""
    mcfg, esm_params, params = tiny
    mcfg0 = clip.CLIPConfig(**{**mcfg.__dict__, "dropout": 0.0})
    cfg = clip_engine.EngineConfig(model=mcfg0, batch_size=8,
                                   accumulated_batches=1, num_chunks=4,
                                   remat=False)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = ["".join(rng.choice(aas, int(n))) for n in rng.integers(5, 12, 8)]
    recs = ["".join(rng.choice(aas, int(n))) for n in rng.integers(10, 60, 8)]

    plain = clip_engine.make_train_step(cfg, optimizer)
    b = clip_engine.tokenize_pair_batch(tok, peps, recs)
    _, _, l_plain = plain(params, opt0, esm_params, b, jax.random.key(0))

    grouped = clip_engine.make_train_step_grouped(cfg, optimizer)
    gb = clip_engine.tokenize_grouped(tok, peps, recs, n_groups=2)
    assert gb[0]["rec_ids"].shape[1] <= gb[1]["rec_ids"].shape[1]
    p2, _, l_grouped = grouped(params, opt0, esm_params, gb,
                               jax.random.key(0))
    np.testing.assert_allclose(float(l_plain), float(l_grouped), rtol=1e-5)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p2))


def test_many_step_matches_sequential(tiny, rng):
    """K scanned steps in one dispatch == K sequential single-step calls."""
    mcfg, esm_params, params = tiny
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=4,
                                   accumulated_batches=1, num_chunks=1)
    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    step = clip_engine.make_train_step(cfg, optimizer, loss_fn=clip_infonce)
    many = clip_engine.make_train_step_many(cfg, optimizer,
                                            loss_fn=clip_infonce)

    batches = [clip_engine.tokenize_pair_batch(
        EsmTokenizer(), ["LAGVSERT"] * 4, ["IDPKQNFYMHWC"[i:] * 3
                                           for i in range(4)])
        for _ in range(3)]
    # distinct data per step
    batches = [jax.tree.map(lambda x, s=s: jnp.roll(x, s, axis=0), b)
               for s, b in enumerate(batches)]
    stacked = clip_engine.stack_batches(batches)

    keys = jax.random.split(jax.random.key(9), 3)
    p_seq, o_seq = params, opt_state
    seq_losses = []
    for b, k in zip(batches, keys):
        p_seq, o_seq, loss = step(p_seq, o_seq, esm_params, b, k)
        seq_losses.append(float(loss))

    p_many, o_many, losses = many(params, opt_state, esm_params, stacked,
                                  jax.random.key(9))
    # same key fan-out: jax.random.split(key, n) == the keys used above
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq_losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_many), jax.tree.leaves(p_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stack_batches_rejects_mismatch(rng):
    tok = EsmTokenizer()
    b1 = clip_engine.tokenize_pair_batch(tok, ["LAGV"] * 2, ["SERT"] * 2)
    b2 = clip_engine.tokenize_pair_batch(tok, ["LAGV" * 40] * 2,
                                         ["SERT"] * 2)
    with pytest.raises(ValueError, match="differing leaf shapes"):
        clip_engine.stack_batches([b1, b2])


def _seqs(rng, n, lo, hi):
    aas = list("LAGVSERTIDPKQNFYMHWC")
    return ["".join(rng.choice(aas, int(L))) for L in rng.integers(lo, hi, n)]


def test_eval_step_packed_matches_plain(tiny, rng):
    """Packed eval (the train data path) must score a batch identically to
    the plain pad-to-longest eval step (VERDICT r2 #3)."""
    mcfg, esm_params, params = tiny
    tok = EsmTokenizer()
    peps, recs = _seqs(rng, 8, 5, 15), _seqs(rng, 8, 10, 60)

    plain_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                         accumulated_batches=1, num_chunks=2)
    plain = clip_engine.make_eval_step(plain_cfg)
    l_plain = plain(params, esm_params,
                    clip_engine.tokenize_pair_batch(tok, peps, recs))

    from protein_clip_tpu.train.packed_engine import (make_eval_step_packed,
                                                      tokenize_packed)
    packed_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                          accumulated_batches=1,
                                          num_chunks=2, packed=True)
    # the clip_engine dispatcher must hand back the packed step
    step = clip_engine.make_eval_step(packed_cfg)
    for tiers in (1, 4):
        l_packed = step(params, esm_params,
                        tokenize_packed(tok, peps, recs, tiers=tiers))
        np.testing.assert_allclose(float(l_packed), float(l_plain),
                                   rtol=2e-5)
    # evaluate() dispatch: loader of one batch, packed tokenization inside
    val = clip_engine.evaluate(params, esm_params, [(peps, recs)], tok,
                               step, packed_cfg)
    np.testing.assert_allclose(val, float(l_plain), rtol=2e-5)


def test_eval_step_grouped_matches_plain(tiny, rng):
    mcfg, esm_params, params = tiny
    tok = EsmTokenizer()
    peps, recs = _seqs(rng, 8, 5, 15), _seqs(rng, 8, 10, 60)
    cfgp = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                    accumulated_batches=1, num_chunks=2)
    l_plain = clip_engine.make_eval_step(cfgp)(
        params, esm_params, clip_engine.tokenize_pair_batch(tok, peps, recs))

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   length_groups=2)
    step = clip_engine.make_eval_step(cfg)
    batches = clip_engine.tokenize_grouped(tok, peps, recs, 2)
    np.testing.assert_allclose(float(step(params, esm_params, batches)),
                               float(l_plain), rtol=2e-5)
    val = clip_engine.evaluate(params, esm_params, [(peps, recs)], tok,
                               step, cfg)
    np.testing.assert_allclose(val, float(l_plain), rtol=2e-5)


def test_filip_eval_step_packed_and_grouped_match_plain(rng):
    from protein_clip_tpu.models import filip as filip_mod
    from protein_clip_tpu.train import filip_engine
    from protein_clip_tpu.train.packed_engine import tokenize_packed

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip_mod.FILIPConfig(input_dim=esm_cfg.hidden_size,
                                 embedding_dim=16, h1=2, h2=2, dropout=0.0,
                                 esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = filip_mod.init_params(jax.random.key(2), mcfg)
    tok = EsmTokenizer()
    peps, recs = _seqs(rng, 8, 5, 15), _seqs(rng, 8, 10, 60)

    base_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                        accumulated_batches=1, num_chunks=2)
    l_plain = filip_engine.make_eval_step(
        base_cfg, similarity_fn=filip_mod.filip_similarity)(
        params, esm_params, clip_engine.tokenize_pair_batch(tok, peps, recs))

    pk_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                      accumulated_batches=1, num_chunks=2,
                                      packed=True)
    l_packed = filip_engine.make_eval_step(
        pk_cfg, similarity_fn=filip_mod.filip_similarity)(
        params, esm_params, tokenize_packed(tok, peps, recs))
    np.testing.assert_allclose(float(l_packed), float(l_plain), rtol=2e-4)

    gr_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                      accumulated_batches=1, num_chunks=2,
                                      length_groups=2)
    l_grp = filip_engine.make_eval_step(
        gr_cfg, similarity_fn=filip_mod.filip_similarity)(
        params, esm_params, clip_engine.tokenize_grouped(tok, peps, recs, 2))
    np.testing.assert_allclose(float(l_grp), float(l_plain), rtol=2e-4)


def test_encode_candidates_packed_matches_plain(tiny, rng):
    from protein_clip_tpu.eval.retrieval import (encode_candidates,
                                                 ranks_from_embeddings)

    mcfg, esm_params, params = tiny
    tok = EsmTokenizer()
    peps, recs = _seqs(rng, 8, 5, 15), _seqs(rng, 8, 10, 60)
    loader = [(peps, recs)]
    pe, re_ = encode_candidates(params, esm_params, loader, tok, mcfg,
                                n_candidates=8, num_chunks=2)
    pp, rp = encode_candidates(params, esm_params, loader, tok, mcfg,
                               n_candidates=8, packed=True)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pe), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(re_), atol=2e-5)
    np.testing.assert_array_equal(ranks_from_embeddings(pp, rp),
                                  ranks_from_embeddings(pe, re_))
