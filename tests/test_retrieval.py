"""Retrieval protocol: rank counting + curves vs the reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_clip_tpu.eval.retrieval import (
    evaluate_retrieval, random_baseline_curve, ranks_from_embeddings,
    topk_curve,
)


def test_rank_counting_rule(rng):
    # hand-built logits: query 0's true partner beaten by 2 others
    pep = np.eye(4, dtype=np.float32)
    rec = np.eye(4, dtype=np.float32)
    # make rec_1 and rec_2 score higher than rec_0 for query 0
    pep[0] = [0.1, 1.0, 1.0, 0.0]
    ranks = ranks_from_embeddings(jnp.asarray(pep), jnp.asarray(rec))
    assert ranks[0] == 3  # 1 + 2 candidates strictly above
    assert ranks[1] == 1 and ranks[2] == 1


def test_perfect_embeddings_rank_one(rng):
    x = rng.normal(size=(32, 8)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    ranks = ranks_from_embeddings(jnp.asarray(x * 10), jnp.asarray(x * 10))
    assert (ranks == 1).all()


def test_topk_curve_properties(rng):
    ranks = rng.integers(1, 257, size=256)
    curve = topk_curve(ranks, 256)
    assert curve.shape == (256,)
    assert (np.diff(curve) >= 0).all()
    assert curve[-1] == 1.0
    # top-1 = fraction of rank-1 queries
    np.testing.assert_allclose(curve[0], (ranks == 1).mean())


def test_random_baseline_is_diagonal():
    curve = random_baseline_curve(256, seed=0)
    # permutation of 0..255 -> exactly linear cumulative accuracy
    np.testing.assert_allclose(curve, np.arange(1, 257) / 256)


def test_evaluate_retrieval_end_to_end(rng):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=8,
                           h1=2, h2=2, esm=esm_cfg)
    params = clip.init_params(jax.random.key(0), mcfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    aas = list("LAGVSERTIDPKQNFYMHWC")

    batches = [(
        ["".join(rng.choice(aas, 12)) for _ in range(8)],
        ["".join(rng.choice(aas, 20)) for _ in range(8)],
    ) for _ in range(3)]

    res = evaluate_retrieval(params, esm_params, batches, EsmTokenizer(),
                             mcfg, n_candidates=16, seed=0)
    assert res.ranks.shape == (16,)
    assert (1 <= res.ranks).all() and (res.ranks <= 16).all()
    assert 0 <= res.top1 <= 1


def test_filip_ranks_match_lax_reference(rng):
    """filip_ranks_from_tokens (fused kernel, row-blocked) must reproduce
    the ranks AND the counting rule of the lax FILIP similarity oracle."""
    from protein_clip_tpu.eval.retrieval import filip_ranks_from_tokens
    from protein_clip_tpu.models.filip import filip_similarity

    n, ta, tb, d = 6, 16, 24, 8
    ha = rng.normal(size=(n, ta, d)).astype(np.float32)
    hb = rng.normal(size=(n, tb, d)).astype(np.float32)
    ha /= np.linalg.norm(ha, axis=-1, keepdims=True)
    hb /= np.linalg.norm(hb, axis=-1, keepdims=True)
    ma = (rng.random((n, ta)) < 0.8).astype(np.int32)
    mb = (rng.random((n, tb)) < 0.8).astype(np.int32)
    ma[:, 0] = 1
    mb[:, 0] = 1
    t = jnp.asarray(0.7, jnp.float32)

    # row_block=4 on n=6 exercises the uneven trailing block
    ranks = filip_ranks_from_tokens(jnp.asarray(ha), jnp.asarray(ma),
                                    jnp.asarray(hb), jnp.asarray(mb), t,
                                    row_block=4)

    sa, sb = filip_similarity(jnp.asarray(ha), jnp.asarray(hb),
                              jnp.asarray(ma), jnp.asarray(mb), t)
    sim = np.asarray((sa + sb) / 2.0)
    want = 1 + (sim > np.diag(sim)[:, None]).sum(axis=1)
    np.testing.assert_array_equal(ranks, want)


def test_filip_score_matrix_tiled_and_ragged_match(rng):
    """Column tiling (ADVICE r3: a big serving index must not ride one
    kernel launch) and the ragged-index scorer must both reproduce the
    single-launch dense score matrix exactly."""
    from protein_clip_tpu.eval.retrieval import (filip_score_matrix,
                                                 filip_score_matrix_ragged)

    q, n, ta, d = 5, 13, 16, 8
    lengths = rng.integers(3, 40, size=n).astype(np.int32)
    tb = int(lengths.max())
    ha = rng.normal(size=(q, ta, d)).astype(np.float32)
    ma = (rng.random((q, ta)) < 0.8).astype(np.int32)
    ma[:, 0] = 1
    hb = np.zeros((n, tb, d), np.float32)
    mb = np.zeros((n, tb), np.int32)
    flat_rows = []
    for i, L in enumerate(lengths):
        row = rng.normal(size=(int(L), d)).astype(np.float32)
        row /= np.linalg.norm(row, axis=-1, keepdims=True)
        hb[i, :L] = row
        mb[i, :L] = 1
        flat_rows.append(row)
    flat = np.concatenate(flat_rows, axis=0)
    t = jnp.asarray(0.7, jnp.float32)

    want = filip_score_matrix(ha, ma, hb, mb, t)
    # column-tiled dense path (uneven tail block: 13 = 4+4+4+1)
    tiled = filip_score_matrix(ha, ma, hb, mb, t, row_block=2, col_block=4)
    np.testing.assert_allclose(tiled, want, atol=1e-5, rtol=1e-5)
    # ragged index path (per-block densify at the block's own max width)
    ragged = filip_score_matrix_ragged(ha, ma, flat, lengths, t,
                                       row_block=3, col_block=4)
    np.testing.assert_allclose(ragged, want, atol=1e-5, rtol=1e-5)


def test_evaluate_filip_retrieval_end_to_end(rng):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2, filip

    esm_cfg = esm2.ESM2Config.tiny()
    fcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=8,
                             h1=2, h2=2, esm=esm_cfg)
    params = filip.init_params(jax.random.key(0), fcfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    aas = list("LAGVSERTIDPKQNFYMHWC")

    from protein_clip_tpu.eval.retrieval import evaluate_filip_retrieval
    batches = [(
        ["".join(rng.choice(aas, 12)) for _ in range(8)],
        ["".join(rng.choice(aas, 20)) for _ in range(8)],
    ) for _ in range(3)]
    res = evaluate_filip_retrieval(params, esm_params, batches,
                                   EsmTokenizer(), fcfg, n_candidates=16,
                                   seed=0, num_chunks=2)
    assert res.ranks.shape == (16,)
    assert (1 <= res.ranks).all() and (res.ranks <= 16).all()
    assert 0 <= res.top1 <= 1


def test_insufficient_candidates_raises(rng):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=8,
                           h1=1, h2=1, esm=esm_cfg)
    params = clip.init_params(jax.random.key(0), mcfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    with pytest.raises(ValueError, match="candidates"):
        evaluate_retrieval(params, esm_params, [(["MK"], ["AC"])],
                           EsmTokenizer(), mcfg, n_candidates=16)
