"""Aux subsystems: PCA analysis, token max-sim prototype, SP FILIP,
pipeline stage split, retrieval API-parity wrapper."""

import numpy as np
import jax
import jax.numpy as jnp

from protein_clip_tpu.eval.pca import pca2, paired_cosine
from protein_clip_tpu.models import esm2, filip
from protein_clip_tpu.models.filip import filip_similarity, token_max_similarity
from protein_clip_tpu.parallel import mesh as mesh_mod
from protein_clip_tpu.parallel.filip_sp import filip_similarity_seqsharded
from protein_clip_tpu.parallel.pipeline import split_layer_stages


def test_pca2_recovers_dominant_direction(rng):
    d = np.zeros(8)
    d[0] = 1.0
    x = rng.normal(size=(200, 1)) * 5 @ d[None, :] + rng.normal(size=(200, 8)) * 0.1
    proj, ratio = pca2(x)
    assert proj.shape == (200, 2)
    assert ratio[0] > 0.9
    # PC1 correlates with the planted direction
    corr = np.corrcoef(proj[:, 0], x[:, 0])[0, 1]
    assert abs(corr) > 0.99


def test_paired_cosine(rng):
    a = rng.normal(size=(5, 4))
    got = paired_cosine(a, a * 3.0)
    np.testing.assert_allclose(got, 1.0, atol=1e-9)


def test_token_max_similarity_prototype(rng):
    ha = rng.normal(size=(3, 4, 8)).astype(np.float32)
    hb = rng.normal(size=(3, 6, 8)).astype(np.float32)
    got = np.asarray(token_max_similarity(jnp.asarray(ha), jnp.asarray(hb)))
    ref = np.array([
        (ha[i] @ hb[i].T).max(axis=1).mean() for i in range(3)])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_seqsharded_filip_matches_lax(rng):
    B, TA, TB, D = 4, 16, 12, 8
    ha = rng.normal(size=(B, TA, D)).astype(np.float32)
    hb = rng.normal(size=(B, TB, D)).astype(np.float32)
    ma = np.ones((B, TA), np.int32); ma[0, 10:] = 0; ma[2, 3:] = 0
    mb = np.ones((B, TB), np.int32); mb[1, 6:] = 0
    t = jnp.asarray(0.8)

    ref_a, ref_b = filip_similarity(jnp.asarray(ha), jnp.asarray(hb),
                                    jnp.asarray(ma), jnp.asarray(mb), t)
    m = mesh_mod.make_mesh()  # data=8; TA=16 divisible
    got_a, got_b = filip_similarity_seqsharded(
        m, jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma),
        jnp.asarray(mb), t)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=1e-5)


def test_pipeline_stage_split():
    cfg = esm2.ESM2Config.tiny()  # 2 layers
    params = esm2.init_params(jax.random.key(0), cfg)
    stages = split_layer_stages(params, 2)
    assert len(stages) == 2
    assert "embed" in stages[0] and "embed" not in stages[1]
    assert "final_ln" in stages[1] and "final_ln" not in stages[0]
    w0 = stages[0]["layers"]["attn"]["q"]["w"]
    assert w0.shape[0] == 1
    np.testing.assert_array_equal(
        np.asarray(w0[0]), np.asarray(params["layers"]["attn"]["q"]["w"][0]))


def test_eval_allrec_onequery_wrapper(rng):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.eval.retrieval import (
        eval_allrec_onequery, evaluate_retrieval)
    from protein_clip_tpu.models import clip

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=8,
                           h1=2, h2=2, esm=esm_cfg)
    params = clip.init_params(jax.random.key(0), mcfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    batches = [(
        ["".join(rng.choice(aas, 12)) for _ in range(8)],
        ["".join(rng.choice(aas, 20)) for _ in range(8)],
    ) for _ in range(2)]
    full = evaluate_retrieval(params, esm_params, batches, EsmTokenizer(),
                              mcfg, n_candidates=16, seed=0)
    single = eval_allrec_onequery(params, esm_params, batches, EsmTokenizer(),
                                  mcfg, k=3, n_candidates=16)
    assert single == [int(full.ranks[3])]


def test_embedder_order_and_batching(rng):
    """Embedder: length-sorted batching preserves order; ragged tail padded."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.eval.embed import Embedder, nearest_partners
    from protein_clip_tpu.models import clip

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=8,
                           h1=2, h2=2, esm=esm_cfg)
    params = clip.init_params(jax.random.key(0), mcfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(rng.choice(aas, int(n)))
            for n in rng.integers(5, 40, 11)]  # 11 seqs, batch 4 -> ragged
    embedder = Embedder(params, esm_params, mcfg, side="rec", batch_size=4,
                        num_chunks=2)
    emb = embedder(seqs)
    assert emb.shape == (11, 8)
    # single-sequence embedding must match its batched counterpart
    one = embedder([seqs[7]])
    np.testing.assert_allclose(emb[7], one[0], atol=1e-4)
    # nearest_partners returns self as top hit for identical corpora
    idx, scores = nearest_partners(emb, emb, k=3)
    assert (idx[:, 0] == np.arange(11)).mean() > 0.7


def test_esm_family_configs():
    for name, (H, L, P) in {
        "t12_35M": (480, 12, 35e6),
        "t33_650M": (1280, 33, 650e6),
        "t36_3B": (2560, 36, 2.8e9),
        "t48_15B": (5120, 48, 15e9),
    }.items():
        cfg = getattr(esm2.ESM2Config, name)()
        assert cfg.hidden_size == H and cfg.num_layers == L
        assert cfg.hidden_size % cfg.num_heads == 0
        # parameter-count sanity via shapes (no init for the big ones)
        shapes = jax.eval_shape(
            lambda: esm2.init_params(jax.random.key(0), cfg))
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        assert 0.7 * P < n < 1.3 * P, (name, n)


def test_tpu_budget_generation_scaling(monkeypatch):
    """Per-generation budget calibration (VERDICT r2 weak #7): v5e is the
    1.0 baseline, v2/v3 shrink VMEM budgets, v5p/v6e grow the HBM one,
    unknown kinds fall back to the v5e ceilings, env overrides win."""
    from protein_clip_tpu.ops import tpu_budgets as tb

    assert tb._scales_for_kind("TPU v5 lite") == (1.0, 1.0)  # not the v5 row
    assert tb._scales_for_kind("TPU v5") == (1.0, 6.0)       # v5p
    assert tb._scales_for_kind("TPU v3")[0] < 1.0
    assert tb._scales_for_kind("TPU v6 lite")[1] == 2.0
    assert tb._scales_for_kind("cpu") == (1.0, 1.0)
    assert tb._scales_for_kind("TPU v99") == (1.0, 1.0)

    # CPU test backend -> baseline scales -> the calibrated v5e bases
    assert tb.infonce_vmem_budget() == 8 * 1024 * 1024
    assert tb.attn_rows_byte_budget() == 8 * 512 * 2
    assert tb.filip_bwd_budget_elems() == 1 << 26

    monkeypatch.setenv("PCT_INFONCE_VMEM_BUDGET", "4096")
    assert tb.infonce_vmem_budget() == 4096

    # attention score-tile ceiling rides the same vmem scale
    assert tb.attn_score_budget_elems() == 1 << 19
    monkeypatch.setenv("PCT_ATTN_SCORE_BUDGET_ELEMS", str(1 << 16))
    assert tb.attn_score_budget_elems() == 1 << 16


def test_tpu_budget_probe_failure_not_cached(monkeypatch):
    """A transient backend failure must NOT pin the (1.0, 1.0) fallback
    for the process lifetime (the axon tunnel's init flakiness): the next
    successful probe is cached instead."""
    from protein_clip_tpu.ops import tpu_budgets as tb

    class _Dev:
        device_kind = "TPU v3"

    monkeypatch.setattr(tb, "_GEN_CACHE", None)
    import jax as _jax

    def boom():
        raise RuntimeError("backend init UNAVAILABLE")

    monkeypatch.setattr(_jax, "devices", boom)
    assert tb.device_generation() == (1.0, 1.0)   # fallback this call
    assert tb._GEN_CACHE is None                  # ... but not cached
    monkeypatch.setattr(_jax, "devices", lambda: [_Dev()])
    assert tb.device_generation() == (0.125, 1.0)
    assert tb._GEN_CACHE == (0.125, 1.0)
    monkeypatch.setattr(tb, "_GEN_CACHE", None)   # leave clean


def test_attention_q_block_honors_budget(monkeypatch):
    """q-block choosers route through the per-generation score budget
    (they previously hard-coded v5e's 2^19/2^18 element ceilings)."""
    from protein_clip_tpu.ops.attention_pallas import (_bwd_q_block,
                                                       _choose_q_block)

    assert _choose_q_block(512) == 512          # fits the v5e ceiling
    assert _bwd_q_block(1024) == 256            # half the forward budget
    monkeypatch.setenv("PCT_ATTN_SCORE_BUDGET_ELEMS", str(1 << 16))
    assert _choose_q_block(512) == 128          # 2^16 // 512 = 128
    assert _bwd_q_block(512) == 128             # floor stays 128-aligned


def test_attention_rows_env_zero_falls_back(monkeypatch):
    """PCT_ATTN_ROWS_PER_PROGRAM=0 must fall back to 1, not divide by
    zero in the grid."""
    import protein_clip_tpu.ops.attention_pallas as ap

    monkeypatch.setenv("PCT_ATTN_ROWS_PER_PROGRAM", "0")
    assert ap._choose_rows_per_program(16, 512, 2) == 1
    monkeypatch.setenv("PCT_ATTN_ROWS_PER_PROGRAM", "4")
    assert ap._choose_rows_per_program(16, 512, 2) == 4
    assert ap._choose_rows_per_program(15, 512, 2) == 1  # non-dividing
    # the backward's knob routes through the same chooser
    monkeypatch.setenv("PCT_ATTN_BWD_ROWS_PER_PROGRAM", "0")
    assert ap._choose_rows_per_program(
        16, 512, 2, env="PCT_ATTN_BWD_ROWS_PER_PROGRAM",
        budget_divisor=2) == 1


def test_tiled_infonce_rejects_bad_row_block():
    """An explicit row_block that does not divide B must raise (it used
    to silently truncate the grid and compute a wrong loss)."""
    import jax.numpy as jnp
    import pytest

    from protein_clip_tpu.ops.infonce_pallas import fused_infonce_tiled

    x = jnp.zeros((192, 32), jnp.float32)
    with pytest.raises(ValueError, match="does not divide"):
        fused_infonce_tiled(x, x, row_block=128)
