"""Deterministic tiny CLIP case shared by the 2-process distributed test
(tests/test_distributed.py) and its subprocess worker — both sides must
build bit-identical params/batch from these seeds."""

import numpy as np

CASE_BATCH = 8
CASE_T = 12
CASE_SEED = 9


def build_case():
    import jax

    from protein_clip_tpu.models import clip, esm2

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = clip.init_params(jax.random.key(2), mcfg)

    rng = np.random.default_rng(7)
    mask = np.ones((CASE_BATCH, CASE_T), np.int32)
    mask[::3, CASE_T - 2:] = 0
    batch = {
        "pep_ids": rng.integers(4, 24, (CASE_BATCH, CASE_T)).astype(np.int32),
        "pep_mask": mask,
        "rec_ids": rng.integers(4, 24, (CASE_BATCH, CASE_T)).astype(np.int32),
        "rec_mask": np.ones((CASE_BATCH, CASE_T), np.int32),
    }
    return mcfg, esm_params, params, batch


def build_packed_pairs():
    """Deterministic pair strings for the packed 2-process case (both the
    workers and the single-process oracle tokenize these)."""
    rng = np.random.default_rng(11)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(5, 15, CASE_BATCH)]
    recs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(10, 60, CASE_BATCH)]
    return peps, recs
