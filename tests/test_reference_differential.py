"""Differential parity against the reference's OWN torch modules.

Every other parity test in the suite checks our stack against oracles we
*transcribed* from the reference (NumPy mirrors in test_heads.py etc.) — a
transcription error would pass those. This file closes that loophole: it
imports ``/root/reference/modules/models.py`` / ``training_utils.py`` /
``training_utils_filip.py`` directly (torch + einops are installed), runs the
reference's ``ExtendedCLIP`` / ``ExtendedFILIP`` over a tiny random HF ESM
shared with our stack, and asserts

- pooled embeddings match (models.py:32-52),
- de-scaled cosine similarity matrices match (visualizations.py:38-52),
- CLIP InfoNCE loss matches (training_utils.py:74-89),
- FILIP per-direction similarity matrices + losses match, incl. the DCL
  variant and the ``include_group=True`` form (models.py:292-356,
  training_utils_filip.py:4-39),
- a reference ``torch.save(state_dict)`` round-trips through our npz
  interchange bit-exactly (main.py:78-81).

The weight bridge is train/checkpoint.import_reference_state_dict — the same
code path a user converting a real reference checkpoint takes.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_clip_tpu.models import clip, esm2, filip
from protein_clip_tpu.ops import infonce
from protein_clip_tpu.train import checkpoint

from test_esm2_parity import make_hf_tiny

torch = pytest.importorskip("torch")
pytest.importorskip("einops")

REF = "/root/reference/modules"


def _load_ref(name: str, fname: str):
    """Import a reference module by path (stubbing the grad_cache pip dep —
    its decorators are identity for our purposes; we only call loss fns)."""
    if "grad_cache" not in sys.modules:
        pkg = types.ModuleType("grad_cache")
        fn = types.ModuleType("grad_cache.functional")
        fn.cached = lambda f: f
        fn.cat_input_tensor = lambda f: f
        pkg.functional = fn
        sys.modules["grad_cache"] = pkg
        sys.modules["grad_cache.functional"] = fn
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{fname}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_models():
    return _load_ref("ref_models", "models.py")


@pytest.fixture(scope="module")
def ref_tu():
    return _load_ref("ref_training_utils", "training_utils.py")


@pytest.fixture(scope="module")
def ref_tu_filip():
    return _load_ref("ref_training_utils_filip", "training_utils_filip.py")


def _batch(rng, B=4, T=12):
    """Padded batch, no <mask> tokens (the installed transformers' padded
    token-dropout differs from the pinned 4.32 semantics — see
    test_esm2_parity.test_last_hidden_state_parity)."""
    ids = rng.integers(4, 24, size=(B, T)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones((B, T), dtype=np.int64)
    lens = [T, T - 2, T - 4, T - 1]
    for b in range(B):
        L = lens[b % len(lens)]
        ids[b, L - 1] = 2
        ids[b, L:] = 1
        mask[b, L:] = 0
    return ids, mask


@pytest.fixture(scope="module")
def shared():
    """One tiny HF ESM + converted JAX params, shared by CLIP and FILIP."""
    hf = make_hf_tiny(seed=11)
    ecfg = esm2.ESM2Config.tiny()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    esm_params = esm2.convert_hf_state_dict(sd, ecfg)
    return hf, ecfg, esm_params


def _build_ref_clip(ref_models, hf, temperature=0.7):
    torch.manual_seed(5)
    model = ref_models.ExtendedCLIP(64, 32, 2, 2, 0.1, hf)
    model.eval()
    with torch.no_grad():
        model.temperature.fill_(temperature)
    return model


def _seq_dicts(ids, mask):
    pep = {"input_ids": torch.tensor(ids), "attention_mask": torch.tensor(mask)}
    rec = {"input_ids": torch.tensor(ids[::-1].copy()),
           "attention_mask": torch.tensor(mask[::-1].copy())}
    return pep, rec


def _jax_batch(ids, mask):
    return {
        "pep_ids": jnp.asarray(ids, jnp.int32),
        "pep_mask": jnp.asarray(mask, jnp.int32),
        "rec_ids": jnp.asarray(ids[::-1].copy(), jnp.int32),
        "rec_mask": jnp.asarray(mask[::-1].copy(), jnp.int32),
    }


class TestCLIP:
    @pytest.fixture(scope="class")
    def pair(self, ref_models, shared):
        hf, ecfg, esm_params = shared
        model = _build_ref_clip(ref_models, hf)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = checkpoint.import_reference_state_dict(sd)
        cfg = clip.CLIPConfig(input_dim=64, embedding_dim=32, esm=ecfg)
        return model, params, esm_params, cfg

    @pytest.fixture(scope="class")
    def embeddings(self, pair, rng):
        model, params, esm_params, cfg = pair
        ids, mask = _batch(rng)
        pep_seq, rec_seq = _seq_dicts(ids, mask)
        with torch.no_grad():
            ref_pep, ref_rec = model(pep_seq, rec_seq)
        ours_pep, ours_rec = clip.forward(
            params, esm_params, _jax_batch(ids, mask), cfg, train=False)
        return (ref_pep.numpy(), ref_rec.numpy(),
                np.asarray(ours_pep), np.asarray(ours_rec))

    def test_pooled_embeddings(self, embeddings):
        ref_pep, ref_rec, ours_pep, ours_rec = embeddings
        np.testing.assert_allclose(ours_pep, ref_pep, atol=3e-5, rtol=3e-5)
        np.testing.assert_allclose(ours_rec, ref_rec, atol=3e-5, rtol=3e-5)

    def test_descaled_similarity_matrix(self, pair, embeddings):
        """visualizations.py:38-52: logits * exp(-temperature)."""
        model, params, _, _ = pair
        ref_pep, ref_rec, ours_pep, ours_rec = embeddings
        ref_sim = (ref_pep @ ref_rec.T) * np.exp(
            -model.temperature.detach().numpy())
        ours_sim = np.asarray(clip.cosine_similarity_matrix(
            jnp.asarray(ours_pep), jnp.asarray(ours_rec),
            params["temperature"]))
        np.testing.assert_allclose(ours_sim, ref_sim, atol=1e-4, rtol=1e-4)
        # de-scaled scores are raw cosines of unit vectors
        assert np.all(np.abs(ours_sim) <= 1.0 + 1e-5)

    def test_clip_loss(self, ref_tu, embeddings):
        """training_utils.py:74-89 vs our logsumexp form AND our naive
        transcription — all three must agree."""
        ref_pep, ref_rec, ours_pep, ours_rec = embeddings
        ref_loss = ref_tu._contrastive_loss(
            torch.tensor(ref_pep), torch.tensor(ref_rec).t()).item()
        ours = float(infonce.clip_infonce(
            jnp.asarray(ours_pep), jnp.asarray(ours_rec)))
        naive = float(infonce.naive_infonce_from_logits(
            jnp.asarray(ours_pep) @ jnp.asarray(ours_rec).T))
        assert ours == pytest.approx(ref_loss, abs=1e-5)
        assert naive == pytest.approx(ref_loss, abs=1e-5)

    def test_state_dict_npz_roundtrip(self, pair, tmp_path, rng):
        """torch.save → torch.load → import → export_npz → load_npz must be
        bit-identical to the direct import (the real conversion path)."""
        model, params, esm_params, cfg = pair
        pth = tmp_path / "best_model.pth"
        torch.save(model.state_dict(), pth)
        sd = {k: v.detach().numpy()
              for k, v in torch.load(pth, weights_only=True).items()}
        params2 = checkpoint.import_reference_state_dict(sd)
        npz = tmp_path / "heads.npz"
        checkpoint.export_npz(npz, params2)
        params3 = checkpoint.load_npz(npz, params2)
        for (ka, a), (kb, b) in zip(
                checkpoint._flatten(params).items(),
                checkpoint._flatten(params3).items()):
            assert ka == kb
            np.testing.assert_array_equal(a, b)
        ids, mask = _batch(rng)
        p1, r1 = clip.forward(params, esm_params, _jax_batch(ids, mask), cfg)
        p3, r3 = clip.forward(params3, esm_params, _jax_batch(ids, mask), cfg)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p3))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r3))


class TestFILIP:
    @pytest.fixture(scope="class")
    def pair(self, ref_models, shared):
        hf, ecfg, esm_params = shared
        torch.manual_seed(7)
        model = ref_models.ExtendedFILIP(64, 32, 2, 2, 0.1, hf)
        model.eval()
        with torch.no_grad():
            model.temperature.fill_(0.9)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = checkpoint.import_reference_state_dict(sd)
        cfg = filip.FILIPConfig(input_dim=64, embedding_dim=32, esm=ecfg)
        return model, params, esm_params, cfg

    @pytest.fixture(scope="class")
    def sims(self, pair, rng):
        model, params, esm_params, cfg = pair
        ids, mask = _batch(rng)
        pep_seq, rec_seq = _seq_dicts(ids, mask)
        with torch.no_grad():
            ref_a, ref_b = model(pep_seq, rec_seq)
        ours_a, ours_b = filip.forward(
            params, esm_params, _jax_batch(ids, mask), cfg, train=False)
        return (ref_a.numpy(), ref_b.numpy(),
                np.asarray(ours_a), np.asarray(ours_b))

    def test_similarity_matrices(self, sims):
        ref_a, ref_b, ours_a, ours_b = sims
        np.testing.assert_allclose(ours_a, ref_a, atol=3e-5, rtol=3e-5)
        np.testing.assert_allclose(ours_b, ref_b, atol=3e-5, rtol=3e-5)

    @pytest.mark.parametrize("use_dcl", [False, True])
    def test_filip_loss(self, ref_tu_filip, sims, use_dcl):
        ref_a, ref_b, ours_a, ours_b = sims
        if use_dcl:
            ref_loss = 0.5 * (
                ref_tu_filip._contrastive_loss(torch.tensor(ref_a), True)
                + ref_tu_filip._contrastive_loss(torch.tensor(ref_b), True)
            ).item()
        else:
            ref_loss = ref_tu_filip._compute_loss(
                torch.tensor(ref_a), torch.tensor(ref_b)).item()
        ours = float(infonce.filip_loss(
            jnp.asarray(ours_a), jnp.asarray(ours_b), use_dcl=use_dcl))
        assert ours == pytest.approx(ref_loss, abs=1e-5)

    def test_include_group_form(self, ref_models, rng):
        """models.py:326-330,353-354 grouped scoring vs our vmapped form,
        on raw normalised token tensors (no encoder — isolates the kernel)."""
        M, N, B, TA, TB, D = 2, 3, 4, 6, 5, 8
        ha = rng.standard_normal((M, B, TA, D)).astype(np.float32)
        hb = rng.standard_normal((N, B, TB, D)).astype(np.float32)
        ha /= np.linalg.norm(ha, axis=-1, keepdims=True)
        hb /= np.linalg.norm(hb, axis=-1, keepdims=True)
        ma = (rng.random((M, B, TA)) < 0.8).astype(np.int64)
        mb = (rng.random((N, B, TB)) < 0.8).astype(np.int64)
        ma[..., 0] = 1
        mb[..., 0] = 1
        t = 0.8
        ref_a, ref_b = ref_models.ExtendedFILIP._filip_similarity_score(
            torch.tensor(ha), torch.tensor(hb), torch.tensor(ma),
            torch.tensor(mb), torch.tensor(t), include_group=True)
        ours_a, ours_b = filip.filip_similarity_grouped(
            jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma),
            jnp.asarray(mb), jnp.asarray(t))
        np.testing.assert_allclose(
            np.asarray(ours_a), ref_a.numpy(), atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ours_b), ref_b.numpy(), atol=2e-5, rtol=2e-5)

    def test_mean_average_similarity(self, ref_models, rng):
        """The unused reference variant (models.py:266-290) — ours must still
        match it (divides by T, not valid count)."""
        B, T, D = 3, 7, 8
        ha = rng.standard_normal((B, T, D)).astype(np.float32)
        hb = rng.standard_normal((B, T, D)).astype(np.float32)
        ma = (rng.random((B, T)) < 0.8).astype(np.float32)
        mb = (rng.random((B, T)) < 0.8).astype(np.float32)
        ref = ref_models.ExtendedFILIP._mean_average_similarity_score(
            torch.tensor(ha), torch.tensor(hb), torch.tensor(ma),
            torch.tensor(mb), torch.tensor(0.9))
        ours = filip.mean_average_similarity(
            jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma),
            jnp.asarray(mb), jnp.asarray(0.9))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   atol=2e-5, rtol=2e-5)
