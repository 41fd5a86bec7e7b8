"""Checkpoint/resume: a killed-and-resumed run matches an uninterrupted one."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # kill-and-resume training runs; full-suite tier

from protein_clip_tpu.data.tokenizer import EsmTokenizer
from protein_clip_tpu.models import clip, esm2
from protein_clip_tpu.train import clip_engine, loop


class FakeLoader:
    def __init__(self, n_batches, bs, seed):
        r = np.random.default_rng(seed)
        aas = list("LAGVSERTIDPKQNFYMHWC")
        self.batches = [
            (["".join(r.choice(aas, 10)) for _ in range(bs)],
             ["".join(r.choice(aas, 20)) for _ in range(bs)])
            for _ in range(n_batches)]

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


@pytest.fixture(scope="module")
def setup():
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = clip.init_params(jax.random.key(2), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=4,
                                   accumulated_batches=2, num_chunks=2)
    return cfg, esm_params, params


def test_resume_matches_uninterrupted(setup, tmp_path):
    cfg, esm_params, params = setup
    tr, va = FakeLoader(4, 4, 0), FakeLoader(2, 4, 1)
    tok = EsmTokenizer()

    # uninterrupted 4 epochs
    full = loop.fit(tmp_path / "full", cfg, params, esm_params, tr, va, tok,
                    num_epochs=4, rng=jax.random.key(0), log=lambda s: None)

    # interrupted: 2 epochs, then resume to 4 with the SAME root rng —
    # per-epoch keys are fold_in(rng, epoch), so the resumed run derives
    # identical keys to the uninterrupted one.
    loop.fit(tmp_path / "split", cfg, params, esm_params, tr, va, tok,
             num_epochs=2, rng=jax.random.key(0), log=lambda s: None)
    resumed = loop.fit(tmp_path / "split", cfg, params, esm_params, tr, va,
                       tok, num_epochs=4, rng=jax.random.key(0),
                       log=lambda s: None, resume=True)

    np.testing.assert_allclose(resumed.train_losses[2:], full.train_losses[2:],
                               rtol=1e-5)
    np.testing.assert_allclose(resumed.val_losses[2:], full.val_losses[2:],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(resumed.best_params),
                    jax.tree.leaves(full.best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # CSV has all four epochs exactly once
    csv = (tmp_path / "split" / "losses_per_epoch.txt").read_text()
    lines = csv.strip().split("\n")
    assert len(lines) == 5
    assert [l.split(",")[0] for l in lines[1:]] == ["1", "2", "3", "4"]


def test_finetune_resume_matches_uninterrupted(setup, tmp_path):
    """The finetune engine's combined {esm, heads} pytree + multi_transform
    opt state round-trips through Orbax: a killed-and-resumed finetune run
    replays the uninterrupted one exactly (same fold_in(rng, epoch) keys,
    reseeded loaders)."""
    from protein_clip_tpu.train import finetune

    cfg, esm_params, params = setup
    import dataclasses
    cfg = dataclasses.replace(cfg, backbone_lr=1e-4)
    ft_params = finetune.init_params(esm_params, params)
    tr, va = FakeLoader(4, 4, 0), FakeLoader(2, 4, 1)
    tok = EsmTokenizer()

    full = loop.fit(tmp_path / "ft_full", cfg, ft_params, {}, tr, va, tok,
                    num_epochs=3, rng=jax.random.key(0), log=lambda s: None,
                    engine=finetune)
    loop.fit(tmp_path / "ft_split", cfg, ft_params, {}, tr, va, tok,
             num_epochs=1, rng=jax.random.key(0), log=lambda s: None,
             engine=finetune)
    resumed = loop.fit(tmp_path / "ft_split", cfg, ft_params, {}, tr, va,
                       tok, num_epochs=3, rng=jax.random.key(0),
                       log=lambda s: None, engine=finetune, resume=True)

    np.testing.assert_allclose(resumed.train_losses[1:],
                               full.train_losses[1:], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(resumed.params),
                    jax.tree.leaves(full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_without_state_starts_fresh(setup, tmp_path):
    cfg, esm_params, params = setup
    tr, va = FakeLoader(2, 4, 0), FakeLoader(2, 4, 1)
    res = loop.fit(tmp_path / "fresh", cfg, params, esm_params, tr, va,
                   EsmTokenizer(), num_epochs=1, rng=jax.random.key(0),
                   log=lambda s: None, resume=True)
    assert len(res.train_losses) == 1
