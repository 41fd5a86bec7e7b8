"""Head pipeline parity vs a torch oracle built to the reference spec.

Oracle mirrors /root/reference/modules/models.py:7-90 (Encoder): projection
-> per-token FFN -> masked mean -> pooled FFN -> L2 norm -> exp(t/2) scale,
with FFN = (Linear, ReLU, LayerNorm, Dropout) x (depth-1) + Linear.
Weights are copied from our pytree into the torch modules, then outputs
compared in eval mode (dropout off).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_clip_tpu.models import heads, clip

torch = pytest.importorskip("torch")
nn = torch.nn


def torch_ffn_from_params(p, dim):
    n_blocks = p["blocks"]["w"].shape[0]
    layers = []
    for i in range(n_blocks):
        lin = nn.Linear(dim, dim)
        lin.weight.data = torch.tensor(np.asarray(p["blocks"]["w"][i]).T)
        lin.bias.data = torch.tensor(np.asarray(p["blocks"]["b"][i]))
        ln = nn.LayerNorm(dim)
        ln.weight.data = torch.tensor(np.asarray(p["blocks"]["ln_w"][i]))
        ln.bias.data = torch.tensor(np.asarray(p["blocks"]["ln_b"][i]))
        layers.append(nn.Sequential(lin, nn.ReLU(), ln, nn.Dropout(0.1)))
    out = nn.Linear(dim, dim)
    out.weight.data = torch.tensor(np.asarray(p["out"]["w"]).T)
    out.bias.data = torch.tensor(np.asarray(p["out"]["b"]))
    layers.append(out)
    return nn.Sequential(*layers)


class TorchEncoderOracle(nn.Module):
    """Reference Encoder head pipeline over precomputed hidden states."""

    def __init__(self, head_params, input_dim, dim):
        super().__init__()
        proj = nn.Linear(input_dim, dim)
        proj.weight.data = torch.tensor(np.asarray(head_params["projection"]["w"]).T)
        proj.bias.data = torch.tensor(np.asarray(head_params["projection"]["b"]))
        self.projection = proj
        self.aa_ffn = torch_ffn_from_params(head_params["aa_ffn"], dim)
        self.emb_ffn = torch_ffn_from_params(head_params["emb_ffn"], dim)

    def forward(self, hidden, mask, temperature):
        x = self.projection(hidden)
        x = self.aa_ffn(x)
        s = (x * mask.unsqueeze(-1)).sum(1)
        cnt = mask.sum(1, keepdim=True).clamp(min=1)
        pooled = s / cnt
        pooled = self.emb_ffn(pooled)
        normed = torch.nn.functional.normalize(pooled, dim=-1)
        return normed * torch.exp(temperature / 2)


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(0)):
    key = jax.random.key(0)
    input_dim, dim = 48, 32
    params = heads.init_head(key, input_dim, dim, h1=2, h2=2)
    B, T = 5, 11
    hidden = rng.normal(size=(B, T, input_dim)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.int32)
    mask[1, 7:] = 0
    mask[2, 3:] = 0
    return params, hidden, mask, input_dim, dim


def test_masked_mean_oracle(rng):
    h = rng.normal(size=(3, 7, 4)).astype(np.float32)
    m = np.array([[1] * 7, [1] * 3 + [0] * 4, [0] * 7], dtype=np.int32)
    got = np.asarray(heads.masked_mean(jnp.asarray(h), jnp.asarray(m)))
    for b in range(3):
        cnt = max(m[b].sum(), 1)
        exp = (h[b] * m[b][:, None]).sum(0) / cnt
        np.testing.assert_allclose(got[b], exp, atol=1e-6)


def test_encode_pooled_matches_torch_oracle(setup):
    params, hidden, mask, input_dim, dim = setup
    t = jnp.asarray(0.7)
    ours = np.asarray(heads.encode_pooled(
        params, jnp.asarray(hidden), jnp.asarray(mask), t, train=False))

    oracle = TorchEncoderOracle(params, input_dim, dim)
    oracle.eval()
    with torch.no_grad():
        ref = oracle(torch.tensor(hidden), torch.tensor(mask.astype(np.float32)),
                     torch.tensor(0.7)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
    # scaled embeddings: norm == exp(t/2)
    np.testing.assert_allclose(
        np.linalg.norm(ours, axis=-1), np.exp(0.35), atol=1e-5)


def test_encode_tokens_matches_torch_oracle(setup):
    params, hidden, mask, input_dim, dim = setup
    ours = np.asarray(heads.encode_tokens(params, jnp.asarray(hidden), train=False))
    oracle = TorchEncoderOracle(params, input_dim, dim)
    oracle.eval()
    with torch.no_grad():
        ref = oracle.aa_ffn(oracle.projection(torch.tensor(hidden))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_ffn_depth_one_is_single_linear():
    key = jax.random.key(1)
    p = heads.init_ffn(key, 8, depth=1)
    x = jnp.ones((2, 8))
    y = heads.apply_ffn(p, x, dropout_rate=0.5, train=False, rng=None)
    exp = x @ p["out"]["w"] + p["out"]["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(exp), atol=1e-6)


def test_dropout_deterministic_given_key(setup):
    params, hidden, mask, *_ = setup
    k = jax.random.key(3)
    a = heads.encode_pooled(params, jnp.asarray(hidden), jnp.asarray(mask),
                            jnp.asarray(1.0), train=True, rng=k)
    b = heads.encode_pooled(params, jnp.asarray(hidden), jnp.asarray(mask),
                            jnp.asarray(1.0), train=True, rng=k)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    c = heads.encode_pooled(params, jnp.asarray(hidden), jnp.asarray(mask),
                            jnp.asarray(1.0), train=True, rng=jax.random.key(4))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_clip_grads_only_touch_heads(setup):
    """Backbone is frozen by contract: loss grads exist for heads + temperature."""
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.ops.infonce import clip_infonce

    cfg = clip.CLIPConfig(input_dim=64, embedding_dim=16, h1=2, h2=2,
                          esm=esm2.ESM2Config.tiny())
    key = jax.random.key(0)
    params = clip.init_params(key, cfg)
    esm_params = esm2.init_params(jax.random.key(1), cfg.esm)
    B, T = 4, 10
    r = np.random.default_rng(0)
    batch = {
        "pep_ids": jnp.asarray(r.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.ones((B, T), jnp.int32),
        "rec_ids": jnp.asarray(r.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }

    def loss_fn(p):
        pep, rec = clip.forward(p, esm_params, batch, cfg, train=False)
        return clip_infonce(pep, rec)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
    assert np.abs(np.asarray(g["temperature"])) > 0
