"""Flagship-depth (t30_150M) parity: backbone + end-to-end similarity matrix.

VERDICT r3 #3: every headline number rides the 30-layer/640-hidden backbone,
but the in-suite oracles stopped at t12_35M. These tests pin the full
flagship shape against HF torch (random weights — the real checkpoint is
network-gated, the architecture and its 30-layer error accumulation are
not), and pin the complete reference recipe end to end: HF EsmModel + a
torch re-statement of the reference head pipeline
(/root/reference/modules/models.py:7-130 — Linear projection, per-token
FFN, masked mean, pooled FFN, L2-normalize * exp(t/2), similarity matrix
de-scaled by exp(-t), visualizations.py:38-52) vs our clip.forward +
cosine_similarity_matrix. This is the strongest offline proxy for the
"bitwise-comparable similarity matrices" north star (reference
main.py:20-24).

Slow tier: building a random 150M HF model + two full-depth forwards on the
one-core CPU host takes minutes. Recorded tolerances: PARITY.md (f32
max-abs 5.7e-6 at full depth, activation scale ~4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_clip_tpu.models import clip, esm2

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow


def _make_hf_t30(seed=0):
    from transformers import EsmConfig, EsmModel

    cfg = esm2.ESM2Config.t30_150M()
    hf_cfg = EsmConfig(
        vocab_size=33,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=1026,
        position_embedding_type="rotary",
        pad_token_id=1,
        mask_token_id=32,
        token_dropout=True,
        emb_layer_norm_before=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = EsmModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def flagship_pair():
    hf, cfg = _make_hf_t30()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = esm2.convert_hf_state_dict(sd, cfg)
    return hf, cfg, params


def _rand_batch(rng, B=2, T=64):
    ids = rng.integers(4, 24, size=(B, T)).astype(np.int64)
    ids[:, 0] = 0  # cls
    mask = np.ones((B, T), dtype=np.int64)
    lens = [T, T - 9]
    for b in range(B):
        L = lens[b % len(lens)]
        ids[b, L - 1] = 2  # eos
        ids[b, L:] = 1
        mask[b, L:] = 0
    return ids, mask


def test_full_depth_forward_parity_t30_150M(flagship_pair, rng):
    """30-layer forward vs HF at the exact flagship shape (padded batch)."""
    hf, cfg, params = flagship_pair
    ids, mask = _rand_batch(rng)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = np.asarray(esm2.forward(params, jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32), cfg))
    valid = mask.astype(bool)
    a, b = out[valid], ref[valid]
    # PARITY.md recorded worst f32 max-abs 5.7e-6 over T up to 1024; pin
    # with ~10x headroom for rng variation across batches/hosts.
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-5)
    cos = (np.sum(a * b, -1)
           / np.maximum(np.linalg.norm(a, axis=-1)
                        * np.linalg.norm(b, axis=-1), 1e-30))
    assert float(np.min(cos)) >= 1 - 1e-6


def _torch_ffn(x, blocks, out_w, out_b):
    """Reference FFN: (Linear, ReLU, LayerNorm, Dropout@eval) x (h-1) + Linear
    (models.py:54-73), eval mode (dropout off)."""
    for w, b, ln_w, ln_b in blocks:
        x = torch.nn.functional.linear(x, w.T.contiguous(), b)
        x = torch.relu(x)
        x = torch.nn.functional.layer_norm(x, (x.shape[-1],), ln_w, ln_b,
                                           eps=1e-5)
    return torch.nn.functional.linear(x, out_w.T.contiguous(), out_b)


def _torch_head(head_params, hidden_t, mask_t, temperature):
    """Torch re-statement of the reference Encoder head (models.py:32-90):
    projection -> per-token FFN -> masked mean -> pooled FFN -> L2 norm *
    exp(t/2). Weights come FROM our JAX pytree so the two pipelines compute
    the same function if (and only if) our head math matches the recipe."""
    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    proj = head_params["projection"]
    x = torch.nn.functional.linear(hidden_t, t(proj["w"]).T.contiguous(),
                                   t(proj["b"]))

    def blocks_of(ffn):
        bl = ffn["blocks"]
        n = np.asarray(bl["w"]).shape[0]
        return [(t(bl["w"][i]), t(bl["b"][i]), t(bl["ln_w"][i]),
                 t(bl["ln_b"][i])) for i in range(n)]

    aa = head_params["aa_ffn"]
    x = _torch_ffn(x, blocks_of(aa), t(aa["out"]["w"]), t(aa["out"]["b"]))
    m = mask_t.to(x.dtype)
    pooled = (x * m[..., None]).sum(-2) / m.sum(-1, keepdim=True).clamp(min=1)
    emb = head_params["emb_ffn"]
    pooled = _torch_ffn(pooled, blocks_of(emb), t(emb["out"]["w"]),
                        t(emb["out"]["b"]))
    normed = torch.nn.functional.normalize(pooled, dim=-1)
    return normed * torch.exp(torch.tensor(float(temperature)) / 2.0)


def test_similarity_matrix_end_to_end_t30_150M(flagship_pair, rng):
    """Golden end-to-end check: HF torch backbone + torch reference-head
    recipe vs our clip.forward at full 30-layer depth — the similarity
    matrices (scaled logits AND de-scaled raw cosine) must agree."""
    hf, esm_cfg, esm_params = flagship_pair
    mcfg = clip.CLIPConfig(esm=esm_cfg)
    params = clip.init_params(jax.random.key(7), mcfg)

    pep_ids, pep_mask = _rand_batch(rng, B=3, T=24)
    rec_ids, rec_mask = _rand_batch(rng, B=3, T=64)
    batch = {
        "pep_ids": jnp.asarray(pep_ids, jnp.int32),
        "pep_mask": jnp.asarray(pep_mask, jnp.int32),
        "rec_ids": jnp.asarray(rec_ids, jnp.int32),
        "rec_mask": jnp.asarray(rec_mask, jnp.int32),
    }
    pep, rec = clip.forward(params, esm_params, batch, mcfg, train=False)
    ours_logits = np.asarray(jnp.einsum("id,jd->ij", pep, rec))
    ours_cos = np.asarray(
        clip.cosine_similarity_matrix(pep, rec, params["temperature"]))

    with torch.no_grad():
        hp = hf(input_ids=torch.tensor(pep_ids),
                attention_mask=torch.tensor(pep_mask)).last_hidden_state
        hr = hf(input_ids=torch.tensor(rec_ids),
                attention_mask=torch.tensor(rec_mask)).last_hidden_state
        temp = float(np.asarray(params["temperature"]))
        pep_t = _torch_head(params["pep"], hp, torch.tensor(pep_mask), temp)
        rec_t = _torch_head(params["rec"], hr, torch.tensor(rec_mask), temp)
        ref_logits = (pep_t @ rec_t.T).numpy()
        ref_cos = ref_logits * np.exp(-temp)

    # Backbone drift ~6e-6 feeds through two 2-deep FFNs + L2 norm; the
    # similarity entries are O(1) cosines (scale exp(t)=e). Pin at 1e-4.
    np.testing.assert_allclose(ours_logits, ref_logits, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(ours_cos, ref_cos, atol=1e-4, rtol=1e-4)
    # raw cosines must be true cosines of the normalized embeddings
    assert np.all(np.abs(ours_cos) <= 1.0 + 1e-5)
