"""ESM-2 encoder, implemented from scratch in pure JAX for TPU.

Re-implements the frozen backbone the reference obtains from HF
(``/root/reference/main.py:20-24``: ``EsmModel.from_pretrained(
"facebook/esm2_t30_150M_UR50D")``, 30 layers, hidden 640) as a functional
pytree-of-arrays model:

- Layer weights are *stacked* along a leading layer axis and the block is run
  with ``jax.lax.scan`` — one compiled layer body instead of 30 unrolled ones,
  and a natural unit for ``jax.checkpoint`` rematerialisation.
- Softmax is computed in float32 regardless of the compute dtype (bfloat16 on
  TPU), matching HF's ``softmax(..., dtype=torch.float32)``.
- Rotary embeddings, the exact-erf GELU, ESM's query-side 1/sqrt(d) scaling,
  and the "token dropout" mask-ratio rescaling all follow the published ESM-2
  semantics so that ``last_hidden_state`` is numerically interchangeable with
  the HF module the reference freezes.

``convert_hf_state_dict`` maps a HF ``EsmModel``/``EsmForMaskedLM`` state dict
onto this pytree (used by the weight-import CLI and by the parity tests, which
check against a small randomly initialised torch ESM).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 640
    num_layers: int = 30
    num_heads: int = 20
    intermediate_size: int = 2560
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    mask_token_id: int = 32
    token_dropout: bool = True
    # dtype the bulk matmuls run in; f32 accumulation is always used.
    compute_dtype: Any = jnp.float32
    # Attention implementation:
    # - "fused" (default): ops/attention_pallas.py — VMEM-resident scores
    #   per (row, 4-head group), segment-aware, shaped for ESM's
    #   head_dim=32 (TPU only, 128 <= T <= 2048). 651 vs eager's 467
    #   pairs/s on the packed bench; beats eager at every T in range
    #   (docs/PERF.md);
    # - "eager": einsum + masked softmax — XLA round-trips the f32 score
    #   tensor through HBM at T>=512; used off-TPU and outside the fused
    #   window. (A stock-flash path existed in round 1; it padded dh
    #   32->128 and lost to both — deleted.)
    attention_impl: str = "fused"
    # FFN gelu: "erf" is HF/original-ESM exact (the parity contract);
    # "tanh" is the bf16 tanh approximation — +4.3% step throughput
    # measured at t30_150M, token cosine drift vs erf 5e-8 at full depth
    # (~2000x below bf16 compute noise; docs/PERF.md ceiling
    # decomposition). CLI: --fast-gelu. The PCT_GELU env A/B knob is read
    # ONCE here at config build — never at trace time — so an explicit
    # gelu= (e.g. the CLI's erf parity contract) is authoritative even if
    # a bench wrapper left a stale PCT_GELU in the process (ADVICE r4).
    gelu: str = dataclasses.field(
        default_factory=lambda: os.environ.get("PCT_GELU", "erf"))
    fused_min_seq_len: int = 128   # eager wins for tiny T
    fused_max_seq_len: int = 2048  # q-blocked score tile must fit VMEM

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def t30_150M(**over) -> "ESM2Config":
        """facebook/esm2_t30_150M_UR50D (the reference's backbone)."""
        return ESM2Config(**over)

    @staticmethod
    def t6_8M(**over) -> "ESM2Config":
        """facebook/esm2_t6_8M_UR50D (notebooks/minimal_ram.ipynb variant)."""
        return ESM2Config(
            hidden_size=320, num_layers=6, num_heads=20,
            intermediate_size=1280, **over,
        )

    @staticmethod
    def t12_35M(**over) -> "ESM2Config":
        """facebook/esm2_t12_35M_UR50D."""
        return ESM2Config(
            hidden_size=480, num_layers=12, num_heads=20,
            intermediate_size=1920, **over,
        )

    @staticmethod
    def t33_650M(**over) -> "ESM2Config":
        """facebook/esm2_t33_650M_UR50D — fits one v5e chip in bf16."""
        return ESM2Config(
            hidden_size=1280, num_layers=33, num_heads=20,
            intermediate_size=5120, **over,
        )

    @staticmethod
    def t36_3B(**over) -> "ESM2Config":
        """facebook/esm2_t36_3B_UR50D — the tensor-parallel regime
        (parallel/sharding.py 'model' axis)."""
        return ESM2Config(
            hidden_size=2560, num_layers=36, num_heads=40,
            intermediate_size=10240, **over,
        )

    @staticmethod
    def t48_15B(**over) -> "ESM2Config":
        """facebook/esm2_t48_15B_UR50D — ~30 GB of bf16 weights, past one
        v5e chip's HBM: the pipeline-parallel regime (parallel/pipeline.py
        'stage' axis, composed with TP via make_pp_dp_mesh)."""
        return ESM2Config(
            hidden_size=5120, num_layers=48, num_heads=40,
            intermediate_size=20480, **over,
        )

    @staticmethod
    def tiny(**over) -> "ESM2Config":
        """Tiny config for tests."""
        return ESM2Config(
            hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, **over,
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ESM2Config, dtype=jnp.float32) -> Params:
    """Random init (HF initializer_range=0.02 normal)."""
    H, I, L, V = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    ks = jax.random.split(key, 8)

    def nrm(k, shape):
        return (0.02 * jax.random.normal(k, shape)).astype(dtype)

    def lin(k, fan_in, fan_out):
        return {"w": nrm(k, (L, fan_in, fan_out)), "b": jnp.zeros((L, fan_out), dtype)}

    def ln():
        return {"w": jnp.ones((L, H), dtype), "b": jnp.zeros((L, H), dtype)}

    params: Params = {
        "embed": {"word": nrm(ks[0], (V, H))},
        "layers": {
            "attn": {
                "q": lin(ks[1], H, H),
                "k": lin(ks[2], H, H),
                "v": lin(ks[3], H, H),
                "o": lin(ks[4], H, H),
                "ln": ln(),
            },
            "ffn": {
                "wi": lin(ks[5], H, I),
                "wo": lin(ks[6], I, H),
                "ln": ln(),
            },
        },
        "final_ln": {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
    }
    return params


def init_lm_head(key: jax.Array, cfg: ESM2Config, dtype=jnp.float32) -> Params:
    """ESM MLM head: dense -> gelu -> LN -> tied decoder + bias."""
    H, V = cfg.hidden_size, cfg.vocab_size
    k1 = key
    return {
        "dense": {"w": (0.02 * jax.random.normal(k1, (H, H))).astype(dtype),
                  "b": jnp.zeros((H,), dtype)},
        "ln": {"w": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
        "bias": jnp.zeros((V,), dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _gelu_exact(x, mode: str = "erf"):
    # ESM's original erf gelu (modeling_esm.py: gelu) — NOT the tanh approx.
    # mode="tanh" (ESM2Config.gelu / --fast-gelu; PCT_GELU resolves at
    # config build, see ESM2Config.gelu) swaps in the bf16 tanh
    # approximation: the wi matmul fusion is epilogue-limited (134 vs the
    # wo's 187 TF/s — the only difference between those fusions IS this
    # epilogue), +4.3% measured; erf stays the default for HF-parity
    # ("bitwise-comparable similarity matrices").
    if mode == "tanh":
        return jax.nn.gelu(x, approximate=True)
    x32 = x.astype(jnp.float32)
    return (x32 * 0.5 * (1.0 + jax.lax.erf(x32 / math.sqrt(2.0)))).astype(x.dtype)


def _rope_tables(seq_len: int, head_dim: int, dtype=jnp.float32):
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)                      # (T, dh/2)
    emb = np.concatenate([freqs, freqs], axis=-1)      # (T, dh)
    return jnp.asarray(np.cos(emb), dtype), jnp.asarray(np.sin(emb), dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(x, cos, sin):
    # x: (B, T, heads, dh); cos/sin: (T, dh) shared positions, or
    # (B, T, dh) per-token positions (packed rows, data/packing.py).
    # This layout keeps heads*dh as the (large) trailing lane span, so XLA
    # fuses RoPE into neighbouring ops; a head-major layout measured
    # 175 GB/s here (dh=32 minor dim = quarter VPU lanes + transposes).
    if cos.ndim == 2:
        return (x * cos[None, :, None, :]
                + _rotate_half(x) * sin[None, :, None, :])
    return x * cos[:, :, None, :] + _rotate_half(x) * sin[:, :, None, :]


def _dense(x, lp):
    """(B, T, in) @ layer params -> (B, T, out).

    Dispatches on the params: ``{"w", "b"}`` is the bf16/f32 MXU path;
    ``{"w_q", "w_s", "b"}`` (from ``quantize_params``) is w8a8 — dynamic
    per-token symmetric activation int8, per-output-channel weight int8,
    s8xs8->s32 on the MXU at twice the bf16 rate, dequantised in f32.
    """
    if "w_q" in lp:
        x32 = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                         1e-6) * (1.0 / 127.0)
        xq = jnp.round(x32 / xs).astype(jnp.int8)
        y = jnp.einsum("bti,io->bto", xq, lp["w_q"],
                       preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * lp["w_s"]).astype(x.dtype) \
            + lp["b"]
    return (jnp.einsum("bth,hd->btd", x, lp["w"],
                       preferred_element_type=jnp.float32)
            .astype(x.dtype) + lp["b"])


def _attention_block(x, p, mask_bias, segments, cos, sin, cfg: ESM2Config):
    """Pre-LN attention residual block in the native (B, T, heads, dh)
    layout. ``segments`` is (B, T) int32 — a plain 0/1 mask for padded
    batches, packed segment ids otherwise; ``mask_bias`` is its precomputed
    additive form for the eager path.
    """
    B, T, H = x.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    h = _layer_norm(x, p["ln"]["w"], p["ln"]["b"], cfg.layer_norm_eps)

    def proj(h, lp):
        return _dense(h, lp).reshape(B, T, nh, dh)

    q = proj(h, p["q"]) * (dh ** -0.5)   # ESM scales q before RoPE
    k = proj(h, p["k"])
    v = proj(h, p["v"])
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    if (cfg.attention_impl == "fused"
            and cfg.fused_min_seq_len <= T <= cfg.fused_max_seq_len
            and jax.default_backend() == "tpu"):
        from ..ops.attention_pallas import fused_attention
        ctx = fused_attention(q, k, v, segments).astype(x.dtype)
    else:
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + mask_bias  # (B,1,1,T) / (B,1,T,T) additive
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.reshape(B, T, H)
    return x + _dense(ctx, p["o"])


def _ffn_block(x, p, cfg: ESM2Config):
    h = _layer_norm(x, p["ln"]["w"], p["ln"]["b"], cfg.layer_norm_eps)
    h = _wi_gelu(h, p["wi"], cfg)
    return x + _dense(h, p["wo"])


def _wi_gelu(h, wi, cfg: ESM2Config):
    """wi matmul + gelu. PCT_FFN_PALLAS=1 routes the bf16 path through the
    experimental fused Pallas kernel (ops/ffn_pallas.py — MXU/VPU overlap
    hypothesis for the 134-vs-187 TF/s epilogue gap; measured in
    docs/PERF.md); default is XLA's fusion."""
    if os.environ.get("PCT_FFN_PALLAS") == "1" and "w" in wi:
        from ..ops import ffn_pallas

        B, T, H = h.shape
        M = wi["w"].shape[1]
        if ffn_pallas.enabled() and ffn_pallas.fits(B * T, H, M):
            mode = os.environ.get("PCT_GELU", cfg.gelu)
            out = ffn_pallas.dense_gelu(h.reshape(B * T, H), wi["w"],
                                        wi["b"], mode)
            return out.reshape(B, T, M)
    return _gelu_exact(_dense(h, wi), cfg.gelu)


def embed(params: Params, input_ids, attention_mask, cfg: ESM2Config,
          segment_ids: jax.Array | None = None):
    """Token embedding incl. ESM-2 token-dropout mask-ratio rescale.

    The rescale divides by (1 - observed mask ratio) over the sequence's
    TRUE length (transformers-4.32 / original-ESM semantics). With
    ``segment_ids`` (packed rows, data/packing.py) the ratio is computed
    per SEGMENT — each packed sequence sees exactly the ratio it would
    unpacked, which is what makes packed MLM exact (tests/test_mlm.py).
    Two (B, T)-element segment_sums once per forward; negligible next to
    the 30-layer stack.
    """
    x = jnp.take(params["embed"]["word"], input_ids, axis=0)
    x = x.astype(cfg.compute_dtype)
    if cfg.token_dropout:
        is_mask = (input_ids == cfg.mask_token_id)
        x = jnp.where(is_mask[..., None], 0.0, x)
        mask_ratio_train = 0.15 * 0.8
        if segment_ids is None:
            src_len = jnp.maximum(attention_mask.sum(-1), 1).astype(
                jnp.float32)
            ratio_obs = is_mask.sum(-1).astype(jnp.float32) / src_len
            scale = ((1.0 - mask_ratio_train) / (1.0 - ratio_obs))[:, None]
        else:
            # per-segment observed ratio, gathered back to tokens. Every
            # segment holds >= 2 tokens (<cls>...<eos>), so ids are
            # bounded by T//2; +2 slots cover id 0 (pads) and the bound.
            n_seg = segment_ids.shape[1] // 2 + 2
            valid = (segment_ids > 0).astype(jnp.float32)

            def stats(seg, v, m):
                return (jax.ops.segment_sum(v, seg, num_segments=n_seg),
                        jax.ops.segment_sum(m, seg, num_segments=n_seg))

            cnt, msk = jax.vmap(stats)(
                segment_ids, valid, is_mask.astype(jnp.float32) * valid)
            ratio_seg = msk / jnp.maximum(cnt, 1.0)
            ratio_tok = jnp.take_along_axis(ratio_seg, segment_ids, axis=1)
            scale = (1.0 - mask_ratio_train) / (1.0 - ratio_tok)  # (B, T)
        x = x * scale[..., None].astype(x.dtype)
    x = x * attention_mask[..., None].astype(x.dtype)
    return x


def forward(
    params: Params,
    input_ids: jax.Array,       # (B, T) int32
    attention_mask: jax.Array,  # (B, T) int32/bool
    cfg: ESM2Config,
    remat: bool = False,
    segment_ids: jax.Array | None = None,  # (B, T), packed rows
    positions: jax.Array | None = None,    # (B, T), within-segment pos
) -> jax.Array:
    """Return last_hidden_state (B, T, H), matching HF EsmModel semantics.

    With segment_ids/positions (packed rows, data/packing.py) attention is
    block-diagonal per segment, RoPE restarts per segment, and the
    token-dropout mask-ratio rescale is computed per segment — so each
    packed sequence computes exactly what it would unpacked, INCLUDING
    rows carrying <mask> tokens (packed MLM).
    """
    B, T = input_ids.shape
    x = embed(params, input_ids, attention_mask, cfg,
              segment_ids=segment_ids)

    neg = jnp.finfo(jnp.float32).min
    if segment_ids is not None:
        same = (segment_ids[:, :, None] == segment_ids[:, None, :])
        valid = (segment_ids > 0)[:, None, :]
        allowed = same & valid
        mask_bias = jnp.where(allowed[:, None, :, :], 0.0, neg
                              ).astype(jnp.float32)
    else:
        mask_bias = (1.0 - attention_mask[:, None, None, :]
                     .astype(jnp.float32)) * neg
    cos, sin = _rope_tables(T, cfg.head_dim, cfg.compute_dtype)
    if positions is not None:
        cos = jnp.take(cos, positions, axis=0)  # (B, T, dh)
        sin = jnp.take(sin, positions, axis=0)

    # unified masking: a plain 0/1 mask IS single-segment segment ids
    segments = (segment_ids if segment_ids is not None
                else attention_mask.astype(jnp.int32))

    def layer(x, lp):
        x = _attention_block(x, lp["attn"], mask_bias, segments, cos, sin,
                             cfg)
        x = _ffn_block(x, lp["ffn"], cfg)
        return x, None

    if remat:
        layer = jax.checkpoint(layer)

    # PCT_LAYER_UNROLL: unrolls the layer scan (30 iterations per chunk —
    # the hot while loop; the chunk-scan unroll above it measured a wash)
    unroll = int(os.environ.get("PCT_LAYER_UNROLL", "1"))
    x, _ = jax.lax.scan(layer, x, params["layers"], unroll=unroll)
    x = _layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"],
                    cfg.layer_norm_eps)
    return x


def lm_logits(params: Params, lm_head: Params, hidden: jax.Array,
              cfg: ESM2Config) -> jax.Array:
    """ESM MLM head over last_hidden_state: dense→gelu→LN→tied-decoder+bias."""
    h = (jnp.einsum("bth,hd->btd", hidden, lm_head["dense"]["w"],
                    preferred_element_type=jnp.float32).astype(hidden.dtype)
         + lm_head["dense"]["b"])
    h = _gelu_exact(h, cfg.gelu)
    h = _layer_norm(h, lm_head["ln"]["w"], lm_head["ln"]["b"], cfg.layer_norm_eps)
    logits = jnp.einsum("bth,vh->btv", h, params["embed"]["word"].astype(h.dtype),
                        preferred_element_type=jnp.float32)
    return logits + lm_head["bias"].astype(logits.dtype)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_state_dict(state_dict: dict[str, np.ndarray],
                          cfg: ESM2Config, dtype=np.float32) -> Params:
    """Map a HF EsmModel / EsmForMaskedLM state dict onto our stacked pytree.

    Accepts numpy arrays (call ``.numpy()`` on torch tensors first). Linear
    weights are transposed from torch's (out, in) to (in, out).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("esm.")
        sd[k] = np.asarray(v, dtype=dtype)

    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = False):
        arrs = [sd[fmt.format(i=i)] for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    p = "encoder.layer.{i}."
    params: Params = {
        "embed": {"word": jnp.asarray(sd["embeddings.word_embeddings.weight"])},
        "layers": {
            "attn": {
                "q": {"w": stack(p + "attention.self.query.weight", True),
                      "b": stack(p + "attention.self.query.bias")},
                "k": {"w": stack(p + "attention.self.key.weight", True),
                      "b": stack(p + "attention.self.key.bias")},
                "v": {"w": stack(p + "attention.self.value.weight", True),
                      "b": stack(p + "attention.self.value.bias")},
                "o": {"w": stack(p + "attention.output.dense.weight", True),
                      "b": stack(p + "attention.output.dense.bias")},
                "ln": {"w": stack(p + "attention.LayerNorm.weight"),
                       "b": stack(p + "attention.LayerNorm.bias")},
            },
            "ffn": {
                "wi": {"w": stack(p + "intermediate.dense.weight", True),
                       "b": stack(p + "intermediate.dense.bias")},
                "wo": {"w": stack(p + "output.dense.weight", True),
                       "b": stack(p + "output.dense.bias")},
                "ln": {"w": stack(p + "LayerNorm.weight"),
                       "b": stack(p + "LayerNorm.bias")},
            },
        },
        "final_ln": {
            "w": jnp.asarray(sd["encoder.emb_layer_norm_after.weight"]),
            "b": jnp.asarray(sd["encoder.emb_layer_norm_after.bias"]),
        },
    }
    return params


def convert_hf_lm_head(state_dict: dict[str, np.ndarray]) -> Params:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {
        "dense": {"w": jnp.asarray(sd["lm_head.dense.weight"].T),
                  "b": jnp.asarray(sd["lm_head.dense.bias"])},
        "ln": {"w": jnp.asarray(sd["lm_head.layer_norm.weight"]),
               "b": jnp.asarray(sd["lm_head.layer_norm.bias"])},
        "bias": jnp.asarray(sd["lm_head.bias"]),
    }


def quantize_params(params: Params) -> Params:
    """Post-training int8 quantisation of the big linear weights (opt-in,
    ``--esm-dtype int8``): symmetric per-output-channel scales for
    attn q/k/v/o and ffn wi/wo; embeddings, layer norms, and biases stay
    in their original dtype. The matching activation quantisation is
    dynamic per token inside ``_dense``.

    NOT a parity path: hidden states drift by int8 rounding (the parity
    target stays bf16/f32). Serving/throughput feature — the frozen
    backbone takes it without retraining. Composes with the
    tensor-parallel 'model' axis: parallel/sharding.esm_param_specs emits
    w_q/w_s splits for quantized trees (parity-pinned in
    tests/test_quantized.py).
    """

    @jax.jit
    def q_stack(w_stack):
        # One layer at a time: casting the full stacked (L, in, out)
        # tensor to f32 peaks at 2x3.8 GB of temps at t36_3B while the
        # bf16 originals are still held — measured HBM OOM on v5e.
        # lax.map bounds the f32 working set to a single layer.
        def one(w_l):                              # (in, out)
            w = w_l.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
            return jnp.round(w / s).astype(jnp.int8), s
        return jax.lax.map(one, w_stack)

    def q(lp):
        wq, s = q_stack(lp["w"])                   # (L, in, out) stacked
        return {"w_q": wq, "w_s": s, "b": lp["b"]}

    layers = params["layers"]
    return {
        "embed": params["embed"],
        "layers": {
            "attn": {k: (q(layers["attn"][k]) if k in ("q", "k", "v", "o")
                         else layers["attn"][k])
                     for k in layers["attn"]},
            "ffn": {k: (q(layers["ffn"][k]) if k in ("wi", "wo")
                        else layers["ffn"][k])
                    for k in layers["ffn"]},
        },
        "final_ln": params["final_ln"],
    }


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cast_params(params: Params, dtype) -> Params:
    return jax.tree.map(lambda x: x.astype(dtype), params)
