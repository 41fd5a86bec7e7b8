"""Full-architecture ESM-2 parity vs a random-weight HF EsmModel (offline).

Closes the depth gap VERDICT r2 called out: the in-suite oracle is a
2-layer/64-hidden toy, while the "bitwise-comparable similarity matrices"
target (reference main.py:20-24) rides on a 30-layer/640-hidden backbone.
The real checkpoint is network-gated, but the *architecture* is not: a
randomly initialised HF `EsmModel` at the t30_150M shape exercises the same
30-layer error accumulation, so convert_hf_state_dict + our forward can be
checked at full depth/width offline. Run on CPU (TPU f32 matmuls default to
bf16-pass precision).

Usage:
  JAX_PLATFORMS=cpu python tools/check_esm2_full_parity.py \
      [--config t30_150M] [--cases 128,512,1024] [--batch 2] [--seed 0]

Prints one JSON line per (T, variant) case with f32 max-abs / cosine error
vs HF, plus our bf16-vs-f32 drift (the dtype the bench actually runs), and
a final summary line. Recorded numbers live in PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_hf(cfg, seed: int):
    import torch
    from transformers import EsmConfig, EsmModel

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
    return model


def rand_batch(rng, B, T, with_pad, with_mask_tok):
    import numpy as np

    ids = rng.integers(4, 24, size=(B, T)).astype(np.int64)
    ids[:, 0] = 0  # cls
    mask = np.ones((B, T), dtype=np.int64)
    for b in range(B):
        L = T if not with_pad else T - (b * 7) % max(1, T // 3)
        L = max(L, 3)
        ids[b, L - 1] = 2  # eos
        ids[b, L:] = 1
        mask[b, L:] = 0
    if with_mask_tok:
        # a few <mask> tokens per row (MLM-style); unpadded batches only —
        # installed transformers' token-dropout ratio uses full T, ours the
        # reference-pinned 4.32 true-length semantics (they agree unpadded)
        n_mask = max(1, T // 64)
        for b in range(B):
            cols = rng.choice(np.arange(2, T - 2), size=n_mask, replace=False)
            ids[b, cols] = 32
    return ids, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="t30_150M")
    ap.add_argument("--cases", default="128,512,1024",
                    help="comma-separated sequence lengths")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import jax.numpy as jnp

    from protein_clip_tpu.models import esm2

    cfg = getattr(esm2.ESM2Config, args.config)()
    t0 = time.time()
    hf = make_hf(cfg, args.seed)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = esm2.convert_hf_state_dict(sd, cfg)
    print(f"# built {args.config} HF oracle + converted in "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    cfg_bf16 = getattr(esm2.ESM2Config, args.config)(
        compute_dtype=jnp.bfloat16)
    params_bf16 = esm2.convert_hf_state_dict(sd, cfg_bf16,
                                             dtype=jnp.bfloat16)
    rng = np.random.default_rng(args.seed)
    results = []
    for T in [int(x) for x in args.cases.split(",")]:
        for variant, with_pad, with_mask in (("padded", True, False),
                                             ("masked", False, True)):
            ids, mask = rand_batch(rng, args.batch, T, with_pad, with_mask)
            with torch.no_grad():
                ref = hf(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask)
                         ).last_hidden_state.numpy()
            jid = jnp.asarray(ids, jnp.int32)
            jm = jnp.asarray(mask, jnp.int32)
            ours = np.asarray(esm2.forward(params, jid, jm, cfg))
            ours_bf16 = np.asarray(
                esm2.forward(params_bf16, jid, jm, cfg_bf16)
            ).astype(np.float32)

            valid = mask.astype(bool)
            a, b = ours[valid], ref[valid]
            max_abs = float(np.max(np.abs(a - b)))
            denom = (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
            cos = np.sum(a * b, axis=-1) / np.maximum(denom, 1e-30)
            c = ours_bf16[valid]
            bf16_max_abs = float(np.max(np.abs(c - a)))
            cos_bf = (np.sum(a * c, axis=-1)
                      / np.maximum(np.linalg.norm(a, axis=-1)
                                   * np.linalg.norm(c, axis=-1), 1e-30))
            row = {
                "config": args.config, "T": T, "variant": variant,
                "f32_max_abs": max_abs,
                "f32_min_cos": float(np.min(cos)),
                "bf16_drift_max_abs": bf16_max_abs,
                "bf16_min_cos_vs_f32": float(np.min(cos_bf)),
                "ref_abs_scale": float(np.max(np.abs(b))),
            }
            results.append(row)
            print(json.dumps(row))

    worst = {
        "config": args.config,
        "worst_f32_max_abs": max(r["f32_max_abs"] for r in results),
        "worst_f32_min_cos": min(r["f32_min_cos"] for r in results),
        "worst_bf16_min_cos_vs_f32": min(r["bf16_min_cos_vs_f32"]
                                         for r in results),
    }
    print(json.dumps({"summary": worst}))
    # the per-dtype tolerance claim (PARITY.md): f32 forward cosine vs HF
    # >= 1 - 1e-6 at full depth; bf16 drift cosine >= 0.995
    ok = (worst["worst_f32_min_cos"] >= 1 - 1e-6
          and worst["worst_bf16_min_cos_vs_f32"] >= 0.995)
    print(f"# {'PASS' if ok else 'FAIL'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
