"""Bake LoRA adapters into a standalone backbone npz for serving.

A LoRA run's best_model.npz carries {lora, heads}; at serving time the
eval CLIs merge adapters into the base on every load. This tool does the
merge ONCE and writes a plain ESM-2 weights npz usable anywhere
--esm-weights is accepted (cli.main, cli.embed, cli.serve, ...), with
the heads split into their own npz so the pair loads like any frozen-run
checkpoint:

    python tools/merge_lora_weights.py --checkpoint runs/<ts>/best_model.npz \\
        --esm-weights base_esm2.npz --config t30_150M \\
        --out-esm merged_esm2.npz --out-heads heads.npz

The merged backbone equals what the training run evaluated (same
alpha = 2*rank unless --alpha)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="{lora, heads} best_model.npz from a --lora-rank run")
    ap.add_argument("--esm-weights", required=True,
                    help="the BASE backbone npz the adapters trained against")
    ap.add_argument("--config", default="t30_150M",
                    help="ESM2Config family name (any of the CLI choices)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--alpha", type=float, default=None,
                    help="LoRA scale; default 2*rank")
    ap.add_argument("--out-esm", required=True)
    ap.add_argument("--out-heads", default=None,
                    help="also split the heads into their own npz")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train import lora
    from protein_clip_tpu.train.checkpoint import export_npz, load_npz

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    cfg = getattr(esm2.ESM2Config, args.config)(compute_dtype=dtype)
    like = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda: esm2.init_params(jax.random.key(0), cfg, dtype=dtype)))
    base = load_npz(args.esm_weights, like)

    with np.load(args.checkpoint) as data:
        lora_keys = [k for k in data.files if k.startswith("lora/")]
        if not lora_keys:
            raise SystemExit(f"{args.checkpoint} has no lora/ entries — "
                             "is this a --lora-rank run's checkpoint?")
        adapters: dict = {}
        heads = {k[len("heads/"):]: data[k]
                 for k in data.files if k.startswith("heads/")}
        for k in lora_keys:
            name, ab = k[len("lora/"):].rsplit("/", 1)
            adapters.setdefault(name, {})[ab] = jnp.asarray(data[k])

    rank = next(iter(adapters.values()))["a"].shape[-1]
    alpha = args.alpha if args.alpha is not None else 2.0 * rank
    merged = lora.merge_lora(base, adapters, alpha)
    export_npz(args.out_esm, merged)
    print(f"merged rank-{rank} adapters (alpha {alpha:g}) over "
          f"{args.esm_weights} -> {args.out_esm}")
    if args.out_heads:
        np.savez(args.out_heads, **heads)
        print(f"heads -> {args.out_heads}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
