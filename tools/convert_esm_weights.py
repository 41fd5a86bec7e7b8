"""Convert a HF ESM-2 checkpoint (torch) to the framework's flat npz format.

Usage:
  python tools/convert_esm_weights.py --hf facebook/esm2_t30_150M_UR50D \
      --out esm2_t30_150M.npz [--config t30_150M] [--lm-head]

Works from a hub name (network required) or a local HF checkpoint directory.
The npz loads via `--esm-weights <out>.npz` on every CLI entry.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf", required=True,
                    help="HF hub id or local checkpoint dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default="t30_150M",
                    choices=["t30_150M", "t6_8M", "t12_35M", "t33_650M",
                             "t36_3B", "t48_15B", "tiny"])
    ap.add_argument("--lm-head", action="store_true",
                    help="also export the MLM head (loads EsmForMaskedLM)")
    args = ap.parse_args()

    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train.checkpoint import export_npz

    # getattr keeps this in lockstep with the ESM2Config family
    # constructors (same dispatch as cli/common.esm_config) — all 7 CLI
    # families convert, including the 650M/3B/15B TP/PP showcase models
    cfg = getattr(esm2.ESM2Config, args.config)()

    if args.lm_head:
        from transformers import EsmForMaskedLM
        model = EsmForMaskedLM.from_pretrained(args.hf)
    else:
        from transformers import EsmModel
        model = EsmModel.from_pretrained(args.hf, add_pooling_layer=False)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    params = esm2.convert_hf_state_dict(sd, cfg)
    export_npz(args.out, params)
    print(f"wrote backbone params -> {args.out}")
    if args.lm_head:
        head = esm2.convert_hf_lm_head(sd)
        head_path = str(Path(args.out).with_suffix("")) + "_lm_head.npz"
        export_npz(head_path, head)
        print(f"wrote LM head -> {head_path}")


if __name__ == "__main__":
    main()
