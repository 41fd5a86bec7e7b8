"""Run every bench mode and print one labeled JSON line per mode.

Reproduces the docs/PERF.md measurement matrix in one command. Each mode
runs bench.py in a fresh subprocess (cold-process compiles dominate the
wall time over the axon tunnel — expect 5-25 min per mode; the persistent
compilation cache helps repeats). Select modes with --modes (comma list).

    python tools/bench_matrix.py --modes clip,filip
    python tools/bench_matrix.py            # everything (~1.5 h)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

MODES: dict[str, dict[str, str]] = {
    # the graded baseline metric (t30_150M bf16, packed, global batch 256)
    "clip": {},
    "clip_longtail": {"PCT_BENCH_PROFILE": "longtail"},
    "clip_longtail_tiered": {"PCT_BENCH_PROFILE": "longtail",
                             "PCT_PACK_TIERS": "4"},
    "filip": {"PCT_BENCH_MODE": "filip"},
    "filip_longtail": {"PCT_BENCH_MODE": "filip",
                       "PCT_BENCH_PROFILE": "longtail"},
    "filip_longtail_tiered": {"PCT_BENCH_MODE": "filip",
                              "PCT_BENCH_PROFILE": "longtail",
                              "PCT_PACK_TIERS": "4"},
    "clip_int8": {"PCT_ESM_DTYPE": "int8"},
    "filip_int8": {"PCT_BENCH_MODE": "filip", "PCT_ESM_DTYPE": "int8"},
    "clip_650M": {"PCT_ESM_CONFIG": "t33_650M"},
    "clip_650M_int8": {"PCT_ESM_CONFIG": "t33_650M",
                       "PCT_ESM_DTYPE": "int8"},
    "clip_3B": {"PCT_ESM_CONFIG": "t36_3B"},
    "clip_3B_int8": {"PCT_ESM_CONFIG": "t36_3B", "PCT_ESM_DTYPE": "int8"},
    # mesh-sharded step machinery (parallel/step.py) incl. the int8 w_q/w_s
    # Megatron-spec path; on one chip mesh=1x1 (overhead check), on real
    # multi-chip set PCT_MESH_TP to measure TP scaling
    "clip_3B_int8_sharded": {"PCT_BENCH_MODE": "sharded",
                             "PCT_ESM_CONFIG": "t36_3B",
                             "PCT_ESM_DTYPE": "int8"},
    "eval": {"PCT_BENCH_MODE": "eval"},
    # unfrozen-backbone training (train/finetune.py): packed rows
    # (default) and the plain single-bucket path
    "finetune_packed": {"PCT_BENCH_MODE": "finetune"},
    "finetune_plain": {"PCT_BENCH_MODE": "finetune",
                       "PCT_FINETUNE_PACKED": "0"},
    # full 650M finetune fits one v5e with donated buffers (7.8 GB
    # params+Adam); compare lora_650M (faster, ~MBs of state)
    "finetune_650M": {"PCT_BENCH_MODE": "finetune",
                      "PCT_ESM_CONFIG": "t33_650M"},
    "finetune_filip": {"PCT_BENCH_MODE": "finetune_filip"},
    "finetune_filip_plain": {"PCT_BENCH_MODE": "finetune_filip",
                             "PCT_FINETUNE_PACKED": "0"},
    # negative-pool scaling: the tiled InfoNCE kernel carries the global
    # batch past the single-shot VMEM wall
    "clip_gb512": {"PCT_GLOBAL_BATCH": "512"},
    "clip_gb1024": {"PCT_GLOBAL_BATCH": "1024"},
    # masked-LM objective (cli/mlm_train.py): head-only and continued
    # pretraining (f32 backbone masters)
    "mlm_head": {"PCT_BENCH_MODE": "mlm"},
    "mlm_head_packed": {"PCT_BENCH_MODE": "mlm", "PCT_MLM_PACKED": "1"},
    "mlm_finetune": {"PCT_BENCH_MODE": "mlm", "PCT_MLM_MODE": "finetune"},
    "mlm_finetune_packed": {"PCT_BENCH_MODE": "mlm",
                            "PCT_MLM_MODE": "finetune",
                            "PCT_MLM_PACKED": "1"},
    # online HTTP serving (cli/serve.py): latency + QPS
    "serve": {"PCT_BENCH_MODE": "serve"},
    # FILIP late-interaction bulk scoring (topk/retrieve/serve --filip)
    "filip_retrieve": {"PCT_BENCH_MODE": "filip_retrieve"},
    # parameter-efficient finetuning (train/lora.py), packed rows
    "lora": {"PCT_BENCH_MODE": "lora"},
    "lora_650M": {"PCT_BENCH_MODE": "lora", "PCT_ESM_CONFIG": "t33_650M"},
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--modes", default=",".join(MODES),
                    help="comma-separated subset of: " + ", ".join(MODES))
    ap.add_argument("--timeout", type=int, default=1800,
                    help="seconds per mode")
    args = ap.parse_args()

    bench = Path(__file__).resolve().parents[1] / "bench.py"
    rc = 0
    for mode in args.modes.split(","):
        mode = mode.strip()
        if mode not in MODES:
            print(f"unknown mode {mode!r}", file=sys.stderr)
            return 2
        # start from a clean slate: ambient PCT_* knobs (e.g. a leftover
        # PCT_BENCH_MODE from a manual run) must not leak into modes that
        # don't set them, or rows get mislabeled.
        env = {k: v for k, v in os.environ.items()
               if not k.startswith("PCT_")}
        env.update(MODES[mode])
        try:
            proc = subprocess.run(
                [sys.executable, str(bench)], env=env,
                capture_output=True, text=True, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(json.dumps({"mode": mode, "error": "timeout"}))
            rc = 1
            continue
        line = next((ln for ln in reversed(proc.stdout.splitlines())
                     if ln.startswith("{")), None)
        if proc.returncode != 0 or line is None:
            print(json.dumps({"mode": mode, "error": f"rc={proc.returncode}",
                              "stderr_tail": proc.stderr[-300:]}))
            rc = 1
            continue
        print(json.dumps({"mode": mode, **json.loads(line)}))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
