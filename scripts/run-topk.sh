#!/usr/bin/env bash
# Top-k retrieval eval (reference: run-topk.sh; 10h there, seconds here —
# candidates are encoded once instead of once per query)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m protein_clip_tpu.cli.topk "$@" 2>&1 | tee -a topk.log
