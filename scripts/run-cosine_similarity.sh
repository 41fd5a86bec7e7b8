#!/usr/bin/env bash
# Similarity-matrix plots from a checkpoint (reference: run-cosine_similarity.sh)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m protein_clip_tpu.cli.cosine_similarity "$@" 2>&1 | tee -a cosine_similarity.log
