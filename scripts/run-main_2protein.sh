#!/usr/bin/env bash
# Protein-protein CLIP run (reference: run-main_2protein.sh, 25h walltime)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m protein_clip_tpu.cli.main_2protein "$@" 2>&1 | tee -a main_2protein.log
