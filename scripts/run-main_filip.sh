#!/usr/bin/env bash
# FILIP run (reference: run-main_filip.sh, 24h walltime)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m protein_clip_tpu.cli.main_2protein_filip "$@" 2>&1 | tee -a main_filip.log
