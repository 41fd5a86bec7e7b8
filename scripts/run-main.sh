#!/usr/bin/env bash
# TPU launch wrapper for the peptide-receptor CLIP run
# (role of the reference's hpc_bash_scripts/run-main.sh SLURM script;
# on Cloud TPU VMs there is no scheduler — run directly on the host).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m protein_clip_tpu.cli.main "$@" 2>&1 | tee -a main.log
