"""Ready-to-run real-weights verification gate (VERDICT r4 #6).

One command that — given network access or a local HF snapshot — loads
facebook/esm2_t30_150M_UR50D, converts it, asserts similarity-matrix parity
vs HF torch with the REAL weights, and runs the top-k retrieval protocol:

    python tools/verify_real_checkpoint.py --hf facebook/esm2_t30_150M_UR50D \
        [--reference-checkpoint runs/<ts>/best_model.pth] [--export-npz esm.npz]

Prints one JSON line; exit code 0 iff every parity check passed. The logic
lives in protein_clip_tpu/eval/real_checkpoint.py (fixture-tested offline in
tests/test_verify_real_checkpoint.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from protein_clip_tpu.eval.real_checkpoint import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
