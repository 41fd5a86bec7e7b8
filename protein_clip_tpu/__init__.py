"""protein_clip_tpu — a TPU-native contrastive protein-language framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``pan-emily/protein-clip`` (reference at /root/reference): dual-encoder
CLIP and FILIP late-interaction models over a frozen ESM-2 backbone,
trained with global-batch InfoNCE whose negatives span a TPU mesh.

Subpackages
-----------
- ``data``     : tokenizer, FASTA IO, clustering (native C++), splits, sampling
- ``models``   : pure-JAX ESM-2, projection heads, CLIP / FILIP / MLM models
- ``ops``      : numerics (InfoNCE, FILIP max-sim) with fused Pallas TPU kernels
- ``parallel`` : mesh construction, sharding rules, collectives
- ``train``    : grad-cache microbatching, train loops, optimizers, checkpoints
- ``eval``     : retrieval (top-k), similarity matrices, MLM mask sweeps
- ``viz``      : matplotlib artifact parity with the reference run contract
- ``cli``      : entry points mirroring main.py / main_2protein.py / ...
"""

__version__ = "0.1.0"
