"""Per-generation TPU budget calibration for the Pallas kernels.

Every working-set ceiling in this package was calibrated EMPIRICALLY on
TPU v5e (16 GiB HBM, ~128 MiB VMEM/core): the attention rows-per-program
byte budget (R=8 at T=512 bf16; 16 overflows — docs/PERF.md), the
single-shot fused-InfoNCE 8 MiB working set, the tiled-InfoNCE 8 MiB
f32 tile-set cap (rb=512 @ b<=1024 ... 128 @ 4096; 512 @ 4096 fails
Mosaic compile on v5e), and the FILIP max-sim backward's 2^26-element
recompute block (HBM-resident, ~1 GiB live).

This module is the ONE place those ceilings meet hardware: each budget is
the v5e-calibrated base x a per-generation scale looked up from
``jax.devices()[0].device_kind``, with a per-budget env override for
experiments and for generations not yet in the table. Unknown kinds fall
back to the v5e scale — conservative, since v5e's ceilings are at the
small end of current generations.

Calibrating a NEW generation: run ``python tools/tpu_smoke.py`` (the
compile+sanity sweep exercises every kernel at its budget edges), sweep
``PCT_ATTN_ROWS_PER_PROGRAM`` on ``bench.py``, then record the scales
here. The scales are deliberately coarse (powers of two): the bases carry
the precision, the scales only track hardware generations.
"""

from __future__ import annotations

import os

__all__ = [
    "device_generation",
    "on_tpu",
    "attn_rows_byte_budget",
    "attn_score_budget_elems",
    "infonce_vmem_budget",
    "infonce_tile_budget",
    "filip_bwd_budget_elems",
]

# (vmem_scale, hbm_scale) keyed by device_kind substring; longest match
# wins ("v5 lite" before "v5"). v5e == (1.0, 1.0) is the calibration
# baseline. VMEM scale guards Mosaic compile-time overflows (attention
# row blocks, InfoNCE tile sets); HBM scale guards runtime OOM (the FILIP
# backward's recompute blocks). v2/v3 cores carry far smaller vector
# memories than v5e — scale their VMEM budgets down hard; v5p/v6e carry
# v5e-class VMEM with 6x/2x the HBM.
_GENERATIONS: dict[str, tuple[float, float]] = {
    "v2": (0.125, 0.5),
    "v3": (0.125, 1.0),
    "v4": (1.0, 2.0),
    "v5 lite": (1.0, 1.0),   # v5e — the calibration platform
    "v5": (1.0, 6.0),        # v5p
    "v6 lite": (1.0, 2.0),   # v6e (Trillium)
}


def _scales_for_kind(kind: str) -> tuple[float, float]:
    """Longest device_kind-substring match; (1.0, 1.0) for unknown kinds
    (v5e ceilings) and non-TPU backends (kernel fallbacks handle those)."""
    kind = kind.lower()
    best = None
    for sub, scales in _GENERATIONS.items():
        if sub in kind and (best is None or len(sub) > len(best[0])):
            best = (sub, scales)
    return best[1] if best else (1.0, 1.0)


# cache ONLY a successful probe: a transient backend failure (the axon
# tunnel's "init UNAVAILABLE" flakiness) must not pin the (1.0, 1.0)
# fallback for the process lifetime — on v2/v3 that would leave VMEM
# budgets 8x too large (Mosaic compile failures), on v5p/v6e it would
# halve the FILIP backward's HBM block budget.
_GEN_CACHE: tuple[float, float] | None = None


def device_generation() -> tuple[float, float]:
    """(vmem_scale, hbm_scale) for the default JAX device."""
    global _GEN_CACHE
    if _GEN_CACHE is not None:
        return _GEN_CACHE
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:  # no backend THIS call — fall back, retry next call
        return (1.0, 1.0)
    _GEN_CACHE = _scales_for_kind(kind)
    return _GEN_CACHE


def on_tpu() -> bool:
    """Shared backend probe: every Pallas kernel in this package keys its
    interpret-mode fallback on this one predicate."""
    import jax

    return jax.default_backend() == "tpu"


def _scaled(env: str, base: int, scale: float) -> int:
    ov = os.environ.get(env)
    if ov:
        return int(ov)
    return max(1, int(base * scale))


def attn_rows_byte_budget() -> int:
    """bytes-per-lane of q rows one fused-attention program may hold
    (ops/attention_pallas._choose_rows_per_program). v5e ceiling: R=8 at
    T=512 bf16. Override: PCT_ATTN_ROWS_BYTE_BUDGET."""
    return _scaled("PCT_ATTN_ROWS_BYTE_BUDGET", 8 * 512 * 2,
                   device_generation()[0])


def attn_score_budget_elems() -> int:
    """f32 elements of the (q_block, T) score tile one fused-attention
    FORWARD program may hold (ops/attention_pallas q-block choosers; the
    backward uses half — it keeps four tiles live where the forward keeps
    two). v5e base: 2^19 elements = 2 MiB f32. Override:
    PCT_ATTN_SCORE_BUDGET_ELEMS."""
    return _scaled("PCT_ATTN_SCORE_BUDGET_ELEMS", 1 << 19,
                   device_generation()[0])


def infonce_vmem_budget() -> int:
    """Working-set bytes the single-shot fused InfoNCE kernel may keep
    VMEM-resident (train/clip_engine.fused_infonce_fits). Override:
    PCT_INFONCE_VMEM_BUDGET."""
    return _scaled("PCT_INFONCE_VMEM_BUDGET", 8 * 1024 * 1024,
                   device_generation()[0])


def infonce_tile_budget() -> int:
    """f32 tile-set bytes per tiled-InfoNCE backward program
    (ops/infonce_pallas.tiled_row_block): four (rb, b) tiles live.
    Override: PCT_INFONCE_TILE_BUDGET."""
    return _scaled("PCT_INFONCE_TILE_BUDGET", 8 * 1024 * 1024,
                   device_generation()[0])


def filip_bwd_budget_elems() -> int:
    """Elements per recomputed FILIP max-sim backward score block
    (ops/filip_pallas._raw_maxsim_bwd) — HBM-side: 2^26 = 256 MB block,
    ~1 GiB live on v5e. Override: PCT_FILIP_BWD_BUDGET_ELEMS."""
    return _scaled("PCT_FILIP_BWD_BUDGET_ELEMS", 1 << 26,
                   device_generation()[1])
