"""Optimizer factory.

Default is Adam with the reference's exact hyperparameters (main.py:45:
``torch.optim.Adam(lr=1e-3)`` => betas (0.9, 0.999), eps 1e-8).

``build``/``from_config`` add the production-trainer knobs the reference
lacks — decoupled weight decay (AdamW) and warmup / cosine-decay
learning-rate schedules — all opt-in so the defaults stay
reference-exact. These are safe to combine with every parallel step in
``parallel/``: the DP steps produce the TRUE gradient of the global loss
(pmean-corrected; see parallel/step.py), so non-scale-invariant
transforms like weight decay are device-count independent — the
SGD-parametrized parity tests in tests/test_parallel.py pin exactly
this property.
"""

from __future__ import annotations

import optax


def adam(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps)


def build(lr: float, *, weight_decay: float = 0.0, warmup_steps: int = 0,
          schedule: str = "constant", total_steps: int | None = None,
          grad_clip: float = 0.0, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam/AdamW with an optional warmup or warmup+cosine schedule.

    schedule: "constant" (reference) or "cosine" (decay to 0 over
    total_steps, after warmup_steps of linear warmup). warmup_steps > 0
    with "constant" gives linear warmup to lr, then flat.

    grad_clip > 0 clips the gradient to that global L2 norm before the
    Adam moments see it. Clipping is NOT scale-invariant, so it relies on
    the DP steps producing the true (pmean-corrected) global-loss
    gradient — the same property weight decay needs. Two-group optimizers
    (finetune/lora make_optimizer) hoist the clip OUTSIDE their
    multi_transform so the norm is over the WHOLE tree, not per group;
    they pass grad_clip=0.0 down here to avoid double clipping.
    """
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule needs total_steps "
                             "(the optimizer-step horizon)")
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=total_steps)
    elif schedule == "constant":
        if warmup_steps:
            sched = optax.schedules.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps),
                 optax.constant_schedule(lr)], [warmup_steps])
        else:
            sched = lr
    else:
        raise ValueError(f"unknown lr schedule {schedule!r}")
    if weight_decay:
        base = optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    else:
        base = optax.adam(sched, b1=b1, b2=b2, eps=eps)
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(grad_clip), base)
    return base


def from_config(cfg, lr: float | None = None, *,
                grad_clip: float | None = None
                ) -> optax.GradientTransformation:
    """Optimizer from EngineConfig knobs (lr override for param groups).

    grad_clip=None reads cfg.grad_clip; two-group callers pass 0.0 and
    hoist a whole-tree clip around their multi_transform instead."""
    if grad_clip is None:
        grad_clip = getattr(cfg, "grad_clip", 0.0)
    return build(lr if lr is not None else cfg.learning_rate,
                 weight_decay=cfg.weight_decay,
                 warmup_steps=cfg.warmup_steps,
                 schedule=cfg.lr_schedule,
                 total_steps=cfg.total_steps,
                 grad_clip=grad_clip)
