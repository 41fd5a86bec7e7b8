"""Epoch-level training loop with the reference's run-artifact contract.

Per epoch (main.py:62-87): train (gradcache or plain) -> validate -> append
``Epoch,Train Loss,Validation Loss`` CSV row -> checkpoint on val improvement
-> optional per-epoch figures. Final: test eval + loss-curve figure.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path
from typing import Any, Callable

import jax

from . import checkpoint as ckpt
from . import clip_engine, optimizer as opt_mod
from ..data.tokenizer import EsmTokenizer


def _save_state(state_dir: Path, epoch: int, state: Any) -> None:
    """Orbax snapshot at run_dir/state/epoch_<n>; keeps only the latest."""
    path = state_dir / f"epoch_{epoch}"
    ckpt.save_orbax(path, state)
    for old in sorted(state_dir.glob("epoch_*")):
        if old != path:
            import shutil
            shutil.rmtree(old, ignore_errors=True)


def _restore_latest_state(state_dir: Path, like_partial: dict):
    """Restore the newest epoch snapshot, or None if absent."""
    if not state_dir.exists():
        return None
    snaps = sorted(state_dir.glob("epoch_*"),
                   key=lambda p: int(p.name.split("_")[1]))
    if not snaps:
        return None
    epoch = int(snaps[-1].name.split("_")[1])
    like = dict(like_partial)
    like["best_val"] = jax.numpy.asarray(0.0)
    like["train_losses"] = jax.numpy.zeros((epoch,))
    like["val_losses"] = jax.numpy.zeros((epoch,))
    state = ckpt.restore_orbax(snaps[-1], like)
    return state, epoch


@dataclasses.dataclass
class FitResult:
    train_losses: list[float]
    val_losses: list[float]
    best_val_loss: float
    best_params: Any
    params: Any
    test_loss: float | None = None


def fit(
    run_dir: str | Path,
    cfg: clip_engine.EngineConfig,
    params: Any,
    esm_params: Any,
    train_loader,
    val_loader,
    tokenizer: EsmTokenizer,
    num_epochs: int,
    *,
    rng: jax.Array,
    use_gradcache: bool = True,
    test_loader=None,
    epoch_hook: Callable[[int, Any], None] | None = None,
    log: Callable[[str], None] = print,
    engine=None,
    resume: bool = False,
    save_state_every: int = 1,
) -> FitResult:
    """engine: module exposing make_train_step/make_eval_step with the
    clip_engine signatures (clip_engine default; filip_engine for FILIP).

    resume: restore the latest Orbax train state from run_dir/state and
    continue (the reference can only save, not resume — SURVEY.md §5).
    """
    engine = engine or clip_engine
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    # engines may own their optimizer (finetune: two-group LR); default
    # honors the EngineConfig trainer knobs, which default to the
    # reference's plain Adam (main.py:45)
    optimizer = (engine.make_optimizer(cfg)
                 if hasattr(engine, "make_optimizer")
                 else opt_mod.from_config(cfg))
    opt_state = optimizer.init(params)
    train_step = engine.make_train_step(cfg, optimizer)
    eval_step = engine.make_eval_step(cfg)
    # mesh engines (parallel/engine.py) own their wire format: the packed
    # DP path deals pairs to shards on the host, and leaves are placed
    # with their mesh shardings before the step sees them
    prepare = (engine.make_prepare(cfg, tokenizer)
               if hasattr(engine, "make_prepare") else None)
    # engines whose step-time params layout differs from the canonical
    # checkpoint/eval layout (PP finetune: staged (S, L/S, ...) masters)
    # expose export_view; exports, epoch hooks and the returned result get
    # the canonical view, resume snapshots keep the raw step layout
    export = getattr(engine, "export_view", lambda p: p)

    losses_path = run_dir / "losses_per_epoch.txt"
    metrics_path = run_dir / "metrics.jsonl"
    model_path = run_dir / "best_model.npz"
    state_dir = run_dir / "state"
    log(f"Best model will be saved to {model_path}")
    log(f"Losses will be saved to {losses_path}")

    train_losses: list[float] = []
    val_losses: list[float] = []
    best_val = float("inf")
    best_params = params
    start_epoch = 0

    if resume:
        restored = _restore_latest_state(
            state_dir, {"params": params, "opt_state": opt_state,
                        "best_params": best_params})
        if restored is not None:
            state, start_epoch = restored
            params = state["params"]
            opt_state = state["opt_state"]
            best_params = state["best_params"]
            best_val = float(state["best_val"])
            train_losses = list(state["train_losses"])
            val_losses = list(state["val_losses"])
            log(f"Resumed from epoch {start_epoch}")

    # Multi-controller: every process runs the SPMD epoch loop, but run
    # artifacts (CSV/ckpt/metrics/figures via epoch_hook) write on process 0
    # only — secondaries would otherwise write duplicates into their own
    # timestamped run dirs (parallel/distributed.is_primary()).
    primary = jax.process_index() == 0
    mode = "a" if (resume and start_epoch > 0) else "w"
    with open(losses_path if primary else os.devnull, mode) as f:
        if mode == "w" and primary:
            f.write("Epoch,Train Loss,Validation Loss\n")
        for epoch in range(start_epoch, num_epochs):
            t0 = time.perf_counter()
            # Resume stability: device keys are fold_in(root, epoch) and the
            # host-side loader RNGs (shuffle + cluster-member sampling) are
            # reseeded per epoch, so a resumed run replays the exact stream
            # of an uninterrupted one (the reference cannot resume at all).
            erng = jax.random.fold_in(rng, epoch)
            for loader in (train_loader, val_loader):
                if hasattr(loader, "reseed_epoch"):
                    loader.reseed_epoch(epoch)
            if use_gradcache:
                params, opt_state, train_loss = clip_engine.train_gc(
                    params, opt_state, esm_params, train_loader, tokenizer,
                    train_step, cfg, erng, prepare=prepare)
            else:
                params, opt_state, train_loss = clip_engine.train_plain(
                    params, opt_state, esm_params, train_loader, tokenizer,
                    train_step, erng, cfg, prepare=prepare)
            val_loss = clip_engine.evaluate(params, esm_params, val_loader,
                                            tokenizer, eval_step, cfg,
                                            prepare=prepare)
            train_losses.append(train_loss)
            val_losses.append(val_loss)
            f.write(f"{epoch + 1},{train_loss:.4f},{val_loss:.4f}\n")
            f.flush()

            if val_loss < best_val:
                best_val = val_loss
                best_params = params
                if primary:
                    ckpt.export_npz(model_path, export(best_params))

            dt = time.perf_counter() - t0
            if primary:
                with open(metrics_path, "a") as mf:
                    mf.write(json.dumps({
                        "epoch": epoch + 1, "train_loss": train_loss,
                        "val_loss": val_loss, "seconds": dt,
                    }) + "\n")
            log(f"Epoch {epoch + 1}/{num_epochs} - Train Loss: "
                f"{train_loss:.4f}, Val Loss: {val_loss:.4f} ({dt:.1f}s)")
            if (epoch + 1) % save_state_every == 0 and primary:
                _save_state(state_dir, epoch + 1, {
                    "params": params, "opt_state": opt_state,
                    "best_params": best_params,
                    "best_val": jax.numpy.asarray(best_val),
                    "train_losses": jax.numpy.asarray(train_losses),
                    "val_losses": jax.numpy.asarray(val_losses),
                })
            if epoch_hook is not None and primary:
                epoch_hook(epoch, export(best_params))

    test_loss = None
    if test_loader is not None:
        test_loss = clip_engine.evaluate(best_params, esm_params, test_loader,
                                         tokenizer, eval_step, cfg,
                                         prepare=prepare)
        log(f"Test Loss: {test_loss:.4f}")

    return FitResult(train_losses, val_losses, best_val,
                     export(best_params), export(params), test_loss)
