"""MLM training entry — the masked-token objective over the shared ESM-2
stack (README "Masked Language Model" section + MLM_Testing.ipynb, N1).

Trains the tied-decoder LM head (and optionally unfreezes the backbone) with
token-level masking at --mask-prob, same run-artifact contract as the other
entries.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import optax

from . import common
from ..data.dataset import PairLoader, generate_datasets
from ..models import esm2, mlm
from ..train import checkpoint as ckpt
from ..train import optimizer as opt_mod
from ..utils import prng, rundir


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--mask-prob", type=float, default=0.15)
    p.add_argument("--prefix-a", default="peptide")
    p.add_argument("--prefix-b", default="receptor")
    p.add_argument("--side", default="b", choices=["a", "b", "both"],
                   help="which side's sequences to train on")
    # --packed comes from common.add_common_args: here it packs the single
    # training side into fixed-width rows (~95% token fill) with
    # segment-masked attention, per-segment RoPE AND per-segment
    # token-dropout mask ratios, so the loss equals the unpacked one
    # exactly (tests/test_mlm.py).
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices (parallel/mlm_step.py): "
                        "batch shards over the 'data' mesh axis, loss and "
                        "grads reduce over ICI; composes with --packed "
                        "(rows dealt per shard) and with "
                        "--finetune/--lora-rank (trainable grads pmean'd)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel devices: backbone weights carry "
                        "Megatron splits over the GSPMD 'model' axis "
                        "(parallel/sharding.esm_param_specs) — per-token "
                        "CE shards transparently; composes with --dp and "
                        "with --finetune (f32 masters sharded too)")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    rng = prng.set_seed(args.seed)
    run_dir = rundir.make_run_dir(args.runs_dir)
    print(f"All run info will be saved to {run_dir}")

    esm_cfg = common.esm_config(args.esm_config, args.esm_dtype,
                                fast_gelu=args.fast_gelu,
                                exact_gelu=args.exact_gelu)
    if args.tp > 1 and esm_cfg.attention_impl == "fused":
        # GSPMD can't partition the Pallas custom call over the auto
        # 'model' axis (same rule as parallel/step.tp_safe_model_config)
        import dataclasses
        esm_cfg = dataclasses.replace(esm_cfg, attention_impl="eager")
    esm_params = common.load_esm(args, esm_cfg)
    mesh = None
    if args.dp > 1 or args.tp > 1:
        from ..parallel import mesh as mesh_mod
        mesh = mesh_mod.make_mesh(data=args.dp, model=args.tp)
        if args.tp > 1:
            # Megatron splits over the GSPMD auto axis; the shard_map steps
            # keep in_specs P() for params, so placement IS the partitioning
            from ..parallel import sharding as shard_mod
            esm_params = shard_mod.shard_params(
                mesh, esm_params, shard_mod.esm_param_specs(esm_params))
    tokenizer = common.make_tokenizer()
    rng, hk = jax.random.split(rng)
    lm_head = esm2.init_lm_head(hk, esm_cfg)

    data_dir = common.ensure_data(args, args.prefix_a, args.prefix_b)
    train_ds, val_ds, _ = generate_datasets(
        data_dir, args.prefix_a, args.prefix_b, seed=args.seed)
    train_loader = PairLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    val_loader = PairLoader(val_ds, args.batch_size, shuffle=False,
                            drop_last=True, seed=args.seed)

    finetuning = getattr(args, "finetune", False)
    lora_rank = getattr(args, "lora_rank", 0)
    if finetuning and lora_rank:
        raise SystemExit("--finetune and --lora-rank are mutually exclusive")

    def _masked_loss(esm_p, head, arrs, key, remat=False):
        """Masked CE over one batch — plain (ids, mask) or packed (ids8,)
        wire (train/packed_engine.tokenize_packed_rows; segments, positions
        and the per-segment token-dropout ratios derive on device)."""
        if args.packed:
            from ..train.packed_engine import derive_segments
            ids, seg, pos = derive_segments(arrs[0])
            mask = (seg > 0).astype(jnp.int32)
            masked, labels = mlm.mask_tokens(key, ids, mask, args.mask_prob)
            return mlm.mlm_loss(esm_p, head, masked, mask, labels, esm_cfg,
                                remat=remat, segment_ids=seg, positions=pos)
        ids, mask = arrs
        masked, labels = mlm.mask_tokens(key, ids, mask, args.mask_prob)
        return mlm.mlm_loss(esm_p, head, masked, mask, labels, esm_cfg,
                            remat=remat)

    total = len(train_loader) * args.epochs
    optimizer = opt_mod.build(args.lr, weight_decay=args.weight_decay,
                              warmup_steps=args.warmup_steps,
                              schedule=args.lr_schedule, total_steps=total)

    def _clipped(opt):
        # whole-tree global-norm clip, applied OUTSIDE the two-group
        # multi_transform in the finetune/LoRA branch (same hoisting as
        # train/finetune.make_optimizer)
        gc = getattr(args, "grad_clip", 0.0)
        return (optax.chain(optax.clip_by_global_norm(gc), opt)
                if gc else opt)

    if finetuning or lora_rank:
        # continued pretraining: the masked-CE gradient reaches the
        # backbone — full (f32 masters, in-step cast) or via LoRA
        # adapters over the frozen base. Per-token CE has no cross-batch
        # coupling, so plain value_and_grad + remat suffices (no
        # gradcache needed at MLM batch sizes).
        bb_lr = getattr(args, "backbone_lr", None) or (
            1e-4 if lora_rank else 1e-5)
        backbone_opt = opt_mod.build(
            bb_lr, weight_decay=args.weight_decay,
            warmup_steps=args.warmup_steps, schedule=args.lr_schedule,
            total_steps=total)
        if finetuning:
            from ..train.finetune import _cast_esm, init_params as _fp
            trainable = {"esm": _fp(esm_params, {})["esm"], "head": lm_head}
            esm_view = lambda t, _e: _cast_esm(t["esm"],
                                               esm_cfg.compute_dtype)
        else:
            from ..train import lora as lora_mod
            rng, lrng = jax.random.split(rng)
            targets = lora_mod.ATTN_TARGETS + (
                lora_mod.FFN_TARGETS if getattr(args, "lora_ffn", False)
                else ())
            alpha = lora_mod.default_alpha(lora_rank)
            trainable = {
                "lora": lora_mod.init_lora(lrng, esm_params, lora_rank,
                                           targets),
                "head": lm_head}
            esm_view = lambda t, e: lora_mod.merge_lora(e, t["lora"], alpha)
        group = "esm" if finetuning else "lora"
        optimizer = _clipped(optax.multi_transform(
            {group: backbone_opt, "head": optimizer},
            lambda t: jax.tree.map_with_path(
                lambda path, _: str(getattr(path[0], "key", "head")), t)))
        if mesh is not None and args.tp > 1 and finetuning:
            # f32 masters carry the same Megatron splits as the frozen
            # base; optimizer.init below inherits them into the moments
            from ..parallel import sharding as shard_mod
            trainable["esm"] = shard_mod.shard_params(
                mesh, trainable["esm"],
                shard_mod.esm_param_specs(trainable["esm"]))
        opt_state = optimizer.init(trainable)

        if mesh is not None:
            # continued pretraining over the data mesh: psum'd global-mean
            # CE, pmean'd trainable grads; plain or packed wire
            # (parallel/mlm_step.make_sharded_mlm_finetune_step)
            from ..parallel.mlm_step import (
                make_sharded_mlm_finetune_eval_step,
                make_sharded_mlm_finetune_step)
            _ts = make_sharded_mlm_finetune_step(
                esm_cfg, optimizer, mesh, args.mask_prob, esm_view,
                packed=args.packed)
            _es = make_sharded_mlm_finetune_eval_step(
                esm_cfg, mesh, args.mask_prob, esm_view,
                packed=args.packed)
            train_step = lambda t, o, e, arrs, k: _ts(t, o, e, *arrs, k)
            eval_step = lambda t, e, arrs, k: _es(t, e, *arrs, k)
        else:
            @jax.jit
            def train_step(trainable, opt_state, esm_p, arrs, key):
                def loss_of(t):
                    return _masked_loss(esm_view(t, esm_p), t["head"],
                                        arrs, key, remat=True)

                loss, grads = jax.value_and_grad(loss_of)(trainable)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      trainable)
                return (optax.apply_updates(trainable, updates), opt_state,
                        loss)

            @jax.jit
            def eval_step(trainable, esm_p, arrs, key):
                return _masked_loss(esm_view(trainable, esm_p),
                                    trainable["head"], arrs, key)

        lm_head = trainable
    elif mesh is not None:
        from ..parallel import mlm_step as dp_mod
        optimizer = _clipped(optimizer)
        opt_state = optimizer.init(lm_head)
        if args.packed:
            # packed rows dealt over 'data' (tokenize_packed_rows_sharded);
            # same psum'd (sum, count) global mean as the plain DP step
            _ts = dp_mod.make_sharded_packed_mlm_train_step(
                esm_cfg, optimizer, mesh, args.mask_prob)
            _es = dp_mod.make_sharded_packed_mlm_eval_step(
                esm_cfg, mesh, args.mask_prob)
        else:
            _ts = dp_mod.make_sharded_mlm_train_step(esm_cfg, optimizer,
                                                     mesh, args.mask_prob)
            _es = dp_mod.make_sharded_mlm_eval_step(esm_cfg, mesh,
                                                    args.mask_prob)
        train_step = lambda h, o, e, arrs, k: _ts(h, o, e, *arrs, k)
        eval_step = lambda h, e, arrs, k: _es(h, e, *arrs, k)
    else:
        optimizer = _clipped(optimizer)
        opt_state = optimizer.init(lm_head)
        @jax.jit
        def train_step(lm_head, opt_state, esm_p, arrs, key):
            loss, grads = jax.value_and_grad(
                lambda h: _masked_loss(esm_p, h, arrs, key))(lm_head)
            updates, opt_state = optimizer.update(grads, opt_state, lm_head)
            return optax.apply_updates(lm_head, updates), opt_state, loss

        @jax.jit
        def eval_step(lm_head, esm_p, arrs, key):
            return _masked_loss(esm_p, lm_head, arrs, key)

    def seqs_of(batch):
        a, b = batch
        return {"a": a, "b": b, "both": list(a) + list(b)}[args.side]

    def arrs_of(batch):
        seqs = seqs_of(batch)
        if args.packed:
            from ..train.packed_engine import (tokenize_packed_rows,
                                               tokenize_packed_rows_sharded)
            if args.dp > 1:
                return (tokenize_packed_rows_sharded(tokenizer, seqs,
                                                     args.dp),)
            return (tokenize_packed_rows(tokenizer, seqs),)
        enc = tokenizer(seqs)
        return (jnp.asarray(enc["input_ids"]),
                jnp.asarray(enc["attention_mask"]))

    losses_path = run_dir / "losses_per_epoch.txt"
    best_val = float("inf")
    with open(losses_path, "w") as f:
        f.write("Epoch,Train Loss,Validation Loss\n")
        for epoch in range(args.epochs):
            t0 = time.perf_counter()
            tl, tn = 0.0, 0
            for batch in train_loader:
                rng, sk = jax.random.split(rng)
                lm_head, opt_state, loss = train_step(
                    lm_head, opt_state, esm_params, arrs_of(batch), sk)
                tl += float(loss); tn += 1
            vl, vn = 0.0, 0
            for batch in val_loader:
                rng, sk = jax.random.split(rng)
                vl += float(eval_step(lm_head, esm_params, arrs_of(batch),
                                      sk))
                vn += 1
            tl /= max(tn, 1)
            vl = vl / vn if vn else float("nan")
            f.write(f"{epoch + 1},{tl:.4f},{vl:.4f}\n")
            f.flush()
            if vl < best_val:
                best_val = vl
                ckpt.export_npz(run_dir / "best_model.npz", lm_head)
            print(f"Epoch {epoch + 1}/{args.epochs} - Train Loss: {tl:.4f}, "
                  f"Val Loss: {vl:.4f} ({time.perf_counter() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
