"""FILIP training entry (reference main_2protein_filip.py).

Token-level late-interaction model on the protein-protein data: batch 10,
10 epochs, no GradCache (main_2protein_filip.py:33,44,63). On TPU the fused
max-sim kernel removes the reference's B2T2 memory wall, so --batch-size can
go well past 10.
"""

from __future__ import annotations

import argparse

import numpy as np
import jax

from . import common
from ..data.dataset import PairLoader, generate_datasets
from ..models import filip
from ..train import clip_engine, filip_engine, loop
from ..utils import prng, rundir
from ..viz import plots


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    common.add_mesh_args(p)
    p.set_defaults(batch_size=10)                 # main_2protein_filip.py:33
    # At the reference's bs 10 neither backbone chunking nor length groups
    # pay off; when scaling --batch-size into the hundreds, raise both
    # (e.g. --batch-size 128 --num-chunks 8 --length-groups 4).
    p.set_defaults(num_chunks=1, length_groups=1)
    # scatter-tiers measured faster at every packed FILIP batch size
    # (128: 367 vs 359; 256: 349 vs 318 pairs/s — docs/PERF.md)
    p.set_defaults(scatter_tiers=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--max-sequence-length", type=int, default=2000)
    p.add_argument("--use-dcl", action="store_true",
                   help="diagonal-masked denominator "
                        "(training_utils_filip.py:4-23; off in reference)")
    p.add_argument("--epoch-figures", action="store_true")
    return p


def filip_similarity_viz(params, esm_params, mcfg, tokenizer):
    """(peps, recs) -> averaged two-direction similarity matrix
    (visualizations.py:54-105)."""

    def compute(peps, recs):
        batch = clip_engine.expand_batch(
            clip_engine.tokenize_pair_batch(tokenizer, peps, recs))
        sim_a, sim_b = filip.forward(params, esm_params, batch, mcfg,
                                     train=False)
        return np.asarray((sim_a + sim_b) / 2.0)

    return compute


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    common.maybe_init_distributed(args)
    finetuning = getattr(args, "finetune", False)
    lora_rank = getattr(args, "lora_rank", 0)
    if finetuning and lora_rank:
        raise SystemExit("--finetune and --lora-rank are mutually "
                         "exclusive (full vs parameter-efficient)")
    if (finetuning or lora_rank) and args.length_groups > 1:
        raise SystemExit("FILIP --finetune/--lora-rank train on plain or "
                         "--packed batches (drop --length-groups)")
    if (finetuning or lora_rank) and args.packed and args.pack_tiers > 1:
        raise SystemExit("packed FILIP --finetune/--lora-rank supports flat "
                         "packing only (drop --pack-tiers; --scatter-tiers "
                         "compose)")
    from pathlib import Path
    rng = prng.set_seed(args.seed)
    resume = args.resume_dir is not None
    run_dir = Path(args.resume_dir) if resume else rundir.make_run_dir(
        args.runs_dir)
    print(f"All run info will be saved to {run_dir}")

    esm_cfg = common.esm_config(args.esm_config, args.esm_dtype,
                                fast_gelu=args.fast_gelu,
                                exact_gelu=args.exact_gelu)
    esm_params = common.load_esm(args, esm_cfg)
    tokenizer = common.make_tokenizer()

    mcfg = filip.FILIPConfig(
        input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
        h1=args.h1, h2=args.h2, dropout=args.dropout, esm=esm_cfg)
    rng, krng = jax.random.split(rng)
    params = filip.init_params(krng, mcfg)

    if finetuning:
        from ..train import filip_finetune
        params = filip_finetune.init_params(esm_params, params)
        esm_params = {}
    elif lora_rank:
        from ..train import lora as lora_mod
        rng, lrng = jax.random.split(rng)
        targets = lora_mod.ATTN_TARGETS + (
            lora_mod.FFN_TARGETS if getattr(args, "lora_ffn", False) else ())
        params = lora_mod.init_params(
            lora_mod.init_lora(lrng, esm_params, lora_rank, targets), params)
        # esm_params stays: the frozen base the adapters merge into

    def _eval_view(p):
        """(head_params, backbone_params) for the viz hooks, either
        engine's pytree (the f32 master backbone casts to the compute
        dtype, matching load_esm's contract; LoRA merges adapters into
        the frozen base)."""
        if finetuning:
            from ..models import esm2
            return p["heads"], esm2.cast_params(p["esm"],
                                                mcfg.esm.compute_dtype)
        if lora_rank:
            from ..train import lora as lora_mod
            return p["heads"], lora_mod.merge_lora(
                esm_params, p["lora"], lora_mod.default_alpha(lora_rank))
        return p, esm_params

    data_dir = common.ensure_data(args, "protein1", "protein2")
    train_ds, val_ds, test_ds = generate_datasets(
        data_dir, "protein1", "protein2", seed=args.seed,
        max_sequence_length=args.max_sequence_length)
    train_loader = PairLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    val_loader = PairLoader(val_ds, args.batch_size, shuffle=False,
                            drop_last=True, seed=args.seed)
    test_loader = PairLoader(test_ds, args.batch_size, shuffle=False,
                             drop_last=True, seed=args.seed)

    plots.plot_clustering(run_dir, data_dir, prefix="protein2")
    plots.plot_protein_lengths(run_dir, data_dir)
    plots.plot_embedding_cosine_similarities(
        run_dir, "Raw Embedding Cosine Similarities", train_loader, tokenizer,
        filip_similarity_viz(*_eval_view(params), mcfg, tokenizer))

    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=args.batch_size, accumulated_batches=1,
        learning_rate=args.lr, num_chunks=args.num_chunks,
        length_groups=args.length_groups, packed=args.packed,
        packed_tiers=getattr(args, "pack_tiers", 1),
        scatter_tiers=getattr(args, "scatter_tiers", 1),
        filip_use_dcl=args.use_dcl,
        backbone_lr=getattr(args, "backbone_lr", None),
        weight_decay=args.weight_decay, warmup_steps=args.warmup_steps,
        lr_schedule=args.lr_schedule, grad_clip=args.grad_clip,
        total_steps=args.epochs * len(train_loader))

    def epoch_hook(epoch, best_params):
        if not args.epoch_figures:
            return
        for name, ldr in (("Train", train_loader), ("Val", val_loader)):
            plots.plot_embedding_cosine_similarities(
                run_dir,
                f"Trained Embedding Cosine Similarities on {name} Set "
                f"- Epoch {epoch + 1}",
                ldr, tokenizer,
                filip_similarity_viz(*_eval_view(best_params), mcfg,
                                     tokenizer))

    dp, tp, pp = common.resolve_mesh_shape(args)
    mesh_engine = None
    if dp * tp * pp > 1:
        if args.batch_size % dp:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"--dp {dp} (batches shard over the data axis; the "
                f"reference default 10 wants e.g. --batch-size 16)")
        if args.packed and args.pack_tiers > 1:
            raise SystemExit("mesh --packed training supports flat packing "
                             "only (drop --pack-tiers)")
        if args.packed and cfg.scatter_tiers > 1:
            # the sharded packed FILIP step assembles flat (B_local, L, D)
            # token buffers; scatter tiers are a single-chip perf knob
            import dataclasses
            print("[mesh] --scatter-tiers ignored under a mesh "
                  "(flat token buffers per shard)")
            cfg = dataclasses.replace(cfg, scatter_tiers=1)
        if cfg.length_groups > 1:
            import dataclasses
            print("[mesh] --length-groups ignored under a mesh "
                  "(use --packed for padding-waste cuts)")
            cfg = dataclasses.replace(cfg, length_groups=1)
        from ..parallel.engine import make_mesh_engine
        mode = ("finetune" if finetuning
                else "lora" if lora_rank else "frozen")
        try:
            mesh_engine = make_mesh_engine(
                data=dp, model=tp, stages=pp, arch="filip", mode=mode,
                packed=cfg.packed)
        except ValueError as e:
            raise SystemExit(str(e))
        print(f"[mesh] FILIP training over {dict(mesh_engine.mesh.shape)} "
              f"(token-level negatives span batch {cfg.batch_size})")

    engine = mesh_engine or filip_engine
    if mesh_engine is None:
        if finetuning:
            from ..train import filip_finetune as engine
        elif lora_rank:
            from ..train import filip_lora as engine
    step_esm = (mesh_engine.prepare_esm(esm_params) if mesh_engine
                else esm_params)
    result = loop.fit(
        run_dir, cfg, params, step_esm, train_loader, val_loader, tokenizer,
        args.epochs, rng=rng, use_gradcache=False, test_loader=test_loader,
        epoch_hook=epoch_hook, engine=engine, resume=resume)

    plots.plot_loss_curves(run_dir, result.train_losses, result.val_losses,
                           args.batch_size, args.batch_size)
    for name, ldr in (("Train", train_loader), ("Val", val_loader)):
        plots.plot_embedding_cosine_similarities(
            run_dir, f"Trained Embedding Cosine Similarities on {name} Set",
            ldr, tokenizer,
            filip_similarity_viz(*_eval_view(result.best_params), mcfg,
                                 tokenizer))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
