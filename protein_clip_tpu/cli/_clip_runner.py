"""Shared CLIP training runner behind main.py / main_2protein.py."""

from __future__ import annotations

import numpy as np
import jax

from . import common
from ..data.dataset import PairLoader, generate_datasets
from ..models import clip, esm2
from ..train import clip_engine, loop
from ..utils import prng, rundir
from ..viz import plots


def similarity_fn(params, esm_params, mcfg, tokenizer):
    """(peps, recs) -> raw cosine matrix for the viz hooks
    (visualizations.py:38-52 de-scaling)."""

    def compute(peps, recs):
        batch = clip_engine.expand_batch(
            clip_engine.tokenize_pair_batch(tokenizer, peps, recs))
        pep, rec = clip.forward(params, esm_params, batch, mcfg, train=False)
        return np.asarray(clip.cosine_similarity_matrix(
            pep, rec, params["temperature"]))

    return compute


def run_clip_training(args, *, prefix_a: str, prefix_b: str,
                      plot_cluster: bool = False,
                      max_sequence_length: int | None = None) -> int:
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

    mcfg = clip.CLIPConfig(
        input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
        h1=args.h1, h2=args.h2, dropout=args.dropout,
        activation=args.activation, esm=esm_cfg)
    rng, krng = jax.random.split(rng)
    params = clip.init_params(krng, mcfg)

    finetuning = getattr(args, "finetune", False)
    lora_rank = getattr(args, "lora_rank", 0)
    if finetuning and lora_rank:
        raise SystemExit("--finetune and --lora-rank are mutually "
                         "exclusive (full vs parameter-efficient)")
    if (finetuning or lora_rank) and args.packed \
            and getattr(args, "pack_tiers", 1) > 1:
        raise SystemExit("--finetune/--lora-rank with --packed support "
                         "flat packing only (drop --pack-tiers)")
    if finetuning:
        from ..train import finetune
        # backbone joins the trainable params (f32 master copy); the
        # esm_params slot every engine step carries is ignored by the
        # finetune engine
        params = finetune.init_params(esm_params, params)
        esm_params = {}
    elif lora_rank:
        from ..train import lora as lora_mod
        rng, lrng = jax.random.split(rng)
        targets = lora_mod.ATTN_TARGETS + (
            lora_mod.FFN_TARGETS if getattr(args, "lora_ffn", False) else ())
        params = lora_mod.init_params(
            lora_mod.init_lora(lrng, esm_params, lora_rank, targets),
            params)
        # esm_params stays: the frozen base the adapters merge into

    def _eval_view(p):
        """(head_params, backbone_params) for viz/eval hooks, either
        engine's params pytree. The finetune master backbone is f32;
        eval consumers expect compute-dtype leaves (a bf16-config layer
        scan fed f32 params flips the carry dtype mid-scan). LoRA views
        merge the adapters into the frozen base."""
        if finetuning:
            return p["heads"], esm2.cast_params(p["esm"],
                                                mcfg.esm.compute_dtype)
        if lora_rank:
            from ..train import lora as lora_mod
            return p["heads"], lora_mod.merge_lora(
                esm_params, p["lora"], lora_mod.default_alpha(lora_rank))
        return p, esm_params

    data_dir = common.ensure_data(args, prefix_a, prefix_b)
    train_ds, val_ds, test_ds = generate_datasets(
        data_dir, prefix_a, prefix_b, seed=args.seed,
        max_sequence_length=max_sequence_length)
    train_loader = PairLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    val_loader = PairLoader(val_ds, args.batch_size, shuffle=False,
                            drop_last=True, seed=args.seed)
    test_loader = PairLoader(test_ds, args.batch_size, shuffle=False,
                             drop_last=True, seed=args.seed)

    if plot_cluster:
        plots.plot_clustering(run_dir, data_dir, prefix=prefix_b)
    plots.plot_protein_lengths(run_dir, data_dir,
                               prefix1=prefix_a, prefix2=prefix_b)
    plots.plot_embedding_cosine_similarities(
        run_dir, "Raw Embedding Cosine Similarities", train_loader, tokenizer,
        similarity_fn(*_eval_view(params), mcfg, tokenizer))

    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=args.batch_size,
        accumulated_batches=args.accumulated_batches,
        learning_rate=args.lr, num_chunks=args.num_chunks,
        length_groups=(args.length_groups
                       if not (args.no_gradcache or finetuning or lora_rank)
                       else 1),
        packed=args.packed and not args.no_gradcache,
        packed_tiers=getattr(args, "pack_tiers", 1),
        backbone_lr=getattr(args, "backbone_lr", None),
        weight_decay=args.weight_decay, warmup_steps=args.warmup_steps,
        lr_schedule=args.lr_schedule, grad_clip=args.grad_clip,
        # optimizer-step horizon for the cosine schedule: steps/epoch is
        # the loader length over the accumulation factor (train_gc drops
        # the trailing partial global batch, matching the reference gate)
        total_steps=args.epochs * (
            len(train_loader) if args.no_gradcache
            else len(train_loader) // args.accumulated_batches))

    def epoch_hook(epoch, best_params):
        if not args.epoch_figures:
            return
        for name, ldr in (("Train", train_loader), ("Val", val_loader)):
            plots.plot_embedding_cosine_similarities(
                run_dir,
                f"Trained Embedding Cosine Similarities on {name} Set "
                f"- Epoch {epoch + 1}",
                ldr, tokenizer,
                similarity_fn(*_eval_view(best_params), mcfg, tokenizer))

    dp, tp, pp = common.resolve_mesh_shape(args)
    mesh_engine = None
    if dp * tp * pp > 1:
        if args.no_gradcache:
            raise SystemExit(
                "mesh training (--dp/--tp/--pp) drives the global-batch "
                "gradcache path (drop --no-gradcache)")
        if args.batch_size % dp:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"--dp {dp} (val/test batches shard over the data axis)")
        if args.packed and getattr(args, "pack_tiers", 1) > 1:
            raise SystemExit("mesh --packed training supports flat packing "
                             "only (drop --pack-tiers)")
        if cfg.length_groups > 1:
            # the sharded steps take single-bucket or --packed batches;
            # grouping already offers less than packing everywhere
            import dataclasses
            print("[mesh] --length-groups ignored under a mesh "
                  "(use --packed for padding-waste cuts)")
            cfg = dataclasses.replace(cfg, length_groups=1)
        from ..parallel.engine import make_mesh_engine
        mode = ("finetune" if finetuning
                else "lora" if lora_rank else "frozen")
        try:
            mesh_engine = make_mesh_engine(
                data=dp, model=tp, stages=pp, arch="clip", mode=mode,
                packed=cfg.packed,
                num_microbatches=getattr(args, "pp_microbatches", None))
        except ValueError as e:
            raise SystemExit(str(e))
        print(f"[mesh] training over {dict(mesh_engine.mesh.shape)} "
              f"(negatives span the global batch {cfg.global_batch})")

    engine = mesh_engine
    if engine is None:
        if finetuning:
            from ..train import finetune as engine
        elif lora_rank:
            from ..train import lora as engine
    # PP/TP re-place the frozen backbone for stepping (staged layer layout /
    # Megatron splits); viz + eval views keep the original esm_params
    step_esm = (mesh_engine.prepare_esm(esm_params) if mesh_engine
                else esm_params)
    if mesh_engine is not None:
        params = mesh_engine.prepare_params(params)
    result = loop.fit(
        run_dir, cfg, params, step_esm, train_loader, val_loader, tokenizer,
        args.epochs, rng=rng, use_gradcache=not args.no_gradcache,
        test_loader=test_loader, epoch_hook=epoch_hook, resume=resume,
        engine=engine)

    train_bs = (args.batch_size * args.accumulated_batches
                if not args.no_gradcache else args.batch_size)
    plots.plot_loss_curves(run_dir, result.train_losses, result.val_losses,
                           train_bs, args.batch_size)
    for name, ldr in (("Train", train_loader), ("Val", val_loader)):
        plots.plot_embedding_cosine_similarities(
            run_dir, f"Trained Embedding Cosine Similarities on {name} Set",
            ldr, tokenizer,
            similarity_fn(*_eval_view(result.best_params), mcfg, tokenizer))
    return 0
