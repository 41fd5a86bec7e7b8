"""Shared CLI wiring for the entry points (reference L5 scripts).

The reference hard-codes every hyperparameter inside each main()
(main.py:26-50); here the same values are argparse defaults so each entry
runs identically with no flags but stays configurable.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

# Persistent compilation cache: TPU compiles for the 150M backbone cost
# 30-200s; cache them across runs. Host-fingerprinted dir — a cache
# written on a different CPU generation must never load here
# (utils/compcache.py has the cpu_aot_loader post-mortem).
from ..utils.compcache import enable_persistent_cache

enable_persistent_cache()

from ..data.tokenizer import EsmTokenizer
from ..models import esm2


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-dir", default="data",
                   help="directory with the paired FASTAs + cluster TSV cache")
    p.add_argument("--runs-dir", default="runs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--embedding-dim", type=int, default=128)
    p.add_argument("--h1", type=int, default=2)
    p.add_argument("--h2", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--activation", default="relu",
                   choices=["relu", "tanh", "gelu"],
                   help="head FFN activation (tanh = notebook N5 variant)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--esm-config", default="t30_150M",
                   choices=["t30_150M", "t6_8M", "t12_35M", "t33_650M",
                            "t36_3B", "t48_15B", "tiny"])
    p.add_argument("--esm-weights", default=None,
                   help="npz from tools/convert_esm_weights.py, or an HF "
                        "model dir; omit for random init (smoke runs)")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-approx FFN gelu in the backbone: +4.3% step "
                        "throughput measured at t30_150M (903 vs 866 "
                        "pairs/s), token cosine drift vs exact erf 5e-8 at "
                        "full 30-layer depth — ~2000x below bf16 compute "
                        "noise (docs/PERF.md). Default stays exact-erf for "
                        "HF parity; use this as the serving/throughput "
                        "profile when 4%% matters")
    p.add_argument("--exact-gelu", action="store_true",
                   help="force exact-erf gelu even under --esm-dtype int8 "
                        "(int8 defaults to the tanh approx: the erf "
                        "epilogue was measured to forfeit int8's MXU win — "
                        "897 vs 1040 pairs/s at t30_150M, docs/PERF.md — "
                        "and int8 rounding already dwarfs the tanh drift)")
    p.add_argument("--esm-dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "int8"],
                   help="int8 = post-training w8a8 quantised backbone "
                        "(bf16 activations/attention; ~int8-rounding "
                        "drift vs the bf16 parity path; implies tanh gelu "
                        "unless --exact-gelu)")
    p.add_argument("--synthetic-fixture", action="store_true",
                   help="generate a synthetic corpus into --data-dir when "
                        "the FASTAs are missing (no-network environments)")
    p.add_argument("--fixture-families", type=int, default=160,
                   help="synthetic corpus size; must be large enough that "
                        "the 15%% val split fills at least one batch")
    p.add_argument("--num-chunks", type=int, default=16,
                   help="backbone microbatches per global step")
    p.add_argument("--packed", action="store_true",
                   help="sequence-packed encoding (segment-masked rows; "
                        "supersedes --length-groups)")
    p.add_argument("--pack-tiers", type=int, default=1,
                   help="with --packed: >1 packs each side into width-"
                        "tiered row groups (short sequences ride narrower "
                        "rows, cutting attention cost on long-tailed "
                        "length distributions)")
    p.add_argument("--finetune", action="store_true",
                   help="UNFREEZE the ESM-2 backbone: end-to-end training "
                        "via two-pass gradcache + flash attention backward "
                        "(train/finetune.py; the reference is frozen-only). "
                        "Backbone master weights train in f32 at "
                        "--backbone-lr. CLIP entries compose with --packed "
                        "(flat rows); the FILIP entry caches token tensors "
                        "(train/filip_finetune.py, plain or --packed "
                        "batches)")
    p.add_argument("--backbone-lr", type=float, default=None,
                   help="with --finetune: backbone learning rate (heads "
                        "stay at --lr). Default None resolves per mode: "
                        "1e-5 for full finetune, 1e-4 for LoRA adapters "
                        "(zero-init adapters want a hotter rate)")
    p.add_argument("--lora-rank", type=int, default=0,
                   help="> 0: LoRA parameter-efficient finetuning "
                        "(train/lora.py) — low-rank adapters on the "
                        "attention projections, base backbone frozen; "
                        "adapter LR = --backbone-lr (default 1e-4 here). "
                        "Mutually exclusive with --finetune")
    p.add_argument("--lora-ffn", action="store_true",
                   help="with --lora-rank: also adapt the FFN wi/wo")
    p.add_argument("--weight-decay", type=float, default=0.0,
                   help="decoupled (AdamW) weight decay; 0 = the "
                        "reference's plain Adam")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear LR warmup over this many optimizer steps")
    p.add_argument("--lr-schedule", choices=["constant", "cosine"],
                   default="constant",
                   help="cosine decays to 0 over the run's optimizer-step "
                        "horizon (computed from the train loader + epochs)")
    p.add_argument("--grad-clip", type=float, default=0.0,
                   help="> 0: clip gradients to this global L2 norm "
                        "before Adam (whole-tree norm; with --finetune/"
                        "--lora-rank the clip spans backbone + heads "
                        "together). 0 = the reference's unclipped Adam")
    p.add_argument("--scatter-tiers", type=int, default=1,
                   help="FILIP with --packed: >1 scatters per-token head "
                        "outputs into per-length-tier buffers so max-sim "
                        "work tracks true lengths (backbone pack stays "
                        "flat); the FILIP entry defaults to 4")
    p.add_argument("--length-groups", type=int, default=4,
                   help="length-sorted encode groups per global batch "
                        "(1 = single pad bucket)")
    p.add_argument("--resume-dir", default=None,
                   help="existing run dir: restore latest Orbax train state "
                        "and continue (appends to its CSV)")


def add_mesh_args(p: argparse.ArgumentParser) -> None:
    """Multi-chip mesh flags for the flagship training entries.

    The defaults keep the single-device path byte-identical; on a pod,
    --dp 0 takes every chip not claimed by --tp/--pp. Losses at equal
    global batch match the single-device run exactly (the sharded steps'
    parity contract, tests/test_cli_mesh.py)."""
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis: batch shards over 'data', "
                        "embeddings all-gather over ICI so InfoNCE "
                        "negatives span the global batch "
                        "(parallel/step.py). 0 = auto: "
                        "jax.device_count() // (tp * pp). Composes with "
                        "--packed, --finetune, --lora-rank")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel axis: Megatron column/row splits "
                        "on the backbone over a GSPMD 'model' axis "
                        "(parallel/sharding.py; for t36_3B+ backbones). "
                        "Unpacked batches only; attention falls back to "
                        "the eager einsum (GSPMD cannot split the Pallas "
                        "custom call)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages: GPipe lockstep over a 'stage' "
                        "axis, each chip holding 1/pp of the backbone "
                        "layers (parallel/pipeline.py; the memory play for "
                        "t48-class backbones). Frozen unpacked CLIP only")
    p.add_argument("--pp-microbatches", type=int, default=None,
                   help="with --pp: microbatches per step (default "
                        "max(2*pp, --num-chunks); bubble fraction = "
                        "(pp-1)/(M+pp-1))")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port for "
                        "jax.distributed (Cloud TPU VMs auto-detect — just "
                        "run the same command on every host; see README "
                        "'Multi-host launch'). Requires --num-processes "
                        "and --process-id off-cloud")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def maybe_init_distributed(args) -> None:
    """Join the multi-host cluster BEFORE any other jax use (flagship CLIs
    call this first). No-op single-process; auto-detects on Cloud TPU when
    --coordinator is omitted but PCT_MULTIHOST=1 requests cluster init."""
    import os

    from ..parallel import distributed

    coord = getattr(args, "coordinator", None)
    if coord or os.environ.get("PCT_MULTIHOST") == "1":
        distributed.initialize(coord,
                               num_processes=getattr(args, "num_processes",
                                                     None),
                               process_id=getattr(args, "process_id", None))


def resolve_mesh_shape(args) -> tuple[int, int, int]:
    """(dp, tp, pp) with --dp 0 resolved to the leftover device count."""
    dp = getattr(args, "dp", 1)
    tp = getattr(args, "tp", 1)
    pp = getattr(args, "pp", 1)
    if dp == 0:
        dp = max(1, jax.device_count() // (tp * pp))
    return dp, tp, pp


def esm_config(name: str, dtype_name: str, fast_gelu: bool = False,
               exact_gelu: bool = False) -> esm2.ESM2Config:
    # int8 quantises the weights (load_esm); activations stay bf16.
    # getattr keeps this in lockstep with the ESM2Config family constructors
    # (a hand-rolled dict here once missed t48_15B -> KeyError at runtime).
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    if dtype_name == "int8" and not exact_gelu:
        # int8 is the declared non-parity speed mode, and its wi fusion is
        # erf-epilogue-bound: erf forfeits the int8 MXU win (897 vs 1040
        # pairs/s at t30_150M, docs/PERF.md). int8 rounding drift already
        # dwarfs tanh-vs-erf (5e-8 token cosine), so tanh is the right
        # default here; --exact-gelu restores erf.
        fast_gelu = True
    if exact_gelu:
        gelu = "erf"
    elif fast_gelu:
        gelu = "tanh"
    else:
        # no explicit flag: honor the PCT_GELU A/B env knob, resolved here
        # at config build (a constructed config is authoritative at trace
        # time — ADVICE r4).
        import os
        gelu = os.environ.get("PCT_GELU", "erf")
    return getattr(esm2.ESM2Config, name)(compute_dtype=dtype, gelu=gelu)


def load_clip_checkpoint(path, mcfg, esm_params):
    """Load a best_model.npz that is heads-only (frozen runs), the
    finetune engine's combined {heads, esm} pytree, or a LoRA
    {heads, lora} pytree. Returns (head_params, esm_params) — a
    finetuned checkpoint carries its OWN backbone; a LoRA checkpoint's
    adapters merge into the loaded base backbone (which must be the one
    it trained against)."""
    import numpy as np

    from ..models import clip
    from ..train.checkpoint import load_npz

    head_like = clip.init_params(jax.random.key(0), mcfg)
    with np.load(path) as data:
        combined = any(k.startswith("heads/") for k in data.files)
        has_lora = any(k.startswith("lora/") for k in data.files)
        lora_shapes = {k[len("lora/"):]: data[k].shape
                       for k in data.files if k.startswith("lora/")}
    if has_lora:
        import jax.numpy as jnp

        from ..train import lora as lora_mod
        lora_like = {}
        for key, shape in lora_shapes.items():
            name, ab = key.rsplit("/", 1)
            lora_like.setdefault(name, {})[ab] = jnp.zeros(shape,
                                                           jnp.float32)
        tree = load_npz(path, {"lora": lora_like, "heads": head_like})
        rank = next(iter(tree["lora"].values()))["a"].shape[-1]
        print(f"[checkpoint] LoRA adapters found (rank {rank}) — merging "
              "into the loaded backbone")
        return tree["heads"], lora_mod.merge_lora(
            esm_params, tree["lora"], lora_mod.default_alpha(rank))
    if combined:
        from ..train import finetune
        tree = load_npz(path, finetune.init_params(esm_params, head_like))
        print("[checkpoint] finetuned backbone found — using the "
              "checkpoint's own ESM weights")
        # the checkpoint stores the f32 master copy; eval consumers
        # expect compute-dtype leaves (same contract as load_esm)
        return tree["heads"], esm2.cast_params(tree["esm"],
                                               mcfg.esm.compute_dtype)
    return load_npz(path, head_like), esm_params


def load_esm(args, cfg: esm2.ESM2Config):
    """ESM params: from converted npz, HF dir, or random init.
    --esm-dtype int8 quantises the loaded weights post hoc."""
    dtype = cfg.compute_dtype

    def finish(params):
        if args.esm_dtype == "int8":
            print("[esm] int8 w8a8 backbone (post-training quantisation)")
            return esm2.quantize_params(params)
        return params

    if args.esm_weights is None:
        print("[esm] random init (pass --esm-weights for pretrained)")
        return finish(esm2.init_params(jax.random.key(0), cfg, dtype=dtype))
    path = Path(args.esm_weights)
    if path.suffix == ".npz":
        from ..train.checkpoint import load_npz
        like = jax.eval_shape(
            lambda: esm2.init_params(jax.random.key(0), cfg, dtype=dtype))
        like = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), like)
        return finish(load_npz(path, like))
    # HF checkpoint directory (torch) — convert on the fly
    import torch
    from transformers import EsmModel
    model = EsmModel.from_pretrained(str(path), add_pooling_layer=False)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = esm2.convert_hf_state_dict(sd, cfg)
    return finish(esm2.cast_params(params, dtype))


def ensure_data(args, prefix_a: str, prefix_b: str) -> Path:
    data_dir = Path(args.data_dir)
    fa = data_dir / f"{prefix_a}.fasta"
    fb = data_dir / f"{prefix_b}.fasta"
    if not (fa.exists() and fb.exists()):
        if args.synthetic_fixture:
            from ..data.synthetic import write_fixture
            print(f"[data] writing synthetic fixture into {data_dir}")
            write_fixture(data_dir, prefix1=prefix_a, prefix2=prefix_b,
                          n_families=args.fixture_families, seed=args.seed)
        elif prefix_a == "protein1":
            from ..data.fetch import download_pdb_two_chain
            download_pdb_two_chain(data_dir)
        else:
            from ..data.fetch import download_propedia
            download_propedia(data_dir)
    return data_dir


def make_tokenizer() -> EsmTokenizer:
    return EsmTokenizer()
