"""Benchmark: protein pairs/sec/chip at global batch 256 (BASELINE.json metric).

Runs the full CLIP training step on the real TPU chip — frozen ESM-2 t30
150M backbone in bf16 (chunk-scanned), trainable heads, 256-negative
symmetric InfoNCE, Adam update — on a realistic workload (peptides 8-30 aa
bucketed to 64 tokens, receptors 100-500 aa bucketed to 512 tokens; the
reference's Propedia profile).

Each timed step consumes DIFFERENT input data (the axon tunnel can coalesce
identical computations; see .claude/skills/verify/SKILL.md).

Prints one JSON line:
  {"metric": "pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N / cpu_reference_pairs_per_sec}
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def _rec_len(rng):
    """Receptor length draw. PCT_BENCH_PROFILE=longtail models the 2protein
    ingest (cap 2000, data_utils_2protein.py:88): mostly 100-400 aa chains
    with a 10% tail up to ~2000 — the profile where a few long chains force
    every flat-packed row to 2048 tokens."""
    import os

    if os.environ.get("PCT_BENCH_PROFILE") == "longtail":
        if rng.random() < 0.10:
            return rng.integers(1200, 1999)
        return rng.integers(100, 400)
    return rng.integers(100, 500)


def make_batches(rng, n, global_batch, tokenizer, length_groups=1):
    from protein_clip_tpu.train.clip_engine import (tokenize_grouped,
                                                    tokenize_pair_batch)

    aas = list("LAGVSERTIDPKQNFYMHWC")
    batches = []
    for _ in range(n):
        peps = ["".join(rng.choice(aas, rng.integers(8, 30)))
                for _ in range(global_batch)]
        recs = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(global_batch)]
        if length_groups == "packed":
            import os

            from protein_clip_tpu.train.packed_engine import tokenize_packed
            tiers = int(os.environ.get("PCT_PACK_TIERS", "1"))
            batches.append(tokenize_packed(tokenizer, peps, recs,
                                           tiers=tiers))
        elif isinstance(length_groups, int) and length_groups > 1:
            batches.append(tokenize_grouped(tokenizer, peps, recs,
                                            length_groups))
        else:
            batches.append(tokenize_pair_batch(tokenizer, peps, recs))
    return batches


def _maybe_int8(esm_cfg, esm_params):
    """PCT_ESM_DTYPE=int8 on a frozen-backbone mode: post-training w8a8
    quantisation + the tanh-gelu default that unlocks its MXU win
    (docs/PERF.md 'int8 is erf-bound'; PCT_GELU=erf reverts). The gelu
    choice is resolved INTO the returned config here at build time —
    nothing reads env at trace time (ADVICE r4)."""
    import dataclasses
    import os

    from protein_clip_tpu.models import esm2

    if os.environ.get("PCT_ESM_DTYPE") == "int8":
        esm_cfg = dataclasses.replace(
            esm_cfg, gelu=os.environ.get("PCT_GELU", "tanh"))
        return esm_cfg, esm2.quantize_params(esm_params)
    return esm_cfg, esm_params


def bench_sharded():
    """Mesh-sharded CLIP train step (parallel/step.make_sharded_train_step)
    on whatever devices this host exposes: PCT_MESH_DP x PCT_MESH_TP
    (defaults: all devices x 1). With PCT_ESM_CONFIG=t36_3B
    PCT_ESM_DTYPE=int8 this is the 3B int8 TP bench mode (VERDICT r4 #4) —
    the quantized backbone rides its w_q/w_s Megatron splits
    (parallel/sharding.esm_param_specs) through the GSPMD 'model' axis.
    On the single axon chip it measures the sharded-machinery overhead vs
    the plain step (mesh 1x1); on real multi-chip it measures the scaling.
    """
    import os

    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel import sharding as shard_mod
    from protein_clip_tpu.parallel.step import (make_sharded_train_step,
                                                shard_batch)
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train import optimizer as opt_mod

    n_dev = len(jax.devices())
    tp = int(os.environ.get("PCT_MESH_TP", "1"))
    dp = int(os.environ.get("PCT_MESH_DP", str(max(1, n_dev // tp))))
    mesh = mesh_mod.make_mesh(data=dp, model=tp)

    family = os.environ.get("PCT_ESM_CONFIG", "t30_150M")
    esm_cfg = getattr(esm2.ESM2Config, family)(compute_dtype=jnp.bfloat16)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    esm_cfg, esm_params = _maybe_int8(esm_cfg, esm_params)
    if tp > 1 or os.environ.get("PCT_ESM_DTYPE") == "int8":
        esm_params = shard_mod.shard_params(
            mesh, esm_params, shard_mod.esm_param_specs(esm_params))
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)

    gb = int(os.environ.get("PCT_GLOBAL_BATCH", "256"))
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=gb // 16, accumulated_batches=16,
        num_chunks=16, remat=True)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(cfg, optimizer, mesh)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    n_steps = 10
    batches = [shard_batch(mesh, b) for b in
               make_batches(rng, n_steps + 1, cfg.global_batch, tokenizer, 1)]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    for b in batches:
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params,
                                       batches[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals

    pairs_per_sec = n_steps * cfg.global_batch / dt
    print(json.dumps({
        "metric": f"sharded_dp{dp}_tp{tp}_{family}"
                  f"{'_int8' if os.environ.get('PCT_ESM_DTYPE') == 'int8' else ''}"
                  "_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": None,
    }))


def bench_filip():
    """FILIP pairs/s at batch 128 = 12.8x the reference's bs-10 memory wall
    (main_2protein_filip.py:33): fused max-sim kernel (no B^2*T^2 tensor),
    chunk-scanned backbone, length-grouped buckets. Realistic
    protein-protein lengths (100-500 aa both sides)."""
    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2, filip
    from protein_clip_tpu.train import clip_engine, filip_engine
    from protein_clip_tpu.train import optimizer as opt_mod
    from protein_clip_tpu.train.clip_engine import tokenize_grouped

    import os

    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    esm_cfg, esm_params = _maybe_int8(esm_cfg, esm_params)
    mcfg = filip.FILIPConfig(esm=esm_cfg)
    params = filip.init_params(jax.random.key(1), mcfg)
    packed = os.environ.get("PCT_FILIP_PACKED", "1") != "0"
    batch = int(os.environ.get("PCT_FILIP_BATCH", "128"))
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=batch, accumulated_batches=1,
        num_chunks=batch // 16,
        length_groups=1 if packed else 4, packed=packed, remat=True)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    step = filip_engine.make_train_step(cfg, optimizer)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    n_steps = 8
    batches = []
    for _ in range(n_steps + 1):
        peps = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(cfg.batch_size)]
        recs = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(cfg.batch_size)]
        if packed:
            from protein_clip_tpu.train.filip_packed import tokenize_packed
            tiers = int(os.environ.get("PCT_PACK_TIERS", "1"))
            # scatter-tiers: flat backbone pack + per-length-tier token
            # buffers (kill the quadratic padding in max-sim). Default 4,
            # matching the FILIP CLI — measured faster at every batch size
            # (128: 367 vs 359; 256: 349 vs 318 — docs/PERF.md).
            sct = int(os.environ.get("PCT_FILIP_SCATTER_TIERS", "4"))
            batches.append(tokenize_packed(tokenizer, peps, recs,
                                           tiers=tiers, scatter_tiers=sct))
        else:
            batches.append(tokenize_grouped(tokenizer, peps, recs,
                                            cfg.length_groups))
    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    for b in batches:  # compile per bucket composition
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params,
                                       batches[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals
    print(json.dumps({
        "metric": "filip_pairs_per_sec_per_chip",
        "value": round(n_steps * cfg.batch_size / dt, 2),
        "unit": "pairs/s",
        "batch_size": cfg.batch_size,
        "vs_reference_batch": round(cfg.batch_size / 10, 1),
    }))


def bench_eval():
    """Packed EVAL + packed retrieval-encode throughput (VERDICT r2 #3:
    eval must ride the train data path, within ~1.3x of train pairs/s).
    Same model/profile as the train headline (t30_150M bf16, packed rows,
    global batch 256); eval has no backward, so it should in fact beat
    the train number."""
    import os

    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine

    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    esm_cfg, esm_params = _maybe_int8(esm_cfg, esm_params)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=16, num_chunks=16,
                                   packed=True)
    eval_step = clip_engine.make_eval_step(cfg)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    n_steps = 10
    batches = make_batches(rng, n_steps + 1, cfg.global_batch, tokenizer,
                           "packed")
    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))
    for b in batches:  # compile per composition
        float(eval_step(params, esm_params, b))

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        losses.append(eval_step(params, esm_params, batches[i + 1]))
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals
    eval_pps = n_steps * cfg.global_batch / dt

    # packed retrieval encode (topk --packed): embed 256 candidate pairs
    from protein_clip_tpu.train.packed_engine import embed_packed
    emb = lambda b: embed_packed(params, esm_params, b, mcfg)
    for b in batches:
        pe, re_ = emb(b)
        float(jnp.sum(pe)) + float(jnp.sum(re_))
    t0 = time.perf_counter()
    outs = [emb(batches[i + 1]) for i in range(n_steps)]
    for pe, re_ in outs:
        float(jnp.sum(pe)) + float(jnp.sum(re_))
    dt = time.perf_counter() - t0
    encode_pps = n_steps * cfg.global_batch / dt

    print(json.dumps({
        "metric": "eval_pairs_per_sec_per_chip",
        "value": round(eval_pps, 2),
        "unit": "pairs/s",
        "retrieval_encode_pairs_per_sec": round(encode_pps, 2),
    }))


def bench_filip_retrieve():
    """FILIP late-interaction scoring throughput (eval/retrieval.
    filip_score_matrix — the topk --filip / retrieve --filip / serve
    --filip hot path): 256 queries x 1024 candidates at T=512, D=128
    through the fused max-sim kernel, reported as query-candidate pairs
    scored per second. Token tensors are generated ON DEVICE — staging
    268 MB of candidate tokens through the axon tunnel would measure the
    tunnel (~0.3 MB/s), not the kernel.

    The grid is at its f32 MXU roofline (17.6 TFLOP / ~270 ms = 65 TF/s
    = bf16 peak / 3 passes); a multi-query-resident kernel variant and
    bf16 operands both measured washes — docs/PERF.md."""
    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.eval.retrieval import _filip_score_rows

    Q, N, T, D = 256, 1024, 512, 128
    rb = 64

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def make(key, n):
        kt, kl = jax.random.split(key)
        t = jax.random.normal(kt, (n, T, D), jnp.float32)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        lens = jax.random.randint(kl, (n, 1), T // 4, T + 1)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (n, T), 1)
                < lens).astype(jnp.int32)
        return t * mask[..., None], mask

    n_reps = 5
    # a DIFFERENT query set per rep: the tunnel reports impossibly fast
    # times for repeated identical computations (see CLAUDE.md)
    qsets = [make(jax.random.key(10 + r), Q) for r in range(n_reps + 1)]
    ct, cm = make(jax.random.key(1), N)
    temp = jnp.asarray(0.7, jnp.float32)
    for qt, qm in qsets + [(ct, cm)]:
        float(jnp.sum(qt)) + float(jnp.sum(qm.astype(jnp.float32)))

    def score_all(qt, qm):
        rows = [_filip_score_rows(qt[i:i + rb], qm[i:i + rb], ct, cm, temp)
                for i in range(0, Q, rb)]
        return float(jnp.sum(jnp.concatenate(rows)))  # sync via scalar

    score_all(*qsets[0])  # compile
    t0 = time.perf_counter()
    vals = [score_all(*qsets[r + 1]) for r in range(n_reps)]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals

    print(json.dumps({
        "metric": "filip_score_pairs_per_sec",
        "value": round(n_reps * Q * N / dt, 2),
        "unit": "pairs/s",
        "matrix": f"{Q}x{N} @ T={T}",
        "ms_per_matrix": round(1e3 * dt / n_reps, 2),
    }))


def bench_finetune():
    """UNFROZEN-backbone training throughput (train/finetune.py): full
    t30_150M end-to-end at global batch 256 via two-pass gradcache +
    flash attention backward — the regime the reference cannot enter at
    all (its GradCache needs the backbone frozen to fit GPU memory).
    f32 master params, bf16 compute, two-group Adam, donation on."""
    import os

    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine, finetune

    family = os.environ.get("PCT_ESM_CONFIG", "t30_150M")
    esm_cfg = getattr(esm2.ESM2Config, family)(compute_dtype=jnp.bfloat16)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = finetune.init_params(
        esm2.init_params(jax.random.key(0), esm_cfg, dtype=jnp.float32),
        clip.init_params(jax.random.key(1), mcfg))
    # packed rows by default (same ~95% fill the frozen headline rides);
    # PCT_FINETUNE_PACKED=0 measures the plain single-bucket path
    packed = os.environ.get("PCT_FINETUNE_PACKED", "1") != "0"
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=16, accumulated_batches=16, num_chunks=16,
        length_groups=1, remat=True, backbone_lr=1e-5, packed=packed)
    optimizer = finetune.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = finetune.make_train_step(cfg, optimizer, donate=True)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    n_steps = 6
    batches = make_batches(rng, n_steps + 1, cfg.global_batch, tokenizer,
                           "packed" if packed else 1)
    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    # one warm step per batch: packed row compositions vary slightly and
    # each distinct composition compiles once (see the main bench)
    for b in batches:
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {}, b, sub)
        float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {},
                                       batches[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals
    print(json.dumps({
        "metric": "finetune_pairs_per_sec_per_chip",
        "value": round(n_steps * cfg.global_batch / dt, 2),
        "unit": "pairs/s",
        "global_batch": cfg.global_batch,
        "packed": packed,
        "esm_config": family,
    }))


def bench_finetune_filip():
    """UNFROZEN-backbone FILIP training (train/filip_finetune.py): token-
    level two-pass gradcache at batch 128 — the reference's FILIP is
    frozen-only AND walled at batch 10. Packed rows + scatter-tiers by
    default (the frozen FILIP bench profile); PCT_FINETUNE_PACKED=0
    measures the plain single-bucket path."""
    import os

    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2, filip
    from protein_clip_tpu.train import clip_engine, filip_finetune
    from protein_clip_tpu.train.clip_engine import tokenize_pair_batch

    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    mcfg = filip.FILIPConfig(esm=esm_cfg)
    params = filip_finetune.init_params(
        esm2.init_params(jax.random.key(0), esm_cfg, dtype=jnp.float32),
        filip.init_params(jax.random.key(1), mcfg))
    batch_size = int(os.environ.get("PCT_FILIP_BATCH", "128"))
    packed = os.environ.get("PCT_FINETUNE_PACKED", "1") != "0"
    sct = int(os.environ.get("PCT_FILIP_SCATTER_TIERS", "4"))
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=batch_size, accumulated_batches=1,
        num_chunks=batch_size // 16, length_groups=1, remat=True,
        backbone_lr=1e-5, packed=packed,
        scatter_tiers=sct if packed else 1)
    optimizer = filip_finetune.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = filip_finetune.make_train_step(cfg, optimizer)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    n_steps = 6
    batches = []
    for _ in range(n_steps + 1):
        peps = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(batch_size)]
        recs = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(batch_size)]
        if packed:
            from protein_clip_tpu.train.filip_packed import tokenize_packed
            batches.append(tokenize_packed(tokenizer, peps, recs,
                                           scatter_tiers=sct))
        else:
            batches.append(tokenize_pair_batch(tokenizer, peps, recs))
    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    for b in batches:  # one warm step per composition
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {}, b, sub)
        float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, {},
                                       batches[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals
    print(json.dumps({
        "metric": "finetune_filip_pairs_per_sec_per_chip",
        "value": round(n_steps * batch_size / dt, 2),
        "unit": "pairs/s",
        "batch": batch_size,
        "packed": packed,
    }))


def bench_lora():
    """Parameter-efficient finetune throughput (train/lora.py): low-rank
    adapters on the attention projections over a FROZEN compute-dtype
    base, packed rows, global batch 256. Same backward FLOPs as full
    finetune (LoRA buys optimizer state, not compute) — the interesting
    numbers are throughput at rank r and the 650M case where full-f32
    masters pressure HBM (PCT_ESM_CONFIG=t33_650M)."""
    import os

    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine, lora

    family = os.environ.get("PCT_ESM_CONFIG", "t30_150M")
    rank = int(os.environ.get("PCT_LORA_RANK", "8"))
    esm_cfg = getattr(esm2.ESM2Config, family)(compute_dtype=jnp.bfloat16)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    params = lora.init_params(
        lora.init_lora(jax.random.key(2), esm_params, rank),
        clip.init_params(jax.random.key(1), mcfg))
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=16, accumulated_batches=16, num_chunks=16,
        length_groups=1, remat=True, backbone_lr=1e-4, packed=True)
    optimizer = lora.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = lora.make_train_step(cfg, optimizer)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    n_steps = 6
    batches = make_batches(rng, n_steps + 1, cfg.global_batch, tokenizer,
                           "packed")
    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    for b in batches:  # one warm step per packed composition
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params,
                                       batches[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals
    print(json.dumps({
        "metric": "lora_pairs_per_sec_per_chip",
        "value": round(n_steps * cfg.global_batch / dt, 2),
        "unit": "pairs/s",
        "rank": rank,
        "esm_config": family,
        "global_batch": cfg.global_batch,
    }))


def bench_mlm():
    """MLM training throughput in tokens/s (cli/mlm_train.py's step):
    masked-token CE over the t30_150M backbone. PCT_MLM_MODE=head trains
    the tied-decoder LM head over the frozen backbone (the notebook-N1
    capability); PCT_MLM_MODE=finetune is continued pretraining — the CE
    gradient reaches f32 backbone masters (cast to bf16 in-step).
    PCT_MLM_PACKED=1 packs sequences into fixed-width rows (cli --packed):
    segment-aware token-dropout ratios keep the loss exact; the metric
    still counts REAL tokens, so the packed win is the padding it no
    longer pays for."""
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2, mlm
    from protein_clip_tpu.train import optimizer as opt_mod

    mode = os.environ.get("PCT_MLM_MODE", "head")
    batch = int(os.environ.get("PCT_MLM_BATCH", "64"))
    packed = os.environ.get("PCT_MLM_PACKED") == "1"
    mask_prob = 0.15
    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    lm_head = esm2.init_lm_head(jax.random.key(1), esm_cfg)
    optimizer = opt_mod.adam(1e-3)

    if mode == "finetune":
        from protein_clip_tpu.train.finetune import _cast_esm
        esm_params = {}
        trainable = {"esm": esm2.init_params(jax.random.key(0), esm_cfg,
                                             dtype=jnp.float32),
                     "head": lm_head}

        def loss_of(t, esm_p, masked, attn, labels, seg, pos):
            del esm_p
            return mlm.mlm_loss(_cast_esm(t["esm"], esm_cfg.compute_dtype),
                                t["head"], masked, attn, labels, esm_cfg,
                                remat=True, segment_ids=seg, positions=pos)
    else:
        esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                      dtype=jnp.bfloat16)
        trainable = lm_head

        def loss_of(t, esm_p, masked, attn, labels, seg, pos):
            return mlm.mlm_loss(esm_p, t, masked, attn, labels, esm_cfg,
                                segment_ids=seg, positions=pos)

    opt_state = optimizer.init(trainable)

    @jax.jit
    def step(trainable, opt_state, esm_p, arrs, key):
        if packed:  # trace-time constant
            from protein_clip_tpu.train.packed_engine import derive_segments
            ids, seg, pos = derive_segments(arrs[0])
            attn = (seg > 0).astype(jnp.int32)
        else:
            (ids, attn), seg, pos = arrs, None, None
        masked, labels = mlm.mask_tokens(key, ids, attn, mask_prob)
        loss, grads = jax.value_and_grad(loss_of)(trainable, esm_p, masked,
                                                  attn, labels, seg, pos)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    n_steps = 8
    encs, tokens = [], 0
    for i in range(n_steps + 1):
        seqs = ["".join(rng.choice(aas, _rec_len(rng))) for _ in range(batch)]
        if packed:
            from protein_clip_tpu.train.packed_engine import (
                tokenize_packed_rows)
            ids8 = tokenize_packed_rows(tokenizer, seqs)
            if i > 0:  # REAL tokens, not row capacity
                tokens += int((np.asarray(ids8) != 1).sum())
            encs.append((ids8,))
        else:
            enc = tokenizer(seqs)
            if i > 0:
                tokens += int(np.asarray(enc["attention_mask"]).sum())
            encs.append((jnp.asarray(enc["input_ids"]),
                         jnp.asarray(enc["attention_mask"])))
    encs = [jax.device_put(e) for e in encs]
    for arrs in encs:
        float(sum(jnp.sum(a.astype(jnp.int32)) for a in arrs))

    key = jax.random.key(0)
    for arrs in encs:  # one warm step per row/pad composition
        key, sub = jax.random.split(key)
        trainable, opt_state, loss = step(trainable, opt_state, esm_params,
                                          arrs, sub)
        float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        trainable, opt_state, loss = step(trainable, opt_state, esm_params,
                                          encs[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals
    print(json.dumps({
        "metric": "mlm_tokens_per_sec_per_chip",
        "value": round(tokens / dt, 1),
        "unit": "tokens/s",
        "mode": mode,
        "packed": packed,
        "batch": batch,
        "seqs_per_sec": round(n_steps * batch / dt, 2),
    }))


def bench_serve():
    """Online-serving latency through the real HTTP endpoint (cli/serve.py):
    single-sequence /embed p50, batch-32 /embed throughput, /topk p50
    against a 1024-candidate index. The reference's only retrieval path is
    a 10h offline SLURM job (topk.py)."""
    import json as _json
    import tempfile
    import threading

    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.cli.serve import build_argparser, make_server
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train.checkpoint import export_npz

    tmp = tempfile.mkdtemp(prefix="pct_serve_bench_")
    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    export_npz(f"{tmp}/best_model.npz",
               clip.init_params(jax.random.key(1), mcfg))
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((1024, mcfg.embedding_dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    np.savez(f"{tmp}/index.npz",
             ids=np.array([f"cand{i}" for i in range(1024)]),
             embeddings=corpus)

    args = build_argparser().parse_args([
        "--checkpoint", f"{tmp}/best_model.npz",
        "--index", f"{tmp}/index.npz", "--port", "0", "--batch-size", "32"])
    server = make_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    import http.client
    import socket as _socket

    class _Client:
        """Keep-alive JSON client (the server speaks HTTP/1.1): one TCP
        connection reused across requests, reconnect-once on close.
        TCP_NODELAY on the client side too — headers and body go out in
        separate writes, and Nagle would park the body behind the
        server's delayed ACK."""

        def __init__(self):
            self.conn = self._connect()

        @staticmethod
        def _connect():
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            c.connect()
            c.sock.setsockopt(_socket.IPPROTO_TCP,
                              _socket.TCP_NODELAY, 1)
            return c

        def post(self, path, payload, binary=False):
            body = _json.dumps(payload)
            headers = {"Content-Type": "application/json"}
            if binary:  # raw <f4 wire (serve.py _binary): shape in X-Shape
                headers["Accept"] = "application/octet-stream"
            for attempt in (0, 1):
                try:
                    self.conn.request("POST", path, body, headers)
                    resp = self.conn.getresponse()
                    raw = resp.read()
                    if binary and resp.getheader("X-Shape"):
                        shape = tuple(int(d) for d in
                                      resp.getheader("X-Shape").split(","))
                        return np.frombuffer(raw, "<f4").reshape(shape)
                    return _json.loads(raw)
                except (http.client.HTTPException, ConnectionError,
                        OSError):
                    if attempt:
                        raise
                    self.conn.close()
                    self.conn = self._connect()

    post = _Client().post

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seq_of = lambda n: "".join(rng.choice(aas, n))
    # warm every pad bucket the timed lengths map to (embed_sequences
    # length-sorts into bucket batches; each distinct shape compiles once:
    # lengths 100-500 aa span the 128..512 buckets in steps of 64)
    for n in (110, 170, 230, 300, 360, 430, 490):
        post("/embed", {"sequences": [seq_of(n)], "side": "pep"})
    post("/embed", {"sequences": [seq_of(_rec_len(rng))
                                  for _ in range(32)], "side": "pep"})
    post("/topk", {"queries": [seq_of(300)], "side": "pep", "k": 10})

    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        post("/embed", {"sequences": [seq_of(int(rng.integers(100, 500)))],
                        "side": "pep"})
        lat.append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    n_req = 8
    for _ in range(n_req):
        post("/embed", {"sequences": [seq_of(_rec_len(rng))
                                      for _ in range(32)], "side": "pep"})
    qps = n_req * 32 / (time.perf_counter() - t0)
    tlat = []
    for _ in range(10):
        t0 = time.perf_counter()
        post("/topk", {"queries": [seq_of(int(rng.integers(100, 500)))],
                       "side": "pep", "k": 10})
        tlat.append((time.perf_counter() - t0) * 1e3)

    # concurrent single-sequence clients: the serve-side coalescer drains
    # everything queued during the in-flight encode into ONE batch (pow2-
    # padded rows, so group sizes hit the warm jit cache). Lengths pinned
    # to one bucket so the shape set is {1,2,4,8,16} x that bucket — warm
    # each explicitly, then time n_cli closed-loop clients.
    n_cli, per_cli = 16, 12
    for n in (1, 2, 4, 8, 16):
        post("/embed", {"sequences": [seq_of(int(rng.integers(260, 310)))
                                      for _ in range(n)], "side": "pep"})

    def run_concurrent(binary):
        errs: list[Exception] = []
        barrier = threading.Barrier(n_cli + 1)

        def client(k):
            r = np.random.default_rng(1000 + k)
            cli = _Client()  # own keep-alive connection per client
            try:
                barrier.wait()
                for _ in range(per_cli):
                    cli.post(
                        "/embed",
                        {"sequences": ["".join(r.choice(
                            aas, int(r.integers(260, 310))))],
                         "side": "pep"}, binary=binary)
            except Exception as e:  # noqa: BLE001 — surface in main thread
                errs.append(e)

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(n_cli)]
        for th in threads:
            th.start()
        barrier.wait()
        t0 = time.perf_counter()
        for th in threads:
            th.join()
        if errs:
            raise errs[0]
        return n_cli * per_cli / (time.perf_counter() - t0)

    conc = run_concurrent(binary=False)
    # binary wire (Accept: octet-stream): same closed loop, raw <f4
    # responses — isolates the JSON float-serialization share of the cycle
    conc_bin = run_concurrent(binary=True)

    server.shutdown()
    print(json.dumps({
        "metric": "serve_embed_p50_ms",
        "value": round(float(np.percentile(lat, 50)), 2),
        "unit": "ms",
        "embed_p95_ms": round(float(np.percentile(lat, 95)), 2),
        "embed_seqs_per_sec_batch32": round(qps, 2),
        "topk_p50_ms": round(float(np.percentile(tlat, 50)), 2),
        "concurrent_seqs_per_sec_16cli": round(conc, 2),
        "concurrent_seqs_per_sec_16cli_binary": round(conc_bin, 2),
    }))


def main():
    import os

    import jax

    # persistent compilation cache: the axon remote-compile path costs
    # minutes per cold process; cache across bench invocations
    # (host-fingerprinted dir, utils/compcache.py).
    from protein_clip_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()

    if os.environ.get("PCT_BENCH_MODE") == "filip":
        return bench_filip()
    if os.environ.get("PCT_BENCH_MODE") == "eval":
        return bench_eval()
    if os.environ.get("PCT_BENCH_MODE") == "finetune":
        return bench_finetune()
    if os.environ.get("PCT_BENCH_MODE") == "finetune_filip":
        return bench_finetune_filip()
    if os.environ.get("PCT_BENCH_MODE") == "lora":
        return bench_lora()
    if os.environ.get("PCT_BENCH_MODE") == "mlm":
        return bench_mlm()
    if os.environ.get("PCT_BENCH_MODE") == "filip_retrieve":
        return bench_filip_retrieve()
    if os.environ.get("PCT_BENCH_MODE") == "serve":
        return bench_serve()
    if os.environ.get("PCT_BENCH_MODE") == "sharded":
        return bench_sharded()

    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine, optimizer as opt_mod

    dev = jax.devices()[0]
    import os
    attn_impl = os.environ.get("PCT_ATTN_IMPL", "fused")
    # PCT_ESM_CONFIG / PCT_ESM_DTYPE: model-family / precision sweeps
    # (e.g. PCT_ESM_CONFIG=t33_650M PCT_ESM_DTYPE=int8). Defaults match the
    # baseline metric (t30_150M bf16).
    family = os.environ.get("PCT_ESM_CONFIG", "t30_150M")
    esm_cfg = getattr(esm2.ESM2Config, family)(
        compute_dtype=jnp.bfloat16, attention_impl=attn_impl)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    # int8 implies tanh gelu (erf's epilogue forfeits the int8 MXU win —
    # 897 vs 1040 pairs/s at 150M); PCT_GELU=erf reverts for A/B.
    esm_cfg, esm_params = _maybe_int8(esm_cfg, esm_params)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)

    # PCT_REMAT=0: drop the jax.checkpoint wrap on the (frozen,
    # stop-gradient) backbone layers — no backward exists to remat for.
    # PCT_GLOBAL_BATCH (default 256, the baseline metric): negative-pool
    # scaling sweep — the tiled InfoNCE kernel carries pools to 4096.
    gb = int(os.environ.get("PCT_GLOBAL_BATCH", "256"))
    if gb % 16 or gb > 4096:
        raise SystemExit(f"PCT_GLOBAL_BATCH must be a multiple of 16 "
                         f"<= 4096, got {gb}")
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=16, accumulated_batches=gb // 16,
        num_chunks=16,
        remat=os.environ.get("PCT_REMAT", "1") != "0", packed=True)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    step = clip_engine.make_train_step(cfg, optimizer)

    tokenizer = EsmTokenizer()
    rng = np.random.default_rng(42)
    n_steps = 10
    batches = make_batches(rng, n_steps + 1, cfg.global_batch, tokenizer,
                           "packed" if cfg.packed else cfg.length_groups)
    # Pre-stage on device: a production input pipeline overlaps host->device
    # transfer with compute (data/prefetch.py); the axon tunnel serialises
    # transfers at ~0.3 MB/s AND materialises device_put lazily, so force
    # the transfer with a real reduction per array before timing.
    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    # warmup/compile: one step per batch — length-grouped bucket
    # compositions vary slightly between batches and each distinct
    # composition compiles once (cached thereafter; in a real run the few
    # compositions amortise over thousands of steps).
    for b in batches:
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        float(loss)

    # Pipelined dispatch, exactly like the shipped epoch loop (train_gc):
    # losses stay on device until the end; the final float() of EVERY loss
    # syncs all sequentially-dependent steps (each consumes the previous
    # step's params), so the wall clock is honest. Per-step float(loss)
    # leaves the device idle during each dispatch gap — measured 750 vs
    # 818 pairs/s (docs/PERF.md round 3).
    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params,
                                       batches[i + 1], sub)
        losses.append(loss)
    vals = [float(l) for l in losses]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals), vals

    pairs_per_sec = n_steps * cfg.global_batch / dt

    baseline_path = Path(__file__).parent / "bench_baseline.json"
    vs_baseline = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        vs_baseline = pairs_per_sec / base["cpu_pairs_per_sec"]

    print(json.dumps({
        "metric": "pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
