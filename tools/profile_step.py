"""Profile the packed CLIP train step on the real TPU chip.

Captures a jax.profiler trace of the bench-shaped workload (frozen ESM-2
t30 150M bf16, packed rows, global batch 256) and prints the device op
breakdown (self-time by HLO category and the top individual ops), parsed
from the xplane protobuf via tensorboard_plugin_profile.

Usage:  python tools/profile_step.py [--steps 3] [--out docs/trace]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _trace_steps(out_dir: Path, step, params, opt_state, esm_params,
                 batches) -> None:
    """Shared trace scaffold (the hard-won timing rules live HERE only):
    force batch materialization through the lazy axon device_put, warm one
    step per batch so no composition compiles mid-trace (mid-loop
    recompiles corrupt timing — CLAUDE.md), then trace with a float(loss)
    sync per step."""
    import jax
    import jax.numpy as jnp

    batches = [jax.device_put(b) for b in batches]
    for b in batches:
        for leaf in jax.tree.leaves(b):
            float(jnp.sum(leaf.astype(jnp.int32)))

    key = jax.random.key(0)
    for b in batches:
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        float(loss)

    jax.profiler.start_trace(str(out_dir))
    for b in batches[1:]:
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, esm_params, b, sub)
        float(loss)
    jax.profiler.stop_trace()


def capture_filip(out_dir: Path, n_steps: int) -> None:
    """Trace the packed FILIP train step (bench_filip workload: batch 128,
    both sides 100-500 aa, fused max-sim kernel)."""
    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2, filip
    from protein_clip_tpu.train import clip_engine, filip_engine
    from protein_clip_tpu.train import optimizer as opt_mod
    from protein_clip_tpu.train.filip_packed import tokenize_packed

    import os

    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    mcfg = filip.FILIPConfig(esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    params = filip.init_params(jax.random.key(1), mcfg)
    # Same knobs as bench_filip so a trace can attribute any bench config
    # (e.g. PCT_FILIP_BATCH=256 PCT_FILIP_SCATTER_TIERS=4).
    batch = int(os.environ.get("PCT_FILIP_BATCH", "128"))
    sct = int(os.environ.get("PCT_FILIP_SCATTER_TIERS", "1"))
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=batch,
                                   accumulated_batches=1,
                                   num_chunks=batch // 16,
                                   length_groups=1, packed=True, remat=True)
    optimizer = opt_mod.adam(cfg.learning_rate)
    step = filip_engine.make_train_step(cfg, optimizer)

    from bench import _rec_len  # honors PCT_BENCH_PROFILE=longtail

    rng = np.random.default_rng(42)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    tok = EsmTokenizer()
    batches = []
    for _ in range(n_steps + 1):
        peps = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(cfg.batch_size)]
        recs = ["".join(rng.choice(aas, _rec_len(rng)))
                for _ in range(cfg.batch_size)]
        batches.append(tokenize_packed(
            tok, peps, recs,
            tiers=int(os.environ.get("PCT_PACK_TIERS", "1")),
            scatter_tiers=sct))
    _trace_steps(out_dir, step, params, optimizer.init(params), esm_params,
                 batches)


def capture(out_dir: Path, n_steps: int) -> None:
    import jax
    import jax.numpy as jnp

    from bench import make_batches
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine, optimizer as opt_mod

    import os
    esm_cfg = esm2.ESM2Config.t30_150M(
        compute_dtype=jnp.bfloat16,
        attention_impl=os.environ.get("PCT_ATTN_IMPL", "fused"))
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=jnp.bfloat16)
    from bench import _maybe_int8  # same knob + gelu default as bench.py
    esm_cfg, esm_params = _maybe_int8(esm_cfg, esm_params)
    mcfg = clip.CLIPConfig(esm=esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=16, num_chunks=16,
                                   remat=True, packed=True)
    optimizer = opt_mod.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    step = clip_engine.make_train_step(cfg, optimizer)

    rng = np.random.default_rng(42)
    batches = make_batches(rng, n_steps + 1, cfg.global_batch,
                           EsmTokenizer(), "packed")
    _trace_steps(out_dir, step, params, opt_state, esm_params, batches)


def capture_finetune(out_dir: Path, n_steps: int) -> None:
    """Trace the UNFROZEN-backbone finetune step (bench_finetune workload:
    t30_150M, global batch 256; PCT_FINETUNE_PACKED picks packed/plain)."""
    import os

    import jax
    import jax.numpy as jnp

    from bench import make_batches
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine, finetune

    packed = os.environ.get("PCT_FINETUNE_PACKED", "1") != "0"
    esm_cfg = esm2.ESM2Config.t30_150M(compute_dtype=jnp.bfloat16)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = finetune.init_params(
        esm2.init_params(jax.random.key(0), esm_cfg, dtype=jnp.float32),
        clip.init_params(jax.random.key(1), mcfg))
    cfg = clip_engine.EngineConfig(
        model=mcfg, batch_size=16, accumulated_batches=16, num_chunks=16,
        length_groups=1, remat=True, backbone_lr=1e-5, packed=packed)
    optimizer = finetune.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = finetune.make_train_step(cfg, optimizer)

    rng = np.random.default_rng(42)
    batches = make_batches(rng, n_steps + 1, cfg.global_batch,
                           EsmTokenizer(), "packed" if packed else 1)
    _trace_steps(out_dir, step, params, opt_state, {}, batches)


def op_breakdown(out_dir: Path, top: int = 30) -> None:
    """Parse the newest xplane.pb directly (the tensorboard_plugin_profile
    converter is broken against this TF build) and print device time by HLO
    category plus the top fusions with achieved FLOP/s.

    Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the generated
    descriptors in this TF wheel predate the installed C++ protobuf).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(out_dir.rglob("*.xplane.pb"),
                     key=lambda p: p.stat().st_mtime)
    if not xplanes:
        print("no xplane.pb captured", file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(xplanes[-1].read_bytes())
    planes = [p for p in xs.planes if "/device:TPU" in p.name]
    if not planes:
        print("no TPU device plane in trace", file=sys.stderr)
        return
    plane = planes[0]
    smeta = plane.stat_metadata

    def meta_stats(md):
        out = {}
        for st in md.stats:
            name = smeta[st.metadata_id].name
            out[name] = (st.str_value or st.int64_value or st.uint64_value
                         or st.double_value)
        return out

    by_cat = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ps, count, flops, bytes
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            ms = meta_stats(md)
            cat = str(ms.get("hlo_category", "?"))
            dur = float(ev.duration_ps)
            by_cat[cat] += dur
            rec = by_op[(cat, md.display_name)]
            rec[0] += dur
            rec[1] += 1
            rec[2] += float(ms.get("flops", 0) or 0)
            rec[3] += float(ms.get("bytes_accessed", 0) or 0)

    total = sum(by_cat.values())
    print(f"\n=== TPU device time by HLO category "
          f"(total {total/1e9:.2f} ms over trace)")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e9:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n=== top {top} ops (achieved TFLOP/s, GB/s over op time)")
    ranked = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]
    for (cat, name), (ps, n, fl, byts) in ranked:
        secs = ps / 1e12
        tfps = fl / secs / 1e12 if secs else 0.0
        gbps = byts / secs / 1e9 if secs else 0.0
        print(f"{ps/1e9:9.2f} ms {100*ps/total:5.1f}% x{n:<5d} "
              f"{tfps:7.1f} TF/s {gbps:7.0f} GB/s [{cat}] {name[:70]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="docs/trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--mode", choices=["clip", "filip", "finetune"],
                    default="clip")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if not args.parse_only:
        {"clip": capture, "filip": capture_filip,
         "finetune": capture_finetune}[args.mode](out, args.steps)
    op_breakdown(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
