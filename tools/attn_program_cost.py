"""Measure the fused-attention kernel's per-program fixed cost directly.

VERDICT r4 #3: the ceiling decomposition charges attention 85.1 ms/step at
0.248 ms/call vs a 0.220 ms/call MXU floor — ~10 ms/step of unclaimed
overhead. Round-4 scheduling knobs (dimension_semantics, input fusion)
both washed, leaving the hypothesis "the residue is per-program fixed
cost (prologue + grid bookkeeping)" untested at kernel level. This tool
tests it: at FIXED total work (same B, T, heads), sweep rows-per-program
R so only the program count changes, fit t_call = a + b * n_programs, and
report the fixed cost b. If the R=8 point sits on the line, the residue
is exactly (programs/call) * b and the floor must absorb it (the bench
cannot run R=16: q/k/v/o blocks overflow VMEM — measured, tpu_budgets).

Also A/Bs the round-5 whole-row idea: group=640 lanes (grid 1D, one
program does all 20 heads of R rows) trades 5x fewer grid programs
against 5x the block bytes per program. At matched VMEM (R=2, 10.5 MB)
the program count drops 110 -> 88 — worth ~2 ms/step IF per-program cost
dominates and Mosaic compiles the wider block.

Timing rules for the axon tunnel (CLAUDE.md): chain each call's output
into the next call's input inside one jitted lax.scan (no identical
repeats, no per-call dispatch), sync by fetching a scalar.

Usage: python tools/attn_program_cost.py [--rows 176] [--t 512] [--k 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from protein_clip_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=176,
                    help="batch rows at the kernel boundary (the standard "
                         "packed bench presents ~176 T=512 rows)")
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--k", type=int, default=50, help="calls per timing scan")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from protein_clip_tpu.ops import attention_pallas as ap_mod

    B, T, NH, DH = args.rows, args.t, 20, 32
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, NH, DH), jnp.bfloat16)
    k = jax.random.normal(kk, (B, T, NH, DH), jnp.bfloat16)
    v = jax.random.normal(kv, (B, T, NH, DH), jnp.bfloat16)
    # ~1.7 segments/row like the packed bench profile: two segments with a
    # short pad gap so the mask math is exercised, not all-ones
    seg = np.ones((B, T), np.int32)
    seg[:, T // 2:] = 2
    seg[:, T // 2 - 8:T // 2] = 0
    seg = jnp.asarray(seg)

    def timed(label: str, env: dict[str, str]) -> dict:
        for kk_, vv in env.items():
            os.environ[kk_] = vv
        try:
            def one(qc, _):
                o = ap_mod.fused_attention(qc, k, v, seg)
                # data-chain: next call's q depends on this call's output
                return (qc + 0.001 * o).astype(jnp.bfloat16), ()

            @jax.jit
            def scan_k(q0):
                qf, _ = jax.lax.scan(one, q0, None, length=args.k)
                return jnp.sum(qf.astype(jnp.float32))

            s = float(scan_k(q))  # compile + warm
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                s = float(scan_k(q))
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(s)
            return {"label": label, "ms_per_call": best / args.k * 1e3}
        finally:
            for kk_ in env:
                os.environ.pop(kk_, None)

    results = []
    for r in (1, 2, 4, 8):
        if B % r:
            continue
        n_prog = (B // r) * 5
        res = timed(f"R={r} group=128",
                    {"PCT_ATTN_ROWS_PER_PROGRAM": str(r)})
        res["n_programs"] = n_prog
        results.append(res)
        print(json.dumps(res))

    # whole-row program at matched VMEM: R=2 x 640 lanes (10.5 MB blocks)
    for r in (1, 2):
        if B % r:
            continue
        try:
            res = timed(f"R={r} group=640",
                        {"PCT_ATTN_ROWS_PER_PROGRAM": str(r),
                         "PCT_ATTN_GROUP_LANES": "640"})
            res["n_programs"] = B // r
            results.append(res)
            print(json.dumps(res))
        except Exception as e:  # Mosaic VMEM overflow is a finding, not a crash
            print(json.dumps({"label": f"R={r} group=640",
                              "error": str(e)[:200]}))

    pts = [(res["n_programs"], res["ms_per_call"]) for res in results
           if "group=128" in res["label"]]
    if len(pts) >= 2:
        xs = np.array([p[0] for p in pts], np.float64)
        ys = np.array([p[1] for p in pts], np.float64)
        b, a = np.polyfit(xs, ys, 1)
        print(json.dumps({
            "fit": "ms_per_call = a + b * n_programs",
            "a_ms": round(float(a), 4),
            "b_us_per_program": round(float(b) * 1e3, 4),
            "r8_residual_ms": round(
                float(pts[-1][1] - (a + b * pts[-1][0])), 4),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
