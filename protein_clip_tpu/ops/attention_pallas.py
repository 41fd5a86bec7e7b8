"""Fused segment-aware attention for ESM-2's head_dim=32.

Why this exists (trace-verified, docs/PERF.md): XLA's eager attention at
T=512 materialises the (rows, heads, T, T) f32 score tensor in HBM — the
profiler shows the two attention fusions running at 11-12 TF/s and
~800 GB/s, i.e. pinned to the HBM roofline, and together they are ~54% of
the packed train step. This kernel keeps each (T, T) f32 score tile
resident in VMEM, so scores never touch HBM.

Hard-won layout rules (round-1 kernel lost 434-478; a head-major rewrite
lost 343-469 — both trace-diagnosed):

- MXU matmuls take bf16 operands directly with f32 accumulation
  (``preferred_element_type``). Upcasting q/k to f32 first puts the
  matmuls at the slow f32 MXU rate — worse than the memory-bound path
  being replaced.
- Arrays stay in the model's native (B, T, heads*dh) layout through the
  model; the kernel takes a logically transposed (B, heads*dh, T) view.
  Two failure modes bracket this choice: a head-major (B, heads, T, dh)
  model layout makes dh=32 the minor dim and runs every surrounding
  elementwise op at a quarter of the VPU lanes (175 GB/s RoPE + 57
  ms/step of copies — 343 pairs/s end to end); a row-major (B, T, lanes)
  kernel boundary fights the T-minor layout XLA prefers for activations
  inside the layer scan and pays 6x 11.7 ms/step of layout-flip copies
  around the custom call (648 vs 770 pairs/s). The swapaxes view makes
  the custom call's forced default layout coincide with the producers'
  preference, so no copy materialises. Grid is (batch, head_group) where
  a head group is 128 lanes = 4 heads; programs slice per-head (dh, T)
  operands out of their (128, T) block internally.
- Masking is segment-based: ``segments`` is (B, T) int32 where 0 marks
  pads/gaps and tokens attend iff their nonzero ids match. A plain 0/1
  attention mask IS the one-segment special case, so the same kernel
  serves the padded and the packed (data/packing.py) paths — packing
  previously forced the eager path.

Exactness: same bf16-operand/f32-accumulate matmuls and f32 softmax as the
eager path (models/esm2._attention_block), so outputs match it to f32
rounding (tests/test_pallas_attention.py).

A segment-sparse variant (q-blocks with dynamic kv-block spans via
scalar-prefetched bounds + online softmax) was built and measured SLOWER:
284 pairs/s at 128-wide tiles, 453 at 256, vs 652 dense — the per-tile
dynamic-slice reads and online-softmax rescales cost more than the ~30%
of cross-segment tiles they skip at the Propedia length profile
(~1.7 segments/row). Removed; see docs/PERF.md and git history.

Backward: flash-style Pallas kernel (``_bwd_kernel``) — recomputes each
head's score tile in VMEM from q/k alone (no residuals beyond the inputs),
forms dS = P * (dP - rowsum(P*dP)) in f32, and accumulates dk/dv across
q-blocks in f32 carries. Like the forward, the (T, T) tensor never touches
HBM — so the unfrozen-encoder gradcache path (train/gradcache.py:63-109)
keeps the memory/bandwidth profile the forward kernel exists to provide,
instead of falling back to an eager VJP that materialises the
(B, nh, T, T) f32 scores (the round-2 backward did exactly that).
Grad parity vs the eager VJP: tests/test_pallas_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_budgets import on_tpu as _on_tpu

_NEG = float(jnp.finfo(jnp.float32).min)

# One program handles this many lanes of heads (4 heads at dh=32): the
# natural TPU lane width, so q/k/v blocks tile cleanly.
_GROUP_LANES = 128

# Rows per program: amortises per-program setup over more MXU work.
# Measured on the packed bench (T=512 rows): 1 -> 832, 2 -> 848, 4 -> 860,
# 8 -> 867 pairs/s; 16 overflows VMEM (q/k/v/o blocks are R*128*T bf16
# each, double-buffered across the grid). The chooser keeps R*T at the
# empirical 8*512 ceiling. PCT_ATTN_ROWS_PER_PROGRAM overrides for
# experiments.
import os as _os

# bytes-per-lane of q rows one program may hold: the v5e empirical ceiling
# is R=8 at T=512 bf16 (R=16 overflows); f32 operands halve the row
# budget. Per-generation scaling lives in ops/tpu_budgets.py.


def _choose_rows_per_program(batch: int, T: int, itemsize: int,
                             env: str = "PCT_ATTN_ROWS_PER_PROGRAM",
                             budget_divisor: int = 1) -> int:
    ov = _os.environ.get(env)
    if ov:
        want = max(int(ov), 1)  # 0/negative override falls back to 1
        return want if batch % want == 0 else 1
    from .tpu_budgets import attn_rows_byte_budget

    cap = max(1, attn_rows_byte_budget() // budget_divisor // (T * itemsize))
    best = 1
    for c in range(1, min(cap, batch) + 1):
        if batch % c == 0:
            best = c
    return best


def _kernel(s_ref, sc_ref, q_ref, k_ref, v_ref, o_ref, *, dh: int,
            q_block: int):
    """q/k/v arrive (R, lanes, T): T-minor matches the layout XLA prefers
    for activations inside the layer scan, so the custom call needs NO
    layout-flip copies on its operands or result — the row-major variant
    measured 6x 11.7 ms/step of pure copies around the call (648 vs 770
    pairs/s end to end). R rows per program (_ROWS_PER_PROGRAM) amortise
    per-program setup over more MXU work."""
    lanes = q_ref.shape[1]
    T = q_ref.shape[2]

    def softmax_pv(qh, kh, vh, seg_q, seg_row, key_ok):
        s = jax.lax.dot_general(                        # contract dh
            qh, kh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (QB, T)
        s = jnp.where((seg_q == seg_row) & key_ok, s, _NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(vh.dtype)
        return jax.lax.dot_general(                     # (dh, QB)
            vh, p, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    if q_block == T and _os.environ.get("PCT_ATTN_SWPIPE") == "1":
        # Software-pipelined (r, h) loop: issue iteration i+1's score
        # matmul BEFORE iteration i's softmax so the asynchronous MXU
        # works through the next K=32 contraction while the VPU runs the
        # f32 mask/max/exp/sum chain on the previous (T, T) tile. The
        # program-order dependence s -> softmax(s) -> pv(s) otherwise
        # serialises MXU and VPU: the per-program-cost fit
        # (tools/attn_program_cost.py) measured per-call time =~ MXU time
        # + VPU time (sum, not max), i.e. zero overlap. Costs one extra
        # live (T, T) f32 score tile of VMEM. A/B on the bench: PERF.md.
        def mk_s(r, lo):
            s = jax.lax.dot_general(
                q_ref[r, lo:lo + dh, :], k_ref[r, lo:lo + dh, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            seg_row = s_ref[r]
            return jnp.where((sc_ref[r] == seg_row) & (seg_row > 0),
                             s, _NEG)

        def finish(r, lo, s):
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v_ref.dtype)
            ctx = jax.lax.dot_general(
                v_ref[r, lo:lo + dh, :], p,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[r, lo:lo + dh, :] = ctx.astype(o_ref.dtype)

        pairs = [(r, h * dh) for r in range(q_ref.shape[0])
                 for h in range(lanes // dh)]
        prev, s_prev = pairs[0], mk_s(*pairs[0])
        for pr in pairs[1:]:
            s_cur = mk_s(*pr)
            finish(*prev, s_prev)
            prev, s_prev = pr, s_cur
        finish(*prev, s_prev)
        return

    for r in range(q_ref.shape[0]):
        seg_row = s_ref[r]                       # (1, T) int32
        key_ok = seg_row > 0
        for h in range(lanes // dh):
            lo = h * dh
            kh = k_ref[r, lo:lo + dh, :]         # (dh, T)
            vh = v_ref[r, lo:lo + dh, :]

            if q_block == T:
                # single block: static full-width slices — T on the LANE
                # dim only tolerates dynamic slicing at 128-multiples, so
                # buckets like 192/320/448 must avoid pl.ds here
                ctx = softmax_pv(q_ref[r, lo:lo + dh, :], kh, vh,
                                 sc_ref[r], seg_row, key_ok)
                o_ref[r, lo:lo + dh, :] = ctx.astype(o_ref.dtype)
                continue

            def qloop(qi, _, r=r, lo=lo, kh=kh, vh=vh, seg_row=seg_row,
                      key_ok=key_ok):
                q0 = pl.multiple_of(qi * q_block, q_block)  # q_block x128
                qh = q_ref[r, lo:lo + dh, pl.ds(q0, q_block)]   # (dh, QB)
                seg_q = sc_ref[r, pl.ds(q0, q_block), :]        # (QB, 1)
                ctx = softmax_pv(qh, kh, vh, seg_q, seg_row, key_ok)
                o_ref[r, lo:lo + dh, pl.ds(q0, q_block)] = ctx.astype(
                    o_ref.dtype)
                return 0

            n_q = T // q_block
            if n_q <= 2:
                for qi in range(n_q):
                    qloop(qi, 0)
            else:
                jax.lax.fori_loop(0, n_q, qloop, 0)


def _pick_q_block(T: int, budget_elems: int) -> int:
    """One block when the (T, T) f32 score tile fits the element budget;
    otherwise the largest 128-multiple divisor of T under the cap, so
    dynamic LANE slices stay 128-aligned (Mosaic rejects other offsets —
    the 192/320/448 pad buckets broke a plain min(T, cap) choice) AND tile
    T exactly. T without such a divisor runs single-block (bounded by
    ESM2Config.fused_max_seq_len)."""
    limit = max(128, budget_elems // T)
    if T <= limit:
        return T
    return max((c for c in range(128, limit + 1, 128) if T % c == 0),
               default=T)


def _choose_q_block(T: int) -> int:
    """Forward q-block under the per-generation score-tile budget (v5e:
    2^19 f32 elements ~ 2 MB; ops/tpu_budgets.attn_score_budget_elems)."""
    from .tpu_budgets import attn_score_budget_elems

    return _pick_q_block(T, attn_score_budget_elems())


def _attention_call(q, k, v, segments):
    B, T, NH, DH = q.shape
    lanes = NH * DH
    group = _GROUP_LANES if lanes % _GROUP_LANES == 0 else lanes
    # PCT_ATTN_GROUP_LANES: experiment knob — lanes one program handles
    # (must divide NH*DH, 128-multiple). group=lanes turns the grid 1D
    # (whole rows per program, fewer programs at the same VMEM when R
    # shrinks to match). Measured on the bench: see docs/PERF.md
    # (program-count A/B, round 5).
    gov = _os.environ.get("PCT_ATTN_GROUP_LANES")
    if gov and lanes % int(gov) == 0 and int(gov) % 128 == 0:
        group = int(gov)
    n_groups = lanes // group
    q_block = _choose_q_block(T)

    rpp = _choose_rows_per_program(B, T, q.dtype.itemsize,
                                   budget_divisor=group // _GROUP_LANES
                                   if group % _GROUP_LANES == 0 else 1)
    q3 = q.reshape(B, T, lanes).swapaxes(1, 2)  # (B, lanes, T)
    k3 = k.reshape(B, T, lanes).swapaxes(1, 2)
    v3 = v.reshape(B, T, lanes).swapaxes(1, 2)
    qkv_spec = pl.BlockSpec((rpp, group, T), lambda b, g: (b, g, 0),
                            memory_space=pltpu.VMEM)
    seg32 = segments.astype(jnp.int32)
    # Both grid dims are embarrassingly parallel (no cross-program state),
    # so tell Mosaic: "parallel" semantics let it overlap the next
    # program's input DMA with the current compute instead of assuming a
    # sequential dependency. Measured on the packed bench: see PERF.md
    # (PCT_ATTN_DIMSEM=arbitrary reverts for A/B).
    dimsem = _os.environ.get("PCT_ATTN_DIMSEM", "parallel")
    # PCT_ATTN_INPUT_FUSION=1: let XLA fuse the q/k/v producers (RoPE,
    # scale) INTO the custom call's input DMA instead of materialising
    # them in HBM first — experiment knob, measured in PERF.md.
    fuse_in = ([False, False, True, True, True]
               if _os.environ.get("PCT_ATTN_INPUT_FUSION") == "1" else None)
    params = pltpu.CompilerParams(
        dimension_semantics=(dimsem, dimsem),
        allow_input_fusion=fuse_in)
    out = pl.pallas_call(
        functools.partial(_kernel, dh=DH, q_block=q_block),
        grid=(B // rpp, n_groups),
        in_specs=[pl.BlockSpec((rpp, 1, T), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rpp, T, 1), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  qkv_spec, qkv_spec, qkv_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        compiler_params=params,
        interpret=not _on_tpu(),
    )(seg32[:, None, :], seg32[:, :, None], q3, k3, v3)
    return out.swapaxes(1, 2).reshape(B, T, NH, DH)


def _bwd_q_block(T: int) -> int:
    """Backward q-block: half the forward's score-tile budget — the
    backward holds FOUR (QB, T) f32 tiles (s, p, dp, ds) plus the f32
    dk/dv accumulators, where the forward holds two."""
    from .tpu_budgets import attn_score_budget_elems

    return _pick_q_block(T, attn_score_budget_elems() // 2)


def _bwd_kernel(s_ref, sc_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, dh: int, q_block: int):
    """R rows, one 128-lane head group per program. The backward's row
    budget is HALF the forward's (_attention_bwd_call): it streams 7
    (R, lanes, T) blocks per program (q/k/v/do in, dq/dk/dv out) where
    the forward streams 4, and its f32 score scratch holds four (QB, T)
    tiles where the forward holds two. Same T-minor views as the
    forward, so no layout copies appear around the call."""
    lanes = q_ref.shape[1]
    T = q_ref.shape[2]
    for r in range(q_ref.shape[0]):
        _bwd_row(s_ref, sc_ref, q_ref, k_ref, v_ref, do_ref,
                 dq_ref, dk_ref, dv_ref, r=r, dh=dh, q_block=q_block,
                 lanes=lanes, T=T)


def _bwd_row(s_ref, sc_ref, q_ref, k_ref, v_ref, do_ref,
             dq_ref, dk_ref, dv_ref, *, r: int, dh: int, q_block: int,
             lanes: int, T: int):
    seg_row = s_ref[r]                           # (1, T) int32
    key_ok = seg_row > 0

    for h in range(lanes // dh):
        lo = h * dh
        kh = k_ref[r, lo:lo + dh, :]             # (dh, T)
        vh = v_ref[r, lo:lo + dh, :]

        def block(qh, doh, seg_q):
            # recompute the forward's masked softmax tile in f32
            allowed = (seg_q == seg_row) & key_ok
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (QB, T)
            s = jnp.where(allowed, s, _NEG)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)      # f32 (QB, T)
            dp = jax.lax.dot_general(                      # (QB, T)
                doh, vh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=1, keepdims=True)  # (QB, 1)
            # re-mask dS: for valid rows p is already 0 at masked entries,
            # but a fully-padded query row softmaxes UNIFORM (all scores
            # _NEG) — the eager where() blocks its dq/dk, so must we.
            # p itself stays unmasked for dv: the eager VJP routes the
            # uniform pad rows' do into dv too, and parity is exact.
            ds = jnp.where(allowed, p * (dp - delta), 0.0).astype(qh.dtype)
            p_c = p.astype(vh.dtype)
            # dq = kh · dsᵀ; dk += qh · ds; dv += doh · p
            dq = jax.lax.dot_general(
                kh, ds, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (dh, QB)
            dk_c = jax.lax.dot_general(
                qh, ds, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (dh, T)
            dv_c = jax.lax.dot_general(
                doh, p_c, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dq, dk_c, dv_c

        if q_block == T:
            dq, dk_c, dv_c = block(q_ref[r, lo:lo + dh, :],
                                   do_ref[r, lo:lo + dh, :], sc_ref[r])
            dq_ref[r, lo:lo + dh, :] = dq.astype(dq_ref.dtype)
            dk_ref[r, lo:lo + dh, :] = dk_c.astype(dk_ref.dtype)
            dv_ref[r, lo:lo + dh, :] = dv_c.astype(dv_ref.dtype)
            continue

        def qloop(qi, carry, lo=lo):
            dk_acc, dv_acc = carry
            q0 = pl.multiple_of(qi * q_block, q_block)     # 128-aligned
            qh = q_ref[r, lo:lo + dh, pl.ds(q0, q_block)]
            doh = do_ref[r, lo:lo + dh, pl.ds(q0, q_block)]
            seg_q = sc_ref[r, pl.ds(q0, q_block), :]       # (QB, 1)
            dq, dk_c, dv_c = block(qh, doh, seg_q)
            dq_ref[r, lo:lo + dh, pl.ds(q0, q_block)] = dq.astype(
                dq_ref.dtype)
            return dk_acc + dk_c, dv_acc + dv_c

        zero = jnp.zeros((dh, T), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, T // q_block, qloop,
                                           (zero, zero))
        dk_ref[r, lo:lo + dh, :] = dk_acc.astype(dk_ref.dtype)
        dv_ref[r, lo:lo + dh, :] = dv_acc.astype(dv_ref.dtype)


def _attention_bwd_call(q, k, v, segments, do):
    B, T, NH, DH = q.shape
    lanes = NH * DH
    group = _GROUP_LANES if lanes % _GROUP_LANES == 0 else lanes
    n_groups = lanes // group
    q_block = _bwd_q_block(T)

    def t_minor(x):
        return x.reshape(B, T, lanes).swapaxes(1, 2)   # (B, lanes, T)

    # Half the forward's row budget: 7 streamed blocks per program vs the
    # forward's 4, plus a ~2x f32 score-scratch set (see _bwd_kernel).
    # Measured on the packed finetune bench: see docs/PERF.md;
    # PCT_ATTN_BWD_ROWS_PER_PROGRAM=1 reverts for A/B.
    rpp = _choose_rows_per_program(B, T, q.dtype.itemsize,
                                   env="PCT_ATTN_BWD_ROWS_PER_PROGRAM",
                                   budget_divisor=2)
    qkv_spec = pl.BlockSpec((rpp, group, T), lambda b, g: (b, g, 0),
                            memory_space=pltpu.VMEM)
    seg32 = segments.astype(jnp.int32)
    out_shape = jax.ShapeDtypeStruct((B, lanes, T), q.dtype)
    dimsem = _os.environ.get("PCT_ATTN_DIMSEM", "parallel")
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, dh=DH, q_block=q_block),
        grid=(B // rpp, n_groups),
        in_specs=[pl.BlockSpec((rpp, 1, T), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rpp, T, 1), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  qkv_spec, qkv_spec, qkv_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=(out_shape, out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(dimsem, dimsem)),
        interpret=not _on_tpu(),
    )(seg32[:, None, :], seg32[:, :, None], t_minor(q), t_minor(k),
      t_minor(v), t_minor(do.astype(q.dtype)))

    def back(x):
        return x.swapaxes(1, 2).reshape(B, T, NH, DH)

    return back(dq), back(dk), back(dv)


def _eager_reference(q, k, v, segments):
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    seg = segments.astype(jnp.int32)
    allowed = (seg[:, None, :, None] == seg[:, None, None, :]) & (
        seg[:, None, None, :] > 0)
    probs = jax.nn.softmax(jnp.where(allowed, scores, _NEG),
                           axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@jax.custom_vjp
def fused_attention(q, k, v, segments):
    """Segment-masked bidirectional attention, (B, T, NH, DH) -> same.

    q must already carry its scaling (ESM applies dh^-0.5 pre-RoPE).
    segments: (B, T) int32 — 0 is pad/gap, tokens attend within equal
    nonzero ids. Pass a plain 0/1 attention mask for unpacked batches.
    """
    return _attention_call(q, k, v, segments)


def _fwd(q, k, v, segments):
    return _attention_call(q, k, v, segments), (q, k, v, segments)


def _bwd(res, g):
    q, k, v, segments = res
    dq, dk, dv = _attention_bwd_call(q, k, v, segments, g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)
