"""Packed-row CLIP train step: ~95% token fill vs ~80% for length groups.

Both sides of the global batch are packed (data/packing.py) into fixed-width
rows; the backbone runs segment-masked with per-segment RoPE restart, and
per-sequence pooled sums come from a flat segment scatter-add
(``jax.ops.segment_sum``) instead of a one-hot matmul. Embeddings emerge in
original pair order, so the InfoNCE diagonal is untouched.

Wire format is compact: int8 token ids (the 33-token ESM vocab fits) plus a
small int32 owner permutation per side. Segment ids, within-segment
positions, and the per-token owner map are all derived ON DEVICE from the
ids (``expand_packed_batch``): every packed sequence starts with <cls> and
gaps are <pad>, so segment boundaries are recoverable exactly. ~1 byte per
token crosses the host->device link instead of the 16 the round-1 format
shipped (ids+seg+pos+owner as int32).

Row lengths default to the batch's own max sequence (rounded up to a
multiple of 128, capped at MAX_ROW_LEN=2048) so 2000-residue chains — the
reference's ingest cap, /root/reference/modules/data_utils_2protein.py:88 —
pack without truncation. Row counts are rounded so compiled shapes repeat
across batches like the length-group compositions; the multiple scales
down with row width (constant 8192-slot quantum, _row_multiple_for) so
wide long-tail tiers don't drown in 16-row minimums.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.packing import pack_sequences
from ..data.tokenizer import CLS_ID, EOS_ID, PAD_ID, EsmTokenizer
from ..models import esm2, heads
from .clip_engine import EngineConfig, default_loss_fn

Params = dict[str, Any]

# Reference ingest filters chains at <= 2000 residues (data_utils_2protein
# .py:88) = 2002 tokens with <cls>/<eos>; 2048 covers that with headroom.
MAX_ROW_LEN = 2048


def _row_len_for(max_len: int, explicit: int | None,
                 cap: int = MAX_ROW_LEN) -> int:
    if explicit is not None:
        return explicit
    return min(cap, max(128, -(-max_len // 128) * 128))


def _tier_widths(row_len: int, n: int = 4) -> list[int]:
    """n-way split points of the row length rounded up to 128-multiples.

    n=4: 512 -> [128, 256, 384, 512]; 128 -> [128]; 2048 -> [512, 1024,
    1536, 2048]. Attention cost per token scales with its row width, so
    short sequences riding narrower rows skip the masked cross-segment
    work the dense kernel would otherwise burn (docs/PERF.md: ~50% of
    score work in a 512-wide Propedia receptor row is masked waste).

    row_len itself is always a member (even when an explicit row_len is not
    a 128-multiple, where the floored split points all fall below it), so
    every sequence that fits the row fits a tier. Nearby widths collapse
    (set semantics), so the tier count is AT MOST n.
    """
    return sorted({min(row_len, max(128, -(-row_len * q // n) // 128 * 128))
                   for q in range(1, n + 1)} | {row_len})


# Per-slot backbone cost at row width w is ~(w + 3H): each layer spends
# ~12H^2 FLOPs on linear/FFN per slot and ~4wH on attention, so the ratio
# is 3H. 1920 = 3*640 (t30). The chosen width set only trades attention
# savings against fill loss, so the optimum is flat in this constant —
# t33/t48 land on the same 128-multiple boundaries for the length
# profiles measured in docs/PERF.md.
_TIER_COST_GAMMA = 1920


def _row_multiple_for(w: int) -> int:
    """Row-count rounding for a pack of width w: constant SLOT quantum.

    16 rows was tuned at the 512-wide standard profile (8192 slots); at
    2048-wide rows the same 16-row quantum is 32k slots — on the longtail
    profile it rounded a 20-row long tier up to 32 and erased the tier
    split's win entirely (the DP in _tier_widths_data correctly refused to
    split). Halving the multiple as width doubles keeps the quantum (and
    the compiled-shape reuse it buys) constant: 512->16, 1024->8, 2048->4.
    """
    m = 16
    while m > 4 and m * w > 16 * 512:
        m //= 2
    return m


def _ffd_rows(lens: list[int], w: int) -> int:
    """Row count first-fit-decreasing packing would use at width w
    (mirrors pack_sequences so the tier-width DP prices real fill)."""
    free: list[int] = []
    for L in sorted(lens, reverse=True):
        for i, f in enumerate(free):
            if f >= L:
                free[i] = f - L
                break
        else:
            free.append(w - L)
    return len(free)


def _tier_widths_data(lens: list[int], row_len: int, n: int) -> list[int]:
    """Data-aware tier widths: <=n 128-multiple boundaries minimizing the
    modeled backbone cost sum_t rows_t(w) * w * (w + 3H).

    The even splits of ``_tier_widths`` lose on skewed length mixes: on the
    longtail profile (90% short / 10% near-cap) they spread the sparse long
    tail across two 16-row-minimum tiers at 0.24-0.55 fill, so total row
    capacity GREW 65k -> 90k slots/side and the extra FFN/linear work
    cancelled the attention savings (traced: 577 vs 621 ms/step attention,
    a wash end-to-end — docs/PERF.md). This DP prices each candidate tier
    by the rows FFD would actually use (rounded to the 16-row multiple the
    packer pads to), so boundaries land where the data is: bimodal lengths
    get [short-bucket, row_len] instead of even quarters.

    Exact DP: buckets between consecutive 128-multiples, best[j][k] = min
    cost covering buckets <=j with k tiers (tier widths are candidate
    values; a sequence rides the narrowest chosen width that fits it).
    O(n * cands^2) with cands <= 17 — host-side noise per batch.
    """
    cands = sorted({min(row_len, w)
                    for w in range(128, row_len + 127, 128)} | {row_len})
    buckets: list[list[int]] = [[] for _ in cands]
    lo = 0
    for j, c in enumerate(cands):
        buckets[j] = [L for L in lens if lo < L <= c]
        lo = c
    last = max((j for j, b in enumerate(buckets) if b), default=0)
    cands = cands[: last + 1]
    buckets = buckets[: last + 1]
    m = len(cands)

    def tier_cost(a: int, b: int) -> float:
        members = [L for bk in buckets[a: b + 1] for L in bk]
        if not members:
            return 0.0
        w = cands[b]
        mult = _row_multiple_for(w)
        rows = -(-_ffd_rows(members, w) // mult) * mult
        return float(rows) * w * (w + _TIER_COST_GAMMA)

    INF = float("inf")
    best = [[INF] * (n + 1) for _ in range(m)]
    pick: dict[tuple[int, int], int] = {}
    for b in range(m):
        for k in range(1, n + 1):
            c_full = tier_cost(0, b)
            if c_full < best[b][k]:
                best[b][k] = c_full
                pick[(b, k)] = -1
            if k > 1:
                for a in range(b):
                    c = best[a][k - 1] + tier_cost(a + 1, b)
                    if c < best[b][k]:
                        best[b][k] = c
                        pick[(b, k)] = a
    widths = []
    b, k = m - 1, n
    while b >= 0:
        a = pick[(b, k)]
        widths.append(cands[b])
        if a < 0:
            break
        b, k = a, k - 1
    return sorted(set(widths))


def scan_order_operm(packed, idx: np.ndarray) -> np.ndarray:
    """Owner permutation: idx entry of each segment in row-major (row,
    segment) scan order — the one map the device-side derivation
    (``_expand_pack``) needs; all else reconstructs from the ids."""
    counts = packed.segment_ids.max(axis=1)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    g = offsets[packed.owner_row] + packed.owner_seg - 1
    operm = np.zeros(packed.n_sequences, np.int32)
    operm[g] = idx
    return operm


def _pack_one(encs: list[np.ndarray], idx: np.ndarray, row_len: int
              ) -> dict[str, jnp.ndarray]:
    """Pack one group; operm maps scan-order segments to GLOBAL indices.

    Returns HOST (NumPy) arrays — jnp conversion happens once at wire emit
    time. Round-tripping a device array back through np.asarray inside the
    packer costs seconds per batch over the lazy axon tunnel (~0.3 MB/s
    host<->device; CLAUDE.md gotchas)."""
    packed = pack_sequences(encs, row_len,
                            row_multiple=_row_multiple_for(row_len))
    return {"ids": packed.ids.astype(np.int8),
            "operm": scan_order_operm(packed, idx)}


# First data-aware width choice per (side, row_len, tiers), reused for
# the rest of the process so compiled shapes repeat across batches.
_STICKY_TIER_WIDTHS: dict[tuple[str, int, int], list[int]] = {}
# High-water row / operm counts per (side, row_len, tiers, width): tier
# compositions jitter batch-to-batch, and every distinct batch pytree
# signature is a fresh full-step XLA compile (30-210 s). Ratcheting each
# tier's row count and operm length up to the process maximum (padding
# with all-<pad> rows / sentinel operm slots, both proven inert) converges
# the signature after a few batches instead of never.
_STICKY_TIER_ROWS: dict[tuple[str, int, int, int], int] = {}
_STICKY_TIER_OPERM: dict[tuple[str, int, int, int], int] = {}


def clear_tier_width_cache() -> None:
    """Forget sticky data-aware tier widths (tests; corpus switches)."""
    _STICKY_TIER_WIDTHS.clear()
    _STICKY_TIER_ROWS.clear()
    _STICKY_TIER_OPERM.clear()


def tokenize_packed(tokenizer: EsmTokenizer, peps: list[str],
                    recs: list[str], pep_row_len: int | None = None,
                    rec_row_len: int | None = None,
                    tiers: int = 1,
                    scatter_tiers: int = 1,
                    tier_widths: list[int] | None = None
                    ) -> dict[str, jnp.ndarray]:
    """Pack both sides into a compact device batch.

    Row lengths derive from each side's longest tokenized sequence (multiple
    of 128, capped at MAX_ROW_LEN) unless given explicitly. Sequences longer
    than the row length are truncated with the eos kept — that only happens
    past the 2048 cap, beyond the reference's own ingest filter — with a
    loud warning.

    tiers > 1 packs each side into width-tiered row groups (_tier_widths):
    each sequence rides the narrowest tier that fits it, cutting the
    attention work that scales with row width. The wire then carries
    ``{side}_packs`` — a tuple of per-tier {ids, operm} dicts with operm
    holding GLOBAL batch indices — instead of the flat ``{side}_ids`` /
    ``{side}_operm`` pair (emitted whenever a single tier ends up holding
    everything).

    scatter_tiers > 1 (FILIP, flat packing only): the BACKBONE rows stay
    flat-packed at full fill, but the wire additionally carries
    ``{side}_stiers`` — per-length-tier global-index groups — so the
    packed FILIP similarity can scatter per-token embeddings into
    per-tier (B_t, W_t, D) buffers and assemble the (B, B) score from
    tier-pair kernel blocks. The max-similarity kernel's work is
    (sum_t B_t*W_t)^2 instead of (B*row_len)^2 — it stops paying the
    quadratic cost of per-sequence padding without giving up backbone
    fill (the trade that made full width-tiered packing LOSE on the
    standard profile, docs/PERF.md round 4).
    """
    out: dict[str, jnp.ndarray] = {}
    for side, seqs, explicit in (("pep", peps, pep_row_len),
                                 ("rec", recs, rec_row_len)):
        encs = [tokenizer.encode(s) for s in seqs]
        max_len = max(len(e) for e in encs)
        tiered = tier_widths is not None or tiers > 1
        # Tiered mode caps at MAX_ROW_LEN (or the explicit length) instead
        # of the batch max: the batch max jitters across batches, and a
        # jittering cap both breaks the sticky-width key and re-derives
        # different tier boundaries per batch (each a full step recompile).
        # The DP ignores candidate widths above the data anyway, so the
        # fixed cap costs nothing on narrow batches.
        row_len = (explicit if tiered and explicit is not None
                   else MAX_ROW_LEN if tiered
                   else _row_len_for(max_len, explicit))
        clamped = 0
        for j, e in enumerate(encs):
            if len(e) > row_len:  # keep eos, like the bucket clamp
                encs[j] = np.concatenate((e[: row_len - 1], [EOS_ID]))
                clamped += 1
        if clamped:
            warnings.warn(
                f"tokenize_packed: {clamped} {side} sequence(s) longer than "
                f"row_len={row_len} were truncated (eos kept)", stacklevel=2)
        if tier_widths is not None:
            # Explicit widths: deterministic multi-tier wire (tests) and
            # production shape pinning when the length distribution is
            # known. Widths beyond the cap are dropped; a top width is
            # added only when the given ones don't cover the batch (so
            # pinned shapes stay pinned on narrow batches).
            widths = sorted({w for w in tier_widths if w <= row_len})
            if not widths or widths[-1] < max_len:
                widths.append(min(row_len, -(-max_len // 128) * 128))
        elif tiers > 1:
            # Data-aware boundaries: the even splits of _tier_widths lose
            # on skewed length mixes (docs/PERF.md longtail trace). STICKY
            # per process: the first batch's DP choice is reused for every
            # later batch with the same (side, row_len, tiers) — per-batch
            # re-optimization would change the compiled shapes every step
            # (a fresh 30-210s XLA compile per batch; the first data-aware
            # bench run timed out exactly this way). Any width set is
            # exact — only the packing efficiency depends on it — and
            # batches drawn from one corpus share a length distribution,
            # so the first batch's boundaries transfer.
            key = (side, row_len, tiers)
            widths = _STICKY_TIER_WIDTHS.get(key)
            if widths is None or max_len > widths[-1]:
                # (re)derive — the ratchet case (a later batch outgrowing
                # the sticky top width) re-runs the DP once and re-pins
                widths = _tier_widths_data([len(e) for e in encs],
                                           row_len, tiers)
                _STICKY_TIER_WIDTHS[key] = widths
        else:
            widths = [row_len]
        groups: dict[int, list] = {w: [] for w in widths}
        gidx: dict[int, list] = {w: [] for w in widths}
        for j, e in enumerate(encs):
            w = next(w for w in widths if len(e) <= w)
            groups[w].append(e)
            gidx[w].append(j)
        # Spill-to-wider: once a tier's row count is pinned (first batch),
        # later batches whose group overflows that capacity move the
        # overflow UP to the next wider tier instead of growing the tier —
        # wider rows always fit, correctness is untouched (owner maps are
        # global), and the compiled shapes stay frozen. Only the TOP tier
        # can genuinely grow (rare: it's the near-cap tail).
        for i, w in enumerate(widths[:-1]):
            cap = _STICKY_TIER_ROWS.get((side, row_len, tiers, w))
            if cap is None or not groups[w]:
                continue
            order = sorted(range(len(groups[w])),
                           key=lambda k: -len(groups[w][k]))
            free = [w] * cap
            keep, spill = [], []
            for k in order:
                L = len(groups[w][k])
                for r in range(cap):
                    if free[r] >= L:
                        free[r] -= L
                        keep.append(k)
                        break
                else:
                    spill.append(k)
            if spill:
                wn = widths[i + 1]
                groups[wn] += [groups[w][k] for k in spill]
                gidx[wn] += [gidx[w][k] for k in spill]
                keep = sorted(keep)
                groups[w] = [groups[w][k] for k in keep]
                gidx[w] = [gidx[w][k] for k in keep]
        # Arity follows the WIDTH SET, not this batch's occupancy: a batch
        # that happens to fill one tier of a multi-width set still ships
        # the multi-tier wire (placeholder packs), because flipping between
        # flat and tiered pytree structures is a step recompile.
        if len(widths) == 1:
            pk = _pack_one(groups[widths[0]],
                           np.asarray(gidx[widths[0]], np.int32),
                           widths[0])
            out[f"{side}_ids"] = jnp.asarray(pk["ids"])
            out[f"{side}_operm"] = jnp.asarray(pk["operm"])
            if scatter_tiers > 1:
                # narrowest fitting tier per sequence
                swidths = _tier_widths(row_len, scatter_tiers)
                sgroups: dict[int, list[int]] = {w: [] for w in swidths}
                for j, e in enumerate(encs):
                    w = next(w for w in swidths if len(e) <= w)
                    sgroups[w].append(j)
                n_seqs = len(encs)

                def _padded(g):
                    # tier counts round up to 8 with the out-of-range
                    # sentinel n_seqs: scatters DROP out-of-bounds updates,
                    # so dummy slots stay zero/masked and never reach the
                    # assembled (B, B) — compiled shapes repeat across
                    # batches instead of recompiling per composition
                    pad = (-len(g)) % 8
                    return np.asarray(g + [n_seqs] * pad, np.int32)

                # every width emits a tier — an empty one is 8 sentinel
                # slots (all-masked phantom rows in the assembly) — so the
                # stiers tuple ARITY never changes batch-to-batch: an
                # arity flip is a new pytree structure and a full step
                # recompile
                out[f"{side}_stiers"] = tuple(
                    {"operm": jnp.asarray(_padded(sgroups[w])),
                     # width marker: the only static channel a jit'd pytree
                     # leaf offers is its SHAPE
                     "wmark": jnp.zeros((w,), jnp.int8)}
                    for w in swidths)
        else:
            # Multi-tier wire. Shape-stability rules (each distinct batch
            # pytree signature costs a full 30-210s XLA step compile):
            # every width emits a pack even when this batch left it empty
            # (placeholder all-<pad> rows encode to zeros and pool/scatter
            # to the dump slot), and tier operms pad to a multiple of 8
            # with the out-of-range sentinel n_total. The REAL sequence
            # count rides the shape-only ``nmark`` marker so
            # packed_side_count stays static under jit.
            n_total = len(encs)
            tier_packs = []
            for w in widths:
                if groups[w]:
                    pk = _pack_one(groups[w], np.asarray(gidx[w], np.int32),
                                   w)
                    op = pk["operm"]
                    ids_t = pk["ids"]
                else:
                    op = np.zeros((0,), np.int32)
                    ids_t = np.full((_row_multiple_for(w), w), PAD_ID,
                                    np.int8)
                rkey = (side, row_len, tiers, w)
                rows = max(ids_t.shape[0], _STICKY_TIER_ROWS.get(rkey, 0))
                _STICKY_TIER_ROWS[rkey] = rows
                if rows > ids_t.shape[0]:
                    ids_t = np.concatenate(
                        [ids_t, np.full((rows - ids_t.shape[0], w), PAD_ID,
                                        np.int8)])
                n_op = max(-(-op.shape[0] // 8) * 8, 8,
                           _STICKY_TIER_OPERM.get(rkey, 0))
                _STICKY_TIER_OPERM[rkey] = n_op
                if n_op > op.shape[0]:
                    op = np.concatenate(
                        [op, np.full((n_op - op.shape[0],), n_total,
                                     np.int32)])
                tier_packs.append(
                    {"ids": jnp.asarray(ids_t), "operm": jnp.asarray(op),
                     "nmark": jnp.zeros((len(gidx[w]),), jnp.int8)})
            out[f"{side}_packs"] = tuple(tier_packs)
    return out


def derive_segments(ids8: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side (int32 ids, segment ids, within-segment positions) from
    compact packed rows alone. Contract (tokenizer + packer): every
    sequence starts with <cls> and gaps are <pad>, so segment ids are a
    running <cls> count and positions restart at each <cls>. Shared by the
    pair path (``_expand_pack``) and the single-side MLM path
    (``tokenize_packed_rows`` wire)."""
    ids = ids8.astype(jnp.int32)
    R, L = ids.shape
    valid = ids != PAD_ID
    is_bos = ids == CLS_ID
    seg = jnp.cumsum(is_bos.astype(jnp.int32), axis=1) * valid
    ar = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    starts = jax.lax.cummax(jnp.where(is_bos, ar, 0), axis=1)
    pos = jnp.where(valid, ar - starts, 0)
    return ids, seg, pos


def tokenize_packed_rows(tokenizer: EsmTokenizer, seqs: list[str],
                         row_len: int | None = None) -> jnp.ndarray:
    """Single-side packed wire: int8 (R, L) token ids, no owner maps.

    The MLM objective is per-token (no per-sequence pooling), so unlike the
    pair wire no owner permutation ships — segments/positions derive on
    device (``derive_segments``). Same row-length policy as
    ``tokenize_packed`` (batch max rounded to 128, capped at MAX_ROW_LEN,
    loud truncation past the cap)."""
    encs = [tokenizer.encode(s) for s in seqs]
    rl = _row_len_for(max(len(e) for e in encs), row_len)
    clamped = 0
    for j, e in enumerate(encs):
        if len(e) > rl:
            encs[j] = np.concatenate((e[: rl - 1], [EOS_ID]))
            clamped += 1
    if clamped:
        warnings.warn(
            f"tokenize_packed_rows: {clamped} sequence(s) longer than "
            f"row_len={rl} were truncated (eos kept)", stacklevel=2)
    packed = pack_sequences(encs, rl, row_multiple=_row_multiple_for(rl))
    return jnp.asarray(packed.ids.astype(np.int8))


def tokenize_packed_rows_sharded(tokenizer: EsmTokenizer, seqs: list[str],
                                 n_shards: int,
                                 row_len: int | None = None) -> jnp.ndarray:
    """Single-side packed wire dealt over a data mesh: int8
    (n_shards * r_max, L) rows, shard-major.

    MLM is per-token (no pairing), so unlike ``tokenize_packed_sharded``
    shards need neither equal sequence counts nor owner maps — sequences
    deal longest-first into the least-loaded shard (token balance), each
    shard packs independently, and short shards pad with all-<pad> rows to
    a common r_max (those rows derive segment id 0 everywhere: zero
    attention, zero maskable tokens, zero loss terms). Leading axis shards
    over 'data' (parallel/mlm_step.make_sharded_packed_mlm_train_step)."""
    encs = [tokenizer.encode(s) for s in seqs]
    rl = _row_len_for(max(len(e) for e in encs), row_len)
    clamped = 0
    for j, e in enumerate(encs):
        if len(e) > rl:
            encs[j] = np.concatenate((e[: rl - 1], [EOS_ID]))
            clamped += 1
    if clamped:
        warnings.warn(
            f"tokenize_packed_rows_sharded: {clamped} sequence(s) longer "
            f"than row_len={rl} were truncated (eos kept)", stacklevel=2)
    order = sorted(range(len(encs)), key=lambda i: -len(encs[i]))
    members: list[list[int]] = [[] for _ in range(n_shards)]
    load = [0] * n_shards
    for i in order:
        s = int(np.argmin(load))
        members[s].append(i)
        load[s] += len(encs[i])
    packs = [pack_sequences([encs[i] for i in m], rl, row_multiple=1).ids
             if m else np.full((0, rl), PAD_ID) for m in members]
    r_max = -(-max(max(p.shape[0] for p in packs), 1) // 8) * 8
    ids = np.full((n_shards, r_max, rl), PAD_ID, np.int8)
    for s, p in enumerate(packs):
        ids[s, : p.shape[0]] = p.astype(np.int8)
    return jnp.asarray(ids.reshape(n_shards * r_max, rl))


def _expand_pack(ids8: jnp.ndarray, operm: jnp.ndarray,
                 dump: int) -> dict[str, jnp.ndarray]:
    """Derive int32 ids + segment/position/owner maps for one pack.

    ``dump`` is the owner sentinel for gap/pad tokens (the global sequence
    count — segment_sum routes those to a sliced-off extra slot). operm is
    kept in the result so an already-expanded pack still answers
    ``packed_side_count`` (re-feeding expanded batches is supported, like
    the flat path).
    """
    ids, seg, pos = derive_segments(ids8)
    valid = seg > 0
    n_local = operm.shape[0]
    counts = seg.max(axis=1)
    offsets = jnp.concatenate(
        (jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]))
    g = offsets[:, None] + seg - 1
    owner = jnp.where(valid, jnp.take(operm, jnp.clip(g, 0, n_local - 1)),
                      dump)
    # local_owner: the sequence's rank WITHIN this pack (scan order) —
    # the tier-local scatter target for block-assembled FILIP similarity
    # (tier t's operm maps local rank -> global batch index).
    local = jnp.where(valid, jnp.clip(g, 0, n_local - 1), n_local)
    return {"ids": ids, "seg": seg, "pos": pos, "owner": owner,
            "operm": operm, "local_owner": local}


def packed_side_count(batch, side: str) -> int:
    """Number of sequences a packed wire batch carries for one side.

    Tier packs pad their operm to a shape-stable multiple of 8, so the
    REAL count rides the ``nmark`` shape marker; flat packs carry an
    exact operm. Shape-only either way — safe at jit trace time."""
    if f"{side}_packs" in batch:
        return sum(p["nmark"].shape[0] if "nmark" in p
                   else p["operm"].shape[0]
                   for p in batch[f"{side}_packs"])
    return batch[f"{side}_operm"].shape[0]


def expand_packed_batch(batch: dict[str, jnp.ndarray]
                        ) -> dict[str, jnp.ndarray]:
    """Device-side: derive int32 ids + segment/position/owner maps from the
    compact packed wire format (flat or width-tiered).

    Contract (tokenizer + packer): every sequence starts with <cls>, gaps
    are trailing <pad> within each row, and segments sit contiguously in
    ascending segment order. So segment ids are a running <cls> count,
    positions restart at each <cls>, and the per-token owner is the owner
    permutation indexed by the global (row-major) segment number.
    """
    if "pep_seg" in batch or any(
            f"{s}_packs" in batch
            and batch[f"{s}_packs"] and "seg" in batch[f"{s}_packs"][0]
            for s in ("pep", "rec")):
        return batch  # already expanded (or round-1 fat format)
    out = dict(batch)
    for side in ("pep", "rec"):
        n_seqs = packed_side_count(batch, side)
        if f"{side}_packs" in batch:
            out[f"{side}_packs"] = tuple(
                ({**_expand_pack(p["ids"], p["operm"], n_seqs),
                  "nmark": p["nmark"]} if "nmark" in p
                 else _expand_pack(p["ids"], p["operm"], n_seqs))
                for p in batch[f"{side}_packs"])
        else:
            e = _expand_pack(batch[f"{side}_ids"], batch[f"{side}_operm"],
                             n_seqs)
            out[f"{side}_ids"] = e["ids"]
            out[f"{side}_seg"] = e["seg"]
            out[f"{side}_pos"] = e["pos"]
            out[f"{side}_owner"] = e["owner"]
    return out


def _encode_packed_chunked(esm_params, ids, seg, pos, cfg: esm2.ESM2Config,
                           rows_per_chunk: int, remat: bool):
    R, L = ids.shape
    n_chunks = max(1, R // rows_per_chunk)
    while R % n_chunks:  # largest chunk count that divides the row count
        n_chunks -= 1
    ids_c = ids.reshape(n_chunks, R // n_chunks, L)
    seg_c = seg.reshape(n_chunks, R // n_chunks, L)
    pos_c = pos.reshape(n_chunks, R // n_chunks, L)

    def body(_, x):
        i, s, p = x
        mask = (s > 0).astype(jnp.int32)
        h = esm2.forward(esm_params, i, mask, cfg, remat=remat,
                         segment_ids=s, positions=p)
        return None, h

    # PCT_SCAN_UNROLL: unrolls the chunk scan so XLA can overlap adjacent
    # chunks' prologue/epilogue (the trace attributes the residual gap to
    # scan/dispatch seams — docs/PERF.md)
    unroll = int(os.environ.get("PCT_SCAN_UNROLL", "1"))
    _, h = jax.lax.scan(body, None, (ids_c, seg_c, pos_c), unroll=unroll)
    return jax.lax.stop_gradient(h.reshape(R, L, -1))


def _token_sums(head_params, hidden, seg, owner, n_seqs: int, *,
                dropout_rate, train, rng, activation):
    """Per-token head on one pack -> per-sequence (sums, counts)."""
    proj = head_params["projection"]
    x = (jnp.einsum("rlh,hd->rld", hidden, proj["w"],
                    preferred_element_type=jnp.float32).astype(hidden.dtype)
         + proj["b"])
    x = heads.apply_ffn(head_params["aa_ffn"], x, dropout_rate=dropout_rate,
                        train=train, rng=rng, activation=activation)
    R, L, D = x.shape
    flat = x.reshape(R * L, D)
    flat_owner = owner.reshape(R * L)
    valid = (seg.reshape(R * L) > 0)[:, None].astype(flat.dtype)
    sums = jax.ops.segment_sum(flat * valid, flat_owner,
                               num_segments=n_seqs + 1)[:n_seqs]
    cnt = jax.ops.segment_sum(valid[:, 0], flat_owner,
                              num_segments=n_seqs + 1)[:n_seqs]
    return sums, cnt


def _finish_pool(head_params, sums, cnt, temperature, *, dropout_rate,
                 train, rng, activation):
    """Masked mean -> pooled FFN -> L2 normalize -> exp(t/2) scale."""
    pooled = sums / jnp.clip(cnt, 1.0, None)[:, None]
    pooled = heads.apply_ffn(head_params["emb_ffn"], pooled,
                             dropout_rate=dropout_rate, train=train, rng=rng,
                             activation=activation)
    normed = pooled * jax.lax.rsqrt(
        jnp.sum(jnp.square(pooled.astype(jnp.float32)), axis=-1,
                keepdims=True).astype(pooled.dtype)
        + jnp.finfo(jnp.float32).tiny)
    return normed * jnp.exp(temperature.astype(normed.dtype) / 2.0)


def _pool_packed(head_params, hidden, seg, owner, n_seqs: int, temperature,
                 *, dropout_rate, train, rng, activation):
    """Per-sequence scaled embeddings from packed hidden states."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    sums, cnt = _token_sums(head_params, hidden, seg, owner, n_seqs,
                            dropout_rate=dropout_rate, train=train, rng=r1,
                            activation=activation)
    return _finish_pool(head_params, sums, cnt, temperature,
                        dropout_rate=dropout_rate, train=train, rng=r2,
                        activation=activation)


def _pool_packs(head_params, h_list, packs, n_seqs: int, temperature, *,
                dropout_rate, train, rng, activation):
    """Tiered pooling: token sums accumulate across packs, then one finish.

    Equivalent to pooling a single flat pack holding the same sequences —
    the masked mean is over the union of each sequence's tokens, and every
    sequence lives in exactly one tier.
    """
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    sums = jnp.zeros((n_seqs, head_params["projection"]["w"].shape[1]),
                     h_list[0].dtype)
    cnt = jnp.zeros((n_seqs,), h_list[0].dtype)
    for k, (h, pk) in enumerate(zip(h_list, packs)):
        rk = jax.random.fold_in(r1, k) if r1 is not None else None
        s, c = _token_sums(head_params, h, pk["seg"], pk["owner"], n_seqs,
                           dropout_rate=dropout_rate, train=train, rng=rk,
                           activation=activation)
        sums = sums + s
        cnt = cnt + c
    return _finish_pool(head_params, sums, cnt, temperature,
                        dropout_rate=dropout_rate, train=train, rng=r2,
                        activation=activation)


def _default_rows_per_chunk(rows_per_chunk: int | None) -> int:
    # 16 re-measured best after the multi-row kernel (865 vs 849@8, 776@32
    # pairs/s); PCT_ROWS_PER_CHUNK is the sweep knob (docs/PERF.md).
    if rows_per_chunk is None:
        return int(os.environ.get("PCT_ROWS_PER_CHUNK", "16"))
    return rows_per_chunk


def _validate_packed_batch(batch, n_seqs: int | None) -> None:
    if not any(k in batch for k in ("pep_operm", "pep_seg", "pep_packs")):
        raise ValueError(
            "packed step needs tokenize_packed batches (cfg.packed=True "
            "pairs with the packed tokenizer; got a plain batch)")
    if n_seqs is not None and ("pep_operm" in batch or "pep_packs" in batch):
        for side in ("pep", "rec"):
            got = packed_side_count(batch, side)
            if got != n_seqs:
                raise ValueError(
                    f"packed batch has {got} {side} sequences but the step "
                    f"expects {n_seqs} (cfg.global_batch for training); "
                    f"segment_sum would silently drop or misroute "
                    f"embeddings")


def _packs_and_hidden(esm_params, batch, mcfg, rows_per_chunk: int,
                      remat: bool):
    """Expanded packs + chunk-scanned backbone hidden states, both sides.

    Returns (h_lists, pack_lists) indexed [pep, rec]; each element is a
    list over width tiers (length 1 for flat packing)."""
    batch = expand_packed_batch(batch)
    h_lists, pack_lists = [], []
    for side in ("pep", "rec"):
        if f"{side}_packs" in batch:
            packs = list(batch[f"{side}_packs"])
        else:
            packs = [{k: batch[f"{side}_{k}"]
                      for k in ("ids", "seg", "pos", "owner")}]
        # constant TOKENS per chunk across tiers: narrower rows take
        # proportionally more rows per chunk, keeping per-chunk matmul
        # shapes at the width the rows_per_chunk sweep tuned.
        l_max = max(p["ids"].shape[1] for p in packs)
        hs = [_encode_packed_chunked(
                  esm_params, p["ids"], p["seg"], p["pos"], mcfg.esm,
                  rows_per_chunk * (l_max // p["ids"].shape[1]),
                  remat).astype(jnp.float32)
              for p in packs]
        h_lists.append(hs)
        pack_lists.append(packs)
    return h_lists, pack_lists


def _pooled_sides(params, h_lists, pack_lists, n_seqs: int, mcfg, *,
                  train: bool, rng):
    """(pep_emb, rec_emb) from per-tier hidden states + packs."""
    rp = rr = None
    if rng is not None:
        rp, rr = jax.random.split(rng)
    sides = []
    for key, h_list, packs, r in (("pep", h_lists[0], pack_lists[0], rp),
                                  ("rec", h_lists[1], pack_lists[1], rr)):
        if len(h_list) == 1:
            emb = _pool_packed(
                params[key], h_list[0], packs[0]["seg"], packs[0]["owner"],
                n_seqs, params["temperature"], dropout_rate=mcfg.dropout,
                train=train, rng=r, activation=mcfg.activation)
        else:
            emb = _pool_packs(
                params[key], h_list, packs, n_seqs, params["temperature"],
                dropout_rate=mcfg.dropout, train=train, rng=r,
                activation=mcfg.activation)
        sides.append(emb)
    return tuple(sides)


def make_train_step_packed(cfg: EngineConfig,
                           optimizer: optax.GradientTransformation,
                           loss_fn: Callable | None = None,
                           rows_per_chunk: int | None = None):
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model
    n_seqs = cfg.global_batch

    def head_loss(params, h_lists, pack_lists, rng):
        pep, rec = _pooled_sides(params, h_lists, pack_lists, n_seqs, mcfg,
                                 train=True, rng=rng)
        return loss_fn(pep, rec)

    @jax.jit
    def step(params, opt_state, esm_params, batch, rng):
        _validate_packed_batch(batch, n_seqs)
        h_lists, pack_lists = _packs_and_hidden(esm_params, batch, mcfg,
                                                rows_per_chunk, cfg.remat)
        loss, grads = jax.value_and_grad(head_loss)(
            params, h_lists, pack_lists, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step_packed(cfg: EngineConfig,
                          loss_fn: Callable | None = None,
                          rows_per_chunk: int | None = None):
    """Packed eval step: the train step's batch assembly without grads or
    dropout. Batch size is inferred from the batch's own operm shapes (val
    loaders yield cfg.batch_size pairs, not the accumulated global batch),
    so one step function serves any packed batch size.

    Closes VERDICT r2 #3: eval previously tokenized single-bucket
    pad-to-longest and paid the full padding the train side eliminated."""
    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)

    @jax.jit
    def step(params, esm_params, batch):
        _validate_packed_batch(batch, None)
        n_seqs = packed_side_count(batch, "pep")
        h_lists, pack_lists = _packs_and_hidden(esm_params, batch, mcfg,
                                                rows_per_chunk, cfg.remat)
        pep, rec = _pooled_sides(params, h_lists, pack_lists, n_seqs, mcfg,
                                 train=False, rng=None)
        return loss_fn(pep, rec)

    return step


@functools.lru_cache(maxsize=None)
def _embed_packed_fn(mcfg, rows_per_chunk: int):
    """jit'd packed embedder SHARED across embed_packed calls (configs
    are frozen/hashable dataclasses). A fresh ``@jax.jit`` inside each
    call would be a new cache key — every call retraces (the serving
    retrace bug pattern, cli/embed._encode_fn)."""

    @jax.jit
    def run(params, esm_params, batch):
        n_seqs = packed_side_count(batch, "pep")
        h_lists, pack_lists = _packs_and_hidden(esm_params, batch, mcfg,
                                                rows_per_chunk, False)
        return _pooled_sides(params, h_lists, pack_lists, n_seqs, mcfg,
                             train=False, rng=None)

    return run


def embed_packed(params, esm_params, batch, mcfg,
                 rows_per_chunk: int | None = None):
    """(pep_emb, rec_emb) for a packed batch, inference mode — the packed
    fast path for eval/retrieval.encode_candidates. Embeddings come out in
    original pair order (owner maps carry global indices)."""
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    _validate_packed_batch(batch, None)
    return _embed_packed_fn(mcfg, rows_per_chunk)(params, esm_params, batch)
