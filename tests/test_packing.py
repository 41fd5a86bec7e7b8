"""Sequence packing: packed forward == unpacked forward, per sequence."""

import numpy as np
import jax
import jax.numpy as jnp

from protein_clip_tpu.data.packing import pack_sequences, segment_pool_matrix
from protein_clip_tpu.data.tokenizer import EsmTokenizer
from protein_clip_tpu.models import esm2, heads


def _sequences(rng, n=10, lo=5, hi=40):
    aas = list("LAGVSERTIDPKQNFYMHWC")
    return ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(lo, hi, n)]


def test_pack_shapes_and_mapping(rng):
    tok = EsmTokenizer()
    seqs = _sequences(rng, 12)
    encs = [tok.encode(s) for s in seqs]
    packed = pack_sequences(encs, row_len=64, row_multiple=4)
    R, L = packed.ids.shape
    assert L == 64 and R % 4 == 0
    assert R < 12  # actually packed (not one row per seq)
    # every sequence's tokens are intact at its slot
    for i, e in enumerate(encs):
        r, k = packed.owner_row[i], packed.owner_seg[i]
        at = packed.segment_ids[r] == k
        np.testing.assert_array_equal(packed.ids[r][at], e)
        np.testing.assert_array_equal(packed.positions[r][at],
                                      np.arange(len(e)))
    # selector sums to sequence lengths
    sel = segment_pool_matrix(packed)
    np.testing.assert_array_equal(sel.sum(axis=(1, 2)),
                                  [len(e) for e in encs])


def test_packed_hidden_matches_unpacked(rng):
    cfg = esm2.ESM2Config.tiny()
    params = esm2.init_params(jax.random.key(0), cfg)
    tok = EsmTokenizer()
    seqs = _sequences(rng, 8, lo=5, hi=25)
    encs = [tok.encode(s) for s in seqs]

    packed = pack_sequences(encs, row_len=64, row_multiple=1)
    mask = (packed.segment_ids > 0).astype(np.int32)
    h_packed = np.asarray(esm2.forward(
        params, jnp.asarray(packed.ids), jnp.asarray(mask), cfg,
        segment_ids=jnp.asarray(packed.segment_ids),
        positions=jnp.asarray(packed.positions)))

    for i, e in enumerate(encs):
        ids = jnp.asarray(e[None, :], jnp.int32)
        m = jnp.ones((1, len(e)), jnp.int32)
        h_solo = np.asarray(esm2.forward(params, ids, m, cfg))[0]
        r, k = packed.owner_row[i], packed.owner_seg[i]
        at = packed.segment_ids[r] == k
        np.testing.assert_allclose(h_packed[r][at], h_solo,
                                   atol=2e-5, rtol=2e-4)


def test_packed_pooled_embedding_matches_unpacked(rng):
    esm_cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    head = heads.init_head(jax.random.key(1), esm_cfg.hidden_size, 16, 2, 2)
    tok = EsmTokenizer()
    seqs = _sequences(rng, 6, lo=5, hi=25)
    encs = [tok.encode(s) for s in seqs]
    t = jnp.asarray(0.5)

    packed = pack_sequences(encs, row_len=64, row_multiple=1)
    mask = (packed.segment_ids > 0).astype(np.int32)
    hp = esm2.forward(esm_params, jnp.asarray(packed.ids), jnp.asarray(mask),
                      esm_cfg, segment_ids=jnp.asarray(packed.segment_ids),
                      positions=jnp.asarray(packed.positions))
    sel = jnp.asarray(segment_pool_matrix(packed))
    emb_packed = np.asarray(heads.encode_pooled_packed(
        head, hp, sel, t, train=False))

    for i, e in enumerate(encs):
        ids = jnp.asarray(e[None, :], jnp.int32)
        m = jnp.ones((1, len(e)), jnp.int32)
        h = esm2.forward(esm_params, ids, m, esm_cfg)
        emb = np.asarray(heads.encode_pooled(head, h, m, t, train=False))[0]
        np.testing.assert_allclose(emb_packed[i], emb, atol=1e-4, rtol=1e-3)


def test_row_len_overflow_raises(rng):
    tok = EsmTokenizer()
    encs = [tok.encode("A" * 100)]
    import pytest
    with pytest.raises(ValueError, match="longer than row_len"):
        pack_sequences(encs, row_len=64)


def test_expand_packed_batch_derives_exact_maps(rng):
    """Device-side derivation (compact int8 wire) == host packer maps."""
    from protein_clip_tpu.train.packed_engine import (expand_packed_batch,
                                                      tokenize_packed)

    tok = EsmTokenizer()
    peps = _sequences(rng, 12, lo=5, hi=15)
    recs = _sequences(rng, 12, lo=10, hi=50)
    batch = tokenize_packed(tok, peps, recs)
    assert batch["pep_ids"].dtype == jnp.int8  # compact on the wire
    expanded = jax.jit(expand_packed_batch)(batch)

    for side, seqs in (("pep", peps), ("rec", recs)):
        encs = [tok.encode(s) for s in seqs]
        row_len = expanded[f"{side}_ids"].shape[1]
        packed = pack_sequences(encs, row_len, row_multiple=16)
        n = packed.n_sequences
        owner = np.full(packed.ids.shape, n, np.int32)
        for i in range(n):
            r = packed.owner_row[i]
            owner[r][packed.segment_ids[r] == packed.owner_seg[i]] = i
        np.testing.assert_array_equal(expanded[f"{side}_ids"], packed.ids)
        np.testing.assert_array_equal(expanded[f"{side}_seg"],
                                      packed.segment_ids)
        np.testing.assert_array_equal(expanded[f"{side}_pos"],
                                      packed.positions)
        np.testing.assert_array_equal(expanded[f"{side}_owner"], owner)


def test_packed_long_sequences_not_truncated(rng):
    """2000-residue chains (the reference's ingest cap) must pack losslessly:
    round 1 hardcoded rec_row_len=512 and silently clamped them."""
    from protein_clip_tpu.train.packed_engine import (expand_packed_batch,
                                                      tokenize_packed)

    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = _sequences(rng, 4, lo=5, hi=15)
    recs = ["".join(rng.choice(aas, L)) for L in (2000, 1500, 300, 100)]
    batch = expand_packed_batch(tokenize_packed(tok, peps, recs))
    assert batch["rec_ids"].shape[1] == 2048  # 2002 tokens -> 2048 bucket
    # every receptor's tokens are intact somewhere in the packed rows
    seg, ids, owner = (np.asarray(batch["rec_seg"]),
                       np.asarray(batch["rec_ids"]),
                       np.asarray(batch["rec_owner"]))
    for i, s in enumerate(recs):
        at = owner == i
        np.testing.assert_array_equal(ids[at], tok.encode(s))


def test_packed_step_rejects_wrong_batch_size(rng):
    import optax
    from protein_clip_tpu.models import clip
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train.packed_engine import (
        make_train_step_packed, tokenize_packed)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    step = make_train_step_packed(cfg, optimizer, rows_per_chunk=1)
    tok = EsmTokenizer()
    bad = tokenize_packed(tok, _sequences(rng, 6), _sequences(rng, 6))
    import pytest
    with pytest.raises(ValueError, match="global_batch"):
        step(params, opt0, esm_params, bad, jax.random.key(2))


def test_tiered_packed_wire_intact(rng):
    """tiers>1: every sequence's tokens are intact in exactly one tier, and
    owner maps carry GLOBAL batch indices."""
    from protein_clip_tpu.train.packed_engine import (expand_packed_batch,
                                                      tokenize_packed)

    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    # A longtail mix the width DP genuinely splits (many shorts + a sparse
    # near-cap tail): narrow profiles now correctly collapse to ONE flat
    # tier (_tier_widths_data prices real fill, and 16-row minimums beat
    # any split below ~512-wide rows), so multi-tier asserts need skew.
    rec_lens = [100] * 48 + [1950] * 8
    peps = _sequences(rng, len(rec_lens), lo=5, hi=15)
    recs = ["".join(rng.choice(aas, L)) for L in rec_lens]
    from protein_clip_tpu.train.packed_engine import clear_tier_width_cache
    clear_tier_width_cache()  # widths are sticky per process
    batch = tokenize_packed(tok, peps, recs, tiers=4)
    assert "rec_packs" in batch  # the 100aa bulk rides a narrow tier
    widths = {p["ids"].shape[1] for p in batch["rec_packs"]}
    assert len(widths) > 1
    expanded = jax.jit(expand_packed_batch)(batch)
    found = np.zeros(len(recs), bool)
    for pk in expanded["rec_packs"]:
        ids, owner = np.asarray(pk["ids"]), np.asarray(pk["owner"])
        for i, s in enumerate(recs):
            at = owner == i
            if at.any():
                assert not found[i]
                found[i] = True
                np.testing.assert_array_equal(ids[at], tok.encode(s))
    assert found.all()


def test_tiered_packed_step_matches_flat(rng):
    """Tiered packed step == flat packed step == plain step (dropout off)."""
    import optax
    from protein_clip_tpu.models import clip
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train.packed_engine import (
        make_train_step_packed, tokenize_packed)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = _sequences(rng, 8, lo=5, hi=15)
    recs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(10, 250, 8)]
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    step = make_train_step_packed(cfg, optimizer, rows_per_chunk=1)

    flat = tokenize_packed(tok, peps, recs, rec_row_len=256)
    p1, _, l1 = step(params, opt0, esm_params, flat, jax.random.key(2))

    # explicit widths: the data-aware DP correctly refuses to split 8
    # narrow sequences, and parity must hold on the multi-tier wire
    tiered = tokenize_packed(tok, peps, recs, rec_row_len=256,
                             tier_widths=[128, 256])
    assert "rec_packs" in tiered
    p2, _, l2 = step(params, opt0, esm_params, tiered, jax.random.key(2))

    plain = clip_engine.make_train_step(cfg, optimizer)
    b = clip_engine.tokenize_pair_batch(tok, peps, recs)
    _, _, l3 = plain(params, opt0, esm_params, b, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_packed_train_step_matches_plain(rng):
    """Packed step loss == plain step loss on the same pairs (dropout off)."""
    import optax
    from protein_clip_tpu.models import clip
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train.packed_engine import (
        make_train_step_packed, tokenize_packed)

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    tok = EsmTokenizer()
    peps = _sequences(rng, 8, lo=5, hi=15)
    recs = _sequences(rng, 8, lo=10, hi=50)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)

    plain = clip_engine.make_train_step(cfg, optimizer)
    b = clip_engine.tokenize_pair_batch(tok, peps, recs)
    p1, _, l1 = plain(params, opt0, esm_params, b, jax.random.key(2))

    packed_step = make_train_step_packed(cfg, optimizer, rows_per_chunk=1)
    pb = tokenize_packed(tok, peps, recs, pep_row_len=32, rec_row_len=64)
    p2, _, l2 = packed_step(params, opt0, esm_params, pb, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_tiered_explicit_odd_row_len(rng):
    """Explicit row_len that is not a 128-multiple: every sequence fitting
    the row must fit a tier (row_len itself is always a tier width)."""
    from protein_clip_tpu.train.packed_engine import (_tier_widths,
                                                      tokenize_packed)

    assert _tier_widths(300)[-1] == 300
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = _sequences(rng, 4, lo=5, hi=15)
    recs = ["".join(rng.choice(aas, L)) for L in (280, 120, 60, 30)]
    batch = tokenize_packed(tok, peps, recs, rec_row_len=300, tiers=4)
    # the 280-residue chain (282 tokens) rides the 300-wide tier intact
    from protein_clip_tpu.train.packed_engine import expand_packed_batch
    expanded = expand_packed_batch(batch)
    packs = (expanded["rec_packs"] if "rec_packs" in expanded
             else [{k: expanded[f"rec_{k}"]
                    for k in ("ids", "owner")}])
    found = False
    for pk in packs:
        at = np.asarray(pk["owner"]) == 0
        if at.any():
            np.testing.assert_array_equal(np.asarray(pk["ids"])[at],
                                          tok.encode(recs[0]))
            found = True
    assert found


def test_tier_count_honored(rng):
    """--pack-tiers/--scatter-tiers N must produce AT MOST N width tiers
    (the integer was previously dead beyond the >1 test)."""
    from protein_clip_tpu.train.packed_engine import (_tier_widths,
                                                      tokenize_packed)

    assert _tier_widths(2048, 2) == [1024, 2048]
    assert _tier_widths(2048, 4) == [512, 1024, 1536, 2048]
    assert len(_tier_widths(2048, 8)) <= 8

    from protein_clip_tpu.train.packed_engine import _tier_widths_data
    lens = [100] * 48 + [1950] * 8
    assert len(_tier_widths_data(lens, 2048, 2)) <= 2
    assert len(_tier_widths_data(lens, 2048, 4)) <= 4
    assert _tier_widths_data(lens, 2048, 4)[-1] >= 1950

    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    rec_lens = [100] * 48 + [1950] * 8
    peps = _sequences(rng, len(rec_lens), lo=5, hi=15)
    recs = ["".join(rng.choice(aas, L)) for L in rec_lens]
    from protein_clip_tpu.train.packed_engine import clear_tier_width_cache
    clear_tier_width_cache()
    b2 = tokenize_packed(tok, peps, recs, tiers=2)
    assert len(b2.get("rec_packs", ("flat",))) <= 2
    srecs = ["".join(rng.choice(aas, L))
             for L in (30, 120, 250, 380, 30, 120, 250, 380)]
    s2 = tokenize_packed(tok, peps[:8], srecs, rec_row_len=512,
                         scatter_tiers=2)
    assert len(s2["rec_stiers"]) <= 2
    widths2 = [t["wmark"].shape[0] for t in s2["rec_stiers"]]
    assert set(widths2) <= {256, 512}


def test_lora_default_alpha_consistent(monkeypatch):
    """PCT_LORA_ALPHA must reach every merge site through the same
    resolver — eval/viz consumers previously hardcoded 2*rank while the
    train step honored the env var."""
    from protein_clip_tpu.train import lora as lora_mod

    assert lora_mod.default_alpha(8) == 16.0
    monkeypatch.setenv("PCT_LORA_ALPHA", "32")
    assert lora_mod.default_alpha(8) == 32.0
    params = {"lora": {"attn/q": {"a": jnp.zeros((1, 4, 8))}}}
    assert lora_mod._resolve_alpha(params, None) == 32.0
    assert lora_mod._resolve_alpha(params, 4.0) == 4.0


def test_expanded_tiered_batch_refeeds(rng):
    """expand_packed_batch output (tiered) must pass the packed step's
    validation and expand idempotently — matching the flat path."""
    import optax
    from protein_clip_tpu.models import clip
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train.packed_engine import (
        expand_packed_batch, make_train_step_packed, packed_side_count,
        tokenize_packed)

    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    peps = _sequences(rng, 8, lo=5, hi=15)
    recs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(10, 250, 8)]
    batch = tokenize_packed(tok, peps, recs, rec_row_len=256, tiers=4)
    expanded = expand_packed_batch(batch)
    assert packed_side_count(expanded, "rec") == 8
    again = expand_packed_batch(expanded)
    assert again is expanded or jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), again, expanded))

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    optimizer = optax.adam(1e-3)
    step = make_train_step_packed(cfg, optimizer, rows_per_chunk=1)
    _, _, l1 = step(params, optimizer.init(params), esm_params, batch,
                    jax.random.key(2))
    _, _, l2 = step(params, optimizer.init(params), esm_params, expanded,
                    jax.random.key(2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
