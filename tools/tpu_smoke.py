"""TPU hardware smoke: compiled-kernel and engine-path checks the CPU test
suite can't cover (tests/ run on the fake-device CPU mesh; Mosaic tiling
issues only surface when actually compiled).

Run on a TPU host: python tools/tpu_smoke.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from protein_clip_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    assert jax.default_backend() == "tpu", jax.devices()
    rng = np.random.default_rng(0)
    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"[ok] {name} ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: {type(e).__name__} {str(e)[:200]}")

    # fused InfoNCE at reference batch and at odd batch sizes
    def infonce_shapes():
        from protein_clip_tpu.ops.infonce import clip_infonce
        from protein_clip_tpu.ops.infonce_pallas import fused_infonce
        for B, D in [(256, 128), (10, 128), (16, 32)]:
            x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
            y = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
            got = float(jax.jit(fused_infonce)(x, y))
            ref = float(clip_infonce(x, y))
            # rel tolerance: padded-tile f32 reassociation at odd B
            assert abs(got - ref) < 1e-3 * max(abs(ref), 1.0), (B, D, got,
                                                                ref)
            gx, _ = jax.grad(lambda a, b: fused_infonce(a, b),
                             argnums=(0, 1))(x, y)
            assert np.isfinite(np.asarray(gx)).all()

    check("fused_infonce odd shapes", infonce_shapes)

    # tiled InfoNCE for big negative pools (compiled grid + scratch
    # accumulation; interpret-mode tests can't catch Mosaic rejections)
    def infonce_tiled():
        from protein_clip_tpu.ops.infonce import clip_infonce
        from protein_clip_tpu.ops.infonce_pallas import fused_infonce_tiled
        # 4096 is the default_loss_fn dispatch cap (clip_engine) — this
        # sweep is the compile-proof for every pool size the cap admits
        for B, D in [(1024, 128), (2048, 128), (4096, 128)]:
            x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
            y = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
            got = float(jax.jit(fused_infonce_tiled)(x, y))
            ref = float(clip_infonce(x, y))
            assert abs(got - ref) < 1e-3 * max(abs(ref), 1.0), (B, got, ref)
            gx, gy = jax.grad(lambda a, b: fused_infonce_tiled(a, b),
                              argnums=(0, 1))(x, y)
            rx, ry = jax.grad(lambda a, b: clip_infonce(a, b),
                              argnums=(0, 1))(x, y)
            np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                       atol=5e-5, rtol=1e-2)
            np.testing.assert_allclose(np.asarray(gy), np.asarray(ry),
                                       atol=5e-5, rtol=1e-2)

    check("fused_infonce_tiled big pools", infonce_tiled)

    # FILIP kernel at the reference FILIP batch (10) and mixed buckets
    def filip_shapes():
        from protein_clip_tpu.models.filip import filip_similarity
        from protein_clip_tpu.ops.filip_pallas import filip_similarity_fused
        for B, TA, TB in [(10, 64, 320), (16, 32, 512), (12, 192, 192)]:
            ha = rng.normal(size=(B, TA, 128)).astype(np.float32)
            hb = rng.normal(size=(B, TB, 128)).astype(np.float32)
            ha /= np.linalg.norm(ha, axis=-1, keepdims=True)
            hb /= np.linalg.norm(hb, axis=-1, keepdims=True)
            ma = np.ones((B, TA), np.int32); ma[0, TA // 2:] = 0
            mb = np.ones((B, TB), np.int32); mb[-1, 5:] = 0
            t = jnp.asarray(1.0)
            got = jax.jit(lambda *a: filip_similarity_fused(*a, t))(
                jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma),
                jnp.asarray(mb))
            ref = filip_similarity(jnp.asarray(ha), jnp.asarray(hb),
                                   jnp.asarray(ma), jnp.asarray(mb), t)
            for gm, rm in zip(got, ref):
                d = float(jnp.abs(gm - rm).max())
                assert d < 1e-5, (B, TA, TB, d)

    check("filip kernel odd shapes", filip_shapes)

    # fused attention kernel compiled (gated off by default, still must work)
    def fused_attention():
        from protein_clip_tpu.ops.attention_pallas import (
            _eager_reference, fused_attention)
        # realistic scaling: q carries dh^-0.5 (logits ~N(0,1)); unscaled
        # logits (+-30) amplify near-tie softmax sensitivity in BOTH paths.
        # Shapes sweep the rows-per-program chooser: rpp=4/8/16 at small T,
        # rpp=2 at T=2048, rpp=1 fallback on odd batch counts.
        for B, T in [(4, 256), (16, 512), (16, 128), (3, 512), (4, 2048),
                     (8, 448)]:
            q = jnp.asarray(
                rng.normal(size=(B, T, 20, 32)).astype(np.float32)
            ) * (32 ** -0.5)
            k = jnp.asarray(
                rng.normal(size=(B, T, 20, 32)).astype(np.float32))
            v = jnp.asarray(
                rng.normal(size=(B, T, 20, 32)).astype(np.float32))
            m = np.ones((B, T), np.int32); m[1 % B, T // 3:] = 0
            got = jax.jit(fused_attention)(q, k, v, jnp.asarray(m))
            ref = _eager_reference(q, k, v, jnp.asarray(m))
            mb = np.asarray(m).astype(bool)
            d = float(jnp.abs(got - ref)[mb].max())
            # TPU f32 matmuls run bf16-pass by default in BOTH paths but
            # with different contraction orders — observed drift up to
            # ~1.3e-3; exactness is pinned by the CPU interpret tests
            # (tests/test_pallas_attention.py, atol 1e-5)
            assert d < 3e-3, (B, T, d)

    check("fused attention kernel", fused_attention)

    # flash-style attention BACKWARD compiled at both q-block regimes +
    # packed segments (the unfrozen-encoder path's kernel)
    def fused_attention_bwd():
        from protein_clip_tpu.ops.attention_pallas import (
            _eager_reference, fused_attention)
        for B, T, packed in [(4, 256, False), (2, 512, False),
                             (2, 2048, False), (2, 512, True)]:
            q = jnp.asarray(
                rng.normal(size=(B, T, 20, 32)).astype(np.float32)
            ) * (32 ** -0.5)
            k = jnp.asarray(
                rng.normal(size=(B, T, 20, 32)).astype(np.float32))
            v = jnp.asarray(
                rng.normal(size=(B, T, 20, 32)).astype(np.float32))
            if packed:
                m = np.zeros((B, T), np.int32)
                m[:, : T // 3] = 1
                m[:, T // 3: 2 * T // 3] = 2
            else:
                m = np.ones((B, T), np.int32)
                m[1 % B, T // 3:] = 0
            seg = jnp.asarray(m)

            def loss(f, q_, k_, v_):
                return jnp.sum(f(q_, k_, v_, seg) ** 2)

            got = jax.jit(jax.grad(functools.partial(loss, fused_attention),
                                   argnums=(0, 1, 2)))(q, k, v)
            ref = jax.grad(functools.partial(loss, _eager_reference),
                           argnums=(0, 1, 2))(q, k, v)
            for name, gm, rm in zip("qkv", got, ref):
                d = float(jnp.abs(gm - rm).max())
                # bf16-pass matmul drift amplifies through the grad chain
                # (observed ~3e-3); grad exactness is pinned by the CPU
                # interpret tests (atol 1e-4) — this is a compile+sanity
                # check on real hardware
                assert d < 2e-2, (B, T, packed, name, d)

    check("fused attention backward", fused_attention_bwd)

    # FILIP train step at reference batch 10 with the fused kernel
    def filip_engine_step():
        from protein_clip_tpu.models import esm2, filip
        from protein_clip_tpu.train import clip_engine, filip_engine
        from protein_clip_tpu.train import optimizer as opt_mod
        esm_cfg = esm2.ESM2Config.t6_8M(compute_dtype=jnp.bfloat16)
        mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size,
                                 embedding_dim=128, esm=esm_cfg)
        esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                      dtype=jnp.bfloat16)
        params = filip.init_params(jax.random.key(1), mcfg)
        cfg = clip_engine.EngineConfig(model=mcfg, batch_size=10,
                                       accumulated_batches=1, num_chunks=1)
        optimizer = opt_mod.adam(1e-3)
        step = filip_engine.make_train_step(cfg, optimizer)
        from protein_clip_tpu.data.tokenizer import EsmTokenizer
        tok = EsmTokenizer()
        aas = list("LAGVSERTIDPKQNFYMHWC")
        batch = clip_engine.tokenize_pair_batch(
            tok,
            ["".join(rng.choice(aas, rng.integers(20, 60)))
             for _ in range(10)],
            ["".join(rng.choice(aas, rng.integers(100, 400)))
             for _ in range(10)])
        p, o, l = step(params, optimizer.init(params), esm_params, batch,
                       jax.random.key(2))
        assert np.isfinite(float(l))

    check("FILIP engine step (bs 10, fused kernel)", filip_engine_step)

    def tiered_packed_step():
        """Width-tiered packed CLIP step compiles + runs on TPU (the CPU
        tests cover parity; this covers Mosaic at narrow row widths)."""
        from protein_clip_tpu.data.tokenizer import EsmTokenizer
        from protein_clip_tpu.models import clip, esm2
        from protein_clip_tpu.train import clip_engine, optimizer as opt_mod
        from protein_clip_tpu.train.packed_engine import (
            make_train_step_packed, tokenize_packed)

        esm_cfg = esm2.ESM2Config.t6_8M(compute_dtype=jnp.bfloat16)
        mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
        esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                      dtype=jnp.bfloat16)
        params = clip.init_params(jax.random.key(1), mcfg)
        cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                       accumulated_batches=2, num_chunks=2)
        optimizer = opt_mod.adam(1e-3)
        step = make_train_step_packed(cfg, optimizer)
        tok = EsmTokenizer()
        aas = list("LAGVSERTIDPKQNFYMHWC")
        peps = ["".join(rng.choice(aas, rng.integers(8, 30)))
                for _ in range(32)]
        recs = ["".join(rng.choice(aas, int(L)))
                for L in rng.integers(100, 500, 32)]
        batch = tokenize_packed(tok, peps, recs, tiers=4)
        assert "rec_packs" in batch
        _, _, l = step(params, optimizer.init(params), esm_params, batch,
                       jax.random.key(3))
        assert np.isfinite(float(l))

    check("tiered packed CLIP step (4 width tiers)", tiered_packed_step)

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nTPU SMOKE OK")


if __name__ == "__main__":
    main()
