"""Subprocess worker for tests/test_distributed.py.

Runs ONE real data-parallel CLIP train step as one rank of a 2-process
`jax.distributed` cluster (2 local fake CPU devices each -> a global
data=4 mesh, collectives over Gloo). Process 0 writes the loss and the
updated head params to an npz the test compares against the equivalent
single-process step — proving `parallel/distributed.py` + the shard_map
steps really run multi-controller SPMD, not just single-process SPMD.

Inputs are deterministic in the seed so both ranks build identical params;
batch rows are split so each process only ever materialises ITS OWN rows
(`jax.make_array_from_process_local_data`) — the negatives it sees from the
other process travel through the all_gather, as on a real pod.

Usage: python distributed_worker.py <pid> <nproc> <port> <out.npz> [mode]
mode: "plain" (default, unpacked DP step), "packed" (packed rows over
the same cross-process mesh via tokenize_packed_sharded — each rank
materialises only its own shards' rows), "finetune" (unfrozen two-pass
gradcache across the process boundary), "mlm" (masked-CE global mean
psum'd across processes), or "engine" (the CLI wiring itself:
MeshEngine.make_prepare's per-process make_array_from_process_local_data
placement + its train step).
"""

import os
import sys


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "plain"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from protein_clip_tpu.parallel import distributed

    distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)
    assert jax.process_index() == pid
    assert jax.local_device_count() == 2
    assert distributed.global_device_count() == 2 * nproc

    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.step import make_sharded_train_step
    from protein_clip_tpu.train import clip_engine
    from tests.distributed_case import (build_case, CASE_BATCH, CASE_SEED)

    mcfg, esm_params, params, batch = build_case()
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=4, num_chunks=4,
                                   remat=False, packed=(mode == "packed"))
    # sgd: scale-sensitive — an n_data-x gradient bug fails the test
    optimizer = optax.sgd(5e-2)
    opt0 = optimizer.init(params)

    mesh = mesh_mod.make_mesh(data=2 * nproc, model=1)
    n_shards = 2 * nproc
    if mode == "packed":
        from protein_clip_tpu.data.tokenizer import EsmTokenizer
        from protein_clip_tpu.parallel.packed_step import (
            make_sharded_packed_train_step, tokenize_packed_sharded)
        from tests.distributed_case import build_packed_pairs

        peps, recs = build_packed_pairs()
        wire = jax.tree.map(np.asarray, tokenize_packed_sharded(
            EsmTokenizer(), peps, recs, n_shards, pep_row_len=32,
            rec_row_len=64))
        local = 2  # shards owned by this process (2 local devices)
        gbatch = {}
        for k, v in wire.items():
            if k == "pair_shard_order":
                gbatch[k] = jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P()), v, v.shape)
            elif k.endswith("_ids"):
                r = v.shape[0] // n_shards  # shard-major rows
                sl = v[pid * local * r:(pid + 1) * local * r]
                gbatch[k] = jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P("data")), sl, v.shape)
            else:  # (n_shards, B_local) operms
                sl = v[pid * local:(pid + 1) * local]
                gbatch[k] = jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P("data")), sl, v.shape)
        step = make_sharded_packed_train_step(cfg, optimizer, mesh,
                                              rows_per_chunk=1)
    elif mode == "engine":
        # THE CLI WIRING: MeshEngine.make_prepare does the per-process
        # placement itself (engine._put_global) — no hand-rolled slicing
        # here, every process feeds the full host batch.
        from protein_clip_tpu.data.tokenizer import EsmTokenizer
        from protein_clip_tpu.parallel.engine import MeshEngine
        from tests.distributed_case import build_packed_pairs

        eng = MeshEngine(data=2 * nproc, arch="clip", mode="frozen")
        peps, recs = build_packed_pairs()
        gbatch = eng.make_prepare(cfg, EsmTokenizer())(peps, recs)
        step = eng.make_train_step(cfg, optimizer)
    elif mode == "mlm":
        from protein_clip_tpu.models import esm2 as esm2_mod
        from protein_clip_tpu.parallel.mlm_step import (
            make_sharded_mlm_train_step)

        lm_head = esm2_mod.init_lm_head(jax.random.key(3), mcfg.esm)
        params = lm_head
        opt0 = optimizer.init(lm_head)
        rows = CASE_BATCH // nproc
        sharding = NamedSharding(mesh, P("data"))
        gbatch = {
            k: jax.make_array_from_process_local_data(
                sharding, batch[k][pid * rows:(pid + 1) * rows],
                batch[k].shape)
            for k in ("pep_ids", "pep_mask")
        }
        _mstep = make_sharded_mlm_train_step(mcfg.esm, optimizer, mesh,
                                             mask_prob=0.3)
        step = lambda p, o, e, b, k: _mstep(p, o, e, b["pep_ids"],
                                            b["pep_mask"], k)
    elif mode == "finetune":
        from protein_clip_tpu.parallel.finetune_step import (
            make_sharded_finetune_step)
        from protein_clip_tpu.train import finetune

        params = finetune.init_params(esm_params, params)
        esm_params = {}
        opt0 = optimizer.init(params)
        rows = CASE_BATCH // nproc
        sharding = NamedSharding(mesh, P("data"))
        gbatch = {
            k: jax.make_array_from_process_local_data(
                sharding, v[pid * rows:(pid + 1) * rows], v.shape)
            for k, v in batch.items()
        }
        step = make_sharded_finetune_step(cfg, optimizer, mesh)
    else:
        rows = CASE_BATCH // nproc
        sharding = NamedSharding(mesh, P("data"))
        gbatch = {
            k: jax.make_array_from_process_local_data(
                sharding, v[pid * rows:(pid + 1) * rows], v.shape)
            for k, v in batch.items()
        }
        step = make_sharded_train_step(cfg, optimizer, mesh)
    # params/opt_state as host numpy: uncommitted inputs are treated as
    # replicated-and-identical across processes (they are, by construction)
    params_h = jax.tree.map(np.asarray, params)
    opt_h = jax.tree.map(np.asarray, opt0)

    p1, _, loss = step(params_h, opt_h, jax.tree.map(np.asarray, esm_params),
                       gbatch, jax.random.key(CASE_SEED))
    loss = float(loss)
    print(f"[rank {pid}] loss={loss:.6f}", flush=True)

    if pid == 0:
        from protein_clip_tpu.train.checkpoint import export_npz
        export_npz(out_path, {"params": jax.tree.map(np.asarray, p1),
                              "loss": np.float32(loss)})
    # Gloo barrier so rank 0 finishes writing before either rank exits
    import jax.experimental.multihost_utils as mh
    mh.sync_global_devices("done")


if __name__ == "__main__":
    main()
