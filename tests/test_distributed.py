"""Multi-PROCESS execution: 2-rank `jax.distributed` CPU cluster.

The rest of the suite fakes multi-chip with 8 local devices in ONE process;
this test launches two separate Python processes (2 local devices each)
that join a coordinator on localhost, form a global data=4 mesh, and run
ONE real sharded DP train step with Gloo cross-process collectives — each
rank holds only its own batch rows, so the InfoNCE negatives from the other
rank genuinely cross the process boundary through the all_gather. Loss and
SGD-updated params must equal the single-process computation at the same
global batch (SGD: an n_data-times gradient-scale bug fails here).

This is the comm-backend row of SURVEY §2.3 actually executing
(`parallel/distributed.py` was previously never called by any test).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import optax
import pytest
import jax

pytestmark = pytest.mark.slow  # 2-process jax.distributed integration; full-suite tier

from protein_clip_tpu.train import clip_engine

from tests.distributed_case import CASE_SEED, build_case

_WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, mode: str):
    port = _free_port()
    out = tmp_path / f"rank0_{mode}.npz"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(_WORKER.parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(pid), "2", str(port),
             str(out), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-3000:]}"
    assert out.exists(), outputs[0][-2000:]
    return out


def test_two_process_dp_step_matches_single_process(tmp_path):
    out = _run_workers(tmp_path, "plain")

    # single-process oracle at the same global batch (this process runs on
    # the suite's 8 fake devices; plain single-device engine step)
    mcfg, esm_params, params, batch = build_case()
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=4, num_chunks=4,
                                   remat=False)
    optimizer = optax.sgd(5e-2)
    step = clip_engine.make_train_step(cfg, optimizer)
    p1, _, loss1 = step(params, optimizer.init(params), esm_params, batch,
                        jax.random.key(CASE_SEED))

    from protein_clip_tpu.train.checkpoint import load_npz
    got = load_npz(out, {"params": jax.tree.map(np.asarray, p1),
                         "loss": np.float32(0)})
    np.testing.assert_allclose(float(got["loss"]), float(loss1), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(got["params"]), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_two_process_packed_dp_step_matches_single_process(tmp_path):
    """The PACKED production path across a real process boundary: two
    jax.distributed ranks each materialise only their own shards' packed
    rows (tokenize_packed_sharded wire), negatives cross processes
    through the all_gather, and the SGD-updated params must match the
    single-process packed step on the same pairs."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.train.packed_engine import (make_train_step_packed,
                                                      tokenize_packed)
    from tests.distributed_case import build_packed_pairs

    out = _run_workers(tmp_path, "packed")

    mcfg, esm_params, params, _ = build_case()
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=4, remat=False,
                                   packed=True)
    optimizer = optax.sgd(5e-2)
    peps, recs = build_packed_pairs()
    sb = tokenize_packed(EsmTokenizer(), peps, recs, pep_row_len=32,
                         rec_row_len=64)
    step = make_train_step_packed(cfg, optimizer, rows_per_chunk=1)
    p1, _, loss1 = step(params, optimizer.init(params), esm_params, sb,
                        jax.random.key(CASE_SEED))

    from protein_clip_tpu.train.checkpoint import load_npz
    got = load_npz(out, {"params": jax.tree.map(np.asarray, p1),
                         "loss": np.float32(0)})
    np.testing.assert_allclose(float(got["loss"]), float(loss1), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(got["params"]), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_two_process_finetune_step_matches_single_process(tmp_path):
    """UNFROZEN two-pass gradcache across a real process boundary: embedding
    cotangents from the cross-process all_gather must flow back into each
    rank's local backbone replay (VERDICT r4 #3 'finetune case')."""
    from protein_clip_tpu.train import finetune

    out = _run_workers(tmp_path, "finetune")

    mcfg, esm_params, heads, batch = build_case()
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=4, num_chunks=4,
                                   remat=False)
    optimizer = optax.sgd(5e-2)
    params = finetune.init_params(esm_params, heads)
    p1, _, loss1 = finetune.make_train_step(cfg, optimizer)(
        params, optimizer.init(params), {}, batch, jax.random.key(CASE_SEED))

    from protein_clip_tpu.train.checkpoint import load_npz
    got = load_npz(out, {"params": jax.tree.map(np.asarray, p1),
                         "loss": np.float32(0)})
    np.testing.assert_allclose(float(got["loss"]), float(loss1), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(got["params"]), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_two_process_mlm_step_matches_single_process(tmp_path):
    """Masked-CE (sum, count) psum across processes: the 2-rank global-mean
    loss and LM-head update equal the same data=4 mesh computed locally
    (identical fold_in(axis_index) masks by construction)."""
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.mlm_step import make_sharded_mlm_train_step

    out = _run_workers(tmp_path, "mlm")

    mcfg, esm_params, _, batch = build_case()
    lm_head = esm2.init_lm_head(jax.random.key(3), mcfg.esm)
    optimizer = optax.sgd(5e-2)
    mesh = mesh_mod.make_mesh(data=4, model=1)
    step = make_sharded_mlm_train_step(mcfg.esm, optimizer, mesh,
                                       mask_prob=0.3)
    h1, _, loss1 = step(lm_head, optimizer.init(lm_head), esm_params,
                        batch["pep_ids"], batch["pep_mask"],
                        jax.random.key(CASE_SEED))

    from protein_clip_tpu.train.checkpoint import load_npz
    got = load_npz(out, {"params": jax.tree.map(np.asarray, h1),
                         "loss": np.float32(0)})
    np.testing.assert_allclose(float(got["loss"]), float(loss1), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(got["params"]), jax.tree.leaves(h1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_two_process_engine_prepare_matches_single_process(tmp_path):
    """The CLI wiring itself across processes: MeshEngine.make_prepare
    places each rank's slice via make_array_from_process_local_data from
    the SAME full host batch (engine._put_global) — updated params must
    match the single-device engine step on those pairs."""
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from tests.distributed_case import build_packed_pairs

    out = _run_workers(tmp_path, "engine")

    mcfg, esm_params, params, _ = build_case()
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=4, num_chunks=4,
                                   remat=False)
    optimizer = optax.sgd(5e-2)
    peps, recs = build_packed_pairs()
    batch = clip_engine.tokenize_pair_batch(EsmTokenizer(), peps, recs)
    p1, _, loss1 = clip_engine.make_train_step(cfg, optimizer)(
        params, optimizer.init(params), esm_params, batch,
        jax.random.key(CASE_SEED))

    from protein_clip_tpu.train.checkpoint import load_npz
    got = load_npz(out, {"params": jax.tree.map(np.asarray, p1),
                         "loss": np.float32(0)})
    np.testing.assert_allclose(float(got["loss"]), float(loss1), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(got["params"]), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
