"""Flagship CLIs on the 8-fake-CPU mesh: --dp/--tp/--pp reproduce
single-device losses at equal global batch (VERDICT r3 #1 'done' bar).

Dropout is 0 in every run (the sharded steps fold the shard index into the
dropout keys, so masks differ by construction); losses then agree up to
f32 reduction order / host pair-dealing permutations.
"""

import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # mesh CLI runs on 8 fake devices; full-suite tier

TINY = ["--esm-config", "tiny", "--esm-dtype", "float32",
        "--dropout", "0.0"]
RUN = ["--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
       "--num-chunks", "2", "--length-groups", "1",
       "--synthetic-fixture", "--data-dir", "data",
       "--fixture-families", "40"]
FILIP_RUN = ["--epochs", "1", "--batch-size", "4", "--num-chunks", "1",
             "--synthetic-fixture", "--data-dir", "data",
             "--fixture-families", "40"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("climesh")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


def _losses(extra, entry="clip"):
    """Run an entry, return (train_losses, val_losses) from its CSV."""
    if entry == "clip":
        from protein_clip_tpu.cli.main_2protein import main
        rc = main(TINY + RUN + extra)
    else:
        from protein_clip_tpu.cli.main_2protein_filip import main
        rc = main(TINY + FILIP_RUN + extra)
    assert rc == 0
    run = sorted(Path("runs").iterdir())[-1]
    rows = (run / "losses_per_epoch.txt").read_text().strip().split("\n")[1:]
    tr = [float(r.split(",")[1]) for r in rows]
    va = [float(r.split(",")[2]) for r in rows]
    assert all(np.isfinite(v) for v in tr + va)
    return np.asarray(tr), np.asarray(va)


@pytest.fixture(scope="module")
def clip_baseline(workdir):
    return _losses([])


@pytest.fixture(scope="module")
def filip_baseline(workdir):
    return _losses([], entry="filip")


def _assert_close(got, want, rtol=2e-3):
    np.testing.assert_allclose(got[0], want[0], rtol=rtol)
    np.testing.assert_allclose(got[1], want[1], rtol=rtol)


def test_clip_dp(workdir, clip_baseline):
    _assert_close(_losses(["--dp", "2"]), clip_baseline)


def test_clip_dp_packed(workdir, clip_baseline):
    # packed engine is loss-exact vs unpacked (segment masking), so the
    # unpacked baseline doubles as the packed one
    _assert_close(_losses(["--dp", "2", "--packed"]), clip_baseline)


def test_clip_dp_tp(workdir, clip_baseline):
    _assert_close(_losses(["--dp", "2", "--tp", "2"]), clip_baseline)


def test_clip_pp(workdir, clip_baseline):
    _assert_close(_losses(["--pp", "2"]), clip_baseline)


def test_clip_dp_pp(workdir, clip_baseline):
    _assert_close(_losses(["--dp", "2", "--pp", "2"]), clip_baseline)


def test_clip_finetune_dp(workdir):
    base = _losses(["--finetune"])
    _assert_close(_losses(["--finetune", "--dp", "2"]), base)


def test_clip_lora_dp(workdir):
    base = _losses(["--lora-rank", "2"])
    _assert_close(_losses(["--lora-rank", "2", "--dp", "2"]), base)


def test_clip_dp_auto(workdir):
    # --dp 0 resolves to every device not claimed by tp/pp (8 here);
    # batch 8 needs a val split of >= 8 pairs, hence the bigger fixture
    big = ["--batch-size", "8", "--accumulated-batches", "1",
           "--data-dir", "data_auto", "--fixture-families", "80"]
    _assert_close(_losses(["--dp", "0"] + big), _losses(big))


def test_clip_mesh_rejects_no_gradcache(workdir):
    from protein_clip_tpu.cli.main_2protein import main
    with pytest.raises(SystemExit):
        main(TINY + RUN + ["--dp", "2", "--no-gradcache"])


def test_clip_mesh_rejects_packed_tp(workdir):
    from protein_clip_tpu.cli.main_2protein import main
    with pytest.raises(SystemExit):
        main(TINY + RUN + ["--dp", "2", "--tp", "2", "--packed"])


def test_filip_dp(workdir, filip_baseline):
    _assert_close(_losses(["--dp", "2"], entry="filip"), filip_baseline)


def test_filip_dp_packed(workdir, filip_baseline):
    # scatter-tiers auto-downgrade to flat under the mesh; packed FILIP is
    # loss-exact vs unpacked
    _assert_close(_losses(["--dp", "2", "--packed"], entry="filip"),
                  filip_baseline)


def test_filip_finetune_dp(workdir):
    base = _losses(["--finetune"], entry="filip")
    _assert_close(_losses(["--finetune", "--dp", "2"], entry="filip"), base)


def test_filip_lora_dp_packed(workdir):
    # packed FILIP LoRA: the mesh path downgrades scatter-tiers to flat
    # (loss-exact rearrangement) and deals packs per shard
    base = _losses(["--lora-rank", "2", "--packed"], entry="filip")
    _assert_close(_losses(["--lora-rank", "2", "--packed", "--dp", "2"],
                          entry="filip"), base)


def test_filip_mesh_rejects_odd_batch(workdir):
    from protein_clip_tpu.cli.main_2protein_filip import main
    with pytest.raises(SystemExit):
        main(TINY + FILIP_RUN + ["--dp", "8", "--batch-size", "10"])


def test_clip_finetune_pp(workdir):
    """--finetune --pp 2 (VERDICT r4 #5): the unfrozen backbone trains
    THROUGH the pipeline (reversed-ppermute backward, staged f32 masters);
    losses must match the single-device finetune, and the exported
    checkpoint carries the canonical flat (L, ...) stack (the engine's
    export_view unstages before train/loop.py writes the npz)."""
    base = _losses(["--finetune"])
    _assert_close(_losses(["--finetune", "--pp", "2"]), base)
    run = sorted(Path("runs").iterdir())[-1]
    ckpt = np.load(run / "best_model.npz")
    key = next(k for k in ckpt.files if k.startswith("esm/layers/attn/q/w"))
    assert ckpt[key].shape[0] == 2 and ckpt[key].ndim == 3  # (L, in, out)
