"""Fixture-driven test of the real-weights verification gate's plumbing
(tools/verify_real_checkpoint.py → eval/real_checkpoint.run).

No network here, so the "real checkpoint" is a tiny random HF snapshot
saved locally — the exact code path a genuine facebook/esm2_t30_150M_UR50D
snapshot takes, at toy scale. Covers: snapshot load → conversion → hidden
parity → sim-matrix parity → identical retrieval ranks → npz export →
reference-.pth heads import.
"""

import json

import numpy as np
import pytest

from protein_clip_tpu.eval import real_checkpoint

from test_esm2_parity import make_hf_tiny

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_snapshot")
    make_hf_tiny(seed=21).save_pretrained(d)
    return str(d)


def test_run_passes_on_faithful_snapshot(snapshot, tmp_path):
    out_npz = tmp_path / "esm.npz"
    res = real_checkpoint.run(snapshot, config="tiny", n_candidates=12,
                              batch_size=4, seed=3,
                              export_npz_path=str(out_npz))
    assert res["ok"], res
    assert res["hidden_max_abs_diff"] < 1e-4
    assert res["sim_matrix_max_abs_diff"] < 1e-4
    assert res["retrieval_ranks_match"]
    assert 0.0 <= res["top1_fraction"] <= 1.0
    assert out_npz.exists()
    json.dumps(res)  # the CLI prints this — must be serialisable


def test_run_with_reference_pth_heads(snapshot, tmp_path, ref_clip_pth):
    res = real_checkpoint.run(snapshot, config="tiny", n_candidates=8,
                              batch_size=4, seed=5,
                              reference_checkpoint=str(ref_clip_pth))
    assert res["ok"], res


@pytest.fixture(scope="module")
def ref_clip_pth(tmp_path_factory, snapshot):
    """A genuine reference-format torch checkpoint (ExtendedCLIP state_dict
    over the tiny snapshot's ESM — what main.py:78-81 writes)."""
    from test_reference_differential import _load_ref, _build_ref_clip
    from transformers import EsmModel

    ref_models = _load_ref("ref_models_vrc", "models.py")
    hf = EsmModel.from_pretrained(snapshot, add_pooling_layer=False)
    model = _build_ref_clip(ref_models, hf, temperature=0.8)
    p = tmp_path_factory.mktemp("ref_ckpt") / "best_model.pth"
    torch.save(model.state_dict(), p)
    return p


def test_cli_exit_codes(snapshot, tmp_path):
    rc = real_checkpoint.main([
        "--hf", snapshot, "--config", "tiny", "--candidates", "8",
        "--batch-size", "4"])
    assert rc == 0


def test_fasta_too_small_raises(snapshot, tmp_path):
    fa = tmp_path / "tiny.fasta"
    fa.write_text(">a\nMKV\n>b\nMKL\n")
    with pytest.raises(ValueError, match="need"):
        real_checkpoint.run(snapshot, config="tiny", n_candidates=8,
                            fasta=str(fa))
